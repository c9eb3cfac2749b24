"""Query AST / planner tests (PMQuery + QueryTranslator rebuild;
reference QueryTranslatorSpec.scala:29-52 + QueriesSpec golden counts)."""

import numpy as np
import pyarrow as pa
import pytest

from plasmap_ray import fixtures, pois, queryast, tiles


@pytest.fixture(scope="module")
def ctx():
    ids = np.arange(1, 5001, dtype=np.int64)
    points = pa.table(
        {
            "doc_id": pa.array(ids),
            "lon": pa.array(fixtures.derive_lon(ids)),
            "lat": pa.array(fixtures.derive_lat(ids)),
        }
    )
    return queryast.EngineContext(points=points)


def test_json_roundtrip_composed():
    q = queryast.PoisInArea(queryast.DistrictsOfArea(queryast.AreaByName("Essenheim")), "restaurant")
    s = queryast.to_json(q)
    back = queryast.from_json(s)
    assert back == q
    assert isinstance(back.parent, queryast.DistrictsOfArea)


def test_containing_areas_nested_levels(ctx):
    t = queryast.translate(queryast.ContainingAreas(6.5561, 51.0423), ctx)
    levels = dict(zip(t["rel_id"].to_pylist(), t["admin_level"].to_pylist()))
    assert 100 in levels and levels[100] == 6  # Essenheim city
    assert any(lvl == 8 for lvl in levels.values())  # plus its district
    t6 = queryast.translate(queryast.ContainingAreas(6.5561, 51.0423, admin_level=6), ctx)
    assert t6["rel_id"].to_pylist() == [100]
    # a point in the countryside matches nothing
    none = queryast.translate(queryast.ContainingAreas(7.9, 51.99), ctx)
    assert none.num_rows == 0


def test_districts_composition(ctx):
    t = queryast.translate(queryast.DistrictsOfArea(queryast.AreaByName("Essenheim")), ctx)
    assert sorted(t["rel_id"].to_pylist()) == [101, 102, 103, 104, 105, 106]


def test_pois_in_area_counts(ctx):
    """The '125 restaurants in Duisburg' golden-count pattern
    (QueriesSpec.scala:153): fixed expected counts per area/category."""
    t = queryast.translate(queryast.PoisInArea(queryast.AreaByName("Duisheim"), "restaurant"), ctx)
    assert t.num_rows == 4  # deterministic fixture count
    assert set(t["value"].to_pylist()) == {"restaurant"}
    assert set(t["rel_id"].to_pylist()) == {200}


def test_nearest_pois_matches_brute(ctx):
    q = queryast.NearestPois(6.5561, 51.0423, k=4)
    t = queryast.translate(q, ctx)
    pois_t = fixtures.make_pois()
    d = (pois_t["lon"].to_numpy() - q.lon) ** 2 + (pois_t["lat"].to_numpy() - q.lat) ** 2
    expect = pois_t["poi_id"].to_numpy()[np.lexsort((pois_t["poi_id"].to_numpy(), d))][:4]
    assert t["poi_id"].to_pylist() == expect.tolist()
    assert t["knn_rank"].to_pylist() == [1, 2, 3, 4]


def test_nearest_pois_category_filter(ctx):
    t = queryast.translate(queryast.NearestPois(6.5561, 51.0423, k=3, category="theatre"), ctx)
    pois_t = fixtures.make_pois()
    ids = t["poi_id"].to_pylist()
    kinds = {pois_t["poi_id"][i].as_py(): pois_t["value"][i].as_py() for i in range(pois_t.num_rows)}
    assert all(kinds[i] == "theatre" for i in ids)


def test_features_in_tile_consistent_with_kernel(ctx):
    z, x, y = 10, 530, 343
    t = queryast.translate(queryast.FeaturesInTile(z, x, y), ctx)
    if t.num_rows:
        tx, ty = tiles.tile_xy(t["lon"].to_numpy(), t["lat"].to_numpy(), z)
        assert (tx == x).all() and (ty == y).all()
    # complement: every ctx point in that tile is returned
    lon = ctx.points["lon"].to_numpy()
    lat = ctx.points["lat"].to_numpy()
    tx, ty = tiles.tile_xy(lon, lat, z)
    assert t.num_rows == int(((tx == x) & (ty == y)).sum())


def test_poi_registry():
    assert len(pois.CATEGORIES) >= 60  # reference has 60+ macro instances
    assert pois.tags_for("gym") == [("leisure", "fitness_centre"), ("leisure", "gym"), ("amenity", "gym")]
    with pytest.raises(KeyError):
        pois.tags_for("nonexistent_category")


def test_features_in_tile_requires_points():
    with pytest.raises(ValueError):
        queryast.translate(queryast.FeaturesInTile(10, 1, 1), queryast.EngineContext())


def test_pois_near_point_radius(ctx):
    q = queryast.PoisNearPoint(6.5561, 51.0423, radius_deg=0.2, category="cafe")
    t = queryast.translate(q, ctx)
    assert set(t["value"].to_pylist()) <= {"cafe"}
    d2 = (t["lon"].to_numpy() - q.lon) ** 2 + (t["lat"].to_numpy() - q.lat) ** 2
    assert (d2 <= 0.04 + 1e-15).all()
    # wire round trip includes the new node type
    assert queryast.from_json(queryast.to_json(q)) == q


def test_explain_covers_every_node_kind():
    from plasmap_ray import queryast as qa

    cases = [
        qa.ContainingAreas(6.5, 51.0),
        qa.AreaByName("Essenheim"),
        qa.DistrictsOfArea(qa.AreaByName("Essenheim")),
        qa.PoisInArea(qa.AreaByName("Essenheim"), "cafe"),
        qa.NearestPois(6.5, 51.0, k=3),
        qa.PoisNearPoint(6.5, 51.0, radius_deg=0.2),
        qa.FeaturesInTile(10, 1, 2),
    ]
    for q in cases:
        t = qa.explain(q)
        assert t.num_rows >= 1
        assert t.column_names == ["step", "op", "detail"]
        assert t["step"].to_pylist() == list(range(1, t.num_rows + 1))
        assert "unknown" not in set(t["op"].to_pylist())
    # nested plan lists parent steps before the join that consumes them
    plan = qa.explain(qa.PoisInArea(qa.DistrictsOfArea(qa.AreaByName("x")), "cafe"))
    ops = plan["op"].to_pylist()
    assert ops.index("containment_join") < ops.index("pip_join")


def test_serve_loop_canonical_queries():
    """S13 parity: the long-lived serve loop answers the three canonical
    SURVEY §7.2-11 queries (containing-polygon for point, features-in-
    tile, nearest-k POIs) over ONE socket connection, plus GeoJSON
    output, error routing, and clean shutdown — all against sf0.001."""
    import json
    import socket
    import subprocess
    import sys
    import time

    proc = subprocess.Popen(
        [sys.executable, "-m", "plasmap_ray.cli", "serve", "--sf-dir", "/root/testdata/sf0.001"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd="/root/repo",
    )
    try:
        hello = json.loads(proc.stdout.readline())
        assert hello["serving"]
        with socket.create_connection(("127.0.0.1", hello["port"]), timeout=60) as sk:
            f = sk.makefile("rw")

            def ask(req):
                f.write(json.dumps(req) + "\n")
                f.flush()
                return json.loads(f.readline())

            # 1) containing-polygon for point
            r = ask({"ast": {"type": "ContainingAreas", "lon": 6.5561, "lat": 51.0423}})
            assert r["ok"] and 100 in r["result"]["rel_id"]
            # 2) features-in-tile z/x/y (any tile; schema is the contract)
            r2 = ask({"ast": {"type": "FeaturesInTile", "z": 10, "x": 530, "y": 347}})
            assert r2["ok"] and "doc_id" in r2["result"]
            # 3) nearest-k POIs
            r3 = ask({"ast": {"type": "NearestPois", "lon": 6.5561, "lat": 51.0423, "k": 3}})
            assert r3["ok"] and r3["rows"] == 3 and len(r3["result"]["poi_id"]) == 3
            # GeoJSON leg (the WS server's output format): radius query
            rg = ask(
                {
                    "ast": {"type": "PoisNearPoint", "lon": 6.5561, "lat": 51.0423, "radius_deg": 0.5},
                    "format": "geojson",
                }
            )
            assert rg["ok"] and rg["rows"] >= 1
            assert len(rg["geojson"]["features"]) == rg["rows"]
            # composed query (the PMDistrictsFromArea(PMCityFromCoordinates) chain)
            r4 = ask({"ast": {"type": "DistrictsOfArea", "parent": {"type": "AreaByName", "name": "Essenheim"}}})
            assert r4["ok"] and sorted(r4["result"]["rel_id"]) == [101, 102, 103, 104, 105, 106]
            # explain (the planner surface)
            r5 = ask({"cmd": "explain", "ast": {"type": "NearestPois", "lon": 6.5, "lat": 51.0, "k": 3}})
            assert r5["ok"]
            # error routing: loop must survive a bad request
            r6 = ask({"ast": {"type": "NoSuchQuery"}})
            assert not r6["ok"] and "error" in r6
            # still alive after the error
            r7 = ask({"ast": {"type": "ContainingAreas", "lon": 6.5561, "lat": 51.0423, "admin_level": 6}})
            assert r7["ok"] and r7["result"]["rel_id"] == [100]
            # clean shutdown
            r8 = ask({"cmd": "shutdown"})
            assert r8["ok"]
        proc.wait(timeout=60)
        assert proc.returncode == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_serve_loop_concurrent_clients_and_paging():
    """S13 parity-plus (VERDICT r3 directive 4): (a) two sockets drive
    queries CONCURRENTLY against one server (threaded handlers must not
    serialize or cross-wire responses); (b) a result bigger than
    --max-rows pages via the stateless next_offset cursor, and the
    concatenated pages equal the full result."""
    import json
    import socket
    import subprocess
    import sys
    import threading

    proc = subprocess.Popen(
        [sys.executable, "-m", "plasmap_ray.cli", "serve",
         "--sf-dir", "/root/testdata/sf0.001", "--max-rows", "100"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd="/root/repo",
    )
    try:
        hello = json.loads(proc.stdout.readline())
        port = hello["port"]

        def client(k, out, idx):
            with socket.create_connection(("127.0.0.1", port), timeout=60) as sk:
                f = sk.makefile("rw")
                for _ in range(5):  # hammer to overlap with the other client
                    f.write(json.dumps(
                        {"ast": {"type": "NearestPois", "lon": 6.5561, "lat": 51.0423, "k": k}}
                    ) + "\n")
                    f.flush()
                    out[idx].append(json.loads(f.readline()))

        results = {0: [], 1: []}
        t1 = threading.Thread(target=client, args=(3, results, 0))
        t2 = threading.Thread(target=client, args=(7, results, 1))
        t1.start(); t2.start(); t1.join(60); t2.join(60)
        assert all(r["ok"] and r["rows"] == 3 for r in results[0]) and len(results[0]) == 5
        assert all(r["ok"] and r["rows"] == 7 for r in results[1]) and len(results[1]) == 5

        # paging: a whole-world tile returns every fixture point, capped
        # at 100 rows/line, pages stitched by the next_offset cursor
        with socket.create_connection(("127.0.0.1", port), timeout=60) as sk:
            f = sk.makefile("rw")

            def ask(req):
                f.write(json.dumps(req) + "\n")
                f.flush()
                return json.loads(f.readline())

            ast = {"type": "FeaturesInTile", "z": 0, "x": 0, "y": 0}
            seen: list[int] = []
            first = ask({"ast": ast})
            total = first["total_rows"]
            assert total > 100  # the cap is actually exercised
            assert first["rows"] == 100 and first["offset"] == 0
            page = first
            while True:
                seen.extend(page["result"]["doc_id"])
                if page["next_offset"] is None:
                    break
                page = ask({"ast": ast, "offset": page["next_offset"]})
                assert page["rows"] <= 100
            assert len(seen) == total and len(set(seen)) == total
            # explicit limit below the cap is honored
            lim = ask({"ast": ast, "limit": 7})
            assert lim["rows"] == 7 and lim["next_offset"] == 7
            ask({"cmd": "shutdown"})
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()


def test_result_payload_cap_clamp_and_uncapped_oneshot():
    """ADVICE r4: (a) a non-positive cap must not produce an empty
    window with a non-null next_offset (a paging client would loop
    forever without progress); (b) the one-shot cmd_query path passes
    cap=num_rows, so a >SERVE_MAX_ROWS result is NOT silently
    truncated."""
    import pyarrow as pa

    from plasmap_ray import cli

    t = pa.table({"doc_id": pa.array(list(range(5000)), type=pa.int64())})

    # (a) cap=0 clamps to 1: pages always advance and terminate
    seen = 0
    offset = 0
    while True:
        p = cli._result_payload(t, False, offset=offset, cap=0)
        assert p["rows"] >= 1
        seen += p["rows"]
        if p["next_offset"] is None:
            break
        assert p["next_offset"] > offset  # strict progress
        offset = p["next_offset"]
        if seen > 5000:
            raise AssertionError("paged past the table")
    assert seen == 5000

    # (b) the one-shot convention returns the whole result in one page
    full = cli._result_payload(t, False, cap=max(1, t.num_rows))
    assert full["rows"] == 5000 and full["next_offset"] is None
    assert len(full["result"]["doc_id"]) == 5000


def test_serve_ws_rfc6455_roundtrip():
    """S13 true-framing parity (VERDICT r4 'missing #2'): serve --ws
    speaks actual RFC 6455 — HTTP upgrade with the GUID-derived
    Sec-WebSocket-Accept, masked client text frames (including a
    FRAGMENTED one), ping answered by pong, paged query responses as
    unmasked text frames, close handshake on shutdown."""
    import base64
    import hashlib
    import json
    import socket
    import struct
    import subprocess
    import sys

    from plasmap_ray import ws

    proc = subprocess.Popen(
        [sys.executable, "-m", "plasmap_ray.cli", "serve", "--ws",
         "--sf-dir", "/root/testdata/sf0.001", "--max-rows", "100"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd="/root/repo",
    )
    try:
        hello = json.loads(proc.stdout.readline())
        assert hello["protocol"] == "websocket"
        port = hello["port"]
        with socket.create_connection(("127.0.0.1", port), timeout=60) as sk:
            rf = sk.makefile("rb")
            wf = sk.makefile("wb")
            key = base64.b64encode(b"0123456789abcdef").decode()
            wf.write(
                (
                    "GET /api/websocket HTTP/1.1\r\n"
                    f"Host: 127.0.0.1:{port}\r\n"
                    "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                    f"Sec-WebSocket-Key: {key}\r\n"
                    "Sec-WebSocket-Version: 13\r\n\r\n"
                ).encode()
            )
            wf.flush()
            status = rf.readline().decode()
            assert "101" in status
            accept = None
            while True:
                line = rf.readline().decode().strip()
                if not line:
                    break
                if line.lower().startswith("sec-websocket-accept:"):
                    accept = line.split(":", 1)[1].strip()
            want = base64.b64encode(
                hashlib.sha1((key + ws.WS_GUID).encode()).digest()
            ).decode()
            assert accept == want  # the GUID-derived accept, not an echo

            def send(obj):
                wf.write(ws.mask_client_frame(json.dumps(obj).encode()))
                wf.flush()

            def recv():
                msg = ws.read_message(rf, wf)
                assert msg is not None
                return json.loads(msg)

            # one query -> one framed response
            send({"ast": {"type": "NearestPois", "lon": 6.5561, "lat": 51.0423, "k": 3}})
            r = recv()
            assert r["ok"] and r["rows"] == 3

            # ping -> pong (client-side check of the server's control path)
            wf.write(ws.mask_client_frame(b"hello", opcode=ws.OP_PING))
            wf.flush()
            op, payload, fin = ws.read_frame(rf)
            assert op == ws.OP_PONG and payload == b"hello" and fin

            # FRAGMENTED client message: text frame without FIN, then a
            # continuation with FIN — must reassemble into one request
            body = json.dumps({"ast": {"type": "NearestPois", "lon": 6.5561, "lat": 51.0423, "k": 5}}).encode()
            half = len(body) // 2
            first = ws.mask_client_frame(body[:half], opcode=ws.OP_TEXT)
            first = bytes([first[0] & 0x7F]) + first[1:]  # clear FIN
            wf.write(first)
            wf.write(ws.mask_client_frame(body[half:], opcode=ws.OP_CONT))
            wf.flush()
            r = recv()
            assert r["ok"] and r["rows"] == 5

            # paging across frames: whole-world tile, 100-row pages
            ast = {"type": "FeaturesInTile", "z": 0, "x": 0, "y": 0}
            send({"ast": ast})
            page = recv()
            total = page["total_rows"]
            assert total > 100 and page["rows"] == 100
            seen = list(page["result"]["doc_id"])
            while page["next_offset"] is not None:
                send({"ast": ast, "offset": page["next_offset"]})
                page = recv()
                seen.extend(page["result"]["doc_id"])
            assert len(seen) == total and len(set(seen)) == total

            # shutdown: bye text frame then a close frame
            send({"cmd": "shutdown"})
            bye = ws.read_message(rf, wf)
            assert bye is not None and json.loads(bye)["bye"]
            frame = ws.read_frame(rf)
            assert frame is not None and frame[0] == ws.OP_CLOSE
        proc.wait(timeout=60)
        assert proc.returncode == 0
    finally:
        if proc.poll() is None:
            proc.kill()
