"""CLI entry points — the WSServer/ray-job-submit stand-in (S13).

The reference serves queries over a WebSocket (WSServer.scala:43-79:
JSON AST in, GeoJSON out).  The batch engine's serving surface is a
CLI suitable for ``ray job submit``:

    python -m plasmap_ray.cli query '<AST json>' [--sf-dir DIR] [--geojson]
    python -m plasmap_ray.cli tile  IMAGES_DIR OUT_DIR [--partitions N]
    python -m plasmap_ray.cli bench-images N

Owns its Ray session (guarded init + shutdown) per the driver contract.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    return ray


def _build_context(sf_dir: str):
    """Cold-start singleton for query serving: the point cloud, admin
    polygons, and POI table load ONCE (ST4 discipline) and serve every
    subsequent query."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from . import fixtures, queryast

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    points = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "lon": pa.array(fixtures.derive_lon(ids)),
            "lat": pa.array(fixtures.derive_lat(ids)),
        }
    )
    return queryast.EngineContext(points=points)


# Per-response row ceiling: a full-table AST query must not serialize
# the whole result into one JSON line (the reference streams chunked
# TextMessages, Flows.scala:92-123 — the batch analogue is a bounded
# page + a stateless continuation cursor the client replays).
SERVE_MAX_ROWS = 1000


def _result_payload(
    result,
    want_geojson: bool,
    offset: int = 0,
    limit: int | None = None,
    cap: int = SERVE_MAX_ROWS,
) -> dict:
    from .sources import geojson

    total = result.num_rows
    offset = max(0, min(int(offset), total))
    # a non-positive cap would make the window empty while next_offset
    # stays non-null — a paging client following the documented
    # protocol would loop forever without progress
    cap = max(1, int(cap))
    eff = cap if limit is None else max(0, min(int(limit), cap))
    window = result.slice(offset, eff)
    nxt = offset + window.num_rows
    page = {
        "rows": window.num_rows,
        "total_rows": total,
        "offset": offset,
        "next_offset": nxt if nxt < total else None,
    }
    if want_geojson and {"lon", "lat"} <= set(result.column_names):
        props = [
            {c: window[c][i].as_py() for c in window.column_names if c not in ("lon", "lat")}
            for i in range(window.num_rows)
        ]
        return {
            "ok": True,
            **page,
            "geojson": json.loads(
                geojson.points_to_geojson(window["lon"].to_numpy(), window["lat"].to_numpy(), props)
            ),
        }
    return {"ok": True, **page, "result": window.to_pydict()}


def cmd_query(args) -> int:
    from . import queryast

    _ray_session()
    q = queryast.from_json(args.ast)
    ctx = _build_context(args.sf_dir)
    result = queryast.translate(q, ctx)
    # one-shot path: no page ceiling — the caller asked for the whole
    # result on stdout (paging only protects the long-lived serve loop)
    payload = _result_payload(result, args.geojson, cap=max(1, result.num_rows))
    if "geojson" in payload:
        print(json.dumps(payload["geojson"]))
    else:
        print(json.dumps(payload["result"], default=str))
    return 0


def cmd_serve(args) -> int:
    """Long-lived query serving loop — S13 parity with the reference's
    WebSocket server (WSServer.scala:43-79 + Flows.query,
    Flows.scala:147-167).  Two wire modes: default JSON lines over a
    stdlib TCP socket, or ``--ws`` for TRUE RFC 6455 WebSocket framing
    (HTTP upgrade + Sec-WebSocket-Accept + masked text frames,
    ping/pong/close — plasmap_ray.ws), matching the reference's
    upgrade endpoint rather than just its message protocol.  Either
    way requests answer JSON / GeoJSON, with the engine
    context (polygons, POIs, point cloud) initialised ONCE at bind
    time — the serving analogue of the reference's storage/index/
    mapping service singletons (WSServer.scala:53-55).

    Protocol (one JSON object per line):
      {"ast": {...}}                      -> {"ok": true, "rows": N, "result": {...}}
      {"ast": {...}, "format": "geojson"} -> {"ok": true, "rows": N, "geojson": {...}}
      {"cmd": "explain", "ast": {...}}    -> the planner's EXPLAIN table
      {"cmd": "shutdown"}                 -> ack + server stops
    Malformed input answers {"ok": false, "error": ...} and the loop
    continues (the error-router discipline, M9).

    Large results are PAGED: every response carries at most
    ``--max-rows`` rows plus (total_rows, offset, next_offset); the
    client continues with {"ast": ..., "offset": next_offset} until
    next_offset is null — the bounded-line analogue of the reference's
    streamed TextMessage chunks (Flows.scala:92-123).  The cursor is
    stateless (recomputed per page), so any client can resume any page
    on any connection.
    """
    import socketserver
    import threading

    from . import queryast, ws

    _ray_session()
    ctx = _build_context(args.sf_dir)

    def answer(line: str, server) -> str | None:
        """One request -> one JSON response string; None = shutdown
        was requested (the caller acks and stops the server)."""
        try:
            req = json.loads(line)
            if req.get("cmd") == "shutdown":
                threading.Thread(target=server.shutdown, daemon=True).start()
                return None
            q = queryast.from_json(json.dumps(req["ast"]))
            if req.get("cmd") == "explain":
                resp = {"ok": True, "result": queryast.explain(q).to_pydict()}
            else:
                resp = _result_payload(
                    queryast.translate(q, ctx),
                    req.get("format") == "geojson",
                    offset=req.get("offset", 0),
                    limit=req.get("limit"),
                    cap=args.max_rows,
                )
        except Exception as e:  # noqa: BLE001 — bad requests routed, not fatal
            resp = {"ok": False, "error": str(e)}
        return json.dumps(resp, default=str)

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for raw in self.rfile:
                line = raw.strip()
                if not line:
                    continue
                out = answer(line, self.server)
                if out is None:
                    self.wfile.write(b'{"ok": true, "bye": true}\n')
                    self.wfile.flush()
                    return
                self.wfile.write((out + "\n").encode())
                self.wfile.flush()

    class WsHandler(socketserver.StreamRequestHandler):
        """RFC 6455 server handler (S13 true-framing parity with the
        reference's upgrade endpoint, WSServer.scala:62-67): HTTP
        upgrade handshake, then one JSON request per masked text
        frame, one JSON response per unmasked text frame; ping/pong
        and close handled in ws.read_message."""

        def handle(self):
            headers = ws.read_handshake(self.rfile)
            if headers is None:
                return
            resp = ws.handshake_response(headers)
            self.wfile.write(resp)
            self.wfile.flush()
            if not resp.startswith(b"HTTP/1.1 101"):
                return  # bad handshake answered with 400, like the reference's non-upgrade branch
            while True:
                line = ws.read_message(self.rfile, self.wfile)
                if line is None or not line.strip():
                    if line is None:
                        return
                    continue
                out = answer(line.strip(), self.server)
                if out is None:
                    self.wfile.write(ws.encode_text('{"ok": true, "bye": true}'))
                    self.wfile.write(ws.encode_close())
                    self.wfile.flush()
                    return
                self.wfile.write(ws.encode_text(out))
                self.wfile.flush()

    socketserver.ThreadingTCPServer.allow_reuse_address = True
    # daemon handler threads: shutdown must not block joining a handler
    # parked in a socket read on some OTHER still-open client connection
    socketserver.ThreadingTCPServer.daemon_threads = True
    srv = socketserver.ThreadingTCPServer(
        (args.host, args.port), WsHandler if args.ws else Handler
    )
    host, port = srv.server_address[:2]
    print(
        json.dumps(
            {
                "serving": True,
                "host": host,
                "port": port,
                "sf_dir": args.sf_dir,
                "protocol": "websocket" if args.ws else "json-lines",
            }
        ),
        flush=True,
    )
    try:
        srv.serve_forever()
    finally:
        srv.server_close()
    return 0


def cmd_tile(args) -> int:
    from . import checkpoint

    _ray_session()
    stats = checkpoint.tiling_job(args.images_dir, args.out_dir, n_partitions=args.partitions)
    print(json.dumps(stats))
    return 0 if stats["complete"] else 3


def cmd_ingest(args) -> int:
    from .pipelines import ingest

    _ray_session()
    manifest = ingest.ingest_images(args.images_dir, args.out_root)
    print(json.dumps(manifest))
    return 0


def cmd_bench_images(args) -> int:
    import os

    os.environ.setdefault("RAY_GRAFT_CPUS", "8")
    _ray_session()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    path = bench.ensure_bench_images(args.n)
    print(json.dumps({"images_dir": path, "n": args.n}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="plasmap_ray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="execute a JSON query AST")
    q.add_argument("ast", help="AST JSON (see plasmap_ray.queryast)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--geojson", action="store_true", help="emit point results as GeoJSON")
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("serve", help="long-lived JSON-line query server (S13 WSServer parity)")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=0, help="0 = pick a free port (printed on stdout)")
    s.add_argument(
        "--max-rows", type=int, default=SERVE_MAX_ROWS,
        help="per-response row ceiling; larger results page via next_offset",
    )
    s.add_argument(
        "--ws", action="store_true",
        help="speak RFC 6455 WebSocket framing (HTTP upgrade + text frames) instead of raw JSON lines",
    )
    s.set_defaults(fn=cmd_serve)

    t = sub.add_parser("tile", help="checkpointed tiling job (resumable)")
    t.add_argument("images_dir")
    t.add_argument("out_dir")
    t.add_argument("--partitions", type=int, default=16)
    t.set_defaults(fn=cmd_tile)

    i = sub.add_parser("ingest", help="full ingest fan-out: data/mappings/index/tiles")
    i.add_argument("images_dir")
    i.add_argument("out_root")
    i.set_defaults(fn=cmd_ingest)

    b = sub.add_parser("bench-images", help="generate the bench images table (under /tmp/plasmap_fixtures)")
    b.add_argument("n", type=int)
    b.set_defaults(fn=cmd_bench_images)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except (KeyError, ValueError, FileNotFoundError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
