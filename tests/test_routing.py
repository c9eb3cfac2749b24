"""Routing family: block-synchronous SSSP vs pure-Python Dijkstra."""

import heapq

import numpy as np
import pyarrow.parquet as pq

from plasmap_ray import fixtures, golden
from plasmap_ray.pipelines import routing


def _brute_dijkstra(n: int, source: int = 1) -> dict[int, int]:
    world = fixtures.road_world(n)
    e = world["edges"]
    adj: dict[int, list[tuple[int, int]]] = {}
    for s, d, w in zip(e["src"].to_pylist(), e["dst"].to_pylist(), e["w"].to_pylist()):
        adj.setdefault(s, []).append((d, w))
        adj.setdefault(d, []).append((s, w))
    dist = {source: 0}
    heap = [(0, source)]
    while heap:
        du, u = heapq.heappop(heap)
        if du > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, ()):
            if du + w < dist.get(v, 1 << 62):
                dist[v] = du + w
                heapq.heappush(heap, (du + w, v))
    return dist


def test_road_world_deterministic():
    a = fixtures.road_world(8)
    b = fixtures.road_world(8)
    assert a["edges"].equals(b["edges"])
    assert a["nodes"].num_rows == 64
    # weights are non-uniform ints in [BASE, BASE+SPREAD)
    w = np.asarray(a["edges"]["w"].to_numpy())
    assert w.min() >= fixtures.ROAD_BASE_W
    assert w.max() < fixtures.ROAD_BASE_W + fixtures.ROAD_W_SPREAD
    assert len(np.unique(w)) > 10


def test_sssp_small_grid_multi_partition(ray_session):
    # n=8, pg=2: four partitions, several exchange rounds
    got = {r["node"]: r["dist"] for r in routing.sssp(n=8, pg=2).take_all()}
    want = _brute_dijkstra(8)
    assert got == want


def test_sssp_single_partition_equivalent(ray_session):
    # pg=1 degenerates to one local solve; must agree with pg=2
    a = {r["node"]: r["dist"] for r in routing.sssp(n=6, pg=1).take_all()}
    b = {r["node"]: r["dist"] for r in routing.sssp(n=6, pg=2).take_all()}
    assert a == b == _brute_dijkstra(6)


def test_sssp_other_source(ray_session):
    src = 29  # interior node
    got = {r["node"]: r["dist"] for r in routing.sssp(n=8, pg=2, source=src).take_all()}
    want = _brute_dijkstra(8, source=src)
    assert got == want
    assert got[src] == 0


def test_sssp_query_matches_golden(ray_session):
    eng = sorted(
        (r["node"], r["dist"]) for r in routing.sssp_dists_query("unused").take_all()
    )
    gold = pq.read_table(golden.sssp_dists_path()).sort_by("node")
    want = list(zip(gold["node"].to_pylist(), gold["dist"].to_pylist()))
    assert eng == want


def test_isochrone_bands(ray_session):
    rows = routing.isochrone_bands_query("unused").take_all()
    gold = pq.read_table(golden.sssp_dists_path())
    d = np.asarray(gold["dist"].to_numpy())
    within = d[d <= routing.ISO_BUDGET]
    want: dict[int, int] = {}
    for b in within // routing.ISO_BAND:
        want[int(b)] = want.get(int(b), 0) + 1
    got = {r["band"]: r["n_nodes"] for r in rows}
    assert got == want
    assert sum(got.values()) == within.shape[0]


def test_pagerank_integer_invariants(ray_session):
    """Integer PageRank: all n^2 nodes ranked, total mass conserved up
    to the documented floor losses, every rank >= the teleport base,
    and interior nodes outrank the degree-2 corners."""
    import numpy as np

    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import routing

    out = routing.pagerank().to_pandas().set_index("node")["rank_fp"]
    n = fixtures.ROAD_N
    assert len(out) == n * n
    base = (routing.PR_SCALE * (routing.PR_DAMP_DEN - routing.PR_DAMP_NUM)) // (
        routing.PR_DAMP_DEN * n * n
    )
    assert (out >= base).all()
    total = out.sum()
    assert 0.95 * routing.PR_SCALE < total <= routing.PR_SCALE
    corners = [1, n, n * n - n + 1, n * n]
    center = (n // 2) * n + n // 2 + 1
    assert out[center] > max(out[c] for c in corners) * 0.9  # grid ranks are near-uniform; corners can't dominate
    assert np.unique(out.index).shape[0] == n * n


def test_brandes_source_path_graph(ray_session):
    """Known analytic case: path 1-2-3, all sources -> node 2 carries
    exactly the (1,3) pair; endpoints carry nothing."""
    import numpy as np
    import pyarrow as pa

    from plasmap_ray.pipelines.routing import BTW_FP, BrandesSource

    edges = {
        "src": np.array([1, 2], dtype=np.int64),
        "dst": np.array([2, 3], dtype=np.int64),
        "w": np.array([10, 20], dtype=np.int64),
    }
    stage = BrandesSource(edges)
    out = stage(pa.table({"source": pa.array([1, 2, 3], type=pa.int64())})).to_pandas()
    acc = out.groupby("node")["delta_fp"].sum()
    # node 2: delta=1 from s=1 (pair 1->3) + 1 from s=3 (pair 3->1) = 2
    assert acc.get(2, 0) == 2 * BTW_FP
    # endpoints only ever appear as targets: delta 1 from the far end
    # (s=1: delta_1(2)=1 counts paths THROUGH 2; nodes 1,3 as interior: none)
    assert acc.get(1, 0) + acc.get(3, 0) + acc.get(2, 0) == out["delta_fp"].sum()


def test_betweenness_sampled_matches_golden(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import routing

    got = routing.betweenness_sampled("/root/testdata/sf0.001").to_pandas()
    exp = pq.read_table(golden.betweenness_path(routing.BTW_SOURCES)).to_pandas()
    got = got.sort_values("node").reset_index(drop=True)
    exp = exp.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # grid interior must out-carry the corners
    import numpy as np

    from plasmap_ray import fixtures

    n = fixtures.ROAD_N
    corners = {1, n, n * n - n + 1, n * n}
    bt = dict(zip(got["node"], got["betweenness"]))
    corner_max = max(bt.get(c, 0.0) for c in corners)
    assert got["betweenness"].max() > 10 * max(corner_max, 1e-9)


def test_harmonic_and_eccentricity_consistency(ray_session):
    """Harmonic pins agree with a direct per-source Dijkstra recompute
    on a few nodes; eccentricity rows bound the true diameter."""
    import numpy as np

    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import routing

    h = routing.harmonic_centrality("/root/testdata/sf0.001").to_pandas()
    ecc = routing.graph_eccentricity("/root/testdata/sf0.001").to_pandas()
    n = fixtures.ROAD_N
    assert len(h) == n * n  # the grid is connected: every node reached
    assert len(ecc) == routing.BTW_SOURCES
    assert (ecc["n_reached"] == n * n).all()
    # diameter lower bound from the sweep must exceed the grid span
    # times the minimum edge weight (any corner-to-corner walk)
    assert ecc["eccentricity"].max() >= (2 * (n - 1)) * fixtures.ROAD_BASE_W
    # harmonic mass is positive and bounded by K * max 1/min_dist
    assert (h["harmonic"] > 0).all()
    assert h["harmonic"].max() <= routing.BTW_SOURCES / fixtures.ROAD_BASE_W + 1e-9


def test_percolation_curve_shape(ray_session):
    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import routing

    out = routing.percolation_curve("/root/testdata/sf0.001").to_pandas()
    assert list(out["w_cut"]) == list(routing.PERC_CUTS)
    # monotone: more edges, fewer fragments, bigger giant as the cut rises
    assert out["n_edges"].is_monotonic_increasing
    assert out["giant_frac"].is_monotonic_increasing
    assert (out["giant_nodes"] <= out["n_nodes"]).all()
    # the top rung keeps ~3/4 of edge weights [1000,1977): near-full lattice
    n = fixtures.ROAD_N
    assert out.iloc[-1]["giant_frac"] > 0.9
    assert out.iloc[-1]["n_nodes"] <= n * n


def test_alt_heuristic_eval_bounds(ray_session):
    from plasmap_ray.pipelines import routing

    out = routing.alt_heuristic_eval("/root/testdata/sf0.001").to_pandas()
    assert len(out) == routing.ALT_PAIRS
    # triangle inequality: the landmark bound NEVER exceeds the truth
    assert (out["alt_bound"] <= out["true_dist"]).all()
    assert ((out["tightness"] >= 0) & (out["tightness"] <= 1.0 + 1e-9)).all()
    # corner landmarks on a grid give a useful bound on average
    assert out["tightness"].mean() > 0.5


def test_bridge_edges_known_graph(ray_session):
    """Tarjan kernel sanity on the cheap subgraph: every reported
    bridge disconnects its endpoints; at least one exists (the cheap
    percolation islands grow trees); none exists in the full lattice
    (2-edge-connected)."""
    import numpy as np

    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import routing

    out = routing.bridge_edges("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["src"] < out["dst"]).all()
    assert (out["w"] < routing.CHEAP_W_CUT).all()
    # spot-verify 5 bridges by removal + BFS
    e = fixtures.road_world()["edges"]
    w = e["w"].to_numpy()
    m = w < routing.CHEAP_W_CUT
    src, dst = e["src"].to_numpy()[m], e["dst"].to_numpy()[m]
    adj = {}
    for a, b in zip(src.tolist(), dst.tolist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    from collections import deque

    for r in out.head(5).itertuples():
        seen = {r.src}
        dq = deque([r.src])
        while dq:
            v = dq.popleft()
            for u in adj[v]:
                if {v, u} == {r.src, r.dst}:
                    continue
                if u not in seen:
                    seen.add(u)
                    dq.append(u)
        assert r.dst not in seen  # removal really disconnects


def test_detour_ratio_bounds(ray_session):
    from plasmap_ray.pipelines import routing

    out = routing.detour_ratio("/root/testdata/sf0.001").to_pandas()
    assert len(out) == routing.ALT_PAIRS
    # network path >= base-weight * euclidean straight line (grid metric:
    # Manhattan >= Euclidean, every edge costs >= ROAD_BASE_W)
    assert (out["detour"] >= 1.0 - 1e-9).all()
    # grid circuity is bounded: Manhattan/Euclidean <= sqrt(2), plus the
    # weight spread (max w / base < 2) -> detour < 2*sqrt(2)
    assert (out["detour"] < 2.9).all()


def test_mst_boruvka_is_the_kruskal_tree(ray_session):
    out = (
        routing.mst_boruvka()
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    want = pq.read_table(golden.mst_boruvka_path()).to_pandas()
    n_nodes = fixtures.ROAD_N * fixtures.ROAD_N
    # a spanning tree of the connected grid: exactly V-1 edges
    assert len(out) == n_nodes - 1
    # bit-identical to the Kruskal golden (unique MST under the
    # (w, src, dst) total order)
    assert out[["src", "dst", "w"]].equals(want[["src", "dst", "w"]])
    # and it actually spans: union-find over the output reaches one root
    parent = list(range(n_nodes + 1))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in out.itertuples():
        parent[find(int(r.src))] = find(int(r.dst))
    assert len({find(v) for v in range(1, n_nodes + 1)}) == 1


def test_tsp_tours_two_opt_never_lengthens(ray_session):
    out = routing.tsp_tours("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["tour_len_fp"] <= out["nn_len_fp"]).all()
    assert (out["n_pois"] >= 1).all()
    # a closed tour over >=2 points has positive length
    multi = out[out["n_pois"] >= 2]
    assert (multi["tour_len_fp"] > 0).all()
    # matches the golden exactly (identical fixed-point descent)
    want = pq.read_table(golden.tsp_tours_path()).to_pandas()
    got = out.sort_values("rel_id").reset_index(drop=True)
    want = want.sort_values("rel_id").reset_index(drop=True)
    assert got.equals(want)


def test_traffic_assignment_conserves_demand(ray_session):
    """Flow on edges incident to a source equals the demand leaving it
    (for a source that is nobody else's through-node is hard to pick;
    instead check global conservation: total flow-weighted path length
    equals the sum of OD shortest distances times demand)."""
    import heapq

    out = routing.traffic_assignment("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["flow"] > 0).all()
    # rebuild OD demand exactly as the engine defines it
    import pyarrow.parquet as pq2

    ev = pq2.read_table(
        "/root/testdata/sf0.001/events.parquet", columns=["event_id", "user_id", "ts"]
    ).to_pandas()
    from plasmap_ray import oracle as orc

    ev = ev.sort_values(["user_id", "ts", "event_id"])
    first = ev.groupby("user_id").first().reset_index()
    last = ev.groupby("user_id").last().reset_index()
    n = fixtures.ROAD_N
    lon_f = fixtures.derive_lon(first["event_id"].to_numpy())
    lat_f = fixtures.derive_lat(first["event_id"].to_numpy())
    lon_l = fixtures.derive_lon(last["event_id"].to_numpy())
    lat_l = fixtures.derive_lat(last["event_id"].to_numpy())
    o = routing.nearest_road_node(lon_f, lat_f, n)
    d = routing.nearest_road_node(lon_l, lat_l, n)
    from collections import Counter

    demand = Counter((int(a), int(b)) for a, b in zip(o, d) if a != b)
    # shortest distances via Dijkstra per source
    e = fixtures.road_world(n)["edges"]
    adj = {}
    for a, b, w in zip(e["src"].to_numpy(), e["dst"].to_numpy(), e["w"].to_numpy()):
        adj.setdefault(int(a), []).append((int(b), int(w)))
        adj.setdefault(int(b), []).append((int(a), int(w)))
    want_cost = 0
    for s in {a for a, _ in demand}:
        dist = {s: 0}
        heap = [(0, s)]
        while heap:
            du, u = heapq.heappop(heap)
            if du > dist.get(u, 1 << 62):
                continue
            for v, w in adj.get(u, ()):
                nd = du + w
                if nd < dist.get(v, 1 << 62):
                    dist[v] = nd
                    heapq.heappush(heap, (nd, v))
        for (a, b), dem in demand.items():
            if a == s and b in dist:
                want_cost += dist[b] * dem
    got_cost = int((out["w"] * out["flow"]).sum())
    assert got_cost == want_cost
