"""Distributed shortest-path routing over the road-grid network.

The reference serves point/area lookups but no routing; a geospatial
engine at 100 TB needs shortest paths over the way graph (the J1/J2
assembly output IS a road graph).  This module implements
**block-synchronous SSSP** — the standard distributed design for road
networks (cf. delta-stepping, Meyer & Sanders 2003; Pregel-style SSSP):

- The edge set is sharded ONCE by spatial partition (``ray.put`` per
  shard here; at real scale the shards are hive-partitioned parquet a
  task reads by key).  Edges never re-shuffle: only the distance table
  moves between rounds.
- Each round, every partition runs an EXACT local Dijkstra seeded by
  the globally-known distances of its nodes, emitting improved local
  distances plus relaxations over its boundary-crossing edges; a
  ``groupby(node).min`` folds candidates into the next global table.
- Distance information crosses one partition boundary per round, so
  rounds = partition-graph diameter (+1 to confirm the fixpoint) —
  NOT node-level graph diameter.  A naive distributed Bellman-Ford
  needs O(node diameter) rounds (hundreds for road grids); the local
  solve collapses everything inside a partition into zero rounds.
- Convergence detection is driver-side but O(1): distances only ever
  decrease and the reached set only grows, so an unchanged
  (count, sum) pair is a fixpoint proof.

Per-worker shard state (CSR adjacency) is cached by ObjectRef hex —
the ST4 cold-start pattern, built once per worker process.

Weights are int64 fixed-point (fixtures.road_world): distances are
exact integer sums, so engine-vs-oracle comparison is bitwise.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from .. import fixtures

PART_GRID = 2  # pg x pg spatial partitions
NUM_PARTS = 8  # blocks for the folded distance table
MAX_ROUNDS = 64
INF = 1 << 62


def _pcell_np(node: np.ndarray, n: int, pg: int) -> np.ndarray:
    """Spatial partition id of a node (pure integer arithmetic)."""
    i = (node - 1) % n
    j = (node - 1) // n
    return (i * pg // n) * pg + (j * pg // n)


@functools.lru_cache(maxsize=8)
def _shard_refs(n: int, pg: int) -> dict:
    """Symmetrize the construction edges and ray.put one shard per
    partition (all edges whose src lies in the partition, including
    boundary-crossing ones).  Built once per driver session."""
    e = fixtures.road_world(n)["edges"]
    s0 = e["src"].to_numpy()
    d0 = e["dst"].to_numpy()
    w0 = e["w"].to_numpy()
    src = np.concatenate([s0, d0])
    dst = np.concatenate([d0, s0])
    w = np.concatenate([w0, w0])
    cell = _pcell_np(src, n, pg)
    refs = {}
    for c in np.unique(cell):
        m = cell == c
        order = np.argsort(src[m], kind="stable")
        refs[int(c)] = ray.put(
            {"src": src[m][order], "dst": dst[m][order], "w": w[m][order]}
        )
    return refs


_SHARD_CSR: dict = {}  # per-worker cache: ref hex -> CSR adjacency


def _csr_for(ref) -> dict:
    key = getattr(ref, "hex", lambda: id(ref))()
    csr = _SHARD_CSR.get(key)
    if csr is None:
        shard = ray.get(ref) if not isinstance(ref, dict) else ref
        uniq, starts = np.unique(shard["src"], return_index=True)
        ends = np.append(starts[1:], shard["src"].shape[0])
        csr = {
            "index": {int(u): (int(a), int(b)) for u, a, b in zip(uniq, starts, ends)},
            "dst": shard["dst"],
            "w": shard["w"],
        }
        _SHARD_CSR[key] = csr
    return csr


def _local_solve(g: pa.Table, refs: dict) -> pa.Table:
    """Multi-source Dijkstra over one partition's shard, seeded by the
    partition's current global distances.  Nodes outside the shard's
    src set (boundary targets) are natural sinks: they receive a
    candidate distance but never expand (their out-edges live in their
    own shard)."""
    import heapq

    cell = int(g["pcell"][0].as_py())
    csr = _csr_for(refs[cell])
    index, dsts, ws = csr["index"], csr["dst"], csr["w"]
    nodes = g["node"].to_numpy()
    seeds = g["dist"].to_numpy()
    dist = {int(u): int(d) for u, d in zip(nodes, seeds)}
    heap = [(int(d), int(u)) for u, d in zip(nodes, seeds)]
    heapq.heapify(heap)
    while heap:
        du, u = heapq.heappop(heap)
        if du > dist.get(u, INF):
            continue
        rng = index.get(u)
        if rng is None:
            continue  # boundary sink
        a, b = rng
        for k in range(a, b):
            v = int(dsts[k])
            nd = du + int(ws[k])
            if nd < dist.get(v, INF):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    out_nodes = np.fromiter(dist.keys(), dtype=np.int64, count=len(dist))
    out_dists = np.fromiter(dist.values(), dtype=np.int64, count=len(dist))
    return pa.table(
        {
            "node": pa.array(out_nodes, type=pa.int64()),
            "dist": pa.array(out_dists, type=pa.int64()),
        }
    )


def sssp(
    n: int | None = None,
    source: int = 1,
    pg: int = PART_GRID,
    num_partitions: int = NUM_PARTS,
    max_rounds: int = MAX_ROUNDS,
) -> rd.Dataset:
    """Single-source shortest paths; returns (node, dist) int64 for
    every reached node (the whole grid — it is connected)."""
    if n is None:
        n = fixtures.ROAD_N
    refs = _shard_refs(n, pg)

    def tag(t: pa.Table) -> pa.Table:
        cells = _pcell_np(t["node"].to_numpy(), n, pg)
        return t.append_column("pcell", pa.array(cells, type=pa.int64()))

    def solve(g: pa.Table) -> pa.Table:
        return _local_solve(g, refs)

    dists = rd.from_arrow(
        pa.table(
            {
                "node": pa.array([source], type=pa.int64()),
                "dist": pa.array([0], type=pa.int64()),
            }
        )
    )
    prev = (-1, -1)
    for _ in range(max_rounds):
        cand = (
            dists.map_batches(tag, batch_format="pyarrow")
            .groupby("pcell")
            .map_groups(solve, batch_format="pyarrow")
        )
        dists = (
            cand.union(dists)
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .repartition(num_partitions)
            .materialize()
        )
        cur = (dists.count(), dists.sum("dist"))
        if cur == prev:
            break
        prev = cur
    return dists


def sssp_dists_query(sf_dir: str) -> rd.Dataset:
    """queries() surface: full (node, dist) table — golden-oracle
    checked against a pure-Python Dijkstra over the same construction
    edges (golden.sssp_dists_path)."""
    return sssp()


ISO_BUDGET = 20000  # cost budget for the isochrone
ISO_BAND = 2500  # band width for the reachability histogram


def isochrone_bands_query(
    sf_dir: str, budget: int = ISO_BUDGET, band: int = ISO_BAND
) -> rd.Dataset:
    """queries() surface: reachability isochrone — nodes within
    ``budget`` of the source, bucketed into cost bands (the product a
    map UI shades).  Output (band, n_nodes)."""
    d = sssp().filter(expr=f"dist <= {budget}")

    def bands(t: pa.Table) -> pa.Table:
        b = t["dist"].to_numpy() // band
        return pa.table({"band": pa.array(b, type=pa.int64())})

    from ray.data.aggregate import Count

    return (
        d.map_batches(bands, batch_format="pyarrow")
        .groupby("band")
        .aggregate(Count(alias_name="n_nodes"))
    )


# ---------------------------------------------------------------------------
# pagerank (integer-exact Pregel-style power iteration)
# ---------------------------------------------------------------------------

PR_SCALE = 10**12  # rank fixed-point scale
PR_ITERS = 10
# damping 0.85 as an exact integer ratio; integer division makes every
# iteration's rank vector identical regardless of partial-sum order
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def pagerank(
    n: int | None = None,
    iters: int = PR_ITERS,
    pg: int = PART_GRID,
    num_partitions: int = NUM_PARTS,
) -> rd.Dataset:
    """Distributed PageRank over the road graph — INTEGER-EXACT power
    iteration: ranks live as int64 fixed-point, each node's per-edge
    contribution is ``r_fp // deg`` (integer division), and the update
    is ``base + (85 * Σ contrib) // 100``.  Every operation is integer,
    so the rank vector after any number of rounds is bit-identical in
    any engine and under any aggregation-tree order (the kmeans/SSSP
    determinism discipline applied to the third classic iterative
    algorithm).  The sub-ulp mass lost to the floor divisions just
    damps slightly harder — documented, reproducible.

    Shape per round: the rank table shards by the SAME spatial
    partition as the edges (edges never move — the SSSP discipline);
    each partition task streams its nodes' contributions over its local
    CSR; one node-keyed integer-sum fold builds the next table.
    Rounds = ``iters`` (fixed — what makes the result checkable).

    Output: (node, rank_fp) int64 for all n² nodes.
    """
    from ray.data.aggregate import Sum as _Sum

    if n is None:
        n = fixtures.ROAD_N
    refs = _shard_refs(n, pg)
    n_nodes = n * n
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n_nodes)

    def tag(t: pa.Table) -> pa.Table:
        cells = _pcell_np(t["node"].to_numpy(), n, pg)
        return t.append_column("pcell", pa.array(cells, type=pa.int64()))

    def contrib(g: pa.Table) -> pa.Table:
        cell = int(g["pcell"][0].as_py())
        csr = _csr_for(refs[cell])
        index, dsts = csr["index"], csr["dst"]
        nodes = g["node"].to_numpy()
        r = g["rank_fp"].to_numpy()
        out_dst, out_c = [], []
        for u, ru in zip(nodes, r):
            rng = index.get(int(u))
            if rng is None:
                continue
            a, b = rng
            c = int(ru) // (b - a)
            out_dst.append(dsts[a:b])
            out_c.append(np.full(b - a, c, dtype=np.int64))
        if not out_dst:
            return pa.table({"node": pa.array([], type=pa.int64()), "c": pa.array([], type=pa.int64())})
        dst = np.concatenate(out_dst)
        cs = np.concatenate(out_c)
        # local combine: one row per target per partition
        uniq, inv = np.unique(dst, return_inverse=True)
        summed = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(summed, inv, cs)
        return pa.table({"node": pa.array(uniq, type=pa.int64()), "c": pa.array(summed, type=pa.int64())})

    ranks = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(np.arange(1, n_nodes + 1, dtype=np.int64)),
                "rank_fp": pa.array(np.full(n_nodes, PR_SCALE // n_nodes, dtype=np.int64)),
            }
        )
    ).repartition(num_partitions)
    for _ in range(iters):
        parts = (
            ranks.map_batches(tag, batch_format="pyarrow")
            .groupby("pcell")
            .map_groups(contrib, batch_format="pyarrow")
        )
        summed = parts.groupby("node").aggregate(_Sum("c", alias_name="c"))

        def update(t: pa.Table) -> pa.Table:
            nr = base + (PR_DAMP_NUM * t["c"].to_numpy().astype(np.int64)) // PR_DAMP_DEN
            return pa.table({"node": t["node"], "rank_fp": pa.array(nr, type=pa.int64())})

        ranks = summed.map_batches(update, batch_format="pyarrow").repartition(num_partitions).materialize()
    return ranks


def pagerank_query(sf_dir: str) -> rd.Dataset:
    """queries() surface: full (node, rank_fp) table — golden-checked
    against the identical integer iteration run locally."""
    return pagerank()


# ---------------------------------------------------------------------------
# sampled betweenness centrality (Brandes 2001, exact-rational kernel)
# ---------------------------------------------------------------------------

BTW_SOURCES = 32  # sampled Brandes sources (deterministic stride)
BTW_FP = 10**9  # fixed-point pitch for per-source dependency pins


def _btw_sources(n_nodes: int, k: int) -> np.ndarray:
    """Deterministic stride sample of source nodes (1-based ids)."""
    step = max(1, n_nodes // k)
    return np.arange(1, n_nodes + 1, step, dtype=np.int64)[:k]


_BTW_ADJ: dict = {}  # per-worker cache: ref hex -> adjacency


class BrandesSource:
    """Actor-pool stage: one Brandes pass per SOURCE row — Dijkstra +
    shortest-path DAG dependency accumulation over the broadcast
    symmetrized edge list (ray.put once; per-worker adjacency cache,
    the ST4 pattern).

    EXACT-RATIONAL dependencies: σ counts are Python ints and δ runs
    in ``fractions.Fraction``, pinned ONCE per (source, node) to an
    int64 fixed-point (round-half-up on the exact rational) — so the
    cross-source Sum is shuffle-order-free and the golden oracle (a
    pair-formula recompute, a DIFFERENT algorithm) matches bit-for-bit.

    Scale note: the 576-node fixture graph broadcasts whole; for
    graphs past broadcast size the same per-source rows come from the
    distributed SSSP + level-synchronous backward sweep (sssp()'s
    partition shape), keyed by (source, node) — documented switchover,
    same output contract.
    """

    def __init__(self, edges_ref):
        key = getattr(edges_ref, "hex", lambda: id(edges_ref))()
        adj = _BTW_ADJ.get(key)
        if adj is None:
            e = ray.get(edges_ref) if not isinstance(edges_ref, dict) else edges_ref
            adj = {}
            for s, d, w in zip(e["src"], e["dst"], e["w"]):
                adj.setdefault(int(s), []).append((int(d), int(w)))
                adj.setdefault(int(d), []).append((int(s), int(w)))
            for v in adj:
                adj[v].sort()
            _BTW_ADJ[key] = adj
        self.adj = adj

    def __call__(self, batch: pa.Table) -> pa.Table:
        import heapq
        from fractions import Fraction

        out_node, out_fp = [], []
        for s in batch["source"].to_pylist():
            dist: dict[int, int] = {s: 0}
            sigma: dict[int, int] = {s: 1}
            preds: dict[int, list[int]] = {}
            heap = [(0, s)]
            settled: list[int] = []
            done = set()
            while heap:
                du, u = heapq.heappop(heap)
                if u in done:
                    continue
                done.add(u)
                settled.append(u)
                for v, w in self.adj.get(u, ()):
                    nd = du + w
                    dv = dist.get(v)
                    if dv is None or nd < dv:
                        dist[v] = nd
                        sigma[v] = sigma[u]
                        preds[v] = [u]
                        heapq.heappush(heap, (nd, v))
                    elif nd == dv:
                        sigma[v] += sigma[u]
                        preds[v].append(u)
            delta: dict[int, Fraction] = {v: Fraction(0) for v in settled}
            for v in reversed(settled):
                for u in preds.get(v, ()):
                    delta[u] += Fraction(sigma[u], sigma[v]) * (1 + delta[v])
            for v in settled:
                if v == s:
                    continue
                d = delta[v]
                fp = (d.numerator * BTW_FP * 2 + d.denominator) // (2 * d.denominator)
                if fp:
                    out_node.append(v)
                    out_fp.append(int(fp))
        return pa.table(
            {
                "node": pa.array(out_node, type=pa.int64()),
                "delta_fp": pa.array(out_fp, type=pa.int64()),
            }
        )


class DijkstraSource:
    """Actor-pool stage: one exact Dijkstra per SOURCE row over the
    broadcast edge list (BrandesSource's adjacency cache, no σ/δ) —
    emits per-source reductions only: (source, node, dist) is reduced
    IN-TASK to the harmonic pins and the eccentricity scalar, so task
    output is O(nodes) int64 rows for harmonic / O(1) for ecc."""

    def __init__(self, edges_ref, mode: str = "harmonic"):
        self.inner = BrandesSource(edges_ref)  # reuse the cached adjacency
        self.mode = mode

    def _dists(self, s: int) -> dict[int, int]:
        import heapq

        adj = self.inner.adj
        dist = {s: 0}
        heap = [(0, s)]
        done = set()
        while heap:
            du, u = heapq.heappop(heap)
            if u in done:
                continue
            done.add(u)
            for v, w in adj.get(u, ()):
                nd = du + w
                if nd < dist.get(v, INF):
                    dist[v] = nd
                    heapq.heappush(heap, (nd, v))
        return dist

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "harmonic":
            out_node, out_fp = [], []
            for s in batch["source"].to_pylist():
                for v, d in self._dists(s).items():
                    if v == s:
                        continue
                    # exact round-half-up pin of 1/d at BTW_FP pitch
                    out_node.append(v)
                    out_fp.append((BTW_FP * 2 + d) // (2 * d))
            return pa.table(
                {
                    "node": pa.array(out_node, type=pa.int64()),
                    "inv_fp": pa.array(out_fp, type=pa.int64()),
                }
            )
        rows = []
        for s in batch["source"].to_pylist():
            dist = self._dists(s)
            rows.append((s, max(dist.values()), sum(dist.values()), len(dist)))
        return pa.table(
            {
                "source": pa.array([r[0] for r in rows], type=pa.int64()),
                "eccentricity": pa.array([r[1] for r in rows], type=pa.int64()),
                "sum_dist": pa.array([r[2] for r in rows], type=pa.int64()),
                "n_reached": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        )


def harmonic_centrality(sf_dir: str, k: int = BTW_SOURCES) -> rd.Dataset:
    """Sampled harmonic centrality: H(v) = Σ_s 1/d(s, v) over the
    deterministic source sample — the reach ranking that stays finite
    on disconnected graphs (Boldi & Vigna 2014), complementing
    betweenness' flow ranking.  Pins are exact round-half-up integers
    (1/d at fixed-point), so the node-keyed Sum is order-free and the
    golden all-pairs recompute matches bit-for-bit.

    Output: (node, harmonic) = Σ pins / FP, rounded 6.
    """
    from ray.data.aggregate import Sum as _Sum

    from ..stages.common import duckdb_round as _dr

    n = fixtures.ROAD_N
    e = fixtures.road_world(n)["edges"]
    edges_ref = ray.put(
        {"src": e["src"].to_numpy(), "dst": e["dst"].to_numpy(), "w": e["w"].to_numpy()}
    )
    srcs = rd.from_arrow(pa.table({"source": pa.array(_btw_sources(n * n, k), type=pa.int64())}))
    per_source = srcs.map_batches(
        DijkstraSource,
        fn_constructor_kwargs=dict(edges_ref=edges_ref, mode="harmonic"),
        batch_format="pyarrow",
        batch_size=4,
        concurrency=(1, 8),
    )
    agg = per_source.groupby("node").aggregate(_Sum("inv_fp", alias_name="inv_fp"))

    def finish(t: pa.Table) -> pa.Table:
        h = t["inv_fp"].to_numpy().astype(np.float64) / float(BTW_FP)
        return pa.table(
            {
                "node": t["node"].cast(pa.int64()),
                "harmonic": pa.array(_dr(h, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("node")


def graph_eccentricity(sf_dir: str, k: int = BTW_SOURCES) -> rd.Dataset:
    """Per-sampled-source eccentricity / distance mass over the road
    network: (source, eccentricity, sum_dist, n_reached) — max over
    the rows is the standard diameter LOWER BOUND a sampled sweep
    certifies (exact int64; the network-span audit run before routing
    SLAs are promised).  One Dijkstra per source in the actor pool;
    output is source-bounded.
    """
    n = fixtures.ROAD_N
    e = fixtures.road_world(n)["edges"]
    edges_ref = ray.put(
        {"src": e["src"].to_numpy(), "dst": e["dst"].to_numpy(), "w": e["w"].to_numpy()}
    )
    srcs = rd.from_arrow(pa.table({"source": pa.array(_btw_sources(n * n, k), type=pa.int64())}))
    return srcs.map_batches(
        DijkstraSource,
        fn_constructor_kwargs=dict(edges_ref=edges_ref, mode="ecc"),
        batch_format="pyarrow",
        batch_size=4,
        concurrency=(1, 8),
    ).sort("source")


ALT_LANDMARKS = (1, 24, 553, 576, 288)  # corners + center of the 24x24 grid
ALT_PAIRS = 64  # evaluated (u, v) pairs (deterministic stride sample)


def alt_heuristic_eval(sf_dir: str, n_pairs: int = ALT_PAIRS) -> rd.Dataset:
    """ALT (A*, Landmarks, Triangle inequality; Goldberg & Harrelson
    2005) heuristic-quality audit: for sampled (u, v) pairs, the
    landmark lower bound max_L |d(L,u) − d(L,v)| against the true
    shortest-path distance — the tightness ratio that decides whether
    goal-directed search will actually prune (bound/true → 1 = strong
    pruning, → 0 = useless landmarks); the measured-quality harness
    the engine ships beside ann_recall_eval and count_min_eval.

    Scale shape: one Dijkstra per landmark (actor pool, broadcast
    edges) builds the landmark-distance columns; the evaluated pairs'
    true distances come from per-source Dijkstras on the same pool;
    the comparison joins landmark-bounded tables driver-side.  All
    distances exact int64.  Output: (src, dst, true_dist, alt_bound,
    tightness) rounded 6.
    """
    from ..stages.common import duckdb_round as _dr

    n = fixtures.ROAD_N
    e = fixtures.road_world(n)["edges"]
    edges_ref = ray.put(
        {"src": e["src"].to_numpy(), "dst": e["dst"].to_numpy(), "w": e["w"].to_numpy()}
    )
    n_nodes = n * n
    # deterministic (u, v) pair sample: strided, u < v
    us = _btw_sources(n_nodes, n_pairs)
    vs = ((us * 7919 + 131) % n_nodes + 1).astype(np.int64)  # spread partners
    vs = np.where(vs == us, (vs % n_nodes) + 1, vs)

    # distances FROM each landmark and FROM each evaluated source, all
    # through the same Dijkstra actor pool (undirected graph: d(L,u)
    # from L's run serves both directions)
    srcs = sorted(set(ALT_LANDMARKS) | set(us.tolist()))
    src_ds = rd.from_arrow(pa.table({"source": pa.array(srcs, type=pa.int64())}))

    class DistRows(DijkstraSource):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            out_s, out_v, out_d = [], [], []
            for s in batch["source"].to_pylist():
                for v, d in self._dists(s).items():
                    out_s.append(s)
                    out_v.append(v)
                    out_d.append(d)
            return pa.table(
                {
                    "source": pa.array(out_s, type=pa.int64()),
                    "node": pa.array(out_v, type=pa.int64()),
                    "dist": pa.array(out_d, type=pa.int64()),
                }
            )

    dist_tbl = (
        src_ds.map_batches(
            DistRows,
            fn_constructor_kwargs=dict(edges_ref=edges_ref),
            batch_format="pyarrow",
            batch_size=4,
            concurrency=(1, 8),
        )
        .to_pandas()
    )
    dmap: dict[tuple[int, int], int] = {
        (int(s), int(v)): int(d)
        for s, v, d in zip(dist_tbl["source"], dist_tbl["node"], dist_tbl["dist"])
    }
    rows = []
    for u, v in zip(us.tolist(), vs.tolist()):
        true = dmap[(u, v)] if (u, v) in dmap else dmap[(v, u)]
        bound = max(abs(dmap[(L, u)] - dmap[(L, v)]) for L in ALT_LANDMARKS)
        rows.append((u, v, true, bound))
    true_a = np.array([r[2] for r in rows], dtype=np.float64)
    bound_a = np.array([r[3] for r in rows], dtype=np.float64)
    tight = _dr(bound_a / np.maximum(true_a, 1.0), 6)
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], type=pa.int64()),
                "dst": pa.array([r[1] for r in rows], type=pa.int64()),
                "true_dist": pa.array([r[2] for r in rows], type=pa.int64()),
                "alt_bound": pa.array([r[3] for r in rows], type=pa.int64()),
                "tightness": pa.array(tight, type=pa.float64()),
            }
        )
    )


def betweenness_sampled(sf_dir: str, k: int = BTW_SOURCES) -> rd.Dataset:
    """Sampled betweenness centrality of the road network (Brandes
    source sampling): the "which junctions carry the traffic"
    ranking behind congestion-aware routing and network hardening —
    the path-structure complement of pagerank's stationary-visit
    ranking.  Undirected pair dependencies are HALVED (each unordered
    pair counted from one direction), matching the classic
    normalization.

    Scale shape: sources are a Dataset; each Brandes pass is one
    actor-pool task against the broadcast edge list (K tasks in
    parallel, graph ships once per worker); the cross-source fold is
    ONE node-keyed Sum of int64 pins.  Output: (node, betweenness)
    where betweenness = (Σ delta_fp) / FP / 2, rounded 6.
    """
    from ray.data.aggregate import Sum as _Sum

    from ..stages.common import duckdb_round as _dr

    n = fixtures.ROAD_N
    e = fixtures.road_world(n)["edges"]
    edges_ref = ray.put(
        {"src": e["src"].to_numpy(), "dst": e["dst"].to_numpy(), "w": e["w"].to_numpy()}
    )
    srcs = rd.from_arrow(pa.table({"source": pa.array(_btw_sources(n * n, k), type=pa.int64())}))
    per_source = srcs.map_batches(
        BrandesSource,
        fn_constructor_kwargs=dict(edges_ref=edges_ref),
        batch_format="pyarrow",
        batch_size=4,
        concurrency=(1, 8),
    )
    agg = per_source.groupby("node").aggregate(_Sum("delta_fp", alias_name="delta_fp"))

    def finish(t: pa.Table) -> pa.Table:
        b = t["delta_fp"].to_numpy().astype(np.float64) / float(BTW_FP) / 2.0
        return pa.table(
            {
                "node": t["node"].cast(pa.int64()),
                "betweenness": pa.array(_dr(b, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("node")


CHEAP_W_CUT = 1300  # keep edges with w < cut: ~30% of [1000, 1977) -> percolation islands


def road_cheap_components(sf_dir: str, w_cut: int = CHEAP_W_CUT) -> rd.Dataset:
    """Percolation components of the road network: keep only edges
    cheaper than ``w_cut`` and label the surviving connectivity islands
    — the sub-threshold connectivity question ('what can I reach on
    cheap roads alone?') behind toll-free routing and network-
    resilience audits, and the pipeline exercise of DISTRIBUTED
    connected components on a graph that genuinely fragments (the full
    lattice is one component; the cheap subgraph is hundreds).

    Scale shape: the edge filter is map-only; components come from
    cluster.connected_components' min-label propagation (each round =
    one key-partitioned join + min reduce, O(diameter) rounds); the
    final size histogram is one label-keyed count.  Nodes with no cheap
    edge form no row (documented: singletons are excluded).

    Output: (component, n_nodes) sorted by component — component id is
    the minimum node id of the island.
    """
    from .cluster import connected_components

    e = fixtures.road_world()["edges"]
    pairs = rd.from_arrow(e).filter(expr=f"w < {w_cut}")
    # num_partitions sizes the per-round label join: 2 fits the fixture
    # lattice (576 nodes); at planet scale raise toward cluster cores
    labels = connected_components(pairs, a_col="src", b_col="dst", num_partitions=2)
    from ray.data.aggregate import Count

    out = labels.groupby("label").aggregate(Count(alias_name="n_nodes")).sort("label")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "component": pa.array(t["label"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_nodes": pa.array(t["n_nodes"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


PERC_CUTS = (1150, 1300, 1450, 1600, 1750)  # weight-threshold ladder


def percolation_curve(sf_dir: str, cuts: tuple[int, ...] = PERC_CUTS) -> rd.Dataset:
    """Bond-percolation sweep of the road network: for a ladder of
    weight thresholds keep only edges with w < cut and measure the
    fragment structure — n_components, nodes touched, and the GIANT
    COMPONENT fraction — the curve whose knee locates the percolation
    transition (the resilience question "how much of the network
    survives if only cheap links are usable?", the sweep form of
    road_components' single cut).

    Scale shape: each rung is a map-only edge filter + the distributed
    min-label connected components (O(diameter) rounds of bounded
    joins); the per-rung reduction is label-keyed counts.  Rungs run
    sequentially (each is itself fully parallel).  Output: (w_cut,
    n_edges, n_nodes, n_components, giant_nodes, giant_frac).
    """
    from ray.data.aggregate import Count, Max

    from ..stages.common import duckdb_round as _dr

    from .cluster import connected_components

    e = fixtures.road_world()["edges"]
    rows = []
    for cut in cuts:
        pairs = rd.from_arrow(e).filter(expr=f"w < {cut}")
        n_edges = pairs.count()
        if n_edges == 0:
            rows.append((cut, 0, 0, 0, 0, 0.0))
            continue
        labels = connected_components(pairs, a_col="src", b_col="dst", num_partitions=2)
        sizes = labels.groupby("label").aggregate(Count(alias_name="n_nodes"))
        comp = sizes.to_pandas()  # component-size table: <= touched-node rows, never edges
        n_nodes = int(comp["n_nodes"].sum())
        giant = int(comp["n_nodes"].max())
        rows.append((cut, n_edges, n_nodes, len(comp), giant, giant / n_nodes))
    import pyarrow as _pa

    return rd.from_arrow(
        _pa.table(
            {
                "w_cut": _pa.array([r[0] for r in rows], type=_pa.int64()),
                "n_edges": _pa.array([r[1] for r in rows], type=_pa.int64()),
                "n_nodes": _pa.array([r[2] for r in rows], type=_pa.int64()),
                "n_components": _pa.array([r[3] for r in rows], type=_pa.int64()),
                "giant_nodes": _pa.array([r[4] for r in rows], type=_pa.int64()),
                "giant_frac": _pa.array(
                    _dr(np.array([r[5] for r in rows], dtype=np.float64), 6), type=_pa.float64()
                ),
            }
        )
    )


def bridge_edges(sf_dir: str) -> rd.Dataset:
    """Bridge (cut-edge) census of the road network: edges whose
    removal disconnects their endpoints (Tarjan 1974 low-link over an
    iterative DFS) — the single-point-of-failure audit beside the
    percolation sweep (a bridge is infrastructure no rerouting can
    absorb).  The full lattice has none (it's 2-edge-connected); the
    audit runs on the CHEAP subgraph (w < CHEAP_W_CUT), whose
    percolation islands genuinely grow bridges.

    Scale shape: the cheap edge filter is map-only; the low-link pass
    runs on the broadcast subgraph in ONE task (fixture-sized; at
    broadcast-breaking scale the standard swap-in is spanning-forest +
    chain decomposition over the same partitioned exchanges as
    connected_components — documented).  Golden oracle: per-edge
    removal-BFS (a different algorithm entirely).

    Output: (src, dst, w) for bridges only, src < dst, sorted.
    """
    e = fixtures.road_world()["edges"]
    w = e["w"].to_numpy()
    m = w < CHEAP_W_CUT
    src = e["src"].to_numpy()[m]
    dst = e["dst"].to_numpy()[m]
    ww = w[m]

    adj: dict[int, list[tuple[int, int]]] = {}
    for i, (a, b) in enumerate(zip(src.tolist(), dst.tolist())):
        adj.setdefault(a, []).append((b, i))
        adj.setdefault(b, []).append((a, i))
    for v in adj:
        adj[v].sort()

    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    timer = 0
    bridges: list[int] = []
    for root in sorted(adj):
        if root in disc:
            continue
        stack: list[tuple[int, int, int]] = [(root, -1, 0)]  # (node, in-edge idx, child ptr)
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            v, pe, ptr = stack[-1]
            if ptr < len(adj[v]):
                stack[-1] = (v, pe, ptr + 1)
                u, ei = adj[v][ptr]
                if ei == pe:
                    continue
                if u in disc:
                    low[v] = min(low[v], disc[u])
                else:
                    disc[u] = low[u] = timer
                    timer += 1
                    stack.append((u, ei, 0))
            else:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[v])
                    if low[v] > disc[p]:
                        bridges.append(pe)

    bridges_sorted = sorted(bridges)
    bs = src[bridges_sorted]
    bd = dst[bridges_sorted]
    bw = ww[bridges_sorted]
    a = np.minimum(bs, bd)
    b = np.maximum(bs, bd)
    order = np.lexsort((b, a))
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(a[order], type=pa.int64()),
                "dst": pa.array(b[order], type=pa.int64()),
                "w": pa.array(bw[order], type=pa.int64()),
            }
        )
    )


DETOUR_FP = 10**9  # fixed-point pitch for the euclidean denominator


def detour_ratio(sf_dir: str, n_pairs: int = ALT_PAIRS) -> rd.Dataset:
    """Network circuity (detour ratio) for the sampled OD pairs:
    network shortest distance over straight-line grid distance — the
    "how much longer than the crow flies" factor transport planning
    reports per corridor (well-connected grids sit near 1.2-1.4;
    spikes flag barriers).  Reuses alt_heuristic_eval's deterministic
    pair sample and the same Dijkstra actor pool.

    Determinism: network distances are exact int64; the euclidean
    denominator uses exact integer grid coordinates and unit edge
    cost ROAD_BASE_W (the weight floor — documented normalization:
    ratios are >= 1 only up to the weight spread), pinned once per
    pair at DETOUR_FP.  Output: (src, dst, net_dist, eucl_fp,
    detour) rounded 6.
    """
    from ..stages.common import duckdb_round as _dr

    n = fixtures.ROAD_N
    e = fixtures.road_world(n)["edges"]
    edges_ref = ray.put(
        {"src": e["src"].to_numpy(), "dst": e["dst"].to_numpy(), "w": e["w"].to_numpy()}
    )
    n_nodes = n * n
    us = _btw_sources(n_nodes, n_pairs)
    vs = ((us * 7919 + 131) % n_nodes + 1).astype(np.int64)
    vs = np.where(vs == us, (vs % n_nodes) + 1, vs)
    srcs = sorted(set(us.tolist()))
    src_ds = rd.from_arrow(pa.table({"source": pa.array(srcs, type=pa.int64())}))

    class PairDist(DijkstraSource):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            out_s, out_v, out_d = [], [], []
            want: dict[int, list[int]] = {}
            for u, v in zip(us.tolist(), vs.tolist()):
                want.setdefault(u, []).append(v)
            for s in batch["source"].to_pylist():
                dist = self._dists(s)
                for v in want.get(s, ()):
                    out_s.append(s)
                    out_v.append(v)
                    out_d.append(dist[v])
            return pa.table(
                {
                    "src": pa.array(out_s, type=pa.int64()),
                    "dst": pa.array(out_v, type=pa.int64()),
                    "net_dist": pa.array(out_d, type=pa.int64()),
                }
            )

    tbl = src_ds.map_batches(
        PairDist,
        fn_constructor_kwargs=dict(edges_ref=edges_ref),
        batch_format="pyarrow",
        batch_size=4,
        concurrency=(1, 8),
    ).to_pandas()  # bounded: |sources| x k candidate rows

    def grid_xy(node: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return (node - 1) % n, (node - 1) // n

    sx, sy = grid_xy(tbl["src"].to_numpy().astype(np.int64))
    dx, dy = grid_xy(tbl["dst"].to_numpy().astype(np.int64))
    d2 = (sx - dx) ** 2 + (sy - dy) ** 2
    eucl_fp = np.floor(
        np.sqrt(d2.astype(np.float64)) * float(fixtures.ROAD_BASE_W) * DETOUR_FP + 0.5
    ).astype(np.int64)
    detour = _dr(
        tbl["net_dist"].to_numpy().astype(np.float64)
        / (eucl_fp.astype(np.float64) / DETOUR_FP),
        6,
    )
    order = np.lexsort((tbl["dst"].to_numpy(), tbl["src"].to_numpy()))
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(tbl["src"].to_numpy()[order], type=pa.int64()),
                "dst": pa.array(tbl["dst"].to_numpy()[order], type=pa.int64()),
                "net_dist": pa.array(tbl["net_dist"].to_numpy()[order], type=pa.int64()),
                "eucl_fp": pa.array(eucl_fp[order], type=pa.int64()),
                "detour": pa.array(detour[order], type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# mst_boruvka (distributed minimum spanning tree)
# ---------------------------------------------------------------------------

MST_MAX_ROUNDS = 32


def _mst_pack(w: np.ndarray, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Total-order edge key (w, src, dst) packed into one int64 so a
    plain Min aggregate picks the lexicographic minimum.  Bounds:
    w < 2^22, node ids < 2^20 (fixture: w < 2^11, ids < 2^10).  At
    planet scale swap for a two-column (w, edge_id) struct min — the
    shape is identical."""
    # enforce the packing bounds loudly: a silent overflow would make
    # keys collide and corrupt the MST (the link_prediction lesson)
    assert len(w) == 0 or (
        int(w.max()) < (1 << 22) and int(src.max()) < (1 << 20) and int(dst.max()) < (1 << 20)
        and int(w.min()) >= 0 and int(src.min()) >= 0 and int(dst.min()) >= 0
    ), "mst_pack bounds exceeded: need w < 2^22, node ids < 2^20"
    return (w << np.int64(40)) | (src << np.int64(20)) | dst


def mst_boruvka(n: int | None = None, num_partitions: int = NUM_PARTS) -> rd.Dataset:
    """Minimum spanning tree of the road graph by DISTRIBUTED Borůvka
    — the one MST algorithm whose rounds are pure data-parallel
    reduces (no priority queue, no sequential edge scan), which is why
    every Pregel/MapReduce-era graph library used it.

    Round structure (all Ray Data exchanges, no driver graph state):
      1. attach current component labels to both edge endpoints
         (two hash joins against the (node, comp) table);
      2. drop intra-component edges; if none remain -> forest done;
      3. per-component minimum outgoing edge: explode each surviving
         edge to (comp_a, ekey) and (comp_b, ekey) rows, ONE
         groupby(comp).min(ekey) — the classic "find cheapest hook";
      4. the chosen edges join the forest (distinct ekey: the same
         edge may be picked from both sides — that is Borůvka's
         correctness core, not an error);
      5. contract: connected components over the chosen
         (comp_a, comp_b) graph (plus (c, c) self-rows so the mapping
         is total) relabel every node — the pointer-jumping CC is the
         same distributed kernel the dedup manifest uses.

    Components at least halve per round, so rounds <= log2(V); each
    round's exchanges are edge-linear.  Tie-break: edges are totally
    ordered by (w, src, dst) — packed into one int64 key — so the MST
    is UNIQUE and bit-identical to the golden Kruskal recompute
    (golden.mst_boruvka_path), which is a deliberately different
    algorithm over the same total order.

    Output: the V-1 tree edges (src, dst, w), int64.
    """
    from .cluster import connected_components

    if n is None:
        n = fixtures.ROAD_N
    e = fixtures.road_world(n)["edges"]
    src0 = e["src"].to_numpy()
    dst0 = e["dst"].to_numpy()
    w0 = e["w"].to_numpy()
    ekey0 = _mst_pack(w0, src0, dst0)
    edges = rd.from_arrow(
        pa.table(
            {
                "esrc": pa.array(src0, type=pa.int64()),
                "edst": pa.array(dst0, type=pa.int64()),
                "ekey": pa.array(ekey0, type=pa.int64()),
            }
        )
    ).repartition(num_partitions)
    node_ids = np.arange(1, n * n + 1, dtype=np.int64)
    labels = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(node_ids, type=pa.int64()),
                "comp": pa.array(node_ids, type=pa.int64()),
            }
        )
    ).repartition(num_partitions)

    from ..stages.common import safe_join

    chosen_parts: list[rd.Dataset] = []
    for _ in range(MST_MAX_ROUNDS):
        # 1-2: label both endpoints, keep cross-component edges
        ja = safe_join(
            edges,
            labels.map_batches(
                lambda t: pa.table({"node": t["node"], "ca": t["comp"]}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("esrc",),
            right_on=("node",),
        )
        jb = safe_join(
            ja,
            labels.map_batches(
                lambda t: pa.table({"node": t["node"], "cb": t["comp"]}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("edst",),
            right_on=("node",),
        ).filter(expr="ca != cb")
        cross = jb.materialize()
        if cross.count() == 0:
            break
        # 3: cheapest outgoing edge per component
        def explode(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "comp": pa.array(
                        np.concatenate([t["ca"].to_numpy(), t["cb"].to_numpy()]),
                        type=pa.int64(),
                    ),
                    "ekey": pa.array(
                        np.concatenate([t["ekey"].to_numpy(), t["ekey"].to_numpy()]),
                        type=pa.int64(),
                    ),
                }
            )

        picked = (
            cross.map_batches(explode, batch_format="pyarrow")
            .groupby("comp")
            .aggregate(Min("ekey", alias_name="ekey"))
        )
        # 4: distinct chosen edges -> forest; recover endpoints' comps
        chosen = picked.groupby("ekey").aggregate(Min("comp", alias_name="_c")).drop_columns(["_c"])
        chosen_parts.append(chosen)
        hook = safe_join(
            chosen,
            cross.map_batches(
                lambda t: pa.table({"ekey": t["ekey"], "ca": t["ca"], "cb": t["cb"]}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("ekey",),
        )
        # 5: contract the component graph (self-rows make the map total)
        comp_pairs = hook.map_batches(
            lambda t: pa.table({"a": t["ca"], "b": t["cb"]}), batch_format="pyarrow"
        ).union(
            labels.map_batches(
                lambda t: pa.table({"a": t["comp"], "b": t["comp"]}),
                batch_format="pyarrow",
            )
        )
        cmap = connected_components(comp_pairs, a_col="a", b_col="b")
        labels = safe_join(
            labels,
            cmap.map_batches(
                lambda t: pa.table({"oldc": t["node"], "newc": t["label"]}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("comp",),
            right_on=("oldc",),
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "comp": t["newc"]}),
            batch_format="pyarrow",
        ).materialize()

    forest = chosen_parts[0]
    for part in chosen_parts[1:]:
        forest = forest.union(part)
    forest = forest.groupby("ekey").aggregate(Count(alias_name="_n")).drop_columns(["_n"])

    def unpack(t: pa.Table) -> pa.Table:
        k = t["ekey"].to_numpy()
        return pa.table(
            {
                "src": pa.array((k >> np.int64(20)) & np.int64((1 << 20) - 1), type=pa.int64()),
                "dst": pa.array(k & np.int64((1 << 20) - 1), type=pa.int64()),
                "w": pa.array(k >> np.int64(40), type=pa.int64()),
            }
        )

    return forest.map_batches(unpack, batch_format="pyarrow")


def mst_boruvka_query(sf_dir: str) -> rd.Dataset:
    """queries() surface: the unique tie-broken MST edge table,
    golden-oracled against a Kruskal recompute (a different algorithm
    over the same total order — equal output is an algorithmic
    cross-proof, not a replay)."""
    return mst_boruvka()


# ---------------------------------------------------------------------------
# tsp_tours (per-zone greedy + 2-opt patrol tours)
# ---------------------------------------------------------------------------

TSP_FP = 1e9  # fixed-point planar distance quantum (trajectory.FP_SCALE convention)
TSP_MAX_PASSES = 10


def _tsp_dist_fp(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Pairwise planar distances fixed to int64 ONCE — every tour
    comparison afterwards is exact integer arithmetic."""
    dl = lon[:, None] - lon[None, :]
    dt = lat[:, None] - lat[None, :]
    return np.floor(np.sqrt(dl * dl + dt * dt) * TSP_FP + 0.5).astype(np.int64)


def _tsp_tour(d: np.ndarray) -> tuple[np.ndarray, int, int, int]:
    """Deterministic nearest-neighbor tour from node 0 + 2-opt descent.
    Returns (order, nn_len, tour_len, n_improve); all lengths are
    CLOSED-tour exact int64 sums of the fixed-point matrix."""
    n = d.shape[0]
    unvisited = list(range(1, n))
    order = [0]
    while unvisited:
        cur = order[-1]
        best = min(unvisited, key=lambda j: (int(d[cur, j]), j))
        order.append(best)
        unvisited.remove(best)
    tour = np.array(order, dtype=np.int64)

    def closed_len(t: np.ndarray) -> int:
        return int(d[t, np.roll(t, -1)].sum())

    nn_len = closed_len(tour)
    improves = 0
    for _ in range(TSP_MAX_PASSES):
        improved = False
        for i in range(n - 1):
            for j in range(i + 2, n):
                if i == 0 and j == n - 1:
                    continue  # would reverse the whole tour
                a, b = int(tour[i]), int(tour[i + 1])
                c, e = int(tour[j]), int(tour[(j + 1) % n])
                if int(d[a, b]) + int(d[c, e]) > int(d[a, c]) + int(d[b, e]):
                    tour[i + 1 : j + 1] = tour[i + 1 : j + 1][::-1]
                    improves += 1
                    improved = True
        if not improved:
            break
    return tour, nn_len, closed_len(tour), improves


def tsp_tours(sf_dir: str) -> rd.Dataset:
    """Per-district patrol tours over the POI layer: deterministic
    nearest-neighbor construction + exact-integer 2-opt descent, one
    tour per level-8 admin district — the route-planning primitive
    (inspection rounds, delivery loops) a geo platform answers after
    "which POIs are in this zone".

    Scale shape: POI→district assignment is a map-only pass against
    the broadcast rect table; ONE district-keyed groupby co-locates
    each zone's POIs; the O(n²)-per-zone tour DP runs inside
    map_groups (per-zone n is city-block-bounded — the sessionize
    per-key contract; cap + log at planetary POI densities).  All
    pairwise distances are fixed to int64 ONCE, so NN choices, 2-opt
    accepts and final lengths are bit-stable; the golden re-derives
    the descent independently and Held-Karp-checks each zone
    (opt <= tour_len <= nn_len).

    Output: (rel_id, n_pois, nn_len_fp, tour_len_fp, n_improve) —
    2-opt never lengthens: tour_len_fp <= nn_len_fp.
    """
    from ray.data.aggregate import Count as AggCount  # noqa: F401  (symmetry with siblings)

    rects = [r for r in fixtures.admin_rects() if r["admin_level"] == 8]
    lon_min = np.array([r["lon_min"] for r in rects])
    lon_max = np.array([r["lon_max"] for r in rects])
    lat_min = np.array([r["lat_min"] for r in rects])
    lat_max = np.array([r["lat_max"] for r in rects])
    rel_ids = np.array([r["rel_id"] for r in rects], dtype=np.int64)

    pois = rd.from_arrow(fixtures.make_pois())

    def assign(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        inside = (
            (lon[:, None] >= lon_min[None, :])
            & (lon[:, None] < lon_max[None, :])
            & (lat[:, None] >= lat_min[None, :])
            & (lat[:, None] < lat_max[None, :])
        )
        hit = inside.any(axis=1)
        zone = rel_ids[np.argmax(inside, axis=1)]
        return pa.table(
            {
                "rel_id": pa.array(zone[hit], type=pa.int64()),
                "poi_id": pa.array(t["poi_id"].to_numpy()[hit], type=pa.int64()),
                "lon": pa.array(lon[hit], type=pa.float64()),
                "lat": pa.array(lat[hit], type=pa.float64()),
            }
        )

    def tour_group(g: pa.Table) -> pa.Table:
        order = np.argsort(g["poi_id"].to_numpy())
        lon = g["lon"].to_numpy()[order]
        lat = g["lat"].to_numpy()[order]
        rel = int(g["rel_id"][0].as_py())
        n = len(lon)
        if n < 2:
            return pa.table(
                {
                    "rel_id": pa.array([rel], type=pa.int64()),
                    "n_pois": pa.array([n], type=pa.int64()),
                    "nn_len_fp": pa.array([0], type=pa.int64()),
                    "tour_len_fp": pa.array([0], type=pa.int64()),
                    "n_improve": pa.array([0], type=pa.int64()),
                }
            )
        d = _tsp_dist_fp(lon, lat)
        _, nn_len, tour_len, improves = _tsp_tour(d)
        return pa.table(
            {
                "rel_id": pa.array([rel], type=pa.int64()),
                "n_pois": pa.array([n], type=pa.int64()),
                "nn_len_fp": pa.array([nn_len], type=pa.int64()),
                "tour_len_fp": pa.array([tour_len], type=pa.int64()),
                "n_improve": pa.array([improves], type=pa.int64()),
            }
        )

    return (
        pois.map_batches(assign, batch_format="pyarrow")
        .groupby("rel_id")
        .map_groups(tour_group, batch_format="pyarrow")
    )


def tsp_tours_query(sf_dir: str) -> rd.Dataset:
    """queries() surface (POI layer is the fixture table, sf-invariant
    like the other POI queries); the golden re-derives the
    fixed-point descent independently with a Held-Karp optimum
    cross-check per zone."""
    return tsp_tours(sf_dir)


# ---------------------------------------------------------------------------
# traffic_assignment (all-or-nothing OD flow loading)
# ---------------------------------------------------------------------------

_TA_EDGES_CACHE: dict = {}  # per-worker: ref hex -> symmetrized adjacency


def _ta_adj(edges_ref) -> dict:
    key = getattr(edges_ref, "hex", lambda: id(edges_ref))()
    adj = _TA_EDGES_CACHE.get(key)
    if adj is None:
        e = ray.get(edges_ref) if not isinstance(edges_ref, dict) else edges_ref
        src = np.concatenate([e["src"], e["dst"]])
        dst = np.concatenate([e["dst"], e["src"]])
        w = np.concatenate([e["w"], e["w"]])
        order = np.lexsort((dst, src))
        src, dst, w = src[order], dst[order], w[order]
        uniq, starts = np.unique(src, return_index=True)
        ends = np.append(starts[1:], len(src))
        adj = {
            "index": {int(u): (int(a), int(b)) for u, a, b in zip(uniq, starts, ends)},
            "dst": dst,
            "w": w,
        }
        _TA_EDGES_CACHE[key] = adj
    return adj


def _ta_paths_for_source(adj: dict, source: int, dests: np.ndarray, demands: np.ndarray) -> dict:
    """Dijkstra from ``source`` with the DETERMINISTIC predecessor rule
    pred(v) = min{ u : dist[u] + w(u,v) == dist[v] } (argmin over the
    sorted adjacency — a pure function of the exact int distances, so
    any implementation reproduces the same unique path tree).  Loads
    ``demands`` onto the tree edges of each dest's path; returns
    {(a, b) undirected-normalized: flow}."""
    import heapq

    INF_ = 1 << 62
    dist: dict[int, int] = {source: 0}
    heap = [(0, source)]
    while heap:
        du, u = heapq.heappop(heap)
        if du > dist.get(u, INF_):
            continue
        rng = adj["index"].get(u)
        if rng is None:
            continue
        a, b = rng
        for k in range(a, b):
            v = int(adj["dst"][k])
            nd = du + int(adj["w"][k])
            if nd < dist.get(v, INF_):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    # deterministic predecessor: smallest optimal in-neighbor
    flows: dict[tuple[int, int], int] = {}
    pred_cache: dict[int, int] = {}

    def pred(v: int) -> int:
        p = pred_cache.get(v)
        if p is not None:
            return p
        best = -1
        rng = adj["index"].get(v)
        if rng is not None:
            a, b = rng
            for k in range(a, b):
                u = int(adj["dst"][k])
                if u in dist and dist[u] + int(adj["w"][k]) == dist[v] and (best < 0 or u < best):
                    best = u
        pred_cache[v] = best
        return best

    for d, dem in zip(dests.tolist(), demands.tolist()):
        v = int(d)
        if v not in dist or v == source:
            continue
        while v != source:
            u = pred(v)
            if u < 0:
                break
            a, b = (u, v) if u < v else (v, u)
            flows[(a, b)] = flows.get((a, b), 0) + int(dem)
            v = u
    return flows


def nearest_road_node(lon: np.ndarray, lat: np.ndarray, n: int) -> np.ndarray:
    """Exact nearest lattice node (the road grid is uniform over the
    world bbox, so 'nearest' is integer rounding — no search)."""
    gx = np.clip(np.floor((lon - fixtures.LON_MIN) / fixtures.LON_SPAN * (n - 1) + 0.5), 0, n - 1)
    gy = np.clip(np.floor((lat - fixtures.LAT_MIN) / fixtures.LAT_SPAN * (n - 1) + 0.5), 0, n - 1)
    return (gy.astype(np.int64) * n + gx.astype(np.int64) + 1)


def traffic_assignment(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """All-or-nothing traffic assignment: every user's (first event ->
    last event) trip, snapped to the road lattice, loads its demand
    onto the exact shortest path — the edge-flow map ("which road
    segments carry the traffic") that closes the loop between the
    mobility layer (od_matrix) and the road layer (sssp/betweenness):
    transport modeling's AON step, the inner loop of Frank-Wolfe
    equilibrium assignment.

    Determinism: integer weights make shortest distances exact; the
    predecessor rule (smallest optimal in-neighbor) makes the path
    TREE unique, so edge flows are exact integers any implementation
    reproduces (golden: Bellman-Ford distances + the same rule).

    Scale shape: the OD extraction is od_matrix's two-stage extreme
    scan (per-batch first/last combiner -> user-sharded run-scan);
    OD pairs groupby the SOURCE node so each actor task loads one
    source's paths against the broadcast graph (edges ship once per
    worker, the betweenness_sampled shape); the edge fold is ONE
    (a, b)-keyed Sum.  Output: (src, dst, w, flow) for loaded edges.
    """
    from ray.data.aggregate import Sum as _Sum

    from .trajectory import _derive_positions, _read_events

    n = fixtures.ROAD_N
    e = fixtures.road_world(n)["edges"]
    edges_ref = ray.put(
        {"src": e["src"].to_numpy(), "dst": e["dst"].to_numpy(), "w": e["w"].to_numpy()}
    )
    wmap = {(int(a), int(b)): int(ww) for a, b, ww in zip(e["src"].to_numpy(), e["dst"].to_numpy(), e["w"].to_numpy())}
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def extremes(t: pa.Table) -> pa.Table:
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = t["user_id"].to_numpy()
        if len(uid) == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "ts": pa.array([], type=pa.timestamp("us")),
                    "part": pa.array([], type=pa.int64()),
                }
            )
        bounds = np.nonzero(np.diff(uid))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(uid)]])
        keep = np.unique(np.concatenate([starts, ends - 1]))
        t = t.select(["event_id", "user_id", "ts"]).take(pa.array(keep))
        part = np.asarray(t["user_id"].to_numpy(), np.int64) % parts
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def od_nodes(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        g = _derive_positions(g)
        uid = g["user_id"].to_numpy()
        if len(uid) == 0:
            return pa.table(
                {"o_node": pa.array([], type=pa.int64()), "d_node": pa.array([], type=pa.int64())}
            )
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        node = nearest_road_node(lon, lat, n)
        bounds = np.nonzero(np.diff(uid))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(uid)]]) - 1
        return pa.table(
            {
                "o_node": pa.array(node[starts], type=pa.int64()),
                "d_node": pa.array(node[ends], type=pa.int64()),
            }
        )

    od = (
        ds.map_batches(extremes, batch_format="pyarrow")
        .groupby("part")
        .map_groups(od_nodes, batch_format="pyarrow")
        .groupby(["o_node", "d_node"])
        .aggregate(Count(alias_name="demand"))
        .filter(expr="o_node != d_node")
    )

    def load_source(g: pa.Table) -> pa.Table:
        adj = _ta_adj(edges_ref)
        src = int(g["o_node"][0].as_py())
        flows = _ta_paths_for_source(
            adj, src, g["d_node"].to_numpy(), g["demand"].to_numpy()
        )
        if not flows:
            return pa.table(
                {"ea": pa.array([], type=pa.int64()), "eb": pa.array([], type=pa.int64()), "flow": pa.array([], type=pa.int64())}
            )
        ab = np.array(sorted(flows), dtype=np.int64)
        fl = np.array([flows[(int(a), int(b))] for a, b in ab], dtype=np.int64)
        return pa.table(
            {
                "ea": pa.array(ab[:, 0], type=pa.int64()),
                "eb": pa.array(ab[:, 1], type=pa.int64()),
                "flow": pa.array(fl, type=pa.int64()),
            }
        )

    loaded = (
        od.groupby("o_node")
        .map_groups(load_source, batch_format="pyarrow")
        .groupby(["ea", "eb"])
        .aggregate(_Sum("flow", alias_name="flow"))
    )

    def finish(t: pa.Table) -> pa.Table:
        a = t["ea"].to_numpy()
        b = t["eb"].to_numpy()
        w = np.array([wmap[(int(x), int(y))] for x, y in zip(a, b)], dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(a, type=pa.int64()),
                "dst": pa.array(b, type=pa.int64()),
                "w": pa.array(w, type=pa.int64()),
                "flow": t["flow"],
            }
        )

    return loaded.map_batches(finish, batch_format="pyarrow")
