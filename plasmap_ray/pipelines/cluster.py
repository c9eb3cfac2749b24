"""Near-duplicate CLUSTERING — the last mile of a dedup pipeline.

The pair generators (``dedup.minhash_near_dup`` & friends) emit edges;
a real training-data pipeline must then pick ONE survivor per connected
component ("keep the canonical copy, drop the rest").  The reference
stops at bloom-filter pair suppression (Queries.scala:297,330,340);
this module adds the component step as an iterative Ray Data job:

- :func:`connected_components` — min-label propagation expressed as
  ``hash join + groupby(min)`` per round.  Every round is ONE shuffle
  of the (node, label) table against the symmetrized edge table; the
  loop converges in O(component diameter) rounds (near-dup components
  are star/clique-shaped — diameter 1-3 in practice; for adversarial
  long-path graphs swap the relay step for large-star/small-star
  contraction, which is O(log n) rounds of the same join+min shape).
  State between rounds is the materialized labels Dataset — edges are
  materialized ONCE and re-probed each round.

- :func:`near_dup_clusters` — the end-to-end query: MinHash-LSH pairs
  -> components -> left join back onto the corpus so UNPAIRED docs
  become singleton clusters -> (doc_id, cluster_id, keep) where
  ``cluster_id`` is the component's minimum doc_id and ``keep`` marks
  the survivor.  ``SUM(keep) == COUNT(DISTINCT cluster_id)`` by
  construction.

- :func:`bloom_dedup` — ST3 parity: the reference's APPROXIMATE
  first-wins dedup (bloom filter per stream, false-positive drops
  allowed; Queries.scala:297 budgets (1000, 0.01)).  Rebuilt
  deterministically: keys hash-partition, each partition scans its
  rows in doc_id order through a seeded double-hashing Bloom filter.
  Partitioning and scan order are functions of the DATA, so output is
  stable across schedulers/shuffles — unlike the reference's
  arrival-order stream semantics.  A ``false_drop`` column marks rows
  a bloom false positive dropped that exact dedup would have kept
  (computable here because the per-partition exact key set fits in the
  task; at 10^12 rows the column is what you'd sample to MEASURE the
  configured FP budget, not compute exhaustively).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from .. import cells, fixtures
from ..stages.common import safe_join

logger = logging.getLogger(__name__)

CC_JOIN_PARTITIONS = 16
CC_MAX_ITERS = 30
CC_LOCAL_MAX_EDGES = 2_000_000  # below this, one union-find task beats the round loop


def _sym_edges(pairs: rd.Dataset, a_col: str, b_col: str) -> rd.Dataset:
    """(a, b) pairs -> both directions (src, dst), int64."""

    def sym(t: pa.Table) -> pa.Table:
        a = np.asarray(t[a_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(t[b_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    return pairs.map_batches(sym, batch_format="pyarrow")


def connected_components(
    pairs: rd.Dataset,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_partitions: int = CC_JOIN_PARTITIONS,
    max_iters: int = CC_MAX_ITERS,
) -> rd.Dataset:
    """Connected components by distributed min-label propagation.

    Returns a (node, label) Dataset covering every node that appears in
    ``pairs``; ``label`` is the component's minimum node id.

    Round structure (all Ray Data, no driver-side graph state):
      labels0(v)   = min(v, min over neighbors)        -- groupby(min)
      labels_i+1(v)= min(labels_i(v),
                         min labels_i(u) over edges u->v)   -- join + groupby(min)
    Convergence check: labels only ever decrease, so an unchanged
    SUM(label) action means a fixpoint (at >>10^9 nodes sum the labels
    as float64/two-level to dodge int64 overflow; the comparison only
    needs "changed vs unchanged").
    """
    edges = _sym_edges(pairs, a_col, b_col).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        # no edges -> no paired nodes; a typed empty (node, label) table
        # keeps downstream joins schema-stable
        return rd.from_arrow(
            pa.table({"node": pa.array([], type=pa.int64()), "label": pa.array([], type=pa.int64())})
        )
    if n_edges <= CC_LOCAL_MAX_EDGES:
        # size-adaptive plan (the pip_join_auto discipline): a small
        # edge set pays ~seconds of shuffle-round fixed cost per
        # propagation round, while ONE union-find task finishes in
        # milliseconds with the identical min-label result.  The
        # threshold keeps per-task memory bounded (~32 MB of int64
        # pairs); above it the O(log d) distributed rounds take over.
        def local_cc(g: pa.Table) -> pa.Table:
            # vectorized min-label propagation with pointer jumping:
            # each outer round is two O(E) scatter-mins + O(V log d)
            # label-doubling passes — no per-edge Python loop, so the
            # 2M-edge ceiling finishes in numpy time, not interpreter
            # time.  Labels only decrease, so an unchanged round is the
            # fixpoint (= component-min node index, nodes sorted).
            src = g["src"].to_numpy()
            dst = g["dst"].to_numpy()
            nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
            es, ed = inv[: len(src)], inv[len(src) :]
            label = np.arange(len(nodes), dtype=np.int64)
            while True:
                prev = label
                label = label.copy()
                np.minimum.at(label, es, prev[ed])
                np.minimum.at(label, ed, prev[es])
                while True:  # pointer-jump to the current root
                    nxt = label[label]
                    if np.array_equal(nxt, label):
                        break
                    label = nxt
                if np.array_equal(label, prev):
                    break
            return pa.table(
                {
                    "node": pa.array(nodes, type=pa.int64()),
                    "label": pa.array(nodes[label], type=pa.int64()),
                }
            )

        def tag_one(t: pa.Table) -> pa.Table:
            return t.append_column("_g", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

        return (
            edges.map_batches(tag_one, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(lambda g: local_cc(g), batch_format="pyarrow")
            .materialize()
        )

    labels = edges.groupby("src").aggregate(Min("dst", alias_name="nbr_min"))

    def init_label(t: pa.Table) -> pa.Table:
        lab = pc.min_element_wise(t["src"], t["nbr_min"])
        return pa.table({"node": t["src"], "label": pc.cast(lab, pa.int64())})

    labels = labels.map_batches(init_label, batch_format="pyarrow").materialize()
    prev_sum = labels.sum("label")

    def relay(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["dst"], "label": t["label"]})

    def as_ptr(t: pa.Table) -> pa.Table:
        return pa.table({"pnode": t["node"], "plabel": t["label"]})

    def hop_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "label": t["plabel"]})


    for it in range(max_iters):
        # one-hop propagation along edges ...
        cand = safe_join(edges, labels, join_type="inner", num_partitions=num_partitions, on=("src",), right_on=("node",))
        cand = cand.map_batches(relay, batch_format="pyarrow")
        # ... plus pointer jumping (label doubling): label(v) <-
        # label(label(v)).  Every label value is itself a node id, so
        # the inner self-join hits; this halves the remaining distance
        # to the component min each round — convergence in
        # O(log diameter) rounds instead of O(diameter), the same
        # round shape (join + groupby-min), just one more tiny join of
        # the labels table against itself.
        ptr = labels.map_batches(as_ptr, batch_format="pyarrow")
        hop = safe_join(labels, ptr, join_type="inner", num_partitions=num_partitions, on=("label",), right_on=("pnode",))
        # materialized so the union's schema is concrete — an unknown
        # lazy join schema makes the aggregate emit zero-column blocks
        # for empty partitions, which poison next round's join
        hop = hop.map_batches(hop_rows, batch_format="pyarrow").materialize()
        # the trailing repartition coalesces the aggregate's empty
        # partitions: they materialize as ZERO-COLUMN blocks (the
        # fused multi-join round leaves their schema uninferred),
        # which next round's pyarrow join rejects with "No match for
        # FieldRef"; repartition rebuilds every block with the real
        # schema (a map_batches normalizer does NOT run on them)
        labels = (
            cand.union(hop)
            .union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(num_partitions)
            .materialize()
        )
        s = labels.sum("label")
        if s == prev_sum:
            return labels
        prev_sum = s
    logger.warning(
        "connected_components: label propagation hit max_iters=%d without a "
        "fixpoint (very long path component?) — returning current labels",
        max_iters,
    )
    return labels


def near_dup_clusters(sf_dir: str, sim_threshold: float = 0.8) -> rd.Dataset:
    """MinHash-LSH near-dup pairs -> connected components -> per-doc
    cluster assignment over the WHOLE corpus.

    Output: (doc_id, cluster_id, keep) — ``cluster_id`` = component min
    doc_id (unpaired docs are their own singleton cluster), ``keep``
    marks the survivor each cluster retains.
    """
    from .dedup import _read_docs, minhash_near_dup

    pairs = minhash_near_dup(sf_dir, sim_threshold=sim_threshold)
    cc = connected_components(pairs)
    docs = _read_docs(sf_dir, ["doc_id"])
    if cc.count() == 0:  # no near-dups: every doc is its own singleton

        def singletons(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "cluster_id": t["doc_id"],
                    "keep": pa.array(np.ones(t.num_rows, dtype=bool)),
                }
            )

        return docs.map_batches(singletons, batch_format="pyarrow")
    j = safe_join(docs, 
        cc, join_type="left_outer", num_partitions=CC_JOIN_PARTITIONS, on=("doc_id",), right_on=("node",)
    )

    def finish(t: pa.Table) -> pa.Table:
        cluster = pc.coalesce(pc.cast(t["label"], pa.int64()), t["doc_id"])
        keep = pc.equal(cluster, t["doc_id"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "cluster_id": cluster,
                "keep": keep,
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom-filter approximate dedup (ST3 parity, deterministic re-expression)
# ---------------------------------------------------------------------------

BLOOM_PARTITIONS = 32


def bloom_params(expected_n: int, fp_rate: float) -> tuple[int, int]:
    """Classic sizing: m = -n ln(p) / ln(2)^2 bits, k = (m/n) ln 2 —
    the same (capacity, fp-budget) surface the reference configures
    (bloomFilter(1000, 0.01), Queries.scala:297)."""
    m = int(np.ceil(-expected_n * np.log(fp_rate) / (np.log(2.0) ** 2)))
    k = max(1, int(round(m / max(1, expected_n) * np.log(2.0))))
    return m, k


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def bloom_bit_positions(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher): two splitmix64 passes derive the whole family."""
    h1 = _splitmix64(keys)
    h2 = _splitmix64(h1) | np.uint64(1)  # odd -> full-period stride
    i = np.arange(k_hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def bloom_scan_partition(
    keys: np.ndarray, m_bits: int, k_hashes: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sequential first-wins bloom scan over one partition's keys (rows
    pre-sorted by the caller).  Returns (kept, false_drop) booleans.
    Pure function of (keys, order) — shared by the engine stage and the
    golden oracle recompute."""
    bits = np.zeros(m_bits, dtype=bool)
    pos = bloom_bit_positions(keys, m_bits, k_hashes)
    seen_exact: set[int] = set()
    kept = np.zeros(len(keys), dtype=bool)
    false_drop = np.zeros(len(keys), dtype=bool)
    for r in range(len(keys)):
        p = pos[r]
        maybe_seen = bits[p].all()
        if not maybe_seen:
            kept[r] = True
            bits[p] = True
        else:
            false_drop[r] = int(keys[r]) not in seen_exact
        seen_exact.add(int(keys[r]))
    return kept, false_drop


def bloom_dedup(
    sf_dir: str,
    expected_n: int = 1000,
    fp_rate: float = 0.01,
    partitions: int = BLOOM_PARTITIONS,
) -> rd.Dataset:
    """Approximate first-wins content dedup via per-partition Bloom
    filters (deterministic rebuild of the reference's
    ``bloomFilter(expected_n, fp_rate)`` dedup stages).

    Key = low 64 bits of md5(text); partition = key % partitions (rows
    with equal keys always share a partition, so dedup semantics hold);
    within a partition rows scan in doc_id order — first doc_id wins.
    Output: (doc_id, dup_key, kept, false_drop).
    """
    import hashlib

    from .dedup import _read_docs

    m_bits, k_hashes = bloom_params(expected_n, fp_rate)
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def add_key(t: pa.Table) -> pa.Table:
        keys = np.array(
            [
                int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")
                for s in t["text"].to_pylist()
            ],
            dtype=np.uint64,
        )
        out = t.drop_columns(["text"])
        out = out.append_column("dup_key", pa.array(keys.view(np.int64), type=pa.int64()))
        return out.append_column(
            "part", pa.array((keys % np.uint64(partitions)).astype(np.int64), type=pa.int64())
        )

    keyed = ds.map_batches(add_key, batch_format="pyarrow")

    def scan(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending")])
        keys = g["dup_key"].to_numpy().view(np.uint64)
        kept, false_drop = bloom_scan_partition(keys, m_bits, k_hashes)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "dup_key": g["dup_key"],
                "kept": pa.array(kept),
                "false_drop": pa.array(false_drop),
            }
        )

    return keyed.groupby("part").map_groups(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DBSCAN (deterministic variant) over document points
# ---------------------------------------------------------------------------

DBSCAN_EPS = 0.1
DBSCAN_MIN_PTS = 5
NOISE = -1


def eps_pairs(points: rd.Dataset, id_col: str, eps: float, num_partitions: int = 8) -> rd.Dataset:
    """All unordered point pairs within ``eps`` planar degrees —
    the half-neighborhood grid join of trajectory.spatial_self_join
    (pipelines/trajectory.py:212), generalized to any (id, lon, lat)
    Dataset.  Output: (id_a, id_b), id_a < id_b, each pair once."""
    import functools

    from .. import fixtures

    eps2 = eps * eps
    half_offsets = ((1, 0), (-1, 1), (0, 1), (1, 1))

    def key(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
        return (cx + 1) * (1 << 21) + (cy + 1)

    def keyed(t: pa.Table, side: str) -> pa.Table:
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        return pa.table(
            {
                f"id_{side}": t[id_col],
                f"lon_{side}": t["lon"],
                f"lat_{side}": t["lat"],
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
            }
        )

    def own_cell(t: pa.Table) -> pa.Table:
        ck = key(t["cx"].to_numpy(), t["cy"].to_numpy())
        return t.drop_columns(["cx", "cy"]).append_column("ck", pa.array(ck, type=pa.int64()))

    def probe_expand(t: pa.Table) -> pa.Table:
        cx, cy = t["cx"].to_numpy(), t["cy"].to_numpy()
        t = t.drop_columns(["cx", "cy"])
        out = []
        for dx, dy in ((0, 0),) + half_offsets:
            ck = key(cx + dx, cy + dy)
            own = np.full(len(ck), 1 if (dx, dy) == (0, 0) else 0, dtype=np.int8)
            out.append(
                t.append_column("ck", pa.array(ck, type=pa.int64())).append_column(
                    "own", pa.array(own, type=pa.int8())
                )
            )
        return pa.concat_tables(out)

    build = points.map_batches(functools.partial(keyed, side="b"), batch_format="pyarrow").map_batches(
        own_cell, batch_format="pyarrow"
    )
    probe = points.map_batches(functools.partial(keyed, side="a"), batch_format="pyarrow").map_batches(
        probe_expand, batch_format="pyarrow"
    )
    cand = safe_join(probe, build, join_type="inner", num_partitions=num_partitions, on=("ck",))

    def finish(t: pa.Table) -> pa.Table:
        ia = np.asarray(t["id_a"].to_numpy(), np.int64)
        ib = np.asarray(t["id_b"].to_numpy(), np.int64)
        own = t["own"].to_numpy()
        dlon = t["lon_b"].to_numpy() - t["lon_a"].to_numpy()
        dlat = t["lat_b"].to_numpy() - t["lat_a"].to_numpy()
        d2 = dlon * dlon + dlat * dlat
        keep = (d2 <= eps2) & ((own == 0) | (ia < ib))
        ia, ib = ia[keep], ib[keep]
        return pa.table(
            {
                "id_a": pa.array(np.minimum(ia, ib), type=pa.int64()),
                "id_b": pa.array(np.maximum(ia, ib), type=pa.int64()),
            }
        )

    return cand.map_batches(finish, batch_format="pyarrow")


def dbscan_clusters(
    sf_dir: str,
    eps: float = DBSCAN_EPS,
    min_pts: int = DBSCAN_MIN_PTS,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Deterministic distributed DBSCAN over the document points.

    Composition of scale-safe pieces: eps grid self-join (candidates
    bounded by local density) -> per-node degree count -> core mask
    (|N_eps(p)| >= min_pts, p included) -> connected components over
    CORE-CORE edges (min-label propagation) -> border points attach to
    the MINIMUM label among their core neighbors.  The border rule is
    the one order-dependent step of textbook DBSCAN (a border point in
    reach of two clusters goes to whichever was scanned first); taking
    the min label instead makes the output schedule-independent —
    cluster membership of core points and the noise set are identical
    to the textbook algorithm.

    Output: (doc_id, cluster_id, kind) for every document; noise rows
    carry cluster_id = -1; cluster_id is the minimum CORE doc_id of
    the cluster.  Oracle: independent O(N^2) BFS recompute
    (golden.dbscan_path).
    """
    import os

    from .. import fixtures

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def pts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lon": pa.array(fixtures.derive_lon(ids), type=pa.float64()),
                "lat": pa.array(fixtures.derive_lat(ids), type=pa.float64()),
            }
        )

    points = ds.map_batches(pts, batch_format="pyarrow")
    pairs = eps_pairs(points, "doc_id", eps, num_partitions).materialize()
    return _dbscan_from_pairs(points, pairs, "doc_id", min_pts, num_partitions)


def _dbscan_from_pairs(
    points: rd.Dataset, pairs: rd.Dataset, id_col: str, min_pts: int, num_partitions: int
) -> rd.Dataset:
    """Shared DBSCAN tail: (points, eps-pairs) -> labeled rows.  Used by
    the planar dbscan_clusters and the spatio-temporal st_dbscan — the
    neighborhood predicate is entirely encoded in ``pairs``."""
    # degree per node (pair -> both endpoints), core = degree+1 >= min_pts
    from ray.data.aggregate import Count

    deg = _sym_edges(pairs, "id_a", "id_b").groupby("src").aggregate(Count(alias_name="n_nbrs"))

    def core_mask(t: pa.Table) -> pa.Table:
        n = t["n_nbrs"].to_numpy()
        return pa.table(
            {
                "node": t["src"],
                "is_core": pa.array(n + 1 >= min_pts),
            }
        )

    core = deg.map_batches(core_mask, batch_format="pyarrow").materialize()

    # annotate pair endpoints with coreness (two hash joins on node id)
    def rn(src: str, dst: str):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns([dst if c == src else c for c in t.column_names])

        return f

    p1 = safe_join(pairs, core, join_type="inner", num_partitions=num_partitions, on=("id_a",), right_on=("node",))
    p1 = p1.map_batches(rn("is_core", "core_a"), batch_format="pyarrow")
    p2 = safe_join(p1, core, join_type="inner", num_partitions=num_partitions, on=("id_b",), right_on=("node",))
    p2 = p2.map_batches(rn("is_core", "core_b"), batch_format="pyarrow").materialize()

    cc_edges = p2.filter(expr="core_a and core_b")
    labels = connected_components(cc_edges, a_col="id_a", b_col="id_b", num_partitions=num_partitions)

    # isolated cores (min_pts <= 1 edge case): no core-core edge, own label
    # border candidates: exactly one endpoint core -> (border node, core node)
    def border_rows(t: pa.Table) -> pa.Table:
        ia = np.asarray(t["id_a"].to_numpy(), np.int64)
        ib = np.asarray(t["id_b"].to_numpy(), np.int64)
        ca = np.asarray(t["core_a"].to_numpy(zero_copy_only=False), bool)
        cb = np.asarray(t["core_b"].to_numpy(zero_copy_only=False), bool)
        m_a = (~ca) & cb  # a is border, b core
        m_b = ca & (~cb)
        return pa.table(
            {
                "bnode": pa.array(np.concatenate([ia[m_a], ib[m_b]]), type=pa.int64()),
                "cnode": pa.array(np.concatenate([ib[m_a], ia[m_b]]), type=pa.int64()),
            }
        )

    border_cand = p2.map_batches(border_rows, batch_format="pyarrow").materialize()
    if border_cand.count() == 0:
        # zero borders (every pair endpoint core): Ray collapses empty
        # typed blocks to schema-less ones, which would break the Arrow
        # joins below — substitute a single never-matching sentinel row
        # (node ids are positive), keeping every downstream join typed
        border_labels = rd.from_arrow(
            pa.table({"node": pa.array([-1], type=pa.int64()), "blabel": pa.array([-1], type=pa.int64())})
        )
    else:
        # a core neighbor with no core-core edge (isolated core) labels itself
        b2 = safe_join(border_cand, labels, join_type="left_outer", num_partitions=num_partitions, on=("cnode",), right_on=("node",))

        def own_core_label(t: pa.Table) -> pa.Table:
            lab = pc.coalesce(pc.cast(t["label"], pa.int64()), t["cnode"])
            return pa.table({"node": t["bnode"], "blabel": pc.cast(lab, pa.int64())})

        border_labels = (
            b2.map_batches(own_core_label, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("blabel", alias_name="blabel"))
            .repartition(num_partitions)
            .materialize()
        )

    # assemble: every point -> (cluster_id, kind)
    j = safe_join(points, core, join_type="left_outer", num_partitions=num_partitions, on=(id_col,), right_on=("node",))
    j = safe_join(j, labels, join_type="left_outer", num_partitions=num_partitions, on=(id_col,), right_on=("node",))
    j = safe_join(j, border_labels, join_type="left_outer", num_partitions=num_partitions, on=(id_col,), right_on=("node",))

    def finish(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_numpy(), np.int64)
        is_core = np.asarray(t["is_core"].to_numpy(zero_copy_only=False) == True, bool)  # noqa: E712
        lab = t["label"].to_numpy(zero_copy_only=False)
        blab = t["blabel"].to_numpy(zero_copy_only=False)
        cluster = np.full(len(ids), NOISE, dtype=np.int64)
        kind = np.full(len(ids), "noise", dtype=object)
        # core: component label, or own id if isolated core
        core_lab = np.where(np.isnan(lab.astype(np.float64)), ids, np.nan_to_num(lab.astype(np.float64))).astype(np.int64)
        cluster[is_core] = core_lab[is_core]
        kind[is_core] = "core"
        has_b = ~np.isnan(blab.astype(np.float64))
        m_border = (~is_core) & has_b
        cluster[m_border] = blab.astype(np.float64)[m_border].astype(np.int64)
        kind[m_border] = "border"
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "cluster_id": pa.array(cluster, type=pa.int64()),
                "kind": pa.array(kind.tolist(), type=pa.string()),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# dissolve_zones (classic GIS dissolve: merge touching same-level zones)
# ---------------------------------------------------------------------------

DISSOLVE_AREA_FP = 1e9  # fixed-point scale for per-zone bbox areas


def dissolve_zones(sf_dir: str | None = None, admin_level: int | None = None) -> rd.Dataset:
    """Polygon dissolve over the boundary table: zones of the SAME
    admin_level whose rectangles touch merge into one region (the GIS
    "dissolve by attribute" operator every boundary-simplification
    pass runs before tiling; reference analogue: the relation
    boundaries of J2 consumed as one region per admin area).

    Pipeline shape (all sides bounded by the ZONE table, never points):
    - each zone explodes to its ~80 km cover cells
      (`cells.cover_bbox` — M13's rectangle-of-cells);
    - a per-cell bucket join emits candidate pairs, verified by exact
      closed-interval rectangle touch, deduped by one tiny groupby;
    - :func:`connected_components` merges touching groups (O(diameter)
      rounds of join+min);
    - unpaired zones become singleton regions; one final groupby emits
      per-region stats.

    Output: (region_id, admin_level, n_zones, lon_min, lat_min,
    lon_max, lat_max, area_fp) — region_id = min rel_id in the
    component; area_fp = Σ floor(zone_area·1e9 + 0.5) (int64, exact,
    overlap double-counted by contract — this is attribute dissolve,
    not geometric union).
    """
    rects = fixtures.admin_rects()
    if admin_level is not None:
        rects = [r for r in rects if r["admin_level"] == admin_level]
    zt = pa.table(
        {
            "rel_id": pa.array([r["rel_id"] for r in rects], type=pa.int64()),
            "admin_level": pa.array([r["admin_level"] for r in rects], type=pa.int64()),
            "lon_min": pa.array([r["lon_min"] for r in rects], type=pa.float64()),
            "lat_min": pa.array([r["lat_min"] for r in rects], type=pa.float64()),
            "lon_max": pa.array([r["lon_max"] for r in rects], type=pa.float64()),
            "lat_max": pa.array([r["lat_max"] for r in rects], type=pa.float64()),
        }
    )
    zones = rd.from_arrow(zt)

    def explode(t: pa.Table) -> pa.Table:
        cols = {c: [] for c in t.column_names}
        cell_col: list[np.ndarray] = []
        for i in range(t.num_rows):
            cc = cells.cover_bbox(
                t["lon_min"][i].as_py(),
                t["lat_min"][i].as_py(),
                t["lon_max"][i].as_py(),
                t["lat_max"][i].as_py(),
                cells.PRECISION_VERY_LOW,
            )
            cell_col.append(cc)
            for c in t.column_names:
                cols[c].extend([t[c][i].as_py()] * len(cc))
        out = {"cell": pa.array(np.concatenate(cell_col) if cell_col else [], type=pa.int64())}
        for c in t.column_names:
            typ = pa.int64() if c in ("rel_id", "admin_level") else pa.float64()
            out[c] = pa.array(cols[c], type=typ)
        return pa.table(out)

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        src: list[int] = []
        dst: list[int] = []
        rows = g.sort_values("rel_id").to_dict("records")
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                if a["admin_level"] != b["admin_level"]:
                    continue
                if (
                    a["lon_min"] <= b["lon_max"]
                    and b["lon_min"] <= a["lon_max"]
                    and a["lat_min"] <= b["lat_max"]
                    and b["lat_min"] <= a["lat_max"]
                ):
                    src.append(a["rel_id"])
                    dst.append(b["rel_id"])
        return pd.DataFrame({"src": np.array(src, dtype=np.int64), "dst": np.array(dst, dtype=np.int64)})

    pairs = (
        zones.map_batches(explode, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_pairs, batch_format="pandas")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    labels = connected_components(pairs, a_col="src", b_col="dst")

    j = safe_join(zones, labels, join_type="left_outer", num_partitions=4, on=("rel_id",), right_on=("node",))

    def finish(t: pa.Table) -> pa.Table:
        rel = t["rel_id"].to_numpy()
        lab = t["label"].to_numpy(zero_copy_only=False)
        lab = np.where(pd.isna(lab), rel, lab).astype(np.int64)
        w = t["lon_max"].to_numpy() - t["lon_min"].to_numpy()
        h = t["lat_max"].to_numpy() - t["lat_min"].to_numpy()
        area_fp = np.floor(w * h * DISSOLVE_AREA_FP + 0.5).astype(np.int64)
        return pa.table(
            {
                "region_id": pa.array(lab, type=pa.int64()),
                "admin_level": t["admin_level"],
                "lon_min": t["lon_min"],
                "lat_min": t["lat_min"],
                "lon_max": t["lon_max"],
                "lat_max": t["lat_max"],
                "area_fp": pa.array(area_fp, type=pa.int64()),
            }
        )

    return (
        j.map_batches(finish, batch_format="pyarrow")
        .groupby(["region_id", "admin_level"])
        .aggregate(
            Count(alias_name="n_zones"),
            Min("lon_min", alias_name="lon_min"),
            Min("lat_min", alias_name="lat_min"),
            Max("lon_max", alias_name="lon_max"),
            Max("lat_max", alias_name="lat_max"),
            Sum("area_fp", alias_name="area_fp"),
        )
    )


# ---------------------------------------------------------------------------
# ST-DBSCAN (spatio-temporal density clustering over the event stream)
# ---------------------------------------------------------------------------

ST_EPS = 0.3  # planar degrees
ST_EPS_T_US = 12 * 3600 * 1_000_000  # 12 h
ST_MIN_PTS = 10


def st_eps_pairs(
    points: rd.Dataset, id_col: str, eps: float, eps_t_us: int, num_partitions: int = 8
) -> rd.Dataset:
    """All unordered point pairs within ``eps`` planar degrees AND
    ``eps_t_us`` microseconds — eps_pairs lifted to the (x, y, t) grid
    (13 half-space neighbor offsets instead of 4; candidates bounded by
    local spatio-temporal density).  Output: (id_a, id_b), id_a < id_b.
    """
    import functools

    from .. import fixtures

    eps2 = eps * eps
    # half-space of the 26 3-D neighbors: lexicographically positive
    half = [
        (dx, dy, dt)
        for dt in (0, 1)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if (dt, dy, dx) > (0, 0, 0)
    ]

    def key(cx, cy, ct):
        return ((ct + 1) * (1 << 21) + (cx + 1)) * (1 << 21) + (cy + 1)

    def keyed(t: pa.Table, side: str) -> pa.Table:
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        tus = t["tus"].to_numpy()
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        ct = tus // eps_t_us
        return pa.table(
            {
                f"id_{side}": t[id_col],
                f"lon_{side}": t["lon"],
                f"lat_{side}": t["lat"],
                f"tus_{side}": t["tus"],
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
                "ct": pa.array(ct, type=pa.int64()),
            }
        )

    def own_cell(t: pa.Table) -> pa.Table:
        ck = key(t["cx"].to_numpy(), t["cy"].to_numpy(), t["ct"].to_numpy())
        return t.drop_columns(["cx", "cy", "ct"]).append_column("ck", pa.array(ck, type=pa.int64()))

    def probe_expand(t: pa.Table) -> pa.Table:
        cx, cy, ct = t["cx"].to_numpy(), t["cy"].to_numpy(), t["ct"].to_numpy()
        t = t.drop_columns(["cx", "cy", "ct"])
        out = []
        for dx, dy, dt in [(0, 0, 0)] + half:
            ck = key(cx + dx, cy + dy, ct + dt)
            own = np.full(len(ck), 1 if (dx, dy, dt) == (0, 0, 0) else 0, dtype=np.int8)
            out.append(
                t.append_column("ck", pa.array(ck, type=pa.int64())).append_column(
                    "own", pa.array(own, type=pa.int8())
                )
            )
        return pa.concat_tables(out)

    build = points.map_batches(functools.partial(keyed, side="b"), batch_format="pyarrow").map_batches(
        own_cell, batch_format="pyarrow"
    )
    probe = points.map_batches(functools.partial(keyed, side="a"), batch_format="pyarrow").map_batches(
        probe_expand, batch_format="pyarrow"
    )
    cand = safe_join(probe, build, join_type="inner", num_partitions=num_partitions, on=("ck",))

    def finish(t: pa.Table) -> pa.Table:
        ia = np.asarray(t["id_a"].to_numpy(), np.int64)
        ib = np.asarray(t["id_b"].to_numpy(), np.int64)
        own = t["own"].to_numpy()
        dlon = t["lon_b"].to_numpy() - t["lon_a"].to_numpy()
        dlat = t["lat_b"].to_numpy() - t["lat_a"].to_numpy()
        dt = np.abs(t["tus_b"].to_numpy() - t["tus_a"].to_numpy())
        near = (dlon * dlon + dlat * dlat <= eps2) & (dt <= eps_t_us)
        # own-cell candidates appear twice (both directions): keep a<b;
        # neighbor-cell candidates once, orient canonically
        m = near & np.where(own == 1, ia < ib, ia != ib)
        a = np.minimum(ia[m], ib[m])
        b = np.maximum(ia[m], ib[m])
        key2 = a * np.int64(1 << 32) + b
        uniq = np.unique(key2)
        return pa.table(
            {
                "id_a": pa.array(uniq // (1 << 32), type=pa.int64()),
                "id_b": pa.array(uniq % (1 << 32), type=pa.int64()),
            }
        )

    # each unordered pair surfaces exactly once: a pair's cell delta is
    # fixed and exactly one of (delta, -delta) lies in the half-space
    # (own-cell pairs keep only the ia < ib direction), so no distinct
    # pass is needed — the eps_pairs discipline in 3-D
    return cand.map_batches(finish, batch_format="pyarrow")


def st_dbscan(
    sf_dir: str,
    eps: float = ST_EPS,
    eps_t_us: int = ST_EPS_T_US,
    min_pts: int = ST_MIN_PTS,
    num_partitions: int = 8,
) -> rd.Dataset:
    """ST-DBSCAN (Birant & Kut 2007) over the event stream: density
    clustering where the neighborhood is spatial (eps degrees) AND
    temporal (eps_t) — the burst/gathering detector (protest, festival,
    sensor fault) that plain DBSCAN smears across time.  Same
    deterministic discipline as dbscan_clusters: min-label components
    over core-core edges, border points take the MINIMUM core-neighbor
    label, noise = -1.

    Scale shape: the 3-D grid candidate join bounds pair fan-out by
    local spatio-temporal density; everything downstream is the shared
    _dbscan_from_pairs tail (degree reduce, component propagation,
    three bounded hash joins).

    Output: (event_id, cluster_id, kind).
    """
    import os

    from .. import fixtures

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"])

    def pts(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        return pa.table(
            {
                "event_id": t["event_id"],
                "lon": pa.array(fixtures.derive_lon(ids), type=pa.float64()),
                "lat": pa.array(fixtures.derive_lat(ids), type=pa.float64()),
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy(), type=pa.int64()),
            }
        )

    points = ds.map_batches(pts, batch_format="pyarrow")
    pairs = st_eps_pairs(points, "event_id", eps, eps_t_us, num_partitions).materialize()
    return _dbscan_from_pairs(points, pairs, "event_id", min_pts, num_partitions)
