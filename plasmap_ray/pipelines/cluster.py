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
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min

logger = logging.getLogger(__name__)

CC_JOIN_PARTITIONS = 16
CC_MAX_ITERS = 30


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
    if edges.count() == 0:
        # no edges -> no paired nodes; a typed empty (node, label) table
        # keeps downstream joins schema-stable
        return rd.from_arrow(
            pa.table({"node": pa.array([], type=pa.int64()), "label": pa.array([], type=pa.int64())})
        )

    labels = edges.groupby("src").aggregate(Min("dst", alias_name="nbr_min"))

    def init_label(t: pa.Table) -> pa.Table:
        lab = pc.min_element_wise(t["src"], t["nbr_min"])
        return pa.table({"node": t["src"], "label": pc.cast(lab, pa.int64())})

    labels = labels.map_batches(init_label, batch_format="pyarrow").materialize()
    prev_sum = labels.sum("label")

    def relay(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["dst"], "label": t["label"]})

    for it in range(max_iters):
        cand = edges.join(labels, join_type="inner", num_partitions=num_partitions, on=("src",), right_on=("node",))
        cand = cand.map_batches(relay, batch_format="pyarrow")
        labels = (
            cand.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
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
    j = docs.join(
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
