"""Similarity search over the ``embeddings`` table.

Baseline: brute-force cosine top-k per batch against a broadcast query
matrix (numpy matmul — the scale-correct pattern: the query side is
small and shipped once via ``ray.put``; the embedding side streams).

Pair search comes in two flavours:

- :func:`embedding_near_dup` — EXACT all-pairs above a threshold via a
  distributed block-pair self-join: vectors hash into ``B`` blocks, each
  row is replicated to the ``B`` unordered block-pair groups it belongs
  to, and each group computes its cross/triangle similarities in one
  vectorized GEMM.  No driver-side materialization, task memory bounded
  by 2N/B rows; work is inherently O(N²) — the exact-complete path.
- :func:`embedding_near_dup_lsh` — the 10^12-scale path: banded
  random-hyperplane LSH (sketch -> (band, key-shard) shuffle -> run-scan
  candidates -> exact cosine verify).  Probabilistic recall (measured in
  tests against the exact path on a planted-near-dup corpus); exact
  precision (every emitted pair is verified).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.common import duckdb_round
from ..stages.common import safe_join


def _emb_path(sf_dir_or_path: str) -> str:
    """Accept an sf dir (-> its embeddings.parquet) or a direct .parquet
    path (e.g. the planted-near-dup fixture corpus)."""
    if sf_dir_or_path.endswith(".parquet"):
        return sf_dir_or_path
    return os.path.join(sf_dir_or_path, "embeddings.parquet")


def _read_emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if batch.num_rows == 0:
        # reshape(0, -1) raises; recover dim from the list type if fixed
        dim = getattr(col.type, "list_size", None) or 0
        return np.empty((0, dim), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def query_vector(sf_dir: str, vec_id: int = 1) -> np.ndarray:
    """Deterministic query = the embedding of ``vec_id`` (also available
    to the SQL oracle via a scalar subquery)."""
    import pyarrow.dataset as pads

    t = pads.dataset(_emb_path(sf_dir)).to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") == vec_id
    )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)



def ranked_head(scored, sort_cols: list[str], rank_name: str, k: int, keep: list[str] | None = None):
    """Global top-k + dense 1..k rank projection (shared by every ranked
    query surface so tie-break ordering can never diverge between
    pipelines that must stay oracle-identical): sort descending on the
    first column, ascending tie-break on the rest, limit k, then rank
    the k-row remainder driver-side."""
    keep = keep if keep is not None else sort_cols[1:]
    top = scored.sort(sort_cols, descending=[True] + [False] * (len(sort_cols) - 1)).limit(k)

    def add_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=[False] + [True] * (len(sort_cols) - 1)).reset_index(drop=True)
        df[rank_name] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[[rank_name] + keep]

    return top.map_batches(add_rank, batch_format="pandas", batch_size=k * 2)


class CosineTopK:
    """Actor-pool stage: per-batch cosine similarity vs a broadcast query."""

    def __init__(self, query_ref, k: int = 10):
        q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref
        self.q = q / np.linalg.norm(q)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ self.q) / np.where(norms == 0, 1.0, norms)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "sim": pa.array(sims, type=pa.float64()),
            }
        )


def ann_topk(sf_dir: str, k: int = 10, vec_id: int = 1) -> rd.Dataset:
    """Global top-k most-similar vectors to the query (excluding itself).

    Per-batch scoring streams; only (vec_id, sim) rows reach the sort —
    top-k of a scored stream, not a materialized matrix.
    """
    qref = ray.put(query_vector(sf_dir, vec_id))
    scored = _read_emb(sf_dir).map_batches(
        CosineTopK, fn_constructor_kwargs=dict(query_ref=qref, k=k), batch_format="pyarrow", concurrency=(1, 4)
    )
    scored = scored.filter(expr=f"vec_id != {vec_id}")
    # k rows: a driver-side pandas finish is fine (small result)
    return ranked_head(scored, ["sim", "vec_id"], "sim_rank", k)


class MultiCosineTopK:
    """Actor-pool stage: per-batch cosine vs a broadcast QUERY MATRIX.

    The batched form of :class:`CosineTopK`: Q query vectors ship once
    via ``ray.put`` (normalized float64 (Q, D) matrix + id vector); per
    batch ONE GEMM scores all queries at once, then a per-query local
    top-k prune keeps only k candidate rows per query per batch — the
    rows reaching the final per-query selection number Q·k·n_batches,
    never n·Q.
    """

    def __init__(self, qref, k: int = 10):
        qids, qn = ray.get(qref) if not isinstance(qref, tuple) else qref
        self.qids = qids  # (Q,) int64
        self.qn = qn  # (Q, D) normalized float64
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        ids = np.asarray(batch["vec_id"].to_numpy(), dtype=np.int64)
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ self.qn.T) / np.where(norms == 0, 1.0, norms)[:, None]  # (n, Q)
        out_q, out_id, out_sim = [], [], []
        for qi, qid in enumerate(self.qids):
            s = sims[:, qi]
            mask = ids != qid
            cand_ids, cand_s = ids[mask], s[mask]
            # local prune by the SAME composite order as the global
            # selection (sim desc, vec_id asc) -> prune-safe under ties
            top = np.lexsort((cand_ids, -cand_s))[: self.k]
            out_q.append(np.full(len(top), qid, dtype=np.int64))
            out_id.append(cand_ids[top])
            out_sim.append(cand_s[top])
        return pa.table(
            {
                "query_vec_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_sim), type=pa.float64()),
            }
        )


def ann_multi_topk(sf_dir: str, k: int = 10, vec_ids: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8)) -> rd.Dataset:
    """Batched similarity search: top-k neighbors for EVERY query in a
    broadcast query set, in one pass over the corpus (the production
    shape of ann_topk — real retrieval scores thousands of queries per
    scan, not one).  Output: (query_vec_id, sim_rank, vec_id).
    """
    import pyarrow.dataset as pads

    t = (
        pads.dataset(_emb_path(sf_dir))
        .to_table(columns=["vec_id", "embedding"], filter=pads.field("vec_id").isin(list(vec_ids)))
        .sort_by("vec_id")
    )
    qids = np.asarray(t["vec_id"].to_numpy(), dtype=np.int64)
    q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    qn = q / np.linalg.norm(q, axis=1)[:, None]
    qref = ray.put((qids, qn))

    scored = _read_emb(sf_dir).map_batches(
        MultiCosineTopK,
        fn_constructor_kwargs=dict(qref=qref, k=k),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def per_query_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
        df["sim_rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["query_vec_id", "sim_rank", "vec_id"]]

    return scored.groupby("query_vec_id").map_groups(per_query_rank, batch_format="pandas")


# ---------------------------------------------------------------------------
# Exact all-pairs: distributed block-pair self-join
# ---------------------------------------------------------------------------

PAIR_BLOCKS = 4  # B: replication factor per row; B(B+1)/2 compare tasks


def _pair_explode(t: pa.Table, blocks: int) -> pa.Table:
    """Each row joins the ``blocks`` unordered block-pair groups that
    contain its block: row replication = B, every unordered vector pair
    meets in EXACTLY one group (block i ⊗ block j in group (i, j))."""
    ids = t["vec_id"].to_numpy()
    blk = (np.asarray(ids, dtype=np.int64) % blocks).astype(np.int64)
    parts = []
    for other in range(blocks):
        lo = np.minimum(blk, other)
        hi = np.maximum(blk, other)
        tt = t.append_column("block", pa.array(blk, type=pa.int64()))
        tt = tt.append_column("pair_id", pa.array(lo * blocks + hi, type=pa.int64()))
        parts.append(tt)
    return pa.concat_tables(parts)


def _pair_sims(g: pd.DataFrame, blocks: int, threshold: float) -> pd.DataFrame:
    """One block-pair group -> all its cross (or triangle) similarities
    >= threshold, each unordered pair emitted exactly once."""
    pid = int(g["pair_id"].iloc[0])
    i, j = divmod(pid, blocks)
    ids = g["vec_id"].to_numpy().astype(np.int64)
    m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    mn = m / np.where(norms == 0, 1.0, norms)[:, None]
    if i == j:
        sims = mn @ mn.T
        ai, bj = np.triu_indices(len(ids), k=1)
        sv = sims[ai, bj]
        a_ids, b_ids = ids[ai], ids[bj]
    else:
        ma = g["block"].to_numpy() == i
        sims = mn[ma] @ mn[~ma].T
        ai, bj = np.nonzero(sims >= threshold)
        sv = sims[ai, bj]
        a_ids, b_ids = ids[ma][ai], ids[~ma][bj]
    keep = sv >= threshold
    a, b, sv = a_ids[keep], b_ids[keep], sv[keep]
    swap = a > b
    return pd.DataFrame(
        {
            "vec_a": np.where(swap, b, a),
            "vec_b": np.where(swap, a, b),
            "sim": sv,  # unrounded float64 — round only in final projections
        }
    )


def scored_pairs(sf_dir: str, threshold: float, blocks: int = PAIR_BLOCKS) -> rd.Dataset:
    """All embedding pairs with cosine >= threshold, exactly, via the
    block-pair self-join (no driver materialization, no full broadcast)."""
    exploded = _read_emb(sf_dir).map_batches(functools.partial(_pair_explode, blocks=blocks), batch_format="pyarrow")
    return exploded.groupby("pair_id").map_groups(
        functools.partial(_pair_sims, blocks=blocks, threshold=threshold), batch_format="pandas"
    )


def embedding_near_dup(sf_dir: str, threshold: float = 0.95, blocks: int = PAIR_BLOCKS) -> rd.Dataset:
    """All pairs with cosine similarity >= threshold (embedding near-dup),
    exact.  Output (vec_a, vec_b, sim) with sim rounded only in this
    final projection (internal sort/compare stays unrounded)."""
    pairs = scored_pairs(sf_dir, threshold, blocks)

    def finish(t: pa.Table) -> pa.Table:
        sim = t["sim"].to_numpy(zero_copy_only=False)
        return t.drop_columns(["sim"]).append_column("sim", pa.array(duckdb_round(sim, 6), type=pa.float64()))

    return pairs.map_batches(finish, batch_format="pyarrow")


def embedding_top_pairs(sf_dir: str, k: int = 20) -> rd.Dataset:
    """Top-k most-similar embedding pairs (rank-based — robust across
    engines, unlike a raw similarity threshold whose float32/float64
    boundary behavior differs).  Output: (pair_rank, vec_a, vec_b)."""
    pairs = scored_pairs(sf_dir, threshold=-1.1)  # all pairs, scored, unrounded

    def local_topk(t: pa.Table) -> pa.Table:
        # per-batch prune: global top-k is a subset of per-batch top-k
        if t.num_rows <= k:
            return t
        idx = t.sort_by([("sim", "descending"), ("vec_a", "ascending"), ("vec_b", "ascending")])
        return idx.slice(0, k)

    return ranked_head(
        pairs.map_batches(local_topk, batch_format="pyarrow"), ["sim", "vec_a", "vec_b"], "pair_rank", k
    )


# ---------------------------------------------------------------------------
# Scale path: banded hyperplane-LSH pair join (+ exact verify)
# ---------------------------------------------------------------------------

LSH_BANDS = 16
LSH_PLANES = 8  # planes per band -> 2^8 buckets per band
LSH_SHARDS = 32  # key-space shards per band (shuffle parallelism = bands*shards)


class HyperplaneBands:
    """Actor-pool stage: per-vector LSH band keys.

    ``bands`` independent sets of ``planes`` random hyperplanes (seeded —
    every actor derives the identical family in ``__init__``, the ST4
    cold-start pattern).  Band key = sign-pattern integer of that band's
    projections.  Two vectors at cosine s agree on one plane with
    p = 1 - arccos(s)/pi; P(candidate) = 1 - (1 - p^planes)^bands.
    """

    def __init__(self, dim: int, bands: int = LSH_BANDS, planes: int = LSH_PLANES, seed: int = 1117):
        rng = np.random.default_rng(seed)
        self.hyper = rng.standard_normal((bands * planes, dim))
        self.bands = bands
        self.planes = planes
        self.weights = (1 << np.arange(planes, dtype=np.int64)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        signs = (m @ self.hyper.T) > 0  # (n, bands*planes)
        n = m.shape[0]
        keys = signs.reshape(n, self.bands, self.planes).astype(np.int64) @ self.weights  # (n, bands)
        band_col = np.broadcast_to(np.arange(self.bands, dtype=np.int32), (n, self.bands)).ravel()
        out = batch.take(pa.array(np.repeat(np.arange(n), self.bands)))
        out = out.append_column("band", pa.array(band_col, type=pa.int32()))
        return out.append_column("band_key", pa.array(keys.ravel(), type=pa.int64()))


def embedding_near_dup_lsh(
    sf_dir_or_path: str,
    threshold: float = 0.9,
    bands: int = LSH_BANDS,
    planes: int = LSH_PLANES,
    shards: int = LSH_SHARDS,
    seed: int = 1117,
) -> rd.Dataset:
    """Approximate near-dup pairs: banded hyperplane LSH -> sharded
    shuffle -> run-scan candidates -> EXACT cosine verify >= threshold.

    Shuffle key is (band, band_key % shards): parallelism = bands*shards
    and per-task memory is bounded by one key shard — never the corpus
    (the round-1 per-band grouping materialized the whole dataset in
    ``bands`` tasks).  Precision is exact (verified); recall is the LSH
    probability above, measured in tests against :func:`embedding_near_dup`.
    """
    from ray.data.aggregate import Max

    from .dedup import _shard_band_key, pairs_in_key_runs

    path = _emb_path(sf_dir_or_path)
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    import pyarrow.parquet as pq

    # one row group, one row — never the whole column — just for dim
    dim = len(pq.ParquetFile(path).read_row_group(0, columns=["embedding"])["embedding"][0])
    banded = ds.map_batches(
        HyperplaneBands,
        fn_constructor_kwargs=dict(dim=dim, bands=bands, planes=planes, seed=seed),
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, 8),
    )

    sharded = banded.map_batches(
        functools.partial(_shard_band_key, shards=shards), batch_format="pyarrow"
    )

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["band_key"].to_numpy()
        ids = g["vec_id"].to_numpy().astype(np.int64)
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        mn = m / np.where(norms == 0, 1.0, norms)[:, None]

        def verify(i, j):
            return (mn[i] * mn[j]).sum(axis=1)

        ia, ib, sim = pairs_in_key_runs(keys, ids, verify)
        keep = sim >= threshold
        a, b = ids[ia[keep]], ids[ib[keep]]
        swap = a > b
        return pd.DataFrame(
            {
                "vec_a": np.where(swap, b, a),
                "vec_b": np.where(swap, a, b),
                "sim": sim[keep],
            }
        )

    pairs = sharded.groupby(["band", "shard"]).map_groups(shard_pairs, batch_format="pandas")
    # a pair surfaces once per agreeing band -> dedup; sim identical each time
    out = pairs.groupby(["vec_a", "vec_b"]).aggregate(Max("sim", alias_name="sim"))

    def finish(t: pa.Table) -> pa.Table:
        sim = t["sim"].to_numpy(zero_copy_only=False)
        return t.drop_columns(["sim"]).append_column("sim", pa.array(duckdb_round(sim, 6), type=pa.float64()))

    return out.map_batches(finish, batch_format="pyarrow")


KMEANS_SCALE = 1 << 20  # fixed-point quantum for exact partial sums


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 5) -> rd.Dataset:
    """DISTRIBUTED Lloyd k-means over the embeddings Dataset — the
    corpus-clustering operator (vs :func:`kmeans_centroids`, which
    trains the IVF quantizer on a driver-side sample).

    Each iteration is ONE streaming pass: map-side assign + per-block
    partial sums folded through ``Dataset.aggregate`` with a custom
    ``AggregateFn`` — only a (k, d+1) array ever moves, never vectors.
    Partials are FIXED-POINT int64 (``round(v * 2^20)``), so the
    aggregation-tree merge is exact integer addition and the updated
    centroids are bit-identical regardless of Ray's merge order — what
    makes a distributed iterative algorithm oracle-checkable at all.
    (Headroom: int64 overflows past ~2^43 rows per cluster at unit-norm
    scale; shard the accumulator or drop to 2^14 quanta beyond that.)

    Init is the ``k`` lowest-vec_id vectors (deterministic, no RNG).
    Empty clusters keep their previous centroid.  Output: one row per
    vector (vec_id, cluster) from a final assign pass.
    """
    cents = lloyd_centroids(sf_dir, k=k, iters=iters)
    cref = ray.put(cents)
    ds = _read_emb(sf_dir)

    class FinalAssign:
        def __init__(self):
            self.c = ray.get(cref)
            self.cn2 = (self.c * self.c).sum(axis=1)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _emb_matrix(batch)
            dist = self.cn2[None, :] - 2.0 * (m @ self.c.T)
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "cluster": pa.array(dist.argmin(axis=1).astype(np.int64), type=pa.int64()),
                }
            )

    return ds.map_batches(FinalAssign, batch_format="pyarrow", concurrency=(1, 4))


def lloyd_centroids(sf_dir: str, k: int = 8, iters: int = 5) -> np.ndarray:
    """The distributed Lloyd iteration of :func:`kmeans_embeddings`,
    returning the final (k, d) centroid matrix — shared by the assign
    pass above and by :func:`semantic_dedup`'s cluster bucketing."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import AggregateFn

    init_t = pads.dataset(_emb_path(sf_dir)).to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < k
    )
    order = np.argsort(init_t["vec_id"].to_numpy(), kind="stable")
    cents = np.stack(init_t["embedding"].to_numpy(zero_copy_only=False)[order]).astype(np.float64)
    if cents.shape[0] < k:
        raise ValueError(f"need vec_ids 0..{k-1} for deterministic init")
    d = cents.shape[1]
    ds = _read_emb(sf_dir)

    def make_agg(cref):
        def accumulate(acc: np.ndarray, block: pa.Table) -> np.ndarray:
            c = ray.get(cref)
            m = _emb_matrix(block)
            if m.shape[0] == 0:
                return acc
            dist = (c * c).sum(axis=1)[None, :] - 2.0 * (m @ c.T)
            assign = dist.argmin(axis=1)
            q = np.rint(m * KMEANS_SCALE).astype(np.int64)
            acc = acc.copy()
            acc[:, 0] += np.bincount(assign, minlength=c.shape[0])
            np.add.at(acc[:, 1:], assign, q)
            return acc

        return AggregateFn(
            init=lambda _key: np.zeros((k, d + 1), dtype=np.int64),
            accumulate_block=accumulate,
            merge=lambda a, b: a + b,
            finalize=lambda acc: acc,
            name="kmeans_partial",
        )

    for _ in range(iters):
        cref = ray.put(cents)
        part = ds.aggregate(make_agg(cref))["kmeans_partial"]
        counts = part[:, 0].astype(np.float64)
        nonempty = counts > 0
        upd = part[:, 1:].astype(np.float64) / (KMEANS_SCALE * np.where(nonempty, counts, 1.0))[:, None]
        cents = np.where(nonempty[:, None], upd, cents)

    return cents


def kmeans_cluster_sizes(sf_dir: str, k: int = 8, iters: int = 5) -> rd.Dataset:
    """Per-cluster member counts of the distributed k-means."""
    from ray.data.aggregate import Count

    return kmeans_embeddings(sf_dir, k=k, iters=iters).groupby("cluster").aggregate(
        Count(alias_name="n_vecs")
    )


def semantic_dedup(sf_dir: str, k: int = 8, iters: int = 5, threshold: float = 0.40) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023): k-means-bucketed embedding
    near-dedup — the SCALE path that the exact O(N²) block-pair
    self-join (:func:`embedding_near_dup`) cannot be.  Cluster first
    with the deterministic fixed-point Lloyd (:func:`lloyd_centroids`),
    then search for near-duplicates ONLY within each cluster: pairwise
    work drops from N² to Σ n_c² ≈ N²/k, and the shuffle is one
    cluster-keyed regroup.

    Within a cluster, vectors whose cosine ≥ ``threshold`` are linked;
    each connected component keeps its minimum vec_id as the
    representative (deterministic survivorship), everything else is
    marked dropped.  Output: (vec_id, cluster, rep_id, keep) for every
    vector.

    Scale shape: k is a FREE parameter — at planet scale SemDeDup runs
    with k ~ √N..N/1e4 so per-cluster matrices stay worker-sized (the
    paper uses 50k clusters for 1B embeddings); here k=8 matches the
    oracle-checkable kmeans_clusters configuration.  Per-group kernel
    is one GEMM + vectorized min-label union-find — no Python pair
    loop.  Mirrored by a pure-numpy/union-find golden recompute
    (golden.semantic_dedup_path), algorithmically independent on the
    component side.
    """
    cents = lloyd_centroids(sf_dir, k=k, iters=iters)
    cref = ray.put(cents)

    class Assign:
        def __init__(self):
            self.c = ray.get(cref)
            self.cn2 = (self.c * self.c).sum(axis=1)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _emb_matrix(batch)
            dist = self.cn2[None, :] - 2.0 * (m @ self.c.T)
            return batch.append_column("cluster", pa.array(dist.argmin(axis=1).astype(np.int64), type=pa.int64()))

    assigned = _read_emb(sf_dir).map_batches(Assign, batch_format="pyarrow", concurrency=(1, 4))

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")  # labels = positional min ⇒ sort so position order = id order
        ids = ids[order]
        m = np.stack(g["embedding"].to_numpy()[order]).astype(np.float64)
        cluster = int(g["cluster"].iloc[0])
        norms = np.linalg.norm(m, axis=1)
        mn = m / np.where(norms == 0, 1.0, norms)[:, None]
        sims = mn @ mn.T
        n = len(ids)
        ai, bj = np.nonzero(np.triu(sims >= threshold, k=1))
        # vectorized min-label propagation (connected components)
        label = np.arange(n, dtype=np.int64)
        while True:
            prev = label.copy()
            np.minimum.at(label, ai, prev[bj])
            np.minimum.at(label, bj, prev[ai])
            label = label[label]  # pointer jumping
            if np.array_equal(label, prev):
                break
        rep = ids[label]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": np.full(n, cluster, dtype=np.int64),
                "rep_id": rep,
                "keep": (rep == ids).astype(np.int64),
            }
        )

    return assigned.groupby("cluster").map_groups(dedup_group, batch_format="pandas")


def kmeans_centroids(m: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 5) -> np.ndarray:
    """Deterministic Lloyd k-means (seeded init, fixed iterations) —
    the IVF coarse quantizer.  Trained on a driver-side sample; at
    10^12 vectors the sample IS the training set and the full corpus
    only ever sees the assign step."""
    rng = np.random.default_rng(seed)
    c = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)].copy()
    for _ in range(iters):
        # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2; argmin ignores ||v||^2
        d = (c * c).sum(axis=1)[None, :] - 2.0 * (m @ c.T)
        a = d.argmin(axis=1)
        for j in range(len(c)):
            sel = m[a == j]
            if len(sel):
                c[j] = sel.mean(axis=0)
    return c


def ivf_topk(
    sf_dir: str,
    k: int = 10,
    vec_id: int = 1,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 8,
    seed: int = 5,
) -> rd.Dataset:
    """IVF (inverted-file) ANN: k-means coarse quantizer -> probe the
    ``nprobe`` centroids nearest the query -> exact cosine on the
    surviving vectors only.

    Scale shape: centroids train once on a driver-side sample and
    broadcast via ``ray.put``; the assign+filter runs map-side per
    batch (no shuffle — at 10^12 rows you would PERSIST the assignment
    as the partition key so probing reads only nprobe/n_centroids of
    the corpus; here the filter expresses the same pruning).
    Approximate — recall vs :func:`ann_topk` measured in tests; output
    is rank-based like ann_topk so a deterministic local recompute can
    oracle-check it.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    sample = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    cents = kmeans_centroids(sample, n_centroids, iters=iters, seed=seed)
    q = query_vector(sf_dir, vec_id)
    qd = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = set(np.argsort(qd, kind="stable")[:nprobe].tolist())
    cref = ray.put(cents)
    qref = ray.put(q / np.linalg.norm(q))

    class ProbeScore:
        def __init__(self):
            self.c = ray.get(cref)
            self.qn = ray.get(qref)
            self.cn2 = (self.c * self.c).sum(axis=1)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _emb_matrix(batch)
            d = self.cn2[None, :] - 2.0 * (m @ self.c.T)
            assign = d.argmin(axis=1)
            mask = np.isin(assign, list(probe))
            ids = batch["vec_id"].to_numpy()[mask]
            m = m[mask]
            if m.shape[0] == 0:
                return pa.table({"vec_id": pa.array([], type=pa.int64()), "sim": pa.array([], type=pa.float64())})
            norms = np.linalg.norm(m, axis=1)
            sims = (m @ self.qn) / np.where(norms == 0, 1.0, norms)
            return pa.table({"vec_id": pa.array(ids, type=pa.int64()), "sim": pa.array(sims, type=pa.float64())})

    scored = _read_emb(sf_dir).map_batches(ProbeScore, batch_format="pyarrow", concurrency=(1, 4))
    scored = scored.filter(expr=f"vec_id != {vec_id}")
    return ranked_head(scored, ["sim", "vec_id"], "sim_rank", k)


def lsh_bucket_topk(sf_dir: str, k: int = 10, vec_id: int = 1, planes: int = 6, seed: int = 11) -> rd.Dataset:
    """Scale-path ANN: random-hyperplane LSH bucket pruning.

    Vectors bucket by the sign pattern of ``planes`` random projections;
    only the query's bucket (plus Hamming-1 neighbor buckets) is scored.
    Approximate — recall measured against `ann_topk` in tests.  Output
    is rank-based (sim_rank, vec_id) like ann_topk, so the result is
    oracle-checkable via a deterministic local recompute.
    """
    q = query_vector(sf_dir, vec_id)
    dim = q.shape[0]
    rng = np.random.default_rng(seed)
    hyper = rng.standard_normal((planes, dim))
    qsig = int((hyper @ q > 0).astype(np.int64) @ (1 << np.arange(planes)))
    probe = {qsig} | {qsig ^ (1 << i) for i in range(planes)}
    qref = ray.put(q / np.linalg.norm(q))
    href = ray.put(hyper)

    class BucketScore:
        def __init__(self):
            self.qn = ray.get(qref)
            self.hyper = ray.get(href)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _emb_matrix(batch)
            sigs = ((self.hyper @ m.T > 0).astype(np.int64).T @ (1 << np.arange(planes))).astype(np.int64)
            mask = np.isin(sigs, list(probe))
            ids = batch["vec_id"].to_numpy()[mask]
            m = m[mask]
            if m.shape[0] == 0:
                return pa.table({"vec_id": pa.array([], type=pa.int64()), "sim": pa.array([], type=pa.float64())})
            norms = np.linalg.norm(m, axis=1)
            sims = (m @ self.qn) / np.where(norms == 0, 1.0, norms)
            return pa.table({"vec_id": pa.array(ids, type=pa.int64()), "sim": pa.array(sims, type=pa.float64())})

    scored = _read_emb(sf_dir).map_batches(BucketScore, batch_format="pyarrow", concurrency=(1, 4))
    scored = scored.filter(expr=f"vec_id != {vec_id}")
    return ranked_head(scored, ["sim", "vec_id"], "sim_rank", k)


# ---------------------------------------------------------------------------
# zone_embedding_centroid (vector-column aggregation per spatial zone)
# ---------------------------------------------------------------------------

CENTROID_FP = 1 << 20  # per-element fixed-point scale for order-free sums


def zone_embedding_centroid(sf_dir: str, fp: int = CENTROID_FP) -> rd.Dataset:
    """Mean embedding per admin zone: vectors land in a zone via their
    derived position (min-rel_id fence rule, -1 = outside), then each
    zone reduces to its per-dimension centroid — the regional semantic
    signature used for zone-level retrieval/drift monitoring, and the
    template for ANY vector-column groupby aggregate.

    Float discipline: each float32 element converts exactly to float64
    and fixed-points ONCE (floor(v·2^20 + 0.5) — the k-means
    partial-sum trick); all shuffled quantities are int64, so the
    centroid is bit-stable under any batch split and the SQL oracle
    (unnest + the same integer arithmetic) mirrors it literally.

    Scale shape: per-batch (zone, dim) partial sums — the shuffle
    moves zones × dims rows per batch, never vectors; one
    lattice-bounded groupby; the division happens once per output row.

    Output: (rel_id, dim, n_vecs, mean) with dim 0-based and mean
    rounded 6.
    """
    from .. import fixtures
    from ray.data.aggregate import Sum

    ds = _read_emb(sf_dir)
    rects = fixtures.admin_rects()
    sentinel = np.iinfo(np.int64).max

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)  # (n, d) float64, exact from float32
        ids = t["vec_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        best = np.full(len(ids), sentinel, dtype=np.int64)
        for r in rects:
            inside = (
                (lon >= r["lon_min"]) & (lon < r["lon_max"])
                & (lat >= r["lat_min"]) & (lat < r["lat_max"])
            )
            np.minimum(best, np.where(inside, np.int64(r["rel_id"]), sentinel), out=best)
        zone = np.where(best == sentinel, np.int64(-1), best)
        fpv = np.floor(m * fp + 0.5).astype(np.int64)  # (n, d)
        zs, inv = np.unique(zone, return_inverse=True)
        d = fpv.shape[1]
        sums = np.zeros((len(zs), d), dtype=np.int64)
        np.add.at(sums, inv, fpv)
        cnt = np.bincount(inv, minlength=len(zs)).astype(np.int64)
        return pa.table(
            {
                "rel_id": pa.array(np.repeat(zs, d), type=pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(zs)), type=pa.int64()),
                "n_vecs": pa.array(np.repeat(cnt, d), type=pa.int64()),
                "sum_fp": pa.array(sums.ravel(), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["rel_id", "dim"])
        .aggregate(Sum("n_vecs", alias_name="n_vecs"), Sum("sum_fp", alias_name="sum_fp"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["sum_fp"].to_numpy().astype(np.float64)
        n = t["n_vecs"].to_numpy().astype(np.float64)
        mean = duckdb_round(s / fp / n, 6)
        return pa.table(
            {
                "rel_id": t["rel_id"],
                "dim": t["dim"],
                "n_vecs": t["n_vecs"],
                "mean": pa.array(mean, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def zone_embedding_dispersion(sf_dir: str, fp: int = CENTROID_FP) -> rd.Dataset:
    """Per-zone per-dimension embedding variance — the semantic
    DIVERSITY audit beside :func:`zone_embedding_centroid`'s signature
    (a zone whose vectors all collapse to the centroid is a template
    farm; a high-variance zone is heterogeneous).  Population variance
    per (zone, dim): (n·Σq² − (Σq)²) / (n²·fp²) over the fixed-point
    element values q = floor(v·2^20 + 0.5).

    Float discipline: the shuffled moments (n, Σq, Σq²) are exact
    int64 (Σq² stays < 2^62 for |v| ≤ 2 up to ~10^6 vectors per zone —
    beyond that, rescale fp or widen to two-limb sums); the variance
    is ONE float64 expression evaluated in the same association on
    both engines, then rounded 6.

    Scale shape: identical to the centroid — per-batch (zone, dim)
    moment partials, one zone×dim-bounded groupby, stateless finish.

    Output: (rel_id, dim, n_vecs, var) with dim 0-based.
    """
    from ray.data.aggregate import Sum

    from .. import fixtures

    ds = _read_emb(sf_dir)
    rects = fixtures.admin_rects()
    sentinel = np.iinfo(np.int64).max

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        ids = t["vec_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        best = np.full(len(ids), sentinel, dtype=np.int64)
        for r in rects:
            inside = (
                (lon >= r["lon_min"]) & (lon < r["lon_max"])
                & (lat >= r["lat_min"]) & (lat < r["lat_max"])
            )
            np.minimum(best, np.where(inside, np.int64(r["rel_id"]), sentinel), out=best)
        zone = np.where(best == sentinel, np.int64(-1), best)
        q = np.floor(m * fp + 0.5).astype(np.int64)
        zs, inv = np.unique(zone, return_inverse=True)
        d = q.shape[1]
        s = np.zeros((len(zs), d), dtype=np.int64)
        sq = np.zeros((len(zs), d), dtype=np.int64)
        np.add.at(s, inv, q)
        np.add.at(sq, inv, q * q)
        cnt = np.bincount(inv, minlength=len(zs)).astype(np.int64)
        return pa.table(
            {
                "rel_id": pa.array(np.repeat(zs, d), type=pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(zs)), type=pa.int64()),
                "n_vecs": pa.array(np.repeat(cnt, d), type=pa.int64()),
                "sum_fp": pa.array(s.ravel(), type=pa.int64()),
                "sumsq_fp": pa.array(sq.ravel(), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["rel_id", "dim"])
        .aggregate(
            Sum("n_vecs", alias_name="n_vecs"),
            Sum("sum_fp", alias_name="sum_fp"),
            Sum("sumsq_fp", alias_name="sumsq_fp"),
        )
    )
    fp2 = float(fp) * float(fp)

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_vecs"].to_numpy().astype(np.float64)
        s = t["sum_fp"].to_numpy().astype(np.float64)
        sq = t["sumsq_fp"].to_numpy().astype(np.float64)
        var = duckdb_round((n * sq - s * s) / (n * n * fp2), 6)
        return pa.table(
            {
                "rel_id": t["rel_id"],
                "dim": t["dim"],
                "n_vecs": t["n_vecs"],
                "var": pa.array(var, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# pq_encode (product quantization — the compressed-ANN scale path)
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces
PQ_KSUB = 16  # centroids per subspace (4-bit codes)


def pq_codebooks(sample: np.ndarray, m: int = PQ_M, ksub: int = PQ_KSUB, iters: int = 8, seed: int = 5) -> list[np.ndarray]:
    """Per-subspace Lloyd codebooks (deterministic seeded init, fixed
    iterations — the kmeans_centroids contract, one seed per subspace)."""
    d = sample.shape[1]
    ds_sub = d // m
    return [
        kmeans_centroids(sample[:, j * ds_sub : (j + 1) * ds_sub], ksub, iters=iters, seed=seed + j)
        for j in range(m)
    ]


def _pq_encode_matrix(mat: np.ndarray, books: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """(codes[n, m] int64, recon_fp[n] int64): per-subspace argmin code
    + fixed-point total reconstruction SSE.  Identical numpy expression
    in engine and golden -> bit-identical doubles -> identical ints."""
    n = mat.shape[0]
    m = len(books)
    ds_sub = mat.shape[1] // m
    codes = np.empty((n, m), dtype=np.int64)
    sse = np.zeros(n, dtype=np.float64)
    for j, c in enumerate(books):
        x = mat[:, j * ds_sub : (j + 1) * ds_sub]
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        codes[:, j] = a
        sse += d2[np.arange(n), a]
    return codes, np.floor(sse * 1e9 + 0.5).astype(np.int64)


def pq_encode(sf_dir: str, m: int = PQ_M, ksub: int = PQ_KSUB, iters: int = 8, seed: int = 5) -> rd.Dataset:
    """Product-quantization encoding of the embedding corpus: split each
    vector into ``m`` subspaces, Lloyd-train a ``ksub``-entry codebook
    per subspace, emit each vector's code word + fixed-point
    reconstruction error — the memory-compressed ANN representation
    (m=4, ksub=16 -> 16 bits/vector vs 1024 for float32 D=32).

    Scale shape: codebooks train on a driver-side sample (the ivf_topk
    discipline — at 10^12 vectors the sample IS the training set) and
    broadcast once per worker; the encode pass is map-ONLY (no
    shuffle), emitting (vec_id, code_0..code_{m-1}, recon_fp).  The
    deterministic init + fixed iteration count make the codebooks, and
    therefore every code, engine-independent.
    """
    import pyarrow.parquet as _pq

    t = _pq.read_table(_emb_path(sf_dir), columns=["embedding"])
    sample = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    books = pq_codebooks(sample, m=m, ksub=ksub, iters=iters, seed=seed)
    bref = ray.put(books)

    def encode(batch: pa.Table) -> pa.Table:
        bks = ray.get(bref)
        mat = _emb_matrix(batch)
        codes, recon = _pq_encode_matrix(mat, bks)
        cols = {"vec_id": batch["vec_id"]}
        for j in range(len(bks)):
            cols[f"code_{j}"] = pa.array(codes[:, j], type=pa.int64())
        cols["recon_fp"] = pa.array(recon, type=pa.int64())
        return pa.table(cols)

    return _read_emb(sf_dir).map_batches(encode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding_label_outliers (mislabel screen) + zone_label_purity
# ---------------------------------------------------------------------------

OUTLIER_K = 5


def embedding_label_outliers(sf_dir: str, k: int = OUTLIER_K, fp: int = CENTROID_FP) -> rd.Dataset:
    """Mislabeled-sample screen: per label, the k vectors FARTHEST from
    their own label's centroid — the embedding-space data-quality audit
    a labeled corpus runs before training (a far outlier is a mislabel
    or a corrupt sample).

    Integer-exact: with q = floor(v·2^20 + 0.5) per element and the
    label moments (n, s_d = Σq), the scaled squared deviation
    d2_fp = Σ_d (n·q_d − s_d)² is a pure int64 sum (headroom: |n·q| <
    2^41 per term at 10^3 vectors/label — rescale fp beyond ~10^5/label),
    so the per-label (d2_fp desc, vec_id) ranking cannot diverge.

    Shape: one (label, dim)-bounded moment shuffle; the centroid table
    broadcasts back; the scoring pass is map-only; the final top-k is a
    label-bounded regroup.  Output: (label, vec_id, d2_fp, outlier_rank).
    """
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    ds = rd.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding", "label"])

    def moments(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        q = np.floor(m * fp + 0.5).astype(np.int64)
        lab = t["label"].to_numpy().astype(np.int64)
        n, d = q.shape
        return pa.table(
            {
                "label": pa.array(np.repeat(lab, d), type=pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
                "one": pa.array(np.ones(n * d, dtype=np.int64)),
                "q": pa.array(q.ravel()),
            }
        )

    cen = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(_Count(alias_name="n"), _Sum("q", alias_name="s"))
        .to_pandas()
        .sort_values(["label", "dim"])
    )
    labels = sorted(set(int(x) for x in cen["label"]))
    dims = cen["dim"].max() + 1
    # label-indexed gather tables: row r of s_mat is label labs_sorted[r]'s
    # per-dim int64 moment sum, so the scoring pass is pure matrix ops
    labs_sorted = np.array(labels, dtype=np.int64)
    n_by_label = np.empty(len(labels), dtype=np.int64)
    s_by_label = np.empty((len(labels), int(dims)), dtype=np.int64)
    for r, lb in enumerate(labels):
        g = cen[cen["label"] == lb]
        n_by_label[r] = int(g["n"].iloc[0])
        s_by_label[r] = g["s"].to_numpy().astype(np.int64)

    def score(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        q = np.floor(m * fp + 0.5).astype(np.int64)
        lab = t["label"].to_numpy().astype(np.int64)
        li = np.searchsorted(labs_sorted, lab)
        diff = n_by_label[li][:, None] * q - s_by_label[li]
        d2 = (diff * diff).sum(axis=1)
        return pa.table(
            {
                "label": pa.array(lab, type=pa.int64()),
                "vec_id": pa.array(t["vec_id"].to_numpy().astype(np.int64), type=pa.int64()),
                "d2_fp": pa.array(d2, type=pa.int64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["d2_fp", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
        g["outlier_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("label").map_groups(topk, batch_format="pandas")


def zone_label_purity(sf_dir: str) -> rd.Dataset:
    """Per-admin-zone label purity: majority embedding label and its
    share — the geography x taxonomy consistency audit (a zone whose
    vectors span many labels is heterogeneous or mis-geocoded).
    All-integer counts; the share is one mirrored division rounded 6.
    Zone assignment = min-rel_id containing rect (the dispersion rule).
    Output: (rel_id, n_vecs, top_label, top_n, purity)."""
    from ray.data.aggregate import Sum as _Sum

    from .. import fixtures

    rects = fixtures.admin_rects()
    sentinel = np.iinfo(np.int64).max

    ds = rd.read_parquet(_emb_path(sf_dir), columns=["vec_id", "label"])

    def zl_counts(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        zone = np.full(len(ids), sentinel, dtype=np.int64)
        for r in rects:
            m = (lon >= r["lon_min"]) & (lon < r["lon_max"]) & (lat >= r["lat_min"]) & (lat < r["lat_max"])
            zone[m] = np.minimum(zone[m], r["rel_id"])
        zone = np.where(zone == sentinel, -1, zone)
        lab = t["label"].to_numpy().astype(np.int64)
        key = zone * 1024 + lab
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "rel_id": pa.array(np.where(uniq >= 0, uniq // 1024, -1), type=pa.int64()),
                "label": pa.array(np.where(uniq >= 0, uniq % 1024, (uniq + 1024) % 1024), type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    zl = ds.map_batches(zl_counts, batch_format="pyarrow").groupby(["rel_id", "label"]).aggregate(
        _Sum("n", alias_name="n")
    )

    def purity(g: pd.DataFrame) -> pd.DataFrame:
        from ..stages.common import duckdb_round as _dr

        g = g.sort_values(["n", "label"], ascending=[False, True])
        total = int(g["n"].sum())
        top = g.iloc[0]
        return pd.DataFrame(
            {
                "rel_id": [int(top["rel_id"])],
                "n_vecs": [total],
                "top_label": [int(top["label"])],
                "top_n": [int(top["n"])],
                "purity": [float(_dr(np.array([top["n"] / total]), 6)[0])],
            }
        )

    return zl.groupby("rel_id").map_groups(purity, batch_format="pandas")


def cluster_label_confusion(sf_dir: str, k: int = 8, iters: int = 5) -> rd.Dataset:
    """Clustering evaluation: the (kmeans cluster x ground-truth label)
    confusion matrix — the purity/NMI input every unsupervised-quality
    audit starts from.  The assignment pass re-attaches each vector's
    stored label map-side (one read carries both columns), so the only
    exchange is the (cluster, label)-bounded count reduce.  Integer
    counts over a bit-deterministic clustering (fixed-point Lloyd):
    engine == golden recompute exactly.
    Output: (cluster, label, n_vecs)."""
    from ray.data.aggregate import Count as _Count

    assigned = kmeans_embeddings(sf_dir, k=k, iters=iters)
    labels = rd.read_parquet(_emb_path(sf_dir), columns=["vec_id", "label"])
    j = safe_join(assigned, labels, join_type="inner", num_partitions=2, on=("vec_id",))

    def norm(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "cluster": pc.cast(t["cluster"], pa.int64()),
                "label": pc.cast(t["label"], pa.int64()),
            }
        )

    return (
        j.map_batches(norm, batch_format="pyarrow")
        .groupby(["cluster", "label"])
        .aggregate(_Count(alias_name="n_vecs"))
        .sort(["cluster", "label"])
    )


def knn_classify(sf_dir: str, k: int = 5) -> rd.Dataset:
    """Leave-one-out k-NN label classification: every vector's label
    predicted by the majority label of its k nearest OTHER vectors —
    the model-free inference baseline (and the label-noise estimator:
    low k-NN accuracy for a label flags annotation problems).

    Scale shape: the labeled corpus broadcasts once as a normalized
    matrix (the PQ/IVF sample discipline — at 10^12 rows the broadcast
    side is the IVF-probed candidate set instead, same stage contract);
    scoring is one GEMM per batch, map-only; per-label accuracy is one
    bounded reduce.  Cosines are rounded to 6dp BEFORE ranking with a
    vec_id tiebreak in BOTH engines, so neighbor sets cannot diverge on
    GEMM-vs-scalar ulps.  Output: (label, n_vecs, n_correct, accuracy).
    """
    import pyarrow.parquet as _pq

    from ray.data.aggregate import Sum as _Sum
    from ..stages.common import duckdb_round as _dr

    t = _pq.read_table(_emb_path(sf_dir), columns=["vec_id", "embedding", "label"])
    ids_all = np.asarray(t["vec_id"].to_numpy(), dtype=np.int64)
    m_all = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    mn_all = m_all / np.linalg.norm(m_all, axis=1)[:, None]
    lab_all = np.asarray(t["label"].to_numpy(), dtype=np.int64)
    order = np.argsort(ids_all, kind="stable")
    bref = ray.put((ids_all[order], mn_all[order], lab_all[order]))

    def classify(batch: pa.Table) -> pa.Table:
        cids, cmat, clab = ray.get(bref)
        m = _emb_matrix(batch)
        mn = m / np.linalg.norm(m, axis=1)[:, None]
        ids = np.asarray(batch["vec_id"].to_numpy(), dtype=np.int64)
        lab = np.asarray(batch["label"].to_numpy(), dtype=np.int64)
        sims = _dr(mn @ cmat.T, 6)
        preds = np.empty(len(ids), dtype=np.int64)
        for i in range(len(ids)):
            s = sims[i].copy()
            s[cids == ids[i]] = -np.inf  # leave-one-out
            top = np.lexsort((cids, -s))[:k]
            votes = clab[top]
            uniq, cnt = np.unique(votes, return_counts=True)
            best = np.lexsort((uniq, -cnt))[0]
            preds[i] = uniq[best]
        return pa.table(
            {
                "label": pa.array(lab, type=pa.int64()),
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
                "correct": pa.array((preds == lab).astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding", "label"])
        .map_batches(classify, batch_format="pyarrow", concurrency=4)
        .groupby("label")
        .aggregate(_Sum("one", alias_name="n_vecs"), _Sum("correct", alias_name="n_correct"))
    )

    def acc(t2: pa.Table) -> pa.Table:
        a = _dr(t2["n_correct"].to_numpy().astype(np.float64) / t2["n_vecs"].to_numpy().astype(np.float64), 6)
        return pa.table(
            {
                "label": t2["label"],
                "n_vecs": t2["n_vecs"],
                "n_correct": t2["n_correct"],
                "accuracy": pa.array(a, type=pa.float64()),
            }
        )

    return agg.map_batches(acc, batch_format="pyarrow").sort("label")


def embedding_dim_stats(sf_dir: str, fp: int = CENTROID_FP) -> rd.Dataset:
    """Corpus-wide per-dimension distribution stats (n, mean, var,
    min, max) — the normalization constants a trainer derives before
    standardizing a vector column, and the drift fingerprint compared
    between corpus snapshots.

    Float discipline: the zone_embedding_centroid fixed-point template
    — every float32 element converts exactly to float64 and quantizes
    ONCE to int64; all shuffled partials (Σq, Σq², min q, max q, n)
    are integers, so every stat is bit-stable under any batch split and
    the unnest-based SQL oracle mirrors the arithmetic literally.  At
    10^9+ vectors Σq² needs the int128 hi/lo split (noted, not needed
    at bench scale).

    Scale shape: per-batch per-dim partials — 5 ints × dims per batch
    shuffle, never vectors; one dim-bounded groupby.
    Output: (dim, n_vecs, mean, var, vmin, vmax).
    """
    from ray.data.aggregate import Max, Min, Sum

    from ..stages.common import duckdb_round

    ds = _read_emb(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)  # (n, d) float64, exact from float32
        q = np.floor(m * fp + 0.5).astype(np.int64)
        d = q.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64), type=pa.int64()),
                "n_vecs": pa.array(np.full(d, q.shape[0], dtype=np.int64), type=pa.int64()),
                "sum_fp": pa.array(q.sum(axis=0, dtype=np.int64), type=pa.int64()),
                "sumsq_fp": pa.array((q * q).sum(axis=0, dtype=np.int64), type=pa.int64()),
                "min_fp": pa.array(q.min(axis=0), type=pa.int64()),
                "max_fp": pa.array(q.max(axis=0), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n_vecs", alias_name="n_vecs"),
            Sum("sum_fp", alias_name="sum_fp"),
            Sum("sumsq_fp", alias_name="sumsq_fp"),
            Min("min_fp", alias_name="min_fp"),
            Max("max_fp", alias_name="max_fp"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_vecs"].to_numpy().astype(np.float64)
        s = t["sum_fp"].to_numpy().astype(np.float64)
        sq = t["sumsq_fp"].to_numpy().astype(np.float64)
        mean = duckdb_round(s / fp / n, 6)
        var = duckdb_round((n * sq - s * s) / (n * n * (float(fp) * float(fp))), 6)
        vmin = duckdb_round(t["min_fp"].to_numpy().astype(np.float64) / fp, 6)
        vmax = duckdb_round(t["max_fp"].to_numpy().astype(np.float64) / fp, 6)
        return pa.table(
            {
                "dim": t["dim"],
                "n_vecs": t["n_vecs"],
                "mean": pa.array(mean, type=pa.float64()),
                "var": pa.array(var, type=pa.float64()),
                "vmin": pa.array(vmin, type=pa.float64()),
                "vmax": pa.array(vmax, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("dim")


MATRYOSHKA_HALF = 32  # truncation width (full width is 64)


def matryoshka_fidelity(sf_dir: str, half: int = MATRYOSHKA_HALF, fp: int = CENTROID_FP) -> rd.Dataset:
    """Per-vector Matryoshka truncation fidelity: the cosine between
    each embedding and its first-``half``-dims truncation (zero-padded)
    — cos = sqrt(Σ_half q² / Σ_full q²) — the retrieval-quality-vs-
    memory audit run before shipping truncated embeddings (MRL-style
    dimensionality reduction).

    Scale shape: map-ONLY — two per-row integer sums of squares over
    the fixed-point grid; one float sqrt per row, mirrored verbatim.
    Output: (vec_id, trunc_cos) rounded 6.
    """
    from ..stages.common import duckdb_round

    ds = _read_emb(sf_dir)

    def fid(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        q = np.floor(m * fp + 0.5).astype(np.int64)
        sh = (q[:, :half] * q[:, :half]).sum(axis=1, dtype=np.int64).astype(np.float64)
        sf = (q * q).sum(axis=1, dtype=np.int64).astype(np.float64)
        cosv = duckdb_round(np.sqrt(sh / sf), 6)
        return pa.table(
            {
                "vec_id": pa.array(t["vec_id"].to_numpy().astype(np.int64), type=pa.int64()),
                "trunc_cos": pa.array(cosv, type=pa.float64()),
            }
        )

    return ds.map_batches(fid, batch_format="pyarrow").sort("vec_id")


def ivf_multi_topk(
    sf_dir: str,
    k: int = 10,
    vec_ids: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8),
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 8,
    seed: int = 5,
) -> rd.Dataset:
    """Batched IVF search: top-k for EVERY query in one corpus pass —
    each batch assigns its vectors to the coarse quantizer once, then
    each query scores only rows landing in its ``nprobe`` probed cells
    (ivf_topk's pruning × ann_multi_topk's batching).
    Output: (query_vec_id, sim_rank, vec_id).
    """
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    t_all = pq.read_table(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    sample = np.stack(t_all["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    cents = kmeans_centroids(sample, n_centroids, iters=iters, seed=seed)

    tq = (
        pads.dataset(_emb_path(sf_dir))
        .to_table(columns=["vec_id", "embedding"], filter=pads.field("vec_id").isin(list(vec_ids)))
        .sort_by("vec_id")
    )
    qids = np.asarray(tq["vec_id"].to_numpy(), dtype=np.int64)
    q = np.stack(tq["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    qn = q / np.linalg.norm(q, axis=1)[:, None]
    # per-query probe sets against the shared quantizer
    qd = ((cents[None, :, :] - q[:, None, :]) ** 2).sum(axis=2)  # (Q, C)
    probes = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]  # (Q, nprobe)
    probe_mask = np.zeros((len(qids), len(cents)), dtype=bool)
    probe_mask[np.arange(len(qids))[:, None], probes] = True
    ref = ray.put((qids, qn, cents, probe_mask))

    class IvfMultiScore:
        def __init__(self):
            self.qids, self.qn, self.c, self.pm = ray.get(ref)
            self.cn2 = (self.c * self.c).sum(axis=1)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _emb_matrix(batch)
            ids = batch["vec_id"].to_numpy().astype(np.int64)
            d2 = self.cn2[None, :] - 2.0 * (m @ self.c.T) + (m * m).sum(axis=1)[:, None]
            cell = np.argmin(d2, axis=1)  # (n,)
            norms = np.linalg.norm(m, axis=1)
            mn = m / np.where(norms == 0, 1.0, norms)[:, None]
            sims = mn @ self.qn.T  # (n, Q)
            keep = self.pm[:, cell].T  # (n, Q): row in query's probed cells
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(self.qids):
                kj = keep[:, j] & (ids != qid)
                if not kj.any():
                    continue
                sj = sims[kj, j]
                vj = ids[kj]
                top = np.lexsort((vj, -sj))[: min(len(vj), 64)]
                out_q.append(np.full(len(top), qid, dtype=np.int64))
                out_v.append(vj[top])
                out_s.append(sj[top])
            if not out_q:
                return pa.table(
                    {
                        "query_vec_id": pa.array([], type=pa.int64()),
                        "vec_id": pa.array([], type=pa.int64()),
                        "sim": pa.array([], type=pa.float64()),
                    }
                )
            return pa.table(
                {
                    "query_vec_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                    "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
                }
            )

    scored = _read_emb(sf_dir).map_batches(
        IvfMultiScore, batch_format="pyarrow", concurrency=(1, 4)
    )

    def per_query_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
        df["sim_rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["query_vec_id", "sim_rank", "vec_id"]]

    return scored.groupby("query_vec_id").map_groups(per_query_rank, batch_format="pandas")


def ann_recall_eval(sf_dir: str, k: int = 10, vec_ids: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8)) -> rd.Dataset:
    """ANN quality harness: recall@k of the batched IVF search against
    the exact batched search, per query — the measured-recall gate an
    index rollout runs before switching retrieval paths (the number the
    docstrings promise, emitted as a CHECKABLE result).

    Both sides run their real distributed pipelines; the comparison
    joins two (Q·k)-row tables driver-side (query-bounded).  recall is
    the one mirrored float division.  Output: (query_vec_id, n_overlap,
    recall).
    """
    exact = ann_multi_topk(sf_dir, k=k, vec_ids=vec_ids).to_pandas()
    ivf = ivf_multi_topk(sf_dir, k=k, vec_ids=vec_ids).to_pandas()
    rows = []
    for qid in sorted(set(exact["query_vec_id"])):
        e = set(exact[exact["query_vec_id"] == qid]["vec_id"])
        a = set(ivf[ivf["query_vec_id"] == qid]["vec_id"])
        n = len(e & a)
        rows.append((int(qid), n, np.float64(n) / np.float64(k)))
    return pa.table(
        {
            "query_vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_overlap": pa.array([r[1] for r in rows], type=pa.int64()),
            "recall": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )


class MultiHammingTopK:
    """Actor-pool stage: per-batch HAMMING distance over sign-binarized
    embeddings vs a broadcast query-bit matrix — the 1-bit-per-dim
    retrieval path (32× memory cut vs float32) whose quality
    binary_embedding_eval audits.

    Bits = (e_j > 0); Hamming via two GEMMs (matches = b·qᵀ +
    (1−b)·(1−q)ᵀ, ham = D − matches) — no per-pair Python.  Local
    prune uses the SAME composite order as the global selection
    (ham asc, vec_id asc) so the prune is tie-safe.
    """

    def __init__(self, qref, k: int = 10):
        qids, qbits = ray.get(qref) if not isinstance(qref, tuple) else qref
        self.qids = qids  # (Q,) int64
        self.qbits = qbits.astype(np.int64)  # (Q, D) 0/1
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        ids = np.asarray(batch["vec_id"].to_numpy(), dtype=np.int64)
        b = (m > 0.0).astype(np.int64)
        d = b.shape[1]
        matches = b @ self.qbits.T + (1 - b) @ (1 - self.qbits).T  # (n, Q)
        ham = d - matches
        out_q, out_id, out_h = [], [], []
        for qi, qid in enumerate(self.qids):
            mask = ids != qid
            cand_ids, cand_h = ids[mask], ham[mask, qi]
            top = np.lexsort((cand_ids, cand_h))[: self.k]
            out_q.append(np.full(len(top), qid, dtype=np.int64))
            out_id.append(cand_ids[top])
            out_h.append(cand_h[top])
        return pa.table(
            {
                "query_vec_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
                "hamming": pa.array(np.concatenate(out_h).astype(np.int64), type=pa.int64()),
            }
        )


def binary_hamming_topk(
    sf_dir: str, k: int = 10, vec_ids: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8)
) -> rd.Dataset:
    """Batched top-k retrieval over SIGN-BINARIZED embeddings: Hamming
    distance to each broadcast query's bit vector, one corpus pass
    (ann_multi_topk's shape at 1 bit/dim).  Output: (query_vec_id,
    ham_rank, vec_id, hamming)."""
    import pyarrow.dataset as pads

    t = (
        pads.dataset(_emb_path(sf_dir))
        .to_table(columns=["vec_id", "embedding"], filter=pads.field("vec_id").isin(list(vec_ids)))
        .sort_by("vec_id")
    )
    qids = np.asarray(t["vec_id"].to_numpy(), dtype=np.int64)
    q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    qbits = (q > 0.0)
    qref = ray.put((qids, qbits))

    scored = _read_emb(sf_dir).map_batches(
        MultiHammingTopK,
        fn_constructor_kwargs=dict(qref=qref, k=k),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def per_query_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["hamming", "vec_id"], ascending=[True, True]).head(k).reset_index(drop=True)
        df["ham_rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["query_vec_id", "ham_rank", "vec_id", "hamming"]]

    return scored.groupby("query_vec_id").map_groups(per_query_rank, batch_format="pandas")


def binary_embedding_eval(
    sf_dir: str, k: int = 10, vec_ids: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8)
) -> rd.Dataset:
    """Binary-embedding retrieval audit: recall@k of sign-bit Hamming
    search against exact float cosine search, per query — the
    quality-vs-32×-memory number a retrieval stack measures before
    shipping binarized embeddings (companion of ann_recall_eval's IVF
    audit and matryoshka_fidelity's truncation audit).

    Both sides run their real distributed pipelines; the comparison
    joins two (Q·k)-row tables driver-side (query-bounded).
    Output: (query_vec_id, n_overlap, recall).
    """
    exact = ann_multi_topk(sf_dir, k=k, vec_ids=vec_ids).to_pandas()
    binry = binary_hamming_topk(sf_dir, k=k, vec_ids=vec_ids).to_pandas()
    rows = []
    for qid in sorted(set(exact["query_vec_id"])):
        e = set(exact[exact["query_vec_id"] == qid]["vec_id"])
        a = set(binry[binry["query_vec_id"] == qid]["vec_id"])
        n = len(e & a)
        rows.append((int(qid), n, np.float64(n) / np.float64(k)))
    return rd.from_arrow(
        pa.table(
            {
                "query_vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "n_overlap": pa.array([r[1] for r in rows], type=pa.int64()),
                "recall": pa.array([r[2] for r in rows], type=pa.float64()),
            }
        )
    )


def knn_pr_curve(sf_dir: str, k: int = 5) -> rd.Dataset:
    """One-vs-rest PRECISION/RECALL CURVE of the leave-one-out k-NN
    classifier: for every label L and vote threshold t in 1..k, predict
    "is L" when >= t of the k nearest other vectors carry L — the
    operating-point evaluation (which threshold trades precision for
    recall?) that turns :func:`knn_classify`'s single accuracy number
    into a deployable decision curve.

    Determinism: identical neighbor discipline to knn_classify (cosines
    rounded to 6dp BEFORE ranking, vec_id tiebreak), so vote counts are
    engine-independent; tp/fp/fn are exact integers and precision /
    recall are mirrored float expressions.

    Scale shape: corpus broadcasts once (IVF-probed candidates at real
    scale); ONE GEMM per batch; per-batch (label, votes, is_true)
    count combiner -> a (labels x (k+1) x 2)-bounded groupby -> the
    threshold expansion runs on the aggregate only.

    Output: (label, threshold, tp, fp, fn, precision, recall).
    """
    import pyarrow.parquet as _pq

    from ray.data.aggregate import Sum as _Sum
    from ..stages.common import duckdb_round as _dr

    t = _pq.read_table(_emb_path(sf_dir), columns=["vec_id", "embedding", "label"])
    ids_all = np.asarray(t["vec_id"].to_numpy(), dtype=np.int64)
    m_all = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    mn_all = m_all / np.linalg.norm(m_all, axis=1)[:, None]
    lab_all = np.asarray(t["label"].to_numpy(), dtype=np.int64)
    order = np.argsort(ids_all, kind="stable")
    labels_uniq = np.unique(lab_all)
    bref = ray.put((ids_all[order], mn_all[order], lab_all[order], labels_uniq))

    def vote_counts(batch: pa.Table) -> pa.Table:
        cids, cmat, clab, luniq = ray.get(bref)
        m = _emb_matrix(batch)
        mn = m / np.linalg.norm(m, axis=1)[:, None]
        ids = np.asarray(batch["vec_id"].to_numpy(), dtype=np.int64)
        lab = np.asarray(batch["label"].to_numpy(), dtype=np.int64)
        sims = _dr(mn @ cmat.T, 6)
        nl = len(luniq)
        lpos = {int(v): i for i, v in enumerate(luniq)}
        # count rows keyed (label_idx, votes, is_true)
        counts = np.zeros((nl, k + 1, 2), dtype=np.int64)
        for i in range(len(ids)):
            s = sims[i].copy()
            s[cids == ids[i]] = -np.inf  # leave-one-out
            top = np.lexsort((cids, -s))[:k]
            votes = np.zeros(nl, dtype=np.int64)
            for v in clab[top]:
                votes[lpos[int(v)]] += 1
            ti = lpos[int(lab[i])]
            counts[ti, votes[ti], 1] += 1  # truth row (always, even 0 votes)
            for li in range(nl):
                if li != ti and votes[li] > 0:
                    counts[li, votes[li], 0] += 1
        li, vo, tr = np.nonzero(counts)
        return pa.table(
            {
                "label": pa.array(luniq[li], type=pa.int64()),
                "votes": pa.array(vo.astype(np.int64), type=pa.int64()),
                "is_true": pa.array(tr.astype(np.int64), type=pa.int64()),
                "n": pa.array(counts[li, vo, tr], type=pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding", "label"])
        .map_batches(vote_counts, batch_format="pyarrow", concurrency=4)
        .groupby(["label", "votes", "is_true"])
        .aggregate(_Sum("n", alias_name="n"))
        .to_pandas()  # bounded: labels x (k+1) x 2
    )

    rows = {"label": [], "threshold": [], "tp": [], "fp": [], "fn": []}
    for lb in sorted(agg["label"].unique()):
        g = agg[agg["label"] == lb]
        for t_ in range(1, k + 1):
            tp = int(g[(g["votes"] >= t_) & (g["is_true"] == 1)]["n"].sum())
            fp = int(g[(g["votes"] >= t_) & (g["is_true"] == 0)]["n"].sum())
            fn = int(g[(g["votes"] < t_) & (g["is_true"] == 1)]["n"].sum())
            rows["label"].append(int(lb))
            rows["threshold"].append(t_)
            rows["tp"].append(tp)
            rows["fp"].append(fp)
            rows["fn"].append(fn)
    tp = np.asarray(rows["tp"], dtype=np.float64)
    fp = np.asarray(rows["fp"], dtype=np.float64)
    fn = np.asarray(rows["fn"], dtype=np.float64)
    prec = np.where(tp + fp > 0, _dr(tp / np.maximum(tp + fp, 1.0), 6), 0.0)
    rec = np.where(tp + fn > 0, _dr(tp / np.maximum(tp + fn, 1.0), 6), 0.0)
    return rd.from_arrow(
        pa.table(
            {
                "label": pa.array(rows["label"], type=pa.int64()),
                "threshold": pa.array(rows["threshold"], type=pa.int64()),
                "tp": pa.array(rows["tp"], type=pa.int64()),
                "fp": pa.array(rows["fp"], type=pa.int64()),
                "fn": pa.array(rows["fn"], type=pa.int64()),
                "precision": pa.array(prec, type=pa.float64()),
                "recall": pa.array(rec, type=pa.float64()),
            }
        )
    )


def ann_filtered_topk(sf_dir: str, k: int = 10, vec_id: int = 1, label: int | None = None) -> rd.Dataset:
    """FILTERED vector search: global top-k most-similar vectors to the
    query among vectors carrying a given LABEL — the metadata-
    constrained ANN every vector store serves ("nearest images of class
    c").  Filter pushes down BEFORE scoring (pre-filtering: exact
    recall, unlike post-filter-then-truncate), so only the label's rows
    are ever scored.

    Defaults: the query vector's own label (self excluded).
    Output: (sim_rank, vec_id, label).
    """
    import pyarrow.parquet as _pq

    if label is None:
        t = _pq.read_table(_emb_path(sf_dir), columns=["vec_id", "label"])
        label = int(t["label"].to_numpy()[np.asarray(t["vec_id"].to_numpy()) == vec_id][0])
    qref = ray.put(query_vector(sf_dir, vec_id))
    ds = rd.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding", "label"]).filter(
        expr=f"label == {label} and vec_id != {vec_id}"
    )
    scored = ds.map_batches(
        CosineTopK, fn_constructor_kwargs=dict(query_ref=qref, k=k), batch_format="pyarrow", concurrency=(1, 4)
    )

    def tag(t2: pa.Table) -> pa.Table:
        return t2.append_column("label", pa.array(np.full(t2.num_rows, label, dtype=np.int64), type=pa.int64()))

    return ranked_head(scored.map_batches(tag, batch_format="pyarrow"), ["sim", "vec_id"], "sim_rank", k, keep=["vec_id", "label"])


PCA_K = 4
PCA_FP = 1 << 20  # fixed-point quantum for the exact moment sums


def pca_moments(sf_dir: str, fp: int = PCA_FP) -> tuple[int, np.ndarray, np.ndarray]:
    """Distributed exact second-moment accumulation: (n, Σq, Σ q qᵀ)
    over fixed-point embeddings q = rint(x·fp), folded through Ray's
    aggregate tree as one (1 + d + d²) int64 block — integer adds are
    order-free, so the moments (hence the covariance, hence the
    eigenbasis) are bit-identical regardless of merge order.

    Headroom: Σ q_i q_j ≤ n·(fp·|x|max)² ≈ n·2^38 at unit scale — int64
    holds to ~2^25 rows per accumulator; beyond that drop fp to 2^14
    or shard the accumulator (the kmeans_embeddings discipline).
    """
    from ray.data.aggregate import AggregateFn

    ds = _read_emb(sf_dir)
    probe = ds.take_batch(1, batch_format="pyarrow")
    d = _emb_matrix(probe).shape[1]

    def accumulate(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        m = _emb_matrix(block)
        if m.shape[0] == 0:
            return acc
        q = np.rint(m * fp).astype(np.int64)
        acc = acc.copy()
        acc[0] += m.shape[0]
        acc[1 : 1 + d] += q.sum(axis=0)
        acc[1 + d :] += (q.T @ q).ravel()
        return acc

    agg = AggregateFn(
        init=lambda _key: np.zeros(1 + d + d * d, dtype=np.int64),
        accumulate_block=accumulate,
        merge=lambda a, b: a + b,
        finalize=lambda acc: acc,
        name="pca_moments",
    )
    out = ds.aggregate(agg)["pca_moments"]
    n = int(out[0])
    return n, out[1 : 1 + d].copy(), out[1 + d :].reshape(d, d).copy()


def pca_basis(sf_dir: str, k: int = PCA_K, fp: int = PCA_FP) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean, top-k eigenvalues, top-k eigenvectors) of the embedding
    covariance, from the exact integer moments.  Deterministic sign
    convention: each eigenvector's largest-|component| entry is made
    positive (eigh's sign is otherwise arbitrary)."""
    n, s1, s2 = pca_moments(sf_dir, fp=fp)
    mu = s1.astype(np.float64) / (fp * n)
    ex2 = s2.astype(np.float64) / (fp * fp * n)
    cov = ex2 - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    w, v = w[order], v[:, order]
    for j in range(v.shape[1]):
        i = int(np.argmax(np.abs(v[:, j])))
        if v[i, j] < 0:
            v[:, j] = -v[:, j]
    return mu, w, v


def pca_project(sf_dir: str, k: int = PCA_K, fp: int = PCA_FP) -> rd.Dataset:
    """PCA dimensionality reduction of the embedding column — the
    standard pre-indexing compaction of a vector pipeline (project to
    the top-k principal axes, keep the per-vector residual as a
    fidelity signal).  One aggregate-tree moment pass (pca_moments) +
    one broadcast map pass; nothing row-bounded ever reaches the
    driver.

    Output: (vec_id, pc1..pck, residual) — projections and the exact
    orthogonal-complement residual ‖x−μ‖² − Σ proj², all round-6.
    """
    from ..stages.common import duckdb_round

    mu, _w, v = pca_basis(sf_dir, k=k, fp=fp)
    bref = ray.put((mu, v))

    class Project:
        def __init__(self):
            self.mu, self.v = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _emb_matrix(batch) - self.mu
            proj = m @ self.v
            resid = (m * m).sum(axis=1) - (proj * proj).sum(axis=1)
            cols = {"vec_id": batch["vec_id"]}
            for j in range(proj.shape[1]):
                cols[f"pc{j + 1}"] = pa.array(duckdb_round(proj[:, j], 6), type=pa.float64())
            cols["residual"] = pa.array(duckdb_round(resid, 6), type=pa.float64())
            return pa.table(cols)

    return _read_emb(sf_dir).map_batches(Project, batch_format="pyarrow", concurrency=(1, 4))


def pca_explained_variance(sf_dir: str, k: int = PCA_K, fp: int = PCA_FP) -> rd.Dataset:
    """Scree summary: per principal component, the eigenvalue and the
    cumulative explained-variance share — the k-selection diagnostic."""
    from ..stages.common import duckdb_round

    n, s1, s2 = pca_moments(sf_dir, fp=fp)
    mu = s1.astype(np.float64) / (fp * n)
    ex2 = s2.astype(np.float64) / (fp * fp * n)
    cov = ex2 - np.outer(mu, mu)
    w = np.linalg.eigvalsh(cov)[::-1]
    total = w.sum()
    top = w[:k]
    cum = np.cumsum(top) / total
    return rd.from_arrow(
        pa.table(
            {
                "pc": pa.array(np.arange(1, k + 1, dtype=np.int64)),
                "eigenvalue": pa.array(duckdb_round(top, 9), type=pa.float64()),
                "cum_explained": pa.array(duckdb_round(cum, 6), type=pa.float64()),
            }
        )
    )


def simplified_silhouette(sf_dir: str, k: int = 8, iters: int = 5) -> rd.Dataset:
    """Per-cluster SIMPLIFIED silhouette of the distributed k-means —
    the O(N·k) clustering-quality score (a = distance to own centroid,
    b = distance to the nearest OTHER centroid, s = (b-a)/max(a,b))
    that replaces the O(N²) exact silhouette at corpus scale; the
    standard trainer-side check that k isn't mis-chosen.

    Scale shape: centroids broadcast once (ray.put); ONE map pass emits
    per-batch (cluster, n, s_fp) partials — s folded as FIXED-POINT
    int64 (round(s * 2^20)), so the k-row groupby sum is exact integer
    addition and the mean is bit-identical to the golden sequential
    recompute regardless of batch/merge order.  Output: (cluster,
    n_vecs, mean_silhouette) sorted by cluster.
    """
    from ray.data.aggregate import Sum

    cents = lloyd_centroids(sf_dir, k=k, iters=iters)
    cref = ray.put(cents)
    ds = _read_emb(sf_dir)

    class Partial:
        def __init__(self):
            self.c = ray.get(cref)
            self.cn2 = (self.c * self.c).sum(axis=1)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _emb_matrix(batch)
            if m.shape[0] == 0:
                z = pa.array([], type=pa.int64())
                return pa.table({"cluster": z, "n": z, "s_fp": z})
            d2 = np.maximum(self.cn2[None, :] - 2.0 * (m @ self.c.T) + (m * m).sum(axis=1)[:, None], 0.0)
            own = d2.argmin(axis=1)
            rows = np.arange(m.shape[0])
            a = np.sqrt(d2[rows, own])
            d2[rows, own] = np.inf
            b = np.sqrt(d2.min(axis=1))
            mx = np.maximum(a, b)
            s = np.where(mx > 0, (b - a) / np.where(mx > 0, mx, 1.0), 0.0)
            s_fp = np.rint(s * KMEANS_SCALE).astype(np.int64)
            uc = np.unique(own)
            acc = np.zeros(k, dtype=np.int64)  # int64 fold, never float
            np.add.at(acc, own, s_fp)
            return pa.table(
                {
                    "cluster": pa.array(uc, type=pa.int64()),
                    "n": pa.array(np.bincount(own, minlength=k)[uc].astype(np.int64), type=pa.int64()),
                    "s_fp": pa.array(acc[uc], type=pa.int64()),
                }
            )

    agg = (
        ds.map_batches(Partial, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("cluster")
        .aggregate(Sum("n", alias_name="n_vecs"), Sum("s_fp", alias_name="s_fp"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n_vecs"].to_numpy().astype(np.int64)
        s = t["s_fp"].to_numpy().astype(np.int64)
        mean = np.round(s / (KMEANS_SCALE * n.astype(np.float64)), 6)
        return pa.table(
            {
                "cluster": t["cluster"],
                "n_vecs": pa.array(n, type=pa.int64()),
                "mean_silhouette": pa.array(mean, type=pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort("cluster")


SQ8_FP = 1 << 30  # fixed-point quantum for squared-error sums


def sq8_quantization_error(sf_dir: str) -> rd.Dataset:
    """Scalar int8 quantization audit (the SQ8 compression every
    vector store offers beside PQ): per dimension, learn (min, max)
    from one aggregate pass, quantize to 256 levels, and measure the
    reconstruction error — the numbers that decide whether 4× embedding
    compression is safe for retrieval.

    Scale shape: pass 1 folds a (d, 2) min/max array through the
    aggregate tree (min/max are associative — order-free exactly);
    the (min, max) matrix broadcasts via ray.put; pass 2 is map-only,
    emitting per-batch (dim, n, sqerr_fp, maxerr_fp) int64 partials
    (floor(v·2^30 + 0.5)) into a d-row groupby.  int64 headroom:
    per-element sqerr·2^30 ≲ 2·10^4 at unit-scale embeddings, so sums
    overflow past ~4·10^14 rows per dim — shard the accumulator beyond
    (the kmeans discipline).  Output: (dim_idx, min_v, max_v, scale,
    mse, max_abs_err) sorted by dim_idx, floats rounded to 9.
    """
    from ray.data.aggregate import AggregateFn, Max, Sum

    ds = _read_emb(sf_dir)

    def make_minmax():
        def accumulate(acc, block: pa.Table):
            m = _emb_matrix(block)
            if m.shape[0] == 0:
                return acc
            if acc is None:
                return np.stack([m.min(axis=0), m.max(axis=0)])
            return np.stack([np.minimum(acc[0], m.min(axis=0)), np.maximum(acc[1], m.max(axis=0))])

        def merge(a, b):
            if a is None:
                return b
            if b is None:
                return a
            return np.stack([np.minimum(a[0], b[0]), np.maximum(a[1], b[1])])

        return AggregateFn(
            init=lambda _key: None,
            accumulate_block=accumulate,
            merge=merge,
            finalize=lambda acc: acc,
            name="minmax",
        )

    mm = ds.aggregate(make_minmax())["minmax"]
    lo, hi = mm[0], mm[1]
    scale = (hi - lo) / 255.0
    safe = np.where(scale > 0, scale, 1.0)
    bref = ray.put((lo, scale, safe))

    class Partial:
        def __init__(self):
            self.lo, self.scale, self.safe = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _emb_matrix(batch)
            d = self.lo.shape[0]
            if m.shape[0] == 0:
                z = pa.array([], type=pa.int64())
                return pa.table({"dim_idx": z, "n": z, "sqerr_fp": z, "maxerr_fp": z})
            q = np.clip(np.rint((m - self.lo) / self.safe), 0, 255)
            recon = self.lo + q * self.scale
            err = np.abs(m - recon)
            sq_fp = np.floor(err * err * SQ8_FP + 0.5).astype(np.int64)
            mx_fp = np.floor(err * SQ8_FP + 0.5).astype(np.int64)
            return pa.table(
                {
                    "dim_idx": pa.array(np.arange(d, dtype=np.int64), type=pa.int64()),
                    "n": pa.array(np.full(d, m.shape[0], dtype=np.int64), type=pa.int64()),
                    "sqerr_fp": pa.array(sq_fp.sum(axis=0), type=pa.int64()),
                    "maxerr_fp": pa.array(mx_fp.max(axis=0), type=pa.int64()),
                }
            )

    agg = (
        ds.map_batches(Partial, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("dim_idx")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sqerr_fp", alias_name="sqerr_fp"),
            Max("maxerr_fp", alias_name="maxerr_fp"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        di = t["dim_idx"].to_numpy().astype(np.int64)
        n = t["n"].to_numpy().astype(np.int64)
        sq = t["sqerr_fp"].to_numpy().astype(np.int64)
        mx = t["maxerr_fp"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "dim_idx": pa.array(di, type=pa.int64()),
                "min_v": pa.array(np.round(lo[di], 9), type=pa.float64()),
                "max_v": pa.array(np.round(hi[di], 9), type=pa.float64()),
                "scale": pa.array(np.round(scale[di], 9), type=pa.float64()),
                "mse": pa.array(np.round(sq / (SQ8_FP * n.astype(np.float64)), 9), type=pa.float64()),
                "max_abs_err": pa.array(np.round(mx / SQ8_FP, 9), type=pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort("dim_idx")


IVFPQ_RERANK = 50  # ADC candidates kept for the exact re-rank


def ivfpq_topk(
    sf_dir: str,
    k: int = 10,
    vec_id: int = 1,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 8,
    seed: int = 5,
    rerank: int = IVFPQ_RERANK,
) -> rd.Dataset:
    """IVF-PQ composite ANN — the architecture every production vector
    store runs: IVF coarse quantizer prunes to ``nprobe`` cells, PQ
    asymmetric-distance (ADC) lookup tables score the survivors from
    16-bit codes without touching floats, and only the ``rerank`` best
    ADC candidates get an exact cosine pass.  (Deviation from classic
    IVF-PQ: codes quantize the raw vectors, not per-cell residuals —
    documented, keeps codebooks shared across cells.)

    Scale shape: centroids + codebooks train on a driver-side sample
    (the ivf_topk discipline) and broadcast with the (m, ksub) ADC
    table; the probe+ADC pass is map-only and keeps ≤ rerank rows per
    batch (embedding attached), so the only exchange is the tiny
    candidate sort; the exact re-rank touches ≤ rerank vectors total.
    Determinism: ADC distances are pure float64 formulas fixed-pointed
    at 1e9 for the candidate cut, ties broken by vec_id everywhere.
    Output: (sim_rank, vec_id) like ann_topk.
    """
    import pyarrow.parquet as _pq

    t = _pq.read_table(_emb_path(sf_dir), columns=["embedding"])
    sample = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    cents = kmeans_centroids(sample, n_centroids, iters=iters, seed=seed)
    books = pq_codebooks(sample, m=m, ksub=ksub, iters=iters, seed=seed)
    q = query_vector(sf_dir, vec_id)
    qd = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = np.sort(np.argsort(qd, kind="stable")[:nprobe]).astype(np.int64)
    ds_sub = q.shape[0] // m
    lut = np.stack(
        [((q[j * ds_sub : (j + 1) * ds_sub][None, :] - books[j]) ** 2).sum(axis=1) for j in range(m)]
    )  # (m, ksub)
    bref = ray.put((cents, books, lut, probe, q / np.linalg.norm(q)))

    class ProbeADC:
        def __init__(self):
            self.c, self.books, self.lut, self.probe, self.qn = ray.get(bref)
            self.cn2 = (self.c * self.c).sum(axis=1)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _emb_matrix(batch)
            ids = batch["vec_id"].to_numpy().astype(np.int64)
            d = self.cn2[None, :] - 2.0 * (mat @ self.c.T)
            mask = np.isin(d.argmin(axis=1), self.probe) & (ids != vec_id)
            ids, mat = ids[mask], mat[mask]
            if mat.shape[0] == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], type=pa.int64()),
                        "adc_fp": pa.array([], type=pa.int64()),
                        "embedding": pa.array([], type=pa.list_(pa.float64())),
                    }
                )
            codes, _ = _pq_encode_matrix(mat, self.books)
            adc = np.zeros(mat.shape[0], dtype=np.float64)
            for j in range(len(self.books)):
                adc += self.lut[j][codes[:, j]]
            adc_fp = np.floor(adc * 1e9 + 0.5).astype(np.int64)
            # per-batch candidate cut: keep the rerank best (adc, vec_id)
            order = np.lexsort((ids, adc_fp))[:rerank]
            return pa.table(
                {
                    "vec_id": pa.array(ids[order], type=pa.int64()),
                    "adc_fp": pa.array(adc_fp[order], type=pa.int64()),
                    "embedding": pa.array(list(mat[order]), type=pa.list_(pa.float64())),
                }
            )

    cands = (
        _read_emb(sf_dir)
        .map_batches(ProbeADC, batch_format="pyarrow", concurrency=(1, 4))
        .sort(["adc_fp", "vec_id"])
        .limit(rerank)
    )

    def exact(batch: pa.Table) -> pa.Table:
        mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        qn = q / np.linalg.norm(q)
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ qn) / np.where(norms == 0, 1.0, norms)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "sim": pa.array(sims, type=pa.float64()),
            }
        )

    scored = cands.map_batches(exact, batch_format="pyarrow")
    return ranked_head(scored, ["sim", "vec_id"], "sim_rank", k)


KNN_GRAPH_K = 5


def knn_graph_reciprocity(sf_dir: str, k: int = KNN_GRAPH_K) -> rd.Dataset:
    """k-NN-graph reciprocity per label: build the exact cosine k-NN
    digraph over the embedding table and report, per class label, the
    fraction of edges whose reverse edge also exists — the standard
    hubness/asymmetry diagnostic run before trusting a kNN graph for
    graph-based semi-supervised labeling or diffusion dedup (low
    reciprocity = hub-dominated space).

    Determinism: neighbor ranking uses UNROUNDED sims with vec_id
    tie-break (the embedding_top_pairs contract — identical planted
    duplicates tie-break identically in both engines).

    Scale shape: per-batch GEMM against the BROADCAST matrix (tiny
    here; at 10⁹ vectors swap the candidate generation to the
    hyperplane-LSH band shuffle of embedding_near_dup_lsh and keep
    this exact ranking per candidate set — same output contract on
    the candidates).  The edge table is n×k-bounded; the reciprocity
    fold is one self-join on it.  Output: (label, n_nodes, n_edges,
    n_reciprocal, reciprocity).
    """
    import pyarrow.parquet as _pq

    from ..stages.common import duckdb_round

    full = _pq.read_table(_emb_path(sf_dir), columns=["vec_id", "embedding", "label"])
    ids_all = full["vec_id"].to_numpy().astype(np.int64)
    labels_all = full["label"].to_numpy().astype(np.int64)
    mat = _emb_matrix(full)
    norms = np.linalg.norm(mat, axis=1)
    mat_ref = ray.put((ids_all, mat / np.where(norms == 0, 1.0, norms)[:, None]))

    ds = _read_emb(sf_dir)

    class TopK:
        def __init__(self):
            self.ids, self.m = ray.get(mat_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            q = _emb_matrix(batch)
            qn = np.linalg.norm(q, axis=1)
            q = q / np.where(qn == 0, 1.0, qn)[:, None]
            sims = q @ self.m.T
            src = batch["vec_id"].to_numpy().astype(np.int64)
            srcs, dsts = [], []
            for i in range(len(src)):
                s = sims[i]
                # exclude self, rank by (-sim, vec_id)
                order = np.lexsort((self.ids, -s))
                order = order[self.ids[order] != src[i]][:k]
                srcs.append(np.full(len(order), src[i], dtype=np.int64))
                dsts.append(self.ids[order])
            return pa.table(
                {
                    "src": pa.array(np.concatenate(srcs), type=pa.int64()),
                    "dst": pa.array(np.concatenate(dsts), type=pa.int64()),
                }
            )

    edges = ds.map_batches(TopK, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)).to_pandas()
    eset = set(zip(edges["src"], edges["dst"]))
    lab = dict(zip(ids_all.tolist(), labels_all.tolist()))
    rows: dict[int, list[int]] = {}
    for s, d in eset:
        r = rows.setdefault(lab[s], [0, 0])
        r[0] += 1
        r[1] += 1 if (d, s) in eset else 0
    n_nodes = {}
    for s in edges["src"].unique():
        n_nodes[lab[int(s)]] = n_nodes.get(lab[int(s)], 0) + 1
    labs = sorted(rows)
    ne = np.array([rows[l][0] for l in labs], dtype=np.int64)
    nr = np.array([rows[l][1] for l in labs], dtype=np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "label": pa.array(labs, type=pa.int64()),
                "n_nodes": pa.array([n_nodes[l] for l in labs], type=pa.int64()),
                "n_edges": pa.array(ne, type=pa.int64()),
                "n_reciprocal": pa.array(nr, type=pa.int64()),
                "reciprocity": pa.array(
                    duckdb_round(nr.astype(np.float64) / ne.astype(np.float64), 6), type=pa.float64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# mmd_two_sample (exact-integer polynomial-kernel MMD between labels)
# ---------------------------------------------------------------------------

MMD_FP = 1000  # per-element fixed-point pitch for the kernel moments


def mmd_two_sample(sf_dir: str, fp: int = MMD_FP) -> rd.Dataset:
    """Maximum Mean Discrepancy (biased V-statistic) between every
    PAIR of embedding label groups under the degree-2 polynomial
    kernel k(x, y) = (x·y)² — the distribution-shift test a training
    pipeline runs to ask "are these two slices drawn from the same
    embedding distribution?" (Gretton et al. 2012), done EXACTLY:

        Σ_{x∈A, y∈B} (x·y)²  =  ⟨M_A, M_B⟩,   M_G = Σ_{x∈G} x xᵀ

    so the all-pairs kernel sums collapse to second-moment matrices —
    fixed-point int64 entries (pinned once per vector, order-free) —
    and the quadratic pair work NEVER happens: the exchange is one
    d×d integer matrix per label.  The final contraction runs in
    arbitrary-precision Python ints (it can exceed int64 by design),
    and MMD² = Sxx/n_a² + Syy/n_b² − 2·Sxy/(n_a·n_b) over FP⁴ is one
    mirrored float expression.

    Scale shape: per-batch (label, M-partial) combiner → ONE
    label-keyed groupby of d² int64 columns; label-pair contraction is
    |labels|²-bounded driver work.  Output: (label_a, label_b, n_a,
    n_b, mmd2) rounded 6 for label_a < label_b.
    """
    from ..stages.common import duckdb_round as _dr

    ds = rd.read_parquet(_emb_path(sf_dir), columns=["embedding", "label"])

    def moments(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        q = np.floor(m * fp + 0.5).astype(np.int64)  # (n, d)
        labels = t["label"].to_numpy()
        out_rows = {"label": [], "n": []}
        mats = []
        for lab in np.unique(labels):
            sub = q[labels == lab]
            mats.append((sub.T @ sub).ravel())  # d*d int64 partial
            out_rows["label"].append(int(lab))
            out_rows["n"].append(sub.shape[0])
        d2 = mats[0].shape[0] if mats else 0
        tbl = {
            "label": pa.array(out_rows["label"], type=pa.int64()),
            "n": pa.array(out_rows["n"], type=pa.int64()),
        }
        mat_arr = np.stack(mats) if mats else np.zeros((0, d2), dtype=np.int64)
        tbl["m_flat"] = pa.array(list(mat_arr), type=pa.list_(pa.int64(), d2 if d2 else 1))
        return pa.table(tbl)

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        mats = np.stack([np.asarray(x, dtype=np.int64) for x in g["m_flat"]])
        return pd.DataFrame(
            {
                "label": [int(g["label"].iloc[0])],
                "n": [int(g["n"].sum())],
                "m_flat": [mats.sum(axis=0)],
            }
        )

    per_label = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("label")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )  # |labels| rows — bounded
    labs = per_label["label"].to_numpy().astype(np.int64)
    ns = per_label["n"].to_numpy().astype(np.int64)
    mats = [np.asarray(x, dtype=np.int64).astype(object) for x in per_label["m_flat"]]

    def contract(a: np.ndarray, b: np.ndarray) -> int:
        return int((a * b).sum())  # object ints: exact beyond int64

    order = np.argsort(labs)
    rows = []
    fp4 = float(fp) ** 4
    for ii in range(len(order)):
        for jj in range(ii + 1, len(order)):
            i, j = order[ii], order[jj]
            sxx = contract(mats[i], mats[i])
            syy = contract(mats[j], mats[j])
            sxy = contract(mats[i], mats[j])
            na, nb = float(ns[i]), float(ns[j])
            mmd2 = (sxx / fp4) / (na * na) + (syy / fp4) / (nb * nb) - 2.0 * (sxy / fp4) / (na * nb)
            rows.append((int(labs[i]), int(labs[j]), int(ns[i]), int(ns[j]), mmd2))
    vals = _dr(np.array([r[4] for r in rows], dtype=np.float64), 6)
    return rd.from_arrow(
        pa.table(
            {
                "label_a": pa.array([r[0] for r in rows], type=pa.int64()),
                "label_b": pa.array([r[1] for r in rows], type=pa.int64()),
                "n_a": pa.array([r[2] for r in rows], type=pa.int64()),
                "n_b": pa.array([r[3] for r in rows], type=pa.int64()),
                "mmd2": pa.array(vals, type=pa.float64()),
            }
        )
    )


def knn_calibration(sf_dir: str, k: int = 5) -> rd.Dataset:
    """Reliability table of the leave-one-out k-NN classifier: samples
    bucketed by the winning label's VOTE COUNT (the classifier's
    confidence, an exact integer 1..k) with empirical accuracy per
    bucket — the calibration audit (is 4/5 votes really ~80% right?)
    behind every "use model confidence to filter training data"
    decision; per-bucket |confidence − accuracy| is the ECE integrand
    (Guo et al. 2017).

    Determinism: neighbor sets use knn_classify's contract (cosines
    rounded 6dp BEFORE ranking, vec_id tiebreak); votes/correct are
    integers; confidence/accuracy/gap are mirrored float expressions.

    Scale shape: broadcast corpus + one GEMM per batch (knn_classify's
    stage shape); the reliability reduce is ONE ≤k-row groupby.
    Output: (n_votes, n_samples, n_correct, confidence, accuracy,
    abs_gap) rounded 6, sorted by n_votes.
    """
    import pyarrow.parquet as _pq

    from ray.data.aggregate import Sum as _Sum

    from ..stages.common import duckdb_round as _dr

    t = _pq.read_table(_emb_path(sf_dir), columns=["vec_id", "embedding", "label"])
    ids_all = np.asarray(t["vec_id"].to_numpy(), dtype=np.int64)
    m_all = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    mn_all = m_all / np.linalg.norm(m_all, axis=1)[:, None]
    lab_all = np.asarray(t["label"].to_numpy(), dtype=np.int64)
    order = np.argsort(ids_all, kind="stable")
    bref = ray.put((ids_all[order], mn_all[order], lab_all[order]))

    def score(batch: pa.Table) -> pa.Table:
        cids, cmat, clab = ray.get(bref)
        m = _emb_matrix(batch)
        mn = m / np.linalg.norm(m, axis=1)[:, None]
        ids = np.asarray(batch["vec_id"].to_numpy(), dtype=np.int64)
        lab = np.asarray(batch["label"].to_numpy(), dtype=np.int64)
        sims = _dr(mn @ cmat.T, 6)
        votes_out = np.empty(len(ids), dtype=np.int64)
        correct = np.empty(len(ids), dtype=np.int64)
        for i in range(len(ids)):
            s = sims[i].copy()
            s[cids == ids[i]] = -np.inf
            top = np.lexsort((cids, -s))[:k]
            votes = clab[top]
            uniq, cnt = np.unique(votes, return_counts=True)
            best = np.lexsort((uniq, -cnt))[0]
            votes_out[i] = cnt[best]
            correct[i] = int(uniq[best] == lab[i])
        return pa.table(
            {
                "n_votes": pa.array(votes_out, type=pa.int64()),
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
                "correct": pa.array(correct, type=pa.int64()),
            }
        )

    ds = rd.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding", "label"])
    agg = (
        ds.map_batches(score, batch_format="pyarrow", concurrency=4)
        .groupby("n_votes")
        .aggregate(_Sum("one", alias_name="n_samples"), _Sum("correct", alias_name="n_correct"))
    )

    def finish(t: pa.Table) -> pa.Table:
        v = t["n_votes"].to_numpy().astype(np.float64)
        n = t["n_samples"].to_numpy().astype(np.float64)
        c = t["n_correct"].to_numpy().astype(np.float64)
        conf = v / float(k)
        acc = c / n
        return pa.table(
            {
                "n_votes": t["n_votes"].cast(pa.int64()),
                "n_samples": t["n_samples"].cast(pa.int64()),
                "n_correct": t["n_correct"].cast(pa.int64()),
                "confidence": pa.array(_dr(conf, 6), type=pa.float64()),
                "accuracy": pa.array(_dr(acc, 6), type=pa.float64()),
                "abs_gap": pa.array(_dr(np.abs(conf - acc), 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("n_votes")


TWONN_FP = 10**9  # fixed-point pitch for per-vector ln(mu) pins


def intrinsic_dimension(sf_dir: str) -> rd.Dataset:
    """TwoNN intrinsic-dimension estimate of the embedding manifold
    (Facco et al. 2017): with r1 ≤ r2 the two nearest-neighbor
    distances of each vector, μ = r2/r1 follows Pareto(id) on a
    locally-uniform manifold, so the MLE is id = n / Σ ln μ — the
    "how many degrees of freedom do these embeddings actually use"
    diagnostic run before choosing PCA/PQ/Matryoshka budgets.

    Determinism: squared distances use ONE shared expression
    (‖x‖² + ‖y‖² − 2x·y, rounded 6dp before ranking with vec_id
    tiebreak — the knn_classify contract); each vector's ln μ =
    (ln r2² − ln r1²)/2 pins ONCE to int64, so the global sum is
    order-free.  Exact-duplicate pairs (r1² = 0) are excluded and
    counted (their μ is undefined), mirrored.

    Scale shape: broadcast corpus + one GEMM per batch (the ANN stage
    shape); one single-key integer fold.  Output: one row (n_vectors,
    n_used, n_zero_r1, sum_lnmu_fp, intrinsic_dim) rounded 6.
    """
    import pyarrow.parquet as _pq

    from ray.data.aggregate import Sum as _Sum

    from ..stages.common import duckdb_round as _dr

    t = _pq.read_table(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    ids_all = np.asarray(t["vec_id"].to_numpy(), dtype=np.int64)
    m_all = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    order = np.argsort(ids_all, kind="stable")
    bref = ray.put((ids_all[order], m_all[order]))

    def score(batch: pa.Table) -> pa.Table:
        cids, cmat = ray.get(bref)
        cn2 = (cmat * cmat).sum(axis=1)
        m = _emb_matrix(batch)
        ids = np.asarray(batch["vec_id"].to_numpy(), dtype=np.int64)
        n2 = (m * m).sum(axis=1)
        d2 = _dr(n2[:, None] + cn2[None, :] - 2.0 * (m @ cmat.T), 6)
        used = np.zeros(1, dtype=np.int64)
        zero = np.zeros(1, dtype=np.int64)
        s_fp = np.zeros(1, dtype=np.int64)
        for i in range(len(ids)):
            d = d2[i].copy()
            d[cids == ids[i]] = np.inf
            top = np.lexsort((cids, d))[:2]
            r1sq, r2sq = float(d[top[0]]), float(d[top[1]])
            if r1sq <= 0.0:
                zero[0] += 1
                continue
            lnmu = (np.log(r2sq) - np.log(r1sq)) / 2.0
            s_fp[0] += int(np.floor(lnmu * TWONN_FP + 0.5))
            used[0] += 1
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "n_vectors": pa.array([len(ids)], type=pa.int64()),
                "n_used": pa.array(used),
                "n_zero_r1": pa.array(zero),
                "sum_lnmu_fp": pa.array(s_fp),
            }
        )

    ds = rd.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    agg = (
        ds.map_batches(score, batch_format="pyarrow", concurrency=4)
        .groupby("k")
        .aggregate(
            _Sum("n_vectors", alias_name="n_vectors"),
            _Sum("n_used", alias_name="n_used"),
            _Sum("n_zero_r1", alias_name="n_zero_r1"),
            _Sum("sum_lnmu_fp", alias_name="sum_lnmu_fp"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        nu = t["n_used"].to_numpy().astype(np.float64)
        s = t["sum_lnmu_fp"].to_numpy().astype(np.float64) / float(TWONN_FP)
        dim = _dr(nu / np.maximum(s, 1e-12), 6)
        return pa.table(
            {
                "n_vectors": t["n_vectors"].cast(pa.int64()),
                "n_used": t["n_used"].cast(pa.int64()),
                "n_zero_r1": t["n_zero_r1"].cast(pa.int64()),
                "sum_lnmu_fp": t["sum_lnmu_fp"].cast(pa.int64()),
                "intrinsic_dim": pa.array(dim, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


KCENTER_K = 32


def kcenter_coreset(sf_dir: str, k: int = KCENTER_K) -> rd.Dataset:
    """Greedy k-center coreset (Gonzalez 1985): iteratively pick the
    vector FARTHEST from the chosen set — the classic 2-approximation
    diversity selection a data-curation pipeline uses to seed labeling
    / active learning / dedup canopies; covering_radius(r) certifies
    "every vector is within R of one of the first r picks".

    Determinism: Euclidean d² via the shared norm-expansion expression
    rounded 6dp before comparisons; argmax ties break to the SMALLEST
    vec_id; the seed is the smallest vec_id.  The golden oracle runs
    the same definition with an independent distance bookkeeping
    (full matrix vs the engine's incremental min).

    Scale shape: the corpus matrix broadcasts once (the knn_classify
    stage contract); each of the k rounds is one vectorized min-update
    (at broadcast-breaking scale each round is ONE map_batches argmax
    sweep — same contract, documented).  Output: (rank, vec_id,
    covering_radius) rounded 6.
    """
    import pyarrow.parquet as _pq

    from ..stages.common import duckdb_round as _dr

    t = _pq.read_table(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_numpy(), dtype=np.int64)
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    order = np.argsort(ids, kind="stable")
    ids, m = ids[order], m[order]
    n2 = (m * m).sum(axis=1)

    def d2_to(center_idx: int) -> np.ndarray:
        c = m[center_idx]
        return _dr(n2 + float((c * c).sum()) - 2.0 * (m @ c), 6)

    chosen = [0]  # smallest vec_id seeds
    mind = d2_to(0)
    ranks, radii = [1], []
    for r in range(1, k):
        # covering radius BEFORE the next pick = current max min-dist
        far = np.lexsort((ids, -mind))[0]
        radii.append(float(np.sqrt(max(mind[far], 0.0))))
        chosen.append(int(far))
        ranks.append(r + 1)
        mind = np.minimum(mind, d2_to(int(far)))
    radii.append(float(np.sqrt(max(mind[np.lexsort((ids, -mind))[0]], 0.0))))
    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array(ranks, type=pa.int64()),
                "vec_id": pa.array(ids[chosen], type=pa.int64()),
                "covering_radius": pa.array(
                    _dr(np.array(radii), 6), type=pa.float64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# jl_projection_audit (Johnson-Lindenstrauss distortion measurement)
# ---------------------------------------------------------------------------

JL_K = 8  # projected dims
JL_FP = 1 << 20  # vector quantization pitch
JL_STRIDE = 1  # pair = (vec_id, vec_id + STRIDE)
JL_MOD = 3  # sampled anchors: vec_id % MOD == 0


def _jl_sign(k: np.ndarray, i: np.ndarray) -> np.ndarray:
    """Deterministic Rademacher sign s(k, i) ∈ {+1, −1} from a 64-bit
    mix hash — no RNG state, reshard-proof, identical on any worker."""
    h = (
        k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        + i.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
    )
    h ^= h >> np.uint64(31)
    h *= np.uint64(0x94D049BB133111EB)
    return np.where((h >> np.uint64(63)) == 0, 1, -1).astype(np.int64)


def jl_projection_audit(sf_dir: str) -> rd.Dataset:
    """Johnson-Lindenstrauss distortion audit: project every sampled
    vector to JL_K dims with a DETERMINISTIC ±1 (Rademacher) matrix
    (Achlioptas 2003 — database-friendly random projections) and
    measure, on sampled pairs, how well scaled projected squared
    distances preserve the originals: ratio = d²_proj / (K · d²_orig),
    E[ratio] = 1.  The measured-accuracy row for every sketch that
    rides a random projection (the ann_recall_eval / minhash_accuracy
    discipline applied to JL).

    Exactness: vectors quantize to int64 at 2^20; projections are
    exact integer sign-sums; both squared distances are exact int64;
    ratio is ONE mirrored float division rounded 6 — no float enters
    before the final expression (a float GEMM would drift ulps across
    engines; integer sums cannot).

    Scale shape: quantize + project is map-ONLY (K ints per row leave
    the actor pool); pairs form by ONE hash join on the anchor key
    (vec_id vs vec_id − STRIDE over the MOD-sampled anchors) — no
    all-pairs blowup, sample size is corpus-proportional but the join
    is key-partitioned.

    Output: (vec_a, vec_b, d2_orig, d2_proj, ratio) per sampled pair.
    """
    ds = _read_emb(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        X = _emb_matrix(t)
        q = np.floor(X * JL_FP + 0.5).astype(np.int64)
        d = q.shape[1]
        S = _jl_sign(
            np.repeat(np.arange(JL_K, dtype=np.int64), d).reshape(JL_K, d),
            np.tile(np.arange(d, dtype=np.int64), JL_K).reshape(JL_K, d),
        )
        y = q @ S.T  # exact int64: |q| <= 2^21, d = 32 -> |y| <= 2^26
        out = {"vec_id": t["vec_id"]}
        for k in range(JL_K):
            out[f"y{k}"] = pa.array(y[:, k], type=pa.int64())
        # original self-moment needed for the pair distance: ship the
        # quantized vector too, PACKED as binary (Ray's hash join
        # rejects list payload columns; the pip_join_shuffle discipline)
        out["q"] = pa.array([row.tobytes() for row in q], type=pa.binary())
        return pa.table(out)

    proj = ds.map_batches(project, batch_format="pyarrow")

    def anchor_only(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["vec_id"].to_numpy() % JL_MOD == 0))

    left = proj.map_batches(anchor_only, batch_format="pyarrow")

    def shift_key(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "akey", pa.array(t["vec_id"].to_numpy() - JL_STRIDE, type=pa.int64())
        )
        return t.filter(pa.array(t["akey"].to_numpy() % JL_MOD == 0))

    right = proj.map_batches(shift_key, batch_format="pyarrow")
    right = right.rename_columns(
        {c: (c if c in ("akey",) else c + "_b") for c in right.columns()}
    )
    j = safe_join(left, right, join_type="inner", num_partitions=4, on=("vec_id",), right_on=("akey",))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_a": pa.array([], type=pa.int64()),
                    "vec_b": pa.array([], type=pa.int64()),
                    "d2_orig": pa.array([], type=pa.int64()),
                    "d2_proj": pa.array([], type=pa.int64()),
                    "ratio": pa.array([], type=pa.float64()),
                }
            )
        qa = np.stack([np.frombuffer(v, dtype=np.int64) for v in t["q"].to_pylist()])
        qb = np.stack([np.frombuffer(v, dtype=np.int64) for v in t["q_b"].to_pylist()])
        d2o = ((qa - qb) ** 2).sum(axis=1)
        ya = np.stack([t[f"y{k}"].to_numpy() for k in range(JL_K)], axis=1)
        yb = np.stack([t[f"y{k}_b"].to_numpy() for k in range(JL_K)], axis=1)
        d2p = ((ya - yb) ** 2).sum(axis=1)
        ratio = duckdb_round(
            d2p.astype(np.float64) / (float(JL_K) * np.maximum(d2o, 1).astype(np.float64)), 6
        )
        return pa.table(
            {
                "vec_a": t["vec_id"].cast(pa.int64()),
                "vec_b": t["vec_id_b"].cast(pa.int64()),
                "d2_orig": pa.array(d2o, type=pa.int64()),
                "d2_proj": pa.array(d2p, type=pa.int64()),
                "ratio": pa.array(ratio, type=pa.float64()),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# mutual_nn_pairs (reciprocal nearest neighbors — the correspondence rule)
# ---------------------------------------------------------------------------


def mutual_nn_pairs(sf_dir: str) -> rd.Dataset:
    """Reciprocal-nearest-neighbor pairs over the embedding table:
    (a, b) such that b is a's cosine NN AND a is b's — the
    high-precision correspondence rule used for bitext mining
    (Artetxe & Schwenk 2019), cross-modal matching and conservative
    near-dup pairing: mutuality filters out hubs that are "everyone's
    neighbor" without being anyone's match.

    Scale shape: ONE map pass with the normalized matrix broadcast
    (ray.put; at 10^9 vectors swap the broadcast for the IVF/LSH
    bucket exchange of ann_* — the mutuality join is unchanged); each
    batch computes a GEMM row-argmax (sim desc, vec_id asc tie-break)
    -> an (id, nn) table; mutual pairs are ONE self hash-join on the
    reversed key + a < b filter.  Vectors never shuffle — only the
    (id, nn) pointer table does.

    Output: (vec_a, vec_b), the mutual pairs, rank-free (float sims
    stay out of the result — the embedding_top_pairs discipline).
    """
    import ray

    from ..stages.common import safe_join

    ds = _read_emb(sf_dir)
    full = ds.to_pandas()  # bounded: broadcast build of the dim-bounded embedding table (IVF/LSH bucket swap at 1e9 vectors, see docstring)
    order = np.argsort(full["vec_id"].to_numpy())
    ids = full["vec_id"].to_numpy()[order].astype(np.int64)
    m = np.stack(full["embedding"].to_numpy()[order]).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put({"ids": ids, "m": m})

    class NN:
        def __init__(self):
            d = ray.get(ref)
            self.ids, self.m = d["ids"], d["m"]

        def __call__(self, t: pa.Table) -> pa.Table:
            q = _emb_matrix(t)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            # fixed-point grid BEFORE the argmax: near-tie similarities
            # (abundant with planted near-duplicates) are BLAS-order
            # dependent in the last ulp; quantizing to 1e-12 on both
            # engines makes the (sim desc, vec_id asc) winner stable
            # (np.argmax takes the FIRST max; ids are sorted asc)
            sims = np.floor((q @ self.m.T) * 1e12 + 0.5)
            qid = t["vec_id"].to_numpy().astype(np.int64)
            self_col = np.searchsorted(self.ids, qid)
            sims[np.arange(len(qid)), self_col] = -np.inf
            nn = self.ids[np.argmax(sims, axis=1)]
            return pa.table(
                {
                    "vid": pa.array(qid, type=pa.int64()),
                    "nn": pa.array(nn, type=pa.int64()),
                }
            )

    ptr = ds.map_batches(NN, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)).materialize()
    rev = ptr.map_batches(
        lambda t: pa.table({"rnn": t["vid"], "rvid": t["nn"]}), batch_format="pyarrow"
    )
    mutual = safe_join(
        ptr, rev, join_type="inner", num_partitions=8, on=("vid", "nn"), right_on=("rvid", "rnn")
    ).filter(expr="vid < nn")
    return mutual.map_batches(
        lambda t: pa.table({"vec_a": t["vid"], "vec_b": t["nn"]}), batch_format="pyarrow"
    )
