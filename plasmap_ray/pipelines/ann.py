"""Similarity search over the ``embeddings`` table.

Baseline: brute-force cosine top-k per batch against a broadcast query
matrix (numpy matmul — the scale-correct pattern: the query side is
small and shipped once via ``ray.put``; the embedding side streams).
Scale path: LSH-bucketed candidate pruning (random-hyperplane signs)
so only same-bucket vectors are compared.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Min


def _read_emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def query_vector(sf_dir: str, vec_id: int = 1) -> np.ndarray:
    """Deterministic query = the embedding of ``vec_id`` (also available
    to the SQL oracle via a scalar subquery)."""
    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") == vec_id
    )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


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
    top = scored.sort(["sim", "vec_id"], descending=[True, False]).limit(k)

    def add_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True]).reset_index(drop=True)
        df["sim_rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["sim_rank", "vec_id"]]

    # k rows: a driver-side pandas finish is fine (small result)
    return top.map_batches(add_rank, batch_format="pandas", batch_size=k * 2)


def embedding_top_pairs(sf_dir: str, k: int = 20) -> rd.Dataset:
    """Top-k most-similar embedding pairs (rank-based — robust across
    engines, unlike a raw similarity threshold whose float32/float64
    boundary behavior differs).  Output: (pair_rank, vec_a, vec_b)."""
    pairs = embedding_near_dup(sf_dir, threshold=-1.1)  # all pairs, scored

    def local_topk(t: pa.Table) -> pa.Table:
        # per-batch prune: global top-k is a subset of per-batch top-k
        if t.num_rows <= k:
            return t
        idx = t.sort_by([("sim", "descending"), ("vec_a", "ascending"), ("vec_b", "ascending")])
        return idx.slice(0, k)

    top = pairs.map_batches(local_topk, batch_format="pyarrow").sort(
        ["sim", "vec_a", "vec_b"], descending=[True, False, False]
    ).limit(k)

    def add_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_a", "vec_b"], ascending=[False, True, True]).reset_index(drop=True)
        df["pair_rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["pair_rank", "vec_a", "vec_b"]]

    return top.map_batches(add_rank, batch_format="pandas", batch_size=k * 2)


def embedding_near_dup(sf_dir: str, threshold: float = 0.95) -> rd.Dataset:
    """All pairs with cosine similarity >= threshold (embedding near-dup).

    The embedding table at oracle scale is small enough to broadcast
    whole (N x D matrix via ray.put); each streaming batch compares its
    rows against the broadcast side: an O(N*B) map-side join, pairs
    emitted once (a < b).  For larger N swap in `lsh_buckets`.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    all_m = _emb_matrix(t)
    all_ids = t["vec_id"].to_numpy()
    norms = np.linalg.norm(all_m, axis=1)
    all_mn = all_m / np.where(norms == 0, 1.0, norms)[:, None]
    ref = ray.put((all_ids, all_mn))

    class PairFinder:
        def __init__(self):
            self.ids, self.mn = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _emb_matrix(batch)
            bnorm = np.linalg.norm(m, axis=1)
            mn = m / np.where(bnorm == 0, 1.0, bnorm)[:, None]
            ids = batch["vec_id"].to_numpy()
            sims = mn @ self.mn.T
            bi, aj = np.nonzero(sims >= threshold)
            keep = ids[bi] < self.ids[aj]
            return pa.table(
                {
                    "vec_a": pa.array(ids[bi[keep]], type=pa.int64()),
                    "vec_b": pa.array(self.ids[aj[keep]], type=pa.int64()),
                    "sim": pa.array(np.round(sims[bi[keep], aj[keep]], 6), type=pa.float64()),
                }
            )

    return _read_emb(sf_dir).map_batches(PairFinder, batch_format="pyarrow", concurrency=(1, 4))


def lsh_bucket_topk(sf_dir: str, k: int = 10, vec_id: int = 1, planes: int = 6, seed: int = 11) -> rd.Dataset:
    """Scale-path ANN: random-hyperplane LSH bucket pruning.

    Vectors bucket by the sign pattern of ``planes`` random projections;
    only the query's bucket (plus Hamming-1 neighbor buckets) is scored.
    Approximate — recall measured against `ann_topk` in tests.
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
    return scored.sort(["sim", "vec_id"], descending=[True, False]).limit(k)
