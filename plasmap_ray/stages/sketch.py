"""Mergeable KMV distinct-count sketch (A4).

The reference experiments with hash-based n-distinct estimation in
query-engine/src/test/scala/io/plasmap/query/engine/groupby-test.sc:1-19
(keep the k minimum hashes, estimate N ~ (k-1) / max_kth) and ships
bloom-based approximate dedup.  This is the mergeable-sketch version of
that idea, built for the map_batches -> merge aggregation pattern
(ray_guide 'Aggregation at scale'): one sketch per batch, sketches
merge associatively, the final estimate reads one small row.
"""

from __future__ import annotations

import numpy as np

_M61 = np.uint64((1 << 61) - 1)


def _hash64(values: np.ndarray) -> np.ndarray:
    """splitmix64 of int64 values -> uniform uint64."""
    x = np.asarray(values).astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


class KMVSketch:
    """k-minimum-values sketch over int64 keys."""

    def __init__(self, k: int = 1024, mins: np.ndarray | None = None):
        self.k = k
        self.mins = np.array([], dtype=np.uint64) if mins is None else mins

    def update(self, values: np.ndarray) -> "KMVSketch":
        h = np.unique(_hash64(values))
        merged = np.unique(np.concatenate([self.mins, h]))
        self.mins = merged[: self.k]
        return self

    def merge(self, other: "KMVSketch") -> "KMVSketch":
        merged = np.unique(np.concatenate([self.mins, other.mins]))
        return KMVSketch(self.k, merged[: self.k])

    def estimate(self) -> float:
        n = len(self.mins)
        if n < self.k:
            return float(n)  # exact below saturation
        kth = float(self.mins[self.k - 1])
        return (self.k - 1) / (kth / float(1 << 64))

    def serialize(self) -> bytes:
        return self.mins.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, k: int = 1024) -> "KMVSketch":
        return cls(k, np.frombuffer(data, dtype=np.uint64).copy())


def distinct_count_approx(ds, column: str, k: int = 1024) -> float:
    """Approximate COUNT(DISTINCT column) via per-batch KMV sketches
    merged on the driver (sketch rows are tiny: <= 8k bytes each)."""
    import pyarrow as pa

    def sketch_batch(t: pa.Table) -> pa.Table:
        s = KMVSketch(k).update(t[column].to_numpy())
        return pa.table({"sketch": pa.array([s.serialize()], type=pa.binary())})

    parts = ds.map_batches(sketch_batch, batch_format="pyarrow").take_all()
    acc = KMVSketch(k)
    for row in parts:
        acc = acc.merge(KMVSketch.deserialize(row["sketch"], k))
    return acc.estimate()
