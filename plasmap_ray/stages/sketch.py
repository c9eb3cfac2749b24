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
    """Approximate COUNT(DISTINCT column) via KMV sketches folded inside
    Ray's aggregation tree (``Dataset.aggregate`` with a custom
    ``AggregateFn``): sketches accumulate per block and MERGE on the
    workers — the driver receives ONE k-value sketch, never the
    per-batch sketch stream (the round-1 ``take_all()`` fold collected
    a row per batch, unbounded in batch count at 10^12 rows)."""
    from ray.data.aggregate import AggregateFn

    agg = AggregateFn(
        init=lambda _key: KMVSketch(k),
        accumulate_block=lambda acc, block: acc.update(block[column].to_numpy()),
        merge=lambda a, b: a.merge(b),
        finalize=lambda acc: acc.estimate(),
        name="kmv_distinct",
    )
    out = ds.aggregate(agg)
    return float(out["kmv_distinct"])
