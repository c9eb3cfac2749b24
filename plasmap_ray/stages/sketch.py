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


class SpaceSaving:
    """Mergeable Space-Saving heavy-hitters summary (Metwally et al.;
    merge shape from Agarwal et al., "Mergeable Summaries").

    Bounded state: at most ``capacity`` counters.  ``err[key]`` bounds
    the overcount of ``count[key]`` (true count ∈ [count-err, count]).
    While no eviction/truncation has occurred the summary is EXACT —
    the regime the oracle checks at fixture scale; at 10^12 tokens the
    capacity bounds memory and the error columns carry the guarantee.
    """

    def __init__(self, capacity: int = 1 << 15):
        self.capacity = capacity
        self.counts: dict[str, int] = {}
        self.errs: dict[str, int] = {}
        # upper bound on the true count of any key ABSENT from this
        # summary (mass lost to merge truncation); eviction bounds come
        # from the min counter, per the classic SS invariant
        self._floor = 0
        self._heap: list[tuple[int, str]] = []  # lazy (count, key) min-heap

    def absent_bound(self) -> int:
        """Upper bound on the true count of a key NOT in this summary:
        the min counter once the summary is saturated (any evicted key
        left with at most that), else the truncation floor."""
        if len(self.counts) >= self.capacity and self.counts:
            return max(self._floor, min(self.counts.values()))
        return self._floor

    def _evict_to_capacity(self) -> None:
        if len(self.counts) <= self.capacity:
            return
        # keep the top-capacity by (count desc, key asc); every dropped
        # counter raises the absent-key floor (dropped counts <= kept)
        order = sorted(self.counts, key=lambda t: (-self.counts[t], t))
        dropped = order[self.capacity :]
        floor = max(self.counts[t] for t in dropped)
        for t in dropped:
            del self.counts[t]
            del self.errs[t]
        self._floor = max(self._floor, floor)
        self._heap = []

    def _pop_victim(self) -> tuple[str, int]:
        """Current min counter via a lazy heap (stale entries skipped) —
        O(log c) amortized instead of an O(c) dict scan per eviction."""
        import heapq

        if not self._heap:
            self._heap = [(c, k) for k, c in self.counts.items()]
            heapq.heapify(self._heap)
        while True:
            c, k = heapq.heappop(self._heap)
            if self.counts.get(k) == c:
                del self.counts[k]
                del self.errs[k]
                return k, c

    def offer(self, key: str, n: int) -> None:
        import heapq

        if key in self.counts:
            self.counts[key] += n
            if self._heap:
                heapq.heappush(self._heap, (self.counts[key], key))
            return
        if len(self.counts) < self.capacity and self._floor == 0:
            self.counts[key] = n
            self.errs[key] = 0
            if self._heap:
                heapq.heappush(self._heap, (n, key))
            return
        if len(self.counts) < self.capacity:
            self.counts[key] = self._floor + n
            self.errs[key] = self._floor
            if self._heap:
                heapq.heappush(self._heap, (self.counts[key], key))
            return
        _victim, m = self._pop_victim()
        self.counts[key] = m + n
        self.errs[key] = m
        heapq.heappush(self._heap, (m + n, key))

    def update(self, keys, counts) -> "SpaceSaving":
        for key, n in zip(keys, counts):
            self.offer(key, int(n))
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        """Guarantee-preserving merge: a key present in only one summary
        may have accumulated up to the OTHER side's absent_bound there,
        so that bound is added to both its count (upper bound) and its
        err (uncertainty).  Keys absent from both can total up to
        bound_a + bound_b — the merged floor is additive."""
        bound_self = self.absent_bound()
        bound_other = other.absent_bound()
        out = SpaceSaving(self.capacity)
        out.counts = dict(self.counts)
        out.errs = dict(self.errs)
        if bound_other:
            for key in out.counts:
                out.counts[key] += bound_other
                out.errs[key] += bound_other
        for key, n in other.counts.items():
            if key in out.counts:
                # undo the conservative bound_other: the key WAS present
                out.counts[key] += n - bound_other
                out.errs[key] += other.errs[key] - bound_other
            else:
                out.counts[key] = n + bound_self
                out.errs[key] = other.errs[key] + bound_self
        out._floor = bound_self + bound_other
        out._evict_to_capacity()
        return out

    def top(self, k: int) -> list[tuple[str, int, int]]:
        order = sorted(self.counts, key=lambda t: (-self.counts[t], t))[:k]
        return [(t, self.counts[t], self.errs[t]) for t in order]


def heavy_hitters_approx(ds, column: str, k: int = 20, capacity: int = 1 << 15):
    """Top-k heavy hitters via Space-Saving summaries folded inside
    Ray's aggregation tree (one summary per block, merged on workers —
    the driver receives ONE capacity-bounded summary).  Returns
    [(key, count, err), ...] ranked by (count desc, key asc); err == 0
    everywhere means the answer is exact (no eviction happened)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import AggregateFn

    def accumulate(acc: SpaceSaving, block) -> SpaceSaving:
        vc = pc.value_counts(block[column])
        return acc.update(vc.field("values").to_pylist(), vc.field("counts").to_numpy())

    agg = AggregateFn(
        init=lambda _key: SpaceSaving(capacity),
        accumulate_block=accumulate,
        merge=lambda a, b: a.merge(b),
        finalize=lambda acc: acc.top(k),
        name="heavy_hitters",
    )
    return ds.aggregate(agg)["heavy_hitters"]


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


class HLLSketch:
    """Mergeable HyperLogLog register array over int64 keys (Flajolet
    et al. 2007, with the small-range LinearCounting correction).

    Same fold shape as :class:`KMVSketch`: one register array per
    block, arrays merge by ELEMENTWISE MAX (associative + commutative +
    idempotent — merge order can never change a register), the driver
    receives one 2^p-byte array.  Unlike KMV, the estimate is biased
    at every n, so the oracle is a golden recompute of the identical
    deterministic algorithm, not an exact COUNT(DISTINCT)."""

    def __init__(self, p: int = 12, regs: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8) if regs is None else regs

    def update(self, values: np.ndarray) -> "HLLSketch":
        h = _hash64(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rem = h & np.uint64((1 << (64 - self.p)) - 1)
        # rank = leading zeros of the (64-p)-bit remainder + 1
        bl = np.zeros(len(rem), dtype=np.uint8)  # bit length of rem
        tmp = rem.copy()
        while tmp.any():
            bl[tmp > 0] += np.uint8(1)
            tmp >>= np.uint64(1)
        rank = (64 - self.p) - bl + 1
        np.maximum.at(self.regs, idx, rank.astype(np.uint8))
        return self

    def merge(self, other: "HLLSketch") -> "HLLSketch":
        return HLLSketch(self.p, np.maximum(self.regs, other.regs))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / float(np.sum(np.power(2.0, -self.regs.astype(np.float64))))
        v = int(np.count_nonzero(self.regs == 0))
        if e <= 2.5 * m and v > 0:
            e = m * float(np.log(m / v))  # LinearCounting small-range
        return e


def distinct_count_hll(ds, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column) via HLL registers folded in
    Ray's aggregation tree — the constant-memory (2^p bytes) sibling of
    :func:`distinct_count_approx`; relative error ~ 1.04/sqrt(2^p)."""
    from ray.data.aggregate import AggregateFn

    agg = AggregateFn(
        init=lambda _key: HLLSketch(p),
        accumulate_block=lambda acc, block: acc.update(block[column].to_numpy()),
        merge=lambda a, b: a.merge(b),
        finalize=lambda acc: acc.estimate(),
        name="hll_distinct",
    )
    return float(ds.aggregate(agg)["hll_distinct"])


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable frequency estimator)
# ---------------------------------------------------------------------------

CMS_M31 = 2_147_483_647  # 2^31-1, the modulus the fixture LCGs already use
CMS_A = (16807, 48271, 69621, 40692)  # classic minstd multipliers, one per row
CMS_B = (12345, 50505, 11213, 28411)
CMS_D = len(CMS_A)
CMS_W = 1024


def cms_cols(keys: np.ndarray, row: int, w: int = CMS_W) -> np.ndarray:
    """Row ``row``'s bucket for each int64 key: ((a·k + b) mod M31) mod w.

    int64-safe for keys < 2^63 / max(a) ≈ 1.3e14 — comfortably above any
    fixture id space; assert guards the bound so overflow fails loudly.
    """
    k = np.asarray(keys, dtype=np.int64)
    assert k.size == 0 or (k.min() >= 0 and k.max() < (1 << 63) // max(CMS_A)), "cms key out of int64-safe range"
    return ((CMS_A[row] * k + CMS_B[row]) % CMS_M31) % w


class CountMinSketch:
    """d×w Count-Min: update adds 1 per key per row; merge is elementwise
    add (associative + commutative -> safe in the aggregate tree); the
    point estimate min_r counts[r, h_r(k)] NEVER underestimates."""

    def __init__(self, d: int = CMS_D, w: int = CMS_W, counts: np.ndarray | None = None):
        self.d, self.w = d, w
        self.counts = np.zeros((d, w), dtype=np.int64) if counts is None else counts

    def update(self, keys: np.ndarray) -> "CountMinSketch":
        for r in range(self.d):
            np.add.at(self.counts[r], cms_cols(keys, r, self.w), 1)
        return self

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        return CountMinSketch(self.d, self.w, self.counts + other.counts)

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        est = np.full(len(np.asarray(keys)), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(self.d):
            est = np.minimum(est, self.counts[r][cms_cols(keys, r, self.w)])
        return est
