"""Distributed EXACT quantiles — the scale-correct two-pass pattern.

Naive exact quantiles need a global sort (all-to-all over every row) or
a driver-side collect (doesn't scale).  The bin-refine pattern gets the
exact answer with two cheap passes:

  pass 1: per-batch histogram partials over ``bins`` fixed-width bins
          -> groupby sum: ONE small table (bins rows) leaves the data.
  locate: cumulative counts find, for each q, the bin holding the
          ceil(q*n)-th smallest value (DuckDB ``quantile_disc``'s
          index convention, verified empirically) and its in-bin rank.
  pass 2: re-scan filtering to ONLY the (few) target bins — expected
          n/bins rows per bin reach the driver, where the exact k-th
          smallest is picked.  At 10^12 rows with 2^14 bins the refine
          set is ~10^8 — recurse the same pattern per bin if that is
          still too large (one extra pass per 10^4 reduction).

Per-group quantiles (``event_value_quantiles``) use key-partitioned
``groupby().map_groups`` instead — the per-key row count bounds task
memory (the sessionize-shaped contract).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _read_events(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _disc_rank(q: float, n: int) -> int:
    """1-indexed rank of quantile_disc(q) over n values (DuckDB
    convention: ceil(q*n), floored at 1)."""
    return max(1, math.ceil(q * n))


def value_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99), bins: int = 512) -> rd.Dataset:
    """Exact global quantiles of events.value via histogram + refine.

    Output: (q, value) — bit-identical to DuckDB ``quantile_disc``
    (the result is an ELEMENT of the data, no interpolation artifacts).
    """
    ds = _read_events(sf_dir, ["value"])

    def drop_invalid(t: pa.Table) -> pa.Table:
        # mirror quantile_disc's NULL skip (NaN/null would poison the
        # min/max, the bin arithmetic, and the rank count)
        v = t["value"]
        mask = pa.compute.and_(pa.compute.is_valid(v), pa.compute.invert(pa.compute.is_nan(v)))
        return t.filter(mask)

    ds = ds.map_batches(drop_invalid, batch_format="pyarrow")
    stats = ds.aggregate(Count(), Min("value"), Max("value"))
    n, vmin, vmax = int(stats["count()"]), float(stats["min(value)"]), float(stats["max(value)"])
    if n == 0:
        return rd.from_arrow(
            pa.table({"q": pa.array([], type=pa.float64()), "value": pa.array([], type=pa.float64())})
        )
    width = (vmax - vmin) / bins or 1.0

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        b = np.clip(((v - vmin) / width).astype(np.int64), 0, bins - 1)
        counts = np.bincount(b, minlength=bins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {"bin": pa.array(nz.astype(np.int64)), "n_rows": pa.array(counts[nz].astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    hist = {
        int(r["bin"]): int(r["n_rows"])
        for r in ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n_rows", alias_name="n_rows"))
        .take_all()  # bounded: fixed histogram bins
    }
    cum = 0
    cum_before: dict[int, int] = {}
    for b in range(bins):
        cum_before[b] = cum
        cum += hist.get(b, 0)

    targets: dict[int, list[tuple[float, int]]] = {}  # bin -> [(q, in-bin rank)]
    for q in qs:
        k = _disc_rank(q, n)
        for b in range(bins):
            if cum_before[b] + hist.get(b, 0) >= k:
                targets.setdefault(b, []).append((q, k - cum_before[b]))
                break

    needed = sorted(targets)
    needed_arr = np.array(needed, dtype=np.int64)

    def refine(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        b = np.clip(((v - vmin) / width).astype(np.int64), 0, bins - 1)
        mask = np.isin(b, needed_arr)
        return pa.table(
            {"bin": pa.array(b[mask].astype(np.int64)), "value": pa.array(v[mask], type=pa.float64())}
        )

    small = ds.map_batches(refine, batch_format="pyarrow").to_pandas()  # bounded: single refined quantile bin
    out_q, out_v = [], []
    for b in needed:
        vals = np.sort(small[small["bin"] == b]["value"].to_numpy(), kind="stable")
        for q, rank in targets[b]:
            out_q.append(q)
            out_v.append(float(vals[rank - 1]))
    order = np.argsort(out_q, kind="stable")
    return rd.from_arrow(
        pa.table(
            {
                "q": pa.array(np.asarray(out_q, dtype=np.float64)[order]),
                "value": pa.array(np.asarray(out_v, dtype=np.float64)[order]),
            }
        )
    )


def hist_quantile_eval(
    sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99), bins: int = 512
) -> rd.Dataset:
    """ONE-pass histogram-sketch quantile estimate with an EXACT error
    audit — the approximate companion of value_quantiles the same way
    count_min_eval audits heavy_hitters: the sketch answer (upper edge
    of the bin holding the ceil(q·n)-th value) is compared against the
    exact quantile_disc value AND against its realized rank, verifying
    the 1/bins rank-error guarantee a mergeable histogram sketch ships
    with (the answer a pipeline uses when it can't afford the refine
    pass).

    Scale shape: the sketch is the per-batch histogram combiner → ONE
    bins-bounded groupby (≤ 512 rows leave the data); the exact side
    reuses value_quantiles' bin-refine; the rank audit is one more
    pruned pass of per-batch ≤-counts folded in the aggregate tree.
    Driver state: ≤ bins + |qs| rows, never data.

    Determinism: bin = floor((v−vmin)/width) clipped (truncation ==
    floor for v ≥ vmin), est = vmin + (bin+1)·width — both mirrored
    literally in the SQL oracle.

    Output: (q, n_values, est_value, exact_value, value_err,
    rank_frac, rank_err), rounded 6.
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["value"])

    def drop_invalid(t: pa.Table) -> pa.Table:
        v = t["value"]
        mask = pa.compute.and_(pa.compute.is_valid(v), pa.compute.invert(pa.compute.is_nan(v)))
        return t.filter(mask)

    ds = ds.map_batches(drop_invalid, batch_format="pyarrow")
    st = ds.aggregate(Count(), Min("value"), Max("value"))
    n, vmin, vmax = int(st["count()"]), float(st["min(value)"]), float(st["max(value)"])
    width = (vmax - vmin) / bins or 1.0

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        b = np.clip(((v - vmin) / width).astype(np.int64), 0, bins - 1)
        counts = np.bincount(b, minlength=bins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {"bin": pa.array(nz.astype(np.int64)), "n_rows": pa.array(counts[nz].astype(np.int64))}
        )

    hist = {
        int(r["bin"]): int(r["n_rows"])
        for r in ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n_rows", alias_name="n_rows"))
        .take_all()
    }
    ests = []
    for q in qs:
        k = _disc_rank(q, n)
        cum = 0
        for b in range(bins):
            cum += hist.get(b, 0)
            if cum >= k:
                ests.append(vmin + float(b + 1) * width)
                break

    exact = {float(r["q"]): float(r["value"]) for r in value_quantiles(sf_dir, qs, bins).take_all()}

    est_arr = np.asarray(ests, dtype=np.float64)

    def rank_partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        cnt = np.array([int((v <= e).sum()) for e in est_arr], dtype=np.int64)
        return pa.table(
            {"qi": pa.array(np.arange(len(est_arr), dtype=np.int64)), "n_le": pa.array(cnt)}
        )

    ranks = {
        int(r["qi"]): int(r["n_le"])
        for r in ds.map_batches(rank_partial, batch_format="pyarrow")
        .groupby("qi")
        .aggregate(Sum("n_le", alias_name="n_le"))
        .take_all()
    }

    qa = np.asarray(qs, dtype=np.float64)
    exact_arr = np.asarray([exact[float(q)] for q in qs], dtype=np.float64)
    rank_frac = np.asarray([ranks[i] for i in range(len(qs))], dtype=np.float64) / float(n)
    return rd.from_arrow(
        pa.table(
            {
                "q": pa.array(qa, type=pa.float64()),
                "n_values": pa.array(np.full(len(qs), n, dtype=np.int64)),
                "est_value": pa.array(duckdb_round(est_arr, 6), type=pa.float64()),
                "exact_value": pa.array(duckdb_round(exact_arr, 6), type=pa.float64()),
                "value_err": pa.array(duckdb_round(est_arr - exact_arr, 6), type=pa.float64()),
                "rank_frac": pa.array(duckdb_round(rank_frac, 6), type=pa.float64()),
                "rank_err": pa.array(duckdb_round(rank_frac - qa, 6), type=pa.float64()),
            }
        )
    )


def event_value_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> rd.Dataset:
    """Per-event-type exact quantiles (key-partitioned map_groups; the
    per-key row count bounds task memory).  Output (event_type, q, value)."""
    ds = _read_events(sf_dir, ["event_type", "value"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(), kind="stable")
        n = len(v)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]] * len(qs),
                "q": np.asarray(qs, dtype=np.float64),
                "value": [float(v[_disc_rank(q, n) - 1]) for q in qs],
            }
        )

    return ds.groupby("event_type").map_groups(per_type, batch_format="pandas")


# ---------------------------------------------------------------------------
# winsorize_stats (outlier clipping against exact global quantiles)
# ---------------------------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.01, 0.99


def winsorize_stats(sf_dir: str, lo: float = WINSOR_LO, hi: float = WINSOR_HI) -> rd.Dataset:
    """Winsorized per-type value statistics: clamp every value to the
    corpus's exact [p_lo, p_hi] quantiles, then aggregate — the outlier-
    clipping normalization a training pipeline applies before loss
    weighting (heavy-tail defense with pinned, reproducible bounds).

    Two passes: the exact-quantile machinery (histogram + refine — no
    global sort) yields the two thresholds as ELEMENTS of the data
    (quantile_disc semantics, bit-identical to DuckDB); the clamp pass
    is map-only against the broadcast scalars.  Counts are exact;
    the clamped sum is rounded identically in both engines.

    Output per event_type: (event_type, n_events, n_lo, n_hi, sum_winsor).
    """
    import functools as _ft

    from ..stages.common import round_columns as _rc

    qdf = value_quantiles(sf_dir, qs=(lo, hi)).to_pandas().set_index("q")["value"]  # bounded: 2 quantile rows
    vlo, vhi = float(qdf[lo]), float(qdf[hi])

    ds = _read_events(sf_dir, ["event_type", "value"])

    def clamp(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        low = (v < vlo).astype(np.int64)
        high = (v > vhi).astype(np.int64)
        w = np.minimum(np.maximum(v, vlo), vhi)
        return pa.table(
            {
                "event_type": t["event_type"],
                "n_lo": pa.array(low, type=pa.int64()),
                "n_hi": pa.array(high, type=pa.int64()),
                "w": pa.array(w, type=pa.float64()),
            }
        )

    out = (
        ds.map_batches(clamp, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("n_lo", alias_name="n_lo"),
            Sum("n_hi", alias_name="n_hi"),
            Sum("w", alias_name="sum_winsor"),
        )
        .sort("event_type")
    )
    return out.map_batches(_ft.partial(_rc, cols=("sum_winsor",), ndigits=4), batch_format="pyarrow")


def corpus_summary(sf_dir: str) -> pa.Table:
    """One-row corpus catalog: row counts of every logical table plus
    total image payload bytes — the health-check dashboard a pipeline
    run opens with (and the cheapest possible scan: parquet metadata
    for counts, one projected column for the byte sum).
    Output: (n_images, image_bytes, n_docs, n_events, n_embeddings,
    n_orders, n_lineitems)."""
    import pyarrow.parquet as pq

    from .images import images_path_for

    def meta_rows(name: str) -> int:
        return pq.read_metadata(os.path.join(sf_dir, f"{name}.parquet")).num_rows

    img_path = images_path_for(sf_dir)
    n_images = pq.read_metadata(img_path).num_rows

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    nb = (
        rd.read_parquet(img_path, columns=["bytes"])
        .map_batches(
            lambda t: pa.table({"nb": pc.cast(pc.binary_length(t["bytes"]), pa.int64())}),
            batch_format="pyarrow",
        )
        .aggregate(_Sum("nb", alias_name="nb"))["nb"]
    )
    return pa.table(
        {
            "n_images": pa.array([n_images], type=pa.int64()),
            "image_bytes": pa.array([int(nb)], type=pa.int64()),
            "n_docs": pa.array([meta_rows("documents")], type=pa.int64()),
            "n_events": pa.array([meta_rows("events")], type=pa.int64()),
            "n_embeddings": pa.array([meta_rows("embeddings")], type=pa.int64()),
            "n_orders": pa.array([meta_rows("orders")], type=pa.int64()),
            "n_lineitems": pa.array([meta_rows("lineitem")], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Pearson correlation via exact integer moments / label-balance audit
# ---------------------------------------------------------------------------


def value_hour_correlation(sf_dir: str) -> rd.Dataset:
    """Per-event-type Pearson correlation between event value and
    hour-of-day — the 'is this feature time-confounded?' audit every
    training-data pipeline runs before using a column as a label.

    Exactness: both variables are integers (hour 0..23; value fixed-
    pointed to int64 cents), so the five moment sums (Σx, Σy, Σxy,
    Σx², Σy²) are exact int64 in any accumulation order; the final r is
    ONE float expression over the moments, mirrored verbatim in the SQL
    oracle (every int64→float64 cast here is < 2^53, hence exact).  At
    10^12 rows Σy² would need int128 — split cents into hi/lo 32-bit
    halves and carry two sums (same discipline, noted not needed at
    bench scale).

    Scale shape: per-batch moment partials (5 ints per type per batch)
    → one tiny groupby — nothing but the partials ever shuffles.
    Output: (event_type, n, pearson_r).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hr = (t["ts"].to_numpy().astype("datetime64[h]").astype(np.int64) % 24).astype(np.int64)
        cents = duckdb_round(t["value"].to_numpy() * 100.0, 0).astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        order = np.argsort(et, kind="stable")
        et, hr, cents = et[order], hr[order], cents[order]
        bounds = np.nonzero(et[1:] != et[:-1])[0] + 1
        starts = np.concatenate([[0], bounds])
        red = lambda v: np.add.reduceat(v, starts)  # noqa: E731
        ones = np.ones(len(et), dtype=np.int64)
        return pa.table(
            {
                "event_type": pa.array(et[starts], type=pa.string()),
                "n": pa.array(red(ones), type=pa.int64()),
                "sx": pa.array(red(hr), type=pa.int64()),
                "sy": pa.array(red(cents), type=pa.int64()),
                "sxy": pa.array(red(hr * cents), type=pa.int64()),
                "sxx": pa.array(red(hr * hr), type=pa.int64()),
                "syy": pa.array(red(cents * cents), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.float64)
        sx = t["sx"].to_numpy().astype(np.float64)
        sy = t["sy"].to_numpy().astype(np.float64)
        sxy = t["sxy"].to_numpy().astype(np.float64)
        sxx = t["sxx"].to_numpy().astype(np.float64)
        syy = t["syy"].to_numpy().astype(np.float64)
        r = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy))
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": t["n"],
                "pearson_r": pa.array(r, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("event_type")


def label_class_weights(sf_dir: str) -> rd.Dataset:
    """Class-balance audit over the embeddings table: per-label count
    and the inverse-frequency training weight total/(k·n) (sklearn's
    'balanced' convention) — the first thing a trainer computes from a
    labeled corpus.

    Scale shape: ONE label-keyed count groupby (labels are the bounded
    dimension); the weight is computed on the label-sized aggregate.
    The single float division is mirrored verbatim in the oracle.
    Output: (label, n, class_weight).
    """
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["label"])

    def widen(t: pa.Table) -> pa.Table:
        return pa.table({"label": pa.array(t["label"].to_numpy().astype(np.int64), type=pa.int64())})

    counts = ds.map_batches(widen, batch_format="pyarrow").groupby("label").aggregate(Count(alias_name="n"))
    pdf = counts.to_pandas()  # label-sized: k rows
    total = np.int64(pdf["n"].sum())
    kk = np.int64(len(pdf))
    pdf = pdf.sort_values("label").reset_index(drop=True)
    weight = np.float64(total) / (kk * pdf["n"].to_numpy()).astype(np.float64)
    return pa.table(
        {
            "label": pa.array(pdf["label"].to_numpy(), type=pa.int64()),
            "n": pa.array(pdf["n"].to_numpy(), type=pa.int64()),
            "class_weight": pa.array(weight, type=pa.float64()),
        }
    )


def user_burstiness(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Per-user inter-event-time statistics: mean gap and the
    Goh–Barabási burstiness B = (σ−μ)/(σ+μ) ∈ [−1, 1] — the point-
    process fingerprint separating periodic users (B→−1) from bursty
    ones (B→+1); the behavioral-bot screen beside speed_audit's
    spatial one.

    Exactness: gaps are exact integer SECONDS (µs difference // 10⁶ —
    floor division mirrored by DuckDB's // on epoch integers), so the
    per-user moments (n, Σg, Σg²) are order-free int64; μ, σ and B are
    mirrored float expressions over those integers.  Users with one
    event have no gap and emit no row (documented).

    Scale shape: the coarse-partition run-scan (user_id % parts)
    computes per-user moments in one pass; only (user, 3 ints) rows
    leave the scan.  Output: (user_id, n_gaps, mean_gap_s, burstiness).
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def add_part(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return t.append_column("part", pa.array(uid % parts, type=pa.int64()))

    def moments(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        n = len(uid)
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "n_gaps": pa.array([], type=pa.int64()),
                "mean_gap_s": pa.array([], type=pa.float64()),
                "burstiness": pa.array([], type=pa.float64()),
            }
        )
        if n == 0:
            return empty
        ts = g["ts"].to_numpy().astype(np.int64)
        gap = (ts[1:] - ts[:-1]) // 1_000_000  # integer seconds
        same = uid[1:] == uid[:-1]  # gap belongs to a user iff both ends do
        if not same.any():
            return empty
        u = uid[1:][same]
        gv = gap[same]
        starts = np.concatenate([[0], np.nonzero(np.diff(u))[0] + 1])
        cnt = np.diff(np.concatenate([starts, [len(u)]])).astype(np.int64)
        s = np.add.reduceat(gv, starts).astype(np.float64)
        sq = np.add.reduceat(gv * gv, starts).astype(np.float64)
        nf = cnt.astype(np.float64)
        mean = s / nf
        sig = np.sqrt(nf * sq - s * s)  # n·σ (shared subexpression)
        burst = (sig - s) / (sig + s)
        return pa.table(
            {
                "user_id": pa.array(u[starts], type=pa.int64()),
                "n_gaps": pa.array(cnt, type=pa.int64()),
                "mean_gap_s": pa.array(mean, type=pa.float64()),
                "burstiness": pa.array(burst, type=pa.float64()),
            }
        )

    return ds.map_batches(add_part, batch_format="pyarrow").groupby("part").map_groups(
        moments, batch_format="pyarrow"
    )


IQR_MULT = 1.5


def iqr_outliers(sf_dir: str, mult: float = IQR_MULT) -> rd.Dataset:
    """Tukey-fence outlier audit per event type: count values outside
    [q1 − mult·IQR, q3 + mult·IQR] where q1/q3 are the EXACT discrete
    quartiles — the robust cleaning gate applied before loss weighting
    (winsorize's detector sibling: report, don't clamp).

    The fences are DERIVED thresholds: computed from the data (type-
    bounded quantile reduce), broadcast back into a counting scan —
    the two-phase shape of customer_high_value_counts.  The fence
    expression q ± mult·(q3−q1) is the one float computation, mirrored
    verbatim; quartiles themselves are exact data values.

    Output: (event_type, n_total, n_low, n_high).
    """
    ds = _read_events(sf_dir, ["event_type", "value"])

    def quartiles(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(), kind="stable")
        n = len(v)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "q1": [float(v[_disc_rank(0.25, n) - 1])],
                "q3": [float(v[_disc_rank(0.75, n) - 1])],
            }
        )

    qt = ds.groupby("event_type").map_groups(quartiles, batch_format="pandas").to_pandas()
    lo = {r.event_type: np.float64(r.q1) - mult * (np.float64(r.q3) - np.float64(r.q1)) for r in qt.itertuples()}
    hi = {r.event_type: np.float64(r.q3) + mult * (np.float64(r.q3) - np.float64(r.q1)) for r in qt.itertuples()}

    def count_out(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy()
        lov = np.array([lo[x] for x in et])
        hiv = np.array([hi[x] for x in et])
        order = np.argsort(et, kind="stable")
        et, v, lov, hiv = et[order], v[order], lov[order], hiv[order]
        starts = np.concatenate([[0], np.nonzero(et[1:] != et[:-1])[0] + 1])
        red = lambda x: np.add.reduceat(x.astype(np.int64), starts)  # noqa: E731
        return pa.table(
            {
                "event_type": pa.array(et[starts], type=pa.string()),
                "n_total": pa.array(red(np.ones(len(et))), type=pa.int64()),
                "n_low": pa.array(red(v < lov), type=pa.int64()),
                "n_high": pa.array(red(v > hiv), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(count_out, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_total", alias_name="n_total"),
            Sum("n_low", alias_name="n_low"),
            Sum("n_high", alias_name="n_high"),
        )
        .sort("event_type")
    )


def table_profile(sf_dir: str) -> rd.Dataset:
    """Catalog data-quality profile: per (table, column) the row count,
    null count and empty-string count over the profiled string/payload
    columns — the dbt-style expectation report a pipeline opens with
    (corpus_summary's row counts, deepened to column health).

    Scale shape: each table is ONE projected scan emitting three int64
    partials per column per batch; no joins, no wide shuffles.
    Output: (tbl, col, n_rows, n_null, n_empty).
    """
    specs = {
        "documents": ["text", "lang", "source"],
        "events": ["event_type", "props"],
        "orders": ["o_orderstatus", "o_orderpriority"],
    }
    pieces = []
    for tbl, cols in specs.items():
        ds = rd.read_parquet(os.path.join(sf_dir, f"{tbl}.parquet"), columns=cols)

        def profile(t: pa.Table, tbl: str = tbl, cols: tuple = tuple(cols)) -> pa.Table:
            rows = {"tbl": [], "col": [], "n_rows": [], "n_null": [], "n_empty": []}
            for c in cols:
                arr = t[c]
                rows["tbl"].append(tbl)
                rows["col"].append(c)
                rows["n_rows"].append(t.num_rows)
                rows["n_null"].append(arr.null_count)
                import pyarrow.compute as pc

                nonnull = arr.drop_null()
                rows["n_empty"].append(int(pc.sum(pc.equal(nonnull, "")).as_py() or 0))
            return pa.table(
                {
                    "tbl": pa.array(rows["tbl"], type=pa.string()),
                    "col": pa.array(rows["col"], type=pa.string()),
                    "n_rows": pa.array(rows["n_rows"], type=pa.int64()),
                    "n_null": pa.array(rows["n_null"], type=pa.int64()),
                    "n_empty": pa.array(rows["n_empty"], type=pa.int64()),
                }
            )

        pieces.append(ds.map_batches(profile, batch_format="pyarrow"))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return (
        out.groupby(["tbl", "col"])
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_null", alias_name="n_null"),
            Sum("n_empty", alias_name="n_empty"),
        )
        .sort(["tbl", "col"])
    )


RFM_ASOF_US = 1_706_745_600_000_000  # 2024-02-01T00:00:00Z, just past the fixture window


def rfm_features(sf_dir: str) -> rd.Dataset:
    """RFM feature assembly: per user the Recency (whole days between a
    fixed as-of instant and the last event), Frequency (event count)
    and Monetary (int64 cents sum) — the canonical behavioral feature
    vector a churn/LTV model trains on, built once per snapshot.

    All-integer outputs: recency is integer µs floor-divided to days,
    money is fixed-point cents — bit-exact under any batch split.

    Scale shape: per-batch per-user combiner (max ts, count, cents sum
    — 3 ints per user per batch) → ONE user-keyed groupby.
    Output: (user_id, r_days, f_events, m_cents).
    """
    from ray.data.aggregate import Max, Sum

    ds = _read_events(sf_dir, ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        from ..stages.common import duckdb_round

        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        ts = t["ts"].to_numpy().astype(np.int64)
        cents = duckdb_round(t["value"].to_numpy() * 100.0, 0).astype(np.int64)
        order = np.argsort(uid, kind="stable")
        uid, ts, cents = uid[order], ts[order], cents[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(uid))[0] + 1])
        return pa.table(
            {
                "user_id": pa.array(uid[starts], type=pa.int64()),
                "max_ts": pa.array(np.maximum.reduceat(ts, starts), type=pa.int64()),
                "n": pa.array(np.diff(np.concatenate([starts, [len(uid)]])), type=pa.int64()),
                "cents": pa.array(np.add.reduceat(cents, starts), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("max_ts", alias_name="max_ts"),
            Sum("n", alias_name="f_events"),
            Sum("cents", alias_name="m_cents"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        r = (RFM_ASOF_US - t["max_ts"].to_numpy()) // 86_400_000_000
        return pa.table(
            {
                "user_id": t["user_id"],
                "r_days": pa.array(r, type=pa.int64()),
                "f_events": pa.array(t["f_events"].to_numpy().astype(np.int64), type=pa.int64()),
                "m_cents": pa.array(t["m_cents"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("user_id")


INTERP_QS = (0.25, 0.5, 0.75, 0.9)


def interpolated_quantiles(sf_dir: str, qs: tuple[float, ...] = INTERP_QS) -> rd.Dataset:
    """Linearly INTERPOLATED per-type quantiles (the percentile_cont
    definition: rank q·(n−1), value v_lo + (v_hi − v_lo)·frac) — the
    continuous sibling of event_value_quantiles' discrete rank
    selection, matching what most BI layers report.

    Determinism: selection is on exact order statistics (ties in value
    are value-equal so rank choice cannot change the picked values);
    the ONE interpolation expression is mirrored verbatim in SQL and
    rounded to 6dp on both sides.

    Scale shape: type-keyed regroup (types are few; at 10^12 rows per
    type swap in the histogram-refine two-pass of value_quantiles —
    same output by exactness).  Output: (event_type, q, n, q_value).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_type", "value"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy().astype(np.float64))
        n = len(v)
        rows = []
        for q in qs:
            pos = q * (n - 1)
            lo = int(np.floor(pos))
            hi = int(np.ceil(pos))
            frac = pos - np.floor(pos)
            val = float(duckdb_round(np.array([v[lo] + (v[hi] - v[lo]) * frac]), 6)[0])
            rows.append((g["event_type"].iloc[0], q, n, val))
        return pd.DataFrame(rows, columns=["event_type", "q", "n", "q_value"])

    return ds.groupby("event_type").map_groups(per_type, batch_format="pandas")


def hour_type_pivot(sf_dir: str) -> rd.Dataset:
    """PIVOT: events counted per (type, hour-of-day), hours spread WIDE
    into 24 integer columns — the reshape every reporting layer runs on
    the hourly profile (and the engine's exercise of the
    long-to-wide operator).

    Scale shape: per-batch (type, hour) count combiner -> one
    type×24-bounded groupby -> a stateless widen projection.

    Output: (event_type, h00..h23).
    """
    ds = _read_events(sf_dir, ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        hr = (t["ts"].to_numpy().astype("datetime64[h]").astype(np.int64) % 24).astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "hour": hr})
        g = df.groupby(["event_type", "hour"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "hour": pa.array(g["hour"].to_numpy().astype(np.int64), type=pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(24, dtype=np.int64)
        counts[g["hour"].to_numpy()] = g["n"].to_numpy()
        row = {"event_type": g["event_type"].iloc[0]}
        for h in range(24):
            row[f"h{h:02d}"] = counts[h]
        return pd.DataFrame([row])

    return agg.groupby("event_type").map_groups(widen, batch_format="pandas")


def mad_robust_stats(sf_dir: str) -> rd.Dataset:
    """Robust location/scale per event type: the interpolated MEDIAN
    and the MAD (median absolute deviation from it) — the
    outlier-insensitive pair (median, 1.4826·MAD ≈ σ) robust cleaning
    gates use where mean/std break under heavy tails (complement of
    iqr_outliers' fences and winsorize's clamps).

    Determinism: both selections are explicit order statistics with the
    interpolated_quantiles arithmetic; the unrounded median feeds the
    deviation pass and rounding happens once at the projection,
    mirrored exactly in SQL.

    Scale shape: type-keyed regroup (types few; the two-pass histogram
    refine swaps in at 10^12 rows/type).  Output: (event_type, n,
    median, mad).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_type", "value"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy().astype(np.float64))
        n = len(v)

        def interp_median(a: np.ndarray) -> float:
            pos = 0.5 * (len(a) - 1)
            lo = int(np.floor(pos))
            hi = int(np.ceil(pos))
            frac = pos - np.floor(pos)
            return float(a[lo] + (a[hi] - a[lo]) * frac)

        med = interp_median(v)
        dev = np.sort(np.abs(v - med))
        mad = interp_median(dev)
        return pd.DataFrame(
            [
                (
                    g["event_type"].iloc[0],
                    n,
                    float(duckdb_round(np.array([med]), 6)[0]),
                    float(duckdb_round(np.array([mad]), 6)[0]),
                )
            ],
            columns=["event_type", "n", "median", "mad"],
        )

    return ds.groupby("event_type").map_groups(per_type, batch_format="pandas")


def value_concentration(sf_dir: str) -> rd.Dataset:
    """Behavioral INEQUALITY: per event type, the share of total value
    contributed by the top decile of users — the 80/20 concentration
    diagnostic (whale detection, abuse screening) that tile_gini
    answers for space and this answers for users.

    Exactness: user totals are int64 cents (duckdb_round to cents
    before summing — exact under any accumulation order); the ONE
    division is mirrored.  Rank ties break by user_id in both engines.

    Scale shape: per-batch (type, user) cents combiner -> ONE
    (type x users)-bounded groupby -> per-type regroup on the
    aggregate only.  Output: (event_type, n_users, top_k, top_cents,
    total_cents, top_share).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_type", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = duckdb_round(t["value"].to_numpy() * 100.0, 0).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "user_id": t["user_id"].to_numpy().astype(np.int64),
                "cents": cents,
            }
        )
        g = df.groupby(["event_type", "user_id"], sort=False)["cents"].sum().reset_index()
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "user_id": pa.array(g["user_id"].to_numpy(), type=pa.int64()),
                "cents": pa.array(g["cents"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("cents", alias_name="cents"))
    )

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "user_id"], ascending=[False, True]).reset_index(drop=True)
        n = len(g)
        k = (n + 9) // 10  # ceil(n/10)
        top = int(g["cents"].iloc[:k].sum())
        tot = int(g["cents"].sum())
        share = float(duckdb_round(np.array([top / tot]), 6)[0]) if tot else 0.0
        return pd.DataFrame(
            [(g["event_type"].iloc[0], n, k, top, tot, share)],
            columns=["event_type", "n_users", "top_k", "top_cents", "total_cents", "top_share"],
        )

    return per_user.groupby("event_type").map_groups(per_type, batch_format="pandas")


# ---------------------------------------------------------------------------
# benford_audit (first-digit law conformance of a monetary column)
# ---------------------------------------------------------------------------


def benford_audit(sf_dir: str) -> rd.Dataset:
    """Benford first-digit audit of ``l_extendedprice`` — per digit
    1..9: observed count, observed fraction, the Benford expectation
    log10(1 + 1/d), and the chi-square contribution.  The classic
    synthetic-data / fraud screen a corpus audit runs over every
    monetary column before trusting it as a training signal.

    Exactness: the leading digit is pure int64 arithmetic (floor the
    price, then repeated //10 — a bounded <=19-step vectorized loop, no
    string round-trips, no log10-of-float edge cases near powers of
    ten).  Counts are exact int64 in any accumulation order; the three
    float outputs are each ONE expression over (n, total, digit),
    mirrored verbatim in the SQL oracle.

    Scale shape: map-side combiner (9-row bincount partial per batch)
    -> one 9-key groupby -> driver finalize on 9 rows.  Nothing but
    the 9-row partials ever shuffles.  Output: (digit, n, obs_frac,
    exp_frac, chi2_term).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice"])
    digits = np.arange(1, 10, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        v = np.floor(t["l_extendedprice"].to_numpy()).astype(np.int64)
        while (v >= 10).any():
            v = np.where(v >= 10, v // 10, v)
        counts = np.bincount(v, minlength=10)[1:10].astype(np.int64)
        return pa.table({"digit": pa.array(digits), "n": pa.array(counts)})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("digit")
        .reset_index(drop=True)
    )
    n = agg["n"].to_numpy().astype(np.int64)
    d = agg["digit"].to_numpy().astype(np.float64)
    tot = float(n.sum())
    exp_frac = np.log(1.0 + 1.0 / d) / np.log(10.0)
    obs_frac = n.astype(np.float64) / tot
    chi2 = (n.astype(np.float64) - tot * exp_frac) ** 2 / (tot * exp_frac)
    return rd.from_arrow(
        pa.table(
            {
                "digit": pa.array(agg["digit"].to_numpy(), type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
                "obs_frac": pa.array(duckdb_round(obs_frac, 6), type=pa.float64()),
                "exp_frac": pa.array(duckdb_round(exp_frac, 6), type=pa.float64()),
                "chi2_term": pa.array(duckdb_round(chi2, 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# lineitem_corr_matrix (pairwise Pearson over the numeric fact columns)
# ---------------------------------------------------------------------------

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_CORR_SHORT = ("q", "p", "d", "t")


def lineitem_corr_matrix(sf_dir: str) -> rd.Dataset:
    """Pairwise Pearson correlation matrix over the four numeric
    lineitem columns — the feature-redundancy screen run before using
    fact columns as model inputs.

    Exactness via the int128-as-two-int64 discipline: every value is
    fixed-pointed to cents (exact int64), and every moment sum
    SUM(x*y) is carried as TWO int64 sums (hi = sum(x*y >> 30),
    lo = sum(x*y & (2^30-1))) because SUM(price_cents^2) overflows
    int64 already at sf0.1 (~6e19).  The driver reassembles the exact
    int128 with unbounded Python ints; DuckDB's SUM(BIGINT) is
    HUGEINT-exact natively, so both engines divide the SAME integers.
    This is the documented 10^12-row path for moment sums (cf.
    value_hour_correlation's hi/lo note) implemented for real.

    Scale shape: one 29-int partial row per batch -> a single global
    aggregate (no key) -> 6-row driver finalize.  Output:
    (col_a, col_b, n, pearson_r).
    """
    import itertools
    import math

    from ..stages.common import duckdb_round

    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"), columns=list(_CORR_COLS))
    pairs = list(itertools.combinations_with_replacement(range(4), 2))
    mask = np.int64((1 << 30) - 1)

    def partial(t: pa.Table) -> pa.Table:
        arrs = [
            np.floor(t[c].to_numpy() * 100.0 + 0.5).astype(np.int64) for c in _CORR_COLS
        ]
        out: dict[str, pa.Array] = {
            "n": pa.array([np.int64(t.num_rows)], type=pa.int64())
        }
        for i, s in enumerate(_CORR_SHORT):
            out[f"s_{s}"] = pa.array([arrs[i].sum()], type=pa.int64())
        for i, j in pairs:
            prod = arrs[i] * arrs[j]  # per element <= ~1e14, exact int64
            key = _CORR_SHORT[i] + _CORR_SHORT[j]
            out[f"hi_{key}"] = pa.array([np.int64((prod >> 30).sum())], type=pa.int64())
            out[f"lo_{key}"] = pa.array([np.int64((prod & mask).sum())], type=pa.int64())
        return pa.table(out)

    aggs = [Sum("n", alias_name="n")]
    aggs += [Sum(f"s_{s}", alias_name=f"s_{s}") for s in _CORR_SHORT]
    for i, j in pairs:
        key = _CORR_SHORT[i] + _CORR_SHORT[j]
        aggs += [Sum(f"hi_{key}", alias_name=f"hi_{key}"), Sum(f"lo_{key}", alias_name=f"lo_{key}")]
    tot = ds.map_batches(partial, batch_format="pyarrow").aggregate(*aggs)

    n = int(tot["n"])
    s1 = {s: int(tot[f"s_{s}"]) for s in _CORR_SHORT}
    s2 = {}
    for i, j in pairs:
        key = _CORR_SHORT[i] + _CORR_SHORT[j]
        s2[key] = (int(tot[f"hi_{key}"]) << 30) + int(tot[f"lo_{key}"])  # exact int128

    rows_a, rows_b, rs = [], [], []
    for i, j in itertools.combinations(range(4), 2):
        a, b = _CORR_SHORT[i], _CORR_SHORT[j]
        num = n * s2[a + b] - s1[a] * s1[b]
        den_a = n * s2[a + a] - s1[a] * s1[a]
        den_b = n * s2[b + b] - s1[b] * s1[b]
        r = float(num) / math.sqrt(float(den_a) * float(den_b))
        rows_a.append(_CORR_COLS[i])
        rows_b.append(_CORR_COLS[j])
        rs.append(float(duckdb_round(np.array([r]), 6)[0]))
    return rd.from_arrow(
        pa.table(
            {
                "col_a": pa.array(rows_a, type=pa.string()),
                "col_b": pa.array(rows_b, type=pa.string()),
                "n": pa.array([n] * 6, type=pa.int64()),
                "pearson_r": pa.array(rs, type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# discount_elasticity (grouped Pearson: discount vs quantity per brand)
# ---------------------------------------------------------------------------


def discount_elasticity(sf_dir: str) -> rd.Dataset:
    """Per-brand correlation between discount depth and quantity sold
    — the demand-response screen ("do discounts move volume for this
    brand?") that needs a DIM JOIN before the grouped moment reduce,
    extending lineitem_corr_matrix's global matrix to per-group grain.

    Dataflow: lineitem(partkey, discount, quantity) ⋈ part(brand) —
    the dim side is read with two columns only — then the
    value_hour_correlation discipline per brand: cents-exact int64
    moment partials per batch, ONE brand-keyed reduce, r as one
    mirrored float expression.  Output: (p_brand, n, pearson_r).
    """
    from ..stages.common import safe_join

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_discount", "l_quantity"],
    )
    pt = rd.read_parquet(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"])
    j = safe_join(li, pt, join_type="inner", num_partitions=8, on=("l_partkey",), right_on=("p_partkey",))

    def partial(t: pa.Table) -> pa.Table:
        d = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        q = np.floor(t["l_quantity"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        br = t["p_brand"].to_numpy(zero_copy_only=False)
        order = np.argsort(br, kind="stable")
        br, d, q = br[order], d[order], q[order]
        bounds = np.nonzero(br[1:] != br[:-1])[0] + 1
        starts = np.concatenate([[0], bounds])
        red = lambda v: np.add.reduceat(v, starts)  # noqa: E731
        ones = np.ones(len(br), dtype=np.int64)
        return pa.table(
            {
                "p_brand": pa.array(br[starts], type=pa.string()),
                "n": pa.array(red(ones), type=pa.int64()),
                "sx": pa.array(red(d), type=pa.int64()),
                "sy": pa.array(red(q), type=pa.int64()),
                "sxy": pa.array(red(d * q), type=pa.int64()),
                "sxx": pa.array(red(d * d), type=pa.int64()),
                "syy": pa.array(red(q * q), type=pa.int64()),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        from ..stages.common import duckdb_round

        n = t["n"].to_numpy().astype(np.float64)
        sx = t["sx"].to_numpy().astype(np.float64)
        sy = t["sy"].to_numpy().astype(np.float64)
        sxy = t["sxy"].to_numpy().astype(np.float64)
        sxx = t["sxx"].to_numpy().astype(np.float64)
        syy = t["syy"].to_numpy().astype(np.float64)
        r = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy))
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "n": t["n"],
                "pearson_r": pa.array(duckdb_round(r, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# kmv_overlap_eval (theta-style set-overlap estimate, error-audited)
# ---------------------------------------------------------------------------

KMVO_K = 128
KMVO_SET_A = "purchase"
KMVO_SET_B = "view"


def kmv_overlap_eval(sf_dir: str, k: int = KMVO_K) -> rd.Dataset:
    """Audited KMV set-OVERLAP estimate: |A ∩ B| of two user sets (A =
    purchasers, B = viewers) via inclusion-exclusion over three KMV
    sketches (est A + est B − est A∪B) — the theta-sketch workload
    (audience overlap, campaign reach dedup) with its error CHECKED
    against the exact intersection, extending the sketch-audit family
    (KMV count, HLL, Space-Saving) to binary set algebra.

    Hashing is md5(user_id-as-string), lexicographic order — the
    hash_split_counts convention, bit-identical in SQL — and the
    estimator is the textbook (K−1)/frac(h_(K)) with first-8-hex-chars
    as the unit fraction; sets smaller than K fall back to exact.

    Scale shape: this is an EVAL op — the error audit NEEDS the exact
    truth, so the (set, user) distinct reduce runs regardless and the
    estimate is computed on its bounded output (members ≤ |users|);
    the production estimate-only path keeps per-batch K-smallest
    partials instead (stages.sketch.KMVSketch fold).  Output: one row
    (n_a, n_b, n_inter, est_a, est_b, est_union, est_inter, abs_err).
    """
    import hashlib

    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["user_id", "event_type"])

    def dedup_pairs(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        keep = (et == KMVO_SET_A) | (et == KMVO_SET_B)
        et, uid = et[keep], uid[keep]
        import pandas as pd

        df = pd.DataFrame({"s": (et == KMVO_SET_A).astype(np.int64), "user_id": uid}).drop_duplicates()
        return pa.table(
            {
                "s": pa.array(df["s"].to_numpy(), type=pa.int64()),
                "user_id": pa.array(df["user_id"].to_numpy(), type=pa.int64()),
            }
        )

    members = (
        ds.map_batches(dedup_pairs, batch_format="pyarrow")
        .groupby(["s", "user_id"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    ua = set(members.loc[members["s"] == 1, "user_id"].astype(int))
    ub = set(members.loc[members["s"] == 0, "user_id"].astype(int))
    n_a, n_b, n_inter = len(ua), len(ub), len(ua & ub)

    def kmv_est(users: set[int]) -> float:
        hs = sorted(hashlib.md5(str(u).encode()).hexdigest() for u in users)
        if len(hs) <= k:
            return float(len(hs))
        kth = hs[k - 1]
        frac = int(kth[:8], 16) / 4294967296.0
        return (k - 1) / frac

    est_a, est_b = kmv_est(ua), kmv_est(ub)
    est_u = kmv_est(ua | ub)
    est_inter = est_a + est_b - est_u
    return rd.from_arrow(
        pa.table(
            {
                "n_a": pa.array([n_a], type=pa.int64()),
                "n_b": pa.array([n_b], type=pa.int64()),
                "n_inter": pa.array([n_inter], type=pa.int64()),
                "est_a": pa.array(duckdb_round(np.array([est_a]), 6), type=pa.float64()),
                "est_b": pa.array(duckdb_round(np.array([est_b]), 6), type=pa.float64()),
                "est_union": pa.array(duckdb_round(np.array([est_u]), 6), type=pa.float64()),
                "est_inter": pa.array(duckdb_round(np.array([est_inter]), 6), type=pa.float64()),
                "abs_err": pa.array(
                    duckdb_round(np.array([abs(est_inter - n_inter)]), 6), type=pa.float64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# ks_weekend_test (two-sample Kolmogorov-Smirnov over fixed-point values)
# ---------------------------------------------------------------------------

KS_FP = 1e12  # fixed-point pitch for the CDF-difference terms


def ks_weekend_test(sf_dir: str) -> rd.Dataset:
    """Two-sample Kolmogorov-Smirnov: does the event-value distribution
    differ between weekend and weekday traffic?  D = sup_x |F_we(x) −
    F_wd(x)| with the asymptotic two-sided p ≈ 2·exp(−2·D²·mn/(m+n)) —
    the distribution-shift detector (mix drift, bot traffic, pricing
    change) that mean/quantile screens miss.

    Exactness: values fixed-point to cents; the sup runs over the
    DISTINCT-cents aggregate (bounded by the value domain, not the
    corpus) where both CDFs are exact integer ratios — each |difference|
    is ONE float expression fixed to int64 for an order-free argmax
    (ties resolve to the smallest cents).  The p-value is one mirrored
    expression over (D, m, n).

    Scale shape: map-side (cents, is_weekend) count combiner -> ONE
    domain-bounded groupby -> driver cumsum/argmax.  Output: one row
    (n_weekday, n_weekend, d_stat, ks_p, at_cents).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].cast(pa.int64()).to_numpy() // 86_400_000_000
        # epoch 1970-01-01 was a THURSDAY: day%7 == 2 is Saturday, 3 is Sunday
        we = ((day % 7 == 2) | (day % 7 == 3)).astype(np.int64)
        cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        import pandas as pd

        df = pd.DataFrame({"cents": cents, "we": we})
        c = df.groupby(["cents", "we"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "cents": pa.array(c["cents"].to_numpy(), type=pa.int64()),
                "we": pa.array(c["we"].to_numpy(), type=pa.int64()),
                "n": pa.array(c["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cents", "we"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = agg.pivot_table(index="cents", columns="we", values="n", aggfunc="sum", fill_value=0).sort_index()
    wd = piv.get(0, pd.Series(dtype=np.int64)).to_numpy().astype(np.int64)
    we_ = piv.get(1, pd.Series(dtype=np.int64)).to_numpy().astype(np.int64)
    m, n = int(wd.sum()), int(we_.sum())
    cwd, cwe = np.cumsum(wd), np.cumsum(we_)
    # |F_we - F_wd| at each distinct value, exact-integer argmax:
    # |cwe*m - cwd*n| (common denominator m*n), ties -> smallest cents
    diff = np.abs(cwe.astype(object) * m - cwd.astype(object) * n)  # exact big ints
    best = int(np.argmax(diff == max(diff)))
    d_num = int(diff[best])
    d = float(d_num) / (float(m) * float(n))
    p = 2.0 * np.exp(-2.0 * d * d * (m * n / float(m + n)))
    cents_idx = piv.index.to_numpy().astype(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "n_weekday": pa.array([m], type=pa.int64()),
                "n_weekend": pa.array([n], type=pa.int64()),
                "d_stat": pa.array(duckdb_round(np.array([d]), 6), type=pa.float64()),
                "ks_p": pa.array(duckdb_round(np.array([min(1.0, p)]), 6), type=pa.float64()),
                "at_cents": pa.array([int(cents_idx[best])], type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# chi2_independence (event_type × hour-of-day contingency test)
# ---------------------------------------------------------------------------


def chi2_independence(sf_dir: str) -> rd.Dataset:
    """Pearson chi-square test of independence between event_type and
    hour-of-day, plus Cramér's V effect size — the categorical
    dependence audit run before trusting a diurnal-mix feature
    (companion of hour_type_pivot's reshape; reference analogue: the
    A1/A3 counter layer, `io.plasmap.query.engine` aggregates,
    re-expressed as a contingency reduce).

        e_ij = r_i·c_j / N
        χ²   = Σ_ij (n_ij − e_ij)² / e_ij     (full observed grid)
        V    = sqrt(χ² / (N·min(R−1, C−1)))

    Exactness: the contingency table is exact int64 through the
    aggregate tree; the χ² float sum runs over a types×24-bounded grid
    (≤ few hundred terms, same-magnitude) so the 6dp rounding is
    engine-independent; every float expression is mirrored in SQL.

    Scale shape: per-batch (type, hour) count combiner -> ONE bounded
    groupby -> driver finalize on the tiny grid.  Output: one row
    (n_total, n_types, n_hours, dof, chi2, cramers_v).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        hr = (t["ts"].cast(pa.int64()).to_numpy() // 3_600_000_000) % 24
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "hour": hr})
        g = df.groupby(["event_type", "hour"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "hour": pa.array(g["hour"].to_numpy().astype(np.int64), type=pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )

    types = np.sort(agg["event_type"].unique())
    hours = np.sort(agg["hour"].unique())
    ti = {t: i for i, t in enumerate(types)}
    grid = np.zeros((len(types), len(hours.tolist())), dtype=np.int64)
    hi = {h: j for j, h in enumerate(hours)}
    for t, h, n in agg.itertuples(index=False):
        grid[ti[t], hi[h]] = n
    N = int(grid.sum())
    rn = grid.sum(axis=1).astype(np.float64)  # row totals
    cn = grid.sum(axis=0).astype(np.float64)  # col totals
    e = rn[:, None] * cn[None, :] / float(N)
    d = grid.astype(np.float64) - e
    chi2 = float((d * d / e).sum())
    dof = (len(types) - 1) * (len(hours) - 1)
    denom = float(N) * float(min(len(types) - 1, len(hours) - 1))
    v = math.sqrt(chi2 / denom) if denom > 0 else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "n_total": pa.array([N], type=pa.int64()),
                "n_types": pa.array([len(types)], type=pa.int64()),
                "n_hours": pa.array([len(hours)], type=pa.int64()),
                "dof": pa.array([dof], type=pa.int64()),
                "chi2": pa.array(duckdb_round(np.array([chi2]), 6), type=pa.float64()),
                "cramers_v": pa.array(duckdb_round(np.array([v]), 6), type=pa.float64()),
            }
        )
    )


HILL_K = 100  # tail order statistics used


def hill_tail_index(sf_dir: str, k: int = HILL_K) -> rd.Dataset:
    """Hill estimator of the value distribution's tail index
    (Hill 1975): over the top-(k+1) order statistics x₍₁₎ ≥ … ≥
    x₍ₖ₊₁₎, α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) — the heavy-tail exponent
    behind "is a p99.99 spike plausible or corrupt?" capacity and
    fraud questions (finite variance needs α > 2); the extreme-value
    sibling of zipf_fit's rank-frequency slope.

    Determinism: the tail set is an exact top-(k+1) selection (value
    DESC, then ROW deterministic by value alone — ties contribute
    identical ln terms so tie order is irrelevant); the k ln-ratio
    terms are each pinned once at 1e-9 and summed as int64.

    Scale shape: per-batch local top-(k+1) prune (the ranked-head
    combiner) → ONE k-bounded global selection; the estimator runs on
    k+1 driver rows.  Output: one row (k, x_k1, sum_ln_fp, hill_alpha,
    mean_excess) rounded 6.
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["value"])

    def local_top(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        v = v[~np.isnan(v)]
        if len(v) > k + 1:
            v = np.partition(v, len(v) - (k + 1))[-(k + 1):]
        return pa.table({"value": pa.array(np.sort(v)[::-1], type=pa.float64())})

    top = ds.map_batches(local_top, batch_format="pyarrow").to_pandas()
    v = np.sort(top["value"].to_numpy())[::-1][: k + 1]
    xk1 = float(v[k])
    fp = 1e9
    pins = np.floor(np.log(v[:k] / xk1) * fp + 0.5).astype(np.int64)
    s = int(pins.sum())
    alpha = float(k) / (s / fp)
    mean_excess = float(duckdb_round(np.array([(v[:k] - xk1).mean()]), 6)[0])
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array([k], type=pa.int64()),
                "x_k1": pa.array([float(duckdb_round(np.array([xk1]), 6)[0])], type=pa.float64()),
                "sum_ln_fp": pa.array([s], type=pa.int64()),
                "hill_alpha": pa.array([float(duckdb_round(np.array([alpha]), 6)[0])], type=pa.float64()),
                "mean_excess": pa.array([mean_excess], type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# mann_whitney_u (rank-sum shift test, weekend vs weekday)
# ---------------------------------------------------------------------------


def mann_whitney_u(sf_dir: str) -> rd.Dataset:
    """Mann-Whitney U (Wilcoxon rank-sum) test: is the weekend
    event-value distribution stochastically shifted vs weekdays?  The
    nonparametric sibling of ks_weekend_test — KS feels any shape
    difference, U specifically detects a location shift, which is the
    usual question behind "did the pricing change move the weekend
    mix?" (reference analogue: the A1/A3 counter layer re-expressed as
    a rank reduce).

        R₂  = Σ_v n_we(v) · midrank(v)          (midranks over ties)
        U   = R₂ − n_we(n_we+1)/2
        σ²  = m·n/12 · [(N+1) − Σ(t³−t)/(N(N−1))]   (tie-corrected)
        z   = (U − m·n/2) / σ

    Exactness: values fixed-point to cents; midranks carry a ×2 factor
    so every rank quantity is an exact integer (midrank2 = 2·cum_before
    + t_v + 1); R₂, U×2 and the tie term Σ(t³−t) are exact Python ints
    (HUGEINT in the SQL mirror — t³ sums exceed int64 past ~2M ties per
    value); z is ONE mirrored float expression over those integers.

    Scale shape: map-side (cents, is_weekend) count combiner -> ONE
    domain-bounded groupby (distinct cents × 2 rows, never input rows)
    -> driver rank scan on the tiny aggregate.  Output: one row
    (n_weekday, n_weekend, u2_weekend, z).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].cast(pa.int64()).to_numpy() // 86_400_000_000
        # epoch 1970-01-01 was a THURSDAY: day%7 == 2 is Saturday, 3 is Sunday
        we = ((day % 7 == 2) | (day % 7 == 3)).astype(np.int64)
        cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({"cents": cents, "we": we})
        c = df.groupby(["cents", "we"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "cents": pa.array(c["cents"].to_numpy(), type=pa.int64()),
                "we": pa.array(c["we"].to_numpy(), type=pa.int64()),
                "n": pa.array(c["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cents", "we"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = agg.pivot_table(index="cents", columns="we", values="n", aggfunc="sum", fill_value=0).sort_index()
    wd = piv.get(0, pd.Series(dtype=np.int64)).to_numpy().astype(np.int64)
    we_ = piv.get(1, pd.Series(dtype=np.int64)).to_numpy().astype(np.int64)
    m, n = int(wd.sum()), int(we_.sum())
    tv = (wd + we_).astype(object)  # exact big-int arithmetic from here
    cum_before = np.concatenate(([0], np.cumsum(tv)[:-1]))
    midrank2 = 2 * cum_before + tv + 1
    r2 = int((we_.astype(object) * midrank2).sum())
    u2 = r2 - n * (n + 1)  # 2·U, exact
    tie = int((tv**3 - tv).sum())
    N = m + n
    sigma = math.sqrt(
        float(m) * float(n) / 12.0 * (float(N + 1) - float(tie) / (float(N) * float(N - 1)))
    )
    z = (float(u2) / 2.0 - float(m) * float(n) / 2.0) / sigma
    return rd.from_arrow(
        pa.table(
            {
                "n_weekday": pa.array([m], type=pa.int64()),
                "n_weekend": pa.array([n], type=pa.int64()),
                "u2_weekend": pa.array([u2], type=pa.int64()),
                "z": pa.array(duckdb_round(np.array([z]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# hbos_outliers (histogram-based outlier score, exact-integer variant)
# ---------------------------------------------------------------------------

HBOS_TOPK = 20
HBOS_PRICE_BIN_CENTS = 100_000  # $1000-wide price bins


def hbos_outliers(sf_dir: str, topk: int = HBOS_TOPK) -> rd.Dataset:
    """HBOS (Goldstein & Dengel 2012) outlier screen over lineitem's
    (quantity, discount, price-bin) marginals — the O(N) anomaly
    detector run where pairwise methods (kNN/LOF) cannot: a row is
    outlying when EVERY marginal histogram bin it falls in is rare.
    The classical score Σ log(1/p_i) is a monotone transform of the
    marginal-count PRODUCT, so this variant ranks by the exact integer
    n_qty·n_disc·n_price ascending — same order, no float logs, bit-
    stable across engines (reference analogue: the A1/A3 counter layer
    re-expressed as a marginal-independence screen).

    Exactness: features fixed-point (qty int, discount cents, price
    cents // 100000); counts are exact int64 through the aggregate
    tree; the score product stays < 2^63 up to ~2×10^6 rows per
    marginal bin — beyond that widen to HUGEINT/object (the SQL mirror
    already computes in HUGEINT).  Ties break on (qty, disc, bin).

    Scale shape: map-side (qty, disc, bin) count combiner -> ONE
    domain-bounded groupby (distinct combos ≤ |qty|·|disc|·|bins|,
    never input rows); the three marginals + score join run on that
    tiny combo table driver-side.  Output: topk rows (qty, disc_cents,
    price_bin, n_rows, n_qty, n_disc, n_price, score).
    """
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_discount", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].to_numpy().astype(np.int64)
        disc = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        pbin = np.floor(t["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64) // HBOS_PRICE_BIN_CENTS
        df = pd.DataFrame({"qty": qty, "disc_cents": disc, "price_bin": pbin})
        c = df.groupby(["qty", "disc_cents", "price_bin"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "qty": pa.array(c["qty"].to_numpy(), type=pa.int64()),
                "disc_cents": pa.array(c["disc_cents"].to_numpy(), type=pa.int64()),
                "price_bin": pa.array(c["price_bin"].to_numpy(), type=pa.int64()),
                "n": pa.array(c["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    combos = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["qty", "disc_cents", "price_bin"])
        .aggregate(Sum("n", alias_name="n_rows"))
        .to_pandas()
    )
    mq = combos.groupby("qty")["n_rows"].sum().rename("n_qty")
    md = combos.groupby("disc_cents")["n_rows"].sum().rename("n_disc")
    mp = combos.groupby("price_bin")["n_rows"].sum().rename("n_price")
    c = combos.join(mq, on="qty").join(md, on="disc_cents").join(mp, on="price_bin")
    score = c["n_qty"].astype(object) * c["n_disc"].astype(object) * c["n_price"].astype(object)
    assert int(max(score)) < 2**63, "HBOS score exceeds int64 — widen to object/HUGEINT"
    c["score"] = score.astype(np.int64)
    c = c.sort_values(["score", "qty", "disc_cents", "price_bin"]).head(topk)
    return rd.from_arrow(
        pa.table(
            {
                "qty": pa.array(c["qty"].to_numpy().astype(np.int64), type=pa.int64()),
                "disc_cents": pa.array(c["disc_cents"].to_numpy().astype(np.int64), type=pa.int64()),
                "price_bin": pa.array(c["price_bin"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_rows": pa.array(c["n_rows"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_qty": pa.array(c["n_qty"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_disc": pa.array(c["n_disc"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_price": pa.array(c["n_price"].to_numpy().astype(np.int64), type=pa.int64()),
                "score": pa.array(c["score"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# bootstrap_ci (deterministic Poisson bootstrap of the mean)
# ---------------------------------------------------------------------------

BOOT_B = 200  # bootstrap replicates
# integer inverse-CDF thresholds for Poisson(1): floor(cum_k * 2^63)
# (k = 0..8; the tail beyond 8 has probability < 1e-9 and rounds in)
_BOOT_CUM = []
_acc = 0.0
_fact = 1.0
import math as _math  # noqa: E402

for _k in range(9):
    if _k:
        _fact *= _k
    _acc += _math.exp(-1.0) / _fact
    _BOOT_CUM.append(min(int(_acc * (1 << 63)), (1 << 63) - 1))
_BOOT_THRESH = np.array(_BOOT_CUM, dtype=np.int64)


def _boot_weights(ids: np.ndarray, b: int) -> np.ndarray:
    """Poisson(1) draw count of each row in replicate ``b`` — a pure
    integer hash of (id, b) compared against integer CDF thresholds:
    no RNG state, reshard-proof, identical on any worker."""
    h = (
        ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        + np.uint64(b + 1) * np.uint64(0xBF58476D1CE4E5B9)
    )
    h ^= h >> np.uint64(31)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(29)
    u = (h >> np.uint64(1)).astype(np.int64)  # uniform in [0, 2^63)
    return np.searchsorted(_BOOT_THRESH, u, side="left").astype(np.int64)


def bootstrap_ci(sf_dir: str, b_reps: int = BOOT_B) -> rd.Dataset:
    """Percentile-bootstrap 95% CI for the mean order value via the
    POISSON bootstrap (Chamandy et al. 2012 — the resampling scheme
    that works on partitioned data: each row enters replicate b
    Poisson(1) times, independently per row, so no replicate ever
    needs a global sample).  The uncertainty row every KPI dashboard
    should carry next to its point estimate.

    Determinism: draw counts come from an integer hash of (o_orderkey,
    b) against integer Poisson CDF thresholds — no RNG state; per-
    replicate (Σw·cents, Σw) fold as exact int64 through the aggregate
    tree; each replicate mean is ONE mirrored float division; the CI
    bounds are exact rank selections (quantile_disc convention) over
    the B means.

    Scale shape: ONE scan emitting B-row partials per batch (map-side
    combiner over replicates) -> a B-row groupby -> driver rank
    selection over B rows.  B is constant — nothing scales with input.

    Output: one row (n_orders, mean_value, ci_lo, ci_hi, se_boot).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ids = t["o_orderkey"].to_numpy()
        cents = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        reps = np.arange(b_reps, dtype=np.int64)
        sw = np.empty(b_reps, dtype=np.int64)
        swx = np.empty(b_reps, dtype=np.int64)
        for b in range(b_reps):
            w = _boot_weights(ids, b)
            sw[b] = int(w.sum())
            swx[b] = int((w * cents).sum())
        return pa.table(
            {
                "b": pa.array(reps, type=pa.int64()),
                "sw": pa.array(sw, type=pa.int64()),
                "swx": pa.array(swx, type=pa.int64()),
                "n": pa.array(np.full(b_reps, len(ids), dtype=np.int64), type=pa.int64()),
                "sx": pa.array(np.full(b_reps, int(cents.sum()), dtype=np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(
            Sum("sw", alias_name="sw"),
            Sum("swx", alias_name="swx"),
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
        )
        .to_pandas()  # bounded: fixed bootstrap/bin groups
        .sort_values("b")
    )
    means = agg["swx"].to_numpy().astype(np.float64) / np.maximum(
        agg["sw"].to_numpy(), 1
    ).astype(np.float64) / 100.0
    n = int(agg["n"].iloc[0])
    mean = float(agg["sx"].iloc[0]) / n / 100.0
    ms = np.sort(means)
    k_lo = max(1, math.ceil(0.025 * b_reps))
    k_hi = max(1, math.ceil(0.975 * b_reps))
    se = float(np.std(ms, ddof=1))
    return rd.from_arrow(
        pa.table(
            {
                "n_orders": pa.array([n], type=pa.int64()),
                "mean_value": pa.array(duckdb_round(np.array([mean]), 6), type=pa.float64()),
                "ci_lo": pa.array(duckdb_round(np.array([ms[k_lo - 1]]), 6), type=pa.float64()),
                "ci_hi": pa.array(duckdb_round(np.array([ms[k_hi - 1]]), 6), type=pa.float64()),
                "se_boot": pa.array(duckdb_round(np.array([se]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# expectations_audit (declarative data-contract rules, one fused scan)
# ---------------------------------------------------------------------------

# (rule_id, human-readable rule) — the lineitem data contract.  Rules
# are vectorized Arrow kernels in the engine and CASE sums in the SQL
# mirror; adding a rule is one row in each.
EXPECT_RULES = (
    (1, "l_quantity between 1 and 50"),
    (2, "l_discount between 0.00 and 0.10"),
    (3, "l_tax >= 0"),
    (4, "l_returnflag in (A, N, R)"),
    (5, "l_shipdate not null"),
    (6, "l_extendedprice > 0"),
)


def expectations_audit(sf_dir: str) -> rd.Dataset:
    """Great-Expectations-style data-contract audit: every contract
    rule evaluated over lineitem in ONE fused scan — the ingest gate a
    warehouse runs before anything downstream trusts a load (the
    declarative sibling of referential_integrity's key checks and
    table_profile's summary stats).

    Exactness: each rule is a boolean Arrow kernel; per-rule pass
    counts fold as int64 through the aggregate tree; no floats at all.

    Scale shape: map-side per-batch (rule, n, n_pass) partials -> ONE
    rule-bounded groupby (6 rows regardless of input).  A failed rule
    reports counts, not rows — the row-level quarantine is the M9
    error-router's job, this is the summary gate.

    Output: (rule_id, rule, n_rows, n_pass, n_fail) sorted by rule_id.
    """
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_discount", "l_tax", "l_returnflag", "l_shipdate", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        q = t["l_quantity"]
        disc = t["l_discount"]
        checks = {
            1: pc.and_(pc.greater_equal(q, 1.0), pc.less_equal(q, 50.0)),
            2: pc.and_(pc.greater_equal(disc, 0.0), pc.less_equal(disc, 0.10)),
            3: pc.greater_equal(t["l_tax"], 0.0),
            4: pc.is_in(t["l_returnflag"], value_set=pa.array(["A", "N", "R"])),
            5: pc.is_valid(t["l_shipdate"]),
            6: pc.greater(t["l_extendedprice"], 0.0),
        }
        rid, n, npass = [], [], []
        for k, mask in checks.items():
            rid.append(k)
            n.append(t.num_rows)
            npass.append(int(pc.sum(pc.fill_null(mask, False)).as_py() or 0))
        return pa.table(
            {
                "rule_id": pa.array(rid, type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
                "n_pass": pa.array(npass, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("rule_id")
        .aggregate(Sum("n", alias_name="n_rows"), Sum("n_pass", alias_name="n_pass"))
    )

    rules = dict(EXPECT_RULES)

    def finish(t: pa.Table) -> pa.Table:
        t = t.sort_by("rule_id")
        rid = t["rule_id"].to_numpy()
        return pa.table(
            {
                "rule_id": pa.array(rid, type=pa.int64()),
                "rule": pa.array([rules[int(r)] for r in rid], type=pa.string()),
                "n_rows": t["n_rows"].cast(pa.int64()),
                "n_pass": t["n_pass"].cast(pa.int64()),
                "n_fail": pa.array(
                    t["n_rows"].to_numpy() - t["n_pass"].to_numpy(), type=pa.int64()
                ),
            }
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# neyman_allocation (optimal stratified-sampling design)
# ---------------------------------------------------------------------------

NEYMAN_BUDGET = 10_000


def neyman_allocation(sf_dir: str, budget: int = NEYMAN_BUDGET) -> rd.Dataset:
    """Neyman-optimal allocation of a sampling budget across event-type
    strata: n_h ∝ N_h·S_h (Neyman 1934) — minimum-variance stratified
    design for estimating mean event value; the design table
    stratified_sample should be parameterized by instead of flat rates
    (strata with more rows AND more spread earn more of the budget).

    Exactness: per-stratum (N, Σcents, Σcents²) fold as exact int64
    through the aggregate tree; S_h = sqrt((N·s2 − s1²)/(N·(N−1))) is
    one mirrored expression (IEEE sqrt is correctly rounded — engine-
    invariant); the allocation floor(budget·w_h/Σw + 0.5) is mirrored
    in the SQL CROSS JOIN.

    Scale shape: map-side (type, count, sum, sumsq) combiner -> ONE
    type-bounded groupby -> driver finalize on the strata rows.

    Output: (event_type, n_rows, stddev_cents, weight, n_alloc).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({"event_type": et, "c": cents})
        g = df.groupby("event_type", sort=False).agg(
            n=("c", "size"), s1=("c", "sum"), s2=("c", lambda x: int((x.astype(object) ** 2).sum()))
        ).reset_index()
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), type=pa.int64()),
                "s1": pa.array(g["s1"].to_numpy().astype(np.int64), type=pa.int64()),
                "s2": pa.array(g["s2"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("s1", alias_name="s1"), Sum("s2", alias_name="s2"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    n = agg["n"].to_numpy().astype(np.float64)
    s1 = agg["s1"].to_numpy().astype(np.float64)
    s2 = agg["s2"].to_numpy().astype(np.float64)
    sd = np.sqrt((n * s2 - s1 * s1) / (n * (n - 1.0)))
    w = n * sd
    alloc = np.floor(budget * w / w.sum() + 0.5).astype(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(agg["event_type"], type=pa.string()),
                "n_rows": pa.array(agg["n"].to_numpy().astype(np.int64), type=pa.int64()),
                "stddev_cents": pa.array(duckdb_round(sd, 6), type=pa.float64()),
                "weight": pa.array(duckdb_round(w, 6), type=pa.float64()),
                "n_alloc": pa.array(alloc, type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# runs_test (Wald-Wolfowitz randomness of the daily revenue series)
# ---------------------------------------------------------------------------


def runs_test(sf_dir: str) -> rd.Dataset:
    """Wald-Wolfowitz runs test: is the daily-revenue series random
    around its median, or does it trend/cycle?  Too FEW runs of
    above/below-median days = persistence (drift the mean-reverting
    forecasts miss); too MANY = oscillation.  The classic
    distribution-free serial-dependence check beside acf_hourly's
    parametric lags.

        n₁, n₂ = days above / below-or-equal the median
        R      = observed runs;  μ = 1 + 2n₁n₂/N;
        σ²     = 2n₁n₂(2n₁n₂ − N) / (N²(N−1));   z = (R − μ)/σ

    Exactness: daily sums are exact cents; the median is an exact
    rank selection (lower median, quantile_disc convention); run
    boundaries are integer comparisons; μ, σ, z are mirrored float
    expressions over (n1, n2, R).

    Scale shape: per-batch (day, cents) combiner -> ONE day-bounded
    groupby; the run scan is a length-D driver pass (daily_cusum
    discipline).  Output: one row (n_days, n_above, n_below, n_runs,
    z).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderdate", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].cast(pa.int64()).to_numpy() // 86_400_000_000
        cents = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({"day": day, "cents": cents})
        g = df.groupby("day", sort=False)["cents"].sum().reset_index()
        return pa.table(
            {
                "day": pa.array(g["day"].to_numpy(), type=pa.int64()),
                "cents": pa.array(g["cents"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    x = daily["cents"].to_numpy().astype(np.int64)
    n = len(x)
    med = int(np.partition(x, (n - 1) // 2)[(n - 1) // 2])  # lower median, exact
    above = x > med
    n1 = int(above.sum())
    n2 = n - n1
    runs = 1 + int((above[1:] != above[:-1]).sum())
    mu = 1.0 + 2.0 * n1 * n2 / float(n)
    sigma = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (float(n) * float(n) * (n - 1.0)))
    z = (runs - mu) / sigma
    return rd.from_arrow(
        pa.table(
            {
                "n_days": pa.array([n], type=pa.int64()),
                "n_above": pa.array([n1], type=pa.int64()),
                "n_below": pa.array([n2], type=pa.int64()),
                "n_runs": pa.array([runs], type=pa.int64()),
                "z": pa.array(duckdb_round(np.array([z]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# ols_regression (multiple linear regression via exact normal equations)
# ---------------------------------------------------------------------------


def ols_regression(sf_dir: str) -> rd.Dataset:
    """Per-returnflag MULTIPLE linear regression — price ~ quantity +
    discount — solved by exact-integer normal equations + Cramer's
    rule.  The one-pass distributed OLS: no gradient iterations, no
    driver-side rows, just ten moment sums per group.

        y  = rounded dollars of l_extendedprice
        x1 = l_quantity (integral in TPC-H)
        x2 = discount percentage points (floor(d*100+0.5))

    Normal equations  X'X b = X'y  for X = [1, x1, x2] reduce to a 3x3
    integer system per group; both engine and oracle evaluate the SAME
    exact integer determinants (Python big-int here, HUGEINT in
    DuckDB) so b0/b1/b2 agree bit-for-bit before the shared round(.,6).
    R^2 comes from the sum identity SSE = syy - b0*sy - b1*s1y - b2*s2y
    (valid only at the OLS optimum), evaluated in the same float order
    on both sides.

    Scale shape: map-ONLY ten-sum partials per batch (np.add.reduceat
    over the batch-sorted group key) -> ONE bounded groupby (3 flags)
    -> O(1) driver solve per group.  This is the canonical "learning
    as aggregation" pattern: at 10^12 rows the network carries thirty
    int64s.  Headroom: dollar-grain y keeps syy partials < 2^63 up to
    ~10^8 rows per flag; beyond that split each sum into (hi, lo)
    int64 pairs (the exact-int128 corr-matrix discipline,
    lineitem_corr_matrix).

    Output: (l_returnflag, n, b0, b1, b2, r2).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x1 = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        x2 = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        y = np.floor(t["l_extendedprice"].to_numpy() + 0.5).astype(np.int64)
        order = np.argsort(flag, kind="stable")
        flag, x1, x2, y = flag[order], x1[order], x2[order], y[order]
        bounds = np.nonzero(flag[1:] != flag[:-1])[0] + 1
        starts = np.concatenate([[0], bounds])
        red = lambda v: np.add.reduceat(v, starts)  # noqa: E731
        ones = np.ones(len(flag), dtype=np.int64)
        return pa.table(
            {
                "l_returnflag": pa.array(flag[starts], type=pa.string()),
                "n": pa.array(red(ones), type=pa.int64()),
                "s1": pa.array(red(x1), type=pa.int64()),
                "s2": pa.array(red(x2), type=pa.int64()),
                "sy": pa.array(red(y), type=pa.int64()),
                "s11": pa.array(red(x1 * x1), type=pa.int64()),
                "s12": pa.array(red(x1 * x2), type=pa.int64()),
                "s22": pa.array(red(x2 * x2), type=pa.int64()),
                "s1y": pa.array(red(x1 * y), type=pa.int64()),
                "s2y": pa.array(red(x2 * y), type=pa.int64()),
                "syy": pa.array(red(y * y), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")])
    )

    def finish(t: pa.Table) -> pa.Table:
        rows = {c: [] for c in ("l_returnflag", "n", "b0", "b1", "b2", "r2")}
        for i in range(t.num_rows):
            n, s1, s2, sy, s11, s12, s22, s1y, s2y, syy = (
                int(t[c][i].as_py()) for c in ("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")
            )
            # exact big-int 3x3 Cramer: det [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]
            det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
            det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
            det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
            det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
            b0 = float(det0) / float(det)
            b1 = float(det1) / float(det)
            b2 = float(det2) / float(det)
            sse = float(syy) - b0 * float(sy) - b1 * float(s1y) - b2 * float(s2y)
            sst = float(syy) - float(sy) * float(sy) / float(n)
            rows["l_returnflag"].append(t["l_returnflag"][i].as_py())
            rows["n"].append(n)
            rows["b0"].append(b0)
            rows["b1"].append(b1)
            rows["b2"].append(b2)
            rows["r2"].append(1.0 - sse / sst)
        return pa.table(
            {
                "l_returnflag": pa.array(rows["l_returnflag"], type=pa.string()),
                "n": pa.array(rows["n"], type=pa.int64()),
                "b0": pa.array(duckdb_round(np.array(rows["b0"]), 6), type=pa.float64()),
                "b1": pa.array(duckdb_round(np.array(rows["b1"]), 6), type=pa.float64()),
                "b2": pa.array(duckdb_round(np.array(rows["b2"]), 6), type=pa.float64()),
                "r2": pa.array(duckdb_round(np.array(rows["r2"]), 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# decision_stump (distributed best-split search, the tree-learner core)
# ---------------------------------------------------------------------------

STUMP_FEATURES = ("quantity", "discount_pct", "ship_month")


def decision_stump(sf_dir: str) -> rd.Dataset:
    """Best one-feature decision stump predicting l_returnflag = 'R'
    — the inner loop of every tree/GBM learner (find the (feature,
    threshold) split minimizing weighted Gini impurity) expressed as
    histogram aggregation, the way distributed GBM engines
    (XGBoost-on-Spark, LightGBM parallel) actually do it.

    Scale shape: per-batch (feature, value, n, pos) histogram combiner
    (features x bounded integer value grids: qty <= 50, disc <= 10,
    month <= 12) -> ONE small groupby -> the cumulative split scan +
    Gini argmin runs on the <=126-row aggregate, corpus-size-
    independent.  The raw table never shuffles; adding features or
    quantized bins widens the histogram, never the exchange.

    Determinism: counts are exact int64; the Gini expression is
    mirrored float arithmetic rounded to 6, and the per-feature argmin
    orders by (rounded gini, threshold) so engine and oracle pick the
    same split even under float ties.

    Output: (feature, threshold, n_le, pos_le, n_gt, pos_gt, gini) —
    one row per feature, the best split of each.
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        y = (np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False)) == "R").astype(np.int64)
        qty = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        disc = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[M]")
        month = (sd.astype(np.int64) % 12) + 1
        frames = []
        for name, v in (("quantity", qty), ("discount_pct", disc), ("ship_month", month)):
            df = pd.DataFrame({"v": v, "y": y}).groupby("v", sort=False).agg(
                n=("y", "size"), pos=("y", "sum")
            ).reset_index()
            df.insert(0, "feature", name)
            frames.append(df)
        allf = pd.concat(frames, ignore_index=True)
        return pa.table(
            {
                "feature": pa.array(allf["feature"], type=pa.string()),
                "v": pa.array(allf["v"].to_numpy().astype(np.int64), type=pa.int64()),
                "n": pa.array(allf["n"].to_numpy().astype(np.int64), type=pa.int64()),
                "pos": pa.array(allf["pos"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["feature", "v"])
        .aggregate(Sum("n", alias_name="n"), Sum("pos", alias_name="pos"))
        .to_pandas()
    )
    rows = {"feature": [], "threshold": [], "n_le": [], "pos_le": [], "n_gt": [], "pos_gt": [], "gini": []}
    for feat in sorted(hist["feature"].unique()):
        sub = hist[hist["feature"] == feat].sort_values("v")
        n = sub["n"].to_numpy().astype(np.int64)
        pos = sub["pos"].to_numpy().astype(np.int64)
        v = sub["v"].to_numpy().astype(np.int64)
        n_tot, pos_tot = int(n.sum()), int(pos.sum())
        n_le = np.cumsum(n)
        pos_le = np.cumsum(pos)
        valid = (n_le > 0) & (n_le < n_tot)
        nl = n_le[valid].astype(np.float64)
        pl = pos_le[valid].astype(np.float64)
        ng = n_tot - nl
        pg = pos_tot - pl
        nt = float(n_tot)
        gini = (nl / nt) * (1.0 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2) + (ng / nt) * (
            1.0 - (pg / ng) ** 2 - ((ng - pg) / ng) ** 2
        )
        gini = duckdb_round(gini, 6)
        thr = v[valid]
        best = np.lexsort((thr, gini))[0]
        rows["feature"].append(feat)
        rows["threshold"].append(int(thr[best]))
        rows["n_le"].append(int(n_le[valid][best]))
        rows["pos_le"].append(int(pos_le[valid][best]))
        rows["n_gt"].append(n_tot - int(n_le[valid][best]))
        rows["pos_gt"].append(pos_tot - int(pos_le[valid][best]))
        rows["gini"].append(float(gini[best]))
    return rd.from_arrow(
        pa.table(
            {
                "feature": pa.array(rows["feature"], type=pa.string()),
                "threshold": pa.array(rows["threshold"], type=pa.int64()),
                "n_le": pa.array(rows["n_le"], type=pa.int64()),
                "pos_le": pa.array(rows["pos_le"], type=pa.int64()),
                "n_gt": pa.array(rows["n_gt"], type=pa.int64()),
                "pos_gt": pa.array(rows["pos_gt"], type=pa.int64()),
                "gini": pa.array(rows["gini"], type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# logistic_newton (distributed IRLS logistic regression)
# ---------------------------------------------------------------------------

LOGIT_FP = np.int64(1) << np.int64(30)  # gradient/Hessian quantum
LOGIT_ITERS = 8


def _logit_design(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    y = (np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False)) == "R").astype(np.float64)
    x1 = np.floor(t["l_quantity"].to_numpy() + 0.5)
    x2 = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5)
    return y, x1, x2


def _logit_partial(t: pa.Table, beta: np.ndarray) -> np.ndarray:
    """Exact int64 (grad[3], upper-tri hess[6], loss, n, n_correct)
    partial for one batch.  Every per-row term is an ELEMENTWISE float
    expression quantized to int64 BEFORE summation, so partials are
    batching- and merge-order-independent — the lloyd_centroids
    discipline applied to IRLS."""
    y, x1, x2 = _logit_design(t)
    z = beta[0] + beta[1] * x1 + beta[2] * x2
    p = 1.0 / (1.0 + np.exp(-z))
    fp = float(LOGIT_FP)
    q = lambda v: np.floor(v * fp + 0.5).astype(np.int64)  # noqa: E731
    r = y - p
    w = p * (1.0 - p)
    out = np.empty(11, dtype=np.int64)
    out[0] = q(r).sum()
    out[1] = q(r * x1).sum()
    out[2] = q(r * x2).sum()
    out[3] = q(w).sum()
    out[4] = q(w * x1).sum()
    out[5] = q(w * x2).sum()
    out[6] = q(w * x1 * x1).sum()
    out[7] = q(w * x1 * x2).sum()
    out[8] = q(w * x2 * x2).sum()
    # log loss, clipped like the golden: -[y ln p + (1-y) ln(1-p)]
    eps = 1e-12
    out[9] = q(-(y * np.log(p + eps) + (1.0 - y) * np.log(1.0 - p + eps))).sum()
    out[10] = int(((p > 0.5) == (y > 0.5)).sum())
    return out


def logistic_newton(sf_dir: str, iters: int = LOGIT_ITERS) -> rd.Dataset:
    """Distributed logistic regression (returnflag='R' ~ quantity +
    discount) by full-batch Newton/IRLS: each iteration is ONE
    streaming pass emitting an 11-int64 fixed-point partial per batch;
    the 3x3 Newton solve runs on the exact global sums.  The
    "iterative learning as repeated aggregation" pattern — the same
    shape as distributed L-BFGS/IRLS in MLlib, with bit-stable
    results because per-row float terms are quantized BEFORE the
    merge-order-dependent summation (lloyd_centroids discipline).

    Scale shape: the design matrix never materializes; per pass the
    network carries 11 int64s per block.  Headroom: Hessian quanta
    bound ~2^40/row at the TPC-H feature ranges -> int64 safe to
    ~10^8 rows/pass; lower LOGIT_FP or hi/lo-split beyond.

    Output: one row (n, b0, b1, b2, log_loss, accuracy); the golden
    is an INDEPENDENT exact-float64 IRLS (no fixed-point kernel) —
    matching at 6 decimals proves the distributed layer AND that the
    quantization does not distort the converged fit.
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_discount"],
    ).materialize()  # 3 pruned columns; re-read per pass at planet scale
    n_rows = ds.count()
    beta = np.zeros(3, dtype=np.float64)
    fp = float(LOGIT_FP)
    final = None
    for _ in range(iters + 1):
        def partial(t: pa.Table, beta=beta.copy()) -> pa.Table:
            v = _logit_partial(t, beta)
            return pa.table(
                {"_g": pa.array([0], type=pa.int64())}
                | {f"c{i}": pa.array([int(v[i])], type=pa.int64()) for i in range(11)}
            )

        agg = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_g")
            .aggregate(*[Sum(f"c{i}", alias_name=f"c{i}") for i in range(11)])
            .to_pandas()  # bounded: single-group moment rows
        )
        s = np.array([int(agg[f"c{i}"][0]) for i in range(11)], dtype=object)
        grad = np.array([float(s[0]), float(s[1]), float(s[2])]) / fp
        hess = (
            np.array(
                [
                    [float(s[3]), float(s[4]), float(s[5])],
                    [float(s[4]), float(s[6]), float(s[7])],
                    [float(s[5]), float(s[7]), float(s[8])],
                ]
            )
            / fp
        )
        final = (float(s[9]) / fp / n_rows, int(s[10]))
        beta = beta + np.linalg.solve(hess, grad)
    # the last loop turn only evaluates loss/accuracy at the converged
    # beta (its update is discarded) — iters Newton steps total
    beta = beta - np.linalg.solve(hess, grad)
    loss, n_correct = final
    return rd.from_arrow(
        pa.table(
            {
                "n": pa.array([n_rows], type=pa.int64()),
                "b0": pa.array(duckdb_round(np.array([beta[0]]), 6), type=pa.float64()),
                "b1": pa.array(duckdb_round(np.array([beta[1]]), 6), type=pa.float64()),
                "b2": pa.array(duckdb_round(np.array([beta[2]]), 6), type=pa.float64()),
                "log_loss": pa.array(duckdb_round(np.array([loss]), 6), type=pa.float64()),
                "accuracy": pa.array(
                    duckdb_round(np.array([n_correct / n_rows]), 6), type=pa.float64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# psi_drift (population stability index between shipping eras)
# ---------------------------------------------------------------------------

PSI_SPLIT_DATE = "1995-01-01"
PSI_FEATURES = ("quantity", "discount_pct", "price_10k")


def psi_drift(sf_dir: str) -> rd.Dataset:
    """Population Stability Index of lineitem feature distributions
    between the early (< 1995) and late (>= 1995) shipping eras — the
    ML-ops drift gate (PSI < 0.1 stable / 0.1-0.25 shifting / > 0.25
    retrain) run exactly as a model monitor would: fixed bins, two
    period histograms, one number per feature.

        PSI = sum_bins (p_a - p_b) * ln(p_a / p_b)

    with +1 Laplace smoothing per (bin, period) so empty bins stay
    finite (documented; both sides smooth identically).  Bins are
    FIXED integer grids (quantity // 5, discount pct, price // 10k) —
    drift monitors pin bins at training time for exactly this
    reproducibility reason.

    Scale shape: ONE map pass computes per-batch (feature, bin,
    period) count partials over the bounded grids -> ONE small
    groupby -> driver PSI on the bins-bounded aggregate.  Counts
    exact int64; PSI is one mirrored float expression rounded to 6.

    Output: (feature, n_early, n_late, psi).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_quantity", "l_discount", "l_extendedprice"],
    )
    split = np.datetime64(PSI_SPLIT_DATE)

    def partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        late = (sd >= split).astype(np.int64)
        qty = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64) // 5
        disc = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        price = np.floor(t["l_extendedprice"].to_numpy() + 0.5).astype(np.int64) // 10_000
        frames = []
        for name, v in (("quantity", qty), ("discount_pct", disc), ("price_10k", price)):
            df = pd.DataFrame({"b": v, "late": late}).groupby(["b", "late"], sort=False).size().reset_index(name="n")
            df.insert(0, "feature", name)
            frames.append(df)
        allf = pd.concat(frames, ignore_index=True)
        return pa.table(
            {
                "feature": pa.array(allf["feature"], type=pa.string()),
                "b": pa.array(allf["b"].to_numpy().astype(np.int64), type=pa.int64()),
                "late": pa.array(allf["late"].to_numpy().astype(np.int64), type=pa.int64()),
                "n": pa.array(allf["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["feature", "b", "late"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = {"feature": [], "n_early": [], "n_late": [], "psi": []}
    for feat in sorted(hist["feature"].unique()):
        sub = hist[hist["feature"] == feat]
        bins = np.sort(sub["b"].unique())
        ea = sub[sub["late"] == 0].set_index("b")["n"]
        la = sub[sub["late"] == 1].set_index("b")["n"]
        a = np.array([int(ea.get(b, 0)) for b in bins], dtype=np.int64) + 1
        l = np.array([int(la.get(b, 0)) for b in bins], dtype=np.int64) + 1
        pa_ = a.astype(np.float64) / a.sum()
        pb_ = l.astype(np.float64) / l.sum()
        psi = float(((pa_ - pb_) * np.log(pa_ / pb_)).sum())
        rows["feature"].append(feat)
        rows["n_early"].append(int(a.sum() - len(bins)))
        rows["n_late"].append(int(l.sum() - len(bins)))
        rows["psi"].append(psi)
    return rd.from_arrow(
        pa.table(
            {
                "feature": pa.array(rows["feature"], type=pa.string()),
                "n_early": pa.array(rows["n_early"], type=pa.int64()),
                "n_late": pa.array(rows["n_late"], type=pa.int64()),
                "psi": pa.array(duckdb_round(np.array(rows["psi"]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# conformal_interval (distribution-free prediction interval for the OLS fit)
# ---------------------------------------------------------------------------

CONF_ALPHA = 0.1
CONF_BINS = 512


def conformal_interval(sf_dir: str, alpha: float = CONF_ALPHA) -> rd.Dataset:
    """Split-conformal prediction interval for the global OLS fit
    price ~ quantity + discount: the distribution-free guarantee
    ("90% of future residuals fall within ±q") that needs NO
    normality assumption — the uncertainty-quantification capstone
    over ols_regression (Vovk et al.; Lei et al. 2018).

        q = the ceil((n+1)(1-alpha))-th smallest |residual|

    Exactness: the fit is the exact big-int Cramer solve (one global
    group); residuals are mirrored float expressions quantized to
    CENTS once (int64), so the conformal quantile is an exact integer
    rank selection and coverage is an exact integer count.

    Scale shape: four streaming passes, none materializing rows —
    (1) ten-sum OLS partials; (2) Max(|r_cents|); (3) CONF_BINS
    histogram partials; (4) refine scan of ONLY the target bin
    (value_quantiles' bin-refine discipline) which also finishes the
    exact coverage count.  At 10^12 rows each pass ships a bounded
    partial per block.

    Output: (n, b0, b1, b2, q_cents, n_within, coverage).
    """
    from ray.data.aggregate import Max as AggMax

    from ..stages.common import duckdb_round

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"), columns=cols).materialize()

    def design(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        x1 = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        x2 = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        y = np.floor(t["l_extendedprice"].to_numpy() + 0.5).astype(np.int64)
        return x1, x2, y

    # pass 1: exact OLS sums (single group)
    def sums(t: pa.Table) -> pa.Table:
        x1, x2, y = design(t)
        vals = {
            "n": len(y), "s1": x1.sum(), "s2": x2.sum(), "sy": y.sum(),
            "s11": (x1 * x1).sum(), "s12": (x1 * x2).sum(), "s22": (x2 * x2).sum(),
            "s1y": (x1 * y).sum(), "s2y": (x2 * y).sum(),
        }
        return pa.table({"_g": pa.array([0], type=pa.int64())} | {k: pa.array([int(v)], type=pa.int64()) for k, v in vals.items()})

    agg = (
        ds.map_batches(sums, batch_format="pyarrow").groupby("_g")
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")])
        .to_pandas()
    )
    n, s1, s2, sy, s11, s12, s22, s1y, s2y = (int(agg[c][0]) for c in ("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y"))
    det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
    det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
    det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
    det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
    b0, b1, b2 = float(det0) / float(det), float(det1) / float(det), float(det2) / float(det)

    def rcents(t: pa.Table) -> np.ndarray:
        x1, x2, y = design(t)
        r = y.astype(np.float64) - (b0 + b1 * x1.astype(np.float64) + b2 * x2.astype(np.float64))
        return np.floor(np.abs(r) * 100.0 + 0.5).astype(np.int64)

    # pass 2: range
    rmax = int(
        ds.map_batches(
            lambda t: pa.table({"m": pa.array([int(rcents(t).max(initial=0))], type=pa.int64())}),
            batch_format="pyarrow",
        ).aggregate(AggMax("m", alias_name="m"))["m"]
    )
    width = rmax // CONF_BINS + 1

    # pass 3: histogram
    def hist(t: pa.Table) -> pa.Table:
        b = rcents(t) // width
        u, c = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(u, type=pa.int64()), "c": pa.array(c.astype(np.int64))})

    h = (
        ds.map_batches(hist, batch_format="pyarrow").groupby("b").aggregate(Sum("c", alias_name="c"))
        .to_pandas().sort_values("b").reset_index(drop=True)
    )
    rank = min(n, math.ceil((n + 1) * (1.0 - alpha)))  # 1-indexed conformal rank
    cum = h["c"].cumsum()
    bi = int(np.searchsorted(cum.to_numpy(), rank))
    target_bin = int(h["b"][bi])
    below = int(cum[bi - 1]) if bi > 0 else 0

    # pass 4: refine the target bin; also finish the exact coverage count
    def refine(t: pa.Table) -> pa.Table:
        rc = rcents(t)
        sel = rc[rc // width == target_bin]
        return pa.table({"v": pa.array(np.sort(sel), type=pa.int64())})

    vals = np.sort(
        ds.map_batches(refine, batch_format="pyarrow").to_pandas()["v"].to_numpy()
    )
    q_cents = int(vals[rank - below - 1])
    n_within = below + int((vals <= q_cents).sum())

    return rd.from_arrow(
        pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "b0": pa.array(duckdb_round(np.array([b0]), 6), type=pa.float64()),
                "b1": pa.array(duckdb_round(np.array([b1]), 6), type=pa.float64()),
                "b2": pa.array(duckdb_round(np.array([b2]), 6), type=pa.float64()),
                "q_cents": pa.array([q_cents], type=pa.int64()),
                "n_within": pa.array([n_within], type=pa.int64()),
                "coverage": pa.array(duckdb_round(np.array([n_within / n]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# mutual_info_rank (filter-style feature relevance by mutual information)
# ---------------------------------------------------------------------------


def mutual_info_rank(sf_dir: str) -> rd.Dataset:
    """Mutual information I(X; returnflag) for each candidate feature
    over its bounded integer grid — the model-free feature-relevance
    ranking (the "filter method" of feature selection) that
    complements decision_stump's single-best-split view and
    chi2_independence's null test with an information-theoretic
    effect size in nats.

        I = sum_xy  n_xy/N * ln( N*n_xy / (n_x * n_y) )

    computed from EXACT int64 contingency counts; the log expression
    is mirrored verbatim in SQL and rounded to 6.

    Scale shape: the decision_stump exchange — per-batch (feature,
    bin, class) count partials over bounded grids -> ONE small
    groupby -> driver MI on the contingency aggregate.  Output:
    (feature, n_bins, mi_nats), ranked by nothing (the driver sorts
    by name; consumers rank by mi_nats).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        y = np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False))
        qty = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64) // 5
        disc = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[M]")
        month = (sd.astype(np.int64) % 12) + 1
        frames = []
        for name, v in (("quantity5", qty), ("discount_pct", disc), ("ship_month", month)):
            df = pd.DataFrame({"b": v, "y": y}).groupby(["b", "y"], sort=False).size().reset_index(name="n")
            df.insert(0, "feature", name)
            frames.append(df)
        allf = pd.concat(frames, ignore_index=True)
        return pa.table(
            {
                "feature": pa.array(allf["feature"], type=pa.string()),
                "b": pa.array(allf["b"].to_numpy().astype(np.int64), type=pa.int64()),
                "y": pa.array(allf["y"], type=pa.string()),
                "n": pa.array(allf["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["feature", "b", "y"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = {"feature": [], "n_bins": [], "mi_nats": []}
    for feat in sorted(hist["feature"].unique()):
        sub = hist[hist["feature"] == feat]
        nn = sub["n"].to_numpy().astype(np.int64)
        ntot = int(nn.sum())
        nx = sub.groupby("b")["n"].sum()
        ny = sub.groupby("y")["n"].sum()
        mi = 0.0
        for b, yv, cnt in zip(sub["b"], sub["y"], nn):
            mi += (int(cnt) / ntot) * np.log(ntot * int(cnt) / (int(nx[b]) * int(ny[yv])))
        rows["feature"].append(feat)
        rows["n_bins"].append(int(sub["b"].nunique()))
        rows["mi_nats"].append(mi)
    return rd.from_arrow(
        pa.table(
            {
                "feature": pa.array(rows["feature"], type=pa.string()),
                "n_bins": pa.array(rows["n_bins"], type=pa.int64()),
                "mi_nats": pa.array(duckdb_round(np.array(rows["mi_nats"]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# quantile_regression (pinball IRLS — conditional quantile fits)
# ---------------------------------------------------------------------------

QR_TAUS = (0.5, 0.9)
QR_ITERS = 60  # pinball IRLS converges slowly from beta=0; ~60 passes calibrates both taus (warm-starting from OLS would roughly halve this — noted, not needed at the pass cost measured)
QR_EPS = 1.0  # residual floor (dollars) in the IRLS weight
QR_FP = np.int64(1) << np.int64(20)


def _qr_design(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    x1 = np.floor(t["l_quantity"].to_numpy() + 0.5)
    x2 = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5)
    y = np.floor(t["l_extendedprice"].to_numpy() + 0.5)
    return x1, x2, y


def _qr_partial(t: pa.Table, beta: np.ndarray, tau: float) -> np.ndarray:
    """Exact int64 partial of the weighted normal equations + pinball
    loss for one batch at the CURRENT beta: per-row float terms
    quantized before summation (order-proof, the logistic_newton
    discipline).  Layout: [wn, w1, w2, wy, w11, w12, w22, w1y, w2y,
    loss, n]."""
    x1, x2, y = _qr_design(t)
    r = y - (beta[0] + beta[1] * x1 + beta[2] * x2)
    w = np.where(r > 0, tau / np.maximum(r, QR_EPS), (1.0 - tau) / np.maximum(-r, QR_EPS))
    fp = float(QR_FP)
    q = lambda v: np.floor(v * fp + 0.5).astype(np.int64)  # noqa: E731
    out = np.empty(11, dtype=np.int64)
    out[0] = q(w).sum()
    out[1] = q(w * x1).sum()
    out[2] = q(w * x2).sum()
    out[3] = q(w * y).sum()
    out[4] = q(w * x1 * x1).sum()
    out[5] = q(w * x1 * x2).sum()
    out[6] = q(w * x2 * x2).sum()
    out[7] = q(w * x1 * y).sum()
    out[8] = q(w * x2 * y).sum()
    out[9] = q(np.maximum(tau * r, (tau - 1.0) * r)).sum()
    out[10] = len(y)
    return out


def quantile_regression(sf_dir: str, taus: tuple = QR_TAUS, iters: int = QR_ITERS) -> rd.Dataset:
    """Conditional-quantile regression (price ~ quantity + discount at
    tau = 0.5 and 0.9) by pinball-loss IRLS — the heteroscedasticity
    lens OLS cannot give: the spread between the median and 0.9 fits
    IS the conditional dispersion (pricing bands, SLA tails), and the
    median fit is the robust counterpart of ols_regression.

    Each iteration is ONE streaming pass emitting an 11-int64
    order-proof partial (per-row weighted terms quantized to 2^-20
    before the merge-order-dependent sum — logistic_newton's
    discipline); the 3x3 weighted normal solve runs on exact global
    sums; iterations are FIXED (no data-dependent stopping), so the
    trajectory is bit-stable; the golden re-codes this recurrence
    independently from the spec and cross-checks the achieved pinball
    loss against an exact-float64 IRLS at build time.

    Output: one row per tau (tau, n, b0, b1, b2, pinball).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_extendedprice", "l_discount"],
    ).materialize()  # 3 pruned cols; re-scan per pass at planet scale
    fp = float(QR_FP)
    rows = {"tau": [], "n": [], "b0": [], "b1": [], "b2": [], "pinball": []}
    for tau in taus:
        beta = np.zeros(3, dtype=np.float64)
        final_loss = 0.0
        n_rows = 0
        for _ in range(iters):
            def partial(t: pa.Table, beta=beta.copy(), tau=tau) -> pa.Table:
                v = _qr_partial(t, beta, tau)
                return pa.table(
                    {"_g": pa.array([0], type=pa.int64())}
                    | {f"c{i}": pa.array([int(v[i])], type=pa.int64()) for i in range(11)}
                )

            agg = (
                ds.map_batches(partial, batch_format="pyarrow")
                .groupby("_g")
                .aggregate(*[Sum(f"c{i}", alias_name=f"c{i}") for i in range(11)])
                .to_pandas()  # bounded: single-group moment rows
            )
            s = [int(agg[f"c{i}"][0]) for i in range(11)]
            A = np.array(
                [
                    [s[0], s[1], s[2]],
                    [s[1], s[4], s[5]],
                    [s[2], s[5], s[6]],
                ],
                dtype=np.float64,
            ) / fp
            b = np.array([s[3], s[7], s[8]], dtype=np.float64) / fp
            final_loss = float(s[9]) / fp / max(int(s[10]), 1)
            n_rows = int(s[10])
            beta = np.linalg.solve(A, b)
        rows["tau"].append(tau)
        rows["n"].append(n_rows)
        rows["b0"].append(beta[0])
        rows["b1"].append(beta[1])
        rows["b2"].append(beta[2])
        rows["pinball"].append(final_loss)
    return rd.from_arrow(
        pa.table(
            {
                "tau": pa.array(rows["tau"], type=pa.float64()),
                "n": pa.array(rows["n"], type=pa.int64()),
                "b0": pa.array(duckdb_round(np.array(rows["b0"]), 6), type=pa.float64()),
                "b1": pa.array(duckdb_round(np.array(rows["b1"]), 6), type=pa.float64()),
                "b2": pa.array(duckdb_round(np.array(rows["b2"]), 6), type=pa.float64()),
                "pinball": pa.array(duckdb_round(np.array(rows["pinball"]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# isotonic_calibration (PAVA monotone fit of return rate vs discount)
# ---------------------------------------------------------------------------


def isotonic_calibration(sf_dir: str) -> rd.Dataset:
    """Isotonic (monotone non-decreasing) calibration of the return
    probability as a function of discount depth, by exact
    pool-adjacent-violators — the assumption-free dose-response fit
    ("do deeper discounts ship more returns?") and the standard
    probability-calibration post-processor for any scorer.

    Exactness: the input is the bounded (discount_pct, n, n_returns)
    contingency aggregate; PAVA pools are merged by EXACT FRACTION
    comparison (cross-multiplied int64 — no float rate ever drives a
    merge decision), so the block structure is bit-stable; the fitted
    rate is one rounded division per output row.

    Scale shape: map-only count partials over the 11-value discount
    grid -> ONE tiny groupby -> O(grid) driver PAVA (corpus-size-
    independent).  Output: (discount_pct, n, n_returns, iso_rate).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_discount", "l_returnflag"]
    )

    def partial(t: pa.Table) -> pa.Table:
        d = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        r = (np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False)) == "R").astype(np.int64)
        df = pd.DataFrame({"d": d, "r": r}).groupby("d", sort=False).agg(
            n=("r", "size"), pos=("r", "sum")
        ).reset_index()
        return pa.table(
            {
                "d": pa.array(df["d"].to_numpy().astype(np.int64), type=pa.int64()),
                "n": pa.array(df["n"].to_numpy().astype(np.int64), type=pa.int64()),
                "pos": pa.array(df["pos"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Sum("n", alias_name="n"), Sum("pos", alias_name="pos"))
        .to_pandas()
        .sort_values("d")
        .reset_index(drop=True)
    )
    # PAVA with exact fraction compares: pool while rate[i] > rate[i+1]
    blocks = [[int(d), int(n), int(p)] for d, n, p in zip(g["d"], g["n"], g["pos"])]
    stack: list[list[int]] = []
    for blk in blocks:
        stack.append(list(blk) + [blk[0]])  # [d_lo, n, pos, d_hi]
        while len(stack) >= 2 and stack[-2][2] * stack[-1][1] > stack[-1][2] * stack[-2][1]:
            d_lo, n1, p1, _ = stack[-2]
            _, n2, p2, d_hi = stack[-1]
            stack.pop()
            stack.pop()
            stack.append([d_lo, n1 + n2, p1 + p2, d_hi])
    out_d, out_rate = [], []
    rate_of: dict[int, float] = {}
    for d_lo, n_, p_, d_hi in stack:
        r = p_ / n_
        for d, _, _ in blocks:
            if d_lo <= d <= d_hi:
                rate_of[d] = r
    iso = duckdb_round(np.array([rate_of[int(d)] for d in g["d"]]), 6)
    return rd.from_arrow(
        pa.table(
            {
                "discount_pct": pa.array(g["d"].to_numpy().astype(np.int64), type=pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_returns": pa.array(g["pos"].to_numpy().astype(np.int64), type=pa.int64()),
                "iso_rate": pa.array(iso, type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# tail_dependence (copula-style joint-extremes audit)
# ---------------------------------------------------------------------------

TAIL_Q = 0.9


def tail_dependence(sf_dir: str, q: float = TAIL_Q) -> rd.Dataset:
    """Empirical tail-dependence of (quantity, extendedprice): the
    probability that one variable is extreme GIVEN the other is —
    lambda_upper = P(Y > q90_Y | X > q90_X) and the mirrored lower
    version — the copula-style dependence-in-the-tails audit that a
    correlation matrix cannot see (independence baseline: 1 - q; a
    common-shock structure pushes it toward 1).

    Exactness: both thresholds are exact rank selections
    (quantile_disc convention — elements of the data): quantity from
    its bounded 1..50 histogram, price dollars via the bin-refine
    passes (value_quantiles discipline); tail counts are one exact
    integer pass; the two lambdas are mirrored rounded divisions.

    Scale shape: histogram partials + Max (price range) + ONE refine
    scan + ONE counting pass — all streaming, bounded partials per
    block.  Output: one row (n, qx_hi, qy_hi, n_xhi, n_joint_hi,
    lambda_upper, qx_lo, qy_lo, n_xlo, n_joint_lo, lambda_lower).
    """
    from ray.data.aggregate import Max as AggMax

    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_quantity", "l_extendedprice"]
    ).materialize()

    def cols(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        x = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        y = np.floor(t["l_extendedprice"].to_numpy() + 0.5).astype(np.int64)
        return x, y

    # joint histogram pass: bounded qty grid + price max
    def hpart(t: pa.Table) -> pa.Table:
        x, y = cols(t)
        u, c = np.unique(x, return_counts=True)
        return pa.table(
            {
                "v": pa.array(u, type=pa.int64()),
                "c": pa.array(c.astype(np.int64), type=pa.int64()),
                "ymax": pa.array(np.full(len(u), int(y.max(initial=0)), dtype=np.int64)),
            }
        )

    h = (
        ds.map_batches(hpart, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"), AggMax("ymax", alias_name="ymax"))
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    n = int(h["c"].sum())
    ymax = int(h["ymax"].max())
    cum = h["c"].cumsum().to_numpy()

    def disc_value(rank: int) -> int:
        return int(h["v"][int(np.searchsorted(cum, rank))])

    rk_hi = _disc_rank(q, n)
    rk_lo = _disc_rank(1.0 - q, n)
    qx_hi = disc_value(rk_hi)
    qx_lo = disc_value(rk_lo)

    # price quantiles via bin histogram + refine (exact rank selection)
    width = ymax // CONF_BINS + 1

    def ypart(t: pa.Table) -> pa.Table:
        _, y = cols(t)
        u, c = np.unique(y // width, return_counts=True)
        return pa.table({"b": pa.array(u, type=pa.int64()), "c": pa.array(c.astype(np.int64))})

    yh = (
        ds.map_batches(ypart, batch_format="pyarrow").groupby("b").aggregate(Sum("c", alias_name="c"))
        .to_pandas().sort_values("b").reset_index(drop=True)
    )
    ycum = yh["c"].cumsum().to_numpy()

    def y_quantile(rank: int) -> int:
        bi = int(np.searchsorted(ycum, rank))
        target = int(yh["b"][bi])
        below = int(ycum[bi - 1]) if bi > 0 else 0

        def refine(t: pa.Table) -> pa.Table:
            _, y = cols(t)
            sel = y[y // width == target]
            return pa.table({"v": pa.array(sel, type=pa.int64())})

        vals = np.sort(ds.map_batches(refine, batch_format="pyarrow").to_pandas()["v"].to_numpy())  # bounded: single refined quantile bin
        return int(vals[rank - below - 1])

    qy_hi = y_quantile(rk_hi)
    qy_lo = y_quantile(rk_lo)

    # exact tail counting pass
    def count_part(t: pa.Table) -> pa.Table:
        x, y = cols(t)
        vals = {
            "n_xhi": int((x > qx_hi).sum()),
            "n_jhi": int(((x > qx_hi) & (y > qy_hi)).sum()),
            "n_xlo": int((x <= qx_lo).sum()),
            "n_jlo": int(((x <= qx_lo) & (y <= qy_lo)).sum()),
        }
        return pa.table({"_g": pa.array([0], type=pa.int64())} | {k: pa.array([v], type=pa.int64()) for k, v in vals.items()})

    c = (
        ds.map_batches(count_part, batch_format="pyarrow").groupby("_g")
        .aggregate(*[Sum(k, alias_name=k) for k in ("n_xhi", "n_jhi", "n_xlo", "n_jlo")])
        .to_pandas()
    )
    n_xhi, n_jhi, n_xlo, n_jlo = (int(c[k][0]) for k in ("n_xhi", "n_jhi", "n_xlo", "n_jlo"))
    lu = duckdb_round(np.array([n_jhi / max(n_xhi, 1)]), 6)
    ll = duckdb_round(np.array([n_jlo / max(n_xlo, 1)]), 6)
    return rd.from_arrow(
        pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "qx_hi": pa.array([qx_hi], type=pa.int64()),
                "qy_hi": pa.array([qy_hi], type=pa.int64()),
                "n_xhi": pa.array([n_xhi], type=pa.int64()),
                "n_joint_hi": pa.array([n_jhi], type=pa.int64()),
                "lambda_upper": pa.array(lu, type=pa.float64()),
                "qx_lo": pa.array([qx_lo], type=pa.int64()),
                "qy_lo": pa.array([qy_lo], type=pa.int64()),
                "n_xlo": pa.array([n_xlo], type=pa.int64()),
                "n_joint_lo": pa.array([n_jlo], type=pa.int64()),
                "lambda_lower": pa.array(ll, type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# gmm_em (two-component Gaussian mixture on log price)
# ---------------------------------------------------------------------------

GMM_ITERS = 25
GMM_FP = np.int64(1) << np.int64(30)


def _gmm_partial(t: pa.Table, params: tuple) -> np.ndarray:
    """Exact int64 E+M partial for one batch at the CURRENT params:
    [sr1, sr1x, sr1xx, sr2, sr2x, sr2xx, loglik, n] with every
    per-row float term quantized pre-sum (order-proof)."""
    w1, mu1, s1, w2, mu2, s2 = params
    y = np.floor(t["l_extendedprice"].to_numpy() + 0.5)
    x = np.log(y)
    fp = float(GMM_FP)
    q = lambda v: np.floor(v * fp + 0.5).astype(np.int64)  # noqa: E731

    def dens(mu, s):
        return np.exp(-0.5 * ((x - mu) / s) ** 2) / (s * np.sqrt(2.0 * np.pi))

    p1 = w1 * dens(mu1, s1)
    p2 = w2 * dens(mu2, s2)
    tot = np.maximum(p1 + p2, 1e-300)
    r1 = p1 / tot
    r2 = 1.0 - r1
    out = np.empty(8, dtype=np.int64)
    out[0] = q(r1).sum()
    out[1] = q(r1 * x).sum()
    out[2] = q(r1 * x * x).sum()
    out[3] = q(r2).sum()
    out[4] = q(r2 * x).sum()
    out[5] = q(r2 * x * x).sum()
    out[6] = q(np.log(tot)).sum()
    out[7] = len(x)
    return out


def gmm_em(sf_dir: str, iters: int = GMM_ITERS) -> rd.Dataset:
    """Two-component Gaussian mixture of ln(extendedprice) by
    distributed EM — the soft-clustering / density-modeling canon
    (is the price distribution one population or two?), rounding out
    the "iterative learning as repeated aggregation" family beside
    k-means (hard assignments), logistic (supervised) and pinball
    IRLS (quantiles).

    Each EM iteration is ONE streaming pass emitting an 8-int64
    order-proof partial (responsibilities and their moments quantized
    to 2^-30 pre-sum); M-step closed forms run on the exact global
    sums.  Deterministic init — mu at the exact 25th/75th percentile
    dollars (rank selection on the bounded histogram), sigma 1,
    weights 1/2 — and FIXED iterations make the whole trajectory
    bit-stable; the golden is an INDEPENDENT exact-float64 EM whose
    6-decimal match also proves the quantization distortion-free.

    Output: (component, weight, mu, sigma, loglik_per_row).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice"]
    ).materialize()

    # deterministic init: exact q25/q75 dollars via bin-refine
    def hmax(t: pa.Table) -> pa.Table:
        y = np.floor(t["l_extendedprice"].to_numpy() + 0.5).astype(np.int64)
        return pa.table(
            {
                "_g": pa.array([0], type=pa.int64()),
                "m": pa.array([int(y.max(initial=0))], type=pa.int64()),
                "n": pa.array([len(y)], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Max as AggMax

    mm = (
        ds.map_batches(hmax, batch_format="pyarrow").groupby("_g")
        .aggregate(AggMax("m", alias_name="m"), Sum("n", alias_name="n")).to_pandas()
    )
    ymax, n = int(mm["m"][0]), int(mm["n"][0])
    width = ymax // CONF_BINS + 1

    def hist(t: pa.Table) -> pa.Table:
        y = np.floor(t["l_extendedprice"].to_numpy() + 0.5).astype(np.int64)
        u, c = np.unique(y // width, return_counts=True)
        return pa.table({"b": pa.array(u, type=pa.int64()), "c": pa.array(c.astype(np.int64))})

    h = (
        ds.map_batches(hist, batch_format="pyarrow").groupby("b").aggregate(Sum("c", alias_name="c"))
        .to_pandas().sort_values("b").reset_index(drop=True)
    )
    cum = h["c"].cumsum().to_numpy()

    def rank_value(rank: int) -> int:
        bi = int(np.searchsorted(cum, rank))
        target = int(h["b"][bi])
        below = int(cum[bi - 1]) if bi > 0 else 0

        def refine(t: pa.Table) -> pa.Table:
            y = np.floor(t["l_extendedprice"].to_numpy() + 0.5).astype(np.int64)
            return pa.table({"v": pa.array(y[y // width == target], type=pa.int64())})

        vals = np.sort(ds.map_batches(refine, batch_format="pyarrow").to_pandas()["v"].to_numpy())  # bounded: single refined quantile bin
        return int(vals[rank - below - 1])

    q25 = rank_value(_disc_rank(0.25, n))
    q75 = rank_value(_disc_rank(0.75, n))
    params = (0.5, float(np.log(q25)), 1.0, 0.5, float(np.log(q75)), 1.0)
    fp = float(GMM_FP)
    loglik = 0.0
    for _ in range(iters):
        def partial(t: pa.Table, params=params) -> pa.Table:
            v = _gmm_partial(t, params)
            return pa.table(
                {"_g": pa.array([0], type=pa.int64())}
                | {f"c{i}": pa.array([int(v[i])], type=pa.int64()) for i in range(8)}
            )

        agg = (
            ds.map_batches(partial, batch_format="pyarrow").groupby("_g")
            .aggregate(*[Sum(f"c{i}", alias_name=f"c{i}") for i in range(8)]).to_pandas()
        )
        s = [int(agg[f"c{i}"][0]) for i in range(8)]
        n1, sx1, sxx1 = s[0] / fp, s[1] / fp, s[2] / fp
        n2, sx2, sxx2 = s[3] / fp, s[4] / fp, s[5] / fp
        loglik = s[6] / fp / n
        mu1, mu2 = sx1 / n1, sx2 / n2
        v1 = max(sxx1 / n1 - mu1 * mu1, 1e-6)
        v2 = max(sxx2 / n2 - mu2 * mu2, 1e-6)
        params = (n1 / n, mu1, float(np.sqrt(v1)), n2 / n, mu2, float(np.sqrt(v2)))
    w1, mu1, s1, w2, mu2, s2 = params
    return rd.from_arrow(
        pa.table(
            {
                "component": pa.array([1, 2], type=pa.int64()),
                "weight": pa.array(duckdb_round(np.array([w1, w2]), 6), type=pa.float64()),
                "mu": pa.array(duckdb_round(np.array([mu1, mu2]), 6), type=pa.float64()),
                "sigma": pa.array(duckdb_round(np.array([s1, s2]), 6), type=pa.float64()),
                "loglik_per_row": pa.array(
                    duckdb_round(np.array([loglik, loglik]), 6), type=pa.float64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# cca_analysis (canonical correlations between variable blocks)
# ---------------------------------------------------------------------------

CCA_X = ("quantity", "discount_pct")
CCA_Y = ("price_dollars", "tax_pct")


def cca_analysis(sf_dir: str) -> rd.Dataset:
    """Canonical correlation analysis between the order-side block
    (quantity, discount) and the money-side block (price, tax): the
    strongest linear relationships BETWEEN groups of variables — what
    a correlation matrix shows pairwise, CCA shows blockwise (the
    multivariate capstone over lineitem_corr_matrix and pca).

    Scale shape: ONE map pass of 14 exact int64 moment sums (the
    ten-sum OLS partial widened to two blocks) -> ONE global reduce
    -> driver 2x2 eigensolve of Sxx^-1 Sxy Syy^-1 Syx (corpus-size-
    independent).  Canonical correlations are sqrt of its
    eigenvalues, rounded 6; the golden solves INDEPENDENTLY — SVD of
    the whitened cross-covariance on DuckDB-computed exact sums.

    Output: (component, can_corr).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_discount", "l_extendedprice", "l_tax"],
    )

    def partial(t: pa.Table) -> pa.Table:
        x1 = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        x2 = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        y1 = np.floor(t["l_extendedprice"].to_numpy() + 0.5).astype(np.int64)
        y2 = np.floor(t["l_tax"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        cols = {"x1": x1, "x2": x2, "y1": y1, "y2": y2}
        vals = {"n": len(x1)}
        names = list(cols)
        for i, a in enumerate(names):
            vals[f"s_{a}"] = int(cols[a].sum())
            for b in names[i:]:
                vals[f"s_{a}{b}"] = int((cols[a] * cols[b]).sum())
        return pa.table(
            {"_g": pa.array([0], type=pa.int64())}
            | {k: pa.array([int(v)], type=pa.int64()) for k, v in vals.items()}
        )

    keys = ["n"] + [f"s_{a}" for a in ("x1", "x2", "y1", "y2")] + [
        f"s_{a}{b}"
        for i, a in enumerate(("x1", "x2", "y1", "y2"))
        for b in ("x1", "x2", "y1", "y2")[i:]
    ]
    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_g")
        .aggregate(*[Sum(k, alias_name=k) for k in keys])
        .to_pandas()  # bounded: single-group moment rows
    )
    s = {k: int(agg[k][0]) for k in keys}
    corrs = cca_from_sums(s)
    return rd.from_arrow(
        pa.table(
            {
                "component": pa.array([1, 2], type=pa.int64()),
                "can_corr": pa.array(duckdb_round(corrs, 6), type=pa.float64()),
            }
        )
    )


def cca_from_sums(s: dict) -> np.ndarray:
    """Canonical correlations from exact integer moment sums (shared
    by the engine and the golden — sums in, floats out, one path)."""
    n = float(s["n"])
    names = ("x1", "x2", "y1", "y2")

    def cov(a: str, b: str) -> float:
        key = f"s_{a}{b}" if f"s_{a}{b}" in s else f"s_{b}{a}"
        return (float(s[key]) - float(s[f"s_{a}"]) * float(s[f"s_{b}"]) / n) / n

    C = np.array([[cov(a, b) for b in names] for a in names])
    Sxx, Sxy = C[:2, :2], C[:2, 2:]
    Syx, Syy = C[2:, :2], C[2:, 2:]
    M = np.linalg.solve(Sxx, Sxy) @ np.linalg.solve(Syy, Syx)
    ev = np.sort(np.linalg.eigvals(M).real)[::-1]
    return np.sqrt(np.clip(ev, 0.0, 1.0))


# ---------------------------------------------------------------------------
# perceptron_averaging (shard-local online training + parameter averaging)
# ---------------------------------------------------------------------------

PERC_SHARDS = 16
PERC_FP = np.int64(10**6)  # averaged-weight fixed point


def perceptron_averaging(sf_dir: str, shards: int = PERC_SHARDS) -> rd.Dataset:
    """One-shot parameter averaging (McDonald et al. 2010 — the
    embarrassingly-parallel training pattern behind federated
    averaging): each shard trains a LOCAL online perceptron over its
    rows in a deterministic order (orderkey*10+linenumber), the
    integer weight vectors average, and one scoring pass evaluates
    the averaged model — predicting returnflag='R' from (quantity,
    discount, month).

    Why it matters here: this is the third distributed-training
    topology in the repo — full-batch closed form (ols/cca), repeated
    global passes (logistic/IRLS/EM), and now LOCAL sequential state
    with ONE communication round.  The perceptron update (w += y·x on
    mistakes) is INTEGER, so each shard's final weights are exact and
    the average is a fixed-point rational — bit-stable end to end
    with no float in training.

    Scale shape: shard-keyed groupby co-locates rows; per-shard
    training is a sorted ALU-bound scan (sessionize contract); the
    "communication round" is a shards×4-int64 table; scoring is one
    map pass against the broadcast averaged weights.  Output: one row
    (n_shards, n_rows, w0..w3 rounded, accuracy).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_discount", "l_shipdate"],
    ).materialize()

    def design(t: pa.Table):
        key = t["l_orderkey"].to_numpy().astype(np.int64) * 10 + t["l_linenumber"].to_numpy().astype(np.int64)
        yy = np.where(
            np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False)) == "R", 1, -1
        ).astype(np.int64)
        x1 = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        x2 = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[M]")
        x3 = (sd.astype(np.int64) % 12) + 1
        return key, yy, x1, x2, x3

    def shard_tag(t: pa.Table) -> pa.Table:
        key, yy, x1, x2, x3 = design(t)
        return pa.table(
            {
                "key": pa.array(key, type=pa.int64()),
                "y": pa.array(yy, type=pa.int64()),
                "x1": pa.array(x1, type=pa.int64()),
                "x2": pa.array(x2, type=pa.int64()),
                "x3": pa.array(x3, type=pa.int64()),
                "shard": pa.array(key % shards, type=pa.int64()),
            }
        )

    def train_shard(g: pa.Table) -> pa.Table:
        # the fixture's (orderkey, linenumber) is NOT unique: order by
        # the FULL row tuple so ties are only between identical rows
        # (whose processing order cannot change the weights)
        order = np.lexsort(
            (g["y"].to_numpy(), g["x3"].to_numpy(), g["x2"].to_numpy(), g["x1"].to_numpy(), g["key"].to_numpy())
        )
        y = g["y"].to_numpy()[order]
        X = np.column_stack(
            [np.ones(len(y), dtype=np.int64)]
            + [g[c].to_numpy()[order] for c in ("x1", "x2", "x3")]
        )
        w = np.zeros(4, dtype=np.int64)
        for i in range(len(y)):
            if int(y[i]) * int(X[i] @ w) <= 0:
                w = w + y[i] * X[i]
        return pa.table(
            {
                "shard": pa.array([int(g["shard"][0].as_py())], type=pa.int64()),
                "n": pa.array([len(y)], type=pa.int64()),
                **{f"w{j}": pa.array([int(w[j])], type=pa.int64()) for j in range(4)},
            }
        )

    tagged = ds.map_batches(shard_tag, batch_format="pyarrow").materialize()
    local = (
        tagged.groupby("shard").map_groups(train_shard, batch_format="pyarrow").to_pandas()  # bounded: fixed shard count of per-shard parameter rows
    )
    n_rows = int(local["n"].sum())
    # fixed-point average: floor(sum(w_s) * FP / shards)
    w_fp = np.array(
        [int(local[f"w{j}"].sum()) * int(PERC_FP) // len(local) for j in range(4)], dtype=np.int64
    )

    def score(t: pa.Table) -> pa.Table:
        _, yy, x1, x2, x3 = design(t)
        z = (
            w_fp[0]
            + w_fp[1] * x1
            + w_fp[2] * x2
            + w_fp[3] * x3
        )
        pred = np.where(z > 0, 1, -1)
        return pa.table(
            {
                "_g": pa.array([0], type=pa.int64()),
                "correct": pa.array([int((pred == yy).sum())], type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(score, batch_format="pyarrow").groupby("_g")
        .aggregate(Sum("correct", alias_name="correct")).to_pandas()  # bounded: single-group accuracy row
    )
    acc = int(agg["correct"][0]) / n_rows
    return rd.from_arrow(
        pa.table(
            {
                "n_shards": pa.array([len(local)], type=pa.int64()),
                "n_rows": pa.array([n_rows], type=pa.int64()),
                **{
                    f"w{j}": pa.array(
                        duckdb_round(np.array([w_fp[j] / float(PERC_FP)]), 6), type=pa.float64()
                    )
                    for j in range(4)
                },
                "accuracy": pa.array(duckdb_round(np.array([acc]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# simpsons_paradox (aggregate-vs-stratified slope-sign reversal audit)
# ---------------------------------------------------------------------------


def simpsons_paradox(sf_dir: str) -> rd.Dataset:
    """Simpson's-paradox screen on the discount -> quantity relation:
    does the GLOBAL regression slope sign disagree with the
    per-brand (stratified) slopes?  The classic aggregation trap —
    a mixture of brands can reverse a within-brand trend — reported
    as the per-brand sign table plus reversal counts.

    Exactness: an OLS slope's SIGN is the sign of the integer
    numerator  n·Σxy − Σx·Σy  — no division, no floats anywhere: the
    audit is EXACT end to end (ties: numerator 0 = 'flat').

    Scale shape: the discount_elasticity exchange (brand-keyed
    six-sum moment reduce, dims joined once); global sums fold from
    the same partials; the sign table is brand-bounded.  Output:
    (p_brand, n, slope_num_sign, global_sign, reversed).
    """
    from ..stages.common import safe_join

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_discount", "l_quantity"],
    )
    pt = rd.read_parquet(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"])
    j = safe_join(li, pt, join_type="inner", num_partitions=8, on=("l_partkey",), right_on=("p_partkey",))

    def partial(t: pa.Table) -> pa.Table:
        d = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        q = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        br = t["p_brand"].to_numpy(zero_copy_only=False)
        order = np.argsort(br, kind="stable")
        br, d, q = br[order], d[order], q[order]
        bounds = np.nonzero(br[1:] != br[:-1])[0] + 1
        starts = np.concatenate([[0], bounds])
        red = lambda v: np.add.reduceat(v, starts)  # noqa: E731
        ones = np.ones(len(br), dtype=np.int64)
        return pa.table(
            {
                "p_brand": pa.array(br[starts], type=pa.string()),
                "n": pa.array(red(ones), type=pa.int64()),
                "sx": pa.array(red(d), type=pa.int64()),
                "sy": pa.array(red(q), type=pa.int64()),
                "sxy": pa.array(red(d * q), type=pa.int64()),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxy")])
        .to_pandas()
    )
    num = agg["n"].astype(object) * agg["sxy"].astype(object) - agg["sx"].astype(object) * agg["sy"].astype(object)
    sign = np.array([0 if v == 0 else (1 if v > 0 else -1) for v in num], dtype=np.int64)
    gn = int(agg["n"].sum())
    gx = int(agg["sx"].sum())
    gy = int(agg["sy"].sum())
    gxy = int(agg["sxy"].sum())
    gnum = gn * gxy - gx * gy
    gsign = 0 if gnum == 0 else (1 if gnum > 0 else -1)
    rev = (sign != 0) & (sign != gsign)
    out = pd.DataFrame(
        {
            "p_brand": agg["p_brand"],
            "n": agg["n"].astype(np.int64),
            "slope_num_sign": sign,
            "global_sign": np.full(len(agg), gsign, dtype=np.int64),
            "reversed": rev.astype(np.int64),
        }
    ).sort_values("p_brand")
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


# ---------------------------------------------------------------------------
# als_factorization (alternating least squares on the user x type matrix)
# ---------------------------------------------------------------------------

ALS_K = 2
ALS_ITERS = 10
ALS_REG = 0.1
ALS_FP = np.int64(1) << np.int64(30)


def _als_user_solve(rmat: np.ndarray, V: np.ndarray, reg: float) -> np.ndarray:
    """Closed-form user factors for a dense block of rating rows:
    U = R V (V'V + reg I)^-1 — one small solve shared by every user
    (the per-user Gram is identical when all items are observed,
    which the dense count matrix guarantees)."""
    k = V.shape[1]
    G = V.T @ V + reg * np.eye(k)
    return rmat @ V @ np.linalg.inv(G)


def als_factorization(sf_dir: str, k: int = ALS_K, iters: int = ALS_ITERS) -> rd.Dataset:
    """ALS matrix factorization of the user x event-type count matrix
    — the collaborative-filtering canon (Koren/Hu-Koren-Volinsky) in
    its DISTRIBUTED topology: item factors broadcast, user factors
    solved row-locally in closed form (map-only), item-side normal
    equations re-assembled from an order-proof quantized reduce.  The
    FOURTH training topology in the repo (closed-form / global-pass /
    parameter-averaging / alternating).

    Determinism: the rating matrix is exact int64 counts; V inits
    from a fixed integer ramp; per-user float solves are elementwise
    (batching-independent); the V-step partials (U'U, U'R per type)
    quantize to 2^-30 per user BEFORE the merge-order-dependent sum.

    Scale shape: ONE (user, type) count shuffle builds the matrix;
    each iteration = one map pass (user solves + quantized partials)
    + one 5·(k²+k)-int64 reduce; users never leave their shards.

    Output: per type (event_type, v0, v1) + one summary row
    (event_type='__rmse__', v0=rmse, v1=iters).
    """
    from ray.data.aggregate import Count as AggCount

    from ..stages.common import duckdb_round

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(),
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            }
        ).groupby(["user_id", "event_type"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "user_id": pa.array(df["user_id"].to_numpy().astype(np.int64), type=pa.int64()),
                "event_type": pa.array(df["event_type"], type=pa.string()),
                "n": pa.array(df["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    counts = (
        ev.map_batches(cpart, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    types = sorted(
        counts.groupby("event_type").aggregate(AggCount(alias_name="_c")).to_pandas()["event_type"]  # bounded: event-type vocabulary
    )
    tidx = {t: i for i, t in enumerate(types)}
    T = len(types)
    V = ((np.arange(T)[:, None] + 1) * (np.arange(k)[None, :] + 1)).astype(np.float64) / 10.0
    fp = float(ALS_FP)
    n_users = None
    rmse = 0.0
    for _ in range(iters):
        def vstep(t: pa.Table, V=V.copy()) -> pa.Table:
            df = pd.DataFrame(
                {
                    "u": t["user_id"].to_numpy(),
                    "ti": [tidx[x] for x in t["event_type"].to_pylist()],
                    "n": t["n"].to_numpy(),
                }
            )
            piv = df.pivot_table(index="u", columns="ti", values="n", fill_value=0, aggfunc="sum")
            rmat = np.zeros((len(piv), T), dtype=np.float64)
            rmat[:, piv.columns.to_numpy()] = piv.to_numpy(dtype=np.float64)
            U = _als_user_solve(rmat, V, ALS_REG)
            q = lambda v: np.floor(v * fp + 0.5).astype(np.int64)  # noqa: E731
            cols = {"n_users": len(piv)}
            # per-user quantized partials: U'U (k x k) and U'R (k x T), SSE
            for a in range(k):
                for b in range(a, k):
                    cols[f"g{a}{b}"] = int(q(U[:, a] * U[:, b]).sum())
                for t2 in range(T):
                    cols[f"p{a}_{t2}"] = int(q(U[:, a] * rmat[:, t2]).sum())
            err = rmat - U @ V.T
            cols["sse"] = int(q(err * err).sum())
            return pa.table(
                {"_g": pa.array([0], type=pa.int64())}
                | {kk: pa.array([int(vv)], type=pa.int64()) for kk, vv in cols.items()}
            )

        keys = (
            ["n_users", "sse"]
            + [f"g{a}{b}" for a in range(k) for b in range(a, k)]
            + [f"p{a}_{t2}" for a in range(k) for t2 in range(T)]
        )
        # CAVEAT: a user's rows must co-locate for the pivot — shard by user
        agg = (
            counts.map_batches(
                lambda t: t.append_column(
                    "_shard", pa.array(t["user_id"].to_numpy() % 16, type=pa.int64())
                ),
                batch_format="pyarrow",
            )
            .groupby("_shard")
            .map_groups(vstep, batch_format="pyarrow")
            .groupby("_g")
            .aggregate(*[Sum(kk, alias_name=kk) for kk in keys])
            .to_pandas()  # bounded: single-group moment rows
        )
        s = {kk: int(agg[kk][0]) for kk in keys}
        n_users = s["n_users"]
        G = np.empty((k, k))
        for a in range(k):
            for b in range(a, k):
                G[a, b] = G[b, a] = s[f"g{a}{b}"] / fp
        P = np.array([[s[f"p{a}_{t2}"] / fp for t2 in range(T)] for a in range(k)])
        rmse = float(np.sqrt(s["sse"] / fp / (n_users * T)))
        V = np.linalg.solve(G + ALS_REG * np.eye(k), P).T
    rows_t = types + ["__rmse__"]
    v0 = list(V[:, 0]) + [rmse]
    v1 = list(V[:, 1]) + [float(iters)]
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(rows_t, type=pa.string()),
                "v0": pa.array(duckdb_round(np.array(v0), 6), type=pa.float64()),
                "v1": pa.array(duckdb_round(np.array(v1), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# jackknife_se (delete-one-shard variance of the mean)
# ---------------------------------------------------------------------------

JACK_SHARDS = 32


def jackknife_se(sf_dir: str, shards: int = JACK_SHARDS) -> rd.Dataset:
    """Delete-one-GROUP jackknife standard error of mean order value —
    the survey-statistics uncertainty estimate (delete-a-group
    jackknife, used by the Census and BLS) that needs only per-shard
    sums: SE² = (G-1)/G · Σ_g (θ_(g) − θ̄)², with θ_(g) the mean
    computed without shard g.  The deterministic sibling of
    bootstrap_ci: no replication weights, just the shard partition
    the data already has.

    Exactness: shard sums and counts are exact int64 (orderkey-hash
    sharding); every leave-one-out mean is a ratio of exact integers;
    the SE is one mirrored float expression.

    Scale shape: ONE shard-keyed (sum, count) reduce — G rows leave
    the data; the jackknife combination is O(G) driver math.
    Output: one row (n, mean_cents, se_cents, g).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy().astype(np.int64)
        cents = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        g = key % shards
        df = pd.DataFrame({"g": g, "c": cents}).groupby("g", sort=False).agg(
            s=("c", "sum"), n=("c", "size")
        ).reset_index()
        return pa.table(
            {
                "g": pa.array(df["g"].to_numpy().astype(np.int64), type=pa.int64()),
                "s": pa.array(df["s"].to_numpy().astype(np.int64), type=pa.int64()),
                "n": pa.array(df["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()  # bounded: fixed group count of moment rows
        .sort_values("g")
        .reset_index(drop=True)
    )
    S = int(agg["s"].sum())
    N = int(agg["n"].sum())
    G = len(agg)
    theta = S / N
    loo = (S - agg["s"].to_numpy().astype(np.float64)) / (N - agg["n"].to_numpy().astype(np.float64))
    theta_bar = loo.mean()
    se = np.sqrt((G - 1) / G * ((loo - theta_bar) ** 2).sum())
    return rd.from_arrow(
        pa.table(
            {
                "n": pa.array([N], type=pa.int64()),
                "mean_cents": pa.array(duckdb_round(np.array([theta]), 6), type=pa.float64()),
                "se_cents": pa.array(duckdb_round(np.array([se]), 6), type=pa.float64()),
                "g": pa.array([G], type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# capture_recapture (Chapman population estimate from two windows)
# ---------------------------------------------------------------------------

CR_SPLIT_US = 1705363200000000  # 2024-01-16, the fixture window midpoint


def capture_recapture(sf_dir: str, split_us: int = CR_SPLIT_US) -> rd.Dataset:
    """Capture-recapture estimate of the TOTAL user population from
    two observation windows (events before/after the split date):
    Chapman's bias-corrected Lincoln-Petersen
        N̂ = (n1+1)(n2+1)/(m+1) − 1
    — the ecology/epidemiology census trick that answers "how many
    users exist, including the ones we never saw?" from overlap alone
    (the behavioral sibling of Good-Turing's unseen-vocabulary mass).

    Exactness: n1, n2, m are exact distinct counts (two-level
    distinct reduce per window + an intersection via the same
    per-user flags — ONE user-keyed aggregate carries both flags);
    N̂ and the closed-form variance are mirrored float expressions.

    Scale shape: per-batch (user, window) flag combiner -> ONE
    user-keyed Max-fold -> three exact counts; O(1) driver math.
    Output: one row (n1, n2, m, n_hat, se_hat).
    """
    from ray.data.aggregate import Max as AggMax

    from ..stages.common import duckdb_round

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])

    def flags(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.int64)
        tus = t["ts"].cast(pa.int64()).to_numpy()
        early = (tus < split_us).astype(np.int64)
        late = 1 - early
        df = pd.DataFrame({"u": u, "a": early, "b": late}).groupby("u", sort=False).agg(
            a=("a", "max"), b=("b", "max")
        ).reset_index()
        return pa.table(
            {
                "u": pa.array(df["u"].to_numpy().astype(np.int64), type=pa.int64()),
                "a": pa.array(df["a"].to_numpy().astype(np.int64), type=pa.int64()),
                "b": pa.array(df["b"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    per_user = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("u")
        .aggregate(AggMax("a", alias_name="a"), AggMax("b", alias_name="b"))
    )

    def counts(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        return pa.table(
            {
                "_g": pa.array([0], type=pa.int64()),
                "n1": pa.array([int(a.sum())], type=pa.int64()),
                "n2": pa.array([int(b.sum())], type=pa.int64()),
                "m": pa.array([int((a & b).sum())], type=pa.int64()),
            }
        )

    agg = (
        per_user.map_batches(counts, batch_format="pyarrow").groupby("_g")
        .aggregate(*[Sum(c, alias_name=c) for c in ("n1", "n2", "m")]).to_pandas()  # bounded: single-group count rows
    )
    n1, n2, m = int(agg["n1"][0]), int(agg["n2"][0]), int(agg["m"][0])
    n_hat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    var = (n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m) / ((m + 1.0) ** 2 * (m + 2.0))
    return rd.from_arrow(
        pa.table(
            {
                "n1": pa.array([n1], type=pa.int64()),
                "n2": pa.array([n2], type=pa.int64()),
                "m": pa.array([m], type=pa.int64()),
                "n_hat": pa.array(duckdb_round(np.array([n_hat]), 6), type=pa.float64()),
                "se_hat": pa.array(duckdb_round(np.array([np.sqrt(var)]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# mediation_analysis (Baron-Kenny effect decomposition)
# ---------------------------------------------------------------------------


def mediation_analysis(sf_dir: str) -> rd.Dataset:
    """Baron-Kenny mediation decomposition of the discount -> revenue
    relation through quantity:  total = direct + indirect, with
        a  = slope(quantity ~ discount)
        (b, c') from revenue ~ discount + quantity
        indirect = a·b,  total = slope(revenue ~ discount)
    and the OLS identity  total = c' + a·b  holding EXACTLY (it is an
    algebraic property of least squares, not an approximation) — the
    causal-mechanism question ("does discounting move revenue by
    moving volume?") answered with three regressions that all reduce
    to the same ten exact integer sums.

    Scale shape: ONE map pass of ten int64 moment partials -> ONE
    global reduce -> driver Cramer solves; floats mirrored, rounded 6.
    Output: one row (n, a, b, c_prime, total, indirect).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        x = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        m = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        y = np.floor(t["l_extendedprice"].to_numpy() + 0.5).astype(np.int64)
        vals = {
            "n": len(x), "sx": x.sum(), "sm": m.sum(), "sy": y.sum(),
            "sxx": (x * x).sum(), "sxm": (x * m).sum(), "sxy": (x * y).sum(),
            "smm": (m * m).sum(), "smy": (m * y).sum(),
        }
        return pa.table(
            {"_g": pa.array([0], type=pa.int64())}
            | {k: pa.array([int(v)], type=pa.int64()) for k, v in vals.items()}
        )

    keys = ("n", "sx", "sm", "sy", "sxx", "sxm", "sxy", "smm", "smy")
    agg = (
        ds.map_batches(partial, batch_format="pyarrow").groupby("_g")
        .aggregate(*[Sum(k, alias_name=k) for k in keys]).to_pandas()  # bounded: single-group moment rows
    )
    n, sx, sm, sy, sxx, sxm, sxy, smm, smy = (int(agg[k][0]) for k in keys)
    # a = slope(M ~ X), total = slope(Y ~ X): exact integer numerators
    a = float(n * sxm - sx * sm) / float(n * sxx - sx * sx)
    total = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    # (b, c') from Y ~ 1 + X + M: 3x3 Cramer on exact ints
    det = (
        n * (sxx * smm - sxm * sxm)
        - sx * (sx * smm - sxm * sm)
        + sm * (sx * sxm - sxx * sm)
    )
    det_c = (
        n * (sxy * smm - sxm * smy)
        - sy * (sx * smm - sxm * sm)
        + sm * (sx * smy - sxy * sm)
    )
    det_b = (
        n * (sxx * smy - sxy * sxm)
        - sx * (sx * smy - sxy * sm)
        + sy * (sx * sxm - sxx * sm)
    )
    c_prime = float(det_c) / float(det)
    b = float(det_b) / float(det)
    indirect = a * b
    return rd.from_arrow(
        pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "a": pa.array(duckdb_round(np.array([a]), 6), type=pa.float64()),
                "b": pa.array(duckdb_round(np.array([b]), 6), type=pa.float64()),
                "c_prime": pa.array(duckdb_round(np.array([c_prime]), 6), type=pa.float64()),
                "total": pa.array(duckdb_round(np.array([total]), 6), type=pa.float64()),
                "indirect": pa.array(duckdb_round(np.array([indirect]), 6), type=pa.float64()),
            }
        )
    )
