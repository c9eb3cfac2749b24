"""Stream-shaped pipelines over the ``events`` table.

The reference is an unbounded element-at-a-time ETL with no event-time
windows (SURVEY.md §2.9); a training-data engine still needs them, so
these translate stream semantics to batch Datasets: the events log is
treated as a partitioned, timestamp-ordered table; windows become
groupby + vectorized in-group logic (ray_guide 'Streaming-shaped
workloads' pattern).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..stages.common import round_columns
from ..stages.common import safe_join

SESSION_GAP_MIN = 30


def _read_events(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def tumbling_window(sf_dir: str) -> rd.Dataset:
    """1-hour tumbling window counts + value sums per event_type."""
    ds = _read_events(sf_dir, ["ts", "event_type", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        return t.append_column("window_start", pc.floor_temporal(t["ts"], unit="hour"))

    out = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    return out.map_batches(functools.partial(round_columns, cols=("sum_value",), ndigits=4), batch_format="pyarrow")


def sessionize(sf_dir: str, gap_min: int = SESSION_GAP_MIN) -> rd.Dataset:
    """Session windows per user (gap > ``gap_min`` starts a new session).

    Partition by user (shuffle), order by ts within the group, cumulative
    gap count = session ordinal.  Emits one row per session with start
    timestamp and event count — SQL-mirrored via LAG + running SUM.
    """
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_min)
        sid = gap.cumsum().astype(np.int64) + 1
        out = (
            g.assign(session_id=sid)
            .groupby("session_id", as_index=False)
            .agg(session_start=("ts", "min"), session_end=("ts", "max"), n_events=("event_id", "count"))
        )
        out["user_id"] = g["user_id"].iloc[0]
        return out[["user_id", "session_id", "session_start", "session_end", "n_events"]]

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


ROLL_WINDOW = 3  # preceding rows in the per-user rolling frame
ROLL_FP = 1e6  # fixed-point scale for value sums (order-free int64)
ROLL_PARTS = 32


def rolling_window(sf_dir: str, window: int = ROLL_WINDOW, parts: int = ROLL_PARTS) -> rd.Dataset:
    """Per-event rolling sum/count over the user's last ``window``+1
    events (ROWS BETWEEN window PRECEDING AND CURRENT ROW).

    Values are fixed-pointed to int64 (``floor(v * 1e6 + 0.5)``) BEFORE
    windowing, so the frame sum is integer-exact and independent of
    evaluation order — the same trick trajectory path sums use; the SQL
    mirror applies the identical window over the identical fixed-point
    column.  The regroup is the coarse-partition run-scan (one task per
    ``user_id % parts`` slice), never one task per user.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        fp = np.floor(t["value"].to_numpy() * ROLL_FP + 0.5).astype(np.int64)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        t = t.drop_columns(["value"]).append_column("fp", pa.array(fp, type=pa.int64()))
        return t.append_column("part", pa.array(uid % parts, type=pa.int64()))

    def roll(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "w_sum_fp": pa.array([], type=pa.int64()),
                    "w_n": pa.array([], type=pa.int64()),
                }
            )
        fp = g["fp"].to_numpy()
        bounds = np.nonzero(np.diff(uid))[0] + 1
        starts = np.concatenate([[0], bounds])
        run_start = np.repeat(starts, np.diff(np.concatenate([starts, [n]])))
        lo = np.maximum(run_start, np.arange(n) - window)  # frame start per row
        csum = np.concatenate([[0], np.cumsum(fp)])
        w_sum = csum[np.arange(n) + 1] - csum[lo]
        w_n = np.arange(n) - lo + 1
        return pa.table(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "w_sum_fp": pa.array(w_sum, type=pa.int64()),
                "w_n": pa.array(w_n, type=pa.int64()),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow").groupby("part").map_groups(
        roll, batch_format="pyarrow"
    )


def event_type_rates(sf_dir: str) -> rd.Dataset:
    """Global per-type event counts and mean value (M10 counters analogue)."""
    ds = _read_events(sf_dir, ["event_type", "value"])
    out = ds.groupby("event_type").aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    return out.map_batches(functools.partial(round_columns, cols=("sum_value",), ndigits=4), batch_format="pyarrow")


def union_event_streams(sf_dir: str, types: tuple[str, str] = ("click", "view")) -> rd.Dataset:
    """D3 union: two filtered event streams recombined with ds.union,
    then aggregated (counts identical to a single IN-filter by
    construction — the SQL mirror)."""
    ds = _read_events(sf_dir, ["event_type", "value"])
    a = ds.filter(expr=f"event_type == '{types[0]}'")
    b = ds.filter(expr=f"event_type == '{types[1]}'")
    u = a.union(b)
    out = u.groupby("event_type").aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    return out.map_batches(functools.partial(round_columns, cols=("sum_value",), ndigits=4), batch_format="pyarrow")


def distinct_users(sf_dir: str) -> rd.Dataset:
    """Exact COUNT(DISTINCT user_id) (S8/A3 counter; one-row result)."""
    import pyarrow as pa
    import ray.data as _rd

    ds = _read_events(sf_dir, ["user_id"])
    n = len(ds.unique("user_id"))
    return _rd.from_arrow(pa.table({"n_users": pa.array([n], type=pa.int64())}))


def distinct_users_approx(sf_dir: str, k: int = 4096) -> rd.Dataset:
    """A4: KMV-sketch approximate distinct count, folded inside Ray's
    aggregation tree (stages.sketch.distinct_count_approx).  A KMV
    sketch is EXACT below saturation (fewer than k distinct values keep
    every hash), which makes this oracle-checkable against DuckDB's
    exact COUNT(DISTINCT) at the test scale factors; saturated-regime
    accuracy is pinned separately in tests."""
    import pyarrow as pa
    import ray.data as _rd

    from ..stages.sketch import distinct_count_approx

    ds = _read_events(sf_dir, ["user_id"])
    est = distinct_count_approx(ds, "user_id", k=k)
    return _rd.from_arrow(pa.table({"n_users_approx": pa.array([round(est, 1)], type=pa.float64())}))


def sliding_window(sf_dir: str, width_min: int = 60, slide_min: int = 30) -> rd.Dataset:
    """Sliding windows (width 60min, slide 30min): each event explodes
    into the width/slide windows covering it, then a tumbling-style
    aggregate per (window_start, event_type).  Window starts are
    epoch-grid-aligned integers -> timestamps stay exact across engines.
    """
    import numpy as np
    import pyarrow as pa

    ds = _read_events(sf_dir, ["ts", "event_type", "value"])
    n_windows = width_min // slide_min
    slide_us = slide_min * 60 * 1_000_000

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy()  # microseconds since epoch
        base = (ts // slide_us) * slide_us
        parts = []
        for k in range(n_windows):
            start = base - k * slide_us
            tt = t.drop_columns(["ts"]).append_column(
                "window_start", pa.array(start, type=pa.int64()).cast(pa.timestamp("us"))
            )
            parts.append(tt)
        return pa.concat_tables(parts)

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    return out.map_batches(functools.partial(round_columns, cols=("sum_value",), ndigits=4), batch_format="pyarrow")


SAMPLE_MULT = 2654435761  # Weyl multiplier (same family as fixtures.LON_MULT)
SAMPLE_MOD = 1 << 32


def sampled_event_stats(sf_dir: str, frac: float = 0.2) -> rd.Dataset:
    """§2.6 sampling: DETERMINISTIC hash sample -> per-type counts.

    keep iff (event_id * MULT) mod 2^32 < frac·2^32 — a content-keyed
    Bernoulli sample that is reproducible across engines, batch splits
    and cluster sizes (an engine-RNG ``random_sample`` gives a different
    sample per run/partitioning, which is both un-oracle-checkable and
    operationally worse at scale: re-runs of a resumable job would
    sample different rows).  SQL-mirrored exactly.
    """
    ds = _read_events(sf_dir, ["event_id", "event_type"])
    thresh = int(frac * SAMPLE_MOD)

    def samp(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        keep = (np.asarray(ids, np.int64) * SAMPLE_MULT) % SAMPLE_MOD < thresh
        return t.filter(pa.array(keep)).drop_columns(["event_id"])

    return ds.map_batches(samp, batch_format="pyarrow").groupby("event_type").aggregate(
        Count(alias_name="n_sampled")
    )


def late_event_stats(sf_dir: str, lag_min: int = 60, parts: int = 32) -> rd.Dataset:
    """Watermark semantics in batch form: an event is LATE iff its
    event time trails the running watermark (max event time seen over
    the arrival order so far, exclusive) by more than ``lag_min``.
    Arrival order = event_id (the log's append sequence).

    This is a DISTRIBUTED PREFIX-MAX scan — the pattern a streaming
    engine's watermark tracker needs in replay/backfill form:
      1. partition the arrival axis into ``parts`` contiguous ranges and
         aggregate each range's max event time (partial-aggregate
         shuffle, KB-sized);
      2. exclusive prefix-max over the 32-row partition table on the
         driver (broadcast back);
      3. one partition-grouped pass computes the within-range running
         max on top of its prefix base — no sequential global pass.
    Output: per event_type (n_events, n_late); SQL-mirrored with a
    windowed MAX OVER (ORDER BY event_id ROWS ... 1 PRECEDING).
    """
    from ray.data.aggregate import Max, Min

    ds = _read_events(sf_dir, ["event_id", "ts", "event_type"])
    # partition the ARRIVAL-ID VALUE RANGE (not the row count): works for
    # sparse / offset id spaces, and the prefix table stays `parts` rows
    # no matter how large the ids are
    id_stats = ds.aggregate(Min("event_id"), Max("event_id"))
    lo, hi = int(id_stats["min(event_id)"]), int(id_stats["max(event_id)"])
    span = max(1, -(-(hi - lo + 1) // parts))
    lag_us = lag_min * 60 * 1_000_000

    def add_part(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        t = t.append_column("part", pa.array(((np.asarray(eid, np.int64) - lo) // span), type=pa.int64()))
        return t.append_column("ts_us", t["ts"].cast(pa.int64()))

    # TWO consumers below (the max aggregate and the grouped scan):
    # materialize once, don't re-run the read+map DAG per consumer
    parted = ds.map_batches(add_part, batch_format="pyarrow").materialize()
    maxes = {r["part"]: r["max_ts"] for r in parted.groupby("part").aggregate(Max("ts_us", alias_name="max_ts")).take_all()}  # bounded: fixed partition count
    sentinel = np.iinfo(np.int64).min
    base = np.full(parts + 1, sentinel, dtype=np.int64)
    for p in range(parts):
        # chain through EMPTY partitions too — skipping them would drop
        # every earlier partition's maxima from the exclusive prefix
        base[p + 1] = max(base[p], maxes.get(p, sentinel))

    def flag_late(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort")
        ts = g["ts_us"].to_numpy()
        p = int(g["part"].iloc[0])
        running = np.maximum.accumulate(ts)
        wm = np.concatenate([[base[p]], running[:-1]])  # exclusive of the current row
        wm = np.maximum(wm, base[p])
        # ts + lag < wm (NOT ts < wm - lag: subtracting from the int64-min
        # "-inf" sentinel wraps around and marks the first event late)
        late = ts + lag_us < wm
        return pd.DataFrame({"event_type": g["event_type"].to_numpy(), "late": late.astype(np.int64)})

    flagged = parted.groupby("part").map_groups(flag_late, batch_format="pandas")
    return flagged.groupby("event_type").aggregate(
        Count(alias_name="n_events"), Sum("late", alias_name="n_late")
    )


def asof_join_purchases(sf_dir: str) -> rd.Dataset:
    """As-of join: each purchase event matched to the user's most recent
    click at-or-before it (ray_guide 'As-of / range join': sort within
    user partitions, pd.merge_asof per group).  Inner semantics —
    purchases with no prior click drop.  Ties (equal ts) break toward
    the larger click event_id; the gap travels as exact integer
    microseconds so the SQL mirror is bit-robust.
    """
    import numpy as np
    import pyarrow as pa

    ds = _read_events(sf_dir, ["user_id", "event_id", "event_type", "ts"])
    ds = ds.filter(expr="event_type == 'purchase' or event_type == 'click'")

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        c = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        if p.empty or c.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype=np.int64),
                    "purchase_event_id": pd.Series(dtype=np.int64),
                    "prior_click_event_id": pd.Series(dtype=np.int64),
                    "gap_us": pd.Series(dtype=np.int64),
                }
            )
        m = pd.merge_asof(
            p[["ts", "event_id"]],
            c[["ts", "event_id"]].rename(columns={"event_id": "click_id", "ts": "cts"}),
            left_on="ts",
            right_on="cts",
            direction="backward",
        )
        m = m.dropna(subset=["click_id"])
        return pd.DataFrame(
            {
                "user_id": np.full(len(m), g["user_id"].iloc[0], dtype=np.int64),
                "purchase_event_id": m["event_id"].astype(np.int64),
                "prior_click_event_id": m["click_id"].astype(np.int64),
                "gap_us": (m["ts"].values.astype("datetime64[us]").astype(np.int64) - m["cts"].values.astype("datetime64[us]").astype(np.int64)),
            }
        )

    return ds.groupby("user_id").map_groups(asof, batch_format="pandas")


CAMPAIGNS = [
    # (campaign_id, start_us, end_us) on the epoch grid — deterministic,
    # mirrored verbatim in the SQL oracle
    (1, "2024-01-03", "2024-01-06"),
    (2, "2024-01-05", "2024-01-09"),  # overlaps campaign 1
    (3, "2024-01-12", "2024-01-13"),
    (4, "2024-01-20", "2024-01-27"),
]


def range_join_campaigns(sf_dir: str) -> rd.Dataset:
    """Interval/range join: events ⋈ campaign windows ON ts in
    [start, end).  The campaign side is tiny -> broadcast as numpy
    bounds, each batch emits one row per (event, covering campaign)
    (overlapping windows fan out).  Counts + value sums per campaign.
    """
    import numpy as np
    import pyarrow as pa

    starts = np.array([np.datetime64(s, "us").astype(np.int64) for _, s, _ in CAMPAIGNS])
    ends = np.array([np.datetime64(e, "us").astype(np.int64) for _, _, e in CAMPAIGNS])
    cids = np.array([c for c, _, _ in CAMPAIGNS], dtype=np.int64)

    ds = _read_events(sf_dir, ["ts", "event_type", "value"])

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy()
        mask = (ts[:, None] >= starts[None, :]) & (ts[:, None] < ends[None, :])
        rows, camps = np.nonzero(mask)
        out = t.take(pa.array(rows))
        return out.append_column("campaign_id", pa.array(cids[camps], type=pa.int64()))

    joined = ds.map_batches(explode, batch_format="pyarrow")
    out = joined.groupby(["campaign_id", "event_type"]).aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="sum_value")
    )
    return out.map_batches(functools.partial(round_columns, cols=("sum_value",), ndigits=4), batch_format="pyarrow")


FUNNEL_STAGES = ("view", "click", "purchase")


def conversion_funnel(sf_dir: str, stages: tuple[str, ...] = FUNNEL_STAGES) -> rd.Dataset:
    """Ordered conversion funnel: per user, each stage must occur
    STRICTLY AFTER the previous stage's first qualifying event (ordering
    key = (ts, event_id), the engine-wide tiebreak).  Output one row per
    stage: (stage_idx, stage, n_users) — users whose journey reaches it.

    Shuffle shape: one user-key partition + per-group ordered scan (the
    sessionize contract); the result is a ``stages``-row table.  The SQL
    mirror chains row_number picks with the identical tuple comparison.
    """
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id", "event_type"])
    stage_list = list(stages)

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        reached = 0
        last_ts, last_id = None, None
        for stage in stage_list:
            sub = g[g["event_type"] == stage]
            if last_ts is not None:
                after = (sub["ts"] > last_ts) | ((sub["ts"] == last_ts) & (sub["event_id"] > last_id))
                sub = sub[after]
            if len(sub) == 0:
                break
            first = sub.iloc[0]
            last_ts, last_id = first["ts"], first["event_id"]
            reached += 1
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "reached": [np.int64(reached)]})

    per_user = ds.groupby("user_id").map_groups(funnel, batch_format="pandas")

    def to_stage_rows(t: pa.Table) -> pa.Table:
        r = t["reached"].to_numpy()
        # per-batch partial: count users at/above each stage depth
        counts = [(r >= i + 1).sum() for i in range(len(stage_list))]
        return pa.table(
            {
                "stage_idx": pa.array(np.arange(1, len(stage_list) + 1, dtype=np.int64)),
                "stage": pa.array(stage_list, type=pa.string()),
                "n_users": pa.array(np.asarray(counts, dtype=np.int64)),
            }
        )

    out = per_user.map_batches(to_stage_rows, batch_format="pyarrow")
    return out.groupby(["stage_idx", "stage"]).aggregate(Sum("n_users", alias_name="n_users"))


# ---------------------------------------------------------------------------
# latest_event_per_user (CDC upsert / snapshot compaction)
# ---------------------------------------------------------------------------


def latest_event_per_user(sf_dir: str) -> rd.Dataset:
    """Snapshot compaction: each user's LATEST event by (ts, event_id)
    — the upsert/CDC-merge operator every incremental table needs
    (events as a change stream, this as the merged current-state view).

    Scale shape: a per-batch argmax combiner collapses every batch to
    <= 1 row per user BEFORE the shuffle (the od_matrix first/last
    discipline), so the groupby moves users x batches rows; the final
    reduce reuses the same vectorized run-scan.  All-integer ordering
    keys: bit-exact.  Output: (user_id, ts, event_id, value).
    """
    import os as _os

    ds = rd.read_parquet(
        _os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def last_per_user(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "descending"), ("event_id", "descending")]
        )
        uid = t["user_id"].to_numpy()
        if len(uid) == 0:
            return t
        starts = np.concatenate([[0], np.nonzero(np.diff(uid))[0] + 1])
        return t.take(pa.array(starts))

    def add_part(t: pa.Table, parts: int = 32) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return t.append_column("part", pa.array(uid % parts, type=pa.int64()))

    def reduce_part(g: pa.Table) -> pa.Table:
        return last_per_user(g.drop_columns(["part"]))

    return (
        ds.map_batches(last_per_user, batch_format="pyarrow")  # map-side combiner
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")  # coarse regroup, not one task per user
        .map_groups(reduce_part, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# session_campaign_overlap (interval x interval join)
# ---------------------------------------------------------------------------


def session_campaign_overlap(sf_dir: str) -> rd.Dataset:
    """Interval-INTERVAL overlap join: user sessions (from the
    sessionizer) against campaign windows, attributing each session's
    overlap DURATION — the attribution operator one step past
    range_join_campaigns' point-in-interval shape.

    overlap_us = least(session_end, c_end) - greatest(session_start,
    c_start), kept where > 0 — exact int64 microseconds, so the per-
    campaign sum is order-free.  The campaign side broadcasts (tiny);
    sessions fan out at most |campaigns| ways.  Output: (campaign_id,
    n_sessions, total_overlap_us).
    """
    starts = np.array([np.datetime64(s, "us").astype(np.int64) for _, s, _ in CAMPAIGNS])
    ends = np.array([np.datetime64(e, "us").astype(np.int64) for _, _, e in CAMPAIGNS])
    cids = np.array([c for c, _, _ in CAMPAIGNS], dtype=np.int64)

    sessions = sessionize(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        s0 = t["session_start"].cast(pa.int64()).to_numpy()
        s1 = t["session_end"].cast(pa.int64()).to_numpy()
        ov = np.minimum(s1[:, None], ends[None, :]) - np.maximum(s0[:, None], starts[None, :])
        rows, camps = np.nonzero(ov > 0)
        return pa.table(
            {
                "campaign_id": pa.array(cids[camps], type=pa.int64()),
                "overlap_us": pa.array(ov[rows, camps].astype(np.int64), type=pa.int64()),
            }
        )

    return (
        sessions.map_batches(explode, batch_format="pyarrow")
        .groupby("campaign_id")
        .aggregate(Count(alias_name="n_sessions"), Sum("overlap_us", alias_name="total_overlap_us"))
        .sort("campaign_id")
    )


def window_distinct_users(sf_dir: str) -> rd.Dataset:
    """Distinct users per 1-hour tumbling window — windowed COUNT
    DISTINCT, the dedup-inside-a-window shape tumbling_window's plain
    counts don't exercise.  Two-level reduce: (window, user) distinct
    first (map-side combinable), then the per-window count — both
    key-bounded.  Output: (window_start, n_users)."""
    ds = _read_events(sf_dir, ["ts", "user_id"])

    def add_window(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": pc.floor_temporal(t["ts"], unit="hour"),
            "user_id": t["user_id"],
        })

    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["window_start", "user_id"])
        .aggregate(Count(alias_name="_n"))
        .groupby("window_start")
        .aggregate(Count(alias_name="n_users"))
        .sort("window_start")
    )


def hourly_gap_fill(sf_dir: str, event_type: str = "purchase") -> rd.Dataset:
    """Dense hourly series for one event type with ZERO-filled gaps —
    the resampling/densification step before any time-series model
    (sparse aggregates lie about quiet hours).  The aggregate is the
    tumbling combiner; the densification joins it against a generated
    hour grid spanning [min, max] (grid size is bounded by the time
    range, not the data — driver-side generate_series).
    Output: (window_start, n_events) for EVERY hour in range."""
    ds = _read_events(sf_dir, ["ts", "event_type"]).filter(expr=f"event_type == '{event_type}'")

    def hour_of(t: pa.Table) -> pa.Table:
        return pa.table({"window_start": pc.floor_temporal(t["ts"], unit="hour")})

    agg = (
        ds.map_batches(hour_of, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Count(alias_name="n_events"))
        .to_pandas()  # bounded: hours in range
    )
    lo, hi = agg["window_start"].min(), agg["window_start"].max()
    grid = pd.date_range(lo, hi, freq="1h")
    dense = (
        pd.DataFrame({"window_start": grid})
        .merge(agg, on="window_start", how="left")
        .fillna({"n_events": 0})
    )
    return pa.table(
        {
            "window_start": pa.array(dense["window_start"], type=pa.timestamp("us")),
            "n_events": pa.array(dense["n_events"].astype(np.int64), type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# SCD-2 validity intervals / recency-weighted value
# ---------------------------------------------------------------------------


def scd2_intervals(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Slowly-changing-dimension type-2 build: turn the per-user change
    stream into validity intervals — each event becomes a version row
    valid from its own timestamp until the user's NEXT event (the
    warehouse-side dual of ``latest_event_per_user``'s current-state
    snapshot; reference analogue: the upsert stores S9/S10 keep only
    the snapshot, this keeps full history).

    The open interval of each user's final version is closed with a
    far-future sentinel (2100-01-01) so the output column is
    non-nullable and the oracle compare is dtype-exact.  Ordering keys
    are all-integer (ts, event_id) — bit-exact across engines.

    Scale shape: the coarse-partition run-scan (``user_id % parts``
    groups, vectorized shift within each sorted slice) — one exchange,
    no per-user tasks, no window-function materialization.
    Output: (user_id, event_id, valid_from, valid_to, version).
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])
    sentinel = np.datetime64("2100-01-01", "us")

    def add_part(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return t.append_column("part", pa.array(uid % parts, type=pa.int64()))

    def build(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "event_id": pa.array([], type=pa.int64()),
                    "valid_from": pa.array([], type=pa.timestamp("us")),
                    "valid_to": pa.array([], type=pa.timestamp("us")),
                    "version": pa.array([], type=pa.int64()),
                }
            )
        ts = g["ts"].to_numpy()  # datetime64[us]
        valid_to = np.empty(n, dtype=ts.dtype)
        valid_to[:-1] = ts[1:]
        valid_to[-1] = sentinel
        # close the last version of every user run with the sentinel
        run_end = np.nonzero(np.diff(uid))[0]
        valid_to[run_end] = sentinel
        starts = np.concatenate([[0], run_end + 1])
        run_start = np.repeat(starts, np.diff(np.concatenate([starts, [n]])))
        version = np.arange(n, dtype=np.int64) - run_start + 1
        return pa.table(
            {
                "user_id": g["user_id"],
                "event_id": g["event_id"],
                "valid_from": pa.array(ts, type=pa.timestamp("us")),
                "valid_to": pa.array(valid_to, type=pa.timestamp("us")),
                "version": pa.array(version, type=pa.int64()),
            }
        )

    return ds.map_batches(add_part, batch_format="pyarrow").groupby("part").map_groups(
        build, batch_format="pyarrow"
    )


RECENCY_K = 16


def recency_weighted_value(sf_dir: str, k: int = RECENCY_K, parts: int = 32) -> rd.Dataset:
    """Per-user exponentially-weighted recent value (truncated binary
    EWMA): over each user's last ``k`` events by (ts, event_id), weight
    the i-th most recent by 2^(k-i) and normalize — the streaming
    feature-store aggregate (recent-activity score) expressed exactly.

    Exactness: values are fixed-pointed to int64 cents, weights are
    exact powers of two, so the weighted sum is integer math in any
    order; the single normalization ``ws / denom / 100.0`` is the one
    float expression, mirrored verbatim in the SQL oracle (numerator
    and denominator both < 2^53, so the int64→float64 casts are exact).

    Scale shape: a per-batch top-k combiner first collapses every batch
    to ≤ k rows per user, then the coarse-partition run-scan reduces —
    the groupby moves users × batches × k rows, never the raw stream.
    Output: (user_id, n_recent, rw_value).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def topk_local(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "descending"), ("event_id", "descending")]
        )
        uid = t["user_id"].to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "ts": pa.array([], type=pa.timestamp("us")),
                    "event_id": pa.array([], type=pa.int64()),
                    "cents": pa.array([], type=pa.int64()),
                    "part": pa.array([], type=pa.int64()),
                }
            )
        cents = duckdb_round(t["value"].to_numpy() * 100.0, 0).astype(np.int64)
        run_end = np.nonzero(np.diff(uid))[0]
        starts = np.concatenate([[0], run_end + 1])
        run_start = np.repeat(starts, np.diff(np.concatenate([starts, [n]])))
        rank = np.arange(n) - run_start  # 0 = newest within this batch's run
        keep = rank < k
        return pa.table(
            {
                "user_id": pa.array(uid[keep], type=pa.int64()),
                "ts": pa.array(t["ts"].to_numpy()[keep], type=pa.timestamp("us")),
                "event_id": pa.array(t["event_id"].to_numpy()[keep], type=pa.int64()),
                "cents": pa.array(cents[keep], type=pa.int64()),
                "part": pa.array(np.asarray(uid[keep], np.int64) % parts, type=pa.int64()),
            }
        )

    def reduce_part(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [("user_id", "ascending"), ("ts", "descending"), ("event_id", "descending")]
        )
        uid = g["user_id"].to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "n_recent": pa.array([], type=pa.int64()),
                    "rw_value": pa.array([], type=pa.float64()),
                }
            )
        cents = g["cents"].to_numpy()
        run_end = np.nonzero(np.diff(uid))[0]
        starts = np.concatenate([[0], run_end + 1])
        lens = np.diff(np.concatenate([starts, [n]]))
        run_start = np.repeat(starts, lens)
        rank = np.arange(n) - run_start  # 0 = newest
        keep = rank < k
        w = np.zeros(n, dtype=np.int64)
        w[keep] = np.int64(1) << (k - 1 - rank[keep])
        ws = np.add.reduceat(w * cents, starts)
        m = np.minimum(lens, k).astype(np.int64)
        denom = (np.int64(1) << k) - (np.int64(1) << (k - m))
        rw = ws.astype(np.float64) / denom.astype(np.float64) / 100.0
        return pa.table(
            {
                "user_id": pa.array(uid[starts], type=pa.int64()),
                "n_recent": pa.array(m, type=pa.int64()),
                "rw_value": pa.array(rw, type=pa.float64()),
            }
        )

    return ds.map_batches(topk_local, batch_format="pyarrow").groupby("part").map_groups(
        reduce_part, batch_format="pyarrow"
    )


WEEK_US = 7 * 24 * 3600 * 1_000_000


def user_retention(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Cohort retention triangle: users are cohorted by the week of
    their FIRST event; for every (cohort_week, week_offset) the output
    counts how many of that cohort were active offset weeks later —
    the product-analytics staple, and the canonical two-level
    'per-entity anchor then re-aggregate' shape.

    All arithmetic is integer (epoch_us // week): bit-exact.

    Scale shape: a per-batch (user, week) dedup combiner collapses each
    batch before the single user-keyed exchange; the per-user anchor
    (min week) and the offset fan-out happen in the coarse-partition
    run-scan, whose output partials are (cohort, offset)-bounded —
    the second groupby moves cohort × offset rows, never users.
    Output: (cohort_week, week_offset, n_users).
    """
    ds = _read_events(sf_dir, ["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        wk = t["ts"].to_numpy().astype(np.int64) // WEEK_US
        key = np.stack([uid, wk], axis=1)
        key = np.unique(key, axis=0)  # per-batch (user, week) dedup
        return pa.table(
            {
                "user_id": pa.array(key[:, 0], type=pa.int64()),
                "wk": pa.array(key[:, 1], type=pa.int64()),
                "part": pa.array(key[:, 0] % parts, type=pa.int64()),
            }
        )

    def cohort_offsets(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("wk", "ascending")])
        uid = g["user_id"].to_numpy()
        wk = g["wk"].to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "cohort_week": pa.array([], type=pa.int64()),
                    "week_offset": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        # dedup across batches, then anchor each user at its min week
        key = np.stack([uid, wk], axis=1)
        key = np.unique(key, axis=0)
        uid, wk = key[:, 0], key[:, 1]
        starts = np.concatenate([[0], np.nonzero(np.diff(uid))[0] + 1])
        lens = np.diff(np.concatenate([starts, [len(uid)]]))
        cohort = np.repeat(wk[starts], lens)
        off = wk - cohort
        pair = np.stack([cohort, off], axis=1)
        upair, cnt = np.unique(pair, axis=0, return_counts=True)
        return pa.table(
            {
                "cohort_week": pa.array(upair[:, 0], type=pa.int64()),
                "week_offset": pa.array(upair[:, 1], type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(cohort_offsets, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
        .sort(["cohort_week", "week_offset"])
    )


EVENT_DEDUP_GAP_S = 300  # duplicate-suppression window (seconds)


def event_dedup(sf_dir: str, gap_s: int = EVENT_DEDUP_GAP_S, parts: int = 32) -> rd.Dataset:
    """Streaming idempotency filter: drop an event if the SAME
    (user, type, value) occurred within ``gap_s`` seconds before it —
    the at-least-once-delivery dedup every event pipeline runs ahead of
    aggregation (the reference's streams assume Kafka redelivery;
    SURVEY §2.9 maps that concern here).

    Semantics: raw-predecessor rule (compare to the previous RAW event
    of the key, kept or not) — exactly SQL LAG, so the oracle mirrors
    it with one window function.  Values are keyed as int64 cents; all
    comparisons integer µs.

    Scale shape: the coarse-partition run-scan keyed by user (the key's
    leading column), vectorized LAG within each sorted slice — one
    exchange.  Output: kept (event_id, user_id, ts, event_type, value).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])

    def add_part(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        cents = duckdb_round(t["value"].to_numpy() * 100.0, 0).astype(np.int64)
        t = t.append_column("cents", pa.array(cents, type=pa.int64()))
        return t.append_column("part", pa.array(uid % parts, type=pa.int64()))

    def keep_first(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [
                ("user_id", "ascending"),
                ("event_type", "ascending"),
                ("cents", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        n = g.num_rows
        if n == 0:
            return g.drop_columns(["part", "cents"])
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy()
        ts = g["ts"].to_numpy().astype(np.int64)
        same_key = np.zeros(n, dtype=bool)
        same_key[1:] = (uid[1:] == uid[:-1]) & (cents[1:] == cents[:-1]) & (et[1:] == et[:-1])
        lag_gap = np.full(n, np.iinfo(np.int64).max)
        lag_gap[1:] = ts[1:] - ts[:-1]
        keep = ~(same_key & (lag_gap <= gap_s * 1_000_000))
        return g.filter(pa.array(keep)).drop_columns(["part", "cents"])

    return ds.map_batches(add_part, batch_format="pyarrow").groupby("part").map_groups(
        keep_first, batch_format="pyarrow"
    )


SEQ_PATTERN = ("view", "click", "purchase")


def sequence_pattern_counts(sf_dir: str, pattern: tuple[str, ...] = SEQ_PATTERN, parts: int = 32) -> rd.Dataset:
    """MATCH_RECOGNIZE-style STRICT sequence detection: count, per
    user, occurrences of the exact CONSECUTIVE event-type pattern
    (view → click → purchase with nothing in between) — stricter than
    conversion_funnel's eventually-ordered stages; the per-user
    behavioral-motif counter (overlapping matches count).

    Scale shape: the coarse-partition run-scan; the match test is a
    vectorized triple-shift equality, all-integer ordering keys.
    Output: (user_id, n_matches) for users with ≥ 1 match.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    L = len(pattern)

    def add_part(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return t.append_column("part", pa.array(uid % parts, type=pa.int64()))

    def count_matches(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        n = len(uid)
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "n_matches": pa.array([], type=pa.int64()),
            }
        )
        if n < L:
            return empty
        et = g["event_type"].to_numpy(zero_copy_only=False)
        ok = np.ones(n - L + 1, dtype=bool)
        for j, p in enumerate(pattern):
            ok &= et[j : n - L + 1 + j] == p
        ok &= uid[: n - L + 1] == uid[L - 1 :]  # whole window inside one user run
        if not ok.any():
            return empty
        u = uid[: n - L + 1][ok]
        uu, cnt = np.unique(u, return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(uu, type=pa.int64()),
                "n_matches": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    return ds.map_batches(add_part, batch_format="pyarrow").groupby("part").map_groups(
        count_matches, batch_format="pyarrow"
    )


def ohlc_hourly(sf_dir: str) -> rd.Dataset:
    """OHLC resampling: per hour, the OPEN (first value by (ts,
    event_id)), HIGH, LOW and CLOSE (last value) of the event value
    stream in int64 cents — the bar-building resample every time-series
    store runs, expressed with the od_matrix first/last discipline.

    Scale shape: each batch collapses to ≤ 1 candidate row per hour
    map-side (first/last picked by all-integer lexicographic order,
    min/max/count folded), so the hour-keyed exchange moves hours ×
    batches rows; the final reduce replays the same selection.
    Output: (hour_start, open_c, high_c, low_c, close_c, n_events).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id", "ts", "value"])
    HOUR_US = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy().astype(np.int64)
        eid = t["event_id"].to_numpy().astype(np.int64)
        cents = duckdb_round(t["value"].to_numpy() * 100.0, 0).astype(np.int64)
        hour = ts // HOUR_US * HOUR_US
        order = np.lexsort((eid, ts, hour))  # hour runs, (ts, event_id) within
        hour, ts, eid, cents = hour[order], ts[order], eid[order], cents[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(hour))[0] + 1])
        ends = np.concatenate([starts[1:], [len(hour)]]) - 1
        mx = np.maximum.reduceat(cents, starts)
        mn = np.minimum.reduceat(cents, starts)
        cnt = (ends - starts + 1).astype(np.int64)
        return pa.table(
            {
                "hour_us": pa.array(hour[starts], type=pa.int64()),
                "o_ts": pa.array(ts[starts], type=pa.int64()),
                "o_eid": pa.array(eid[starts], type=pa.int64()),
                "open_c": pa.array(cents[starts], type=pa.int64()),
                "c_ts": pa.array(ts[ends], type=pa.int64()),
                "c_eid": pa.array(eid[ends], type=pa.int64()),
                "close_c": pa.array(cents[ends], type=pa.int64()),
                "high_c": pa.array(mx, type=pa.int64()),
                "low_c": pa.array(mn, type=pa.int64()),
                "n": pa.array(cnt, type=pa.int64()),
            }
        )

    def reduce_hour(g: pa.Table) -> pa.Table:
        o = np.lexsort((g["o_eid"].to_numpy(), g["o_ts"].to_numpy()))[0]
        c = np.lexsort((-g["c_eid"].to_numpy(), -g["c_ts"].to_numpy()))[0]
        return pa.table(
            {
                "hour_start": pa.array(
                    [g["hour_us"][0].as_py()], type=pa.int64()
                ).cast(pa.timestamp("us")),
                "open_c": pa.array([g["open_c"][o].as_py()], type=pa.int64()),
                "high_c": pa.array([int(np.max(g["high_c"].to_numpy()))], type=pa.int64()),
                "low_c": pa.array([int(np.min(g["low_c"].to_numpy()))], type=pa.int64()),
                "close_c": pa.array([g["close_c"][c].as_py()], type=pa.int64()),
                "n_events": pa.array([int(g["n"].to_numpy().sum())], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour_us")
        .map_groups(reduce_hour, batch_format="pyarrow")
        .sort("hour_start")
    )


ROWNUM_BIN_US = 3_600_000_000  # hour bins for the rank-offset histogram


def global_row_numbers(sf_dir: str) -> rd.Dataset:
    """Distributed zipWithIndex: assign every event its GLOBAL dense
    row number under (ts, event_id) order — the contiguous-id
    assignment (shard-local sample indices, deterministic row ids for
    a training manifest) that Ray Data has no primitive for, built
    WITHOUT a driver bottleneck.

    Two passes: (1) a per-batch histogram over coarse time bins →
    one bins-sized aggregate whose cumulative sums become per-bin rank
    OFFSETS (broadcast, tiny); (2) a bin-keyed regroup sorts each bin
    locally and adds its offset — rank = offset(bin) + local position.
    All-integer; bit-equal to SQL ROW_NUMBER.

    Scale shape: the only exchange is the bin-keyed regroup (bins are
    time-bounded, each holds ~n/bins rows); nothing global ever sorts.
    Output: (event_id, rn).
    """
    ds = _read_events(sf_dir, ["event_id", "ts"])

    def hist(t: pa.Table) -> pa.Table:
        b = t["ts"].to_numpy().astype(np.int64) // ROWNUM_BIN_US
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(ub, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    bins = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bin")
    )
    offs = dict(zip(bins["bin"].astype(np.int64), np.concatenate([[0], np.cumsum(bins["n"].to_numpy())[:-1]])))

    def tag(t: pa.Table) -> pa.Table:
        b = t["ts"].to_numpy().astype(np.int64) // ROWNUM_BIN_US
        return t.append_column("bin", pa.array(b, type=pa.int64()))

    def number(g: pa.Table) -> pa.Table:
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        if g.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], type=pa.int64()), "rn": pa.array([], type=pa.int64())}
            )
        base = int(offs[int(g["bin"][0].as_py())])
        rn = base + 1 + np.arange(g.num_rows, dtype=np.int64)
        return pa.table({"event_id": g["event_id"], "rn": pa.array(rn, type=pa.int64())})

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bin")
        .map_groups(number, batch_format="pyarrow")
        .sort("rn")
    )


def event_trigram_counts(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Behavioral motif census: counts of every CONSECUTIVE event-type
    trigram per user stream (the full 5³ alphabet of
    sequence_pattern_counts' single pattern) — the n-gram language
    model of user behavior that sessionization dashboards rank.

    Scale shape: run-scan emits per-batch (t0, t1, t2) combiner counts;
    the groupby moves ≤ |alphabet|³ rows per partition.
    Output: (t0, t1, t2, n) sorted.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def add_part(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return t.append_column("part", pa.array(uid % parts, type=pa.int64()))

    def count_tris(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        n = len(uid)
        empty = pa.table(
            {
                "t0": pa.array([], type=pa.string()),
                "t1": pa.array([], type=pa.string()),
                "t2": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        if n < 3:
            return empty
        et = g["event_type"].to_numpy(zero_copy_only=False)
        ok = uid[:-2] == uid[2:]
        if not ok.any():
            return empty
        tri = np.char.add(np.char.add(np.char.add(et[:-2][ok].astype("U16"), "|"), np.char.add(et[1:-1][ok].astype("U16"), "|")), et[2:][ok].astype("U16"))
        ut, cnt = np.unique(tri, return_counts=True)
        sp = np.char.split(ut, "|")
        return pa.table(
            {
                "t0": pa.array([x[0] for x in sp], type=pa.string()),
                "t1": pa.array([x[1] for x in sp], type=pa.string()),
                "t2": pa.array([x[2] for x in sp], type=pa.string()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_tris, batch_format="pyarrow")
        .groupby(["t0", "t1", "t2"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["t0", "t1", "t2"])
    )


WSAMPLE_K = 100


def weighted_sample(sf_dir: str, k: int = WSAMPLE_K) -> rd.Dataset:
    """Deterministic weighted sampling (Efraimidis–Spirakis A-Res with
    hash-derived uniforms): select the k events with the smallest
    −ln(u)/w keys, where u is the id-keyed LCG uniform and w the event
    value — importance sampling with inclusion probability ∝ weight,
    reproducible under ANY partitioning (the key is a pure row
    function; no RNG state).

    Scale shape: key computation is map-side; selection is a per-batch
    local top-k prune + one k-bounded final sort-limit (candidate rows
    reaching the reduce = k × batches).
    Output: (event_id, value, skey) ordered by skey asc.
    """
    from ..pipelines.trajectory import sample_u
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id", "value"])

    def keys(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy().astype(np.int64)
        u = sample_u(ids)
        w = t["value"].to_numpy(zero_copy_only=False)
        ok = (w > 0) & (u > 0)
        skey = -np.log(u[ok]) / w[ok]
        out = pa.table(
            {
                "event_id": pa.array(ids[ok], type=pa.int64()),
                "value": pa.array(w[ok], type=pa.float64()),
                "skey": pa.array(skey, type=pa.float64()),
            }
        )
        if out.num_rows > k:  # local prune: global top-k ⊆ union of local top-k
            order = np.lexsort((ids[ok], skey))[:k]
            out = out.take(pa.array(order))
        return out

    picked = ds.map_batches(keys, batch_format="pyarrow").sort(["skey", "event_id"]).limit(k)

    def round_key(t: pa.Table) -> pa.Table:
        sk = duckdb_round(t["skey"].to_numpy(), 9)
        return t.drop_columns(["skey"]).append_column("skey", pa.array(sk, type=pa.float64()))

    return picked.map_batches(round_key, batch_format="pyarrow")


def daily_cusum(sf_dir: str) -> rd.Dataset:
    """Change-point MONITORING over the event stream: the CUSUM of
    daily event counts against the uniform-rate expectation, ALL
    INTEGER — with daily counts x_d, D days and total T, the statistic

        S_d = Σ_{i<=d} (x_i · D − T)        (scaled by D to stay integer)

    crosses its extremum at the most likely rate change point.  Flags
    the argmax |S_d| row — the drift alarm a pipeline puts on ingest
    volume.

    Scale shape: per-batch daily-count combiner -> ONE day-bounded
    groupby; the cumulative scan runs on the D-row aggregate.

    Output: (day, n_events, cusum_scaled, is_peak).
    """
    from .hotspot import DAY_US

    ds = _read_events(sf_dir, ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].cast(pa.int64()).to_numpy() // DAY_US
        uniq, cnt = np.unique(day, return_counts=True)
        return pa.table(
            {
                "day": pa.array(uniq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n_events"))
        .to_pandas()  # day-bounded
        .sort_values("day")
        .reset_index(drop=True)
    )
    x = daily["n_events"].to_numpy().astype(np.int64)
    d_count = np.int64(len(x))
    total = np.int64(x.sum())
    s = np.cumsum(x * d_count - total)
    peak = int(np.argmax(np.abs(s)))
    return rd.from_arrow(
        pa.table(
            {
                "day": pa.array(daily["day"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_events": pa.array(x, type=pa.int64()),
                "cusum_scaled": pa.array(s.astype(np.int64), type=pa.int64()),
                "is_peak": pa.array(np.arange(len(x)) == peak, type=pa.bool_()),
            }
        )
    )


def distinct_users_hll(sf_dir: str, p: int = 12) -> rd.Dataset:
    """A4 (HLL variant): HyperLogLog distinct-user estimate beside the
    exact count and its relative error — the sketch-accuracy audit row
    (the KMV/ANN-recall/minhash-accuracy discipline applied to HLL).
    Registers fold in the aggregation tree (2^p bytes per block, max
    merge); the exact side is a user-keyed groupby count.  Oracle:
    golden recompute of the identical deterministic algorithm."""
    import numpy as np
    import pyarrow as pa
    import ray.data as _rd
    from ray.data.aggregate import Count

    from ..stages.sketch import distinct_count_hll

    ds = _read_events(sf_dir, ["user_id"])
    est = distinct_count_hll(ds, "user_id", p=p)
    n_exact = ds.groupby("user_id").aggregate(Count(alias_name="n")).count()
    rel = abs(est - n_exact) / n_exact
    return _rd.from_arrow(
        pa.table(
            {
                "n_users": pa.array([int(n_exact)], type=pa.int64()),
                "n_users_hll": pa.array([round(est, 1)], type=pa.float64()),
                "rel_err": pa.array([round(rel, 6)], type=pa.float64()),
            }
        )
    )


def seasonal_decompose(sf_dir: str) -> rd.Dataset:
    """Classical additive seasonal decomposition of the daily value
    series: trend = centered 7-day moving average (full windows only),
    seasonal = weekday mean of the detrended series, residual = rest —
    the anomaly-detection preprocessor (a spike is judged against
    trend+season, not the raw series; cf. daily_cusum's level-shift
    alarm).

    Values are fixed-pointed to cents BEFORE the daily sum (int64,
    order-free); the decomposition itself runs on the DAY-BOUNDED
    aggregate (30 rows here, years at most in practice) — the
    bounded-finalize discipline, not a corpus collect.  Day index and
    weekday are pure integer epoch-day arithmetic in both engines
    (``day_idx % 7`` — no locale weekday convention to mismatch).
    Assumes a gapless day series (ROWS frames == calendar windows);
    gap-filling is :func:`hourly_gap_fill`'s job upstream.
    """
    import pyarrow as pa

    ds = _read_events(sf_dir, ["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        tus = t["ts"].cast(pa.int64()).to_numpy()
        day = tus // 86_400_000_000
        cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table({"day_idx": pa.array(day, type=pa.int64()), "c": pa.array(cents, type=pa.int64())})

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day_idx")
        .aggregate(Sum("c", alias_name="x"))
        .to_pandas()
        .sort_values("day_idx")
        .reset_index(drop=True)
    )
    day = daily["day_idx"].to_numpy()
    x = daily["x"].to_numpy().astype(np.float64)
    n = len(day)
    rows = []
    trend = np.full(n, np.nan)
    for i in range(3, n - 3):
        trend[i] = x[i - 3 : i + 4].sum() / 7.0
    keep = ~np.isnan(trend)
    detr = x[keep] - trend[keep]
    wd = day[keep] % 7
    seasonal = np.empty(len(detr))
    for w in range(7):
        m = wd == w
        if m.any():
            seasonal[m] = detr[m].mean()
    return rd.from_arrow(
        pa.table(
            {
                "day_idx": pa.array(day[keep], type=pa.int64()),
                "x": pa.array(daily["x"].to_numpy()[keep], type=pa.int64()),
                "trend": pa.array(np.round(trend[keep], 6), type=pa.float64()),
                "seasonal": pa.array(np.round(seasonal, 6), type=pa.float64()),
                "resid": pa.array(np.round(detr - seasonal, 6), type=pa.float64()),
            }
        )
    )


def acf_hourly(sf_dir: str, max_lag: int = 24) -> rd.Dataset:
    """Autocorrelation function of the hourly event-count series at
    lags 1..24 — the periodicity detector that justifies (or refutes)
    seasonal_decompose's fixed weekly period choice.

    The series is densified over [min_hour, max_hour] (missing hours
    count 0 — ACF over a gappy index is meaningless), then the classic
    estimator r_k = sum_t (x_t - mean)(x_{t-k} - mean) / sum_t (x_t -
    mean)^2 is computed on EXACT integers: with S = sum(x) and nn =
    series length, nn*(x_t - mean) = x_t*nn - S is an integer, and r_k
    = sum(dx_t * dx_{t-k}) / sum(dx^2) with the nn^2 factors cancelling
    — both engines divide the same two int64s (headroom to ~3e18 at
    sf0.1; hi/lo-split the products beyond, cf. lineitem_corr_matrix).

    Scale shape: per-batch (hour, count) combiner -> hour-keyed groupby
    (bounded: hours in the observation window, ~720 here, ~10^5 for a
    decade) -> driver finalize on the bounded dense series.  Output:
    (lag, acf).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        h = t["ts"].cast(pa.int64()).to_numpy() // 3_600_000_000
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u, type=pa.int64()), "n": pa.array(c.astype(np.int64))})

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    h = hourly["h"].to_numpy().astype(np.int64)
    lo, hi = int(h.min()), int(h.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[h - lo] = hourly["n"].to_numpy().astype(np.int64)
    nn = np.int64(len(dense))
    s = np.int64(dense.sum())
    dx = dense * nn - s
    den = int((dx * dx).sum())
    lags = np.arange(1, max_lag + 1, dtype=np.int64)
    acf = np.empty(max_lag, dtype=np.float64)
    for idx, k in enumerate(lags):
        num = int((dx[k:] * dx[:-k]).sum())
        acf[idx] = float(num) / float(den)
    return rd.from_arrow(
        pa.table(
            {
                "lag": pa.array(lags, type=pa.int64()),
                "acf": pa.array(duckdb_round(acf, 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# time_to_convert (first signup -> first subsequent purchase per user)
# ---------------------------------------------------------------------------


def time_to_convert(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Conversion latency: for every user with a signup, the time from
    their FIRST signup to their FIRST purchase at-or-after it — the
    activation metric behind "median time to convert" dashboards, and
    the windowed-join shape (first event, then first qualifying event
    AFTER it) that plain groupby cannot express.

    Scale shape: the coarse-partition run-scan (user_id % parts) sorts
    each slice once by (user, ts, event_id) and walks it vectorized —
    first-signup and first-purchase-after are two searchsorted lookups
    per user run, no per-user tasks, no driver loop.  Only converting
    users emit a row.  Output: (user_id, signup_tus, purchase_tus,
    delta_s) with delta_s = (purchase − signup) // 1_000_000 integer
    seconds.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "signup") | (et == "purchase")
        return pa.table(
            {
                "user_id": pa.array(uid[keep], type=pa.int64()),
                "event_id": pa.array(t["event_id"].to_numpy()[keep], type=pa.int64()),
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy()[keep], type=pa.int64()),
                "is_signup": pa.array((et[keep] == "signup"), type=pa.bool_()),
                "part": pa.array(uid[keep] % parts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "signup_tus": pa.array([], type=pa.int64()),
            "purchase_tus": pa.array([], type=pa.int64()),
            "delta_s": pa.array([], type=pa.int64()),
        }
    )

    def convert(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        tus = g["tus"].to_numpy()
        sg = g["is_signup"].to_numpy(zero_copy_only=False)
        bounds = np.nonzero(np.diff(uid))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(uid)]])
        rows = {"user_id": [], "signup_tus": [], "purchase_tus": [], "delta_s": []}
        for s, e in zip(starts, ends):
            run_sg = sg[s:e]
            sg_idx = np.nonzero(run_sg)[0]
            if not len(sg_idx):
                continue
            t0 = tus[s + sg_idx[0]]
            pu_idx = np.nonzero(~run_sg & (tus[s:e] >= t0))[0]
            if not len(pu_idx):
                continue
            t1 = tus[s + pu_idx[0]]
            rows["user_id"].append(int(uid[s]))
            rows["signup_tus"].append(int(t0))
            rows["purchase_tus"].append(int(t1))
            rows["delta_s"].append(int((t1 - t0) // 1_000_000))
        if not rows["user_id"]:
            return empty
        return pa.table({k: pa.array(v, type=pa.int64()) for k, v in rows.items()})

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(convert, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# event_transition_lift (behavioral Markov lift matrix)
# ---------------------------------------------------------------------------


def event_transition_lift(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Per (prev_type → next_type) transition LIFT: observed
    consecutive-pair count over the independence expectation
    row_total·col_total/grand_total — the behavioral analogue of
    od_gravity's residual screen (lift ≫ 1 marks funnel edges, lift ≪ 1
    marks dead ends), computed over same-user consecutive events.

    Scale shape: coarse-partition run-scan emits per-slice (prev, next)
    combiner counts (alphabet²-bounded); marginals derive from the
    aggregated matrix itself (no second pass).  Output: (prev_type,
    next_type, n, expected, lift) — expected/lift are each ONE mirrored
    float expression over exact int64 counts.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "event_id": t["event_id"],
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy(), type=pa.int64()),
                "event_type": t["event_type"],
                "part": pa.array(uid % parts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "prev_type": pa.array([], type=pa.string()),
            "next_type": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        m = uid[1:] == uid[:-1]
        if not m.any():
            return empty
        import pandas as pd

        df = pd.DataFrame({"prev_type": et[:-1][m], "next_type": et[1:][m]})
        c = df.groupby(["prev_type", "next_type"], sort=True).size().reset_index(name="n")
        return pa.table(
            {
                "prev_type": pa.array(c["prev_type"], type=pa.string()),
                "next_type": pa.array(c["next_type"], type=pa.string()),
                "n": pa.array(c["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    mat = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    from ..stages.common import duckdb_round

    tot = float(mat["n"].sum())
    row = mat.groupby("prev_type")["n"].transform("sum").to_numpy().astype(np.float64)
    col = mat.groupby("next_type")["n"].transform("sum").to_numpy().astype(np.float64)
    n = mat["n"].to_numpy().astype(np.float64)
    expected = row * col / tot
    return rd.from_arrow(
        pa.table(
            {
                "prev_type": pa.array(mat["prev_type"], type=pa.string()),
                "next_type": pa.array(mat["next_type"], type=pa.string()),
                "n": pa.array(mat["n"].to_numpy().astype(np.int64), type=pa.int64()),
                "expected": pa.array(duckdb_round(expected, 6), type=pa.float64()),
                "lift": pa.array(duckdb_round(n / expected, 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# value_percent_rank (distributed PERCENT_RANK over the value column)
# ---------------------------------------------------------------------------

PCTR_BIN_CENTS = 500  # value-histogram bin width (5.00 units) for rank offsets


def value_percent_rank(sf_dir: str) -> rd.Dataset:
    """Distributed SQL PERCENT_RANK() over every event value:
    (rank − 1)/(n − 1) where rank = 1 + count of STRICTLY smaller
    values (ties share a rank) — the global-CDF position feature
    (outlier percentile, calibration) that needs a total order Ray
    Data has no primitive for, built with the global_row_numbers
    two-pass shape keyed by VALUE instead of time.

    Pass 1 histograms fixed-point cents into width-{bin} bins (one
    bins-sized aggregate → cumulative offsets = how many values sit in
    all lower bins).  Pass 2 regroups by bin and ranks locally: a
    value's strict-rank = bin offset + strictly-smaller count inside
    its bin (searchsorted on the bin's sorted cents).  Ties land in
    one bin by construction, so ranks are exact.  All-integer until
    the single mirrored division.

    Output: (event_id, cents, pct_rank).
    """
    ds = _read_events(sf_dir, ["event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "cents": pa.array(cents, type=pa.int64()),
                "bin": pa.array(cents // PCTR_BIN_CENTS, type=pa.int64()),
            }
        )

    tagged = ds.map_batches(prep, batch_format="pyarrow")

    def hist(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["bin"].to_numpy(), return_counts=True)
        return pa.table({"bin": pa.array(u, type=pa.int64()), "n": pa.array(c.astype(np.int64))})

    bins = (
        tagged.map_batches(hist, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: fixed histogram bins
        .sort_values("bin")
    )
    total = int(bins["n"].sum())
    offs = dict(
        zip(
            bins["bin"].astype(np.int64),
            np.concatenate([[0], np.cumsum(bins["n"].to_numpy(np.int64))[:-1]]),
        )
    )
    from ..stages.common import duckdb_round

    def rank(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "cents": pa.array([], type=pa.int64()),
                    "pct_rank": pa.array([], type=pa.float64()),
                }
            )
        cents = g["cents"].to_numpy()
        base = int(offs[int(g["bin"][0].as_py())])
        s = np.sort(cents)
        smaller = np.searchsorted(s, cents, side="left").astype(np.int64)
        pr = (base + smaller).astype(np.float64) / float(total - 1)
        return pa.table(
            {
                "event_id": g["event_id"],
                "cents": pa.array(cents, type=pa.int64()),
                "pct_rank": pa.array(duckdb_round(pr, 6), type=pa.float64()),
            }
        )

    return tagged.groupby("bin").map_groups(rank, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# kaplan_meier (conversion survival curve with right-censoring)
# ---------------------------------------------------------------------------


def kaplan_meier(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Kaplan-Meier survival curve of conversion latency: S(t) = Π_{tᵢ≤t}
    (1 − dᵢ/nᵢ) over hours-to-purchase, where users who signed up but
    never purchased are RIGHT-CENSORED at the end of observation — the
    statistically-honest "how long until users convert" curve
    (time_to_convert alone silently drops non-converters, biasing the
    distribution fast).

    Scale shape: the time_to_convert run-scan generalized to emit one
    (t_hours, event?) row per signed-up user (converted: purchase
    latency; censored: observation end − signup); an hour-keyed count
    reduce (observation-window-bounded) feeds the driver-side product,
    expressed as exp(cumsum(ln(1 − d/n))) so the float sequence is
    verbatim-mirrored by the SQL window.  Output: (t_hours, n_risk,
    n_events, survival) at each conversion time.
    """
    from ray.data.aggregate import Max

    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    te = int(
        ds.map_batches(
            lambda t: pa.table({"tus": pa.array([t["ts"].cast(pa.int64()).to_numpy().max()], type=pa.int64())}),
            batch_format="pyarrow",
        ).aggregate(Max("tus", alias_name="te"))["te"]
    )

    def prep(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "signup") | (et == "purchase")
        return pa.table(
            {
                "user_id": pa.array(uid[keep], type=pa.int64()),
                "event_id": pa.array(t["event_id"].to_numpy()[keep], type=pa.int64()),
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy()[keep], type=pa.int64()),
                "is_signup": pa.array((et[keep] == "signup"), type=pa.bool_()),
                "part": pa.array(uid[keep] % parts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "t": pa.array([], type=pa.int64()),
            "n_users": pa.array([], type=pa.int64()),
            "n_ev": pa.array([], type=pa.int64()),
        }
    )

    def outcomes(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        tus = g["tus"].to_numpy()
        sg = g["is_signup"].to_numpy(zero_copy_only=False)
        bounds = np.nonzero(np.diff(uid))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(uid)]])
        ts_, ev_ = [], []
        for s, e in zip(starts, ends):
            run_sg = sg[s:e]
            sg_idx = np.nonzero(run_sg)[0]
            if not len(sg_idx):
                continue
            t0 = tus[s + sg_idx[0]]
            pu_idx = np.nonzero(~run_sg & (tus[s:e] >= t0))[0]
            if len(pu_idx):
                ts_.append(int((tus[s + pu_idx[0]] - t0) // 3_600_000_000))
                ev_.append(1)
            else:
                ts_.append(int((te - t0) // 3_600_000_000))
                ev_.append(0)
        if not ts_:
            return empty
        import pandas as pd

        df = pd.DataFrame({"t": ts_, "ev": ev_})
        c = df.groupby("t").agg(n_users=("ev", "size"), n_ev=("ev", "sum")).reset_index()
        return pa.table(
            {
                "t": pa.array(c["t"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_users": pa.array(c["n_users"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_ev": pa.array(c["n_ev"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(outcomes, batch_format="pyarrow")
        .groupby("t")
        .aggregate(Sum("n_users", alias_name="n_users"), Sum("n_ev", alias_name="n_events"))
        .to_pandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    t = agg["t"].to_numpy().astype(np.int64)
    nu = agg["n_users"].to_numpy().astype(np.int64)
    ne = agg["n_events"].to_numpy().astype(np.int64)
    n_risk = nu[::-1].cumsum()[::-1]  # users with outcome time >= t
    keep = ne > 0
    d = ne[keep].astype(np.float64)
    n = n_risk[keep].astype(np.float64)
    # terminal exhaustion (d == n at the last event time) sends S to
    # exactly 0; guard the log so both engines emit 0.0 instead of -inf
    degen = d >= n
    terms = np.where(degen, 0.0, np.log(1.0 - d / n))
    surv = np.where(np.cumsum(degen) > 0, 0.0, np.exp(np.cumsum(terms)))
    return rd.from_arrow(
        pa.table(
            {
                "t_hours": pa.array(t[keep], type=pa.int64()),
                "n_risk": pa.array(n_risk[keep].astype(np.int64), type=pa.int64()),
                "n_events": pa.array(ne[keep], type=pa.int64()),
                "survival": pa.array(duckdb_round(surv, 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# did_uplift (difference-in-differences across the zone/time 2x2)
# ---------------------------------------------------------------------------

DID_CUT = "2024-01-20"  # intervention date (spatial.IVM_CUT convention)


def did_uplift(sf_dir: str, cut: str = DID_CUT) -> rd.Dataset:
    """Difference-in-differences screen: per event type, the 2×2
    (treatment zone × before/after) count table and the DiD contrast
    (T_a − T_b) − (C_a − C_b) plus the ratio-of-ratios lift
    (T_a/T_b)/(C_a/C_b) — the quasi-experimental readout for "did the
    intervention inside the zone change behaviour beyond the global
    trend?".  Treatment = events inside the first fixture city rect
    (the dwell_in_zone half-open containment), cut = the incremental
    demo's base/delta date.

    Scale shape: map-ONLY classification (derive, two comparisons)
    into a 2×2×|alphabet| combiner, ONE bounded groupby.  DiD is
    integer; the lift is ONE mirrored float expression.  Output:
    (event_type, t_before, t_after, c_before, c_after, did, lift).
    """
    from .. import fixtures as fx

    rect = fx.admin_rects()[0]
    cut_us = np.datetime64(cut, "us").astype(np.int64)

    ds = _read_events(sf_dir, ["event_id", "ts", "event_type"])

    def classify(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fx.derive_lon(ids), fx.derive_lat(ids)
        inside = (
            (lon >= rect["lon_min"]) & (lon < rect["lon_max"]) & (lat >= rect["lat_min"]) & (lat < rect["lat_max"])
        )
        after = t["ts"].cast(pa.int64()).to_numpy() >= cut_us
        et = t["event_type"].to_numpy(zero_copy_only=False)
        import pandas as pd

        df = pd.DataFrame({"event_type": et, "inside": inside, "after": after})
        c = df.groupby(["event_type", "inside", "after"], sort=True).size().reset_index(name="n")
        return pa.table(
            {
                "event_type": pa.array(c["event_type"], type=pa.string()),
                "tb": pa.array((c["inside"] & ~c["after"]).to_numpy() * c["n"].to_numpy(), type=pa.int64()),
                "ta": pa.array((c["inside"] & c["after"]).to_numpy() * c["n"].to_numpy(), type=pa.int64()),
                "cb": pa.array((~c["inside"] & ~c["after"]).to_numpy() * c["n"].to_numpy(), type=pa.int64()),
                "ca": pa.array((~c["inside"] & c["after"]).to_numpy() * c["n"].to_numpy(), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(classify, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("tb", alias_name="t_before"),
            Sum("ta", alias_name="t_after"),
            Sum("cb", alias_name="c_before"),
            Sum("ca", alias_name="c_after"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    from ..stages.common import duckdb_round

    tb = agg["t_before"].to_numpy().astype(np.int64)
    ta = agg["t_after"].to_numpy().astype(np.int64)
    cb = agg["c_before"].to_numpy().astype(np.int64)
    ca = agg["c_after"].to_numpy().astype(np.int64)
    did = (ta - tb) - (ca - cb)
    lift = (ta.astype(np.float64) / tb.astype(np.float64)) / (ca.astype(np.float64) / cb.astype(np.float64))
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(agg["event_type"], type=pa.string()),
                "t_before": pa.array(tb, type=pa.int64()),
                "t_after": pa.array(ta, type=pa.int64()),
                "c_before": pa.array(cb, type=pa.int64()),
                "c_after": pa.array(ca, type=pa.int64()),
                "did": pa.array(did, type=pa.int64()),
                "lift": pa.array(duckdb_round(lift, 6), type=pa.float64()),
            }
        )
    )


CMS_TOP_K = 20


def count_min_eval(sf_dir: str, k: int = CMS_TOP_K) -> rd.Dataset:
    """Count-Min frequency sketch with an EXACT error audit: build a
    d×w CMS over event user_ids folded in the aggregate tree, then
    report, for the top-k exact heavy users, the exact count, the CMS
    point estimate and its (always ≥ 0) overestimate — the
    one-sided-error contract that makes CMS safe for rate limiting
    (companion of heavy_hitters' Space-Saving and the KMV/HLL
    distinct family; reference analogue: the A4 sketch layer,
    groupby-test.sc:1-19).

    Determinism: the d row-hashes are fixed minstd LCGs mod M31 mod w
    (exact int64 in both engines, stages/sketch.cms_cols); counts and
    estimates are exact integers; ranking ties break on user_id.

    Scale shape: per-batch (row, col) combiner -> ONE d×w-bounded
    groupby (≤ 4096 rows leave the data, regardless of input size);
    the exact side reuses the per-user count reduce + global top-k
    sort; estimates attach driver-side on the k-row result.
    Output: (rank, user_id, n_exact, n_est, overestimate).
    """
    import pyarrow as pa

    from ..pipelines.ann import ranked_head
    from ..stages.sketch import CMS_D, CMS_W, cms_cols

    ds = _read_events(sf_dir, ["user_id"])

    def cms_partial(t: pa.Table) -> pa.Table:
        keys = t["user_id"].to_numpy()
        rs, cs, ns = [], [], []
        for r in range(CMS_D):
            uniq, cnt = np.unique(cms_cols(keys, r), return_counts=True)
            rs.append(np.full(len(uniq), r, dtype=np.int64))
            cs.append(uniq.astype(np.int64))
            ns.append(cnt.astype(np.int64))
        return pa.table(
            {
                "r": pa.array(np.concatenate(rs), type=pa.int64()),
                "c": pa.array(np.concatenate(cs), type=pa.int64()),
                "n": pa.array(np.concatenate(ns), type=pa.int64()),
            }
        )

    cms_tbl = (
        ds.map_batches(cms_partial, batch_format="pyarrow")
        .groupby(["r", "c"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    counts[cms_tbl["r"].to_numpy(), cms_tbl["c"].to_numpy()] = cms_tbl["n"].to_numpy()

    def user_partial(t: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(t["user_id"].to_numpy(), return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(uniq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    exact = (
        ds.map_batches(user_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n"))
    )
    top = ranked_head(exact, ["n", "user_id"], "rank", k, keep=["user_id", "n"]).to_pandas()

    uid = top["user_id"].to_numpy().astype(np.int64)
    est = np.full(len(uid), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(CMS_D):
        est = np.minimum(est, counts[r][cms_cols(uid, r)])
    n_exact = top["n"].to_numpy().astype(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array(top["rank"].to_numpy().astype(np.int64), type=pa.int64()),
                "user_id": pa.array(uid, type=pa.int64()),
                "n_exact": pa.array(n_exact, type=pa.int64()),
                "n_est": pa.array(est, type=pa.int64()),
                "overestimate": pa.array(est - n_exact, type=pa.int64()),
            }
        )
    )


CCF_TYPE_A, CCF_TYPE_B = "click", "view"


def ccf_event_types(sf_dir: str, max_lag: int = 24) -> rd.Dataset:
    """Cross-correlation function between two event types' hourly
    count series at lags −max_lag..+max_lag — "does VIEW activity lead
    CLICK activity, and by how many hours?" (the lead/lag detector
    behind attribution windows; positive-lag peak ⇒ A lags B).

    Exactness: acf_hourly's integer-deviation trick on BOTH series
    (nn·(x_t − mean) = x_t·nn − S is an int64); every lag numerator is
    an exact integer sum, the denominator is one mirrored
    sqrt(denA·denB) float expression.

    Scale shape: ONE (hour, type-indicator) combiner → hour-keyed
    groupby (observation-window bounded); the lag loop runs on the
    dense driver-side series (≤10^5 hours for a decade).
    Output: (lag, ccf) rounded 6.
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        h = t["ts"].cast(pa.int64()).to_numpy() // 3_600_000_000
        typ = np.asarray(t["event_type"].to_pylist())
        rows = []
        for name, col in ((CCF_TYPE_A, "n_a"), (CCF_TYPE_B, "n_b")):
            hh = h[typ == name]
            u, c = np.unique(hh, return_counts=True)
            rows.append((u, c, col))
        out_h = np.concatenate([r[0] for r in rows])
        na = np.concatenate([rows[0][1], np.zeros(len(rows[1][0]), dtype=np.int64)])
        nb = np.concatenate([np.zeros(len(rows[0][0]), dtype=np.int64), rows[1][1]])
        return pa.table(
            {
                "h": pa.array(out_h, type=pa.int64()),
                "n_a": pa.array(na.astype(np.int64)),
                "n_b": pa.array(nb.astype(np.int64)),
            }
        )

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n_a", alias_name="n_a"), Sum("n_b", alias_name="n_b"))
        .to_pandas()
    )
    h = hourly["h"].to_numpy().astype(np.int64)
    lo, hi = int(h.min()), int(h.max())
    a = np.zeros(hi - lo + 1, dtype=np.int64)
    b = np.zeros(hi - lo + 1, dtype=np.int64)
    a[h - lo] = hourly["n_a"].to_numpy().astype(np.int64)
    b[h - lo] = hourly["n_b"].to_numpy().astype(np.int64)
    nn = np.int64(len(a))
    da = a * nn - np.int64(a.sum())
    db = b * nn - np.int64(b.sum())
    den = np.sqrt(float(int((da * da).sum())) * float(int((db * db).sum())))
    lags = np.arange(-max_lag, max_lag + 1, dtype=np.int64)
    vals = np.empty(len(lags), dtype=np.float64)
    for i, k in enumerate(lags):
        if k >= 0:
            num = int((da[k:] * db[: len(db) - k]).sum()) if k else int((da * db).sum())
        else:
            num = int((db[-k:] * da[: len(da) + k]).sum())
        vals[i] = float(num) / den
    return rd.from_arrow(
        pa.table(
            {
                "lag": pa.array(lags, type=pa.int64()),
                "ccf": pa.array(duckdb_round(vals, 6), type=pa.float64()),
            }
        )
    )


def dau_wau_ratio(sf_dir: str) -> rd.Dataset:
    """Weekly stickiness: per epoch-week, the mean number of DISTINCT
    daily users divided by the week's distinct users (DAU/WAU — the
    classic engagement ratio; 1/7 = everyone shows once, 1.0 =
    everyone active daily).

    Exactness: distinct counts via the two-level reduce used across
    this repo (per-batch unique (day, user) pairs → pair-keyed groupby
    → day- and week-keyed folds), all int64; the ratio is one mirrored
    float expression avg_dau / wau with avg_dau = Σ dau / n_days
    observed in that week.

    Scale shape: the (day, user) distinct table is the only exchange
    (bounded by active users × days); week folds reduce THAT table.
    Output: (week, n_days, wau, sum_dau, stickiness) rounded 6.
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["ts", "user_id"])

    def pair_partial(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy() // 86_400_000_000).astype(np.int64)
        uid = np.asarray(t["user_id"].to_numpy(), dtype=np.int64)
        key = day * np.int64(1 << 40) + uid  # uids < 2^40 (fixture contract)
        u = np.unique(key)
        return pa.table(
            {
                "day": pa.array((u >> 40).astype(np.int64)),
                "user_id": pa.array((u & ((1 << 40) - 1)).astype(np.int64)),
            }
        )

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="dup"))
    )

    def day_week(t: pa.Table) -> pa.Table:
        day = t["day"].to_numpy()
        return pa.table(
            {
                "week": pa.array((day // 7).astype(np.int64)),
                "day": t["day"],
                "user_id": t["user_id"],
            }
        )

    dw = pairs.map_batches(day_week, batch_format="pyarrow")
    dau = (
        dw.groupby(["week", "day"])
        .aggregate(Count(alias_name="dau"))
    )

    def week_user(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {"week": t["week"].to_numpy(), "user_id": t["user_id"].to_numpy()}
        ).drop_duplicates()
        return pa.table(
            {
                "week": pa.array(df["week"].to_numpy().astype(np.int64)),
                "user_id": pa.array(df["user_id"].to_numpy().astype(np.int64)),
            }
        )

    wau = (
        dw.map_batches(week_user, batch_format="pyarrow")
        .groupby(["week", "user_id"])
        .aggregate(Count(alias_name="dup"))
        .groupby("week")
        .aggregate(Count(alias_name="wau"))
    )

    day_fold = (
        dau.map_batches(
            lambda t: pa.table(
                {
                    "week": t["week"],
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    "dau": t["dau"],
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("week")
        .aggregate(Sum("one", alias_name="n_days"), Sum("dau", alias_name="sum_dau"))
    )

    joined = safe_join(day_fold, wau, join_type="inner", num_partitions=2, on=("week",))

    def finish(t: pa.Table) -> pa.Table:
        nd = t["n_days"].to_numpy().astype(np.float64)
        sd = t["sum_dau"].to_numpy().astype(np.float64)
        w = t["wau"].to_numpy().astype(np.float64)
        stick = duckdb_round((sd / nd) / w, 6)
        return pa.table(
            {
                "week": t["week"].cast(pa.int64()),
                "n_days": t["n_days"].cast(pa.int64()),
                "wau": t["wau"].cast(pa.int64()),
                "sum_dau": t["sum_dau"].cast(pa.int64()),
                "stickiness": pa.array(stick, type=pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("week")


def follows_latency(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Directly-follows LATENCY matrix (process mining's performance
    view): for every same-user consecutive (prev_type → next_type)
    edge, the count, exact MEDIAN inter-event delay and the mean —
    event_transition_lift tells you WHICH edges exist; this tells you
    how LONG each takes (the bottleneck readout of a discovered
    process map).

    Determinism: deltas are exact int64 microseconds; the median is
    quantile_disc's element-selection (rank ceil(n/2) over the sorted
    deltas — an ELEMENT, no interpolation); the mean is one mirrored
    float division of an int64 sum.

    Scale shape: the coarse-partition run-scan emits (prev, next,
    delta) rows; ONE alphabet²-keyed regroup computes rank statistics
    per edge (per-edge volume bounded by the pair counts).  Output:
    (prev_type, next_type, n, p50_delta_us, mean_delta_us) rounded 6.
    """
    import math

    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "event_id": t["event_id"],
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy(), type=pa.int64()),
                "event_type": t["event_type"],
                "part": pa.array(uid % parts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "prev_type": pa.array([], type=pa.string()),
            "next_type": pa.array([], type=pa.string()),
            "delta": pa.array([], type=pa.int64()),
        }
    )

    def deltas(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        tus = g["tus"].to_numpy()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        m = uid[1:] == uid[:-1]
        if not m.any():
            return empty
        return pa.table(
            {
                "prev_type": pa.array(et[:-1][m], type=pa.string()),
                "next_type": pa.array(et[1:][m], type=pa.string()),
                "delta": pa.array((tus[1:] - tus[:-1])[m], type=pa.int64()),
            }
        )

    rows = ds.map_batches(prep, batch_format="pyarrow").groupby("part").map_groups(
        deltas, batch_format="pyarrow"
    )

    def edge_stats(g: pd.DataFrame) -> pd.DataFrame:
        out = {"prev_type": [], "next_type": [], "n": [], "p50_delta_us": [], "sum_delta": []}
        for (p, nx), grp in g.groupby(["prev_type", "next_type"], sort=True):
            d = np.sort(grp["delta"].to_numpy())
            n = len(d)
            out["prev_type"].append(p)
            out["next_type"].append(nx)
            out["n"].append(n)
            out["p50_delta_us"].append(int(d[max(1, math.ceil(0.5 * n)) - 1]))
            out["sum_delta"].append(int(d.sum()))
        return pd.DataFrame(out)

    agg = rows.groupby("prev_type").map_groups(edge_stats, batch_format="pandas")

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.float64)
        s = t["sum_delta"].to_numpy().astype(np.float64)
        mean = duckdb_round(s / n, 6)
        out = t.drop_columns(["sum_delta"])
        return out.append_column("mean_delta_us", pa.array(mean, type=pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow").sort(["prev_type", "next_type"])


# ---------------------------------------------------------------------------
# binseg_changepoints (exact-rational binary segmentation)
# ---------------------------------------------------------------------------

BINSEG_K = 5  # splits reported
BINSEG_MIN_SEG = 7  # days per side, minimum


def _binseg_gains(x: list[int]) -> list[tuple[int, int]]:
    """Greedy binary segmentation over an integer series: returns the
    chosen (rank, split_index) list.  The SSE gain of splitting [a,b)
    at k is  S_l²/n_l + S_r²/n_r − S²/n  (Σx² cancels), compared as
    EXACT RATIONALS via Python-int cross-multiplication — no float
    enters the argmax, so the split sequence is engine-invariant.
    Ties break to the smallest split index, then smallest segment
    start.  Splits keep both sides ≥ BINSEG_MIN_SEG."""
    pre = [0]
    for v in x:
        pre.append(pre[-1] + int(v))

    def seg_sum(a: int, b: int) -> int:
        return pre[b] - pre[a]

    segments = [(0, len(x))]
    chosen: list[tuple[int, int]] = []
    for rank in range(1, BINSEG_K + 1):
        best = None  # (gain_num, gain_den) maximal; ties -> smaller k, then a
        for a, b in segments:
            s = seg_sum(a, b)
            n = b - a
            for k in range(a + BINSEG_MIN_SEG, b - BINSEG_MIN_SEG + 1):
                sl, nl = seg_sum(a, k), k - a
                sr, nr = s - sl, b - k
                # gain = sl²/nl + sr²/nr − s²/n  over common den nl·nr·n
                num = sl * sl * nr * n + sr * sr * nl * n - s * s * nl * nr
                den = nl * nr * n
                if best is None or num * best[1] > best[0] * den:
                    best = (num, den, k, a, b)
        if best is None or best[0] <= 0:
            break
        _, _, k, a, b = best
        chosen.append((rank, k))
        segments.remove((a, b))
        segments.extend([(a, k), (k, b)])
    return chosen


def binseg_changepoints(sf_dir: str) -> rd.Dataset:
    """Offline change-point detection on the daily revenue series:
    greedy binary segmentation (Scott & Knott 1974 lineage; the
    batch sibling of daily_cusum's online alarm) with the variance-
    reduction gain computed as an EXACT RATIONAL over integer cents —
    the level-shift finder behind "when did the order mix actually
    change?".

    Determinism: daily sums are exact int64 cents through the
    aggregate tree; every gain comparison is Python-big-int cross
    multiplication (no float ever ranks a split); only the reported
    segment means divide, each ONE mirrored float expression.

    Scale shape: per-batch (day, cents) combiner -> ONE day-bounded
    groupby; the segmentation runs on the D-row aggregate (D = days,
    never order rows — the daily_cusum discipline).

    Output: one row per chosen split (rank, split_day, n_left,
    n_right, mean_left, mean_right) where left/right are the adjacent
    runs between neighboring changepoints.
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
    days = daily["day"].to_numpy().astype(np.int64)
    x = [int(v) for v in daily["cents"].to_numpy()]
    chosen = _binseg_gains(x)
    cuts = sorted(k for _, k in chosen)
    rows = {"rank": [], "split_day": [], "n_left": [], "n_right": [], "mean_left": [], "mean_right": []}
    for rank, k in chosen:
        lo = max([c for c in cuts if c < k], default=0)
        hi = min([c for c in cuts if c > k], default=len(x))
        sl, nl = sum(x[lo:k]), k - lo
        sr, nr = sum(x[k:hi]), hi - k
        rows["rank"].append(rank)
        rows["split_day"].append(int(days[k]))  # first day of the right run
        rows["n_left"].append(nl)
        rows["n_right"].append(nr)
        rows["mean_left"].append(float(duckdb_round(np.array([sl / nl / 100.0]), 6)[0]))
        rows["mean_right"].append(float(duckdb_round(np.array([sr / nr / 100.0]), 6)[0]))
    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array(rows["rank"], type=pa.int64()),
                "split_day": pa.array(rows["split_day"], type=pa.int64()),
                "n_left": pa.array(rows["n_left"], type=pa.int64()),
                "n_right": pa.array(rows["n_right"], type=pa.int64()),
                "mean_left": pa.array(rows["mean_left"], type=pa.float64()),
                "mean_right": pa.array(rows["mean_right"], type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# peak_concurrency (sweep-line max of overlapping sessions)
# ---------------------------------------------------------------------------

PEAK_BIN_US = 3_600_000_000  # 1-hour prefix-scan bins


def peak_concurrency(sf_dir: str, gap_min: int = SESSION_GAP_MIN) -> rd.Dataset:
    """Peak concurrent sessions: the sweep-line maximum of sessions
    active simultaneously (a session is active on [start, end]
    inclusive) — THE capacity-planning number behind connection pools
    and autoscaler floors, computed WITHOUT a global sort via the
    global_row_numbers two-pass prefix discipline.

    Boundary convention: +1 at start, −1 at end; at equal timestamps
    arrivals count BEFORE departures (sort key (t, −delta)), so a
    back-to-back handoff at the same microsecond counts as 2 — the
    inclusive-interval standard.  at_us reports the EARLIEST time the
    peak is attained.

    Scale shape: sessions from the sessionize groupby; each session
    emits 2 boundary rows; pass 1 folds per-HOUR-bin delta sums (bins
    rows, KB-scale) whose driver cumsum gives each bin's entering
    concurrency; pass 2 regroups boundaries by bin and scans each bin
    locally with its offset — no all-to-all sort, per-task memory one
    bin.  The final reduce takes the max over per-bin peaks.

    Output: one row (n_sessions, peak, at_us).
    """
    sess = sessionize(sf_dir, gap_min=gap_min).materialize()  # session-bounded
    n_sessions = sess.count()

    def boundaries(t: pa.Table) -> pa.Table:
        s = t["session_start"].cast(pa.int64()).to_numpy()
        e = t["session_end"].cast(pa.int64()).to_numpy()
        tus = np.concatenate([s, e])
        delta = np.concatenate([np.ones(len(s), np.int64), -np.ones(len(e), np.int64)])
        return pa.table(
            {
                "tus": pa.array(tus, type=pa.int64()),
                "delta": pa.array(delta, type=pa.int64()),
                "bin": pa.array(tus // PEAK_BIN_US, type=pa.int64()),
            }
        )

    bounds = sess.map_batches(boundaries, batch_format="pyarrow").materialize()
    bin_sums = (
        bounds.groupby("bin").aggregate(Sum("delta", alias_name="dsum")).to_pandas().sort_values("bin")  # bounded: fixed session bins
    )
    # entering concurrency of each bin = cumsum of all PRIOR bins
    offsets = dict(
        zip(
            bin_sums["bin"].to_numpy(),
            np.concatenate([[0], np.cumsum(bin_sums["dsum"].to_numpy())[:-1]]).astype(np.int64),
        )
    )

    empty = pa.table(
        {"peak": pa.array([], type=pa.int64()), "at_us": pa.array([], type=pa.int64())}
    )

    def scan_bin(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        tus = g["tus"].to_numpy()
        delta = g["delta"].to_numpy()
        order = np.lexsort((-delta, tus))  # arrivals before departures at equal t
        run = np.cumsum(delta[order]) + offsets[int(g["bin"][0].as_py())]
        peak = int(run.max())
        at = int(tus[order][int(np.argmax(run == peak))])
        return pa.table(
            {"peak": pa.array([peak], type=pa.int64()), "at_us": pa.array([at], type=pa.int64())}
        )

    per_bin = bounds.groupby("bin").map_groups(scan_bin, batch_format="pyarrow").to_pandas()  # bounded: fixed session bins (one peak row each)
    peak = int(per_bin["peak"].max())
    at_us = int(per_bin.loc[per_bin["peak"] == peak, "at_us"].min())
    return rd.from_arrow(
        pa.table(
            {
                "n_sessions": pa.array([n_sessions], type=pa.int64()),
                "peak": pa.array([peak], type=pa.int64()),
                "at_us": pa.array([at_us], type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# markov_attribution (removal-effect channel attribution)
# ---------------------------------------------------------------------------

ATTR_FP = 10**9
ATTR_ITERS = 40
ATTR_CONV = "purchase"


def _attr_transitions(g: pa.Table) -> pa.Table:
    """Per-partition journey walk: ordered per-user events become
    (from_state → to_state) counts with START/CONV/NULL sentinels —
    a purchase absorbs the journey and restarts it; end-of-user
    absorbs to NULL.  Pure run-scan, no per-user tasks."""
    g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
    uid = g["user_id"].to_numpy()
    et = g["event_type"].to_pylist()
    counts: dict[tuple[str, str], int] = {}

    def add(a: str, b: str) -> None:
        counts[(a, b)] = counts.get((a, b), 0) + 1

    prev = "START"
    for i in range(len(uid)):
        if i > 0 and uid[i] != uid[i - 1]:
            if prev != "START":
                add(prev, "NULL")
            prev = "START"
        if et[i] == ATTR_CONV:
            add(prev, "CONV")
            prev = "START"
        else:
            add(prev, et[i])
            prev = et[i]
    if len(uid) and prev != "START":
        add(prev, "NULL")
    ks = sorted(counts)
    return pa.table(
        {
            "from_state": pa.array([k[0] for k in ks], type=pa.string()),
            "to_state": pa.array([k[1] for k in ks], type=pa.string()),
            "n": pa.array([counts[k] for k in ks], type=pa.int64()),
        }
    )


def _attr_conv_prob(trans: dict[tuple[str, str], int]) -> int:
    """P(absorb at CONV | START) as ATTR_FP fixed-point by ATTR_ITERS
    rounds of the absorbing-chain fixpoint — pure integer ops."""
    outs: dict[str, int] = {}
    for (a, _), v in trans.items():
        outs[a] = outs.get(a, 0) + v
    states = sorted(outs)
    p = {s: 0 for s in states}
    for _ in range(ATTR_ITERS):
        nxt = {}
        for s in states:
            acc = 0
            for (a, b), v in trans.items():
                if a != s:
                    continue
                if b == "CONV":
                    acc += v * ATTR_FP
                elif b != "NULL" and b in p:
                    acc += v * p[b]
            nxt[s] = acc // outs[s]
        p = nxt
    return p.get("START", 0)


def markov_attribution(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Markov removal-effect attribution (Anderl et al. 2016): model
    user journeys as an absorbing Markov chain over touch channels,
    then credit each channel by how much the START→CONV probability
    DROPS when that channel is removed (redirected to NULL) — the
    data-driven alternative to last-click that marketing mix reviews
    actually trust.

    Journey rule (mirrored exactly in the golden walk): per user in
    (ts, event_id) order, a purchase absorbs the journey to CONV and
    restarts at START; end-of-user absorbs to NULL; every other event
    is a touch state.  Removal of channel c deletes c's outgoing rows
    and redirects its incoming rows to NULL.

    Determinism: transition counts are exact int64 through the
    aggregate tree; each conversion probability is ATTR_ITERS rounds
    of the integer fixpoint ``p(s) = (Σ n(s→t)·p(t) + n(s→CONV)·FP)
    // n(s)`` — no float enters until the mirrored removal-effect
    ratios.

    Scale shape: the sessionize coarse-partition run-scan emits
    (from, to, n) combiner rows; ONE states²-bounded groupby; the
    chain solves run on the ≤ (channels+1)² aggregate driver-side.

    Output: (channel, n_touches, p_full, p_without, removal_effect,
    attribution) — attribution = removal share, summing to ~1.
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "event_id": t["event_id"],
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy(), type=pa.int64()),
                "event_type": t["event_type"],
                "part": pa.array(uid % parts, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_attr_transitions, batch_format="pyarrow")
        .groupby(["from_state", "to_state"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    trans = {
        (r.from_state, r.to_state): int(r.n) for r in agg.itertuples()
    }
    p_full = _attr_conv_prob(trans)
    channels = sorted({a for a, _ in trans} - {"START"})
    touches = {c: sum(v for (a, _), v in trans.items() if a == c) for c in channels}
    rows = {k: [] for k in ("channel", "n_touches", "p_full", "p_without", "removal_effect")}
    for c in channels:
        t2: dict[tuple[str, str], int] = {}
        for (a, b), v in trans.items():
            if a == c:
                continue
            b2 = "NULL" if b == c else b
            t2[(a, b2)] = t2.get((a, b2), 0) + v
        p_wo = _attr_conv_prob(t2)
        rows["channel"].append(c)
        rows["n_touches"].append(touches[c])
        rows["p_full"].append(p_full)
        rows["p_without"].append(p_wo)
        rows["removal_effect"].append(
            float(duckdb_round(np.array([1.0 - p_wo / max(p_full, 1)]), 6)[0])
        )
    tot_re = sum(rows["removal_effect"])
    attr = duckdb_round(np.array(rows["removal_effect"]) / tot_re, 6)
    return rd.from_arrow(
        pa.table(
            {
                "channel": pa.array(rows["channel"], type=pa.string()),
                "n_touches": pa.array(rows["n_touches"], type=pa.int64()),
                "p_full": pa.array(rows["p_full"], type=pa.int64()),
                "p_without": pa.array(rows["p_without"], type=pa.int64()),
                "removal_effect": pa.array(rows["removal_effect"], type=pa.float64()),
                "attribution": pa.array(attr, type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# dtw_profiles (dynamic-time-warping distance between diurnal profiles)
# ---------------------------------------------------------------------------


def dtw_profiles(sf_dir: str) -> rd.Dataset:
    """Pairwise DTW distance between the hour-of-day (0..23) count
    profiles of every event-type pair — "do these event streams share
    a daily rhythm up to a phase shift/stretch?", the
    elastic-alignment upgrade of ccf_event_types' fixed-lag linear
    correlation (DTW aligns a late-peaking type to an early one
    without choosing a single lag).

    Exactness: profiles are int64 counts; the DP cost |a - b| and all
    cumulative cells are exact integers, so dtw_dist is bit-stable and
    the L1 upper bound (diagonal path) gives the invariant
    dtw_dist <= l1_dist checked by the pytest and implied by the
    golden.

    Scale shape: per-batch (type, hour-of-day) combiner -> ONE
    bounded groupby (types x 24 rows); the O(types^2 * 24^2) DP runs
    on the driver over the aggregate — corpus-size-INDEPENDENT
    (bounded-finalize discipline).  At a million series the pair DP
    itself becomes the map stage: ship profile pairs through
    map_batches — the aggregation shape is unchanged.

    Output: (type_a, type_b, l1_dist, dtw_dist), pairs a < b.
    """
    ds = _read_events(sf_dir, ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        hod = (t["ts"].cast(pa.int64()).to_numpy() // 3_600_000_000) % 24
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "hod": hod})
        g = df.groupby(["event_type", "hod"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "hod": pa.array(g["hod"].to_numpy().astype(np.int64), type=pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    prof = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hod"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    types = sorted(prof["event_type"].unique())
    vec = {}
    for ty in types:
        v = np.zeros(24, dtype=np.int64)
        sub = prof[prof["event_type"] == ty]
        v[sub["hod"].to_numpy().astype(np.int64)] = sub["n"].to_numpy().astype(np.int64)
        vec[ty] = v
    rows = {"type_a": [], "type_b": [], "l1_dist": [], "dtw_dist": []}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            a, b = vec[ta], vec[tb]
            rows["type_a"].append(ta)
            rows["type_b"].append(tb)
            rows["l1_dist"].append(int(np.abs(a - b).sum()))
            rows["dtw_dist"].append(dtw_int(a, b))
    return rd.from_arrow(
        pa.table(
            {
                "type_a": pa.array(rows["type_a"], type=pa.string()),
                "type_b": pa.array(rows["type_b"], type=pa.string()),
                "l1_dist": pa.array(rows["l1_dist"], type=pa.int64()),
                "dtw_dist": pa.array(rows["dtw_dist"], type=pa.int64()),
            }
        )
    )


def dtw_int(a: np.ndarray, b: np.ndarray) -> int:
    """Classic unconstrained DTW with |a-b| step cost, exact int64 DP."""
    n, m = len(a), len(b)
    big = 1 << 60
    prev = np.full(m + 1, big, dtype=np.int64)
    prev[0] = 0
    for i in range(1, n + 1):
        cur = np.full(m + 1, big, dtype=np.int64)
        cost = np.abs(a[i - 1] - b)
        for j in range(1, m + 1):
            cur[j] = cost[j - 1] + min(prev[j - 1], prev[j], cur[j - 1])
        prev = cur
    return int(prev[m])


def pacf_durbin(sf_dir: str, max_lag: int = 24) -> rd.Dataset:
    """Partial autocorrelation of the hourly event-count series at lags
    1..max_lag via the Durbin-Levinson recursion — the Box-Jenkins
    companion of acf_hourly (ACF tails off / PACF cuts off picks AR
    order; both charts together are the ARIMA identification page).

    The distributed part is IDENTICAL to acf_hourly (per-batch (hour,
    count) combiner -> hour-bounded groupby): PACF is pure driver math
    on the bounded exact-integer ACF — phi_{k,k} from the recursion
        phi_{k,k} = (r_k - sum_j phi_{k-1,j} r_{k-j}) / (1 - sum_j phi_{k-1,j} r_j)
    evaluated in float64 from ACF values that are ratios of exact
    int64 sums, so the golden's identical recursion reproduces the
    bits (pagerank-golden convention).

    Output: (lag, acf, pacf).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        h = t["ts"].cast(pa.int64()).to_numpy() // 3_600_000_000
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u, type=pa.int64()), "n": pa.array(c.astype(np.int64))})

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    h = hourly["h"].to_numpy().astype(np.int64)
    lo, hi = int(h.min()), int(h.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[h - lo] = hourly["n"].to_numpy().astype(np.int64)
    acf, pacf = _acf_pacf_from_series(dense, max_lag)
    return rd.from_arrow(
        pa.table(
            {
                "lag": pa.array(np.arange(1, max_lag + 1, dtype=np.int64), type=pa.int64()),
                "acf": pa.array(duckdb_round(acf, 6), type=pa.float64()),
                "pacf": pa.array(duckdb_round(pacf, 6), type=pa.float64()),
            }
        )
    )


def _acf_pacf_from_series(dense: np.ndarray, max_lag: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact-int ACF (acf_hourly's estimator) + Durbin-Levinson PACF."""
    nn = np.int64(len(dense))
    s = np.int64(dense.sum())
    dx = dense * nn - s
    den = int((dx * dx).sum())
    r = np.empty(max_lag + 1, dtype=np.float64)
    r[0] = 1.0
    for k in range(1, max_lag + 1):
        r[k] = float(int((dx[k:] * dx[:-k]).sum())) / float(den)
    pacf = np.empty(max_lag, dtype=np.float64)
    phi_prev = np.zeros(0, dtype=np.float64)
    for k in range(1, max_lag + 1):
        if k == 1:
            phi_kk = r[1]
            phi = np.array([phi_kk])
        else:
            num = r[k] - float((phi_prev * r[k - 1 : 0 : -1]).sum())
            dnm = 1.0 - float((phi_prev * r[1:k]).sum())
            phi_kk = num / dnm
            phi = np.concatenate([phi_prev - phi_kk * phi_prev[::-1], [phi_kk]])
        pacf[k - 1] = phi_kk
        phi_prev = phi
    return r[1:], pacf


# ---------------------------------------------------------------------------
# granger_causality (lagged-predictability test between event streams)
# ---------------------------------------------------------------------------

GRANGER_PAIR = ("purchase", "view")


def _granger_fit(x: np.ndarray, y: np.ndarray) -> tuple:
    """Restricted (x_t ~ 1 + x_{t-1}) vs unrestricted (+ y_{t-1}) OLS
    on EXACT integer sums (2x2 / 3x3 Cramer with Python big-ints),
    RSS via the sum identity at the optimum — all floats mirrored.
    Returns (n_obs, rss_r, rss_u, f_stat)."""
    xt = x[1:].astype(object)
    x1 = x[:-1].astype(object)
    y1 = y[:-1].astype(object)
    n = len(xt)
    s_x1, s_y1, s_t = sum(x1), sum(y1), sum(xt)
    s_11 = sum(a * a for a in x1)
    s_1y = sum(a * b for a, b in zip(x1, y1))
    s_yy = sum(b * b for b in y1)
    s_1t = sum(a * b for a, b in zip(x1, xt))
    s_yt = sum(b * c for b, c in zip(y1, xt))
    s_tt = sum(c * c for c in xt)
    # restricted: [n, s_x1; s_x1, s_11] b = [s_t; s_1t]
    det_r = n * s_11 - s_x1 * s_x1
    b0r = float(s_t * s_11 - s_x1 * s_1t) / float(det_r)
    b1r = float(n * s_1t - s_x1 * s_t) / float(det_r)
    rss_r = float(s_tt) - b0r * float(s_t) - b1r * float(s_1t)
    # unrestricted 3x3: A=[[n,s_x1,s_y1],[s_x1,s_11,s_1y],[s_y1,s_1y,s_yy]], rhs=[s_t,s_1t,s_yt]
    det = (
        n * (s_11 * s_yy - s_1y * s_1y)
        - s_x1 * (s_x1 * s_yy - s_1y * s_y1)
        + s_y1 * (s_x1 * s_1y - s_11 * s_y1)
    )
    det0 = (
        s_t * (s_11 * s_yy - s_1y * s_1y)
        - s_x1 * (s_1t * s_yy - s_1y * s_yt)
        + s_y1 * (s_1t * s_1y - s_11 * s_yt)
    )
    det1 = (
        n * (s_1t * s_yy - s_1y * s_yt)
        - s_t * (s_x1 * s_yy - s_1y * s_y1)
        + s_y1 * (s_x1 * s_yt - s_1t * s_y1)
    )
    det2 = (
        n * (s_11 * s_yt - s_1t * s_1y)
        - s_x1 * (s_x1 * s_yt - s_1t * s_y1)
        + s_t * (s_x1 * s_1y - s_11 * s_y1)
    )
    b0, b1, b2 = (float(d) / float(det) for d in (det0, det1, det2))
    rss_u = float(s_tt) - b0 * float(s_t) - b1 * float(s_1t) - b2 * float(s_yt)
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    return n, rss_r, rss_u, f


def granger_causality(sf_dir: str, pair: tuple = GRANGER_PAIR) -> rd.Dataset:
    """Granger lagged-predictability test between two event streams:
    does yesterday's VIEW count help predict today's PURCHASE count
    beyond purchases' own history (and vice versa)?  The classic
    lead-lag attribution test — the hypothesis-test upgrade of
    ccf_event_types' raw cross-correlation.

    Exactness: hourly counts are exact int64; BOTH model fits reduce
    to Cramer solves on Python big-int sums; RSS and F are mirrored
    float expressions rounded to 6.

    Scale shape: per-batch (type, hour) combiner -> ONE
    window-bounded groupby; the two 3x3 fits run on the dense bounded
    series driver-side (acf/pacf discipline).  Output: one row per
    direction (cause, effect, n_obs, rss_r, rss_u, f_stat).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["ts", "event_type"]).filter(
        expr=f"event_type in [{pair[0]!r}, {pair[1]!r}]"
    )

    def partial(t: pa.Table) -> pa.Table:
        h = t["ts"].cast(pa.int64()).to_numpy() // 3_600_000_000
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "h": h}).groupby(
            ["event_type", "h"], sort=False
        ).size().reset_index(name="n")
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], type=pa.string()),
                "h": pa.array(df["h"].to_numpy().astype(np.int64), type=pa.int64()),
                "n": pa.array(df["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "h"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    lo, hi = int(hourly["h"].min()), int(hourly["h"].max())
    series = {}
    for ty in pair:
        v = np.zeros(hi - lo + 1, dtype=np.int64)
        sub = hourly[hourly["event_type"] == ty]
        v[sub["h"].to_numpy().astype(np.int64) - lo] = sub["n"].to_numpy().astype(np.int64)
        series[ty] = v
    rows = {"cause": [], "effect": [], "n_obs": [], "rss_r": [], "rss_u": [], "f_stat": []}
    for cause, effect in ((pair[1], pair[0]), (pair[0], pair[1])):
        n, rss_r, rss_u, f = _granger_fit(series[effect], series[cause])
        rows["cause"].append(cause)
        rows["effect"].append(effect)
        rows["n_obs"].append(n)
        rows["rss_r"].append(rss_r)
        rows["rss_u"].append(rss_u)
        rows["f_stat"].append(f)
    return rd.from_arrow(
        pa.table(
            {
                "cause": pa.array(rows["cause"], type=pa.string()),
                "effect": pa.array(rows["effect"], type=pa.string()),
                "n_obs": pa.array(rows["n_obs"], type=pa.int64()),
                "rss_r": pa.array(duckdb_round(np.array(rows["rss_r"]), 6), type=pa.float64()),
                "rss_u": pa.array(duckdb_round(np.array(rows["rss_u"]), 6), type=pa.float64()),
                "f_stat": pa.array(duckdb_round(np.array(rows["f_stat"]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# hurst_exponent (rescaled-range long-memory estimate)
# ---------------------------------------------------------------------------

HURST_WINDOWS = (8, 16, 32, 64, 128)


def hurst_exponent(sf_dir: str, windows_: tuple = HURST_WINDOWS) -> rd.Dataset:
    """Hurst exponent of the hourly event-count series by classic
    rescaled-range (R/S) analysis: slope of log(R/S) vs log(window) —
    the long-memory scalar (H > 0.5 persistent / < 0.5 anti-
    persistent / = 0.5 memoryless) that ACF's fixed lags cannot
    summarize; the capacity-planning question "do busy hours clump at
    EVERY scale?" in one number.

    Determinism: the hourly series is exact int64 (acf_hourly's
    exchange); per-window R/S uses float demeaned cumsums in a FIXED
    window order (non-overlapping blocks, remainder dropped), and the
    final slope is the exact-sum OLS closed form — all mirrored
    expressions, golden replays them on DuckDB counts.

    Scale shape: ONE hour-keyed bounded reduce; the R/S ladder is
    O(len · |windows|) driver math on the bounded series.  Output:
    (window, n_blocks, mean_rs) per rung + one (0, n, H) summary row
    (window = 0 marks the fit row).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        h = t["ts"].cast(pa.int64()).to_numpy() // 3_600_000_000
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u, type=pa.int64()), "n": pa.array(c.astype(np.int64))})

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    h = hourly["h"].to_numpy().astype(np.int64)
    lo, hi = int(h.min()), int(h.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[h - lo] = hourly["n"].to_numpy().astype(np.int64)
    rows = {"window": [], "n_blocks": [], "mean_rs": []}
    xs, ys = [], []
    for w in windows_:
        nb = len(dense) // w
        if nb < 2:
            continue
        rs_vals = []
        for b in range(nb):
            seg = dense[b * w : (b + 1) * w].astype(np.float64)
            dev = seg - seg.mean()
            z = np.cumsum(dev)
            r = float(z.max() - z.min())
            s = float(seg.std())
            if s > 0:
                rs_vals.append(r / s)
        if not rs_vals:
            continue
        mean_rs = float(np.mean(rs_vals))
        rows["window"].append(w)
        rows["n_blocks"].append(nb)
        rows["mean_rs"].append(mean_rs)
        xs.append(np.log(float(w)))
        ys.append(np.log(mean_rs))
    xs_a, ys_a = np.array(xs), np.array(ys)
    n = len(xs_a)
    hcoef = float(
        (n * (xs_a * ys_a).sum() - xs_a.sum() * ys_a.sum())
        / (n * (xs_a * xs_a).sum() - xs_a.sum() ** 2)
    )
    rows["window"].append(0)
    rows["n_blocks"].append(len(dense))
    rows["mean_rs"].append(hcoef)
    return rd.from_arrow(
        pa.table(
            {
                "window": pa.array(rows["window"], type=pa.int64()),
                "n_blocks": pa.array(rows["n_blocks"], type=pa.int64()),
                "mean_rs": pa.array(duckdb_round(np.array(rows["mean_rs"]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# kalman_smooth (constant-level Kalman filter on daily revenue)
# ---------------------------------------------------------------------------

KALMAN_Q = 0.01  # process variance (relative scale)
KALMAN_R = 1.0  # observation variance (relative scale)


def kalman_smooth(sf_dir: str) -> rd.Dataset:
    """Local-level Kalman filter over the daily revenue series — the
    state-space denoiser (level + gain trajectory) that exponential
    smoothing approximates: the posted filter is the optimal linear
    tracker under the (q, r) noise model, and the steady-state gain
    it converges to IS the EWMA alpha this series deserves.

    Determinism: daily sums are exact cents (the runs_test combiner);
    the filter recursion runs in float64 over the day-bounded series
    with FIXED (q, r) — a pure function of the exact inputs, replayed
    identically by the golden.

    Scale shape: per-batch (day, cents) combiner -> day-bounded
    groupby -> O(days) driver recursion (daily_cusum discipline).
    Output: (day, obs_cents, level, gain) per day, rounded 6.
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderdate", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].cast(pa.int64()).to_numpy() // 86_400_000_000
        cents = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({"day": day, "cents": cents}).groupby("day", sort=False)["cents"].sum().reset_index()
        return pa.table(
            {
                "day": pa.array(df["day"].to_numpy(), type=pa.int64()),
                "cents": pa.array(df["cents"].to_numpy().astype(np.int64), type=pa.int64()),
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
    days = daily["day"].to_numpy().astype(np.int64)
    obs = daily["cents"].to_numpy().astype(np.int64)
    scale = float(max(int(np.median(obs)), 1))  # relative noise scales
    q = KALMAN_Q * scale * scale
    r = KALMAN_R * scale * scale
    x = float(obs[0])
    p = r
    levels = np.empty(len(obs))
    gains = np.empty(len(obs))
    for i, z in enumerate(obs.astype(np.float64)):
        p = p + q
        kgain = p / (p + r)
        x = x + kgain * (z - x)
        p = (1.0 - kgain) * p
        levels[i] = x
        gains[i] = kgain
    return rd.from_arrow(
        pa.table(
            {
                "day": pa.array(days, type=pa.int64()),
                "obs_cents": pa.array(obs, type=pa.int64()),
                "level": pa.array(duckdb_round(levels, 6), type=pa.float64()),
                "gain": pa.array(duckdb_round(gains, 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# kleinberg_bursts (two-state burst automaton over hourly counts)
# ---------------------------------------------------------------------------

BURST_FACTOR = 2.0  # burst-state rate multiplier
BURST_GAMMA = 1.0  # state-transition cost


def kleinberg_bursts(sf_dir: str) -> rd.Dataset:
    """Kleinberg's two-state burst automaton (KDD 2002) over the
    hourly event-count series: a Viterbi decode between a base-rate
    state and an elevated (x BURST_FACTOR) state with transition cost
    gamma — THE principled "when was it bursting" segmentation that a
    fixed threshold cannot give (short spikes pay the transition toll,
    sustained elevation flips the state).

    Determinism: hourly counts are exact; Poisson log-likelihoods and
    the DP run in float64 over the bounded series with fixed
    parameters; ties prefer the base state (explicit <, documented) —
    a pure function of exact inputs, replayed by the golden.

    Scale shape: the acf_hourly exchange; O(hours) driver DP.
    Output: (n_hours, n_burst_hours, n_episodes, longest_episode).
    """
    ds = _read_events(sf_dir, ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        h = t["ts"].cast(pa.int64()).to_numpy() // 3_600_000_000
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u, type=pa.int64()), "n": pa.array(c.astype(np.int64))})

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    h = hourly["h"].to_numpy().astype(np.int64)
    lo, hi = int(h.min()), int(h.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[h - lo] = hourly["n"].to_numpy().astype(np.int64)
    states = _kleinberg_states(dense, BURST_FACTOR, BURST_GAMMA)
    burst = states == 1
    edges = np.diff(np.concatenate([[0], burst.astype(np.int64), [0]]))
    starts = np.nonzero(edges == 1)[0]
    ends = np.nonzero(edges == -1)[0]
    episodes = len(starts)
    longest = int((ends - starts).max()) if episodes else 0
    return rd.from_arrow(
        pa.table(
            {
                "n_hours": pa.array([len(dense)], type=pa.int64()),
                "n_burst_hours": pa.array([int(burst.sum())], type=pa.int64()),
                "n_episodes": pa.array([episodes], type=pa.int64()),
                "longest_episode": pa.array([longest], type=pa.int64()),
            }
        )
    )


def _kleinberg_states(dense: np.ndarray, factor: float, gamma: float) -> np.ndarray:
    """Two-state Viterbi with Poisson emissions at rates (mean,
    mean*factor).  The n! emission term cancels BETWEEN states, so
    per-hour state scores need only n·ln(rate) − rate; ties prefer
    the base state (strict < on the burst branch)."""
    mean = float(dense.mean())
    lam = np.array([mean, mean * factor])
    n = dense.astype(np.float64)
    # emission log-likelihood per (hour, state), n! dropped (common)
    ll = n[:, None] * np.log(lam)[None, :] - lam[None, :]
    neg_inf = -1e18
    best = np.array([ll[0, 0], ll[0, 1] - gamma])
    back = np.zeros((len(n), 2), dtype=np.int64)
    for i in range(1, len(n)):
        new_best = np.empty(2)
        for s in (0, 1):
            stay = best[s]
            flip = best[1 - s] - gamma
            if flip > stay:  # strict: ties keep the current state
                back[i, s] = 1 - s
                new_best[s] = flip + ll[i, s]
            else:
                back[i, s] = s
                new_best[s] = stay + ll[i, s]
        best = new_best
    states = np.zeros(len(n), dtype=np.int64)
    states[-1] = 0 if best[0] >= best[1] else 1  # tie -> base
    for i in range(len(n) - 1, 0, -1):
        states[i - 1] = back[i, states[i]]
    return states


# ---------------------------------------------------------------------------
# sax_motifs (symbolic aggregate approximation + motif census)
# ---------------------------------------------------------------------------

SAX_WORD = 3  # motif length (symbols)
SAX_PAA = 4  # hours per symbol
# Gaussian breakpoints for a 4-letter alphabet (published SAX table)
SAX_BREAKS = (-0.6744897501960817, 0.0, 0.6744897501960817)


def sax_motifs(sf_dir: str) -> rd.Dataset:
    """SAX (Lin et al. 2003) symbolic discretization of the hourly
    count series + sliding-window motif census: PAA-average 4-hour
    blocks, z-normalize against the global mean/std, map through the
    published Gaussian breakpoints to letters a-d, and count every
    3-letter word — the time-series-as-text trick that turns motif
    discovery into n-gram counting (the repo's text machinery applied
    to a numeric series).

    Determinism: the hourly series and its sums are exact ints; the
    z-scores and breakpoint comparisons are mirrored float
    expressions on exact inputs; words and counts are then integers.

    Scale shape: the acf_hourly exchange; PAA + wording is O(hours)
    driver math (at a billion-hour archive the PAA itself is a
    map_batches window kernel — documented).  Output: (word, n) for
    every observed 3-letter motif.
    """
    ds = _read_events(sf_dir, ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        h = t["ts"].cast(pa.int64()).to_numpy() // 3_600_000_000
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u, type=pa.int64()), "n": pa.array(c.astype(np.int64))})

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: hour-grid groups
    )
    h = hourly["h"].to_numpy().astype(np.int64)
    lo, hi = int(h.min()), int(h.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[h - lo] = hourly["n"].to_numpy().astype(np.int64)
    words = _sax_words(dense)
    u, c = np.unique(words, return_counts=True)
    return rd.from_arrow(
        pa.table(
            {
                "word": pa.array(u, type=pa.string()),
                "n": pa.array(c.astype(np.int64), type=pa.int64()),
            }
        )
    )


def _sax_words(dense: np.ndarray) -> np.ndarray:
    """Shared SAX kernel: PAA -> z-normalize -> letters -> 3-grams."""
    n_blocks = len(dense) // SAX_PAA
    paa = dense[: n_blocks * SAX_PAA].reshape(n_blocks, SAX_PAA).mean(axis=1)
    mu, sd = float(paa.mean()), float(paa.std())
    z = (paa - mu) / sd
    letters = np.full(n_blocks, "a", dtype="<U1")
    for i, bp in enumerate(SAX_BREAKS):
        letters[z > bp] = "abcd"[i + 1]
    return np.array(
        ["".join(letters[i : i + SAX_WORD]) for i in range(n_blocks - SAX_WORD + 1)]
    )


def theil_u_eval(sf_dir: str) -> rd.Dataset:
    """Theil's U2 forecast-quality audit of the Kalman level tracker:
    one-step-ahead RMSE of the filter (predict today = yesterday's
    posterior level) divided by the naive no-change forecast's RMSE —
    U2 < 1 means the tracker genuinely beats persistence, the
    minimum bar every forecasting dashboard should print and most
    skip.

    Determinism: reuses kalman_smooth's exact daily series and fixed
    recursion; both RMSEs are mirrored float expressions over exact
    inputs.  Scale shape: the day-keyed cents reduce; O(days) driver
    math.  Output: one row (n_days, rmse_model, rmse_naive, theil_u2).
    """
    from ..stages.common import duckdb_round

    k = kalman_smooth(sf_dir).to_pandas().sort_values("day").reset_index(drop=True)  # bounded: day-grid rows
    obs = k["obs_cents"].to_numpy().astype(np.float64)
    level = k["level"].to_numpy()
    pred_model = level[:-1]  # yesterday's posterior predicts today
    pred_naive = obs[:-1]
    actual = obs[1:]
    rmse_m = float(np.sqrt(np.mean((actual - pred_model) ** 2)))
    rmse_n = float(np.sqrt(np.mean((actual - pred_naive) ** 2)))
    return rd.from_arrow(
        pa.table(
            {
                "n_days": pa.array([len(obs)], type=pa.int64()),
                "rmse_model": pa.array(duckdb_round(np.array([rmse_m]), 6), type=pa.float64()),
                "rmse_naive": pa.array(duckdb_round(np.array([rmse_n]), 6), type=pa.float64()),
                "theil_u2": pa.array(duckdb_round(np.array([rmse_m / rmse_n]), 6), type=pa.float64()),
            }
        )
    )
