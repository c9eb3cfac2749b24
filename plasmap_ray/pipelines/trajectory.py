"""Trajectory / movement analytics over the ``events`` table.

The reference's stream is element-at-a-time with no movement operators
(SURVEY.md §2.9); a geo training-data engine wants them.  Four
operators, all Ray-Data-first and all bit-exact against a DuckDB
mirror:

- ``trajectory_stats`` — per-user path length / net displacement /
  event count.  The per-user regroup is the coarse-partition run-scan
  of ``denormalize.assemble_ways`` (pipelines/denormalize.py:96): one
  task per ``user_id % parts`` slice sorts its slice and run-scans the
  user boundaries — NOT one task per user, so per-parent dispatch cost
  amortizes over the partition at 10^9-user scale.
- ``od_matrix`` — origin→destination Morton-cell flow counts.  A
  map-side combiner keeps only each user's per-batch extreme rows
  (first/last by (ts, event_id)), collapsing the shuffle payload to
  ≤2 rows × users per batch before the per-user regroup; the final
  (o_cell, d_cell) groupby is tiny (cells², not rows).
- ``spatial_self_join`` — all event pairs within ``eps`` degrees.
  Points are bucketed into eps-sized grid cells; same-cell pairs come
  from a self equi-join on the cell key and cross-cell pairs from a
  *half-neighborhood* join (4 of the 8 neighbor offsets), so every
  unordered pair is generated exactly once — no global dedup, no
  O(N²) candidate set; candidates are bounded by local density.
- ``stratified_sample`` — deterministic per-stratum Bernoulli sample
  via the fixture world's LCG-mix trick (fixtures.derive_lon):
  ``(event_id * MULT + ADD) % 2^31 / 2^31 < rate`` is pure integer +
  double arithmetic, so the engine and the SQL oracle select the
  identical row set with zero RNG state.

Distances are planar-degree Euclidean: ``+ * sqrt`` are correctly
rounded IEEE-754 ops, so segment lengths are bit-identical across
engines; each segment is fixed-pointed to int64
(``floor(seg * 1e9 + 0.5)``) before summing so partial-sum order can
never flip a double ulp (the k-means partial-sum trick,
pipelines/cluster.py).  Geodesic lengths for real use come from
``geometry.haversine_m`` (see ``denormalize.way_lengths``); the planar
metric here is what makes the independent SQL oracle possible.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from .. import cells, fixtures
from ..stages.common import safe_join

FP_SCALE = 1e9  # fixed-point: 1e-9 deg ~ 0.1 mm — far below any ulp drift
TRAJ_PARTS = 32  # coarse regroup partitions (≈ cluster cores at scale)
OD_PRECISION = cells.PRECISION_VERY_LOW  # ~80 km OD cells
EPS_DEG = 0.01  # self-join radius (~1.1 km N-S)
SAMPLE_MULT = 22695477  # Borland LCG multiplier — disjoint from fixture mixes
SAMPLE_ADD = 1
M31 = 1 << 31
# half neighborhood: each unordered adjacent-cell pair appears exactly once
HALF_OFFSETS = ((1, 0), (-1, 1), (0, 1), (1, 1))


def _read_events(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _derive_positions(t: pa.Table) -> pa.Table:
    ids = t["event_id"].to_numpy()
    t = t.append_column("lon", pa.array(fixtures.derive_lon(ids), type=pa.float64()))
    return t.append_column("lat", pa.array(fixtures.derive_lat(ids), type=pa.float64()))


def _seg_fp(dlon: np.ndarray, dlat: np.ndarray) -> np.ndarray:
    """Fixed-point planar segment length; floor(x*1e9+0.5) == DuckDB's
    CAST(floor(sqrt(...)*1e9+0.5) AS BIGINT) bit-for-bit (x >= 0)."""
    seg = np.sqrt(dlon * dlon + dlat * dlat)
    return np.floor(seg * FP_SCALE + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# trajectory_stats
# ---------------------------------------------------------------------------


def trajectory_stats(sf_dir: str, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Per-user trajectory: n_events, path length, net displacement.

    Order within a user is (ts, event_id) — the same total order the
    sessionizer uses.  Output fixed-point int64 columns so the sum is
    order-independent across partitions.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = t["user_id"].to_numpy()
        return t.append_column("part", pa.array(np.asarray(uid, np.int64) % parts, type=pa.int64()))

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "path_fp": pa.array([], type=pa.int64()),
            "disp_fp": pa.array([], type=pa.int64()),
        }
    )

    def regroup(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) == 0:
            return empty
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        bounds = np.nonzero(np.diff(uid))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(uid)]])
        fp = _seg_fp(np.diff(lon), np.diff(lat))
        if len(bounds):
            fp[bounds - 1] = 0  # cross-user segments don't exist
        csum = np.concatenate([[0], np.cumsum(fp)])
        path_fp = csum[ends - 1] - csum[starts]  # segments s..e-2 of run [s,e)
        disp_fp = _seg_fp(lon[ends - 1] - lon[starts], lat[ends - 1] - lat[starts])
        return pa.table(
            {
                "user_id": pa.array(uid[starts], type=pa.int64()),
                "n_events": pa.array(ends - starts, type=pa.int64()),
                "path_fp": pa.array(path_fp, type=pa.int64()),
                "disp_fp": pa.array(disp_fp, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(regroup, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# od_matrix
# ---------------------------------------------------------------------------


def od_matrix(sf_dir: str, precision: int = OD_PRECISION, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Origin→destination flows: users counted per (first-cell, last-cell).

    Stage 1 (combiner): per batch, keep only each user's first and last
    row by (ts, event_id) — the global first/last is among the per-batch
    extremes, so the shuffle moves ≤ 2·users·batches rows, not all events.
    Stage 2: coarse-partition run-scan picks the global extremes per user.
    Stage 3: Morton-encode both endpoints, tiny (o_cell, d_cell) count.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def extremes(t: pa.Table) -> pa.Table:
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = t["user_id"].to_numpy()
        if len(uid) == 0:
            return t.append_column("part", pa.array([], type=pa.int64()))
        bounds = np.nonzero(np.diff(uid))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(uid)]])
        keep = np.unique(np.concatenate([starts, ends - 1]))
        t = t.take(pa.array(keep))
        part = np.asarray(t["user_id"].to_numpy(), np.int64) % parts
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def od_pairs(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) == 0:
            return pa.table(
                {"o_cell": pa.array([], type=pa.int64()), "d_cell": pa.array([], type=pa.int64())}
            )
        ids = g["event_id"].to_numpy()
        bounds = np.nonzero(np.diff(uid))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(uid)]])
        o_ids, d_ids = ids[starts], ids[ends - 1]
        o_cell = cells.encode(fixtures.derive_lon(o_ids), fixtures.derive_lat(o_ids), precision)
        d_cell = cells.encode(fixtures.derive_lon(d_ids), fixtures.derive_lat(d_ids), precision)
        return pa.table(
            {
                "o_cell": pa.array(o_cell, type=pa.int64()),
                "d_cell": pa.array(d_cell, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(extremes, batch_format="pyarrow")
        .groupby("part")
        .map_groups(od_pairs, batch_format="pyarrow")
        .groupby(["o_cell", "d_cell"])
        .aggregate(Count(alias_name="n_users"))
    )


# ---------------------------------------------------------------------------
# spatial_self_join
# ---------------------------------------------------------------------------


def _cell_key(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    # +1 guard band keeps expanded neighbor coords non-negative; 2^21
    # rows per axis covers eps down to ~1.7e-4 deg over the world bbox
    return (cx + 1) * (1 << 21) + (cy + 1)


def spatial_self_join(
    sf_dir: str, eps: float = EPS_DEG, num_partitions: int = 8
) -> rd.Dataset:
    """All unordered event pairs within ``eps`` planar degrees.

    Grid cells are exactly ``eps`` wide, so any pair within ``eps``
    lands in the same or an adjacent cell.  ONE hash join: the probe
    side carries each point under 5 cell keys — its own cell (flagged
    ``own=1``) plus the 4 half-neighborhood offsets — against the build
    side keyed by own cell only.  Same-cell candidates arrive in both
    orders (dedup by ``id_a < id_b``); each adjacent-cell pair's cells
    satisfy exactly one half offset, so those candidates arrive exactly
    once (no dedup, order normalized after the distance filter).
    Output: (id_a, id_b, dist_fp) with id_a < id_b.

    At cluster scale the join is hash-partitioned on the cell key;
    candidate volume is the sum of products of adjacent-cell counts —
    bounded by local density, never O(N²).  Skewed hot cells shard the
    same way the salted tiling path does (spatial.tile_histogram_salted).
    """
    ds = _read_events(sf_dir, ["event_id"])
    eps2 = eps * eps

    def keyed(t: pa.Table, side: str) -> pa.Table:
        t = _derive_positions(t)
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        return pa.table(
            {
                f"id_{side}": t["event_id"],
                f"lon_{side}": t["lon"],
                f"lat_{side}": t["lat"],
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
            }
        )

    def own_cell(t: pa.Table) -> pa.Table:
        ck = _cell_key(t["cx"].to_numpy(), t["cy"].to_numpy())
        return t.drop_columns(["cx", "cy"]).append_column("ck", pa.array(ck, type=pa.int64()))

    def probe_expand(t: pa.Table) -> pa.Table:
        cx, cy = t["cx"].to_numpy(), t["cy"].to_numpy()
        t = t.drop_columns(["cx", "cy"])
        out = []
        for dx, dy in ((0, 0),) + HALF_OFFSETS:
            ck = _cell_key(cx + dx, cy + dy)
            own = np.full(len(ck), 1 if (dx, dy) == (0, 0) else 0, dtype=np.int8)
            out.append(
                t.append_column("ck", pa.array(ck, type=pa.int64())).append_column(
                    "own", pa.array(own, type=pa.int8())
                )
            )
        return pa.concat_tables(out)

    build = ds.map_batches(functools.partial(keyed, side="b"), batch_format="pyarrow").map_batches(
        own_cell, batch_format="pyarrow"
    )
    probe = ds.map_batches(functools.partial(keyed, side="a"), batch_format="pyarrow").map_batches(
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
        ia, ib, d2 = ia[keep], ib[keep], d2[keep]
        dist_fp = np.floor(np.sqrt(d2) * FP_SCALE + 0.5).astype(np.int64)
        return pa.table(
            {
                "id_a": pa.array(np.minimum(ia, ib), type=pa.int64()),
                "id_b": pa.array(np.maximum(ia, ib), type=pa.int64()),
                "dist_fp": pa.array(dist_fp, type=pa.int64()),
            }
        )

    return cand.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------

SAMPLE_RATES = {
    "click": 0.5,
    "view": 0.25,
    "purchase": 1.0,
    "signup": 0.1,
    "error": 0.05,
}


def sample_u(ids: np.ndarray) -> np.ndarray:
    """Deterministic uniform in [0,1) from the event id (SQL-mirrored)."""
    m = (np.asarray(ids, dtype=np.int64) * SAMPLE_MULT + SAMPLE_ADD) % M31
    return m / M31


def stratified_sample(sf_dir: str, rates: dict[str, float] | None = None) -> rd.Dataset:
    """Per-stratum deterministic Bernoulli sample of events.

    ``rates`` maps event_type → keep probability; unlisted types are
    dropped.  Pure map-side filter — no shuffle, no RNG state, and the
    identical row set falls out of the SQL mirror (the engine-vs-oracle
    check the seeded `sampled_event_stats` query cannot get from Ray's
    own `random_sample`).
    """
    rates = SAMPLE_RATES if rates is None else rates
    ds = _read_events(sf_dir, ["event_id", "user_id", "event_type", "value"])

    def pick(t: pa.Table) -> pa.Table:
        u = sample_u(t["event_id"].to_numpy())
        et = t["event_type"].to_numpy(zero_copy_only=False)
        rate = np.zeros(len(u), dtype=np.float64)
        for k, r in rates.items():
            rate[et == k] = r
        return t.filter(pa.array(u < rate))

    return ds.map_batches(pick, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# dwell_in_zone
# ---------------------------------------------------------------------------


def dwell_in_zone(sf_dir: str, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Time-in-zone: per (user, admin area), total dwell time.

    A trajectory segment (consecutive pings of one user, ordered by
    (ts, event_id)) contributes its duration to every zone containing
    BOTH endpoints — the geofence-dwell rule used for visit-duration
    and exposure analytics.  Zones here are the fixture admin rects
    with the same half-open containment the PiP oracle mirrors
    (lon >= min and < max); polygon zones route the endpoint test
    through stages.geo.PiPJoinActor instead, rest of the DAG unchanged.

    Scale shape: the per-user regroup is the coarse-partition run-scan
    (one task per ``user_id % parts`` slice, like trajectory_stats);
    the zone table is tiny and travels inside the task closure; the
    final (user, zone) groupby moves one row per (segment, zone) hit —
    durations are exact int64 microseconds so partial-sum order can
    never flip a value.
    """
    from ray.data.aggregate import Count, Sum

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])
    rects = fixtures.admin_rects()

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = t["user_id"].to_numpy()
        return t.append_column("part", pa.array(np.asarray(uid, np.int64) % parts, type=pa.int64()))

    def segments(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        out = {
            "user_id": pa.array([], type=pa.int64()),
            "rel_id": pa.array([], type=pa.int64()),
            "dur_us": pa.array([], type=pa.int64()),
        }
        if len(uid) < 2:
            return pa.table(out)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = uid[:-1] == uid[1:]  # segment i -> i+1 exists within a user
        dur = ts_us[1:] - ts_us[:-1]
        u_col, r_col, d_col = [], [], []
        for r in rects:
            inside = (
                (lon >= r["lon_min"]) & (lon < r["lon_max"])
                & (lat >= r["lat_min"]) & (lat < r["lat_max"])
            )
            hit = same & inside[:-1] & inside[1:]
            if hit.any():
                u_col.append(uid[:-1][hit])
                r_col.append(np.full(int(hit.sum()), r["rel_id"], dtype=np.int64))
                d_col.append(dur[hit])
        if not u_col:
            return pa.table(out)
        return pa.table(
            {
                "user_id": pa.array(np.concatenate(u_col), type=pa.int64()),
                "rel_id": pa.array(np.concatenate(r_col), type=pa.int64()),
                "dur_us": pa.array(np.concatenate(d_col), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(segments, batch_format="pyarrow")
        .groupby(["user_id", "rel_id"])
        .aggregate(Sum("dur_us", alias_name="dwell_us"), Count(alias_name="n_segments"))
    )


# ---------------------------------------------------------------------------
# stay_points (per-user dwell runs, gaps-and-islands)
# ---------------------------------------------------------------------------

STAY_PITCH = 0.5  # stay-cell pitch, planar degrees (coarse: a "place")
STAY_MIN_FIXES = 2


def stay_points(sf_dir: str, pitch: float = STAY_PITCH, min_fixes: int = STAY_MIN_FIXES, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Stay-point detection: maximal runs of CONSECUTIVE fixes (per
    user, (ts, event_id) order) inside one coarse lattice cell, kept
    when the run has >= ``min_fixes`` fixes — the visits/dwells
    extractor every mobility pipeline runs before POI matching.

    Same-cell runs are gaps-and-islands: the engine finds them with
    ONE coarse-partition run-scan (user_id % parts slices; sort the
    slice, diff on (user, cell), cumulative boundaries) — never one
    task per user, and only (user, cell, ts) triples shuffle.

    Output: (user_id, cx, cy, enter_us, exit_us, n_fixes); a user
    revisiting a cell after leaving yields DISTINCT rows (run
    identity, not (user, cell) identity).
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        ts = t["ts"].cast(pa.int64()).to_numpy()
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        cx = np.floor((lon - fixtures.LON_MIN) / pitch).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / pitch).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "event_id": t["event_id"],
                "tus": pa.array(ts, type=pa.int64()),
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
                "part": pa.array(uid % parts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "cx": pa.array([], type=pa.int64()),
            "cy": pa.array([], type=pa.int64()),
            "enter_us": pa.array([], type=pa.int64()),
            "exit_us": pa.array([], type=pa.int64()),
            "n_fixes": pa.array([], type=pa.int64()),
        }
    )

    def runs(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) == 0:
            return empty
        cx, cy = g["cx"].to_numpy(), g["cy"].to_numpy()
        tus = g["tus"].to_numpy()
        brk = (np.diff(uid) != 0) | (np.diff(cx) != 0) | (np.diff(cy) != 0)
        starts = np.concatenate([[0], np.nonzero(brk)[0] + 1])
        ends = np.concatenate([starts[1:], [len(uid)]])
        n = ends - starts
        keep = n >= min_fixes
        s, e = starts[keep], ends[keep]
        return pa.table(
            {
                "user_id": pa.array(uid[s], type=pa.int64()),
                "cx": pa.array(cx[s], type=pa.int64()),
                "cy": pa.array(cy[s], type=pa.int64()),
                "enter_us": pa.array(tus[s], type=pa.int64()),
                "exit_us": pa.array(tus[e - 1], type=pa.int64()),
                "n_fixes": pa.array(n[keep], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(runs, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# heading_histogram (per-user compass-octant distribution)
# ---------------------------------------------------------------------------


def _octants(dx: np.ndarray, dy: np.ndarray) -> np.ndarray:
    """8-way heading sector from exact comparisons (NO atan2 — libm
    results differ across engines by ulps; sign/magnitude comparisons
    are bit-exact everywhere).  Octant 0 = E..ENE, counter-clockwise.
    Zero-length segments must be filtered by the caller."""
    px, py = dx >= 0, dy >= 0
    ax, ay = np.abs(dx), np.abs(dy)
    conds = [
        px & py & (ax >= ay),
        px & py,
        ~px & py & (ay > ax),
        ~px & py,
        ~px & ~py & (ax >= ay),
        ~px & ~py,
        px & ~py & (ay > ax),
    ]
    return np.select(conds, list(range(7)), default=7).astype(np.int64)


def heading_histogram(sf_dir: str, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Per-user travel-direction histogram: consecutive fixes (the
    (ts, event_id) order) become movement vectors, binned into 8
    compass octants — the bearing-distribution feature mobility models
    train on.  Zero-displacement steps are dropped (no direction).

    Segment formation is the coarse-partition run-scan (one task per
    ``user_id % parts`` slice); per-partition octant counts are
    combined map-side so the final groupby moves ≤ users×8×parts rows.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "event_id": t["event_id"],
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy(), type=pa.int64()),
                "lon": t["lon"],
                "lat": t["lat"],
                "part": pa.array(uid % parts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "octant": pa.array([], type=pa.int64()),
            "n_segments": pa.array([], type=pa.int64()),
        }
    )

    def segments(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) < 2:
            return empty
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        dx, dy = np.diff(lon), np.diff(lat)
        same_user = np.diff(uid) == 0
        moved = ~((dx == 0) & (dy == 0))
        m = same_user & moved
        if not m.any():
            return empty
        u, oc = uid[1:][m], _octants(dx[m], dy[m])
        key = u * 8 + oc
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(uniq // 8, type=pa.int64()),
                "octant": pa.array(uniq % 8, type=pa.int64()),
                "n_segments": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    # each user lives wholly in one part-group, so per-group counts are
    # already global — no second aggregate needed
    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(segments, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# route_conformance (directed Hausdorff to a broadcast reference path)
# ---------------------------------------------------------------------------

# reference route: a polyline crossing the fixture world diagonally
ROUTE_PATH = (
    (6.1, 50.6),
    (6.4, 50.8),
    (6.7, 51.0),
    (7.0, 51.2),
    (7.3, 51.4),
    (7.6, 51.7),
    (7.9, 51.9),
)


def route_conformance(sf_dir: str) -> rd.Dataset:
    """How far each user strays from a reference route: per-event
    distance to the nearest route VERTEX, reduced per user to the max
    (= directed Hausdorff trajectory→route) and the sum (for mean
    deviation) — the map-matching QA metric.

    The route is the SMALL side: a constant broadcast into every task
    (never shuffled, never re-shipped per batch); each batch computes
    an (n_rows × n_vertices) vectorized distance matrix and reduces
    map-side to per-user (count, max, sum) partials, so the single
    groupby moves ≤ users×batches tiny rows.  Deviations are
    fixed-point int64 (``_seg_fp``), keeping max/sum order-free exact.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])
    vx = np.array([p[0] for p in ROUTE_PATH], dtype=np.float64)
    vy = np.array([p[1] for p in ROUTE_PATH], dtype=np.float64)

    def partial(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        dx = lon[:, None] - vx[None, :]
        dy = lat[:, None] - vy[None, :]
        d2 = (dx * dx + dy * dy).min(axis=1)
        dev = np.floor(np.sqrt(d2) * FP_SCALE + 0.5).astype(np.int64)
        order = np.argsort(uid, kind="stable")
        uid, dev = uid[order], dev[order]
        bounds = np.nonzero(np.diff(uid))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(uid)]])
        mx = np.maximum.reduceat(dev, starts) if len(uid) else np.array([], np.int64)
        csum = np.concatenate([[0], np.cumsum(dev)])
        return pa.table(
            {
                "user_id": pa.array(uid[starts] if len(uid) else np.array([], np.int64), type=pa.int64()),
                "n_events": pa.array(ends - starts, type=pa.int64()),
                "max_dev_fp": pa.array(mx, type=pa.int64()),
                "sum_dev_fp": pa.array(csum[ends] - csum[starts], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Max("max_dev_fp", alias_name="max_dev_fp"),
            Sum("sum_dev_fp", alias_name="sum_dev_fp"),
        )
    )


# ---------------------------------------------------------------------------
# colocation_join (spatio-temporal contact pairs)
# ---------------------------------------------------------------------------

COLOC_EPS = 0.1  # spatial radius, planar degrees (~11 km N-S; the fixture
# lon/lat lattice pitch is ~0.06 deg, so smaller radii find no pairs)
COLOC_TAU_US = 259_200_000_000  # temporal radius: 72 h, microseconds (the
# fixture's per-user event cadence is ~days apart at sf0.001, so shorter
# windows yield zero cross-user contacts there; 72 h gives 784 pairs at
# sf0.001 and 85k at sf0.01 — real signal at both test scales)
# 3-D half neighborhood over (dx, dy, dt): the 13 offsets that are
# lexicographically positive in (dt, dy, dx) order.  Own-bucket pairs
# arrive in both orders (dedup by id_a < id_b); every unordered
# adjacent-bucket pair satisfies exactly one half offset, so those
# candidates arrive exactly once — the 2-D discipline of
# spatial_self_join lifted one dimension.
COLOC_HALF_OFFSETS = tuple(
    (dx, dy, dt)
    for dt in (0, 1)
    for dy in (-1, 0, 1)
    for dx in (-1, 0, 1)
    if (dt, dy, dx) > (0, 0, 0)
)


def _coloc_key(cx: np.ndarray, cy: np.ndarray, tb: np.ndarray) -> np.ndarray:
    # (time bucket, x, y) packed: 2^21 per spatial axis (matches
    # _cell_key's guard-band scheme), time buckets in the high bits
    return ((tb + 1) * (1 << 42)) + ((cx + 1) * (1 << 21)) + (cy + 1)


def colocation_join(
    sf_dir: str,
    eps: float = COLOC_EPS,
    tau_us: int = COLOC_TAU_US,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Spatio-temporal co-location: how often each pair of DISTINCT
    users was observed within ``eps`` planar degrees AND ``tau_us``
    microseconds (the contact-tracing / companionship-mining join).

    Events bucket by (eps-wide spatial cell, tau-wide time bucket); a
    qualifying pair's buckets differ by at most 1 on every axis, so ONE
    hash join over the 3-D half-neighborhood expansion generates each
    unordered event pair exactly once — candidates are bounded by local
    spatio-temporal density, never O(N²).  The contact matrix then
    aggregates with user_a < user_b normalization.

    Output: (user_a, user_b, n_contacts) — one row per user pair,
    counting unordered EVENT pairs that qualified.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])
    eps2 = eps * eps

    def keyed(t: pa.Table, side: str) -> pa.Table:
        t = _derive_positions(t)
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        ts = t["ts"].cast(pa.int64()).to_numpy()
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        tb = ts // tau_us
        return pa.table(
            {
                f"id_{side}": t["event_id"],
                f"u_{side}": t["user_id"],
                f"ts_{side}": pa.array(ts, type=pa.int64()),
                f"lon_{side}": t["lon"],
                f"lat_{side}": t["lat"],
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
                "tb": pa.array(tb, type=pa.int64()),
            }
        )

    def own_bucket(t: pa.Table) -> pa.Table:
        ck = _coloc_key(t["cx"].to_numpy(), t["cy"].to_numpy(), t["tb"].to_numpy())
        return t.drop_columns(["cx", "cy", "tb"]).append_column("ck", pa.array(ck, type=pa.int64()))

    def probe_expand(t: pa.Table) -> pa.Table:
        cx, cy, tb = t["cx"].to_numpy(), t["cy"].to_numpy(), t["tb"].to_numpy()
        t = t.drop_columns(["cx", "cy", "tb"])
        out = []
        for dx, dy, dt in ((0, 0, 0),) + COLOC_HALF_OFFSETS:
            ck = _coloc_key(cx + dx, cy + dy, tb + dt)
            own = np.full(len(ck), 1 if (dx, dy, dt) == (0, 0, 0) else 0, dtype=np.int8)
            out.append(
                t.append_column("ck", pa.array(ck, type=pa.int64())).append_column(
                    "own", pa.array(own, type=pa.int8())
                )
            )
        return pa.concat_tables(out)

    build = ds.map_batches(functools.partial(keyed, side="b"), batch_format="pyarrow").map_batches(
        own_bucket, batch_format="pyarrow"
    )
    probe = ds.map_batches(functools.partial(keyed, side="a"), batch_format="pyarrow").map_batches(
        probe_expand, batch_format="pyarrow"
    )
    cand = safe_join(probe, build, join_type="inner", num_partitions=num_partitions, on=("ck",))

    def finish(t: pa.Table) -> pa.Table:
        ia = np.asarray(t["id_a"].to_numpy(), np.int64)
        ib = np.asarray(t["id_b"].to_numpy(), np.int64)
        ua = np.asarray(t["u_a"].to_numpy(), np.int64)
        ub = np.asarray(t["u_b"].to_numpy(), np.int64)
        own = t["own"].to_numpy()
        dlon = t["lon_b"].to_numpy() - t["lon_a"].to_numpy()
        dlat = t["lat_b"].to_numpy() - t["lat_a"].to_numpy()
        dts = np.abs(t["ts_b"].to_numpy() - t["ts_a"].to_numpy())
        d2 = dlon * dlon + dlat * dlat
        keep = (d2 <= eps2) & (dts <= tau_us) & (ua != ub) & ((own == 0) | (ia < ib))
        ua, ub = ua[keep], ub[keep]
        return pa.table(
            {
                "user_a": pa.array(np.minimum(ua, ub), type=pa.int64()),
                "user_b": pa.array(np.maximum(ua, ub), type=pa.int64()),
            }
        )

    return (
        cand.map_batches(finish, batch_format="pyarrow")
        .groupby(["user_a", "user_b"])
        .aggregate(Count(alias_name="n_contacts"))
    )


# ---------------------------------------------------------------------------
# radius_of_gyration (the canonical mobility-range metric)
# ---------------------------------------------------------------------------

ROG_FP = 1e9


def radius_of_gyration(sf_dir: str, num_partitions: int = 8) -> rd.Dataset:
    """Per-user radius of gyration: sqrt(mean squared distance of the
    user's fixes to their own centroid) — THE mobility-range feature
    (González et al., "Understanding individual human mobility
    patterns", Nature 453, 2008 — public).

    ONE user-sharded shuffle, no join: each hash shard holds its
    users' complete event sets, so centroid (fixed-point int64 sums,
    order-free) AND per-event squared deviations (fixed-pointed BEFORE
    the final sum) are computed in a single vectorized run-scan.  The
    only floats cross exactly one mirrored expression each.

    Root-cause note (round-3 flake fix): the previous plan hash-joined
    events against the centroid table with ``Dataset.join``; Ray
    2.49.2's JoinOperator emits a ZERO-COLUMN, schema-less block for
    every hash partition that received no rows
    (``_internal/execution/operators/join.py`` finalize() builds both
    sides from empty builders), and the streaming executor logs
    "Operator produced a RefBundle with a different schema ... may
    lead to unexpected behavior" as those bundles traverse downstream
    aggregates — the rare full-suite-load mismatch tracked in round 2.
    The run-scan plan has no join, no empty-partition bundles, and one
    less shuffle.

    Output: (user_id, n_events, sum_d2_fp, rog) with rog rounded 6.
    """
    from ..stages.common import duckdb_round as _rnd

    ds = _read_events(sf_dir, ["event_id", "user_id"])

    def fx(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        uid = t["user_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        return pa.table(
            {
                "user_id": t["user_id"],
                "lon": pa.array(lon, type=pa.float64()),
                "lat": pa.array(lat, type=pa.float64()),
                "fxl": pa.array(np.floor((lon - fixtures.LON_MIN) * ROG_FP + 0.5).astype(np.int64), type=pa.int64()),
                "fyl": pa.array(np.floor((lat - fixtures.LAT_MIN) * ROG_FP + 0.5).astype(np.int64), type=pa.int64()),
                "part": pa.array((uid % num_partitions).astype(np.int64), type=pa.int64()),
            }
        )

    def scan(g: pa.Table) -> pa.Table:
        # one hash shard of users; sort by user -> runs, all math
        # vectorized over run boundaries (np.add.reduceat)
        uid = g["user_id"].to_numpy()
        order = np.argsort(uid, kind="stable")
        uid = uid[order]
        lon = g["lon"].to_numpy()[order]
        lat = g["lat"].to_numpy()[order]
        fxl = g["fxl"].to_numpy()[order]
        fyl = g["fyl"].to_numpy()[order]
        starts = np.concatenate([[0], np.nonzero(uid[1:] != uid[:-1])[0] + 1])
        n = np.diff(np.append(starts, len(uid))).astype(np.int64)
        sx = np.add.reduceat(fxl, starts)
        sy = np.add.reduceat(fyl, starts)
        mlon = fixtures.LON_MIN + sx.astype(np.float64) / ROG_FP / n
        mlat = fixtures.LAT_MIN + sy.astype(np.float64) / ROG_FP / n
        dlon = lon - np.repeat(mlon, n)
        dlat = lat - np.repeat(mlat, n)
        d2fp = np.floor((dlon * dlon + dlat * dlat) * ROG_FP + 0.5).astype(np.int64)
        sum_d2 = np.add.reduceat(d2fp, starts)
        rog = _rnd(np.sqrt(sum_d2.astype(np.float64) / ROG_FP / n.astype(np.float64)), 6)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], type=pa.int64()),
                "n_events": pa.array(n, type=pa.int64()),
                "sum_d2_fp": pa.array(sum_d2, type=pa.int64()),
                "rog": pa.array(rog, type=pa.float64()),
            }
        )

    return ds.map_batches(fx, batch_format="pyarrow").groupby("part").map_groups(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cell_transition_matrix (step-level Markov mobility model)
# ---------------------------------------------------------------------------

TRANS_PITCH = 0.5  # transition cells (coarse "places", stay_points pitch)


def cell_transition_matrix(sf_dir: str, pitch: float = TRANS_PITCH, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """First-order mobility transition counts: for every consecutive
    same-user step ((ts, event_id) order), the (from-cell → to-cell)
    pair — the empirical Markov kernel mobility prediction trains on
    (od_matrix generalized from endpoints to every step).

    Engine shape: the per-user coarse-partition run-scan forms steps;
    per-partition packed-key np.unique pre-aggregates, so the final
    groupby moves distinct transitions only.  Self-transitions (staying
    in the cell) are kept — they ARE the diagonal of the kernel.

    Output: (fx, fy, tx, ty, n_steps).
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])
    gx = int(round(fixtures.LON_SPAN / pitch))
    gy = int(round(fixtures.LAT_SPAN / pitch))

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        cx = np.floor((lon - fixtures.LON_MIN) / pitch).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / pitch).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "event_id": t["event_id"],
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy(), type=pa.int64()),
                "cell": pa.array(cx * gy + cy, type=pa.int64()),
                "part": pa.array(uid % parts, type=pa.int64()),
            }
        )

    ncell = gx * gy
    empty = pa.table(
        {
            "fx": pa.array([], type=pa.int64()),
            "fy": pa.array([], type=pa.int64()),
            "tx": pa.array([], type=pa.int64()),
            "ty": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def steps(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) < 2:
            return empty
        cell = g["cell"].to_numpy()
        m = np.diff(uid) == 0
        if not m.any():
            return empty
        frm, to = cell[:-1][m], cell[1:][m]
        key = frm * ncell + to
        uniq, cnt = np.unique(key, return_counts=True)
        frm, to = uniq // ncell, uniq % ncell
        return pa.table(
            {
                "fx": pa.array(frm // gy, type=pa.int64()),
                "fy": pa.array(frm % gy, type=pa.int64()),
                "tx": pa.array(to // gy, type=pa.int64()),
                "ty": pa.array(to % gy, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(steps, batch_format="pyarrow")
        .groupby(["fx", "fy", "tx", "ty"])
        .aggregate(Sum("n", alias_name="n_steps"))
    )


# ---------------------------------------------------------------------------
# speed_audit (teleportation / GPS-glitch detection)
# ---------------------------------------------------------------------------

# max plausible speed, fixed-point 1e9 deg/s.  1e-4 deg/s ~ 11 m/s N-S:
# ~p80 of the fixture world's implied step speeds, so the audit flags a
# non-trivial teleport/ok mix (about 1 in 5 steps at sf0.01).
SPEED_VMAX_FP = 100_000
US_PER_S = 1_000_000


def speed_audit(sf_dir: str, vmax_fp: int = SPEED_VMAX_FP, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Per-user teleportation audit: consecutive steps whose implied
    speed exceeds ``vmax_fp`` (fixed-point deg/s) — the GPS-glitch /
    impossible-travel data-quality screen run before any trajectory
    model trains on the corpus.

    The speed test is pure int64: a step of length ``dist_fp`` (1e-9
    deg units) over ``dt_us`` microseconds teleports iff

        dist_fp * 1_000_000 > vmax_fp * dt_us

    (both products < 2^63 for the world bbox and any us-epoch gap), so
    the engine and the SQL mirror flag the identical step set — no
    division, no float speed.  A zero-duration step with nonzero
    distance is a teleport by this rule, which is the right answer for
    duplicate-timestamp glitches.

    Scale shape: same coarse-partition run-scan as trajectory_stats
    (one task per ``user_id % parts`` slice — per-user dispatch
    amortized); output is one row per user with >= 1 step.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = t["user_id"].to_numpy()
        tus = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        t = t.drop_columns(["ts"]).append_column("tus", pa.array(tus, type=pa.int64()))
        return t.append_column("part", pa.array(np.asarray(uid, np.int64) % parts, type=pa.int64()))

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_steps": pa.array([], type=pa.int64()),
            "n_teleports": pa.array([], type=pa.int64()),
            "max_jump_fp": pa.array([], type=pa.int64()),
        }
    )

    def audit(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) < 2:
            return empty
        m = np.diff(uid) == 0  # step i -> i+1 stays within one user
        if not m.any():
            return empty
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        tus = g["tus"].to_numpy()
        dist_fp = _seg_fp(np.diff(lon), np.diff(lat))[m]
        dt_us = np.diff(tus)[m]
        tele = dist_fp * US_PER_S > vmax_fp * dt_us
        su = uid[:-1][m]
        bounds = np.nonzero(np.diff(su))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(su)]])
        cs_t = np.concatenate([[0], np.cumsum(tele.astype(np.int64))])
        jump = np.where(tele, dist_fp, 0)
        mx = np.maximum.reduceat(jump, starts)
        return pa.table(
            {
                "user_id": pa.array(su[starts], type=pa.int64()),
                "n_steps": pa.array(ends - starts, type=pa.int64()),
                "n_teleports": pa.array(cs_t[ends] - cs_t[starts], type=pa.int64()),
                "max_jump_fp": pa.array(mx.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(audit, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# od_gravity (gravity-model expected flows + residuals)
# ---------------------------------------------------------------------------


def od_gravity(sf_dir: str, precision: int = OD_PRECISION) -> rd.Dataset:
    """Gravity-model screen over the OD matrix: for every observed
    (o_cell, d_cell) flow, the independence-model expectation
    ``n_o * n_d / total`` (row marginal x column marginal / grand
    total), the residual, and the chi-square contribution — the
    anomalous-corridor detector run on top of :func:`od_matrix`.

    Float discipline: marginals and the total are exact int64 sums;
    ``expected`` is the single IEEE expression
    ``(double)n_o * (double)n_d / (double)total`` evaluated in the
    same association order by the engine (NumPy) and the oracle
    (DuckDB), so resid/chi2 are bit-identical too.

    Scale shape: the OD matrix is an aggregate (rows bounded by
    observed cell pairs); marginals are two tiny groupbys of it
    (rows bounded by #cells) broadcast back as dicts — no second
    shuffle of the matrix.
    """
    od = od_matrix(sf_dir, precision=precision).materialize()
    o_marg = {r["o_cell"]: r["sum(n_users)"] for r in od.groupby("o_cell").aggregate(Sum("n_users")).take_all()}
    d_marg = {r["d_cell"]: r["sum(n_users)"] for r in od.groupby("d_cell").aggregate(Sum("n_users")).take_all()}
    total = float(sum(o_marg.values()))

    def enrich(t: pa.Table) -> pa.Table:
        o = t["o_cell"].to_numpy()
        d = t["d_cell"].to_numpy()
        n = t["n_users"].to_numpy().astype(np.float64)
        n_o = np.array([o_marg[v] for v in o], dtype=np.int64)
        n_d = np.array([d_marg[v] for v in d], dtype=np.int64)
        expected = n_o.astype(np.float64) * n_d.astype(np.float64) / total
        resid = n - expected
        chi2 = resid * resid / expected
        return (
            t.append_column("n_o", pa.array(n_o, type=pa.int64()))
            .append_column("n_d", pa.array(n_d, type=pa.int64()))
            .append_column("expected", pa.array(expected, type=pa.float64()))
            .append_column("resid", pa.array(resid, type=pa.float64()))
            .append_column("chi2", pa.array(chi2, type=pa.float64()))
        )

    return od.map_batches(enrich, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# geofence_transitions (zone enter/exit event stream)
# ---------------------------------------------------------------------------


def geofence_transitions(sf_dir: str, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Geofence transition stream: one row per ping where a user's
    containing zone CHANGED since their previous ping — the enter/exit
    event feed geofencing products emit (reference analogue: plasmap's
    per-area containment queries gain the temporal derivative).

    Zone per ping = the smallest ``rel_id`` among containing fixture
    admin rects, else -1 (outside every fence); overlapping fences
    resolve deterministically by that min rule on BOTH engines.

    Scale shape: zone assignment is a stateless vectorized probe of
    the broadcast fence table inside ``map_batches`` (the fence set is
    small; a planet-scale fence set routes through
    ``stages.geo.PiPJoinActor`` instead, rest unchanged); the
    per-user ordering is the coarse-partition run-scan
    (``user_id % parts`` — one task per slice, not per user).

    Output: (user_id, ts, from_zone, to_zone).
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])
    rects = fixtures.admin_rects()
    sentinel = np.iinfo(np.int64).max

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        best = np.full(len(uid), sentinel, dtype=np.int64)
        for r in rects:
            inside = (
                (lon >= r["lon_min"]) & (lon < r["lon_max"])
                & (lat >= r["lat_min"]) & (lat < r["lat_max"])
            )
            np.minimum(best, np.where(inside, np.int64(r["rel_id"]), sentinel), out=best)
        zone = np.where(best == sentinel, np.int64(-1), best)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "zone": pa.array(zone, type=pa.int64()),
                "part": pa.array(uid % parts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.timestamp("us")),
            "from_zone": pa.array([], type=pa.int64()),
            "to_zone": pa.array([], type=pa.int64()),
        }
    )

    def scan(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) < 2:
            return empty
        zone = g["zone"].to_numpy()
        chg = (uid[1:] == uid[:-1]) & (zone[1:] != zone[:-1])
        idx = np.nonzero(chg)[0] + 1
        if len(idx) == 0:
            return empty
        return pa.table(
            {
                "user_id": pa.array(uid[idx], type=pa.int64()),
                "ts": g["ts"].take(pa.array(idx, type=pa.int64())),
                "from_zone": pa.array(zone[idx - 1], type=pa.int64()),
                "to_zone": pa.array(zone[idx], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(scan, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# trip_stats (gap-segmented per-trip movement summaries)
# ---------------------------------------------------------------------------

TRIP_GAP_MIN = 30  # a silence longer than this starts a new trip


def trip_stats(sf_dir: str, gap_min: int = TRIP_GAP_MIN, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Trip segmentation + per-trip summary: a user's pings split into
    trips wherever the inter-ping silence exceeds ``gap_min`` minutes
    (the sessionizer's rule applied to movement), then each trip
    reduces to its event count, duration, and fixed-point path length
    — the feed for mode-inference / travel-demand models.

    Scale shape: the same coarse-partition per-user run-scan as
    ``trajectory_stats`` (one task per ``user_id % parts`` slice); trip
    boundaries and segment sums are vectorized run arithmetic inside
    the slice, and the output is one row per trip, never per ping.

    Output: (user_id, trip_seq, n_events, dur_us, path_fp) with
    trip_seq numbered 1.. per user in time order.
    """
    gap_us = gap_min * 60_000_000
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return t.append_column("part", pa.array(uid % parts, type=pa.int64()))

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "trip_seq": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "dur_us": pa.array([], type=pa.int64()),
            "path_fp": pa.array([], type=pa.int64()),
        }
    )

    def scan(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        n = len(uid)
        if n == 0:
            return empty
        ts = g["ts"].cast(pa.int64()).to_numpy()
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        same = np.concatenate([[False], uid[1:] == uid[:-1]])
        gap_ok = np.concatenate([[False], (ts[1:] - ts[:-1]) <= gap_us])
        # a row CONTINUES the previous trip iff same user and small gap
        cont = same & gap_ok
        trip_start = ~cont
        trip_id = np.cumsum(trip_start) - 1  # 0.. over the whole slice
        # per-user trip ordinal: trips are contiguous and time-ordered
        starts = np.nonzero(trip_start)[0]
        start_uid = uid[starts]
        first_of_user = np.concatenate([[True], start_uid[1:] != start_uid[:-1]])
        base = np.maximum.accumulate(np.where(first_of_user, np.arange(len(starts)), 0))
        trip_seq = (np.arange(len(starts)) - base + 1).astype(np.int64)
        # segment contributions: segment i-1 -> i belongs to trip_id[i] iff cont[i]
        seg = np.zeros(n, dtype=np.int64)
        if n > 1:
            fp = _seg_fp(np.diff(lon), np.diff(lat))
            seg[1:] = np.where(cont[1:], fp, 0)
        # exact int64 path sums (bincount weights would round-trip float)
        path_i = np.zeros(len(starts), dtype=np.int64)
        np.add.at(path_i, trip_id, seg)
        cnt = np.bincount(trip_id, minlength=len(starts)).astype(np.int64)
        ends = np.concatenate([starts[1:], [n]]) - 1
        dur = ts[ends] - ts[starts]
        return pa.table(
            {
                "user_id": pa.array(start_uid, type=pa.int64()),
                "trip_seq": pa.array(trip_seq, type=pa.int64()),
                "n_events": pa.array(cnt, type=pa.int64()),
                "dur_us": pa.array(dur, type=pa.int64()),
                "path_fp": pa.array(path_i, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(scan, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# frechet_conformance (discrete Fréchet distance to the reference route)
# ---------------------------------------------------------------------------


def _frechet_fp(lon: np.ndarray, lat: np.ndarray, vx: np.ndarray, vy: np.ndarray) -> int:
    """Discrete Fréchet distance (fixed-point int64) between one user's
    ordered trajectory and the reference path — the classic coupled-walk
    DP; all comparisons on exact int64 distances, so the result is
    schedule- and engine-independent."""
    dx = lon[:, None] - vx[None, :]
    dy = lat[:, None] - vy[None, :]
    d = np.floor(np.sqrt(dx * dx + dy * dy) * FP_SCALE + 0.5).astype(np.int64)
    m = d.shape[1]
    ca = np.empty(m, dtype=np.int64)
    ca[0] = d[0, 0]
    for j in range(1, m):
        ca[j] = max(ca[j - 1], d[0, j])
    for i in range(1, d.shape[0]):
        prev = ca.copy()
        ca[0] = max(prev[0], d[i, 0])
        for j in range(1, m):
            ca[j] = max(d[i, j], min(ca[j - 1], prev[j], prev[j - 1]))
    return int(ca[m - 1])


def frechet_conformance(sf_dir: str, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Route conformance, order-aware: the discrete Fréchet distance of
    each user's (ts, event_id)-ordered trajectory to the broadcast
    reference route — unlike the Hausdorff view (route_conformance),
    Fréchet penalizes walking the route BACKWARDS or skipping ahead,
    which is what map-matching QA actually wants.

    Shape: the DP needs each user's full ordered sequence, so users
    regroup via the coarse-partition run-scan (one task per
    ``user_id %% parts`` slice, never one task per user); the route is
    a broadcast constant.  Distances are fixed-point int64, making the
    max/min DP bit-exact — the golden oracle replays the identical DP
    locally.  Output: (user_id, n_events, frechet_fp).
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])
    vx = np.array([p[0] for p in ROUTE_PATH], dtype=np.float64)
    vy = np.array([p[1] for p in ROUTE_PATH], dtype=np.float64)

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return t.append_column("part", pa.array(uid % parts, type=pa.int64()))

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "frechet_fp": pa.array([], type=pa.int64()),
        }
    )

    def regroup(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = np.asarray(g["user_id"].to_numpy(), np.int64)
        if len(uid) == 0:
            return empty
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        bounds = np.nonzero(np.diff(uid))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(uid)]])
        vals = [ _frechet_fp(lon[s:e], lat[s:e], vx, vy) for s, e in zip(starts, ends) ]
        return pa.table(
            {
                "user_id": pa.array(uid[starts], type=pa.int64()),
                "n_events": pa.array(ends - starts, type=pa.int64()),
                "frechet_fp": pa.array(np.asarray(vals, dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(regroup, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# cotravel_pairs (user-pair co-occurrence over (cell, day) slots)
# ---------------------------------------------------------------------------

COTRAVEL_PITCH = 0.1  # cell pitch, planar degrees (the GI lattice)
COTRAVEL_MIN_SHARED = 2
DAY_US = 86_400_000_000


def cotravel_pairs(
    sf_dir: str, pitch: float = COTRAVEL_PITCH, min_shared: int = COTRAVEL_MIN_SHARED, parts: int = TRAJ_PARTS
) -> rd.Dataset:
    """Co-travel detection: user PAIRS who share at least ``min_shared``
    distinct (cell, day) slots — the aggregate-level companion to
    colocation_join (which emits event pairs): "who moves together?",
    the contact-graph builder.

    Shape: events reduce to DISTINCT (user, cell, day) slots (one
    slot-keyed groupby); slot-sharded run-scans emit each unordered
    user pair once per shared slot (pairs_in_key_runs — bounded by slot
    occupancy², never users²); one pair-keyed count + threshold.
    All-integer: bit-exact.  Output (user_a, user_b, n_shared).
    """
    from ray.data.aggregate import Count as _Count

    from .dedup import pairs_in_key_runs

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def slots(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / pitch).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / pitch).astype(np.int64)
        day = t["ts"].cast(pa.int64()).to_numpy() // DAY_US
        key = (cx * 1024 + cy) * 131072 + day  # day < 2^17 until year 2328
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        tbl = pa.table({"key": pa.array(key, type=pa.int64()), "user_id": pa.array(uid)})
        # batch-local distinct before the shuffle
        import pandas as _pd

        df = tbl.to_pandas().drop_duplicates()  # bounded: per-batch distinct combiner (inside map, not a driver collect)
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = (
        ds.map_batches(slots, batch_format="pyarrow")
        .groupby(["key", "user_id"])
        .aggregate(_Count(alias_name="_n"))
        .select_columns(["key", "user_id"])
    )

    def add_part(t: pa.Table) -> pa.Table:
        part = t["key"].to_numpy().astype(np.int64) % parts
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def shard_pairs(g: pa.Table) -> pa.Table:
        keys = g["key"].to_numpy().astype(np.int64)
        uids = g["user_id"].to_numpy().astype(np.int64)
        ia, ib, _ = pairs_in_key_runs(keys, uids, lambda i, j: np.zeros(len(i), dtype=np.int64))
        return pa.table(
            {
                "user_a": pa.array(uids[ia], type=pa.int64()),
                "user_b": pa.array(uids[ib], type=pa.int64()),
            }
        )

    pairs = (
        distinct.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(shard_pairs, batch_format="pyarrow")
    )
    return (
        pairs.groupby(["user_a", "user_b"])
        .aggregate(_Count(alias_name="n_shared"))
        .filter(expr=f"n_shared >= {min_shared}")
        .sort(["user_a", "user_b"])
    )


# ---------------------------------------------------------------------------
# home_cells (modal-cell home-location inference)
# ---------------------------------------------------------------------------


def home_cells(sf_dir: str, pitch: float = COTRAVEL_PITCH) -> rd.Dataset:
    """Home-location inference: each user's modal lattice cell (most
    pings; ties to the smaller cell key) with its share of the user's
    activity — the anchor-point primitive behind OD normalization and
    k-anonymity risk scoring.  All-integer counts, one mirrored share
    division; the per-user argmax is a user-bounded regroup.
    Output: (user_id, cx, cy, n_pings, n_total, share)."""
    from ray.data.aggregate import Sum as _Sum

    ds = _read_events(sf_dir, ["event_id", "user_id"])

    def ucell_counts(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / pitch).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / pitch).astype(np.int64)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        key = (uid * 1024 + cx) * 1024 + cy
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(uniq // (1024 * 1024), type=pa.int64()),
                "cx": pa.array((uniq // 1024) % 1024, type=pa.int64()),
                "cy": pa.array(uniq % 1024, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = (
        ds.map_batches(ucell_counts, batch_format="pyarrow")
        .groupby(["user_id", "cx", "cy"])
        .aggregate(_Sum("n", alias_name="n"))
    )

    def argmax(g):
        import pandas as pd

        from ..stages.common import duckdb_round as _dr

        total = int(g["n"].sum())
        g = g.sort_values(["n", "cx", "cy"], ascending=[False, True, True]).head(1)
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "cx": [int(g["cx"].iloc[0])],
                "cy": [int(g["cy"].iloc[0])],
                "n_pings": [int(g["n"].iloc[0])],
                "n_total": [total],
                "share": [float(_dr(np.array([g["n"].iloc[0] / total]), 6)[0])],
            }
        )

    return counts.groupby("user_id").map_groups(argmax, batch_format="pandas")


def rayleigh_test(sf_dir: str, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Per-user Rayleigh test of directional uniformity (circular
    statistics): movement unit vectors from consecutive fixes give the
    mean resultant length r̄ and z = n·r̄² — z large ⇒ the user's
    travel has a preferred bearing (commuter), z≈0 ⇒ isotropic wander;
    the circular-stats sibling of heading_histogram's octant counts
    (Mardia & Jupp 2000 §6.3).

    Determinism: each segment's unit components are pinned ONCE to
    int64 fixed-point (floor(u·FP + 0.5)) inside the run-scan task, so
    the per-user Σcos/Σsin are exact integer sums and r̄/z are single
    mirrored float expressions over them.  Zero-displacement steps
    are dropped (no direction), users with <2 moving segments too.

    Scale shape: the coarse-partition run-scan (user_id % parts tasks);
    per-user int64 triples leave the task, one user-keyed fold.
    Output: (user_id, n_segments, sum_cos_fp, sum_sin_fp,
    mean_resultant, rayleigh_z).
    """
    from ray.data.aggregate import Sum as _Sum

    from ..stages.common import duckdb_round as _dr

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "event_id": t["event_id"],
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy(), type=pa.int64()),
                "lon": t["lon"],
                "lat": t["lat"],
                "part": pa.array(uid % parts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_segments": pa.array([], type=pa.int64()),
            "sum_cos_fp": pa.array([], type=pa.int64()),
            "sum_sin_fp": pa.array([], type=pa.int64()),
        }
    )

    def fold(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) < 2:
            return empty
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        dx, dy = np.diff(lon), np.diff(lat)
        same = uid[1:] == uid[:-1]
        norm = np.sqrt(dx * dx + dy * dy)
        m = same & (norm > 0.0)
        if not m.any():
            return empty
        u = uid[1:][m]
        cfp = np.floor(dx[m] / norm[m] * FP_SCALE + 0.5).astype(np.int64)
        sfp = np.floor(dy[m] / norm[m] * FP_SCALE + 0.5).astype(np.int64)
        import pandas as pd

        df = pd.DataFrame({"u": u, "c": cfp, "s": sfp})
        gsum = df.groupby("u", sort=True).agg(n=("c", "size"), c=("c", "sum"), s=("s", "sum"))
        return pa.table(
            {
                "user_id": pa.array(gsum.index.to_numpy().astype(np.int64)),
                "n_segments": pa.array(gsum["n"].to_numpy().astype(np.int64)),
                "sum_cos_fp": pa.array(gsum["c"].to_numpy().astype(np.int64)),
                "sum_sin_fp": pa.array(gsum["s"].to_numpy().astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            _Sum("n_segments", alias_name="n_segments"),
            _Sum("sum_cos_fp", alias_name="sum_cos_fp"),
            _Sum("sum_sin_fp", alias_name="sum_sin_fp"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_segments"].to_numpy().astype(np.float64)
        c = t["sum_cos_fp"].to_numpy().astype(np.float64) / FP_SCALE
        s = t["sum_sin_fp"].to_numpy().astype(np.float64) / FP_SCALE
        keep = n >= 2
        r_bar = np.sqrt(c * c + s * s) / np.maximum(n, 1.0)
        z = n * (r_bar * r_bar)
        return pa.table(
            {
                "user_id": t["user_id"].filter(pa.array(keep)),
                "n_segments": pa.array(t["n_segments"].to_numpy()[keep], type=pa.int64()),
                "sum_cos_fp": pa.array(t["sum_cos_fp"].to_numpy()[keep], type=pa.int64()),
                "sum_sin_fp": pa.array(t["sum_sin_fp"].to_numpy()[keep], type=pa.int64()),
                "mean_resultant": pa.array(_dr(r_bar[keep], 6), type=pa.float64()),
                "rayleigh_z": pa.array(_dr(z[keep], 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def turn_histogram(sf_dir: str, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Per-user TURN histogram: consecutive movement segments (zero-
    displacement steps dropped, the heading_histogram stream) become
    turn transitions — the octant difference (mod 8) between a segment
    and the previous kept segment of the same user.  Turn 0 = straight
    on, 4 = reversal; the turning-behavior feature (route complexity,
    bot-like ping-ponging) mobility models consume beside headings.

    Scale shape: identical to heading_histogram — ONE coarse-partition
    exchange (user_id % parts), per-slice vectorized diff of the kept-
    segment octant stream, per-group (user, turn) counts are already
    global because a user lives wholly in one slice.

    Output: (user_id, turn, n_turns), turn in 0..7.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "event_id": t["event_id"],
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy(), type=pa.int64()),
                "lon": t["lon"],
                "lat": t["lat"],
                "part": pa.array(uid % parts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "turn": pa.array([], type=pa.int64()),
            "n_turns": pa.array([], type=pa.int64()),
        }
    )

    def turns(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) < 3:
            return empty
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        dx, dy = np.diff(lon), np.diff(lat)
        keep = (np.diff(uid) == 0) & ~((dx == 0) & (dy == 0))
        if keep.sum() < 2:
            return empty
        su = uid[1:][keep]
        oc = _octants(dx[keep], dy[keep])
        same = su[1:] == su[:-1]
        if not same.any():
            return empty
        turn = (oc[1:] - oc[:-1]) % 8
        u, tn = su[1:][same], turn[same]
        key = u * 8 + tn
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(uniq // 8, type=pa.int64()),
                "turn": pa.array(uniq % 8, type=pa.int64()),
                "n_turns": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(turns, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# path_crossings (geometric segment-intersection join between users)
# ---------------------------------------------------------------------------

CROSS_MAX_SEG = 0.3  # local-move cutoff (deg); teleport hops are excluded
CROSS_CELL = 0.3  # bin size == cutoff -> a segment bbox covers <= 2x2 cells
CROSS_MAX_CELL_SEGS = 4096  # skew cap per cell (truncation is logged)


def path_crossings(sf_dir: str, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Pairs of users whose movement segments PROPERLY cross, with the
    crossing count per user pair — the segment-intersection join at the
    core of vector overlay / planarization engines, here over event
    trajectories (consecutive fixes in (ts, event_id) order).

    Only local moves (planar length < ``CROSS_MAX_SEG`` deg) enter the
    join: the fixture world's long teleport hops (cf. ``speed_audit``)
    carry no geometry worth intersecting, and the cutoff is what makes
    cell binning effective — a bounded segment covers at most 2x2 bins
    of size ``CROSS_CELL``.

    Shape: per-user segment formation is the coarse-partition run-scan
    (one task per ``user_id % parts`` slice); segments explode to their
    bbox cover cells (<= 4 rows each); the all-to-all is a groupby on
    the cell key (cells >> cores at scale); inside a cell the proper-
    crossing test is one vectorized orientation-sign pass over the
    candidate pair block; a pair crossing in a cell shared by both
    bboxes can surface from up to 4 cells, so pairs dedup on
    (seg_a, seg_b) before the user-pair count.  Proper crossing =
    strict sign test (shared endpoints / collinear overlap excluded),
    mirrored expression-for-expression in the DuckDB oracle.
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "event_id": t["event_id"],
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy(), type=pa.int64()),
                "lon": t["lon"],
                "lat": t["lat"],
                "part": pa.array(uid % parts, type=pa.int64()),
            }
        )

    seg_schema = {
        "cell": pa.int64(),
        "seg_id": pa.int64(),
        "user_id": pa.int64(),
        "x1": pa.float64(),
        "y1": pa.float64(),
        "x2": pa.float64(),
        "y2": pa.float64(),
    }
    seg_empty = pa.table({k: pa.array([], type=v) for k, v in seg_schema.items()})

    def segments(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) < 2:
            return seg_empty
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        eid = g["event_id"].to_numpy()
        x1, y1, x2, y2 = lon[:-1], lat[:-1], lon[1:], lat[1:]
        dx, dy = x2 - x1, y2 - y1
        m = (np.diff(uid) == 0) & (np.sqrt(dx * dx + dy * dy) < CROSS_MAX_SEG)
        if not m.any():
            return seg_empty
        x1, y1, x2, y2, sid, su = x1[m], y1[m], x2[m], y2[m], eid[:-1][m], uid[:-1][m]
        cx_lo = np.floor(np.minimum(x1, x2) / CROSS_CELL).astype(np.int64)
        cx_hi = np.floor(np.maximum(x1, x2) / CROSS_CELL).astype(np.int64)
        cy_lo = np.floor(np.minimum(y1, y2) / CROSS_CELL).astype(np.int64)
        cy_hi = np.floor(np.maximum(y1, y2) / CROSS_CELL).astype(np.int64)
        out = {k: [] for k in seg_schema}
        for ox in (0, 1):
            for oy in (0, 1):
                cx = cx_lo + ox
                cy = cy_lo + oy
                keep = (cx <= cx_hi) & (cy <= cy_hi)
                out["cell"].append(cx[keep] * 100000 + cy[keep])
                out["seg_id"].append(sid[keep])
                out["user_id"].append(su[keep])
                out["x1"].append(x1[keep])
                out["y1"].append(y1[keep])
                out["x2"].append(x2[keep])
                out["y2"].append(y2[keep])
        return pa.table(
            {k: pa.array(np.concatenate(v), type=seg_schema[k]) for k, v in out.items()}
        )

    segs = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(segments, batch_format="pyarrow")
    )

    pair_empty = pa.table(
        {
            "seg_a": pa.array([], type=pa.int64()),
            "seg_b": pa.array([], type=pa.int64()),
            "user_a": pa.array([], type=pa.int64()),
            "user_b": pa.array([], type=pa.int64()),
        }
    )

    def cross_in_cell(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return pair_empty
        if n > CROSS_MAX_CELL_SEGS:
            import logging

            logging.getLogger(__name__).warning(
                "path_crossings: cell with %d segments truncated to %d", n, CROSS_MAX_CELL_SEGS
            )
            g = g.sort_by([("seg_id", "ascending")]).slice(0, CROSS_MAX_CELL_SEGS)
            n = CROSS_MAX_CELL_SEGS
        sid = g["seg_id"].to_numpy()
        uid = g["user_id"].to_numpy()
        x1, y1 = g["x1"].to_numpy(), g["y1"].to_numpy()
        x2, y2 = g["x2"].to_numpy(), g["y2"].to_numpy()
        ai, bi = np.triu_indices(n, k=1)
        keep = uid[ai] != uid[bi]
        ai, bi = ai[keep], bi[keep]
        # proper crossing: both straddle tests strict (expression order
        # mirrors the SQL oracle term for term)
        d1 = (x1[bi] - x1[ai]) * (y2[ai] - y1[ai]) - (y1[bi] - y1[ai]) * (x2[ai] - x1[ai])
        d2 = (x2[bi] - x1[ai]) * (y2[ai] - y1[ai]) - (y2[bi] - y1[ai]) * (x2[ai] - x1[ai])
        d3 = (x1[ai] - x1[bi]) * (y2[bi] - y1[bi]) - (y1[ai] - y1[bi]) * (x2[bi] - x1[bi])
        d4 = (x2[ai] - x1[bi]) * (y2[bi] - y1[bi]) - (y2[ai] - y1[bi]) * (x2[bi] - x1[bi])
        hit = (d1 * d2 < 0) & (d3 * d4 < 0)
        ai, bi = ai[hit], bi[hit]
        sa, sb = sid[ai], sid[bi]
        swap = sa > sb
        return pa.table(
            {
                "seg_a": pa.array(np.where(swap, sb, sa), type=pa.int64()),
                "seg_b": pa.array(np.where(swap, sa, sb), type=pa.int64()),
                "user_a": pa.array(np.minimum(uid[ai], uid[bi]), type=pa.int64()),
                "user_b": pa.array(np.maximum(uid[ai], uid[bi]), type=pa.int64()),
            }
        )

    pairs = segs.groupby("cell").map_groups(cross_in_cell, batch_format="pyarrow")
    uniq = pairs.groupby(["seg_a", "seg_b"]).aggregate(
        Min("user_a", alias_name="user_a"), Min("user_b", alias_name="user_b")
    )
    return uniq.groupby(["user_a", "user_b"]).aggregate(Count(alias_name="n_crossings"))


# ---------------------------------------------------------------------------
# displacement_histogram (Lévy-flight magnitude census over steps)
# ---------------------------------------------------------------------------


def displacement_histogram(sf_dir: str, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Order-of-magnitude census of consecutive-step displacements —
    the Lévy-flight / scale-free-mobility audit: human movement shows a
    heavy-tailed step-length distribution, so the per-decade fractions
    (not the mean, which the tail dominates) are the stable descriptor
    a mobility model is validated against.

    Buckets are DECIMAL-DIGIT COUNTS of the fixed-point step length
    (1e-9 deg units): mag = number of digits of dist_fp, 0 for a
    zero-length step — pure integer arithmetic on both engines (no
    log2/log10-of-float boundary hazard at exact powers).

    Scale shape: the speed_audit coarse-partition run-scan emits
    per-partition (mag, n) combiner rows; a <=20-key groupby and a
    20-row driver finalize follow.  Output: (mag, n_steps, frac).
    """
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = t["user_id"].to_numpy()
        tus = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        t = t.drop_columns(["ts"]).append_column("tus", pa.array(tus, type=pa.int64()))
        return t.append_column("part", pa.array(np.asarray(uid, np.int64) % parts, type=pa.int64()))

    empty = pa.table({"mag": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())})

    def census(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) < 2:
            return empty
        m = np.diff(uid) == 0
        if not m.any():
            return empty
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        dist_fp = _seg_fp(np.diff(lon), np.diff(lat))[m]
        mag = np.zeros(len(dist_fp), dtype=np.int64)
        x = dist_fp.copy()
        while (x > 0).any():  # digit count: bounded 19-step vectorized loop
            mag += (x > 0).astype(np.int64)
            x //= 10
        u, c = np.unique(mag, return_counts=True)
        return pa.table({"mag": pa.array(u, type=pa.int64()), "n": pa.array(c.astype(np.int64))})

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(census, batch_format="pyarrow")
        .groupby("mag")
        .aggregate(Sum("n", alias_name="n_steps"))
        .to_pandas()  # bounded: per-part partials (fixed partition count)
        .sort_values("mag")
        .reset_index(drop=True)
    )
    from ..stages.common import duckdb_round

    n = agg["n_steps"].to_numpy().astype(np.int64)
    tot = float(n.sum())
    return rd.from_arrow(
        pa.table(
            {
                "mag": pa.array(agg["mag"].to_numpy(), type=pa.int64()),
                "n_steps": pa.array(n, type=pa.int64()),
                "frac": pa.array(duckdb_round(n.astype(np.float64) / tot, 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# transition_entropy (per-origin-cell entropy of the Markov kernel row)
# ---------------------------------------------------------------------------

ENTROPY_FP = 1e9  # fixed-point pitch for n·ln(n) terms (cell_entropy discipline)


def transition_entropy(sf_dir: str, pitch: float = TRANS_PITCH) -> rd.Dataset:
    """Per-origin-cell Shannon entropy of the OUTGOING transition
    distribution — the row-wise uncertainty of the empirical Markov
    kernel (cell_transition_matrix): H ≈ 0 means movement from this
    cell is predictable, H ≈ ln(k) means uniform over k destinations.
    The mobility-predictability screen (Song et al.'s Ω) at cell grain.

    Order discipline (cell_entropy's): each (from, to) row fixes
    n·ln(n) to int64 ONCE; the per-origin sums are then exact-integer
    in any accumulation order, and H = ln(n) − (Σ nᵢ ln nᵢ)/n is one
    mirrored float expression.

    Scale shape: one (from, to)-keyed count shuffle (the kernel,
    lattice²-bounded) → one origin-keyed integer reduce.  Output:
    (fx, fy, n_steps, n_dests, entropy).
    """
    from ..stages.common import duckdb_round

    trans = cell_transition_matrix(sf_dir, pitch=pitch)

    def nlogn(t: pa.Table) -> pa.Table:
        ni = t["n_steps"].to_numpy().astype(np.int64)
        f = np.floor(ni * np.log(ni.astype(np.float64)) * ENTROPY_FP + 0.5).astype(np.int64)
        return pa.table(
            {
                "fx": t["fx"],
                "fy": t["fy"],
                "ni": pa.array(ni, type=pa.int64()),
                "one": pa.array(np.ones(len(ni), dtype=np.int64)),
                "f": pa.array(f, type=pa.int64()),
            }
        )

    agg = (
        trans.map_batches(nlogn, batch_format="pyarrow")
        .groupby(["fx", "fy"])
        .aggregate(
            Sum("ni", alias_name="n_steps"),
            Sum("one", alias_name="n_dests"),
            Sum("f", alias_name="sum_nlogn_fp"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_steps"].to_numpy().astype(np.float64)
        sfp = t["sum_nlogn_fp"].to_numpy().astype(np.float64)
        h = duckdb_round(np.log(n) - (sfp / ENTROPY_FP) / n, 6)
        return pa.table(
            {
                "fx": t["fx"],
                "fy": t["fy"],
                "n_steps": t["n_steps"],
                "n_dests": t["n_dests"],
                "entropy": pa.array(h, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# user_mobility_entropy (per-user visited-cell entropy)
# ---------------------------------------------------------------------------


def user_mobility_entropy(sf_dir: str, pitch: float = TRANS_PITCH) -> rd.Dataset:
    """Per-user location-visit entropy: H over the distribution of the
    user's event cells — the standard mobility-predictability feature
    (low H = home-work routine, high H = exploratory), the per-user
    companion to transition_entropy's per-cell view.

    Same exact-integer n·ln(n) discipline; the (user, cell) count
    shuffle is the only data-sized exchange, the user-keyed reduce
    moves one row per (user, visited cell).  Output: (user_id,
    n_events, n_cells, entropy).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id", "user_id"])
    gy = int(round(fixtures.LAT_SPAN / pitch))

    def prep(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / pitch).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / pitch).astype(np.int64)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        key = uid * np.int64(1 << 32) + (cx * gy + cy)
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "ni": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("ni", alias_name="ni"))
    )

    def nlogn(t: pa.Table) -> pa.Table:
        ni = t["ni"].to_numpy().astype(np.int64)
        f = np.floor(ni * np.log(ni.astype(np.float64)) * ENTROPY_FP + 0.5).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(t["key"].to_numpy() >> 32, type=pa.int64()),
                "ni": pa.array(ni, type=pa.int64()),
                "one": pa.array(np.ones(len(ni), dtype=np.int64)),
                "f": pa.array(f, type=pa.int64()),
            }
        )

    agg = (
        counts.map_batches(nlogn, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("ni", alias_name="n_events"),
            Sum("one", alias_name="n_cells"),
            Sum("f", alias_name="sum_nlogn_fp"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_events"].to_numpy().astype(np.float64)
        sfp = t["sum_nlogn_fp"].to_numpy().astype(np.float64)
        h = duckdb_round(np.log(n) - (sfp / ENTROPY_FP) / n, 6)
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_events": t["n_events"],
                "n_cells": t["n_cells"],
                "entropy": pa.array(h, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# gravity_decay_fit (calibrate the distance-decay exponent)
# ---------------------------------------------------------------------------

GRAV_FP = 1e12  # fixed-point pitch for log-log OLS moment terms


def gravity_decay_fit(sf_dir: str, pitch: float = TRANS_PITCH) -> rd.Dataset:
    """Calibrate the gravity model's distance-decay exponent from the
    observed Markov kernel: OLS of ln(flow) on ln(distance) over all
    non-self (from → to) transitions — the empirical β that od_gravity
    ASSUMES and huff_model hard-codes as d⁻²; fitting it closes the
    loop (β ≈ −2 validates those models, β ≈ 0 refutes distance decay).

    Order discipline: each OD row fixes its five OLS moment terms
    (x, y, x², xy, y² with x = ln d, y = ln n) to int64 ONCE (pitch
    1e12), so the kernel-bounded sums are exact in any order and both
    engines evaluate the identical closed-form slope/intercept/R².

    Scale shape: rides cell_transition_matrix's one (from, to) count
    shuffle; the fit runs on the lattice²-bounded aggregate.  Output:
    one row (n_pairs, beta, intercept, r2).
    """
    from ..stages.common import duckdb_round

    trans = cell_transition_matrix(sf_dir, pitch=pitch).to_pandas()
    fx, fy = trans["fx"].to_numpy(np.int64), trans["fy"].to_numpy(np.int64)
    tx, ty = trans["tx"].to_numpy(np.int64), trans["ty"].to_numpy(np.int64)
    n = trans["n_steps"].to_numpy(np.int64)
    d2 = (fx - tx) ** 2 + (fy - ty) ** 2
    keep = d2 > 0
    x = np.log(np.sqrt(d2[keep].astype(np.float64)))
    y = np.log(n[keep].astype(np.float64))

    def fp(v: np.ndarray) -> np.ndarray:
        return np.floor(v * GRAV_FP + 0.5).astype(np.int64)

    m = len(x)
    sx, sy = int(fp(x).sum()), int(fp(y).sum())
    sxx, sxy, syy = int(fp(x * x).sum()), int(fp(x * y).sum()), int(fp(y * y).sum())
    fm = float(m)
    fsx, fsy, fsxx, fsxy, fsyy = (
        sx / GRAV_FP,
        sy / GRAV_FP,
        sxx / GRAV_FP,
        sxy / GRAV_FP,
        syy / GRAV_FP,
    )
    beta = (fm * fsxy - fsx * fsy) / (fm * fsxx - fsx * fsx)
    intercept = (fsy - beta * fsx) / fm
    r2 = (fm * fsxy - fsx * fsy) ** 2 / ((fm * fsxx - fsx * fsx) * (fm * fsyy - fsy * fsy))
    return rd.from_arrow(
        pa.table(
            {
                "n_pairs": pa.array([m], type=pa.int64()),
                "beta": pa.array(duckdb_round(np.array([beta]), 6), type=pa.float64()),
                "intercept": pa.array(duckdb_round(np.array([intercept]), 6), type=pa.float64()),
                "r2": pa.array(duckdb_round(np.array([r2]), 6), type=pa.float64()),
            }
        )
    )


MODULARITY_PITCH = 0.1  # fine lattice so districts resolve


def zone_modularity(sf_dir: str, pitch: float = MODULARITY_PITCH) -> rd.Dataset:
    """Directed weighted modularity of the admin-DISTRICT partition
    over the mobility transition graph: for each district c (cell
    centers assigned by containment; -1 = outside any district),

        q_c = e_c/m − (out_c/m)·(in_c/m)

    where e_c = step weight staying inside c, out_c/in_c = total
    from/to weight, m = total steps.  Σ q_c is Newman's Q — positive
    when mobility respects district borders, ~0 when borders are
    administrative fiction (the graph-theoretic version of
    dwell_in_zone's occupancy view).

    Exactness: the transition matrix and all marginals are exact int64
    through the run-scan reduce; zone assignment is rect containment
    of exact cell centers; q_c is one mirrored float expression.

    Scale shape: reuses cell_transition_matrix's coarse-partition
    run-scan (exchange = distinct transitions, lattice²-bounded);
    the zone fold runs on that bounded table driver-side (swap in a
    keyed groupby at a planetary lattice — same shape).  Output:
    (rel_id, n_within, w_out, w_in, q_term).
    """
    from ..stages.common import duckdb_round

    tr = cell_transition_matrix(sf_dir, pitch=pitch).to_pandas()
    fx = tr["fx"].to_numpy().astype(np.int64)
    fy = tr["fy"].to_numpy().astype(np.int64)
    tx = tr["tx"].to_numpy().astype(np.int64)
    ty = tr["ty"].to_numpy().astype(np.int64)
    n = tr["n_steps"].to_numpy().astype(np.int64)

    rects = [r for r in fixtures.admin_rects() if r["admin_level"] == 8]

    def zone_of(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
        lon = fixtures.LON_MIN + (cx.astype(np.float64) + 0.5) * pitch
        lat = fixtures.LAT_MIN + (cy.astype(np.float64) + 0.5) * pitch
        z = np.full(len(cx), -1, dtype=np.int64)
        for r in rects:
            m = (lon >= r["lon_min"]) & (lon < r["lon_max"]) & (lat >= r["lat_min"]) & (lat < r["lat_max"])
            z[m] = r["rel_id"]
        return z

    zf = zone_of(fx, fy)
    zt = zone_of(tx, ty)
    m_tot = float(n.sum())
    zones = np.unique(np.concatenate([zf, zt]))
    rows = []
    for z in zones:
        within = int(n[(zf == z) & (zt == z)].sum())
        out_w = int(n[zf == z].sum())
        in_w = int(n[zt == z].sum())
        q = within / m_tot - (out_w / m_tot) * (in_w / m_tot)
        rows.append((int(z), within, out_w, in_w, q))
    return rd.from_arrow(
        pa.table(
            {
                "rel_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "n_within": pa.array([r[1] for r in rows], type=pa.int64()),
                "w_out": pa.array([r[2] for r in rows], type=pa.int64()),
                "w_in": pa.array([r[3] for r in rows], type=pa.int64()),
                "q_term": pa.array(duckdb_round(np.array([r[4] for r in rows]), 6), type=pa.float64()),
            }
        )
    )


STAT_SCALE = 10**12  # stationary-mass fixed-point scale (pagerank discipline)
STAT_ITERS = 20


def transition_stationary(sf_dir: str, pitch: float = TRANS_PITCH, iters: int = STAT_ITERS) -> rd.Dataset:
    """Stationary distribution of the empirical mobility Markov kernel
    (cell_transition_matrix): where does a long random walk over the
    observed transitions spend its time?  The equilibrium view that
    complements transition_entropy's per-row uncertainty and pagerank's
    damped variant on the road graph (no damping here — the kernel is
    used as measured; cells without outgoing steps hold their mass,
    i.e. self-loop, documented).

    INTEGER-EXACT power iteration (routing.pagerank's discipline):
    mass lives as int64 fixed-point; each iteration moves
    (π_i · n_ij) // n_i along every transition row (floor division —
    deterministic in any order since per-edge shares are computed from
    the SAME π snapshot); flooring residue stays at the origin cell,
    so total mass is conserved exactly and the fixpoint is bit-stable.

    Scale shape: the kernel is ONE (from, to)-keyed count shuffle
    (lattice²-bounded, sparse); iterations run on that bounded
    aggregate (driver-side here — at a planetary lattice the same
    update is the pagerank join+groupby loop, documented).
    Output: (fx, fy, n_out_steps, pi_fp, pi) sorted by (fx, fy).
    """
    from ..stages.common import duckdb_round

    kern = cell_transition_matrix(sf_dir, pitch=pitch).to_pandas()  # lattice²-bounded
    fx = kern["fx"].to_numpy().astype(np.int64)
    fy = kern["fy"].to_numpy().astype(np.int64)
    tx = kern["tx"].to_numpy().astype(np.int64)
    ty = kern["ty"].to_numpy().astype(np.int64)
    ns = kern["n_steps"].to_numpy().astype(np.int64)

    stride = np.int64(1 << 21)
    fkey = fx * stride + fy
    tkey = tx * stride + ty
    cells = np.unique(np.concatenate([fkey, tkey]))
    pos = {int(k): i for i, k in enumerate(cells)}
    fi = np.array([pos[int(k)] for k in fkey], dtype=np.int64)
    ti = np.array([pos[int(k)] for k in tkey], dtype=np.int64)
    n_cells = len(cells)
    row_tot = np.zeros(n_cells, dtype=np.int64)
    np.add.at(row_tot, fi, ns)

    # uniform start: equal floor shares, remainder to the lowest keys
    pi = np.full(n_cells, STAT_SCALE // n_cells, dtype=np.int64)
    pi[: STAT_SCALE % n_cells] += 1
    for _ in range(iters):
        # per-edge share from the SAME pi snapshot (order-free)
        moved = (pi[fi] * ns) // row_tot[fi]
        nxt = pi.copy()
        np.subtract.at(nxt, fi, moved)  # mass leaves origins (residue stays)
        np.add.at(nxt, ti, moved)
        pi = nxt
    out_fx = (cells // stride).astype(np.int64)
    out_fy = (cells % stride).astype(np.int64)
    order = np.lexsort((out_fy, out_fx))
    return rd.from_arrow(
        pa.table(
            {
                "fx": pa.array(out_fx[order], type=pa.int64()),
                "fy": pa.array(out_fy[order], type=pa.int64()),
                "n_out_steps": pa.array(row_tot[order], type=pa.int64()),
                "pi_fp": pa.array(pi[order], type=pa.int64()),
                "pi": pa.array(
                    duckdb_round(pi[order].astype(np.float64) / float(STAT_SCALE), 6),
                    type=pa.float64(),
                ),
            }
        )
    )


PRED_BISECT_ITERS = 40  # fixed bisection depth (deterministic)


def _fano_pi_max(h: float, n_cells: int, iters: int = PRED_BISECT_ITERS) -> float:
    """Solve Fano's equality H = H_b(Π) + (1−Π)·ln(N−1) for the maximum
    predictability Π ∈ [1/N, 1] by FIXED-depth bisection (pure function
    of (h, n_cells) — identical on any worker and in the oracle).
    N = 1 or H <= 0 → perfectly predictable (Π = 1)."""
    import math

    if n_cells <= 1 or h <= 0.0:
        return 1.0

    def rhs(p: float) -> float:
        e = 0.0
        if 0.0 < p < 1.0:
            e = -p * math.log(p) - (1.0 - p) * math.log(1.0 - p)
        return e + (1.0 - p) * math.log(n_cells - 1)

    lo, hi = 1.0 / n_cells, 1.0
    if h >= rhs(lo):
        return lo  # entropy saturates the bound
    for _ in range(iters):
        mid = (lo + hi) / 2.0
        if rhs(mid) > h:
            lo = mid
        else:
            hi = mid
    return hi


def predictability_bound(sf_dir: str, pitch: float = TRANS_PITCH) -> rd.Dataset:
    """Per-user MAXIMUM predictability Π_max (Song, Qu, Blumm &
    Barabási 2010): the Fano-inequality ceiling on how often ANY
    algorithm can guess the user's next cell, derived from the visit
    entropy — the honest upper bound a next-location model is graded
    against (accuracy above Π_max means leakage, not skill).

    Determinism: H comes from user_mobility_entropy's exact n·ln(n)
    pins; Π solves the Fano equality by FIXED-depth bisection — a pure
    (H, N) function shared with the oracle, no float drift surface.

    Scale shape: identical to user_mobility_entropy (one (user, cell)
    shuffle, one user-keyed reduce); the bisection is O(40) flops per
    user inside the finish map.  Output: (user_id, n_events, n_cells,
    entropy, pi_max) rounded 6.
    """
    from ..stages.common import duckdb_round

    base = user_mobility_entropy(sf_dir, pitch=pitch)

    def finish(t: pa.Table) -> pa.Table:
        h = t["entropy"].to_numpy()
        nc = t["n_cells"].to_numpy()
        pi = np.array([_fano_pi_max(float(a), int(b)) for a, b in zip(h, nc)])
        return t.append_column("pi_max", pa.array(duckdb_round(pi, 6), type=pa.float64()))

    return base.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# mode_segmentation (per-step travel-mode classification)
# ---------------------------------------------------------------------------

# fixed-point deg/s thresholds (1e9 scale).  ~2.2 m/s and ~6.6 m/s N-S:
# walk / bike / drive cut the fixture world's step-speed distribution
# into a non-trivial three-way mix (SPEED_VMAX_FP=1e5 is ~p80).
MODE_WALK_FP = 20_000
MODE_BIKE_FP = 60_000


def mode_segmentation(
    sf_dir: str,
    walk_fp: int = MODE_WALK_FP,
    bike_fp: int = MODE_BIKE_FP,
    parts: int = TRAJ_PARTS,
) -> rd.Dataset:
    """Per-user travel-mode segmentation: every consecutive step is
    classified walk / bike / drive by its implied speed, then each
    user gets mode counts, the dominant mode, and the walk share —
    the trip-purpose feature every mobility model starts from (Zheng
    et al.'s GeoLife mode-inference pipeline, the speed-rule stage).

    The mode test reuses speed_audit's pure-int64 cross-multiplication
    (``dist_fp * 1e6 <=> thr_fp * dt_us`` — no division, no float
    speed), so the engine and the SQL mirror classify the identical
    step set; a zero-duration step with nonzero distance is 'drive'
    (the teleport convention).  Dominant-mode ties resolve to the
    slower mode (walk ≥ bike ≥ drive), mirrored in CASE order.

    Scale shape: the trajectory_stats coarse-partition run-scan — one
    task per ``user_id % parts`` slice, per-user dispatch amortized;
    output is one row per user with ≥ 1 step.  Output: (user_id,
    n_steps, n_walk, n_bike, n_drive, dominant, walk_frac).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = t["user_id"].to_numpy()
        tus = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        t = t.drop_columns(["ts"]).append_column("tus", pa.array(tus, type=pa.int64()))
        return t.append_column("part", pa.array(np.asarray(uid, np.int64) % parts, type=pa.int64()))

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_steps": pa.array([], type=pa.int64()),
            "n_walk": pa.array([], type=pa.int64()),
            "n_bike": pa.array([], type=pa.int64()),
            "n_drive": pa.array([], type=pa.int64()),
            "dominant": pa.array([], type=pa.string()),
            "walk_frac": pa.array([], type=pa.float64()),
        }
    )

    def segment(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) < 2:
            return empty
        m = np.diff(uid) == 0
        if not m.any():
            return empty
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        dist_fp = _seg_fp(np.diff(lon), np.diff(lat))[m]
        dt_us = np.diff(g["tus"].to_numpy())[m]
        lhs = dist_fp * US_PER_S
        walk = lhs <= walk_fp * dt_us
        bike = ~walk & (lhs <= bike_fp * dt_us)
        su = uid[:-1][m]
        bounds = np.nonzero(np.diff(su))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(su)]])

        def runsum(flags: np.ndarray) -> np.ndarray:
            cs = np.concatenate([[0], np.cumsum(flags.astype(np.int64))])
            return cs[ends] - cs[starts]

        n_steps = (ends - starts).astype(np.int64)
        n_walk = runsum(walk)
        n_bike = runsum(bike)
        n_drive = n_steps - n_walk - n_bike
        dom = np.where(
            (n_walk >= n_bike) & (n_walk >= n_drive),
            "walk",
            np.where(n_bike >= n_drive, "bike", "drive"),
        )
        frac = duckdb_round(n_walk.astype(np.float64) / n_steps.astype(np.float64), 6)
        return pa.table(
            {
                "user_id": pa.array(su[starts], type=pa.int64()),
                "n_steps": pa.array(n_steps, type=pa.int64()),
                "n_walk": pa.array(n_walk, type=pa.int64()),
                "n_bike": pa.array(n_bike, type=pa.int64()),
                "n_drive": pa.array(n_drive, type=pa.int64()),
                "dominant": pa.array(dom, type=pa.string()),
                "walk_frac": pa.array(frac, type=pa.float64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(segment, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# hits_scores (hubs & authorities on the mobility transition graph)
# ---------------------------------------------------------------------------

HITS_ITERS = 10
HITS_SCALE = 1_000_000  # integer max-normalization pitch


def hits_scores(sf_dir: str, iters: int = HITS_ITERS, pitch: float = TRANS_PITCH) -> rd.Dataset:
    """HITS (Kleinberg 1999) on the directed mobility graph: cells are
    nodes, the step-count transition matrix is the weighted adjacency;
    authority = where trips converge, hub = where trips originate —
    the origin/destination centrality pair behind "which places feed
    which" (the eigenvector sibling of od_gravity's marginals).

    INTEGER-EXACT power iteration (the pagerank discipline): scores
    live as int64 fixed-point; each round is two weighted sums over
    the edge list followed by integer max-normalization
    ``x * SCALE // max(x)`` — every op is integer, so the vectors
    after any round count are bit-identical in any engine and under
    any sum order (weights ≤ steps, scores ≤ SCALE: per-edge products
    ≤ ~2^50 at planet scale, headroom documented).

    Scale shape: the transition matrix is the cell_transition_matrix
    aggregate — ONE per-user run-scan + (from,to)-keyed combiner
    shuffle; everything after is proportional to OCCUPIED LATTICE
    EDGES, never input rows (the chi2/Gi* finalize discipline), so
    the iteration runs on the driver over the bounded aggregate.  At
    continental lattices swap the finalize for per-round edge⋈score
    joins (the pagerank loop shape — same integers).

    Output: (cx, cy, hub_fp, auth_fp) for every cell with degree ≥ 1.
    """
    edges = cell_transition_matrix(sf_dir, pitch=pitch).to_pandas()
    src = edges["fx"].to_numpy() * 1_000_000 + edges["fy"].to_numpy()
    dst = edges["tx"].to_numpy() * 1_000_000 + edges["ty"].to_numpy()
    w = edges["n_steps"].to_numpy().astype(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    si = np.array([idx[int(v)] for v in src], dtype=np.int64)
    di = np.array([idx[int(v)] for v in dst], dtype=np.int64)
    h = np.full(len(nodes), HITS_SCALE, dtype=np.int64)
    a = np.zeros(len(nodes), dtype=np.int64)
    for _ in range(iters):
        a[:] = 0
        np.add.at(a, di, w * h[si])
        a = a * HITS_SCALE // max(int(a.max()), 1)
        h[:] = 0
        np.add.at(h, si, w * a[di])
        h = h * HITS_SCALE // max(int(h.max()), 1)
    return rd.from_arrow(
        pa.table(
            {
                "cx": pa.array(nodes // 1_000_000, type=pa.int64()),
                "cy": pa.array(nodes % 1_000_000, type=pa.int64()),
                "hub_fp": pa.array(h, type=pa.int64()),
                "auth_fp": pa.array(a, type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# label_propagation_communities (deterministic synchronous LPA)
# ---------------------------------------------------------------------------

LPA_ROUNDS = 5


def label_propagation_communities(
    sf_dir: str, rounds: int = LPA_ROUNDS, pitch: float = TRANS_PITCH
) -> rd.Dataset:
    """Community detection on the SYMMETRIZED mobility graph via
    label propagation (Raghavan et al. 2007), made deterministic the
    way a reproducible engine must: SYNCHRONOUS updates, a FIXED round
    count, and every node adopting the neighbor label with the highest
    total edge weight, ties to the SMALLEST label — no RNG, no
    arrival-order dependence, bit-identical on any worker layout.
    Communities = travel basins (clusters of cells that exchange more
    trips internally than externally), the unsupervised sibling of
    zone_modularity's fixed zoning.

    Scale shape: the exchange-heavy part is the cell_transition_matrix
    aggregate (per-user run-scan + (from,to) combiner shuffle); the
    propagation runs on the OCCUPIED-LATTICE edge aggregate (the
    chi2/Gi*/HITS finalize discipline — edges ≪ input rows).  At
    continental lattices the same rounds run as per-round
    edge⋈label joins + (node,label) weight groupby + per-node argmax
    (the pagerank loop shape), same integers.

    Output: (cx, cy, community, community_size); community is the
    packed min-label of the converged basin.
    """
    edges = cell_transition_matrix(sf_dir, pitch=pitch).to_pandas()  # bounded: occupied-cell transition lattice
    src = edges["fx"].to_numpy() * 1_000_000 + edges["fy"].to_numpy()
    dst = edges["tx"].to_numpy() * 1_000_000 + edges["ty"].to_numpy()
    w = edges["n_steps"].to_numpy().astype(np.int64)
    keep = src != dst  # LPA votes come from NEIGHBORS only
    u = np.concatenate([src[keep], dst[keep]])
    v = np.concatenate([dst[keep], src[keep]])
    ww = np.concatenate([w[keep], w[keep]])
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(x): i for i, x in enumerate(nodes)}
    ui = np.array([idx[int(x)] for x in u], dtype=np.int64)
    vi = np.array([idx[int(x)] for x in v], dtype=np.int64)
    label = nodes.copy()  # init: own packed id
    for _ in range(rounds):
        new = label.copy()
        # per target node: total weight per neighbor label, argmax with
        # ties to the smallest label — vectorized via lexsort runs
        lab_v = label[ui]  # the label each edge VOTES for, at node vi
        order = np.lexsort((lab_v, vi))
        tv, tl, tw = vi[order], lab_v[order], ww[order]
        grp = np.concatenate([[True], (tv[1:] != tv[:-1]) | (tl[1:] != tl[:-1])])
        gstart = np.nonzero(grp)[0]
        gnode = tv[gstart]
        glab = tl[gstart]
        csum = np.concatenate([[0], np.cumsum(tw)])
        gend = np.concatenate([gstart[1:], [len(tv)]])
        gw = csum[gend] - csum[gstart]
        # per node: argmax weight, ties -> smallest label (lexsort puts
        # smaller labels first within a node, so strict > keeps them)
        best_w = np.full(len(nodes), -1, dtype=np.int64)
        for k in range(len(gnode)):  # grouped rows ≤ occupied edges — lattice-bounded
            n_i, l_i, w_i = gnode[k], glab[k], gw[k]
            if w_i > best_w[n_i]:
                best_w[n_i] = w_i
                new[n_i] = l_i
        label = new
    uniq_lab, inv, counts = np.unique(label, return_inverse=True, return_counts=True)
    return rd.from_arrow(
        pa.table(
            {
                "cx": pa.array(nodes // 1_000_000, type=pa.int64()),
                "cy": pa.array(nodes % 1_000_000, type=pa.int64()),
                "community": pa.array(label, type=pa.int64()),
                "community_size": pa.array(counts[inv].astype(np.int64), type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# flow_divergence (per-cell net mobility flow: sources vs sinks)
# ---------------------------------------------------------------------------


def flow_divergence(sf_dir: str, pitch: float = TRANS_PITCH) -> rd.Dataset:
    """Per-cell net flow over the mobility graph: outflow − inflow of
    CROSS-CELL steps — positive cells are trip SOURCES (residential
    morning load), negative are SINKS (attractors); the divergence
    field every fleet-rebalancing / demand model starts from (the
    scalar-field reduction of cell_transition_matrix; od_gravity
    models the pairs, this nets them per node).

    Exactness: pure integer counts end-to-end; the only float is the
    mirrored imbalance share div / (outflow + inflow).

    Scale shape: cell_transition_matrix is the only row-bounded
    exchange (per-user run-scan + (from,to) combiner); each surviving
    transition edge scatters TWO ±rows and ONE cell-keyed groupby
    nets them — everything after the first combiner is proportional
    to occupied transitions, never input rows.

    Output: (cx, cy, outflow, inflow, divergence, imbalance).
    """
    from ..stages.common import duckdb_round

    edges = cell_transition_matrix(sf_dir, pitch=pitch)

    def scatter(t: pa.Table) -> pa.Table:
        fx, fy = t["fx"].to_numpy(), t["fy"].to_numpy()
        tx, ty = t["tx"].to_numpy(), t["ty"].to_numpy()
        n = t["n_steps"].to_numpy().astype(np.int64)
        m = (fx != tx) | (fy != ty)  # self-loops carry no net flow
        zero = np.zeros(int(m.sum()), dtype=np.int64)
        return pa.table(
            {
                "cx": pa.array(np.concatenate([fx[m], tx[m]]), type=pa.int64()),
                "cy": pa.array(np.concatenate([fy[m], ty[m]]), type=pa.int64()),
                "outn": pa.array(np.concatenate([n[m], zero]), type=pa.int64()),
                "inn": pa.array(np.concatenate([zero, n[m]]), type=pa.int64()),
            }
        )

    agg = (
        edges.map_batches(scatter, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(Sum("outn", alias_name="outflow"), Sum("inn", alias_name="inflow"))
    )

    def finish(t: pa.Table) -> pa.Table:
        out = t["outflow"].to_numpy().astype(np.int64)
        inn = t["inflow"].to_numpy().astype(np.int64)
        div = out - inn
        imb = duckdb_round(div.astype(np.float64) / np.maximum(out + inn, 1).astype(np.float64), 6)
        t = t.append_column("divergence", pa.array(div, type=pa.int64()))
        return t.append_column("imbalance", pa.array(imb, type=pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# ipf_od_balancing (doubly-constrained gravity via deterministic IPF)
# ---------------------------------------------------------------------------

IPF_ITERS = 10
IPF_FP = 1 << 20  # flow fixed-point pitch


def ipf_od_balancing(sf_dir: str, precision: int = OD_PRECISION, iters: int = IPF_ITERS) -> rd.Dataset:
    """Doubly-constrained gravity model via iterative proportional
    fitting (Deming & Stephan 1940; Sinkhorn's theorem guarantees
    convergence): seed T⁰ = n_o·n_d / (1 + cheb²) (a Chebyshev-
    distance-decay kernel over the cells' deinterleaved grid coords),
    then alternately rescale rows to the observed origin marginals and
    columns to the observed destination marginals — the transport-
    demand calibration behind every four-step travel model; od_gravity
    screens the independence model, this FITS the constrained one.

    Determinism: flows live as fixed-point (×2^20) PYTHON BIG INTS —
    each IPF rescale is the exact integer expression ``t · (target·FP·FP²
    // rowsum) // FP²``, so the fitted matrix after any round count is
    bit-identical anywhere (the pagerank discipline without int64
    overflow: the seed's transient n_o·n_d·FP magnitude exceeds 2^63
    already at sf0.01); the fitted values return to target·FP
    magnitude and emit as int64 (seed_fp min-capped for the report).

    Scale shape: od_matrix is the only row-bounded exchange; the IPF
    sweeps run on the OBSERVED-PAIR aggregate (chi2/Gi*/HITS finalize
    discipline — pairs ≪ input rows; at continental lattices each
    sweep is one groupby-sum + broadcast-factor map over the pair
    table, same integers).

    Output: (o_cell, d_cell, n_users, seed_fp, fitted_fp, resid_fp =
    fitted − n_users·FP).
    """
    od = od_matrix(sf_dir, precision=precision).to_pandas()
    o = od["o_cell"].to_numpy()
    d = od["d_cell"].to_numpy()
    n = od["n_users"].to_numpy().astype(np.int64)
    ox, oy = cells.deinterleave(o.astype(np.uint64))
    dx, dy = cells.deinterleave(d.astype(np.uint64))
    cheb = np.maximum(
        np.abs(ox.astype(np.int64) - dx.astype(np.int64)),
        np.abs(oy.astype(np.int64) - dy.astype(np.int64)),
    )
    ouniq, oinv = np.unique(o, return_inverse=True)
    duniq, dinv = np.unique(d, return_inverse=True)
    row_target = np.zeros(len(ouniq), dtype=np.int64)
    np.add.at(row_target, oinv, n)
    col_target = np.zeros(len(duniq), dtype=np.int64)
    np.add.at(col_target, dinv, n)
    n_o = row_target[oinv]
    n_d = col_target[dinv]
    # big-int (object) arithmetic: the sweep is exact at ANY magnitude —
    # int64 would overflow in the transient first rescale at sf >= 0.01
    seed = (n_o.astype(object) * n_d.astype(object) * IPF_FP) // (1 + cheb * cheb).astype(object)
    t = seed.copy()
    fp2 = IPF_FP * IPF_FP
    for _ in range(iters):
        rs = np.zeros(len(ouniq), dtype=object)
        np.add.at(rs, oinv, t)
        f = np.array(
            [int(rt) * IPF_FP * fp2 // max(int(s), 1) for rt, s in zip(row_target, rs)],
            dtype=object,
        )
        t = (t * f[oinv]) // fp2
        cs = np.zeros(len(duniq), dtype=object)
        np.add.at(cs, dinv, t)
        g = np.array(
            [int(ct) * IPF_FP * fp2 // max(int(s), 1) for ct, s in zip(col_target, cs)],
            dtype=object,
        )
        t = (t * g[dinv]) // fp2
    # fitted row/col sums now sit within 1 fp-ulp·pairs of target·FP;
    # values are back at target·FP magnitude -> int64-safe to emit
    t = t.astype(np.int64)
    seed_out = np.minimum(seed, np.iinfo(np.int64).max).astype(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "o_cell": pa.array(o, type=pa.int64()),
                "d_cell": pa.array(d, type=pa.int64()),
                "n_users": pa.array(n, type=pa.int64()),
                "seed_fp": pa.array(seed_out, type=pa.int64()),
                "fitted_fp": pa.array(t, type=pa.int64()),
                "resid_fp": pa.array(t - n * IPF_FP, type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# place_ppr (personalized PageRank / random walk with restart)
# ---------------------------------------------------------------------------

PPR_ITERS = 12
PPR_SCALE = 10**9
PPR_ALPHA_NUM, PPR_ALPHA_DEN = 85, 100  # walk-continuation probability


def place_ppr(sf_dir: str, iters: int = PPR_ITERS, pitch: float = TRANS_PITCH) -> rd.Dataset:
    """Personalized PageRank from the busiest origin cell over the
    mobility transition graph (random walk with restart, Tong et al.
    2006): "which places are reachable-in-practice from here?" — the
    related-places ranking behind next-destination suggestion, with
    the restart pinning relevance to the seed (plain pagerank ranks
    globally; THIS ranks relative to a place).

    Seed: the cell with the largest outgoing step count (ties to the
    smallest packed id — deterministic).  INTEGER-EXACT iteration
    (pagerank discipline): r ← restart + α·P��r with per-edge transfer
    ``(w_uv · r_u · α_num) // (deg_u · α_den)`` in int64 fixed-point —
    bit-identical under any scheduling; floor-lost mass damps slightly
    harder (documented, reproducible).

    Scale shape: cell_transition_matrix is the row-bounded exchange;
    the iteration runs on the occupied-lattice edge aggregate (the
    HITS/LPA finalize discipline; the pagerank loop shape is the
    documented continental-lattice swap).

    Output: (cx, cy, ppr_fp, is_seed).
    """
    edges = cell_transition_matrix(sf_dir, pitch=pitch).to_pandas()
    src = edges["fx"].to_numpy() * 1_000_000 + edges["fy"].to_numpy()
    dst = edges["tx"].to_numpy() * 1_000_000 + edges["ty"].to_numpy()
    w = edges["n_steps"].to_numpy().astype(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    si = np.array([idx[int(v)] for v in src], dtype=np.int64)
    di = np.array([idx[int(v)] for v in dst], dtype=np.int64)
    deg = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(deg, si, w)
    # seed: max outgoing mass, ties -> smallest packed id (nodes sorted)
    seed = int(np.argmax(deg))
    restart = np.zeros(len(nodes), dtype=np.int64)
    restart[seed] = PPR_SCALE * (PPR_ALPHA_DEN - PPR_ALPHA_NUM) // PPR_ALPHA_DEN
    r = np.zeros(len(nodes), dtype=np.int64)
    r[seed] = PPR_SCALE
    for _ in range(iters):
        contrib = (w * r[si] * PPR_ALPHA_NUM) // (deg[si] * PPR_ALPHA_DEN)
        nxt = restart.copy()
        np.add.at(nxt, di, contrib)
        r = nxt
    return rd.from_arrow(
        pa.table(
            {
                "cx": pa.array(nodes // 1_000_000, type=pa.int64()),
                "cy": pa.array(nodes % 1_000_000, type=pa.int64()),
                "ppr_fp": pa.array(r, type=pa.int64()),
                "is_seed": pa.array(np.arange(len(nodes)) == seed, type=pa.bool_()),
            }
        )
    )


# ---------------------------------------------------------------------------
# link_prediction (common-neighbor / Adamic-Adar over the mobility graph)
# ---------------------------------------------------------------------------

LP_FP = 10**12  # Adamic-Adar 1/ln(deg) fixed-point quantum
LP_PITCH = TRANS_PITCH / 4  # finer grid: the 0.5-deg graph is near-complete (no open wedges to predict)
LP_TOPK = 50
LP_STRIDE = np.int64(1 << 21)


def link_prediction(sf_dir: str, k: int = LP_TOPK) -> rd.Dataset:
    """Top-k predicted NEW links of the cell-transition graph by
    Adamic-Adar score — "which two zones that never exchanged a trip
    share the most (rarity-weighted) mutual neighbors?", the classic
    link-prediction baseline (Liben-Nowell & Kleinberg 2003) that
    road/transit planners read as latent-demand pairs.

    Graph: distinct undirected non-self edges of
    cell_transition_matrix.  Score for a non-adjacent pair (a, b):
    AA = sum over common neighbors z of 1/ln(deg(z)) — each z's weight
    is fixed to int64 ONCE (floor(FP/ln deg + 0.5)), so the pair sum
    is order-free and the SQL mirror adds the same integers.

    Scale shape: the wedge self-join (edges ⋈ edges on the shared
    endpoint) is THE triangle/wedge exchange every social-graph engine
    runs — hash-partitioned on z, output bounded by Σ deg²(z) (cap hub
    degrees at planet scale, the standard mitigation, documented);
    existing edges drop via one left-outer + null filter; ONE
    (a, b)-keyed reduce folds (cn, aa_fp); ranked_head keeps the
    k-bounded head.

    Output: (lp_rank, ax, ay, bx, by, cn, aa_fp).
    """
    from ray.data.aggregate import Count as AggCount

    from .ann import ranked_head

    trans = cell_transition_matrix(sf_dir, pitch=LP_PITCH)

    def to_edges(t: pa.Table) -> pa.Table:
        f = t["fx"].to_numpy() * LP_STRIDE + t["fy"].to_numpy()
        to = t["tx"].to_numpy() * LP_STRIDE + t["ty"].to_numpy()
        m = f != to
        a = np.minimum(f[m], to[m])
        b = np.maximum(f[m], to[m])
        # pairwise unique WITHOUT packing a*b into one int64 (cell keys
        # are ~2^27; a a*2^42+b pack would overflow and corrupt edges)
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table(
            {
                "a": pa.array(u[:, 0], type=pa.int64()),
                "b": pa.array(u[:, 1], type=pa.int64()),
            }
        )

    edges = (
        trans.map_batches(to_edges, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(AggCount(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        return pa.table(
            {
                "z": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "nb": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    symm = edges.map_batches(sym, batch_format="pyarrow").materialize()
    deg = symm.groupby("z").aggregate(AggCount(alias_name="deg"))

    def weight(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy().astype(np.float64)
        w = np.floor(LP_FP / np.log(d) + 0.5).astype(np.int64)
        return pa.table({"wz": t["z"], "w_fp": pa.array(w, type=pa.int64())})

    wtab = deg.filter(expr="deg >= 2").map_batches(weight, batch_format="pyarrow")

    # wedges: (z, a) x (z, b) with a < b
    left = symm.map_batches(
        lambda t: pa.table({"z": t["z"], "na": t["nb"]}), batch_format="pyarrow"
    )
    right = symm.map_batches(
        lambda t: pa.table({"z2": t["z"], "nb2": t["nb"]}), batch_format="pyarrow"
    )
    # materialize between the chained hash-shuffle joins: Ray 2.49's
    # join aggregator pool can starve when several shuffle stages
    # co-schedule under a small CPU budget (the 4-cpu test session) —
    # the barrier costs one bounded table and serializes the shuffles
    wedges = safe_join(
        left, right, join_type="inner", num_partitions=8, on=("z",), right_on=("z2",)
    ).filter(expr="na < nb2").materialize()
    # drop already-connected pairs
    open_w = safe_join(
        wedges,
        edges.map_batches(
            lambda t: pa.table(
                {"ea": t["a"], "eb": t["b"], "_hit": pa.array(np.ones(t.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow",
        ),
        join_type="left_outer",
        num_partitions=8,
        on=("na", "nb2"),
        right_on=("ea", "eb"),
    ).map_batches(lambda t: t.filter(pc.is_null(t["_hit"])), batch_format="pyarrow").materialize()
    # attach the common neighbor's AA weight, fold per pair
    scored = safe_join(
        open_w, wtab, join_type="inner", num_partitions=8, on=("z",), right_on=("wz",)
    )
    folded = (
        scored.groupby(["na", "nb2"])
        .aggregate(AggCount(alias_name="cn"), Sum("w_fp", alias_name="aa_fp"))
    )

    def unpack(df: pd.DataFrame) -> pd.DataFrame:
        s = int(LP_STRIDE)
        df["ax"] = (df["na"] // s).astype(np.int64)
        df["ay"] = (df["na"] % s).astype(np.int64)
        df["bx"] = (df["nb2"] // s).astype(np.int64)
        df["by"] = (df["nb2"] % s).astype(np.int64)
        return df[["ax", "ay", "bx", "by", "cn", "aa_fp"]]

    flat = folded.map_batches(unpack, batch_format="pandas")
    return ranked_head(
        flat, ["aa_fp", "ax", "ay", "bx", "by"], "lp_rank", k, keep=["ax", "ay", "bx", "by", "cn", "aa_fp"]
    )


# ---------------------------------------------------------------------------
# first_passage_time (mean hitting time to the top hub)
# ---------------------------------------------------------------------------


def first_passage_time(sf_dir: str, pitch: float = TRANS_PITCH) -> rd.Dataset:
    """Mean first-passage time (in steps) from every cell to the TOP
    HUB of the empirical mobility kernel — the absorbing-chain "how
    far is everywhere from the center, in behavior rather than
    distance" metric (accessibility planning, store-placement, and
    the MFPT centrality literature), completing the Markov family
    beside transition_stationary (equilibrium), place_ppr (damped
    visitation) and markov_attribution (removal effect).

    Hub = cell with the largest total outgoing steps (ties -> lowest
    cell key).  For reachable cells the absorbing-chain system
    m = 1 + Q m  is solved on the lattice-bounded aggregate
    driver-side (the kriging LAPACK discipline — corpus-size-
    independent); cells that cannot reach the hub report mfpt = -1
    (flagged, not dropped).  Cells without outgoing steps self-loop
    (transition_stationary's convention) and are thus unreachable
    unless they ARE the hub.  Precision note: transitions from a
    reachable cell INTO a hub-unreachable cell are censored from Q
    (the classical expectation is infinite whenever escape has
    positive probability); the reported value is the MFPT of the
    escape-censored sub-chain — deterministic, finite, and the
    standard practical choice (taboo-probability MFPT).

    Scale shape: the ONLY data-scale exchange is the (from, to)-keyed
    count shuffle of cell_transition_matrix; everything after runs on
    the lattice²-bounded kernel.  Output: (fx, fy, reachable, mfpt)
    rounded 6, hub row mfpt = 0.
    """
    from ..stages.common import duckdb_round

    kern = cell_transition_matrix(sf_dir, pitch=pitch).to_pandas()
    fx = kern["fx"].to_numpy().astype(np.int64)
    fy = kern["fy"].to_numpy().astype(np.int64)
    tx = kern["tx"].to_numpy().astype(np.int64)
    ty = kern["ty"].to_numpy().astype(np.int64)
    ns = kern["n_steps"].to_numpy().astype(np.int64)
    stride = np.int64(1 << 21)
    fkey = fx * stride + fy
    tkey = tx * stride + ty
    cells = np.unique(np.concatenate([fkey, tkey]))
    pos = {int(k): i for i, k in enumerate(cells)}
    fi = np.array([pos[int(k)] for k in fkey], dtype=np.int64)
    ti = np.array([pos[int(k)] for k in tkey], dtype=np.int64)
    n = len(cells)
    row_tot = np.zeros(n, dtype=np.int64)
    np.add.at(row_tot, fi, ns)
    hub = int(np.lexsort((cells, -row_tot))[0])
    # reverse-reachability to the hub over the directed kernel (cells
    # with no out-steps self-loop -> they reach nothing but themselves)
    radj: dict[int, list[int]] = {}
    for a, b in zip(fi.tolist(), ti.tolist()):
        radj.setdefault(b, []).append(a)
    reach = np.zeros(n, dtype=bool)
    stack = [hub]
    reach[hub] = True
    while stack:
        v = stack.pop()
        for u in radj.get(v, ()):
            if not reach[u]:
                reach[u] = True
                stack.append(u)
    idx = np.nonzero(reach)[0]
    sub = {int(c): i for i, c in enumerate(idx)}
    k = len(idx)
    A = np.eye(k, dtype=np.float64)
    for a, b, w in zip(fi.tolist(), ti.tolist(), ns.tolist()):
        if a == hub or not reach[a] or not reach[b] or b == hub:
            continue
        A[sub[a], sub[b]] -= w / float(row_tot[a])
    rhs = np.ones(k, dtype=np.float64)
    rhs[sub[hub]] = 0.0
    A[sub[hub], :] = 0.0
    A[sub[hub], sub[hub]] = 1.0
    m = np.linalg.solve(A, rhs)
    mfpt = np.full(n, -1.0)
    mfpt[idx] = m
    return rd.from_arrow(
        pa.table(
            {
                "fx": pa.array(cells // stride, type=pa.int64()),
                "fy": pa.array(cells % stride, type=pa.int64()),
                "reachable": pa.array(reach.astype(np.int64), type=pa.int64()),
                "mfpt": pa.array(duckdb_round(mfpt, 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# spectral_partition (Fiedler bipartition of the mobility graph)
# ---------------------------------------------------------------------------


def spectral_partition(sf_dir: str, pitch: float = TRANS_PITCH) -> rd.Dataset:
    """Two-way spectral partition of the undirected mobility graph:
    the sign pattern of the Fiedler vector (second-smallest
    eigenvector of the unnormalized Laplacian L = D − W, W = symmetric
    step counts) — the classic minimum-ratio-cut relaxation (Fiedler
    1973; Shi-Malik's ancestor), giving the travel-flow bisection that
    LPA's label dynamics and zone_modularity's score both approximate.

    Determinism: W is exact int64 (w_ij = steps i→j + steps j→i);
    the lattice-bounded eigensolve runs driver-side (np.linalg.eigh —
    LAPACK on the same matrix is bit-deterministic; the golden replays
    it on a kernel built by DuckDB instead of Ray).  Sign anchor: the
    partition flips so the lowest cell key lands on side 0 — the
    eigenvector's global sign is arbitrary, membership is not (up to
    exact zero entries, absent in a connected component with
    non-degenerate lambda_2).  Only the LARGEST connected component is
    partitioned; satellites report side = -1 (documented).

    Scale shape: the one data-scale exchange is the (from, to)-keyed
    count shuffle of cell_transition_matrix; the eigensolve is
    lattice²-bounded driver math (kriging discipline).  At a
    planetary lattice swap eigh for distributed orthogonal iteration
    (power method + the pagerank join-groupby loop), documented.

    Output: (fx, fy, side, cut_weight) — cut_weight repeated per row
    is the total inter-side edge weight (the number the cut
    minimizes), an exact int64.
    """
    kern = cell_transition_matrix(sf_dir, pitch=pitch).to_pandas()
    stride = np.int64(1 << 21)
    fkey = kern["fx"].to_numpy().astype(np.int64) * stride + kern["fy"].to_numpy().astype(np.int64)
    tkey = kern["tx"].to_numpy().astype(np.int64) * stride + kern["ty"].to_numpy().astype(np.int64)
    ns = kern["n_steps"].to_numpy().astype(np.int64)
    m = fkey != tkey
    fkey, tkey, ns = fkey[m], tkey[m], ns[m]
    cells = np.unique(np.concatenate([fkey, tkey]))
    pos = {int(k): i for i, k in enumerate(cells)}
    fi = np.array([pos[int(k)] for k in fkey], dtype=np.int64)
    ti = np.array([pos[int(k)] for k in tkey], dtype=np.int64)
    n = len(cells)
    W = np.zeros((n, n), dtype=np.int64)
    np.add.at(W, (fi, ti), ns)
    W = W + W.T
    # largest connected component (undirected)
    label = np.arange(n)
    for a, b in zip(fi.tolist(), ti.tolist()):
        ra, rb = label[a], label[b]
        if ra != rb:
            label[label == max(ra, rb)] = min(ra, rb)
    uniq, counts = np.unique(label, return_counts=True)
    main = uniq[np.argmax(counts)]
    keep = np.nonzero(label == main)[0]
    Wm = W[np.ix_(keep, keep)].astype(np.float64)
    L = np.diag(Wm.sum(axis=1)) - Wm
    evals, evecs = np.linalg.eigh(L)
    fied = evecs[:, 1]
    if fied[0] < 0 or (fied[0] == 0 and fied[fied != 0][0] < 0):
        fied = -fied
    side_main = (fied < 0).astype(np.int64)
    side = np.full(n, -1, dtype=np.int64)
    side[keep] = side_main
    cut = int(W[np.ix_(keep[side_main == 0], keep[side_main == 1])].sum())
    return rd.from_arrow(
        pa.table(
            {
                "fx": pa.array(cells // stride, type=pa.int64()),
                "fy": pa.array(cells % stride, type=pa.int64()),
                "side": pa.array(side, type=pa.int64()),
                "cut_weight": pa.array(np.full(n, cut, dtype=np.int64), type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# trajectory_simplify (per-user exact-integer Douglas-Peucker)
# ---------------------------------------------------------------------------

TS_FP = np.int64(10**7)  # coordinate fixed point (1e-7 deg)
TS_TOL = 0.05  # simplification tolerance, planar degrees


def _dp_keep_mask(fx: np.ndarray, fy: np.ndarray, tol_fp: int) -> np.ndarray:
    """Douglas-Peucker keep-mask with EXACT integer decisions: the
    split test compares cross² > tol²·|ab|² in Python big-ints (no
    sqrt, no float), so the kept set is bit-stable.  Farthest-point
    ties break on the lowest index."""
    n = len(fx)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    tol2 = int(tol_fp) * int(tol_fp)
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay, bx, by = int(fx[a]), int(fy[a]), int(fx[b]), int(fy[b])
        dx, dy = bx - ax, by - ay
        ab2 = dx * dx + dy * dy
        best_i, best_c2 = -1, -1
        for i in range(a + 1, b):
            cr = dx * (int(fy[i]) - ay) - dy * (int(fx[i]) - ax)
            c2 = cr * cr
            if ab2 == 0:
                # degenerate segment: fall back to distance from a
                ddx, ddy = int(fx[i]) - ax, int(fy[i]) - ay
                c2 = (ddx * ddx + ddy * ddy) * 1  # compare vs tol2 directly
                if c2 > best_c2:
                    best_i, best_c2 = i, c2
                continue
            if c2 > best_c2:
                best_i, best_c2 = i, c2
        if best_i < 0:
            continue
        over = (best_c2 > tol2 * ab2) if ab2 > 0 else (best_c2 > tol2)
        if over:
            keep[best_i] = True
            stack.append((a, best_i))
            stack.append((best_i, b))
    return keep


def trajectory_simplify(sf_dir: str, tol: float = TS_TOL, parts: int = TRAJ_PARTS) -> rd.Dataset:
    """Per-user Douglas-Peucker trajectory simplification census: how
    many of each user's points survive at tolerance ``tol`` — the
    polyline-compression step every track store runs before archiving
    (the boundary_simplify kernel lifted from rings to per-user runs),
    reported as a compression manifest.

    Determinism: coordinates pin to 1e-7-degree ints ONCE; every DP
    split decision is an exact big-int comparison (cross² vs
    tol²·|ab|²); within-user order is (ts, event_id).

    Scale shape: the coarse-partition run-scan (user_id % parts)
    sorts each slice once and walks users vectorized-outside /
    ALU-bound-inside (sessionize contract); output is one row per
    user.  Output: (user_id, n_points, n_kept, kept_frac).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = _derive_positions(t)
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "event_id": t["event_id"],
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy(), type=pa.int64()),
                "fx": pa.array(
                    np.floor(t["lon"].to_numpy() * float(TS_FP) + 0.5).astype(np.int64),
                    type=pa.int64(),
                ),
                "fy": pa.array(
                    np.floor(t["lat"].to_numpy() * float(TS_FP) + 0.5).astype(np.int64),
                    type=pa.int64(),
                ),
                "part": pa.array(uid % parts, type=pa.int64()),
            }
        )

    tol_fp = int(np.floor(tol * float(TS_FP) + 0.5))

    def simplify(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        fx = g["fx"].to_numpy()
        fy = g["fy"].to_numpy()
        if len(uid) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "n_points": pa.array([], type=pa.int64()),
                    "n_kept": pa.array([], type=pa.int64()),
                }
            )
        bounds = np.nonzero(np.diff(uid))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(uid)]])
        rows = {"user_id": [], "n_points": [], "n_kept": []}
        for a, b in zip(starts, ends):
            npts = int(b - a)
            if npts < 3:
                kept = npts
            else:
                kept = int(_dp_keep_mask(fx[a:b], fy[a:b], tol_fp).sum())
            rows["user_id"].append(int(uid[a]))
            rows["n_points"].append(npts)
            rows["n_kept"].append(kept)
        return pa.table(
            {
                "user_id": pa.array(rows["user_id"], type=pa.int64()),
                "n_points": pa.array(rows["n_points"], type=pa.int64()),
                "n_kept": pa.array(rows["n_kept"], type=pa.int64()),
            }
        )

    per_user = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(simplify, batch_format="pyarrow")
    )

    def finish(t: pa.Table) -> pa.Table:
        kf = duckdb_round(
            t["n_kept"].to_numpy().astype(np.float64)
            / np.maximum(t["n_points"].to_numpy().astype(np.float64), 1.0),
            6,
        )
        return t.append_column("kept_frac", pa.array(kf, type=pa.float64()))

    return per_user.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# degree_assortativity (degree-degree correlation of the mobility graph)
# ---------------------------------------------------------------------------


def degree_assortativity(sf_dir: str, pitch: float = LP_PITCH) -> rd.Dataset:
    """Degree assortativity of the undirected mobility graph (Newman
    2002): the Pearson correlation of endpoint degrees over edges —
    do hubs connect to hubs (assortative, r > 0, social-network-like)
    or to leaves (disassortative, r < 0, infrastructure-like)?  The
    one-scalar topology fingerprint beside hits/pagerank's node
    rankings.

    Exactness: degrees are exact int64 counts; the edge-level moment
    sums are exact integers (the discount_elasticity partial shape on
    the symmetric edge list — each undirected edge contributes both
    orientations, the standard convention); r is ONE mirrored float
    expression rounded 6.

    Scale shape: the (from, to)-keyed kernel shuffle; degree attach =
    two hash joins against the degree aggregate; the moment fold is a
    six-int64 global reduce.  Grid: the finer LP_PITCH lattice (the
    0.5-deg graph is near-regular — zero degree variance makes r
    undefined).  Output: one row (n_edges, r).
    """
    from ..stages.common import duckdb_round, safe_join

    kern = cell_transition_matrix(sf_dir, pitch=pitch)
    stride = np.int64(1 << 21)

    def to_edges(t: pa.Table) -> pa.Table:
        f = t["fx"].to_numpy() * stride + t["fy"].to_numpy()
        to = t["tx"].to_numpy() * stride + t["ty"].to_numpy()
        m = f != to
        a = np.minimum(f[m], to[m])
        b = np.maximum(f[m], to[m])
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table(
            {"a": pa.array(u[:, 0], type=pa.int64()), "b": pa.array(u[:, 1], type=pa.int64())}
        )

    edges = (
        kern.map_batches(to_edges, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "v": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    symm = edges.map_batches(sym, batch_format="pyarrow").materialize()
    deg = symm.groupby("u").aggregate(Count(alias_name="deg")).materialize()
    ju = safe_join(
        symm,
        deg.map_batches(lambda t: pa.table({"du_node": t["u"], "du": t["deg"]}), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=8,
        on=("u",),
        right_on=("du_node",),
    )
    jv = safe_join(
        ju,
        deg.map_batches(lambda t: pa.table({"dv_node": t["u"], "dv": t["deg"]}), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=8,
        on=("v",),
        right_on=("dv_node",),
    )

    def moments(t: pa.Table) -> pa.Table:
        x = t["du"].to_numpy().astype(np.int64)
        y = t["dv"].to_numpy().astype(np.int64)
        vals = {
            "m": len(x),
            "sx": int(x.sum()),
            "sy": int(y.sum()),
            "sxy": int((x * y).sum()),
            "sxx": int((x * x).sum()),
            "syy": int((y * y).sum()),
        }
        return pa.table(
            {"_g": pa.array([0], type=pa.int64())}
            | {k: pa.array([v], type=pa.int64()) for k, v in vals.items()}
        )

    agg = (
        jv.map_batches(moments, batch_format="pyarrow")
        .groupby("_g")
        .aggregate(*[Sum(c, alias_name=c) for c in ("m", "sx", "sy", "sxy", "sxx", "syy")])
        .to_pandas()  # bounded: single-group moment rows
    )
    m, sx, sy, sxy, sxx, syy = (int(agg[c][0]) for c in ("m", "sx", "sy", "sxy", "sxx", "syy"))
    r = (m * sxy - sx * sy) / (
        np.sqrt(float(m * sxx - sx * sx)) * np.sqrt(float(m * syy - sy * sy))
    )
    return rd.from_arrow(
        pa.table(
            {
                "n_edges": pa.array([m // 2], type=pa.int64()),
                "r": pa.array(duckdb_round(np.array([r]), 6), type=pa.float64()),
            }
        )
    )
