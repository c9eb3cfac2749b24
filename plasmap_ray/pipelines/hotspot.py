"""Spatial statistics: Getis-Ord Gi* hotspot detection over a fixed
cell lattice.

The classic "where are the statistically hot tiles" question a tiling
engine answers before rendering heatmaps (reference analogue: the
per-cell counters of A3/A5, processing/src/main/scala/io/plasmap/geo/
preprocessing/OsmPreprocessor.scala:116-119 — this adds the
inferential layer on top).  Gi* for cell i with a 3x3 neighborhood
window:

    Gi* = (S_i - x̄·W_i) / (s · sqrt((n·W_i - W_i²) / (n - 1)))

where S_i = sum of counts over i's in-bounds neighbors (incl. itself),
W_i = that window's cell count (9 interior, 6 edge, 4 corner),
n = total lattice cells, x̄/s = global mean/std of per-cell counts
(empty cells count as zero — the lattice is FIXED by the fixture
world bounds, so n is a compile-time constant, not data-dependent).

Scale shape (10^12 rows):
- pass 1 is a map-side per-batch cell-count combiner -> one small
  groupby: only (cell, n) partials shuffle, never rows;
- the global moments (N, Σn²) reduce to TWO scalars via a second
  tiny aggregate over the per-cell table;
- the neighbor sums scatter each per-cell row to ≤9 neighbor keys —
  a constant-factor explode of the CELL table (bounded by lattice
  size, not row count) followed by one more tiny groupby;
- the z-score projection is stateless vectorized math.

Float discipline: all shuffled quantities are int64 (exact); the
z-score is computed in ONE fixed expression-tree order mirrored
literally by the SQL oracle (all inputs exact integers -> correctly
rounded IEEE ops are bit-identical), then duckdb_round(6)-ed on both
sides.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .. import fixtures
from ..stages.common import duckdb_round
from ..stages.common import safe_join

GI_EPS = 0.1  # lattice pitch, planar degrees
# lattice dimensions are fixed by the fixture world bounds: derive_lon
# lands in [LON_MIN, LON_MAX) so floor((lon-LON_MIN)/eps) is in [0, GX)
GI_GX = int(round(fixtures.LON_SPAN / GI_EPS))  # 20
GI_GY = int(round(fixtures.LAT_SPAN / GI_EPS))  # 15
GI_NCELLS = GI_GX * GI_GY  # 300
_OFFSETS = tuple((dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1))


def _read_events(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _cell_counts(sf_dir: str, eps: float) -> rd.Dataset:
    """(cx, cy, n) per occupied lattice cell; map-side combiner first."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon = fixtures.derive_lon(ids)
        lat = fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * GI_GY + cy
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cx": pa.array(uniq // GI_GY, type=pa.int64()),
                "cy": pa.array(uniq % GI_GY, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        _read_events(sf_dir, ["event_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(Sum("n", alias_name="n"))
    )


def getis_ord_hotspots(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """Gi* z-score per occupied-neighborhood lattice cell.

    Output: (cx, cy, nbr_sum, w, gi_z) — one row per cell whose 3x3
    window contains at least one event (cells with an all-zero window
    have Gi* numerator = -x̄·W and carry no signal a heatmap wants).
    """
    counts = _cell_counts(sf_dir, eps).materialize()  # ≤ GI_NCELLS rows

    # global moments: two scalars off the (tiny) per-cell table
    def moments(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy()
        return pa.table(
            {
                "tot": pa.array([int(n.sum())], type=pa.int64()),
                "ssq": pa.array([int((n * n).sum())], type=pa.int64()),
            }
        )

    agg = counts.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("tot", alias_name="tot"), Sum("ssq", alias_name="ssq")
    )
    tot, ssq = float(agg["tot"]), float(agg["ssq"])
    mean = tot / float(GI_NCELLS)
    s = np.sqrt(ssq / float(GI_NCELLS) - mean * mean)

    def scatter(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        n = t["n"].to_numpy()
        outs = []
        for dx, dy in _OFFSETS:
            nx, ny = cx + dx, cy + dy
            m = (nx >= 0) & (nx < GI_GX) & (ny >= 0) & (ny < GI_GY)
            outs.append(
                pa.table(
                    {
                        "cx": pa.array(nx[m], type=pa.int64()),
                        "cy": pa.array(ny[m], type=pa.int64()),
                        "n": pa.array(n[m], type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    nbr = (
        counts.map_batches(scatter, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(Sum("n", alias_name="nbr_sum"))
    )

    def zscore(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        snb = t["nbr_sum"].to_numpy().astype(np.float64)
        # in-bounds 3x3 window size: interior 9, edge 6, corner 4
        wx = np.minimum(cx + 1, GI_GX - 1) - np.maximum(cx - 1, 0) + 1
        wy = np.minimum(cy + 1, GI_GY - 1) - np.maximum(cy - 1, 0) + 1
        w = (wx * wy).astype(np.int64)
        wf = w.astype(np.float64)
        num = snb - mean * wf
        den = s * np.sqrt((float(GI_NCELLS) * wf - wf * wf) / float(GI_NCELLS - 1))
        z = duckdb_round(num / den, 6)
        return pa.table(
            {
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
                "nbr_sum": t["nbr_sum"],
                "w": pa.array(w, type=pa.int64()),
                "gi_z": pa.array(z, type=pa.float64()),
            }
        )

    return nbr.map_batches(zscore, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# idw_interpolation (inverse-distance-weighted field at lattice sites)
# ---------------------------------------------------------------------------

IDW_RADIUS = 0.3  # influence radius, planar degrees
IDW_SOFT = 1e-4  # softening term: caps the weight of coincident points
IDW_FP = 1e6  # per-pair fixed-point scale (weights and weighted values)


def idw_interpolation(sf_dir: str, radius: float = IDW_RADIUS) -> rd.Dataset:
    """Inverse-distance-weighted interpolation of ``events.value`` at
    every lattice cell center — the raster-field estimator (kriging's
    cheap cousin) behind heatmap / surface layers.

    Per batch the engine computes the (rows × sites) squared-distance
    matrix against the BROADCAST site lattice (a constant — never
    shuffled), masks to the radius, fixed-points each pair's weight
    w = 1/(d2+soft) and weighted value w·v to int64, and emits
    per-site partial sums — so the single groupby moves ≤ sites×batches
    rows and the sums are bit-exact in any order.  Final field value =
    sum_wv_fp / sum_w_fp, a driver-side division the consumer applies.

    Output: (cx, cy, n_events, sum_w_fp, sum_wv_fp) per site with ≥1
    in-radius event.
    """
    def prep(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        return pa.table(
            {
                "lon": pa.array(fixtures.derive_lon(ids), type=pa.float64()),
                "lat": pa.array(fixtures.derive_lat(ids), type=pa.float64()),
                "value": t["value"],
            }
        )

    pts = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]).map_batches(
        prep, batch_format="pyarrow"
    )
    return idw_field_from_points(pts, radius=radius)


def idw_field_from_points(pts: rd.Dataset, value_col: str = "value", radius: float = IDW_RADIUS) -> rd.Dataset:
    """Core IDW reduction over a (lon, lat, value) point Dataset —
    shared by the oracle query and the volume benchmark."""
    sx = (fixtures.LON_MIN + (np.arange(GI_GX) + 0.5) * GI_EPS).repeat(GI_GY)
    sy = np.tile(fixtures.LAT_MIN + (np.arange(GI_GY) + 0.5) * GI_EPS, GI_GX)
    scx = np.arange(GI_GX).repeat(GI_GY).astype(np.int64)
    scy = np.tile(np.arange(GI_GY), GI_GX).astype(np.int64)
    r2 = radius * radius

    n_sites = len(sx)

    # per-point lattice window: a site can be in radius only within
    # ceil(radius/eps) lattice steps of the point's nearest site (+1
    # rounding margin) — (2R+1)^2 = 81 candidates per point instead of
    # the dense rows x 300 matrix whose three ~78 MB float64
    # temporaries made this kernel the host's DRAM-bandwidth canary.
    # Exactness: the window provably contains every in-radius site
    # (|i - round(fx)| <= radius/eps + 0.5), and each surviving pair's
    # floats are the SAME expressions as the dense kernel — identical
    # site coordinates, d2, weights, fixed-point floors.
    R = int(np.ceil(radius / GI_EPS)) + 1
    offs = np.arange(-R, R + 1, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy()
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        fx = (lon - fixtures.LON_MIN) / GI_EPS - 0.5
        fy = (lat - fixtures.LAT_MIN) / GI_EPS - 0.5
        ci = np.round(fx).astype(np.int64)[:, None] + offs[None, :]
        cj = np.round(fy).astype(np.int64)[:, None] + offs[None, :]
        vi = (ci >= 0) & (ci < GI_GX)
        vj = (cj >= 0) & (cj < GI_GY)
        dxw = lon[:, None] - (fixtures.LON_MIN + (ci + 0.5) * GI_EPS)
        dyw = lat[:, None] - (fixtures.LAT_MIN + (cj + 0.5) * GI_EPS)
        d2 = dxw[:, :, None] ** 2 + dyw[:, None, :] ** 2
        m = (d2 <= r2) & vi[:, :, None] & vj[:, None, :]
        pi, ii, jj = np.nonzero(m)
        si = ci[pi, ii] * GI_GY + cj[pi, jj]
        w = 1.0 / (d2[pi, ii, jj] + IDW_SOFT)
        fw = np.floor(w * IDW_FP + 0.5).astype(np.int64)
        fwv = np.floor(w * v[pi] * IDW_FP + 0.5).astype(np.int64)
        n = np.bincount(si, minlength=n_sites).astype(np.int64)
        sum_w = np.zeros(n_sites, dtype=np.int64)
        np.add.at(sum_w, si, fw)
        sum_wv = np.zeros(n_sites, dtype=np.int64)
        np.add.at(sum_wv, si, fwv)
        keep = n > 0
        return pa.table(
            {
                "cx": pa.array(scx[keep], type=pa.int64()),
                "cy": pa.array(scy[keep], type=pa.int64()),
                "n_events": pa.array(n[keep], type=pa.int64()),
                "sum_w_fp": pa.array(sum_w[keep], type=pa.int64()),
                "sum_wv_fp": pa.array(sum_wv[keep], type=pa.int64()),
            }
        )

    return (
        pts.map_batches(partial, batch_format="pyarrow", batch_size=32768)
        .groupby(["cx", "cy"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_w_fp", alias_name="sum_w_fp"),
            Sum("sum_wv_fp", alias_name="sum_wv_fp"),
        )
    )


# ---------------------------------------------------------------------------
# space_time_cube (cell x day occupancy counts)
# ---------------------------------------------------------------------------

DAY_US = 86_400_000_000


def space_time_cube(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """The space-time cube: event counts per (lattice cell, UTC day) —
    the input layer for emerging-hotspot / trend analysis over tiles.

    Map-side combiner packs (cx, cy, day) into one int64 key and
    np.unique-counts per batch, so the groupby moves per-batch
    distinct keys only.  Output: (cx, cy, day, n_events) with day =
    epoch_us // 86400e6 (integer — no timezone/float ambiguity).
    """

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        ts = t["ts"].cast(pa.int64()).to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        day = ts // DAY_US
        key = (day * GI_GX + cx) * GI_GY + cy
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cx": pa.array((uniq // GI_GY) % GI_GX, type=pa.int64()),
                "cy": pa.array(uniq % GI_GY, type=pa.int64()),
                "day": pa.array(uniq // (GI_GX * GI_GY), type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        _read_events(sf_dir, ["event_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["cx", "cy", "day"])
        .aggregate(Sum("n", alias_name="n_events"))
    )


# ---------------------------------------------------------------------------
# cell_entropy (event-type Shannon entropy per cell)
# ---------------------------------------------------------------------------

ENTROPY_FP = 1e9


def cell_entropy(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """Per-cell Shannon entropy of the event-type mix — the diversity
    layer (H = ln n - (Σ nᵢ·ln nᵢ)/n over type counts nᵢ).

    Order discipline: a float Σ pᵢ·ln pᵢ would accumulate in
    engine-specific order; instead each (cell, type) row fixes
    nᵢ·ln(nᵢ) to int64 ONCE (inputs are exact integers, ln is the
    same libm call in both engines) and the remaining sums are
    integer — order-free.  Entropy is derived from those exact ints
    in one mirrored expression and rounded to 6 decimals.

    Output: (cx, cy, n_events, sum_nlogn_fp, entropy).
    """

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * GI_GY + cy
        return pa.table(
            {
                "key": pa.array(key, type=pa.int64()),
                "event_type": t["event_type"],
                "n": pa.array(np.ones(len(key), dtype=np.int64), type=pa.int64()),
            }
        )

    counts = (
        _read_events(sf_dir, ["event_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["key", "event_type"])
        .aggregate(Sum("n", alias_name="ni"))
    )

    def nlogn(t: pa.Table) -> pa.Table:
        ni = t["ni"].to_numpy().astype(np.float64)
        f = np.floor(t["ni"].to_numpy() * np.log(ni) * ENTROPY_FP + 0.5).astype(np.int64)
        return pa.table(
            {
                "key": t["key"],
                "ni": t["ni"],
                "f": pa.array(f, type=pa.int64()),
            }
        )

    agg = (
        counts.map_batches(nlogn, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("ni", alias_name="n_events"), Sum("f", alias_name="sum_nlogn_fp"))
    )

    def finish(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        n = t["n_events"].to_numpy().astype(np.float64)
        sfp = t["sum_nlogn_fp"].to_numpy().astype(np.float64)
        h = duckdb_round(np.log(n) - (sfp / ENTROPY_FP) / n, 6)
        return pa.table(
            {
                "cx": pa.array(key // GI_GY, type=pa.int64()),
                "cy": pa.array(key % GI_GY, type=pa.int64()),
                "n_events": t["n_events"],
                "sum_nlogn_fp": t["sum_nlogn_fp"],
                "entropy": pa.array(h, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# ripley_k (point-pattern pair counts at nested radii)
# ---------------------------------------------------------------------------

RIPLEY_RADII = (0.05, 0.1, 0.2)
# 2-D half neighborhood (spatial_self_join discipline): own bucket via
# id ordering, each unordered adjacent-bucket pair via exactly one offset
_HALF_2D = ((1, 0), (-1, 1), (0, 1), (1, 1))


def ripley_k(sf_dir: str, radii: tuple[float, ...] = RIPLEY_RADII, num_partitions: int = 8) -> rd.Dataset:
    """Ripley's K numerator: the number of unordered event pairs within
    each radius r — the clustering-vs-dispersion diagnostic (K(r) =
    area·n_pairs·2/n² under CSR; the exact pair counts are the hard
    distributed part, the normalization is driver arithmetic).

    Buckets at pitch r_max; ONE hash join with the half-neighborhood
    probe expansion generates every unordered candidate pair exactly
    once (candidates bounded by local density, never O(N²)); each
    batch then mask-counts per radius, so the final aggregate moves
    len(radii) rows per batch.

    Output: (r, n_pairs), one row per radius.
    """
    rmax = max(radii)
    ds = _read_events(sf_dir, ["event_id"])

    def keyed(t: pa.Table, side: str) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / rmax).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / rmax).astype(np.int64)
        return pa.table(
            {
                f"id_{side}": t["event_id"],
                f"lon_{side}": pa.array(lon, type=pa.float64()),
                f"lat_{side}": pa.array(lat, type=pa.float64()),
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
            }
        )

    def own_key(t: pa.Table) -> pa.Table:
        ck = (t["cx"].to_numpy() + 1) * (1 << 21) + (t["cy"].to_numpy() + 1)
        return t.drop_columns(["cx", "cy"]).append_column("ck", pa.array(ck, type=pa.int64()))

    def probe_expand(t: pa.Table) -> pa.Table:
        cx, cy = t["cx"].to_numpy(), t["cy"].to_numpy()
        t = t.drop_columns(["cx", "cy"])
        out = []
        for dx, dy in ((0, 0),) + _HALF_2D:
            ck = (cx + dx + 1) * (1 << 21) + (cy + dy + 1)
            own = np.full(len(ck), 1 if (dx, dy) == (0, 0) else 0, dtype=np.int8)
            out.append(
                t.append_column("ck", pa.array(ck, type=pa.int64())).append_column(
                    "own", pa.array(own, type=pa.int8())
                )
            )
        return pa.concat_tables(out)

    import functools as _ft

    build = ds.map_batches(_ft.partial(keyed, side="b"), batch_format="pyarrow").map_batches(
        own_key, batch_format="pyarrow"
    )
    probe = ds.map_batches(_ft.partial(keyed, side="a"), batch_format="pyarrow").map_batches(
        probe_expand, batch_format="pyarrow"
    )
    cand = safe_join(probe, build, join_type="inner", num_partitions=num_partitions, on=("ck",))

    def count_radii(t: pa.Table) -> pa.Table:
        ia = np.asarray(t["id_a"].to_numpy(), np.int64)
        ib = np.asarray(t["id_b"].to_numpy(), np.int64)
        own = t["own"].to_numpy()
        dlon = t["lon_b"].to_numpy() - t["lon_a"].to_numpy()
        dlat = t["lat_b"].to_numpy() - t["lat_a"].to_numpy()
        d2 = dlon * dlon + dlat * dlat
        # own-bucket pairs arrive in both orders (and as self-pairs):
        # ia < ib dedups and drops self; cross-bucket pairs arrive
        # exactly once via their unique half offset — no filter needed
        base = (own == 0) | (ia < ib)
        rs, ns = [], []
        for r in radii:
            rs.append(r)
            ns.append(int(((d2 <= r * r) & base).sum()))
        return pa.table({"r": pa.array(rs, type=pa.float64()), "n": pa.array(ns, type=pa.int64())})

    return (
        cand.map_batches(count_radii, batch_format="pyarrow")
        .groupby("r")
        .aggregate(Sum("n", alias_name="n_pairs"))
    )


# ---------------------------------------------------------------------------
# change_detection (two-epoch raster difference)
# ---------------------------------------------------------------------------

# fixture events span 2024-01: split at Jan 16 00:00 UTC
CHANGE_SPLIT_US = 1_705_363_200_000_000


def change_detection(sf_dir: str, eps: float = GI_EPS, split_us: int = CHANGE_SPLIT_US) -> rd.Dataset:
    """Temporal change raster: per-cell event counts before/after a
    split instant plus the delta — the before/after diff layer change
    detection and trend alerts read.

    One pass, one tiny groupby: each batch emits per-cell
    (n_before, n_after) indicator partials (the cell_modality_mix
    union-free pattern — both epochs counted in the same row).
    Output: (cx, cy, n_before, n_after, delta).
    """

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        ts = t["ts"].cast(pa.int64()).to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * GI_GY + cy
        before = ts < split_us
        kb, cb = np.unique(key[before], return_counts=True)
        ka, ca = np.unique(key[~before], return_counts=True)
        allk = np.union1d(kb, ka)
        nb = np.zeros(len(allk), dtype=np.int64)
        na = np.zeros(len(allk), dtype=np.int64)
        nb[np.searchsorted(allk, kb)] = cb
        na[np.searchsorted(allk, ka)] = ca
        return pa.table(
            {
                "cx": pa.array(allk // GI_GY, type=pa.int64()),
                "cy": pa.array(allk % GI_GY, type=pa.int64()),
                "n_before": pa.array(nb, type=pa.int64()),
                "n_after": pa.array(na, type=pa.int64()),
            }
        )

    agg = (
        _read_events(sf_dir, ["event_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(Sum("n_before", alias_name="n_before"), Sum("n_after", alias_name="n_after"))
    )

    def delta(t: pa.Table) -> pa.Table:
        d = t["n_after"].to_numpy() - t["n_before"].to_numpy()
        return t.append_column("delta", pa.array(d, type=pa.int64()))

    return agg.map_batches(delta, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# spatial_thinning (deterministic per-cell k-sample)
# ---------------------------------------------------------------------------

THIN_K = 5
THIN_MULT = 1103515245  # glibc LCG — disjoint from every fixture mix
THIN_ADD = 12345
M31 = 1 << 31


def spatial_thinning(sf_dir: str, k: int = THIN_K, eps: float = GI_EPS) -> rd.Dataset:
    """Density-capped spatial sample: at most ``k`` events per lattice
    cell, selected by an LCG hash of the event id — the deterministic
    reservoir every renderer / training-data balancer needs (same rows
    on every run, every engine, no RNG state; the stratified_sample
    trick turned into a per-stratum TOP-K).

    Scale shape: a per-batch combiner keeps each batch's k best rows
    per cell (run-scan over the (cell, hash) sort), so the groupby
    moves ≤ k·cells·batches rows; the final per-cell selection is a
    coarse-partition run-scan over those survivors.

    Output: (cx, cy, event_id, thin_rank) with thin_rank in [1, k].
    """

    def hash_keyed(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        h = (ids * THIN_MULT + THIN_ADD) % M31
        return pa.table(
            {
                "key": pa.array(cx * GI_GY + cy, type=pa.int64()),
                "event_id": t["event_id"],
                "h": pa.array(h, type=pa.int64()),
            }
        )

    def topk_runs(t: pa.Table) -> pa.Table:
        t = t.sort_by([("key", "ascending"), ("h", "ascending"), ("event_id", "ascending")])
        key = t["key"].to_numpy()
        if len(key) == 0:
            return t.append_column("thin_rank", pa.array([], type=pa.int64()))
        starts = np.concatenate([[0], np.nonzero(np.diff(key))[0] + 1])
        ends = np.concatenate([starts[1:], [len(key)]])
        rank = np.arange(len(key)) - np.repeat(starts, ends - starts) + 1
        t = t.append_column("thin_rank", pa.array(rank, type=pa.int64()))
        return t.filter(pa.array(rank <= k))

    def strip(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        return pa.table(
            {
                "cx": pa.array(key // GI_GY, type=pa.int64()),
                "cy": pa.array(key % GI_GY, type=pa.int64()),
                "event_id": t["event_id"],
                "thin_rank": t["thin_rank"],
            }
        )

    return (
        _read_events(sf_dir, ["event_id"])
        .map_batches(hash_keyed, batch_format="pyarrow")
        .map_batches(topk_runs, batch_format="pyarrow")  # combiner: k per cell per batch
        .groupby("key")
        .map_groups(lambda g: strip(topk_runs(g.drop_columns(["thin_rank"]))), batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# zone_dispersion (mean center / standard distance / covariance per zone)
# ---------------------------------------------------------------------------

DISP_FP = 1e6  # coordinate quantum for moment sums (int64-safe squares)


def zone_dispersion(sf_dir: str) -> rd.Dataset:
    """Per-admin-zone dispersion statistics over the events inside it:
    mean center, standard distance, and the covariance term (the
    inputs of a standard deviational ellipse) — the point-pattern
    summary GIS dashboards draw per district.

    Coordinates are quantized to DISP_FP once (offset from the world
    corner so squares fit int64); ALL moments (n, Σx, Σy, Σx², Σy²,
    Σxy) are then exact integers — shuffle-order-free — and the float
    projections happen in one mirrored expression each.  The PiP side
    is the broadcast boundary index in an actor pool.

    Output: (rel_id, admin_level, n_events, mean_lon, mean_lat,
    std_dist, cov_xy), floats rounded to 6.
    """
    agg = _zone_moments(sf_dir)

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_events"].to_numpy().astype(np.float64)
        sx = t["sx"].to_numpy().astype(np.float64)
        sy = t["sy"].to_numpy().astype(np.float64)
        sxx = t["sxx"].to_numpy().astype(np.float64)
        syy = t["syy"].to_numpy().astype(np.float64)
        sxy = t["sxy"].to_numpy().astype(np.float64)
        mean_lon = duckdb_round(fixtures.LON_MIN + sx / DISP_FP / n, 6)
        mean_lat = duckdb_round(fixtures.LAT_MIN + sy / DISP_FP / n, 6)
        var_x = (sxx / n - (sx / n) * (sx / n)) / (DISP_FP * DISP_FP)
        var_y = (syy / n - (sy / n) * (sy / n)) / (DISP_FP * DISP_FP)
        cov = duckdb_round((sxy / n - (sx / n) * (sy / n)) / (DISP_FP * DISP_FP), 6)
        std_dist = duckdb_round(np.sqrt(var_x + var_y), 6)
        return pa.table(
            {
                "rel_id": t["rel_id"],
                "admin_level": t["admin_level"],
                "n_events": t["n_events"],
                "mean_lon": pa.array(mean_lon, type=pa.float64()),
                "mean_lat": pa.array(mean_lat, type=pa.float64()),
                "std_dist": pa.array(std_dist, type=pa.float64()),
                "cov_xy": pa.array(cov, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _zone_moments(sf_dir: str) -> rd.Dataset:
    """Shared first phase of zone_dispersion / std_ellipse: PiP-tag
    every event with its admin zone, quantize coordinates to DISP_FP
    (exact-int moments), and reduce (n, Σx, Σy, Σx², Σy², Σxy) per
    (rel_id, admin_level) through the aggregate tree."""
    from ..pipelines.spatial import boundary_index_ref
    from ..stages import geo

    idx_ref = boundary_index_ref()

    def prep(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        fx = np.floor((lon - fixtures.LON_MIN) * DISP_FP + 0.5).astype(np.int64)
        fy = np.floor((lat - fixtures.LAT_MIN) * DISP_FP + 0.5).astype(np.int64)
        return pa.table(
            {
                "lon": pa.array(lon, type=pa.float64()),
                "lat": pa.array(lat, type=pa.float64()),
                "fx": pa.array(fx, type=pa.int64()),
                "fy": pa.array(fy, type=pa.int64()),
            }
        )

    joined = (
        _read_events(sf_dir, ["event_id"])
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(
            geo.PiPJoinActor,
            fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("fx", "fy")),
            batch_format="pyarrow",
            concurrency=(1, 8),
            batch_size=8192,
        )
    )

    def moments(t: pa.Table) -> pa.Table:
        fx = t["fx"].to_numpy()
        fy = t["fy"].to_numpy()
        return pa.table(
            {
                "rel_id": t["rel_id"],
                "admin_level": t["admin_level"],
                "one": pa.array(np.ones(len(fx), dtype=np.int64), type=pa.int64()),
                "sx": t["fx"],
                "sy": t["fy"],
                "sxx": pa.array(fx * fx, type=pa.int64()),
                "syy": pa.array(fy * fy, type=pa.int64()),
                "sxy": pa.array(fx * fy, type=pa.int64()),
            }
        )

    agg = (
        joined.map_batches(moments, batch_format="pyarrow")
        .groupby(["rel_id", "admin_level"])
        .aggregate(
            Sum("one", alias_name="n_events"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
    )
    return agg


def std_ellipse(sf_dir: str) -> rd.Dataset:
    """Standard deviational ellipse per admin zone (Yuill / CrimeStat
    form): the orientation and semi-axes of the point cloud's 2x2
    covariance eigen-decomposition — the directional-distribution
    summary GIS dashboards draw as an ellipse over each district.
    Shares :func:`_zone_moments` with zone_dispersion (reference
    analogue: the A3/A5 per-area counter layer projected through the
    BB projector, `io.plasmap.model` geometry — re-expressed as
    moment sums in the aggregate tree).

        θ     = ½·atan2(2·cov, varx − vary)      (major-axis bearing)
        λ₁,λ₂ = (varx+vary)/2 ± sqrt(((varx−vary)/2)² + cov²)
        ecc   = sqrt(1 − λ₂/λ₁)                  (0 = circle)

    Exactness: all shuffled moments are int64 (DISP_FP quantum); the
    float expression tree above is mirrored LITERALLY by the DuckDB
    oracle (same association order, greatest(·,0) clamps on both
    sides), then duckdb_round(6)-ed.

    Scale shape: identical to zone_dispersion — broadcast boundary
    index in an actor pool, int64 moment combiner, one zone-bounded
    groupby, stateless finalize.  Output: (rel_id, admin_level,
    n_events, theta_rad, semi_major, semi_minor, eccentricity).
    """
    agg = _zone_moments(sf_dir)

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_events"].to_numpy().astype(np.float64)
        sx = t["sx"].to_numpy().astype(np.float64)
        sy = t["sy"].to_numpy().astype(np.float64)
        sxx = t["sxx"].to_numpy().astype(np.float64)
        syy = t["syy"].to_numpy().astype(np.float64)
        sxy = t["sxy"].to_numpy().astype(np.float64)
        vx = (sxx / n - (sx / n) * (sx / n)) / (DISP_FP * DISP_FP)
        vy = (syy / n - (sy / n) * (sy / n)) / (DISP_FP * DISP_FP)
        cv = (sxy / n - (sx / n) * (sy / n)) / (DISP_FP * DISP_FP)
        theta = 0.5 * np.arctan2(2.0 * cv, vx - vy)
        disc = np.sqrt(((vx - vy) / 2.0) * ((vx - vy) / 2.0) + cv * cv)
        lam1 = (vx + vy) / 2.0 + disc
        lam2 = (vx + vy) / 2.0 - disc
        semi_major = np.sqrt(np.maximum(lam1, 0.0))
        semi_minor = np.sqrt(np.maximum(lam2, 0.0))
        ecc = np.where(lam1 > 0.0, np.sqrt(np.maximum(1.0 - lam2 / np.where(lam1 > 0.0, lam1, 1.0), 0.0)), 0.0)
        return pa.table(
            {
                "rel_id": t["rel_id"],
                "admin_level": t["admin_level"],
                "n_events": t["n_events"],
                "theta_rad": pa.array(duckdb_round(theta, 6), type=pa.float64()),
                "semi_major": pa.array(duckdb_round(semi_major, 6), type=pa.float64()),
                "semi_minor": pa.array(duckdb_round(semi_minor, 6), type=pa.float64()),
                "eccentricity": pa.array(duckdb_round(ecc, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# local_moran (Anselin LISA: local spatial autocorrelation per lattice cell)
# ---------------------------------------------------------------------------


def local_moran(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """Local Moran's I per lattice cell with LISA quadrant labels.

    The companion statistic to :func:`getis_ord_hotspots` (reference
    analogue: the same A3/A5 per-cell counter layer — this adds
    Anselin's local autocorrelation on top): Gi* finds hot/cold
    intensity, LISA classifies each cell's relation to its neighbors
    (HH cluster, LL cluster, HL/LH outliers).  For cell i with the
    8-neighbor rook+bishop window (self EXCLUDED, unlike Gi*):

        z_i   = x_i - x̄
        lag_i = Σ_{j∈nbr(i)} x_j - x̄·w_i     (w_i = in-bounds nbrs)
        I_i   = z_i · lag_i / m2,  m2 = Σx²/n - x̄²

    Scale shape (identical to Gi*, exchange volume bounded by the
    LATTICE, never by input rows):
    - pass 1: map-side per-batch cell-count combiner -> tiny groupby;
    - global moments (Σn, Σn²) -> two scalars via the aggregate tree;
    - ONE scatter of the per-cell table to its 9 window keys carrying
      split (n_own, n_nbr) columns, so a single groupby recovers both
      the cell's own count and its neighbor sum (no outer join);
    - stateless vectorized projection.

    Float discipline: shuffled quantities are int64; the I_i
    expression tree is mirrored literally by the SQL oracle, then
    duckdb_round(6)-ed on both sides.  Quadrant labels derive from
    sign tests on those exact floats (>= 0 is "high") so they are
    engine-independent.

    Output: (cx, cy, n_own, nbr_sum, w, moran_i, quad) — one row per
    cell whose 3x3 window holds >=1 event.
    """
    counts = _cell_counts(sf_dir, eps).materialize()  # <= GI_NCELLS rows

    def moments(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy()
        return pa.table(
            {
                "tot": pa.array([int(n.sum())], type=pa.int64()),
                "ssq": pa.array([int((n * n).sum())], type=pa.int64()),
            }
        )

    agg = counts.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("tot", alias_name="tot"), Sum("ssq", alias_name="ssq")
    )
    tot, ssq = float(agg["tot"]), float(agg["ssq"])
    mean = tot / float(GI_NCELLS)
    m2 = ssq / float(GI_NCELLS) - mean * mean

    def scatter(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        n = t["n"].to_numpy()
        zero = np.zeros_like(n)
        outs = []
        for dx, dy in _OFFSETS:
            nx, ny = cx + dx, cy + dy
            m = (nx >= 0) & (nx < GI_GX) & (ny >= 0) & (ny < GI_GY)
            own = dx == 0 and dy == 0
            outs.append(
                pa.table(
                    {
                        "cx": pa.array(nx[m], type=pa.int64()),
                        "cy": pa.array(ny[m], type=pa.int64()),
                        "n_own": pa.array((n if own else zero)[m], type=pa.int64()),
                        "n_nbr": pa.array((zero if own else n)[m], type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    merged = (
        counts.map_batches(scatter, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(Sum("n_own", alias_name="n_own"), Sum("n_nbr", alias_name="nbr_sum"))
    )

    def project(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        own = t["n_own"].to_numpy().astype(np.float64)
        snb = t["nbr_sum"].to_numpy().astype(np.float64)
        # in-bounds 8-neighbor count: window size minus self
        wx = np.minimum(cx + 1, GI_GX - 1) - np.maximum(cx - 1, 0) + 1
        wy = np.minimum(cy + 1, GI_GY - 1) - np.maximum(cy - 1, 0) + 1
        w = (wx * wy - 1).astype(np.int64)
        wf = w.astype(np.float64)
        z = own - mean
        lag = snb - mean * wf
        moran = duckdb_round(z * lag / m2, 6)
        hi_z, hi_lag = z >= 0.0, lag >= 0.0
        quad = np.where(hi_z, np.where(hi_lag, "HH", "HL"), np.where(hi_lag, "LH", "LL"))
        return pa.table(
            {
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
                "n_own": t["n_own"],
                "nbr_sum": t["nbr_sum"],
                "w": pa.array(w, type=pa.int64()),
                "moran_i": pa.array(moran, type=pa.float64()),
                "quad": pa.array(quad.tolist(), type=pa.string()),
            }
        )

    return merged.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# kde_density (Epanechnikov kernel density raster at lattice sites)
# ---------------------------------------------------------------------------

KDE_H = 0.25  # kernel bandwidth, planar degrees
KDE_FP = 1e6  # per-pair fixed-point scale for kernel weights
# 2-D Epanechnikov normalization 2/(pi h^2); python-computed once so the
# engine and the SQL oracle share the identical float64 literal
KDE_NORM = 2.0 / (3.141592653589793 * KDE_H * KDE_H)


def kde_density(sf_dir: str, h: float = KDE_H) -> rd.Dataset:
    """Kernel density raster: Epanechnikov KDE evaluated at the 300
    lattice site centers (the heatmap layer a tile server renders on
    top of the reference's A3/A5 per-cell counters; density complement
    to :func:`idw_interpolation`'s value interpolation).

    The Epanechnikov kernel K(u) = 1 - u² on u ≤ 1 is chosen over a
    Gaussian deliberately: its weight is a rational function of exact
    inputs, so per-pair fixed-point quantization (floor(w·FP + 0.5))
    makes the partial sums order-free int64 — bit-stable under any
    batch split — where exp() would drift across libm versions.

    Scale shape: identical to IDW — rows × 300-site masked kernel
    matrix per batch (one BLAS-free vectorized pass), only (site,
    count, sum_w) int64 partials shuffle, one lattice-bounded groupby.

    Output: (cx, cy, n_events, sum_w_fp, intensity) per site with ≥1
    in-bandwidth event; intensity = Σw/FP · 2/(πh²), rounded 6.
    """
    sx = (fixtures.LON_MIN + (np.arange(GI_GX) + 0.5) * GI_EPS).repeat(GI_GY)
    sy = np.tile(fixtures.LAT_MIN + (np.arange(GI_GY) + 0.5) * GI_EPS, GI_GX)
    scx = np.arange(GI_GX).repeat(GI_GY).astype(np.int64)
    scy = np.tile(np.arange(GI_GY), GI_GX).astype(np.int64)
    h2 = h * h

    n_sites = len(sx)

    # per-point lattice window (the IDW round-3 optimization): a site
    # can be in bandwidth only within ceil(h/eps)+1 lattice steps of
    # the point's nearest site — (2R+1)^2 windowed candidates instead
    # of the dense rows x 300 matrix; the surviving pairs' floats are
    # the SAME expressions, so the fixed-point partials are identical
    R = int(np.ceil(h / GI_EPS)) + 1
    offs = np.arange(-R, R + 1, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        fx = (lon - fixtures.LON_MIN) / GI_EPS - 0.5
        fy = (lat - fixtures.LAT_MIN) / GI_EPS - 0.5
        ci = np.round(fx).astype(np.int64)[:, None] + offs[None, :]
        cj = np.round(fy).astype(np.int64)[:, None] + offs[None, :]
        vi = (ci >= 0) & (ci < GI_GX)
        vj = (cj >= 0) & (cj < GI_GY)
        dxw = lon[:, None] - (fixtures.LON_MIN + (ci + 0.5) * GI_EPS)
        dyw = lat[:, None] - (fixtures.LAT_MIN + (cj + 0.5) * GI_EPS)
        d2 = dxw[:, :, None] ** 2 + dyw[:, None, :] ** 2
        mask = (d2 <= h2) & vi[:, :, None] & vj[:, None, :]
        pi, ii, jj = np.nonzero(mask)
        si = ci[pi, ii] * GI_GY + cj[pi, jj]
        w = 1.0 - d2[pi, ii, jj] / h2
        fw = np.floor(w * KDE_FP + 0.5).astype(np.int64)
        n = np.bincount(si, minlength=n_sites).astype(np.int64)
        sum_w = np.zeros(n_sites, dtype=np.int64)
        np.add.at(sum_w, si, fw)
        keep = n > 0
        return pa.table(
            {
                "cx": pa.array(scx[keep], type=pa.int64()),
                "cy": pa.array(scy[keep], type=pa.int64()),
                "n_events": pa.array(n[keep], type=pa.int64()),
                "sum_w_fp": pa.array(sum_w[keep], type=pa.int64()),
            }
        )

    agg = (
        _read_events(sf_dir, ["event_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=32768)
        .groupby(["cx", "cy"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_w_fp", alias_name="sum_w_fp"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        sw = t["sum_w_fp"].to_numpy().astype(np.float64)
        intensity = duckdb_round(sw / KDE_FP * KDE_NORM, 6)
        return pa.table(
            {
                "cx": t["cx"],
                "cy": t["cy"],
                "n_events": t["n_events"],
                "sum_w_fp": t["sum_w_fp"],
                "intensity": pa.array(intensity, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cross_k (bivariate colocation: ordered cross-type pair counts per radius)
# ---------------------------------------------------------------------------

_FULL_2D = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1))


def cross_k(sf_dir: str, radii: tuple[float, ...] = RIPLEY_RADII, num_partitions: int = 8) -> rd.Dataset:
    """Bivariate (cross-type) K pair counts: for every ORDERED pair of
    event types (ta, tb), the number of ordered point pairs (a, b),
    a ≠ b, with type(a)=ta, type(b)=tb and distance ≤ r — the
    colocation diagnostic ("are cafes near bus stops?") that
    complements :func:`ripley_k`'s univariate clustering measure.

    Same bucket-join discipline as ripley_k, with a FULL 3x3 probe
    neighborhood instead of the half one (pairs are ordered here, so
    each (a, b) must be generated exactly once rather than each
    unordered pair): buckets at pitch r_max, ONE hash join, per-batch
    mask-counts — the aggregate moves (types² × radii) rows per batch,
    candidates stay bounded by local density.

    Output: (type_a, type_b, r, n_pairs), rows only for combinations
    with ≥ 1 pair.
    """
    rmax = max(radii)
    ds = _read_events(sf_dir, ["event_id", "event_type"])

    def keyed(t: pa.Table, side: str) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / rmax).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / rmax).astype(np.int64)
        return pa.table(
            {
                f"id_{side}": t["event_id"],
                f"type_{side}": t["event_type"],
                f"lon_{side}": pa.array(lon, type=pa.float64()),
                f"lat_{side}": pa.array(lat, type=pa.float64()),
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
            }
        )

    def own_key(t: pa.Table) -> pa.Table:
        ck = (t["cx"].to_numpy() + 1) * (1 << 21) + (t["cy"].to_numpy() + 1)
        return t.drop_columns(["cx", "cy"]).append_column("ck", pa.array(ck, type=pa.int64()))

    def probe_expand(t: pa.Table) -> pa.Table:
        cx, cy = t["cx"].to_numpy(), t["cy"].to_numpy()
        t = t.drop_columns(["cx", "cy"])
        out = []
        for dx, dy in _FULL_2D:
            ck = (cx + dx + 1) * (1 << 21) + (cy + dy + 1)
            out.append(t.append_column("ck", pa.array(ck, type=pa.int64())))
        return pa.concat_tables(out)

    import functools as _ft

    build = ds.map_batches(_ft.partial(keyed, side="b"), batch_format="pyarrow").map_batches(
        own_key, batch_format="pyarrow"
    )
    probe = ds.map_batches(_ft.partial(keyed, side="a"), batch_format="pyarrow").map_batches(
        probe_expand, batch_format="pyarrow"
    )
    cand = safe_join(probe, build, join_type="inner", num_partitions=num_partitions, on=("ck",))

    def count_radii(t: pa.Table) -> pa.Table:
        import pandas as pd

        ia = np.asarray(t["id_a"].to_numpy(), np.int64)
        ib = np.asarray(t["id_b"].to_numpy(), np.int64)
        dlon = t["lon_b"].to_numpy() - t["lon_a"].to_numpy()
        dlat = t["lat_b"].to_numpy() - t["lat_a"].to_numpy()
        d2 = dlon * dlon + dlat * dlat
        base = ia != ib
        frames = []
        ta = t["type_a"].to_pandas()  # bounded: per-batch Arrow column view (inside map, not a driver collect)
        tb = t["type_b"].to_pandas()  # bounded: per-batch Arrow column view (inside map, not a driver collect)
        for r in radii:
            m = base & (d2 <= r * r)
            if not m.any():
                continue
            g = (
                pd.DataFrame({"type_a": ta[m], "type_b": tb[m]})
                .groupby(["type_a", "type_b"], sort=False)
                .size()
                .reset_index(name="n")
            )
            g["r"] = r
            frames.append(g)
        if not frames:
            return pa.table(
                {
                    "type_a": pa.array([], type=pa.string()),
                    "type_b": pa.array([], type=pa.string()),
                    "r": pa.array([], type=pa.float64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        out = pd.concat(frames, ignore_index=True)
        return pa.table(
            {
                "type_a": pa.array(out["type_a"], type=pa.string()),
                "type_b": pa.array(out["type_b"], type=pa.string()),
                "r": pa.array(out["r"].to_numpy(), type=pa.float64()),
                "n": pa.array(out["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    return (
        cand.map_batches(count_radii, batch_format="pyarrow")
        .groupby(["type_a", "type_b", "r"])
        .aggregate(Sum("n", alias_name="n_pairs"))
    )


# ---------------------------------------------------------------------------
# nearest_neighbor (self-NN join within a radius bound)
# ---------------------------------------------------------------------------

NN_RADIUS = 0.05  # search bound, planar degrees


def nearest_neighbor(sf_dir: str, radius: float = NN_RADIUS, num_partitions: int = 8) -> rd.Dataset:
    """Radius-bounded self nearest-neighbor join: for every event, its
    closest OTHER event within ``radius`` (the per-point primitive
    behind mean-NN-distance / Clark-Evans dispersion tests, and the
    J7 family's self-join form).  Points with no neighbor inside the
    bound emit no row — the radius contract that keeps the search a
    ONE-shot bucket join instead of an unbounded expanding-ring probe.

    Shape: pitch-``radius`` buckets, full 3x3 probe join (ordered
    pairs), then argmin per event in two stages — a per-batch
    keep-best combiner (≤1 row per event per batch, the mosaic argmax
    discipline) and a coarse-partition run-scan reduce — so the final
    shuffle carries ≤ events×batches best-rows, never candidates.

    Determinism: distances are fixed-point int64 (trajectory _seg_fp
    contract); ties break on (dist_fp, nn_id) exactly like the SQL
    oracle's ORDER BY.

    Output: (event_id, nn_id, dist_fp).
    """
    from .trajectory import FP_SCALE

    ds = _read_events(sf_dir, ["event_id"])

    def keyed(t: pa.Table, side: str) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / radius).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / radius).astype(np.int64)
        return pa.table(
            {
                f"id_{side}": t["event_id"],
                f"lon_{side}": pa.array(lon, type=pa.float64()),
                f"lat_{side}": pa.array(lat, type=pa.float64()),
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
            }
        )

    def own_key(t: pa.Table) -> pa.Table:
        ck = (t["cx"].to_numpy() + 1) * (1 << 21) + (t["cy"].to_numpy() + 1)
        return t.drop_columns(["cx", "cy"]).append_column("ck", pa.array(ck, type=pa.int64()))

    def probe_expand(t: pa.Table) -> pa.Table:
        cx, cy = t["cx"].to_numpy(), t["cy"].to_numpy()
        t = t.drop_columns(["cx", "cy"])
        out = []
        for dx, dy in _FULL_2D:
            ck = (cx + dx + 1) * (1 << 21) + (cy + dy + 1)
            out.append(t.append_column("ck", pa.array(ck, type=pa.int64())))
        return pa.concat_tables(out)

    import functools as _ft

    build = ds.map_batches(_ft.partial(keyed, side="b"), batch_format="pyarrow").map_batches(
        own_key, batch_format="pyarrow"
    )
    probe = ds.map_batches(_ft.partial(keyed, side="a"), batch_format="pyarrow").map_batches(
        probe_expand, batch_format="pyarrow"
    )
    cand = safe_join(probe, build, join_type="inner", num_partitions=num_partitions, on=("ck",))

    r2 = radius * radius

    def best_per_batch(t: pa.Table) -> pa.Table:
        ia = np.asarray(t["id_a"].to_numpy(), np.int64)
        ib = np.asarray(t["id_b"].to_numpy(), np.int64)
        dlon = t["lon_b"].to_numpy() - t["lon_a"].to_numpy()
        dlat = t["lat_b"].to_numpy() - t["lat_a"].to_numpy()
        d2 = dlon * dlon + dlat * dlat
        m = (ia != ib) & (d2 <= r2)
        ia, ib, d2 = ia[m], ib[m], d2[m]
        dfp = np.floor(np.sqrt(d2) * FP_SCALE + 0.5).astype(np.int64)
        # keep best (dist_fp, nn_id) per event within this batch
        order = np.lexsort((ib, dfp, ia))
        ia, ib, dfp = ia[order], ib[order], dfp[order]
        first = np.concatenate([[True], np.diff(ia) != 0]) if len(ia) else np.array([], dtype=bool)
        part = ia[first] % num_partitions if len(ia) else np.array([], dtype=np.int64)
        return pa.table(
            {
                "event_id": pa.array(ia[first], type=pa.int64()),
                "nn_id": pa.array(ib[first], type=pa.int64()),
                "dist_fp": pa.array(dfp[first], type=pa.int64()),
                "part": pa.array(part, type=pa.int64()),
            }
        )

    def reduce_best(g: pa.Table) -> pa.Table:
        ia = g["event_id"].to_numpy()
        ib = g["nn_id"].to_numpy()
        dfp = g["dist_fp"].to_numpy()
        order = np.lexsort((ib, dfp, ia))
        ia, ib, dfp = ia[order], ib[order], dfp[order]
        first = np.concatenate([[True], np.diff(ia) != 0]) if len(ia) else np.array([], dtype=bool)
        return pa.table(
            {
                "event_id": pa.array(ia[first], type=pa.int64()),
                "nn_id": pa.array(ib[first], type=pa.int64()),
                "dist_fp": pa.array(dfp[first], type=pa.int64()),
            }
        )

    return (
        cand.map_batches(best_per_batch, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_best, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# clark_evans (nearest-neighbor dispersion test vs CSR)
# ---------------------------------------------------------------------------


def clark_evans(sf_dir: str, radius: float = NN_RADIUS) -> rd.Dataset:
    """Clark–Evans nearest-neighbor test (Clark & Evans 1954): the
    ratio R of the observed mean NN distance to the mean expected
    under complete spatial randomness at the same density — R<1
    clustered, R≈1 random, R>1 dispersed — plus the normal z-score.
    The one-number dispersion summary run before any hotspot hunt
    (reference analogue: J7's self-NN primitive, aggregated).

    Semantics under the radius bound: the observed mean is taken over
    events that HAVE a neighbor within ``radius`` (the same contract
    as nearest_neighbor; at fixture densities that is every event),
    while density λ = n_total/A uses ALL events over the fixed
    planar extent A = LON_SPAN·LAT_SPAN.  Expected mean = 0.5/√λ;
    SE = 0.26136/√(n_total·λ) (standard CSR constants).

    Scale shape: the NN pipeline's per-event best rows and a pruned
    events scan both collapse to single-key integer partials (count,
    Σdist_fp) — ONE tiny union + groupby-sum; only three int64s reach
    the finish step.  Output one row: (n_points, n_with_nn,
    mean_nn_dist, expected_nn_dist, clark_evans_r, z_score).
    """
    from .trajectory import FP_SCALE

    nn = nearest_neighbor(sf_dir, radius=radius)

    def nn_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "n_total": pa.array([0], type=pa.int64()),
                "n_nn": pa.array([t.num_rows], type=pa.int64()),
                "sum_fp": pa.array([int(t["dist_fp"].to_numpy().sum())], type=pa.int64()),
            }
        )

    def ev_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "n_total": pa.array([t.num_rows], type=pa.int64()),
                "n_nn": pa.array([0], type=pa.int64()),
                "sum_fp": pa.array([0], type=pa.int64()),
            }
        )

    ev = _read_events(sf_dir, ["event_id"]).map_batches(ev_partial, batch_format="pyarrow")
    parts = nn.map_batches(nn_partial, batch_format="pyarrow").union(ev)
    agg = parts.groupby("k").aggregate(
        Sum("n_total", alias_name="n_total"),
        Sum("n_nn", alias_name="n_nn"),
        Sum("sum_fp", alias_name="sum_fp"),
    )

    area = fixtures.LON_SPAN * fixtures.LAT_SPAN

    def finish(t: pa.Table) -> pa.Table:
        n_total = t["n_total"].to_numpy().astype(np.float64)
        n_nn = np.maximum(t["n_nn"].to_numpy().astype(np.float64), 1.0)
        mean_nn = (t["sum_fp"].to_numpy().astype(np.float64) / FP_SCALE) / n_nn
        lam = n_total / area
        expected = 0.5 / np.sqrt(lam)
        r = mean_nn / expected
        se = 0.26136 / np.sqrt(n_total * lam)
        z = (mean_nn - expected) / se
        return pa.table(
            {
                "n_points": t["n_total"].cast(pa.int64()),
                "n_with_nn": t["n_nn"].cast(pa.int64()),
                "mean_nn_dist": pa.array(duckdb_round(mean_nn, 6), type=pa.float64()),
                "expected_nn_dist": pa.array(duckdb_round(expected, 6), type=pa.float64()),
                "clark_evans_r": pa.array(duckdb_round(r, 6), type=pa.float64()),
                "z_score": pa.array(duckdb_round(z, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# burst_cells (temporal anomaly detection per lattice cell)
# ---------------------------------------------------------------------------

BURST_K = 2  # flag days > k sigma above the cell's own mean
BURST_MIN_DAYS = 3  # cells observed on fewer days have no baseline
DAY_US = 86_400_000_000


def burst_cells(
    sf_dir: str, eps: float = GI_EPS, k: int = BURST_K, min_days: int = BURST_MIN_DAYS
) -> rd.Dataset:
    """Temporal burst detection: days where a cell's event count sits
    more than ``k`` standard deviations above that cell's own daily
    baseline — the "something happened HERE on THIS day" screen run
    before event attribution (reference analogue: the per-cell
    counters of A3 gain a time axis and an anomaly test).

    Exactness: with D = observed days, S = Σ n_d, Q = Σ n_d² (all
    int64), the test  n > S/D + k·σ  (population σ) is equivalent to

        n·D - S > 0  AND  (n·D - S)² > k²·(Q·D - S²)

    — pure integer arithmetic, so no float ever crosses an engine
    boundary and the SQL oracle mirrors it literally.

    Scale shape: pass 1 is the per-batch (cell, day) count combiner →
    one groupby over (cell, day) keys (lattice × active days, never
    input rows); the baseline join is a per-CELL regroup of that tiny
    table.  Output: (cx, cy, day, n_events) for burst days only.
    """

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        day = t["ts"].cast(pa.int64()).to_numpy() // DAY_US
        return pa.table(
            {
                "key": pa.array(cx * GI_GY + cy, type=pa.int64()),
                "day": pa.array(day, type=pa.int64()),
                "n": pa.array(np.ones(len(ids), dtype=np.int64), type=pa.int64()),
            }
        )

    daily = (
        _read_events(sf_dir, ["event_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["key", "day"])
        .aggregate(Sum("n", alias_name="n_events"))
    )

    empty = pa.table(
        {
            "cx": pa.array([], type=pa.int64()),
            "cy": pa.array([], type=pa.int64()),
            "day": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
        }
    )

    def flag(g: pa.Table) -> pa.Table:
        n = g["n_events"].to_numpy()
        d = np.int64(len(n))
        if d < min_days:
            return empty
        s = np.int64(n.sum())
        q = np.int64((n * n).sum())
        dev = n * d - s
        hot = (dev > 0) & (dev * dev > k * k * (q * d - s * s))
        if not hot.any():
            return empty
        key = g["key"].to_numpy()[hot]
        return pa.table(
            {
                "cx": pa.array(key // GI_GY, type=pa.int64()),
                "cy": pa.array(key % GI_GY, type=pa.int64()),
                "day": pa.array(g["day"].to_numpy()[hot], type=pa.int64()),
                "n_events": pa.array(n[hot], type=pa.int64()),
            }
        )

    return daily.groupby("key").map_groups(flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# kde_contours (raster -> vector: iso-level boundary edges)
# ---------------------------------------------------------------------------

# contour levels in exact fixed-point sum_w_fp units (integers, so the
# threshold test never touches a float)
CONTOUR_LEVELS_FP = (250_000_000, 300_000_000, 325_000_000)
_CONTOUR_SIDES = ((0, -1, 0), (1, 1, 0), (2, 0, -1), (3, 0, 1))  # (side, dx, dy)


def kde_contours(sf_dir: str, levels_fp: tuple[int, ...] = CONTOUR_LEVELS_FP) -> rd.Dataset:
    """Raster→vector contour extraction: for each iso level L, every
    lattice-cell edge where the density crosses L — cell value ≥ L on
    the inside, 4-neighbor value < L (or off-lattice/empty = 0) on the
    outside.  Chaining these edges is how a tile server polygonizes a
    heatmap into vector iso-bands; the edge set itself is the exact,
    order-free representation (binary marching squares on the cell
    graph).

    Thresholds are INTEGER fixed-point sum_w_fp values, so no float
    ever enters the comparison and the SQL oracle mirrors it with a
    plain coalesce-join.

    Scale shape: rides the KDE raster aggregate (lattice-bounded);
    the neighbor lookup is the Gi* scatter — each raster row scatters
    its value to its 4 neighbors (constant-factor explode of the CELL
    table), one more lattice-keyed groupby assembles (self, neighbor)
    values, the level sweep is stateless vectorized math.

    Output: (lvl, cx, cy, side) — side 0/1/2/3 = W/E/S/N edge of the
    inside cell.
    """
    raster = kde_density(sf_dir).select_columns(["cx", "cy", "sum_w_fp"])

    def scatter(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        v = t["sum_w_fp"].to_numpy()
        # dir = -1 carries the cell's own value; dir = s carries the
        # value of the cell's side-s neighbor (scattered FROM there)
        out_cx = [cx]
        out_cy = [cy]
        out_dir = [np.full(len(cx), -1, dtype=np.int64)]
        out_v = [v]
        for side, dx, dy in _CONTOUR_SIDES:
            # the source cell is the TARGET's neighbor on the opposite
            # side: scattering (cx+dx, cy+dy) <- v tags the target's
            # side (-dx,-dy)... i.e. opposite of (dx, dy)
            opp = {0: 1, 1: 0, 2: 3, 3: 2}[side]
            out_cx.append(cx + dx)
            out_cy.append(cy + dy)
            out_dir.append(np.full(len(cx), opp, dtype=np.int64))
            out_v.append(v)
        return pa.table(
            {
                "cx": pa.array(np.concatenate(out_cx), type=pa.int64()),
                "cy": pa.array(np.concatenate(out_cy), type=pa.int64()),
                "dir": pa.array(np.concatenate(out_dir), type=pa.int64()),
                "v": pa.array(np.concatenate(out_v), type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "lvl": pa.array([], type=pa.int64()),
            "cx": pa.array([], type=pa.int64()),
            "cy": pa.array([], type=pa.int64()),
            "side": pa.array([], type=pa.int64()),
        }
    )

    def edges(g: pa.Table) -> pa.Table:
        d = g["dir"].to_numpy()
        self_rows = d == -1
        if not self_rows.any():
            return empty  # scatter-only cell: value 0, never inside
        cx = int(g["cx"].to_numpy()[0])
        cy = int(g["cy"].to_numpy()[0])
        v_self = int(g["v"].to_numpy()[self_rows][0])
        nbr = np.zeros(4, dtype=np.int64)
        for side in range(4):
            m = d == side
            if m.any():
                nbr[side] = g["v"].to_numpy()[m][0]
        lvl_col, side_col = [], []
        for li, level in enumerate(levels_fp):
            if v_self < level:
                continue
            for side in range(4):
                if nbr[side] < level:
                    lvl_col.append(li)
                    side_col.append(side)
        if not lvl_col:
            return empty
        k = len(lvl_col)
        return pa.table(
            {
                "lvl": pa.array(lvl_col, type=pa.int64()),
                "cx": pa.array(np.full(k, cx), type=pa.int64()),
                "cy": pa.array(np.full(k, cy), type=pa.int64()),
                "side": pa.array(side_col, type=pa.int64()),
            }
        )

    return (
        raster.map_batches(scatter, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .map_groups(edges, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# distance_raster (distance transform: nearest event per lattice site)
# ---------------------------------------------------------------------------

DIST_FP = 1e12  # squared-degree fixed point (min is order-free anyway;
# fixing the value once makes the engine/oracle compare integer-exact)


def distance_raster(sf_dir: str) -> rd.Dataset:
    """Distance transform over the lattice: for every cell center, the
    squared distance to the NEAREST event — the coverage-gap raster
    (where is the closest observation?) behind sensor-placement and
    sampling-bias audits; complement of the KDE density layer.

    MIN is idempotent and order-free, so unlike the sum-based rasters
    no accumulation discipline is needed: each batch emits its local
    per-site minimum (300 rows), the groupby keeps the global minimum,
    and the single fixed-point quantization (floor(d2·1e12 + 0.5),
    applied BEFORE the min) makes the compare integer-exact.

    Scale shape: identical to IDW/KDE — per-batch (rows × sites)
    distance pass, per-site partials only; at planet-lattice sizes
    swap the dense site sweep for the event-bucketed expanding-ring
    search (stages.geo grid pattern), same output contract.

    Output: (cx, cy, min_d2_fp) for ALL lattice sites.
    """
    from ray.data.aggregate import Min

    sx = (fixtures.LON_MIN + (np.arange(GI_GX) + 0.5) * GI_EPS).repeat(GI_GY)
    sy = np.tile(fixtures.LAT_MIN + (np.arange(GI_GY) + 0.5) * GI_EPS, GI_GX)
    scx = np.arange(GI_GX).repeat(GI_GY).astype(np.int64)
    scy = np.tile(np.arange(GI_GY), GI_GX).astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        dx = lon[:, None] - sx[None, :]
        dy = lat[:, None] - sy[None, :]
        d2 = dx * dx
        d2 += dy * dy
        dmin = d2.min(axis=0)
        fp = np.floor(dmin * DIST_FP + 0.5).astype(np.int64)
        return pa.table(
            {
                "cx": pa.array(scx, type=pa.int64()),
                "cy": pa.array(scy, type=pa.int64()),
                "min_d2_fp": pa.array(fp, type=pa.int64()),
            }
        )

    return (
        _read_events(sf_dir, ["event_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=32768)
        .groupby(["cx", "cy"])
        .aggregate(Min("min_d2_fp", alias_name="min_d2_fp"))
    )


# ---------------------------------------------------------------------------
# voronoi_assign (discrete Voronoi: nearest-event id per lattice site)
# ---------------------------------------------------------------------------


def voronoi_assign(sf_dir: str) -> rd.Dataset:
    """Discrete Voronoi partition of the lattice: for every cell
    center, the id of the NEAREST event (ties broken by smaller
    event_id) plus its quantized squared distance — the assignment
    layer on top of :func:`distance_raster` (which event claims this
    site?), the primitive behind nearest-facility allocation and
    label-propagation rasters.

    Correctness shape: the per-site reduction is a lexicographic MIN
    over (d2_fp, event_id) — idempotent, order-free, exact in int64 —
    so per-batch partials (one candidate row per site) compose under
    any grouping.  Each batch emits its local argmin per site; the
    300-group ``map_groups`` keeps the global lexicographic min.
    Group input is bounded by (#batches x sites), never by row count.

    Scale shape: identical to distance_raster — per-batch
    (rows x sites) vectorized distance pass, per-site partials only;
    at planet-lattice sizes swap the dense sweep for the
    event-bucketed expanding-ring search.

    Output: (cx, cy, min_d2_fp, nn_event) for ALL lattice sites.
    """
    sx = (fixtures.LON_MIN + (np.arange(GI_GX) + 0.5) * GI_EPS).repeat(GI_GY)
    sy = np.tile(fixtures.LAT_MIN + (np.arange(GI_GY) + 0.5) * GI_EPS, GI_GX)
    scx = np.arange(GI_GX).repeat(GI_GY).astype(np.int64)
    scy = np.tile(np.arange(GI_GY), GI_GX).astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        dx = lon[:, None] - sx[None, :]
        dy = lat[:, None] - sy[None, :]
        d2 = dx * dx
        d2 += dy * dy
        fp = np.floor(d2 * DIST_FP + 0.5).astype(np.int64)
        # lexicographic argmin per site: smallest d2_fp, then smallest id.
        # Sort ids once so that among equal-fp rows argmin picks the
        # first = smallest event_id (np.argmin returns the first min).
        order = np.argsort(ids, kind="stable")
        fp = fp[order]
        ids_sorted = ids[order]
        best = np.argmin(fp, axis=0)
        return pa.table(
            {
                "cx": pa.array(scx, type=pa.int64()),
                "cy": pa.array(scy, type=pa.int64()),
                "min_d2_fp": pa.array(fp[best, np.arange(fp.shape[1])], type=pa.int64()),
                "nn_event": pa.array(ids_sorted[best], type=pa.int64()),
            }
        )

    def reduce(t: pa.Table) -> pa.Table:
        fp = t["min_d2_fp"].to_numpy()
        ev = t["nn_event"].to_numpy()
        m = fp.min()
        at = ev[fp == m].min()
        return pa.table(
            {
                "cx": t["cx"][:1],
                "cy": t["cy"][:1],
                "min_d2_fp": pa.array([int(m)], type=pa.int64()),
                "nn_event": pa.array([int(at)], type=pa.int64()),
            }
        )

    return (
        _read_events(sf_dir, ["event_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=32768)
        .groupby(["cx", "cy"])
        .map_groups(reduce, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# idw_loocv (leave-one-out cross-validation of the IDW field)
# ---------------------------------------------------------------------------

LOOCV_RADIUS = 0.05  # planar degrees (~26 neighbors/point in the fixture)


def idw_loocv(sf_dir: str, radius: float = LOOCV_RADIUS, num_partitions: int = 8) -> rd.Dataset:
    """Leave-one-out cross-validation of the IDW interpolator: each
    event's value predicted from its OTHER in-radius neighbors, with the
    fixed-point residual — the spatial-model QA layer (a field whose
    LOOCV residuals blow up is over-smoothed or under-sampled).

    Same bucket-join discipline as cross_k (pitch = radius, FULL 3x3
    probe neighborhood — pairs are ordered target<-source); per-batch
    candidate groups reduce to per-target int64 partial sums
    (floor-fixed-point weights, the idw_interpolation contract), one
    target-keyed groupby folds them, and the residual is a single
    mirrored float expression over the folded integers.

    Output: (event_id, n_neigh, sum_w_fp, sum_wv_fp, resid_fp) for
    events with >=1 in-radius neighbor.
    """
    import functools as _ft

    from ray.data.aggregate import Max as _Max

    ds = _read_events(sf_dir, ["event_id", "value"])
    r2 = radius * radius

    def keyed(t: pa.Table, side: str) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / radius).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / radius).astype(np.int64)
        return pa.table(
            {
                f"id_{side}": t["event_id"],
                f"val_{side}": t["value"],
                f"lon_{side}": pa.array(lon, type=pa.float64()),
                f"lat_{side}": pa.array(lat, type=pa.float64()),
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
            }
        )

    def own_key(t: pa.Table) -> pa.Table:
        ck = (t["cx"].to_numpy() + 1) * (1 << 21) + (t["cy"].to_numpy() + 1)
        return t.drop_columns(["cx", "cy"]).append_column("ck", pa.array(ck, type=pa.int64()))

    def probe_expand(t: pa.Table) -> pa.Table:
        cx, cy = t["cx"].to_numpy(), t["cy"].to_numpy()
        t = t.drop_columns(["cx", "cy"])
        out = []
        for dx, dy in _FULL_2D:
            ck = (cx + dx + 1) * (1 << 21) + (cy + dy + 1)
            out.append(t.append_column("ck", pa.array(ck, type=pa.int64())))
        return pa.concat_tables(out)

    build = ds.map_batches(_ft.partial(keyed, side="b"), batch_format="pyarrow").map_batches(
        own_key, batch_format="pyarrow"
    )
    probe = ds.map_batches(_ft.partial(keyed, side="a"), batch_format="pyarrow").map_batches(
        probe_expand, batch_format="pyarrow"
    )
    cand = safe_join(probe, build, join_type="inner", num_partitions=num_partitions, on=("ck",))

    def partial(t: pa.Table) -> pa.Table:
        ia = np.asarray(t["id_a"].to_numpy(), np.int64)
        ib = np.asarray(t["id_b"].to_numpy(), np.int64)
        dlon = t["lon_b"].to_numpy() - t["lon_a"].to_numpy()
        dlat = t["lat_b"].to_numpy() - t["lat_a"].to_numpy()
        d2 = dlon * dlon + dlat * dlat
        m = (ia != ib) & (d2 <= r2)
        if not m.any():
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "value": pa.array([], type=pa.float64()),
                    "n_neigh": pa.array([], type=pa.int64()),
                    "sum_w_fp": pa.array([], type=pa.int64()),
                    "sum_wv_fp": pa.array([], type=pa.int64()),
                }
            )
        ia, d2 = ia[m], d2[m]
        va = t["val_a"].to_numpy()[m]
        vb = t["val_b"].to_numpy()[m]
        w = 1.0 / (d2 + IDW_SOFT)
        fw = np.floor(w * IDW_FP + 0.5).astype(np.int64)
        fwv = np.floor(w * vb * IDW_FP + 0.5).astype(np.int64)
        uniq, inv = np.unique(ia, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        sw = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sw, inv, fw)
        swv = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(swv, inv, fwv)
        first = np.zeros(len(uniq), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(ia) - 1, -1, -1)
        return pa.table(
            {
                "event_id": pa.array(uniq, type=pa.int64()),
                "value": pa.array(va[first], type=pa.float64()),
                "n_neigh": pa.array(n, type=pa.int64()),
                "sum_w_fp": pa.array(sw, type=pa.int64()),
                "sum_wv_fp": pa.array(swv, type=pa.int64()),
            }
        )

    agg = (
        cand.map_batches(partial, batch_format="pyarrow")
        .groupby("event_id")
        .aggregate(
            _Max("value", alias_name="value"),
            Sum("n_neigh", alias_name="n_neigh"),
            Sum("sum_w_fp", alias_name="sum_w_fp"),
            Sum("sum_wv_fp", alias_name="sum_wv_fp"),
        )
    )

    def resid(t: pa.Table) -> pa.Table:
        sw = t["sum_w_fp"].to_numpy().astype(np.float64)
        swv = t["sum_wv_fp"].to_numpy().astype(np.float64)
        r = np.floor((t["value"].to_numpy() - swv / sw) * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "n_neigh": t["n_neigh"],
                "sum_w_fp": t["sum_w_fp"],
                "sum_wv_fp": t["sum_wv_fp"],
                "resid_fp": pa.array(r, type=pa.int64()),
            }
        )

    return agg.map_batches(resid, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cell_trend (per-cell least-squares daily trend — integer-exact)
# ---------------------------------------------------------------------------

TREND_MIN_DAYS = 5


def cell_trend(sf_dir: str, eps: float = GI_EPS, min_days: int = TREND_MIN_DAYS) -> rd.Dataset:
    """Per-cell temporal trend: the least-squares slope of daily event
    counts over observed days — "is activity here growing or dying?",
    the screening layer between burst detection (one anomalous day)
    and change detection (two fixed epochs).

    Exactness: with x = epoch day, y = daily count, the closed form
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) is a ratio of int64
    sums; both engines build the SAME integers and divide once, so the
    rounded slope is identical.  Observed days only (a day with zero
    events contributes no sample — documented; densify against a day
    range join where zeros must count).

    Scale: one (cell, day) count shuffle (lattice × active days), then
    a cell-keyed reduce of 4 integer moments.  Output: (cx, cy,
    n_days, slope_num, slope_den, slope) for cells with >= min_days
    and a non-degenerate denominator.
    """
    daily = (
        _read_events(sf_dir, ["event_id", "ts"])
        .map_batches(_daily_partial_factory(eps), batch_format="pyarrow")
        .groupby(["key", "day"])
        .aggregate(Sum("n", alias_name="n_events"))
    )

    def moments(t: pa.Table) -> pa.Table:
        x = t["day"].to_numpy().astype(np.int64)
        y = t["n_events"].to_numpy().astype(np.int64)
        one = np.ones(len(x), dtype=np.int64)
        return pa.table(
            {
                "key": t["key"],
                "n": pa.array(one),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sx2": pa.array(x * x),
            }
        )

    agg = (
        daily.map_batches(moments, batch_format="pyarrow")
        .groupby("key")
        .aggregate(
            Sum("n", alias_name="n_days"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sx2", alias_name="sx2"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        from ..stages.common import duckdb_round

        n = t["n_days"].to_numpy().astype(np.int64)
        sx = t["sx"].to_numpy().astype(np.int64)
        sy = t["sy"].to_numpy().astype(np.int64)
        num = n * t["sxy"].to_numpy().astype(np.int64) - sx * sy
        den = n * t["sx2"].to_numpy().astype(np.int64) - sx * sx
        keep = (n >= min_days) & (den > 0)
        key = t["key"].to_numpy().astype(np.int64)[keep]
        slope = duckdb_round(num[keep].astype(np.float64) / den[keep].astype(np.float64), 9)
        return pa.table(
            {
                "cx": pa.array(key // GI_GY, type=pa.int64()),
                "cy": pa.array(key % GI_GY, type=pa.int64()),
                "n_days": pa.array(n[keep]),
                "slope_num": pa.array(num[keep]),
                "slope_den": pa.array(den[keep]),
                "slope": pa.array(slope, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _daily_partial_factory(eps: float):
    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        day = t["ts"].cast(pa.int64()).to_numpy() // DAY_US
        return pa.table(
            {
                "key": pa.array(cx * GI_GY + cy, type=pa.int64()),
                "day": pa.array(day, type=pa.int64()),
                "n": pa.array(np.ones(len(ids), dtype=np.int64), type=pa.int64()),
            }
        )

    return partial


# ---------------------------------------------------------------------------
# global_moran (global spatial autocorrelation scalar)
# ---------------------------------------------------------------------------

# lattice constant: W = sum_i w_i where w_i = in-bounds 8-neighbors of
# cell i.  sum over the grid of (3x3 window size) = (3*GX-2)*(3*GY-2),
# minus one self per cell.
MORAN_W = (3 * GI_GX - 2) * (3 * GI_GY - 2) - GI_NCELLS


def global_moran(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """Global Moran's I over the event lattice — the single-scalar
    spatial-autocorrelation test (Moran 1950) that complements the
    per-cell LISA decomposition of :func:`local_moran` (reference
    analogue: the A3/A5 cell-counter layer feeding a corpus-level
    clustering diagnostic).  Binary queen (8-neighbor) weights, empty
    lattice cells included in the field:

        I = (N / W) * SUM_ij w_ij z_i z_j / SUM_i z_i^2,   z_i = x_i - mean

    Everything that touches data is INTEGER: with S1=SUM x, S2=SUM x^2,
    Sc=SUM_ij w_ij x_i x_j, Sw=SUM_i w_i x_i (all int64, occupied cells
    only) and the closed-form lattice constants N, W,

        num = Sc - 2*mean*Sw + mean^2*W        (w symmetric)
        den = S2 - N*mean^2

    so the only floats are one mirrored final expression.  Exchange
    volume is bounded by the LATTICE (<= 300 cells), never input rows:
    the per-cell counts reuse the map-side combiner, the cross term is
    ONE 9-key scatter + groupby (the local_moran shape), and the four
    partial sums fold through a single-row aggregate.

    Output: one row (n_occupied, s1, s2, s_cross, s_wrow, moran_i).
    """
    counts = _cell_counts(sf_dir, eps).materialize()  # <= GI_NCELLS rows

    def scatter(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        n = t["n"].to_numpy()
        zero = np.zeros_like(n)
        outs = []
        for dx, dy in _OFFSETS:
            nx, ny = cx + dx, cy + dy
            m = (nx >= 0) & (nx < GI_GX) & (ny >= 0) & (ny < GI_GY)
            own = dx == 0 and dy == 0
            outs.append(
                pa.table(
                    {
                        "cx": pa.array(nx[m], type=pa.int64()),
                        "cy": pa.array(ny[m], type=pa.int64()),
                        "n_own": pa.array((n if own else zero)[m], type=pa.int64()),
                        "n_nbr": pa.array((zero if own else n)[m], type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    merged = (
        counts.map_batches(scatter, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(Sum("n_own", alias_name="n_own"), Sum("n_nbr", alias_name="nbr_sum"))
    )

    def partials(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        own = t["n_own"].to_numpy().astype(np.int64)
        nbr = t["nbr_sum"].to_numpy().astype(np.int64)
        wx = np.minimum(cx + 1, GI_GX - 1) - np.maximum(cx - 1, 0) + 1
        wy = np.minimum(cy + 1, GI_GY - 1) - np.maximum(cy - 1, 0) + 1
        w = (wx * wy - 1).astype(np.int64)
        one = np.ones(len(cx), dtype=np.int64)
        return pa.table(
            {
                "occ": pa.array(np.where(own > 0, one, 0 * one), type=pa.int64()),
                "s1": pa.array(own, type=pa.int64()),
                "s2": pa.array(own * own, type=pa.int64()),
                "sc": pa.array(own * nbr, type=pa.int64()),
                "sw": pa.array(w * own, type=pa.int64()),
            }
        )

    agg = merged.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum("occ", alias_name="n_occupied"),
        Sum("s1", alias_name="s1"),
        Sum("s2", alias_name="s2"),
        Sum("sc", alias_name="s_cross"),
        Sum("sw", alias_name="s_wrow"),
    )
    s1, s2 = float(agg["s1"]), float(agg["s2"])
    sc, sw = float(agg["s_cross"]), float(agg["s_wrow"])
    mean = s1 / float(GI_NCELLS)
    num = sc - 2.0 * mean * sw + mean * mean * float(MORAN_W)
    den = s2 - float(GI_NCELLS) * mean * mean
    from ..stages.common import duckdb_round as _dr

    i_val = float(_dr(np.array([(float(GI_NCELLS) / float(MORAN_W)) * num / den]), 6)[0])
    return rd.from_arrow(
        pa.table(
            {
                "n_occupied": pa.array([int(agg["n_occupied"])], type=pa.int64()),
                "s1": pa.array([int(agg["s1"])], type=pa.int64()),
                "s2": pa.array([int(agg["s2"])], type=pa.int64()),
                "s_cross": pa.array([int(agg["s_cross"])], type=pa.int64()),
                "s_wrow": pa.array([int(agg["s_wrow"])], type=pa.int64()),
                "moran_i": pa.array([i_val], type=pa.float64()),
            }
        )
    )


def geary_c(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """Global Geary's C over the event lattice (Geary 1954) — the
    squared-difference spatial-autocorrelation scalar (C<1 clustered,
    C≈1 random, C>1 dispersed), more sensitive to LOCAL differences
    than Moran's I's covariance form; the pair every spatial screen
    reports together.  Same binary queen weights / empty-cells-included
    field as :func:`global_moran`.

        C = ((N−1) / (2W)) · Σ_ij w_ij (x_i − x_j)² / Σ_i (x_i − x̄)²

    Integer core: Σ_ij w_ij (x_i−x_j)² = 2(Σ_i w_i x_i² − Σ_ij w_ij
    x_i x_j) = 2(Sw2 − Sc) — both int64 via the SAME one-exchange
    scatter as Moran (Sw2 is one extra product column); the
    denominator is Moran's S2 − N·mean².  Only the final expression is
    float, mirrored.  Exchange stays lattice-bounded.

    Output: one row (n_occupied, s2, s_cross, s_w2, geary_c).
    """
    counts = _cell_counts(sf_dir, eps).materialize()  # <= GI_NCELLS rows

    def scatter(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        n = t["n"].to_numpy()
        zero = np.zeros_like(n)
        outs = []
        for dx, dy in _OFFSETS:
            nx, ny = cx + dx, cy + dy
            m = (nx >= 0) & (nx < GI_GX) & (ny >= 0) & (ny < GI_GY)
            own = dx == 0 and dy == 0
            outs.append(
                pa.table(
                    {
                        "cx": pa.array(nx[m], type=pa.int64()),
                        "cy": pa.array(ny[m], type=pa.int64()),
                        "n_own": pa.array((n if own else zero)[m], type=pa.int64()),
                        "n_nbr": pa.array((zero if own else n)[m], type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    merged = (
        counts.map_batches(scatter, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(Sum("n_own", alias_name="n_own"), Sum("n_nbr", alias_name="nbr_sum"))
    )

    def partials(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        own = t["n_own"].to_numpy().astype(np.int64)
        nbr = t["nbr_sum"].to_numpy().astype(np.int64)
        wx = np.minimum(cx + 1, GI_GX - 1) - np.maximum(cx - 1, 0) + 1
        wy = np.minimum(cy + 1, GI_GY - 1) - np.maximum(cy - 1, 0) + 1
        w = (wx * wy - 1).astype(np.int64)
        one = np.ones(len(cx), dtype=np.int64)
        return pa.table(
            {
                "occ": pa.array(np.where(own > 0, one, 0 * one), type=pa.int64()),
                "s1": pa.array(own, type=pa.int64()),
                "s2": pa.array(own * own, type=pa.int64()),
                "sc": pa.array(own * nbr, type=pa.int64()),
                "sw2": pa.array(w * own * own, type=pa.int64()),
            }
        )

    agg = merged.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum("occ", alias_name="n_occupied"),
        Sum("s1", alias_name="s1"),
        Sum("s2", alias_name="s2"),
        Sum("sc", alias_name="s_cross"),
        Sum("sw2", alias_name="s_w2"),
    )
    s1, s2 = float(agg["s1"]), float(agg["s2"])
    sc, sw2 = float(agg["s_cross"]), float(agg["s_w2"])
    mean = s1 / float(GI_NCELLS)
    num = 2.0 * (sw2 - sc)
    den = s2 - float(GI_NCELLS) * mean * mean
    from ..stages.common import duckdb_round as _dr

    c_val = float(
        _dr(np.array([(float(GI_NCELLS - 1) / float(2 * MORAN_W)) * num / den]), 6)[0]
    )
    return rd.from_arrow(
        pa.table(
            {
                "n_occupied": pa.array([int(agg["n_occupied"])], type=pa.int64()),
                "s2": pa.array([int(agg["s2"])], type=pa.int64()),
                "s_cross": pa.array([int(agg["s_cross"])], type=pa.int64()),
                "s_w2": pa.array([int(agg["s_w2"])], type=pa.int64()),
                "geary_c": pa.array([c_val], type=pa.float64()),
            }
        )
    )


RADIATION_TOP_K = 10  # strongest origin cells evaluated


def radiation_model(sf_dir: str, eps: float = GI_EPS, k: int = RADIATION_TOP_K) -> rd.Dataset:
    """Radiation model of spatial interaction (Simini et al. 2012):
    parameter-free expected flux between lattice cells,
    T_ij = T_i · m_i·m_j / ((m_i+s_ij)·(m_i+m_j+s_ij)), where s_ij is
    the total mass STRICTLY closer to i than j (excluding both
    endpoints) — the zero-calibration alternative to the fitted
    gravity kernel (od_gravity / huff_model), evaluated from the
    ``k`` strongest origin cells to every other occupied cell.

    Exactness: cell masses and the intervening-opportunity sums s_ij
    are int64 over INTEGER squared lattice distances (strict <, so
    ties on a ring count as NOT intervening — mirrored); the flux is
    one mirrored float expression with T_i = m_i.

    Scale shape: the occupied-cell table is lattice-bounded; origins
    broadcast against it in one map (k·cells pair rows, never events).
    Output: (ocx, ocy, dcx, dcy, m_o, m_d, s_ij, flux) rounded 6.
    """
    from ..stages.common import duckdb_round as _dr

    counts = _cell_counts(sf_dir, eps).materialize()
    tbl = counts.to_pandas()  # lattice-bounded
    cx = tbl["cx"].to_numpy().astype(np.int64)
    cy = tbl["cy"].to_numpy().astype(np.int64)
    m = tbl["n"].to_numpy().astype(np.int64)
    top = np.lexsort((cy, cx, -m))[:k]

    rows = []
    for oi in top:
        d2 = (cx - cx[oi]) ** 2 + (cy - cy[oi]) ** 2
        order_mass_total = m.sum()
        for dj in range(len(cx)):
            if dj == oi:
                continue
            # s_ij: mass strictly closer to i than j, endpoints excluded
            closer = d2 < d2[dj]
            s = int(m[closer].sum()) - int(m[oi])  # oi has d2=0 (always in)
            mo, md = int(m[oi]), int(m[dj])
            mo_f, md_f, s_f = float(mo), float(md), float(s)
            flux = (mo_f * (mo_f * md_f)) / ((mo_f + s_f) * (mo_f + md_f + s_f))
            rows.append((int(cx[oi]), int(cy[oi]), int(cx[dj]), int(cy[dj]), mo, md, s, flux))
        del order_mass_total
    fluxes = _dr(np.array([r[7] for r in rows], dtype=np.float64), 6)
    return rd.from_arrow(
        pa.table(
            {
                "ocx": pa.array([r[0] for r in rows], type=pa.int64()),
                "ocy": pa.array([r[1] for r in rows], type=pa.int64()),
                "dcx": pa.array([r[2] for r in rows], type=pa.int64()),
                "dcy": pa.array([r[3] for r in rows], type=pa.int64()),
                "m_o": pa.array([r[4] for r in rows], type=pa.int64()),
                "m_d": pa.array([r[5] for r in rows], type=pa.int64()),
                "s_ij": pa.array([r[6] for r in rows], type=pa.int64()),
                "flux": pa.array(fluxes, type=pa.float64()),
            }
        )
    )


def occupancy_closing(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """Morphological CLOSING of the occupancy lattice (dilate by the
    queen structuring element, then erode): fills pinholes and channels
    narrower than one cell — the footprint-regularization step a
    coverage map runs before area accounting (the lattice analogue of
    polygon buffering in/out; Serra 1982).  Reports the occupied /
    dilated / closed cell counts and the holes the closing filled.

    Definitions (mirrored in the SQL oracle): dilated(c) ⟺ some
    in-bounds queen neighbor of c (or c itself) is occupied;
    closed(c) ⟺ EVERY in-bounds queen neighbor of c (and c) is
    dilated; filled = closed − occupied (closing is extensive:
    closed ⊇ occupied, verified by the oracle equality).

    Scale shape: two scatter+groupby rounds over the LATTICE-bounded
    occupancy table (the global_moran exchange, never input rows).
    Output: one row (n_occupied, n_dilated, n_closed, n_filled).
    """
    counts = _cell_counts(sf_dir, eps).materialize()  # <= GI_NCELLS rows

    def scatter_any(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        outs = []
        for dx, dy in _OFFSETS:
            nx, ny = cx + dx, cy + dy
            m = (nx >= 0) & (nx < GI_GX) & (ny >= 0) & (ny < GI_GY)
            outs.append(
                pa.table(
                    {
                        "cx": pa.array(nx[m], type=pa.int64()),
                        "cy": pa.array(ny[m], type=pa.int64()),
                        "one": pa.array(np.ones(int(m.sum()), dtype=np.int64)),
                    }
                )
            )
        return pa.concat_tables(outs)

    dilated = (
        counts.map_batches(scatter_any, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(Sum("one", alias_name="n_hits"))
        .materialize()
    )

    def scatter_dilated(t: pa.Table) -> pa.Table:
        # a dilated cell votes for each in-bounds neighbor; a cell is
        # CLOSED when its vote count equals its in-bounds window size
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        outs = []
        for dx, dy in _OFFSETS:
            nx, ny = cx + dx, cy + dy
            m = (nx >= 0) & (nx < GI_GX) & (ny >= 0) & (ny < GI_GY)
            outs.append(
                pa.table(
                    {
                        "cx": pa.array(nx[m], type=pa.int64()),
                        "cy": pa.array(ny[m], type=pa.int64()),
                        "one": pa.array(np.ones(int(m.sum()), dtype=np.int64)),
                    }
                )
            )
        return pa.concat_tables(outs)

    votes = (
        dilated.map_batches(scatter_dilated, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(Sum("one", alias_name="n_votes"))
    )

    def closed_partial(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        wx = np.minimum(cx + 1, GI_GX - 1) - np.maximum(cx - 1, 0) + 1
        wy = np.minimum(cy + 1, GI_GY - 1) - np.maximum(cy - 1, 0) + 1
        closed = (t["n_votes"].to_numpy() == wx * wy).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(np.zeros(len(cx), dtype=np.int64)),
                "n_closed": pa.array(closed, type=pa.int64()),
            }
        )

    n_closed = int(
        votes.map_batches(closed_partial, batch_format="pyarrow").sum("n_closed")
    )
    n_occupied = counts.count()
    n_dilated = dilated.count()
    from ..stages.common import duckdb_round as _dr  # noqa: F401 — counts are exact ints

    return rd.from_arrow(
        pa.table(
            {
                "n_occupied": pa.array([n_occupied], type=pa.int64()),
                "n_dilated": pa.array([n_dilated], type=pa.int64()),
                "n_closed": pa.array([n_closed], type=pa.int64()),
                "n_filled": pa.array([n_closed - n_occupied], type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# cell_adjacency_triangles (graph analytics on the occupancy lattice)
# ---------------------------------------------------------------------------


def cell_adjacency_triangles(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """Triangle census of the occupancy graph: occupied lattice cells
    are vertices, 8-neighbor (queen) adjacency between occupied cells
    is an edge, and triangles are the 3-cliques — the clustering
    primitive (triangle count / transitivity) over the spatial support
    of the data, answering "does occupancy clump into locally dense
    blobs or stretch into filaments?".

    Distributed shape (the wedge-closing pattern, degree-bounded: every
    vertex has <= 8 neighbors so wedge fan-out is O(1) per vertex):
    - occupied cells from the map-side count combiner (lattice-bounded);
    - scatter each cell to its 8 in-bounds neighbor keys, hash-join
      against occupancy (the same one-exchange groupby that local_moran
      uses) to learn each cell's occupied-neighbor list;
    - per-center regroup emits each triangle once anchored at its
      MINIMUM key (center < n1 < n2, n1-n2 adjacency is pure arithmetic);
    - one integer fold: n_vertices, n_edges, n_triangles (+ closed-form
      transitivity = 3*tri / wedges).

    Output: one row (n_vertices, n_edges, n_wedges, n_triangles,
    transitivity).
    """
    counts = _cell_counts(sf_dir, eps).materialize()

    def scatter(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        outs = []
        # own row marks occupancy; neighbor rows carry the originating key
        outs.append(
            pa.table(
                {
                    "cx": pa.array(cx, type=pa.int64()),
                    "cy": pa.array(cy, type=pa.int64()),
                    "src": pa.array(np.full(len(cx), -1, dtype=np.int64), type=pa.int64()),
                }
            )
        )
        for dx, dy in _OFFSETS:
            if dx == 0 and dy == 0:
                continue
            nx, ny = cx + dx, cy + dy
            m = (nx >= 0) & (nx < GI_GX) & (ny >= 0) & (ny < GI_GY)
            outs.append(
                pa.table(
                    {
                        "cx": pa.array(nx[m], type=pa.int64()),
                        "cy": pa.array(ny[m], type=pa.int64()),
                        "src": pa.array((cx[m] * GI_GY + cy[m]), type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    def close_wedges(g: pa.Table) -> pa.Table:
        src = g["src"].to_numpy()
        if not (src == -1).any():  # cell not occupied: probes with no home
            return pa.table(
                {
                    "v": pa.array([], type=pa.int64()),
                    "e": pa.array([], type=pa.int64()),
                    "wedges": pa.array([], type=pa.int64()),
                    "tri": pa.array([], type=pa.int64()),
                }
            )
        center = int(g["cx"][0].as_py()) * GI_GY + int(g["cy"][0].as_py())
        nbrs = np.sort(src[src >= 0])
        deg = len(nbrs)
        # anchored triangles: center < n1 < n2 and n1 adjacent n2
        tri = 0
        above = nbrs[nbrs > center]
        for i in range(len(above)):
            for j in range(i + 1, len(above)):
                ax, ay = divmod(int(above[i]), GI_GY)
                bx, by = divmod(int(above[j]), GI_GY)
                if abs(ax - bx) <= 1 and abs(ay - by) <= 1:
                    tri += 1
        return pa.table(
            {
                "v": pa.array([1], type=pa.int64()),
                "e": pa.array([int((nbrs > center).sum())], type=pa.int64()),
                "wedges": pa.array([deg * (deg - 1) // 2], type=pa.int64()),
                "tri": pa.array([tri], type=pa.int64()),
            }
        )

    agg = (
        counts.map_batches(scatter, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .map_groups(close_wedges, batch_format="pyarrow")
        .aggregate(
            Sum("v", alias_name="n_vertices"),
            Sum("e", alias_name="n_edges"),
            Sum("wedges", alias_name="n_wedges"),
            Sum("tri", alias_name="n_triangles"),
        )
    )
    wedges = float(agg["n_wedges"])
    tri = float(agg["n_triangles"])
    from ..stages.common import duckdb_round as _dr

    trans = float(_dr(np.array([3.0 * tri / wedges if wedges > 0 else 0.0]), 6)[0])
    return rd.from_arrow(
        pa.table(
            {
                "n_vertices": pa.array([int(agg["n_vertices"])], type=pa.int64()),
                "n_edges": pa.array([int(agg["n_edges"])], type=pa.int64()),
                "n_wedges": pa.array([int(agg["n_wedges"])], type=pa.int64()),
                "n_triangles": pa.array([int(agg["n_triangles"])], type=pa.int64()),
                "transitivity": pa.array([trans], type=pa.float64()),
            }
        )
    )


def quadrat_chi2(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """Quadrat-count test of complete spatial randomness: the chi²
    statistic and variance-to-mean ratio (index of dispersion) of the
    per-lattice-cell event counts against the uniform expectation — the
    third classic point-pattern diagnostic beside Moran's I (global
    correlation) and Ripley's K (multi-scale clustering).  VMR > 1 =
    clustered, < 1 = dispersed.

    With integer tot = Σn and ssq = Σn² over occupied cells (empty
    cells contribute via the closed-form N):

        mean = tot / N
        chi2 = (ssq - tot·mean) / mean          (= Σ(n_i - mean)²/mean)
        vmr  = (ssq / N - mean²) / mean

    Exchange volume: the cell-count combiner then ONE single-row fold —
    two integers move, the two statistics are mirrored float
    expressions.  Output: one row (n_quadrats, n_events, ssq, chi2, vmr).
    """
    from ..stages.common import duckdb_round as _dr

    counts = _cell_counts(sf_dir, eps)

    def moments(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy()
        return pa.table(
            {
                "tot": pa.array([int(n.sum())], type=pa.int64()),
                "ssq": pa.array([int((n * n).sum())], type=pa.int64()),
            }
        )

    agg = counts.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("tot", alias_name="tot"), Sum("ssq", alias_name="ssq")
    )
    tot, ssq = float(agg["tot"]), float(agg["ssq"])
    mean = tot / float(GI_NCELLS)
    chi2 = float(_dr(np.array([(ssq - tot * mean) / mean]), 6)[0])
    vmr = float(_dr(np.array([(ssq / float(GI_NCELLS) - mean * mean) / mean]), 6)[0])
    return rd.from_arrow(
        pa.table(
            {
                "n_quadrats": pa.array([GI_NCELLS], type=pa.int64()),
                "n_events": pa.array([int(agg["tot"])], type=pa.int64()),
                "ssq": pa.array([int(agg["ssq"])], type=pa.int64()),
                "chi2": pa.array([chi2], type=pa.float64()),
                "vmr": pa.array([vmr], type=pa.float64()),
            }
        )
    )


def occupancy_kcore(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """K-CORE decomposition of the occupancy graph (occupied lattice
    cells, queen adjacency): each vertex's coreness = the largest k
    such that it survives iterative removal of degree<k vertices — the
    robust-density summary that separates genuinely dense occupancy
    blobs from high-degree-by-accident cells (completes the graph
    family: components, triangles, PageRank, SSSP, now cores).

    Scale shape: the neighbor lists come from the SAME one-exchange
    occupancy scatter as the triangle census; the peel itself runs on
    the LATTICE-BOUNDED aggregate (<= 300 vertices at this pitch; at
    finer pitches the standard distributed peel — iterate remove-below-k
    with a degree reduce per round — swaps in, same result).

    Output: (cx, cy, degree, coreness).
    """
    counts = _cell_counts(sf_dir, eps).materialize()

    def scatter(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        outs = [
            pa.table(
                {
                    "cx": pa.array(cx, type=pa.int64()),
                    "cy": pa.array(cy, type=pa.int64()),
                    "src": pa.array(np.full(len(cx), -1, dtype=np.int64), type=pa.int64()),
                }
            )
        ]
        for dx, dy in _OFFSETS:
            if dx == 0 and dy == 0:
                continue
            nx, ny = cx + dx, cy + dy
            m = (nx >= 0) & (nx < GI_GX) & (ny >= 0) & (ny < GI_GY)
            outs.append(
                pa.table(
                    {
                        "cx": pa.array(nx[m], type=pa.int64()),
                        "cy": pa.array(ny[m], type=pa.int64()),
                        "src": pa.array(cx[m] * GI_GY + cy[m], type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    def nbr_rows(g: pa.Table) -> pa.Table:
        src = g["src"].to_numpy()
        if not (src == -1).any():
            return pa.table({"k": pa.array([], type=pa.int64()), "nbr": pa.array([], type=pa.int64())})
        k = int(g["cx"][0].as_py()) * GI_GY + int(g["cy"][0].as_py())
        nbrs = np.sort(src[src >= 0]).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(np.full(len(nbrs) + 1, k, dtype=np.int64), type=pa.int64()),
                "nbr": pa.array(np.concatenate([[-1], nbrs]), type=pa.int64()),
            }
        )

    adj = (
        counts.map_batches(scatter, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .map_groups(nbr_rows, batch_format="pyarrow")
        .to_pandas()  # lattice-bounded
    )
    nbrs: dict[int, set[int]] = {}
    for k, nb in zip(adj["k"].astype(int), adj["nbr"].astype(int)):
        nbrs.setdefault(k, set())
        if nb >= 0:
            nbrs[k].add(nb)
    deg0 = {k: len(v) for k, v in nbrs.items()}
    # Matula-Beck peel: repeatedly remove the minimum-degree vertex
    core: dict[int, int] = {}
    deg = dict(deg0)
    alive = set(nbrs)
    kcur = 0
    while alive:
        v = min(alive, key=lambda u: (deg[u], u))
        kcur = max(kcur, deg[v])
        core[v] = kcur
        alive.discard(v)
        for u in nbrs[v]:
            if u in alive:
                deg[u] -= 1
    keys = sorted(nbrs)
    return rd.from_arrow(
        pa.table(
            {
                "cx": pa.array([k // GI_GY for k in keys], type=pa.int64()),
                "cy": pa.array([k % GI_GY for k in keys], type=pa.int64()),
                "degree": pa.array([deg0[k] for k in keys], type=pa.int64()),
                "coreness": pa.array([core[k] for k in keys], type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# theil_sen_cell_trend (robust per-cell trend: median of pairwise slopes)
# ---------------------------------------------------------------------------


def theil_sen_cell_trend(sf_dir: str, eps: float = GI_EPS, min_days: int = TREND_MIN_DAYS) -> rd.Dataset:
    """Per-cell Theil-Sen trend: the MEDIAN of all pairwise slopes
    (y_j - y_i)/(day_j - day_i) of daily event counts — the robust
    companion to cell_trend's least-squares slope (one anomalous burst
    day drags OLS but not the pairwise median; comparing the two
    columns is the screen for "trend or just one weird day?").

    Exactness: every slope is ONE float division of two int64s —
    identical IEEE doubles in both engines — so the sorted slope order
    and the median (mean of the two middles for even counts, DuckDB's
    quantile_cont(0.5) convention = numpy's) agree bit-for-bit before
    the final round.

    Scale shape: the same (cell, day) count shuffle as cell_trend,
    then cell-keyed ``map_groups`` where the O(days^2) pair expansion
    is bounded by the observation window (30 days -> <=435 pairs per
    cell; a decade -> ~6.7M — switch to the O(n log n) Theil-Sen
    estimator per group there, documented not needed at bench scale).
    Output: (cx, cy, n_days, ts_slope).
    """
    import pandas as pd

    daily = (
        _read_events(sf_dir, ["event_id", "ts"])
        .map_batches(_daily_partial_factory(eps), batch_format="pyarrow")
        .groupby(["key", "day"])
        .aggregate(Sum("n", alias_name="y"))
    )

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        d = g["day"].to_numpy().astype(np.int64)
        if len(d) < min_days:
            return pd.DataFrame(columns=["cx", "cy", "n_days", "ts_slope"]).astype(
                {"cx": np.int64, "cy": np.int64, "n_days": np.int64, "ts_slope": np.float64}
            )
        y = g["y"].to_numpy().astype(np.int64)
        o = np.argsort(d)
        d, y = d[o], y[o]
        i, j = np.triu_indices(len(d), k=1)
        slopes = (y[j] - y[i]).astype(np.float64) / (d[j] - d[i]).astype(np.float64)
        key = int(g["key"].iloc[0])
        med = float(duckdb_round(np.array([np.median(slopes)]), 6)[0])
        return pd.DataFrame(
            [(key // GI_GY, key % GI_GY, len(d), med)],
            columns=["cx", "cy", "n_days", "ts_slope"],
        )

    return daily.groupby("key").map_groups(per_cell, batch_format="pandas")


# ---------------------------------------------------------------------------
# eb_shrunk_rates (empirical-Bayes shrunk per-cell purchase rate)
# ---------------------------------------------------------------------------

EB_PRIOR_M = 50.0  # prior strength (pseudo-events pulled toward the global rate)


def eb_shrunk_rates(sf_dir: str, eps: float = GI_EPS, m: float = EB_PRIOR_M) -> rd.Dataset:
    """Per-cell purchase rate with empirical-Bayes shrinkage toward the
    global rate: shrunk = (x + m*p) / (n + m) with p the global
    purchase fraction — the small-sample-honest ranking every hot-cell
    leaderboard needs (a 2/2 cell must not outrank a 980/1000 cell).

    Exactness: x, n are exact int64 counts; p and the shrunk rate are
    each ONE float expression over integers, mirrored verbatim in the
    oracle.  The global totals come from summing the cell aggregate
    (lattice-bounded, 300 rows) — no second pass over the data.

    Scale shape: map-side (cell, n, x) combiner -> one lattice-bounded
    groupby -> driver finalize on the cell table.  Output: (cx, cy, n,
    x, rate, shrunk_rate).
    """
    ds = _read_events(sf_dir, ["event_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * GI_GY + cy
        x = (t["event_type"].to_numpy(zero_copy_only=False) == "purchase").astype(np.int64)
        uniq, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        xs = np.bincount(inv, weights=x).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
                "x": pa.array(xs, type=pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"), Sum("x", alias_name="x"))
        .to_pandas()
    )
    n = cells["n"].to_numpy().astype(np.int64)
    x = cells["x"].to_numpy().astype(np.int64)
    key = cells["key"].to_numpy().astype(np.int64)
    p = float(x.sum()) / float(n.sum())
    rate = x.astype(np.float64) / n.astype(np.float64)
    shrunk = (x.astype(np.float64) + m * p) / (n.astype(np.float64) + m)
    return rd.from_arrow(
        pa.table(
            {
                "cx": pa.array(key // GI_GY, type=pa.int64()),
                "cy": pa.array(key % GI_GY, type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
                "x": pa.array(x, type=pa.int64()),
                "rate": pa.array(duckdb_round(rate, 6), type=pa.float64()),
                "shrunk_rate": pa.array(duckdb_round(shrunk, 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# mann_kendall_cells (nonparametric per-cell monotonic-trend test)
# ---------------------------------------------------------------------------


def mann_kendall_cells(sf_dir: str, eps: float = GI_EPS, min_days: int = TREND_MIN_DAYS) -> rd.Dataset:
    """Per-cell Mann-Kendall S statistic over daily event counts —
    the nonparametric trend TEST beside theil_sen_cell_trend's slope
    ESTIMATE (ESRI's "emerging hot spot" pairing): S = Σ_{i<j}
    sign(y_j − y_i) over day-ordered pairs, with the normal-approx
    z-score under the no-trend null (tie-corrected variance).

    Exactness: S and the tie correction are pure integer arithmetic
    over day pairs; z is ONE mirrored float expression (the ±1
    continuity correction applied by sign of S, z = 0 at S = 0).

    Scale shape: the cell_trend (cell, day) count shuffle, then
    cell-keyed map_groups with an O(days²) sign census bounded by the
    observation window.  Output: (cx, cy, n_days, mk_s, mk_z).
    """
    import pandas as pd

    daily = (
        _read_events(sf_dir, ["event_id", "ts"])
        .map_batches(_daily_partial_factory(eps), batch_format="pyarrow")
        .groupby(["key", "day"])
        .aggregate(Sum("n", alias_name="y"))
    )

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        d = g["day"].to_numpy().astype(np.int64)
        if len(d) < min_days:
            return pd.DataFrame(columns=["cx", "cy", "n_days", "mk_s", "mk_z"]).astype(
                {"cx": np.int64, "cy": np.int64, "n_days": np.int64, "mk_s": np.int64, "mk_z": np.float64}
            )
        y = g["y"].to_numpy().astype(np.int64)
        o = np.argsort(d)
        y = y[o]
        i, j = np.triu_indices(len(y), k=1)
        s = int(np.sign(y[j] - y[i]).sum())
        n = len(y)
        # tie-corrected variance: (n(n-1)(2n+5) - Σ t(t-1)(2t+5)) / 18
        _, tc = np.unique(y, return_counts=True)
        var18 = n * (n - 1) * (2 * n + 5) - int((tc * (tc - 1) * (2 * tc + 5)).sum())
        if var18 > 0 and s != 0:
            z = (s - int(np.sign(s))) / np.sqrt(var18 / 18.0)
        else:
            z = 0.0
        key = int(g["key"].iloc[0])
        zr = float(duckdb_round(np.array([z]), 6)[0])
        return pd.DataFrame(
            [(key // GI_GY, key % GI_GY, n, s, zr)],
            columns=["cx", "cy", "n_days", "mk_s", "mk_z"],
        )

    return daily.groupby("key").map_groups(per_cell, batch_format="pandas")


# ---------------------------------------------------------------------------
# semivariogram (empirical variogram of the per-cell value field)
# ---------------------------------------------------------------------------

VAR_FP = 1e4  # fixed-point pitch for squared-difference terms


def anisotropy_variogram(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """DIRECTIONAL semivariograms of the per-cell mean event value:
    γ(h) computed separately in four integer-exact direction sectors —
    EW (2|dy| ≤ |dx|), NS (2|dx| ≤ |dy|), NE (dx·dy > 0), NW (rest) —
    the anisotropy diagnostic geostatistics runs before fitting ANY
    variogram model (a range that differs by direction means the
    kriging kernel needs an anisotropy ratio; Isaaks & Srivastava ch.
    7).  Sector rules are orientation-invariant pure-integer
    comparisons, mirrored in SQL.

    Exactness & shape: identical to :func:`semivariogram` (int64 cell
    sums → lattice-bounded pair census with (Δz)² pinned once) plus
    the sector key.  Output: (direction, lag, n_pairs, gamma).
    """
    ds = _read_events(sf_dir, ["event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * GI_GY + cy
        cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        uniq, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), type=pa.int64()),
                "sc": pa.array(np.bincount(inv, weights=cents).astype(np.int64), type=pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"), Sum("sc", alias_name="sc"))
        .to_pandas()
    )
    key = cells["key"].to_numpy().astype(np.int64)
    cx, cy = key // GI_GY, key % GI_GY
    z = cells["sc"].to_numpy().astype(np.float64) / cells["n"].to_numpy().astype(np.float64)
    i, j = np.triu_indices(len(key), k=1)
    dx = cx[j] - cx[i]
    dy = cy[j] - cy[i]
    d2 = dx * dx + dy * dy
    lag = np.floor(np.sqrt(d2.astype(np.float64))).astype(np.int64)
    diff = z[i] - z[j]
    fp = np.floor(diff * diff * VAR_FP + 0.5).astype(np.int64)
    adx, ady = np.abs(dx), np.abs(dy)
    sector = np.where(
        2 * ady <= adx, 0, np.where(2 * adx <= ady, 1, np.where(dx * dy > 0, 2, 3))
    ).astype(np.int64)
    names = np.array(["EW", "NS", "NE", "NW"])
    keep = lag >= 1
    lag, fp, sector = lag[keep], fp[keep], sector[keep]
    import pandas as pd

    df = pd.DataFrame({"s": sector, "lag": lag, "fp": fp})
    g = df.groupby(["s", "lag"], sort=True).agg(n_pairs=("fp", "size"), sfp=("fp", "sum"))
    g = g.reset_index()
    gamma = duckdb_round(
        (g["sfp"].to_numpy().astype(np.float64) / VAR_FP)
        / (2.0 * g["n_pairs"].to_numpy().astype(np.float64)),
        6,
    )
    return rd.from_arrow(
        pa.table(
            {
                "direction": pa.array(names[g["s"].to_numpy()], type=pa.string()),
                "lag": pa.array(g["lag"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_pairs": pa.array(g["n_pairs"].to_numpy().astype(np.int64), type=pa.int64()),
                "gamma": pa.array(gamma, type=pa.float64()),
            }
        )
    )


def semivariogram(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """Empirical semivariogram of the per-cell mean event value:
    γ(h) = Σ_{pairs at lag h} (z_i − z_j)² / (2·N_h) over occupied
    lattice cells, lag = floor(euclidean cell distance) — the spatial-
    continuity diagnostic that justifies (or refutes) IDW/kriging
    interpolation (a flat variogram means idw_interpolation is
    smoothing noise).

    Exactness: cell means are the single float sc/n over exact int64
    sums; each pair's (z_i − z_j)² is fixed to int64 ONCE (pitch 1e4),
    so per-lag sums are order-free; sqrt/floor of small integer
    distances is IEEE-identical in both engines.

    Scale shape: one cell-keyed integer reduce (lattice-bounded), then
    a lattice²-pair census on the driver — 300 cells → 44 850 pairs,
    corpus-size-INDEPENDENT (the lattice, not the data, bounds it).
    Output: (lag, n_pairs, gamma).
    """
    ds = _read_events(sf_dir, ["event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * GI_GY + cy
        cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        uniq, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), type=pa.int64()),
                "sc": pa.array(np.bincount(inv, weights=cents).astype(np.int64), type=pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"), Sum("sc", alias_name="sc"))
        .to_pandas()
    )
    key = cells["key"].to_numpy().astype(np.int64)
    cx, cy = key // GI_GY, key % GI_GY
    z = cells["sc"].to_numpy().astype(np.float64) / cells["n"].to_numpy().astype(np.float64)
    i, j = np.triu_indices(len(key), k=1)
    d2 = (cx[i] - cx[j]) ** 2 + (cy[i] - cy[j]) ** 2
    lag = np.floor(np.sqrt(d2.astype(np.float64))).astype(np.int64)
    diff = z[i] - z[j]
    fp = np.floor(diff * diff * VAR_FP + 0.5).astype(np.int64)
    keep = lag >= 1
    lag, fp = lag[keep], fp[keep]
    u = np.unique(lag)
    idx = np.searchsorted(u, lag)
    n_pairs = np.bincount(idx).astype(np.int64)
    sfp = np.zeros(len(u), dtype=np.int64)  # int64 accumulate (float bincount loses exactness past 2^53)
    np.add.at(sfp, idx, fp)
    gamma = duckdb_round((sfp.astype(np.float64) / VAR_FP) / (2.0 * n_pairs.astype(np.float64)), 6)
    return rd.from_arrow(
        pa.table(
            {
                "lag": pa.array(u, type=pa.int64()),
                "n_pairs": pa.array(n_pairs, type=pa.int64()),
                "gamma": pa.array(gamma, type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# kriging_field (ordinary kriging on the cell-mean observations)
# ---------------------------------------------------------------------------

KRIG_REFINE = 2  # prediction lattice pitch = eps / KRIG_REFINE


def kriging_field(sf_dir: str, eps: float = GI_EPS, refine: int = KRIG_REFINE) -> rd.Dataset:
    """Ordinary kriging of the per-cell mean event value onto a
    ``refine``× finer prediction lattice — the geostatistically-honest
    upgrade of idw_interpolation: weights come from the FITTED
    variogram (exponential model least-squared onto the empirical
    semivariogram), so the field honors the data's actual spatial
    continuity instead of an arbitrary 1/d² kernel, and the Lagrange
    row makes weights sum to 1 (unbiased).

    Pipeline: the distributed part is the cell aggregate (exact int64
    n/Σcents per occupied cell — identical to semivariogram's first
    pass); everything after runs on the LATTICE-BOUNDED observation
    set (300 obs → one 301×301 solve against all prediction sites,
    corpus-size-independent).  Deterministic end to end: the model fit
    is a closed-form 2×2 least squares with clamped-positive
    parameters; the solve is one LAPACK call on identically-constructed
    matrices.  Oracle: golden driver recompute with independently
    assembled distance/system matrices.

    Output: (sx, sy, z_hat) — prediction-lattice indices at pitch
    eps/refine, value rounded to 6.
    """
    ds = _read_events(sf_dir, ["event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * GI_GY + cy
        cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        uniq, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), type=pa.int64()),
                "sc": pa.array(np.bincount(inv, weights=cents).astype(np.int64), type=pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"), Sum("sc", alias_name="sc"))
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    key = cells["key"].to_numpy().astype(np.int64)
    ox = (key // GI_GY).astype(np.float64) + 0.5  # obs at cell centers (cell units)
    oy = (key % GI_GY).astype(np.float64) + 0.5
    z = cells["sc"].to_numpy().astype(np.float64) / cells["n"].to_numpy().astype(np.float64)

    gamma_fn, _ = _fit_exp_variogram(ox, oy, z)
    zhat = _ok_solve(ox, oy, z, gamma_fn, refine)
    sx = np.repeat(np.arange(GI_GX * refine, dtype=np.int64), GI_GY * refine)
    sy = np.tile(np.arange(GI_GY * refine, dtype=np.int64), GI_GX * refine)
    return rd.from_arrow(
        pa.table(
            {
                "sx": pa.array(sx, type=pa.int64()),
                "sy": pa.array(sy, type=pa.int64()),
                "z_hat": pa.array(duckdb_round(zhat, 6), type=pa.float64()),
            }
        )
    )


def _fit_exp_variogram(ox: np.ndarray, oy: np.ndarray, z: np.ndarray):
    """Fit gamma(h) = c0 + c1*(1 - exp(-h/a)) to the empirical
    semivariogram of the observations (integer lag bins, a fixed at
    max_lag/3), closed-form 2x2 least squares, parameters clamped
    positive.  Returns (gamma(h) callable, (c0, c1, a))."""
    i, j = np.triu_indices(len(z), k=1)
    d = np.sqrt((ox[i] - ox[j]) ** 2 + (oy[i] - oy[j]) ** 2)
    lag = np.floor(d).astype(np.int64)
    keep = lag >= 1
    lag = lag[keep]
    # fixed-point pair terms (semivariogram discipline): per-lag sums
    # become exact int64 in ANY enumeration order, so an independently
    # constructed recompute lands on bit-identical fitted parameters
    fp = np.floor((z[i] - z[j])[keep] ** 2 * VAR_FP + 0.5).astype(np.int64)
    u = np.unique(lag)
    idx = np.searchsorted(u, lag)
    sfp = np.zeros(len(u), dtype=np.int64)
    np.add.at(sfp, idx, fp)
    g_emp = (sfp.astype(np.float64) / VAR_FP) / (2.0 * np.bincount(idx).astype(np.float64))
    a = float(u.max()) / 3.0
    x = 1.0 - np.exp(-u.astype(np.float64) / a)
    n = float(len(u))
    sx_, sy_, sxx, sxy = x.sum(), g_emp.sum(), (x * x).sum(), (x * g_emp).sum()
    den = n * sxx - sx_ * sx_
    c1 = (n * sxy - sx_ * sy_) / den
    c0 = (sy_ - c1 * sx_) / n
    c0, c1 = max(c0, 1e-6), max(c1, 1e-6)
    return (lambda h: c0 + c1 * (1.0 - np.exp(-h / a))), (c0, c1, a)


def _ok_solve(ox: np.ndarray, oy: np.ndarray, z: np.ndarray, gamma_fn, refine: int) -> np.ndarray:
    """Ordinary-kriging solve: one (n+1)x(n+1) system against every
    prediction site (Lagrange multiplier row enforces sum(w)=1)."""
    n = len(z)
    do = np.sqrt((ox[:, None] - ox[None, :]) ** 2 + (oy[:, None] - oy[None, :]) ** 2)
    gam = gamma_fn(do)
    np.fill_diagonal(gam, 0.0)
    lhs = np.ones((n + 1, n + 1))
    lhs[:n, :n] = gam
    lhs[n, n] = 0.0
    px = (np.repeat(np.arange(GI_GX * refine), GI_GY * refine) + 0.5) / refine
    py = (np.tile(np.arange(GI_GY * refine), GI_GX * refine) + 0.5) / refine
    dp = np.sqrt((ox[:, None] - px[None, :]) ** 2 + (oy[:, None] - py[None, :]) ** 2)
    rhs = np.ones((n + 1, len(px)))
    rhs[:n, :] = gamma_fn(dp)
    w = np.linalg.solve(lhs, rhs)
    return z @ w[:n, :]


# ---------------------------------------------------------------------------
# knox_statistic (space-time interaction test)
# ---------------------------------------------------------------------------

KNOX_R = 0.05  # spatial closeness radius (planar degrees)
KNOX_TAU_US = 3_600_000_000  # temporal closeness window (1 hour, µs)


def knox_statistic(sf_dir: str, r: float = KNOX_R, tau_us: int = KNOX_TAU_US, num_partitions: int = 8) -> rd.Dataset:
    """Knox space-time interaction: are events that are close in SPACE
    also close in TIME more often than independence predicts?  The
    epidemiology/crime-analysis contagion screen: X = pairs close in
    both, E[X] = N_s·N_t/N_p under independence, ratio > 1 ⇒
    spatio-temporal clustering (outbreaks, aftershock-style cascades).

    All three pair counts are EXACT integers from bounded-candidate
    joins — never O(N²):
    - N_s and X ride ONE ripley_k-style bucket join at pitch r (the
      half-neighborhood probe expansion yields each unordered pair
      exactly once), with the |Δt| ≤ τ mask folded into the same scan;
    - N_t rides the 1-D analogue: bin = t // τ, probe expands to
      {bin, bin+1}, so every pair within τ meets in exactly one task.
    The final row is driver arithmetic over four ints; expected and
    ratio are ONE mirrored float expression each.

    Output: (n_pairs, n_space, n_time, n_spacetime, expected, knox_ratio).
    """
    import functools as _ft

    ds = _read_events(sf_dir, ["event_id", "ts"])

    def keyed(t: pa.Table, side: str) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / r).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / r).astype(np.int64)
        return pa.table(
            {
                f"id_{side}": t["event_id"],
                f"lon_{side}": pa.array(lon, type=pa.float64()),
                f"lat_{side}": pa.array(lat, type=pa.float64()),
                f"tus_{side}": pa.array(t["ts"].cast(pa.int64()).to_numpy(), type=pa.int64()),
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
            }
        )

    def own_key(t: pa.Table) -> pa.Table:
        ck = (t["cx"].to_numpy() + 1) * (1 << 21) + (t["cy"].to_numpy() + 1)
        return t.drop_columns(["cx", "cy"]).append_column("ck", pa.array(ck, type=pa.int64()))

    def probe_expand(t: pa.Table) -> pa.Table:
        cx, cy = t["cx"].to_numpy(), t["cy"].to_numpy()
        t = t.drop_columns(["cx", "cy"])
        out = []
        for dx, dy in ((0, 0),) + _HALF_2D:
            ck = (cx + dx + 1) * (1 << 21) + (cy + dy + 1)
            own = np.full(len(ck), 1 if (dx, dy) == (0, 0) else 0, dtype=np.int8)
            out.append(
                t.append_column("ck", pa.array(ck, type=pa.int64())).append_column(
                    "own", pa.array(own, type=pa.int8())
                )
            )
        return pa.concat_tables(out)

    build = ds.map_batches(_ft.partial(keyed, side="b"), batch_format="pyarrow").map_batches(
        own_key, batch_format="pyarrow"
    )
    probe = ds.map_batches(_ft.partial(keyed, side="a"), batch_format="pyarrow").map_batches(
        probe_expand, batch_format="pyarrow"
    )
    cand = safe_join(probe, build, join_type="inner", num_partitions=num_partitions, on=("ck",))

    def count_space(t: pa.Table) -> pa.Table:
        ia = np.asarray(t["id_a"].to_numpy(), np.int64)
        ib = np.asarray(t["id_b"].to_numpy(), np.int64)
        own = t["own"].to_numpy()
        dlon = t["lon_b"].to_numpy() - t["lon_a"].to_numpy()
        dlat = t["lat_b"].to_numpy() - t["lat_a"].to_numpy()
        d2 = dlon * dlon + dlat * dlat
        base = ((own == 0) | (ia < ib)) & (d2 <= r * r)
        dt = np.abs(t["tus_b"].to_numpy() - t["tus_a"].to_numpy())
        return pa.table(
            {
                "n_space": pa.array([np.int64(base.sum())], type=pa.int64()),
                "n_st": pa.array([np.int64((base & (dt <= tau_us)).sum())], type=pa.int64()),
            }
        )

    sp = cand.map_batches(count_space, batch_format="pyarrow").aggregate(
        Sum("n_space", alias_name="n_space"), Sum("n_st", alias_name="n_st")
    )

    # 1-D temporal pair count: bin width = tau, probe expands {bin, bin+1}
    def tkey(t: pa.Table, side: str) -> pa.Table:
        tus = t["ts"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                f"id_{side}": t["event_id"],
                f"tus_{side}": pa.array(tus, type=pa.int64()),
                "tb": pa.array(tus // tau_us, type=pa.int64()),
            }
        )

    def t_probe(t: pa.Table) -> pa.Table:
        tb = t["tb"].to_numpy()
        t = t.drop_columns(["tb"])
        outs = []
        for off, own_flag in ((0, 1), (1, 0)):
            outs.append(
                t.append_column("tb", pa.array(tb + off, type=pa.int64())).append_column(
                    "own", pa.array(np.full(len(tb), own_flag, dtype=np.int8))
                )
            )
        return pa.concat_tables(outs)

    tb_build = ds.map_batches(_ft.partial(tkey, side="b"), batch_format="pyarrow")
    tb_probe = ds.map_batches(_ft.partial(tkey, side="a"), batch_format="pyarrow").map_batches(
        t_probe, batch_format="pyarrow"
    )
    tcand = safe_join(tb_probe, tb_build, join_type="inner", num_partitions=num_partitions, on=("tb",))

    def count_time(t: pa.Table) -> pa.Table:
        ia = np.asarray(t["id_a"].to_numpy(), np.int64)
        ib = np.asarray(t["id_b"].to_numpy(), np.int64)
        own = t["own"].to_numpy()
        dt = np.abs(t["tus_b"].to_numpy() - t["tus_a"].to_numpy())
        # own-bin pairs arrive both orders (+ self): ia < ib dedups;
        # adjacent-bin pairs arrive exactly once via the +1 offset
        base = ((own == 1) & (ia < ib)) | (own == 0)
        n = int((base & (dt <= tau_us)).sum())
        return pa.table({"n_time": pa.array([np.int64(n)], type=pa.int64())})

    tm = tcand.map_batches(count_time, batch_format="pyarrow").aggregate(Sum("n_time", alias_name="n_time"))

    n_events = _read_events(sf_dir, ["event_id"]).count()
    n_pairs = n_events * (n_events - 1) // 2
    n_space, n_st = int(sp["n_space"]), int(sp["n_st"])
    n_time = int(tm["n_time"])
    from ..stages.common import duckdb_round

    expected = float(n_space) * float(n_time) / float(n_pairs)
    ratio = float(n_st) / expected if expected > 0 else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "n_pairs": pa.array([n_pairs], type=pa.int64()),
                "n_space": pa.array([n_space], type=pa.int64()),
                "n_time": pa.array([n_time], type=pa.int64()),
                "n_spacetime": pa.array([n_st], type=pa.int64()),
                "expected": pa.array(duckdb_round(np.array([expected]), 6), type=pa.float64()),
                "knox_ratio": pa.array(duckdb_round(np.array([ratio]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# huff_model (gravity catchment probabilities cell -> POI)
# ---------------------------------------------------------------------------

HUFF_VALUE = "cafe"  # POI category the catchment competes over
HUFF_SOFT = 1e-4  # distance softening (coincident-center guard)
HUFF_FP = 1e9  # fixed-point pitch for gravity weights


def huff_model(sf_dir: str, eps: float = GI_EPS, poi_value: str = HUFF_VALUE, soft: float = HUFF_SOFT) -> rd.Dataset:
    """Huff gravity catchment: for every occupied demand cell i and
    every POI j of one category, the visit probability
    P(i→j) = w_ij / Σ_k w_ik with w = A_j / (d²_ij + soft) and a
    deterministic capacity tier A_j = 1 + poi_id % 3 — the retail
    trade-area model (which cafés capture this block's demand?), plus
    the expected visit volume n_i·P(i→j).

    Exactness: each gravity weight is fixed to int64 ONCE (pitch 1e9),
    so per-cell denominators are exact in any order; prob and expected
    are each ONE mirrored float division over exact ints (n_i·w_fp
    stays < 2^63 at bench scale; hi/lo-split beyond, cf.
    lineitem_corr_matrix).

    Scale shape: one cell-keyed count reduce (the demand field), then
    a lattice×category-bounded broadcast expansion on the driver —
    corpus-size-independent.  Output: (cx, cy, poi_id, n_events, prob,
    expected).
    """
    ds = _read_events(sf_dir, ["event_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * GI_GY + cy
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    key = cells["key"].to_numpy().astype(np.int64)
    cx, cy = key // GI_GY, key % GI_GY
    n = cells["n"].to_numpy().astype(np.int64)
    clon = fixtures.LON_MIN + (cx.astype(np.float64) + 0.5) * eps
    clat = fixtures.LAT_MIN + (cy.astype(np.float64) + 0.5) * eps

    pois = fixtures.make_pois()
    pm = pois.filter(pa.compute.equal(pois["value"], poi_value))
    pid = pm["poi_id"].to_numpy().astype(np.int64)
    plon, plat = pm["lon"].to_numpy(), pm["lat"].to_numpy()
    attr = (1 + pid % 3).astype(np.float64)

    d2 = (clon[:, None] - plon[None, :]) ** 2 + (clat[:, None] - plat[None, :]) ** 2
    wfp = np.floor(attr[None, :] / (d2 + soft) * HUFF_FP + 0.5).astype(np.int64)
    sw = wfp.sum(axis=1)
    prob = wfp.astype(np.float64) / sw[:, None].astype(np.float64)
    expected = (n[:, None] * wfp).astype(np.float64) / sw[:, None].astype(np.float64)
    nc, nj = len(key), len(pid)
    return rd.from_arrow(
        pa.table(
            {
                "cx": pa.array(np.repeat(cx, nj), type=pa.int64()),
                "cy": pa.array(np.repeat(cy, nj), type=pa.int64()),
                "poi_id": pa.array(np.tile(pid, nc), type=pa.int64()),
                "n_events": pa.array(np.repeat(n, nj), type=pa.int64()),
                "prob": pa.array(duckdb_round(prob.ravel(), 6), type=pa.float64()),
                "expected": pa.array(duckdb_round(expected.ravel(), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# poi_accessibility (two-step floating catchment accessibility, 2SFCA)
# ---------------------------------------------------------------------------

SFCA_D0 = 0.4  # catchment radius (planar degrees)
SFCA_FP = 1e12  # fixed-point pitch for supply ratios


def poi_accessibility(sf_dir: str, eps: float = GI_EPS, d0: float = SFCA_D0, poi_value: str = HUFF_VALUE) -> rd.Dataset:
    """Two-step floating catchment accessibility (2SFCA, Luo & Wang):
    step 1 gives every POI j a supply ratio R_j = capacity_j / Σ
    demand n_i over cells within d0; step 2 scores every cell i as
    A_i = Σ R_j over POIs within d0 — the provider-per-capita
    accessibility surface health-equity and site-planning studies run
    (huff_model's normative cousin: not "where will demand go" but
    "who is underserved").

    Exactness: demand sums are exact int64; each R_j is fixed to int64
    ONCE (pitch 1e12) so the step-2 sums are order-free; capacity is
    the deterministic 1 + poi_id % 3 tier.  In-catchment tests are
    d² ≤ d0² on IEEE-identical doubles.

    Scale shape: one cell-keyed count reduce; both catchment steps run
    on the lattice×category-bounded cross table (corpus-size-
    independent).  Output: (cx, cy, n_events, n_pois_in_reach,
    access_fp, accessibility).
    """
    ds = _read_events(sf_dir, ["event_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * GI_GY + cy
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    key = cells["key"].to_numpy().astype(np.int64)
    cx, cy = key // GI_GY, key % GI_GY
    n = cells["n"].to_numpy().astype(np.int64)
    clon = fixtures.LON_MIN + (cx.astype(np.float64) + 0.5) * eps
    clat = fixtures.LAT_MIN + (cy.astype(np.float64) + 0.5) * eps

    pois = fixtures.make_pois()
    pm = pois.filter(pa.compute.equal(pois["value"], poi_value))
    pid = pm["poi_id"].to_numpy().astype(np.int64)
    plon, plat = pm["lon"].to_numpy(), pm["lat"].to_numpy()
    cap = (1 + pid % 3).astype(np.float64)

    d2 = (clon[:, None] - plon[None, :]) ** 2 + (clat[:, None] - plat[None, :]) ** 2
    reach = d2 <= d0 * d0  # (cells, pois)
    demand = (n[:, None] * reach).sum(axis=0).astype(np.int64)  # per-POI demand
    rj_fp = np.zeros(len(pid), dtype=np.int64)
    served = demand > 0
    rj_fp[served] = np.floor(cap[served] / demand[served].astype(np.float64) * SFCA_FP + 0.5).astype(np.int64)
    access_fp = (reach * rj_fp[None, :]).sum(axis=1).astype(np.int64)
    n_reach = reach.sum(axis=1).astype(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
                "n_events": pa.array(n, type=pa.int64()),
                "n_pois_in_reach": pa.array(n_reach, type=pa.int64()),
                "access_fp": pa.array(access_fp, type=pa.int64()),
                "accessibility": pa.array(
                    duckdb_round(access_fp.astype(np.float64) / SFCA_FP, 6), type=pa.float64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# hot_cell_clusters (lattice percolation: components of hot cells)
# ---------------------------------------------------------------------------

PERC_MIN_EVENTS = 30  # a cell is "hot" at or above this count


def hot_cell_clusters(sf_dir: str, eps: float = GI_EPS, theta: int = PERC_MIN_EVENTS) -> rd.Dataset:
    """Percolation clusters of HOT lattice cells: threshold the
    per-cell count field at θ, connect 4-adjacent hot cells, and label
    connected components — "how do hotspots coalesce into regions?",
    the percolation view that single-cell Gi* scores can't give (one
    giant spanning cluster vs many islands is THE phase signature).

    Engine shape: one cell-keyed count reduce, a map-side 4-adjacency
    edge build (each undirected edge emitted once via the half
    neighborhood), then cluster.connected_components — the SAME
    distributed min-label machinery the dedup manifest uses, here on a
    lattice graph.  Isolated hot cells are their own singleton cluster.
    Output: (cx, cy, n_events, cluster_id, cluster_size) with
    cluster_id = min cell key in the component.
    """
    from . import cluster as cl

    ds = _read_events(sf_dir, ["event_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * GI_GY + cy
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: occupied-cell lattice partials
    )
    hot = cells[cells["n"] >= theta].reset_index(drop=True)
    key = hot["key"].to_numpy().astype(np.int64)
    n = hot["n"].to_numpy().astype(np.int64)
    hotset = set(int(k) for k in key)
    # half-neighborhood edges: (cx+1, cy) and (cx, cy+1) — each
    # undirected 4-adjacency emitted exactly once
    ea, eb = [], []
    for k in key:
        cx, cy = int(k) // GI_GY, int(k) % GI_GY
        for nk in (k + GI_GY, k + 1) if cy + 1 < GI_GY else (k + GI_GY,):
            if int(nk) in hotset:
                ea.append(int(k))
                eb.append(int(nk))
    if ea:
        pairs = rd.from_arrow(
            pa.table({"doc_a": pa.array(ea, type=pa.int64()), "doc_b": pa.array(eb, type=pa.int64())})
        )
        labels = cl.connected_components(pairs).to_pandas()  # bounded: pair-graph node labels (near-dup candidates only)
        lab = dict(zip(labels["node"].astype(np.int64), labels["label"].astype(np.int64)))
    else:
        lab = {}
    cid = np.array([lab.get(int(k), int(k)) for k in key], dtype=np.int64)
    import pandas as pd

    sizes = pd.Series(cid).value_counts()
    return rd.from_arrow(
        pa.table(
            {
                "cx": pa.array(key // GI_GY, type=pa.int64()),
                "cy": pa.array(key % GI_GY, type=pa.int64()),
                "n_events": pa.array(n, type=pa.int64()),
                "cluster_id": pa.array(cid, type=pa.int64()),
                "cluster_size": pa.array(sizes[cid].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# cell_mad_outliers (robust per-cell anomalous-day detection)
# ---------------------------------------------------------------------------

MAD_K = 3.0  # flag days beyond K robust deviations


def cell_mad_outliers(sf_dir: str, eps: float = GI_EPS, k: float = MAD_K) -> rd.Dataset:
    """Robust anomalous-day screen: per cell, flag days whose event
    count deviates from the cell's MEDIAN by more than K× the cell's
    MAD — the outlier detector that a burst day cannot poison (unlike
    burst_cells' mean/std z-score, median and MAD barely move when the
    anomaly itself is in the window; running both and diffing is the
    classic masking check).

    Determinism: median/MAD are DuckDB quantile_cont(0.5) convention
    (average of two middles) over exact int64 counts — numpy's
    np.median matches bit-for-bit; the flag test |y − med| > K·mad is
    one mirrored float comparison.

    Scale shape: the (cell, day) count shuffle, then cell-keyed
    map_groups over day-bounded groups.  Output: (cx, cy, day, y, med,
    mad) for flagged days only.
    """
    import pandas as pd

    daily = (
        _read_events(sf_dir, ["event_id", "ts"])
        .map_batches(_daily_partial_factory(eps), batch_format="pyarrow")
        .groupby(["key", "day"])
        .aggregate(Sum("n", alias_name="y"))
    )

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        y = g["y"].to_numpy().astype(np.float64)
        med = float(np.median(y))
        mad = float(np.median(np.abs(y - med)))
        m = np.abs(y - med) > k * mad
        if not m.any():
            return pd.DataFrame(columns=["cx", "cy", "day", "y", "med", "mad"]).astype(
                {
                    "cx": np.int64,
                    "cy": np.int64,
                    "day": np.int64,
                    "y": np.int64,
                    "med": np.float64,
                    "mad": np.float64,
                }
            )
        key = int(g["key"].iloc[0])
        medr = float(duckdb_round(np.array([med]), 6)[0])
        madr = float(duckdb_round(np.array([mad]), 6)[0])
        return pd.DataFrame(
            {
                "cx": np.full(int(m.sum()), key // GI_GY, dtype=np.int64),
                "cy": np.full(int(m.sum()), key % GI_GY, dtype=np.int64),
                "day": g["day"].to_numpy().astype(np.int64)[m],
                "y": g["y"].to_numpy().astype(np.int64)[m],
                "med": np.full(int(m.sum()), medr),
                "mad": np.full(int(m.sum()), madr),
            }
        )

    return daily.groupby("key").map_groups(per_cell, batch_format="pandas")


# ---------------------------------------------------------------------------
# p_median_greedy (facility location: greedy demand-weighted p-median)
# ---------------------------------------------------------------------------

PMED_P = 3  # number of facilities to site
PMED_FP = 1e9  # fixed-point pitch for distances


def p_median_greedy(sf_dir: str, eps: float = GI_EPS, p: int = PMED_P, poi_value: str = HUFF_VALUE) -> rd.Dataset:
    """Greedy p-median facility location: choose p POI sites (from one
    category's candidates) one at a time, each minimizing the total
    demand-weighted distance Σᵢ nᵢ·min_s d(i, s) to the already-chosen
    set — the classic (1 − 1/e)-approximation every siting study runs
    (where do p new depots/clinics go?), and huff/2SFCA's prescriptive
    sibling.

    Exactness: distances are fixed to int64 ONCE (pitch 1e9), demand
    weights are exact counts, so every candidate's total cost is an
    exact integer — the argmin (ties by poi_id) is unambiguous and the
    greedy trace is bit-reproducible in both engines.

    Scale shape: one cell-keyed count reduce; the greedy runs p rounds
    over the lattice×category-bounded cost table (corpus-size-
    independent).  Output: (step, poi_id, total_cost_fp, total_cost)
    — one row per chosen site, cost = demand-weighted distance after
    adding it.
    """
    ds = _read_events(sf_dir, ["event_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * GI_GY + cy
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    key = cells["key"].to_numpy().astype(np.int64)
    n = cells["n"].to_numpy().astype(np.int64)
    clon = fixtures.LON_MIN + ((key // GI_GY).astype(np.float64) + 0.5) * eps
    clat = fixtures.LAT_MIN + ((key % GI_GY).astype(np.float64) + 0.5) * eps

    pois = fixtures.make_pois()
    pm = pois.filter(pa.compute.equal(pois["value"], poi_value))
    pid = pm["poi_id"].to_numpy().astype(np.int64)
    plon, plat = pm["lon"].to_numpy(), pm["lat"].to_numpy()

    d = np.sqrt((clon[:, None] - plon[None, :]) ** 2 + (clat[:, None] - plat[None, :]) ** 2)
    dfp = np.floor(d * PMED_FP + 0.5).astype(np.int64)  # (cells, pois)

    chosen: list[int] = []
    # "infinity" sentinel just above the largest distance: keeps every
    # n*min(best, dfp) product far inside int64 (no overflow at step 1)
    best = np.full(len(key), int(dfp.max()) + 1, dtype=np.int64)
    steps, ids_out, costs = [], [], []
    from ..stages.common import duckdb_round

    for step in range(1, p + 1):
        # candidate j cost = sum_i n_i * min(best_i, dfp[i, j])
        cand_cost = (n[:, None] * np.minimum(best[:, None], dfp)).sum(axis=0)
        for c in chosen:
            cand_cost[int(np.where(pid == c)[0][0])] = np.iinfo(np.int64).max
        order = np.lexsort((pid, cand_cost))
        j = order[0]
        chosen.append(int(pid[j]))
        best = np.minimum(best, dfp[:, j])
        steps.append(step)
        ids_out.append(int(pid[j]))
        costs.append(int(cand_cost[j]))
    return rd.from_arrow(
        pa.table(
            {
                "step": pa.array(steps, type=pa.int64()),
                "poi_id": pa.array(ids_out, type=pa.int64()),
                "total_cost_fp": pa.array(costs, type=pa.int64()),
                "total_cost": pa.array(
                    duckdb_round(np.array(costs, dtype=np.float64) / PMED_FP, 6), type=pa.float64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# fractal_dimension (box-counting dimension of the point pattern)
# ---------------------------------------------------------------------------

FRACTAL_SCALES = (0.8, 0.4, 0.2, 0.1, 0.05)
FRACTAL_FP = 1e12  # fixed-point pitch for the log-log OLS terms


def lacunarity(sf_dir: str, scales: tuple[float, ...] = FRACTAL_SCALES) -> rd.Dataset:
    """Box-counting lacunarity of the event pattern: Λ(ε) = N·ΣM² /
    (ΣM)² over the occupied boxes at each ladder scale — the
    "gappiness" companion of fractal_dimension (two patterns can share
    D yet differ in Λ: translucent vs clumped texture; Allain & Cloitre
    1991, fixed-grid box variant over occupied boxes).

    Exact core: per-scale box masses M are int64 (the per-batch (si,
    key, n) combiner → ONE (scale, key) groupby, ladder×lattice
    bounded); N, ΣM, ΣM² fold per scale; Λ is one mirrored float
    expression.  Output: (eps, n_boxes, sum_mass, sum_mass_sq,
    lacunarity) per ladder rung.
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id"])
    eps_arr = np.array(scales, dtype=np.float64)

    def keys(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        outs = []
        for si, e in enumerate(eps_arr):
            gx = np.floor((lon - fixtures.LON_MIN) / e).astype(np.int64)
            gy = np.floor((lat - fixtures.LAT_MIN) / e).astype(np.int64)
            k, c = np.unique(gx * np.int64(1 << 20) + gy, return_counts=True)
            outs.append(
                pa.table(
                    {
                        "si": pa.array(np.full(len(k), si, dtype=np.int64)),
                        "key": pa.array(k, type=pa.int64()),
                        "n": pa.array(c.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(outs)

    per_box = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["si", "key"])
        .aggregate(Sum("n", alias_name="m"))
    )

    def moments(t: pa.Table) -> pa.Table:
        m = t["m"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "si": t["si"],
                "one": pa.array(np.ones(len(m), dtype=np.int64)),
                "m": pa.array(m),
                "m2": pa.array(m * m),
            }
        )

    agg = (
        per_box.map_batches(moments, batch_format="pyarrow")
        .groupby("si")
        .aggregate(
            Sum("one", alias_name="n_boxes"),
            Sum("m", alias_name="sum_mass"),
            Sum("m2", alias_name="sum_mass_sq"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        si = t["si"].to_numpy()
        nb = t["n_boxes"].to_numpy().astype(np.float64)
        s1 = t["sum_mass"].to_numpy().astype(np.float64)
        s2 = t["sum_mass_sq"].to_numpy().astype(np.float64)
        lam = duckdb_round(nb * s2 / (s1 * s1), 6)
        return pa.table(
            {
                "eps": pa.array(eps_arr[si], type=pa.float64()),
                "n_boxes": t["n_boxes"].cast(pa.int64()),
                "sum_mass": t["sum_mass"].cast(pa.int64()),
                "sum_mass_sq": t["sum_mass_sq"].cast(pa.int64()),
                "lacunarity": pa.array(lam, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("eps")


def fractal_dimension(sf_dir: str, scales: tuple[float, ...] = FRACTAL_SCALES) -> rd.Dataset:
    """Box-counting (Minkowski) dimension of the event point pattern:
    count occupied grid cells N(ε) at a ladder of box sizes and fit
    ln N(ε) ~ D·ln(1/ε) — THE scale-invariance summary of a spatial
    distribution (D→2 space-filling, D→1 curve-like/network-bound,
    D→0 a few isolated clumps); urban-morphology and settlement
    studies report exactly this slope.

    Scale shape: ONE pass emits (scale_idx, cell_key) pairs for all
    ladder rungs (per-batch unique first), a (scale, key)-keyed
    distinct reduce, then a 5-row count per scale — the OLS runs on
    the ladder-bounded aggregate with each log term fixed to int64
    ONCE (gravity_decay_fit discipline: order-free, bit-mirrored).
    Output: (eps, n_cells, fractal_d) — fractal_d repeated per row.
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id"])
    eps_arr = np.array(scales, dtype=np.float64)

    def keys(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        outs = []
        for si, e in enumerate(eps_arr):
            gx = np.floor((lon - fixtures.LON_MIN) / e).astype(np.int64)
            gy = np.floor((lat - fixtures.LAT_MIN) / e).astype(np.int64)
            k = np.unique(gx * np.int64(1 << 20) + gy)
            outs.append(
                pa.table(
                    {
                        "si": pa.array(np.full(len(k), si, dtype=np.int64)),
                        "key": pa.array(k, type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    counts = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["si", "key"])
        .aggregate(Count(alias_name="c"))
        .map_batches(
            lambda t: pa.table(
                {"si": t["si"], "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow",
        )
        .groupby("si")
        .aggregate(Sum("one", alias_name="n_cells"))
        .to_pandas()
        .sort_values("si")
        .reset_index(drop=True)
    )
    n_cells = counts["n_cells"].to_numpy().astype(np.int64)
    x = np.log(1.0 / eps_arr)
    y = np.log(n_cells.astype(np.float64))

    def fp(v: np.ndarray) -> np.ndarray:
        return np.floor(v * FRACTAL_FP + 0.5).astype(np.int64)

    m = float(len(x))
    fsx = int(fp(x).sum()) / FRACTAL_FP
    fsy = int(fp(y).sum()) / FRACTAL_FP
    fsxx = int(fp(x * x).sum()) / FRACTAL_FP
    fsxy = int(fp(x * y).sum()) / FRACTAL_FP
    d = (m * fsxy - fsx * fsy) / (m * fsxx - fsx * fsx)
    dr = float(duckdb_round(np.array([d]), 6)[0])
    return rd.from_arrow(
        pa.table(
            {
                "eps": pa.array(eps_arr, type=pa.float64()),
                "n_cells": pa.array(n_cells, type=pa.int64()),
                "fractal_d": pa.array(np.full(len(eps_arr), dr), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# mann_kendall_fdr (Benjamini-Hochberg correction over the cell tests)
# ---------------------------------------------------------------------------

FDR_Q = 0.10  # accepted false-discovery rate


def mann_kendall_fdr(sf_dir: str, eps: float = GI_EPS, q: float = FDR_Q) -> rd.Dataset:
    """Benjamini-Hochberg FDR control over the per-cell Mann-Kendall
    tests: convert each mk_z to a two-sided p-value and keep the
    largest rank i with p_(i) ≤ q·i/m — the multiple-testing discipline
    an emerging-hot-spot map NEEDS (300 simultaneous trend tests at
    α=0.05 expect 15 false alarms; BH caps the false-discovery RATE).

    The normal CDF tail uses the Abramowitz-Stegun 7.1.26 polynomial
    erfc approximation written as ONE explicit arithmetic expression —
    bit-identical in NumPy and the SQL mirror (DuckDB has no erf).
    Everything after mann_kendall_cells' shuffle is lattice-bounded.

    Output: (cx, cy, mk_z, p_value, p_rank, discovery).
    """
    mk = mann_kendall_cells(sf_dir, eps=eps).to_pandas()
    z = np.abs(mk["mk_z"].to_numpy().astype(np.float64))
    e = z / np.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * e)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    p = poly * np.exp(-e * e)  # two-sided p = erfc(|z|/sqrt(2))
    mk = mk.assign(p_value=p)
    mk = mk.sort_values(["p_value", "cx", "cy"], kind="mergesort").reset_index(drop=True)
    m = len(mk)
    rank = np.arange(1, m + 1, dtype=np.int64)
    flag = mk["p_value"].to_numpy() <= q * rank.astype(np.float64) / float(m)
    cutoff = int(rank[flag].max()) if flag.any() else 0
    disc = rank <= cutoff
    from ..stages.common import duckdb_round

    return rd.from_arrow(
        pa.table(
            {
                "cx": pa.array(mk["cx"].to_numpy().astype(np.int64), type=pa.int64()),
                "cy": pa.array(mk["cy"].to_numpy().astype(np.int64), type=pa.int64()),
                "mk_z": pa.array(mk["mk_z"].to_numpy(), type=pa.float64()),
                "p_value": pa.array(duckdb_round(mk["p_value"].to_numpy(), 6), type=pa.float64()),
                "p_rank": pa.array(rank, type=pa.int64()),
                "discovery": pa.array(disc, type=pa.bool_()),
            }
        )
    )


# ---------------------------------------------------------------------------
# cell_peak_hours (diurnal signature per cell)
# ---------------------------------------------------------------------------


def cell_peak_hours(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """Per-cell diurnal peak: the hour-of-day with the most events,
    its count, and its share of the cell's traffic — the day-rhythm
    fingerprint that separates office cells (peak 14h) from nightlife
    cells (peak 23h); the per-cell drill-down of hour_type_pivot's
    global reshape.

    Exactness: pure integer counts; the argmax ties to the SMALLEST
    hour in both engines; share is one mirrored division.

    Scale shape: map-side (cell, hour) combiner -> ONE
    lattice×24-bounded groupby -> bounded finalize.  Output:
    (cx, cy, peak_hour, n_peak, n_total, peak_share).
    """
    ds = _read_events(sf_dir, ["event_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        hour = (t["ts"].cast(pa.int64()).to_numpy() // 3_600_000_000) % 24
        key = (cx * GI_GY + cy) * np.int64(24) + hour
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    from ..stages.common import duckdb_round

    key = agg["key"].to_numpy().astype(np.int64)
    n = agg["n"].to_numpy().astype(np.int64)
    cell = key // 24
    hour = key % 24
    order = np.lexsort((hour, -n, cell))  # per cell: n desc, hour asc
    cell_s, hour_s, n_s = cell[order], hour[order], n[order]
    first = np.concatenate([[True], cell_s[1:] != cell_s[:-1]])
    tot = np.zeros(int(first.sum()), dtype=np.int64)
    np.add.at(tot, np.cumsum(first) - 1, n_s)
    pc_, ph, pn = cell_s[first], hour_s[first], n_s[first]
    return rd.from_arrow(
        pa.table(
            {
                "cx": pa.array(pc_ // GI_GY, type=pa.int64()),
                "cy": pa.array(pc_ % GI_GY, type=pa.int64()),
                "peak_hour": pa.array(ph, type=pa.int64()),
                "n_peak": pa.array(pn, type=pa.int64()),
                "n_total": pa.array(tot, type=pa.int64()),
                "peak_share": pa.array(
                    duckdb_round(pn.astype(np.float64) / tot.astype(np.float64), 6), type=pa.float64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# join_count_stats (binary join-count spatial autocorrelation)
# ---------------------------------------------------------------------------


def join_count_stats(sf_dir: str, eps: float = GI_EPS) -> rd.Dataset:
    """Binary join-count statistics (Cliff & Ord) on the event lattice:
    classify each OCCUPIED cell Black (count > occupied-cell mean) or
    White, count BB / WW / BW joins over rook-adjacent occupied pairs,
    and compare with the free-sampling expectation — the classic
    yes/no clumping test that complements Moran's interval statistics
    (reference analogue: the A3/A5 per-cell counter layer).

        p_B  = n_black / n_cells
        E[BB] = J·p_B²,  E[WW] = J·p_W²,  E[BW] = 2·J·p_B·p_W

    Exactness: counts, flags and join tallies are exact integers (the
    B threshold compares int64 counts with the single mirrored mean);
    the three expectation expressions are mirrored literally.

    Scale shape: per-batch cell combiner -> ONE lattice-bounded
    groupby -> finalize on the fixed-size lattice table (adjacency by
    key arithmetic, no quadratic join).  Output: one row (n_cells,
    n_black, n_edges, bb, ww, bw, e_bb, e_ww, e_bw).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * GI_GY + cy
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )

    key = np.sort(agg["key"].to_numpy().astype(np.int64))
    n = agg.set_index("key").loc[key, "n"].to_numpy().astype(np.int64)
    nc = len(key)
    mean = float(n.sum()) / float(nc)
    black = n.astype(np.float64) > mean
    cx, cy = key // GI_GY, key % GI_GY
    bb = ww = bw = edges = 0
    # rook adjacency, each undirected pair once (right / up neighbor)
    for dk, ok in ((GI_GY, cx + 1 < GI_GX), (1, cy + 1 < GI_GY)):
        nbr = key + dk
        present = np.isin(nbr, key) & ok
        a = black[present]
        b = black[np.searchsorted(key, nbr[present])]
        edges += int(present.sum())
        bb += int((a & b).sum())
        ww += int((~a & ~b).sum())
        bw += int((a != b).sum())
    nb_black = int(black.sum())
    p_b = nb_black / nc
    p_w = (nc - nb_black) / nc
    e_bb = edges * p_b * p_b
    e_ww = edges * p_w * p_w
    e_bw = 2.0 * edges * p_b * p_w
    return rd.from_arrow(
        pa.table(
            {
                "n_cells": pa.array([nc], type=pa.int64()),
                "n_black": pa.array([nb_black], type=pa.int64()),
                "n_edges": pa.array([edges], type=pa.int64()),
                "bb": pa.array([bb], type=pa.int64()),
                "ww": pa.array([ww], type=pa.int64()),
                "bw": pa.array([bw], type=pa.int64()),
                "e_bb": pa.array(duckdb_round(np.array([e_bb]), 6), type=pa.float64()),
                "e_ww": pa.array(duckdb_round(np.array([e_ww]), 6), type=pa.float64()),
                "e_bw": pa.array(duckdb_round(np.array([e_bw]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# emerging_hotspots (per-day Gi* + Mann-Kendall trend classification)
# ---------------------------------------------------------------------------

EHS_HOT_Z = 1.96  # per-day Gi* hot threshold (95%)
EHS_TREND_Z = 1.645  # Mann-Kendall trend threshold (90%)
EHS_PERSIST = 0.9  # hot-day fraction for "persistent"


def emerging_hotspots(sf_dir: str, eps: float = GI_EPS, min_days: int = TREND_MIN_DAYS) -> rd.Dataset:
    """Emerging-hot-spot analysis (the ESRI space-time pattern tool,
    re-expressed): per-DAY Gi* z-scores over the lattice, then a
    Mann-Kendall trend test on each cell's z time series, classified
    into intensifying / diminishing / persistent / sporadic /
    historical hot — the time-aware upgrade of getis_ord_hotspots
    that distinguishes a growing hotspot from a fading one.

    Determinism: per-day z is the getis_ord expression rounded to 6dp
    on BOTH engines before any comparison, so the hot flags, the MK
    sign census and its tie correction all operate on bit-identical
    doubles; category rules are pure threshold tests on those values.

    Scale shape: (cell, day) count reduce -> per-day global moments
    (days-bounded table to the driver, broadcast back) -> ONE
    9-offset scatter with day carried -> (cell, day)-bounded groupby
    -> cell-keyed map_groups with an O(days²) sign census.  Exchange
    volume is lattice×days-bounded, never input rows.

    Output: (cx, cy, n_days, hot_days, last_z, mk_s, mk_z, category)
    for cells whose window is occupied on ≥ min_days days.
    """
    import pandas as pd

    daily = (
        _read_events(sf_dir, ["event_id", "ts"])
        .map_batches(_daily_partial_factory(eps), batch_format="pyarrow")
        .groupby(["key", "day"])
        .aggregate(Sum("n", alias_name="y"))
        .materialize()  # lattice x days bounded (<= NCELLS*days rows) and read twice below
    )

    # per-day global moments over the lattice (days-bounded)
    def mom_partial(t: pa.Table) -> pa.Table:
        y = t["y"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "day": t["day"],
                "tot": pa.array(y, type=pa.int64()),
                "ssq": pa.array(y * y, type=pa.int64()),
            }
        )

    mom = (
        daily.map_batches(mom_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("tot", alias_name="tot"), Sum("ssq", alias_name="ssq"))
        .to_pandas()
    )
    day_mean = {}
    day_s = {}
    for day, tot, ssq in mom.itertuples(index=False):
        m = float(tot) / float(GI_NCELLS)
        day_mean[int(day)] = m
        day_s[int(day)] = np.sqrt(float(ssq) / float(GI_NCELLS) - m * m)

    def scatter(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        day = t["day"].to_numpy()
        y = t["y"].to_numpy()
        cx, cy = key // GI_GY, key % GI_GY
        outs = []
        for dx, dy in _OFFSETS:
            nx, ny = cx + dx, cy + dy
            m = (nx >= 0) & (nx < GI_GX) & (ny >= 0) & (ny < GI_GY)
            outs.append(
                pa.table(
                    {
                        "key": pa.array(nx[m] * GI_GY + ny[m], type=pa.int64()),
                        "day": pa.array(day[m], type=pa.int64()),
                        "y": pa.array(y[m], type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    nbr = (
        daily.map_batches(scatter, batch_format="pyarrow")
        .groupby(["key", "day"])
        .aggregate(Sum("y", alias_name="nbr_sum"))
    )

    def zscore(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        day = t["day"].to_numpy()
        snb = t["nbr_sum"].to_numpy().astype(np.float64)
        cx, cy = key // GI_GY, key % GI_GY
        wx = np.minimum(cx + 1, GI_GX - 1) - np.maximum(cx - 1, 0) + 1
        wy = np.minimum(cy + 1, GI_GY - 1) - np.maximum(cy - 1, 0) + 1
        wf = (wx * wy).astype(np.float64)
        mean = np.array([day_mean[int(d)] for d in day], dtype=np.float64)
        s = np.array([day_s[int(d)] for d in day], dtype=np.float64)
        num = snb - mean * wf
        den = s * np.sqrt((float(GI_NCELLS) * wf - wf * wf) / float(GI_NCELLS - 1))
        z = duckdb_round(num / den, 6)
        return pa.table(
            {
                "key": pa.array(key, type=pa.int64()),
                "day": pa.array(day, type=pa.int64()),
                "z": pa.array(z, type=pa.float64()),
            }
        )

    zs = nbr.map_batches(zscore, batch_format="pyarrow")

    cols = ["cx", "cy", "n_days", "hot_days", "last_z", "mk_s", "mk_z", "category"]

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        d = g["day"].to_numpy().astype(np.int64)
        if len(d) < min_days:
            return pd.DataFrame(columns=cols).astype(
                {
                    "cx": np.int64, "cy": np.int64, "n_days": np.int64, "hot_days": np.int64,
                    "last_z": np.float64, "mk_s": np.int64, "mk_z": np.float64, "category": object,
                }
            )
        o = np.argsort(d)
        z = g["z"].to_numpy().astype(np.float64)[o]
        n = len(z)
        i, j = np.triu_indices(n, k=1)
        s = int(np.sign(z[j] - z[i]).sum())
        _, tc = np.unique(z, return_counts=True)
        var18 = n * (n - 1) * (2 * n + 5) - int((tc * (tc - 1) * (2 * tc + 5)).sum())
        if var18 > 0 and s != 0:
            mz = (s - int(np.sign(s))) / np.sqrt(var18 / 18.0)
        else:
            mz = 0.0
        mz = float(duckdb_round(np.array([mz]), 6)[0])
        hot = z >= EHS_HOT_Z
        hot_days = int(hot.sum())
        last_z = float(z[-1])
        if hot[-1]:
            if mz > EHS_TREND_Z:
                cat = "intensifying_hot"
            elif mz < -EHS_TREND_Z:
                cat = "diminishing_hot"
            elif hot_days >= EHS_PERSIST * n:
                cat = "persistent_hot"
            else:
                cat = "sporadic_hot"
        elif hot_days > 0:
            cat = "historical_hot"
        else:
            cat = "none"
        key = int(g["key"].iloc[0])
        return pd.DataFrame(
            [(key // GI_GY, key % GI_GY, n, hot_days, last_z, s, mz, cat)], columns=cols
        )

    return zs.groupby("key").map_groups(per_cell, batch_format="pandas")


# ---------------------------------------------------------------------------
# moran_correlogram (distance-banded spatial autocorrelation profile)
# ---------------------------------------------------------------------------

CORR_BANDS = 4  # Chebyshev distance bands 1..4


def _band_w_constant(d: int) -> int:
    """W_d = Σ over ALL lattice cells of the in-bounds ring-|d| size
    (Chebyshev ring: box(d) − box(d−1)) — closed-form over the fixed
    GI_GX×GI_GY lattice, exact int."""
    xs = np.arange(GI_GX)[:, None]
    ys = np.arange(GI_GY)[None, :]

    def box(r: int) -> np.ndarray:
        wx = np.minimum(xs + r, GI_GX - 1) - np.maximum(xs - r, 0) + 1
        wy = np.minimum(ys + r, GI_GY - 1) - np.maximum(ys - r, 0) + 1
        return wx * wy

    return int((box(d) - box(d - 1)).sum())


def moran_correlogram(sf_dir: str, eps: float = GI_EPS, bands: int = CORR_BANDS) -> rd.Dataset:
    """Moran's I per Chebyshev distance band d = 1..bands — the
    spatial-autocorrelation RANGE profile (how far does clustering
    reach before I decays to CSR?), the correlogram every geostatistics
    text pairs with the variogram (anisotropy_variogram is the
    directional sibling; global_moran is band 1's queen special case).

    Same integer discipline as global_moran, per band:

        I_d = (N / W_d) * (Sc_d − 2·mean·Sw_d + mean²·W_d) / (S2 − N·mean²)

    with Sc_d = Σ_ij w_ij x_i x_j over the ring-d pairs and Sw_d the
    count-weighted in-bounds ring sizes — all int64 through the
    aggregate tree; one mirrored float expression per band.

    Scale shape: per-cell counts reuse the map-side combiner; ONE
    scatter fans each occupied cell to its ≤ 8d ring offsets for all
    bands (rows ≤ occupied·Σ8d — lattice-bounded); one (band, cell)
    groupby; the per-band finalize runs on ≤ bands·lattice rows.

    Output: one row per band (band, w_band, s_cross, s_wrow, moran_i).
    """
    counts = _cell_counts(sf_dir, eps).materialize()

    ring_offsets: list[tuple[int, int, int]] = []
    for d in range(1, bands + 1):
        for dx in range(-d, d + 1):
            for dy in range(-d, d + 1):
                if max(abs(dx), abs(dy)) == d:
                    ring_offsets.append((d, dx, dy))

    def scatter(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        n = t["n"].to_numpy().astype(np.int64)
        outs = []
        for d, dx, dy in ring_offsets:
            nx, ny = cx + dx, cy + dy
            m = (nx >= 0) & (nx < GI_GX) & (ny >= 0) & (ny < GI_GY)
            outs.append(
                pa.table(
                    {
                        "band": pa.array(np.full(int(m.sum()), d), type=pa.int64()),
                        "cx": pa.array(nx[m], type=pa.int64()),
                        "cy": pa.array(ny[m], type=pa.int64()),
                        "n_nbr": pa.array(n[m], type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    nbr = (
        counts.map_batches(scatter, batch_format="pyarrow")
        .groupby(["band", "cx", "cy"])
        .aggregate(Sum("n_nbr", alias_name="nbr_sum"))
    )
    own = {(int(r["cx"]), int(r["cy"])): int(r["n"]) for r in counts.take_all()}  # lattice-bounded

    def partials(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy()
        cy = t["cy"].to_numpy()
        band = t["band"].to_numpy()
        nbrs = t["nbr_sum"].to_numpy().astype(np.int64)
        own_n = np.array([own.get((int(a), int(b)), 0) for a, b in zip(cx, cy)], dtype=np.int64)
        # in-bounds ring size at this cell/band (w_i contribution)
        def boxw(r: np.ndarray) -> np.ndarray:
            wx = np.minimum(cx + r, GI_GX - 1) - np.maximum(cx - r, 0) + 1
            wy = np.minimum(cy + r, GI_GY - 1) - np.maximum(cy - r, 0) + 1
            return wx * wy

        w_i = boxw(band) - boxw(band - 1)
        return pa.table(
            {
                "band": pa.array(band, type=pa.int64()),
                "sc": pa.array(own_n * nbrs, type=pa.int64()),
                "sw": pa.array(w_i * own_n, type=pa.int64()),
            }
        )

    agg = (
        nbr.map_batches(partials, batch_format="pyarrow")
        .groupby("band")
        .aggregate(Sum("sc", alias_name="s_cross"), Sum("sw", alias_name="s_wrow"))
        .to_pandas()
        .sort_values("band")
    )
    s1 = sum(own.values())
    s2 = sum(v * v for v in own.values())
    mean = float(s1) / float(GI_NCELLS)
    from ..stages.common import duckdb_round as _dr

    rows = {"band": [], "w_band": [], "s_cross": [], "s_wrow": [], "moran_i": []}
    den = float(s2) - float(GI_NCELLS) * mean * mean
    for r in agg.itertuples():
        wd = _band_w_constant(int(r.band))
        num = float(r.s_cross) - 2.0 * mean * float(r.s_wrow) + mean * mean * float(wd)
        i_val = float(_dr(np.array([(float(GI_NCELLS) / float(wd)) * num / den]), 6)[0])
        rows["band"].append(int(r.band))
        rows["w_band"].append(wd)
        rows["s_cross"].append(int(r.s_cross))
        rows["s_wrow"].append(int(r.s_wrow))
        rows["moran_i"].append(i_val)
    return rd.from_arrow(
        pa.table(
            {
                "band": pa.array(rows["band"], type=pa.int64()),
                "w_band": pa.array(rows["w_band"], type=pa.int64()),
                "s_cross": pa.array(rows["s_cross"], type=pa.int64()),
                "s_wrow": pa.array(rows["s_wrow"], type=pa.int64()),
                "moran_i": pa.array(rows["moran_i"], type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# lof_outliers (Local Outlier Factor — the density-outlier canon)
# ---------------------------------------------------------------------------

LOF_K = 5
LOF_RADIUS = 0.02  # candidate bound: 99% of events have >= k neighbors inside
LRD_FP = np.int64(10**15)


def lof_outliers(sf_dir: str, k: int = LOF_K, radius: float = LOF_RADIUS, num_partitions: int = 8) -> rd.Dataset:
    """Local Outlier Factor (Breunig et al. 2000) over the event
    point cloud — the density-RELATIVE outlier score that a global
    threshold (iqr/mad/hbos) cannot give: a point is anomalous if its
    local density is low COMPARED TO its neighbors', so sparse-region
    points surrounded by equally sparse neighbors score ~1 while a
    point just outside a tight cluster scores >> 1.

    Deterministic variant, pinned for oracle-exactness: the kNN set is
    the exact k smallest (dist_fp, neighbor_id) pairs among candidates
    within ``radius`` (bucket-join contract); points with fewer than k
    in-radius neighbors — or whose neighbors lack full neighborhoods —
    drop out (the "core subgraph" contract, documented; 99% of the
    fixture qualifies).  reach-dist, lrd (fixed-point 1e15) and the
    final LOF ratio are exact integer operations with ONE rounded
    division at the end.

    Scale shape: the nearest_neighbor bucket join (pitch-radius cells,
    3x3 probe) with a per-batch top-k combiner -> per-event top-k
    reduce; then THREE bounded exchanges on (point, neighbor) keys:
    k-distance attach, reach-sum fold, lrd attach + LOF fold — each a
    hash join + keyed Sum over k·N rows, never candidates.

    Output: (event_id, kdist_fp, lrd_fp, lof) — lof rounded 6.
    """
    from .trajectory import FP_SCALE

    ds = _read_events(sf_dir, ["event_id"])

    def keyed(t: pa.Table, side: str) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / radius).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / radius).astype(np.int64)
        return pa.table(
            {
                f"id_{side}": t["event_id"],
                f"lon_{side}": pa.array(lon, type=pa.float64()),
                f"lat_{side}": pa.array(lat, type=pa.float64()),
                "cx": pa.array(cx, type=pa.int64()),
                "cy": pa.array(cy, type=pa.int64()),
            }
        )

    def own_key(t: pa.Table) -> pa.Table:
        ck = (t["cx"].to_numpy() + 1) * (1 << 21) + (t["cy"].to_numpy() + 1)
        return t.drop_columns(["cx", "cy"]).append_column("ck", pa.array(ck, type=pa.int64()))

    def probe_expand(t: pa.Table) -> pa.Table:
        cx, cy = t["cx"].to_numpy(), t["cy"].to_numpy()
        t = t.drop_columns(["cx", "cy"])
        out = []
        for dx, dy in _FULL_2D:
            ck = (cx + dx + 1) * (1 << 21) + (cy + dy + 1)
            out.append(t.append_column("ck", pa.array(ck, type=pa.int64())))
        return pa.concat_tables(out)

    import functools as _ft

    build = ds.map_batches(_ft.partial(keyed, side="b"), batch_format="pyarrow").map_batches(
        own_key, batch_format="pyarrow"
    )
    probe = ds.map_batches(_ft.partial(keyed, side="a"), batch_format="pyarrow").map_batches(
        probe_expand, batch_format="pyarrow"
    )
    cand = safe_join(probe, build, join_type="inner", num_partitions=num_partitions, on=("ck",))
    r2 = radius * radius

    def _topk(ia, ib, dfp):
        order = np.lexsort((ib, dfp, ia))
        ia, ib, dfp = ia[order], ib[order], dfp[order]
        if len(ia) == 0:
            return ia, ib, dfp
        first = np.concatenate([[True], np.diff(ia) != 0])
        gidx = np.cumsum(first) - 1
        starts = np.nonzero(first)[0]
        within = np.arange(len(ia)) - starts[gidx]
        keep = within < k
        return ia[keep], ib[keep], dfp[keep]

    def topk_batch(t: pa.Table) -> pa.Table:
        ia = np.asarray(t["id_a"].to_numpy(), np.int64)
        ib = np.asarray(t["id_b"].to_numpy(), np.int64)
        dlon = t["lon_b"].to_numpy() - t["lon_a"].to_numpy()
        dlat = t["lat_b"].to_numpy() - t["lat_a"].to_numpy()
        d2 = dlon * dlon + dlat * dlat
        m = (ia != ib) & (d2 <= r2)
        ia, ib, d2 = ia[m], ib[m], d2[m]
        dfp = np.floor(np.sqrt(d2) * FP_SCALE + 0.5).astype(np.int64)
        ia, ib, dfp = _topk(ia, ib, dfp)
        return pa.table(
            {
                "p": pa.array(ia, type=pa.int64()),
                "o": pa.array(ib, type=pa.int64()),
                "d": pa.array(dfp, type=pa.int64()),
                "part": pa.array(ia % num_partitions, type=pa.int64()),
            }
        )

    def topk_reduce(g: pa.Table) -> pa.Table:
        ia, ib, dfp = _topk(g["p"].to_numpy(), g["o"].to_numpy(), g["d"].to_numpy())
        return pa.table(
            {
                "p": pa.array(ia, type=pa.int64()),
                "o": pa.array(ib, type=pa.int64()),
                "d": pa.array(dfp, type=pa.int64()),
            }
        )

    knn = (
        cand.map_batches(topk_batch, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topk_reduce, batch_format="pyarrow")
        .repartition(num_partitions)  # densify: sparse groups leave schema-less empty blocks
        .materialize()
    )
    from ray.data.aggregate import Max as AggMax

    kd = (
        knn.groupby("p")
        .aggregate(AggMax("d", alias_name="kdist"), Count(alias_name="nk"))
        .filter(expr=f"nk == {k}")
        .drop_columns(["nk"])
        .repartition(4)  # densify: filter leaves 0-row blocks that poison later joins
        .materialize()
    )
    if kd.count() == 0:
        # radius too small for the point density: no point has k
        # in-radius neighbors — typed empty result (safe_join's
        # ALL-empty guard contract)
        return rd.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "kdist_fp": pa.array([], type=pa.int64()),
                    "lrd_fp": pa.array([], type=pa.int64()),
                    "lof": pa.array([], type=pa.float64()),
                }
            )
        )
    # reach-dist: pair (p,o) with o's kdist
    reach = safe_join(
        knn,
        kd.map_batches(
            lambda t: pa.table({"op": t["p"], "okd": t["kdist"]}), batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("o",),
        right_on=("op",),
    ).map_batches(
        lambda t: pa.table(
            {
                "p": t["p"],
                "o": t["o"],
                "reach": pa.array(
                    np.maximum(t["d"].to_numpy(), t["okd"].to_numpy()), type=pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    lrd = (
        reach.groupby("p")
        .aggregate(Sum("reach", alias_name="sum_reach"), Count(alias_name="nk"))
        .filter(expr=f"nk == {k}")
        .map_batches(
            lambda t: pa.table(
                {
                    "p": t["p"],
                    "lrd_fp": pa.array(
                        (int(k) * LRD_FP) // np.maximum(t["sum_reach"].to_numpy(), 1),
                        type=pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(4)  # densify (same 0-row-block guard)
        .materialize()
    )
    nbr_lrd = safe_join(
        knn,
        lrd.map_batches(lambda t: pa.table({"op": t["p"], "olrd": t["lrd_fp"]}), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("o",),
        right_on=("op",),
    )
    folded = (
        nbr_lrd.groupby("p")
        .aggregate(Sum("olrd", alias_name="sum_olrd"), Count(alias_name="nk"))
        .filter(expr=f"nk == {k}")
    )
    both = safe_join(
        folded,
        lrd.map_batches(lambda t: pa.table({"pp": t["p"], "plrd": t["lrd_fp"]}), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("p",),
        right_on=("pp",),
    )
    out = safe_join(
        both,
        kd.map_batches(lambda t: pa.table({"pk": t["p"], "kdist_fp": t["kdist"]}), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("p",),
        right_on=("pk",),
    )

    def finish(t: pa.Table) -> pa.Table:
        from ..stages.common import duckdb_round

        lof = duckdb_round(
            t["sum_olrd"].to_numpy().astype(np.float64)
            / (float(k) * t["plrd"].to_numpy().astype(np.float64)),
            6,
        )
        return pa.table(
            {
                "event_id": t["p"],
                "kdist_fp": t["kdist_fp"],
                "lrd_fp": t["plrd"],
                "lof": pa.array(lof, type=pa.float64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# scan_statistic (Kulldorff space-time Poisson LLR cylinders)
# ---------------------------------------------------------------------------

SCAN_WINDOWS = (1, 3, 7)  # day-window lengths
SCAN_TOPK = 20


def scan_statistic(sf_dir: str, eps: float = GI_EPS, topk: int = SCAN_TOPK) -> rd.Dataset:
    """Kulldorff's space-time scan statistic (the SaTScan core):
    for every (cell, day-window) cylinder, the Poisson log-likelihood
    ratio of "elevated inside" vs homogeneity,
        LLR = n·ln(n/mu) + (N−n)·ln((N−n)/(N−mu))   (n > mu, else 0)
    with mu the indirect-standardized expectation
    cell_total·window_total/N — the principled cluster-DETECTION
    upgrade of getis_ord (which scores cells, not extents) and knox
    (which tests global interaction, not location).  Monte-Carlo
    p-values are deliberately out of scope (RNG-free repo rule): the
    ranked LLR table IS SaTScan's primary output.

    Scale shape: ONE (cell, day) count shuffle (the space_time_cube
    exchange); the cylinder scan runs on the lattice×days-bounded
    aggregate driver-side — windows are prefix-sum differences, no
    re-scan per window.  Ranking: (rounded LLR desc, cell, window
    start, length) — deterministic under ties.

    Output: (rank, cx, cy, day_start, win_days, n_in, mu, llr).
    """
    from ..stages.common import duckdb_round

    ds = _read_events(sf_dir, ["event_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        day = t["ts"].cast(pa.int64()).to_numpy() // 86_400_000_000
        df = pd.DataFrame({"cx": cx, "cy": cy, "day": day}).groupby(
            ["cx", "cy", "day"], sort=False
        ).size().reset_index(name="n")
        return pa.table(
            {
                "cx": pa.array(df["cx"].to_numpy().astype(np.int64), type=pa.int64()),
                "cy": pa.array(df["cy"].to_numpy().astype(np.int64), type=pa.int64()),
                "day": pa.array(df["day"].to_numpy().astype(np.int64), type=pa.int64()),
                "n": pa.array(df["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    cube = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cx", "cy", "day"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = _scan_cylinders(cube, topk)
    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array(rows["rank"], type=pa.int64()),
                "cx": pa.array(rows["cx"], type=pa.int64()),
                "cy": pa.array(rows["cy"], type=pa.int64()),
                "day_start": pa.array(rows["day_start"], type=pa.int64()),
                "win_days": pa.array(rows["win_days"], type=pa.int64()),
                "n_in": pa.array(rows["n_in"], type=pa.int64()),
                "mu": pa.array(duckdb_round(np.array(rows["mu"]), 6), type=pa.float64()),
                "llr": pa.array(duckdb_round(np.array(rows["llr"]), 6), type=pa.float64()),
            }
        )
    )


def _scan_cylinders(cube: "pd.DataFrame", topk: int) -> dict:
    """Shared cylinder scan over the (cx, cy, day, n) aggregate."""
    N = int(cube["n"].sum())
    day_lo, day_hi = int(cube["day"].min()), int(cube["day"].max())
    n_days = day_hi - day_lo + 1
    day_tot = np.zeros(n_days, dtype=np.int64)
    for d, nn in cube.groupby("day")["n"].sum().items():
        day_tot[int(d) - day_lo] = int(nn)
    day_cum = np.concatenate([[0], np.cumsum(day_tot)])
    cands = []
    for (cx, cy), sub in cube.groupby(["cx", "cy"]):
        cell_tot = int(sub["n"].sum())
        series = np.zeros(n_days, dtype=np.int64)
        series[sub["day"].to_numpy().astype(np.int64) - day_lo] = sub["n"].to_numpy().astype(np.int64)
        ccum = np.concatenate([[0], np.cumsum(series)])
        for w in SCAN_WINDOWS:
            for s in range(0, n_days - w + 1):
                n_in = int(ccum[s + w] - ccum[s])
                if n_in == 0:
                    continue
                win_tot = int(day_cum[s + w] - day_cum[s])
                mu = cell_tot * win_tot / N
                if n_in <= mu or mu <= 0 or n_in >= N:
                    continue
                llr = n_in * np.log(n_in / mu) + (N - n_in) * np.log((N - n_in) / (N - mu))
                cands.append((round(float(llr), 6), int(cx), int(cy), int(s + day_lo), int(w), n_in, mu))
    cands.sort(key=lambda t: (-t[0], t[1], t[2], t[3], t[4]))
    out = {"rank": [], "cx": [], "cy": [], "day_start": [], "win_days": [], "n_in": [], "mu": [], "llr": []}
    for i, (llr, cx, cy, ds_, w, n_in, mu) in enumerate(cands[:topk], 1):
        out["rank"].append(i)
        out["cx"].append(cx)
        out["cy"].append(cy)
        out["day_start"].append(ds_)
        out["win_days"].append(w)
        out["n_in"].append(n_in)
        out["mu"].append(mu)
        out["llr"].append(llr)
    return out
