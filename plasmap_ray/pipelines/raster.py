"""Vector -> raster: render slippy-map tile IMAGES from point data.

The reference's end product is a slippy-map tile layer over OSM-derived
features; this pipeline closes the raster side of the raster↔vector
loop: points are tile-assigned at zoom ``z``, each tile's points are
binned into a ``tile_px`` x ``tile_px`` count grid (sub-pixel position
from the fractional tile coordinate — the same floor arithmetic the
tile assign uses, so binning is engine-exact), the grid is tone-mapped
to uint8 and ENCODED THROUGH THE ENGINE'S OWN IMAGE CODEC (pngz =
zlib-compressed raw — deterministic bytes, so the payload md5 is part
of the oracle contract).

Shuffle shape: one explode pass adds (x, y, px-bin) columns; tiles
shuffle on a coarse ``tile_key %% parts`` shard and each task renders
its run of tiles from a sort + run-scan — the same batched-regroup
pattern as way assembly (no per-tile task dispatch).
"""

from __future__ import annotations

import functools
import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .. import codecs, tiles
from .spatial import points_from_documents
from ..stages.common import safe_join

RASTER_PARTS = 16


def _explode_bins(batch: pa.Table, z: int, tile_px: int) -> pa.Table:
    lon = batch["lon"].to_numpy()
    lat = batch["lat"].to_numpy()
    x, y = tiles.tile_xy(lon, lat, z)
    n = np.int64(1) << z
    # fractional position inside the tile -> pixel bin (same floor math
    # as the tile assign, one level deeper)
    u = (lon + 180.0) / 360.0 * n - x
    lat_c = np.clip(lat, -tiles.MERC_LAT_LIMIT, tiles.MERC_LAT_LIMIT)
    lat_rad = np.radians(lat_c)
    merc = (1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n - y
    px = np.clip(np.floor(u * tile_px), 0, tile_px - 1).astype(np.int64)
    py = np.clip(np.floor(merc * tile_px), 0, tile_px - 1).astype(np.int64)
    key = (x << np.int64(32)) | y
    return pa.table(
        {
            "tile_key": pa.array(key),
            "pix": pa.array(py * tile_px + px),
            "shard": pa.array((key % RASTER_PARTS).astype(np.int64)),
        }
    )


def _render_shard(g: pd.DataFrame, z: int, tile_px: int, keep_payload: bool = False) -> pd.DataFrame:
    g = g.sort_values(["tile_key", "pix"], kind="mergesort")
    keys = g["tile_key"].to_numpy()
    pix = g["pix"].to_numpy()
    bounds = np.nonzero(np.diff(keys))[0] + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(keys)]])
    out = {"x": [], "y": [], "n_points": [], "n_bytes": [], "payload_md5": [], "pixel_sum": []}
    payloads: list[bytes] = []
    for s, e in zip(starts, ends):
        key = int(keys[s])
        counts = np.bincount(pix[s:e], minlength=tile_px * tile_px)
        grid = np.minimum(counts, 255).astype(np.uint8).reshape(tile_px, tile_px)
        rgb = np.repeat(grid[:, :, None], 3, axis=2)  # grayscale heat tile
        payload = codecs.encode_image(rgb, "pngz")
        out["x"].append(key >> 32)
        out["y"].append(key & 0xFFFFFFFF)
        out["n_points"].append(int(e - s))
        out["n_bytes"].append(len(payload))
        out["payload_md5"].append(hashlib.md5(payload).hexdigest())
        out["pixel_sum"].append(int(grid.sum(dtype=np.int64)) * 3)
        if keep_payload:
            payloads.append(payload)
    df = pd.DataFrame(
        {
            "x": pd.Series(out["x"], dtype=np.int64),
            "y": pd.Series(out["y"], dtype=np.int64),
            "n_points": pd.Series(out["n_points"], dtype=np.int64),
            "n_bytes": pd.Series(out["n_bytes"], dtype=np.int64),
            "payload_md5": pd.Series(out["payload_md5"], dtype=object),
            "pixel_sum": pd.Series(out["pixel_sum"], dtype=np.int64),
        }
    )
    if keep_payload:
        df["payload"] = pd.Series(payloads, dtype=object)
    return df


def tile_raster_pipeline(
    sf_dir: str, z: int = 10, tile_px: int = 16, keep_payload: bool = False
) -> rd.Dataset:
    """Render every non-empty z-level tile as a pngz heat image; output
    one row of tile metadata per rendered tile (z, x, y, n_points,
    n_bytes, payload_md5, pixel_sum) — the md5 pins the encoded BYTES,
    so the oracle checks the full raster path end-to-end.

    ``keep_payload=True`` additionally carries the encoded tile bytes
    (the input side of :func:`raster_to_vector`)."""
    pts = points_from_documents(sf_dir)
    exploded = pts.map_batches(functools.partial(_explode_bins, z=z, tile_px=tile_px), batch_format="pyarrow")
    rendered = exploded.groupby("shard").map_groups(
        functools.partial(_render_shard, z=z, tile_px=tile_px, keep_payload=keep_payload),
        batch_format="pandas",
    )

    def add_z(t: pa.Table) -> pa.Table:
        return t.append_column("z", pa.array(np.full(t.num_rows, z, dtype=np.int64)))

    return rendered.map_batches(add_z, batch_format="pyarrow")


class TileVectorize:
    """Actor-pool stage: raster -> vector.  Decode each tile image
    through the engine codec and emit one feature row per NON-ZERO
    pixel with its geographic centroid (inverse Web-Mercator of the
    pixel center) and count — the reverse leg of the raster↔vector
    loop (GeoJSON-able via sources.geojson.points_to_geojson).
    """

    def __init__(self, z: int, tile_px: int):
        self.z = z
        self.tile_px = tile_px
        self.n = np.int64(1) << z

    def __call__(self, batch: pa.Table) -> pa.Table:
        px_n = self.tile_px
        out = {k: [] for k in ("x", "y", "px", "py", "n_points", "lon", "lat")}
        for i in range(batch.num_rows):
            rgb = codecs.decode_image(batch["payload"][i].as_py(), px_n, px_n, "pngz")
            grid = rgb[:, :, 0].astype(np.int64)  # grayscale heat: R=G=B
            py, px = np.nonzero(grid)
            if len(px) == 0:
                continue
            x = int(batch["x"][i].as_py())
            y = int(batch["y"][i].as_py())
            X = x + (px + 0.5) / px_n
            Y = y + (py + 0.5) / px_n
            out["x"].append(np.full(len(px), x, dtype=np.int64))
            out["y"].append(np.full(len(px), y, dtype=np.int64))
            out["px"].append(px.astype(np.int64))
            out["py"].append(py.astype(np.int64))
            out["n_points"].append(grid[py, px])
            out["lon"].append(X / self.n * 360.0 - 180.0)
            out["lat"].append(np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * Y / self.n)))))
        if not out["x"]:
            return pa.table(
                {
                    "x": pa.array([], type=pa.int64()),
                    "y": pa.array([], type=pa.int64()),
                    "px": pa.array([], type=pa.int64()),
                    "py": pa.array([], type=pa.int64()),
                    "n_points": pa.array([], type=pa.int64()),
                    "lon": pa.array([], type=pa.float64()),
                    "lat": pa.array([], type=pa.float64()),
                }
            )
        from ..stages.common import duckdb_round

        return pa.table(
            {
                "x": pa.array(np.concatenate(out["x"]), type=pa.int64()),
                "y": pa.array(np.concatenate(out["y"]), type=pa.int64()),
                "px": pa.array(np.concatenate(out["px"]), type=pa.int64()),
                "py": pa.array(np.concatenate(out["py"]), type=pa.int64()),
                "n_points": pa.array(np.concatenate(out["n_points"]), type=pa.int64()),
                "lon": pa.array(duckdb_round(np.concatenate(out["lon"]), 9), type=pa.float64()),
                "lat": pa.array(duckdb_round(np.concatenate(out["lat"]), 9), type=pa.float64()),
            }
        )


DENSIFY_PER_EDGE = 8
SIMPLIFY_TOL = 1e-6  # degrees; interpolated points are EXACTLY collinear


def densified_boundary_rings(per_edge: int = DENSIFY_PER_EDGE) -> pa.Table:
    """The fixture admin rings with ``per_edge`` linearly interpolated
    (exactly collinear) points inserted per edge — a deterministic
    stand-in for high-resolution survey boundaries."""
    from .. import fixtures

    rows_id, rows_lons, rows_lats, rows_n = [], [], [], []
    for p in fixtures.admin_polygons():
        ring = np.asarray(p["outer"], dtype=np.float64)
        if np.array_equal(ring[0], ring[-1]):
            ring = ring[:-1]
        t = (np.arange(per_edge + 1) / (per_edge + 1))[:, None]  # [0, 1)
        nxt = np.roll(ring, -1, axis=0)
        dense = (ring[:, None, :] * (1 - t[None]) + nxt[:, None, :] * t[None]).reshape(-1, 2)
        dense = np.vstack([dense, ring[:1]])  # close
        rows_id.append(p["rel_id"])
        rows_lons.append(dense[:, 0])
        rows_lats.append(dense[:, 1])
        rows_n.append(ring.shape[0])
    return pa.table(
        {
            "rel_id": pa.array(rows_id, type=pa.int64()),
            "n_corners": pa.array(rows_n, type=pa.int64()),
            "lons": pa.array([list(v) for v in rows_lons], type=pa.list_(pa.float64())),
            "lats": pa.array([list(v) for v in rows_lats], type=pa.list_(pa.float64())),
        }
    )


def boundary_simplify_query(sf_dir: str, tol: float = SIMPLIFY_TOL, per_edge: int = DENSIFY_PER_EDGE) -> rd.Dataset:
    """Geometry generalization (Douglas-Peucker) over densified admin
    rings: the interpolated points are exactly collinear, so
    simplification must recover EXACTLY the original corners — a
    self-checking invariant (asserted in pytest; golden-oracle checked
    row-for-row).  Output: (rel_id, n_densified, n_simplified,
    n_corners).  At scale this runs per-geometry inside map_batches —
    embarrassingly parallel, no shuffle."""
    from .. import geometry

    dense = densified_boundary_rings(per_edge)

    def simplify(t: pa.Table) -> pa.Table:
        n_dense, n_simpl = [], []
        for i in range(t.num_rows):
            coords = np.column_stack([t["lons"][i].as_py(), t["lats"][i].as_py()])
            keep = geometry.simplify_polyline(coords, tol)
            n_dense.append(coords.shape[0])
            n_simpl.append(len(keep))
        return pa.table(
            {
                "rel_id": t["rel_id"],
                "n_densified": pa.array(n_dense, type=pa.int64()),
                "n_simplified": pa.array(n_simpl, type=pa.int64()),
                "n_corners": t["n_corners"],
            }
        )

    return rd.from_arrow(dense).map_batches(simplify, batch_format="pyarrow")


def raster_to_vector(sf_dir: str, z: int = 10, tile_px: int = 16) -> rd.Dataset:
    """Raster -> vector: render the z-level tile layer, then DECODE the
    tile images back into per-pixel point features (x, y, px, py,
    n_points, lon, lat) — centroid coordinates from the inverse
    Web-Mercator of each pixel center, counts from the decoded pixel
    values.  At scale the decode is an actor-pool map over the stored
    tile table (tiles stream; no extra shuffle beyond the render's)."""
    rendered = tile_raster_pipeline(sf_dir, z=z, tile_px=tile_px, keep_payload=True)
    return rendered.map_batches(
        TileVectorize,
        fn_constructor_kwargs=dict(z=z, tile_px=tile_px),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
    )


def zonal_stats(sf_dir: str, z: int = 10, tile_px: int = 16) -> rd.Dataset:
    """Zonal statistics — the raster×vector fusion: decoded pixel
    features (raster_to_vector) PiP-joined against the broadcast admin
    polygon index, aggregated per zone.  Output per admin area:
    (rel_id, n_pixels, n_points) — pixel CELLS contributing and the
    total point mass they carry.  Shuffle shape: the pixel stream is
    map-joined (broadcast index), only the per-zone partial counts
    aggregate."""
    from ray.data.aggregate import Count, Sum

    from ..stages import geo
    from .spatial import boundary_index_ref

    vec = raster_to_vector(sf_dir, z=z, tile_px=tile_px)
    idx_ref = boundary_index_ref()
    joined = vec.map_batches(
        geo.PiPJoinActor,
        fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("n_points",)),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    out = joined.groupby("rel_id").aggregate(
        Count(alias_name="n_pixels"), Sum("n_points", alias_name="n_points")
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("n_points"), "n_points", pa.compute.cast(t["n_points"], pa.int64())
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# cell_coverage_weights (vector -> raster area weighting / overlay)
# ---------------------------------------------------------------------------

COVERAGE_EPS = 0.1  # lattice pitch, planar degrees (hotspot.GI_EPS lattice)


def cell_coverage_weights(sf_dir: str, eps: float = COVERAGE_EPS) -> rd.Dataset:
    """Polygon overlay against the fixed cell lattice: for every admin
    polygon x lattice cell with positive overlap, the EXACT intersection
    area — the area-weighting table behind dasymetric/zonal
    interpolation and anti-aliased polygon rasterization.

    The engine path is fully generic: Sutherland-Hodgman clip of the
    actual polygon ring against each covered cell window
    (geometry.clip_ring_convex) + shoelace area — it never exploits the
    fixture's rectangular boundaries.  The SQL oracle DOES use the
    closed-form rect∩rect formula, so the compare proves the generic
    clipping path reproduces the exact answer (both sides fixed-point
    int64; S-H's parametric-interpolation ulp drift is ~1e-6 fp units,
    far below the 0.5 rounding threshold).

    Scale shape: map-ONLY — each boundary row independently explodes to
    its bbox-covered cells and clips; no shuffle at all.  At planet
    scale the boundary table is a parquet Dataset; here it is the
    21-row fixture set served via from_items.
    """
    from .. import fixtures, geometry
    from ..pipelines import hotspot

    items = [
        {
            "rel_id": p["rel_id"],
            "name": p["name"],
            "admin_level": p["admin_level"],
            "ring_lon": p["outer"][:, 0].tolist(),
            "ring_lat": p["outer"][:, 1].tolist(),
        }
        for p in fixtures.admin_polygons()
    ]

    def clip_expand(t: pa.Table) -> pa.Table:
        rel, name, lvl, cxs, cys, fps = [], [], [], [], [], []
        for row in t.to_pylist():
            ring = np.column_stack([row["ring_lon"], row["ring_lat"]])
            lon0, lat0, lon1, lat1 = geometry.envelope(ring)
            cx0 = max(0, int(np.floor((lon0 - fixtures.LON_MIN) / eps)))
            cx1 = min(hotspot.GI_GX - 1, int(np.floor((lon1 - fixtures.LON_MIN) / eps)))
            cy0 = max(0, int(np.floor((lat0 - fixtures.LAT_MIN) / eps)))
            cy1 = min(hotspot.GI_GY - 1, int(np.floor((lat1 - fixtures.LAT_MIN) / eps)))
            for cx in range(cx0, cx1 + 1):
                clon0 = fixtures.LON_MIN + cx * eps
                clon1 = fixtures.LON_MIN + (cx + 1) * eps
                for cy in range(cy0, cy1 + 1):
                    clat0 = fixtures.LAT_MIN + cy * eps
                    clat1 = fixtures.LAT_MIN + (cy + 1) * eps
                    window = np.array(
                        [[clon0, clat0], [clon1, clat0], [clon1, clat1], [clon0, clat1]]
                    )
                    clipped = geometry.clip_ring_convex(ring, window)
                    area = geometry.ring_area(clipped) if clipped.shape[0] >= 3 else 0.0
                    fp = int(np.floor(abs(area) * 1e9 + 0.5))
                    if fp > 0:
                        rel.append(row["rel_id"])
                        name.append(row["name"])
                        lvl.append(row["admin_level"])
                        cxs.append(cx)
                        cys.append(cy)
                        fps.append(fp)
        return pa.table(
            {
                "rel_id": pa.array(rel, type=pa.int64()),
                "name": pa.array(name, type=pa.string()),
                "admin_level": pa.array(lvl, type=pa.int64()),
                "cx": pa.array(cxs, type=pa.int64()),
                "cy": pa.array(cys, type=pa.int64()),
                "area_fp": pa.array(fps, type=pa.int64()),
            }
        )

    return rd.from_items(items).map_batches(clip_expand, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# segment_cell_lengths (polyline x lattice overlay: density raster)
# ---------------------------------------------------------------------------

SEGLEN_FP = 1e9
SEG_PARTS = 32


def segment_cell_lengths(sf_dir: str, eps: float = COVERAGE_EPS, parts: int = SEG_PARTS) -> rd.Dataset:
    """Line density raster: total trajectory length inside each lattice
    cell — every consecutive same-user movement segment is clipped
    against the cell grid parametrically (the Liang-Barsky t-interval:
    enter/exit parameters per axis, intersected, times segment length).

    Engine shape: segments form in the per-user coarse-partition
    run-scan (no per-user tasks); each partition then computes, per
    lattice cell, the VECTORIZED t-interval over all its segments —
    map-side fixed-point partial sums, one tiny groupby.  Lengths are
    fixed-point int64 per (segment, cell) so sums are order-free.

    Output: (cx, cy, n_segments, len_fp) for cells crossed by ≥1
    segment; n_segments counts segments with positive in-cell length.
    """
    from . import hotspot
    from .. import fixtures

    import os as _os

    ds = rd.read_parquet(_os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        uid = t["user_id"].to_numpy()
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "tus": pa.array(t["ts"].cast(pa.int64()).to_numpy(), type=pa.int64()),
                "lon": pa.array(fixtures.derive_lon(ids), type=pa.float64()),
                "lat": pa.array(fixtures.derive_lat(ids), type=pa.float64()),
                "part": pa.array(np.asarray(uid, np.int64) % parts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "cx": pa.array([], type=pa.int64()),
            "cy": pa.array([], type=pa.int64()),
            "n_segments": pa.array([], type=pa.int64()),
            "len_fp": pa.array([], type=pa.int64()),
        }
    )

    def clip_cells(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("tus", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        if len(uid) < 2:
            return empty
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        dx, dy = np.diff(lon), np.diff(lat)
        m = (np.diff(uid) == 0) & ~((dx == 0) & (dy == 0))
        if not m.any():
            return empty
        x0, y0 = lon[:-1][m], lat[:-1][m]
        dx, dy = dx[m], dy[m]
        seglen = np.sqrt(dx * dx + dy * dy)
        out_cx, out_cy, out_n, out_fp = [], [], [], []
        for cx in range(hotspot.GI_GX):
            c0x = fixtures.LON_MIN + cx * eps
            c1x = fixtures.LON_MIN + (cx + 1) * eps
            in_x = (x0 >= c0x) & (x0 < c1x)
            tx_lo = np.where(dx > 0, (c0x - x0) / np.where(dx != 0, dx, 1.0),
                             np.where(dx < 0, (c1x - x0) / np.where(dx != 0, dx, 1.0),
                                      np.where(in_x, 0.0, 1.0)))
            tx_hi = np.where(dx > 0, (c1x - x0) / np.where(dx != 0, dx, 1.0),
                             np.where(dx < 0, (c0x - x0) / np.where(dx != 0, dx, 1.0),
                                      np.where(in_x, 1.0, 0.0)))
            for cy in range(hotspot.GI_GY):
                c0y = fixtures.LAT_MIN + cy * eps
                c1y = fixtures.LAT_MIN + (cy + 1) * eps
                in_y = (y0 >= c0y) & (y0 < c1y)
                ty_lo = np.where(dy > 0, (c0y - y0) / np.where(dy != 0, dy, 1.0),
                                 np.where(dy < 0, (c1y - y0) / np.where(dy != 0, dy, 1.0),
                                          np.where(in_y, 0.0, 1.0)))
                ty_hi = np.where(dy > 0, (c1y - y0) / np.where(dy != 0, dy, 1.0),
                                 np.where(dy < 0, (c0y - y0) / np.where(dy != 0, dy, 1.0),
                                          np.where(in_y, 1.0, 0.0)))
                tlo = np.maximum(0.0, np.maximum(tx_lo, ty_lo))
                thi = np.minimum(1.0, np.minimum(tx_hi, ty_hi))
                contrib = (thi - tlo) * seglen
                fp = np.floor(contrib * SEGLEN_FP + 0.5).astype(np.int64)
                keep = (thi > tlo) & (fp > 0)
                if keep.any():
                    out_cx.append(cx)
                    out_cy.append(cy)
                    out_n.append(int(keep.sum()))
                    out_fp.append(int(fp[keep].sum()))
        return pa.table(
            {
                "cx": pa.array(out_cx, type=pa.int64()),
                "cy": pa.array(out_cy, type=pa.int64()),
                "n_segments": pa.array(out_n, type=pa.int64()),
                "len_fp": pa.array(out_fp, type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(clip_cells, batch_format="pyarrow")
        .groupby(["cx", "cy"])
        .aggregate(_Sum("n_segments", alias_name="n_segments"), _Sum("len_fp", alias_name="len_fp"))
    )


# ---------------------------------------------------------------------------
# areal_interpolation (dasymetric transfer: lattice counts -> zones)
# ---------------------------------------------------------------------------


def areal_interpolation(sf_dir: str, eps: float = COVERAGE_EPS) -> rd.Dataset:
    """Areal (dasymetric) interpolation: transfer per-lattice-cell event
    counts onto the admin zones by exact intersection-area weights —
    the estimate a GIS makes when source statistics live on one
    partition (the raster lattice) and the question lives on another
    (the zone polygons): est(zone) = Σ_cells n(cell)·area(zone∩cell)/area(cell).

    Composition of two oracle-green layers: cell_coverage_weights (the
    generic Sutherland-Hodgman clip, map-only) hash-joins the per-cell
    counts (one lattice-bounded shuffle), then a zone-keyed reduce of
    int64 (count × area_fp) products — exact until the single final
    division.  Output: (rel_id, name, admin_level, n_cells,
    est_num_fp, est).
    """
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    from .. import fixtures
    from ..pipelines import hotspot
    from ..stages.common import duckdb_round as _dr

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def counts(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        cx = np.floor((lon - fixtures.LON_MIN) / eps).astype(np.int64)
        cy = np.floor((lat - fixtures.LAT_MIN) / eps).astype(np.int64)
        key = cx * hotspot.GI_GY + cy
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uniq, type=pa.int64()), "n": pa.array(cnt.astype(np.int64))})

    per_cell = ds.map_batches(counts, batch_format="pyarrow").groupby("key").aggregate(
        _Sum("n", alias_name="n")
    )

    cov = cell_coverage_weights(sf_dir, eps=eps)

    def cov_key(t: pa.Table) -> pa.Table:
        key = t["cx"].to_numpy() * hotspot.GI_GY + t["cy"].to_numpy()
        return t.append_column("key", pa.array(key, type=pa.int64()))

    cov = cov.map_batches(cov_key, batch_format="pyarrow")
    j = safe_join(cov, per_cell, join_type="inner", num_partitions=4, on=("key",))

    def product(t: pa.Table) -> pa.Table:
        p = t["n"].to_numpy().astype(np.int64) * t["area_fp"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "rel_id": t["rel_id"],
                "name": t["name"],
                "admin_level": t["admin_level"],
                "prod": pa.array(p, type=pa.int64()),
            }
        )

    agg = (
        j.map_batches(product, batch_format="pyarrow")
        .groupby(["rel_id", "name", "admin_level"])
        .aggregate(_Count(alias_name="n_cells"), _Sum("prod", alias_name="est_num_fp"))
    )
    cell_area_fp = float(np.floor(eps * eps * 1e9 + 0.5))

    def finish(t: pa.Table) -> pa.Table:
        est = _dr(t["est_num_fp"].to_numpy().astype(np.float64) / cell_area_fp, 6)
        return pa.table(
            {
                "rel_id": pc.cast(t["rel_id"], pa.int64()),
                "name": t["name"],
                "admin_level": pc.cast(t["admin_level"], pa.int64()),
                "n_cells": pc.cast(t["n_cells"], pa.int64()),
                "est_num_fp": t["est_num_fp"],
                "est": pa.array(est, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def raster_focal_mean(sf_dir: str, z: int = 10, tile_px: int = 16) -> rd.Dataset:
    """Map-algebra focal statistic: the 3×3 neighborhood mean of the
    rendered density raster (zero-padded — every cell in the dilated
    support gets sum(neighbors)/9) — the smoothing/convolution pass GIS
    raster calculators and heat-map renderers apply before contouring.

    Scale shape: each nonzero pixel EXPLODES to its 9 neighbor
    positions carrying its count (map-side, 9× the nonzero support —
    sparse, never the full lattice); ONE (gx, gy)-keyed integer-sum
    groupby; the /9 division is the single mirrored float op.  Tile and
    pixel coords collapse into global lattice coords first, so tile
    borders smooth correctly.
    Output: (gx, gy, neigh_sum, focal_mean).
    """
    from ray.data.aggregate import Sum

    v = raster_to_vector(sf_dir, z=z, tile_px=tile_px)

    def explode_neighbors(t: pa.Table) -> pa.Table:
        gx = t["x"].to_numpy().astype(np.int64) * tile_px + t["px"].to_numpy().astype(np.int64)
        gy = t["y"].to_numpy().astype(np.int64) * tile_px + t["py"].to_numpy().astype(np.int64)
        n = t["n_points"].to_numpy().astype(np.int64)
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(
                    pa.table(
                        {
                            "gx": pa.array(gx + dx, type=pa.int64()),
                            "gy": pa.array(gy + dy, type=pa.int64()),
                            "n": pa.array(n, type=pa.int64()),
                        }
                    )
                )
        return pa.concat_tables(outs)

    agg = (
        v.map_batches(explode_neighbors, batch_format="pyarrow")
        .groupby(["gx", "gy"])
        .aggregate(Sum("n", alias_name="neigh_sum"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["neigh_sum"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "gx": t["gx"],
                "gy": t["gy"],
                "neigh_sum": pa.array(s, type=pa.int64()),
                "focal_mean": pa.array(s.astype(np.float64) / 9.0, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(["gx", "gy"])


def raster_hillshade(sf_dir: str, z: int = 10, tile_px: int = 16) -> rd.Dataset:
    """Map-algebra hillshade of the density raster (counts as
    elevation): Horn-method 8-neighbor gradients, then the standard
    illumination model (sun azimuth 315°, altitude 45°) — the
    cartographic relief pass every terrain/heat renderer applies, and
    the second derivative-stencil operator beside raster_focal_mean's
    smoothing stencil.

    Exactness: the two Horn gradient NUMERATORS are exact int64
    (weighted ±1/±2 sums of counts, zero-padded), shuffled as integers;
    slope/aspect/illumination is ONE mirrored float expression over
    them (atan/atan2/cos/sin agree between numpy and DuckDB's libm —
    verified by the oracle gate).

    Scale shape: each nonzero pixel explodes to its 8 Horn neighbors
    (sparse support, never the lattice); ONE (gx, gy)-keyed integer
    groupby; trig runs on the aggregate.  Output: (gx, gy, dzdx_num,
    dzdy_num, hillshade).
    """
    from ray.data.aggregate import Sum

    from ..stages.common import duckdb_round

    v = raster_to_vector(sf_dir, z=z, tile_px=tile_px)

    # source offset (ox, oy) relative to target -> Horn weights
    # dz/dx numerator = sum over right column (+1,{-1,0,1}) with weights
    # (1,2,1) minus left column; dz/dy symmetric in rows.
    offsets = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            wx = ox * (2 if oy == 0 else 1)
            wy = oy * (2 if ox == 0 else 1)
            if wx or wy:
                offsets.append((ox, oy, wx, wy))

    def explode_horn(t: pa.Table) -> pa.Table:
        gx = t["x"].to_numpy().astype(np.int64) * tile_px + t["px"].to_numpy().astype(np.int64)
        gy = t["y"].to_numpy().astype(np.int64) * tile_px + t["py"].to_numpy().astype(np.int64)
        n = t["n_points"].to_numpy().astype(np.int64)
        outs = []
        for ox, oy, wx, wy in offsets:
            outs.append(
                pa.table(
                    {
                        # source at s contributes to target s - offset
                        "gx": pa.array(gx - ox, type=pa.int64()),
                        "gy": pa.array(gy - oy, type=pa.int64()),
                        "sx": pa.array(wx * n, type=pa.int64()),
                        "sy": pa.array(wy * n, type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    agg = (
        v.map_batches(explode_horn, batch_format="pyarrow")
        .groupby(["gx", "gy"])
        .aggregate(Sum("sx", alias_name="dzdx_num"), Sum("sy", alias_name="dzdy_num"))
    )

    def finish(t: pa.Table) -> pa.Table:
        dx = t["dzdx_num"].to_numpy().astype(np.float64) / 8.0
        dy = t["dzdy_num"].to_numpy().astype(np.float64) / 8.0
        slope = np.arctan(np.sqrt(dx * dx + dy * dy))
        aspect = np.arctan2(dy, -dx)
        zen = np.pi / 4.0
        az = 7.0 * np.pi / 4.0
        hs = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(az - aspect)
        return pa.table(
            {
                "gx": t["gx"],
                "gy": t["gy"],
                "dzdx_num": t["dzdx_num"],
                "dzdy_num": t["dzdy_num"],
                "hillshade": pa.array(duckdb_round(hs, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(["gx", "gy"])


# D8 direction table: (dir, dx, dy, weight); weight 10 ~ 1/dist for
# orthogonal moves, 7 ~ 10/sqrt(2) for diagonals (integer slope proxy)
D8_DIRS = (
    (0, -1, -1, 7), (1, -1, 0, 10), (2, -1, 1, 7), (3, 0, -1, 10),
    (4, 0, 1, 10), (5, 1, -1, 7), (6, 1, 0, 10), (7, 1, 1, 7),
)


def flow_accumulation(sf_dir: str, z: int = 10, tile_px: int = 16) -> rd.Dataset:
    """D8 flow accumulation over the density raster (map-algebra's
    hydrology classic, O'Callaghan & Mark 1984, run on point density
    instead of elevation): each occupied pixel points at its
    steepest-DESCENT occupied neighbor (integer slope proxy
    drop×10 orthogonal / drop×7 diagonal, ties to the smallest
    direction index); accumulation counts the cells whose descent
    path passes through each pixel — the drainage/funnel structure of
    the density surface.

    Determinism: flow pointers are exact integer argmaxes with a fixed
    tie order; the pointer graph is acyclic (strictly decreasing
    values), so path counts are unique integers.  The DuckDB mirror
    recomputes the walk with a RECURSIVE CTE.

    Scale shape: the distributed render/decode produces the sparse
    raster (support-bounded); the pointer+walk finalize runs on that
    bounded table driver-side (at a planetary lattice swap in the
    pointer-jumping label propagation of cluster.connected_components
    — same exchange shape, documented).  Output: (gx, gy, n_points,
    to_gx, to_gy, is_sink, n_upstream).
    """
    v = raster_to_vector(sf_dir, z=z, tile_px=tile_px)

    def collapse(t: pa.Table) -> pa.Table:
        gx = t["x"].to_numpy().astype(np.int64) * tile_px + t["px"].to_numpy().astype(np.int64)
        gy = t["y"].to_numpy().astype(np.int64) * tile_px + t["py"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "gx": pa.array(gx, type=pa.int64()),
                "gy": pa.array(gy, type=pa.int64()),
                "n_points": t["n_points"],
            }
        )

    tbl = v.map_batches(collapse, batch_format="pyarrow").to_pandas()
    gx = tbl["gx"].to_numpy().astype(np.int64)
    gy = tbl["gy"].to_numpy().astype(np.int64)
    n = tbl["n_points"].to_numpy().astype(np.int64)
    # key by a wide stride so (gx, gy) packs collision-free
    stride = np.int64(1 << 22)
    key = gx * stride + gy
    order = np.argsort(key)
    gx, gy, n, key = gx[order], gy[order], n[order], key[order]
    pos = {int(k): i for i, k in enumerate(key)}

    m = len(gx)
    to = np.arange(m, dtype=np.int64)  # default: self (sink)
    best = np.full(m, -1, dtype=np.int64)  # best score so far
    for dir_i, dx, dy, wt in D8_DIRS:
        nk = (gx + dx) * stride + (gy + dy)
        idx = np.array([pos.get(int(k2), -1) for k2 in nk], dtype=np.int64)
        ok = idx >= 0
        drop = np.where(ok, n - n[np.where(ok, idx, 0)], 0)
        score = drop * wt
        better = ok & (drop > 0) & (score > best)  # strict '>': earlier dir wins ties
        to = np.where(better, idx, to)
        best = np.where(better, score, best)

    is_sink = (to == np.arange(m)).astype(np.int64)
    acc = np.zeros(m, dtype=np.int64)
    for start in range(m):
        c = start
        while True:
            acc[c] += 1
            if to[c] == c:
                break
            c = int(to[c])

    return rd.from_arrow(
        pa.table(
            {
                "gx": pa.array(gx, type=pa.int64()),
                "gy": pa.array(gy, type=pa.int64()),
                "n_points": pa.array(n, type=pa.int64()),
                "to_gx": pa.array(gx[to], type=pa.int64()),
                "to_gy": pa.array(gy[to], type=pa.int64()),
                "is_sink": pa.array(is_sink, type=pa.int64()),
                "n_upstream": pa.array(acc, type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# viewshed (exact-integer line-of-sight over the density raster)
# ---------------------------------------------------------------------------


def los_cells(vx: int, vy: int, tx: int, ty: int) -> list:
    """Canonical intermediate-cell sequence for the sightline
    (ENDPOINTS EXCLUDED): m = Chebyshev distance; step k = 1..m-1
    lands at (vx + rhu(k·dx/m), vy + rhu(k·dy/m)) with rhu the exact
    integer round-half-up floor((2kd + m) // (2m)).  This is the
    DEFINITION of the sightline shared by the engine and the golden
    oracle (their slope comparisons differ)."""
    dx, dy = tx - vx, ty - vy
    m = max(abs(dx), abs(dy))
    out = []
    for k in range(1, m):
        cx = vx + (2 * k * dx + m) // (2 * m)
        cy = vy + (2 * k * dy + m) // (2 * m)
        out.append((cx, cy))
    return out


def viewshed(sf_dir: str, z: int = 10, tile_px: int = 16) -> rd.Dataset:
    """Viewshed over the density raster (counts as elevation): which
    occupied pixels are VISIBLE from the tallest pixel (max count,
    ties to smallest (gx, gy))?  The classic terrain-analysis operator
    (line-of-sight R3 variant) run on the point-density surface —
    "from the densest hub, which other hotspots have an unobstructed
    sight line?" — beside hillshade's illumination and
    flow_accumulation's drainage.

    EXACT-integer visibility: a target t is blocked iff some
    intermediate cell i on the canonical sightline (``los_cells``)
    satisfies slope_i ≥ slope_t where slope = (z_cell − z_view)/√d².
    The engine compares via sign-cased cross-multiplied squares in
    PYTHON ints (no overflow); the golden oracle compares
    sign(a)·a²/d² as exact Fractions — same definition, independent
    arithmetic.  Empty cells carry elevation 0 and CAN block a
    below-horizon target.

    Scale shape: the sparse raster (support-bounded) broadcasts once
    via ray.put; targets stream through an actor pool that walks each
    sightline (O(grid-span) ints per target).  Output: (gx, gy,
    n_points, chebyshev_d, visible).
    """
    v = raster_to_vector(sf_dir, z=z, tile_px=tile_px)

    def collapse(t: pa.Table) -> pa.Table:
        gx = t["x"].to_numpy().astype(np.int64) * tile_px + t["px"].to_numpy().astype(np.int64)
        gy = t["y"].to_numpy().astype(np.int64) * tile_px + t["py"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "gx": pa.array(gx, type=pa.int64()),
                "gy": pa.array(gy, type=pa.int64()),
                "n_points": t["n_points"],
            }
        )

    pixels = v.map_batches(collapse, batch_format="pyarrow")
    # support-bounded collect to pick the viewpoint + broadcast the
    # elevation dict (the flow_accumulation finalize precedent)
    tbl = pixels.to_pandas()
    gx = tbl["gx"].to_numpy().astype(np.int64)
    gy = tbl["gy"].to_numpy().astype(np.int64)
    n = tbl["n_points"].to_numpy().astype(np.int64)
    best = np.lexsort((gy, gx, -n))[0]
    vx, vy, zv = int(gx[best]), int(gy[best]), int(n[best])
    elev = {(int(a), int(b)): int(c) for a, b, c in zip(gx, gy, n)}
    import ray as _ray

    ref = _ray.put((vx, vy, zv, elev))

    class LineOfSight:
        def __init__(self, ref):
            self.vx, self.vy, self.zv, self.elev = _ray.get(ref) if not isinstance(ref, tuple) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            txs = t["gx"].to_numpy().astype(np.int64)
            tys = t["gy"].to_numpy().astype(np.int64)
            zs = t["n_points"].to_numpy().astype(np.int64)
            vis = np.zeros(len(txs), dtype=bool)
            cheb = np.maximum(np.abs(txs - self.vx), np.abs(tys - self.vy)).astype(np.int64)
            for i in range(len(txs)):
                tx, ty, zt = int(txs[i]), int(tys[i]), int(zs[i])
                a_t = zt - self.zv
                d2_t = (tx - self.vx) ** 2 + (ty - self.vy) ** 2
                blocked = False
                for cx, cy in los_cells(self.vx, self.vy, tx, ty):
                    a_i = self.elev.get((cx, cy), 0) - self.zv
                    d2_i = (cx - self.vx) ** 2 + (cy - self.vy) ** 2
                    if a_i >= 0 and a_t < 0:
                        blocked = True
                    elif a_i < 0 and a_t >= 0:
                        blocked = False
                    elif a_i >= 0 and a_t >= 0:
                        blocked = a_i * a_i * d2_t >= a_t * a_t * d2_i
                    else:
                        blocked = a_i * a_i * d2_t <= a_t * a_t * d2_i
                    if blocked:
                        break
                vis[i] = not blocked
            return pa.table(
                {
                    "gx": pa.array(txs, type=pa.int64()),
                    "gy": pa.array(tys, type=pa.int64()),
                    "n_points": pa.array(zs, type=pa.int64()),
                    "chebyshev_d": pa.array(cheb, type=pa.int64()),
                    "visible": pa.array(vis),
                }
            )

    return pixels.map_batches(
        LineOfSight,
        fn_constructor_kwargs=dict(ref=ref),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, 8),
    ).sort(["gx", "gy"])


# ---------------------------------------------------------------------------
# watershed_basins (distributed pointer-jumping drainage-basin labels)
# ---------------------------------------------------------------------------

WS_STRIDE = np.int64(1 << 22)
WS_MAX_ROUNDS = 32


def _d8_pointer_table(sf_dir: str, z: int, tile_px: int) -> "pd.DataFrame":
    """Sparse density raster + D8 steepest-descent pointer per cell
    (the flow_accumulation pointer rule verbatim: integer drop x wt
    score, strict '>' so the earlier direction wins ties, sinks point
    at themselves).  Returns (gx, gy, n_points, key, to_key)."""
    v = raster_to_vector(sf_dir, z=z, tile_px=tile_px)

    def collapse(t: pa.Table) -> pa.Table:
        gx = t["x"].to_numpy().astype(np.int64) * tile_px + t["px"].to_numpy().astype(np.int64)
        gy = t["y"].to_numpy().astype(np.int64) * tile_px + t["py"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "gx": pa.array(gx, type=pa.int64()),
                "gy": pa.array(gy, type=pa.int64()),
                "n_points": t["n_points"],
            }
        )

    tbl = v.map_batches(collapse, batch_format="pyarrow").to_pandas()  # bounded: vectorized-cell lattice
    gx = tbl["gx"].to_numpy().astype(np.int64)
    gy = tbl["gy"].to_numpy().astype(np.int64)
    n = tbl["n_points"].to_numpy().astype(np.int64)
    key = gx * WS_STRIDE + gy
    order = np.argsort(key)
    gx, gy, n, key = gx[order], gy[order], n[order], key[order]
    pos = {int(k): i for i, k in enumerate(key)}
    m = len(gx)
    to = np.arange(m, dtype=np.int64)
    best = np.full(m, -1, dtype=np.int64)
    for dir_i, dx, dy, wt in D8_DIRS:
        nk = (gx + dx) * WS_STRIDE + (gy + dy)
        idx = np.array([pos.get(int(k2), -1) for k2 in nk], dtype=np.int64)
        ok = idx >= 0
        drop = np.where(ok, n - n[np.where(ok, idx, 0)], 0)
        score = drop * wt
        better = ok & (drop > 0) & (score > best)
        to = np.where(better, idx, to)
        best = np.where(better, score, best)
    return pd.DataFrame({"gx": gx, "gy": gy, "n_points": n, "key": key, "to_key": key[to]})


def watershed_basins(sf_dir: str, z: int = 10, tile_px: int = 16) -> rd.Dataset:
    """Drainage-basin labeling of the density raster: every occupied
    cell is labeled with the TERMINAL SINK its D8 steepest-descent
    path reaches — flow_accumulation answers "how much drains THROUGH
    here", this answers "where does everything HERE end up" (the
    catchment partition hydrology, sales-territory and
    basin-of-attraction analyses all use).

    The label pass is DISTRIBUTED POINTER JUMPING over Ray Data: the
    (cell, next) pointer table self-joins each round (next <- next of
    next), halving the remaining path depth — O(log depth) rounds of
    hash joins, the Wei-et-al successor-doubling pattern; no driver
    walk (contrast flow_accumulation's bounded driver finalize — this
    is the shape that survives a planetary lattice).  The pointer
    graph is acyclic (strictly decreasing density), so the fixpoint is
    exact and unique; changed-row count is the convergence proof.

    Output: (gx, gy, basin_gx, basin_gy, basin_size); mirrored by a
    RECURSIVE-CTE walk to the sink in DuckDB.
    """
    from ray.data.aggregate import Count

    from ..stages.common import safe_join

    ptr_df = _d8_pointer_table(sf_dir, z, tile_px)
    ptrs = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(ptr_df["key"].to_numpy(), type=pa.int64()),
                "nxt": pa.array(ptr_df["to_key"].to_numpy(), type=pa.int64()),
            }
        )
    ).repartition(8)
    for _ in range(WS_MAX_ROUNDS):
        hop = safe_join(
            ptrs,
            ptrs.map_batches(
                lambda t: pa.table({"pnode": t["node"], "pnxt": t["nxt"]}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=8,
            on=("nxt",),
            right_on=("pnode",),
        ).materialize()
        changed = hop.filter(expr="nxt != pnxt").count()
        ptrs = hop.map_batches(
            lambda t: pa.table({"node": t["node"], "nxt": t["pnxt"]}),
            batch_format="pyarrow",
        ).materialize()
        if changed == 0:
            break
    sizes = ptrs.groupby("nxt").aggregate(Count(alias_name="basin_size"))
    labeled = safe_join(
        ptrs,
        sizes.map_batches(
            lambda t: pa.table({"snxt": t["nxt"], "basin_size": t["basin_size"]}),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=8,
        on=("nxt",),
        right_on=("snxt",),
    )

    def unpack(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        lab = t["nxt"].to_numpy()
        return pa.table(
            {
                "gx": pa.array(node // WS_STRIDE, type=pa.int64()),
                "gy": pa.array(node % WS_STRIDE, type=pa.int64()),
                "basin_gx": pa.array(lab // WS_STRIDE, type=pa.int64()),
                "basin_gy": pa.array(lab % WS_STRIDE, type=pa.int64()),
                "basin_size": t["basin_size"],
            }
        )

    return labeled.map_batches(unpack, batch_format="pyarrow")
