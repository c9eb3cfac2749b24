"""Geo stages: batch UDFs + broadcast-index actor pools.

Every function here is a pure ``fn(pa.Table) -> pa.Table`` suitable for
``ds.map_batches(fn, batch_format="pyarrow")`` (zero-copy Arrow in/out),
mirroring the reference's testable Flow-per-stage design
(SURVEY.md §2.10 "Pipeline-step API").  Stateful lookup structures
(polygon index, POI matrix) are broadcast once via ``ray.put`` and
attached to actor pools in ``__init__`` — the rebuild of the
JTS-prepared-geometry closures (ST2, GeoCalculator.scala:26,125) and
per-process service singletons (ST4, OsmPreprocessor.scala:43-47).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import cells, fixtures, geometry, tiles


def _np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def derive_position(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Attach the deterministic fixture lon/lat derived from an id column."""
    ids = _np(batch[id_col])
    batch = batch.append_column("lon", pa.array(fixtures.derive_lon(ids), type=pa.float64()))
    return batch.append_column("lat", pa.array(fixtures.derive_lat(ids), type=pa.float64()))


def cell_index(
    batch: pa.Table,
    lon_col: str = "lon",
    lat_col: str = "lat",
    outputs: tuple[tuple[str, int], ...] = (("cell_low", cells.PRECISION_LOW), ("cell_verylow", cells.PRECISION_VERY_LOW)),
) -> pa.Table:
    """Add Morton cell-id columns at the reference's two index precisions.

    Reference analogue: principalBoundingBox projection (M6,
    ProcessingUtilities.scala:14-25 + OsmObjectMapper.scala:1031-1059).
    The finest precision is encoded once; coarser ids are prefix shifts.
    """
    lon = _np(batch[lon_col])
    lat = _np(batch[lat_col])
    finest = max(p for _, p in outputs)
    base = cells.encode(lon, lat, finest)
    for name, p in outputs:
        col = base if p == finest else cells.reduce_precision(base, finest, p)
        batch = batch.append_column(name, pa.array(col, type=pa.int64()))
    return batch


def tile_assign(batch: pa.Table, z: int, lon_col: str = "lon", lat_col: str = "lat", with_quadkey: bool = True) -> pa.Table:
    """Add slippy tile columns (z, x, y[, quadkey]) at one zoom."""
    lon = _np(batch[lon_col])
    lat = _np(batch[lat_col])
    x, y = tiles.tile_xy(lon, lat, z)
    batch = batch.append_column("z", pa.array(np.full(len(x), z, dtype=np.int32)))
    batch = batch.append_column("x", pa.array(x, type=pa.int64()))
    batch = batch.append_column("y", pa.array(y, type=pa.int64()))
    if with_quadkey:
        batch = batch.append_column("quadkey", pa.array(tiles.tile_quadkey(x, y, z), type=pa.string()))
    return batch


def tile_explode(
    batch: pa.Table, zooms: tuple[int, ...], key_cols: tuple[str, ...], lon_col: str = "lon", lat_col: str = "lat"
) -> pa.Table:
    """Fan a point out to one row per zoom level (the tiling explode).

    Reference analogue: the cells-x-tags flatMap of ``toBBTag`` (M8,
    ProcessingUtilities.scala:33-43).  Output: key_cols + (z, x, y, quadkey).
    """
    lon = _np(batch[lon_col])
    lat = _np(batch[lat_col])
    parts = []
    for z in zooms:
        x, y = tiles.tile_xy(lon, lat, z)
        cols = {k: batch[k] for k in key_cols}
        cols["z"] = pa.array(np.full(len(x), z, dtype=np.int32))
        cols["x"] = pa.array(x, type=pa.int64())
        cols["y"] = pa.array(y, type=pa.int64())
        cols["quadkey"] = pa.array(tiles.tile_quadkey(x, y, z), type=pa.string())
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def add_salt(batch: pa.Table, key_col: str, salt_col: str = "salt", factor: int = 8, id_col: str | None = None) -> pa.Table:
    """Skew guard: sub-split hot keys into ``factor`` salted shards.

    Two-phase aggregation then re-aggregates over the unsalted key
    (SURVEY.md §4 skew control; replaces the reference's live-substream
    caps at Utilities.scala:16,28).
    """
    n = batch.num_rows
    if id_col is not None:
        base = _np(batch[id_col])
        salt = (np.asarray(base, dtype=np.int64) * np.int64(0x9E3779B1)) % factor
    else:
        salt = np.arange(n, dtype=np.int64) % factor
    return batch.append_column(salt_col, pa.array(salt, type=pa.int64()))


class PolygonIndex:
    """Grid-bucketed polygon index for broadcast point-in-polygon joins.

    Built ONCE on the driver from the (small) boundary set, shipped to
    every PiP actor via ``ray.put`` — the rebuild of the STRtree of
    prepared geometries (ST2).  Buckets are Morton cells at
    ``precision``; each polygon registers in every cell its envelope
    covers, so a probe point only tests the polygons whose envelope
    shares its cell (candidate pruning identical in spirit to the
    reference's cell-first candidate fetch, Queries.scala:304-315).
    """

    def __init__(self, polygons: list[dict], precision: int = cells.PRECISION_VERY_LOW):
        self.precision = precision
        self.polygons = []
        self.buckets: dict[int, list[int]] = {}
        for idx, p in enumerate(polygons):
            outer = np.asarray(p["outer"], dtype=np.float64)
            holes = [np.asarray(h, dtype=np.float64) for h in p.get("holes") or []]
            lon0, lat0, lon1, lat1 = geometry.envelope(outer)
            self.polygons.append(
                dict(
                    rel_id=int(p["rel_id"]),
                    name=str(p.get("name", "")),
                    admin_level=int(p.get("admin_level", 0)),
                    outer=outer,
                    holes=holes,
                    bbox=(lon0, lat0, lon1, lat1),
                )
            )
            for c in cells.cover_bbox(lon0, lat0, lon1, lat1, precision):
                self.buckets.setdefault(int(c), []).append(idx)

    def query(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Candidate-pruned exact PiP: returns (point_idx, polygon_idx) pairs."""
        pt_cells = cells.encode(lon, lat, self.precision)
        order = np.argsort(pt_cells, kind="stable")
        sorted_cells = pt_cells[order]
        uniq, starts = np.unique(sorted_cells, return_index=True)
        bounds = np.append(starts, len(sorted_cells))
        per_poly: dict[int, list[np.ndarray]] = {}
        for i, c in enumerate(uniq):
            cand = self.buckets.get(int(c))
            if not cand:
                continue
            pts = order[bounds[i] : bounds[i + 1]]
            for poly_idx in cand:
                per_poly.setdefault(poly_idx, []).append(pts)
        out_pts: list[np.ndarray] = []
        out_polys: list[np.ndarray] = []
        for poly_idx, chunks in per_poly.items():
            pts = np.concatenate(chunks)
            p = self.polygons[poly_idx]
            lon0, lat0, lon1, lat1 = p["bbox"]
            plon = lon[pts]
            plat = lat[pts]
            # half-open envelope prefilter (matches SQL >=min AND <max)
            m = (plon >= lon0) & (plon < lon1) & (plat >= lat0) & (plat < lat1)
            pts = pts[m]
            if pts.size == 0:
                continue
            inside = geometry.points_in_polygon(lon[pts], lat[pts], p["outer"], p["holes"])
            pts = pts[inside]
            if pts.size:
                out_pts.append(pts)
                out_polys.append(np.full(pts.size, poly_idx, dtype=np.int64))
        if not out_pts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_pts), np.concatenate(out_polys)


class PiPJoinActor:
    """Actor-pool stage: broadcast PiP join (J3/J5 rebuild).

    ``map_batches(PiPJoinActor, fn_constructor_kwargs=dict(index_ref=ref),
    concurrency=N, batch_format="pyarrow")``.  Emits one output row per
    (point, containing polygon): an INNER join — points outside every
    polygon are dropped, matching the reference's drop semantics
    (filter(_.isDefined), WayFlow.scala:38).
    """

    def __init__(self, index_ref, keep_cols: tuple[str, ...] | None = None):
        import ray

        self.index: PolygonIndex = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.keep_cols = keep_cols
        self._rel_ids = np.array([p["rel_id"] for p in self.index.polygons], dtype=np.int64)
        self._levels = np.array([p["admin_level"] for p in self.index.polygons], dtype=np.int32)
        self._names = np.array([p["name"] for p in self.index.polygons], dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = _np(batch["lon"])
        lat = _np(batch["lat"])
        pt_idx, poly_idx = self.index.query(lon, lat)
        keep = list(self.keep_cols) if self.keep_cols else [c for c in batch.column_names]
        out = batch.select(keep).take(pa.array(pt_idx))
        out = out.append_column("rel_id", pa.array(self._rel_ids[poly_idx], type=pa.int64()))
        out = out.append_column("admin_level", pa.array(self._levels[poly_idx], type=pa.int32()))
        out = out.append_column("admin_name", pa.array(self._names[poly_idx], type=pa.string()))
        return out


class KnnJoinActor:
    """Actor-pool stage: k-nearest-POI join against a broadcast POI matrix.

    Rebuild of the 'nearby' grouped-substream join (J7,
    Queries.scala:211-262) as a vectorized brute-force top-k per batch:
    the POI side is small and broadcast (ray.put once), distances are a
    dense (batch x npois) matrix, top-k by argpartition, ties broken by
    poi_id.  ``metric='sqdeg'`` (planar squared degrees — polynomial,
    hence bit-reproducible against the SQL oracle) or ``'haversine'``
    (geodesic metres, reference GeoCalculator.orthodromicDistance).

    Scale note: for POI sets too large to broadcast (>~10^7), swap this
    stage for the cell-bucketed shuffle join in pipelines/spatial.py.
    """

    def __init__(self, pois_ref, k: int = 3, metric: str = "sqdeg", keep_cols: tuple[str, ...] | None = None):
        import ray

        pois = ray.get(pois_ref) if not isinstance(pois_ref, dict) else pois_ref
        self.k = k
        self.metric = metric
        self.keep_cols = keep_cols
        self.poi_id = np.asarray(pois["poi_id"], dtype=np.int64)
        self.poi_lon = np.asarray(pois["lon"], dtype=np.float64)
        self.poi_lat = np.asarray(pois["lat"], dtype=np.float64)

    def _dists(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        if self.metric == "sqdeg":
            dlon = lon[:, None] - self.poi_lon[None, :]
            dlat = lat[:, None] - self.poi_lat[None, :]
            return dlon * dlon + dlat * dlat
        return geometry.haversine_m(lon[:, None], lat[:, None], self.poi_lon[None, :], self.poi_lat[None, :])

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = _np(batch["lon"])
        lat = _np(batch["lat"])
        n = len(lon)
        k = min(self.k, len(self.poi_id))
        d = self._dists(lon, lat)
        cand = np.argpartition(d, k - 1, axis=1)[:, :k]
        rows = np.repeat(np.arange(n), k)
        d_c = d[rows, cand.ravel()].reshape(n, k)
        id_c = self.poi_id[cand]
        # within-row order by (distance, poi_id): lexsort with row major key
        order = np.lexsort((id_c.ravel(), d_c.ravel(), rows))
        keep = list(self.keep_cols) if self.keep_cols else [c for c in batch.column_names]
        out = batch.select(keep).take(pa.array(rows[order]))
        out = out.append_column("rank", pa.array(np.tile(np.arange(1, k + 1), n), type=pa.int32()))
        out = out.append_column("poi_id", pa.array(id_c.ravel()[order], type=pa.int64()))
        return out


class RadiusJoinActor:
    """All POIs within a radius of each point ('nearby', J7 radius form).

    ``metric='sqdeg'`` uses a planar degree radius (oracle-exact);
    ``'haversine'`` a geodesic metre radius.
    """

    def __init__(self, pois_ref, radius: float, metric: str = "sqdeg", keep_cols: tuple[str, ...] | None = None):
        import ray

        pois = ray.get(pois_ref) if not isinstance(pois_ref, dict) else pois_ref
        self.radius = radius
        self.metric = metric
        self.keep_cols = keep_cols
        self.poi_id = np.asarray(pois["poi_id"], dtype=np.int64)
        self.poi_lon = np.asarray(pois["lon"], dtype=np.float64)
        self.poi_lat = np.asarray(pois["lat"], dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = _np(batch["lon"])
        lat = _np(batch["lat"])
        if self.metric == "sqdeg":
            dlon = lon[:, None] - self.poi_lon[None, :]
            dlat = lat[:, None] - self.poi_lat[None, :]
            mask = (dlon * dlon + dlat * dlat) <= self.radius * self.radius
        else:
            mask = geometry.haversine_m(lon[:, None], lat[:, None], self.poi_lon[None, :], self.poi_lat[None, :]) <= self.radius
        rows, pois_idx = np.nonzero(mask)
        keep = list(self.keep_cols) if self.keep_cols else [c for c in batch.column_names]
        out = batch.select(keep).take(pa.array(rows))
        out = out.append_column("poi_id", pa.array(self.poi_id[pois_idx], type=pa.int64()))
        return out
