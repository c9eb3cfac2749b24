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

import zlib

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
    batch: pa.Table,
    zooms: tuple[int, ...],
    key_cols: tuple[str, ...],
    lon_col: str = "lon",
    lat_col: str = "lat",
    with_quadkey: bool = True,
) -> pa.Table:
    """Fan a point out to one row per zoom level (the tiling explode).

    Reference analogue: the cells-x-tags flatMap of ``toBBTag`` (M8,
    ProcessingUtilities.scala:33-43).  Output: key_cols + (z, x, y[, quadkey]).
    Skip the quadkey when the consumer only groups by (z, x, y) — string
    materialization for shuffle keys is wasted bytes.
    """
    lon = _np(batch[lon_col])
    lat = _np(batch[lat_col])
    parts = []
    xy = tiles.tile_xy_multi(lon, lat, zooms)  # one trig pass, exact shifts
    for z in zooms:
        x, y = xy[z]
        cols = {k: batch[k] for k in key_cols}
        cols["z"] = pa.array(np.full(len(x), z, dtype=np.int32))
        cols["x"] = pa.array(x, type=pa.int64())
        cols["y"] = pa.array(y, type=pa.int64())
        if with_quadkey:
            cols["quadkey"] = pa.array(tiles.tile_quadkey(x, y, z), type=pa.string())
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def tile_count_partial(
    batch: pa.Table, zooms: tuple[int, ...], lon_col: str = "lon", lat_col: str = "lat"
) -> pa.Table:
    """Map-side combiner for the tile histogram: per-batch (z, x, y)
    partial counts.  Shrinks the shuffle from one row per (point, zoom)
    to one row per touched tile per batch (10-100x less exchange) — the
    'pre-aggregate inside map_batches before a groupby' scale pattern.
    Downstream: ``groupby(z,x,y).aggregate(Sum("n_images"))``.
    """
    lon = _np(batch[lon_col])
    lat = _np(batch[lat_col])
    zs, xs, ys, ns = [], [], [], []
    xy = tiles.tile_xy_multi(lon, lat, zooms)  # one trig pass, exact shifts
    for z in zooms:
        x, y = xy[z]
        key = (x << np.int64(32)) | y
        u, c = np.unique(key, return_counts=True)
        zs.append(np.full(len(u), z, dtype=np.int32))
        xs.append(u >> np.int64(32))
        ys.append(u & np.int64(0xFFFFFFFF))
        ns.append(c.astype(np.int64))
    return pa.table(
        {
            "z": pa.array(np.concatenate(zs)),
            "x": pa.array(np.concatenate(xs), type=pa.int64()),
            "y": pa.array(np.concatenate(ys), type=pa.int64()),
            "n_images": pa.array(np.concatenate(ns), type=pa.int64()),
        }
    )


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
        keep = list(self.keep_cols) if self.keep_cols is not None else list(batch.column_names)
        out = batch.select(keep).take(pa.array(pt_idx))
        out = out.append_column("rel_id", pa.array(self._rel_ids[poly_idx], type=pa.int64()))
        out = out.append_column("admin_level", pa.array(self._levels[poly_idx], type=pa.int32()))
        out = out.append_column("admin_name", pa.array(self._names[poly_idx], type=pa.string()))
        return out


class PiPAntiJoinActor:
    """Actor-pool stage: the LEFT-ANTI complement of PiPJoinActor —
    points contained by NO boundary polygon (coverage-gap QA: the rows
    the reference's inner-join drop semantics silently discard,
    WayFlow.scala:38, surfaced as their own stream).  Same broadcast
    index, same half-open edge semantics; emits input columns only."""

    def __init__(self, index_ref, keep_cols: tuple[str, ...] | None = None):
        import ray

        self.index: PolygonIndex = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = _np(batch["lon"])
        lat = _np(batch["lat"])
        pt_idx, _ = self.index.query(lon, lat)
        covered = np.zeros(batch.num_rows, dtype=bool)
        covered[pt_idx] = True
        keep = list(self.keep_cols) if self.keep_cols is not None else list(batch.column_names)
        return batch.select(keep).filter(pa.array(~covered))


def _knn_grid_precision_for(poi_lon: np.ndarray, poi_lat: np.ndarray, m: int) -> int:
    """Grid precision so the POI bbox holds ~1 POI per cell (shared by
    the single-process build, the parallel build, and the shuffle
    plan's sizing rule)."""
    lon0, lon1 = float(poi_lon.min()), float(poi_lon.max())
    lat0, lat1 = float(poi_lat.min()), float(poi_lat.max())
    p = 4
    for p in range(4, cells.MAX_PRECISION):
        n_cells = max(1, int((lon1 - lon0) / 360.0 * (1 << p))) * max(1, int((lat1 - lat0) / 180.0 * (1 << p)))
        if n_cells >= m:
            break
    return p


def _pack_knn_strip(
    poi_lon: np.ndarray,
    poi_lat: np.ndarray,
    k: int,
    p: int,
    cx_lo: int | None = None,
    cx_hi: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FULLY VECTORIZED kNN grid pack for the cells whose x-coordinate
    lies in [cx_lo, cx_hi) (defaults: the whole POI bbox).  The round-3
    per-cell Python loop cost ~450 us/cell — 450 s at 10^6 POIs, which
    made the broadcast kNN plan die on BUILD time, not probe time
    (measured: SCALE.md kNN crossover).  Three stages, array ops only:
      A. minimal ring radius per cell via a summed-area table of POI
         counts (one O(strip) pass per radius step);
      B. exact k-th center distance per cell via one grouped gather +
         one lexsort over the ring candidates;
      C. final gather at the per-cell needed radius + exact
         center-distance filter, packed into the (gcells, goffs,
         gcand) searchsorted layout ``to_state`` ships.
    Candidate lists are supersets of the round-3 build's (identical
    center rule, identical provable cover); the probe re-ranks exactly,
    so query results are unchanged.  Neighbor gathers read the FULL POI
    table, so disjoint strips concatenate into exactly the one-process
    result — the property ``build_knn_state`` uses to parallelize.
    Memory stays O(m + strip candidates)."""
    m = len(poi_lon)
    sx = 360.0 / (1 << p)
    sy = 180.0 / (1 << p)
    diag = float(np.hypot(sx, sy))
    min_s = min(sx, sy)

    px, py = cells.lonlat_to_xy(poi_lon, poi_lat, p)
    x0, x1 = int(px.min()), int(px.max())
    y0, y1 = int(py.min()), int(py.max())
    nx, ny = x1 - x0 + 1, y1 - y0 + 1
    rx, ry = px - x0, py - y0
    cx_lo = 0 if cx_lo is None else max(0, int(cx_lo))
    cx_hi = nx if cx_hi is None else min(nx, int(cx_hi))

    # POI bucket table over the dense linear key (row-major x*ny+y)
    lin = rx * ny + ry
    order = np.argsort(lin, kind="stable")
    sl = lin[order]
    uk, sstarts = np.unique(sl, return_index=True)
    sends = np.append(sstarts[1:], m)

    # summed-area table of per-cell POI counts (1-padded)
    C = np.zeros((ny + 1, nx + 1), dtype=np.int64)
    np.add.at(C, (ry + 1, rx + 1), 1)
    S = C.cumsum(0).cumsum(1)

    def rect_count(cx: np.ndarray, cy: np.ndarray, r: int) -> np.ndarray:
        xa = np.clip(cx - r, 0, nx)
        xb = np.clip(cx + r + 1, 0, nx)
        ya = np.clip(cy - r, 0, ny)
        yb = np.clip(cy + r + 1, 0, ny)
        return S[yb, xb] - S[ya, xb] - S[yb, xa] + S[ya, xa]

    # the strip's cells, rel coords + exact centers
    gx = np.repeat(np.arange(cx_lo, cx_hi, dtype=np.int64), ny)
    gy = np.tile(np.arange(ny, dtype=np.int64), cx_hi - cx_lo)
    n_cells = (cx_hi - cx_lo) * ny
    if n_cells == 0:
        z = np.empty(0, np.int64)
        return z, np.zeros(1, dtype=np.int64), z
    code = cells.interleave(gx + x0, gy + y0)
    clon, clat = cells.decode_center(code, p)

    # A: minimal r with >= k POIs in the (2r+1)^2 window
    r_min = np.zeros(n_cells, dtype=np.int64)
    active = np.ones(n_cells, dtype=bool)
    r = 0
    r_cap = max(nx, ny)
    while active.any() and r <= r_cap:
        idx = np.nonzero(active)[0]
        done = rect_count(gx[idx], gy[idx], r) >= k
        r_min[idx[done]] = r
        active[idx[done]] = False
        r += 1

    def gather(cell_idx: np.ndarray, rad: np.ndarray):
        """All POIs in each cell's (2r+1)^2 window -> (cell_row,
        poi_bucket_pos) pairs, chunked so intermediates stay small.
        cell_row indexes into cell_idx."""
        out_cells: list[np.ndarray] = []
        out_pos: list[np.ndarray] = []
        for rv in np.unique(rad):
            rows = np.nonzero(rad == rv)[0]
            w = 2 * int(rv) + 1
            chunk = max(1, int(1e7) // (w * w))
            for s0 in range(0, len(rows), chunk):
                sub = rows[s0 : s0 + chunk]
                ci = cell_idx[sub]
                dx = np.arange(-int(rv), int(rv) + 1, dtype=np.int64)
                kx = gx[ci][:, None, None] + dx[None, :, None]
                ky = gy[ci][:, None, None] + dx[None, None, :]
                valid = (kx >= 0) & (kx < nx) & (ky >= 0) & (ky < ny)
                lin_n = (kx * ny + ky).ravel()
                v = valid.ravel()
                pos = np.searchsorted(uk, lin_n)
                pos_c = np.minimum(pos, max(len(uk) - 1, 0))
                hit = v & (uk[pos_c] == lin_n)
                st = np.where(hit, sstarts[pos_c], 0)
                cnt = np.where(hit, sends[pos_c] - sstarts[pos_c], 0)
                tot = int(cnt.sum())
                if tot == 0:
                    continue
                base = np.cumsum(cnt) - cnt
                expand = np.arange(tot, dtype=np.int64) - np.repeat(base, cnt)
                out_pos.append(np.repeat(st, cnt) + expand)
                rowbase = np.repeat(sub, w * w)  # aligned with lin_n
                out_cells.append(np.repeat(rowbase, cnt))
        if not out_pos:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_cells), np.concatenate(out_pos)

    # B: exact k-th center distance over the minimal-ring candidates
    crow, cpos = gather(np.arange(n_cells, dtype=np.int64), r_min)
    pidx = order[cpos]
    d2 = (poi_lon[pidx] - clon[crow]) ** 2 + (poi_lat[pidx] - clat[crow]) ** 2
    so = np.lexsort((d2, crow))
    seg_cells, seg_starts = np.unique(crow[so], return_index=True)
    # stage A guarantees >= k candidates per cell
    rk = np.sqrt(d2[so][seg_starts + (k - 1)])
    rk_all = np.empty(n_cells, dtype=np.float64)
    rk_all[seg_cells] = rk

    # C: regather at the needed radius, exact filter, pack
    lim = rk_all + diag
    r_need = np.maximum(np.ceil(lim / min_s).astype(np.int64) + 1, r_min)
    crow, cpos = gather(np.arange(n_cells, dtype=np.int64), r_need)
    pidx = order[cpos]
    d2 = (poi_lon[pidx] - clon[crow]) ** 2 + (poi_lat[pidx] - clat[crow]) ** 2
    keep = d2 <= lim[crow] * lim[crow]
    crow = crow[keep]
    pidx = pidx[keep]
    # pack sorted by Morton cell code (the probe's searchsorted key)
    kc = code[crow]
    so = np.argsort(kc, kind="stable")
    gcand = pidx[so].astype(np.int64)
    gcells, counts = np.unique(kc[so], return_counts=True)
    goffs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])
    return gcells, goffs, gcand


def build_knn_state(
    pois: dict, k: int = 3, metric: str = "sqdeg", n_tasks: int | None = None
) -> dict:
    """Driver API: build the packed kNN grid state, DATA-PARALLEL over
    x-strips of the cell cover when ``n_tasks > 1`` — the index build
    itself is a data-parallel job (each Ray task packs a disjoint strip
    against the shared full POI table, one ``ray.put``), which is what
    keeps the broadcast plan's build wall-time flat as the POI side
    grows (measured: SCALE.md kNN crossover — the single-process build
    was the broadcast plan's real ceiling, not the probe).

    Strips concatenate by global Morton order into exactly the
    one-process result; the returned dict is ``KnnJoinActor``-restorable
    (pass it, or its ObjectRef, as ``pois_ref``)."""
    import ray

    poi_id = np.asarray(pois["poi_id"], dtype=np.int64)
    poi_lon = np.asarray(pois["lon"], dtype=np.float64)
    poi_lat = np.asarray(pois["lat"], dtype=np.float64)
    m = len(poi_id)
    if metric != "sqdeg" or m <= 2 * k:
        raise ValueError("build_knn_state requires the sqdeg grid regime (m > 2k)")
    p = _knn_grid_precision_for(poi_lon, poi_lat, m)

    if n_tasks is None:
        n_tasks = 1 if m < 200_000 else 16
    px, _ = cells.lonlat_to_xy(poi_lon, poi_lat, p)
    x0, x1 = int(px.min()), int(px.max())
    nx = x1 - x0 + 1
    n_tasks = max(1, min(int(n_tasks), nx))

    if n_tasks == 1 or not ray.is_initialized():
        gcells, goffs, gcand = _pack_knn_strip(poi_lon, poi_lat, min(k, m), p)
    else:
        lon_ref = ray.put(poi_lon)
        lat_ref = ray.put(poi_lat)

        @ray.remote(num_cpus=1)
        def strip(lo: int, hi: int, lon, lat):
            return _pack_knn_strip(lon, lat, min(k, m), p, cx_lo=lo, cx_hi=hi)

        bounds = np.linspace(0, nx, n_tasks + 1).astype(np.int64)
        # refs passed as CALL arguments so Ray resolves them in-task
        parts = ray.get(
            [strip.remote(int(bounds[i]), int(bounds[i + 1]), lon_ref, lat_ref) for i in range(n_tasks)]
        )
        parts = [t for t in parts if len(t[0])]
        all_cells = np.concatenate([t[0] for t in parts])
        all_counts = np.concatenate([np.diff(t[1]) for t in parts])
        all_cand = np.concatenate([t[2] for t in parts])
        # strips are cx-contiguous but Morton order interleaves x/y —
        # merge segments into one globally sorted packed layout
        seg_order = np.argsort(all_cells, kind="stable")
        seg_starts = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(all_counts)])[:-1]
        tot = int(all_counts.sum())
        take_cnt = all_counts[seg_order]
        base = np.cumsum(take_cnt) - take_cnt
        expand = np.arange(tot, dtype=np.int64) - np.repeat(base, take_cnt)
        gcand = all_cand[np.repeat(seg_starts[seg_order], take_cnt) + expand]
        gcells = all_cells[seg_order]
        goffs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(take_cnt)])

    # centered float32 GEMM companions (the brute/fallback path state)
    c = (float(poi_lon.mean()), float(poi_lat.mean())) if m else (0.0, 0.0)
    cpx = poi_lon - c[0]
    cpy = poi_lat - c[1]
    p4 = np.stack([-2.0 * cpx, -2.0 * cpy, np.ones_like(cpx), cpx**2 + cpy**2]).astype(np.float32)
    return {
        "state_k": k,
        "metric": metric,
        "poi_id": poi_id,
        "lon": poi_lon,
        "lat": poi_lat,
        "c": c,
        "P4": p4,
        "grid_p": p,
        "gcells": gcells,
        "goffs": goffs,
        "gcand": gcand,
    }


class KnnJoinActor:
    """Actor-pool stage: k-nearest-POI join against a broadcast POI set.

    Rebuild of the 'nearby' grouped-substream join (J7,
    Queries.scala:211-262).  Two execution modes, both exact:

    - ``grid`` (default for the planar metric): a per-cell candidate
      index built once in ``__init__`` — for every Morton cell touching
      the POI bbox, the POIs within ``r_k(cell center) + cell diagonal``
      are precomputed, which provably contains the true top-k for every
      point in the cell.  Probing groups the batch by cell and ranks
      each point against its cell's ~k..50 candidates (float64, the
      same polynomial form as the SQL oracle).  This replaces the dense
      (batch x m) distance matrix — the brute-force kernel is
      memory-bandwidth-bound and collapses under many-core contention.
    - ``brute``: fused float32 GEMM candidates + float64 re-rank
      (fallback for points outside the grid, tiny POI sets, and the
      haversine metric).

    Ties broken by poi_id.  ``metric='sqdeg'`` (planar squared degrees,
    bit-reproducible against the SQL oracle) or ``'haversine'``
    (geodesic metres, reference GeoCalculator.orthodromicDistance).
    """

    def __init__(self, pois_ref, k: int = 3, metric: str = "sqdeg", keep_cols: tuple[str, ...] | None = None):
        import ray

        pois = ray.get(pois_ref) if not isinstance(pois_ref, dict) else pois_ref
        self.k = k
        self.metric = metric
        self.keep_cols = keep_cols
        if "state_k" in pois:
            # PREBUILT index state (build once on the driver, ray.put the
            # BUILT structure): restoring is an O(1) attribute bind over
            # the shared-memory arrays instead of an O(m) per-actor grid
            # rebuild — at 10^6+ POIs the duplicated build is what kills
            # the broadcast plan (measured: SCALE.md kNN crossover).
            if k > pois["state_k"]:
                raise ValueError(f"prebuilt kNN state covers k <= {pois['state_k']}, got {k}")
            if metric != pois["metric"]:
                raise ValueError("prebuilt kNN state metric mismatch")
            self.poi_id = pois["poi_id"]
            self.poi_lon = pois["lon"]
            self.poi_lat = pois["lat"]
            self._c = pois["c"]
            self._P4 = pois["P4"]
            self._grid_p = pois["grid_p"]
            self._gcells = pois["gcells"]
            self._goffs = pois["goffs"]
            self._gcand = pois["gcand"]
            self._grid = "packed"
            return
        self.poi_id = np.asarray(pois["poi_id"], dtype=np.int64)
        self.poi_lon = np.asarray(pois["lon"], dtype=np.float64)
        self.poi_lat = np.asarray(pois["lat"], dtype=np.float64)
        # Fused GEMM candidate metric in float32 over CENTERED coords
        # (translation kills the x^2 ~ 2700 cancellation that would
        # otherwise inflate float32 error to ~1e-4):
        #   d = [cx, cy, cx^2+cy^2, 1] @ [-2cpx, -2cpy, 1, cpx^2+cpy^2]^T
        # One BLAS call, one (n, m) float32 output — the kernel is
        # memory-bandwidth-bound under many-core contention, so halving
        # bytes and eliminating broadcast passes is the scaling lever.
        # Exactness is restored by a float64 re-rank of k+slack
        # candidates using the SAME polynomial form as the SQL oracle.
        self._c = (float(self.poi_lon.mean()), float(self.poi_lat.mean())) if len(self.poi_lon) else (0.0, 0.0)
        cpx = self.poi_lon - self._c[0]
        cpy = self.poi_lat - self._c[1]
        self._P4 = np.stack([-2.0 * cpx, -2.0 * cpy, np.ones_like(cpx), cpx**2 + cpy**2]).astype(np.float32)
        self._grid = None
        if metric == "sqdeg" and len(self.poi_id) > 2 * k:
            self._build_grid()

    def _build_grid(self) -> None:
        """Per-cell candidate index: precision chosen so the POI bbox
        holds roughly one POI per cell; each cell's candidate list =
        POIs within (k-th NN distance of cell center + cell diagonal),
        a radius that provably covers the top-k of every interior point.
        Delegates to the vectorized strip packer (full x-range);
        ``build_knn_state`` fans the same packer out over Ray tasks."""
        m = len(self.poi_id)
        p = _knn_grid_precision_for(self.poi_lon, self.poi_lat, m)
        self._grid_p = p
        self._gcells, self._goffs, self._gcand = _pack_knn_strip(
            self.poi_lon, self.poi_lat, min(self.k, m), p
        )
        self._grid = "packed"

    def to_state(self) -> dict:
        """Serialize the BUILT grid index into flat arrays for one
        ``ray.put`` (a dict of ~m tiny arrays pickles pathologically;
        three packed arrays ship zero-copy).  Restorable by passing the
        state dict (or its ObjectRef) as ``pois_ref`` — valid for any
        ``k' <= k`` (candidate lists are supersets of smaller top-k)."""
        if self._grid is None:
            raise ValueError("to_state requires a built grid index")
        if isinstance(self._grid, dict):  # legacy dict layout (tests)
            n_cells = len(self._grid)
            gcells = np.fromiter(self._grid.keys(), dtype=np.int64, count=n_cells)
            order = np.argsort(gcells)
            gcells = gcells[order]
            lists = list(self._grid.values())
            lens = np.array([len(lists[i]) for i in order], dtype=np.int64)
            goffs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)])
            gcand = (
                np.concatenate([lists[i] for i in order]).astype(np.int64)
                if n_cells
                else np.empty(0, np.int64)
            )
        else:
            gcells, goffs, gcand = self._gcells, self._goffs, self._gcand
        return {
            "state_k": self.k,
            "metric": self.metric,
            "poi_id": self.poi_id,
            "lon": self.poi_lon,
            "lat": self.poi_lat,
            "c": self._c,
            "P4": self._P4,
            "grid_p": self._grid_p,
            "gcells": gcells,
            "goffs": goffs,
            "gcand": gcand,
        }

    def _grid_lookup(self, c: int):
        if isinstance(self._grid, dict):
            return self._grid.get(c)
        j = int(np.searchsorted(self._gcells, c))
        if j < len(self._gcells) and self._gcells[j] == c:
            return self._gcand[self._goffs[j] : self._goffs[j + 1]]
        return None

    def _dists_approx(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Candidate distances: one float32 GEMM (abs. error ~1e-6 deg^2)."""
        if self.metric != "sqdeg":
            return geometry.haversine_m(lon[:, None], lat[:, None], self.poi_lon[None, :], self.poi_lat[None, :])
        cx = lon - self._c[0]
        cy = lat - self._c[1]
        xy4 = np.empty((len(lon), 4), dtype=np.float32)
        xy4[:, 0] = cx
        xy4[:, 1] = cy
        xy4[:, 2] = cx * cx + cy * cy
        xy4[:, 3] = 1.0
        return xy4 @ self._P4  # (n, m) float32 GEMM

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = _np(batch["lon"])
        lat = _np(batch["lat"])
        n = len(lon)
        m = len(self.poi_id)
        k = min(self.k, m)
        out_poi = np.empty((n, k), dtype=np.int64)

        def rank_subset(pts_idx: np.ndarray, cand: np.ndarray) -> None:
            """Exact float64 top-k of ``pts_idx`` against POI indices
            ``cand`` (ties by poi_id), written into ``out_poi``."""
            nn = len(pts_idx)
            mc = len(cand)
            dlon = lon[pts_idx][:, None] - self.poi_lon[cand][None, :]
            dlat = lat[pts_idx][:, None] - self.poi_lat[cand][None, :]
            d = dlon * dlon + dlat * dlat
            ids_all = self.poi_id[cand]
            rows = np.repeat(np.arange(nn), mc)
            # per-row order by (distance, poi_id); order holds raveled
            # positions, % mc recovers the candidate column
            order = np.lexsort((np.tile(ids_all, nn), d.ravel(), rows)).reshape(nn, mc)[:, :k]
            out_poi[pts_idx] = ids_all[order % mc]

        if self._grid is not None and self.metric == "sqdeg":
            cell = cells.encode(lon, lat, self._grid_p)
            order = np.argsort(cell, kind="stable")
            sc = cell[order]
            uniq, starts = np.unique(sc, return_index=True)
            bounds = np.append(starts, n)
            miss: list[np.ndarray] = []
            for i in range(len(uniq)):
                pts_idx = order[starts[i] : bounds[i + 1]]
                cand = self._grid_lookup(int(uniq[i]))
                if cand is None:
                    miss.append(pts_idx)
                else:
                    rank_subset(pts_idx, cand)
            if miss:
                rank_subset(np.concatenate(miss), np.arange(m))
        elif self.metric == "sqdeg":
            kk = min(k + 8, m)  # slack covers float32 candidate error
            d = self._dists_approx(lon, lat)
            cand = np.argpartition(d, kk - 1, axis=1)[:, :kk] if kk < m else np.tile(np.arange(m), (n, 1))
            dlon = lon[:, None] - self.poi_lon[cand]
            dlat = lat[:, None] - self.poi_lat[cand]
            d_c = dlon * dlon + dlat * dlat
            id_c = self.poi_id[cand]
            rows_kk = np.repeat(np.arange(n), cand.shape[1])
            sel = np.lexsort((id_c.ravel(), d_c.ravel(), rows_kk)).reshape(n, cand.shape[1])[:, :k]
            out_poi[:] = id_c.ravel()[sel.ravel()].reshape(n, k)
        else:
            d = self._dists_approx(lon, lat)
            kk = min(k + 8, m)  # slack so exact ties at the k-th position break by poi_id
            cand = np.argpartition(d, kk - 1, axis=1)[:, :kk] if kk < m else np.tile(np.arange(m), (n, 1))
            d_c = np.take_along_axis(d, cand, axis=1)
            id_c = self.poi_id[cand]
            rows_kk = np.repeat(np.arange(n), cand.shape[1])
            sel = np.lexsort((id_c.ravel(), d_c.ravel(), rows_kk)).reshape(n, cand.shape[1])[:, :k]
            out_poi[:] = id_c.ravel()[sel.ravel()].reshape(n, k)

        rows = np.repeat(np.arange(n), k)
        keep = list(self.keep_cols) if self.keep_cols is not None else list(batch.column_names)
        rank_col = pa.array(np.tile(np.arange(1, k + 1), n), type=pa.int32())
        poi_col = pa.array(out_poi.ravel(), type=pa.int64())
        if not keep:
            return pa.table({"rank": rank_col, "poi_id": poi_col})
        out = batch.select(keep).take(pa.array(rows))
        out = out.append_column("rank", rank_col)
        return out.append_column("poi_id", poi_col)


class FlagshipFusedActor:
    """Fused flagship stage: cell-encode + PiP join + kNN attach + tile
    assign + per-batch partial (z, x, y, rel_id) counts in ONE actor.

    Operator fusion is the bandwidth lever on this DAG: the composable
    four-stage pipeline rewrites every block three times and runs two
    actor pools; fused, each input block is read once and only partial
    tile counts (a few KB) leave the stage, so the trailing groupby is
    trivial.  Results are identical to the composed pipeline (asserted
    in tests).  Downstream: groupby(z,x,y,rel_id).aggregate(Sum("n_images")).
    """

    def __init__(self, index_ref, pois_ref, k: int = 1, z: int = 10):
        import ray

        self.pip = PiPJoinActor(index_ref, keep_cols=("lon", "lat"))
        pois = ray.get(pois_ref) if not isinstance(pois_ref, dict) else pois_ref
        self.knn = KnnJoinActor(pois, k=k, metric="sqdeg", keep_cols=())
        self.z = z

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = _np(batch["lon"])
        lat = _np(batch["lat"])
        pt_idx, poly_idx = self.pip.index.query(lon, lat)
        rel = self.pip._rel_ids[poly_idx]
        jlon = lon[pt_idx]
        jlat = lat[pt_idx]
        # nearest POI per joined row (k=1): reuse the grid index directly
        sub = pa.table({"lon": pa.array(jlon), "lat": pa.array(jlat)})
        knn_out = self.knn(sub)  # rank/poi_id columns; order preserved per input row
        x, y = tiles.tile_xy(jlon, jlat, self.z)
        u, c = _unique_tile_rel(x, y, rel)
        return pa.table(
            {
                "z": pa.array(np.full(u.shape[0], self.z, dtype=np.int32)),
                "x": pa.array(u[:, 0], type=pa.int64()),
                "y": pa.array(u[:, 1], type=pa.int64()),
                "rel_id": pa.array(u[:, 2], type=pa.int64()),
                "n_images": pa.array(c.astype(np.int64)),
            }
        )


def _unique_tile_rel(x: np.ndarray, y: np.ndarray, rel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """unique (x, y, rel_id) rows + counts — row-wise np.unique instead of
    bit packing, which silently truncated real-world rel_ids >= 2^16."""
    stacked = np.column_stack([x, y, rel]).astype(np.int64)
    return np.unique(stacked, axis=0, return_counts=True)


# Per-worker-process kernel cache for task-based stateful stages.  An
# actor pool pays a fresh process spawn + import (~1-2 s each) per
# actor; when the state is SMALL (an index handle resolved from the
# object store), running as stateless tasks in the prestarted worker
# pool and memoizing the built kernel per process gives the same
# amortization with zero spin-up.  Heavy state (models, big indexes)
# should still use actor pools.
_WORKER_KERNELS: dict = {}


def fused_flagship_fn(batch: pa.Table, index_ref=None, pois_ref=None, k: int = 1, z: int = 10) -> pa.Table:
    key = (
        "flagship",
        getattr(index_ref, "hex", lambda: id(index_ref))(),
        getattr(pois_ref, "hex", lambda: id(pois_ref))(),
        k,
        z,
    )
    kern = _WORKER_KERNELS.get(key)
    if kern is None:
        kern = FlagshipFusedActor(index_ref, pois_ref, k=k, z=z)
        _WORKER_KERNELS[key] = kern
    return kern(batch)


def pip_join_fn(batch: pa.Table, index_ref=None, keep_cols=None) -> pa.Table:
    key = ("pip", getattr(index_ref, "hex", lambda: id(index_ref))(), keep_cols)
    kern = _WORKER_KERNELS.get(key)
    if kern is None:
        kern = PiPJoinActor(index_ref, keep_cols=keep_cols)
        _WORKER_KERNELS[key] = kern
    return kern(batch)


def knn_join_fn(batch: pa.Table, pois_ref=None, k: int = 3, metric: str = "sqdeg", keep_cols=None) -> pa.Table:
    key = ("knn", getattr(pois_ref, "hex", lambda: id(pois_ref))(), k, metric, keep_cols)
    kern = _WORKER_KERNELS.get(key)
    if kern is None:
        kern = KnnJoinActor(pois_ref, k=k, metric=metric, keep_cols=keep_cols)
        _WORKER_KERNELS[key] = kern
    return kern(batch)


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
            # fused float32 GEMM candidate pass over centered coords
            # (see KnnJoinActor), slack margin, exact float64 verify
            c0 = float(self.poi_lon.mean()) if len(self.poi_lon) else 0.0
            c1 = float(self.poi_lat.mean()) if len(self.poi_lat) else 0.0
            cpx = self.poi_lon - c0
            cpy = self.poi_lat - c1
            cx = lon - c0
            cy = lat - c1
            xy4 = np.empty((len(lon), 4), dtype=np.float32)
            xy4[:, 0] = cx
            xy4[:, 1] = cy
            xy4[:, 2] = cx * cx + cy * cy
            xy4[:, 3] = 1.0
            P4 = np.stack([-2.0 * cpx, -2.0 * cpy, np.ones_like(cpx), cpx**2 + cpy**2]).astype(np.float32)
            d = xy4 @ P4
            r2 = self.radius * self.radius
            rows, pois_idx = np.nonzero(d <= np.float32(r2 + 1e-4 * max(r2, 1.0)))
            dlon = lon[rows] - self.poi_lon[pois_idx]
            dlat = lat[rows] - self.poi_lat[pois_idx]
            exact = dlon * dlon + dlat * dlat <= r2
            rows, pois_idx = rows[exact], pois_idx[exact]
        else:
            mask = geometry.haversine_m(lon[:, None], lat[:, None], self.poi_lon[None, :], self.poi_lat[None, :]) <= self.radius
            rows, pois_idx = np.nonzero(mask)
        keep = list(self.keep_cols) if self.keep_cols is not None else list(batch.column_names)
        out = batch.select(keep).take(pa.array(rows))
        out = out.append_column("poi_id", pa.array(self.poi_id[pois_idx], type=pa.int64()))
        return out


def _binary_views(col) -> list:
    """Zero-copy per-row memoryviews over an Arrow binary column
    (ChunkedArray or Array).  ``to_pylist()`` copies every value into a
    Python bytes object; the decoders downstream accept any buffer, so
    slicing the Arrow data buffer directly avoids re-streaming the
    whole payload column through DRAM once per batch."""
    import pyarrow as _pa

    chunks = col.chunks if isinstance(col, _pa.ChunkedArray) else [col]
    out: list = []
    for ch in chunks:
        bufs = ch.buffers()
        if (
            len(bufs) != 3
            or bufs[2] is None
            or not _pa.types.is_binary(ch.type)
            or ch.null_count
        ):
            # fallback: unexpected layout, or nulls present — a null
            # slot sliced from the data buffer would read as b'' and
            # silently turn "missing payload" into "zero-byte payload";
            # to_pylist() keeps the None semantics
            out.extend(ch.to_pylist())
            continue
        offs = np.frombuffer(bufs[1], dtype=np.int32)[ch.offset : ch.offset + len(ch) + 1]
        data = memoryview(bufs[2])
        out.extend(data[offs[j] : offs[j + 1]] for j in range(len(ch)))
    return out


class ImageFlagshipFusedActor:
    """Fused IMAGE flagship (the north-star pipeline shape): decode the
    image payload, verify its perceptual hash, derive the geo-tag,
    point-in-polygon join against the broadcast boundary index, nearest-
    POI attach, slippy-tile assign, per-batch partial (z,x,y,rel_id)
    counts.  One pass over each input block; only partial aggregates
    leave the stage.  Decode + hashing make the stage ALU-dense, so it
    scales with cores rather than memory bandwidth.
    """

    def __init__(self, index_ref, pois_ref, z: int = 10, check_reference: bool = True):
        import ray

        from .. import codecs as _codecs

        self.codecs = _codecs
        self.pip = PiPJoinActor(index_ref, keep_cols=())
        pois = ray.get(pois_ref) if not isinstance(pois_ref, dict) else pois_ref
        self.knn = KnnJoinActor(pois, k=1, metric="sqdeg", keep_cols=())
        self.z = z
        self.check_reference = check_reference

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .. import fixtures

        n = batch.num_rows
        ids = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 16), pa.int64()).to_numpy()
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        ph = batch["phash"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        # ZERO-COPY payload views: to_pylist() would copy every payload
        # byte into a fresh Python bytes object — at bench scale that is
        # the single largest avoidable DRAM stream in this kernel (the
        # decoders accept any buffer: np.frombuffer / zlib.decompress)
        payloads = _binary_views(batch["bytes"])
        # stored-digest verification (production checksum discipline):
        # when the corpus carries ref_crc (crc32 of the reference pixel
        # bytes), a lossless row's "decoded == reference" check is a
        # 768-byte crc over the decoded pixels against the stored
        # digest — the float64 reference REGENERATION (~40 KB of DRAM
        # traffic per 768 B image, the 32-cpu leg's dominant stream)
        # only runs for lossy rows, which still do the live PSNR gate.
        ref_crc = (
            batch["ref_crc"].to_numpy() if "ref_crc" in batch.column_names else None
        )
        # stored lossless master for lossy rows: live PSNR against the
        # STORED original (one zlib inflate, ~1 KB read) instead of a
        # float64 regeneration from the generative seed
        ref_views = (
            _binary_views(batch["ref_bytes"]) if "ref_bytes" in batch.column_names else None
        )
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = self.codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                if self.check_reference and ref_crc is not None and fmts[i] != "qnt8":
                    ok[i] = (zlib.crc32(px) & 0xFFFFFFFF) == (int(ref_crc[i]) & 0xFFFFFFFF)
                elif (
                    self.check_reference
                    and ref_views is not None
                    and fmts[i] == "qnt8"
                    and len(ref_views[i])
                ):
                    ref = np.frombuffer(zlib.decompress(ref_views[i]), dtype=np.uint8).reshape(
                        int(h[i]), int(w[i]), 3
                    )
                    ok[i] = self.codecs.psnr_db(px, ref) >= 40.0
                elif self.check_reference:
                    # full per-row fidelity invariant (driver input_hint):
                    # byte-exact vs reference pixels for lossless formats
                    # (which subsumes the stored-phash check — the column
                    # is derived from these very pixels; FidelityVerify
                    # still checks phash64(px) == phash explicitly, and
                    # that pipeline is oracle-gated), PSNR >= 40 dB for
                    # the lossy one
                    ref = fixtures.reference_pixels_int(int(ids[i]), int(w[i]), int(h[i]))
                    if fmts[i] == "qnt8":
                        ok[i] = self.codecs.psnr_db(px, ref) >= 40.0
                    else:
                        ok[i] = np.array_equal(px, ref)
                else:
                    # no reference available: lossless formats must
                    # reproduce the stored phash exactly
                    ok[i] = fmts[i] == "qnt8" or self.codecs.phash64(px) == ph[i]
            except Exception:  # noqa: BLE001 — data errors drop the row (M9)
                ok[i] = False
        ids = ids[ok]
        lon = fixtures.derive_lon(ids)
        lat = fixtures.derive_lat(ids)
        pt_idx, poly_idx = self.pip.index.query(lon, lat)
        rel = self.pip._rel_ids[poly_idx]
        jlon = lon[pt_idx]
        jlat = lat[pt_idx]
        self.knn(pa.table({"lon": pa.array(jlon), "lat": pa.array(jlat)}))  # nearest-POI attach (aggregated away)
        x, y = tiles.tile_xy(jlon, jlat, self.z)
        u, c = _unique_tile_rel(x, y, rel)
        return pa.table(
            {
                "z": pa.array(np.full(u.shape[0], self.z, dtype=np.int32)),
                "x": pa.array(u[:, 0], type=pa.int64()),
                "y": pa.array(u[:, 1], type=pa.int64()),
                "rel_id": pa.array(u[:, 2], type=pa.int64()),
                "n_images": pa.array(c.astype(np.int64)),
            }
        )


def fused_image_flagship_fn(batch: pa.Table, index_ref=None, pois_ref=None, z: int = 10) -> pa.Table:
    key = (
        "imgflag",
        getattr(index_ref, "hex", lambda: id(index_ref))(),
        getattr(pois_ref, "hex", lambda: id(pois_ref))(),
        z,
    )
    kern = _WORKER_KERNELS.get(key)
    if kern is None:
        kern = ImageFlagshipFusedActor(index_ref, pois_ref, z=z)
        _WORKER_KERNELS[key] = kern
    return kern(batch)
