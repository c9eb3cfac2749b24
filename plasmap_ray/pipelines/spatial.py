"""Spatial pipelines: cell index, tiling, PiP join, kNN — Ray Data DAGs.

Each function takes ``sf_dir`` (a testdata directory) and returns a lazy
``ray.data.Dataset``; nothing here calls ``ray.init``.  Points are
derived deterministically from the ``documents`` table's ``doc_id``
(fixtures.derive_lon/lat) so every pipeline is verifiable against the
DuckDB SQL mirrors in plasmap_ray.oracle.

Scale design notes (10^12-row design point):
- the boundary set and POI set are the SMALL sides: broadcast once via
  ``ray.put``, probed map-side inside actor pools — the point side
  never shuffles for joins;
- the only all-to-all exchanges are the per-tile aggregations, which
  pre-aggregate per batch (combiner) before the groupby and can salt
  hot tiles (stages.geo.add_salt);
- reads prune columns at the source (``columns=[...]``).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from .. import cells, fixtures
from ..stages import geo
from ..stages.common import safe_join

DEFAULT_ZOOMS = (6, 10, 14)


def points_from_documents(sf_dir: str) -> rd.Dataset:
    """documents.doc_id -> (doc_id, lon, lat): the derived point cloud."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    return ds.map_batches(geo.derive_position, batch_format="pyarrow")


def points_from_orders(sf_dir: str) -> rd.Dataset:
    """orders.o_orderkey -> point cloud (larger table for volume tests)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey"])
    return ds.map_batches(functools.partial(geo.derive_position, id_col="o_orderkey"), batch_format="pyarrow")


def cell_index_pipeline(sf_dir: str) -> rd.Dataset:
    """Per-point Morton cell ids at the two reference precisions (M6)."""
    return points_from_documents(sf_dir).map_batches(geo.cell_index, batch_format="pyarrow").select_columns(
        ["doc_id", "cell_low", "cell_verylow"]
    )


def s2_cell_index_pipeline(sf_dir: str) -> rd.Dataset:
    """Per-point S2-style cell ids (face+Hilbert) at fine+coarse levels.

    The H3/S2 leg of the cell-encoding surface: same streaming shape as
    ``cell_index_pipeline`` (map-only, no shuffle), different curve.
    Golden-oracle-checked against a scalar per-point recompute."""
    from .. import s2

    def fn(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        fine = s2.encode(lon, lat, s2.DEFAULT_LEVEL)
        t = t.append_column("s2_cell", pa.array(fine, type=pa.int64()))
        return t.append_column(
            "s2_cell_coarse",
            pa.array(s2.reduce_level(fine, s2.DEFAULT_LEVEL, s2.COARSE_LEVEL), type=pa.int64()),
        )

    return (
        points_from_documents(sf_dir)
        .map_batches(fn, batch_format="pyarrow")
        .select_columns(["doc_id", "s2_cell", "s2_cell_coarse"])
    )


def s2_cell_histogram_pipeline(sf_dir: str) -> rd.Dataset:
    """Counts per coarse S2 cell — the Hilbert-keyed shuffle analogue of
    the Morton tile histogram (contiguous key ranges are spatially
    compact, the property range-partitioned shuffles want)."""
    return (
        s2_cell_index_pipeline(sf_dir)
        .groupby("s2_cell_coarse")
        .aggregate(Count(alias_name="n_points"))
    )


def hex_bin_index_pipeline(sf_dir: str) -> rd.Dataset:
    """Per-point hex-lattice cell ids (the H3-analogue encoding leg).

    Map-only; golden oracle = scalar cube-rounding recompute."""
    from .. import hexgrid

    def fn(t: pa.Table) -> pa.Table:
        cell = hexgrid.encode(
            t["lon"].to_numpy(zero_copy_only=False), t["lat"].to_numpy(zero_copy_only=False)
        )
        return t.append_column("hex_cell", pa.array(cell, type=pa.int64()))

    return (
        points_from_documents(sf_dir)
        .map_batches(fn, batch_format="pyarrow")
        .select_columns(["doc_id", "hex_cell"])
    )


def hex_hot_cells_pipeline(sf_dir: str) -> rd.Dataset:
    """Hex density + ring-1 neighborhood mass — hot-cell detection with
    the isotropic neighborhoods hexes exist for.

    Shuffle shape: per-batch partial counts -> one small groupby;
    the ring sum then SCATTERS each aggregated hex count to its 6
    neighbors (aggregate-sized fan-out, 7x #distinct hexes, never the
    input) and re-groups — union + groupby instead of a self-join, so
    the whole DAG is Dataset-native with no driver materialization.
    Output: (hex_cell, n_points, n_ring1) for hexes that contain
    points; n_ring1 includes the hex's own count.
    """
    from .. import hexgrid

    def partial(t: pa.Table) -> pa.Table:
        cell = hexgrid.encode(
            t["lon"].to_numpy(zero_copy_only=False), t["lat"].to_numpy(zero_copy_only=False)
        )
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table({"hex_cell": pa.array(uniq, type=pa.int64()), "n": pa.array(cnt.astype(np.int64))})

    counts = (
        points_from_documents(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("hex_cell")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # tiny aggregate; reused by both union branches
    )

    def self_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hex_cell": t["hex_cell"],
                "n_points": t["n"],
                "n_ring1": t["n"],
            }
        )

    def scatter(t: pa.Table) -> pa.Table:
        cells_ = t["hex_cell"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        neigh = hexgrid.neighbors(cells_)  # (m, 6)
        return pa.table(
            {
                "hex_cell": pa.array(neigh.ravel(), type=pa.int64()),
                "n_points": pa.array(np.zeros(neigh.size, dtype=np.int64)),
                "n_ring1": pa.array(np.repeat(n, 6).astype(np.int64)),
            }
        )

    both = counts.map_batches(self_rows, batch_format="pyarrow").union(
        counts.map_batches(scatter, batch_format="pyarrow")
    )
    out = both.groupby("hex_cell").aggregate(
        Sum("n_points", alias_name="n_points"), Sum("n_ring1", alias_name="n_ring1")
    )
    return out.filter(expr="n_points > 0")


def tile_assign_pipeline(sf_dir: str, z: int = 12) -> rd.Dataset:
    """Per-point slippy tile assignment at one zoom."""
    return (
        points_from_documents(sf_dir)
        .map_batches(functools.partial(geo.tile_assign, z=z), batch_format="pyarrow")
        .select_columns(["doc_id", "z", "x", "y", "quadkey"])
    )


def tile_histogram_from_points(
    pts: rd.Dataset, zooms: tuple[int, ...] = DEFAULT_ZOOMS, batch_size: int | None = 131072
) -> rd.Dataset:
    """Per-tile counts across zooms via base-zoom partials + roll-up.

    Slippy zooms NEST (parent x = x >> dz), so only the FINEST zoom's
    per-batch partial counts ever shuffle against the input; every
    coarser zoom derives from the base aggregate by shifting tile
    coordinates and re-summing (tiles rows, not input rows).  Versus
    per-zoom partials this cuts the input-side shuffle to 1/len(zooms)
    — the z14 partials dominate because scattered points barely
    compress at fine zooms.  The base aggregate is materialized: union
    branches do not share upstream plans.

    ``batch_size`` sizes the COMBINER's compression: with ~10^4 touched
    base-zoom tiles, a 16k-point batch cannot compress (>=1 partial row
    per point) while a 131k-point batch compresses ~13x — measured
    11.8 s -> 7.5 s at sf0.1/32 cpus.  Scale rule: batch_size >> touched
    tiles per batch, bounded by the per-task heap (a 131k batch is
    ~5 MB).
    """
    z_base = max(zooms)
    partial = pts.map_batches(
        functools.partial(geo.tile_count_partial, zooms=(z_base,)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    base = partial.groupby(["z", "x", "y"]).aggregate(Sum("n_images", alias_name="n_images"))
    if len(set(zooms)) == 1:
        return base  # nothing to roll up; let the caller decide on pinning
    base = base.materialize()
    out = base
    for z in sorted((z for z in zooms if z != z_base), reverse=True):
        dz = z_base - z

        def parent(t: pa.Table, _z=z, _dz=dz) -> pa.Table:
            return pa.table(
                {
                    "z": pa.array(np.full(t.num_rows, _z, dtype=np.int32)),
                    "x": pa.compute.shift_right(t["x"], _dz),
                    "y": pa.compute.shift_right(t["y"], _dz),
                    "n_images": t["n_images"],
                }
            )

        level = (
            base.map_batches(parent, batch_format="pyarrow")
            .groupby(["z", "x", "y"])
            .aggregate(Sum("n_images", alias_name="n_images"))
        )
        out = out.union(level)
    return out


def tile_histogram_pipeline(sf_dir: str, zooms: tuple[int, ...] = DEFAULT_ZOOMS, salted: bool = False) -> rd.Dataset:
    """Per-tile feature counts across zooms (A5) — the tiling aggregate.

    ``salted=True`` runs the two-phase skew-guarded aggregation
    (groupby (tile, salt) then re-aggregate by tile); results are
    identical to the unsalted plan by construction.
    """
    pts = points_from_documents(sf_dir)
    if salted:
        return tile_histogram_salted_from_points(pts, zooms)
    return tile_histogram_from_points(pts, zooms)


def tile_histogram_salted_from_points(
    pts: rd.Dataset, zooms: tuple[int, ...] = DEFAULT_ZOOMS, factor: int = 8
) -> rd.Dataset:
    """Skew-guarded two-phase tile aggregate over an arbitrary point
    Dataset: per-batch (z, x, y, salt) partial counts (map-side
    COMBINER — round-3 fix: the original salted plan shuffled raw
    exploded rows, 6x slower than the combiner plan at sf0.01) ->
    groupby (tile, salt) -> re-aggregate by tile.  Identical output to
    the unsalted plan by construction; the salt bounds any single
    reducer's share of a hot tile to 1/factor of it.

    Measured honesty note (BENCH `tile_histogram_skew*` rows): for
    ALGEBRAIC aggregates the combiner already absorbs single-tile skew
    (each reducer receives one partial per upstream task, not per row),
    so salting buys nothing here — its real target is the
    per-key-ROWS shapes (regroups / holistic aggregates) where no
    combiner exists."""
    from .. import tiles

    def partial(t: pa.Table, _zooms=tuple(zooms), _factor=factor) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        salt = (np.asarray(ids, dtype=np.int64) * np.int64(0x9E3779B1)) % _factor
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        xy = tiles.tile_xy_multi(lon, lat, _zooms)
        zs, xs, ys, ss, ns = [], [], [], [], []
        for z in _zooms:
            x, y = xy[z]
            key = (((x << np.int64(32)) | y) * np.int64(_factor)) + salt
            u, c = np.unique(key, return_counts=True)
            tile = u // _factor
            zs.append(np.full(len(u), z, dtype=np.int32))
            xs.append(tile >> np.int64(32))
            ys.append(tile & np.int64(0xFFFFFFFF))
            ss.append(u % _factor)
            ns.append(c.astype(np.int64))
        return pa.table(
            {
                "z": pa.array(np.concatenate(zs)),
                "x": pa.array(np.concatenate(xs), type=pa.int64()),
                "y": pa.array(np.concatenate(ys), type=pa.int64()),
                "salt": pa.array(np.concatenate(ss), type=pa.int64()),
                "n_images": pa.array(np.concatenate(ns), type=pa.int64()),
            }
        )

    salted = pts.map_batches(partial, batch_format="pyarrow", batch_size=16384)
    phase1 = salted.groupby(["z", "x", "y", "salt"]).aggregate(Sum("n_images", alias_name="n_images"))
    return phase1.groupby(["z", "x", "y"]).aggregate(Sum("n_images", alias_name="n_images"))


def _pyramid_levels(sf_dir: str, z_base: int, z_top: int) -> dict[int, rd.Dataset]:
    """Per-zoom tile-count aggregates z_base..z_top via hierarchical
    roll-up: the input is touched ONCE (base histogram with combiner);
    each coarser zoom shuffles only the previous LEVEL'S AGGREGATE
    (tiles rows, shrinking 4x per step; slippy tiles nest:
    parent (x,y) = (x>>1, y>>1)).

    Every level is MATERIALIZED: Ray Data does not dedupe shared
    upstream plans across branches, so un-cached levels would re-run
    the base scan per consumer.  The levels are tiny aggregates
    (tiles rows), so pinning them is cheap and keeps the
    input-touched-once property true."""
    base = tile_histogram_pipeline(sf_dir, zooms=(z_base,)).materialize()
    levels = {z_base: base}
    cur = base
    for z in range(z_base - 1, z_top - 1, -1):
        def parent(t: pa.Table, _z=z) -> pa.Table:
            # z stays int32 to match the base histogram's schema
            return pa.table(
                {
                    "z": pa.array(np.full(t.num_rows, _z, dtype=np.int32)),
                    "x": pa.compute.shift_right(t["x"], 1),
                    "y": pa.compute.shift_right(t["y"], 1),
                    "n_images": t["n_images"],
                }
            )

        cur = (
            cur.map_batches(parent, batch_format="pyarrow")
            .groupby(["z", "x", "y"])
            .aggregate(Sum("n_images", alias_name="n_images"))
            .materialize()
        )
        levels[z] = cur
    return levels


def tile_pyramid_pipeline(sf_dir: str, z_base: int = 10, z_top: int = 6) -> rd.Dataset:
    """Tile-pyramid roll-up: (z, x, y, n_images) for z_top..z_base,
    derived by the hierarchical aggregation in ``_pyramid_levels``."""
    levels = _pyramid_levels(sf_dir, z_base, z_top)
    out = levels[z_base]
    for z in range(z_base - 1, z_top - 1, -1):
        out = out.union(levels[z])
    return out


QUAD_THRESHOLD = 64  # max points per leaf before a tile splits
_QUAD_PACK = np.int64(1) << np.int64(32)  # (x, y) -> one int64 key


def quadtree_leaves(
    sf_dir: str, z_top: int = 6, z_base: int = 10, threshold: int = QUAD_THRESHOLD
) -> rd.Dataset:
    """Adaptive quadtree partitioning: starting from the ``z_top``
    tiles, split every tile holding more than ``threshold`` points
    until the count fits or ``z_base`` is reached.  The leaf set is a
    complete, non-overlapping cover of the data — the data-dependent
    partition map used to even out skew before a spatial shuffle
    (dense cities get deep small tiles, oceans stay coarse).

    Leaf rule: a tile with data at zoom z is a leaf iff all its
    ancestors in (z_top..z-1] were splitters (count > threshold) and
    it either fits (count <= threshold) or is at z_base.  Every point
    therefore lands in EXACTLY one leaf (Σ leaf counts = N).

    Scale shape: counts come from the pyramid roll-up (input touched
    once; every exchange is tile-bounded).  The top-down walk filters
    each level against the previous level's splitter set, broadcast
    once per level via ``ray.put`` — splitter sets are bounded by the
    occupied-tile count at that zoom (≤4^z), and each take_all() pulls
    only one filtered AGGREGATE level, never input rows.  At planet
    scale with a deep z_base, swap the broadcast set for a hash
    semi-join on the packed parent key — same level-at-a-time walk.

    Output: (z, x, y, n_images) — the leaves.
    """
    levels = _pyramid_levels(sf_dir, z_base, z_top)
    leaves: list[rd.Dataset] = []
    split: frozenset[int] = frozenset()
    for z in range(z_top, z_base + 1):
        lv = levels[z]
        if z == z_top:
            active = lv
        else:
            if not split:
                break
            split_ref = ray.put(split)

            def in_split(t: pa.Table, _ref=split_ref) -> pa.Table:
                ks = ray.get(_ref)
                x = t["x"].to_numpy().astype(np.int64)
                y = t["y"].to_numpy().astype(np.int64)
                pk = (x >> 1) * _QUAD_PACK + (y >> 1)
                mask = np.fromiter((int(k) in ks for k in pk), bool, len(pk))
                return t.filter(pa.array(mask))

            active = lv.map_batches(in_split, batch_format="pyarrow").materialize()
        if z == z_base:
            leaves.append(active)
            break
        leaves.append(active.filter(expr=f"n_images <= {threshold}").materialize())
        split = frozenset(
            int(r["x"]) * int(_QUAD_PACK) + int(r["y"])
            for r in active.filter(expr=f"n_images > {threshold}").select_columns(["x", "y"]).take_all()
        )
    out = leaves[0]
    for lv in leaves[1:]:
        out = out.union(lv)
    return out


def boundary_index_ref(admin_level: int | None = None, polys: list | None = None) -> "ray.ObjectRef":
    """Build + broadcast the fixture admin-polygon index (driver-side, once).

    ``polys`` lets a caller that already constructed the boundary list
    (e.g. the auto planner's cardinality check) avoid rebuilding it."""
    if polys is None:
        polys = fixtures.admin_polygons()
    if admin_level is not None:
        polys = [p for p in polys if p["admin_level"] == admin_level]
    return ray.put(geo.PolygonIndex(polys, precision=cells.PRECISION_VERY_LOW))


def strtree_index_ref(admin_level: int | None = None, node_capacity: int = 8) -> "ray.ObjectRef":
    """Build + broadcast the packed STRtree over the fixture boundaries.

    The north-star's literal index structure; drop-in for PolygonIndex
    (same .query contract), so pip joins through it are
    result-identical by construction."""
    from ..stages.rtree import STRtreeIndex

    polys = fixtures.admin_polygons()
    if admin_level is not None:
        polys = [p for p in polys if p["admin_level"] == admin_level]
    return ray.put(STRtreeIndex(polys, node_capacity=node_capacity))


def pip_join_strtree(sf_dir: str) -> rd.Dataset:
    """Broadcast PiP join probing the packed STRtree (J3 variant)."""
    return pip_join_pipeline(sf_dir, idx_ref=strtree_index_ref())


def pip_join_pipeline(sf_dir: str, source=points_from_documents, idx_ref=None) -> rd.Dataset:
    """Broadcast point-in-polygon join (J3): one row per containing area."""
    if idx_ref is None:
        idx_ref = boundary_index_ref()
    return source(sf_dir).map_batches(
        geo.PiPJoinActor,
        fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("doc_id",)),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    ).select_columns(["doc_id", "rel_id", "admin_level"])


def pip_anti_join_pipeline(sf_dir: str, source=points_from_documents, idx_ref=None) -> rd.Dataset:
    """Points outside EVERY boundary polygon (left-anti PiP): the
    coverage-gap stream the inner join drops.  Same broadcast index as
    pip_join_pipeline; map-only, no shuffle."""
    if idx_ref is None:
        idx_ref = boundary_index_ref()
    return source(sf_dir).map_batches(
        geo.PiPAntiJoinActor,
        fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("doc_id", "lon", "lat")),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    )


def pip_count_pipeline(sf_dir: str) -> rd.Dataset:
    """Joined-row counts per admin area (A3 analogue)."""
    return pip_join_pipeline(sf_dir).groupby("rel_id").aggregate(Count(alias_name="n_points"))


def knn_pipeline(sf_dir: str, k: int = 3) -> rd.Dataset:
    """k nearest POIs per point (J7 kNN form; planar metric, oracle-exact).

    The grid index is built ONCE on the driver and the BUILT state is
    broadcast (``KnnJoinActor.to_state`` + ``ray.put``): every pool
    actor restores in O(1) from shared memory instead of re-running the
    O(m) build — the duplicated per-actor build is what makes a big
    broadcast side infeasible (measured: SCALE.md kNN crossover)."""
    pois = fixtures.make_pois()
    pois_dict = {c: pois[c].to_numpy() for c in ("poi_id", "lon", "lat")}
    try:
        state_ref = ray.put(geo.build_knn_state(pois_dict, k=k))
    except ValueError:  # tiny POI set: no grid regime, brute path is fine
        state_ref = ray.put(pois_dict)
    out = points_from_documents(sf_dir).map_batches(
        geo.KnnJoinActor,
        fn_constructor_kwargs=dict(pois_ref=state_ref, k=k, metric="sqdeg", keep_cols=("doc_id",)),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    )
    return out.map_batches(lambda t: t.rename_columns(["doc_id", "knn_rank", "poi_id"]), batch_format="pyarrow")


# Legacy count ceiling, kept as the no-Ray fallback pin: the round-4
# crossover (SCALE.md) measured broadcast >= shuffle up to well past
# 1e6 POIs once the build went parallel, with STATE RESIDENCY (not
# build or probe) ending the regime at ~1e7.  The planner now flips on
# a packed-state BYTE estimate against the live object store (below);
# this constant only pins the flip point when no store size is known.
KNN_BROADCAST_MAX_POIS = 1_000_000
KNN_SHUFFLE_SHARDS = 32

# Measured packed-state coefficients (SCALE.md round-4 crossover):
# state = poi_id/lon/lat (24 B/POI) + float32 P4 GEMM companion
# (16 B/POI) + grid arrays: gcells+goffs (~16 B/cell, ~1 cell/POI by
# the precision rule) + gcand (8 B/candidate, measured ~64 avg
# candidates/cell at 1e6-1e7 POIs => ~0.59 GB @ 1e6, ~5.6 GB @ 1e7,
# matching the measured 0.59 GB / ~5 GB residencies).
KNN_STATE_BYTES_PER_POI_FIXED = 24 + 16 + 16
KNN_STATE_AVG_CAND_PER_CELL = 64
# The broadcast state is ONE plasma copy per node (mmap-shared by
# every actor), but it must not crowd out the streaming blocks: allow
# at most this fraction of the object store before flipping to the
# cell-keyed shuffle plan.  0.1 puts the measured 1e7 state (~5.6 GB)
# past the flip on this sandbox's ~38 GB store while 1e6 (~0.6 GB)
# stays comfortably broadcast — the measured crossover's conclusion.
KNN_BROADCAST_STORE_FRACTION = 0.1


def knn_state_bytes_estimate(m: int, k: int = 3, avg_cand: int = KNN_STATE_AVG_CAND_PER_CELL) -> int:
    """Predicted ``build_knn_state`` footprint in bytes for an m-POI
    side — the planner's flip input (VERDICT r4 directive 4: flip on a
    size estimate, not a POI count).  Coefficients above are measured,
    not guessed; ``avg_cand`` rises with k (the per-cell candidate list
    must cover r_k + diagonal), folded in as a k/3 scale."""
    per_cell_cand = max(int(avg_cand * max(k, 1) / 3.0), 2 * k)
    return int(m * (KNN_STATE_BYTES_PER_POI_FIXED + 8 * per_cell_cand))


def _object_store_bytes() -> int | None:
    """Live object-store capacity (bytes) of the current Ray cluster,
    or None when Ray isn't up (planner falls back to the measured
    POI-count pin)."""
    try:
        if ray.is_initialized():
            v = ray.cluster_resources().get("object_store_memory")
            if v:
                return int(v)
    except Exception:  # pragma: no cover - resource introspection only
        pass
    return None


def _knn_grid_precision(lon0: float, lat0: float, lon1: float, lat1: float, m: int) -> int:
    """Grid precision so the POI bbox holds ~1 POI per cell — the same
    sizing rule as the broadcast index (stages.geo.KnnJoinActor._build_grid),
    so both kNN plans probe comparable candidate densities."""
    p = 4
    for p in range(4, cells.MAX_PRECISION):
        n_cells = max(1, int((lon1 - lon0) / 360.0 * (1 << p))) * max(1, int((lat1 - lat0) / 180.0 * (1 << p)))
        if n_cells >= m:
            break
    return p


def knn_shuffle_pipeline(
    sf_dir: str,
    k: int = 3,
    num_partitions: int = 8,
    shards: int = KNN_SHUFFLE_SHARDS,
    pois_table: "pa.Table | None" = None,
    points: "rd.Dataset | None" = None,
) -> rd.Dataset:
    """J7 kNN at POI-set scale: SHUFFLE kNN join — no broadcast index.

    The broadcast grid (``knn_pipeline``) tops out when the POI side no
    longer fits a per-worker index (~10^6 POIs).  The scalable plan
    mirrors the reference's per-cell candidate fetch (J7 'nearby',
    query-engine Queries.scala:211-262 — fetch the cell's objects, rank
    locally) as a cell-keyed exchange:

        round 1 (the common case, resolves ~all points) is CELL-PACKED:
          POIs   -> explode into their (2r+1)^2 neighbor cells,
                    then pack ONE row per cell (binary arrays)   (map + tiny groupby)
          points -> pack ONE row per (batch, cell)               (map; points
                                                                  NEVER shuffle)
          packed points ⟕ packed POIs ON cell                    (hash shuffle of
                                                                  GRID-sized rows —
                                                                  ~|cells|·batches,
                                                                  not candidates;
                                                                  LEFT OUTER so
                                                                  empty-neighborhood
                                                                  points survive)
          per-row vectorized (npts x npois) top-k IN PLACE       (map; each row
                                                                  already holds its
                                                                  full candidate
                                                                  set — no doc
                                                                  regroup exists)

    ``doc_id`` is the regroup KEY and must be UNIQUE per query point
    (true of every registered query; rows sharing a doc_id would
    collapse into one result set — the broadcast plan, which treats
    rows independently, has no such requirement).

        A point is RESOLVED when it saw >= k candidates and its k-th
        distance is within the ring guarantee (any POI outside the
        radius-r cell neighborhood is > r*min_cell_width away), or when
        its candidate set was the whole POI table.  The INITIAL radius
        is sized from the measured POI density (~3k expected candidates
        per neighborhood), so round 1 resolves ~all points even on a
        sparse POI side.  Unresolved points re-join with the explosion
        INVERTED (the few remaining points explode, POIs key by their
        OWN cell) at their PER-DOC needed radius — ceil(kth_dist /
        cell_width) when k candidates exist (resolution next round is
        then guaranteed), a bbox-distance jump when none — with the
        explosion rectangle clipped to the POI bbox.  No blind
        doubling cascade; rounds are ~2 in practice.

    Exactness: identical to the broadcast plan and the SQL oracle —
    float64 (dlon^2 + dlat^2), ties by poi_id; the ring guarantee makes
    the candidate pruning provably lossless.  Per-round state is
    OUTPUT-bounded (<= k+1 metadata rows per point, no payload), the
    only thing materialized between rounds.

    Output: (doc_id, knn_rank 1..k, poi_id) — same schema/oracle as
    ``knn_pois``.
    """
    pois_t = fixtures.make_pois() if pois_table is None else pois_table
    pois = rd.from_arrow(
        pa.table(
            {
                "poi_id": pois_t["poi_id"],
                "plon": pois_t["lon"],
                "plat": pois_t["lat"],
            }
        )
    )
    # metadata pass: POI count + bbox — the ONLY full-POI-side aggregate,
    # a tiny tree reduce (scalars per block)
    st = pois.aggregate(
        Min("plon", alias_name="lon0"),
        Max("plon", alias_name="lon1"),
        Min("plat", alias_name="lat0"),
        Max("plat", alias_name="lat1"),
        Count(alias_name="m"),
    )
    m_total = int(st["m"])
    p = _knn_grid_precision(st["lon0"], st["lat0"], st["lon1"], st["lat1"], m_total)
    sx, sy = 360.0 / (1 << p), 180.0 / (1 << p)
    min_s = min(sx, sy)
    nmax = (1 << p) - 1
    k_eff = min(k, m_total)
    rmax = 1 << p

    # POI bbox in grid cells + density — sizes the INITIAL ring radius so
    # round 1 already sees ~3k expected candidates per point (a sparse
    # POI side with r=1 would leave most points unresolved and cascade
    # into exploding doubling rounds — the round-3 OutOfDisk lesson)
    _bx, _by = cells.lonlat_to_xy(
        np.array([st["lon0"], st["lon1"]]), np.array([st["lat0"], st["lat1"]]), p
    )
    bx0, bx1 = int(_bx.min()), int(_bx.max())
    by0, by1 = int(_by.min()), int(_by.max())
    n_cells_bbox = (bx1 - bx0 + 1) * (by1 - by0 + 1)
    density = m_total / max(1, n_cells_bbox)
    r1 = int(max(1, min(16, np.ceil((np.sqrt(3.0 * max(1, k_eff) / max(density, 1e-12)) - 1.0) / 2.0))))

    def _cellkey(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        x, y = cells.lonlat_to_xy(lon, lat, p)
        return (x.astype(np.int64) << np.int64(32)) | y.astype(np.int64)

    def poi_explode(t: pa.Table, r: int) -> pa.Table:
        """POIs explode into their (2r+1)^2 WORLD-clipped neighbor cells
        (points can sit outside the POI bbox)."""
        lon, lat = t["plon"].to_numpy(), t["plat"].to_numpy()
        x, y = cells.lonlat_to_xy(lon, lat, p)
        offs = np.arange(-r, r + 1, dtype=np.int64)
        dx = np.repeat(offs, len(offs))
        dy = np.tile(offs, len(offs))
        nx = x.astype(np.int64)[:, None] + dx[None, :]
        ny = y.astype(np.int64)[:, None] + dy[None, :]
        valid = (nx >= 0) & (nx <= nmax) & (ny >= 0) & (ny <= nmax)
        rows = np.repeat(np.arange(len(x), dtype=np.int64), len(offs) * len(offs))[valid.ravel()]
        key = ((nx << np.int64(32)) | ny).ravel()[valid.ravel()]
        sub = t.take(pa.array(rows))
        return sub.append_column("ckey", pa.array(key, type=pa.int64()))

    _PTS_EXP_EMPTY = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "lon": pa.array([], type=pa.float64()),
            "lat": pa.array([], type=pa.float64()),
            "ckey": pa.array([], type=pa.int64()),
            "r": pa.array([], type=pa.int64()),
        }
    )

    def pt_explode_var(t: pa.Table) -> pa.Table:
        """Unresolved points explode into their PER-DOC needed radius
        (carried in ``aux``), BBOX-clipped: POIs only exist in bbox
        cells, so the explosion rectangle is [cx-r, cx+r] ∩ bbox — no
        out-of-support fan-out, and a far point pays cells proportional
        to the bbox overlap, not (2r+1)^2.  A DISJOINT overlap clamps
        to the nearest bbox edge (1 cell): disjoint in x means every
        POI is > r cells away in x, i.e. > r*min_s away — the ring test
        for radius r is then vacuously sound whatever candidates the
        edge cell contributes."""
        if t.num_rows == 0:
            return _PTS_EXP_EMPTY
        r = np.minimum(t["aux"].to_numpy().astype(np.int64), rmax)
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        x, y = cells.lonlat_to_xy(lon, lat, p)
        x = x.astype(np.int64)
        y = y.astype(np.int64)
        lox, hix = np.maximum(x - r, bx0), np.minimum(x + r, bx1)
        ex = lox > hix
        edge_x = np.where(x < bx0, bx0, bx1)
        lox, hix = np.where(ex, edge_x, lox), np.where(ex, edge_x, hix)
        loy, hiy = np.maximum(y - r, by0), np.minimum(y + r, by1)
        ey = loy > hiy
        edge_y = np.where(y < by0, by0, by1)
        loy, hiy = np.where(ey, edge_y, loy), np.where(ey, edge_y, hiy)
        wx = hix - lox + 1
        cnt = wx * (hiy - loy + 1)
        total = int(cnt.sum())
        row = np.repeat(np.arange(len(r), dtype=np.int64), cnt)
        base = np.cumsum(cnt) - cnt
        e = np.arange(total, dtype=np.int64) - np.repeat(base, cnt)
        wxr = wx[row]
        nx = lox[row] + e % wxr
        ny = loy[row] + e // wxr
        sub = t.select(["doc_id", "lon", "lat"]).take(pa.array(row))
        sub = sub.append_column("ckey", pa.array((nx << np.int64(32)) | ny, type=pa.int64()))
        return sub.append_column("r", pa.array(r[row], type=pa.int64()))

    def shard(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_shard", pa.array(t["doc_id"].to_numpy() % shards, type=pa.int64())
        )

    _PARTIAL_EMPTY = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "lon": pa.array([], type=pa.float64()),
            "lat": pa.array([], type=pa.float64()),
            "d": pa.array([], type=pa.float64()),
            "poi_id": pa.array([], type=pa.int64()),
            "n_part": pa.array([], type=pa.int64()),
            "r": pa.array([], type=pa.int64()),
        }
    )

    def _runs(doc: np.ndarray, d: np.ndarray, poi: np.ndarray):
        order = np.lexsort((poi, d, doc))
        sd = doc[order]
        starts = np.concatenate([[0], np.nonzero(sd[1:] != sd[:-1])[0] + 1])
        return order, sd, starts

    def _take_idx(starts: np.ndarray, take: np.ndarray):
        off = np.arange(int(take.sum())) - np.repeat(np.cumsum(take) - take, take)
        return np.repeat(starts, take) + off, off

    def local_partial(t: pa.Table) -> pa.Table:
        """Map-side COMBINER: per-batch per-doc top-k candidates + the
        batch-local valid-candidate count.  The doc-sharded regroup then
        moves ~k rows per doc instead of the full ~9-cell candidate
        fan-out — the same partial-aggregation discipline as the tile
        combiner, applied to a top-k.  Lossless: the true top-k of a
        union of partials is contained in the union of partial top-ks;
        ``n_part`` (emitted once per run, 0 elsewhere) sums to the true
        candidate count for the ring-guarantee test."""
        if t.num_rows == 0:
            return _PARTIAL_EMPTY
        doc = t["doc_id"].to_numpy()
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        null = pc.is_null(t["poi_id"]).to_numpy(zero_copy_only=False)
        poi = np.where(null, -1, t["poi_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        plon = np.where(null, 0.0, t["plon"].to_numpy(zero_copy_only=False).astype(np.float64))
        plat = np.where(null, 0.0, t["plat"].to_numpy(zero_copy_only=False).astype(np.float64))
        dlon = lon - plon
        dlat = lat - plat
        d = dlon * dlon + dlat * dlat
        d[null] = np.inf
        order, sd, starts = _runs(doc, d, poi)
        n_valid = np.add.reduceat((~null[order]).astype(np.int64), starts)
        # keep >= 1 row so an all-null (empty-neighborhood) doc survives
        take = np.minimum(k_eff, np.maximum(n_valid, 1)).astype(np.int64)
        idx, off = _take_idx(starts, take)
        n_part = np.where(off == 0, np.repeat(n_valid, take), 0)
        sel = order[idx]
        rr = t["r"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(doc[sel], type=pa.int64()),
                "lon": pa.array(lon[sel], type=pa.float64()),
                "lat": pa.array(lat[sel], type=pa.float64()),
                "d": pa.array(d[sel], type=pa.float64()),
                "poi_id": pa.array(poi[sel], type=pa.int64()),
                "n_part": pa.array(n_part, type=pa.int64()),
                "r": pa.array(rr[sel], type=pa.int64()),
            }
        )

    _SCAN_EMPTY = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "lon": pa.array([], type=pa.float64()),
            "lat": pa.array([], type=pa.float64()),
            "knn_rank": pa.array([], type=pa.int32()),
            "poi_id": pa.array([], type=pa.int64()),
            "aux": pa.array([], type=pa.int64()),
        }
    )

    def scan(g: pa.Table) -> pa.Table:
        """One doc-hash shard of combined partials: merge-run exact
        top-k per doc + per-doc ring-guarantee resolution test.  Emits
        the top-k rows (knn_rank>=1, aux=0) for resolved docs and ONE
        carry row (knn_rank=0, poi_id=-1, aux=NEXT radius) per
        unresolved doc.  The next radius is what the doc NEEDS, not a
        blind double: ceil(kth_dist/min_s) when it has k candidates
        (guaranteeing resolution next round), a bbox jump when it has
        none, 2r otherwise.
        NOTE: ``doc_id`` is the regroup KEY — it must be unique per
        query point (it is, in every registered query; the broadcast
        plan has no such requirement)."""
        if g.num_rows == 0:
            return _SCAN_EMPTY
        doc = g["doc_id"].to_numpy()
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        d = g["d"].to_numpy()
        poi = g["poi_id"].to_numpy()
        npart = g["n_part"].to_numpy()
        rr = g["r"].to_numpy()
        order, sd, starts = _runs(doc, d, poi)
        sl, sa, sdist, spoi = lon[order], lat[order], d[order], poi[order]
        r_run = rr[order][starts].astype(np.int64)
        n_valid = np.add.reduceat(npart[order], starts)
        # k-th distance per run: partials retain >= min(k, n_valid) valid
        # rows (sum over partials of min(k, n_i) >= min(k, sum n_i)), and
        # valid rows sort before the inf-distance null carriers
        kth = np.full(len(starts), np.inf)
        has_k = n_valid >= k_eff
        kth[has_k] = sdist[starts[has_k] + k_eff - 1]
        # STRICT inequality: an excluded POI can sit at EXACTLY r*min_s
        # (dyadic cell widths are float64-exact), and the oracle's
        # poi_id tiebreak could prefer it — a boundary tie must NOT
        # resolve (review finding, round 3)
        bound = (r_run.astype(np.float64) * min_s) ** 2
        resolved = (has_k & (kth < bound)) | (n_valid >= m_total)
        # next radius per unresolved doc
        with np.errstate(invalid="ignore"):
            r_need = np.ceil(np.sqrt(np.where(has_k, kth, 0.0)) / min_s).astype(np.int64)
        r_next = np.where(has_k, np.maximum(r_run + 1, r_need), 2 * r_run)
        zero = n_valid == 0
        if zero.any():
            zx, zy = cells.lonlat_to_xy(sl[starts][zero], sa[starts][zero], p)
            zx = zx.astype(np.int64)
            zy = zy.astype(np.int64)
            dx = np.maximum(np.maximum(bx0 - zx, zx - bx1), 0)
            dy = np.maximum(np.maximum(by0 - zy, zy - by1), 0)
            r_next[zero] = np.maximum(r_next[zero], np.maximum(dx, dy) + 1)
        r_next = np.minimum(r_next, rmax)
        take = np.where(resolved, np.minimum(k_eff, n_valid), 1).astype(np.int64)
        idx, off = _take_idx(starts, take)
        rank = (off + 1).astype(np.int32)
        rank[np.repeat(~resolved, take)] = 0
        out_poi = spoi[idx]
        out_poi[rank == 0] = -1
        aux = np.repeat(np.where(resolved, 0, r_next), take).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(sd[idx], type=pa.int64()),
                "lon": pa.array(sl[idx], type=pa.float64()),
                "lat": pa.array(sa[idx], type=pa.float64()),
                "knn_rank": pa.array(rank, type=pa.int32()),
                "poi_id": pa.array(out_poi, type=pa.int64()),
                "aux": pa.array(aux, type=pa.int64()),
            }
        )

    # ---- round 1: CELL-PACKED join (points never shuffle) -------------
    # Both sides pack per cell BEFORE the join: the probe side is one
    # row per (input batch, touched cell) — bounded by the grid, not the
    # points — and the build side is one row per cell holding the cell's
    # candidate POI arrays.  The join output is therefore grid-sized
    # (~|cells| x batches rows), each carrying its full candidate set,
    # so per-point top-k runs vectorized IN PLACE with no doc-keyed
    # regroup at all.  (The previous plan joined every point against
    # every exploded POI row — ~15 candidate rows PER POINT, 216M rows
    # at the bench scale — then regrouped by doc: measured 272 s; this
    # plan measures ~8 s on the same input.)

    def pt_pack(t: pa.Table) -> pa.Table:
        lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
        key = _cellkey(lon, lat)
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        bounds = np.nonzero(np.diff(key_s))[0] + 1
        starts = np.concatenate([[0], bounds]).astype(np.int64)
        doc = np.asarray(t["doc_id"].to_numpy(), np.int64)[order]
        lon_s, lat_s = lon[order], lat[order]
        ends = np.concatenate([starts[1:], [len(key_s)]]).astype(np.int64)
        # packed arrays ride as BINARY blobs: Ray's hash join rejects
        # list-typed non-key columns, and frombuffer decode is zero-copy
        return pa.table(
            {
                "ckey": pa.array(key_s[starts], type=pa.int64()),
                "doc_ids": pa.array(
                    [doc[a:b].tobytes() for a, b in zip(starts, ends)], type=pa.binary()
                ),
                "lons": pa.array(
                    [lon_s[a:b].tobytes() for a, b in zip(starts, ends)], type=pa.binary()
                ),
                "lats": pa.array(
                    [lat_s[a:b].tobytes() for a, b in zip(starts, ends)], type=pa.binary()
                ),
            }
        )

    def poi_pack(g: pa.Table) -> pa.Table:
        pid = np.asarray(g["poi_id"].to_numpy(), np.int64)
        order = np.argsort(pid, kind="stable")  # poi_id order = stable tie-break
        return pa.table(
            {
                "ckey": pa.array([g["ckey"][0].as_py()], type=pa.int64()),
                "poi_ids": pa.array([pid[order].tobytes()], type=pa.binary()),
                "plons": pa.array([g["plon"].to_numpy()[order].tobytes()], type=pa.binary()),
                "plats": pa.array([g["plat"].to_numpy()[order].tobytes()], type=pa.binary()),
            }
        )

    _ROUND_EMPTY = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "lon": pa.array([], type=pa.float64()),
            "lat": pa.array([], type=pa.float64()),
            "knn_rank": pa.array([], type=pa.int32()),
            "poi_id": pa.array([], type=pa.int64()),
            "aux": pa.array([], type=pa.int64()),
        }
    )

    def cell_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _ROUND_EMPTY
        t = t.combine_chunks()
        d_col, l_col, a_col = t["doc_ids"], t["lons"], t["lats"]
        p_col, pl_col, pa_col = t["poi_ids"], t["plons"], t["plats"]
        bound = (float(r1) * min_s) ** 2
        out_doc, out_lon, out_lat, out_rank, out_poi, out_aux = [], [], [], [], [], []
        for i in range(t.num_rows):
            docs = np.frombuffer(d_col[i].as_py(), dtype=np.int64)
            lonv = np.frombuffer(l_col[i].as_py(), dtype=np.float64)
            latv = np.frombuffer(a_col[i].as_py(), dtype=np.float64)
            npts = len(docs)
            if not p_col[i].is_valid:
                # empty neighborhood: jump to the nearest POI-bbox cell
                x, y = cells.lonlat_to_xy(lonv, latv, p)
                x, y = x.astype(np.int64), y.astype(np.int64)
                dx = np.maximum(np.maximum(bx0 - x, x - bx1), 0)
                dy = np.maximum(np.maximum(by0 - y, y - by1), 0)
                rj = np.minimum(np.maximum(2 * r1, np.maximum(dx, dy) + 1), rmax)
                out_doc.append(docs)
                out_lon.append(lonv)
                out_lat.append(latv)
                out_rank.append(np.zeros(npts, dtype=np.int32))
                out_poi.append(np.full(npts, -1, dtype=np.int64))
                out_aux.append(rj.astype(np.int64))
                continue
            pids = np.frombuffer(p_col[i].as_py(), dtype=np.int64)
            plo = np.frombuffer(pl_col[i].as_py(), dtype=np.float64)
            pla = np.frombuffer(pa_col[i].as_py(), dtype=np.float64)
            npois = len(pids)
            dlon = lonv[:, None] - plo[None, :]
            dlat = latv[:, None] - pla[None, :]
            d2 = dlon * dlon + dlat * dlat
            ordix = np.argsort(d2, axis=1, kind="stable")  # ties -> lower poi_id
            if npois >= k_eff:
                kth = np.take_along_axis(d2, ordix[:, k_eff - 1 : k_eff], axis=1)[:, 0]
                resolved = (kth < bound) | (npois >= m_total)
            else:
                resolved = np.zeros(npts, dtype=bool)
            if resolved.any():
                kq = k_eff
                sel = np.nonzero(resolved)[0]
                top = ordix[sel, :kq]
                out_doc.append(np.repeat(docs[sel], kq))
                out_lon.append(np.repeat(lonv[sel], kq))
                out_lat.append(np.repeat(latv[sel], kq))
                out_rank.append(np.tile(np.arange(1, kq + 1, dtype=np.int32), len(sel)))
                out_poi.append(pids[top].ravel())
                out_aux.append(np.zeros(len(sel) * kq, dtype=np.int64))
            un = ~resolved
            if un.any():
                sel = np.nonzero(un)[0]
                if npois >= k_eff:
                    with np.errstate(invalid="ignore"):
                        r_need = np.ceil(np.sqrt(kth[sel]) / min_s).astype(np.int64)
                    r_nx = np.maximum(r1 + 1, r_need)
                else:
                    r_nx = np.full(len(sel), 2 * r1, dtype=np.int64)
                r_nx = np.minimum(r_nx, rmax)
                out_doc.append(docs[sel])
                out_lon.append(lonv[sel])
                out_lat.append(latv[sel])
                out_rank.append(np.zeros(len(sel), dtype=np.int32))
                out_poi.append(np.full(len(sel), -1, dtype=np.int64))
                out_aux.append(r_nx)
        if not out_doc:
            return _ROUND_EMPTY
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
                "lon": pa.array(np.concatenate(out_lon), type=pa.float64()),
                "lat": pa.array(np.concatenate(out_lat), type=pa.float64()),
                "knn_rank": pa.array(np.concatenate(out_rank), type=pa.int32()),
                "poi_id": pa.array(np.concatenate(out_poi), type=pa.int64()),
                "aux": pa.array(np.concatenate(out_aux), type=pa.int64()),
            }
        )

    src = points_from_documents(sf_dir) if points is None else points
    pt_packed = src.map_batches(pt_pack, batch_format="pyarrow", batch_size=131072)
    pois_exp = pois.map_batches(functools.partial(poi_explode, r=r1), batch_format="pyarrow")
    poi_packed = pois_exp.groupby("ckey").map_groups(poi_pack, batch_format="pyarrow")
    joined = safe_join(
        pt_packed, poi_packed, join_type="left_outer", num_partitions=num_partitions, on=("ckey",)
    )
    round_out = joined.map_batches(cell_topk, batch_format="pyarrow").materialize()
    results = [round_out.filter(expr="knn_rank >= 1").select_columns(["doc_id", "knn_rank", "poi_id"])]
    unres = round_out.filter(expr="knn_rank == 0").select_columns(["doc_id", "lon", "lat", "aux"])
    pois_keyed = pois.map_batches(
        lambda t: t.append_column("ckey", pa.array(_cellkey(t["plon"].to_numpy(), t["plat"].to_numpy()), type=pa.int64())),
        batch_format="pyarrow",
    )
    while unres.count() > 0:
        pts_exp = unres.map_batches(pt_explode_var, batch_format="pyarrow")
        joined = safe_join(pts_exp, pois_keyed, join_type="left_outer", num_partitions=num_partitions, on=("ckey",))
        round_out = (
            joined.map_batches(local_partial, batch_format="pyarrow")
            .map_batches(shard, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(scan, batch_format="pyarrow")
            .materialize()
        )
        results.append(round_out.filter(expr="knn_rank >= 1").select_columns(["doc_id", "knn_rank", "poi_id"]))
        unres = round_out.filter(expr="knn_rank == 0").select_columns(["doc_id", "lon", "lat", "aux"])
    out = results[0]
    for extra in results[1:]:
        out = out.union(extra)
    return out


def knn_pois_auto(
    sf_dir: str, k: int = 3, broadcast_max_pois: int | None = None
) -> rd.Dataset:
    """Planner heuristic for J7 (the ``pip_join_auto`` discipline):
    broadcast grid-index kNN while the PREDICTED packed-state footprint
    (``knn_state_bytes_estimate`` — measured coefficients, SCALE.md)
    fits ``KNN_BROADCAST_STORE_FRACTION`` of the live object store,
    else the cell-keyed shuffle kNN.  The flip is MEMORY-AWARE because
    the measured 1e5/1e6/1e7 crossover showed state residency, not
    build or probe time, ends the broadcast regime (~5.6 GB/node at
    1e7).  ``broadcast_max_pois`` remains as an explicit override (and
    the no-Ray fallback pin).  Both plans are oracle-identical — the
    choice is purely physical."""
    pois = fixtures.make_pois()
    m = len(pois)
    if broadcast_max_pois is not None:
        use_broadcast = m <= broadcast_max_pois
    else:
        store = _object_store_bytes()
        if store is None:
            use_broadcast = m <= KNN_BROADCAST_MAX_POIS
        else:
            use_broadcast = knn_state_bytes_estimate(m, k) <= KNN_BROADCAST_STORE_FRACTION * store
    if use_broadcast:
        return knn_pipeline(sf_dir, k=k)
    return knn_shuffle_pipeline(sf_dir, k=k, pois_table=pois)


def radius_pipeline(sf_dir: str, radius_deg: float = 0.05) -> rd.Dataset:
    """All POIs within a planar radius per point (J7 'nearby' form)."""
    pois = fixtures.make_pois()
    pois_ref = ray.put({c: pois[c].to_numpy() for c in ("poi_id", "lon", "lat")})
    return points_from_documents(sf_dir).map_batches(
        geo.RadiusJoinActor,
        fn_constructor_kwargs=dict(pois_ref=pois_ref, radius=radius_deg, metric="sqdeg", keep_cols=("doc_id",)),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    )


def poi_in_area_pipeline(sf_dir: str, value: str = "restaurant") -> rd.Dataset:
    """POI-in-area join with tag pushdown (J5): count of one POI type per city.

    The reference's '125 restaurants in Duisburg' query pattern
    (QueriesSpec.scala:153): filter POIs by tag FIRST (pushdown), then
    PiP against admin_level=6 cities, then count per city.
    ``sf_dir`` is unused (the POI fixture is scale-free) but kept for
    the uniform queries() signature.
    """
    pois = fixtures.make_pois()
    mask = pa.compute.equal(pois["value"], value)
    pois = pois.filter(mask)
    ds = rd.from_arrow(pois)
    idx_ref = boundary_index_ref(admin_level=6)
    joined = ds.map_batches(
        geo.PiPJoinActor,
        fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("poi_id",)),
        batch_format="pyarrow",
        concurrency=1,
        batch_size=4096,
    )
    return joined.groupby("rel_id").aggregate(Count(alias_name="n_pois"))


def flagship_pipeline(sf_dir: str) -> rd.Dataset:
    """The headline end-to-end DAG (north_rule shape):

    points -> cell index -> broadcast PiP join -> kNN attach -> tile
    explode -> per-tile aggregate.  Returns per (tile, admin area)
    image counts at z=10 with a representative nearest-POI count.
    """
    idx_ref = boundary_index_ref()
    pois = fixtures.make_pois()
    pois_ref = ray.put({c: pois[c].to_numpy() for c in ("poi_id", "lon", "lat")})

    pts = points_from_documents(sf_dir).map_batches(geo.cell_index, batch_format="pyarrow")
    joined = pts.map_batches(
        geo.PiPJoinActor,
        fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("doc_id", "lon", "lat", "cell_low")),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    )
    near = joined.map_batches(
        geo.KnnJoinActor,
        fn_constructor_kwargs=dict(pois_ref=pois_ref, k=1, metric="sqdeg", keep_cols=("doc_id", "lon", "lat", "rel_id", "admin_level")),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    )
    tiled = near.map_batches(
        functools.partial(geo.tile_assign, z=10, with_quadkey=False), batch_format="pyarrow"
    )
    return tiled.groupby(["z", "x", "y", "rel_id"]).aggregate(
        Count(alias_name="n_images"),
    )


def _pack_polygon(outer: "np.ndarray", holes: list) -> bytes:
    """Self-describing binary polygon: [n_rings][len_i...][ring floats...].

    The transport form for shuffle joins — Arrow hash joins accept
    binary payloads but not list/tensor columns.
    """
    rings = [np.asarray(outer, dtype=np.float64)] + [np.asarray(h, dtype=np.float64) for h in holes or []]
    header = np.array([len(rings)] + [r.shape[0] for r in rings], dtype=np.int64)
    return header.tobytes() + b"".join(r.tobytes() for r in rings)


def _unpack_polygon(data: bytes) -> tuple["np.ndarray", list]:
    n_rings = int(np.frombuffer(data, dtype=np.int64, count=1)[0])
    lens = np.frombuffer(data, dtype=np.int64, count=n_rings, offset=8)
    off = 8 * (1 + n_rings)
    rings = []
    for ln in lens:
        rings.append(np.frombuffer(data, dtype=np.float64, count=int(ln) * 2, offset=off).reshape(-1, 2))
        off += int(ln) * 16
    return rings[0], rings[1:]


def polygon_cover_table(polygons: list[dict], precision: int = cells.PRECISION_VERY_LOW) -> "pa.Table":
    """(cell, rel_id, admin_level, geom) — one row per cover cell per
    polygon: the shuffle-join side of the spatial index (geometry
    travels WITH its cover rows, so no broadcast is needed)."""
    cell_col, rel_col, lvl_col, geom_col = [], [], [], []
    from .. import geometry

    for p in polygons:
        outer = np.asarray(p["outer"], dtype=np.float64)
        holes = p.get("holes") or []
        lon0, lat0, lon1, lat1 = geometry.envelope(outer)
        packed = _pack_polygon(outer, holes)
        for c in cells.cover_bbox(lon0, lat0, lon1, lat1, precision):
            cell_col.append(int(c))
            rel_col.append(int(p["rel_id"]))
            lvl_col.append(int(p.get("admin_level", 0)))
            geom_col.append(packed)
    return pa.table(
        {
            "cell": pa.array(cell_col, type=pa.int64()),
            "rel_id": pa.array(rel_col, type=pa.int64()),
            "admin_level": pa.array(lvl_col, type=pa.int32()),
            "geom": pa.array(geom_col, type=pa.binary()),
        }
    )


BROADCAST_MAX_POLYGONS = 10_000  # measured: ~1.8 MB pickled index at 10k


def pip_join_auto(sf_dir: str, broadcast_max_polygons: int = BROADCAST_MAX_POLYGONS) -> rd.Dataset:
    """Planner heuristic for J3: pick the broadcast PiP path while the
    polygon side fits a per-worker index (<= ``broadcast_max_polygons``,
    sized from the measured index footprint in BASELINE.md), else the
    cell-keyed shuffle join.  Both paths are oracle-identical — the
    choice is purely physical (the planner pattern the reference buries
    in per-stage dispatcher config, reference.conf:1-43)."""
    polys = fixtures.admin_polygons()  # built once; reused by the chosen path
    if len(polys) <= broadcast_max_polygons:
        return pip_join_pipeline(sf_dir, idx_ref=boundary_index_ref(polys=polys))
    return pip_join_shuffle_pipeline(sf_dir)


def pip_join_shuffle_pipeline(sf_dir: str, num_partitions: int = 8) -> rd.Dataset:
    """J3 at boundary-set scale: SHUFFLE spatial join (no broadcast).

    When the polygon side is too large to broadcast (>> 10^4 polygons),
    the broadcast PiP actor no longer works; the scalable plan is:

        points  -> cell at the index precision          (map)
        covers  -> (cell, rel_id, geom) explode          (map)
        points ⋈ covers ON cell                          (hash shuffle)
        exact PiP verify per candidate pair              (map; geometry
                                                          decoded once
                                                          per rel per
                                                          batch)

    Results are identical to the broadcast plan (same oracle SQL as
    pip_join); candidate fan-out = points x avg covers per cell.
    """
    from .. import fixtures, geometry

    cover = polygon_cover_table(fixtures.admin_polygons())
    pts = points_from_documents(sf_dir).map_batches(
        functools.partial(
            geo.cell_index, outputs=(("cell", cells.PRECISION_VERY_LOW),)
        ),
        batch_format="pyarrow",
    )
    joined = safe_join(pts, 
        rd.from_arrow(cover), join_type="inner", num_partitions=num_partitions, on=("cell",)
    )

    def verify(t: "pa.Table") -> "pa.Table":
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()), "rel_id": pa.array([], type=pa.int64()), "admin_level": pa.array([], type=pa.int32())})
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        rels = t["rel_id"].to_numpy()
        keep = np.zeros(t.num_rows, dtype=bool)
        geoms = t["geom"].to_pylist()
        # decode each distinct polygon once per batch, verify its rows
        order = np.argsort(rels, kind="stable")
        sr = rels[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(sr))[0] + 1])
        ends = np.concatenate([starts[1:], [len(sr)]])
        for s, e in zip(starts, ends):
            rows = order[s:e]
            outer, holes = _unpack_polygon(geoms[rows[0]])
            keep[rows] = geometry.points_in_polygon(lon[rows], lat[rows], outer, holes)
        out = t.filter(pa.array(keep))
        return out.select(["doc_id", "rel_id", "admin_level"])

    return joined.map_batches(verify, batch_format="pyarrow")


def cell_prefix_scan_pipeline(sf_dir: str, prefix_cell: int = None, prefix_precision: int = 6) -> rd.Dataset:
    """Quadtree prefix range scan: all points whose fine cell id has the
    given coarse cell as prefix.  Because the Morton code is a quadkey,
    a coarse cell at precision q covers exactly the fine-id range
    ``[c << 2(p-q), (c+1) << 2(p-q))`` — ONE contiguous integer range,
    which is what makes cell-sorted storage range-scannable (the
    'tile id = prefix of the cell key' property, SURVEY §1.3).
    """
    p = cells.PRECISION_LOW
    if prefix_cell is None:
        # the coarse cell containing the fixture world's busiest area
        prefix_cell = int(cells.encode(np.array([6.55]), np.array([51.0]), prefix_precision)[0])
    shift = 2 * (p - prefix_precision)
    lo = prefix_cell << shift
    hi = (prefix_cell + 1) << shift
    pts = points_from_documents(sf_dir).map_batches(
        functools.partial(geo.cell_index, outputs=(("cell_low", p),)), batch_format="pyarrow"
    )
    return pts.filter(expr=f"cell_low >= {lo} and cell_low < {hi}").select_columns(["doc_id", "cell_low"])


def convex_hull_per_area(sf_dir: str) -> rd.Dataset:
    """queries() surface: convex hull of the document points inside
    each admin area — (rel_id, hull_idx, lon, lat), hull CCW from the
    lexicographically smallest vertex.

    Scale shape: a map-side combiner computes the PARTIAL hull of each
    (batch, area) slice — hull(union) == hull(union of partial hulls),
    so only O(hull size) points per batch-area reach the shuffle; the
    per-area regroup then hulls the combined partials.  Containment is
    the same half-open rect rule the PiP oracle mirrors.  Oracle:
    independent pure-Python monotone chain over all in-area points
    (golden.convex_hull_path).
    """
    from .. import fixtures as _fx
    from .. import geometry

    rects = _fx.admin_rects()
    ds = points_from_documents(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        rel_out, lon_out, lat_out = [], [], []
        for r in rects:
            m = (
                (lon >= r["lon_min"]) & (lon < r["lon_max"])
                & (lat >= r["lat_min"]) & (lat < r["lat_max"])
            )
            if not m.any():
                continue
            h = geometry.convex_hull(np.column_stack([lon[m], lat[m]]))
            rel_out.append(np.full(h.shape[0], r["rel_id"], dtype=np.int64))
            lon_out.append(h[:, 0])
            lat_out.append(h[:, 1])
        if not rel_out:
            return pa.table(
                {
                    "rel_id": pa.array([], type=pa.int64()),
                    "lon": pa.array([], type=pa.float64()),
                    "lat": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "rel_id": pa.array(np.concatenate(rel_out), type=pa.int64()),
                "lon": pa.array(np.concatenate(lon_out), type=pa.float64()),
                "lat": pa.array(np.concatenate(lat_out), type=pa.float64()),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        rel = int(g["rel_id"][0].as_py())
        h = geometry.convex_hull(
            np.column_stack([g["lon"].to_numpy(), g["lat"].to_numpy()])
        )
        return pa.table(
            {
                "rel_id": pa.array(np.full(h.shape[0], rel), type=pa.int64()),
                "hull_idx": pa.array(np.arange(h.shape[0]), type=pa.int64()),
                "lon": pa.array(h[:, 0], type=pa.float64()),
                "lat": pa.array(h[:, 1], type=pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("rel_id")
        .map_groups(final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# spatial_split (leakage-safe train/test assignment by cell)
# ---------------------------------------------------------------------------

SPLIT_MULT = 1664525  # Numerical-Recipes LCG — disjoint from fixture mixes
SPLIT_ADD = 1013904223
SPLIT_M31 = 1 << 31
SPLIT_TEST_FRAC = 0.2


def spatial_split(sf_dir: str, test_frac: float = SPLIT_TEST_FRAC) -> rd.Dataset:
    """Group-wise train/test split keyed on the spatial CELL, not the
    row: every point in a Morton cell lands on the same side, so near-
    duplicate neighbors can never straddle the split (the spatial-
    leakage guard every geo ML pipeline needs; row-wise random splits
    leak because adjacent images share content).

    The fold is the fixture world's LCG-mix trick on the CELL id —
    pure integer + double arithmetic, so the engine and the SQL oracle
    assign the identical side to every row with zero RNG state, under
    any partitioning.

    Scale shape: map-only (cell encode + integer hash per batch); no
    shuffle at all — the split column rides with the row.

    Output: (doc_id, cell_low, split) with split ∈ {'train', 'test'}.
    """
    pts = points_from_documents(sf_dir)

    def assign(t: pa.Table) -> pa.Table:
        t = geo.cell_index(t)
        cell = t["cell_low"].to_numpy()
        frac = ((cell * SPLIT_MULT + SPLIT_ADD) % SPLIT_M31) / SPLIT_M31
        split = np.where(frac < test_frac, "test", "train")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "cell_low": t["cell_low"],
                "split": pa.array(split, type=pa.string()),
            }
        )

    return pts.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# incremental view maintenance + spatial concentration
# ---------------------------------------------------------------------------

IVM_CUT = "2024-01-20"  # base/delta split for the incremental demo
GINI_Z = 10


def incremental_tile_counts(sf_dir: str, z: int = GINI_Z, cut: str = IVM_CUT) -> rd.Dataset:
    """Incremental view maintenance: per-tile event counts computed as
    BASE (ts < cut) plus DELTA (ts >= cut), merged by integer addition —
    the streaming-refresh pattern (a nightly base + an hourly delta)
    that works because the count aggregate is a commutative monoid; the
    oracle computes the same view in one pass, so the compare PROVES
    merge == recompute.  Output: (z, x, y, n_base, n_delta, n_total).
    """
    import pyarrow.compute as _pc

    from .. import fixtures as _fx
    from .. import tiles as _tiles
    from ray.data.aggregate import Sum as _Sum

    cut_us = pa.scalar(np.datetime64(cut, "us"))
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"])

    def tile_partial(t: pa.Table, which: str) -> pa.Table:
        m = _pc.less(t["ts"], cut_us) if which == "base" else _pc.greater_equal(t["ts"], cut_us)
        t = t.filter(m)
        ids = t["event_id"].to_numpy()
        x, y = _tiles.tile_xy(_fx.derive_lon(ids), _fx.derive_lat(ids), z)
        key = x.astype(np.int64) * (1 << z) + y
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uniq, type=pa.int64()), "n": pa.array(cnt.astype(np.int64))})

    import functools as _ft

    base = ds.map_batches(_ft.partial(tile_partial, which="base"), batch_format="pyarrow").groupby(
        "key"
    ).aggregate(_Sum("n", alias_name="n_base"))
    delta = ds.map_batches(_ft.partial(tile_partial, which="delta"), batch_format="pyarrow").groupby(
        "key"
    ).aggregate(_Sum("n", alias_name="n_delta"))
    merged = safe_join(base, delta, join_type="full_outer", num_partitions=4, on=("key",))

    def finish(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        nb = _pc.coalesce(_pc.cast(t["n_base"], pa.int64()), pa.scalar(0, type=pa.int64())).to_numpy(zero_copy_only=False)
        nd = _pc.coalesce(_pc.cast(t["n_delta"], pa.int64()), pa.scalar(0, type=pa.int64())).to_numpy(zero_copy_only=False)
        key = key.astype(np.int64)
        return pa.table(
            {
                "z": pa.array(np.full(len(key), z, dtype=np.int64)),
                "x": pa.array(key // (1 << z), type=pa.int64()),
                "y": pa.array(key % (1 << z), type=pa.int64()),
                "n_base": pa.array(nb, type=pa.int64()),
                "n_delta": pa.array(nd, type=pa.int64()),
                "n_total": pa.array(nb + nd, type=pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


THEIL_FP = 1000000000.0  # fixed-point pitch for n·ln(n) terms (1e-9)


def theil_decomposition(sf_dir: str) -> rd.Dataset:
    """Theil-T inequality of per-cell event activity, DECOMPOSED into
    between-region and within-region components over the engine-wide
    Morton lattice (fine = PRECISION_LOW cells, regions = their
    PRECISION_VERY_LOW parents, the cell_index convention) — answers
    "is the unevenness regional structure or local texture?", the
    additive sibling of tile_gini's single concentration scalar
    (Theil 1967; T_total = T_between + T_within by construction).

    Exact arithmetic: with occupied-cell counts x_i, the identity
    T_total = S1/(FP·X) − ln(X/n), T_between = S2/(FP·X) − ln(X/n),
    T_within = S1/(FP·X) − S2/(FP·X), where S1 = Σ fp(x_i·ln x_i) and
    S2 = Σ_g fp(X_g·ln(X_g/n_g)) are int64 fixed-point sums (each term
    pinned ONCE, so the fold is shuffle-order-free) and X, n, n_groups
    are exact counts.  All float projections are single mirrored
    expressions.

    Scale shape: per-batch (cell, count) combiner → ONE lattice-bounded
    groupby; the region fold reduces THAT table (never input rows);
    three scalars + two fixed-point sums reach the one-row finish.
    Output: (n_cells, n_groups, total_events, theil_total,
    theil_between, theil_within).
    """
    from ..stages.common import duckdb_round as _dr

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def cell_partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        cell = cells.encode(fixtures.derive_lon(ids), fixtures.derive_lat(ids), cells.PRECISION_LOW)
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {"cell": pa.array(uniq.astype(np.int64)), "x": pa.array(cnt.astype(np.int64))}
        )

    per_cell = (
        ds.map_batches(cell_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("x", alias_name="x"))
    )

    def cell_terms(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy().astype(np.int64)
        xf = x.astype(np.float64)
        s1 = np.floor(xf * np.log(xf) * THEIL_FP + 0.5).astype(np.int64)
        return pa.table(
            {
                "grp": pa.array((t["cell"].to_numpy() >> 4).astype(np.int64)),
                "x": pa.array(x),
                "s1": pa.array(s1),
                "one": pa.array(np.ones(len(x), dtype=np.int64)),
            }
        )

    by_grp = (
        per_cell.map_batches(cell_terms, batch_format="pyarrow")
        .groupby("grp")
        .aggregate(
            Sum("x", alias_name="xg"),
            Sum("s1", alias_name="s1"),
            Sum("one", alias_name="ng"),
        )
    )

    def grp_terms(t: pa.Table) -> pa.Table:
        xg = t["xg"].to_numpy().astype(np.float64)
        ng = t["ng"].to_numpy().astype(np.float64)
        s2 = np.floor(xg * np.log(xg / ng) * THEIL_FP + 0.5).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "x": t["xg"],
                "s1": t["s1"],
                "s2": pa.array(s2),
                "n_cells": pa.array(t["ng"].to_numpy().astype(np.int64)),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    tot = (
        by_grp.map_batches(grp_terms, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Sum("x", alias_name="total_events"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
            Sum("n_cells", alias_name="n_cells"),
            Sum("one", alias_name="n_groups"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        x = t["total_events"].to_numpy().astype(np.float64)
        n = t["n_cells"].to_numpy().astype(np.float64)
        s1 = t["s1"].to_numpy().astype(np.float64)
        s2 = t["s2"].to_numpy().astype(np.float64)
        ln_xn = np.log(x / n)
        t_total = (s1 / THEIL_FP) / x - ln_xn
        t_between = (s2 / THEIL_FP) / x - ln_xn
        t_within = (s1 / THEIL_FP) / x - (s2 / THEIL_FP) / x
        return pa.table(
            {
                "n_cells": t["n_cells"].cast(pa.int64()),
                "n_groups": t["n_groups"].cast(pa.int64()),
                "total_events": t["total_events"].cast(pa.int64()),
                "theil_total": pa.array(_dr(t_total, 6), type=pa.float64()),
                "theil_between": pa.array(_dr(t_between, 6), type=pa.float64()),
                "theil_within": pa.array(_dr(t_within, 6), type=pa.float64()),
            }
        )

    return tot.map_batches(finish, batch_format="pyarrow")


def segregation_index(sf_dir: str) -> rd.Dataset:
    """Duncan dissimilarity index per language over the Morton cell
    lattice (Duncan & Duncan 1955): D = ½·Σ_i |a_i/A − b_i/B| — the
    fraction of a language's documents that would have to MOVE cells
    to match the rest of the corpus's spatial layout (0 = identical
    distribution, 1 = total separation); the corpus-balance screen a
    multilingual geo-pipeline runs beside cell_modality_mix.

    EXACT-integer core: over the common denominator A·B the per-cell
    term is |a_i·B − b_i·A| (int64, order-free sum; bound asserted),
    cells where the language is ABSENT contribute t_i·A without being
    enumerated: their fold is (T − Σ_present t_i)·A — so the exchange
    is (cell, lang)-bounded and no lang×lattice cross join exists.
    One final mirrored float division per lang.

    Scale shape: per-batch (cell, lang) combiner → ONE groupby; cell
    totals join back on the lattice-bounded table; lang totals are a
    ≤|langs|-row broadcast.  Output: (lang, n_lang, n_cells_present,
    dissimilarity).
    """
    from ..stages.common import duckdb_round as _dr

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"])

    def cell_lang_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t["doc_id"].to_numpy()
        cell = cells.encode(fixtures.derive_lon(ids), fixtures.derive_lat(ids), cells.PRECISION_LOW)
        df = pd.DataFrame({"cell": cell, "lang": t["lang"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["cell", "lang"], sort=False).size().reset_index(name="a")
        return pa.table(
            {
                "cell": pa.array(g["cell"].to_numpy().astype(np.int64)),
                "lang": pa.array(g["lang"], type=pa.string()),
                "a": pa.array(g["a"].to_numpy().astype(np.int64)),
            }
        )

    cl = (
        ds.map_batches(cell_lang_partial, batch_format="pyarrow")
        .groupby(["cell", "lang"])
        .aggregate(Sum("a", alias_name="a"))
    )

    def cell_total(t: pa.Table) -> pa.Table:
        return pa.table({"cell": t["cell"], "t_cell": t["a"]})

    totals = (
        cl.map_batches(cell_total, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("t_cell", alias_name="t_cell"))
    )

    # lang totals: <= |langs| rows -> safe to collect and broadcast
    lang_tot = {
        str(r["lang"]): int(r["a"])
        for r in cl.groupby("lang").aggregate(Sum("a", alias_name="a")).take_all()
    }
    T = sum(lang_tot.values())

    joined = safe_join(cl, totals, join_type="inner", num_partitions=4, on=("cell",))

    def terms(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        a = t["a"].to_numpy().astype(np.int64)
        tc = t["t_cell"].to_numpy().astype(np.int64)
        A = np.array([lang_tot[s] for s in langs], dtype=np.int64)
        B = T - A
        assert (a.astype(object) * B.astype(object) < 2**63).all(), "a_i*B overflows int64"
        num = np.abs(a * B - (tc - a) * A)
        return pa.table(
            {
                "lang": t["lang"],
                "num": pa.array(num, type=pa.int64()),
                "t_present": pa.array(tc, type=pa.int64()),
                "one": pa.array(np.ones(len(a), dtype=np.int64)),
            }
        )

    agg = (
        joined.map_batches(terms, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("num", alias_name="num"),
            Sum("t_present", alias_name="t_present"),
            Sum("one", alias_name="n_cells_present"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        A = np.array([lang_tot[s] for s in langs], dtype=np.int64)
        B = T - A
        num = t["num"].to_numpy().astype(np.int64) + (T - t["t_present"].to_numpy()) * A
        d = num.astype(np.float64) / (2.0 * A.astype(np.float64) * B.astype(np.float64))
        return pa.table(
            {
                "lang": t["lang"],
                "n_lang": pa.array(A, type=pa.int64()),
                "n_cells_present": t["n_cells_present"].cast(pa.int64()),
                "dissimilarity": pa.array(_dr(d, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("lang")


def tile_gini(sf_dir: str, z: int = GINI_Z) -> pa.Table:
    """Spatial concentration: the Gini coefficient of per-tile image
    counts — ONE scalar describing how unevenly the corpus covers the
    map (0 = uniform, ->1 = everything in one tile); the skew statistic
    that motivates salted tiling.

    Exact arithmetic: with tile counts x_(1..n) sorted ascending,
    G = (2·Σ i·x_i) / (n·Σ x_i) − (n+1)/n — both Σ are int64; the two
    divisions happen once, in the same association, in both engines.
    The per-tile reduce is the tile-histogram combiner; the final sort
    is over TILES (output-bounded), not rows.
    """
    from .. import fixtures as _fx
    from .. import tiles as _tiles
    from ray.data.aggregate import Sum as _Sum
    from ..stages.common import duckdb_round as _dr

    from .images import images_path_for

    ds = rd.read_parquet(images_path_for(sf_dir), columns=["image_id"])

    def tile_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        ids = _pc.cast(_pc.utf8_slice_codeunits(t["image_id"], 4, 16), pa.int64()).to_numpy()
        x, y = _tiles.tile_xy(_fx.derive_lon(ids), _fx.derive_lat(ids), z)
        key = x.astype(np.int64) * (1 << z) + y
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uniq, type=pa.int64()), "n": pa.array(cnt.astype(np.int64))})

    per_tile = (
        ds.map_batches(tile_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(_Sum("n", alias_name="n"))
        .to_pandas()  # output-bounded: occupied tiles
    )
    xs = np.sort(per_tile["n"].to_numpy().astype(np.int64))
    n = len(xs)
    swx = int((np.arange(1, n + 1, dtype=np.int64) * xs).sum())
    sx = int(xs.sum())
    g = float(_dr(np.array([2.0 * swx / (float(n) * sx) - (n + 1.0) / n]), 6)[0])
    return pa.table(
        {
            "n_tiles": pa.array([n], type=pa.int64()),
            "n_images": pa.array([sx], type=pa.int64()),
            "gini": pa.array([g], type=pa.float64()),
        }
    )


# layout_pruning_stats constants: 8-bit lon grid, day offsets from the
# fixture epoch, a quarter-of-space x one-week probe query
LAYOUT_DAY0 = 19723  # floor(epoch_days('2024-01-01'))
LAYOUT_CX = (96, 159)
LAYOUT_D = (7, 13)


def layout_pruning_stats(sf_dir: str) -> rd.Dataset:
    """Data-LAYOUT evaluation: how many files would a (space x time)
    range query touch under three clusterings of the same events —
    time-ordered files, space-ordered files, and Z-ORDER (bit-
    interleaved lon-cell x day) files?  This is the file-skipping
    question that decides scan cost at 100 TB: the engine writes
    per-file min/max stats (the parquet/Lance manifest), and a file is
    TOUCHED when its [min,max] ranges overlap the predicate on BOTH
    columns.

    All columns are small ints (8-bit lon cell, day offset); files are
    key-range buckets of each layout key, so the whole evaluation is
    map-side partials + one (layout, file)-bounded min/max groupby —
    bit-exact, no sort needed to ASSIGN files (the layout key IS the
    order).  n_hit counts files holding actual matches: touched - hit
    = false touches, the clustering's waste.

    Output: (layout, n_files, n_touched, n_hit).
    """
    from .. import cells
    from .hotspot import DAY_US

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"])
    cx_lo, cx_hi = LAYOUT_CX
    d_lo, d_hi = LAYOUT_D

    def partials(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon = fixtures.derive_lon(ids)
        n256 = np.int64(1) << 8
        cx = np.clip(
            np.floor((lon - fixtures.LON_MIN) / fixtures.LON_SPAN * n256).astype(np.int64), 0, n256 - 1
        )
        d8 = t["ts"].to_numpy().astype(np.int64) // DAY_US - LAYOUT_DAY0
        z = cells.interleave(cx, d8)
        match = ((cx >= cx_lo) & (cx <= cx_hi) & (d8 >= d_lo) & (d8 <= d_hi)).astype(np.int64)
        out = {"layout": [], "file": [], "min_cx": [], "max_cx": [], "min_d": [], "max_d": [], "n_match": []}
        for name, f in (("space", cx >> 3), ("time", d8), ("zorder", z >> 9)):
            uf, inv = np.unique(f, return_inverse=True)
            k = len(uf)
            mn_cx = np.full(k, np.iinfo(np.int64).max)
            mx_cx = np.full(k, np.iinfo(np.int64).min)
            mn_d = np.full(k, np.iinfo(np.int64).max)
            mx_d = np.full(k, np.iinfo(np.int64).min)
            nm = np.zeros(k, dtype=np.int64)
            np.minimum.at(mn_cx, inv, cx)
            np.maximum.at(mx_cx, inv, cx)
            np.minimum.at(mn_d, inv, d8)
            np.maximum.at(mx_d, inv, d8)
            np.add.at(nm, inv, match)
            out["layout"] += [name] * k
            out["file"] += uf.tolist()
            out["min_cx"] += mn_cx.tolist()
            out["max_cx"] += mx_cx.tolist()
            out["min_d"] += mn_d.tolist()
            out["max_d"] += mx_d.tolist()
            out["n_match"] += nm.tolist()
        return pa.table(
            {
                "layout": pa.array(out["layout"], type=pa.string()),
                "file": pa.array(out["file"], type=pa.int64()),
                "min_cx": pa.array(out["min_cx"], type=pa.int64()),
                "max_cx": pa.array(out["max_cx"], type=pa.int64()),
                "min_d": pa.array(out["min_d"], type=pa.int64()),
                "max_d": pa.array(out["max_d"], type=pa.int64()),
                "n_match": pa.array(out["n_match"], type=pa.int64()),
            }
        )

    manifest = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["layout", "file"])
        .aggregate(
            Min("min_cx", alias_name="min_cx"),
            Max("max_cx", alias_name="max_cx"),
            Min("min_d", alias_name="min_d"),
            Max("max_d", alias_name="max_d"),
            Sum("n_match", alias_name="n_match"),
        )
    )

    def roll(t: pa.Table) -> pa.Table:
        touched = (
            (t["min_cx"].to_numpy() <= cx_hi)
            & (t["max_cx"].to_numpy() >= cx_lo)
            & (t["min_d"].to_numpy() <= d_hi)
            & (t["max_d"].to_numpy() >= d_lo)
        ).astype(np.int64)
        hit = (t["n_match"].to_numpy() > 0).astype(np.int64)
        return pa.table(
            {
                "layout": t["layout"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64), type=pa.int64()),
                "touched": pa.array(touched, type=pa.int64()),
                "hit": pa.array(hit, type=pa.int64()),
            }
        )

    return (
        manifest.map_batches(roll, batch_format="pyarrow")
        .groupby("layout")
        .aggregate(
            Sum("one", alias_name="n_files"),
            Sum("touched", alias_name="n_touched"),
            Sum("hit", alias_name="n_hit"),
        )
        .sort("layout")
    )


class _ZoneOverlapPairs:
    """Actor-pool stage: PiP multi-assignment fused with ordered-pair
    emission — for each point, every pair (rel_a < rel_b) of zones that
    BOTH contain it, counted map-side.  The data-driven polygon-overlay
    primitive (which admin areas actually share population?)."""

    def __init__(self, index_ref):
        import ray as _ray

        from ..stages import geo as _geo

        self.index: "_geo.PolygonIndex" = (
            _ray.get(index_ref) if not isinstance(index_ref, _geo.PolygonIndex) else index_ref
        )
        self._rel_ids = np.array([p["rel_id"] for p in self.index.polygons], dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        pt_idx, poly_idx = self.index.query(lon, lat)
        rel = self._rel_ids[poly_idx]
        order = np.lexsort((rel, pt_idx))
        p, r = pt_idx[order], rel[order]
        pairs_a, pairs_b = [], []
        if len(p):
            # vectorized all-pairs within runs: for each stride k, rows i
            # and i+k pair up iff they share a point id (containment
            # degree is tiny — bounded by admin levels — so k stays small)
            max_run = int(np.max(np.bincount(p))) if len(p) else 0
            for k in range(1, max_run):
                m = p[:-k] == p[k:]
                if not m.any():
                    break
                pairs_a.append(r[:-k][m])
                pairs_b.append(r[k:][m])
        if not pairs_a:
            return pa.table(
                {
                    "rel_a": pa.array([], type=pa.int64()),
                    "rel_b": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        a = np.concatenate(pairs_a)
        b = np.concatenate(pairs_b)
        key = a * np.int64(1 << 32) + b  # rel ids are small positives
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "rel_a": pa.array(uniq // (1 << 32), type=pa.int64()),
                "rel_b": pa.array(uniq % (1 << 32), type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )


def zone_overlap_point_counts(sf_dir: str, source=points_from_documents) -> rd.Dataset:
    """Polygon-OVERLAY counts driven by the data: for every ordered
    zone pair (rel_a < rel_b) containing a common point, the number of
    points in the overlap — the population-weighted intersection census
    behind admin-hierarchy QA (district⊂city nesting) and genuine
    overlay analysis when zones overlap.  At fixture scale overlaps are
    the 18 district-in-city nestings; the operator is agnostic.

    Scale shape: map-ONLY pair emission fused with the broadcast PiP
    probe (pair fan-out bounded by per-point containment degree, never
    zone count), per-batch combiner, one (pair)-bounded groupby.

    Output: (rel_a, rel_b, n_points).
    """
    idx_ref = boundary_index_ref()
    return (
        source(sf_dir)
        .map_batches(
            _ZoneOverlapPairs,
            fn_constructor_kwargs=dict(index_ref=idx_ref),
            batch_format="pyarrow",
            concurrency=(1, 8),
            batch_size=8192,
        )
        .groupby(["rel_a", "rel_b"])
        .aggregate(Sum("n", alias_name="n_points"))
    )


def zone_overlay_area(sf_dir: str | None = None, precision: int = cells.PRECISION_VERY_LOW) -> rd.Dataset:
    """Vector OVERLAY between zone layers: for every pair of admin
    polygons that geometrically intersect, the exact intersection area
    and IoU — the geometric complement of zone_overlap_point_counts'
    point census, and the primitive under conflation/QA of two boundary
    datasets (which districts straddle which cities, by how much).

    Scale shape: each zone explodes to its coarse cover cells (the
    M13 relation→cell-cover operator); a cell-keyed SELF-join proposes
    candidate pairs (bounded by local zone density, never Z²), a
    (pair)-keyed dedupe collapses multi-cell hits, and the exact
    Sutherland–Hodgman / grid clip runs once per surviving pair in
    the map stage against the ray.put-broadcast polygon table.  At
    fixture scale Z=21, but the DAG never enumerates Z² — the same
    shape runs against an assembled-boundary corpus.

    Output: (rel_a, rel_b, area_a, area_b, inter_area, iou) for pairs
    with inter_area > 0, rel_a < rel_b, areas in deg² (planar — the
    fixture convention of fuzzy_within/areal_interpolation).
    """
    polys = fixtures.admin_polygons()
    ids_l, cells_l = [], []
    for p in polys:
        for c in cells.cover_bbox(*p["bbox"], precision):
            ids_l.append(p["rel_id"])
            cells_l.append(int(c))
    zone_cells = rd.from_arrow(
        pa.table({"rel_id": pa.array(ids_l, type=pa.int64()), "cell": pa.array(cells_l, type=pa.int64())})
    )
    right = zone_cells.map_batches(
        lambda t: pa.table({"rel_b": t["rel_id"], "cell": t["cell"]}), batch_format="pyarrow"
    )
    cand = safe_join(zone_cells, right, join_type="inner", num_partitions=4, on=("cell",))

    def order(t: pa.Table) -> pa.Table:
        a = t["rel_id"].to_numpy()
        b = t["rel_b"].to_numpy()
        m = a < b
        return pa.table(
            {"rel_a": pa.array(a[m], type=pa.int64()), "rel_b": pa.array(b[m], type=pa.int64())}
        )

    pairs = cand.map_batches(order, batch_format="pyarrow").groupby(["rel_a", "rel_b"]).aggregate(
        Count(alias_name="_n")
    )

    pref = ray.put({p["rel_id"]: p for p in polys})

    class Clip:
        def __init__(self):
            self.polys = ray.get(pref)

        def __call__(self, t: pa.Table) -> pa.Table:
            from .. import geometry

            ra = t["rel_a"].to_numpy()
            rb = t["rel_b"].to_numpy()
            rows = {"rel_a": [], "rel_b": [], "area_a": [], "area_b": [], "inter_area": [], "iou": []}
            for a_id, b_id in zip(ra.tolist(), rb.tolist()):
                a, b = self.polys[a_id], self.polys[b_id]
                inter = geometry.intersection_area(a["outer"], b["outer"], a["holes"], b["holes"])
                if inter <= 0.0:
                    continue
                aa = geometry.polygon_area(a["outer"], a["holes"])
                ab = geometry.polygon_area(b["outer"], b["holes"])
                rows["rel_a"].append(a_id)
                rows["rel_b"].append(b_id)
                rows["area_a"].append(aa)
                rows["area_b"].append(ab)
                rows["inter_area"].append(inter)
                rows["iou"].append(inter / (aa + ab - inter))
            return pa.table(
                {
                    "rel_a": pa.array(rows["rel_a"], type=pa.int64()),
                    "rel_b": pa.array(rows["rel_b"], type=pa.int64()),
                    "area_a": pa.array(rows["area_a"], type=pa.float64()),
                    "area_b": pa.array(rows["area_b"], type=pa.float64()),
                    "inter_area": pa.array(rows["inter_area"], type=pa.float64()),
                    "iou": pa.array(rows["iou"], type=pa.float64()),
                }
            )

    return pairs.drop_columns(["_n"]).map_batches(Clip, batch_format="pyarrow", concurrency=(1, 4))


def geohash_strings(sf_dir: str, chars: int = 7, source=points_from_documents) -> rd.Dataset:
    """Classic base32 geohash encoding per point — the STRING form of
    the spatial key (the reference's geow ``GeoHash`` Long rendered as
    Niemeyer base32; interop with every system that indexes by geohash
    prefix).  The 4-char prefix column doubles as the coarse cell for
    prefix range scans (cell_prefix_scan's string sibling).

    Scale shape: map-ONLY (one vectorized Morton spread + alphabet
    gather per batch); no exchange.

    Output: (doc_id, geohash, geohash4).
    """
    from .. import cells as _cells

    def enc(t: pa.Table) -> pa.Table:
        gh = _cells.geohash_encode(t["lon"].to_numpy(), t["lat"].to_numpy(), chars)
        gh_arr = pa.array(gh, type=pa.string())
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "geohash": gh_arr,
                "geohash4": pc.utf8_slice_codeunits(gh_arr, 0, 4),
            }
        )

    return source(sf_dir).map_batches(enc, batch_format="pyarrow")


HILBERT_BITS = 8  # 256 x 256 layout grid over the fixture bbox


def _layout_xy(lon: np.ndarray, lat: np.ndarray, bits: int = HILBERT_BITS):
    n = 1 << bits
    hx = np.clip(((lon - fixtures.LON_MIN) / fixtures.LON_SPAN * n).astype(np.int64), 0, n - 1)
    hy = np.clip(((lat - fixtures.LAT_MIN) / fixtures.LAT_SPAN * n).astype(np.int64), 0, n - 1)
    return hx, hy


def hilbert_index(sf_dir: str, bits: int = HILBERT_BITS) -> rd.Dataset:
    """Hilbert-curve layout key per event beside its Morton key — the
    scan-locality space-filling curve (consecutive keys are ALWAYS
    edge-adjacent cells; Morton jumps quadrants) that decides file
    ordering for range-scan-heavy layouts (the Z-order of
    layout_pruning_stats upgraded).  Map-ONLY: one vectorized
    rotate-swap pass per batch, no exchange.

    Output: (event_id, hx, hy, hkey, mkey).
    """
    from .. import cells as _cells

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def enc(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        hx, hy = _layout_xy(lon, lat, bits)
        return pa.table(
            {
                "event_id": t["event_id"],
                "hx": pa.array(hx, type=pa.int64()),
                "hy": pa.array(hy, type=pa.int64()),
                "hkey": pa.array(_cells.hilbert_d(hx, hy, bits), type=pa.int64()),
                "mkey": pa.array(_cells.interleave(hx, hy), type=pa.int64()),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def hilbert_locality_stats(sf_dir: str, bits: int = HILBERT_BITS) -> rd.Dataset:
    """Measured LAYOUT-locality comparison: order the OCCUPIED layout
    cells by Hilbert key vs Morton key and sum the Manhattan distance
    of consecutive steps — the physical seek cost of a full scan in
    each layout.  Hilbert's total is provably <= Morton's (every
    Hilbert step on the full grid is 1); the row pair quantifies the
    gap on the actual data support.

    Scale shape: per-batch occupied-cell combiner -> one cell-bounded
    groupby -> the step scan runs on the OCCUPIED-CELL table only
    (output-bounded, like tile_gini's final sort).

    Output: (curve, n_cells, total_step, max_step).
    """
    from .. import cells as _cells
    from ray.data.aggregate import Sum as _Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def cellp(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        hx, hy = _layout_xy(lon, lat, bits)
        key = hx * np.int64(1 << bits) + hy
        uniq = np.unique(key)
        return pa.table({"key": pa.array(uniq, type=pa.int64()), "one": pa.array(np.ones(len(uniq), dtype=np.int64))})

    occ = (
        ds.map_batches(cellp, batch_format="pyarrow")
        .groupby("key")
        .aggregate(_Sum("one", alias_name="n"))
        .to_pandas()  # output-bounded: occupied layout cells
    )
    key = occ["key"].to_numpy().astype(np.int64)
    hx, hy = key // (1 << bits), key % (1 << bits)
    rows = []
    for curve, k in (("hilbert", _cells.hilbert_d(hx, hy, bits)), ("morton", _cells.interleave(hx, hy))):
        order = np.argsort(k)
        sx, sy = hx[order], hy[order]
        steps = np.abs(np.diff(sx)) + np.abs(np.diff(sy))
        rows.append((curve, len(key), int(steps.sum()), int(steps.max()) if len(steps) else 0))
    return rd.from_arrow(
        pa.table(
            {
                "curve": pa.array([r[0] for r in rows], type=pa.string()),
                "n_cells": pa.array([r[1] for r in rows], type=pa.int64()),
                "total_step": pa.array([r[2] for r in rows], type=pa.int64()),
                "max_step": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        )
    )


def tile_child_coverage(sf_dir: str, z_parent: int = 10, z_child: int = 12) -> rd.Dataset:
    """Tile-pyramid COMPLETENESS audit: per occupied parent tile, how
    many of its 4^(dz) child tiles hold data — the coverage-rate
    question ("is this z10 tile uniformly photographed or one hot
    corner?") that drives adaptive tiling and acquisition planning.

    Scale shape: the child-tile count combiner (map-side), parent key
    by bit shift, ONE parent-bounded groupby counting DISTINCT children
    via the ≤1-row-per-child combiner output.

    Output: (px, py, n_children_occupied, n_images, coverage).
    """
    from .. import fixtures as _fx
    from .. import tiles as _tiles
    from ..stages.common import duckdb_round as _dr
    from .images import images_path_for

    import pyarrow.compute as pc

    dz = z_child - z_parent
    ds = rd.read_parquet(images_path_for(sf_dir), columns=["image_id"])

    def child_partial(t: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4, 16), pa.int64()).to_numpy()
        x, y = _tiles.tile_xy(_fx.derive_lon(ids), _fx.derive_lat(ids), z_child)
        key = x.astype(np.int64) * (1 << z_child) + y
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"ckey": pa.array(uniq, type=pa.int64()), "n": pa.array(cnt.astype(np.int64))})

    per_child = (
        ds.map_batches(child_partial, batch_format="pyarrow")
        .groupby("ckey")
        .aggregate(Sum("n", alias_name="n"))
    )

    def parent_partial(t: pa.Table) -> pa.Table:
        ckey = t["ckey"].to_numpy()
        cx, cy = ckey // (1 << z_child), ckey % (1 << z_child)
        px, py = cx >> dz, cy >> dz
        return pa.table(
            {
                "px": pa.array(px, type=pa.int64()),
                "py": pa.array(py, type=pa.int64()),
                "one": pa.array(np.ones(len(ckey), dtype=np.int64), type=pa.int64()),
                "n": t["n"],
            }
        )

    agg = (
        per_child.map_batches(parent_partial, batch_format="pyarrow")
        .groupby(["px", "py"])
        .aggregate(Sum("one", alias_name="n_children_occupied"), Sum("n", alias_name="n_images"))
    )

    def finish(t: pa.Table) -> pa.Table:
        occ = t["n_children_occupied"].to_numpy().astype(np.float64)
        cov = _dr(occ / float(1 << (2 * dz)), 6)
        return t.append_column("coverage", pa.array(cov, type=pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def zone_border_distance(sf_dir: str, source=points_from_documents) -> rd.Dataset:
    """Depth-inside-zone statistics: for every point-in-zone pair, the
    planar distance to the zone's nearest border edge
    (min of the four rect margins), aggregated per zone — the
    edge-effect diagnostic (are samples concentrated at boundaries,
    where label noise from geocoding is worst?).

    Fixed-point int64 margins (1e9 per degree) -> exact integer sums;
    mean is ONE mirrored division.  Map-only against the broadcast
    rects + one zone-bounded reduce.

    Output: (rel_id, n_points, min_depth_fp, mean_depth).
    """
    import ray as _ray

    from ..stages.common import duckdb_round as _dr

    rects = fixtures.admin_rects()
    rref = _ray.put(rects)
    FP = 1_000_000_000

    def margins(t: pa.Table) -> pa.Table:
        rs = _ray.get(rref)
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        outs = []
        for r in rs:
            m = (lon >= r["lon_min"]) & (lon < r["lon_max"]) & (lat >= r["lat_min"]) & (lat < r["lat_max"])
            if not m.any():
                continue
            depth = np.minimum.reduce(
                [
                    lon[m] - r["lon_min"],
                    r["lon_max"] - lon[m],
                    lat[m] - r["lat_min"],
                    r["lat_max"] - lat[m],
                ]
            )
            dfp = np.floor(depth * FP + 0.5).astype(np.int64)
            outs.append(
                pa.table(
                    {
                        "rel_id": pa.array(np.full(int(m.sum()), r["rel_id"], dtype=np.int64), type=pa.int64()),
                        "one": pa.array(np.ones(int(m.sum()), dtype=np.int64), type=pa.int64()),
                        "dfp": pa.array(dfp, type=pa.int64()),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "rel_id": pa.array([], type=pa.int64()),
                    "one": pa.array([], type=pa.int64()),
                    "dfp": pa.array([], type=pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    agg = (
        source(sf_dir)
        .map_batches(margins, batch_format="pyarrow")
        .groupby("rel_id")
        .aggregate(
            Sum("one", alias_name="n_points"),
            Min("dfp", alias_name="min_depth_fp"),
            Sum("dfp", alias_name="sum_depth_fp"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        mean = _dr(
            t["sum_depth_fp"].to_numpy().astype(np.float64)
            / np.float64(FP)
            / t["n_points"].to_numpy().astype(np.float64),
            6,
        )
        out = t.drop_columns(["sum_depth_fp"])
        return out.append_column("mean_depth", pa.array(mean, type=pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def zone_median_center(sf_dir: str, iters: int = 8, source=points_from_documents) -> rd.Dataset:
    """Geometric MEDIAN center per admin zone (Weiszfeld, fixed 8
    iterations): the robust central feature (unlike the mean center in
    zone_dispersion, one outlying point cannot drag it) — the "where do
    I pin the label / depot?" statistic of spatial analysis.

    Determinism: per-zone points sort by doc_id before the fixed-
    iteration kernel (geometry.weiszfeld_fixed), so the float sequence
    is identical on any worker; the golden oracle re-runs the same
    kernel on an INDEPENDENTLY recomputed zone assignment and ordering.

    Scale shape: broadcast-PiP assignment, ONE zone-keyed regroup
    (zones are few; per-zone points stream into one task each — at
    larger zones swap in the weighted-coreset sketch).

    Output: (rel_id, n_points, med_lon, med_lat).
    """
    from .. import geometry as _geom
    from ..stages import geo as _geo
    from ..stages.common import duckdb_round as _dr

    idx_ref = boundary_index_ref()
    joined = source(sf_dir).map_batches(
        _geo.PiPJoinActor,
        fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("doc_id", "lon", "lat")),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    )

    def per_zone(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending")])
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        x, y = _geom.weiszfeld_fixed(lon, lat, iters)
        return pa.table(
            {
                "rel_id": pa.array([int(g["rel_id"][0].as_py())], type=pa.int64()),
                "n_points": pa.array([g.num_rows], type=pa.int64()),
                "med_lon": pa.array([float(_dr(np.array([x]), 6)[0])], type=pa.float64()),
                "med_lat": pa.array([float(_dr(np.array([y]), 6)[0])], type=pa.float64()),
            }
        )

    return joined.groupby("rel_id").map_groups(per_zone, batch_format="pyarrow")
