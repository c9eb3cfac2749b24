"""Geo-privacy: k-anonymity location generalization over the tile
pyramid.

Before geo-tagged image records leave a training-data pipeline, raw
positions must be coarsened so no published cell isolates fewer than
``k`` records (the standard k-anonymity contract for location data).
Each point is published at the FINEST slippy-tile ancestor whose
global occupancy is ≥ k, walking a fixed zoom ladder fine→coarse;
points whose coarsest-ladder cell still holds < k records are
suppressed.  (Reference analogue: the per-cell counters of A3/A5 and
the tile assignment of M8 — this composes them into the release
policy layer; slippy math is `plasmap_ray/tiles.py`, proven
bit-identical to the SQL oracle by the tile_* query family.)

Scale shape (10^12 rows):
- base occupancy at the finest zoom: map-side per-batch combiner →
  one groupby — only (tile, n) int64 partials shuffle;
- coarser levels roll up the previous LEVEL'S AGGREGATE (tiles rows,
  shrinking 4× per level — the tile_pyramid pattern);
- the per-base-tile policy (finest qualifying zoom) is computed by
  cogrouping each level's aggregate with the base table on the
  ancestor key — tile-bounded shuffles, never input rows;
- the point-assignment join broadcasts the finished mapping
  (tiles-bounded; ≤ a few MB at city scale).  At planet scale with a
  z12+ base the mapping outgrows a broadcast — switch the final step
  to the cell-keyed shuffle join (`pip_join_shuffle_pipeline`
  pattern: points and mapping rows co-partition on the base tile),
  which needs no new machinery.

Determinism: everything that moves is int64 (tile ids, counts);
the only floats are the already-proven tile_xy trig inputs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .. import tiles
from .spatial import points_from_documents

KANON_K = 30
KANON_ZOOMS = (12, 10, 8)  # fine -> coarse ladder


def _base_counts(pts: rd.Dataset, z: int) -> rd.Dataset:
    """(x, y, n) occupancy at zoom ``z`` with a map-side combiner."""

    def partial(t: pa.Table) -> pa.Table:
        x, y = tiles.tile_xy(t["lon"].to_numpy(), t["lat"].to_numpy(), z)
        key = (x << np.int64(z)) | y
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "x": pa.array(uniq >> np.int64(z), type=pa.int64()),
                "y": pa.array(uniq & np.int64((1 << z) - 1), type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    return pts.map_batches(partial, batch_format="pyarrow").groupby(["x", "y"]).aggregate(
        Sum("n", alias_name="n")
    )


def _attach_level(base: rd.Dataset, level: rd.Dataset, shift: int, col: str) -> rd.Dataset:
    """Attach ``level``'s count to every base row whose ancestor
    (x >> shift, y >> shift) matches — a tagged-union cogroup (both
    sides are tile-bounded aggregates, so this shuffle never sees
    input rows)."""

    base_cols = list(base.schema().names)

    def tag_base(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        out = {
            "kx": pa.array(x >> shift, type=pa.int64()),
            "ky": pa.array(y >> shift, type=pa.int64()),
            "side": pa.array(np.zeros(len(x), dtype=np.int8)),
            col: pa.array(np.zeros(len(x), dtype=np.int64)),
        }
        for c in base_cols:
            out[c] = t[c]
        return pa.table(out)

    def tag_level(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "kx": t["x"],
            "ky": t["y"],
            "side": pa.array(np.ones(n, dtype=np.int8)),
            col: t["n"],
        }
        for c in base_cols:  # same order as tag_base so union schemas align
            if c in ("x", "y"):
                cols[c] = pa.array(np.full(n, -1, dtype=np.int64))
            else:
                cols[c] = pa.array(np.zeros(n, dtype=np.int64))
        return pa.table(cols)

    tagged = base.map_batches(tag_base, batch_format="pyarrow").union(
        level.map_batches(tag_level, batch_format="pyarrow")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lv = g[g["side"] == 1]
        val = int(lv[col].iloc[0]) if len(lv) else 0
        out = g[g["side"] == 0].copy()
        out[col] = val
        return out.drop(columns=["kx", "ky", "side"])

    return tagged.groupby(["kx", "ky"]).map_groups(merge, batch_format="pandas")


def k_anonymity_mapping(
    pts: rd.Dataset, k: int = KANON_K, zooms: tuple[int, ...] = KANON_ZOOMS
) -> rd.Dataset:
    """Per-base-tile release policy: (x, y, anon_z, anon_x, anon_y).

    ``anon_z`` is the finest ladder zoom whose ancestor holds ≥ k
    points, or -1 (suppressed, anon_x/anon_y = -1 too).
    """
    z_base = zooms[0]
    levels = [_base_counts(pts, z_base).materialize()]
    cur = levels[0]
    for z_prev, z in zip(zooms, zooms[1:]):
        s = z_prev - z

        def parent(t: pa.Table, _s=s) -> pa.Table:
            return pa.table(
                {
                    "x": pa.compute.shift_right(t["x"], _s),
                    "y": pa.compute.shift_right(t["y"], _s),
                    "n": t["n"],
                }
            )

        cur = (
            cur.map_batches(parent, batch_format="pyarrow")
            .groupby(["x", "y"])
            .aggregate(Sum("n", alias_name="n"))
            .materialize()
        )
        levels.append(cur)

    merged = levels[0]
    for i, z in enumerate(zooms[1:], start=1):
        merged = _attach_level(merged, levels[i], shift=z_base - z, col=f"n_z{z}")

    def policy(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        anon_z = np.full(len(x), -1, dtype=np.int64)
        anon_x = np.full(len(x), -1, dtype=np.int64)
        anon_y = np.full(len(x), -1, dtype=np.int64)
        # coarse -> fine so the finest qualifying zoom wins
        for z in reversed(zooms):
            n = t["n"].to_numpy() if z == z_base else t[f"n_z{z}"].to_numpy()
            s = z_base - z
            ok = n >= k
            anon_z[ok] = z
            anon_x[ok] = x[ok] >> s
            anon_y[ok] = y[ok] >> s
        return pa.table(
            {
                "x": t["x"],
                "y": t["y"],
                "anon_z": pa.array(anon_z, type=pa.int64()),
                "anon_x": pa.array(anon_x, type=pa.int64()),
                "anon_y": pa.array(anon_y, type=pa.int64()),
            }
        )

    return merged.map_batches(policy, batch_format="pyarrow")


def k_anonymity_from_points(
    pts: rd.Dataset, k: int = KANON_K, zooms: tuple[int, ...] = KANON_ZOOMS
) -> rd.Dataset:
    """(doc_id, anon_z, anon_x, anon_y) per point — the release table."""
    z_base = zooms[0]
    mapping = k_anonymity_mapping(pts, k=k, zooms=zooms)
    mt = pa.concat_tables(
        [b for b in mapping.iter_batches(batch_format="pyarrow")]
    )  # tile-bounded policy table, never input rows
    keys = (mt["x"].to_numpy() << np.int64(z_base)) | mt["y"].to_numpy()
    order = np.argsort(keys)
    lut_ref = ray.put(
        (
            keys[order],
            mt["anon_z"].to_numpy()[order],
            mt["anon_x"].to_numpy()[order],
            mt["anon_y"].to_numpy()[order],
        )
    )

    def assign(t: pa.Table, _ref=lut_ref) -> pa.Table:
        kk, az, ax, ay = ray.get(_ref) if not isinstance(_ref, tuple) else _ref
        x, y = tiles.tile_xy(t["lon"].to_numpy(), t["lat"].to_numpy(), z_base)
        key = (x << np.int64(z_base)) | y
        pos = np.searchsorted(kk, key)  # every point's tile is in the map
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "anon_z": pa.array(az[pos], type=pa.int64()),
                "anon_x": pa.array(ax[pos], type=pa.int64()),
                "anon_y": pa.array(ay[pos], type=pa.int64()),
            }
        )

    return pts.map_batches(assign, batch_format="pyarrow")


def k_anonymity(sf_dir: str, k: int = KANON_K, zooms: tuple[int, ...] = KANON_ZOOMS) -> rd.Dataset:
    """Driver-contract query over the documents point cloud."""
    return k_anonymity_from_points(points_from_documents(sf_dir), k=k, zooms=zooms)


# ---------------------------------------------------------------------------
# dp_tile_counts (noised aggregate release)
# ---------------------------------------------------------------------------

DP_Z = 10
DP_BOUND = 5  # noise bound B: additive noise uniform in [-B, B]
DP_MULT = 1_103_515_245  # glibc LCG multiplier — disjoint from other fixture mixes
DP_ADD = 12345
DP_M31 = 1 << 31


def dp_tile_counts(sf_dir: str, z: int = DP_Z, bound: int = DP_BOUND) -> rd.Dataset:
    """Noised per-tile count release: the privacy-layer complement to
    k_anonymity — instead of coarsening the location, perturb the
    aggregate.  Noise is a DETERMINISTIC integer function of the tile
    key (seeded LCG mix -> uniform in [-B, B]), which keeps the release
    engine-reproducible and SQL-mirrorable; a production DP deployment
    swaps the sampler for a two-sided geometric at the same call site
    (the release shape — aggregate, perturb, clamp at zero — is what
    this operator pins).

    Scale: the tile histogram's combiner + one lattice-bounded groupby;
    the noise map is stateless.  Output: (z, x, y, n_noised).
    """
    import os as _os

    import pyarrow.compute as _pc

    from .. import fixtures as _fx
    from .. import tiles as _tiles

    ds = rd.read_parquet(_os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        x, y = _tiles.tile_xy(_fx.derive_lon(ids), _fx.derive_lat(ids), z)
        key = x.astype(np.int64) * (1 << z) + y
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uniq, type=pa.int64()), "n": pa.array(cnt.astype(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("key").aggregate(
        Sum("n", alias_name="n")
    )

    def release(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy().astype(np.int64)
        n = t["n"].to_numpy().astype(np.int64)
        noise = ((key * DP_MULT + DP_ADD) % DP_M31) % (2 * bound + 1) - bound
        rel = np.maximum(n + noise, 0)
        return pa.table(
            {
                "z": pa.array(np.full(len(key), z, dtype=np.int64)),
                "x": pa.array(key // (1 << z), type=pa.int64()),
                "y": pa.array(key % (1 << z), type=pa.int64()),
                "n_noised": pa.array(rel, type=pa.int64()),
            }
        )

    return agg.map_batches(release, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# location_unicity (re-identification risk of top-k location signatures)
# ---------------------------------------------------------------------------

UNICITY_PITCH = 0.1
UNICITY_KS = (1, 2, 3)


def location_unicity(sf_dir: str, pitch: float = UNICITY_PITCH, ks: tuple[int, ...] = UNICITY_KS) -> rd.Dataset:
    """Re-identification risk audit: for each k, the share of users whose
    top-k most-visited cells form a UNIQUE signature in the corpus — the
    de Montjoye unicity metric ("how many points identify you") that
    motivates k_anonymity / dp_tile_counts before any location release.

    Shape: one (user, cell) count shuffle; a user-bounded regroup emits
    each user's canonical top-k signature string (count desc, cell-key
    tiebreak — a total order, so signatures are engine-independent);
    a signature-keyed count + a k-keyed reduce produce three integers
    and one mirrored share division per k.
    Output: (k, n_users, n_unique, unicity).
    """
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    from .. import fixtures
    from ..stages.common import duckdb_round as _dr

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id"])

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
                "cell": pa.array(uniq % (1024 * 1024), type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = (
        ds.map_batches(ucell_counts, batch_format="pyarrow")
        .groupby(["user_id", "cell"])
        .aggregate(_Sum("n", alias_name="n"))
    )

    def signatures(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "cell"], ascending=[False, True])
        cells = g["cell"].to_list()
        rows = []
        for k in ks:
            rows.append({"k": k, "sig": "|".join(str(c) for c in cells[:k])})
        return pd.DataFrame(rows)

    sigs = counts.groupby("user_id").map_groups(signatures, batch_format="pandas")
    per_sig = sigs.groupby(["k", "sig"]).aggregate(_Count(alias_name="n_users_sig"))

    def flags(t: pa.Table) -> pa.Table:
        nu = t["n_users_sig"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "k": t["k"],
                "n_users": pa.array(nu, type=pa.int64()),
                "n_unique": pa.array((nu == 1).astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        per_sig.map_batches(flags, batch_format="pyarrow")
        .groupby("k")
        .aggregate(_Sum("n_users", alias_name="n_users"), _Sum("n_unique", alias_name="n_unique"))
    )

    def share(t: pa.Table) -> pa.Table:
        u = t["n_unique"].to_numpy().astype(np.float64) / t["n_users"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "k": pa.array(t["k"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_users": t["n_users"],
                "n_unique": t["n_unique"],
                "unicity": pa.array(_dr(u, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(share, batch_format="pyarrow").sort("k")


# ---------------------------------------------------------------------------
# l_diversity (sensitive-attribute diversity per released cell)
# ---------------------------------------------------------------------------

LDIV_Z = 10
LDIV_L = 3


def l_diversity(sf_dir: str, z: int = LDIV_Z, l_min: int = LDIV_L) -> rd.Dataset:
    """l-diversity audit: k-anonymity's sibling invariant — a released
    cell is safe only if its members are diverse in the SENSITIVE
    attribute (here: document language per z10 tile), not merely
    numerous.  A tile with 50 points that are all one language still
    leaks; this flags it.

    Shape: map-side (x, y, lang) combiner (distinct triples per batch,
    never rows), one lattice×langs-bounded groupby, then the per-tile
    reduce counts distinct languages (exact — the combiner output IS
    the distinct set).  Output: (x, y, n_points, n_langs, meets_l).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count as _Count

    from .. import fixtures as _fx

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        x, y = tiles.tile_xy(_fx.derive_lon(ids), _fx.derive_lat(ids), z)
        df = pd.DataFrame({"x": x, "y": y, "lang": t["lang"].to_pylist()})
        g = df.groupby(["x", "y", "lang"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "x": pa.array(g["x"].to_numpy(), type=pa.int64()),
                "y": pa.array(g["y"].to_numpy(), type=pa.int64()),
                "lang": pa.array(g["lang"].tolist(), type=pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            }
        )

    per_lang = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["x", "y", "lang"])
        .aggregate(Sum("n", alias_name="n"))
    )
    per_tile = per_lang.groupby(["x", "y"]).aggregate(
        Sum("n", alias_name="n_points"), _Count(alias_name="n_langs")
    )

    def finish(t: pa.Table) -> pa.Table:
        meets = pc.cast(pc.greater_equal(t["n_langs"], pa.scalar(l_min, type=pa.int64())), pa.int64())
        return pa.table(
            {
                "x": t["x"],
                "y": t["y"],
                "n_points": pc.cast(t["n_points"], pa.int64()),
                "n_langs": pc.cast(t["n_langs"], pa.int64()),
                "meets_l": meets,
            }
        )

    return per_tile.map_batches(finish, batch_format="pyarrow")


TCLOSE_Z = 10
TCLOSE_T = 0.15


def t_closeness(sf_dir: str, z: int = TCLOSE_Z, t_max: float = TCLOSE_T) -> rd.Dataset:
    """t-closeness audit: the strictest of the k/l/t release ladder —
    a tile is safe only if its sensitive-attribute DISTRIBUTION (lang
    per z10 tile) stays within ``t_max`` of the corpus-wide
    distribution.  For a categorical attribute the earth-mover
    distance reduces to total variation:

        tvd(tile) = ½ · Σ_lang |p_tile(lang) − p_global(lang)|

    (absent langs contribute their full global mass).  Flags the
    tiles l_diversity misses: diverse-but-skewed cells that still
    leak via distribution shift.

    Exactness: all counts are int64 through the aggregate tree; the
    TVD sum runs over the bounded global lang set with each term
    mirrored in SQL; the threshold compares the UNROUNDED tvd on both
    sides.

    Scale shape: the l_diversity (x, y, lang) combiner -> one
    tiles×langs-bounded groupby; the global lang vector is a second
    tiny reduce broadcast into the per-tile finalize (map_groups
    keyed by tile — exchange bounded by tiles×langs, never rows).
    Output: (x, y, n_points, tvd, meets_t).
    """
    from .. import fixtures as _fx
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        x, y = tiles.tile_xy(_fx.derive_lon(ids), _fx.derive_lat(ids), z)
        df = pd.DataFrame({"x": x, "y": y, "lang": t["lang"].to_pylist()})
        g = df.groupby(["x", "y", "lang"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "x": pa.array(g["x"].to_numpy(), type=pa.int64()),
                "y": pa.array(g["y"].to_numpy(), type=pa.int64()),
                "lang": pa.array(g["lang"].tolist(), type=pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            }
        )

    per_lang = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["x", "y", "lang"])
        .aggregate(Sum("n", alias_name="n"))
    )

    # global lang distribution: a second tiny reduce over the combiner output
    gdf = per_lang.groupby("lang").aggregate(Sum("n", alias_name="gn")).to_pandas()
    gdf = gdf.sort_values("lang").reset_index(drop=True)
    langs = gdf["lang"].tolist()
    gn = gdf["gn"].to_numpy().astype(np.float64)
    gt = float(gn.sum())
    pg = gn / gt
    lang_pos = {l: i for i, l in enumerate(langs)}

    def per_tile(g: pd.DataFrame) -> pd.DataFrame:
        nt = float(g["n"].sum())
        pt = np.zeros(len(langs), dtype=np.float64)
        idx = np.fromiter((lang_pos[l] for l in g["lang"]), dtype=np.int64, count=len(g))
        pt[idx] = g["n"].to_numpy().astype(np.float64) / nt
        tvd = 0.5 * np.abs(pt - pg).sum()
        return pd.DataFrame(
            {
                "x": [np.int64(g["x"].iloc[0])],
                "y": [np.int64(g["y"].iloc[0])],
                "n_points": [np.int64(g["n"].sum())],
                "tvd": duckdb_round(np.array([tvd]), 6),
                "meets_t": [np.int64(tvd <= t_max)],
            }
        )

    return per_lang.groupby(["x", "y"]).map_groups(per_tile, batch_format="pandas")
