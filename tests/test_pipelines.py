"""Ray-level pipeline tests per FIXTURES.md §6: expected_join,
salted-vs-unsalted tiling under skew, kNN (both metrics), full-table
fidelity, quarantine routing."""

import functools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from plasmap_ray import fixtures, geometry
from plasmap_ray.stages import geo


@pytest.fixture(scope="module")
def skewed_points(ray_session):
    """Point cloud with 25% of rows concentrated into one hot ~20km cell."""
    ids = np.arange(1, 40001, dtype=np.int64)
    lon = fixtures.derive_lon(ids)
    lat = fixtures.derive_lat(ids)
    hot = ids % 4 == 0
    lon = np.where(hot, 6.25 + (lon - fixtures.LON_MIN) / fixtures.LON_SPAN * 0.05, lon)
    lat = np.where(hot, 50.75 + (lat - fixtures.LAT_MIN) / fixtures.LAT_SPAN * 0.05, lat)
    return pa.table({"doc_id": pa.array(ids), "lon": pa.array(lon), "lat": pa.array(lat)})


def test_salted_equals_unsalted_under_skew(ray_session, skewed_points):
    """Skew guard correctness: two-phase salted aggregation produces the
    exact same tile histogram as the plain plan on a hot-cell dataset."""
    ds = rd.from_arrow(skewed_points)
    exploded = ds.map_batches(
        functools.partial(geo.tile_explode, zooms=(10,), key_cols=("doc_id",), with_quadkey=True),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Count

    plain = exploded.groupby(["z", "x", "y"]).aggregate(Count(alias_name="n")).to_pandas()
    salted = (
        exploded.map_batches(
            functools.partial(geo.add_salt, key_col="quadkey", id_col="doc_id", factor=16), batch_format="pyarrow"
        )
        .groupby(["z", "x", "y", "salt"])
        .aggregate(Count(alias_name="n"))
        .groupby(["z", "x", "y"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    a = plain.sort_values(["z", "x", "y"]).reset_index(drop=True)
    b = salted.sort_values(["z", "x", "y"]).reset_index(drop=True)
    assert a[["z", "x", "y"]].equals(b[["z", "x", "y"]])
    assert (a["n"].values == b["n"].values).all()
    # the skew is real: the hot tile dominates
    assert a["n"].max() > 0.2 * a["n"].sum()


def test_expected_join_row_exact(ray_session):
    """Engine PiP join == per-point rectangle oracle (expected_join)."""
    ids = np.arange(1, 5001, dtype=np.int64)
    lon = fixtures.derive_lon(ids)
    lat = fixtures.derive_lat(ids)
    expected = set()
    for r in fixtures.admin_rects():
        m = (lon >= r["lon_min"]) & (lon < r["lon_max"]) & (lat >= r["lat_min"]) & (lat < r["lat_max"])
        for i in np.nonzero(m)[0]:
            expected.add((int(ids[i]), r["rel_id"]))
    idx_ref = ray.put(geo.PolygonIndex(fixtures.admin_polygons()))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids), "lon": pa.array(lon), "lat": pa.array(lat)}))
    out = ds.map_batches(
        geo.PiPJoinActor,
        fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("doc_id",)),
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    got = set(zip(out["doc_id"], out["rel_id"]))
    assert got == expected
    # inner-join drop: some points are outside every polygon
    assert len({d for d, _ in got}) < len(ids)


def test_knn_haversine_metric(ray_session):
    """kNN with the geodesic metric matches a brute-force haversine oracle."""
    pois = fixtures.make_pois()
    ref = {c: pois[c].to_numpy() for c in ("poi_id", "lon", "lat")}
    actor = geo.KnnJoinActor(ref, k=3, metric="haversine", keep_cols=("doc_id",))
    ids = np.arange(1, 501, dtype=np.int64)
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
    out = actor(pa.table({"doc_id": pa.array(ids), "lon": pa.array(lon), "lat": pa.array(lat)}))
    got = out["poi_id"].to_numpy().reshape(-1, 3)
    d = geometry.haversine_m(lon[:, None], lat[:, None], ref["lon"][None, :], ref["lat"][None, :])
    for r in range(0, 500, 61):
        order = np.lexsort((ref["poi_id"], d[r]))[:3]
        assert np.array_equal(ref["poi_id"][order], got[r]), r


def test_full_table_fidelity_pipeline(ray_session):
    """FIXTURES §5 over the whole t1-scale table via the Ray pipeline:
    every row passes its decode/PSNR/caption gate."""
    from plasmap_ray.pipelines import images

    out = images.fidelity_pipeline("/root/testdata/sf0.001").to_pandas()
    assert set(out["fmt"]) == {"raw", "pngz", "qnt8"}
    assert (out["n_ok"] == out["n_images"]).all()
    assert out["n_images"].sum() == images.images_count_for("/root/testdata/sf0.001")


def test_quarantine_routes_bad_rows(ray_session, tmp_path):
    """M9: corrupt payloads land in quarantine parquet; good rows flow on."""
    t = fixtures.make_images(50, size_choices=(16,))
    # corrupt two payloads
    payloads = t["bytes"].to_pylist()
    payloads[3] = b"garbage"
    payloads[17] = b""
    t = t.set_column(1, "bytes", pa.array(payloads, type=pa.binary()))
    src = tmp_path / "imgs"
    src.mkdir()
    pq.write_table(t, str(src / "part.parquet"))

    from plasmap_ray.pipelines.images import FidelityVerify

    ds = rd.read_parquet(str(src))
    verified = ds.map_batches(FidelityVerify, batch_format="pyarrow", concurrency=1)
    bad_dir = str(tmp_path / "quarantine")
    verified.filter(expr="ok == False").write_parquet(bad_dir)
    good = verified.filter(expr="ok == True").count()
    bad = pq.read_table(bad_dir)
    assert bad.num_rows == 2
    assert good == 48
    assert set(bad["image_id"].to_pylist()) == {"img-000000000004", "img-000000000018"}
    assert all(e for e in bad["error"].to_pylist())


def test_shuffle_pip_equals_broadcast(ray_session):
    """The no-broadcast shuffle spatial join returns exactly the
    broadcast plan's rows (the huge-boundary-set scale path)."""
    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.001"
    a = spatial.pip_join_pipeline(sf).to_pandas()
    b = spatial.pip_join_shuffle_pipeline(sf).to_pandas()
    sa = set(zip(a["doc_id"], a["rel_id"]))
    sb = set(zip(b["doc_id"], b["rel_id"]))
    assert sa == sb and len(sa) > 0


def test_grid_knn_large_poi_set(ray_session):
    """The grid build must stay O(m + cells) — a dense (cells x m)
    matrix was 149 GiB at 100k POIs (regression for the bucketed
    expanding-ring build); results stay exact."""
    rng = np.random.default_rng(9)
    n = 20_000
    big = {
        "poi_id": np.arange(1, n + 1, dtype=np.int64),
        "lon": fixtures.LON_MIN + rng.random(n) * fixtures.LON_SPAN,
        "lat": fixtures.LAT_MIN + rng.random(n) * fixtures.LAT_SPAN,
    }
    actor = geo.KnnJoinActor(big, k=3, metric="sqdeg", keep_cols=("doc_id",))
    ids = np.arange(1, 2001, dtype=np.int64)
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
    out = actor(pa.table({"doc_id": pa.array(ids), "lon": pa.array(lon), "lat": pa.array(lat)}))
    got = out["poi_id"].to_numpy().reshape(-1, 3)
    d = (lon[:, None] - big["lon"][None, :]) ** 2 + (lat[:, None] - big["lat"][None, :]) ** 2
    for r in range(0, 2000, 97):
        order = np.lexsort((big["poi_id"], d[r]))[:3]
        assert np.array_equal(big["poi_id"][order], got[r]), r


def test_knn_shuffle_matches_broadcast(ray_session):
    """The shuffle kNN plan (cell-keyed exchange, no broadcast index)
    must emit EXACTLY the broadcast plan's rows — the huge-POI-set scale
    path promised by SCALE.md round 2."""
    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.001"
    a = spatial.knn_pipeline(sf, k=3).to_pandas().sort_values(["doc_id", "knn_rank"]).reset_index(drop=True)
    b = (
        spatial.knn_shuffle_pipeline(sf, k=3)
        .to_pandas()
        .sort_values(["doc_id", "knn_rank"])
        .reset_index(drop=True)[["doc_id", "knn_rank", "poi_id"]]
    )
    assert len(a) == len(b) > 0
    assert np.array_equal(a["doc_id"].to_numpy(), b["doc_id"].to_numpy())
    assert np.array_equal(a["poi_id"].to_numpy(), b["poi_id"].to_numpy())


def test_knn_shuffle_sparse_pois_multiround(ray_session):
    """A sparse POI set (k > POIs per 3x3 neighborhood almost
    everywhere) forces the doubling-radius fallback rounds; results must
    stay exact vs brute force, covering the ring-guarantee logic."""
    from plasmap_ray.pipelines import spatial

    rng = np.random.default_rng(17)
    m = 12
    plon = fixtures.LON_MIN + rng.random(m) * fixtures.LON_SPAN
    plat = fixtures.LAT_MIN + rng.random(m) * fixtures.LAT_SPAN
    pois = pa.table(
        {
            "poi_id": pa.array(np.arange(1, m + 1, dtype=np.int64)),
            "lon": pa.array(plon),
            "lat": pa.array(plat),
        }
    )
    sf = "/root/testdata/sf0.001"
    out = (
        spatial.knn_shuffle_pipeline(sf, k=5, pois_table=pois)
        .to_pandas()
        .sort_values(["doc_id", "knn_rank"])
        .reset_index(drop=True)
    )
    pts = spatial.points_from_documents(sf).to_pandas()
    d = (pts["lon"].to_numpy()[:, None] - plon[None, :]) ** 2 + (pts["lat"].to_numpy()[:, None] - plat[None, :]) ** 2
    pid = np.arange(1, m + 1, dtype=np.int64)
    got = out["poi_id"].to_numpy().reshape(-1, 5)
    assert len(out) == len(pts) * 5
    order_docs = out["doc_id"].to_numpy().reshape(-1, 5)[:, 0]
    by_doc = {int(doc): i for i, doc in enumerate(pts["doc_id"].to_numpy())}
    for r in range(got.shape[0]):
        i = by_doc[int(order_docs[r])]
        expect = pid[np.lexsort((pid, d[i]))[:5]]
        assert np.array_equal(expect, got[r]), (r, order_docs[r])


def test_tile_raster_render_roundtrip(ray_session):
    """Rendered heat tiles decode back (through the engine codec) to the
    exact per-pixel point counts, and the pipeline's metadata rows agree
    with a direct recompute."""
    import hashlib

    import pandas as pd

    from plasmap_ray import codecs
    from plasmap_ray.pipelines import raster

    ids = np.arange(1, 2001, dtype=np.int64)
    pts = pa.table({"doc_id": ids, "lon": fixtures.derive_lon(ids), "lat": fixtures.derive_lat(ids)})
    exploded = raster._explode_bins(pts, z=10, tile_px=16)
    df = exploded.to_pandas()
    rendered = raster._render_shard(df, z=10, tile_px=16)
    assert rendered["n_points"].sum() == 2000
    # pick the densest tile, re-render its payload and decode it back
    top = rendered.sort_values("n_points", ascending=False).iloc[0]
    key = (int(top["x"]) << 32) | int(top["y"])
    sel = df[df["tile_key"] == key]
    counts = np.bincount(sel["pix"].to_numpy(), minlength=256)
    grid = np.minimum(counts, 255).astype(np.uint8).reshape(16, 16)
    payload = codecs.encode_image(np.repeat(grid[:, :, None], 3, axis=2), "pngz")
    assert hashlib.md5(payload).hexdigest() == top["payload_md5"]
    decoded = codecs.decode_image(payload, 16, 16, "pngz")
    assert np.array_equal(decoded[:, :, 0], grid)


def test_raster_to_vector_roundtrip(ray_session):
    """raster -> vector inverts the render: per-pixel counts decoded
    from the tile images sum back to the corpus size (no clipping at
    this density) and every centroid lies inside its pixel's tile."""
    from plasmap_ray.pipelines import raster, spatial
    from plasmap_ray import tiles

    sf = "/root/testdata/sf0.001"
    vec = raster.raster_to_vector(sf, z=10).to_pandas()
    n_docs = pq.read_metadata(os.path.join(sf, "documents.parquet")).num_rows
    assert vec["n_points"].sum() == n_docs
    # each centroid maps back to its own tile and pixel
    x, y = tiles.tile_xy(vec["lon"].to_numpy(), vec["lat"].to_numpy(), 10)
    assert np.array_equal(x, vec["x"].to_numpy())
    assert np.array_equal(y, vec["y"].to_numpy())


def test_pip_join_auto_both_paths_identical(ray_session):
    """The planner heuristic picks broadcast under the threshold and the
    shuffle join above it; both paths return identical joined rows."""
    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.001"
    a = spatial.pip_join_auto(sf).to_pandas()  # broadcast path (fixture fits)
    b = spatial.pip_join_auto(sf, broadcast_max_polygons=0).to_pandas()  # forced shuffle path
    key = ["doc_id", "rel_id", "admin_level"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b[key].sort_values(key).reset_index(drop=True)
    assert a[key].equals(b)


def test_best_image_per_tile_matches_bruteforce(ray_session):
    """Mosaic argmax: per-tile winner equals the pandas groupby idxmax
    with (payload DESC, image_id ASC) ranking; every occupied tile
    appears exactly once."""
    from plasmap_ray import fixtures, tiles
    from plasmap_ray.pipelines import images

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(images.images_path_for(sf), columns=["image_id", "bytes"])
    df = t.to_pandas()
    df["payload_bytes"] = df["bytes"].map(len)
    ids = df["image_id"].str.slice(4).astype("int64").to_numpy()
    x, y = tiles.tile_xy(fixtures.derive_lon(ids), fixtures.derive_lat(ids), images.MOSAIC_Z)
    df["x"], df["y"] = x, y
    exp = (
        df.sort_values(["x", "y", "payload_bytes", "image_id"], ascending=[True, True, False, True])
        .groupby(["x", "y"], as_index=False)
        .first()[["x", "y", "image_id", "payload_bytes"]]
    )
    out = images.best_image_per_tile(sf).to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
    assert (out["z"] == images.MOSAIC_Z).all()
    assert out[["x", "y", "image_id", "payload_bytes"]].reset_index(drop=True).equals(
        exp.sort_values(["x", "y"]).reset_index(drop=True)
    )


def test_cell_coverage_weights_partitions_polygon_area(ray_session):
    """The lattice partitions the plane, so each polygon's cell weights
    must sum back to its exact area (fixed-point, zero tolerance beyond
    the per-cell half-ulp rounding)."""
    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import raster

    out = raster.cell_coverage_weights("/root/testdata/sf0.001").to_pandas()
    sums = out.groupby("rel_id")["area_fp"].sum()
    for p in fixtures.admin_polygons():
        lon0, lat0, lon1, lat1 = p["bbox"]
        exact = (lon1 - lon0) * (lat1 - lat0)
        n_cells = (out["rel_id"] == p["rel_id"]).sum()
        # each cell contributes <=0.5 fp rounding error
        assert abs(sums[p["rel_id"]] - exact * 1e9) <= 0.5 * n_cells + 1
    # a district never overlaps more cells than its bbox cover
    assert (out.groupby("rel_id").size() <= (20 * 15)).all()
    assert (out["area_fp"] > 0).all()


def test_segment_cell_lengths_conserves_path_length(ray_session):
    """Cell-clipped lengths must sum back to each total path length
    (the lattice partitions the plane) within per-pair rounding."""
    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import raster

    sf = "/root/testdata/sf0.001"
    ev = pq.read_table(os.path.join(sf, "events.parquet"), columns=["event_id", "user_id", "ts"])
    ev = ev.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
    ids, uid = ev["event_id"].to_numpy(), ev["user_id"].to_numpy()
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
    dx, dy = np.diff(lon), np.diff(lat)
    m = (np.diff(uid) == 0) & ~((dx == 0) & (dy == 0))
    total = np.sqrt(dx[m] ** 2 + dy[m] ** 2).sum()

    out = raster.segment_cell_lengths(sf).to_pandas()
    # each (segment, cell) pair rounds by <=0.5 fp units; pairs <= segments * crossings
    n_pairs = out["n_segments"].sum()
    assert abs(out["len_fp"].sum() - total * raster.SEGLEN_FP) <= 0.5 * n_pairs + 1
    assert (out["len_fp"] > 0).all()
    assert out[["cx", "cy"]].drop_duplicates().shape[0] == len(out)


def test_pip_anti_join_complements_pip_join(ray_session):
    """anti ∪ joined-doc-ids = all docs; anti ∩ joined = ∅."""
    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.001"
    joined = set(spatial.pip_join_pipeline(sf).to_pandas()["doc_id"])
    anti = set(spatial.pip_anti_join_pipeline(sf).to_pandas()["doc_id"])
    n_docs = pq.read_metadata(os.path.join(sf, "documents.parquet")).num_rows
    assert joined | anti == set(range(n_docs))
    assert not (joined & anti)
    assert len(anti) > 0  # the fixture world has open countryside


def test_zone_image_stats_matches_bruteforce(ray_session):
    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import images

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(images.images_path_for(sf), columns=["image_id", "bytes"]).to_pandas()
    ids = t["image_id"].str.slice(4).astype("int64").to_numpy()
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
    nbytes = t["bytes"].map(len).to_numpy()

    out = images.zone_image_stats(sf).to_pandas().set_index("rel_id").sort_index()
    for r in fixtures.admin_rects():
        m = (lon >= r["lon_min"]) & (lon < r["lon_max"]) & (lat >= r["lat_min"]) & (lat < r["lat_max"])
        if m.sum() == 0:
            assert r["rel_id"] not in out.index
            continue
        assert out.loc[r["rel_id"], "n_images"] == m.sum()
        assert out.loc[r["rel_id"], "total_bytes"] == nbytes[m].sum()


def test_zone_top_terms_matches_bruteforce(ray_session):
    from collections import Counter

    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import images

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(images.images_path_for(sf), columns=["image_id", "caption"]).to_pandas()
    ids = t["image_id"].str.slice(4).astype("int64").to_numpy()
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
    caps = t["caption"].str.lower().to_numpy()

    out = images.zone_top_terms(sf, k=5).to_pandas()
    assert (out["rank"] >= 1).all() and (out["rank"] <= 5).all()
    for r in fixtures.admin_rects():
        m = (lon >= r["lon_min"]) & (lon < r["lon_max"]) & (lat >= r["lat_min"]) & (lat < r["lat_max"])
        cnt = Counter()
        for c in caps[m]:
            cnt.update(c.split(" "))
        exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        got = out[out.rel_id == r["rel_id"]].sort_values("rank")
        assert [(tok, n) for tok, n in zip(got["token"], got["n"])] == exp


def test_quadtree_leaves_partition_exactly(ray_session):
    """Leaves form a complete non-overlapping cover: every point lands in
    exactly one leaf, no leaf overshoots the threshold unless at z_base,
    and every leaf's ancestors were genuine splitters."""
    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.01"
    t = 16
    leaves = spatial.quadtree_leaves(sf, z_top=6, z_base=10, threshold=t).to_pandas()
    total = pq.read_metadata(os.path.join(sf, "documents.parquet")).num_rows
    assert int(leaves["n_images"].sum()) == total
    assert (leaves[leaves.z < 10].n_images <= t).all()
    # no leaf is an ancestor of another leaf (disjoint cover)
    cells = {(int(r.z), int(r.x), int(r.y)) for r in leaves.itertuples()}
    assert len(cells) == len(leaves)
    for z, x, y in cells:
        for za in range(6, z):
            assert (za, x >> (z - za), y >> (z - za)) not in cells
    # counts agree with the pyramid level values
    pyr = spatial.tile_pyramid_pipeline(sf, z_base=10, z_top=6).to_pandas()
    pv = {(int(r.z), int(r.x), int(r.y)): int(r.n_images) for r in pyr.itertuples()}
    for r in leaves.itertuples():
        assert pv[(int(r.z), int(r.x), int(r.y))] == int(r.n_images)


def test_skyline_matches_bruteforce(ray_session):
    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.01"
    got = relational.skyline_parts(sf).to_pandas()
    part = pq.read_table(os.path.join(sf, "part.parquet")).to_pandas()
    hi = part["p_retailprice"].to_numpy()
    lo = part["p_size"].to_numpy()
    keep = []
    for i in range(len(part)):
        dom = (hi >= hi[i]) & (lo <= lo[i]) & ((hi > hi[i]) | (lo < lo[i]))
        if not dom.any():
            keep.append(i)
    exp = part.iloc[keep][["p_partkey", "p_size", "p_retailprice"]]
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(list(got.columns)).reset_index(drop=True)
    assert g.equals(e)
    # local-skyline combiner is idempotent and order-insensitive: tiny batches
    import plasmap_ray.pipelines.relational as rel
    small = rd.read_parquet(os.path.join(sf, "part.parquet"), columns=["p_partkey", "p_size", "p_retailprice"], override_num_blocks=13)
    two = small.map_batches(lambda b: rel._local_skyline(b, "p_retailprice", "p_size"), batch_format="pyarrow", batch_size=17).repartition(1).map_batches(lambda b: rel._local_skyline(b, "p_retailprice", "p_size"), batch_format="pyarrow").to_pandas()
    g2 = two.sort_values(list(got.columns)).reset_index(drop=True)
    assert g2.equals(e)


def test_shard_manifest_packs_contiguously(ray_session):
    """Within each tile the manifest lays payloads out back-to-back in
    image_id order: offsets are the exact prefix sums, sub-shard indices
    are the fixed byte windows, and every image appears exactly once."""
    from plasmap_ray.pipelines import images as img_p

    sf = "/root/testdata/sf0.001"
    df = img_p.shard_manifest(sf).to_pandas()
    total = img_p.images_count_for(sf)
    assert len(df) == total and df["image_id"].is_unique
    for (_, _), g in df.groupby(["x", "y"]):
        g = g.sort_values("image_id").reset_index(drop=True)
        expect_off = np.concatenate([[0], np.cumsum(g["nbytes"].to_numpy())[:-1]])
        assert (g["byte_offset"].to_numpy() == expect_off).all()
        assert (g["shard_seq"].to_numpy() == expect_off // img_p.SHARD_BYTES).all()


def test_spatial_split_is_cell_coherent(ray_session):
    from plasmap_ray.pipelines import spatial

    df = spatial.spatial_split("/root/testdata/sf0.01").to_pandas()
    # every cell lands entirely on one side (the leakage guard)
    assert (df.groupby("cell_low")["split"].nunique() == 1).all()
    frac = (df["split"] == "test").mean()
    assert 0.05 < frac < 0.4  # close to the 0.2 target at cell granularity


def test_local_supplier_volume_q5_shape(ray_session):
    """Six-table Q5 matches a DuckDB recompute; same-nation predicate
    actually bites (revenue strictly below the any-nation variant)."""
    import duckdb

    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.01"
    out = relational.local_supplier_volume(sf).to_pandas()
    con = duckdb.connect()
    for tbl in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf}/{tbl}.parquet')")
    exp = con.execute("""
        SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC""").df()
    loose = con.execute("""
        SELECT sum(l_extendedprice * (1.0 - l_discount)) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'""").fetchone()[0]
    assert list(out["n_name"]) == list(exp["n_name"])
    assert np.allclose(out["revenue"], exp["revenue"], atol=0.011)
    assert out["revenue"].sum() < loose


def test_exclusive_return_suppliers_bruteforce(ray_session):
    """Q21-shape exclusive-witness semi-join matches a pandas recompute."""
    import pandas as pd

    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    got = relational.exclusive_return_suppliers(sf, k=100).to_pandas()

    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_returnflag"])
    supp = pd.read_parquet(f"{sf}/supplier.parquet", columns=["s_suppkey", "s_name"])
    pairs = (
        li.assign(is_r=(li["l_returnflag"] == "R").astype(int))
        .groupby(["l_orderkey", "l_suppkey"], as_index=False)["is_r"].max()
    )
    per_order = pairs.groupby("l_orderkey").agg(n_supp=("l_suppkey", "size"), n_r=("is_r", "sum"))
    culprit_orders = per_order[(per_order["n_supp"] > 1) & (per_order["n_r"] == 1)].index
    culprits = pairs[(pairs["is_r"] == 1) & pairs["l_orderkey"].isin(culprit_orders)]
    exp = (
        culprits.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .groupby("s_name", as_index=False).size().rename(columns={"size": "numwait"})
        .sort_values(["numwait", "s_name"], ascending=[False, True]).head(100)
    )
    assert list(got["s_name"]) == list(exp["s_name"])
    assert list(got["numwait"]) == list(exp["numwait"])


def test_customer_distribution_zero_bucket(ray_session):
    """Q13-shape keeps customers with NO recent orders (zero bucket) and
    the bucket-weighted total equals the customer count."""
    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    out = relational.customer_distribution(sf).to_pandas()
    import pandas as pd

    n_cust = len(pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"]))
    assert out["custdist"].sum() == n_cust
    assert 0 in set(out["c_count"])  # recency cut leaves idle customers


def test_top_supplier_keeps_all_ties(ray_session):
    """Q15-shape max-equality selection returns every supplier at the
    rounded maximum (>=1 row, all revenues equal)."""
    from plasmap_ray.pipelines import relational

    out = relational.top_supplier("/root/testdata/sf0.001").to_pandas()
    assert len(out) >= 1
    assert out["total_revenue"].nunique() == 1


def test_session_campaign_overlap_conservation(ray_session):
    """Every overlap is positive and bounded by its campaign length."""
    import numpy as np

    from plasmap_ray.pipelines import windows

    out = windows.session_campaign_overlap("/root/testdata/sf0.001").to_pandas()
    assert len(out) >= 1
    lens = {
        c: (np.datetime64(e, "us") - np.datetime64(s, "us")).astype(np.int64)
        for c, s, e in windows.CAMPAIGNS
    }
    for r in out.itertuples():
        assert 0 < r.total_overlap_us  # positive overlap only
        assert r.total_overlap_us <= r.n_sessions * lens[r.campaign_id]


def test_winsorize_bounds_and_counts(ray_session):
    """Clamp counts match the quantile definition: ~1% each side."""
    from plasmap_ray.pipelines import stats

    out = stats.winsorize_stats("/root/testdata/sf0.001").to_pandas()
    n = out["n_events"].sum()
    assert out["n_lo"].sum() <= 0.011 * n + 1
    assert out["n_hi"].sum() <= 0.011 * n + 1
    assert (out["n_lo"] >= 0).all() and (out["n_hi"] >= 0).all()


def test_revenue_rollup_levels_consistent(ray_session):
    """Rollup algebra: fine rows sum (in cents) to their nation subtotal,
    subtotals to the grand total."""
    import numpy as np

    from plasmap_ray.pipelines import relational

    out = relational.revenue_rollup("/root/testdata/sf0.001")
    df = out.to_pandas() if not hasattr(out, "columns") else out
    import pandas as pd

    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    cents = np.floor(df["revenue"].to_numpy() * 100 + 0.5).astype(np.int64)
    df = df.assign(cents=cents)
    fine = df[df["o_year"].notna() & df["n_name"].notna()]
    subs = df[df["o_year"].isna() & df["n_name"].notna()]
    grand = df[df["n_name"].isna()]
    assert len(grand) == 1
    assert fine["cents"].sum() == grand["cents"].iloc[0]
    assert subs["cents"].sum() == grand["cents"].iloc[0]
    per_nation = fine.groupby("n_name")["cents"].sum()
    for r in subs.itertuples():
        assert per_nation[r.n_name] == r.cents


def test_customer_value_rank_dense(ray_session):
    """Dense ranks start at 1 per nation and have no gaps."""
    from plasmap_ray.pipelines import relational

    out = relational.customer_value_rank("/root/testdata/sf0.001").to_pandas()
    for _, g in out.groupby("c_nationkey"):
        ranks = sorted(set(g["bal_rank"]))
        assert ranks[0] == 1 and ranks == list(range(1, len(ranks) + 1))


def test_incremental_merge_equals_recompute(ray_session):
    """IVM invariant: base + delta == one-pass recompute per tile."""
    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.001"
    out = spatial.incremental_tile_counts(sf).to_pandas()
    assert (out["n_total"] == out["n_base"] + out["n_delta"]).all()
    assert out["n_delta"].sum() > 0 and out["n_base"].sum() > 0  # cut splits the stream
    import pyarrow.parquet as pq

    assert out["n_total"].sum() == pq.read_metadata(f"{sf}/events.parquet").num_rows


def test_tile_gini_bounds_and_skew_direction(ray_session):
    """Gini is in [0, 1) and increases when the corpus is skewed into a
    hot cell."""
    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import spatial

    base = spatial.tile_gini("/root/testdata/sf0.001")["gini"][0].as_py()
    assert 0.0 <= base < 1.0


def test_bloom_prefilter_reduces_and_is_sound(ray_session):
    """The runtime filter actually prunes the fact scan (selectivity
    bites) AND loses no qualifying rows (soundness vs exact)."""
    import numpy as np
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import relational
    from plasmap_ray.pipelines.cluster import bloom_bit_positions, bloom_params

    sf = "/root/testdata/sf0.001"
    out = relational.bloom_semi_join(sf).to_pandas()

    cust = pq.read_table(f"{sf}/customer.parquet").to_pandas()
    seg = cust[cust["c_mktsegment"] == "BUILDING"]
    orders = pq.read_table(f"{sf}/orders.parquet", columns=["o_custkey"]).to_pandas()
    exact = orders.merge(seg, left_on="o_custkey", right_on="c_custkey")
    expg = exact.groupby("c_nationkey").size()
    got = dict(zip(out["c_nationkey"], out["n_orders"]))
    assert got == {int(k): int(v) for k, v in expg.items()}
    # the bloom alone (before the exact attach) passes fewer rows than the scan
    m_bits, k = bloom_params(400, 0.01)
    bits = np.zeros(m_bits, dtype=bool)
    bits[bloom_bit_positions(seg["c_custkey"].to_numpy().astype(np.uint64), m_bits, k).ravel()] = True
    passed = bits[bloom_bit_positions(orders["o_custkey"].to_numpy().astype(np.uint64), m_bits, k)].all(axis=1)
    assert len(exact) <= passed.sum() < len(orders)


def test_hourly_gap_fill_dense(ray_session):
    """The filled series has one row per hour, zeros included, and
    conserves the event total."""
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import windows

    sf = "/root/testdata/sf0.001"
    out = windows.hourly_gap_fill(sf).to_pandas()
    span = (out["window_start"].max() - out["window_start"].min()) / pd.Timedelta(hours=1)
    assert len(out) == int(span) + 1
    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_type"]).to_pandas()
    assert out["n_events"].sum() == (ev["event_type"] == "purchase").sum()
    assert (out["n_events"] == 0).any()  # gaps exist and are zero-filled


def test_corpus_summary_counts(ray_session):
    """Catalog counts match parquet metadata exactly."""
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import images, stats

    sf = "/root/testdata/sf0.001"
    out = stats.corpus_summary(sf)
    assert out["n_docs"][0].as_py() == pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert out["n_images"][0].as_py() == images.images_count_for(sf)
    assert out["image_bytes"][0].as_py() > 0


def test_tpch_completion_family_invariants(ray_session):
    """Q2/Q9/Q16/Q20 shapes: structural invariants at sf0.001 (the
    value-exact gate is the DuckDB oracle at sf0.01; these tests pin
    the semi-join semantics that survive scale changes)."""
    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"

    mc = relational.min_cost_supplier(sf).to_pandas()
    if len(mc):
        # every winner's unit cost is the per-part minimum: no part may
        # appear with two different min_cost values
        assert mc.groupby("p_partkey")["min_cost"].nunique().max() == 1
        assert (mc["s_acctbal"].values[:-1] >= mc["s_acctbal"].values[1:]).all()

    pp = relational.product_profit(sf).to_pandas()
    assert set(pp.columns) == {"n_name", "o_year", "profit"}
    assert pp.groupby(["n_name", "o_year"]).size().max() == 1

    spv = relational.supplier_part_variety(sf).to_pandas()
    if len(spv):
        assert (spv["supplier_cnt"] > 0).all()
        assert not (spv["p_brand"] == "Brand#1").any()
        assert set(spv["p_size"]).issubset({1, 4, 9, 16, 25, 36})

    dps = relational.dominant_part_suppliers(sf).to_pandas()
    # dominance is >50%: at most one dominant supplier per part, so the
    # supplier list is a set (already distinct) and sorted
    assert dps["s_suppkey"].is_monotonic_increasing
    assert dps["s_suppkey"].is_unique


def test_scd2_and_recency_invariants(ray_session):
    from plasmap_ray.pipelines import windows

    sf = "/root/testdata/sf0.001"
    iv = windows.scd2_intervals(sf).to_pandas()
    # intervals are half-open and chain per user: version 1..n, each
    # valid_to equals the next version's valid_from (or the sentinel)
    g = iv.sort_values(["user_id", "version"])
    for _, grp in list(g.groupby("user_id"))[:20]:
        assert (grp["version"].values == range(1, len(grp) + 1)).all()
        assert (grp["valid_to"].values[:-1] == grp["valid_from"].values[1:]).all()
        assert grp["valid_to"].values[-1] == pd.Timestamp("2100-01-01").to_datetime64()

    rw = windows.recency_weighted_value(sf).to_pandas()
    assert rw["user_id"].is_unique
    assert (rw["n_recent"] <= windows.RECENCY_K).all() and (rw["n_recent"] >= 1).all()
    # weighted mean lies within the user's recent value range
    ev = pd.read_parquet(f"{sf}/events.parquet")
    u = int(rw["user_id"].iloc[0])
    recent = ev[ev["user_id"] == u].sort_values(["ts", "event_id"]).tail(windows.RECENCY_K)
    got = float(rw[rw["user_id"] == u]["rw_value"].iloc[0])
    assert recent["value"].min() - 0.01 <= got <= recent["value"].max() + 0.01


def test_augment_pixels_truth():
    """Hand-built 1x2 pixel truth: independent of both the pipeline
    kernel and the golden builder."""
    from plasmap_ray.pipelines.images import augment_pixels

    px = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)  # (1,2,3): A B
    np.testing.assert_array_equal(augment_pixels(px, 0), px)
    np.testing.assert_array_equal(  # hflip: B A
        augment_pixels(px, 1), np.array([[[4, 5, 6], [1, 2, 3]]], dtype=np.uint8)
    )
    np.testing.assert_array_equal(  # rot90 ccw: col B on top -> (2,1,3)
        augment_pixels(px, 2), np.array([[[4, 5, 6]], [[1, 2, 3]]], dtype=np.uint8)
    )
    np.testing.assert_array_equal(  # rot180: B A flipped vertically (h=1)
        augment_pixels(px, 3), np.array([[[4, 5, 6], [1, 2, 3]]], dtype=np.uint8)
    )


def test_correlation_and_class_weights(ray_session):
    from plasmap_ray.pipelines import stats

    sf = "/root/testdata/sf0.001"
    r = stats.value_hour_correlation(sf).to_pandas()
    assert (r["pearson_r"].abs() <= 1.0).all()
    assert r["n"].sum() == len(pd.read_parquet(f"{sf}/events.parquet"))

    w = stats.label_class_weights(sf)
    w = w.to_pandas() if hasattr(w, "to_pandas") else w
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    assert w["n"].sum() == len(emb)
    # balanced-weight identity: sum(n * weight) == total
    assert abs((w["n"] * w["class_weight"]).sum() - len(emb)) < 1e-6


def test_user_retention_invariants(ray_session):
    from plasmap_ray.pipelines import windows

    sf = "/root/testdata/sf0.001"
    rt = windows.user_retention(sf).to_pandas()
    assert (rt["week_offset"] >= 0).all()
    # offset-0 row of each cohort counts every user of that cohort, so
    # it must be the cohort's maximum across offsets
    base = rt[rt["week_offset"] == 0].set_index("cohort_week")["n_users"]
    assert set(rt["cohort_week"]) == set(base.index)
    for cw, grp in rt.groupby("cohort_week"):
        assert grp["n_users"].max() == base[cw]
    # total distinct users conserved: sum of offset-0 rows == n users
    ev = pd.read_parquet(f"{sf}/events.parquet")
    assert base.sum() == ev["user_id"].nunique()


def test_road_components_invariants(ray_session):
    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import routing

    out = routing.road_cheap_components("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 1, "cheap subgraph must fragment the lattice"
    assert out["component"].is_monotonic_increasing and out["component"].is_unique
    assert (out["n_nodes"] >= 2).all()  # singletons excluded by contract
    e = fixtures.road_world()["edges"].to_pandas()
    kept = e[e["w"] < routing.CHEAP_W_CUT]
    touched = len(set(kept["src"]) | set(kept["dst"]))
    assert out["n_nodes"].sum() == touched


def test_embedding_dim_stats_invariants(ray_session):
    from plasmap_ray.pipelines import ann

    sf = "/root/testdata/sf0.001"
    st = ann.embedding_dim_stats(sf).to_pandas()
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    d = len(emb["embedding"].iloc[0])
    assert list(st["dim"]) == list(range(d))
    assert (st["n_vecs"] == len(emb)).all()
    assert (st["vmin"] <= st["mean"]).all() and (st["mean"] <= st["vmax"]).all()
    assert (st["var"] >= 0).all()
    # spot-check dim 0 against a direct numpy recompute (tolerance: the
    # engine quantizes at 2^20, numpy here does not)
    v0 = np.array([v[0] for v in emb["embedding"]], dtype=np.float64)
    assert abs(st["mean"].iloc[0] - v0.mean()) < 1e-4
    assert abs(st["var"].iloc[0] - v0.var()) < 1e-4


def test_route_corridor_invariants(ray_session):
    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import snap

    sf = "/root/testdata/sf0.001"
    out = snap.route_corridor(sf).to_pandas()
    assert len(out) > 0
    assert set(out["way_id"]).issubset(set(snap.CORRIDOR_WAYS))
    assert (out["dist2"] < snap.CORRIDOR_R * snap.CORRIDOR_R).all()
    assert out["doc_id"].is_unique  # nearest-1 per point
    # corridor rows agree with snap_to_ways when the global nearest
    # segment happens to belong to the route
    snapped = snap.snap_to_ways(sf).to_pandas()
    both = out.merge(snapped, on="doc_id", suffixes=("_c", "_s"))
    sub = both[both["way_id_s"].isin(snap.CORRIDOR_WAYS)]
    assert (sub["way_id_c"] == sub["way_id_s"]).all()
    assert (sub["seg_idx_c"] == sub["seg_idx_s"]).all()


def test_aspect_buckets_and_burstiness(ray_session):
    from plasmap_ray.pipelines import images, stats

    sf = "/root/testdata/sf0.001"
    ab = images.aspect_buckets(sf).to_pandas()
    assert ab["n_images"].sum() == images.images_count_for(sf)
    assert set(ab["bucket"]).issubset({"wide", "tall", "squarish"})

    ub = stats.user_burstiness(sf).to_pandas()
    assert ub["user_id"].is_unique
    assert (ub["burstiness"].abs() <= 1.0).all()
    assert (ub["mean_gap_s"] >= 0).all()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    multi = (ev.groupby("user_id").size() >= 2).sum()
    assert len(ub) == multi


def test_batch4_invariants(ray_session):
    from plasmap_ray.pipelines import dedup, images, relational
    from plasmap_ray.pipelines.trajectory import sample_u

    sf = "/root/testdata/sf0.001"

    nd = dedup.ngram_decontaminate(sf).to_pandas()
    assert (nd["n_hits"] >= 1).all()
    # flagged docs are never benchmark docs
    assert (sample_u(nd["doc_id"].to_numpy()) >= dedup.DECON_FRAC).all()
    # exact-dup contamination implies ngram contamination: every
    # non-benchmark doc whose md5 matches a benchmark doc must be here
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    import hashlib
    docs["h"] = [hashlib.md5(t.encode()).hexdigest() for t in docs["text"]]
    bench = docs[sample_u(docs["doc_id"].to_numpy()) < dedup.DECON_FRAC]
    rest = docs[sample_u(docs["doc_id"].to_numpy()) >= dedup.DECON_FRAC]
    exact_contam = set(rest[rest["h"].isin(set(bench["h"]))]["doc_id"])
    assert exact_contam.issubset(set(nd["doc_id"]))

    pb = relational.price_band_pairs(sf).to_pandas()
    assert pb["n_name"].is_unique and (pb["n_pairs"] > 0).all()
    # brute-force recompute for one nation
    cust = pd.read_parquet(f"{sf}/customer.parquet")[["c_custkey", "c_nationkey"]]
    natt = pd.read_parquet(f"{sf}/nation.parquet")[["n_nationkey", "n_name"]]
    orders = pd.read_parquet(f"{sf}/orders.parquet")[["o_custkey", "o_totalprice"]]
    m = orders.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        natt, left_on="c_nationkey", right_on="n_nationkey")
    nn = pb["n_name"].iloc[0]
    c = np.floor(np.abs(m[m["n_name"] == nn]["o_totalprice"].to_numpy() * 100.0) + 0.5).astype(np.int64)
    brute = sum(1 for i in range(len(c)) for j in range(i + 1, len(c))
                if abs(int(c[i]) - int(c[j])) <= relational.PRICE_BAND_CENTS)
    assert int(pb[pb["n_name"] == nn]["n_pairs"].iloc[0]) == brute

    cs = images.compression_stats(sf).to_pandas()
    assert set(cs["fmt"]) == {"raw", "pngz", "qnt8"}
    raw = cs[cs["fmt"] == "raw"].iloc[0]
    assert raw["payload_bytes"] == raw["raw_bytes"] and raw["ratio"] == 1.0
    assert (cs[cs["fmt"] != "raw"]["ratio"] < 1.0).all()


def test_event_dedup_invariants(ray_session):
    from plasmap_ray.pipelines import windows
    from plasmap_ray.stages.common import duckdb_round

    sf = "/root/testdata/sf0.001"
    kept = windows.event_dedup(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    assert 0 < len(kept) <= len(ev)
    # no kept event has a kept same-key predecessor within the gap AND
    # raw-predecessor semantics: recompute with pandas LAG
    ev = ev.sort_values(["user_id", "event_type", "value", "ts", "event_id"])
    cents = duckdb_round(ev["value"].to_numpy() * 100.0, 0).astype(np.int64)
    ev = ev.assign(cents=cents)
    lag = ev.groupby(["user_id", "event_type", "cents"])["ts"].shift()
    gap_ok = lag.isna() | ((ev["ts"] - lag).dt.total_seconds() > windows.EVENT_DEDUP_GAP_S)
    expect = set(ev[gap_ok]["event_id"])
    assert set(kept["event_id"]) == expect


def test_snapshot_diff_and_audio_pitch(ray_session):
    from plasmap_ray.pipelines import dedup, multimodal

    sf = "/root/testdata/sf0.001"
    d = dedup.snapshot_diff(sf).to_pandas().set_index("status")["n_docs"]
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    ids = docs["doc_id"].to_numpy()
    assert d.get("added", 0) == 0  # B derives from A: nothing appears
    assert d["removed"] == int((ids % dedup.SNAP_DEL_MOD == 0).sum())
    assert d["changed"] == int(((ids % dedup.SNAP_EDIT_MOD == 0) & (ids % dedup.SNAP_DEL_MOD != 0)).sum())
    assert d.sum() == len(ids)

    ph = multimodal.audio_pitch_histogram(sf).to_pandas()
    import pyarrow.parquet as _pq
    n_clips = _pq.read_metadata(multimodal.audio_path_for(sf)).num_rows
    assert ph["n_clips"].sum() == n_clips
    # fixture f0 range is [200, 2000) -> bands within [0, 2000]; the
    # 0.25-amplitude harmonic at 2.5*f0 never outweighs the fundamental
    assert (ph["pitch_band_hz"] >= 0).all() and (ph["pitch_band_hz"] <= 2000).all()
    assert set(ph["sample_rate"]).issubset({8000, 16000})


def test_audio_pitch_kernel_truth():
    """Independent truth: a pure 440 Hz sine at 8 kHz lands in band 400."""
    import io
    import wave

    from plasmap_ray.stages.media import decode_wav_pcm16

    sr, f0, ns = 8000, 440.0, 4000
    t = np.arange(ns) / sr
    s16 = np.clip(np.round(0.8 * np.sin(2 * np.pi * f0 * t) * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(s16.tobytes())
    sr2, samples = decode_wav_pcm16(buf.getvalue())
    mag = np.abs(np.fft.rfft(samples.astype(np.float64)))
    mag[0] = 0.0
    peak = int(round(float(np.argmax(mag)) * sr2 / len(samples)))
    assert (peak // 200) * 200 == 400


def test_layout_pruning_stats(ray_session):
    from plasmap_ray.pipelines import spatial

    st = spatial.layout_pruning_stats("/root/testdata/sf0.01").to_pandas().set_index("layout")
    assert set(st.index) == {"space", "time", "zorder"}
    assert (st["n_hit"] <= st["n_touched"]).all()
    assert (st["n_touched"] <= st["n_files"]).all()
    # the point of z-order: a 2-D range probe touches a SMALLER file
    # fraction than either single-column clustering
    frac = st["n_touched"] / st["n_files"]
    assert frac["zorder"] < frac["space"] and frac["zorder"] < frac["time"]


def test_matryoshka_fidelity(ray_session):
    from plasmap_ray.pipelines import ann

    sf = "/root/testdata/sf0.001"
    mf = ann.matryoshka_fidelity(sf).to_pandas()
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    assert len(mf) == len(emb) and mf["vec_id"].is_unique
    assert ((mf["trunc_cos"] > 0) & (mf["trunc_cos"] <= 1.0)).all()
    # independent recompute for one vector (unquantized; 1e-4 slack)
    v = np.asarray(emb["embedding"].iloc[0], dtype=np.float64)
    want = np.sqrt((v[:32] ** 2).sum() / (v**2).sum())
    vid = int(emb["vec_id"].iloc[0])
    got = float(mf[mf["vec_id"] == vid]["trunc_cos"].iloc[0])
    assert abs(got - want) < 1e-4


def test_hmm_map_match_invariants(ray_session):
    from plasmap_ray.pipelines import snap

    sf = "/root/testdata/sf0.001"
    mm = snap.hmm_map_match(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    assert len(mm) == len(ev)  # every fix is matched
    # path consistency pays off: HMM switches segments no more often
    # than pointwise nearest snapping
    near = snap.snap_to_ways(sf).to_pandas()  # doc-based; recompute event-based nearest inline
    from plasmap_ray import fixtures

    st = snap.way_segments()
    segs = {
        "x1": st["x1"].to_numpy(), "y1": st["y1"].to_numpy(),
        "dx": st["x2"].to_numpy() - st["x1"].to_numpy(),
        "dy": st["y2"].to_numpy() - st["y1"].to_numpy(),
        "way": st["way_id"].to_numpy().astype(np.int64),
        "seg": st["seg_idx"].to_numpy().astype(np.int64),
    }
    ev_s = ev.sort_values(["user_id", "ts", "event_id"])
    ids = ev_s["event_id"].to_numpy()
    idx, _ = snap._hmm_candidates(fixtures.derive_lon(ids), fixtures.derive_lat(ids), segs, 1)
    nearest = idx[:, 0]
    mm_s = mm.set_index("event_id").loc[ids]
    key_mm = mm_s["way_id"].to_numpy() * 1000 + mm_s["seg_idx"].to_numpy()
    key_nn = segs["way"][nearest] * 1000 + segs["seg"][nearest]
    uid = ev_s["user_id"].to_numpy()
    same_user = uid[1:] == uid[:-1]
    switches_mm = int(((key_mm[1:] != key_mm[:-1]) & same_user).sum())
    switches_nn = int(((key_nn[1:] != key_nn[:-1]) & same_user).sum())
    assert switches_mm <= switches_nn


def test_sequence_and_ohlc(ray_session):
    from plasmap_ray.pipelines import windows

    sf = "/root/testdata/sf0.001"
    sp = windows.sequence_pattern_counts(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    # brute recompute
    et = ev["event_type"].to_numpy()
    uid = ev["user_id"].to_numpy()
    brute = {}
    for i in range(len(ev) - 2):
        if uid[i] == uid[i + 2] and et[i] == "view" and et[i + 1] == "click" and et[i + 2] == "purchase":
            brute[uid[i]] = brute.get(uid[i], 0) + 1
    assert dict(zip(sp["user_id"], sp["n_matches"])) == brute

    oh = windows.ohlc_hourly(sf).to_pandas()
    assert oh["hour_start"].is_monotonic_increasing and oh["hour_start"].is_unique
    assert (oh["low_c"] <= oh["open_c"]).all() and (oh["open_c"] <= oh["high_c"]).all()
    assert (oh["low_c"] <= oh["close_c"]).all() and (oh["close_c"] <= oh["high_c"]).all()
    assert oh["n_events"].sum() == len(ev)


def test_doc_keywords(ray_session):
    from plasmap_ray.pipelines import index as idx

    sf = "/root/testdata/sf0.001"
    kw = idx.doc_keywords(sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    assert len(kw) == len(docs) and kw["doc_id"].is_unique
    assert (kw["score"] >= 0).all()
    # the keyword actually occurs in its document
    text_of = dict(zip(docs["doc_id"], docs["text"]))
    for _, r in kw.head(25).iterrows():
        assert r["keyword"] in text_of[r["doc_id"]].lower().split(" ")


def test_iqr_and_table_profile(ray_session):
    from plasmap_ray.pipelines import stats

    sf = "/root/testdata/sf0.001"
    iq = stats.iqr_outliers(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    assert iq["n_total"].sum() == len(ev)
    assert ((iq["n_low"] + iq["n_high"]) <= iq["n_total"]).all()
    # brute recompute for one type using the engine's discrete-quantile rule
    et = iq["event_type"].iloc[0]
    v = np.sort(ev[ev["event_type"] == et]["value"].to_numpy())
    q1 = v[stats._disc_rank(0.25, len(v)) - 1]
    q3 = v[stats._disc_rank(0.75, len(v)) - 1]
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    assert iq["n_low"].iloc[0] == (v < lo).sum()
    assert iq["n_high"].iloc[0] == (v > hi).sum()

    tp = stats.table_profile(sf).to_pandas()
    assert len(tp) == 7
    assert (tp["n_null"] == 0).all()  # fixtures carry no nulls
    docs_rows = tp[tp["tbl"] == "documents"]["n_rows"].unique()
    assert list(docs_rows) == [len(pd.read_parquet(f"{sf}/documents.parquet"))]


def test_ann_recall_eval(ray_session):
    from plasmap_ray.pipelines import ann

    out = ann.ann_recall_eval("/root/testdata/sf0.001", k=10, vec_ids=(1, 2, 3, 4))
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert list(df["query_vec_id"]) == [1, 2, 3, 4]
    assert ((df["recall"] >= 0) & (df["recall"] <= 1)).all()
    assert (df["n_overlap"] == (df["recall"] * 10).round()).all()
    # IVF with nprobe=4/16 should keep most of the exact set
    assert df["recall"].mean() >= 0.5


def test_rfm_features(ray_session):
    from plasmap_ray.pipelines import stats

    sf = "/root/testdata/sf0.001"
    rfm = stats.rfm_features(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    assert len(rfm) == ev["user_id"].nunique()
    assert (rfm["r_days"] >= 1).all()  # as-of is past the fixture window
    assert rfm["f_events"].sum() == len(ev)
    u = int(rfm["user_id"].iloc[0])
    mine = ev[ev["user_id"] == u]
    assert rfm["f_events"].iloc[0] == len(mine)
    assert rfm["m_cents"].iloc[0] == int(np.floor(mine["value"].to_numpy() * 100.0 + 0.5).sum())


def test_global_row_numbers_and_hash_split(ray_session):
    from plasmap_ray.pipelines import dedup, windows

    sf = "/root/testdata/sf0.001"
    rn = windows.global_row_numbers(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    assert list(rn["rn"]) == list(range(1, len(ev) + 1))  # dense, contiguous, 1-based
    want = ev.sort_values(["ts", "event_id"])["event_id"].to_numpy()
    assert (rn["event_id"].to_numpy() == want).all()

    hs = dedup.hash_split_counts(sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    assert hs["n_docs"].sum() == len(docs)
    per_split = hs.groupby("split")["n_docs"].sum()
    assert set(per_split.index) == {"train", "val", "test"}
    assert per_split["train"] > per_split["val"] and per_split["train"] > per_split["test"]


def test_minhash_accuracy_eval(ray_session):
    from plasmap_ray.pipelines import dedup

    out = dedup.minhash_accuracy_eval("/root/testdata/sf0.001")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(df) > 0  # the fixture plants near-dup docs
    assert ((df["est_jaccard"] >= 0.8)).all()
    assert ((df["exact_jaccard"] >= 0) & (df["exact_jaccard"] <= 1)).all()
    # MinHash with 64 hashes: estimates should track exact Jaccard well
    assert df["abs_err"].max() < 0.25
    assert df["abs_err"].mean() < 0.1


def test_trigrams_and_weighted_sample(ray_session):
    from plasmap_ray.pipelines import windows

    sf = "/root/testdata/sf0.001"
    tri = windows.event_trigram_counts(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    per_user = ev.groupby("user_id").size()
    assert tri["n"].sum() == (per_user[per_user >= 3] - 2).sum()

    ws = windows.weighted_sample(sf, k=50).to_pandas()
    assert len(ws) == 50
    assert ws["skey"].is_monotonic_increasing
    # inclusion ∝ weight: the selected set should be value-biased high
    assert ws["value"].mean() > ev["value"].mean()


def test_raster_focal_mean(ray_session):
    from plasmap_ray.pipelines import raster

    sf = "/root/testdata/sf0.001"
    fm = raster.raster_focal_mean(sf).to_pandas()
    v = raster.raster_to_vector(sf).to_pandas()
    v["gx"] = v["x"] * 16 + v["px"]
    v["gy"] = v["y"] * 16 + v["py"]
    # mass conservation: Σ neigh_sum = 9 × Σ n_points (every count lands in 9 cells)
    assert fm["neigh_sum"].sum() == 9 * v["n_points"].sum()
    # spot-check one interior pixel against a brute 3x3 window
    px = v.iloc[len(v) // 2]
    win = v[(v["gx"].between(px["gx"] - 1, px["gx"] + 1)) & (v["gy"].between(px["gy"] - 1, px["gy"] + 1))]
    got = fm[(fm["gx"] == px["gx"]) & (fm["gy"] == px["gy"])]["neigh_sum"].iloc[0]
    assert got == win["n_points"].sum()


def test_zone_overlap_point_counts_matches_bruteforce(ray_session):
    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.001"
    out = spatial.zone_overlap_point_counts(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
    expected = {}
    rects = fixtures.admin_rects()
    for i in range(len(ids)):
        inside = sorted(
            r["rel_id"]
            for r in rects
            if r["lon_min"] <= lon[i] < r["lon_max"] and r["lat_min"] <= lat[i] < r["lat_max"]
        )
        for a in range(len(inside)):
            for b in range(a + 1, len(inside)):
                k = (inside[a], inside[b])
                expected[k] = expected.get(k, 0) + 1
    got = {(int(r["rel_a"]), int(r["rel_b"])): int(r["n_points"]) for _, r in out.iterrows()}
    assert got == expected
    assert len(got) > 0  # district-in-city nesting guarantees overlaps


def test_caption_geo_alignment_fully_aligned(ray_session):
    from plasmap_ray.pipelines import images as ip

    out = ip.caption_geo_alignment("/root/testdata/sf0.001").to_pandas()
    # captions are generated from the containing district, so the audit
    # must find 100% alignment in every place bucket
    assert (out["n_aligned"] == out["n_images"]).all()
    assert (out["align_rate"] == 1.0).all()
    assert out["n_images"].sum() == ip.images_count_for("/root/testdata/sf0.001")
    assert "the countryside" in set(out["place"])


def test_image_crop_manifest_bounds(ray_session):
    from plasmap_ray.pipelines import images as ip

    sf = "/root/testdata/sf0.001"
    out = ip.image_crop_manifest(sf).to_pandas()
    t = fixtures.make_images(ip.images_count_for(sf)).select(["image_id", "w", "h"]).to_pandas()
    m = out.merge(t, on="image_id")
    assert len(out) == ip.CROP_K * len(t)
    assert (m["side"] == (np.minimum(m["w"], m["h"]).astype(np.int64) * 2) // 3).all()
    assert ((m["x0"] >= 0) & (m["x0"] + m["side"] <= m["w"])).all()
    assert ((m["y0"] >= 0) & (m["y0"] + m["side"] <= m["h"])).all()
    # crops differ across ranks for almost all images (hash spread)
    spread = m.groupby("image_id")[["x0", "y0"]].nunique().max(axis=1)
    assert (spread > 1).mean() > 0.8


def test_tile_child_coverage_consistency(ray_session):
    from plasmap_ray.pipelines import images as ip
    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.001"
    out = spatial.tile_child_coverage(sf).to_pandas()
    assert ((out["n_children_occupied"] >= 1) & (out["n_children_occupied"] <= 16)).all()
    assert (abs(out["coverage"] - out["n_children_occupied"] / 16.0) < 1e-9).all()
    assert out["n_images"].sum() == ip.images_count_for(sf)


def test_zone_border_distance_matches_bruteforce(ray_session):
    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.001"
    out = spatial.zone_border_distance(sf).to_pandas().set_index("rel_id")
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
    for r in fixtures.admin_rects():
        m = (lon >= r["lon_min"]) & (lon < r["lon_max"]) & (lat >= r["lat_min"]) & (lat < r["lat_max"])
        if not m.any():
            assert r["rel_id"] not in out.index
            continue
        depth = np.minimum.reduce(
            [lon[m] - r["lon_min"], r["lon_max"] - lon[m], lat[m] - r["lat_min"], r["lat_max"] - lat[m]]
        )
        row = out.loc[r["rel_id"]]
        assert row["n_points"] == int(m.sum())
        assert row["min_depth_fp"] == int(np.floor(depth.min() * 1e9 + 0.5))
        assert abs(row["mean_depth"] - depth.mean()) < 1e-6


def test_zone_median_center_robustness(ray_session):
    from plasmap_ray import geometry
    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.001"
    out = spatial.zone_median_center(sf).to_pandas().set_index("rel_id")
    # median center lies inside its zone and near (but generally not at)
    # the mean center; total assignments match the PiP join
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
    ids = np.sort(docs["doc_id"].to_numpy())
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
    for r in fixtures.admin_rects():
        m = (lon >= r["lon_min"]) & (lon < r["lon_max"]) & (lat >= r["lat_min"]) & (lat < r["lat_max"])
        if not m.any():
            continue
        row = out.loc[r["rel_id"]]
        assert row["n_points"] == int(m.sum())
        assert r["lon_min"] <= row["med_lon"] <= r["lon_max"]
        assert r["lat_min"] <= row["med_lat"] <= r["lat_max"]

    # the kernel minimizes the L1 objective vs the mean center
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(200, 2))
    pts[:20] += 50.0  # outlier cluster drags the mean, not the median
    x, y = geometry.weiszfeld_fixed(np.sort(pts[:, 0]), pts[np.argsort(pts[:, 0]), 1], iters=32)
    def l1(cx, cy):
        return np.sqrt((pts[:, 0] - cx) ** 2 + (pts[:, 1] - cy) ** 2).sum()
    assert l1(x, y) < l1(pts[:, 0].mean(), pts[:, 1].mean())


def test_part_cooccurrence_matches_bruteforce(ray_session):
    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    out = relational.part_cooccurrence(sf, min_support=1).to_pandas()
    li = pq.read_table(f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]).to_pandas()
    expected = {}
    for _, g in li.groupby("l_orderkey"):
        items = sorted(set(g["l_partkey"]))
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                k = (items[i], items[j])
                expected[k] = expected.get(k, 0) + 1
    got = {(int(r["part_a"]), int(r["part_b"])): int(r["support"]) for _, r in out.iterrows()}
    assert got == expected
    assert len(got) > 0


def test_daily_cusum_properties(ray_session):
    from plasmap_ray.pipelines import windows

    sf = "/root/testdata/sf0.01"
    out = windows.daily_cusum(sf).to_pandas().sort_values("day")
    # the scaled CUSUM telescopes to zero at the last day
    assert int(out["cusum_scaled"].iloc[-1]) == 0
    assert out["is_peak"].sum() == 1
    peak = out[out["is_peak"]].iloc[0]
    assert abs(peak["cusum_scaled"]) == out["cusum_scaled"].abs().max()
    ev = pq.read_table(f"{sf}/events.parquet", columns=["ts"])
    assert out["n_events"].sum() == ev.num_rows


def test_dim_join_planner_flips_on_size(ray_session):
    """The size-guarded dim-join planner must flip broadcast->shuffle on
    the byte threshold, and both physical plans must emit identical
    rows (market_share / bloom_semi_join / min_cost_supplier)."""
    import pandas as pd

    from plasmap_ray.pipelines import relational as R

    sf = "/root/testdata/sf0.001"
    assert R.dim_strategy(sf, "supplier", ["s_suppkey", "s_nationkey"]) == "broadcast"
    assert R.dim_strategy(sf, "supplier", ["s_suppkey", "s_nationkey"], max_bytes=1) == "shuffle"
    assert R.dim_bytes(sf, "supplier", ["s_suppkey"]) < R.dim_bytes(sf, "supplier")

    def canon(x):
        df = x if isinstance(x, pd.DataFrame) else x.to_pandas()
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for fn in (R.market_share, R.bloom_semi_join, R.min_cost_supplier,
               R.product_profit, R.nation_trade_volume):
        a = canon(fn(sf))
        b = canon(fn(sf, dim_max_bytes=1))  # force the shuffle plan
        assert a.equals(b), fn.__name__
    # product_profit exercises REAL rows under both plans at this SF
    pp = canon(R.product_profit(sf, dim_max_bytes=1))
    assert len(pp) > 0


def test_empty_predicate_joins_return_typed_empty(ray_session):
    """A predicate that selects nothing must yield a typed EMPTY result,
    not an ArrowInvalid crash (the all-empty join side is the one case
    safe_join's scrub cannot fix — Ray loses the side's schema)."""
    from plasmap_ray.pipelines import relational as R

    sf = "/root/testdata/sf0.001"
    ms = R.market_share(sf, ptype="NO_SUCH_TYPE")
    ms = ms.to_pandas() if not hasattr(ms, "columns") else ms.to_pandas()
    assert len(ms) == 0 and sorted(ms.columns) == ["mkt_share", "o_year"]
    bj = R.bloom_semi_join(sf, segment="NO_SUCH_SEGMENT").to_pandas()
    assert len(bj) == 0 and sorted(bj.columns) == ["c_nationkey", "n_orders"]
    for kw in ({}, {"dim_max_bytes": 1}):  # both physical plans guard
        pp = R.product_profit(sf, name_sub="NO_SUCH_PART", **kw).to_pandas()
        assert len(pp) == 0 and sorted(pp.columns) == ["n_name", "o_year", "profit"]
        nt = R.nation_trade_volume(sf, nation_a="XX", nation_b="YY", **kw).to_pandas()
        assert len(nt) == 0 and sorted(nt.columns) == [
            "cust_nation", "l_year", "revenue", "supp_nation"]
    mc = R.min_cost_supplier(sf, ptype="NO_SUCH_TYPE").to_pandas()
    assert len(mc) == 0 and "min_cost" in mc.columns


def test_knn_shuffle_far_points_bbox_jump(ray_session):
    """Adversarial geometry for the adaptive-radius rounds: every POI
    in a tiny corner, query points spread across the world — round 1
    finds zero candidates for most points, forcing the bbox-distance
    jump and the bbox-clipped explosion.  Results must stay exact."""
    from plasmap_ray.pipelines import spatial

    rng = np.random.default_rng(23)
    m = 20
    plon = fixtures.LON_MIN + rng.random(m) * 0.2
    plat = fixtures.LAT_MIN + rng.random(m) * 0.2
    pois = pa.table(
        {
            "poi_id": pa.array(np.arange(1, m + 1, dtype=np.int64)),
            "lon": pa.array(plon),
            "lat": pa.array(plat),
        }
    )
    sf = "/root/testdata/sf0.001"
    out = (
        spatial.knn_shuffle_pipeline(sf, k=4, pois_table=pois)
        .to_pandas()
        .sort_values(["doc_id", "knn_rank"])
        .reset_index(drop=True)
    )
    pts = spatial.points_from_documents(sf).to_pandas()
    d = (pts["lon"].to_numpy()[:, None] - plon[None, :]) ** 2 + (pts["lat"].to_numpy()[:, None] - plat[None, :]) ** 2
    pid = np.arange(1, m + 1, dtype=np.int64)
    assert len(out) == len(pts) * 4
    got = out["poi_id"].to_numpy().reshape(-1, 4)
    order_docs = out["doc_id"].to_numpy().reshape(-1, 4)[:, 0]
    by_doc = {int(doc): i for i, doc in enumerate(pts["doc_id"].to_numpy())}
    for r in range(got.shape[0]):
        i = by_doc[int(order_docs[r])]
        expect = pid[np.lexsort((pid, d[i]))[:4]]
        assert np.array_equal(expect, got[r]), (r, order_docs[r])


def test_zone_overlay_area_matches_bruteforce(ray_session):
    from plasmap_ray import geometry
    from plasmap_ray.pipelines import spatial

    out = spatial.zone_overlay_area().to_pandas()
    polys = {p["rel_id"]: p for p in fixtures.admin_polygons()}
    ids = sorted(polys)
    expected = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = polys[ids[i]], polys[ids[j]]
            inter = geometry.intersection_area(a["outer"], b["outer"], a["holes"], b["holes"])
            if inter > 0:
                expected[(ids[i], ids[j])] = inter
    got = {(int(r["rel_a"]), int(r["rel_b"])): r["inter_area"] for _, r in out.iterrows()}
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == v  # same scalar on same doubles: bit-equal
    # IoU sanity: districts nest inside cities, so iou = area_district/area_city < 1
    assert (out["iou"] > 0).all() and (out["iou"] <= 1).all()
    assert ((out["inter_area"] <= out[["area_a", "area_b"]].min(axis=1) + 1e-15)).all()


def test_seasonal_decompose_reconstruction(ray_session):
    """trend + seasonal + resid reconstructs the daily series exactly
    (up to the rounding applied per column), full-window rows only,
    and each weekday's seasonal offsets are constant."""
    import numpy as np

    from plasmap_ray.pipelines import windows

    df = windows.seasonal_decompose("/root/testdata/sf0.001").to_pandas()
    assert len(df) >= 20  # 30-day fixture -> 24 full-window days
    recon = df["trend"] + df["seasonal"] + df["resid"]
    assert np.allclose(recon, df["x"].astype(float), atol=2e-6)
    for wd, g in df.groupby(df["day_idx"] % 7):
        assert g["seasonal"].nunique() == 1
    # seasonal offsets are small relative to the series level (they are
    # deviations from trend, not the level itself)
    wd_vals = df.assign(wd=df["day_idx"] % 7).drop_duplicates("wd")["seasonal"]
    assert wd_vals.abs().max() < df["x"].abs().max()


def test_raster_hillshade_dense_recompute(ray_session):
    """Horn gradients + illumination == dense-lattice numpy recompute."""
    from plasmap_ray.pipelines import raster

    sf = "/root/testdata/sf0.001"
    v = raster.raster_to_vector(sf, z=10, tile_px=16).to_pandas()
    gx = v["x"].to_numpy() * 16 + v["px"].to_numpy()
    gy = v["y"].to_numpy() * 16 + v["py"].to_numpy()
    n = v["n_points"].to_numpy().astype(np.int64)
    x0, y0 = gx.min() - 2, gy.min() - 2
    W, H = gx.max() - x0 + 3, gy.max() - y0 + 3
    dense = np.zeros((W, H), dtype=np.int64)
    dense[gx - x0, gy - y0] = n
    c = dense
    dzdx = (
        (c[2:, :-2] + 2 * c[2:, 1:-1] + c[2:, 2:])
        - (c[:-2, :-2] + 2 * c[:-2, 1:-1] + c[:-2, 2:])
    )
    dzdy = (
        (c[:-2, 2:] + 2 * c[1:-1, 2:] + c[2:, 2:])
        - (c[:-2, :-2] + 2 * c[1:-1, :-2] + c[2:, :-2])
    )
    got = raster.raster_hillshade(sf, z=10).to_pandas()
    for _, r in got.iterrows():
        ix, iy = int(r["gx"]) - x0 - 1, int(r["gy"]) - y0 - 1
        assert dzdx[ix, iy] == r["dzdx_num"], (r["gx"], r["gy"])
        assert dzdy[ix, iy] == r["dzdy_num"]
        dx, dy = r["dzdx_num"] / 8.0, r["dzdy_num"] / 8.0
        slope = np.arctan(np.hypot(dx, dy))
        hs = np.cos(np.pi / 4) * np.cos(slope) + np.sin(np.pi / 4) * np.sin(slope) * np.cos(
            7 * np.pi / 4 - np.arctan2(dy, -dx)
        )
        assert abs(r["hillshade"] - hs) < 1e-5
    # flat support far from any point: hillshade of zero gradient = cos(zen)
    zero = got[(got["dzdx_num"] == 0) & (got["dzdy_num"] == 0)]
    if len(zero):
        assert (abs(zero["hillshade"] - np.cos(np.pi / 4)) < 1e-6).all()


def test_time_to_convert_bruteforce(ray_session):
    """Per-user first-signup -> first-qualifying-purchase equals a
    pandas recompute; non-converters emit nothing."""
    import pandas as pd
    import pyarrow.parquet as pq2

    from plasmap_ray.pipelines import windows

    sf = "/root/testdata/sf0.001"
    got = windows.time_to_convert(sf).to_pandas().set_index("user_id")
    t = pq2.read_table(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    ).to_pandas()
    t["tus"] = t["ts"].astype("int64")
    n_expected = 0
    for uid, g in t.groupby("user_id"):
        sg = g[g["event_type"] == "signup"]
        if not len(sg):
            assert uid not in got.index
            continue
        t0 = sg["tus"].min()
        pu = g[(g["event_type"] == "purchase") & (g["tus"] >= t0)]
        if not len(pu):
            assert uid not in got.index
            continue
        t1 = pu["tus"].min()
        row = got.loc[uid]
        assert row["signup_tus"] == t0 and row["purchase_tus"] == t1
        assert row["delta_s"] == (t1 - t0) // 1_000_000
        n_expected += 1
    assert len(got) == n_expected


def test_kaplan_meier_and_pct_rank_invariants(ray_session):
    """KM curve: monotone nonincreasing from <=1, n_risk nonincreasing,
    matches a driver lifelines-free recompute; percent_rank: min 0,
    max (n_distinct-ties)/(n-1) behavior via direct formula check."""
    import pandas as pd
    import pyarrow.parquet as pq2

    from plasmap_ray.pipelines import windows

    sf = "/root/testdata/sf0.001"
    km = windows.kaplan_meier(sf).to_pandas().sort_values("t_hours").reset_index(drop=True)
    assert (km["survival"].diff().dropna() <= 1e-9).all()
    assert km["survival"].iloc[0] <= 1.0 and (km["survival"] >= 0).all()
    assert (km["n_risk"].diff().dropna() <= 0).all()
    # recompute S stepwise
    s = 1.0
    for _, r in km.iterrows():
        if r["n_events"] >= r["n_risk"]:
            s = 0.0
        else:
            s *= 1.0 - r["n_events"] / r["n_risk"]
        assert abs(r["survival"] - s) < 1e-4

    pr = windows.value_percent_rank(sf).to_pandas()
    t = pq2.read_table(f"{sf}/events.parquet", columns=["event_id", "value"]).to_pandas()
    cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    n = len(cents)
    order = np.sort(cents)
    want = pd.Series(np.searchsorted(order, cents, side="left") / (n - 1), index=t["event_id"])
    got = pr.set_index("event_id")["pct_rank"]
    assert len(got) == n
    diff = (got - want.reindex(got.index)).abs()
    assert diff.max() < 1e-5


def test_blame_suppliers_bruteforce(ray_session):
    """Q21-shape: engine equals a pandas recompute of the exactly-one-
    late-supplier rule on multi-supplier orders."""
    import pandas as pd
    import pyarrow.parquet as pq2

    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    got = relational.blame_suppliers(sf).to_pandas()
    li = pq2.read_table(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).to_pandas()
    od = pq2.read_table(f"{sf}/orders.parquet", columns=["o_orderkey", "o_orderdate"]).to_pandas()
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    late_us = relational.BLAME_LATE_DAYS * 86_400_000_000
    j["late"] = (j["l_shipdate"].astype("int64") > j["o_orderdate"].astype("int64") + late_us).astype(int)
    f = j.groupby(["l_orderkey", "l_suppkey"])["late"].max().reset_index(name="supp_late")
    oc = f.groupby("l_orderkey").agg(n_supp=("supp_late", "size"), n_late=("supp_late", "sum"))
    f = f.join(oc, on="l_orderkey")
    cr = (
        f[(f["n_supp"] >= 2) & (f["n_late"] == 1) & (f["supp_late"] == 1)]
        .groupby("l_suppkey")
        .size()
        .reset_index(name="numwait")
        .sort_values(["numwait", "l_suppkey"], ascending=[False, True], kind="mergesort")
        .head(relational.BLAME_K)
    )
    assert list(got["s_suppkey"]) == list(cr["l_suppkey"])
    assert list(got["numwait"]) == list(cr["numwait"])


def test_did_and_accessibility_invariants(ray_session):
    """DiD 2x2 cells total the corpus; 2SFCA conserves supply:
    sum over cells of n_i*R_j-weighted access equals total capacity of
    reachable POIs (Luo-Wang conservation)."""
    import pyarrow.parquet as pq2

    from plasmap_ray.pipelines import hotspot, windows

    sf = "/root/testdata/sf0.001"
    did = windows.did_uplift(sf).to_pandas()
    total = did[["t_before", "t_after", "c_before", "c_after"]].to_numpy().sum()
    n_events = pq2.read_metadata(f"{sf}/events.parquet").num_rows
    assert total == n_events
    assert (did["did"] == (did["t_after"] - did["t_before"]) - (did["c_after"] - did["c_before"])).all()

    acc = hotspot.poi_accessibility(sf).to_pandas()
    # conservation: sum_i n_i * A_i == sum_j cap_j over POIs whose
    # catchment contains at least one occupied cell (R_j definition)
    lhs = (acc["n_events"] * acc["access_fp"] / hotspot.SFCA_FP).sum()
    from plasmap_ray import fixtures as fx
    import pyarrow.compute as pc2

    pois = fx.make_pois()
    pm = pois.filter(pc2.equal(pois["value"], hotspot.HUFF_VALUE))
    pid = pm["poi_id"].to_numpy()
    plon, plat = pm["lon"].to_numpy(), pm["lat"].to_numpy()
    clon = fx.LON_MIN + (acc["cx"].to_numpy() + 0.5) * hotspot.GI_EPS
    clat = fx.LAT_MIN + (acc["cy"].to_numpy() + 0.5) * hotspot.GI_EPS
    d2 = (clon[:, None] - plon[None, :]) ** 2 + (clat[:, None] - plat[None, :]) ** 2
    reach = d2 <= hotspot.SFCA_D0 ** 2
    served = reach.any(axis=0)
    rhs = (1 + pid[served] % 3).sum()
    assert abs(lhs - rhs) < 0.01 * rhs


def test_flow_accumulation_invariants(ray_session):
    """D8 pointers descend strictly; accumulation conserves mass
    (sum over sinks' subtrees = n cells); every pointer target exists."""
    from plasmap_ray.pipelines import raster

    out = raster.flow_accumulation("/root/testdata/sf0.001", z=10).to_pandas()
    cells = set(zip(out["gx"], out["gy"]))
    vals = {(r["gx"], r["gy"]): r["n_points"] for _, r in out.iterrows()}
    acc = {(r["gx"], r["gy"]): r["n_upstream"] for _, r in out.iterrows()}
    for _, r in out.iterrows():
        src, dst = (r["gx"], r["gy"]), (r["to_gx"], r["to_gy"])
        assert dst in cells
        if r["is_sink"]:
            assert src == dst
        else:
            assert vals[dst] < vals[src]  # strict descent -> acyclic
            # D8 neighbor
            assert max(abs(r["to_gx"] - r["gx"]), abs(r["to_gy"] - r["gy"])) == 1
        assert r["n_upstream"] >= 1
    # every cell contributes exactly one unit to each cell on its path;
    # total accumulation mass = sum of path lengths; each path ends at a
    # sink, so sink accumulations partition all cells when summed over
    # trees: sum over sinks of n_upstream counts every cell at least once
    sink_mass = out.loc[out["is_sink"] == 1, "n_upstream"].sum()
    assert sink_mass == len(out)  # forest partition: each cell drains to exactly one sink
    assert acc and max(acc.values()) > 1  # some real drainage exists


def test_theil_decomposition_identity_and_bruteforce(ray_session):
    """T_total == T_between + T_within, and the total matches a local
    float recompute of the Theil-T definition (within fixed-point
    pitch)."""
    import numpy as np
    import pyarrow.parquet as pq

    from plasmap_ray import cells, fixtures
    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.001"
    out = spatial.theil_decomposition(sf).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert abs(row.theil_total - (row.theil_between + row.theil_within)) < 2e-6

    ids = pq.read_table(sf + "/events.parquet", columns=["event_id"])["event_id"].to_numpy()
    cell = cells.encode(fixtures.derive_lon(ids), fixtures.derive_lat(ids), cells.PRECISION_LOW)
    _, x = np.unique(cell, return_counts=True)
    X, n = x.sum(), len(x)
    assert row.n_cells == n and row.total_events == X
    share = x / X
    t_total = float((share * np.log(share * n)).sum())
    assert abs(row.theil_total - t_total) < 1e-5
    # fixture plants regional hotspots: some inequality must register
    assert row.theil_total > 0.01
    assert row.theil_between >= 0.0 and row.theil_within >= 0.0


def test_segregation_index_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from plasmap_ray import cells, fixtures
    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.001"
    out = spatial.segregation_index(sf).to_pandas().set_index("lang")

    t = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "lang"])
    ids = t["doc_id"].to_numpy()
    langs = np.array(t["lang"].to_pylist())
    cell = cells.encode(fixtures.derive_lon(ids), fixtures.derive_lat(ids), cells.PRECISION_LOW)
    T = len(ids)
    for lang in np.unique(langs):
        is_l = langs == lang
        A, B = int(is_l.sum()), int(T - is_l.sum())
        d = 0.0
        for c in np.unique(cell):
            in_c = cell == c
            a = int((in_c & is_l).sum())
            b = int(in_c.sum()) - a
            d += abs(a / A - b / B)
        d *= 0.5
        assert abs(out.loc[lang, "dissimilarity"] - d) < 1e-6
        assert out.loc[lang, "n_lang"] == A
    # index is a proper fraction for every language
    assert ((out["dissimilarity"] >= 0) & (out["dissimilarity"] <= 1)).all()


def test_los_cells_properties():
    from plasmap_ray.pipelines.raster import los_cells

    # straight horizontal line: intermediates are exactly the between-cells
    assert los_cells(0, 0, 4, 0) == [(1, 0), (2, 0), (3, 0)]
    # perfect diagonal
    assert los_cells(0, 0, 3, 3) == [(1, 1), (2, 2)]
    # adjacent / same cell: no intermediates
    assert los_cells(0, 0, 1, 1) == []
    assert los_cells(2, 2, 2, 2) == []
    # symmetry of the midpoint rule on a knight-ish line
    cells_f = los_cells(0, 0, 6, 3)
    assert len(cells_f) == 5
    assert all(0 < cx < 6 for cx, _ in cells_f)


def test_viewshed_toy_terrain(ray_session):
    """Direct kernel check on a 1-D ridge: a tall wall hides what's
    behind it, the wall itself is visible."""
    import numpy as np

    from plasmap_ray.pipelines.raster import los_cells

    # viewpoint at (0,0) z=10; wall at (2,0) z=8; target behind at (4,0) z=5
    elev = {(0, 0): 10, (2, 0): 8, (4, 0): 5, (1, 0): 1}
    vx, vy, zv = 0, 0, 10

    def visible(tx, ty, zt):
        a_t, d2_t = zt - zv, (tx - vx) ** 2 + (ty - vy) ** 2
        for cx, cy in los_cells(vx, vy, tx, ty):
            a_i = elev.get((cx, cy), 0) - zv
            d2_i = (cx - vx) ** 2 + (cy - vy) ** 2
            if a_i >= 0 and a_t < 0:
                return False
            if a_i < 0 and a_t >= 0:
                continue
            if a_i >= 0 and a_t >= 0:
                if a_i * a_i * d2_t >= a_t * a_t * d2_i:
                    return False
            elif a_i * a_i * d2_t <= a_t * a_t * d2_i:
                return False
        return True

    assert visible(2, 0, 8)  # the wall: slope (8-10)/2 beats (1-10)/1 behind it
    # behind the wall: wall slope -2/2=-1 vs target slope (5-10)/4=-1.25 -> blocked
    assert not visible(4, 0, 5)
    # high target above the wall line is visible
    assert visible(4, 0, 30)


def test_viewshed_pipeline_matches_golden(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import raster

    sf = "/root/testdata/sf0.001"
    got = raster.viewshed(sf, z=10).to_pandas().reset_index(drop=True)
    exp = pq.read_table(golden.viewshed_path(sf, 10, 16)).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    # the viewpoint row itself is visible at distance 0, and some pixels hide
    assert got[got["chebyshev_d"] == 0]["visible"].all()
    assert got["visible"].any() and (~got["visible"]).any()


def test_referential_integrity_clean_fixture(ray_session):
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    out = relational.referential_integrity(sf).to_pandas()
    assert len(out) == len(relational.FK_EDGES)
    # the generated warehouse is referentially clean
    assert (out["n_orphan_keys"] == 0).all()
    assert (out["n_orphan_rows"] == 0).all()
    # and the totals line up with the raw tables
    li = pq.ParquetFile(sf + "/lineitem.parquet").metadata.num_rows
    row = out[(out["child_table"] == "lineitem") & (out["fk_column"] == "l_orderkey")].iloc[0]
    assert row.n_child_rows == li
    assert 0 < row.n_child_keys <= li


def test_referential_integrity_detects_orphans(ray_session):
    """Plant an orphan: keys outside the parent set must be counted."""
    import numpy as np
    import pyarrow as pa
    import ray as _ray

    # exercise the orphan kernel directly with a fake parent set
    ps = np.array([1, 2, 3], dtype=np.int64)
    k = np.array([1, 3, 99, 100], dtype=np.int64)
    n = np.array([5, 1, 2, 7], dtype=np.int64)
    idx = np.searchsorted(ps, k)
    found = (idx < len(ps)) & (ps[np.minimum(idx, len(ps) - 1)] == k)
    assert (~found).sum() == 2
    assert n[~found].sum() == 9


def test_association_rules_matches_bruteforce(ray_session):
    import collections
    import itertools

    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    out = relational.association_rules(sf).to_pandas()
    t = pq.read_table(sf + "/lineitem.parquet", columns=["l_orderkey", "l_partkey"]).to_pandas()
    baskets = t.drop_duplicates().groupby("l_orderkey")["l_partkey"].apply(set)
    part_n = collections.Counter()
    pair_n = collections.Counter()
    for parts in baskets:
        for p in parts:
            part_n[p] += 1
        for a, b in itertools.combinations(sorted(parts), 2):
            pair_n[(a, b)] += 1
    n_orders = len(baskets)
    kept = {k: v for k, v in pair_n.items() if v >= relational.COOC_MIN_SUPPORT}
    assert len(out) == 2 * len(kept)
    got = {(r.antecedent, r.consequent): r for r in out.itertuples()}
    for (a, b), s in list(kept.items())[:50]:
        for x, y in ((a, b), (b, a)):
            r = got[(x, y)]
            assert r.support == s
            assert r.n_a == part_n[x] and r.n_b == part_n[y]
            conf = s / part_n[x]
            assert abs(r.confidence - conf) < 1e-6
            assert abs(r.lift - conf / (part_n[y] / n_orders)) < 1e-4


def test_duplicate_orders_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.01"
    out = relational.duplicate_orders(sf).to_pandas()
    t = pq.read_table(sf + "/orders.parquet").to_pandas()
    import pandas as pd

    band = (np.floor(t.o_totalprice * 100 + 0.5).astype("int64") // relational.DUP_ORDER_BAND_CENTS)
    day = ((t.o_orderdate - pd.Timestamp(0)) // pd.Timedelta(days=1)).astype("int64")
    expected = set()
    df = t.assign(band=band, day=day)
    for (_, _), grp in df.groupby(["o_custkey", "band"]):
        ok = grp["o_orderkey"].to_numpy()
        dy = grp["day"].to_numpy()
        for i in range(len(ok)):
            for j in range(i + 1, len(ok)):
                gap = abs(int(dy[i]) - int(dy[j]))
                if gap <= relational.DUP_ORDER_WINDOW_DAYS:
                    expected.add((min(ok[i], ok[j]), max(ok[i], ok[j]), gap))
    got = {(r.order_a, r.order_b, r.day_gap) for r in out.itertuples()}
    assert got == expected
    assert len(expected) > 0  # the blocking actually fires on this fixture


def test_interpurchase_intervals_matches_pandas_recompute(ray_session):
    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    out = relational.interpurchase_intervals(sf).to_pandas()
    o = pq.read_table(
        os.path.join(sf, "orders.parquet"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).to_pandas()
    o["day"] = o["o_orderdate"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    o = o.sort_values(["o_custkey", "day", "o_orderkey"])
    cust = o["o_custkey"].to_numpy()
    same = cust[:-1] == cust[1:]
    gaps = np.diff(o["day"].to_numpy())[same]
    exp = pd.Series(gaps // 7).value_counts().sort_index()
    assert list(out["week_bucket"]) == list(exp.index)
    assert list(out["n_gaps"]) == list(exp.values)
    assert abs(out["frac"].sum() - 1.0) < 1e-4


def test_cohort_ltv_algebra(ray_session):
    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    out = relational.cohort_ltv(sf).to_pandas()
    o = pq.read_table(
        os.path.join(sf, "orders.parquet"), columns=["o_custkey", "o_orderdate", "o_totalprice"]
    ).to_pandas()
    o["em"] = o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month - 1
    o["cents"] = np.floor(o["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    o["cohort"] = o.groupby("o_custkey")["em"].transform("min")
    o["age"] = o["em"] - o["cohort"]
    exp = o.groupby(["cohort", "age"]).agg(
        n_customers=("o_custkey", "nunique"), revenue_cents=("cents", "sum")
    ).reset_index().sort_values(["cohort", "age"])
    got = out.sort_values(["cohort_month", "age_months"]).reset_index(drop=True)
    assert (got["n_customers"].to_numpy() == exp["n_customers"].to_numpy()).all()
    assert (got["revenue_cents"].to_numpy() == exp["revenue_cents"].to_numpy()).all()
    # cumulative column is the running per-cohort sum
    cum = got.groupby("cohort_month")["revenue_cents"].cumsum()
    assert (got["cum_revenue_cents"].to_numpy() == cum.to_numpy()).all()
    # age 0 exists for every cohort (the first order defines it)
    assert (got.groupby("cohort_month")["age_months"].min() == 0).all()


def test_ship_delay_quantiles_exact_ranks(ray_session):
    from plasmap_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    out = relational.ship_delay_quantiles(sf).to_pandas()
    li = pq.read_table(os.path.join(sf, "lineitem.parquet"), columns=["l_orderkey", "l_shipdate"]).to_pandas()
    o = pq.read_table(os.path.join(sf, "orders.parquet"), columns=["o_orderkey", "o_orderdate", "o_orderpriority"]).to_pandas()
    li["sday"] = li["l_shipdate"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    fs = li.groupby("l_orderkey")["sday"].min()
    o["oday"] = o["o_orderdate"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    o = o[o["o_orderkey"].isin(fs.index)]
    o["delay"] = fs.loc[o["o_orderkey"]].to_numpy() - o["oday"].to_numpy()
    import math

    for (prio, q), grp in out.set_index(["o_orderpriority", "q"]).iterrows():
        v = np.sort(o.loc[o["o_orderpriority"] == prio, "delay"].to_numpy())
        assert grp["delay_days"] == v[max(1, math.ceil(q * len(v))) - 1]
    assert (out.groupby("o_orderpriority").size() == 3).all()


def test_supplier_ontime_wilson_ordering_property(ray_session):
    from plasmap_ray.pipelines import relational

    out = relational.supplier_ontime_wilson("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    # bound below the rate, both in [0, 1]; ranking is by the bound
    assert (out["wilson_lo"] <= out["rate"] + 1e-9).all()
    assert ((out["wilson_lo"] >= 0) & (out["rate"] <= 1.0)).all()
    assert (np.diff(out["wilson_lo"].to_numpy()) <= 1e-12).all()
    # a tiny perfect supplier cannot beat a large near-perfect one:
    # wilson(3/3) < wilson(97/100)
    def wilson(on, n, z=relational.WILSON_Z):
        p = on / n
        return (p + z * z / (2 * n) - z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) / (1 + z * z / n)
    assert wilson(3, 3) < wilson(97, 100)


def test_knn_state_parallel_build_matches_serial(ray_session):
    """The x-strip data-parallel kNN index build must concatenate into
    EXACTLY the one-process packed state (disjoint strips over a shared
    POI table), and a restored actor must answer identically."""
    import numpy as np
    import pyarrow as pa

    from plasmap_ray import fixtures
    from plasmap_ray.stages import geo

    ids = np.arange(1, 60001, dtype=np.int64)
    pois = {
        "poi_id": ids,
        "lon": fixtures.derive_poi_lon(ids),
        "lat": fixtures.derive_poi_lat(ids),
    }
    a = geo.build_knn_state(pois, k=3, n_tasks=1)
    b = geo.build_knn_state(pois, k=3, n_tasks=5)
    assert a["grid_p"] == b["grid_p"]
    for key in ("gcells", "goffs", "gcand"):
        assert np.array_equal(a[key], b[key]), key
    qa = geo.KnnJoinActor(a, k=3, keep_cols=("doc_id",))
    qb = geo.KnnJoinActor(b, k=3, keep_cols=("doc_id",))
    q = np.arange(1, 5001, dtype=np.int64)
    batch = pa.table({
        "doc_id": pa.array(q),
        "lon": pa.array(fixtures.derive_lon(q)),
        "lat": pa.array(fixtures.derive_lat(q)),
    })
    assert qa(batch).equals(qb(batch))


def test_knn_planner_flips_on_state_size_estimate(ray_session):
    """VERDICT r4 directive 4: the broadcast ceiling is MEMORY-aware —
    the planner input is a packed-state byte estimate whose measured
    coefficients must track the real build within 2x, and the flip
    moves with the store budget rather than sitting on a POI count."""
    import numpy as np

    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import spatial
    from plasmap_ray.stages import geo

    # estimate vs real packed state at a mid-size POI set
    ids = np.arange(1, 60001, dtype=np.int64)
    pois = {
        "poi_id": ids,
        "lon": fixtures.derive_poi_lon(ids),
        "lat": fixtures.derive_poi_lat(ids),
    }
    st = geo.build_knn_state(pois, k=3, n_tasks=1)
    real = sum(
        np.asarray(st[key]).nbytes
        for key in ("poi_id", "lon", "lat", "P4", "gcells", "goffs", "gcand")
    )
    est = spatial.knn_state_bytes_estimate(len(ids), k=3)
    assert real / 2 <= est <= real * 2, (real, est)

    # the flip is a monotone function of the store budget: the measured
    # 1e6-POI state fits a 38 GB store at the 0.1 fraction, 1e7 does not
    store = 38e9
    cap = spatial.KNN_BROADCAST_STORE_FRACTION * store
    assert spatial.knn_state_bytes_estimate(1_000_000) <= cap
    assert spatial.knn_state_bytes_estimate(10_000_000) > cap
    # larger k widens candidate lists and can only shrink the ceiling
    assert spatial.knn_state_bytes_estimate(1_000_000, k=9) >= spatial.knn_state_bytes_estimate(
        1_000_000, k=3
    )
