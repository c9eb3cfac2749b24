"""Denormalization DAG tests: ways->rings, relations->polygons vs the
fixture world's golden boundaries (FIXTURES.md §6 test_assembly;
reference WayFlowSpec.scala:45-84 / RelationFlowSpec.scala:44-162)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from plasmap_ray import fixtures, geometry
from plasmap_ray.pipelines import denormalize


@pytest.fixture(scope="module")
def world():
    return fixtures.boundary_world()


@pytest.fixture(scope="module")
def rings_df(ray_session, world):
    return denormalize.boundaries_from_world(world).to_pandas()


def _ring_set(ring: np.ndarray) -> set[tuple[float, float]]:
    return {(round(float(a), 9), round(float(b), 9)) for a, b in ring}


def test_every_relation_assembles(world, rings_df):
    got_rels = set(rings_df["rel_id"].unique())
    want_rels = {b["rel_id"] for b in world["boundaries"]}
    assert got_rels == want_rels


def test_rings_match_golden_vertices_and_area(world, rings_df):
    by_rel = {b["rel_id"]: b for b in world["boundaries"]}
    for rel_id, g in rings_df.groupby("rel_id"):
        golden = by_rel[rel_id]
        outers = g[g["role"] == "outer"]
        inners = g[g["role"] == "inner"]
        golden_outers = [golden["outer"]] + list(golden.get("extra_outers") or [])
        assert len(outers) == len(golden_outers), rel_id
        for _, outer_row in outers.iterrows():
            ring = np.column_stack([outer_row["lons"], outer_row["lats"]])
            match = [go for go in golden_outers if _ring_set(ring) == _ring_set(go)]
            assert match, rel_id
            assert geometry.ring_area(ring) == pytest.approx(geometry.ring_area(match[0]), rel=1e-12)
        golden_holes = golden.get("holes") or []
        assert len(inners) == len(golden_holes), rel_id
        for _, hole_row in inners.iterrows():
            hole = np.column_stack([hole_row["lons"], hole_row["lats"]])
            assert any(_ring_set(hole) == _ring_set(gh) for gh in golden_holes), rel_id
        # node members surface as single-point rows keeping their role
        golden_points = golden.get("points") or []
        pts = g[~g["role"].isin(["outer", "inner"])]
        assert len(pts) == len(golden_points), rel_id
        for _, prow in pts.iterrows():
            assert any(
                prow["role"] == role
                and len(prow["lons"]) == 1
                and float(prow["lons"][0]) == lon
                and float(prow["lats"][0]) == lat
                for role, lon, lat in golden_points
            ), rel_id


def test_way_assembly_preserves_nds_order(ray_session, world):
    """Coordinates must come back in nds order despite the shuffle."""
    nodes = {r["node_id"]: (r["lon"], r["lat"]) for r in world["nodes"].to_pylist()}
    way_geoms = denormalize.assemble_ways(
        rd.from_arrow(world["nodes"]), rd.from_arrow(world["ways"])
    ).to_pandas()
    ways = {r["way_id"]: r["nds"] for r in world["ways"].to_pylist()}
    assert set(way_geoms["way_id"]) == set(ways)
    for _, row in way_geoms.iterrows():
        nds = ways[row["way_id"]]
        expect = np.array([nodes[n] for n in nds])
        got = denormalize.unpack_geom(row["geom"])
        assert np.allclose(got, expect), row["way_id"]


def test_inner_join_drop_semantics(ray_session, world):
    """A missing node drops silently (reference WayFlow.scala:38);
    a way with zero resolvable nodes disappears."""
    import pyarrow as pa

    nodes_t = world["nodes"].slice(1)  # drop node_id=1
    ways_t = pa.table(
        {
            "way_id": pa.array([901, 902], type=pa.int64()),
            "nds": pa.array([[1, 2, 3], [1, 1]], type=pa.list_(pa.int64())),
        }
    )
    out = denormalize.assemble_ways(rd.from_arrow(nodes_t), rd.from_arrow(ways_t)).to_pandas()
    by_id = {r["way_id"]: r for _, r in out.iterrows()}
    assert 902 not in by_id  # all nodes missing -> way dropped
    assert denormalize.unpack_geom(by_id[901]["geom"]).shape[0] == 2  # node 1 dropped element-wise


def test_assembled_polygons_drive_pip_join(ray_session, world, rings_df):
    """End-to-end seam: DAG output -> PolygonIndex -> PiP results match
    an index built from the golden boundaries."""
    from plasmap_ray.stages import geo

    polys = denormalize.polygons_from_rings(rings_df)
    idx_a = geo.PolygonIndex(polys)
    golden_polys = []
    for b in world["boundaries"]:
        for i, outer in enumerate([b["outer"]] + list(b.get("extra_outers") or [])):
            golden_polys.append(
                dict(
                    rel_id=b["rel_id"],
                    name=b["name"],
                    admin_level=b["admin_level"],
                    outer=outer,
                    holes=(b.get("holes") or []) if i == 0 else [],
                )
            )
    idx_b = geo.PolygonIndex(golden_polys)
    ids = np.arange(1, 20001)
    lon = fixtures.derive_lon(ids)
    # stretch derived lats into the polygon world's band
    lat = 50.6 + (fixtures.derive_lat(ids) - fixtures.LAT_MIN) * 0.9
    pa_, qa = idx_a.query(lon, lat)
    pb, qb = idx_b.query(lon, lat)
    rel_a = np.array([idx_a.polygons[i]["rel_id"] for i in qa])
    rel_b = np.array([idx_b.polygons[i]["rel_id"] for i in qb])
    got = set(zip(pa_.tolist(), rel_a.tolist()))
    want = set(zip(pb.tolist(), rel_b.tolist()))
    assert got == want and len(got) > 0


def test_boundary_stats_matches_construction_rings(ray_session):
    """Shoelace area/centroid per assembled ring vs a direct recompute
    on the construction arrays; centroid falls inside the ring bbox."""
    import numpy as np

    from plasmap_ray import fixtures, geometry
    from plasmap_ray.pipelines import denormalize

    out = denormalize.boundary_stats_query("/root/testdata/sf0.001").to_pandas()
    assert (out["n_vertices"] >= 3).all()
    world = fixtures.boundary_world()
    rings = {}
    for b in world["boundaries"]:
        idx = 0
        for ring in [b["outer"], *(b.get("holes") or [])]:
            rings[(b["rel_id"], idx)] = ring
            idx += 1
        idx += len(b.get("points") or [])
        for eo in b.get("extra_outers") or []:
            rings[(b["rel_id"], idx)] = eo
            idx += 1
    checked = 0
    for row in out.itertuples():
        ring = rings.get((int(row.rel_id), int(row.ring_idx)))
        assert ring is not None, (row.rel_id, row.ring_idx)
        assert abs(abs(row.area_deg2) - abs(geometry.ring_area(ring))) < 1e-6
        assert ring[:, 0].min() <= row.centroid_lon <= ring[:, 0].max()
        assert ring[:, 1].min() <= row.centroid_lat <= ring[:, 1].max()
        checked += 1
    assert checked == len(rings) == len(out)


def test_way_junctions_match_bruteforce(ray_session, world):
    """Junction degrees equal a local recompute; chained boundary ways
    must share endpoints, so every multi-way ring yields junctions."""
    from collections import defaultdict

    out = denormalize.way_junctions_query("/root/testdata/sf0.001").to_pandas()
    ways_of = defaultdict(set)
    for r in world["ways"].to_pylist():
        for nd in r["nds"]:
            ways_of[nd].add(r["way_id"])
    exp = {nd: len(ws) for nd, ws in ways_of.items() if len(ws) >= 2}
    got = dict(zip(out["node_id"], out["n_ways"]))
    assert got == exp and len(exp) > 0
    coords = {r["node_id"]: (r["lon"], r["lat"]) for r in world["nodes"].to_pylist()}
    for r in out.itertuples():
        assert (r.lon, r.lat) == coords[r.node_id]


def test_zone_way_length_conserves_inside_length(ray_session):
    """Clipped per-zone way length: zone totals are bounded by total
    path length, and disjoint same-level zones never double-count a
    segment interior (level-8 districts tile their cities)."""
    import numpy as np

    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import denormalize

    out = denormalize.zone_way_length_query("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    world = fixtures.boundary_world()
    nodes = {r["node_id"]: (r["lon"], r["lat"]) for r in world["nodes"].to_pylist()}
    total = 0.0
    for w in world["ways"].to_pylist():
        c = np.array([nodes[nd] for nd in w["nds"]], dtype=np.float64)
        total += float(np.sqrt((np.diff(c, axis=0) ** 2).sum(axis=1)).sum())
    level_of = {r["rel_id"]: r["admin_level"] for r in fixtures.admin_rects()}
    lv = out["rel_id"].map(level_of)
    for level, g in out.groupby(lv):
        assert g["len_fp"].sum() / denormalize.ZWL_FP <= total * 1.000001


def test_boundary_geodesic_area_matches_planar_at_small_extent(ray_session):
    """For fixture-scale rings the spherical-excess area must agree with
    the planar shoelace scaled by cos(lat) to first order."""
    import numpy as np

    from plasmap_ray.pipelines import denormalize

    sf = "/root/testdata/sf0.001"
    geod = denormalize.boundary_geodesic_area_query(sf).to_pandas().set_index(["rel_id", "ring_idx"])
    plan = denormalize.boundary_stats_query(sf).to_pandas().set_index(["rel_id", "ring_idx"])
    j = geod.join(plan, lsuffix="_g")
    assert len(j) == len(geod) == len(plan) and len(j) > 0
    r = 6371008.8
    k = np.pi / 180.0
    expected = j["area_deg2"].to_numpy() * (k * r) ** 2 * np.cos(np.radians(j["centroid_lat"].to_numpy()))
    got = j["area_m2"].to_numpy()
    # first-order agreement: within 1% at fixture ring extents
    assert np.all(np.abs(got - expected) <= 0.01 * expected + 1.0)
    assert (got > 0).all()
