"""Map-matching: grid-pruned snap vs brute force, kernel semantics,
and the end-to-end snap_to_ways pipeline."""

import numpy as np
import pytest

from plasmap_ray import fixtures
from plasmap_ray.pipelines import snap

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def seg_arrays():
    t = snap.way_segments()
    seg = {c: t[c].to_numpy() for c in t.column_names}
    seg["dx"] = seg["x2"] - seg["x1"]
    seg["dy"] = seg["y2"] - seg["y1"]
    seg["len2"] = seg["dx"] * seg["dx"] + seg["dy"] * seg["dy"]
    return seg


def test_segments_table_well_formed(seg_arrays):
    seg = seg_arrays
    assert (seg["len2"] > 0).all(), "zero-length segments must be dropped"
    # sorted by (way_id, seg_idx): index order IS the tie-break order
    key = seg["way_id"] * 1_000_000 + seg["seg_idx"]
    assert (np.diff(key) > 0).all()


def test_kernel_endpoint_and_interior_projection(seg_arrays):
    seg = {
        "way_id": np.array([1]),
        "seg_idx": np.array([0]),
        "x1": np.array([0.0]),
        "y1": np.array([0.0]),
        "dx": np.array([2.0]),
        "dy": np.array([0.0]),
        "len2": np.array([4.0]),
    }
    px = np.array([-1.0, 1.0, 3.0, 1.0])
    py = np.array([0.0, 1.0, 0.0, 0.0])
    best, d2, qx, qy = snap.snap_kernel(px, py, seg, np.array([0]))
    assert np.allclose(qx, [0.0, 1.0, 2.0, 1.0])  # clamped, interior, clamped, on-segment
    assert np.allclose(qy, 0.0)
    assert np.allclose(d2, [1.0, 1.0, 1.0, 0.0])


def test_grid_matches_brute(ray_session, seg_arrays):
    """The grid only prunes: every chosen (way, seg, dist2) must equal
    the exhaustive argmin, bit for bit."""
    seg = seg_arrays
    rng_ids = np.arange(0, 4000, dtype=np.int64)
    px, py = fixtures.derive_lon(rng_ids), fixtures.derive_lat(rng_ids)
    actor = snap.SegmentSnapActor()
    assert actor._grid is not None
    import pyarrow as pa

    batch = pa.table({"doc_id": rng_ids, "lon": px, "lat": py})
    out = actor(batch).to_pandas()

    cand = np.arange(len(seg["x1"]))
    best, d2, qx, qy = snap.snap_kernel(px, py, seg, cand)
    assert (out["way_id"].to_numpy() == seg["way_id"][best]).all()
    assert (out["seg_idx"].to_numpy() == seg["seg_idx"][best]).all()
    assert (out["dist2"].to_numpy() == d2).all()
    assert (out["snap_lon"].to_numpy() == qx).all()
    assert (out["snap_lat"].to_numpy() == qy).all()


def test_snap_pipeline_end_to_end(ray_session):
    out = snap.snap_to_ways(SF).to_pandas()
    import pyarrow.parquet as pq

    n_docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).num_rows
    assert len(out) == n_docs
    assert out["doc_id"].is_unique
    assert (out["dist2"] >= 0).all()
    # snapped coordinates stay inside the segment bboxes' hull
    t = snap.way_segments()
    assert out["snap_lon"].between(
        min(t["x1"].to_numpy().min(), t["x2"].to_numpy().min()),
        max(t["x1"].to_numpy().max(), t["x2"].to_numpy().max()),
    ).all()


def test_convex_hull_kernel_and_pipeline(ray_session):
    """Kernel: canonical CCW strict hull; pipeline: partial-hull
    combiner result equals the single-shot hull per area."""
    import pyarrow.parquet as pq

    from plasmap_ray import fixtures as fx
    from plasmap_ray import geometry
    from plasmap_ray.pipelines import spatial

    # kernel: unit square + interior + collinear edge point
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.5, 0.0]])
    h = geometry.convex_hull(pts)
    assert h.tolist() == [[0, 0], [1, 0], [1, 1], [0, 1]]  # CCW from lex-min, collinear dropped
    # order invariance
    h2 = geometry.convex_hull(pts[::-1])
    assert (h == h2).all()

    out = spatial.convex_hull_per_area(SF).to_pandas()
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    lon, lat = fx.derive_lon(ids), fx.derive_lat(ids)
    for r in fx.admin_rects():
        m = (lon >= r["lon_min"]) & (lon < r["lon_max"]) & (lat >= r["lat_min"]) & (lat < r["lat_max"])
        sub = out[out["rel_id"] == r["rel_id"]].sort_values("hull_idx")
        if not m.any():
            assert len(sub) == 0
            continue
        direct = geometry.convex_hull(np.column_stack([lon[m], lat[m]]))
        assert (sub[["lon", "lat"]].to_numpy() == direct).all()
