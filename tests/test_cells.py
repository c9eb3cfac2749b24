"""Morton cell kernel tests — round-trips, precision reduce, covers.

Mirrors the reference's geohash usage contracts (SURVEY.md §1.3):
encode/reduce/cover (GeoCalculator.scala:63-93, OsmObjectMapper.scala:1031-1098).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from plasmap_ray import cells, tiles

lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
precisions = st.integers(min_value=1, max_value=31)


@given(lons, lats, precisions)
@settings(max_examples=200, deadline=None)
def test_encode_decode_roundtrip(lon, lat, p):
    code = cells.encode(np.array([lon]), np.array([lat]), p)
    assert 0 <= int(code[0]) < (1 << (2 * p))
    lon0, lat0, lon1, lat1 = cells.decode_bounds(code, p)
    # the point lies in (or on the boundary of) its cell
    assert lon0[0] - 1e-9 <= lon <= lon1[0] + 1e-9
    assert lat0[0] - 1e-9 <= lat <= lat1[0] + 1e-9


@given(lons, lats, st.integers(min_value=2, max_value=31), st.integers(min_value=1, max_value=30))
@settings(max_examples=100, deadline=None)
def test_reduce_precision_is_parent_prefix(lon, lat, p_hi, p_lo_raw):
    p_lo = min(p_lo_raw, p_hi)
    hi = cells.encode(np.array([lon]), np.array([lat]), p_hi)
    lo = cells.encode(np.array([lon]), np.array([lat]), p_lo)
    assert cells.reduce_precision(hi, p_hi, p_lo)[0] == lo[0]


def test_interleave_bit_layout():
    # x occupies even bits, y odd bits
    assert cells.interleave(np.array([1]), np.array([0]))[0] == 0b01
    assert cells.interleave(np.array([0]), np.array([1]))[0] == 0b10
    assert cells.interleave(np.array([3]), np.array([3]))[0] == 0b1111
    x, y = cells.deinterleave(np.array([0b1101]))
    assert x[0] == 0b11 and y[0] == 0b10


def test_cover_bbox_contains_all_member_points():
    rng = np.random.default_rng(7)
    lon = rng.uniform(6.0, 6.5, 500)
    lat = rng.uniform(50.0, 50.4, 500)
    cover = set(cells.cover_bbox(6.0, 50.0, 6.5, 50.4, 11).tolist())
    pts = cells.encode(lon, lat, 11)
    assert set(pts.tolist()) <= cover


def test_cover_radius_superset_of_circle_points():
    rng = np.random.default_rng(8)
    ang = rng.uniform(0, 2 * np.pi, 200)
    r = rng.uniform(0, 10_000, 200)  # metres
    lat0, lon0 = 51.0, 7.0
    lat = lat0 + (r * np.sin(ang)) / 111_320.0
    lon = lon0 + (r * np.cos(ang)) / (111_320.0 * np.cos(np.radians(lat0)))
    cover = set(cells.cover_radius(lon0, lat0, 10_000, 11).tolist())
    assert set(cells.encode(lon, lat, 11).tolist()) <= cover


def test_quadkey_matches_tile_code_digits():
    qk = cells.quadkey_str(np.array([0b_01_11_00_10]), 4)
    assert qk[0] == "1302"


def test_slippy_tile_known_values():
    # openstreetmap.org reference points
    x, y = tiles.tile_xy(np.array([13.4]), np.array([52.5]), 10)  # Berlin
    assert (x[0], y[0]) == (550, 335)
    x, y = tiles.tile_xy(np.array([0.0]), np.array([0.0]), 1)
    assert (x[0], y[0]) == (1, 1)  # equator boundary floors southward
    x, y = tiles.tile_xy(np.array([0.1]), np.array([0.1]), 1)
    assert (x[0], y[0]) == (1, 0)  # strictly NE quadrant
    x, y = tiles.tile_xy(np.array([-180.0]), np.array([85.0]), 3)
    assert (x[0], y[0]) == (0, 0)


def test_tile_bounds_roundtrip():
    for z, tx, ty in [(10, 550, 335), (6, 33, 21), (14, 8800, 5373)]:
        lon0, lat0, lon1, lat1 = tiles.tile_bounds(tx, ty, z)
        cx, cy = (lon0 + lon1) / 2, (lat0 + lat1) / 2
        x, y = tiles.tile_xy(np.array([cx]), np.array([cy]), z)
        assert (x[0], y[0]) == (tx, ty)


def test_tile_xy_multi_exact_shift_identity():
    """tile_xy_multi derives shallow zooms by bit shift from the deepest
    zoom; must equal the direct per-zoom computation bit-for-bit
    (power-of-two float scaling is mantissa-exact)."""
    import numpy as np

    from plasmap_ray import tiles

    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 100_000)
    lat = rng.uniform(-89.9, 89.9, 100_000)
    xy = tiles.tile_xy_multi(lon, lat, (6, 10, 14))
    for z in (6, 10, 14):
        x, y = tiles.tile_xy(lon, lat, z)
        assert np.array_equal(x, xy[z][0])
        assert np.array_equal(y, xy[z][1])


def test_geohash_encode_known_vectors():
    from plasmap_ray import cells

    # canonical Niemeyer examples
    assert cells.geohash_encode(np.array([-5.6]), np.array([42.6]), 5)[0] == "ezs42"
    assert cells.geohash_encode(np.array([-0.1]), np.array([51.5]), 6)[0].startswith("gcpu")
    # textbook per-bit refinement recompute over a grid
    def ref(lon, lat, chars):
        lo1, hi1, lo2, hi2 = -180.0, 180.0, -90.0, 90.0
        b = []
        for k in range(5 * chars):
            if k % 2 == 0:
                mid = (lo1 + hi1) / 2
                b.append(1 if lon >= mid else 0)
                if lon >= mid:
                    lo1 = mid
                else:
                    hi1 = mid
            else:
                mid = (lo2 + hi2) / 2
                b.append(1 if lat >= mid else 0)
                if lat >= mid:
                    lo2 = mid
                else:
                    hi2 = mid
        return "".join(
            cells.GEOHASH_ALPHABET[int("".join(map(str, b[5 * i : 5 * i + 5])), 2)] for i in range(chars)
        )

    lons = np.linspace(-179.9, 179.9, 23)
    lats = np.linspace(-89.9, 89.9, 19)
    gl, gt = np.meshgrid(lons, lats)
    for chars in (5, 6, 7):  # both bit-total parities
        got = cells.geohash_encode(gl.ravel(), gt.ravel(), chars)
        for i, (x, y) in enumerate(zip(gl.ravel(), gt.ravel())):
            assert got[i] == ref(float(x), float(y), chars)


def test_hilbert_d_properties():
    from plasmap_ray import cells

    bits = 5
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = cells.hilbert_d(xs.ravel(), ys.ravel(), bits)
    # bijection onto [0, n^2)
    assert sorted(d.tolist()) == list(range(n * n))
    # defining locality: consecutive curve positions are edge-adjacent
    order = np.argsort(d)
    px, py = xs.ravel()[order], ys.ravel()[order]
    steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert steps.max() == 1
    # canonical first corner: d=0 at (0,0)
    assert d[(xs.ravel() == 0) & (ys.ravel() == 0)][0] == 0


def test_hilbert_beats_morton_locality(ray_session):
    from plasmap_ray.pipelines import spatial

    out = spatial.hilbert_locality_stats("/root/testdata/sf0.001").to_pandas().set_index("curve")
    assert out.loc["hilbert", "total_step"] < out.loc["morton", "total_step"]
    assert out.loc["hilbert", "n_cells"] == out.loc["morton", "n_cells"]
