"""Hex binning laws: cube-rounding picks the nearest center, packing
round-trips, neighbor geometry is isotropic."""

import numpy as np

from plasmap_ray import hexgrid


def test_pack_unpack_round_trip():
    q = np.array([-5, 0, 3, 1000, -1000], dtype=np.int64)
    r = np.array([7, 0, -2, -999, 999], dtype=np.int64)
    cell = ((q + hexgrid._OFFSET) << np.int64(32)) | (r + hexgrid._OFFSET)
    uq, ur = hexgrid.unpack(cell)
    np.testing.assert_array_equal(uq, q)
    np.testing.assert_array_equal(ur, r)


def test_cube_round_sums_to_zero():
    rng = np.random.default_rng(2)
    q = rng.uniform(-50, 50, 10_000)
    r = rng.uniform(-50, 50, 10_000)
    rq, rr = hexgrid.cube_round(q, r)
    # valid cube coords: q + r + s = 0 holds by construction of axial,
    # and the rounded triple must satisfy it too (that's what the fix
    # step restores)
    assert rq.dtype == np.int64


def test_encode_picks_nearest_center():
    rng = np.random.default_rng(4)
    lon = rng.uniform(-10, 10, 2000)
    lat = rng.uniform(-10, 10, 2000)
    cell = hexgrid.encode(lon, lat)
    clon, clat = hexgrid.center(cell)
    d_own = np.hypot(lon - clon, lat - clat)
    # distance to every ring-1 neighbor center must be >= own distance
    neigh = hexgrid.neighbors(cell)
    for k in range(6):
        nlon, nlat = hexgrid.center(neigh[:, k])
        d_n = np.hypot(lon - nlon, lat - nlat)
        assert (d_own <= d_n + 1e-9).all()
    # and inside the circumradius
    assert d_own.max() <= hexgrid.DEFAULT_SIZE_DEG + 1e-9


def test_centers_on_lattice_and_isotropic_neighbors():
    cell = hexgrid.encode(np.array([3.0]), np.array([2.0]))
    neigh = hexgrid.neighbors(cell)
    clon, clat = hexgrid.center(cell)
    dists = []
    for k in range(6):
        nlon, nlat = hexgrid.center(neigh[:, k])
        dists.append(float(np.hypot(nlon - clon, nlat - clat)))
    # all 6 neighbors equidistant (hex isotropy — squares can't do this)
    np.testing.assert_allclose(dists, dists[0], rtol=1e-12)
    np.testing.assert_allclose(dists[0], np.sqrt(3.0) * hexgrid.DEFAULT_SIZE_DEG, rtol=1e-12)


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(8)
    lon = rng.uniform(-20, 20, 500)
    lat = rng.uniform(-20, 20, 500)
    got = hexgrid.encode(lon, lat)
    size = hexgrid.DEFAULT_SIZE_DEG
    s3 = np.sqrt(3.0)
    for i in range(500):
        q = (s3 / 3.0 * lon[i] - lat[i] / 3.0) / size
        r = (2.0 / 3.0 * lat[i]) / size
        s = -q - r
        rq, rr, rs = round(q), round(r), round(s)
        dq, dr, ds = abs(rq - q), abs(rr - r), abs(rs - s)
        if dq > dr and dq > ds:
            rq = -rr - rs
        elif dr > ds:
            rr = -rq - rs
        want = ((int(rq) + (1 << 30)) << 32) | (int(rr) + (1 << 30))
        assert got[i] == want, i
