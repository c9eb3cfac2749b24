"""S2-style cell encoding: Hilbert curve laws, projection round-trips,
and the hierarchical prefix contract."""

import numpy as np
import pytest

from plasmap_ray import s2


def test_hilbert_bijective_and_adjacent():
    order = 5
    n = 1 << order
    gx, gy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = s2.hilbert_d(gx.ravel(), gy.ravel(), order)
    # bijection onto [0, 4^order)
    assert np.sort(d).tolist() == list(range(n * n))
    # the defining Hilbert property: consecutive positions are
    # grid-adjacent (Manhattan distance exactly 1)
    x, y = s2.hilbert_xy(np.arange(n * n), order)
    step = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (step == 1).all()
    # inverse really inverts
    assert (s2.hilbert_d(x, y, order) == np.arange(n * n)).all()


def test_hilbert_prefix_property():
    """Parent cell position = child position >> 2 (S2's hierarchy)."""
    order = 6
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << order, 500)
    y = rng.integers(0, 1 << order, 500)
    d = s2.hilbert_d(x, y, order)
    for dz in (1, 2, 3):
        parent = s2.hilbert_d(x >> dz, y >> dz, order - dz)
        assert (d >> (2 * dz) == parent).all()


def test_uv_st_round_trip():
    u = np.linspace(-1, 1, 1001)
    st = s2.uv_to_st(u)
    assert (st >= 0).all() and (st <= 1).all()
    assert (np.diff(st) > 0).all()  # strictly monotone
    np.testing.assert_allclose(s2.st_to_uv(st), u, atol=1e-12)


def test_face_uv_round_trip_all_faces():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-89.9, 89.9, 5000)
    xyz = s2.lonlat_to_xyz(lon, lat)
    face, u, v = s2.xyz_to_face_uv(*xyz)
    assert set(np.unique(face)) == set(range(6))  # hits every cube face
    assert (np.abs(u) <= 1 + 1e-12).all() and (np.abs(v) <= 1 + 1e-12).all()


def test_encode_decode_center_round_trip():
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-85, 85, 2000)
    level = 16
    cell = s2.encode(lon, lat, level)
    assert (cell >= 0).all()
    clon, clat = s2.decode_center(cell, level)
    # the center of a level-16 cell is within the cell: re-encoding the
    # center must return the same cell id
    assert (s2.encode(clon, clat, level) == cell).all()
    # and the center is close to the input point (level-16 cells are
    # ~150 m wide; allow a generous bound in degrees)
    assert np.abs(clon - lon).max() < 0.05
    assert np.abs(clat - lat).max() < 0.05


def test_reduce_level_matches_coarse_encode():
    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 3000)
    lat = rng.uniform(-85, 85, 3000)
    fine = s2.encode(lon, lat, 14)
    for lv in (12, 10, 8):
        np.testing.assert_array_equal(
            s2.reduce_level(fine, 14, lv), s2.encode(lon, lat, lv)
        )


def test_hilbert_locality_beats_morton():
    """The why-S2 story: walking the curve index order, Hilbert's step
    between consecutive cells is ALWAYS one grid unit, while Morton's
    Z-order leaps across half the grid at power-of-two boundaries — so
    a contiguous cell-id range maps to a compact region (what range
    partitioning of cell keys relies on)."""
    from plasmap_ray import cells

    order = 8
    n = 1 << order
    d = np.arange(n * n, dtype=np.int64)
    hx, hy = s2.hilbert_xy(d, order)
    h_steps = np.abs(np.diff(hx)) + np.abs(np.diff(hy))
    mx, my = cells.deinterleave(d)
    m_steps = np.abs(np.diff(mx)) + np.abs(np.diff(my))
    assert h_steps.max() == 1
    assert m_steps.max() >= n // 2  # Z-order's long diagonal leaps


def test_level_validation():
    with pytest.raises(ValueError):
        s2.encode([0.0], [0.0], 0)
    with pytest.raises(ValueError):
        s2.reduce_level([0], 8, 10)
