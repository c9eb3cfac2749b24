"""S2-style hierarchical cell ids — cube face + quadratic ST projection
+ Hilbert curve, fully vectorized.

The north-star architecture calls for records to be "H3/S2
cell-encoded"; :mod:`plasmap_ray.cells` is the Morton/quadkey (geohash)
form the reference itself uses, this module adds the S2 family: the
sphere is projected onto 6 cube faces, face coordinates pass through
S2's quadratic area-equalizing ST transform, and the (i, j) grid cell
at ``level`` is linearized along a HILBERT curve — so consecutive cell
ids are spatially adjacent (better shuffle locality than Morton, whose
Z-order jumps) and a parent cell id is a strict 2-bit prefix of its
children, exactly like S2's cell-id hierarchy.

Cell id layout (fits int64 for level <= 30):

    cell = face << (2*level) | hilbert_position(i, j, level)

``reduce_level`` is therefore the same right-shift coarsening contract
as ``cells.reduce_precision`` — the property every hierarchical roll-up
(tile pyramid, cell-cover pruning) relies on.  All formulas are the
published S2 geometry (faces, u→s quadratic), public knowledge; the
Hilbert transform is the classic bit-twiddling construction, written
here as NumPy array ops (the per-level loop is over BITS, not rows).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
DEFAULT_LEVEL = 12
COARSE_LEVEL = 8


# ---------------------------------------------------------------------------
# Sphere -> face/(u,v): the 6-face cube projection (S2 face convention)
# ---------------------------------------------------------------------------


def lonlat_to_xyz(lon, lat) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Largest-|axis| face selection + per-face (u, v) in [-1, 1]."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate(
        [
            (lambda x, y, z: y, lambda x, y, z: z, lambda x, y, z: x),  # +x
            (lambda x, y, z: -x, lambda x, y, z: z, lambda x, y, z: y),  # +y
            (lambda x, y, z: -x, lambda x, y, z: -y, lambda x, y, z: z),  # +z
            (lambda x, y, z: z, lambda x, y, z: y, lambda x, y, z: x),  # -x
            (lambda x, y, z: z, lambda x, y, z: -x, lambda x, y, z: y),  # -y
            (lambda x, y, z: -y, lambda x, y, z: -x, lambda x, y, z: z),  # -z
        ]
    ):
        m = face == f
        if m.any():
            d = de(x, y, z)[m]
            u[m] = ue(x, y, z)[m] / d
            v[m] = ve(x, y, z)[m] / d
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2 quadratic projection: equalizes cell areas across a face."""
    return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (4.0 * s * s - 1.0) / 3.0, (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0
    )


# ---------------------------------------------------------------------------
# Hilbert curve (vectorized over rows; loop is over the `order` bit levels)
# ---------------------------------------------------------------------------


def hilbert_d(x, y, order: int) -> np.ndarray:
    """(i, j) grid coords -> position along the order-``order`` Hilbert
    curve.  Consecutive positions are grid-adjacent, and positions are
    contiguous within every quadtree parent (the prefix property)."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # descend into the quadrant: drop the processed bit, then apply
        # the quadrant's reflection/transpose to the remainder
        x &= s - 1
        y &= s - 1
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


def hilbert_xy(d, order: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`hilbert_d`."""
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = np.int64(1)
    top = np.int64(1) << order
    while s < top:
        rx = (t >> 1) & 1
        ry = (t ^ rx) & 1
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        x += s * rx
        y += s * ry
        t >>= 2
        s <<= 1
    return x, y


# ---------------------------------------------------------------------------
# Cell ids
# ---------------------------------------------------------------------------


def encode(lon, lat, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """lon/lat arrays -> int64 S2-style cell ids at ``level``."""
    if not 1 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [1,{MAX_LEVEL}], got {level}")
    face, u, v = xyz_to_face_uv(*lonlat_to_xyz(lon, lat))
    n = np.int64(1) << level
    i = np.clip(np.floor(uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip(np.floor(uv_to_st(v) * n).astype(np.int64), 0, n - 1)
    return (face << np.int64(2 * level)) | hilbert_d(i, j, level)


def reduce_level(cell, from_level: int, to_level: int) -> np.ndarray:
    """Coarsen cell ids: parent is a strict prefix (same contract as
    ``cells.reduce_precision``)."""
    if to_level > from_level:
        raise ValueError("to_level must be <= from_level")
    return np.asarray(cell, dtype=np.int64) >> np.int64(2 * (from_level - to_level))


def decode_center(cell, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Cell id -> (lon, lat) of the cell center."""
    cell = np.asarray(cell, dtype=np.int64)
    face = cell >> np.int64(2 * level)
    pos = cell & ((np.int64(1) << np.int64(2 * level)) - 1)
    i, j = hilbert_xy(pos, level)
    n = float(1 << level)
    u = st_to_uv((i.astype(np.float64) + 0.5) / n)
    v = st_to_uv((j.astype(np.float64) + 0.5) / n)
    # face (u, v) -> xyz: inverse of the xyz_to_face_uv table
    one = np.ones_like(u)
    xyz_by_face = [
        (one, u, v),  # +x
        (-u, one, v),  # +y
        (-u, -v, one),  # +z
        (-one, -v, -u),  # -x: u=z/x, v=y/x with x=-1
        (v, -one, -u),  # -y: u=z/y, v=-x/y with y=-1
        (v, u, -one),  # -z: u=-y/z, v=-x/z with z=-1
    ]
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (xf, yf, zf) in enumerate(xyz_by_face):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = xf[m], yf[m], zf[m]
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat
