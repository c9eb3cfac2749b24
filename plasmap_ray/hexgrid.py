"""Hexagonal binning — the H3 leg of the "H3/S2 cell-encoded" surface.

True H3 is an icosahedral aperture-7 hierarchy bound to the external
`h3` library; what training-data pipelines actually use hex bins FOR —
uniform-neighborhood density estimation, hot-cell detection, join keys
where square cells alias along the axes — needs a hex LATTICE, not the
icosahedron.  This module is that honest analogue, documented as such:
a pointy-top axial-coordinate hex grid over lon/lat degrees with
classic cube rounding (the published Red Blob Games construction),
fully vectorized.

A hex cell id packs the axial (q, r) pair into one int64:

    cell = (q + OFFSET) << 32 | (r + OFFSET)      OFFSET = 2^31 / 2

Every point maps to the NEAREST hex center (cube rounding), giving the
equal-area-neighborhood property square Morton cells lack: all 6
neighbors of a hex are at the same center distance, so a "hot cell +
ring-1 neighbors" query has no corner bias.
"""

from __future__ import annotations

import numpy as np

DEFAULT_SIZE_DEG = 0.25  # hex circumradius in degrees (~ the fixture world scale)
_OFFSET = np.int64(1) << 30
_SQRT3 = np.sqrt(3.0)


def axial_frac(lon, lat, size: float = DEFAULT_SIZE_DEG) -> tuple[np.ndarray, np.ndarray]:
    """Fractional axial coordinates of a pointy-top hex lattice."""
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    q = (_SQRT3 / 3.0 * x - 1.0 / 3.0 * y) / size
    r = (2.0 / 3.0 * y) / size
    return q, r


def cube_round(q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Round fractional axial coords to the nearest hex (cube rounding)."""
    s = -q - r
    rq = np.round(q)
    rr = np.round(r)
    rs = np.round(s)
    dq = np.abs(rq - q)
    dr = np.abs(rr - r)
    ds = np.abs(rs - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    rq = np.where(fix_q, -rr - rs, rq)
    rr = np.where(fix_r, -rq - rs, rr)
    return rq.astype(np.int64), rr.astype(np.int64)


def encode(lon, lat, size: float = DEFAULT_SIZE_DEG) -> np.ndarray:
    """lon/lat arrays -> packed int64 hex cell ids."""
    q, r = cube_round(*axial_frac(lon, lat, size))
    return ((q + _OFFSET) << np.int64(32)) | (r + _OFFSET)


def unpack(cell) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    return (cell >> np.int64(32)) - _OFFSET, (cell & np.int64(0xFFFFFFFF)) - _OFFSET


def center(cell, size: float = DEFAULT_SIZE_DEG) -> tuple[np.ndarray, np.ndarray]:
    """Hex cell id -> (lon, lat) of the hex center."""
    q, r = unpack(cell)
    q = q.astype(np.float64)
    r = r.astype(np.float64)
    lon = size * (_SQRT3 * q + _SQRT3 / 2.0 * r)
    lat = size * (1.5 * r)
    return lon, lat


def neighbors(cell) -> np.ndarray:
    """The 6 ring-1 neighbor cell ids of each input cell (n x 6)."""
    q, r = unpack(cell)
    dq = np.array([1, 1, 0, -1, -1, 0], dtype=np.int64)
    dr = np.array([0, -1, -1, 0, 1, 1], dtype=np.int64)
    nq = q[:, None] + dq[None, :]
    nr = r[:, None] + dr[None, :]
    return ((nq + _OFFSET) << np.int64(32)) | (nr + _OFFSET)
