"""Slippy-map (Web-Mercator z/x/y) tile kernels — vectorized NumPy.

The raster<->vector bridge of the engine: every feature gets a tile
assignment at one or more zoom levels; per-tile aggregation is the
"tiling" write (reference analogue: the (cell x tag) fan-out of
``ProcessingUtilities.toBBTag``, processing/ProcessingUtilities.scala:33-43,
persisted per-cell by DataByTagPersister.scala:27-53).

Standard OSM slippy math (linear lon, Mercator lat):

    x = floor((lon + 180) / 360 * 2**z)
    y = floor((1 - asinh(tan(lat_rad)) / pi) / 2 * 2**z)

Latitudes are clamped to the Web-Mercator limit +-85.05112878 deg.
The quadkey of a tile is the Morton interleave of (x, y) read as
base-4 digits, identical to Bing quadkeys.  The same formulas are
mirrored in SQL by plasmap_ray.oracle for the DuckDB correctness gate.
"""

from __future__ import annotations

import numpy as np

from .cells import interleave, quadkey_str

MERC_LAT_LIMIT = 85.05112878


def tile_xy(lon, lat, z: int) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat arrays -> slippy tile (x, y) at zoom ``z`` (int64)."""
    n = np.int64(1) << z
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MERC_LAT_LIMIT, MERC_LAT_LIMIT)
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = np.radians(lat)
    y = np.floor((1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n).astype(np.int64)
    np.clip(x, 0, n - 1, out=x)
    np.clip(y, 0, n - 1, out=y)
    return x, y


def tile_xy_multi(lon, lat, zooms: tuple[int, ...]) -> dict[int, tuple[np.ndarray, np.ndarray]]:
    """Tile (x, y) at several zooms from ONE trig pass.

    Computes the deepest zoom once and derives shallower zooms by bit
    shift.  This is EXACT, not approximate: multiplying by a power of
    two only changes a float's exponent (no mantissa rounding), so
    u*2^zmax == (u*2^z)*2^(zmax-z) bit-for-bit and the nested-floor
    identity floor(u*2^zmax) >> (zmax-z) == floor(u*2^z) carries over;
    the clamp endpoints shift consistently ((2^zmax-1) >> d == 2^z-1).
    Saves the arcsinh/tan pass per extra zoom (the tiling explode's
    dominant ALU cost).
    """
    zmax = max(zooms)
    x, y = tile_xy(lon, lat, zmax)
    out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for z in zooms:
        s = zmax - z
        out[z] = (x, y) if s == 0 else (x >> np.int64(s), y >> np.int64(s))
    return out


def tile_code(x, y) -> np.ndarray:
    """Morton code of a tile (x, y) — sortable int64 quadkey."""
    return interleave(np.asarray(x, dtype=np.int64), np.asarray(y, dtype=np.int64))


def tile_quadkey(x, y, z: int) -> np.ndarray:
    """String quadkey (Bing convention: digit = 2*ybit + xbit)."""
    return quadkey_str(tile_code(x, y), z)


def tile_bounds(x: int, y: int, z: int) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of tile z/x/y."""
    n = float(1 << z)
    lon0 = x / n * 360.0 - 180.0
    lon1 = (x + 1) / n * 360.0 - 180.0

    def _lat(yy: float) -> float:
        t = np.pi * (1.0 - 2.0 * yy / n)
        return float(np.degrees(np.arctan(np.sinh(t))))

    return lon0, _lat(y + 1), lon1, _lat(y)
