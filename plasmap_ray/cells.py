"""64-bit Morton (z-order) spatial cell index — vectorized NumPy kernels.

Rebuild of the reference's central spatial key: a Long produced by
bit-interleaving lon/lat at a chosen precision (geow ``GeoHash``; precision
ladder enumerated at util/src/main/scala/io/plasmap/util/GeoCalculator.scala:28-61,
encode at OsmObjectMapper.scala:1048, precision-reduce at GeoCalculator.scala:84-87,
bbox cell cover at GeoCalculator.scala:89-93).

Here a cell id at precision ``p`` (bits per dimension, 1..31) is

    x = floor((lon + 180) / 360 * 2**p)   clamped to [0, 2**p - 1]
    y = floor((lat +  90) / 180 * 2**p)   clamped to [0, 2**p - 1]
    cell = interleave(x, y)               # x gets even bits, y odd bits

so ``cell`` is in ``[0, 4**p)`` and always fits non-negative int64 for
p <= 31.  Coarsening precision is a right shift by ``2*(p1-p2)`` —
a parent cell id is a strict prefix of its children (quadtree).  The
base-4 digits of ``cell`` are exactly a quadkey.

The same arithmetic is expressible in ANSI SQL (see plasmap_ray.oracle)
which is how the DuckDB correctness oracle validates these kernels.

Precision policy mirrors the reference (OsmObjectMapper.scala:1031-1043):
nodes/ways indexed at "low" ~20 km cells, relations at "veryLow" ~80 km.
At the equator 360deg/2**11 = 0.176deg ~= 19.6 km and 360/2**9 = 0.70deg
~= 78 km, hence PRECISION_LOW = 11, PRECISION_VERY_LOW = 9.
"""

from __future__ import annotations

import numpy as np

MAX_PRECISION = 31
PRECISION_LOW = 11  # ~20 km cells (node/way index precision)
PRECISION_VERY_LOW = 9  # ~80 km cells (relation index precision)

_M0 = np.int64(0x0000FFFF0000FFFF)
_M1 = np.int64(0x00FF00FF00FF00FF)
_M2 = np.int64(0x0F0F0F0F0F0F0F0F)
_M3 = np.int64(0x3333333333333333)
_M4 = np.int64(0x5555555555555555)


def spread_bits(x: np.ndarray) -> np.ndarray:
    """Spread the low 31 bits of ``x`` so bit i lands at position 2*i."""
    x = np.asarray(x, dtype=np.int64)
    x = (x | (x << 16)) & _M0
    x = (x | (x << 8)) & _M1
    x = (x | (x << 4)) & _M2
    x = (x | (x << 2)) & _M3
    x = (x | (x << 1)) & _M4
    return x


def compact_bits(x: np.ndarray) -> np.ndarray:
    """Inverse of :func:`spread_bits` (keeps even-position bits)."""
    x = np.asarray(x, dtype=np.int64) & _M4
    x = (x | (x >> 1)) & _M3
    x = (x | (x >> 2)) & _M2
    x = (x | (x >> 4)) & _M1
    x = (x | (x >> 8)) & _M0
    x = (x | (x >> 16)) & np.int64(0x00000000FFFFFFFF)
    return x


def lonlat_to_xy(lon, lat, precision: int) -> tuple[np.ndarray, np.ndarray]:
    """Unit-square grid coordinates at ``precision`` bits per dimension."""
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"precision must be in [1,{MAX_PRECISION}], got {precision}")
    n = np.int64(1) << precision
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    return x, y


def interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton code: x in even bit positions, y in odd."""
    return spread_bits(x) | (spread_bits(y) << 1)


def deinterleave(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    code = np.asarray(code, dtype=np.int64)
    return compact_bits(code), compact_bits(code >> 1)


def encode(lon, lat, precision: int = PRECISION_LOW) -> np.ndarray:
    """lon/lat arrays -> int64 Morton cell ids at ``precision``.

    Reference analogue: ``GeoHash.encodeParallel`` (OsmObjectMapper.scala:1048).
    """
    x, y = lonlat_to_xy(lon, lat, precision)
    return interleave(x, y)


def decode_bounds(code, precision: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Cell id -> (lon_min, lat_min, lon_max, lat_max) of the cell."""
    x, y = deinterleave(code)
    n = float(1 << precision)
    lon_min = x / n * 360.0 - 180.0
    lat_min = y / n * 180.0 - 90.0
    return lon_min, lat_min, lon_min + 360.0 / n, lat_min + 180.0 / n


def decode_center(code, precision: int) -> tuple[np.ndarray, np.ndarray]:
    lon0, lat0, lon1, lat1 = decode_bounds(code, precision)
    return (lon0 + lon1) / 2.0, (lat0 + lat1) / 2.0


def reduce_precision(code, from_precision: int, to_precision: int) -> np.ndarray:
    """Coarsen a cell id (parent prefix).

    Reference analogue: ``GeoHash.reduceParallelPrecision``
    (GeoCalculator.scala:84-87, Queries.scala:356).
    """
    if to_precision > from_precision:
        raise ValueError("to_precision must be <= from_precision")
    return np.asarray(code, dtype=np.int64) >> np.int64(2 * (from_precision - to_precision))


def cover_bbox(
    lon_min: float, lat_min: float, lon_max: float, lat_max: float, precision: int
) -> np.ndarray:
    """All cell ids at ``precision`` intersecting the bbox (inclusive).

    Reference analogue: ``GeoHash.encapsulatingRectangleHashes``
    (GeoCalculator.scala:89-93) — the rectangle-of-cells cover used for
    area queries and radius queries.  Returns a sorted 1-D int64 array.
    """
    x0, y0 = lonlat_to_xy(lon_min, lat_min, precision)
    x1, y1 = lonlat_to_xy(lon_max, lat_max, precision)
    xs = np.arange(int(x0), int(x1) + 1, dtype=np.int64)
    ys = np.arange(int(y0), int(y1) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    out = interleave(gx.ravel(), gy.ravel())
    out.sort()
    return out


def cover_radius(lon: float, lat: float, radius_m: float, precision: int) -> np.ndarray:
    """Cells covering the bbox of a geodesic circle.

    Reference analogue: ``GeoCalculator.radiusToBoundingBoxes``
    (GeoCalculator.scala:63-94) — degree offsets from metres, then cover.
    """
    dlat = radius_m / 111_320.0
    dlon = radius_m / (111_320.0 * max(np.cos(np.radians(lat)), 1e-9))
    return cover_bbox(lon - dlon, lat - dlat, lon + dlon, lat + dlat, precision)


def quadkey_str(code, precision: int) -> np.ndarray:
    """Base-4 digit string of the Morton code (classic quadkey).

    Digit convention: digit = 2*ybit + xbit per level, most significant
    level first.  Fully vectorized: digits -> uint8 char matrix ->
    fixed-width bytes view -> unicode (no per-row Python).
    """
    code = np.atleast_1d(np.asarray(code, dtype=np.int64))
    n = code.shape[0]
    chars = np.empty((n, precision), dtype=np.uint8)
    c = code.copy()
    for lvl in range(precision - 1, -1, -1):
        chars[:, lvl] = (c & 3).astype(np.uint8) + ord("0")
        c >>= 2
    return np.ascontiguousarray(chars).view(f"S{precision}").ravel().astype(f"U{precision}")


# ---------------------------------------------------------------------------
# classic base32 geohash strings (interop encoding)
# ---------------------------------------------------------------------------

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_ALPHA_ARR = np.array(list(GEOHASH_ALPHABET))


def geohash_encode(lon: np.ndarray, lat: np.ndarray, chars: int = 7) -> np.ndarray:
    """Classic base32 geohash strings (Niemeyer encoding; the string
    form of the reference's ``GeoHash`` Long — geow interleaves the
    same way, lon bit first).  ``chars`` characters = 5·chars bits,
    lon gets ceil(bits/2), lat floor(bits/2).

    Vectorized: quantize lon/lat to their bit budgets, one Morton
    spread (lon at even LSB positions so the MSB pair starts with lon),
    then 5-bit groups index the alphabet.
    """
    bits = 5 * chars
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lx = np.floor((lon + 180.0) / 360.0 * float(1 << lon_bits)).astype(np.int64)
    ly = np.floor((lat + 90.0) / 180.0 * float(1 << lat_bits)).astype(np.int64)
    lx = np.clip(lx, 0, (1 << lon_bits) - 1)
    ly = np.clip(ly, 0, (1 << lat_bits) - 1)
    # the MSB must be a LON bit: with an odd bit total the MSB sits at
    # an even LSB position (lon even), with an even total at an odd one
    # (lon odd) — parity flips with ``chars``
    code = interleave(lx, ly) if bits % 2 == 1 else interleave(ly, lx)
    idx = np.empty((len(code), chars), dtype=np.int64)
    for i in range(chars):
        idx[:, i] = (code >> (bits - 5 * (i + 1))) & 31
    parts = _GH_ALPHA_ARR[idx]
    out = parts[:, 0]
    for i in range(1, chars):
        out = np.char.add(out, parts[:, i])
    return out.astype(object)


def hilbert_d(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Hilbert-curve distance of grid cells (x, y) on a 2^bits square —
    the scan-locality space-filling curve (adjacent keys are ALWAYS
    4-adjacent cells, unlike Morton's quadrant jumps), used for
    file-layout ordering where range scans should touch compact disk
    regions.

    Vectorized rotate-swap formulation (Wikipedia xy2d): one pass per
    bit from the top, int64 throughout.
    """
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d
