"""Image payload codecs — pure NumPy + stdlib zlib (no PIL in sandbox).

The driver's input table carries opaque image payloads
(``bytes:binary, w:int32, h:int32, fmt:string``).  This module is the
codec registry used by the fidelity/verification stages (ST5 in
SURVEY.md §2.3).  Formats:

- ``raw``  : uncompressed RGB24, row-major (lossless)
- ``pngz`` : zlib-deflated RGB24 (lossless, stdlib only)
- ``qnt8`` : 3-bit-per-channel quantized RGB packed in bytes then
             zlib-deflated (deterministic lossy — exercises the
             PSNR >= 40 dB fidelity gate from the driver input_hint)

Per-row fidelity invariant (BASELINE.md): decode(bytes, fmt) must be
byte-equal to reference pixels for lossless formats and reach
PSNR >= 40 dB for lossy ones; captions must be byte-equal.
"""

from __future__ import annotations

import zlib

import numpy as np

FORMATS = ("raw", "pngz", "qnt8")

# qnt8: keep the top QBITS of each channel, rounding to bucket centers.
_QBITS = 6  # 6 bits/channel -> quantization MSE ~1.3 -> PSNR ~46 dB (>= 40 gate)
_QSHIFT = 8 - _QBITS


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """(h, w, 3) uint8 -> payload bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "pngz":
        return zlib.compress(pixels.tobytes(), 6)
    if fmt == "qnt8":
        q = (pixels >> _QSHIFT).astype(np.uint8)
        return zlib.compress(q.tobytes(), 6)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(payload: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """payload bytes -> (h, w, 3) uint8."""
    if fmt == "raw":
        buf = np.frombuffer(payload, dtype=np.uint8)
    elif fmt == "pngz":
        buf = np.frombuffer(zlib.decompress(payload), dtype=np.uint8)
    elif fmt == "qnt8":
        q = np.frombuffer(zlib.decompress(payload), dtype=np.uint8)
        # reconstruct at bucket centers
        buf = ((q.astype(np.uint16) << _QSHIFT) + (1 << (_QSHIFT - 1))).clip(0, 255).astype(np.uint8)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return buf.reshape(h, w, 3)


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 images; inf if equal.

    Computed via an integer sum of squares: every square (<= 255^2) and
    every partial sum (< 2^53) is exactly representable, so the result
    is bit-identical to the float64-mean formulation while moving ~1/3
    of the memory traffic (int16/int64 vs float64 temporaries).
    """
    d = a.astype(np.int16) - b
    d64 = d.astype(np.int64).ravel()
    sse = int(d64 @ d64)
    if sse == 0:
        return float("inf")
    mse = sse / d.size
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit mean-hash perceptual fingerprint of an RGB image.

    Grayscale -> 8x8 block means -> bit i set iff block mean > global
    mean.  Deterministic, resolution-invariant for the fixture images;
    near-duplicate images map to small Hamming distances.  Returned as
    a signed int64 (two's complement) to match the ``phash:int64``
    input column.
    """
    # channel sum in int16 (max 765, exact), single float64 divide: the
    # per-pixel value equals np.mean(axis=2) bit-for-bit (integer adds
    # are exact, the /3.0 is the same division) without the 24 B/px
    # float64 RGB temporary
    s = pixels[:, :, 0].astype(np.int16) + pixels[:, :, 1] + pixels[:, :, 2]
    gray = s / 3.0
    h, w = gray.shape
    # average-pool to 8x8 (pad to a multiple of 8 by edge-repeat)
    ph = (-h) % 8
    pw = (-w) % 8
    if ph or pw:
        gray = np.pad(gray, ((0, ph), (0, pw)), mode="edge")
    hb = gray.shape[0] // 8
    wb = gray.shape[1] // 8
    blocks = gray.reshape(8, hb, 8, wb).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).ravel()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    # two's complement into int64
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def popcount64(x) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 arrays."""
    x = np.atleast_1d(np.asarray(x)).astype(np.uint64, copy=True)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def hamming64(a, b) -> np.ndarray:
    """Vectorized Hamming distance between int64 hash arrays."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64)).view(np.uint64)
    return popcount64(x)
