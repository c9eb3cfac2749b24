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
- ``dctq`` : 8x8 block DCT-II + frequency-weighted uniform quantization
             + zlib (pure NumPy; a real transform codec in the JPEG
             shape, losing information in the frequency domain).  The
             quantization table is sized so the WORST-CASE pixel MSE
             stays under the PSNR >= 40 dB gate (see ``_DCTQ_STEPS``).

Per-row fidelity invariant (BASELINE.md): decode(bytes, fmt) must be
byte-equal to reference pixels for lossless formats and reach
PSNR >= 40 dB for lossy ones; captions must be byte-equal.
"""

from __future__ import annotations

import zlib

import numpy as np

FORMATS = ("raw", "pngz", "qnt8", "dctq")

# qnt8: keep the top QBITS of each channel, rounding to bucket centers.
_QBITS = 6  # 6 bits/channel -> quantization MSE ~1.3 -> PSNR ~46 dB (>= 40 gate)
_QSHIFT = 8 - _QBITS


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis (JPEG's transform).  Orthonormality
    means the transform preserves L2 energy, so quantization error in
    the frequency domain EQUALS pixel-domain MSE — which lets the step
    table below carry a worst-case PSNR proof."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    c[0] *= 1.0 / np.sqrt(2.0)
    return c * 0.5


_DCT_C = _dct_matrix()

# Frequency-weighted uniform steps: step(u, v) = 2 + (u + v) // 4, i.e.
# 2 (DC) .. 5 (highest diagonal) — the JPEG idea (coarser where the eye
# cares less) at provably-high quality.  Worst-case bound (the L2
# triangle inequality, NOT an independence assumption): per-coefficient
# error <= step/2, so the frequency-domain worst-case RMSE is
# sqrt(mean((step/2)^2)) = sqrt(12.125)/2 ~= 1.741; Parseval carries it
# to the pixel domain, and the uint8 re-rounding adds <= 0.5 per pixel,
# so worst-case pixel MSE <= (1.741 + 0.5)^2 ~= 5.02 -> PSNR >= 41.1 dB
# on ANY input: the fidelity gate holds by construction, not by luck of
# the fixtures.  (The previous //3 table's combined bound was 39.93 dB
# — marginally BELOW the gate; review finding, round 3.)
_u, _v = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
_DCTQ_STEPS = (2 + (_u + _v) // 4).astype(np.float64)
del _u, _v


def _blocks(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(H, W) float64 -> (n_blocks, 8, 8) with edge-repeat padding."""
    h, w = chan.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        chan = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    hb, wb = chan.shape[0] // 8, chan.shape[1] // 8
    b = chan.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return b, hb, wb


def _unblocks(b: np.ndarray, hb: int, wb: int, h: int, w: int) -> np.ndarray:
    chan = b.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8)
    return chan[:h, :w]


def _dctq_encode(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    out = []
    for ch in range(3):
        b, hb, wb = _blocks(pixels[:, :, ch].astype(np.float64) - 128.0)
        coef = _DCT_C @ b @ _DCT_C.T  # batched 2-D DCT-II
        q = np.floor(coef / _DCTQ_STEPS + 0.5).astype(np.int16)
        out.append(q.tobytes())
    return zlib.compress(b"".join(out), 6)


def dctq_quantized(pixels: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> quantized DCT coefficients (3, n_blocks, 8, 8)
    int16 — the EXACT integers _dctq_encode stores (shared kernel for
    the energy-compaction profile; both the engine and its golden
    oracle call this and aggregate independently)."""
    out = []
    for ch in range(3):
        b, _, _ = _blocks(pixels[:, :, ch].astype(np.float64) - 128.0)
        coef = _DCT_C @ b @ _DCT_C.T
        out.append(np.floor(coef / _DCTQ_STEPS + 0.5).astype(np.int16))
    return np.stack(out)


def _dctq_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    hb, wb = (h + 7) // 8, (w + 7) // 8
    n = hb * wb * 64
    q = np.frombuffer(zlib.decompress(payload), dtype=np.int16).reshape(3, -1, 8, 8)
    if q.shape[1] != hb * wb:
        raise ValueError("dctq payload does not match (w, h)")
    img = np.empty((h, w, 3), dtype=np.uint8)
    for ch in range(3):
        coef = q[ch].astype(np.float64) * _DCTQ_STEPS
        b = _DCT_C.T @ coef @ _DCT_C
        img[:, :, ch] = np.clip(np.floor(_unblocks(b, hb, wb, h, w) + 128.0 + 0.5), 0, 255).astype(np.uint8)
    return img


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
    if fmt == "dctq":
        return _dctq_encode(pixels)
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
    elif fmt == "dctq":
        return _dctq_decode(payload, w, h)
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


# ---------------------------------------------------------------------------
# SSIM (structural similarity) — 8x8 non-overlapping windows
# ---------------------------------------------------------------------------

_SSIM_C1 = (0.01 * 255.0) ** 2
_SSIM_C2 = (0.03 * 255.0) ** 2


def ssim8x8(a: np.ndarray, b: np.ndarray) -> float:
    """Mean SSIM between two (h, w, 3) uint8 images over NON-OVERLAPPING
    8x8 luma windows (Wang et al. 2004, uniform window instead of the
    11x11 Gaussian — the block variant matching the dctq codec's grid).

    Luma is the exact integer channel sum / 3.0 (the phash64 grayscale
    contract).  Images are cropped to the 8-multiple so every window is
    complete; all statistics are float64 with a fixed expression order,
    shared verbatim by the engine stage and the golden recompute."""
    h = (a.shape[0] // 8) * 8
    w = (a.shape[1] // 8) * 8
    if h == 0 or w == 0:
        return 1.0 if np.array_equal(a, b) else 0.0

    def luma_blocks(px: np.ndarray) -> np.ndarray:
        s = px[:h, :w, 0].astype(np.int16) + px[:h, :w, 1] + px[:h, :w, 2]
        g = s.astype(np.float64) / 3.0
        return g.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 64)

    x = luma_blocks(a)
    y = luma_blocks(b)
    mx = x.mean(axis=1)
    my = y.mean(axis=1)
    vx = ((x - mx[:, None]) ** 2).mean(axis=1)
    vy = ((y - my[:, None]) ** 2).mean(axis=1)
    cxy = ((x - mx[:, None]) * (y - my[:, None])).mean(axis=1)
    s = ((2.0 * mx * my + _SSIM_C1) * (2.0 * cxy + _SSIM_C2)) / (
        (mx * mx + my * my + _SSIM_C1) * (vx + vy + _SSIM_C2)
    )
    return float(s.mean())


# ---------------------------------------------------------------------------
# Audio codec: mdctq — pure-NumPy MDCT + quantization + zlib (the lossy
# AUDIO sibling of dctq; closes the ST5 lossy-audio leg the mp3 stub
# cannot, since no compressed-audio decoder ships in this container).
# ---------------------------------------------------------------------------

AUDIO_FORMATS = ("pcm16", "mdctq")

MDCTQ_N = 256  # hop size; frames are 2N samples with 50% overlap


def _mdct_matrix(n: int = MDCTQ_N) -> np.ndarray:
    """Orthonormal windowed MDCT analysis matrix (n x 2n): row k is
    sqrt(2/n) * w[t] * cos(pi/n * (t + 0.5 + n/2) * (k + 0.5)) with the
    sine window w[t] = sin(pi/(2n) * (t + 0.5)).  The sine window
    satisfies the Princen-Bradley condition, so frames hopped by n
    overlap-add to PERFECT reconstruction (TDAC), and the family of all
    frame basis functions is orthonormal — coefficient-domain L2 error
    equals time-domain L2 error (the Parseval argument dctq uses)."""
    t = np.arange(2 * n)
    k = np.arange(n)
    w = np.sin(np.pi / (2 * n) * (t + 0.5))
    return np.sqrt(2.0 / n) * w[None, :] * np.cos(
        np.pi / n * (t[None, :] + 0.5 + n / 2.0) * (k[:, None] + 0.5)
    )


_MDCT_M = _mdct_matrix()

# Frequency-weighted uniform steps: 64 * (1 + k // 64) = 64..256 over the
# 256 bins (coarser where hearing is less acute — the MP3/AAC idea at
# provably-high quality).  Worst-case bound: per-coefficient error
# <= step/2; the basis family is orthonormal, so time-domain error
# energy over the padded signal = coefficient error energy, i.e. MSE
# <= ((T+1)/T) * mean_k((step_k/2)^2) = 2 * 7680 at the T=1 worst case,
# plus <= 0.5 LSB int16 re-rounding: PSNR vs the 32768 peak >=
# 10*log10(32768^2 / (sqrt(15360)+0.5)^2) ~= 48.3 dB on ANY input — the
# 40 dB fidelity gate holds by construction, not by luck of fixtures.
_MDCTQ_STEPS = (64.0 * (1 + np.arange(MDCTQ_N) // 64)).astype(np.float64)


def _mdct_frames(x: np.ndarray, n: int = MDCTQ_N) -> tuple[np.ndarray, int]:
    """float64 signal -> (T, 2n) overlapped frame matrix with n-sample
    zero padding at both ends (boundary frames fold against silence)."""
    L = x.size
    T = (L + n - 1) // n + 1  # frames so that (T+1)*n >= L + 2n
    total = (T + 1) * n
    xp = np.zeros(total, dtype=np.float64)
    xp[n : n + L] = x
    idx = np.arange(2 * n)[None, :] + (np.arange(T) * n)[:, None]
    return xp[idx], T


def encode_audio_mdctq(s16: np.ndarray) -> bytes:
    """int16 PCM -> mdctq payload (uint32 n_samples header + zlib'd
    int16 quantized MDCT coefficients)."""
    if s16.dtype != np.int16 or s16.ndim != 1:
        raise ValueError("samples must be 1-D int16 PCM")
    frames, _ = _mdct_frames(s16.astype(np.float64))
    coef = frames @ _MDCT_M.T  # (T, n)
    # |coef| <= 32768 * sqrt(n) = 524288; / min step 64 -> 8192: int16-safe
    q = np.floor(coef / _MDCTQ_STEPS[None, :] + 0.5).astype(np.int16)
    header = np.array([s16.size], dtype="<u4").tobytes()
    return header + zlib.compress(q.tobytes(), 6)


def decode_audio_mdctq(payload: bytes) -> np.ndarray:
    """mdctq payload -> int16 PCM (length restored from the header)."""
    n = MDCTQ_N
    if len(payload) < 4:
        raise ValueError("mdctq payload too short")
    L = int(np.frombuffer(payload[:4], dtype="<u4")[0])
    try:
        raw = zlib.decompress(payload[4:])
    except zlib.error as e:
        raise ValueError(f"mdctq payload corrupt: {e}") from e
    if len(raw) % (2 * n):
        raise ValueError("mdctq payload does not match frame size")
    q = np.frombuffer(raw, dtype=np.int16).reshape(-1, n)
    T = q.shape[0]
    if T != (L + n - 1) // n + 1:
        raise ValueError("mdctq payload does not match n_samples")
    rec = (q.astype(np.float64) * _MDCTQ_STEPS[None, :]) @ _MDCT_M  # (T, 2n)
    total = (T + 1) * n
    y = np.zeros(total, dtype=np.float64)
    for half in (0, 1):  # overlap-add without scatter collisions
        y[half * n : half * n + T * n] += rec[:, half * n : (half + 1) * n].reshape(-1)
    out = y[n : n + L]
    return np.clip(np.floor(out + 0.5), -32768, 32767).astype(np.int16)


def audio_psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR between two int16 PCM signals against the 32768 full-scale
    peak; inf when byte-equal.  Integer sum of squares (every square
    <= 65536^2 and every partial < 2^53 is exact — the psnr_db
    discipline)."""
    if a.shape != b.shape:
        raise ValueError("length mismatch")
    if a.size == 0:
        return float("inf")
    d = a.astype(np.int64) - b.astype(np.int64)
    sq = int((d * d).sum())
    if sq == 0:
        return float("inf")
    mse = sq / a.size
    return float(10.0 * np.log10(32768.0 * 32768.0 / mse))
