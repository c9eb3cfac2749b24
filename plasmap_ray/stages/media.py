"""Multimodal payload stages: image transform/feature-extract (real),
audio/video decode (stubbed codecs, real Ray plumbing).

Driver guidance: treat image/audio/video as opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample
run as actor-pool ``map_batches`` stages.  The image path is fully real
(our codecs).  Audio/video codec libraries are not installable in this
sandbox, so their *decode* is a clearly-marked stub — deterministic
fake samples behind the same batch/actor/schema plumbing — and the
surrounding engine mechanics (schemas, batching, actor signature,
output layout) are real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codecs


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure NumPy index math)."""
    h, w = pixels.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[yi][:, xi]


class ImageFeatures:
    """Actor-pool stage: decode -> resize -> visual features per image.

    Features: mean/std per RGB channel, luminance, edge energy
    (gradient magnitude mean) and the recomputed phash — the typical
    filter/quality columns of an image training-data pipeline.
    """

    def __init__(self, thumb: int = 16):
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        mean_rgb = np.zeros((n, 3))
        std_rgb = np.zeros((n, 3))
        luminance = np.zeros(n)
        edge_energy = np.zeros(n)
        phash = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                thumb = resize_nearest(px, self.thumb, self.thumb).astype(np.float64)
                mean_rgb[i] = thumb.mean(axis=(0, 1))
                std_rgb[i] = thumb.std(axis=(0, 1))
                gray = thumb.mean(axis=2)
                luminance[i] = gray.mean()
                gy, gx = np.gradient(gray)
                edge_energy[i] = float(np.hypot(gx, gy).mean())
                phash[i] = codecs.phash64(px)
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        out = batch.drop_columns(["bytes"])
        out = out.append_column("ok", pa.array(ok))
        out = out.append_column("mean_r", pa.array(np.round(mean_rgb[:, 0], 4)))
        out = out.append_column("mean_g", pa.array(np.round(mean_rgb[:, 1], 4)))
        out = out.append_column("mean_b", pa.array(np.round(mean_rgb[:, 2], 4)))
        out = out.append_column("luminance", pa.array(np.round(luminance, 4)))
        out = out.append_column("edge_energy", pa.array(np.round(edge_energy, 4)))
        return out.append_column("phash_recomputed", pa.array(phash))


AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("fmt", pa.string()),
    ]
)


def decode_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL audio decode: RIFF/WAV PCM16 mono via the stdlib ``wave``
    module -> (sample_rate, int16 samples).  No external codec needed —
    WAV is a plain container; compressed formats (mp3/ogg/flac) would
    need ffmpeg/soundfile and raise in :class:`AudioFeatures`."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise ValueError("only PCM16 mono WAV supported")
        sr = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    return sr, np.frombuffer(raw, dtype="<i2")


class AudioFeatures:
    """Actor-pool stage for audio payloads.

    ``fmt='wav-pcm16'`` decodes FOR REAL (stdlib RIFF/WAV parser, pure
    numpy afterwards) and extracts rms / zero-crossing rate / duration /
    spectral centroid.  ``fmt='fake-pcm'`` keeps the deterministic
    synthetic path (seeded sine with a crc32-of-payload phase) used by
    the plumbing tests.  Compressed codecs (mp3/ogg/flac) are NOT
    available in this container and raise ``NotImplementedError``
    naming the missing decoder.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        n = batch.num_rows
        rms = np.zeros(n)
        zcr = np.zeros(n)
        dur = np.zeros(n)
        cent = np.zeros(n)
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        sr_col = batch["sample_rate"].to_numpy()
        ns = batch["n_samples"].to_numpy()
        for i in range(n):
            if fmts[i] == "wav-pcm16":
                sr, s16 = decode_wav_pcm16(payloads[i])
                samples = s16.astype(np.float64) / 32768.0
            elif fmts[i] == "fake-pcm":
                sr = max(int(sr_col[i]), 1)
                phase = (zlib.crc32(payloads[i]) % 628) / 100.0  # deterministic across processes
                t = np.arange(int(ns[i])) / sr
                samples = np.sin(2 * np.pi * 440.0 * t + phase)
            else:
                raise NotImplementedError(
                    f"audio codec {fmts[i]!r} not available in this environment; "
                    "install a decoder (ffmpeg/soundfile) and register it here "
                    "(real: 'wav-pcm16'; synthetic: 'fake-pcm')"
                )
            rms[i] = float(np.sqrt(np.mean(samples**2)))
            zcr[i] = float(np.mean(np.abs(np.diff(np.sign(samples)))) / 2.0)
            dur[i] = samples.size / sr
            spec = np.abs(np.fft.rfft(samples))
            tot = spec.sum()
            if tot > 0:
                freqs = np.fft.rfftfreq(samples.size, d=1.0 / sr)
                cent[i] = float((freqs * spec).sum() / tot)
        out = batch.drop_columns(["bytes"])
        out = out.append_column("rms", pa.array(np.round(rms, 6)))
        out = out.append_column("zero_crossing_rate", pa.array(np.round(zcr, 6)))
        out = out.append_column("duration_s", pa.array(np.round(dur, 6)))
        return out.append_column("spectral_centroid_hz", pa.array(np.round(cent, 4)))


# Back-compat alias: the round-1 stub name (fake-pcm path unchanged;
# wav-pcm16 is now a real decode)
AudioDecodeStub = AudioFeatures


VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("n_frames", pa.int32()),
        ("fmt", pa.string()),
    ]
)


class VideoFrameSampleStub:
    """Actor-pool stage for video payloads — STUB CODEC.

    ``fmt='fake-raw'`` treats the payload as n_frames stacked raw RGB
    frames and samples every ``stride``-th frame (real frame-sampling
    output layout: one row per sampled frame).  Other fmts raise
    ``NotImplementedError`` (no video codecs in this container).
    """

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[str] = []
        frame_idx: list[int] = []
        frames: list[bytes] = []
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            if fmt != "fake-raw":
                raise NotImplementedError(
                    f"video codec {fmt!r} not available in this environment (stub: 'fake-raw')"
                )
            w = batch["w"][i].as_py()
            h = batch["h"][i].as_py()
            nf = batch["n_frames"][i].as_py()
            payload = batch["bytes"][i].as_py()
            frame_bytes = w * h * 3
            for f in range(0, nf, self.stride):
                ids.append(batch["media_id"][i].as_py())
                frame_idx.append(f)
                frames.append(payload[f * frame_bytes : (f + 1) * frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.string()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


class BlurSharpness:
    """Actor-pool stage: per-image INTEGER sharpness signals — the
    blur/quality gate of an image training pipeline (Laplacian-variance
    blur detection, Pech-Pacheco et al. 2000), kept all-integer so the
    engine and the golden recompute agree bit-for-bit on any worker.

    Per image, over the interior of the int64 gray field
    g = r + g + b (no /3 — scaling cancels in a threshold gate):
    - ``lap_sq_sum``  = Σ L², L = 4·c − up − down − left − right
    - ``grad_abs_sum``= Σ |g(x+1,y) − g(x−1,y)| + |g(x,y+1) − g(x,y−1)|
    - ``n_interior``  = (w−2)·(h−2)

    Payload bytes are consumed in-stage (three int64s + metadata leave
    the task, never pixels).  Decode failures flag ``ok=False`` rows
    (M9 quarantine semantics) instead of failing the task.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        lap_sq = np.zeros(n, dtype=np.int64)
        grad_abs = np.zeros(n, dtype=np.int64)
        n_int = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                g = px.astype(np.int64).sum(axis=2)
                c = g[1:-1, 1:-1]
                lap = 4 * c - g[:-2, 1:-1] - g[2:, 1:-1] - g[1:-1, :-2] - g[1:-1, 2:]
                gx = g[1:-1, 2:] - g[1:-1, :-2]
                gy = g[2:, 1:-1] - g[:-2, 1:-1]
                lap_sq[i] = int((lap * lap).sum())
                grad_abs[i] = int((np.abs(gx) + np.abs(gy)).sum())
                n_int[i] = c.shape[0] * c.shape[1]
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        out = batch.drop_columns(["bytes"])
        out = out.append_column("ok", pa.array(ok))
        out = out.append_column("n_interior", pa.array(n_int, type=pa.int64()))
        out = out.append_column("lap_sq_sum", pa.array(lap_sq, type=pa.int64()))
        return out.append_column("grad_abs_sum", pa.array(grad_abs, type=pa.int64()))


class PixelEntropy:
    """Actor-pool stage: per-image Shannon entropy of the pixel-value
    histogram (all channels pooled) — the flat/synthetic-image screen
    of an image corpus audit (near-zero entropy = solid fills / banding,
    near-8-bit-max = noise), complementing BlurSharpness' edge energy.

    Exact-integer discipline: the 256-bin histogram is int64; each
    occupied bin fixes n·ln(n) to int64 ONCE (fp pitch 1e9), so the
    per-image sum is order-free and the final
    H = ln(N) − (Σ n·ln n)/N is one mirrored float expression.

    Payloads are consumed in-stage; 3 int64s + metadata leave the task.
    Decode failures flag ok=False (M9 quarantine semantics).
    """

    FP = 1e9

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        n_samples = np.zeros(n, dtype=np.int64)
        n_distinct = np.zeros(n, dtype=np.int64)
        sum_fp = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                hist = np.bincount(px.ravel(), minlength=256).astype(np.int64)
                nz = hist[hist > 0]
                n_samples[i] = int(hist.sum())
                n_distinct[i] = len(nz)
                sum_fp[i] = int(
                    np.floor(nz * np.log(nz.astype(np.float64)) * self.FP + 0.5).astype(np.int64).sum()
                )
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "n_samples": pa.array(n_samples, type=pa.int64()),
                "n_distinct": pa.array(n_distinct, type=pa.int64()),
                "sum_nlogn_fp": pa.array(sum_fp, type=pa.int64()),
            }
        )


class EdgeDensity:
    """Actor-pool stage: per-image thresholded edge-pixel census — the
    texture/flatness screen of an image corpus audit (a photo has a
    mid-range edge fraction; solid fills ≈ 0; dithered noise ≈ 1),
    complementing BlurSharpness' unthresholded energy sums.

    Per interior pixel of the int64 gray field g = r + g + b, the L1
    gradient m = |g(x+1,y) − g(x−1,y)| + |g(x,y+1) − g(x,y−1)| is an
    exact integer; the stage counts m > T (edge) and m > 4T (strong
    edge).  All-integer -> bit-identical on any worker.

    Payloads are consumed in-stage (three int64s + metadata leave the
    task).  Decode failures flag ok=False (M9 quarantine semantics).
    """

    T = 96  # on the summed-channel field: ≈ 32 gray levels per channel

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        n_int = np.zeros(n, dtype=np.int64)
        n_edge = np.zeros(n, dtype=np.int64)
        n_strong = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                g = px.astype(np.int64).sum(axis=2)
                gx = g[1:-1, 2:] - g[1:-1, :-2]
                gy = g[2:, 1:-1] - g[:-2, 1:-1]
                m = np.abs(gx) + np.abs(gy)
                n_int[i] = m.shape[0] * m.shape[1]
                n_edge[i] = int((m > self.T).sum())
                n_strong[i] = int((m > 4 * self.T).sum())
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "n_interior": pa.array(n_int, type=pa.int64()),
                "n_edge": pa.array(n_edge, type=pa.int64()),
                "n_strong": pa.array(n_strong, type=pa.int64()),
            }
        )


class OrientationHistogram:
    """Actor-pool stage: per-image 8-sector gradient-orientation
    census — the HOG building block (Dalal & Triggs 2005) reduced to
    its exact-integer core: central-difference gradients (gx, gy) on
    the summed-channel gray field, binned into octants by SIGN /
    MAGNITUDE comparisons only (no atan2 — libm differs across
    engines by ulps; the comparison rule is bit-exact everywhere,
    same convention as the trajectory heading octants).  Texture
    anisotropy screens: a sinusoid pattern concentrates mass in two
    opposite octants, noise spreads it flat, axis-aligned synthetic
    renders spike octants 0/2/4/6.

    Octant 0 = E..NE counter-clockwise; zero-gradient pixels are
    counted separately as n_flat.  All-integer counts -> worker-
    invariant; the golden oracle recomputes per-pixel with an
    if/elif chain (different algorithm, same integers).

    Payloads consumed in-stage (10 int64s + metadata leave the task).
    Decode failures flag ok=False (M9 quarantine semantics).
    """

    @staticmethod
    def octants(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
        px, py = gx >= 0, gy >= 0
        ax, ay = np.abs(gx), np.abs(gy)
        conds = [
            px & py & (ax >= ay),
            px & py,
            ~px & py & (ay > ax),
            ~px & py,
            ~px & ~py & (ax >= ay),
            ~px & ~py,
            px & ~py & (ay > ax),
        ]
        return np.select(conds, list(range(7)), default=7).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        octs = np.zeros((n, 8), dtype=np.int64)
        n_flat = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                g = px.astype(np.int64).sum(axis=2)
                gx = g[1:-1, 2:] - g[1:-1, :-2]
                gy = g[2:, 1:-1] - g[:-2, 1:-1]
                flat = (gx == 0) & (gy == 0)
                n_flat[i] = int(flat.sum())
                o = self.octants(gx[~flat], gy[~flat])
                octs[i] = np.bincount(o, minlength=8)
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        out = {"image_id": batch["image_id"], "fmt": batch["fmt"], "ok": pa.array(ok)}
        for k in range(8):
            out[f"o{k}"] = pa.array(octs[:, k], type=pa.int64())
        out["n_flat"] = pa.array(n_flat, type=pa.int64())
        return pa.table(out)


class HaarEnergy:
    """Actor-pool stage: per-image 1-level 2-D Haar subband energy —
    the wavelet compaction audit (the JPEG2000 sibling of the dctq
    band profile): over non-overlapping 2×2 blocks (a b / c d) of the
    summed-channel gray field, the unnormalized Haar coefficients

        LL = a+b+c+d   LH = a−b+c−d   HL = a+b−c−d   HH = a−b−c+d

    are exact integers; the stage sums coef² per subband (int64 — the
    worst case 3060²·(wh/4) stays < 2^63 up to ~60-gigapixel images).
    detail share ≈ 0 marks flat fills, ≈ uniform marks dither noise;
    photographs concentrate detail in LH/HL along dominant edges.

    Odd trailing row/col is truncated (blocks = floor(h/2)·floor(w/2),
    mirrored in the golden per-block loop).  Payloads consumed
    in-stage (5 int64s + metadata leave the task).  Decode failures
    flag ok=False (M9 quarantine semantics).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        e = np.zeros((n, 4), dtype=np.int64)  # LL, LH, HL, HH
        n_blocks = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                g = px.astype(np.int64).sum(axis=2)
                hh2, ww2 = (g.shape[0] // 2) * 2, (g.shape[1] // 2) * 2
                a = g[0:hh2:2, 0:ww2:2]
                b = g[0:hh2:2, 1:ww2:2]
                c = g[1:hh2:2, 0:ww2:2]
                d = g[1:hh2:2, 1:ww2:2]
                ll = a + b + c + d
                lh = a - b + c - d
                hl = a + b - c - d
                hhb = a - b - c + d
                e[i] = [int((x * x).sum()) for x in (ll, lh, hl, hhb)]
                n_blocks[i] = a.shape[0] * a.shape[1]
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "n_blocks": pa.array(n_blocks, type=pa.int64()),
                "e_ll": pa.array(e[:, 0], type=pa.int64()),
                "e_lh": pa.array(e[:, 1], type=pa.int64()),
                "e_hl": pa.array(e[:, 2], type=pa.int64()),
                "e_hh": pa.array(e[:, 3], type=pa.int64()),
            }
        )


class DynamicRange:
    """Actor-pool stage: per-image dynamic-range audit over the
    summed-channel gray field (0..765) — exact order statistics via a
    766-bin integer histogram: min, max, and the p05/p95 ranks under
    the quantile_disc convention (k-th smallest, k = max(1,
    ceil(q·n))) — the contrast screen (washed-out scans sit in a
    narrow band; over-processed renders pin both tails) run beside
    the entropy / edge / blur gates.

    All-integer selection -> worker-invariant; the golden oracle
    recomputes with sorted() over the raw pixel list (different
    selection algorithm, same integers).

    Payloads consumed in-stage (6 int64s + metadata leave the task).
    Decode failures flag ok=False (M9 quarantine semantics).
    """

    Q_LO, Q_HI = 0.05, 0.95

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        cols = {k: np.zeros(n, dtype=np.int64) for k in ("g_min", "g_max", "p05", "p95")}
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                g = px.astype(np.int64).sum(axis=2).ravel()
                hist = np.bincount(g, minlength=766)
                cum = np.cumsum(hist)
                npx = len(g)
                k_lo = max(1, -(-npx * 5 // 100))  # ceil(0.05 n)
                k_hi = max(1, -(-npx * 95 // 100))
                cols["g_min"][i] = int(g.min())
                cols["g_max"][i] = int(g.max())
                cols["p05"][i] = int(np.searchsorted(cum, k_lo))
                cols["p95"][i] = int(np.searchsorted(cum, k_hi))
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        out = {"image_id": batch["image_id"], "fmt": batch["fmt"], "ok": pa.array(ok)}
        for k, v in cols.items():
            out[k] = pa.array(v, type=pa.int64())
        return pa.table(out)


class Blockiness:
    """Actor-pool stage: per-image 8×8 blocking-artifact census — the
    prior-compression detector: block-transform codecs (JPEG, this
    repo's dctq) leave step discontinuities exactly at multiple-of-8
    column/row boundaries, so the mean absolute step ACROSS block
    edges exceeds the mean step inside blocks.  Flags already-
    compressed content sneaking into a "lossless" corpus.

    Exact integers: per-image sums of |g(x+1)−g(x)| split into
    boundary columns (x ≡ 7 mod 8) vs interior, and the same for
    rows.  Emits the four (sum, count) pairs; the blockiness ratio
    (boundary mean / interior mean) is ONE mirrored float downstream.

    Payloads consumed in-stage (4 int64s + metadata leave the task).
    Decode failures flag ok=False (M9 quarantine semantics).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        cols = {k: np.zeros(n, dtype=np.int64) for k in ("b_sum", "b_cnt", "i_sum", "i_cnt")}
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                g = px.astype(np.int64).sum(axis=2)
                dx = np.abs(g[:, 1:] - g[:, :-1])  # step x -> x+1
                dy = np.abs(g[1:, :] - g[:-1, :])
                bx = (np.arange(dx.shape[1]) % 8) == 7
                by = (np.arange(dy.shape[0]) % 8) == 7
                cols["b_sum"][i] = int(dx[:, bx].sum()) + int(dy[by, :].sum())
                cols["b_cnt"][i] = dx[:, bx].size + dy[by, :].size
                cols["i_sum"][i] = int(dx[:, ~bx].sum()) + int(dy[~by, :].sum())
                cols["i_cnt"][i] = dx[:, ~bx].size + dy[~by, :].size
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        out = {"image_id": batch["image_id"], "fmt": batch["fmt"], "ok": pa.array(ok)}
        for k, v in cols.items():
            out[k] = pa.array(v, type=pa.int64())
        return pa.table(out)


class AudioSilenceTrim:
    """Actor-pool stage: per-clip silence-trim manifest — the offsets
    an audio training pipeline cuts to before featurizing (leading /
    trailing quiet runs at |s| < QUIET_T) plus the interior quiet
    fraction (a clip that is mostly quiet inside is a broken take,
    not a trim candidate).

    Per clip: trim_start = length of the leading quiet run,
    trim_end = n_samples − trailing quiet run, n_quiet = total quiet
    samples, all int64-exact.  A fully quiet clip trims to the empty
    span (trim_start = n_samples, trim_end = 0).

    Payloads consumed in-stage (4 int64s + metadata leave the task).
    Non-WAV fmts flag ok=False (M9 quarantine semantics).
    """

    QUIET_T = 3000  # |PCM16| below this is "quiet" (~ -21 dBFS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        n_samp = np.zeros(n, dtype=np.int64)
        t_start = np.zeros(n, dtype=np.int64)
        t_end = np.zeros(n, dtype=np.int64)
        n_quiet = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            if fmts[i] != "wav-pcm16":
                continue
            try:
                _, s16 = decode_wav_pcm16(payloads[i])
                loud = np.abs(s16.astype(np.int64)) >= self.QUIET_T
                ns = len(s16)
                n_samp[i] = ns
                n_quiet[i] = ns - int(loud.sum())
                idx = np.flatnonzero(loud)
                if len(idx) == 0:
                    t_start[i], t_end[i] = ns, 0  # fully quiet: empty span
                else:
                    t_start[i] = int(idx[0])
                    t_end[i] = int(idx[-1]) + 1
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "media_id": batch["media_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "n_samples": pa.array(n_samp, type=pa.int64()),
                "trim_start": pa.array(t_start, type=pa.int64()),
                "trim_end": pa.array(t_end, type=pa.int64()),
                "n_quiet": pa.array(n_quiet, type=pa.int64()),
            }
        )


class ChannelMoments:
    """Actor-pool stage: per-image exact integer channel moments — the
    raw material of the channel-correlation grayscale/synthetic screen
    (a grayscale image has r==g==b → all pairwise correlations 1; a
    palette-mapped synthetic render shows near-±1 structure; photos
    sit in between), complementing the entropy and edge screens.

    Per image: n_px and, per channel pair (r,g), (g,b), (r,b), the
    int64 sums Σc, Σc², Σab — all exact (n_px ≤ ~10⁶, c ≤ 255 ⇒
    Σab ≤ 6.6e10, and the n·Σab cross terms the finish step forms
    stay < 2⁶³ for images under ~1.2e8 px, asserted here so the
    engine fails loudly rather than wrapping).

    Payloads consumed in-stage (8 int64s + metadata leave the task).
    Decode failures flag ok=False (M9 quarantine semantics).
    """

    MAX_PX = 100_000_000  # int64-overflow guard for n·Σc² (see docstring)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        cols = {
            k: np.zeros(n, dtype=np.int64)
            for k in ("n_px", "s_r", "s_g", "s_b", "s_rr", "s_gg", "s_bb", "s_rg", "s_gb", "s_rb")
        }
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                npx = px.shape[0] * px.shape[1]
                assert npx <= self.MAX_PX, f"image too large for exact int64 moments: {npx} px"
                c = px.reshape(-1, 3).astype(np.int64)
                gram = c.T @ c  # ONE integer GEMM: all six second moments
                s = c.sum(axis=0)
                cols["n_px"][i] = npx
                cols["s_r"][i], cols["s_g"][i], cols["s_b"][i] = int(s[0]), int(s[1]), int(s[2])
                cols["s_rr"][i] = int(gram[0, 0])
                cols["s_gg"][i] = int(gram[1, 1])
                cols["s_bb"][i] = int(gram[2, 2])
                cols["s_rg"][i] = int(gram[0, 1])
                cols["s_gb"][i] = int(gram[1, 2])
                cols["s_rb"][i] = int(gram[0, 2])
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        out = {"image_id": batch["image_id"], "fmt": batch["fmt"], "ok": pa.array(ok)}
        for k, v in cols.items():
            out[k] = pa.array(v, type=pa.int64())
        return pa.table(out)


class BlobCount:
    """Actor-pool stage: per-image connected-component census of
    BRIGHT pixels (gray = r+g+b > T, 4-connectivity) — the
    object-count / fragmentation screen of an image corpus audit
    (a photo has a handful of coherent bright regions; dithered noise
    fragments into thousands; solid fills give exactly one), the
    morphological sibling of EdgeDensity's gradient census.

    Kernel: two-pass row-scan union-find over the boolean mask
    (path-halving finds, row-major merge order) — all integer, so
    (n_bright, n_blobs, largest_blob) are worker-invariant and the
    golden BFS flood-fill recompute matches exactly.

    Payloads consumed in-stage (3 int64s + metadata leave the task).
    Decode failures flag ok=False (M9 quarantine semantics).
    """

    T = 384  # on the summed-channel field: mean channel > 128

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        n_bright = np.zeros(n, dtype=np.int64)
        n_blobs = np.zeros(n, dtype=np.int64)
        largest = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                mask = px.astype(np.int64).sum(axis=2) > self.T
                n_bright[i] = int(mask.sum())
                if n_bright[i]:
                    n_blobs[i], largest[i] = _blob_census(mask)
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "n_bright": pa.array(n_bright, type=pa.int64()),
                "n_blobs": pa.array(n_blobs, type=pa.int64()),
                "largest_blob": pa.array(largest, type=pa.int64()),
            }
        )


def _blob_census(mask: np.ndarray) -> tuple[int, int]:
    """(n_components, largest_size) of True pixels, 4-connectivity —
    VECTORIZED min-label propagation (each pass takes the elementwise
    min over the 4-neighborhood; fixpoint = connected components keyed
    by their minimum flat index).  No per-pixel Python: every pass is
    whole-array NumPy, iterations bounded by the longest in-component
    path (small for the ≤128-px fixture tiles; a two-pass union-find
    swap-in is the documented fallback for pathological snakes)."""
    hh, ww = mask.shape
    big = np.int64(hh * ww)
    lbl = np.where(mask, np.arange(hh * ww, dtype=np.int64).reshape(hh, ww), big)
    while True:
        nxt = lbl.copy()
        nxt[1:, :] = np.minimum(nxt[1:, :], lbl[:-1, :])
        nxt[:-1, :] = np.minimum(nxt[:-1, :], lbl[1:, :])
        nxt[:, 1:] = np.minimum(nxt[:, 1:], lbl[:, :-1])
        nxt[:, :-1] = np.minimum(nxt[:, :-1], lbl[:, 1:])
        nxt = np.where(mask, nxt, big)
        if np.array_equal(nxt, lbl):
            break
        lbl = nxt
    _, counts = np.unique(lbl[mask], return_counts=True)
    return len(counts), int(counts.max())


class AudioClipping:
    """Actor-pool stage: per-clip clipping census over PCM16 samples —
    the recording-quality screen (clipped / near-clipped audio
    corrupts both training targets and spectral features).  A sample
    counts as hot when |s| ≥ CLIP_T; runs are maximal consecutive hot
    stretches.  The threshold sits just under the synthetic corpus's
    peak band (≈ 0.84 full scale) so the census exercises real run
    structure; on a true recording set it to 32760 (full-scale minus
    8 LSB).  All-integer -> bit-identical on any worker.

    Only 'wav-pcm16' decodes here; other fmts flag ok=False (the
    fake-pcm synthetic path never clips by construction and is
    excluded the same way the codec stubs are).
    """

    CLIP_T = 27500  # near-full-scale threshold (see docstring)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        n_samp = np.zeros(n, dtype=np.int64)
        n_clip = np.zeros(n, dtype=np.int64)
        n_runs = np.zeros(n, dtype=np.int64)
        max_run = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            if fmts[i] != "wav-pcm16":
                continue
            try:
                _, s16 = decode_wav_pcm16(payloads[i])
                flag = np.abs(s16.astype(np.int64)) >= self.CLIP_T
                n_samp[i] = len(s16)
                n_clip[i] = int(flag.sum())
                if flag.any():
                    # run boundaries via transitions
                    d = np.diff(flag.astype(np.int8))
                    starts = int((d == 1).sum()) + int(flag[0])
                    n_runs[i] = starts
                    # longest run via cumulative reset trick
                    idx = np.flatnonzero(~flag)
                    if len(idx) == 0:
                        max_run[i] = len(flag)
                    else:
                        gaps = np.diff(np.concatenate([[-1], idx, [len(flag)]])) - 1
                        max_run[i] = int(gaps.max())
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "media_id": batch["media_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "n_samples": pa.array(n_samp, type=pa.int64()),
                "n_clipped": pa.array(n_clip, type=pa.int64()),
                "n_clip_runs": pa.array(n_runs, type=pa.int64()),
                "max_clip_run": pa.array(max_run, type=pa.int64()),
            }
        )


class VideoTemporalSmoothness:
    """Actor-pool stage: per-clip inter-frame SAD census — the
    frozen/corrupt-clip screen of a video training pipeline (a clip
    whose consecutive frames are identical, or whose SAD spikes, is a
    stuck encoder or a splice; reference analogue: the ST5/M9 media
    gate layer).

    Per clip of n_frames raw RGB frames, over the n_frames-1
    consecutive pairs: SAD(k) = Σ |frame[k+1] − frame[k]| (int64,
    exact).  Emits total/min/max pair SAD and the count of zero-SAD
    (frozen) pairs.  Kernel is a single vectorized |diff| over the
    (n_frames, w·h·3) uint8 view — no per-pixel Python.

    Payloads consumed in-stage; five int64s + metadata leave the task.
    Non-raw fmts / short clips flag ok=False (M9 quarantine semantics).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        nf = batch["n_frames"].to_numpy()
        n_pairs = np.zeros(n, dtype=np.int64)
        total = np.zeros(n, dtype=np.int64)
        mn = np.zeros(n, dtype=np.int64)
        mx = np.zeros(n, dtype=np.int64)
        frozen = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            if fmts[i] != "fake-raw" or int(nf[i]) < 2:
                continue
            fb = int(w[i]) * int(h[i]) * 3
            arr = np.frombuffer(payloads[i], dtype=np.uint8)
            if len(arr) != fb * int(nf[i]):
                continue  # truncated payload → quarantine
            frames = arr.reshape(int(nf[i]), fb).astype(np.int16)
            sads = np.abs(np.diff(frames, axis=0)).sum(axis=1, dtype=np.int64)
            n_pairs[i] = len(sads)
            total[i] = int(sads.sum())
            mn[i] = int(sads.min())
            mx[i] = int(sads.max())
            frozen[i] = int((sads == 0).sum())
            ok[i] = True
        fb_out = (w.astype(np.int64) * h.astype(np.int64) * 3).astype(np.int64)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "frame_bytes": pa.array(fb_out, type=pa.int64()),
                "n_pairs": pa.array(n_pairs, type=pa.int64()),
                "total_sad": pa.array(total, type=pa.int64()),
                "min_pair_sad": pa.array(mn, type=pa.int64()),
                "max_pair_sad": pa.array(mx, type=pa.int64()),
                "n_frozen_pairs": pa.array(frozen, type=pa.int64()),
            }
        )


class OtsuThreshold:
    """Actor-pool stage: per-image Otsu binarization threshold over the
    pooled-gray histogram g = r + g + b (766 bins) — the
    foreground/background separability audit (documents/solid graphics
    split cleanly; natural photos don't), the classic first step of any
    scan/figure-detection pass over an image corpus.

    Exact-integer discipline: the histogram and its cumulative sums
    (W0, S0) are int64; Otsu's between-class variance ratio
    num(t)^2 / den(t) with num = S0·N − W0·S_T (|num| < 2^35 at the
    fixture pixel budget) and den = W0·(N−W0) is argmax'd with exact
    PYTHON-INT cross-multiplication (num² needs ~70 bits — past
    int64), smallest t on ties, so the threshold is bit-stable and the
    golden recompute (different comparison arithmetic: Fractions) must
    agree exactly.

    Payloads are consumed in-stage; 3 int64s + metadata leave the task.
    Decode failures flag ok=False (M9 quarantine semantics).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        thresh = np.zeros(n, dtype=np.int64)
        n_px = np.zeros(n, dtype=np.int64)
        n_fg = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                gray = px.astype(np.int64).sum(axis=2).ravel()
                hist = np.bincount(gray, minlength=766).astype(np.int64)
                npx = int(hist.sum())
                w0 = np.cumsum(hist)  # pixels <= t
                s0 = np.cumsum(hist * np.arange(766, dtype=np.int64))
                st = int(s0[-1])
                num = s0 * npx - w0 * st
                den = w0 * (npx - w0)
                best_t, best_num, best_den = -1, 0, 1
                for t in range(765):  # t = 765 leaves no foreground
                    d = int(den[t])
                    if d == 0:
                        continue
                    nu = int(num[t])
                    # exact fraction compare: nu^2/d > best_num^2/best_den
                    if nu * nu * best_den > best_num * best_num * d:
                        best_t, best_num, best_den = t, nu, d
                thresh[i] = best_t
                n_px[i] = npx
                n_fg[i] = int(hist[best_t + 1 :].sum()) if best_t >= 0 else 0
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "threshold": pa.array(thresh, type=pa.int64()),
                "n_px": pa.array(n_px, type=pa.int64()),
                "n_fg": pa.array(n_fg, type=pa.int64()),
            }
        )


class QuadtreeCensus:
    """Actor-pool stage: per-image adaptive quadtree decomposition over
    the pooled-gray field (g = r + g + b) — split a block while its
    EXACT integer variance test  n·Σg² − (Σg)² > THR·n²  holds and
    both sides are >= 2 px.  Leaf count / depth measure local detail
    the way a compression codec does (flat posters collapse to a few
    leaves, busy photos explode) — the structural complement of
    entropy (global histogram) and blur (global energy).

    Block sums are O(1) via per-image summed-area tables (int64; the
    4096-px fixture budget keeps n·Σg² < 2^44).  The recursion is a
    Python stack over at most n_px/4 blocks — ALU-bound, inside the
    batch fn (the tokenizer-loop discipline).  Payloads consumed
    in-stage; three int64s + metadata leave per image.
    """

    THR = 1000  # variance threshold in (gray-sum)^2 units

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        n_leaves = np.zeros(n, dtype=np.int64)
        max_depth = np.zeros(n, dtype=np.int64)
        n_split = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        thr = int(self.THR)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                g = px.astype(np.int64).sum(axis=2)
                ii = np.zeros((g.shape[0] + 1, g.shape[1] + 1), dtype=np.int64)
                ii[1:, 1:] = g.cumsum(axis=0).cumsum(axis=1)
                ii2 = np.zeros_like(ii)
                ii2[1:, 1:] = (g * g).cumsum(axis=0).cumsum(axis=1)

                def bsum(tab, y0, x0, y1, x1):  # half-open
                    return int(tab[y1, x1] - tab[y0, x1] - tab[y1, x0] + tab[y0, x0])

                leaves = splits = 0
                deepest = 0
                stack = [(0, 0, g.shape[0], g.shape[1], 0)]
                while stack:
                    y0, x0, y1, x1, d = stack.pop()
                    bh, bw = y1 - y0, x1 - x0
                    npx = bh * bw
                    s1 = bsum(ii, y0, x0, y1, x1)
                    s2 = bsum(ii2, y0, x0, y1, x1)
                    if bh >= 2 and bw >= 2 and npx * s2 - s1 * s1 > thr * npx * npx:
                        splits += 1
                        my, mx = y0 + bh // 2, x0 + bw // 2
                        stack.extend(
                            [
                                (y0, x0, my, mx, d + 1),
                                (y0, mx, my, x1, d + 1),
                                (my, x0, y1, mx, d + 1),
                                (my, mx, y1, x1, d + 1),
                            ]
                        )
                    else:
                        leaves += 1
                        deepest = max(deepest, d)
                n_leaves[i] = leaves
                max_depth[i] = deepest
                n_split[i] = splits
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "n_leaves": pa.array(n_leaves, type=pa.int64()),
                "max_depth": pa.array(max_depth, type=pa.int64()),
                "n_split": pa.array(n_split, type=pa.int64()),
            }
        )


class MotionVectors:
    """Actor-pool stage: per-clip block-matching motion estimation —
    the MPEG-style motion-search kernel run as a corpus audit: for
    every consecutive frame pair, each 4x4 gray block searches a +-2 px
    window in the PREVIOUS frame for its minimum-SAD displacement
    (ties -> lexicographically smallest (sad, dy, dx), so the vector
    field is bit-stable).  Static clips report all-zero vectors; cuts
    and high motion push total displacement and residual SAD up — the
    "how compressible is this video, really" number beside the plain
    frame-difference census (VideoTemporalSmoothness).

    Exact integers throughout (gray = r+g+b, SAD of int64).  Payloads
    consumed in-stage; five int64s + metadata leave per clip.
    """

    BLOCK = 4
    SEARCH = 2

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        nf = batch["n_frames"].to_numpy()
        payloads = batch["bytes"].to_pylist()
        n_pairs = np.zeros(n, dtype=np.int64)
        n_blocks = np.zeros(n, dtype=np.int64)
        total_disp = np.zeros(n, dtype=np.int64)
        n_static = np.zeros(n, dtype=np.int64)
        total_sad = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        B, S = self.BLOCK, self.SEARCH
        for i in range(n):
            try:
                ww, hh, k = int(w[i]), int(h[i]), int(nf[i])
                raw = np.frombuffer(payloads[i], dtype=np.uint8)
                frames = raw.reshape(k, hh, ww, 3).astype(np.int64).sum(axis=3)
                pairs = blocks = disp = static = sad_acc = 0
                for f in range(1, k):
                    cur, prev = frames[f], frames[f - 1]
                    pairs += 1
                    for by in range(0, hh - B + 1, B):
                        for bx in range(0, ww - B + 1, B):
                            blk = cur[by : by + B, bx : bx + B]
                            best = None
                            for dy in range(-S, S + 1):
                                for dx in range(-S, S + 1):
                                    y0, x0 = by + dy, bx + dx
                                    if y0 < 0 or x0 < 0 or y0 + B > hh or x0 + B > ww:
                                        continue
                                    sad = int(np.abs(blk - prev[y0 : y0 + B, x0 : x0 + B]).sum())
                                    cand = (sad, dy, dx)
                                    if best is None or cand < best:
                                        best = cand
                            sad, dy, dx = best
                            blocks += 1
                            disp += abs(dy) + abs(dx)
                            static += int(dy == 0 and dx == 0)
                            sad_acc += sad
                n_pairs[i] = pairs
                n_blocks[i] = blocks
                total_disp[i] = disp
                n_static[i] = static
                total_sad[i] = sad_acc
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "media_id": batch["media_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "n_pairs": pa.array(n_pairs, type=pa.int64()),
                "n_blocks": pa.array(n_blocks, type=pa.int64()),
                "total_disp": pa.array(total_disp, type=pa.int64()),
                "n_static": pa.array(n_static, type=pa.int64()),
                "total_best_sad": pa.array(total_sad, type=pa.int64()),
            }
        )


class HarrisCorners:
    """Actor-pool stage: per-image Harris corner census in EXACT
    integer arithmetic — the interest-point density that separates
    textured/structured photos (many stable corners) from flat fills
    and pure gradients (none), the classical front end of every
    feature-matching pipeline.

    Sobel gradients gx, gy on the pooled-gray field are integers; the
    structure tensor over a 3x3 window (Sxx, Syy, Sxy — summed-area
    tables) is integer; the Harris response with k = 1/20 scales to
        R20 = 20·(Sxx·Syy − Sxy²) − (Sxx + Syy)²
    an exact int (Python bigint accumulate — Sxx ~ 2^23 keeps R20
    within int64 at the fixture sizes; the engine still promotes via
    object dtype only where needed).  A pixel is a corner when
    R20 > THR·400 (mirroring R > THR/20 at scale 20·400... the
    threshold is applied to R20 directly) and R20 is the strict 3x3
    neighborhood maximum (non-max suppression, ties keep none —
    bit-stable).

    Output: (image_id, fmt, ok, n_corners, max_r20, sum_gx2).
    """

    THR = 10**10  # R20 threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        n_corners = np.zeros(n, dtype=np.int64)
        max_r = np.zeros(n, dtype=np.int64)
        sgx2 = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                g = px.astype(np.int64).sum(axis=2)
                gx = np.zeros_like(g)
                gy = np.zeros_like(g)
                gx[1:-1, 1:-1] = (
                    (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
                    - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
                )
                gy[1:-1, 1:-1] = (
                    (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
                    - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
                )
                xx, yy, xy = gx * gx, gy * gy, gx * gy

                def box3(a: np.ndarray) -> np.ndarray:
                    s = np.zeros((a.shape[0] + 1, a.shape[1] + 1), dtype=np.int64)
                    s[1:, 1:] = a.cumsum(axis=0).cumsum(axis=1)
                    return (
                        s[3:, 3:] - s[:-3, 3:] - s[3:, :-3] + s[:-3, :-3]
                    )  # 3x3 sums, valid region

                sxx, syy, sxy = box3(xx), box3(yy), box3(xy)
                # object dtype: R20 can exceed int64 at large gradients
                sxxo = sxx.astype(object)
                syyo = syy.astype(object)
                sxyo = sxy.astype(object)
                r20 = 20 * (sxxo * syyo - sxyo * sxyo) - (sxxo + syyo) ** 2
                thr = int(self.THR)
                strong = np.frompyfunc(lambda v: v > thr, 1, 1)(r20).astype(bool)
                corners = 0
                best = 0
                hh_, ww_ = r20.shape
                for y, x in np.argwhere(strong):  # sparse: only candidates pay the NMS loop
                    y, x = int(y), int(x)
                    v = r20[y, x]
                    if v > best:
                        best = int(min(v, (1 << 62)))
                    is_max = True
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            if dy == 0 and dx == 0:
                                continue
                            yy2, xx2 = y + dy, x + dx
                            if 0 <= yy2 < hh_ and 0 <= xx2 < ww_ and r20[yy2, xx2] >= v:
                                is_max = False
                                break
                        if not is_max:
                            break
                    corners += int(is_max)
                n_corners[i] = corners
                max_r[i] = best
                sgx2[i] = int(xx.sum())
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "n_corners": pa.array(n_corners, type=pa.int64()),
                "max_r20": pa.array(max_r, type=pa.int64()),
                "sum_gx2": pa.array(sgx2, type=pa.int64()),
            }
        )


class BorderDetect:
    """Actor-pool stage: per-image uniform-border (letterbox/pillarbox)
    detection — scan inward from each edge while the full row/column
    stays within +-TOL of the EDGE-CORNER color (exact integer gray
    comparison), the crop-suggestion pass a thumbnail/scan corpus runs
    before training (borders are free pixels that dilute every crop).

    Output per image: border widths (top, bottom, left, right) and
    the border area fraction, all exact integers except the mirrored
    rounded fraction.
    """

    TOL = 8 * 3  # max |gray - corner_gray| for a border row/col (gray = r+g+b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        tb = np.zeros((n, 4), dtype=np.int64)  # top, bottom, left, right
        n_px = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        tol = int(self.TOL)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                g = px.astype(np.int64).sum(axis=2)
                hh, ww = g.shape

                def uniform(vec: np.ndarray, ref: int) -> bool:
                    return bool(np.abs(vec - ref).max(initial=0) <= tol)

                top = 0
                while top < hh and uniform(g[top], int(g[0, 0])):
                    top += 1
                bottom = 0
                while bottom < hh - top and uniform(g[hh - 1 - bottom], int(g[hh - 1, 0])):
                    bottom += 1
                # left/right scan ONLY the rows inside the detected
                # letterbox band and reference a corner pixel inside
                # that band — a pillarbox of a different color under a
                # letterbox is invisible to a full-column scan anchored
                # at g[0,0] (the letterbox rows fail the tolerance)
                r0, r1 = top, hh - bottom
                rows = slice(r0, r1) if r0 < r1 else slice(0, hh)
                ref_row = r0 if r0 < r1 else 0
                left = 0
                while left < ww and uniform(g[rows, left], int(g[ref_row, 0])):
                    left += 1
                right = 0
                while right < ww - left and uniform(g[rows, ww - 1 - right], int(g[ref_row, ww - 1])):
                    right += 1
                tb[i] = (top, bottom, left, right)
                n_px[i] = hh * ww
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "top": pa.array(tb[:, 0], type=pa.int64()),
                "bottom": pa.array(tb[:, 1], type=pa.int64()),
                "left": pa.array(tb[:, 2], type=pa.int64()),
                "right": pa.array(tb[:, 3], type=pa.int64()),
                "n_px": pa.array(n_px, type=pa.int64()),
            }
        )


class HoughLines:
    """Actor-pool stage: per-image Hough line census — vote strong
    edge pixels into a quantized (theta, rho) accumulator (THETAS
    fixed angles; rho = floor(x·cosθ + y·sinθ + 0.5), identical float
    expression on both sides) and count cells above VOTE_THR plus the
    winning line — the document/architecture screen (scans, buildings
    and rendered figures are line-dominated; natural textures are
    not), completing the geometry shelf beside Harris (points) and
    the orientation histogram (gradient directions).

    Edge pixels: L1 gradient of pooled gray > EDGE_THR (the
    EdgeDensity convention).  All votes are integer; ties in the
    argmax break on (votes desc, theta idx asc, rho asc).

    Output: (image_id, fmt, ok, n_edge_px, n_lines, best_votes).
    """

    N_THETA = 16
    EDGE_THR = 120
    VOTE_THR_FRAC = 0.25  # a line needs >= 25% of the max dimension in votes

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        thetas = np.arange(self.N_THETA) * (np.pi / self.N_THETA)
        cos_t, sin_t = np.cos(thetas), np.sin(thetas)
        n_edge = np.zeros(n, dtype=np.int64)
        n_lines = np.zeros(n, dtype=np.int64)
        best_v = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                g = px.astype(np.int64).sum(axis=2)
                m = np.zeros_like(g)
                m[1:-1, 1:-1] = np.abs(g[1:-1, 2:] - g[1:-1, :-2]) + np.abs(
                    g[2:, 1:-1] - g[:-2, 1:-1]
                )
                ey, ex = np.nonzero(m > self.EDGE_THR)
                n_edge[i] = len(ex)
                hh, ww = g.shape
                diag = int(np.ceil(np.hypot(hh, ww)))
                vote_thr = max(3, int(max(hh, ww) * self.VOTE_THR_FRAC))
                lines = 0
                best = (0, -1, 0)  # (votes, -theta_idx, -rho) compare
                bv = 0
                for ti in range(self.N_THETA):
                    rho = np.floor(ex * cos_t[ti] + ey * sin_t[ti] + 0.5).astype(np.int64) + diag
                    counts = np.bincount(rho, minlength=2 * diag + 1)
                    over = counts >= vote_thr
                    lines += int(over.sum())
                    if over.any():
                        mx = int(counts.max())
                        if mx > bv:
                            bv = mx
                n_lines[i] = lines
                best_v[i] = bv
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "n_edge_px": pa.array(n_edge, type=pa.int64()),
                "n_lines": pa.array(n_lines, type=pa.int64()),
                "best_votes": pa.array(best_v, type=pa.int64()),
            }
        )


class GLCMTexture:
    """Actor-pool stage: per-image gray-level co-occurrence (GLCM)
    texture features — the Haralick census run exactly: quantize gray
    to 16 levels, count horizontal neighbor pairs (offset (0,1)),
    and report contrast Σ n_ij (i−j)², homogeneity-numerator and
    energy Σ n_ij² as EXACT integers (the usual normalized float
    features are these divided by the pair count — one rounded
    division downstream keeps everything else integral).

    Texture is the between-pixels structure that the histogram
    (entropy), gradient (blur/edges) and frequency (DCT) views all
    miss: a checkerboard and a smooth ramp can share all three yet
    differ maximally here.
    """

    LEVELS = 16

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        lv = int(self.LEVELS)
        contrast = np.zeros(n, dtype=np.int64)
        energy = np.zeros(n, dtype=np.int64)
        n_pairs = np.zeros(n, dtype=np.int64)
        diag = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                g = px.astype(np.int64).sum(axis=2)  # 0..765
                q = g * lv // 766  # exact integer quantization to 0..15
                a = q[:, :-1].ravel()
                b = q[:, 1:].ravel()
                glcm = np.zeros((lv, lv), dtype=np.int64)
                np.add.at(glcm, (a, b), 1)
                ii, jj = np.mgrid[0:lv, 0:lv]
                contrast[i] = int((glcm * (ii - jj) ** 2).sum())
                energy[i] = int((glcm * glcm).sum())
                n_pairs[i] = int(glcm.sum())
                diag[i] = int(np.trace(glcm))
                ok[i] = True
            except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                pass
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "ok": pa.array(ok),
                "n_pairs": pa.array(n_pairs, type=pa.int64()),
                "contrast": pa.array(contrast, type=pa.int64()),
                "energy": pa.array(energy, type=pa.int64()),
                "n_diag": pa.array(diag, type=pa.int64()),
            }
        )
