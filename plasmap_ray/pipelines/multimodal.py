"""Audio / video payload pipelines (ST5 multimodal surface).

Audio: REAL RIFF/WAV PCM16 decode (stdlib container parser, numpy DSP)
in an actor pool — rms / zero-crossing rate / duration / spectral
centroid per clip.  Video: raw frame-packed RGB payloads frame-sampled
(one row per sampled frame) then reduced to per-clip pixel statistics.
Compressed codecs (mp3/h264/...) are not installable in this container
and raise NotImplementedError inside the kernels (stages/media.py); the
REAL lossy-audio transform path is ``mdctq`` (codecs.py — pure-NumPy
MDCT + quantization + zlib with a worst-case PSNR >= 48 dB proof),
exercised end-to-end by ``audio_lossy_migration``.

Aggregation discipline: the per-clip video reduction sums INTEGER pixel
values (order-free, exact) and derives the mean in the final projection
— a float Mean aggregate would accumulate in nondeterministic block
order and drift ulps vs the oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .. import fixtures
from ..stages import media
from ..stages.common import duckdb_round

AUDIO_PER_SF = {"sf0.001": 200, "sf0.01": 2000, "sf0.1": 8000}
VIDEO_PER_SF = {"sf0.001": 100, "sf0.01": 1000, "sf0.1": 4000}


def _n_for(sf_dir: str, table: dict[str, int]) -> int:
    return table.get(os.path.basename(os.path.normpath(sf_dir)), min(table.values()))


def audio_path_for(sf_dir: str) -> str:
    return fixtures.media_parquet_path("audio", _n_for(sf_dir, AUDIO_PER_SF))


def video_path_for(sf_dir: str) -> str:
    return fixtures.media_parquet_path("video", _n_for(sf_dir, VIDEO_PER_SF))


def audio_features(sf_dir: str) -> rd.Dataset:
    """Per-clip audio features via real WAV decode in an actor pool."""
    ds = rd.read_parquet(audio_path_for(sf_dir))
    return ds.map_batches(media.AudioFeatures, batch_format="pyarrow", batch_size=256, concurrency=(1, 4))


def frame_pixel_stats(batch: pa.Table) -> pa.Table:
    """(media_id, frame) -> per-frame integer pixel sum + byte count."""
    ids = batch["media_id"]
    frames = batch["frame"].to_pylist()
    sums = np.array([int(np.frombuffer(f, dtype=np.uint8).sum(dtype=np.int64)) for f in frames], dtype=np.int64)
    nbytes = np.array([len(f) for f in frames], dtype=np.int64)
    return pa.table(
        {
            "media_id": ids,
            "frame_idx": batch["frame_idx"],
            "pixel_sum": pa.array(sums),
            "n_bytes": pa.array(nbytes),
        }
    )


def video_frame_stats(sf_dir: str, stride: int = 2) -> rd.Dataset:
    """Frame-sample each clip, reduce to per-clip stats:
    (media_id, n_frames_sampled, mean_pixel_value)."""
    ds = rd.read_parquet(video_path_for(sf_dir))
    frames = ds.map_batches(
        media.VideoFrameSampleStub,
        fn_constructor_kwargs=dict(stride=stride),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )
    stats = frames.map_batches(frame_pixel_stats, batch_format="pyarrow")
    agg = stats.groupby("media_id").aggregate(
        Count(alias_name="n_frames_sampled"),
        Sum("pixel_sum", alias_name="pixel_sum"),
        Sum("n_bytes", alias_name="n_bytes"),
    )

    def finish(t: pa.Table) -> pa.Table:
        mean = t["pixel_sum"].to_numpy().astype(np.float64) / t["n_bytes"].to_numpy()
        return pa.table(
            {
                "media_id": t["media_id"],
                "n_frames_sampled": t["n_frames_sampled"].cast(pa.int64()),
                "mean_pixel_value": pa.array(duckdb_round(mean, 4), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def cell_modality_mix(sf_dir: str) -> "rd.Dataset":
    """Cross-modal spatial join: documents AND images bucketed by the
    shared Morton cell (PRECISION_LOW, the engine-wide partition key),
    counted per modality — the corpus-balance view a multimodal
    training pipeline uses to spot modality-sparse regions.

    Shuffle shape: both sources map to (cell, indicator) rows, ONE
    union + ONE groupby sum; neither payload column is read (ids only).
    Output: (cell_low, n_docs, n_images).  Cell derivation goes through
    the shared ``cells.encode`` kernel at the engine-wide partition
    precision (the same convention stages/geo.cell_index applies).
    """
    import pyarrow.compute as pc

    from .. import cells, fixtures
    from .images import images_path_for

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        cell = cells.encode(fixtures.derive_lon(ids), fixtures.derive_lat(ids), cells.PRECISION_LOW)
        return pa.table(
            {
                "cell_low": pa.array(cell, type=pa.int64()),
                "n_docs": pa.array(np.ones(len(ids), dtype=np.int64)),
                "n_images": pa.array(np.zeros(len(ids), dtype=np.int64)),
            }
        )

    def img_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4, 16), pa.int64()).to_numpy()
        cell = cells.encode(fixtures.derive_lon(ids), fixtures.derive_lat(ids), cells.PRECISION_LOW)
        return pa.table(
            {
                "cell_low": pa.array(cell, type=pa.int64()),
                "n_docs": pa.array(np.zeros(len(ids), dtype=np.int64)),
                "n_images": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]).map_batches(
        doc_rows, batch_format="pyarrow"
    )
    imgs = rd.read_parquet(images_path_for(sf_dir), columns=["image_id"]).map_batches(
        img_rows, batch_format="pyarrow"
    )
    return docs.union(imgs).groupby("cell_low").aggregate(
        Sum("n_docs", alias_name="n_docs"), Sum("n_images", alias_name="n_images")
    )


def video_keyframes(sf_dir: str) -> rd.Dataset:
    """Per-clip keyframe selection: the frame whose SAD to its
    predecessor is LARGEST (the cut/scene-change candidate a video
    sampling pipeline keeps when it can afford one frame per clip,
    beyond frame 0) — built on the same raw-frame SAD kernel as
    video_temporal_smoothness but emitting the argmax instead of the
    census.  Ties break on the SMALLEST frame index (first cut wins),
    mirrored in the golden oracle.

    Scale shape: map-ONLY — decode + SAD + argmax fused in the actor
    pool, payloads consumed in-stage, three int64s + metadata per clip
    leave the task.  Output: (media_id, fmt, ok, n_frames,
    keyframe_idx, keyframe_sad).
    """

    class KeyFrame:
        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            fmts = batch["fmt"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            w = batch["w"].to_numpy()
            h = batch["h"].to_numpy()
            nf = batch["n_frames"].to_numpy()
            kf = np.zeros(n, dtype=np.int64)
            sad = np.zeros(n, dtype=np.int64)
            ok = np.zeros(n, dtype=bool)
            for i in range(n):
                if fmts[i] != "fake-raw" or int(nf[i]) < 2:
                    continue
                fb = int(w[i]) * int(h[i]) * 3
                arr = np.frombuffer(payloads[i], dtype=np.uint8)
                if len(arr) != fb * int(nf[i]):
                    continue
                frames = arr.reshape(int(nf[i]), fb).astype(np.int16)
                sads = np.abs(np.diff(frames, axis=0)).sum(axis=1, dtype=np.int64)
                j = int(np.argmax(sads))  # first max wins (np.argmax contract)
                kf[i] = j + 1  # sads[j] is the jump INTO frame j+1
                sad[i] = int(sads[j])
                ok[i] = True
            return pa.table(
                {
                    "media_id": batch["media_id"],
                    "fmt": batch["fmt"],
                    "ok": pa.array(ok),
                    "n_frames": pa.array(nf.astype(np.int64), type=pa.int64()),
                    "keyframe_idx": pa.array(kf, type=pa.int64()),
                    "keyframe_sad": pa.array(sad, type=pa.int64()),
                }
            )

    ds = rd.read_parquet(video_path_for(sf_dir))
    return ds.map_batches(KeyFrame, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))


PITCH_BAND_HZ = 200  # dominant-frequency bucket width


def audio_pitch_histogram(sf_dir: str, band_hz: int = PITCH_BAND_HZ) -> rd.Dataset:
    """Corpus composition by dominant pitch: decode every clip (real
    WAV PCM16 parse), estimate its dominant frequency via rfft argmax,
    and histogram (pitch_band, sample_rate) — the stratification pass
    an audio training pipeline runs to balance pitch/tempo coverage
    (the audio analogue of aspect_buckets).

    Determinism: each clip is a strong synthetic sinusoid, so the
    magnitude argmax is stable to FFT rounding; the band edge uses
    integer floor division of the rounded peak frequency.

    Scale shape: decode + FFT fused in one actor-pool pass (payload
    consumed in-stage, 3 scalars leave per clip); one band-bounded
    count groupby.  Output: (pitch_band_hz, sample_rate, n_clips).
    """
    ds = rd.read_parquet(audio_path_for(sf_dir))

    class PitchBand:
        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            band = np.zeros(n, dtype=np.int64)
            srs = np.zeros(n, dtype=np.int64)
            payloads = batch["bytes"].to_pylist()
            for i in range(n):
                sr, samples = media.decode_wav_pcm16(payloads[i])
                mag = np.abs(np.fft.rfft(samples.astype(np.float64)))
                mag[0] = 0.0  # ignore DC
                peak_hz = int(round(float(np.argmax(mag)) * sr / len(samples)))
                band[i] = (peak_hz // band_hz) * band_hz
                srs[i] = sr
            return pa.table(
                {
                    "pitch_band_hz": pa.array(band, type=pa.int64()),
                    "sample_rate": pa.array(srs, type=pa.int64()),
                }
            )

    return (
        ds.map_batches(PitchBand, batch_format="pyarrow", batch_size=256, concurrency=(1, 4))
        .groupby(["pitch_band_hz", "sample_rate"])
        .aggregate(Count(alias_name="n_clips"))
        .sort(["pitch_band_hz", "sample_rate"])
    )


def audio_clipping(sf_dir: str) -> rd.Dataset:
    """Per-clip clipping audit (stages.media.AudioClipping): count of
    full-scale samples, clipped-run census and the longest run — run
    beside audio_features' rms/zcr screen before an audio corpus
    trains anything (reference analogue: the ST5/M9 media gate layer).

    Scale shape: map-ONLY — decode fused with the census in the actor
    pool, payloads consumed in-stage, four int64s + metadata per clip
    leave the task.  Oracle: golden driver recompute with independent
    run-finding (transition scan there vs gap-diff here).

    Output: (media_id, fmt, ok, n_samples, n_clipped, n_clip_runs,
    max_clip_run, clip_frac).
    """
    ds = rd.read_parquet(audio_path_for(sf_dir))
    scored = ds.map_batches(media.AudioClipping, batch_format="pyarrow", batch_size=256, concurrency=(1, 4))

    def finish(t: pa.Table) -> pa.Table:
        n = np.maximum(t["n_samples"].to_numpy().astype(np.float64), 1.0)
        frac = duckdb_round(t["n_clipped"].to_numpy().astype(np.float64) / n, 6)
        return t.append_column("clip_frac", pa.array(frac, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


def audio_silence_trim(sf_dir: str) -> rd.Dataset:
    """Per-clip silence-trim manifest (stages.media.AudioSilenceTrim):
    the (trim_start, trim_end) span an audio pipeline cuts to before
    featurizing, plus the interior quiet fraction — run beside the
    clipping census in the media gate layer (reference analogue:
    ST5/M9).  quiet_frac near 1 marks broken takes, not trim input.

    Scale shape: map-ONLY — decode fused with the trim scan in the
    actor pool, payloads consumed in-stage, four int64s + metadata per
    clip leave the task.  Oracle: golden driver recompute with an
    independent forward/backward Python scan (vs the engine's
    flatnonzero bounds).

    Output: (media_id, fmt, ok, n_samples, trim_start, trim_end,
    n_quiet, quiet_frac, kept_frac).
    """
    ds = rd.read_parquet(audio_path_for(sf_dir))
    scored = ds.map_batches(media.AudioSilenceTrim, batch_format="pyarrow", batch_size=256, concurrency=(1, 4))

    def finish(t: pa.Table) -> pa.Table:
        ns = np.maximum(t["n_samples"].to_numpy().astype(np.float64), 1.0)
        qf = duckdb_round(t["n_quiet"].to_numpy().astype(np.float64) / ns, 6)
        kept = np.maximum(t["trim_end"].to_numpy() - t["trim_start"].to_numpy(), 0)
        kf = duckdb_round(kept.astype(np.float64) / ns, 6)
        out = t.append_column("quiet_frac", pa.array(qf, type=pa.float64()))
        return out.append_column("kept_frac", pa.array(kf, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


def video_temporal_smoothness(sf_dir: str) -> rd.Dataset:
    """Per-clip inter-frame SAD census (stages.media
    .VideoTemporalSmoothness): total/min/max consecutive-pair SAD and
    the frozen-pair count — the stuck-encoder / splice screen a video
    corpus runs before frame-sampling anything (reference analogue:
    the ST5/M9 media gate layer beside audio_clipping).

    Scale shape: map-ONLY — raw-frame decode fused with the SAD
    reduction in the actor pool, payloads consumed in-stage, six
    int64s + metadata per clip leave the task; no shuffle at all.
    Oracle: golden driver recompute with an independent per-pair
    Python loop (vs the engine's vectorized diff).

    Output: (media_id, fmt, ok, frame_bytes, n_pairs, total_sad,
    min_pair_sad, max_pair_sad, n_frozen_pairs, mean_sad_per_byte).
    """
    ds = rd.read_parquet(video_path_for(sf_dir))
    scored = ds.map_batches(
        media.VideoTemporalSmoothness, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )

    def finish(t: pa.Table) -> pa.Table:
        denom = np.maximum((t["n_pairs"].to_numpy() * t["frame_bytes"].to_numpy()).astype(np.float64), 1.0)
        mean = duckdb_round(t["total_sad"].to_numpy().astype(np.float64) / denom, 6)
        return t.append_column("mean_sad_per_byte", pa.array(mean, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


AUDIO_BANDS = ((0, 250), (250, 500), (500, 1000), (1000, 2000), (2000, 4000), (4000, 1 << 30))
BAND_FP = 10**9


def audio_band_energy(sf_dir: str) -> rd.Dataset:
    """Corpus spectral-balance profile: fraction of total spectral
    energy per octave-ish frequency band — the EQ-curve view of an
    audio corpus (speech lives at 250-4k; hiss pushes the top band;
    hum the bottom), the audio analogue of dct_energy_profile's
    compaction bands and the corpus-level complement of
    audio_pitch_histogram's per-clip argmax.

    Determinism: per clip, band energies from |rfft|² are normalized
    to FRACTIONS and pinned once to int64 (the per-clip spectrum is a
    pure function of its samples — np.fft on identical input is the
    shared kernel, like the pitch histogram); the corpus fold is an
    exact integer sum, and per-band output is one mirrored division.

    Scale shape: decode + FFT + band reduce fused in the actor pool
    (|bands| int64s per clip leave the task), ONE |bands|-row groupby.
    Output: (band_lo_hz, band_hi_hz, sum_frac_fp, n_clips,
    energy_frac) rounded 6.
    """
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(audio_path_for(sf_dir))
    bands = AUDIO_BANDS

    class BandEnergy:
        def __call__(self, batch: pa.Table) -> pa.Table:
            payloads = batch["bytes"].to_pylist()
            n_b = len(bands)
            acc = np.zeros(n_b, dtype=np.int64)
            n_clips = 0
            for p in payloads:
                sr, samples = media.decode_wav_pcm16(p)
                mag2 = np.abs(np.fft.rfft(samples.astype(np.float64))) ** 2
                mag2[0] = 0.0  # drop DC
                freqs = np.arange(len(mag2)) * (sr / len(samples))
                tot = float(mag2.sum())
                if tot <= 0.0:
                    continue
                n_clips += 1
                for bi, (lo, hi) in enumerate(bands):
                    e = float(mag2[(freqs >= lo) & (freqs < hi)].sum())
                    acc[bi] += int(np.floor(e / tot * BAND_FP + 0.5))
            return pa.table(
                {
                    "band_idx": pa.array(np.arange(n_b, dtype=np.int64)),
                    "sum_frac_fp": pa.array(acc),
                    "n_clips": pa.array(np.full(n_b, n_clips, dtype=np.int64)),
                }
            )

    agg = (
        ds.map_batches(BandEnergy, batch_format="pyarrow", batch_size=256, concurrency=(1, 4))
        .groupby("band_idx")
        .aggregate(Sum("sum_frac_fp", alias_name="sum_frac_fp"), Sum("n_clips", alias_name="n_clips"))
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.sort_by("band_idx")
        bi = t["band_idx"].to_numpy()
        s = t["sum_frac_fp"].to_numpy().astype(np.float64)
        n = np.maximum(t["n_clips"].to_numpy().astype(np.float64), 1.0)
        frac = duckdb_round((s / BAND_FP) / n, 6)
        return pa.table(
            {
                "band_lo_hz": pa.array([bands[i][0] for i in bi], type=pa.int64()),
                "band_hi_hz": pa.array([bands[i][1] for i in bi], type=pa.int64()),
                "sum_frac_fp": t["sum_frac_fp"].cast(pa.int64()),
                "n_clips": t["n_clips"].cast(pa.int64()),
                "energy_frac": pa.array(frac, type=pa.float64()),
            }
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# audio_fingerprint (constellation-hash duplicate detection)
# ---------------------------------------------------------------------------

FP_WIN = 1024  # analysis window (samples)
FP_HOP = 512  # hop
FP_PEAKS = 3  # peaks kept per frame
FP_FAN_DT = 3  # anchor pairs reach dt = 1..FP_FAN_DT frames ahead
FP_MIN_SHARED = 8  # pair-match threshold (shared distinct hashes)
FP_BUCKET_CAP = 4096  # degenerate-hash bucket truncation (logged)


def _fp_clip_hashes(samples: np.ndarray, sr: int) -> np.ndarray:
    """Distinct constellation hashes of one clip (Wang 2003): per
    512-hop 1024-sample frame, the FP_PEAKS strongest non-DC rfft bins
    (ties -> smaller bin); every anchor peak pairs with every peak
    1..FP_FAN_DT frames ahead; hash packs (f1, f2, dt) into int64.
    Frequencies stay in BIN units so equal-pitch clips match only at
    equal sample rate (a resampled copy is a different recording)."""
    ns = len(samples)
    n_frames = (ns - FP_WIN) // FP_HOP + 1 if ns >= FP_WIN else 0
    if n_frames < 2:
        return np.empty(0, dtype=np.int64)
    idx = np.arange(FP_WIN)[None, :] + (np.arange(n_frames) * FP_HOP)[:, None]
    mag = np.abs(np.fft.rfft(samples[idx].astype(np.float64), axis=1))
    mag[:, 0] = 0.0
    # top-P bins per frame, ties to the smaller bin: lexsort on (bin) then
    # stable argsort on -mag keeps the smaller bin first among equals
    order = np.argsort(-mag, axis=1, kind="stable")[:, :FP_PEAKS]
    peaks = np.sort(order, axis=1)  # canonical per-frame order (set semantics)
    hashes: list[np.ndarray] = []
    for dt in range(1, FP_FAN_DT + 1):
        if n_frames <= dt:
            break
        f1 = np.repeat(peaks[:-dt], FP_PEAKS, axis=1).reshape(-1)
        f2 = np.tile(peaks[dt:], (1, FP_PEAKS)).reshape(-1)
        hashes.append(f1 * (1 << 24) + f2 * (1 << 8) + dt)
    return np.unique(np.concatenate(hashes)) if hashes else np.empty(0, dtype=np.int64)


def audio_fingerprint(sf_dir: str, min_shared: int = FP_MIN_SHARED) -> rd.Dataset:
    """Constellation-fingerprint duplicate detection over the audio
    corpus (Wang 2003, the Shazam landmark scheme): clips that share
    >= min_shared distinct (peak, peak, dt) landmark hashes are
    re-encodes / re-uploads of the same recording — the audio leg of
    the dedup family (exact_dedup / phash_dedup / minhash cover text
    and images; this covers sound).

    Determinism: the FFT is a pure function of the samples (identical
    input -> identical np.fft floats on any worker); peak selection is
    a stable argsort with ties to the smaller bin; everything after
    the peak lists is exact integer.  The golden oracle recomputes
    per-frame with an independent sorted()-based traversal and
    brute-force O(C^2) set intersections.

    Scale shape: decode + FFT + landmark extraction fused in the actor
    pool (payload consumed in-stage; <= ~hundreds of 8-byte hashes per
    clip leave the task) -> (hash)-keyed groupby with the LSH bucket
    discipline (pair fan-out bounded by bucket size; degenerate
    buckets > FP_BUCKET_CAP truncate, logged) -> (pair)-keyed count ->
    threshold filter.  Landmark hashes, never samples, shuffle.

    Output: (media_a, media_b, n_shared) for matched pairs.
    """
    ds = rd.read_parquet(audio_path_for(sf_dir), columns=["media_id", "bytes", "fmt"])

    class Landmarks:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids: list[str] = []
            hs: list[np.ndarray] = []
            mids = batch["media_id"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            fmts = batch["fmt"].to_pylist()
            for i in range(batch.num_rows):
                if fmts[i] != "wav-pcm16":
                    continue
                sr, samples = media.decode_wav_pcm16(payloads[i])
                h = _fp_clip_hashes(samples, sr)
                ids.extend([mids[i]] * len(h))
                hs.append(h)
            return pa.table(
                {
                    "media_id": pa.array(ids, type=pa.string()),
                    "h": pa.array(
                        np.concatenate(hs) if hs else np.empty(0, dtype=np.int64), type=pa.int64()
                    ),
                }
            )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = sorted(g["media_id"].to_pylist())
        if len(ids) > FP_BUCKET_CAP:
            import logging

            logging.getLogger(__name__).warning(
                "audio_fingerprint: hash bucket truncated %d -> %d", len(ids), FP_BUCKET_CAP
            )
            ids = ids[:FP_BUCKET_CAP]
        if len(ids) < 2:
            return pa.table(
                {"media_a": pa.array([], type=pa.string()), "media_b": pa.array([], type=pa.string())}
            )
        a, b = zip(*[(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))])
        return pa.table(
            {"media_a": pa.array(a, type=pa.string()), "media_b": pa.array(b, type=pa.string())}
        )

    pairs = (
        ds.map_batches(Landmarks, batch_format="pyarrow", batch_size=128, concurrency=(1, 4))
        .groupby("h")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["media_a", "media_b"])
        .aggregate(Count(alias_name="n_shared"))
    )
    return pairs.filter(expr=f"n_shared >= {min_shared}")


# ---------------------------------------------------------------------------
# video_shot_segmentation (SAD-threshold cut detection)
# ---------------------------------------------------------------------------

SHOT_CUT_NUM = 3  # cut iff sad * DEN > NUM * median_sad
SHOT_CUT_DEN = 2


def video_shot_segmentation(sf_dir: str) -> rd.Dataset:
    """Per-clip shot segmentation: a CUT lands before frame j+1 when
    its SAD to frame j exceeds 1.5× the clip's median inter-frame SAD
    — the adaptive-threshold scene splitter (the multi-cut extension
    of video_keyframes' single argmax; TransNet-style pipelines start
    from exactly this census).

    Determinism: SADs are exact int64; the median is the LOWER median
    by exact selection (k = (n−1)//2 smallest, ties irrelevant on
    ints); the threshold test is the integer cross-multiplication
    ``sad * 2 > 3 * med`` — no float ever decides a cut, so the
    engine and the golden per-frame recompute agree cut-for-cut.

    Scale shape: map-ONLY — decode + SAD + cut scan fused in the
    actor pool, payloads consumed in-stage, five int64s + metadata
    per clip leave the task.

    Output: (media_id, fmt, ok, n_frames, med_sad, n_cuts, n_shots,
    longest_shot).
    """

    class Shots:
        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            fmts = batch["fmt"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            w = batch["w"].to_numpy()
            h = batch["h"].to_numpy()
            nf = batch["n_frames"].to_numpy()
            med = np.zeros(n, dtype=np.int64)
            ncut = np.zeros(n, dtype=np.int64)
            longest = np.zeros(n, dtype=np.int64)
            ok = np.zeros(n, dtype=bool)
            for i in range(n):
                if fmts[i] != "fake-raw" or int(nf[i]) < 2:
                    continue
                fb = int(w[i]) * int(h[i]) * 3
                arr = np.frombuffer(payloads[i], dtype=np.uint8)
                if len(arr) != fb * int(nf[i]):
                    continue
                frames = arr.reshape(int(nf[i]), fb).astype(np.int16)
                sads = np.abs(np.diff(frames, axis=0)).sum(axis=1, dtype=np.int64)
                m = int(np.partition(sads, (len(sads) - 1) // 2)[(len(sads) - 1) // 2])
                cuts = sads * SHOT_CUT_DEN > SHOT_CUT_NUM * m
                med[i] = m
                ncut[i] = int(cuts.sum())
                # shot lengths: frames between cuts (cut before frame j+1)
                idx = np.nonzero(cuts)[0] + 1
                bounds = np.concatenate([[0], idx, [int(nf[i])]])
                longest[i] = int(np.diff(bounds).max())
                ok[i] = True
            return pa.table(
                {
                    "media_id": batch["media_id"],
                    "fmt": batch["fmt"],
                    "ok": pa.array(ok),
                    "n_frames": pa.array(nf.astype(np.int64), type=pa.int64()),
                    "med_sad": pa.array(med, type=pa.int64()),
                    "n_cuts": pa.array(ncut, type=pa.int64()),
                    "n_shots": pa.array(ncut + 1, type=pa.int64()),
                    "longest_shot": pa.array(longest, type=pa.int64()),
                }
            )

    ds = rd.read_parquet(video_path_for(sf_dir))
    return ds.map_batches(Shots, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))


def audio_dedup_manifest(sf_dir: str, min_shared: int = FP_MIN_SHARED) -> rd.Dataset:
    """End-to-end audio dedup manifest: constellation-fingerprint
    match pairs -> distributed connected components -> first-wins
    survivorship (keep = the component's smallest media id) — the
    same keep/drop contract as the text/image dedup_manifest, closing
    the dedup family across all three payload modalities.

    Determinism: matches are content-stable (audio_fingerprint); the
    component label is the min id (schedule-independent); keep is a
    pure function of (id, label).

    Scale shape: the fingerprint DAG's two metadata exchanges + the
    CC min-label rounds (O(log d) join+groupby rounds over 16-B edge
    rows); singleton clips never enter the edge set and are emitted
    by a left-anti pass over the match-node table — id rows, never
    samples, move.

    Output: (media_id, cluster, keep) for EVERY clip.
    """
    from .cluster import connected_components

    pairs = audio_fingerprint(sf_dir, min_shared=min_shared).materialize()

    def to_int(t: pa.Table) -> pa.Table:
        a = np.array([int(s.split("-")[1]) for s in t["media_a"].to_pylist()], dtype=np.int64)
        b = np.array([int(s.split("-")[1]) for s in t["media_b"].to_pylist()], dtype=np.int64)
        return pa.table(
            {"doc_a": pa.array(a, type=pa.int64()), "doc_b": pa.array(b, type=pa.int64())}
        )

    all_ids = rd.read_parquet(audio_path_for(sf_dir), columns=["media_id"])

    if pairs.count() == 0:
        def singleton(t: pa.Table) -> pa.Table:
            ids = t["media_id"].to_pylist()
            nums = np.array([int(s.split("-")[1]) for s in ids], dtype=np.int64)
            return pa.table(
                {
                    "media_id": pa.array(ids, type=pa.string()),
                    "cluster": pa.array(nums, type=pa.int64()),
                    "keep": pa.array(np.ones(len(ids), dtype=bool)),
                }
            )

        return all_ids.map_batches(singleton, batch_format="pyarrow")

    labels = connected_components(pairs.map_batches(to_int, batch_format="pyarrow"))
    lab_map = {int(r["node"]): int(r["label"]) for r in labels.take_all()}  # matched ids only  # bounded: matched ids only
    lab_ref = ray.put(lab_map)

    class Manifest:
        def __init__(self):
            self.lab = ray.get(lab_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["media_id"].to_pylist()
            nums = [int(s.split("-")[1]) for s in ids]
            cluster = np.array([self.lab.get(v, v) for v in nums], dtype=np.int64)
            keep = np.array([c == v for c, v in zip(cluster, nums)], dtype=bool)
            return pa.table(
                {
                    "media_id": pa.array(ids, type=pa.string()),
                    "cluster": pa.array(cluster, type=pa.int64()),
                    "keep": pa.array(keep),
                }
            )

    return all_ids.map_batches(Manifest, batch_format="pyarrow", concurrency=(1, 4))


def video_motion_vectors(sf_dir: str) -> rd.Dataset:
    """Per-clip block-matching motion audit (stages.media
    .MotionVectors): the MPEG motion-search kernel as a corpus
    statistic — residual SAD after motion compensation vs the plain
    frame difference says how much of the temporal change is coherent
    motion (compressible) vs noise/cuts (not).

    Scale shape: map-ONLY actor-pool pass, decode fused with the
    block search, payloads consumed in-stage, five int64s + metadata
    per clip.  Oracle: golden recompute with an independent
    candidate-enumeration order (argmin over a flattened candidate
    list vs the engine's streaming lexicographic compare).

    Output: (media_id, fmt, ok, n_pairs, n_blocks, total_disp,
    n_static, total_best_sad).
    """
    ds = rd.read_parquet(video_path_for(sf_dir))
    return ds.map_batches(
        media.MotionVectors, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )


HARM_FP = 10**9
HARM_TOL = 0.03  # relative half-width of each harmonic acceptance window


def audio_harmonicity(sf_dir: str) -> rd.Dataset:
    """Per-clip harmonicity audit: fraction of spectral energy at the
    fundamental's harmonic series k·f0 (k = 1..4, ±3% windows) vs
    everywhere else — the tonality/HNR-style screen an audio corpus
    runs to separate harmonic content (speech vowels, music) from
    inharmonic partials and noise.  The fixture's 2.5·f0 partial is
    deliberately INHARMONIC, so harm_frac sits visibly below 1 — the
    audit can actually see something.

    Determinism: |rfft|² of identical samples is the shared kernel
    (the audio_band_energy convention); per-clip fractions are pinned
    to int64 once (floor(frac·FP + 0.5)); f0 is an integer-rounded
    argmax (DC dropped).

    Scale shape: decode + FFT + window sums fused in the actor pool —
    map-ONLY, payloads consumed in-stage, four scalars leave per
    clip.  Output: (media_id, sample_rate, f0_hz, harm_frac_fp,
    harm_frac).
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(audio_path_for(sf_dir))

    class Harmonicity:
        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            payloads = batch["bytes"].to_pylist()
            mids = batch["media_id"].to_pylist()
            f0s = np.zeros(n, dtype=np.int64)
            srs = np.zeros(n, dtype=np.int64)
            fr_fp = np.zeros(n, dtype=np.int64)
            for i in range(n):
                sr, samples = media.decode_wav_pcm16(payloads[i])
                mag2 = np.abs(np.fft.rfft(samples.astype(np.float64))) ** 2
                mag2[0] = 0.0
                hz_per_bin = sr / len(samples)
                peak = int(np.argmax(mag2))
                f0 = peak * hz_per_bin
                tot = float(mag2.sum())
                harm = 0.0
                if tot > 0.0 and peak > 0:
                    freqs = np.arange(len(mag2)) * hz_per_bin
                    for k in range(1, 5):
                        lo, hi = k * f0 * (1 - HARM_TOL), k * f0 * (1 + HARM_TOL)
                        harm += float(mag2[(freqs >= lo) & (freqs <= hi)].sum())
                    harm = min(harm, tot)
                f0s[i] = int(round(f0))
                srs[i] = sr
                fr_fp[i] = int(np.floor(harm / tot * HARM_FP + 0.5)) if tot > 0 else 0
            return pa.table(
                {
                    "media_id": pa.array(mids, type=pa.string()),
                    "sample_rate": pa.array(srs, type=pa.int64()),
                    "f0_hz": pa.array(f0s, type=pa.int64()),
                    "harm_frac_fp": pa.array(fr_fp, type=pa.int64()),
                }
            )

    scored = ds.map_batches(Harmonicity, batch_format="pyarrow", batch_size=256, concurrency=(1, 4))

    def finish(t: pa.Table) -> pa.Table:
        fr = duckdb_round(t["harm_frac_fp"].to_numpy().astype(np.float64) / HARM_FP, 6)
        return t.append_column("harm_frac", pa.array(fr, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# audio_lossy_migration — the lossy-audio sibling of image_lossy_migration
# ---------------------------------------------------------------------------


class AudioFormatMigrate:
    """Actor-pool stage: WAV-PCM16 decode -> mdctq encode (pure-NumPy
    MDCT + frequency-weighted quantization + zlib, codecs.py) -> decode
    back -> per-clip PSNR vs the original samples — the quality-bounded
    audio recompression run (MP3/AAC-shaped) of a cold speech/music
    corpus.  Bytes are consumed in-stage; only metadata + verification
    integers leave the task (ST5; the mp3 leg stays an env-bound stub,
    this is the REAL lossy transform path)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        from .. import codecs

        n = batch.num_rows
        # zeros, not empty: rows whose decode raises keep these slots,
        # and uninitialized memory would leak nondeterministic values
        # into ok=False rows (reproducibility of partial aggregates)
        old_b = np.zeros(n, dtype=np.int64)
        new_b = np.zeros(n, dtype=np.int64)
        psnr = np.full(n, np.inf)
        ok = np.zeros(n, dtype=bool)
        md5s = []
        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        for i in range(n):
            try:
                _sr, s16 = media.decode_wav_pcm16(payloads[i])
                out = codecs.encode_audio_mdctq(s16)
                back = codecs.decode_audio_mdctq(out)
                old_b[i] = len(payloads[i])
                new_b[i] = len(out)
                psnr[i] = codecs.audio_psnr_db(s16, back)
                md5s.append(hashlib.md5(out).hexdigest())
                ok[i] = True
            except Exception:  # noqa: BLE001 — M9: flag, don't fail the task
                md5s.append("")
        return pa.table(
            {
                "media_id": batch["media_id"],
                "fmt": pa.array(fmts, type=pa.string()),
                "ok": pa.array(ok, type=pa.bool_()),
                "old_bytes": pa.array(old_b),
                "new_bytes": pa.array(new_b),
                "psnr_db": pa.array(psnr, type=pa.float64()),
                "new_md5": pa.array(md5s, type=pa.string()),
            }
        )


def audio_lossy_migration(sf_dir: str) -> rd.Dataset:
    """Migration of the audio corpus to the LOSSY ``mdctq`` transform
    codec with the PSNR >= 40 dB fidelity gate verified per clip.

    Oracle: ``mdctq``'s step table PROVES worst-case PSNR >= 48.3 dB on
    ANY input (codecs._MDCTQ_STEPS — orthonormal-basis Parseval bound),
    so every clip must pass; the SQL mirror states the invariant
    (n_psnr40 == n_clips per source format) and the driver compare
    verifies the distributed decode -> MDCT -> quantize -> decode ->
    PSNR path reproduces it.

    Output: (fmt, n_clips, n_psnr40).
    """
    ds = rd.read_parquet(audio_path_for(sf_dir))
    migrated = ds.map_batches(
        AudioFormatMigrate, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )

    def gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        good = pc.and_(t["ok"], pc.greater_equal(t["psnr_db"], pa.scalar(40.0)))
        return pa.table({"fmt": t["fmt"], "psnr_ok": pc.cast(good, pa.int64())})

    return (
        migrated.map_batches(gate, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(
            Count(alias_name="n_clips"),
            Sum("psnr_ok", alias_name="n_psnr40"),
        )
        .sort("fmt")
    )
