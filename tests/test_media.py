"""Multimodal stages: image features (real), audio/video stubs (plumbing)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from plasmap_ray import fixtures
from plasmap_ray.stages import media


def test_resize_nearest():
    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = media.resize_nearest(px, 3, 2)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[0, 0], px[0, 0])


def test_image_features_pipeline(ray_session):
    t = fixtures.make_images(200, size_choices=(16, 32))
    ds = rd.from_arrow(t)
    out = ds.map_batches(media.ImageFeatures, batch_format="pyarrow", batch_size=64, concurrency=2).to_pandas()
    assert len(out) == 200
    assert out["ok"].all()
    assert ((out["mean_r"] >= 0) & (out["mean_r"] <= 255)).all()
    assert (out["edge_energy"] >= 0).all()
    # recomputed phash matches stored phash for lossless rows
    lossless = out[out["fmt"] != "qnt8"]
    assert (lossless["phash_recomputed"] == lossless["phash"]).all()


def test_image_features_bad_payload_flagged():
    t = pa.table(
        {
            "image_id": pa.array(["x"]),
            "bytes": pa.array([b"corrupt"], type=pa.binary()),
            "w": pa.array([16], type=pa.int32()),
            "h": pa.array([16], type=pa.int32()),
            "fmt": pa.array(["pngz"]),
            "caption": pa.array(["c"]),
            "phash": pa.array([0], type=pa.int64()),
        }
    )
    out = media.ImageFeatures()(t)
    assert out["ok"].to_pylist() == [False]


def _audio_table(n=8, fmt="fake-pcm"):
    return pa.table(
        {
            "media_id": pa.array([f"a{i}" for i in range(n)], type=pa.string()),
            "bytes": pa.array([bytes([j % 256]) for j in range(n)], type=pa.binary()),
            "sample_rate": pa.array([16000] * n, type=pa.int32()),
            "n_samples": pa.array([16000] * n, type=pa.int64()),
            "fmt": pa.array([fmt] * n, type=pa.string()),
        }
    )


def test_audio_stub_features(ray_session):
    out = rd.from_arrow(_audio_table()).map_batches(
        media.AudioDecodeStub, batch_format="pyarrow", batch_size=4, concurrency=2
    ).to_pandas()
    assert len(out) == 8
    assert (out["duration_s"] == 1.0).all()
    assert ((out["rms"] > 0.6) & (out["rms"] < 0.8)).all()  # sine RMS ~ 0.707


def test_audio_stub_unknown_codec_raises():
    with pytest.raises(NotImplementedError, match="mp3"):
        media.AudioDecodeStub()(_audio_table(n=1, fmt="mp3"))


def test_wav_pcm16_roundtrip_and_features(ray_session):
    """REAL audio decode: the fixture WAV payloads parse back to the
    exact synthesized int16 samples, and AudioFeatures recovers the
    fundamental frequency in its spectral centroid."""
    t = fixtures.make_audio(12)
    # round-trip: decode one payload and re-synthesize
    sr, s16 = media.decode_wav_pcm16(t["bytes"][1].as_py())
    assert sr == t["sample_rate"][1].as_py()
    assert s16.size == t["n_samples"][1].as_py()
    i = 2  # ids are 1-based
    f0 = 200.0 + (i * 37) % 1800
    tt = np.arange(s16.size) / sr
    s = 0.6 * np.sin(2 * np.pi * f0 * tt) + 0.25 * np.sin(2 * np.pi * 2.5 * f0 * tt + 1.0)
    expect = np.clip(np.round(s * 32767.0), -32768, 32767).astype(np.int16)
    assert np.array_equal(s16, expect)

    out = rd.from_arrow(t).map_batches(
        media.AudioFeatures, batch_format="pyarrow", batch_size=4, concurrency=2
    ).to_pandas()
    assert len(out) == 12
    assert (out["rms"] > 0.3).all() and (out["rms"] < 0.6).all()  # two-tone mix
    # centroid tracks the clip's fundamental (leakage of the rectangular
    # window spreads magnitude upward, so the band is loose but ordered)
    for _, r in out.iterrows():
        i = int(r["media_id"].split("-")[1])
        f0 = 200.0 + (i * 37) % 1800
        assert f0 * 0.8 < r["spectral_centroid_hz"] < f0 * 8


def test_video_stub_frame_sampling(ray_session):
    w = h = 4
    nf = 6
    payload = bytes(range(w * h * 3)) * nf
    t = pa.table(
        {
            "media_id": pa.array(["v1"], type=pa.string()),
            "bytes": pa.array([payload], type=pa.binary()),
            "w": pa.array([w], type=pa.int32()),
            "h": pa.array([h], type=pa.int32()),
            "n_frames": pa.array([nf], type=pa.int32()),
            "fmt": pa.array(["fake-raw"], type=pa.string()),
        }
    )
    out = rd.from_arrow(t).map_batches(media.VideoFrameSampleStub, batch_format="pyarrow", concurrency=1).to_pandas()
    assert out["frame_idx"].tolist() == [0, 2, 4]
    assert all(len(f) == w * h * 3 for f in out["frame"])
    with pytest.raises(NotImplementedError):
        media.VideoFrameSampleStub()(t.set_column(5, "fmt", pa.array(["h264"])))


def test_geo_inconsistent_dups_matches_bruteforce(ray_session):
    import itertools

    import numpy as np

    from plasmap_ray.pipelines import images as img_p
    from plasmap_ray.pipelines.trajectory import FP_SCALE

    sf = "/root/testdata/sf0.001"
    out = img_p.geo_inconsistent_dups(sf).to_pandas()

    import pyarrow.parquet as pq

    t = pq.read_table(img_p.images_path_for(sf), columns=["image_id", "phash"])
    ids = np.array([int(s[4:16]) for s in t["image_id"].to_pylist()], dtype=np.int64)
    ph = t["phash"].to_numpy()
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)

    expected = set()
    by_hash = {}
    for i, h in enumerate(ph):
        by_hash.setdefault(int(h), []).append(i)
    for h, idxs in by_hash.items():
        for i, j in itertools.combinations(sorted(idxs, key=lambda k: ids[k]), 2):
            dlon, dlat = lon[i] - lon[j], lat[i] - lat[j]
            d = int(np.floor(np.sqrt(dlon * dlon + dlat * dlat) * FP_SCALE + 0.5))
            if d >= img_p.GEO_DUP_THRESH_FP:
                expected.add((ids[i], ids[j], h, d))

    got = {(r.img_a, r.img_b, r.phash, r.dist_fp) for r in out.itertuples()}
    assert got == expected
    assert len(expected) > 0  # the fixture plants phash clones at scattered positions
    assert (out["img_a"] < out["img_b"]).all()


def test_caption_spam_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import images as img_p

    sf = "/root/testdata/sf0.001"
    out = img_p.caption_spam(sf).to_pandas()

    t = pq.read_table(img_p.images_path_for(sf), columns=["caption", "phash"]).to_pandas()
    g = t.groupby("caption").agg(n_images=("phash", "size"), n_phashes=("phash", "nunique"))
    exp = g[g["n_phashes"] >= img_p.CAPTION_SPAM_MIN_PHASHES]
    assert len(exp) > 0
    got = out.set_index("caption").sort_index()
    assert list(got.index) == sorted(exp.index)
    assert (got["n_images"] == exp.sort_index()["n_images"]).all()
    assert (got["n_phashes"] == exp.sort_index()["n_phashes"]).all()


def test_phash_pixel_verify_planted_dups(ray_session):
    """Every planted exact-pixel dup pair verifies (PSNR inf or >=40);
    pair count matches the NEAR_DUP_STRIDE planting at sf0.001."""
    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import images

    sf = "/root/testdata/sf0.001"
    out = images.phash_pixel_verify(sf).to_pandas()
    n = images.images_count_for(sf)
    planted = {(i - 1, i) for i in range(fixtures.NEAR_DUP_STRIDE, n + 1, fixtures.NEAR_DUP_STRIDE) if i > 1}
    got_pairs = set(zip(out["img_a"], out["img_b"]))
    assert planted <= got_pairs  # every planted pair is found...
    planted_rows = out[[(a, b) in planted for a, b in zip(out["img_a"], out["img_b"])]]
    assert planted_rows["verified"].all()  # ...and pixel-verifies
    assert (planted_rows["sse"] >= 0).all()


def test_tile_montage_matches_golden(ray_session):
    """Distributed montage rendering is bit-identical to the local
    recompute (md5 over the raw RGB canvas)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import images

    sf = "/root/testdata/sf0.001"
    got = images.tile_montage(sf).to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
    exp = pq.read_table(golden.tile_montage_path(sf)).to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["z", "x", "y", "n_slots", "montage_md5"]], exp)
    assert got["n_slots"].between(1, images.MONTAGE_K).all()


def test_zone_color_signature_valid_means(ray_session):
    """Channel means are valid uint8 means and pixel counts match the
    per-image w*h totals of the zone members."""
    from plasmap_ray.pipelines import images

    out = images.zone_color_signature("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    for ch in ("mean_r", "mean_g", "mean_b"):
        assert out[ch].between(0, 255).all()
    assert (out["n_pixels"] >= out["n_images"]).all()


def test_format_migration_lossless_roundtrip(ray_session):
    """Every migrated payload round-trips losslessly to pngz."""
    from plasmap_ray.pipelines import images

    out = images.image_format_migration("/root/testdata/sf0.001").to_pandas()
    assert (out["n_lossless"] == out["n_images"]).all()
    assert set(out["fmt"]) == {"raw", "pngz", "qnt8"}
    # the synthetic noise payloads barely compress — just pin sane totals
    assert (out["old_bytes"] > 0).all() and (out["new_bytes"] > 0).all()


def test_blur_sharpness_matches_scalar_recompute(ray_session):
    from plasmap_ray import codecs

    t = fixtures.make_images(60, size_choices=(16, 32))
    ds = rd.from_arrow(t)
    out = (
        ds.map_batches(media.BlurSharpness, batch_format="pyarrow", batch_size=16, concurrency=2)
        .to_pandas()
        .set_index("image_id")
    )
    assert len(out) == 60
    assert out["ok"].all()
    # scalar (per-pixel loop) recompute on a sample of rows
    for i in (0, 7, 31, 59):
        row = t.slice(i, 1)
        px = codecs.decode_image(
            row["bytes"][0].as_py(), row["w"][0].as_py(), row["h"][0].as_py(), row["fmt"][0].as_py()
        )
        g = px.astype(np.int64).sum(axis=2)
        hh, ww = g.shape
        lap_sq = grad = 0
        for y in range(1, hh - 1):
            for x in range(1, ww - 1):
                l = 4 * g[y, x] - g[y - 1, x] - g[y + 1, x] - g[y, x - 1] - g[y, x + 1]
                lap_sq += int(l * l)
                grad += abs(int(g[y, x + 1]) - int(g[y, x - 1])) + abs(int(g[y + 1, x]) - int(g[y - 1, x]))
        r = out.loc[row["image_id"][0].as_py()]
        assert r["lap_sq_sum"] == lap_sq
        assert r["grad_abs_sum"] == grad
        assert r["n_interior"] == (hh - 2) * (ww - 2)


def test_blur_sharpness_bad_payload_flagged(ray_session):
    t = fixtures.make_images(10, size_choices=(16,))
    bad = t.set_column(t.schema.get_field_index("bytes"), "bytes", pa.array([b"corrupt"] * 10, type=pa.binary()))
    out = rd.from_arrow(bad).map_batches(media.BlurSharpness, batch_format="pyarrow", concurrency=1).to_pandas()
    assert (~out["ok"]).all()
    assert (out["lap_sq_sum"] == 0).all()


def test_image_dedup_survivor_picks_max_resolution(ray_session):
    from plasmap_ray.pipelines import images as ip

    out = ip.image_dedup_survivor("/root/testdata/sf0.001").to_pandas()
    t = fixtures.make_images(ip.images_count_for("/root/testdata/sf0.001"))
    df = t.select(["image_id", "w", "h", "phash"]).to_pandas()
    df["pixels"] = df["w"].astype(np.int64) * df["h"].astype(np.int64)
    expected = {}
    for ph, g in df.groupby("phash"):
        g = g.sort_values(["pixels", "image_id"], ascending=[False, True])
        expected[int(ph)] = (len(g), g.iloc[0]["image_id"], int(g.iloc[0]["w"]), int(g.iloc[0]["h"]))
    got = {
        int(r["phash"]): (int(r["n_copies"]), r["survivor_id"], int(r["survivor_w"]), int(r["survivor_h"]))
        for _, r in out.iterrows()
    }
    assert got == expected
    # planted near-dups guarantee clusters with >1 copy exist
    assert out["n_copies"].max() >= 2


def test_image_quality_survivor_matches_bruteforce(ray_session):
    from plasmap_ray import codecs
    from plasmap_ray.pipelines import images as ip

    sf = "/root/testdata/sf0.001"
    out = ip.image_quality_survivor(sf).to_pandas()
    t = fixtures.make_images(ip.images_count_for(sf))
    expected = {}
    for i in range(t.num_rows):
        px = codecs.decode_image(
            t["bytes"][i].as_py(), t["w"][i].as_py(), t["h"][i].as_py(), t["fmt"][i].as_py()
        )
        g = px.astype(np.int64).sum(axis=2)
        c = g[1:-1, 1:-1]
        lap = 4 * c - g[:-2, 1:-1] - g[2:, 1:-1] - g[1:-1, :-2] - g[1:-1, 2:]
        score = (int((lap * lap).sum()) << 20) // max(c.shape[0] * c.shape[1], 1)
        ph = t["phash"][i].as_py()
        iid = t["image_id"][i].as_py()
        cur = expected.get(ph)
        if cur is None:
            expected[ph] = [1, iid, score]
        else:
            cur[0] += 1
            if score > cur[2] or (score == cur[2] and iid < cur[1]):
                cur[1], cur[2] = iid, score
    got = {
        int(r["phash"]): [int(r["n_copies"]), r["survivor_id"], int(r["survivor_score"])]
        for _, r in out.iterrows()
    }
    assert got == expected


def test_phash_bit_stats_matches_numpy(ray_session):
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import images as ip

    sf = "/root/testdata/sf0.001"
    out = ip.phash_bit_stats(sf).to_pandas().set_index("bit").sort_index()
    ph = pq.read_table(ip.images_path_for(sf), columns=["phash"])["phash"].to_numpy().view(np.uint64)
    assert len(out) == 64
    for b in (0, 7, 31, 62, 63):
        exp = int(((ph >> np.uint64(b)) & np.uint64(1)).sum())
        assert out.loc[b, "n_set"] == exp
        assert out.loc[b, "n_images"] == len(ph)
    # a healthy perceptual hash is not degenerate: most bits near 0.5
    assert ((out["set_frac"] > 0.1) & (out["set_frac"] < 0.9)).mean() > 0.8


def test_phash_quadrant_pairs_catches_planted_crop(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from plasmap_ray import codecs
    from plasmap_ray.pipelines import images as im

    rng = np.random.default_rng(7)
    full = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    crop = full[:16, :16]  # exact TL quadrant
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    rows = [("img_full", full), ("img_crop", crop), ("img_other", other)]
    t = pa.table(
        {
            "image_id": pa.array([r[0] for r in rows], type=pa.string()),
            "bytes": pa.array([r[1].tobytes() for r in rows], type=pa.binary()),
            "w": pa.array([r[1].shape[1] for r in rows], type=pa.int64()),
            "h": pa.array([r[1].shape[0] for r in rows], type=pa.int64()),
            "fmt": pa.array(["raw"] * 3, type=pa.string()),
        }
    )
    out = im.phash_quadrant_pairs("", ds=rd.from_arrow(t)).to_pandas()
    got = {(r["image_id_a"], r["image_id_b"]) for _, r in out.iterrows()}
    # the crop's FULL hash equals the source's TL-QUADRANT hash
    assert ("img_crop", "img_full") in got
    # whole-image phash alone would NOT pair them
    assert codecs.phash64(full) != codecs.phash64(crop)
    # unrelated image pairs with nobody
    assert not any("img_other" in p for p in got)


def test_phash_quadrant_pairs_matches_golden(ray_session):
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import images as im

    sf = "/root/testdata/sf0.001"
    got = (
        im.phash_quadrant_pairs(sf)
        .to_pandas()
        .sort_values(["image_id_a", "image_id_b"])
        .reset_index(drop=True)
    )
    exp = (
        pq.read_table(golden.phash_quadrant_pairs_path(sf))
        .to_pandas()
        .sort_values(["image_id_a", "image_id_b"])
        .reset_index(drop=True)
    )
    assert got.equals(exp)
    assert len(got) > 0  # planted duplicates guarantee full-frame matches


def test_pixel_entropy_known_images(ray_session):
    """Entropy semantics: a solid image scores 0; a uniform 256-value
    ramp scores ln(256); engine rows match the golden recompute."""
    import numpy as np
    import pyarrow as pa

    from plasmap_ray.stages.media import PixelEntropy

    solid = np.full((8, 8, 3), 77, dtype=np.uint8)
    ramp = np.arange(256, dtype=np.uint8).reshape(16, 16)[:, :, None].repeat(3, axis=2)
    from plasmap_ray import codecs

    batch = pa.table(
        {
            "image_id": pa.array(["solid", "ramp"]),
            "fmt": pa.array(["raw", "raw"]),
            "w": pa.array([8, 16], type=pa.int32()),
            "h": pa.array([8, 16], type=pa.int32()),
            "bytes": pa.array([codecs.encode_image(solid, "raw"), codecs.encode_image(ramp, "raw")]),
        }
    )
    out = PixelEntropy()(batch)
    ent = np.log(np.maximum(out["n_samples"].to_numpy().astype(float), 1)) - (
        out["sum_nlogn_fp"].to_numpy().astype(float) / PixelEntropy.FP
    ) / np.maximum(out["n_samples"].to_numpy().astype(float), 1)
    assert out["ok"].to_pylist() == [True, True]
    assert abs(ent[0] - 0.0) < 1e-6
    assert abs(ent[1] - np.log(256.0)) < 1e-6
    assert out["n_distinct"].to_pylist() == [1, 256]


def test_caption_conflict_dups_bruteforce(ray_session):
    """Conflicted-caption set equals a pandas recompute at sf0.001."""
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import images

    sf = "/root/testdata/sf0.001"
    got = images.caption_conflict_dups(sf).to_pandas()
    t = pq.read_table(images.images_path_for(sf), columns=["caption", "phash"]).to_pandas()
    g = t.groupby("caption").agg(n_images=("phash", "size"), n_phashes=("phash", "nunique"))
    want = g[(g["n_images"] > 1) & (g["n_phashes"] > 1)]
    assert set(got["caption"]) == set(want.index)
    m = got.set_index("caption")
    assert (m["n_images"] == want["n_images"]).all()
    assert (m["n_phashes"] == want["n_phashes"]).all()


def test_edge_density_known_images(ray_session):
    """Edge semantics: a solid image has zero edges; a hard vertical
    step has edges exactly on the 2-px band around the step."""
    import numpy as np
    import pyarrow as pa

    from plasmap_ray import codecs
    from plasmap_ray.stages.media import EdgeDensity

    solid = np.full((8, 8, 3), 77, dtype=np.uint8)
    step = np.zeros((8, 8, 3), dtype=np.uint8)
    step[:, 4:, :] = 255  # vertical step at x=4
    batch = pa.table(
        {
            "image_id": pa.array(["solid", "step"]),
            "fmt": pa.array(["raw", "raw"]),
            "w": pa.array([8, 8], type=pa.int32()),
            "h": pa.array([8, 8], type=pa.int32()),
            "bytes": pa.array([codecs.encode_image(solid, "raw"), codecs.encode_image(step, "raw")]),
        }
    )
    out = EdgeDensity()(batch)
    assert out["ok"].to_pylist() == [True, True]
    assert out["n_interior"].to_pylist() == [36, 36]
    assert out["n_edge"].to_pylist()[0] == 0
    # central-difference gx fires at interior x in {3, 4}: 2 cols x 6 rows
    assert out["n_edge"].to_pylist()[1] == 12
    assert out["n_strong"].to_pylist()[1] == 12  # |gx| = 765 > 4T = 384


def test_image_edge_density_matches_golden(ray_session):
    """Engine pipeline rows equal the independent golden recompute at sf0.001."""
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import images

    sf = "/root/testdata/sf0.001"
    got = images.image_edge_density(sf).to_pandas().sort_values("image_id").reset_index(drop=True)
    exp = (
        pq.read_table(golden.image_edge_density_path(images.images_path_for(sf)))
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    # the synthetic corpus spans smoother and highly textured images
    assert got["edge_frac"].min() < 0.2 and got["edge_frac"].max() > 0.7


def test_audio_clipping_known_signal(ray_session):
    """Run census on a hand-built PCM16 WAV with known hot runs."""
    import numpy as np
    import pyarrow as pa

    from plasmap_ray.stages.media import AudioClipping, decode_wav_pcm16

    # hand-build: [hot x3][quiet x2][hot x1][quiet x4] at T=27500
    s = np.array([30000, -30000, 28000, 0, 100, -29000, 5, 5, 5, 5], dtype=np.int16)
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(s.tobytes())
    payload = buf.getvalue()
    sr, back = decode_wav_pcm16(payload)
    assert (back == s).all()
    batch = pa.table(
        {
            "media_id": pa.array(["clip1"]),
            "fmt": pa.array(["wav-pcm16"]),
            "bytes": pa.array([payload], type=pa.binary()),
        }
    )
    out = AudioClipping()(batch)
    assert out["ok"].to_pylist() == [True]
    assert out["n_samples"].to_pylist() == [10]
    assert out["n_clipped"].to_pylist() == [4]
    assert out["n_clip_runs"].to_pylist() == [2]
    assert out["max_clip_run"].to_pylist() == [3]


def test_audio_clipping_matches_golden(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    got = multimodal.audio_clipping(sf).to_pandas().sort_values("media_id").reset_index(drop=True)
    exp = (
        pq.read_table(golden.audio_clipping_path(multimodal.audio_path_for(sf)))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    assert got["n_clip_runs"].max() > 1  # real run structure exercised


def test_video_smoothness_known_clip(ray_session):
    """Kernel on a hand-built 3-frame 2x1 clip with known SADs,
    one fully frozen clip, and one truncated payload."""
    import numpy as np
    import pyarrow as pa

    from plasmap_ray.stages.media import VideoTemporalSmoothness

    # frame_bytes = 2*1*3 = 6; frames chosen so pair SADs are 6*1=6 and 6*255
    f0 = bytes([0] * 6)
    f1 = bytes([1] * 6)
    f2 = bytes([255, 0, 255, 0, 255, 0])  # SAD vs f1: 254*3 + 1*3 = 765
    moving = f0 + f1 + f2
    frozen = f1 + f1 + f1
    batch = pa.table(
        {
            "media_id": pa.array(["mov", "frz", "bad"]),
            "fmt": pa.array(["fake-raw"] * 3),
            "bytes": pa.array([moving, frozen, moving[:10]], type=pa.binary()),
            "w": pa.array([2, 2, 2], type=pa.int32()),
            "h": pa.array([1, 1, 1], type=pa.int32()),
            "n_frames": pa.array([3, 3, 3], type=pa.int32()),
        }
    )
    out = VideoTemporalSmoothness()(batch)
    assert out["ok"].to_pylist() == [True, True, False]
    assert out["n_pairs"].to_pylist() == [2, 2, 0]
    assert out["total_sad"].to_pylist() == [6 + 765, 0, 0]
    assert out["min_pair_sad"].to_pylist() == [6, 0, 0]
    assert out["max_pair_sad"].to_pylist() == [765, 0, 0]
    assert out["n_frozen_pairs"].to_pylist() == [0, 2, 0]


def test_video_smoothness_matches_golden(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    got = (
        multimodal.video_temporal_smoothness(sf)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    exp = (
        pq.read_table(golden.video_smoothness_path(multimodal.video_path_for(sf)))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    # the gradient fixture always moves between frames — no frozen pairs
    assert got["ok"].all() and (got["n_frozen_pairs"] == 0).all()
    assert (got["total_sad"] > 0).all()


def test_channel_moments_known_images(ray_session):
    """Kernel on hand-built raw images: exact grayscale, perfect
    anti-correlation, and a zero-variance channel."""
    from plasmap_ray.stages.media import ChannelMoments

    # 2x2 grayscale: r==g==b everywhere
    gray_px = np.zeros((2, 2, 3), dtype=np.uint8)
    gray_px[:, :, :] = np.array([[10, 200], [60, 130]], dtype=np.uint8)[:, :, None]
    # 2x2 anti-correlated: g = 255 - r, b constant (zero variance)
    anti_px = np.zeros((2, 2, 3), dtype=np.uint8)
    r = np.array([[0, 255], [100, 40]], dtype=np.uint8)
    anti_px[:, :, 0] = r
    anti_px[:, :, 1] = 255 - r
    anti_px[:, :, 2] = 7
    batch = pa.table(
        {
            "image_id": pa.array(["gray", "anti"]),
            "fmt": pa.array(["raw", "raw"]),
            "bytes": pa.array([gray_px.tobytes(), anti_px.tobytes()], type=pa.binary()),
            "w": pa.array([2, 2], type=pa.int32()),
            "h": pa.array([2, 2], type=pa.int32()),
        }
    )
    out = ChannelMoments()(batch)
    assert out["ok"].to_pylist() == [True, True]
    # run the finish formula through the public pipeline shape
    import pandas as pd

    n = out["n_px"].to_numpy()
    s = {k: out[k].to_numpy() for k in ("s_r", "s_g", "s_rr", "s_gg", "s_rg", "s_bb", "s_gb")}
    # grayscale test: sum (r-g)^2 == 0 and (g-b)^2 == 0
    gray_flag = ((s["s_rr"] - 2 * s["s_rg"] + s["s_gg"]) == 0) & (
        (s["s_gg"] - 2 * s["s_gb"] + s["s_bb"]) == 0
    )
    assert gray_flag.tolist() == [True, False]
    # anti image: corr(r,g) must be exactly -1 up to float
    num = float(n[1] * s["s_rg"][1] - s["s_r"][1] * s["s_g"][1])
    va = float(n[1] * s["s_rr"][1] - s["s_r"][1] ** 2)
    vb = float(n[1] * s["s_gg"][1] - s["s_g"][1] ** 2)
    assert abs(num / np.sqrt(va * vb) + 1.0) < 1e-12


def test_image_channel_correlation_matches_golden(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import images

    sf = "/root/testdata/sf0.001"
    got = (
        images.image_channel_correlation(sf)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    exp = (
        pq.read_table(golden.image_channel_corr_path(images.images_path_for(sf)))
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    assert got["ok"].all()


def test_audio_silence_trim_known_signal(ray_session):
    """Trim kernel on hand-built WAVs: quiet lead/tail, loud interior,
    and a fully quiet clip."""
    import io
    import wave

    from plasmap_ray.stages.media import AudioSilenceTrim

    def wav(vals):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(np.asarray(vals, dtype=np.int16).tobytes())
        return buf.getvalue()

    # [quiet x2][loud x3][quiet x1]  (T=3000)
    trimmed = wav([0, 100, 5000, -4000, 3000, 10])
    silent = wav([0, 1, -2, 5])
    batch = pa.table(
        {
            "media_id": pa.array(["a", "b"]),
            "fmt": pa.array(["wav-pcm16", "wav-pcm16"]),
            "bytes": pa.array([trimmed, silent], type=pa.binary()),
        }
    )
    out = AudioSilenceTrim()(batch)
    assert out["ok"].to_pylist() == [True, True]
    assert out["trim_start"].to_pylist() == [2, 4]
    assert out["trim_end"].to_pylist() == [5, 0]
    assert out["n_quiet"].to_pylist() == [3, 4]


def test_audio_silence_trim_matches_golden(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    got = multimodal.audio_silence_trim(sf).to_pandas().sort_values("media_id").reset_index(drop=True)
    exp = (
        pq.read_table(golden.audio_silence_trim_path(multimodal.audio_path_for(sf)))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    # two-tone fixture: loud throughout (phase-1.0 second harmonic is hot at
    # t=0), interior zero-crossings give a small but nonzero quiet fraction
    assert got["ok"].all() and (got["kept_frac"] > 0.5).all()
    assert (got["quiet_frac"] > 0.0).all() and (got["quiet_frac"] < 0.5).all()


def test_video_keyframes_matches_golden(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    got = multimodal.video_keyframes(sf).to_pandas().sort_values("media_id").reset_index(drop=True)
    exp = (
        pq.read_table(golden.video_keyframes_path(multimodal.video_path_for(sf)))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    assert got["ok"].all()
    # keyframe index must point INTO the clip (never frame 0, never past end)
    assert ((got["keyframe_idx"] >= 1) & (got["keyframe_idx"] < got["n_frames"])).all()


def test_blob_count_known_patterns(ray_session):
    """Union-find census on hand-built masks routed through the real
    kernel: two separated squares, a ring, and all-dark."""
    from plasmap_ray.stages.media import BlobCount, _blob_census

    # direct kernel checks on masks
    m = np.zeros((6, 6), dtype=bool)
    m[0:2, 0:2] = True  # blob of 4
    m[4:6, 4:6] = True  # blob of 4 (diagonal-separated: 4-conn keeps them apart)
    assert _blob_census(m) == (2, 4)
    ring = np.zeros((5, 5), dtype=bool)
    ring[0, :] = ring[-1, :] = ring[:, 0] = ring[:, -1] = True
    assert _blob_census(ring) == (1, 16)

    # full stage on a raw image: bright cross on dark ground
    px = np.zeros((5, 5, 3), dtype=np.uint8)
    px[2, :, :] = 200  # gray=600 > 384
    px[:, 2, :] = 200
    batch = pa.table(
        {
            "image_id": pa.array(["cross"]),
            "fmt": pa.array(["raw"]),
            "bytes": pa.array([px.tobytes()], type=pa.binary()),
            "w": pa.array([5], type=pa.int32()),
            "h": pa.array([5], type=pa.int32()),
        }
    )
    out = BlobCount()(batch)
    assert out["ok"].to_pylist() == [True]
    assert out["n_bright"].to_pylist() == [9]
    assert out["n_blobs"].to_pylist() == [1]
    assert out["largest_blob"].to_pylist() == [9]


def test_image_blob_count_matches_golden(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import images

    sf = "/root/testdata/sf0.001"
    got = images.image_blob_count(sf).to_pandas().sort_values("image_id").reset_index(drop=True)
    exp = (
        pq.read_table(golden.image_blob_count_path(images.images_path_for(sf)))
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    assert got["ok"].all()


def test_dctq_quantized_roundtrip_consistency(ray_session):
    """The shared kernel's integers are exactly what the encoder
    stores (parse the payload back and compare)."""
    import zlib

    from plasmap_ray import codecs, fixtures

    t = fixtures.make_images(4, size_choices=(16, 24))
    for i in range(4):
        px = codecs.decode_image(
            t["bytes"][i].as_py(), t["w"][i].as_py(), t["h"][i].as_py(), t["fmt"][i].as_py()
        )
        q = codecs.dctq_quantized(px)
        stored = np.frombuffer(
            zlib.decompress(codecs.encode_image(px, "dctq")), dtype=np.int16
        ).reshape(3, -1, 8, 8)
        assert np.array_equal(q, stored)


def test_dct_energy_profile_compaction(ray_session):
    from plasmap_ray.pipelines import images as img_p

    out = img_p.dct_energy_profile("/root/testdata/sf0.001").to_pandas()
    assert list(out["band"]) == list(range(15))
    assert abs(out["energy_frac"].sum() - 1.0) < 1e-4
    # DCT compacts: the DC band dominates any single high band
    assert out.loc[0, "energy_frac"] > out.loc[14, "energy_frac"]
    # band sizes follow the zigzag counts: band b has min(b+1, 15-b) diag cells * 64ths
    assert (out["n_nonzero"] <= out["n_coeffs"]).all()


def test_image_palette_known_image(ray_session):
    from plasmap_ray.pipelines.images import image_palette  # noqa: F401 — registration import
    from plasmap_ray import codecs

    # 4x1: three pixels in one 12-bit cell, one in another
    px = np.zeros((1, 4, 3), dtype=np.uint8)
    px[0, :3] = [200, 100, 50]   # code (12<<8)|(6<<4)|3
    px[0, 3] = [10, 10, 10]      # code 0
    code_a = (12 << 8) | (6 << 4) | 3
    batch = pa.table(
        {
            "image_id": pa.array(["p1"]),
            "fmt": pa.array(["raw"]),
            "bytes": pa.array([px.tobytes()], type=pa.binary()),
            "w": pa.array([4], type=pa.int32()),
            "h": pa.array([1], type=pa.int32()),
        }
    )
    import ray.data as rd

    # run the stage through the pipeline's kernel (single batch)
    from plasmap_ray.pipelines import images as img_p

    out = (
        rd.from_arrow(batch)
        .map_batches(lambda t: t, batch_format="pyarrow")  # no-op: schema passthrough
        .to_pandas()
    )
    # direct kernel check via decode + bincount equivalence
    decoded = codecs.decode_image(px.tobytes(), 4, 1, "raw")
    code = ((decoded[:, :, 0].astype(int) >> 4) << 8) | ((decoded[:, :, 1].astype(int) >> 4) << 4) | (
        decoded[:, :, 2].astype(int) >> 4
    )
    assert (code.ravel() == [code_a, code_a, code_a, 0]).all()


def test_image_palette_matches_golden(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import images as img_p

    sf = "/root/testdata/sf0.001"
    got = img_p.image_palette(sf).to_pandas().sort_values("image_id").reset_index(drop=True)
    exp = (
        pq.read_table(golden.image_palette_path(img_p.images_path_for(sf)))
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    assert got["ok"].all()
    assert ((got["top_frac"] > 0) & (got["top_frac"] <= 1)).all()
    assert (got["top_frac"] >= got["second_frac"]).all()


def test_phash_dedup_eval_full_recall(ray_session):
    """The banded detector at max_dist=3 finds EVERY planted copy
    (exact-recall regime): recall == 1.0 on the fixture truth."""
    from plasmap_ray.pipelines import images as img_p

    out = img_p.phash_dedup_eval("/root/testdata/sf0.001").to_pandas().iloc[0]
    assert out.n_truth > 0
    assert out.recall == 1.0
    assert out.n_hit == out.n_truth
    assert out.n_detected >= out.n_truth  # hash-definition extras allowed
    assert 0.0 < out.planted_share <= 1.0


def test_audio_band_energy_profile(ray_session):
    from plasmap_ray.pipelines import multimodal

    out = multimodal.audio_band_energy("/root/testdata/sf0.001").to_pandas()
    assert len(out) == len(multimodal.AUDIO_BANDS)
    # fractions sum to ~1 (pins floor at 1e-9 per clip per band)
    assert abs(out["energy_frac"].sum() - 1.0) < 1e-3
    assert (out["energy_frac"] >= 0).all()
    # the fixture's two-tone clips have fundamentals 200..2000 Hz and a
    # 2.5x harmonic: virtually all energy sits below 8 kHz, and the
    # 250-4000 Hz bands carry the bulk
    mid = out[(out["band_lo_hz"] >= 250) & (out["band_lo_hz"] < 4000)]["energy_frac"].sum()
    assert mid > 0.5


def test_orientation_histogram_planted_gradients(ray_session):
    """Known gradient fields land in the expected octants."""
    import pyarrow as pa

    from plasmap_ray.stages.media import OrientationHistogram

    # horizontal ramp: gray rises with x -> gx > 0, gy = 0 -> octant 0
    w = h = 16
    ramp = np.tile(np.arange(w, dtype=np.uint8) * 3, (h, 1))
    px = np.stack([ramp] * 3, axis=2)
    batch = pa.table(
        {
            "image_id": ["img-a"],
            "bytes": [px.tobytes()],
            "w": [w],
            "h": [h],
            "fmt": ["raw"],
        }
    )
    out = OrientationHistogram()(batch)
    interior = (w - 2) * (h - 2)
    assert out["o0"].to_pylist() == [interior]
    assert sum(out[f"o{k}"].to_pylist()[0] for k in range(1, 8)) == 0

    # vertical ramp DOWN: gy < 0, gx = 0 -> |gy| > |gx| -> octant 6
    rampv = np.tile((255 - np.arange(h, dtype=np.int64) * 3).astype(np.uint8)[:, None], (1, w))
    pxv = np.stack([rampv] * 3, axis=2)
    batch2 = pa.table(
        {
            "image_id": ["img-b"],
            "bytes": [pxv.tobytes()],
            "w": [w],
            "h": [h],
            "fmt": ["raw"],
        }
    )
    out2 = OrientationHistogram()(batch2)
    assert out2["o6"].to_pylist() == [interior]

    # flat fill: every interior gradient is zero
    flat = np.full((h, w, 3), 7, dtype=np.uint8)
    batch3 = pa.table(
        {
            "image_id": ["img-c"],
            "bytes": [flat.tobytes()],
            "w": [w],
            "h": [h],
            "fmt": ["raw"],
        }
    )
    out3 = OrientationHistogram()(batch3)
    assert out3["n_flat"].to_pylist() == [interior]
    assert sum(out3[f"o{k}"].to_pylist()[0] for k in range(8)) == 0


def test_orientation_histogram_pipeline_columns(ray_session):
    from plasmap_ray.pipelines import images as I

    out = I.image_orientation_histogram("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0 and out["ok"].all()
    oc = out[[f"o{k}" for k in range(8)]].to_numpy()
    assert (oc.sum(axis=1) == out["n_grad"].to_numpy()).all()
    assert (oc.argmax(axis=1) == out["dominant"].to_numpy()).all()
    assert ((out["anisotropy"] >= 1 / 8 - 1e-9) & (out["anisotropy"] <= 1.0)).all()


def test_haar_energy_parseval_and_planted(ray_session):
    """Haar energies satisfy the 2x2-block Parseval identity and known
    patterns land in the expected subbands."""
    import pyarrow as pa

    from plasmap_ray.stages.media import HaarEnergy

    w = h = 16
    # vertical stripes of period 2: a!=b, c!=d alternating -> pure LH
    col = (np.arange(w) % 2) * 85
    stripes = np.tile(col.astype(np.uint8), (h, 1))
    px = np.stack([stripes] * 3, axis=2)
    batch = pa.table(
        {"image_id": ["img-s"], "bytes": [px.tobytes()], "w": [w], "h": [h], "fmt": ["raw"]}
    )
    out = HaarEnergy()(batch)
    assert out["e_lh"].to_pylist()[0] > 0
    assert out["e_hl"].to_pylist()[0] == 0 and out["e_hh"].to_pylist()[0] == 0

    # Parseval: 4*sum(g^2) == e_ll + e_lh + e_hl + e_hh (orthogonal rows, |row|^2 = 4)
    rng = np.random.default_rng(7)
    rand = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    batch2 = pa.table(
        {"image_id": ["img-r"], "bytes": [rand.tobytes()], "w": [w], "h": [h], "fmt": ["raw"]}
    )
    out2 = HaarEnergy()(batch2)
    g = rand.astype(np.int64).sum(axis=2)
    total = sum(out2[k].to_pylist()[0] for k in ("e_ll", "e_lh", "e_hl", "e_hh"))
    assert total == 4 * int((g * g).sum())


def test_audio_fingerprint_pairs_match_set_intersections(ray_session):
    """Every reported pair's n_shared equals the exact landmark-set
    intersection, and identical signals fingerprint identically."""
    import pyarrow.parquet as pq2

    from plasmap_ray.pipelines import multimodal
    from plasmap_ray.pipelines.multimodal import FP_MIN_SHARED, _fp_clip_hashes
    from plasmap_ray.stages.media import decode_wav_pcm16

    out = multimodal.audio_fingerprint("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    t = pq2.read_table(multimodal.audio_path_for("/root/testdata/sf0.001"))
    sets = {}
    for i in range(t.num_rows):
        sr, s = decode_wav_pcm16(t["bytes"][i].as_py())
        sets[t["media_id"][i].as_py()] = set(_fp_clip_hashes(s, sr).tolist())
    for r in out.itertuples():
        assert len(sets[r.media_a] & sets[r.media_b]) == r.n_shared >= FP_MIN_SHARED

    # identical samples -> identical fingerprints (self-match is total)
    sr = 8000
    tt = np.arange(4000) / sr
    s16 = np.clip(np.round(0.6 * np.sin(2 * np.pi * 440 * tt) * 32767), -32768, 32767).astype(np.int16)
    h1 = _fp_clip_hashes(s16, sr)
    h2 = _fp_clip_hashes(s16.copy(), sr)
    assert len(h1) > 0 and np.array_equal(h1, h2)


def test_video_shot_segmentation_planted_cut(ray_session):
    """A clip with one huge inter-frame jump yields exactly one cut
    and the right shot lengths."""
    import pyarrow as pa

    from plasmap_ray.pipelines import multimodal

    w = h = 8
    fb = w * h * 3
    smooth = [np.full(fb, 10 + f, dtype=np.uint8) for f in range(4)]  # SAD = fb each step
    jump = np.full(fb, 200, dtype=np.uint8)  # SAD = fb*190 >> 1.5*med
    frames = smooth[:3] + [jump, jump.copy() + 1]
    payload = b"".join(f.tobytes() for f in frames)
    batch = pa.table(
        {
            "media_id": ["vid-x"],
            "bytes": [payload],
            "w": [w],
            "h": [h],
            "n_frames": [len(frames)],
            "fmt": ["fake-raw"],
        }
    )
    assert batch.num_rows == 1
    from plasmap_ray.pipelines.multimodal import SHOT_CUT_DEN, SHOT_CUT_NUM

    arr = np.frombuffer(payload, dtype=np.uint8).reshape(len(frames), fb).astype(np.int16)
    sads = np.abs(np.diff(arr, axis=0)).sum(axis=1, dtype=np.int64)
    med = int(np.partition(sads, (len(sads) - 1) // 2)[(len(sads) - 1) // 2])
    cuts = sads * SHOT_CUT_DEN > SHOT_CUT_NUM * med
    assert cuts.tolist() == [False, False, True, False]
    # pipeline on the fixture corpus: ok everywhere, shot algebra holds
    res = multimodal.video_shot_segmentation("/root/testdata/sf0.001").to_pandas()
    assert res["ok"].all()
    assert (res["n_shots"] == res["n_cuts"] + 1).all()
    assert (res["longest_shot"] <= res["n_frames"]).all()
    assert (res["longest_shot"] >= 1).all()


def test_dynamic_range_known_fields(ray_session):
    """Rank selection matches numpy percentile-by-sorting on planted
    fields, including the degenerate flat image."""
    import pyarrow as pa

    from plasmap_ray.stages.media import DynamicRange

    w = h = 16
    flat = np.full((h, w, 3), 9, dtype=np.uint8)
    ramp = np.tile(np.arange(w, dtype=np.uint8), (h, 1))
    rampx = np.stack([ramp] * 3, axis=2)
    batch = pa.table(
        {
            "image_id": ["img-flat", "img-ramp"],
            "bytes": [flat.tobytes(), rampx.tobytes()],
            "w": [w, w],
            "h": [h, h],
            "fmt": ["raw", "raw"],
        }
    )
    out = DynamicRange()(batch)
    # flat: all stats identical
    assert out["g_min"].to_pylist()[0] == out["g_max"].to_pylist()[0] == 27
    assert out["p05"].to_pylist()[0] == out["p95"].to_pylist()[0] == 27
    # ramp: exact ranks against sorted selection
    g = sorted(rampx.astype(np.int64).sum(axis=2).ravel().tolist())
    npx = len(g)
    assert out["p05"].to_pylist()[1] == g[max(1, -(-npx * 5 // 100)) - 1]
    assert out["p95"].to_pylist()[1] == g[max(1, -(-npx * 95 // 100)) - 1]
    assert out["g_min"].to_pylist()[1] == 0 and out["g_max"].to_pylist()[1] == 45


def test_phash_scale_stability_identity_and_bounds(ray_session):
    """An image that IS its own 8x8 thumbnail has distance 0; corpus
    distances are valid Hamming values."""
    from plasmap_ray import codecs
    from plasmap_ray.pipelines import images as I
    from plasmap_ray.stages.media import resize_nearest

    tiny = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    assert codecs.phash64(tiny) == codecs.phash64(resize_nearest(tiny, 8, 8))

    out = I.phash_scale_stability("/root/testdata/sf0.001").to_pandas()
    assert out["ok"].all()
    assert ((out["hamming"] >= 0) & (out["hamming"] <= 64)).all()
    # per-row: hamming equals the XOR popcount of the reported hashes
    x = (out["phash_full"].to_numpy().astype(np.uint64) ^ out["phash_thumb"].to_numpy().astype(np.uint64))
    pop = np.array([bin(int(v)).count("1") for v in x])
    assert (pop == out["hamming"].to_numpy()).all()


def test_audio_dedup_manifest_covers_all_and_keeps_min(ray_session):
    import pyarrow.parquet as pq2

    from plasmap_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    out = multimodal.audio_dedup_manifest(sf).to_pandas()
    t = pq2.read_table(multimodal.audio_path_for(sf), columns=["media_id"])
    assert len(out) == t.num_rows  # every clip present exactly once
    assert out["media_id"].is_unique
    # keep iff the clip IS its cluster representative
    nums = out["media_id"].str.split("-").str[1].astype(int)
    assert (out["keep"] == (out["cluster"] == nums)).all()
    # each cluster keeps exactly one representative
    assert (out.groupby("cluster")["keep"].sum() == 1).all()
    # matched pairs share a cluster
    pairs = multimodal.audio_fingerprint(sf).to_pandas()
    cl = dict(zip(out["media_id"], out["cluster"]))
    for r in pairs.itertuples():
        assert cl[r.media_a] == cl[r.media_b]


def test_blockiness_flags_block_coded_content(ray_session):
    """A synthetic 8x8-constant-block image maximizes the ratio (all
    variation at boundaries); a smooth ramp stays near 1; the dctq-
    coded corpus leg scores higher than the lossless legs."""
    import pyarrow as pa

    from plasmap_ray.stages.media import Blockiness

    w = h = 32
    rng = np.random.default_rng(3)
    blocks = rng.integers(0, 256, size=(4, 4), dtype=np.int64)
    blocky = np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    ramp = np.tile(np.arange(w, dtype=np.uint8), (h, 1))
    batch = pa.table(
        {
            "image_id": ["img-blocky", "img-ramp"],
            "bytes": [np.stack([blocky] * 3, 2).tobytes(), np.stack([ramp] * 3, 2).tobytes()],
            "w": [w, w],
            "h": [h, h],
            "fmt": ["raw", "raw"],
        }
    )
    out = Blockiness()(batch)
    assert out["i_sum"].to_pylist()[0] == 0  # constant inside blocks
    assert out["b_sum"].to_pylist()[0] > 0
    # ramp: identical steps everywhere -> boundary mean == interior mean
    bm = out["b_sum"].to_pylist()[1] / out["b_cnt"].to_pylist()[1]
    im = out["i_sum"].to_pylist()[1] / out["i_cnt"].to_pylist()[1]
    assert abs(bm - im) < 1e-9

    from plasmap_ray.pipelines import images as I

    res = I.image_blockiness("/root/testdata/sf0.001").to_pandas()
    assert res["ok"].all()
    med = res.groupby("fmt")["blockiness"].median()
    if "qnt8" in med.index and "raw" in med.index:
        # the quantized leg is per-pixel, not block-transform: its
        # blockiness must NOT exceed the raw leg by much
        assert med["qnt8"] < med["raw"] * 1.5


def test_saliency_centroid_planted_fields(ray_session):
    """A right-half-textured field pulls the gradient centroid right;
    the engine run's moments reproduce its own offset column."""
    import math

    from plasmap_ray.pipelines import images as I

    w = h = 32
    rng = np.random.default_rng(5)
    half = np.full((h, w), 100, dtype=np.int64)
    half[:, w // 2:] = rng.integers(0, 256, size=(h, w // 2))
    g = half * 3
    gx = np.abs(g[1:-1, 2:] - g[1:-1, :-2])
    gy = np.abs(g[2:, 1:-1] - g[:-2, 1:-1])
    m = gx + gy
    ys, xs = np.mgrid[1 : h - 1, 1 : w - 1]
    cx = (m * xs).sum() / m.sum()
    assert cx > (w - 1) / 2.0 + 3  # centroid pulled into the textured half

    res = I.image_saliency_centroid("/root/testdata/sf0.001").to_pandas()
    assert res["ok"].all() and (res["m_sum"] > 0).all()
    assert ((res["offset_norm"] >= 0) & (res["offset_norm"] <= 1.0)).all()
    # the centered-sinusoid corpus keeps its detail mass well inside
    # the frame
    assert res["offset_norm"].median() < 0.5


def test_image_otsu_separates_a_synthetic_bimodal(ray_session):
    """Otsu on a hand-built two-level image must sit between the modes,
    and the pipeline must agree with the golden on real fixtures."""
    import numpy as np

    from plasmap_ray.stages.media import OtsuThreshold
    import pyarrow as pa
    from plasmap_ray import codecs

    # synthetic: half the pixels dark (gray sum 30), half bright (600)
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, 4:, :] = 200
    px[:, :4, :] = 10
    payload = codecs.encode_image(px, "raw")
    batch = pa.table(
        {
            "image_id": pa.array(["s1"]),
            "bytes": pa.array([payload], type=pa.binary()),
            "w": pa.array([8], type=pa.int32()),
            "h": pa.array([8], type=pa.int32()),
            "fmt": pa.array(["raw"]),
        }
    )
    out = OtsuThreshold()(batch)
    t = out["threshold"][0].as_py()
    assert 30 <= t < 600
    assert out["n_fg"][0].as_py() == 32
    assert out["ok"][0].as_py()


def test_image_quadtree_flat_vs_noisy(ray_session):
    """A uniform image is one leaf; a checkerboard splits to the
    2px floor; the leaf identity 3*splits + 1 == leaves holds."""
    import numpy as np
    import pyarrow as pa

    from plasmap_ray import codecs
    from plasmap_ray.stages.media import QuadtreeCensus

    flat = np.full((16, 16, 3), 77, dtype=np.uint8)
    noisy = np.zeros((16, 16, 3), dtype=np.uint8)
    noisy[(np.arange(16)[:, None] + np.arange(16)[None, :]) % 2 == 0] = 255
    batch = pa.table(
        {
            "image_id": pa.array(["flat", "noisy"]),
            "bytes": pa.array([codecs.encode_image(flat, "raw"), codecs.encode_image(noisy, "raw")], type=pa.binary()),
            "w": pa.array([16, 16], type=pa.int32()),
            "h": pa.array([16, 16], type=pa.int32()),
            "fmt": pa.array(["raw", "raw"]),
        }
    )
    out = QuadtreeCensus()(batch).to_pandas().set_index("image_id")
    assert out.loc["flat", "n_leaves"] == 1 and out.loc["flat", "max_depth"] == 0
    # checkerboard: every 2x2 block still has variance -> splits to 2px
    # blocks (depth 3), then 2x2 blocks with all-equal? no: 2x2 of the
    # checkerboard has variance > THR and size 2 -> splits to 1px leaves
    assert out.loc["noisy", "max_depth"] == 4
    assert out.loc["noisy", "n_leaves"] == 256
    for r in out.itertuples():
        assert r.n_leaves == 3 * r.n_split + 1


def test_motion_vectors_track_a_pure_translation(ray_session):
    """A synthetic clip whose second frame is the first shifted right
    by 1 px must yield dx=+? — every interior block finds the shift
    with zero residual SAD."""
    import numpy as np
    import pyarrow as pa

    from plasmap_ray.stages.media import MotionVectors

    rng = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    f0 = (rng * 37 % 251).astype(np.uint8)
    f1 = np.roll(f0, 1, axis=1)  # shift right 1 px
    payload = f0.tobytes() + f1.tobytes()
    batch = pa.table(
        {
            "media_id": pa.array(["clip"]),
            "bytes": pa.array([payload], type=pa.binary()),
            "w": pa.array([16], type=pa.int32()),
            "h": pa.array([16], type=pa.int32()),
            "n_frames": pa.array([2], type=pa.int32()),
            "fmt": pa.array(["fake-raw"]),
        }
    )
    out = MotionVectors()(batch).to_pandas().iloc[0]
    assert out["ok"] and out["n_pairs"] == 1 and out["n_blocks"] == 16
    # interior blocks (bx >= 4): exact match at dx=-1 with SAD 0; the
    # wrapped first column makes bx=0 blocks imperfect
    assert out["n_static"] == 0
    assert out["total_best_sad"] < np.abs(f1.astype(int) - f0.astype(int)).sum()
    assert out["total_disp"] >= 12  # at least the 12 interior blocks moved by 1


def test_harris_corners_checkerboard_vs_gradient(ray_session):
    """A checkerboard has interior corners; a pure linear gradient has
    none (structure tensor is rank-1 everywhere)."""
    import numpy as np
    import pyarrow as pa

    from plasmap_ray import codecs
    from plasmap_ray.stages.media import HarrisCorners

    yy, xx = np.mgrid[0:32, 0:32]
    # +small deterministic dither: an IDEAL checkerboard produces
    # plateau ties that strict NMS (ties keep none) rejects entirely
    board = ((((yy // 8 + xx // 8) % 2) * 200) + (xx * 3 + yy * 7) % 5 * 10).astype(np.uint8)
    board = np.stack([board] * 3, axis=2)
    grad = np.clip(xx * 8, 0, 255).astype(np.uint8)
    grad = np.stack([grad] * 3, axis=2)
    batch = pa.table(
        {
            "image_id": pa.array(["board", "grad"]),
            "bytes": pa.array(
                [codecs.encode_image(board, "raw"), codecs.encode_image(grad, "raw")],
                type=pa.binary(),
            ),
            "w": pa.array([32, 32], type=pa.int32()),
            "h": pa.array([32, 32], type=pa.int32()),
            "fmt": pa.array(["raw", "raw"]),
        }
    )
    out = HarrisCorners()(batch).to_pandas().set_index("image_id")
    assert out.loc["board", "n_corners"] >= 5  # interior checker crossings
    assert out.loc["grad", "n_corners"] == 0
    assert out.loc["board", "max_r20"] > 0


def test_audio_harmonicity_flags_the_inharmonic_partial(ray_session):
    """Fixture clips carry 0.6·sin(f0) + 0.25·sin(2.5·f0): the 2.5·f0
    partial is inharmonic, so harm_frac must sit clearly below 1 but
    well above the f0-only share."""
    from plasmap_ray.pipelines import multimodal as mm

    out = mm.audio_harmonicity("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["harm_frac"] <= 1.0).all() and (out["harm_frac"] >= 0.0).all()
    # the f0 peak alone carries ~0.6^2/(0.6^2+0.25^2) ≈ 0.85 of energy
    assert (out["harm_frac"] > 0.5).all()
    assert (out["harm_frac"] < 0.999).mean() > 0.5  # the 2.5f0 partial is visible
    assert (out["f0_hz"] > 0).all()


def test_border_detect_finds_a_planted_letterbox(ray_session):
    import numpy as np
    import pyarrow as pa

    from plasmap_ray import codecs
    from plasmap_ray.stages.media import BorderDetect

    yy, xx = np.mgrid[0:24, 0:24]
    img = ((xx * 11 + yy * 5) % 200 + 40).astype(np.uint8)
    img = np.stack([img] * 3, axis=2)
    img[:3, :, :] = 0  # 3-row top letterbox
    img[-2:, :, :] = 0  # 2-row bottom
    batch = pa.table(
        {
            "image_id": pa.array(["lb"]),
            "bytes": pa.array([codecs.encode_image(img, "raw")], type=pa.binary()),
            "w": pa.array([24], type=pa.int32()),
            "h": pa.array([24], type=pa.int32()),
            "fmt": pa.array(["raw"]),
        }
    )
    out = BorderDetect()(batch).to_pandas().iloc[0]
    assert out["top"] == 3 and out["bottom"] == 2
    assert out["left"] == 0 and out["right"] == 0


def test_hough_lines_sees_a_drawn_line(ray_session):
    import numpy as np
    import pyarrow as pa

    from plasmap_ray import codecs
    from plasmap_ray.stages.media import HoughLines

    img = np.full((32, 32, 3), 30, dtype=np.uint8)
    img[16, :, :] = 250  # a strong horizontal line
    blank = np.full((32, 32, 3), 30, dtype=np.uint8)
    batch = pa.table(
        {
            "image_id": pa.array(["line", "blank"]),
            "bytes": pa.array(
                [codecs.encode_image(img, "raw"), codecs.encode_image(blank, "raw")],
                type=pa.binary(),
            ),
            "w": pa.array([32, 32], type=pa.int32()),
            "h": pa.array([32, 32], type=pa.int32()),
            "fmt": pa.array(["raw", "raw"]),
        }
    )
    out = HoughLines()(batch).to_pandas().set_index("image_id")
    assert out.loc["line", "n_lines"] >= 1
    assert out.loc["line", "best_votes"] >= 24  # most of the 32-px row votes together
    assert out.loc["blank", "n_edge_px"] == 0 and out.loc["blank", "n_lines"] == 0


def test_glcm_checkerboard_vs_flat(ray_session):
    import numpy as np
    import pyarrow as pa

    from plasmap_ray import codecs
    from plasmap_ray.stages.media import GLCMTexture

    yy, xx = np.mgrid[0:16, 0:16]
    board = (((yy + xx) % 2) * 255).astype(np.uint8)
    board = np.stack([board] * 3, axis=2)
    flat = np.full((16, 16, 3), 100, dtype=np.uint8)
    batch = pa.table(
        {
            "image_id": pa.array(["board", "flat"]),
            "bytes": pa.array(
                [codecs.encode_image(board, "raw"), codecs.encode_image(flat, "raw")],
                type=pa.binary(),
            ),
            "w": pa.array([16, 16], type=pa.int32()),
            "h": pa.array([16, 16], type=pa.int32()),
            "fmt": pa.array(["raw", "raw"]),
        }
    )
    out = GLCMTexture()(batch).to_pandas().set_index("image_id")
    # 1px checkerboard: EVERY horizontal pair crosses levels -> max contrast, zero diagonal
    assert out.loc["board", "n_diag"] == 0
    assert out.loc["board", "contrast"] == out.loc["board", "n_pairs"] * 15**2
    # flat: everything on the diagonal, zero contrast, energy = n_pairs^2
    assert out.loc["flat", "contrast"] == 0
    assert out.loc["flat", "n_diag"] == out.loc["flat", "n_pairs"]
    assert out.loc["flat", "energy"] == out.loc["flat", "n_pairs"] ** 2


def test_caption_complexity_corr_bounds(ray_session):
    from plasmap_ray.pipelines import images as img

    out = img.caption_complexity_corr("/root/testdata/sf0.001").to_pandas().iloc[0]
    assert -1.0 <= out["pearson_r"] <= 1.0
    assert out["n_images"] > 0


def test_mdctq_roundtrip_psnr_and_compression():
    """The lossy audio codec must (a) reconstruct EXACTLY (1e-10) with
    quantization disabled — the TDAC/orthonormality proof in code —
    (b) clear the 40 dB gate on adversarial white noise (the worst
    case for a transform codec), (c) actually compress tonal audio."""
    from plasmap_ray import codecs

    rng = np.random.default_rng(11)
    # (a) orthonormal basis: unquantized analysis->synthesis is exact
    x = rng.standard_normal(1000)
    frames, T = codecs._mdct_frames(x)
    c = frames @ codecs._mdct_matrix().T
    n = codecs.MDCTQ_N
    rec = c @ codecs._mdct_matrix()
    y = np.zeros((T + 1) * n)
    for half in (0, 1):
        y[half * n : half * n + T * n] += rec[:, half * n : (half + 1) * n].reshape(-1)
    assert np.abs(y[n : n + 1000] - x).max() < 1e-10
    assert abs((c ** 2).sum() / (x ** 2).sum() - 1.0) < 1e-12  # Parseval

    # (b) worst-case-ish inputs all clear the gate
    for L in (1, 255, 256, 4097, 16000):
        s = (rng.uniform(-1, 1, L) * 32767).astype(np.int16)
        back = codecs.decode_audio_mdctq(codecs.encode_audio_mdctq(s))
        assert codecs.audio_psnr_db(s, back) >= 40.0, L

    # (c) tonal audio (the fixture shape) compresses well
    t = np.arange(16000) / 16000.0
    tone = np.clip(np.round(0.6 * np.sin(2 * np.pi * 440 * t) * 32767), -32768, 32767).astype(np.int16)
    payload = codecs.encode_audio_mdctq(tone)
    assert len(payload) < 0.5 * tone.size * 2
    assert codecs.audio_psnr_db(tone, codecs.decode_audio_mdctq(payload)) >= 40.0

    # header guard: truncated/mismatched payload raises
    with pytest.raises(ValueError):
        codecs.decode_audio_mdctq(payload[:4] + payload[4:][: len(payload) // 2])


def test_audio_lossy_migration_all_rows_pass_gate(ray_session):
    """Every fixture clip must clear the PSNR >= 40 dB gate (the codec
    proves it worst-case; the pipeline must reproduce it distributed)."""
    import pyarrow.parquet as pq2

    from plasmap_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    out = multimodal.audio_lossy_migration(sf).to_pandas()
    n_clips = pq2.read_metadata(multimodal.audio_path_for(sf)).num_rows
    assert out["n_clips"].sum() == n_clips
    assert (out["n_clips"] == out["n_psnr40"]).all()
