"""Image codec + fidelity-gate tests (driver input_hint invariants)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from plasmap_ray import codecs, fixtures


def _rand_img(seed, h=24, w=36):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=25, deadline=None)
def test_lossless_roundtrip(seed):
    img = _rand_img(seed)
    for fmt in ("raw", "pngz"):
        back = codecs.decode_image(codecs.encode_image(img, fmt), 36, 24, fmt)
        assert np.array_equal(img, back)


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=25, deadline=None)
def test_lossy_psnr_gate(seed):
    img = _rand_img(seed)
    back = codecs.decode_image(codecs.encode_image(img, "qnt8"), 36, 24, "qnt8")
    assert codecs.psnr_db(img, back) >= 40.0


def test_unknown_format_raises():
    img = _rand_img(0)
    with pytest.raises(ValueError):
        codecs.encode_image(img, "jpeg")
    with pytest.raises(ValueError):
        codecs.decode_image(b"", 1, 1, "jpeg")


def test_phash_stability_and_near_dup():
    img = _rand_img(3, 32, 32)
    assert codecs.phash64(img) == codecs.phash64(img.copy())
    # tiny perturbation -> small hamming distance
    noisy = np.clip(img.astype(np.int16) + np.random.default_rng(4).integers(-2, 3, img.shape), 0, 255).astype(np.uint8)
    d = codecs.hamming64(codecs.phash64(img), codecs.phash64(noisy))[0]
    assert d <= 8
    # different image -> large distance (probabilistically ~32)
    other = _rand_img(99, 32, 32)
    assert codecs.hamming64(codecs.phash64(img), codecs.phash64(other))[0] > 8


def test_popcount():
    vals = np.array([0, 1, 3, 255, -1], dtype=np.int64)
    assert codecs.popcount64(vals).tolist() == [0, 1, 2, 8, 64]


def test_images_table_fidelity_gates():
    """FIXTURES.md §5: every row's payload decodes to reference pixels
    (byte-exact for lossless, PSNR>=40 for qnt8); captions intact."""
    t = fixtures.make_images(300)
    for j in range(t.num_rows):
        image_id = t["image_id"][j].as_py()
        w, h, fmt = t["w"][j].as_py(), t["h"][j].as_py(), t["fmt"][j].as_py()
        px = codecs.decode_image(t["bytes"][j].as_py(), w, h, fmt)
        ref = fixtures.reference_pixels(image_id, w, h)
        if fmt == "qnt8":
            assert codecs.psnr_db(px, ref) >= 40.0
        else:
            assert np.array_equal(px, ref)
        assert t["caption"][j].as_py().startswith("a photo of ")


def test_planted_near_dups_share_phash():
    t = fixtures.make_images(300)
    ph = t["phash"].to_numpy()
    for i in range(fixtures.NEAR_DUP_STRIDE, 300, fixtures.NEAR_DUP_STRIDE):
        assert ph[i - 1] == ph[i - 2]  # row i duplicates row i-1 (1-based ids)


def test_dctq_psnr_gate_by_construction():
    """The dctq step table proves PSNR >= 40 dB on ANY input — check on
    adversarial content (noise, checkerboard, hard edges), and that the
    codec genuinely loses information (it is not secretly lossless)."""
    rng = np.random.default_rng(0)
    cases = [
        rng.integers(0, 256, (37, 53, 3), dtype=np.uint8),
        np.where(rng.random((40, 41, 3)) > 0.5, 255, 0).astype(np.uint8),
        (np.linspace(0, 255, 48 * 48).reshape(48, 48)[..., None].repeat(3, axis=2)).astype(np.uint8),
    ]
    any_lossy = False
    for img in cases:
        payload = codecs.encode_image(img, "dctq")
        out = codecs.decode_image(payload, img.shape[1], img.shape[0], "dctq")
        assert codecs.psnr_db(img, out) >= 40.0
        any_lossy |= not np.array_equal(img, out)
    assert any_lossy


def test_dctq_compresses_structure():
    """Smooth content must compress well below raw (the transform
    concentrates energy in few coefficients; zlib removes the zeros)."""
    img = (np.linspace(0, 255, 64 * 64).reshape(64, 64)[..., None].repeat(3, axis=2)).astype(np.uint8)
    payload = codecs.encode_image(img, "dctq")
    assert len(payload) < img.nbytes // 10


def test_dctq_fixture_corpus_distribution():
    """Across the fixture corpus: every image passes the 40 dB gate and
    a majority are genuinely lossy under dctq."""
    t = fixtures.make_images(120)
    n_lossy = 0
    for j in range(t.num_rows):
        w, h, fmt = t["w"][j].as_py(), t["h"][j].as_py(), t["fmt"][j].as_py()
        px = codecs.decode_image(t["bytes"][j].as_py(), w, h, fmt)
        payload = codecs.encode_image(px, "dctq")
        back = codecs.decode_image(payload, w, h, "dctq")
        assert codecs.psnr_db(px, back) >= 40.0
        n_lossy += int(not np.array_equal(px, back))
    assert n_lossy > 60


# --- property-based (hypothesis) -------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    style=st.sampled_from(["noise", "flat", "gradient", "binary"]),
)
def test_dctq_psnr_gate_property(w, h, seed, style):
    """PROPERTY: for any image size (including non-multiples of 8 down
    to 1x1) and any content class, dctq round-trips above the 40 dB
    gate — the worst-case-MSE proof, checked empirically."""
    rng = np.random.default_rng(seed)
    if style == "noise":
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    elif style == "flat":
        img = np.full((h, w, 3), rng.integers(0, 256), dtype=np.uint8)
    elif style == "gradient":
        img = (np.linspace(0, 255, h * w).reshape(h, w)[..., None].repeat(3, axis=2)).astype(np.uint8)
    else:
        img = np.where(rng.random((h, w, 3)) > 0.5, 255, 0).astype(np.uint8)
    payload = codecs.encode_image(img, "dctq")
    out = codecs.decode_image(payload, w, h, "dctq")
    assert out.shape == (h, w, 3)
    assert codecs.psnr_db(img, out) >= 40.0


def test_ssim_identity_and_bounds():
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(32, 40, 3), dtype=np.uint8)
    assert codecs.ssim8x8(px, px) == 1.0
    # lossy round trip: structurally close but not identical
    rt = codecs.decode_image(codecs.encode_image(px, "dctq"), 40, 32, "dctq")
    s = codecs.ssim8x8(px, rt)
    assert 0.0 < s <= 1.0
    # structured content survives dctq far better than noise floor 0
    smooth = np.tile(np.linspace(0, 255, 40, dtype=np.uint8)[None, :, None], (32, 1, 3))
    s2 = codecs.ssim8x8(smooth, codecs.decode_image(codecs.encode_image(smooth, "dctq"), 40, 32, "dctq"))
    assert s2 > 0.95


def test_ssim_detects_structural_damage():
    """A constant-luma shift barely moves SSIM; shuffling 8x8 blocks
    destroys it — the structure-vs-energy property PSNR lacks."""
    rng = np.random.RandomState(12)
    base = rng.randint(40, 200, size=(32, 32, 3), dtype=np.uint8)
    shifted = np.clip(base.astype(np.int16) + 10, 0, 255).astype(np.uint8)
    blocks = base.reshape(4, 8, 4, 8, 3).transpose(0, 2, 1, 3, 4).reshape(16, 8, 8, 3)
    perm = rng.permutation(16)
    shuffled = blocks[perm].reshape(4, 4, 8, 8, 3).transpose(0, 2, 1, 3, 4).reshape(32, 32, 3)
    assert codecs.ssim8x8(base, shifted) > 0.9
    assert codecs.ssim8x8(base, shuffled) < 0.5


def test_image_ssim_audit_vs_golden(ray_session):
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import images

    sf = "/root/testdata/sf0.001"
    got = images.image_ssim_audit(sf).to_pandas().reset_index(drop=True)
    exp = pq.read_table(golden.ssim_audit_path(sf)).to_pandas()
    assert got.equals(exp)
    # the dctq quantizer keeps structure on every fixture format
    assert (got["mean_ssim"] > 0.8).all()
