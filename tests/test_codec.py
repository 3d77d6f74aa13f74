"""Pure-python codec tests: PNG round-trip, lossy PSNR invariant, dHash
discrimination, thumbnails, fixture duplicate structure."""

import numpy as np
import pytest

from auto_archiver_spark.functions import codec as C
from auto_archiver_spark.sources import fixture as FX


def test_png_roundtrip_lossless():
    px = FX.image_pixels(7, 128, 96)
    assert np.array_equal(C.png_decode(C.png_encode(px)), px)


def test_png_signature():
    data = C.png_encode(FX.image_pixels(1, 64, 64))
    assert data.startswith(b"\x89PNG\r\n\x1a\n") and data.endswith(
        b"IEND" + b"\xae\x42\x60\x82"
    )


def test_lossy_psnr_invariant():
    """BASELINE.json input_hint: PSNR >= 40 dB for lossy formats."""
    for i in (0, 3, 11):
        px = FX.image_pixels(i, 256, 96)
        back = C.decode_image(C.lossy_encode(px))
        assert C.psnr(px, back) >= 40.0


def test_psnr_inf_on_identical():
    px = FX.image_pixels(2, 64, 64)
    assert C.psnr(px, px) == float("inf")


def test_dhash_properties():
    hashes = [
        C.dhash64(FX.image_pixels(i, FX._WIDTHS[i % 4], FX._HEIGHTS[(i // 4) % 4]))
        for i in range(16)
    ]
    assert len(set(hashes)) == 16  # unlike images get distinct hashes
    px = FX.image_pixels(3, 512, 64)
    noisy = px.copy()
    noisy[0, 0] = (noisy[0, 0].astype(int) + 3).clip(0, 255)
    assert C.hamming64(C.dhash64(px), C.dhash64(noisy)) <= 3  # near-dup stays close
    lossy = C.decode_image(C.lossy_encode(px))
    assert C.hamming64(C.dhash64(px), C.dhash64(lossy)) <= 3
    assert all(-(2**63) <= h < 2**63 for h in hashes)  # int64 range (schema)


def test_thumbnail_shape():
    px = FX.image_pixels(5, 512, 384)
    th = C.thumbnail(px, 64)
    assert max(th.shape[:2]) == 64 and th.shape[2] == 3
    small = FX.image_pixels(5, 32, 32)
    assert C.thumbnail(small, 64) is small


@pytest.mark.parametrize("fmt", ["png", "jpeg"])
def test_encode_decode_both_formats(fmt):
    px = FX.image_pixels(9, 128, 64)
    back = C.decode_image(C.encode_image(px, fmt))
    if fmt == "png":
        assert np.array_equal(back, px)
    else:
        assert C.psnr(px, back) >= 40.0


def test_fixture_duplicate_structure():
    """i%97==96 -> exact dup of i-1; i%61==60 -> near-dup (phash-equal)."""
    a, b = FX.image_record(95), FX.image_record(96)
    assert a["bytes"] == b["bytes"] and a["image_id"] != b["image_id"]
    c, d = FX.image_record(59), FX.image_record(60)
    assert c["bytes"] != d["bytes"]
    assert C.hamming64(c["phash"], d["phash"]) <= 3
    assert c["caption"] == d["caption"]


def test_fixture_determinism():
    r1, r2 = FX.image_record(42), FX.image_record(42)
    assert r1 == r2


def test_pdq256_properties():
    """Spec-following PDQ-256 (F3 upgrade): balanced bits (median threshold),
    locality under small perturbation, distance across distinct images,
    robustness to uniform brightness shift (DCT AC coefficients are
    brightness-invariant; the median moves with them)."""
    import numpy as np

    from auto_archiver_spark.functions.codec import hamming256, pdq256

    rng = np.random.default_rng(7)

    # Natural-ish test images at a realistic size: the published Jarosz
    # window is ceil(dim/128), so 384x512 exercises the filter. The images
    # must be DCT-non-degenerate — a piecewise-linear/constant synthetic
    # leaves >half the 16x16 DCT block exactly at the median, so noise flips
    # tie-bits arbitrarily (real PDQ has the identical property). Sinusoid
    # mixtures spread the spectrum like photographs do.
    def sinusoid_image(freqs):
        y, x = np.mgrid[0:384, 0:512].astype(np.float64)
        img = np.zeros((384, 512, 3))
        for c in range(3):
            f = sum(amp * np.cos((ax * x + ay * y) / (per + step * c))
                    for amp, ax, ay, per, step in freqs)
            img[:, :, c] = 128 + f
        return np.clip(img, 0, 255).astype(np.uint8)

    base = sinusoid_image(
        [(40, 1, 0, 17, 7), (35, 0, 1, 23, 5), (30, 1, 1, 31, 3), (25, 1, -2, 41, 11)]
    )

    h0, q0 = pdq256(base)
    assert len(h0) == 64 and 0 <= q0 <= 100
    # median threshold -> balanced bit population
    ones = bin(int(h0, 16)).count("1")
    assert 100 <= ones <= 156
    # deterministic
    assert pdq256(base)[0] == h0
    # tiny noise -> small hamming distance
    noisy = np.clip(base.astype(np.int16) + rng.integers(-2, 3, base.shape), 0, 255
                    ).astype(np.uint8)
    assert hamming256(h0, pdq256(noisy)[0]) <= 24
    # uniform brightness shift -> near-identical hash (AC coefficients are
    # shift-invariant; the residual bits come from saturation clipping)
    bright = np.clip(base.astype(np.int16) + 10, 0, 255).astype(np.uint8)
    assert hamming256(h0, pdq256(bright)[0]) <= 32
    # a different structured image -> distance near 128
    other = sinusoid_image([(45, 1, 0, 13, 9), (30, 0, 1, 19, 6), (28, 2, 1, 37, 4)])
    assert hamming256(h0, pdq256(other)[0]) >= 60
