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
