"""Image codec + invariant tests (input_hint: PSNR≥40dB lossy, exact PNG,
caption equality, phash stability). Pure numpy — no Spark session needed."""

from __future__ import annotations

import numpy as np
import pytest

from amazonwebcrawler_spark.functions.images import (
    decode_image,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
    hamming64,
    phash64,
    psnr,
)
from amazonwebcrawler_spark.sources import synthetic_world as world


def _pixels(seed: int, w: int = 32, h: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestPng:
    def test_roundtrip_exact(self):
        px = _pixels(1)
        assert np.array_equal(decode_png(encode_png(px)), px)

    def test_dispatch(self):
        px = _pixels(2)
        assert np.array_equal(decode_image(encode_png(px)), px)

    def test_unknown_container_raises(self):
        with pytest.raises(NotImplementedError):
            decode_image(b"GIF89a....")


class TestJpegStandin:
    def test_lossy_but_psnr_above_40(self):
        px = _pixels(3, 64, 48)
        out = decode_jpeg(encode_jpeg(px))
        assert out.shape == px.shape
        assert not np.array_equal(out, px)  # genuinely lossy
        assert psnr(px, out) >= 40.0  # the input_hint invariant

    def test_deterministic(self):
        px = _pixels(4)
        assert encode_jpeg(px) == encode_jpeg(px)


class TestPhash:
    def test_stable_and_robust_to_quantization(self):
        px = _pixels(5, 64, 48).astype(np.int32)
        # smooth image: gradient keeps phash meaningful under quantization
        yy, xx = np.mgrid[0:48, 0:64]
        smooth = np.clip((xx * 4)[..., None] + px // 8, 0, 255).astype(np.uint8)
        h1 = phash64(smooth)
        h2 = phash64(decode_jpeg(encode_jpeg(smooth)))
        assert hamming64(h1, h2) <= 6  # quantization barely moves aHash

    def test_differs_across_images(self):
        assert phash64(_pixels(6)) != phash64(_pixels(7))


class TestWorldImages:
    def test_image_record_invariants(self):
        for i in range(1, 9):
            asin = world.asin_for("yoga mat", 1, i)
            rec = world.image_record(asin)
            px = decode_image(rec["bytes"])
            assert (px.shape[1], px.shape[0]) == (rec["w"], rec["h"])
            if rec["fmt"] == "png":
                assert np.array_equal(px, rec["_pixels"])  # lossless
            else:
                assert psnr(rec["_pixels"], px) >= 40.0  # lossy invariant
            assert rec["caption"] == world.detail_page(asin)["title"]
            # canonical phash = phash of the decoded bytes (lossy-safe)
            assert rec["phash"] == phash64(px)
