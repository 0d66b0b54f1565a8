"""Image codec + invariant tests (input_hint: PSNR≥40dB lossy, exact PNG,
caption equality, phash stability). Mostly pure numpy; the quadrant
near-dup vote classes drive the Spark operator end to end."""

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


class TestQualityStats:
    def test_planted_analytics(self):
        import math

        from amazonwebcrawler_spark.functions.images import quality_stats

        flat = quality_stats(np.full((32, 32, 3), 128, dtype=np.uint8))
        assert flat["contrast_micro"] == 0 and flat["luma_entropy_micro"] == 0
        # mean milli-luma 128_000 / 255_000 in micro, floor-div exact
        assert flat["brightness_micro"] == (128_000 * 1_000_000) // 255_000 == 501_960
        assert flat["is_low_quality"]  # contrast-free placeholder tile

        stripe = np.zeros((32, 32, 3), dtype=np.uint8)
        stripe[::2, :, :] = 255  # 50/50 black/white rows: exact closed-form stats
        s = quality_stats(stripe)
        assert s["brightness_micro"] == 500_000 and s["contrast_micro"] == 500_000
        assert s["luma_entropy_micro"] == round(math.log(2) * 1_000_000) == 693_147
        assert not s["is_low_quality"]

        tiny = quality_stats(np.full((4, 12, 3), 200, dtype=np.uint8))
        assert tiny["is_low_quality"] and (tiny["w"], tiny["h"]) == (12, 4)
        assert tiny["aspect_micro"] == 3_000_000

    def test_kernel_quarantines_undecodable(self, spark):
        from amazonwebcrawler_spark.functions.images import (
            QUALITY_SCHEMA,
            encode_png,
            quality_stats_kernel,
        )

        rows = [
            ("ok", bytearray(encode_png(_pixels(3)))),
            ("bad", bytearray(b"NOTANIMAGE")),
        ]
        df = spark.createDataFrame(rows, "image_id string, bytes binary")
        got = {
            r.image_id: r
            for r in df.repartition(2)
            .mapInPandas(quality_stats_kernel(), QUALITY_SCHEMA)
            .collect()
        }
        assert got["bad"].is_low_quality and got["bad"].brightness_micro is None
        assert got["ok"].brightness_micro is not None and got["ok"].contrast_micro >= 0


class TestAspectBuckets:
    def test_planted_assignments(self, spark):
        """Analytic cases: exact square → bucket 0 identity; a 2:1 image is
        EXACTLY ln(6/5) from both the 5:3 and 12:5 buckets (ln2−ln(5/3) =
        ln(12/5)−ln2), so the tie must break to the lower bucket_id; a wide
        100×30 image covers (96,40) via resize (134,40), crop (19,0)."""
        from amazonwebcrawler_spark.operators.images_io import aspect_buckets

        df = spark.createDataFrame(
            [("sq", 64, 64), ("two2one", 90, 45), ("wide", 100, 30)],
            "image_id string, w int, h int",
        )
        got = {r.image_id: r for r in aspect_buckets(df).collect()}
        sq = got["sq"]
        assert (sq.bucket_w, sq.bucket_h, sq.resize_w, sq.resize_h) == (64, 64, 64, 64)
        assert (sq.crop_x, sq.crop_y) == (0, 0)
        assert got["two2one"].bucket_id == 1  # (80,48) beats (96,40) on the tie
        wide = got["wide"]
        assert (wide.bucket_w, wide.bucket_h) == (96, 40)
        assert (wide.resize_w, wide.resize_h) == (134, 40)  # ceil(100*40/30)=134
        assert (wide.crop_x, wide.crop_y) == (19, 0)

    def test_cover_and_crop_invariants(self, spark):
        """For arbitrary dims: the resize always covers the bucket, crops
        are non-negative and centered, and the cropped window is exactly
        the bucket."""
        from amazonwebcrawler_spark.operators.images_io import aspect_buckets

        rows = [(f"i{k}", 8 + (k * 13) % 120, 8 + (k * 29) % 97) for k in range(200)]
        df = spark.createDataFrame(rows, "image_id string, w int, h int")
        for r in aspect_buckets(df).collect():
            assert r.resize_w >= r.bucket_w and r.resize_h >= r.bucket_h
            assert r.crop_x == (r.resize_w - r.bucket_w) // 2 >= 0
            assert r.crop_y == (r.resize_h - r.bucket_h) // 2 >= 0
            # binding axis scales exactly to the bucket (cover semantics)
            assert r.resize_w == r.bucket_w or r.resize_h == r.bucket_h

    def test_drops_nonpositive_dims(self, spark):
        from amazonwebcrawler_spark.operators.images_io import aspect_buckets

        df = spark.createDataFrame(
            [("ok", 64, 64), ("zero", 0, 10), ("neg", 12, -3)],
            "image_id string, w int, h int",
        )
        assert [r.image_id for r in aspect_buckets(df).collect()] == ["ok"]


class TestImagePipeline:
    def test_stage_precedence_and_single_crossing(self, spark):
        """Two identical flat tiles are near-dups AND low quality — the
        quality gate must claim them first (dedup never sees them); corrupt
        bytes land in 'invalid'; a (master, re-encode) pair keeps the
        bigger PNG master; the k=3 variant survives as its own group. The
        returned plan contains NO MapInPandas node: the fused curate kernel
        already ran behind the eager localCheckpoint — one Python crossing
        for the whole cascade."""
        import io
        from contextlib import redirect_stdout

        from amazonwebcrawler_spark.functions.images import encode_png
        from amazonwebcrawler_spark.operators.images_io import image_pipeline
        from amazonwebcrawler_spark.sources import synthetic_world as world

        base = world.block_image_record("tpipe-0")
        dup = world.block_image_record("tpipe-0", flip_cells=1, fmt="jpeg")
        solo = world.block_image_record("tpipe-1", flip_cells=3, fmt="jpeg")
        flat = encode_png(np.full((32, 32, 3), 128, dtype=np.uint8))
        rows = [
            (base["image_id"], bytearray(base["bytes"])),
            ("tpipe-0-v", bytearray(dup["bytes"])),
            ("tpipe-1-solo", bytearray(solo["bytes"])),
            ("flat-a", bytearray(flat)),
            ("flat-b", bytearray(flat)),
            ("corrupt", bytearray(b"xx")),
        ]
        df = spark.createDataFrame(rows, "image_id string, bytes binary").repartition(3)
        out = image_pipeline(df, max_hamming=2)
        got = {r.image_id: r for r in out.collect()}
        assert got["corrupt"].stage == "invalid"
        assert got["flat-a"].stage == "low_quality" and got["flat-b"].stage == "low_quality"
        assert got[base["image_id"]].stage == "kept"  # bigger PNG master wins
        assert got["tpipe-0-v"].stage == "dup_drop"
        assert got["tpipe-1-solo"].stage == "kept"  # k=3 exceeds hamming<=2
        # bucket fields only on kept rows; 32x32 -> square bucket identity
        assert got["tpipe-0-v"].bucket_id is None and got["corrupt"].bucket_id is None
        k = got[base["image_id"]]
        assert (k.bucket_id, k.bucket_w, k.bucket_h) == (0, 64, 64)
        assert (k.resize_w, k.resize_h, k.crop_x, k.crop_y) == (64, 64, 0, 0)
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        assert "MapInPandas" not in buf.getvalue()


class TestPatchGrid:
    def test_flat_and_half_closed_form(self, spark):
        """Flat tile: every patch flat at the exact integer means; aligned
        half-split: black flats left, white flats right."""
        import numpy as np

        from amazonwebcrawler_spark.functions.images import patch_grid_stats

        flat = np.full((16, 16, 3), 77, dtype=np.uint8)
        ps = patch_grid_stats(flat, grid=4)
        assert len(ps) == 16
        assert all(
            p["is_flat"] and p["mean_g_milli"] == 77_000 and p["contrast_micro"] == 0
            and p["luma_micro"] == (77_000 * 1_000_000) // 255_000
            and (p["px_w"], p["px_h"]) == (4, 4)
            for p in ps
        )
        half = np.zeros((8, 8, 3), dtype=np.uint8)
        half[:, 4:] = 255
        hs = {(p["patch_row"], p["patch_col"]): p for p in patch_grid_stats(half, grid=4)}
        for (r, c), p in hs.items():
            assert p["is_flat"]
            assert p["luma_micro"] == (1_000_000 if c >= 2 else 0), (r, c, p)

    def test_uneven_dims_partition_exactly(self, spark):
        """10×7 image, grid 4: patch widths/heights are the integer-boundary
        remainder distribution and tile the image exactly; global luma sum
        is conserved across patches."""
        import numpy as np

        from amazonwebcrawler_spark.functions.images import patch_grid_stats

        rng_free = (np.arange(10 * 7 * 3, dtype=np.uint8).reshape(7, 10, 3) * 37) % 251
        ps = patch_grid_stats(rng_free.astype(np.uint8), grid=4)
        widths = sorted({p["px_w"] for p in ps})
        heights = sorted({p["px_h"] for p in ps})
        assert sum(p["px_w"] for p in ps if p["patch_row"] == 0) == 10
        assert sum(p["px_h"] for p in ps if p["patch_col"] == 0) == 7
        assert widths == [2, 3] and heights == [1, 2]

    def test_kernel_skips_undecodable_and_fans_out(self, spark):
        import numpy as np

        from amazonwebcrawler_spark.functions.images import (
            PATCH_SCHEMA,
            encode_png,
            patch_stats_kernel,
        )

        rows = [
            ("ok", bytearray(encode_png(np.full((8, 8, 3), 10, dtype=np.uint8)))),
            ("bad", bytearray(b"NOTANIMAGE")),
        ]
        df = spark.createDataFrame(rows, "image_id string, bytes binary")
        got = df.repartition(2).mapInPandas(patch_stats_kernel(4), PATCH_SCHEMA).collect()
        assert len(got) == 16 and {r.image_id for r in got} == {"ok"}

    def test_small_image_repeat_policy(self, spark):
        """A 2×2 image repeats up to the 4×4 grid — every patch is 1×1 and
        carries the repeated pixel's exact channel means."""
        import numpy as np

        from amazonwebcrawler_spark.functions.images import patch_grid_stats

        tiny = np.array(
            [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]],
            dtype=np.uint8,
        )
        ps = {(p["patch_row"], p["patch_col"]): p for p in patch_grid_stats(tiny, grid=4)}
        assert len(ps) == 16 and all(
            (p["px_w"], p["px_h"]) == (1, 1) and p["is_flat"] for p in ps.values()
        )
        # top-left quadrant of the repeated image is pixel (0,0)
        assert ps[(0, 0)]["mean_r_milli"] == 10_000
        assert ps[(3, 3)]["mean_b_milli"] == 120_000


class TestQuadrantPhash:
    def test_quadrants_are_local(self):
        """Perturbing one quadrant's pixels changes ONLY that quadrant's
        hash — the locality the crop-dedup vote rides on."""
        from amazonwebcrawler_spark.functions.images import quadrant_phashes

        px = world.block_image_record("qp-loc")["bytes"]
        px = decode_image(px)
        base = quadrant_phashes(px)
        var = px.copy()
        var[20:28, 4:12] = 255 - var[20:28, 4:12]  # inside BL quadrant (q2)
        got = quadrant_phashes(var)
        assert got[0] == base[0] and got[1] == base[1] and got[3] == base[3]
        assert got[2] != base[2]

    def test_identical_images_all_quadrants_zero(self):
        from amazonwebcrawler_spark.functions.images import quadrant_phashes

        px = decode_image(world.block_image_record("qp-id")["bytes"])
        a, b = quadrant_phashes(px), quadrant_phashes(px.copy())
        assert a == b and len(a) == 4


class TestQuadrantNeardup:
    def _images(self, spark, rows):
        return spark.createDataFrame(
            [(i, bytearray(b)) for i, b in rows], "image_id string, bytes binary"
        ).repartition(4)

    def test_vote_semantics_and_brute_equality(self, spark):
        """One-overlay variants pair at min_quadrants=3 but NOT at 4; a
        two-overlay variant never pairs; result equals an O(n²) numpy
        brute force over the same fixture."""
        from amazonwebcrawler_spark.functions.images import (
            hamming64,
            quadrant_phashes,
        )
        from amazonwebcrawler_spark.operators.dedup import quadrant_neardup_pairs

        def stamp(px, q):
            px = px.copy()
            h, w, _ = px.shape
            hh, hw = h // 2, w // 2
            y0, x0 = (0 if q in (0, 1) else hh), (0 if q in (0, 2) else hw)
            ys, xs = y0 + hh // 4, x0 + hw // 4
            px[ys:ys + hh // 2, xs:xs + hw // 2] = 255 - px[ys:ys + hh // 2, xs:xs + hw // 2]
            return px

        rows = []
        for i in range(6):
            b = world.block_image_record(f"qn-{i}")["bytes"]
            px = decode_image(b)
            rows.append((f"qn-{i}", b))
            rows.append((f"qn-{i}-one", encode_png(stamp(px, i % 4))))
            rows.append((f"qn-{i}-two", encode_png(stamp(stamp(px, 0), 3))))
        rows.append(("qn-corrupt", b"\x00\x01notanimage"))
        df = self._images(spark, rows)
        got3 = {
            (r.id_a, r.id_b): r.n_quadrants_close
            for r in quadrant_neardup_pairs(df, min_quadrants=3).collect()
        }
        qh = {i: quadrant_phashes(decode_image(bytes(b))) for i, b in rows[:-1]}
        ids = sorted(qh)
        want3 = {}
        for ai, a in enumerate(ids):
            for b2 in ids[ai + 1:]:
                n = sum(hamming64(x, y) <= 2 for x, y in zip(qh[a], qh[b2]))
                if n >= 3:
                    want3[(a, b2)] = n
        assert got3 == want3
        for i in range(6):
            assert got3.get((f"qn-{i}", f"qn-{i}-one")) == 3
            assert (f"qn-{i}", f"qn-{i}-two") not in got3
        got4 = {
            (r.id_a, r.id_b)
            for r in quadrant_neardup_pairs(df, min_quadrants=4).collect()
        }
        assert not any((f"qn-{i}", f"qn-{i}-one") in got4 for i in range(6))

    def test_invalid_min_quadrants_raises(self, spark):
        from amazonwebcrawler_spark.operators.dedup import quadrant_neardup_pairs

        df = self._images(spark, [("a", b"\x00")])
        with pytest.raises(ValueError):
            quadrant_neardup_pairs(df, min_quadrants=0)
        with pytest.raises(ValueError):
            quadrant_neardup_pairs(df, min_quadrants=5)


class TestBorderCrop:
    def test_border_box_planted_bars_exact(self):
        from amazonwebcrawler_spark.functions.images import border_box, decode_image

        base = world.block_image_record("bb-unit")
        px = decode_image(base["bytes"])
        assert border_box(px) == (0, 0, 0, 0)
        lb = np.zeros((px.shape[0] + 10, px.shape[1], 3), np.uint8)
        lb[5:-5] = px
        assert border_box(lb) == (5, 5, 0, 0)
        fr = np.full((px.shape[0] + 6, px.shape[1] + 14, 3), 255, np.uint8)
        fr[3:-3, 7:-7] = px
        assert border_box(fr) == (3, 3, 7, 7)

    def test_sides_reference_independently(self):
        """Black top bar over a white bottom bar — each side crops against
        its OWN reference color."""
        from amazonwebcrawler_spark.functions.images import border_box, decode_image

        px = decode_image(world.block_image_record("bb-mixed")["bytes"])
        h, w, _ = px.shape
        out = np.zeros((h + 8, w, 3), np.uint8)
        out[4 : 4 + h] = px
        out[-4:] = 255
        assert border_box(out) == (4, 4, 0, 0)

    def test_max_frac_caps_solid_images(self):
        """A solid image must never crop itself away: depths cap at
        floor(dim·max_frac) per side."""
        from amazonwebcrawler_spark.functions.images import border_box

        solid = np.full((32, 32, 3), 7, np.uint8)
        assert border_box(solid) == (12, 12, 12, 12)  # 32·0.375 = 12, 8px kept

    def test_tolerance_boundary(self):
        """A line tol+1 away from the reference stops the scan; one at
        exactly tol continues it."""
        from amazonwebcrawler_spark.functions.images import border_box

        px = np.zeros((16, 16, 3), np.uint8)
        px[8:] = 200  # bottom half is content
        px[2] = 2     # within tol=2 of the black ref → still border
        px[3] = 3     # 3 > tol → scan stops here
        assert border_box(px, tol=2)[0] == 3

    def test_kernel_crop_restores_master_phash(self, spark):
        """Spark end-to-end: letterboxed variant's phash_cropped equals
        the master's, while the whole-image pHashes differ by > 2 —
        the bars-before-dedup normalization claim."""
        from amazonwebcrawler_spark.functions.images import (
            BORDER_SCHEMA,
            border_crop_kernel,
            decode_image,
            encode_png,
            hamming64,
            phash64,
        )

        rows = []
        masters = {}
        for i in range(4):
            base = world.block_image_record(f"bk-{i}")
            px = decode_image(base["bytes"])
            masters[f"bk-{i}"] = px
            rows.append((f"bk-{i}", bytearray(base["bytes"])))
            lb = np.zeros((px.shape[0] + 16, px.shape[1], 3), np.uint8)
            lb[8:-8] = px
            rows.append((f"bk-{i}-lb", bytearray(encode_png(lb))))
        rows.append(("bk-corrupt", bytearray(b"NOTANIMAGE")))
        df = spark.createDataFrame(rows, "image_id string, bytes binary")
        out = {
            r.image_id: r
            for r in df.repartition(4)
            .mapInPandas(border_crop_kernel(), BORDER_SCHEMA)
            .collect()
        }
        assert not out["bk-corrupt"].decode_ok and out["bk-corrupt"].w is None
        for i in range(4):
            m, v = out[f"bk-{i}"], out[f"bk-{i}-lb"]
            assert m.decode_ok and v.decode_ok
            assert not m.changed and v.changed
            assert (v.b_top, v.b_bottom, v.b_left, v.b_right) == (8, 8, 0, 0)
            assert (v.crop_w, v.crop_h) == (m.w, m.h)
            assert v.phash_cropped == m.phash_cropped == phash64(masters[f"bk-{i}"])
            lb_px = np.zeros((masters[f"bk-{i}"].shape[0] + 16, masters[f"bk-{i}"].shape[1], 3), np.uint8)
            lb_px[8:-8] = masters[f"bk-{i}"]
            assert hamming64(phash64(lb_px), phash64(masters[f"bk-{i}"])) > 2


class TestFlipCanonicalPhash:
    def test_all_orientations_share_the_canonical_hash(self):
        from amazonwebcrawler_spark.functions.images import (
            decode_image,
            flip_canonical_phash,
        )

        px = decode_image(world.block_image_record("flip-unit")["bytes"])
        c = flip_canonical_phash(px)
        for v in (px[:, ::-1], px[::-1], px[::-1, ::-1]):
            assert flip_canonical_phash(np.ascontiguousarray(v)) == c

    def test_plain_phash_misses_the_mirror(self):
        from amazonwebcrawler_spark.functions.images import (
            decode_image,
            hamming64,
            phash64,
        )

        px = decode_image(world.block_image_record("flip-unit")["bytes"])
        assert hamming64(phash64(px), phash64(px[:, ::-1])) > 2

    def test_pairs_operator_end_to_end(self, spark):
        from amazonwebcrawler_spark.functions.images import decode_image, encode_png
        from amazonwebcrawler_spark.operators.dedup import flip_neardup_pairs

        rows = []
        for i in range(4):
            base = world.block_image_record(f"fl-{i}")
            px = decode_image(base["bytes"])
            rows.append((f"fl-{i}", bytearray(base["bytes"])))
            rows.append((f"fl-{i}-m", bytearray(encode_png(np.ascontiguousarray(px[:, ::-1])))))
        rows.append(("fl-corrupt", bytearray(b"NOTANIMAGE")))
        df = spark.createDataFrame(rows, "image_id string, bytes binary").repartition(4)
        got = {(r.id_a, r.id_b): r.hamming for r in flip_neardup_pairs(df).collect()}
        for i in range(4):
            assert got.get((f"fl-{i}", f"fl-{i}-m")) == 0
        assert not any("corrupt" in a or "corrupt" in b for a, b in got)


class TestBlurStats:
    def test_flat_and_checkerboard_exact(self):
        from amazonwebcrawler_spark.functions.images import blur_stats

        flat = np.full((16, 16, 3), 77, dtype=np.uint8)
        st = blur_stats(flat)
        assert st["lap_var"] == 0 and st["is_blurry"]
        # 6×6 checkerboard: interior responses are ±4·255000 in equal
        # numbers → mean 0, variance exactly (4·255000)²
        cb = np.zeros((6, 6, 3), dtype=np.uint8)
        cb[::2, ::2] = 255
        cb[1::2, 1::2] = 255
        st = blur_stats(cb)
        assert st["lap_var"] == (4 * 255_000) ** 2
        assert not st["is_blurry"]

    def test_blur_reduces_variance_monotonically(self):
        from amazonwebcrawler_spark.functions.images import blur_stats, decode_image

        rec = world.image_record(world.asin_for("blurmono", 1, 1))
        px = decode_image(rec["bytes"]).astype(np.int64)

        def boxblur(p):
            s = (
                p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
                + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
                + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
            )
            out = p.copy()
            out[1:-1, 1:-1] = s // 9
            return out

        v0 = blur_stats(px.astype(np.uint8))["lap_var"]
        b1 = boxblur(px)
        v1 = blur_stats(b1.astype(np.uint8))["lap_var"]
        v2 = blur_stats(boxblur(b1).astype(np.uint8))["lap_var"]
        assert v0 > v1 > v2

    def test_sub3px_quarantined(self):
        from amazonwebcrawler_spark.functions.images import blur_stats

        st = blur_stats(np.full((2, 10, 3), 5, dtype=np.uint8))
        assert st["lap_var"] is None and st["is_blurry"]

    def test_kernel_matches_direct_and_quarantines_corrupt(self, spark):
        from amazonwebcrawler_spark.functions.images import (
            BLUR_SCHEMA,
            blur_stats,
            blur_stats_kernel,
            decode_image,
        )

        rows = []
        for i in range(1, 5):
            rec = world.image_record(world.asin_for("blurk", 1, i))
            rows.append((rec["image_id"], bytearray(rec["bytes"])))
        rows.append(("bad", bytearray(b"JUNK")))
        df = spark.createDataFrame(rows, "image_id string, bytes binary").repartition(3)
        got = {r.image_id: r for r in df.mapInPandas(blur_stats_kernel(), BLUR_SCHEMA).collect()}
        assert got["bad"].lap_var is None and got["bad"].is_blurry
        for iid, data in rows[:-1]:
            want = blur_stats(decode_image(bytes(data)))
            assert got[iid].lap_var == want["lap_var"]
            assert got[iid].is_blurry == want["is_blurry"]


class TestChannelNormStats:
    def _run(self, spark, rows):
        from amazonwebcrawler_spark.operators.images_io import channel_norm_stats

        df = spark.createDataFrame(rows, "image_id string, bytes binary")
        return {r.channel: r for r in channel_norm_stats(df).collect()}

    def test_solid_exact(self, spark):
        solid = np.zeros((16, 16, 3), dtype=np.uint8)
        solid[..., 0], solid[..., 1], solid[..., 2] = 10, 20, 30
        out = self._run(spark, [("s", bytearray(encode_png(solid)))])
        assert out["r"].mean_milli == 10_000 and out["r"].var_micro == 0
        assert out["g"].mean_milli == 20_000 and out["b"].mean_milli == 30_000
        assert all(out[c].n_px == 256 for c in "rgb")

    def test_half_black_white_exact(self, spark):
        half = np.zeros((32, 32, 3), dtype=np.uint8)
        half[:16, :, :] = 255
        out = self._run(spark, [("h", bytearray(encode_png(half)))])
        # mean = 127.5 → 127500 milli; var = 255²/4 → 16256.25 → micro
        for c in "rgb":
            assert out[c].mean_milli == 127_500
            assert out[c].var_micro == 16_256_250_000

    def test_corrupt_contributes_nothing(self, spark):
        solid = np.full((8, 8, 3), 100, dtype=np.uint8)
        a = self._run(spark, [("s", bytearray(encode_png(solid)))])
        b = self._run(
            spark,
            [("s", bytearray(encode_png(solid))), ("bad", bytearray(b"NOPE"))],
        )
        assert {c: tuple(a[c]) for c in "rgb"} == {c: tuple(b[c]) for c in "rgb"}

    def test_mixed_sizes_match_python_totals(self, spark):
        from amazonwebcrawler_spark.functions.images import decode_image

        rows = []
        for i in range(1, 6):
            rec = world.image_record(world.asin_for("normk", 1, i))
            rows.append((rec["image_id"], bytearray(rec["bytes"])))
        out = self._run(spark, rows)
        tot = {ch: [0, 0, 0] for ch in "rgb"}
        for _, data in rows:
            px = decode_image(bytes(data)).astype(np.int64)
            n = int(px.shape[0] * px.shape[1])
            for ci, ch in enumerate("rgb"):
                c = px[..., ci]
                tot[ch][0] += n
                tot[ch][1] += int(c.sum())
                tot[ch][2] += int((c * c).sum())
        for ch in "rgb":
            n, s1, s2 = tot[ch]
            assert out[ch].n_px == n
            assert out[ch].mean_milli == (s1 * 1000) // n
            assert out[ch].var_micro == ((n * s2 - s1 * s1) * 1_000_000) // (n * n)


class TestSmartCrop:
    def test_flat_image_centre_crop(self):
        from amazonwebcrawler_spark.functions.images import smart_crop_stats

        st = smart_crop_stats(np.full((32, 48, 3), 90, dtype=np.uint8))
        assert (st["crop_x"], st["crop_y"], st["crop_side"]) == (8, 0, 32)
        assert st["cx_milli"] == 24_000 and st["cy_milli"] == 16_000

    def test_content_pulls_crop_to_the_edge(self):
        from amazonwebcrawler_spark.functions.images import smart_crop_stats

        left = np.full((32, 64, 3), 200, dtype=np.uint8)
        left[:, :8:2, :] = 0
        assert smart_crop_stats(left)["crop_x"] == 0
        right = np.full((32, 64, 3), 200, dtype=np.uint8)
        right[:, 56::2, :] = 0
        assert smart_crop_stats(right)["crop_x"] == 32  # w - side

    def test_window_always_inside_image(self):
        from amazonwebcrawler_spark.functions.images import smart_crop_stats

        for seed in range(6):
            px = _pixels(seed, w=40 + seed * 7, h=24 + seed * 5)
            st = smart_crop_stats(px)
            assert 0 <= st["crop_x"] <= st["w"] - st["crop_side"]
            assert 0 <= st["crop_y"] <= st["h"] - st["crop_side"]
            assert st["crop_side"] == min(st["w"], st["h"])

    def test_kernel_matches_direct_and_skips_corrupt(self, spark):
        from amazonwebcrawler_spark.functions.images import (
            SMART_CROP_SCHEMA,
            decode_image,
            smart_crop_kernel,
            smart_crop_stats,
        )

        rows, seen = [], set()
        for i in range(1, 20):
            if len(seen) == 4:
                break
            rec = world.image_record(world.asin_for("cropk", 1, i))
            if rec["image_id"] in seen:
                continue
            seen.add(rec["image_id"])
            rows.append((rec["image_id"], bytearray(rec["bytes"])))
        rows.append(("bad", bytearray(b"JUNK")))
        df = spark.createDataFrame(rows, "image_id string, bytes binary").repartition(3)
        got = {
            r.image_id: r
            for r in df.mapInPandas(smart_crop_kernel(), SMART_CROP_SCHEMA).collect()
        }
        assert "bad" not in got and len(got) == 4
        for iid, data in rows[:-1]:
            want = smart_crop_stats(decode_image(bytes(data)))
            for k, v in want.items():
                assert got[iid][k] == v, (iid, k)


class TestColorStats:
    def test_planted_tiles(self, spark):
        import numpy as np

        from amazonwebcrawler_spark.functions.images import (
            COLOR_SCHEMA,
            color_stats,
            color_stats_kernel,
            encode_png,
        )

        solid = np.full((32, 32, 3), 200, dtype=np.uint8)
        s = color_stats(solid)
        assert (s["dom_milli"], s["n_bins_used"], s["gray_milli"]) == (1000, 1, 1000)
        # solid 200 → every channel quantizes to 3 → bin 3*16+3*4+3 = 63
        assert s["dom_bin"] == 63

        quad = np.zeros((32, 32, 3), dtype=np.uint8)
        quad[:16, :16] = (250, 10, 10)
        quad[:16, 16:] = (10, 250, 10)
        quad[16:, :16] = (10, 10, 250)
        quad[16:, 16:] = (250, 250, 10)
        q = color_stats(quad)
        # four equal bins — argmax tie resolves to the SMALLEST bin (3:
        # the blue quadrant 0*16+0*4+3)
        assert (q["dom_bin"], q["dom_milli"], q["n_bins_used"], q["gray_milli"]) == (
            3, 250, 4, 0,
        )

        df = spark.createDataFrame(
            [("s", bytearray(encode_png(solid))), ("bad", bytearray(b"NOPE"))],
            "image_id string, bytes binary",
        )
        rows = {r["image_id"]: r for r in
                df.mapInPandas(color_stats_kernel(), COLOR_SCHEMA).collect()}
        assert rows["s"]["dom_milli"] == 1000
        assert rows["bad"]["dom_milli"] is None  # quarantined, not dropped


class TestProbeScore:
    """functions/images.probe_score_kernel — determinism across
    partitionings and the corrupt-quarantine path."""

    def test_deterministic_and_quarantine(self, spark):
        import numpy as np

        from amazonwebcrawler_spark.functions import images as fi

        px = ((np.arange(16 * 16 * 3) * 11 + 5) % 251).reshape(16, 16, 3).astype(np.uint8)
        rows = [(f"p{i}", bytearray(fi.encode_png((px + i) % 251))) for i in range(6)]
        rows.append(("bad", bytearray(b"JUNK")))
        df = spark.createDataFrame(rows, "image_id string, bytes binary")
        k = fi.probe_score_kernel(fi.probe_weights(), bias_micro=0)
        a = sorted(map(tuple, df.repartition(2).mapInPandas(k, fi.PROBE_SCHEMA).collect()))
        b = sorted(map(tuple, df.repartition(5).mapInPandas(k, fi.PROBE_SCHEMA).collect()))
        assert a == b and len(a) == 6  # corrupt dropped, layout-invariant
        # replay one score sequentially
        emb = fi.embed_image(fi.decode_image(bytes(rows[0][1])), grid=4)
        s = 0.0
        for wv, ev in zip(fi.probe_weights(), emb):
            s += wv * ev
        assert dict(a)["p0"] == round(s * 1e6)
