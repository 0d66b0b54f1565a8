"""Multimodal payload kernels beyond still images: resize, video frame
sampling, audio features (training-data pipeline requirements).

All media are opaque ``binary`` columns with typed metadata; all processing
is Arrow-batched ``mapInPandas`` kernels. Since no real image/audio/video
libraries ship in this container, the CODECS are deterministic stand-ins
(documented per function — swap for PIL/ffmpeg/soundfile in deployment);
the Spark-side plumbing — schemas, batching, UDF signatures — is real and
tested.

Containers:
* image  — PNG (real) / FJPG (lossy stand-in), see functions/images.py
* video  — ``FVID`` = header(magic, n_frames, w, h, fps) + concatenated
  length-prefixed FJPG frames. Frame-sample/decode are real parsers of this
  container.
* audio  — ``FAUD`` = header(magic, sample_rate, n_samples) + int16 PCM.
  Feature extraction (RMS, zero-crossing rate, peak) is real numpy DSP over
  the samples; only the *codec* (no mp3/opus) is the stand-in.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from amazonwebcrawler_spark.functions.images import (
    decode_image,
    encode_jpeg,
    encode_png,
)

FVID_MAGIC = b"FVID"
FAUD_MAGIC = b"FAUD"


# ------------------------------------------------------------------ resize
def resize_pixels(px: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbour resize (h_out, w_out) — real, pure numpy."""
    ys = (np.arange(h) * px.shape[0]) // h
    xs = (np.arange(w) * px.shape[1]) // w
    return px[np.ix_(ys, xs)]


def resize_images_kernel(target_w: int, target_h: int, out_fmt: str = "png"):
    """mapInPandas kernel factory: (image_id, bytes) → resized (image_id,
    bytes, w, h). Decode → resize → re-encode inside the Arrow batch."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for image_id, data in zip(pdf["image_id"], pdf["bytes"]):
                px = resize_pixels(decode_image(bytes(data)), target_w, target_h)
                out = encode_png(px) if out_fmt == "png" else encode_jpeg(px)
                rows.append({"image_id": image_id, "bytes": out, "w": target_w, "h": target_h})
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h"])

    return kernel


RESIZED_SCHEMA = "image_id string, bytes binary, w int, h int"


# ------------------------------------------------------------------- video
def encode_video(frames: list[np.ndarray], fps: int = 8) -> bytes:
    h, w, _ = frames[0].shape
    payload = b"".join(
        struct.pack(">I", len(f)) + f for f in (encode_jpeg(fr) for fr in frames)
    )
    return FVID_MAGIC + struct.pack(">IIIB", len(frames), w, h, fps) + payload


def video_info(data: bytes) -> tuple[int, int, int, int]:
    assert data[:4] == FVID_MAGIC, "not an FVID payload"
    n, w, h, fps = struct.unpack(">IIIB", data[4:17])
    return n, w, h, fps


def iter_frames(data: bytes):
    n, _w, _h, _fps = video_info(data)
    pos = 17
    for _ in range(n):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        yield decode_image(data[pos + 4 : pos + 4 + length])
        pos += 4 + length


def frame_sample_kernel(every_k: int = 4):
    """mapInPandas kernel: (video_id, bytes) → one row per sampled frame
    (video_id, frame_idx, frame_bytes(png), phash). Real container parse;
    stand-in frame codec."""

    def kernel(batches):
        from amazonwebcrawler_spark.functions.images import phash64

        for pdf in batches:
            rows = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                for i, px in enumerate(iter_frames(bytes(data))):
                    if i % every_k:
                        continue
                    rows.append(
                        {"video_id": vid, "frame_idx": i,
                         "frame_bytes": encode_png(px), "phash": phash64(px)}
                    )
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "frame_bytes", "phash"])

    return kernel


FRAMES_SCHEMA = "video_id string, frame_idx int, frame_bytes binary, phash long"


# ------------------------------------------------------------------- audio
def encode_audio(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    assert samples.dtype == np.int16
    return FAUD_MAGIC + struct.pack(">II", sample_rate, len(samples)) + samples.tobytes()


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != FAUD_MAGIC:
        raise NotImplementedError(
            "unknown audio container — deployment dispatches to soundfile/ffmpeg"
        )
    rate, n = struct.unpack(">II", data[4:12])
    return np.frombuffer(data[12 : 12 + 2 * n], dtype=np.int16), rate


def audio_features_kernel():
    """mapInPandas kernel: (audio_id, bytes) → (audio_id, duration_us,
    rms_micro, zcr_micro, peak_micro). Real DSP over PCM, vectorized per
    batch. Every feature is an exact/micro-unit BIGINT (the committed
    golden must hash identically on any box — the r4 image_quality
    lesson): duration, zero-crossing rate and peak are pure integer
    arithmetic over the int16 samples; RMS needs one ``math.sqrt`` of an
    exact integer mean-square (IEEE correctly rounded — deterministic
    across libms)."""
    import math

    def kernel(batches):
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                samples, rate = decode_audio(bytes(data))
                n = len(samples)
                s = samples.astype(np.int64)
                s2 = int((s * s).sum()) if n else 0  # exact; int16² ≤ 2³⁰
                flips = int(np.count_nonzero(np.diff(np.signbit(s)))) if n > 1 else 0
                rows.append(
                    {
                        "audio_id": aid,
                        "duration_us": (n * 1_000_000) // rate,
                        # rms of x = samples/32768: sqrt(s2/n)/32768 in micro
                        "rms_micro": int(round(math.sqrt(s2 / n) / 32768 * 1_000_000))
                        if n else 0,
                        "zcr_micro": (flips * 1_000_000) // (n - 1) if n > 1 else 0,
                        "peak_micro": (int(np.abs(s).max()) * 1_000_000) // 32768 if n else 0,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["audio_id", "duration_us", "rms_micro", "zcr_micro", "peak_micro"]
            )

    return kernel


AUDIO_FEATURES_SCHEMA = (
    "audio_id string, duration_us long, rms_micro long, zcr_micro long, peak_micro long"
)


# ----------------------------------------------------- deterministic worlds
def synth_video(seed: int, n_frames: int = 12, w: int = 32, h: int = 24) -> bytes:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.int32)
    frames = [
        np.clip(base + i * 5, 0, 255).astype(np.uint8) for i in range(n_frames)
    ]
    return encode_video(frames)


def synth_audio(seed: int, n: int = 16000) -> bytes:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    freq = 100 + (seed % 20) * 50
    wave = 0.5 * np.sin(2 * np.pi * freq * t / 16000) + 0.1 * rng.standard_normal(n)
    return encode_audio((np.clip(wave, -1, 1) * 32767).astype(np.int16))


def synth_video_scenes(
    seed: int,
    scene_lens: tuple[int, ...] = (5, 4, 3),
    w: int = 32,
    h: int = 24,
    shift: int = 0,
) -> bytes:
    """Deterministic multi-scene video: each scene is a fresh random base
    frame with the same +5/frame brightness drift as :func:`synth_video`
    — consecutive frames inside a scene are near-identical, the first
    frame of each new scene is statistically independent (a hard cut).
    ``shift`` adds a global brightness offset to every frame — the
    deterministic stand-in for a RE-ENCODE of the same footage (pHash
    moves a few bits, scene structure identical)."""
    frames: list[np.ndarray] = []
    for s, n in enumerate(scene_lens):
        rng = np.random.default_rng(seed * 1000 + s)
        base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.int32)
        frames += [
            np.clip(base + i * 5 + shift, 0, 255).astype(np.uint8) for i in range(n)
        ]
    return encode_video(frames)


def shot_boundaries(frames_df, threshold: int = 12):
    """Shot-boundary (scene-cut) detection over a sampled-frame table:
    ``hamming(phash[i], phash[i-1]) > threshold`` flags frame ``i`` as
    the first frame of a new shot.

    This is the video-curation primitive between frame sampling and
    near-dup/selection: keyframe selection wants one frame per SHOT (not
    per k frames), and shot counts expose slideshows vs continuous
    footage. Consecutive same-shot frames share almost all pHash bits
    (the DCT signs track the scene's coarse structure), so the per-frame
    Hamming series is near-zero inside a shot and jumps at a cut —
    threshold sits between the two regimes.

    Pure JVM after the one Arrow decode pass that produced the phashes:
    a video-partitioned lag window + ``bit_count(xor)``. First frames
    report ``hamming_prev = -1`` (no predecessor) and are never
    boundaries — shot_count = boundaries + 1. Returns (video_id,
    frame_idx, hamming_prev, is_boundary).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("video_id").orderBy("frame_idx")
    prev = F.lag("phash").over(w)
    dist = F.when(
        prev.isNull(), F.lit(-1)
    ).otherwise(F.bit_count(F.col("phash").bitwiseXOR(prev))).cast("int")
    return frames_df.select(
        "video_id",
        "frame_idx",
        dist.alias("hamming_prev"),
        (dist > threshold).alias("is_boundary"),
    )


def video_keyframes(frames_df, threshold: int = 12):
    """One keyframe per SHOT: the first frame of each shot (frame 0 plus
    every boundary frame from :func:`shot_boundaries`). Returns
    (video_id, frame_idx, phash) — the video's content signature at
    shots-many rows instead of frames-many."""
    from pyspark.sql import functions as F

    sb = shot_boundaries(frames_df, threshold)
    keep = sb.filter((F.col("frame_idx") == 0) | F.col("is_boundary")).select(
        "video_id", "frame_idx"
    )
    return frames_df.join(keep, ["video_id", "frame_idx"]).select(
        "video_id", "frame_idx", "phash"
    )


def video_neardup_pairs(
    frames_df,
    threshold: int = 12,
    max_hamming: int = 2,
    containment_milli: int = 600,
    max_bucket: int | None = None,
):
    """Video-level near-dup detection: re-encodes, brightness-shifted
    mirrors, and TRIMMED copies of a video share (most of) its shot
    keyframes — so video identity reduces to keyframe-pHash containment,
    the way image dedup reduces to pHash equality.

    Pipeline (all existing kernels — nothing new crosses to Python):
    keyframes per video (:func:`video_keyframes`, shots-many rows) →
    generic pigeonhole hamming join on the 64-bit pHash
    (``dedup.hamming_neardup_pairs`` — exact, (t+1)-chunk blocked) →
    per ordered video pair, count DISTINCT matched keyframes of A;
    ``containment_milli = matched·1000 DIV n_keyframes(A)``. Containment
    (not Jaccard) so a TRIM of A is still caught from the trim's side.
    Both directions are emitted (A⊂B and B⊂A score differently).

    Scale: keyframes are a tiny multiple of videos; the hamming join is
    the proven image-dedup shape; the pair rollup is one hash aggregate.
    Exact integers end to end. Returns (video_a, video_b, n_keyframes_a,
    n_matched, containment_milli, is_dup).
    """
    kf = video_keyframes(frames_df, threshold)
    return keyframe_containment_pairs(kf, max_hamming, containment_milli, max_bucket)


def keyframe_containment_pairs(
    kf,
    max_hamming: int = 2,
    containment_milli: int = 600,
    max_bucket: int | None = None,
):
    """Containment scoring over an ALREADY-SELECTED keyframe table
    (video_id, frame_idx, phash) — the back half of
    :func:`video_neardup_pairs`, factored out so any keyframe policy
    feeds it: first-frame-per-shot (:func:`video_keyframes`),
    sharpest-frame-per-shot (:func:`keyframe_select` joined back to its
    quality table), or an externally supplied signature set. Same exact
    pigeonhole hamming join + ordered-pair containment rollup."""
    from pyspark.sql import functions as F

    from amazonwebcrawler_spark.operators.dedup import hamming_neardup_pairs

    keyed = kf.select(
        F.concat_ws("#", "video_id", F.col("frame_idx").cast("string")).alias("_kid"),
        "video_id",
        "frame_idx",
        "phash",
    )
    pairs = hamming_neardup_pairs(
        keyed.select(F.col("_kid").alias("id"), F.col("phash").alias("fp")),
        "id",
        "fp",
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )
    # hamming_neardup_pairs emits unordered pairs once (id_a < id_b);
    # symmetrize, then keep only cross-video matches
    sym = pairs.select(F.col("id_a").alias("ka"), F.col("id_b").alias("kb")).unionByName(
        pairs.select(F.col("id_b").alias("ka"), F.col("id_a").alias("kb"))
    )
    split_a = F.substring_index(F.col("ka"), "#", 1)
    split_b = F.substring_index(F.col("kb"), "#", 1)
    cross = sym.select(
        split_a.alias("video_a"), F.col("ka").alias("key_a"), split_b.alias("video_b")
    ).filter(F.col("video_a") != F.col("video_b"))
    matched = cross.groupBy("video_a", "video_b").agg(
        F.countDistinct("key_a").alias("n_matched")
    )
    nk = kf.groupBy(F.col("video_id").alias("video_a")).agg(
        F.count(F.lit(1)).alias("n_keyframes_a")
    )
    return matched.join(nk, "video_a").select(
        "video_a",
        "video_b",
        "n_keyframes_a",
        "n_matched",
        F.expr("(n_matched * 1000L) DIV n_keyframes_a").alias("containment_milli"),
        (F.expr("(n_matched * 1000L) DIV n_keyframes_a") >= containment_milli).alias(
            "is_dup"
        ),
    )


FRAME_QUALITY_SCHEMA = "video_id string, frame_idx int, phash long, lap_var long"


def frame_quality_kernel(every_k: int = 1):
    """ONE fused Arrow pass ``(video_id, bytes) → (video_id, frame_idx,
    phash, lap_var)``: the pHash (shot structure) and the variance-of-
    Laplacian focus measure (``images.blur_stats``, exact milli-luma²
    integer) of every sampled frame, decoded once — keyframe SELECTION
    needs both, and a second decode pass over 10^9 frames is the cost
    this kernel exists to avoid (the curate_stats_kernel discipline).
    Frames below 3×3 report ``lap_var`` NULL (quarantine semantics);
    undecodable containers yield zero rows."""

    def kernel(batches):
        from amazonwebcrawler_spark.functions.images import blur_stats, phash64

        for pdf in batches:
            rows = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                try:
                    frames = list(iter_frames(bytes(data)))
                except Exception:
                    continue
                for i, px in enumerate(frames):
                    if i % every_k:
                        continue
                    rows.append(
                        {
                            "video_id": vid,
                            "frame_idx": i,
                            "phash": phash64(px),
                            "lap_var": blur_stats(px)["lap_var"],
                        }
                    )
            out = pd.DataFrame(rows, columns=["video_id", "frame_idx", "phash", "lap_var"])
            out["lap_var"] = pd.array(
                [r["lap_var"] for r in rows], dtype="Int64"
            )
            yield out

    return kernel


def keyframe_select(frames_q, threshold: int = 12):
    """Sharpest-frame-per-shot keyframe selection: assign every frame to
    its shot (running count of :func:`shot_boundaries`-style cuts), then
    pick the frame with the highest focus measure in each shot — the
    frame a vision-language curation pipeline should caption/embed,
    rather than the shot's FIRST frame (``video_keyframes``), which on
    real footage is often mid-transition or motion-blurred.

    Input is :func:`frame_quality_kernel` output (phash + lap_var per
    frame, one decode pass). Pure JVM from there: one video-partitioned
    lag window (cut detection + running shot id), one (video, shot)
    max-aggregate on the ``(lap_var, -frame_idx)`` struct — EXACT
    integer ordering, ties → earlier frame — no Python, no collect,
    nothing global. NULL ``lap_var`` frames (sub-3×3) rank below any
    real measure via coalesce(-1).

    Returns (video_id, shot_id, n_frames, frame_idx, lap_var) — one row
    per shot; ``shot_id`` is 0-based in frame order.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("video_id").orderBy("frame_idx")
    prev = F.lag("phash").over(w)
    cut = F.when(prev.isNull(), F.lit(0)).otherwise(
        (F.bit_count(F.col("phash").bitwiseXOR(prev)) > threshold).cast("int")
    )
    shots = frames_q.select(
        "video_id",
        "frame_idx",
        "lap_var",
        F.sum(cut).over(w).cast("int").alias("shot_id"),
    )
    best = F.max(
        F.struct(
            F.coalesce(F.col("lap_var"), F.lit(-1)).alias("lv"),
            (-F.col("frame_idx")).cast("long").alias("negidx"),
        )
    )
    return (
        shots.groupBy("video_id", "shot_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_frames"), best.alias("_b"))
        .select(
            "video_id",
            "shot_id",
            "n_frames",
            (-F.col("_b.negidx")).cast("int").alias("frame_idx"),
            F.when(F.col("_b.lv") >= 0, F.col("_b.lv")).alias("lap_var"),
        )
    )


# -------------------------------------------------------------- audio gate
AUDIO_GATE_SCHEMA = (
    "audio_id string, n_samples long, duration_us long, clipped_ppm long, "
    "silence_ppm long, longest_silence_ms long, dc_micro long"
)


def _longest_run(mask: np.ndarray) -> int:
    """Length of the longest True run — exact, vectorized."""
    if not mask.any():
        return 0
    m = np.concatenate(([0], mask.astype(np.int8), [0]))
    d = np.diff(m)
    return int((np.flatnonzero(d == -1) - np.flatnonzero(d == 1)).max())


def audio_gate_kernel(clip_abs: int = 32767, silence_abs: int = 327):
    """ONE Arrow pass ``(audio_id, bytes) → AUDIO_GATE_SCHEMA`` — the
    defect evidence an audio curation gate needs, all EXACT integers
    over the int16 PCM (the committed golden must hash identically on
    any box):

    - ``clipped_ppm`` — samples at the rail (|s| ≥ ``clip_abs``) per
      million: clipping distortion survives any downstream resample, so
      it gates BEFORE feature extraction.
    - ``silence_ppm`` — samples under ``silence_abs`` (~1% FS) per
      million; an empty stream is vacuously 100% silent.
    - ``longest_silence_ms`` — longest sub-threshold RUN in exact ms
      (floor): separates a mid-stream DROPOUT (encoder glitch, dead
      mic segment) from uniformly low level, which the ppm alone
      conflates.
    - ``dc_micro`` — mean offset in micro full-scale (exact floor DIV,
      sign included): a DC-biased capture distorts every downstream
      spectral feature.

    Undecodable containers yield ZERO rows (the patch-kernel quarantine
    policy — a validate stage owns the corrupt-bytes signal). Reference
    scraper stores media bytes with no audit (crawler/crawler.py:64-76);
    this is the 100 TB-side audit."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                try:
                    samples, rate = decode_audio(bytes(data))
                except Exception:
                    continue
                n = len(samples)
                s = samples.astype(np.int64)
                a = np.abs(s)
                quiet = a <= silence_abs
                rows.append(
                    {
                        "audio_id": aid,
                        "n_samples": n,
                        "duration_us": (n * 1_000_000) // rate,
                        "clipped_ppm": (int((a >= clip_abs).sum()) * 1_000_000) // n
                        if n else 0,
                        "silence_ppm": (int(quiet.sum()) * 1_000_000) // n
                        if n else 1_000_000,
                        "longest_silence_ms": (_longest_run(quiet) * 1000) // rate,
                        "dc_micro": (int(s.sum()) * 1_000_000) // (n * 32768)
                        if n else 0,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "n_samples", "duration_us", "clipped_ppm",
                    "silence_ppm", "longest_silence_ms", "dc_micro",
                ],
            )

    return kernel


def audio_gate(
    stats,
    max_clipped_ppm: int = 1000,
    max_silence_ppm: int = 900_000,
    max_dropout_ms: int = 500,
):
    """Keep/drop verdict over :func:`audio_gate_kernel` output — pure
    column math behind the one Arrow pass (no shuffle, no Python, no
    collect; pipelines into the curation cascade like the per-image
    verdicts):

    - ``is_clipped``  — rail fraction over ``max_clipped_ppm`` (0.1%
      default: audible distortion, not a stray intersample peak).
    - ``is_silent``   — sub-threshold fraction over ``max_silence_ppm``
      or an empty stream: nothing to learn from.
    - ``has_dropout`` — a single silent run over ``max_dropout_ms``
      in OTHERWISE non-silent audio (a silent file is not "a dropout").
    - ``keep``        — none of the above.

    Returns (audio_id, duration_us, clipped_ppm, silence_ppm,
    longest_silence_ms, dc_micro, is_clipped, is_silent, has_dropout,
    keep)."""
    from pyspark.sql import functions as F

    is_clipped = F.col("clipped_ppm") >= max_clipped_ppm
    is_silent = (F.col("silence_ppm") >= max_silence_ppm) | (F.col("n_samples") == 0)
    has_dropout = (F.col("longest_silence_ms") >= max_dropout_ms) & ~is_silent
    return stats.select(
        "audio_id",
        "duration_us",
        "clipped_ppm",
        "silence_ppm",
        "longest_silence_ms",
        "dc_micro",
        is_clipped.alias("is_clipped"),
        is_silent.alias("is_silent"),
        has_dropout.alias("has_dropout"),
        (~(is_clipped | is_silent | has_dropout)).alias("keep"),
    )


def freeze_detect(frames_q, min_run: int = 8):
    """Frame-freeze detection over a (video_id, frame_idx, phash) table
    (:func:`frame_quality_kernel` / :func:`frame_sample_kernel` output —
    rides the one decode pass, nothing re-decodes): a stuck encoder, a
    static slate, or a looping placeholder produces RUNS of identical
    frames, and a corpus of "video" that is mostly still images starves
    a temporal model the same way silence starves an audio one — this is
    the visual twin of the audio gate's dropout leg.

    Gaps-and-islands, pure JVM: one video-partitioned lag window marks
    run starts (prev NULL or pHash changed), a running sum over the SAME
    window numbers the runs (one shuffle, both passes), then a
    (video, run) count and a per-video rollup. Exact-pHash equality is
    the contract — a re-encode of the SAME frame hashes identically
    under the stand-in codec chain; near-identical wobble is the
    hamming blocker's business, not this gate's.

    Returns (video_id, n_frames, n_frozen, frozen_ppm, longest_run,
    is_frozen): ``n_frozen`` counts frames equal to their predecessor,
    ``longest_run`` the longest constant stretch (a single frame is a
    run of 1), ``is_frozen = longest_run ≥ min_run``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("video_id").orderBy("frame_idx")
    prev = F.lag("phash").over(w)
    marked = frames_q.select(
        "video_id",
        "frame_idx",
        F.when(prev.isNull() | (prev != F.col("phash")), 1).otherwise(0).alias("new_run"),
        F.when(prev == F.col("phash"), 1).otherwise(0).alias("frozen"),
    ).select(
        "video_id",
        "frozen",
        F.sum("new_run").over(w).alias("run_id"),
    )
    runlen = marked.groupBy("video_id", "run_id").agg(
        F.count(F.lit(1)).alias("rl"), F.sum("frozen").alias("fr")
    )
    return runlen.groupBy("video_id").agg(
        F.sum("rl").cast("long").alias("n_frames"),
        F.sum("fr").cast("long").alias("n_frozen"),
        F.max("rl").cast("long").alias("longest_run"),
    ).select(
        "video_id",
        "n_frames",
        "n_frozen",
        F.expr("(n_frozen * 1000000) DIV n_frames").alias("frozen_ppm"),
        "longest_run",
        (F.col("longest_run") >= min_run).alias("is_frozen"),
    )
