"""Generate committed-golden oracle rows for the deterministic, sf-independent
driver queries that have no SQL-expressible twin (bloom plumbing, image/video/
audio kernels, the flagship crawl wave).

Each golden is the query's own output, captured once and committed to
``amazonwebcrawler_spark/goldens.json``; ``__spark_entry__.oracle_sql`` renders
it as a typed VALUES table for DuckDB, so the driver's value-hash gate checks
these queries like any other. Regenerate (and review the diff!) after any
intentional behavior change:

    python scripts/gen_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: query → DuckDB type per column (must render to the exact Spark type:
#: INTEGER=int32, BIGINT=int64, DOUBLE=float64, VARCHAR, BOOLEAN)
GOLDEN_QUERIES: dict[str, dict[str, str]] = {
    "crawl_rank_wave": {"seed_id": "BIGINT", "keyword": "VARCHAR", "rank_string": "VARCHAR"},
    # IVF ANN is deterministic end to end (ordered bounded sample, seeded
    # k-means, cos_sim rounded to 6dp, total (sim desc, id) tiebreak), so
    # the iterative k-means gets a committed golden instead of staying a
    # rows-only row
    "ann_ivf": {
        "query_id": "BIGINT", "neighbor_id": "BIGINT",
        "cos_sim": "DOUBLE", "rank": "INTEGER",
    },
    "images_decode": {
        "image_id": "VARCHAR", "w": "INTEGER", "h": "INTEGER", "fmt": "VARCHAR",
        "caption": "VARCHAR", "phash": "BIGINT", "n_bytes": "BIGINT",
    },
    "images_validate": {
        "image_id": "VARCHAR", "decode_ok": "BOOLEAN", "dims_ok": "BOOLEAN",
        "fmt_ok": "BOOLEAN", "phash_ok": "BOOLEAN", "phash_recomputed": "BIGINT",
        "caption_len": "INTEGER", "n_bytes": "INTEGER",
    },
    "video_frame_sample": {
        "video_id": "VARCHAR", "frame_idx": "INTEGER", "phash": "BIGINT",
        "frame_md5": "VARCHAR", "frame_len": "INTEGER",
    },
    "images_resize": {
        "image_id": "VARCHAR", "w": "INTEGER", "h": "INTEGER",
        "bytes_md5": "VARCHAR", "n_bytes": "INTEGER",
    },
    "audio_features": {
        "audio_id": "VARCHAR", "duration_sec": "DOUBLE", "rms": "DOUBLE",
        "zero_crossing_rate": "DOUBLE", "peak": "DOUBLE",
    },
    "bloom_stats": {
        "bucket": "INTEGER", "n_probed": "BIGINT", "false_negatives": "BIGINT",
        "n_items": "BIGINT",
    },
    "cuckoo_stats": {
        "shard": "INTEGER", "n_probed": "BIGINT", "false_negatives": "BIGINT",
        "deleted_still_seen": "BIGINT", "n_items": "BIGINT",
    },
}

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "amazonwebcrawler_spark", "goldens.json",
)


def main() -> None:
    import __spark_entry__ as entrymod
    from amazonwebcrawler_spark.session import get_spark

    spark = get_spark(app_name="gen-goldens", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    goldens: dict[str, dict] = {}
    # most golden queries are sf-independent (fixtures / the crawl world);
    # ann_ivf reads the embeddings table, so its golden is pinned to the
    # driver's correctness scale (sf0.01 — the scale CORRECTNESS runs at)
    sf_override = {"ann_ivf": "/root/testdata/sf0.01"}
    for name, cols in GOLDEN_QUERIES.items():
        df = qs[name](spark, sf_override.get(name, "/root/testdata/sf0.001"))
        got_cols = df.columns
        assert set(got_cols) == set(cols), (name, got_cols, list(cols))
        rows = [[r[c] for c in cols] for r in df.collect()]
        # sanity: numbers stay numbers, floats keep full repr via json
        goldens[name] = {"columns": cols, "rows": sorted(rows, key=repr)}
        print(f"{name}: {len(rows)} rows captured")
    with open(OUT, "w") as f:
        json.dump(goldens, f, indent=1, ensure_ascii=False)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
