"""Benchmark harness (driver contract + BASELINE.md scaling evidence).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "throughput": {...}, "scaling": {...}}

Headline throughputs (the BASELINE.json metric):
* frontier URLs/sec — one mega-wave of the crawl DAG (fetch → parse →
  classify ⨝ broadcast dims → rank encode → canonicalize expansions →
  bloom keys) over a synthetic frontier. The wave DAG *is* the engine; the
  loop around it adds only driver-side control (measured separately in
  tests). Sized so compute dominates scheduler overhead.
* image rows/sec — fetch+decode+phash of detail-page images through the
  Arrow pandas-UDF kernel (the input_hint hot path).

Scaling evidence (north_rule, sandboxed): when SPARK_GRAFT_SCALING=1
(default), re-runs the crawl-wave benchmark in a subprocess at local[N/4]
and reports efficiency = (thr_N / thr_N4) / 4.

Per-query timings run the oracle-checked queries() at $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = (
    "rank_encode",
    "first_per_group",
    "concat_rollup",
    "dim_join",
    "url_canonicalize",
    "windowed_counts",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk",
    "text_stats",
)

N_SERP = int(os.environ.get("BENCH_N_SERP", "4000"))
N_IMG = int(os.environ.get("BENCH_N_IMG", "24000"))


def _crawl_wave_bench(spark, cpus: int) -> dict:
    """One compute-bound mega-wave of the crawl DAG; returns throughputs."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from amazonwebcrawler_spark.functions.rank import (
        is_sponsored,
        rank_encode,
        strip_sponsored_tag,
    )
    from amazonwebcrawler_spark.functions.urls import canonicalize_url
    from amazonwebcrawler_spark.operators import bloom
    from amazonwebcrawler_spark.plans.crawler import SERP_JSON
    from amazonwebcrawler_spark.sources import synthetic_world as world
    from amazonwebcrawler_spark.sources.seeds import dims_df

    n_part = cpus * 8

    # --- SERP side: fetch + parse + classify + rank encode + expansion keys
    serp = spark.range(N_SERP).select(
        F.concat(
            F.lit(f"{world.HOST}/s?field-keywords=bench+kw+"),
            (F.col("id") % 512).cast("string"),
            F.lit("&page="),
            (F.col("id") % 8 + 1).cast("string"),
        ).alias("canonical_url"),
        F.lit("yogamat").alias("product_type"),
        F.lit(0).alias("attempt"),
    ).repartition(n_part)

    def fetch(batches):
        for pdf in batches:
            out = pdf.copy()
            out["content"] = [world.fetch(u)["content"] for u in pdf["canonical_url"]]
            yield out

    fetched = serp.mapInPandas(
        fetch,
        T.StructType(list(serp.schema.fields) + [T.StructField("content", T.StringType())]),
    )
    parsed = fetched.withColumn("p", F.from_json("content", SERP_JSON))
    items = parsed.select(
        "canonical_url", "product_type",
        F.col("p.page").alias("page"), F.col("p.layout").alias("layout"),
        F.explode("p.items").alias("item"),
    ).select(
        "canonical_url", "product_type", "page", "layout",
        F.col("item.pos").alias("pos"),
        F.coalesce(F.col("item.title"), F.lit("Amazon recommendation")).alias("title"),
        F.col("item.href").alias("href"),
    )
    dims = dims_df(spark)
    clean = items.withColumn("clean_title", strip_sponsored_tag(F.col("title"))).withColumn(
        "is_ad", is_sponsored(F.col("title"))
    )
    matched = (
        clean.join(
            F.broadcast(dims),
            (clean.product_type == dims.product_type)
            & (F.instr(clean.clean_title, dims.match_title) > 0),
            "left",
        )
        .drop(dims.product_type)
        .withColumn(
            "_mrank",
            F.row_number().over(
                Window.partitionBy("canonical_url", "pos").orderBy(F.coalesce("dict_pos", F.lit(1 << 30)))
            ),
        )
        .filter(F.col("_mrank") == 1)
        .withColumn("rank", rank_encode(F.col("layout"), F.col("page"), F.col("pos")))
    )
    expansions = matched.select(
        canonicalize_url(F.concat(F.lit(world.HOST), F.col("href"))).alias("canonical_url")
    )
    cfg = bloom.BloomConfig(n_buckets=64, m_bits=1 << 20)
    keyed = bloom.with_bloom_keys(expansions, "canonical_url", cfg)

    t0 = time.time()
    n_items = keyed.count()  # materializes the whole DAG
    t_serp = time.time() - t0

    # --- image side: fetch detail pages + decode + phash (Arrow kernel)
    details = spark.range(N_IMG).select(
        F.concat(F.lit(f"{world.HOST}/dp/BIMG"), F.col("id").cast("string")).alias("canonical_url")
    ).repartition(n_part)

    def fetch_decode(batches):
        from amazonwebcrawler_spark.functions.images import decode_image, phash64

        for pdf in batches:
            rows = []
            for u in pdf["canonical_url"]:
                r = world.fetch(u)
                px = decode_image(r["image_bytes"])
                rows.append(
                    {"canonical_url": u, "w": int(px.shape[1]), "h": int(px.shape[0]),
                     "phash": phash64(px), "n_bytes": len(r["image_bytes"])}
                )
            yield pd.DataFrame(rows, columns=["canonical_url", "w", "h", "phash", "n_bytes"])

    imgs = details.mapInPandas(fetch_decode, "canonical_url string, w int, h int, phash long, n_bytes long")
    t0 = time.time()
    n_imgs, total_bytes = imgs.agg(F.count("*"), F.sum("n_bytes")).collect()[0]
    t_img = time.time() - t0

    return {
        "serp_pages": N_SERP,
        "serp_items_expanded": n_items,
        "serp_sec": round(t_serp, 2),
        "frontier_urls_per_sec": round((N_SERP + N_IMG) / (t_serp + t_img), 1),
        "image_rows": n_imgs,
        "image_bytes": int(total_bytes),
        "image_sec": round(t_img, 2),
        "image_rows_per_sec": round(N_IMG / t_img, 1),
        "wall_sec": round(t_serp + t_img, 2),
        "cpus": cpus,
    }


def main() -> None:
    mode = "full"
    if "--crawl-only" in sys.argv:
        mode = "crawl_only"

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from amazonwebcrawler_spark.session import get_spark

    spark = get_spark(
        app_name=f"awc-bench-{mode}", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    spark.sparkContext.setLogLevel("ERROR")

    crawl = _crawl_wave_bench(spark, cpus)
    if mode == "crawl_only":
        print(json.dumps(crawl))
        return

    # --- per-query timings over the driver testdata
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        _ = n

    # --- scaling evidence: same wave bench at cpus/4 in a subprocess
    scaling = {}
    if os.environ.get("SPARK_GRAFT_SCALING", "1") == "1" and cpus >= 8:
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus // 4)
        env["SPARK_GRAFT_SCALING"] = "0"
        env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--crawl-only"],
                env=env, capture_output=True, text=True, timeout=1800,
            )
            small = json.loads(out.stdout.strip().splitlines()[-1])
            ratio = crawl["frontier_urls_per_sec"] / small["frontier_urls_per_sec"]
            scaling = {
                "cpus_small": cpus // 4,
                "cpus_large": cpus,
                "frontier_urls_per_sec_small": small["frontier_urls_per_sec"],
                "frontier_urls_per_sec_large": crawl["frontier_urls_per_sec"],
                "image_rows_per_sec_small": small["image_rows_per_sec"],
                "image_rows_per_sec_large": crawl["image_rows_per_sec"],
                "speedup": round(ratio, 3),
                "scaling_efficiency": round(ratio / 4.0, 3),
            }
        except Exception as e:  # noqa: BLE001
            scaling = {"error": str(e)[:200]}

    result = {
        "metric": "frontier URLs/sec (fetch+parse+classify+rank+canonicalize+bloom mega-wave)",
        "value": crawl["frontier_urls_per_sec"],
        "unit": "urls/sec",
        "queries": timings,
        "sf": sf_dir,
        "throughput": crawl,
        "scaling": scaling,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
