"""M1 flagship slice: one declarative rank-report wave (SURVEY.md §7 M1).

The stateless core of getRank.main() — fetch SERP page 1 per keyword, parse,
classify against the broadcast dims, rank-encode, first-ad/first-natural
aggregate, golden-format synthesis — as a single DataFrame DAG (no frontier
state, no loop). Used by ``__spark_entry__.entry`` as the smoke pipeline;
the full stateful loop lives in plans/crawler.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from amazonwebcrawler_spark.functions.rank import (
    first_match_struct,
    is_sponsored,
    rank_encode,
    rank_string_synthesis,
    strip_sponsored_tag,
)
from amazonwebcrawler_spark.functions.urls import canonicalize_url
from amazonwebcrawler_spark.sources import synthetic_world as world

SERP_JSON = (
    "kind string, keyword string, page int, layout string, has_next boolean, "
    "items array<struct<pos:int,title:string,href:string,is_sponsored:boolean,has_title_node:boolean>>"
)


def _fetch(batches):
    for pdf in batches:
        out = pdf.copy()
        out["content"] = [world.fetch(u)["content"] for u in pdf["canonical_url"]]
        yield out


def rank_wave(spark: SparkSession, keywords: list[tuple[str, str]], pages: int = 2) -> DataFrame:
    """(keyword, product_type) list → golden-format rank strings.

    Crawls SERP pages 1..``pages`` for each keyword in ONE fetch wave (the
    page URLs are enumerable up front — no frontier needed for this slice).
    """
    rows = [
        (i, kw, ptype, world.serp_url(kw, p) + "&ref=nb_sb_noss")
        for i, (kw, ptype) in enumerate(keywords)
        for p in range(1, pages + 1)
    ]
    seeds = spark.createDataFrame(rows, "seed_id long, keyword string, product_type string, url string")
    seeds = seeds.withColumn("canonical_url", canonicalize_url(F.col("url"))).drop("url")

    fetched_schema = T.StructType(
        list(seeds.schema.fields) + [T.StructField("content", T.StringType())]
    )
    parsed = (
        seeds.repartition(8, "canonical_url")
        .mapInPandas(_fetch, fetched_schema)
        .withColumn("p", F.from_json("content", SERP_JSON))
    )
    items = parsed.select(
        "seed_id", "keyword", "product_type",
        F.col("p.page").alias("page"), F.col("p.layout").alias("layout"),
        F.explode("p.items").alias("item"),
    ).select(
        "seed_id", "keyword", "product_type", "page", "layout",
        F.col("item.pos").alias("pos"),
        F.coalesce(F.col("item.title"), F.lit("Amazon recommendation")).alias("title"),
    )
    clean = items.withColumn("clean_title", strip_sponsored_tag(F.col("title"))).withColumn(
        "is_ad", is_sponsored(F.col("title"))
    )
    matched = (
        clean.withColumn(
            "_m", first_match_struct(F.col("clean_title"), F.col("product_type"), world.DIMS)
        )
        .withColumn("match_title", F.col("_m.match_title"))
        .withColumn("size_attr", F.col("_m.size_attr"))
        .drop("_m")
        .withColumn("is_own", F.col("match_title").isNotNull())
        .withColumn("rank", rank_encode(F.col("layout"), F.col("page"), F.col("pos")))
    )
    # W3 quarantine semantics: unknown-layout pages never contribute ranks
    # (getRank.py:317-328 parks 'Other mode' pages) — same routing as the
    # stateful engine's quarantine table
    own = matched.filter(F.col("is_own") & (F.col("rank") != "Other mode"))
    w = Window.partitionBy("seed_id", "is_ad").orderBy(F.col("page").asc(), F.col("pos").asc())
    firsts = own.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    ad = firsts.filter(F.col("is_ad")).select(
        "seed_id", F.col("rank").alias("ad_rank"), F.col("size_attr").alias("ad_attr")
    )
    nat = firsts.filter(~F.col("is_ad")).select(
        "seed_id", F.col("rank").alias("nat_rank"), F.col("size_attr").alias("nat_attr")
    )
    kws = seeds.select("seed_id", "keyword").distinct()
    return (
        kws.join(ad, "seed_id", "left")
        .join(nat, "seed_id", "left")
        .select(
            "seed_id", "keyword",
            rank_string_synthesis(
                F.col("ad_rank"), F.col("ad_attr"), F.col("nat_rank"), F.col("nat_attr")
            ).alias("rank_string"),
        )
        .orderBy("seed_id")
    )
