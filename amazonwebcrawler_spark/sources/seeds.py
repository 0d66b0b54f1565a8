"""Seed + dims tables (FIXTURES.md §1-2; SURVEY.md S1-S3, J5).

The reference hard-codes its seeds (keywords getRank.py:451, category URL
getStockNumber.py:193, product URL getRank.py:507); here they are a proper
``seeds`` DataFrame. ``seed_id`` is input order — it anchors the
deterministic crawl ordering (W4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from amazonwebcrawler_spark.sources import synthetic_world as world

SEEDS_SCHEMA = (
    "seed_id long, kind string, keyword string, url string, product_type string, max_depth int"
)
DIMS_SCHEMA = "product_type string, match_title string, size_attr string, dict_pos int"


def default_seed_rows() -> list[tuple]:
    """8 seeds: 6 keyword + 1 category + 1 product (FIXTURES.md §1).

    Raw URLs deliberately carry tracking params / mixed-case host so the
    canonicalizer (P14) does real work on the very first wave — the product
    seed mirrors the ``ref=…&qid=…`` shape of getRank.py:507.
    """
    rows: list[tuple] = []
    for i, (kw, ptype) in enumerate(world.KEYWORDS):
        rows.append((i, "keyword", kw, world.serp_url(kw, 1) + "&ref=nb_sb_noss", ptype, 7))
    rows.append((6, "category", None, world.category_url("office-products") + "?ie=UTF8&qid=1", "jmcl", 3))
    prod_asin = world.asin_for("tpe yoga mat", 1, 1)
    rows.append(
        (7, "product", None, f"https://WWW.Amazon.com/dp/{prod_asin}/ref=sr_1_7?qid=1523525327&sr=8-7", "yogamat", 2)
    )
    return rows


def seeds_df(spark: SparkSession, rows: list[tuple] | None = None) -> DataFrame:
    return spark.createDataFrame(rows or default_seed_rows(), SEEDS_SCHEMA)


def dims_df(spark: SparkSession) -> DataFrame:
    """Own-product match dimension — the broadcast side of J1/J2."""
    return spark.createDataFrame(world.DIMS, DIMS_SCHEMA)
