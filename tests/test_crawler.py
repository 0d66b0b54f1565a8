"""Crawl engine integration: invariants, reports, exact resume (C6/S10)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from amazonwebcrawler_spark.operators import bloom
from amazonwebcrawler_spark.plans import reports
from amazonwebcrawler_spark.plans.crawler import CrawlConfig, CrawlEngine
from amazonwebcrawler_spark.sources import synthetic_world as world
from amazonwebcrawler_spark.sources.seeds import seeds_df

SEED_ROWS = [
    (0, "keyword", "yoga mat", world.serp_url("yoga mat", 1), "yogamat", 2),
    (1, "category", None, world.category_url("office-products"), "jmcl", 2),
    (2, "product", None,
     f"https://www.amazon.com/dp/{world.asin_for('yoga mat', 1, 2)}?qid=9", "yogamat", 2),
]


def _cfg(tmp: str, **kw) -> CrawlConfig:
    base = dict(
        checkpoint_dir=tmp, max_waves=16, tokens_per_shard=32, n_shards=8, salt_bits=2,
        bloom=bloom.BloomConfig(n_buckets=8, m_bits=1 << 16),
    )
    base.update(kw)
    return CrawlConfig(**base)


@pytest.fixture(scope="module")
def crawl(spark):
    tmp = "/tmp/crawl_itest"
    shutil.rmtree(tmp, ignore_errors=True)
    eng = CrawlEngine(spark, _cfg(tmp), seeds=seeds_df(spark, SEED_ROWS))
    out = eng.run()
    return out["store"]


class TestCrawlInvariants:
    def test_inventory_clamp(self, spark, crawl):
        """inventory = min(999, stock) as string — the screenshots/0.png
        behavior (getStockNumber.py:125-139)."""
        rows = crawl.load_deltas("cart_results").collect()
        assert rows
        for r in rows:
            stock = world.product_stock(r.asin)
            assert r.inventory == str(min(999, stock))
            if stock >= 999:
                assert r.alert == ""
            else:
                assert str(stock) in r.alert

    def test_images_match_details(self, spark, crawl):
        """every fetched detail page yields exactly one image+caption row
        with engine-recomputed phash equal to the world's (input_hint)."""
        details = crawl.load_deltas("detail_results")
        images = crawl.load_deltas("images")
        assert images.count() == details.count()
        for r in images.limit(20).collect():
            asin = r.image_id[len("img-") :]
            rec = world.image_record(asin)
            assert (r.w, r.h, r.fmt, r.phash) == (rec["w"], rec["h"], rec["fmt"], rec["phash"])
            assert r.caption == rec["caption"]

    def test_seen_has_no_duplicates_and_respects_robots(self, spark, crawl):
        seen = crawl.load_deltas("seen")
        assert seen.count() == seen.select("canonical_url").distinct().count()
        for r in seen.collect():
            assert world.robots_allowed(r.canonical_url)

    def test_metrics_and_lineage_present(self, spark, crawl):
        m = crawl.load_deltas("metrics")
        assert m.filter(F.col("n_fetched") > 0).count() > 0
        lin = crawl.load_deltas("lineage")
        # lineage covers every fetch with its partition id
        assert lin.count() == m.agg(F.sum("n_fetched")).collect()[0][0]


class TestResume:
    def test_exact_resume_matches_uninterrupted(self, spark):
        a, b = "/tmp/crawl_full", "/tmp/crawl_resume"
        for t in (a, b):
            shutil.rmtree(t, ignore_errors=True)
        seeds = seeds_df(spark, SEED_ROWS)

        full = CrawlEngine(spark, _cfg(a, max_waves=10), seeds=seeds).run()["store"]

        # interrupted: stop after 3 waves, then resume to completion
        CrawlEngine(spark, _cfg(b, max_waves=3), seeds=seeds).run()
        resumed = CrawlEngine(spark, _cfg(b, max_waves=10), seeds=seeds).run(resume=True)["store"]

        seen_a = {r.canonical_url for r in full.load_deltas("seen").collect()}
        seen_b = {r.canonical_url for r in resumed.load_deltas("seen").collect()}
        assert seen_a == seen_b
        ord_a = sorted((r.wave, r.canonical_url) for r in full.load_deltas("lineage").collect())
        ord_b = sorted((r.wave, r.canonical_url) for r in resumed.load_deltas("lineage").collect())
        assert ord_a == ord_b


class TestReports:
    def test_rank_report_format(self, spark, crawl):
        rr = reports.rank_report(crawl, seeds_df(spark, SEED_ROWS)).collect()
        assert len(rr) == 1  # one keyword seed
        s = rr[0].rank_string
        assert s == "大于8页" or ("广告)/" in s and s.endswith("自然)"))

    def test_inventory_report_join(self, spark, crawl):
        inv = reports.inventory_report(crawl)
        rows = inv.collect()
        assert rows
        assert {r.asin for r in rows} <= {
            r.asin for r in crawl.load_deltas("detail_results").collect()
        }

    def test_bsr_report_rollup(self, spark, crawl):
        out = reports.bsr_report(crawl).collect()
        assert out
        for r in out:
            assert r.n_skus == len(r.bsr_report.split("|"))
