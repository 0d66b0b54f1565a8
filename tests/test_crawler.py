"""Crawl engine integration: invariants, reports, exact resume (C6/S10)."""

from __future__ import annotations

import os
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


class TestPriorityQueue:
    def test_indegree_priority_is_nonvacuous_and_reorders(self, spark):
        """W4/north_star: the page-rank-like score must (a) actually take
        values >1 on the synthetic world (popular-pool ASINs shared across
        keywords) and (b) move those URLs ahead of earlier-discovered
        depth-peers in the dequeue."""
        tmp = "/tmp/crawl_prio_test"
        shutil.rmtree(tmp, ignore_errors=True)
        rows = [
            (i, "keyword", f"kw {i} synth", world.serp_url(f"kw {i} synth", 1), "yogamat", 2)
            for i in range(24)
        ]
        # one wave only: the frontier left behind is exactly wave 0's
        # expansion, with in-wave in-degrees attached
        eng = CrawlEngine(
            spark, _cfg(tmp, max_waves=1, tokens_per_shard=64), seeds=seeds_df(spark, rows)
        )
        eng.run()
        fr = eng.store.load_snapshot("frontier")
        dist = {
            r["priority_score"]: r["n"]
            for r in fr.groupBy("priority_score").agg(F.count("*").alias("n")).collect()
        }
        assert any(p > 1.0 for p in dist), f"priority is vacuous: {dist}"

        # dequeue order check: within every (shard, depth), no URL with a
        # strictly lower score may precede a higher-scored one
        from amazonwebcrawler_spark.operators.politeness import select_wave_batch

        batch, deferred = select_wave_batch(fr, tokens_per_shard=5)
        b = batch.select("host_shard", "depth", "priority_score").collect()
        d = deferred.select("host_shard", "depth", "priority_score").collect()
        worst_batch = {}
        for r in b:
            k = (r.host_shard, r.depth)
            worst_batch[k] = min(worst_batch.get(k, float("inf")), r.priority_score)
        for r in d:
            k = (r.host_shard, r.depth)
            if k in worst_batch:
                assert r.priority_score <= worst_batch[k], (
                    f"deferred row with score {r.priority_score} outranks "
                    f"batch minimum {worst_batch[k]} in {k}"
                )
        shutil.rmtree(tmp, ignore_errors=True)


class TestQuarantine:
    def test_other_layout_routes_to_quarantine(self, spark):
        """W3: rows from unknown-layout SERPs land in the quarantine table
        (getRank.py:317-328's 'Other mode' 3000s sleep), never in results."""
        tmp = "/tmp/crawl_quarantine"
        shutil.rmtree(tmp, ignore_errors=True)
        # 'probe kw 5' page 1 deterministically renders the 'other' layout
        # with own-product items (synthetic_world.serp_page layout hash)
        seeds = [(0, "keyword", "probe kw 5", world.serp_url("probe kw 5", 1), "yogamat", 1)]
        eng = CrawlEngine(
            spark,
            _cfg(tmp, max_waves=1, follow_items=False, follow_skus=False, probe_inventory=False),
            seeds=seeds_df(spark, seeds),
        )
        store = eng.run()["store"]
        q = store.load_deltas("quarantine")
        assert q is not None and q.count() > 0
        assert {r.rank for r in q.collect()} == {"Other mode"}
        results = store.load_deltas("results")
        if results is not None:
            assert results.filter(F.col("rank") == "Other mode").count() == 0


class TestEarlyStop:
    def test_early_stop_fetches_fewer_pages(self, spark):
        """A3/L2: once a seed has its first ad + first natural own hit, its
        pagination stops (reference core loop, getRank.py:208-209,468-469).
        'probe kw 4' page 1 contains both hits → early-stop crawls 1 serp
        page where the exhaustive run crawls max_depth."""
        import tests.oracle as oracle_mod

        seeds = [(0, "keyword", "probe kw 4", world.serp_url("probe kw 4", 1), "yogamat", 6)]
        counts = {}
        for flag in (True, False):
            tmp = f"/tmp/crawl_es_{flag}"
            shutil.rmtree(tmp, ignore_errors=True)
            eng = CrawlEngine(
                spark,
                _cfg(tmp, max_waves=10, early_stop=flag,
                     follow_items=False, follow_skus=False, probe_inventory=False),
                seeds=seeds_df(spark, seeds),
            )
            store = eng.run()["store"]
            lineage = store.load_deltas("lineage")
            counts[flag] = lineage.count()
            # engine still matches the python oracle under the same flag
            o = oracle_mod.crawl_oracle(
                seeds, n_shards=8, salt_bits=2, tokens_per_shard=32, max_waves=10,
                follow_items=False, follow_skus=False, probe_inventory=False,
                early_stop=flag,
            )
            got = sorted((r.wave, r.canonical_url) for r in lineage.collect())
            assert got == sorted(o.fetch_order), f"early_stop={flag}"
        assert counts[True] < counts[False]
        assert counts[True] == 1  # both hits on page 1 → exactly one fetch


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


class TestCompaction:
    def test_compaction_preserves_state_and_resume(self, spark):
        """Every compact_every-th wave rewrites seen/shards/seed_flags as a
        full base (manifest 'bases'); crawl results, the seen set, and exact
        resume across a compaction boundary must be identical to the
        uncompacted run."""
        a, b = "/tmp/crawl_nocompact", "/tmp/crawl_compact"
        for t in (a, b):
            shutil.rmtree(t, ignore_errors=True)
        seeds = seeds_df(spark, SEED_ROWS)
        plain = CrawlEngine(spark, _cfg(a, max_waves=10, compact_every=0), seeds=seeds).run()["store"]
        # compact every 2 waves; interrupt at 3 and resume (crosses a base)
        CrawlEngine(spark, _cfg(b, max_waves=3, compact_every=2), seeds=seeds).run()
        comp = CrawlEngine(spark, _cfg(b, max_waves=10, compact_every=2), seeds=seeds).run(
            resume=True
        )["store"]
        # a base was actually written
        base_waves = [
            w for w in comp.committed_waves()
            if "seen" in comp._manifest(w).get("bases", ()) and w >= 0
        ]
        assert base_waves, "no compaction base written"
        seen_a = {r.canonical_url for r in plain.load_deltas("seen").collect()}
        seen_b = {r.canonical_url for r in comp.load_deltas("seen").collect()}
        assert seen_a == seen_b
        ord_a = sorted((r.wave, r.canonical_url) for r in plain.load_deltas("lineage").collect())
        ord_b = sorted((r.wave, r.canonical_url) for r in comp.load_deltas("lineage").collect())
        assert ord_a == ord_b
        # shard state reconstructs identically (bucket → n_items)
        sa = {r.bucket: r.n_items for r in plain.load_shard_state().collect()}
        sb = {r.bucket: r.n_items for r in comp.load_shard_state().collect()}
        assert sa == sb

    def test_crash_between_base_write_and_manifest_rename(self, spark):
        """Kill mid-compaction: the compacting wave's base FILES are on disk
        but its manifest rename never happened. The manifest is the commit
        point — loaders must ignore the orphan wave directories and serve
        the pre-compaction delta chain unchanged, and resume must complete
        identically to an uninterrupted run."""
        import os

        a, b = "/tmp/crawl_full_mc", "/tmp/crawl_crash_mc"
        for t in (a, b):
            shutil.rmtree(t, ignore_errors=True)
        seeds = seeds_df(spark, SEED_ROWS)
        full = CrawlEngine(spark, _cfg(a, max_waves=10, compact_every=2), seeds=seeds).run()["store"]

        eng = CrawlEngine(spark, _cfg(b, max_waves=3, compact_every=2), seeds=seeds)
        eng.run()
        store = eng.store
        pre_seen = sorted(r.canonical_url for r in store.load_deltas("seen").collect())
        pre_shards = {r.bucket: r.n_items for r in store.load_shard_state().collect()}

        # simulate the torn compaction: wave files for the NEXT wave appear
        # (a full base-style rewrite), manifest-<next>.json does not
        next_wave = store.committed_waves()[-1] + 1
        for table in ("seen", "shards"):
            src_wave = max(
                w for w in store.committed_waves()
                if table in store._manifest(w)["tables"]
            )
            src = store._manifest(src_wave)["tables"][table]
            shutil.copytree(src, os.path.join(b, table, f"wave={next_wave}"))
        # ...and the torn manifest tmp file is also on disk, never renamed
        with open(os.path.join(b, "_manifests", f".manifest-{next_wave}.tmp"), "w") as f:
            f.write("{\"torn\": true}")

        # loaders see the PRE-compaction chain, byte-identical
        assert store.committed_waves()[-1] == next_wave - 1
        post_seen = sorted(r.canonical_url for r in store.load_deltas("seen").collect())
        post_shards = {r.bucket: r.n_items for r in store.load_shard_state().collect()}
        assert post_seen == pre_seen
        assert post_shards == pre_shards

        # resume overwrites the orphan directories and completes exactly
        resumed = CrawlEngine(spark, _cfg(b, max_waves=10, compact_every=2), seeds=seeds).run(
            resume=True
        )["store"]
        seen_a = {r.canonical_url for r in full.load_deltas("seen").collect()}
        seen_b = {r.canonical_url for r in resumed.load_deltas("seen").collect()}
        assert seen_a == seen_b
        ord_a = sorted((r.wave, r.canonical_url) for r in full.load_deltas("lineage").collect())
        ord_b = sorted((r.wave, r.canonical_url) for r in resumed.load_deltas("lineage").collect())
        assert ord_a == ord_b
        sa = {r.bucket: r.n_items for r in full.load_shard_state().collect()}
        sb = {r.bucket: r.n_items for r in resumed.load_shard_state().collect()}
        assert sa == sb


class TestPrunedDequeue:
    def test_pruned_equals_unpruned(self, spark):
        """The depth-pruned dequeue is a pure read optimization: seen set,
        per-wave fetch ordering, and discovery sequences must be
        byte-identical with pruning on vs off."""
        res = {}
        for prune in (True, False):
            tmp = f"/tmp/crawl_prunecmp_{prune}"
            shutil.rmtree(tmp, ignore_errors=True)
            cfg = _cfg(tmp, tokens_per_shard=4, pruned_dequeue=prune)
            st = CrawlEngine(spark, cfg, seeds=seeds_df(spark, SEED_ROWS)).run()["store"]
            res[prune] = (
                sorted((r.canonical_url, r.discovery_seq) for r in st.load_deltas("seen").collect()),
                sorted((r.wave, r.canonical_url) for r in st.load_deltas("lineage").collect()),
            )
        assert res[True] == res[False]
        assert len(res[True][0]) > 50  # non-vacuous crawl

    def test_exact_confirm_modes_identical(self, spark):
        """'shard_sets' (exact membership riding the bloom cogroup — no
        seen-table scan, no anti-join) must produce the SAME crawl as the
        default seen-table left_anti: seen set, discovery sequences, and
        per-wave lineage ordering all byte-identical."""
        res = {}
        for mode in ("seen_table", "shard_sets"):
            tmp = f"/tmp/crawl_confirm_{mode}"
            shutil.rmtree(tmp, ignore_errors=True)
            cfg = _cfg(tmp, tokens_per_shard=4, exact_confirm=mode)
            st = CrawlEngine(spark, cfg, seeds=seeds_df(spark, SEED_ROWS)).run()["store"]
            res[mode] = (
                sorted((r.canonical_url, r.discovery_seq) for r in st.load_deltas("seen").collect()),
                sorted((r.wave, r.canonical_url) for r in st.load_deltas("lineage").collect()),
            )
        assert res["seen_table"] == res["shard_sets"]
        assert len(res["seen_table"][0]) > 50

    def test_shard_sets_resume_exact(self, spark):
        """Exact resume must hold in shard_sets mode too: the per-bucket
        key-hash sets reconstruct from the COW chain (latest version per
        bucket) and the resumed crawl equals the uninterrupted one."""
        a, b = "/tmp/crawl_ss_full", "/tmp/crawl_ss_resume"
        for t in (a, b):
            shutil.rmtree(t, ignore_errors=True)
        seeds = seeds_df(spark, SEED_ROWS)
        full = CrawlEngine(
            spark, _cfg(a, max_waves=10, exact_confirm="shard_sets"), seeds=seeds
        ).run()["store"]
        CrawlEngine(spark, _cfg(b, max_waves=2, exact_confirm="shard_sets"), seeds=seeds).run()
        resumed = CrawlEngine(
            spark, _cfg(b, max_waves=10, exact_confirm="shard_sets"), seeds=seeds
        ).run(resume=True)["store"]
        seen_a = sorted((r.canonical_url, r.discovery_seq) for r in full.load_deltas("seen").collect())
        seen_b = sorted((r.canonical_url, r.discovery_seq) for r in resumed.load_deltas("seen").collect())
        assert seen_a == seen_b
        ord_a = sorted((r.wave, r.canonical_url) for r in full.load_deltas("lineage").collect())
        ord_b = sorted((r.wave, r.canonical_url) for r in resumed.load_deltas("lineage").collect())
        assert ord_a == ord_b

    def test_shard_sets_collision_failure_mode(self, spark, monkeypatch):
        """Pin the documented shard_sets caveat (operators/bloom.py module
        docstring): exactness holds only up to xxhash64 collisions on h1 —
        a colliding NEW url is wrongly reported exact_seen and dropped.
        Force collisions by truncating h1 to 6 bits (64 slots << #URLs) and
        crawl the same seeds in both modes to exhaustion. The md5-exact
        seen_table crawl is the oracle: it is unaffected by the truncation
        (its confirm anti-joins on canonical_url), and the divergence it
        detects must be exactly the documented failure mode — shard_sets'
        seen set is a strict subset, and every URL it dropped collides with
        an earlier-admitted key in the truncated hash space."""
        from amazonwebcrawler_spark.operators import bloom as bloom_mod

        def truncated_keys(df, url_col, cfg):
            return (
                df.withColumn(
                    "h1", F.pmod(F.xxhash64(F.col(url_col)), F.lit(64))
                )
                .withColumn("h2", F.xxhash64(F.col(url_col), F.lit("s2")))
                .withColumn(
                    "bucket", F.pmod(F.col("h1"), F.lit(cfg.n_buckets)).cast("int")
                )
            )

        monkeypatch.setattr(bloom_mod, "with_bloom_keys", truncated_keys)
        seen = {}
        for mode in ("seen_table", "shard_sets"):
            tmp = f"/tmp/crawl_collision_{mode}"
            shutil.rmtree(tmp, ignore_errors=True)
            cfg = _cfg(tmp, max_waves=16, early_stop=False, exact_confirm=mode)
            st = CrawlEngine(spark, cfg, seeds=seeds_df(spark, SEED_ROWS)).run()["store"]
            seen[mode] = {r.canonical_url for r in st.load_deltas("seen").collect()}
            shutil.rmtree(tmp, ignore_errors=True)

        oracle, ss = seen["seen_table"], seen["shard_sets"]
        # the oracle crawl is a full crawl (same URL universe as an
        # unpatched run would admit — md5-exact confirm ignores h1)
        assert len(oracle) > 100
        # documented failure mode, detected by the equivalence oracle:
        assert ss < oracle, "expected shard_sets to drop colliding URLs"
        missing = oracle - ss
        # ...and nothing else: every dropped URL collides (truncated-h1
        # equality) with a URL that shard_sets DID admit to the seen set
        tv = {
            r.u: r.v
            for r in spark.createDataFrame(
                [(u,) for u in oracle], "u string"
            ).select("u", F.pmod(F.xxhash64("u"), F.lit(64)).alias("v")).collect()
        }
        admitted_vals = {tv[u] for u in ss}
        for u in missing:
            assert tv[u] in admitted_vals, f"dropped URL {u} has no collision partner"

    def test_load_frontier_prunes_exactly(self, spark):
        """Handcrafted snapshot with every shard holding ≥ tokens rows at
        depth 0: _load_frontier must return ONLY depth 0 as hot (the exact
        bound), the rest as cold, with partition pruning visible in the
        scan (PartitionFilters on depth — unread depths never touch Spark)."""
        import io
        import os
        from contextlib import redirect_stdout

        from amazonwebcrawler_spark.plans.crawler import FRONTIER_SCHEMA

        tmp = "/tmp/crawl_prune_unit"
        shutil.rmtree(tmp, ignore_errors=True)
        cfg = _cfg(tmp, tokens_per_shard=2, n_shards=4)
        eng = CrawlEngine(spark, cfg, seeds=seeds_df(spark, SEED_ROWS))
        rows = [
            (100 * d + 10 * s + i, "serp", f"https://www.amazon.com/s?d={d}&s={s}&i={i}",
             d, 100 * d + 10 * s + i, 0.0, 0, -1, 0, "www.amazon.com", s, "yogamat", 5, "kw")
            for d in (0, 1, 2)
            for s in range(4)
            for i in range(3)
        ]
        frontier = spark.createDataFrame(rows, FRONTIER_SCHEMA)
        eng.store.commit_wave(
            0, {"frontier": frontier}, {"next_seq": 0},
            partition_cols=CrawlEngine.FRONTIER_PARTITIONING,
        )
        hot, cold = eng._load_frontier()
        assert cold is not None
        assert hot.count() == 12 and cold.count() == 24
        assert {r.depth for r in hot.select("depth").distinct().collect()} == {0}
        assert {r.depth for r in cold.select("depth").distinct().collect()} == {1, 2}
        buf = io.StringIO()
        with redirect_stdout(buf):
            hot.explain("formatted")
        txt = buf.getvalue()
        assert "PartitionFilters" in txt and "depth" in txt
        # layout on disk is really (depth, host_shard) partitioned
        fdir = eng.store.latest_manifest()["tables"]["frontier"]
        assert os.path.isdir(os.path.join(fdir, "depth=0", "host_shard=0"))


#: columns that are execution artifacts, not data — excluded from the
#: run-vs-run state comparison (wall-clock timings, physical partition ids)
_NONDET_COLS = {"wave_t_start", "wave_build_sec", "partition_id"}


def _table_rows(df):
    """Order-insensitive, nondeterminism-stripped row multiset (or None)."""
    if df is None:
        return None
    cols = sorted(c for c in df.columns if c not in _NONDET_COLS)
    return sorted(
        tuple(bytes(x) if isinstance(x, (bytearray, memoryview)) else x for x in r)
        for r in df.select(*cols).collect()
    )


class TestTimeTravel:
    def test_as_of_wave_equals_interrupted_run(self, spark):
        """Iceberg-style snapshot time travel: reading state `as_of_wave=k`
        from a finished run must equal what a run stopped after wave k
        actually held — for EVERY delta table (state_store.DELTA_TABLES,
        the claim at state_store.py load_deltas), the frontier snapshot,
        and the COW shard state."""
        from amazonwebcrawler_spark.sources.state_store import DELTA_TABLES

        a, b = "/tmp/crawl_tt_full", "/tmp/crawl_tt_part"
        for t in (a, b):
            shutil.rmtree(t, ignore_errors=True)
        seeds = seeds_df(spark, SEED_ROWS)
        full = CrawlEngine(spark, _cfg(a, max_waves=10), seeds=seeds).run()["store"]
        part = CrawlEngine(spark, _cfg(b, max_waves=2), seeds=seeds).run()["store"]
        k = part.committed_waves()[-1]
        assert k < full.committed_waves()[-1], "need a strictly earlier wave"

        nonempty = 0
        for name in DELTA_TABLES:
            tt = _table_rows(full.load_deltas(name, as_of_wave=k))
            pt = _table_rows(part.load_deltas(name))
            assert tt == pt, f"as_of_wave mismatch for delta table {name!r}"
            if pt:
                nonempty += 1
        # the sweep must not be vacuous: most delta tables exist by wave k
        assert nonempty >= 6, f"only {nonempty} delta tables materialized"

        tt_frontier = {r.canonical_url for r in full.load_snapshot("frontier", as_of_wave=k).collect()}
        part_frontier = {r.canonical_url for r in part.load_snapshot("frontier").collect()}
        assert tt_frontier == part_frontier

        tt_shards = {r.bucket: r.n_items for r in full.load_shard_state(as_of_wave=k).collect()}
        part_shards = {r.bucket: r.n_items for r in part.load_shard_state().collect()}
        assert tt_shards == part_shards

        # latest read is unchanged by the parameter's existence
        assert full.load_deltas("seen", as_of_wave=None).count() == full.load_deltas("seen").count()


class TestReports:
    def test_rank_report_format(self, spark, crawl):
        import re

        rr = reports.rank_report(crawl, seeds_df(spark, SEED_ROWS)).collect()
        assert len(rr) == 1  # one keyword seed
        s = rr[0].rank_string
        # reference formats: '大于8页', 'x(a广告)/y(b自然)', one-sided '()'
        assert s == "大于8页" or re.fullmatch(r"(\(\)|.+广告\))/(\(\)|.+自然\))", s), s

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

    def test_titles_report_order_and_index(self, spark, crawl):
        """getTitle.py pipeline (S9/P3): titles per keyword in crawl order,
        with BOTH the 1-based pos and getTitle's 0-based index
        (getTitle.py:103)."""
        from collections import defaultdict

        rows = reports.titles_report(crawl).collect()
        assert rows
        # r["index"]: pyspark Row inherits tuple, so .index is a method
        assert all(r["index"] == r.pos - 1 for r in rows)
        by_kw = defaultdict(list)
        for r in rows:
            by_kw[r.keyword].append((r.page, r.pos))
        for kw, seq in by_kw.items():
            assert seq == sorted(seq), kw

    def test_save_reports_sheet_per_keyword_sink(self, spark, crawl, tmp_path):
        """S7-S9 sinks: ranks (tall), inventory (row-append, L3 top_n cut),
        titles partitioned by keyword — the 'worksheet per keyword' layout
        (getTitle.py:143)."""
        import os

        out = str(tmp_path / "reports")
        reports.save_reports(crawl, seeds_df(spark, SEED_ROWS), out, top_n=3)
        parts = os.listdir(f"{out}/titles")
        assert any(p.startswith("keyword=") for p in parts), parts
        titles_back = spark.read.parquet(f"{out}/titles")
        assert titles_back.count() == reports.titles_report(crawl).count()
        inv = spark.read.parquet(f"{out}/inventory")
        assert inv.count() > 0
        assert inv.agg(F.max("order")).collect()[0][0] <= 3  # L3 head-N cut
        ranks = spark.read.parquet(f"{out}/ranks")
        assert ranks.count() == 1  # one keyword seed


class TestConfigValidation:
    def test_exact_confirm_typo_raises(self):
        """A misspelled confirm mode must error at construction, not fall
        through silently to the seen_table branch."""
        with pytest.raises(ValueError, match="exact_confirm"):
            CrawlConfig(checkpoint_dir="/tmp/unused_cfg", exact_confirm="shard_set")

    def test_track_keys_wired_to_confirm_mode(self):
        """seen_table keeps the lean shard state (no key sets); shard_sets
        turns the sets on — regardless of the BloomConfig passed in."""
        a = CrawlConfig(checkpoint_dir="/tmp/unused_cfg")
        assert a.bloom.track_keys is False
        b = CrawlConfig(checkpoint_dir="/tmp/unused_cfg", exact_confirm="shard_sets")
        assert b.bloom.track_keys is True


class TestExpiration:
    """Iceberg-style snapshot expiration (state_store.expire_snapshots):
    superseded frontier rewrites and pre-base hot-state deltas are
    reclaimed; everything reachable from the retention window is
    byte-identical before and after; expired time travel raises."""

    def _run(self, spark, tmp, max_waves, compact_every=2):
        shutil.rmtree(tmp, ignore_errors=True)
        eng = CrawlEngine(
            spark,
            _cfg(tmp, max_waves=max_waves, compact_every=compact_every),
            seeds=seeds_df(spark, SEED_ROWS),
        )
        return eng.run()["store"]

    def test_expire_reclaims_only_unreachable(self, spark):
        import os

        store = self._run(spark, "/tmp/crawl_expire", max_waves=6)
        waves = store.committed_waves()
        assert len(waves) >= 5
        before = {
            name: sorted(map(tuple, store.load_deltas(name).collect()))
            for name in ("results", "images", "seen")
        }
        # (the FINAL frontier snapshot is empty — dynamic-partition writes
        # emit no files for an empty DF, so it is asserted via disk paths,
        # not via a read; the loop itself uses the manifest footer counter)

        out = store.expire_snapshots(keep_last=2)
        assert out["retained_waves"] == waves[-2:]
        deleted_tables = {t for t, _ in out["deleted"]}
        # superseded full frontier rewrites are the guaranteed garbage
        assert "frontier" in deleted_tables
        assert out["bytes_reclaimed"] > 0
        # deleted dirs are gone from disk; retained frontier still present
        for t, w in out["deleted"]:
            assert not os.path.isdir(os.path.join(store.root, t, f"wave={w}"))

        # everything reachable is unchanged
        for name, want in before.items():
            assert sorted(map(tuple, store.load_deltas(name).collect())) == want
        # the retained waves' frontier paths survive on disk
        retained_frontiers = [
            store._manifest(w)["tables"]["frontier"]
            for w in out["retained_waves"]
            if "frontier" in store._manifest(w)["tables"]
        ]
        assert retained_frontiers
        deleted_paths = {os.path.join(store.root, t, f"wave={w}") for t, w in out["deleted"]}
        assert not set(retained_frontiers) & deleted_paths

        # live delta tables (no compaction base) lose NOTHING
        assert not {"results", "images", "metrics", "lineage"} & deleted_tables

    def test_expired_time_travel_raises(self, spark):
        store = self._run(spark, "/tmp/crawl_expire_tt", max_waves=6)
        waves = store.committed_waves()
        old = waves[0]
        # pre-expiration: time travel works
        assert store.load_snapshot("frontier", as_of_wave=old) is not None
        store.expire_snapshots(keep_last=2)
        with pytest.raises(ValueError, match="snapshot expired"):
            store.load_snapshot("frontier", as_of_wave=old)

    def test_resume_after_expiration(self, spark):
        """Expiration must not break the resume path: continue the crawl
        after expiring, and the result equals an uninterrupted run."""
        tmp = "/tmp/crawl_expire_resume"
        store = self._run(spark, tmp, max_waves=3)
        store.expire_snapshots(keep_last=1)
        eng = CrawlEngine(
            spark, _cfg(tmp, max_waves=16, compact_every=2), seeds=seeds_df(spark, SEED_ROWS)
        )
        resumed = eng.run(resume=True)["store"]
        full = self._run(spark, "/tmp/crawl_expire_full", max_waves=16)
        for name in ("results", "seen", "images"):
            a = sorted(map(tuple, resumed.load_deltas(name).collect()))
            b = sorted(map(tuple, full.load_deltas(name).collect()))
            assert a == b

    def test_keep_last_validation(self, spark):
        store = self._run(spark, "/tmp/crawl_expire_val", max_waves=2)
        with pytest.raises(ValueError, match="keep_last"):
            store.expire_snapshots(keep_last=0)

    def test_unknown_table_never_deleted(self, spark):
        """ADVICE r4: reachability is computed only for the known table
        lists — a table committed under any OTHER name (a future
        commit_wave addition, an external caller) has no loader chain, so
        expiration must skip it (conservative never-delete), not treat it
        as unreachable garbage."""
        import json
        import os

        store = self._run(spark, "/tmp/crawl_expire_unknown", max_waves=6)
        waves = store.committed_waves()
        old = waves[0]
        # plant a table name outside SNAPSHOT/COW/DELTA_TABLES in an OLD
        # wave's manifest, pointing at a real directory with a real file
        side_dir = os.path.join(store.root, "side_metrics", f"wave={old}")
        os.makedirs(side_dir, exist_ok=True)
        with open(os.path.join(side_dir, "part-0.json"), "w") as f:
            f.write('{"x": 1}')
        mpath = os.path.join(store.root, "_manifests", f"manifest-{old}.json")
        with open(mpath) as f:
            m = json.load(f)
        m["tables"]["side_metrics"] = side_dir
        with open(mpath, "w") as f:
            json.dump(m, f)

        out = store.expire_snapshots(keep_last=2)
        assert os.path.isdir(side_dir), "unknown table was deleted while live"
        assert "side_metrics" not in {t for t, _ in out["deleted"]}
        # the known garbage is still reclaimed
        assert "frontier" in {t for t, _ in out["deleted"]}


class TestOrphans:
    """Orphan wave-directory scan/sweep (state_store.orphan_scan /
    delete_orphans): directories written by a crashed commit (no manifest)
    are found, age-guarded, and reclaimed; committed and expired paths are
    never touched; resume semantics are unaffected."""

    def _store(self, spark, tmp):
        shutil.rmtree(tmp, ignore_errors=True)
        eng = CrawlEngine(
            spark, _cfg(tmp, max_waves=4), seeds=seeds_df(spark, SEED_ROWS)
        )
        return eng.run()["store"]

    def test_scan_finds_only_crashed_writes(self, spark):
        import os

        store = self._store(spark, "/tmp/crawl_orphans")
        assert store.orphan_scan() == {"orphans": [], "bytes": 0}

        # simulate a crash: wave dirs written, manifest never renamed
        crash_wave = max(store.committed_waves()) + 1
        spark.range(10).write.parquet(
            os.path.join(store.root, "results", f"wave={crash_wave}")
        )
        spark.range(3).write.parquet(
            os.path.join(store.root, "metrics", f"wave={crash_wave}")
        )
        scan = store.orphan_scan()
        got = {(t, os.path.basename(p)) for t, p, _sz in scan["orphans"]}
        assert got == {
            ("results", f"wave={crash_wave}"),
            ("metrics", f"wave={crash_wave}"),
        }
        assert scan["bytes"] > 0

        # resume ignores the stranded dirs: loaders read manifests only
        n_results = store.load_deltas("results").count()
        assert n_results == spark.read.parquet(
            *[store._manifest(w)["tables"]["results"]
              for w in store.committed_waves()
              if "results" in store._manifest(w)["tables"]]
        ).count()

    def test_age_guard_then_sweep(self, spark):
        import os

        store = self._store(spark, "/tmp/crawl_orphans2")
        crash_wave = max(store.committed_waves()) + 1
        p = os.path.join(store.root, "results", f"wave={crash_wave}")
        spark.range(5).write.parquet(p)

        # young orphan: skipped by the age guard (an in-flight commit keeps
        # refreshing mtimes, so it can never look old enough)
        out = store.delete_orphans(min_age_s=3600)
        assert out["deleted"] == [] and out["skipped_young"] == [p]
        assert os.path.isdir(p)

        out = store.delete_orphans(min_age_s=0)
        assert out["deleted"] == [p] and out["bytes_reclaimed"] > 0
        assert not os.path.exists(p)
        assert store.orphan_scan() == {"orphans": [], "bytes": 0}

    def test_expired_paths_not_reported_as_orphans(self, spark):
        store = self._store(spark, "/tmp/crawl_orphans3")
        store.expire_snapshots(keep_last=1)
        # expire tombstones paths and deletes them; nothing left to scan
        assert store.orphan_scan()["orphans"] == []


class TestFileSkipPlanning:
    """state_store.file_column_ranges / plan_file_skips — footer-stats
    scan planning (the Iceberg data-file-bounds analogue): range-clustered
    writes prove files irrelevant; statless columns are read
    conservatively."""

    def _clustered(self, spark, tmp_path):
        p = str(tmp_path / "clustered")
        df = spark.range(0, 1000).select(
            F.col("id").alias("url_hash"), (F.col("id") % 7).alias("depth")
        )
        df.repartitionByRange(4, "url_hash").sortWithinPartitions("url_hash").write.mode(
            "overwrite"
        ).parquet(p)
        return p

    def test_point_lookup_reads_one_file(self, spark, tmp_path):
        from amazonwebcrawler_spark.sources.state_store import plan_file_skips

        p = self._clustered(spark, tmp_path)
        plan = plan_file_skips(p, "url_hash", lo=500, hi=500)
        assert plan["files"] >= 4
        assert len(plan["read"]) == 1
        assert plan["rows_read"] + plan["rows_skipped"] == 1000
        # and the plan is CORRECT: the kept file really contains the row
        got = spark.read.parquet(*plan["read"]).filter("url_hash = 500").count()
        assert got == 1

    def test_range_predicate_and_open_ends(self, spark, tmp_path):
        from amazonwebcrawler_spark.sources.state_store import (
            file_column_ranges,
            plan_file_skips,
        )

        p = self._clustered(spark, tmp_path)
        ranges = file_column_ranges(p, "url_hash")
        assert all(mn is not None for _, mn, _mx, _n in ranges)
        # every row below 250: only files whose min <= 249 survive
        plan = plan_file_skips(p, "url_hash", hi=249)
        kept_rows = spark.read.parquet(*plan["read"]).filter("url_hash <= 249").count()
        assert kept_rows == 250
        for f in plan["skipped"]:
            assert not [r for r in ranges if r[0] == f and r[1] <= 249]
        # no predicate -> nothing skipped
        assert plan_file_skips(p, "url_hash")["skipped"] == []

    def test_unclustered_column_skips_nothing_wrong(self, spark, tmp_path):
        from amazonwebcrawler_spark.sources.state_store import plan_file_skips

        p = self._clustered(spark, tmp_path)
        # depth cycles 0..6 in every file: no file is prunable for depth=3
        plan = plan_file_skips(p, "depth", lo=3, hi=3)
        assert plan["skipped"] == []

    def test_missing_column_and_missing_stats_are_read(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from amazonwebcrawler_spark.sources.state_store import plan_file_skips

        p = str(tmp_path / "nostats")
        os.makedirs(p)
        t = pa.table({"k": [1, 2, 3]})
        pq.write_table(t, os.path.join(p, "a.parquet"), write_statistics=False)
        pq.write_table(t, os.path.join(p, "b.parquet"))
        # no stats in a.parquet -> conservative read; b.parquet prunable
        plan = plan_file_skips(p, "k", lo=10, hi=20)
        assert [os.path.basename(f) for f in plan["read"]] == ["a.parquet"]
        assert [os.path.basename(f) for f in plan["skipped"]] == ["b.parquet"]
        # column absent entirely -> everything read
        plan2 = plan_file_skips(p, "nope", lo=0, hi=1)
        assert plan2["skipped"] == []
