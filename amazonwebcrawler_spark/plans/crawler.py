"""The wave-loop crawl engine (SURVEY.md §3, C1-C8, M2/M3).

The reference is one synchronous loop: fetch page → parse → classify → maybe
turn page (getRank.py:461-474). Here each *wave* is a declarative DataFrame
DAG over the whole frontier; the only driver-side control flow is the loop
predicate (frontier emptiness + early-stop flags — tiny collects, C5/A3):

    while frontier non-empty:
        batch, deferred = token-bucket dequeue per host shard   (C2, W4)
        fetched  = batch.mapInPandas(fetch)                      (S4-S6)
        parsed   = from_json per page kind                       (P1-P13)
        results |= classify ⨝ broadcast(dims) + rank encode      (J1/J2, W1-W3)
        images  |= decode/phash pandas-UDF over fetched bytes    (S12, input_hint)
        expand   = pagination + item/sku/cart fan-out            (J4, L1)
        new      = canonicalize → robots → in-wave dedup →
                   bloom probe → exact anti-join confirm         (P14, C7, P15/J6)
        frontier = deferred ∪ retries ∪ new;  seen |= new        (C3)
        snapshot commit                                          (C6, S10)

Determinism: wave contents are a pure function of data — the frontier total
order is (depth, priority_score DESC, discovery_seq, canonical_url) where
``discovery_seq`` is assigned from (parent_seq, parent_pos, canonical_url)
at enqueue time and ``priority_score`` is the page-rank-like in-wave
in-degree (integer-valued, so the Python oracle reproduces it exactly). Host shards use CRC32 (reproducible in the pure-Python
oracle). Nothing depends on partitioning or timing, so local[8] and
local[32] produce byte-identical crawl orders (tests/test_equivalence.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from amazonwebcrawler_spark.functions.rank import (
    first_match_struct,
    is_sponsored,
    rank_encode,
    strip_sponsored_tag,
)
from amazonwebcrawler_spark.functions.urls import canonicalize_url, url_host
from amazonwebcrawler_spark.operators import bloom
from amazonwebcrawler_spark.operators.politeness import assign_discovery_seq, select_wave_batch
from amazonwebcrawler_spark.sources import synthetic_world as world
from amazonwebcrawler_spark.sources.seeds import dims_df, seeds_df
from amazonwebcrawler_spark.sources.state_store import StateStore, partitioned_counts

# ---------------------------------------------------------------- schemas
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("seed_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("canonical_url", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovery_seq", T.LongType()),
        T.StructField("priority_score", T.DoubleType()),
        T.StructField("attempt", T.IntegerType()),
        T.StructField("parent_seq", T.LongType()),
        T.StructField("parent_pos", T.IntegerType()),
        T.StructField("host", T.StringType()),
        T.StructField("host_shard", T.IntegerType()),
        T.StructField("product_type", T.StringType()),
        T.StructField("max_depth", T.IntegerType()),
        T.StructField("keyword", T.StringType()),
    ]
)

SERP_JSON = (
    "kind string, keyword string, page int, layout string, has_next boolean, "
    "items array<struct<pos:int,title:string,href:string,is_sponsored:boolean,has_title_node:boolean>>"
)
DETAIL_JSON = (
    "kind string, asin string, title string, variant_axis string, "
    "skus array<struct<attr:string,dp_url:string>>, rank_mode string, "
    "rank1 string, rank2 string, stock int"
)
CATEGORY_JSON = (
    "kind string, category string, "
    "items array<struct<pos:int,title:string,href:string,asin:string,img_src:string>>"
)
CART_JSON = "kind string, asin string, inventory string, alert string"

IMAGES_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"


@dataclass
class CrawlConfig:
    checkpoint_dir: str
    max_waves: int = 64
    tokens_per_shard: int = 8          # politeness budget per host shard per wave
    n_shards: int = 16                 # host shards (salted, §4 skew)
    salt_bits: int = 2
    max_retries: int = 2
    follow_items: bool = True          # SERP/category items → detail pages
    follow_skus: bool = True           # detail → SKU variant pages (J4)
    probe_inventory: bool = True       # detail → cart probe (S6)
    early_stop: bool = True            # A3/L2: stop paging once first ad+natural
                                       # own hit found — the reference's core loop
                                       # semantics (getRank.py:208-209, 468-469)
    compact_every: int = 16            # every K waves, rewrite the hot state
                                       # chains (seen/shards/seed_flags) as a
                                       # full base so per-wave reads stay
                                       # O(base + K deltas), not O(all waves)
    pruned_dequeue: bool = True        # frontier snapshots partitioned by
                                       # (depth, host_shard); the politeness
                                       # dequeue reads ONLY the depth bands
                                       # the budget can consume (exact — see
                                       # _load_frontier) instead of sorting
                                       # the whole 10^10-row frontier per wave
    exact_confirm: str = "seen_table"  # 'seen_table': bloom-positive rows
                                       # confirmed by left_anti vs the exact
                                       # seen table (md5-exact, the oracle
                                       # contract) — but the seen side is a
                                       # full scan per wave at 10^10.
                                       # 'shard_sets': exact membership from
                                       # the per-bucket sorted key-hash sets
                                       # riding the SAME bloom cogroup probe
                                       # — zero extra shuffles, no seen scan
                                       # (exact up to xxhash64 collisions;
                                       # identical crawls, tested)
    bloom: bloom.BloomConfig = field(default_factory=lambda: bloom.BloomConfig(n_buckets=16, m_bits=1 << 17))

    def __post_init__(self) -> None:
        # a typo'd mode must error, not silently fall through to seen_table
        if self.exact_confirm not in ("seen_table", "shard_sets"):
            raise ValueError(
                "exact_confirm must be 'seen_table' or 'shard_sets', "
                f"got {self.exact_confirm!r}"
            )
        # wire key-set tracking to the confirm mode: seen_table keeps the
        # lean shard state (no +8 B/URL sorted key sets), shard_sets needs
        # the sets for its zero-shuffle exact membership probe
        want_keys = self.exact_confirm == "shard_sets"
        if self.bloom.track_keys != want_keys:
            import dataclasses

            self.bloom = dataclasses.replace(self.bloom, track_keys=want_keys)


# ---------------------------------------------------------------- fetch UDF
def _fetch_batches(batches):
    """mapInPandas kernel: the sandbox 'network' (synthetic_world.fetch).

    Real deployment swaps the body for an async HTTP client; the signature,
    batching, and schema are the engine contract. Transient failures are
    deterministic per (url, attempt) → status=-1, retried by the loop (C3).
    """
    for pdf in batches:
        statuses, contents, images = [], [], []
        for u, attempt in zip(pdf["canonical_url"], pdf["attempt"]):
            if world.fetch_is_transient_failure(u, int(attempt)):
                statuses.append(-1)
                contents.append(None)
                images.append(None)
            else:
                r = world.fetch(u)
                statuses.append(r["status"])
                contents.append(r["content"])
                images.append(r["image_bytes"])
        out = pdf.copy()
        out["status"] = pd.Series(statuses, dtype="int32")
        out["content"] = contents
        out["image_bytes"] = images
        yield out


def _decode_image_batches(batches):
    """mapInPandas kernel: decode fetched image bytes → typed metadata + phash
    (input_hint: decode via vectorized Arrow batches, never per-row Spark)."""
    from amazonwebcrawler_spark.functions.images import decode_image, phash64

    for pdf in batches:
        rows = []
        for url, data, caption in zip(pdf["canonical_url"], pdf["image_bytes"], pdf["caption"]):
            if data is None:
                continue
            px = decode_image(bytes(data))
            asin = url.rsplit("/dp/", 1)[-1].split("/")[0].split("?")[0]
            rows.append(
                {
                    "image_id": f"img-{asin}",
                    "bytes": bytes(data),
                    "w": px.shape[1],
                    "h": px.shape[0],
                    "fmt": "png" if bytes(data)[:8] == b"\x89PNG\r\n\x1a\n" else "jpeg",
                    "caption": caption,
                    "phash": phash64(px),
                }
            )
        yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"])


# ---------------------------------------------------------------- helpers
def _with_host_shard(df: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """CRC32-based salted host shard — CRC32 (not xxhash64) so the pure-Python
    oracle reproduces shard assignment with zlib.crc32 (SURVEY.md §4)."""
    salt = F.pmod(F.crc32(F.col("canonical_url")), F.lit(2**cfg.salt_bits))
    return df.withColumn("host", url_host(F.col("canonical_url"))).withColumn(
        "host_shard",
        F.pmod(F.crc32(F.concat(F.col("host"), F.lit("#"), salt.cast("string"))), F.lit(cfg.n_shards)).cast("int"),
    )


def _robots_df(spark: SparkSession) -> DataFrame:
    rows = [(h, d, cd) for h, (d, cd) in world.ROBOTS.items()]
    return spark.createDataFrame(rows, "host string, disallow array<string>, crawl_delay double")


def _robots_filter(df: DataFrame, robots: DataFrame) -> DataFrame:
    """C7: drop disallowed URLs before enqueue — broadcast join + exists()."""
    path = F.regexp_replace(F.col("canonical_url"), r"^https?://[^/]*", "")
    return (
        df.withColumn("_path", path)
        .join(F.broadcast(robots.select("host", "disallow")), "host", "left")
        .filter(
            F.col("disallow").isNull()
            | ~F.exists("disallow", lambda d: F.col("_path").startswith(d))
        )
        .drop("_path", "disallow")
    )


def _classify_kind(url: F.Column) -> F.Column:
    return (
        F.when(url.startswith(f"{world.HOST}/s?"), "serp")
        .when(url.startswith(f"{world.HOST}/dp/"), "detail")
        .when(url.startswith(f"{world.HOST}/gp/new-releases/"), "category")
        .when(url.startswith(f"{world.HOST}/gp/cart/view.html?"), "cart")
        .otherwise("404")
    )


class CrawlEngine:
    """Drives the wave loop over a StateStore; resumable via ``resume=True``."""

    def __init__(self, spark: SparkSession, cfg: CrawlConfig, seeds: DataFrame | None = None):
        self.spark = spark
        self.cfg = cfg
        self.seeds = seeds if seeds is not None else seeds_df(spark)
        self.dims = dims_df(spark)
        self.robots = _robots_df(spark)
        self.store = StateStore(spark, cfg.checkpoint_dir)

    # ------------------------------------------------------------ init
    def _initial_frontier(self) -> DataFrame:
        f = (
            self.seeds.withColumn("canonical_url", canonicalize_url(F.col("url")))
            .withColumn("kind", _classify_kind(F.col("canonical_url")))
            .withColumn("depth", F.lit(0))
            .withColumn("discovery_seq", F.col("seed_id"))
            .withColumn("priority_score", F.lit(0.0))
            .withColumn("attempt", F.lit(0))
            .withColumn("parent_seq", F.lit(-1).cast("long"))
            .withColumn("parent_pos", F.lit(0))
            .select(
                "seed_id", "kind", "canonical_url", "depth", "discovery_seq",
                "priority_score", "attempt", "parent_seq", "parent_pos",
                "product_type", "max_depth", "keyword",
            )
        )
        return _with_host_shard(f, self.cfg).select([f.name for f in FRONTIER_SCHEMA.fields])

    #: frontier snapshots are laid out for depth-pruned dequeue (Iceberg
    #: partition spec); depth leads because it leads the priority order
    FRONTIER_PARTITIONING: dict[str, tuple[str, ...]] = {"frontier": ("depth", "host_shard")}

    # ------------------------------------------------- pruned frontier load
    def _load_frontier(self):
        """Load the latest frontier snapshot as (hot, cold).

        ``hot`` is what the politeness dequeue ranks; ``cold`` (may be None)
        is carried forward into the next snapshot untouched. Pruning is
        EXACT, not heuristic: the priority order is depth-major
        (politeness.priority_sort_cols), so shard s's top-``tokens`` rows
        all lie within the smallest depth prefix whose cumulative row count
        reaches the budget (D_s); reading depths ≤ max_s D_s can therefore
        never change a wave's batch. The per-(depth, shard) counts come from
        parquet footers of the partitioned snapshot — driver-side, no Spark
        job. At 10^10 rows this turns the per-wave dequeue sort from
        O(frontier) into O(consumable head); the cold rows are rewritten
        untouched here (snapshot model) and become a pure metadata carry on
        real Iceberg. Falls back to (full, None) for unpartitioned layouts
        (old snapshots) or when every depth is needed.
        """
        cfg, store = self.cfg, self.store
        m = store.latest_manifest()
        if m is None or "frontier" not in m["tables"]:
            full = store.load_snapshot("frontier").select([f.name for f in FRONTIER_SCHEMA.fields])
            return full, None
        counts = partitioned_counts(m["tables"]["frontier"])
        if not counts:
            # the dynamic-partition writer emits NO files for an empty
            # frontier (a plain write leaves an empty-schema file) — an
            # empty snapshot is a normal final-wave state, not an error
            return self.spark.createDataFrame([], FRONTIER_SCHEMA), None
        full = store.load_snapshot("frontier").select([f.name for f in FRONTIER_SCHEMA.fields])
        if not cfg.pruned_dequeue:
            return full, None
        per_shard: dict[int, dict[int, int]] = {}
        for parts, n in counts.items():
            kv = dict(p.split("=", 1) for p in parts)
            if "depth" not in kv or "host_shard" not in kv:
                return full, None  # unpartitioned (pre-pruning) layout
            per_shard.setdefault(int(kv["host_shard"]), {})[int(kv["depth"])] = n
        if not per_shard:
            return full, None
        max_depth_present = max(d for ds in per_shard.values() for d in ds)
        bound = 0
        for ds in per_shard.values():
            cum, d_s = 0, max(ds)  # a shard that can't fill its budget needs all its depths
            for d in sorted(ds):
                cum += ds[d]
                if cum >= cfg.tokens_per_shard:
                    d_s = d
                    break
            bound = max(bound, d_s)
        if bound >= max_depth_present:
            return full, None  # nothing to prune this wave
        return (
            full.filter(F.col("depth") <= bound),
            full.filter(F.col("depth") > bound),
        )

    # ------------------------------------------------------------ run
    def run(self, resume: bool = False) -> dict:
        cfg, spark, store = self.cfg, self.spark, self.store

        if resume and (m := store.latest_manifest()) is not None:
            frontier, cold = self._load_frontier()
            shards = store.load_shard_state()
            wave0 = m["wave"] + 1
            next_seq = m["counters"]["next_seq"]
            n_frontier = m["counters"].get("n_frontier")
            if n_frontier is None:  # manifest predates the counter
                n_frontier = frontier.count() + (cold.count() if cold is not None else 0)
        else:
            frontier = self._initial_frontier()
            shards = bloom.empty_shards(spark, cfg.bloom)
            seen0 = bloom.with_bloom_keys(frontier.select("canonical_url"), "canonical_url", cfg.bloom)
            shards = bloom.merge_into_shards(seen0, shards, cfg.bloom)
            n_frontier = frontier.count()
            next_seq = n_frontier + 1000  # seeds occupy seq 0..n-1
            store.commit_wave(
                -1,
                {"frontier": frontier, "shards": shards, "seen": frontier.select("canonical_url", "discovery_seq")},
                {"next_seq": next_seq, "n_frontier": n_frontier},
                bases={"seen", "shards"},  # the seed commit IS the full history
                partition_cols=self.FRONTIER_PARTITIONING if cfg.pruned_dequeue else None,
            )
            frontier, cold = self._load_frontier()
            shards = store.load_shard_state()
            wave0 = 0

        last_wave = wave0 - 1
        for wave in range(wave0, cfg.max_waves):
            if n_frontier == 0:
                break
            frontier, cold, shards, next_seq, n_frontier = self._run_wave(
                wave, frontier, cold, shards, next_seq
            )
            last_wave = wave
        return {"last_wave": last_wave, "store": store}

    # ------------------------------------------------------------ one wave
    def _run_wave(
        self,
        wave: int,
        frontier: DataFrame,
        cold: DataFrame | None,
        shards: DataFrame,
        next_seq: int,
    ):
        import time as _time

        _marks: list[tuple[str, float]] = []

        def _mark(label: str) -> None:
            if os.environ.get("AWC_DEBUG_TIMING"):
                _marks.append((label, _time.time()))

        t_wave0 = _time.time()
        _mark("start")
        cfg, spark, store = self.cfg, self.spark, self.store

        batch, deferred, _ranked = select_wave_batch(
            frontier, cfg.tokens_per_shard, self.robots, return_ranked=True
        )

        # ---- fetch (S4-S6): one mapInPandas over the batch, partitioned by shard
        fetched_schema = T.StructType(
            list(batch.schema.fields)
            + [
                T.StructField("status", T.IntegerType()),
                T.StructField("content", T.StringType()),
                T.StructField("image_bytes", T.BinaryType()),
            ]
        )
        # the politeness window already hash-partitioned the cached ranked
        # frontier by host_shard (its Exchange); an explicit repartition on
        # the same key is NOT elided through the InMemoryRelation boundary
        # (verified in the plan), so only pay it when the wave actually
        # needs a different fetch-task count than the session's shuffle
        # partitioning
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
        fetch_src = (
            batch
            if n_shuffle == cfg.n_shards
            else batch.repartition(cfg.n_shards, "host_shard")
        )
        fetched = fetch_src.mapInPandas(_fetch_batches, fetched_schema).persist()

        # ---- retries / dead letters (C3)
        failed = fetched.filter(F.col("status") == -1)
        retries = (
            failed.filter(F.col("attempt") < cfg.max_retries)
            .withColumn("attempt", F.col("attempt") + 1)
            .select([f.name for f in FRONTIER_SCHEMA.fields])
        )
        dead = failed.filter(F.col("attempt") >= cfg.max_retries)
        ok = fetched.filter(F.col("status") == 200)
        _mark("fetch_declared")

        # ---- parse per kind (P1-P13): from_json, fully declarative
        serp = ok.filter(F.col("kind") == "serp").withColumn("p", F.from_json("content", SERP_JSON))
        detail = ok.filter(F.col("kind") == "detail").withColumn("p", F.from_json("content", DETAIL_JSON))
        category = ok.filter(F.col("kind") == "category").withColumn("p", F.from_json("content", CATEGORY_JSON))
        cart = ok.filter(F.col("kind") == "cart").withColumn("p", F.from_json("content", CART_JSON))

        serp_items = (
            serp.select(
                "seed_id", "keyword", "canonical_url", "discovery_seq", "host_shard",
                F.col("p.page").alias("page"), F.col("p.layout").alias("layout"),
                F.col("p.has_next").alias("has_next"), "product_type", "max_depth", "depth",
                F.posexplode_outer("p.items").alias("_i", "item"),
            )
            .select(
                "*",
                F.col("item.pos").alias("pos"),
                F.coalesce(F.col("item.title"), F.lit("Amazon recommendation")).alias("title"),  # P2
                F.col("item.href").alias("href"),
                F.col("item.is_sponsored").alias("item_is_sponsored"),
            )
            .drop("_i")
        )

        # ---- classify own products (J1/J2/P4-P6) + rank encode (W1-W3)
        items_nonnull = serp_items.filter(F.col("pos").isNotNull())
        clean = items_nonnull.withColumn("clean_title", strip_sponsored_tag(F.col("title"))).withColumn(
            "is_ad", is_sponsored(F.col("title"))
        )
        # first-match-wins classification (getRank.py:229-236) as a literal-
        # array projection — zero shuffles, stays in the same map stage as
        # the parse (functions/rank.py:first_match_struct)
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

        results_all = matched.select(
            F.lit(wave).alias("wave"), "seed_id", "keyword", "page", "pos", "layout",
            "title", "clean_title", "is_ad", "is_own", "size_attr", "rank",
            F.col("canonical_url").alias("page_url"), "host_shard",
        )
        # W3: unknown-layout rows are routed OUT of results into a quarantine
        # table (the reference parks 'Other mode' pages for operator review —
        # getRank.py:317-328's 3000 s sleep); they never contribute ranks or
        # early-stop hits.
        quarantine = results_all.filter(F.col("rank") == "Other mode")
        results = results_all.filter(F.col("rank") != "Other mode")

        # ---- detail results (BSR fields) + cart results
        detail_rows = detail.select(
            F.lit(wave).alias("wave"), "seed_id", "canonical_url", "discovery_seq",
            "parent_seq", "parent_pos", "host_shard", "depth", "product_type",
            "max_depth", "keyword",
            F.col("p.asin").alias("asin"), F.col("p.title").alias("title"),
            F.col("p.variant_axis").alias("variant_axis"), F.col("p.rank_mode").alias("rank_mode"),
            F.col("p.rank1").alias("rank1"), F.col("p.rank2").alias("rank2"),
            F.col("p.skus").alias("skus"),
        )
        cart_rows = cart.select(
            F.lit(wave).alias("wave"), "seed_id", "canonical_url", "host_shard",
            F.col("p.asin").alias("asin"),
            F.col("p.inventory").alias("inventory"), F.col("p.alert").alias("alert"),
        )

        # ---- images (S12): decode + phash pandas-UDF over fetched bytes
        images = (
            detail.select("canonical_url", "image_bytes", F.col("p.title").alias("caption"))
            .mapInPandas(_decode_image_batches, IMAGES_SCHEMA)
        )

        # ---- expansion (J4/L1): pagination + items + skus + cart probes
        expansions = []
        nxt = serp.filter(F.col("p.has_next") & (F.col("p.page") < F.col("max_depth")))
        wave_flags = None
        if cfg.early_stop:
            # A3/L2: a seed with ≥1 sponsored and ≥1 natural own hit stops
            # paging — the reference's core loop exits once both are found
            # (getRank.py:208-209, 468-469). Per-seed cumulative flags live
            # in the tiny seed_flags delta (≤1 row per seed per wave), so
            # the check never rescans the growing results history.
            wave_flags = (
                results.filter(F.col("is_own"))
                .groupBy("seed_id")
                .agg(
                    F.max(F.col("is_ad").cast("int")).alias("has_ad"),
                    F.max((~F.col("is_ad")).cast("int")).alias("has_nat"),
                )
            )
            prior_flags = store.load_deltas("seed_flags")
            all_flags = (
                wave_flags if prior_flags is None else prior_flags.unionByName(wave_flags)
            )
            done = (
                all_flags.groupBy("seed_id")
                .agg(F.max("has_ad").alias("_a"), F.max("has_nat").alias("_n"))
                .filter((F.col("_a") == 1) & (F.col("_n") == 1))
                .select("seed_id")
            )
            nxt = nxt.join(F.broadcast(done), "seed_id", "left_anti")
        expansions.append(
            nxt.select(
                "seed_id",
                F.concat(
                    F.lit(f"{world.HOST}/s?field-keywords="),
                    F.regexp_replace(F.col("p.keyword"), " ", "+"),
                    F.lit("&page="), (F.col("p.page") + 1).cast("string"),
                ).alias("raw_url"),
                (F.col("depth") + 1).alias("depth"),
                F.col("discovery_seq").alias("parent_seq"),
                F.lit(100000).alias("parent_pos"),  # pagination after items (BFS tie-break)
                "product_type", "max_depth", "keyword",
            )
        )
        if cfg.follow_items:
            expansions.append(
                serp_items.filter(
                    F.col("href").isNotNull() & (F.col("depth") + 1 <= F.col("max_depth"))
                ).select(
                    "seed_id",
                    F.concat(F.lit(world.HOST), F.col("href")).alias("raw_url"),
                    (F.col("depth") + 1).alias("depth"),
                    F.col("discovery_seq").alias("parent_seq"),
                    F.col("pos").alias("parent_pos"),
                    "product_type", "max_depth", "keyword",
                )
            )
            cat_items = category.select(
                "seed_id", "depth", "discovery_seq", "product_type", "max_depth", "keyword",
                F.explode("p.items").alias("item"),
            )
            expansions.append(
                cat_items.filter(F.col("depth") + 1 <= F.col("max_depth")).select(
                    "seed_id",
                    F.concat(F.lit(world.HOST), F.col("item.href")).alias("raw_url"),
                    (F.col("depth") + 1).alias("depth"),
                    F.col("discovery_seq").alias("parent_seq"),
                    F.col("item.pos").alias("parent_pos"),
                    "product_type", "max_depth", "keyword",
                )
            )
        if cfg.follow_skus:
            skus = detail_rows.select(
                "seed_id", "canonical_url", "discovery_seq", "depth",
                "product_type", "max_depth", "keyword",
                F.posexplode("skus").alias("sku_pos", "sku"),
            )
            expansions.append(
                skus.filter(F.col("depth") + 1 <= F.col("max_depth")).select(
                    "seed_id",
                    # P11: empty dp_url falls back to the product page URL
                    F.when(F.col("sku.dp_url") == "", F.col("canonical_url"))
                    .otherwise(F.concat(F.lit(world.HOST), F.col("sku.dp_url")))
                    .alias("raw_url"),
                    (F.col("depth") + 1).alias("depth"),
                    F.col("discovery_seq").alias("parent_seq"),
                    (F.col("sku_pos") + 1).alias("parent_pos"),
                    "product_type", "max_depth", "keyword",
                )
            )
        if cfg.probe_inventory:
            expansions.append(
                detail_rows.filter(F.col("depth") + 1 <= F.col("max_depth")).select(
                    "seed_id",
                    F.concat(
                        F.lit(f"{world.HOST}/gp/cart/view.html?asin="), F.col("asin"), F.lit("&qty=999")
                    ).alias("raw_url"),
                    (F.col("depth") + 1).alias("depth"),
                    F.col("discovery_seq").alias("parent_seq"),
                    F.lit(200000).alias("parent_pos"),  # probes after sku links
                    "product_type", "max_depth", "keyword",
                )
            )

        candidates = expansions[0]
        for e in expansions[1:]:
            candidates = candidates.unionByName(e)

        # ---- canonicalize → robots → in-wave dedup → seen dedup (P14/C7/P15/J6)
        candidates = (
            candidates.withColumn("canonical_url", canonicalize_url(F.col("raw_url")))
            .drop("raw_url")
            .withColumn("kind", _classify_kind(F.col("canonical_url")))
        )
        candidates = _with_host_shard(candidates, cfg)
        candidates = _robots_filter(candidates, self.robots)
        # in-wave dedup: first-discovered wins — min_by hash-aggregate (one
        # shuffle with map-side combine) instead of a row_number window (two
        # sort phases). (parent_seq, parent_pos) is unique per duplicate
        # group member, so the pick is deterministic.
        _c_rest = [c for c in candidates.columns if c != "canonical_url"]
        # the duplicate-group size doubles as the page-rank-like priority:
        # in-wave in-degree (how many parent links discovered this URL) —
        # rides the same hash-aggregate, zero extra cost (north_star's
        # "priority queue keyed by (depth, discovery-time, page-rank-like
        # score)"; mirrored in tests/oracle.py)
        candidates = (
            candidates.groupBy("canonical_url")
            .agg(
                F.min_by(
                    F.struct(*_c_rest), F.struct("parent_seq", "parent_pos")
                ).alias("_r"),
                F.count("*").alias("_indegree"),
            )
            .select("canonical_url", "_indegree", "_r.*")
        )

        keyed = bloom.with_bloom_keys(candidates, "canonical_url", cfg.bloom)
        if cfg.exact_confirm == "shard_sets":
            # exact membership answered inside the SAME cogroup task that
            # probes the bitset — no seen-table scan, no anti-join shuffle
            probed = bloom.probe_shards(keyed, shards, cfg.bloom, exact=True)
            pre = probed.filter(~F.col("exact_seen")).drop("maybe_seen", "exact_seen").persist()
        else:
            probed = bloom.probe_shards(keyed, shards, cfg.bloom)
            fresh_sure = probed.filter(~F.col("maybe_seen"))
            # bloom-positive rows: confirm against the exact seen set (left_anti
            # touches only this small subset — the scale path, SURVEY.md P15)
            seen = self.store.load_deltas("seen")
            maybe = probed.filter(F.col("maybe_seen"))
            confirmed_new = (
                maybe.join(seen.select("canonical_url"), "canonical_url", "left_anti")
                if seen is not None
                else maybe
            )
            pre = fresh_sure.unionByName(confirmed_new).drop("maybe_seen").persist()

        # ---- data-defined discovery order (W4): seq from (parent, pos, url)
        # assigned WITHOUT a global single-task window — per-parent rank +
        # driver-side cumulative offsets, byte-identical result; the sizes
        # aggregate doubles as the wave's new-URL count (politeness.py)
        seq_assigned, n_new = assign_discovery_seq(pre, next_seq)
        _new_priority = F.col("_indegree").cast("double")
        # kind/failure tallies: the sizes aggregate above was the wave's
        # first action and built the fetched cache, so this aggregate is a
        # pure cache scan (~0.3 s) — ordering it here, not before the
        # expansion, means the wave never pays a dedicated fetch-
        # materialization job. (An Observation on the fetch would be free,
        # but Observation.get crashes when the first action over a
        # persisted observed plan is an empty-result aggregate — exactly
        # the no-expansion final wave. Measured, not hypothetical.)
        kind_rows = (
            fetched.groupBy("kind")
            .agg(
                F.count("*").alias("n"),
                F.sum((F.col("status") == -1).cast("int")).alias("nf"),
            )
            .collect()
        )
        kind_counts: dict[str, int] = {r["kind"]: r["n"] for r in kind_rows}
        n_failed_rows = sum(r["nf"] for r in kind_rows)
        new_rows = (
            seq_assigned
            .withColumn("priority_score", _new_priority)
            .withColumn("attempt", F.lit(0))
            .select([f.name for f in FRONTIER_SCHEMA.fields] + ["h1", "h2", "bucket"])
            .persist()
        )
        _mark("new_rows")
        next_seq += n_new
        t_computed = _time.time()

        new_frontier = (
            deferred.select([f.name for f in FRONTIER_SCHEMA.fields])
            .unionByName(retries.select([f.name for f in FRONTIER_SCHEMA.fields]))
            .unionByName(new_rows.select([f.name for f in FRONTIER_SCHEMA.fields]))
        )
        if cold is not None:
            # depth-pruned dequeue: rows the budget provably couldn't reach
            # were never ranked — carry them into the next snapshot verbatim
            # (a metadata-only carry on real Iceberg; unioned BEFORE the
            # early-stop kill so satisfied seeds retire cold rows too)
            new_frontier = new_frontier.unionByName(
                cold.select([f.name for f in FRONTIER_SCHEMA.fields])
            )
        if cfg.early_stop:
            # kill pending pagination (deferred/retry/new serp rows) of
            # satisfied seeds as well (L2)
            nf = new_frontier.alias("nf")
            new_frontier = nf.join(
                F.broadcast(done.withColumnRenamed("seed_id", "_done_seed")),
                (F.col("nf.seed_id") == F.col("_done_seed")) & (F.col("nf.kind") == "serp"),
                "left_anti",
            )
        # the loop's stop condition needs |new_frontier|, but a pre-commit
        # count() is a whole extra pass over the union DAG (measured
        # 1.8-5.7 s/wave). The count instead comes from the written
        # snapshot's parquet FOOTERS (commit_wave records it in the
        # manifest counters — driver-side pyarrow, no job). An Observation
        # riding the write worked for plain parquet but the partitionBy
        # writer does NOT deliver observed metrics for an empty frontier
        # (toPyRow assertion on the final wave — measured, not
        # hypothetical), and the footer count is just as free.
        if cfg.pruned_dequeue:
            # co-locate the (depth, host_shard) write partitions so the
            # partitionBy writer emits one file per live combo instead of
            # (in-memory partitions × combos) tiny files
            new_frontier = new_frontier.repartition(cfg.n_shards, "depth", "host_shard")
        _mark("frontier_count")

        # compaction cadence: every compact_every-th wave rewrites the hot
        # state chains (seen / shards / seed_flags) as a full base so the
        # per-wave reads stay O(base + K deltas) instead of O(all waves)
        compacting = bool(cfg.compact_every) and (wave + 1) % cfg.compact_every == 0

        # copy-on-write: only buckets that gained URLs this wave are emitted
        # and written; untouched buckets keep their last-written version.
        # On a compacting wave the FULL bucket set is emitted (a shards base).
        new_shards = bloom.merge_into_shards(
            new_rows.select("bucket", "h1", "h2"), shards, cfg.bloom, dirty_only=not compacting
        )

        # ---- metrics + lineage (A6, north_rule)
        metrics = (
            fetched.groupBy("host_shard")
            .agg(
                F.count("*").alias("n_fetched"),
                F.sum((F.col("status") == -1).cast("int")).alias("n_failed"),
                F.sum(F.length(F.col("content"))).alias("content_bytes"),
                F.sum(F.length(F.col("image_bytes"))).alias("image_bytes"),
            )
            .withColumn("wave", F.lit(wave))
            .withColumn("wave_t_start", F.lit(float(t_wave0)))
            .withColumn("wave_build_sec", F.lit(round(_time.time() - t_wave0, 3)))
        )
        # per-page shape metrics (A1/P8/P9): the reference's audible >45-row
        # alarm (getRank.py:165-167) and empty-page message (getRank.py:211)
        # become rows in a metrics table instead of driver side effects
        page_metrics = serp.select(
            F.lit(wave).alias("wave"),
            "canonical_url",
            F.size("p.items").alias("n_items"),
            F.col("p.has_next").alias("has_next"),
            F.when(F.size("p.items") > 45, "anomaly")
            .when(F.size("p.items") == 0, "empty")
            .otherwise("ok")
            .alias("flag"),
        )
        lineage = fetched.select(
            F.lit(wave).alias("wave"),
            F.spark_partition_id().alias("partition_id"),
            "seed_id", "canonical_url", "parent_seq", "discovery_seq", "host_shard", "status",
        )

        has_serp = kind_counts.get("serp", 0) > 0
        has_detail = kind_counts.get("detail", 0) > 0
        has_cart = kind_counts.get("cart", 0) > 0
        store = self.store
        # delta tables are small per wave: coalesce the writes so each wave
        # appends a few well-sized files instead of one file per shuffle
        # partition (192 tiny files/table/wave explodes both the write job's
        # task count and every later load_deltas scan). Snapshot tables
        # (frontier, shards) keep their natural partitioning — they are the
        # tables that grow with frontier size.
        n_out = max(2, cfg.n_shards // 8)

        def delta(df: DataFrame | None) -> DataFrame | None:
            return None if df is None else df.coalesce(n_out)

        # compaction rewrites: on a compacting wave the hot state chains are
        # written as full-history BASES (marked in the manifest; loaders stop
        # descending the wave chain at a base)
        bases: set[str] = set()
        seen_df = delta(new_rows.select("canonical_url", "discovery_seq"))
        shards_df = new_shards if n_new > 0 else None  # COW: no dirty buckets → no write
        flags_df = delta(wave_flags if has_serp else None)
        if compacting:
            bases |= {"seen", "shards"}
            prior_seen = store.load_deltas("seen")
            seen_df = (
                prior_seen.unionByName(new_rows.select("canonical_url", "discovery_seq"))
                if prior_seen is not None
                else new_rows.select("canonical_url", "discovery_seq")
            )
            shards_df = new_shards  # full bucket set (dirty_only was off above)
            if cfg.early_stop:
                bases.add("seed_flags")
                flags_df = all_flags.groupBy("seed_id").agg(
                    F.max("has_ad").alias("has_ad"), F.max("has_nat").alias("has_nat")
                )

        store.commit_wave(
            wave,
            {
                "frontier": new_frontier,
                "shards": shards_df,
                "seen": seen_df,
                "results": delta(results if has_serp else None),
                "quarantine": delta(quarantine if has_serp else None),
                "seed_flags": flags_df,
                "detail_results": delta(detail_rows.drop("skus") if has_detail else None),
                "cart_results": delta(cart_rows if has_cart else None),
                # images keep natural partitioning: coalesce would collapse
                # the (CPU-heavy, Python) decode stage itself, and the binary
                # rows already produce well-sized files
                "images": images if has_detail else None,
                "metrics": delta(metrics),
                "page_metrics": delta(page_metrics if has_serp else None),
                "lineage": delta(lineage),
                "dead_letter": delta(
                    dead.select("canonical_url", "seed_id", "attempt")
                    if n_failed_rows > 0
                    else None
                ),
            },
            {"next_seq": next_seq},
            bases=bases,
            partition_cols=self.FRONTIER_PARTITIONING if cfg.pruned_dequeue else None,
        )
        fetched.unpersist()
        new_rows.unpersist()
        pre.unpersist()
        _ranked.unpersist()
        n_frontier = int(store.counter("n_frontier"))
        _mark("commit")
        next_hot, next_cold = self._load_frontier()
        out = (
            next_hot,
            next_cold,
            store.load_shard_state(),
            next_seq,
            n_frontier,
        )
        if os.environ.get("AWC_DEBUG_TIMING"):
            deltas = " ".join(
                f"{label}={t - prev:.1f}s"
                for (label, t), (_, prev) in zip(_marks[1:], _marks[:-1])
            )
            print(
                f"[wave {wave}] compute={t_computed - t_wave0:.1f}s "
                f"commit={_time.time() - t_computed:.1f}s n_new={n_new} | {deltas}",
                flush=True,
            )
        return out
