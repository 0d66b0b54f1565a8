"""Per-host politeness + priority dequeue (SURVEY.md C2, W4, §4 skew).

The reference paces itself implicitly — one browser, sequential fetches,
``WebDriverWait(browser, 10)`` between actions (getRank.py:33) and
``time.sleep(3)`` after cart mutations (getStockNumber.py:122). The engine
makes that an explicit **token bucket per host shard**:

* every frontier row carries ``host_shard`` (salted — one hot host like
  amazon.com spreads over 2**salt_bits shards, SURVEY.md §4);
* a wave may fetch at most ``tokens_per_shard`` URLs per shard — globally a
  host's budget is ``tokens_per_shard * 2**salt_bits`` per wave, so salting
  never changes the aggregate rate, only the partition layout;
* within a shard, rows are taken in **priority order** — the total order
  ``(depth, discovery_seq, priority_score, canonical_url)`` that makes wave
  contents independent of parallelism (north_rule crawl-ordering match).

Everything is a window function — no driver loop, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: the deterministic total order of the frontier (W4). ``discovery_seq`` is a
#: data-defined sequence number assigned at enqueue time, NOT an execution
#: artifact — identical at local[8] and local[32].
PRIORITY_ORDER = ("depth", "discovery_seq", "priority_score", "canonical_url")


def priority_sort_cols() -> list:
    return [F.col("depth").asc(), F.col("discovery_seq").asc(),
            F.col("priority_score").desc(), F.col("canonical_url").asc()]


def select_wave_batch(
    frontier: DataFrame, tokens_per_shard: int, robots: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split the frontier into (this wave's batch, deferred remainder).

    One shuffle on ``host_shard``; the window ranks each shard's queue and
    the token budget cuts it. Deferred rows keep their priority and win the
    next wave — exactly a token bucket refilled once per wave.

    When ``robots`` (host, crawl_delay seconds) is given, a host with
    ``crawl_delay > 1`` gets its per-shard budget divided by the delay
    (floor, min 1) — the wave cadence stands in for wall-clock seconds, the
    same stand-in the reference makes with its fixed sleeps
    (getStockNumber.py:122).
    """
    if robots is not None:
        tokens = F.coalesce(
            F.when(
                F.col("crawl_delay") > 1,
                F.greatest(F.floor(F.lit(tokens_per_shard) / F.col("crawl_delay")), F.lit(1)),
            ),
            F.lit(tokens_per_shard),
        )
        frontier = frontier.join(
            F.broadcast(robots.select("host", "crawl_delay")), "host", "left"
        ).withColumn("_tokens", tokens).drop("crawl_delay")
    else:
        frontier = frontier.withColumn("_tokens", F.lit(tokens_per_shard))
    w = Window.partitionBy("host_shard").orderBy(*priority_sort_cols())
    ranked = frontier.withColumn("_tb_rank", F.row_number().over(w))
    batch = ranked.filter(F.col("_tb_rank") <= F.col("_tokens")).drop("_tb_rank", "_tokens")
    deferred = ranked.filter(F.col("_tb_rank") > F.col("_tokens")).drop("_tb_rank", "_tokens")
    return batch, deferred


#: the enqueue-time total order for new URLs (BFS order the reference's
#: sequential loop produces: items in page order getRank.py:173, pages
#: ascending getRank.py:466). canonical_url is unique per wave (in-wave
#: dedup), so the order is strict — no ties for the range partitioner to
#: split nondeterministically.
DISCOVERY_ORDER = ("parent_seq", "parent_pos", "canonical_url")


def assign_discovery_seq(expanded: DataFrame, base_seq: int, n_partitions: int = 32):
    """Assign data-defined ``discovery_seq`` to newly discovered URLs —
    scalably: NO single-task global window.

    Plan: range-repartition by the discovery order (non-overlapping sorted
    ranges), count rows per partition (one tiny collect), then seq =
    base + cumulative_offset(partition) + row_number within partition. The
    result is byte-identical to a global row_number over the same order —
    range boundaries only change how the total order is *chunked*, never the
    order itself — but every partition ranks in parallel. Replaces the
    Window.orderBy-without-partitionBy form (single-task sort, fatal at
    10^10-URL expansions).

    Returns (DataFrame with discovery_seq, n_rows). The input is persisted
    internally; caller should treat the returned frame as ephemeral (persist
    it if reused) — the intermediate is unpersisted by a later wave cleanup.
    """
    keys = [F.col(c).asc() for c in DISCOVERY_ORDER]
    srt = (
        expanded.repartitionByRange(n_partitions, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    pid_counts = {
        r["_pid"]: r["n"] for r in srt.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    n_rows = sum(pid_counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(pid_counts):
        offsets[pid] = acc
        acc += pid_counts[pid]
    if offsets:
        off_col = F.element_at(
            F.create_map(*[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]),
            F.col("_pid"),
        )
    else:
        off_col = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*keys)
    out = srt.withColumn(
        "discovery_seq",
        (F.lit(base_seq) + off_col + F.row_number().over(w)).cast("long"),
    ).drop("_pid")
    return out, n_rows, srt
