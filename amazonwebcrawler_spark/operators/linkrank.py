"""Link-graph PageRank for frontier prioritization.

The north-star crawl scheduler keys its priority queue on "(depth,
discovery-time, page-rank-like score)". The wave loop's live signal is
in-wave in-degree (integer, so the pure-Python equivalence oracle
reproduces crawl ordering bit-for-bit — see plans/crawler.py:624); THIS
module is the offline "page-rank-like score" computed between crawl
epochs over the accumulated link graph, feeding the next epoch's seed
priorities. The reference scraper has no link graph at all (it walks
fixed SERP pagination, getRank.py:24-60), so this operator is pure new
capability for the 10^10-URL frontier.

Scale shape (per iteration, the whole loop is K ≈ 10-30 iterations):
  * one join  ranks ⋈ weighted-edges  — shuffles ranks on `node`; the
    edge table is pre-weighted (1/outdeg folded in ONCE up front) and
    persisted already partitioned, so only the small rank table moves.
  * one groupBy(dst).sum — partial aggregation map-side, one shuffle.
  * dangling mass is a 1-row aggregate crossJoined back (Spark plans a
    BroadcastNestedLoopJoin over a single row — no driver collect in the
    hot loop, no per-iteration scalar round-trip).
  * lineage is truncated every iteration with an eager localCheckpoint,
    the same idiom as connected_components — without it, iteration K
    re-derives all K-1 predecessors on every action.
At 10^10 nodes nothing here collects to the driver except the single
`nodes.count()` scalar (one long). Doubles only — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Parallel edges are collapsed (``distinct()``) — a page linking the
    same target five times is one endorsement, matching the frontier
    anti-join's set semantics. Self-loops are kept (a node endorses
    itself; harmless and both the Spark and SQL sides treat it the same
    way). Dangling-node mass (nodes with no out-edges) is redistributed
    uniformly each iteration, so ``sum(pr) == 1`` at every step:

        pr'(v) = (1-d)/N + d * ( Σ_{u→v} pr(u)/outdeg(u) + mass/N )

    Returns ``(node, pr)`` with ``pr`` a raw double — callers round for
    display/comparison (the driver twin rounds to 6dp; power-iteration
    float error across engines is ~1e-14, far inside that).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # single scalar — the only driver-side value
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("outdeg"))
    # fold 1/outdeg into the edge ONCE; the loop never touches deg again
    w_edges = (
        e.join(deg.withColumnRenamed("node", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .persist()
    )
    w_edges.count()  # materialize before the loop so every iteration reuses it
    dangling = nodes.join(deg, "node", "left_anti").persist()

    ranks = nodes.withColumn("pr", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(iters):
        ranks = _iterate(nodes, w_edges, dangling, ranks, n, damping).localCheckpoint()
    nodes.unpersist()
    w_edges.unpersist()
    dangling.unpersist()
    return ranks


def _iterate(
    nodes: DataFrame,
    w_edges: DataFrame,
    dangling: DataFrame,
    ranks: DataFrame,
    n: int,
    damping: float,
) -> DataFrame:
    """One un-checkpointed power iteration — split out so
    scripts/explain_plans.py can assert the per-iteration plan shape
    (1-row mass side arrives as a broadcast, contrib sum combines
    map-side) that the checkpointed loop result hides."""
    contrib = (
        w_edges.join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.col("pr") * F.col("w")).alias("contrib"))
    )
    mass = (
        ranks.join(dangling, "node", "left_semi")
        .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("mass"))
    )
    return (
        nodes.join(contrib, "node", "left")
        .crossJoin(F.broadcast(mass))
        .select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce("contrib", F.lit(0.0)) + F.col("mass") / n)
            ).alias("pr"),
        )
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """TrustRank-shaped personalized PageRank (Gyöngyi et al., VLDB 2004):
    the power iteration of :func:`pagerank` with the teleport vector
    restricted to a trusted seed set instead of uniform —

        pr'(v) = (1-d)·tele(v) + d·( Σ_{u→v} pr(u)/outdeg(u) + mass·tele(v) )

    where ``tele(v) = 1/|S|`` for seed nodes and 0 elsewhere, and the
    dangling mass re-enters through the SAME teleport vector, so
    ``sum(pr) == 1`` at every step exactly as in the uniform variant.
    Scores measure proximity-to-trust: link farms that fool raw PageRank
    score near zero here unless the seed set endorses them — the standard
    spam-demotion companion to ``host_trap_stats``.

    Same scale shape as :func:`pagerank` (pre-weighted persisted edges,
    1-row dangling-mass broadcast, per-iteration localCheckpoint); the
    only additions are one seed semi-join up front and a second scalar
    (``|S ∩ nodes|``). Seeds outside the graph are ignored; an empty
    intersection raises (an all-zero teleport vector has no fixpoint).
    Returns ``(node, pr)`` raw doubles — callers round to micro-unit
    BIGINTs for the bit-stable contract (pagerank_oracle_sql precedent).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    seed_nodes = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .join(nodes, "node", "left_semi")
        .persist()
    )
    s = seed_nodes.count()  # scalar #2 beside nodes.count()
    if s == 0:
        raise ValueError("personalized_pagerank: no seed intersects the graph")
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("outdeg"))
    w_edges = (
        e.join(deg.withColumnRenamed("node", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .persist()
    )
    w_edges.count()
    dangling = nodes.join(deg, "node", "left_anti").persist()
    tele_nodes = (
        nodes.join(seed_nodes.withColumn("_s", F.lit(1)), "node", "left")
        .select(
            "node",
            F.when(F.col("_s").isNotNull(), F.lit(1.0 / s)).otherwise(F.lit(0.0)).alias("tele"),
        )
        .persist()
    )
    ranks = tele_nodes.select("node", F.col("tele").alias("pr")).localCheckpoint()
    for _ in range(iters):
        contrib = (
            w_edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("w")).alias("contrib"))
        )
        mass = (
            ranks.join(dangling, "node", "left_semi")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("mass"))
        )
        ranks = (
            tele_nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(mass))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("tele")
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.col("mass") * F.col("tele"))
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    nodes.unpersist()
    seed_nodes.unpersist()
    w_edges.unpersist()
    dangling.unpersist()
    tele_nodes.unpersist()
    return ranks


def personalized_pagerank_oracle_sql(
    edges_sql: str, seeds_sql: str, iters: int = 5, damping: float = 0.85
) -> str:
    """DuckDB twin of :func:`personalized_pagerank`: the seed-teleport
    power iteration unrolled into chained CTEs (pagerank_oracle_sql
    idiom). ``seeds_sql`` must yield a ``node`` column; emits
    ``(node, ppr_micro)`` BIGINTs (same drift argument as pagerank)."""
    d = damping
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})),",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        f"seeds AS (SELECT DISTINCT s.node FROM ({seeds_sql}) s"
        " JOIN nodes n ON n.node = s.node),",
        "deg AS (SELECT src AS node, count(*)::DOUBLE AS outdeg FROM e GROUP BY 1),",
        "we AS (SELECT e.src, e.dst, 1.0/deg.outdeg AS w FROM e JOIN deg ON deg.node = e.src),",
        "tele AS MATERIALIZED (SELECT n.node, CASE WHEN s.node IS NOT NULL THEN"
        " 1.0/(SELECT count(*) FROM seeds) ELSE 0.0 END AS tele"
        " FROM nodes n LEFT JOIN seeds s ON s.node = n.node),",
        "r0 AS (SELECT node, tele AS pr FROM tele),",
    ]
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        parts.append(
            f"r{k} AS (SELECT t.node, (1.0 - {d}) * t.tele + {d} * ("
            f"COALESCE(c.contrib, 0.0) + dm.mass * t.tele) AS pr "
            f"FROM tele t "
            f"LEFT JOIN (SELECT we.dst AS node, SUM(r.pr * we.w) AS contrib "
            f"FROM we JOIN {prev} r ON we.src = r.node GROUP BY 1) c "
            f"ON c.node = t.node "
            f"CROSS JOIN (SELECT COALESCE(SUM(r.pr), 0.0) AS mass FROM {prev} r "
            f"LEFT JOIN deg ON deg.node = r.node WHERE deg.node IS NULL) dm),"
        )
    body = "\n".join(parts).rstrip(",")
    return (
        f"{body}\nSELECT node, CAST(round(pr * 1000000) AS BIGINT) AS ppr_micro FROM r{iters}"
    )


def pagerank_oracle_sql(
    edges_sql: str, iters: int = 5, damping: float = 0.85
) -> str:
    """DuckDB twin of :func:`pagerank`: the SAME power iteration unrolled
    into ``iters`` chained CTEs (recursive CTEs dedupe rows — wrong tool
    for a numeric fixpoint). ``edges_sql`` must yield columns (src, dst);
    the result is ``(node, pr_micro)`` — a micro-unit BIGINT, because the
    contribution sums carry ~1e-14 cross-engine summation drift: an
    integer a micro cell wide absorbs it, where a 6dp-rounded DOUBLE can
    hash differently. Callers emit ``round(pr·1e6)::long`` on the Spark
    side identically."""
    d = damping
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})),",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "n AS (SELECT count(*)::DOUBLE AS n FROM nodes),",
        "deg AS (SELECT src AS node, count(*)::DOUBLE AS outdeg FROM e GROUP BY 1),",
        "we AS (SELECT e.src, e.dst, 1.0/deg.outdeg AS w FROM e JOIN deg ON deg.node = e.src),",
        "r0 AS (SELECT node, 1.0/(SELECT n FROM n) AS pr FROM nodes),",
    ]
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        parts.append(
            f"r{k} AS (SELECT nd.node, (1.0 - {d})/(SELECT n FROM n) + {d} * ("
            f"COALESCE(c.contrib, 0.0) + dm.mass/(SELECT n FROM n)) AS pr "
            f"FROM nodes nd "
            f"LEFT JOIN (SELECT we.dst AS node, SUM(r.pr * we.w) AS contrib "
            f"FROM we JOIN {prev} r ON we.src = r.node GROUP BY 1) c "
            f"ON c.node = nd.node "
            f"CROSS JOIN (SELECT COALESCE(SUM(r.pr), 0.0) AS mass FROM {prev} r "
            f"LEFT JOIN deg ON deg.node = r.node WHERE deg.node IS NULL) dm),"
        )
    body = "\n".join(parts).rstrip(",")
    return (
        f"{body}\nSELECT node, CAST(round(pr * 1000000) AS BIGINT) AS pr_micro FROM r{iters}"
    )
