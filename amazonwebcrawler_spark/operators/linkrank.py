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
  * lineage is truncated every iteration with a LAZY localCheckpoint
    (plan becomes a LogicalRDD at call time; the RDD is marked persistent
    and caches on first compute) — without truncation, iteration K
    re-derives all K-1 predecessors on every action. Only the final
    iteration checkpoints eagerly, so the whole power iteration runs as
    ONE job instead of one per round (job-submit overhead dominated the
    leg on small graphs).
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
    dangling = nodes.join(deg, "node", "left_anti").persist()

    # LAZY per-iteration checkpoints + AQE coalescing scoped to the power
    # iteration (the _exec.coalesced_stages rationale): only the LAST
    # iteration materializes eagerly, so the whole loop runs as ONE action
    # with the persisted w_edges/dangling cached at first use inside it
    # (no pre-count needed), and the unpersists below stay safe.
    from amazonwebcrawler_spark.operators._exec import coalesced_stages

    try:
        with coalesced_stages(edges.sparkSession):
            ranks = nodes.withColumn("pr", F.lit(1.0 / n)).localCheckpoint(eager=False)
            for it in range(iters):
                ranks = _iterate(nodes, w_edges, dangling, ranks, n, damping).localCheckpoint(
                    eager=(it == iters - 1)
                )
    finally:
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
    dangling = nodes.join(deg, "node", "left_anti").persist()
    tele_nodes = (
        nodes.join(seed_nodes.withColumn("_s", F.lit(1)), "node", "left")
        .select(
            "node",
            F.when(F.col("_s").isNotNull(), F.lit(1.0 / s)).otherwise(F.lit(0.0)).alias("tele"),
        )
        .persist()
    )
    # LAZY per-iteration checkpoints + AQE coalescing, last one eager
    # (pagerank rationale): one action runs the whole seed-teleport
    # iteration with the persisted tables cached at first use, then the
    # unpersists below are safe.
    from amazonwebcrawler_spark.operators._exec import coalesced_stages

    try:
        with coalesced_stages(edges.sparkSession):
            ranks = tele_nodes.select("node", F.col("tele").alias("pr")).localCheckpoint(
                eager=False
            )
            for it in range(iters):
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
                    .localCheckpoint(eager=(it == iters - 1))
                )
    finally:
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


def opic_priority(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    init_cash: int = 1_000_000,
) -> DataFrame:
    """On-line Page Importance Computation (Abiteboul, Preda & Cobena,
    WWW 2003) — the ONLINE crawl-priority signal beside the offline
    :func:`pagerank`: every page holds *cash*; each wave it distributes
    its cash equally across its outlinks and banks the amount into its
    *history*; importance ≈ history + cash, and "fetch the page with the
    most cash" is the classic frontier ordering that converges to page
    importance without ever storing the full link matrix. The reference
    scraper has no frontier at all (it walks fixed SERP pagination,
    getRank.py:24-60) — this is new 10^10-URL capability.

    This is the synchronous batch variant in EXACT integer arithmetic so
    the DuckDB twin is bit-identical and conservation is testable to the
    last unit: cash is integer micro-units (``init_cash`` per node), a
    node with outdegree ``d`` sends ``cash DIV d`` along each edge and
    the remainder ``cash % d`` to the virtual root page; dangling nodes
    send ALL cash to the root; the root redistributes ``R DIV n``
    uniformly and carries ``R % n`` into the next round. The invariant
    ``sum(cash) + root_carry == n·init_cash`` holds exactly after every
    round (tests pin it).

    Scale shape per round (the pagerank discipline): one equi-join of the
    cash table onto the persisted (src, dst, outdeg) edge table + one
    map-side-combinable sum by dst; remainders/dangling collapse into a
    1-row aggregate that crossJoins back as a broadcast (never a driver
    collect); lineage truncated by per-round lazy localCheckpoint (one
    eager checkpoint at the end materializes all rounds as one job). The only
    driver-side scalar is ``nodes.count()``.

    Returns ``(node, cash, hist, imp_ppm)`` — all BIGINT; ``imp_ppm`` is
    the importance share ``((hist+cash)·1e6) DIV Σ(hist+cash)`` in parts
    per million, the exact-integer priority key.
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
    n = nodes.count()  # the only driver-side scalar (pagerank precedent)
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # fold outdeg into the edge ONCE; the loop never recomputes it
    e_deg = (
        e.join(deg.withColumnRenamed("node", "src"), "src")
        .select("src", "dst", "outdeg")
        .persist()
    )
    node_deg = nodes.join(deg, "node", "left").persist()  # outdeg NULL = dangling

    # LAZY per-round checkpoints + AQE coalescing scoped to the cash
    # rounds (the _exec.coalesced_stages rationale): the eager checkpoint
    # of the final projection runs all rounds as ONE action, with the
    # persisted edge tables cached at first use (no pre-count needed).
    from amazonwebcrawler_spark.operators._exec import coalesced_stages

    try:
        with coalesced_stages(edges.sparkSession):
            state = nodes.select(
                "node",
                F.lit(int(init_cash)).cast("long").alias("cash"),
                F.lit(0).cast("long").alias("hist"),
            ).localCheckpoint(eager=False)
            root = state.sparkSession.createDataFrame([(0,)], "carry long").localCheckpoint(
                eager=False
            )
            for _ in range(iters):
                new_state, r_total = _opic_round(state, root, e_deg, node_deg, n)
                # 1-row purse, evaluated once — state build and carry reuse it
                r_total = r_total.localCheckpoint(eager=False)
                state = (
                    new_state.crossJoin(F.broadcast(r_total))
                    .select(
                        "node",
                        (F.col("cash_recv") + F.expr(f"r DIV {n}")).alias("cash"),
                        "hist",
                    )
                    .localCheckpoint(eager=False)
                )
                root = r_total.select((F.col("r") % n).alias("carry"))
            total = state.agg(F.sum(F.col("hist") + F.col("cash")).alias("total"))
            out = (
                state.crossJoin(F.broadcast(total))
                .select(
                    "node",
                    "cash",
                    "hist",
                    F.expr("((hist + cash) * 1000000L) DIV total").alias("imp_ppm"),
                )
                .localCheckpoint()
            )
    finally:
        nodes.unpersist()
        e_deg.unpersist()
        node_deg.unpersist()
    return out


def _opic_round(
    state: DataFrame,
    root: DataFrame,
    e_deg: DataFrame,
    node_deg: DataFrame,
    n: int,
) -> tuple[DataFrame, DataFrame]:
    """One un-checkpointed OPIC cash round — split out so
    scripts/explain_plans.py can assert the per-round plan shape (recv is
    one equi-join + map-side-combinable sum; the root purse is a 1-row
    broadcast) that the checkpointed loop hides (the pagerank _iterate
    discipline). Returns ``(partial_state, r_total)``: partial_state
    carries ``cash_recv`` (received splits, before the uniform root
    redistribution the caller adds) and the updated ``hist``."""
    recv = (
        e_deg.join(state.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.expr("cash DIV outdeg")).alias("recv"))
    )
    # remainders of the splits + the whole cash of dangling nodes + the
    # previous round's carry = this round's root purse R (1 row)
    r_total = (
        node_deg.join(state, "node")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("outdeg").isNull(), F.col("cash")).otherwise(
                        F.col("cash") % F.col("outdeg")
                    )
                ),
                F.lit(0),
            ).alias("rem_sum")
        )
        .crossJoin(F.broadcast(root))
        .select((F.col("rem_sum") + F.col("carry")).alias("r"))
    )
    partial = (
        state.select("node", (F.col("hist") + F.col("cash")).alias("hist"))
        .join(recv, "node", "left")
        .select("node", F.coalesce("recv", F.lit(0)).alias("cash_recv"), "hist")
    )
    return partial, r_total


def opic_oracle_sql(edges_sql: str, iters: int = 5, init_cash: int = 1_000_000) -> str:
    """DuckDB twin of :func:`opic_priority`: the same integer cash rounds
    unrolled into chained CTEs (pagerank_oracle_sql idiom) — ``//`` and
    ``%`` replay ``DIV``/``%`` exactly on BIGINTs, so the twin is
    bit-identical, not approximately equal."""
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})),",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "nn AS (SELECT count(*) AS n FROM nodes),",
        "deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY 1),",
        "ed AS MATERIALIZED (SELECT e.src, e.dst, deg.outdeg FROM e"
        " JOIN deg ON deg.node = e.src),",
        "nd AS MATERIALIZED (SELECT n.node, deg.outdeg FROM nodes n"
        " LEFT JOIN deg ON deg.node = n.node),",
        f"s0 AS (SELECT node, {int(init_cash)}::BIGINT AS cash, 0::BIGINT AS hist"
        " FROM nodes),",
        "c0 AS (SELECT 0::BIGINT AS carry),",
    ]
    for k in range(1, iters + 1):
        p, c = f"s{k - 1}", f"c{k - 1}"
        parts.append(
            f"r{k} AS (SELECT (SELECT SUM(CASE WHEN nd.outdeg IS NULL THEN s.cash"
            f" ELSE s.cash % nd.outdeg END) FROM {p} s JOIN nd ON nd.node = s.node)"
            f" + (SELECT carry FROM {c}) AS r),"
        )
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT s.node,"
            f" COALESCE(rv.recv, 0) + (SELECT r FROM r{k}) // (SELECT n FROM nn) AS cash,"
            f" s.hist + s.cash AS hist"
            f" FROM {p} s LEFT JOIN (SELECT ed.dst AS node,"
            f" SUM(s2.cash // ed.outdeg) AS recv FROM ed"
            f" JOIN {p} s2 ON s2.node = ed.src GROUP BY 1) rv ON rv.node = s.node),"
        )
        parts.append(
            f"c{k} AS (SELECT (SELECT r FROM r{k}) % (SELECT n FROM nn) AS carry),"
        )
    body = "\n".join(parts).rstrip(",")
    return (
        f"{body}\nSELECT node, cash, hist,"
        f" ((hist + cash) * 1000000) // (SELECT SUM(hist + cash) FROM s{iters})"
        f" AS imp_ppm FROM s{iters}"
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
