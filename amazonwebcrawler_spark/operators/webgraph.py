"""Web-graph operators for the crawl frontier: redirect-chain resolution,
HITS hub/authority scoring, and BFS seed-distance — the link-graph signals
a 10^10-URL scheduler feeds its priority queue beside PageRank
(operators/linkrank.py).

The reference scraper has none of these (it walks one site's fixed SERP
pagination, getRank.py:24-60, and follows redirects implicitly inside the
browser); a general frontier must resolve redirect aliases BEFORE the
URL-seen filter (or every alias is crawled once), rank hubs to find
catalog index pages, and know each URL's distance from the seed set for
depth budgets (SURVEY.md L1).

Scale shapes (the whole point — none of these is a sequential walk):

* ``resolve_redirects`` — **pointer doubling**: O(log max_hops) equi
  self-joins instead of max_hops sequential joins. Each round shuffles
  the (node, successor) map once on the successor key; 32-hop chains
  resolve in 5 rounds. Lineage is truncated per round (localCheckpoint),
  the connected-components idiom.
* ``hits`` — per iteration: two edge⋈score joins + two grouped sums
  (map-side partial) + two 1-row L1-mass broadcasts. No driver-side
  value except the initial node count.
* ``bfs_depths`` — per level: frontier⋈edges (shuffles the FRONTIER,
  never the visited set), distinct, then a left_anti against the
  accumulated depth table; early-stops on an empty level (one bounded
  ``limit(1).count()`` scalar per level).

Doubles appear only in HITS; its driver contract is micro-unit BIGINT
(the host_rank precedent: ~1e-14 cross-engine summation drift sits seven
orders of magnitude inside a micro cell).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """Resolve redirect chains to their terminal URL by pointer doubling.

    ``edges`` is a functional map (one ``dst`` per ``src`` — enforce
    upstream; HTTP gives one Location per URL). Returns one row per
    redirecting node: ``(src, final_url, hops)`` where ``final_url`` is
    the first node in the chain with no outgoing edge and ``hops`` the
    exact chain length walked. Chains longer than ``max_hops`` return the
    frontier reached after ``2**ceil(log2(max_hops))`` hops (a real
    crawler treats those as redirect loops and drops them anyway).

    Each doubling round joins the map against itself on the successor
    key — ``ceil(log2(max_hops))`` shuffles total, never a per-hop loop.
    """
    # LAZY checkpoints + AQE coalescing scoped to the doubling rounds (the
    # _exec.coalesced_stages rationale): the plan is truncated at call time
    # either way (LogicalRDD), eager=False lets the final eager checkpoint
    # run all rounds as one action with the round RDDs cached where ``f``
    # appears twice (guide §1.2: remove passes).
    from amazonwebcrawler_spark.operators._exec import coalesced_stages

    with coalesced_stages(edges.sparkSession):
        f = edges.select(
            F.col(src_col).alias("node"),
            F.col(dst_col).alias("nxt"),
            F.lit(1).cast("long").alias("hops"),
        ).localCheckpoint(eager=False)
        for _ in range(max(1, math.ceil(math.log2(max(2, max_hops))))):
            g = f.select(
                F.col("node").alias("g_node"),
                F.col("nxt").alias("g_nxt"),
                F.col("hops").alias("g_hops"),
            )
            f = (
                f.join(g, f["nxt"] == g["g_node"], "left")
                .select(
                    "node",
                    F.coalesce("g_nxt", "nxt").alias("nxt"),
                    (F.col("hops") + F.coalesce("g_hops", F.lit(0).cast("long"))).alias("hops"),
                )
                .localCheckpoint(eager=False)
            )
        out = f.select(
            F.col("node").alias("src"),
            F.col("nxt").alias("final_url"),
            F.col("hops").cast("long").alias("hops"),
        ).localCheckpoint()
    return out


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
) -> DataFrame:
    """HITS hub/authority scores (Kleinberg 1999) over a directed edge
    list, L1-normalized each half-step (so scores are comparable across
    graphs and the twin can mirror the arithmetic exactly):

        auth'(v) = Σ_{u→v} hub(u)   then  auth /= Σ auth
        hub'(u)  = Σ_{u→v} auth(v)  then  hub  /= Σ hub

    Parallel edges collapse (one endorsement, the linkrank.pagerank
    convention). Returns ``(node, hub, auth)`` raw doubles — callers
    round to micro-unit BIGINTs for any bit-stable contract.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # the only driver-side scalar
    hub = nodes.withColumn("hub", F.lit(1.0 / n)).localCheckpoint()
    auth = nodes.withColumn("auth", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(iters):
        a_raw = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("a"))
        )
        a_mass = a_raw.agg(F.sum("a").alias("s"))
        auth = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_mass))
            .select("node", (F.coalesce("a", F.lit(0.0)) / F.col("s")).alias("auth"))
            .localCheckpoint()
        )
        h_raw = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("h"))
        )
        h_mass = h_raw.agg(F.sum("h").alias("s"))
        hub = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_mass))
            .select("node", (F.coalesce("h", F.lit(0.0)) / F.col("s")).alias("hub"))
            .localCheckpoint()
        )
    e.unpersist()
    nodes.unpersist()
    return hub.join(auth, "node")


def hits_oracle_sql(edges_sql: str, iters: int = 5) -> str:
    """DuckDB twin of :func:`hits`: the SAME L1-normalized iteration
    unrolled into chained CTEs (the linkrank.pagerank_oracle_sql idiom —
    recursive CTEs dedupe rows, wrong for a numeric fixpoint). Emits
    ``(node, hub_micro, auth_micro)`` BIGINTs."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})),",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "n AS (SELECT count(*)::DOUBLE AS n FROM nodes),",
        "h0 AS (SELECT node, 1.0/(SELECT n FROM n) AS hub FROM nodes),",
    ]
    for k in range(1, iters + 1):
        hp = f"h{k - 1}"
        parts.append(
            f"a{k}r AS (SELECT e.dst AS node, SUM(h.hub) AS a "
            f"FROM e JOIN {hp} h ON h.node = e.src GROUP BY 1),"
        )
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT nd.node, COALESCE(r.a, 0.0) / m.s AS auth "
            f"FROM nodes nd LEFT JOIN a{k}r r ON r.node = nd.node "
            f"CROSS JOIN (SELECT SUM(a) AS s FROM a{k}r) m),"
        )
        parts.append(
            f"h{k}r AS (SELECT e.src AS node, SUM(a.auth) AS h "
            f"FROM e JOIN a{k} a ON a.node = e.dst GROUP BY 1),"
        )
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT nd.node, COALESCE(r.h, 0.0) / m.s AS hub "
            f"FROM nodes nd LEFT JOIN h{k}r r ON r.node = nd.node "
            f"CROSS JOIN (SELECT SUM(h) AS s FROM h{k}r) m),"
        )
    body = "\n".join(parts).rstrip(",")
    return (
        f"{body}\n"
        f"SELECT h.node, CAST(round(h.hub * 1000000) AS BIGINT) AS hub_micro, "
        f"CAST(round(a.auth * 1000000) AS BIGINT) AS auth_micro "
        f"FROM h{iters} h JOIN a{iters} a ON a.node = h.node"
    )


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    max_depth: int = 6,
) -> DataFrame:
    """Minimum hop distance from the seed set over a directed link graph
    — the frontier's exact ``depth`` column (SURVEY.md L1 page budget)
    computed offline for budget auditing and trap forensics.

    Level-synchronous BFS: each level semi-joins the edge table against
    the CURRENT frontier (AQE broadcasts the small frontier side),
    dedupes, and anti-joins the accumulated depth table so a node keeps
    its first (minimal) depth. Both sides of the anti-join hash on
    ``node`` — at 10^10 nodes the depth table would be bucketed on
    ``node`` so only the new level moves. Stops at ``max_depth`` or an
    empty level (one bounded 1-row count per level). Returns
    ``(node, depth)`` for every node reachable within ``max_depth``.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct().persist()
    depths = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("depth", F.lit(0))
        .localCheckpoint()
    )
    frontier = depths
    for d in range(1, max_depth + 1):
        nxt = (
            e.join(
                frontier.select(F.col("node").alias("src")),
                "src",
                "left_semi",
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(depths, "node", "left_anti")
            .withColumn("depth", F.lit(d))
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        depths = depths.unionByName(nxt).localCheckpoint()
        frontier = nxt
    e.unpersist()
    return depths.select("node", F.col("depth").cast("int").alias("depth"))


def triangle_stats(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    UNDIRECTED simplification of a link graph — the classic link-farm
    signal beside PageRank/HITS/trap-stats: spam clusters and boilerplate
    nav blocks close triangles far above organic linking rates, so a
    scheduler demotes hosts whose neighborhoods are suspiciously dense.

    Algorithm: degree-ordered edge-iterator (the MapReduce-era standard
    for distributed triangle counting — Suri & Vassilvitskii, WWW 2011).
    Edges canonicalize to ``u < v`` distinct pairs (self-loops dropped,
    direction and multiplicity collapsed), then orient from lower to
    higher **rank** where rank = (degree, id): every wedge and its closing
    edge is generated exactly once, and — the scale argument — each node's
    oriented out-degree is O(√m), so the wedge self-join's per-key fan-out
    is bounded even when a hub has 10^7 neighbors; without the degree
    orientation the hub alone would generate 10^14 wedges. Shuffles:
    the distinct, two degree joins, the wedge join on the shared source,
    the closing-edge equi-join on (b, c), one per-node count. No cross
    join, no window.

    Returns one row per node: ``(node, degree, n_triangles,
    clustering_micro)`` with the local clustering coefficient as exact
    integer ``(2·T·10^6) DIV (deg·(deg−1))`` (0 where degree < 2) —
    rational arithmetic, never a DOUBLE.
    """
    from amazonwebcrawler_spark.operators._exec import coalesced_stages

    u, v = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    ed = und.join(
        deg.select(F.col("node").alias("u"), F.col("degree").alias("_du")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("degree").alias("_dv")), "v")
    a_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    # oriented edge a→b with rank(a) < rank(b); _db = rank-degree of b,
    # kept so the wedge join can order the two far endpoints by rank
    o = ed.select(
        F.when(a_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(a_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(a_first, F.col("_dv")).otherwise(F.col("_du")).alias("_db"),
    ).persist()
    x, y = o.alias("x"), o.alias("y")
    rank_lt = (F.col("x._db") < F.col("y._db")) | (
        (F.col("x._db") == F.col("y._db")) & (F.col("x.b") < F.col("y.b"))
    )
    wedges = x.join(y, (F.col("x.a") == F.col("y.a")) & rank_lt).select(
        F.col("x.a").alias("ta"), F.col("x.b").alias("tb"), F.col("y.b").alias("tc")
    )
    closing = o.select(F.col("a").alias("tb"), F.col("b").alias("tc"))
    tri = wedges.join(closing, ["tb", "tc"])
    cnt = (
        tri.select(F.explode(F.array("ta", "tb", "tc")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    try:
        # AQE coalescing scoped to the materialization (_exec rationale):
        # the distinct'd undirected edge table is byte-tiny relative to
        # the stage count, so the wedge/closing stages were pure 64-task
        # scheduling overhead at host-graph sizes
        with coalesced_stages(edges.sparkSession):
            out = (
                deg.join(cnt, "node", "left")
                .select(
                    "node",
                    F.col("degree").cast("long").alias("degree"),
                    t.alias("n_triangles"),
                    F.when(
                        F.col("degree") >= 2,
                        F.expr(
                            "(2 * coalesce(n_triangles, 0) * 1000000L)"
                            " DIV (degree * (degree - 1))"
                        ),
                    )
                    .otherwise(F.lit(0))
                    .cast("long")
                    .alias("clustering_micro"),
                )
                # node-scale result: materialize (the hits/pagerank
                # discipline) so the persisted edge tables release below
                .localCheckpoint(eager=True)
            )
    finally:
        und.unpersist()
        o.unpersist()
    return out


def mirror_pairs(
    df: DataFrame,
    host_col: str = "host",
    fp_col: str = "fp",
    min_shared: int = 3,
    min_containment_micro: int = 500_000,
    max_hosts_per_fp: int = 64,
) -> DataFrame:
    """Host-level mirror detection: pairs of hosts whose page-content
    fingerprint sets overlap enough that one is (partially) a mirror of
    the other — the crawl-budget guard that keeps a 10^10-URL frontier
    from fetching the same catalog through every CDN alias and country
    mirror. The reference scraper targets one fixed host and cannot see
    this; a general scheduler demotes (or aliases) the smaller host of a
    confirmed mirror pair before the next wave.

    Input: one row per (host, page fingerprint) — any content digest works
    (``functions.text.fingerprint`` md5 of normalized text here). Returns
    ``(host_a, host_b, shared_fps, n_a, n_b, containment_micro)`` with
    ``host_a < host_b`` and ``containment_micro = (shared·1e6) DIV
    min(n_a, n_b)`` — exact integers; a pair survives when it shares at
    least ``min_shared`` fingerprints and containment clears the
    threshold.

    Scale shape: hosts pair ONLY through a fingerprint equi self-join —
    never host × host. Two skew guards make that join safe at 10^10 pages:
    (1) (host, fp) pairs are distinct'd first, so a host re-serving one
    page 10^6 times contributes one row; (2) fingerprints carried by more
    than ``max_hosts_per_fp`` hosts are dropped BEFORE the self-join —
    a shared empty-page/soft-404/licence-text digest otherwise explodes
    into (n_hosts choose 2) pairs on one key. Dropping them is semantically
    right, not just cheap: universal boilerplate carries no mirror signal.
    Remaining stages are host-keyed aggregates and one broadcast-size join
    of per-host totals (host cardinality ≪ page cardinality)."""
    hf = df.select(
        F.col(host_col).alias("host"), F.col(fp_col).alias("fp")
    ).distinct()
    hf = (
        hf.withColumn("_nh", F.count(F.lit(1)).over(Window.partitionBy("fp")))
        .filter(F.col("_nh") <= max_hosts_per_fp)
        .drop("_nh")
        # materialize the (host, fp) table ONCE: it feeds the size table
        # and BOTH sides of the self-join — without this the upstream scan
        # + content fingerprinting re-runs three times (r6, guide §1.2).
        # Rows are two narrow keys (the page payload never enters), the
        # same footprint the minhash shingle persist already accepts.
        .localCheckpoint(eager=True)
    )
    sizes = hf.groupBy("host").agg(F.count(F.lit(1)).alias("n_fps"))
    a = hf.select(F.col("host").alias("host_a"), "fp")
    b = hf.select(F.col("host").alias("host_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )
    out = (
        shared.join(
            sizes.select(F.col("host").alias("host_a"), F.col("n_fps").alias("n_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("n_fps").alias("n_b")),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            F.col("shared_fps").cast("long").alias("shared_fps"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("(shared_fps * 1000000L) DIV least(n_a, n_b)").alias(
                "containment_micro"
            ),
        )
    )
    return out.filter(
        (F.col("shared_fps") >= min_shared)
        & (F.col("containment_micro") >= min_containment_micro)
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 4,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) over the undirected simplification of a link graph — the
    host-cluster signal beside triangle density: mirror farms, template
    networks and link rings collapse into one community label, which a
    scheduler then budgets as a single logical site instead of crawling
    every mirror at full depth.

    Determinism contract (the reason this version is synchronous with a
    fixed iteration count, not the paper's random-order asynchronous
    sweep): every node simultaneously adopts the label held by the
    plurality of its neighbors, ties broken by smallest label — a pure
    function of the data, so the DuckDB twin replays it exactly and
    repartitioning cannot change the answer. ``iters`` is fixed (no
    convergence probe), so the plan is a static ``iters``-deep chain.

    Scale shape, per iteration: one equi-join (the label table shuffles
    on ``node``; the symmetrized edge table is persisted once up front
    and reused), one map-side-combinable ``(node, label)`` count, one
    window partitioned by ``node`` (never global). Lineage truncates
    every round via localCheckpoint — the connected-components idiom.
    Returns ``(node, community)``; isolated nodes cannot occur (every
    node comes from an edge) but the left-join + coalesce keeps the
    iteration total anyway, mirrored in the twin.
    """
    from pyspark.sql import Window

    u, v = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = (
        und.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionByName(und.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .persist()
    )
    nodes = sym.select("node").distinct().persist()
    # LAZY per-round checkpoints + AQE coalescing scoped to the sweep (the
    # _exec.coalesced_stages rationale): only the LAST round materializes
    # eagerly, running the whole iteration as one action with cached round
    # intermediates, then the persisted sym/nodes release safely. iters is
    # part of the result contract (synchronous sweep) — never early-exited.
    from amazonwebcrawler_spark.operators._exec import coalesced_stages

    try:
        with coalesced_stages(edges.sparkSession):
            labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint(
                eager=False
            )
            w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
            for it in range(iters):
                cnt = (
                    sym.join(labels.withColumnRenamed("node", "nbr"), "nbr")
                    .groupBy("node", "label")
                    .agg(F.count(F.lit(1)).alias("cnt"))
                )
                pick = (
                    cnt.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .select("node", "label")
                )
                labels = (
                    nodes.join(pick.withColumnRenamed("label", "_new"), "node", "left")
                    .select("node", F.coalesce("_new", F.col("node")).alias("label"))
                    .localCheckpoint(eager=(it == iters - 1))
                )
    finally:
        sym.unpersist()
        nodes.unpersist()
    return labels.select("node", F.col("label").alias("community"))


def label_prop_oracle_sql(edges_sql: str, iters: int = 4) -> str:
    """DuckDB twin of :func:`label_propagation`: the SAME synchronous
    plurality-vote iteration unrolled into chained CTEs (the pagerank /
    hits idiom — recursive CTEs dedupe rows, wrong for an iterated map),
    tie-break mirrored as ``ORDER BY cnt DESC, label ASC``."""
    parts = [
        f"WITH e0 AS ({edges_sql}),",
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v"
        " FROM e0 WHERE src <> dst),",
        "sym AS MATERIALIZED (SELECT u AS node, v AS nbr FROM und"
        " UNION ALL SELECT v AS node, u AS nbr FROM und),",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM sym),",
        "l0 AS (SELECT node, node AS label FROM nodes),",
    ]
    for k in range(1, iters + 1):
        prev = f"l{k - 1}"
        parts.append(
            f"c{k} AS (SELECT s.node, l.label, COUNT(*) AS cnt "
            f"FROM sym s JOIN {prev} l ON l.node = s.nbr GROUP BY 1, 2),"
        )
        parts.append(
            f"p{k} AS (SELECT node, label FROM (SELECT node, label, "
            f"ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn "
            f"FROM c{k}) WHERE rn = 1),"
        )
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT n.node, COALESCE(p.label, n.node) AS label "
            f"FROM nodes n LEFT JOIN p{k} p ON p.node = n.node),"
        )
    body = "\n".join(parts).rstrip(",")
    return f"{body}\nSELECT node, label AS community FROM l{iters}"


def kcore(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 8,
) -> DataFrame:
    """k-core extraction by synchronous peeling (Seidman 1983; the
    distributed round form of Batagelj-Zaversnik): repeatedly delete every
    node whose degree in the SURVIVING induced subgraph is < k. The k-core
    is the dense backbone the sparse periphery can't fake — a link ring
    must actually wire k-regular density to enter it, which makes core
    membership the spam/importance signal beside triangle density
    (:func:`triangle_stats`) and community labels
    (:func:`label_propagation`).

    ``iters`` peel rounds run unconditionally (no convergence probe — a
    static plan, the label_propagation discipline). Peeling is monotone,
    so extra rounds after convergence are exact no-ops; a graph whose
    peel is deeper than ``iters`` yields the (still deterministic)
    ``iters``-round partial peel — callers verify final degrees ≥ k if
    they need the true fixpoint (tests do; every committed fixture
    converges in ≤ half the budget at every SF).

    Scale shape, per round: two semi-joins of the persisted symmetrized
    edge table against the (always shrinking) alive set + one map-side-
    combinable degree count — no window, no Python, lineage truncated by
    localCheckpoint per round. Returns ``(node, core_degree)`` for
    surviving nodes — ``core_degree`` is the node's degree inside the
    final core, all BIGINT.
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    u, v = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = (
        und.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionByName(und.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .persist()
    )
    # LAZY per-round checkpoints + AQE partition coalescing scoped to the
    # peel (see _exec.coalesced_stages): each round's count doubles as the
    # forcing action AND an exact early exit — peeling is monotone, so an
    # unchanged alive count means fixpoint and every further round is a
    # no-op by the docstring's own argument.
    from amazonwebcrawler_spark.operators._exec import coalesced_stages

    try:
        with coalesced_stages(edges.sparkSession):
            alive = sym.select("node").distinct().localCheckpoint(eager=False)
            n_alive = None
            for _ in range(iters):
                deg = (
                    sym.join(alive, "node", "left_semi")
                    .join(alive.withColumnRenamed("node", "nbr"), "nbr", "left_semi")
                    .groupBy("node")
                    .agg(F.count(F.lit(1)).alias("deg"))
                )
                alive = deg.filter(F.col("deg") >= k).select("node").localCheckpoint(
                    eager=False
                )
                n_now = alive.count()
                if n_now == n_alive:
                    break
                n_alive = n_now
            out = (
                sym.join(alive, "node", "left_semi")
                .join(alive.withColumnRenamed("node", "nbr"), "nbr", "left_semi")
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("core_degree"))
                .localCheckpoint()
            )
    finally:
        sym.unpersist()
    return out


def kcore_oracle_sql(edges_sql: str, k: int = 3, iters: int = 8) -> str:
    """DuckDB twin of :func:`kcore`: the same synchronous peel unrolled
    into chained CTEs (alive-set semi-joins as plain JOINs on the
    distinct alive table)."""
    parts = [
        f"WITH e0 AS ({edges_sql}),",
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v"
        " FROM e0 WHERE src <> dst),",
        "sym AS MATERIALIZED (SELECT u AS node, v AS nbr FROM und"
        " UNION ALL SELECT v AS node, u AS nbr FROM und),",
        "a0 AS (SELECT DISTINCT node FROM sym),",
    ]
    for r in range(1, iters + 1):
        prev = f"a{r - 1}"
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT s.node FROM sym s "
            f"JOIN {prev} x ON x.node = s.node "
            f"JOIN {prev} y ON y.node = s.nbr "
            f"GROUP BY 1 HAVING COUNT(*) >= {k}),"
        )
    body = "\n".join(parts).rstrip(",")
    return (
        f"{body}\nSELECT s.node, COUNT(*) AS core_degree FROM sym s "
        f"JOIN a{iters} x ON x.node = s.node "
        f"JOIN a{iters} y ON y.node = s.nbr GROUP BY 1"
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    seed: int = 7,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Deterministic uniform random walks from every node (the DeepWalk /
    node2vec p=q=1 corpus generator, Perozzi et al. KDD 2014) — the
    sentence-like node sequences a graph-embedding trainer consumes, and
    a crawl-scheduler's cheap reachability sampler. "Random" is a pure
    function of the data: step ``t`` from node ``c`` on the walk started
    at ``s`` picks neighbor index ``md5('walk'|seed|s|t|c) mod outdeg(c)``
    over neighbors ranked by ``dst`` ascending — resume-safe,
    repartition-invariant, and replayable by the DuckDB twin (the
    weighted_sample md5 discipline; never ``rand()``).

    Scale shape, per step: ONE equi-join of the walk frontier onto the
    (src, outdeg) table to compute the choice, then ONE two-key equi-join
    onto the persisted indexed adjacency ``(src, idx) → dst`` — the
    pre-computed neighbor rank means a 10^7-degree hub never fans out:
    each walk row moves to exactly one neighbor row. Dead ends terminate
    walks early (inner join). Lineage truncated per step. Returns
    ``(start, step, node)`` BIGINTs, step 0 = the start itself.
    """
    if walk_len < 1:
        raise ValueError(f"need walk_len >= 1, got {walk_len}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    from pyspark.sql import Window

    nbr = e.withColumn(
        "idx", F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1
    ).persist()
    deg = nbr.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # LAZY per-step checkpoints + AQE coalescing scoped to the walk (the
    # _exec.coalesced_stages rationale): the final eager checkpoint of
    # ``out`` runs all steps as ONE action with cached intermediates
    # before nbr/deg are released.
    from amazonwebcrawler_spark.operators._exec import coalesced_stages

    try:
        with coalesced_stages(edges.sparkSession):
            cur = nodes.select(
                F.col("node").alias("start"), F.col("node").alias("cur")
            ).localCheckpoint(eager=False)
            out = cur.select("start", F.lit(0).alias("step"), F.col("cur").alias("node"))
            for t in range(1, walk_len + 1):
                h = F.md5(
                    F.concat(
                        F.lit(f"walk{seed}|"),
                        F.col("start").cast("string"),
                        F.lit("|"),
                        F.lit(str(t)),
                        F.lit("|"),
                        F.col("cur").cast("string"),
                    )
                )
                choice = (
                    cur.join(deg, deg["src"] == cur["cur"])
                    .select(
                        "start",
                        "cur",
                        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.col("outdeg"))
                        .cast("int")
                        .alias("choice"),
                    )
                )
                cur = (
                    choice.join(
                        nbr, (nbr["src"] == choice["cur"]) & (nbr["idx"] == choice["choice"])
                    )
                    .select("start", F.col("dst").alias("cur"))
                    .localCheckpoint(eager=False)
                )
                out = out.unionByName(
                    cur.select("start", F.lit(t).alias("step"), F.col("cur").alias("node"))
                )
            out = out.localCheckpoint()
    finally:
        nbr.unpersist()
        deg.unpersist()
    return out


def random_walks_oracle_sql(edges_sql: str, walk_len: int = 4, seed: int = 7) -> str:
    """DuckDB twin of :func:`random_walks`: the same md5 choice arithmetic
    over the same dst-ranked adjacency, one chained CTE per step."""
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})),",
        "nbr AS MATERIALIZED (SELECT src, dst, "
        "ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx FROM e),",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "w0 AS (SELECT node AS start, node AS cur FROM nodes),",
    ]
    sel = ["SELECT start, 0 AS step, cur AS node FROM w0"]
    for t in range(1, walk_len + 1):
        prev = f"w{t - 1}"
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT w.start, n.dst AS cur "
            f"FROM {prev} w "
            f"JOIN deg d ON d.src = w.cur "
            f"JOIN nbr n ON n.src = w.cur AND n.idx = CAST("
            f"CAST(('0x' || substr(md5('walk{seed}|' || w.start::VARCHAR || '|{t}|' "
            f"|| w.cur::VARCHAR), 1, 8)) AS UBIGINT) % d.outdeg AS BIGINT)),"
        )
        sel.append(f"SELECT start, {t} AS step, cur AS node FROM w{t}")
    body = "\n".join(parts).rstrip(",")
    return f"{body}\n" + "\nUNION ALL\n".join(sel)


def triangle_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`triangle_stats`: the same canonicalization,
    (degree, id) rank orientation, wedge + closing-edge joins and integer
    clustering coefficient, with rank comparisons as row-value tuples."""
    return f"""
WITH e0 AS ({edges_sql}),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM e0 WHERE src <> dst
),
deg AS (
  SELECT node, COUNT(*) AS degree
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
  GROUP BY node
),
o AS (
  SELECT CASE WHEN (du.degree, und.u) < (dv.degree, und.v) THEN und.u ELSE und.v END AS a,
         CASE WHEN (du.degree, und.u) < (dv.degree, und.v) THEN und.v ELSE und.u END AS b,
         CASE WHEN (du.degree, und.u) < (dv.degree, und.v) THEN dv.degree ELSE du.degree END AS db
  FROM und
  JOIN deg du ON du.node = und.u
  JOIN deg dv ON dv.node = und.v
),
tri AS (
  SELECT x.a AS ta, x.b AS tb, y.b AS tc
  FROM o x
  JOIN o y ON x.a = y.a AND ((x.db, x.b) < (y.db, y.b))
  JOIN o z ON z.a = x.b AND z.b = y.b
),
cnt AS (
  SELECT node, COUNT(*) AS n_triangles
  FROM (SELECT unnest([ta, tb, tc]) AS node FROM tri)
  GROUP BY node
)
SELECT d.node,
  CAST(d.degree AS BIGINT) AS degree,
  CAST(COALESCE(c.n_triangles, 0) AS BIGINT) AS n_triangles,
  CAST(CASE WHEN d.degree >= 2
    THEN (2 * COALESCE(c.n_triangles, 0) * 1000000) // (d.degree * (d.degree - 1))
    ELSE 0 END AS BIGINT) AS clustering_micro
FROM deg d LEFT JOIN cnt c USING (node)
"""


def scc(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 2,
    trim_iters: int = 3,
    prop_iters: int = 6,
) -> DataFrame:
    """Strongly connected components of the DIRECTED link graph — the
    link-ring / redirect-cycle detector beside the undirected community
    signal (:func:`label_propagation`). A crawl scheduler treats a
    nontrivial SCC (a set of hosts that all link back into each other)
    as one logical site with a shared budget, and an SCC containing a
    redirect cycle as a trap (functions/urls.host_trap_stats gives the
    per-host symptom; this gives the graph-level cause).

    Algorithm: the distributed trim + forward-color + backward-confirm
    scheme (the FW-BW/coloring family — Slota et al. 2014, GraphX's SCC;
    NOT Tarjan, which is inherently sequential). Per outer round:

    1. **Trim** (``trim_iters`` sub-rounds): a node with in-degree 0 or
       out-degree 0 in the remaining induced subgraph can sit on no
       cycle, so it is its own SCC — assign ``scc_id = node`` and drop
       it. Peels DAG peripheries layer by layer.
    2. **Color** (``prop_iters`` sub-rounds): propagate ``f(v) = min
       label of any vertex that reaches v`` along edge direction to
       fixpoint (min-label propagation, the connected-components idiom
       restricted to one direction).
    3. **Confirm backward**: roots are nodes with ``f(v) == v``; walk
       edges BACKWARD marking ``u`` when ``u → w``, ``w`` is marked and
       ``f(u) == f(w)``. Marked nodes are exactly the SCC of their root
       (v marked ⟺ v reaches its color root within its color class ⟺
       mutual reachability), one SCC extracted per color class per
       round — all color classes in parallel.

    Determinism: every step is a pure function of the edge set
    (min-labels, synchronous sweeps), so the DuckDB twin can verify it
    against the DEFINITION — transitive-closure mutual reachability —
    an independent derivation, not a replay.

    Budgets are static; one bounded scalar per OUTER round (the remaining
    count) both early-exits the loop when everything is assigned — an
    exact no-op skip, since every piece a later round could emit is empty
    once ``remaining`` is — and, at loop end, checks every node was
    assigned (raises otherwise, the dedup_groups non-convergence
    contract). ``prop_iters`` must cover the largest SCC
    diameter + the color class's reach depth; ``rounds`` must cover the
    longest chain of mutually-entangled color classes (2 suffices for
    any fixture whose nontrivial SCCs are entered from at most one
    smaller-labeled SCC).

    Scale shape, per sub-round: one equi-join of the (always shrinking)
    remaining/label table against the persisted induced edge table +
    one map-side-combinable min/distinct — no windows, no Python, no
    driver collects except the final convergence scalar; lineage
    truncated per sub-round via localCheckpoint. Returns
    ``(node BIGINT, scc_id BIGINT)`` for every distinct endpoint.
    """
    from amazonwebcrawler_spark.operators._exec import coalesced_stages

    e_all = edges.select(
        F.col(src_col).cast("long").alias("src"), F.col(dst_col).cast("long").alias("dst")
    ).distinct()
    nodes = (
        e_all.select(F.col("src").alias("node"))
        .unionByName(e_all.select(F.col("dst").alias("node")))
        .distinct()
    )
    e = e_all.filter(F.col("src") != F.col("dst")).persist()
    # LAZY checkpoints throughout (plan truncation is identical — see
    # resolve_redirects): ONE ``remaining.count()`` per outer round is the
    # only action, materializing every sub-round checkpoint of that round
    # as a single job instead of ~18 — and it doubles as a RESULT-IDENTICAL
    # early exit: once ``remaining`` is empty, every later round's trim and
    # confirm pieces are empty by construction, so skipping them changes
    # nothing (the budget-raise contract reads the same count). ``keep`` is
    # checkpointed too so the trim pieces' anti-join tails replay from
    # cached inputs after ``e`` is released, never from the raw scan.
    try:
        with coalesced_stages(edges.sparkSession):
            remaining = nodes.localCheckpoint(eager=False)
            pieces: list[DataFrame] = []
            leftover = None
            n_remaining = None
            for _ in range(rounds):
                for _ in range(trim_iters):
                    er = e.join(
                        remaining.withColumnRenamed("node", "src"), "src", "left_semi"
                    ).join(remaining.withColumnRenamed("node", "dst"), "dst", "left_semi")
                    # survivors need BOTH an in- and an out-edge in the induced
                    # graph — ONE union+aggregate instead of two distincts + a
                    # semi-join (same set; two fewer exchanges per sub-round)
                    keep = (
                        er.select(F.col("src").alias("node"), F.lit(1).alias("_o"), F.lit(0).alias("_i"))
                        .unionByName(
                            er.select(F.col("dst").alias("node"), F.lit(0).alias("_o"), F.lit(1).alias("_i"))
                        )
                        .groupBy("node")
                        .agg(F.max("_o").alias("_o"), F.max("_i").alias("_i"))
                        .filter((F.col("_o") == 1) & (F.col("_i") == 1))
                        .select("node")
                        .localCheckpoint(eager=False)
                    )
                    trimmed = remaining.join(keep, "node", "left_anti")
                    pieces.append(
                        trimmed.select("node", F.col("node").alias("scc_id")).localCheckpoint(
                            eager=False
                        )
                    )
                    remaining = remaining.join(keep, "node", "left_semi").localCheckpoint(
                        eager=False
                    )
                    # trim fixpoint → every later trim piece is empty by the
                    # monotone-peel argument: skipping them is an exact no-op.
                    # The count doubles as the round's forcing action.
                    n_now = remaining.count()
                    if n_now == n_remaining:
                        break
                    n_remaining = n_now
                er = (
                    e.join(remaining.withColumnRenamed("node", "src"), "src", "left_semi")
                    .join(remaining.withColumnRenamed("node", "dst"), "dst", "left_semi")
                    .localCheckpoint(eager=False)
                )
                f = remaining.select("node", F.col("node").alias("f")).localCheckpoint(
                    eager=False
                )
                for _ in range(prop_iters):
                    cand = er.join(
                        f.select(F.col("node").alias("src"), F.col("f").alias("fs")), "src"
                    ).select(F.col("dst").alias("node"), F.col("fs").alias("f"))
                    f = (
                        f.unionByName(cand)
                        .groupBy("node")
                        .agg(F.min("f").alias("f"))
                        .localCheckpoint(eager=False)
                    )
                marked = f.filter(F.col("f") == F.col("node")).select("node").localCheckpoint(
                    eager=False
                )
                # f is FIXED during the backward sweep — attach fu/fw and the
                # same-color filter ONCE instead of re-joining f twice per
                # sub-round (two fewer broadcast stages × prop_iters)
                er_same = (
                    er.join(f.select(F.col("node").alias("src"), F.col("f").alias("fu")), "src")
                    .join(f.select(F.col("node").alias("dst"), F.col("f").alias("fw")), "dst")
                    .filter(F.col("fu") == F.col("fw"))
                    .select("src", "dst")
                    .localCheckpoint(eager=False)
                )
                for _ in range(prop_iters):
                    new = er_same.join(
                        marked.withColumnRenamed("node", "dst"), "dst", "left_semi"
                    ).select(F.col("src").alias("node"))
                    marked = marked.unionByName(new).distinct().localCheckpoint(eager=False)
                pieces.append(
                    f.join(marked, "node", "left_semi")
                    .select("node", F.col("f").alias("scc_id"))
                    .localCheckpoint(eager=False)
                )
                remaining = remaining.join(marked, "node", "left_anti").localCheckpoint(
                    eager=False
                )
                leftover = n_remaining = remaining.count()
                if leftover == 0:
                    break
            if leftover is None:  # rounds == 0 — degenerate but keep the contract
                leftover = remaining.count()
            if leftover:
                raise RuntimeError(
                    f"scc did not converge: {leftover} nodes unassigned after "
                    f"{rounds} rounds (raise rounds/trim_iters/prop_iters)"
                )
            out = pieces[0]
            for p in pieces[1:]:
                out = out.unionByName(p)
            # materialize INSIDE the coalesced scope (conf is read at action
            # time) — the caller's first action then scans tiny cached RDDs
            out = out.localCheckpoint(eager=True)
    finally:
        e.unpersist()
    return out


def scc_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`scc` — an INDEPENDENT derivation from the
    definition, not a replay: recursive-CTE transitive closure, then
    ``scc_id(v) = min(w)`` over ``{v} ∪ {w : v→w ∧ w→v}``. Valid only at
    oracle scale (closure is O(n·reach)); the Spark side never builds a
    closure."""
    return f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM ({edges_sql})
    UNION ALL SELECT dst FROM ({edges_sql})
  )
),
reach AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM reach r JOIN e ON e.src = r.dst
),
pair AS (
  SELECT node, node AS other FROM nodes
  UNION
  SELECT a.src AS node, a.dst AS other
  FROM reach a JOIN reach b ON b.src = a.dst AND b.dst = a.src
)
SELECT node, MIN(other) AS scc_id FROM pair GROUP BY node
"""


def sitemap_coverage(
    declared: DataFrame,
    crawled: DataFrame,
    host_col: str = "host",
    url_col: str = "canonical_url",
) -> DataFrame:
    """Per-host crawl-coverage audit — the discovery-completeness signal a
    crawl operator actually pages on: of the URLs a host DECLARES (robots
    ``Sitemap:`` → sitemap ``<loc>`` entries, canonicalized), how many has
    the crawl seen, and how much crawled inventory is UNDECLARED (grey
    discovery via links — high ratios flag stale sitemaps or trap
    expansion). Output per host: ``n_declared``, ``n_crawled_declared``,
    ``n_undeclared_crawled``, and the exact integer ``coverage_milli =
    crawled_declared·1000 DIV declared``.

    Scale shape: both inputs collapse to DISTINCT (host, url) first (the
    audit is set arithmetic, and distinct-before-join bounds the join by
    inventory, not fetch count); one equi hash join on (host, url) with a
    full-outer shape folded into ONE aggregate via match flags — no
    second pass, no window, nothing quadratic. Hosts come out of the
    aggregate key-partitioned; 10^10 URLs cost one (host,url) shuffle."""
    d = declared.select(
        F.col(host_col).alias("host"), F.col(url_col).alias("u")
    ).distinct().withColumn("_d", F.lit(1).cast("long"))
    c = crawled.select(
        F.col(host_col).alias("host"), F.col(url_col).alias("u")
    ).distinct().withColumn("_c", F.lit(1).cast("long"))
    both = d.join(c, ["host", "u"], "full_outer")
    return (
        both.groupBy("host")
        .agg(
            F.sum(F.coalesce(F.col("_d"), F.lit(0).cast("long"))).alias("n_declared"),
            F.sum(
                F.when(F.col("_d").isNotNull() & F.col("_c").isNotNull(), 1)
                .otherwise(0)
                .cast("long")
            ).alias("n_crawled_declared"),
            F.sum(
                F.when(F.col("_d").isNull() & F.col("_c").isNotNull(), 1)
                .otherwise(0)
                .cast("long")
            ).alias("n_undeclared_crawled"),
        )
        .filter(F.col("n_declared") > 0)
        .withColumn(
            "coverage_milli", F.expr("(n_crawled_declared * 1000L) DIV n_declared")
        )
    )
