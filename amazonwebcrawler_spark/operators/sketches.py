"""Deterministic, mergeable HyperLogLog — and HyperBall harmonic
centrality riding its registers.

Why another sketch beside ``q_sketch_distinct``'s certified
``approx_count_distinct``: Spark's built-in HLL++ estimate is
partition-order dependent (measured 815 vs 822 for the same set), so its
VALUE can never be a cross-engine contract — only its error bound can.
This module defines the sketch itself in pure integer column math
(md5-derived bucket + leading-zero rank, exact power-of-two harmonic sum,
integer-division estimate), so the registers AND the estimate are
bit-identical on any engine that can evaluate md5 and substring — Spark,
DuckDB, or a Python loop. That buys three things a 10^10-URL crawl needs:

* **Mergeability as data.** Registers are plain ``(key, bucket, r)``
  rows; union-cardinality of two crawls (or two waves, or two data
  centers) is a ``groupBy(key, bucket).max(r)`` — no rescan of either
  side, no opaque binary blob, map-side combinable, and storable in the
  same parquet state tables as everything else.
* **Auditable estimates.** The estimate is a deterministic function of
  the registers, so a downstream engine (or the DuckDB oracle) can
  recompute and verify it — dashboards don't drift between engines.
* **HyperBall.** Boldi-Vigna's centrality algorithm (HyperBall: P. Boldi
  & S. Vigna, "In-Core Computation of Geometric Centralities with
  HyperBall", ICDMW 2013) is exactly "iterate max-merge of neighbour
  registers"; with deterministic registers the whole harmonic-centrality
  computation becomes oracle-checkable.

Sketch definition (fixed, both engines):

* ``m = 64`` buckets (p=6), 32-bit rank domain.
* ``h = md5(cast(item as string))`` hex; ``bucket = int(h[0:2], 16) % 64``
  (256 % 64 == 0 — unbiased); ``w = int(h[2:10], 16)`` (32 bits);
  ``rank = 33 - bit_length(w)`` with ``w = 0 → 33``.
* ``S = sum over buckets of 2^(33 - r)``, empty buckets contributing
  ``2^33`` (i.e. the classic ``sum 2^-M_j`` scaled by ``2^33`` so it is
  an exact BIGINT; max ``64 * 2^33 = 2^39``).
* raw estimate in milli-units: ``(709 * 64^2 * 2^33) DIV S``
  (alpha_64 = 0.7213/(1+1.079/64) ≈ 0.709 — the constant is part of the
  sketch definition, so 3 digits is not a precision loss).
* small-range (linear counting) correction when ``raw <= 2.5 * m * 1000``
  and some bucket is empty: ``LC_MILLI[v_zero]``, a precomputed literal
  table of ``round(m * ln(m / V) * 1000)`` — embedded as the SAME Python-
  computed literals in the Spark plan and the oracle SQL, so no runtime
  float crosses an engine boundary. (The 2^32/30 large-range correction
  is out of the 32-bit-rank regime at any realistic shard cardinality
  and is deliberately omitted from the definition.)

With m=64 the rsd is ~13%; the certification queries use a 40% (≈3
sigma) bound against the exact count. Production would use p=12-14; p=6
keeps the oracle's register table small while exercising every code
path (LC correction, empty buckets, merge).

Scale shape: ``hll_registers`` is one hash-aggregate over the items
(map-side combinable — at most ``m`` rows per key survive each
partition); ``hll_merge`` re-aggregates registers only; ``hll_estimate``
is a second tiny aggregate over ≤ m rows per key. The reference scraper
counts distinct URLs by materializing them all (url_list.txt,
getRank.py:88-104); this is the O(m)-state replacement.

HyperBall (``hyperball``) keeps registers RELATIONAL — ``(node, bucket,
r)`` rows, 64 per node — so each iteration is edges ⋈ registers + one
hash-aggregate max: pure codegen, no Python, no arrays to rebuild. At
10^9 nodes the 64× row fanout is the memory/shuffle trade for exactness
of plan shape; the packed variant (one BIGINT[] per node merged with
``zip_with(greatest)``) halves shuffle bytes at the cost of an
Expand-free but array-heavy plan, and is the documented production
switch, not what the oracle checks. Ball direction is INBOUND
(registers propagate src → dst), so node v's ball at t is
``{u : dist(u→v) <= t}`` and harmonic centrality weights the nodes that
can REACH v — the crawl-relevant notion (how discoverable is v).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = 64  # buckets (p = 6)
RANK_MAX = 33  # 32-bit rank domain: rank in [1, 33]
SCALE_POW = 33  # S is sum(2^-M_j) scaled by 2^33 — exact BIGINT
EMPTY_TERM = 1 << SCALE_POW  # an empty bucket's contribution to S
ALPHA_MILLI_NUM = 709 * M * M * (1 << SCALE_POW)  # 24945719810981888
LC_THRESHOLD_MILLI = 2 * M * 1000 + M * 500  # 2.5 * m, in milli-units
# Linear-counting table: LC_MILLI[v] for v_zero = v+1 empty buckets.
# Python-computed once; embedded as identical literals in BOTH engines.
LC_MILLI = [round(M * math.log(M / v) * 1000) for v in range(1, M + 1)]


def hll_parts(item: Column) -> tuple[Column, Column]:
    """(bucket, rank) columns for one item — the register coordinates."""
    h = F.md5(item.cast("string"))
    bucket = (F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % M).alias("bucket")
    w = F.conv(F.substring(h, 3, 8), 16, 10).cast("long")
    rank = (
        F.when(w == 0, F.lit(RANK_MAX))
        .otherwise(F.lit(RANK_MAX) - F.length(F.conv(w, 10, 2)))
        .alias("r")
    )
    return bucket, rank


def hll_registers(df: DataFrame, keys: Sequence[str], item: Column) -> DataFrame:
    """Sparse registers per key: ``(keys..., bucket, r)`` — one map-side
    combinable hash-aggregate; at most ``m`` rows per key survive."""
    bucket, rank = hll_parts(item)
    return (
        df.select(*keys, bucket, rank)
        .groupBy(*keys, "bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_merge(regs: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge finer-grained register sets up to ``keys`` (drop the extra
    shard columns before calling): elementwise max per bucket. This is
    the union-cardinality operation — no item rescan."""
    return regs.groupBy(*keys, "bucket").agg(F.max("r").alias("r"))


def _lc_array() -> Column:
    return F.array(*[F.lit(v) for v in LC_MILLI])


def hll_estimate(regs: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Deterministic estimate per key from sparse registers.

    Emits ``(keys..., v_zero INT, s_scaled BIGINT, est_milli BIGINT)`` —
    all exact integers, bit-identical across engines.
    """
    agg = regs.groupBy(*keys).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {SCALE_POW} - r)")).alias("_s_present"),
        F.count("*").alias("_n_present"),
    )
    v_zero = (F.lit(M) - F.col("_n_present")).cast("int")
    s_scaled = F.col("_s_present") + (F.lit(M) - F.col("_n_present")) * F.lit(EMPTY_TERM)
    out = agg.select(
        *keys,
        v_zero.alias("v_zero"),
        s_scaled.alias("s_scaled"),
    )
    raw = F.expr(f"cast({ALPHA_MILLI_NUM} as bigint) DIV s_scaled")
    est = F.when(
        (raw <= F.lit(LC_THRESHOLD_MILLI)) & (F.col("v_zero") > 0),
        F.element_at(_lc_array(), F.col("v_zero")),
    ).otherwise(raw)
    return out.withColumn("est_milli", est.cast("long"))


def hll_sql_parts(item_sql: str) -> tuple[str, str]:
    """DuckDB twin of :func:`hll_parts`: (bucket_sql, rank_sql)."""
    h = f"md5(CAST({item_sql} AS VARCHAR))"
    bucket = f"(CAST(('0x' || substr({h}, 1, 2)) AS UBIGINT) % {M})::BIGINT"
    w = f"CAST(('0x' || substr({h}, 3, 8)) AS UBIGINT)"
    rank = f"(CASE WHEN {w} = 0 THEN {RANK_MAX} ELSE {RANK_MAX} - length(bin({w})) END)"
    return bucket, rank


def hll_estimate_sql(regs_rel: str, key_sql: str) -> str:
    """DuckDB twin of :func:`hll_estimate` over a relation of
    ``(key, bucket, r)`` named by ``regs_rel``; groups by ``key_sql``."""
    lc = "[" + ", ".join(str(v) for v in LC_MILLI) + "]"
    return f"""
SELECT {key_sql},
  CAST({M} - count(*) AS INT) AS v_zero,
  (SUM((1::BIGINT << ({SCALE_POW} - r))) + ({M} - count(*)) * {EMPTY_TERM})::BIGINT AS s_scaled,
  CAST(CASE WHEN ({ALPHA_MILLI_NUM}::BIGINT //
         (SUM((1::BIGINT << ({SCALE_POW} - r))) + ({M} - count(*)) * {EMPTY_TERM})::BIGINT)
         <= {LC_THRESHOLD_MILLI}
        AND ({M} - count(*)) > 0
    THEN ({lc})[CAST({M} - count(*) AS INT)]
    ELSE {ALPHA_MILLI_NUM}::BIGINT //
         (SUM((1::BIGINT << ({SCALE_POW} - r))) + ({M} - count(*)) * {EMPTY_TERM})::BIGINT
  END AS BIGINT) AS est_milli
FROM {regs_rel}
GROUP BY {key_sql}
"""


def hyperball(
    edges: DataFrame,
    max_t: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Harmonic centrality for every node via HyperBall.

    ``B(v, t) = {u : dist(u -> v) <= t}`` is tracked as an HLL register
    set per node; iteration t max-merges each node's predecessors'
    registers into its own (edges ⋈ regs on src, union own, grouped
    max — one shuffle per round, partials combined map-side). After each
    round the per-node estimate ``N_t(v) = |B(v, t)|`` is taken from
    :func:`hll_estimate`, and

        harmonic_micro(v) = sum over t=1..max_t of
                            greatest(N_t - N_{t-1}, 0) * 1000 DIV t

    (estimate diffs are clamped at 0 before the integer division so
    truncation semantics never meet a negative numerator — Spark DIV
    truncates toward zero, DuckDB ``//`` floors; the true neighbourhood
    function is nondecreasing, the clamp only touches estimator jitter
    at the LC boundary). Emits ``(node, reach_milli, harmonic_micro)``
    where ``reach_milli = N_{max_t}`` — the estimated count of nodes
    that can reach v, i.e. v's discoverability.

    Per-round lineage is truncated with ``localCheckpoint`` (the
    connected-components idiom) so max_t rounds never build a max_t-deep
    plan. Driver state: none beyond the loop counter.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct()
    bucket, rank = hll_parts(F.col("node"))
    regs = nodes.select("node", bucket, rank).localCheckpoint(eager=True)

    ests = hll_estimate(regs, ["node"]).select(
        "node", F.lit(0).alias("t"), "est_milli"
    )
    for t in range(1, max_t + 1):
        prop = e.join(regs, regs["node"] == e["src"]).select(
            F.col("dst").alias("node"), "bucket", "r"
        )
        regs = (
            regs.unionByName(prop)
            .groupBy("node", "bucket")
            .agg(F.max("r").alias("r"))
        )
        if t % checkpoint_every == 0 or t == max_t:
            regs = regs.localCheckpoint(eager=True)
        ests = ests.unionByName(
            hll_estimate(regs, ["node"]).select(
                "node", F.lit(t).alias("t"), "est_milli"
            )
        )

    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy("t")
    terms = ests.withColumn("_prev", F.lag("est_milli").over(w)).where(
        F.col("t") >= 1
    )
    contrib = F.expr("greatest(est_milli - _prev, cast(0 as bigint)) * 1000 DIV t")
    return (
        terms.groupBy("node")
        .agg(
            F.max(F.when(F.col("t") == max_t, F.col("est_milli"))).alias("reach_milli"),
            F.sum(contrib).alias("harmonic_micro"),
        )
        .select("node", "reach_milli", "harmonic_micro")
    )


def hyperball_oracle_sql(edges_sql: str, max_t: int = 8) -> str:
    """DuckDB twin of :func:`hyperball`: bounded-depth reachability via a
    recursive CTE (rows ``(u, v, d)`` dedupe on UNION; termination from
    the ``d < max_t`` bound), then registers at every radius t are the
    grouped max over ball members — the same integer estimate and
    harmonic sum as the engine side."""
    bucket, rank = hll_sql_parts("node")
    lc = "[" + ", ".join(str(v) for v in LC_MILLI) + "]"
    return f"""
WITH RECURSIVE
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
hash AS MATERIALIZED (SELECT node, {bucket} AS bucket, {rank} AS r FROM nodes),
walk(u, v, d) AS (
  SELECT node, node, 0 FROM nodes
  UNION
  SELECT w.u, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.v WHERE w.d < {max_t}
),
ts AS (SELECT CAST(range AS INT) AS t FROM range(0, {max_t} + 1)),
regs AS (
  SELECT w.v AS node, ts.t, h.bucket, max(h.r) AS r
  FROM walk w JOIN hash h ON h.node = w.u CROSS JOIN ts
  WHERE w.d <= ts.t
  GROUP BY 1, 2, 3
),
est AS (
  SELECT node, t,
    CAST(CASE WHEN ({ALPHA_MILLI_NUM}::BIGINT //
           (SUM((1::BIGINT << ({SCALE_POW} - r))) + ({M} - count(*)) * {EMPTY_TERM})::BIGINT)
           <= {LC_THRESHOLD_MILLI}
          AND ({M} - count(*)) > 0
      THEN ({lc})[CAST({M} - count(*) AS INT)]
      ELSE {ALPHA_MILLI_NUM}::BIGINT //
           (SUM((1::BIGINT << ({SCALE_POW} - r))) + ({M} - count(*)) * {EMPTY_TERM})::BIGINT
    END AS BIGINT) AS est_milli
  FROM regs GROUP BY node, t
),
terms AS (
  SELECT node, t, est_milli,
    lag(est_milli) OVER (PARTITION BY node ORDER BY t) AS prev
  FROM est
)
SELECT node,
  max(CASE WHEN t = {max_t} THEN est_milli END) AS reach_milli,
  SUM((greatest(est_milli - prev, 0) * 1000) // t)::BIGINT AS harmonic_micro
FROM terms WHERE t >= 1
GROUP BY node
"""
