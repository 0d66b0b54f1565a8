"""Temporal joins the reference's rank-history workbook implies but Spark
lacks as built-ins: point-in-time (as-of) join and bounded range join.

The reference appends one column per crawl date to its rank workbook
(getRank.py:333-356 ``load_workbook`` → ``sheet.cell(row, col)`` with the
column index derived from the run date) — comparing a crawl against "the
state as of the previous run" is an as-of join, and "all fetches within the
last politeness window" is a range join. Both are re-expressed here as
shuffle-bounded DataFrame compositions:

* ``asof_join``   — union-tag + running ``last(ignorenulls)`` window: ONE
  hash shuffle on the join key, no inequality join, no explosion. This is
  the classic log-merge formulation (sort each key's timeline once; every
  left row picks up the latest preceding right payload).
* ``range_join_pairs`` — bucketized interval join: the right side is
  bucketed by ``floor(epoch / width)`` with width = window span, the left
  side explodes to the (≤2) candidate buckets, then an exact epoch filter
  runs AFTER the equi-join. Catalyst would otherwise plan a
  BroadcastNestedLoopJoin / cartesian for a pure inequality predicate —
  this keeps it a hash join whose shuffle is sized by the true pair count.

Scale notes (100 TB): both operators shuffle once on (key[, bucket]); a
hot key/bucket lands on one task — for known-hot keys compose with
``operators.skew.salted_equi_join`` or rely on AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_us(c: Column) -> Column:
    """Microseconds since 1970-01-01 of a timestamp-like column, WITHOUT a
    timezone round-trip: ``unix_micros`` rejects TIMESTAMP_NTZ, and casting
    NTZ → TIMESTAMP would re-interpret the value in the session zone (a
    DST-dependent, config-dependent offset). ``timestamp_diff`` against a
    naive epoch literal is exact and zone-free; DuckDB's ``epoch_us`` on a
    naive timestamp computes the identical number."""
    return F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), c.cast("timestamp_ntz")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: each left row gains the payload of the LATEST
    right row with ``right_ts <= left_ts`` (per ``on`` key), or nulls.

    Determinism: among right rows sharing (key, right_ts) the greatest
    payload struct wins (struct comparison is lexicographic), so the result
    is a pure function of the data — no partition-order dependence.

    ``tolerance_s`` drops matches older than the given number of seconds
    (pandas ``merge_asof`` semantics); the row survives with null payload.

    Plan shape: union (no shuffle) → one hash shuffle on ``on`` → sorted
    window scan per key → filter. The window is ``rowsBetween(unbounded,
    current)`` with ``last(payload, ignorenulls=True)`` — Spark evaluates
    it in one pass over each key's sorted timeline.
    """
    right_cols = right_cols or [c for c in right.columns if c not in on]
    # the right timestamp always comes back as ``right_ts + suffix`` — keep
    # it out of the payload columns so it isn't emitted twice
    right_cols = [c for c in right_cols if c != right_ts]
    out_names = [c + suffix if c in left.columns else c for c in right_cols]
    carry = [c for c in left.columns if c not in on and c != left_ts]

    # payload struct: right event time first (needed for the tolerance
    # check), then the carried columns. Struct order also serves as the
    # deterministic tiebreak among equal-timestamp right rows.
    pay = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c).alias(n) for c, n in zip(right_cols, out_names)]
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        pay.alias("_rpay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carry],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c) for c in carry],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc(), F.col("_rpay").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
    if tolerance_s is not None:
        fresh = epoch_us(F.col("_ats")) - epoch_us(F.col("_match._rts")) <= int(
            tolerance_s * 1_000_000
        )
        merged = merged.withColumn("_match", F.when(fresh, F.col("_match")))
    return merged.filter(F.col("_side") == 1).select(
        *on,
        F.col("_ats").alias(left_ts),
        *[F.col(c) for c in carry],
        *[F.col(f"_match.{n}").alias(n) for n in out_names],
        F.col("_match._rts").alias(right_ts + suffix),
    )


def ema(
    df: DataFrame,
    key_cols: list[str],
    order_col: str | list[str],
    value_col: str,
    alpha: float,
    out_col: str = "ema",
) -> DataFrame:
    """Exponentially-weighted moving average per key, as PURE window math —
    no recursion, no UDF, no driver loop.

    The recurrence ``y_n = α·x_n + (1-α)·y_{n-1}`` (pandas ``ewm(adjust=
    True)`` semantics: weights ``(1-α)^k`` at lag k, normalized) unrolls to
    a ratio of two running sums::

        y_n = Σ_{i≤n} x_i·b^{-i} / Σ_{i≤n} b^{-i}      (b = 1-α)

    because the common ``b^n`` factor cancels — so two partitioned
    cumulative sums over ``x·pow(b, -rn)`` and ``pow(b, -rn)`` give the
    exact EMA in one shuffle. Both engines evaluate running window sums in
    the same defined order, so the DuckDB twin is bit-identical.

    Numeric bound: ``b^{-rn}`` grows to ``b^{-n}`` for a key with n rows —
    doubles overflow past ~700·ln10/-ln(b) rows (α=0.25 → ~2,400 rows;
    α=0.1 → ~6,700). For longer keys, segment the timeline and rescale per
    segment (the cancellation argument applies blockwise); the recency-
    weighted crawl-priority use case re-anchors each wave anyway.

    ``order_col`` may be a list — pass a unique tiebreak column (e.g.
    ``["ts", "event_id"]``) whenever duplicate (key, order) rows are
    possible: a non-total order makes the row_number weights (and hence
    the EMA) partition-layout dependent, and lets a DuckDB twin disagree
    even though both engines are individually deterministic.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    b = 1.0 - alpha
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rn = F.row_number().over(Window.partitionBy(*key_cols).orderBy(*order_cols))
    weighted = df.withColumn("_w", F.pow(F.lit(b), -rn))
    return (
        weighted.withColumn(
            out_col,
            F.sum(F.col(value_col) * F.col("_w")).over(w) / F.sum("_w").over(w),
        )
        .drop("_w")
    )


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    on: list[str] | None = None,
) -> DataFrame:
    """Pairs (l, r) with ``right_ts`` in the closed interval
    ``[left_ts + lower_us, left_ts + upper_us]`` (microseconds), optionally
    also equal on ``on``. Both inputs keep all their columns (collisions
    must be pre-renamed by the caller).

    Bucketization: width = interval length, so every left window covers at
    most two right buckets — the join is a plain equi hash join on
    (bucket[, on]) whose output is ≤ 2× the true pair count before the
    exact filter. No BroadcastNestedLoopJoin, no cartesian (asserted in
    scripts/explain_plans.py).
    """
    if upper_us < lower_us:
        raise ValueError(f"empty interval: [{lower_us}, {upper_us}]")
    width = upper_us - lower_us + 1
    on = on or []

    r = right.withColumn("_bkt", F.floor(epoch_us(F.col(right_ts)) / width))
    lo = epoch_us(F.col(left_ts)) + lower_us
    hi = epoch_us(F.col(left_ts)) + upper_us
    l = left.withColumn(
        "_bkt", F.explode(F.array_distinct(F.array(F.floor(lo / width), F.floor(hi / width))))
    )
    pred = epoch_us(r[right_ts]).between(
        epoch_us(l[left_ts]) + lower_us, epoch_us(l[left_ts]) + upper_us
    )
    joined = l.join(r, on=[l["_bkt"] == r["_bkt"], *[l[c] == r[c] for c in on]], how="inner")
    return joined.filter(pred).drop("_bkt")


def capture_novelty(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    digest_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """CDX-style revisit dedup over a capture log — the web-archive rule
    (Wayback CDX ``warc/revisit`` records) that a recrawl of an unchanged
    page stores a POINTER, not a payload: a capture is novel iff its
    content digest differs from the SAME url's previous capture.

    One key-partitioned window (never global), ordered by
    ``(ts, tiebreak)`` — the explicit tiebreak keeps equal-timestamp
    captures deterministic on every engine (the r4 ema/asof lesson).
    Adds ``prev_digest`` (NULL on first capture) and ``is_novel``; the
    storage win is ``1 - novel/total`` of payload bytes at 10^10 urls.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(digest_col).over(w)
    return df.withColumn("prev_digest", prev).withColumn(
        "is_novel", prev.isNull() | (F.col(digest_col) != prev)
    )
