"""Skew-aware equi join: deterministic fact-side salting + dim replication.

The crawl frontier's host distribution is Zipfian (SURVEY.md §6 — a
handful of amazon.* host shards carry most URLs, the reference crawls a
single site so EVERY row shares one host, getRank.py:60's one-driver
loop). A plain hash join on such a key sends the hot key's entire volume
to one reducer. When the dim side is small Spark's answer is a broadcast
join (no shuffle at all) — but at 100 TB the dim can itself be too big to
broadcast (a per-URL metadata table, a 10^8-row robots cache), and the
sort-merge join then stalls on the hot partition even with AQE skew
splitting (AQE splits by partition SIZE, which helps only after the
shuffle files exist).

``salted_equi_join`` fixes the plan shape instead: the fact side gets a
deterministic salt in ``[0, n_salts)`` (a pure function of caller-chosen
columns — NEVER ``rand()``, which breaks retry/resume determinism), the
dim side is replicated ``n_salts`` times via ``explode(sequence(...))``,
and the join key becomes ``(key, salt)`` — the hot key now spreads over
``n_salts`` reducers. Cost: dim shuffle volume × n_salts; pick n_salts ≈
(hot-key rows / target partition rows), not "as large as possible".

Result contract: identical to ``fact.join(dim, key, "inner")`` — proven
row-for-row in tests/test_temporal.py and value-checked against the DuckDB
plain-join twin (driver query ``skew_join_salted``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_expr: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left equi join of ``fact`` to ``dim`` on ``key``, executed as a
    join on ``(key, salt)`` so one hot key fans out over ``n_salts``
    reducers. ``salt_expr`` must be deterministic per fact row (e.g.
    ``F.pmod(F.col("event_id"), 8)`` or a column hash); its value is taken
    mod ``n_salts`` defensively.

    Columns: all fact columns + all non-key dim columns (dim's key column
    is dropped — it equals fact's). The salt never escapes.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted join supports inner/left, got {how!r}")
    f = fact.withColumn("_salt", F.pmod(salt_expr.cast("long"), F.lit(n_salts)))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out_cols = fact.columns + [c for c in dim.columns if c != key and c not in fact.columns]
    return f.join(d, on=[key, "_salt"], how=how).select(*out_cols)
