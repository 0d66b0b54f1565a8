"""Rendezvous (highest-random-weight) sharding for the URL-seen state
store — the resharding story the Bloom/cuckoo shards need at 10^10 URLs.

The reference pins its dedupe state to one process (getRank.py keeps the
seen-set in a module-level dict), so "what happens when the store must
grow" never arises there. At frontier scale it is THE operational
question: the COW shard tables (operators/bloom.py) are keyed by a
CRC32-mod shard id, and growing ``n_shards`` under mod-hashing remaps
~(1 - 1/k) of all keys — a full-store rewrite. Rendezvous hashing
(Thaler & Ravishankar 1996, the HRW scheme behind Ceph/Cassandra-style
placement) remaps the provable minimum: a key moves ONLY into a newly
added shard (never between surviving shards), so adding m shards to n
moves an expected m/(n+m) of keys and deleting a shard moves only that
shard's keys.

Everything is a pure function of the data: the per-(key, shard) weight is
the top 60 bits of ``md5(key || '|' || shard)`` (15 hex chars → BIGINT,
both engines compute the identical number), and the argmax is an
``array_max`` over a literal struct array — ties (2^-60 probability)
break on shard name via lexicographic struct comparison. No shuffle, no
join, no UDF: assignment is a codegen'd projection, so planning a
rebalance of 10^10 keys is one map-only scan that emits the move list;
only the moved fraction is ever rewritten.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rendezvous_weight(key: Column, shard: Column) -> Column:
    """60-bit HRW weight of (key, shard): top 15 hex chars of
    ``md5(key || '|' || shard)`` as a non-negative BIGINT. DuckDB twin:
    ``CAST(('0x' || substr(md5(key || '|' || shard), 1, 15)) AS UBIGINT)``."""
    return F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit("|"), shard)), 1, 15), 16, 10
    ).cast("long")


def rendezvous_assign(
    df: DataFrame, key_col: str, shards: Sequence[str], out_col: str = "shard"
) -> DataFrame:
    """Assign every row's ``key_col`` to its HRW winner among ``shards``.

    The shard list rides the plan as literals (like the IVF codebook /
    BPE merge table), so the weight computation is pure column math —
    ``len(shards)`` md5 calls per row inside one codegen span. Fine for
    the tens-to-hundreds of shards a state store uses; for thousands of
    nodes the standard trick is two-level HRW (hash to a shard GROUP,
    then within it), which composes from this same primitive.
    """
    if not shards:
        raise ValueError("shards must be non-empty")
    if len(set(shards)) != len(shards):
        raise ValueError("duplicate shard names")
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(rendezvous_weight(key, F.lit(s)).alias("w"), F.lit(s).alias("s"))
            for s in shards
        ]
    )
    return df.withColumn(out_col, F.array_max(pairs)["s"])


def rebalance_plan(
    df: DataFrame,
    key_col: str,
    old_shards: Sequence[str],
    new_shards: Sequence[str],
) -> DataFrame:
    """Per-key move plan for resharding ``old_shards`` → ``new_shards``:
    columns (key, old_shard, new_shard, moved). Map-only; the caller
    filters ``moved`` to get the rewrite list and aggregates for the move
    matrix. HRW's minimal-movement property (a key never moves BETWEEN
    surviving shards) is asserted in tests/test_sharding.py as a
    property over randomized key sets.
    """
    out = rendezvous_assign(df, key_col, old_shards, out_col="old_shard")
    out = rendezvous_assign(out, key_col, new_shards, out_col="new_shard")
    return out.withColumn("moved", F.col("old_shard") != F.col("new_shard"))


def rebalance_summary(plan: DataFrame) -> DataFrame:
    """Move matrix of a ``rebalance_plan`` output: one row per
    (old_shard, new_shard) with ``n_keys`` and the exact integer
    ``moved_milli`` = (moved keys × 1000) DIV total keys — the fraction
    of the store the rebalance rewrites, bit-stable across engines.

    Two map-side-combinable aggregates (cell counts + a 1-row total
    broadcast back); nothing here scales with key count beyond the scan.
    """
    cells = plan.groupBy("old_shard", "new_shard").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.col("moved").cast("long")).alias("n_moved"),
    )
    tot = plan.agg(
        F.count(F.lit(1)).alias("_total"),
        F.sum(F.col("moved").cast("long")).alias("_total_moved"),
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "old_shard",
            "new_shard",
            "n_keys",
            "n_moved",
            F.expr("(_total_moved * 1000L) DIV _total").alias("store_moved_milli"),
        )
    )
