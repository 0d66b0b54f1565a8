"""Cuckoo-filter URL-seen state table (SURVEY.md P15's 'Bloom/cuckoo';
north_rule names both). Same sharded state-table interface as
``operators/bloom.py`` — (shard, table bytes, n_items) rows, cogrouped
merge/probe kernels — but with the cuckoo filter's extra power: **deletion**
(a Bloom filter cannot retire URLs; a crawl that re-permits stale pages can).

Standard partial-key cuckoo filter (Fan et al., CoNEXT'14): buckets of 4
16-bit fingerprint slots; item x lands in bucket ``i1 = h1(x) mod m`` or its
partner ``i2 = i1 XOR (hash(fp) mod m)`` — the XOR makes the pair an
involution computable from either side, so eviction only needs the resident
fingerprint. m is a power of two. ~0.0003 false-positive rate at 16-bit
fingerprints; ≤0.95 load factor before insert failure.

Determinism: every kernel sorts its group by (h1, h2) before mutating, so
the final table bytes are a pure function of the key SET, independent of
partitioning or arrival order (same contract as the rest of the engine).

Reference parity: the reference has NO url-seen at all — it re-fetches
freely (getRank.py:361 re-gets per SKU; getTitle.py:192's TODO admits the
waste). This operator is part of the engine's ⊕ scale layer.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_SCHEMA = "shard int, table binary, n_items long, n_buckets int, slots int"

_FP_MIX = np.uint64(0x5BD1E995)


@dataclass(frozen=True)
class CuckooConfig:
    n_shards: int = 16
    n_buckets: int = 1 << 12   # buckets per shard — MUST be a power of two
    slots: int = 4
    max_kicks: int = 500

    def __post_init__(self):
        assert self.n_buckets & (self.n_buckets - 1) == 0, "n_buckets must be 2^k"


def with_cuckoo_keys(df: DataFrame, url_col: str, cfg: CuckooConfig) -> DataFrame:
    """Attach (h1, h2, shard) — pure JVM column math, no Python."""
    return (
        df.withColumn("h1", F.xxhash64(F.col(url_col)))
        .withColumn("h2", F.xxhash64(F.col(url_col), F.lit("c2")))
        .withColumn("shard", F.pmod(F.col("h1"), F.lit(cfg.n_shards)).cast("int"))
    )


def empty_shards(spark: SparkSession, cfg: CuckooConfig) -> DataFrame:
    nbytes = cfg.n_buckets * cfg.slots * 2  # uint16 slots
    rows = [(s, bytearray(nbytes), 0, cfg.n_buckets, cfg.slots) for s in range(cfg.n_shards)]
    return spark.createDataFrame(rows, SHARD_SCHEMA)


def _fp_i1_i2(h1: np.ndarray, h2: np.ndarray, n_buckets: int):
    mask = np.uint64(n_buckets - 1)
    fp = (h2.astype(np.uint64) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    i1 = (h1.astype(np.uint64) >> np.uint64(8)) & mask
    i2 = i1 ^ ((fp.astype(np.uint64) * _FP_MIX) & mask)
    return fp, i1.astype(np.int64), i2.astype(np.int64)


def _table_of(shard_row: pd.DataFrame, cfg: CuckooConfig) -> np.ndarray:
    if shard_row.empty:
        return np.zeros((cfg.n_buckets, cfg.slots), dtype=np.uint16)
    raw = np.frombuffer(shard_row["table"].iloc[0], dtype=np.uint16).copy()
    return raw.reshape(cfg.n_buckets, cfg.slots)


def _insert_one(table: np.ndarray, fp: int, i1: int, i2: int, cfg: CuckooConfig) -> bool:
    mask = cfg.n_buckets - 1
    for i in (i1, i2):
        empties = np.nonzero(table[i] == 0)[0]
        if len(empties):
            table[i, empties[0]] = fp
            return True
    # eviction loop — deterministic victim slot per kick
    i = i1
    cur = np.uint16(fp)
    for kick in range(cfg.max_kicks):
        slot = (int(cur) + kick) % cfg.slots
        cur, table[i, slot] = table[i, slot], cur
        # keep the index math in ONE unsigned dtype: numpy refuses
        # int64 ^ uint64 (no safe common type), so cast i to uint64 first
        i = int(np.uint64(i) ^ ((np.uint64(int(cur)) * _FP_MIX) & np.uint64(mask)))
        empties = np.nonzero(table[i] == 0)[0]
        if len(empties):
            table[i, empties[0]] = cur
            return True
    raise RuntimeError(
        f"cuckoo shard over capacity (load > ~0.95): size up n_buckets (={cfg.n_buckets})"
    )


def merge_into_shards(new_keys: DataFrame, shards: DataFrame, cfg: CuckooConfig) -> DataFrame:
    """Insert (h1, h2)-keyed items into their shards. Cogrouped per shard:
    one task sees one shard's table + its new keys (same shape as bloom)."""

    def merge(keys: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
        if keys.empty:
            return shard[["shard", "table", "n_items", "n_buckets", "slots"]]
        s = int(keys["shard"].iloc[0])
        table = _table_of(shard, cfg)
        n = 0 if shard.empty else int(shard["n_items"].iloc[0])
        keys = keys.sort_values(["h1", "h2"])  # arrival-order independence
        fp, i1, i2 = _fp_i1_i2(keys["h1"].to_numpy(), keys["h2"].to_numpy(), cfg.n_buckets)
        for f_, a, b in zip(fp, i1, i2):
            _insert_one(table, int(f_), int(a), int(b), cfg)
            n += 1
        return pd.DataFrame(
            [{"shard": s, "table": table.tobytes(), "n_items": n,
              "n_buckets": cfg.n_buckets, "slots": cfg.slots}]
        )

    return (
        new_keys.select("shard", "h1", "h2")
        .groupBy("shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(merge, SHARD_SCHEMA)
    )


def probe_shards(candidates: DataFrame, shards: DataFrame, cfg: CuckooConfig) -> DataFrame:
    """candidates (+h1,h2,shard) → same rows + ``maybe_seen:boolean``.
    No false negatives for inserted-and-not-deleted keys."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
    )
    cols = [f.name for f in candidates.schema.fields]

    def probe(cand: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(columns=[*cols, "maybe_seen"])
        cand = cand.sort_values(["h1", "h2"]).copy()
        if shard.empty:
            cand["maybe_seen"] = False
            return cand
        table = _table_of(shard, cfg)
        fp, i1, i2 = _fp_i1_i2(cand["h1"].to_numpy(), cand["h2"].to_numpy(), cfg.n_buckets)
        hit = (table[i1] == fp[:, None]).any(1) | (table[i2] == fp[:, None]).any(1)
        cand["maybe_seen"] = hit
        return cand

    return (
        candidates.groupBy("shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(probe, out_schema)
    )


def delete_from_shards(victims: DataFrame, shards: DataFrame, cfg: CuckooConfig) -> DataFrame:
    """Remove one fingerprint occurrence per victim key — the operation a
    Bloom filter cannot do. Deleting a never-inserted key is a no-op (it
    may remove a colliding twin's fingerprint — the standard cuckoo caveat:
    only delete keys known to have been inserted)."""

    def delete(keys: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
        if shard.empty:
            return pd.DataFrame(
                columns=["shard", "table", "n_items", "n_buckets", "slots"]
            ).astype({"shard": "int32", "n_items": "int64", "n_buckets": "int32", "slots": "int32"})
        s = int(shard["shard"].iloc[0])
        table = _table_of(shard, cfg)
        n = int(shard["n_items"].iloc[0])
        if not keys.empty:
            keys = keys.sort_values(["h1", "h2"])
            fp, i1, i2 = _fp_i1_i2(keys["h1"].to_numpy(), keys["h2"].to_numpy(), cfg.n_buckets)
            for f_, a, b in zip(fp, i1, i2):
                for i in (int(a), int(b)):
                    slots = np.nonzero(table[i] == f_)[0]
                    if len(slots):
                        table[i, slots[0]] = 0
                        n -= 1
                        break
        return pd.DataFrame(
            [{"shard": s, "table": table.tobytes(), "n_items": n,
              "n_buckets": cfg.n_buckets, "slots": cfg.slots}]
        )

    return (
        victims.select("shard", "h1", "h2")
        .groupBy("shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(delete, SHARD_SCHEMA)
    )
