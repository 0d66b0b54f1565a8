"""Partitioned Bloom-filter URL-seen state (SURVEY.md P15/J6; north_rule).

The reference re-fetches freely (it re-``get``\\ s every SKU page,
getRank.py:361, and its own TODO laments wasted refetches, getTitle.py:192).
At 10^10 frontier URLs an exact ``seen`` anti-join would shuffle the full
seen set every wave — the Bloom filter is the scale path:

* the seen set is sharded into ``n_buckets`` bitsets, partitioned by
  ``pmod(h1, n_buckets)`` — each candidate URL touches exactly ONE shard;
* hash positions use Kirsch-Mitzenmacher double hashing
  ``pos_i = (h1 + i*h2) mod m`` with ``h1 = xxhash64(url)`` and
  ``h2 = xxhash64(url, 's2')`` computed **JVM-side** as column expressions —
  the pandas kernels below only ever see int64s, all numpy-vectorized;
* probe and merge are **cogrouped** ``applyInPandas`` over (candidates ⨝
  shards) grouped by bucket, so a shard's bytes are materialized once per
  task, never duplicated per candidate row;
* the filter admits false positives but never false negatives, so:
  ``maybe_seen == False`` → definitely new (no exact check needed);
  ``maybe_seen == True``  → confirmed against the exact ``seen`` table with
  a ``left_anti`` join — which at scale only touches the tiny
  TP+FP subset instead of the whole frontier.

Sizing: with the default ``bits_per_item=12, k=5`` the false-positive rate
is ~0.3%; at 10^10 URLs that is 15 GB of filter split over shards
(``n_buckets=4096`` → ~3.7 MB/shard), one shard per task.

**Exact confirm, two modes.** Every shard also carries ``keys`` — the
bucket's SORTED uint64 array of ``h1 = xxhash64(url)`` key hashes. The
probe kernel answers ``exact_seen`` (searchsorted membership) in the same
cogroup task that tests the bitset, which lets the crawler confirm new
URLs with ZERO extra shuffles and no per-wave scan of the ``seen`` table
(``CrawlConfig.exact_confirm='shard_sets'``). Cost: +8 B/URL of state
(~80 GB at 10^10, ~20 MB/bucket at 4096 buckets — read/written per dirty
bucket only, COW). Exactness is up to xxhash64 collisions (p ≈ n²/2^65 —
~3e-9 even for a 10^10-URL crawl); the default ``'seen_table'`` mode keeps
the md5-exact left_anti against the seen table, which is what the DuckDB
oracle and byte-exact resume contract check. Both modes produce identical
crawls (tested).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_SCHEMA = "bucket int, bits binary, n_items long, m_bits long, k int, keys binary"


@dataclass(frozen=True)
class BloomConfig:
    n_buckets: int = 64
    m_bits: int = 1 << 20  # bits per shard
    k: int = 5
    #: accumulate the per-bucket sorted key-hash sets that back
    #: ``probe_shards(exact=True)``. Costs +8 B/URL of shard state and a
    #: per-dirty-bucket union+rewrite — CrawlConfig wires it OFF for the
    #: default ``seen_table`` confirm mode, which never reads the sets.
    track_keys: bool = True

    @classmethod
    def for_capacity(cls, n_items: int, bits_per_item: int = 12, n_buckets: int = 64) -> "BloomConfig":
        per_shard = max(1 << 14, (n_items * bits_per_item) // n_buckets)
        # round up to a whole number of bytes: empty_shards allocates
        # m_bits>>3 bytes while _positions addresses bits up to m_bits-1 —
        # a non-multiple-of-8 m_bits would index past the byte array
        per_shard = (per_shard + 7) & ~7
        return cls(n_buckets=n_buckets, m_bits=int(per_shard), k=5)


def with_bloom_keys(df: DataFrame, url_col: str, cfg: BloomConfig) -> DataFrame:
    """Attach (h1, h2, bucket) — pure JVM column math, no Python."""
    return (
        df.withColumn("h1", F.xxhash64(F.col(url_col)))
        .withColumn("h2", F.xxhash64(F.col(url_col), F.lit("s2")))
        .withColumn("bucket", F.pmod(F.col("h1"), F.lit(cfg.n_buckets)).cast("int"))
    )


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n,) int64 pairs → (n, k) bit positions. Vectorized double hashing."""
    u1 = h1.astype(np.uint64)
    u2 = h2.astype(np.uint64) | np.uint64(1)  # force odd so strides cycle
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((u1[:, None] + i * u2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _set_bits(bits: bytearray, pos: np.ndarray) -> None:
    arr = np.frombuffer(bits, dtype=np.uint8).copy()
    flat = pos.ravel()
    np.bitwise_or.at(arr, flat >> 3, (1 << (flat & 7)).astype(np.uint8))
    bits[:] = arr.tobytes()


def _test_bits(bits: bytes, pos: np.ndarray) -> np.ndarray:
    """(n, k) positions → (n,) bool 'all k bits set'."""
    arr = np.frombuffer(bits, dtype=np.uint8)
    hit = (arr[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return hit.all(axis=1)


def empty_shards(spark: SparkSession, cfg: BloomConfig) -> DataFrame:
    assert cfg.m_bits % 8 == 0, "m_bits must be byte-aligned (see for_capacity)"
    rows = [
        (b, bytearray(cfg.m_bits >> 3), 0, cfg.m_bits, cfg.k, bytearray())
        for b in range(cfg.n_buckets)
    ]
    return spark.createDataFrame(rows, SHARD_SCHEMA)


def merge_into_shards(
    new_keys: DataFrame, shards: DataFrame, cfg: BloomConfig, dirty_only: bool = False
) -> DataFrame:
    """OR the (h1, h2)-keyed new URLs into their shards.

    ``new_keys`` must carry (h1, h2, bucket) from :func:`with_bloom_keys`.
    Cogrouped per bucket: one task sees one shard + its new keys.

    ``dirty_only=True`` is the copy-on-write path: buckets that received no
    new keys are NOT emitted — per-wave shard writes are then O(dirty
    buckets), not O(all buckets). At 10^10 URLs (15 GB of filter over 4096
    buckets) rewriting every bucket every wave would be the dominant write;
    with COW a wave rewrites only the few MB it actually touched
    (StateStore.load_shard_state reconstructs latest-per-bucket).

    Key-set accumulation is gated on ``cfg.track_keys``: with it off the
    ``keys`` column is written empty (lean shard state for the seen_table
    confirm mode, which never reads it). NOTE a merge with ``track_keys
    False`` also drops any EXISTING key set on the buckets it touched —
    switching a live store from shard_sets to seen_table mode and back
    leaves the sets incomplete; use a fresh store when changing modes.
    This is ENFORCED, not just documented: a ``track_keys=True`` merge
    that meets a populated bucket with an empty stored key set raises —
    unioning new keys onto that empty set would produce a non-empty but
    INCOMPLETE set that passes probe_shards' emptiness guard and silently
    answers ``exact_seen=False`` for every pre-switch URL (re-admitting
    already-crawled pages).
    """
    k, m, track = cfg.k, cfg.m_bits, cfg.track_keys

    def merge(keys: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
        if keys.empty and dirty_only:
            return pd.DataFrame(
                {"bucket": pd.Series(dtype="int32"), "bits": pd.Series(dtype=object),
                 "n_items": pd.Series(dtype="int64"), "m_bits": pd.Series(dtype="int64"),
                 "k": pd.Series(dtype="int32"), "keys": pd.Series(dtype=object)}
            )
        if shard.empty:
            bucket = int(keys["bucket"].iloc[0])
            bits, n_items = bytearray(m >> 3), 0
            key_set = np.array([], dtype=np.uint64)
        else:
            bucket = int(shard["bucket"].iloc[0])
            bits, n_items = bytearray(shard["bits"].iloc[0]), int(shard["n_items"].iloc[0])
            key_set = (
                np.frombuffer(shard["keys"].iloc[0] or b"", dtype=np.uint64)
                if track
                else np.array([], dtype=np.uint64)
            )
            if track and n_items > 0 and not len(key_set):
                raise ValueError(
                    f"track_keys merge onto bucket {bucket} with {n_items} items "
                    "but NO stored key set — this store was written with "
                    "track_keys=False (seen_table mode); resuming it in "
                    "shard_sets mode would build an incomplete key set that "
                    "silently re-admits pre-switch URLs. Use a fresh store "
                    "when changing confirm modes."
                )
        if not keys.empty:
            h1 = keys["h1"].to_numpy()
            pos = _positions(h1, keys["h2"].to_numpy(), k, m)
            _set_bits(bits, pos)
            n_items += len(keys)
            if track:
                # sorted exact key set — a pure function of the key SET
                # (np.union1d sorts + dedups), independent of arrival order
                key_set = np.union1d(key_set, h1.astype(np.uint64))
        return pd.DataFrame(
            [{"bucket": bucket, "bits": bytes(bits), "n_items": n_items, "m_bits": m,
              "k": k, "keys": key_set.tobytes()}]
        )

    return (
        new_keys.select("bucket", "h1", "h2")
        .groupBy("bucket")
        .cogroup(shards.groupBy("bucket"))
        .applyInPandas(merge, SHARD_SCHEMA)
    )


def probe_shards(
    candidates: DataFrame, shards: DataFrame, cfg: BloomConfig, exact: bool = False
) -> DataFrame:
    """candidates (+h1,h2,bucket) → same rows + ``maybe_seen:boolean``
    (and, with ``exact=True``, ``exact_seen:boolean``).

    No false negatives: ``maybe_seen=false`` rows are guaranteed unseen.
    ``exact_seen`` is searchsorted membership in the shard's sorted key-hash
    set — the zero-extra-shuffle confirm path (module docstring); exact up
    to xxhash64 collisions.
    """
    k, m = cfg.k, cfg.m_bits
    from pyspark.sql import types as T

    extra = [T.StructField("maybe_seen", T.BooleanType())]
    if exact:
        extra.append(T.StructField("exact_seen", T.BooleanType()))
    out_schema = T.StructType(list(candidates.schema.fields) + extra)
    cols = [f.name for f in candidates.schema.fields]
    extra_names = [f.name for f in extra]

    def probe(cand: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(columns=[*cols, *extra_names])
        if shard.empty:
            cand = cand.copy()
            cand["maybe_seen"] = False
            if exact:
                cand["exact_seen"] = False
            return cand
        pos = _positions(cand["h1"].to_numpy(), cand["h2"].to_numpy(), k, m)
        cand = cand.copy()
        cand["maybe_seen"] = _test_bits(shard["bits"].iloc[0], pos)
        if exact:
            key_set = np.frombuffer(shard["keys"].iloc[0] or b"", dtype=np.uint64)
            # a populated bucket with NO key set means the state was written
            # without key tracking (seen_table mode, or a pre-r3 checkpoint)
            # — answering exact_seen=False for already-crawled URLs would
            # silently re-admit them; fail loudly instead
            if int(shard["n_items"].iloc[0]) > 0 and not len(key_set):
                raise ValueError(
                    "exact probe on a shard with items but no key set — this "
                    "state was written without track_keys (seen_table mode or "
                    "a pre-r3 checkpoint); resume shard_sets mode only from a "
                    "store written with track_keys=True"
                )
            h1 = cand["h1"].to_numpy().astype(np.uint64)
            if len(key_set):
                idx = np.searchsorted(key_set, h1)
                idx[idx >= len(key_set)] = len(key_set) - 1
                cand["exact_seen"] = key_set[idx] == h1
            else:
                cand["exact_seen"] = False
        return cand

    return (
        candidates.groupBy("bucket")
        .cogroup(shards.groupBy("bucket"))
        .applyInPandas(probe, out_schema)
    )


def bloom_plan(configs, n_col: str = "n_items", fpr_col: str = "target_fpr_ppm"):
    """Bloom sizing advisor — the capacity arithmetic that decides the
    URL-seen filter's shape BEFORE a 10^10-URL crawl commits to it
    (resizing a live filter means a full rebuild, operators/bloom's COW
    shards notwithstanding): for each (n_items, target_fpr) row,
    the textbook optima ``m = ⌈−n·ln p / ln²2⌉`` bits and
    ``k = max(1, round(m/n · ln 2))`` hashes, the re-predicted FPR at
    that integer (m, k) — ``(1 − e^{−kn/m})^k``, micro-rounded once —
    and the bytes per shard under the store's bucket count. Runs on a
    handful of config rows (pure column math, no data side); the
    MEASURED counterpart is bloom_stats' live false-negative/occupancy
    audit — plan here, verify there.

    Returns (n_items, target_fpr_ppm, m_bits, k_hashes,
    predicted_fpr_micro, bytes_total)."""
    from pyspark.sql import functions as F

    n = F.col(n_col).cast("double")
    p = F.col(fpr_col).cast("double") / 1e6
    ln2 = 0.6931471805599453
    m = F.ceil(-(n * F.log(p)) / F.lit(ln2 * ln2)).cast("long")
    k = F.greatest(F.lit(1), F.round(m.cast("double") / n * ln2).cast("long"))
    pred = F.pow(
        F.lit(1.0) - F.exp(-(k.cast("double") * n) / m.cast("double")), k.cast("double")
    )
    return configs.select(
        F.col(n_col).cast("long").alias("n_items"),
        F.col(fpr_col).cast("long").alias("target_fpr_ppm"),
        m.alias("m_bits"),
        k.alias("k_hashes"),
        F.round(pred * 1e6).cast("long").alias("predicted_fpr_micro"),
        F.floor((m + 7) / 8).cast("long").alias("bytes_total"),
    )
