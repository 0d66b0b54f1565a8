"""Cuckoo-filter URL-seen properties: zero false negatives, bounded false
positives, DELETION (the capability Bloom lacks), and arrival-order /
partitioning independence of the table bytes."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazonwebcrawler_spark.operators import cuckoo


def _urls(spark, prefix, n):
    return spark.createDataFrame(
        [(f"https://www.amazon.com/{prefix}/B{i:07d}",) for i in range(n)],
        "canonical_url string",
    )


def test_no_false_negatives_bounded_fp_and_delete(spark):
    cfg = cuckoo.CuckooConfig(n_shards=8, n_buckets=1 << 10, slots=4)
    seen = cuckoo.with_cuckoo_keys(_urls(spark, "dp", 2000), "canonical_url", cfg)
    shards = cuckoo.merge_into_shards(seen, cuckoo.empty_shards(spark, cfg), cfg)

    # every inserted URL probes positive
    assert cuckoo.probe_shards(seen, shards, cfg).filter(~F.col("maybe_seen")).count() == 0

    # unseen URLs: 16-bit fingerprints → fp rate ~ 2*slots/2^16 ≈ 1.2e-4
    unseen = cuckoo.with_cuckoo_keys(_urls(spark, "gp/other", 2000), "canonical_url", cfg)
    fp = cuckoo.probe_shards(unseen, shards, cfg).filter(F.col("maybe_seen")).count()
    assert fp <= 5, f"false-positive rate too high: {fp}/2000"

    # delete the first 1000: deleted keys go negative (minus rare fingerprint
    # twins), the kept 1000 must ALL stay positive (deletion never causes
    # false negatives for remaining keys)
    victims = seen.filter(F.col("canonical_url") < "https://www.amazon.com/dp/B0001000")
    kept = seen.filter(F.col("canonical_url") >= "https://www.amazon.com/dp/B0001000")
    shards2 = cuckoo.delete_from_shards(victims, shards, cfg)
    still = cuckoo.probe_shards(victims, shards2, cfg).filter(F.col("maybe_seen")).count()
    assert still <= 5, f"deleted keys still probing positive: {still}/1000"
    assert cuckoo.probe_shards(kept, shards2, cfg).filter(~F.col("maybe_seen")).count() == 0
    # item counts decremented
    n_after = shards2.agg(F.sum("n_items")).collect()[0][0]
    assert n_after == 2000 - 1000


def test_table_bytes_independent_of_partitioning(spark):
    """The filter state is a pure function of the key SET: different input
    partitionings must produce byte-identical shard tables."""
    cfg = cuckoo.CuckooConfig(n_shards=4, n_buckets=1 << 10, slots=4)
    urls = _urls(spark, "dp", 1500)
    a = cuckoo.merge_into_shards(
        cuckoo.with_cuckoo_keys(urls.repartition(3), "canonical_url", cfg),
        cuckoo.empty_shards(spark, cfg), cfg,
    )
    b = cuckoo.merge_into_shards(
        cuckoo.with_cuckoo_keys(urls.repartition(13), "canonical_url", cfg),
        cuckoo.empty_shards(spark, cfg), cfg,
    )
    ta = {r.shard: bytes(r.table) for r in a.collect()}
    tb = {r.shard: bytes(r.table) for r in b.collect()}
    assert ta == tb
