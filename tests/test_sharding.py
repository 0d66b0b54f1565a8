"""Rendezvous-hash sharding properties: minimal movement (the reason HRW
exists), assignment determinism, and the move-plan arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazonwebcrawler_spark.operators.sharding import (
    rebalance_plan,
    rebalance_summary,
    rendezvous_assign,
)


def _keys(spark, n=500, salt="k"):
    return spark.range(n).select(
        F.concat(F.lit(f"https://example.com/{salt}/"), F.col("id").cast("string")).alias("url")
    )


class TestRendezvous:
    def test_assignment_total_and_deterministic(self, spark):
        shards = [f"s{i}" for i in range(5)]
        a1 = rendezvous_assign(_keys(spark), "url", shards).collect()
        a2 = rendezvous_assign(_keys(spark), "url", shards).collect()
        assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))
        assert all(r["shard"] in shards for r in a1)
        # every shard gets a share (500 keys over 5 shards — the odds of an
        # empty shard under a uniform hash are astronomically small)
        got = {r["shard"] for r in a1}
        assert got == set(shards)

    def test_repartition_invariant(self, spark):
        shards = [f"s{i}" for i in range(4)]
        base = _keys(spark, 300)
        a = rendezvous_assign(base, "url", shards)
        b = rendezvous_assign(base.repartition(7), "url", shards)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_grow_moves_only_into_new_shards(self, spark):
        """THE HRW property: adding shards never moves a key between
        surviving shards — every moved key lands on a NEW shard."""
        old = [f"s{i:02d}" for i in range(6)]
        new = old + ["s06", "s07"]
        plan = rebalance_plan(_keys(spark, 800), "url", old, new).collect()
        moved = [r for r in plan if r["moved"]]
        assert moved, "growing 6→8 shards should move ~25% of keys"
        assert all(r["new_shard"] in ("s06", "s07") for r in moved)
        # unmoved keys keep their exact old assignment
        assert all(r["old_shard"] == r["new_shard"] for r in plan if not r["moved"])
        # expected moved fraction ≈ 2/8 = 25%; allow a generous band
        frac = len(moved) / len(plan)
        assert 0.15 < frac < 0.35

    def test_shrink_moves_only_the_removed_shards_keys(self, spark):
        old = [f"s{i:02d}" for i in range(6)]
        new = old[:-1]  # drop s05
        plan = rebalance_plan(_keys(spark, 800), "url", old, new).collect()
        moved = [r for r in plan if r["moved"]]
        assert moved
        assert all(r["old_shard"] == "s05" for r in moved)

    def test_summary_arithmetic(self, spark):
        old = [f"s{i:02d}" for i in range(4)]
        new = old + ["s04"]
        plan = rebalance_plan(_keys(spark, 400), "url", old, new)
        rows = rebalance_summary(plan).collect()
        total = sum(r["n_keys"] for r in rows)
        moved = sum(r["n_moved"] for r in rows)
        assert total == 400
        # every row carries the same exact global milli fraction
        milli = {r["store_moved_milli"] for r in rows}
        assert milli == {moved * 1000 // total}
        # diagonal cells never count as moved
        for r in rows:
            if r["old_shard"] == r["new_shard"]:
                assert r["n_moved"] == 0
            else:
                assert r["n_moved"] == r["n_keys"]

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            rendezvous_assign(_keys(spark, 1), "url", [])
        with pytest.raises(ValueError):
            rendezvous_assign(_keys(spark, 1), "url", ["a", "a"])
