"""Temporal joins (as-of / range), salted skew join, Z-order layout key.

Each operator is checked against a naive in-Python oracle on small
deterministic data — independent of the DuckDB driver twins, which check
the same operators over the full events table (queries ``asof_join``,
``range_join``, ``skew_join_salted``, ``zorder_layout``).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from amazonwebcrawler_spark.operators.skew import salted_equi_join
from amazonwebcrawler_spark.operators.temporal import asof_join, range_join_pairs

EPOCH = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return EPOCH + dt.timedelta(minutes=minutes)


class TestAsofJoin:
    def _frames(self, spark):
        # two keys; key 1 has out-of-order inserts and an exact-tie
        # timestamp; key 2 has a left row BEFORE any right row
        left = spark.createDataFrame(
            [
                (1, _ts(10), "l-a"),
                (1, _ts(25), "l-b"),
                (1, _ts(5), "l-c"),
                (2, _ts(1), "l-d"),
                (2, _ts(50), "l-e"),
            ],
            "k int, ts timestamp_ntz, lbl string",
        )
        right = spark.createDataFrame(
            [
                (1, _ts(5), 100),
                (1, _ts(20), 200),
                (2, _ts(2), 300),
                (2, _ts(40), 400),
            ],
            "k int, ts timestamp_ntz, price int",
        )
        return left, right

    def test_backward_matches_naive(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, on=["k"], right_cols=["price"])
        got = {r["lbl"]: (r["price"], r["ts_r"]) for r in out.collect()}
        assert got == {
            "l-a": (100, _ts(5)),  # latest right <= 10 min
            "l-b": (200, _ts(20)),
            "l-c": (100, _ts(5)),  # tie: right row at the SAME instant matches
            "l-d": (None, None),  # no right row yet
            "l-e": (400, _ts(40)),
        }

    def test_tolerance_drops_stale(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, on=["k"], right_cols=["price"], tolerance_s=6 * 60)
        got = {r["lbl"]: r["price"] for r in out.collect()}
        # l-a's match is 5 min old (fresh); l-b's is 5 min (fresh);
        # l-c's 0 min; l-e's 10 min > 6 min tolerance → dropped to null
        assert got == {"l-a": 100, "l-b": 200, "l-c": 100, "l-d": None, "l-e": None}

    def test_row_count_and_columns(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, on=["k"], right_cols=["price"])
        assert out.count() == left.count()
        assert out.columns == ["k", "ts", "lbl", "price", "ts_r"]

    def test_equal_ts_right_rows_pick_greatest_payload(self, spark):
        left = spark.createDataFrame([(1, _ts(10))], "k int, ts timestamp_ntz")
        right = spark.createDataFrame(
            [(1, _ts(3), 7), (1, _ts(3), 9), (1, _ts(3), 8)],
            "k int, ts timestamp_ntz, price int",
        )
        out = asof_join(left, right, on=["k"], right_cols=["price"])
        # deterministic tiebreak: greatest payload struct wins
        assert out.collect()[0]["price"] == 9

    def test_equal_ts_tiebreak_stable_under_repartition_and_tolerance(self, spark):
        """VERDICT r4 hardening: the struct tiebreak must hold on EVERY
        physical layout (the window-sort path is the only ordering), and
        the tolerance filter must evaluate against the tie WINNER's
        timestamp. 40 left rows × keys with 3 equal-ts right rows each,
        collected under four different partitionings, must be identical."""
        lrows = [(k, _ts(10 + i), i) for k in (1, 2, 3) for i in range(14)]
        left = spark.createDataFrame(lrows, "k int, ts timestamp_ntz, seq int")
        rrows = [
            (k, _ts(t), 100 * k + t * 10 + j)
            for k in (1, 2, 3)
            for t in (4, 9, 15)
            for j in range(3)  # three right rows per (k, ts)
        ]
        right = spark.createDataFrame(rrows, "k int, ts timestamp_ntz, price int")

        def run(ldf, rdf, tol=None):
            out = asof_join(ldf, rdf, on=["k"], right_cols=["price"], tolerance_s=tol)
            return sorted((r["k"], str(r["ts"]), r["seq"], r["price"]) for r in out.collect())

        base = run(left, right)
        # the max price among the 3 equal-ts rows always wins
        assert all(p is None or p % 10 == 2 for (_k, _t, _s, p) in base)
        for n in (1, 7, 32):
            assert run(left.repartition(n), right.repartition(n, "price")) == base
        # tolerance evaluated on the winner's rts: 2-minute window drops
        # matches older than 120 s but keeps the rows (null payload)
        tol = run(left, right, tol=120.0)
        assert len(tol) == len(base)
        assert any(p is None for (_k, _t, _s, p) in tol)
        for (_k, _t, _s, p) in tol:
            assert p is None or p % 10 == 2


class TestRangeJoin:
    def test_matches_naive_all_alignments(self, spark):
        # timestamps straddle bucket boundaries for every alignment of a
        # 7-minute window over 3-minute spacing
        lrows = [(i, _ts(3 * i)) for i in range(12)]
        rrows = [(100 + j, _ts(2 * j + 0.5)) for j in range(18)]
        left = spark.createDataFrame(lrows, "lid int, ts timestamp_ntz")
        right = spark.createDataFrame(rrows, "rid int, rts timestamp_ntz")
        lo, hi = -7 * 60_000_000, -1  # [ts-7min, ts) in µs
        pairs = range_join_pairs(left, right, "ts", "rts", lo, hi)
        got = sorted((r["lid"], r["rid"]) for r in pairs.collect())
        want = sorted(
            (li, rj)
            for li, lt in lrows
            for rj, rt in rrows
            if lt + dt.timedelta(microseconds=lo) <= rt <= lt + dt.timedelta(microseconds=hi)
        )
        assert got == want and len(want) > 0

    def test_extra_equi_key(self, spark):
        left = spark.createDataFrame(
            [(1, "a", _ts(10)), (2, "b", _ts(10))], "lid int, g string, ts timestamp_ntz"
        )
        right = spark.createDataFrame(
            [(7, "a", _ts(9)), (8, "b", _ts(9)), (9, "a", _ts(1))],
            "rid int, g string, rts timestamp_ntz",
        )
        pairs = range_join_pairs(
            left, right, "ts", "rts", -5 * 60_000_000, 0, on=["g"]
        )
        got = sorted((r["lid"], r["rid"]) for r in pairs.collect())
        assert got == [(1, 7), (2, 8)]  # rid 9 out of range, cross-group blocked

    def test_bucket_boundary_timestamps(self, spark):
        """VERDICT r4 hardening: rows whose timestamps sit EXACTLY on the
        bucket grid (ts % bucket_width == 0) and interval endpoints that
        land exactly on a boundary must match the naive O(n²) oracle —
        off-by-one in the ≤2-bucket explode shows up precisely here."""
        width_us = 7 * 60_000_000  # upper-lower span picks the bucket width
        lo, hi = -width_us, 0  # closed [ts-7min, ts]: endpoints inclusive
        # timestamps at exact multiples of 7 minutes plus a ±1 µs fringe
        lrows, rrows = [], []
        i = 0
        for mult in range(6):
            base = dt.timedelta(microseconds=mult * width_us)
            for jitter in (-1, 0, 1):
                t = EPOCH + base + dt.timedelta(microseconds=jitter)
                if t >= EPOCH:
                    lrows.append((i, t)); rrows.append((1000 + i, t)); i += 1
        left = spark.createDataFrame(lrows, "lid int, ts timestamp_ntz")
        right = spark.createDataFrame(rrows, "rid int, rts timestamp_ntz")
        got = sorted(
            (r["lid"], r["rid"])
            for r in range_join_pairs(left, right, "ts", "rts", lo, hi).collect()
        )
        want = sorted(
            (li, rj)
            for li, lt in lrows
            for rj, rt in rrows
            if lt + dt.timedelta(microseconds=lo) <= rt <= lt + dt.timedelta(microseconds=hi)
        )
        assert got == want and len(want) > len(lrows)  # self + neighbors

    def test_empty_interval_raises(self, spark):
        left = spark.createDataFrame([(1, _ts(0))], "lid int, ts timestamp_ntz")
        with pytest.raises(ValueError, match="empty interval"):
            range_join_pairs(left, left, "ts", "ts", 5, 4)

    def test_no_nested_loop_join_in_plan(self, spark):
        left = spark.createDataFrame([(1, _ts(0))], "lid int, ts timestamp_ntz")
        right = spark.createDataFrame([(2, _ts(0))], "rid int, rts timestamp_ntz")
        pairs = range_join_pairs(left, right, "ts", "rts", -60_000_000, 0)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan


class TestSaltedJoin:
    def test_equals_plain_join(self, spark):
        # 70% of fact rows share key 0 (hot key)
        fact = spark.range(200).select(
            F.col("id").alias("fid"),
            F.when(F.col("id") % 10 < 7, 0).otherwise(F.col("id") % 20).alias("k"),
        )
        dim = spark.range(20).select(F.col("id").alias("k"), (F.col("id") * 11).alias("v"))
        salted = salted_equi_join(fact, dim, "k", salt_expr=F.col("fid"), n_salts=4)
        plain = fact.join(dim, "k", "inner").select("fid", "k", "v")
        assert sorted(map(tuple, salted.select("fid", "k", "v").collect())) == sorted(
            map(tuple, plain.collect())
        )

    def test_left_join_keeps_unmatched(self, spark):
        fact = spark.range(10).select(F.col("id").alias("fid"), (F.col("id") + 100).alias("k"))
        dim = spark.range(1).select(F.lit(100).alias("k"), F.lit("hit").alias("v"))
        out = salted_equi_join(fact, dim, "k", salt_expr=F.col("fid"), n_salts=3, how="left")
        rows = {r["fid"]: r["v"] for r in out.collect()}
        assert rows[0] == "hit" and all(rows[i] is None for i in range(1, 10))

    def test_rejects_unsupported_how(self, spark):
        df = spark.range(1).select(F.col("id").alias("k"))
        with pytest.raises(ValueError, match="inner/left"):
            salted_equi_join(df, df, "k", salt_expr=F.col("k"), how="outer")


class TestZorder:
    def test_interleave_roundtrip(self, spark):
        from amazonwebcrawler_spark.functions.layout import zorder_key

        n, bits = 500, 8
        df = spark.range(n).select(
            F.col("id"),
            (F.col("id") * 37 % 256).alias("x"),
            (F.col("id") * 101 % 256).alias("y"),
            zorder_key(F.col("id") * 37 % 256, F.col("id") * 101 % 256, bits=8).alias("z"),
        )
        for r in df.collect():
            x = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(bits))
            y = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(bits))
            assert (x, y) == (r["x"], r["y"])

    def test_locality_beats_linear_sort(self, spark):
        """The point of the key: sorting by z clusters BOTH dims. Compare
        max per-chunk y-spread under z-sort vs (x, y)-sort — the
        lexicographic sort leaves y unclustered whenever x varies."""
        from amazonwebcrawler_spark.functions.layout import zorder_key

        rows = spark.range(4096).select(
            (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("int").alias("y")
        )
        z = rows.select("x", "y", zorder_key(F.col("x"), F.col("y"), bits=6).alias("k"))
        lex = rows.select("x", "y", (F.col("x") * 64 + F.col("y")).alias("k"))

        def max_chunk_spread(df, chunk=256):
            data = sorted((r["k"], r["y"]) for r in df.collect())
            spreads = []
            for s in range(0, len(data), chunk):
                ys = [y for _, y in data[s : s + chunk]]
                spreads.append(max(ys) - min(ys))
            return max(spreads)

        assert max_chunk_spread(z) < max_chunk_spread(lex)

    def test_rowgroup_pruning_beats_lex_sort(self, spark, tmp_path):
        """The operational claim behind the key: a z-sorted parquet file
        prunes row groups on BOTH dimensions via min/max stats, a
        lex-sorted one only on the leading column. Write both layouts with
        small row groups, then count row groups a ``y`` predicate can skip
        using footer statistics only (what Spark's parquet filter pushdown
        reads)."""
        import pyarrow.parquet as pq

        from amazonwebcrawler_spark.functions.layout import zorder_key

        rows = spark.range(4096).select(
            (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("int").alias("y")
        )
        zs = rows.select("x", "y", zorder_key(F.col("x"), F.col("y"), bits=6).alias("k"))
        lex = rows.select("x", "y", (F.col("x") * 64 + F.col("y")).alias("k"))

        def surviving_groups(df, path):
            pdf = df.orderBy("k").toPandas()
            import pyarrow as pa

            pq.write_table(pa.Table.from_pandas(pdf), path, row_group_size=256)
            md = pq.read_metadata(path)
            alive = 0
            for g in range(md.num_row_groups):
                col = md.row_group(g).column(1)  # y
                lo, hi = col.statistics.min, col.statistics.max
                if not (hi < 24 or lo > 31):  # predicate: y BETWEEN 24 AND 31
                    alive += 1
            return alive, md.num_row_groups

        z_alive, z_total = surviving_groups(zs, str(tmp_path / "z.parquet"))
        lex_alive, lex_total = surviving_groups(lex, str(tmp_path / "lex.parquet"))
        assert z_total == lex_total == 16
        # lex layout: y spans the full 0-63 range in every group → nothing
        # prunes; z layout: the curve confines y to 16-wide bands → at
        # least half the groups are skippable on the y predicate
        assert lex_alive == 16
        assert z_alive <= 8

    def test_bits_bounds(self):
        from amazonwebcrawler_spark.functions.layout import zorder_key

        with pytest.raises(ValueError, match="bits"):
            zorder_key(F.lit(1), F.lit(1), bits=0)

    def test_sql_twin_matches(self, spark, duckdb_conn):
        from amazonwebcrawler_spark.functions.layout import zorder_key, zorder_key_sql

        got = spark.range(300).select(
            zorder_key(F.col("id") % 32, (F.col("id") * 7) % 32, bits=5).alias("z")
        ).collect()
        want = duckdb_conn.execute(
            "SELECT "
            + zorder_key_sql("gs % 32", "(gs * 7) % 32", bits=5)
            + " AS z FROM (SELECT unnest(generate_series(0, 299)) AS gs)"
        ).fetchall()
        assert [r["z"] for r in got] == [r[0] for r in want]


class TestEma:
    def test_matches_pandas_ewm(self, spark):
        """pandas ewm(adjust=True) is the independent oracle for the
        window-sum formulation."""
        import pandas as pd

        rows = [(k, i, float((i * 7 + k * 3) % 23)) for k in (1, 2) for i in range(40)]
        df = spark.createDataFrame(rows, "k int, seq int, v double")
        got = {
            (r["k"], r["seq"]): r["ema"]
            for r in __import__("amazonwebcrawler_spark.operators.temporal", fromlist=["ema"])
            .ema(df, ["k"], "seq", "v", alpha=0.3)
            .collect()
        }
        pdf = pd.DataFrame(rows, columns=["k", "seq", "v"]).sort_values(["k", "seq"])
        for k, grp in pdf.groupby("k"):
            want = grp["v"].ewm(alpha=0.3, adjust=True).mean().tolist()
            for (_, row), w in zip(grp.iterrows(), want):
                assert abs(got[(k, row["seq"])] - w) < 1e-9, (k, row["seq"])

    def test_first_row_is_value_and_alpha_validated(self, spark):
        from amazonwebcrawler_spark.operators.temporal import ema

        df = spark.createDataFrame([(1, 1, 42.0)], "k int, seq int, v double")
        assert ema(df, ["k"], "seq", "v", alpha=0.5).collect()[0]["ema"] == 42.0
        with pytest.raises(ValueError, match="alpha"):
            ema(df, ["k"], "seq", "v", alpha=1.0)


class TestCaptureNovelty:
    def test_revisit_rule_with_tiebreak(self, spark):
        import datetime

        from amazonwebcrawler_spark.operators.temporal import capture_novelty

        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            # url 1: A A B A -> novel at caps 1, 3, 4
            (1, 1, t0, "A"), (1, 2, t0.replace(hour=1), "A"),
            (1, 3, t0.replace(hour=2), "B"), (1, 4, t0.replace(hour=3), "A"),
            # url 2: equal timestamps -> event_id breaks the tie (10 then 11)
            (2, 10, t0, "X"), (2, 11, t0, "X"),
        ]
        df = spark.createDataFrame(rows, "url_id long, event_id long, ts timestamp, digest string")
        got = {r.event_id: r for r in capture_novelty(df, "url_id", "ts", "digest", "event_id").collect()}
        assert [got[i].is_novel for i in (1, 2, 3, 4)] == [True, False, True, True]
        assert got[1].prev_digest is None and got[4].prev_digest == "B"
        assert got[10].is_novel is True and got[11].is_novel is False
        assert got[11].prev_digest == "X"
