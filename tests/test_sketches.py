"""Deterministic HLL + HyperBall (operators/sketches.py) — exactness of
the register/estimate math vs an INDEPENDENT pure-Python re-derivation
(hashlib md5, int.bit_length — no Spark, no DuckDB), the merge algebra,
the certification bound, and HyperBall vs exact-BFS harmonic centrality."""

import hashlib
import math

from pyspark.sql import functions as F

from amazonwebcrawler_spark.operators import sketches as sk


# ------------------------------------------------------------------ python oracle
def _py_parts(item) -> tuple[int, int]:
    h = hashlib.md5(str(item).encode()).hexdigest()
    bucket = int(h[0:2], 16) % sk.M
    w = int(h[2:10], 16)
    rank = sk.RANK_MAX if w == 0 else sk.RANK_MAX - w.bit_length()
    return bucket, rank


def _py_registers(items) -> dict[int, int]:
    regs: dict[int, int] = {}
    for it in items:
        b, r = _py_parts(it)
        regs[b] = max(regs.get(b, 0), r)
    return regs


def _py_estimate(regs: dict[int, int]) -> tuple[int, int, int]:
    s = sum(1 << (sk.SCALE_POW - r) for r in regs.values())
    v_zero = sk.M - len(regs)
    s += v_zero * sk.EMPTY_TERM
    raw = sk.ALPHA_MILLI_NUM // s
    if raw <= sk.LC_THRESHOLD_MILLI and v_zero > 0:
        est = sk.LC_MILLI[v_zero - 1]
    else:
        est = raw
    return v_zero, s, est


class TestHllMath:
    def test_registers_match_python(self, spark):
        items = [f"url-{i * 37 % 911}" for i in range(3000)]
        df = spark.createDataFrame([(x,) for x in items], "item string")
        got = {
            r.bucket: r.r
            for r in sk.hll_registers(df, [], F.col("item")).collect()
        }
        assert got == _py_registers(items)

    def test_estimate_matches_python_and_is_within_rsd(self, spark):
        for n in (40, 500, 5000):  # LC regime, transition, raw regime
            items = list(range(n))
            df = spark.createDataFrame([(x,) for x in items], "item bigint")
            regs = sk.hll_registers(df, [], F.col("item"))
            row = sk.hll_estimate(regs, []).collect()[0]
            v, s, est = _py_estimate(_py_registers(items))
            assert (row.v_zero, row.s_scaled, row.est_milli) == (v, s, est), n
            # 40% ≈ 3 sigma at m=64
            assert abs(row.est_milli - n * 1000) <= n * 400, (n, row.est_milli)

    def test_merge_equals_direct(self, spark):
        # registers built per subshard then max-merged == built directly:
        # the union-cardinality / two-data-center property
        df = spark.range(0, 4000).select(
            (F.col("id") % 3).alias("shard"), (F.col("id") % 677).alias("item")
        )
        merged = sk.hll_merge(
            sk.hll_registers(df, ["shard"], F.col("item")).drop("shard"), []
        )
        direct = sk.hll_registers(df, [], F.col("item"))
        assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))

    def test_lc_table_is_the_definition(self):
        for v in (1, 13, 64):
            assert sk.LC_MILLI[v - 1] == round(sk.M * math.log(sk.M / v) * 1000)
        assert sk.ALPHA_MILLI_NUM == 709 * 64 * 64 * 2**33

    def test_register_state_is_bounded(self, spark):
        # at most m rows per key no matter the item count — the O(m) state claim
        df = spark.range(0, 50000).select(F.lit("k").alias("k"), F.col("id").alias("item"))
        assert sk.hll_registers(df, ["k"], F.col("item")).count() <= sk.M


class TestHyperBall:
    def _edges(self):
        ring = [(i, (i + 1) % 10) for i in range(10)]
        chain = [(20 + i, 21 + i) for i in range(4)] + [(24, 0)]
        hub = [(30, i) for i in range(5)]
        return ring + chain + hub

    def _py_harmonic(self, edges, max_t):
        nodes = sorted({u for e in edges for u in e})
        preds: dict[int, list[int]] = {v: [] for v in nodes}
        for u, v in edges:
            preds[v].append(u)
        out = {}
        for v in nodes:
            # exact inbound balls by reverse BFS, then the SAME sketch math
            ball = {v}
            prev_est = None
            harmonic = 0
            reach = None
            for t in range(0, max_t + 1):
                if t > 0:
                    ball = ball | {u for w in ball for u in preds[w]}
                _, _, est = _py_estimate(_py_registers(sorted(ball)))
                if t >= 1:
                    harmonic += max(est - prev_est, 0) * 1000 // t
                prev_est = est
                reach = est
            out[v] = (reach, harmonic)
        return out

    def test_matches_exact_ball_rederivation(self, spark):
        edges = self._edges()
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {r.node: (r.reach_milli, r.harmonic_micro) for r in sk.hyperball(df, max_t=6).collect()}
        assert got == self._py_harmonic(edges, 6)

    def test_hub_targets_rank_above_isolates(self, spark):
        # ring members are reachable from everywhere on the ring + feeders;
        # the hub node 30 has no in-edges — its harmonic must be minimal
        df = spark.createDataFrame(self._edges(), "src bigint, dst bigint")
        got = {r.node: r.harmonic_micro for r in sk.hyperball(df, max_t=6).collect()}
        assert got[30] == min(got.values())
        assert got[0] > got[30]
