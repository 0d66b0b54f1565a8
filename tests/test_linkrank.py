"""PageRank (operators/linkrank.py) and crawler-trap detection
(functions/urls.host_trap_stats) — exactness vs independent NumPy/pure-
Python oracles, plus the invariants the frontier scheduler relies on."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from amazonwebcrawler_spark.functions import urls
from amazonwebcrawler_spark.operators import linkrank


def _numpy_pagerank(edges, iters, damping=0.85):
    """Independent dense-matrix oracle with the same dangling-mass rule."""
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, d in set(edges):
        out.setdefault(s, []).append(d)
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        mass = sum(pr[idx[v]] for v in nodes if v not in out)
        nxt += damping * mass / n
        for s, dsts in out.items():
            w = pr[idx[s]] / len(dsts)
            for d in dsts:
                nxt[idx[d]] += damping * w
        pr = nxt
    return {v: pr[idx[v]] for v in nodes}


class TestPagerank:
    def test_matches_numpy_oracle(self, spark):
        # diamond + chain + dangling sink + a parallel edge (must collapse)
        edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 1), (1, 2), (4, 6)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.pr for r in linkrank.pagerank(df, iters=8).collect()}
        want = _numpy_pagerank(edges, iters=8)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12), v
        # dangling mass redistributed -> total rank conserved
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_hub_outranks_leaves(self, spark):
        # star: every leaf points at the hub; hub links back to all leaves,
        # so each leaf gets 1/8 of the hub's mass and the hub keeps the sum
        edges = [(i, 0) for i in range(1, 9)] + [(0, i) for i in range(1, 9)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.pr for r in linkrank.pagerank(df, iters=10).collect()}
        assert got[0] == max(got.values())
        assert got[0] > 3 * got[5]

    def test_oracle_sql_twin_matches(self, spark, duckdb_conn):
        """The unrolled-CTE DuckDB twin reproduces the Spark power
        iteration at micro-int precision on a graph with dangling nodes
        and multi-edges."""
        edges = [(k % 7, (3 * k + 1) % 9) for k in range(200)] + [(2, 3)] * 5
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.pr_micro
            for r in linkrank.pagerank(df, iters=5)
            .select("node", F.round(F.col("pr") * 1_000_000).cast("long").alias("pr_micro"))
            .collect()
        }
        duckdb_conn.execute(
            "CREATE OR REPLACE TABLE _e AS SELECT * FROM (VALUES "
            + ", ".join(f"({s}, {d})" for s, d in edges)
            + ") t(src, dst)"
        )
        sql = linkrank.pagerank_oracle_sql("SELECT src, dst FROM _e", iters=5)
        want = dict(duckdb_conn.execute(sql).fetchall())
        assert got == want


class TestHostTrapStats:
    def test_flags_traps_not_catalogs(self, spark):
        rows = []
        # calendar trap: ONE path, 60 query spellings
        for i in range(60):
            rows.append((f"https://cal.example/events?day={i}",))
        # session-key trap: every URL mints a fresh param KEY
        for i in range(40):
            rows.append((f"https://sess.example/p{i % 4}?sid{i}=x&page=1",))
        # deep-recursion trap
        rows.append(("https://deep.example/" + "/".join("d" * 1 for _ in range(12)),))
        # healthy catalog: distinct paths, few param keys
        for i in range(50):
            rows.append((f"https://shop.example/dp/B{i}?page={i % 3}",))
        df = spark.createDataFrame(rows, "canonical_url string")
        got = {r.host: r for r in urls.host_trap_stats(df).collect()}
        assert got["cal.example"].is_trap and got["cal.example"].url_path_ratio_micro == 60_000_000
        assert got["sess.example"].is_trap and got["sess.example"].key_entropy_micro > 2_500_000
        assert got["deep.example"].is_trap and got["deep.example"].max_depth == 12
        assert not got["shop.example"].is_trap

    def test_entropy_matches_python(self, spark):
        import math

        rows = [(f"https://h.example/p?a=1&b={i % 3}&k{i % 5}=z",) for i in range(30)]
        df = spark.createDataFrame(rows, "canonical_url string")
        row = urls.host_trap_stats(df).collect()[0]
        # keys: a ×30, b ×30, k0..k4 ×6 each → entropy over 8 keys, 90 instances
        counts = [30, 30] + [6] * 5
        tot = sum(counts)
        want = -sum(c / tot * math.log(c / tot) for c in counts)
        assert row.key_entropy_micro == round(want * 1_000_000)
        assert row.avg_params_micro == 3_000_000

    def test_no_params_zero_entropy(self, spark):
        df = spark.createDataFrame(
            [("https://plain.example/a",), ("https://plain.example/b",)],
            "canonical_url string",
        )
        row = urls.host_trap_stats(df).collect()[0]
        assert row.key_entropy_micro == 0 and not row.is_trap


def _py_personalized_pagerank(edges, seeds, iters, damping=0.85):
    """Pure-Python mirror: teleport restricted to the seed set, dangling
    mass re-entering through the same vector."""
    e = set(edges)
    nodes = sorted({u for ed in e for u in ed})
    out: dict = {}
    for s, d in e:
        out.setdefault(s, []).append(d)
    live = [s for s in seeds if s in nodes]
    tele = {n: (1.0 / len(live) if n in live else 0.0) for n in nodes}
    pr = dict(tele)
    for _ in range(iters):
        mass = sum(pr[n] for n in nodes if n not in out)
        contrib = {n: 0.0 for n in nodes}
        for s, dsts in out.items():
            w = pr[s] / len(dsts)
            for d in dsts:
                contrib[d] += damping * w
        pr = {
            n: (1.0 - damping) * tele[n] + contrib[n] + damping * mass * tele[n]
            for n in nodes
        }
    return pr


class TestPersonalizedPagerank:
    def _run(self, spark, edges, seeds, iters=5):
        df = spark.createDataFrame(edges, "src long, dst long")
        sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
        return {
            r.node: r.pr
            for r in linkrank.personalized_pagerank(df, sdf, iters=iters).collect()
        }

    def test_matches_python_mirror_and_conserves_mass(self, spark):
        # diamond + chain + dangling sink + parallel edge (must collapse);
        # seed 1 only — scores are proximity-to-1, total mass stays 1
        edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6), (1, 2)]
        got = self._run(spark, edges, [1])
        want = _py_personalized_pagerank(edges, [1], iters=5)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12), v
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_unreachable_component_scores_zero(self, spark):
        """A link farm disconnected from the trusted seeds holds exactly
        zero rank — the TrustRank spam-demotion property raw PageRank
        lacks."""
        trusted = [(0, 1), (1, 2), (2, 0)]
        farm = [(10, 11), (11, 12), (12, 10), (11, 10), (12, 11), (10, 12)]
        got = self._run(spark, trusted + farm, [0])
        assert all(got[n] == 0.0 for n in (10, 11, 12))
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
        assert got[0] > 0 and got[1] > 0 and got[2] > 0

    def test_seeds_outside_graph_ignored_empty_raises(self, spark):
        edges = [(1, 2), (2, 1)]
        got = self._run(spark, edges, [1, 999])
        want = _py_personalized_pagerank(edges, [1], iters=5)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12)
        with pytest.raises(ValueError, match="no seed"):
            self._run(spark, edges, [999])


def _py_opic(edges, iters, init_cash=1_000_000):
    """Pure-Python integer mirror of opic_priority — exact, not approx."""
    e = sorted(set(edges))
    nodes = sorted({u for p in e for u in p})
    n = len(nodes)
    out = {}
    for s, d in e:
        out.setdefault(s, []).append(d)
    cash = {u: init_cash for u in nodes}
    hist = {u: 0 for u in nodes}
    carry = 0
    for _ in range(iters):
        recv = {u: 0 for u in nodes}
        R = carry
        for u in nodes:
            dsts = out.get(u, ())
            if not dsts:
                R += cash[u]
            else:
                q, r = divmod(cash[u], len(dsts))
                for v in dsts:
                    recv[v] += q
                R += r
        for u in nodes:
            hist[u] += cash[u]
            cash[u] = recv[u] + R // n
        carry = R % n
    total = sum(hist[u] + cash[u] for u in nodes)
    return (
        {u: (cash[u], hist[u], (hist[u] + cash[u]) * 1_000_000 // total) for u in nodes},
        carry,
    )


class TestOpicPriority:
    EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 1), (3, 2), (4, 4), (5, 0), (2, 6), (0, 1)]

    def _run(self, spark, edges, iters=5):
        df = spark.createDataFrame(edges, "src long, dst long")
        return {
            r.node: (r.cash, r.hist, r.imp_ppm)
            for r in linkrank.opic_priority(df, iters=iters).collect()
        }

    def test_matches_python_mirror_exactly(self, spark):
        """Integer cash rounds are EXACT (==, never approx) against the
        pure-Python mirror — dangling node 6 and the self-loop at 4
        exercise the root path and remainder carries."""
        got = self._run(spark, self.EDGES)
        want, _ = _py_opic(self.EDGES, iters=5)
        assert got == want

    def test_cash_conservation_every_round(self, spark):
        """sum(cash) + root carry == n * init_cash exactly after every
        round — the OPIC invariant, testable only because the arithmetic
        is integral."""
        for iters in (1, 2, 3):
            got = self._run(spark, self.EDGES, iters=iters)
            want, carry = _py_opic(self.EDGES, iters=iters)
            assert got == want
            n = len(want)
            assert sum(c for c, _, _ in got.values()) + carry == n * 1_000_000

    def test_hub_target_outranks_periphery(self, spark):
        """Everything points at 0; nothing points at the leaf sources —
        0 accumulates the history."""
        edges = [(i, 0) for i in range(1, 8)] + [(0, 1)]
        got = self._run(spark, edges)
        imp = {u: p for u, (_, _, p) in got.items()}
        assert imp[0] == max(imp.values())
        assert imp[0] > imp[2]

    def test_repartition_invariant(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        a = {
            r.node: (r.cash, r.hist, r.imp_ppm)
            for r in linkrank.opic_priority(df.repartition(7), iters=4).collect()
        }
        b = {
            r.node: (r.cash, r.hist, r.imp_ppm)
            for r in linkrank.opic_priority(df.coalesce(1), iters=4).collect()
        }
        assert a == b

    def test_oracle_sql_twin_matches_exactly(self, spark, duckdb_conn):
        vals = ", ".join(f"({s},{d})" for s, d in self.EDGES)
        sql = linkrank.opic_oracle_sql(
            f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", iters=5
        )
        got = {r[0]: (r[1], r[2], r[3]) for r in duckdb_conn.execute(sql).fetchall()}
        assert got == self._run(spark, self.EDGES)
