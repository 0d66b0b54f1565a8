"""Dedup + similarity operator tests over the driver testdata."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazonwebcrawler_spark.operators import dedup, similarity


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


class TestDedup:
    def test_exact_dedup_counts(self, spark, sf_dir):
        d = _docs(spark, sf_dir)
        out = dedup.exact_dedup(d, "text", "doc_id")
        total = d.count()
        assert out.agg(F.sum("dup_count")).collect()[0][0] == total
        assert out.count() <= total

    def test_exact_dedup_finds_planted_dup(self, spark):
        d = spark.createDataFrame(
            [(1, "a b c"), (2, "A  b   c "), (3, "different text")], "doc_id long, text string"
        )
        out = dedup.exact_dedup(d, "text", "doc_id").orderBy("doc_id").collect()
        assert [(r.doc_id, r.dup_count) for r in out] == [(1, 2), (3, 1)]

    def test_minhash_lsh_recall_vs_exact(self, spark):
        # planted near-dups: same base text with tiny perturbations
        base = " ".join(f"tok{i}" for i in range(40))
        rows = [(i, base) for i in range(5)]
        rows += [(10 + i, base.replace("tok3", f"x{i}")) for i in range(3)]
        rows += [(100 + i, " ".join(f"z{i}w{j}" for j in range(40))) for i in range(5)]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b)
            for r in dedup.minhash_lsh_pairs(d, "text", "doc_id", threshold=0.8).collect()
        }
        exact = {
            (r.id_a, r.id_b)
            for r in dedup.ngram_jaccard_pairs(
                d.withColumn("blk", F.lit(1)), "text", "doc_id", "blk", threshold=0.8
            ).collect()
        }
        # identical docs share every band → LSH must find all exact-dup pairs
        assert got and got <= exact
        identical = {(a, b) for a in range(5) for b in range(a + 1, 5)}
        assert identical <= got

    def test_simhash_identifies_identical_docs(self, spark):
        rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
                (3, "totally other words here")]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = {(r.id_a, r.id_b, r.hamming) for r in dedup.simhash_pairs(d, "text", "doc_id").collect()}
        assert (1, 2, 0) in pairs
        assert all(p[:2] != (1, 3) and p[:2] != (2, 3) for p in pairs)


class TestSimilarity:
    def test_brute_force_topk_shape(self, spark, sf_dir):
        e = _emb(spark, sf_dir)
        qs = e.filter(F.col("vec_id") < 3)
        out = similarity.brute_force_topk(e, qs, "vec_id", "embedding", k=5)
        rows = out.collect()
        assert len(rows) == 3 * 5
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        for q, rs in by_q.items():
            ranks = sorted(r.rank for r in rs)
            assert ranks == [1, 2, 3, 4, 5]
            sims = [r.cos_sim for r in sorted(rs, key=lambda r: r.rank)]
            assert sims == sorted(sims, reverse=True)
            assert all(r.neighbor_id != q for r in rs)

    def test_lsh_recall_floor(self, spark, sf_dir):
        e = _emb(spark, sf_dir)
        qs = e.filter(F.col("vec_id") < 10)
        exact = similarity.brute_force_topk(e, qs, "vec_id", "embedding", k=5)
        approx = similarity.lsh_topk(e, qs, "vec_id", "embedding", k=5, dim=64)
        ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
        ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
        recall = len(ex & ap) / len(ex)
        assert recall >= 0.5, f"LSH recall@5 too low: {recall:.2f}"

    def test_ivf_recall_floor(self, spark, sf_dir):
        e = _emb(spark, sf_dir)
        qs = e.filter(F.col("vec_id") < 10)
        exact = similarity.brute_force_topk(e, qs, "vec_id", "embedding", k=5)
        approx = similarity.ivf_topk(e, qs, "vec_id", "embedding", k=5, n_centroids=16, n_probe=6)
        ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
        ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
        recall = len(ex & ap) / len(ex)
        assert recall >= 0.5, f"IVF recall@5 too low: {recall:.2f}"

    def test_embedding_neardup_precision(self, spark):
        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 1
            (3, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
        ]
        e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        pairs = {(r.id_a, r.id_b) for r in
                 similarity.embedding_neardup_pairs(e, "vec_id", "embedding", threshold=0.95, dim=4).collect()}
        assert (1, 2) in pairs
        assert all(3 not in p for p in pairs)


class TestIVFAssignPaths:
    def test_literal_and_pandas_assignment_agree(self, spark, sf_dir):
        """The broadcast-matrix pandas assignment (n_centroids >> 1e3 scale
        path) must reproduce the literal-column-math path exactly."""
        e = _emb(spark, sf_dir)
        qs = e.filter(F.col("vec_id") < 5)
        lit = similarity.ivf_topk(e, qs, "vec_id", "embedding", k=10, n_centroids=16,
                                  n_probe=4, assign="literal")
        pan = similarity.ivf_topk(e, qs, "vec_id", "embedding", k=10, n_centroids=16,
                                  n_probe=4, assign="pandas")
        rows_lit = sorted((r.query_id, r.neighbor_id, r.rank, r.cos_sim) for r in lit.collect())
        rows_pan = sorted((r.query_id, r.neighbor_id, r.rank, r.cos_sim) for r in pan.collect())
        assert rows_lit == rows_pan
