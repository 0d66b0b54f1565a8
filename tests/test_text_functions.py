"""TF-IDF keyword extraction over planted corpora."""

from __future__ import annotations


class TestTfidf:
    def test_planted_corpus(self, spark):
        """A term unique to one doc outranks ubiquitous terms (whose idf is
        ln(1)=0); ranks are dense per doc and capped at k."""
        import math

        from amazonwebcrawler_spark.functions.text import tfidf_top_terms

        docs = [
            (1, "common common zebra"),
            (2, "common words here"),
            (3, "common words again"),
        ]
        d = spark.createDataFrame(docs, "doc_id long, text string")
        out = tfidf_top_terms(d, "text", "doc_id", k=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        top1 = {d_: sorted(rs, key=lambda r: r.rank)[0] for d_, rs in by_doc.items()}
        assert top1[1].term == "zebra"
        assert abs(top1[1].score - round(1 * math.log(3 / 1), 6)) < 1e-9
        # 'common' is in every doc → idf 0 → score 0 everywhere
        assert all(r.score == 0.0 for r in out if r.term == "common")
        assert all(len(rs) <= 2 for rs in by_doc.values())


class TestUnigramNll:
    def test_rare_tokens_score_higher(self, spark):
        """A doc of corpus-common tokens has strictly lower NLL than a doc
        of corpus-unique tokens; values match the closed form."""
        import math

        from amazonwebcrawler_spark.functions.text import unigram_nll

        docs = [
            (1, "the the the the"),
            (2, "the the the the"),
            (3, "xylophone quagmire"),
        ]
        d = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: r for r in unigram_nll(d, "text", "doc_id").collect()}
        total = 10  # 8 'the' + 2 unique
        assert got[1].n_tokens == 4
        assert abs(got[1].nll - round(-math.log(8 / total), 6)) < 1e-9
        assert abs(got[3].nll - round(-math.log(1 / total), 6)) < 1e-9
        assert got[3].nll > got[1].nll


class TestChunking:
    def test_window_arithmetic(self, spark):
        """Exact window coverage: a 150-token doc at (64, 8) yields chunks
        starting every 56 tokens, full chunks except the tail, consecutive
        chunks share exactly 8 tokens, and a short doc is one partial
        chunk."""
        import hashlib

        from amazonwebcrawler_spark.functions.text import chunk_documents

        toks = [f"t{i}" for i in range(150)]
        d = spark.createDataFrame(
            [(1, " ".join(toks)), (2, "a b c")], "doc_id long, text string"
        )
        got = {
            (r.doc_id, r.chunk_idx): r
            for r in chunk_documents(d, "text", "doc_id", 64, 8).collect()
        }
        assert {k for k in got} == {(1, 0), (1, 1), (1, 2), (2, 0)}
        for idx in range(3):
            window = toks[idx * 56: idx * 56 + 64]
            r = got[(1, idx)]
            assert r.n_tokens == len(window)
            assert r.chunk_md5 == hashlib.md5(" ".join(window).encode()).hexdigest()
        assert got[(1, 2)].n_tokens == 150 - 2 * 56  # tail chunk is partial
        assert got[(2, 0)].n_tokens == 3

    def test_rejects_bad_overlap(self, spark):
        import pytest

        from amazonwebcrawler_spark.functions.text import chunk_documents

        d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(d, "text", "doc_id", max_tokens=8, overlap=8)
