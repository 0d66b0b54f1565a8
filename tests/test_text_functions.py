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
