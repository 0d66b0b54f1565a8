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
