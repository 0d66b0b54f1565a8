"""RFC 9309 robots matching (functions/robots) vs an independent Python
oracle built on re.escape — a different escaping/conversion code path than
the Spark regexp_replace chain, so conversion bugs can't self-confirm."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from amazonwebcrawler_spark.functions.robots import robots_match, url_path_query

RULES = [
    ("www.amazon.com", 0, "/s?"),
    ("www.amazon.com", 1, "/s?k=yoga*"),
    ("www.amazon.com", 0, "/gp/cart"),
    ("www.amazon.com", 0, "/promo$"),
    ("www.amazon.com", 1, "/promo"),
    ("www.amazon.com", 0, "/*/ref="),
    ("www.amazon.com", 1, "/dp/*/ref="),
    ("smile.amazon.co.uk", 0, "/media/*.jpg$"),
    ("smile.amazon.co.uk", 0, "/promo"),
    ("smile.amazon.co.uk", 1, "/promo$"),
    ("smile.amazon.co.uk", 1, ""),  # empty pattern: must be ignored
]


def rep_oracle(path: str, host: str):
    """Longest-match REP decision: (allowed, match_len, match_pattern)."""
    best = None
    for h, allow, pat in RULES:
        if h != host or not pat:
            continue
        anch = pat.endswith("$")
        body = pat[:-1] if anch else pat
        rx = "^" + re.escape(body).replace(r"\*", ".*") + ("$" if anch else "")
        if re.search(rx, path):
            key = (len(pat), allow, pat)
            if best is None or key > best:
                best = key
    if best is None:
        return (1, 0, "")
    return (best[1], best[0], best[2])


class TestRobotsRfc:
    def _run(self, spark, urls):
        u = spark.createDataFrame(urls, "id int, canonical_url string, host string")
        r = spark.createDataFrame(RULES, "host string, allow int, pattern string")
        return {
            row.id: (row.allowed, row.match_len, row.match_pattern, row.path)
            for row in robots_match(u, r).collect()
        }

    def test_vectors_match_python_oracle(self, spark):
        urls = [
            (1, "https://www.amazon.com/dp/B1/ref=sr_1_1", "www.amazon.com"),
            (2, "https://www.amazon.com/s?k=yoga+mat", "www.amazon.com"),
            (3, "https://www.amazon.com/s?k=socks", "www.amazon.com"),
            (4, "https://www.amazon.com/gp/cart/view", "www.amazon.com"),
            (5, "https://www.amazon.com/promo", "www.amazon.com"),
            (6, "https://www.amazon.com/promotion", "www.amazon.com"),
            (7, "https://shop.example.org/anything", "shop.example.org"),
            (8, "https://www.amazon.com/dp/B9", "www.amazon.com"),
            (9, "https://www.amazon.com", "www.amazon.com"),
            (10, "https://www.amazon.com/x/ref=abc", "www.amazon.com"),
            (11, "https://smile.amazon.co.uk/media/img7.jpg", "smile.amazon.co.uk"),
            (12, "https://smile.amazon.co.uk/media/img7.jpg?x=1", "smile.amazon.co.uk"),
            (13, "https://smile.amazon.co.uk/promo", "smile.amazon.co.uk"),
            (14, "https://smile.amazon.co.uk/promotion/deals", "smile.amazon.co.uk"),
        ]
        got = self._run(spark, urls)
        for i, url, host in urls:
            path = re.sub(r"^https?://[^/]*", "", url) or "/"
            assert got[i][:3] == rep_oracle(path, host), (i, path, got[i])
            assert got[i][3] == path

    def test_known_decisions(self, spark):
        got = self._run(
            spark,
            [
                (1, "https://www.amazon.com/s?k=socks", "www.amazon.com"),
                (2, "https://www.amazon.com/s?k=yoga+mat", "www.amazon.com"),
                (3, "https://www.amazon.com/promo", "www.amazon.com"),
                (4, "https://www.amazon.com/promotion", "www.amazon.com"),
                (5, "https://smile.amazon.co.uk/promo", "smile.amazon.co.uk"),
                (6, "https://smile.amazon.co.uk/media/a.jpg", "smile.amazon.co.uk"),
            ],
        )
        assert got[1][0] == 0  # /s? disallow
        assert got[2][0] == 1  # longer allow /s?k=yoga* overrides
        assert got[3][0] == 0  # anchored /promo$ (len 7) beats allow /promo (6)
        assert got[4][0] == 1  # /promo$ doesn't match /promotion; allow /promo does
        assert got[5][0] == 1  # allow /promo$ (7) beats disallow /promo (6)
        assert got[6][0] == 0  # /media/*.jpg$ anchored wildcard

    def test_generated_paths_match_oracle(self, spark):
        segs = ["dp", "s", "promo", "gp", "media", "x", "ref="]
        urls = []
        i = 0
        for a in segs:
            for b in segs:
                for host in ("www.amazon.com", "smile.amazon.co.uk", "none.example"):
                    i += 1
                    urls.append((i, f"https://{host}/{a}/{b}?q={i % 3}", host))
        got = self._run(spark, urls)
        for i, url, host in urls:
            path = re.sub(r"^https?://[^/]*", "", url)
            assert got[i][:3] == rep_oracle(path, host), (i, path, got[i])

    def test_path_of_bare_host_is_slash(self, spark):
        out = (
            spark.createDataFrame([("https://a.example",)], "u string")
            .select(url_path_query(F.col("u")).alias("p"))
            .collect()
        )
        assert out[0].p == "/"


class TestRobotsRandomized:
    """Seeded randomized rule/path matrix vs the re.escape oracle — one
    Spark job over ~500 (url, host) rows against 12 random rules."""

    def test_random_rules_and_paths(self, spark):
        import numpy as np

        rng = np.random.default_rng(4242)
        segs = ["dp", "s", "gp", "promo", "media", "ref=x", "a.b", "c[d]", "img"]
        rand_rules = []
        for i in range(12):
            host = f"h{int(rng.integers(0, 3))}.example"
            n = int(rng.integers(1, 4))
            pat = "".join(
                "/" + ("*" if rng.integers(0, 4) == 0 else segs[int(rng.integers(0, len(segs)))])
                for _ in range(n)
            )
            if rng.integers(0, 3) == 0:
                pat += "$"
            rand_rules.append((host, int(rng.integers(0, 2)), pat))
        urls, i = [], 0
        for a in segs:
            for b in segs:
                host = f"h{(len(a) + len(b)) % 4}.example"  # h3 has no rules
                i += 1
                urls.append((i, f"https://{host}/{a}/{b}", host))
        from amazonwebcrawler_spark.functions.robots import robots_match

        u = spark.createDataFrame(urls, "id int, canonical_url string, host string")
        r = spark.createDataFrame(rand_rules, "host string, allow int, pattern string")
        got = {
            row.id: (row.allowed, row.match_len, row.match_pattern)
            for row in robots_match(u, r).collect()
        }
        import re as _re

        def oracle(path, host):
            best = None
            for h, allow, pat in rand_rules:
                if h != host or not pat:
                    continue
                anch = pat.endswith("$")
                body = pat[:-1] if anch else pat
                rx = "^" + _re.escape(body).replace(r"\*", ".*") + ("$" if anch else "")
                if _re.search(rx, path):
                    key = (len(pat), allow, pat)
                    if best is None or key > best:
                        best = key
            return (1, 0, "") if best is None else (best[1], best[0], best[2])

        for i, url, host in urls:
            path = _re.sub(r"^https?://[^/]*", "", url)
            assert got[i] == oracle(path, host), (i, path, got[i], oracle(path, host))


class TestSitemapRefs:
    def test_extraction_rules(self, spark):
        from amazonwebcrawler_spark.functions.robots import sitemap_refs
        from pyspark.sql import functions as F

        txts = [
            # mixed case, comment after value, blank lines, mid-file
            "User-agent: *\nDisallow: /x\nSiteMap: https://a/s1.xml # main\n\n"
            "sitemap:https://a/s2.xml\nSITEMAP:\thttps://a/s3.xml",
            "User-agent: *\nDisallow: /",  # none
            "# sitemap: https://commented/ignored.xml is still matched",
        ]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(txts)], "i long, t string")
        rows = {r["i"]: r["refs"] for r in
                df.select("i", sitemap_refs(F.col("t")).alias("refs")).collect()}
        assert rows[0] == ["https://a/s1.xml", "https://a/s2.xml", "https://a/s3.xml"]
        assert rows[1] == []
        # RFC: directives may appear anywhere; a '#'-commented line is
        # still a match for a plain regex extractor — the politeness layer
        # treats robots as advisory listings, fetching a dead sitemap is
        # harmless. Documented, pinned here.
        assert rows[2] == ["https://commented/ignored.xml"]


class TestSitemapCoverage:
    def test_set_arithmetic(self, spark):
        from amazonwebcrawler_spark.operators.webgraph import sitemap_coverage

        declared = spark.createDataFrame(
            [("h1", "u1"), ("h1", "u2"), ("h1", "u2"), ("h1", "u3"), ("h2", "u9")],
            "host string, canonical_url string",
        )
        crawled = spark.createDataFrame(
            [("h1", "u2"), ("h1", "u2"), ("h1", "u3"), ("h1", "grey1"), ("h1", "grey2"),
             ("h3", "orphan")],
            "host string, canonical_url string",
        )
        rows = {r["host"]: r for r in sitemap_coverage(declared, crawled).collect()}
        h1 = rows["h1"]
        assert (h1["n_declared"], h1["n_crawled_declared"], h1["n_undeclared_crawled"]) == (3, 2, 2)
        assert h1["coverage_milli"] == 2 * 1000 // 3
        h2 = rows["h2"]
        assert (h2["n_declared"], h2["n_crawled_declared"], h2["coverage_milli"]) == (1, 0, 0)
        # hosts with zero declared URLs have no coverage denominator — out
        assert "h3" not in rows


class TestUrlSpamSignals:
    """functions/urls.url_spam_signals — each heuristic pinned on a
    hand-built URL per class, plus healthy pass-through."""

    def test_signals_and_thresholds(self, spark):
        from amazonwebcrawler_spark.functions.urls import url_spam_signals

        rows = [
            ("https://ok.example/dp/B17?page=2",),
            ("https://long.example/p?x=" + "a" * 600,),
            ("https://facet.example/s?a=1" + "&p=2" * 9,),  # 10 params
            ("https://deep.example" + "/d" * 13,),
            ("https://sess.ex/1234567890123456789",),  # digit-dense
            ("https://loop.example/a/b/a/b/a",),  # 'a' ×3
            ("https://enc.example/q?v=%2F%2Fx%2f",),  # 3 pct (case-insensitive class)
            ("https://bare.example",),  # no path, no query
        ]
        df = spark.createDataFrame(rows, "url string")
        out = {r["url"].split("//")[1].split("/")[0].split(".")[0]: r
               for r in url_spam_signals(df).collect()}
        ok = out["ok"]
        assert not ok["is_spam"] and ok["path_depth"] == 2 and ok["n_params"] == 1
        assert out["long"]["url_len"] > 512 and out["long"]["is_spam"]
        assert out["facet"]["n_params"] == 10 and out["facet"]["is_spam"]
        assert out["deep"]["path_depth"] == 13 and out["deep"]["is_spam"]
        d = out["sess"]
        assert d["digit_milli"] >= 400 and d["is_spam"]
        lp = out["loop"]
        assert lp["max_seg_repeat"] == 3 and lp["is_spam"]
        assert out["enc"]["n_pct_encoded"] == 3 and not out["enc"]["is_spam"]
        b = out["bare"]
        assert (b["path_depth"], b["n_params"], b["max_seg_repeat"]) == (0, 0, 0)
        assert not b["is_spam"]


class TestRobotsDelta:
    """functions/robots.robots_delta — transition classes on a
    hand-built frontier and rule snapshots."""

    def test_transitions(self, spark):
        from amazonwebcrawler_spark.functions.robots import robots_delta

        urls = spark.createDataFrame(
            [
                ("https://a.ex/keep/1", "a.ex"),
                ("https://a.ex/old/2", "a.ex"),     # blocked old → allowed new
                ("https://a.ex/new/3", "a.ex"),     # allowed old → blocked new
                ("https://a.ex/both/4", "a.ex"),    # blocked both
                ("https://b.ex/x", "b.ex"),          # no rules either side
            ],
            "canonical_url string, host string",
        )
        old = spark.createDataFrame(
            [("a.ex", 0, "/old/"), ("a.ex", 0, "/both/")],
            "host string, allow int, pattern string",
        )
        new = spark.createDataFrame(
            [("a.ex", 0, "/new/"), ("a.ex", 0, "/both/")],
            "host string, allow int, pattern string",
        )
        out = {r["host"]: r for r in robots_delta(urls, old, new).collect()}
        a = out["a.ex"]
        assert (a["n_urls"], a["n_blocked_old"], a["n_blocked_new"]) == (4, 2, 2)
        assert (a["n_newly_blocked"], a["n_newly_allowed"]) == (1, 1)
        assert a["policy_changed"]
        b = out["b.ex"]
        assert (b["n_blocked_old"], b["n_blocked_new"], b["policy_changed"]) == (0, 0, False)

    def test_precedence_preserved_on_both_sides(self, spark):
        from amazonwebcrawler_spark.functions.robots import robots_delta

        urls = spark.createDataFrame(
            [("https://a.ex/promo", "a.ex")], "canonical_url string, host string"
        )
        # old: anchored Disallow beats shorter Allow on /promo exactly;
        # new: drops the anchor rule → allowed
        old = spark.createDataFrame(
            [("a.ex", 0, "/promo$"), ("a.ex", 1, "/promo")],
            "host string, allow int, pattern string",
        )
        new = spark.createDataFrame(
            [("a.ex", 1, "/promo")], "host string, allow int, pattern string"
        )
        [r] = robots_delta(urls, old, new).collect()
        assert (r["n_blocked_old"], r["n_blocked_new"], r["n_newly_allowed"]) == (1, 0, 1)
