"""Web-graph operators (operators/webgraph.py) and the URL/web functions
added beside them (surt_key, registered_domain, extract_anchor_pairs,
rel_canonical_href, corpus.host_template_stats) — exactness vs independent
pure-Python oracles plus the structural invariants the frontier relies on."""

import math

import pytest
from pyspark.sql import functions as F

from amazonwebcrawler_spark.functions import urls
from amazonwebcrawler_spark.operators import webgraph
from amazonwebcrawler_spark.operators.corpus import host_template_stats


def _py_resolve(edges: dict, node: str):
    hops = 0
    while node in edges:
        node = edges[node]
        hops += 1
    return node, hops


class TestResolveRedirects:
    def test_matches_python_walk(self, spark):
        # chains with gaps, a fork-free tree, and terminal nodes
        edges = {f"u{k}": f"u{k - 1}" for k in range(1, 40) if k % 7 != 0}
        edges["x1"] = "x2"
        edges["x2"] = "x3"  # 2-hop chain into a terminal
        df = spark.createDataFrame(list(edges.items()), "src string, dst string")
        got = {r.src: (r.final_url, r.hops) for r in webgraph.resolve_redirects(df, max_hops=64).collect()}
        assert set(got) == set(edges)
        for s in edges:
            final, hops = _py_resolve(edges, s)
            assert got[s] == (final, hops), s

    def test_long_chain_needs_log_rounds(self, spark):
        # a 30-hop chain resolves fully with max_hops=32 (5 doubling rounds)
        edges = [(f"n{i}", f"n{i + 1}") for i in range(30)]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.src: (r.final_url, r.hops) for r in webgraph.resolve_redirects(df, max_hops=32).collect()}
        assert got["n0"] == ("n30", 30)


def _py_hits(edges, iters):
    nodes = sorted({u for e in set(edges) for u in e})
    out, into = {}, {}
    for s, d in set(edges):
        out.setdefault(s, set()).add(d)
        into.setdefault(d, set()).add(s)
    hub = {v: 1.0 / len(nodes) for v in nodes}
    auth = dict(hub)
    for _ in range(iters):
        auth = {v: sum(hub[u] for u in into.get(v, ())) for v in nodes}
        s = sum(auth.values())
        auth = {v: a / s for v, a in auth.items()}
        hub = {v: sum(auth[u] for u in out.get(v, ())) for v in nodes}
        s = sum(hub.values())
        hub = {v: h / s for v, h in hub.items()}
    return hub, auth


class TestHits:
    def test_matches_python_oracle(self, spark):
        edges = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5), (5, 1), (1, 2)]
        df = spark.createDataFrame(edges, "src long, dst long")
        rows = webgraph.hits(df, iters=6).collect()
        hub, auth = _py_hits(edges, iters=6)
        got_h = {r.node: r.hub for r in rows}
        got_a = {r.node: r.auth for r in rows}
        assert set(got_h) == set(hub)
        for v in hub:
            assert got_h[v] == pytest.approx(hub[v], abs=1e-12), ("hub", v)
            assert got_a[v] == pytest.approx(auth[v], abs=1e-12), ("auth", v)
        # L1 normalization holds on both score vectors
        assert sum(got_h.values()) == pytest.approx(1.0, abs=1e-9)
        assert sum(got_a.values()) == pytest.approx(1.0, abs=1e-9)

    def test_hub_vs_authority_roles(self, spark):
        # directory page 0 links to every leaf AND the sink, so its hub
        # strictly dominates the leaves' (which only link to the sink)
        edges = (
            [(0, i) for i in range(1, 6)] + [(0, 99)] + [(i, 99) for i in range(1, 6)]
        )
        df = spark.createDataFrame(edges, "src long, dst long")
        rows = {r.node: r for r in webgraph.hits(df, iters=8).collect()}
        assert rows[0].hub == max(r.hub for r in rows.values())
        assert rows[99].auth == max(r.auth for r in rows.values())


def _py_bfs(edges, seeds, max_depth):
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
    depth = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, max_depth + 1):
        nxt = {v for u in frontier for v in adj.get(u, ())} - set(depth)
        if not nxt:
            break
        depth.update({v: d for v in nxt})
        frontier = nxt
    return depth


class TestBfsDepths:
    def test_matches_python_bfs(self, spark):
        edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (0, 10), (10, 3), (7, 8)]
        seeds = [0]
        e = spark.createDataFrame(edges, "src long, dst long")
        s = spark.createDataFrame([(x,) for x in seeds], "node long")
        got = {r.node: r.depth for r in webgraph.bfs_depths(e, s, max_depth=4).collect()}
        assert got == _py_bfs(edges, seeds, 4)
        # min-depth retention: node 3 is depth 2 via 0->10->3, not 3 via chain
        assert got[3] == 2
        # ... which pulls 5 in at depth 4 via the shortcut
        assert got[5] == 4
        # budget respected: node 6 is depth 5, outside max_depth=4
        assert 6 not in got
        # disconnected component never appears
        assert 7 not in got and 8 not in got


class TestSurtKey:
    @pytest.mark.parametrize(
        "url,want",
        [
            ("https://www.amazon.com/dp/B1?page=2", "com,amazon)/dp/B1?page=2"),
            ("https://smile.amazon.co.uk/s?k=x", "uk,co,amazon,smile)/s?k=x"),
            ("https://example.org", "org,example)"),
        ],
    )
    def test_vectors(self, spark, url, want):
        got = (
            spark.createDataFrame([(url,)], "u string")
            .select(urls.surt_key(F.col("u")).alias("s"))
            .collect()[0][0]
        )
        assert got == want

    def test_domain_urls_sort_contiguously(self, spark):
        raw = [
            "https://a.shop.example/1",
            "https://zzz.other/x",
            "https://b.shop.example/2",
            "https://shop.example/root",
        ]
        df = spark.createDataFrame([(u,) for u in raw], "u string")
        surts = [r[0] for r in df.select(urls.surt_key(F.col("u")).alias("s")).collect()]
        ordered = sorted(surts)
        ex_positions = [i for i, s in enumerate(ordered) if s.startswith("example,shop")]
        assert ex_positions == list(range(ex_positions[0], ex_positions[0] + 3))


class TestRegisteredDomain:
    def test_vectors(self, spark):
        hosts = [
            "www.example.co.uk",
            "a.b.shop5.github.io",
            "example.com",
            "weird.zz",
            "co.uk",  # bare suffix -> NULL etld1
        ]
        sfx = spark.createDataFrame(
            [(s,) for s in ("com", "co.uk", "uk", "io", "github.io")], "suffix string"
        )
        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        got = {r.host: (r.public_suffix, r.etld1) for r in urls.registered_domain(df, sfx).collect()}
        assert got["www.example.co.uk"] == ("co.uk", "example.co.uk")
        assert got["a.b.shop5.github.io"] == ("github.io", "shop5.github.io")
        assert got["example.com"] == ("com", "example.com")
        assert got["weird.zz"] == (None, None)
        assert got["co.uk"] == ("co.uk", None)


class TestAnchorsAndCanonical:
    def test_anchor_pairs_vector(self, spark):
        html = (
            '<p><a href="/dp/B1?qid=3">buy now</a>'
            '<a href="HTTPS://WWW.Amazon.com/s?k=mat">mats</a>'
            '<a href="mailto:x@y.z">mail</a></p>'
        )
        df = spark.createDataFrame([(html,)], "html string")
        rows = (
            df.select(
                F.explode(
                    urls.extract_anchor_pairs(F.col("html"), F.lit("https://www.amazon.com"))
                ).alias("p")
            )
            .select("p.url", "p.anchor")
            .collect()
        )
        assert [(r.url, r.anchor) for r in rows] == [
            ("https://www.amazon.com/dp/B1", "buy now"),
            ("https://www.amazon.com/s?k=mat", "mats"),
        ]

    def test_rel_canonical_vector(self, spark):
        html = '<head><link rel="canonical" href="https://e.x/a"></head>'
        df = spark.createDataFrame([(html,), ("<head></head>",)], "html string")
        got = [r[0] for r in df.select(urls.rel_canonical_href(F.col("html"))).collect()]
        assert got == ["https://e.x/a", ""]


class TestHostTemplateStats:
    def test_hand_counted_fixture(self, spark):
        # host A: 3 docs sharing the 4-token boilerplate "nav home about us"
        # (2 template shingles at threshold ceil(0.5*3)=2); host B: 1 doc
        docs = [
            (1, "A", "nav home about us alpha beta gamma"),
            (2, "A", "nav home about us delta epsilon zeta"),
            (3, "A", "totally unique prose here today friends"),
            (4, "B", "one single document no repeats at all"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, host string, text string")
        got = {
            r.host: r
            for r in host_template_stats(df, "host", "doc_id", "text", n=3).collect()
        }
        a = got["A"]
        assert a.n_docs == 3
        # "nav home about" and "home about us" appear in 2 of 3 docs (>= 2)
        assert a.n_template == 2
        # doc1/doc2: 5 shingles each (2 shared) -> 8 distinct; doc3: 4 more
        assert a.n_shingles == 12
        assert a.template_ratio_micro == (2 * 1_000_000) // 12
        b = got["B"]
        # threshold ceil(0.5*1)=1: every shingle of a 1-doc host is template
        assert b.n_template == b.n_shingles
        assert b.template_ratio_micro == 1_000_000

    def test_min_frac_boundary_is_exact_ceil(self, spark):
        # 4 docs, min_frac=0.5 -> threshold exactly 2: a shingle in 2 docs
        # IS template, in 1 doc is not
        docs = [
            (1, "H", "x y z a b"),
            (2, "H", "x y z c d"),
            (3, "H", "p q r s t"),
            (4, "H", "u v w m n"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, host string, text string")
        r = host_template_stats(df, "host", "doc_id", "text", n=3).collect()[0]
        assert r.n_template == 1  # only "x y z" reaches df=2


def _py_param_policy(rows, min_tested=2):
    """Independent pure-Python mirror of urls.param_policy: parse with
    stdlib string ops (no shared code), group, decide."""
    import re
    from collections import defaultdict

    groups = defaultdict(lambda: (set(), set(), 0))  # (vals, digests, n_obs)
    for url, digest in rows:
        u = url.split("#", 1)[0]
        base, _, query = u.partition("?")
        host = base.split("://", 1)[1].split("/", 1)[0].lower()
        # lowercase scheme://host, keep path case
        m = re.match(r"^(https?://[^/]*)(.*)$", base)
        sh, path = m.group(1).lower(), m.group(2)
        params = [p for p in query.split("&") if p]
        for k in {p.split("=", 1)[0] for p in params}:
            mine = sorted(p for p in params if p.split("=", 1)[0] == k)
            other = sorted(p for p in params if p.split("=", 1)[0] != k)
            gk = (host, k, sh + path + "?" + "&".join(other))
            vals, digs, n = groups[gk]
            vals.add("&".join(mine))
            digs.add(digest)
            groups[gk] = (vals, digs, n + 1)
    per = defaultdict(lambda: [0, 0, 0, 0])  # n_groups, n_tested, n_irr, support
    for (host, k, _), (vals, digs, n) in groups.items():
        s = per[(host, k)]
        s[0] += 1
        if len(vals) >= 2:
            s[1] += 1
            s[3] += n
            if len(digs) == 1:
                s[2] += 1
    out = {}
    for hk, (g, t, i, sup) in per.items():
        dec = "insufficient" if t < min_tested else ("strip" if i == t else "keep")
        out[hk] = (g, t, i, sup, dec)
    return out


class TestParamPolicy:
    def _collect(self, spark, rows, min_tested=2):
        df = spark.createDataFrame(rows, "url string, digest string")
        return {
            (r.host, r.param): (r.n_groups, r.n_tested, r.n_irrelevant, r.support, r.decision)
            for r in urls.param_policy(df, min_tested=min_tested).collect()
        }

    def test_hand_vector_decisions(self, spark):
        rows = [
            ("https://www.amazon.com/dp/B1?page=1&sessionid=111", "d1"),
            ("https://www.amazon.com/dp/B1?page=1&sessionid=222", "d1"),
            ("https://www.amazon.com/dp/B1?sessionid=333&page=2", "d2"),
            ("https://www.amazon.com/dp/B1?page=2&sessionid=444", "d2"),
            ("https://www.amazon.com/dp/B2?page=1&sessionid=555", "d3"),
            ("https://www.amazon.com/dp/B2?page=2&sessionid=555", "d4"),
            ("https://www.amazon.com/dp/B3?ie=UTF8&page=1", "d5"),
            ("https://www.amazon.com/dp/B3?ie=UTF8&page=2", "d6"),
            ("https://www.amazon.com/dp/B5", "zz"),  # param-free: ignored
        ]
        got = self._collect(spark, rows, min_tested=1)
        assert got[("www.amazon.com", "sessionid")][4] == "strip"
        assert got[("www.amazon.com", "page")][4] == "keep"
        assert got[("www.amazon.com", "ie")][4] == "insufficient"
        assert got == _py_param_policy(rows, min_tested=1)

    def test_param_order_and_fragment_invariance(self, spark):
        a = [
            ("https://H.example.com/p?a=1&b=2&s=9#frag", "d1"),
            ("https://h.example.com/p?s=8&b=2&a=1", "d1"),
        ]
        b = [  # same observations, params and fragment respelled
            ("https://h.example.COM/p?s=9&a=1&b=2", "d1"),
            ("https://h.example.com/p?a=1&s=8&b=2#x", "d1"),
        ]
        assert self._collect(spark, a, 1) == self._collect(spark, b, 1)
        assert self._collect(spark, a, 1)[("h.example.com", "s")][4] == "strip"

    def test_duplicate_keys_group_as_one_value(self, spark):
        # k appears twice; both spellings carry the same multiset -> one val
        rows = [
            ("https://x.com/p?k=1&k=2&q=0", "d1"),
            ("https://x.com/p?k=2&k=1&q=0", "d1"),
            ("https://x.com/p?k=3&k=4&q=0", "d1"),
        ]
        got = self._collect(spark, rows, 1)
        # two distinct sorted k-multisets against one residual, digest fixed
        assert got[("x.com", "k")] == (1, 1, 1, 3, "strip")

    def test_min_tested_gate(self, spark):
        rows = [
            ("https://x.com/p?k=1", "d1"),
            ("https://x.com/p?k=2", "d1"),
        ]
        assert self._collect(spark, rows, 1)[("x.com", "k")][4] == "strip"
        assert self._collect(spark, rows, 2)[("x.com", "k")][4] == "insufficient"

    def test_randomized_batch_matches_python_mirror(self, spark):
        import hashlib

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        rows = []
        for i in range(600):
            host = f"h{h(f'host{i}') % 3}.example.com"
            path = f"/d/{h(f'path{i}') % 5}"
            page = h(f"pg{i}") % 3
            sess = h(f"ss{i}") % 11
            # content depends on (host, path, page) only
            digest = f"dg-{host}-{path}-{page}"
            url = f"https://{host.upper()}{path}?sid={sess}&page={page}"
            if i % 4 == 0:  # some spellings reorder / add a constant param
                url = f"https://{host}{path}?page={page}&const=1&sid={sess}"
            rows.append((url, digest))
        assert self._collect(spark, rows) == _py_param_policy(rows)


class TestApplyParamPolicy:
    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "url string, digest string")

    def test_learned_canonical_collapses_to_content_groups(self, spark):
        # planted world: digest = f(host, path, page); sid is noise
        rows = []
        for i in range(120):
            host, path, page, sid = f"h{i % 2}.com", f"/p{i % 3}", i % 2, i % 7
            rows.append(
                (f"https://{host}{path}?sid={sid}&page={page}", f"d-{host}{path}-{page}")
            )
        df = self._mk(spark, rows)
        pol = urls.param_policy(df, min_tested=1)
        out = urls.apply_param_policy(df, pol)
        # every proven-irrelevant spelling collapsed: one learned URL per
        # distinct content digest, and the pairing is 1:1
        pairs = out.select("learned_url", "digest").distinct().collect()
        assert len(pairs) == len({r.digest for r in pairs}) == len({r.learned_url for r in pairs})

    def test_conservative_without_policy_row(self, spark):
        # unknown host: nothing stripped, but spelling still normalizes
        # (fragment dropped, host lowercased, params sorted)
        df = self._mk(spark, [("https://X.com/a?z=1&a=2#frag", "d")])
        pol = urls.param_policy(self._mk(spark, []), min_tested=1)
        got = urls.apply_param_policy(df, pol).collect()[0]
        assert got.learned_url == "https://x.com/a?a=2&z=1"

    def test_keep_and_insufficient_survive(self, spark):
        rows = [
            ("https://h.com/p?page=1&sid=1&once=0", "d1"),
            ("https://h.com/p?page=1&sid=2&once=0", "d1"),
            ("https://h.com/p?page=2&sid=3&once=0", "d2"),
            ("https://h.com/p?page=2&sid=4&once=0", "d2"),
        ]
        df = self._mk(spark, rows)
        pol = urls.param_policy(df, min_tested=1)
        got = {r.url: r.learned_url for r in urls.apply_param_policy(df, pol).collect()}
        # sid stripped everywhere; page (keep) and once (insufficient) stay
        assert got["https://h.com/p?page=1&sid=1&once=0"] == "https://h.com/p?once=0&page=1"
        assert got["https://h.com/p?page=2&sid=4&once=0"] == "https://h.com/p?once=0&page=2"


class TestTriangleStats:
    def _run(self, spark, edges):
        from amazonwebcrawler_spark.operators.webgraph import triangle_stats

        e = spark.createDataFrame(edges, "src long, dst long")
        return {
            r.node: (r.degree, r.n_triangles, r.clustering_micro)
            for r in triangle_stats(e).collect()
        }

    def test_complete_graph_k5(self, spark):
        """K5: every node has degree 4, C(4,2)=6 triangles, clustering 1."""
        edges = [(a, b) for a in range(5) for b in range(5) if a != b]
        assert self._run(spark, edges) == {i: (4, 6, 1_000_000) for i in range(5)}

    def test_triangle_free_graphs(self, spark):
        """A star and a path close no triangles; clustering is 0 everywhere
        (including the degree-1 leaves, where it is 0 by convention)."""
        star = [(0, i) for i in range(1, 6)]
        got = self._run(spark, star)
        assert got[0] == (5, 0, 0)
        assert all(got[i] == (1, 0, 0) for i in range(1, 6))
        path = [(i, i + 1) for i in range(6)]
        assert all(t == 0 and c == 0 for _, t, c in self._run(spark, path).values())

    def test_direction_multiplicity_selfloops_collapse(self, spark):
        """Parallel edges, reversed duplicates and self-loops don't change
        the undirected simple graph: one triangle, counted once per node."""
        edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (3, 3)]
        assert self._run(spark, edges) == {
            1: (2, 1, 1_000_000),
            2: (2, 1, 1_000_000),
            3: (2, 1, 1_000_000),
        }

    def test_random_graph_vs_python_mirror(self, spark):
        """Seeded G(30, 0.25): per-node counts equal an exhaustive
        adjacency-set mirror, and Σ node counts = 3 × total triangles."""
        import itertools
        import random

        rng = random.Random(11)
        edges = [(a, b) for a, b in itertools.combinations(range(30), 2)
                 if rng.random() < 0.25]
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {}
        for n, nb in adj.items():
            t = sum(1 for a, b in itertools.combinations(sorted(nb), 2) if b in adj[a])
            deg = len(nb)
            cc = (2 * t * 1_000_000) // (deg * (deg - 1)) if deg >= 2 else 0
            want[n] = (deg, t, cc)
        got = self._run(spark, edges)
        assert got == want
        assert sum(t for _, t, _ in got.values()) % 3 == 0


class TestLabelPropagation:
    def _run(self, spark, edges, iters=4):
        from amazonwebcrawler_spark.operators.webgraph import label_propagation

        e = spark.createDataFrame(edges, "src long, dst long")
        return {r.node: r.community for r in label_propagation(e, iters=iters).collect()}

    @staticmethod
    def _py(edges, iters):
        """Pure-Python mirror of the synchronous plurality sweep with the
        same smallest-label tie-break."""
        und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        adj: dict = {}
        for u, v in und:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        labels = {n: n for n in adj}
        for _ in range(iters):
            labels = {
                n: min(
                    (l for l in {labels[m] for m in nbrs}),
                    key=lambda l: (-sum(labels[m] == l for m in nbrs), l),
                )
                for n, nbrs in adj.items()
            }
        return labels

    def test_two_cliques_one_bridge(self, spark):
        """Two K4s joined by a single bridge keep two communities — the
        bridge endpoints stay with their own clique's plurality."""
        import itertools

        k_a = list(itertools.combinations(range(4), 2))
        k_b = list(itertools.combinations(range(100, 104), 2))
        got = self._run(spark, k_a + k_b + [(0, 100)])
        assert {got[i] for i in range(4)} == {0}
        assert {got[i] for i in range(100, 104)} == {100}

    def test_direction_multiplicity_selfloops_collapse(self, spark):
        """Reversed/parallel edges and self-loops don't perturb the vote:
        the undirected simple graph is what propagates."""
        edges = [(1, 2), (2, 1), (1, 2), (2, 3), (1, 1)]
        assert self._run(spark, edges) == self._py(edges, 4)

    def test_random_graph_matches_python_mirror(self, spark):
        """Seeded G(40, 0.12): every node's label equals the synchronous
        Python sweep after 4 rounds (tie-break included)."""
        import itertools
        import random

        rng = random.Random(7)
        edges = [
            (a, b) for a, b in itertools.combinations(range(40), 2) if rng.random() < 0.12
        ]
        assert self._run(spark, edges) == self._py(edges, 4)


class TestKcore:
    def _run(self, spark, edges, k, iters=8):
        from amazonwebcrawler_spark.operators.webgraph import kcore

        e = spark.createDataFrame(edges, "src long, dst long")
        return {r.node: r.core_degree for r in kcore(e, k=k, iters=iters).collect()}

    @staticmethod
    def _py(edges, k):
        """Fixpoint peel mirror — the k-core is unique, so any peel order
        (including the operator's synchronous rounds) lands here."""
        und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        adj: dict = {}
        for u, v in und:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        alive = set(adj)
        while True:
            drop = {n for n in alive if sum(m in alive for m in adj[n]) < k}
            if not drop:
                break
            alive -= drop
        return {n: sum(m in alive for m in adj[n]) for n in alive}

    def test_clique_survives_tail_peels(self, spark):
        """K5 + a pendant chain: the 3-core is exactly the clique (the
        chain peels inward one layer per round)."""
        import itertools

        k5 = list(itertools.combinations(range(5), 2))
        tail = [(4, 10), (10, 11), (11, 12)]
        assert self._run(spark, k5 + tail, k=3) == {i: 4 for i in range(5)}

    def test_path_empty_cycle_survives(self, spark):
        """A path has no 2-core; a cycle IS its own 2-core."""
        path = [(i, i + 1) for i in range(6)]
        assert self._run(spark, path, k=2) == {}
        cycle = path + [(6, 0)]
        assert self._run(spark, cycle, k=2) == {i: 2 for i in range(7)}

    def test_random_graph_matches_python_peel(self, spark):
        """Seeded G(40, 0.15): the 8-round synchronous peel reaches the
        unique fixpoint the Python mirror computes."""
        import itertools
        import random

        rng = random.Random(13)
        edges = [
            (a, b) for a, b in itertools.combinations(range(40), 2) if rng.random() < 0.15
        ]
        assert self._run(spark, edges, k=3) == self._py(edges, 3)

    def test_invalid_k_raises(self, spark):
        import pytest

        from amazonwebcrawler_spark.operators.webgraph import kcore

        with pytest.raises(ValueError):
            kcore(spark.createDataFrame([(1, 2)], "src long, dst long"), k=0)


class TestRandomWalks:
    def _run(self, spark, edges, walk_len=4, seed=7):
        from amazonwebcrawler_spark.operators.webgraph import random_walks

        e = spark.createDataFrame(edges, "src long, dst long")
        return sorted(
            (r.start, r.step, r.node)
            for r in random_walks(e, walk_len=walk_len, seed=seed).collect()
        )

    @staticmethod
    def _py(edges, walk_len, seed):
        import hashlib

        nbrs: dict = {}
        for s, d in set(edges):
            nbrs.setdefault(s, set()).add(d)
        nbrs = {s: sorted(v) for s, v in nbrs.items()}
        nodes = sorted({u for ed in edges for u in ed})
        rows = []
        for st in nodes:
            cur = st
            rows.append((st, 0, st))
            for t in range(1, walk_len + 1):
                out = nbrs.get(cur)
                if not out:
                    break
                h = int(
                    hashlib.md5(f"walk{seed}|{st}|{t}|{cur}".encode()).hexdigest()[:8], 16
                )
                cur = out[h % len(out)]
                rows.append((st, t, cur))
        return sorted(rows)

    def test_matches_hashlib_mirror(self, spark):
        """Branching graph: every walk equals the sequential Python replay
        of the md5 choice arithmetic (dst-ranked neighbors)."""
        edges = [(i, (i * 3 + 1) % 15) for i in range(15)] + [
            (i, (i * 7 + 2) % 15) for i in range(15)
        ]
        assert self._run(spark, edges) == self._py(edges, 4, 7)

    def test_steps_are_edges_and_deadends_stop(self, spark):
        """Consecutive walk positions are always edges; a sink node's walk
        is just its step-0 row."""
        edges = [(1, 2), (2, 3), (2, 4)]  # 3 and 4 are sinks
        got = self._run(spark, edges)
        eset = set(edges)
        bystart: dict = {}
        for st, t, n in got:
            bystart.setdefault(st, {})[t] = n
        for st, path in bystart.items():
            for t in range(1, max(path) + 1):
                assert (path[t - 1], path[t]) in eset
        assert bystart[3] == {0: 3} and bystart[4] == {0: 4}

    def test_seed_changes_walks(self, spark):
        edges = [(i, (i * 3 + 1) % 15) for i in range(15)] + [
            (i, (i * 7 + 2) % 15) for i in range(15)
        ]
        assert self._run(spark, edges, seed=7) != self._run(spark, edges, seed=8)
        assert self._run(spark, edges, seed=7) == self._py(edges, 4, 7)

    def test_invalid_len_raises(self, spark):
        import pytest

        from amazonwebcrawler_spark.operators.webgraph import random_walks

        with pytest.raises(ValueError):
            random_walks(spark.createDataFrame([(1, 2)], "src long, dst long"), walk_len=0)


def _py_tarjan_scc(edge_rows):
    """Independent Tarjan oracle (iterative): node -> min label of its SCC."""
    from collections import defaultdict

    adj = defaultdict(list)
    nodes = set()
    for s, d in edge_rows:
        nodes.add(s)
        nodes.add(d)
        if s != d:
            adj[s].append(d)
    index, low, on, stack, out = {}, {}, set(), [], {}
    counter = [0]
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            descended = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    descended = True
                    break
                elif w in on:
                    low[v] = min(low[v], index[w])
            if not descended:
                work.pop()
                if work:
                    low[work[-1][0]] = min(low[work[-1][0]], low[v])
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    m = min(comp)
                    for w in comp:
                        out[w] = m
    return out


class TestScc:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "src long, dst long")
        return {r["node"]: r["scc_id"] for r in webgraph.scc(df, **kw).collect()}

    def test_two_cycles_one_bridge(self, spark):
        # 3-cycle, 2-cycle, one-way bridge, DAG tail, pure sink
        rows = [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 10), (11, 20), (20, 21)]
        got = self._run(spark, rows)
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 21}

    def test_self_loop_and_multiplicity_collapse(self, spark):
        rows = [(5, 5), (5, 5), (1, 2), (1, 2), (2, 1)]
        got = self._run(spark, rows)
        assert got == {5: 5, 1: 1, 2: 1}

    def test_random_digraph_matches_tarjan(self, spark):
        import random

        rng = random.Random(37)
        rows = sorted(
            {(rng.randrange(40), rng.randrange(40)) for _ in range(100)}
            | {(1, 2), (2, 3), (3, 1), (10, 11), (11, 10), (3, 10)}
        )
        got = self._run(spark, rows, rounds=8, trim_iters=4, prop_iters=12)
        assert got == _py_tarjan_scc(rows)

    def test_nonconvergence_raises(self, spark):
        # two entangled cycles need 2 extraction rounds; rounds=1 must raise
        rows = [(1, 2), (2, 1), (1, 10), (10, 11), (11, 10)]
        df = spark.createDataFrame(rows, "src long, dst long")
        with pytest.raises(RuntimeError, match="did not converge"):
            webgraph.scc(df, rounds=1, trim_iters=1, prop_iters=4).collect()
