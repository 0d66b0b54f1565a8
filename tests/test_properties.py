"""Property-based tests (hypothesis) for the pure kernels — no Spark,
the Python twins are asserted equal to the Spark exprs in test_equivalence."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from amazonwebcrawler_spark.functions.images import (
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
    psnr,
)
from tests.oracle import canonicalize_url_py

_path_seg = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_.", min_size=1, max_size=8
)
_param = st.tuples(
    st.sampled_from(["a", "b", "keywords", "page", "ref", "qid", "ie", "sr", "x"]),
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789+", max_size=6),
)


@st.composite
def urls(draw):
    host = draw(st.sampled_from(["www.Amazon.com", "WWW.AMAZON.COM", "example.org"]))
    segs = draw(st.lists(_path_seg, max_size=3))
    params = draw(st.lists(_param, max_size=4))
    frag = draw(st.sampled_from(["", "#top", "#reviews"]))
    path = "".join("/" + s for s in segs)
    q = "&".join(f"{k}={v}" for k, v in params)
    return f"https://{host}{path}" + (f"?{q}" if q else "") + frag


class TestCanonicalizeProperties:
    @given(urls())
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, url):
        c = canonicalize_url_py(url)
        assert canonicalize_url_py(c) == c

    @given(urls())
    @settings(max_examples=200, deadline=None)
    def test_no_fragment_no_tracking(self, url):
        c = canonicalize_url_py(url)
        assert "#" not in c
        query = c.partition("?")[2]
        keys = {p.split("=")[0] for p in query.split("&") if p}
        assert keys.isdisjoint({"ref", "qid", "ie", "sr"})

    @given(urls())
    @settings(max_examples=100, deadline=None)
    def test_query_sorted(self, url):
        c = canonicalize_url_py(url)
        parts = [p for p in c.partition("?")[2].split("&") if p]
        assert parts == sorted(parts)


_img = st.integers(0, 255)


class TestCodecProperties:
    @given(st.integers(0, 2**32 - 1), st.sampled_from([(8, 8), (16, 24), (32, 32)]))
    @settings(max_examples=30, deadline=None)
    def test_png_roundtrip(self, seed, shape):
        import numpy as np

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(shape[1], shape[0], 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=30, deadline=None)
    def test_jpeg_psnr_bound(self, seed):
        import numpy as np

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        assert psnr(px, decode_jpeg(encode_jpeg(px))) >= 40.0
