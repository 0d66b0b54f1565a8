"""Deterministic synthetic web world (SURVEY.md §5 fixture 3-7, M0).

Every page is a **pure function of (WORLD_SEED, canonical_url)** — no wall
clock, no randomness at call time — so the Spark engine (fetching in
parallel inside ``mapInPandas`` batches) and the single-threaded
reference-semantics oracle (tests/oracle.py) observe byte-identical worlds,
which is what makes the crawl-order / URL-seen equivalence checks
(BASELINE.json north_rule) meaningful.

URL space (mirrors the reference's three entry points, SURVEY.md §3):

* SERP      ``https://www.amazon.com/s?field-keywords=<kw>&page=<p>``
  — getRank.py:125-126's GET-equivalent of the search-box submit (S5)
* detail    ``https://www.amazon.com/dp/<ASIN>``            (getRank.py:332+)
* category  ``https://www.amazon.com/gp/new-releases/<cat>`` (getStockNumber.py:193)
* cart      ``https://www.amazon.com/gp/cart/view.html?asin=<ASIN>&qty=999``
  — the inventory probe (getStockNumber.py:96-128, S6)

Page shapes exercise every branch catalogued in SURVEY.md §2: all five SERP
layouts (W1-W3), the empty page (P9), the >45-item anomaly page (P8), the
'Amazon recommendation' default title (P2), '[Sponsored]' markers (P5/P6),
tracking-param-laden hrefs (P14), empty dp_url fallback (P11), both BSR rank
modes + 'Top 100' branches (P12/P13), and the stock-clamp probe
(inventory = min(999, stock), verified in the reference by screenshots/0.png).
"""

from __future__ import annotations

import hashlib
import json
from urllib.parse import quote_plus, unquote_plus

import numpy as np

from amazonwebcrawler_spark.functions.images import encode_jpeg, encode_png, phash64

WORLD_SEED = 42
HOST = "https://www.amazon.com"

LAYOUTS = ["grid3", "list_convertible", "list_plain", "see_more", "other"]

#: synthetic own-product catalog — same *structure* as the reference's three
#: match dicts (getRank.py:51-71: product_type → {title: size_attr}), with
#: original synthetic titles. The empty-attr row mirrors getRank.py:70.
DIMS: list[tuple[str, str, str, int]] = [
    # (product_type, match_title, size_attr, dict_pos)
    ("fscl", "AWC Deep Pocket Fitted Sheet Twin XL Breathable", "TXL", 0),
    ("fscl", "AWC Deep Pocket Fitted Sheet Full Size Soft", "F", 1),
    ("fscl", "AWC Deep Pocket Fitted Sheet Queen Wrinkle Free", "Q", 2),
    ("fscl", "AWC Deep Pocket Fitted Sheet King Hotel Grade", "K", 3),
    ("fscl", "AWC Deep Pocket Fitted Sheet Cal King Cooling", "CK", 4),
    ("jmcl", "AWC Journal Midnight Classic Lined Notebook A5", "T", 0),
    ("jmcl", "AWC Journal Midnight Classic Dotted Notebook A5", "F", 1),
    ("jmcl", "AWC Journal Midnight Classic Plain Notebook B5", "Q", 2),
    ("jmcl", "AWC Journal Midnight Classic Grid Notebook A6", "K", 3),
    ("jmcl", "AWC Journal Midnight Classic Sketch Notebook A4", "CK", 4),
    ("jmcl", "AWC Journal Midnight Classic Travel Notebook", "TXL", 5),
    ("yogamat", "AWC TPE Yoga Mat Non Slip Eco Friendly 6mm", "", 0),
]

KEYWORDS = [
    ("tpe yoga mat", "yogamat"),
    ("yoga mat", "yogamat"),
    ("fitted sheet queen", "fscl"),
    ("fitted sheet king", "fscl"),
    ("lined notebook a5", "jmcl"),
    ("dotted notebook", "jmcl"),
]
#: keyword → product_type lookup, built once (fetch() is the hot loop of
#: the crawl wave — rebuilding this dict per SERP fetch was measurable)
_KEYWORD_TYPES = dict(KEYWORDS)

GENERIC_WORDS = [
    "Premium", "Classic", "Pro", "Ultra", "Eco", "Soft", "Durable", "Portable",
    "Mat", "Sheet", "Notebook", "Bundle", "Set", "Deluxe", "Lite", "Max",
]
CATEGORIES = [
    "Sports & Outdoors", "Home & Kitchen", "Office Products",
    "Computers & Accessories", "Health & Household",
]


def h64(*parts: object) -> int:
    """Stable 64-bit hash of the parts under WORLD_SEED (md5-based — Python's
    builtin ``hash`` is process-salted and must never be used here)."""
    key = "\x1f".join([str(WORLD_SEED), *map(str, parts)]).encode()
    return int.from_bytes(hashlib.md5(key).digest()[:8], "big")


def asin_for(keyword: str, page: int, pos: int) -> str:
    """ASIN at a SERP slot. ~1 in 6 slots carries a *popular* product from a
    small keyword-independent pool — the same ASIN then surfaces on many
    keywords' SERPs in the same wave, which is what gives the crawler's
    page-rank-like priority (in-wave in-degree) a real, non-vacuous signal
    to rank on. Titles are generated separately (_item_title), so rank
    classification is unaffected by which ASIN sits in the slot."""
    r = h64("asin", keyword, page, pos)
    if r % 6 == 0:
        return "B" + format(h64("popular", r % 24) % 16**9, "09X")
    return "B" + format(r % 16**9, "09X")


# ------------------------------------------------------------------ URLs
def serp_url(keyword: str, page: int) -> str:
    return f"{HOST}/s?field-keywords={quote_plus(keyword)}&page={page}"


def detail_url(asin: str) -> str:
    return f"{HOST}/dp/{asin}"


def category_url(cat: str) -> str:
    return f"{HOST}/gp/new-releases/{cat}"


def cart_url(asin: str) -> str:
    return f"{HOST}/gp/cart/view.html?asin={asin}&qty=999"


def classify_url(url: str) -> str:
    """canonical URL → page kind ('serp'|'detail'|'category'|'cart'|'robots'|'404')."""
    if url.startswith(f"{HOST}/s?"):
        return "serp"
    if url.startswith(f"{HOST}/dp/"):
        return "detail"
    if url.startswith(f"{HOST}/gp/new-releases/"):
        return "category"
    if url.startswith(f"{HOST}/gp/cart/view.html?"):
        return "cart"
    return "404"


def _qs(url: str) -> dict[str, str]:
    if "?" not in url:
        return {}
    out = {}
    for kv in url.split("?", 1)[1].split("&"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            out[k] = unquote_plus(v)
    return out


# ------------------------------------------------------------------ robots
#: host → (disallow path prefixes, crawl_delay seconds). The /gp/private
#: prefix exists so the robots filter (north_rule C7) has a real hit.
ROBOTS: dict[str, tuple[list[str], float]] = {
    "www.amazon.com": (["/gp/private", "/exec/obidos"], 0.0),
}


def robots_allowed(url: str) -> bool:
    host = url.split("://", 1)[-1].split("/", 1)[0].lower()
    rules = ROBOTS.get(host)
    if rules is None:
        return True
    path = "/" + url.split("://", 1)[-1].split("/", 1)[-1] if "/" in url.split("://", 1)[-1] else "/"
    return not any(path.startswith(p) for p in rules[0])


# ------------------------------------------------------------------ SERP
def n_serp_pages(keyword: str) -> int:
    """Total pages for a keyword, 3..9 (9 > the reference's 7-page budget
    getRank.py:466 so the budget is binding; some keywords end early so the
    last-page predicate P7 also fires)."""
    return 3 + h64("npages", keyword) % 7


#: product_type → own-catalog DIMS rows, built once per type (hot loop:
#: _item_title runs per SERP item — the filter re-scan was per-item work)
_OWN_ROWS: dict = {}


def _item_title(keyword: str, page: int, pos: int, product_type: str) -> tuple[str, bool, bool]:
    """→ (title, is_sponsored, has_title_node). Deterministically injects
    own-catalog titles so classification (J1/J2/P4) has hits."""
    r = h64("item", keyword, page, pos)
    own_rows = _OWN_ROWS.get(product_type)
    if own_rows is None:
        own_rows = [d for d in DIMS if d[0] == product_type]
        _OWN_ROWS[product_type] = own_rows
    is_sponsored = (r >> 8) % 5 == 0  # ~20% ads, like a real SERP
    has_title_node = (r >> 16) % 19 != 0  # occasional missing node → P2 default
    if (r >> 24) % 11 == 0:  # ~9% own-product injection
        title = own_rows[(r >> 32) % len(own_rows)][1]
    else:
        w = [GENERIC_WORDS[(r >> (4 * i)) % len(GENERIC_WORDS)] for i in range(4)]
        title = f"{w[0]} {w[1]} {keyword.title()} {w[2]} {w[3]} {pos}"
    if is_sponsored:
        title = "[Sponsored] " + title
    return title, is_sponsored, has_title_node


def serp_page(keyword: str, page: int, product_type: str) -> dict:
    """Full SERP page record as a JSON-able dict."""
    total = n_serp_pages(keyword)
    r = h64("serp", keyword, page)
    layout = LAYOUTS[r % 23 % len(LAYOUTS) if r % 23 < 20 else 4]  # 'other' rare
    if r % 37 == 0:
        n_items = 0            # empty SERP → P9
    elif r % 41 == 0:
        n_items = 46           # >45 anomaly → P8
    else:
        n_items = 12 + (r >> 40) % 12
    items = []
    for pos in range(1, n_items + 1):
        title, sponsored, has_node = _item_title(keyword, page, pos, product_type)
        asin = asin_for(keyword, page, pos)
        # raw href deliberately keeps tracking params + /ref= path suffix (P14 fodder)
        href = f"/dp/{asin}/ref=sr_{page}_{pos}?qid=1523525327&sr=8-{pos}&keywords={quote_plus(keyword)}"
        items.append(
            {
                "pos": pos,
                "title": title if has_node else None,  # parse applies the P2 default
                "href": href,
                "is_sponsored": sponsored,
                "has_title_node": has_node,
            }
        )
    return {
        "kind": "serp",
        "keyword": keyword,
        "page": page,
        "layout": layout,
        "has_next": page < total,
        "items": items,
    }


# ------------------------------------------------------------------ detail
def product_stock(asin: str) -> int:
    """True stock level; includes >999 values so the probe clamp binds."""
    return h64("stock", asin) % 1500


def detail_page(asin: str) -> dict:
    r = h64("detail", asin)
    axis = ["size_name", "color_name", None][r % 17 % 3 if r % 17 < 15 else 2]
    n_skus = 1 + (r >> 8) % 4
    skus = []
    for v in range(n_skus):
        rv = h64("sku", asin, v)
        attr = "Click to select " + ["Small", "Medium", "Large", "XL", "Blue", "Black"][rv % 6]
        # one empty dp_url occasionally → the P11 fallback-to-product-URL path
        dp_url = "" if rv % 13 == 0 else f"/dp/{asin}{chr(65 + v)}?psc=1&ref=twister_{v}"
        skus.append({"attr": attr, "dp_url": dp_url})
    mode = ["two_table", "salesrank", "none"][(r >> 16) % 19 % 3 if (r >> 16) % 19 < 17 else 2]
    cat1 = CATEGORIES[(r >> 24) % len(CATEGORIES)]
    cat2 = CATEGORIES[(r >> 28) % len(CATEGORIES)]
    n1 = 1 + (r >> 32) % 99999
    n2 = 1 + (r >> 40) % 99
    # 'Top 100' marker alternates between rank1 and rank2 → both P13 branches
    if (r >> 48) % 2 == 0:
        rank1 = f"#{n2} in {cat1} (See Top 100 in {cat1})"
        rank2 = f"#{n1:,} in {cat2}"
    else:
        rank1 = f"#{n1:,} in {cat1}"
        rank2 = f"#{n2} in {cat2} (See Top 100 in {cat2})"
    if mode == "salesrank":
        rank1, rank2 = f"#{n1:,} in {cat1}", ""
    elif mode == "none":
        rank1, rank2 = "", ""
    title_words = [GENERIC_WORDS[(r >> (4 * i)) % len(GENERIC_WORDS)] for i in range(3)]
    return {
        "kind": "detail",
        "asin": asin,
        "title": f"{title_words[0]} {title_words[1]} {title_words[2]} {asin}",
        "variant_axis": axis or "none",
        "skus": skus if axis else [],  # axis-less page → quarantine path (W3)
        "rank_mode": mode,
        "rank1": rank1,
        "rank2": rank2,
        "stock": product_stock(asin),
    }


# ------------------------------------------------------------------ images
#: gradient base per (w, h) — a pure function of the dimensions (two
#: variants exist), so cache it instead of re-running mgrid+stack per
#: image. READ-ONLY: consumers add noise into a fresh array (np.clip
#: allocates), never mutate the cached base.
_GRADIENT_BASE: dict = {}


def _gradient_base(w: int, h: int) -> np.ndarray:
    base = _GRADIENT_BASE.get((w, h))
    if base is None:
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack(
            [
                (xx * 255 // max(w - 1, 1)),
                (yy * 255 // max(h - 1, 1)),
                ((xx + yy) * 255 // max(w + h - 2, 1)),
            ],
            axis=-1,
        ).astype(np.int32)
        _GRADIENT_BASE[(w, h)] = base
    return base


def image_record(asin: str, full: bool = True) -> dict:
    """Deterministic image+caption payload for a product (input_hint schema).

    Pixel content is a smooth gradient + hash-seeded pattern so phash is
    non-trivial and JPEG quantization error is realistic.

    ``full=False`` skips the jpeg re-decode + phash and omits the
    ``phash``/``_pixels`` keys — the :func:`fetch` fast path, which only
    ships ``bytes`` (consumers decode downstream; computing the canonical
    phash here was pure waste in the fetch hot loop). The bytes are
    byte-identical in both modes.
    """
    r = h64("img", asin)
    w, h = (32, 32) if r % 3 else (64, 48)
    base = _gradient_base(w, h)
    rng = np.random.default_rng(r % (2**32))  # seeded by url-hash → deterministic
    noise = rng.integers(-20, 21, size=(h, w, 3), dtype=np.int32)
    pixels = np.clip(base + noise, 0, 255).astype(np.uint8)
    fmt = "jpeg" if r % 2 else "png"
    data = encode_jpeg(pixels) if fmt == "jpeg" else encode_png(pixels)
    rec = {
        "image_id": f"img-{asin}",
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": detail_page(asin)["title"],
    }
    if not full:
        return rec
    if fmt == "jpeg":
        from amazonwebcrawler_spark.functions.images import decode_jpeg

        decoded = decode_jpeg(data)  # canonical phash is of DECODED pixels —
        # lossy codecs shift pixels, so "the" phash is what any consumer of
        # the bytes column computes, not the pre-encode original
    else:
        decoded = pixels
    rec["phash"] = phash64(decoded)
    rec["_pixels"] = pixels  # oracle-side ORIGINAL pixels for the PSNR check
    return rec


def block_image_record(img_id: str, flip_cells: int = 0, fmt: str = "png") -> dict:
    """Deterministic 32×32 block-pattern image whose pHash bits ARE a seeded
    8×8 binary pattern — the dedup-test counterpart of :func:`image_record`
    (whose smooth gradients give every product near-identical aHashes,
    useless for near-dup testing).

    Each 8×8 cell is a uniform 4×4 pixel block at 40 (bit 0) or 216
    (bit 1) gray — both far from the image mean, so the average-hash
    threshold reproduces the pattern exactly, and the lossy fjpg codec's
    +4 dequantization shift (uniform over all pixels) moves the mean and
    every cell together, flipping nothing. ``flip_cells=k`` inverts k
    hash-chosen distinct cells, shifting the pHash by EXACTLY k bits: the
    pair (base png, variant jpeg) has a controlled hamming distance, which
    is what lets the phash-dedup golden pin the ≤/> threshold boundary.
    The pattern always contains both colors (cells 0 and 1 are forced) so
    the mean threshold never degenerates.
    """
    r = h64("blockimg", img_id)
    rng = np.random.default_rng(r % (2**32))
    pattern = rng.integers(0, 2, size=(8, 8), dtype=np.int32)
    pattern.flat[0], pattern.flat[1] = 0, 1  # never a single-color image
    if flip_cells:
        # distinct cells 2..63 (keep the two forced cells stable)
        cells = 2 + rng.permutation(62)[:flip_cells]
        pattern.flat[cells] = 1 - pattern.flat[cells]
    gray = (40 + pattern * 176).astype(np.uint8)  # 40 / 216
    pixels = np.repeat(np.repeat(gray, 4, axis=0), 4, axis=1)
    pixels = np.stack([pixels] * 3, axis=-1)
    if fmt == "jpeg":
        from amazonwebcrawler_spark.functions.images import decode_jpeg

        data = encode_jpeg(pixels)
        decoded = decode_jpeg(data)
    else:
        data = encode_png(pixels)
        decoded = pixels
    return {
        "image_id": img_id,
        "bytes": data,
        "w": 32,
        "h": 32,
        "fmt": fmt,
        "caption": f"block pattern {img_id}",
        "phash": phash64(decoded),
        "_pixels": pixels,
    }


# ------------------------------------------------------------------ category
def category_page(cat: str) -> dict:
    r = h64("cat", cat)
    n = 8 + r % 8
    items = []
    for pos in range(1, n + 1):
        asin = asin_for("cat:" + cat, 1, pos)
        # every 7th link points into a robots-disallowed prefix so the C7
        # filter has a real hit to drop (FIXTURES.md §7)
        href = (
            f"/gp/private/offer-{asin}"
            if pos % 7 == 0
            else f"/dp/{asin}/ref=zg_bsnr_{pos}?qid=99&ie=UTF8"
        )
        items.append(
            {
                "pos": pos,
                "title": detail_page(asin)["title"],  # title = img[alt], getStockNumber.py:66
                "href": href,
                "asin": asin,
                "img_src": f"https://images.amazon.com/{asin}.jpg",
            }
        )
    return {"kind": "category", "category": cat, "items": items}


# ------------------------------------------------------------------ cart
def cart_probe(asin: str) -> dict:
    """Inventory probe semantics (getStockNumber.py:96-139): request qty=999,
    backend clamps to available stock. Inventory is a *string* by reference
    contract (getStockNumber.py:128 'Type: str')."""
    stock = product_stock(asin)
    inventory = min(999, stock)
    if stock >= 999:
        alert = ""
    else:
        alert = f"This seller has only {stock} of these available"
    return {
        "kind": "cart",
        "asin": asin,
        "inventory": str(inventory),
        "alert": alert,
    }


# ------------------------------------------------------------------ fetch
def fetch(canonical_url: str) -> dict:
    """The sandbox 'network': canonical URL → page record + status.

    Returns ``{"status": int, "content": json-str, "image_bytes": bytes|None}``.
    Deterministic transient failures (~3%, retryable — C3) are keyed by
    (url, attempt) at the call site via :func:`fetch_status`.
    """
    kind = classify_url(canonical_url)
    if kind == "serp":
        q = _qs(canonical_url)
        kw = q.get("field-keywords", "")
        page = int(q.get("page", "1"))
        ptype = _KEYWORD_TYPES.get(kw, "yogamat")
        return {"status": 200, "content": json.dumps(serp_page(kw, page, ptype)), "image_bytes": None}
    if kind == "detail":
        asin = canonical_url.rsplit("/dp/", 1)[1].split("/")[0].split("?")[0]
        rec = detail_page(asin)
        # bytes-only image build: the canonical phash/_pixels are consumer-
        # side derivations of the bytes, never shipped by the network
        img = image_record(asin, full=False)
        return {"status": 200, "content": json.dumps(rec), "image_bytes": img["bytes"]}
    if kind == "category":
        cat = canonical_url.rsplit("/gp/new-releases/", 1)[1].split("?")[0]
        return {"status": 200, "content": json.dumps(category_page(cat)), "image_bytes": None}
    if kind == "cart":
        asin = _qs(canonical_url).get("asin", "")
        return {"status": 200, "content": json.dumps(cart_probe(asin)), "image_bytes": None}
    return {"status": 404, "content": json.dumps({"kind": "404"}), "image_bytes": None}


def fetch_is_transient_failure(canonical_url: str, attempt: int) -> bool:
    """Deterministic retryable timeout (replaces the reference's unbounded
    recursive retry, getRank.py:87-88): ~3% of first attempts fail, always
    succeed by attempt 2."""
    return attempt == 0 and h64("flaky", canonical_url) % 31 == 0
