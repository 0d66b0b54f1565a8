"""Rank encoding + extraction kernels (SURVEY.md W1/W2/W3/W5, A5, P13).

The reference's core output is a human-readable rank string:

* grid layout (3-column SERP): ``page.row.col`` — getRank.py:285-297
* list layouts: ``page.index`` — getRank.py:302-315
* unknown layout: the literal ``'Other mode'`` (quarantine) — getRank.py:317-328
* best-sellers rank: the number between ``'#'`` and ``'in'`` —
  getRank.py:381-390,399-404; prototype regularExpression.py:1-6
* report synthesis: ``adRank(attr广告)/natRank(attr自然)``, defaulting to
  ``大于8页`` when neither was found within the page budget — getRank.py:265-268
  (golden vector ``6.15(广告)/2.14(自然)`` from the preserved workbook).

All pure column math — vectorized, codegen'd, no UDF. The reference
re-parses the whole page per product row to compute this
(getRank.py:280-281, admitted redundant at :205); here it is one
projection over already-parsed rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GRID_LAYOUTS = ("grid3",)
LIST_LAYOUTS = ("list_convertible", "list_plain", "see_more")


def rank_encode(layout: Column, page: Column, idx: Column) -> Column:
    """``idx`` (1-based position on ``page``) → rank string per layout.

    Grid math mirrors getRank.py:285-297 exactly:
      idx <= 3        → page.1.idx
      idx % 3 == 0    → page.(idx/3).3
      else            → page.(idx//3 + 1).(idx%3)
    which reduces to row = ceil(idx/3), col = ((idx-1) % 3) + 1.
    """
    row = F.ceil(idx / F.lit(3.0)).cast("int")
    col = (F.pmod(idx - F.lit(1), F.lit(3)) + F.lit(1)).cast("int")
    grid = F.concat_ws(".", page.cast("string"), row.cast("string"), col.cast("string"))
    lst = F.concat_ws(".", page.cast("string"), idx.cast("string"))
    return (
        F.when(layout.isin(*GRID_LAYOUTS), grid)
        .when(layout.isin(*LIST_LAYOUTS), lst)
        .otherwise(F.lit("Other mode"))  # W3 quarantine sentinel, getRank.py:317-328
    )


def best_seller_rank_extract(rank_text: Column) -> Column:
    """Number between ``'#'`` and ``'in'`` (W5).

    Vector from regularExpression.py:1-6:
    ``'#88 in Computers & Accessories (See top 100) '`` → ``'88'``.
    Commas survive inside the number (``'#1,234 in …'`` → ``'1,234'``).
    """
    return F.regexp_extract(rank_text, r"#\s*([\d,]+)\s+in", 1)


def pick_non_top100_rank(rank1: Column, rank2: Column) -> Column:
    """P13: of the two BSR strings, parse the one *not* marked 'Top 100'
    (getRank.py:378-390); when neither is marked, prefer rank1."""
    return (
        F.when(rank1.contains("Top 100"), best_seller_rank_extract(rank2))
        .when(rank2.contains("Top 100"), best_seller_rank_extract(rank1))
        .otherwise(best_seller_rank_extract(rank1))
    )


def rank_string_synthesis(
    ad_rank: Column, ad_attr: Column, nat_rank: Column, nat_attr: Column
) -> Column:
    """A5: ``adRank(attr广告)/natRank(attr自然)`` with the ``大于8页`` default
    when neither an ad nor a natural hit was found (getRank.py:257-268).

    Reference-faithful one-sided format: the ``广告``/``自然`` suffix is
    appended only when that side has a hit (getRank.py:257-263 builds
    ``attr + '广告'`` inside the if), so a missing side renders as a bare
    ``()`` — e.g. ``()/1.3(X自然)``."""
    ad_seg = F.when(ad_rank.isNull(), F.lit("()")).otherwise(
        F.concat(ad_rank, F.lit("("), F.coalesce(ad_attr, F.lit("")), F.lit("广告)"))
    )
    nat_seg = F.when(nat_rank.isNull(), F.lit("()")).otherwise(
        F.concat(nat_rank, F.lit("("), F.coalesce(nat_attr, F.lit("")), F.lit("自然)"))
    )
    return F.when(ad_rank.isNull() & nat_rank.isNull(), F.lit("大于8页")).otherwise(
        F.concat(ad_seg, F.lit("/"), nat_seg)
    )


def first_match_struct(
    clean_title: Column, product_type: Column, dims_rows: list[tuple[str, str, str, int]]
) -> Column:
    """First-match-wins own-product classification as a PURE PROJECTION.

    The reference probes every title against dict keys in insertion order and
    breaks on the first hit (getRank.py:229-236). For a dims table this small
    (tiny own-catalog), a broadcast join + dedup pays a full shuffle for
    nothing — embedding the rows as a literal array and taking the first
    passing element keeps the whole classify inside one codegen'd map stage.
    Returns struct(match_title, size_attr) or NULL when no match; the
    general-case broadcast theta join (J2) remains in __spark_entry__ as the
    oracle-checked operator for larger dims.

    ``dims_rows``: (product_type, match_title, size_attr, dict_pos).
    """
    arr = F.array(
        *[
            F.struct(
                F.lit(pt).alias("product_type"),
                F.lit(mt).alias("match_title"),
                F.lit(sa).alias("size_attr"),
            )
            for pt, mt, sa, _pos in sorted(dims_rows, key=lambda r: r[3])
        ]
    )
    hits = F.filter(
        arr,
        lambda d: (d["product_type"] == product_type) & (F.instr(clean_title, d["match_title"]) > 0),
    )
    return F.get(hits, 0)  # null-safe (ANSI element_at throws on empty)


def strip_sponsored_tag(title: Column) -> Column:
    """P6: remove the '[Sponsored]' marker before dimension lookup
    (getRank.py:260)."""
    return F.trim(F.replace(F.trim(title), F.lit("[Sponsored]"), F.lit("")))


def is_sponsored(title: Column) -> Column:
    """P5: 'Sponsored' membership splits ad vs natural results
    (getRank.py:231-234)."""
    return title.contains("Sponsored")
