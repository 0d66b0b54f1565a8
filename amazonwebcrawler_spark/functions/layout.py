"""Data-layout keys: Z-order (Morton) interleaving as pure column math.

At 100 TB the dominant cost of the rank-history and image-corpus scans is
I/O — and parquet min/max row-group statistics only prune on columns the
data is clustered by. Sorting by ``(a, b)`` clusters perfectly on ``a``
and not at all on ``b``; interleaving the bits of both (a Z-order / Morton
key) keeps BOTH columns' value ranges narrow inside every file, so
predicates on either column skip most row groups.

Usage at write time::

    df.repartitionByRange(N, zorder_key(F.col("host_bits"), F.col("depth")))
      .sortWithinPartitions(zorder_key(...))
      .write.parquet(...)

(``repartitionByRange`` runs a hidden sampling job — persist the input
first; see SCALE.md.)

The key is built from shift/mask/or column expressions only — whole-stage
codegen, no UDF, and the identical arithmetic is expressible in ANSI SQL
(the DuckDB twin in ``__spark_entry__.py`` is generated from the same bit
loop), so the driver value-checks it end-to-end.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1. Result fits in
    ``2 * bits`` bits (long). Inputs are masked to ``bits`` bits first, so
    out-of-range values wrap rather than corrupt neighbouring bits."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_key_sql(x: str, y: str, bits: int = 10) -> str:
    """The DuckDB/ANSI twin of :func:`zorder_key` — same bit loop rendered
    as SQL text, for oracle queries. ``x``/``y`` are SQL expressions."""
    # every term is FULLY parenthesized including its trailing shift:
    # DuckDB gives |, & and << the same precedence (left-assoc), so a bare
    # ``a << 1 | b << 2`` parses as ``((a << 1) | b) << 2`` and overflows
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((((({x}) & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"((((({y}) & {mask}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
