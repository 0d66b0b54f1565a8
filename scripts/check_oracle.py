"""Local mirror of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet tables,
compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


#: queries whose floats may legitimately differ in the last ulp between
#: engines, compared at 6dp instead of exactly. EMPTY by design since r5:
#: every query contract emits integers (micro-unit BIGINTs) precisely so
#: the driver's exact value hash is environment-proof — a query added here
#: would pass locally but stay one rounding boundary away from a driver
#: hash flip (the r4 corpus_stats/image_quality failure this gate used to
#: mask by blanket-rounding all floats to 6dp).
FLOAT_TOLERANT: frozenset[str] = frozenset()


def _norm(v, tolerant: bool = False):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # strict mode mirrors the driver: exact value identity (repr keeps
        # every bit of a double; round() would hide cross-engine drift)
        return round(v, 6) if tolerant else repr(v)
    if isinstance(v, int):
        return int(v)
    try:  # Decimal
        from decimal import Decimal

        if isinstance(v, Decimal):
            return round(float(v), 6) if tolerant else repr(float(v))
    except ImportError:
        pass
    return str(v)


def normalize_rows(rows, colnames, tolerant: bool = False):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    # key=repr: total order even when a sort-leading column holds NULLs
    # (None < float is a TypeError under tuple comparison)
    return sorted((tuple(_norm(r[i], tolerant) for i in order) for r in rows), key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from amazonwebcrawler_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # committed goldens captured at a specific scale only hold at that scale
    # — skip them elsewhere instead of failing by construction
    import json
    import os

    pinned: dict[str, str] = {}
    # derive from the entry module's location — a hardcoded /root/repo path
    # would silently load an empty pin map in any other checkout
    gpath = os.path.join(
        os.path.dirname(os.path.abspath(entrymod.__file__)),
        "amazonwebcrawler_spark", "goldens.json",
    )
    if os.path.exists(gpath):
        with open(gpath) as f:
            pinned = {
                n: g["pinned_sf"] for n, g in json.load(f).items() if g.get("pinned_sf")
            }
    sf_name = os.path.basename(os.path.normpath(sf_dir))

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in pinned and pinned[name] != sf_name:
            print(f"skip  {name}: golden pinned to {pinned[name]}, running at {sf_name}")
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # the integer-contract rule (CLAUDE.md): a DOUBLE/FLOAT column
            # (incl. nested) is a latent driver hash-red — engine-rounded
            # floats are not bit-stable across builds (r4's two failures)
            fp = [
                f.name for f in sdf.schema.fields
                if "double" in f.dataType.simpleString() or "float" in f.dataType.simpleString()
            ]
            if fp:
                failures.append(name)
                print(f"FAIL  {name}: DOUBLE/FLOAT contract columns {fp}")
                continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if sql is None:
            print(f"ok    {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            cur = con.execute(sql)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        tolerant = name in FLOAT_TOLERANT
        sn = normalize_rows(srows, scols, tolerant)
        dn = normalize_rows(drows, dcols, tolerant)
        if len(sn) != len(dn):
            failures.append(name)
            print(f"FAIL  {name}: row counts spark={len(sn)} duck={len(dn)}")
            s_only = [r for r in sn if r not in set(dn)][:3]
            d_only = [r for r in dn if r not in set(sn)][:3]
            print(f"      spark-only: {s_only}\n      duck-only: {d_only}")
            continue
        if sn != dn:
            failures.append(name)
            mism = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL  {name}: values differ; first mismatches: {mism}")
            continue
        print(f"ok    {name}: {len(sn)} rows match")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
