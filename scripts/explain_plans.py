"""Dump physical plans for the headline queries and assert plan hygiene:
parquet scans must show column pruning (ReadSchema ⊂ full schema) and
pushed filters where applicable; column-math pipelines must be inside
WholeStageCodegen spans; the dims join must be a broadcast.

Usage: python scripts/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

CHECKS = {
    # query -> list of substrings that MUST appear in the formatted plan
    # ("[codegen id :" is Spark 4's whole-stage-codegen marker)
    "rank_encode": ["[codegen id :", "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int>"],
    "first_per_group": ["[codegen id :", "Window"],
    "dim_join": ["BroadcastHashJoin"],
    "theta_join_first_match": ["BroadcastNestedLoopJoin"],
    "anti_join_new": ["LeftAnti"],
    "url_canonicalize": ["[codegen id :", "ReadSchema: struct<o_orderkey:bigint>"],
    "text_stats": ["ReadSchema: struct<doc_id:bigint,text:string>"],
    "ann_topk": ["BroadcastNestedLoopJoin", "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,5)]"],
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entrymod
    from amazonwebcrawler_spark.session import get_spark

    spark = get_spark(app_name="explain", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    bad = []
    for name, expected in CHECKS.items():
        txt = plan_text(qs[name](spark, sf_dir))
        missing = [e for e in expected if e not in txt]
        if missing:
            bad.append(name)
            print(f"FAIL {name}: missing {missing}")
            print(txt[:2500])
        else:
            print(f"ok   {name}: {', '.join(expected)}")
    print(f"\n{len(bad)} plan-hygiene failures" + (f": {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
