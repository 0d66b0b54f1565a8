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
    # WindowGroupLimit (Partial before the exchange, Final after) proves the
    # rank<=1 cut is pushed below the shuffle — map-side top-1 per group
    "first_per_group": ["WindowGroupLimit", "Partial", "Final"],
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


def check_no_global_window(spark) -> list[str]:
    """Assert the wave expansion DAG contains NO Window with an empty
    partition spec (a single-task global sort — fatal at 10^10-URL
    expansions). discovery_seq is assigned via per-parent windows +
    driver-side offsets (operators/politeness.py), so every Window in the
    plan must carry a partitionBy."""
    import re
    import shutil

    from amazonwebcrawler_spark.operators import bloom
    from amazonwebcrawler_spark.operators.politeness import assign_discovery_seq
    from amazonwebcrawler_spark.plans.crawler import CrawlConfig, _with_host_shard
    from pyspark.sql import functions as F

    cfg = CrawlConfig(checkpoint_dir="/tmp/unused_explain")
    cand = spark.range(0, 1000).select(
        F.concat(F.lit("https://www.amazon.com/dp/B"), F.col("id").cast("string")).alias("canonical_url"),
        (F.col("id") % 37).alias("parent_seq"),
        (F.col("id") % 11).cast("int").alias("parent_pos"),
    )
    cand = _with_host_shard(cand, cfg)
    keyed = bloom.with_bloom_keys(cand, "canonical_url", bloom.BloomConfig(n_buckets=8, m_bits=1 << 16))
    seq, _n = assign_discovery_seq(keyed, 1000)
    txt = plan_text(seq)
    shutil.rmtree("/tmp/unused_explain", ignore_errors=True)
    # Spark 4 formatted plan renders a window's partition spec inside the
    # Window node arguments: "Arguments: [...], [partition cols], [order]"
    bad = []
    for m in re.finditer(r"\(\d+\) Window[^\n]*\n(?:.*\n)*?Arguments: (.*)", txt):
        args = m.group(1)
        if ", [], [" in args or args.rstrip().endswith(", []"):
            bad.append(args[:120])
    # also: any Sort with a single partition marker would show as Exchange SinglePartition
    if "Exchange SinglePartition" in txt:
        bad.append("Exchange SinglePartition present in expansion plan")
    if bad:
        print("FAIL expansion_no_global_window:", bad)
        print(txt[:2500])
        return ["expansion_no_global_window"]
    print("ok   expansion_no_global_window: every Window is partitioned; no SinglePartition exchange")
    return []


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entrymod
    from amazonwebcrawler_spark.session import get_spark

    spark = get_spark(app_name="explain", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    bad = []
    bad += check_no_global_window(spark)
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
