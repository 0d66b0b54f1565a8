"""Per-leg measurement harness for optimization work (guide §1).

NOT part of the driver contract — bench.py is frozen for measurement; this
file exists so individual query legs can be re-timed quickly between
changes without paying the full bench (wave + loop + scaling + ivf ≈ 30
min). Methodology matches bench.py's query section exactly (same session
conf, fresh DataFrame per rep, best-of-reps on ``.count()``) so numbers
are comparable, and adds what bench.py cannot: per-leg Spark JOB counts
(the job-submit overhead signal the lazy-checkpoint work targets) and an
optional noop-sink timing (``--noop``) that computes every column
(guide §1.4) instead of letting count() prune.

Usage:
    python bench_extra.py q1 q2 ...      # named legs
    python bench_extra.py --all          # every BENCH_QUERIES leg
    BENCH_EXTRA_REPS=3 python bench_extra.py --noop scc ann_pq
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES  # noqa: E402  (frozen list — read-only import)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    use_noop = "--noop" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--all" in sys.argv or not names:
        names = list(BENCH_QUERIES)

    from amazonwebcrawler_spark.session import get_spark

    spark = get_spark(
        app_name="awc-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    tracker = spark.sparkContext.statusTracker()

    def _max_job_id() -> int:
        # count jobs by MAX id, not list length — the status tracker's
        # retained-job window evicts old entries mid-run
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else -1

    out: dict = {"sf": sf_dir, "cpus": cpus, "reps": reps, "noop": use_noop, "queries": {}}
    for name in names:
        fn = qs[name]
        samples, job_counts = [], []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            jobs_before = _max_job_id()
            t0 = time.time()
            df = fn(spark, sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
            job_counts.append(_max_job_id() - jobs_before)
            spark.sparkContext.setJobDescription(None)
        out["queries"][name] = {
            "best": min(samples),
            "samples": samples,
            "jobs": job_counts[-1],
        }
        print(f"{name:24s} best={min(samples):7.2f}s jobs={job_counts[-1]:3d} {samples}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
