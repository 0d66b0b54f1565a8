"""Execution-scope helpers shared by the iterative graph operators.

``coalesced_stages`` re-enables AQE partition coalescing around an
operator's INTERNAL materializations. Rationale (guide §2.2): the bench
session pins ``spark.sql.adaptive.coalescePartitions.enabled=false``
because byte-based coalescing collapses the CPU-heavy Python fetch stages
to 1-2 tasks; the iterative graph ops are the opposite regime — dozens of
sequential exchanges over byte-tiny tables, where every 64-partition
stage (and every 64-partition checkpointed RDD that later broadcasts or
counts) is pure scheduling overhead. Coalescing is the scale-ADAPTIVE
answer: AQE targets ``advisoryPartitionSizeInBytes``, so a 10^10-edge
graph keeps full parallelism while a host-level graph runs 1-task stages
— no constant tuned to either size (measured: scc 14.4 s → see
OPTIMIZATION_r06.md with coalescing scoped this way).

The conf is restored on exit, so the wave/loop legs and every other query
see the session default. Conf reads happen at ACTION time, which is why
the iterative ops materialize their final result eagerly inside this
scope instead of leaving it to the caller's first action.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def _scoped_conf(spark, overrides: dict):
    olds = {}
    for k, v in overrides.items():
        try:
            olds[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset key
            olds[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in olds.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


@contextmanager
def coalesced_stages(spark):
    with _scoped_conf(
        spark, {"spark.sql.adaptive.coalescePartitions.enabled": "true"}
    ):
        yield


@contextmanager
def iterative_exec(spark):
    """Plan/execute an iterative operator's sub-rounds WITHOUT AQE.

    Under AQE every exchange and broadcast materializes as its own
    stage-job — an scc build was measured at 156 jobs of ~60-90 ms fixed
    overhead each, pure scheduling on a byte-tiny graph. With AQE off the
    per-round plans compile statically, the checkpointed LogicalRDDs
    preserve their ``outputPartitioning`` (so consecutive rounds keyed on
    ``node`` skip re-exchanges entirely), and ONE action runs the whole
    chain as a single job. Scale note: nothing here is tuned to local
    mode — the rounds' join/agg shapes are identical, only the adaptive
    re-planning loop (whose value is skew/broadcast discovery on
    UNKNOWN-sized inputs) is skipped where the operator already knows the
    shape of every per-round table. Conf is restored on exit; reads
    happen at plan-compile time (localCheckpoint calls toRdd), which is
    why operators compile AND materialize inside this scope.
    """
    with _scoped_conf(spark, {"spark.sql.adaptive.enabled": "false"}):
        yield
