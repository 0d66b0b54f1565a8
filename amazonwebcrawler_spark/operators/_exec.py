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
    # (an AQE-off variant of this scope was prototyped and REJECTED —
    # static planning loses the tiny-side broadcasts and pays
    # 64-partition sort-merge exchanges; measured in OPTIMIZATION_r06.md)
    with _scoped_conf(
        spark, {"spark.sql.adaptive.coalescePartitions.enabled": "true"}
    ):
        yield
