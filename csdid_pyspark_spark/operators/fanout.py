"""Fan-out parallelism guard.

Scan parallelism (layout compaction in sources/tables.py) fixes big
tables; it cannot help the OTHER pathology: a physically tiny input
(5k documents, half an MB) whose downstream operator fans out 100-1000x
per row (token/shingle explodes). The explode pipelines into the scan
stage, so a 2-partition input runs the entire fan-out on 2 cores.

:func:`widen_fanout` repartitions such an input UP to the session's
core count before the fan-out. The shuffle moves only the tiny
pre-explosion rows (negligible), and it is a strict no-op whenever the
input already has at least core-count partitions — i.e. at real scale,
where the table itself is large, nothing changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_fanout(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` (default: the session's
    defaultParallelism) when it currently has fewer partitions; return
    it unchanged otherwise. Use immediately before explode-heavy
    per-row work on physically small inputs."""
    t = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < t:
        return df.repartition(t)
    return df
