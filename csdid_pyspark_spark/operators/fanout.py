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

import warnings

from pyspark.sql import DataFrame

_probe_warned = False


def _scan_only(df: DataFrame) -> bool:
    """True when ``df``'s plan is exchange-free (scan + narrow ops
    only), which makes ``df.rdd.getNumPartitions()`` a pure metadata
    read. The check reads the non-adaptive PHYSICAL plan (sparkPlan):
    building it runs the analyzer/optimizer/planner but executes no
    job, and every shuffle or broadcast appears in it as an
    ``*Exchange`` node — a frame containing one already had its
    partitioning set by that shuffle (shuffle.partitions / AQE
    coalesce), so widening is pointless, and calling ``.rdd`` on it
    under AQE would materialize upstream query stages EAGERLY (silent
    execution at plan-build time)."""
    try:
        plan = df._jdf.queryExecution().sparkPlan().toString()
    except Exception as exc:  # private-API drift must be OBSERVABLE:
        # returning False silently turns widen_fanout into a permanent
        # no-op (explode parallelism collapses with no signal), so warn
        # once per process before degrading.
        global _probe_warned
        if not _probe_warned:
            _probe_warned = True
            warnings.warn(
                "widen_fanout plan probe failed "
                f"({type(exc).__name__}: {exc}); fan-out widening is "
                "DISABLED for this process — explode-heavy operators on "
                "small inputs will run at scan parallelism. The probe "
                "uses the private _jdf.queryExecution() API; check the "
                "installed PySpark version.",
                RuntimeWarning,
                stacklevel=3,
            )
        return False  # can't tell -> never risk eager .rdd
    return "Exchange" not in plan


def widen_fanout(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` (default: the session's
    defaultParallelism) when it is a scan-only frame with fewer
    partitions; return it unchanged otherwise. Use immediately before
    explode-heavy per-row work on physically small inputs.

    PRECONDITION (enforced, not just documented): the check only runs
    on exchange-free plans. A frame that already contains a shuffle
    (join/agg/repartition/...) is returned unchanged — its width was
    set by that shuffle — and its ``.rdd`` is never touched, because
    under AQE ``.rdd`` on a shuffled plan materializes query stages
    eagerly."""
    if not _scan_only(df):
        return df
    t = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < t:
        return df.repartition(t)
    return df
