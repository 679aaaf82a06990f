"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full named query surface implemented in
``csdid_pyspark_spark.queries`` (SURVEY.md §2 [Q] inventory plus the
LLM-data-pipeline operators). Queries without an oracle entry are
genuinely non-SQL-expressible (LSH candidate generation) and take the
driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from csdid_pyspark_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Callaway-Sant'Anna ATT(g,t) over the panel derived
    from the events table at sf0.001."""
    return QUERIES["did_attgt_nevertreated"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
