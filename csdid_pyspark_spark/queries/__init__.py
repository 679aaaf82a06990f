"""Named, oracle-verifiable query surface (SURVEY.md §2 [Q] inventory).

Each query is a callable ``(spark, sf_dir) -> DataFrame``; ORACLES maps
the same name to an equivalent ANSI-SQL string runnable by DuckDB over
the same parquet tables. Queries without an oracle entry (genuinely
non-SQL-expressible: LSH candidate generation, streaming) get the
driver's weaker rows-only check.

Float discipline: sums of money-like columns go through an exact
DECIMAL accumulation then a final cast to DOUBLE, so Spark and DuckDB
produce bit-identical results regardless of partial-aggregation order;
remaining double aggregates are rounded at a digit count where the
~1e-13 relative fp-order noise cannot cross a rounding boundary.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from csdid_pyspark_spark.queries import did_events, llm_ops, relational

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for mod in (relational, llm_ops, did_events):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

__all__ = ["QUERIES", "ORACLES"]
