"""Oracle-SQL output typing gate.

The external driver compares Spark and DuckDB results by rendering both
to pandas and hashing the string form. Two DuckDB result types break
that comparison even when values are semantically equal:

- ``HUGEINT`` (DuckDB's default for SUM over integers): pandas renders
  it as float64, so ``1435`` hashes as ``"1435.0"`` against Spark's
  ``"1435"``. Fix: ``CAST(SUM(...) AS BIGINT)`` in the oracle.
- list/array-typed columns: the driver's canonicalizer sorts the pandas
  frame and crashes on unhashable ``list`` cells. Fix: serialize the
  array (md5 of a joined rendering, or to_json) on BOTH engines.

This gate probes every registered oracle's output schema with DuckDB's
type planner (no execution beyond the bind, via ``LIMIT 0``) and fails
on either hazard, so a new oracle can't reintroduce the round-2 defect
class (5 red CORRECTNESS_r02 rows, all this bug).
"""

from __future__ import annotations

import pytest

from csdid_pyspark_spark.queries import ORACLES

FORBIDDEN = ("HUGEINT", "UHUGEINT")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_are_hashable(name, duck):
    rel = duck.sql(f"SELECT * FROM ({ORACLES[name]}) AS _probe LIMIT 0")
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        assert t not in FORBIDDEN, (
            f"{name}.{col} is {t}: pandas renders it as float64 and the "
            f"driver hash diverges — CAST(... AS BIGINT) in the oracle"
        )
        assert "[]" not in t and not t.startswith(("STRUCT", "MAP", "LIST")), (
            f"{name}.{col} is {t}: unhashable in pandas canonicalization — "
            f"serialize the value (md5/to_json) on both engines"
        )
