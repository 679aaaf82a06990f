"""Golden VALUES-oracle drift gate.

``queries/golden_values.py`` pins the sf0.01 output of the 7
seeded-deterministic queries that have no ANSI-SQL oracle. Two layers
catch drift:

- tests/test_oracle_queries.py already re-runs each query live and
  compares values against the pinned literal through the normal hash
  gate (the same comparison the external driver performs);
- this module REGENERATES the oracle SQL from the live output and
  string-diffs it against the committed text, which is strictly
  stricter (bit-exact float reprs, exact row order) and points straight
  at the regeneration command when it fires.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from gen_golden_oracles import GOLDEN_NAMES, GOLDEN_SF_DIR, values_oracle

from csdid_pyspark_spark.queries import ALL_ORACLES as ORACLES
from csdid_pyspark_spark.queries import ALL_QUERIES as QUERIES
from csdid_pyspark_spark.queries.golden_values import GOLDEN_ORACLES


def test_golden_covers_all_rows_only_queries():
    """Every registered query has SOME oracle: with the goldens merged,
    the rows-only category is empty."""
    assert set(GOLDEN_NAMES) == set(GOLDEN_ORACLES)
    missing = set(QUERIES) - set(ORACLES)
    assert not missing, f"queries without any oracle: {sorted(missing)}"


@pytest.mark.parametrize("name", sorted(GOLDEN_NAMES))
def test_golden_oracle_matches_regenerated(name, spark):
    df = QUERIES[name](spark, GOLDEN_SF_DIR)
    regenerated = values_oracle(df)
    committed = GOLDEN_ORACLES[name].strip()
    assert regenerated == committed, (
        f"{name}: live output drifted from the pinned golden oracle — if the "
        f"change is intentional, rerun `python tools/gen_golden_oracles.py` "
        f"and commit the result"
    )

# Slow tier: deselected by the default `-m "not slow"` (pytest.ini) so the
# driver's time-budgeted gate runs the fast product surfaces; run everything
# with `python -m pytest tests/ -m "slow or not slow"` (round-close practice).
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
