"""S1 parity: the CSV ingestion path (the reference's only input
format, usage.ipynb cell 2) must produce identical estimates to the
parquet path."""

from __future__ import annotations

import numpy as np

from csdid_pyspark_spark.did import ATTgt
from csdid_pyspark_spark.sources.tables import load_panel_csv
from tests.test_did_parity import make_panel_dgp


def test_csv_roundtrip_estimation(spark, tmp_path):
    pdf = make_panel_dgp(n_units=150, periods=(1, 2, 3), cohorts=(0, 2, 3), seed=33)
    csv_dir = str(tmp_path / "panel_csv")
    spark.createDataFrame(pdf).write.mode("overwrite").option("header", "true").csv(csv_dir)

    from_csv = load_panel_csv(spark, csv_dir)
    assert dict(from_csv.dtypes)["Y"] == "double"  # inferSchema worked

    a = ATTgt(from_csv, "Y", "period", "id", "G", allow_unbalanced_panel=False)
    t_csv = a.fit(est_method="reg")
    b = ATTgt(spark.createDataFrame(pdf), "Y", "period", "id", "G", allow_unbalanced_panel=False)
    t_mem = b.fit(est_method="reg")
    assert np.allclose(t_csv["att"], t_mem["att"], atol=1e-9)
    assert np.allclose(t_csv["se"], t_mem["se"], rtol=1e-9)


def test_json_orc_roundtrip(spark, tmp_path):
    """JSON-lines and ORC sinks/sources preserve values and schema; the
    JSON reader honors an explicit DDL schema (no inference pass)."""
    from pyspark.sql import functions as F

    from csdid_pyspark_spark.sources.sinks import write_json, write_orc
    from csdid_pyspark_spark.sources.tables import load_json, load_orc, load_table

    base = (
        load_table(spark, "/root/testdata/sf0.001", "customer")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("bal"))
        .orderBy("c_custkey")
    )
    want = [tuple(r) for r in base.collect()]

    jp, op = str(tmp_path / "j"), str(tmp_path / "o")
    write_json(base, jp)
    write_orc(base, op)
    got_j = [
        tuple(r)
        for r in load_json(spark, jp, schema="c_custkey bigint, c_name string, bal double")
        .orderBy("c_custkey")
        .collect()
    ]
    got_o = [tuple(r) for r in load_orc(spark, op).orderBy("c_custkey").collect()]
    assert got_j == want
    assert got_o == want
    assert load_orc(spark, op).schema == base.schema

# Slow tier: deselected by the default `-m "not slow"` (pytest.ini) so the
# driver's time-budgeted gate runs the fast product surfaces; run everything
# with `python -m pytest tests/ -m "slow or not slow"` (round-close practice).
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
