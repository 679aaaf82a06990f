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
