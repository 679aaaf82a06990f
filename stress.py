"""Scale rehearsal: the README's 4M-row measurement, reproducible.

Synthesizes a 200k-unit × 20-period staggered-adoption panel (8 cohorts,
known dynamic treatment effects, one confounding covariate) entirely
executor-side (no driver materialization), runs the doubly-robust fit +
dynamic event-study aggregation, and prints one JSON line with wall
times and max |ATT(g,t) − truth|.

DGP: cohort g treated from period g with effect tau·(t − g + 1);
y_it = unit_fe + 0.5·x_i + 0.1·t + effect + N(0,1) noise. x shifts
cohort assignment so the unadjusted contrast is biased — the DR kernel
must actually use the covariate.

Usage: python stress.py [n_units] [n_periods]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from csdid_pyspark_spark.did import ATTgt
from csdid_pyspark_spark.session import get_spark

TAU = 0.1


def synth_panel(spark, n_units: int, n_periods: int):
    cohorts = [0] + list(range(4, n_periods, 2))  # 0 = never treated
    u = spark.range(n_units).select(
        F.col("id"),
        # deterministic unit covariate and noise seeds (no rand() — runs
        # are bit-identical and partition-count independent)
        (F.pmod(F.xxhash64("id"), 1000) / 1000.0 - 0.5).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit("fe")), 1000) / 500.0 - 1.0).alias("fe"),
    )
    # covariate-shifted cohort assignment: high-x units adopt earlier
    k = len(cohorts)
    gidx = F.pmod(F.xxhash64("id", F.lit("g")) + (F.col("x") * 6).cast("long"), k)
    u = u.withColumn("g", F.element_at(F.array(*[F.lit(c) for c in cohorts]), gidx.cast("int") + 1))
    t = spark.range(1, n_periods + 1).select(F.col("id").alias("t"))
    noise = F.pmod(F.xxhash64("id", "t"), 10000) / 10000.0
    eff = F.when(
        (F.col("g") > 0) & (F.col("t") >= F.col("g")),
        TAU * (F.col("t") - F.col("g") + 1),
    ).otherwise(0.0)
    return (
        u.crossJoin(t)
        .select(
            "id",
            F.col("t").cast("int").alias("t"),
            F.col("g").cast("int").alias("g"),
            "x",
            (
                F.col("fe")
                + 0.5 * F.col("x")
                + 0.1 * F.col("t")
                + eff
                + (noise - 0.5) * 2.0
            ).alias("y"),
        )
    )


def main() -> None:
    n_units = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_periods = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("csdid-pyspark-stress")
    spark.sparkContext.setLogLevel("ERROR")

    panel = synth_panel(spark, n_units, n_periods).persist()
    n_rows = panel.count()

    t0 = time.perf_counter()
    est = ATTgt(
        panel,
        yname="y", tname="t", idname="id", gname="g",
        xfmla="y ~ x", panel=True, allow_unbalanced_panel=False,
    )
    table = est.fit(est_method="dr")
    fit_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    dyn = est.compute_aggte("dynamic")
    agg_s = time.perf_counter() - t0

    post = table[table["post"] == 1].dropna(subset=["att"])
    truth = TAU * (post["t"] - post["g"] + 1)
    max_err = float((post["att"] - truth).abs().max())

    print(
        json.dumps(
            {
                "metric": "stress_4m_panel",
                "rows": n_rows,
                "cells": int(len(table)),
                "event_times": len(dyn.egt),
                "fit_dr_sec": round(fit_s, 1),
                "aggte_dynamic_sec": round(agg_s, 1),
                "max_abs_att_error": round(max_err, 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
