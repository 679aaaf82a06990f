"""Wooldridge extended TWFE / two-way Mundlak estimator (Wooldridge
2021, "Two-Way Fixed Effects, the Two-Way Mundlak Regression, and
Difference-in-Differences Estimators"; also Wooldridge 2023, The
Econometrics Journal 26(3)).

The pooled-OLS member of the staggered-DiD family: ONE saturated
regression

    y_it =  a_g · 1[G_i = g]            (cohort effects, all cohorts)
          + l_t · 1[period = t]         (period effects, first omitted)
          + tau_gt · 1[G_i = g, t >= g] (one cell per treated (g,t))
          + eps_it

whose interaction coefficients tau_gt are the ATT(g,t) estimates.
Saturation is what makes it robust: unlike the classic single-dummy
TWFE regression (the negative-weights/contamination pathology), every
treated (g,t) cell gets its own coefficient, so no cell's effect
contaminates another's. Wooldridge shows the POLS estimates coincide
with the two-way Mundlak regression and — on balanced panels without
covariates — are numerically close kin of the imputation estimator
(they share the untreated-observations information set).

Reference scope: the reference package (d2cml-ai/csdid-pyspark) has no
pooled-regression path; built from the published method.

Scale design: the regression is p x p with
p = n_cohorts + (T - 1) + n_treated_cells (a few dozen), so the whole
fit is the engine's standard Gram contract (did/linalg.py): ONE
map-side-combinable aggregation produces the p(p+1)/2 + p Gram sums —
O(p^2) scalars to the driver regardless of panel rows — and the
O(p^3) solve happens driver-side. Design-matrix columns are indicator
EXPRESSIONS compiled into the aggregation; no design matrix is ever
materialized. Two passes total: a tiny distinct-(g,t) discovery agg,
then the Gram pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def etwfe_frame(
    panel: DataFrame,
    yname: str = "y",
    tname: str = "period",
    gname: str = "g",
    idname: str = "id",
) -> DataFrame:
    """ETWFE ATT(g,t) table: (g, t, e, att, n_cell) for every treated
    cell (g > 0, t >= g), att = tau_gt from the saturated pooled OLS,
    rounded 6dp, ordered (g, t). Cohort convention: g = 0 never
    treated.

    Raises when no untreated observations exist (the cohort/period
    effects would be unidentified) or when the design is collinear
    (e.g. a cohort observed ONLY in treated periods)."""
    import numpy as np

    from csdid_pyspark_spark.did.linalg import gram_aggs, unpack_gram

    p0 = panel.select(
        F.col(gname).cast("long").alias("g"),
        F.col(tname).cast("int").alias("period"),
        F.col(yname).cast("double").alias("y"),
    )
    # discovery pass: cohorts, periods, treated cells + counts (tiny)
    cells = (
        p0.groupBy("g", "period").count().collect()
    )
    cohorts = sorted({int(r["g"]) for r in cells})
    periods = sorted({int(r["period"]) for r in cells})
    treated_cells = sorted(
        (int(r["g"]), int(r["period"]))
        for r in cells
        if int(r["g"]) > 0 and int(r["period"]) >= int(r["g"])
    )
    n_cell = {
        (int(r["g"]), int(r["period"])): int(r["count"]) for r in cells
    }
    if not any(
        g == 0 or t < g for (g, t) in ((int(r["g"]), int(r["period"])) for r in cells)
    ):
        raise ValueError(
            "etwfe_frame: no untreated observations — cohort and period "
            "effects are unidentified."
        )

    # design columns: cohort dummies (ALL cohorts — no intercept, so
    # they jointly absorb it), period dummies (first period omitted),
    # one interaction per treated cell
    xcols: list = []
    names: list[str] = []
    for g in cohorts:
        xcols.append(F.when(F.col("g") == g, 1.0).otherwise(0.0))
        names.append(f"coh_{g}")
    for t in periods[1:]:
        xcols.append(F.when(F.col("period") == t, 1.0).otherwise(0.0))
        names.append(f"per_{t}")
    cell_start = len(xcols)
    for g, t in treated_cells:
        xcols.append(
            F.when((F.col("g") == g) & (F.col("period") == t), 1.0).otherwise(0.0)
        )
        names.append(f"tau_{g}_{t}")
    pdim = len(xcols)

    X = p0.select(
        "y", *[c.alias(f"x{i}") for i, c in enumerate(xcols)]
    )
    row = X.agg(
        *gram_aggs("e", F.lit(1.0), [f"x{i}" for i in range(pdim)], F.col("y"))
    ).collect()[0]
    A, b = unpack_gram(row, "e", pdim)
    try:
        beta = np.linalg.solve(A, b)
    except np.linalg.LinAlgError as exc:
        raise ValueError(
            "etwfe_frame: the saturated design is collinear — some "
            "cohort or period is observed only inside treated cells, so "
            "its effect cannot be separated from the cell interactions."
        ) from exc

    out = [
        (
            int(g),
            int(t),
            int(t - g),
            round(float(beta[cell_start + k]), 6),
            n_cell[(g, t)],
        )
        for k, (g, t) in enumerate(treated_cells)
    ]
    return panel.sparkSession.createDataFrame(
        out, "g int, t int, e int, att double, n_cell bigint"
    ).orderBy("g", "t")
