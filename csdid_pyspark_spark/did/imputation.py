"""Borusyak-Jaravel-Spiess imputation estimator (Borusyak, Jaravel &
Spiess 2024, "Revisiting Event-Study Designs: Robust and Efficient
Estimation", Review of Economic Studies 91(6)).

The third pillar of the modern staggered-DiD triad next to
Callaway-Sant'Anna (did/attgt.py) and Sun-Abraham
(did/robust_cells.py): fit the two-way-fixed-effects model

    y_it = alpha_i + lambda_t + eps_it

on UNTREATED observations only (never-treated units, and not-yet-
treated periods of eventually-treated units), impute the untreated
potential outcome y_it(0) = alpha_hat_i + lambda_hat_t for every
treated observation, and average tau_it = y_it - y_hat_it(0) by event
time. Because the first stage never sees treated outcomes, the
estimator is immune to the negative-weighting/contamination problem of
dynamic TWFE regressions, and it is the efficient linear unbiased
estimator under homoskedasticity (BJS Thm 3).

Reference scope: the reference package (d2cml-ai/csdid-pyspark) has no
imputation path; built from the published method.

Scale design — the panel is the data-scale object, the fitted problem
is not. The naive distributed approach (alternating demeaning until
convergence) costs a shuffle PER ITERATION; this implementation gets
the EXACT least-squares solution in a fixed number of passes by
absorbing the unit effects analytically:

1. ONE groupBy(id) over untreated observations: ybar_i, n_i, and the
   unit's untreated period set U_i (|U_i| <= T, a bounded array).
2. Within-unit demeaning reduces the normal equations for lambda to a
   T x T system whose components are ONE map-side-combinable
   aggregation each:  X'X[s,t] = N_t * 1{s=t} - W_st  with
   W_st = sum_i 1{s,t in U_i} / n_i  (a bounded T^2-pair explode of
   the per-unit period sets), and  X'y[t] = sum_{untreated, t}
   (y_it - ybar_i)  (the cross term vanishes because within-unit
   residuals sum to zero over U_i).
3. The (T-1) x (T-1) solve (baseline = earliest untreated period,
   lambda there = 0) happens driver-side on a numpy matrix of a few
   dozen entries — executor->driver traffic is O(T^2) floats,
   independent of rows, the same contract as the estimator's Gram
   passes (did/linalg.py).
4. lambda_hat broadcasts back as a literal MAP; alpha_hat_i =
   ybar_i - mean_{s in U_i} lambda_hat_s is a higher-order-function
   fold over the stored period set (no extra shuffle), and the
   imputation join is one shuffle of treated rows keyed by id.

Total: two data-scale shuffles (groupBy id, treated-join id) plus
tiny-key aggregations. No Python row-UDFs; the only driver math is the
T x T solve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bjs_imputation_frame(
    panel: DataFrame,
    yname: str = "y",
    tname: str = "period",
    gname: str = "g",
    idname: str = "id",
) -> DataFrame:
    """BJS imputation event study: (e, att, n_obs) for every observed
    post event time e = period - g >= 0, att = mean over treated
    observations at e of y_it - (alpha_hat_i + lambda_hat_t), rounded
    6dp, ordered by e. Cohort convention: g = 0 marks never-treated
    units; g > 0 treats from period g onward.

    Raises when the design is not imputable (BJS's own precondition):
    a treated unit with NO untreated periods (alpha_i unidentified) or
    a treated period with NO untreated observations (lambda_t
    unidentified)."""
    import numpy as np

    p = panel.select(
        F.col(idname).alias("id"),
        F.col(gname).cast("long").alias("g"),
        F.col(tname).cast("int").alias("period"),
        F.col(yname).cast("double").alias("y"),
    )
    untreated = p.filter((F.col("g") == 0) | (F.col("period") < F.col("g")))
    treated = p.filter((F.col("g") > 0) & (F.col("period") >= F.col("g")))

    # -- pass 1: per-unit stats over untreated obs. Persisted: it is
    # re-read by the W-pair explode, the stats pass, and the imputation
    # join — without the persist each of those recomputes the groupBy
    # from the raw panel (observed: 3 extra data-scale passes).
    from csdid_pyspark_spark.cache import persist_rightsized, release_cache

    um, _ = persist_rightsized(
        untreated.groupBy("id").agg(
            F.avg("y").alias("ybar"),
            F.count("*").alias("n_i"),
            F.sort_array(F.collect_set("period")).alias("uperiods"),
        )
    )

    # -- pass 2 (ONE scan of the panel): per-period stats for the
    # lambda normal equations AND both imputability guards.
    # X'y[t] = sum_{untreated at t} (y - ybar_i); the within-unit
    # residual cross-term vanishes, see module docstring.
    untr = (F.col("g") == 0) | (F.col("period") < F.col("g"))
    stats_rows = (
        p.join(um.select("id", "ybar"), "id", "left")
        .groupBy("period")
        .agg(
            F.sum(F.when(untr, F.col("y") - F.col("ybar"))).alias("xty"),
            F.sum(F.when(untr, 1).otherwise(0)).alias("n_t"),
            F.sum(F.when(~untr, 1).otherwise(0)).alias("n_treated"),
            # treated row whose unit never appears untreated: ybar null
            F.sum(
                F.when(~untr & F.col("ybar").isNull(), 1).otherwise(0)
            ).alias("n_unanchored_rows"),
        )
        .collect()
    )
    # W_st = sum_i [s,t in U_i] / n_i via a bounded T^2 explode of the
    # per-unit period sets (scans only the persisted per-unit frame)
    pairs = um.select(
        F.explode(
            F.expr(
                "flatten(transform(uperiods, s -> "
                "transform(uperiods, t -> named_struct('s', s, 't', t))))"
            )
        ).alias("st"),
        (F.lit(1.0) / F.col("n_i")).alias("w"),
    )
    w_rows = (
        pairs.groupBy(F.col("st.s").alias("s"), F.col("st.t").alias("t"))
        .agg(F.sum("w").alias("w"))
        .collect()
    )

    # -- imputability guards (BJS preconditions), decided from the
    # already-collected per-period stats — the precise unit count runs
    # only on the error path
    xty_rows = [r for r in stats_rows if int(r["n_t"]) > 0]
    lam_periods = sorted(int(r["period"]) for r in xty_rows)
    missing_t = [
        int(r["period"]) for r in stats_rows
        if int(r["n_treated"]) > 0 and int(r["n_t"]) == 0
    ]
    if missing_t:
        release_cache(um)
        raise ValueError(
            f"bjs_imputation_frame: treated periods {sorted(missing_t)} "
            "have no untreated observations — lambda_t is unidentified "
            "there (need a never-treated or not-yet-treated unit in "
            "every treated period)."
        )
    if any(int(r["n_unanchored_rows"]) > 0 for r in stats_rows):
        n_unanchored = (
            treated.join(um.select("id"), "id", "left_anti")
            .select("id")
            .distinct()
            .count()
        )
        release_cache(um)
        raise ValueError(
            f"bjs_imputation_frame: {n_unanchored} treated unit(s) have "
            "no untreated (pre-treatment) periods — alpha_i is "
            "unidentified for them; BJS requires every treated unit to "
            "be observed untreated at least once."
        )

    # -- driver-side (T-1) x (T-1) solve, baseline = earliest period ---
    base = lam_periods[0]
    est = [t for t in lam_periods if t != base]
    idx = {t: k for k, t in enumerate(est)}
    T1 = len(est)
    A = np.zeros((T1, T1))
    b = np.zeros(T1)
    n_t = {int(r["period"]): float(r["n_t"]) for r in xty_rows}
    for r in xty_rows:
        t = int(r["period"])
        if t in idx:
            b[idx[t]] = float(r["xty"])
            A[idx[t], idx[t]] = n_t[t]
    for r in w_rows:
        s, t = int(r["s"]), int(r["t"])
        if s in idx and t in idx:
            A[idx[s], idx[t]] -= float(r["w"])
    lam = {base: 0.0}
    if T1:
        try:
            sol = np.linalg.solve(A, b)
        except np.linalg.LinAlgError as exc:
            raise ValueError(
                "bjs_imputation_frame: the lambda normal equations are "
                "singular — the untreated observations do not connect "
                "every period to the baseline through shared units "
                "(disconnected period blocks), so time effects are not "
                "jointly identified."
            ) from exc
        for t, k in idx.items():
            lam[t] = float(sol[k])

    # -- impute and aggregate by event time ----------------------------
    lam_map = F.create_map(
        *[F.lit(x) for t, v in sorted(lam.items()) for x in (t, v)]
    )
    alpha = (
        um.withColumn("lam_m", lam_map)
        .select(
            "id",
            (
                F.col("ybar")
                - F.expr(
                    "aggregate(uperiods, CAST(0.0 AS DOUBLE), "
                    "(acc, s) -> acc + lam_m[s]) / n_i"
                )
            ).alias("alpha"),
        )
    )
    tau = (
        treated.withColumn("lam_m", lam_map)
        .join(alpha, "id")
        .select(
            (F.col("period") - F.col("g")).cast("int").alias("e"),
            (
                F.col("y") - F.col("alpha") - F.expr("lam_m[period]")
            ).alias("tau"),
        )
    )
    result = (
        tau.groupBy("e")
        .agg(
            F.round(F.avg("tau"), 6).alias("att"),
            F.count("*").cast("bigint").alias("n_obs"),
        )
        .orderBy("e")
    )
    # caller releases the per-unit cache after the final action
    # (release_cache convention shared by the two-phase operators)
    result._two_phase_cache = [um]  # type: ignore[attr-defined]
    return result
