"""Rambachan-Roth "Honest DiD" sensitivity bounds (Rambachan & Roth
2023, "A More Credible Approach to Parallel Trends", Review of Economic
Studies 90(5)) under the RELATIVE-MAGNITUDES restriction Δ^RM(M̄) and
the SMOOTHNESS restriction Δ^SD(M).

The referee question after a pre-trend test passes is "how wrong could
parallel trends be before the conclusion flips?". RR's Δ^RM answer:
allow the post-period differential trend to drift, per period, by at
most M̄ times the LARGEST observed pre-period violation. With the
event-study profile normalized to the e = -1 baseline (δ_{-1} = 0),
the post-period violation after e+1 steps is bounded by
(e+1)·M̄·s_pre where

    s_pre = max over consecutive observed pre event times
            |β_t − β_{t-1}|          (β_{-1} ≡ 0)

so the IDENTIFIED SET for the causal effect at event time e ≥ 0 is

    [β̂_e − (e+1)·M̄·s_pre,  β̂_e + (e+1)·M̄·s_pre]

and a confidence interval for the PARTIALLY identified effect pads
each end with z·se_e. Simplifications vs RR's exact procedures, stated
so the caller knows what they get: s_pre is the PLUG-IN maximum of the
estimated pre-period slopes (RR's FLCI/conditional-hybrid procedures
also account for noise in the pre coefficients), and the padding uses
the plain normal quantile on both ends (conservative for an interval
bound in the Imbens-Manski sense when the set has positive width).
M̄ = 0 reproduces the standard pointwise CI; the smallest grid M̄
whose CI covers 0 is the reported "breakdown" sensitivity.

Scale shape: pure RESULT-SIZED algebra — the input is an event-study
profile (|E| rows) that already carries the data-scale work (cell
aggregation + influence SEs); everything here is window/join/cross
operations on frames of a few dozen rows, executed declaratively so
the same code serves any profile source (SA, CS dynamic, stacked).

Reference scope: the reference package (d2cml-ai/csdid-pyspark) has no
sensitivity-analysis path; built from the published method.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# z_{0.975}: fixed literal so Spark and the SQL oracle feed identical
# doubles into identical arithmetic
Z975 = 1.959964


def honest_bounds_frame(
    profile: DataFrame,
    mbars: tuple[float, ...] = (0.0, 0.5, 1.0, 1.5, 2.0),
    att_col: str = "att_iw",
    se_col: str = "se",
    z: float = Z975,
) -> DataFrame:
    """Δ^RM(M̄) identified sets + padded CIs for every post event time
    of an event-study ``profile`` — a DataFrame with columns
    (e, ``att_col``, ``se_col``), e = -1 omitted (the baseline).

    Output: (e, mbar, att, set_lo, set_hi, ci_lo, ci_hi) for each
    e ≥ 0 × M̄ in ``mbars``, rounded 6dp, ordered (e, mbar).

    Raises (declaratively) when the profile has no pre-period steps to
    calibrate s_pre from — Δ^RM is meaningless without an observed
    pre-trend magnitude."""
    spark = profile.sparkSession
    prof = profile.select(
        F.col("e").cast("int").alias("e"),
        F.col(att_col).cast("double").alias("att"),
        F.col(se_col).cast("double").alias("se"),
    ).unionByName(
        spark.createDataFrame([(-1, 0.0, 0.0)], "e int, att double, se double")
    )
    # consecutive observed pre-period slopes (β_{-1} ≡ 0 included) via
    # a tiny self-join on e-1 — no ordered window, so no single-
    # reducer exchange even appears in the plan
    pre = prof.filter(F.col("e") <= -1)
    steps = pre.alias("t").join(
        F.broadcast(
            pre.select(
                F.col("e").alias("e_prev"), F.col("att").alias("att_prev")
            )
        ),
        F.col("e_prev") == F.col("e") - 1,
    ).select(F.abs(F.col("att") - F.col("att_prev")).alias("step"))
    s_pre = steps.agg(F.max("step").alias("s_pre"))
    guard = F.when(
        F.col("s_pre").isNull(),
        F.raise_error(
            F.lit(
                "honest_bounds_frame: no consecutive pre-period event-"
                "study coefficients to calibrate the relative-magnitudes "
                "restriction from (need at least e = -2 observed)"
            )
        ),
    ).otherwise(F.col("s_pre"))
    grid = spark.createDataFrame([(float(m),) for m in mbars], "mbar double")
    width = (F.col("e") + 1) * F.col("mbar") * guard
    return (
        prof.filter(F.col("e") >= 0)
        .crossJoin(F.broadcast(s_pre))
        .crossJoin(F.broadcast(grid))
        .select(
            "e",
            "mbar",
            F.round("att", 6).alias("att"),
            F.round(F.col("att") - width, 6).alias("set_lo"),
            F.round(F.col("att") + width, 6).alias("set_hi"),
            F.round(F.col("att") - width - F.lit(z) * F.col("se"), 6).alias("ci_lo"),
            F.round(F.col("att") + width + F.lit(z) * F.col("se"), 6).alias("ci_hi"),
        )
        .orderBy("e", "mbar")
    )


def honest_smoothness_frame(
    profile: DataFrame,
    mbars: tuple[float, ...] = (0.0, 0.5, 1.0, 1.5, 2.0),
    att_col: str = "att_iw",
    se_col: str = "se",
    z: float = Z975,
) -> DataFrame:
    """Δ^SD(M) identified sets + padded CIs for every post event time
    of an event-study ``profile`` (columns e, ``att_col``,
    ``se_col``; e = -1 is the omitted baseline).

    Δ^SD bounds the SECOND DIFFERENCE of the differential trend:
    |δ_{t+1} − 2δ_t + δ_{t−1}| ≤ M. With δ_{-1} ≡ 0 and the pre-period
    δ's plugged in from the estimated pre coefficients, the slope
    entering the post period is s_last = β_{-1} − β_{-2} = −β_{-2} and
    each subsequent per-period slope can drift by at most M more, so
    the bias at event time e ≥ 0 lies in

        (e+1)·s_last  ±  M·(e+1)(e+2)/2

    and the identified set for the causal effect is β̂_e minus that
    interval. M = 0 is the LINEAR-EXTRAPOLATION debiased estimate (a
    point, unlike Δ^RM's M̄ = 0 which is the raw pointwise estimate) —
    Δ^SD(0) says "trends may differ but only linearly". M is
    self-calibrated as mbar × c_pre where c_pre is the largest OBSERVED
    pre-period second difference |β_{t+1} − 2β_t + β_{t−1}| (t+1 ≤ −1,
    β_{-1} ≡ 0), mirroring Δ^RM's s_pre plug-in: mbar = 1 allows
    exactly as much post-period curvature per period as the worst
    observed pre-period curvature. Plug-in simplifications (estimated
    pre coefficients treated as δ_pre; plain z padding) are the same
    ones documented on :func:`honest_bounds_frame`.

    Output: (e, mbar, att, set_lo, set_hi, ci_lo, ci_hi), rounded 6dp,
    ordered (e, mbar). Raises declaratively when fewer than two
    consecutive pre-period slopes exist (nothing to calibrate c_pre —
    Δ^SD needs curvature evidence, one step more than Δ^RM).

    Scale shape: identical to :func:`honest_bounds_frame` — pure
    result-sized algebra over a |E|-row profile; every join input is
    broadcast."""
    spark = profile.sparkSession
    prof = profile.select(
        F.col("e").cast("int").alias("e"),
        F.col(att_col).cast("double").alias("att"),
        F.col(se_col).cast("double").alias("se"),
    ).unionByName(
        spark.createDataFrame([(-1, 0.0, 0.0)], "e int, att double, se double")
    )
    pre = prof.filter(F.col("e") <= -1)
    # per-event-time pre slopes β_e − β_{e−1} via an e−1 self-join
    slopes = pre.alias("t").join(
        F.broadcast(
            pre.select(
                F.col("e").alias("e_prev"), F.col("att").alias("att_prev")
            )
        ),
        F.col("e_prev") == F.col("e") - 1,
    ).select("e", (F.col("att") - F.col("att_prev")).alias("slope"))
    # the slope entering the post period: β_{-1} − β_{-2}
    s_last_agg = slopes.filter(F.col("e") == -1).agg(
        F.max("slope").alias("s_last")
    )
    s_last = F.when(
        F.col("s_last").isNull(),
        F.raise_error(
            F.lit(
                "honest_smoothness_frame: e = -2 not observed — no "
                "boundary slope to extrapolate the differential trend "
                "from under the smoothness restriction"
            )
        ),
    ).otherwise(F.col("s_last"))
    # observed pre-period curvature: consecutive-slope differences
    curv = slopes.alias("s").join(
        F.broadcast(
            slopes.select(
                F.col("e").alias("e_prev2"), F.col("slope").alias("slope_prev")
            )
        ),
        F.col("e_prev2") == F.col("e") - 1,
    ).select(F.abs(F.col("slope") - F.col("slope_prev")).alias("curv"))
    c_pre_agg = curv.agg(F.max("curv").alias("c_pre"))
    c_pre = F.when(
        F.col("c_pre").isNull(),
        F.raise_error(
            F.lit(
                "honest_smoothness_frame: fewer than two consecutive "
                "pre-period slopes (need e = -3 observed, or e = -2 "
                "plus the baseline) — no observed curvature to "
                "calibrate the smoothness bound M from"
            )
        ),
    ).otherwise(F.col("c_pre"))
    grid = spark.createDataFrame([(float(m),) for m in mbars], "mbar double")
    shift = (F.col("e") + 1) * s_last
    width = (
        F.col("mbar")
        * c_pre
        * (((F.col("e") + 1) * (F.col("e") + 2)).cast("double") / F.lit(2.0))
    )
    return (
        prof.filter(F.col("e") >= 0)
        .crossJoin(F.broadcast(s_last_agg))
        .crossJoin(F.broadcast(c_pre_agg))
        .crossJoin(F.broadcast(grid))
        .select(
            "e",
            "mbar",
            F.round("att", 6).alias("att"),
            F.round(F.col("att") - shift - width, 6).alias("set_lo"),
            F.round(F.col("att") - shift + width, 6).alias("set_hi"),
            F.round(
                F.col("att") - shift - width - F.lit(z) * F.col("se"), 6
            ).alias("ci_lo"),
            F.round(
                F.col("att") - shift + width + F.lit(z) * F.col("se"), 6
            ).alias("ci_hi"),
        )
        .orderBy("e", "mbar")
    )
