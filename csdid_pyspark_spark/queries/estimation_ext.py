"""Round-6 estimation / warehouse extensions.

Capability classes the earlier modules didn't cover, each a named
oracle-checked query:

Estimators (robustness companions to the Callaway-Sant'Anna surface;
the reference — d2cml-ai/csdid-pyspark, ATTgt.py — implements none of
these):

* ``did_stacked_event`` — stacked event-study DiD (Cengiz, Dube,
  Lindner & Zipperer 2019): one clean-control stack per treated
  cohort, within-stack DiD vs the t = g-1 baseline, treated-count
  pooled.
* ``did_sunab_event`` — Sun-Abraham (2021) interaction-weighted
  event study: cohort-share-weighted CATT(g, e) against the fixed
  e = -1 baseline, leads and lags in one series.
* ``did_dcdh_effect`` — de Chaisemartin & D'Haultfœuille (2020)
  DID_M: switcher-weighted instantaneous effects, never comparing
  against an already-treated group.
* ``did_sunab_event_se`` — SA with plug-in influence-function SEs
  (per-unit ψ summed across cohorts BEFORE squaring — the shared-
  control covariance naive per-cell combinations drop).
* ``did_synth_control`` / ``did_synth_placebo`` — Abadie synthetic
  control gap series + in-space placebo inference (did/synth.py:
  distributed donor pre-screen, driver-side Frank-Wolfe).
* ``did_cic_qte`` — changes-in-changes quantile treatment effects
  (Athey & Imbens 2006) at the deciles, all selections exact integer
  order statistics through the two-phase global rank.
* ``did_ddd`` — triple difference (Olden & Moen 2022) with a
  deterministic eligibility segment.
* ``did_pretrend_power`` — minimal detectable pre-trend per cohort
  (the Roth 2022 "can the pre-test even see it" diagnostic).

Experimentation / uncertainty:

* ``events_conformal_interval`` — Mondrian split-conformal intervals
  (Lei et al. 2018): exact ceil((n+1)(1-alpha)) order-statistic
  quantile, held-out coverage.
* ``events_power_analysis`` — two-sample sizing per metric from
  6-dp-rounded moments (cross-engine-stable integer ceil).

Warehouse / lakehouse:

* ``cdc_apply_log`` / ``stream_cdc_apply`` (streaming_gate) —
  latest-wins CDC materialization with delete tombstones, batch window
  pass and applyInPandasWithState stream sharing one oracle.
* ``dim_point_in_time_join`` — SCD2 point-in-time enrichment as an
  AS-OF join (one shuffle), never a fact x versions range join.
* ``profile_table_columns`` — ANALYZE-style per-column statistics.
* ``events_watermark_profile`` — out-of-orderness profile for
  choosing a streaming watermark.

Sketches / retrieval:

* ``sketch_hll_intersection`` — HyperLogLog set algebra on a fully
  portable register construction (masked Knuth mix; rho via
  minimal-length ``bin()`` — bit-identical in Spark and DuckDB).
* ``sketch_join_size`` — self-join-size (F2) estimate from Count-Min
  counters (AMS; CM inner product) — the optimizer's join-blow-up
  statistic, integer-exact across engines.
* ``sim_retrieval_eval`` — recall@10 / MRR / nDCG of the int8
  retriever vs exact fp32 ground truth.
* ``sim_rank_fusion`` — reciprocal-rank fusion of heterogeneous
  rankers (Cormack et al. 2009).

All hot-path math is built-in JVM expressions (no Python UDFs); every
query has a DuckDB oracle below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csdid_pyspark_spark.queries.did_events import PANEL_CTE, panel_from_events
from csdid_pyspark_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# ---------------------------------------------------------------------------
# Stacked event-study DiD (Cengiz et al. 2019)
# ---------------------------------------------------------------------------

# Event window in event time e = t - g, baseline at e = -1. A unit is a
# CLEAN control for cohort g's stack iff it is never treated (g' = 0) or
# not yet treated by the end of the stack's window (g' > g + STACK_POST).
STACK_PRE = 2   # window start: e = -STACK_PRE
STACK_POST = 1  # window end:   e = +STACK_POST


def did_stacked_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stacked event-study estimate over the derived staggered panel.

    Per cohort g (one "stack"), per event time e in [-STACK_PRE,
    STACK_POST] excluding the e = -1 baseline: the within-stack DiD

        att_g(e) = mean(y_{g+e} - y_{g-1} | unit in cohort g)
                 - mean(y_{g+e} - y_{g-1} | clean control)

    then the pooled event-time series att(e) = sum_g n_g(e) att_g(e)
    / sum_g n_g(e) with treated-unit weights — the saturated-
    regression aggregate of Cengiz et al. (2019) without materializing
    the duplicated stack dataset: cells are a tiny broadcast dim, the
    only data-scale shuffle is the (id) self-join for the baseline
    outcome. e = -STACK_PRE rows are the placebo (pre-trend) check.
    """
    panel = panel_from_events(spark, sf_dir)
    periods = panel.select("period").distinct()
    pmin_pmax = periods.agg(
        F.min("period").alias("pmin"), F.max("period").alias("pmax")
    )
    cohorts = panel.filter(F.col("g") > 0).select("g").distinct()
    # cells: (g, e, t=g+e, base=g-1), only windows whose t and base are
    # observed periods. Cohorts x window offsets: a few dozen rows.
    offs = spark.range(-STACK_PRE, STACK_POST + 1).select(
        F.col("id").cast("int").alias("e")
    )
    cells = (
        cohorts.select(F.col("g").alias("cg"))
        .crossJoin(F.broadcast(offs))
        .crossJoin(F.broadcast(pmin_pmax))
        .filter(F.col("e") != -1)
        .select(
            "cg",
            "e",
            (F.col("cg") + F.col("e")).alias("t"),
            (F.col("cg") - 1).alias("base"),
            "pmin",
            "pmax",
        )
        .filter(
            (F.col("t") >= F.col("pmin"))
            & (F.col("t") <= F.col("pmax"))
            & (F.col("base") >= F.col("pmin"))
        )
        .drop("pmin", "pmax")
    )
    p1 = panel.select(
        F.col("id").alias("uid"), F.col("g").alias("gu"), "period", "y"
    )
    p0 = panel.select(
        F.col("id").alias("bid"),
        F.col("period").alias("bperiod"),
        F.col("y").alias("y0"),
    )
    dy = (
        p1.join(F.broadcast(cells), p1["period"] == cells["t"])
        .join(p0, (F.col("uid") == F.col("bid")) & (F.col("base") == F.col("bperiod")))
        .select(
            F.col("cg"),
            F.col("e"),
            (F.col("y") - F.col("y0")).alias("dy"),
            F.when(F.col("gu") == F.col("cg"), 1.0)
            .when(
                (F.col("gu") == 0) | (F.col("gu") > F.col("cg") + STACK_POST), 0.0
            )
            .alias("d"),  # null = not clean for this stack -> dropped
        )
        .filter(F.col("d").isNotNull())
    )
    per_stack = dy.groupBy("cg", "e").agg(
        (
            F.avg(F.when(F.col("d") == 1.0, F.col("dy")))
            - F.avg(F.when(F.col("d") == 0.0, F.col("dy")))
        ).alias("att_g"),
        F.sum(F.col("d")).alias("n_treat"),
    )
    return (
        per_stack.groupBy("e")
        .agg(
            F.round(
                F.sum(F.col("att_g") * F.col("n_treat")) / F.sum("n_treat"), 6
            ).alias("att"),
            F.sum("n_treat").cast("bigint").alias("n_treated"),
            F.count("*").cast("bigint").alias("n_stacks"),
        )
        .orderBy("e")
    )


DID_STACKED_SQL = f"""
WITH {PANEL_CTE},
bounds AS (SELECT MIN(period) AS pmin, MAX(period) AS pmax FROM panel),
cohorts AS (SELECT DISTINCT g FROM panel WHERE g > 0),
cells AS (
  SELECT c.g, o.e, c.g + o.e AS t, c.g - 1 AS base
  FROM cohorts c
  CROSS JOIN (SELECT UNNEST(range(-{STACK_PRE}, {STACK_POST} + 1)) AS e) o
  CROSS JOIN bounds b
  WHERE o.e <> -1 AND c.g + o.e BETWEEN b.pmin AND b.pmax
    AND c.g - 1 >= b.pmin
),
dy AS (
  SELECT c.g, c.e, p1.y - p0.y AS dy,
         CASE WHEN p1.g = c.g THEN 1.0
              WHEN p1.g = 0 OR p1.g > c.g + {STACK_POST} THEN 0.0
         END AS d
  FROM cells c
  JOIN panel p1 ON p1.period = c.t
  JOIN panel p0 ON p0.period = c.base AND p0.id = p1.id
  WHERE p1.g = c.g OR p1.g = 0 OR p1.g > c.g + {STACK_POST}
),
per_stack AS (
  SELECT g, e,
         AVG(CASE WHEN d = 1.0 THEN dy END)
           - AVG(CASE WHEN d = 0.0 THEN dy END) AS att_g,
         SUM(d) AS n_treat
  FROM dy GROUP BY g, e
)
SELECT e, ROUND(SUM(att_g * n_treat) / SUM(n_treat), 6) AS att,
       CAST(SUM(n_treat) AS BIGINT) AS n_treated,
       CAST(COUNT(*) AS BIGINT) AS n_stacks
FROM per_stack GROUP BY e ORDER BY e
"""

QUERIES["did_stacked_event"] = did_stacked_event
ORACLES["did_stacked_event"] = DID_STACKED_SQL

# ---------------------------------------------------------------------------
# Sun-Abraham interaction-weighted event study (Sun & Abraham 2021)
# ---------------------------------------------------------------------------


def did_sunab_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interaction-weighted event-study coefficients (Sun & Abraham
    2021, "Estimating dynamic treatment effects in event studies with
    heterogeneous treatment effects", J. Econometrics 225(2)).

    Their IW estimator saturates the event-study regression with
    cohort x relative-period interactions and then averages the
    cohort-specific coefficients with cohort-share weights; with a
    never-treated comparison group the interaction coefficients are
    numerically the 2x2 cell-mean DiDs against the FIXED e = -1
    baseline, so the whole estimator reduces to cell algebra:

        CATT(g, e) = [ybar_g(g+e) - ybar_g(g-1)]
                   - [ybar_nev(g+e) - ybar_nev(g-1)]
        IW(e)      = sum_g n_g * CATT(g, e) / sum_g n_g
                     over cohorts with period g+e observed

    Differences from the Callaway-Sant'Anna dynamic aggregation
    (did_aggte_dynamic): SA keeps the SAME baseline period g-1 for
    every event time including the leads (CS varies the pre-period
    base), reports the full lead/lag profile as one series, and
    weights by the cohort shares among cohorts contributing to each
    specific e (the "interaction weights" that fix TWFE's
    negative-weight contamination).

    Scale shape: ONE data-scale aggregation (the (g, period) cell
    means over the derived panel — map-side combinable); the cell
    table is |G|x|T| rows, so every downstream join is broadcast-tiny
    and the weighting is exact cell algebra, no per-unit second pass.
    Balanced panel (panel_from_events filters to complete units), so
    cell-mean differences equal the mean of per-unit differences.
    """
    from csdid_pyspark_spark.did.robust_cells import sunab_event_frame

    return sunab_event_frame(panel_from_events(spark, sf_dir))


DID_SUNAB_SQL = f"""
WITH {PANEL_CTE},
cb AS (
  SELECT g, period, AVG(y) AS ybar, COUNT(*) AS n FROM panel GROUP BY 1, 2
),
cells AS (
  SELECT CAST(tr.period - tr.g AS INT) AS e,
         (tr.ybar - tb.ybar) - (c.ybar - c0.ybar) AS catt,
         tr.n
  FROM cb tr
  JOIN cb tb ON tb.g = tr.g AND tb.period = tr.g - 1
  JOIN cb c  ON c.g = 0 AND c.period = tr.period
  JOIN cb c0 ON c0.g = 0 AND c0.period = tr.g - 1
  WHERE tr.g > 0 AND tr.period <> tr.g - 1
)
SELECT e, ROUND(SUM(catt * n) / SUM(n), 6) AS att_iw,
       CAST(SUM(n) AS BIGINT) AS n_treated,
       CAST(COUNT(*) AS BIGINT) AS n_cohorts
FROM cells GROUP BY e ORDER BY e
"""

QUERIES["did_sunab_event"] = did_sunab_event
ORACLES["did_sunab_event"] = DID_SUNAB_SQL

# ---------------------------------------------------------------------------
# de Chaisemartin & D'Haultfœuille DID_M (2020)
# ---------------------------------------------------------------------------


def did_dcdh_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DID_M instantaneous switcher effect (de Chaisemartin &
    D'Haultfœuille 2020, "Two-way fixed effects estimators with
    heterogeneous treatment effects", AER 110(9)) — the third estimator
    of the staggered-DiD referee trifecta next to Goodman-Bacon
    (did_bacon_decomposition) and Sun-Abraham (did_sunab_event).

    Per switch period t, compare the period-(t-1)→t outcome change of
    the groups that switch INTO treatment at t (here: cohort g = t)
    against the same change among groups still untreated at t (never
    treated or g > t — dCDH's stable-control requirement; in staggered
    adoption no group switches out, so the DID_- leg is empty):

        DID_+(t) = [ȳ_{g=t}(t) - ȳ_{g=t}(t-1)]
                 - Σ_c n_c [ȳ_c(t) - ȳ_c(t-1)] / Σ_c n_c

    and DID_M = Σ_t n_t DID_+(t) / Σ_t n_t with switching-unit
    weights (the overall row, t = -1). Unlike TWFE this never uses an
    already-treated group as a control, so it is robust to
    heterogeneous/dynamic effects by construction.

    Scale shape: identical to did_sunab_event — one data-scale
    (g, period) cell-mean aggregation, then broadcast-tiny cell
    algebra."""
    from csdid_pyspark_spark.did.robust_cells import dcdh_frame

    return dcdh_frame(panel_from_events(spark, sf_dir))


DID_DCDH_SQL = f"""
WITH {PANEL_CTE},
cb AS (
  SELECT g, period, AVG(y) AS ybar, COUNT(*) AS n FROM panel GROUP BY 1, 2
),
sw AS (
  SELECT CAST(t.g AS INT) AS t, t.ybar - tp.ybar AS dy_sw, t.n AS n_sw
  FROM cb t JOIN cb tp ON tp.g = t.g AND tp.period = t.g - 1
  WHERE t.g > 0 AND t.period = t.g
),
ctrl AS (
  SELECT s.t, SUM(c1.n * (c1.ybar - c0.ybar)) / SUM(c1.n) AS dy_ctrl
  FROM (SELECT DISTINCT t FROM sw) s
  JOIN cb c1 ON c1.period = s.t AND (c1.g = 0 OR c1.g > s.t)
  JOIN cb c0 ON c0.g = c1.g AND c0.period = s.t - 1
  GROUP BY s.t
),
per_t AS (
  SELECT sw.t, dy_sw - dy_ctrl AS did_plus, n_sw
  FROM sw JOIN ctrl ON ctrl.t = sw.t
)
SELECT t, ROUND(did_plus, 6) AS did_plus, CAST(n_sw AS BIGINT) AS n_switchers
FROM per_t
UNION ALL
SELECT -1, ROUND(SUM(did_plus * n_sw) / SUM(n_sw), 6),
       CAST(SUM(n_sw) AS BIGINT)
FROM per_t
ORDER BY t
"""

QUERIES["did_dcdh_effect"] = did_dcdh_effect
ORACLES["did_dcdh_effect"] = DID_DCDH_SQL


def did_dcdh_placebo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DID_M^pl — the dCDH placebo estimator
    (did/robust_cells.py::dcdh_placebo_frame; de Chaisemartin &
    D'Haultfœuille 2020 §3.3): the switchers' (t-2)→(t-1) change vs
    the SAME not-yet-treated control set DID_+(t) uses, i.e. the
    estimator's own pre-trend diagnostic. Completes the did_dcdh_effect
    pair the way did_pretrend_wald completes the CS estimator. Output
    mirrors did_dcdh_effect: per eligible switch period plus the
    switcher-weighted overall row at t = -1. Same scale shape: one
    (g, period) cell-mean aggregation, broadcast-tiny algebra after."""
    from csdid_pyspark_spark.did.robust_cells import dcdh_placebo_frame

    return dcdh_placebo_frame(panel_from_events(spark, sf_dir))


DID_DCDH_PLACEBO_SQL = f"""
WITH {PANEL_CTE},
cb AS (
  SELECT g, period, AVG(y) AS ybar, COUNT(*) AS n FROM panel GROUP BY 1, 2
),
sw AS (
  SELECT CAST(t.g AS INT) AS t, t.ybar - tp.ybar AS dy_sw_pl, t.n AS n_sw
  FROM cb t
  JOIN cb tp ON tp.g = t.g AND tp.period = t.g - 2
  WHERE t.g > 0 AND t.period = t.g - 1
    AND t.g - 2 >= (SELECT MIN(period) FROM cb)
),
ctrl AS (
  SELECT s.t, SUM(c1.n * (c1.ybar - c0.ybar)) / SUM(c1.n) AS dy_ctrl_pl
  FROM (SELECT DISTINCT t FROM sw) s
  JOIN cb c1 ON c1.period = s.t - 1 AND (c1.g = 0 OR c1.g > s.t)
  JOIN cb c0 ON c0.g = c1.g AND c0.period = s.t - 2
  GROUP BY s.t
),
per_t AS (
  SELECT sw.t, dy_sw_pl - dy_ctrl_pl AS did_placebo, n_sw
  FROM sw JOIN ctrl ON ctrl.t = sw.t
)
SELECT t, ROUND(did_placebo, 6) AS did_placebo,
       CAST(n_sw AS BIGINT) AS n_switchers
FROM per_t
UNION ALL
SELECT -1, ROUND(SUM(did_placebo * n_sw) / SUM(n_sw), 6),
       CAST(SUM(n_sw) AS BIGINT)
FROM per_t
ORDER BY t
"""

QUERIES["did_dcdh_placebo"] = did_dcdh_placebo
ORACLES["did_dcdh_placebo"] = DID_DCDH_PLACEBO_SQL

# ---------------------------------------------------------------------------
# CDC log application (latest-wins upsert + delete tombstones)
# ---------------------------------------------------------------------------


def cdc_apply_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a change-data-capture log to materialize current state —
    the MERGE INTO semantics of a lakehouse upsert sink. The events
    stream is read as a per-user op log ordered by (ts, event_id):
    'signup' = insert, 'click'/'view'/'purchase' = update (payload =
    value), 'error' = delete tombstone. Latest op wins; a user whose
    last op is a tombstone is absent from the materialized state.

    One window pass partitioned BY KEY (scales with keys, no global
    sort), then a filter on rank 1 — exactly how a distributed MERGE
    resolves multiple updates per key in one batch. Emits the
    surviving rows plus audit counts (ops seen, deletes seen).
    """
    e = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    log = e.select(
        "user_id", "ts", "event_id", op.alias("op"), F.col("value")
    )
    return cdc_state_frame(log).orderBy("user_id")


def cdc_state_frame(log: DataFrame) -> DataFrame:
    """Operator core of :func:`cdc_apply_log` over any
    (user_id, ts, event_id, op, value) log frame — also driven at
    rehearsal scale by ``stress.py cdc``.

    r11 shape: ONE map-side-combinable groupBy(key) — ``max_by`` over
    the (ts, event_id) op order picks the same winning row the old
    row_number window selected ((ts, event_id) is unique per key, so
    there are no ties), and the audit counters ride the same
    aggregation. The window form shuffled and SORTED every log row;
    the grouped form partial-aggregates per map task, so the exchange
    carries one partial state per (task, key) — at 100 TB the
    difference between moving the log and moving the state."""
    last = F.max_by(F.struct("op", "value"), F.struct("ts", "event_id"))
    agg = log.groupBy("user_id").agg(
        last.alias("_last"),
        F.count("*").alias("n_ops"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
    )
    return agg.filter(F.col("_last.op") != "D").select(
        "user_id",
        F.col("_last.op").alias("last_op"),
        F.round(F.col("_last.value"), 6).alias("current_value"),
        F.col("n_ops").cast("bigint").alias("n_ops"),
        F.col("n_deletes").cast("bigint").alias("n_deletes"),
    )


CDC_APPLY_SQL = """
WITH log AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D'
              ELSE 'U' END AS op,
         value
  FROM events
),
ranked AS (
  SELECT user_id, op, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_ops,
         SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id) AS n_deletes
  FROM log
)
SELECT user_id, op AS last_op, ROUND(value, 6) AS current_value,
       CAST(n_ops AS BIGINT) AS n_ops, CAST(n_deletes AS BIGINT) AS n_deletes
FROM ranked WHERE rn = 1 AND op <> 'D'
ORDER BY user_id
"""

QUERIES["cdc_apply_log"] = cdc_apply_log
ORACLES["cdc_apply_log"] = CDC_APPLY_SQL

# ---------------------------------------------------------------------------
# Split-conformal prediction intervals (Mondrian, per event_type)
# ---------------------------------------------------------------------------

CONF_ALPHA = 0.1  # target 90 % coverage

# 3-way user split from bits 29..30 of the masked Knuth product (the
# srm query's overflow-safe construction, pipeline_ext.srm_frame):
# bucket = (hash >> 29) % 4 -> {0,1} train, {2} calibrate, {3} test.
_SPLIT_EXPR = (
    "CAST(pmod(pmod(user_id, 2147483648) * 2654435761, 4294967296) "
    "div 536870912 AS BIGINT) % 4"
)
_SPLIT_SQL = (
    "CAST(((user_id % 2147483648) * 2654435761) % 4294967296 "
    "// 536870912 AS BIGINT) % 4"
)


def events_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian split-conformal interval per event_type over the event
    value metric. Users are hash-split (overflow-safe masked Knuth
    product) into train (buckets 0-1), calibration (2), test (3). The
    point predictor is the train-split per-type mean; the half-width
    qhat is the exact ceil((n_cal+1)(1-alpha))-th smallest calibration
    residual (finite-sample valid, Lei et al. 2018); coverage is the
    fraction of held-out test rows inside pred +- qhat.

    Scale shape: one groupBy for the predictor (broadcast back), one
    window partitioned by event_type over the calibration rows for
    the order statistic (per-group, not single-reducer), one
    broadcast join onto the test split. All data-scale work is
    map-side aggregation.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", F.expr(_SPLIT_EXPR).alias("bkt")
    )
    return conformal_frame(e).orderBy("event_type")


def conformal_frame(e: DataFrame) -> DataFrame:
    """Operator core of :func:`events_conformal_interval` over any
    (event_id, event_type, value, bkt) frame with bkt in {0,1} train /
    {2} calibration / {3} test — also driven at rehearsal scale by
    ``stress.py conformal``."""
    pred = (
        e.filter(F.col("bkt") <= 1)
        .groupBy("event_type")
        .agg(F.avg("value").alias("pred"))
    )
    cal = (
        e.filter(F.col("bkt") == 2)
        .join(F.broadcast(pred), "event_type")
        .select(
            "event_type",
            "event_id",
            F.abs(F.col("value") - F.col("pred")).alias("res"),
        )
    )
    # Per-group order statistic through the ONE-job grouped two-phase
    # rank — a Window.partitionBy(event_type) would push each whole
    # (data-scale) metric group through a single task at 100 TB.
    from csdid_pyspark_spark.cache import release_cache
    from csdid_pyspark_spark.operators.packing import grouped_rank

    gr = grouped_rank(cal, ["event_type"], ["res", "event_id"], rank_col="rn")
    counts = F.broadcast(
        cal.sparkSession.createDataFrame(
            [(k[0], int(v)) for k, v in gr.group_counts.items()],
            "event_type string, n_cal bigint",
        )
    )
    qhat = (
        gr.df.join(counts, "event_type")
        .filter(
            F.col("rn")
            == F.ceil((F.col("n_cal") + 1) * F.lit(1.0 - CONF_ALPHA)).cast("int")
        )
        .select("event_type", F.col("res").alias("qhat"), "n_cal")
    )
    # the 1-row-per-group qhat is consumed once below — materialize it
    # and release the ranked-calibration persist now
    qhat = F.broadcast(qhat.sparkSession.createDataFrame(qhat.collect(), qhat.schema))
    release_cache(gr.df)
    test = e.filter(F.col("bkt") == 3)
    return (
        test.join(F.broadcast(pred), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("pred"), 6).alias("pred"),
            F.round(F.first("qhat"), 6).alias("qhat"),
            F.round(F.first("pred") - F.first("qhat"), 6).alias("lo"),
            F.round(F.first("pred") + F.first("qhat"), 6).alias("hi"),
            F.first("n_cal").cast("bigint").alias("n_cal"),
            F.count("*").cast("bigint").alias("n_test"),
            F.round(
                F.avg(
                    (
                        F.abs(F.col("value") - F.col("pred")) <= F.col("qhat")
                    ).cast("double")
                ),
                6,
            ).alias("coverage"),
        )
    )


CONFORMAL_SQL = f"""
WITH tagged AS (
  SELECT event_id, event_type, value, {_SPLIT_SQL} AS bkt FROM events
),
pred AS (
  SELECT event_type, AVG(value) AS pred FROM tagged WHERE bkt <= 1 GROUP BY 1
),
cal AS (
  SELECT t.event_type, t.event_id, ABS(t.value - p.pred) AS res
  FROM tagged t JOIN pred p USING (event_type) WHERE t.bkt = 2
),
ranked AS (
  SELECT event_type, res,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY res, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_cal
  FROM cal
),
qhat AS (
  SELECT event_type, res AS qhat, n_cal FROM ranked
  WHERE rn = CAST(CEIL((n_cal + 1) * {1.0 - CONF_ALPHA!r}) AS INT)
)
SELECT t.event_type AS event_type,
       ROUND(MIN(p.pred), 6) AS pred,
       ROUND(MIN(q.qhat), 6) AS qhat,
       ROUND(MIN(p.pred) - MIN(q.qhat), 6) AS lo,
       ROUND(MIN(p.pred) + MIN(q.qhat), 6) AS hi,
       CAST(MIN(q.n_cal) AS BIGINT) AS n_cal,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       ROUND(AVG(CASE WHEN ABS(t.value - p.pred) <= q.qhat
                      THEN 1.0 ELSE 0.0 END), 6) AS coverage
FROM tagged t
JOIN pred p USING (event_type)
JOIN qhat q USING (event_type)
WHERE t.bkt = 3
GROUP BY 1 ORDER BY 1
"""

QUERIES["events_conformal_interval"] = events_conformal_interval
ORACLES["events_conformal_interval"] = CONFORMAL_SQL

# ---------------------------------------------------------------------------
# HyperLogLog set algebra (portable registers; union + intersection)
# ---------------------------------------------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 buckets
# alpha_m for m >= 128 (Flajolet et al. 2007); emitted as the same
# literal text into both engines so the constant parses identically.
HLL_ALPHA = repr(0.7213 / (1.0 + 1.079 / HLL_M))

# Portable 32-bit mix of a user id, overflow-safe in int64 on both
# engines (mask to 31 bits before each Knuth multiply — see
# pipeline_ext.srm_frame for the derivation): two multiply-xor rounds,
# then bucket = top 8 bits, w = low 24 bits, rho = leading-zero rank of
# w computed EXACTLY via the minimal binary string length (bin() is
# minimal-length in both Spark and DuckDB; no float log2 edge cases).
_HLL_SPARK = """
SELECT bucket, MAX(rho) AS rho FROM (
  SELECT CAST(h2 div 16777216 AS INT) AS bucket,
         CAST(CASE WHEN pmod(h2, 16777216) = 0 THEN 25
              ELSE 25 - length(bin(pmod(h2, 16777216))) END AS INT) AS rho
  FROM (
    SELECT pmod(pmod(h1 ^ (h1 div 32768), 2147483648) * 2654435761,
                4294967296) AS h2
    FROM (
      SELECT pmod(pmod(user_id, 2147483648) * 2654435761, 4294967296) AS h1
      FROM {src}
    )
  )
) GROUP BY bucket
"""
_HLL_DUCK = """
SELECT bucket, MAX(rho) AS rho FROM (
  SELECT CAST(h2 // 16777216 AS INT) AS bucket,
         CAST(CASE WHEN h2 % 16777216 = 0 THEN 25
              ELSE 25 - length(bin(h2 % 16777216)) END AS INT) AS rho
  FROM (
    SELECT (xor(h1, h1 // 32768) % 2147483648) * 2654435761 % 4294967296 AS h2
    FROM (
      SELECT (user_id % 2147483648) * 2654435761 % 4294967296 AS h1
      FROM {src}
    )
  )
) GROUP BY bucket
"""
# Estimate from a (bucket, rho) register table: raw HLL with the
# small-range linear-counting correction (both branches are pure
# arithmetic on integers + POWER(0.5, rho), which is exact in IEEE
# doubles, so the branch choice and value are cross-engine stable).
_HLL_EST = """
SELECT CASE WHEN CAST({alpha} AS DOUBLE) * {m} * {m} / s <= 2.5 * {m} AND zeros > 0
            THEN {m} * LN(CAST({m} AS DOUBLE) / zeros)
            ELSE CAST({alpha} AS DOUBLE) * {m} * {m} / s END AS est
FROM (
  SELECT SUM(POWER(0.5, rho)) + ({m} - COUNT(*)) AS s,
         {m} - COUNT(*) AS zeros
  FROM ({reg})
)
"""


def _hll_est_sql(src: str, spark_side: bool) -> str:
    reg = (_HLL_SPARK if spark_side else _HLL_DUCK).format(src=src)
    return _HLL_EST.format(alpha=HLL_ALPHA, m=HLL_M, reg=reg)


def sketch_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation via HyperLogLog set algebra: set A =
    users active in the first half of the month, set B = second half.
    |A|, |B| from per-set register tables; |A u B| from the register-
    wise MAX merge (the defining mergeability of HLL — at 100 TB the
    per-partition/per-day sketch tables union without touching raw
    data); |A n B| by inclusion-exclusion, reported against the exact
    overlap. Registers are a portable integer construction (see module
    header) so the whole sketch pipeline is hash-gate verifiable.

    Plan shape: one scan -> two tiny register tables (<= 256 rows
    each); every post-scan operator is on sketch-sized data.
    """
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("hll_events")
    half_a = "(SELECT DISTINCT user_id FROM hll_events WHERE dayofmonth(ts) <= 15)"
    half_b = "(SELECT DISTINCT user_id FROM hll_events WHERE dayofmonth(ts) > 15)"
    return spark.sql(hll_intersection_sql(half_a, half_b, spark_side=True))


def hll_intersection_sql(half_a: str, half_b: str, spark_side: bool) -> str:
    """Full intersection-report SQL over two id-set subqueries (each a
    parenthesized ``SELECT ... user_id`` subquery string): per-set HLL
    estimates, register-max union, inclusion-exclusion intersection,
    exact overlap and relative error. Used by the oracle-checked query
    above and driven at rehearsal scale by ``stress.py hll``."""
    union_src = (
        "(SELECT user_id FROM " + half_a + " UNION SELECT user_id FROM " + half_b + ")"
    )
    est_a = _hll_est_sql(half_a, spark_side=spark_side)
    est_b = _hll_est_sql(half_b, spark_side=spark_side)
    est_u = _hll_est_sql(union_src, spark_side=spark_side)
    return f"""
        SELECT ROUND(a.est, 4) AS est_a, ROUND(b.est, 4) AS est_b,
               ROUND(u.est, 4) AS est_union,
               ROUND(a.est + b.est - u.est, 4) AS est_intersection,
               x.exact_intersection,
               ROUND(ABS(a.est + b.est - u.est - x.exact_intersection)
                     / x.exact_intersection, 4) AS rel_err
        FROM ({est_a}) a, ({est_b}) b, ({est_u}) u,
             (SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection
              FROM (SELECT user_id FROM {half_a}
                    INTERSECT SELECT user_id FROM {half_b})) x
        """


def _hll_oracle() -> str:
    half_a = "(SELECT DISTINCT user_id FROM events WHERE EXTRACT(day FROM ts) <= 15)"
    half_b = "(SELECT DISTINCT user_id FROM events WHERE EXTRACT(day FROM ts) > 15)"
    return hll_intersection_sql(half_a, half_b, spark_side=False)


QUERIES["sketch_hll_intersection"] = sketch_hll_intersection
ORACLES["sketch_hll_intersection"] = _hll_oracle()

# ---------------------------------------------------------------------------
# Experiment power analysis (two-sample, per metric)
# ---------------------------------------------------------------------------

# (z_{alpha/2} + z_{power})^2 for alpha = 0.05 two-sided, power = 0.80,
# pre-squared in Python and inlined as ONE literal into both engines so
# the sizing arithmetic has the identical association order everywhere.
C2 = repr((1.959963984540054 + 0.8416212335729143) ** 2)
MDE_FRAC = 0.05  # target effect: 5 % of the metric mean


def events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sizing table per metric (event_type): given the
    observed mean and sample variance of the value metric, the sample
    size each arm needs to detect a 5 % lift at alpha = .05 with 80 %
    power, n = 2 sigma^2 (z_a + z_b)^2 / delta^2, plus the MDE the
    CURRENT sample (split evenly) can already detect. The ceil() is
    taken on 6-dp-rounded moments so the integer output cannot differ
    across engines from last-ulp aggregation-order noise.

    One map-side-combine aggregation over events; the sizing math runs
    on the 5-row metric table."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
    )
    c2 = f"({C2})"
    mde = f"({MDE_FRAC!r} * mean_value)"
    return g.select(
        "event_type",
        "n",
        "mean_value",
        "var_value",
        F.round(F.expr(mde), 6).alias("mde_target"),
        F.expr(
            f"CAST(CEIL(2.0 * var_value * {c2} / ({mde} * {mde})) AS BIGINT)"
        ).alias("n_per_arm_required"),
        F.round(
            F.expr(f"SQRT(2.0 * var_value * {c2} / (n / 2.0))"), 6
        ).alias("mde_at_current_n"),
    ).orderBy("event_type")


POWER_SQL = f"""
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(AVG(value), 6) AS mean_value,
         ROUND(VAR_SAMP(value), 6) AS var_value
  FROM events GROUP BY 1
)
SELECT event_type, n, mean_value, var_value,
       ROUND({MDE_FRAC!r} * mean_value, 6) AS mde_target,
       CAST(CEIL(2.0 * var_value * ({C2})
                 / (({MDE_FRAC!r} * mean_value) * ({MDE_FRAC!r} * mean_value)))
            AS BIGINT) AS n_per_arm_required,
       ROUND(SQRT(2.0 * var_value * ({C2}) / (n / 2.0)), 6)
         AS mde_at_current_n
FROM g ORDER BY event_type
"""

QUERIES["events_power_analysis"] = events_power_analysis
ORACLES["events_power_analysis"] = POWER_SQL

# ---------------------------------------------------------------------------
# Changes-in-changes quantile treatment effects (Athey & Imbens 2006)
# ---------------------------------------------------------------------------

CIC_PRE = 2   # pre period
CIC_POST = 3  # post period
CIC_COHORT = 3  # treated cohort (g = CIC_POST: treated exactly at post)


def did_cic_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changes-in-changes quantile treatment effects at the deciles
    (Athey & Imbens 2006, "Identification and inference in nonlinear
    difference-in-differences models"): the counterfactual post-period
    distribution of the treated group is F01^{-1}(F00(y)) applied to
    its pre-period outcomes, so

        QTE(tau) = Q11(tau) - Q01^{-1}( F00( Q10(tau) ) )

    evaluated on the empirical distributions with EXACT order
    statistics (rank = ceil(tau * n), no interpolation) — every
    selection is an integer rank, so the whole estimator is
    cross-engine stable with no float-quantile semantics involved.

    Scale shape: the three required rankings (treated-pre, control-
    post, treated-post) run through the two-phase global rank
    (operators/packing.global_rank_cumsum — range shuffle + per-
    partition windows, never a single reducer); F00 is one COUNT
    aggregate against 9 broadcast probe values. Distribution tables
    are per-unit outcomes, so all ranked inputs are unit-scale.
    """
    panel = panel_from_events(spark, sf_dir)
    y10 = panel.filter(
        (F.col("g") == CIC_COHORT) & (F.col("period") == CIC_PRE)
    ).select("id", "y")
    y11 = panel.filter(
        (F.col("g") == CIC_COHORT) & (F.col("period") == CIC_POST)
    ).select("id", "y")
    y00 = panel.filter(
        (F.col("g") == 0) & (F.col("period") == CIC_PRE)
    ).select("id", "y")
    y01 = panel.filter(
        (F.col("g") == 0) & (F.col("period") == CIC_POST)
    ).select("id", "y")
    return cic_qte_frame(spark, y10, y11, y00, y01)


def cic_qte_frame(spark, y10, y11, y00, y01) -> DataFrame:
    """Operator core of :func:`did_cic_qte` over the four (id, y)
    empirical distributions (treated-pre, treated-post, control-pre,
    control-post) — also driven at rehearsal scale by
    ``stress.py cic``. The three required rankings run in ONE
    grouped two-phase rank job (operators/packing.grouped_rank) —
    one range shuffle for all three distributions instead of three
    sequential rank jobs."""
    from csdid_pyspark_spark.cache import carry_cache
    from csdid_pyspark_spark.operators.packing import grouped_rank

    tagged = (
        y10.select(F.lit("t_pre").alias("cell"), "id", "y")
        .unionByName(y11.select(F.lit("t_post").alias("cell"), "id", "y"))
        .unionByName(y01.select(F.lit("c_post").alias("cell"), "id", "y"))
    )
    gr = grouped_rank(tagged, ["cell"], ["y", "id"], rank_col="rn")
    n10 = gr.group_counts.get(("t_pre",), 0)
    n11 = gr.group_counts.get(("t_post",), 0)
    n01 = gr.group_counts.get(("c_post",), 0)

    def cell(name: str, k_alias: str, y_alias: str) -> DataFrame:
        return gr.df.filter(F.col("cell") == name).select(
            F.col("rn").alias(k_alias), F.col("y").alias(y_alias)
        )

    taus = spark.range(1, 10).select(
        (F.col("id") / 10.0).alias("tau"),
        F.ceil(F.col("id") / 10.0 * n10).cast("bigint").alias("k10"),
        F.ceil(F.col("id") / 10.0 * n11).cast("bigint").alias("k11"),
    )
    q10 = taus.join(cell("t_pre", "k10", "q10"), "k10")
    # F00 at the 9 probe values: one aggregate over control-pre rows per
    # probe (probes broadcast; the control side is scanned once). Every
    # (tau, q10, k11) group aggregates over ALL control-pre rows, so
    # n00 is just the group's row count — no separate y00.count()
    # action (one fewer scheduler round-trip AND one fewer scan of the
    # control-pre lineage; same value, long->double like float(n00)).
    p = (
        y00.crossJoin(F.broadcast(q10))
        .groupBy("tau", "q10", "k11")
        .agg(
            (
                F.sum(F.when(F.col("y") <= F.col("q10"), 1).otherwise(0))
                / F.count("*").cast("double")
            ).alias("p00")
        )
        .withColumn(
            "k01",
            F.greatest(F.lit(1), F.ceil(F.col("p00") * n01)).cast("bigint"),
        )
    )
    qcf = p.join(cell("c_post", "k01", "q_cf"), "k01")
    out = (
        qcf.join(cell("t_post", "k11", "q11"), "k11")
        .select(
            F.round("tau", 1).alias("tau"),
            F.round("q10", 6).alias("q_pre_treated"),
            F.round("p00", 6).alias("p00"),
            F.round("q_cf", 6).alias("q_counterfactual"),
            F.round("q11", 6).alias("q_post_treated"),
            F.round(F.col("q11") - F.col("q_cf"), 6).alias("qte"),
        )
        .orderBy("tau")
    )
    return carry_cache(out, gr.df)


DID_CIC_SQL = f"""
WITH {PANEL_CTE},
y10 AS (SELECT id, y FROM panel WHERE g = {CIC_COHORT} AND period = {CIC_PRE}),
y11 AS (SELECT id, y FROM panel WHERE g = {CIC_COHORT} AND period = {CIC_POST}),
y00 AS (SELECT id, y FROM panel WHERE g = 0 AND period = {CIC_PRE}),
y01 AS (SELECT id, y FROM panel WHERE g = 0 AND period = {CIC_POST}),
r10 AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y, id) AS rn FROM y10),
r11 AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y, id) AS rn FROM y11),
r01 AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y, id) AS rn FROM y01),
n AS (SELECT (SELECT COUNT(*) FROM y10) AS n10,
             (SELECT COUNT(*) FROM y11) AS n11,
             (SELECT COUNT(*) FROM y00) AS n00,
             (SELECT COUNT(*) FROM y01) AS n01),
taus AS (
  SELECT i / 10.0 AS tau,
         CAST(CEIL(i / 10.0 * n10) AS BIGINT) AS k10,
         CAST(CEIL(i / 10.0 * n11) AS BIGINT) AS k11
  FROM (SELECT UNNEST(range(1, 10)) AS i), n
),
q10 AS (
  SELECT t.tau, t.k11, r.y AS q10 FROM taus t JOIN r10 r ON r.rn = t.k10
),
p AS (
  SELECT q.tau, q.k11, q.q10,
         SUM(CASE WHEN y00.y <= q.q10 THEN 1 ELSE 0 END)
           / CAST((SELECT n00 FROM n) AS DOUBLE) AS p00
  FROM y00 CROSS JOIN q10 q
  GROUP BY q.tau, q.k11, q.q10
),
pk AS (
  SELECT tau, k11, q10, p00,
         GREATEST(1, CAST(CEIL(p00 * (SELECT n01 FROM n)) AS BIGINT)) AS k01
  FROM p
)
SELECT ROUND(pk.tau, 1) AS tau,
       ROUND(pk.q10, 6) AS q_pre_treated,
       ROUND(pk.p00, 6) AS p00,
       ROUND(r01.y, 6) AS q_counterfactual,
       ROUND(r11.y, 6) AS q_post_treated,
       ROUND(r11.y - r01.y, 6) AS qte
FROM pk
JOIN r01 ON r01.rn = pk.k01
JOIN r11 ON r11.rn = pk.k11
ORDER BY tau
"""

QUERIES["did_cic_qte"] = did_cic_qte
ORACLES["did_cic_qte"] = DID_CIC_SQL

# ---------------------------------------------------------------------------
# Triple difference (DDD)
# ---------------------------------------------------------------------------

DDD_PRE = 2  # pre period for the 2x2x2 contrasts


def did_ddd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple-difference estimates (Olden & Moen 2022, "The triple
    difference estimator"): a second, policy-ineligible segment within
    both the treated cohort and the never-treated group differences
    out group-specific shocks that plain DiD absorbs into the ATT.
    Eligibility is the unit's bit-1 (id div 2 mod 2) — a deterministic
    50/50 segment. For each post period t vs the fixed pre period:

        DDD(t) = DiD_eligible(t) - DiD_ineligible(t)

    where DiD_s(t) = (ybar_treated,s,t - ybar_treated,s,pre)
                   - (ybar_control,s,t - ybar_control,s,pre).

    One aggregation over the panel (8 cell means per t), then scalar
    algebra on the tiny cell table."""
    panel = panel_from_events(spark, sf_dir)
    base = panel.filter(F.col("g").isin(0, CIC_COHORT)).select(
        (F.col("g") == CIC_COHORT).cast("int").alias("treat"),
        (F.floor(F.col("id") / 2) % 2).cast("int").alias("elig"),
        "period",
        "y",
    )
    cells = base.groupBy("treat", "elig", "period").agg(F.avg("y").alias("m"))
    pre = cells.filter(F.col("period") == DDD_PRE).select(
        "treat", "elig", F.col("m").alias("m_pre")
    )
    post = cells.filter(F.col("period") > DDD_PRE)
    delta = post.join(pre, ["treat", "elig"]).select(
        "period",
        "treat",
        "elig",
        (F.col("m") - F.col("m_pre")).alias("d"),
    )
    did = delta.groupBy("period", "elig").agg(
        (
            F.sum(F.when(F.col("treat") == 1, F.col("d")))
            - F.sum(F.when(F.col("treat") == 0, F.col("d")))
        ).alias("did")
    )
    return (
        did.groupBy("period")
        .agg(
            F.round(F.sum(F.when(F.col("elig") == 1, F.col("did"))), 6).alias(
                "did_eligible"
            ),
            F.round(F.sum(F.when(F.col("elig") == 0, F.col("did"))), 6).alias(
                "did_ineligible"
            ),
            F.round(
                F.sum(F.when(F.col("elig") == 1, F.col("did")))
                - F.sum(F.when(F.col("elig") == 0, F.col("did"))),
                6,
            ).alias("ddd"),
        )
        .orderBy("period")
    )


DID_DDD_SQL = f"""
WITH {PANEL_CTE},
base AS (
  SELECT CASE WHEN g = {CIC_COHORT} THEN 1 ELSE 0 END AS treat,
         CAST(FLOOR(id / 2) % 2 AS INT) AS elig, period, y
  FROM panel WHERE g IN (0, {CIC_COHORT})
),
cells AS (
  SELECT treat, elig, period, AVG(y) AS m FROM base GROUP BY 1, 2, 3
),
delta AS (
  SELECT c.period, c.treat, c.elig, c.m - p.m_pre AS d
  FROM (SELECT * FROM cells WHERE period > {DDD_PRE}) c
  JOIN (SELECT treat, elig, m AS m_pre FROM cells WHERE period = {DDD_PRE}) p
    USING (treat, elig)
),
did AS (
  SELECT period, elig,
         SUM(CASE WHEN treat = 1 THEN d END)
           - SUM(CASE WHEN treat = 0 THEN d END) AS did
  FROM delta GROUP BY 1, 2
)
SELECT period,
       ROUND(SUM(CASE WHEN elig = 1 THEN did END), 6) AS did_eligible,
       ROUND(SUM(CASE WHEN elig = 0 THEN did END), 6) AS did_ineligible,
       ROUND(SUM(CASE WHEN elig = 1 THEN did END)
             - SUM(CASE WHEN elig = 0 THEN did END), 6) AS ddd
FROM did GROUP BY period ORDER BY period
"""

QUERIES["did_ddd"] = did_ddd
ORACLES["did_ddd"] = DID_DDD_SQL

# ---------------------------------------------------------------------------
# Retrieval-quality evaluation + reciprocal-rank fusion
# ---------------------------------------------------------------------------

EVAL_K = 10           # metrics cutoff
EVAL_N_QUERIES = 10   # vec_id < 10 are the query set; the rest candidates
IDCG_AT_10 = repr(4.543559338088346)  # sum_{i=1..10} 1/log2(i+1)
RRF_K = 60            # the standard reciprocal-rank-fusion constant


def _scored_pairs(spark: SparkSession, sf_dir: str):
    """(query x candidate) frame with both rankings' scores: exact fp32
    cosine (rounded to 5 dp BEFORE ranking so order is cross-engine
    stable) and the int8-quantized de-quantized dot product (6 dp) —
    the same symmetric per-vector quantization as sim_topk_int8.
    Queries broadcast; candidates scanned once. No shuffle until the
    per-query window."""
    from csdid_pyspark_spark.functions.vectors import cosine

    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.col("embedding").cast("array<double>")
    absd = F.transform("embedding", lambda x: F.abs(x.cast("double")))
    scale = F.greatest(F.array_max(absd) / F.lit(127.0), F.lit(1e-30))
    q = F.transform(
        "embedding", lambda x: F.round(x.cast("double") / scale).cast("double")
    )
    base = e.select("vec_id", dbl.alias("v"), scale.alias("s"), q.alias("qc"))
    queries = base.filter(F.col("vec_id") < EVAL_N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("s").alias("qs"),
        F.col("qc").alias("qq"),
    )
    cands = base.filter(F.col("vec_id") >= EVAL_N_QUERIES)
    dot_q = F.aggregate(
        F.zip_with("qc", "qq", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return cands.crossJoin(F.broadcast(queries)).select(
        "qid",
        "vec_id",
        F.round(cosine(F.col("v"), F.col("qv")), 5).alias("cos_e"),
        F.round(dot_q * F.col("s") * F.col("qs"), 6).alias("score_q"),
    )


# Shared oracle CTE: the same scored pairs in DuckDB list functions.
_SCORED_SQL = f"""
base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         GREATEST(list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-30) AS s,
         list_transform(embedding,
                  x -> round(CAST(x AS DOUBLE) /
                       GREATEST(list_max(list_transform(embedding,
                                y -> abs(CAST(y AS DOUBLE)))) / 127.0, 1e-30))) AS qc
  FROM embeddings
),
queries AS (
  SELECT vec_id AS qid, v AS qv, s AS qs, qc AS qq FROM base
  WHERE vec_id < {EVAL_N_QUERIES}
),
scored AS (
  SELECT q.qid, c.vec_id,
         ROUND(list_dot_product(c.v, q.qv)
               / (SQRT(list_dot_product(c.v, c.v))
                  * SQRT(list_dot_product(q.qv, q.qv))), 5) AS cos_e,
         ROUND(list_dot_product(c.qc, q.qq) * c.s * q.qs, 6) AS score_q
  FROM base c CROSS JOIN queries q
  WHERE c.vec_id >= {EVAL_N_QUERIES}
),
ranked AS (
  SELECT qid, vec_id,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_e DESC, vec_id) AS rn_e,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score_q DESC, vec_id) AS rn_q
  FROM scored
)
"""


def sim_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality scorecard of the int8-quantized retriever
    against exact fp32 ground truth, per query: recall@10, MRR@10
    (reciprocal rank of the first true-top-10 item in the quantized
    list), and binary-relevance nDCG@10. This is the evaluation loop a
    vector-search deployment runs before swapping a cheaper index in:
    ground truth from the exact scan, candidate list from the
    approximation, rank-overlap metrics per query.

    Scale shape: candidates scanned once against a broadcast query
    set; both rankings come from ONE exchange keyed by query (two
    sorts share it); everything after the rank filter is
    EVAL_K x n_queries rows."""
    from pyspark.sql import Window as W

    scored = _scored_pairs(spark, sf_dir)
    we = W.partitionBy("qid").orderBy(F.desc("cos_e"), "vec_id")
    wq = W.partitionBy("qid").orderBy(F.desc("score_q"), "vec_id")
    ranked = scored.select(
        "qid",
        "vec_id",
        F.row_number().over(we).alias("rn_e"),
        F.row_number().over(wq).alias("rn_q"),
    )
    gt = ranked.filter(F.col("rn_e") <= EVAL_K).select("qid", "vec_id")
    ret = ranked.filter(F.col("rn_q") <= EVAL_K).select("qid", "vec_id", "rn_q")
    hits = ret.join(
        gt.withColumn("hit", F.lit(1)), ["qid", "vec_id"], "left"
    )
    return (
        hits.groupBy("qid")
        .agg(
            F.round(F.sum(F.coalesce("hit", F.lit(0))) / F.lit(EVAL_K), 6).alias(
                f"recall_at_{EVAL_K}"
            ),
            F.round(
                F.coalesce(
                    1.0 / F.min(F.when(F.col("hit") == 1, F.col("rn_q"))),
                    F.lit(0.0),
                ),
                6,
            ).alias("mrr"),
            F.round(
                F.sum(
                    F.when(
                        F.col("hit") == 1, 1.0 / F.log2(F.col("rn_q") + 1)
                    ).otherwise(0.0)
                )
                / F.lit(float(IDCG_AT_10)),
                6,
            ).alias("ndcg"),
        )
        .orderBy("qid")
    )


SIM_EVAL_SQL = f"""
WITH {_SCORED_SQL},
gt AS (SELECT qid, vec_id FROM ranked WHERE rn_e <= {EVAL_K}),
ret AS (SELECT qid, vec_id, rn_q FROM ranked WHERE rn_q <= {EVAL_K}),
hits AS (
  SELECT r.qid, r.vec_id, r.rn_q,
         CASE WHEN g.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM ret r LEFT JOIN gt g ON g.qid = r.qid AND g.vec_id = r.vec_id
)
SELECT qid,
       ROUND(SUM(hit) / CAST({EVAL_K} AS DOUBLE), 6) AS recall_at_{EVAL_K},
       ROUND(COALESCE(1.0 / MIN(CASE WHEN hit = 1 THEN rn_q END), 0.0), 6)
         AS mrr,
       ROUND(SUM(CASE WHEN hit = 1 THEN 1.0 / log2(rn_q + 1) ELSE 0.0 END)
             / {IDCG_AT_10}, 6) AS ndcg
FROM hits GROUP BY qid ORDER BY qid
"""

QUERIES["sim_retrieval_eval"] = sim_retrieval_eval
ORACLES["sim_retrieval_eval"] = SIM_EVAL_SQL


def sim_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of the
    exact-cosine and int8-quantized rankings: fused(d) = sum_r
    1/(RRF_K + rank_r(d)) — the standard way a retrieval stack merges
    heterogeneous rankers without score calibration. Emits the fused
    top-5 per query with both source ranks. Ranks are integers, so the
    fused score is cross-engine exact before its final rounding."""
    from pyspark.sql import Window as W

    scored = _scored_pairs(spark, sf_dir)
    we = W.partitionBy("qid").orderBy(F.desc("cos_e"), "vec_id")
    wq = W.partitionBy("qid").orderBy(F.desc("score_q"), "vec_id")
    fused = scored.select(
        "qid",
        "vec_id",
        F.row_number().over(we).alias("rn_e"),
        F.row_number().over(wq).alias("rn_q"),
    ).withColumn(
        "rrf",
        1.0 / (F.lit(RRF_K) + F.col("rn_e")) + 1.0 / (F.lit(RRF_K) + F.col("rn_q")),
    )
    wf = W.partitionBy("qid").orderBy(F.desc("rrf"), "vec_id")
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= 5)
        .select(
            "qid",
            "rank",
            "vec_id",
            "rn_e",
            "rn_q",
            F.round("rrf", 6).alias("rrf"),
        )
        .orderBy("qid", "rank")
    )


SIM_RRF_SQL = f"""
WITH {_SCORED_SQL},
fused AS (
  SELECT qid, vec_id, rn_e, rn_q,
         1.0 / ({RRF_K} + rn_e) + 1.0 / ({RRF_K} + rn_q) AS rrf
  FROM ranked
),
topf AS (
  SELECT qid, vec_id, rn_e, rn_q, rrf,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, vec_id) AS rank
  FROM fused
)
SELECT qid, rank, vec_id, rn_e, rn_q, ROUND(rrf, 6) AS rrf
FROM topf WHERE rank <= 5 ORDER BY qid, rank
"""

QUERIES["sim_rank_fusion"] = sim_rank_fusion
ORACLES["sim_rank_fusion"] = SIM_RRF_SQL

# ---------------------------------------------------------------------------
# Join-size estimation from Count-Min counters (optimizer statistics)
# ---------------------------------------------------------------------------

F2_DEPTH_SEEDS = (101, 359, 1009, 4241)  # per-depth hash seeds
F2_WIDTH = 256


def _f2_bucket_spark(seed: int) -> str:
    # overflow-safe masked Knuth multiply per depth, bucket = mod width
    return (
        f"CAST(pmod(pmod(key + {seed}, 2147483648) * 2654435761, 4294967296)"
        f" % {F2_WIDTH} AS INT)"
    )


def sketch_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join-size (F2) estimation from Count-Min counters — the
    sketch a distributed optimizer keeps to predict join blow-up and
    pick skew mitigation BEFORE running the join (Alon-Matias-Szegedy
    second moment; CM inner product, Cormode & Muthukrishnan 2005):
    est_F2 = min_d sum_w c_d(w)^2 over depth-4 x width-256 counters of
    ``lineitem.l_partkey``. Counters are integers, so the estimate is
    engine-exact; reported against the exact sum of squared key counts
    with the guaranteed-one-sided relative error.

    Scale shape (guide §2.3 "aggregate before you shuffle"): ONE scan
    + ONE map-side-combinable ``groupBy(key).count()`` collapses the
    data to its distinct keys; both the CM counters (depth-explode of
    the per-key bucket array, WEIGHTED by the key count — identical
    bucket totals, since every row of a key lands in the same bucket)
    and the exact F2 then read that tiny persisted frame. The previous
    shape exploded depth x data rows and scanned lineitem twice."""
    from csdid_pyspark_spark.cache import attach_cache

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("key")
    )
    keyc = li.groupBy("key").agg(F.count("*").alias("c")).persist()
    buckets = F.array(
        *[F.expr(_f2_bucket_spark(s)) for s in F2_DEPTH_SEEDS]
    )
    counters = (
        keyc.select(F.posexplode(buckets).alias("depth", "bucket"), "c")
        .groupBy("depth", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    est = (
        counters.groupBy("depth")
        .agg(F.sum(F.col("c") * F.col("c")).alias("f2_d"))
        .agg(F.min("f2_d").alias("est_f2"))
    )
    exact = keyc.agg(F.sum(F.col("c") * F.col("c")).alias("exact_f2"))
    out = est.crossJoin(F.broadcast(exact)).select(
        F.col("est_f2").cast("bigint").alias("est_f2"),
        F.col("exact_f2").cast("bigint").alias("exact_f2"),
        F.round(
            (F.col("est_f2") - F.col("exact_f2")) / F.col("exact_f2"), 4
        ).alias("overestimate_frac"),
    )
    return attach_cache(out, keyc)


_F2_BUCKET_DUCK = (
    f"CAST((key + {{seed}}) % 2147483648 * 2654435761 % 4294967296"
    f" % {F2_WIDTH} AS INT)"
)

SKETCH_JOIN_SIZE_SQL = f"""
WITH keys AS (SELECT l_partkey AS key FROM lineitem),
counters AS (
  SELECT depth, bucket, COUNT(*) AS c FROM (
    SELECT u.d AS depth,
           CASE u.d
             WHEN 0 THEN {_F2_BUCKET_DUCK.format(seed=F2_DEPTH_SEEDS[0])}
             WHEN 1 THEN {_F2_BUCKET_DUCK.format(seed=F2_DEPTH_SEEDS[1])}
             WHEN 2 THEN {_F2_BUCKET_DUCK.format(seed=F2_DEPTH_SEEDS[2])}
             ELSE {_F2_BUCKET_DUCK.format(seed=F2_DEPTH_SEEDS[3])}
           END AS bucket
    FROM keys CROSS JOIN (SELECT UNNEST(range(0, 4)) AS d) u
  ) GROUP BY depth, bucket
),
est AS (
  SELECT MIN(f2_d) AS est_f2 FROM (
    SELECT depth, SUM(c * c) AS f2_d FROM counters GROUP BY depth
  )
),
exact AS (
  SELECT SUM(c * c) AS exact_f2 FROM (
    SELECT key, COUNT(*) AS c FROM keys GROUP BY key
  )
)
SELECT CAST(est_f2 AS BIGINT) AS est_f2,
       CAST(exact_f2 AS BIGINT) AS exact_f2,
       ROUND((est_f2 - exact_f2) / CAST(exact_f2 AS DOUBLE), 4)
         AS overestimate_frac
FROM est, exact
"""

QUERIES["sketch_join_size"] = sketch_join_size
ORACLES["sketch_join_size"] = SKETCH_JOIN_SIZE_SQL

# ---------------------------------------------------------------------------
# Column profiling (ANALYZE-style optimizer statistics)
# ---------------------------------------------------------------------------


def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics of the orders table: row
    count, null count, exact NDV, and numeric min/max (timestamps as
    epoch seconds; strings carry NULL bounds — cross-engine float
    rendering of bounds is avoided by keeping them typed DOUBLE).
    These are the statistics a cost-based optimizer and a data-quality
    monitor both consume. One aggregation pass (Spark expands the
    multi-distinct — the honest cost of exact NDV; swap in HLL
    (sketch_cardinality) when approximate is acceptable at 100 TB)."""
    o = load_table(spark, sf_dir, "orders")
    cols = [
        ("o_orderkey", F.col("o_orderkey").cast("double")),
        ("o_custkey", F.col("o_custkey").cast("double")),
        ("o_orderstatus", F.lit(None).cast("double")),
        ("o_totalprice", F.col("o_totalprice")),
        ("o_orderdate", F.unix_timestamp("o_orderdate").cast("double")),
        ("o_orderpriority", F.lit(None).cast("double")),
    ]
    agg = o.agg(
        F.count("*").alias("n_rows"),
        *[
            a
            for name, num in cols
            for a in (
                F.sum(F.col(name).isNull().cast("bigint")).alias(f"nulls_{name}"),
                F.countDistinct(name).alias(f"ndv_{name}"),
                F.min(num).alias(f"min_{name}"),
                F.max(num).alias(f"max_{name}"),
            )
        ],
    )
    stack = ", ".join(
        f"'{name}', nulls_{name}, ndv_{name}, min_{name}, max_{name}"
        for name, _ in cols
    )
    return agg.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(col_name, n_nulls, ndv, min_num, max_num)"
        ),
    ).select(
        "col_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("ndv").cast("bigint").alias("ndv"),
        F.round("min_num", 6).alias("min_num"),
        F.round("max_num", 6).alias("max_num"),
    ).orderBy("col_name")


PROFILE_SQL = """
WITH profile AS (
  SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
         SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_nulls,
         COUNT(DISTINCT o_orderkey) AS ndv,
         MIN(CAST(o_orderkey AS DOUBLE)) AS min_num,
         MAX(CAST(o_orderkey AS DOUBLE)) AS max_num
  FROM orders
  UNION ALL
  SELECT 'o_custkey', COUNT(*),
         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT o_custkey),
         MIN(CAST(o_custkey AS DOUBLE)), MAX(CAST(o_custkey AS DOUBLE))
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus', COUNT(*),
         SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT o_orderstatus), NULL, NULL
  FROM orders
  UNION ALL
  SELECT 'o_totalprice', COUNT(*),
         SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT o_totalprice), MIN(o_totalprice), MAX(o_totalprice)
  FROM orders
  UNION ALL
  SELECT 'o_orderdate', COUNT(*),
         SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT o_orderdate),
         MIN(CAST(EXTRACT(epoch FROM o_orderdate) AS DOUBLE)),
         MAX(CAST(EXTRACT(epoch FROM o_orderdate) AS DOUBLE))
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', COUNT(*),
         SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT o_orderpriority), NULL, NULL
  FROM orders
)
SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_nulls AS BIGINT) AS n_nulls, CAST(ndv AS BIGINT) AS ndv,
       ROUND(min_num, 6) AS min_num, ROUND(max_num, 6) AS max_num
FROM profile ORDER BY col_name
"""

QUERIES["profile_table_columns"] = profile_table_columns
ORACLES["profile_table_columns"] = PROFILE_SQL

# ---------------------------------------------------------------------------
# Pre-trend detectability (power) analysis
# ---------------------------------------------------------------------------


def did_pretrend_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How big a parallel-trends violation could the pre-period data
    actually detect? (The question Roth 2022, "Pretest with caution",
    forces before trusting an insignificant pre-test.) Per cohort: the
    inverse-variance-weighted SE of its pre-period ATT(g,t) cells from
    the cached never-treated fit, and the minimal detectable per-period
    pre-trend at alpha = 0.05 / 80 % power, mde = (z_a + z_b) * ivw_se.
    A large mde says the flat pre-trend plot is uninformative, not
    reassuring. Driver math is O(pre-cells); the SEs come from the
    distributed fit."""
    import math

    from csdid_pyspark_spark.queries.did_events import _fit_attgt

    est = _fit_attgt(spark, sf_dir, "nevertreated")
    tbl = est.fit_result.table
    pre = tbl[tbl["post"] == 0]
    zsum = math.sqrt(float(C2))
    rows = []
    for g, grp in pre.groupby("g"):
        ivw = 1.0 / math.sqrt(sum(1.0 / (se * se) for se in grp["se"])) 
        rows.append(
            (int(g), int(len(grp)), round(ivw, 6), round(zsum * ivw, 6))
        )
    rows.sort()
    return spark.createDataFrame(
        rows, "g int, n_pre int, ivw_se double, mde_pretrend double"
    )


from csdid_pyspark_spark.queries.did_events import ATT_CTE, NEVER_PRED  # noqa: E402

DID_PRETREND_POWER_SQL = (
    "WITH "
    + PANEL_CTE
    + ","
    + ATT_CTE.format(control_pred=NEVER_PRED)
    + f"""
SELECT CAST(g AS INT) AS g, CAST(COUNT(*) AS INT) AS n_pre,
       ROUND(1.0 / SQRT(SUM(1.0 / (se * se))), 6) AS ivw_se,
       ROUND(SQRT({C2}) * (1.0 / SQRT(SUM(1.0 / (se * se)))), 6)
         AS mde_pretrend
FROM att_tbl WHERE post = 0
GROUP BY g ORDER BY g
"""
)

QUERIES["did_pretrend_power"] = did_pretrend_power
ORACLES["did_pretrend_power"] = DID_PRETREND_POWER_SQL

# ---------------------------------------------------------------------------
# Point-in-time (temporal) join against the SCD2 dimension
# ---------------------------------------------------------------------------


def dim_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment — "which dimension version was active
    when the fact happened": every lineitem is joined to its
    customer's SCD2 status version effective AT ship time, then rolled
    up to revenue per as-of status. The scale-honest plan is an AS-OF
    join (operators/asof.py: union + per-key forward-fill window — ONE
    shuffle on the dimension key), never the fact x versions range
    join a naive BETWEEN predicate plans. Same-date version collisions
    (two status changes on one date) are resolved deterministically to
    the latest change (max orderkey) BEFORE the as-of, so both engines
    see a unique version timeline per key."""
    from csdid_pyspark_spark.operators.asof import asof_join

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
        .withColumn("prev", F.lag("o_orderstatus").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderstatus")))
    )
    wd = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    vers = (
        changes.withColumn("vrn", F.row_number().over(wd))
        .filter(F.col("vrn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderstatus").alias("status_asof"),
            F.col("o_orderdate").alias("vts"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"
    )
    facts = li.join(
        o.select("o_orderkey", "o_custkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).select(
        "o_custkey",
        F.col("l_shipdate").alias("vts"),
        F.col("l_extendedprice").cast("decimal(30,6)").alias("price"),
    )
    pit = asof_join(
        facts, vers, on="o_custkey", ts_col="vts", direction="backward"
    )
    # Facts shipped before the customer's first status version (the
    # synthetic data does NOT honor TPC-H's shipdate >= orderdate) have
    # no as-of match; they stay visible as an explicit 'none' bucket
    # instead of being silently dropped.
    return (
        pit.groupBy(
            F.coalesce(F.col("status_asof"), F.lit("none")).alias("status_asof")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(F.sum("price").cast("double"), 2).alias("revenue"),
        )
        .orderBy("status_asof")
    )


PIT_JOIN_SQL = """
WITH changes AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
  QUALIFY prev IS NULL OR prev <> o_orderstatus
),
vers AS (
  SELECT o_custkey, o_orderstatus AS status_asof, o_orderdate AS vts,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS vrn
  FROM changes QUALIFY vrn = 1
),
facts AS (
  SELECT o.o_custkey, l.l_shipdate, l.l_extendedprice
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
-- (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
-- the as-of lookup is resolved per DISTINCT (customer, ship time) key
-- and joined back — fact identity is never needed.
keys AS (SELECT DISTINCT o_custkey, l_shipdate FROM facts),
lookup AS (
  SELECT k.o_custkey, k.l_shipdate, v.status_asof,
         ROW_NUMBER() OVER (PARTITION BY k.o_custkey, k.l_shipdate
                            ORDER BY v.vts DESC) AS rn
  FROM keys k
  JOIN vers v ON v.o_custkey = k.o_custkey AND v.vts <= k.l_shipdate
)
SELECT COALESCE(m.status_asof, 'none') AS status_asof,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(CAST(SUM(CAST(f.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE), 2)
         AS revenue
FROM facts f
LEFT JOIN (SELECT * FROM lookup WHERE rn = 1) m
  ON m.o_custkey = f.o_custkey AND m.l_shipdate = f.l_shipdate
GROUP BY 1 ORDER BY 1
"""

QUERIES["dim_point_in_time_join"] = dim_point_in_time_join
ORACLES["dim_point_in_time_join"] = PIT_JOIN_SQL

# ---------------------------------------------------------------------------
# Watermark design: out-of-orderness profile of the event stream
# ---------------------------------------------------------------------------

LATENESS_THRESHOLDS_S = (0, 600, 3600, 7200, 86400)


def events_watermark_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile — the table an engineer reads before
    choosing a streaming watermark: for each candidate lateness bound,
    how many events would arrive LATER than that bound behind the
    maximum event time already seen in their user's stream (arrival
    order = event_id, the synthetic log's ingestion sequence). An
    event counted at threshold T would be DROPPED by a watermark of T;
    the profile shows the completeness/latency trade directly. One
    running-max window per user, then ONE aggregation pass with a
    conditional sum per candidate threshold (never an explode of the
    data-scale stream), unpivoted from the single result row.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = e.select(
        (
            (
                F.unix_micros(F.max("ts").over(w)) - F.unix_micros(F.col("ts"))
            )
            / 1000000.0
        ).alias("late_s")
    )
    agg = late.agg(
        F.count("*").alias("n_total"),
        *[
            F.sum((F.col("late_s") > F.lit(t)).cast("bigint")).alias(f"late_{t}")
            for t in LATENESS_THRESHOLDS_S
        ],
    )
    stack = ", ".join(f"{t}, late_{t}" for t in LATENESS_THRESHOLDS_S)
    return (
        agg.select(
            "n_total",
            F.expr(
                f"stack({len(LATENESS_THRESHOLDS_S)}, {stack})"
                " AS (threshold_s, n_late)"
            ),
        )
        .select(
            F.col("threshold_s").cast("int").alias("threshold_s"),
            F.col("n_late").cast("bigint").alias("n_late"),
            F.round(F.col("n_late") / F.col("n_total"), 6).alias("frac_late"),
        )
        .orderBy("threshold_s")
    )


WATERMARK_PROFILE_SQL = f"""
WITH late AS (
  SELECT EXTRACT(epoch FROM MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         - EXTRACT(epoch FROM ts) AS late_s
  FROM events
),
agg AS (
  SELECT COUNT(*) AS n_total,
{",".join(f"         SUM(CASE WHEN late_s > {t} THEN 1 ELSE 0 END) AS late_{t}" for t in LATENESS_THRESHOLDS_S)}
  FROM late
),
unp AS (
{" UNION ALL ".join(f"  SELECT {t} AS threshold_s, late_{t} AS n_late, n_total FROM agg" for t in LATENESS_THRESHOLDS_S)}
)
SELECT CAST(threshold_s AS INT) AS threshold_s,
       CAST(n_late AS BIGINT) AS n_late,
       ROUND(n_late / CAST(n_total AS DOUBLE), 6) AS frac_late
FROM unp ORDER BY threshold_s
"""

QUERIES["events_watermark_profile"] = events_watermark_profile
ORACLES["events_watermark_profile"] = WATERMARK_PROFILE_SQL

# ---------------------------------------------------------------------------
# Classifier evaluation: exact ROC AUC (Mann-Whitney rank form)
# ---------------------------------------------------------------------------


def quality_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the trained quality classifier over the corpus,
    computed distributed in the Mann-Whitney rank form:

        AUC = (sum of positive-class ranks - n_pos (n_pos+1)/2)
              / (n_pos * n_neg)

    with TIED scores given their average rank (the textbook treatment;
    a deterministic row-rank tiebreak would bias AUC under ties).
    Ranks come from the two-phase global rank (no single reducer);
    tie-averaging needs only a per-distinct-score aggregate of
    (min rank, max rank) — one extra groupBy on score. This is the
    scale path for exact AUC; swap in a binned approximation only when
    the score column has unbounded distinct values AND the corpus is
    too large to range-shuffle. Pinned VALUES golden (the IRLS fit is
    deterministic but not SQL-expressible). NOTE: the synthetic corpus
    label is a deterministic threshold of the same text statistics the
    features encode, so the fit separates perfectly and the pinned AUC
    is exactly 1.0 — the query's value is the distributed exact-AUC
    machinery, which any real (noisy) label exercises unchanged."""
    from csdid_pyspark_spark.operators.packing import global_rank_cumsum
    from csdid_pyspark_spark.operators.logreg import score_column
    from csdid_pyspark_spark.queries.llm_ops import (
        _doc_clf_features,
        _doc_clf_fit,
        _doc_clf_label,
    )
    from csdid_pyspark_spark.cache import carry_cache

    coef = _doc_clf_fit(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        score_column(_doc_clf_features(d), coef).alias("s"),
        _doc_clf_label().alias("y"),
    )
    r = global_rank_cumsum(scored, ["s", "doc_id"], "s", rank_col="rn")
    per_score = r.df.groupBy("s").agg(
        ((F.min("rn") + F.max("rn")) / 2.0).alias("avg_rank"),
        F.sum("y").alias("n_pos_s"),
        F.count("*").alias("n_s"),
    )
    out = per_score.agg(
        F.sum("n_pos_s").cast("bigint").alias("n_pos"),
        (F.sum("n_s") - F.sum("n_pos_s")).cast("bigint").alias("n_neg"),
        F.sum(F.col("avg_rank") * F.col("n_pos_s")).alias("rank_sum_pos"),
    ).select(
        "n_pos",
        "n_neg",
        F.round(
            (F.col("rank_sum_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )
    return carry_cache(out, r.df)


QUERIES["quality_classifier_auc"] = quality_classifier_auc
# oracle: pinned VALUES golden (tools/gen_golden_oracles.py)

# ---------------------------------------------------------------------------
# Robust metric: two-sided trimmed mean per group
# ---------------------------------------------------------------------------

TRIM_FRAC = 0.1


def events_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 % two-sided trimmed mean of the value metric per event_type —
    the robust location estimate a metrics platform reports next to
    the mean when heavy tails or data bugs are in play. Exact order
    statistics: per group, rows ranked by (value, event_id), the
    bottom and top ceil(0.1 n) rows dropped, the remainder averaged.
    Ranks come from the ONE-job grouped two-phase rank
    (operators/packing.grouped_rank) — a Window.partitionBy(group)
    would push each whole data-scale metric group through a single
    task — and the trim boundaries are integer ranks so the surviving
    row set is cross-engine identical."""
    from csdid_pyspark_spark.cache import carry_cache
    from csdid_pyspark_spark.operators.packing import grouped_rank

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id"
    )
    gr = grouped_rank(e, ["event_type"], ["value", "event_id"], rank_col="rn")
    counts = F.broadcast(
        spark.createDataFrame(
            [(k[0], int(v)) for k, v in gr.group_counts.items()],
            "event_type string, n bigint",
        )
    )
    ranked = gr.df.join(counts, "event_type").withColumn(
        "k", F.ceil(F.col("n") * F.lit(TRIM_FRAC)).cast("bigint")
    )
    out = (
        ranked.filter((F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k")))
        .groupBy("event_type")
        .agg(
            F.first("n").cast("bigint").alias("n"),
            F.first("k").cast("bigint").alias("n_trimmed_each_side"),
            F.round(F.avg("value"), 6).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )
    return carry_cache(out, gr.df)


TRIMMED_MEAN_SQL = f"""
WITH ranked AS (
  SELECT event_type, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
k AS (SELECT *, CAST(CEIL(n * {TRIM_FRAC!r}) AS BIGINT) AS k FROM ranked)
SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
       CAST(MIN(k) AS BIGINT) AS n_trimmed_each_side,
       ROUND(AVG(value), 6) AS trimmed_mean
FROM k WHERE rn > k AND rn <= n - k
GROUP BY event_type ORDER BY event_type
"""

QUERIES["events_trimmed_mean"] = events_trimmed_mean
ORACLES["events_trimmed_mean"] = TRIMMED_MEAN_SQL

# ---------------------------------------------------------------------------
# k-NN join (every probe row -> its k nearest neighbors)
# ---------------------------------------------------------------------------

KNN_K = 3


def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN JOIN — unlike the single-query top-k scans, EVERY probe row
    gets its k nearest neighbors in one operator
    (operators/similarity.py::knn_join_bruteforce: broadcast the
    smaller side, per-probe window top-k). Probes are the vec_id % 50
    == 1 sample; neighbors come from the full remaining pool. The
    LSH-bucketed variants (dedup_embedding_lsh, sim_ann_*) are the
    two-large-sides scale path; this is the exact baseline and the
    small-probe-set production shape (e.g. nightly eval queries
    against a corpus index)."""
    from csdid_pyspark_spark.operators.similarity import knn_join_bruteforce

    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") % 50 == 1)
    pool = e.filter(F.col("vec_id") % 50 != 1)
    return knn_join_bruteforce(probes, pool, k=KNN_K).select(
        "l_id",
        "rank",
        "r_id",
        F.round("cosine", 5).alias("cosine"),
    ).orderBy("l_id", "rank")


SIM_KNN_SQL = f"""
WITH l AS (
  SELECT vec_id AS l_id, embedding::DOUBLE[] AS lv FROM embeddings
  WHERE vec_id %% 50 = 1
),
r AS (
  SELECT vec_id AS r_id, embedding::DOUBLE[] AS rv FROM embeddings
  WHERE vec_id %% 50 <> 1
),
scored AS (
  SELECT l.l_id, r.r_id,
         list_dot_product(l.lv, r.rv)
           / (SQRT(list_dot_product(l.lv, l.lv))
              * SQRT(list_dot_product(r.rv, r.rv))) AS cosine
  FROM l CROSS JOIN r WHERE l.l_id <> r.r_id
),
ranked AS (
  SELECT l_id, r_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY l_id
                            ORDER BY cosine DESC, r_id) AS rank
  FROM scored
)
SELECT l_id, rank, r_id, ROUND(cosine, 5) AS cosine
FROM ranked WHERE rank <= {KNN_K}
ORDER BY l_id, rank
""".replace("%%", "%")

QUERIES["sim_knn_join"] = sim_knn_join
ORACLES["sim_knn_join"] = SIM_KNN_SQL


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data prep)
# ---------------------------------------------------------------------------


def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe
    vector, the HARDEST different-label neighbor (highest cosine — the
    negative a triplet loss learns most from) and the nearest
    same-label neighbor, plus the triplet margin pos_cos - neg_cos. A
    negative margin means a different-label vector sits closer than
    any same-label one — the label-noise flag a curation pass acts on.
    One broadcast join of the probe sample against the pool and ONE
    window pass partitioned by (probe, same-label) — per-probe groups,
    never a global window; the LSH-bucketed family remains the
    two-large-sides path."""
    from csdid_pyspark_spark.functions.vectors import as_double_array, cosine

    e = load_table(spark, sf_dir, "embeddings")
    l = e.filter(F.col("vec_id") % 50 == 2).select(
        F.col("vec_id").alias("l_id"),
        F.col("label").alias("l_label"),
        as_double_array("embedding").alias("l_v"),
    )
    r = e.filter(F.col("vec_id") % 50 != 2).select(
        F.col("vec_id").alias("r_id"),
        F.col("label").alias("r_label"),
        as_double_array("embedding").alias("r_v"),
    )
    # broadcast the ~2% PROBE side, never the corpus-scale pool: the
    # inner nested-loop join is symmetric in result, ~50x smaller in
    # broadcast bytes, and the pool keeps streaming executor-side
    scored = r.join(F.broadcast(l), F.col("l_id") != F.col("r_id")).select(
        "l_id",
        "l_label",
        "r_id",
        (F.col("l_label") == F.col("r_label")).alias("same"),
        cosine(F.col("l_v"), F.col("r_v")).alias("cosine"),
    )
    # ONE grouped aggregation over the scored fan-out replaces the
    # ROW_NUMBER window (which shuffled + sorted every scored row) plus
    # the second groupBy pass: conditional max_by picks the same winner
    # per (probe, same-label) side — ties broken exactly as the old
    # ORDER BY cosine DESC, r_id ASC via max of struct(cosine, -r_id),
    # and max_by skips rows whose ordering key is NULL (the other
    # side's rows), so each side's winner is unchanged. Partial
    # aggregation collapses the n·|probes| scored rows map-side.
    def _side_best(cond):
        key = F.when(cond, F.struct(F.col("cosine"), (-F.col("r_id")).alias("_nk")))
        return F.max_by(F.when(cond, F.col("r_id")), key)

    same = F.col("same")
    out = (
        scored.groupBy("l_id")
        .agg(
            F.max("l_label").alias("l_label"),
            _side_best(same).alias("pos_id"),
            F.round(F.max(F.when(same, F.col("cosine"))), 5).alias("pos_cos"),
            _side_best(~same).alias("neg_id"),
            F.round(F.max(F.when(~same, F.col("cosine"))), 5).alias("neg_cos"),
            F.round(
                F.max(F.when(same, F.col("cosine")))
                - F.max(F.when(~same, F.col("cosine"))),
                5,
            ).alias("margin"),
        )
        .orderBy("l_id")
    )
    return out


HARD_NEG_SQL = """
WITH l AS (
  SELECT vec_id AS l_id, label AS l_label, embedding::DOUBLE[] AS lv
  FROM embeddings WHERE vec_id % 50 = 2
),
r AS (
  SELECT vec_id AS r_id, label AS r_label, embedding::DOUBLE[] AS rv
  FROM embeddings WHERE vec_id % 50 <> 2
),
scored AS (
  SELECT l.l_id, l.l_label, r.r_id, (l.l_label = r.r_label) AS same,
         list_dot_product(l.lv, r.rv)
           / (SQRT(list_dot_product(l.lv, l.lv))
              * SQRT(list_dot_product(r.rv, r.rv))) AS cosine
  FROM l CROSS JOIN r WHERE l.l_id <> r.r_id
),
best AS (
  SELECT * FROM (
    SELECT l_id, l_label, r_id, same, cosine,
           ROW_NUMBER() OVER (PARTITION BY l_id, same
                              ORDER BY cosine DESC, r_id) AS rnk
    FROM scored
  ) WHERE rnk = 1
)
SELECT l_id, MAX(l_label) AS l_label,
       MAX(CASE WHEN same THEN r_id END) AS pos_id,
       ROUND(MAX(CASE WHEN same THEN cosine END), 5) AS pos_cos,
       MAX(CASE WHEN NOT same THEN r_id END) AS neg_id,
       ROUND(MAX(CASE WHEN NOT same THEN cosine END), 5) AS neg_cos,
       ROUND(MAX(CASE WHEN same THEN cosine END)
             - MAX(CASE WHEN NOT same THEN cosine END), 5) AS margin
FROM best GROUP BY l_id ORDER BY l_id
"""

QUERIES["sim_hard_negatives"] = sim_hard_negatives
ORACLES["sim_hard_negatives"] = HARD_NEG_SQL

# ---------------------------------------------------------------------------
# Synthetic control (Abadie) + in-space placebo inference
# ---------------------------------------------------------------------------

_SYNTH_T0 = 3  # cohort-3 unit: treated from period 3


def _synth_setup(spark: SparkSession, sf_dir: str):
    """Treated unit = the lowest-id cohort-3 unit of the derived panel;
    donor pool = the never-treated units (g = 0)."""
    panel = panel_from_events(spark, sf_dir)
    treated_id = (
        panel.filter(F.col("g") == _SYNTH_T0)
        .agg(F.min("id").alias("id"))
        .first()["id"]
    )
    donors = panel.filter(F.col("g") == 0).select("id").distinct()
    return panel, treated_id, donors


def did_synth_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic-control gap series for one treated unit
    (did/synth.py::synthetic_control — Abadie & Gardeazabal 2003 /
    Abadie, Diamond & Hainmueller 2010; no counterpart anywhere in the
    reference package): the distributed donor pre-screen ranks every
    never-treated unit by pre-period distance in ONE aggregation, only
    the top-25 series reach the driver, and the deterministic
    Frank-Wolfe simplex fit produces the counterfactual. Output: the
    (period, actual, synthetic, gap) series — post-period gaps are the
    unit-level treatment-effect path. Deterministic end to end →
    pinned VALUES golden."""
    from csdid_pyspark_spark.did.synth import synthetic_control

    panel, treated_id, donors = _synth_setup(spark, sf_dir)
    res = synthetic_control(
        panel,
        treated_id=treated_id,
        t0=_SYNTH_T0,
        donor_ids=donors,
        donor_k=25,
    )
    rows = [
        (int(t), round(a, 6), round(s, 6), round(g, 6))
        for t, a, s, g in res["series"]
    ]
    return spark.createDataFrame(
        rows, "period int, actual double, synthetic double, gap double"
    ).orderBy("period")


def did_synth_placebo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-space placebo distribution for the synthetic control above
    (did/synth.py::placebo_test): every screened donor is refit as a
    pseudo-treated unit — all driver-side over the already-collected
    series, zero extra Spark jobs — and the treated unit's post/pre
    RMSPE ratio is ranked among them. Output: one row per unit
    (is_treated flags the real one) plus the permutation p-value on
    the treated row. Deterministic → pinned VALUES golden."""
    from csdid_pyspark_spark.did.synth import placebo_test

    panel, treated_id, donors = _synth_setup(spark, sf_dir)
    res = placebo_test(
        panel,
        treated_id=treated_id,
        t0=_SYNTH_T0,
        donor_ids=donors,
        donor_k=25,
    )
    rows = [
        (int(d), round(r, 6), 0, None)
        for d, r in sorted(res["placebo_ratios"].items())
    ]
    rows.append(
        (int(treated_id), round(res["treated_ratio"], 6), 1,
         round(res["p_value"], 6))
    )
    return spark.createDataFrame(
        rows, "unit_id int, rmspe_ratio double, is_treated int, p_value double"
    ).orderBy("unit_id")


QUERIES["did_synth_control"] = did_synth_control
QUERIES["did_synth_placebo"] = did_synth_placebo


def did_synth_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge-augmented synthetic control (Ben-Michael, Feller &
    Rothstein 2021; did/synth.py::augmented_synthetic_control — no
    counterpart in the reference package): same distributed donor
    pre-screen and O(K·T) collect as ``did_synth_control``, then the
    SCM simplex weights are corrected by a ridge-regression term that
    closes the residual pre-period imbalance (weights may extrapolate
    outside the convex hull). Output: the period series with BOTH
    counterfactuals side by side — (actual, synthetic_aug, gap_aug,
    synthetic_scm, gap_scm) — post-period gap_aug is the ASCM
    estimate. Deterministic end to end → pinned VALUES golden."""
    from csdid_pyspark_spark.did.synth import augmented_synthetic_control

    panel, treated_id, donors = _synth_setup(spark, sf_dir)
    res = augmented_synthetic_control(
        panel,
        treated_id=treated_id,
        t0=_SYNTH_T0,
        donor_ids=donors,
        donor_k=25,
        lam=1.0,
    )
    scm = {t: (s, g) for t, _, s, g in res["series_scm"]}
    rows = [
        (
            int(t),
            round(a, 6),
            round(s, 6),
            round(g, 6),
            round(scm[t][0], 6),
            round(scm[t][1], 6),
        )
        for t, a, s, g in res["series"]
    ]
    return spark.createDataFrame(
        rows,
        "period int, actual double, synthetic_aug double, gap_aug double,"
        " synthetic_scm double, gap_scm double",
    ).orderBy("period")


QUERIES["did_synth_augmented"] = did_synth_augmented


def did_synth_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic difference-in-differences (Arkhangelsky, Athey,
    Hirshberg, Imbens & Wager 2021 AER; did/synth.py::synthetic_did —
    no counterpart in the reference package): unit weights parallel
    the donor pool to the treated pre-trend (intercept profiled out,
    zeta-ridge per the paper), time weights re-weight pre-periods to
    predict the post window, and the effect is the doubly-weighted
    2x2 DiD — robust to the level shifts that bias plain SC and the
    non-parallel pools that bias plain DiD. Same one-aggregation donor
    pre-screen and O(K·T) driver collect as the SC/ASCM queries.
    Output: the time-weight profile plus summary rows (att, zeta,
    pre_rmse) and — round 9 — the paper's §4/Algorithm-4 placebo
    inference (se, two-sided p, placebo count): the distributed screen
    oversamples to 3x donor_k in the SAME single aggregation and every
    placebo refit is driver-side Frank-Wolfe over the collected
    series, so inference adds zero Spark jobs. Deterministic
    Frank-Wolfe → pinned VALUES golden."""
    from csdid_pyspark_spark.did.synth import synthetic_did

    panel, treated_id, donors = _synth_setup(spark, sf_dir)
    res = synthetic_did(
        panel,
        treated_id=treated_id,
        t0=_SYNTH_T0,
        donor_ids=donors,
        donor_k=25,
        placebo_se=True,
    )
    rows = [
        ("lambda", int(t), round(v, 6)) for t, v in sorted(res["lam"].items())
    ]
    rows += [
        ("att", None, round(res["att"], 6)),
        ("zeta", None, round(res["zeta"], 6)),
        ("pre_rmse", None, round(res["pre_rmse"], 6)),
        ("se", None, round(res["se"], 6)),
        ("p_value", None, round(res["p_value"], 6)),
        ("n_placebo", None, float(res["n_placebo"])),
    ]
    return spark.createDataFrame(
        rows, "component string, period int, value double"
    ).orderBy("component", F.col("period").asc_nulls_last())


QUERIES["did_synth_did"] = did_synth_did


def did_sdid_staggered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staggered-adoption synthetic DiD (Arkhangelsky et al. 2021,
    Appendix A; did/synth.py::synthetic_did_staggered): one SDID fit
    per adoption cohort — the cohort's treated series is its
    cross-unit mean, donors are the never-treated units, and the
    overall att averages cohort taus with N_g * T_post,g weights,
    and Algorithm-4 placebo inference runs per REPLICATE (a
    pseudo-cohort drawn per cohort from the 3x-oversampled screen
    pool, combined with the real weights — so the overall se prices
    the cross-cohort correlation through shared donors).
    Distributed shape: ONE decimal-exact agg for all cohort mean
    series, ONE groupBy(id) pass scoring every donor against ALL
    cohorts at once, per-cohort TakeOrdered top-k (no full sort), one
    bounded series collect; every placebo replicate is driver
    algebra. Output: per-cohort rows (+ placebo se) + the weighted
    overall (+ se, p). Deterministic Frank-Wolfe + decimal sums +
    seeded draws → pinned VALUES golden."""
    from csdid_pyspark_spark.did.synth import synthetic_did_staggered

    panel = panel_from_events(spark, sf_dir)
    res = synthetic_did_staggered(
        panel, donor_k=25, placebo_se=True, n_placebo=50
    )
    rows = [
        (
            int(g),
            round(c["att"], 6),
            round(c["se"], 6),
            round(c["zeta"], 6),
            round(c["pre_rmse"], 6),
            int(c["n_units"]),
            int(c["n_post"]),
            None,
        )
        for g, c in sorted(res["cohorts"].items())
    ]
    rows.append(
        (
            None,
            round(res["att"], 6),
            round(res["se"], 6),
            None,
            None,
            None,
            None,
            round(res["p_value"], 6),
        )
    )
    return spark.createDataFrame(
        rows,
        "g int, att double, se double, zeta double, pre_rmse double,"
        " n_units int, n_post int, p_value double",
    ).orderBy(F.col("g").asc_nulls_last())


QUERIES["did_sdid_staggered"] = did_sdid_staggered


def did_sdid_staggered_nyt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staggered SDID with NOT-YET-TREATED donor pools
    (did/synth.py::synthetic_did_staggered(control='notyettreated') —
    the SDID analogue of the CS estimator's control='notyettreated',
    reference ATTgt.py:316-325): the never-treated units are dropped
    from the panel, so every unit is eventually treated and earlier
    cohorts borrow LATER adopters as donors over a post window
    truncated before the donors' own adoption (here cohorts 3 and 4
    over [g, 4], with cohort-5 units as the pool; cohort 5 itself has
    no donors and is dropped). Same one-pass distributed screen —
    the pool condition is a filter on the unit-level g' column the
    scoring aggregation already carries. Placebo replicates draw
    pseudo-cohorts from the not-yet-treated pools. Deterministic →
    pinned VALUES golden; planted no-never-treated DGP pytest:
    tests/test_did_api.py::test_synthetic_did_staggered_notyettreated."""
    from csdid_pyspark_spark.did.synth import synthetic_did_staggered

    panel = panel_from_events(spark, sf_dir).filter(F.col("g") != 0)
    res = synthetic_did_staggered(
        panel, donor_k=25, placebo_se=True, n_placebo=50,
        control="notyettreated",
    )
    rows = [
        (
            int(g),
            round(c["att"], 6),
            round(c["se"], 6),
            round(c["zeta"], 6),
            round(c["pre_rmse"], 6),
            int(c["n_units"]),
            int(c["n_post"]),
            None,
        )
        for g, c in sorted(res["cohorts"].items())
    ]
    rows.append(
        (
            None,
            round(res["att"], 6),
            round(res["se"], 6),
            None,
            None,
            None,
            None,
            round(res["p_value"], 6),
        )
    )
    return spark.createDataFrame(
        rows,
        "g int, att double, se double, zeta double, pre_rmse double,"
        " n_units int, n_post int, p_value double",
    ).orderBy(F.col("g").asc_nulls_last())


QUERIES["did_sdid_staggered_nyt"] = did_sdid_staggered_nyt


def did_conformal_staggered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-treated conformal inference (did/synth.py::
    conformal_staggered — CWZ 2021 §4): per adoption cohort, the sharp
    null is tested on the cohort MEAN series (under H0 the mean minus
    theta0·1{post} is untreated, so the single-treated moving-block
    machinery applies; averaging over N_g treated units also shrinks
    the idiosyncratic noise), with a test-inversion CI for a constant
    effect. Inference is in TIME (cyclic residual blocks) —
    complementary to did_sdid_staggered's in-SPACE placebo se. One
    cohort-mean aggregation + one all-cohorts donor screen + one
    bounded collect; every refit is driver Frank-Wolfe. Deterministic
    → pinned VALUES golden; planted multi-unit pytest (rejection at
    the floor, coverage, sign, single-unit equivalence to
    conformal_test): tests/test_did_api.py::
    test_conformal_staggered_multi_treated."""
    from csdid_pyspark_spark.did.synth import conformal_staggered

    # alpha must clear the attainable p floor 1/T (T = 6 periods here:
    # floor 1/6 ≈ 0.167) or the inversion degenerates to accept-all —
    # 0.2 keeps the 80% interval meaningful on the short panel
    res = conformal_staggered(
        panel_from_events(spark, sf_dir), donor_k=25, grid_points=41,
        alpha=0.2,
    )
    rows = [
        (
            int(g),
            int(c["n_units"]),
            round(c["p_value"], 6),
            round(c["stat"], 6),
            round(c["theta_hat"], 6),
            None if c["lo"] is None else round(c["lo"], 6),
            None if c["hi"] is None else round(c["hi"], 6),
        )
        for g, c in sorted(res["cohorts"].items())
    ]
    return spark.createDataFrame(
        rows,
        "g int, n_units int, p_value double, stat double,"
        " theta_hat double, ci_lo double, ci_hi double",
    ).orderBy("g")


QUERIES["did_conformal_staggered"] = did_conformal_staggered


def did_conformal_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-PERIOD conformal effect trace (did/synth.py::
    conformal_trace — CWZ 2021 §4.2): for each cohort and post period
    s, the pointwise null adjusts ONLY period s of the cohort-mean
    series, refits on pre ∪ {s} (other post periods excluded, so their
    unspecified effects never contaminate the test), and ranks |u_s|
    among the refit residuals; the pointwise CI inverts over a
    residual-scaled grid — a conformal event-study band with exact
    pointwise coverage, no variance estimation. alpha = 0.3 clears the
    worst attainable p floor on the 6-period panel (cohort 3 refits on
    4 periods: floor 1/4); bounds are NULL where acceptance never
    becomes interior. Deterministic → pinned VALUES golden; planted
    time-varying-path pytest: tests/test_did_api.py::
    test_conformal_trace_pointwise_bands."""
    from csdid_pyspark_spark.did.synth import conformal_trace

    res = conformal_trace(
        panel_from_events(spark, sf_dir), donor_k=25, alpha=0.3,
        grid_points=41,
    )
    rows = [
        (
            int(g),
            int(s),
            int(e),
            round(th, 6),
            None if lo is None else round(lo, 6),
            None if hi is None else round(hi, 6),
        )
        for g, tr in sorted(res["cohorts"].items())
        for s, e, th, lo, hi in tr
    ]
    return spark.createDataFrame(
        rows,
        "g int, s int, e int, theta_hat double, ci_lo double,"
        " ci_hi double",
    ).orderBy("g", "s")


QUERIES["did_conformal_trace"] = did_conformal_trace


def did_mc_nnm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix-completion counterfactual (Athey, Bayati, Doudchenko,
    Imbens & Khosravi 2021; did/mcnnm.py::mc_nnm — no factor/completion
    estimator anywhere in the reference package): treated cells are
    MISSING entries of the outcome matrix, completed under two-way FE +
    nuclear-norm-regularized low-rank structure via distributed
    SOFT-IMPUTE — each iteration is ONE decimal-exact T x T Gram
    aggregation plus a narrow executor-side factor refresh (no
    per-unit state ever reaches the driver). Output: the event-time
    effect path att(e) = mean(y - y_hat) over treated cells, plus —
    round 9 — in-space placebo bands (hash-deterministic pseudo-cohort
    replicates over the never-treated units read off the SAME
    converged fit: one extra aggregation, zero refits; see
    mc_nnm(placebo_b=...)). Fixed iteration count + sign-fixed
    eigenvectors + decimal sums → deterministic across session shapes
    → pinned VALUES golden."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    panel = panel_from_events(spark, sf_dir)
    res = mc_nnm(panel, shrink_frac=0.5, iters=12, placebo_b=200)
    se = {e: s for e, _, s, _, _ in res["bands"]}
    rows = [
        (int(e), round(a, 6), round(se[e], 6) if e in se else None, int(n))
        for e, a, n in res["att"]
    ]
    rows.append(
        (
            None,
            round(res["att_overall"], 6),
            None,
            sum(n for *_, n in res["att"]),
        )
    )
    return spark.createDataFrame(
        rows, "e int, att double, se_placebo double, n bigint"
    ).orderBy(F.col("e").asc_nulls_last())


QUERIES["did_mc_nnm"] = did_mc_nnm


def did_mcnnm_covariate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-augmented MC-NNM (did/mcnnm.py::mc_nnm(xnames=...) —
    Athey et al. 2021 §8.3, residualize-then-impute): theta is the
    EXACT two-way-FE OLS of y on the covariate over observed untreated
    cells (ONE aggregation of within-unit-demeaned normal equations +
    a (T-1+p)-square driver solve), frozen, and the established
    soft-impute loop completes y - x'theta. The covariate here is a
    deterministic unit-slope x time interaction derived from the panel
    keys — exogenous by construction, exercising the full plumbing
    (theta phase, adjusted readout) on the driver testdata; the
    statistical recovery claim lives in tests/test_mcnnm.py::
    test_mcnnm_covariates_recover_confounded_effect (confounded DGP:
    omitted-x bias > 1.0, covariate fit recovers att to 0.1 and theta
    to 0.02). Output: event-time rows + an overall row carrying theta.
    Deterministic (decimal sums, sign-fixed eigendecomposition) →
    pinned VALUES golden."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    panel = panel_from_events(spark, sf_dir).withColumn(
        "x",
        ((F.col("id") % 7).cast("double") - 3.0)
        * F.col("period").cast("double")
        / 3.0,
    )
    res = mc_nnm(panel, shrink_frac=0.5, iters=12, xnames=("x",))
    rows = [
        (int(e), round(a, 6), int(n), None) for e, a, n in res["att"]
    ]
    rows.append(
        (
            None,
            round(res["att_overall"], 6),
            sum(n for *_, n in res["att"]),
            round(res["theta"]["x"], 6),
        )
    )
    return spark.createDataFrame(
        rows, "e int, att double, n bigint, theta double"
    ).orderBy(F.col("e").asc_nulls_last())


QUERIES["did_mcnnm_covariate"] = did_mcnnm_covariate

# ---------------------------------------------------------------------------
# Sun-Abraham event study with influence-function standard errors
# ---------------------------------------------------------------------------


def did_sunab_event_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """did_sunab_event plus plug-in standard errors from the unit-level
    influence representation (did/robust_cells.py::sunab_event_se_frame
    — see its docstring for the ψ formulas). The point worth the extra
    query: a never-treated unit serves EVERY cohort's CATT at an event
    time with a different baseline per cohort, so its contributions
    correlate across cohorts — naive per-cell SE combination drops that
    covariance; here per-unit ψ terms are summed BEFORE squaring
    (pinned against a literal numpy transcription in
    tests/test_did_api.py)."""
    from csdid_pyspark_spark.did.robust_cells import sunab_event_se_frame

    return sunab_event_se_frame(panel_from_events(spark, sf_dir))


DID_SUNAB_SE_SQL = f"""
WITH {PANEL_CTE},
cb AS (
  SELECT g, period, AVG(y) AS ybar, COUNT(*) AS n FROM panel GROUP BY 1, 2
),
cells AS (
  SELECT tr.g AS cg, CAST(tr.period - tr.g AS INT) AS e, tr.period AS t,
         tr.g - 1 AS base, tr.n AS n_g, c.n AS n_0,
         tr.ybar - tb.ybar AS mu_g,
         c.ybar - c0.ybar AS mu_0g
  FROM cb tr
  JOIN cb tb ON tb.g = tr.g AND tb.period = tr.g - 1
  JOIN cb c  ON c.g = 0 AND c.period = tr.period
  JOIN cb c0 ON c0.g = 0 AND c0.period = tr.g - 1
  WHERE tr.g > 0 AND tr.period <> tr.g - 1
),
wc AS (
  SELECT cells.*, CAST(n_g AS DOUBLE) / s.n_e AS w_g, s.n_e
  FROM cells JOIN (SELECT e, SUM(n_g) AS n_e FROM cells GROUP BY e) s
    ON s.e = cells.e
),
dy AS (
  SELECT p1.id, p1.g AS gu, w.cg, w.e, w.w_g, w.n_g, w.n_0, w.mu_g, w.mu_0g,
         p1.y - p0.y AS d
  FROM wc w
  JOIN panel p1 ON p1.period = w.t AND (p1.g = w.cg OR p1.g = 0)
  JOIN panel p0 ON p0.period = w.base AND p0.id = p1.id
),
per_unit AS (
  SELECT e, id,
         SUM(CASE WHEN gu = cg THEN w_g * (d - mu_g) / n_g
                  ELSE -w_g * (d - mu_0g) / n_0 END) AS psi
  FROM dy GROUP BY 1, 2
),
se AS (SELECT e, SQRT(SUM(psi * psi)) AS se_raw FROM per_unit GROUP BY e),
att AS (
  SELECT e, ROUND(SUM(w_g * (mu_g - mu_0g)), 6) AS att_iw,
         CAST(MAX(n_e) AS BIGINT) AS n_treated
  FROM wc GROUP BY e
)
SELECT a.e, a.att_iw, ROUND(s.se_raw, 6) AS se, a.n_treated
FROM att a JOIN se s ON s.e = a.e ORDER BY a.e
"""

QUERIES["did_sunab_event_se"] = did_sunab_event_se
ORACLES["did_sunab_event_se"] = DID_SUNAB_SE_SQL


def did_sunab_event_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """did_sunab_event_se plus UNIFORM sup-t confidence bands from the
    seeded multiplier bootstrap
    (did/robust_cells.py::sunab_event_band_frame): unit-level ±1
    Rademacher weights — one splitmix64 draw per (unit, b), held fixed
    across event times — perturb the whole ψ profile coherently; the
    1-α quantile of max_e |draw_e / σ_e| is the critical value whose
    band covers the ENTIRE event-study path simultaneously, the
    correct band to draw on an event-study plot (pointwise ±1.96·se
    undercovers across |E| looks). Not expressible in portable SQL
    (seeded hash bootstrap) → pinned VALUES golden, the same contract
    as did_attgt_bootstrap; the bootstrap machinery itself is the
    long-green did/mboot.py path. Deterministic across partitionings
    (pytest-gated) because the per-unit sign depends only on
    xxhash64(id) and the draw index."""
    from csdid_pyspark_spark.did.robust_cells import sunab_event_band_frame

    return sunab_event_band_frame(
        panel_from_events(spark, sf_dir), biters=999, alp=0.05, seed=42
    )


QUERIES["did_sunab_event_band"] = did_sunab_event_band


def did_honest_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rambachan-Roth "Honest DiD" sensitivity bounds
    (did/honest.py::honest_bounds_frame — RR 2023, REStud 90(5))
    applied to the Sun-Abraham event-study profile with influence-
    function SEs: for every post event time e and each relative-
    magnitudes bound M̄ ∈ {0, .5, 1, 1.5, 2}, the Δ^RM(M̄) identified
    set [β̂_e ± (e+1)·M̄·s_pre] (s_pre = largest observed consecutive
    pre-period slope, β_{-1} ≡ 0) and its z-padded CI. M̄ = 0 rows
    reproduce the pointwise CI; scanning up the grid shows where the
    conclusion breaks. The referee ask that follows a passed pre-trend
    test (did_pretrend_wald / did_pretrend_power): not "are pre-trends
    zero?" but "how non-parallel could trends be before the effect is
    gone?". Simplifications vs RR's exact FLCI documented on the
    operator. Scale shape: all inputs are the result-sized SA profile;
    the data-scale work (cell means + per-unit ψ) is the long-green
    did_sunab_event_se plan."""
    from csdid_pyspark_spark.did.honest import honest_bounds_frame
    from csdid_pyspark_spark.did.robust_cells import sunab_event_se_frame

    return honest_bounds_frame(
        sunab_event_se_frame(panel_from_events(spark, sf_dir))
    )


# SA event-study profile (e, att, se) with influence-function SEs and
# the e = -1 baseline row appended — shared by both Honest-DiD oracles
SA_PROF_CTES = f"""{PANEL_CTE},
cb AS (
  SELECT g, period, AVG(y) AS ybar, COUNT(*) AS n FROM panel GROUP BY 1, 2
),
cells AS (
  SELECT tr.g AS cg, CAST(tr.period - tr.g AS INT) AS e, tr.period AS t,
         tr.g - 1 AS base, tr.n AS n_g, c.n AS n_0,
         tr.ybar - tb.ybar AS mu_g,
         c.ybar - c0.ybar AS mu_0g
  FROM cb tr
  JOIN cb tb ON tb.g = tr.g AND tb.period = tr.g - 1
  JOIN cb c  ON c.g = 0 AND c.period = tr.period
  JOIN cb c0 ON c0.g = 0 AND c0.period = tr.g - 1
  WHERE tr.g > 0 AND tr.period <> tr.g - 1
),
wc AS (
  SELECT cells.*, CAST(n_g AS DOUBLE) / s.n_e AS w_g, s.n_e
  FROM cells JOIN (SELECT e, SUM(n_g) AS n_e FROM cells GROUP BY e) s
    ON s.e = cells.e
),
dy AS (
  SELECT p1.id, p1.g AS gu, w.cg, w.e, w.w_g, w.n_g, w.n_0, w.mu_g, w.mu_0g,
         p1.y - p0.y AS d
  FROM wc w
  JOIN panel p1 ON p1.period = w.t AND (p1.g = w.cg OR p1.g = 0)
  JOIN panel p0 ON p0.period = w.base AND p0.id = p1.id
),
per_unit AS (
  SELECT e, id,
         SUM(CASE WHEN gu = cg THEN w_g * (d - mu_g) / n_g
                  ELSE -w_g * (d - mu_0g) / n_0 END) AS psi
  FROM dy GROUP BY 1, 2
),
prof AS (
  SELECT a.e, a.att, s.se FROM
    (SELECT e, ROUND(SUM(w_g * (mu_g - mu_0g)), 6) AS att FROM wc GROUP BY e) a
  JOIN
    (SELECT e, ROUND(SQRT(SUM(psi * psi)), 6) AS se FROM per_unit GROUP BY e) s
  ON s.e = a.e
  UNION ALL SELECT -1, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)
)"""

DID_HONEST_SQL = f"""
WITH {SA_PROF_CTES},
steps AS (
  SELECT ABS(t.att - p.att) AS step
  FROM prof t JOIN prof p ON p.e = t.e - 1
  WHERE t.e <= -1
),
spre AS (SELECT MAX(step) AS s_pre FROM steps),
grid AS (
  SELECT CAST(mbar AS DOUBLE) AS mbar
  FROM (VALUES (0.0), (0.5), (1.0), (1.5), (2.0)) g(mbar)
)
SELECT e, mbar, ROUND(att, 6) AS att,
       ROUND(att - (e + 1) * mbar * s_pre, 6) AS set_lo,
       ROUND(att + (e + 1) * mbar * s_pre, 6) AS set_hi,
       ROUND(att - (e + 1) * mbar * s_pre - CAST(1.959964 AS DOUBLE) * se, 6) AS ci_lo,
       ROUND(att + (e + 1) * mbar * s_pre + CAST(1.959964 AS DOUBLE) * se, 6) AS ci_hi
FROM prof CROSS JOIN spre CROSS JOIN grid
WHERE e >= 0 ORDER BY e, mbar
"""

QUERIES["did_honest_bounds"] = did_honest_bounds
ORACLES["did_honest_bounds"] = DID_HONEST_SQL


def did_honest_smoothness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rambachan-Roth "Honest DiD" bounds under the SMOOTHNESS
    restriction Δ^SD (did/honest.py::honest_smoothness_frame — RR
    2023, REStud 90(5)), the complement to did_honest_bounds' Δ^RM:
    where Δ^RM lets the post-period trend DRIFT by M̄× the worst
    observed pre-period slope, Δ^SD commits to extrapolating the
    boundary pre-trend slope LINEARLY and lets only its CURVATURE
    change — by at most mbar × c_pre per period (c_pre = worst
    observed pre-period second difference). mbar = 0 is therefore the
    linear-extrapolation debiased point estimate, not the raw one; the
    two restrictions answer different referee priors and their
    breakdown M̄'s need not agree. Same result-sized scale shape as
    did_honest_bounds on top of the long-green SA influence-SE plan."""
    from csdid_pyspark_spark.did.honest import honest_smoothness_frame
    from csdid_pyspark_spark.did.robust_cells import sunab_event_se_frame

    return honest_smoothness_frame(
        sunab_event_se_frame(panel_from_events(spark, sf_dir))
    )


DID_HONEST_SD_SQL = f"""
WITH {SA_PROF_CTES},
slopes AS (
  SELECT t.e, t.att - p.att AS slope
  FROM prof t JOIN prof p ON p.e = t.e - 1
  WHERE t.e <= -1
),
slast AS (SELECT MAX(slope) AS s_last FROM slopes WHERE e = -1),
curv AS (
  SELECT ABS(s.slope - p.slope) AS curv
  FROM slopes s JOIN slopes p ON p.e = s.e - 1
),
cpre AS (SELECT MAX(curv) AS c_pre FROM curv),
grid AS (
  SELECT CAST(mbar AS DOUBLE) AS mbar
  FROM (VALUES (0.0), (0.5), (1.0), (1.5), (2.0)) g(mbar)
)
SELECT e, mbar, ROUND(att, 6) AS att,
       ROUND(att - (e + 1) * s_last
                 - mbar * c_pre * (CAST((e + 1) * (e + 2) AS DOUBLE) / 2),
             6) AS set_lo,
       ROUND(att - (e + 1) * s_last
                 + mbar * c_pre * (CAST((e + 1) * (e + 2) AS DOUBLE) / 2),
             6) AS set_hi,
       ROUND(att - (e + 1) * s_last
                 - mbar * c_pre * (CAST((e + 1) * (e + 2) AS DOUBLE) / 2)
                 - CAST(1.959964 AS DOUBLE) * se,
             6) AS ci_lo,
       ROUND(att - (e + 1) * s_last
                 + mbar * c_pre * (CAST((e + 1) * (e + 2) AS DOUBLE) / 2)
                 + CAST(1.959964 AS DOUBLE) * se,
             6) AS ci_hi
FROM prof CROSS JOIN slast CROSS JOIN cpre CROSS JOIN grid
WHERE e >= 0 ORDER BY e, mbar
"""

QUERIES["did_honest_smoothness"] = did_honest_smoothness
ORACLES["did_honest_smoothness"] = DID_HONEST_SD_SQL


def did_honest_flci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rambachan-Roth EXACT fixed-length CI under Δ^SD
    (did/honest.py::honest_flci_frame — RR 2023 §5.2 via the
    Armstrong-Kolesar 2018 affine construction), completing
    did_honest_smoothness' plug-in bounds: the plug-in CI ignores the
    noise in the pre coefficients its extrapolation and calibration
    are built from; the FLCI optimizes an affine estimator
    β̂_e − (e+1)·Σw_t·slope_t over the FULL finite-bias affine class
    (the slope parameterization spans it exactly), charges the
    worst-case bias M·Σ|tail sums| in closed form, and pads with the
    folded-normal critical value — exact 1−α coverage for every
    trend in Δ^SD(M), noise in the pre profile priced through v'Σv
    with Σ the FULL influence-function covariance of the SA profile
    (robust_cells.py::sunab_event_cov — the off-diagonals through
    shared never-treated units, one decimal-exact aggregation; a
    diagonal Σ would misprice every cross-coefficient contrast the
    affine estimator takes). Same result-sized scale shape as the
    other honest queries on top of the SA influence-SE plan; the
    optimizer is deterministic driver numpy (fixed-simplex
    Nelder-Mead + bisection) → pinned VALUES golden.
    Coverage/containment/bias-bound brute-force pytests:
    tests/test_honest_flci.py."""
    from csdid_pyspark_spark.did.honest import honest_flci_frame
    from csdid_pyspark_spark.did.robust_cells import (
        sunab_event_context,
        sunab_event_cov,
        sunab_event_se_frame,
    )

    panel = panel_from_events(spark, sf_dir)
    ctx = sunab_event_context(panel)
    try:
        prof = sunab_event_se_frame(panel, ctx=ctx)
        events, C = sunab_event_cov(panel, ctx=ctx)
        pos = {e: i for i, e in enumerate(events)}
        # per post e: the (k+1)-square block over [pre ascending..., e];
        # k = the maximal consecutive pre chain the FLCI uses
        k = 0
        while (-2 - k) in pos:
            k += 1
        pre_asc = list(range(-1 - k, -1))  # [-(k+1), ..., -2]
        # quantize at 8dp BEFORE the optimizer: the covariance's psi
        # inputs are double columns with ~1e-13 cross-partitioning drift,
        # and Nelder-Mead amplifies input ulps into 6dp output flips
        # (observed: two same-code runs disagreed in the 6th decimal of
        # one halflength). Rounding makes the whole driver computation a
        # function of partition-stable inputs; the 1e-8 perturbation moves
        # the CI by O(1e-9).
        cov = {
            e: [
                [
                    round(C[i][j], 8)
                    for j in ([pos[t] for t in pre_asc] + [pos[e]])
                ]
                for i in ([pos[t] for t in pre_asc] + [pos[e]])
            ]
            for e in events
            if e >= 0
        }
        return honest_flci_frame(prof, cov=cov)
    finally:
        for _df in ctx:
            _df.unpersist()


QUERIES["did_honest_flci"] = did_honest_flci


def did_honest_rm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rambachan-Roth conditional/HYBRID confidence intervals under the
    relative-magnitudes restriction Δ^RM(M̄) (did/honest.py::
    honest_rm_ci_frame — RR 2023 §5.3 via the Andrews-Roth-Pakes
    conditional moment-inequality test), the noise-aware completion of
    did_honest_bounds' plug-in sets: Δ^RM is a CONE, so every affine
    estimator has infinite worst-case bias and the FLCI construction
    is unavailable (did_honest_flci covers Δ^SD only) — RR's published
    answer is the conditional test over the 2k-polyhedron union, with
    a κ = α/10 least-favorable first stage (hybrid). Consumes the SAME
    SA event-study profile + full influence covariance as the FLCI
    (robust_cells.py::sunab_event_cov); the dual polytope is vertex-
    enumerated (batched driver numpy, no LP solver) and the LF
    critical value uses seeded draws, so the whole computation is
    deterministic → pinned VALUES golden. Inputs are 8dp-quantized for
    the same partitioning-drift reason documented on did_honest_flci.
    Coverage/power/identified-set pytests: tests/test_honest_rm.py."""
    from csdid_pyspark_spark.did.honest import honest_rm_ci_frame
    from csdid_pyspark_spark.did.robust_cells import (
        sunab_event_context,
        sunab_event_cov,
        sunab_event_se_frame,
    )

    panel = panel_from_events(spark, sf_dir)
    # one pinned cell/ψ pair feeds profile + covariance (the ci frame
    # materializes inside the call, so the pin scope ends here)
    ctx = sunab_event_context(panel)
    try:
        prof = sunab_event_se_frame(panel, ctx=ctx).select(
            "e",
            F.round("att_iw", 8).alias("att_iw"),
            F.round("se", 8).alias("se"),
        )
        events, C = sunab_event_cov(panel, ctx=ctx)
        pos = {e: i for i, e in enumerate(events)}
        k = 0
        while (-2 - k) in pos:
            k += 1
        posts = sorted(e for e in events if e >= 0)
        coords = [pos[t] for t in range(-1 - k, -1)] + [pos[e] for e in posts]
        cov = [[round(C[i][j], 8) for j in coords] for i in coords]
        return honest_rm_ci_frame(prof, cov=cov)
    finally:
        for _df in ctx:
            _df.unpersist()


QUERIES["did_honest_rm"] = did_honest_rm


def did_honest_sd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARP conditional/hybrid CI under Δ^SD (did/honest.py::
    honest_sd_ci_frame — RR 2023 §5.3 applied to the smoothness
    restriction): Δ^SD(M) is ONE polytope Aδ ≤ M·1 over the ± second
    differences, so the test at each θ0 is a single conditional
    moment-inequality test with the other post effects profiled out —
    the moment-inequality COMPANION of did_honest_flci's affine FLCI
    on the SAME SA profile + full influence covariance (two
    independent Δ^SD inference methods whose intervals must agree;
    the cross-check pytest asserts joint coverage + substantial
    overlap on a planted smooth trend). Inputs 8dp-quantized as on the
    sibling queries; deterministic → pinned VALUES golden."""
    from csdid_pyspark_spark.did.honest import honest_sd_ci_frame
    from csdid_pyspark_spark.did.robust_cells import (
        sunab_event_context,
        sunab_event_cov,
        sunab_event_se_frame,
    )

    panel = panel_from_events(spark, sf_dir)
    ctx = sunab_event_context(panel)
    try:
        prof = sunab_event_se_frame(panel, ctx=ctx).select(
            "e",
            F.round("att_iw", 8).alias("att_iw"),
            F.round("se", 8).alias("se"),
        )
        events, C = sunab_event_cov(panel, ctx=ctx)
        pos = {e: i for i, e in enumerate(events)}
        k = 0
        while (-2 - k) in pos:
            k += 1
        posts = sorted(e for e in events if e >= 0)
        coords = [pos[t] for t in range(-1 - k, -1)] + [pos[e] for e in posts]
        cov = [[round(C[i][j], 8) for j in coords] for i in coords]
        return honest_sd_ci_frame(prof, cov=cov)
    finally:
        for _df in ctx:
            _df.unpersist()


QUERIES["did_honest_sd"] = did_honest_sd


def did_honest_sdrm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARP conditional/hybrid CI under the COMBINED restriction Δ^SDRM
    (did/honest.py::honest_sdrm_ci_frame — RR 2023 §2.4.1, HonestDiD's
    DeltaSDRM): post-period deviation from LINEARITY bounded by M̄ ×
    the worst observed pre-period deviation from linearity — the
    default restriction in applied practice, completing the honest-
    bounds family (plug-in sets, FLCI, Δ^RM and Δ^SD ARP tests are the
    already-registered siblings). Δ^SDRM is a union of 2(k−1)
    second-difference cones, so like Δ^RM it admits no FLCI and the
    conditional/hybrid test is the published inference. Same SA
    event-study profile + full influence covariance, vertex-enumerated
    dual, seeded LF draws → deterministic, pinned VALUES golden;
    inputs 8dp-quantized as on the sibling queries.
    Coverage/power/set-convergence pytests: tests/test_honest_sdrm.py."""
    from csdid_pyspark_spark.did.honest import honest_sdrm_ci_frame
    from csdid_pyspark_spark.did.robust_cells import (
        sunab_event_context,
        sunab_event_cov,
        sunab_event_se_frame,
    )

    panel = panel_from_events(spark, sf_dir)
    ctx = sunab_event_context(panel)
    try:
        prof = sunab_event_se_frame(panel, ctx=ctx).select(
            "e",
            F.round("att_iw", 8).alias("att_iw"),
            F.round("se", 8).alias("se"),
        )
        events, C = sunab_event_cov(panel, ctx=ctx)
        pos = {e: i for i, e in enumerate(events)}
        k = 0
        while (-2 - k) in pos:
            k += 1
        posts = sorted(e for e in events if e >= 0)
        coords = [pos[t] for t in range(-1 - k, -1)] + [pos[e] for e in posts]
        cov = [[round(C[i][j], 8) for j in coords] for i in coords]
        return honest_sdrm_ci_frame(prof, cov=cov)
    finally:
        for _df in ctx:
            _df.unpersist()


QUERIES["did_honest_sdrm"] = did_honest_sdrm


def did_bjs_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borusyak-Jaravel-Spiess imputation event study
    (did/imputation.py::bjs_imputation_frame — BJS 2024, REStud
    91(6)): two-way fixed effects fitted on UNTREATED observations
    only, treated counterfactuals imputed as alpha_hat_i +
    lambda_hat_t, effects averaged by event time. Completes the
    modern staggered-DiD triad next to Callaway-Sant'Anna
    (did_attgt_*) and Sun-Abraham (did_sunab_*) — the three agree
    asymptotically under parallel trends but weight cohorts
    differently, so disagreement between them is itself a diagnostic.
    Scale shape: the exact LS solution in two data-scale shuffles —
    the iterative-demeaning shuffle-per-iteration loop is replaced by
    absorbing unit effects analytically and solving the T x T lambda
    system driver-side from O(T^2) aggregated floats (docstring of
    did/imputation.py). SEs are BJS's conservative clustered variance
    from the estimator's EXACT per-observation weights — computable in
    closed form from the same aggregated system because the estimator
    is linear in y (no resampling). Oracle: pinned golden — the closed
    form needs a matrix solve SQL cannot express; parity vs a
    full-dummy lstsq brute force AND a numerical weight-extraction
    variance rebuild is pinned by tests/test_did_api.py."""
    from csdid_pyspark_spark.did.imputation import bjs_imputation_se_frame

    return bjs_imputation_se_frame(panel_from_events(spark, sf_dir))


QUERIES["did_bjs_imputation"] = did_bjs_imputation


def did_etwfe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wooldridge extended TWFE (did/etwfe.py::etwfe_frame — Wooldridge
    2021/2023): ONE saturated pooled-OLS regression with cohort +
    period effects and a separate tau_gt coefficient per treated cell,
    fitted as a single Gram aggregation (p ~ two dozen indicator
    expressions, O(p^2) scalars to the driver) + an O(p^3) driver
    solve. The fourth member of the staggered family next to CS, SA
    and BJS: pooled-regression machinery rather than cell means
    (CS/SA) or imputation (BJS) — saturation is what removes the
    classic TWFE negative-weighting pathology. Oracle: pinned golden
    (matrix solve not expressible in SQL); exact lstsq parity is
    pinned by tests/test_did_api.py."""
    from csdid_pyspark_spark.did.etwfe import etwfe_frame

    return etwfe_frame(panel_from_events(spark, sf_dir))


QUERIES["did_etwfe"] = did_etwfe


# ---------------------------------------------------------------------------
# dCDH TWFE weight decomposition (the diagnostic that motivates the suite)
# ---------------------------------------------------------------------------


def did_twfe_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWFE weight decomposition (de Chaisemartin & D'Haultfoeuille
    2020, AER 110(9), Thm 1; the Stata ``twowayfeweights`` diagnostic):
    the weight the two-way FE regression coefficient puts on each
    treated (cohort, period) cell's ATT. eps is the two-way-demeaned
    treatment indicator; on the balanced derived panel it depends only
    on the cell, so the whole decomposition is ONE data-scale
    aggregation (cell counts, map-side combinable) + broadcast-tiny
    grid algebra (did/robust_cells.py::twfe_weights_frame, where the
    balance precondition is enforced with a loud raise). Cells flagged
    ``is_negative`` are the negative-weight contamination the robust
    estimators (did_sunab_event, did_dcdh_effect, did_bjs_imputation,
    did_etwfe) exist to avoid; weights sum to 1 by construction
    (pinned by the numpy-regression property test,
    tests/test_property.py)."""
    from csdid_pyspark_spark.did.robust_cells import twfe_weights_frame

    return twfe_weights_frame(panel_from_events(spark, sf_dir))


DID_TWFE_WEIGHTS_SQL = f"""
WITH {PANEL_CTE},
cells AS (
  SELECT g, period, COUNT(DISTINCT id) AS n_rows FROM panel GROUP BY 1, 2
),
ng AS (SELECT g, MIN(n_rows) AS n FROM cells GROUP BY g),
per AS (SELECT DISTINCT period FROM cells),
grid AS (
  SELECT ng.g, per.period, ng.n,
         CASE WHEN ng.g > 0 AND per.period >= ng.g THEN 1.0 ELSE 0.0 END AS d
  FROM ng CROSS JOIN per
),
gbar AS (SELECT g AS g_b, AVG(d) AS dbar_g FROM grid GROUP BY g),
tbar AS (SELECT period AS t_b, SUM(n * d) / SUM(n) AS dbar_t FROM grid GROUP BY period),
gd AS (SELECT SUM(n * d) / SUM(n) AS dbar FROM grid),
eps AS (
  SELECT gr.g, gr.period, gr.n, gr.d,
         gr.d - gb.dbar_g - tb.dbar_t + (SELECT dbar FROM gd) AS eps
  FROM grid gr
  JOIN gbar gb ON gb.g_b = gr.g
  JOIN tbar tb ON tb.t_b = gr.period
),
tw AS (SELECT SUM(n * eps) AS s FROM eps WHERE d = 1.0)
SELECT CAST(g AS INT) AS g, CAST(period AS INT) AS period,
       ROUND(eps, 6) AS eps,
       ROUND(n * eps / (SELECT s FROM tw), 6) AS weight,
       (eps < 0) AS is_negative
FROM eps WHERE d = 1.0 ORDER BY g, period
"""

QUERIES["did_twfe_weights"] = did_twfe_weights
ORACLES["did_twfe_weights"] = DID_TWFE_WEIGHTS_SQL


# ---------------------------------------------------------------------------
# Interactive fixed effects / generalized synthetic control (Xu 2017)
# ---------------------------------------------------------------------------


def did_ife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized-synthetic-control ATT by event time (Xu 2017 /
    Bai 2009 interactive fixed effects; did/ife.py::ife_att): common
    time factors learned from the never-treated units' period x period
    covariance (ONE decimal-exact aggregation + a driver eigh on the
    T x T matrix), per-treated-unit (intercept, loading) fit on the
    unit's own pre-window (one groupBy(id) pass against the broadcast
    T-row factor table), counterfactual y - (a_i + lam_i f_t) averaged
    per event time. Robust to loading-driven differential trends that
    break the parallel-trends cell estimators. Round 9 adds in-space
    placebo bands: each replicate REFITS pseudo-treated control
    loadings row-locally on the wide control frame — one extra
    aggregation, B x E floats to the driver (ife.py::ife_att_bands).
    Oracle: pinned golden (driver eigendecomposition not expressible
    in SQL); the planted factor-DGP recovery and the numpy
    brute-force parity live in tests/test_property.py; band coverage
    in tests/test_did_api.py."""
    from csdid_pyspark_spark.did.ife import ife_att_bands

    return ife_att_bands(panel_from_events(spark, sf_dir), b_reps=200)


QUERIES["did_ife"] = did_ife
