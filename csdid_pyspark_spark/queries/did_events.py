"""DiD operator queries over the `events` testdata table.

A deterministic staggered-adoption panel is derived from events
(unit = user_id, period = 5-day bucket of January 2024 → 1..6, cohort
= fixed map of user_id % 4, outcome = mean event value), then the
Callaway-Sant'Anna building blocks run over it as oracle-checkable
queries: the panel itself, the 2-period wide view (reference
`panel2cs2`, utils.py:49-63), ATT(g,t) under both control groups
(reference ATTgt.py:287-331), and all four aggregations
(simple/group/calendar/dynamic; reference ATTgt.py:650-878 — dynamic
is accepted-but-missing there, see SURVEY.md §2.6 K17).

The estimator semantics here are the reg/no-covariate closed form:
ATT(g,t) = E[Δy | G=g] − E[Δy | control], with the analytic
influence-function SE  sqrt((Var[Δy|T]/p + Var[Δy|C]/(1−p)) / n).
The full estimator in ``csdid_pyspark_spark.did`` generalizes this to
dr/ipw with covariates; these queries pin the algebra to a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csdid_pyspark_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Panel derivation (shared CTE text for all oracles)
# ---------------------------------------------------------------------------

PANEL_CTE = """
panel AS (
  SELECT CAST(user_id AS BIGINT) AS id,
         CAST(FLOOR((EXTRACT(day FROM ts) - 1) / 5) AS INT) + 1 AS period,
         CAST(CASE CAST(user_id % 4 AS INT) WHEN 0 THEN 0 WHEN 1 THEN 3 WHEN 2 THEN 4 ELSE 5 END AS INT) AS g,
         AVG(value) AS y
  FROM events
  GROUP BY 1, 2, 3
)
"""


def panel_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived long-format panel (id, period, g, y)."""
    e = load_table(spark, sf_dir, "events")
    g = (
        F.when(F.col("user_id") % 4 == 0, 0)
        .when(F.col("user_id") % 4 == 1, 3)
        .when(F.col("user_id") % 4 == 2, 4)
        .otherwise(5)
        .cast("int")
    )
    period = (F.floor((F.dayofmonth("ts") - 1) / 5) + 1).cast("int")
    return (
        e.select(
            F.col("user_id").cast("bigint").alias("id"),
            period.alias("period"),
            g.alias("g"),
            F.col("value"),
        )
        .groupBy("id", "period", "g")
        .agg(F.avg("value").alias("y"))
    )


def did_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return panel_from_events(spark, sf_dir).select(
        "id", "period", "g", F.round("y", 6).alias("y")
    )


DID_PANEL_SQL = f"""
WITH {PANEL_CTE}
SELECT id, period, g, ROUND(y, 6) AS y FROM panel
"""


# ---------------------------------------------------------------------------
# panel2cs2: wide 2-period view via window lag (reference utils.py:49-63)
# ---------------------------------------------------------------------------

def did_panel2cs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = panel_from_events(spark, sf_dir).filter(F.col("period").isin([1, 2]))
    w = Window.partitionBy("id").orderBy("period")
    wide = p.select(
        "id",
        "g",
        "period",
        F.lag("y").over(w).alias("y0"),
        F.col("y").alias("y1"),
    ).filter(F.col("period") == 2)
    return wide.select(
        "id",
        "g",
        F.round("y0", 6).alias("y0"),
        F.round("y1", 6).alias("y1"),
        F.round(F.col("y1") - F.col("y0"), 6).alias("dy"),
    )


DID_PANEL2CS_SQL = f"""
WITH {PANEL_CTE},
wide AS (
  SELECT id, g, period,
         LAG(y) OVER (PARTITION BY id ORDER BY period) AS y0,
         y AS y1
  FROM panel WHERE period IN (1, 2)
)
SELECT id, g, ROUND(y0, 6) AS y0, ROUND(y1, 6) AS y1, ROUND(y1 - y0, 6) AS dy
FROM wide WHERE period = 2
"""


# ---------------------------------------------------------------------------
# ATT(g,t) — reg estimator, no covariates, varying base period
# ---------------------------------------------------------------------------

def _attgt(spark: SparkSession, sf_dir: str, control: str) -> DataFrame:
    """Single-pass ATT(g,t): broadcast-join the panel to the (g,t,pret)
    cell spec, compute per-unit Δy via a self-join on (id, pret), then
    one groupBy over cells. ~|G| row blowup instead of |G|·|T| separate
    scans (the reference re-scans per cell: ATTgt.py:287-331)."""
    p = panel_from_events(spark, sf_dir).cache()
    periods = [r[0] for r in p.select("period").distinct().collect()]
    cohorts = [r[0] for r in p.select("g").filter("g > 0").distinct().collect()]
    cells = []
    for g in sorted(cohorts):
        for t in sorted(periods):
            if t == min(periods):
                continue
            pret = min(g, t) - 1  # varying base period over contiguous periods
            cells.append((g, t, pret, 1 if t >= g else 0))
    spec = spark.createDataFrame(cells, "cg int, ct int, pret int, post int")

    post_y = p.select("id", F.col("g").alias("gu"), F.col("period"), F.col("y"))
    pre_y = p.select(F.col("id").alias("id0"), F.col("period").alias("period0"), F.col("y").alias("y0"))
    dy = (
        post_y.join(F.broadcast(spec), F.col("period") == F.col("ct"))
        .join(pre_y, (F.col("id0") == F.col("id")) & (F.col("period0") == F.col("pret")))
        .withColumn("dy", F.col("y") - F.col("y0"))
    )
    if control == "nevertreated":
        is_control = F.col("gu") == 0
    else:  # notyettreated: never-treated OR treated strictly later than max(t, pret)
        is_control = (F.col("gu") == 0) | (
            (F.col("gu") > F.greatest("ct", "pret")) & (F.col("gu") != F.col("cg"))
        )
    is_treat = F.col("gu") == F.col("cg")
    dy = dy.filter(is_treat | is_control).withColumn("d", is_treat.cast("double"))

    n = F.count("*")
    p_treat = F.sum("d") / n
    var_t = F.var_pop(F.when(F.col("d") == 1.0, F.col("dy")))
    var_c = F.var_pop(F.when(F.col("d") == 0.0, F.col("dy")))
    att = F.avg(F.when(F.col("d") == 1.0, F.col("dy"))) - F.avg(
        F.when(F.col("d") == 0.0, F.col("dy"))
    )
    se = F.sqrt((var_t / p_treat + var_c / (1 - p_treat)) / n)
    return (
        dy.groupBy(F.col("cg").alias("g"), F.col("ct").alias("t"), F.col("post"))
        .agg(F.round(att, 6).alias("att"), F.round(se, 6).alias("se"))
        .orderBy("g", "t")
    )


def did_attgt_nevertreated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _attgt(spark, sf_dir, "nevertreated")


def did_attgt_notyettreated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _attgt(spark, sf_dir, "notyettreated")


def _attgt_sql(control_pred: str) -> str:
    return f"""
WITH {PANEL_CTE},
periods AS (SELECT DISTINCT period FROM panel),
cells AS (
  SELECT gg.g AS cg, t.period AS ct, LEAST(gg.g, t.period) - 1 AS pret,
         CASE WHEN t.period >= gg.g THEN 1 ELSE 0 END AS post
  FROM (SELECT DISTINCT g FROM panel WHERE g > 0) gg
  CROSS JOIN periods t
  WHERE t.period > (SELECT MIN(period) FROM periods)
),
dy AS (
  SELECT c.cg, c.ct, c.post, p1.g AS gu, p1.y - p0.y AS dy,
         CASE WHEN p1.g = c.cg THEN 1.0 ELSE 0.0 END AS d
  FROM cells c
  JOIN panel p1 ON p1.period = c.ct
  JOIN panel p0 ON p0.period = c.pret AND p0.id = p1.id
  WHERE p1.g = c.cg OR ({control_pred})
)
SELECT cg AS g, ct AS t, post,
  ROUND(AVG(CASE WHEN d = 1.0 THEN dy END) - AVG(CASE WHEN d = 0.0 THEN dy END), 6) AS att,
  ROUND(SQRT((VAR_POP(CASE WHEN d = 1.0 THEN dy END) / (SUM(d) / COUNT(*))
            + VAR_POP(CASE WHEN d = 0.0 THEN dy END) / (1 - SUM(d) / COUNT(*))) / COUNT(*)), 6) AS se
FROM dy GROUP BY cg, ct, post ORDER BY g, t
"""


DID_ATTGT_NEVER_SQL = _attgt_sql("p1.g = 0")
DID_ATTGT_NYT_SQL = _attgt_sql(
    "p1.g = 0 OR (p1.g > GREATEST(c.ct, c.pret) AND p1.g <> c.cg)"
)


QUERIES = {
    "did_panel": did_panel,
    "did_panel2cs": did_panel2cs,
    "did_attgt_nevertreated": did_attgt_nevertreated,
    "did_attgt_notyettreated": did_attgt_notyettreated,
}

ORACLES = {
    "did_panel": DID_PANEL_SQL,
    "did_panel2cs": DID_PANEL2CS_SQL,
    "did_attgt_nevertreated": DID_ATTGT_NEVER_SQL,
    "did_attgt_notyettreated": DID_ATTGT_NYT_SQL,
}
