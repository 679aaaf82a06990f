"""Relational operator queries (SURVEY.md §2.1-2.5 [Q] rows).

Every operator class the reference uses — projection, computed/when
columns, filters, isin, null handling, distinct, global/grouped aggs,
window lag, sorts/top-k — plus the join family, set ops, rollup/cube,
and pivot that round out a complete query surface. One query per
operator class, each with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csdid_pyspark_spark.sources.tables import load_table


def _dsum(col, scale: str = "27,6"):
    """Exact decimal accumulation, final double — order-independent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({scale})")).cast("double")


# --- S1/A1/A5-style flagship: TPC-H Q1 pricing summary -------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            F.round(_dsum("l_quantity") / F.count("*"), 6).alias("avg_qty"),
            F.round(_dsum("l_extendedprice") / F.count("*"), 6).alias("avg_price"),
            F.round(_dsum("l_discount") / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- P1-P4: projection + computed + conditional columns -------------------

def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, F.lit("neg"))
        .when(F.col("c_acctbal") < 5000, F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        band.alias("band"),
        F.lit(1).alias("_intercept"),
    )


PROJECT_SQL = """
SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS acctbal,
  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band,
  1 AS _intercept
FROM customer
"""


# --- P6: row filters -------------------------------------------------------

def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_quantity") < 10.0)
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.08)
        & (F.col("l_shipdate") >= F.lit("1996-01-01"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


FILTER_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity < 10.0 AND l_discount >= 0.02 AND l_discount <= 0.08
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
"""


# --- P8: membership predicate ---------------------------------------------

def isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.filter(F.col("n_nationkey").isin([0, 3, 7, 11, 19])).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


ISIN_SQL = """
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey IN (0, 3, 7, 11, 19)
"""


# --- P7: null handling (na.drop / na.fill) ---------------------------------

def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    nullable = F.when(F.col("value") >= 2.0, F.col("value"))  # else NULL
    return (
        e.select("event_id", nullable.alias("v"))
        .na.fill({"v": -1.0})
        .select("event_id", F.round("v", 2).alias("v"))
    )


NULLS_SQL = """
SELECT event_id, ROUND(COALESCE(CASE WHEN value >= 2.0 THEN value END, -1.0), 2) AS v
FROM events
"""


# --- A3: distinct values sorted --------------------------------------------

def distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment").distinct().orderBy("c_mktsegment")


DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"


# --- A1/A2/A4: global scalar aggregates -------------------------------------

def global_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_shipdate"),
    )


GLOBAL_SQL = """
SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders,
  MAX(l_quantity) AS max_qty, MIN(l_quantity) AS min_qty,
  STRFTIME(MAX(l_shipdate), '%Y-%m-%d') AS max_shipdate
FROM lineitem
"""


# --- A5: group-by count ------------------------------------------------------

def groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(F.count("*").alias("n")).orderBy("o_orderpriority")


GROUPBY_COUNT_SQL = (
    "SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority ORDER BY 1"
)


# --- A6: group-by mean -------------------------------------------------------

def groupby_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.round(_dsum("c_acctbal") / F.count("*"), 6).alias("avg_acctbal"),
        F.count("*").alias("n_cust"),
    )


GROUPBY_MEAN_SQL = """
SELECT c_nationkey,
  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 6) AS avg_acctbal,
  COUNT(*) AS n_cust
FROM customer GROUP BY c_nationkey
"""


# --- A7: weighted mean per group ---------------------------------------------

def weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    wx = F.col("l_quantity") * F.col("l_extendedprice")
    return l.groupBy("l_returnflag").agg(
        F.round(_dsum(wx, "30,6") / _dsum("l_quantity"), 6).alias("qty_weighted_price")
    )


WEIGHTED_MEAN_SQL = """
SELECT l_returnflag,
  ROUND(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
      / CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE), 6) AS qty_weighted_price
FROM lineitem GROUP BY l_returnflag
"""


# --- W1: window lag (the panel2cs2 pattern) ----------------------------------

def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    )


WINDOW_LAG_SQL = """
SELECT event_id, user_id,
  ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
FROM events
"""


# --- O2-style: top-1 per group via row_number ---------------------------------

def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 note: a max_by(struct(price, -orderkey)) grouped form — the
    # §2.3 aggregate-before-shuffle rewrite — measured ~15-20% SLOWER
    # here in interleaved same-window A/B (solo minima 0.68-0.85 s vs
    # 0.60 s): max_by's struct ordering key compares interpreted
    # per-row, while ROW_NUMBER rides the codegen sort. Kept the
    # window; the same rewrite DID win where it removed several window
    # passes at once (cdc_apply_log, sim_hard_negatives).
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
"""


# --- O1 + top-k: global sort-limit --------------------------------------------

def global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(15)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


GLOBAL_TOPK_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
"""


# --- Joins ---------------------------------------------------------------------

def join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-flavored: revenue per market segment. Shuffle joins on
    the two fact keys; Catalyst/AQE picks broadcast for customer when
    it is small enough."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # r11 note: pre-aggregating lineitem per order before the join
    # (the q3 rewrite) measured +30-75% SLOWER here in same-window A/B
    # (solo minima 0.82-1.15 s vs 0.60-0.88 s): unlike q3 — whose
    # post-join group key IS the orderkey, so the pre-agg replaces the
    # final aggregation — this query groups by segment, so the
    # pre-agg ADDS a full decimal hash aggregation the query never had,
    # costing more than the halved orderkey exchange. Reverted.
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1999-01-01"))
        .groupBy("c_mktsegment")
        .agg(_dsum(revenue, "30,6").alias("revenue"), F.count("*").alias("n_items"))
    )


JOIN_INNER_SQL = """
SELECT c_mktsegment,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY c_mktsegment
"""


def join_left_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


JOIN_LEFT_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select("c_custkey")


JOIN_ANTI_SQL = """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""


def join_star_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-flavored star join: fact chain with explicitly
    broadcast dimension tables (nation/region are tiny at any SF —
    broadcasting them removes two shuffles from the plan)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("o_orderdate") >= F.lit("1996-01-01"))
        .groupBy("r_name", "n_name")
        .agg(_dsum(revenue, "30,6").alias("revenue"))
    )


JOIN_STAR_SQL = """
SELECT r_name, n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY r_name, n_name
"""


def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny literal bands table —
    broadcast nested-loop, the right plan for theta joins with a
    small side."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("b900", 900.0, 925.0), ("b925", 925.0, 950.0), ("b950", 950.0, 975.0), ("b975", 975.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(_dsum("p_retailprice") / F.count("*"), 6).alias("avg_price"),
        )
        .orderBy("band")
    )


JOIN_RANGE_SQL = """
SELECT band, COUNT(*) AS n_parts,
  ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price
FROM part
JOIN (VALUES ('b900', 900.0, 925.0), ('b925', 925.0, 950.0),
             ('b950', 950.0, 975.0), ('b975', 975.0, 1000.0)) AS b(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band ORDER BY band
"""


# --- Set operations -------------------------------------------------------------

def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


SET_UNION_SQL = "SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier"


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


SET_INTERSECT_SQL = (
    "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier"
)


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT DISTINCT semantics, matching the SQL oracle


SET_EXCEPT_SQL = (
    "SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier"
)


# --- Rollup / cube / pivot -------------------------------------------------------

def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


ROLLUP_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status, COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(_dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


CUBE_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, COALESCE(l_linestatus, 'ALL') AS linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "o_orderpriority",
            F.col("F").alias("n_f"),
            F.col("O").alias("n_o"),
            F.col("P").alias("n_p"),
        )
    )


PIVOT_SQL = """
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders GROUP BY o_orderpriority
"""


def sketch_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the 100 TB counting path. HLL++ distinct
    counts and KLL-style approximate quantiles run in one pass with
    O(sketch) state per partition and a mergeable partial per task,
    where exact distinct/percentile would shuffle every value. No SQL
    oracle (approximation is engine-specific); the driver sees a
    stable 1-row schema and tests bound the relative error vs exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("ndv_orderkey"),
        F.approx_count_distinct("l_partkey", 0.02).alias("ndv_partkey"),
        F.approx_count_distinct("l_suppkey", 0.02).alias("ndv_suppkey"),
        F.percentile_approx("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), 10000).alias(
            "price_q50_q95"
        ),
    ).select(
        "ndv_orderkey",
        "ndv_partkey",
        "ndv_suppkey",
        F.col("price_q50_q95")[0].alias("price_p50"),
        F.col("price_q50_q95")[1].alias("price_p95"),
    )


def sketch_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sketch aggregates — the shape the 100 TB counting path
    actually runs (per-dimension dashboards, not one global number):
    per event type, HLL++ distinct users and KLL-style approximate
    value quantiles. Partial sketches merge map-side per group, so the
    shuffle carries one O(sketch)-sized state per (task, group) — the
    exact grouped distinct would instead shuffle every (type, user)
    pair. Deterministic on fixed data; pinned VALUES golden."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("ndv_users"),
        F.percentile_approx(
            "value", F.array(F.lit(0.5), F.lit(0.9)), 10000
        ).alias("q"),
        F.count("*").cast("bigint").alias("n_events"),
    ).select(
        "event_type",
        "ndv_users",
        F.round(F.col("q")[0], 6).alias("value_p50"),
        F.round(F.col("q")[1], 6).alias("value_p90"),
        "n_events",
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "sketch_cardinality": sketch_cardinality,
    "sketch_grouped_stats": sketch_grouped_stats,
    "project_compute": project_compute,
    "filter_predicates": filter_predicates,
    "isin_filter": isin_filter,
    "null_handling": null_handling,
    "distinct_sorted": distinct_sorted,
    "global_scalars": global_scalars,
    "groupby_count": groupby_count,
    "groupby_mean": groupby_mean,
    "weighted_mean": weighted_mean,
    "window_lag_delta": window_lag_delta,
    "window_topk_per_group": window_topk_per_group,
    "global_topk": global_topk,
    "join_inner_agg": join_inner_agg,
    "join_left_count": join_left_count,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_star_broadcast": join_star_broadcast,
    "join_range_bands": join_range_bands,
    "set_union": set_union,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "rollup_orders": rollup_orders,
    "cube_lineitem": cube_lineitem,
    "pivot_status_by_priority": pivot_status_by_priority,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "project_compute": PROJECT_SQL,
    "filter_predicates": FILTER_SQL,
    "isin_filter": ISIN_SQL,
    "null_handling": NULLS_SQL,
    "distinct_sorted": DISTINCT_SQL,
    "global_scalars": GLOBAL_SQL,
    "groupby_count": GROUPBY_COUNT_SQL,
    "groupby_mean": GROUPBY_MEAN_SQL,
    "weighted_mean": WEIGHTED_MEAN_SQL,
    "window_lag_delta": WINDOW_LAG_SQL,
    "window_topk_per_group": WINDOW_TOPK_SQL,
    "global_topk": GLOBAL_TOPK_SQL,
    "join_inner_agg": JOIN_INNER_SQL,
    "join_left_count": JOIN_LEFT_SQL,
    "join_semi": JOIN_SEMI_SQL,
    "join_anti": JOIN_ANTI_SQL,
    "join_star_broadcast": JOIN_STAR_SQL,
    "join_range_bands": JOIN_RANGE_SQL,
    "set_union": SET_UNION_SQL,
    "set_intersect": SET_INTERSECT_SQL,
    "set_except": SET_EXCEPT_SQL,
    "rollup_orders": ROLLUP_SQL,
    "cube_lineitem": CUBE_SQL,
    "pivot_status_by_priority": PIVOT_SQL,
}


# --- Time-RANGE window frame (trailing 1-hour aggregate per user) -----------

def window_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: that user's event count and summed value over the
    TRAILING HOUR — a RANGE frame over epoch seconds, not a ROWS frame,
    so simultaneous events all see the same trailing window regardless
    of tie order (which is why the result is engine-deterministic with
    no tiebreak column). The rate-limiting / burst-detection window
    shape; one shuffle on user, sorted once, frame evaluated by a
    sliding two-pointer inside the sort — no self-join."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").withColumn(
        "sec", (F.unix_micros("ts") / F.lit(1_000_000)).cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_trailing_1h"),
        F.round(
            F.sum(F.col("value").cast("decimal(27,6)")).over(w).cast("double"), 4
        ).alias("value_trailing_1h"),
    )


WINDOW_TRAILING_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing_1h,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE), 4)
         AS value_trailing_1h
FROM (SELECT *, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


QUERIES["window_trailing_1h"] = window_trailing_1h
ORACLES["window_trailing_1h"] = WINDOW_TRAILING_SQL


# --- Running window aggregate (cumulative sum per key) ----------------------

def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum(F.col("value").cast("decimal(27,6)")).over(w).cast("double"), 4).alias(
            "running_value"
        ),
    )


WINDOW_RUNNING_SQL = """
SELECT event_id, user_id,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS DOUBLE), 4) AS running_value
FROM events
"""


# --- Exact median per group --------------------------------------------------

def groupby_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q25_qty"),
    )


GROUPBY_MEDIAN_SQL = """
SELECT l_returnflag,
  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
  ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25_qty
FROM lineitem GROUP BY l_returnflag
"""


# --- String functions --------------------------------------------------------

def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("PROMO%") | F.col("p_name").contains("a"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.lower("p_type").alias("type_l"),
            F.substring("p_name", 1, 5).alias("name5"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.length("p_name").cast("int").alias("name_len"),
            F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
        )
    )


STRING_SQL = r"""
SELECT p_partkey, UPPER(p_brand) AS brand_u, LOWER(p_type) AS type_l,
  SUBSTRING(p_name, 1, 5) AS name5,
  CONCAT_WS('|', p_brand, p_type) AS brand_type,
  CAST(LENGTH(p_name) AS INT) AS name_len,
  COALESCE(regexp_extract(p_brand, '(\d+)', 1), '') AS brand_num
FROM part
WHERE p_type LIKE 'PROMO%' OR p_name LIKE '%a%'
"""


# --- Date/time functions -----------------------------------------------------

def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),  # 1=Sunday
        F.date_format(F.date_add(F.to_date("o_orderdate"), 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.to_date(F.lit("2002-01-01")), F.to_date("o_orderdate"))
        .cast("int")
        .alias("age_days"),
    )


DATE_SQL = """
SELECT o_orderkey,
  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
  CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INT) AS dow,
  STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
  CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS age_days
FROM orders
"""


# --- Array functions ---------------------------------------------------------

def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    total = F.aggregate(v, F.lit(0.0), lambda a, b: a + b)
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.element_at(v, 1), 5).alias("first_val"),
        F.round(total, 4).alias("sum_vals"),
        F.round(F.array_max(v), 5).alias("max_val"),
        F.round(F.array_min(v), 5).alias("min_val"),
    )


ARRAY_SQL = """
SELECT vec_id,
  CAST(len(embedding) AS INT) AS dim,
  ROUND(CAST(embedding[1] AS DOUBLE), 5) AS first_val,
  ROUND(list_aggregate(embedding::DOUBLE[], 'sum'), 4) AS sum_vals,
  ROUND(list_aggregate(embedding::DOUBLE[], 'max'), 5) AS max_val,
  ROUND(list_aggregate(embedding::DOUBLE[], 'min'), 5) AS min_val
FROM embeddings
"""


QUERIES.update(
    {
        "window_running_sum": window_running_sum,
        "groupby_median": groupby_median,
        "string_funcs": string_funcs,
        "date_funcs": date_funcs,
        "array_funcs": array_funcs,
    }
)

ORACLES.update(
    {
        "window_running_sum": WINDOW_RUNNING_SQL,
        "groupby_median": GROUPBY_MEDIAN_SQL,
        "string_funcs": STRING_SQL,
        "date_funcs": DATE_SQL,
        "array_funcs": ARRAY_SQL,
    }
)


# --- TPC-H Q3 shape: shipping-priority top-k over a 3-way join --------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic bushy join + agg + top-k. The customer filter prunes before
    the join; revenue accumulates in exact decimal so the top-10 cut is
    deterministic across partial-agg orders."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1999-03-15"))
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1999-03-15"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # pre-aggregate the filtered line rows per order before the
    # fact-fact join (guide §2.3): the orderkey exchange then carries
    # one decimal partial per order, and the post-join groupBy reduces
    # to a pass-through (orders are unique per key). DECIMAL addition
    # is associative, so the revenue — and the top-10 cut on it — is
    # bit-identical.
    lr = l.groupBy("l_orderkey").agg(
        F.sum(revenue.cast("decimal(27,6)")).alias("_rev")
    )
    return (
        lr.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("_rev").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round("revenue", 4).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


Q3_SQL = """
SELECT l_orderkey,
  ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE), 4) AS revenue,
  STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1999-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) DESC, l_orderkey
LIMIT 10
"""


# --- TPC-H Q6 shape: pure scan-filter-agg (pushdown showcase) ---------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
             F.count("*").alias("n_rows"))
        .select(F.round("revenue", 4).alias("revenue"), "n_rows")
    )


Q6_SQL = """
SELECT
  ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,6))) AS DOUBLE), 4) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# --- GROUPING SETS (beyond cube/rollup) -------------------------------------

def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping-set lattice via SQL (the DataFrame API exposes only
    cube/rollup); GROUPING() disambiguates real nulls from subtotal rows."""
    view = f"lineitem_gs_{abs(hash(sf_dir)) % 10**8}"  # scope per sf_dir
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_rows
        FROM {view}
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# --- Array explode / unnest -------------------------------------------------

def explode_embedding_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (lateral unnest) of the embedding vectors into long
    (dim, value) form, then a per-dimension profile of the first 8 dims."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return (
        e.select("vec_id", F.posexplode(v).alias("pos", "val"))
        .filter(F.col("pos") < 8)
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("val"), 6).alias("avg_val"),
            F.round(F.max("val"), 5).alias("max_val"),
        )
        .select(F.col("pos").cast("int").alias("pos"), "n", "avg_val", "max_val")
    )


EXPLODE_SQL = """
WITH long AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS pos,
         UNNEST(embedding::DOUBLE[]) AS val
  FROM embeddings
)
SELECT CAST(pos AS INT) AS pos, COUNT(*) AS n,
       ROUND(AVG(val), 6) AS avg_val, ROUND(MAX(val), 5) AS max_val
FROM long WHERE pos < 8 GROUP BY pos
"""


QUERIES.update(
    {
        "q3_shipping_priority": q3_shipping_priority,
        "q6_forecast_revenue": q6_forecast_revenue,
        "grouping_sets_revenue": grouping_sets_revenue,
        "explode_embedding_dims": explode_embedding_dims,
    }
)

ORACLES.update(
    {
        "q3_shipping_priority": Q3_SQL,
        "q6_forecast_revenue": Q6_SQL,
        "grouping_sets_revenue": GROUPING_SETS_SQL,
        "explode_embedding_dims": EXPLODE_SQL,
    }
)


# --- TPC-H Q5 shape: local-supplier revenue by nation (6-way join) ----------

def q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table join with the TPC-H Q5 co-nationality theta condition
    (customer and supplier in the same nation). Dims broadcast; the two
    fact tables meet in one shuffled equi-join on orderkey."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_dsum(revenue).alias("revenue"), F.count("*").alias("n_items"))
        .select("n_name", F.round("revenue", 4).alias("revenue"), "n_items")
    )


Q5_SQL = """
SELECT n_name,
  ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE), 4) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


# --- TPC-H Q18 shape: large-volume customers (agg-filtered semi join) -------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold — aggregate, filter
    on the aggregate (HAVING), then join back to order/customer detail."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(_dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


Q18_SQL = """
SELECT c_name, o_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       ROUND(o_totalprice, 2) AS o_totalprice, ROUND(total_qty, 2) AS total_qty
FROM (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) > 250
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


QUERIES.update(
    {
        "q5_local_supplier_revenue": q5_local_supplier_revenue,
        "q18_large_orders": q18_large_orders,
    }
)
ORACLES.update(
    {
        "q5_local_supplier_revenue": Q5_SQL,
        "q18_large_orders": Q18_SQL,
    }
)


# --- Q4-shape: correlated-EXISTS semi-join with non-equi predicate ----------

def q4_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority census of orders with at least one line shipped
    after the order date (TPC-H Q4 shape: EXISTS → left-semi join with
    an extra non-equi condition; Catalyst keeps it a hash semi-join on
    l_orderkey with the date predicate as a post-join filter)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("order_count")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# --- Q10-shape: returned-item customer revenue, top 20 ----------------------

def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to returns per customer (TPC-H Q10 shape): fact-fact
    join orders⋈lineitem filtered to returnflag='R', aggregate by
    customer, broadcast-join the customer dimension, global top-20 via
    TakeOrderedAndProject (sorted on the ROUNDED revenue so the cut is
    deterministic across engines)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    c = load_table(spark, sf_dir, "customer")
    rev = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.round(
                _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    return (
        rev.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", F.col("c_acctbal"), "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "revenue"
        )
    )


Q10_SQL = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal, revenue
FROM (
  SELECT o_custkey,
         ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE), 4) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
  GROUP BY o_custkey
) r JOIN customer ON o_custkey = c_custkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- Q12-shape: join + conditional two-way counts ---------------------------

def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return-flag counts of lines on critical (urgent/high) vs
    other orders (TPC-H Q12 shape: fact-fact equi-join + CASE'd partial
    aggregation — the conditional sums combine map-side before the
    single shuffle on the 3-value grouping key)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("bigint").alias("critical_lines"),
            F.sum(F.when(crit, 0).otherwise(1)).cast("bigint").alias("other_lines"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS critical_lines,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS other_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY l_returnflag
"""


# --- Q14-shape: global conditional-ratio aggregate --------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from promo parts in one quarter (TPC-H Q14
    shape): broadcast part dimension into the filtered fact scan, one
    global aggregate producing a conditional-sum ratio."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-04-01")
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    j = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        F.round(F.lit(100.0) * _dsum(promo) / _dsum(rev), 6).alias("promo_revenue_pct")
    )


Q14_SQL = """
SELECT ROUND(100.0
         * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END AS DECIMAL(27,6))) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE),
       6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-04-01'
"""


QUERIES.update(
    {
        "q4_late_shipping": q4_late_shipping,
        "q10_returned_revenue": q10_returned_revenue,
        "q12_priority_shipping": q12_priority_shipping,
        "q14_promo_revenue": q14_promo_revenue,
    }
)
ORACLES.update(
    {
        "q4_late_shipping": Q4_SQL,
        "q10_returned_revenue": Q10_SQL,
        "q12_priority_shipping": Q12_SQL,
        "q14_promo_revenue": Q14_SQL,
    }
)


# --- Q13-shape: left-outer join + count distribution ------------------------

def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts including zero-order
    customers (TPC-H Q13 shape): LEFT OUTER join then two cascaded
    aggregations. The outer join preserves customers with no orders —
    a count of a column (not *) yields 0 for them, which the second
    aggregation groups into the c_count=0 bucket."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) a
GROUP BY c_count
"""


# --- Q17-shape: correlated scalar subquery (per-group average) --------------

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue from small-quantity lines of one brand
    (TPC-H Q17 shape): the correlated subquery `l_quantity <
    0.2*avg(l_quantity where same part)` decorrelates into a per-part
    aggregate joined back to the fact — the form Catalyst can pick a
    broadcast for when the part side is small."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 15)
    )
    per_part = l.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit")
    )
    small = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
    )
    return small.agg(
        F.round(_dsum("l_extendedprice") / 7.0, 4).alias("avg_yearly")
    )


Q17_SQL = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / 7.0, 4) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1' AND p_size < 15
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


# --- Q19-shape: disjunctive OR-of-ANDs predicate join -----------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under an OR of conjunctive brand/size/quantity bands
    (TPC-H Q19 shape). The join key is shared across all disjuncts, so
    the equi-join stays a hash join and the disjunction is a residual
    filter; per-side conjuncts (l_quantity bounds, p_size bounds) are
    still pushed below the join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    disj = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(5, 20))
           & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(10, 40))
           & (F.col("l_quantity").between(20, 40)))
    )
    return j.filter(disj).agg(
        F.round(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
    )


Q19_SQL = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE), 4) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 40)
"""


# --- Q22-shape: scalar subquery + anti-join ---------------------------------

def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance customers in selected nations with no RECENT orders
    (TPC-H Q22 shape): a global scalar aggregate (avg positive balance)
    feeds a filter, then a LEFT ANTI join removes customers that ordered
    on/after the dormancy cutoff. The scalar lands as a broadcast
    single-row cross join; the anti join needs only the orders key
    column, and the date predicate on orders pushes into its scan. The
    recency cutoff (vs the classic "no orders at all") keeps the result
    non-empty at every test scale factor — in this synthetic data every
    customer has at least one lifetime order."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    dormant = rich.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count("*").cast("bigint").alias("numcust"),
        F.round(_dsum("c_acctbal"), 4).alias("totacctbal"),
    )


Q22_SQL = """
SELECT c_nationkey, COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE), 4) AS totacctbal
FROM customer
WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                   WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


QUERIES.update(
    {
        "q13_order_count_distribution": q13_order_count_distribution,
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "q19_disjunctive_revenue": q19_disjunctive_revenue,
        "q22_dormant_customers": q22_dormant_customers,
    }
)
ORACLES.update(
    {
        "q13_order_count_distribution": Q13_SQL,
        "q17_small_quantity_revenue": Q17_SQL,
        "q19_disjunctive_revenue": Q19_SQL,
        "q22_dormant_customers": Q22_SQL,
    }
)


# --- Q7-shape: double-alias dimension join (nation in two roles) ------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping volume between two nations by year (TPC-H Q7 shape):
    the nation dimension participates TWICE under different roles
    (supplier's nation, customer's nation) — both broadcast — over a
    lineitem⋈supplier⋈orders⋈customer chain, with the symmetric
    nation-pair disjunction as a residual filter."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    j = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(
        F.round(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       ROUND(CAST(SUM(CAST(volume AS DECIMAL(27,6))) AS DOUBLE), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


QUERIES["q7_nation_volume"] = q7_nation_volume
ORACLES["q7_nation_volume"] = Q7_SQL


# --- Q8-shape: market-share ratio within group over a wide join tree --------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of revenue by order year (TPC-H Q8 shape):
    a five-table join tree feeding a grouped conditional-sum ratio —
    the share numerator is a CASE inside the same aggregate pass, so
    no second join or self-union is needed."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("s_nk"))
    )
    return j.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        F.round(
            _dsum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0)))
            / _dsum(vol),
            6,
        ).alias("mkt_share")
    )


Q8_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       ROUND(CAST(SUM(CAST(CASE WHEN n_name = 'NATION_5'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(27,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE),
             6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# --- Q9-shape: profit by nation-year (expression agg over 4-way join) -------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit (revenue − retail cost proxy) per supplier nation and
    ship year for a part-name pattern (TPC-H Q9 shape): LIKE-filtered
    part dim broadcast into the fact, arithmetic over columns of two
    tables inside one aggregate pass."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.1
    j = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("s_nk"))
    )
    return j.groupBy(
        "nation", F.year("l_shipdate").cast("int").alias("o_year")
    ).agg(F.round(_dsum(amount), 4).alias("sum_profit"))


Q9_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           - p_retailprice * l_quantity * 0.1 AS DECIMAL(27,6))) AS DOUBLE), 4) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


QUERIES.update(
    {
        "q8_market_share": q8_market_share,
        "q9_product_profit": q9_product_profit,
    }
)
ORACLES.update(
    {
        "q8_market_share": Q8_SQL,
        "q9_product_profit": Q9_SQL,
    }
)


# --- salted skew join, oracle-checked (salting is result-transparent) -------

def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders⋈customer via the 16-way salted join (operators/skew.py):
    the shuffle key becomes (custkey, salt) so a power-law hot key
    spreads over 16 tasks. Salting MUST be invisible in the result —
    the oracle is the plain equi-join, so the driver's hash check
    proves transparency end-to-end."""
    from csdid_pyspark_spark.operators.skew import salted_join

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = salted_join(o, c.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey", salt=16)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(_dsum("o_totalprice"), 4).alias("total"),
    )


JOIN_SKEW_SALTED_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE), 4) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --- ranking window-function family -----------------------------------------

def window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over one window (per-segment
    customers by balance): rank / dense_rank / percent_rank / cume_dist
    / ntile — one shuffle on the partition key, all five functions in
    the same Window operator."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    ).filter(F.col("rnk") <= 50)


WINDOW_RANK_SQL = """
SELECT c_custkey, c_mktsegment, rnk, drnk, prnk, cdist, quartile
FROM (
  SELECT c_custkey, c_mktsegment,
         CAST(RANK() OVER w AS INT) AS rnk,
         CAST(DENSE_RANK() OVER w AS INT) AS drnk,
         ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
         ROUND(CUME_DIST() OVER w, 6) AS cdist,
         CAST(NTILE(4) OVER w AS INT) AS quartile
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
) t
WHERE rnk <= 50
"""


QUERIES.update(
    {
        "join_skew_salted": join_skew_salted,
        "window_rank_funcs": window_rank_funcs,
    }
)
ORACLES.update(
    {
        "join_skew_salted": JOIN_SKEW_SALTED_SQL,
        "window_rank_funcs": WINDOW_RANK_SQL,
    }
)


# --- global row numbering without a single-reducer window -------------------

def global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank of every customer by balance (unique tiebreak on
    custkey) via the two-phase distributed scan — `ROW_NUMBER() OVER
    (ORDER BY ...)` semantics with NO single-partition exchange
    anywhere in the plan (the naive window funnels the whole table
    through one reducer; this shape survives 100 TB)."""
    from csdid_pyspark_spark.operators.packing import global_row_number as grn

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = grn(c, ["c_acctbal", "c_custkey"])
    return ranked.select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"), "rn"
    )


GLOBAL_ROW_NUMBER_SQL = """
SELECT c_custkey, ROUND(c_acctbal, 2) AS c_acctbal,
       ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) AS rn
FROM customer
"""


QUERIES["global_row_number"] = global_row_number
ORACLES["global_row_number"] = GLOBAL_ROW_NUMBER_SQL


# --- Q15-shape: scalar-max over an aggregate (top revenue supplier) ---------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum quarterly revenue (TPC-H Q15 shape:
    aggregate → global scalar max → filter back). The per-supplier
    revenue aggregates in one shuffle; the max collapses the ALREADY
    AGGREGATED |suppliers|-row table, then lands as a broadcast
    single-row cross join — the global max never sees base rows, so no
    single-reducer pass over lineitem exists anywhere."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(
        F.round(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "30,6"), 2
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"),
            "s_name",
            "total_revenue",
        )
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


# --- Q2-shape: correlated min subquery, decorrelated ------------------------

def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each part of a brand, the supplier(s) quoting the minimum
    average unit price (TPC-H Q2's correlated-min shape without the
    partsupp table: unit prices derived from lineitem). The correlated
    subquery decorrelates into a per-part aggregate joined back on
    (partkey, price) equality — two shuffles keyed on part, never a
    per-part loop; the brand filter pushes into the part scan and
    prunes both sides via the join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    unit = (
        l.join(F.broadcast(p.select("p_partkey", "p_name")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "p_name", "l_suppkey")
        .agg(
            F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias("unit_price")
        )
    )
    mins = unit.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("unit_price").alias("min_price")
    )
    return (
        unit.join(
            mins,
            (F.col("l_partkey") == F.col("mk"))
            & (F.col("unit_price") == F.col("min_price")),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            F.col("l_suppkey").alias("s_suppkey"),
            "unit_price",
        )
    )


Q2_SQL = """
WITH unit AS (
  SELECT l_partkey, p_name, l_suppkey,
         ROUND(AVG(l_extendedprice / l_quantity), 4) AS unit_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
  GROUP BY l_partkey, p_name, l_suppkey
)
SELECT l_partkey AS p_partkey, p_name, l_suppkey AS s_suppkey, unit_price
FROM unit u
WHERE unit_price = (SELECT MIN(unit_price) FROM unit m WHERE m.l_partkey = u.l_partkey)
"""


# --- Q16-shape: distinct-count with an exclusion anti-join ------------------

def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per (brand, size band), excluding
    suppliers in deficit (TPC-H Q16's COUNT(DISTINCT ps_suppkey) with a
    NOT IN exclusion): the exclusion list is tiny → broadcast LEFT ANTI
    before the distinct aggregation, so excluded rows never enter the
    shuffle. COUNT(DISTINCT) over (brand, band) keys is a two-phase
    partial-distinct aggregate — no row explosion, skew-safe under AQE."""
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", (F.floor(F.col("p_size") / 10) * 10).cast("int").alias("size_band")
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        l.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "size_band")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, CAST(FLOOR(p_size / 10) * 10 AS INT) AS size_band,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, 2
"""


QUERIES.update(
    {
        "q15_top_supplier": q15_top_supplier,
        "q2_min_price_supplier": q2_min_price_supplier,
        "q16_supplier_variety": q16_supplier_variety,
    }
)
ORACLES.update(
    {
        "q15_top_supplier": Q15_SQL,
        "q2_min_price_supplier": Q2_SQL,
        "q16_supplier_variety": Q16_SQL,
    }
)


# ---------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting — EXISTS + NOT EXISTS over the
# same fact table, the hardest classic join shape (adapted: testdata has
# no receipt/commit dates, so "late" = shipped >90 days after the order
# date; the multi-supplier EXISTS / sole-blame NOT EXISTS structure is
# the original's)
# ---------------------------------------------------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated by hand into the plan a correlated-subquery
    optimizer should reach: the EXISTS becomes a LEFT SEMI join on the
    order key (any other supplier on the order), the NOT EXISTS a LEFT
    ANTI join against the late-rows table (no OTHER supplier was also
    late), both with the supplier-inequality as a residual join
    condition — never a per-row subquery. The late set is computed once
    and reused for both the probe side and the anti side; at scale all
    three joins shuffle on l_orderkey, so AQE can reuse the exchange."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = l.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    waited = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waited.join(F.broadcast(s), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


Q21_SQL = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F' AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
SELECT s.s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


QUERIES["q21_waiting_suppliers"] = q21_waiting_suppliers
ORACLES["q21_waiting_suppliers"] = Q21_SQL


# ---------------------------------------------------------------------------
# Q11 shape: GROUP BY ... HAVING agg > scalar-subquery fraction of the
# global total (adapted: no partsupp table in the testdata, so "value"
# is revenue per supplier; the having-vs-global-scalar structure is the
# original's)
# ---------------------------------------------------------------------------

def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose revenue exceeds 1.05% of global revenue. The
    scalar subquery decorrelates to a 1-row broadcast crossJoin: the
    per-supplier aggregation and the global total share one scan
    subtree but aggregate independently (two passes — at 100 TB the
    global total is the cheap pass, the grouped one the real work),
    then HAVING is a post-agg filter against the broadcast scalar.
    Revenue accumulates in DECIMAL(30,6) on both engines (the module's
    float discipline) so the >-threshold cut is bit-identical."""
    l = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    per = l.groupBy("l_suppkey").agg(F.sum(rev).alias("_v"))
    total = l.agg((F.sum(rev) * F.lit(0.0105)).cast("decimal(38,10)").alias("_cut"))
    return (
        per.crossJoin(F.broadcast(total))
        .filter(F.col("_v").cast("decimal(38,10)") > F.col("_cut"))
        .select("l_suppkey", F.col("_v").cast("double").alias("value"))
        .orderBy(F.desc("value"), "l_suppkey")
    )


Q11_SQL = """
SELECT l_suppkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS value
FROM lineitem GROUP BY l_suppkey
HAVING SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) >
       (SELECT SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) * 0.0105
        FROM lineitem)
ORDER BY value DESC, l_suppkey
"""


QUERIES["q11_important_suppliers"] = q11_important_suppliers
ORACLES["q11_important_suppliers"] = Q11_SQL


# ---------------------------------------------------------------------------
# Q20 shape: triple-nested IN — suppliers of prefix-named parts whose
# standing supply comfortably exceeds one year's demand (adapted: the
# testdata has no partsupp.availqty, so "available" is the supplier's
# all-time shipped quantity of the part; the part-name IN + correlated
# quantity-threshold structure is the original's). Completes the
# TPC-H Q1-Q22 join-shape inventory.
# ---------------------------------------------------------------------------

def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in two nations able to promote 'small%' parts: their
    all-time shipped quantity of the part exceeds twice what ALL of 1998
    demanded from them. Both correlated scalars (all-time supply and
    1998 demand per (part, supplier)) come out of ONE conditional
    aggregation over a single LIKE-pruned fact scan — the broadcast
    part filter cuts lineitem before the only shuffle, and the original
    query's two nested subqueries never rescan the fact. The qualifying
    supplier keys then reach the tiny supplier dim as a LEFT SEMI join.
    Quantities are integral, so double sums are exact and the strict
    threshold compare is engine-independent."""
    l = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    in_1998 = (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp")
    )
    qual = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.sum(F.when(in_1998, F.col("l_quantity")).otherwise(F.lit(0.0))).alias(
                "qty_1998"
            ),
        )
        .filter((F.col("qty_1998") > 0) & (F.col("total_qty") > 2 * F.col("qty_1998")))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey").isin(3, 5))
    return (
        s.join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS s_acctbal
FROM supplier
WHERE s_nationkey IN (3, 5) AND s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_partkey, l_suppkey,
           SUM(l_quantity) AS total_qty,
           SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
                     AND l_shipdate < TIMESTAMP '1999-01-01'
                    THEN l_quantity ELSE 0 END) AS qty_1998
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    GROUP BY l_partkey, l_suppkey
  ) q WHERE qty_1998 > 0 AND total_qty > 2 * qty_1998
)
ORDER BY s_name
"""


QUERIES["q20_potential_promotion"] = q20_potential_promotion
ORACLES["q20_potential_promotion"] = Q20_SQL


# ---------------------------------------------------------------------------
# Dimension maintenance: CDC merge-upsert and SCD2 effective ranges —
# the two table-maintenance primitives a warehouse/lakehouse pipeline
# runs on every ingest batch (MERGE INTO semantics expressed as
# key-partitioned joins, so they scale as ordinary shuffles)
# ---------------------------------------------------------------------------

def dim_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO expressed declaratively: the update batch (each
    customer's freshest order, found with one ROW_NUMBER window over
    the CDC stream) LEFT-joins onto the base dimension; matched rows
    take the update's value, unmatched keep the current one. Both
    sides shuffle once on the merge key and AQE co-partitions them —
    the exact plan a Delta/Iceberg MERGE compiles to for the
    matched-update case, with no table format required."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("old_bal")
    )
    o = load_table(spark, sf_dir, "orders")
    # (a max_by grouped form A/B-measured slower here — struct ordering
    # keys compare interpreted; see window_topk_per_group note)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    upd = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.round("o_totalprice", 2).alias("new_bal"))
    )
    return c.join(upd, F.col("c_custkey") == F.col("o_custkey"), "left").select(
        "c_custkey",
        "c_name",
        "old_bal",
        F.coalesce(F.col("new_bal"), F.col("old_bal")).alias("merged_bal"),
        F.col("new_bal").isNotNull().alias("updated"),
    )


DIM_MERGE_SQL = """
WITH upd AS (
  SELECT o_custkey, ROUND(o_totalprice, 2) AS new_bal
  FROM (
    SELECT o_custkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS old_bal,
       COALESCE(new_bal, ROUND(c_acctbal, 2)) AS merged_bal,
       new_bal IS NOT NULL AS updated
FROM customer LEFT JOIN upd ON c_custkey = o_custkey
"""


def scd2_status_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 compaction of each customer's
    order-status history: consecutive repeats collapse (a row survives
    only when its status differs from the previous one), then each
    surviving change gets its effective range [from, next-change) with
    an open end on the current version. Two window passes over the
    same (customer, time) ordering — one shuffle, the second window
    reuses the first's sort. This is the standard CDC→SCD2 derivation
    run per ingest batch."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = o.withColumn("prev", F.lag("o_orderstatus").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("o_orderstatus"))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return changes.select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("eff_from"),
        F.date_format(F.lead("o_orderdate").over(w2), "yyyy-MM-dd").alias("eff_to"),
        F.lead("o_orderdate").over(w2).isNull().alias("is_current"),
    )


SCD2_SQL = """
WITH changes AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
  QUALIFY prev IS NULL OR prev <> o_orderstatus
)
SELECT o_custkey, o_orderstatus AS status,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS eff_from,
       STRFTIME(LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                '%Y-%m-%d') AS eff_to,
       LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
FROM changes
"""


QUERIES["dim_merge_upsert"] = dim_merge_upsert
ORACLES["dim_merge_upsert"] = DIM_MERGE_SQL
QUERIES["scd2_status_ranges"] = scd2_status_ranges
ORACLES["scd2_status_ranges"] = SCD2_SQL


# ---------------------------------------------------------------------------
# Bloom-style semi-join reduction: prune the fact scan with a broadcast
# hash-bucket fingerprint of the build side's keys BEFORE the shuffle
# join (operators/prejoin.py). False positives are removed by the exact
# join, so the result — and the oracle — is the plain join's.
# ---------------------------------------------------------------------------

def join_prefilter_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by return flag on urgent orders, with lineitem pruned by
    the bucket pre-filter before the orders⋈lineitem shuffle. At 100 TB
    the urgent-orders key set is millions of rows (un-broadcastable as
    rows) while its bucket fingerprint stays ≤8 MB — the pre-filter
    drops ~80% of lineitem ahead of the expensive shuffle. Correctness
    does not depend on the filter: it only prunes."""
    from csdid_pyspark_spark.operators.prejoin import hash_bucket_prefilter

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    l = load_table(spark, sf_dir, "lineitem")
    l_pruned = hash_bucket_prefilter(l, "l_orderkey", o, "o_orderkey")
    return (
        l_pruned.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(
                _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "30,6"), 2
            ).alias("revenue"),
        )
    )


JOIN_PREFILTER_SQL = """
SELECT l_returnflag, COUNT(*) AS n_lines,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                  AS DOUBLE), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
"""


QUERIES["join_prefilter_bloom"] = join_prefilter_bloom
ORACLES["join_prefilter_bloom"] = JOIN_PREFILTER_SQL


# ---------------------------------------------------------------------------
# Snapshot reconciliation: classify every key of two table versions as
# added / removed / changed / unchanged — the audit pass run after any
# ingest/merge batch. One full-outer join on the key; per-class counts
# plus a key checksum so the oracle pins membership, not just counts.
# ---------------------------------------------------------------------------

def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff the customer dim against a deterministically mutated v2
    (every 97th key deleted, balances refreshed from each customer's
    freshest order, every 89th key re-inserted shifted by 100000 as a
    new row). The diff itself — the operator under test — is one
    key-partitioned FULL OUTER join with null-side classification;
    both snapshots shuffle once on the key and AQE co-partitions
    them, so reconciliation costs one pass at any scale."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    upd = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.round("o_totalprice", 2).alias("new_bal"))
    )
    v2 = (
        c.filter(F.col("c_custkey") % 97 != 0)
        .join(upd, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey", F.coalesce("new_bal", "bal").alias("bal")
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 89 == 0).select(
                (F.col("c_custkey") + 100000).alias("c_custkey"), "bal"
            )
        )
    )
    a = c.select(F.col("c_custkey").alias("k"), F.col("bal").alias("bal_v1"))
    b = v2.select(F.col("c_custkey").alias("k"), F.col("bal").alias("bal_v2"))
    diff = a.join(b, "k", "full_outer").select(
        "k",
        F.when(F.col("bal_v1").isNull(), "added")
        .when(F.col("bal_v2").isNull(), "removed")
        .when(F.col("bal_v1") != F.col("bal_v2"), "changed")
        .otherwise("unchanged")
        .alias("change"),
    )
    return diff.groupBy("change").agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("k").cast("bigint").alias("key_checksum"),
    )


TABLE_DIFF_SQL = """
WITH c AS (SELECT c_custkey, ROUND(c_acctbal, 2) AS bal FROM customer),
upd AS (
  SELECT o_custkey, ROUND(o_totalprice, 2) AS new_bal
  FROM (SELECT o_custkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1
),
v2 AS (
  SELECT c_custkey, COALESCE(new_bal, bal) AS bal
  FROM c LEFT JOIN upd ON c_custkey = o_custkey
  WHERE c_custkey % 97 <> 0
  UNION ALL
  SELECT c_custkey + 100000, bal FROM c WHERE c_custkey % 89 = 0
),
diff AS (
  SELECT COALESCE(a.c_custkey, b.c_custkey) AS k,
         CASE WHEN a.c_custkey IS NULL THEN 'added'
              WHEN b.c_custkey IS NULL THEN 'removed'
              WHEN a.bal <> b.bal THEN 'changed'
              ELSE 'unchanged' END AS change
  FROM c a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey
)
SELECT change, COUNT(*) AS n_keys, CAST(SUM(k) AS BIGINT) AS key_checksum
FROM diff GROUP BY change
"""


# ---------------------------------------------------------------------------
# Interval-overlap join, binned: overlapping per-day activity windows
# across users. The classic scalable theta-join shape — bin intervals
# by a coarse key (day) so the join is an EQUI join with a cheap
# overlap verification, never an unbounded interval × interval
# nested loop.
# ---------------------------------------------------------------------------

def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: how many user pairs had overlapping activity windows
    ([first event, last event] that day). The day bin is the shuffle
    key; inside a bin the overlap predicate is a post-join filter over
    already-co-partitioned rows. At 100 TB the bin granularity is the
    tuning knob (finer bins → smaller per-bin candidate sets; an
    interval spanning bins explodes to one row per bin it touches —
    here intervals are within-day by construction)."""
    e = load_table(spark, sf_dir, "events")
    iv = e.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(F.min("ts").alias("ts_s"), F.max("ts").alias("ts_e"))
    a, b = iv.alias("a"), iv.alias("b")
    pairs = a.join(
        b,
        (F.col("a.d") == F.col("b.d"))
        & (F.col("a.user_id") < F.col("b.user_id"))
        & (F.col("a.ts_s") <= F.col("b.ts_e"))
        & (F.col("b.ts_s") <= F.col("a.ts_e")),
    )
    return pairs.groupBy(
        F.date_format(F.col("a.d"), "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n_overlapping_pairs"))


INTERVAL_OVERLAP_SQL = """
WITH iv AS (
  SELECT user_id, CAST(ts AS DATE) AS d, MIN(ts) AS ts_s, MAX(ts) AS ts_e
  FROM events GROUP BY 1, 2
)
SELECT STRFTIME(a.d, '%Y-%m-%d') AS day, COUNT(*) AS n_overlapping_pairs
FROM iv a JOIN iv b
  ON a.d = b.d AND a.user_id < b.user_id
 AND a.ts_s <= b.ts_e AND b.ts_s <= a.ts_e
GROUP BY 1
"""


QUERIES["table_diff"] = table_diff
ORACLES["table_diff"] = TABLE_DIFF_SQL
QUERIES["interval_overlap_pairs"] = interval_overlap_pairs
ORACLES["interval_overlap_pairs"] = INTERVAL_OVERLAP_SQL


# ---------------------------------------------------------------------------
# Data-quality expectation suite: the dbt-test / expectations pass a
# pipeline runs after every load — uniqueness, referential integrity,
# null rates, accepted ranges — emitted as one row per check so the
# report is a tiny fixed-size table however large the inputs.
# ---------------------------------------------------------------------------

def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five standard expectations over the orders/customer pair. Each
    check is a full-scan aggregate (count/distinct/conditional-sum)
    that partial-aggregates map-side; the orphan-FK check is a
    broadcastable anti-join count. One row per check: measured metric
    and pass flag — the shape monitoring systems ingest."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    pk = o.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).cast("bigint").alias("m")
    ).select(F.lit("orders_pk_unique").alias("check"), "m", (F.col("m") == 0).alias("pass"))
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").cast("bigint").alias("m"))
        .select(F.lit("orders_fk_customer").alias("check"), "m", (F.col("m") == 0).alias("pass"))
    )
    nulls = o.agg(
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("m")
    ).select(F.lit("orderdate_not_null").alias("check"), "m", (F.col("m") == 0).alias("pass"))
    rng = o.agg(
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).cast("bigint").alias("m")
    ).select(F.lit("totalprice_positive").alias("check"), "m", (F.col("m") == 0).alias("pass"))
    accepted = o.agg(
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).cast("bigint").alias("m")
    ).select(
        F.lit("orderstatus_accepted_values").alias("check"),
        "m",
        (F.col("m") == 0).alias("pass"),
    )
    return pk.unionByName(orphans).unionByName(nulls).unionByName(rng).unionByName(accepted)


DQ_CHECKS_SQL = """
SELECT 'orders_pk_unique' AS check,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS m,
       COUNT(*) - COUNT(DISTINCT o_orderkey) = 0 AS pass FROM orders
UNION ALL
SELECT 'orders_fk_customer', CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
FROM orders ANTI JOIN customer ON o_custkey = c_custkey
UNION ALL
SELECT 'orderdate_not_null',
       CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) = 0 FROM orders
UNION ALL
SELECT 'totalprice_positive',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0 FROM orders
UNION ALL
SELECT 'orderstatus_accepted_values',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) = 0
FROM orders
"""


# ---------------------------------------------------------------------------
# Null-safe equi-join (<=> / IS NOT DISTINCT FROM): join keys where
# NULL must match NULL — the semantic CDC/merge pipelines need when the
# key is an optional attribute rather than a primary key.
# ---------------------------------------------------------------------------

def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders bucketed by a NULLABLE derived attribute (priority digit,
    NULL for '4-NOT SPECIFIED') joined null-safely to the distinct
    attribute list — plain equality would silently drop every NULL-key
    row (here ~20% of orders). Spark's eqNullSafe compiles to the same
    hash join as = (NULL hashes like a value), so null-safety costs
    nothing at scale."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "prio_digit",
        F.when(
            F.col("o_orderpriority") != "4-NOT SPECIFIED",
            F.substring("o_orderpriority", 1, 1).cast("int"),
        ),
    )
    dims = o.select("prio_digit").distinct()
    return (
        o.join(dims.withColumnRenamed("prio_digit", "k"), F.col("prio_digit").eqNullSafe(F.col("k")))
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )


JOIN_NULL_SAFE_SQL = """
WITH o AS (
  SELECT CASE WHEN o_orderpriority <> '4-NOT SPECIFIED'
              THEN CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) END AS prio_digit
  FROM orders
),
dims AS (SELECT DISTINCT prio_digit AS k FROM o)
SELECT k, COUNT(*) AS n_orders
FROM o JOIN dims ON prio_digit IS NOT DISTINCT FROM k
GROUP BY k
"""


QUERIES["dq_checks"] = dq_checks
ORACLES["dq_checks"] = DQ_CHECKS_SQL
QUERIES["join_null_safe"] = join_null_safe
ORACLES["join_null_safe"] = JOIN_NULL_SAFE_SQL


# ---------------------------------------------------------------------------
# Fuzzy (edit-distance ≤ 1) token matching via deletion-neighborhood
# blocking — the SymSpell trick: two strings are within one edit iff
# their single-deletion neighborhoods intersect, so candidate
# generation is an EQUI join on deletion keys (O(vocab · token_len)
# keys) instead of a quadratic cross join, and an exact levenshtein
# verification removes the rare key collisions at distance 2.
# ---------------------------------------------------------------------------

def fuzzy_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 pairs over the corpus token vocabulary plus a
    deterministic typo set (each token minus its first character —
    the testdata vocabulary has no natural typos). The oracle is the
    exact quadratic levenshtein join, so this checks that blocking
    finds EVERY pair the cross join finds; at scale only the blocked
    path is runnable (candidates linear in vocabulary, never vocab²)."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"))
        .filter(F.length("tok") >= 4)
        .distinct()
    )
    vocab = toks.unionByName(
        toks.select(F.substring("tok", 2, 10_000).alias("tok"))
    ).distinct()
    keys = vocab.select(
        "tok",
        F.explode(
            F.expr(
                "array_union(array(tok), transform(sequence(1, length(tok)), "
                "i -> concat(substring(tok, 1, i - 1), substring(tok, i + 1, length(tok)))))"
            )
        ).alias("k"),
    )
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.tok") < F.col("b.tok")))
        .select(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .distinct()
    )
    return cand.filter(F.levenshtein("tok_a", "tok_b") <= 1).orderBy("tok_a", "tok_b")


FUZZY_TOKEN_SQL = r"""
WITH toks AS (
  SELECT DISTINCT lower(t.tok) AS tok
  FROM documents, UNNEST(string_split_regex(trim(lower(text)), '\s+')) t(tok)
  WHERE len(t.tok) >= 4
),
vocab AS (SELECT tok FROM toks UNION SELECT substring(tok, 2) FROM toks)
SELECT a.tok AS tok_a, b.tok AS tok_b
FROM vocab a JOIN vocab b ON a.tok < b.tok AND levenshtein(a.tok, b.tok) <= 1
ORDER BY tok_a, tok_b
"""


QUERIES["fuzzy_token_pairs"] = fuzzy_token_pairs
ORACLES["fuzzy_token_pairs"] = FUZZY_TOKEN_SQL


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (frequent-pairs with support and lift) —
# the association-rules primitive. The pair space is bounded by the
# per-basket self-join (Σ basket_size², baskets are small), never a
# catalog-wide cross join; a broadcast of per-item supports supplies
# the lift denominator.
# ---------------------------------------------------------------------------

def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top part-brand pairs co-occurring within an order: support
    (co-occurrence count), each side's marginal basket count, and lift
    = P(a,b) / (P(a)·P(b)). Brands (25 distinct) keep the demo output
    compact; the plan is the production one for item-level pairs —
    per-basket distinct, basket self-join on the order key, pair
    aggregation, broadcast marginals."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    # basket total as a lazy 1-row broadcast scalar (q15 pattern) —
    # no eager driver action at plan-build time
    nb = items.agg(F.countDistinct("l_orderkey").cast("double").alias("n_baskets"))
    marg = items.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count("*").alias("n_brand")
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count("*").cast("bigint").alias("support"))
    )
    ma = marg.select(F.col("brand").alias("brand_a"), F.col("n_brand").alias("n_a"))
    mb = marg.select(F.col("brand").alias("brand_b"), F.col("n_brand").alias("n_b"))
    return (
        pairs.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "brand_a",
            "brand_b",
            "support",
            F.round(
                F.col("support") * F.col("n_baskets") / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "brand_a", "brand_b")
        .limit(20)
    )


BASKET_LIFT_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
marg AS (SELECT p_brand AS brand, COUNT(*) AS n_brand FROM items GROUP BY 1),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS support
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, support,
       ROUND(support * (SELECT CAST(n AS DOUBLE) FROM nb) / (ma.n_brand * mb.n_brand), 6) AS lift
FROM pairs
JOIN marg ma ON ma.brand = brand_a
JOIN marg mb ON mb.brand = brand_b
ORDER BY support DESC, brand_a, brand_b
LIMIT 20
"""


QUERIES["basket_pair_lift"] = basket_pair_lift
ORACLES["basket_pair_lift"] = BASKET_LIFT_SQL


def sketch_hll_partitioned_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-aggregated sketch-TABLE pattern — how 100 TB dashboards
    actually count distincts: materialize one mergeable Datasketches
    HLL binary per partition key (here per event_type), then answer
    the global question by UNIONING the sketches, never rescanning
    the raw data. Users overlap across event types, so the union is
    genuinely non-additive (Σ per-type NDV ≫ union NDV). One pass
    over events builds the per-type sketches; the union/estimate runs
    on 5 binary blobs. Register-max merges are order-independent ⇒
    deterministic on fixed data ⇒ pinned VALUES golden; pytest bounds
    the union estimate vs exact COUNT(DISTINCT)."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("sk")
    )
    # the sketch table is |event_type| binary blobs — checkpoint it so
    # the union pass reuses it instead of rescanning events
    per = per.localCheckpoint(eager=True)
    per_est = per.select(
        "event_type", F.hll_sketch_estimate("sk").cast("bigint").alias("ndv_users")
    )
    union_est = per.agg(F.hll_union_agg(F.col("sk")).alias("sk")).select(
        F.lit("__union__").alias("event_type"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("ndv_users"),
    )
    return per_est.unionAll(union_est)


QUERIES["sketch_hll_partitioned_union"] = sketch_hll_partitioned_union


# ---------------------------------------------------------------------------
# Grouped weighted median (exact, two-phase grouped scan)
# ---------------------------------------------------------------------------


def groupby_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median of l_extendedprice per return
    flag — the robust per-segment price statistic groupby_median can't
    give (percentile() weights every row equally). Lower weighted
    median: the smallest price whose inclusive cumulative weight
    reaches half the group total, decided on exact DECIMAL weights
    (2*cum >= tot — no float boundary). The cumulative weights come
    from operators/packing.py::grouped_rank with sum_col: ONE range
    shuffle over (flag, price) on the VALUE-AGGREGATED table plus a
    broadcast of per-(partition, group) bases — never a
    whole-group-through-one-task ``SUM() OVER (PARTITION BY flag
    ORDER BY price)`` window."""
    from csdid_pyspark_spark.cache import release_cache
    from csdid_pyspark_spark.operators.packing import grouped_rank

    l = load_table(spark, sf_dir, "lineitem")
    byv = (
        l.groupBy("l_returnflag", "l_extendedprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("w")
        )
    )
    gr = grouped_rank(
        byv, ["l_returnflag"], ["l_extendedprice"], sum_col="w"
    )
    tot = F.broadcast(
        spark.createDataFrame(
            [(k[0], v) for k, v in sorted(gr.group_sums.items())],
            "l_returnflag string, tot decimal(38,6)",
        )
    )
    out = (
        gr.df.join(tot, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.max("tot").cast("double"), 6).alias("total_weight"),
            F.round(
                F.min(
                    F.when(
                        F.col("cum_w") * 2 >= F.col("tot"),
                        F.col("l_extendedprice"),
                    )
                ),
                6,
            ).alias("wmedian"),
        )
        .orderBy("l_returnflag")
    )
    result = out.localCheckpoint(eager=True)
    release_cache(gr.df)
    return result


GROUPBY_WMEDIAN_SQL = """
WITH byv AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, l_extendedprice, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM byv
)
SELECT l_returnflag,
       ROUND(CAST(MAX(tot) AS DOUBLE), 6) AS total_weight,
       ROUND(MIN(CASE WHEN cw * 2 >= tot THEN l_extendedprice END), 6) AS wmedian
FROM cum GROUP BY 1 ORDER BY l_returnflag
"""

QUERIES["groupby_weighted_median"] = groupby_weighted_median
ORACLES["groupby_weighted_median"] = GROUPBY_WMEDIAN_SQL


def groupby_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted lower quartiles (p25/p50/p75) of l_extendedprice per
    return flag — the full-distribution companion to
    groupby_weighted_median, from the SAME single grouped cum-weight
    scan. Each quantile is the smallest price whose inclusive
    cumulative weight reaches p of the group total, decided with
    integer-scaled exact DECIMAL compares (4*cum >= tot, 2*cum >= tot,
    4*cum >= 3*tot) so no boundary ever rides a float."""
    from csdid_pyspark_spark.cache import release_cache
    from csdid_pyspark_spark.operators.packing import grouped_rank

    l = load_table(spark, sf_dir, "lineitem")
    byv = (
        l.groupBy("l_returnflag", "l_extendedprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("w"))
    )
    gr = grouped_rank(byv, ["l_returnflag"], ["l_extendedprice"], sum_col="w")
    tot = F.broadcast(
        spark.createDataFrame(
            [(k[0], v) for k, v in sorted(gr.group_sums.items())],
            "l_returnflag string, tot decimal(38,6)",
        )
    )
    c, t, v = F.col("cum_w"), F.col("tot"), F.col("l_extendedprice")
    out = (
        gr.df.join(tot, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min(F.when(c * 4 >= t, v)), 6).alias("wp25"),
            F.round(F.min(F.when(c * 2 >= t, v)), 6).alias("wp50"),
            F.round(F.min(F.when(c * 4 >= t * 3, v)), 6).alias("wp75"),
        )
        .orderBy("l_returnflag")
    )
    result = out.localCheckpoint(eager=True)
    release_cache(gr.df)
    return result


GROUPBY_WQUANTILES_SQL = """
WITH byv AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, l_extendedprice, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM byv
)
SELECT l_returnflag,
       ROUND(MIN(CASE WHEN cw * 4 >= tot THEN l_extendedprice END), 6) AS wp25,
       ROUND(MIN(CASE WHEN cw * 2 >= tot THEN l_extendedprice END), 6) AS wp50,
       ROUND(MIN(CASE WHEN cw * 4 >= tot * 3 THEN l_extendedprice END), 6) AS wp75
FROM cum GROUP BY 1 ORDER BY l_returnflag
"""

QUERIES["groupby_weighted_quantiles"] = groupby_weighted_quantiles
ORACLES["groupby_weighted_quantiles"] = GROUPBY_WQUANTILES_SQL
