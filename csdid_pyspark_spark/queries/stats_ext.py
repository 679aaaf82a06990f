"""Distribution-comparison statistics for experimentation readouts.

The reference engine (d2cml-ai/csdid-pyspark) ships exactly one
inference family — the DiD estimator's normal-approximation and
multiplier-bootstrap SEs (ATTgt.py, mboot.py). A platform running that
estimator on experiment data also needs the standard model-free
two-sample checks, so this module adds them as oracle-checked queries,
each sharing the A/B assignment hash of ``events_ab_srm_check``
(pipeline_ext.py — 31-bit-masked Knuth multiplicative hash, identical
integer arithmetic in Spark and DuckDB):

* ``events_welch_ttest`` — per-metric Welch unequal-variance t with
  Welch-Satterthwaite df, from decimal-exact moments (sums and
  sums-of-squares accumulate as DECIMAL, so the statistic is
  independent of partial-aggregation order — the float-sum
  nondeterminism trap).
* ``events_mannwhitney_u`` — rank-sum U with midrank tie handling and
  the tie-corrected normal approximation. Pooled ranks come from the
  two-phase distributed scan (operators/packing.py::global_rank_cumsum)
  over the VALUE-AGGREGATED table: rank arithmetic on (value, count)
  groups, never a data-scale ``ROW_NUMBER() OVER (ORDER BY value)``
  through one reducer. Doubling the midranks keeps every intermediate
  an exact integer-valued decimal.
* ``events_ks_test`` — two-sample Kolmogorov-Smirnov D as the max
  pooled-ECDF gap; both arms' cumulative counts come from ONE
  two-phase scan (operators/packing.py::global_cumsums), the
  multi-measure variant built for exactly this shape.
* ``dq_benford_digits`` — first-significant-digit distribution of
  order totals vs Benford's law with per-digit chi-square terms (the
  classic bulk-data fraud/corruption screen). The digit comes from a
  pure comparison cascade — no log10 in the data path, so no
  cross-libm rounding hazard at power-of-ten boundaries.
* ``events_autocorrelation`` — ACF of the daily event-count series at
  lags 1..7, every sum an exact BIGINT (double math only on the final
  per-lag scalars, written in oracle-identical operation order).
* ``events_user_concentration`` — per-user modal-type-share decile
  distribution, the automation screen; the decile is exact integer
  division so bucketing never rides a float boundary.

All hot-path math is built-in JVM expressions; every query has an
ANSI oracle below. Outputs are rounded at 6dp only at the edge.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from csdid_pyspark_spark.cache import release_cache
from csdid_pyspark_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# A/B arm from bit 31 of the masked Knuth multiply — the same
# construction (and rationale comments) as srm_frame, pipeline_ext.py:
# masking to 31 bits first keeps the product inside int64 on both
# engines for any id, and the HIGH bit of the product actually mixes
# (the low bit of an odd-multiplier product is just input parity).


def _arm() -> F.Column:
    masked = F.pmod(F.col("user_id"), F.lit(2147483648))
    return (
        F.pmod(masked * 2654435761, F.lit(4294967296)) / F.lit(2147483648)
    ).cast("bigint")


_ARM_SQL = (
    "CAST(((user_id % 2147483648) * 2654435761) % 4294967296"
    " // 2147483648 AS BIGINT)"
)

# ---------------------------------------------------------------------------
# Welch two-sample t-test per metric
# ---------------------------------------------------------------------------


def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t per event_type between the two hash
    arms. One data-scale aggregation (map-side combinable); moments
    accumulate as DECIMAL so every engine — and every partial-sum
    order — produces bit-identical statistics: value rounds once into
    DECIMAL(18,6), its square is the exact DECIMAL(37,12) product, and
    the mean/variance/t arithmetic runs in double on those exact
    inputs, mirrored operation-for-operation by the oracle."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = F.col("value").cast("decimal(18,6)")
    per_arm = (
        e.select(F.col("event_type"), _arm().alias("arm"), d.alias("d"))
        .groupBy("event_type", "arm")
        .agg(
            F.count("*").alias("n"),
            F.sum("d").alias("s1"),
            F.sum(F.col("d") * F.col("d")).alias("s2"),
        )
    )
    both = per_arm.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("s1"))).cast("double").alias("s1_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("s1"))).cast("double").alias("s1_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("s2"))).cast("double").alias("s2_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("s2"))).cast("double").alias("s2_b"),
    )
    # degenerate-arm guard: an event_type whose values all land in one
    # arm (or with a single value in an arm) would otherwise emit
    # NULL/NaN statistics with no signal — fail loudly instead. The
    # branch never fires on a healthy split, so it adds no output and
    # changes no hash; raise_error keeps the guard declarative (no
    # extra driver-side action on the hot path).
    _bad = (
        F.col("n_a").isNull()
        | F.col("n_b").isNull()
        | (F.col("n_a") < 2)
        | (F.col("n_b") < 2)
    )
    _guarded_n_a = F.when(
        _bad,
        F.raise_error(
            F.concat(
                F.lit("events_welch_ttest: event_type '"),
                F.col("event_type"),
                F.lit("' has a degenerate arm (needs >=2 values in both arms; got n_a="),
                F.coalesce(F.col("n_a").cast("string"), F.lit("0")),
                F.lit(", n_b="),
                F.coalesce(F.col("n_b").cast("string"), F.lit("0")),
                F.lit(")"),
            )
        ).cast("bigint"),
    ).otherwise(F.col("n_a"))
    ma = F.col("s1_a") / _guarded_n_a
    mb = F.col("s1_b") / F.col("n_b")
    va = (F.col("s2_a") - F.col("s1_a") * F.col("s1_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    vb = (F.col("s2_b") - F.col("s1_b") * F.col("s1_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    sa = va / F.col("n_a")
    sb = vb / F.col("n_b")
    t = (ma - mb) / F.sqrt(sa + sb)
    dfw = ((sa + sb) * (sa + sb)) / (
        sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1)
    )
    return both.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dfw, 6).alias("df_welch"),
    ).orderBy("event_type")


WELCH_SQL = f"""
WITH per_arm AS (
  SELECT event_type, {_ARM_SQL} AS arm, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS s1,
         SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS s2
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
paired AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 0 THEN s1 END) AS DOUBLE) AS s1_a,
         CAST(SUM(CASE WHEN arm = 1 THEN s1 END) AS DOUBLE) AS s1_b,
         CAST(SUM(CASE WHEN arm = 0 THEN s2 END) AS DOUBLE) AS s2_a,
         CAST(SUM(CASE WHEN arm = 1 THEN s2 END) AS DOUBLE) AS s2_b
  FROM per_arm GROUP BY 1
)
SELECT event_type, n_a, n_b,
       ROUND(s1_a / n_a, 6) AS mean_a,
       ROUND(s1_b / n_b, 6) AS mean_b,
       ROUND((s1_a / n_a - s1_b / n_b)
             / SQRT(((s2_a - s1_a * s1_a / n_a) / (n_a - 1)) / n_a
                    + ((s2_b - s1_b * s1_b / n_b) / (n_b - 1)) / n_b),
             6) AS t_stat,
       ROUND((((s2_a - s1_a * s1_a / n_a) / (n_a - 1)) / n_a
              + ((s2_b - s1_b * s1_b / n_b) / (n_b - 1)) / n_b)
             * (((s2_a - s1_a * s1_a / n_a) / (n_a - 1)) / n_a
                + ((s2_b - s1_b * s1_b / n_b) / (n_b - 1)) / n_b)
             / ((((s2_a - s1_a * s1_a / n_a) / (n_a - 1)) / n_a)
                * (((s2_a - s1_a * s1_a / n_a) / (n_a - 1)) / n_a) / (n_a - 1)
                + (((s2_b - s1_b * s1_b / n_b) / (n_b - 1)) / n_b)
                  * (((s2_b - s1_b * s1_b / n_b) / (n_b - 1)) / n_b) / (n_b - 1)),
             6) AS df_welch
FROM paired ORDER BY event_type
"""

QUERIES["events_welch_ttest"] = events_welch_ttest
ORACLES["events_welch_ttest"] = WELCH_SQL

# ---------------------------------------------------------------------------
# Mann-Whitney U (midranks, tie-corrected normal approximation)
# ---------------------------------------------------------------------------


def events_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-sum test between the two hash arms over the pooled value
    distribution. Ranks are computed on the (value, count) aggregate —
    one data-scale groupBy, then the two-phase scan ranks DISTINCT
    values (operators/packing.py::global_rank_cumsum: range shuffle +
    broadcast per-partition bases; no single-reducer window). The
    midrank of a tie block ending at inclusive cumulative count c with
    multiplicity m is (2c - m + 1)/2; keeping 2x-midranks makes the
    rank-sum an exact integer-valued decimal, so U is exact and the
    tie-corrected z is a deterministic function of exact integers:

        U_a = R_a - n_a(n_a+1)/2
        sigma^2 = n_a n_b / 12 * ((n+1) - T / (n(n-1))),  T = sum(m^3 - m)
        z = (U_a - n_a n_b / 2) / sigma
    """
    from csdid_pyspark_spark.operators.packing import global_rank_cumsum

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    byval = (
        e.select(F.col("value"), _arm().alias("arm"))
        .groupBy("value")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("cnt_a"),
        )
    )
    scan = global_rank_cumsum(byval, ["value"], "cnt", cum_col="cum")
    ranked = scan.df
    # 2*midrank = 2*cum - cnt + 1 (exact integer as decimal); the tie
    # term m^3 - m widens through DECIMAL(12,0) products so a value
    # with up to 1e12 duplicates stays exact in DECIMAL(38,0).
    m12 = F.col("cnt").cast("decimal(12,0)")
    stats = (
        ranked.select(
            (
                F.col("cnt_a").cast("decimal(30,6)")
                * (F.lit(2) * F.col("cum") - F.col("cnt") + 1)
            ).alias("r2_a"),
            F.col("cnt_a"),
            F.col("cnt"),
            (m12 * m12 * m12 - m12).cast("decimal(38,0)").alias("tie"),
        )
        .agg(
            F.sum("r2_a").cast("double").alias("r2_a"),
            F.sum("cnt_a").cast("bigint").alias("n_a"),
            F.sum("cnt").cast("bigint").alias("n"),
            F.sum("tie").cast("double").alias("t_ties"),
        )
    )
    # degenerate-arm guard (see events_welch_ttest): all values in one
    # arm would make sigma 0 and z NULL — raise instead, declaratively.
    n_a = F.when(
        (F.col("n_a") <= 0) | (F.col("n_a") >= F.col("n")),
        F.raise_error(
            F.concat(
                F.lit("events_mannwhitney_u: degenerate split (n_a="),
                F.col("n_a").cast("string"),
                F.lit(" of n="),
                F.col("n").cast("string"),
                F.lit("); both arms must be non-empty"),
            )
        ).cast("bigint"),
    ).otherwise(F.col("n_a"))
    n_b = F.col("n") - n_a
    u_a = F.col("r2_a") / 2 - n_a * (n_a + 1) / 2
    sigma2 = (
        n_a * n_b / F.lit(12.0)
        * ((F.col("n") + 1) - F.col("t_ties") / (F.col("n") * (F.col("n") - 1)))
    )
    out = stats.select(
        n_a.alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
        F.round(u_a, 1).alias("u_a"),
        F.round((u_a - n_a * n_b / 2) / F.sqrt(sigma2), 6).alias("z_stat"),
    )
    result = out.localCheckpoint(eager=True)
    release_cache(ranked)
    return result


MWU_SQL = f"""
WITH byval AS (
  SELECT value, COUNT(*) AS cnt,
         SUM(CASE WHEN {_ARM_SQL} = 0 THEN 1 ELSE 0 END) AS cnt_a
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
ranked AS (
  SELECT cnt, cnt_a,
         SUM(CAST(cnt AS DECIMAL(30,6))) OVER (ORDER BY value) AS cum
  FROM byval
),
stats AS (
  SELECT CAST(SUM(CAST(cnt_a AS DECIMAL(30,6)) * (2 * cum - cnt + 1)) AS DOUBLE) AS r2_a,
         CAST(SUM(cnt_a) AS BIGINT) AS n_a,
         CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(CAST(CAST(cnt AS DECIMAL(12,0)) * CAST(cnt AS DECIMAL(12,0))
                       * CAST(cnt AS DECIMAL(12,0)) - cnt AS DECIMAL(38,0)))
              AS DOUBLE) AS t_ties
  FROM ranked
)
SELECT n_a, CAST(n - n_a AS BIGINT) AS n_b,
       ROUND(r2_a / 2 - n_a * (n_a + 1) / 2, 1) AS u_a,
       ROUND((r2_a / 2 - n_a * (n_a + 1) / 2 - n_a * (n - n_a) / 2)
             / SQRT(n_a * (n - n_a) / 12.0
                    * ((n + 1) - t_ties / (n * (n - 1)))), 6) AS z_stat
FROM stats
"""

QUERIES["events_mannwhitney_u"] = events_mannwhitney_u
ORACLES["events_mannwhitney_u"] = MWU_SQL

# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov
# ---------------------------------------------------------------------------


def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS between the hash arms: D = max over pooled values
    of |ECDF_a - ECDF_b|. Both arms' cumulative counts come from ONE
    two-phase scan over the value aggregate
    (operators/packing.py::global_cumsums — the multi-measure scan:
    one range shuffle, per-partition (count_a, count_b) bases
    broadcast back), never two passes or a single-reducer window.
    ``value_at_max`` is the smallest value attaining D (deterministic
    under ties); ``ks_scaled`` = sqrt(n_a n_b / n) * D, the statistic
    compared against the Kolmogorov distribution."""
    from csdid_pyspark_spark.operators.packing import global_cumsums

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    byval = (
        e.select(F.col("value"), _arm().alias("arm"))
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("cnt_b"),
        )
    )
    mc = global_cumsums(byval, ["value"], ["cnt_a", "cnt_b"])
    n_a, n_b = int(mc.totals["cnt_a"]), int(mc.totals["cnt_b"])
    if n_a == 0 or n_b == 0:
        release_cache(mc.df)
        raise ValueError(
            f"events_ks_test: degenerate split — arm A has {n_a} values "
            f"and arm B has {n_b}; a two-sample KS needs both arms "
            f"non-empty (is the id population a single user, or the "
            f"value column all-null in one arm?)."
        )
    gaps = mc.df.select(
        "value",
        (
            F.abs(
                F.col("cum_cnt_a").cast("double") / F.lit(float(n_a))
                - F.col("cum_cnt_b").cast("double") / F.lit(float(n_b))
            )
        ).alias("gap"),
    )
    dmax = gaps.agg(F.max("gap").alias("d"))
    out = (
        gaps.crossJoin(F.broadcast(dmax))
        .filter(F.col("gap") == F.col("d"))
        .agg(
            F.lit(n_a).cast("bigint").alias("n_a"),
            F.lit(n_b).cast("bigint").alias("n_b"),
            F.round(F.min("d"), 6).alias("d_stat"),
            F.round(
                F.min("d")
                * math.sqrt(n_a * n_b / float(n_a + n_b)),
                6,
            ).alias("ks_scaled"),
            F.round(F.min("value"), 6).alias("value_at_max"),
        )
    )
    result = out.localCheckpoint(eager=True)
    release_cache(mc.df)  # attachments don't survive .select(): release the carrier
    return result


KS_SQL = f"""
WITH byval AS (
  SELECT value,
         SUM(CASE WHEN {_ARM_SQL} = 0 THEN 1 ELSE 0 END) AS cnt_a,
         SUM(CASE WHEN {_ARM_SQL} = 1 THEN 1 ELSE 0 END) AS cnt_b
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
tot AS (SELECT SUM(cnt_a) AS n_a, SUM(cnt_b) AS n_b FROM byval),
gaps AS (
  SELECT value,
         ABS(CAST(SUM(CAST(cnt_a AS DECIMAL(30,6))) OVER (ORDER BY value) AS DOUBLE)
               / (SELECT CAST(n_a AS DOUBLE) FROM tot)
             - CAST(SUM(CAST(cnt_b AS DECIMAL(30,6))) OVER (ORDER BY value) AS DOUBLE)
               / (SELECT CAST(n_b AS DOUBLE) FROM tot)) AS gap
  FROM byval
)
SELECT CAST((SELECT n_a FROM tot) AS BIGINT) AS n_a,
       CAST((SELECT n_b FROM tot) AS BIGINT) AS n_b,
       ROUND(MIN(gap), 6) AS d_stat,
       ROUND(MIN(gap) * SQRT((SELECT n_a * n_b / CAST(n_a + n_b AS DOUBLE) FROM tot)),
             6) AS ks_scaled,
       ROUND(MIN(value), 6) AS value_at_max
FROM gaps WHERE gap = (SELECT MAX(gap) FROM gaps)
"""

QUERIES["events_ks_test"] = events_ks_test
ORACLES["events_ks_test"] = KS_SQL

# ---------------------------------------------------------------------------
# Benford first-digit screen
# ---------------------------------------------------------------------------

# Expected Benford mass log10(1 + 1/d), inlined as identical literals
# in both engines (no runtime log in either data path).
_BENFORD_P = {d: round(math.log10(1.0 + 1.0 / d), 12) for d in range(1, 10)}


def _first_digit_spark() -> F.Column:
    """First significant digit of a positive double by comparison
    cascade — floor(x / 10^k) for the largest power of ten <= x. Pure
    compare + divide + floor (identical IEEE ops in DuckDB), unlike a
    log10-based extraction whose libm rounding at exact powers of ten
    is engine-specific."""
    x = F.col("o_totalprice")
    expr = F.floor(x)  # x in [1, 10)
    for k in range(1, 10):
        p = float(10 ** k)
        expr = F.when(x >= p, F.floor(x / F.lit(p))).otherwise(expr)
    return expr.cast("int")


def _first_digit_sql() -> str:
    s = "FLOOR(o_totalprice)"
    for k in range(1, 10):
        p = float(10 ** k)
        s = f"CASE WHEN o_totalprice >= {p!r} THEN FLOOR(o_totalprice / {p!r}) ELSE {s} END"
    return f"CAST({s} AS INT)"


def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against
    Benford's law — the bulk-ledger anomaly screen (fabricated or
    price-floored totals show up as digit-mass excess). One map-side
    combinable aggregation over orders; expected masses are shared
    12dp literals; chi2_term = (obs - n p)^2 / (n p) per digit sums to
    the 8-df test statistic."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    counts = o.select(_first_digit_spark().alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n_digit")
    )
    tot = counts.agg(F.sum("n_digit").alias("tot"))
    p_expr = F.lit(None).cast("double")
    for d, p in _BENFORD_P.items():
        p_expr = F.when(F.col("digit") == d, F.lit(p)).otherwise(p_expr)
    return (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("exp_n", F.col("tot") * p_expr)
        .select(
            "digit",
            F.col("n_digit").cast("bigint").alias("n_digit"),
            F.round(F.col("n_digit") / F.col("tot"), 6).alias("obs_freq"),
            F.round(p_expr, 6).alias("exp_freq"),
            F.round(
                (F.col("n_digit") - F.col("exp_n"))
                * (F.col("n_digit") - F.col("exp_n"))
                / F.col("exp_n"),
                6,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# CAST ... AS DOUBLE matters: DuckDB parses a bare float literal as
# DECIMAL, so without it exp_freq comes back typed Decimal (not
# double) and the driver's typed compare rejects equal values.
_BENFORD_CASE_SQL = "CAST(CASE digit " + " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items()
) + " END AS DOUBLE)"

BENFORD_SQL = f"""
WITH counts AS (
  SELECT {_first_digit_sql()} AS digit, COUNT(*) AS n_digit
  FROM orders WHERE o_totalprice > 0 GROUP BY 1
),
tot AS (SELECT SUM(n_digit) AS tot FROM counts)
SELECT digit, CAST(n_digit AS BIGINT) AS n_digit,
       ROUND(n_digit / (SELECT CAST(tot AS DOUBLE) FROM tot), 6) AS obs_freq,
       ROUND({_BENFORD_CASE_SQL}, 6) AS exp_freq,
       ROUND((n_digit - (SELECT tot FROM tot) * {_BENFORD_CASE_SQL})
             * (n_digit - (SELECT tot FROM tot) * {_BENFORD_CASE_SQL})
             / ((SELECT tot FROM tot) * {_BENFORD_CASE_SQL}),
             6) AS chi2_term
FROM counts ORDER BY digit
"""

QUERIES["dq_benford_digits"] = dq_benford_digits
ORACLES["dq_benford_digits"] = BENFORD_SQL

# ---------------------------------------------------------------------------
# Daily-series autocorrelation
# ---------------------------------------------------------------------------


def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF of the daily event-count series at lags 1..7 — the
    week-structure screen that complements events_seasonality_strength
    (which decomposes variance but reports no per-lag correlation).

    r_k = sum_t (x_t - xbar)(x_{t+k} - xbar) / sum_t (x_t - xbar)^2
    over observed day pairs, expanded so every SUM is exact (counts,
    squares, and lag cross-products of daily counts — no float
    accumulates across partitions; the only double math is the per-lag
    scalar expression on those exact sums, written in the same
    operation order as the oracle). Squares and cross-products widen
    through DECIMAL(14,0) before summing — at 100 TB a day can hold
    ~3e8 events, so sum(x^2) ~ 3e19 silently wraps int64 in non-ANSI
    Spark while DuckDB promotes; DECIMAL(38,0) keeps both engines
    exact and identical up to 1e14 events/day. The daily aggregate is
    the single data-scale pass; the per-lag self-join runs on the tiny
    daily frame with the lag spine and global moments broadcast."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(F.col("ts").cast("date").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("x"))
    )
    x14 = F.col("x").cast("decimal(14,0)")
    g = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(x14 * x14).cast("decimal(38,0)").alias("ss"),
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(
            F.broadcast(b),
            F.col("b.d") == F.date_add(F.col("a.d"), F.col("lag")),
        )
        .groupBy("lag")
        .agg(
            F.count("*").cast("bigint").alias("m"),
            F.sum(
                F.col("a.x").cast("decimal(14,0)")
                * F.col("b.x").cast("decimal(14,0)")
            ).cast("decimal(38,0)").alias("sxy"),
            F.sum(F.col("a.x")).cast("bigint").alias("sx"),
            F.sum(F.col("b.x")).cast("bigint").alias("sy"),
        )
    )
    xbar = F.col("s").cast("double") / F.col("n")
    numer = (
        F.col("sxy").cast("double")
        - xbar * F.col("sx")
        - xbar * F.col("sy")
        + F.col("m") * xbar * xbar
    )
    denom = F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    return (
        pairs.crossJoin(F.broadcast(g))
        .select(
            F.col("lag").cast("bigint").alias("lag"),
            F.col("m").alias("m_pairs"),
            F.round(numer / denom, 6).alias("acf"),
        )
        .orderBy("lag")
    )


ACF_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x FROM events GROUP BY 1
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(CAST(x AS DECIMAL(14,0)) * CAST(x AS DECIMAL(14,0)))
              AS DECIMAL(38,0)) AS ss
  FROM daily
),
lags AS (SELECT CAST(k AS INT) AS lag FROM range(1, 8) t(k)),
pairs AS (
  SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(CAST(a.x AS DECIMAL(14,0)) * CAST(b.x AS DECIMAL(14,0)))
              AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(a.x) AS BIGINT) AS sx,
         CAST(SUM(b.x) AS BIGINT) AS sy
  FROM lags l, daily a
  JOIN daily b ON b.d = a.d + l.lag
  GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag, m AS m_pairs,
       ROUND((CAST(sxy AS DOUBLE)
              - (CAST(s AS DOUBLE) / n) * sx
              - (CAST(s AS DOUBLE) / n) * sy
              + m * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
             / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n),
             6) AS acf
FROM pairs, g ORDER BY lag
"""

QUERIES["events_autocorrelation"] = events_autocorrelation
ORACLES["events_autocorrelation"] = ACF_SQL

# ---------------------------------------------------------------------------
# Per-user behavioral concentration (automation screen)
# ---------------------------------------------------------------------------


def events_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-user event-type concentration — the
    max-share decile screen that flags automation (a scripted client
    hammers one event_type, so its top-type share sits at 1.0 while
    organic users spread across types). Per user: c_max = count of the
    modal type, n_ev = total events; the decile is the EXACT integer
    (10 * c_max) div n_ev (0..10 — 10 means single-type, 0 means the
    modal share is under 10%, i.e. 11+ types all minor), so bucket
    assignment never rides on a float boundary. Two map-side-combinable
    shuffles on user keys, then a tiny decile aggregate — nothing
    data-scale crosses the driver."""
    e = load_table(spark, sf_dir, "events")
    per_ut = (
        e.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    )
    per_user = per_ut.groupBy("user_id").agg(
        F.sum("c").alias("n_ev"),
        F.max("c").alias("c_max"),
        F.count("*").alias("n_types"),
    )
    return (
        per_user.select(
            F.expr("(10 * c_max) div n_ev").cast("bigint").alias("decile"),
            "n_ev",
            "n_types",
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("n_ev").cast("bigint").alias("total_events"),
            F.round(F.sum("n_ev").cast("double") / F.count("*"), 6).alias(
                "avg_events"
            ),
            F.round(F.sum("n_types").cast("double") / F.count("*"), 6).alias(
                "avg_types"
            ),
        )
        .orderBy("decile")
    )


CONCENTRATION_SQL = """
WITH per_ut AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
),
per_user AS (
  SELECT user_id, SUM(c) AS n_ev, MAX(c) AS c_max, COUNT(*) AS n_types
  FROM per_ut GROUP BY 1
)
SELECT CAST((10 * c_max) // n_ev AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_ev) AS BIGINT) AS total_events,
       ROUND(CAST(SUM(n_ev) AS DOUBLE) / COUNT(*), 6) AS avg_events,
       ROUND(CAST(SUM(n_types) AS DOUBLE) / COUNT(*), 6) AS avg_types
FROM per_user GROUP BY 1 ORDER BY decile
"""

QUERIES["events_user_concentration"] = events_user_concentration
ORACLES["events_user_concentration"] = CONCENTRATION_SQL

# ---------------------------------------------------------------------------
# Distribution drift between time slices (PSI — population stability index)
# ---------------------------------------------------------------------------


def profile_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-drift screen between two time slices of the events table
    (reference = days 1-15, current = the rest): the Population
    Stability Index Σ (p_cur − p_ref)·ln(p_cur / p_ref), the standard
    ML-ops data-drift gate (≥ 0.2 = retrain/alert). Two legs:

    * ``value_decile`` — the numeric column bucketed into 10
      fixed-width bins scaled by the REFERENCE slice's max (current
      rows past it clamp into the top bin — exactly what a deployed
      scorer would see), so the bin edges are one exact scalar, never
      an engine-specific quantile sketch;
    * ``event_type`` — the categorical column on its observed values.

    Laplace-smoothed shares ((n + 0.5)/(N + 0.5k)) keep empty-in-one-
    slice buckets finite. All shares are identical doubles in both
    engines (integer counts through IEEE ops in mirrored order); ln is
    applied to those identical inputs (same cross-libm exposure as the
    long-green TF-IDF query) and the 10-term sums round at 6dp.

    Scale shape: one data-scale aggregation per leg (map-side
    combinable), everything after is ≤10-row algebra; the reference
    max rides a broadcast crossJoin, not a second pass."""
    e = load_table(spark, sf_dir, "events")
    is_ref = F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0)

    v = e.filter(F.col("value").isNotNull()).select(
        is_ref.alias("is_ref"), "value"
    )
    mx = v.filter(F.col("is_ref") == 1).agg(F.max("value").alias("mx"))
    # degenerate-reference guard: an empty / all-null / non-positive
    # reference slice makes mx NULL (or the scale meaningless), every
    # row lands in one NULL bucket, and the query would emit a
    # misleading ~0 PSI. Fail loudly instead — same convention as the
    # Welch/MWU/KS degenerate-arm raises above; the branch never fires
    # on a healthy slice, so the hash is unchanged.
    _mx = F.when(
        F.col("mx").isNull() | (F.col("mx") <= 0),
        F.raise_error(
            F.concat(
                F.lit(
                    "profile_drift_psi: reference slice (days 1-15) has "
                    "no positive values to scale the deciles (max="
                ),
                F.coalesce(F.col("mx").cast("string"), F.lit("NULL")),
                F.lit("); check the ts/value columns of the input"),
            )
        ),
    ).otherwise(F.col("mx"))
    bucket = F.least(
        F.lit(9),
        F.greatest(F.lit(0), F.floor(F.col("value") * 10.0 / _mx)),
    ).cast("int")
    bc = (
        v.crossJoin(F.broadcast(mx))
        .select("is_ref", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum("is_ref").alias("n_ref"),
            F.sum(1 - F.col("is_ref")).alias("n_cur"),
        )
    )
    tc = e.groupBy("event_type").agg(
        F.sum(is_ref).alias("n_ref"), F.sum(1 - is_ref).alias("n_cur")
    )

    def psi_of(counts: DataFrame, label: str) -> DataFrame:
        tot = counts.agg(
            F.sum("n_ref").alias("nr"),
            F.sum("n_cur").alias("nc"),
            F.count("*").alias("k"),
        )
        pc = (F.col("n_cur").cast("double") + 0.5) / (
            F.col("nc").cast("double") + 0.5 * F.col("k").cast("double")
        )
        pr = (F.col("n_ref").cast("double") + 0.5) / (
            F.col("nr").cast("double") + 0.5 * F.col("k").cast("double")
        )
        return (
            counts.crossJoin(F.broadcast(tot))
            .agg(
                F.round(F.sum((pc - pr) * F.log(pc / pr)), 6).alias("psi"),
                F.max("nr").cast("bigint").alias("n_ref"),
                F.max("nc").cast("bigint").alias("n_cur"),
                F.count("*").cast("bigint").alias("n_buckets"),
            )
            .select(
                F.lit(label).alias("column_name"), "psi", "n_ref", "n_cur",
                "n_buckets",
            )
        )

    return (
        psi_of(tc, "event_type")
        .unionAll(psi_of(bc, "value_decile"))
        .orderBy("column_name")
    )


DRIFT_PSI_SQL = """
WITH v AS (
  SELECT CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 1 ELSE 0 END AS is_ref, value
  FROM events WHERE value IS NOT NULL
),
mx AS (SELECT MAX(value) AS mx FROM v WHERE is_ref = 1),
bc AS (
  SELECT CAST(LEAST(9, GREATEST(0, FLOOR(value * 10.0 / (SELECT mx FROM mx)))) AS INT) AS bucket,
         SUM(is_ref) AS n_ref, SUM(1 - is_ref) AS n_cur
  FROM v GROUP BY 1
),
tc AS (
  SELECT event_type,
         SUM(CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 1 ELSE 0 END) AS n_ref,
         SUM(CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 0 ELSE 1 END) AS n_cur
  FROM events GROUP BY 1
),
bpsi AS (
  SELECT ROUND(SUM(((CAST(n_cur AS DOUBLE) + 0.5) / (CAST(t.nc AS DOUBLE) + 0.5 * CAST(t.k AS DOUBLE))
                    - (CAST(n_ref AS DOUBLE) + 0.5) / (CAST(t.nr AS DOUBLE) + 0.5 * CAST(t.k AS DOUBLE)))
                 * LN(((CAST(n_cur AS DOUBLE) + 0.5) / (CAST(t.nc AS DOUBLE) + 0.5 * CAST(t.k AS DOUBLE)))
                      / ((CAST(n_ref AS DOUBLE) + 0.5) / (CAST(t.nr AS DOUBLE) + 0.5 * CAST(t.k AS DOUBLE))))), 6) AS psi,
         CAST(MAX(t.nr) AS BIGINT) AS n_ref, CAST(MAX(t.nc) AS BIGINT) AS n_cur,
         CAST(COUNT(*) AS BIGINT) AS n_buckets
  FROM bc CROSS JOIN (SELECT SUM(n_ref) AS nr, SUM(n_cur) AS nc, COUNT(*) AS k FROM bc) t
),
tpsi AS (
  SELECT ROUND(SUM(((CAST(n_cur AS DOUBLE) + 0.5) / (CAST(t.nc AS DOUBLE) + 0.5 * CAST(t.k AS DOUBLE))
                    - (CAST(n_ref AS DOUBLE) + 0.5) / (CAST(t.nr AS DOUBLE) + 0.5 * CAST(t.k AS DOUBLE)))
                 * LN(((CAST(n_cur AS DOUBLE) + 0.5) / (CAST(t.nc AS DOUBLE) + 0.5 * CAST(t.k AS DOUBLE)))
                      / ((CAST(n_ref AS DOUBLE) + 0.5) / (CAST(t.nr AS DOUBLE) + 0.5 * CAST(t.k AS DOUBLE))))), 6) AS psi,
         CAST(MAX(t.nr) AS BIGINT) AS n_ref, CAST(MAX(t.nc) AS BIGINT) AS n_cur,
         CAST(COUNT(*) AS BIGINT) AS n_buckets
  FROM tc CROSS JOIN (SELECT SUM(n_ref) AS nr, SUM(n_cur) AS nc, COUNT(*) AS k FROM tc) t
)
SELECT 'event_type' AS column_name, psi, n_ref, n_cur, n_buckets FROM tpsi
UNION ALL
SELECT 'value_decile', psi, n_ref, n_cur, n_buckets FROM bpsi
ORDER BY column_name
"""

QUERIES["profile_drift_psi"] = profile_drift_psi
ORACLES["profile_drift_psi"] = DRIFT_PSI_SQL

# ---------------------------------------------------------------------------
# mSPRT always-valid experiment monitor (mixture sequential probability ratio)
# ---------------------------------------------------------------------------

MSPRT_TAU2 = 0.01  # mixture prior variance on the mean difference


def events_msprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential A/B readout: the normal-mixture SPRT
    (Robbins 1970; the "always-valid p-value" of Johari, Koomen,
    Pekelis & Walsh 2017) evaluated after every day of the experiment.
    Peeking at a fixed-horizon t-test daily inflates false positives
    several-fold; the mSPRT martingale keeps the type-I guarantee at
    EVERY look. Per day d (cumulative over days ≤ d):

        Δ̂_d  = x̄_a − x̄_b,   V_d = s²_pooled · (1/n_a + 1/n_b)
        logΛ_d = ½·ln(V_d/(V_d+τ²)) + Δ̂²_d·τ²/(2·V_d·(V_d+τ²))
        p_d   = min(1, exp(−max_{k≤d} logΛ_k))   (monotone ↓)

    Scale shape: ONE data-scale aggregation (per-day decimal-exact
    moments per hash arm, map-side combinable); the cumulative sums
    and the running max are triangle joins over the ~30-row day table
    (broadcast nested loop on a result-sized frame — never a
    data-scale window). Decimal accumulation makes every cumulative
    moment bit-identical across engines; the double algebra on top is
    mirrored operation-for-operation by the oracle (ln/exp on
    identical inputs — the TF-IDF-established libm exposure)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = F.col("value").cast("decimal(18,6)")
    arm = _arm()
    daily = (
        e.select(F.to_date("ts").alias("day"), arm.alias("arm"), d.alias("d"))
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("dn_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("dn_b"),
            F.sum(F.when(F.col("arm") == 0, F.col("d"))).alias("ds1_a"),
            F.sum(F.when(F.col("arm") == 1, F.col("d"))).alias("ds1_b"),
            F.sum(F.when(F.col("arm") == 0, F.col("d") * F.col("d"))).alias("ds2_a"),
            F.sum(F.when(F.col("arm") == 1, F.col("d") * F.col("d"))).alias("ds2_b"),
        )
    )
    k = daily.select(
        F.col("day").alias("kday"), "dn_a", "dn_b", "ds1_a", "ds1_b",
        "ds2_a", "ds2_b",
    )
    cum = (
        daily.select("day")
        .join(F.broadcast(k), F.col("kday") <= F.col("day"))
        .groupBy("day")
        .agg(
            F.sum("dn_a").cast("double").alias("n_a"),
            F.sum("dn_b").cast("double").alias("n_b"),
            F.sum("ds1_a").cast("double").alias("s1_a"),
            F.sum("ds1_b").cast("double").alias("s1_b"),
            F.sum("ds2_a").cast("double").alias("s2_a"),
            F.sum("ds2_b").cast("double").alias("s2_b"),
        )
    )
    delta = F.col("s1_a") / F.col("n_a") - F.col("s1_b") / F.col("n_b")
    var_p = (
        (F.col("s2_a") - F.col("s1_a") * F.col("s1_a") / F.col("n_a"))
        + (F.col("s2_b") - F.col("s1_b") * F.col("s1_b") / F.col("n_b"))
    ) / (F.col("n_a") + F.col("n_b") - 2.0)
    vd = var_p * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    tau2 = F.lit(float(MSPRT_TAU2))
    loglam = 0.5 * F.log(vd / (vd + tau2)) + delta * delta * tau2 / (
        2.0 * vd * (vd + tau2)
    )
    ll = cum.select(
        "day",
        (F.col("n_a") + F.col("n_b")).cast("bigint").alias("n"),
        delta.alias("mean_diff"),
        loglam.alias("log_lambda"),
    )
    lk = ll.select(F.col("day").alias("kday"), F.col("log_lambda").alias("ll_k"))
    runmax = (
        ll.join(F.broadcast(lk), F.col("kday") <= F.col("day"))
        .groupBy("day", "n", "mean_diff", "log_lambda")
        .agg(F.max("ll_k").alias("ll_max"))
    )
    return runmax.select(
        "day",
        "n",
        F.round("mean_diff", 6).alias("mean_diff"),
        F.round("log_lambda", 6).alias("log_lambda"),
        F.round(F.least(F.lit(1.0), F.exp(-F.col("ll_max"))), 6).alias(
            "p_always_valid"
        ),
    ).orderBy("day")


MSPRT_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CASE WHEN {_ARM_SQL} = 0 THEN 1 ELSE 0 END) AS dn_a,
         SUM(CASE WHEN {_ARM_SQL} = 1 THEN 1 ELSE 0 END) AS dn_b,
         SUM(CASE WHEN {_ARM_SQL} = 0 THEN CAST(value AS DECIMAL(18,6)) END) AS ds1_a,
         SUM(CASE WHEN {_ARM_SQL} = 1 THEN CAST(value AS DECIMAL(18,6)) END) AS ds1_b,
         SUM(CASE WHEN {_ARM_SQL} = 0 THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) END) AS ds2_a,
         SUM(CASE WHEN {_ARM_SQL} = 1 THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) END) AS ds2_b
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT d.day,
         CAST(SUM(k.dn_a) AS DOUBLE) AS n_a, CAST(SUM(k.dn_b) AS DOUBLE) AS n_b,
         CAST(SUM(k.ds1_a) AS DOUBLE) AS s1_a, CAST(SUM(k.ds1_b) AS DOUBLE) AS s1_b,
         CAST(SUM(k.ds2_a) AS DOUBLE) AS s2_a, CAST(SUM(k.ds2_b) AS DOUBLE) AS s2_b
  FROM (SELECT day FROM daily) d
  JOIN daily k ON k.day <= d.day
  GROUP BY d.day
),
ll AS (
  SELECT day, CAST(n_a + n_b AS BIGINT) AS n,
         s1_a / n_a - s1_b / n_b AS mean_diff,
         0.5 * LN((((s2_a - s1_a * s1_a / n_a) + (s2_b - s1_b * s1_b / n_b)) / (n_a + n_b - 2.0)
                   * (1.0 / n_a + 1.0 / n_b))
                  / ((((s2_a - s1_a * s1_a / n_a) + (s2_b - s1_b * s1_b / n_b)) / (n_a + n_b - 2.0)
                      * (1.0 / n_a + 1.0 / n_b)) + CAST({MSPRT_TAU2} AS DOUBLE)))
         + (s1_a / n_a - s1_b / n_b) * (s1_a / n_a - s1_b / n_b) * CAST({MSPRT_TAU2} AS DOUBLE)
           / (2.0 * (((s2_a - s1_a * s1_a / n_a) + (s2_b - s1_b * s1_b / n_b)) / (n_a + n_b - 2.0)
                     * (1.0 / n_a + 1.0 / n_b))
              * ((((s2_a - s1_a * s1_a / n_a) + (s2_b - s1_b * s1_b / n_b)) / (n_a + n_b - 2.0)
                  * (1.0 / n_a + 1.0 / n_b)) + CAST({MSPRT_TAU2} AS DOUBLE))) AS log_lambda
  FROM cum
)
SELECT d.day, d.n, ROUND(d.mean_diff, 6) AS mean_diff,
       ROUND(d.log_lambda, 6) AS log_lambda,
       ROUND(LEAST(1.0, EXP(-MAX(k.log_lambda))), 6) AS p_always_valid
FROM ll d JOIN ll k ON k.day <= d.day
GROUP BY d.day, d.n, d.mean_diff, d.log_lambda
ORDER BY d.day
"""

QUERIES["events_msprt_monitor"] = events_msprt_monitor
ORACLES["events_msprt_monitor"] = MSPRT_SQL

# ---------------------------------------------------------------------------
# O'Brien-Fleming group-sequential monitor (fixed-schedule complement to mSPRT)
# ---------------------------------------------------------------------------

OBF_C = 2.2414  # P(sup_{t<=1} |B(t)| >= C) = 0.05: 4*(1-Phi(C)) ~ 0.05


def events_group_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential A/B monitor with the O'Brien-Fleming boundary
    (O'Brien & Fleming 1979; Lan & DeMets 1983 spending shape): the
    scheduled-looks counterpart to the always-valid mSPRT above. After
    look k of K (one look per experiment day), the cumulative
    two-sample z is compared against the OBF-shape boundary

        u_k = C / sqrt(t_k),   t_k = k / K,   C = 2.2414

    — in Brownian-motion scale the test statistic B(t_k) = z_k*sqrt(t_k)
    crosses a FLAT boundary C, and P(sup_{t<=1}|B(t)| >= 2.2414) ~ 0.05
    by the reflection principle (4*(1-Phi(2.2414)) = 0.0500), so early
    looks need overwhelming evidence and the final look spends almost
    the full alpha (u_K = C ~ the fixed-horizon 1.96 + scheduling
    premium). Emits per look: cumulative n, z, boundary, crossed flag.

    Scale shape: identical to events_msprt_monitor — ONE data-scale
    aggregation (per-day decimal-exact moments per hash arm, map-side
    combinable), then cumulative sums and the look index as triangle
    joins over the ~31-row day table. Decimal accumulation keeps every
    cumulative moment bit-identical across engines; the z/sqrt algebra
    on top is mirrored operation-for-operation by the oracle."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = F.col("value").cast("decimal(18,6)")
    arm = _arm()
    daily = (
        e.select(F.to_date("ts").alias("day"), arm.alias("arm"), d.alias("d"))
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("dn_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("dn_b"),
            F.sum(F.when(F.col("arm") == 0, F.col("d"))).alias("ds1_a"),
            F.sum(F.when(F.col("arm") == 1, F.col("d"))).alias("ds1_b"),
            F.sum(F.when(F.col("arm") == 0, F.col("d") * F.col("d"))).alias("ds2_a"),
            F.sum(F.when(F.col("arm") == 1, F.col("d") * F.col("d"))).alias("ds2_b"),
        )
    )
    k = daily.select(
        F.col("day").alias("kday"), "dn_a", "dn_b", "ds1_a", "ds1_b",
        "ds2_a", "ds2_b",
    )
    nlooks = daily.agg(F.count("*").cast("double").alias("bign"))
    cum = (
        daily.select("day")
        .join(F.broadcast(k), F.col("kday") <= F.col("day"))
        .groupBy("day")
        .agg(
            F.count("*").cast("double").alias("look"),
            F.sum("dn_a").cast("double").alias("n_a"),
            F.sum("dn_b").cast("double").alias("n_b"),
            F.sum("ds1_a").cast("double").alias("s1_a"),
            F.sum("ds1_b").cast("double").alias("s1_b"),
            F.sum("ds2_a").cast("double").alias("s2_a"),
            F.sum("ds2_b").cast("double").alias("s2_b"),
        )
        .crossJoin(F.broadcast(nlooks))
    )
    delta = F.col("s1_a") / F.col("n_a") - F.col("s1_b") / F.col("n_b")
    var_p = (
        (F.col("s2_a") - F.col("s1_a") * F.col("s1_a") / F.col("n_a"))
        + (F.col("s2_b") - F.col("s1_b") * F.col("s1_b") / F.col("n_b"))
    ) / (F.col("n_a") + F.col("n_b") - 2.0)
    z = delta / F.sqrt(var_p * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    bound = F.lit(float(OBF_C)) / F.sqrt(F.col("look") / F.col("bign"))
    return cum.select(
        "day",
        F.col("look").cast("bigint").alias("look"),
        (F.col("n_a") + F.col("n_b")).cast("bigint").alias("n"),
        F.round(z, 6).alias("z"),
        F.round(bound, 6).alias("boundary"),
        (F.abs(z) > bound).alias("crossed"),
    ).orderBy("day")


GROUP_SEQ_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CASE WHEN {_ARM_SQL} = 0 THEN 1 ELSE 0 END) AS dn_a,
         SUM(CASE WHEN {_ARM_SQL} = 1 THEN 1 ELSE 0 END) AS dn_b,
         SUM(CASE WHEN {_ARM_SQL} = 0 THEN CAST(value AS DECIMAL(18,6)) END) AS ds1_a,
         SUM(CASE WHEN {_ARM_SQL} = 1 THEN CAST(value AS DECIMAL(18,6)) END) AS ds1_b,
         SUM(CASE WHEN {_ARM_SQL} = 0 THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) END) AS ds2_a,
         SUM(CASE WHEN {_ARM_SQL} = 1 THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) END) AS ds2_b
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT d.day, CAST(COUNT(*) AS DOUBLE) AS look,
         CAST(SUM(k.dn_a) AS DOUBLE) AS n_a, CAST(SUM(k.dn_b) AS DOUBLE) AS n_b,
         CAST(SUM(k.ds1_a) AS DOUBLE) AS s1_a, CAST(SUM(k.ds1_b) AS DOUBLE) AS s1_b,
         CAST(SUM(k.ds2_a) AS DOUBLE) AS s2_a, CAST(SUM(k.ds2_b) AS DOUBLE) AS s2_b,
         (SELECT CAST(COUNT(*) AS DOUBLE) FROM daily) AS bign
  FROM (SELECT day FROM daily) d
  JOIN daily k ON k.day <= d.day
  GROUP BY d.day
)
SELECT day, CAST(look AS BIGINT) AS look, CAST(n_a + n_b AS BIGINT) AS n,
       ROUND((s1_a / n_a - s1_b / n_b)
             / SQRT(((s2_a - s1_a * s1_a / n_a) + (s2_b - s1_b * s1_b / n_b))
                    / (n_a + n_b - 2.0) * (1.0 / n_a + 1.0 / n_b)), 6) AS z,
       ROUND({OBF_C} / SQRT(look / bign), 6) AS boundary,
       (ABS((s1_a / n_a - s1_b / n_b)
            / SQRT(((s2_a - s1_a * s1_a / n_a) + (s2_b - s1_b * s1_b / n_b))
                   / (n_a + n_b - 2.0) * (1.0 / n_a + 1.0 / n_b)))
        > {OBF_C} / SQRT(look / bign)) AS crossed
FROM cum ORDER BY day
"""

QUERIES["events_group_sequential"] = events_group_sequential
ORACLES["events_group_sequential"] = GROUP_SEQ_SQL


# ---------------------------------------------------------------------------
# Bayesian A/B readout: exact probability of superiority (Beta-Binomial)
# ---------------------------------------------------------------------------

_BAYES_CONV_THRESHOLD = 230.0


def beta_prob_superiority(a_a, b_a, a_b, b_b, lgam=None) -> float:
    """P(p_B > p_A) for p_A ~ Beta(a_a, b_a), p_B ~ Beta(a_b, b_b) with
    INTEGER parameters — Cook's exact finite series, summed in fixed
    index order (deterministic). ``lgam`` maps integer n -> lnGamma(n);
    when omitted, ``math.lgamma`` is used — the Spark query passes the
    decimal-exact sum(ln j) table instead, and the hypothesis test pins
    the two sources against each other."""
    if lgam is None:
        def lg(n):
            return math.lgamma(n)
    else:
        def lg(n):
            return lgam[n]

    def lnB(x, y):
        return lg(x) + lg(y) - lg(x + y)

    ln_b_aa = lnB(a_a, b_a)
    p = 0.0
    for i in range(a_b):
        lnt = (
            lnB(a_a + i, b_a + b_b)
            - math.log(b_b + i)
            - lnB(1 + i, b_b)
            - ln_b_aa
        )
        p += math.exp(lnt)
    return p


def events_bayes_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian two-arm readout for the hash-split experiment: per-user
    conversion = max event value > threshold, Beta(1,1) priors, and the
    EXACT probability of superiority

        P(p_B > p_A) = sum_{i=0}^{aB-1} B(aA+i, bA+bB)
                       / ((bB+i) * B(1+i, bB) * B(aA, bA))

    (Cook's closed form for two Beta posteriors — no Monte Carlo, no
    normal approximation, so the result is deterministic and
    oracle-checkable). The frequentist siblings are
    ``events_welch_ttest`` / ``events_group_sequential``; this is the
    posterior readout a decision layer consumes directly.

    Scale shape: one groupBy(user_id) conversion aggregate + one 2-row
    arm rollup are the data-scale passes; the series itself is LINEAR
    in the arm sizes via the term recurrence t_{i+1}/t_i (a ratio of
    six integers) — ln t_0 is one decimal-exact aggregation over an
    integer range and the log-term prefix runs through the two-phase
    distributed scan (no data-scale window, no single-reducer scan, no
    O(terms x n) log-gamma lookup join). Cross-engine note: ln/exp
    differ from DuckDB's libm in the last ulp (~1% of arguments on
    this host, measured); the 6-dp rounding of the output absorbs
    that — the same contract as the TF-IDF/BM25 oracles."""
    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        (F.max("value") > F.lit(_BAYES_CONV_THRESHOLD)).cast("int").alias("conv")
    )
    arms = users.select(_arm().alias("arm"), "conv")
    row = (
        arms.groupBy()
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("c_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
            F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("c_b"),
        )
        .collect()[0]
    )
    n_a, c_a, n_b, c_b = (
        int(row["n_a"]), int(row["c_a"]), int(row["n_b"]), int(row["c_b"]),
    )
    if min(n_a, n_b) == 0:
        raise ValueError("events_bayes_ab: an arm has zero users")
    a_a, b_a = c_a + 1, n_a - c_a + 1
    a_b, b_b = c_b + 1, n_b - c_b + 1

    # Series in RECURRENCE form — everything LINEAR in the arm sizes
    # (the direct per-term log-gamma lookup needed a j<=arg-1 range
    # join: O(c_B * n_users) predicate pairs, quadratic at scale):
    #
    #   ln t_0 = sum_{j=b_a}^{b_a+b_b-1} ln j
    #          - sum_{j=a_a+b_a}^{a_a+b_a+b_b-1} ln j
    #   D_i    = ln t_{i+1} - ln t_i
    #          = ln(a_a+i) - ln(a_a+b_a+b_b+i)
    #          + ln(b_b+i) - ln(b_b+i+1) - ln(1+i) + ln(1+i+b_b)
    #   P      = sum_i exp(ln t_0 + prefix(D))
    #
    # ln t_0 is ONE decimal-exact aggregation over an integer range;
    # the D prefix runs through the two-phase distributed scan
    # (operators/packing.py::global_rank_cumsum at decimal(38,18) —
    # no single-reducer window), so both stay windowless and
    # map-side-combinable no matter how many conversions arm B has.
    lnt0_df = spark.range(min(b_a, a_a + b_a), a_a + b_a + b_b).select(
        (
            F.when(
                (F.col("id") >= b_a) & (F.col("id") < b_a + b_b), 1
            ).otherwise(0)
            - F.when(F.col("id") >= a_a + b_a, 1).otherwise(0)
        ).cast("double").alias("sgn"),
        F.log(F.col("id").cast("double")).alias("lj"),
    )
    lnt0 = float(
        lnt0_df.agg(
            F.sum((F.col("sgn") * F.col("lj")).cast("decimal(38,18)")).alias("v")
        ).collect()[0]["v"]
    )
    p = math.exp(lnt0)
    if a_b > 1:
        from csdid_pyspark_spark.cache import release_cache
        from csdid_pyspark_spark.operators.packing import global_rank_cumsum

        deltas = spark.range(0, a_b - 1).select(
            F.col("id").alias("i"),
            (
                F.log((F.col("id") + a_a).cast("double"))
                - F.log((F.col("id") + a_a + b_a + b_b).cast("double"))
                + F.log((F.col("id") + b_b).cast("double"))
                - F.log((F.col("id") + b_b + 1).cast("double"))
                - F.log((F.col("id") + 1).cast("double"))
                + F.log((F.col("id") + 1 + b_b).cast("double"))
            ).alias("d"),
        )
        ranked = global_rank_cumsum(
            deltas, ["i"], "d", val_type="decimal(38,18)"
        )
        rest = (
            ranked.df.agg(
                F.sum(
                    F.exp(F.lit(lnt0) + F.col("cum").cast("double")).cast(
                        "decimal(38,18)"
                    )
                ).alias("v")
            ).collect()[0]["v"]
        )
        release_cache(ranked.df)
        p += float(rest)
    post_a = a_a / (a_a + b_a)
    post_b = a_b / (a_b + b_b)
    return spark.createDataFrame(
        [(n_a, c_a, n_b, c_b, round(post_a, 6), round(post_b, 6), round(p, 6))],
        "n_a bigint, c_a bigint, n_b bigint, c_b bigint,"
        " post_mean_a double, post_mean_b double, prob_b_beats_a double",
    )


BAYES_AB_SQL = f"""
WITH users AS (
  SELECT user_id, CAST(MAX(value) > {_BAYES_CONV_THRESHOLD} AS INT) AS conv
  FROM events GROUP BY user_id
),
arms AS (SELECT {_ARM_SQL} AS arm, conv FROM users),
par0 AS (
  SELECT SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS c_a,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS c_b
  FROM arms
),
par AS (
  SELECT n_a, c_a, n_b, c_b,
         c_a + 1 AS aa, n_a - c_a + 1 AS ba,
         c_b + 1 AS ab, n_b - c_b + 1 AS bb,
         -- the constant generate_series bounds below silently truncate
         -- past this size: fail LOUDLY instead of understating P
         CASE WHEN n_a + n_b + 4 > 4000000
              THEN error('bayes_ab oracle: series bound 4e6 exceeded')
              ELSE 0 END AS _guard
  FROM par0
),
lnt0 AS (
  SELECT CAST(SUM(CAST(
           (CASE WHEN j >= p.ba AND j < p.ba + p.bb THEN 1 ELSE 0 END
            - CASE WHEN j >= p.aa + p.ba THEN 1 ELSE 0 END)
           * ln(CAST(j AS DOUBLE)) AS DECIMAL(38,18))) AS DOUBLE) AS v
  FROM par p, generate_series(1, 4000000) t(j)
  WHERE j >= LEAST(p.ba, p.aa + p.ba) AND j < p.aa + p.ba + p.bb
),
deltas AS (
  SELECT i,
         ln(CAST(p.aa + i AS DOUBLE)) - ln(CAST(p.aa + p.ba + p.bb + i AS DOUBLE))
         + ln(CAST(p.bb + i AS DOUBLE)) - ln(CAST(p.bb + i + 1 AS DOUBLE))
         - ln(CAST(1 + i AS DOUBLE)) + ln(CAST(1 + i + p.bb AS DOUBLE)) AS d
  FROM par p, generate_series(0, 4000000) s(i)
  WHERE i <= p.ab - 2
),
cums AS (
  SELECT i, CAST(SUM(CAST(d AS DECIMAL(38,18))) OVER (
    ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS cum
  FROM deltas
),
prob AS (
  SELECT exp((SELECT v FROM lnt0))
         + COALESCE((SELECT CAST(SUM(CAST(
               exp((SELECT v FROM lnt0) + cum) AS DECIMAL(38,18))) AS DOUBLE)
             FROM cums), 0.0) AS p
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
       ROUND(CAST(aa AS DOUBLE) / (aa + ba), 6) AS post_mean_a,
       ROUND(CAST(ab AS DOUBLE) / (ab + bb), 6) AS post_mean_b,
       ROUND((SELECT p FROM prob), 6) + 0 * _guard AS prob_b_beats_a
FROM par
"""

QUERIES["events_bayes_ab"] = events_bayes_ab
ORACLES["events_bayes_ab"] = BAYES_AB_SQL
