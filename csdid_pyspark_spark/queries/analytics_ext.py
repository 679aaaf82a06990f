"""Survival / path / co-occurrence / containment / cohort analytics.

Oracle-checked queries extending the events + documents + orders
surface:

* ``events_kaplan_meier`` — Kaplan–Meier survival of view→purchase
  conversion with right-censoring (the canonical time-to-event readout
  an A/B platform runs next to CUPED; complements the point-estimate
  ``events_time_to_convert``).
* ``events_markov_transitions`` — first-order event-type transition
  matrix inside 30-minute sessions (the pairwise companion of the
  ``events_session_paths`` trigram census).
* ``docs_token_pmi`` — top token-pair PMI over per-document
  co-occurrence, the association-mining primitive behind collocation
  extraction and topic seeding.
* ``dedup_containment`` — shingle-set containment pairs
  (|A∩B|/min(|A|,|B|)): doc-inside-doc detection that Jaccard's union
  denominator misses (operators/dedup.py::containment_pairs).
* ``orders_cohort_ltv`` — cohort lifetime-value triangle (first-order
  year × year offset, cumulative revenue per cohort member).
* ``suppliers_pareto`` — 80/20 concentration cut via the two-phase
  distributed rank+running-total scan (no single-reducer window).
* ``orders_yoy_revenue`` — monthly revenue with same-month-last-year YoY growth.
* ``sample_poisson_bootstrap`` — hash-seeded Poisson(1) bootstrap of
  mean spend by segment: the one-pass distributed bootstrap (same plan
  family as the estimator's multiplier bootstrap, did/mboot.py).

Scale notes are on each query; every aggregation is a built-in JVM
expression (no Python UDFs anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csdid_pyspark_spark.cache import attach_cache
from csdid_pyspark_spark.operators import dedup, sessionize
from csdid_pyspark_spark.queries.llm_ops import NEARDUP_MAX_DF
from csdid_pyspark_spark.sources.tables import load_table


def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of view→purchase conversion time,
    bucketed to hours. Subjects are users with ≥1 view; a user
    "converts" (event) at their first purchase at-or-after the first
    view, else is right-censored at their last observed event. The KM
    product runs over event buckets only; censoring at a bucket keeps
    the user at risk through that bucket (standard KM convention —
    deaths at t precede censorings at t).

    Shape: ONE shuffle for the per-user min/max aggregate, one tiny
    shuffle to bucket counts, then windows over the AGGREGATED curve
    table — whose row count is bounded by the observation span in
    hours, independent of user count, so the unpartitioned cumulative
    window never sees base rows at any scale."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("first_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("first_buy"),
        F.max(F.unix_micros("ts")).alias("last_ts"),
    )
    subj = per.filter(F.col("first_view").isNotNull()).select(
        F.when(
            F.col("first_buy").isNotNull() & (F.col("first_buy") >= F.col("first_view")), 1
        )
        .otherwise(0)
        .alias("died"),
        F.floor(
            (
                F.when(
                    F.col("first_buy").isNotNull()
                    & (F.col("first_buy") >= F.col("first_view")),
                    F.col("first_buy"),
                ).otherwise(F.col("last_ts"))
                - F.col("first_view")
            )
            / 3_600_000_000
        ).alias("dur_hr"),
    )
    counts = subj.groupBy("dur_hr").agg(
        F.sum("died").alias("d"), F.sum(1 - F.col("died")).alias("c")
    )
    w_all = Window.partitionBy(F.lit(0))
    w_prior = (
        Window.partitionBy(F.lit(0))
        .orderBy("dur_hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    curve = counts.select(
        "dur_hr",
        "d",
        (
            F.sum(F.col("d") + F.col("c")).over(w_all)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prior), F.lit(0))
        ).alias("n_risk"),
    ).filter(F.col("d") > 0)
    w_cum = (
        Window.partitionBy(F.lit(0))
        .orderBy("dur_hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    factor = (F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk")
    return (
        curve.withColumn(
            "survival",
            F.when(F.min(factor).over(w_cum) == 0, F.lit(0.0)).otherwise(
                F.round(F.exp(F.sum(F.log(factor)).over(w_cum)), 6)
            ),
        )
        .select(
            F.col("dur_hr").cast("bigint").alias("hr"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").cast("bigint").alias("d"),
            "survival",
        )
        .orderBy("hr")
    )


EVENTS_KM_SQL = """
WITH per AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_buy,
    MAX(epoch_us(ts)) AS last_ts
  FROM events GROUP BY user_id
),
subj AS (
  SELECT
    CASE WHEN first_buy IS NOT NULL AND first_buy >= first_view THEN 1 ELSE 0 END AS died,
    CAST((CASE WHEN first_buy IS NOT NULL AND first_buy >= first_view
               THEN first_buy ELSE last_ts END - first_view) // 3600000000 AS BIGINT) AS dur_hr
  FROM per WHERE first_view IS NOT NULL
),
counts AS (
  SELECT dur_hr, SUM(died) AS d, SUM(1 - died) AS c FROM subj GROUP BY dur_hr
),
curve AS (
  SELECT dur_hr, d,
    SUM(d + c) OVER ()
      - COALESCE(SUM(d + c) OVER (ORDER BY dur_hr
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM counts
)
SELECT CAST(dur_hr AS BIGINT) AS hr, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
  -- LN argument guarded INSIDE the window: DuckDB evaluates the windowed
  -- SUM(LN(...)) before the outer CASE, so an unguarded LN(0) (a bucket
  -- where every remaining at-risk subject converts) would raise even
  -- though the outer CASE emits 0.0 for it.
  CASE WHEN MIN(CAST(n_risk - d AS DOUBLE) / n_risk) OVER (ORDER BY dur_hr) = 0 THEN 0.0
       ELSE ROUND(EXP(SUM(LN(CASE WHEN n_risk > d
                              THEN CAST(n_risk - d AS DOUBLE) / n_risk
                              ELSE 1.0 END))
                  OVER (ORDER BY dur_hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
  END AS survival
FROM curve WHERE d > 0
ORDER BY hr
"""


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types within
    30-minute sessions: P(next=dst | cur=src) with transition counts.
    Reuses the sessionizer's (user, ts) sort — the src lag rides the
    SAME single user-keyed shuffle — then a map-side-combine groupBy
    bounded by |event_type|²; the per-src normalizing window runs on
    that tiny aggregate, never on base rows."""
    e = load_table(spark, sf_dir, "events")
    s = sessionize.sessionize(e)
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    trans = (
        s.withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull())
        .select("src", F.col("event_type").alias("dst"))
    )
    agg = trans.groupBy("src", "dst").agg(F.count("*").cast("bigint").alias("n"))
    w_src = Window.partitionBy("src")
    return (
        agg.withColumn(
            "prob", F.round(F.col("n").cast("double") / F.sum("n").over(w_src), 6)
        )
        .orderBy("src", "dst")
    )


EVENTS_MARKOV_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
),
trans AS (
  SELECT LAG(event_type) OVER w2 AS src, event_type AS dst
  FROM sess WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
)
SELECT src, dst, COUNT(*) AS n,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY src), 6) AS prob
FROM trans WHERE src IS NOT NULL
GROUP BY src, dst ORDER BY src, dst
"""


# PMI vocabulary window: tokens must appear in ≥ PMI_MIN_DF docs (below
# that the PMI estimate is noise) and ≤ PMI_MAX_DF docs (above it the
# per-doc pair explosion is quadratic in a token's df and the PMI of a
# near-ubiquitous token is ~0 anyway — same df-cap rationale as
# NEARDUP_MAX_DF). A pair must co-occur in ≥ PMI_MIN_PAIR docs.
PMI_MIN_DF = 5
PMI_MAX_DF = 1000
PMI_MIN_PAIR = 5


def docs_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 token pairs by pointwise mutual information over
    per-document co-occurrence: pmi = ln(N·n12/(n1·n2)) on document
    frequencies. The df window [PMI_MIN_DF, PMI_MAX_DF] bounds the
    per-document pair fan-out (a token in k docs contributes ≤ k·|doc
    vocab| pair rows, and ubiquitous tokens — whose PMI is ~0 by
    construction — never enter the self-join), so candidate volume is
    O(docs · capped-vocab-per-doc²), not corpus-quadratic. The doc
    count lands as a broadcast single-row cross join."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
        )
        .distinct()
    )
    dfreq = (
        toks.groupBy("token")
        .agg(F.count("*").alias("dfreq"))
        .filter((F.col("dfreq") >= PMI_MIN_DF) & (F.col("dfreq") <= PMI_MAX_DF))
    )
    td = toks.join(dfreq.select("token"), "token")
    n = d.agg(F.countDistinct("doc_id").alias("n_docs"))
    a = td.select("doc_id", F.col("token").alias("t1"))
    b = td.select("doc_id", F.col("token").alias("t2"))
    pairs = (
        a.join(b, (a["doc_id"] == b["doc_id"]) & (F.col("t1") < F.col("t2")))
        .groupBy("t1", "t2")
        .agg(F.count("*").cast("bigint").alias("n12"))
        .filter(F.col("n12") >= PMI_MIN_PAIR)
    )
    da = dfreq.select(F.col("token").alias("t1"), F.col("dfreq").alias("df1"))
    db = dfreq.select(F.col("token").alias("t2"), F.col("dfreq").alias("df2"))
    return (
        pairs.join(da, "t1")
        .join(db, "t2")
        .crossJoin(F.broadcast(n))
        .select(
            "t1",
            "t2",
            "n12",
            F.round(
                F.log(
                    F.col("n_docs").cast("double")
                    * F.col("n12")
                    / (F.col("df1") * F.col("df2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "t1", "t2")
        .limit(15)
    )


DOCS_PMI_SQL = r"""
WITH toks AS (
  SELECT DISTINCT doc_id, UNNEST(string_split_regex(trim(text), '\s+')) AS token
  FROM documents
),
df AS (
  SELECT token, COUNT(*) AS dfreq FROM toks GROUP BY token
  HAVING COUNT(*) >= %d AND COUNT(*) <= %d
),
td AS (SELECT toks.doc_id, toks.token FROM toks JOIN df USING (token)),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
pairs AS (
  SELECT a.token AS t1, b.token AS t2, CAST(COUNT(*) AS BIGINT) AS n12
  FROM td a JOIN td b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2 HAVING COUNT(*) >= %d
)
SELECT t1, t2, n12,
       ROUND(LN(CAST(n_docs AS DOUBLE) * n12 / (da.dfreq * db.dfreq)), 6) AS pmi
FROM pairs
CROSS JOIN n
JOIN df da ON da.token = t1
JOIN df db ON db.token = t2
ORDER BY pmi DESC, t1, t2 LIMIT 15
""" % (PMI_MIN_DF, PMI_MAX_DF, PMI_MIN_PAIR)


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-inside-doc pairs: shingle containment ≥ 0.8 on the
    df-capped candidate graph (operators/dedup.py::containment_pairs —
    same NEARDUP_MAX_DF candidate cap as every pipeline dedup path)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(
        d, n=3, threshold=0.8, max_df=NEARDUP_MAX_DF
    ).orderBy("id_a", "id_b")


DEDUP_CONTAINMENT_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens FROM documents
),
sh_all AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_transform(range(1, GREATEST(len(tokens) - 1, 1)),
                               i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingle
  FROM toks WHERE len(tokens) >= 3
),
hot AS (SELECT shingle FROM sh_all GROUP BY shingle HAVING COUNT(*) > %d),
sh AS (SELECT sh_all.doc_id, sh_all.shingle FROM sh_all ANTI JOIN hot USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(CAST(n_inter AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 6) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_inter AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= 0.8
ORDER BY id_a, id_b
""" % NEARDUP_MAX_DF


def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by first-order
    year, cumulative revenue per cohort member by year offset — the
    standard LTV curve a growth team reads next to the retention
    triangle. The cohort year rides a customer-keyed window (ONE base
    shuffle, no self-join); the cumulative window runs per-cohort on
    the (cohorts × offsets)-bounded aggregate. Revenue accumulates as
    DECIMAL so partial-agg order never moves the cents."""
    o = load_table(spark, sf_dir, "orders")
    w_cust = Window.partitionBy("o_custkey")
    o2 = o.select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        "o_totalprice",
    ).withColumn("cohort_year", F.min("yr").over(w_cust))
    rev = o2.groupBy("cohort_year", (F.col("yr") - F.col("cohort_year")).alias("yr_offset")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("rev")
    )
    sz = o2.groupBy("cohort_year").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_cust")
    )
    w_cum = (
        Window.partitionBy("cohort_year")
        .orderBy("yr_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.withColumn("cum_rev", F.sum("rev").over(w_cum))
        .join(F.broadcast(sz), "cohort_year")
        .select(
            F.col("cohort_year").cast("int").alias("cohort_year"),
            F.col("yr_offset").cast("int").alias("yr_offset"),
            "n_cust",
            F.round(F.col("cum_rev").cast("double") / F.col("n_cust"), 2).alias(
                "cum_ltv_per_cust"
            ),
        )
        .orderBy("cohort_year", "yr_offset")
    )


ORDERS_LTV_SQL = """
WITH o2 AS (
  SELECT o_custkey, YEAR(o_orderdate) AS yr, o_totalprice,
         MIN(YEAR(o_orderdate)) OVER (PARTITION BY o_custkey) AS cohort_year
  FROM orders
),
rev AS (
  SELECT cohort_year, yr - cohort_year AS yr_offset,
         SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev
  FROM o2 GROUP BY 1, 2
),
sz AS (SELECT cohort_year, COUNT(DISTINCT o_custkey) AS n_cust FROM o2 GROUP BY 1)
SELECT CAST(rev.cohort_year AS INTEGER) AS cohort_year,
       CAST(yr_offset AS INTEGER) AS yr_offset,
       CAST(n_cust AS BIGINT) AS n_cust,
       ROUND(CAST(SUM(rev) OVER (PARTITION BY rev.cohort_year ORDER BY yr_offset) AS DOUBLE)
             / n_cust, 2) AS cum_ltv_per_cust
FROM rev JOIN sz USING (cohort_year)
ORDER BY cohort_year, yr_offset
"""


def suppliers_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration cut: the smallest set of top-revenue
    suppliers covering ≥80% of lineitem revenue (count, fraction of
    all suppliers, exact share covered). The running total over the
    supplier-revenue aggregate comes from the two-phase distributed
    scan (operators/packing.py::global_rank_cumsum — range shuffle +
    broadcast per-partition bases, decimal-exact), NOT a bare
    ``SUM() OVER (ORDER BY ...)`` that would funnel every supplier
    through one reducer; totals land as a broadcast 1-row cross join."""
    from csdid_pyspark_spark.operators.packing import global_rank_cumsum, release_cache

    l = load_table(spark, sf_dir, "lineitem")
    srev = l.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
        ).alias("rev")
    )
    scan = global_rank_cumsum(
        srev.withColumn("rev_neg", -F.col("rev")),
        ["rev_neg", "l_suppkey"],
        "rev",
    )
    ranked = scan.df
    # grand totals come from the scan's own per-partition stats — a
    # separate srev.agg() would re-run the whole lineitem aggregation
    tot = spark.createDataFrame(
        [(scan.total_sum, scan.total_count)], "tot decimal(30,6), n_sup bigint"
    )
    out = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("ratio", F.col("cum").cast("double") / F.col("tot").cast("double"))
        .filter(F.col("ratio") >= 0.8)
        .agg(
            F.min("rn").alias("n_top"),
            F.min("n_sup").alias("n_suppliers"),
            F.round(F.min("rn").cast("double") / F.min("n_sup"), 6).alias(
                "frac_suppliers"
            ),
            F.round(F.min("ratio"), 6).alias("share_covered"),
        )
    )
    result = out.localCheckpoint(eager=True)
    release_cache(ranked)
    return result


SUPPLIERS_PARETO_SQL = """
WITH srev AS (
  SELECT l_suppkey, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS rev
  FROM lineitem GROUP BY l_suppkey
),
ranked AS (
  SELECT SUM(rev) OVER (ORDER BY rev DESC, l_suppkey) AS cum_rev,
         SUM(rev) OVER () AS tot,
         ROW_NUMBER() OVER (ORDER BY rev DESC, l_suppkey) AS rnk,
         COUNT(*) OVER () AS n_sup
  FROM srev
)
SELECT CAST(MIN(rnk) AS BIGINT) AS n_top,
       CAST(MIN(n_sup) AS BIGINT) AS n_suppliers,
       ROUND(CAST(MIN(rnk) AS DOUBLE) / MIN(n_sup), 6) AS frac_suppliers,
       ROUND(MIN(CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE)), 6) AS share_covered
FROM ranked WHERE CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE) >= 0.8
"""


def orders_yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth via an explicit
    same-month-last-year self-join on the month key (add_months −12),
    NOT a positional lag-12 — a lag over ordered month rows silently
    compares against the wrong month whenever a calendar month is
    absent from the data, and both engines would agree on the wrong
    answer so the oracle gate could never catch it. The self-join is
    on the months-bounded aggregate (~one row per calendar month
    regardless of order volume), so it broadcasts; months with no
    same-month-last-year row get NULL yoy (and NULLIF guards rev=0)."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("mond")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("rev_d")
    )
    prev = m.select(
        F.add_months("mond", 12).alias("mond"), F.col("rev_d").alias("prev_d")
    )
    return (
        m.join(F.broadcast(prev), "mond", "left")
        .select(
            F.date_format("mond", "yyyy-MM").alias("mon"),
            F.col("rev_d").cast("double").alias("rev"),
            F.round(
                (F.col("rev_d") - F.col("prev_d")).cast("double")
                / F.nullif(F.col("prev_d").cast("double"), F.lit(0.0)),
                6,
            ).alias("yoy"),
        )
        .orderBy("mon")
    )


ORDERS_YOY_SQL = """
WITH m AS (
  SELECT DATE_TRUNC('month', o_orderdate) AS mond,
         SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev
  FROM orders GROUP BY 1
)
SELECT STRFTIME(cur.mond, '%Y-%m') AS mon, CAST(cur.rev AS DOUBLE) AS rev,
       ROUND(CAST(cur.rev - prev.rev AS DOUBLE)
             / NULLIF(CAST(prev.rev AS DOUBLE), 0), 6) AS yoy
FROM m cur LEFT JOIN m prev ON prev.mond = cur.mond - INTERVAL 12 MONTH
ORDER BY mon
"""


# Poisson-bootstrap knobs: rep count and the Poisson(1) inverse-CDF
# ladder (cumulative probabilities e^-1·Σ 1/i!). Hash-seeded per
# (unit, rep), so every engine draws the SAME resample — the classic
# distributed bootstrap (one pass, no resampling joins, rows scale as
# n·reps and shuffle only at the (segment, rep) aggregate).
BOOT_REPS = 50
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Poisson bootstrap of mean customer spend by market
    segment: each (customer, rep) draws a Poisson(1) weight from a
    content-addressed md5 uniform (reproducible across engines,
    partitionings, and reruns — rand() is none of those), rep means are
    weighted aggregates, and the bootstrap SE is the stddev across
    reps. This is how you bootstrap at 100 TB: no WITH-REPLACEMENT
    shuffle, no per-rep scan — ONE pass over n·reps rows, the same
    plan shape as the estimator's multiplier bootstrap (did/mboot.py)
    with Poisson draws instead of Rademacher."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("spend_d"))
        .join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            "o_custkey",
            F.col("spend_d").cast("double").alias("spend"),
        )
    )
    # The per-customer aggregate is tiny post-shuffle (AQE coalesces it
    # to ~1 partition at bench scale), but the explode below fans each
    # row out BOOT_REPS x into the md5 draw — the heavy compute of this
    # query. Re-spread the PRE-explosion rows across the cores first
    # (guide §2.5 fan-out rule: shuffle the few small rows so the big
    # derived work parallelizes). NOT ``repartition(n, "o_custkey")``:
    # the aggregate is already hash-partitioned by o_custkey, so that
    # exchange is elided as redundant and the fan-out still ran on the
    # AQE-coalesced single partition (measured: no-op). A DERIVED hash
    # key keeps placement deterministic (guide §2.5: never rand()) and
    # survives the planner. At cluster scale defaultParallelism is the
    # total core count — exactly the width the fan-out stage needs.
    spend = spend.repartition(
        spark.sparkContext.defaultParallelism, F.xxhash64("o_custkey")
    )
    drawn = spend.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPS - 1)))
    ).withColumn(
        "u",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("-", F.col("o_custkey"), F.col("rep"))), 1, 6
            ),
            16,
            10,
        ).cast("bigint")
        / 16777216.0,
    )
    k = F.when(F.col("u") < _POIS1_CDF[0], 0)
    for i, cdf in enumerate(_POIS1_CDF[1:], start=1):
        k = k.when(F.col("u") < cdf, i)
    k = k.otherwise(6)
    rep_means = (
        drawn.withColumn("k", k)
        .groupBy("segment", "rep")
        .agg(
            (
                F.sum((F.col("k") * F.col("spend")).cast("decimal(30,6)")).cast("double")
                / F.nullif(F.sum("k").cast("bigint"), F.lit(0))
            ).alias("m")
        )
    )
    return (
        rep_means.groupBy("segment")
        .agg(
            F.round(F.avg("m"), 4).alias("boot_mean"),
            F.round(F.stddev_samp("m"), 4).alias("boot_se"),
            F.count("*").cast("bigint").alias("n_reps"),
        )
        .orderBy("segment")
    )


SAMPLE_POISSON_BOOT_SQL = """
WITH spend AS (
  SELECT c.c_mktsegment AS segment, c.c_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS spend
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
reps AS (SELECT UNNEST(range(%d)) AS rep),
drawn AS (
  SELECT segment, rep,
    CAST(CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '-' || CAST(rep AS VARCHAR)), 1, 6) AS BIGINT) AS DOUBLE) / 16777216.0 AS u,
    spend
  FROM spend CROSS JOIN reps
),
weighted AS (
  SELECT segment, rep,
    CASE WHEN u < %.17f THEN 0
         WHEN u < %.17f THEN 1
         WHEN u < %.17f THEN 2
         WHEN u < %.17f THEN 3
         WHEN u < %.17f THEN 4
         WHEN u < %.17f THEN 5
         ELSE 6 END AS k,
    spend
  FROM drawn
),
rep_means AS (
  SELECT segment, rep,
    CAST(SUM(CAST(k * spend AS DECIMAL(30,6))) AS DOUBLE) / NULLIF(SUM(k), 0) AS m
  FROM weighted GROUP BY 1, 2
)
SELECT segment,
       ROUND(AVG(m), 4) AS boot_mean,
       ROUND(STDDEV_SAMP(m), 4) AS boot_se,
       CAST(COUNT(*) AS BIGINT) AS n_reps
FROM rep_means GROUP BY segment ORDER BY segment
""" % ((BOOT_REPS,) + _POIS1_CDF)


def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement: per day, DAU, trailing-7-day WAU, and the
    DAU/WAU stickiness ratio. The WAU rolling-distinct does NOT
    window-count over base rows: each (day, user) activity row
    contributes itself to the 7 target days it falls inside (a 7-way
    explode — constant fan-out), then ONE (day)-keyed distinct count;
    the observed-days dimension joins broadcast (bounded by calendar
    span at any scale). The deduplicated activity is persisted once:
    three independent subtrees (days broadcast, DAU, WAU contrib)
    consume it, and without the pin each re-runs the events scan +
    distinct shuffle (guide §2.4 — an Exchange repeated three times
    for one logical input)."""
    from csdid_pyspark_spark.cache import attach_cache

    e = load_table(spark, sf_dir, "events")
    daily = e.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct().persist()
    days = daily.select("day").distinct()
    dau = daily.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    contrib = daily.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    wau = (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )
    out = (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )
    return attach_cache(out, daily)


EVENTS_STICKINESS_SQL = """
WITH daily AS (
  SELECT DISTINCT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM daily),
dau AS (SELECT day, COUNT(*) AS dau FROM daily GROUP BY day),
wau AS (
  SELECT d.day, COUNT(DISTINCT a.user_id) AS wau
  FROM days d JOIN daily a ON a.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day
)
SELECT STRFTIME(dau.day, '%Y-%m-%d') AS day, CAST(dau AS BIGINT) AS dau,
       CAST(wau AS BIGINT) AS wau,
       ROUND(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day ORDER BY day
"""


def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day split of active users into first-ever-seen vs
    returning — the acquisition/retention companion of the cohort
    triangle. The first-seen day rides a user-keyed window over the
    deduplicated (day, user) activity — ONE shuffle, no join."""
    e = load_table(spark, sf_dir, "events")
    daily = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    w = Window.partitionBy("user_id")
    return (
        daily.withColumn("first_day", F.min("day").over(w))
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
        )
        .orderBy("day")
    )


EVENTS_NEW_RETURNING_SQL = """
WITH daily AS (
  SELECT DISTINCT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, user_id FROM events
),
first AS (SELECT user_id, MIN(day) AS first_day FROM daily GROUP BY user_id)
SELECT STRFTIME(day, '%Y-%m-%d') AS day,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
FROM daily JOIN first USING (user_id)
GROUP BY day ORDER BY day
"""


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus term-frequency distribution:
    OLS slope/intercept/R² of ln(freq) on ln(rank). The frequency rank
    comes from the two-phase distributed scan
    (operators/packing.py::global_row_number) — at web scale the
    vocabulary is itself hundreds of millions of terms, so a bare
    ROW_NUMBER() OVER (ORDER BY f DESC) single-reducer window is the
    exact trap this engine avoids everywhere else; the regression is
    one covariance aggregate over the ranked table."""
    from csdid_pyspark_spark.operators.packing import global_row_number, release_cache

    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("f"))
        .withColumn("f_neg", -F.col("f"))
    )
    ranked = global_row_number(freq, ["f_neg", "token"])
    xy = ranked.select(
        F.log(F.col("rn").cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    slope = F.covar_pop("x", "y") / F.nullif(F.var_pop("x"), F.lit(0.0))
    out = xy.agg(
        F.count("*").cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias("intercept"),
        F.round(F.pow(F.corr("x", "y"), 2), 6).alias("r2"),
    )
    result = out.localCheckpoint(eager=True)
    release_cache(ranked)
    return result


TEXT_ZIPF_SQL = r"""
WITH tf AS (
  SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS token FROM documents
),
freq AS (SELECT token, COUNT(*) AS f FROM tf GROUP BY token),
ranked AS (
  SELECT LN(CAST(ROW_NUMBER() OVER (ORDER BY f DESC, token) AS DOUBLE)) AS x,
         LN(CAST(f AS DOUBLE)) AS y
  FROM freq
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(COVAR_POP(x, y) / NULLIF(VAR_POP(x), 0), 6) AS slope,
       ROUND(AVG(y) - (COVAR_POP(x, y) / NULLIF(VAR_POP(x), 0)) * AVG(x), 6) AS intercept,
       ROUND(POWER(CORR(x, y), 2), 6) AS r2
FROM ranked
"""


def events_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality strength per event type: 1 − SSE(hourly
    value vs its hour-of-day profile mean) / SSE(vs the global mean) —
    the variance-explained-by-season readout (STL-style strength on the
    additive hour profile). One base shuffle builds the hourly
    aggregate; the profile/global-mean windows and the final ratio run
    on that types×hours-bounded table."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("hr"),
        F.hour("ts").alias("hod"),
    ).agg(F.sum(F.col("value").cast("decimal(27,6)")).alias("v_d"))
    w_hod = Window.partitionBy("event_type", "hod")
    w_all = Window.partitionBy("event_type")
    stats = (
        hourly.select("event_type", "hod", F.col("v_d").cast("double").alias("v"))
        .withColumn("hod_mean", F.avg("v").over(w_hod))
        .withColumn("g_mean", F.avg("v").over(w_all))
    )
    resid = (F.col("v") - F.col("hod_mean")) * (F.col("v") - F.col("hod_mean"))
    total = (F.col("v") - F.col("g_mean")) * (F.col("v") - F.col("g_mean"))
    return (
        stats.groupBy("event_type")
        .agg(
            F.round(
                1.0 - F.sum(resid) / F.nullif(F.sum(total), F.lit(0.0)), 6
            ).alias("seasonality_strength"),
            F.count("*").cast("bigint").alias("n_hours"),
        )
        .orderBy("event_type")
    )


EVENTS_SEASONALITY_SQL = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hr, HOUR(ts) AS hod,
         SUM(CAST(value AS DECIMAL(27,6))) AS v
  FROM events GROUP BY 1, 2, 3
),
stats AS (
  SELECT event_type, CAST(v AS DOUBLE) AS v,
         AVG(CAST(v AS DOUBLE)) OVER (PARTITION BY event_type, hod) AS hod_mean,
         AVG(CAST(v AS DOUBLE)) OVER (PARTITION BY event_type) AS g_mean
  FROM hourly
)
SELECT event_type,
       ROUND(1.0 - (SUM((v - hod_mean) * (v - hod_mean))
                    / NULLIF(SUM((v - g_mean) * (v - g_mean)), 0)), 6) AS seasonality_strength,
       CAST(COUNT(*) AS BIGINT) AS n_hours
FROM stats GROUP BY event_type ORDER BY event_type
"""


def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory ABC analysis: parts split into A (first 80% of
    cumulative revenue), B (to 95%), C (tail) with per-class counts and
    revenue share — the classic concentration report, and a second
    consumer of the two-phase rank+running-total scan (no
    single-reducer cumulative window; totals broadcast)."""
    from csdid_pyspark_spark.operators.packing import global_rank_cumsum, release_cache

    l = load_table(spark, sf_dir, "lineitem")
    prev = l.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
        ).alias("rev")
    )
    scan = global_rank_cumsum(
        prev.withColumn("rev_neg", -F.col("rev")), ["rev_neg", "l_partkey"], "rev"
    )
    ranked = scan.df
    # grand total from the scan's per-partition stats (no second pass)
    tot = spark.createDataFrame([(scan.total_sum,)], "tot decimal(30,6)")
    ratio = F.col("cum").cast("double") / F.col("tot").cast("double")
    out = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(
            "abc_class",
            F.when(ratio <= 0.8, "A").when(ratio <= 0.95, "B").otherwise("C"),
        )
        .groupBy("abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(F.sum("rev").cast("double"), 2).alias("revenue"),
            F.round(
                F.sum("rev").cast("double") / F.max(F.col("tot").cast("double")), 6
            ).alias("rev_share"),
        )
        .orderBy("abc_class")
    )
    result = out.localCheckpoint(eager=True)
    release_cache(ranked)
    return result


PARTS_ABC_SQL = """
WITH prev AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS rev
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT rev, SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum, SUM(rev) OVER () AS tot
  FROM prev
),
cls AS (
  SELECT CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.8 THEN 'A'
              WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.95 THEN 'B'
              ELSE 'C' END AS abc_class,
         rev, tot
  FROM ranked
)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS revenue,
       ROUND(CAST(SUM(rev) AS DOUBLE) / MAX(CAST(tot AS DOUBLE)), 6) AS rev_share
FROM cls GROUP BY abc_class ORDER BY abc_class
"""


# Token budget for the nucleus-style corpus cut (~55% of the sf0.01
# corpus's 27k tokens — a real cut at every tested scale factor).
CURATION_TOKEN_BUDGET = 15_000


def curation_budget_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus-style corpus budgeting: rank documents by a quality
    proxy (type-token ratio) and keep the best until a global token
    budget is exhausted — how a pretraining mixture takes "the best N
    tokens" from a source rather than a row-count sample. The
    quality-ordered running token total is the two-phase distributed
    scan (operators/packing.py::global_rank_cumsum) — a web-scale
    corpus never funnels through one reducer to find the cut point —
    and the report is one tiny per-source aggregate of the kept set.
    TTR is rounded to 6 BEFORE ranking so the rank order (and thus the
    cut) is engine-portable."""
    from csdid_pyspark_spark.operators.packing import global_rank_cumsum, release_cache

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    scored = d.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tok"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("ttr"),
    ).withColumn("ttr_neg", -F.col("ttr"))
    ranked = global_rank_cumsum(scored, ["ttr_neg", "doc_id"], "n_tok", cum_col="cum_tok").df
    out = (
        ranked.filter(F.col("cum_tok") <= CURATION_TOKEN_BUDGET)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("tokens"),
            F.round(F.avg("ttr"), 6).alias("avg_ttr"),
        )
        .orderBy("source")
    )
    result = out.localCheckpoint(eager=True)
    release_cache(ranked)
    return result


CURATION_BUDGET_SQL = r"""
WITH scored AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\s+')) AS n_tok,
         ROUND(CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
               / len(string_split_regex(trim(text), '\s+')), 6) AS ttr
  FROM documents
),
ranked AS (
  SELECT doc_id, source, n_tok, ttr,
         SUM(n_tok) OVER (ORDER BY ttr DESC, doc_id) AS cum_tok
  FROM scored
),
kept AS (SELECT * FROM ranked WHERE cum_tok <= %d)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS tokens,
       ROUND(AVG(ttr), 6) AS avg_ttr
FROM kept GROUP BY source ORDER BY source
""" % CURATION_TOKEN_BUDGET


def events_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event counts — the inequality
    statistic behind "how concentrated is engagement" (and, on corpus
    token counts, "how skewed is the mixture"). Exact rank formula
    G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n over ascending ranks, with the
    rank from the two-phase distributed scan — the per-user aggregate
    is user-cardinality-sized, so a bare ROW_NUMBER() window would be
    the usual single-reducer trap at scale."""
    from csdid_pyspark_spark.operators.packing import global_row_number, release_cache

    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(F.count("*").alias("x"))
    ranked = global_row_number(per, ["x", "user_id"], out_col="i")
    n = F.count("*")
    out = ranked.agg(
        n.cast("bigint").alias("n_users"),
        F.round(
            (2 * F.sum(F.col("i") * F.col("x"))).cast("double")
            / (n * F.sum("x"))
            - (n + 1).cast("double") / n,
            6,
        ).alias("gini"),
    )
    result = out.localCheckpoint(eager=True)
    release_cache(ranked)
    return result


EVENTS_GINI_SQL = """
WITH per AS (SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id),
ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i FROM per
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(2 * SUM(i * x) AS DOUBLE) / (COUNT(*) * SUM(x))
             - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
FROM ranked
"""


def docs_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (and max-normalized entropy) of the corpus
    source distribution — the one-number mixture-balance diagnostic a
    data team watches as sources are re-weighted. One groupBy over the
    corpus; the 1-row totals land as a broadcast cross join."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count("*").alias("n"))
    t = s.agg(
        F.sum("n").alias("tot"), F.count("*").alias("k")
    )
    p = F.col("n").cast("double") / F.col("tot")
    return s.crossJoin(F.broadcast(t)).agg(
        F.max("k").cast("bigint").alias("n_sources"),
        F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        F.round(
            -F.sum(p * F.log(p)) / F.log(F.max("k").cast("double")), 6
        ).alias("normalized"),
    )


DOCS_SOURCE_ENTROPY_SQL = """
WITH s AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
t AS (SELECT SUM(n) AS tot, COUNT(*) AS k FROM s)
SELECT CAST(MAX(k) AS BIGINT) AS n_sources,
       ROUND(-SUM((CAST(n AS DOUBLE)/tot) * LN(CAST(n AS DOUBLE)/tot)), 6) AS entropy,
       ROUND(-SUM((CAST(n AS DOUBLE)/tot) * LN(CAST(n AS DOUBLE)/tot))
             / LN(CAST(MAX(k) AS DOUBLE)), 6) AS normalized
FROM s CROSS JOIN t
"""


def orders_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence distribution: days between a customer's
    consecutive orders (min / exact p50 / p90 / max) — the reorder-
    cycle statistic behind replenishment and churn-risk models. ONE
    customer-keyed window shuffle; integer day gaps, so the exact
    interpolated percentiles are engine-portable."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "gap_days"
        )
    ).filter(F.col("gap_days").isNotNull())
    return gaps.agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.min("gap_days").cast("bigint").alias("min_days"),
        F.expr("percentile(gap_days, 0.5)").cast("double").alias("p50_days"),
        F.expr("percentile(gap_days, 0.9)").cast("double").alias("p90_days"),
        F.max("gap_days").cast("bigint").alias("max_days"),
    )


ORDERS_INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT DATE_DIFF('day',
           LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS gap_days
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_days) AS BIGINT) AS min_days,
       CAST(QUANTILE_CONT(gap_days, 0.5) AS DOUBLE) AS p50_days,
       CAST(QUANTILE_CONT(gap_days, 0.9) AS DOUBLE) AS p90_days,
       CAST(MAX(gap_days) AS BIGINT) AS max_days
FROM gaps WHERE gap_days IS NOT NULL
"""


QUERIES = {
    "events_kaplan_meier": events_kaplan_meier,
    "events_markov_transitions": events_markov_transitions,
    "docs_token_pmi": docs_token_pmi,
    "dedup_containment": dedup_containment,
    "orders_cohort_ltv": orders_cohort_ltv,
    "suppliers_pareto": suppliers_pareto,
    "orders_yoy_revenue": orders_yoy_revenue,
    "sample_poisson_bootstrap": sample_poisson_bootstrap,
    "events_stickiness": events_stickiness,
    "events_new_vs_returning": events_new_vs_returning,
    "text_zipf_fit": text_zipf_fit,
    "events_seasonality_strength": events_seasonality_strength,
    "parts_abc_classification": parts_abc_classification,
    "curation_budget_cut": curation_budget_cut,
    "events_activity_gini": events_activity_gini,
    "docs_source_entropy": docs_source_entropy,
    "orders_interarrival": orders_interarrival,
}
ORACLES = {
    "events_kaplan_meier": EVENTS_KM_SQL,
    "events_markov_transitions": EVENTS_MARKOV_SQL,
    "docs_token_pmi": DOCS_PMI_SQL,
    "dedup_containment": DEDUP_CONTAINMENT_SQL,
    "orders_cohort_ltv": ORDERS_LTV_SQL,
    "suppliers_pareto": SUPPLIERS_PARETO_SQL,
    "orders_yoy_revenue": ORDERS_YOY_SQL,
    "sample_poisson_bootstrap": SAMPLE_POISSON_BOOT_SQL,
    "events_stickiness": EVENTS_STICKINESS_SQL,
    "events_new_vs_returning": EVENTS_NEW_RETURNING_SQL,
    "text_zipf_fit": TEXT_ZIPF_SQL,
    "events_seasonality_strength": EVENTS_SEASONALITY_SQL,
    "parts_abc_classification": PARTS_ABC_SQL,
    "curation_budget_cut": CURATION_BUDGET_SQL,
    "events_activity_gini": EVENTS_GINI_SQL,
    "docs_source_entropy": DOCS_SOURCE_ENTROPY_SQL,
    "orders_interarrival": ORDERS_INTERARRIVAL_SQL,
}

# ---------------------------------------------------------------------------
# Shapley-value channel attribution (exact, over exposure-set coalitions)
# ---------------------------------------------------------------------------

_SHAPLEY_CHANNELS = (("view", 1), ("click", 2), ("signup", 4), ("error", 8))


def _shapley_terms() -> list[tuple[str, int, int, float]]:
    """(channel, S, S∪{i}, weight) for every channel i and every
    coalition S not containing i: weight = |S|!·(n−|S|−1)!/n! — the
    exact Shapley kernel for n = 4 channels (32 rows, a literal)."""
    fact = [1, 1, 2, 6, 24]
    n = len(_SHAPLEY_CHANNELS)
    rows = []
    for name, bit in _SHAPLEY_CHANNELS:
        for s in range(1 << n):
            if s & bit:
                continue
            k = bin(s).count("1")
            rows.append((name, s, s + bit, fact[k] * fact[n - 1 - k] / float(fact[n])))
    return rows


def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value conversion credit per marketing channel
    (Shapley 1953 applied to attribution à la Zhao-Mahboobi-Bagheri
    2018): the characteristic function v(S) is the observed conversion
    rate (purchase) among users whose exposure set is EXACTLY S over
    the four non-purchase event types, and each channel's credit is
    the Shapley average of its marginal contributions v(S∪{i})−v(S)
    over all 2³ coalitions. Unlike last-touch/position heuristics
    (events_attribution_*), this is order-free and satisfies the
    efficiency/symmetry axioms; unlike the Markov model it needs no
    chain assumption. Coalitions missing from the data contribute
    v = 0 (documented estimator convention).

    Scale shape: ONE data-scale groupBy(user_id, day) builds the
    exposure bitmask + conversion flag (map-side combinable MAXes); the
    16-row v(S) table and the 32-row Shapley kernel are broadcast
    literals, so channel count — not corpus size — bounds the algebra
    (exact Shapley is 2^n; past ~20 channels you sample permutations
    instead)."""
    e = load_table(spark, sf_dir, "events")
    bits = [
        F.max(F.when(F.col("event_type") == name, 1).otherwise(0)).alias(f"b_{name}")
        for name, _ in _SHAPLEY_CHANNELS
    ]
    u = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        *bits,
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    mask = sum(
        (F.col(f"b_{name}") * bit for name, bit in _SHAPLEY_CHANNELS),
        F.lit(0),
    )
    m = (
        u.select(mask.alias("mask"), "conv")
        .groupBy("mask")
        .agg(F.count("*").alias("n"), F.sum("conv").alias("c"))
    )
    # v(∅) = 0 by the attribution convention (a journey with no
    # channel touch earns no credit baseline): mask-0 units are
    # conversion-only days whose empirical rate is trivially ~1 and
    # would poison every marginal as v(S∪{i}) − 1.
    v = m.filter(F.col("mask") != 0).select(
        "mask", (F.col("c").cast("double") / F.col("n")).alias("v")
    )
    terms = spark.createDataFrame(
        _shapley_terms(), "channel string, s int, s1 int, w double"
    )
    v0 = v.select(F.col("mask").alias("m0"), F.col("v").alias("v0"))
    v1 = v.select(F.col("mask").alias("m1"), F.col("v").alias("v1"))
    shap = (
        terms.join(F.broadcast(v0), F.col("m0") == F.col("s"), "left")
        .join(F.broadcast(v1), F.col("m1") == F.col("s1"), "left")
        .groupBy("channel")
        .agg(
            F.round(
                F.sum(
                    F.col("w")
                    * (
                        F.coalesce(F.col("v1"), F.lit(0.0))
                        - F.coalesce(F.col("v0"), F.lit(0.0))
                    )
                ),
                6,
            ).alias("shapley")
        )
    )
    chan = spark.createDataFrame(
        list(_SHAPLEY_CHANNELS), "channel string, bit int"
    )
    expo = (
        chan.join(F.broadcast(m), F.col("mask").bitwiseAND(F.col("bit")) != 0)
        .groupBy("channel")
        .agg(F.sum("n").alias("n_exposed"))
    )
    return (
        shap.join(F.broadcast(expo), "channel", "left")
        .select(
            "channel",
            "shapley",
            F.coalesce(F.col("n_exposed"), F.lit(0)).cast("bigint").alias(
                "n_exposed"
            ),
        )
        .orderBy("channel")
    )


_SHAPLEY_TERMS_SQL = ",\n    ".join(
    f"('{c}', {s}, {s1}, CAST({w!r} AS DOUBLE))"
    for c, s, s1, w in _shapley_terms()
)
_SHAPLEY_CHAN_SQL = ", ".join(f"('{c}', {b})" for c, b in _SHAPLEY_CHANNELS)

SHAPLEY_SQL = f"""
WITH u AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS b_view,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS b_click,
         MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS b_signup,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS b_error,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT b_view * 1 + b_click * 2 + b_signup * 4 + b_error * 8 AS mask,
         COUNT(*) AS n, SUM(conv) AS c
  FROM u GROUP BY 1
),
v AS (SELECT mask, CAST(c AS DOUBLE) / n AS v FROM m WHERE mask <> 0),
terms(channel, s, s1, w) AS (VALUES
    {_SHAPLEY_TERMS_SQL}),
chan(channel, bit) AS (VALUES {_SHAPLEY_CHAN_SQL}),
shap AS (
  SELECT t.channel,
         ROUND(SUM(t.w * (COALESCE(v1.v, 0.0) - COALESCE(v0.v, 0.0))), 6) AS shapley
  FROM terms t
  LEFT JOIN v v0 ON v0.mask = t.s
  LEFT JOIN v v1 ON v1.mask = t.s1
  GROUP BY 1
),
expo AS (
  SELECT c.channel, SUM(m.n) AS n_exposed
  FROM chan c JOIN m ON (m.mask & c.bit) <> 0 GROUP BY 1
)
SELECT s.channel, s.shapley,
       CAST(COALESCE(e.n_exposed, 0) AS BIGINT) AS n_exposed
FROM shap s LEFT JOIN expo e ON e.channel = s.channel
ORDER BY s.channel
"""

QUERIES["events_shapley_attribution"] = events_shapley_attribution
ORACLES["events_shapley_attribution"] = SHAPLEY_SQL


# ---------------------------------------------------------------------------
# Population-stability-index drift monitor (training-data monitoring)
# ---------------------------------------------------------------------------

def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the first and
    second half of the observation window — the standard production
    monitor for feature/label drift in a training pipeline (PSI < 0.1
    stable, 0.1-0.2 moderate, > 0.2 drifted; Siddiqi 2006). The value
    distribution is binned on TEN FIXED-WIDTH bins (floor(value/50),
    capped — IEEE division + floor, bit-identical across engines,
    unlike engine-specific quantile estimators), each side Laplace-
    smoothed (+0.5 per bin) so empty bins never produce infinities,
    and psi = Σ_b (p_cur − p_ref)·ln(p_cur/p_ref).

    Scale shape: ONE aggregation to (type, bin, side) counts (60 result
    rows), a broadcast completion over the fixed 10-bin frame so
    all-empty bins contribute their smoothed mass, and result-sized
    algebra — at 100 TB this is a single map-side-combinable pass over
    the events scan. In production the same expression runs as a
    watermarked streaming aggregation against a pinned reference."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.least(F.lit(9), F.floor(F.col("value") / 50.0)).cast("int").alias("b"),
        (
            F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp")
        ).cast("int").alias("cur"),
    )
    # ONE events scan: everything downstream (type list, bin
    # completion, totals, psi) re-reads this <= |types|x10-row frame,
    # which without the persist is recomputed per consumer (observed:
    # FOUR parquet scans in the physical plan)
    cnt = ev.groupBy("event_type", "b").agg(
        F.sum(1 - F.col("cur")).alias("r"),
        F.sum("cur").alias("c"),
    ).persist()
    types = cnt.select("event_type").distinct()
    bins = spark.range(10).select(F.col("id").cast("int").alias("b"))
    full = (
        types.crossJoin(F.broadcast(bins))
        .join(cnt, ["event_type", "b"], "left")
        .select(
            "event_type",
            "b",
            F.coalesce("r", F.lit(0)).alias("r"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    tot = full.groupBy("event_type").agg(
        F.sum("r").alias("n_ref"), F.sum("c").alias("n_cur")
    )
    out = (
        full.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            (
                ((F.col("c") + 0.5) / (F.col("n_cur") + 5.0))
                - ((F.col("r") + 0.5) / (F.col("n_ref") + 5.0))
            ).alias("dp"),
            (
                F.log((F.col("c") + 0.5) / (F.col("n_cur") + 5.0))
                - F.log((F.col("r") + 0.5) / (F.col("n_ref") + 5.0))
            ).alias("lr"),
        )
        .groupBy("event_type", "n_ref", "n_cur")
        .agg(F.round(F.sum(F.col("dp") * F.col("lr")), 6).alias("psi"))
        .select(
            "event_type",
            F.col("n_ref").cast("bigint").alias("n_ref"),
            F.col("n_cur").cast("bigint").alias("n_cur"),
            "psi",
            (F.col("psi") > 0.2).alias("drifted"),
        )
        .orderBy("event_type")
    )
    return attach_cache(out, cnt)


EVENTS_PSI_SQL = """
WITH ev AS (
  SELECT event_type,
         LEAST(9, CAST(FLOOR(value / 50.0) AS INT)) AS b,
         CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS cur
  FROM events
),
cnt AS (
  SELECT event_type, b, SUM(1 - cur) AS r, SUM(cur) AS c
  FROM ev GROUP BY 1, 2
),
filled AS (
  SELECT t.event_type, g.b,
         COALESCE(cnt.r, 0) AS r, COALESCE(cnt.c, 0) AS c
  FROM (SELECT DISTINCT event_type FROM cnt) t
  CROSS JOIN (SELECT UNNEST(range(10)) AS b) g
  LEFT JOIN cnt ON cnt.event_type = t.event_type AND cnt.b = g.b
),
tot AS (
  SELECT event_type, SUM(r) AS n_ref, SUM(c) AS n_cur
  FROM filled GROUP BY 1
)
SELECT f.event_type,
       CAST(t.n_ref AS BIGINT) AS n_ref,
       CAST(t.n_cur AS BIGINT) AS n_cur,
       ROUND(SUM(
         (((f.c + 0.5) / (t.n_cur + 5.0)) - ((f.r + 0.5) / (t.n_ref + 5.0)))
         * (LN((f.c + 0.5) / (t.n_cur + 5.0)) - LN((f.r + 0.5) / (t.n_ref + 5.0)))
       ), 6) AS psi,
       ROUND(SUM(
         (((f.c + 0.5) / (t.n_cur + 5.0)) - ((f.r + 0.5) / (t.n_ref + 5.0)))
         * (LN((f.c + 0.5) / (t.n_cur + 5.0)) - LN((f.r + 0.5) / (t.n_ref + 5.0)))
       ), 6) > 0.2 AS drifted
FROM filled f JOIN tot t ON t.event_type = f.event_type
GROUP BY f.event_type, t.n_ref, t.n_cur
ORDER BY f.event_type
"""

QUERIES["events_psi_drift"] = events_psi_drift
ORACLES["events_psi_drift"] = EVENTS_PSI_SQL
