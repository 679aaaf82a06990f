"""Survival / path / co-occurrence / containment analytics.

Four oracle-checked queries extending the events + documents surface:

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

Scale notes are on each query; every aggregation is a built-in JVM
expression (no Python UDFs anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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
  CASE WHEN MIN(CAST(n_risk - d AS DOUBLE) / n_risk) OVER (ORDER BY dur_hr) = 0 THEN 0.0
       ELSE ROUND(EXP(SUM(LN(CAST(n_risk - d AS DOUBLE) / n_risk))
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


QUERIES = {
    "events_kaplan_meier": events_kaplan_meier,
    "events_markov_transitions": events_markov_transitions,
    "docs_token_pmi": docs_token_pmi,
    "dedup_containment": dedup_containment,
}
ORACLES = {
    "events_kaplan_meier": EVENTS_KM_SQL,
    "events_markov_transitions": EVENTS_MARKOV_SQL,
    "docs_token_pmi": DOCS_PMI_SQL,
    "dedup_containment": DEDUP_CONTAINMENT_SQL,
}
