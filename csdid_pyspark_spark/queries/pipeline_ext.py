"""Entity resolution, sketch, governance, and layout-advisor queries.

Round-5 extensions of the training-data-pipeline surface — each one a
capability class a 100 TB curation/warehouse stack needs that the
earlier modules didn't cover:

* ``er_fuzzy_parts`` — blocked fuzzy self-join (record linkage):
  candidate pairs ONLY from (brand, first-name-token) equi-join
  blocks, scored with JVM ``levenshtein`` — never an all-pairs cross
  join (operators/linkage.py).
* ``text_span_cut`` — the CUT step of exact-substring dedup (Lee et
  al., "Deduplicating Training Data Makes Language Models Better"):
  merge each document's cross-document repeated W-token spans into
  disjoint intervals and report how many tokens survive.
* ``dp_noisy_counts`` — ε-differentially-private release of per-source
  document counts (seeded-hash uniform → inverse-CDF Laplace, ε=1);
  fully deterministic and portable, so the DP mechanism itself is
  oracle-checked.
* ``sketch_countmin_freq`` — Count-Min sketch (depth 4 × width 16)
  point estimates vs true token frequencies, built with a
  cross-engine-portable polynomial hash; demonstrates the
  fixed-memory frequency table a streaming corpus profiler uses.
* ``layout_skew_advisor`` — partition-layout what-if: rows-per-
  partition distribution (count, avg, p90, max, skew ratio) for
  candidate partition keys of the events stream — the table a data
  engineer reads before picking a 100 TB layout.
* ``pii_l_diversity`` — l-diversity histogram over quasi-identifier
  groups (the governance metric k-anonymity alone misses).

All aggregation is built-in JVM expressions (no Python UDFs); every
query has a DuckDB oracle below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csdid_pyspark_spark.operators import linkage
from csdid_pyspark_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Entity resolution: blocked fuzzy join
# ---------------------------------------------------------------------------

ER_MAX_DIST = 3


def er_fuzzy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage over the part catalog: candidate pairs blocked by
    (p_brand, first name token), scored by Levenshtein distance ≤ 3.
    The block equi-join is the only pair generator — sum of block² not
    table² — and blocks stay bounded because the key includes the name
    token; operators/linkage.py carries the max_block skew guard for
    degenerate keys (unit-tested; non-binding here so the oracle is an
    unguarded plain SQL join)."""
    p = load_table(spark, sf_dir, "part").withColumn(
        "tok1", F.expr("split_part(p_name, ' ', 1)")
    )
    return linkage.blocked_fuzzy_pairs(
        p, ["p_brand", "tok1"], "p_partkey", "p_name", max_dist=ER_MAX_DIST
    )


ER_FUZZY_SQL = """
WITH b AS (
  SELECT p_partkey AS id, p_name AS nm, p_brand AS brand,
         split_part(p_name, ' ', 1) AS tok1
  FROM part
)
SELECT a.id AS id_a, c.id AS id_b,
       CAST(levenshtein(a.nm, c.nm) AS BIGINT) AS dist,
       ROUND(1 - levenshtein(a.nm, c.nm)
                 / CAST(GREATEST(length(a.nm), length(c.nm)) AS DOUBLE), 6) AS sim
FROM b a JOIN b c ON a.brand = c.brand AND a.tok1 = c.tok1 AND a.id < c.id
WHERE levenshtein(a.nm, c.nm) <= %d
""" % ER_MAX_DIST


# ---------------------------------------------------------------------------
# Exact-substring span CUT (companion of text_repeated_spans)
# ---------------------------------------------------------------------------

SPAN_CUT_W = 10


def text_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document report of the exact-substring CUT: every W-token
    span whose hash recurs in ≥2 distinct documents is marked, a
    per-document sweep merges overlapping/adjacent marked intervals
    [pos, pos+W), and the doc keeps n_tok − covered tokens. This is
    the removal step that follows ``text_repeated_spans``'s census —
    cut memorized boilerplate out of training text instead of dropping
    whole documents. One explode + one span-hash shuffle + windows
    partitioned BY DOCUMENT (bounded by per-doc token count, never
    corpus-wide). Docs with no repeated span are not reported."""
    return span_cut_frame(load_table(spark, sf_dir, "documents"), SPAN_CUT_W)


def span_cut_frame(
    docs: DataFrame,
    w: int,
    *,
    count_within_doc: bool = False,
    emit_max_region: bool = False,
) -> DataFrame:
    """Operator core of :func:`text_span_cut` over any (doc_id, text)
    frame — also driven at rehearsal scale by ``stress.py spans``.

    ``count_within_doc=False`` (default) marks spans recurring in ≥2
    DISTINCT documents; ``True`` marks spans with ≥2 total occurrences
    — within-document repeats count, which is Lee et al.'s actual
    ExactSubstr rule (a doc repeating its own boilerplate gets cut).
    ``emit_max_region=True`` appends ``max_region_len``, the longest
    merged duplicated interval per doc. With w = L these merged
    intervals are EXACTLY the token coverage of all duplicated
    substrings of length ≥ L: any duplicated M ≥ L substring at
    position p contributes duplicated L-windows at p..p+M−L whose
    union is the full [p, p+M) — so no suffix array and no boundary
    re-check pass is needed for coverage parity with the published
    formulation."""
    from csdid_pyspark_spark.operators.fanout import widen_fanout

    d = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tokens")
    )
    # the W-window hash explode fans out ~n_tok rows per doc inside
    # this stage: widen a physically small corpus to core count first
    # (no-op at real scale — fanout.py)
    d = widen_fanout(
        d.filter(F.size("tokens") >= w).select(
            "doc_id", "tokens", F.size("tokens").alias("n_tok")
        )
    )
    # the span table feeds BOTH the dup census and the mark join;
    # uncached, the tokenize+hash explode (the dominant cost) runs
    # twice — persist once, exposed for release via attach_cache
    # the hash is kept as 16-byte BINARY (unhex of the md5 hex) — the
    # same md5 value under a bijective recoding, so grouping/semi-join
    # equality is unchanged while the census exchange, the semi-join
    # key and the persisted span table carry half the bytes of the
    # 32-char hex string (guide §2.3: shuffle fewer bytes). h never
    # reaches the output, so no oracle sees the encoding.
    spans = d.select(
        "doc_id",
        "n_tok",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(tokens) - {w}), "
                f"i -> unhex(md5(concat_ws(' ', slice(tokens, i + 1, {w})))))"
            )
        ).alias("pos", "h"),
    ).persist()
    occurrence = F.count("*") if count_within_doc else F.countDistinct("doc_id")
    dup = (
        spans.groupBy("h")
        .agg(occurrence.alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    marked = spans.join(dup, "h", "left_semi")
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + w).over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    regions = (
        marked.withColumn(
            "new_r",
            F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
        )
        .withColumn(
            "region",
            F.sum("new_r").over(
                wdoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "n_tok", "region")
        .agg((F.max("pos") + w - F.min("pos")).alias("cov"))
    )
    from csdid_pyspark_spark.cache import attach_cache

    aggs = [
        F.sum("cov").cast("bigint").alias("removed_tok"),
        F.count("*").cast("bigint").alias("n_regions"),
    ]
    cols = [
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tok"),
        "removed_tok",
        (F.col("n_tok") - F.col("removed_tok")).cast("bigint").alias("kept_tok"),
        "n_regions",
    ]
    if emit_max_region:
        aggs.append(F.max("cov").cast("bigint").alias("max_region_len"))
        cols.append(F.col("max_region_len"))
    return attach_cache(
        regions.groupBy("doc_id", "n_tok").agg(*aggs).select(*cols),
        spans,
    )


_SPAN_CUT_SQL_TMPL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens FROM documents
),
base AS (
  SELECT doc_id, tokens, len(tokens) AS n_tok FROM toks WHERE len(tokens) >= %(w)d
),
spans AS (
  SELECT doc_id, n_tok, u.pos AS pos, u.h AS h
  FROM (
    SELECT doc_id, n_tok,
           unnest(list_transform(range(0, n_tok - %(w)d + 1),
                  i -> {'pos': i,
                        'h': md5(array_to_string(list_slice(tokens, i + 1, i + %(w)d), ' '))})) AS u
    FROM base
  )
),
dup AS (SELECT h FROM spans GROUP BY h HAVING %(duprule)s >= 2),
marked AS (SELECT s.doc_id, s.n_tok, s.pos FROM spans s SEMI JOIN dup USING (h)),
flagged AS (
  SELECT doc_id, n_tok, pos,
         CASE WHEN MAX(pos + %(w)d) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR pos > MAX(pos + %(w)d) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_r
  FROM marked
),
regioned AS (
  SELECT doc_id, n_tok, pos,
         SUM(new_r) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS region
  FROM flagged
),
merged AS (
  SELECT doc_id, n_tok, region, MAX(pos) + %(w)d - MIN(pos) AS cov
  FROM regioned GROUP BY doc_id, n_tok, region
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(SUM(cov) AS BIGINT) AS removed_tok,
       CAST(n_tok - SUM(cov) AS BIGINT) AS kept_tok,
       CAST(COUNT(*) AS BIGINT) AS n_regions%(extra_cols)s
FROM merged GROUP BY doc_id, n_tok
"""

TEXT_SPAN_CUT_SQL = _SPAN_CUT_SQL_TMPL % {
    "w": SPAN_CUT_W,
    "duprule": "COUNT(DISTINCT doc_id)",
    "extra_cols": "",
}

# Minimum duplicated-match length for the Lee et al. variant: merged
# intervals of duplicated L-windows are exactly the coverage of all
# duplicated substrings of length >= L (see span_cut_frame docstring).
SPAN_MINLEN_L = 15

TEXT_SPAN_CUT_MINLEN_SQL = _SPAN_CUT_SQL_TMPL % {
    "w": SPAN_MINLEN_L,
    # total occurrences, not distinct docs: within-document repeats
    # count, matching the published ExactSubstr rule
    "duprule": "COUNT(*)",
    "extra_cols": ",\n       CAST(MAX(cov) AS BIGINT) AS max_region_len",
}


def text_span_cut_minlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring CUT, published formulation: remove every token
    covered by a duplicated substring of length ≥ L (L = 15 tokens),
    where duplicated means ≥2 TOTAL occurrences anywhere in the corpus
    — including a document repeating its own boilerplate, which
    ``text_span_cut``'s cross-document rule misses. Marking duplicated
    L-windows and merging them per document yields EXACTLY this
    coverage (every M ≥ L match is the union of its M−L+1 duplicated
    L-windows), so the one-explode/one-shuffle plan needs no
    distributed suffix array; ``max_region_len`` reports the longest
    merged duplicated interval per doc. Property-tested against a
    brute-force O(n²) all-substring reference
    (tests/test_property.py)."""
    return span_cut_frame(
        load_table(spark, sf_dir, "documents"),
        SPAN_MINLEN_L,
        count_within_doc=True,
        emit_max_region=True,
    )


# ---------------------------------------------------------------------------
# ε-DP noisy counts (seeded-hash Laplace mechanism)
# ---------------------------------------------------------------------------

# portable polynomial string hash (same family as text_winnow_fingerprint):
# fold (acc*131 + ascii) mod 1e9+7 over the characters, seeded init
_POLY_MOD = 1_000_000_007

# Laplace-noise seed for dp_noisy_counts. With the DEFAULT (0, public)
# the release is NOT private — anyone can recompute the noise and
# subtract it; the query is then a deterministic, oracle-checkable
# mechanism demo. A real private release must supply a SECRET seed via
# SPARK_GRAFT_DP_SEED: both the Spark query and the oracle SQL below
# are built from this one constant at import time, so determinism (and
# the hash gate) survives any seed choice made before import.
import os as _os

DP_SEED = int(_os.environ.get("SPARK_GRAFT_DP_SEED", "0"))


def _spark_polyhash(col: str, seed: str) -> str:
    """SQL text for the portable char-fold hash of ``col`` with BIGINT
    seed expression ``seed`` — identical math in DuckDB's list_reduce."""
    return (
        f"aggregate(transform(sequence(1, length({col})), "
        f"i -> CAST(ascii(substring({col}, i, 1)) AS BIGINT)), "
        f"CAST({seed} AS BIGINT), (acc, x) -> (acc * 131 + x) % {_POLY_MOD})"
    )


def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace mechanism for per-source document counts (ε=1,
    sensitivity 1 → scale b=1): the noise draw is the inverse-CDF
    transform of a uniform derived from a seeded portable hash of the
    group key, so the mechanism's arithmetic is deterministic and
    oracle-verifiable. PRIVACY CAVEAT: the privacy of the release is
    exactly the secrecy of the seed. Under the default public seed
    (``DP_SEED`` = 0) the noise is a public function of the group key
    — recomputable, subtractable — so this run is a MECHANISM DEMO
    that the hash gate can check, not a private release. A production
    release sets ``SPARK_GRAFT_DP_SEED`` to a secret before import;
    both this query and its oracle derive from that one constant, so
    the cross-engine check still holds under any seed.
    One groupBy; noise math is scalar per group row."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(F.count("*").alias("n"))
    h = _spark_polyhash("source", str(DP_SEED))
    u = f"(CAST(({h}) * 2654435761 % 2147483648 AS DOUBLE) + 0.5) / 2147483648.0"
    lap = (
        f"-(CASE WHEN ({u}) >= 0.5 THEN 1.0 ELSE -1.0 END) "
        f"* ln(1 - 2 * abs(({u}) - 0.5))"
    )
    return g.select(
        "source",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") + F.expr(lap), 6).alias("noisy_n"),
    ).orderBy("source")


DP_NOISY_SQL = rf"""
WITH g AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
h AS (
  SELECT source, n,
         list_reduce(list_prepend(CAST({DP_SEED} AS BIGINT),
             list_transform(range(1, length(source) + 1),
                            i -> CAST(ascii(substring(source, i, 1)) AS BIGINT))),
             (acc, x) -> (acc * 131 + x) %% 1000000007) AS hv
  FROM g
),
u AS (
  SELECT source, n,
         (CAST(hv * 2654435761 %% 2147483648 AS DOUBLE) + 0.5) / 2147483648.0 AS uv
  FROM h
)
SELECT source, CAST(n AS BIGINT) AS n,
       ROUND(n + (-(CASE WHEN uv >= 0.5 THEN 1.0 ELSE -1.0 END)
                  * ln(1 - 2 * abs(uv - 0.5))), 6) AS noisy_n
FROM u ORDER BY source
""".replace("%%", "%")


# ---------------------------------------------------------------------------
# Count-Min sketch point estimates
# ---------------------------------------------------------------------------

CM_DEPTH_SEEDS = (17, 89, 331, 7919)
CM_WIDTH = 16
CM_TOPK = 20


def sketch_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (depth 4 × width 16) of corpus token
    frequencies, read back for the top-20 true tokens: est_n is the
    min over depth rows of the bucket counters, and CM guarantees
    est_n ≥ true_n (overcount ≥ 0 is asserted by the test suite).
    The sketch is built from the DISTINCT-token count table (not raw
    instances), so hash evaluations scale with vocabulary, not corpus
    size — and the bucket table itself is fixed 4×16 rows at ANY
    scale: the point of a sketch. Portable polynomial hash, so DuckDB
    builds the identical sketch."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count("*").alias("true_n"))
    return countmin_readout(counts)


def countmin_readout(
    counts: DataFrame, width: int = CM_WIDTH, topk: int = CM_TOPK
) -> DataFrame:
    """Operator core of :func:`sketch_countmin_freq` over any
    (token, true_n) count frame — also driven at 50M-token rehearsal
    scale by ``stress.py cm``. The count frame is persisted once: the
    sketch build and the top-k probe are independent subtrees, and
    without the pin each re-runs the caller's tokenize + vocabulary
    aggregation (guide §2.4; vocab-scale, two narrow columns)."""
    from csdid_pyspark_spark.cache import attach_cache

    spark = counts.sparkSession
    counts = counts.persist()
    seeds = F.broadcast(
        spark.createDataFrame(
            [(j, s) for j, s in enumerate(CM_DEPTH_SEEDS)], "j int, seed bigint"
        )
    )
    bucket = F.expr(f"({_spark_polyhash('token', 'seed')}) % {width}")
    cm = (
        counts.crossJoin(seeds)
        .select("j", bucket.alias("bucket"), "true_n")
        .groupBy("j", "bucket")
        .agg(F.sum("true_n").alias("cm_n"))
    )
    top = (
        counts.orderBy(F.col("true_n").desc(), "token").limit(topk)
    )
    probe = top.crossJoin(seeds).select(
        "token", "true_n", "j", bucket.alias("bucket")
    )
    out = (
        # the sketch is depth×width rows by construction — always broadcast
        probe.join(F.broadcast(cm), ["j", "bucket"])
        .groupBy("token", "true_n")
        .agg(F.min("cm_n").alias("est_n"))
        .select(
            "token",
            F.col("true_n").cast("bigint").alias("true_n"),
            F.col("est_n").cast("bigint").alias("est_n"),
            (F.col("est_n") - F.col("true_n")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.col("true_n").desc(), "token")
    )
    return attach_cache(out, counts)


SKETCH_CM_SQL = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents
),
counts AS (
  SELECT token, COUNT(*) AS true_n FROM toks WHERE token <> '' GROUP BY token
),
seeds(j, seed) AS (VALUES (0, 17), (1, 89), (2, 331), (3, 7919)),
hashed AS (
  SELECT c.token, c.true_n, s.j,
         list_reduce(list_prepend(CAST(s.seed AS BIGINT),
             list_transform(range(1, length(c.token) + 1),
                            i -> CAST(ascii(substring(c.token, i, 1)) AS BIGINT))),
             (acc, x) -> (acc * 131 + x) % 1000000007) % 16 AS bucket
  FROM counts c CROSS JOIN seeds s
),
cm AS (SELECT j, bucket, SUM(true_n) AS cm_n FROM hashed GROUP BY j, bucket),
top AS (SELECT token, true_n FROM counts ORDER BY true_n DESC, token LIMIT 20),
probe AS (
  SELECT h.token, h.true_n, h.j, h.bucket
  FROM hashed h SEMI JOIN top t ON h.token = t.token
)
SELECT p.token, CAST(p.true_n AS BIGINT) AS true_n,
       CAST(MIN(cm.cm_n) AS BIGINT) AS est_n,
       CAST(MIN(cm.cm_n) - p.true_n AS BIGINT) AS overcount
FROM probe p JOIN cm ON cm.j = p.j AND cm.bucket = p.bucket
GROUP BY p.token, p.true_n
ORDER BY true_n DESC, token
"""


# ---------------------------------------------------------------------------
# Partition-layout skew advisor
# ---------------------------------------------------------------------------


def layout_skew_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What-if table for candidate partition layouts of the events
    stream: for each candidate key, the rows-per-partition-value
    distribution (partition count, avg, exact p90, max, max/avg skew
    ratio). This is the pre-flight a 100 TB ingest runs before
    committing to a directory layout — a skew ratio ≫ 1 predicts
    straggler partitions and hot-spot writes. Four cheap groupBys over
    one scan; the per-candidate distributions aggregate tiny
    (n_partition-value) tables."""
    e = load_table(spark, sf_dir, "events")

    def dist(keyed: DataFrame, name: str) -> DataFrame:
        rows = keyed.groupBy("k").agg(F.count("*").alias("rows"))
        return rows.agg(
            F.lit(name).alias("layout"),
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(F.avg("rows"), 3).alias("avg_rows"),
            F.round(F.expr("percentile(rows, 0.9)"), 3).alias("p90_rows"),
            F.max("rows").cast("bigint").alias("max_rows"),
            F.round(F.max("rows") / F.avg("rows"), 3).alias("skew_ratio"),
        )

    by_day = e.select(F.date_trunc("day", "ts").alias("k"))
    by_hour = e.select(F.date_trunc("hour", "ts").alias("k"))
    by_user = e.select((F.col("user_id") % 256).alias("k"))
    by_type = e.select(F.col("event_type").alias("k"))
    return (
        dist(by_day, "by_day")
        .unionByName(dist(by_hour, "by_hour"))
        .unionByName(dist(by_user, "by_user_bucket256"))
        .unionByName(dist(by_type, "by_event_type"))
        .orderBy("layout")
    )


LAYOUT_SKEW_SQL = """
WITH cand AS (
  SELECT 'by_day' AS layout, CAST(date_trunc('day', ts) AS VARCHAR) AS k FROM events
  UNION ALL
  SELECT 'by_hour', CAST(date_trunc('hour', ts) AS VARCHAR) FROM events
  UNION ALL
  SELECT 'by_user_bucket256', CAST(user_id % 256 AS VARCHAR) FROM events
  UNION ALL
  SELECT 'by_event_type', event_type FROM events
),
per AS (SELECT layout, k, COUNT(*) AS rows_n FROM cand GROUP BY layout, k)
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(AVG(rows_n), 3) AS avg_rows,
       ROUND(quantile_cont(rows_n, 0.9), 3) AS p90_rows,
       CAST(MAX(rows_n) AS BIGINT) AS max_rows,
       ROUND(MAX(rows_n) / AVG(rows_n), 3) AS skew_ratio
FROM per GROUP BY layout ORDER BY layout
"""


# ---------------------------------------------------------------------------
# l-diversity governance histogram
# ---------------------------------------------------------------------------

LDIV_BAND = 2000


def pii_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity histogram over quasi-identifier groups of the
    customer table: QI = (nation, market segment), sensitive attribute
    = account-balance band (width 2000). For each group l = distinct
    sensitive values; the report is the histogram of l with group-size
    extremes — the governance readout that catches homogeneous groups
    (l=1: every member's sensitive value is exposed) which
    k-anonymity's size-only check misses. Two bounded groupBys."""
    c = load_table(spark, sf_dir, "customer")
    grp = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / LDIV_BAND).alias("band"),
        )
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.countDistinct("band").alias("l"), F.count("*").alias("n"))
    )
    return (
        grp.groupBy("l")
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.min("n").cast("bigint").alias("min_rows"),
            F.max("n").cast("bigint").alias("max_rows"),
        )
        .select(F.col("l").cast("bigint").alias("l"), "n_groups", "min_rows", "max_rows")
        .orderBy("l")
    )


PII_LDIV_SQL = """
WITH grp AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(DISTINCT FLOOR(c_acctbal / %d)) AS l, COUNT(*) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST(l AS BIGINT) AS l, CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(n) AS BIGINT) AS min_rows, CAST(MAX(n) AS BIGINT) AS max_rows
FROM grp GROUP BY l ORDER BY l
""" % LDIV_BAND


QUERIES = {
    "er_fuzzy_parts": er_fuzzy_parts,
    "text_span_cut": text_span_cut,
    "text_span_cut_minlen": text_span_cut_minlen,
    "dp_noisy_counts": dp_noisy_counts,
    "sketch_countmin_freq": sketch_countmin_freq,
    "layout_skew_advisor": layout_skew_advisor,
    "pii_l_diversity": pii_l_diversity,
}

ORACLES = {
    "er_fuzzy_parts": ER_FUZZY_SQL,
    "text_span_cut": TEXT_SPAN_CUT_SQL,
    "text_span_cut_minlen": TEXT_SPAN_CUT_MINLEN_SQL,
    "dp_noisy_counts": DP_NOISY_SQL,
    "sketch_countmin_freq": SKETCH_CM_SQL,
    "layout_skew_advisor": LAYOUT_SKEW_SQL,
    "pii_l_diversity": PII_LDIV_SQL,
}


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (batch MERGE of partial rollups)
# ---------------------------------------------------------------------------


def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a (day, event_type) rollup: the last
    observed day plays the DELTA batch, everything earlier is the
    standing STATE rollup, and the output MERGES the delta's partial
    aggregates into the state (counts and decimal sums are mergeable;
    means derive from them). The oracle recomputes the rollup from all
    raw events, pinning incremental == full recompute — the algebraic
    property that lets a 100 TB nightly pipeline touch only the new
    day's partitions (cf. streaming/events.py::incremental_refresh,
    the foreachBatch version of the same contract). Both partial
    rollups are day-bounded aggregates; the merge re-aggregates the
    TINY aggregated tables, never base rows twice."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    mx = e.agg(F.max(day).alias("mx"))
    base = e.select(
        day.alias("day"), "event_type", F.col("value").cast("decimal(30,6)").alias("v")
    ).crossJoin(F.broadcast(mx))
    part = (
        lambda df: df.groupBy("day", "event_type").agg(
            F.count("*").alias("n"), F.sum("v").alias("vs")
        )
    )
    state = part(base.filter(F.col("day") < F.col("mx")))
    delta = part(base.filter(F.col("day") == F.col("mx")))
    return (
        state.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("vs").alias("vs"))
        .select(
            F.col("day").cast("date").alias("day"),
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("vs").cast("double").alias("value_sum"),
        )
        .orderBy("day", "event_type")
    )


INCREMENTAL_ROLLUP_SQL = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
FROM events GROUP BY 1, 2 ORDER BY day, event_type
"""


# ---------------------------------------------------------------------------
# Temporal holdout evaluation of the seasonal profile
# ---------------------------------------------------------------------------


def events_seasonal_holdout_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the hour-of-day seasonal profile: train an hourly
    mean-value profile on all days EXCEPT the final 7, score the
    held-out week's (day, hour) actuals against it, report MAPE — the
    temporal train/test split every forecasting pipeline needs (a
    random split would leak future into past). Train and test are each
    ONE bounded aggregate (≤24 and ≤7×24 rows); the profile joins
    broadcast. Means derive from decimal sums so both engines bucket
    identically."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    mx = e.agg(F.max(day).alias("mx"))
    base = e.select(
        day.alias("day"),
        F.hour("ts").alias("hr"),
        F.col("value").cast("decimal(30,6)").alias("v"),
    ).crossJoin(F.broadcast(mx))
    cutoff = F.col("mx") - F.expr("INTERVAL 6 DAYS")
    train = (
        base.filter(F.col("day") < cutoff)
        .groupBy("hr")
        .agg((F.sum("v") / F.count("*")).cast("double").alias("pred"))
    )
    test = (
        base.filter(F.col("day") >= cutoff)
        .groupBy("day", "hr")
        .agg((F.sum("v") / F.count("*")).cast("double").alias("actual"))
    )
    return (
        test.join(F.broadcast(train), "hr")
        .filter(F.col("actual") != 0)
        .agg(
            F.count("*").cast("bigint").alias("n_test_points"),
            F.round(
                F.avg(F.abs(F.col("actual") - F.col("pred")) / F.abs("actual")), 6
            ).alias("mape"),
        )
    )


SEASONAL_HOLDOUT_SQL = """
WITH mx AS (SELECT MAX(date_trunc('day', ts)) AS mx FROM events),
base AS (
  SELECT date_trunc('day', ts) AS day, EXTRACT(hour FROM ts) AS hr,
         CAST(value AS DECIMAL(30,6)) AS v
  FROM events
),
train AS (
  SELECT hr, CAST(SUM(v) / COUNT(*) AS DOUBLE) AS pred
  FROM base, mx WHERE day < mx - INTERVAL 6 DAY GROUP BY hr
),
test AS (
  SELECT day, hr, CAST(SUM(v) / COUNT(*) AS DOUBLE) AS actual
  FROM base, mx WHERE day >= mx - INTERVAL 6 DAY GROUP BY day, hr
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_test_points,
       ROUND(AVG(ABS(actual - pred) / ABS(actual)), 6) AS mape
FROM test JOIN train USING (hr)
WHERE actual <> 0
"""

QUERIES["incremental_rollup_merge"] = incremental_rollup_merge
QUERIES["events_seasonal_holdout_mape"] = events_seasonal_holdout_mape
ORACLES["incremental_rollup_merge"] = INCREMENTAL_ROLLUP_SQL
ORACLES["events_seasonal_holdout_mape"] = SEASONAL_HOLDOUT_SQL


# ---------------------------------------------------------------------------
# Mergeable fixed-width histogram quantile sketch vs exact percentiles
# ---------------------------------------------------------------------------

QSK_BINS = 256


def sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a FIXED-SIZE mergeable sketch: one
    256-bin equi-width histogram of event values (the classic
    distributed-quantile building block — per-partition histograms
    merge by adding counts, and the sketch is 256 rows at ANY stream
    length, unlike exact percentile's full sort). p50/p90/p99 are read
    back by linear interpolation inside the covering bin and reported
    NEXT TO the exact percentiles so the sketch's error is visible and
    oracle-checked. Range bounds come from one exact min/max pass
    (broadcast 1-row); binning arithmetic is identical in both
    engines."""
    e = load_table(spark, sf_dir, "events")
    rng = e.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count("*").alias("n"),
    )
    b = QSK_BINS
    binned = (
        e.crossJoin(F.broadcast(rng))
        .select(
            F.least(
                F.lit(b - 1),
                F.floor((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")) * b),
            ).cast("int").alias("bin"),
            "lo",
            "hi",
            "n",
        )
        .groupBy("bin", "lo", "hi", "n")
        .agg(F.count("*").alias("c"))
    )
    wcum = Window.partitionBy(F.lit(0)).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = binned.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "cum_prev", F.col("cum") - F.col("c")
    )
    qs = F.broadcast(
        spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    )
    width = (F.col("hi") - F.col("lo")) / b
    target = F.col("q") * F.col("n")
    est = F.col("lo") + (
        F.col("bin") + (target - F.col("cum_prev")) / F.col("c")
    ) * width
    est_tbl = (
        cum.crossJoin(qs)
        .filter((F.col("cum") >= target) & (F.col("cum_prev") < target))
        .groupBy("q")
        .agg(F.round(F.min(est), 6).alias("est"))
    )
    exact = (
        e.agg(
            F.expr("percentile(value, 0.5)").alias("e50"),
            F.expr("percentile(value, 0.9)").alias("e90"),
            F.expr("percentile(value, 0.99)").alias("e99"),
        )
        .select(
            F.expr(
                "stack(3, 0.5D, e50, 0.9D, e90, 0.99D, e99) AS (q2, exact_raw)"
            )
        )
        .select("q2", F.round("exact_raw", 6).alias("exact"))
    )
    return (
        est_tbl.join(exact, est_tbl["q"] == exact["q2"])
        .select(
            "q",
            "exact",
            "est",
            F.round(F.abs(F.col("est") - F.col("exact")), 6).alias("abs_err"),
        )
        .orderBy("q")
    )


SKETCH_QHIST_SQL = """
WITH rng AS (SELECT MIN(value) AS lo, MAX(value) AS hi, COUNT(*) AS n FROM events),
binned AS (
  SELECT LEAST(255, CAST(FLOOR((value - lo) / (hi - lo) * 256) AS INT)) AS bin,
         lo, hi, n, COUNT(*) AS c
  FROM events, rng GROUP BY 1, 2, 3, 4
),
cum AS (
  SELECT bin, lo, hi, n, c,
         SUM(c) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM binned
),
qs(q) AS (VALUES (0.5), (0.9), (0.99)),
est AS (
  SELECT q, ROUND(MIN(lo + (bin + (q * n - (cum - c)) / c) * (hi - lo) / 256), 6) AS est
  FROM cum, qs
  WHERE cum >= q * n AND (cum - c) < q * n
  GROUP BY q
),
ex AS (
  SELECT CAST(0.5 AS DOUBLE) AS q, ROUND(quantile_cont(value, 0.5), 6) AS exact FROM events
  UNION ALL SELECT CAST(0.9 AS DOUBLE), ROUND(quantile_cont(value, 0.9), 6) FROM events
  UNION ALL SELECT CAST(0.99 AS DOUBLE), ROUND(quantile_cont(value, 0.99), 6) FROM events
)
SELECT ex.q AS q, ex.exact AS exact, est.est AS est,
       ROUND(ABS(est.est - ex.exact), 6) AS abs_err
FROM est JOIN ex USING (q) ORDER BY q
"""


# ---------------------------------------------------------------------------
# Embedding truncation (Matryoshka-style) distortion report
# ---------------------------------------------------------------------------

TRUNC_DIMS = 16
TRUNC_IDS = 200


def embedding_truncation_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much does truncating 64-dim embeddings to the first 16
    dimensions distort pairwise cosine similarity? (The
    Matryoshka-embedding question every vector-store operator asks
    before cutting storage 4×.) Consecutive-id pairs over the first
    200 vectors give a deterministic probe set; the report is the
    distortion distribution (mean/max absolute cosine delta, and the
    fraction of pairs whose similarity moved > 0.1). Per-pair fold is
    an O(dim) array aggregate — no shuffle beyond the id-pair join."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < TRUNC_IDS)
    from csdid_pyspark_spark.functions.vectors import as_double_array, cosine

    v = as_double_array("embedding")
    base = e.select("vec_id", v.alias("v"), F.slice(v, 1, TRUNC_DIMS).alias("vt"))
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(b, F.col("a.vec_id") + 1 == F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("id_a"),
        cosine(F.col("a.v"), F.col("b.v")).alias("cos_full"),
        cosine(F.col("a.vt"), F.col("b.vt")).alias("cos_trunc"),
    )
    d = F.abs(F.col("cos_full") - F.col("cos_trunc"))
    return pairs.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.avg(d), 6).alias("mean_abs_delta"),
        F.round(F.max(d), 6).alias("max_abs_delta"),
        F.round(F.avg(F.when(d > 0.1, 1.0).otherwise(0.0)), 6).alias("frac_moved_gt_01"),
    )


EMB_TRUNC_SQL = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_slice(embedding::DOUBLE[], 1, 16) AS vt
  FROM embeddings WHERE vec_id < 200
),
pairs AS (
  SELECT a.vec_id AS id_a,
         list_cosine_similarity(a.v, b.v) AS cos_full,
         list_cosine_similarity(a.vt, b.vt) AS cos_trunc
  FROM base a JOIN base b ON a.vec_id + 1 = b.vec_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(ABS(cos_full - cos_trunc)), 6) AS mean_abs_delta,
       ROUND(MAX(ABS(cos_full - cos_trunc)), 6) AS max_abs_delta,
       ROUND(AVG(CASE WHEN ABS(cos_full - cos_trunc) > 0.1 THEN 1.0 ELSE 0.0 END), 6)
         AS frac_moved_gt_01
FROM pairs
"""

QUERIES["sketch_quantile_histogram"] = sketch_quantile_histogram
QUERIES["embedding_truncation_distortion"] = embedding_truncation_distortion
ORACLES["sketch_quantile_histogram"] = SKETCH_QHIST_SQL
ORACLES["embedding_truncation_distortion"] = EMB_TRUNC_SQL


# ---------------------------------------------------------------------------
# Full-outer join (completes the §2.3 join family)
# ---------------------------------------------------------------------------


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two hourly activity profiles: hours with
    above-average click counts vs hours with above-average purchase
    counts. Each side's mean threshold guarantees both exclusive and
    shared hours at any scale factor (counts and their mean scale
    together), so the outer join's NULL-extension is exercised on BOTH
    sides — the reconciliation shape (ours-vs-theirs ledgers) that
    inner/left/semi/anti queries can't cover. Hour tables are tiny
    aggregates; the join broadcasts."""
    e = load_table(spark, sf_dir, "events")

    def side(evt: str, out: str) -> DataFrame:
        hourly = (
            e.filter(F.col("event_type") == evt)
            .groupBy(F.date_trunc("hour", "ts").alias("hr"))
            .agg(F.count("*").alias(out))
        )
        mean = hourly.agg(F.avg(out).alias("m"))
        return (
            hourly.crossJoin(F.broadcast(mean))
            .filter(F.col(out) > F.col("m"))
            .select("hr", out)
        )

    clicks = side("click", "clicks")
    buys = side("purchase", "purchases")
    return (
        clicks.join(buys, "hr", "full_outer")
        .select(
            # STRING hour key: a TIMESTAMP column would be re-rendered
            # into the Python process's local zone at collect() time,
            # diverging from the oracle's naive wall clock whenever the
            # driver host isn't UTC (caught by a TZ=Asia/Kolkata
            # adversarial replica run)
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hr"),
            F.col("clicks").cast("bigint").alias("clicks"),
            F.col("purchases").cast("bigint").alias("purchases"),
        )
        .orderBy("hr")
    )


JOIN_FULL_OUTER_SQL = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
),
cf AS (SELECT hr, clicks FROM c WHERE clicks > (SELECT AVG(clicks) FROM c)),
p AS (
  SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
pf AS (SELECT hr, purchases FROM p WHERE purchases > (SELECT AVG(purchases) FROM p))
SELECT STRFTIME(COALESCE(cf.hr, pf.hr), '%Y-%m-%d %H:%M:%S') AS hr,
       CAST(cf.clicks AS BIGINT) AS clicks,
       CAST(pf.purchases AS BIGINT) AS purchases
FROM cf FULL OUTER JOIN pf ON cf.hr = pf.hr
ORDER BY hr
"""

QUERIES["join_full_outer"] = join_full_outer
ORACLES["join_full_outer"] = JOIN_FULL_OUTER_SQL


# ---------------------------------------------------------------------------
# Near-dup cluster size histogram (dedup reporting layer)
# ---------------------------------------------------------------------------


def dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size distribution of near-duplicate clusters: for each cluster
    size, how many clusters, how many docs they hold, and how many
    docs dedup would DROP (size − 1 per cluster, keeping the canonical
    survivor) — the report a curation run publishes before committing
    a keep-list. Rides the same label-propagation components as
    ``dedup_components`` (checkpoint-per-round, edge-count-right-sized
    partitions); the histogram is a two-level bounded aggregate over
    the (node, comp) table."""
    from csdid_pyspark_spark.cache import release_cache
    from csdid_pyspark_spark.operators import dedup
    from csdid_pyspark_spark.queries.llm_ops import _neardup_pairs

    d = load_table(spark, sf_dir, "documents")
    # components() eagerly checkpoints its labels, so the postings
    # persist jaccard_pairs attached to the pair frame is fully
    # consumed by the time it returns — release it HERE: discarding
    # the pairs frame would orphan the persist for the life of a
    # shared multi-query session.
    pairs = _neardup_pairs(d)
    comp = dedup.components(pairs)
    release_cache(pairs)
    sizes = comp.groupBy("comp").agg(F.count("*").alias("sz"))
    return (
        sizes.groupBy("sz")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            F.col("sz").cast("bigint").alias("cluster_size"),
            F.col("n_clusters").cast("bigint").alias("n_clusters"),
            (F.col("sz") * F.col("n_clusters")).cast("bigint").alias("docs"),
            ((F.col("sz") - 1) * F.col("n_clusters")).cast("bigint").alias("docs_dropped"),
        )
        .orderBy("cluster_size")
    )


from csdid_pyspark_spark.queries.llm_ops import _NEARDUP_PAIRS_CTES  # noqa: E402

DEDUP_CLUSTER_HIST_SQL = (
    r"""
WITH RECURSIVE """
    + _NEARDUP_PAIRS_CTES
    + r""",
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT s AS node, s AS r FROM edges
  UNION
  SELECT r.node, e.d FROM reach r JOIN edges e ON e.s = r.r
),
comp AS (SELECT node, MIN(r) AS comp_id FROM reach GROUP BY node),
csizes AS (SELECT comp_id, COUNT(*) AS sz FROM comp GROUP BY comp_id)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(sz * COUNT(*) AS BIGINT) AS docs,
       CAST((sz - 1) * COUNT(*) AS BIGINT) AS docs_dropped
FROM csizes GROUP BY sz ORDER BY cluster_size
"""
)

QUERIES["dedup_cluster_histogram"] = dedup_cluster_histogram
ORACLES["dedup_cluster_histogram"] = DEDUP_CLUSTER_HIST_SQL


# ---------------------------------------------------------------------------
# A/B sample-ratio-mismatch (SRM) gate
# ---------------------------------------------------------------------------


def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch gate for A/B bucketing — the FIRST check
    an experimentation platform runs before reading any metric (a
    biased split invalidates everything downstream, cf. the CUPED
    readout's sibling). Two splits of the distinct-user population are
    tested against the expected 50/50: a healthy multiplicative-hash
    split (should pass) and a deliberately biased mod-3 split (should
    flag), so both gate outcomes are exercised and oracle-checked.
    χ² = Σ(obs−exp)²/exp with 1 df; flag at the 3.841 critical value.
    One distinct-user aggregate; the χ² math runs on 2-row tables."""
    e = load_table(spark, sf_dir, "events")
    return srm_frame(e.select("user_id").distinct())


def srm_frame(users: DataFrame) -> DataFrame:
    """Operator core of :func:`events_ab_srm_check` over any distinct
    (user_id) frame — also driven at rehearsal scale by
    ``stress.py srm``."""
    # Mask to 31 bits BEFORE the Knuth multiply: (2^31-1)·2654435761
    # ≈ 5.7e18 stays inside int64, so Spark (silent wrap under
    # non-ANSI) and DuckDB (which would raise/diverge on overflow)
    # compute the identical value for ANY id — the unmasked product
    # overflowed past user_id ≈ 3.4e9, i.e. exactly at the id scale
    # the 100 TB framing implies. The arm comes from BIT 31 of the
    # product, not bit 0: an odd multiplier mod 2^32 preserves the
    # input's low bit exactly, so "% 2" would degenerate to user_id
    # parity (a platform issuing even-only ids would land 100/0 and
    # falsely flag the healthy arm); the high bit actually mixes.
    masked = F.pmod(F.col("user_id"), F.lit(2147483648))
    splits = users.select(
        "user_id",
        (
            F.pmod(masked * 2654435761, F.lit(4294967296)) / F.lit(2147483648)
        ).cast("bigint").alias("hash_uniform"),
        F.when(F.col("user_id") % 3 == 0, 0).otherwise(1).alias("mod3_biased"),
    )

    def chi2(split_col: str) -> DataFrame:
        counts = splits.groupBy(F.col(split_col).alias("arm")).agg(
            F.count("*").alias("n")
        )
        tot = counts.agg(F.sum("n").alias("tot"))
        return (
            counts.crossJoin(F.broadcast(tot))
            .select(
                F.lit(split_col).alias("split"),
                "arm",
                "n",
                (F.col("tot") / 2.0).alias("exp"),
            )
            .groupBy("split")
            .agg(
                F.sum(F.when(F.col("arm") == 0, F.col("n"))).cast("bigint").alias("n_a"),
                F.sum(F.when(F.col("arm") == 1, F.col("n"))).cast("bigint").alias("n_b"),
                F.round(
                    F.sum((F.col("n") - F.col("exp")) * (F.col("n") - F.col("exp")) / F.col("exp")),
                    6,
                ).alias("chi2"),
            )
        )

    out = chi2("hash_uniform").unionByName(chi2("mod3_biased"))
    return out.select(
        "split", "n_a", "n_b", "chi2", (F.col("chi2") > 3.841).alias("srm_detected")
    ).orderBy("split")


EVENTS_SRM_SQL = """
WITH users AS (SELECT DISTINCT user_id FROM events),
splits AS (
  SELECT user_id,
         CAST(((user_id % 2147483648) * 2654435761) % 4294967296 // 2147483648
              AS BIGINT) AS hash_uniform,
         CASE WHEN user_id % 3 = 0 THEN 0 ELSE 1 END AS mod3_biased
  FROM users
),
counted AS (
  SELECT 'hash_uniform' AS split, hash_uniform AS arm, COUNT(*) AS n
  FROM splits GROUP BY 2
  UNION ALL
  SELECT 'mod3_biased', mod3_biased, COUNT(*) FROM splits GROUP BY 2
),
tot AS (SELECT split, SUM(n) AS tot FROM counted GROUP BY split)
SELECT c.split AS split,
       CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
       CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
       ROUND(SUM((n - t.tot / 2.0) * (n - t.tot / 2.0) / (t.tot / 2.0)), 6) AS chi2,
       ROUND(SUM((n - t.tot / 2.0) * (n - t.tot / 2.0) / (t.tot / 2.0)), 6) > 3.841
         AS srm_detected
FROM counted c JOIN tot t USING (split)
GROUP BY c.split ORDER BY split
"""

QUERIES["events_ab_srm_check"] = events_ab_srm_check
ORACLES["events_ab_srm_check"] = EVENTS_SRM_SQL


# ---------------------------------------------------------------------------
# Robust outlier gate (median / MAD)
# ---------------------------------------------------------------------------


def events_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type outlier screen: median and MAD (median
    absolute deviation) of ``value``, and how many events fall outside
    median ± 3·(MAD/0.6745) — the robust z-score gate that, unlike a
    mean/stddev rule, is not dragged by the very outliers it screens.
    Two grouped EXACT percentile passes (groups = event types, a
    handful) + one counting pass; at petabyte scale swap the exact
    median for the mergeable quantile sketch
    (``sketch_quantile_histogram``) — this query pins the exact
    semantics the sketch approximates. Exact interpolated percentile
    matches DuckDB's ``median`` bit-for-bit after rounding."""
    from csdid_pyspark_spark.cache import attach_cache

    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    # the deviation table feeds BOTH the MAD percentile and the outlier
    # count — uncached, each consumer re-scans events and re-runs the
    # median subtree; one persist gives the documented
    # two-grouped-passes-plus-one-count shape
    dev = (
        e.join(F.broadcast(med), "event_type")
        .withColumn("adev", F.abs(F.col("value") - F.col("med")))
        .persist()
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad"), F.first("med").alias("med")
    )
    thresh = 3.0 / 0.6745
    out = (
        dev.select("event_type", "adev")
        .join(F.broadcast(mad.select("event_type", "mad")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("adev") > thresh * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )
    result = (
        out.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "n",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n"), 6).alias("outlier_rate"),
        )
        .orderBy("event_type")
    )
    return attach_cache(result, dev)


EVENTS_MAD_SQL = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, ABS(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, median(adev) AS mad, ANY_VALUE(med) AS med
  FROM dev GROUP BY event_type
)
SELECT d.event_type AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(ANY_VALUE(m.med), 6) AS med,
       ROUND(ANY_VALUE(m.mad), 6) AS mad,
       CAST(SUM(CASE WHEN d.adev > (3.0 / 0.6745) * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       ROUND(SUM(CASE WHEN d.adev > (3.0 / 0.6745) * m.mad THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type ORDER BY event_type
"""

QUERIES["events_outliers_mad"] = events_outliers_mad
ORACLES["events_outliers_mad"] = EVENTS_MAD_SQL


# ---------------------------------------------------------------------------
# Rolling robust smoother (windowed exact median)
# ---------------------------------------------------------------------------


def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling median of ``value`` over each user's last 10
    events (event-time order, event_id tiebreak) — the robust smoother
    an anomaly console plots instead of a mean that spikes with every
    outlier. Window partitions by USER, so parallelism scales with
    users and no single reducer ever sees the whole stream (a
    per-type global ordering would); frame is 10 rows, so the exact
    interpolated percentile is O(1) per row."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias(
                "rolling_median"
            ),
        )
        .orderBy("user_id", "event_id")
    )


EVENTS_ROLLMED_SQL = """
SELECT user_id, event_id,
       ROUND(median(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS rolling_median
FROM events
ORDER BY user_id, event_id
"""

QUERIES["events_rolling_median"] = events_rolling_median
ORACLES["events_rolling_median"] = EVENTS_ROLLMED_SQL


# ---------------------------------------------------------------------------
# Incremental view maintenance for JOINS (delta-join algebra)
# ---------------------------------------------------------------------------


def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view under deltas on BOTH
    inputs: the monthly revenue rollup V = γ(orders ⋈ lineitem) is
    maintained as γ(base_o ⋈ base_l) ⊎ γ(Δo ⋈ base_l) ⊎
    γ(base_o ⋈ Δl) ⊎ γ(Δo ⋈ Δl) — the standard delta-join algebra
    (ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) that lets a materialized join view
    absorb a day's changes without re-joining the full tables
    (``incremental_rollup_merge`` covers the append-only aggregate
    case; this covers joins). Deltas are synthetic slices (orderkey
    mod classes) so the decomposition is deterministic; the final
    merge re-aggregates four partial rollups whose size is bounded by
    (months × 4), and the oracle recomputes the view from scratch —
    equality IS the correctness statement of the algebra. Revenue
    accumulates as exact DECIMAL end-to-end, so the four-way partial
    split cannot move a cent."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_trunc("month", "o_orderdate").alias("mon")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(30,6)")
        .alias("rev"),
    )
    base_o = o.filter(F.col("o_orderkey") % 17 != 0)
    delta_o = o.filter(F.col("o_orderkey") % 17 == 0)
    base_l = l.filter(F.col("l_orderkey") % 13 != 0)
    delta_l = l.filter(F.col("l_orderkey") % 13 == 0)

    def part(os_, ls_):
        return (
            os_.join(ls_, os_["o_orderkey"] == ls_["l_orderkey"])
            .groupBy("mon")
            .agg(F.sum("rev").alias("rev"))
        )

    merged = (
        part(base_o, base_l)
        .unionByName(part(delta_o, base_l))
        .unionByName(part(base_o, delta_l))
        .unionByName(part(delta_o, delta_l))
        .groupBy("mon")
        .agg(F.sum("rev").alias("rev"))
    )
    return merged.select(
        F.col("mon").cast("date").alias("mon"),
        F.col("rev").cast("double").alias("revenue"),
    ).orderBy("mon")


IVM_JOIN_SQL = """
SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS mon,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)))
            AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1 ORDER BY mon
"""

QUERIES["ivm_join_delta"] = ivm_join_delta
ORACLES["ivm_join_delta"] = IVM_JOIN_SQL


# ---------------------------------------------------------------------------
# Overlapping token-window chunking (embedding / RAG preprocessing)
# ---------------------------------------------------------------------------

CHUNK_W = 64   # tokens per chunk
CHUNK_STRIDE = 48  # tokens between chunk starts (W - STRIDE = overlap)


def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping fixed-token chunks (64
    tokens, stride 48) — the preprocessing pass an embedding/RAG
    pipeline runs before batch-encoding. Emits one row per chunk with
    its position, exact token count (the tail chunk is short), and a
    content hash (the dedup/caching key for the encoder stage). One
    explode over per-doc chunk starts — size(tokens)/stride rows per
    doc, no shuffle at all until a consumer aggregates; the chunk
    start sequence is computed per row, so the operator is a pure map
    at any corpus size. Docs shorter than one stride still produce
    their single (possibly short) chunk."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    # split(trim(''), '\s+') yields [''] (size 1), so an empty or
    # whitespace-only doc would emit one phantom 1-token chunk with
    # md5('') — screen on trimmed LENGTH, not token-array size
    base = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", toks.alias("tokens"))
    )
    starts = F.expr(
        f"sequence(0, greatest(size(tokens) - 1, 0), {CHUNK_STRIDE})"
    )
    chunk = base.select(
        "doc_id",
        "tokens",
        F.size("tokens").alias("n_tok"),
        F.posexplode(starts).alias("chunk_id", "start_tok"),
    )
    return (
        chunk.select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("start_tok").cast("int").alias("start_tok"),
            F.least(
                F.lit(CHUNK_W), F.col("n_tok") - F.col("start_tok")
            ).cast("int").alias("chunk_tok"),
            F.md5(
                F.concat_ws(
                    " ", F.slice(F.col("tokens"), F.col("start_tok") + 1, CHUNK_W)
                )
            ).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_id")
    )


TEXT_CHUNK_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens FROM documents
),
base AS (
  SELECT doc_id, tokens, len(tokens) AS n_tok FROM toks
  WHERE len(array_to_string(tokens, ' ')) > 0
),
chunks AS (
  SELECT doc_id, n_tok, tokens,
         UNNEST(range(0, GREATEST(n_tok - 1, 0) + 1, %(s)d)) AS start_tok
  FROM base
)
SELECT doc_id, CAST(start_tok // %(s)d AS INT) AS chunk_id,
       CAST(start_tok AS INT) AS start_tok,
       CAST(LEAST(%(w)d, n_tok - start_tok) AS INT) AS chunk_tok,
       md5(array_to_string(list_slice(tokens, start_tok + 1, start_tok + %(w)d), ' '))
         AS chunk_hash
FROM chunks
ORDER BY doc_id, chunk_id
""" % {"w": CHUNK_W, "s": CHUNK_STRIDE}

QUERIES["text_chunk_windows"] = text_chunk_windows
ORACLES["text_chunk_windows"] = TEXT_CHUNK_SQL


# ---------------------------------------------------------------------------
# ε-DP median (exponential mechanism, seeded Gumbel-max)
# ---------------------------------------------------------------------------


# pre-masked in exact Python arithmetic so any SPARK_GRAFT_DP_SEED
# (however large) yields an in-int64-range literal in BOTH engines
_DP_MEDIAN_SEED_MIX = (DP_SEED * 40503 + 12345) % 2147483648


def dp_noisy_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-mechanism (McSherry–Talwar) median of events.value
    at ε=1: candidate utility u(v) = -dist(rank interval of v, n/2)
    (rank-distance sensitivity 1), selected via the Gumbel-max trick —
    score = ε·u/2 + Gumbel(U_v) with U_v a seeded integer-hash uniform
    of the candidate's RANK (never a stringified float, which formats
    differently across engines). Rank intervals come from
    operators/packing.py::global_rank_cumsum over the value-aggregated
    table (two-phase scan, no single-reducer window); the distance is
    kept in exact doubled-rank integer units. Same privacy caveat as
    dp_noisy_counts: under the default public ``DP_SEED`` this is a
    deterministic, oracle-checkable MECHANISM DEMO — a private release
    must set SPARK_GRAFT_DP_SEED before import, and the oracle tracks
    any seed choice because both engines derive from the one constant."""
    from csdid_pyspark_spark.cache import release_cache
    from csdid_pyspark_spark.operators.packing import global_rank_cumsum

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    byval = e.groupBy("value").agg(F.count("*").alias("cnt"))
    scan = global_rank_cumsum(byval, ["value"], "cnt")
    n = int(scan.total_sum)  # total rows, exact from the light pass
    cum = F.col("cum").cast("bigint")  # inclusive count cumsum
    # doubled-units distance from n/2 to [cum-cnt, cum]; 0 if inside
    d2 = F.greatest(
        F.lit(0).cast("bigint"),
        F.lit(n) - 2 * cum,
        2 * (cum - F.col("cnt")) - F.lit(n),
    )
    # mask rn to 31 bits BEFORE the Knuth multiply (the repo-wide
    # portable-hash rule): unmasked, rn * 2654435761 exits int64 at
    # ~3.5e9 distinct values — Spark wraps silently, DuckDB errors,
    # and the oracle stops tracking the seed. The seed mix is likewise
    # pre-masked in Python so a large private seed stays in range.
    h = F.pmod(
        F.pmod(F.col("rn"), F.lit(2147483648)) * 2654435761
        + F.lit(_DP_MEDIAN_SEED_MIX),
        F.lit(2147483648),
    )
    u01 = (h.cast("double") + 0.5) / F.lit(2147483648.0)
    gumbel = -F.log(-F.log(u01))
    score = F.lit(-0.25) * d2.cast("double") + gumbel  # ε=1: ε·u/2 = -d2/4
    out = (
        scan.df.select(
            F.col("value"),
            F.col("cnt").cast("bigint").alias("cnt"),
            d2.alias("rank_dist2"),
            score.alias("_score"),
        )
        .orderBy(F.desc("_score"), "value")
        .limit(1)
        .select(
            F.round("value", 6).alias("dp_median"),
            "cnt",
            "rank_dist2",
            F.round("_score", 6).alias("score"),
        )
    )
    result = out.localCheckpoint(eager=True)
    release_cache(scan.df)
    return result


DP_MEDIAN_SQL = f"""
WITH byval AS (
  SELECT value, COUNT(*) AS cnt FROM events WHERE value IS NOT NULL GROUP BY 1
),
tot AS (SELECT SUM(cnt) AS n FROM byval),
ranked AS (
  SELECT value, cnt,
         ROW_NUMBER() OVER (ORDER BY value) AS rn,
         SUM(cnt) OVER (ORDER BY value) AS cum
  FROM byval
),
scored AS (
  SELECT value, cnt,
         GREATEST(CAST(0 AS BIGINT),
                  (SELECT n FROM tot) - 2 * cum,
                  2 * (cum - cnt) - (SELECT n FROM tot)) AS rank_dist2,
         -0.25 * CAST(GREATEST(CAST(0 AS BIGINT),
                               (SELECT n FROM tot) - 2 * cum,
                               2 * (cum - cnt) - (SELECT n FROM tot)) AS DOUBLE)
         + (-ln(-ln((CAST(((rn % 2147483648) * 2654435761 + {_DP_MEDIAN_SEED_MIX})
                          % 2147483648 AS DOUBLE) + 0.5) / 2147483648.0)))
           AS _score
  FROM ranked
)
SELECT ROUND(value, 6) AS dp_median, CAST(cnt AS BIGINT) AS cnt,
       CAST(rank_dist2 AS BIGINT) AS rank_dist2, ROUND(_score, 6) AS score
FROM scored ORDER BY _score DESC, value LIMIT 1
"""

QUERIES["dp_noisy_median"] = dp_noisy_median
ORACLES["dp_noisy_median"] = DP_MEDIAN_SQL


# ---------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record linkage (EM-fitted m/u weights)
# ---------------------------------------------------------------------------

ER_FS_MAX_BLOCK = 1000


def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage, the step after ``er_fuzzy_parts``'s
    deterministic distance gate: Fellegi-Sunter (1969) match weights
    with m/u probabilities fitted by EM (Winkler 1988) on agreement
    patterns. Candidate pairs come from (p_brand, first name-token)
    blocks — the SAME compound key ``er_fuzzy_parts`` uses so blocks
    stay bounded, with the ``max_block`` skew guard dropping any
    degenerate block outright rather than letting one key go quadratic
    (non-binding at the oracle scale). The comparison vector is
    (p_type equal, p_size equal, retail-price band equal).

    Scale split (operators/linkage.py): the DISTRIBUTED part reduces
    all candidate pairs to <= 2^3 pattern-count rows in one map-side-
    combinable aggregation — the mixture model's complete sufficient
    statistic; the EM fit is driver algebra over those 8 rows, zero
    Spark jobs, so inference costs the same at 100 TB as at 100 MB.
    Deterministic (integer counts, fixed init/iterations) → pinned
    VALUES golden. Output: one row per pattern with its pair count,
    log2 match weight, and posterior match probability."""
    from csdid_pyspark_spark.operators.linkage import (
        agreement_patterns,
        fellegi_sunter_em,
    )

    p = load_table(spark, sf_dir, "part").select(
        "*",
        F.expr("split_part(p_name, ' ', 1)").alias("tok1"),
        F.expr("CAST(p_retailprice / 25 AS INT)").alias("price_band"),
    )
    pats = agreement_patterns(
        p,
        ["p_brand", "tok1"],
        "p_partkey",
        ["p_type", "p_size", "price_band"],
        max_block=ER_FS_MAX_BLOCK,
    )
    rows = pats.collect()  # <= 8 rows: result-sized by construction
    counts = [
        ((r["a0"], r["a1"], r["a2"]), int(r["n_pairs"])) for r in rows
    ]
    fit = fellegi_sunter_em(counts)
    out = [
        (
            int(r["pattern"]),
            int(r["a0"]),
            int(r["a1"]),
            int(r["a2"]),
            int(r["n_pairs"]),
            round(fit["weight"][(r["a0"], r["a1"], r["a2"])], 6),
            round(fit["posterior"][(r["a0"], r["a1"], r["a2"])], 6),
        )
        for r in rows
    ]
    return spark.createDataFrame(
        out,
        "pattern int, agree_type int, agree_size int, agree_band int,"
        " n_pairs bigint, weight double, posterior double",
    ).orderBy("pattern")


QUERIES["er_fellegi_sunter"] = er_fellegi_sunter
