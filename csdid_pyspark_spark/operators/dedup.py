"""Deduplication operators for large text corpora.

Four tiers, all shuffle-planned for 100 TB corpora:

* exact        — hash-groupBy on a normalized fingerprint. One shuffle
                 on a short fixed-width key (md5), map-side partial agg.
* shingle/Jaccard — postings-list self-join on 3-gram shingles; the
                 classic candidate-pair pattern (shuffle keyed by
                 shingle, then by pair). Exact Jaccard, SQL-checkable.
* MinHash+LSH  — signature → band-bucket join; candidate generation is
                 linear in corpus size, verification only on bucket
                 collisions. Built-ins only (md5-based hash family).
* SimHash      — 64-bit fingerprint via per-token hashes; near-dup =
                 identical fingerprint (or banded prefix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csdid_pyspark_spark.cache import attach_cache

from csdid_pyspark_spark.functions.text import normalized_fingerprint


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized text: survivor id (min id) and
    duplicate count. Single hash shuffle on the md5 fingerprint —
    partial aggregation happens map-side, so the shuffle carries one
    row per distinct fingerprint per task, not per document."""
    return (
        df.select(F.col(id_col), normalized_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("survivor_id"), F.count("*").cast("bigint").alias("n_copies"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return the deduplicated corpus (survivor rows only)."""
    survivors = exact_dedup_groups(df, text_col, id_col).select(
        F.col("survivor_id").alias(id_col)
    )
    return df.join(survivors, id_col, "left_semi")


def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    carry_cols: list[str] | None = None,
    check_unique_ids: bool = False,
    widen: bool = True,
) -> DataFrame:
    """Distinct (id, shingle) postings: word n-gram shingles of the
    whitespace-tokenized text. 0-based Spark array subscripts; docs
    shorter than n tokens produce no shingles. ``carry_cols`` ride
    along unchanged (e.g. a blocking key).

    CONTRACT: ``df`` must have EXACTLY ONE ROW per ``id_col``. Dedup
    happens MAP-SIDE via ``array_distinct`` before the explode —
    duplicate (id, shingle) rows can only come from repeats WITHIN one
    document when that holds, so a per-doc array dedup is exact and
    the global ``.distinct()`` shuffle every downstream operator used
    to pay (one full postings exchange per dedup call) is gone. A
    duplicate-id input does NOT error: it yields duplicate postings and
    silently inflated Jaccard set sizes. Every in-repo caller feeds one
    row per id; external callers who can't guarantee it should pass
    ``check_unique_ids=True`` (one cheap aggregate that raises on the
    first duplicate — debug tool, not a production default) or
    pre-dedup with ``exact_dedup``."""
    if check_unique_ids:
        dup = (
            df.groupBy(id_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"shingle_table requires one row per {id_col!r}; id "
                f"{dup[0][0]!r} appears {dup[0][1]} times. Deduplicate ids "
                f"first (e.g. exact_dedup) — duplicate ids would silently "
                f"inflate shingle-set sizes and every similarity built on them."
            )
    from csdid_pyspark_spark.operators.fanout import widen_fanout

    carry = list(carry_cols or [])
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # the shingle explode fans out ~tokens-per-doc rows per input row
    # and pipelines into this stage: widen a physically small input to
    # core count first (no-op at real scale — fanout.py). Callers that
    # join TWO shingle tables pass widen=False on the smaller side:
    # the downstream shingle-keyed shuffle re-spreads both sides
    # anyway, so paying the repartition twice buys nothing
    # (dedup_incremental's +39% round-6 regression).
    df = df.select(F.col(id_col), *[F.col(c) for c in carry], toks.alias("tokens"))
    if widen:
        df = widen_fanout(df)
    parts = " || ' ' || ".join(f"tokens[i + {j}]" for j in range(n))
    shingles = F.expr(
        f"CASE WHEN size(tokens) >= {n} "
        f"THEN array_distinct(transform(sequence(0, size(tokens) - {n}), i -> {parts})) "
        f"ELSE array() END"
    )
    return df.select(id_col, *carry, F.explode(shingles).alias("shingle"))


def _shingle_arrays(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    widen: bool = True,
) -> DataFrame:
    """(id, sh_arr): the per-doc DISTINCT shingle ARRAY — the map-side
    half of ``shingle_table``, exposed so signature computations can
    run as NARROW array expressions over it (array_min over a
    transform) instead of paying the postings explode + a grouped
    aggregation back to one row per doc. Same shingle set, same
    contract (one row per id; docs shorter than n tokens get an empty
    array rather than disappearing)."""
    from csdid_pyspark_spark.operators.fanout import widen_fanout

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    out = df.select(F.col(id_col), toks.alias("tokens"))
    if widen:
        out = widen_fanout(out)
    parts = " || ' ' || ".join(f"tokens[i + {j}]" for j in range(n))
    shingles = F.expr(
        f"CASE WHEN size(tokens) >= {n} "
        f"THEN array_distinct(transform(sequence(0, size(tokens) - {n}), i -> {parts})) "
        f"ELSE array() END"
    )
    return out.select(id_col, shingles.alias("sh_arr"))


# Above this corpus size an UNCAPPED postings self-join (max_df=None,
# no blocking) is a known quadratic foot-gun: one boilerplate shingle
# shared by k docs contributes k² join rows. The exact variant exists
# as the verification baseline for the capped/blocked/LSH paths, so it
# refuses to run past this size instead of melting the cluster.
EXACT_PAIRS_LIMIT = 100_000


def _guard_exact_allpairs(df: DataFrame, limit: int | None, what: str, alternative: str) -> None:
    """Raise when an exact all-pairs baseline is pointed at a corpus too
    large for its quadratic candidate space. ``limit=None`` disables
    (caller explicitly accepts the cost). The count is one cheap
    metadata-backed action at guard time — nothing at 100 TB ever
    reaches it, because the guard fires first."""
    if limit is None:
        return
    n = df.count()
    if n > limit:
        raise ValueError(
            f"{what} is an exact all-pairs baseline (quadratic candidate space) "
            f"and refuses corpora above exact_limit={limit} rows (got {n}). "
            f"Use {alternative} for production-scale runs, or pass "
            f"exact_limit=None to accept the cost."
        )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    block_col: str | None = None,
    exact_limit: int | None = EXACT_PAIRS_LIMIT,
) -> DataFrame:
    """Exact shingle-set Jaccard over candidate pairs that share ≥1
    shingle. Postings self-join: shuffle keyed by shingle (skew-safe
    under AQE), then aggregate by pair. Only pairs above `threshold`
    survive. Columns: id_a < id_b, jaccard.

    ``max_df`` caps shingle document frequency for CANDIDATE GENERATION
    only: a shingle occurring in k docs contributes k² join rows, so one
    boilerplate phrase shared by 1M docs would alone produce 10¹² pairs.
    Dropping shingles with df > max_df bounds the self-join at
    O(Σ min(df, max_df)²) — the trade is that pairs whose only shared
    shingles are that common may be missed (such pairs are far below any
    useful threshold anyway). Intersections are still computed over the
    capped postings, so set max_df well above threshold-relevant overlap
    (e.g. 1000) at corpus scale; None = exact.

    ``block_col`` restricts pairs to documents sharing a blocking key
    (e.g. same source/domain/language) by folding the key into the
    self-join condition — the classic blocked-dedup trick: candidate
    volume drops from O(df²) per shingle to O(Σ df_block²), and the
    shuffle key (shingle, block) splits hot shingles across blocks.

    With NEITHER cap nor blocking this is the exact quadratic baseline:
    ``exact_limit`` (default ``EXACT_PAIRS_LIMIT``) refuses corpora
    above that size — use ``max_df``/``block_col`` or
    :func:`minhash_lsh_pairs` at scale."""
    if max_df is None and block_col is None:
        _guard_exact_allpairs(
            df, exact_limit, "jaccard_pairs(max_df=None, block_col=None)",
            "max_df/block_col or minhash_lsh_pairs",
        )
    # r11 note: a variant that carried n_sh = size(array_distinct(...))
    # through the posting rows (removing the sizes groupBy and both
    # pair-scale size joins; 17 -> 7 exchanges) measured 2-2.5x SLOWER
    # at sf0.1 in interleaved same-window A/B (5.4-6.2 s vs 2.3-3.1 s
    # solo medians, control query flat): the extra per-row ints ride
    # the candidate-pair hash aggregation — the one structure that is
    # quadratic in bucket df — and widening its rows/buffers costs far
    # more than the removed doc-scale pass and two broadcast-sized
    # joins ever saved. Reverted per guide §1 (measure decides).
    carry = [block_col] if block_col else None
    sh = shingle_table(df, text_col, id_col, n, carry_cols=carry)
    if max_df is not None:
        hot = sh.groupBy("shingle").agg(F.count("*").alias("df_sh")).filter(
            F.col("df_sh") > max_df
        )
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    # the postings feed sizes AND both sides of the self-join: persist
    # once (the same postings-persisted-once policy as the LSH path) so
    # the explode+distinct shuffle runs once, not three times. n_sh here
    # is the POST-cap per-doc posting count (the oracle counts it after
    # the hot anti-join too), so the free map-side size used by the
    # exact branch above does not apply.
    sh = sh.persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = (
        a.join(b, cond)
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return attach_cache(
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")),
        sh,
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
    exact_limit: int | None = EXACT_PAIRS_LIMIT,
    with_sizes: bool = False,
) -> DataFrame:
    """Shingle-set CONTAINMENT over candidate pairs sharing ≥1 shingle:
    C(A,B) = |A∩B| / min(|A|,|B|) — the doc-inside-doc detector
    (quote inclusion, boilerplate wrapping, partial crawls) that plain
    Jaccard misses because the union denominator dilutes a small doc
    fully contained in a big one. Same capped postings self-join shape
    as :func:`jaccard_pairs` (identical ``max_df`` candidate-generation
    cap and quadratic-baseline guard), different denominator.
    Columns: id_a < id_b, containment — plus n_a, n_b (each side's
    shingle-set size) when ``with_sizes``, which a consumer needs to
    decide WHICH side is the contained one (the smaller set)."""
    if max_df is None:
        _guard_exact_allpairs(
            df, exact_limit, "containment_pairs(max_df=None)",
            "max_df or minhash_lsh_pairs",
        )
    sh = shingle_table(df, text_col, id_col, n)
    if max_df is not None:
        hot = sh.groupBy("shingle").agg(F.count("*").alias("df_sh")).filter(
            F.col("df_sh") > max_df
        )
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sh = sh.persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    cols = ["id_a", "id_b", F.round("containment", 6).alias("containment")]
    if with_sizes:
        cols += [F.col("n_a").cast("bigint").alias("n_a"), F.col("n_b").cast("bigint").alias("n_b")]
    return attach_cache(
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("containment", F.col("n_inter") / F.least("n_a", "n_b"))
        .filter(F.col("containment") >= threshold)
        .select(*cols),
        sh,
    )


def jaccard_for_candidates(
    sh: DataFrame,
    cand: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle Jaccard restricted to a candidate pair list.

    This is the verification half of every LSH dedup path: ``cand``
    holds (id_a, id_b) with id_a < id_b, ``sh`` is the (id, shingle)
    postings table. Postings are first semi-joined down to candidate
    docs, then intersections come from joining the PAIR LIST to each
    side's postings — never a postings self-join — so the cost is
    O(|candidates| x shingles-per-doc) regardless of corpus size.
    (A self-join over even the candidate docs' postings would re-pay
    quadratic cost on hot shingles; the pair-list join cannot.)
    """
    # Both intermediates below are bounded by the CANDIDATE set (the
    # whole point of LSH pruning), so persisting them is cheap at any
    # corpus size — and essential: each is consumed by 2-3 downstream
    # joins, and without a cache Spark would re-derive the full
    # postings lineage once per consumer. Deliberately a PLAIN persist,
    # not persist_rightsized: each is consumed only 2-3 times, and the
    # right-sizing count would force an extra eager materialization of
    # the expensive banding lineage (measured +1-2 s at sf0.1 for no
    # downstream saving).
    cand = cand.persist()
    cand_ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).distinct()
    sh_c = sh.join(cand_ids, id_col, "left_semi").persist()
    sizes = sh_c.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sh_a = sh_c.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh_c.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return attach_cache(
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")),
        cand, sh_c,
    )


def jaccard_pairs_between(
    delta: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Incremental dedup: exact shingle Jaccard between a DELTA batch
    and an existing CORPUS — the ingestion-time shape (reference runs
    whole-corpus dedup only; a 100 TB pipeline re-pairs each day's crawl
    against the index, never the index against itself).

    The postings join is delta ⋈ corpus keyed by shingle, so candidate
    cost is O(Σ_sh df_delta·df_corpus) — linear in the corpus for a
    bounded delta, vs the self-join's quadratic df². The corpus side is
    first SEMI-JOIN-PRUNED to shingles that occur in the delta at all:
    at scale almost all corpus postings drop before the wide join (and
    parquet bloom/dictionary filters make that prune a scan-side win).
    Corpus-doc sizes are computed from the UNPRUNED postings, so the
    Jaccard denominator is exact.

    ``max_df`` caps document frequency measured on the CORPUS side (the
    scale risk — a boilerplate shingle in 1M corpus docs would fan every
    delta occurrence out 1M ways); capped shingles leave both sides
    before sizes, mirroring :func:`jaccard_pairs` semantics.

    Columns: delta_id, corpus_id, jaccard (≥ ``threshold``)."""
    # only the CORPUS side gets the fan-out widen: it carries ~all the
    # explode work (the delta is the bounded daily batch), and both
    # sides get re-spread by the shingle-keyed join shuffle regardless —
    # widening the delta too was pure overhead at small scale (r6 bench)
    # and a no-op at large
    sh_d = shingle_table(delta, text_col, id_col, n, widen=False)
    # corpus postings feed the hot-df measurement, corpus-doc sizes AND
    # the intersection join — persist once instead of re-running the
    # corpus-wide explode+distinct (the dominant cost) three times
    sh_c_cached = shingle_table(corpus, text_col, id_col, n).persist()
    sh_c = sh_c_cached
    if max_df is not None:
        hot = (
            sh_c_cached.groupBy("shingle")
            .agg(F.count("*").alias("df_sh"))
            .filter(F.col("df_sh") > max_df)
            .select("shingle")
        )
        sh_d = sh_d.join(F.broadcast(hot), "shingle", "left_anti")
        sh_c = sh_c_cached.join(F.broadcast(hot), "shingle", "left_anti")
    # postings feed sizes AND the intersection join on each side
    sh_d = sh_d.persist()
    sizes_d = sh_d.groupBy(id_col).agg(F.count("*").alias("n_d"))
    sizes_c = sh_c.groupBy(id_col).agg(F.count("*").alias("n_c"))
    # only corpus postings sharing a shingle with the delta can reach an
    # intersection; no explicit broadcast — a big delta must shuffle,
    # AQE picks broadcast when the delta's shingle set is small
    sh_c_pruned = sh_c.join(sh_d.select("shingle").distinct(), "shingle", "left_semi")
    d, c = sh_d.alias("d"), sh_c_pruned.alias("c")
    inter = (
        d.join(c, F.col("d.shingle") == F.col("c.shingle"))
        .groupBy(
            F.col(f"d.{id_col}").alias("delta_id"),
            F.col(f"c.{id_col}").alias("corpus_id"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sd = sizes_d.select(F.col(id_col).alias("delta_id"), "n_d")
    sc = sizes_c.select(F.col(id_col).alias("corpus_id"), "n_c")
    return attach_cache(
        inter.join(sd, "delta_id")
        .join(sc, "corpus_id")
        .withColumn(
            "jaccard", F.col("n_inter") / (F.col("n_d") + F.col("n_c") - F.col("n_inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("delta_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")),
        sh_d,
        sh_c_cached,
    )


def build_postings_index(
    corpus: DataFrame,
    table: str,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int | None = None,
    buckets: int = 16,
) -> None:
    """Materialize the CORPUS-side state of incremental dedup as an
    on-disk index — the architecture a 100 TB ingestion pipeline
    actually runs (the CCNet/Gopher-scale dedup services all maintain
    a postings index; nobody re-shingles the corpus per daily crawl):

    * ``<table>`` — the (id, shingle) postings, hot-shingle-filtered,
      written as a parquet table BUCKETED BY shingle: the per-delta
      intersection join is keyed on shingle, so the bucketed corpus
      side joins with ZERO exchange — the shuffle that would move the
      100 TB side is paid ONCE here, at index-build/maintenance time,
      and every probe afterwards shuffles only the bounded delta.
    * ``path/hot`` — shingles with corpus df > ``max_df`` (the
      boilerplate fan-out cap), stored so probes broadcast it instead
      of recomputing a full corpus aggregation.
    * ``path/sizes`` — per-doc shingle-set sizes AFTER the hot filter
      (the exact Jaccard denominators), again corpus-side state.

    Maintenance contract: ingesting an accepted delta appends its
    postings/sizes and refreshes hot counts — the same incremental
    append every inverted index does."""
    from csdid_pyspark_spark.sources.sinks import write_bucketed

    sh_c = shingle_table(corpus, text_col, id_col, n)
    spark = corpus.sparkSession
    if max_df is not None:
        hot = (
            sh_c.groupBy("shingle")
            .agg(F.count("*").alias("df_sh"))
            .filter(F.col("df_sh") > max_df)
            .select("shingle")
        )
    else:
        hot = sh_c.select("shingle").limit(0)
    hot.coalesce(1).write.mode("overwrite").parquet(f"{path}/hot")
    hot_r = F.broadcast(spark.read.parquet(f"{path}/hot"))
    sh_c = sh_c.join(hot_r, "shingle", "left_anti")
    write_bucketed(
        sh_c, table, f"{path}/postings", buckets, ["shingle"]
    )
    (
        spark.table(table)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_c"))
        .write.mode("overwrite")
        .parquet(f"{path}/sizes")
    )


def jaccard_pairs_against_index(
    delta: DataFrame,
    table: str,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Probe the :func:`build_postings_index` state with a DELTA batch:
    same output contract as :func:`jaccard_pairs_between` (delta_id,
    corpus_id, jaccard ≥ threshold), but the per-call cost is
    delta-side only — shingle the delta, drop stored hot shingles
    (broadcast), semi-prune the bucketed corpus postings by the
    delta's shingle set (bucketed scan: no corpus-side exchange), one
    intersection join, and the stored size table supplies the exact
    denominators. The corpus explode+distinct — the dominant cost of
    the unindexed path — never reruns."""
    spark = delta.sparkSession
    sh_d = shingle_table(delta, text_col, id_col, n, widen=False)
    hot = F.broadcast(spark.read.parquet(f"{path}/hot"))
    sh_d = sh_d.join(hot, "shingle", "left_anti").persist()
    sizes_d = sh_d.groupBy(id_col).agg(F.count("*").alias("n_d"))
    sh_c = spark.table(table).join(
        sh_d.select("shingle").distinct(), "shingle", "left_semi"
    )
    d, c = sh_d.alias("d"), sh_c.alias("c")
    inter = (
        d.join(c, F.col("d.shingle") == F.col("c.shingle"))
        .groupBy(
            F.col(f"d.{id_col}").alias("delta_id"),
            F.col(f"c.{id_col}").alias("corpus_id"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sd = sizes_d.select(F.col(id_col).alias("delta_id"), "n_d")
    sc = spark.read.parquet(f"{path}/sizes").select(
        F.col(id_col).alias("corpus_id"), "n_c"
    )
    return attach_cache(
        inter.join(sd, "delta_id")
        .join(sc, "corpus_id")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_d") + F.col("n_c") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("delta_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")),
        sh_d,
    )


def _hash64(col, seed: int):
    """Deterministic seeded 64-bit hash. xxhash64 is JVM-native and
    ~20× cheaper than an md5+conv chain — it dominates MinHash cost
    (num_hashes × shingles evaluations)."""
    return F.xxhash64(F.lit(seed), col)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per doc: for each of `num_hashes` seeded hash
    functions, the min hash over the doc's shingle set. Computed
    MAP-SIDE over the per-doc shingle array (array_min over a
    transform) — NO postings explode, no grouped aggregation; values
    are bit-identical to the old min-over-postings form (same distinct
    shingle set, same xxhash64(seed, shingle))."""
    return _minhash_sig_from_arrays(
        _shingle_arrays(df, text_col, id_col, n), id_col, num_hashes
    )


def _minhash_sig_from_arrays(
    arr: DataFrame, id_col: str, num_hashes: int
) -> DataFrame:
    """num_hashes min-hash columns as narrow expressions over the
    (id, sh_arr) frame; docs with no shingles are dropped (matching
    the postings form, where they never produced a group)."""
    return arr.filter(F.size("sh_arr") > 0).select(
        F.col(id_col),
        *[
            F.expr(
                f"array_min(transform(sh_arr, x -> xxhash64({s}, x)))"
            ).alias(f"mh_{s}")
            for s in range(num_hashes)
        ],
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash LSH near-dup candidates, verified with exact Jaccard.
    ``max_bucket``: optional cap on (band, bucket) group size — buckets
    past it are dropped before pair generation (see the inline guard
    note); None processes every bucket.

    Banding: num_hashes/bands rows per band; docs agreeing on all rows
    of any band become candidates (one grouped pass keyed by
    (band, bucket) — in-bucket pairs are generated from the sorted
    per-bucket id array, so the candidate stage pays ONE shuffle, not
    a two-sided self-join plus a distinct). Candidates are then
    re-scored with exact shingle Jaccard RESTRICTED to the candidate
    list — a map-side array_intersect over the two docs' cached
    shingle arrays (bit-identical to the postings-join form: the
    arrays are distinct, so |intersect| and the union-size identity
    give the same integers into the same division) — so the output is
    exact on candidates while every stage stays linear-ish in corpus
    size — LSH prunes the pair space AND the verification join, which
    is what makes this run at 100 TB where the all-pairs join cannot."""
    rows = num_hashes // bands
    # the per-doc shingle ARRAY feeds BOTH the signature computation
    # and (exploded) the exact-Jaccard verification below; uncached,
    # the tokenize + shingle construction (the single most expensive
    # stage of this pipeline) would run once per consumer. Signatures
    # are MAP-SIDE array_min expressions over the cached arrays — the
    # postings explode + groupBy(id) aggregation the old form paid
    # (one full postings shuffle, 0.9 s of the 3.0 s sf0.1 median) is
    # gone; values are bit-identical (same distinct shingle set, same
    # xxhash64(seed, shingle)).
    arr = _shingle_arrays(df, text_col, id_col, n).persist()
    sig = _minhash_sig_from_arrays(arr, id_col, num_hashes)
    # one (band, bucket) struct per band, exploded from a SINGLE pass
    # over the signature table — a per-band union would embed the whole
    # corpus->signature subtree once per band per join side (observed:
    # 8+ duplicated scans in the physical plan)
    band_structs = []
    for band in range(bands):
        cols = [F.col(f"mh_{band * rows + r}") for r in range(rows)]
        band_structs.append(
            F.struct(
                F.lit(band).alias("band"),
                # bucket id stays the md5 value but as 16-byte BINARY
                # (bijective unhex of the hex form): identical groups,
                # half the bytes through the (band, bucket) exchange —
                # the one corpus-scale shuffle of this pipeline. The
                # bucket never reaches any output.
                F.unhex(
                    F.md5(F.concat_ws(",", *[c.cast("string") for c in cols]))
                ).alias("bucket"),
            )
        )
    bucketed = sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # in-bucket pairs from the sorted per-bucket id array: ONE grouped
    # shuffle keyed by (band, bucket) replaces the two-sided self-join.
    # A bucket of k docs emits k(k-1)/2 pairs — exactly the candidate
    # fan-in the banding math budgets for — but the pairs are generated
    # INCREMENTALLY: posexplode the ids first, then each row carries
    # only one source element's tail slice (<= k elements), so a hot
    # bucket (near-identical boilerplate sharing a full band signature)
    # streams its quadratic fan-out through the generate operators
    # instead of materializing all k^2/2 pair structs inside ONE row's
    # array (the previous shape, an OOM on a single task for large k).
    grouped = (
        bucketed.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_bucket is not None:
        # explicit mega-bucket guard: a bucket past this size is a
        # collision-threshold problem upstream (band rows too short /
        # boilerplate not pre-deduped) — drop it rather than pay its
        # quadratic candidate fan-in. None (default) keeps every
        # bucket, preserving exact parity with the unguarded form.
        grouped = grouped.filter(F.size("ids") <= int(max_bucket))
    pairs = (
        grouped.select(F.col("ids"), F.posexplode("ids").alias("i", "id_a"))
        .select(
            "id_a",
            F.explode(
                F.expr("slice(ids, i + 2, size(ids) - i - 1)")
            ).alias("id_b"),
        )
    )
    cand = pairs.distinct()
    # exact-Jaccard verification, map-side: each candidate pair pulls
    # its two cached shingle arrays; |A ∩ B| via array_intersect (the
    # arrays are distinct) and the same n_a + n_b - n_inter division
    # the postings form used — bit-identical jaccard values
    pa = arr.select(
        F.col(id_col).alias("id_a"),
        F.col("sh_arr").alias("arr_a"),
    )
    pb = arr.select(
        F.col(id_col).alias("id_b"),
        F.col("sh_arr").alias("arr_b"),
    )
    n_inter = F.size(F.array_intersect("arr_a", "arr_b"))
    n_a, n_b = F.size("arr_a"), F.size("arr_b")
    jac = n_inter / (n_a + n_b - n_inter)
    return attach_cache(
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")),
        arr,
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """SimHash fingerprint: sign-sum of per-token hash bits. Tokens are
    hashed once (md5→bigint); bit b of the fingerprint is 1 iff more
    tokens have bit b set than unset. Exploded-token aggregation —
    one shuffle keyed by doc id."""
    toks = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    tok_df = df.select(F.col(id_col), toks)
    h = _hash64(F.col("tok"), 0)
    bit_sums = [
        F.sum(F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tok_df.groupBy(id_col).agg(*bit_sums)
    fp = F.lit(0).cast("bigint")
    for b in range(bits):
        fp = fp + F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return agg.select(F.col(id_col), fp.alias("simhash"))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_len: int = 12,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): rolling char k-gram hashes, then the minimum hash of
    each sliding window of `window` consecutive k-grams, deduplicated.
    Guarantees any shared substring of length >= window + k - 1 between
    two documents yields at least one shared fingerprint — the local
    dedup/provenance primitive exact-hash fingerprints can't provide.

    The k-gram hash is a base-131 polynomial over character codes
    (codes < 131^k fits bigint for k=5, no modular reduction) rather
    than an engine hash, so the operator is bit-identical across
    engines and therefore SQL-oracle-checkable. All array-native
    (sequence/transform/slice/array_min): one narrow scan, no shuffle,
    no UDF; the explode output shuffles only if the caller aggregates.
    """
    if k != 5:
        raise ValueError("portable polynomial hash is specialized to k=5")
    t = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(id_col), t.alias("t")).filter(F.length("t") >= min_len)
    # Spark's substring(t, i, 1) walks the UTF8 buffer from the start
    # to find codepoint i — O(i) per call, O(5·L²) per document for the
    # naive k-gram expression (measured 9.2 s for the sf0.01 corpus on
    # one core). Materialize the char-code array ONCE and index it with
    # O(1) element_at instead. The codes array must be bound as a
    # higher-order-function lambda variable (array(...)[0] wrapper):
    # a plain projection alias gets inlined by CollapseProject into
    # every element_at, silently restoring the O(L²) shape (measured
    # 4.5× WORSE). Values are bit-identical to the substring form —
    # ascii(char) per position either way (oracle re-proved).
    hs = (
        "transform(array(transform(split(t, ''), c -> cast(ascii(c) as bigint))), "
        "cs -> transform(sequence(1, size(cs) - 4), i -> "
        "element_at(cs, i) * 294499921 "
        "+ element_at(cs, i+1) * 2248091 "
        "+ element_at(cs, i+2) * 17161 "
        "+ element_at(cs, i+3) * 131 "
        "+ element_at(cs, i+4)))[0]"
    )
    fps = (
        f"array_sort(array_distinct(transform(sequence(1, size(hs) - {window - 1}), j -> "
        f"array_min(slice(hs, j, {window})))))"
    )
    return (
        base.select(id_col, F.expr(hs).alias("hs"))
        .filter(F.size("hs") >= window)
        .select(id_col, F.explode(F.expr(fps)).alias("fp"))
    )


def components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair list by min-label
    propagation: every node repeatedly adopts the smallest label among
    itself and its neighbors until a fixpoint — O(graph diameter)
    iterations, each one join + one min-aggregation (two shuffles).
    Near-dup graphs are unions of small cliques/chains, so this
    converges in a handful of rounds at any scale; for adversarially
    deep graphs swap in large-star/small-star (Kiveris et al.) with the
    same join primitives. Returns (node, comp) with comp = min node id
    of the component; only nodes that appear in ``pairs`` are emitted
    (singletons are their own trivial component).
    """
    import math as _math

    from csdid_pyspark_spark.cache import (
        TARGET_ROWS_PER_PARTITION,
        _shuffle_partitions,
        persist_rightsized,
    )

    # both edge directions from ONE execution of the pair subtree: a
    # unionByName of two projections embeds the (expensive) pair
    # generation once per branch — the cache below only helps AFTER
    # materialization, and materializing the union ran the subtree
    # twice (guide §2.4). explode(array(struct,struct)) emits the same
    # directed-edge multiset from a single pass.
    both_dirs = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(id_a).alias("s"), F.col(id_b).alias("d")),
                F.struct(F.col(id_b).alias("s"), F.col(id_a).alias("d")),
            )
        ).alias("e")
    ).select("e.s", "e.d")
    # read once per propagation round: right-sized cache; the measured
    # edge count also sizes every round's label checkpoint below, so a
    # small graph doesn't pay 32-task overhead per round and a huge one
    # keeps its parallelism
    edges, n_edges = persist_rightsized(both_dirs.distinct(), measure=True)
    # labels ≤ 2·edges nodes; cap at the shuffle width the groupBy
    # produces anyway so a planet-scale graph never over-coalesces
    shuffle_parts = _shuffle_partitions(pairs.sparkSession)
    label_parts = min(
        shuffle_parts, max(1, _math.ceil(n_edges / TARGET_ROWS_PER_PARTITION))
    )
    # each round MUST truncate lineage: without a checkpoint the plan
    # nests the whole history and grows exponentially (observed: JVM OOM
    # from plan bloat at iteration ~8). localCheckpoint is the local-mode
    # choice; on a real cluster prefer sc.setCheckpointDir + checkpoint()
    # so a lost executor cannot drop the truncated blocks.
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .coalesce(label_parts)
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = edges.join(labels, edges["d"] == labels["node"]).select(
            F.col("s").alias("node"), "comp"
        )
        new = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .coalesce(label_parts)
            .localCheckpoint(eager=True)
        )
        changed = (
            new.select("node", F.col("comp").alias("nc"))
            .join(labels.select("node", F.col("comp").alias("oc")), "node")
            .filter(F.col("nc") != F.col("oc"))
            .limit(1)
            .count()
        )
        labels = new
        if not changed:
            break
    edges.unpersist()
    return labels.select("node", "comp")
