"""Similarity search over embedding columns (``array<float>``).

* brute-force cosine — the exact baseline: one scan, JVM-side fold per
  row, no shuffle at all for a single query vector.
* LSH-bucketed ANN — random-hyperplane signatures restrict candidates
  to matching buckets; the scale path when both sides are large
  (bucket join instead of cross join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csdid_pyspark_spark.functions.vectors import as_double_array, cosine, lit_vector


def cosine_scores(
    df: DataFrame,
    query: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine similarity of every row against one query vector.
    Embarrassingly parallel: scan + per-row fold, no shuffle."""
    v = as_double_array(vec_col)
    q = lit_vector(query).cast("array<double>")
    return df.select(F.col(id_col), cosine(v, q).alias("cosine"))


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine. orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heap + driver merge of k rows) — no global sort shuffle."""
    return (
        cosine_scores(df, query, id_col, vec_col)
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def mmr_rerank(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, int, float, float]]:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick argmax λ·rel(c) − (1−λ)·max sim to
    the already-selected set. The EXPENSIVE half — scoring the corpus
    and carving the relevance pool — is the distributed
    TakeOrderedAndProject scan (:func:`cosine_topk` shape); the greedy
    selection then runs on the collected pool, whose size is the
    O(pool·dim) driver traffic this engine allows everywhere for
    result-sized sets (same budget class as the estimator's
    O(cells·p²) Grams). Deterministic: pure float arithmetic on a
    deterministic pool, ties broken by ascending id.

    Returns [(rank, id, relevance, mmr_score)] — rank 1-based."""
    v = as_double_array(vec_col)
    q = lit_vector(query).cast("array<double>")
    cand = (
        df.select(F.col(id_col), F.col(vec_col), cosine(v, q).alias("rel"))
        .orderBy(F.desc("rel"), F.col(id_col))
        .limit(pool)
        .collect()
    )
    import math

    def _cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    remaining = [(r[id_col], [float(x) for x in r[vec_col]], float(r["rel"])) for r in cand]
    selected: list[tuple[int, int, float, float]] = []
    sel_vecs: list[list[float]] = []
    while remaining and len(selected) < k:
        best = None
        for cid, cvec, crel in remaining:
            penalty = max((_cos(cvec, s) for s in sel_vecs), default=0.0)
            score = lam * crel - (1.0 - lam) * penalty
            # strict > : on exact score ties the earlier (higher rel,
            # then smaller id) pool entry wins — fully deterministic
            if best is None or score > best[3]:
                best = (cid, cvec, crel, score)
        selected.append((len(selected) + 1, best[0], best[2], best[3]))
        sel_vecs.append(best[1])
        remaining = [t for t in remaining if t[0] != best[0]]
    return selected


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded LCG, no numpy
    import needed at executor side — these become literals)."""
    state = seed * 6364136223846793005 + 1442695040888963407
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-bit signature against each hyperplane, concatenated into a
    bucket key string."""
    bits = []
    for plane in planes:
        p = lit_vector(plane)
        d = F.aggregate(F.zip_with(vec, p, lambda x, y: x * y), F.lit(0.0), lambda a, b: a + b)
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ann_topk_lsh(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k with multi-probe LSH: score rows whose bucket
    is within Hamming distance `probe_hamming` of the query's signature
    (near-misses on one hyperplane are the most likely true neighbors).
    At 100 TB the bucket IN-list prunes ~(1+planes)/2^planes of the
    corpus before any scoring; with a bucket-partitioned table layout
    it also prunes file scans."""
    planes = _hyperplanes(len(query), n_planes, seed)
    v = as_double_array(vec_col)
    qbits = "".join(
        "1" if sum(p * x for p, x in zip(plane, query)) >= 0 else "0" for plane in planes
    )
    probes = {qbits}
    if probe_hamming >= 1:
        for i in range(n_planes):
            flipped = qbits[:i] + ("0" if qbits[i] == "1" else "1") + qbits[i + 1 :]
            probes.add(flipped)
    bucketed = df.select(F.col(id_col), v.alias("_v"), lsh_bucket(v, planes).alias("_bucket"))
    q = lit_vector(query).cast("array<double>")
    return (
        bucketed.filter(F.col("_bucket").isin(sorted(probes)))
        .select(F.col(id_col), cosine(F.col("_v"), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


# An exact broadcast self-join is O(n²) comparisons AND broadcasts the
# full vector table; past this row count use neardup_pairs_lsh.
EXACT_COSINE_LIMIT = 50_000


def neardup_pairs_cosine(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_limit: int | None = EXACT_COSINE_LIMIT,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every (a, b) with
    id_a < id_b and cosine >= threshold. Broadcast self-join — the exact
    baseline, correct at any threshold but O(n^2) comparisons; it is the
    oracle for :func:`neardup_pairs_lsh`, which is the 100 TB path.
    ``exact_limit`` (default ``EXACT_COSINE_LIMIT``) refuses inputs too
    large for the quadratic/broadcast cost — pass ``None`` to accept it.
    (No reference analog — scale extension per SURVEY.md §7/M6.)"""
    from csdid_pyspark_spark.operators.dedup import _guard_exact_allpairs
    from csdid_pyspark_spark.operators.fanout import widen_fanout

    _guard_exact_allpairs(
        df, exact_limit, "neardup_pairs_cosine", "neardup_pairs_lsh"
    )
    # the broadcast nested-loop join computes n cosines PER STREAM ROW:
    # a physically tiny corpus scan (a few input splits) would run the
    # whole O(n²) compare on that few cores — widen the stream side
    # first (no-op at scan widths ≥ core count; guarded ≤ exact_limit
    # rows anyway, so the repartition moves a few MB once)
    a = widen_fanout(
        df.select(F.col(id_col).alias("id_a"), as_double_array(vec_col).alias("_va"))
    )
    b = df.select(F.col(id_col).alias("id_b"), as_double_array(vec_col).alias("_vb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """LIMIT-1 probe for the embedding dimensionality (fetches one array
    size, not a vector). Callers that know the dim should pass it and
    keep plan construction action-free."""
    row = df.select(F.size(F.col(vec_col)).alias("n")).first()
    if row is None or row["n"] is None:
        raise ValueError("cannot infer embedding dim from an empty DataFrame; pass dim=")
    return int(row["n"])


def _flip_bit(sig: F.Column, i: int, n_bits: int) -> F.Column:
    """Signature string with bit i (0-based) flipped."""
    flipped = F.when(F.substring(sig, i + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1"))
    parts = []
    if i > 0:
        parts.append(F.substring(sig, 1, i))
    parts.append(flipped)
    if i + 1 < n_bits:
        parts.append(F.substring(sig, i + 2, n_bits - i - 1))
    return F.concat(*parts)


def neardup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    probe_hamming: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: `n_tables` independent
    random-hyperplane signatures; candidates are pairs whose signatures
    are within Hamming distance `probe_hamming` in at least one table
    (a shuffle equi-join on the bucket key — never a cross join), then
    exact-cosine verified against `threshold`. Multi-probe is asymmetric:
    side A keeps its exact bucket, side B explodes to its bucket plus
    all 1-bit flips, so a hamming-1 pair still equi-collides. Per-plane
    collision prob p = 1 - theta/pi; per-table catch prob is
    p^k + k*p^(k-1)*(1-p); recall = 1-(1-that)^tables — at the defaults
    and threshold 0.4 this is >0.99 while candidates stay ~n^2/2^planes
    per table. Both sides scale: the join shuffles on the bucket key
    with bounded bucket sizes, and dedup of candidate pairs happens
    before the (cheap) verification. (Scale extension, SURVEY.md §7/M6.)

    Pass ``dim`` when known; otherwise it is inferred with a LIMIT-1
    probe job — the only case where plan construction touches data."""
    v = as_double_array(vec_col)
    if dim is None:
        dim = _infer_dim(df, vec_col)
    proj = df.select(F.col(id_col).alias("_id"), v.alias("_v"))
    sig_cols = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000003 * t)
        sig_cols.append(lsh_bucket(F.col("_v"), planes).alias(f"_b{t}"))
    sig = proj.select("_id", "_v", *sig_cols)

    def tagged(t: int, col: F.Column) -> F.Column:
        return F.concat(F.lit(f"{t}:"), col)

    a_probes = [tagged(t, F.col(f"_b{t}")) for t in range(n_tables)]
    b_probes = list(a_probes)
    if probe_hamming >= 1:
        for t in range(n_tables):
            for i in range(n_planes):
                b_probes.append(tagged(t, _flip_bit(F.col(f"_b{t}"), i, n_planes)))
    a = sig.select(
        F.col("_id").alias("id_a"),
        F.col("_v").alias("_va"),
        F.explode(F.array(*a_probes)).alias("_bucket"),
    )
    b = sig.select(
        F.col("_id").alias("id_b"),
        F.col("_v").alias("_vb"),
        F.explode(F.array(*b_probes)).alias("_bucket"),
    )
    cand = (
        a.join(b, ["_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def semantic_dedup_pairs(
    df: DataFrame,
    cluster_col: str = "label",
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style cluster-bounded near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540): pairs within the same cluster whose embedding
    cosine is >= ``threshold``; a vector with a lower-id neighbor above
    threshold is the one a keep-list drops. The join is an EQUI-join on
    the cluster key — cost is O(sum c_i^2) over cluster sizes, bounded
    by the clustering granularity, never global n^2. At 100 TB the
    cluster id comes from a k-means/LSH assignment step and each
    cluster's pair block fits a single task, so the shuffle is one
    hash-partition on the cluster key. (Scale extension, SURVEY.md
    §7/M6 — no reference analog.)"""
    a = df.select(
        F.col(cluster_col).alias("_c"),
        F.col(id_col).alias("id_a"),
        as_double_array(vec_col).alias("_va"),
    )
    b = df.select(
        F.col(cluster_col).alias("_cb"),
        F.col(id_col).alias("id_b"),
        as_double_array(vec_col).alias("_vb"),
    )
    return (
        a.join(b, (F.col("_c") == F.col("_cb")) & (F.col("id_a") < F.col("id_b")))
        .select(
            F.col("_c").alias(cluster_col),
            "id_a",
            "id_b",
            cosine(F.col("_va"), F.col("_vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def knn_join_bruteforce(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs k-NN via broadcast of the smaller (right) side and a
    per-left-row window top-k. Right side must be broadcastable; for
    two large sides use LSH bucketing instead."""
    from pyspark.sql import Window

    l = left.select(F.col(left_id).alias("l_id"), as_double_array(vec_col).alias("l_v"))
    r = right.select(F.col(right_id).alias("r_id"), as_double_array(vec_col).alias("r_v"))
    scored = l.join(F.broadcast(r), F.col("l_id") != F.col("r_id")).select(
        "l_id", "r_id", cosine(F.col("l_v"), F.col("r_v")).alias("cosine")
    )
    w = Window.partitionBy("l_id").orderBy(F.desc("cosine"), F.col("r_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
