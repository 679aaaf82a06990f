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
