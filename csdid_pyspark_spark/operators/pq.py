"""Product quantization (PQ) for billion-scale similarity search.

PQ is THE memory-scale path for ANN at 100 TB: split each p-dim vector
into M subvectors, k-means each subspace into K centroids, and store
each vector as M small codes (M bytes at K=256; here K=16 for the
test corpus). Search scores candidates with an Asymmetric Distance
Computation (ADC) table — M·K precomputed subdistances broadcast as
literals — so the scan never touches the original floats.

Spark-first shapes:
- codebook training runs ALL M subspaces simultaneously: one narrow
  explode to (vec, m, subvector), assignment via a broadcast
  (m, cluster, centroid) join + zip_with/aggregate codegen, update via
  ONE groupBy of M·K·d_sub cells with decimal-exact means — driver
  traffic is the codebook itself (M·K·d_sub floats) per iteration,
  row count never leaves the executors (same contract as
  operators/kmeans.py and the estimator Gram passes);
- encoding is the same assignment pass, emitting (id, m, code);
- ADC scoring is a broadcast equi-join of the code table against the
  M·K distance table + one groupBy(id) sum — no vector math at scan
  time, which is the entire point of PQ.

Deterministic: init = subvectors of the K lowest-id vectors, fixed
iteration count, decimal-exact centroid means, integer codes,
(score, id) tiebreaks — so the index and search results pin VALUES
goldens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _subvectors(df: DataFrame, vec_col: str, id_col: str, m: int, d_sub: int) -> DataFrame:
    subs = F.array(
        *[F.slice(F.col(vec_col), i * d_sub + 1, d_sub) for i in range(m)]
    )
    return df.select(id_col, F.posexplode(subs).alias("m", "sub"))


def _assign_codes(sub: DataFrame, cb_df: DataFrame, id_col: str) -> DataFrame:
    d2 = F.aggregate(
        F.zip_with(F.col("sub"), F.col("cen"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        sub.join(F.broadcast(cb_df), "m")
        .select(id_col, "m", F.col("cluster"), d2.alias("d2"))
        .groupBy(id_col, "m")
        .agg(F.min_by("cluster", F.struct("d2", "cluster")).alias("code"))
    )


def _codebook_df(spark, codebook: dict[int, dict[int, list[float]]]) -> DataFrame:
    rows = [
        (m, c, [float(x) for x in cen])
        for m, clusters in codebook.items()
        for c, cen in clusters.items()
    ]
    return spark.createDataFrame(rows, "m int, cluster int, cen array<double>")


def train_pq(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    iters: int = 4,
) -> dict[int, dict[int, list[float]]]:
    """Learn the M per-subspace codebooks. Returns
    ``{m: {cluster: centroid}}`` — O(M·K·d_sub) driver data."""
    p = len(df.select(vec_col).first()[0])
    assert p % m == 0, f"dim {p} not divisible by m={m}"
    d_sub = p // m
    spark = df.sparkSession
    sub = _subvectors(df, vec_col, id_col, m, d_sub)

    init = (
        _subvectors(df.orderBy(id_col).limit(k), vec_col, id_col, m, d_sub)
        .orderBy(id_col, "m")
        .collect()
    )
    codebook: dict[int, dict[int, list[float]]] = {j: {} for j in range(m)}
    seen: dict[int, int] = {j: 0 for j in range(m)}
    for r in init:
        j = r["m"]
        if seen[j] < k:
            codebook[j][seen[j]] = [float(x) for x in r["sub"]]
            seen[j] += 1

    for _ in range(iters):
        cb_df = _codebook_df(spark, codebook)
        assigned = _assign_codes(sub, cb_df, id_col)
        upd = (
            sub.join(assigned, [id_col, "m"])
            .select("m", F.col("code"), F.posexplode("sub").alias("dim", "x"))
            .groupBy("m", "code", "dim")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
                    / F.count("*")
                ).alias("mean")
            )
            .collect()
        )
        new: dict[int, dict[int, dict[int, float]]] = {}
        for r in upd:
            new.setdefault(r["m"], {}).setdefault(r["code"], {})[r["dim"]] = r["mean"]
        for j in range(m):
            for c in range(k):
                if j in new and c in new[j]:
                    codebook[j][c] = [
                        new[j][c][d] for d in range(d_sub)
                    ]
                # empty cluster: keep its previous centroid
    return codebook


def encode_pq(
    df: DataFrame,
    codebook: dict[int, dict[int, list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, m, code) PQ codes — the compressed index a scan reads
    instead of the float vectors."""
    m = len(codebook)
    d_sub = len(codebook[0][0])
    spark = df.sparkSession
    sub = _subvectors(df, vec_col, id_col, m, d_sub)
    return _assign_codes(sub, _codebook_df(spark, codebook), id_col)


def pq_topk(
    codes: DataFrame,
    codebook: dict[int, dict[int, list[float]]],
    query: list[float],
    id_col: str = "vec_id",
    k_out: int = 10,
) -> DataFrame:
    """ADC top-k: broadcast the M·K distance table, join it to the code
    table, sum per id. Approximate squared-L2 (codebook resolution),
    deterministic (score, id) order."""
    m = len(codebook)
    d_sub = len(codebook[0][0])
    spark = codes.sparkSession
    rows = []
    for j in range(m):
        qs = query[j * d_sub : (j + 1) * d_sub]
        for c, cen in codebook[j].items():
            d2 = sum((a - b) * (a - b) for a, b in zip(qs, cen))
            rows.append((j, c, float(d2)))
    dtable = F.broadcast(
        spark.createDataFrame(rows, "m int, code int, d2 double")
    )
    return (
        codes.join(dtable, ["m", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("d2").cast("decimal(38,12)")).cast("double"), 6).alias("adc_d2"))
        .orderBy("adc_d2", id_col)
        .limit(k_out)
    )


def pq_topk_rerank(
    vectors: DataFrame,
    codes: DataFrame,
    codebook: dict[int, dict[int, list[float]]],
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_candidates: int = 50,
    k_out: int = 10,
) -> DataFrame:
    """The production PQ pipeline: ADC generates n_candidates from the
    code table (floats never scanned), then ONLY those candidates are
    re-ranked with exact squared-L2 against the float vectors — the
    standard coarse-then-exact ANN design. The exact pass touches
    n_candidates rows regardless of corpus size (broadcast semi-join
    on the candidate ids)."""
    cand = pq_topk(codes, codebook, query, id_col=id_col, k_out=n_candidates).select(
        id_col
    )
    qarr = F.array(*[F.lit(float(x)) for x in query])
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), qarr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        vectors.join(F.broadcast(cand), id_col, "semi")
        .select(id_col, F.round(d2, 6).alias("d2"))
        .orderBy("d2", id_col)
        .limit(k_out)
    )
