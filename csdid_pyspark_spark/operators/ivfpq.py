"""IVF-PQ: inverted-file coarse quantizer + residual product
quantization — the composition that actually runs billion-scale ANN
(the Faiss ``IVFxx,PQyy`` index family, Jégou-Douze-Schmid 2011,
"Product quantization for nearest neighbor search").

The two halves already exist separately in this engine (IVF probing in
operators/mllib_lsh.py, PQ/ADC in operators/pq.py); composing them is
what changes the asymptotics: a probe reads ``n_probe / n_cells`` of
the corpus (partition pruning on the cell id at real scale), and
within the probed cells the scan touches M-byte codes instead of
float vectors. Residual encoding — PQ codes quantize
``vec - centroid(cell)``, not the raw vector — is the part that makes
the composition beat either half alone: residuals are centered near
zero, so the same codebook budget spends its resolution where the
probed vectors actually live.

Query path (mirrors Faiss's ADC flow):
1. rank cells by centroid distance driver-side (k·p floats), keep
   ``n_probe``;
2. per probed cell, the query's OWN residual (q - centroid) yields a
   per-cell M×K ADC table — all probed tables union into one
   broadcast (cell, m, code, d2) frame;
3. codes of vectors in probed cells join that broadcast and sum per
   id: approximate distances without touching a float vector;
4. the top ``n_candidates`` ids are exact-reranked against the
   original vectors (broadcast semi-join; bounded rows regardless of
   corpus size).

Everything is deterministic on fixed data: coarse init = k lowest-id
vectors, decimal-exact centroid means (partial-sum-order independent),
fixed iteration counts, min_by (distance, id) tiebreaks — so the
query output pins a VALUES golden, and recall vs the exact baseline
is pytest-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csdid_pyspark_spark.operators.pq import encode_pq, train_pq


def _centroid_array(centroids: list[list[float]]):
    return F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])


def coarse_kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 4,
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic Lloyd's coarse quantizer: returns ((id, cell)
    assignments, centroid list). Same plan shapes as
    operators/kmeans.py (explode-k assignment, one k·p-cell update
    shuffle) but with DECIMAL-exact centroid means so the centroids —
    and therefore every downstream code — are independent of
    partial-aggregation order (required for the pinned golden)."""
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in init]
    vec = df.select(id_col, vec_col)

    def _assign(cents: list[list[float]]) -> DataFrame:
        cand = vec.select(
            id_col,
            F.posexplode(_centroid_array(cents)).alias("cell", "cen"),
            F.col(vec_col),
        ).select(
            id_col,
            "cell",
            F.aggregate(
                F.zip_with(
                    F.col(vec_col), F.col("cen"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d2"),
        )
        return cand.groupBy(id_col).agg(
            F.min_by("cell", F.struct("d2", "cell")).alias("cell")
        )

    for _ in range(iters):
        assigned = _assign(centroids)
        upd = (
            vec.join(assigned, id_col)
            .select("cell", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
            .collect()
        )
        new: dict[int, dict[int, float]] = {}
        for r in upd:
            new.setdefault(r["cell"], {})[r["dim"]] = r["m"]
        centroids = [
            [new[c][d] for d in sorted(new[c])] if c in new else centroids[c]
            for c in range(k)
        ]
    # final assignment against the POST-update centroids: the stored
    # cell membership and the query-time probe ranking (which sees the
    # returned centroids) must agree, or a vector can live in a cell
    # whose centroid is no longer its nearest — silently costing recall
    # at small n_probe.
    return _assign(centroids), centroids


def build_ivfpq_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    m: int = 16,
    k_codes: int = 32,
    iters: int = 3,
):
    """Train coarse + residual codebooks and encode the corpus.
    Returns (codes, assigned, centroids, codebook) where codes is the
    (id, m, code) frame and assigned the (id, cell) frame — at real
    scale both are written out partitioned/clustered by cell so a
    probe is a partition-pruned scan."""
    assigned, centroids = coarse_kmeans(
        df, vec_col, id_col, k=n_cells, iters=iters
    )
    cen_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "cell int, cen array<double>",
        )
    )
    resid = (
        df.select(id_col, vec_col)
        .join(assigned, id_col)
        .join(cen_df, "cell")
        .select(
            id_col,
            "cell",
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.col("cen"),
                lambda a, b: a - b,
            ).alias("resid"),
        )
    )
    codebook = train_pq(
        resid, vec_col="resid", id_col=id_col, m=m, k=k_codes, iters=iters
    )
    codes = encode_pq(resid, codebook, vec_col="resid", id_col=id_col)
    return codes, assigned, centroids, codebook


def ivfpq_topk(
    df: DataFrame,
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    n_probe: int = 3,
    m: int = 16,
    k_codes: int = 32,
    iters: int = 3,
    n_candidates: int = 50,
    k_out: int = 10,
) -> DataFrame:
    """End-to-end IVF-PQ search: probe → per-cell residual ADC →
    exact re-rank. Returns (id, d2) exact squared-L2 of the final
    top-k, deterministic (d2, id) order."""
    codes, assigned, centroids, codebook = build_ivfpq_index(
        df, vec_col, id_col, n_cells=n_cells, m=m, k_codes=k_codes, iters=iters
    )
    q = [float(x) for x in query]
    # 1. probe selection: k centroid distances, driver-side
    dists = sorted(
        (sum((a - b) * (a - b) for a, b in zip(cen, q)), i)
        for i, cen in enumerate(centroids)
    )
    probes = [i for _, i in dists[:n_probe]]
    # 2. per-probed-cell ADC tables from the query's cell residual
    d_sub = len(codebook[0][0])
    rows = []
    for cell in probes:
        qr = [a - b for a, b in zip(q, centroids[cell])]
        for j in range(m):
            qs = qr[j * d_sub : (j + 1) * d_sub]
            for c, cen in codebook[j].items():
                d2 = sum((a - b) * (a - b) for a, b in zip(qs, cen))
                rows.append((cell, j, c, float(d2)))
    dtable = F.broadcast(
        df.sparkSession.createDataFrame(
            rows, "cell int, m int, code int, d2 double"
        )
    )
    # 3. ADC scoring over probed cells only — at scale `assigned` is the
    # storage partition key, so this join IS the partition prune
    cand = (
        codes.join(assigned.select(id_col, "cell"), id_col)
        .join(dtable, ["cell", "m", "code"])
        .groupBy(id_col)
        .agg(
            F.sum(F.col("d2").cast("decimal(38,12)")).cast("double").alias("adc_d2")
        )
        .orderBy("adc_d2", id_col)
        .limit(n_candidates)
        .select(id_col)
    )
    # 4. exact re-rank of the bounded candidate set
    qarr = F.array(*[F.lit(x) for x in q])
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"), qarr, lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        df.join(F.broadcast(cand), id_col, "semi")
        .select(id_col, F.round(d2, 6).alias("d2"))
        .orderBy("d2", id_col)
        .limit(k_out)
    )
