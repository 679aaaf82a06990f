"""Declarative Lloyd's k-means over an array<float> embedding column.

The MLlib KMeans behind the IVF index (mllib_lsh.py) is a black box;
this is the same algorithm expressed as DataFrame operations so the
plan is inspectable and every pass is the shape a 100 TB run needs:

- assignment: explode k candidate centroids per row (k is small),
  squared-L2 via zip_with/aggregate (JVM codegen, no Python), argmin
  with min_by — one narrow pass, no shuffle;
- update: posexplode to (cluster, dim, x) and per-(cluster, dim) mean
  — ONE shuffle of k·p aggregation cells with map-side partials;
  the driver receives k·p floats per iteration, never vectors.

Iteration count is fixed (classic Lloyd's power-style convergence);
init is the k lowest-id vectors, so the whole run is deterministic on
fixed data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(df: DataFrame, centroids: list[list[float]], vec_col: str, id_col: str) -> DataFrame:
    carr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    cand = df.select(
        id_col,
        vec_col,
        F.posexplode(carr).alias("cluster", "cen"),
    ).select(
        id_col,
        "cluster",
        F.aggregate(
            F.zip_with(
                F.col(vec_col), F.col("cen"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("d2"),
    )
    # min_by with a (d2, cluster) struct: deterministic tiebreak on the
    # lower cluster id when two centroids are exactly equidistant
    return cand.groupBy(id_col).agg(
        F.min_by("cluster", F.struct("d2", "cluster")).alias("cluster")
    )


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations; returns (id, cluster)
    assignments. Deterministic: init = the k lowest-id vectors."""
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(x) for x in r[0]] for r in init]
    vec = df.select(id_col, vec_col)
    assigned = None
    for _ in range(iters):
        assigned = _assign(vec, centroids, vec_col, id_col)
        upd = (
            vec.join(assigned, id_col)
            .select("cluster", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = {}
        for r in upd:
            new.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        centroids = [
            [new[c][d] for d in sorted(new[c])] if c in new else centroids[c]
            for c in range(k)
        ]
    return assigned
