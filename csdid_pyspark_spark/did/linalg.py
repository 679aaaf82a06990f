"""Gram-matrix aggregation machinery.

Every regression/logit the estimator needs is a p×p problem with tiny
p (intercept + covariates). We therefore never materialize design
matrices: each fit is ONE ``groupBy(cid)`` aggregation producing the
p(p+1)/2 + p Gram sums per cell, followed by an O(p³) solve on the
driver for every cell at once. This replaces the reference's
collect-to-NumPy pattern (reference ATTgt.py:346-351, utils.py:20-34)
with aggregation-only data movement: O(|cells|·p²) scalars leave the
executors regardless of data size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, StructField, StructType


def gram_aggs(prefix: str, weight: Column, xcols: list[str], ycol: Column | None) -> list[Column]:
    """sum(w·x_i·x_j) for i<=j (+ sum(w·x_i·y) when y given)."""
    p = len(xcols)
    aggs = []
    for i in range(p):
        for j in range(i, p):
            aggs.append(
                F.sum(weight * F.col(xcols[i]) * F.col(xcols[j])).alias(f"{prefix}_g_{i}_{j}")
            )
    if ycol is not None:
        for i in range(p):
            aggs.append(F.sum(weight * F.col(xcols[i]) * ycol).alias(f"{prefix}_b_{i}"))
    return aggs


def vec_aggs(prefix: str, weight: Column, xcols: list[str]) -> list[Column]:
    """sum(w·x_i) per covariate."""
    return [F.sum(weight * F.col(xcols[i])).alias(f"{prefix}_{i}") for i in range(len(xcols))]


def unpack_gram(row, prefix: str, p: int) -> tuple[np.ndarray, np.ndarray | None]:
    Gm = np.zeros((p, p))
    for i in range(p):
        for j in range(i, p):
            v = row[f"{prefix}_g_{i}_{j}"]
            Gm[i, j] = Gm[j, i] = v if v is not None else 0.0
    b = None
    if f"{prefix}_b_0" in row.__fields__:
        b = np.array([row[f"{prefix}_b_{i}"] or 0.0 for i in range(p)])
    return Gm, b


def unpack_vec(row, prefix: str, p: int) -> np.ndarray:
    return np.array([row[f"{prefix}_{i}"] or 0.0 for i in range(p)])


def dot(xcols: list[str], vec_col: str) -> Column:
    """x·v where v is a per-cell array<double> column (1-based element_at)."""
    expr = F.element_at(vec_col, 1) * F.col(xcols[0])
    for i in range(1, len(xcols)):
        expr = expr + F.element_at(vec_col, i + 1) * F.col(xcols[i])
    return expr


def consts_df(
    spark: SparkSession,
    per_cell: dict[int, dict[str, float | list[float]]],
    scalar_names: list[str],
    vector_names: list[str],
) -> DataFrame:
    """Tiny per-cell constants table (broadcast-joined back on cid)."""
    fields = [StructField("cid", IntegerType(), False)]
    fields += [StructField(s, DoubleType(), True) for s in scalar_names]
    fields += [StructField(v, ArrayType(DoubleType()), True) for v in vector_names]
    rows = []
    for cid, d in per_cell.items():
        rows.append(
            (
                cid,
                *[float(d[s]) for s in scalar_names],
                *[[float(x) for x in d[v]] for v in vector_names],
            )
        )
    return spark.createDataFrame(rows, StructType(fields))


def sigmoid(col: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-col))


def solve_safe(A: np.ndarray, b: np.ndarray) -> np.ndarray | None:
    try:
        out = np.linalg.solve(A, b)
    except np.linalg.LinAlgError:
        return None
    if not np.all(np.isfinite(out)):
        return None
    return out


def inv_safe(A: np.ndarray) -> np.ndarray | None:
    try:
        out = np.linalg.inv(A)
    except np.linalg.LinAlgError:
        return None
    if not np.all(np.isfinite(out)):
        return None
    return out


def irls_logit(
    cell_df: DataFrame,
    xcols: list[str],
    spark: SparkSession,
    active_cids: list[int],
    max_iter: int = 25,
    tol: float = 1e-8,
    init: dict[int, np.ndarray] | None = None,
) -> dict[int, np.ndarray | None]:
    """Weighted logistic regression of d on X per cell, all cells
    simultaneously: each IRLS iteration is one aggregation pass over the
    (cached) cell table; the p×p solves happen on the driver. Converged
    cells leave the broadcast join, so late iterations aggregate only
    the stragglers.

    ``init`` warm-starts the intercept (e.g. logit of the cell's
    treatment share) — the fixed point is unchanged, it just converges
    in fewer full-table passes. tol is a Newton STEP bound: quadratic
    convergence means a step below 1e-8 leaves the iterate within
    ~1e-15 of the fixed point, so kernel parity at 1e-8 is unaffected
    while typical cells need one fewer full-table pass than tol=1e-10.

    Returns per-cell gamma-hat; None where the fit failed/separated OR
    never met tol within max_iter (an unconverged iterate must not be
    silently used as if it were the MLE)."""
    p = len(xcols)
    beta: dict[int, np.ndarray | None] = {
        cid: (init[cid].copy() if init and cid in init else np.zeros(p))
        for cid in active_cids
    }
    active = set(active_cids)
    for _ in range(max_iter):
        if not active:
            break
        bdf = consts_df(
            spark,
            {cid: {"gma": list(beta[cid])} for cid in active if beta[cid] is not None},
            [],
            ["gma"],
        )
        it = cell_df.join(F.broadcast(bdf), "cid")
        eta = dot(xcols, "gma")
        mu = sigmoid(eta)
        s = F.col("w") * mu * (1 - mu)
        z = eta + (F.col("d") - mu) / F.greatest(mu * (1 - mu), F.lit(1e-12))
        stats = it.groupBy("cid").agg(*gram_aggs("h", s, xcols, z)).collect()
        next_active = set()
        for row in stats:
            cid = row["cid"]
            H, r = unpack_gram(row, "h", p)
            new = solve_safe(H, r)
            if new is None:
                beta[cid] = None
                continue
            if np.max(np.abs(new - beta[cid])) > tol:
                next_active.add(cid)
            beta[cid] = new
        active = next_active
    for cid in active:  # still unconverged after max_iter
        beta[cid] = None
    return beta
