"""Entity resolution: blocked fuzzy self-join (record linkage).

The classic dedup-across-records primitive a catalog/CRM pipeline runs
at scale: candidate pairs come ONLY from equi-join blocks (never an
all-pairs cross join), then an edit-distance scorer keeps plausible
matches. With a sane blocking key the candidate count is
sum_b |block_b|^2 — linear-ish in the table for bounded blocks — and
the block equi-join is an ordinary shuffle join Catalyst can plan
(AQE skew-splits a hot block). A ``max_block`` guard drops
pathological blocks (the "Smith" problem) instead of letting one key
quadratically dominate the stage, mirroring the df-cap discipline of
``operators/dedup.py``.

Scoring uses ``F.levenshtein`` (JVM codegen, no Python) and is
portable to DuckDB's ``levenshtein`` for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_fuzzy_pairs"]


def blocked_fuzzy_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str,
    text_col: str,
    max_dist: int,
    max_block: int | None = None,
) -> DataFrame:
    """Unordered candidate pairs (id_a < id_b) within each block whose
    ``text_col`` Levenshtein distance is ≤ ``max_dist``.

    Columns: ``id_a, id_b, dist, sim`` where
    ``sim = 1 − dist / max(len_a, len_b)`` rounded to 6.

    ``max_block`` (optional) removes blocks larger than the cap before
    pairing — a skew guard for degenerate blocking keys; dropped blocks
    are the caller's signal to choose a finer key, not silently
    truncated pair lists (the whole block leaves, so the output is
    still exactly "all pairs over the surviving blocks").
    """
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
    )
    if max_block is not None:
        big = (
            base.groupBy(*block_cols)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_block)
            .select(*block_cols)
        )
        base = base.join(F.broadcast(big), block_cols, "left_anti")
    a = base.alias("a")
    b = base.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    on.append(F.col("a._id") < F.col("b._id"))
    dist = F.levenshtein(F.col("a._txt"), F.col("b._txt"))
    return (
        a.join(b, on)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            dist.alias("dist"),
            F.greatest(F.length("a._txt"), F.length("b._txt")).alias("_lmax"),
        )
        .filter(F.col("dist") <= max_dist)
        .select(
            "id_a",
            "id_b",
            F.col("dist").cast("bigint").alias("dist"),
            F.round(1 - F.col("dist") / F.col("_lmax").cast("double"), 6).alias("sim"),
        )
    )
