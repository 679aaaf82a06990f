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

__all__ = ["blocked_fuzzy_pairs", "agreement_patterns", "fellegi_sunter_em"]


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


def agreement_patterns(
    df: DataFrame,
    block_cols: list[str],
    id_col: str,
    compare_cols: list[str],
    max_block: int | None = None,
) -> DataFrame:
    """Fellegi-Sunter step 1, the only data-scale part: candidate
    pairs from equi-join blocks (never an all-pairs cross join), each
    reduced to its binary agreement pattern over ``compare_cols``, and
    aggregated to AT MOST 2^k pattern-count rows — the sufficient
    statistic the EM mixture fit needs. Output: one row per observed
    pattern with ``pattern`` (bitmask, bit j = agreement on
    compare_cols[j]), per-field ``a{j}`` 0/1 columns, and ``n_pairs``.

    The groupBy key space is 2^k (k = len(compare_cols), single
    digits), so the aggregation is map-side-combinable down to a
    handful of rows no matter how many candidate pairs the blocks
    produce.

    NULL semantics (deliberate asymmetry): block keys use plain
    null-REJECTING equality, so a record with a NULL in any
    ``block_cols`` enters no block and contributes zero candidate
    pairs — standard blocking behavior (a NULL key identifies no
    block; pairing all NULL-keyed records against each other would be
    an accidental cross join). ``compare_cols`` use ``eqNullSafe``
    (NULL == NULL counts as agreement) because a comparison field
    missing on BOTH records is evidence-neutral-to-weakly-positive
    and must not poison the pattern. Callers needing coverage
    accounting should count ``df.filter(any block col isNull)``
    upstream; linkage coverage excludes those records."""
    if not compare_cols or len(compare_cols) > 16:
        raise ValueError(
            f"fellegi_sunter: need 1..16 compare columns, got "
            f"{len(compare_cols)}"
        )
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("_id"),
        *[F.col(c).alias(f"_c{j}") for j, c in enumerate(compare_cols)],
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
    k = len(compare_cols)
    agree = [
        F.col(f"a._c{j}").eqNullSafe(F.col(f"b._c{j}")).cast("int").alias(f"a{j}")
        for j in range(k)
    ]
    pat = sum(F.col(f"a{j}") * (1 << j) for j in range(k))
    return (
        a.join(b, on)
        .select(*agree)
        .groupBy(*[f"a{j}" for j in range(k)])
        .agg(F.count("*").alias("n_pairs"))
        .select(
            pat.cast("int").alias("pattern"),
            *[f"a{j}" for j in range(k)],
            "n_pairs",
        )
    )


def fellegi_sunter_em(
    patterns: list[tuple[tuple[int, ...], int]],
    m0: float = 0.9,
    u0: float = 0.1,
    pi0: float = 0.1,
    iters: int = 100,
) -> dict:
    """Fellegi-Sunter (1969) latent two-class mixture fitted with EM
    (Winkler 1988) on agreement-pattern COUNTS — pure driver algebra
    over <= 2^k rows, zero Spark jobs, deterministic (fixed init,
    fixed iteration count).

    ``patterns``: [(agreement tuple, count), ...].
    Returns {"m": [..], "u": [..], "pi": p,
             "posterior": {pattern tuple: P(match | pattern)},
             "weight": {pattern tuple: log2 likelihood-ratio weight}}.
    """
    import math

    if not patterns:
        raise ValueError("fellegi_sunter: no candidate pairs")
    if len(patterns) < 2:
        raise ValueError(
            "fellegi_sunter: EM collapsed — a single observed agreement "
            "pattern carries no two-class structure to fit"
        )
    k = len(patterns[0][0])
    m = [m0] * k
    u = [u0] * k
    pi = pi0
    for _ in range(iters):
        # E-step: responsibility per pattern
        resp = {}
        for gam, n in patterns:
            pm = pi
            pu = 1.0 - pi
            for j in range(k):
                pm *= m[j] if gam[j] else 1.0 - m[j]
                pu *= u[j] if gam[j] else 1.0 - u[j]
            resp[gam] = pm / (pm + pu) if pm + pu > 0 else 0.0
        # M-step
        tot = sum(n for _, n in patterns)
        wm = sum(resp[gam] * n for gam, n in patterns)
        wu = tot - wm
        if wm <= 0.0 or wu <= 0.0:
            raise ValueError(
                "fellegi_sunter: EM collapsed to a single class — the "
                "pattern counts carry no two-class structure"
            )
        m = [
            sum(resp[gam] * n * gam[j] for gam, n in patterns) / wm
            for j in range(k)
        ]
        u = [
            sum((1.0 - resp[gam]) * n * gam[j] for gam, n in patterns) / wu
            for j in range(k)
        ]
        # clamp away from 0/1 so weights stay finite (standard guard)
        m = [min(max(x, 1e-9), 1.0 - 1e-9) for x in m]
        u = [min(max(x, 1e-9), 1.0 - 1e-9) for x in u]
        pi = wm / tot
    weight = {}
    posterior = {}
    for gam, _ in patterns:
        w = 0.0
        pm = pi
        pu = 1.0 - pi
        for j in range(k):
            if gam[j]:
                w += math.log2(m[j] / u[j])
                pm *= m[j]
                pu *= u[j]
            else:
                w += math.log2((1.0 - m[j]) / (1.0 - u[j]))
                pm *= 1.0 - m[j]
                pu *= 1.0 - u[j]
        weight[gam] = w
        posterior[gam] = pm / (pm + pu)
    return {"m": m, "u": u, "pi": pi, "posterior": posterior, "weight": weight}
