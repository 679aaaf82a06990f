"""Skew-aware join: key salting.

AQE's skew-join split handles sort-merge skew at runtime, but when one
side is small enough to replicate, salting is the deterministic fix:
explode the small side across `salt` replicas and scatter the large
side's hot keys uniformly. Use for power-law keys (user ids, document
hosts) where a handful of keys would otherwise pin single tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join `large ⋈ small` on column `on`, salted `salt` ways.

    The large side gets a uniform pseudo-random salt per row (hash of
    the full row — deterministic, no rand()); the small side is
    replicated `salt` times. The shuffle key becomes (on, salt), so a
    hot key spreads over `salt` tasks instead of one."""
    lcols = large.columns
    l_salted = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(salt)).cast("int")
    )
    s_rep = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(s_rep, [on, "_salt"], how)
    return out.drop("_salt")
