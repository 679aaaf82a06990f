"""Bloom-style semi-join reduction: broadcast hash-bucket pre-filter.

Spark's runtime row-level filtering (``spark.sql.optimizer.runtime.
bloomFilter.enabled``) injects this automatically for some shapes, but
only when the optimizer both sees the selective side and estimates it
small enough; this operator is the explicit, composable form for the
100 TB case the optimizer misses — a build side too big to BROADCAST
as rows (millions of keys) whose *key fingerprint* still fits in a few
MB. The fact side is pruned before its shuffle, which is where the
money is: a 10× selective filter removes 10× of the shuffle write,
network, and sort on the expensive side of the join.

Mechanics: hash every build-side key into one of ``num_buckets``
buckets (xxhash64 → pmod, JVM-side codegen), DISTINCT the buckets
(bounded by ``num_buckets`` regardless of build-side row count, so the
broadcast is capped at a few MB), and LEFT SEMI join the fact on
bucket membership. Exactly a one-hash Bloom filter: false positives at
rate ≈ |keys|/num_buckets, never false negatives — the exact join
downstream removes the false positives, so composing
``prefiltered ⋈ build`` is result-identical to the plain join (the
property the oracle checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_bucket_prefilter(
    fact: DataFrame,
    fact_key: str,
    build: DataFrame,
    build_key: str,
    num_buckets: int = 1 << 20,
) -> DataFrame:
    """Return ``fact`` reduced to rows whose key *may* appear in
    ``build[build_key]`` (no false negatives). The bucket set is at
    most ``num_buckets`` ints (8 MB at the default) however large the
    build side is; both hash computations stay inside whole-stage
    codegen and the semi join broadcasts."""
    buckets = (
        build.select(
            F.pmod(F.xxhash64(F.col(build_key)), F.lit(num_buckets)).alias("__bucket")
        )
        .distinct()
    )
    return fact.join(
        F.broadcast(buckets),
        F.pmod(F.xxhash64(F.col(fact_key)), F.lit(num_buckets)) == F.col("__bucket"),
        "left_semi",
    )
