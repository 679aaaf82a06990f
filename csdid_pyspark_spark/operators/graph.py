"""General graph propagation operators over edge DataFrames.

Complements the dedup-specific label propagation
(dedup.py::components): PageRank-style score propagation is the
centrality pass a crawl-curation pipeline runs over link / similarity
graphs (rank canonical pages among duplicates, weight hosts by link
structure). Expressed as the classic join-aggregate iteration — each
round is one shuffle keyed by destination node, partial-aggregated
map-side, so a round costs O(|E|) shuffle rows however large the
graph; iteration count is fixed (power iteration), so total cost is
iters × one-join-one-agg with no driver-side per-node state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_undirected(
    pairs: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Power-iteration PageRank over an undirected pair list.

    Each (a,b) contributes both directions. Ranks start uniform at
    1/N; every node in a pair list has degree >= 1, so there is no
    dangling mass. Per round the previous rank vector joins the edge
    list on the source and aggregates by destination — the degree
    table and edge list are built once and persisted; the rank vector
    is re-persisted per round and the predecessor released, keeping
    lineage depth constant (the same discipline as label
    propagation). Returns (node, rank)."""
    # both directions from ONE execution of the pair subtree (the
    # union-of-two-projections form ran it once per branch when the
    # persist materialized — guide §2.4)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("s"), F.col(id_b).alias("d")),
                    F.struct(F.col(id_b).alias("s"), F.col(id_a).alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .persist()
    )
    # degree folded into the edge list ONCE: the per-round loop below
    # otherwise pays the deg groupBy + its |E|-scale join every round
    # (iters extra data-scale shuffles). deg's key set IS the node set
    # (every node in a pair list has degree >= 1), so the node list
    # rides the same aggregation instead of a second distinct over
    # edges.
    deg = edges.groupBy("s").agg(F.count("*").alias("deg")).persist()
    edges_deg = edges.join(deg, "s").persist()
    nodes = deg.select(F.col("s").alias("node")).persist()
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).persist()
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            edges_deg.join(ranks.select(F.col("node").alias("s"), "rank"), "s")
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("c"))
        )
        new = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + damping * F.coalesce(F.col("c"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .persist()
        )
        new.count()  # materialize before releasing the predecessor
        ranks.unpersist()
        ranks = new
    edges_deg.unpersist()
    edges.unpersist()
    deg.unpersist()
    nodes.unpersist()  # the final rank vector is already materialized
    return ranks


def label_propagation(
    pairs: DataFrame,
    iters: int = 4,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan, Albert &
    Kumara 2007) over an undirected pair list — the community-detection
    pass that separates DENSE near-dup cliques from the sparse bridges
    connected components would merge across.

    Labels start as node ids; per round every node adopts the MODE of
    its neighbors' labels, ties broken toward the SMALLEST label. The
    tie-break makes the classic randomized update rule deterministic
    and partition-independent: the vote winner is selected by
    max_by(label, c * 2^62 - label) in EXACT integer arithmetic
    (decimal(38,0) here, HUGEINT in the oracle) — injective for any
    count and any label id below 2^62, i.e. every realistic 64-bit
    document/node id, with no overflow. Fixed iteration count (synchronous LPA can oscillate on
    bipartite structure; a fixed unrolling is reproducible and lets an
    unrolled SQL oracle mirror it exactly).

    Per round: one edge-join + one (node, label) count shuffle + one
    per-node argmax — all map-side combinable, O(|E|) shuffle rows per
    round, constant lineage depth via the persist/release ladder
    (same discipline as :func:`pagerank_undirected`). Returns
    (node, label)."""
    # both directions from ONE execution of the pair subtree (see
    # pagerank_undirected above)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("s"), F.col(id_b).alias("d")),
                    F.struct(F.col(id_b).alias("s"), F.col(id_a).alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .persist()
    )
    labels = edges.select(F.col("d").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).persist()
    for _ in range(iters):
        votes = (
            edges.join(labels.select(F.col("node").alias("s"), "label"), "s")
            .groupBy(F.col("d").alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        new = (
            votes.groupBy("node")
            .agg(
                F.max_by(
                    "label",
                    F.col("c").cast("decimal(38,0)") * F.lit(2**62)
                    - F.col("label"),
                ).alias("label")
            )
            .persist()
        )
        new.count()  # materialize before releasing the predecessor
        labels.unpersist()
        labels = new
    edges.unpersist()
    return labels
