"""Sequence packing for training-data pipelines.

Packing concatenates tokenized documents into fixed-size context
windows ("bins") of ``budget`` tokens. Two standard disciplines:

* **Split-allowed packing** (`packed_offsets`): documents form one
  contiguous token stream per source (deterministic order); a document
  starting at global offset ``s`` with length ``L`` occupies bins
  ``floor(s/B) .. floor((s+L-1)/B)``. Zero waste, documents may span a
  bin boundary. The core primitive is an **exclusive prefix sum** over
  an ordered stream — an operation Spark has no built-in for at scale:
  a naive ``Window.partitionBy(source)`` funnels each source through a
  single reducer, so a dominant source (common in web corpora) becomes
  a straggler at 100 TB. `packed_offsets` implements the classic
  two-phase distributed scan instead:

    1. range-repartition + sort by the stream key (the only shuffle);
    2. one light pass computes per-(partition, stream) token totals —
       O(partitions × streams) rows to the driver, AQE-stats-sized;
    3. exclusive per-stream partition base offsets go back as a
       broadcast join, and an Arrow-batched ``mapInPandas`` adds the
       within-partition running sum (sequential per partition, all
       partitions in parallel — no per-stream reducer anywhere).

  `packed_offsets_window` is the declarative single-window variant —
  same result, fine when no stream is huge; it doubles as the oracle
  semantics (a SQL window cumsum).

* **Greedy next-fit packing** (`pack_greedy`): documents are never
  split; the current bin is closed whenever the next document would
  overflow it. Inherently sequential per stream (the bin id of row i
  depends on a running fill with resets — not window-expressible), so
  it runs as ``applyInPandas`` per source: Arrow-batched, O(n) per
  stream, parallel across streams. For a corpus where one stream is
  too big for a single task, salt the stream into sub-streams first
  (exact stream order is rarely semantically required for packing).

The reference engine has no packing surface (csdids/*.py is an
estimator); this is part of the LLM-pipeline extension inventory.
"""

from __future__ import annotations

from decimal import Decimal
from typing import Iterator, NamedTuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "packed_offsets",
    "packed_offsets_window",
    "pack_greedy",
    "global_row_number",
    "global_rank_cumsum",
    "RankCumsum",
    "grouped_rank",
    "GroupedRanks",
    "release_cache",
    "cache_scope",
]


# Cache lifecycle is shared engine-wide (dedup's postings persists use
# the same attach/release protocol): csdid_pyspark_spark/cache.py owns
# it; these re-exports keep the established packing.* call sites.
from csdid_pyspark_spark.cache import (  # noqa: E402
    attach_cache as _attach_cache,
    cache_scope,
    release_cache,
)


def _pin_input(df: DataFrame) -> tuple[DataFrame, bool]:
    """``repartitionByRange`` SAMPLES its child to pick range boundaries
    — one full execution of the input lineage — and then executes the
    child AGAIN for the shuffle map stage, so every two-phase scan was
    paying its input aggregation twice (guide §1.1 first-principles
    pass count; visible as a duplicated subtree of jobs in the event
    log). Pin the input in cache for the duration of the materializing
    action so the lineage runs once: the sampling job fills the cache,
    the map stage reads it, and the caller unpersists right after the
    stats collect (the range-partitioned frame is itself cached by
    then, so the input pin has nothing left to serve). No-op when the
    caller already persisted the input (unpersisting here would drop
    the caller's cache)."""
    lvl = df.storageLevel
    if lvl.useMemory or lvl.useDisk:
        return df, False
    return df.persist(), True


def _ordered(df: DataFrame, len_col: str, stream_col: str, id_col: str) -> DataFrame:
    """Deterministic stream order: content-addressed (md5 of the id)
    so packing is independent of ingest order, with the id itself as
    the tiebreak."""
    return df.select(
        F.col(id_col),
        F.col(stream_col),
        F.col(len_col).cast("bigint").alias("tok_len"),
        F.md5(F.col(id_col).cast("string")).alias("_ord"),
    )


def packed_offsets_window(
    df: DataFrame, len_col: str, stream_col: str = "source", id_col: str = "doc_id", budget: int = 2048
) -> DataFrame:
    """Single-window exclusive prefix sum per stream (declarative
    variant; one reducer per stream — use `packed_offsets` when a
    stream can be huge)."""
    w = (
        Window.partitionBy(stream_col)
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _finish(
        _ordered(df, len_col, stream_col, id_col).withColumn(
            "start_offset", F.sum("tok_len").over(w) - F.col("tok_len")
        ),
        stream_col,
        id_col,
        budget,
    )


def packed_offsets(
    df: DataFrame,
    len_col: str,
    stream_col: str = "source",
    id_col: str = "doc_id",
    budget: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-phase distributed scan: exclusive per-stream token offsets
    without a per-stream reducer. Exactly equals
    `packed_offsets_window` (tested), but the heavy pass is
    partition-parallel regardless of stream skew."""
    o, own_pin = _pin_input(_ordered(df, len_col, stream_col, id_col))
    n = num_partitions or o.sparkSession.sparkContext.defaultParallelism
    # The only full-data shuffle: range partition by the total order so
    # each partition holds a contiguous slice of every stream it sees.
    part = o.repartitionByRange(n, "_ord", id_col).sortWithinPartitions("_ord", id_col)
    part = part.withColumn("_pid", F.spark_partition_id())
    # Persist is CORRECTNESS, not just perf: repartitionByRange samples
    # range boundaries per execution, and the per-partition base offsets
    # below are valid only for the boundaries of THIS execution. Both
    # passes must read the same materialized partitioning.
    part = part.persist()
    # Light pass: per-(partition, stream) totals — tiny (P × streams).
    totals = part.groupBy("_pid", stream_col).agg(F.sum("tok_len").alias("_tot")).collect()
    if own_pin:
        o.unpersist()
    base: dict[tuple[int, str], int] = {}
    acc: dict[str, int] = {}
    for row in sorted(totals, key=lambda r: r["_pid"]):
        key = row[stream_col]
        base[(row["_pid"], key)] = acc.get(key, 0)
        acc[key] = acc.get(key, 0) + row["_tot"]
    spark = df.sparkSession
    base_df = F.broadcast(
        spark.createDataFrame(
            [(p, s, b) for (p, s), b in base.items()],
            schema=f"_pid int, {stream_col} string, _base bigint",
        )
    )
    schema = f"{id_col} bigint, {stream_col} string, tok_len bigint, _ord string, _pid int, _base bigint, start_offset bigint"

    def add_running(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One partition = one sorted slice; running per-stream sums
        # carry across Arrow batches.
        running: dict[str, int] = {}
        for pdf in batches:
            starts = []
            for s, ln, b in zip(pdf[stream_col], pdf["tok_len"], pdf["_base"]):
                cur = running.get(s, 0)
                starts.append(int(b) + cur)
                running[s] = cur + int(ln)
            pdf = pdf.assign(start_offset=pd.Series(starts, index=pdf.index, dtype="int64"))
            yield pdf

    with_base = part.join(base_df, ["_pid", stream_col])
    # mapInPandas preserves partitioning/order of its child; re-sort
    # within partitions after the broadcast join to be explicit.
    offs = with_base.sortWithinPartitions("_ord", id_col).mapInPandas(add_running, schema=schema)
    return _attach_cache(_finish(offs, stream_col, id_col, budget), part)


def _finish(offs: DataFrame, stream_col: str, id_col: str, budget: int) -> DataFrame:
    b = F.lit(int(budget)).cast("bigint")
    return offs.select(
        F.col(id_col),
        F.col(stream_col),
        F.col("tok_len").cast("int").alias("tok_len"),
        F.col("start_offset"),
        F.floor(F.col("start_offset") / b).cast("bigint").alias("first_bin"),
        (F.floor((F.col("start_offset") + F.col("tok_len") - 1) / b) - F.floor(F.col("start_offset") / b) + 1)
        .cast("int")
        .alias("n_bins"),
    )


def pack_greedy(
    df: DataFrame, len_col: str, stream_col: str = "source", id_col: str = "doc_id", budget: int = 2048
) -> DataFrame:
    """Greedy next-fit bin assignment per stream (documents never
    split; close the bin when the next document would overflow).
    Deterministic given the content-addressed order."""
    o = _ordered(df, len_col, stream_col, id_col)
    schema = f"{id_col} bigint, {stream_col} string, tok_len int, bin bigint, bin_fill bigint"

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ord", id_col]).reset_index(drop=True)
        bins, fills = [], []
        bin_id, fill = 0, 0
        for ln in pdf["tok_len"]:
            ln = int(ln)
            if fill > 0 and fill + ln > budget:
                bin_id += 1
                fill = 0
            fill += ln
            bins.append(bin_id)
            fills.append(fill)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].astype("int64"),
                stream_col: pdf[stream_col],
                "tok_len": pdf["tok_len"].astype("int32"),
                "bin": pd.Series(bins, dtype="int64"),
                "bin_fill": pd.Series(fills, dtype="int64"),
            }
        )

    return o.groupBy(stream_col).applyInPandas(assign, schema=schema)


def global_row_number(
    df: DataFrame, order_cols: list[str], out_col: str = "rn", num_partitions: int | None = None
) -> DataFrame:
    """Global 1-based row numbers in ``order_cols`` order WITHOUT the
    classic scale trap (``Window.orderBy`` with no partition key =
    every row through ONE reducer). Same two-phase scan as
    `packed_offsets`: range-shuffle on the order key, per-partition
    counts to the driver (one tiny row per partition), exclusive bases
    broadcast back, sequential numbering within partitions. Ties are
    broken by the order columns themselves — pass a unique tiebreak
    column for fully deterministic output."""
    o, own_pin = _pin_input(df)
    n = num_partitions or o.sparkSession.sparkContext.defaultParallelism
    part = (
        o.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    # correctness: both passes must see one materialized partitioning
    # (range boundaries are sampled per execution — see packed_offsets)
    part = part.persist()
    counts = {r["_pid"]: r["c"] for r in part.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    if own_pin:
        o.unpersist()
    base, acc = {}, 0
    for pid in sorted(counts):
        base[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    base_df = F.broadcast(
        spark.createDataFrame([(p, b) for p, b in base.items()], "_pid int, _base bigint")
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return _attach_cache(
        part.join(base_df, "_pid")
        .withColumn(out_col, (F.row_number().over(w) + F.col("_base")).cast("bigint"))
        .drop("_pid", "_base"),
        part,
    )


class RankCumsum(NamedTuple):
    """Result of :func:`global_rank_cumsum`: the ranked DataFrame plus
    the grand totals the light pass already computed (row count and
    exact decimal sum of ``val_col``). Totals travel EXPLICITLY — an
    earlier revision smuggled them as a monkey-patched attribute on the
    DataFrame, which silently vanished on any select/filter/orderBy of
    the result. Pass ``df`` (not this tuple) to release_cache /
    cache_scope when done."""

    df: DataFrame
    total_count: int
    total_sum: Decimal


def global_rank_cumsum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    rank_col: str = "rn",
    cum_col: str = "cum",
    num_partitions: int | None = None,
    val_type: str = "decimal(30,6)",
) -> RankCumsum:
    """Global rank AND inclusive running total of ``val_col`` in
    ``order_cols`` order — the Pareto/Lorenz-curve primitive ("how many
    top entities cover X% of mass", nucleus-style corpus budget cuts) —
    via the same two-phase scan as :func:`global_row_number`: range
    shuffle on the order key, ONE light pass collects per-partition
    (count, decimal sum) — one tiny row per partition — exclusive bases
    broadcast back, then partition-local windows. No row ever passes
    through a single reducer. ``val_col`` is accumulated as
    DECIMAL(30,6) so the running total is independent of partial-sum
    order. Pass a unique tiebreak in ``order_cols`` for deterministic
    output; descending orders: pre-negate into a column. Returns a
    :class:`RankCumsum` — the ranked DataFrame plus (row count, exact
    decimal grand total) from the same light pass, so Pareto-style
    consumers never re-scan the input lineage for totals.

    ``val_type`` sets the accumulation decimal (default
    ``decimal(30,6)`` — counts/amounts); log-space accumulators pass
    ``decimal(38,18)`` so prefix sums keep full double precision."""
    o, own_pin = _pin_input(df.withColumn("_v", F.col(val_col).cast(val_type)))
    n = num_partitions or o.sparkSession.sparkContext.defaultParallelism
    part = (
        o.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    part = part.persist()
    stats = {
        r["_pid"]: (r["c"], r["s"])
        for r in part.groupBy("_pid")
        .agg(F.count("*").alias("c"), F.sum("_v").alias("s"))
        .collect()
    }
    if own_pin:
        o.unpersist()
    bases, c_acc, s_acc = [], 0, Decimal(0)
    for pid in sorted(stats):
        bases.append((pid, c_acc, s_acc))
        c_acc += stats[pid][0]
        s_acc += stats[pid][1] or Decimal(0)
    spark = df.sparkSession
    base_df = F.broadcast(
        spark.createDataFrame(bases, f"_pid int, _cbase bigint, _sbase {val_type}")
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = _attach_cache(
        part.join(base_df, "_pid")
        .withColumn(rank_col, (F.row_number().over(w) + F.col("_cbase")).cast("bigint"))
        .withColumn(
            cum_col,
            (F.sum("_v").over(wsum) + F.col("_sbase")).cast(val_type),
        )
        .drop("_pid", "_cbase", "_sbase", "_v"),
        part,
    )
    return RankCumsum(out, c_acc, s_acc)


class MultiCumsum(NamedTuple):
    """Result of :func:`global_cumsums`: the ranked DataFrame plus the
    exact per-measure grand totals the light pass already computed.
    Pass ``df`` (not this tuple) to release_cache / cache_scope."""

    df: DataFrame
    total_count: int
    totals: dict  # val_col -> Decimal grand total


def global_cumsums(
    df: DataFrame,
    order_cols: list[str],
    val_cols: list[str],
    rank_col: str = "rn",
    cum_prefix: str = "cum_",
    num_partitions: int | None = None,
) -> MultiCumsum:
    """Global rank plus inclusive running totals of SEVERAL measures in
    ``order_cols`` order, in one job — the multi-measure sibling of
    :func:`global_rank_cumsum` (which scans one measure). The
    two-sample ECDF primitive: a KS statistic needs cum(count_a) and
    cum(count_b) over the same pooled value order, and running the
    single-measure scan twice would pay the range shuffle + light pass
    twice. Same discipline: ONE range shuffle on the order key, one
    light pass collecting per-partition (count, sum per measure) — a
    tiny row per partition — exclusive bases broadcast back, then
    partition-local windows. No row ever passes through a single
    reducer; measures accumulate as DECIMAL(30,6) so running totals
    are independent of partial-sum order. Pass a unique tiebreak in
    ``order_cols`` for deterministic output."""
    o = df
    for v in val_cols:
        o = o.withColumn(f"_v_{v}", F.col(v).cast("decimal(30,6)"))
    o, own_pin = _pin_input(o)
    n = num_partitions or o.sparkSession.sparkContext.defaultParallelism
    part = (
        o.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    part = part.persist()
    aggs = [F.count("*").alias("_c")] + [
        F.sum(f"_v_{v}").alias(f"_s_{v}") for v in val_cols
    ]
    stats = {r["_pid"]: r for r in part.groupBy("_pid").agg(*aggs).collect()}
    if own_pin:
        o.unpersist()
    bases, c_acc = [], 0
    s_acc = {v: Decimal(0) for v in val_cols}
    for pid in sorted(stats):
        bases.append((pid, c_acc, *[s_acc[v] for v in val_cols]))
        c_acc += stats[pid]["_c"]
        for v in val_cols:
            s_acc[v] += stats[pid][f"_s_{v}"] or Decimal(0)
    spark = df.sparkSession
    base_schema = "_pid int, _cbase bigint, " + ", ".join(
        f"_sbase_{v} decimal(30,6)" for v in val_cols
    )
    base_df = F.broadcast(spark.createDataFrame(bases, base_schema))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = part.join(base_df, "_pid").withColumn(
        rank_col, (F.row_number().over(w) + F.col("_cbase")).cast("bigint")
    )
    drop = ["_pid", "_cbase"]
    for v in val_cols:
        out = out.withColumn(
            f"{cum_prefix}{v}",
            (F.sum(f"_v_{v}").over(wsum) + F.col(f"_sbase_{v}")).cast(
                "decimal(30,6)"
            ),
        )
        drop += [f"_v_{v}", f"_sbase_{v}"]
    return MultiCumsum(_attach_cache(out.drop(*drop), part), c_acc, s_acc)


class GroupedRanks(NamedTuple):
    df: DataFrame          # input + rank_col (1-based within each group)
    group_counts: dict     # group key tuple -> row count
    group_sums: dict | None = None  # group key tuple -> sum_col total (Decimal)


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    rank_col: str = "rn",
    num_partitions: int | None = None,
    sum_col: str | None = None,
) -> GroupedRanks:
    """Per-GROUP global ranks for several distributions in ONE job —
    the multi-distribution companion to :func:`global_row_number`.
    ``Window.partitionBy(group)`` puts each whole group through one
    task (the skew trap when groups are data-scale); running
    :func:`global_row_number` once per group pays one range-shuffle +
    stats job each. Here the range shuffle runs ONCE over
    ``(group_cols + order_cols)`` — each group's rows are contiguous
    across the range partitioning — and one light pass collects
    (partition, group) counts, so exclusive bases broadcast back per
    (partition, group) and every group is ranked by partition-local
    windows in the same stage. Returns the per-group totals from the
    same light pass (the order-statistic consumers always need n).

    Pass a unique tiebreak in ``order_cols`` for deterministic
    output.

    With ``sum_col`` the same light pass also carries per-(partition,
    group) sums of that measure, and the output gains
    ``cum_<sum_col>`` — the per-group INCLUSIVE cumulative sum in
    order — plus per-group totals in ``group_sums``. The measure is
    widened to DECIMAL(38,6) so the cumsum is exact and independent of
    partial-aggregation order (pass integer-valued or
    already-rounded-to-6dp measures)."""
    keys = list(group_cols)
    o, own_pin = _pin_input(df)
    n = num_partitions or o.sparkSession.sparkContext.defaultParallelism
    part = (
        o.repartitionByRange(n, *keys, *order_cols)
        .sortWithinPartitions(*keys, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    part = part.persist()
    aggs = [F.count("*").alias("c")]
    if sum_col is not None:
        aggs.append(
            F.sum(F.col(sum_col).cast("decimal(38,6)")).alias("s")
        )
    stats = part.groupBy("_pid", *keys).agg(*aggs).collect()
    if own_pin:
        o.unpersist()
    # exclusive base per (pid, group): rows of the SAME group in lower pids
    from decimal import Decimal

    per_group: dict = {}
    per_group_sum: dict = {}
    bases = []
    for r in sorted(stats, key=lambda r: (tuple(r[k] for k in keys), r["_pid"])):
        gk = tuple(r[k] for k in keys)
        acc = per_group.get(gk, 0)
        if sum_col is not None:
            sacc = per_group_sum.get(gk, Decimal(0))
            bases.append((r["_pid"], *gk, acc, sacc))
            per_group_sum[gk] = sacc + (r["s"] or Decimal(0))
        else:
            bases.append((r["_pid"], *gk, acc))
        per_group[gk] = acc + r["c"]
    spark = df.sparkSession
    key_schema = ", ".join(f"{k} {t}" for k, t in df.select(*keys).dtypes)
    base_schema = f"_pid int, {key_schema}, _base bigint"
    if sum_col is not None:
        base_schema += ", _bsum decimal(38,6)"
    base_df = F.broadcast(spark.createDataFrame(bases, base_schema))
    w = Window.partitionBy("_pid", *keys).orderBy(*order_cols)
    joined = part.join(base_df, ["_pid", *keys]).withColumn(
        rank_col, (F.row_number().over(w) + F.col("_base")).cast("bigint")
    )
    if sum_col is not None:
        wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        # coalesce: an all-NULL measure prefix in a partition slice
        # must still carry the prior partitions' base, not NULL it out
        joined = joined.withColumn(
            f"cum_{sum_col}",
            F.coalesce(
                F.sum(F.col(sum_col).cast("decimal(38,6)")).over(wrows),
                F.lit(0).cast("decimal(38,6)"),
            )
            + F.col("_bsum"),
        )
    out = _attach_cache(joined.drop("_pid", "_base", "_bsum"), part)
    return GroupedRanks(out, per_group, per_group_sum if sum_col is not None else None)
