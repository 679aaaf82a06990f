"""Structured Streaming operators over the events stream.

The reference has no streaming surface (SURVEY.md §2.7); this module is
part of the engine's scale extension: the same tumbling-window rollup
the batch path runs (operators/sessionize.py) expressed as a streaming
query with watermarked late-data handling, plus a custom stateful
sessionizer built on ``applyInPandasWithState`` — the PySpark pattern
for operators Spark lacks natively.

Tests drive these with ``trigger(availableNow=True)`` against the
parquet testdata, which exercises the exact operators a live Kafka/file
stream would run.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# events.parquet has shipped as TIMESTAMP(NANOS) (read as raw nanos via
# the legacy conf) and as tz-naive TIMESTAMP(MICROS) (read as
# TIMESTAMP_NTZ); the streaming source must declare a schema up front,
# so we probe the footer with a zero-row batch read and mirror whichever
# physical type the file actually has. Both normalize to the same plain
# TIMESTAMP as the batch source (sources/tables.py).


def _raw_ts_type(spark: SparkSession, sf_dir: str):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (one-file directory
    glob). In production this is a Kafka/file-drop source; the operator
    graph downstream is identical."""
    ts_type = _raw_ts_type(spark, sf_dir)
    schema = StructType(
        [f if f.name != "ts" else StructField("ts", ts_type) for f in EVENT_SCHEMA]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(ts_type, LongType):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Wall-clock-as-UTC normalization: the session zone is pinned UTC
    # (sources/tables.py::pin_utc_session — _raw_ts_type above already
    # called load_table machinery; pin again here for direct callers),
    # under which the bare cast preserves both instant and rendering.
    from csdid_pyspark_spark.sources.tables import pin_utc_session

    pin_utc_session(spark)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(
    stream: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type. Late
    rows beyond the watermark are dropped; in append mode a window
    finalizes once the watermark passes its end."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _session_fn(gap_minutes: float):
    gap_us = int(gap_minutes * 60_000_000)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_us, n_sessions, n_events = state.get
        else:
            last_us, n_sessions, n_events = -1, 0, 0
        for pdf in pdfs:
            # pandas datetime64 int view is NANOseconds → convert to µs
            ts_us = (pdf["ts"].astype("int64") // 1000).sort_values().to_numpy()
            for t in ts_us:
                if last_us < 0 or t - last_us > gap_us:
                    n_sessions += 1
                last_us = int(t)
                n_events += 1
        state.update((last_us, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return fn


def sessionize_stream(stream: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Custom stateful operator: running per-user session counts with a
    gap timeout, via ``applyInPandasWithState``. State is one tiny
    tuple per user — the pattern scales to any keyed stateful logic
    Spark lacks natively (SURVEY.md north star: custom operators as
    Pandas-UDF-backed stateful maps)."""
    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop repeated keys while bounding state
    with the event-time watermark (``dropDuplicatesWithinWatermark``),
    so the state store holds only the watermark horizon — the property
    that keeps a 100 TB/day ingest dedup from accumulating unbounded
    keys. Exactly the batch ``dropDuplicates`` semantics inside the
    horizon; duplicates older than the watermark are the documented
    at-least-once tradeoff."""
    keys = keys or ["event_id"]
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_stream(stream: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static join: enrich each streaming event with a static
    dimension (per-user attributes). Spark plans the static side as a
    broadcast against every micro-batch — no stateful shuffle, so this
    scales to any stream rate as long as the dim fits an executor
    broadcast (the standard dimension-enrichment pattern)."""
    return stream.join(F.broadcast(dim), on, "left")


def write_idempotent_batch(bdf: DataFrame, data_dir: str, batch_id: int) -> None:
    """Land one micro-batch in its own ``batch_id=N`` partition directory
    with overwrite: a replayed batch id replaces its earlier attempt
    rather than appending a second copy."""
    bdf.write.mode("overwrite").parquet(f"{data_dir}/batch_id={batch_id}")


def accumulated_batches(spark: SparkSession, data_dir: str) -> DataFrame:
    """All batches landed so far, without the bookkeeping partition col."""
    return spark.read.parquet(data_dir).drop("batch_id")


def incremental_refresh(stream: DataFrame, recompute, work_dir: str, timeout: int = 300):
    """Streaming materialized view via ``foreachBatch``: append each
    micro-batch to an accumulating parquet table, then recompute a
    derived result over everything seen so far. This is the Structured
    Streaming escape hatch for logic the incremental operators can't
    express — e.g. refreshing a full DiD estimator fit as events
    arrive. The recompute is a bounded batch job per trigger (pair it
    with a processingTime trigger sized to the refit cost).

    The write is IDEMPOTENT under micro-batch retry: each batch lands in
    its own ``batch_id=N`` partition directory with overwrite, so a batch
    replayed after a failure (e.g. recompute threw after the write)
    replaces its earlier attempt instead of appending duplicate rows —
    the foreachBatch exactly-once recipe (sink dedup keyed on the
    checkpointed batch id; the checkpoint alone only gives at-least-once).

    ``recompute`` receives the accumulated DataFrame (without the
    bookkeeping ``batch_id`` column); the LAST batch's result is
    returned after the stream terminates.
    """
    spark = stream.sparkSession
    data_dir = f"{work_dir}/data"
    out: dict[str, Any] = {}

    def on_batch(bdf: DataFrame, batch_id: int) -> None:
        write_idempotent_batch(bdf, data_dir, batch_id)
        out["result"] = recompute(accumulated_batches(spark, data_dir))

    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return out.get("result")


def join_stream_pairs(
    stream: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    within_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each `left_type`
    event with the same user's `right_type` events that follow within
    `within_minutes` (the click→conversion attribution shape). Both
    sides carry a watermark and the join condition bounds event-time
    distance, so Spark can expire buffered state — without the time
    bound a stream-stream join would buffer both streams forever. State
    is hash-partitioned by user_id; per-user state is O(events inside
    the watermark horizon)."""
    l = stream.filter(F.col("event_type") == left_type).withWatermark("ts", watermark).alias("l")
    r = stream.filter(F.col("event_type") == right_type).withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {int(within_minutes)} MINUTES"))
    )
    return l.join(r, cond, "inner").select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("l.ts").alias("click_ts"),
        F.col("r.ts").alias("purchase_ts"),
        F.col("r.value").alias("purchase_value"),
    )


def mg_stream_heavy_hitters(
    stream: DataFrame, col: str, k: int = 8, buckets: int = 32
) -> DataFrame:
    """Streaming Misra-Gries frequent-items candidates with BOUNDED
    state: the stream is keyed by ``xxhash64(col) % buckets`` and each
    bucket's :class:`GroupState` holds one MG summary of capacity ``k``
    (≤ k (item, est) pairs + the bucket row count) — total state is
    buckets·k rows at ANY stream length, the property that lets a
    frequency profiler run forever on a 100 TB/day firehose. Each
    micro-batch folds its per-bucket exact hash counts into the state
    via the same mergeable-summaries rule as the batch operator
    (operators/heavyhitters.py::_mg_merge — the batch/stream parity is
    the point), then emits the bucket's current candidates in update
    mode with the running bucket total, so per-item error is bounded by
    bucket_n/(k+1) and any item with freq > bucket_n/(k+1) is
    guaranteed present. Downstream, an exact recount of the candidate
    set (batch or foreachBatch) upgrades estimates to exact counts.

    Output: ``bucket, item (hash), est, bucket_n`` per micro-batch.
    """
    from csdid_pyspark_spark.operators.heavyhitters import _mg_merge

    hashed = (
        stream.filter(F.col(col).isNotNull())
        .select(F.xxhash64(F.col(col).cast("string")).alias("item"))
        .withColumn("bucket", F.pmod("item", F.lit(buckets)).cast("int"))
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, ests, total = state.get
            summary = pd.Series(
                list(ests), index=pd.Index(list(items), dtype="int64"), dtype="int64"
            )
        else:
            summary, total = pd.Series(dtype="int64"), 0
        for pdf in pdfs:
            vals = pdf["item"]
            total += len(vals)
            summary = _mg_merge(summary, vals.value_counts(), k)
        state.update((summary.index.tolist(), summary.astype("int64").tolist(), total))
        yield pd.DataFrame(
            {
                "bucket": key[0],
                "item": summary.index.to_numpy("int64"),
                "est": summary.to_numpy("int64"),
                "bucket_n": total,
            }
        )

    return hashed.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType="bucket int, item bigint, est bigint, bucket_n bigint",
        stateStructType="items array<bigint>, ests array<bigint>, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming CDC materialization (latest-wins upsert + tombstones)
# ---------------------------------------------------------------------------

_CDC_OUT_SCHEMA = (
    "user_id bigint, last_op string, current_value double, "
    "n_ops bigint, n_deletes bigint"
)
_CDC_STATE_SCHEMA = (
    "last_us bigint, last_eid bigint, last_op string, last_value double, "
    "n_ops bigint, n_deletes bigint"
)


def _cdc_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_us, last_eid, last_op, last_value, n_ops, n_deletes = state.get
    else:
        last_us, last_eid, last_op, last_value, n_ops, n_deletes = (
            -1, -1, "", 0.0, 0, 0,
        )
    for pdf in pdfs:
        if not len(pdf):
            continue
        n_ops += len(pdf)
        op = pd.Series("U", index=pdf.index)
        op[pdf["event_type"] == "signup"] = "I"
        op[pdf["event_type"] == "error"] = "D"
        n_deletes += int((op == "D").sum())
        us = pdf["ts"].astype("int64") // 1000  # ns -> us
        eid = pdf["event_id"].astype("int64")
        # newest op in this chunk by (ts, event_id); compare against state
        top = pd.DataFrame({"us": us, "eid": eid}).sort_values(
            ["us", "eid"]
        ).index[-1]
        if (int(us[top]), int(eid[top])) > (last_us, last_eid):
            last_us, last_eid = int(us[top]), int(eid[top])
            last_op, last_value = str(op[top]), float(pdf["value"][top])
    state.update((last_us, last_eid, last_op, last_value, n_ops, n_deletes))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "last_op": [last_op],
            "current_value": [last_value],
            "n_ops": [n_ops],
            "n_deletes": [n_deletes],
        }
    )


def cdc_state_stream(stream: DataFrame) -> DataFrame:
    """Streaming MERGE materialization: per-key latest-wins state with
    delete tombstones over the event op log ('signup' = insert,
    'error' = delete, rest = update), via ``applyInPandasWithState``.
    State is one 6-field tuple per key — the bounded-state property a
    continuously-materialized table needs; each micro-batch emits the
    key's current snapshot (update mode), so a downstream sink always
    holds MERGE-equivalent current state. The batch equivalent is
    queries/estimation_ext.py::cdc_state_frame; the gate query pins
    the stream-drained state to that batch semantics via the same
    DuckDB oracle."""
    return (
        stream.select("user_id", "ts", "event_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _cdc_fn,
            outputStructType=_CDC_OUT_SCHEMA,
            stateStructType=_CDC_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
