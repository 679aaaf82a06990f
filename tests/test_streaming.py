"""Structured Streaming tests: drive the streaming operators with
availableNow triggers into memory sinks and check against the batch
equivalents (same operator graph a live stream would run)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csdid_pyspark_spark.operators.sessionize import session_stats
from csdid_pyspark_spark.sources.tables import load_table
from csdid_pyspark_spark.streaming import sessionize_stream, stream_events, windowed_counts

SF = "/root/testdata/sf0.001"


def _run_to_memory(sdf, name, output_mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_matches_batch(spark):
    stream = stream_events(spark, SF)
    assert stream.isStreaming
    _run_to_memory(windowed_counts(stream), "wc_test", "append")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("wc_test").collect()
    }
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .collect()
    )
    expected = {(r["window_start"], r["event_type"]): (r["n"], r["s"]) for r in batch}
    # append mode only finalizes windows passed by the watermark; all
    # but the trailing window(s) must match the batch result exactly
    assert len(got) >= len(expected) - 5
    for k, v in got.items():
        assert expected[k] == v


def test_sessionize_stream_matches_batch(spark):
    stream = stream_events(spark, SF)
    _run_to_memory(sessionize_stream(stream, gap_minutes=30.0), "sess_test", "update")
    # last update per user = final running totals
    got = {
        r["user_id"]: r["n_sessions"]
        for r in spark.table("sess_test").collect()
    }
    batch = session_stats(load_table(spark, SF, "events"), gap_minutes=30.0).collect()
    expected = {r["user_id"]: r["n_sessions"] for r in batch}
    assert got.keys() == expected.keys()
    mismatches = {u: (got[u], expected[u]) for u in got if got[u] != expected[u]}
    assert not mismatches, mismatches


def test_dedup_stream_drops_duplicates(spark):
    from csdid_pyspark_spark.streaming.events import dedup_stream

    stream = stream_events(spark, SF)
    # union the stream with itself → every event_id appears twice
    doubled = stream.unionByName(stream)
    _run_to_memory(dedup_stream(doubled), "dedup_test", "append")
    out = spark.table("dedup_test")
    n_distinct = load_table(spark, SF, "events").select("event_id").distinct().count()
    assert out.count() == n_distinct
    assert out.select("event_id").distinct().count() == n_distinct


def test_enrich_stream_static_join(spark):
    """Stream-static broadcast join matches the batch left join."""
    from csdid_pyspark_spark.streaming.events import enrich_stream

    dim = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("user_n_events"))
    )
    enriched = enrich_stream(stream_events(spark, SF), dim)
    assert enriched.isStreaming
    _run_to_memory(
        enriched.groupBy("user_id", "user_n_events").agg(F.count("*").alias("n")),
        "enr_test",
        "complete",
    )
    rows = spark.table("enr_test").collect()
    assert rows
    # the enrichment column must agree with the per-user batch count
    assert all(r["user_n_events"] == r["n"] for r in rows)


def test_incremental_attgt_refresh_matches_batch(spark, tmp_path):
    """The streaming foreachBatch estimator refresh converges to the
    batch fit once the stream drains: same ATT(g,t) table."""
    from csdid_pyspark_spark.did import ATTgt
    from csdid_pyspark_spark.queries.did_events import derive_panel, panel_from_events
    from csdid_pyspark_spark.streaming.events import incremental_refresh

    def refit(events_df):
        est = ATTgt(
            derive_panel(events_df),
            yname="y", tname="period", idname="id", gname="g",
            panel=True, allow_unbalanced_panel=False,
        )
        est.fit(est_method="reg")
        t = est.fit_result.table
        est.unpersist()
        return {(int(r.g), int(r.t)): round(float(r.att), 9) for r in t.itertuples()}

    got = incremental_refresh(stream_events(spark, SF), refit, str(tmp_path / "w"))

    est = ATTgt(
        panel_from_events(spark, SF),
        yname="y", tname="period", idname="id", gname="g",
        panel=True, allow_unbalanced_panel=False,
    )
    est.fit(est_method="reg")
    want = {
        (int(r.g), int(r.t)): round(float(r.att), 9)
        for r in est.fit_result.table.itertuples()
    }
    est.unpersist()
    assert got == want


def test_idempotent_batch_write_replaces_on_retry(spark, tmp_path):
    """A replayed micro-batch (same batch_id) must replace its earlier
    attempt, not append a duplicate — the failure mode is a retry after
    the write succeeded but the recompute threw."""
    from csdid_pyspark_spark.streaming.events import (
        accumulated_batches,
        write_idempotent_batch,
    )

    data_dir = str(tmp_path / "mv")
    b0 = spark.range(10).withColumn("v", F.col("id") * 2)
    b1 = spark.range(10, 15).withColumn("v", F.col("id") * 2)
    write_idempotent_batch(b0, data_dir, 0)
    write_idempotent_batch(b1, data_dir, 1)
    # retry of batch 1 (e.g. recompute raised after the first write)
    write_idempotent_batch(b1, data_dir, 1)
    acc = accumulated_batches(spark, data_dir)
    assert acc.count() == 15
    assert acc.columns == ["id", "v"]
    assert acc.agg(F.sum("v")).first()[0] == sum(2 * i for i in range(15))


def test_join_stream_pairs_matches_batch(spark):
    from csdid_pyspark_spark.streaming.events import join_stream_pairs

    stream = stream_events(spark, SF)
    _run_to_memory(
        join_stream_pairs(stream, within_minutes=60), "pairs_test", "append"
    )
    got = {
        (r["click_id"], r["purchase_id"]) for r in spark.table("pairs_test").collect()
    }
    ev = load_table(spark, SF, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    expected = {
        (r["cid"], r["pid"])
        for r in clicks.join(
            buys,
            (F.col("cu") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 60 MINUTES")),
        ).collect()
    }
    # the watermark may hold back pairs near the stream tail; everything
    # emitted must be a true pair and coverage must be near-complete
    assert got <= expected
    assert len(got) >= int(0.9 * len(expected))


# ---------------------------------------------------------------------------
# Late-data / retry-semantics depth tests (multi-batch file streams with
# controlled file order via mtime — FileStreamSource processes oldest-first)
# ---------------------------------------------------------------------------

def _land_file(spark, rows, watch_dir, name, mtime, schema):
    """Write one parquet FILE into the watched stream directory with a
    pinned mtime, so maxFilesPerTrigger=1 yields one deterministic
    micro-batch per file in mtime order."""
    import glob
    import os
    import shutil

    tmp = f"{watch_dir}__stage_{name}"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(tmp + "/part-*.parquet")[0]
    os.makedirs(watch_dir, exist_ok=True)
    dst = os.path.join(watch_dir, name + ".parquet")
    shutil.copy(part, dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp)


_EV_SCHEMA = "event_type string, ts timestamp, value double"


def test_watermark_drops_late_rows_deterministically(spark, tmp_path):
    """Golden late-data semantics: a row arriving in a later batch whose
    window is already finalized below the watermark is DROPPED — and a
    full re-run from a fresh checkpoint drops it identically (replay
    determinism, the property retries rely on).

    Watermark semantics being pinned: while a window's state is LIVE,
    later-batch arrivals below the watermark may still merge (the
    watermark is a lower bound, not an input filter); once the window
    has been finalized+evicted — here, across a query restart — a
    below-watermark arrival MUST be dropped, and in append mode the
    finalized window must never be emitted a second time."""
    import datetime as dt
    import time

    def d(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    def scenario(tag):
        watch = str(tmp_path / f"in_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        outdir = str(tmp_path / f"out_{tag}")
        now = time.time()

        def run():
            # parquet sink: the memory sink cannot recover from a
            # checkpoint, and restart recovery is the point here
            stream = (
                spark.readStream.schema(_EV_SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .parquet(watch)
            )
            q = (
                windowed_counts(stream, duration="1 hour", watermark="1 hour")
                .writeStream.format("parquet")
                .option("path", outdir)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            rows = spark.read.parquet(outdir).collect()
            emitted = {}
            for r in rows:
                k = (r["window_start"], r["event_type"])
                assert k not in emitted, f"window emitted twice in append mode: {k}"
                emitted[k] = r["n_events"]
            return emitted

        # run 1: on-time rows; watermark commits at 13:00 (max 14:00 -
        # 1h), finalizing + evicting the 10:00 window with n=2
        _land_file(
            spark,
            [("view", d(10, 0), 1.0), ("view", d(10, 30), 1.0), ("view", d(14, 0), 1.0)],
            watch, "a", now - 100, _EV_SCHEMA,
        )
        out1 = run()
        # run 2 (restart from the same checkpoint): 10:15 and 11:30 sit
        # below the restored 13:00 watermark with their windows closed
        # -> dropped; 15:00 is on time and advances the watermark
        _land_file(
            spark,
            [("view", d(10, 15), 1.0), ("view", d(11, 30), 1.0), ("view", d(15, 0), 1.0)],
            watch, "b", now - 50, _EV_SCHEMA,
        )
        cumulative = run()  # sink dir accumulates across runs
        out2 = {k: v for k, v in cumulative.items() if k not in out1}
        return out1, out2

    out1, out2 = scenario("r1")
    # run 1 finalized the 10:00 window from on-time rows only
    assert out1[(d(10), "view")] == 2
    # the late arrivals neither resurrect finalized windows (duplicate
    # append emission) nor create new below-watermark windows
    assert (d(10), "view") not in out2
    assert (d(11), "view") not in out2
    assert all(ws >= d(13) for ws, _ in out2)
    # identical drop decisions on a full clean re-run
    assert scenario("r2") == (out1, out2)


def test_incremental_refresh_exactly_once_after_recompute_crash(spark, tmp_path):
    """End-to-end retry semantics for the foreachBatch materialized
    view: the recompute CRASHES after batch 1's data write; restarting
    from the same checkpoint replays batch 1, whose partition-overwrite
    replaces the earlier attempt — the accumulated table ends exactly
    once, and the refreshed result equals the batch answer."""
    import time

    from csdid_pyspark_spark.streaming.events import (
        accumulated_batches,
        incremental_refresh,
    )

    watch = str(tmp_path / "in")
    now = time.time()
    _land_file(
        spark, [("view", None, float(i)) for i in range(10)],
        watch, "a", now - 100, _EV_SCHEMA,
    )
    _land_file(
        spark, [("view", None, float(i)) for i in range(10, 15)],
        watch, "b", now - 50, _EV_SCHEMA,
    )

    def stream():
        return (
            spark.readStream.schema(_EV_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(watch)
        )

    work = str(tmp_path / "w")
    calls = {"n": 0}

    def flaky(df):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("refresh crashed mid-batch")
        return df.agg(F.sum("value")).first()[0]

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        incremental_refresh(stream(), flaky, work)
    # batch 1's DATA write already landed before the crash
    assert calls["n"] == 2

    result = incremental_refresh(stream(), lambda df: df.agg(F.sum("value")).first()[0], work)
    acc = accumulated_batches(spark, work + "/data")
    assert acc.count() == 15  # replayed batch replaced, not appended
    assert result == sum(float(i) for i in range(15))


def test_session_window_stream_matches_batch(spark):
    """Native session_window under a streaming watermark must finalize
    the same per-user session counts the batch grouping computes —
    with availableNow consuming all input, every session closes and
    the results must be identical."""
    from csdid_pyspark_spark.queries.llm_ops import events_session_window_builtin

    stream = stream_events(spark, SF)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
    )
    _run_to_memory(agg, "sw_test", "append")
    got = (
        spark.table("sw_test")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .collect()
    )
    got_map = {r["user_id"]: r["n_sessions"] for r in got}
    expected = {
        r["user_id"]: r["n_sessions"]
        for r in events_session_window_builtin(spark, SF).collect()
    }
    # append mode withholds sessions not yet passed by the watermark:
    # the final (latest) session per user may be missing, never extra
    assert got_map, "stream produced no finalized sessions"
    for uid, n in got_map.items():
        assert n in (expected[uid], expected[uid] - 1), (uid, n, expected[uid])
    assert sum(got_map.values()) >= sum(expected.values()) - len(expected)


def test_sliding_window_stream_matches_batch(spark, tmp_path):
    """The hopping-window rollup must produce identical finalized rows
    when run as a watermarked stream over the same file."""
    import shutil

    from csdid_pyspark_spark.queries.llm_ops import events_sliding_rollup
    from csdid_pyspark_spark.streaming.events import stream_events

    sf_dir = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in events_sliding_rollup(spark, sf_dir).collect()}

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    stream = stream_events(spark, str(src))
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(27,6)")).cast("double"), 4).alias(
                "sum_value"
            ),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sliding_rollup_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            tuple(r)
            for r in spark.sql("SELECT * FROM sliding_rollup_test").collect()
        }
    finally:
        q.stop()
    assert got == batch


def test_mg_stream_heavy_hitters_bounded_state_and_guarantees(spark, tmp_path):
    """The streaming MG sketch must (a) keep ≤ k candidates per bucket
    at every emission, (b) never overestimate (est ≤ true), with error
    ≤ bucket_n/(k+1), and (c) retain every item whose true bucket
    frequency clears the MG guarantee threshold — across multiple
    micro-batches with a planted dominant token."""
    import pandas as pd

    from csdid_pyspark_spark.streaming.events import mg_stream_heavy_hitters

    k, buckets = 3, 4
    # three micro-batch files; token 'hot' dominates every batch
    rows = []
    for b in range(3):
        rows += [("hot",)] * 60 + [(f"t{b}_{i}",) for i in range(30)]
    src = str(tmp_path / "toks")
    for b in range(3):
        spark.createDataFrame(rows[b * 90 : (b + 1) * 90], "tok string").coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("tok string").option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = mg_stream_heavy_hitters(stream, "tok", k=k, buckets=buckets)
    q = (
        out.writeStream.format("memory")
        .queryName("mg_stream_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM mg_stream_test").toPandas()
    assert not emitted.empty
    # (a) bounded candidates per (bucket, emission): emissions share a
    # bucket_n per batch, so group by (bucket, bucket_n)
    per_emit = emitted.groupby(["bucket", "bucket_n"]).size()
    assert (per_emit <= k).all()

    # final state per bucket = the emission with the max bucket_n
    final = emitted.loc[
        emitted.groupby("bucket")["bucket_n"].transform("max") == emitted["bucket_n"]
    ]
    # true per-bucket hash counts from the batch side
    from pyspark.sql import functions as F

    truth = (
        spark.read.parquet(src)
        .select(F.xxhash64(F.col("tok").cast("string")).alias("item"))
        .withColumn("bucket", F.pmod("item", F.lit(buckets)).cast("int"))
        .groupBy("bucket", "item")
        .count()
        .toPandas()
    )
    merged = final.merge(truth, on=["bucket", "item"], how="left")
    assert merged["count"].notna().all()
    # (b) underestimate only, within the MG error bound
    assert (merged["est"] <= merged["count"]).all()
    assert (merged["count"] - merged["est"] <= merged["bucket_n"] // (k + 1)).all()
    # (c) the planted heavy hitter survives: its bucket frequency (180)
    # clears bucket_n/(k+1) by construction
    hot_hash = truth.loc[truth["count"] == 180, "item"].iloc[0]
    assert (final["item"] == hot_hash).any()


def test_stream_heavy_hitters_chunking_independent(spark):
    """The pinned golden for stream_heavy_hitters rests on the
    exact-recount upgrade being independent of HOW Arrow chunks the
    per-bucket batches (MG estimates shift with chunk boundaries; the
    upgraded set must not). Force pathologically small Arrow batches
    and require the byte-identical result."""
    from csdid_pyspark_spark.queries.streaming_gate import stream_heavy_hitters

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default = spark.conf.get(key, "10000")
    base = sorted(tuple(r) for r in stream_heavy_hitters(spark, SF).collect())
    try:
        spark.conf.set(key, "16")
        tiny = sorted(tuple(r) for r in stream_heavy_hitters(spark, SF).collect())
    finally:
        spark.conf.set(key, default)
    assert base == tiny
    assert base  # non-trivial: the corpus has above-threshold tokens


def test_cdc_state_stream_multibatch_matches_batch(spark, tmp_path):
    """The streaming CDC materialization must equal the batch
    latest-wins apply EXACTLY when the log arrives split across
    micro-batches — including a key whose final op is a tombstone in a
    LATER batch than its last update (state must flip to deleted), and
    one resurrected after a tombstone (insert after delete)."""
    import datetime as dt
    import time

    from csdid_pyspark_spark.queries.estimation_ext import cdc_state_frame
    from csdid_pyspark_spark.streaming.events import cdc_state_stream

    def d(m):
        return dt.datetime(2024, 1, 1, 0, m)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    batch1 = [
        (1, d(1), 10, "signup", 1.0),
        (2, d(2), 10, "click", 2.0),
        (3, d(1), 20, "signup", 3.0),
        (4, d(1), 30, "signup", 5.0),
        (5, d(2), 30, "error", 0.0),   # deleted in batch 1...
    ]
    batch2 = [
        (6, d(3), 10, "purchase", 9.0),  # later update wins
        (7, d(3), 20, "error", 0.0),     # tombstone arrives batch 2
        (8, d(3), 30, "signup", 7.0),    # ...resurrected in batch 2
    ]
    watch = str(tmp_path / "cdc_in")
    now = time.time()
    _land_file(spark, batch1, watch, "b1", now - 20, schema)
    _land_file(spark, batch2, watch, "b2", now - 10, schema)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(watch)
    )
    name = "cdc_mb_sink"
    q = (
        cdc_state_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    out = spark.table(name)
    # fold update-mode re-emissions: max (monotone n_ops) per key
    from pyspark.sql import functions as F

    folded = (
        out.groupBy("user_id")
        .agg(F.max(F.struct("n_ops", "last_op", "current_value", "n_deletes")).alias("s"))
        .select("user_id", "s.last_op", "s.current_value", "s.n_ops", "s.n_deletes")
        .filter(F.col("last_op") != "D")
    )
    batch = cdc_state_frame(
        spark.createDataFrame(batch1 + batch2, schema).select(
            "user_id", "ts", "event_id",
            F.when(F.col("event_type") == "signup", "I")
            .when(F.col("event_type") == "error", "D")
            .otherwise("U").alias("op"),
            "value",
        )
    ).select(
        "user_id", "last_op",
        F.col("current_value"), "n_ops", "n_deletes",
    )
    got = {r["user_id"]: (r["last_op"], r["current_value"], r["n_ops"], r["n_deletes"])
           for r in folded.collect()}
    want = {r["user_id"]: (r["last_op"], r["current_value"], r["n_ops"], r["n_deletes"])
            for r in batch.collect()}
    assert got == want
    assert 20 not in got          # tombstoned across the batch boundary
    assert got[30][0] == "I"      # resurrected after an earlier tombstone
    assert got[10] == ("U", 9.0, 3, 0)


def test_psi_append_mode_per_window_trace_and_eviction(spark):
    """Append-mode PSI monitor (r10 verdict item 7): (1) every window
    the watermarked stream EMITS carries bin counts identical to the
    batch recomputation of that window, so each per-window PSI equals
    the batch PSI computed with the same Laplace-smoothed algebra
    (rows-oracle analogue of the complete-mode query's hash gate);
    (2) emitted windows are exactly those whose end the final
    watermark passed — the tail window(s) within the watermark delay
    of max(ts) stay open/unemitted; (3) the state store EVICTED the
    emitted windows: final state rows are bounded by (open windows x
    types x 10 bins) and rows_removed > 0 — the bounded-state
    contract complete mode cannot give."""
    from csdid_pyspark_spark.queries.streaming_gate import _psi_append_core

    out, state = _psi_append_core(spark, SF)
    rows = out.collect()
    assert rows, "no emitted windows"
    got = {
        (r["w_start"], r["event_type"]): (r["n_ref"], r["n_cur"], r["psi"])
        for r in rows
    }

    # batch recomputation of the SAME emitted windows with the same
    # algebra (Spark expressions on the batch table -> bit-identical)
    ev = load_table(spark, SF, "events")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    bin_col = F.least(F.lit(9), F.floor(F.col("value") / 50.0)).cast("int")
    max_ts, = ev.agg(F.max("ts")).first()
    import datetime

    emitted = sorted({w for w, _ in got})
    # emitted = windows whose END <= watermark = max_ts - 1h
    wm = max_ts - datetime.timedelta(hours=1)
    for w in emitted:
        w_end = (
            datetime.datetime.strptime(w, "%Y-%m-%d %H:%M:%S")
            + datetime.timedelta(hours=6)
        )
        assert w_end <= wm, (w, wm)
    # the last pre-watermark window must actually have been emitted
    # (eviction/emission really happened, not an empty-emission pass)
    cur_half = ev.filter(F.col("ts") >= split)
    all_windows = {
        r["w"]
        for r in cur_half.select(
            F.date_format(
                F.window("ts", "6 hours").start, "yyyy-MM-dd HH:mm:ss"
            ).alias("w")
        ).distinct().collect()
    }
    closed = {
        w
        for w in all_windows
        if datetime.datetime.strptime(w, "%Y-%m-%d %H:%M:%S")
        + datetime.timedelta(hours=6)
        <= wm
    }
    assert set(emitted) == closed, (sorted(closed - set(emitted))[:3],)

    ref = (
        ev.filter(F.col("ts") < split)
        .groupBy("event_type", bin_col.alias("b"))
        .agg(F.count("*").alias("r"))
    )
    curb = (
        cur_half.groupBy(
            F.date_format(
                F.window("ts", "6 hours").start, "yyyy-MM-dd HH:mm:ss"
            ).alias("w_start"),
            "event_type",
            bin_col.alias("b"),
        )
        .agg(F.count("*").alias("c"))
        .filter(F.col("w_start").isin(list(emitted)))
    )
    wins = curb.select("w_start").distinct()
    types = ref.select("event_type").unionByName(
        curb.select("event_type")
    ).distinct()
    bins = spark.range(10).select(F.col("id").cast("int").alias("b"))
    filled = (
        wins.crossJoin(F.broadcast(types))
        .crossJoin(F.broadcast(bins))
        .join(F.broadcast(ref), ["event_type", "b"], "left")
        .join(curb, ["w_start", "event_type", "b"], "left")
        .select(
            "w_start", "event_type", "b",
            F.coalesce("r", F.lit(0)).alias("r"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    tot = filled.groupBy("w_start", "event_type").agg(
        F.sum("r").alias("n_ref"), F.sum("c").alias("n_cur")
    )
    batch = {
        (r["w_start"], r["event_type"]): (r["n_ref"], r["n_cur"], r["psi"])
        for r in filled.join(F.broadcast(tot), ["w_start", "event_type"])
        .select(
            "w_start", "event_type", "n_ref", "n_cur",
            (
                ((F.col("c") + 0.5) / (F.col("n_cur") + 5.0))
                - ((F.col("r") + 0.5) / (F.col("n_ref") + 5.0))
            ).alias("dp"),
            (
                F.log((F.col("c") + 0.5) / (F.col("n_cur") + 5.0))
                - F.log((F.col("r") + 0.5) / (F.col("n_ref") + 5.0))
            ).alias("lr"),
        )
        .groupBy("w_start", "event_type", "n_ref", "n_cur")
        .agg(F.round(F.sum(F.col("dp") * F.col("lr")), 6).alias("psi"))
        .collect()
    }
    assert got == batch

    # state eviction: emitted windows left the store; what remains is
    # bounded by the open tail
    n_types = types.count()
    open_windows = len(all_windows) - len(closed)
    assert state["rows_removed"] > 0, state
    assert 0 <= state["rows_total"] <= max(open_windows, 1) * n_types * 10, (
        state, open_windows, n_types,
    )

# Slow tier: deselected by the default `-m "not slow"` (pytest.ini) so the
# driver's time-budgeted gate runs the fast product surfaces; run everything
# with `python -m pytest tests/ -m "slow or not slow"` (round-close practice).
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
