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
