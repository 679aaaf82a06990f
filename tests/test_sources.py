

def test_text_source_line_and_whole(spark, tmp_path):
    from csdid_pyspark_spark.sources.tables import load_text

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("solo\n")
    lines = load_text(spark, str(p))
    assert lines.columns == ["value"]
    assert sorted(r["value"] for r in lines.collect()) == ["line one", "line two", "solo"]
    whole = load_text(spark, str(p), whole=True)
    assert whole.count() == 2


def test_clustered_write_disjoint_file_ranges(spark, tmp_path):
    """write_clustered must give each file a disjoint cluster-key range
    (tight min/max stats => file/rowgroup skipping on range predicates)."""
    import glob

    from pyspark.sql import functions as F

    from csdid_pyspark_spark.sources.sinks import write_clustered
    from csdid_pyspark_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "clustered")
    write_clustered(ev, out, cluster_by=["user_id", "ts"], num_files=4)
    ranges = []
    for f in sorted(glob.glob(out + "/part-*.parquet")):
        r = spark.read.parquet(f).agg(
            F.min("user_id").alias("lo"), F.max("user_id").alias("hi"), F.count("*").alias("n")
        ).first()
        if r["n"]:
            ranges.append((r["lo"], r["hi"]))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges  # disjoint (boundary key may be shared)


def test_events_ts_session_timezone_independent(spark):
    """Regression (ADVICE r3): the events NTZ→TIMESTAMP normalization
    must yield the same instants (wall clock read as UTC) under ANY
    spark.sql.session.timeZone — a bare NTZ cast (or a cast followed by
    to_utc_timestamp(..., 'UTC'), which is a no-op) shifts every
    instant on a non-UTC session and breaks all events/asof/trend
    oracles."""
    from pyspark.sql import functions as F

    from csdid_pyspark_spark.sources.tables import load_table

    tz_key = "spark.sql.session.timeZone"
    orig = spark.conf.get(tz_key)

    def span():
        e = load_table(spark, "/root/testdata/sf0.001", "events")
        return e.agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        ).first()

    try:
        spark.conf.set(tz_key, "UTC")
        utc = span()
        spark.conf.set(tz_key, "America/New_York")
        ny = span()
        spark.conf.set(tz_key, "Asia/Kathmandu")  # non-hour offset
        ktm = span()
    finally:
        spark.conf.set(tz_key, orig)
    assert (utc["lo"], utc["hi"]) == (ny["lo"], ny["hi"]) == (ktm["lo"], ktm["hi"])

    import duckdb

    lo, hi = duckdb.sql(
        "SELECT epoch_us(min(ts)), epoch_us(max(ts))"
        " FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchone()
    assert (utc["lo"], utc["hi"]) == (lo, hi)


def test_schema_evolution_merge_read(spark, tmp_path):
    """Appended batches that GAIN columns must read back as one table
    with the union schema (mergeSchema) — old rows NULL in new
    columns. This is the append-only schema-evolution contract a
    long-lived 100 TB table needs without a rewrite."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        base + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(base + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"id", "v", "score", "batch"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_session_timezone_independence(spark, sf_dir):
    """The engine's timestamp contract (sources/tables.py::
    pin_utc_session): results are identical no matter what session
    timezone the caller arrives with — load_table pins the session to
    UTC, under which instant-view (epoch math) and rendered-view
    (hour/day buckets) of a TIMESTAMP both equal the file's naive wall
    clock. Sabotages the session with a HALF-HOUR-offset zone (catches
    whole-hour-only reasoning) and asserts a wall-clock-bucketing
    query is unchanged."""
    from csdid_pyspark_spark.queries import QUERIES

    baseline = {
        tuple(r) for r in QUERIES["events_hourly_rollup"](spark, sf_dir).collect()
    }
    km_baseline = {
        tuple(r) for r in QUERIES["events_kaplan_meier"](spark, sf_dir).collect()
    }
    stick_baseline = {
        tuple(r) for r in QUERIES["events_stickiness"](spark, sf_dir).collect()
    }
    # round-5 ts-bucketing queries (day/hour truncation, interval math)
    r5_names = ["layout_skew_advisor", "incremental_rollup_merge", "events_seasonal_holdout_mape"]
    r5_baseline = {
        n: {tuple(r) for r in QUERIES[n](spark, sf_dir).collect()} for n in r5_names
    }
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        sabotaged = {
            tuple(r) for r in QUERIES["events_hourly_rollup"](spark, sf_dir).collect()
        }
        km_sabotaged = {
            tuple(r) for r in QUERIES["events_kaplan_meier"](spark, sf_dir).collect()
        }
        stick_sabotaged = {
            tuple(r) for r in QUERIES["events_stickiness"](spark, sf_dir).collect()
        }
        retention = QUERIES["events_retention"](spark, sf_dir).count()
        r5_sabotaged = {
            n: {tuple(r) for r in QUERIES[n](spark, sf_dir).collect()} for n in r5_names
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert sabotaged == baseline
    assert km_sabotaged == km_baseline
    assert stick_sabotaged == stick_baseline
    for n in r5_names:
        assert r5_sabotaged[n] == r5_baseline[n], n
    assert retention > 0
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_pin_utc_session_survives_unset_conf(spark):
    """pin_utc_session must work on sessions that NEVER set the
    timezone key (the driver's vanilla session): conf.get with a
    sentinel default raises INVALID_CONF_VALUE there, so the pin must
    set unconditionally."""
    from csdid_pyspark_spark.sources.tables import pin_utc_session

    spark.conf.unset("spark.sql.session.timeZone")
    try:
        pin_utc_session(spark)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_layout_normalization_preserves_values_and_parallelizes(spark, tmp_path):
    """A single-row-group file above LAYOUT_MIN_ROWS is compacted once
    per session into a multi-row-group copy: same values (order-
    insensitive), more than one scan partition, and the rewrite happens
    exactly once (second load returns the cached path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from csdid_pyspark_spark.sources import tables as T

    n = T.LAYOUT_MIN_ROWS + 5
    tbl = pa.table({"l_orderkey": list(range(n)), "v": [i * 0.5 for i in range(n)]})
    sf_dir = str(tmp_path / "sfX")
    (tmp_path / "sfX").mkdir()
    pq.write_table(tbl, f"{sf_dir}/lineitem.parquet", row_group_size=n)
    assert pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_row_groups == 1

    df = T.load_table(spark, sf_dir, "lineitem")
    assert df.rdd.getNumPartitions() > 1
    assert df.count() == n
    assert sum(r[0] for r in df.select("l_orderkey").collect()) == n * (n - 1) // 2

    key = (spark.sparkContext.applicationId, sf_dir, "lineitem")
    first_path = T._LAYOUT_PATH[key]
    T.load_table(spark, sf_dir, "lineitem")
    assert T._LAYOUT_PATH[key] == first_path

    # below the threshold: untouched
    small = pa.table({"l_orderkey": [1, 2, 3]})
    sf2 = str(tmp_path / "sfY")
    (tmp_path / "sfY").mkdir()
    pq.write_table(small, f"{sf2}/lineitem.parquet")
    T.load_table(spark, sf2, "lineitem")
    assert T._LAYOUT_PATH[(spark.sparkContext.applicationId, sf2, "lineitem")] is None

# Slow tier: deselected by the default `-m "not slow"` (pytest.ini) so the
# driver's time-budgeted gate runs the fast product surfaces; run everything
# with `python -m pytest tests/ -m "slow or not slow"` (round-close practice).
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
