

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
