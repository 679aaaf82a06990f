

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
