"""Write paths (the reference has none — SURVEY.md §2.1 S2).

Parquet is the default interchange; partitioned layout is the knob
that matters at 100 TB (partition pruning on read, bounded file counts
on write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = "gzip") -> None:
    """JSON-lines sink — the interchange format LLM-corpus tooling
    expects. Compressed by default: JSONL is ~10x parquet on disk and
    the codec keeps shuffle-free writers I/O-bound, not disk-bound."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """ORC sink: columnar alternative with the same pushdown/pruning
    properties as parquet (Hive-ecosystem interchange)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (external, at ``path``): pre-shuffles data
    into ``buckets`` files per partition keyed by ``bucket_cols``. Two
    tables bucketed the same way join with ZERO exchange — the shuffle
    is paid once at write time instead of on every join, which is the
    economic trade at 100 TB for fact tables joined repeatedly on the
    same key. ``sort_cols`` additionally pre-sorts within buckets so a
    sort-merge join skips its sort."""
    w = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_mb: int = 512,
) -> int:
    """Small-file compaction: rewrite a parquet location into files of
    roughly ``target_mb`` each; returns the file count written. A
    streaming/incremental pipeline leaves thousands of KB-sized files;
    every later scan then pays per-file open/footer costs and the
    driver pays listing memory — at 100 TB this is a scheduled
    maintenance pass. Target file count comes from the on-disk byte
    size in the file index (a metadata call, no data pass), and
    ``coalesce`` merges scan splits WITHOUT a shuffle, so compaction
    is pure sequential I/O: read k small files, write n big ones."""
    total_bytes = _dir_bytes(spark, path)
    n_files = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    spark.read.parquet(path).coalesce(n_files).write.mode("overwrite").parquet(out_path)
    import glob
    import os

    return len(glob.glob(os.path.join(out_path, "**", "*.parquet"), recursive=True))


def _dir_bytes(spark, path: str) -> int:
    """Recursive byte size of a location via the Hadoop FileSystem API
    (works on HDFS/S3A/file: — one namenode/liststore call, no data
    read), falling back to a local glob when no JVM gateway exists."""
    try:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        return int(fs.getContentSummary(p).getLength())
    except Exception:
        import glob
        import os

        return sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
            if os.path.isfile(f)
        )


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Cluster the data layout on ``cluster_by``: range-repartition so
    each output file owns a disjoint key range, then sort within files
    so parquet min/max statistics are tight. A selective predicate on
    the cluster key then skips whole files and row groups at scan time
    — the poor man's Z-ORDER, and the single biggest read-amplification
    lever for a 100 TB table queried by range (time, id prefix)."""
    (
        df.repartitionByRange(num_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )
