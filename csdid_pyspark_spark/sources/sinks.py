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
