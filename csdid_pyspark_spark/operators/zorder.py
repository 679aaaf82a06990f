"""Z-order (Morton) clustering: multi-dimensional data layout for
parquet min/max data skipping.

Why this matters at 100 TB: a table range-partitioned on ONE column
skips well on that column only. Interleaving the bits of k bucketized
columns into a single sort key co-locates rows that are close in EVERY
dimension, so per-file (and per-row-group) min/max ranges stay narrow
on all k columns at once — scans filtered on any of them prune files.
This is the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``,
reproduced here as a plain declarative sort key: the write is
``repartitionByRange(z).sortWithinPartitions(z)``, i.e. ONE range
shuffle, and the key itself is pure integer JVM codegen (no UDF).

The key expression is generated once and rendered into both the Spark
plan and the ANSI-SQL oracle from the same bit-interleave recipe, so
correctness is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_sql(cols: list[str], bits: int = 8, dialect: str = "spark") -> str:
    """Bit-interleave expression for ``cols`` (low ``bits`` bits each)
    as a SQL string. ``dialect='spark'`` uses shiftleft/shiftright
    (portable across Spark versions); ``'ansi'`` uses << / >>
    (DuckDB). Identical arithmetic either way: bit b of column i lands
    at position b*k + i."""
    k = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            pos = b * k + i
            if dialect == "spark":
                terms.append(f"shiftleft(shiftright({c}, {b}) & 1, {pos})")
            else:
                terms.append(f"((({c} >> {b}) & 1) << {pos})")
    return " + ".join(terms)


def zorder_key(cols: list[str], bits: int = 8) -> Column:
    """The Morton key as a Column (cols must already be non-negative
    integers; callers bucketize first, e.g. ``value & (2^bits - 1)``
    or a rank/range bucket)."""
    return F.expr(zorder_sql(cols, bits, dialect="spark")).cast("bigint")


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 8,
    num_files: int = 8,
) -> None:
    """Rewrite ``df`` clustered by the z-key over ``cols`` (bucketized
    to ``bits`` low bits per dimension): one range shuffle into
    ``num_files`` contiguous z-ranges, sorted within each, so parquet
    footer min/max stats are tight on every clustered column."""
    bucketized = [
        F.pmod(F.col(c).cast("bigint"), F.lit(1 << bits)).alias(f"_zb_{i}")
        for i, c in enumerate(cols)
    ]
    keyed = df.select("*", *bucketized).withColumn(
        "_z", zorder_key([f"_zb_{i}" for i in range(len(cols))], bits)
    )
    (
        keyed.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_zb_{i}" for i in range(len(cols))])
        .write.mode("overwrite")
        .parquet(path)
    )
