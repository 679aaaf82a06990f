"""Parquet sources for the driver's star-schema testdata (TESTDATA.md).

The reference only reads CSV with schema inference (usage.ipynb cell 2,
test_predid.py:24 — SURVEY.md §2.1 S1). We standardize on parquet scans
so Catalyst gets predicate pushdown + column pruning for free; CSV
remains available through :func:`load_panel_csv` for reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def pin_utc_session(spark: SparkSession) -> None:
    """Pin ``spark.sql.session.timeZone`` to UTC (idempotent).

    The engine's timestamp contract: file timestamps are naive wall
    clocks, processed as that wall clock read in UTC. On a UTC session
    a TIMESTAMP's instant (``unix_micros``, joins, window buckets) AND
    its rendering (``date_format``, ``to_date``, ``date_trunc``) both
    equal the file's wall clock — matching a naive engine (DuckDB)
    exactly. On a non-UTC session those two views of one TIMESTAMP
    differ by the zone offset and CANNOT both match: an expression that
    fixes the instant (``from_utc_timestamp(cast(ts as timestamp),
    current_timezone())``) shifts every rendered hour/day bucket by the
    offset, and a bare cast does the reverse. Pinning the session zone
    at load time is the only normalization that makes the whole query
    surface session-independent — it is also what production Spark
    deployments do (``get_spark`` sets the same)."""
    # unconditional set: conf.get with a sentinel default trips Spark's
    # conf-value validation on sessions that never set the key (vanilla
    # driver sessions) — INVALID_CONF_VALUE for the sentinel itself.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# ---------------------------------------------------------------------------
# Layout normalization (ingest compaction for pathological row grouping)
# ---------------------------------------------------------------------------
#
# A parquet ROW GROUP is the minimum unit a scan task can read: a file
# written as one giant row group executes every downstream scan as ONE
# task no matter how many input splits Spark cuts — at sf0.1 the 600k-row
# lineitem decoded + partially aggregated on a single core while 31 sat
# idle (measured: TPC-H Q1 1.25 s, of which the whole scan stage was one
# task). The driver's testdata ships exactly this layout. The remedy is
# the same one a lakehouse runs against badly-ingested files: a one-time
# compaction rewrite into properly-sized row groups, after which every
# query in the session scans in parallel. The rewrite is value-preserving
# (row order is NOT preserved — no query in this engine depends on file
# order; arrival-order semantics always come from explicit columns).
#
# Applied only when it pays: a single-row-group file that is large by
# rows (LAYOUT_MIN_ROWS) or dense by bytes (LAYOUT_MIN_BYTES — a 5k-doc
# text corpus is small in rows but its token explodes fan out 1000x).
# The rewrite changes LAYOUT only — every value, type, and instant is
# identical (pinned by test_sources.py), so the correctness gate is
# unaffected wherever it triggers. Opt out with
# SPARK_GRAFT_LAYOUT_CACHE=0.

LAYOUT_MIN_ROWS = 100_000
LAYOUT_MIN_BYTES = 262_144  # dense-but-few-rows files (documents, embeddings)
LAYOUT_TARGET_ROWS = 50_000  # per rewritten file (one row group each)
LAYOUT_TARGET_BYTES = 131_072

_LAYOUT_DIR: dict[str, str] = {}  # app_id -> temp dir
_LAYOUT_PATH: dict[tuple[str, str, str], str | None] = {}
_LAYOUT_CLEANUP_REGISTERED = False


def _register_layout_cleanup() -> None:
    """Remove every session's compaction dir at interpreter exit. The
    rewrites are a per-process cache (keyed by applicationId), so
    without this repeated runs would accumulate parquet copies in /tmp
    indefinitely. atexit (not a SparkSession-stop hook) because the
    dirs outlive individual sessions within one process on purpose —
    a restarted session gets a fresh applicationId and its own dir."""
    global _LAYOUT_CLEANUP_REGISTERED
    if _LAYOUT_CLEANUP_REGISTERED:
        return
    import atexit
    import shutil

    def _cleanup() -> None:
        for d in _LAYOUT_DIR.values():
            shutil.rmtree(d, ignore_errors=True)

    atexit.register(_cleanup)
    _LAYOUT_CLEANUP_REGISTERED = True


def _layout_normalized_path(spark: SparkSession, sf_dir: str, name: str) -> str | None:
    """Rewrite ``<sf_dir>/<name>.parquet`` once per session into a
    multi-row-group copy and return its path, or None when the source
    layout is already scan-parallel (or the cache is disabled)."""
    import math
    import os
    import tempfile

    if os.environ.get("SPARK_GRAFT_LAYOUT_CACHE", "1") == "0":
        return None
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, name)
    if key in _LAYOUT_PATH:
        return _LAYOUT_PATH[key]
    src = f"{sf_dir}/{name}.parquet"
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(src).metadata
        nbytes = os.path.getsize(src)
        needs = meta.num_row_groups == 1 and (
            meta.num_rows >= LAYOUT_MIN_ROWS or nbytes >= LAYOUT_MIN_BYTES
        )
    except Exception:
        needs = False
    if not needs:
        _LAYOUT_PATH[key] = None
        return None
    base = _LAYOUT_DIR.get(app)
    if base is None:
        base = tempfile.mkdtemp(prefix="spark_graft_layout_")
        _LAYOUT_DIR[app] = base
        _register_layout_cleanup()
    # key the rewrite dir by the FULL normalized source path, not its
    # basename: two data dirs with the same leaf name (/a/sf0.01 and
    # /b/sf0.01) in one session must not share a dst, or the second
    # mode('overwrite') rewrite would silently serve its rows to the
    # first dir's cached entry. The basename stays in the name purely
    # for human readability of /tmp listings.
    import hashlib

    src_key = hashlib.sha256(
        os.path.normpath(os.path.abspath(sf_dir)).encode()
    ).hexdigest()[:12]
    dst = os.path.join(
        base, f"{os.path.basename(sf_dir.rstrip('/'))}-{src_key}", name
    )
    n_parts = min(
        32,
        max(
            2,
            math.ceil(meta.num_rows / LAYOUT_TARGET_ROWS),
            math.ceil(nbytes / LAYOUT_TARGET_BYTES),
        ),
    )
    _read_raw(spark, sf_dir, name).repartition(n_parts).write.mode(
        "overwrite"
    ).parquet(dst)
    _LAYOUT_PATH[key] = dst
    return dst


def _read_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Plain parquet scan — filters/projections
    applied by callers push down into this scan via Catalyst. Sources
    whose physical layout defeats scan parallelism (one giant row
    group) are compacted once per session first — see the layout
    normalization note above.

    events.parquet has shipped with two physical types for ``ts``:
    TIMESTAMP(NANOS), which Spark's parquet reader rejects (we read it
    as raw nanos via the legacy conf and floor-truncate to microsecond
    timestamps — the same truncation DuckDB applies), and tz-naive
    TIMESTAMP(MICROS), which Spark 4 reads as TIMESTAMP_NTZ. Both are
    normalized to a plain TIMESTAMP equal to the file's wall clock
    read as UTC — see :func:`pin_utc_session` for why the session
    zone is pinned rather than compensated per-expression (the
    normalization is applied before the compaction rewrite, so a
    cached layout already carries plain TIMESTAMP)."""
    pin_utc_session(spark)
    cached = _layout_normalized_path(spark, sf_dir, name)
    if cached is not None:
        return spark.read.parquet(cached)
    return _read_raw(spark, sf_dir, name)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` can be used."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_panel_csv(
    spark: SparkSession, path: str, header: bool = True, infer_schema: bool = True
) -> DataFrame:
    """CSV panel reader matching the reference's input path
    (spark.read.csv(..., header=True, inferSchema=True))."""
    return spark.read.csv(path, header=header, inferSchema=infer_schema)


def load_json(
    spark: SparkSession, path: str, schema: str | None = None, multiline: bool = False
) -> DataFrame:
    """JSON-lines source. Pass an explicit DDL ``schema`` in production:
    schema inference is a full extra pass over the data (prohibitive at
    100 TB) and non-deterministic under dirty rows. Corrupt records land
    in ``_corrupt_record`` (PERMISSIVE) instead of failing the scan."""
    r = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def load_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — same predicate-pushdown/column-pruning contract as
    parquet (both are Catalyst FileScan sources with min/max stats)."""
    return spark.read.orc(path)


def load_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Raw text source: one row per line (``value`` column), or one row
    per file with ``wholetext`` — the raw-corpus ingest path for the
    document pipeline (each file/line then flows through fingerprinting,
    language ID, and quality scoring). Line mode splits on newlines at
    HDFS-block granularity, so a 100 TB corpus parallelizes without any
    per-file driver listing cost beyond the initial file index."""
    return spark.read.text(path, wholetext=whole)
