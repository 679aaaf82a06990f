"""Time-series grid operators: gap-filling and linear interpolation.

The reference engine has no time-series surface; this is part of the
100 TB extension layer (hypertable-style continuous grids are the
standard shape for metric rollups feeding training-data dashboards).

Scale design: the raw input is reduced FIRST by a plain map-side-combine
hourly groupBy — the only pass that touches event-scale data. The grid
is then generated per series with ``sequence()`` from that series' own
observed [min, max] hour (one row per series exploded to its grid,
never a global calendar cross-join), and both interpolation windows
sort the same (series, hour) order, so Spark reuses one exchange for
them. Grid density is bounded by (time-range / granularity) per
series, independent of event count — at 100 TB of events everything
after the first groupBy operates on the bounded grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_grid_fill(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hourly per-series grid over each series' observed time range,
    with missing hours filled by linear interpolation between the
    neighboring observed hourly means.

    Returns one row per (series, hour): ``n_events`` (0 on gap hours),
    ``value_filled`` (observed hourly mean, or the interpolation), and
    ``is_gap``. Float discipline: the hourly mean is an exact DECIMAL
    sum divided by the count (deterministic under any partial-agg
    order), and the interpolation fraction is a division of exact
    integer microsecond deltas — so results are bit-stable across
    partition layouts and engines.

    The first and last grid hours of every series are observed by
    construction (the grid spans that series' own min..max observed
    hour), so every gap is interior and both interpolation neighbors
    always exist.
    """
    from csdid_pyspark_spark.cache import attach_cache

    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = (
        events.select(F.col(series_col).alias("series"), hour.alias("h"), F.col(value_col).alias("v"))
        .groupBy("series", "h")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.col("v").cast("decimal(27,6)")).cast("double") / F.count("*")
            ).alias("avg_value"),
        )
        # hourly feeds the spine aggregate AND the grid join — without a
        # persist the event-scale scan+groupBy lineage runs twice (Spark
        # shares no common subtrees across a DAG). The cached frame is
        # bounded at (series × observed hours), independent of row count.
        .persist()
    )
    spine = (
        hourly.groupBy("series")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "series",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    g = spine.join(hourly, ["series", "h"], "left")
    eh = F.unix_micros(F.col("h"))
    observed = F.col("avg_value").isNotNull()
    w_back = (
        Window.partitionBy("series")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("series")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v_prev = F.last("avg_value", ignorenulls=True).over(w_back)
    e_prev = F.last(F.when(observed, eh), ignorenulls=True).over(w_back)
    v_next = F.first("avg_value", ignorenulls=True).over(w_fwd)
    e_next = F.first(F.when(observed, eh), ignorenulls=True).over(w_fwd)
    frac = (eh - e_prev).cast("double") / (e_next - e_prev).cast("double")
    filled = F.when(observed, F.col("avg_value")).otherwise(
        v_prev + (v_next - v_prev) * frac
    )
    return attach_cache(
        g.select(
            "series",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
            F.round(filled, 6).alias("value_filled"),
            (~observed).alias("is_gap"),
        ),
        hourly,
    )
