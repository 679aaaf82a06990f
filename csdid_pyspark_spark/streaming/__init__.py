from csdid_pyspark_spark.streaming.events import (
    dedup_stream,
    enrich_stream,
    incremental_refresh,
    join_stream_pairs,
    sessionize_stream,
    stream_events,
    windowed_counts,
)

__all__ = [
    "stream_events",
    "windowed_counts",
    "sessionize_stream",
    "dedup_stream",
    "enrich_stream",
    "incremental_refresh",
    "join_stream_pairs",
]
