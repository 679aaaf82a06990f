from csdid_pyspark_spark.streaming.events import (
    dedup_stream,
    sessionize_stream,
    stream_events,
    windowed_counts,
)

__all__ = ["stream_events", "windowed_counts", "sessionize_stream", "dedup_stream"]
