from etl_pipeline_project_spark.streaming.ops import (
    read_events_stream,
    run_to_memory,
    stream_dedup_keys,
    stream_windowed_counts,
)

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "stream_dedup_keys",
    "stream_windowed_counts",
]
