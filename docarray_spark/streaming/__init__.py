from docarray_spark.streaming.ops import (
    stateful_running_agg,
    read_stream,
    run_to_memory_sink,
    stream_static_match,
    streaming_dedup,
    streaming_fingerprint_dedup,
    streaming_find,
    windowed_counts,
    session_windows,
    stream_interval_join,
    stream_upsert_jdbc,
    stream_upsert_parquet_store,
)

__all__ = [
    "stateful_running_agg",
    "read_stream",
    "run_to_memory_sink",
    "stream_static_match",
    "streaming_dedup",
    "streaming_fingerprint_dedup",
    "streaming_find",
    "windowed_counts",
    "session_windows",
    "stream_interval_join",
    "stream_upsert_jdbc",
    "stream_upsert_parquet_store",
]
