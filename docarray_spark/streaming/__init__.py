from docarray_spark.streaming.ops import (
    read_stream,
    run_to_memory_sink,
    stream_static_match,
    streaming_dedup,
    streaming_find,
    windowed_counts,
)

__all__ = [
    "read_stream",
    "run_to_memory_sink",
    "stream_static_match",
    "streaming_dedup",
    "streaming_find",
    "windowed_counts",
]
