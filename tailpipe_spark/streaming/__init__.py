from tailpipe_spark.streaming.collect_stream import (
    stream_collect,
    windowed_counts,
    session_windows,
)

__all__ = ["stream_collect", "windowed_counts", "session_windows"]
