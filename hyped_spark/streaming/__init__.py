"""Structured Streaming front-end: file-ordered change source → foreachBatch merge."""

from hyped_spark.streaming.stream import StreamConfig, run_stream, stream_once  # noqa: F401
