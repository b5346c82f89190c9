"""Structured Streaming building blocks (SURVEY.md §2.1 S8/S9, §2.9)."""

from big_data_programming_spark.streaming.harness import drain, events_stream

__all__ = ["drain", "events_stream"]
