"""Structured Streaming: incremental index maintenance and streaming stats."""

from gensim_spark.streaming import incremental  # noqa: F401
