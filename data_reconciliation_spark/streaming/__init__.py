"""Structured Streaming surface."""

from data_reconciliation_spark.streaming.incremental import (  # noqa: F401
    incremental_exception_stream,
    windowed_event_dedup,
)
