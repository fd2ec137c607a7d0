"""Structured Streaming: ingest pipeline and streaming operators."""

from tiered_storage_for_apache_kafka_spark.streaming.ingest import (  # noqa: F401
    run_stream_to_memory,
    stream_events,
    stream_session_windows,
    stream_tier_events,
    stream_user_totals_stateful,
    stream_windowed_counts,
)
