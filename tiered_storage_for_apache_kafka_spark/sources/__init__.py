"""Sources & sinks bridging Spark and the tiered-storage byte engine."""

from tiered_storage_for_apache_kafka_spark.sources.segment_source import (  # noqa: F401
    read_tiered_records,
    tier_events_table,
)
