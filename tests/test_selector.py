"""Dual-engine selector (InternalRemoteStorageManagerSelector parity):
mixed-format topics — some segments only in the object store, some only
in the envelope table — are all byte-exactly readable through one API,
with KeyNotFoundError-driven fallback."""

from __future__ import annotations

import pytest

from tiered_storage_for_apache_kafka_spark.api import SegmentMetadata
from tiered_storage_for_apache_kafka_spark.selector import DualEngineFetcher
from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
    _build_manager,
    manager_conf,
    read_tiered_records,
    tier_events_table,
)
from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
    records_to_envelope,
)
from tiered_storage_for_apache_kafka_spark.storage.backend import KeyNotFoundError
from tiered_storage_for_apache_kafka_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_mixed_format_fallback(spark, tmp_path):
    conf = manager_conf(str(tmp_path / "store"), chunk_size=2048)
    events = load_table(spark, SF, "events")
    manifests = tier_events_table(spark, events, conf, records_per_segment=100)
    seg_rows = manifests.collect()
    assert len(seg_rows) >= 8

    # persist the envelope table BEFORE deleting any byte segments (the
    # table engine's copy of the data)
    env_dir = str(tmp_path / "envelope")
    records_to_envelope(read_tiered_records(spark, manifests, conf)).write.parquet(
        env_dir
    )
    envelope = spark.read.parquet(env_dir)

    mgr = _build_manager(conf)

    def meta_of(r) -> SegmentMetadata:
        return SegmentMetadata(
            "events", "events-tid", r.partition, r.start_offset,
            r.end_offset, r.segment_uuid,
        )

    originals = {
        r.segment_uuid: b"".join(mgr.fetch_log_segment(meta_of(r), 0))
        for r in seg_rows
    }

    # drop every other segment from the object store → table-only
    table_only = [r for i, r in enumerate(seg_rows) if i % 2 == 0]
    for r in table_only:
        mgr.delete_log_segment_data(meta_of(r))

    fetcher = DualEngineFetcher(mgr, envelope)
    for r in seg_rows:
        assert fetcher.fetch_segment(meta_of(r)) == originals[r.segment_uuid]

    # a segment in neither engine surfaces the primary's miss
    ghost = SegmentMetadata("events", "events-tid", 0, 10**9, 10**9 + 1, "ghost")
    with pytest.raises(KeyNotFoundError):
        fetcher.fetch_segment(ghost)

    # table-primary dispatch works symmetrically
    fetcher_t = DualEngineFetcher(mgr, envelope, primary="table")
    some = seg_rows[1]  # byte-only after deletions? index 1 is odd → kept
    assert fetcher_t.fetch_segment(meta_of(some)) == originals[some.segment_uuid]
