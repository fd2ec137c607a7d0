"""Table mode: envelope projection, pushdown scan, batch grouping and
BYTE-EXACT segment re-encode (the I11/I12 hard part) — the analog of the
reference's BatchEnumeration/RecordBatchGrouper tests plus the e2e
every-offset verification of SingleBrokerTest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
    manager_conf,
    read_tiered_records,
    tier_events_table,
)
from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
    read_table,
    reassemble_batches,
    records_to_envelope,
    segment_bytes,
    write_table,
)
from tiered_storage_for_apache_kafka_spark.tables import load_table
from tiered_storage_for_apache_kafka_spark.wire import Record, decode_segment, encode_batch

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiered(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("store")
    conf = manager_conf(str(root), chunk_size=2048, compression=True)
    events = load_table(spark, SF, "events")
    manifests = tier_events_table(spark, events, conf).cache()
    manifests.count()
    return conf, manifests


def test_wire_headers_roundtrip():
    records = [
        Record(5, 1000, b"k", b"v", (("h1", b"x"), ("h2", b""))),
        Record(6, 1001, None, b"w"),
    ]
    blob = encode_batch(records)
    [(base, byte_off, back)] = decode_segment(blob)
    assert base == 5 and byte_off == 0
    assert back == records


def test_envelope_schema(spark, tiered):
    conf, manifests = tiered
    env = records_to_envelope(read_tiered_records(spark, manifests, conf))
    kafka_fields = {f.name for f in env.schema["kafka"].dataType.fields}
    assert {"partition", "offset", "timestamp_us", "batch_base_offset",
            "batch_byte_offset", "segment_uuid"} == kafka_fields
    assert env.schema["headers"].dataType.simpleString() == (
        "array<struct<key:string,value:binary>>"
    )


def test_pushdown_scan_and_reassembly_byte_exact(spark, tiered, tmp_path):
    conf, manifests = tiered
    table_dir = str(tmp_path / "table")
    records = read_tiered_records(spark, manifests, conf)
    write_table(records_to_envelope(records), table_dir)

    # pushdown reaches the parquet scan
    plan = read_table(spark, table_dir, partition=1, start_offset=100)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "offset" in plan

    # reassemble EVERY segment and compare byte-for-byte with the
    # original blob served by the byte engine
    env = read_table(spark, table_dir)
    blobs = {
        (r["partition"], r["segment_uuid"]): r["segment_blob"]
        for r in segment_bytes(reassemble_batches(env)).collect()
    }
    from tiered_storage_for_apache_kafka_spark.api import SegmentMetadata
    from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
        TOPIC,
        TOPIC_ID,
        _build_manager,
    )

    mgr = _build_manager(conf)
    for m in manifests.collect():
        meta = SegmentMetadata(
            TOPIC, TOPIC_ID, m["partition"], m["start_offset"],
            m["end_offset"], m["segment_uuid"],
        )
        original = b"".join(mgr.fetch_log_segment(meta, 0))
        assert blobs[(m["partition"], m["segment_uuid"])] == original, (
            f"segment {m['segment_uuid']} not byte-exact"
        )


def test_offset_range_scan_matches_source(spark, tiered, tmp_path):
    conf, manifests = tiered
    table_dir = str(tmp_path / "table2")
    write_table(records_to_envelope(read_tiered_records(spark, manifests, conf)), table_dir)
    got = (
        read_table(spark, table_dir, partition=2, start_offset=100, end_offset=500)
        .select(F.col("kafka.offset").alias("o"))
        .collect()
    )
    events = load_table(spark, SF, "events")
    want = (
        events.filter(
            (F.col("event_id") % 4 == 2)
            & F.col("event_id").between(100, 500)
        ).count()
    )
    assert len(got) == want
    assert all(100 <= r["o"] <= 500 for r in got)
