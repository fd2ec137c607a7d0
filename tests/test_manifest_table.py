"""Relational metadata plane: manifests/chunks DataFrames must agree 1:1
with the Python engine's chunk indexes and fetch planning; vacuum must
delete exactly the expired segments."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.manifest.manifest import SegmentManifest
from tiered_storage_for_apache_kafka_spark.sources.manifest_table import (
    chunks_df,
    load_manifests_df,
    plan_fetch_ranges,
    vacuum_expired_segments,
)
from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
    _build_manager,
    manager_conf,
    tier_events_table,
)
from tiered_storage_for_apache_kafka_spark.storage.backend import BytesRange
from tiered_storage_for_apache_kafka_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("mstore")
    conf = manager_conf(str(root), chunk_size=2048, compression=True)
    tier_events_table(spark, load_table(spark, SF, "events"), conf).count()
    return conf


def _python_indexes(conf):
    mgr = _build_manager(conf)
    out = {}
    for key in mgr.backend.list_keys():
        if key.endswith(".rsm-manifest"):
            with mgr.backend.fetch(key) as f:
                m = SegmentManifest.from_json(f.read())
            out[m.segment_uuid] = m.chunk_index
    return out


def test_manifests_df_matches_python(spark, store):
    mdf = load_manifests_df(spark, store).collect()
    indexes = _python_indexes(store)
    assert {r["segment_uuid"] for r in mdf} == set(indexes)
    for r in mdf:
        idx = indexes[r["segment_uuid"]]
        assert r["original_file_size"] == idx.original_file_size
        assert r["index_type"] == "variable"  # compression on
        assert r["compression"] is True


def test_chunks_df_matches_python_index(spark, store):
    manifests = load_manifests_df(spark, store)
    rows = chunks_df(manifests).collect()
    indexes = _python_indexes(store)
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r["segment_uuid"], []).append(r)
    for uuid, idx in indexes.items():
        got = sorted(by_seg[uuid], key=lambda r: r["id"])
        want = idx.chunks()
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert (
                g["original_position"], g["original_size"],
                g["transformed_position"], g["transformed_size"],
            ) == (
                w.original_position, w.original_size,
                w.transformed_position, w.transformed_size,
            ), f"segment {uuid} chunk {w.id}"


def test_plan_fetch_ranges_matches_python_planner(spark, store):
    manifests = load_manifests_df(spark, store)
    indexes = _python_indexes(store)
    # build requests covering borders and clamps for 3 segments
    reqs = []
    rid = 0
    for uuid, idx in sorted(indexes.items())[:3]:
        size = idx.original_file_size
        for lo, hi in [(0, 0), (0, size - 1), (2047, 2048), (size // 2, size - 1)]:
            reqs.append((rid, uuid, lo, hi))
            rid += 1
    req_df = spark.createDataFrame(
        reqs, "request_id INT, segment_uuid STRING, start_pos BIGINT, end_pos BIGINT"
    )
    plan = plan_fetch_ranges(manifests, req_df).collect()
    planned = {}
    for r in plan:
        planned.setdefault(r["request_id"], []).append(r)
    for rid_, uuid, lo, hi in reqs:
        idx = indexes[uuid]
        want = idx.chunks_for_range(BytesRange(lo, hi))
        got = sorted(planned[rid_], key=lambda r: r["chunk_id"])
        assert [g["chunk_id"] for g in got] == [w.id for w in want], (rid_, uuid)
        assert [g["transformed_position"] for g in got] == [
            w.transformed_position for w in want
        ]
        # reconstructed byte count == requested range size
        assert sum(g["take_bytes"] for g in got) == hi - lo + 1


def test_vacuum_deletes_only_expired(spark, store):
    manifests = load_manifests_df(spark, store).cache()
    total = manifests.count()
    # expire exactly the earliest segment(s): watermark just above the
    # smallest end_offset
    watermark = manifests.agg(F.min("end_offset")).collect()[0][0] + 1
    expired = manifests.filter(F.col("end_offset") < watermark).count()
    assert 0 < expired < total
    deleted = vacuum_expired_segments(spark, manifests, store, watermark).count()
    assert deleted == expired
    remaining = load_manifests_df(spark, store)
    assert remaining.count() == total - expired
    assert remaining.filter(F.col("end_offset") < watermark).count() == 0
