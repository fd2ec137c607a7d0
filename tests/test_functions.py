"""Registered SQL functions: the chunk_plan UDTF must agree with the
chunk-index planner (the Python/arithmetic source of truth), and the
approx-distinct sketch must land within its error envelope."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.functions import register_functions
from tiered_storage_for_apache_kafka_spark.manifest.chunk_index import (
    FixedSizeChunkIndex,
)
from tiered_storage_for_apache_kafka_spark.storage.backend import BytesRange
from tiered_storage_for_apache_kafka_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def test_chunk_plan_udtf_matches_planner(spark):
    register_functions(spark)
    file_size, chunk, lo, hi = 10_000, 1024, 1500, 7300
    rows = spark.sql(
        f"SELECT * FROM chunk_plan({file_size}, {chunk}, {lo}, {hi})"
    ).collect()

    idx = FixedSizeChunkIndex(
        chunk, file_size, transformed_chunk_size=chunk,
        final_transformed_chunk_size=file_size % chunk or chunk,
    )
    expected = idx.chunks_for_range(BytesRange(lo, hi))
    assert [r.chunk_id for r in rows] == [c.id for c in expected]
    assert [r.original_position for r in rows] == [c.original_position for c in expected]
    # taken bytes across chunks reassemble exactly the requested range
    assert sum(r.fetch_take for r in rows) == hi - lo + 1
    assert rows[0].fetch_skip == lo - rows[0].original_position
    # unaligned tail: the last chunk is short
    tail = spark.sql(
        f"SELECT * FROM chunk_plan({file_size}, {chunk}, {file_size - 10}, {file_size + 999})"
    ).collect()
    assert tail[-1].original_size == file_size % chunk


def test_chunk_plan_udtf_lateral_join(spark):
    """UDTF in a LATERAL join — per-row plans from a manifest-like table."""
    register_functions(spark)
    spark.createDataFrame(
        [(0, 10_000, 1024), (1, 2_048, 1024)], "seg INT, size BIGINT, chunk INT"
    ).createOrReplaceTempView("segments_v")
    rows = spark.sql(
        """
        SELECT s.seg, p.chunk_id, p.fetch_take
        FROM segments_v s, LATERAL chunk_plan(s.size, s.chunk, 0, 4095) p
        """
    ).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.seg, []).append(r)
    assert len(by_seg[0]) == 4  # 4096 bytes / 1024
    assert len(by_seg[1]) == 2  # clamped to 2048-byte file
    assert sum(r.fetch_take for r in by_seg[1]) == 2048


def test_approx_count_distinct_within_envelope(spark):
    """HLL++ sketch (the 100 TB path for distinct-user counts) stays
    within its documented rsd envelope of the exact answer."""
    events = load_table(spark, SF, "events")
    row = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_weighted_mean_udaf_matches_sql(spark):
    """The grouped-agg pandas UDAF equals the pure-SQL weighted mean."""
    from tiered_storage_for_apache_kafka_spark.functions import weighted_mean_udaf

    events = load_table(spark, SF, "events").select(
        "event_type", F.col("value").alias("v"),
        (F.col("user_id") % 7 + 1).cast("double").alias("w"),
    )
    udaf = weighted_mean_udaf()
    got = {
        r.event_type: r.wm
        for r in events.groupBy("event_type")
        .agg(F.round(udaf("v", "w"), 6).alias("wm"))
        .collect()
    }
    expect = {
        r.event_type: r.wm
        for r in events.groupBy("event_type")
        .agg(F.round(F.sum(F.col("v") * F.col("w")) / F.sum("w"), 6).alias("wm"))
        .collect()
    }
    assert got == expect
