"""Structured Streaming: windowed aggs, session windows, stateful
operator, and the foreachBatch segment-ingest commit path."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
    decode_events,
    manager_conf,
    read_tiered_records,
)
from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
    run_stream_to_memory,
    stream_events,
    stream_session_windows,
    stream_tier_events,
)
from tiered_storage_for_apache_kafka_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_stream_source_schema_matches_batch(spark):
    stream = stream_events(spark, SF)
    assert stream.isStreaming
    batch = load_table(spark, SF, "events")
    assert dict(stream.dtypes) == dict(batch.dtypes)


def test_session_windows_plumbing(spark):
    out = run_stream_to_memory(
        stream_session_windows(stream_events(spark, SF)), "complete"
    )
    rows = out.collect()
    assert len(rows) > 0
    assert {r["user_id"] for r in rows} <= set(range(0, 200))
    # sessions per user are disjoint in time => count per user >= 1
    assert all(r["n_events"] >= 1 for r in rows)


def test_stream_tier_events_commit_and_readback(spark, tmp_path):
    conf = manager_conf(str(tmp_path / "store"), chunk_size=2048, compression=True)
    stream_tier_events(
        spark,
        SF,
        conf,
        manifest_dir=str(tmp_path / "manifests"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    manifests = spark.read.parquet(str(tmp_path / "manifests"))
    n_events = load_table(spark, SF, "events").count()
    assert manifests.agg(F.sum("n_records")).collect()[0][0] == n_events
    # read every record back through the byte engine
    events_back = decode_events(read_tiered_records(spark, manifests, conf))
    assert events_back.count() == n_events
    orig_sum = load_table(spark, SF, "events").agg(
        F.sum(F.col("value").cast("decimal(18,4)"))
    ).collect()[0][0]
    back_sum = events_back.agg(F.sum(F.col("value").cast("decimal(18,4)"))).collect()[0][0]
    assert orig_sum == back_sum

    # idempotency: re-running with the same checkpoint is a no-op
    stream_tier_events(
        spark,
        SF,
        conf,
        manifest_dir=str(tmp_path / "manifests"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert spark.read.parquet(str(tmp_path / "manifests")).count() == manifests.count()


def test_streaming_metrics_listener(spark, tmp_path):
    """The listener turns StreamingQueryProgress into engine metrics."""
    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.metrics import (
        StreamingMetricsListener,
    )

    listener = StreamingMetricsListener()
    spark.streams.addListener(listener)
    try:
        df = spark.readStream.format("rate").option("rowsPerSecond", 50).load()
        q = (
            df.select(F.col("value"))
            .writeStream.format("memory")
            .queryName("metrics_probe")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        import time as _t

        deadline = _t.time() + 30
        while _t.time() < deadline:
            snap = listener.metrics.snapshot()
            if snap.get('stream.rows[query=metrics_probe]', 0) > 0:
                break
            _t.sleep(0.5)
        q.stop()
        snap = listener.metrics.snapshot()
        assert snap.get('stream.batch[query=metrics_probe]', 0) >= 1
        assert snap.get('stream.rows[query=metrics_probe]', 0) > 0
    finally:
        spark.streams.removeListener(listener)


def test_stream_stream_interval_join(spark):
    """The watermarked stream-stream join produces exactly the rows the
    equivalent batch join produces over the full dataset."""
    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        run_stream_to_memory,
        stream_events,
        stream_purchase_click_join,
    )
    from tiered_storage_for_apache_kafka_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    joined = stream_purchase_click_join(stream_events(spark, sf))
    got = run_stream_to_memory(joined, "append")

    e = load_table(spark, sf, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    expect = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"))

    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))
    assert got.count() > 0


def test_commit_manifests_idempotent_on_replay(spark, tmp_path):
    """foreachBatch replay semantics: committing the same batch twice
    (failure between parquet commit and checkpoint advance) must not
    leave duplicate segment_uuid rows; distinct batches both persist."""
    from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
        manager_conf,
        tier_events_table,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        commit_manifests,
    )

    sf = "/root/testdata/sf0.001"
    conf = manager_conf(str(tmp_path / "store"), chunk_size=2048)
    events = load_table(spark, sf, "events")
    first_half = events.filter(F.col("event_id") < 500)
    second_half = events.filter(F.col("event_id") >= 500)
    mdir = str(tmp_path / "manifests")

    m0 = tier_events_table(spark, first_half, conf)
    commit_manifests(m0, 0, mdir)
    commit_manifests(m0, 0, mdir)  # replayed batch: must overwrite, not append
    m1 = tier_events_table(spark, second_half, conf)
    commit_manifests(m1, 1, mdir)

    log = spark.read.parquet(mdir)
    total = log.count()
    assert log.select("segment_uuid").distinct().count() == total
    assert log.filter(F.col("batch_id") == 0).count() == m0.count()
    assert log.filter(F.col("batch_id") == 1).count() == m1.count()
    # reader-side totals don't double-count
    n = log.agg(F.sum("n_records")).collect()[0][0]
    assert n == events.count()


def test_transform_with_state_composite_counts(spark):
    """transformWithState (Spark 4 successor API): ValueState totals +
    MapState per-type counts. The runner needs protobuf; skip where the
    environment doesn't ship it (the operator is registered as a driver
    query only in environments that do).

    RETIRED as permanent-environmental (r8, COVERAGE.md "Known
    permanent skips"): the generated ``StateMessage_pb2`` needs the
    full protobuf runtime (descriptor pool + builder + runtime_version
    checks) — a vendored shim would reimplement protobuf's descriptor
    machinery to test SPARK'S runner, not this operator, with silent
    wire-corruption as the failure mode. The operator + oracle stay
    real and self-activate wherever protobuf exists."""
    pytest.importorskip("google.protobuf")
    from tiered_storage_for_apache_kafka_spark.operators.streaming_queries import (
        streaming_user_type_counts_tws,
    )

    out = streaming_user_type_counts_tws(spark, SF)
    rows = out.collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in by_user.items():
        assert sum(r.n_type for r in rs) == rs[0].n_events
        assert len({r.n_events for r in rs}) == 1  # consistent user totals
