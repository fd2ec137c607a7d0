"""The `tiered_segments` PySpark Python DataSource: full read parity with
the mapInPandas reader, offset-range + partition pushdown pruning at
planning time (no manifest fetches), and residual row-level filtering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.sources.datasource import (
    TieredSegmentsReader,
    register,
)
from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
    manager_conf,
    read_tiered_records,
    tier_events_table,
)
from tiered_storage_for_apache_kafka_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiered_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds-store"))
    conf = manager_conf(root, chunk_size=2048, compression=True)
    events = load_table(spark, SF, "events")
    # small segments so each topic-partition holds several → offset
    # pruning has real segments to skip
    manifests = tier_events_table(spark, events, conf, records_per_segment=50).cache()
    manifests.count()
    register(spark)
    return root, conf, manifests


def _read_ds(spark, root, **opts):
    r = spark.read.format("tiered_segments").option("root", root)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_datasource_full_parity(spark, tiered_root):
    root, conf, manifests = tiered_root
    via_ds = _read_ds(spark, root)
    via_map = read_tiered_records(spark, manifests, conf)
    assert sorted(map(tuple, via_ds.collect())) == sorted(
        map(tuple, via_map.collect())
    )


def test_datasource_offset_pushdown_prunes_segments(spark, tiered_root):
    root, conf, manifests = tiered_root
    lo, hi = 100, 220
    got = (
        _read_ds(spark, root)
        .filter((F.col("offset") >= lo) & (F.col("offset") <= hi))
        .select("offset")
        .collect()
    )
    expect = (
        read_tiered_records(spark, manifests, conf, min_offset=lo, max_offset=hi)
        .select("offset")
        .collect()
    )
    assert sorted(r.offset for r in got) == sorted(r.offset for r in expect)
    assert len(got) == hi - lo + 1  # events offsets are dense event_ids

    # planning-level proof: the reader plans strictly fewer segment tasks
    # under the pushed range than for the full scan
    full = TieredSegmentsReader({"root": root})
    n_full = len(full.partitions())
    pruned = TieredSegmentsReader(
        {"root": root, "min_offset": str(lo), "max_offset": str(hi)}
    )
    n_pruned = len(pruned.partitions())
    assert 0 < n_pruned < n_full


def test_datasource_partition_filter(spark, tiered_root):
    root, conf, manifests = tiered_root
    got = _read_ds(spark, root).filter(F.col("partition") == 2)
    assert got.select("partition").distinct().collect() == [(2,)]
    expect = (
        read_tiered_records(spark, manifests, conf)
        .filter(F.col("partition") == 2)
        .count()
    )
    assert got.count() == expect


def test_datasource_stream_reader_incremental(spark, tmp_path):
    """readStream over tiered segments: first availableNow batch drains
    the store; after more segments are tiered, a second run from the same
    checkpoint consumes exactly the delta."""
    from tiered_storage_for_apache_kafka_spark.tables import load_table

    root = str(tmp_path / "stream-store")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    conf = manager_conf(root, chunk_size=2048, compression=True)
    events = load_table(spark, SF, "events")
    first = events.filter(F.col("event_id") < 500)
    second = events.filter(F.col("event_id") >= 500)

    def drain():
        register(spark)
        q = (
            spark.readStream.format("tiered_segments")
            .option("root", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    tier_events_table(spark, first, conf, records_per_segment=50).count()
    drain()
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 500

    tier_events_table(spark, second, conf, records_per_segment=50).count()
    drain()
    got = spark.read.parquet(out_dir)
    assert got.count() == 1000  # exactly the delta was appended
    offsets = sorted(r.offset for r in got.select("offset").collect())
    assert offsets == list(range(1000))


def test_datasource_contradictory_bounds_empty_not_crash(spark, tiered_root):
    """offset >= a AND offset <= b with b < a: pushdown plans an empty
    byte window on the open-ended last segment per partition — must
    return zero rows, not raise InvalidRangeError inside the task."""
    root, conf, manifests = tiered_root
    got = (
        _read_ds(spark, root)
        .filter((F.col("offset") >= 1210) & (F.col("offset") <= 1020))
        .count()
    )
    assert got == 0


def test_stream_reader_max_segments_per_trigger(spark, tmp_path):
    """Admission control: with maxSegmentsPerTrigger=N a backfill over a
    populated store drains as a sequence of bounded micro-batches (at
    most N segments each), not one unbounded batch — the Kafka
    maxOffsetsPerTrigger analog at this source's unit of consumption."""
    from tiered_storage_for_apache_kafka_spark.tables import load_table

    root = str(tmp_path / "throttle-store")
    conf = manager_conf(root, chunk_size=2048, compression=True)
    events = load_table(spark, SF, "events").filter(F.col("event_id") < 500)
    n_segs = tier_events_table(spark, events, conf, records_per_segment=50).count()
    assert n_segs >= 8

    register(spark)
    batches: list[tuple[int, int]] = []  # (n_segments, n_rows)

    def record(df, _bid):
        rows = df.collect()
        batches.append((len({r.segment_uuid for r in rows}), len(rows)))

    q = (
        spark.readStream.format("tiered_segments")
        .option("root", root)
        .option("maxSegmentsPerTrigger", "3")
        .option("throttleStateDir", str(tmp_path / "ckpt" / "throttle"))
        .load()
        .writeStream.foreachBatch(record)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    non_empty = [b for b in batches if b[1] > 0]
    assert sum(r for _s, r in non_empty) == 500  # fully drained, no dupes
    assert all(s <= 3 for s, _r in non_empty), non_empty
    assert len(non_empty) >= (n_segs + 2) // 3  # genuinely split up


def test_stream_reader_throttle_restart_safe(spark, tmp_path):
    """A restarted throttled query (same checkpoint + throttleStateDir)
    consumes exactly the delta — no duplicates, still capped."""
    from tiered_storage_for_apache_kafka_spark.tables import load_table

    root = str(tmp_path / "throttle-store")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "ckpt" / "throttle")
    conf = manager_conf(root, chunk_size=2048, compression=True)
    events = load_table(spark, SF, "events")
    batches: list[tuple[int, int]] = []

    def record(df, _bid):
        rows = df.collect()
        batches.append((len({r.segment_uuid for r in rows}), len(rows)))

    def drain():
        register(spark)
        q = (
            spark.readStream.format("tiered_segments")
            .option("root", root)
            .option("maxSegmentsPerTrigger", "2")
            .option("throttleStateDir", state)
            .load()
            .writeStream.foreachBatch(record)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    tier_events_table(
        spark, events.filter(F.col("event_id") < 400), conf, records_per_segment=50
    ).count()
    drain()
    rows_run1 = sum(r for _s, r in batches)
    assert rows_run1 == 400

    tier_events_table(
        spark, events.filter(F.col("event_id") >= 400).filter(F.col("event_id") < 600),
        conf, records_per_segment=50,
    ).count()
    drain()
    assert sum(r for _s, r in batches) == 600  # only the delta, no dupes
    assert all(s <= 2 for s, _r in batches if _r > 0), batches


def test_write_path_roundtrip(spark, tmp_path):
    """df.write.format('tiered_segments') tiers records through the full
    copy pipeline; reading the same store back through the source
    returns exactly the written records."""
    root = str(tmp_path / "written-store")
    register(spark)
    df = (
        spark.range(1000)
        .selectExpr(
            "CAST(id % 4 AS INT) AS partition",
            "id AS offset",
            "id * 1000 AS timestamp_us",
            "CAST(CONCAT('k', id % 7) AS BINARY) AS key",
            "CAST(CONCAT('v', id) AS BINARY) AS value",
        )
        .repartition(4, "partition")
        .sortWithinPartitions("offset")
    )
    (
        df.write.format("tiered_segments")
        .option("root", root)
        .option("records_per_segment", "100")
        .mode("append")
        .save()
    )
    back = (
        spark.read.format("tiered_segments").option("root", root).load()
    )
    assert back.count() == 1000
    got = {
        (r.partition, r.offset, r.timestamp_us, bytes(r.key), bytes(r.value))
        for r in back.collect()
    }
    want = {
        (i % 4, i, i * 1000, f"k{i % 7}".encode(), f"v{i}".encode())
        for i in range(1000)
    }
    assert got == want
    # segment cutting honored: 1000 rows / 4 partitions / 100-record segs
    segs = {r.segment_uuid for r in back.select("segment_uuid").distinct().collect()}
    assert len(segs) == 12  # ceil(250/100)=3 per partition x 4


def test_write_path_validation_and_abort(spark, tmp_path):
    import pytest as _pytest

    from tiered_storage_for_apache_kafka_spark.sources.datasource import (
        SegmentsCommitMessage,
        TieredSegmentsWriter,
        _build_manager,
    )

    root = str(tmp_path / "abort-store")
    register(spark)
    good = spark.range(10).selectExpr(
        "CAST(0 AS INT) AS partition", "id AS offset",
        "id AS timestamp_us", "CAST(NULL AS BINARY) AS key",
        "CAST('x' AS BINARY) AS value",
    )
    # overwrite rejected (append-only log)
    with _pytest.raises(Exception, match="append-only"):
        good.write.format("tiered_segments").option("root", root).mode(
            "overwrite"
        ).save()
    # missing columns rejected at planning time
    with _pytest.raises(Exception, match="missing"):
        spark.range(5).selectExpr("id AS offset").write.format(
            "tiered_segments"
        ).option("root", root).mode("append").save()

    # abort deletes every upload — including those of a task that died
    # BEFORE returning its commit message (found via staging markers)
    writer = TieredSegmentsWriter({"root": root}, good.schema, False)
    msg = writer.write(iter(good.collect()))
    mgr = _build_manager({"root": root})
    assert mgr.backend.list_keys("")  # segments + staging marker landed
    assert mgr.backend.list_keys(writer._staging_prefix())
    # pass NO commit messages: simulates the failed-task case
    writer.abort([])
    assert mgr.backend.list_keys("") == []

    # commit drops the markers but keeps the segments
    writer2 = TieredSegmentsWriter({"root": root}, good.schema, False)
    msg2 = writer2.write(iter(good.collect()))
    writer2.commit([msg2])
    assert mgr.backend.list_keys(writer2._staging_prefix()) == []
    remaining = mgr.backend.list_keys("")
    assert remaining and all(not k.startswith("_staging/") for k in remaining)


def _band_df(spark, start, end, seg):
    """One offset band of the envelope (shared by the iceberg_inc
    stream tests; single writer task -> one file per partition dir)."""
    from pyspark.sql import functions as F

    return (
        spark.range(start, end)
        .select(
            (F.col("id") % 2).cast("int").alias("partition"),
            F.struct(
                (F.col("id") % 2).cast("int").alias("partition"),
                F.col("id").alias("offset"),
                (F.col("id") * 1000).alias("timestamp_us"),
                F.col("id").alias("batch_base_offset"),
                F.lit(0).cast("long").alias("batch_byte_offset"),
                F.lit(seg).alias("segment_uuid"),
            ).alias("kafka"),
            F.array().cast(
                "array<struct<key:string,value:binary>>"
            ).alias("headers"),
            F.encode(F.col("id").cast("string"), "UTF-8").alias("key"),
            F.encode(F.col("id").cast("string"), "UTF-8").alias("value"),
        )
        .coalesce(1)
    )


class TestIcebergIncrementalStream:
    """Streaming read of the Iceberg metadata plane: one micro-batch
    per admitted snapshot window, compaction invisible, deletes fail
    the batch explicitly."""

    def _banded(self, spark, tmp_path, n_bands=3):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir = str(tmp_path / "stream_table")
        for band in range(n_bands):
            df = _band_df(spark, band * 100, band * 100 + 100, f"seg-{band}")
            write_table(df, tdir)
            ice.commit_append(tdir, df.schema)
        return tdir

    def test_available_now_consumes_all_snapshots(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
            register,
        )

        register(spark)
        tdir = self._banded(spark, tmp_path)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        q = (
            spark.readStream.format("iceberg_inc")
            .option("path", tdir)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        assert got.count() == 300
        assert got.agg({"kafka.offset": "max"}).collect()[0][0] == 299
        # hive partition column reattached correctly
        assert got.where("partition = kafka.partition").count() == 300

    def test_source_predicates_scope_the_stream(self, spark, tmp_path):
        """sourcePredicates (JSON option): the stream plans only the
        matching partitions' files and applies the row residual — the
        per-partition streaming subscription (r8)."""
        import json as _json

        from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
            register,
        )

        register(spark)
        tdir = self._banded(spark, tmp_path)
        out = str(tmp_path / "out_scoped")
        ckpt = str(tmp_path / "ckpt_scoped")
        q = (
            spark.readStream.format("iceberg_inc")
            .option("path", tdir)
            .option(
                "sourcePredicates", _json.dumps({"partition": 1})
            )
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        assert got.count() == 150  # odd ids only
        assert got.where("partition <> 1").count() == 0

    def test_throttled_resume_consumes_delta_only(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
            register,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        register(spark)
        tdir = self._banded(spark, tmp_path)
        out = str(tmp_path / "out2")
        ckpt = str(tmp_path / "ckpt2")

        def run_once():
            q = (
                spark.readStream.format("iceberg_inc")
                .option("path", tdir)
                .option("maxSnapshotsPerTrigger", "1")
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        assert spark.read.parquet(out).count() == 300
        # compaction, then one more band: restart reads ONLY the new band
        ice.rewrite_manifests(tdir)
        df = _band_df(spark, 300, 400, "seg-3")
        write_table(df, tdir)
        ice.commit_append(tdir, df.schema)
        run_once()
        got = spark.read.parquet(out)
        assert got.count() == 400  # 300 + the new band, never re-read
        assert got.select("kafka.offset").distinct().count() == 400

    def test_throttle_binds_with_state_dir(self, spark, tmp_path):
        """With throttleStateDir the cap is effective from the first
        batch of a resumed run: 3 new snapshots at cap=1 -> 3 distinct
        micro-batches (counted from the checkpoint offsets log)."""
        import os

        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
            register,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        register(spark)
        tdir = self._banded(spark, tmp_path, n_bands=1)
        out = str(tmp_path / "out3")
        ckpt = str(tmp_path / "ckpt3")
        state = os.path.join(ckpt, "throttle")

        def run_once():
            q = (
                spark.readStream.format("iceberg_inc")
                .option("path", tdir)
                .option("maxSnapshotsPerTrigger", "1")
                .option("throttleStateDir", state)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        for band in range(1, 4):
            df = _band_df(spark, band * 100, band * 100 + 100, f"seg-{band}")
            write_table(df, tdir)
            ice.commit_append(tdir, df.schema)
        # availableNow fixes its endpoint at the run's first
        # latestOffset, so cap=1 admits exactly ONE snapshot per run:
        # three runs drain the three new snapshots one at a time
        counts = []
        for _ in range(3):
            run_once()
            counts.append(spark.read.parquet(out).count())
        assert counts == [200, 300, 400]
        # a fourth run finds nothing new
        run_once()
        assert spark.read.parquet(out).count() == 400


class TestIcebergStreamMultiField:
    """Round-9: the stream source's throttle/state machinery re-run
    over a (day(ts), bucket[4](id)) table with a composite
    sourcePredicates scope — the r8 tests only exercised single-field
    identity tables."""

    MICROS_PER_DAY = 86_400_000_000
    DAY0 = 17000
    SPEC = [("ts_day", "day", "ts_us"), ("id_bucket", "bucket[4]", "id")]

    def _band(self, spark, b):
        rows = [
            (i, (self.DAY0 + (i % 4)) * self.MICROS_PER_DAY + i, i * 10)
            for i in range(b * 100, b * 100 + 100)
        ]
        return spark.createDataFrame(rows, "id long, ts_us long, v long")

    def test_throttle_state_composite_scope(self, spark, tmp_path):
        import json as _json
        import os

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
            register,
        )

        register(spark)
        tdir = str(tmp_path / "mf_stream")
        write_iceberg_table(
            spark, self._band(spark, 0), tdir,
            partition_spec=self.SPEC, now_ms=1_000,
        )
        out = str(tmp_path / "out_mf")
        ckpt = str(tmp_path / "ckpt_mf")
        state = os.path.join(ckpt, "throttle")
        day_window = [
            self.DAY0 * self.MICROS_PER_DAY,
            (self.DAY0 + 1) * self.MICROS_PER_DAY - 1,
        ]
        scope = _json.dumps({"ts_us": day_window, "id": [0, 399]})

        def run_once():
            q = (
                spark.readStream.format("iceberg_inc")
                .option("path", tdir)
                .option("maxSnapshotsPerTrigger", "1")
                .option("throttleStateDir", state)
                .option("sourcePredicates", scope)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        # band 0: ids with i % 4 == 0 land on DAY0 -> 25 rows in scope
        assert spark.read.parquet(out).count() == 25
        for b in range(1, 4):
            write_iceberg_table(
                spark, self._band(spark, b), tdir,
                partition_spec=self.SPEC, now_ms=1_000 * (b + 1),
            )
        # cap=1 + state dir: each availableNow run drains exactly ONE
        # of the three new snapshots, scoped rows only
        counts = []
        for _ in range(3):
            run_once()
            counts.append(spark.read.parquet(out).count())
        assert counts == [50, 75, 100]
        run_once()  # nothing new
        got = spark.read.parquet(out)
        assert got.count() == 100
        # every delivered row satisfies BOTH scope predicates exactly
        assert got.where(
            f"ts_us < {day_window[0]} OR ts_us > {day_window[1]}"
        ).count() == 0
        assert got.where("id % 4 <> 0 OR id > 399").count() == 0
        assert got.select("id").distinct().count() == 100

    def test_bucket_eq_scope_on_stream(self, spark, tmp_path):
        """A bucket-transformable equality scope on the stream: one
        key's rows arrive, nothing else."""
        import json as _json

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
            register,
        )

        register(spark)
        tdir = str(tmp_path / "mf_stream_eq")
        for b in range(2):
            write_iceberg_table(
                spark, self._band(spark, b), tdir,
                partition_spec=self.SPEC, now_ms=1_000 * (b + 1),
            )
        out = str(tmp_path / "out_eq")
        ckpt = str(tmp_path / "ckpt_eq")
        q = (
            spark.readStream.format("iceberg_inc")
            .option("path", tdir)
            .option("sourcePredicates", _json.dumps({"id": 107}))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out).collect()
        assert [(r["id"], r["v"]) for r in got] == [(107, 1070)]
