"""Iceberg v2 metadata writer: an external-reader-shaped parse-back of
everything `sources/iceberg/` emits (metadata.json -> manifest list
Avro -> manifest Avro -> data files), mirroring the reference's
`IcebergTableManager.java:46-95` commit semantics."""

from __future__ import annotations

import json
import os

import pytest


@pytest.fixture()
def table(spark, tmp_path):
    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.sources.table_mode import write_table

    df = (
        spark.range(200)
        .select(
            (F.col("id") % 4).cast("int").alias("partition"),
            F.struct(
                (F.col("id") % 4).cast("int").alias("partition"),
                F.col("id").alias("offset"),
                (F.col("id") * 1000).alias("timestamp_us"),
                (F.col("id") - F.col("id") % 50).alias("batch_base_offset"),
                F.lit(0).cast("long").alias("batch_byte_offset"),
                F.lit("seg-0").alias("segment_uuid"),
            ).alias("kafka"),
            F.array().cast("array<struct<key:string,value:binary>>").alias("headers"),
            F.encode(F.col("id").cast("string"), "UTF-8").alias("key"),
            F.encode(F.col("id").cast("string"), "UTF-8").alias("value"),
        )
        .repartition(4, "partition")
    )
    tdir = str(tmp_path / "ice_table")
    write_table(df, tdir)
    return tdir, df


class TestAvroOcf:
    def test_roundtrip_with_header_schema(self, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_avro_ocf,
            write_avro_ocf,
        )

        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": "long", "field-id": 1},
                {"name": "b", "type": ["null", "string"], "field-id": 2},
            ],
        }
        recs = [{"a": 1, "b": "x"}, {"a": -7, "b": None}]
        path = str(tmp_path / "t.avro")
        length = write_avro_ocf(path, schema, recs, {"k": b"v"})
        assert length == os.path.getsize(path)
        got_schema, got, meta = read_avro_ocf(path)
        assert got == recs
        assert meta["k"] == b"v"
        # decode used the header-parsed schema (external-reader path)
        assert got_schema["fields"][0]["field-id"] == 1

    def test_empty_file_roundtrips(self, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_avro_ocf,
            write_avro_ocf,
        )

        path = str(tmp_path / "e.avro")
        write_avro_ocf(path, {"type": "record", "name": "r", "fields": []}, [])
        _, got, _ = read_avro_ocf(path)
        assert got == []


class TestCommitAppend:
    def test_first_commit_opens_like_external_reader(self, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_table_metadata,
        )

        tdir, df = table
        meta = commit_append(tdir, df.schema, now_ms=1_000)
        assert meta["format-version"] == 2
        assert meta["current-snapshot-id"] == 1

        back = read_table_metadata(tdir)
        assert back["version"] == 1
        m = back["metadata"]
        # schema: every envelope column present with unique field ids
        names = [f["name"] for f in m["schemas"][0]["fields"]]
        assert names == ["partition", "kafka", "headers", "key", "value"]

        def all_ids(t):
            if isinstance(t, dict) and t.get("type") == "struct":
                for f in t["fields"]:
                    yield f["id"]
                    yield from all_ids(f["type"])
            elif isinstance(t, dict) and t.get("type") == "list":
                yield t["element-id"]
                yield from all_ids(t["element"])

        ids = list(all_ids(m["schemas"][0]))
        assert len(ids) == len(set(ids)) == m["last-column-id"]
        # partition spec points at the partition column's field id
        spec = m["partition-specs"][0]["fields"][0]
        assert spec["transform"] == "identity"
        assert spec["source-id"] == m["schemas"][0]["fields"][0]["id"]

        # manifest list: v2-required fields, counts consistent
        (mf,) = back["manifest_list"]
        assert mf["content"] == 0 and mf["sequence_number"] == 1
        assert mf["added_data_files_count"] == 4
        assert mf["added_rows_count"] == 200
        assert os.path.getsize(mf["manifest_path"]) == mf["manifest_length"]

        # manifest entries: one per data file, footer-true counts
        (man,) = back["manifests"]
        assert man["meta"]["content"] == b"data"
        assert json.loads(man["meta"]["schema"].decode()) == m["schemas"][0]
        entries = man["entries"]
        assert len(entries) == 4
        import pyarrow.parquet as pq

        total = 0
        for e in entries:
            d = e["data_file"]
            assert e["status"] == 1 and d["content"] == 0
            assert d["file_format"] == "PARQUET"
            assert os.path.exists(d["file_path"])
            assert os.path.getsize(d["file_path"]) == d["file_size_in_bytes"]
            assert pq.ParquetFile(d["file_path"]).metadata.num_rows == d["record_count"]
            assert f"partition={d['partition']['partition']}" in d["file_path"]
            assert d["split_offsets"][0] >= 4
            total += d["record_count"]
        assert total == df.count() == 200

    def test_second_append_chains_snapshots(self, table, spark):
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_table_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import write_table

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        extra = df.withColumn("kafka", F.col("kafka")).limit(40).repartition(2, "partition")
        write_table(extra, tdir)
        meta = commit_append(tdir, df.schema, now_ms=2_000)

        assert meta["current-snapshot-id"] == 2
        assert meta["snapshots"][1]["parent-snapshot-id"] == 1
        back = read_table_metadata(tdir)
        assert back["version"] == 2
        # live data = both commits' files; rows = 200 + 40
        rows = sum(
            e["data_file"]["record_count"]
            for man in back["manifests"]
            for e in man["entries"]
        )
        assert rows == 240
        # the new manifest holds only the NEW files
        new_manifest = next(
            man for man in back["manifests"] if man["file"]["sequence_number"] == 2
        )
        assert all(e["sequence_number"] == 2 for e in new_manifest["entries"])
        assert sum(e["data_file"]["record_count"] for e in new_manifest["entries"]) == 40
        # metadata log references v1
        assert meta["metadata-log"][-1]["metadata-file"].endswith("v1.metadata.json")

    def test_commit_with_no_new_files_is_idempotent(self, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_table_metadata,
        )

        tdir, df = table
        m1 = commit_append(tdir, df.schema, now_ms=1_000)
        m2 = commit_append(tdir, df.schema, now_ms=9_000)
        assert m2["current-snapshot-id"] == m1["current-snapshot-id"]
        assert read_table_metadata(tdir)["version"] == 1

    def test_spark_reads_exactly_the_manifest_file_set(self, table, spark):
        """The file set an Iceberg reader would scan (manifest entries)
        is exactly the file set Spark's own parquet reader sees."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_table_metadata,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        back = read_table_metadata(tdir)
        manifest_files = {
            e["data_file"]["file_path"]
            for man in back["manifests"]
            for e in man["entries"]
        }
        spark_files = {
            r.f
            # basePath: the metadata/ dir excludes plain directory
            # discovery, exactly like Iceberg's own data/ vs metadata/
            for r in spark.read.option("basePath", tdir)
            .parquet(tdir + "/partition=*")
            .selectExpr("input_file_name() AS f")
            .distinct()
            .collect()
        }
        assert {os.path.realpath(p) for p in manifest_files} == {
            os.path.realpath(p.removeprefix("file://")) for p in spark_files
        }


class TestScanPlanning:
    def test_plan_scan_prunes_to_partition(self, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            plan_scan,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        all_files = plan_scan(tdir)
        assert len(all_files) == 4
        pruned = plan_scan(tdir, partition_value=2)
        assert len(pruned) == 1
        assert "partition=2" in pruned[0]["file_path"]
        # a value outside the summary bounds prunes the MANIFEST unopened
        assert plan_scan(tdir, partition_value=99) == []

    def test_read_iceberg_table_matches_direct_read(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_iceberg_table,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        through_metadata = read_iceberg_table(spark, tdir)
        assert through_metadata.count() == 200
        one_part = read_iceberg_table(spark, tdir, partition_value=1)
        assert one_part.count() == 50
        # the pruned scan touches exactly one file
        files = {
            r.f
            for r in one_part.selectExpr("input_file_name() AS f").distinct().collect()
        }
        assert len(files) == 1

    def test_deleted_entries_are_skipped(self, table, tmp_path):
        """A manifest entry with status=2 (DELETED) must not be planned."""
        import json

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            plan_scan,
            read_avro_ocf,
            read_table_metadata,
            write_avro_ocf,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        back = read_table_metadata(tdir)
        man = back["manifests"][0]
        path = man["file"]["manifest_path"]
        schema, entries, meta = read_avro_ocf(path)
        entries[0]["status"] = 2  # mark one file deleted
        write_avro_ocf(path, schema, entries, {
            k: v for k, v in meta.items() if k not in ("avro.schema", "avro.codec")
        })
        assert len(plan_scan(tdir)) == 3


class TestPuffinStatistics:
    def test_puffin_roundtrip_and_rejections(self, tmp_path):
        import struct as _struct

        from tiered_storage_for_apache_kafka_spark.sources.puffin import (
            FILE_LIST,
            OFFSET_INDEX,
            read_puffin,
            write_puffin,
        )

        path = str(tmp_path / "s.puffin")
        blobs = [(OFFSET_INDEX, b"\x01" * 32), (FILE_LIST, b'{"a": 1}')]
        stats = write_puffin(path, blobs, snapshot_id=7, sequence_number=3)
        assert stats["file_size"] == os.path.getsize(path)
        back = read_puffin(path)
        assert back["blobs"][OFFSET_INDEX] == b"\x01" * 32
        assert back["blobs"][FILE_LIST] == b'{"a": 1}'
        bm = back["metadata"]["blobs"][0]
        assert bm["snapshot-id"] == 7 and bm["sequence-number"] == 3
        assert back["metadata"]["properties"]["created-by"]

        with pytest.raises(ValueError, match="already written"):
            write_puffin(path, [(FILE_LIST, b"x"), (FILE_LIST, b"y")], 1, 1)
        raw = open(path, "rb").read()
        with pytest.raises(ValueError, match="leading magic"):
            read_puffin_bytes(tmp_path, b"XXXX" + raw[4:])
        with pytest.raises(ValueError, match="trailing magic"):
            read_puffin_bytes(tmp_path, raw[:-4] + b"XXXX")
        # compressed-footer flag rejected
        bad = raw[:-8] + _struct.pack("<i", 1) + raw[-4:]
        with pytest.raises(ValueError, match="compressed Puffin footer"):
            read_puffin_bytes(tmp_path, bad)

    def test_commit_registers_statistics_file(self, table):
        import json as _json

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_table_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.sources.puffin import (
            FILE_LIST,
            OFFSET_INDEX,
            read_puffin,
        )

        tdir, df = table
        commit_append(
            tdir, df.schema, now_ms=1_000,
            stats_blobs=[(OFFSET_INDEX, b"\x02" * 16)],
        )
        meta = read_table_metadata(tdir)["metadata"]
        (entry,) = meta["statistics"]
        assert entry["snapshot-id"] == meta["current-snapshot-id"]
        assert os.path.getsize(entry["statistics-path"]) == entry["file-size-in-bytes"]
        types = {b["type"] for b in entry["blob-metadata"]}
        assert types == {FILE_LIST, OFFSET_INDEX}

        back = read_puffin(entry["statistics-path"])
        assert back["blobs"][OFFSET_INDEX] == b"\x02" * 16
        file_list = _json.loads(back["blobs"][FILE_LIST].decode())
        assert len(file_list) == 4
        assert sum(f["recordCount"] for f in file_list) == 200
        for f in file_list:
            assert os.path.getsize(f["location"]) == f["fileSizeInBytes"]
            assert f"partition={f['partition']}" in f["location"]


def read_puffin_bytes(tmp_path, data: bytes):
    from tiered_storage_for_apache_kafka_spark.sources.puffin import read_puffin

    p = str(tmp_path / "_tmp_probe.puffin")
    with open(p, "wb") as f:
        f.write(data)
    return read_puffin(p)


class TestReviewFixes:
    """Round-5 self-review pins: lazy scan planning, empty scans,
    metadata-lookalike paths."""

    def test_plan_scan_opens_only_surviving_manifests(self, table, monkeypatch):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            scan as ice_scan,
        )

        tdir, df = table
        ice.commit_append(tdir, df.schema, now_ms=1_000)
        opened = []
        real = ice.read_avro_ocf

        def counting(path):
            opened.append(path)
            return real(path)

        # patch the binding plan_scan actually reads (scan module global)
        monkeypatch.setattr(ice_scan, "read_avro_ocf", counting)
        ice.plan_scan(tdir, partition_value=2)
        # one manifest-list read + exactly ONE manifest read (no double)
        assert len(opened) == 2
        opened.clear()
        ice.plan_scan(tdir, partition_value=99)  # outside summary bounds
        assert len(opened) == 1  # only the manifest list; manifest pruned

    def test_empty_scan_returns_typed_zero_rows(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_iceberg_table,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        empty = read_iceberg_table(spark, tdir, partition_value=99)
        assert empty.count() == 0
        assert [f.name for f in empty.schema.fields] == [
            "partition", "kafka", "headers", "key", "value",
        ]
        assert empty.schema["kafka"].dataType.typeName() == "struct"

    def test_metadata_lookalike_ancestor_dir(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_table_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir = str(tmp_path / "metadata_backup" / "table")
        df = (
            spark.range(20)
            .select(
                (F.col("id") % 2).cast("int").alias("partition"),
                F.col("id").alias("v"),
            )
            .repartition(2, "partition")
        )
        write_table(df, tdir)
        commit_append(tdir, df.schema, now_ms=1_000)
        back = read_table_metadata(tdir)
        rows = sum(
            e["data_file"]["record_count"]
            for man in back["manifests"]
            for e in man["entries"]
        )
        assert rows == 20  # data under a metadata-lookalike path still found


class TestMaintenance:
    def _two_commits(self, table, spark):
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        extra = df.limit(40).repartition(2, "partition")
        write_table(extra, tdir)
        commit_append(tdir, df.schema, now_ms=2_000)
        return tdir, df

    def test_time_travel_reads_historical_file_set(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_iceberg_table,
            read_iceberg_table_at,
        )

        tdir, df = self._two_commits(table, spark)
        assert read_iceberg_table(spark, tdir).count() == 240  # current
        assert read_iceberg_table_at(spark, tdir, snapshot_id=1).count() == 200
        assert read_iceberg_table_at(spark, tdir, snapshot_id=2).count() == 240
        with pytest.raises(ValueError, match="not found"):
            read_iceberg_table_at(spark, tdir, snapshot_id=77)

    def test_expire_snapshots_prunes_metadata_not_live_data(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            expire_snapshots,
            read_iceberg_table,
            read_iceberg_table_at,
            read_table_metadata,
        )

        tdir, df = self._two_commits(table, spark)
        before = read_table_metadata(tdir)
        old_list = before["metadata"]["snapshots"][0]["manifest-list"]
        old_stats = before["metadata"]["statistics"][0]["statistics-path"]

        meta = expire_snapshots(tdir, keep_last=1, now_ms=3_000)
        assert [s["snapshot-id"] for s in meta["snapshots"]] == [2]
        assert "parent-snapshot-id" not in meta["snapshots"][0]
        assert not os.path.exists(old_list)
        assert not os.path.exists(old_stats)
        # the current snapshot still reads everything (append-only table)
        assert read_iceberg_table(spark, tdir).count() == 240
        # the expired snapshot is no longer time-travelable
        with pytest.raises(ValueError, match="not found"):
            read_iceberg_table_at(spark, tdir, snapshot_id=1)
        # version bumped; idempotent when nothing to expire
        assert read_table_metadata(tdir)["version"] == 3
        expire_snapshots(tdir, keep_last=1, now_ms=4_000)
        assert read_table_metadata(tdir)["version"] == 3

    def test_expired_snapshot_keeps_shared_manifests(self, table, spark):
        """Snapshot 2's manifest list carries snapshot 1's manifest too
        (carried-forward append); expiring snapshot 1 must NOT delete a
        manifest the surviving snapshot still references."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            expire_snapshots,
            plan_scan,
        )

        tdir, df = self._two_commits(table, spark)
        before = {d["file_path"] for d in plan_scan(tdir)}
        expire_snapshots(tdir, keep_last=1, now_ms=3_000)
        after = {d["file_path"] for d in plan_scan(tdir)}
        assert after == before  # commit-1 files still planned via the
        assert len(after) > 4  # carried-forward manifest, which survived


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    recs=st.lists(
        st.fixed_dictionaries(
            {
                "a": st.integers(-(2**62), 2**62),
                "b": st.one_of(st.none(), st.text(max_size=40)),
                "c": st.binary(max_size=64),
                "d": st.lists(st.integers(-1000, 1000), max_size=8),
            }
        ),
        max_size=12,
    )
)
def test_avro_ocf_roundtrip_property(tmp_path_factory, recs):
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_avro_ocf,
        write_avro_ocf,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long", "field-id": 1},
            {"name": "b", "type": ["null", "string"], "field-id": 2},
            {"name": "c", "type": "bytes", "field-id": 3},
            {"name": "d", "type": {"type": "array", "items": "long"}, "field-id": 4},
        ],
    }
    path = str(tmp_path_factory.mktemp("ocf") / "t.avro")
    write_avro_ocf(path, schema, recs)
    _, got, _ = read_avro_ocf(path)
    assert got == recs


class TestStreamingIcebergCommit:
    def _envelope_stream(self, spark, src_dir):
        from pyspark.sql import functions as F

        raw = spark.readStream.schema("id LONG").parquet(src_dir)
        return raw.select(
            (F.col("id") % 2).cast("int").alias("partition"),
            F.struct(
                (F.col("id") % 2).cast("int").alias("partition"),
                F.col("id").alias("offset"),
                (F.col("id") * 1000).alias("timestamp_us"),
            ).alias("kafka"),
            F.encode(F.col("id").cast("string"), "UTF-8").alias("value"),
        )

    def _batch_df(self, spark, src, where):
        return spark.read.parquet(src).where(where).selectExpr(
            "CAST(id % 2 AS INT) AS partition",
            "named_struct('partition', CAST(id % 2 AS INT), 'offset', id, "
            "'timestamp_us', id * 1000) AS kafka",
            "CAST(CAST(id AS STRING) AS BINARY) AS value",
        )

    def test_each_batch_is_one_snapshot_and_same_checkpoint_is_delta(
        self, spark, tmp_path
    ):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_iceberg_table,
            read_table_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
            stream_envelope_to_iceberg,
        )

        src = str(tmp_path / "src")
        tdir = str(tmp_path / "ice")
        ckpt = str(tmp_path / "ck")
        os.makedirs(tdir, exist_ok=True)
        spark.range(0, 100).write.mode("append").parquet(src)

        q = stream_envelope_to_iceberg(self._envelope_stream(spark, src), tdir, ckpt)
        assert q.awaitTermination(120)
        state = read_table_metadata(tdir)
        assert len(state["metadata"]["snapshots"]) == 1
        summ = state["metadata"]["snapshots"][0]["summary"]
        assert summ["batch-id"] == "0" and summ["commit-app-id"]
        assert read_iceberg_table(spark, tdir).count() == 100

        # second tranche, SAME checkpoint -> second snapshot, exactly the
        # delta (exactly-once under checkpoint retention)
        spark.range(100, 160).write.mode("append").parquet(src)
        q = stream_envelope_to_iceberg(self._envelope_stream(spark, src), tdir, ckpt)
        assert q.awaitTermination(120)
        state = read_table_metadata(tdir)
        assert len(state["metadata"]["snapshots"]) == 2
        assert read_iceberg_table(spark, tdir).count() == 160

    def test_replay_skips_same_lineage_but_not_a_different_one(
        self, spark, tmp_path
    ):
        """The skip key is (app_id, batch_id): a replayed batch of the
        SAME lineage commits once; a different lineage's batch 0 is a
        new transaction — duplicates on a lost checkpoint, never silent
        loss of its extra rows (the documented semantics)."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_iceberg_table,
            read_table_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
            commit_envelope_batch,
        )

        src = str(tmp_path / "src")
        tdir = str(tmp_path / "ice")
        os.makedirs(tdir, exist_ok=True)
        spark.range(0, 40).write.mode("append").parquet(src)
        batch = self._batch_df(spark, src, "id < 40")

        assert commit_envelope_batch(batch, 0, tdir, app_id="ck-A") is True
        # same (app, batch) replay: no-op
        assert commit_envelope_batch(batch, 0, tdir, app_id="ck-A") is False
        assert len(read_table_metadata(tdir)["metadata"]["snapshots"]) == 1
        assert read_iceberg_table(spark, tdir).count() == 40
        # a DIFFERENT lineage's batch 0 with extra rows is NOT swallowed
        spark.range(40, 50).write.mode("append").parquet(src)
        bigger = self._batch_df(spark, src, "id < 50")
        assert commit_envelope_batch(bigger, 0, tdir, app_id="ck-B") is True
        assert len(read_table_metadata(tdir)["metadata"]["snapshots"]) == 2
        # duplicates (documented), but the 10 new rows are present
        got = read_iceberg_table(spark, tdir)
        assert got.count() == 90
        assert got.where("kafka.offset >= 40").count() == 10

    def test_auto_compact_every(self, spark, tmp_path):
        """auto_compact_every=N runs rewrite_manifests after every Nth
        committed batch: three tranches through the same checkpoint ->
        3 commit snapshots + 1 replace snapshot after batch 1, and the
        head manifest walk stays compact."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_iceberg_table,
            read_table_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
            stream_envelope_to_iceberg,
        )

        src = str(tmp_path / "src")
        tdir = str(tmp_path / "ice")
        ckpt = str(tmp_path / "ck")
        os.makedirs(tdir, exist_ok=True)
        for lo, hi in ((0, 40), (40, 80), (80, 120)):
            spark.range(lo, hi).write.mode("append").parquet(src)
            q = stream_envelope_to_iceberg(
                self._envelope_stream(spark, src), tdir, ckpt,
                auto_compact_every=2,
            )
            assert q.awaitTermination(120)
        meta = read_table_metadata(tdir)["metadata"]
        ops = [s["summary"]["operation"] for s in meta["snapshots"]]
        assert ops == ["append", "append", "replace", "append"]
        assert read_iceberg_table(spark, tdir).count() == 120

    def test_crashed_attempt_higher_k_files_are_cleared(self, spark, tmp_path):
        """A crashed attempt that produced MORE files than the replay
        (different parallelism) leaves no uncommitted leftovers: all
        stale destinations of the (app, batch) are deleted before the
        rename, and discovery-mode commits skip _staging dirs."""
        import glob as g
        import hashlib
        import shutil

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_iceberg_table,
            read_table_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
            commit_envelope_batch,
        )

        src = str(tmp_path / "src")
        tdir = str(tmp_path / "ice")
        os.makedirs(os.path.join(tdir, "partition=0"), exist_ok=True)
        spark.range(0, 40).write.mode("append").parquet(src)
        app_tag = hashlib.md5(b"ck-A").hexdigest()[:12]

        # crashed attempt's leftovers: deterministic destinations k=7..8
        # (more files than the replay will produce) + a staging dir
        spark.range(0, 4).selectExpr("id AS x").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "pre"))
        pre = g.glob(str(tmp_path / "pre" / "*.parquet"))[0]
        for k in (17, 18):  # beyond any plausible replay file count
            shutil.copy(
                pre,
                os.path.join(
                    tdir, "partition=0", f"batch-{app_tag}-00000000-{k:04d}.parquet"
                ),
            )
        os.makedirs(
            os.path.join(tdir, f"_staging-batch-{app_tag}-0", "partition=0"),
            exist_ok=True,
        )

        batch = self._batch_df(spark, src, "id < 40")
        assert commit_envelope_batch(batch, 0, tdir, app_id="ck-A") is True
        # stale higher-k files are gone; exactly the committed rows read
        stale = g.glob(
            os.path.join(tdir, "partition=*", f"batch-{app_tag}-00000000-001[78]*")
        )
        assert stale == []
        assert read_iceberg_table(spark, tdir).count() == 40
        assert len(read_table_metadata(tdir)["metadata"]["snapshots"]) == 1


class TestSchemaEvolution:
    def test_add_column_evolves_schema_with_stable_ids(self, table, spark):
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_iceberg_table,
            read_table_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        before = read_table_metadata(tdir)["metadata"]
        old_ids = {f["name"]: f["id"] for f in before["schemas"][0]["fields"]}

        wider = df.withColumn("lang", F.lit("en")).limit(40).repartition(2, "partition")
        write_table(wider, tdir)
        meta = commit_append(tdir, wider.schema, now_ms=2_000)

        assert meta["current-schema-id"] == 1
        assert len(meta["schemas"]) == 2  # history retained
        new_schema = next(s for s in meta["schemas"] if s["schema-id"] == 1)
        by_name = {f["name"]: f for f in new_schema["fields"]}
        # existing columns keep their ids (the Iceberg identity contract)
        for name, fid in old_ids.items():
            assert by_name[name]["id"] == fid
        # the added column is optional with a FRESH id past the old max
        assert by_name["lang"]["required"] is False
        assert by_name["lang"]["id"] == before["last-column-id"] + 1
        assert meta["last-column-id"] == before["last-column-id"] + 1
        assert meta["snapshots"][1]["schema-id"] == 1

        # reads span both schema versions: old rows have NULL lang
        got = read_iceberg_table(spark, tdir)
        assert got.count() == 240
        assert got.where("lang IS NULL").count() == 200
        assert got.where("lang = 'en'").count() == 40

    def test_incompatible_change_rejected(self, table):
        from pyspark.sql import types as T

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        bad = T.StructType(
            [
                T.StructField("partition", T.StringType(), True),  # int -> string
            ]
            + [f for f in df.schema.fields if f.name != "partition"]
        )
        # force a commit attempt with a new file so evolution runs
        import shutil

        src_file = None
        for root, _d, names in os.walk(tdir):
            for n in names:
                if n.endswith(".parquet"):
                    src_file = os.path.join(root, n)
                    break
        shutil.copy(src_file, src_file.replace(".parquet", "-dup.parquet"))
        with pytest.raises(TypeError, match="incompatible change"):
            commit_append(tdir, bad, now_ms=2_000)

    def test_unchanged_schema_stays_version_zero(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_table_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        write_table(df.limit(20).repartition(1, "partition"), tdir)
        commit_append(tdir, df.schema, now_ms=2_000)
        meta = read_table_metadata(tdir)["metadata"]
        assert meta["current-schema-id"] == 0
        assert len(meta["schemas"]) == 1


class TestRewriteManifests:
    def test_compaction_preserves_file_set_and_history(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            plan_scan,
            read_avro_ocf,
            read_iceberg_table,
            read_iceberg_table_at,
            read_table_metadata,
            rewrite_manifests,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        for i in range(2):  # two more appends -> three manifests total
            write_table(df.limit(20).repartition(1, "partition"), tdir)
            commit_append(tdir, df.schema, now_ms=2_000 + i)
        before = read_table_metadata(tdir)
        assert len(before["manifest_list"]) == 3
        files_before = {d["file_path"] for d in plan_scan(tdir)}
        rows_before = read_iceberg_table(spark, tdir).count()

        meta = rewrite_manifests(tdir, now_ms=5_000)
        assert meta["snapshots"][-1]["summary"]["operation"] == "replace"
        after = read_table_metadata(tdir)
        # ONE compacted manifest; identical file set and rows
        assert len(after["manifest_list"]) == 1
        assert {d["file_path"] for d in plan_scan(tdir)} == files_before
        assert read_iceberg_table(spark, tdir).count() == rows_before == 240
        # manifest-list accounting: existing, not added
        (mf,) = after["manifest_list"]
        assert mf["added_data_files_count"] == 0
        assert mf["existing_rows_count"] == rows_before
        # history: the pre-compaction snapshot is still time-travelable
        prev_id = meta["snapshots"][-1]["parent-snapshot-id"]
        assert read_iceberg_table_at(spark, tdir, prev_id).count() == rows_before
        # idempotent: a second rewrite with one manifest is a no-op
        v = read_table_metadata(tdir)["version"]
        rewrite_manifests(tdir, now_ms=6_000)
        assert read_table_metadata(tdir)["version"] == v
        # the compacted manifest parses standalone (external reader path)
        _, entries, mmeta = read_avro_ocf(mf["manifest_path"])
        assert len(entries) == len(files_before)
        assert mmeta["content"] == b"data"


class TestFourthReviewPins:
    def test_time_travel_sees_evolved_columns(self, table, spark):
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_iceberg_table_at,
            read_table_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        wider = df.withColumn("lang", F.lit("en")).limit(40).repartition(2, "partition")
        write_table(wider, tdir)
        commit_append(tdir, wider.schema, now_ms=2_000)
        cur_id = read_table_metadata(tdir)["metadata"]["current-snapshot-id"]
        got = read_iceberg_table_at(spark, tdir, cur_id)
        assert "lang" in got.columns  # merged across schema versions
        assert got.where("lang = 'en'").count() == 40

    def test_schema_evolution_without_new_files_still_commits(self, table):
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_table_metadata,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        wider_schema = df.withColumn("lang", F.lit("en")).schema
        commit_append(tdir, wider_schema, now_ms=2_000)  # no new parquet
        meta = read_table_metadata(tdir)["metadata"]
        assert meta["current-schema-id"] == 1  # metadata-only commit
        assert len(meta["snapshots"]) == 1  # no phantom snapshot

    def test_required_to_optional_relaxation_recorded(self, table):
        from pyspark.sql import types as T

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            evolve_iceberg_schema,
            spark_schema_to_iceberg,
        )

        strict = T.StructType([T.StructField("a", T.LongType(), False)])
        relaxed = T.StructType([T.StructField("a", T.LongType(), True)])
        cur, last = spark_schema_to_iceberg(strict)
        evolved, _last, changed = evolve_iceberg_schema(cur, relaxed, last)
        assert changed
        assert evolved["fields"][0]["required"] is False

    def test_compaction_keeps_statistics_lookup_working(self, table, spark):
        import json as _json

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_table_metadata,
            rewrite_manifests,
        )
        from tiered_storage_for_apache_kafka_spark.sources.puffin import (
            FILE_LIST,
            read_puffin,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        write_table(df.limit(20).repartition(1, "partition"), tdir)
        commit_append(tdir, df.schema, now_ms=2_000)
        rewrite_manifests(tdir, now_ms=3_000)
        meta = read_table_metadata(tdir)["metadata"]
        # the exact lookup iceberg_puffin_stats performs must succeed
        entry = next(
            s for s in meta["statistics"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        back = read_puffin(entry["statistics-path"])
        file_list = _json.loads(back["blobs"][FILE_LIST].decode())
        assert sum(f["recordCount"] for f in file_list) == 220

    def test_compacted_entries_are_existing_status(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            read_avro_ocf,
            read_table_metadata,
            rewrite_manifests,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)
        write_table(df.limit(20).repartition(1, "partition"), tdir)
        commit_append(tdir, df.schema, now_ms=2_000)
        rewrite_manifests(tdir, now_ms=3_000)
        (mf,) = read_table_metadata(tdir)["manifest_list"]
        _, entries, _ = read_avro_ocf(mf["manifest_path"])
        assert entries and all(e["status"] == 0 for e in entries)  # EXISTING

    def test_total_records_survives_expiration(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            expire_snapshots,
            read_table_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = table
        commit_append(tdir, df.schema, now_ms=1_000)  # 200 rows
        write_table(df.limit(20).repartition(1, "partition"), tdir)
        commit_append(tdir, df.schema, now_ms=2_000)  # +20
        expire_snapshots(tdir, keep_last=1, now_ms=3_000)
        write_table(df.limit(40).repartition(1, "partition"), tdir)
        commit_append(tdir, df.schema, now_ms=4_000)  # +40
        meta = read_table_metadata(tdir)["metadata"]
        cur = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        # running total chains through the surviving snapshot, not the
        # (expired) per-snapshot added-records sum
        assert cur["summary"]["total-records"] == "260"


def test_timestamp_as_of_resolution(table, spark):
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        read_iceberg_table_at,
        snapshot_as_of_timestamp,
    )
    from tiered_storage_for_apache_kafka_spark.sources.table_mode import write_table

    tdir, df = table
    commit_append(tdir, df.schema, now_ms=1_000)
    write_table(df.limit(20).repartition(1, "partition"), tdir)
    commit_append(tdir, df.schema, now_ms=2_000)

    assert snapshot_as_of_timestamp(tdir, 1_500) == 1
    assert snapshot_as_of_timestamp(tdir, 2_000) == 2
    assert snapshot_as_of_timestamp(tdir, 9_999) == 2
    with __import__("pytest").raises(ValueError, match="no snapshot"):
        snapshot_as_of_timestamp(tdir, 500)
    sid = snapshot_as_of_timestamp(tdir, 1_999)
    assert read_iceberg_table_at(spark, tdir, sid).count() == 200


class TestPositionDeletes:
    """Row-level DELETE as v2 position-delete files, merge-on-read
    (spec "Position Delete Files" / "Sequence Numbers"; the reference's
    Iceberg mode is append-only — `IcebergTableManager.java:46-95` —
    so this is the engine's row-delta extension over the same
    metadata plane)."""

    def _committed(self, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
        )

        tdir, df = table
        commit_append(tdir, df.schema)
        return tdir, df

    def test_merge_on_read_hides_deleted_rows(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, df = self._committed(table)
        meta = ice.commit_position_deletes(spark, tdir, "kafka.offset % 5 = 3")
        summ = meta["snapshots"][-1]["summary"]
        assert summ["operation"] == "delete"
        assert summ["added-position-deletes"] == "40"
        assert summ["total-position-deletes"] == "40"
        assert summ["total-records"] == "200"  # data rows, not live rows

        live = ice.read_iceberg_table(spark, tdir)
        assert live.count() == 160
        assert live.where("kafka.offset % 5 = 3").count() == 0
        # partition-pruned reads apply the partition's deletes too
        p2 = ice.read_iceberg_table(spark, tdir, partition_value=2)
        expect = sum(1 for i in range(200) if i % 4 == 2 and i % 5 != 3)
        assert p2.count() == expect

    def test_time_travel_is_delete_scoped(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, _df = self._committed(table)
        ice.commit_position_deletes(spark, tdir, "kafka.offset % 5 = 3")
        assert ice.read_iceberg_table_at(spark, tdir, snapshot_id=1).count() == 200
        assert ice.read_iceberg_table_at(spark, tdir, snapshot_id=2).count() == 160

    def test_later_appends_not_retro_deleted(self, table, spark):
        """The sequence-number rule: a delete applies only to data files
        with data seq <= the delete's seq. Rows appended AFTER the
        delete land at the same positions of same-partition files and
        must survive."""
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = self._committed(table)
        ice.commit_position_deletes(spark, tdir, "kafka.offset % 5 = 3")
        df2 = (
            spark.range(200, 280)
            .select(
                (F.col("id") % 4).cast("int").alias("partition"),
                F.struct(
                    (F.col("id") % 4).cast("int").alias("partition"),
                    F.col("id").alias("offset"),
                    (F.col("id") * 1000).alias("timestamp_us"),
                    (F.col("id") - F.col("id") % 50).alias("batch_base_offset"),
                    F.lit(0).cast("long").alias("batch_byte_offset"),
                    F.lit("seg-1").alias("segment_uuid"),
                ).alias("kafka"),
                F.array()
                .cast("array<struct<key:string,value:binary>>")
                .alias("headers"),
                F.encode(F.col("id").cast("string"), "UTF-8").alias("key"),
                F.encode(F.col("id").cast("string"), "UTF-8").alias("value"),
            )
            .repartition(4, "partition")
        )
        write_table(df2, tdir)
        ice.commit_append(tdir, df2.schema)
        live = ice.read_iceberg_table(spark, tdir)
        assert live.count() == 160 + 80
        # the new rows matching the old predicate are all alive
        assert (
            live.where("kafka.offset >= 200 and kafka.offset % 5 = 3").count()
            == 16
        )
        # and the append snapshot carried the cumulative total forward
        meta = ice.read_table_metadata(tdir)["metadata"]
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        assert cur["summary"]["total-position-deletes"] == "40"

    def test_redundant_delete_is_a_noop(self, table, spark):
        """The match scan runs over the MERGED view: re-issuing the same
        predicate finds nothing and commits nothing."""
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, _df = self._committed(table)
        m1 = ice.commit_position_deletes(spark, tdir, "kafka.offset % 5 = 3")
        m2 = ice.commit_position_deletes(spark, tdir, "kafka.offset % 5 = 3")
        assert m2["current-snapshot-id"] == m1["current-snapshot-id"]
        assert len(m2["snapshots"]) == len(m1["snapshots"])

    def test_delete_files_are_spec_shaped(self, table, spark):
        import glob

        import pyarrow.parquet as pq

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, _df = self._committed(table)
        ice.commit_position_deletes(spark, tdir, "kafka.offset % 5 = 3")
        paths = glob.glob(tdir + "/deletes/partition=*/delete-*.parquet")
        assert len(paths) == 4  # one per partition
        sch = pq.read_schema(paths[0])
        assert [f.name for f in sch] == ["file_path", "pos"]
        assert sch.field("file_path").metadata[b"PARQUET:field_id"] == b"2147483546"
        assert sch.field("pos").metadata[b"PARQUET:field_id"] == b"2147483545"
        pdf = pq.read_table(paths[0]).to_pandas()
        assert pdf.sort_values(["file_path", "pos"]).reset_index(drop=True).equals(
            pdf.reset_index(drop=True)
        )
        # delete entries live in a content=1 manifest; data stays content=0
        meta = ice.read_table_metadata(tdir)
        by_content = {
            mf["content"]: mf for mf in meta["manifest_list"]
        }
        assert set(by_content) == {0, 1}
        assert by_content[1]["added_rows_count"] == 40

    def test_plan_scan_returns_data_files_only(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, _df = self._committed(table)
        n_before = len(ice.plan_scan(tdir))
        ice.commit_position_deletes(spark, tdir, "kafka.offset % 5 = 3")
        planned = ice.plan_scan(tdir)
        assert len(planned) == n_before
        assert all(d.get("content") != 1 for d in planned)

    def test_compaction_splits_by_content(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = self._committed(table)
        ice.commit_position_deletes(spark, tdir, "kafka.offset % 5 = 3")
        write_table(df.limit(40).repartition(1, "partition"), tdir)
        ice.commit_append(tdir, df.schema)
        ice.commit_position_deletes(spark, tdir, "kafka.offset % 7 = 1")
        expect = ice.read_iceberg_table(spark, tdir).count()

        meta = ice.rewrite_manifests(tdir)
        summ = meta["snapshots"][-1]["summary"]
        assert summ["manifests-replaced"] == "4"
        assert summ["manifests-created"] == "2"
        back = ice.read_table_metadata(tdir)
        contents = sorted(mf["content"] for mf in back["manifest_list"])
        assert contents == [0, 1]
        # reads through the compacted metadata are unchanged (sequence
        # numbers stayed explicit on the carried-over delete entries)
        assert ice.read_iceberg_table(spark, tdir).count() == expect

    def test_discovery_append_ignores_delete_files(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, df = self._committed(table)
        m1 = ice.commit_position_deletes(spark, tdir, "kafka.offset % 5 = 3")
        m2 = ice.commit_append(tdir, df.schema)  # discovery mode
        assert m2["last-sequence-number"] == m1["last-sequence-number"]

    def test_catalog_mode_delete_commit(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
            FakeRestCatalogServer,
            RestCatalogClient,
        )

        tdir, df = table
        with FakeRestCatalogServer() as server:
            cat = RestCatalogClient(server.base_url)
            ice.commit_append(tdir, df.schema, catalog=cat)
            m = ice.commit_position_deletes(
                spark, tdir, "kafka.offset % 5 = 3", catalog=cat
            )
            assert m["snapshots"][-1]["summary"]["operation"] == "delete"
            live = ice.read_iceberg_table(spark, tdir, catalog=cat)
            assert live.count() == 160
            # empty-match delete via catalog: no snapshot added
            head = m["current-snapshot-id"]
            m2 = ice.commit_position_deletes(
                spark, tdir, "kafka.offset < 0", catalog=cat
            )
            assert m2["current-snapshot-id"] == head


class TestEqualityDeletes:
    """v2 equality-delete files (content=2): delete-by-key without
    scanning the data — the CDC upsert primitive (spec "Equality Delete
    Files"); strict sequence-number rule, partition scoping, null-safe
    matching."""

    def _committed(self, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
        )

        tdir, df = table
        commit_append(tdir, df.schema)
        return tdir, df

    def test_delete_by_key_merge_on_read(self, table, spark):
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, df = self._committed(table)
        # the envelope's key column is the stringified id; delete two ids
        keys = (
            df.where(F.col("key").isin(F.lit(b"7"), F.lit(b"13")))
            .select("partition", "key")
            .distinct()
        )
        meta = ice.commit_equality_deletes(spark, tdir, keys, ["key"])
        summ = meta["snapshots"][-1]["summary"]
        assert summ["operation"] == "delete"
        assert summ["added-equality-deletes"] == "2"
        assert summ["added-position-deletes"] == "0"
        assert summ["total-equality-deletes"] == "2"

        live = ice.read_iceberg_table(spark, tdir)
        assert live.count() == 198
        assert live.where("key in (X'37', X'3133')").count() == 0
        # entries carry the equality field ids of the key column
        back = ice.read_table_metadata(tdir)
        eq_entries = [
            e
            for man in back["manifests"]
            for e in man["entries"]
            if e["data_file"]["content"] == 2
        ]
        assert eq_entries and all(
            e["data_file"]["equality_ids"] for e in eq_entries
        )

    def test_strict_sequence_rule_enables_upsert(self, table, spark):
        """delete key K (seq 2) + re-append rows with key K (seq 3):
        the replacements survive — the upsert contract."""
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = self._committed(table)
        keys = (
            df.where(F.col("key") == F.lit(b"7"))
            .select("partition", "key")
            .distinct()
        )
        ice.commit_equality_deletes(spark, tdir, keys, ["key"])
        assert ice.read_iceberg_table(spark, tdir).count() == 199
        replacement = df.where(F.col("key") == F.lit(b"7")).repartition(
            1, "partition"
        )
        write_table(replacement, tdir)
        ice.commit_append(tdir, df.schema)
        live = ice.read_iceberg_table(spark, tdir)
        assert live.count() == 200
        assert live.where("key = X'37'").count() == 1  # the replacement

    def test_partition_scoping(self, table, spark):
        """An equality delete committed for partition 1 must not touch
        equal keys in other partitions."""
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, df = self._committed(table)
        # value b"x" never occurs; use a real key that exists in exactly
        # one partition: key "6" lives in partition 6%4=2. Scope the
        # delete to partition 0 instead -> nothing may vanish.
        keys = spark.createDataFrame(
            [(0, bytearray(b"6"))], "partition int, key binary"
        )
        ice.commit_equality_deletes(spark, tdir, keys, ["key"])
        live = ice.read_iceberg_table(spark, tdir)
        assert live.count() == 200
        assert live.where("key = X'36'").count() == 1

    def test_mixed_kinds_compact_and_read(self, table, spark):
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, df = self._committed(table)
        keys = (
            df.where(F.col("key") == F.lit(b"9"))
            .select("partition", "key")
            .distinct()
        )
        ice.commit_equality_deletes(spark, tdir, keys, ["key"])
        ice.commit_position_deletes(spark, tdir, "kafka.offset % 5 = 3")
        expect = ice.read_iceberg_table(spark, tdir).count()
        assert expect == 200 - 1 - 40 + (1 if 9 % 5 == 3 else 0)
        meta = ice.rewrite_manifests(tdir)
        assert meta["snapshots"][-1]["summary"]["total-equality-deletes"] == "1"
        back = ice.read_table_metadata(tdir)
        del_entries = [
            e
            for man in back["manifests"]
            for e in man["entries"]
            if e["data_file"]["content"] in (1, 2)
        ]
        # both kinds survive compaction in the single deletes manifest
        assert {e["data_file"]["content"] for e in del_entries} == {1, 2}
        assert ice.read_iceberg_table(spark, tdir).count() == expect

    def test_delete_keys_before_first_data_commit_noop(self, table, spark):
        """CDC keys arriving before any data batch: metadata exists but
        current-snapshot-id is -1 — the commit must be a no-op (an
        equality delete only applies to STRICTLY older data files, and
        none exist), not a StopIteration crash with orphan delete
        files left behind (round-6 review finding)."""
        import glob
        import os

        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        _tdir, df = table
        # a truly snapshot-less table: fresh dir, schema-only commit
        import tempfile

        empty = tempfile.mkdtemp(prefix="ice-empty-")
        meta = ice.commit_append(empty, df.schema)
        assert meta["current-snapshot-id"] == -1
        keys = df.select("partition", "key").distinct().limit(3)
        out = ice.commit_equality_deletes(spark, empty, keys, ["key"])
        assert out["current-snapshot-id"] == -1
        assert out["snapshots"] == []
        # and no orphan delete files were written
        assert glob.glob(os.path.join(empty, "**", "delete-*"), recursive=True) == []


class TestSnapshotRefs:
    """Spec "Snapshot References": tags pin snapshots, branches have
    movable heads, commits preserve unrelated refs, expiration never
    collects a referenced snapshot."""

    def _two_commits(self, table, spark):
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = table
        meta = ice.commit_append(tdir, df.schema)
        first = meta["current-snapshot-id"]
        write_table(df.where(F.col("partition") == 0).limit(10), tdir)
        meta = ice.commit_append(tdir, df.schema)
        return tdir, df, first, meta

    def test_tag_pins_and_survives_commits(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, df, first, meta = self._two_commits(table, spark)
        assert meta["current-snapshot-id"] != first
        # tag the FIRST snapshot after later commits already happened
        meta = ice.create_ref(tdir, "corpus-v1", "tag", snapshot_id=first)
        assert meta["refs"]["corpus-v1"] == {
            "snapshot-id": first,
            "type": "tag",
        }
        assert meta["refs"]["main"]["snapshot-id"] != first
        assert ice.read_iceberg_table_ref(spark, tdir, "corpus-v1").count() == 200
        assert ice.read_iceberg_table(spark, tdir).count() == 210
        # a further commit must PRESERVE the tag (the _advance_main fix)
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )
        from pyspark.sql import functions as F

        write_table(df.where(F.col("partition") == 1).limit(5), tdir)
        meta = ice.commit_append(tdir, df.schema)
        assert meta["refs"]["corpus-v1"]["snapshot-id"] == first

    def test_expire_protects_referenced_snapshot(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, df, first, _ = self._two_commits(table, spark)
        ice.create_ref(tdir, "pin", "tag", snapshot_id=first)
        meta = ice.expire_snapshots(tdir, keep_last=1)
        ids = {s["snapshot-id"] for s in meta["snapshots"]}
        assert first in ids  # tagged snapshot survived keep_last=1
        assert ice.read_iceberg_table_ref(spark, tdir, "pin").count() == 200
        # drop the tag -> the next expiration collects it
        ice.drop_ref(tdir, "pin")
        meta = ice.expire_snapshots(tdir, keep_last=1)
        assert first not in {s["snapshot-id"] for s in meta["snapshots"]}

    def test_branch_points_and_errors(self, table, spark):
        import pytest

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, df, first, meta = self._two_commits(table, spark)
        ice.create_ref(tdir, "audit", "branch", snapshot_id=first)
        got = ice.read_iceberg_table_ref(spark, tdir, "audit")
        assert got.count() == 200
        with pytest.raises(ValueError, match="cannot be a tag"):
            ice.create_ref(tdir, "main", "tag")
        with pytest.raises(ValueError, match="not found"):
            ice.create_ref(tdir, "x", "tag", snapshot_id=123456)
        with pytest.raises(ValueError, match="cannot drop the main"):
            ice.drop_ref(tdir, "main")
        with pytest.raises(ValueError, match="not found"):
            ice.drop_ref(tdir, "nope")
        with pytest.raises(ValueError, match="'tag' or 'branch'"):
            ice.create_ref(tdir, "y", "label")

    def test_refs_through_rest_catalog(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
            FakeRestCatalogServer,
            RestCatalogClient,
        )
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = table
        with FakeRestCatalogServer() as server:
            cat = RestCatalogClient(server.base_url)
            meta = ice.commit_append(tdir, df.schema, catalog=cat)
            first = meta["current-snapshot-id"]
            write_table(df.limit(7), tdir)
            ice.commit_append(tdir, df.schema, catalog=cat)
            meta = ice.create_ref(
                tdir, "rel", "tag", snapshot_id=first, catalog=cat
            )
            assert meta["refs"]["rel"]["snapshot-id"] == first
            got = ice.read_iceberg_table_ref(spark, tdir, "rel", catalog=cat)
            assert got.count() == 200
            meta = ice.drop_ref(tdir, "rel", catalog=cat)
            assert "rel" not in meta["refs"]


class TestColumnBoundsPruning:
    """Per-file column stats (spec lower_bounds/upper_bounds + value/
    null counts) and the scan planner's third pruning level."""

    def _banded(self, spark, tmp_path):
        """Three appends, each a distinct kafka.offset band — the
        sorted-write layout bounds pruning exists for."""
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir = str(tmp_path / "banded")
        schema = None
        for band in range(3):
            df = (
                spark.range(band * 100, band * 100 + 100)
                .select(
                    (F.col("id") % 2).cast("int").alias("partition"),
                    F.struct(
                        (F.col("id") % 2).cast("int").alias("partition"),
                        F.col("id").alias("offset"),
                        (F.col("id") * 1000).alias("timestamp_us"),
                        F.col("id").alias("batch_base_offset"),
                        F.lit(0).cast("long").alias("batch_byte_offset"),
                        F.lit(f"seg-{band}").alias("segment_uuid"),
                    ).alias("kafka"),
                    F.array().cast(
                        "array<struct<key:string,value:binary>>"
                    ).alias("headers"),
                    F.encode(F.col("id").cast("string"), "UTF-8").alias("key"),
                    F.encode(F.col("id").cast("string"), "UTF-8").alias("value"),
                )
                .coalesce(1)  # ONE writer task -> exactly one file per
                # partition dir per band (deterministic file census)
            )
            schema = df.schema
            write_table(df, tdir)
            ice.commit_append(tdir, schema)
        return tdir

    def test_entries_carry_footer_true_bounds(self, table):
        import pyarrow.parquet as pq

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, df = table
        ice.commit_append(tdir, df.schema)
        back = ice.read_table_metadata(tdir)
        schema_struct = back["metadata"]["schemas"][0]
        fid = ice._leaf_field_ids(schema_struct)["kafka.offset"]
        for man in back["manifests"]:
            for e in man["entries"]:
                d = e["data_file"]
                lo = next(
                    kv["value"] for kv in d["lower_bounds"] if kv["key"] == fid
                )
                hi = next(
                    kv["value"] for kv in d["upper_bounds"] if kv["key"] == fid
                )
                import struct as _s

                pf = pq.ParquetFile(d["file_path"])
                tbl = pf.read(columns=["kafka.offset"])
                vals = [r["offset"] for r in tbl.column(0).to_pylist()]
                assert _s.unpack("<q", lo)[0] == min(vals)
                assert _s.unpack("<q", hi)[0] == max(vals)
                nvc = next(
                    kv["value"]
                    for kv in d["value_counts"]
                    if kv["key"] == fid
                )
                assert nvc == d["record_count"]

    def test_plan_scan_prunes_by_offset_bounds(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir = self._banded(spark, tmp_path)
        all_files = ice.plan_scan(tdir)
        assert len(all_files) == 6  # 3 bands x 2 files
        mid = ice.plan_scan(tdir, column_bounds=("kafka.offset", 100, 199))
        assert len(mid) == 2
        # exactly the band-1 files: recorded offset bounds inside [100,199]
        import struct as _s

        meta = ice.read_table_metadata(tdir)["metadata"]
        fid = ice._leaf_field_ids(meta["schemas"][0])["kafka.offset"]

        def rng(f):
            lo = next(kv["value"] for kv in f["lower_bounds"] if kv["key"] == fid)
            hi = next(kv["value"] for kv in f["upper_bounds"] if kv["key"] == fid)
            return _s.unpack("<q", lo)[0], _s.unpack("<q", hi)[0]

        got = {f["file_path"] for f in mid}
        band1 = {
            f["file_path"]
            for f in all_files
            if rng(f)[0] >= 100 and rng(f)[1] <= 199
        }
        assert got == band1 and len(band1) == 2
        # straddling window: two bands' files
        assert len(
            ice.plan_scan(tdir, column_bounds=("kafka.offset", 150, 250))
        ) == 4
        # out-of-range window: nothing planned
        assert ice.plan_scan(
            tdir, column_bounds=("kafka.offset", 10_000, 20_000)
        ) == []
        # unknown column is an explicit error
        import pytest as _pytest

        with _pytest.raises(KeyError, match="no scalar leaf column"):
            ice.plan_scan(tdir, column_bounds=("kafka.nope", 0, 1))

    def test_bounds_pruned_read_matches_full_read_filter(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir = self._banded(spark, tmp_path)
        files = ice.plan_scan(tdir, column_bounds=("kafka.offset", 100, 199))
        got = (
            spark.read.option("basePath", tdir)
            .parquet(*sorted(f["file_path"] for f in files))
            .where("kafka.offset between 100 and 199")
        )
        assert got.count() == 100
        full = ice.read_iceberg_table(spark, tdir).where(
            "kafka.offset between 100 and 199"
        )
        assert got.count() == full.count()

    def test_missing_bounds_kept_conservatively(self):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            _bounds_overlap,
        )

        assert _bounds_overlap({}, 5, 0, 10)
        assert _bounds_overlap({"lower_bounds": None, "upper_bounds": None}, 5, 0, 10)
        # bounds for a DIFFERENT field only -> kept
        assert _bounds_overlap(
            {
                "lower_bounds": [{"key": 7, "value": b"\x00" * 8}],
                "upper_bounds": [{"key": 7, "value": b"\x00" * 8}],
            },
            5,
            0,
            10,
        )

    def test_ensure_banded_table_one_file_and_commit_per_band(self, spark):
        """The shared banded-table builder (one partitioned write job +
        metadata-only band commits, r14) must preserve the loop-built
        layout's invariants: exactly one snapshot per non-empty offset
        band, committed in ascending band order, and exactly one data
        file per (band, partition) with per-file offset bounds inside
        the band's window — the contract the bounds/incremental/
        streaming consumers (and their oracles' file census) depend on."""
        import struct as _s

        from tiered_storage_for_apache_kafka_spark.operators.tiered import (
            BOUNDS_BAND,
            _ensure_banded_table,
        )
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir = _ensure_banded_table(spark, "/root/testdata/sf0.001")
        files = ice.plan_scan(tdir)
        meta = ice.read_table_metadata(tdir)["metadata"]
        fid = ice._leaf_field_ids(meta["schemas"][0])["kafka.offset"]

        def band_of(f):
            lo = next(kv["value"] for kv in f["lower_bounds"] if kv["key"] == fid)
            hi = next(kv["value"] for kv in f["upper_bounds"] if kv["key"] == fid)
            lo, hi = _s.unpack("<q", lo)[0], _s.unpack("<q", hi)[0]
            assert lo // BOUNDS_BAND == hi // BOUNDS_BAND  # inside one band
            return lo // BOUNDS_BAND

        per_group: dict[tuple, int] = {}
        for f in files:
            key = (band_of(f), f["file_path"].rsplit("/partition=", 1)[1][0])
            per_group[key] = per_group.get(key, 0) + 1
        assert per_group and set(per_group.values()) == {1}  # 1 file/group
        n_bands = len({b for b, _ in per_group})
        snaps = sorted(meta["snapshots"], key=lambda s: s["sequence-number"])
        assert len(snaps) == n_bands  # one commit per non-empty band
        # commits ascend in band order: each snapshot's appended files
        # (per the incremental-scan planner the consumers actually use)
        # all belong to one band, and those bands strictly increase
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.incremental import (
            plan_incremental_scan,
        )

        by_file = {f["file_path"]: band_of(f) for f in files}
        seen = []
        for prev, cur in zip(snaps, snaps[1:]):
            added = plan_incremental_scan(
                tdir, prev["snapshot-id"], cur["snapshot-id"]
            )
            bands = {by_file[f["file_path"]] for f in added}
            assert len(bands) == 1
            seen.append(bands.pop())
        assert seen == sorted(seen) and len(seen) == n_bands - 1



class TestColumnStatsSafety:
    """Round-6 review pins: footer-stats collection must never publish
    partial or non-integer stats (wrong stats prune rows; absent stats
    never do)."""

    def test_timestamp_column_commit_publishes_exact_micros(
        self, spark, tmp_path
    ):
        """pyarrow returns datetime objects for timestamp logical types;
        the stats folder must never struct.pack them raw. r6 poisoned
        the column; r10 converts to EXACT epoch micros (fixed-width
        footer stats are exact — integer timedelta arithmetic, the
        Appendix D timestamp form), unlocking time-window file pruning.
        NANOS columns still publish nothing (see
        TestTemporalColumnBounds)."""
        import struct

        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        df = spark.range(20).select(
            (F.col("id") % 2).cast("int").alias("partition"),
            F.col("id").alias("offset"),
            F.timestamp_micros(F.col("id") * 1000000).alias("ts"),
        )
        tdir = str(tmp_path / "ts_table")
        write_table(df.coalesce(1), tdir)
        meta = ice.commit_append(tdir, df.schema)  # crashed pre-r6-fix
        assert meta["current-snapshot-id"] != -1
        back = ice.read_table_metadata(tdir)
        fid_off = ice._leaf_field_ids(meta["schemas"][0])["offset"]
        fid_ts = ice._leaf_field_ids(meta["schemas"][0])["ts"]
        lo = hi = None
        for man in back["manifests"]:
            for e in man["entries"]:
                d = e["data_file"]
                los = {kv["key"]: kv["value"] for kv in (d["lower_bounds"] or [])}
                his = {kv["key"]: kv["value"] for kv in (d["upper_bounds"] or [])}
                assert fid_off in los  # plain int64 column still bounded
                if fid_ts in los:
                    v_lo = struct.unpack("<q", bytes(los[fid_ts]))[0]
                    v_hi = struct.unpack("<q", bytes(his[fid_ts]))[0]
                    lo = v_lo if lo is None else min(lo, v_lo)
                    hi = v_hi if hi is None else max(hi, v_hi)
        # exact micros across the whole table: ids 0..19 seconds
        assert (lo, hi) == (0, 19 * 1_000_000)

    def test_statless_chunk_poisons_column(self, tmp_path):
        """A file where one row group lacks min/max must publish NO stats
        for that column rather than partial counts/bounds."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            _column_stats_fields,
            _stat_one_file,
        )

        path = str(tmp_path / "two_groups.parquet")
        with pq.ParquetWriter(
            path,
            pa.schema([("v", pa.int64())]),
            write_statistics=False,
        ) as w:
            w.write_table(pa.table({"v": pa.array([1, 2], pa.int64())}))
        f = _stat_one_file(path, 0)
        assert f["column_stats"].get("v") is None  # poisoned
        out = _column_stats_fields(f["column_stats"], {"v": 7})
        assert out["lower_bounds"] is None and out["value_counts"] is None

    def test_all_null_second_group_poisons(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            _stat_one_file,
        )

        path = str(tmp_path / "null_group.parquet")
        with pq.ParquetWriter(path, pa.schema([("v", pa.int64())])) as w:
            w.write_table(pa.table({"v": pa.array([1, 2], pa.int64())}))
            w.write_table(
                pa.table({"v": pa.array([None, None], pa.int64())})
            )
        f = _stat_one_file(path, 0)
        # either both groups carried full stats (then counts are whole-
        # file true) or the column is poisoned — never partial
        st = f["column_stats"].get("v")
        if st is not None:
            assert st["n"] == 4 and st["nulls"] == 2

    def test_create_ref_main_moves_head_locally(self, table, spark):
        """Moving the main branch ref without a catalog must move
        current-snapshot-id too (catalog-path parity)."""
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = table
        meta = ice.commit_append(tdir, df.schema)
        first = meta["current-snapshot-id"]
        write_table(df.where(F.col("partition") == 0).limit(5), tdir)
        ice.commit_append(tdir, df.schema)
        meta = ice.create_ref(tdir, "main", "branch", snapshot_id=first)
        assert meta["current-snapshot-id"] == first
        assert meta["refs"]["main"]["snapshot-id"] == first
        assert ice.read_iceberg_table(spark, tdir).count() == 200


class TestIncrementalScan:
    """Incremental append scan between snapshots (the batch form of
    Iceberg's start-snapshot-id read): appended files only, compaction
    never mistaken for data, deletes in range rejected."""

    def _banded3(self, spark, tmp_path):
        return TestColumnBoundsPruning()._banded(spark, tmp_path)

    def test_appended_rows_only(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir = self._banded3(spark, tmp_path)
        meta = ice.read_table_metadata(tdir)["metadata"]
        snaps = [s["snapshot-id"] for s in meta["snapshots"]]
        assert len(snaps) == 3
        inc = ice.read_iceberg_incremental(spark, tdir, snaps[0])
        assert inc.count() == 200  # bands 1-2 only
        assert inc.agg({"kafka.offset": "min"}).collect()[0][0] == 100
        mid = ice.read_iceberg_incremental(spark, tdir, snaps[0], snaps[1])
        assert mid.count() == 100  # band 1 exactly
        # from == to -> empty, typed
        assert ice.read_iceberg_incremental(
            spark, tdir, snaps[2], snaps[2]
        ).count() == 0

    def test_compaction_is_not_new_data(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir = self._banded3(spark, tmp_path)
        meta = ice.read_table_metadata(tdir)["metadata"]
        first = meta["snapshots"][0]["snapshot-id"]
        last = meta["snapshots"][-1]["snapshot-id"]
        n_before = ice.read_iceberg_incremental(spark, tdir, first).count()
        ice.rewrite_manifests(tdir)
        # carried entries keep their sequence numbers: the same window
        # yields the same rows, and scanning past compaction adds none
        assert ice.read_iceberg_incremental(
            spark, tdir, first, last
        ).count() == n_before
        assert ice.read_iceberg_incremental(spark, tdir, last).count() == 0

    def test_delete_in_window_rejected(self, spark, tmp_path):
        import pytest as _pytest

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir = self._banded3(spark, tmp_path)
        meta = ice.read_table_metadata(tdir)["metadata"]
        first = meta["snapshots"][0]["snapshot-id"]
        ice.commit_position_deletes(spark, tdir, "kafka.offset % 50 = 3")
        with _pytest.raises(ValueError, match="row-delta delete"):
            ice.plan_incremental_scan(tdir, first)
        # a window that STOPS before the delete still works
        ok = ice.plan_incremental_scan(
            tdir, first, meta["snapshots"][-1]["snapshot-id"]
        )
        assert len(ok) == 4  # bands 1-2, 2 files each

    def test_expired_from_rejected(self, spark, tmp_path):
        import pytest as _pytest

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir = self._banded3(spark, tmp_path)
        with _pytest.raises(ValueError, match="expired or never existed"):
            ice.plan_incremental_scan(tdir, 999)

    def test_window_survives_snapshot_expiration(self, spark, tmp_path):
        """Planning is by carried sequence numbers from the CURRENT
        snapshot, so a replayed window stays complete even after every
        snapshot inside it was expired (round-6 review pin: the stream
        used to emit an empty batch and silently lose the range)."""
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir = self._banded3(spark, tmp_path)
        meta = ice.read_table_metadata(tdir)["metadata"]
        seqs = [int(s["sequence-number"]) for s in meta["snapshots"]]
        ice.expire_snapshots(tdir, keep_last=1)
        _v, meta2, _t = ice._current_state_meta(tdir)
        files = ice._plan_seq_window(meta2, seqs[0], seqs[2])
        got = (
            spark.read.option("basePath", tdir)
            .parquet(*sorted(f["file_path"] for f in files))
        )
        assert got.count() == 200  # bands 1-2, intact post-expiry

    def test_delete_detected_after_summary_expired(self, spark, tmp_path):
        """The delete-in-window check reads the delete FILES (which
        survive in the current manifests), not snapshot summaries
        (which expire) — review pin."""
        import pytest as _pytest

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir = self._banded3(spark, tmp_path)
        ice.commit_position_deletes(spark, tdir, "kafka.offset % 50 = 3")
        # advance the head (compaction) and expire everything else: the
        # delete SNAPSHOT (and its summary) is gone, its files are not
        ice.rewrite_manifests(tdir)
        ice.expire_snapshots(tdir, keep_last=1)
        _v, meta2, _t = ice._current_state_meta(tdir)
        assert all(
            s["summary"].get("operation") != "delete"
            for s in meta2["snapshots"]
        )
        lo = 0  # window spanning all history
        hi = max(int(s["sequence-number"]) for s in meta2["snapshots"])
        with _pytest.raises(ValueError, match="row-delta delete"):
            ice._plan_seq_window(meta2, lo, hi)


class TestChangelogScan:
    """NET changelog between snapshots: typed insert/delete rows on
    (file, pos) identity — the CDC read the append-only incremental
    scan refuses."""

    def _committed(self, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
        )

        tdir, df = table
        commit_append(tdir, df.schema)
        return tdir, df

    def test_delete_window_emits_deletes(self, table, spark):
        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, df = self._committed(table)
        meta = ice.read_table_metadata(tdir)["metadata"]
        first = meta["current-snapshot-id"]
        ice.commit_position_deletes(spark, tdir, "kafka.offset % 5 = 3")
        log = ice.read_iceberg_changelog(spark, tdir, first)
        by_type = {
            r["_change_type"]: r["n"]
            for r in log.groupBy("_change_type").count()
            .withColumnRenamed("count", "n").collect()
        }
        assert by_type == {"delete": 40}  # 200 rows, offsets %5==3
        assert log.where(
            "_change_type = 'delete' and kafka.offset % 5 != 3"
        ).count() == 0

    def test_upsert_window_emits_delete_plus_insert(self, table, spark):
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = self._committed(table)
        meta = ice.read_table_metadata(tdir)["metadata"]
        first = meta["current-snapshot-id"]
        keys = (
            df.where(F.col("key") == F.lit(b"7"))
            .select("partition", "key")
            .distinct()
        )
        ice.commit_equality_deletes(spark, tdir, keys, ["key"])
        write_table(
            df.where(F.col("key") == F.lit(b"7")).coalesce(1), tdir
        )
        ice.commit_append(tdir, df.schema)
        log = ice.read_iceberg_changelog(spark, tdir, first)
        rows = log.select("_change_type", "key").collect()
        assert sorted((r["_change_type"], bytes(r["key"])) for r in rows) == [
            ("delete", b"7"),
            ("insert", b"7"),
        ]

    def test_append_and_delete_net_out(self, table, spark):
        """A row appended AND deleted inside the window must not appear
        in the changelog at all."""
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = self._committed(table)
        meta = ice.read_table_metadata(tdir)["metadata"]
        first = meta["current-snapshot-id"]
        extra = (
            df.where(F.col("kafka.offset") < 10)  # ids 0..9, both parities
            .withColumn(
                "kafka",
                F.col("kafka").withField(
                    "offset", F.col("kafka.offset") + 1000
                ),
            )
            .coalesce(1)
        )
        write_table(extra, tdir)
        ice.commit_append(tdir, df.schema)
        # delete half of the JUST-APPENDED rows (and nothing else)
        ice.commit_position_deletes(
            spark, tdir, "kafka.offset >= 1000 and kafka.offset % 2 = 0"
        )
        log = ice.read_iceberg_changelog(spark, tdir, first)
        assert log.where("_change_type = 'delete'").count() == 0
        ins = log.where("_change_type = 'insert'")
        assert ins.count() == 5  # 10 appended, 5 netted out in-window
        assert ins.where("kafka.offset % 2 = 0").count() == 0

    def test_append_only_window_is_all_inserts(self, table, spark):
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = self._committed(table)
        meta = ice.read_table_metadata(tdir)["metadata"]
        first = meta["current-snapshot-id"]
        write_table(df.limit(25).coalesce(1), tdir)
        ice.commit_append(tdir, df.schema)
        log = ice.read_iceberg_changelog(spark, tdir, first)
        assert log.groupBy("_change_type").count().collect()[0][0] == "insert"
        assert log.count() == 25
        # and the same window through the strict append-only scan agrees
        inc = ice.read_iceberg_incremental(spark, tdir, first)
        assert inc.count() == 25

    def test_expired_from_rejected(self, table, spark):
        import pytest as _pytest

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice

        tdir, _df = self._committed(table)
        with _pytest.raises(ValueError, match="expired or never existed"):
            ice.read_iceberg_changelog(spark, tdir, 424242)

    def test_changelog_spans_schema_evolution(self, table, spark):
        """Window with an add-column evolution inside it: delete rows are
        read under the pre-evolution file schema and must union with the
        evolved insert rows (null-filled), not crash (round-6 review
        pin: unionByName without allowMissingColumns raised)."""
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources import iceberg as ice
        from tiered_storage_for_apache_kafka_spark.sources.table_mode import (
            write_table,
        )

        tdir, df = self._committed(table)
        meta = ice.read_table_metadata(tdir)["metadata"]
        first = meta["current-snapshot-id"]
        # delete a key, then append WIDER rows (schema evolution)
        keys = (
            df.where(F.col("key") == F.lit(b"3"))
            .select("partition", "key")
            .distinct()
        )
        ice.commit_equality_deletes(spark, tdir, keys, ["key"])
        wider = (
            df.where(F.col("key") == F.lit(b"3"))
            .withColumn("lang", F.lit("en"))
            .coalesce(1)
        )
        write_table(wider, tdir)
        ice.commit_append(tdir, wider.schema)
        log = ice.read_iceberg_changelog(spark, tdir, first)
        rows = log.select("_change_type", "key", "lang").collect()
        got = sorted(
            (r["_change_type"], bytes(r["key"]), r["lang"]) for r in rows
        )
        assert got == [("delete", b"3", None), ("insert", b"3", "en")]


class TestReplaySkipSurvivesExpiration:
    """Round-9 (advisor): with assume_new_files the (app, batch)
    replay-skip is the sole duplicate guard; it must survive
    expire_snapshots dropping the committed snapshot's summary — the
    lineage's high-water batch id is a table PROPERTY committed
    atomically with each snapshot."""

    def _batch_df(self, spark, src, where):
        return spark.read.parquet(src).where(where).selectExpr(
            "CAST(id % 2 AS INT) AS partition",
            "named_struct('partition', CAST(id % 2 AS INT), 'offset', id, "
            "'timestamp_us', id * 1000) AS kafka",
            "CAST(CAST(id AS STRING) AS BINARY) AS value",
        )

    def test_replay_after_expire_snapshots_still_skips(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            expire_snapshots,
            read_iceberg_table,
            read_table_metadata,
        )
        from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
            commit_envelope_batch,
        )

        src = str(tmp_path / "src")
        tdir = str(tmp_path / "ice")
        os.makedirs(tdir, exist_ok=True)
        spark.range(0, 20).write.mode("append").parquet(src)
        b0 = self._batch_df(spark, src, "id < 20")
        assert commit_envelope_batch(b0, 0, tdir, app_id="ck-X") is True
        spark.range(20, 40).write.mode("append").parquet(src)
        b1 = self._batch_df(spark, src, "id >= 20 AND id < 40")
        assert commit_envelope_batch(b1, 1, tdir, app_id="ck-X") is True
        # expire batch 0's snapshot: its summary (the old skip record)
        # is gone from metadata
        expire_snapshots(tdir, keep_last=1, now_ms=10_000)
        meta = read_table_metadata(tdir)["metadata"]
        assert len(meta["snapshots"]) == 1
        assert all(
            s["summary"].get("batch-id") != "0" for s in meta["snapshots"]
        )
        # checkpoint-restart replay of batch 0: MUST still skip (the
        # property marker), not re-commit the same deterministic paths
        assert commit_envelope_batch(b0, 0, tdir, app_id="ck-X") is False
        got = read_iceberg_table(spark, tdir)
        assert got.count() == 40  # no duplicate rows
        meta = read_table_metadata(tdir)["metadata"]
        assert meta["properties"]["streaming.last-batch." +
            __import__("hashlib").md5(b"ck-X").hexdigest()[:12]] == "1"
