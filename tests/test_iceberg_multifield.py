"""Multi-field Iceberg partition specs — `(day(ts), bucket[N](id))`,
the canonical production layout (Iceberg spec "Partition Specs" /
"Partition Evolution") — end-to-end: N-field spec creation, per-field
ANDed transform-aware pruning (manifest summaries + file entries),
row-level deletes scoped to the full partition tuple, maintenance
(rewrite_manifests / rewrite_data_files) on composite specs, and
partition-spec EVOLUTION with per-manifest spec-id resolution.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    bucket_hash_long,
    commit_append,
    plan_scan,
    read_iceberg_table,
    rewrite_data_files,
    rewrite_manifests,
    update_partition_spec,
)

MICROS_PER_DAY = 86_400_000_000
N_BUCKETS = 4
N_DAYS = 4
DAY0 = 17000

SPEC = [
    ("ts_day", "day", "ts_us"),
    ("id_bucket", f"bucket[{N_BUCKETS}]", "id"),
]


def _bucket(v: int) -> int:
    return (bucket_hash_long(v) & 0x7FFFFFFF) % N_BUCKETS


def _write_composite_files(tdir: str, ids, tag: str = "g1") -> None:
    """One parquet file per populated (day, bucket) cell, nested hive
    layout ``ts_day=D/id_bucket=B/`` — the composite-spec write shape."""
    rows_by: dict[tuple[int, int], list[int]] = {}
    for i in ids:
        rows_by.setdefault((DAY0 + (i % N_DAYS), _bucket(i)), []).append(i)
    for (d, b), cell in sorted(rows_by.items()):
        dd = os.path.join(tdir, f"ts_day={d}", f"id_bucket={b}")
        os.makedirs(dd, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "ts_us": pa.array(
                        [d * MICROS_PER_DAY + i for i in cell], pa.int64()
                    ),
                    "id": pa.array(cell, pa.int64()),
                    "v": pa.array([i * 10 for i in cell], pa.int64()),
                }
            ),
            os.path.join(dd, f"{tag}-{d}-{b}.parquet"),
        )


def _composite_table(spark, tmp_path, n_ids: int = 64, name: str = "mf-tbl"):
    tdir = str(tmp_path / name)
    _write_composite_files(tdir, range(n_ids))
    schema = spark.createDataFrame([], "ts_us long, id long, v long").schema
    meta = commit_append(tdir, schema, partition_spec=SPEC, now_ms=1_000)
    return tdir, schema, meta


def _current_meta(tdir: str) -> dict:
    with open(os.path.join(tdir, "metadata", "version-hint.text")) as f:
        v = int(f.read().strip())
    with open(os.path.join(tdir, "metadata", f"v{v}.metadata.json")) as f:
        return json.load(f)


class TestCompositeSpec:
    def test_create_records_n_field_spec(self, spark, tmp_path):
        _tdir, _schema, meta = _composite_table(spark, tmp_path)
        fields = meta["partition-specs"][0]["fields"]
        assert [(f["name"], f["transform"]) for f in fields] == [
            ("ts_day", "day"), ("id_bucket", f"bucket[{N_BUCKETS}]"),
        ]
        assert [f["field-id"] for f in fields] == [1000, 1001]
        assert meta["last-partition-id"] == 1001

    def test_entries_carry_full_partition_tuple(self, spark, tmp_path):
        tdir, _schema, _meta = _composite_table(spark, tmp_path)
        files = plan_scan(tdir)
        assert files, "plan must see the committed files"
        for f in files:
            assert set(f["partition"]) == {"ts_day", "id_bucket"}
            # hive path and manifest struct agree
            assert f"ts_day={f['partition']['ts_day']}" in f["file_path"]
            assert f"id_bucket={f['partition']['id_bucket']}" in f["file_path"]

    def test_per_field_summaries_in_manifest_list(self, spark, tmp_path):
        tdir, _schema, meta = _composite_table(spark, tmp_path)
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_avro_ocf,
        )

        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, mfs, _ = read_avro_ocf(cur["manifest-list"])
        assert len(mfs[0]["partitions"]) == 2  # one summary PER field
        lo0 = int.from_bytes(mfs[0]["partitions"][0]["lower_bound"], "little")
        hi0 = int.from_bytes(mfs[0]["partitions"][0]["upper_bound"], "little")
        assert (lo0, hi0) == (DAY0, DAY0 + N_DAYS - 1)
        lo1 = int.from_bytes(mfs[0]["partitions"][1]["lower_bound"], "little")
        hi1 = int.from_bytes(mfs[0]["partitions"][1]["upper_bound"], "little")
        assert (lo1, hi1) == (0, N_BUCKETS - 1)

    def test_anded_pruning_day_and_bucket(self, spark, tmp_path):
        tdir, _schema, _meta = _composite_table(spark, tmp_path)
        probe = 6  # day DAY0+2, bucket _bucket(6)
        day = DAY0 + (probe % N_DAYS)
        lo = day * MICROS_PER_DAY
        hi = lo + MICROS_PER_DAY - 1
        files = plan_scan(
            tdir, source_predicates={"ts_us": (lo, hi), "id": probe}
        )
        # exactly the ONE (day, bucket) cell survives both constraints
        assert {
            (f["partition"]["ts_day"], f["partition"]["id_bucket"])
            for f in files
        } == {(day, _bucket(probe))}
        n_total = len(plan_scan(tdir))
        assert len(files) < n_total

    def test_each_field_prunes_independently(self, spark, tmp_path):
        tdir, _schema, _meta = _composite_table(spark, tmp_path)
        day = DAY0 + 1
        lo, hi = day * MICROS_PER_DAY, (day + 1) * MICROS_PER_DAY - 1
        day_files = plan_scan(tdir, source_predicates={"ts_us": (lo, hi)})
        assert {f["partition"]["ts_day"] for f in day_files} == {day}
        assert {f["partition"]["id_bucket"] for f in day_files} == set(
            range(N_BUCKETS)
        )
        probe = 9
        bkt_files = plan_scan(tdir, source_predicates={"id": probe})
        assert {f["partition"]["id_bucket"] for f in bkt_files} == {
            _bucket(probe)
        }
        assert {f["partition"]["ts_day"] for f in bkt_files} == {
            DAY0 + d for d in range(N_DAYS)
        }

    def test_read_with_predicates_returns_exact_rows(self, spark, tmp_path):
        tdir, _schema, _meta = _composite_table(spark, tmp_path)
        probe = 13
        day = DAY0 + (probe % N_DAYS)
        lo, hi = day * MICROS_PER_DAY, (day + 1) * MICROS_PER_DAY - 1
        rows = (
            read_iceberg_table(
                spark, tdir,
                source_predicates={"ts_us": (lo, hi), "id": probe},
            )
            .collect()
        )
        assert [(r["id"], r["v"]) for r in rows] == [(probe, probe * 10)]
        # transformed partition columns are metadata-only — never
        # surfaced as scan columns
        cols = set(
            read_iceberg_table(spark, tdir, source_predicates={"id": probe})
            .columns
        )
        assert cols == {"ts_us", "id", "v"}

    def test_legacy_single_field_kwargs_rejected(self, spark, tmp_path):
        tdir, _schema, _meta = _composite_table(spark, tmp_path)
        with pytest.raises(ValueError, match="source_predicates"):
            plan_scan(tdir, source_value=3)

    def test_append_shape_validation(self, spark, tmp_path):
        tdir, schema, _meta = _composite_table(spark, tmp_path)
        with pytest.raises(ValueError, match="cannot append declaring"):
            commit_append(
                tdir, schema, now_ms=2_000,
                partition_spec=[("ts_day", "day", "ts_us")],
            )
        # re-declaring the true shape is fine (and a no-op: no new files)
        commit_append(tdir, schema, now_ms=2_000, partition_spec=SPEC)


class TestCompositeRowDeltas:
    def test_position_deletes_scoped_to_tuple(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_position_deletes,
        )

        tdir, _schema, _meta = _composite_table(spark, tmp_path, name="pd")
        commit_position_deletes(spark, tdir, "v % 20 = 0", now_ms=2_000)
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [i for i in range(64) if (i * 10) % 20 != 0]
        # delete files landed in the NESTED hive layout under deletes/
        dd = os.path.join(tdir, "deletes")
        nested = [
            os.path.relpath(os.path.join(r, f), dd)
            for r, _d, fs in os.walk(dd)
            for f in fs
        ]
        assert nested and all(
            p.split(os.sep)[0].startswith("ts_day=")
            and p.split(os.sep)[1].startswith("id_bucket=")
            for p in nested
        )

    def test_sharded_position_delete_writer(self, spark, tmp_path):
        """writer_shards: a partition's delete set splits into N
        parallel-built files by a deterministic file-path bucket (the
        100 TB hot-partition knob); the read is unchanged."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_position_deletes,
        )

        tdir, _schema, _meta = _composite_table(
            spark, tmp_path, n_ids=64, name="pdsh"
        )
        commit_position_deletes(
            spark, tdir, "id % 2 = 0", now_ms=2_000, writer_shards=3
        )
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [i for i in range(64) if i % 2 == 1]
        dd = os.path.join(tdir, "deletes")
        n_files = sum(len(fs) for _r, _d, fs in os.walk(dd))
        # every touched (day, bucket) cell has exactly one data file,
        # so sharding by file path yields one delete file per cell —
        # and the -s<k> tag proves the sharded path produced them
        names = [f for _r, _d, fs in os.walk(dd) for f in fs]
        assert n_files > 0
        assert all("-s" in n for n in names)

    def test_equality_deletes_match_on_recomputed_tuple(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_equality_deletes,
        )

        tdir, _schema, _meta = _composite_table(spark, tmp_path, name="eq")
        kill = [5, 17, 40]
        keys = spark.createDataFrame(
            [
                (DAY0 + (i % N_DAYS), _bucket(i), i)
                for i in kill
            ],
            "ts_day int, id_bucket int, id long",
        )
        commit_equality_deletes(spark, tdir, keys, ["id"], now_ms=2_000)
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [i for i in range(64) if i not in kill]

    def test_deletion_vectors_on_composite(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
            commit_deletion_vectors,
        )

        tdir, _schema, _meta = _composite_table(spark, tmp_path, name="dv")
        commit_deletion_vectors(spark, tdir, "id < 8", now_ms=2_000)
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == list(range(8, 64))
        # supersede path: second DV unions, still one live DV per file
        commit_deletion_vectors(spark, tdir, "id >= 60", now_ms=3_000)
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == list(range(8, 60))


class TestGlobalEqualityDeletes:
    def test_global_delete_hits_every_partition(self, spark, tmp_path):
        """Global equality deletes (unpartitioned-spec scope): one
        delete file kills the key in EVERY (day, bucket) cell — the
        CDC shape when the key's partition is unknown."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_equality_deletes,
        )

        tdir, _schema, _meta = _composite_table(spark, tmp_path, name="glob")
        kill = [3, 17, 42]  # spread across days and buckets
        keys = spark.createDataFrame([(i,) for i in kill], "id long")
        meta = commit_equality_deletes(
            spark, tdir, keys, ["id"], now_ms=2_000, global_scope=True
        )
        # the unpartitioned spec registered, never made the default
        unp = [s for s in meta["partition-specs"] if not s["fields"]]
        assert len(unp) == 1
        assert meta["default-spec-id"] != unp[0]["spec-id"]
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [i for i in range(64) if i not in kill]
        # survives a partition-pruned read too (the global delete
        # manifest has no summary to prune on)
        probe = 17
        rows = (
            read_iceberg_table(spark, tdir, source_predicates={"id": probe})
            .collect()
        )
        assert rows == []
        # and a second global delete reuses the registered spec
        keys2 = spark.createDataFrame([(5,)], "id long")
        meta2 = commit_equality_deletes(
            spark, tdir, keys2, ["id"], now_ms=3_000, global_scope=True
        )
        assert len([s for s in meta2["partition-specs"] if not s["fields"]]) == 1
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [i for i in range(64) if i not in (3, 5, 17, 42)]

    def test_global_delete_via_rest_catalog(self, spark, tmp_path):
        """Catalog mode: the unpartitioned-spec registration rides the
        CommitTableRequest (add-spec + the delete snapshot in ONE
        commit), and the catalog's metadata serves the scoped read."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_equality_deletes,
        )
        from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
            FakeRestCatalogServer, RestCatalogClient,
        )

        tdir, _schema, _meta = _composite_table(
            spark, tmp_path, n_ids=32, name="globcat"
        )
        with FakeRestCatalogServer() as server:
            cat = RestCatalogClient(server.base_url)
            cat.ensure_namespace()
            cat.create_table("globcat", _current_meta(tdir))
            keys = spark.createDataFrame([(11,), (22,)], "id long")
            meta = commit_equality_deletes(
                spark, tdir, keys, ["id"], now_ms=2_000,
                global_scope=True, catalog=cat, table_name="globcat",
            )
            assert any(not s["fields"] for s in meta["partition-specs"])
            assert meta["default-spec-id"] == 0  # default untouched
            got = sorted(
                r["id"]
                for r in read_iceberg_table(
                    spark, tdir, catalog=cat, table_name="globcat"
                ).collect()
            )
            assert got == [i for i in range(32) if i not in (11, 22)]

    def test_global_delete_survives_compaction(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_equality_deletes,
        )

        tdir, _schema, _meta = _composite_table(spark, tmp_path, name="glob2")
        keys = spark.createDataFrame([(7,), (21,)], "id long")
        commit_equality_deletes(
            spark, tdir, keys, ["id"], now_ms=2_000, global_scope=True
        )
        rewrite_manifests(tdir, now_ms=3_000, target_entries=8)
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [i for i in range(64) if i not in (7, 21)]
        # rewrite_data_files materializes the global delete away
        rewrite_data_files(spark, tdir, now_ms=4_000)
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [i for i in range(64) if i not in (7, 21)]


class TestCompositeMaintenance:
    def test_rewrite_data_files_recomputes_both_fields(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_position_deletes,
        )

        tdir, _schema, _meta = _composite_table(spark, tmp_path, name="rw")
        commit_position_deletes(spark, tdir, "id < 4", now_ms=2_000)
        meta = rewrite_data_files(spark, tdir, now_ms=3_000)
        assert meta["snapshots"][-1]["summary"]["operation"] == "replace"
        # zero delete files after materialization
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == list(range(4, 64))
        # compacted files re-grouped by the SAME (day, bucket) kernel:
        # pruning still lands on exactly one cell
        probe = 9
        day = DAY0 + (probe % N_DAYS)
        files = plan_scan(
            tdir,
            source_predicates={
                "ts_us": (day * MICROS_PER_DAY, (day + 1) * MICROS_PER_DAY - 1),
                "id": probe,
            },
        )
        assert {
            (f["partition"]["ts_day"], f["partition"]["id_bucket"])
            for f in files
        } == {(day, _bucket(probe))}
        assert all("_compacted-" in f["file_path"] for f in files)

    def test_rewrite_manifests_keeps_per_field_summaries(self, spark, tmp_path):
        tdir, schema, _meta = _composite_table(spark, tmp_path, name="rm")
        _write_composite_files(tdir, range(64, 128), tag="g2")
        commit_append(tdir, schema, partition_spec=SPEC, now_ms=2_000)
        n_before = len(plan_scan(tdir))
        meta = rewrite_manifests(tdir, now_ms=3_000, target_entries=8)
        assert meta["snapshots"][-1]["summary"]["operation"] == "replace"
        assert len(plan_scan(tdir)) == n_before
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_avro_ocf,
        )

        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, mfs, _ = read_avro_ocf(cur["manifest-list"])
        data_mfs = [m for m in mfs if not m.get("content")]
        assert len(data_mfs) > 1  # split, partition-clustered
        assert all(len(m["partitions"]) == 2 for m in data_mfs)
        # pruning through the compacted metadata still works per field
        probe = 21
        files = plan_scan(tdir, source_predicates={"id": probe})
        assert {f["partition"]["id_bucket"] for f in files} == {_bucket(probe)}


class TestPartitionScopedIncremental:
    """Partition-scoped incremental windows: ``source_predicates`` on
    the append scan prunes other partitions' files AND exempts the
    window from retractions outside its scope (per-partition
    append-only contract)."""

    def test_scoped_window_skips_foreign_deletes(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            commit_position_deletes,
            plan_incremental_scan,
            read_iceberg_incremental,
        )

        tdir, schema, meta = _composite_table(
            spark, tmp_path, n_ids=32, name="inc"
        )
        from_id = meta["current-snapshot-id"]
        day_probe = 37  # day DAY0+1, some bucket
        probe_day = DAY0 + (day_probe % N_DAYS)
        # a delete scoped to a DIFFERENT day (DAY0+0): ids = 0 mod 4
        commit_position_deletes(
            spark, tdir, "id % 4 = 0 AND id < 8", now_ms=2_000
        )
        # then append generation 2
        _write_composite_files(tdir, range(32, 64), tag="g2")
        commit_append(tdir, schema, partition_spec=SPEC, now_ms=3_000)
        # unscoped window: the delete is a hard error
        with pytest.raises(ValueError, match="row-delta delete file"):
            plan_incremental_scan(tdir, from_id)
        # scoped to the probe's day: delete (day DAY0) is out of scope,
        # the window plans exactly that day's new files
        window = (
            probe_day * MICROS_PER_DAY, (probe_day + 1) * MICROS_PER_DAY - 1
        )
        files = plan_incremental_scan(
            tdir, from_id, source_predicates={"ts_us": window}
        )
        assert files
        assert all(f["partition"]["ts_day"] == probe_day for f in files)
        got = sorted(
            r["id"]
            for r in read_iceberg_incremental(
                spark, tdir, from_id,
                source_predicates={"ts_us": window},
            ).collect()
        )
        # generation-2 ids on the probe day only
        assert got == [i for i in range(32, 64) if i % N_DAYS == day_probe % N_DAYS]
        # scoped to the DELETED day: the retraction still errors —
        # scoping must never hide an in-scope delete
        del_day = DAY0
        dwindow = (
            del_day * MICROS_PER_DAY, (del_day + 1) * MICROS_PER_DAY - 1
        )
        with pytest.raises(ValueError, match="row-delta delete file"):
            plan_incremental_scan(
                tdir, from_id, source_predicates={"ts_us": dwindow}
            )


class TestPartitionScopedChangelog:
    def test_scoped_changelog_splits_by_partition(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            commit_position_deletes,
            read_iceberg_changelog,
        )

        tdir, schema, meta = _composite_table(
            spark, tmp_path, n_ids=32, name="chg"
        )
        from_id = meta["current-snapshot-id"]
        # delete two ids on day DAY0 (ids 0,4 -> id % 4 == 0)
        commit_position_deletes(
            spark, tdir, "id % 4 = 0 AND id < 8", now_ms=2_000
        )
        _write_composite_files(tdir, range(32, 64), tag="g2")
        commit_append(tdir, schema, partition_spec=SPEC, now_ms=3_000)
        probe_day = DAY0 + 1
        window = (
            probe_day * MICROS_PER_DAY, (probe_day + 1) * MICROS_PER_DAY - 1
        )
        # scoped to day DAY0+1: inserts only (the deletes hit DAY0)
        rows = read_iceberg_changelog(
            spark, tdir, from_id, source_predicates={"ts_us": window}
        ).collect()
        assert rows
        assert {r["_change_type"] for r in rows} == {"insert"}
        assert sorted(r["id"] for r in rows) == [
            i for i in range(32, 64) if i % N_DAYS == 1
        ]
        # scoped to the deleted day: deletes for ids 0,4 + that day's
        # inserts
        dwindow = (DAY0 * MICROS_PER_DAY, (DAY0 + 1) * MICROS_PER_DAY - 1)
        rows = read_iceberg_changelog(
            spark, tdir, from_id, source_predicates={"ts_us": dwindow}
        ).collect()
        dels = sorted(r["id"] for r in rows if r["_change_type"] == "delete")
        ins = sorted(r["id"] for r in rows if r["_change_type"] == "insert")
        assert dels == [0, 4]
        assert ins == [i for i in range(32, 64) if i % N_DAYS == 0]


class TestHiddenPartitionWriter:
    """`write_iceberg_table` — the one-call hidden-partitioning write
    surface (transform compute + hive layout + metadata commit)."""

    def test_write_and_append_composite(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        tdir = str(tmp_path / "w1")
        df = spark.createDataFrame(
            [
                (i, DAY0 * MICROS_PER_DAY + (i % N_DAYS) * MICROS_PER_DAY, i * 10)
                for i in range(32)
            ],
            "id long, ts_us long, v long",
        )
        meta = write_iceberg_table(spark, df, tdir, partition_spec=SPEC, now_ms=1_000)
        assert [f["name"] for f in meta["partition-specs"][0]["fields"]] == [
            "ts_day", "id_bucket",
        ]
        # hidden columns never reach the table schema
        got = read_iceberg_table(spark, tdir)
        assert set(got.columns) == {"id", "ts_us", "v"}
        assert got.count() == 32
        # append through the same surface
        df2 = spark.createDataFrame(
            [
                (i, DAY0 * MICROS_PER_DAY + (i % N_DAYS) * MICROS_PER_DAY, i * 10)
                for i in range(32, 64)
            ],
            "id long, ts_us long, v long",
        )
        write_iceberg_table(spark, df2, tdir, partition_spec=SPEC, now_ms=2_000)
        assert read_iceberg_table(spark, tdir).count() == 64
        # a mismatched declared shape is rejected, not silently cross-laid
        with pytest.raises(ValueError, match="cannot append declaring"):
            write_iceberg_table(
                spark, df2, tdir, now_ms=3_000,
                partition_spec=[("ts_day", "day", "ts_us")],
            )

    def test_rejected_append_is_side_effect_free(self, spark, tmp_path):
        """Self-review regression (r8): a shape-rejected write must not
        strand cross-laid files for a later discovery commit to sweep
        in as duplicates — validation runs before any file is
        written."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            write_iceberg_table,
        )

        tdir = str(tmp_path / "w3")
        df = spark.createDataFrame(
            [(i, DAY0 * MICROS_PER_DAY + i, i) for i in range(8)],
            "id long, ts_us long, v long",
        )
        write_iceberg_table(spark, df, tdir, partition_spec=SPEC, now_ms=1_000)
        n0 = read_iceberg_table(spark, tdir).count()
        with pytest.raises(ValueError, match="cannot append declaring"):
            write_iceberg_table(
                spark, df, tdir, now_ms=2_000,
                partition_spec=[("ts_day", "day", "ts_us")],
            )
        # no new files hit the disk, so a discovery commit finds nothing
        schema = df.schema
        commit_append(tdir, schema, partition_spec=SPEC, now_ms=3_000)
        assert read_iceberg_table(spark, tdir).count() == n0

    def test_identity_field_must_be_column(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        df = spark.createDataFrame([(1, 2)], "a long, b long")
        with pytest.raises(ValueError, match="must be a DataFrame column"):
            write_iceberg_table(
                spark, df, str(tmp_path / "w2"),
                partition_spec=[("missing", "identity", None)],
            )


class TestStringPartitions:
    """String-typed partition values (closes the r7 rejection): an
    identity(string) field plus a truncate[3](string) field — string
    partition structs in manifests, UTF-8 summary bounds, lexicographic
    pruning, and the delete plane's nested string hive dirs."""

    LANGS = ["de", "en", "fr"]
    SOURCES = ["webcrawl", "webforum", "wikipedia", "bookcorp"]

    def _string_table(self, spark, tmp_path, name="str-tbl"):
        tdir = str(tmp_path / name)
        rows_by: dict[tuple[str, str], list[int]] = {}
        for i in range(48):
            lang = self.LANGS[i % 3]
            source = self.SOURCES[i % 4]
            rows_by.setdefault((lang, source[:3]), []).append(i)
        for (lang, s3), ids in sorted(rows_by.items()):
            dd = os.path.join(tdir, f"lang={lang}", f"src3={s3}")
            os.makedirs(dd, exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(ids, pa.int64()),
                        "lang": pa.array([lang] * len(ids), pa.string()),
                        "source": pa.array(
                            [self.SOURCES[i % 4] for i in ids], pa.string()
                        ),
                        "v": pa.array([i * 10 for i in ids], pa.int64()),
                    }
                ),
                os.path.join(dd, f"f-{lang}-{s3}.parquet"),
            )
        schema = spark.createDataFrame(
            [], "doc_id long, lang string, source string, v long"
        ).schema
        meta = commit_append(
            tdir, schema, now_ms=1_000,
            partition_spec=[
                ("lang", "identity", None),
                ("src3", "truncate[3]", "source"),
            ],
        )
        return tdir, schema, meta

    def test_create_and_typed_entries(self, spark, tmp_path):
        tdir, _schema, meta = self._string_table(spark, tmp_path)
        files = plan_scan(tdir)
        assert files
        for f in files:
            assert isinstance(f["partition"]["lang"], str)
            assert isinstance(f["partition"]["src3"], str)
            assert len(f["partition"]["src3"]) == 3
        # per-field summary bounds are UTF-8 strings, lexicographic
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_avro_ocf,
        )

        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, mfs, _ = read_avro_ocf(cur["manifest-list"])
        lo = bytes(mfs[0]["partitions"][0]["lower_bound"]).decode()
        hi = bytes(mfs[0]["partitions"][0]["upper_bound"]).decode()
        assert (lo, hi) == ("de", "fr")

    def test_string_eq_and_range_pruning(self, spark, tmp_path):
        tdir, _schema, _meta = self._string_table(spark, tmp_path, "str2")
        en = plan_scan(tdir, source_predicates={"lang": "en"})
        assert en
        assert {f["partition"]["lang"] for f in en} == {"en"}
        # a source-column range maps through truncate[3] (prefix is
        # order-preserving) to a lexicographic partition range
        webs = plan_scan(
            tdir, source_predicates={"source": ("webcrawl", "webforum")}
        )
        assert webs
        assert {f["partition"]["src3"] for f in webs} == {"web"}
        # eq on the source routes to its one truncated prefix
        wiki = plan_scan(tdir, source_predicates={"source": "wikipedia"})
        assert {f["partition"]["src3"] for f in wiki} == {"wik"}
        rows = (
            read_iceberg_table(
                spark, tdir,
                source_predicates={"lang": "en", "source": "wikipedia"},
            )
            .collect()
        )
        assert rows
        assert all(
            r["lang"] == "en" and r["source"] == "wikipedia" for r in rows
        )
        # identity partition columns stay schema columns; truncated
        # ones stay metadata-only
        cols = set(read_iceberg_table(spark, tdir).columns)
        assert cols == {"doc_id", "lang", "source", "v"}

    def test_deletes_and_rewrite_on_string_partitions(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_position_deletes,
        )

        tdir, _schema, _meta = self._string_table(spark, tmp_path, "str3")
        commit_position_deletes(spark, tdir, "doc_id < 6", now_ms=2_000)
        got = sorted(
            r["doc_id"] for r in read_iceberg_table(spark, tdir).collect()
        )
        assert got == list(range(6, 48))
        dd = os.path.join(tdir, "deletes")
        nested = [
            os.path.relpath(os.path.join(r, f), dd)
            for r, _d, fs in os.walk(dd)
            for f in fs
        ]
        assert nested and all(
            p.split(os.sep)[0].startswith("lang=")
            and p.split(os.sep)[1].startswith("src3=")
            for p in nested
        )
        rewrite_data_files(spark, tdir, now_ms=3_000)
        got = sorted(
            r["doc_id"] for r in read_iceberg_table(spark, tdir).collect()
        )
        assert got == list(range(6, 48))
        files = plan_scan(tdir, source_predicates={"lang": "fr"})
        assert files
        assert all(f["partition"]["lang"] == "fr" for f in files)
        assert all("_compacted-" in f["file_path"] for f in files)


class TestStringColumnBounds:
    """String column-stats pruning: data-file lower/upper bounds for
    string leaf columns (UTF-8, spec Appendix D) recorded from parquet
    footers and pruned with string ``column_bounds`` probes."""

    def _banded_table(self, spark, tmp_path):
        tdir = str(tmp_path / "strbounds")
        os.makedirs(os.path.join(tdir, "partition=0"), exist_ok=True)
        # one file per lexicographic band of the string column
        for i, (lo, hi) in enumerate(
            [("aaa", "ccc"), ("ddd", "fff"), ("ggg", "iii"), ("jjj", "lll")]
        ):
            pq.write_table(
                pa.table(
                    {
                        "k": pa.array([i * 2, i * 2 + 1], pa.int64()),
                        "s": pa.array([lo, hi], pa.string()),
                    }
                ),
                os.path.join(tdir, "partition=0", f"band{i}.parquet"),
            )
        schema = spark.createDataFrame(
            [], "partition int, k long, s string"
        ).schema
        commit_append(tdir, schema, now_ms=1_000)
        return tdir

    def test_string_bounds_recorded_and_pruned(self, spark, tmp_path):
        tdir = self._banded_table(spark, tmp_path)
        allf = plan_scan(tdir)
        assert len(allf) == 4
        hit = plan_scan(tdir, column_bounds=("s", "eee", "hhh"))
        assert len(hit) == 2  # bands ddd-fff and ggg-iii only
        miss = plan_scan(tdir, column_bounds=("s", "zzz", "zzzz"))
        assert miss == []
        # int columns still prune alongside
        assert len(plan_scan(tdir, column_bounds=("k", 0, 1))) == 1

    def test_mistyped_probe_rejected(self, spark, tmp_path):
        tdir = self._banded_table(spark, tmp_path)
        with pytest.raises(TypeError, match="string column"):
            plan_scan(tdir, column_bounds=("s", 0, 10))
        with pytest.raises(TypeError, match="integer column"):
            plan_scan(tdir, column_bounds=("k", "a", "b"))


class TestSpecEvolution:
    def _day_only_table(self, spark, tmp_path, name="evo"):
        tdir = str(tmp_path / name)
        for i in range(32):
            d = DAY0 + (i % N_DAYS)
            dd = os.path.join(tdir, f"ts_day={d}")
            os.makedirs(dd, exist_ok=True)
        rows_by: dict[int, list[int]] = {}
        for i in range(32):
            rows_by.setdefault(DAY0 + (i % N_DAYS), []).append(i)
        for d, cell in rows_by.items():
            pq.write_table(
                pa.table(
                    {
                        "ts_us": pa.array(
                            [d * MICROS_PER_DAY + i for i in cell], pa.int64()
                        ),
                        "id": pa.array(cell, pa.int64()),
                        "v": pa.array([i * 10 for i in cell], pa.int64()),
                    }
                ),
                os.path.join(tdir, f"ts_day={d}", f"g1-{d}.parquet"),
            )
        schema = spark.createDataFrame([], "ts_us long, id long, v long").schema
        commit_append(
            tdir, schema, partition_col="ts_day", now_ms=1_000,
            partition_transform="day", partition_source="ts_us",
        )
        return tdir, schema

    def test_evolution_metadata_and_field_id_reuse(self, spark, tmp_path):
        tdir, _schema = self._day_only_table(spark, tmp_path)
        meta = update_partition_spec(tdir, SPEC, now_ms=2_000)
        assert meta["default-spec-id"] == 1
        assert len(meta["partition-specs"]) == 2
        new_fields = meta["partition-specs"][1]["fields"]
        # day(ts_us) keeps field-id 1000 across specs (evolution rule);
        # the new bucket field gets a fresh id
        assert [(f["name"], f["field-id"]) for f in new_fields] == [
            ("ts_day", 1000), ("id_bucket", 1001),
        ]
        assert meta["last-partition-id"] == 1001
        # re-declaring the now-default spec is a no-op
        again = update_partition_spec(tdir, SPEC, now_ms=3_000)
        assert again["default-spec-id"] == 1
        assert len(again["partition-specs"]) == 2

    def test_mixed_generation_scan_and_pruning(self, spark, tmp_path):
        tdir, schema = self._day_only_table(spark, tmp_path, name="evo2")
        update_partition_spec(tdir, SPEC, now_ms=2_000)
        _write_composite_files(tdir, range(32, 64), tag="g2")
        commit_append(tdir, schema, partition_spec=SPEC, now_ms=3_000)
        # full read spans both generations
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == list(range(64))
        # a day constraint prunes BOTH generations (ts_day lives in
        # both specs, same field)
        day = DAY0 + 2
        lo, hi = day * MICROS_PER_DAY, (day + 1) * MICROS_PER_DAY - 1
        day_files = plan_scan(tdir, source_predicates={"ts_us": (lo, hi)})
        assert {f["partition"]["ts_day"] for f in day_files} == {day}
        assert any("id_bucket" not in f["partition"] for f in day_files)
        assert any("id_bucket" in f["partition"] for f in day_files)
        # a bucket constraint prunes generation-2 files; generation-1
        # files (no bucket field) are conservatively kept
        probe = 34
        bkt_files = plan_scan(tdir, source_predicates={"id": probe})
        g2 = [f for f in bkt_files if "id_bucket" in f["partition"]]
        g1 = [f for f in bkt_files if "id_bucket" not in f["partition"]]
        assert {f["partition"]["id_bucket"] for f in g2} == {_bucket(probe)}
        assert len(g1) == N_DAYS  # every old-spec file kept
        # and the ROW residual still narrows to exactly the probe
        rows = (
            read_iceberg_table(spark, tdir, source_predicates={"id": probe})
            .collect()
        )
        assert [(r["id"], r["v"]) for r in rows] == [(probe, probe * 10)]

    def test_rewrite_migrates_old_generation_to_default_spec(
        self, spark, tmp_path
    ):
        tdir, schema = self._day_only_table(spark, tmp_path, name="evo3")
        update_partition_spec(tdir, SPEC, now_ms=2_000)
        _write_composite_files(tdir, range(32, 64), tag="g2")
        commit_append(tdir, schema, partition_spec=SPEC, now_ms=3_000)
        rewrite_data_files(spark, tdir, now_ms=4_000)
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == list(range(64))
        # after migration every live file carries the full tuple, so a
        # bucket constraint prunes the WHOLE table
        probe = 7
        files = plan_scan(tdir, source_predicates={"id": probe})
        assert files
        assert all(
            f["partition"]["id_bucket"] == _bucket(probe) for f in files
        )
        rows = (
            read_iceberg_table(spark, tdir, source_predicates={"id": probe})
            .collect()
        )
        assert [(r["id"], r["v"]) for r in rows] == [(probe, probe * 10)]

    def test_deletes_on_old_generation_survive_new_field_pruning(
        self, spark, tmp_path
    ):
        """Self-review regression (r8): a delete committed AFTER
        evolution covers old-generation rows with the new spec field
        recorded null; a new-field predicate must keep that delete
        file conservatively — pruning it while the old data file is
        kept would resurface deleted rows."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_equality_deletes,
            commit_position_deletes,
        )

        tdir, schema = self._day_only_table(spark, tmp_path, name="evo5")
        update_partition_spec(tdir, SPEC, now_ms=2_000)
        _write_composite_files(tdir, range(32, 64), tag="g2")
        commit_append(tdir, schema, partition_spec=SPEC, now_ms=3_000)
        # kill an OLD-generation row (id 7 < 32) post-evolution
        commit_position_deletes(spark, tdir, "id = 7", now_ms=4_000)
        # a new-field (bucket) predicate naming exactly that id must
        # not resurface it
        rows = (
            read_iceberg_table(spark, tdir, source_predicates={"id": 7})
            .collect()
        )
        assert rows == []
        # same through the equality-delete representation (the caller
        # supplies the row's FULL current-spec tuple; the data side
        # recomputes the transforms, so old-generation rows match too)
        keys = spark.createDataFrame(
            [(DAY0 + (9 % N_DAYS), _bucket(9), 9)],
            "ts_day int, id_bucket int, id long",
        )
        commit_equality_deletes(spark, tdir, keys, ["id"], now_ms=5_000)
        rows = (
            read_iceberg_table(spark, tdir, source_predicates={"id": 9})
            .collect()
        )
        assert rows == []
        # and unpruned reads agree
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [i for i in range(64) if i not in (7, 9)]

    def test_evolution_via_rest_catalog(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
            FakeRestCatalogServer, RestCatalogClient,
        )

        tdir, schema = self._day_only_table(spark, tmp_path, name="evo4")
        with FakeRestCatalogServer() as server:
            cat = RestCatalogClient(server.base_url)
            cat.ensure_namespace()
            # adopt the file-layout table into the catalog
            cat.create_table("evo4", _current_meta(tdir))
            meta = update_partition_spec(
                tdir, SPEC, now_ms=2_000, catalog=cat, table_name="evo4"
            )
            assert meta["default-spec-id"] == 1
            _write_composite_files(tdir, range(32, 48), tag="g2")
            commit_append(
                tdir, schema, partition_spec=SPEC, now_ms=3_000,
                catalog=cat, table_name="evo4",
            )
            got = sorted(
                r["id"]
                for r in read_iceberg_table(
                    spark, tdir, catalog=cat, table_name="evo4"
                ).collect()
            )
            assert got == list(range(48))


class TestWriterFileCapture:
    """Round-9: `write_iceberg_table`'s file capture is staging-based —
    listing-free (the walk is O(batch), over the private `_stage-*`
    dir only) and concurrency-safe (a concurrent writer's files can
    never be swept into this commit, the round-8 walk-diff race)."""

    def _df(self, spark, ids):
        return spark.createDataFrame(
            [
                (i, (DAY0 + (i % N_DAYS)) * MICROS_PER_DAY, i * 10)
                for i in ids
            ],
            "id long, ts_us long, v long",
        )

    def test_foreign_uncommitted_files_never_swept(self, spark, tmp_path):
        """A foreign in-flight file sitting in a hive dir (what a
        concurrent writer's rename leaves between ITS rename and ITS
        commit) must not ride this writer's commit — the exact race the
        old before/after table walk-diff had."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        tdir = str(tmp_path / "cap1")
        write_iceberg_table(
            spark, self._df(spark, range(8)), tdir,
            partition_spec=SPEC, now_ms=1_000,
        )
        # the foreign writer's file: landed, not yet committed by IT
        d = DAY0
        foreign_dir = os.path.join(
            tdir, f"ts_day={d}", f"id_bucket={_bucket(0)}"
        )
        os.makedirs(foreign_dir, exist_ok=True)
        foreign = os.path.join(foreign_dir, "part-foreign-attempt.parquet")
        pq.write_table(
            pa.table(
                {
                    "ts_us": pa.array([d * MICROS_PER_DAY], pa.int64()),
                    "v": pa.array([999], pa.int64()),
                    "id": pa.array([0], pa.int64()),
                }
            ),
            foreign,
        )
        meta = write_iceberg_table(
            spark, self._df(spark, range(8, 16)), tdir,
            partition_spec=SPEC, now_ms=2_000,
        )
        committed = {f["file_path"] for f in plan_scan(tdir)}
        assert foreign not in committed
        assert read_iceberg_table(spark, tdir).count() == 16
        assert meta["current-snapshot-id"] != -1
        # no staging residue
        assert not [
            p for p in os.listdir(tdir) if p.startswith("_stage-")
        ]

    def test_two_concurrent_writers_disjoint(self, spark, tmp_path):
        """Two writers appending concurrently through the REST catalog
        commit disjoint file sets: every committed path appears in
        exactly ONE snapshot's added set, and the union of rows is
        exact (the old walk-diff double-committed the overlap)."""
        import threading

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )
        from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
            FakeRestCatalogServer, RestCatalogClient,
        )

        tdir = str(tmp_path / "cap2")
        with FakeRestCatalogServer() as server:
            cat = RestCatalogClient(server.base_url)
            cat.ensure_namespace()
            write_iceberg_table(
                spark, self._df(spark, range(4)), tdir,
                partition_spec=SPEC, now_ms=1_000,
                catalog=cat, table_name="cap2",
            )
            errs: list[Exception] = []

            def run(ids, ts):
                try:
                    write_iceberg_table(
                        spark, self._df(spark, ids), tdir,
                        partition_spec=SPEC, now_ms=ts,
                        catalog=cat, table_name="cap2",
                    )
                except Exception as e:  # noqa: BLE001 — surfaced below
                    errs.append(e)

            t1 = threading.Thread(target=run, args=(range(4, 20), 2_000))
            t2 = threading.Thread(target=run, args=(range(20, 36), 2_001))
            t1.start(); t2.start(); t1.join(); t2.join()
            assert errs == []
            got = sorted(
                r["id"]
                for r in read_iceberg_table(
                    spark, tdir, catalog=cat, table_name="cap2"
                ).collect()
            )
            assert got == list(range(36))
            # no path committed twice across the final file set
            files = [
                f["file_path"]
                for f in plan_scan(tdir, catalog=cat, table_name="cap2")
            ]
            assert len(files) == len(set(files))

    def test_none_spec_append_to_transformed_table_rejected(
        self, spark, tmp_path
    ):
        """Advisor r8 (medium): appending with partition_spec=None to a
        transformed table must fail BEFORE any file is written — the
        all-null partition tuples such files would commit are then
        silently pruned from every scoped scan."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        tdir = str(tmp_path / "cap3")
        write_iceberg_table(
            spark, self._df(spark, range(8)), tdir,
            partition_spec=SPEC, now_ms=1_000,
        )
        with pytest.raises(ValueError, match="cannot append declaring"):
            write_iceberg_table(
                spark, self._df(spark, range(8, 16)), tdir, now_ms=2_000,
            )
        # side-effect-free: a discovery commit finds nothing to adopt
        schema = self._df(spark, range(1)).schema
        commit_append(tdir, schema, partition_spec=SPEC, now_ms=3_000)
        assert read_iceberg_table(spark, tdir).count() == 8

    def test_writer_shards_fan_out_hot_partition(self, spark, tmp_path):
        """`writer_shards=N` spreads a skewed batch's hot partition
        cell over multiple write tasks — multiple files per cell, all
        spec-legal, row set exact."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        tdir = str(tmp_path / "cap4")
        # 9/10 of rows land on ONE day (id % N_DAYS == 0 -> same ts_day)
        ids = [i * N_DAYS for i in range(180)] + list(range(1, 21))
        df = self._df(spark, ids)
        write_iceberg_table(
            spark, df, tdir,
            partition_spec=[("ts_day", "day", "ts_us")],
            now_ms=1_000, writer_shards=4,
        )
        hot_dir = os.path.join(tdir, f"ts_day={DAY0}")
        hot_files = [
            n for n in os.listdir(hot_dir) if n.endswith(".parquet")
        ]
        assert len(hot_files) > 1  # fanned out, not one funnel task
        got = sorted(
            r["id"] for r in read_iceberg_table(spark, tdir).collect()
        )
        assert got == sorted(ids)
        # pruning still exact on the sharded layout
        w = (DAY0 * MICROS_PER_DAY, (DAY0 + 1) * MICROS_PER_DAY - 1)
        planned = plan_scan(tdir, source_range=w)
        assert {f["partition"]["ts_day"] for f in planned} == {DAY0}

    def test_writer_shards_fan_out_duplicate_rows(self, spark, tmp_path):
        """Advisor r9 (low): the shard salt must be a per-row counter,
        not a content hash — a hot cell of FULLY DUPLICATE rows (the
        most degenerate skew) must still fan out to multiple write
        tasks instead of hashing every row to one shard."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        tdir = str(tmp_path / "cap5")
        # 240 IDENTICAL rows: one day cell, one distinct row value
        df = self._df(spark, [0] * 240)
        write_iceberg_table(
            spark, df, tdir,
            partition_spec=[("ts_day", "day", "ts_us")],
            now_ms=1_000, writer_shards=4,
        )
        hot_dir = os.path.join(tdir, f"ts_day={DAY0}")
        hot_files = [
            n for n in os.listdir(hot_dir) if n.endswith(".parquet")
        ]
        assert len(hot_files) > 1  # a content-hash salt would give 1
        assert read_iceberg_table(spark, tdir).count() == 240


class TestUnknownSpecIdIsLoud:
    """Round-9: a manifest carrying a spec-id absent from table
    metadata is corruption — maintenance must raise (matching the scan
    plane), never silently cluster/summarize under spec 0."""

    def _corrupt_head_manifest_spec_id(self, tdir: str) -> None:
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            MANIFEST_FILE_SCHEMA,
            read_avro_ocf,
            write_avro_ocf,
        )

        meta = _current_meta(tdir)
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _schema, mfs, kv = read_avro_ocf(cur["manifest-list"])
        mfs[0]["partition_spec_id"] = 99
        write_avro_ocf(
            cur["manifest-list"], MANIFEST_FILE_SCHEMA, mfs, kv or {}
        )

    def test_rewrite_manifests_raises(self, spark, tmp_path):
        tdir, _schema, _meta = _composite_table(
            spark, tmp_path, n_ids=16, name="badspec1"
        )
        self._corrupt_head_manifest_spec_id(tdir)
        with pytest.raises(KeyError, match="partition-spec-id 99"):
            rewrite_manifests(tdir, now_ms=3_000, target_entries=1)

    def test_rewrite_data_files_raises(self, spark, tmp_path):
        tdir, _schema, _meta = _composite_table(
            spark, tmp_path, n_ids=16, name="badspec2"
        )
        self._corrupt_head_manifest_spec_id(tdir)
        with pytest.raises(KeyError, match="spec"):
            rewrite_data_files(spark, tdir, now_ms=3_000)


class TestBigintPartitionBounds:
    """Round-9 (advisor): int partition bounds pack int32 LE only while
    the value fits — an identity field over a bigint source past int32
    must commit (int64 LE per Appendix D) and still prune, decoded by
    length on the read side."""

    BIG = 2**34  # > int32

    def test_commit_and_prune_past_int32(self, spark, tmp_path):
        tdir = str(tmp_path / "big1")
        for k in range(3):
            v = self.BIG + k
            dd = os.path.join(tdir, f"big_id={v}")
            os.makedirs(dd, exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "big_id": pa.array([v], pa.int64()),
                        "v": pa.array([k], pa.int64()),
                    }
                ),
                os.path.join(dd, "f.parquet"),
            )
        schema = spark.createDataFrame([], "big_id long, v long").schema
        commit_append(
            tdir, schema, now_ms=1_000,
            partition_spec=[("big_id", "identity", None)],
        )
        files = plan_scan(
            tdir, source_predicates={"big_id": self.BIG + 1}
        )
        assert [f["partition"]["big_id"] for f in files] == [self.BIG + 1]
        got = read_iceberg_table(
            spark, tdir, source_predicates={"big_id": self.BIG + 1}
        ).collect()
        assert [(r["big_id"], r["v"]) for r in got] == [(self.BIG + 1, 1)]

    def test_long_field_small_values_pack_eight_bytes(self, spark, tmp_path):
        """Advisor r10 (low): Appendix D single-value serialization is
        TYPE-determined — a long partition field's summary bounds are
        ALWAYS 8 bytes, even when every value fits int32, so an
        external reader decoding by field type never misparses."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_avro_ocf,
        )

        tdir = str(tmp_path / "big3")
        for v in (3, 5):
            dd = os.path.join(tdir, f"big_id={v}")
            os.makedirs(dd, exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "big_id": pa.array([v], pa.int64()),
                        "v": pa.array([v * 10], pa.int64()),
                    }
                ),
                os.path.join(dd, "f.parquet"),
            )
        schema = spark.createDataFrame([], "big_id long, v long").schema
        meta = commit_append(
            tdir, schema, now_ms=1_000,
            partition_spec=[("big_id", "identity", None)],
        )
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _s, mfs, _kv = read_avro_ocf(cur["manifest-list"])
        summary = mfs[0]["partitions"][0]
        assert len(bytes(summary["lower_bound"])) == 8
        assert len(bytes(summary["upper_bound"])) == 8
        assert int.from_bytes(bytes(summary["lower_bound"]), "little") == 3
        assert int.from_bytes(bytes(summary["upper_bound"]), "little") == 5
        # the engine's own by-length reader prunes exactly either way
        files = plan_scan(tdir, source_predicates={"big_id": 5})
        assert [f["partition"]["big_id"] for f in files] == [5]

    def test_foreign_width_bound_keeps_conservatively(self, spark, tmp_path):
        """A foreign writer's odd-width int bound must not crash
        planning — decode failure = conservative keep."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            MANIFEST_FILE_SCHEMA,
            read_avro_ocf,
            write_avro_ocf,
        )

        tdir, _schema, meta = _composite_table(
            spark, tmp_path, n_ids=8, name="big2"
        )
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _s, mfs, kv = read_avro_ocf(cur["manifest-list"])
        mfs[0]["partitions"][0]["lower_bound"] = b"\x01\x02\x03"  # 3 bytes
        mfs[0]["partitions"][0]["upper_bound"] = b"\x01\x02\x03"
        write_avro_ocf(
            cur["manifest-list"], MANIFEST_FILE_SCHEMA, mfs, kv or {}
        )
        day = DAY0 + 1
        lo, hi = day * MICROS_PER_DAY, (day + 1) * MICROS_PER_DAY - 1
        files = plan_scan(tdir, source_predicates={"ts_us": (lo, hi)})
        # the foreign bound cannot prune the manifest, but file-level
        # entries still narrow the result exactly
        assert {f["partition"]["ts_day"] for f in files} == {day}


class TestTransformedFieldNameCollision:
    """Round-9 (advisor): a transformed partition field named like a
    schema column would be dropped from every read
    (_read_planned_files sweeps transformed names) — reject at
    create/evolve time."""

    def test_create_rejects_collision(self, spark, tmp_path):
        schema = spark.createDataFrame([], "ts_us long, v long").schema
        with pytest.raises(ValueError, match="collides with a schema column"):
            commit_append(
                str(tmp_path / "col1"), schema, now_ms=1_000,
                partition_spec=[("v", "day", "ts_us")],
            )

    def test_evolve_rejects_collision(self, spark, tmp_path):
        tdir, _schema, _meta = _composite_table(
            spark, tmp_path, n_ids=8, name="col2"
        )
        with pytest.raises(ValueError, match="collides with a schema column"):
            update_partition_spec(
                tdir, [("v", f"bucket[{N_BUCKETS}]", "id")], now_ms=2_000
            )


class TestNullPartitionKeyRejected:
    """Round-9 (advisor): a partition-scoped equality delete keyed on a
    NULL partition value never matches on read (eqNullSafe against a
    recomputed non-null value) — reject at write time, directing the
    caller to global_scope=True."""

    def test_null_partition_key_raises(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_equality_deletes,
        )

        tdir, _schema, _meta = _composite_table(
            spark, tmp_path, n_ids=16, name="nullkey"
        )
        keys = spark.createDataFrame(
            [(None, None, 3)], "ts_day long, id_bucket long, id long"
        )
        with pytest.raises(ValueError, match="global_scope=True"):
            commit_equality_deletes(
                spark, tdir, keys, ["id"], now_ms=2_000
            )
        # nothing committed, no orphan delete files
        assert read_iceberg_table(spark, tdir).count() == 16
        assert not os.path.isdir(os.path.join(tdir, "deletes")) or not [
            f
            for _r, _d, fs in os.walk(os.path.join(tdir, "deletes"))
            for f in fs
        ]

    def test_global_scope_still_accepts_keys_only(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_equality_deletes,
        )

        tdir, _schema, _meta = _composite_table(
            spark, tmp_path, n_ids=16, name="nullkey2"
        )
        keys = spark.createDataFrame([(3,), (7,)], "id long")
        commit_equality_deletes(
            spark, tdir, keys, ["id"], now_ms=2_000, global_scope=True
        )
        got = sorted(
            r["id"] for r in read_iceberg_table(spark, tdir).collect()
        )
        assert got == [i for i in range(16) if i not in (3, 7)]


class TestSortedWrite:
    """Round-9: `write_iceberg_table(sort_by=...)` — sorted writes as a
    first-class table property (Iceberg spec "Sort Orders"): the order
    registers in metadata, becomes the table's write order, stamps
    each data file's sort_order_id, and with max_records_per_file the
    narrow per-file bounds make column-bounds pruning skip whole
    files."""

    def _df(self, spark, ids):
        return spark.createDataFrame(
            [
                (i, (DAY0 + (i % 2)) * MICROS_PER_DAY, i * 10)
                for i in ids
            ],
            "id long, ts_us long, v long",
        )

    SPEC1 = [("ts_day", "day", "ts_us")]

    def test_sorted_write_registers_order_and_prunes(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        tdir = str(tmp_path / "sw1")
        meta = write_iceberg_table(
            spark, self._df(spark, range(256)), tdir,
            partition_spec=self.SPEC1, now_ms=1_000,
            sort_by=["id"], max_records_per_file=32,
        )
        orders = meta["sort-orders"]
        order = next(o for o in orders if o["fields"])
        assert order["fields"][0]["direction"] == "asc"
        assert meta["default-sort-order-id"] == order["order-id"]
        # every data file stamped with the order id, and the slicing
        # produced multiple files per day cell
        files = plan_scan(tdir)
        assert len(files) >= 8
        back = {
            e["data_file"]["sort_order_id"]
            for m in _read_head_manifests(tdir)
            for e in m
            if not e["data_file"].get("content")
        }
        assert back == {order["order-id"]}
        # column-bounds pruning: a narrow id range opens a strict
        # subset of files (sorted slices have disjoint id ranges)
        pruned = plan_scan(tdir, column_bounds=("id", 10, 20))
        assert 0 < len(pruned) < len(files)
        got = sorted(
            r["id"]
            for r in read_iceberg_table(spark, tdir)
            .where("id BETWEEN 10 AND 20")
            .collect()
        )
        assert got == list(range(10, 21))
        # appending with the SAME sort reuses the id (no order churn)
        meta2 = write_iceberg_table(
            spark, self._df(spark, range(256, 320)), tdir,
            partition_spec=self.SPEC1, now_ms=2_000,
            sort_by=["id"], max_records_per_file=32,
        )
        assert len(meta2["sort-orders"]) == len(orders)
        # a sorted-compaction request over already-sorted single files
        # per cell... (files per cell > 1 here, so rewrite compacts;
        # the stamped ids make already_sorted true after one rewrite)
        meta3 = rewrite_data_files(
            spark, tdir, now_ms=3_000, sort_by=["id"]
        )
        n_snaps = len(meta3["snapshots"])
        meta4 = rewrite_data_files(
            spark, tdir, now_ms=4_000, sort_by=["id"]
        )
        assert len(meta4["snapshots"]) == n_snaps  # no-op: sorted+compact

    def test_sorted_write_via_rest_catalog(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )
        from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
            FakeRestCatalogServer, RestCatalogClient,
        )

        tdir = str(tmp_path / "sw2")
        with FakeRestCatalogServer() as server:
            cat = RestCatalogClient(server.base_url)
            cat.ensure_namespace()
            write_iceberg_table(
                spark, self._df(spark, range(64)), tdir,
                partition_spec=self.SPEC1, now_ms=1_000,
                sort_by=["id"], catalog=cat, table_name="sw2",
            )
            meta = write_iceberg_table(
                spark, self._df(spark, range(64, 128)), tdir,
                partition_spec=self.SPEC1, now_ms=2_000,
                sort_by=["id"], catalog=cat, table_name="sw2",
            )
            order = next(o for o in meta["sort-orders"] if o["fields"])
            assert meta["default-sort-order-id"] == order["order-id"]
            assert (
                read_iceberg_table(
                    spark, tdir, catalog=cat, table_name="sw2"
                ).count()
                == 128
            )

    def test_unknown_sort_column_rejected(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        with pytest.raises(ValueError, match="sort_by names missing"):
            write_iceberg_table(
                spark, self._df(spark, range(8)), str(tmp_path / "sw3"),
                partition_spec=self.SPEC1, now_ms=1_000, sort_by=["nope"],
            )

    def test_descending_and_null_order_sort(self, spark, tmp_path):
        """Round-10: sort_by entries take SQL ORDER-BY-style suffixes
        ("v desc", "v asc nulls last") — the registered order carries
        the direction/null-order (Iceberg spec "Sort Orders"), rows
        land in that order, and a different direction is a DIFFERENT
        order id, never a silent reuse."""
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        tdir = str(tmp_path / "sw6")
        # ids with some NULL v values to pin the null-order
        df = spark.createDataFrame(
            [
                (i, (DAY0 * MICROS_PER_DAY), None if i % 7 == 0 else i * 10)
                for i in range(64)
            ],
            "id long, ts_us long, v long",
        )
        meta = write_iceberg_table(
            spark, df, tdir,
            partition_spec=self.SPEC1, now_ms=1_000,
            sort_by=["v desc"], max_records_per_file=16,
        )
        order = next(o for o in meta["sort-orders"] if o["fields"])
        assert order["fields"][0]["direction"] == "desc"
        assert order["fields"][0]["null-order"] == "nulls-last"  # desc default
        # rows in each file are non-increasing with nulls at the end
        for m in _read_head_manifests(tdir):
            for e in m:
                d = e["data_file"]
                if d.get("content"):
                    continue
                vals = pq.read_table(d["file_path"]).column("v").to_pylist()
                non_null = [v for v in vals if v is not None]
                assert non_null == sorted(non_null, reverse=True)
                if None in vals:
                    assert vals.index(None) == len(non_null)  # nulls last
        # a different direction mints a DIFFERENT order id
        meta2 = write_iceberg_table(
            spark, df.select("id", (F.col("ts_us") + 1).alias("ts_us"), "v"),
            tdir, partition_spec=self.SPEC1, now_ms=2_000,
            sort_by=["v asc nulls last"], max_records_per_file=16,
        )
        non_empty = [o for o in meta2["sort-orders"] if o["fields"]]
        assert len(non_empty) == 2
        assert {
            (o["fields"][0]["direction"], o["fields"][0]["null-order"])
            for o in non_empty
        } == {("desc", "nulls-last"), ("asc", "nulls-last")}
        # desc slices still carry disjoint bounds: pruning works
        pruned = plan_scan(tdir, column_bounds=("v", 100, 200))
        files = plan_scan(tdir)
        assert 0 < len(pruned) < len(files)
        # malformed suffix is a typed error
        with pytest.raises(ValueError, match="expected"):
            write_iceberg_table(
                spark, df, str(tmp_path / "sw7"),
                partition_spec=self.SPEC1, now_ms=3_000,
                sort_by=["v sideways"],
            )

    def test_descending_sorted_compaction(self, spark, tmp_path):
        """rewrite_data_files(sort_by=['id desc']) lays the table out
        newest-first — the dominant serving order for log tables."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        tdir = str(tmp_path / "sw8")
        write_iceberg_table(
            spark, self._df(spark, range(256)), tdir,
            partition_spec=self.SPEC1, now_ms=1_000,
        )
        rewrite_data_files(
            spark, tdir, now_ms=2_000,
            sort_by=["id desc"], max_records_per_file=32,
        )
        for m in _read_head_manifests(tdir):
            for e in m:
                d = e["data_file"]
                if e["status"] == 2 or d.get("content"):
                    continue
                ids = pq.read_table(d["file_path"]).column("id").to_pylist()
                assert ids == sorted(ids, reverse=True)
        # an uncapped desc request first re-compacts the sliced layout
        # to one file per cell (still desc-sorted), then no-ops
        rewrite_data_files(spark, tdir, now_ms=3_000, sort_by=["id desc"])
        n = len(_current_meta(tdir)["snapshots"])
        rewrite_data_files(spark, tdir, now_ms=4_000, sort_by=["id desc"])
        assert len(_current_meta(tdir)["snapshots"]) == n  # no-op
        for m in _read_head_manifests(tdir):
            for e in m:
                d = e["data_file"]
                if e["status"] == 2 or d.get("content"):
                    continue
                ids = pq.read_table(d["file_path"]).column("id").to_pylist()
                assert ids == sorted(ids, reverse=True)
        got = read_iceberg_table(spark, tdir).count()
        assert got == 256

    def test_sorted_write_survives_spec_evolution(self, spark, tmp_path):
        """Round-10: sort_by and update_partition_spec in ONE table
        lifetime — the sort order id survives the evolution (appends
        under the new spec reuse it, no order churn), and sorted
        compaction re-sorts the OLD-generation files under the NEW
        composite spec with every rewritten file stamped."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            update_partition_spec,
            write_iceberg_table,
        )

        tdir = str(tmp_path / "sw4")
        meta = write_iceberg_table(
            spark, self._df(spark, range(256)), tdir,
            partition_spec=self.SPEC1, now_ms=1_000,
            sort_by=["id"], max_records_per_file=32,
        )
        order = next(o for o in meta["sort-orders"] if o["fields"])
        oid = order["order-id"]
        assert meta["default-sort-order-id"] == oid
        spec2 = [
            ("ts_day", "day", "ts_us"),
            ("id_bucket", "bucket[4]", "id"),
        ]
        meta2 = update_partition_spec(tdir, spec2, now_ms=2_000)
        # evolution leaves the sort plane untouched
        assert meta2["default-sort-order-id"] == oid
        assert len(meta2["sort-orders"]) == len(meta["sort-orders"])
        # a post-evolution sorted append REUSES the registered order
        meta3 = write_iceberg_table(
            spark, self._df(spark, range(256, 320)), tdir,
            partition_spec=spec2, now_ms=3_000,
            sort_by=["id"], max_records_per_file=32,
        )
        assert meta3["default-sort-order-id"] == oid
        assert len(meta3["sort-orders"]) == len(meta["sort-orders"])
        # sorted compaction migrates generation 1 to the composite spec
        # AND re-sorts it: every live data file carries the full
        # composite tuple and the order id stamp
        # cap low enough that every (day, bucket) cell slices into
        # several id-disjoint files — the pruning surface
        rewrite_data_files(
            spark, tdir, now_ms=4_000,
            sort_by=["id"], max_records_per_file=16,
        )
        files = plan_scan(tdir)
        assert files and all(
            set(f["partition"]) == {"ts_day", "id_bucket"} for f in files
        )
        stamps = {
            e["data_file"]["sort_order_id"]
            for m in _read_head_manifests(tdir)
            for e in m
            if e["status"] != 2 and not e["data_file"].get("content")
        }
        assert stamps == {oid}
        # sorted slices prune on id in the MIGRATED layout too
        pruned = plan_scan(tdir, column_bounds=("id", 10, 20))
        assert 0 < len(pruned) < len(files)
        got = sorted(
            r["id"] for r in read_iceberg_table(spark, tdir).collect()
        )
        assert got == list(range(320))

    def test_sorted_order_id_stable_across_catalog_rebase(
        self, spark, tmp_path
    ):
        """Round-10: two sorted writers racing through the REST catalog
        — the loser's rebase must not re-register the sort order under
        a new id; exactly one non-empty order exists afterward and both
        writers' files carry it."""
        import threading

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )
        from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
            FakeRestCatalogServer, RestCatalogClient,
        )

        tdir = str(tmp_path / "sw5")
        with FakeRestCatalogServer() as server:
            cat = RestCatalogClient(server.base_url)
            cat.ensure_namespace()
            write_iceberg_table(
                spark, self._df(spark, range(16)), tdir,
                partition_spec=self.SPEC1, now_ms=1_000,
                sort_by=["id"], catalog=cat, table_name="sw5",
            )
            errs: list[Exception] = []

            def run(ids, ts):
                try:
                    write_iceberg_table(
                        spark, self._df(spark, ids), tdir,
                        partition_spec=self.SPEC1, now_ms=ts,
                        sort_by=["id"], catalog=cat, table_name="sw5",
                    )
                except Exception as e:  # noqa: BLE001 — surfaced below
                    errs.append(e)

            t1 = threading.Thread(target=run, args=(range(16, 48), 2_000))
            t2 = threading.Thread(target=run, args=(range(48, 80), 2_001))
            t1.start(); t2.start(); t1.join(); t2.join()
            assert errs == []
            meta = cat.load_table("sw5")["metadata"]
            non_empty = [o for o in meta["sort-orders"] if o["fields"]]
            assert len(non_empty) == 1
            oid = non_empty[0]["order-id"]
            assert meta["default-sort-order-id"] == oid
            cur = next(
                s
                for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"]
            )
            from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
                read_avro_ocf,
            )

            _s, mfs, _kv = read_avro_ocf(cur["manifest-list"])
            stamps = {
                e["data_file"]["sort_order_id"]
                for mf in mfs
                for e in read_avro_ocf(mf["manifest_path"])[1]
                if e["status"] != 2 and not e["data_file"].get("content")
            }
            assert stamps == {oid}
            got = read_iceberg_table(
                spark, tdir, catalog=cat, table_name="sw5"
            ).count()
            assert got == 80


def _read_head_manifests(tdir: str):
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_avro_ocf,
    )

    meta = _current_meta(tdir)
    cur = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _s, mfs, _kv = read_avro_ocf(cur["manifest-list"])
    out = []
    for mf in mfs:
        _s2, es, _kv2 = read_avro_ocf(mf["manifest_path"])
        out.append(es)
    return out


class TestZorderRewrite:
    """Round-9: rewrite_data_files(zorder_by=[x, y]) — Iceberg's zorder
    strategy: bit-interleaved clustering so the record-cap file slices
    carry tight bounds on EVERY zorder dimension (a linear sort
    tightens only its leading column)."""

    def _grid_table(self, spark, tmp_path, name):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        from pyspark.sql import functions as F

        tdir = str(tmp_path / name)
        df = spark.createDataFrame(
            [(i, i % 64, i // 64) for i in range(4096)],
            "id long, x long, y long",
        ).withColumn("partition", F.lit(0))
        write_iceberg_table(spark, df, tdir, now_ms=1_000)
        return tdir

    def test_zorder_prunes_both_dimensions(self, spark, tmp_path):
        tdir = self._grid_table(spark, tmp_path, "z1")
        rewrite_data_files(
            spark, tdir, now_ms=2_000,
            zorder_by=["x", "y"], max_records_per_file=256,
        )
        files = plan_scan(tdir)
        assert len(files) >= 8
        for col in ("x", "y"):
            sub = plan_scan(tdir, column_bounds=(col, 0, 15))
            assert 0 < len(sub) < len(files), (col, len(sub), len(files))
        # row set intact, and a 2D box read is exact
        got = (
            read_iceberg_table(spark, tdir)
            .where("x BETWEEN 0 AND 15 AND y BETWEEN 0 AND 15")
            .count()
        )
        assert got == 16 * 16
        assert read_iceberg_table(spark, tdir).count() == 4096

    def test_linear_sort_only_prunes_leading_column(self, spark, tmp_path):
        """The contrast that justifies zorder: sort_by=['x'] leaves
        every file spanning the full y domain (no y pruning), where the
        zorder layout pruned both."""
        tdir = self._grid_table(spark, tmp_path, "z2")
        rewrite_data_files(
            spark, tdir, now_ms=2_000,
            sort_by=["x"], max_records_per_file=256,
        )
        files = plan_scan(tdir)
        x_sub = plan_scan(tdir, column_bounds=("x", 0, 15))
        y_sub = plan_scan(tdir, column_bounds=("y", 0, 15))
        assert 0 < len(x_sub) < len(files)
        assert len(y_sub) == len(files)  # y bounds span everything

    def test_zorder_and_sort_are_exclusive(self, spark, tmp_path):
        tdir = self._grid_table(spark, tmp_path, "z3")
        with pytest.raises(ValueError, match="mutually exclusive"):
            rewrite_data_files(
                spark, tdir, now_ms=2_000,
                sort_by=["x"], zorder_by=["x", "y"],
            )

    @staticmethod
    def _file_spans(tdir, col):
        """Per planned file, (min, max) of ``col`` from parquet footers."""
        spans = []
        for f in plan_scan(tdir):
            md = pq.read_metadata(f["file_path"])
            idx = md.schema.names.index(col)
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            spans.append((lo, hi))
        return spans

    def test_multi_column_bounds_and_prune(self, spark, tmp_path):
        """Round-10: plan_scan takes a LIST of column_bounds triples,
        ANDed — a 2D box probe over the z-ordered layout opens at most
        the per-axis subsets' intersection (the whole point of the
        interleave), and strictly fewer files than no probe."""
        tdir = self._grid_table(spark, tmp_path, "z2d")
        rewrite_data_files(
            spark, tdir, now_ms=2_000,
            zorder_by=["x", "y"], max_records_per_file=256,
        )
        files = plan_scan(tdir)
        x_sub = plan_scan(tdir, column_bounds=("x", 0, 15))
        y_sub = plan_scan(tdir, column_bounds=("y", 0, 15))
        box = plan_scan(
            tdir, column_bounds=[("x", 0, 15), ("y", 0, 15)]
        )
        assert 0 < len(box) <= min(len(x_sub), len(y_sub)) < len(files)
        box_paths = {f["file_path"] for f in box}
        assert box_paths <= (
            {f["file_path"] for f in x_sub}
            & {f["file_path"] for f in y_sub}
        )
        # the planned subset still holds every box row
        got = (
            read_iceberg_table(spark, tdir)
            .where("x BETWEEN 0 AND 15 AND y BETWEEN 0 AND 15")
            .count()
        )
        assert got == 16 * 16

    def test_zorder_date_and_int_dimensions(self, spark, tmp_path):
        """Round-10 (advisor): temporal zorder dimensions — a DATE
        column ranks via its epoch-day ordinal, so the interleaved
        layout carries tight per-file bounds on the date AND the int
        dimension at once (previously a date dim died in raw Spark
        arithmetic)."""
        import datetime as dt

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        from pyspark.sql import functions as F

        tdir = str(tmp_path / "z4")
        epoch = dt.date(1970, 1, 1)
        df = spark.createDataFrame(
            [(i, epoch + dt.timedelta(days=i % 64), i // 64) for i in range(4096)],
            "id long, d date, y long",
        ).withColumn("partition", F.lit(0))
        write_iceberg_table(spark, df, tdir, now_ms=1_000)
        rewrite_data_files(
            spark, tdir, now_ms=2_000,
            zorder_by=["d", "y"], max_records_per_file=256,
        )
        files = plan_scan(tdir)
        assert len(files) >= 8
        # every file's footer bounds are a strict sub-box on BOTH axes
        d_spans = self._file_spans(tdir, "d")
        y_spans = self._file_spans(tdir, "y")
        assert all((hi - lo).days < 63 for lo, hi in d_spans), d_spans
        assert all(hi - lo < 63 for lo, hi in y_spans), y_spans
        # row set intact, 2D box read exact
        got = (
            read_iceberg_table(spark, tdir)
            .where(
                "d BETWEEN DATE'1970-01-01' AND DATE'1970-01-16' "
                "AND y BETWEEN 0 AND 15"
            )
            .count()
        )
        assert got == 16 * 16
        assert read_iceberg_table(spark, tdir).count() == 4096

    def test_zorder_string_dimension_clusters(self, spark, tmp_path):
        """Round-10: string zorder dimensions rank by their first-8-byte
        magnitude (Iceberg's byte-prefix posture) — files carry strict
        lexicographic sub-ranges instead of every file spanning the
        whole domain."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        from pyspark.sql import functions as F

        tdir = str(tmp_path / "z5")
        letters = "abcdefghijklmnopqrstuvwxyz"
        df = spark.createDataFrame(
            [
                (i, letters[(i % 26)] + letters[(i // 26) % 26], i // 64)
                for i in range(4096)
            ],
            "id long, s string, y long",
        ).withColumn("partition", F.lit(0))
        write_iceberg_table(spark, df, tdir, now_ms=1_000)
        rewrite_data_files(
            spark, tdir, now_ms=2_000,
            zorder_by=["s", "y"], max_records_per_file=256,
        )
        files = plan_scan(tdir)
        assert len(files) >= 8
        s_spans = self._file_spans(tdir, "s")
        y_spans = self._file_spans(tdir, "y")
        # strings cluster: no file spans the full a..z domain
        assert all(
            not (lo.startswith("a") and hi.startswith("z"))
            for lo, hi in s_spans
        ), s_spans
        assert all(hi - lo < 63 for lo, hi in y_spans), y_spans
        assert read_iceberg_table(spark, tdir).count() == 4096

    def test_zorder_timestamp_dimension(self, spark, tmp_path):
        """Round-10: TIMESTAMP zorder dimensions rank via epoch micros
        (unix_micros) — the most common clustering dimension in
        log-structured data."""
        import datetime as dt

        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        tdir = str(tmp_path / "z7")
        epoch = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                (i, epoch + dt.timedelta(hours=i % 64), i // 64)
                for i in range(4096)
            ],
            "id long, ts timestamp, y long",
        ).withColumn("partition", F.lit(0))
        write_iceberg_table(spark, df, tdir, now_ms=1_000)
        rewrite_data_files(
            spark, tdir, now_ms=2_000,
            zorder_by=["ts", "y"], max_records_per_file=256,
        )
        files = plan_scan(tdir)
        assert len(files) >= 8
        # INT96 timestamp pages carry no footer stats — span check via
        # a per-file Spark aggregate over the planned files instead
        spans = (
            spark.read.parquet(*sorted(f["file_path"] for f in files))
            .groupBy(F.col("_metadata.file_path").alias("f"))
            .agg(
                F.min("ts").alias("ts_lo"), F.max("ts").alias("ts_hi"),
                F.min("y").alias("y_lo"), F.max("y").alias("y_hi"),
            )
            .collect()
        )
        assert len(spans) >= 8
        assert all(
            (r["ts_hi"] - r["ts_lo"]) < dt.timedelta(hours=63) for r in spans
        ), spans
        assert all(r["y_hi"] - r["y_lo"] < 63 for r in spans), spans
        got = (
            read_iceberg_table(spark, tdir)
            .where(
                "ts BETWEEN TIMESTAMP'2024-01-01 08:00:00' "
                "AND TIMESTAMP'2024-01-01 23:00:00' "
                "AND y BETWEEN 8 AND 23"
            )
            .count()
        )
        assert got == 16 * 16
        assert read_iceberg_table(spark, tdir).count() == 4096

    def test_zorder_unsupported_type_raises_typed(self, spark, tmp_path):
        """Round-10 (advisor): an unsupported zorder dimension type must
        raise a targeted ValueError NAMING the column, before any file
        is touched — not an opaque Spark analysis error (or, ANSI off,
        a silent all-zero rank reported as success)."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        from pyspark.sql import functions as F

        tdir = str(tmp_path / "z6")
        df = spark.createDataFrame(
            [(i, [i, i + 1], i // 64) for i in range(128)],
            "id long, arr array<long>, y long",
        ).withColumn("partition", F.lit(0))
        write_iceberg_table(spark, df, tdir, now_ms=1_000)
        n_before = len(plan_scan(tdir))
        with pytest.raises(ValueError, match="'arr'"):
            rewrite_data_files(
                spark, tdir, now_ms=2_000, zorder_by=["arr", "y"],
            )
        with pytest.raises(ValueError, match="not a table column"):
            rewrite_data_files(
                spark, tdir, now_ms=2_000, zorder_by=["ghost"],
            )
        # side-effect-free: layout untouched, rows intact
        assert len(plan_scan(tdir)) == n_before
        assert read_iceberg_table(spark, tdir).count() == 128


class TestRewritePositionDeletes:
    """Round-9: rewrite_position_deletes — the delete plane's
    compaction (Iceberg's rewritePositionDeleteFiles): merge each
    partition's accumulated position-delete files into one sorted file,
    drop dangling rows, tombstone the originals; data files untouched."""

    def _table_with_delete_churn(self, spark, tmp_path, name):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_position_deletes,
        )

        tdir, schema, _meta = _composite_table(
            spark, tmp_path, n_ids=64, name=name
        )
        # three separate delete commits -> three delete files per
        # touched partition cell
        commit_position_deletes(spark, tdir, "id IN (1, 2)", now_ms=2_000)
        commit_position_deletes(spark, tdir, "id IN (5, 9)", now_ms=3_000)
        commit_position_deletes(spark, tdir, "id IN (13, 17)", now_ms=4_000)
        return tdir, schema

    def _live_pos_delete_files(self, tdir):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_table_metadata,
        )

        back = read_table_metadata(tdir)
        return [
            e["data_file"]["file_path"]
            for m in back["manifests"]
            for e in m["entries"]
            if e["status"] != 2
            and e["data_file"].get("content") == 1
            and not e["data_file"].get("referenced_data_file")
        ]

    def test_merges_per_partition_and_preserves_rows(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            rewrite_position_deletes,
        )

        tdir, _schema = self._table_with_delete_churn(spark, tmp_path, "rpd1")
        before = self._live_pos_delete_files(tdir)
        per_part_before: dict[str, int] = {}
        for p in before:
            per_part_before[os.path.dirname(p)] = (
                per_part_before.get(os.path.dirname(p), 0) + 1
            )
        assert max(per_part_before.values()) > 1  # churn exists
        expected = sorted(
            i for i in range(64) if i not in (1, 2, 5, 9, 13, 17)
        )
        meta = rewrite_position_deletes(spark, tdir, now_ms=5_000)
        after = self._live_pos_delete_files(tdir)
        per_part_after: dict[str, int] = {}
        for p in after:
            per_part_after[os.path.dirname(p)] = (
                per_part_after.get(os.path.dirname(p), 0) + 1
            )
        assert max(per_part_after.values()) == 1  # one file per cell
        assert len(after) < len(before)
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == expected
        # delete counters stay exact through the rewrite
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        assert int(cur["summary"]["total-position-deletes"]) == 6
        # idempotent: second run is a no-op
        n_snaps = len(meta["snapshots"])
        meta2 = rewrite_position_deletes(spark, tdir, now_ms=6_000)
        assert len(meta2["snapshots"]) == n_snaps

    def test_drops_dangling_rows_after_data_rewrite(self, spark, tmp_path):
        """Positions referencing data files a rewrite replaced must
        vanish from the merged output (they can never match again)."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_position_deletes,
            read_table_metadata,
            rewrite_position_deletes,
        )

        tdir, schema, _meta = _composite_table(
            spark, tmp_path, n_ids=32, name="rpd2"
        )
        commit_position_deletes(spark, tdir, "id = 3", now_ms=2_000)
        commit_position_deletes(spark, tdir, "id = 7", now_ms=3_000)
        # grow the table with files the deletes do NOT reference, then
        # craft danglers: append new files and delete from them, then
        # data-rewrite ONLY by adding... simplest true dangler: rewrite
        # the data (materializes deletes + tombstones delete files) is
        # total — instead simulate a dangler by removing a data file
        # entry via a second delete targeting rows, then manually
        # confirm semi-join drops unknown paths:
        back = read_table_metadata(tdir)
        live_pos = [
            e["data_file"]
            for m in back["manifests"]
            for e in m["entries"]
            if e["status"] != 2 and e["data_file"].get("content") == 1
        ]
        assert live_pos
        # inject a dangling row into one existing delete file
        target = live_pos[0]["file_path"]
        t = pq.read_table(target)
        import pyarrow as _pa

        dang = _pa.table(
            {
                "file_path": _pa.array(
                    ["/nonexistent/ghost.parquet"], _pa.string()
                ),
                "pos": _pa.array([0], _pa.int64()),
            }
        ).cast(t.schema)
        pq.write_table(_pa.concat_tables([t, dang]), target)
        meta = rewrite_position_deletes(spark, tdir, now_ms=4_000)
        merged = self._live_pos_delete_files(tdir)
        ghost = 0
        for p in merged:
            tb = pq.read_table(p)
            ghost += sum(
                1
                for v in tb.column("file_path").to_pylist()
                if "ghost" in v
            )
        assert ghost == 0  # dangler dropped
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [i for i in range(32) if i not in (3, 7)]
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        assert int(cur["summary"]["total-position-deletes"]) == 2

    def test_old_spec_generations_compact(self, spark, tmp_path):
        """Round-10: after partition evolution, OLD-generation delete
        files merge within their own generation's cells (the Java
        rewritePositionDeleteFiles compacts every spec generation) —
        each generation's merged files in a manifest scoped to its own
        spec id, consumer counts exact."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            bucket_hash_long,
            commit_position_deletes,
            read_table_metadata,
            rewrite_position_deletes,
            update_partition_spec,
            write_iceberg_table,
        )

        tdir = str(tmp_path / "rpdevo")
        df1 = spark.createDataFrame(
            [(v % 2, v) for v in range(64)], "partition int, v long"
        )
        write_iceberg_table(
            spark, df1, tdir, now_ms=1_000,
            partition_spec=[("partition", "identity", None)],
        )
        # two pre-evolution delete commits -> 2 files per old-gen cell
        commit_position_deletes(spark, tdir, "v IN (1, 2)", now_ms=2_000)
        commit_position_deletes(spark, tdir, "v IN (5, 8)", now_ms=3_000)
        new_spec = [
            ("partition", "identity", None),
            ("v_bucket", "bucket[4]", "v"),
        ]
        update_partition_spec(tdir, new_spec, now_ms=4_000)
        df2 = spark.createDataFrame(
            [(v % 2, v) for v in range(64, 128)], "partition int, v long"
        )
        write_iceberg_table(
            spark, df2, tdir, now_ms=5_000, partition_spec=new_spec,
        )
        # two post-evolution commits hitting the SAME new-gen cell (two
        # new rows sharing parity + bucket), so the new generation has
        # churn to merge too
        def bkt(v: int) -> int:
            return (bucket_hash_long(v) & 0x7FFFFFFF) % 4

        cells: dict[tuple, list[int]] = {}
        for v in range(64, 128):
            cells.setdefault((v % 2, bkt(v)), []).append(v)
        va, vb = next(vs for vs in cells.values() if len(vs) >= 2)[:2]
        commit_position_deletes(spark, tdir, f"v = {va}", now_ms=6_000)
        commit_position_deletes(spark, tdir, f"v = {vb}", now_ms=7_000)
        meta = rewrite_position_deletes(spark, tdir, now_ms=8_000)

        # every generation's every cell now holds at most ONE live file,
        # and BOTH generations got a delete manifest under their own spec
        back = read_table_metadata(tdir)
        per_cell: dict[tuple, int] = {}
        live_manifest_sids = set()
        for m in back["manifests"]:
            sid = int(m["file"]["partition_spec_id"])
            for e in m["entries"]:
                d = e["data_file"]
                if (
                    e["status"] != 2
                    and d.get("content") == 1
                    and not d.get("referenced_data_file")
                ):
                    cell = (sid, json.dumps(d["partition"], sort_keys=True))
                    per_cell[cell] = per_cell.get(cell, 0) + 1
                    live_manifest_sids.add(sid)
        assert per_cell and max(per_cell.values()) == 1
        assert live_manifest_sids == {0, 1}  # both generations compacted
        gone = {1, 2, 5, 8, va, vb}
        got = sorted(r["v"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [v for v in range(128) if v not in gone]
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        assert int(cur["summary"]["total-position-deletes"]) == len(gone)
        # idempotent: second run is a no-op
        meta2 = rewrite_position_deletes(spark, tdir, now_ms=9_000)
        assert len(meta2["snapshots"]) == len(meta["snapshots"])

    def test_single_cell_table_merges_whole_plane(self, spark, tmp_path):
        """Round-10: a one-cell table (the engine's unpartitioned form —
        a constant ``partition`` column) concentrates the ENTIRE delete
        plane in one cell; rpd merges it to one file with counts exact."""
        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_position_deletes,
            rewrite_position_deletes,
            write_iceberg_table,
        )

        tdir = str(tmp_path / "rpdunp")
        df = spark.createDataFrame(
            [(i, i * 10) for i in range(64)], "id long, v long"
        ).withColumn("partition", F.lit(0))
        write_iceberg_table(spark, df, tdir, now_ms=1_000)
        commit_position_deletes(spark, tdir, "id IN (3, 7)", now_ms=2_000)
        commit_position_deletes(spark, tdir, "id IN (11, 13)", now_ms=3_000)
        meta = rewrite_position_deletes(spark, tdir, now_ms=4_000)
        after = self._live_pos_delete_files(tdir)
        assert len(after) == 1 and "delete-merged-" in after[0]
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [i for i in range(64) if i not in (3, 7, 11, 13)]
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        assert int(cur["summary"]["total-position-deletes"]) == 4

    def test_row_cap_slices_hot_cell(self, spark, tmp_path):
        """Round-10 (advisor): ``max_rows_per_delete_file`` slices a hot
        cell's merged set into several consecutively-sorted files —
        bounding the per-task pandas memory — while the scan still
        applies every delete."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            rewrite_position_deletes,
        )

        tdir, _schema = self._table_with_delete_churn(spark, tmp_path, "rpdcap")
        meta = rewrite_position_deletes(
            spark, tdir, now_ms=5_000, max_rows_per_delete_file=1
        )
        after = self._live_pos_delete_files(tdir)
        per_cell: dict[str, int] = {}
        for p in after:
            per_cell[os.path.dirname(p)] = per_cell.get(os.path.dirname(p), 0) + 1
            tb = pq.read_table(p)
            assert tb.num_rows <= 1  # the forced cap
            rows = list(
                zip(tb.column("file_path").to_pylist(), tb.column("pos").to_pylist())
            )
            assert rows == sorted(rows)  # each slice stays sorted
        assert max(per_cell.values()) > 1  # the hot cell actually sliced
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == sorted(i for i in range(64) if i not in (1, 2, 5, 9, 13, 17))
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        assert int(cur["summary"]["total-position-deletes"]) == 6

    def test_catalog_mode(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_position_deletes,
            rewrite_position_deletes,
        )
        from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
            FakeRestCatalogServer, RestCatalogClient,
        )

        tdir, _schema, _meta = _composite_table(
            spark, tmp_path, n_ids=32, name="rpd3"
        )
        with FakeRestCatalogServer() as srv:
            cat = RestCatalogClient(srv.base_url)
            cat.ensure_namespace()
            cat.create_table("rpd3", _current_meta(tdir))
            commit_position_deletes(
                spark, tdir, "id = 4", now_ms=2_000, catalog=cat,
                table_name="rpd3",
            )
            commit_position_deletes(
                spark, tdir, "id = 8", now_ms=3_000, catalog=cat,
                table_name="rpd3",
            )
            rewrite_position_deletes(
                spark, tdir, now_ms=4_000, catalog=cat, table_name="rpd3"
            )
            got = sorted(
                r["id"]
                for r in read_iceberg_table(
                    spark, tdir, catalog=cat, table_name="rpd3"
                ).collect()
            )
            assert got == [i for i in range(32) if i not in (4, 8)]


class TestExpireOlderThan:
    """Round-9: expire_snapshots(older_than_ms=...) — age-based
    retention composed with keep_last (max of count and age, the Java
    expireOlderThan semantics)."""

    def test_age_keeps_young_snapshots_past_keep_last(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            expire_snapshots,
        )

        tdir = str(tmp_path / "age1")
        schema = spark.createDataFrame([], "ts_us long, id long, v long").schema
        for k in range(5):
            _write_composite_files(tdir, range(k * 4, k * 4 + 4), tag=f"g{k}")
            commit_append(
                tdir, schema, partition_spec=SPEC, now_ms=(k + 1) * 1_000
            )
        # cutoff between snapshots 2 and 3: keep_last=1 alone would
        # leave one; age keeps snapshots 3,4,5 (ts >= 3000)
        meta = expire_snapshots(
            tdir, keep_last=1, now_ms=10_000, older_than_ms=3_000
        )
        kept = sorted(s["timestamp-ms"] for s in meta["snapshots"])
        assert kept == [3_000, 4_000, 5_000]
        # all data still live (append-only: head references everything)
        assert read_iceberg_table(spark, tdir).count() == 20

    def test_age_alone_never_drops_below_keep_last(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            expire_snapshots,
        )

        tdir = str(tmp_path / "age2")
        schema = spark.createDataFrame([], "ts_us long, id long, v long").schema
        for k in range(3):
            _write_composite_files(tdir, range(k * 4, k * 4 + 4), tag=f"g{k}")
            commit_append(
                tdir, schema, partition_spec=SPEC, now_ms=(k + 1) * 1_000
            )
        # cutoff past every snapshot: keep_last=2 still holds two
        meta = expire_snapshots(
            tdir, keep_last=2, now_ms=10_000, older_than_ms=9_000
        )
        kept = sorted(s["timestamp-ms"] for s in meta["snapshots"])
        assert kept == [2_000, 3_000]


class TestRewritePosDeletesReviewFixes:
    """Round-9 self-review regressions for rewrite_position_deletes."""

    def test_scoped_scan_applies_merged_deletes(self, spark, tmp_path):
        """The committed partition dicts must be SPEC-ordered: on a
        (ts_day, id_bucket) table — alphabetical order differs — an
        alphabetically-reordered dict misaligns the manifest summary
        array and a day-scoped scan would prune the merged delete
        manifest unopened, resurrecting deleted rows."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_position_deletes,
            rewrite_position_deletes,
        )

        tdir, _schema, _meta = _composite_table(
            spark, tmp_path, n_ids=64, name="rpdfix1"
        )
        commit_position_deletes(spark, tdir, "id IN (4, 8)", now_ms=2_000)
        commit_position_deletes(spark, tdir, "id IN (12, 16)", now_ms=3_000)
        rewrite_position_deletes(spark, tdir, now_ms=4_000)
        # ids 4,8,12,16 all live on day DAY0 (id % 4 == 0)
        w = (DAY0 * MICROS_PER_DAY, (DAY0 + 1) * MICROS_PER_DAY - 1)
        got = sorted(
            r["id"]
            for r in read_iceberg_table(
                spark, tdir, source_predicates={"ts_us": w}
            ).collect()
        )
        assert got == [
            i for i in range(64) if i % 4 == 0 and i not in (4, 8, 12, 16)
        ]

    def test_string_partition_with_space_merges(self, spark, tmp_path):
        """input_file_name() percent-encodes special hive-dir chars; the
        group map must match the encoded spelling too, or the cell's
        delete rows silently vanish while the originals tombstone."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_position_deletes,
            rewrite_position_deletes,
            write_iceberg_table,
        )

        tdir = str(tmp_path / "rpdfix2")
        df = spark.createDataFrame(
            [(i, "en us" if i % 2 == 0 else "de", i * 10) for i in range(32)],
            "id long, lang string, v long",
        )
        write_iceberg_table(
            spark, df, tdir, now_ms=1_000,
            partition_spec=[("lang", "identity", None)],
        )
        commit_position_deletes(spark, tdir, "id IN (0, 2)", now_ms=2_000)
        commit_position_deletes(spark, tdir, "id IN (4, 6)", now_ms=3_000)
        rewrite_position_deletes(spark, tdir, now_ms=4_000)
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [i for i in range(32) if i not in (0, 2, 4, 6)]


class TestNullCellEqualityDelete:
    """Round-9 self-review: the null-key guard must not ban the
    LEGITIMATE null-cell delete (read-side eqNullSafe matches null
    partition values exactly) — it is opt-in via
    allow_null_partition=True."""

    def test_null_cell_delete_opt_in(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_equality_deletes,
            write_iceberg_table,
        )

        tdir = str(tmp_path / "nullcell")
        df = spark.createDataFrame(
            [(i, None if i % 4 == 0 else f"l{i % 3}", i * 10) for i in range(24)],
            "id long, lang string, v long",
        )
        write_iceberg_table(
            spark, df, tdir, now_ms=1_000,
            partition_spec=[("lang", "identity", None)],
        )
        keys = spark.createDataFrame(
            [(None, 0), (None, 8)], "lang string, id long"
        )
        # default still rejects (the common caller bug)...
        with pytest.raises(ValueError, match="allow_null_partition"):
            commit_equality_deletes(spark, tdir, keys, ["id"], now_ms=2_000)
        # ...but the intentional null-cell delete works end to end
        commit_equality_deletes(
            spark, tdir, keys, ["id"], now_ms=3_000,
            allow_null_partition=True,
        )
        got = sorted(r["id"] for r in read_iceberg_table(spark, tdir).collect())
        assert got == [i for i in range(24) if i not in (0, 8)]
        # and it retracts ONLY the null cell: the same id in a non-null
        # cell survives a null-scoped key (partition-exact semantics)
        keys2 = spark.createDataFrame([(None, 1)], "lang string, id long")
        commit_equality_deletes(
            spark, tdir, keys2, ["id"], now_ms=4_000,
            allow_null_partition=True,
        )
        assert (
            read_iceberg_table(spark, tdir).where("id = 1").count() == 1
        )  # id 1 lives in lang='l1', untouched by the null-cell delete


class TestTemporalColumnBounds:
    """Round-10: DATE / TIMESTAMP column-stats file pruning — temporal
    footer stats publish as exact integers (epoch-day ordinal / epoch
    micros, the Appendix D single-value forms), so
    ``plan_scan(column_bounds=...)`` prunes time windows without
    opening files. NANOS columns stay unpublished (pyarrow reports
    ns-precision stats whose micros conversion would truncate the
    upper bound — unsafe), so they prune nothing, conservatively."""

    def _banded(self, spark, tmp_path, name, col_type):
        import datetime as dt

        from pyspark.sql import functions as F

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        tdir = str(tmp_path / name)
        if col_type == "date":
            epoch = dt.date(1970, 1, 1)
            rows = [(i, epoch + dt.timedelta(days=i)) for i in range(64)]
            schema = "id long, t date"
        else:
            base = dt.datetime(2024, 1, 1)
            rows = [(i, base + dt.timedelta(hours=i)) for i in range(64)]
            schema = "id long, t timestamp"
        df = spark.createDataFrame(rows, schema).withColumn(
            "partition", F.lit(0).cast("int")
        )
        write_iceberg_table(
            spark, df, tdir, now_ms=1_000,
            sort_by=["t"], max_records_per_file=8,
        )
        return tdir

    def test_date_bounds_prune(self, spark, tmp_path):
        tdir = self._banded(spark, tmp_path, "tb1", "date")
        files = plan_scan(tdir)
        assert len(files) >= 4
        # epoch days 10..20: two 8-row bands at most
        sub = plan_scan(tdir, column_bounds=("t", 10, 20))
        assert 0 < len(sub) < len(files)
        got = (
            read_iceberg_table(spark, tdir)
            .where("t BETWEEN DATE'1970-01-11' AND DATE'1970-01-21'")
            .count()
        )
        assert got == 11

    def test_timestamp_bounds_prune(self, spark, tmp_path):
        import datetime as dt

        tdir = self._banded(spark, tmp_path, "tb2", "timestamp")
        files = plan_scan(tdir)
        assert len(files) >= 4
        base = dt.datetime(2024, 1, 1)
        lo = int((base + dt.timedelta(hours=10)).timestamp() * 1_000_000)
        hi = int((base + dt.timedelta(hours=20)).timestamp() * 1_000_000)
        sub = plan_scan(tdir, column_bounds=("t", lo, hi))
        assert 0 < len(sub) < len(files)
        got = (
            read_iceberg_table(spark, tdir)
            .where(
                "t BETWEEN TIMESTAMP'2024-01-01 10:00:00' "
                "AND TIMESTAMP'2024-01-01 20:00:00'"
            )
            .count()
        )
        assert got == 11

    def test_nanos_column_conservatively_unpruned(self, spark, tmp_path):
        """A TIMESTAMP(NANOS) parquet column must publish NO bounds —
        pruning on it keeps every file (never silently drops rows)."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_table_metadata,
        )

        tdir = str(tmp_path / "tb3")
        for b in range(4):
            dd = os.path.join(tdir, "partition=0")
            os.makedirs(dd, exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "id": pa.array(
                            list(range(b * 8, b * 8 + 8)), pa.int64()
                        ),
                        "t": pa.array(
                            [
                                i * 3_600_000_000_000 + 1  # +1 ns
                                for i in range(b * 8, b * 8 + 8)
                            ],
                            pa.timestamp("ns"),
                        ),
                    }
                ),
                os.path.join(dd, f"band-{b}.parquet"),
            )
        schema = spark.createDataFrame(
            [], "id long, t timestamp, partition int"
        ).schema
        commit_append(tdir, schema, now_ms=1_000)
        files = plan_scan(tdir)
        assert len(files) == 4
        # bounded id prunes (ints publish); t publishes nothing
        assert 0 < len(plan_scan(tdir, column_bounds=("id", 0, 7))) < 4
        back = read_table_metadata(tdir)
        saw_bounds = False
        for m in back["manifests"]:
            for e in m["entries"]:
                lb = e["data_file"].get("lower_bounds")
                if lb:
                    saw_bounds = True
                    fields = {kv["key"] for kv in lb}
                    assert 2 not in fields, fields  # t (field 2) absent
        assert saw_bounds  # id bounds did publish


class TestNullDataPartitionCell:
    """Round-10: a NULL partition VALUE on the DATA path, end-to-end —
    hive layout writes ``__HIVE_DEFAULT_PARTITION__``, the scan's
    pruning and the delete planes' ``_norm_file_expr`` identity joins
    must all treat the null cell as a first-class cell (the eq-delete
    plane gained ``allow_null_partition`` in r9; the data plane had
    never been exercised against an actual null cell)."""

    def _null_cell_table(self, spark, tmp_path, name):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        tdir = str(tmp_path / name)
        rows = [
            (i, None if i % 4 == 0 else f"cat{i % 3}", i * 10)
            for i in range(32)
        ]
        df = spark.createDataFrame(rows, "id long, cat string, v long")
        write_iceberg_table(
            spark, df, tdir, now_ms=1_000,
            partition_spec=[("cat", "identity", None)],
        )
        return tdir

    def test_write_scan_prune_null_cell(self, spark, tmp_path):
        tdir = self._null_cell_table(spark, tmp_path, "nullcell1")
        assert os.path.isdir(
            os.path.join(tdir, "cat=__HIVE_DEFAULT_PARTITION__")
        )
        cells = {
            json.dumps(f["partition"], sort_keys=True)
            for f in plan_scan(tdir)
        }
        assert '{"cat": null}' in cells and len(cells) == 4
        df = read_iceberg_table(spark, tdir)
        assert df.count() == 32
        assert sorted(
            r["id"] for r in df.where("cat IS NULL").collect()
        ) == [i for i in range(32) if i % 4 == 0]
        # metadata-level pruning reaches the null cell, and ONLY it
        sub = plan_scan(tdir, source_predicates={"cat": None})
        assert sub and all(f["partition"]["cat"] is None for f in sub)
        assert len(sub) < len(cells) + 1

    def test_delete_planes_through_null_cell(self, spark, tmp_path):
        """pos-delete -> eq-delete (allow_null_partition) -> rpd over a
        churned null cell: every plane's file-identity join crosses the
        __HIVE_DEFAULT_PARTITION__ layout with exact counts."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_equality_deletes,
            commit_position_deletes,
            rewrite_position_deletes,
        )

        tdir = self._null_cell_table(spark, tmp_path, "nullcell2")
        # two pos-delete commits into the null cell (ids 4, 8 are %4==0)
        commit_position_deletes(spark, tdir, "id = 4", now_ms=2_000)
        commit_position_deletes(spark, tdir, "id = 8", now_ms=3_000)
        assert read_iceberg_table(spark, tdir).count() == 30
        # eq-delete scoped to the null cell (deliberate, r9 opt-in)
        keys = spark.createDataFrame([(None, 12)], "cat string, id long")
        commit_equality_deletes(
            spark, tdir, keys, ["id"], now_ms=4_000,
            allow_null_partition=True,
        )
        got = read_iceberg_table(spark, tdir)
        assert got.count() == 29
        assert sorted(r["id"] for r in got.where("cat IS NULL").collect()) == [
            i for i in range(32) if i % 4 == 0 and i not in (4, 8, 12)
        ]
        # the null cell's delete churn compacts like any other cell
        meta = rewrite_position_deletes(spark, tdir, now_ms=5_000)
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_table_metadata,
        )

        back = read_table_metadata(tdir)
        null_cell_files = [
            e["data_file"]["file_path"]
            for m in back["manifests"]
            for e in m["entries"]
            if e["status"] != 2
            and e["data_file"].get("content") == 1
            and not e["data_file"].get("referenced_data_file")
            and e["data_file"]["partition"].get("cat") is None
        ]
        assert len(null_cell_files) == 1  # merged
        assert "__HIVE_DEFAULT_PARTITION__" in null_cell_files[0]
        assert read_iceberg_table(spark, tdir).count() == 29
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        assert int(cur["summary"]["total-position-deletes"]) == 2

    def test_rewrite_data_files_preserves_null_cell(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_position_deletes,
            rewrite_data_files,
        )

        tdir = self._null_cell_table(spark, tmp_path, "nullcell3")
        commit_position_deletes(spark, tdir, "id IN (4, 16)", now_ms=2_000)
        rewrite_data_files(spark, tdir, now_ms=3_000)
        df = read_iceberg_table(spark, tdir)
        assert df.count() == 30
        assert sorted(r["id"] for r in df.where("cat IS NULL").collect()) == [
            i for i in range(32) if i % 4 == 0 and i not in (4, 16)
        ]
        # the rewritten layout still plans a null cell
        sub = plan_scan(tdir, source_predicates={"cat": None})
        assert sub and all(f["partition"]["cat"] is None for f in sub)

    def test_transformed_null_source_value(self, spark, tmp_path):
        """A null SOURCE value under a day() transform produces a null
        partition value (spec: transforms map null -> null) — written,
        planned, and read back as its own cell."""
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            write_iceberg_table,
        )

        tdir = str(tmp_path / "nullcell4")
        rows = [
            (
                i,
                None
                if i % 5 == 0
                else (DAY0 + (i % 2)) * MICROS_PER_DAY + i,
            )
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, "id long, ts_us long")
        write_iceberg_table(
            spark, df, tdir, now_ms=1_000,
            partition_spec=[("ts_day", "day", "ts_us")],
        )
        cells = {
            f["partition"]["ts_day"] for f in plan_scan(tdir)
        }
        assert cells == {None, DAY0, DAY0 + 1}
        got = read_iceberg_table(spark, tdir)
        assert got.count() == 20
        assert sorted(
            r["id"] for r in got.where("ts_us IS NULL").collect()
        ) == [i for i in range(20) if i % 5 == 0]
        # a day-range prune must NOT open the null cell (a null source
        # can never satisfy a range), and a day prune still finds its day
        w = (DAY0 * MICROS_PER_DAY, (DAY0 + 1) * MICROS_PER_DAY - 1)
        sub = plan_scan(tdir, source_range=w)
        assert sub and {f["partition"]["ts_day"] for f in sub} == {DAY0}
