"""Iceberg partition transforms (spec "Partition Transforms"):
bucket[N] (Murmur3 x86-32, seed 0, per the spec's own test vectors),
truncate[W], and the temporal family — transform functions, the Spark
partition-column forms, commit-time spec recording, and
transform-aware scan pruning (source predicate -> partition space).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    bucket_hash_long,
    bucket_hash_long_vec,
    bucket_hash_str,
    commit_append,
    is_order_preserving,
    parse_transform,
    plan_scan,
    read_iceberg_table,
    transform_column,
    transform_value,
)

MICROS_PER_DAY = 86_400_000_000


class TestTransformFunctions:
    def test_spec_hash_vectors(self):
        # the Iceberg spec's published Murmur3 requirements: int and
        # long 34 hash identically (8-byte little-endian form)
        assert bucket_hash_long(34) == 2017239379
        assert bucket_hash_str("iceberg") == 1210000089

    @settings(max_examples=50, deadline=None)
    @given(v=st.integers(-(2**63), 2**63 - 1))
    def test_vectorized_matches_scalar(self, v):
        vec = bucket_hash_long_vec(np.array([v], dtype=np.int64))
        assert int(vec[0]) == bucket_hash_long(v)

    def test_truncate(self):
        assert transform_value("truncate[10]", 1) == 0
        assert transform_value("truncate[10]", -1) == -10
        assert transform_value("truncate[3]", "iceberg") == "ice"

    def test_temporal(self):
        # 2017-11-16T22:31:08 UTC
        us = 1_510_871_468_000_000
        assert transform_value("day", us) == 17486
        assert transform_value("hour", us) == 419686
        assert transform_value("month", us) == 574
        assert transform_value("year", us) == 47
        assert transform_value("day", -1) == -1  # floor, not trunc

    def test_bucket_and_order(self):
        assert transform_value("bucket[16]", 34) == (2017239379 % 16)
        assert not is_order_preserving("bucket[16]")
        assert is_order_preserving("day")
        assert is_order_preserving("truncate[8]")
        with pytest.raises(ValueError, match="unknown partition transform"):
            parse_transform("bucket[]")


class TestSparkColumnForms:
    @pytest.mark.parametrize("spec", ["bucket[4]", "truncate[100]", "day", "hour", "month", "year", "void"])
    def test_column_matches_scalar(self, spark, spec):
        vals = [0, 1, -1, 34, 12345678901234, -12345678901234]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        out = {
            r["v"]: r["p"]
            for r in transform_column(df, "v", spec, "p").collect()
        }
        for v in vals:
            want = transform_value(spec, v)
            assert out[v] == want, (spec, v, out[v], want)


def _write_day_table(tmp_path):
    tdir = str(tmp_path / "day-tbl")
    # 10 days x 20 rows; files land in hive dirs named by the DAY value
    for d in range(10):
        dd = os.path.join(tdir, f"ts_day={17000 + d}")
        os.makedirs(dd, exist_ok=True)
        base = (17000 + d) * MICROS_PER_DAY
        pq.write_table(
            pa.table(
                {
                    "ts_us": pa.array(
                        [base + i * 3_600_000_000 for i in range(20)],
                        pa.int64(),
                    ),
                    "v": pa.array(list(range(20)), pa.int64()),
                }
            ),
            os.path.join(dd, f"d{d}.parquet"),
        )
    return tdir


class TestDayPartitionedTable:
    def test_commit_records_transform_and_prunes(self, spark, tmp_path):
        tdir = _write_day_table(tmp_path)
        schema = spark.createDataFrame([], "ts_us long, v long").schema
        commit_append(
            tdir, schema, partition_col="ts_day", now_ms=1_000,
            partition_transform="day", partition_source="ts_us",
        )
        # external-reader shape: the spec records the transform and
        # sources the ts column; ts_day is NOT a schema column
        with open(os.path.join(tdir, "metadata", "v1.metadata.json")) as f:
            meta = json.load(f)
        field = meta["partition-specs"][0]["fields"][0]
        assert field["transform"] == "day"
        assert field["name"] == "ts_day"
        schema_cols = {c["name"] for c in meta["schemas"][0]["fields"]}
        assert "ts_day" not in schema_cols and "ts_us" in schema_cols
        src_id = next(
            c["id"] for c in meta["schemas"][0]["fields"] if c["name"] == "ts_us"
        )
        assert field["source-id"] == src_id

        # a 3-day source-micros range opens exactly 3 files
        lo = 17003 * MICROS_PER_DAY
        hi = 17005 * MICROS_PER_DAY + 5
        files = plan_scan(tdir, source_range=(lo, hi))
        assert len(files) == 3
        days = sorted(f["partition"]["ts_day"] for f in files)
        assert days == [17003, 17004, 17005]

        # and the read applies the row-level residual too: days 17003
        # and 17004 fully, plus only day 17005's hour-0 row (<= hi)
        rows = read_iceberg_table(
            spark, tdir, source_range=(lo, hi)
        ).count()
        assert rows == 2 * 20 + 1

    def test_source_value_points_at_one_day(self, spark, tmp_path):
        tdir = _write_day_table(tmp_path)
        schema = spark.createDataFrame([], "ts_us long, v long").schema
        commit_append(
            tdir, schema, partition_col="ts_day", now_ms=1_000,
            partition_transform="day", partition_source="ts_us",
        )
        us = 17007 * MICROS_PER_DAY + 12 * 3_600_000_000
        files = plan_scan(tdir, source_value=us)
        assert [f["partition"]["ts_day"] for f in files] == [17007]

    def test_append_with_mismatched_transform_rejected(self, spark, tmp_path):
        tdir = _write_day_table(tmp_path)
        schema = spark.createDataFrame([], "ts_us long, v long").schema
        commit_append(
            tdir, schema, partition_col="ts_day", now_ms=1_000,
            partition_transform="day", partition_source="ts_us",
        )
        with pytest.raises(
            ValueError, match=r"partitioned by \[\('ts_day', 'day'\)\]"
        ):
            commit_append(
                tdir, schema, partition_col="ts_day", now_ms=2_000,
                partition_transform="bucket[4]", partition_source="v",
            )

    def test_partition_column_is_metadata_only(self, spark, tmp_path):
        tdir = _write_day_table(tmp_path)
        schema = spark.createDataFrame([], "ts_us long, v long").schema
        commit_append(
            tdir, schema, partition_col="ts_day", now_ms=1_000,
            partition_transform="day", partition_source="ts_us",
        )
        cols = read_iceberg_table(spark, tdir).columns
        assert "ts_day" not in cols and set(cols) == {"ts_us", "v"}

    def test_rewrite_data_files_recomputes_the_transform(
        self, spark, tmp_path
    ):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            rewrite_data_files,
        )

        tdir = _write_day_table(tmp_path)
        schema = spark.createDataFrame([], "ts_us long, v long").schema
        commit_append(
            tdir, schema, partition_col="ts_day", now_ms=1_000,
            partition_transform="day", partition_source="ts_us",
        )
        # split each day into a second file so the table is compactable
        for d in range(10):
            dd = os.path.join(tdir, f"ts_day={17000 + d}")
            base = (17000 + d) * MICROS_PER_DAY
            pq.write_table(
                pa.table(
                    {
                        "ts_us": pa.array([base + 999], pa.int64()),
                        "v": pa.array([999], pa.int64()),
                    }
                ),
                os.path.join(dd, f"extra{d}.parquet"),
            )
        commit_append(
            tdir, schema, partition_col="ts_day", now_ms=2_000,
            partition_transform="day", partition_source="ts_us",
        )
        before = read_iceberg_table(spark, tdir).groupBy().count().collect()[0][0]
        rewrite_data_files(spark, tdir, now_ms=3_000)
        files = plan_scan(tdir)
        # one compacted file per day, grouped by the RECOMPUTED transform
        assert len(files) == 10
        days = sorted(f["partition"]["ts_day"] for f in files)
        assert days == [17000 + d for d in range(10)]
        assert (
            read_iceberg_table(spark, tdir).groupBy().count().collect()[0][0]
            == before
        )
        # pruning still works on the compacted layout
        lo = 17004 * MICROS_PER_DAY
        assert len(plan_scan(tdir, source_range=(lo, lo + 10))) == 1


class TestBucketPartitionedTable:
    def test_equality_predicate_opens_one_bucket(self, spark, tmp_path):
        tdir = str(tmp_path / "bucket-tbl")
        n_buckets = 4
        ids = list(range(200))
        by_bucket: dict[int, list[int]] = {}
        for i in ids:
            b = (bucket_hash_long(i) & 0x7FFFFFFF) % n_buckets
            by_bucket.setdefault(b, []).append(i)
        for b, members in by_bucket.items():
            d = os.path.join(tdir, f"id_bucket={b}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                pa.table({"id": pa.array(members, pa.int64())}),
                os.path.join(d, "part.parquet"),
            )
        schema = spark.createDataFrame([], "id long").schema
        commit_append(
            tdir, schema, partition_col="id_bucket", now_ms=1_000,
            partition_transform=f"bucket[{n_buckets}]",
            partition_source="id",
        )
        total = plan_scan(tdir)
        assert len(total) == len(by_bucket)
        for probe in (0, 34, 137):
            files = plan_scan(tdir, source_value=probe)
            b = (bucket_hash_long(probe) & 0x7FFFFFFF) % n_buckets
            assert [f["partition"]["id_bucket"] for f in files] == [b]
            # the read applies the residual itself: row-exact lookup
            got = read_iceberg_table(spark, tdir, source_value=probe).count()
            assert got == 1
        # a range predicate under bucket is a correct full scan
        assert len(plan_scan(tdir, source_range=(0, 10))) == len(total)


class TestRowDeletesOnTransformedTables:
    def test_dv_delete_and_equality_upsert_on_day_table(
        self, spark, tmp_path
    ):
        from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
            commit_deletion_vectors,
        )
        tdir = _write_day_table(tmp_path)
        schema = spark.createDataFrame([], "ts_us long, v long").schema
        commit_append(
            tdir, schema, partition_col="ts_day", now_ms=1_000,
            partition_transform="day", partition_source="ts_us",
        )
        # DV delete across the transformed table (positions are
        # metadata-derived; no partition-column dependency)
        commit_deletion_vectors(spark, tdir, "v % 5 = 2", now_ms=2_000)
        live = read_iceberg_table(spark, tdir)
        assert live.where("v % 5 = 2").count() == 0
        assert live.count() == 10 * 20 * 4 // 5
        # merge-on-read over the day table with its DV deletes applied,
        # the delete-manifest partition field DERIVED from the spec
        # (ts_day), and the pruned read still seeing the deletes:
        day = 17003 * MICROS_PER_DAY
        got = sorted(
            r["v"]
            for r in read_iceberg_table(
                spark, tdir, source_range=(day, day + MICROS_PER_DAY - 1)
            ).collect()
        )
        assert got == [v for v in range(20) if v % 5 != 2]
        # a source_value point lookup is row-exact (bucket semantics)
        assert [
            r["v"]
            for r in read_iceberg_table(
                spark, tdir, source_value=day
            ).collect()
        ] == [0]


class TestManifestSplitCompaction:
    def test_rewrite_manifests_splits_by_partition(self, spark, tmp_path):
        # 12 single-file commits over 12 days, compacted with a target
        # of 4 entries/manifest: the rewrite must emit 3 manifests with
        # TIGHT, disjoint partition summaries so a one-day window opens
        # exactly one of them
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_table_metadata,
            rewrite_manifests,
        )

        tdir = str(tmp_path / "split-tbl")
        schema = spark.createDataFrame([], "ts_us long, v long").schema
        for d in range(12):
            dd = os.path.join(tdir, f"ts_day={d}")
            os.makedirs(dd, exist_ok=True)
            path = os.path.join(dd, "f.parquet")
            pq.write_table(
                pa.table(
                    {
                        "ts_us": pa.array([d * MICROS_PER_DAY], pa.int64()),
                        "v": pa.array([d], pa.int64()),
                    }
                ),
                path,
            )
            commit_append(
                tdir, schema, partition_col="ts_day", now_ms=d + 1,
                files=[path], partition_transform="day",
                partition_source="ts_us",
            )
        rewrite_manifests(tdir, now_ms=100, target_entries=4)
        back = read_table_metadata(tdir)
        mlist = back["manifest_list"]
        assert len(mlist) == 3
        bounds = sorted(
            (
                int.from_bytes(mf["partitions"][0]["lower_bound"], "little"),
                int.from_bytes(mf["partitions"][0]["upper_bound"], "little"),
            )
            for mf in mlist
        )
        assert bounds == [(0, 3), (4, 7), (8, 11)]
        # a one-day window plans 1 file and the others' manifests prune
        files = plan_scan(
            tdir, source_range=(5 * MICROS_PER_DAY, 6 * MICROS_PER_DAY - 1)
        )
        assert len(files) == 1
        # the full read is unchanged by the re-layout
        assert read_iceberg_table(spark, tdir).count() == 12

    def test_right_sized_single_manifest_is_noop(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_table_metadata,
            rewrite_manifests,
        )

        tdir = _write_day_table(tmp_path)
        schema = spark.createDataFrame([], "ts_us long, v long").schema
        commit_append(
            tdir, schema, partition_col="ts_day", now_ms=1_000,
            partition_transform="day", partition_source="ts_us",
        )
        v1 = read_table_metadata(tdir)["metadata"]["current-snapshot-id"]
        rewrite_manifests(tdir, now_ms=2_000)  # 10 entries <= 2048: no-op
        assert (
            read_table_metadata(tdir)["metadata"]["current-snapshot-id"] == v1
        )
        # but an explicit smaller target DOES split it
        rewrite_manifests(tdir, now_ms=3_000, target_entries=5)
        assert len(read_table_metadata(tdir)["manifest_list"]) == 2


    def test_string_bucket_column(self, spark):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            bucket_hash_str,
        )

        df = spark.createDataFrame(
            [("iceberg",), ("spark",), (None,)], "s string"
        )
        out = {
            r["s"]: r["b"]
            for r in transform_column(df, "s", "bucket[16]", "b").collect()
        }
        assert out["iceberg"] == (bucket_hash_str("iceberg") & 0x7FFFFFFF) % 16
        assert out["spark"] == (bucket_hash_str("spark") & 0x7FFFFFFF) % 16
        assert out[None] is None
