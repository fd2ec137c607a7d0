"""Iceberg metadata tables (snapshots/history/refs/manifests/files/entries).

The Spark-Iceberg `SELECT * FROM tbl.<meta>` surface over the engine's
own metadata plane; verified against tables committed by
`sources/iceberg/` (appends, tags, rewrite_manifests, deletes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """Two appends + a tag on the first snapshot."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
        create_ref,
    )

    tdir = str(tmp_path_factory.mktemp("meta-tbl"))
    df1 = spark.range(0, 100).select(
        (F.col("id") % 4).cast("int").alias("partition"), F.col("id").alias("v")
    )
    df1.write.partitionBy("partition").parquet(tdir, mode="append")
    commit_append(tdir, df1.schema, now_ms=1_000)
    create_ref(tdir, "first", "tag")
    df2 = spark.range(100, 160).select(
        (F.col("id") % 4).cast("int").alias("partition"), F.col("id").alias("v")
    )
    df2.write.partitionBy("partition").parquet(tdir, mode="append")
    commit_append(tdir, df1.schema, now_ms=2_000)
    return tdir


class TestSnapshotsHistoryRefs:
    def test_snapshots_rows(self, spark, table):
        rows = {
            r["sequence_number"]: r
            for r in __import__(
                "tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables",
                fromlist=["snapshots_table"],
            ).snapshots_table(spark, table).collect()
        }
        assert set(rows) == {1, 2}
        assert rows[1]["parent_id"] is None
        assert rows[2]["parent_id"] == rows[1]["snapshot_id"]
        assert rows[1]["operation"] == rows[2]["operation"] == "append"
        assert rows[1]["summary"]["added-records"] == "100"
        assert rows[2]["summary"]["total-records"] == "160"

    def test_history_ancestry(self, spark, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            history_table,
        )

        hist = history_table(spark, table).orderBy("made_current_at_ms").collect()
        assert len(hist) == 2
        assert all(h["is_current_ancestor"] for h in hist)
        assert hist[0]["parent_id"] is None

    def test_refs(self, spark, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            refs_table,
            snapshots_table,
        )

        refs = {r["name"]: r for r in refs_table(spark, table).collect()}
        assert refs["first"]["type"] == "TAG"
        assert refs["main"]["type"] == "BRANCH"
        snaps = {
            r["sequence_number"]: r["snapshot_id"]
            for r in snapshots_table(spark, table).collect()
        }
        assert refs["first"]["snapshot_id"] == snaps[1]
        assert refs["main"]["snapshot_id"] == snaps[2]


class TestManifestsFilesEntries:
    def test_manifests_counts(self, spark, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            manifests_table,
        )

        mans = manifests_table(spark, table).collect()
        assert len(mans) == 2  # one manifest per append
        assert sorted(m["added_rows_count"] for m in mans) == [60, 100]
        assert all(m["content"] == 0 for m in mans)
        for m in mans:
            # identity-partition summary bounds decoded to ints
            s = m["partition_summaries"][0]
            assert s["lower_bound"] == 0 and s["upper_bound"] == 3

    def test_files_match_scan_plan(self, spark, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import plan_scan
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            files_table,
        )

        files = files_table(spark, table)
        planned = {d["file_path"] for d in plan_scan(table)}
        assert {r["file_path"] for r in files.collect()} == planned
        agg = files.groupBy("partition").agg(
            F.sum("record_count").alias("n")
        ).collect()
        assert {(r["partition"], r["n"]) for r in agg} == {
            (0, 40), (1, 40), (2, 40), (3, 40)
        }

    def test_entries_statuses_after_compaction(self, spark, table, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
            rewrite_manifests,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            entries_table,
            files_table,
        )

        tdir = str(tmp_path / "compact")
        for lo in (0, 50):
            df = spark.range(lo, lo + 50).select(
                (F.col("id") % 2).cast("int").alias("partition"),
                F.col("id").alias("v"),
            )
            df.write.partitionBy("partition").parquet(tdir, mode="append")
            commit_append(tdir, df.schema)
        rewrite_manifests(tdir)
        ent = entries_table(spark, tdir)
        # compaction rewrites entries as status=existing (0) in 1 manifest
        statuses = [r["status"] for r in ent.collect()]
        assert statuses and all(s == 0 for s in statuses)
        assert files_table(spark, tdir).count() == len(statuses)

    def test_entries_stats_maps_present(self, spark, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            entries_table,
        )

        row = entries_table(spark, table).first()
        assert row["record_count"] > 0
        assert row["value_counts"] and all(
            isinstance(k, int) for k in row["value_counts"]
        )
        assert row["lower_bounds"]  # packed little-endian single values

    def test_empty_table(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_append,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            entries_table,
            files_table,
            snapshots_table,
        )

        tdir = str(tmp_path / "empty")
        df = spark.range(0).select(
            F.col("id").cast("int").alias("partition"), F.col("id").alias("v")
        )
        commit_append(tdir, df.schema)
        assert files_table(spark, tdir).count() == 0
        assert entries_table(spark, tdir).count() == 0
        # a bare create writes table metadata but no snapshot (Iceberg
        # spec: current-snapshot-id = -1 until the first data commit)
        assert snapshots_table(spark, tdir).count() == 0


class TestTimeTravel:
    def test_files_at_historical_snapshot(self, spark, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            files_table,
            snapshots_table,
        )

        snaps = {
            r["sequence_number"]: r["snapshot_id"]
            for r in snapshots_table(spark, table).collect()
        }
        # at snapshot 1 only the first append's 100 rows exist
        old = files_table(spark, table, snapshot_id=snaps[1])
        assert old.agg(F.sum("record_count")).collect()[0][0] == 100
        cur = files_table(spark, table)
        assert cur.agg(F.sum("record_count")).collect()[0][0] == 160

    def test_unknown_snapshot_rejected(self, spark, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            manifests_table,
        )

        with pytest.raises(ValueError, match="unknown snapshot"):
            manifests_table(spark, table, snapshot_id=12345)


class TestPartitionsAndAllTables:
    def test_partitions_rollup(self, spark, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            partitions_table,
        )

        parts = {
            r["partition"]: r for r in partitions_table(spark, table).collect()
        }
        assert set(parts) == {0, 1, 2, 3}
        assert all(p["record_count"] == 40 for p in parts.values())
        # each commit adds >=1 file per partition dir (task count varies)
        assert all(p["file_count"] >= 2 for p in parts.values())
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            files_table,
        )

        assert sum(p["file_count"] for p in parts.values()) == files_table(
            spark, table
        ).count()
        assert all(
            p["total_data_file_size_in_bytes"] > 0 for p in parts.values()
        )

    def test_all_manifests_spans_snapshots(self, spark, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            all_manifests_table,
            snapshots_table,
        )

        allm = all_manifests_table(spark, table)
        snaps = snapshots_table(spark, table).count()
        # snapshot 1 has 1 manifest; snapshot 2 carries it + adds one
        assert snaps == 2
        assert allm.count() == 3
        assert allm.select("reference_snapshot_id").distinct().count() == 2

    def test_all_files_dedupes_carried_files(self, spark, table):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (
            all_files_table,
            files_table,
        )

        # every file of the current snapshot was added by some snapshot,
        # and carried files appear exactly once
        allf = all_files_table(spark, table)
        cur = files_table(spark, table)
        assert allf.count() == cur.count()
        assert allf.select("file_path").distinct().count() == allf.count()


def test_refs_table_retention_columns(spark, tmp_path):
    """r12: `tbl.refs` surfaces the per-ref retention fields under
    Spark-Iceberg's column names; unset fields read null."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        create_ref,
        write_iceberg_table,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (  # noqa: E501
        refs_table,
    )

    tdir = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10)], "id bigint, v bigint")
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    create_ref(tdir, "rel", kind="tag", max_ref_age_ms=9_000, now_ms=2_000)
    create_ref(
        tdir, "audit", kind="branch", min_snapshots_to_keep=3,
        max_snapshot_age_ms=5_000, now_ms=3_000,
    )
    refs = {r["name"]: r for r in refs_table(spark, tdir).collect()}
    assert refs["rel"]["max_reference_age_in_ms"] == 9_000
    assert refs["rel"]["min_snapshots_to_keep"] is None
    assert refs["audit"]["min_snapshots_to_keep"] == 3
    assert refs["audit"]["max_snapshot_age_in_ms"] == 5_000
    assert refs["audit"]["max_reference_age_in_ms"] is None


def test_compute_ndv_stats_blobs(spark, tmp_path):
    """r12: per-column NDV statistics (`compute_ndv_stats`) — KMV
    bottom-k sketches as Puffin blobs with the `ndv` property; exact
    below k, estimator at k, mergeable payload, existing file-list
    blob preserved, re-compute replaces stale NDV blobs only."""
    import json as _json

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        compute_ndv_stats,
        read_table_metadata,
        write_iceberg_table,
    )
    from tiered_storage_for_apache_kafka_spark.sources.puffin import (
        read_puffin_blobs,
    )

    tdir = str(tmp_path / "t")
    df = spark.range(5_000).selectExpr(
        "id", "cast(id % 7 as bigint) as grp"
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    meta = compute_ndv_stats(spark, tdir, ["id", "grp"], k=256, now_ms=2_000)
    snap = meta["current-snapshot-id"]
    entry = next(
        st for st in meta["statistics"] if st["snapshot-id"] == snap
    )
    blobs = read_puffin_blobs(entry["statistics-path"])
    by_col = {
        b["properties"]["column"]: b
        for b in blobs
        if b["type"] == "engine-kmv-ndv-v1"
    }
    # grp: 7 distinct < k -> exact
    assert by_col["grp"]["properties"]["ndv"] == "7"
    # id: 5000 distinct > k=256 -> estimator within 15% (KMV RSE ~6%)
    est = int(by_col["id"]["properties"]["ndv"])
    assert abs(est - 5_000) <= 750
    payload = _json.loads(by_col["id"]["payload"])
    assert len(payload["hashes"]) == 256
    assert payload["hashes"] == sorted(payload["hashes"])
    # the commit path's file-list blob survived the re-pack
    assert any(b["type"].endswith("file-list") for b in blobs)
    # recompute replaces NDV blobs, never duplicates them
    meta = compute_ndv_stats(spark, tdir, ["grp"], k=64, now_ms=3_000)
    entry = next(
        st for st in meta["statistics"] if st["snapshot-id"] == snap
    )
    blobs2 = read_puffin_blobs(entry["statistics-path"])
    ndv2 = [b for b in blobs2 if b["type"] == "engine-kmv-ndv-v1"]
    assert len(ndv2) == 1 and ndv2[0]["properties"]["column"] == "grp"
    assert any(b["type"].endswith("file-list") for b in blobs2)
    # deterministic: same inputs, same estimate
    m2 = compute_ndv_stats(spark, tdir, ["id"], k=256, now_ms=4_000)
    e2 = next(
        st for st in m2["statistics"] if st["snapshot-id"] == snap
    )
    b2 = {
        b["properties"]["column"]: b
        for b in read_puffin_blobs(e2["statistics-path"])
        if b["type"] == "engine-kmv-ndv-v1"
    }
    assert int(b2["id"]["properties"]["ndv"]) == est


def test_position_deletes_table(spark, tmp_path):
    """r12: `tbl.position_deletes` — every live retracted (file, pos)
    identity with delete-file provenance, uniform across parquet
    position-delete files AND v3 deletion vectors (bitmaps explode to
    the same shape)."""
    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (  # noqa: E501
        commit_deletion_vectors,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        write_iceberg_table,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.update import (
        update_where,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_meta_tables import (  # noqa: E501
        position_deletes_table,
    )

    tdir = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id", "id * 2 as v")
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    # empty before any delete
    assert position_deletes_table(spark, tdir).count() == 0
    update_where(spark, tdir, "id % 10 = 3", {"v": "0"}, now_ms=2_000)
    rows = position_deletes_table(spark, tdir).collect()
    assert len(rows) == 10
    assert all(r["delete_file_path"].endswith(".parquet") for r in rows)
    assert all(r["sequence_number"] == 2 for r in rows)
    # v3 DV deletes explode to the same shape, side by side
    commit_deletion_vectors(spark, tdir, "id % 10 = 7", now_ms=3_000)
    rows2 = position_deletes_table(spark, tdir).collect()
    assert len(rows2) == 20
    by_kind = {}
    for r in rows2:
        by_kind.setdefault(
            "dv" if r["delete_file_path"].endswith(".puffin") else "parquet",
            set(),
        ).add((r["file_path"], r["pos"]))
    assert len(by_kind["parquet"]) == 10 and len(by_kind["dv"]) == 10
    assert {(r["file_path"], r["pos"]) for r in rows} == by_kind["parquet"]


def test_compute_ndv_stats_single_pass_plan(spark, tmp_path):
    """r13: the NDV job reads the data ONCE whatever the column count
    (explode to (column, hash) pairs), and the bottom-k rank filter
    rides Spark's WindowGroupLimit pushdown so the shuffle never
    carries the whole distinct domain."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_iceberg_table,
        write_iceberg_table,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.maintenance import (
        _ndv_bottom_k_frame,
    )

    tdir = str(tmp_path / "t")
    df = spark.range(2_000).selectExpr(
        "id", "cast(id % 7 as bigint) as a", "cast(id % 13 as bigint) as b",
        "cast(id as string) as c",
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    frame = _ndv_bottom_k_frame(
        read_iceberg_table(spark, tdir), ["id", "a", "b", "c"], k=64
    )
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "WindowGroupLimit" in plan, plan
    # and it computes the same bottom-k the per-column jobs would
    rows = frame.collect()
    per_col = {}
    for r in rows:
        per_col.setdefault(r["column"], []).append(int(r["u"]))
    assert len(per_col["a"]) == 7 and len(per_col["id"]) == 64
