"""Composed maintenance soak: 100 micro-batch commits with every
maintenance plane interleaved, while a changelog consumer maintains a
per-partition aggregate throughout.

Each plane (DV deletes, v2 position deletes, rewrite_manifests,
rewrite_data_files, expire_snapshots, remove_orphan_files, the
incremental/changelog readers) is green in isolation; real Iceberg
deployments break where they COMPOSE. The soak's invariants:

- the consumer's maintained aggregate equals a head recompute AND the
  closed-form expectation after the full gauntlet;
- the consumer never errors (replace snapshots hopped via
  changelog_safe_windows; checkpoints stay ahead of expiry);
- the orphan sweep actually collects the expired rewrite originals;
- read cost stays flat: the head plan holds a BOUNDED file count (the
  compactions' whole point), not one file per historical commit.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


N_BATCHES = 100
ROWS_PER_BATCH = 40
#: alternating DV predicates: %7 matches freshly appended rows (new
#: files get their first DV), %11 matches still-live rows in OLD files
#: (their existing DVs get superseded/unioned) — so the soak exercises
#: both the first-DV and the supersede path repeatedly; the final sweep
#: applies both, giving the closed form live = v%7<>3 AND v%11<>5
PRED_A = "v % 7 = 3"
PRED_B = "v % 11 = 5"
#: second pos-delete predicate (r9): gives the b=60
#: rewrite_position_deletes leg real churn to merge (100-batch
#: gauntlet only — the other gauntlets keep the two-predicate form)
PRED_C = "v % 13 = 6"
FINAL_PRED = "v % 7 = 3 OR v % 11 = 5"
FINAL_PRED_ABC = "v % 7 = 3 OR v % 11 = 5 OR v % 13 = 6"


def _append_batch(tdir: str, schema, b: int, ms: int, catalog=None,
                  branch=None):
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        commit_append,
    )

    lo = b * ROWS_PER_BATCH
    files = []
    for p in (0, 1):
        vals = [v for v in range(lo, lo + ROWS_PER_BATCH) if v % 2 == p]
        d = os.path.join(tdir, f"partition={p}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"batch-{b:03d}.parquet")
        pq.write_table(pa.table({"v": pa.array(vals, pa.int64())}), path)
        files.append(path)
    return commit_append(
        tdir, schema, now_ms=ms, files=files, catalog=catalog, branch=branch
    )


def _head_id(tdir: str, catalog=None) -> int:
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        _current_state_meta,
        read_table_metadata,
    )

    if catalog is not None:
        _v, meta, _t = _current_state_meta(tdir, catalog, None)
        return meta["current-snapshot-id"]
    return read_table_metadata(tdir)["metadata"]["current-snapshot-id"]


def _consume(spark, tdir: str, ckpt: int, counts: dict, catalog=None) -> int:
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        changelog_safe_windows,
        read_iceberg_changelog,
    )

    head = _head_id(tdir, catalog)
    if head == ckpt:
        return ckpt
    log = None
    for lo, hi in changelog_safe_windows(tdir, ckpt, head, catalog=catalog):
        part = read_iceberg_changelog(
            spark, tdir, lo, hi, catalog=catalog
        ).select("partition", "_change_type")
        log = part if log is None else log.unionByName(part)
    if log is not None:
        for r in (
            log.groupBy("partition")
            .agg(
                F.sum(
                    F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
                ).alias("d")
            )
            .collect()
        ):
            counts[int(r["partition"])] = counts.get(
                int(r["partition"]), 0
            ) + int(r["d"])
    return head


#: global equality-delete key sets for the evolution gauntlet (r9):
#: K1 lands BEFORE update_partition_spec, K2 AFTER it but BEFORE the
#: b=20 data rewrite — so K2's unpartitioned-spec delete covers
#: OLD-GENERATION identity-layout files living under the new composite
#: default spec, the exact composition the r8 global-delete query never
#: crossed. Keys chosen outside the DV predicates (%7=3 / %11=5) and
#: distinct from the probe row (100), so every live row flips to
#: deleted exactly once in the changelog and the closed form stays
#: closed.
GLOBAL_K1 = [21, 63, 205]
GLOBAL_K2 = [102, 457, 650]

#: merge step (r10): keys DELETED by the b=26 MERGE batch (all pass
#: the %7/%11/%13 filters and avoid K1/K2/probe, so each was live) and
#: keys INSERTED by it (beyond every appended range, chosen to pass
#: the final DV predicates; partition = v % 2 like every other row)
MERGE_DEL = [30, 33, 404, 810]
MERGE_INS = [2001, 2002]


def _run_evolution_gauntlet(spark, tmp_path, catalog=None) -> None:
    """The composed schedule ACROSS a partition-spec evolution
    (r8; r9 adds global equality deletes straddling the boundary and
    the catalog mode; r10 adds OLD-GENERATION delete-plane compaction):
    40 batches where the table starts identity(partition), evolves to
    (partition, bucket[4](v)) at batch 12, keeps appending
    nested-layout batches, takes DV deletes touching BOTH generations
    (old-generation coverage records the new field null — the
    conservative-keep path live in composition), takes v2 parquet
    position deletes BEFORE the evolution (b=5/b=9, so old-generation
    cells accumulate churn) which ``rewrite_position_deletes`` at b=18
    compacts AFTER the evolution — old-spec-generation delete files
    merging within their own generation, the r10 capability — takes
    GLOBAL equality deletes before (b=10) and after (b=16) the
    evolution — the post-evolution one retracting rows in
    old-generation files under the new default spec — is data-rewritten
    (migrating generation 1 to the composite spec, materializing every
    delete layer), manifest-compacted per spec generation, expired and
    orphan-swept — while the changelog consumer maintains its aggregate
    through all of it. Post-migration, a bucket point lookup prunes the
    whole table."""
    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
        commit_deletion_vectors,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        bucket_hash_long,
        commit_append,
        commit_equality_deletes,
        commit_position_deletes,
        convert_equality_deletes,
        expire_snapshots,
        merge_upsert,
        plan_scan,
        read_iceberg_table,
        read_table_metadata,
        remove_orphan_files,
        rewrite_data_files,
        rewrite_manifests,
        rewrite_position_deletes,
        update_partition_spec,
    )

    n_batches, evolve_at = 40, 12
    tdir = str(tmp_path / "soak-evo")
    schema = spark.createDataFrame([], "partition int, v long").schema

    def bkt(v: int) -> int:
        return (bucket_hash_long(v) & 0x7FFFFFFF) % 4

    def append_composite(b: int, ms: int):
        lo = b * ROWS_PER_BATCH
        files = []
        groups: dict[tuple[int, int], list[int]] = {}
        for v in range(lo, lo + ROWS_PER_BATCH):
            groups.setdefault((v % 2, bkt(v)), []).append(v)
        for (p, kb), vals in sorted(groups.items()):
            d = os.path.join(tdir, f"partition={p}", f"v_bucket={kb}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"batch-{b:03d}.parquet")
            pq.write_table(
                pa.table({"v": pa.array(vals, pa.int64())}), path
            )
            files.append(path)
        return commit_append(
            tdir, schema, now_ms=ms, files=files, catalog=catalog
        )

    def global_delete(keys: list[int], ms: int) -> None:
        commit_equality_deletes(
            spark,
            tdir,
            spark.createDataFrame([(k,) for k in keys], "v long"),
            ["v"],
            now_ms=ms,
            global_scope=True,
            catalog=catalog,
        )

    counts: dict[int, int] = {}
    ms = 1_000
    meta = _append_batch(tdir, schema, 0, ms, catalog=catalog)
    ckpt = meta["current-snapshot-id"]
    counts[0] = ROWS_PER_BATCH // 2
    counts[1] = ROWS_PER_BATCH // 2
    swept = 0
    for b in range(1, n_batches):
        ms += 1_000
        if b < evolve_at:
            _append_batch(tdir, schema, b, ms, catalog=catalog)
        else:
            append_composite(b, ms)
        if b in (5, 9):
            # v2 parquet position deletes BEFORE the evolution: two
            # commits so each OLD-generation cell accumulates >1 delete
            # file for the post-evolution compaction to merge (r10)
            ms += 1_000
            commit_position_deletes(
                spark, tdir, PRED_C, now_ms=ms, catalog=catalog
            )
        if b == 10:
            # global delete BEFORE the spec evolution
            ms += 1_000
            global_delete(GLOBAL_K1, ms)
        if b == evolve_at:
            ms += 1_000
            update_partition_spec(
                tdir,
                [
                    ("partition", "identity", None),
                    ("v_bucket", "bucket[4]", "v"),
                ],
                now_ms=ms,
                catalog=catalog,
            )
        if b in (8, 16):
            # DV deletes BEFORE and AFTER evolution: the post-
            # evolution one covers generation-1 files with the new
            # field recorded null
            ms += 1_000
            commit_deletion_vectors(
                spark, tdir, PRED_A, now_ms=ms, catalog=catalog
            )
        if b == 16:
            # global delete AFTER the evolution but BEFORE the b=20
            # migration: its unpartitioned-spec delete file retracts
            # rows in OLD-generation identity-layout files (102, 457)
            # and a new-generation composite file (650) in one commit
            ms += 1_000
            global_delete(GLOBAL_K2, ms)
        if b == 18:
            # delete-plane compaction AFTER the evolution but BEFORE
            # the b=20 data rewrite: the only parquet pos-delete files
            # are OLD-spec-generation (written at b=5/9 under the
            # identity spec) — rpd must merge them within their own
            # generation, not carry them untouched (r10)
            ms += 1_000
            rewrite_position_deletes(
                spark, tdir, now_ms=ms, catalog=catalog
            )
            if catalog is None:
                back = read_table_metadata(tdir)
                per_cell: dict[str, int] = {}
                sids = set()
                for m in back["manifests"]:
                    for e in m["entries"]:
                        d = e["data_file"]
                        if (
                            e["status"] != 2
                            and d.get("content") == 1
                            and not d.get("referenced_data_file")
                            and str(d["file_path"]).endswith(".parquet")
                        ):
                            cell = json.dumps(d["partition"], sort_keys=True)
                            per_cell[cell] = per_cell.get(cell, 0) + 1
                            sids.add(int(m["file"]["partition_spec_id"]))
                assert per_cell and max(per_cell.values()) == 1, per_cell
                assert sids == {0}, sids  # the old generation compacted
        if b == 24:
            ms += 1_000
            commit_deletion_vectors(
                spark, tdir, PRED_B, now_ms=ms, catalog=catalog
            )
        if b == 26:
            # MERGE batch on the EVOLVED composite table (r10): the
            # key (v) does not cover the spec source `partition`, so
            # the retraction plane goes GLOBAL — deletes + inserts in
            # one atomic row-delta snapshot, consumed by the changelog
            # aggregate like any other commit
            ms += 1_000
            batch = spark.createDataFrame(
                [(None, k, "d") for k in MERGE_DEL]
                + [(k % 2, k, "i") for k in MERGE_INS],
                "partition int, v long, op string",
            )
            merge_upsert(
                spark, batch, tdir, on=["v"], op_col="op",
                partition_spec=[
                    ("partition", "identity", None),
                    ("v_bucket", "bucket[4]", "v"),
                ],
                now_ms=ms, catalog=catalog,
            )
        if b == 35:
            # eq->pos conversion AFTER the merge (r10): retires the
            # gauntlet's surviving equality plane (the merge's global
            # retraction; K1/K2 were materialized by the b=20 rewrite)
            # into per-cell position deletes — view unchanged, so the
            # b=39 changelog consumption sees a zero-delta window
            ms += 1_000
            convert_equality_deletes(spark, tdir, now_ms=ms, catalog=catalog)
            if catalog is None:
                back = read_table_metadata(tdir)
                live_eq = [
                    e
                    for m in back["manifests"]
                    for e in m["entries"]
                    if e["status"] != 2
                    and e["data_file"].get("content") == 2
                ]
                assert not live_eq, "conversion left live eq files"
        if b % 9 == 8:
            ms += 1_000
            rewrite_manifests(tdir, now_ms=ms, catalog=catalog)
        if b == 20:
            # migrates generation 1 to the composite default spec and
            # materializes every delete layer (DVs + both global sets)
            # — SORTED (r10): the compaction registers a sort order on
            # the evolved table and re-sorts old-generation rows under
            # the new spec in the same pass
            ms += 1_000
            rewrite_data_files(
                spark, tdir, now_ms=ms, sort_by=["v"], catalog=catalog
            )
        if b % 10 == 9:
            ckpt = _consume(spark, tdir, ckpt, counts, catalog=catalog)
        if b == 30:
            ckpt = _consume(spark, tdir, ckpt, counts, catalog=catalog)
            ms += 1_000
            expire_snapshots(tdir, keep_last=2, now_ms=ms, catalog=catalog)
            if remove_orphan_files(
                tdir, older_than_timestamp_ms=10**14, catalog=catalog
            ):
                swept += 1
    ms += 1_000
    commit_deletion_vectors(
        spark, tdir, FINAL_PRED_ABC, now_ms=ms, catalog=catalog
    )
    ckpt = _consume(spark, tdir, ckpt, counts, catalog=catalog)

    total = n_batches * ROWS_PER_BATCH
    gone = set(GLOBAL_K1) | set(GLOBAL_K2) | set(MERGE_DEL)
    expected = {
        p: sum(
            1
            for v in range(total)
            if v % 2 == p
            and v % 7 != 3
            and v % 11 != 5
            and v % 13 != 6
            and v not in gone
        )
        # the merge's inserts (chosen to pass every later predicate)
        + sum(1 for v in MERGE_INS if v % 2 == p)
        for p in (0, 1)
    }
    head = {
        int(r["partition"]): int(r["n"])
        for r in read_iceberg_table(spark, tdir, catalog=catalog)
        .groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert head == expected, "head recompute diverged from closed form"
    assert counts == expected, (
        "changelog aggregate diverged across the evolution"
    )
    assert swept >= 1
    # post-migration the whole table carries the composite tuple:
    # a bucket point lookup prunes EVERY file to one bucket, and
    # the row is found
    probe = 100  # lives in gen1 originally; migrated at b=20
    assert (
        probe % 7 != 3
        and probe % 11 != 5
        and probe % 13 != 6
        and probe not in gone
    )
    files = plan_scan(
        tdir, source_predicates={"v": probe}, catalog=catalog
    )
    assert files
    assert {f["partition"].get("v_bucket") for f in files} == {bkt(probe)}
    got = (
        read_iceberg_table(
            spark, tdir, source_predicates={"v": probe}, catalog=catalog
        )
        .collect()
    )
    assert [r["v"] for r in got] == [probe]


class TestMaintenanceSoak:
    def test_hundred_batch_gauntlet(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
            commit_deletion_vectors,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            commit_position_deletes,
            expire_snapshots,
            plan_scan,
            read_iceberg_table,
            remove_orphan_files,
            rewrite_data_files,
            rewrite_manifests,
            rewrite_position_deletes,
        )

        tdir = str(tmp_path / "soak-tbl")
        schema = spark.createDataFrame([], "partition int, v long").schema
        counts: dict[int, int] = {0: 0, 1: 0}
        orphan_sweeps_nonempty = 0

        ms = 1_000
        meta = _append_batch(tdir, schema, 0, ms)
        ckpt = meta["current-snapshot-id"]
        counts[0] = ROWS_PER_BATCH // 2  # batch 0 consumed as the base
        counts[1] = ROWS_PER_BATCH // 2

        staged_pick = None
        for b in range(1, N_BATCHES):
            ms += 1_000
            if b == 70:
                # r12: batch 70 STAGES on a WAP branch instead of
                # landing on main; main keeps moving (divergence), and
                # cherry_pick_snapshot publishes it two batches later —
                # the closed form is row-identical, the changelog
                # consumer sees it as a normal append at the pick seq
                m70 = _append_batch(tdir, schema, b, ms, branch="wap")
                staged_pick = m70["refs"]["wap"]["snapshot-id"]
                continue
            _append_batch(tdir, schema, b, ms)
            if b == 72:
                from tiered_storage_for_apache_kafka_spark.sources.iceberg import (  # noqa: E501
                    cherry_pick_snapshot,
                    drop_ref,
                )

                ms += 1_000
                cherry_pick_snapshot(tdir, staged_pick, now_ms=ms)
                ms += 1_000
                drop_ref(tdir, "wap", now_ms=ms)
            if b == 15:
                # one v2 parquet position-delete commit: the soak mixes
                # both row-delta representations in one table
                ms += 1_000
                commit_position_deletes(spark, tdir, PRED_A, now_ms=ms)
            if b == 45:
                # a second pos-delete commit so the b=60 delete-plane
                # compaction has churn to merge (r9)
                ms += 1_000
                commit_position_deletes(spark, tdir, PRED_C, now_ms=ms)
            if b == 60:
                # delete-plane compaction composed into the gauntlet:
                # merge each cell's pos-delete files, tombstone the
                # originals — the changelog consumer must stay exact
                # across it (r9)
                ms += 1_000
                rewrite_position_deletes(spark, tdir, now_ms=ms)
            if b % 15 == 6:
                ms += 1_000
                pred = PRED_A if (b // 15) % 2 == 0 else PRED_B
                commit_deletion_vectors(spark, tdir, pred, now_ms=ms)
            if b % 12 == 11:
                ms += 1_000
                rewrite_manifests(tdir, now_ms=ms)
            if b in (40, 80):
                ms += 1_000
                rewrite_data_files(spark, tdir, now_ms=ms)
            if b % 25 == 24:
                ckpt = _consume(spark, tdir, ckpt, counts)
            if b in (50, 90):
                # consumer checkpoints ahead of expiry, then the expired
                # rewrite originals become orphans and are swept
                ckpt = _consume(spark, tdir, ckpt, counts)
                ms += 1_000
                expire_snapshots(tdir, keep_last=2, now_ms=ms)
                removed = remove_orphan_files(
                    tdir, older_than_timestamp_ms=10**14
                )
                if removed:
                    orphan_sweeps_nonempty += 1
        ms += 1_000
        commit_deletion_vectors(spark, tdir, FINAL_PRED_ABC, now_ms=ms)
        ckpt = _consume(spark, tdir, ckpt, counts)

        total = N_BATCHES * ROWS_PER_BATCH
        expected = {
            p: sum(
                1
                for v in range(total)
                if v % 2 == p
                and v % 7 != 3
                and v % 11 != 5
                and v % 13 != 6
            )
            for p in (0, 1)
        }
        head = {
            int(r["partition"]): int(r["n"])
            for r in read_iceberg_table(spark, tdir)
            .groupBy("partition")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert head == expected, "head recompute diverged from closed form"
        assert counts == expected, (
            "changelog-maintained aggregate diverged from the head"
        )
        assert orphan_sweeps_nonempty >= 1, (
            "expired rewrite originals were never collected"
        )
        # read cost stays flat: without the two rewrites the head plan
        # would hold one file per (batch, partition) = 200; with them it
        # holds the compacted files plus only the post-rewrite batches
        n_head_files = len(plan_scan(tdir))
        assert n_head_files <= 60, n_head_files

    def test_gauntlet_with_spec_evolution(self, spark, tmp_path):
        _run_evolution_gauntlet(spark, tmp_path)

    def test_consumer_refuses_expired_checkpoint(self, spark, tmp_path):
        # the contract the soak consumer honors: a checkpoint that falls
        # behind expire_snapshots is an explicit re-bootstrap error, not
        # a silent gap
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            changelog_safe_windows,
            expire_snapshots,
        )

        tdir = str(tmp_path / "expired-ckpt")
        schema = spark.createDataFrame([], "partition int, v long").schema
        ms = 1_000
        meta = _append_batch(tdir, schema, 0, ms)
        stale = meta["current-snapshot-id"]
        for b in range(1, 5):
            ms += 1_000
            _append_batch(tdir, schema, b, ms)
        expire_snapshots(tdir, keep_last=2, now_ms=ms + 1_000)
        with pytest.raises(ValueError, match="re-bootstrap"):
            changelog_safe_windows(tdir, stale)


class TestChangelogPureAppendFastPath:
    def test_pure_append_window_never_scans_pre_window_rows(
        self, spark, tmp_path, monkeypatch
    ):
        # a window with no in-window delete files and an intact
        # from-snapshot file set must plan the delete side EMPTY by
        # metadata — the pre-window diff (_read_snapshot of `from`)
        # must never run
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            incremental as inc,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_iceberg_changelog,
        )

        tdir = str(tmp_path / "pure-append")
        schema = spark.createDataFrame([], "partition int, v long").schema
        m = _append_batch(tdir, schema, 0, 1_000)
        s0 = m["current-snapshot-id"]
        _append_batch(tdir, schema, 1, 2_000)
        _append_batch(tdir, schema, 2, 3_000)

        def boom(*a, **kw):
            raise AssertionError("pure-append window paid the full diff")

        monkeypatch.setattr(inc, "_read_snapshot", boom)
        log = read_iceberg_changelog(spark, tdir, s0)
        rows = log.groupBy("_change_type").count().collect()
        assert {r["_change_type"]: r["count"] for r in rows} == {
            "insert": 2 * ROWS_PER_BATCH
        }

    def test_fast_path_not_taken_when_window_has_deletes(
        self, spark, tmp_path
    ):
        from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
            commit_deletion_vectors,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            read_iceberg_changelog,
        )

        tdir = str(tmp_path / "with-deletes")
        schema = spark.createDataFrame([], "partition int, v long").schema
        m = _append_batch(tdir, schema, 0, 1_000)
        s0 = m["current-snapshot-id"]
        _append_batch(tdir, schema, 1, 2_000)
        commit_deletion_vectors(spark, tdir, "v % 10 = 0", now_ms=3_000)
        log = read_iceberg_changelog(spark, tdir, s0)
        got = {
            r["_change_type"]: r["count"]
            for r in log.groupBy("_change_type").count().collect()
        }
        # batch-1 inserts arrive net of the in-window delete; batch-0
        # rows deleted in-window surface as deletes
        n_b1_deleted = sum(
            1 for v in range(ROWS_PER_BATCH, 2 * ROWS_PER_BATCH) if v % 10 == 0
        )
        n_b0_deleted = sum(1 for v in range(ROWS_PER_BATCH) if v % 10 == 0)
        assert got == {
            "insert": ROWS_PER_BATCH - n_b1_deleted,
            "delete": n_b0_deleted,
        }


class TestMaintenanceSoakViaRestCatalog:
    """The composed gauntlet routed THROUGH the REST-catalog commit
    protocol: every plane's commit (appends, DV deletes, both rewrites,
    expiry) moves the pointer via CommitTableRequest with optimistic
    concurrency, and the changelog consumer reads the catalog's head —
    the composition a real deployment runs, not just the per-plane
    catalog tests."""

    def test_thirty_batch_gauntlet_catalog_mode(self, spark, tmp_path):
        from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
            commit_deletion_vectors,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            expire_snapshots,
            plan_scan,
            read_iceberg_table,
            remove_orphan_files,
            rewrite_data_files,
            rewrite_manifests,
        )
        from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
            FakeRestCatalogServer,
            RestCatalogClient,
        )

        n_batches = 30
        tdir = str(tmp_path / "rest-soak")
        schema = spark.createDataFrame([], "partition int, v long").schema
        with FakeRestCatalogServer() as srv:
            cat = RestCatalogClient(srv.base_url)
            counts: dict[int, int] = {
                0: ROWS_PER_BATCH // 2,
                1: ROWS_PER_BATCH // 2,
            }
            ms = 1_000
            meta = _append_batch(tdir, schema, 0, ms, catalog=cat)
            ckpt = meta["current-snapshot-id"]
            swept = 0
            for b in range(1, n_batches):
                ms += 1_000
                _append_batch(tdir, schema, b, ms, catalog=cat)
                if b % 10 == 6:
                    ms += 1_000
                    pred = PRED_A if (b // 10) % 2 == 0 else PRED_B
                    commit_deletion_vectors(
                        spark, tdir, pred, now_ms=ms, catalog=cat
                    )
                if b % 12 == 11:
                    ms += 1_000
                    rewrite_manifests(tdir, now_ms=ms, catalog=cat)
                if b == 15:
                    ms += 1_000
                    rewrite_data_files(spark, tdir, now_ms=ms, catalog=cat)
                if b % 10 == 9:
                    ckpt = _consume(spark, tdir, ckpt, counts, catalog=cat)
                if b == 20:
                    ckpt = _consume(spark, tdir, ckpt, counts, catalog=cat)
                    ms += 1_000
                    expire_snapshots(
                        tdir, keep_last=2, now_ms=ms, catalog=cat
                    )
                    if remove_orphan_files(
                        tdir, older_than_timestamp_ms=10**14, catalog=cat
                    ):
                        swept += 1
            ms += 1_000
            commit_deletion_vectors(
                spark, tdir, FINAL_PRED, now_ms=ms, catalog=cat
            )
            ckpt = _consume(spark, tdir, ckpt, counts, catalog=cat)

            total = n_batches * ROWS_PER_BATCH
            expected = {
                p: sum(
                    1
                    for v in range(total)
                    if v % 2 == p and v % 7 != 3 and v % 11 != 5
                )
                for p in (0, 1)
            }
            head = {
                int(r["partition"]): int(r["n"])
                for r in read_iceberg_table(spark, tdir, catalog=cat)
                .groupBy("partition")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            assert head == expected
            assert counts == expected
            assert swept == 1
            assert len(plan_scan(tdir, catalog=cat)) <= 40

    def test_evolution_gauntlet_catalog_mode(self, spark, tmp_path):
        """The full evolution gauntlet — global deletes straddling
        update_partition_spec included — with every commit routed
        through the REST-catalog protocol."""
        from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
            FakeRestCatalogServer,
            RestCatalogClient,
        )

        with FakeRestCatalogServer() as srv:
            cat = RestCatalogClient(srv.base_url)
            _run_evolution_gauntlet(spark, tmp_path, catalog=cat)
