"""rollback_to_snapshot (`sources/iceberg/refs.py`, r11): move main
back to a historical snapshot as one metadata-only commit; the next
write forks off the restored head and the abandoned lineage ages out
via expire_snapshots.
"""

from __future__ import annotations

import tempfile

import pytest

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    expire_snapshots,
    read_iceberg_table,
    read_iceberg_table_at,
    read_table_metadata,
    rollback_to_snapshot,
    update_where,
    write_iceberg_table,
)

SPEC = [("id_bucket", "bucket[4]", "id")]


def _mkdir() -> str:
    return tempfile.mkdtemp(prefix="iceberg-rollback-")


def _write(spark, tdir, rows, ms):
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    return write_iceberg_table(
        spark, df, tdir, now_ms=ms, partition_spec=SPEC
    )


def _vals(spark, tdir):
    return {r["id"]: r["v"] for r in read_iceberg_table(spark, tdir).collect()}


def test_rollback_restores_state_and_next_write_forks(spark):
    tdir = _mkdir()
    m1 = _write(spark, tdir, [(1, 10), (2, 20)], 1_000)
    snap1 = m1["snapshots"][-1]["snapshot-id"]
    _write(spark, tdir, [(3, 30)], 2_000)  # the "bad" commit
    update_where(spark, tdir, "id = 1", {"v": "999"}, now_ms=3_000)
    assert _vals(spark, tdir) == {1: 999, 2: 20, 3: 30}

    meta = rollback_to_snapshot(tdir, snap1, now_ms=4_000)
    assert meta["current-snapshot-id"] == snap1
    assert meta["snapshot-log"][-1]["snapshot-id"] == snap1
    assert _vals(spark, tdir) == {1: 10, 2: 20}
    # abandoned snapshots stay readable by id until expiry
    assert len(meta["snapshots"]) == 3

    # the next write chains off the RESTORED head, sequence still rises
    m4 = _write(spark, tdir, [(4, 40)], 5_000)
    head = m4["snapshots"][-1]
    assert head["parent-snapshot-id"] == snap1
    assert head["sequence-number"] > max(
        s["sequence-number"] for s in meta["snapshots"]
    ) - 1  # monotone vs every prior seq
    assert _vals(spark, tdir) == {1: 10, 2: 20, 4: 40}


def test_rollback_guards_and_set_current(spark):
    tdir = _mkdir()
    m1 = _write(spark, tdir, [(1, 10)], 1_000)
    snap1 = m1["snapshots"][-1]["snapshot-id"]
    m2 = _write(spark, tdir, [(2, 20)], 2_000)
    snap2 = m2["snapshots"][-1]["snapshot-id"]
    with pytest.raises(ValueError, match="not found"):
        rollback_to_snapshot(tdir, 999_999)
    rollback_to_snapshot(tdir, snap1, now_ms=3_000)
    # snap2 is now on the dead fork: plain rollback refuses, the
    # set_current_snapshot form jumps anyway
    with pytest.raises(ValueError, match="not an ancestor"):
        rollback_to_snapshot(tdir, snap2, now_ms=4_000)
    meta = rollback_to_snapshot(
        tdir, snap2, now_ms=4_000, allow_non_ancestor=True
    )
    assert meta["current-snapshot-id"] == snap2
    assert _vals(spark, tdir) == {1: 10, 2: 20}


def test_rollback_then_expire_sweeps_dead_fork(spark):
    tdir = _mkdir()
    m1 = _write(spark, tdir, [(1, 10)], 1_000)
    snap1 = m1["snapshots"][-1]["snapshot-id"]
    m2 = _write(spark, tdir, [(2, 20)], 2_000)
    dead = m2["snapshots"][-1]["snapshot-id"]
    rollback_to_snapshot(tdir, snap1, now_ms=3_000)
    _write(spark, tdir, [(3, 30)], 4_000)
    expire_snapshots(tdir, keep_last=5, now_ms=5_000)
    meta = read_table_metadata(tdir)["metadata"]
    ids = {s["snapshot-id"] for s in meta["snapshots"]}
    assert dead not in ids  # unreachable fork collected
    assert snap1 in ids
    assert _vals(spark, tdir) == {1: 10, 3: 30}
    # time travel along the LIVE lineage still works
    assert {
        r["id"] for r in read_iceberg_table_at(
            spark, tdir, snapshot_id=snap1
        ).collect()
    } == {1}


def test_rollback_catalog_mode(spark):
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    tdir = _mkdir()
    with FakeRestCatalogServer() as server:
        cat = RestCatalogClient(server.base_url)
        df = spark.createDataFrame([(1, 10)], "id bigint, v bigint")
        m1 = write_iceberg_table(
            spark, df, tdir, now_ms=1_000, partition_spec=SPEC,
            catalog=cat, table_name="t",
        )
        snap1 = m1["snapshots"][-1]["snapshot-id"]
        write_iceberg_table(
            spark, spark.createDataFrame([(2, 20)], "id bigint, v bigint"),
            tdir, now_ms=2_000, partition_spec=SPEC,
            catalog=cat, table_name="t",
        )
        meta = rollback_to_snapshot(
            tdir, snap1, now_ms=3_000, catalog=cat, table_name="t"
        )
        assert meta["current-snapshot-id"] == snap1
        got = {
            r["id"]
            for r in read_iceberg_table(
                spark, tdir, catalog=cat, table_name="t"
            ).collect()
        }
        assert got == {1}
