"""Per-ref retention (spec "Snapshot References", r12):
``max-ref-age-ms`` on tags/branches (the ref itself ages out and
releases its snapshot — without it a forgotten tag pins data forever),
``min-snapshots-to-keep`` / ``max-snapshot-age-ms`` on branches
(bounding how much branch ancestry `expire_snapshots` retains).
Refs without the fields keep the conservative pre-r12 defaults:
permanent, full ancestry.
"""

from __future__ import annotations

import tempfile

import pytest

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    create_ref,
    expire_snapshots,
    read_iceberg_table,
    read_table_metadata,
    rollback_to_snapshot,
    write_iceberg_table,
)

SPEC = [("id_bucket", "bucket[4]", "id")]


def _mkdir() -> str:
    return tempfile.mkdtemp(prefix="iceberg-ref-retention-")


def _write(spark, tdir, rows, ms):
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    return write_iceberg_table(
        spark, df, tdir, now_ms=ms, partition_spec=SPEC
    )


def _snap_ids(tdir):
    return {
        s["snapshot-id"]
        for s in read_table_metadata(tdir)["metadata"]["snapshots"]
    }


def test_aged_out_tag_releases_its_snapshot(spark):
    tdir = _mkdir()
    m1 = _write(spark, tdir, [(1, 10)], 1_000)
    pinned = m1["snapshots"][-1]["snapshot-id"]
    create_ref(
        tdir, "corpus-v1", kind="tag", snapshot_id=pinned,
        max_ref_age_ms=5_000, now_ms=1_500,
    )
    _write(spark, tdir, [(2, 20)], 2_000)
    # young tag: survives an aggressive expiry and pins its snapshot
    expire_snapshots(tdir, keep_last=1, now_ms=3_000)
    meta = read_table_metadata(tdir)["metadata"]
    assert "corpus-v1" in meta["refs"] and pinned in _snap_ids(tdir)
    # lapsed (age measured from the SNAPSHOT's commit timestamp):
    # the ref is removed and its snapshot becomes collectible
    expire_snapshots(tdir, keep_last=1, now_ms=10_000)
    meta = read_table_metadata(tdir)["metadata"]
    assert "corpus-v1" not in meta["refs"]
    assert pinned not in _snap_ids(tdir)
    assert {r["id"] for r in read_iceberg_table(spark, tdir).collect()} == {
        1, 2,
    }


def test_branch_min_snapshots_survive_aggressive_age_expiry(spark):
    tdir = _mkdir()
    heads = []
    for i in range(5):
        m = _write(spark, tdir, [(i, i * 10)], 1_000 * (i + 1))
        heads.append(m["snapshots"][-1]["snapshot-id"])
    create_ref(
        tdir, "audit", kind="branch", snapshot_id=heads[-1],
        min_snapshots_to_keep=3, max_snapshot_age_ms=1,
        now_ms=6_000,
    )
    # keep_last=1 on main + everything ancient by age: the branch's
    # min-snapshots floor keeps its 3 newest ancestors anyway
    expire_snapshots(tdir, keep_last=1, now_ms=100_000)
    ids = _snap_ids(tdir)
    assert set(heads[-3:]) <= ids
    assert heads[0] not in ids and heads[1] not in ids


def test_branch_max_snapshot_age_bounds_ancestry(spark):
    tdir = _mkdir()
    heads = []
    for i in range(5):
        m = _write(spark, tdir, [(i, i * 10)], 1_000 * (i + 1))
        heads.append(m["snapshots"][-1]["snapshot-id"])
    create_ref(
        tdir, "dev", kind="branch", snapshot_id=heads[-1],
        min_snapshots_to_keep=1, max_snapshot_age_ms=2_500,
        now_ms=6_000,
    )
    # now=6_000: ancestors younger than 3_500 (heads at 4_000, 5_000)
    # survive by age; 1_000..3_000 age out (min floor = head only)
    expire_snapshots(tdir, keep_last=1, now_ms=6_000)
    ids = _snap_ids(tdir)
    assert set(heads[-2:]) <= ids  # 4_000 head kept by age + head
    assert heads[0] not in ids and heads[1] not in ids
    # a ref WITHOUT the fields would have kept the full chain
    assert heads[2] not in ids


def test_ref_without_fields_keeps_pre_r12_defaults(spark):
    tdir = _mkdir()
    m1 = _write(spark, tdir, [(1, 10)], 1_000)
    pinned = m1["snapshots"][-1]["snapshot-id"]
    create_ref(tdir, "forever", kind="tag", snapshot_id=pinned, now_ms=1_500)
    _write(spark, tdir, [(2, 20)], 2_000)
    expire_snapshots(tdir, keep_last=1, now_ms=10**12)
    meta = read_table_metadata(tdir)["metadata"]
    assert "forever" in meta["refs"] and pinned in _snap_ids(tdir)


def test_tag_refuses_branch_retention_fields(spark):
    tdir = _mkdir()
    _write(spark, tdir, [(1, 10)], 1_000)
    with pytest.raises(ValueError, match="branch retention"):
        create_ref(tdir, "t", kind="tag", min_snapshots_to_keep=2)
    with pytest.raises(ValueError, match="branch retention"):
        create_ref(tdir, "t", kind="tag", max_snapshot_age_ms=1)


def test_aged_tag_releases_dead_fork(spark):
    """Fork-collection composition: a rollback's abandoned lineage
    pinned only by an aged tag is released once the tag lapses."""
    tdir = _mkdir()
    m1 = _write(spark, tdir, [(1, 10)], 1_000)
    snap1 = m1["snapshots"][-1]["snapshot-id"]
    m2 = _write(spark, tdir, [(2, 20)], 2_000)
    dead = m2["snapshots"][-1]["snapshot-id"]
    create_ref(
        tdir, "pre-rollback", kind="tag", snapshot_id=dead,
        max_ref_age_ms=4_000, now_ms=2_500,
    )
    rollback_to_snapshot(tdir, snap1, now_ms=3_000)
    _write(spark, tdir, [(3, 30)], 4_000)
    # tag still young: the dead fork survives the sweep
    expire_snapshots(tdir, keep_last=5, now_ms=5_000)
    assert dead in _snap_ids(tdir)
    # tag lapsed: fork released with it
    expire_snapshots(tdir, keep_last=5, now_ms=60_000)
    meta = read_table_metadata(tdir)["metadata"]
    assert "pre-rollback" not in meta["refs"]
    assert dead not in _snap_ids(tdir)
    assert {r["id"] for r in read_iceberg_table(spark, tdir).collect()} == {
        1, 3,
    }


def test_retention_fields_through_catalog(spark, tmp_path):
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    tdir = str(tmp_path / "t")
    with FakeRestCatalogServer() as server:
        cat = RestCatalogClient(server.base_url)
        df = spark.createDataFrame([(1, 10)], "id bigint, v bigint")
        m1 = write_iceberg_table(
            spark, df, tdir, now_ms=1_000, partition_spec=SPEC,
            catalog=cat, table_name="t",
        )
        pinned = m1["current-snapshot-id"]
        m = create_ref(
            tdir, "aged", kind="tag", snapshot_id=pinned,
            max_ref_age_ms=5_000, now_ms=2_000,
            catalog=cat, table_name="t",
        )
        assert m["refs"]["aged"]["max-ref-age-ms"] == 5_000
        write_iceberg_table(
            spark, spark.createDataFrame([(2, 20)], "id bigint, v bigint"),
            tdir, now_ms=3_000, partition_spec=SPEC,
            catalog=cat, table_name="t",
        )
        # lapsed through the catalog protocol too
        m2 = expire_snapshots(
            tdir, keep_last=1, now_ms=60_000, catalog=cat, table_name="t"
        )
        assert "aged" not in (m2.get("refs") or {})
        assert pinned not in {
            s["snapshot-id"] for s in m2["snapshots"]
        }


def test_expire_defaults_from_table_properties(spark):
    """r12: `expire_snapshots` with unset args resolves the table's
    declared `history.expire.*` properties (the Java action's
    resolution); explicit args win."""
    tdir = _mkdir()
    heads = []
    meta = None
    for i in range(4):
        meta = _write(spark, tdir, [(i, i * 10)], 1_000 * (i + 1))
        heads.append(meta["snapshots"][-1]["snapshot-id"])
    # declare the policy once, as table properties
    meta = write_iceberg_table(
        spark,
        spark.createDataFrame([(99, 990)], "id bigint, v bigint"),
        tdir, now_ms=5_000, partition_spec=SPEC,
        properties_extra={
            "history.expire.min-snapshots-to-keep": "2",
            "history.expire.max-snapshot-age-ms": "1500",
        },
    )
    heads.append(meta["snapshots"][-1]["snapshot-id"])
    expire_snapshots(tdir, now_ms=6_000)  # all args unset
    ids = _snap_ids(tdir)
    # age cutoff 6000-1500=4500 keeps only the 5000ms head by age;
    # min-snapshots floor keeps the last TWO along main's lineage
    assert set(heads[-2:]) <= ids
    assert heads[0] not in ids and heads[1] not in ids
    # explicit argument overrides the property
    expire_snapshots(tdir, keep_last=1, now_ms=10**12)
    assert _snap_ids(tdir) == {heads[-1]}
