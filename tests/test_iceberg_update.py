"""Row-level UPDATE (`sources/iceberg/update.py::update_where`): one
atomic overwrite snapshot carrying position deletes for the matched
identities plus data files with the updated copies — the UPDATE leg of
the mutation triad (DELETE = commit_position_deletes, MERGE =
merge_upsert).
"""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    commit_position_deletes,
    merge_upsert,
    read_iceberg_table,
    read_iceberg_table_at,
    read_table_metadata,
    rewrite_data_files,
    update_where,
    write_iceberg_table,
)

BUCKET_SPEC = [("id_bucket", "bucket[4]", "id")]


def _mkdir() -> str:
    return tempfile.mkdtemp(prefix="iceberg-update-")


def _table(spark, tdir, n=20, spec=BUCKET_SPEC):
    df = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(n)],
        "id bigint, grp bigint, v bigint",
    )
    return write_iceberg_table(
        spark, df, tdir, now_ms=1_000, partition_spec=spec
    )


def _state(spark, tdir):
    return {
        r["id"]: (r["grp"], r["v"])
        for r in read_iceberg_table(spark, tdir).collect()
    }


def test_update_basic_and_snapshot_shape(spark):
    tdir = _mkdir()
    _table(spark, tdir)
    meta = update_where(
        spark, tdir, "id % 4 = 1", {"v": "v + 1000"}, now_ms=2_000
    )
    got = _state(spark, tdir)
    exp = {
        i: (i % 3, i * 10 + (1000 if i % 4 == 1 else 0)) for i in range(20)
    }
    assert got == exp
    assert len(meta["snapshots"]) == 2  # ONE snapshot did delete+append
    summ = meta["snapshots"][-1]["summary"]
    assert summ["operation"] == "overwrite"
    assert int(summ["added-records"]) == 5
    assert int(summ["added-position-deletes"]) == 5
    back = read_table_metadata(tdir)
    seq = meta["snapshots"][-1]["sequence-number"]
    contents = {
        m["file"]["content"]
        for m in back["manifests"]
        if m["file"]["sequence_number"] == seq
    }
    assert contents == {0, 1}  # data + position-delete manifests


def test_update_expression_references_row_columns(spark):
    tdir = _mkdir()
    _table(spark, tdir, n=6)
    update_where(
        spark, tdir, "id >= 3", {"v": "v + id", "grp": "grp + 10"},
        now_ms=2_000,
    )
    got = _state(spark, tdir)
    for i in range(6):
        if i >= 3:
            assert got[i] == (i % 3 + 10, i * 10 + i)
        else:
            assert got[i] == (i % 3, i * 10)


def test_update_moves_rows_across_partition_cells(spark):
    tdir = _mkdir()
    spec = [("grp", "identity", None)]
    _table(spark, tdir, n=12, spec=spec)
    update_where(spark, tdir, "id = 4", {"grp": "CAST(7 AS BIGINT)"}, now_ms=2_000)
    got = _state(spark, tdir)
    assert got[4] == (7, 40)
    assert len(got) == 12  # old identity gone, exactly one copy
    # the moved row is served from its NEW hive cell
    cell = read_iceberg_table(spark, tdir, source_predicates={"grp": 7})
    assert [r["id"] for r in cell.collect()] == [4]


def test_update_zero_matches_no_snapshot(spark):
    tdir = _mkdir()
    m0 = _table(spark, tdir)
    m1 = update_where(spark, tdir, "id = 999", {"v": "0"}, now_ms=2_000)
    assert len(m1["snapshots"]) == len(m0["snapshots"])


def test_update_rejects_unknown_column_and_empty_set(spark):
    tdir = _mkdir()
    _table(spark, tdir)
    with pytest.raises(ValueError, match="never evolves"):
        update_where(spark, tdir, "id = 1", {"ghost": "1"})
    with pytest.raises(ValueError, match="at least one SET"):
        update_where(spark, tdir, "id = 1", {})


def test_update_matches_merged_view_only(spark):
    # rows already retracted (eq-delete via merge, then a positional
    # DELETE) can neither match nor resurrect
    tdir = _mkdir()
    _table(spark, tdir, n=10)
    merge_upsert(
        spark,
        spark.createDataFrame([(3, None, None, "d", 1)],
                              "id bigint, grp bigint, v bigint, op string, seq bigint"),
        tdir, on=["id"], op_col="op", seq_col="seq",
        partition_spec=BUCKET_SPEC, now_ms=2_000,
    )
    commit_position_deletes(spark, tdir, "id = 5", now_ms=3_000)
    meta = update_where(
        spark, tdir, "id IN (3, 5, 7)", {"v": "v + 1"}, now_ms=4_000
    )
    got = _state(spark, tdir)
    assert 3 not in got and 5 not in got
    assert got[7] == (1, 71)
    assert int(meta["snapshots"][-1]["summary"]["added-records"]) == 1


def test_update_time_travel_and_chained_updates(spark):
    tdir = _mkdir()
    m0 = _table(spark, tdir, n=6)
    snap0 = m0["snapshots"][-1]["snapshot-id"]
    update_where(spark, tdir, "id = 2", {"v": "100"}, now_ms=2_000)
    # the UPDATED row is itself matchable by a later update (the new
    # data file's sequence number is above the first delete's)
    update_where(spark, tdir, "v = 100", {"v": "200"}, now_ms=3_000)
    assert _state(spark, tdir)[2] == (2, 200)
    old = read_iceberg_table_at(spark, tdir, snapshot_id=snap0)
    assert {r["v"] for r in old.where("id = 2").collect()} == {20}


def test_update_then_compaction_materializes(spark):
    tdir = _mkdir()
    _table(spark, tdir, n=15)
    update_where(spark, tdir, "id % 2 = 0", {"v": "v * 2"}, now_ms=2_000)
    before = _state(spark, tdir)
    rewrite_data_files(spark, tdir, now_ms=3_000)
    assert _state(spark, tdir) == before
    # compaction retired the delete plane
    back = read_table_metadata(tdir)
    live_dels = [
        e
        for m in back["manifests"]
        for e in m["entries"]
        if e["status"] != 2 and e["data_file"].get("content") == 1
    ]
    assert live_dels == []


def test_update_catalog_mode_race_replans(spark):
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    tdir = _mkdir()
    with FakeRestCatalogServer() as server:
        cat = RestCatalogClient(server.base_url)
        df = spark.createDataFrame(
            [(i, i % 3, i * 10) for i in range(10)],
            "id bigint, grp bigint, v bigint",
        )
        write_iceberg_table(
            spark, df, tdir, now_ms=1_000, partition_spec=BUCKET_SPEC,
            catalog=cat, table_name="t",
        )
        fired = {"done": False}
        orig = cat.commit_table

        def racing(table, requirements, updates, now_ms):
            if not fired["done"]:
                fired["done"] = True
                rival = spark.createDataFrame(
                    [(500, 0, 5000)], "id bigint, grp bigint, v bigint"
                )
                write_iceberg_table(
                    spark, rival, tdir, now_ms=1_500,
                    partition_spec=BUCKET_SPEC, catalog=cat, table_name="t",
                )
            return orig(table, requirements, updates, now_ms)

        cat.commit_table = racing
        update_where(
            spark, tdir, "id < 3", {"v": "v + 7"}, now_ms=2_000,
            catalog=cat, table_name="t",
        )
        cat.commit_table = orig
        got = {
            r["id"]: r["v"]
            for r in read_iceberg_table(
                spark, tdir, catalog=cat, table_name="t"
            ).collect()
        }
        assert got[0] == 7 and got[1] == 17 and got[2] == 27
        assert got[500] == 5000  # the rival's row survived
        assert len(got) == 11


def test_update_unpartitioned_table(spark):
    tdir = _mkdir()
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "id bigint, v bigint"
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    update_where(spark, tdir, "id >= 6", {"v": "0"}, now_ms=2_000)
    got = {r["id"]: r["v"] for r in read_iceberg_table(spark, tdir).collect()}
    assert got[6] == 0 and got[7] == 0 and got[5] == 50


def test_update_composes_with_merge_and_maintenance(spark):
    """Cross-plane soak (small): MERGE retracts/updates/inserts, then
    UPDATE rewrites a slice, then the whole maintenance stack runs —
    conversion, delete-plane compaction, sorted data compaction,
    expiration, orphan sweep — and the head equals the closed form
    with a BOUNDED live plan."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        convert_equality_deletes,
        expire_snapshots,
        plan_scan,
        remove_orphan_files,
        rewrite_position_deletes,
    )

    tdir = _mkdir()
    n = 60
    _table(spark, tdir, n=n)
    state = {i: (i % 3, i * 10) for i in range(n)}

    # merge: delete id%5==1, update id%7==0 -> v=id*11, insert 1000/1001
    rows = (
        [(i, None, None, "d", 1) for i in range(n) if i % 5 == 1]
        + [(i, i % 3, i * 11, "u", 1)
           for i in range(n) if i % 5 != 1 and i % 7 == 0]
        + [(1000, 0, 1, "i", 1), (1001, 1, 2, "i", 1)]
    )
    merge_upsert(
        spark,
        spark.createDataFrame(
            rows, "id bigint, grp bigint, v bigint, op string, seq bigint"
        ),
        tdir, on=["id"], op_col="op", seq_col="seq",
        partition_spec=BUCKET_SPEC, now_ms=2_000,
    )
    for i in range(n):
        if i % 5 == 1:
            state.pop(i)
        elif i % 7 == 0:
            state[i] = (i % 3, i * 11)
    state[1000], state[1001] = (0, 1), (1, 2)

    # update: v += 5 where id%4==2 (on the merged view)
    update_where(spark, tdir, "id % 4 = 2", {"v": "v + 5"}, now_ms=3_000)
    state = {
        i: (g, v + 5 if i % 4 == 2 else v) for i, (g, v) in state.items()
    }
    assert _state(spark, tdir) == state

    convert_equality_deletes(spark, tdir, now_ms=4_000)
    rewrite_position_deletes(spark, tdir, now_ms=5_000)
    assert _state(spark, tdir) == state
    rewrite_data_files(spark, tdir, now_ms=6_000, sort_by=["id"])
    expire_snapshots(tdir, keep_last=2, now_ms=7_000)
    remove_orphan_files(tdir, older_than_timestamp_ms=10**14)
    assert _state(spark, tdir) == state
    # compaction bounded the live plan: at most one file per bucket cell
    assert len(plan_scan(tdir)) <= 4


def test_update_surfaces_in_batch_changelog(spark):
    # read_iceberg_changelog represents an UPDATE as delete(old
    # identity) + insert(new row) — same shape the merge plane proved
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_iceberg_changelog,
    )

    tdir = _mkdir()
    m0 = _table(spark, tdir, n=8)
    snap0 = m0["snapshots"][-1]["snapshot-id"]
    m1 = update_where(spark, tdir, "id = 3", {"v": "999"}, now_ms=2_000)
    ch = read_iceberg_changelog(
        spark, tdir, from_snapshot_id=snap0,
        to_snapshot_id=m1["snapshots"][-1]["snapshot-id"],
    )
    rows = {(r["id"], r["_change_type"], r["v"]) for r in ch.collect()}
    assert rows == {(3, "delete", 30), (3, "insert", 999)}


def test_update_window_refuses_keyed_stream_with_actionable_error(spark):
    # positional deletes are not key-representable: a keyed-changelog
    # consumer crossing an UPDATE window must get the documented
    # refusal pointing at read_iceberg_changelog / re-bootstrap
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
        IcebergCdcStreamReader,
    )

    tdir = _mkdir()
    _table(spark, tdir, n=8)
    update_where(spark, tdir, "id = 2", {"v": "0"}, now_ms=2_000)
    reader = IcebergCdcStreamReader({"path": tdir})
    with pytest.raises(ValueError, match="read_iceberg_changelog"):
        reader.partitions({"seq": 1}, {"seq": 2})


def test_update_refuses_nulling_required_column(spark):
    tdir = _mkdir()
    base = spark.range(6).selectExpr(  # id, v non-null -> REQUIRED
        "id", "cast(id % 3 as bigint) as grp", "id * 10 as v"
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=BUCKET_SPEC)
    with pytest.raises(ValueError, match="REQUIRED"):
        update_where(spark, tdir, "id = 1", {"v": "NULL"})
    # a non-castable expression: under ANSI (Spark 4 default) the cast
    # itself throws; under legacy non-ANSI sessions it would land as
    # null and the REQUIRED guard above catches it — either way the
    # write is refused before any file is staged
    with pytest.raises(Exception, match="CAST_INVALID|REQUIRED"):
        update_where(spark, tdir, "id = 1", {"v": "'not-a-number'"})
    # nullable columns may be nulled freely
    update_where(spark, tdir, "id = 1", {"grp": "NULL"}, now_ms=2_000)
    got = _state(spark, tdir)
    assert got[1] == (None, 10)


def test_update_guard_refusal_leaves_no_files(spark):
    """r12 single-pass UPDATE: the SET-nulls-REQUIRED guard fires
    before ANY file — delete or data — is written, so a refusal
    leaves zero orphans behind (previously the position-delete files
    were already on disk when the guard fired)."""
    import os

    tdir = _mkdir()
    base = spark.range(6).selectExpr(
        "id", "cast(id % 3 as bigint) as grp", "id * 10 as v"
    )
    write_iceberg_table(
        spark, base, tdir, now_ms=1_000, partition_spec=BUCKET_SPEC
    )
    with pytest.raises(ValueError, match="REQUIRED"):
        update_where(spark, tdir, "id >= 0", {"v": "NULL"})
    assert not os.path.isdir(os.path.join(tdir, "deletes"))
    stray = [
        p
        for p in os.listdir(tdir)
        if p.startswith("_stage-") or p.endswith(".parquet")
    ]
    assert stray == []


def test_update_single_pass_reads_matched_files_once(spark):
    """r12: update_where constructs exactly ONE scan over the table's
    data files — the persisted matched frame feeds the guard probe,
    the delete writer, and the updated copies (previously the matched
    files were planned+read twice)."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        scan as S,
    )

    tdir = _mkdir()
    _table(spark, tdir)
    calls = {"n": 0}
    orig = S._read_planned_files  # scan.py binds the name at import

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    S._read_planned_files = counting
    try:
        update_where(spark, tdir, "id % 4 = 1", {"v": "v + 1"}, now_ms=2_000)
    finally:
        S._read_planned_files = orig
    assert calls["n"] == 1
    got = _state(spark, tdir)
    assert got[1] == (1, 11) and got[5] == (2, 51) and got[2] == (2, 20)
