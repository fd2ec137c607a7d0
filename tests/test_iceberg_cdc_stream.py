"""The `iceberg_cdc` keyed-changelog streaming source
(`sources/iceberg_stream.py::IcebergCdcStreamReader`): upsert-stream
(Flink changelog) semantics over the merge plane — delete_key rows
from equality-delete files, insert rows from data files, _commit_seq
stamping, replay-to-mirror equivalence, positional-delete refusal,
throttled windows, and partition-scoped subscriptions.
"""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    commit_position_deletes,
    merge_upsert,
    read_iceberg_table,
    write_iceberg_table,
)
from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
    register_cdc,
)
from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
    run_stream_to_memory,
)

SPEC = [("id_bucket", "bucket[2]", "id")]


def _mkdir() -> str:
    return tempfile.mkdtemp(prefix="iceberg-cdc-stream-")


def _table_with_merge(spark, tdir: str):
    base = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(12)],
        "id bigint, grp bigint, val string",
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=SPEC)
    merge_upsert(
        spark,
        spark.createDataFrame(
            [(2, 0, "upd", "u", 1), (3, None, None, "d", 1),
             (50, 1, "ins", "i", 1)],
            "id bigint, grp bigint, val string, op string, seq bigint",
        ),
        tdir, on=["id"], op_col="op", seq_col="seq",
        partition_spec=SPEC, now_ms=2_000,
    )


def _events(spark, tdir: str, **opts):
    register_cdc(spark)
    reader = spark.readStream.format("iceberg_cdc").option("path", tdir)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return run_stream_to_memory(reader.load(), "append")


def test_cdc_stream_emits_upsert_changelog(spark):
    tdir = _mkdir()
    _table_with_merge(spark, tdir)
    ev = _events(spark, tdir)
    rows = {
        (r["id"], r["_change_type"], r["val"], r["_commit_seq"])
        for r in ev.collect()
    }
    base = {(i, "insert", f"v{i}", 1) for i in range(12)}
    window2 = {
        (2, "delete_key", None, 2),
        (3, "delete_key", None, 2),
        (50, "delete_key", None, 2),
        (2, "insert", "upd", 2),
        (50, "insert", "ins", 2),
    }
    assert rows == base | window2


def test_cdc_stream_mirror_equals_table(spark):
    """Replaying the stream (last insert per key unless a
    later-or-equal delete follows) reproduces the table exactly."""
    from pyspark.sql import Window

    tdir = _mkdir()
    _table_with_merge(spark, tdir)
    ev = _events(spark, tdir)
    ins = ev.where(F.col("_change_type") == "insert")
    w = Window.partitionBy("id").orderBy(F.col("_commit_seq").desc())
    last_ins = (
        ins.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .drop("rn")
    )
    dseq = (
        ev.where(F.col("_change_type") == "delete_key")
        .select(F.col("id").alias("did"), "_commit_seq")
        .groupBy("did")
        .agg(F.max("_commit_seq").alias("dseq"))
    )
    mirror = {
        (r["id"], r["val"])
        for r in last_ins.join(
            dseq, F.col("id") == F.col("did"), "left"
        )
        .where("dseq IS NULL OR dseq <= _commit_seq")
        .collect()
    }
    table = {
        (r["id"], r["val"])
        for r in read_iceberg_table(spark, tdir).collect()
    }
    assert mirror == table


def test_cdc_stream_positional_delete_refused(spark):
    tdir = _mkdir()
    base = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(8)],
        "id bigint, grp bigint, val string",
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=SPEC)
    commit_position_deletes(spark, tdir, "id = 3", now_ms=2_000)
    with pytest.raises(Exception, match="key-representable"):
        _events(spark, tdir)


def test_cdc_stream_throttled_windows(spark):
    """maxSnapshotsPerTrigger=1 with a persisted throttle base: each
    commit becomes its own micro-batch, seq stamps preserved."""
    import os

    tdir = _mkdir()
    _table_with_merge(spark, tdir)
    merge_upsert(
        spark,
        spark.createDataFrame(
            [(0, 0, "third", "u", 1)],
            "id bigint, grp bigint, val string, op string, seq bigint",
        ),
        tdir, on=["id"], op_col="op", seq_col="seq",
        partition_spec=SPEC, now_ms=3_000,
    )
    state = os.path.join(tdir, "_throttle")
    ev = _events(
        spark, tdir, maxSnapshotsPerTrigger="1", throttleStateDir=state
    )
    # all three commit windows eventually drain under availableNow
    assert {r["_commit_seq"] for r in ev.collect()} == {1, 2, 3}


def test_cdc_stream_scoped_subscription(spark):
    """source_predicates scopes inserts to the matching rows; a
    GLOBAL-shaped retraction of an out-of-scope key may pass through
    (harmless downstream) but in-scope keys always do."""
    import json

    tdir = _mkdir()
    _table_with_merge(spark, tdir)
    ev = _events(
        spark, tdir, sourcePredicates=json.dumps({"id": [0, 5]})
    )
    ins = {
        (r["id"], r["val"])
        for r in ev.where("_change_type = 'insert'").collect()
    }
    assert ins == {(i, f"v{i}") for i in range(6) if i != 2} | {(2, "v2"), (2, "upd")}
    del_ids = {
        r["id"] for r in ev.where("_change_type = 'delete_key'").collect()
    }
    assert {2, 3} <= del_ids  # in-scope retractions always delivered


def test_cdc_stream_required_columns_nullable_in_changelog(spark, tmp_path):
    """A table whose schema declares required (non-null) columns still
    streams: delete_key rows null out non-key columns, so the stream's
    schema relaxes every table column to nullable (caught by the
    --mirror probe: spark.range sources produce required fields)."""
    tdir = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 3).alias("v")  # both non-nullable
    )
    spec = [("id_bucket", "bucket[2]", "id")]
    write_iceberg_table(spark, df, tdir, now_ms=1_000, partition_spec=spec)
    merge_upsert(
        spark,
        spark.createDataFrame([(3, None, "d")], "id bigint, v bigint, op string"),
        tdir, on=["id"], op_col="op", partition_spec=spec, now_ms=2_000,
    )
    ev = _events(spark, tdir)
    rows = {(r["id"], r["_change_type"], r["v"]) for r in ev.collect()}
    assert (3, "delete_key", None) in rows
    assert (3, "insert", 9) in rows  # base insert of id=3
    assert len(rows) == 11


# ---------------------------------------------------------------------------
# Mid-stream schema evolution posture (r11, module docstring): old files
# pad-null/up-cast silently (lossless); files NEWER than the pinned
# stream schema fail explicitly toward a checkpoint-preserving restart.


def test_cdc_stream_started_after_evolution_pads_old_files(spark):
    # direction 1: consumer newer than the files — silent null padding
    tdir = _mkdir()
    _table_with_merge(spark, tdir)
    merge_upsert(
        spark,
        spark.createDataFrame(
            [(60, 2, "withscore", 0.75)],
            "id bigint, grp bigint, val string, score double",
        ),
        tdir, on=["id"], partition_spec=SPEC, now_ms=3_000,
    )
    ev = _events(spark, tdir)
    rows = {
        (r["id"], r["_change_type"], r["score"])
        for r in ev.collect()
        if r["id"] in (60, 5)
    }
    assert (60, "insert", 0.75) in rows  # post-evolution file
    assert (5, "insert", None) in rows  # pre-evolution file pads null
    assert (60, "delete_key", None) in rows


def test_cdc_stream_pinned_schema_fails_explicit_on_new_column(spark):
    # direction 2: the table evolves AFTER the stream pinned its schema
    # — reading a newer file raises the actionable restart error
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
        IcebergCdcStreamReader,
        StreamSchemaEvolvedError,
    )

    tdir = _mkdir()
    _table_with_merge(spark, tdir)
    register_cdc(spark)
    pinned = (
        spark.readStream.format("iceberg_cdc").option("path", tdir)
        .load()
        .schema
    )
    merge_upsert(
        spark,
        spark.createDataFrame(
            [(61, 2, "late", 1.25)],
            "id bigint, grp bigint, val string, score double",
        ),
        tdir, on=["id"], partition_spec=SPEC, now_ms=3_000,
    )
    reader = IcebergCdcStreamReader({"path": tdir}, pinned_schema=pinned)
    parts = reader.partitions({"seq": 2}, {"seq": 3})
    data_parts = [p for p in parts if p.kind == "data"]
    assert data_parts
    with pytest.raises(StreamSchemaEvolvedError, match="Restart the streaming query"):
        for p in data_parts:
            list(reader.read(p))


def test_cdc_stream_pinned_schema_fails_explicit_on_widened_column(spark):
    # a post-pin int->long promotion would silently truncate through an
    # old consumer — same restart posture
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
        IcebergCdcStreamReader,
        StreamSchemaEvolvedError,
    )

    tdir = _mkdir()
    base = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(8)],
        "id bigint, grp bigint, cnt int",
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=SPEC)
    register_cdc(spark)
    pinned = (
        spark.readStream.format("iceberg_cdc").option("path", tdir)
        .load()
        .schema
    )
    merge_upsert(
        spark,
        spark.createDataFrame(
            [(0, 0, 6_000_000_000)], "id bigint, grp bigint, cnt bigint"
        ),
        tdir, on=["id"], partition_spec=SPEC, now_ms=2_000,
    )
    reader = IcebergCdcStreamReader({"path": tdir}, pinned_schema=pinned)
    parts = [
        p for p in reader.partitions({"seq": 1}, {"seq": 2})
        if p.kind == "data"
    ]
    assert parts
    with pytest.raises(StreamSchemaEvolvedError, match="Restart"):
        for p in parts:
            list(reader.read(p))


def test_cdc_stream_restart_after_evolution_continues_from_checkpoint(spark):
    # the posture's promise: a RESTART (same checkpoint) re-pins the
    # evolved schema and consumes exactly the missed window
    import tempfile as _tempfile

    tdir = _mkdir()
    _table_with_merge(spark, tdir)
    register_cdc(spark)
    ckpt = _tempfile.mkdtemp(prefix="cdc-evo-ckpt-")

    def drain():
        rows: list = []
        cols: list = []

        def sink(batch_df, _bid):
            rows.extend(batch_df.collect())
            cols[:] = batch_df.columns

        reader = spark.readStream.format("iceberg_cdc").option("path", tdir)
        q = (
            reader.load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return rows, cols

    first, _ = drain()
    assert {r["_commit_seq"] for r in first} == {1, 2}
    merge_upsert(
        spark,
        spark.createDataFrame(
            [(70, 1, "post", 9.5)],
            "id bigint, grp bigint, val string, score double",
        ),
        tdir, on=["id"], partition_spec=SPEC, now_ms=3_000,
    )
    second, cols = drain()
    assert {r["_commit_seq"] for r in second} == {3}  # only the new window
    assert "score" in cols  # the restart re-pinned the evolved schema
    got = {(r["id"], r["_change_type"], r["score"]) for r in second}
    assert (70, "insert", 9.5) in got


def test_cdc_stream_positional_delete_with_merge_keys(spark):
    """r12: with declared mergeKeys, a window holding position-delete
    files (an `update_where` / row-level DELETE) resolves them to
    keyed retractions — the deleted identities' PRE-IMAGE keys read
    from the target files — instead of killing the consumer."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.update import (
        update_where,
    )

    tdir = _mkdir()
    base = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(8)],
        "id bigint, grp bigint, val string",
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=SPEC)
    update_where(spark, tdir, "id IN (2, 5)", {"val": "'upd'"}, now_ms=2_000)
    commit_position_deletes(spark, tdir, "id = 7", now_ms=3_000)
    ev = _events(spark, tdir, mergeKeys="id")
    rows = {
        (r["id"], r["_change_type"], r["val"], r["_commit_seq"])
        for r in ev.collect()
    }
    expect = (
        {(i, "insert", f"v{i}", 1) for i in range(8)}
        | {(2, "delete_key", None, 2), (5, "delete_key", None, 2)}
        | {(2, "insert", "upd", 2), (5, "insert", "upd", 2)}
        | {(7, "delete_key", None, 3)}
    )
    assert rows == expect
    # upsert replay (deletes before inserts at equal seq) converges to
    # the table: 2 and 5 carry the update, 7 is gone
    table = {
        (r["id"], r["val"])
        for r in read_iceberg_table(spark, tdir).collect()
    }
    replay = {(i, f"v{i}") for i in range(8) if i != 7}
    replay = {(i, v) for i, v in replay if i not in (2, 5)} | {
        (2, "upd"), (5, "upd")
    }
    assert table == replay
    # without mergeKeys the refusal stands
    with pytest.raises(Exception, match="key-representable"):
        _events(spark, tdir)


def test_cdc_stream_merge_keys_default_from_table(spark):
    """r12: a merge-born table records its row identity
    (`engine.merge-keys`, stamped by the first keyed merge), and the
    keyed stream defaults its mergeKeys from it — a consumer with NO
    options crosses an update_where window."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_table_metadata,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.update import (
        update_where,
    )

    tdir = _mkdir()
    _table_with_merge(spark, tdir)
    assert (
        read_table_metadata(tdir)["metadata"]["properties"][
            "engine.merge-keys"
        ]
        == "id"
    )
    update_where(spark, tdir, "id = 4", {"val": "'u4'"}, now_ms=3_000)
    ev = _events(spark, tdir)  # no mergeKeys option
    rows = {
        (r["id"], r["_change_type"], r["val"])
        for r in ev.where(F.col("_commit_seq") == 3).collect()
    }
    assert rows == {(4, "delete_key", None), (4, "insert", "u4")}


def test_cdc_stream_dv_delete_with_merge_keys(spark):
    """r13: with declared mergeKeys, a window holding an ENGINE
    deletion vector (`commit_deletion_vectors`) resolves it to keyed
    retractions — the deleted identities' pre-image keys gathered at
    the bitmap's positions — instead of killing the consumer; without
    mergeKeys the refusal stands."""
    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
        commit_deletion_vectors,
    )

    tdir = _mkdir()
    base = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(10)],
        "id bigint, grp bigint, val string",
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=SPEC)
    commit_deletion_vectors(spark, tdir, "id % 4 = 1", now_ms=2_000)
    ev = _events(spark, tdir, mergeKeys="id")
    rows = {
        (r["id"], r["_change_type"], r["val"], r["_commit_seq"])
        for r in ev.collect()
    }
    expect = {(i, "insert", f"v{i}", 1) for i in range(10)} | {
        (i, "delete_key", None, 2) for i in range(10) if i % 4 == 1
    }
    assert rows == expect
    with pytest.raises(Exception, match="key-representable"):
        _events(spark, tdir)


def test_superseding_dv_emits_only_fresh_retractions(spark):
    """THE delta-soundness pin (r13): a superseding DV's spec blob is
    the UNION with its predecessors (v3 single-live-DV rule) — its
    positions re-stamp old retractions at the NEW sequence number. A
    key deleted by DV-1 and RE-INSERTED before DV-2 must survive a
    consumer that crosses only DV-2's window: the keyed resolution
    must read the engine delta blob (fresh positions only), never the
    union."""
    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
        commit_deletion_vectors,
    )

    tdir = _mkdir()
    # ONE data file so both DV commits target the same file
    base = spark.createDataFrame(
        [(i, 0, f"v{i}") for i in range(10)],
        "id bigint, grp bigint, val string",
    ).coalesce(1)
    write_iceberg_table(spark, base, tdir, now_ms=1_000)
    # DV-1 deletes id 0 and 5; consumer checkpoints AFTER it
    commit_deletion_vectors(spark, tdir, "id % 5 = 0", now_ms=2_000)
    ev1 = _events(spark, tdir, mergeKeys="id")
    assert {
        (r["id"], r["_change_type"]) for r in ev1.collect()
    } == {(i, "insert") for i in range(10)} | {
        (0, "delete_key"), (5, "delete_key"),
    }
    ckpt_seq = 2
    # key 0 RE-INSERTED, then DV-2 (superseding: same target file)
    write_iceberg_table(
        spark,
        spark.createDataFrame([(0, 0, "reborn")],
                              "id bigint, grp bigint, val string"),
        tdir, now_ms=3_000,
    )
    commit_deletion_vectors(spark, tdir, "id % 5 = 2", now_ms=4_000)
    ev2 = _events(
        spark, tdir, mergeKeys="id",
        startingSequenceNumber=str(ckpt_seq),
    )
    rows = {
        (r["id"], r["_change_type"], r["val"]) for r in ev2.collect()
    }
    # window (2, head]: the re-insert of 0, and DV-2's FRESH
    # retractions (2, 7) ONLY — 0 and 5 must NOT re-retract
    assert rows == {
        (0, "insert", "reborn"),
        (2, "delete_key", None),
        (7, "delete_key", None),
    }
    # upsert replay leaves 0 alive with the re-inserted value
    table = {
        (r["id"], r["val"])
        for r in read_iceberg_table(spark, tdir).collect()
    }
    assert table == {
        (i, f"v{i}") for i in (1, 3, 4, 6, 8, 9)
    } | {(0, "reborn")}


def test_pre_delta_superseding_dv_refuses_keyed(spark):
    """A superseding DV WITHOUT the engine delta blob (a pre-r13
    commit, simulated by stripping the blob) cannot certify which
    retractions are fresh — the keyed plan must refuse with the
    re-bootstrap recipe rather than emit the union."""
    import os

    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
        ENGINE_DV_DELTA_V1,
        commit_deletion_vectors,
    )
    from tiered_storage_for_apache_kafka_spark.sources.puffin import (
        read_puffin_blobs,
        write_puffin_file,
    )

    tdir = _mkdir()
    base = spark.createDataFrame(
        [(i, 0, f"v{i}") for i in range(10)],
        "id bigint, grp bigint, val string",
    ).coalesce(1)
    write_iceberg_table(spark, base, tdir, now_ms=1_000)
    commit_deletion_vectors(spark, tdir, "id = 1", now_ms=2_000)
    commit_deletion_vectors(spark, tdir, "id = 2", now_ms=3_000)
    # strip the delta blob from the superseding puffin, preserving the
    # union blob's offset (it precedes the delta blob in the file)
    deletes_dir = os.path.join(tdir, "deletes")
    stripped = 0
    for name in sorted(os.listdir(deletes_dir)):
        path = os.path.join(deletes_dir, name)
        blobs = read_puffin_blobs(path)
        if any(b["type"] == ENGINE_DV_DELTA_V1 for b in blobs):
            keep = [
                {
                    "type": b["type"],
                    "payload": b["payload"],
                    "properties": b["properties"],
                }
                for b in blobs
                if b["type"] != ENGINE_DV_DELTA_V1
            ]
            write_puffin_file(path, keep, 0, 0)
            stripped += 1
    assert stripped == 1
    with pytest.raises(Exception, match="no engine delta blob"):
        _events(spark, tdir, mergeKeys="id", startingSequenceNumber="2")


def test_is_engine_dv_gate(tmp_path):
    """Foreign deletion vectors (outside the table's deletes/ dir,
    wrong name shape, or locator-less) never take the keyed path."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.incremental import (
        _is_engine_dv,
    )

    loc = str(tmp_path / "tbl")
    ok = {
        "file_path": f"{loc}/deletes/dv-abc123.puffin",
        "referenced_data_file": f"{loc}/part-0.parquet",
        "content_offset": 4,
        "content_size_in_bytes": 10,
    }
    assert _is_engine_dv(ok, loc)
    assert not _is_engine_dv(
        {**ok, "file_path": "/elsewhere/deletes/dv-abc.puffin"}, loc
    )
    assert not _is_engine_dv(
        {**ok, "file_path": f"{loc}/dv-abc.puffin"}, loc
    )
    assert not _is_engine_dv(
        {**ok, "file_path": f"{loc}/deletes/foreign.puffin"}, loc
    )
    assert not _is_engine_dv({**ok, "content_offset": None}, loc)
    assert not _is_engine_dv({**ok, "referenced_data_file": None}, loc)
