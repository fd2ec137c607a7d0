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
