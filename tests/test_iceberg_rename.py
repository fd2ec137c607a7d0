"""RENAME COLUMN + (naming epoch, field id) parquet resolution (r12).

Iceberg proper resolves parquet columns by the FIELD IDS its writers
stamp into every file, making rename a metadata-only no-risk operation
(the reference's Iceberg dependency, `iceberg/data/TableWriterFactory.
java:50-95`). This engine reads through Spark's name-based scan, so it
resolves each file under the column names of its write-time NAMING
EPOCH (encoded in the file name — schema.py "naming epochs") and
re-aliases by field id to the requested schema version. These tests pin
the whole contract: rename across committed files, time travel, chained
and swap renames, compaction across a rename, mutation verbs on renamed
tables, the guards (partition source, live equality-delete keys,
duplicate names), dropped-name re-use, and the parquet field-id /
name-mapping surfaces external readers need.
"""

from __future__ import annotations

import json
import tempfile

import pytest

from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    merge_upsert,
    read_iceberg_table,
    read_iceberg_table_at,
    update_table_schema,
    write_iceberg_table,
)
from tiered_storage_for_apache_kafka_spark.sources.iceberg.maintenance import (
    rewrite_data_files,
)
from tiered_storage_for_apache_kafka_spark.sources.iceberg.scan import (
    plan_scan,
)
from tiered_storage_for_apache_kafka_spark.sources.iceberg.schema import (
    file_naming_epoch,
)
from tiered_storage_for_apache_kafka_spark.sources.iceberg.update import (
    update_where,
)


def _mkdir() -> str:
    return tempfile.mkdtemp(prefix="iceberg-rename-")


def _table(spark, tdir: str, n: int = 6):
    df = spark.createDataFrame(
        [(i, f"n{i}", i * 10) for i in range(n)],
        "id bigint, name string, val bigint",
    )
    return write_iceberg_table(spark, df, tdir, now_ms=1_000)


def test_rename_resolves_old_and_new_files(spark):
    tdir = _mkdir()
    _table(spark, tdir)
    meta = update_table_schema(tdir, rename={"val": "value"}, now_ms=2_000)
    assert meta["properties"]["engine.naming-epoch"] == "1"
    df2 = spark.createDataFrame(
        [(100, "new", 999)], "id bigint, name string, value bigint"
    )
    write_iceberg_table(spark, df2, tdir, now_ms=3_000)
    got = {
        r["id"]: r["value"] for r in read_iceberg_table(spark, tdir).collect()
    }
    assert got[0] == 0 and got[5] == 50  # pre-rename files, by field id
    assert got[100] == 999  # post-rename file
    assert len(got) == 7
    # file-name epochs: pre-rename e0, post-rename e1
    epochs = {file_naming_epoch(d["file_path"]) for d in plan_scan(tdir)}
    assert epochs == {0, 1}


def test_time_travel_sees_snapshot_schema_names(spark):
    tdir = _mkdir()
    meta = _table(spark, tdir)
    snap1 = meta["current-snapshot-id"]
    update_table_schema(tdir, rename={"val": "value"}, now_ms=2_000)
    df2 = spark.createDataFrame(
        [(7, "x", 70)], "id bigint, name string, value bigint"
    )
    write_iceberg_table(spark, df2, tdir, now_ms=3_000)
    tt = read_iceberg_table_at(spark, tdir, snap1)
    assert tt.columns == ["id", "name", "val"]
    assert tt.count() == 6
    assert read_iceberg_table(spark, tdir).columns == ["id", "name", "value"]


def test_chained_and_swap_renames(spark):
    tdir = _mkdir()
    _table(spark, tdir, n=3)
    update_table_schema(tdir, rename={"val": "v2"}, now_ms=2_000)
    df2 = spark.createDataFrame(
        [(10, "m", 1)], "id bigint, name string, v2 bigint"
    )
    write_iceberg_table(spark, df2, tdir, now_ms=3_000)
    update_table_schema(tdir, rename={"v2": "v3"}, now_ms=4_000)
    got = {r["id"]: r["v3"] for r in read_iceberg_table(spark, tdir).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 10: 1}
    # swap two columns in ONE DDL: unambiguous because resolution is
    # by id between the two epochs' name sets
    update_table_schema(tdir, rename={"name": "v3", "v3": "name"}, now_ms=5_000)
    out = read_iceberg_table(spark, tdir)
    row = {r["id"]: (r["v3"], r["name"]) for r in out.collect()}
    assert row[2] == ("n2", 20)  # old 'name' values under 'v3', and back
    assert dict(out.dtypes)["name"] == "bigint"


def test_compaction_across_rename(spark):
    tdir = _mkdir()
    _table(spark, tdir)
    update_table_schema(tdir, rename={"val": "value"}, now_ms=2_000)
    df2 = spark.createDataFrame(
        [(50, "c", 500)], "id bigint, name string, value bigint"
    )
    write_iceberg_table(spark, df2, tdir, now_ms=3_000)
    rewrite_data_files(spark, tdir, now_ms=4_000)
    # rewritten bytes carry CURRENT names and the current epoch marker
    epochs = {file_naming_epoch(d["file_path"]) for d in plan_scan(tdir)}
    assert epochs == {1}
    got = {
        r["id"]: r["value"] for r in read_iceberg_table(spark, tdir).collect()
    }
    assert got[0] == 0 and got[50] == 500 and len(got) == 7


def test_mutations_on_renamed_table(spark):
    tdir = _mkdir()
    _table(spark, tdir)
    update_table_schema(tdir, rename={"val": "value"}, now_ms=2_000)
    # row-level UPDATE addressing the new name over pre-rename files
    update_where(
        spark, tdir, "id = 2", {"value": "value + 1"}, now_ms=3_000
    )
    # CDC merge keyed on id, batch under the new name
    batch = spark.createDataFrame(
        [(0, "n0", 77), (200, "fresh", 7)],
        "id bigint, name string, value bigint",
    )
    merge_upsert(spark, batch, tdir, on=["id"], now_ms=4_000)
    got = {
        r["id"]: r["value"] for r in read_iceberg_table(spark, tdir).collect()
    }
    assert got[2] == 21  # updated through the rename
    assert got[0] == 77 and got[200] == 7
    assert len(got) == 7


def test_rename_guards(spark):
    tdir = _mkdir()
    df = spark.createDataFrame(
        [(i, i % 2, i * 10) for i in range(4)],
        "id bigint, grp bigint, val bigint",
    )
    write_iceberg_table(
        spark, df, tdir, now_ms=1_000,
        partition_spec=[("grp", "identity", None)],
    )
    with pytest.raises(ValueError, match="partition source"):
        update_table_schema(tdir, rename={"grp": "bucket_grp"})
    with pytest.raises(ValueError, match="not in the current schema"):
        update_table_schema(tdir, rename={"missing": "x"})
    with pytest.raises(ValueError, match="duplicate column"):
        update_table_schema(tdir, rename={"val": "id"})
    with pytest.raises(ValueError, match="rename AND drop"):
        update_table_schema(tdir, rename={"val": "v"}, drop=["val"])
    # live equality-delete keys refuse (same recipe as drop)
    merge_upsert(
        spark,
        spark.createDataFrame(
            [(1, 1, 5)], "id bigint, grp bigint, val bigint"
        ),
        tdir,
        on=["id", "val"],
        partition_spec=[("grp", "identity", None)],
        now_ms=2_000,
    )
    with pytest.raises(ValueError, match="equality-delete"):
        update_table_schema(tdir, rename={"val": "v"})


def test_rename_to_historical_name_of_other_column(spark):
    """a -> dropped, then b renamed TO a's old name: b must serve its
    own values under the name, never a's pre-drop bytes."""
    tdir = _mkdir()
    _table(spark, tdir, n=3)  # id, name, val
    update_table_schema(tdir, drop=["val"], now_ms=2_000)
    update_table_schema(tdir, rename={"name": "val"}, now_ms=3_000)
    out = read_iceberg_table(spark, tdir)
    assert dict(out.dtypes)["val"] == "string"
    assert {r["val"] for r in out.collect()} == {"n0", "n1", "n2"}


def test_name_mapping_property_and_parquet_field_ids(spark):
    tdir = _mkdir()
    _table(spark, tdir, n=2)
    meta = update_table_schema(tdir, rename={"val": "value"}, now_ms=2_000)
    mapping = {
        m["field-id"]: m["names"]
        for m in json.loads(
            meta["properties"]["schema.name-mapping.default"]
        )
    }
    assert mapping[3] == ["val", "value"]  # oldest-first
    # data files carry real parquet field ids (external id-based readers)
    import pyarrow.parquet as pq

    sch = pq.read_schema(plan_scan(tdir)[0]["file_path"])
    ids = {
        f.name: int(f.metadata[b"PARQUET:field_id"])
        for f in sch
        if f.metadata and b"PARQUET:field_id" in f.metadata
    }
    assert ids == {"id": 1, "name": 2, "val": 3}


def test_ddl_add_spark_datatype_assigns_unique_ids(spark):
    """ADVICE r11 (high): a Spark-DataType add must allocate the
    TOP-LEVEL field id before converting the type — a primitive add
    previously re-used the last existing column id, and an array add
    aliased its field id to its own element-id."""
    from pyspark.sql import types as T

    tdir = _mkdir()
    _table(spark, tdir, n=2)  # ids 1..3, last-column-id 3
    meta = update_table_schema(
        tdir, add=[("x", T.LongType())], now_ms=2_000
    )
    fields = {f["name"]: f["id"] for f in meta["schemas"][-1]["fields"]}
    assert fields["x"] == 4 and meta["last-column-id"] == 4
    meta = update_table_schema(
        tdir, add=[("arr", T.ArrayType(T.IntegerType()))], now_ms=3_000
    )
    arr = next(
        f for f in meta["schemas"][-1]["fields"] if f["name"] == "arr"
    )
    assert arr["id"] == 5 and arr["type"]["element-id"] == 6
    assert meta["last-column-id"] == 6
    all_ids = [f["id"] for f in meta["schemas"][-1]["fields"]]
    assert len(all_ids) == len(set(all_ids))


def test_rename_epoch_survives_snapshot_expiry(spark):
    """Resolution must not depend on the ADDING snapshot's survival:
    the epoch travels in the file name, so expiring every pre-rename
    snapshot leaves old files readable under the new name."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.maintenance import (  # noqa: E501
        expire_snapshots,
    )

    tdir = _mkdir()
    _table(spark, tdir)
    update_table_schema(tdir, rename={"val": "value"}, now_ms=2_000)
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(9, "z", 90)], "id bigint, name string, value bigint"
        ),
        tdir,
        now_ms=3_000,
    )
    expire_snapshots(tdir, keep_last=1, older_than_ms=2_500, now_ms=4_000)
    got = {
        r["id"]: r["value"] for r in read_iceberg_table(spark, tdir).collect()
    }
    assert got[0] == 0 and got[9] == 90 and len(got) == 7


def test_streams_cross_rename_epochs(spark):
    """r12: the streaming sources resolve pre-rename files by field id
    (per-epoch mapping planned driver-side), so a stream started AFTER
    a rename serves the old epochs' files under the new names instead
    of failing them as unknown columns — and a keyed CDC consumer's
    position-delete resolution finds keys in pre-rename target files."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
        register,
        register_cdc,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        run_stream_to_memory,
    )

    tdir = _mkdir()
    _table(spark, tdir, n=4)  # id, name, val (epoch 0)
    update_table_schema(tdir, rename={"val": "value"}, now_ms=2_000)
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(9, "new", 90)], "id bigint, name string, value bigint"
        ),
        tdir, now_ms=3_000,
    )
    # append-only incremental stream: both epochs under the new name
    register(spark)
    inc = run_stream_to_memory(
        spark.readStream.format("iceberg_inc").option("path", tdir).load(),
        "append",
    )
    got = {r["id"]: r["value"] for r in inc.collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 30, 9: 90}
    # keyed CDC stream across an update_where whose targets are
    # PRE-RENAME files: pre-image keys resolve through the epoch map
    update_where(spark, tdir, "id = 2", {"value": "99"}, now_ms=4_000)
    register_cdc(spark)
    ev = run_stream_to_memory(
        spark.readStream.format("iceberg_cdc")
        .option("path", tdir)
        .option("mergeKeys", "id")
        .load(),
        "append",
    )
    rows = {
        (r["id"], r["_change_type"], r["value"]) for r in ev.collect()
    }
    assert (2, "delete_key", None) in rows
    assert (2, "insert", 99) in rows
    assert (0, "insert", 0) in rows and (9, "insert", 90) in rows


def test_bounds_pruning_survives_rename(spark):
    """Column-stats pruning is keyed by FIELD ID in the manifests, so
    a bounds-pruned scan keeps pruning under the column's NEW name —
    including files written before the rename."""
    tdir = _mkdir()
    df = spark.range(10_000).selectExpr("id", "id * 2 as val")
    write_iceberg_table(
        spark, df, tdir, now_ms=1_000, sort_by=["id"],
        max_records_per_file=1_000,
    )
    n_all = len(plan_scan(tdir))
    assert n_all >= 8
    update_table_schema(tdir, rename={"val": "doubled"}, now_ms=2_000)
    write_iceberg_table(
        spark,
        spark.range(10_000, 12_000).selectExpr("id", "id * 2 as doubled"),
        tdir, now_ms=3_000, sort_by=["id"], max_records_per_file=1_000,
    )
    pruned = plan_scan(tdir, column_bounds=("doubled", 100, 300))
    assert 1 <= len(pruned) < n_all  # old files prune under the new name
    pruned_new = plan_scan(tdir, column_bounds=("doubled", 21_000, 21_500))
    assert all(
        file_naming_epoch(d["file_path"]) == 1 for d in pruned_new
    )  # only post-rename files overlap that window
    got = read_iceberg_table(spark, tdir).where(
        "doubled BETWEEN 100 AND 300"
    )
    assert got.count() == 101


def test_rollback_across_rename_keeps_current_schema(spark):
    """Iceberg rollback moves the DATA pointer, never the schema: after
    rolling back past a rename, the table still reads under the
    CURRENT (renamed) schema, with the restored files resolved by
    field id under their write epoch."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        rollback_to_snapshot,
    )

    tdir = _mkdir()
    meta = _table(spark, tdir, n=3)
    snap1 = meta["current-snapshot-id"]
    update_table_schema(tdir, rename={"val": "value"}, now_ms=2_000)
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(9, "z", 90)], "id bigint, name string, value bigint"
        ),
        tdir, now_ms=3_000,
    )
    rollback_to_snapshot(tdir, snap1, now_ms=4_000)
    out = read_iceberg_table(spark, tdir)
    assert out.columns == ["id", "name", "value"]  # schema stays current
    got = {r["id"]: r["value"] for r in out.collect()}
    assert got == {0: 0, 1: 10, 2: 20}  # epoch-0 files under the new name
