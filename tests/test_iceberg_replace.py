"""replace_partitions (`sources/iceberg/update.py`, r11): dynamic
partition overwrite — retract every CELL the batch touches, land the
batch, one overwrite snapshot; untouched cells untouched; row-level
transform-exact retraction so partition evolution never leaks stale
rows into a replaced cell.
"""

from __future__ import annotations

import tempfile

import pytest

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    read_iceberg_table,
    read_table_metadata,
    replace_partitions,
    rewrite_data_files,
    update_partition_spec,
    write_iceberg_table,
)


def _mkdir() -> str:
    return tempfile.mkdtemp(prefix="iceberg-replace-")


def _vals(spark, tdir):
    return {
        (r["id"]): (r["grp"], r["v"])
        for r in read_iceberg_table(spark, tdir).collect()
    }


def test_replace_identity_cells(spark):
    tdir = _mkdir()
    spec = [("grp", "identity", None)]
    base = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(12)],
        "id bigint, grp bigint, v bigint",
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=spec)
    batch = spark.createDataFrame(
        [(100, 1, 1), (101, 1, 2), (102, 2, 3)],
        "id bigint, grp bigint, v bigint",
    )
    meta = replace_partitions(spark, batch, tdir, now_ms=2_000)
    got = _vals(spark, tdir)
    exp = {i: (i % 3, i * 10) for i in range(12) if i % 3 == 0}  # grp 0 kept
    exp.update({100: (1, 1), 101: (1, 2), 102: (2, 3)})
    assert got == exp
    summ = meta["snapshots"][-1]["summary"]
    assert summ["operation"] == "overwrite"
    assert len(meta["snapshots"]) == 2  # ONE snapshot replaced both cells


def test_replace_bucket_cells_including_old_generation(spark):
    # partition evolution: rows written under the OLD identity spec
    # whose RECOMPUTED bucket lands in a replaced cell must go too
    tdir = _mkdir()
    base = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(16)],
        "id bigint, grp bigint, v bigint",
    )
    write_iceberg_table(
        spark, base, tdir, now_ms=1_000,
        partition_spec=[("grp", "identity", None)],
    )
    update_partition_spec(
        tdir,
        [("grp", "identity", None), ("id_bucket", "bucket[4]", "id")],
        now_ms=2_000,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.transforms import (
        bucket_hash_long,
    )

    def bkt(i):  # the spec's own bucket
        return (bucket_hash_long(i) & 0x7FFFFFFF) % 4

    batch = spark.createDataFrame(
        [(200, 0, 7), (201, 0, 8)], "id bigint, grp bigint, v bigint"
    )
    replace_partitions(spark, batch, tdir, now_ms=3_000)
    cells = {(0, bkt(200)), (0, bkt(201))}
    got = _vals(spark, tdir)
    exp = {
        i: (i % 3, i * 10)
        for i in range(16)
        if (i % 3, bkt(i)) not in cells
    }
    exp.update({200: (0, 7), 201: (0, 8)})
    assert got == exp


def test_replace_untouched_cells_survive_and_empty_batch_noop(spark):
    tdir = _mkdir()
    spec = [("grp", "identity", None)]
    base = spark.createDataFrame(
        [(i, i % 4, i) for i in range(8)], "id bigint, grp bigint, v bigint"
    )
    m0 = write_iceberg_table(
        spark, base, tdir, now_ms=1_000, partition_spec=spec
    )
    empty = spark.createDataFrame([], "id bigint, grp bigint, v bigint")
    m1 = replace_partitions(spark, empty, tdir, now_ms=2_000)
    assert len(m1["snapshots"]) == len(m0["snapshots"])  # never truncate
    batch = spark.createDataFrame([(50, 3, 0)], "id bigint, grp bigint, v bigint")
    replace_partitions(spark, batch, tdir, now_ms=3_000)
    got = _vals(spark, tdir)
    assert got[50] == (3, 0)
    assert 3 not in {g for _i, (g, _v) in got.items() if _i != 50}
    assert len([1 for _i, (g, _v) in got.items() if g == 0]) == 2  # kept


def test_replace_schema_guards(spark):
    tdir = _mkdir()
    spec = [("grp", "identity", None)]
    base = spark.range(6).selectExpr(
        "id", "cast(id % 3 as bigint) as grp", "id as v"
    )  # id, v non-null -> required
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=spec)
    bad = spark.createDataFrame([(1, 1, 1, "x")],
                                "id bigint, grp bigint, v bigint, extra string")
    with pytest.raises(ValueError, match="unknown columns"):
        replace_partitions(spark, bad, tdir)
    lacking = spark.createDataFrame([(1, 1)], "id bigint, grp bigint")
    with pytest.raises(ValueError, match="REQUIRED"):
        replace_partitions(spark, lacking, tdir)


def test_replace_unpartitioned_rejected(spark):
    tdir = _mkdir()
    df = spark.createDataFrame([(1, 2)], "id bigint, v bigint")
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    with pytest.raises(ValueError, match="unpartitioned"):
        replace_partitions(spark, df, tdir)


def test_replace_creates_table_when_missing(spark):
    tdir = _mkdir()
    batch = spark.createDataFrame(
        [(1, 0, 10)], "id bigint, grp bigint, v bigint"
    )
    meta = replace_partitions(spark, batch, tdir + "/t", now_ms=1_000)
    assert meta["snapshots"]
    # unpartitioned create (no spec to derive) is fine for the first
    # write; later overwrites on it then reject per the guard above


def test_replace_then_compaction(spark):
    tdir = _mkdir()
    spec = [("grp", "identity", None)]
    base = spark.createDataFrame(
        [(i, i % 3, i) for i in range(9)], "id bigint, grp bigint, v bigint"
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=spec)
    batch = spark.createDataFrame(
        [(90, 1, -1), (91, 1, -2)], "id bigint, grp bigint, v bigint"
    )
    replace_partitions(spark, batch, tdir, now_ms=2_000)
    before = _vals(spark, tdir)
    rewrite_data_files(spark, tdir, now_ms=3_000)
    assert _vals(spark, tdir) == before
    back = read_table_metadata(tdir)
    live_dels = [
        e
        for m in back["manifests"]
        for e in m["entries"]
        if e["status"] != 2 and e["data_file"].get("content") == 1
    ]
    assert live_dels == []
