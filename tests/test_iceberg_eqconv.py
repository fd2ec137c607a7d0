"""convert_equality_deletes (`sources/iceberg/deletes.py`): the
eq->pos maintenance pass. Covers state preservation (incl. the
delete-then-resurrect window rule), counter exactness, tombstoning,
exclusion of already-positioned rows, spec-generation handling,
composition with rewrite_position_deletes and the CDC stream, the
hot-cell row cap, and no-op cases.
"""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    commit_position_deletes,
    convert_equality_deletes,
    merge_upsert,
    read_iceberg_table,
    read_table_metadata,
    rewrite_position_deletes,
    update_partition_spec,
    write_iceberg_table,
)

SPEC = [("id_bucket", "bucket[2]", "id")]


def _mkdir() -> str:
    return tempfile.mkdtemp(prefix="iceberg-eqconv-")


def _state(spark, tdir):
    return {
        r["id"]: r["val"] for r in read_iceberg_table(spark, tdir).collect()
    }


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "id bigint, grp bigint, val string, op string, seq bigint"
    )


def _live_deletes(tdir):
    back = read_table_metadata(tdir)
    return [
        (e["data_file"].get("content"), e["data_file"]["file_path"])
        for m in back["manifests"]
        for e in m["entries"]
        if e["status"] != 2 and e["data_file"].get("content") in (1, 2)
    ]


def _cdc_table(spark, tdir, n=20):
    base = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(n)],
        "id bigint, grp bigint, val string",
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=SPEC)
    merge_upsert(
        spark,
        _batch(spark, [(2, 0, "u2", "u", 1), (3, None, None, "d", 1)]),
        tdir, on=["id"], op_col="op", seq_col="seq",
        partition_spec=SPEC, now_ms=2_000,
    )
    merge_upsert(
        spark,
        _batch(
            spark, [(3, 1, "resurrected", "i", 1), (4, None, None, "d", 1)]
        ),
        tdir, on=["id"], op_col="op", seq_col="seq",
        partition_spec=SPEC, now_ms=3_000,
    )


def test_convert_preserves_state_and_counters(spark):
    tdir = _mkdir()
    _cdc_table(spark, tdir)
    before = _state(spark, tdir)
    assert before[3] == "resurrected"  # the window rule's hard case
    meta = convert_equality_deletes(spark, tdir, now_ms=4_000)
    assert _state(spark, tdir) == before
    # every eq file tombstoned; only converted position files live
    live = _live_deletes(tdir)
    assert live and all(c == 1 for c, _p in live)
    summ = meta["snapshots"][-1]["summary"]
    # old v2-of-id2, old v3-of-id3, id4 = exactly 3 positions
    assert int(summ["added-position-deletes"]) == 3
    assert int(summ["total-position-deletes"]) == 3
    assert int(summ["total-equality-deletes"]) == 0
    assert int(summ["converted-equality-delete-files"]) == 4


def test_convert_excludes_already_positioned_rows(spark):
    """A row deleted BOTH ways (position delete + matching eq key)
    converts to zero net-new positions for that row."""
    tdir = _mkdir()
    base = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(10)],
        "id bigint, grp bigint, val string",
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=SPEC)
    commit_position_deletes(spark, tdir, "id = 5", now_ms=2_000)
    merge_upsert(
        spark,
        _batch(
            spark, [(5, None, None, "d", 1), (6, None, None, "d", 1)]
        ),
        tdir, on=["id"], op_col="op", seq_col="seq",
        partition_spec=SPEC, now_ms=3_000,
    )
    before = _state(spark, tdir)
    meta = convert_equality_deletes(spark, tdir, now_ms=4_000)
    assert _state(spark, tdir) == before
    summ = meta["snapshots"][-1]["summary"]
    # id=5's position was already deleted; only id=6 is net-new
    assert int(summ["added-position-deletes"]) == 1
    assert int(summ["total-position-deletes"]) == 2
    assert int(summ["total-equality-deletes"]) == 0


def test_convert_noop_without_eq_deletes(spark):
    tdir = _mkdir()
    base = spark.createDataFrame(
        [(1, 0, "a")], "id bigint, grp bigint, val string"
    )
    m0 = write_iceberg_table(
        spark, base, tdir, now_ms=1_000, partition_spec=SPEC
    )
    meta = convert_equality_deletes(spark, tdir, now_ms=2_000)
    assert len(meta["snapshots"]) == len(m0["snapshots"])


def test_convert_row_cap_slices_files(spark):
    tdir = _mkdir()
    _cdc_table(spark, tdir)
    before = _state(spark, tdir)
    convert_equality_deletes(
        spark, tdir, now_ms=4_000, max_rows_per_delete_file=1
    )
    assert _state(spark, tdir) == before
    live = _live_deletes(tdir)
    back = read_table_metadata(tdir)
    n_rows = [
        int(e["data_file"]["record_count"])
        for m in back["manifests"]
        for e in m["entries"]
        if e["status"] != 2 and e["data_file"].get("content") == 1
    ]
    assert all(n == 1 for n in n_rows)  # one position per sliced file
    assert sum(n_rows) == 3


def test_convert_then_rpd_merges_per_cell(spark):
    """Converted files are plain v2 position deletes: a following
    rewrite_position_deletes merges them per cell like any others."""
    tdir = _mkdir()
    _cdc_table(spark, tdir)
    before = _state(spark, tdir)
    convert_equality_deletes(
        spark, tdir, now_ms=4_000, max_rows_per_delete_file=1
    )
    rewrite_position_deletes(spark, tdir, now_ms=5_000)
    assert _state(spark, tdir) == before
    back = read_table_metadata(tdir)
    per_cell: dict[str, int] = {}
    import json as _json

    for m in back["manifests"]:
        for e in m["entries"]:
            d = e["data_file"]
            if e["status"] != 2 and d.get("content") == 1:
                cell = _json.dumps(d["partition"], sort_keys=True)
                per_cell[cell] = per_cell.get(cell, 0) + 1
    assert per_cell and max(per_cell.values()) == 1


def test_convert_across_spec_evolution(spark):
    """Old-generation data files get converted position deletes in
    cells of THEIR OWN spec; the global eq plane from a post-evolution
    merge still converts exactly."""
    tdir = _mkdir()
    base = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(12)],
        "id bigint, grp bigint, val string",
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=SPEC)
    new_spec = [("grp", "identity", None)]
    update_partition_spec(tdir, new_spec, now_ms=2_000)
    # post-evolution merge: grp not key-covered -> GLOBAL eq deletes
    # that must retract rows in OLD-generation (bucket) files
    merge_upsert(
        spark,
        _batch(spark, [(1, 2, "moved", "u", 1), (2, None, None, "d", 1)]),
        tdir, on=["id"], op_col="op", seq_col="seq",
        partition_spec=new_spec, now_ms=3_000,
    )
    before = _state(spark, tdir)
    assert before[1] == "moved" and 2 not in before
    convert_equality_deletes(spark, tdir, now_ms=4_000)
    assert _state(spark, tdir) == before
    live = _live_deletes(tdir)
    assert live and all(c == 1 for c, _p in live)
    # converted cells carry the OLD generation's field (bucket), since
    # the retracted rows live in old-generation files
    back = read_table_metadata(tdir)
    cells = [
        e["data_file"]["partition"]
        for m in back["manifests"]
        for e in m["entries"]
        if e["status"] != 2 and e["data_file"].get("content") == 1
    ]
    assert all("id_bucket" in c for c in cells)


def test_convert_unblocks_cdc_stream_for_later_windows(spark):
    """After conversion, a NEW merge window still streams (the
    converted positions live in an older window; the CDC stream only
    fails on positional deletes INSIDE a consumed window)."""
    import json as _json

    from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
        register_cdc,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        run_stream_to_memory,
    )

    tdir = _mkdir()
    _cdc_table(spark, tdir)
    meta = convert_equality_deletes(spark, tdir, now_ms=4_000)
    conv_seq = int(meta["snapshots"][-1]["sequence-number"])
    merge_upsert(
        spark,
        _batch(spark, [(7, 1, "late", "u", 1)]),
        tdir, on=["id"], op_col="op", seq_col="seq",
        partition_spec=SPEC, now_ms=5_000,
    )
    register_cdc(spark)
    ev = run_stream_to_memory(
        spark.readStream.format("iceberg_cdc")
        .option("path", tdir)
        .option("startingsequencenumber", str(conv_seq))
        .load(),
        "append",
    )
    rows = {
        (r["id"], r["_change_type"], r["val"]) for r in ev.collect()
    }
    assert rows == {(7, "delete_key", None), (7, "insert", "late")}


def test_cdc_stream_crosses_conversion_window(spark):
    """A keyed-changelog consumer CROSSING the conversion snapshot is
    unaffected: conversion output files are skipped as view-neutral
    (the guarded `delete-eqconv-` rule — sound here because the full
    history is live), the original equality entries serve their own
    windows, and the replayed mirror still equals the table. Genuine
    positional deletes keep failing loudly
    (test_cdc_stream_positional_delete_refused)."""
    from pyspark.sql import Window

    from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
        register_cdc,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        run_stream_to_memory,
    )

    tdir = _mkdir()
    _cdc_table(spark, tdir)
    conv = convert_equality_deletes(spark, tdir, now_ms=4_000)
    conv_seq = int(conv["snapshots"][-1]["sequence-number"])
    register_cdc(spark)
    ev = run_stream_to_memory(
        spark.readStream.format("iceberg_cdc").option("path", tdir).load(),
        "append",
    )
    # the conversion window itself contributes NOTHING
    assert ev.where(F.col("_commit_seq") == conv_seq).count() == 0
    # and the replayed mirror equals the table state
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
        for r in last_ins.join(dseq, F.col("id") == F.col("did"), "left")
        .where("dseq IS NULL OR dseq <= _commit_seq")
        .collect()
    }
    table = {
        (r["id"], r["val"])
        for r in read_iceberg_table(spark, tdir).collect()
    }
    assert mirror == table


def test_cdc_stream_below_horizon_conversion_refused(spark):
    """The GC-horizon guard: once expiration lifts the horizon past a
    from-scratch consumer's floor, a window holding conversion output
    is refused (equality tombstones below the horizon may have been
    GC'd, so the skip can no longer be proven covered) — re-bootstrap,
    the expired-changelog contract."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        expire_snapshots,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
        register_cdc,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        run_stream_to_memory,
    )

    tdir = _mkdir()
    _cdc_table(spark, tdir)  # seqs 1..3
    convert_equality_deletes(spark, tdir, now_ms=4_000)  # seq 4
    merge_upsert(
        spark, _batch(spark, [(0, 0, "late", "u", 1)]), tdir,
        on=["id"], op_col="op", seq_col="seq", partition_spec=SPEC,
        now_ms=5_000,
    )  # seq 5
    expire_snapshots(tdir, keep_last=2, now_ms=6_000)  # horizon -> 4
    register_cdc(spark)
    with pytest.raises(Exception, match="key-representable"):
        run_stream_to_memory(
            spark.readStream.format("iceberg_cdc")
            .option("path", tdir)
            .load(),
            "append",
        )


def test_convert_zero_match_eq_files_still_retire(spark):
    """Equality deletes whose keys match nothing (e.g. retractions of
    never-inserted keys) convert to ZERO position rows — but the eq
    files still tombstone and the counters still zero out, so the scan
    stops paying for them."""
    tdir = _mkdir()
    base = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(8)],
        "id bigint, grp bigint, val string",
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=SPEC)
    merge_upsert(
        spark,
        _batch(spark, [(500, None, None, "d", 1), (501, None, None, "d", 1)]),
        tdir, on=["id"], op_col="op", seq_col="seq",
        partition_spec=SPEC, now_ms=2_000,
    )
    before = _state(spark, tdir)
    meta = convert_equality_deletes(spark, tdir, now_ms=3_000)
    assert _state(spark, tdir) == before
    assert not _live_deletes(tdir)  # nothing live on either plane
    summ = meta["snapshots"][-1]["summary"]
    assert int(summ["added-position-deletes"]) == 0
    assert int(summ["total-position-deletes"]) == 0
    assert int(summ["total-equality-deletes"]) == 0


def test_convert_via_rest_catalog(spark):
    """Catalog mode: the conversion snapshot (tombstoned eq manifests +
    converted position manifests) commits through the REST protocol and
    the catalog-served read stays exact."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    tdir = _mkdir()
    base = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(12)],
        "id bigint, grp bigint, val string",
    )
    with FakeRestCatalogServer() as server:
        cat = RestCatalogClient(server.base_url)
        write_iceberg_table(
            spark, base, tdir, now_ms=1_000, partition_spec=SPEC,
            catalog=cat, table_name="t",
        )
        merge_upsert(
            spark,
            _batch(spark, [(2, 0, "u2", "u", 1), (3, None, None, "d", 1)]),
            tdir, on=["id"], op_col="op", seq_col="seq",
            partition_spec=SPEC, now_ms=2_000, catalog=cat, table_name="t",
        )
        meta = convert_equality_deletes(
            spark, tdir, now_ms=3_000, catalog=cat, table_name="t"
        )
        summ = meta["snapshots"][-1]["summary"]
        assert int(summ["total-equality-deletes"]) == 0
        got = {
            r["id"]: r["val"]
            for r in read_iceberg_table(
                spark, tdir, catalog=cat, table_name="t"
            ).collect()
        }
        exp = {i: f"v{i}" for i in range(12) if i != 3}
        exp[2] = "u2"
        assert got == exp
