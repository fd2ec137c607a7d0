"""mirror_iceberg_table (`streaming/ingest.py`): continuous table
replication — iceberg_cdc stream in, merge sink out. Covers initial
sync, incremental catch-up after further source merges, restart
idempotence, and re-partitioning replication (different dst spec).
"""

from __future__ import annotations

import tempfile

import pytest

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    merge_upsert,
    read_iceberg_table,
    read_table_metadata,
    write_iceberg_table,
)
from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
    mirror_iceberg_table,
)

SRC_SPEC = [("id_bucket", "bucket[2]", "id")]


def _state(spark, tdir):
    return {
        (r["id"], r["grp"], r["val"])
        for r in read_iceberg_table(spark, tdir).collect()
    }


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "id bigint, grp bigint, val string, op string, seq bigint"
    )


def _src_table(spark, tdir):
    base = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(16)],
        "id bigint, grp bigint, val string",
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=SRC_SPEC)
    merge_upsert(
        spark,
        _batch(spark, [(2, 0, "u2", "u", 1), (3, None, None, "d", 1)]),
        tdir, on=["id"], op_col="op", seq_col="seq",
        partition_spec=SRC_SPEC, now_ms=2_000,
    )


def test_mirror_sync_catchup_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _src_table(spark, src)

    def run():
        q = mirror_iceberg_table(
            spark, src, dst, on=["id"], checkpoint_dir=ckpt,
            partition_spec=SRC_SPEC,
        )
        q.awaitTermination()

    run()
    assert _state(spark, dst) == _state(spark, src)

    # further source changes -> incremental catch-up only
    merge_upsert(
        spark,
        _batch(
            spark,
            [(0, 1, "moved", "u", 1), (5, None, None, "d", 1),
             (90, 2, "late", "i", 1)],
        ),
        src, on=["id"], op_col="op", seq_col="seq",
        partition_spec=SRC_SPEC, now_ms=3_000,
    )
    n_dst_snaps = len(read_table_metadata(dst)["metadata"]["snapshots"])
    run()
    assert _state(spark, dst) == _state(spark, src)
    meta = read_table_metadata(dst)["metadata"]
    # exactly ONE more snapshot applied the one-source-commit window
    assert len(meta["snapshots"]) == n_dst_snaps + 1

    # restart with nothing new: no snapshot, state unchanged
    run()
    meta2 = read_table_metadata(dst)["metadata"]
    assert meta2["current-snapshot-id"] == meta["current-snapshot-id"]
    assert _state(spark, dst) == _state(spark, src)


def test_mirror_repartitioning_replication(spark, tmp_path):
    """The mirror may lay the destination out under a DIFFERENT spec
    (identity(grp) here) — replication re-partitions in flight; the
    non-key spec source makes the dst retractions global, and state
    still converges."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _src_table(spark, src)
    q = mirror_iceberg_table(
        spark, src, dst, on=["id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        partition_spec=[("grp", "identity", None)],
    )
    q.awaitTermination()
    assert _state(spark, dst) == _state(spark, src)
    stored = [
        (f["name"], f["transform"])
        for f in read_table_metadata(dst)["metadata"]["partition-specs"][0][
            "fields"
        ]
    ]
    assert stored == [("grp", "identity")]


def test_mirror_into_rest_catalog_destination(spark, tmp_path):
    """The destination side of the mirror can commit through the REST
    catalog protocol: every applied window moves the catalog pointer,
    and the catalog-served read converges to the source state."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _src_table(spark, src)
    with FakeRestCatalogServer() as server:
        cat = RestCatalogClient(server.base_url)
        q = mirror_iceberg_table(
            spark, src, dst, on=["id"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            partition_spec=SRC_SPEC, catalog=cat, table_name="mirror",
        )
        q.awaitTermination()
        got = {
            (r["id"], r["grp"], r["val"])
            for r in read_iceberg_table(
                spark, dst, catalog=cat, table_name="mirror"
            ).collect()
        }
        assert got == _state(spark, src)


def test_mirror_survives_source_conversion(spark, tmp_path):
    """The operational loop end-to-end: mirror syncs, the SOURCE runs
    convert_equality_deletes (a view-neutral window the keyed stream
    skips), takes another merge, and the mirror catch-up converges —
    maintenance on the source never forces a mirror re-bootstrap."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        convert_equality_deletes,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _src_table(spark, src)

    def run():
        q = mirror_iceberg_table(
            spark, src, dst, on=["id"], checkpoint_dir=ckpt,
            partition_spec=SRC_SPEC,
        )
        q.awaitTermination()

    run()
    convert_equality_deletes(spark, src, now_ms=5_000)
    merge_upsert(
        spark,
        _batch(spark, [(7, 1, "post-conv", "u", 1),
                       (8, None, None, "d", 1)]),
        src, on=["id"], op_col="op", seq_col="seq",
        partition_spec=SRC_SPEC, now_ms=6_000,
    )
    run()
    assert _state(spark, dst) == _state(spark, src)


def test_mirror_preserves_required_columns_in_destination(spark, tmp_path):
    # advisor r10: the dst used to be created from the force-nullable
    # stream schema; it must come from the SOURCE table's metadata
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    base = spark.range(10).selectExpr(  # range id is non-null -> required
        "id", "cast(id % 3 as bigint) as grp", "string(id) as val"
    )
    write_iceberg_table(spark, base, src, now_ms=1_000, partition_spec=SRC_SPEC)
    src_req = {
        f["name"]: f["required"]
        for f in read_table_metadata(src)["metadata"]["schemas"][-1]["fields"]
    }
    assert src_req["id"] is True
    q = mirror_iceberg_table(
        spark, src, dst, on=["id"],
        checkpoint_dir=str(tmp_path / "ckpt"), partition_spec=SRC_SPEC,
    )
    q.awaitTermination()
    dst_meta = read_table_metadata(dst)["metadata"]
    dst_req = {
        f["name"]: f["required"]
        for f in dst_meta["schemas"][-1]["fields"]
    }
    assert dst_req["id"] is True  # required-ness survived the replica
    assert dst_meta["current-schema-id"] == max(
        s["schema-id"] for s in dst_meta["schemas"]
    )
    assert _state(spark, dst) == _state(spark, src)


def test_mirror_survives_source_schema_evolution_across_restart(spark, tmp_path):
    # VERDICT r10 #4/#5 composition: a column appears on the source
    # mid-lifetime; the next mirror run (fresh query, same checkpoint)
    # pins the evolved schema, evolves the destination through the
    # merge plane, and converges
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _src_table(spark, src)

    def run():
        q = mirror_iceberg_table(
            spark, src, dst, on=["id"], checkpoint_dir=ckpt,
            partition_spec=SRC_SPEC,
        )
        q.awaitTermination()

    run()
    assert _state(spark, dst) == _state(spark, src)

    # source evolves: new optional column lands through a merge
    merge_upsert(
        spark,
        spark.createDataFrame(
            [(2, 0, "u2-scored", 0.5), (99, 1, "new", 0.9)],
            "id bigint, grp bigint, val string, score double",
        ),
        src, on=["id"], partition_spec=SRC_SPEC, now_ms=3_000,
    )
    run()
    dst_meta = read_table_metadata(dst)["metadata"]
    assert len(dst_meta["schemas"]) >= 2  # the replica evolved too
    src_rows = {
        (r["id"], r["val"], r["score"])
        for r in read_iceberg_table(spark, src).collect()
    }
    dst_rows = {
        (r["id"], r["val"], r["score"])
        for r in read_iceberg_table(spark, dst).collect()
    }
    assert dst_rows == src_rows
    assert (99, "new", 0.9) in dst_rows
    assert (5, "v5", None) in dst_rows  # pre-evolution rows pad null


def test_mirror_restart_behind_rpd_over_conversion_outputs(spark, tmp_path):
    """advisor r10: rewrite_position_deletes merging PURE conversion
    cells inside a mirror's pending window used to rename them past the
    view-neutral skip ('delete-merged-*') and permanently refuse every
    keyed consumer. The merge output now keeps the 'delete-eqconv-'
    provenance prefix, so a checkpointed mirror that DIED before the
    maintenance window still catches up after it."""
    import glob
    import os

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        convert_equality_deletes,
        rewrite_position_deletes,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _src_table(spark, src)

    def run():
        q = mirror_iceberg_table(
            spark, src, dst, on=["id"], checkpoint_dir=ckpt,
            partition_spec=SRC_SPEC,
        )
        q.awaitTermination()

    run()  # mirror checkpoints here, then "crashes"

    # two conversions pile >1 eqconv file into the same cells…
    convert_equality_deletes(spark, src, now_ms=5_000)
    merge_upsert(
        spark, _batch(spark, [(9, 1, "mid", "u", 1)]), src, on=["id"],
        op_col="op", seq_col="seq", partition_spec=SRC_SPEC, now_ms=6_000,
    )
    convert_equality_deletes(spark, src, now_ms=7_000)
    # …and the delete-plane compaction merges them INSIDE the mirror's
    # pending window
    rewrite_position_deletes(spark, src, now_ms=8_000)
    merged = [
        os.path.basename(p)
        for p in glob.glob(os.path.join(src, "deletes", "**", "*.parquet"),
                           recursive=True)
        if "merged" in os.path.basename(p)
    ]
    assert merged and all(
        n.startswith("delete-eqconv-merged-") for n in merged
    ), merged  # pure-conversion cells keep the view-neutral prefix

    merge_upsert(
        spark, _batch(spark, [(11, 2, "post-rpd", "u", 1)]), src,
        on=["id"], op_col="op", seq_col="seq", partition_spec=SRC_SPEC,
        now_ms=9_000,
    )
    run()  # the restarted mirror crosses conversion+rpd and converges
    assert _state(spark, dst) == _state(spark, src)


def test_mirror_restart_behind_gc_horizon_refuses_actionably(spark, tmp_path):
    """Retention tighter than the slowest consumer's lag: a mirror
    restarting BEHIND the tombstone GC horizon must refuse with the
    re-bootstrap message, never silently under-retract."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        convert_equality_deletes,
        expire_snapshots,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _src_table(spark, src)

    def run():
        q = mirror_iceberg_table(
            spark, src, dst, on=["id"], checkpoint_dir=ckpt,
            partition_spec=SRC_SPEC,
        )
        q.awaitTermination()

    run()  # checkpoint at seq 2, then the mirror dies
    for i, ms in ((20, 5_000), (21, 6_000), (22, 7_000)):
        merge_upsert(
            spark, _batch(spark, [(i, 1, f"w{i}", "u", 1),
                                  (i - 19, None, None, "d", 1)]),
            src, on=["id"], op_col="op", seq_col="seq",
            partition_spec=SRC_SPEC, now_ms=ms,
        )
    convert_equality_deletes(spark, src, now_ms=8_000)
    # expire aggressively: the GC horizon climbs past the mirror's
    # checkpointed floor (seq 2)
    expire_snapshots(src, keep_last=2, now_ms=9_000)

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException) as ei:
        run()
    assert "re-bootstrap" in str(ei.value)


def test_mirror_restart_at_horizon_catches_up_exactly(spark, tmp_path):
    """Retention that exactly covers the consumer's lag: the restart
    consumes the whole pending window and converges — the boundary the
    refusal guards is tight, not conservative."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        convert_equality_deletes,
        expire_snapshots,
        read_table_metadata as _rtm,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _src_table(spark, src)

    def run():
        q = mirror_iceberg_table(
            spark, src, dst, on=["id"], checkpoint_dir=ckpt,
            partition_spec=SRC_SPEC,
        )
        q.awaitTermination()

    run()  # checkpoint at seq 2
    for i, ms in ((30, 5_000), (31, 6_000)):
        merge_upsert(
            spark, _batch(spark, [(i, 1, f"w{i}", "u", 1)]),
            src, on=["id"], op_col="op", seq_col="seq",
            partition_spec=SRC_SPEC, now_ms=ms,
        )
    convert_equality_deletes(spark, src, now_ms=7_000)
    # keep_last generous enough that min live seq stays <= the mirror's
    # checkpoint floor (seq 2): horizon at-or-below the lag
    expire_snapshots(src, keep_last=10, now_ms=8_000)
    meta = _rtm(src)["metadata"]
    horizon = min(int(s["sequence-number"]) for s in meta["snapshots"])
    assert horizon <= 2
    run()
    assert _state(spark, dst) == _state(spark, src)


def test_mirror_survives_source_update_where(spark, tmp_path):
    """r12: a row-level UPDATE on the source no longer kills the
    mirror — the iceberg_cdc stream (declared mergeKeys = the mirror's
    `on`) resolves the update's position deletes to keyed retractions,
    and the updated copies arrive as same-commit inserts, so the
    mirror converges without re-bootstrap."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.update import (
        update_where,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _src_table(spark, src)

    def run():
        q = mirror_iceberg_table(
            spark, src, dst, on=["id"], checkpoint_dir=ckpt,
            partition_spec=SRC_SPEC,
        )
        q.awaitTermination()

    run()
    assert _state(spark, dst) == _state(spark, src)

    # source UPDATE (position deletes + updated copies in one snapshot)
    update_where(
        spark, src, "id % 4 = 1", {"val": "concat(val, '!')"},
        now_ms=3_000,
    )
    # plus a key-moving update and a plain delete in later commits
    update_where(spark, src, "id = 2", {"id": "200"}, now_ms=4_000)
    run()  # incremental catch-up across the UPDATE windows
    assert _state(spark, dst) == _state(spark, src)
    got = {r[0]: r[2] for r in _state(spark, dst)}
    assert got[1] == "v1!" and got[5] == "v5!"
    assert 200 in got and 2 not in got


def test_mirror_propagates_source_rename(spark, tmp_path):
    """r12: a source RENAME (metadata-only) propagates to the replica
    by FIELD ID before the next catch-up, so the stream's new-name
    rows merge into the same column instead of forking the replica's
    data model."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        update_table_schema,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _src_table(spark, src)

    def run():
        q = mirror_iceberg_table(
            spark, src, dst, on=["id"], checkpoint_dir=ckpt,
            partition_spec=SRC_SPEC,
        )
        q.awaitTermination()

    run()
    update_table_schema(src, rename={"val": "label"}, now_ms=3_000)
    merge_upsert(
        spark,
        spark.createDataFrame(
            [(1, 0, "post-rename", "u", 1)],
            "id bigint, grp bigint, label string, op string, seq bigint",
        ),
        src, on=["id"], op_col="op", seq_col="seq",
        partition_spec=SRC_SPEC, now_ms=4_000,
    )
    run()  # catch-up propagates the rename, then applies the batch
    got = read_iceberg_table(spark, dst)
    assert "label" in got.columns and "val" not in got.columns

    def st(tdir):
        return {
            (r["id"], r["grp"], r["label"])
            for r in read_iceberg_table(spark, tdir).collect()
        }

    assert st(dst) == st(src)
    assert {r["id"]: r["label"] for r in got.collect()}[1] == "post-rename"


def test_mirror_refuses_foreign_destination(spark, tmp_path):
    """r13 replica-lineage guard: a pre-existing destination the
    mirror did not create (no `engine.mirror-source` stamp, or a
    different source's table uuid) refuses actionably — its field ids
    need not correspond to the source's, so rename propagation and
    keyed merges could silently mis-map. A legitimate replica (stamped
    at creation) keeps working, including after a restart."""
    src = str(tmp_path / "src")
    src2 = str(tmp_path / "src2")
    dst = str(tmp_path / "dst")
    foreign = str(tmp_path / "foreign")
    ckpt = str(tmp_path / "ckpt")
    ckpt2 = str(tmp_path / "ckpt2")
    _src_table(spark, src)
    # a hand-built table with the same column NAMES but its own ids
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(99, 0, "own")], "id bigint, grp bigint, val string"
        ),
        foreign, now_ms=1_000, partition_spec=SRC_SPEC,
    )
    with pytest.raises(ValueError, match="engine.mirror-source"):
        mirror_iceberg_table(
            spark, src, foreign, on=["id"], checkpoint_dir=ckpt2,
            partition_spec=SRC_SPEC,
        )
    # a replica of a DIFFERENT source refuses too
    _src_table(spark, src2)
    q = mirror_iceberg_table(
        spark, src2, dst, on=["id"], checkpoint_dir=ckpt2,
        partition_spec=SRC_SPEC,
    )
    q.awaitTermination()
    with pytest.raises(ValueError, match="engine.mirror-source"):
        mirror_iceberg_table(
            spark, src, dst, on=["id"], checkpoint_dir=ckpt,
            partition_spec=SRC_SPEC,
        )
    # the legitimate replica is stamped and keeps catching up
    meta = read_table_metadata(dst)["metadata"]
    assert "engine.mirror-source" in (meta.get("properties") or {})
    q = mirror_iceberg_table(
        spark, src2, dst, on=["id"], checkpoint_dir=ckpt2,
        partition_spec=SRC_SPEC,
    )
    q.awaitTermination()
    assert _state(spark, dst) == _state(spark, src2)


def test_mirror_adopts_prestamp_replica_verified(spark, tmp_path):
    """r13: a replica created BEFORE lineage stamping (simulated by
    stripping the property) refuses by default with the adoption
    recipe, and `adopt_destination=True` performs a one-time VERIFIED
    back-stamp (same dotted path for every common field id) instead of
    forcing a 100 TB re-sync; afterwards plain catch-ups work again."""
    import json
    import os

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _src_table(spark, src)
    q = mirror_iceberg_table(
        spark, src, dst, on=["id"], checkpoint_dir=ckpt,
        partition_spec=SRC_SPEC,
    )
    q.awaitTermination()
    # simulate a pre-stamp replica: strip the lineage property
    hint = os.path.join(dst, "metadata", "version-hint.text")
    with open(hint) as fh:
        v = int(fh.read().strip())
    mpath = os.path.join(dst, "metadata", f"v{v}.metadata.json")
    with open(mpath) as fh:
        meta = json.load(fh)
    meta["properties"].pop("engine.mirror-source", None)
    with open(mpath, "w") as fh:
        json.dump(meta, fh)
    merge_upsert(
        spark, _batch(spark, [(1, 1, "post", "u", 1)]), src,
        on=["id"], op_col="op", seq_col="seq",
        partition_spec=SRC_SPEC, now_ms=3_000,
    )
    with pytest.raises(ValueError, match="adopt_destination"):
        mirror_iceberg_table(
            spark, src, dst, on=["id"], checkpoint_dir=ckpt,
            partition_spec=SRC_SPEC,
        )
    q = mirror_iceberg_table(
        spark, src, dst, on=["id"], checkpoint_dir=ckpt,
        partition_spec=SRC_SPEC, adopt_destination=True,
    )
    q.awaitTermination()
    assert _state(spark, dst) == _state(spark, src)
    # the stamp is durable: the next catch-up needs no flag
    q = mirror_iceberg_table(
        spark, src, dst, on=["id"], checkpoint_dir=ckpt,
        partition_spec=SRC_SPEC,
    )
    q.awaitTermination()


def test_streams_cross_top_level_drop(spark, tmp_path):
    """r13 (found by review): a plain DROP must not wedge streams on
    pre-drop files — the dropped column skips losslessly (the current
    table does not serve it either); truly unknown columns still fail
    toward a restart."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        update_table_schema,
        write_iceberg_table,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
        register,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        run_stream_to_memory,
    )

    t = str(tmp_path / "t")
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(1, 10, "x")], "id bigint, v bigint, junk string"
        ),
        t, now_ms=1_000,
    )
    update_table_schema(t, drop=["junk"], now_ms=2_000)
    write_iceberg_table(
        spark,
        spark.createDataFrame([(2, 20)], "id bigint, v bigint"),
        t, now_ms=3_000,
    )
    register(spark)
    inc = run_stream_to_memory(
        spark.readStream.format("iceberg_inc").option("path", t).load(),
        "append",
    )
    assert sorted((r["id"], r["v"]) for r in inc.collect()) == [
        (1, 10), (2, 20),
    ]
    assert "junk" not in inc.columns


def test_streams_cross_nested_drop_after_rename(spark, tmp_path):
    """r13 (found by review): a nested field dropped after a rename in
    the same struct — the conform plan's dropped-names set lets the
    pre-drop files' extra child skip instead of wedging the stream."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        update_table_schema,
        write_iceberg_table,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
        register,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        run_stream_to_memory,
    )

    t = str(tmp_path / "t")
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(1, (10, "a"))], "id bigint, env struct<a:bigint, b:string>"
        ),
        t, now_ms=1_000,
    )
    update_table_schema(t, rename={"env.a": "a2"}, now_ms=2_000)
    update_table_schema(t, drop=["env.b"], now_ms=3_000)
    register(spark)
    inc = run_stream_to_memory(
        spark.readStream.format("iceberg_inc").option("path", t).load(),
        "append",
    )
    rows = [(r["id"], r["env"]["a2"]) for r in inc.collect()]
    assert rows == [(1, 10)]


def test_concurrent_mirrors_one_session_unique_query_names(spark, tmp_path):
    """Two mirrors of two DIFFERENT tables in ONE session must coexist:
    the default queryName is derived per start (checkpoint hash +
    counter), because Spark registers stream names session-globally and
    a fixed shared default throws `query with that name is already
    active` at the second .start() — exactly what a multi-table session
    (or the 8-thread driver gate) does. Start BOTH before awaiting
    either so the overlap is guaranteed, not scheduler-dependent."""
    src_a, src_b = str(tmp_path / "srcA"), str(tmp_path / "srcB")
    _src_table(spark, src_a)
    _src_table(spark, src_b)
    qa = mirror_iceberg_table(
        spark, src_a, str(tmp_path / "dstA"), on=["id"],
        checkpoint_dir=str(tmp_path / "ckptA"), partition_spec=SRC_SPEC,
    )
    qb = mirror_iceberg_table(
        spark, src_b, str(tmp_path / "dstB"), on=["id"],
        checkpoint_dir=str(tmp_path / "ckptB"), partition_spec=SRC_SPEC,
    )
    assert qa.name != qb.name
    assert qa.name.startswith("iceberg_mirror-")
    qa.awaitTermination()
    qb.awaitTermination()
    assert _state(spark, str(tmp_path / "dstA")) == _state(spark, src_a)
    assert _state(spark, str(tmp_path / "dstB")) == _state(spark, src_b)


def test_mirror_fresh_checkpoint_onto_existing_replica_converges(
    spark, tmp_path
):
    """LOST-CHECKPOINT recovery: re-pointing a mirror with a FRESH
    checkpoint at an EXISTING replica replays the source changelog
    from the beginning under a new app id. The keyed merge plane makes
    the replay idempotent — every batch re-applies by (key, seq) in
    commit order, so the replica converges back to exactly the source
    state with no duplicate keys — the documented
    'duplicates never silent loss' posture of the envelope sink
    tightens to 'neither' for keyed replication. The lineage stamp
    admits the destination (same source uuid), so no re-bootstrap is
    forced."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _src_table(spark, src)

    q = mirror_iceberg_table(
        spark, src, dst, on=["id"],
        checkpoint_dir=str(tmp_path / "ckpt1"), partition_spec=SRC_SPEC,
    )
    q.awaitTermination()
    assert _state(spark, dst) == _state(spark, src)

    # source moves on; the original checkpoint is lost
    merge_upsert(
        spark,
        _batch(spark, [(7, 2, "v7b", "u", 1), (1, None, None, "d", 1)]),
        src, on=["id"], op_col="op", seq_col="seq",
        partition_spec=SRC_SPEC, now_ms=3_000,
    )
    q2 = mirror_iceberg_table(
        spark, src, dst, on=["id"],
        checkpoint_dir=str(tmp_path / "ckpt2"),  # fresh -> full replay
        partition_spec=SRC_SPEC,
    )
    q2.awaitTermination()
    rows = read_iceberg_table(spark, dst).collect()
    assert len(rows) == len({r["id"] for r in rows})  # no dup keys
    assert _state(spark, dst) == _state(spark, src)
