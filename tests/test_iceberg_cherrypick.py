"""cherry_pick_snapshot (`sources/iceberg/refs.py`, r12): the WAP
resolution fast_forward refuses when main moved under a staged branch —
re-commit a staged APPEND's added files onto the current head as a new
snapshot, manifests rewritten at the new sequence number so deletes
committed between staging and pick never retro-apply.
"""

from __future__ import annotations

import tempfile

import pytest

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    cherry_pick_snapshot,
    commit_position_deletes,
    fast_forward,
    merge_upsert,
    read_iceberg_table,
    read_table_metadata,
    write_iceberg_table,
)

SPEC = [("id_bucket", "bucket[4]", "id")]


def _mkdir() -> str:
    return tempfile.mkdtemp(prefix="iceberg-cherrypick-")


def _write(spark, tdir, rows, ms, branch=None):
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    return write_iceberg_table(
        spark, df, tdir, now_ms=ms, partition_spec=SPEC, branch=branch
    )


def _vals(spark, tdir):
    return {
        r["id"]: r["v"] for r in read_iceberg_table(spark, tdir).collect()
    }


def test_cherry_pick_diverged_staged_append(spark):
    tdir = _mkdir()
    _write(spark, tdir, [(1, 10)], 1_000)
    m = _write(spark, tdir, [(2, 20)], 2_000, branch="audit")
    staged = (read_table_metadata(tdir)["metadata"].get("refs") or {})[
        "audit"
    ]["snapshot-id"]
    del m
    # main moves independently -> the branch is divergent
    _write(spark, tdir, [(3, 30)], 3_000)
    with pytest.raises(ValueError, match="not an ancestor"):
        fast_forward(tdir, "audit")
    meta = cherry_pick_snapshot(tdir, staged, now_ms=4_000)
    assert _vals(spark, tdir) == {1: 10, 2: 20, 3: 30}
    snap = meta["snapshots"][-1]
    assert snap["summary"]["cherry-pick-snapshot-id"] == str(staged)
    assert snap["summary"]["operation"] == "append"
    # staged lineage untouched; new snapshot chains off the MOVED head
    assert (meta.get("refs") or {})["audit"]["snapshot-id"] == staged
    assert snap["parent-snapshot-id"] != staged


def test_cherry_pick_rewrites_sequence_numbers(spark):
    """A delete committed AFTER staging must not retro-apply to the
    picked rows: the rewritten manifests carry the NEW sequence
    number, above the delete's."""
    tdir = _mkdir()
    _write(spark, tdir, [(1, 10), (2, 20)], 1_000)
    _write(spark, tdir, [(5, 50)], 2_000, branch="audit")  # seq 2
    staged = (read_table_metadata(tdir)["metadata"].get("refs") or {})[
        "audit"
    ]["snapshot-id"]
    # position delete on main at a HIGHER seq than the staged append
    commit_position_deletes(spark, tdir, "id = 1", now_ms=3_000)  # seq 3
    meta = cherry_pick_snapshot(tdir, staged, now_ms=4_000)  # seq 4
    # id=5 survives: its picked data seq (4) is above the delete's (3)
    assert _vals(spark, tdir) == {2: 20, 5: 50}
    snap = meta["snapshots"][-1]
    assert int(snap["sequence-number"]) == 4


def test_cherry_pick_guards(spark):
    tdir = _mkdir()
    _write(spark, tdir, [(1, 10)], 1_000)
    # non-append refuses
    merge_upsert(
        spark,
        spark.createDataFrame([(1, 99)], "id bigint, v bigint"),
        tdir, on=["id"], partition_spec=SPEC, now_ms=2_000,
    )
    merge_snap = read_table_metadata(tdir)["metadata"][
        "current-snapshot-id"
    ]
    _write(spark, tdir, [(7, 70)], 3_000)
    with pytest.raises(ValueError, match="APPEND"):
        cherry_pick_snapshot(tdir, merge_snap)
    with pytest.raises(ValueError, match="not found"):
        cherry_pick_snapshot(tdir, 999_999)
    # picking the current head is a no-op
    head = read_table_metadata(tdir)["metadata"]["current-snapshot-id"]
    before = read_table_metadata(tdir)["metadata"]
    assert cherry_pick_snapshot(tdir, head) == before


def test_cherry_pick_catalog_mode(spark):
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    tdir = _mkdir()
    with FakeRestCatalogServer() as server:
        cat = RestCatalogClient(server.base_url)
        kw = {"catalog": cat, "table_name": "t"}
        df = spark.createDataFrame([(1, 10)], "id bigint, v bigint")
        write_iceberg_table(
            spark, df, tdir, now_ms=1_000, partition_spec=SPEC, **kw
        )
        write_iceberg_table(
            spark,
            spark.createDataFrame([(2, 20)], "id bigint, v bigint"),
            tdir, now_ms=2_000, partition_spec=SPEC, branch="audit", **kw
        )
        meta = read_table_metadata(tdir)["metadata"]
        staged = meta["refs"]["audit"]["snapshot-id"]
        write_iceberg_table(
            spark,
            spark.createDataFrame([(3, 30)], "id bigint, v bigint"),
            tdir, now_ms=3_000, partition_spec=SPEC, **kw
        )
        m2 = cherry_pick_snapshot(tdir, staged, now_ms=4_000, **kw)
        assert m2["current-snapshot-id"] == m2["snapshots"][-1]["snapshot-id"]
        got = {
            r["id"]: r["v"]
            for r in read_iceberg_table(
                spark, tdir, catalog=cat, table_name="t"
            ).collect()
        }
        assert got == {1: 10, 2: 20, 3: 30}
