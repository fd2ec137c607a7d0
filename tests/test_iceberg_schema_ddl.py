"""Explicit schema DDL (`commit.update_table_schema`, r11): the
operations evolution-on-write never infers — add / drop /
make-optional / promote as one metadata-only commit — plus the
name-resolution guards. Since r12 reads resolve by (naming epoch,
field id) — schema.py "naming epochs" — so explicit re-adds of
dropped names are legal (the epoch bump keeps pre-drop values
unreachable); implicit evolution-on-write re-adds stay refused as a
stale-writer footgun. RENAME itself is covered by
test_iceberg_rename.py.
"""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    convert_equality_deletes,
    merge_upsert,
    read_iceberg_table,
    read_iceberg_table_at,
    read_table_metadata,
    update_table_schema,
    write_iceberg_table,
)

SPEC = [("id_bucket", "bucket[4]", "id")]


def _mkdir() -> str:
    return tempfile.mkdtemp(prefix="iceberg-ddl-")


def _table(spark, tdir: str, n: int = 8):
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(n)],
        "id bigint, grp bigint, val string",
    )
    return write_iceberg_table(
        spark, df, tdir, now_ms=1_000, partition_spec=SPEC
    )


def test_ddl_add_column_then_write(spark):
    tdir = _mkdir()
    _table(spark, tdir)
    meta = update_table_schema(tdir, add=[("score", "double")], now_ms=2_000)
    assert len(meta["schemas"]) == 2
    f = next(x for x in meta["schemas"][-1]["fields"] if x["name"] == "score")
    assert f["required"] is False and f["type"] == "double"
    assert f["id"] == meta["last-column-id"]
    # metadata-only: no snapshot was added
    assert len(meta["snapshots"]) == 1
    # existing rows read null; a later append carries values
    got = read_iceberg_table(spark, tdir)
    assert "score" in got.columns
    assert got.where(F.col("score").isNotNull()).count() == 0
    df = spark.createDataFrame(
        [(100, 0, "new", 2.5)],
        "id bigint, grp bigint, val string, score double",
    )
    write_iceberg_table(spark, df, tdir, now_ms=3_000, partition_spec=SPEC)
    vals = {
        r["id"]: r["score"] for r in read_iceberg_table(spark, tdir).collect()
    }
    assert vals[100] == 2.5 and vals[1] is None


def test_ddl_add_with_spark_datatype(spark):
    from pyspark.sql.types import ArrayType, FloatType

    tdir = _mkdir()
    _table(spark, tdir)
    meta = update_table_schema(
        tdir, add=[("emb", ArrayType(FloatType()))], now_ms=2_000
    )
    f = next(x for x in meta["schemas"][-1]["fields"] if x["name"] == "emb")
    assert f["type"]["type"] == "list" and f["type"]["element"] == "float"


def test_ddl_drop_column_and_time_travel(spark):
    tdir = _mkdir()
    m0 = _table(spark, tdir)
    snap0 = m0["snapshots"][-1]["snapshot-id"]
    meta = update_table_schema(tdir, drop=["val"], now_ms=2_000)
    assert [f["name"] for f in meta["schemas"][-1]["fields"]] == ["id", "grp"]
    cur = read_iceberg_table(spark, tdir)
    assert "val" not in cur.columns
    assert cur.count() == 8
    # time travel reads the snapshot's OWN schema version: val is back
    old = read_iceberg_table_at(spark, tdir, snapshot_id=snap0)
    assert "val" in old.columns
    assert {r["val"] for r in old.collect()} == {f"v{i}" for i in range(8)}


def test_ddl_drop_rejects_partition_source(spark):
    tdir = _mkdir()
    _table(spark, tdir)
    with pytest.raises(ValueError, match="partition source"):
        update_table_schema(tdir, drop=["id"])


def test_ddl_drop_rejects_sort_order_column(spark):
    tdir = _mkdir()
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(8)],
        "id bigint, grp bigint, val string",
    )
    write_iceberg_table(
        spark, df, tdir, now_ms=1_000, partition_spec=SPEC, sort_by=["grp"]
    )
    with pytest.raises(ValueError, match="sort-order"):
        update_table_schema(tdir, drop=["grp"])


def test_ddl_drop_rejects_live_equality_delete_key_then_allows(spark):
    tdir = _mkdir()
    _table(spark, tdir)
    # a merge keyed on (id, grp) leaves live eq-delete files keying grp
    df = spark.createDataFrame(
        [(1, 1, "upd")], "id bigint, grp bigint, val string"
    )
    merge_upsert(
        spark, df, tdir, on=["id", "grp"], partition_spec=SPEC, now_ms=2_000
    )
    with pytest.raises(ValueError, match="equality-delete"):
        update_table_schema(tdir, drop=["grp"])
    # retire the equality plane, then the drop is legal
    convert_equality_deletes(spark, tdir, now_ms=3_000)
    meta = update_table_schema(tdir, drop=["grp"], now_ms=4_000)
    assert "grp" not in [f["name"] for f in meta["schemas"][-1]["fields"]]
    got = {r["id"]: r["val"] for r in read_iceberg_table(spark, tdir).collect()}
    assert got[1] == "upd" and len(got) == 8  # retraction still applied


def test_ddl_readd_dropped_name_explicit_ok_implicit_rejected(spark):
    """r12: an EXPLICIT DDL re-add of a dropped name is legal — reads
    resolve by (naming epoch, field id), so the dropped column's
    physical values stay unreachable and the new column reads as null
    from pre-add files. Evolution-on-WRITE re-introducing the name
    stays refused (stale-writer footgun)."""
    tdir = _mkdir()
    _table(spark, tdir)
    update_table_schema(tdir, drop=["val"], now_ms=2_000)
    # evolution-on-append re-introducing it: still refused
    df = spark.createDataFrame(
        [(100, 0, "zombie")], "id bigint, grp bigint, val string"
    )
    with pytest.raises(ValueError, match="re-introduces dropped"):
        write_iceberg_table(
            spark, df, tdir, now_ms=3_000, partition_spec=SPEC
        )
    # evolution-through-merge too
    with pytest.raises(ValueError, match="re-introduces dropped"):
        merge_upsert(
            spark, df, tdir, on=["id"], partition_spec=SPEC, now_ms=3_000
        )
    # explicit DDL re-add: allowed, bumps the naming epoch, and the
    # pre-drop files' physical 'val' values never resurrect
    meta = update_table_schema(tdir, add=[("val", "string")], now_ms=4_000)
    assert meta["properties"]["engine.naming-epoch"] == "1"
    got = read_iceberg_table(spark, tdir)
    assert got.where(F.col("val").isNotNull()).count() == 0
    # new appends under the re-added name round-trip
    write_iceberg_table(spark, df, tdir, now_ms=5_000, partition_spec=SPEC)
    vals = {
        r["id"]: r["val"] for r in read_iceberg_table(spark, tdir).collect()
    }
    assert vals[100] == "zombie"
    assert all(v is None for k, v in vals.items() if k != 100)


def test_ddl_make_optional_enables_null_conform_merge(spark):
    tdir = _mkdir()
    base = spark.range(6).selectExpr(  # non-null id AND grp2 -> required
        "id", "id as grp2", "string(id) as val"
    )
    write_iceberg_table(spark, base, tdir, now_ms=1_000, partition_spec=SPEC)
    batch = spark.range(1).selectExpr("id", "string('z') as val")
    with pytest.raises(ValueError, match="REQUIRED"):
        merge_upsert(spark, batch, tdir, on=["id"], partition_spec=SPEC)
    meta = update_table_schema(tdir, make_optional=["grp2"], now_ms=2_000)
    f = next(x for x in meta["schemas"][-1]["fields"] if x["name"] == "grp2")
    assert f["required"] is False
    merge_upsert(
        spark, batch, tdir, on=["id"], partition_spec=SPEC, now_ms=3_000
    )
    got = {
        r["id"]: (r["grp2"], r["val"])
        for r in read_iceberg_table(spark, tdir).collect()
    }
    assert got[0] == (None, "z")


def test_ddl_promote_and_guards(spark):
    tdir = _mkdir()
    df = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(6)],
        "id bigint, grp int, cnt int",
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000, partition_spec=SPEC)
    meta = update_table_schema(tdir, promote={"cnt": "long"}, now_ms=2_000)
    f = next(x for x in meta["schemas"][-1]["fields"] if x["name"] == "cnt")
    assert f["type"] == "long"
    assert read_iceberg_table(spark, tdir).where("cnt = 30").count() == 1
    with pytest.raises(ValueError, match="illegal promotion"):
        update_table_schema(tdir, promote={"grp": "string"})
    # identity partition source promotion rejected
    tdir2 = _mkdir()
    write_iceberg_table(
        spark, df, tdir2, now_ms=1_000,
        partition_spec=[("grp", "identity", None)],
    )
    with pytest.raises(ValueError, match="partition source"):
        update_table_schema(tdir2, promote={"grp": "long"})


def test_ddl_noop_and_unknown_column(spark):
    tdir = _mkdir()
    m0 = _table(spark, tdir)
    assert update_table_schema(tdir) == m0
    with pytest.raises(ValueError, match="not in the current schema"):
        update_table_schema(tdir, drop=["ghost"])
    # make_optional on an already-optional column: no version churn
    m1 = update_table_schema(tdir, make_optional=["val"], now_ms=2_000)
    assert len(m1["schemas"]) == len(m0["schemas"])


def test_ddl_catalog_mode_roundtrip(spark):
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        FakeRestCatalogServer,
        RestCatalogClient,
    )

    tdir = _mkdir()
    with FakeRestCatalogServer() as server:
        cat = RestCatalogClient(server.base_url)
        df = spark.createDataFrame(
            [(i, i % 3, f"v{i}") for i in range(6)],
            "id bigint, grp bigint, val string",
        )
        write_iceberg_table(
            spark, df, tdir, now_ms=1_000, partition_spec=SPEC,
            catalog=cat, table_name="t",
        )
        meta = update_table_schema(
            tdir, add=[("score", "double")], drop=["val"],
            now_ms=2_000, catalog=cat, table_name="t",
        )
        names = [f["name"] for f in meta["schemas"][-1]["fields"]]
        assert names == ["id", "grp", "score"]
        got = read_iceberg_table(spark, tdir, catalog=cat, table_name="t")
        assert sorted(got.columns) == ["grp", "id", "score"]
        assert got.count() == 6


def test_schema_walker_agreement_across_planes(spark):
    """DIFFERENTIAL guard over the engine's five schema-tree walkers
    (name-mapping emitter, DDL dup-check, epoch names, name history,
    mirror id->path map). They deliberately differ by POLICY — map
    keys appear in name history and name-mapping but are excluded
    from the rename-propagation path map (map-key renames refuse);
    containers use Appendix C ``element``/``key``/``value`` nodes in
    the mapping but dotted pseudo-segments in paths — yet on the
    facts they share they must NEVER drift. Pin those invariants on a
    table evolved through nested + container renames, a drop, and a
    re-add (every walker's hardest inputs):

    1. every live id resolves to the SAME leaf name in
       `_walk_schema_ids` (mirror plane) and `_walk_named_fields`
       (epoch plane);
    2. `epoch_id_names` at the CURRENT epoch serves exactly the
       current name for every live id;
    3. the name-mapping property holds EVERY live id, lists every
       name the id ever bound (oldest first), and ends on the
       current name;
    4. `historical_level_names` contains each struct level's current
       names, plus the dropped/renamed-away ones the stream
       drop-skip depends on."""
    import json

    from tiered_storage_for_apache_kafka_spark.sources.iceberg.schema import (
        _walk_named_fields,
        epoch_id_names,
        historical_level_names,
        naming_log,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        _walk_schema_ids,
    )

    tdir = _mkdir()
    df = spark.createDataFrame(
        [(1, (10, "a"), [(1, 2)], {"k": (5,)})],
        "id bigint, env struct<amount: bigint, note: string>, "
        "arr array<struct<x: bigint, y: bigint>>, "
        "mp map<string, struct<p: bigint>>",
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    update_table_schema(
        tdir,
        rename={
            "env": "envelope", "env.amount": "amt",
            "arr.element.x": "xx", "mp.value.p": "pp",
        },
        now_ms=2_000,
    )
    update_table_schema(tdir, drop=["envelope.note"], now_ms=3_000)
    update_table_schema(
        tdir, add=[("note", "string")],
        rename={"envelope.amt": "amount2"},
        now_ms=4_000,
    )
    meta = read_table_metadata(tdir)["metadata"]
    cur = next(
        s for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
    )

    by_id_names: dict = {}
    _walk_named_fields(cur["fields"], by_id_names)
    by_id_paths = _walk_schema_ids(cur["fields"])

    # (1) leaf names agree wherever both walkers cover an id (the
    # path map skips map-KEY subtrees by policy — renames refuse there)
    for fid, (path, leaf, _t) in by_id_paths.items():
        assert by_id_names[fid] == leaf, (fid, path)
        assert path.split(".")[-1] == leaf

    # (2) the current epoch serves exactly the current names
    cur_epoch = max((e for e, _ in naming_log(meta)), default=0)
    epoch_names = epoch_id_names(meta, cur_epoch)
    for fid, name in by_id_names.items():
        assert epoch_names.get(fid) == name, (fid, name)

    # (3) name-mapping: every live id present; names oldest-first,
    # current name LAST; renamed ids still list their old names
    mapping = json.loads(
        meta["properties"]["schema.name-mapping.default"]
    )
    flat: dict = {}

    def index(nodes):
        for n in nodes:
            flat[n["field-id"]] = n["names"]
            index(n.get("fields", []))

    index(mapping)
    for fid, name in by_id_names.items():
        assert fid in flat, (fid, name)
        assert flat[fid][-1] == name, (fid, flat[fid], name)
    renamed_old = {"env", "amount", "x", "p", "amt"}
    listed = {n for names in flat.values() for n in names}
    assert renamed_old <= listed

    # (4) per-level history covers current names plus renamed-away
    # and dropped ones (the stream drop-skip contract)
    hist = historical_level_names(meta)
    assert {"id", "envelope", "arr", "mp", "note", "env"} <= hist["__top__"]
    env_id = next(
        fid for fid, nm in by_id_names.items() if nm == "envelope"
    )
    assert {"amount2", "amt", "amount", "note"} <= hist[env_id]
