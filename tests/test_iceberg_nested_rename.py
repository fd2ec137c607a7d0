"""NESTED-field RENAME COLUMN (r13) — the naming-epoch machinery one
level (and N levels) down.

r12 made top-level RENAME a metadata-only commit resolved per file by
(naming epoch, field id); real Iceberg's `SchemaUpdate.renameColumn`
(the machinery the reference inherits, `SchemaUpdate.java:17-127`)
renames NESTED struct fields the same way — and this engine's own
envelope schema (`kafka.*`, a 13-field struct) makes nested DDL the
likely first touch. These tests pin the extension: dotted-path DDL,
per-epoch nested re-alias on read, time travel, compaction across it,
mutation verbs, streams, the mirror, the guards (list/map paths,
ancestor drop, sibling dupes), nested name-mapping, and the nested
re-add guard for evolution-on-write.
"""

from __future__ import annotations

import json
import tempfile

import pytest

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
    resolve_field_path,
)
from tiered_storage_for_apache_kafka_spark.sources.iceberg.update import (
    update_where,
)


def _mkdir() -> str:
    return tempfile.mkdtemp(prefix="iceberg-nested-rename-")


def _table(spark, tdir: str, n: int = 4):
    """id + a 2-field kafka struct (the envelope shape, reduced)."""
    df = spark.createDataFrame(
        [(i, (f"t{i}", i * 10)) for i in range(n)],
        "id bigint, kafka struct<topic:string, ts:bigint>",
    )
    return write_iceberg_table(spark, df, tdir, now_ms=1_000)


def test_nested_rename_resolves_old_and_new_files(spark):
    tdir = _mkdir()
    _table(spark, tdir)
    meta = update_table_schema(
        tdir, rename={"kafka.ts": "event_ts"}, now_ms=2_000
    )
    assert meta["properties"]["engine.naming-epoch"] == "1"
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(9, ("new", 900))],
            "id bigint, kafka struct<topic:string, event_ts:bigint>",
        ),
        tdir, now_ms=3_000,
    )
    out = read_iceberg_table(spark, tdir)
    assert out.schema["kafka"].dataType.fieldNames() == [
        "topic", "event_ts",
    ]
    got = {r["id"]: r["kafka"]["event_ts"] for r in out.collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 30, 9: 900}
    epochs = {file_naming_epoch(d["file_path"]) for d in plan_scan(tdir)}
    assert epochs == {0, 1}


def test_nested_rename_null_structs_stay_null(spark):
    """The per-epoch struct rebuild must not manufacture non-null
    structs of nulls for rows whose struct value is NULL."""
    tdir = _mkdir()
    df = spark.createDataFrame(
        [(1, ("a", 10)), (2, None)],
        "id bigint, kafka struct<topic:string, ts:bigint>",
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    update_table_schema(tdir, rename={"kafka.ts": "event_ts"}, now_ms=2_000)
    rows = {r["id"]: r["kafka"] for r in read_iceberg_table(spark, tdir).collect()}
    assert rows[2] is None
    assert rows[1]["event_ts"] == 10


def test_time_travel_sees_snapshot_nested_names(spark):
    tdir = _mkdir()
    meta = _table(spark, tdir, n=2)
    snap1 = meta["current-snapshot-id"]
    update_table_schema(tdir, rename={"kafka.ts": "event_ts"}, now_ms=2_000)
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(9, ("z", 90))],
            "id bigint, kafka struct<topic:string, event_ts:bigint>",
        ),
        tdir, now_ms=3_000,
    )
    old = read_iceberg_table_at(spark, tdir, snapshot_id=snap1)
    assert old.schema["kafka"].dataType.fieldNames() == ["topic", "ts"]
    assert {r["kafka"]["ts"] for r in old.collect()} == {0, 10}
    cur = read_iceberg_table(spark, tdir)
    assert cur.schema["kafka"].dataType.fieldNames() == [
        "topic", "event_ts",
    ]


def test_deep_and_combined_renames(spark):
    """A struct-in-struct leaf renames by dotted path; a top-level
    rename of the ancestor composes in the SAME DDL (nested renames
    apply by leaf field id, so order cannot matter)."""
    tdir = _mkdir()
    df = spark.createDataFrame(
        [(1, ((1_000, "eu"), "k1")), (2, ((2_000, "us"), "k2"))],
        "id bigint, env struct<meta:struct<ts:bigint, region:string>, "
        "key:string>",
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    update_table_schema(
        tdir,
        rename={"env": "envelope", "env.meta.ts": "event_ts"},
        now_ms=2_000,
    )
    out = read_iceberg_table(spark, tdir)
    assert out.columns == ["id", "envelope"]
    assert out.schema["envelope"].dataType["meta"].dataType.fieldNames() == [
        "event_ts", "region",
    ]
    got = {
        r["id"]: r["envelope"]["meta"]["event_ts"] for r in out.collect()
    }
    assert got == {1: 1_000, 2: 2_000}
    # chain a second nested rename under the NEW ancestor name
    update_table_schema(
        tdir, rename={"envelope.meta.region": "zone"}, now_ms=3_000
    )
    out2 = read_iceberg_table(spark, tdir)
    assert {
        r["id"]: r["envelope"]["meta"]["zone"] for r in out2.collect()
    } == {1: "eu", 2: "us"}


def test_nested_swap_renames(spark):
    """Sibling-name SWAP inside one struct across two DDLs: values must
    follow field ids, never names."""
    tdir = _mkdir()
    df = spark.createDataFrame(
        [(1, (10, 20))], "id bigint, s struct<a:bigint, b:bigint>"
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    update_table_schema(tdir, rename={"s.a": "tmp"}, now_ms=2_000)
    update_table_schema(
        tdir, rename={"s.b": "a", "s.tmp": "b"}, now_ms=3_000
    )
    r = read_iceberg_table(spark, tdir).collect()[0]
    assert r["s"]["b"] == 10 and r["s"]["a"] == 20  # swapped by id


def test_compaction_across_nested_rename(spark):
    tdir = _mkdir()
    _table(spark, tdir)
    update_table_schema(tdir, rename={"kafka.ts": "event_ts"}, now_ms=2_000)
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(9, ("z", 90))],
            "id bigint, kafka struct<topic:string, event_ts:bigint>",
        ),
        tdir, now_ms=3_000,
    )
    rewrite_data_files(spark, tdir, now_ms=4_000)
    out = read_iceberg_table(spark, tdir)
    got = {r["id"]: r["kafka"]["event_ts"] for r in out.collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 30, 9: 90}
    # compacted files are epoch-current: written under the new names
    epochs = {file_naming_epoch(d["file_path"]) for d in plan_scan(tdir)}
    assert epochs == {1}


def test_mutations_on_nested_renamed_table(spark):
    """update_where and merge_upsert read matched files through the
    epoch machinery, so pre-rename files mutate correctly."""
    tdir = _mkdir()
    _table(spark, tdir)
    update_table_schema(tdir, rename={"kafka.ts": "event_ts"}, now_ms=2_000)
    update_where(spark, tdir, "id = 2", {"id": "200"}, now_ms=3_000)
    got = {r["id"]: r["kafka"]["event_ts"] for r in
           read_iceberg_table(spark, tdir).collect()}
    assert got == {0: 0, 1: 10, 200: 20, 3: 30}
    merge_upsert(
        spark,
        spark.createDataFrame(
            [(3, ("m", 333))],
            "id bigint, kafka struct<topic:string, event_ts:bigint>",
        ),
        tdir, on=["id"], now_ms=4_000,
    )
    got = {r["id"]: r["kafka"]["event_ts"] for r in
           read_iceberg_table(spark, tdir).collect()}
    assert got == {0: 0, 1: 10, 200: 20, 3: 333}


def test_nested_rename_guards(spark):
    tdir = _mkdir()
    df = spark.createDataFrame(
        [(1, ("a", 10), [(1, 2)], {"k": (3, 4)})],
        "id bigint, kafka struct<topic:string, ts:bigint>, "
        "arr array<struct<x:bigint, y:bigint>>, "
        "mp map<string, struct<p:bigint, q:bigint>>",
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    # containers need their canonical pseudo-segments (r13 supports
    # the renames; the bare path gets the recipe)
    with pytest.raises(ValueError, match="'.element.'"):
        update_table_schema(tdir, rename={"arr.x": "z"}, now_ms=2_000)
    with pytest.raises(ValueError, match="'.value.'"):
        update_table_schema(tdir, rename={"mp.p": "z"}, now_ms=2_000)
    with pytest.raises(ValueError, match="immutable identity"):
        update_table_schema(tdir, rename={"mp.key.q": "z"}, now_ms=2_000)
    with pytest.raises(ValueError, match="pseudo-segment"):
        update_table_schema(
            tdir, rename={"arr.element": "z"}, now_ms=2_000
        )
    with pytest.raises(KeyError, match="no field"):
        update_table_schema(tdir, rename={"kafka.nope": "z"}, now_ms=2_000)
    with pytest.raises(ValueError, match="bare field name"):
        update_table_schema(
            tdir, rename={"kafka.ts": "other.ts"}, now_ms=2_000
        )
    with pytest.raises(ValueError, match="ancestor"):
        update_table_schema(
            tdir, rename={"kafka.ts": "t2"}, drop=["kafka"], now_ms=2_000
        )
    with pytest.raises(ValueError, match="duplicate"):
        update_table_schema(
            tdir, rename={"kafka.ts": "topic"}, now_ms=2_000
        )
    # renaming a nested field to its own name is a metadata no-op:
    # no epoch bump, no new schema version
    meta = update_table_schema(
        tdir, rename={"kafka.ts": "ts"}, now_ms=2_000
    )
    assert "engine.naming-epoch" not in (meta.get("properties") or {})


def test_nested_name_mapping_recurses(spark):
    tdir = _mkdir()
    _table(spark, tdir)
    meta = update_table_schema(
        tdir, rename={"kafka.ts": "event_ts"}, now_ms=2_000
    )
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    kafka = next(e for e in nm if "kafka" in e["names"])
    ts = next(e for e in kafka["fields"] if "ts" in e["names"])
    assert ts["names"] == ["ts", "event_ts"]  # oldest-first
    # the renamed leaf's mapping entry carries its real field id
    chain = resolve_field_path(
        {"fields": [f for s in [meta["schemas"][-1]] for f in s["fields"]]},
        "kafka.event_ts",
    )
    assert ts["field-id"] == chain[-1]["id"]


def test_evolution_nested_add_after_rename_null_pads(spark):
    """A nested field ADDED (evolution-on-write) after a nested rename:
    pre-add epochs null-pad it; pre-rename epochs also serve the
    renamed field — three epochs/versions in one read."""
    tdir = _mkdir()
    _table(spark, tdir, n=2)  # epoch 0: kafka<topic, ts>
    update_table_schema(tdir, rename={"kafka.ts": "event_ts"}, now_ms=2_000)
    # evolution adds kafka.offset within epoch 1
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(9, ("z", 90, 7))],
            "id bigint, kafka struct<topic:string, event_ts:bigint, "
            "offset:bigint>",
        ),
        tdir, now_ms=3_000,
    )
    out = read_iceberg_table(spark, tdir)
    got = {
        r["id"]: (r["kafka"]["event_ts"], r["kafka"]["offset"])
        for r in out.collect()
    }
    assert got == {0: (0, None), 1: (10, None), 9: (90, 7)}


def test_nested_readd_guard_on_evolution(spark):
    """A batch still carrying the OLD nested name after a nested rename
    is a stale writer one level down — evolution-on-write must refuse
    it instead of forking a fresh nested field."""
    tdir = _mkdir()
    _table(spark, tdir, n=2)
    update_table_schema(tdir, rename={"kafka.ts": "event_ts"}, now_ms=2_000)
    stale = spark.createDataFrame(
        [(9, ("z", 90))],
        "id bigint, kafka struct<topic:string, ts:bigint>",
    )
    with pytest.raises(ValueError, match="re-introduces dropped column"):
        write_iceberg_table(spark, stale, tdir, now_ms=3_000)


def test_streams_cross_nested_rename_epochs(spark):
    """The incremental stream's Arrow reader rebuilds pre-rename
    files' struct columns by the per-epoch nested plan, so a stream
    started after a nested rename serves old epochs under the new
    nested names."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
        register,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        run_stream_to_memory,
    )

    tdir = _mkdir()
    _table(spark, tdir, n=3)
    update_table_schema(tdir, rename={"kafka.ts": "event_ts"}, now_ms=2_000)
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(9, ("z", 90))],
            "id bigint, kafka struct<topic:string, event_ts:bigint>",
        ),
        tdir, now_ms=3_000,
    )
    register(spark)
    inc = run_stream_to_memory(
        spark.readStream.format("iceberg_inc").option("path", tdir).load(),
        "append",
    )
    got = {r["id"]: r["kafka"]["event_ts"] for r in inc.collect()}
    assert got == {0: 0, 1: 10, 2: 20, 9: 90}


def test_mirror_propagates_nested_rename(spark):
    """The mirror applies the source's NESTED renames to the replica
    by field id, keyed by the destination's dotted path."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _current_schema_struct,
        _current_state_meta,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        mirror_iceberg_table,
    )

    src, dst, ckpt = _mkdir(), _mkdir(), _mkdir()
    df = spark.createDataFrame(
        [(1, ("a", 10)), (2, ("b", 20))],
        "id bigint, kafka struct<topic:string, ts:bigint>",
    )
    write_iceberg_table(spark, df, src, now_ms=1_000)
    q = mirror_iceberg_table(
        spark, src, dst + "/t", on=["id"], checkpoint_dir=ckpt + "/c"
    )
    q.awaitTermination(120)
    update_table_schema(src, rename={"kafka.ts": "event_ts"}, now_ms=2_000)
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(3, ("c", 30))],
            "id bigint, kafka struct<topic:string, event_ts:bigint>",
        ),
        src, now_ms=3_000,
    )
    q2 = mirror_iceberg_table(
        spark, src, dst + "/t", on=["id"], checkpoint_dir=ckpt + "/c"
    )
    q2.awaitTermination(120)
    _v, dmeta, _t = _current_state_meta(dst + "/t")
    kafka = next(
        f for f in _current_schema_struct(dmeta)["fields"]
        if f["name"] == "kafka"
    )
    assert [f["name"] for f in kafka["type"]["fields"]] == [
        "topic", "event_ts",
    ]
    got = {
        r["id"]: r["kafka"]["event_ts"]
        for r in read_iceberg_table(spark, dst + "/t").collect()
    }
    assert got == {1: 10, 2: 20, 3: 30}


def test_nested_drop_make_optional_promote(spark):
    """r13: the OTHER DDL verbs accept dotted paths too — drop a
    nested field (struct keeps its siblings; old files' values become
    unreachable), widen a nested int to long (old int32 pages up-cast
    at read), relax a nested required field — composing with a nested
    rename in one lifecycle."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _current_schema_struct,
        _current_state_meta,
    )

    tdir = _mkdir()
    df = spark.createDataFrame(
        [(1, ("a", 10, 7)), (2, ("b", 20, 9))],
        "id bigint, env struct<src:string, small:int, legacy:bigint>",
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    update_table_schema(tdir, drop=["env.legacy"], now_ms=2_000)
    update_table_schema(
        tdir, promote={"env.small": "long"},
        make_optional=["env.src"], now_ms=3_000,
    )
    out = read_iceberg_table(spark, tdir)
    assert out.schema["env"].dataType.fieldNames() == ["src", "small"]
    assert str(out.schema["env"].dataType["small"].dataType) == "LongType()"
    got = {r["id"]: (r["env"]["src"], r["env"]["small"])
           for r in out.collect()}
    assert got == {1: ("a", 10), 2: ("b", 20)}
    # post-DDL append under the evolved nested shape
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(3, ("c", 2**40))],
            "id bigint, env struct<src:string, small:bigint>",
        ),
        tdir, now_ms=4_000,
    )
    got = {r["id"]: r["env"]["small"]
           for r in read_iceberg_table(spark, tdir).collect()}
    assert got == {1: 10, 2: 20, 3: 2**40}
    # guards: dropping the last nested field refuses; a stale writer
    # re-introducing the dropped nested name refuses
    _v, meta, _t = _current_state_meta(tdir, None, None)
    env = next(
        f for f in _current_schema_struct(meta)["fields"]
        if f["name"] == "env"
    )
    assert len(env["type"]["fields"]) == 2
    with pytest.raises(ValueError, match="re-introduces dropped column"):
        write_iceberg_table(
            spark,
            spark.createDataFrame(
                [(9, ("z", 1, 5))],
                "id bigint, env struct<src:string, small:bigint, "
                "legacy:bigint>",
            ),
            tdir, now_ms=5_000,
        )


def test_nested_drop_last_field_refuses(spark):
    tdir = _mkdir()
    df = spark.createDataFrame(
        [(1, (10,))], "id bigint, s struct<only:bigint>"
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    with pytest.raises(ValueError, match="drop every field of struct"):
        update_table_schema(tdir, drop=["s.only"], now_ms=2_000)
    # dropping the struct COLUMN itself is the offered recipe
    update_table_schema(tdir, drop=["s"], now_ms=2_000)
    assert read_iceberg_table(spark, tdir).columns == ["id"]


def test_update_where_nested_set(spark):
    """r13: UPDATE ... SET on a DOTTED nested path — the struct
    rebuilds via withField (siblings untouched, NULL structs stay
    NULL), composing with the epoch machinery when matched files
    predate a nested rename."""
    tdir = _mkdir()
    df = spark.createDataFrame(
        [(1, ("a", 10)), (2, ("b", 20)), (3, None)],
        "id bigint, kafka struct<topic:string, ts:bigint>",
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    update_table_schema(tdir, rename={"kafka.ts": "event_ts"}, now_ms=2_000)
    # nested SET against PRE-RENAME files, under the new nested name
    update_where(
        spark, tdir, "id <= 2",
        {"kafka.event_ts": "kafka.event_ts + 100"}, now_ms=3_000,
    )
    rows = {r["id"]: r["kafka"] for r in
            read_iceberg_table(spark, tdir).collect()}
    assert rows[1]["event_ts"] == 110 and rows[1]["topic"] == "a"
    assert rows[2]["event_ts"] == 120 and rows[2]["topic"] == "b"
    assert rows[3] is None  # matched? id=3 not matched; struct intact
    # a matched NULL struct stays NULL through the rewrite
    update_where(
        spark, tdir, "id = 3",
        {"kafka.event_ts": "coalesce(kafka.event_ts, -1)"}, now_ms=4_000,
    )
    rows = {r["id"]: r["kafka"] for r in
            read_iceberg_table(spark, tdir).collect()}
    assert rows[3] is None
    # guards: unknown nested path; path through an array
    with pytest.raises(KeyError, match="no field"):
        update_where(
            spark, tdir, "id = 1", {"kafka.nope": "1"}, now_ms=5_000
        )


def test_update_where_nested_set_required_null_guard(spark):
    """The engine's own writer commits nested fields as optional, but
    an EXTERNALLY-authored table can declare a required nested leaf —
    the nested SET null-guard must honor that metadata (simulated by
    tightening the committed schema version the way a foreign writer
    would have)."""
    import os

    from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
        read_table_metadata,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _write_metadata_version,
    )

    tdir = _mkdir()
    df = spark.createDataFrame(
        [(1, (5, "x"))], "id bigint, env struct<k:bigint, s:string>"
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    back = read_table_metadata(tdir)
    meta = back["metadata"]
    env = next(
        f for f in meta["schemas"][-1]["fields"] if f["name"] == "env"
    )
    next(f for f in env["type"]["fields"] if f["name"] == "k")[
        "required"
    ] = True
    _write_metadata_version(
        os.path.join(tdir, "metadata"), back["version"] + 1, meta
    )
    with pytest.raises(ValueError, match="REQUIRED"):
        update_where(
            spark, tdir, "id = 1",
            {"env.k": "cast(null as bigint)"}, now_ms=2_000,
        )
    # the refusal left no snapshot behind
    assert len(read_table_metadata(tdir)["metadata"]["snapshots"]) == 1


def test_container_element_renames(spark):
    """r13: struct fields INSIDE list elements and map values rename
    by the canonical ``.element.`` / ``.value.`` paths — pre-rename
    files rebuild through transform lambdas (null containers stay
    null), the name-mapping grows container nodes (Appendix C), and
    post-rename appends land under the new names."""
    tdir = _mkdir()
    df = spark.createDataFrame(
        [(1, [(10, "a"), (20, "b")], {"k1": (5,)}), (2, None, None)],
        "id bigint, arr array<struct<x:bigint, y:string>>, "
        "mp map<string, struct<p:bigint>>",
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    meta = update_table_schema(
        tdir,
        rename={"arr.element.x": "xx", "mp.value.p": "pp"},
        now_ms=2_000,
    )
    assert meta["properties"]["engine.naming-epoch"] == "1"
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    arr_e = next(e for e in nm if "arr" in e["names"])
    elem = next(f for f in arr_e["fields"] if "element" in f["names"])
    assert next(
        f for f in elem["fields"] if "xx" in f["names"]
    )["names"] == ["x", "xx"]
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(3, [(30, "c")], {"k3": (7,)})],
            "id bigint, arr array<struct<xx:bigint, y:string>>, "
            "mp map<string, struct<pp:bigint>>",
        ),
        tdir, now_ms=3_000,
    )
    out = read_iceberg_table(spark, tdir)
    rows = {r["id"]: r for r in out.collect()}
    assert [e["xx"] for e in rows[1]["arr"]] == [10, 20]
    assert rows[1]["mp"]["k1"]["pp"] == 5
    assert rows[2]["arr"] is None and rows[2]["mp"] is None
    assert [e["xx"] for e in rows[3]["arr"]] == [30]
    assert rows[3]["mp"]["k3"]["pp"] == 7
    # the old element name is a stale writer now — refused (evolution
    # never merges inside containers, so the refusal is the
    # container-shape mismatch with the rebuild recipe)
    with pytest.raises(TypeError, match="rebuild the writer"):
        write_iceberg_table(
            spark,
            spark.createDataFrame(
                [(9, [(1, "z")])],
                "id bigint, arr array<struct<x:bigint, y:string>>",
            ),
            tdir, now_ms=4_000,
        )


def test_container_element_drop_and_promote(spark):
    """The other nested verbs ride the same container paths."""
    tdir = _mkdir()
    df = spark.createDataFrame(
        [(1, [(10, 3, "a")])],
        "id bigint, arr array<struct<x:bigint, w:int, y:string>>",
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    update_table_schema(
        tdir,
        drop=["arr.element.y"],
        promote={"arr.element.w": "long"},
        now_ms=2_000,
    )
    out = read_iceberg_table(spark, tdir)
    elem_t = out.schema["arr"].dataType.elementType
    assert elem_t.fieldNames() == ["x", "w"]
    assert str(elem_t["w"].dataType) == "LongType()"
    assert [tuple(e) for e in out.collect()[0]["arr"]] == [(10, 3)]


def test_streams_cross_container_rename_epochs(spark):
    """The incremental stream's Arrow reader rebuilds list/map columns
    by the typed conform plan across a container-element rename."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg_stream import (
        register,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        run_stream_to_memory,
    )

    tdir = _mkdir()
    df = spark.createDataFrame(
        [(1, [(10, "a")], {"k": (5,)}), (2, None, None)],
        "id bigint, arr array<struct<x:bigint, y:string>>, "
        "mp map<string, struct<p:bigint>>",
    )
    write_iceberg_table(spark, df, tdir, now_ms=1_000)
    update_table_schema(
        tdir,
        rename={"arr.element.x": "xx", "mp.value.p": "pp"},
        now_ms=2_000,
    )
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(3, [(30, "c")], {"k3": (7,)})],
            "id bigint, arr array<struct<xx:bigint, y:string>>, "
            "mp map<string, struct<pp:bigint>>",
        ),
        tdir, now_ms=3_000,
    )
    register(spark)
    inc = run_stream_to_memory(
        spark.readStream.format("iceberg_inc").option("path", tdir).load(),
        "append",
    )
    rows = {r["id"]: r for r in inc.collect()}
    assert [e["xx"] for e in rows[1]["arr"]] == [10]
    assert rows[1]["mp"]["k"]["pp"] == 5
    assert rows[2]["arr"] is None and rows[2]["mp"] is None
    assert [e["xx"] for e in rows[3]["arr"]] == [30]


def test_mirror_propagates_container_rename(spark):
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _current_schema_struct,
        _current_state_meta,
    )
    from tiered_storage_for_apache_kafka_spark.streaming.ingest import (
        mirror_iceberg_table,
    )

    src, dst, ckpt = _mkdir(), _mkdir(), _mkdir()
    df = spark.createDataFrame(
        [(1, [(10, "a")])],
        "id bigint, arr array<struct<x:bigint, y:string>>",
    )
    write_iceberg_table(spark, df, src, now_ms=1_000)
    q = mirror_iceberg_table(
        spark, src, dst + "/t", on=["id"], checkpoint_dir=ckpt + "/c"
    )
    q.awaitTermination(120)
    update_table_schema(src, rename={"arr.element.x": "xx"}, now_ms=2_000)
    write_iceberg_table(
        spark,
        spark.createDataFrame(
            [(2, [(20, "b")])],
            "id bigint, arr array<struct<xx:bigint, y:string>>",
        ),
        src, now_ms=3_000,
    )
    q2 = mirror_iceberg_table(
        spark, src, dst + "/t", on=["id"], checkpoint_dir=ckpt + "/c"
    )
    q2.awaitTermination(120)
    _v, dmeta, _t = _current_state_meta(dst + "/t")
    arr = next(
        f for f in _current_schema_struct(dmeta)["fields"]
        if f["name"] == "arr"
    )
    assert [
        f["name"] for f in arr["type"]["element"]["fields"]
    ] == ["xx", "y"]
    got = {
        r["id"]: [e["xx"] for e in r["arr"]]
        for r in read_iceberg_table(spark, dst + "/t").collect()
    }
    assert got == {1: [10], 2: [20]}
