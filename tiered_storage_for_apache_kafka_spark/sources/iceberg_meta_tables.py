"""Iceberg metadata tables: the table's own metadata as DataFrames.

The Spark-Iceberg integration exposes every table's bookkeeping as
queryable side-tables (``SELECT * FROM tbl.snapshots / .history /
.refs / .manifests / .files / .entries``) — the operational surface a
user of the reference's Iceberg mode (`IcebergTableManager.java:46-95`)
gets from their catalog. This module provides the same views (nine tables) over
the engine's own spec-compliant metadata plane (`sources/iceberg/`).
Column names follow upstream with two deliberate deviations: integer
epoch-millis columns carry an explicit ``_ms`` suffix
(``committed_at_ms`` / ``made_current_at_ms`` — raw TIMESTAMP outputs
are banned by this engine's cross-engine hashing rules, see
`operators/registry.py`), and ``snapshots`` additionally exposes
``sequence_number`` (the v2 ordering key upstream only shows in the
summary).

Scale design: ``snapshots``/``history``/``refs`` are O(#commits) and
``manifests`` is O(#manifests) — metadata.json + the manifest list are
the only driver-side reads, exactly what any Iceberg client pays to
plan. ``files``/``entries`` are O(#data-files): the driver reads ONLY
the manifest list, then the manifest Avro files are opened and
flattened **executor-side** (one mapInPandas task per manifest), so a
100k-file table's entries never pass through the driver — the same
distributed-metadata-read strategy Spark's Iceberg metadata tables use.
"""

from __future__ import annotations

import json
import struct

from tiered_storage_for_apache_kafka_spark.sources.local_df import (
    local_rows_df,
)

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
    _current_state_meta,
    _load_current_metadata,
    read_avro_ocf,
)


def _resolve_meta(
    table_dir: str, catalog=None, table_name: str | None = None
) -> dict:
    if catalog is not None:
        _v, meta, _name = _current_state_meta(table_dir, catalog, table_name)
        return meta
    _v, meta = _load_current_metadata(table_dir)
    return meta


_SNAPSHOTS_SCHEMA = T.StructType(
    [
        T.StructField("committed_at_ms", T.LongType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("parent_id", T.LongType()),
        T.StructField("sequence_number", T.LongType()),
        T.StructField("operation", T.StringType()),
        T.StructField("manifest_list", T.StringType()),
        T.StructField("summary", T.MapType(T.StringType(), T.StringType())),
    ]
)


def snapshots_table(
    spark: SparkSession,
    table_dir: str,
    catalog=None,
    table_name: str | None = None,
) -> DataFrame:
    """`tbl.snapshots`: one row per snapshot in the table metadata."""
    meta = _resolve_meta(table_dir, catalog, table_name)
    rows = [
        (
            int(s["timestamp-ms"]),
            int(s["snapshot-id"]),
            s.get("parent-snapshot-id"),
            int(s["sequence-number"]),
            s["summary"].get("operation"),
            s["manifest-list"],
            {k: str(v) for k, v in s["summary"].items()},
        )
        for s in meta.get("snapshots", [])
    ]
    return local_rows_df(spark, rows, _SNAPSHOTS_SCHEMA)


_HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("made_current_at_ms", T.LongType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("parent_id", T.LongType()),
        T.StructField("is_current_ancestor", T.BooleanType()),
    ]
)


def history_table(
    spark: SparkSession,
    table_dir: str,
    catalog=None,
    table_name: str | None = None,
) -> DataFrame:
    """`tbl.history`: the snapshot-log, with `is_current_ancestor`
    computed by walking the parent chain from the current snapshot
    (a logged snapshot off the ancestry means a rollback happened)."""
    meta = _resolve_meta(table_dir, catalog, table_name)
    parents = {
        int(s["snapshot-id"]): s.get("parent-snapshot-id")
        for s in meta.get("snapshots", [])
    }
    ancestors: set[int] = set()
    cur = meta.get("current-snapshot-id", -1)
    while cur is not None and cur != -1 and cur not in ancestors:
        ancestors.add(int(cur))
        cur = parents.get(int(cur))
    rows = [
        (
            int(e["timestamp-ms"]),
            int(e["snapshot-id"]),
            parents.get(int(e["snapshot-id"])),
            int(e["snapshot-id"]) in ancestors,
        )
        for e in meta.get("snapshot-log", [])
    ]
    return local_rows_df(spark, rows, _HISTORY_SCHEMA)


_REFS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("snapshot_id", T.LongType()),
        # per-ref retention (r12) — Spark-Iceberg's column names
        T.StructField("max_reference_age_in_ms", T.LongType()),
        T.StructField("min_snapshots_to_keep", T.IntegerType()),
        T.StructField("max_snapshot_age_in_ms", T.LongType()),
    ]
)


def refs_table(
    spark: SparkSession,
    table_dir: str,
    catalog=None,
    table_name: str | None = None,
) -> DataFrame:
    """`tbl.refs`: named branches and tags, with their retention
    policy fields (null = unset, the permanent/full-ancestry default;
    Spark-Iceberg's column naming)."""
    meta = _resolve_meta(table_dir, catalog, table_name)

    def _i(v):
        return None if v is None else int(v)

    rows = [
        (
            name,
            r.get("type", "branch").upper(),
            int(r["snapshot-id"]),
            _i(r.get("max-ref-age-ms")),
            _i(r.get("min-snapshots-to-keep")),
            _i(r.get("max-snapshot-age-ms")),
        )
        for name, r in (meta.get("refs") or {}).items()
    ]
    return local_rows_df(spark, rows, _REFS_SCHEMA)


_MANIFESTS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("partition_spec_id", T.IntegerType()),
        T.StructField("content", T.IntegerType()),
        T.StructField("sequence_number", T.LongType()),
        T.StructField("min_sequence_number", T.LongType()),
        T.StructField("added_snapshot_id", T.LongType()),
        T.StructField("added_data_files_count", T.IntegerType()),
        T.StructField("existing_data_files_count", T.IntegerType()),
        T.StructField("deleted_data_files_count", T.IntegerType()),
        T.StructField("added_rows_count", T.LongType()),
        T.StructField("existing_rows_count", T.LongType()),
        T.StructField("deleted_rows_count", T.LongType()),
        T.StructField(
            "partition_summaries",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("contains_null", T.BooleanType()),
                        T.StructField("lower_bound", T.LongType()),
                        T.StructField("upper_bound", T.LongType()),
                    ]
                )
            ),
        ),
        # fully-typed per-field summaries (field name + bounds of the
        # field's own type, string fields included), JSON-rendered —
        # the legacy long-typed struct column stays for int specs
        T.StructField("partition_summaries_json", T.StringType()),
    ]
)


def _unpack_bound(b: bytes | None) -> int | None:
    if b is None:
        return None
    return struct.unpack("<i" if len(b) == 4 else "<q", b)[0]


def _typed_bound(b: bytes | None, typ: str):
    """Decode a partition-summary bound under its spec field's value
    type (Appendix D): int32 LE for int fields, UTF-8 for string
    fields. Decoding by length alone would silently misread a 4-byte
    string ("webc") as an int32."""
    if b is None:
        return None
    if typ == "string":
        return bytes(b).decode("utf-8")
    return _unpack_bound(bytes(b))


def _spec_field_types(meta: dict) -> dict[int, list[tuple[str, str]]]:
    """spec-id -> ordered [(field_name, value_type)] under the current
    schema — how each manifest's partition struct/summary is typed."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.manifests import (
        spec_field_type,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _current_schema_struct,
    )

    schema_struct = _current_schema_struct(meta)
    return {
        int(s["spec-id"]): [
            (f["name"], spec_field_type(f, schema_struct))
            for f in s["fields"]
        ]
        for s in meta.get("partition-specs", [])
    }


def _manifest_list(meta: dict, snapshot_id: int | None = None) -> list[dict]:
    """Manifest list of a snapshot (default: current). Passing a
    historical ``snapshot_id`` gives the metadata tables VERSION AS OF
    semantics — the manifests/files/entries exactly as that snapshot
    planned them (snapshots are immutable, so this is a pure read)."""
    sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id", -1)
    if sid == -1:
        return []
    snap = next(
        (s for s in meta["snapshots"] if s["snapshot-id"] == sid), None
    )
    if snap is None:
        raise ValueError(f"unknown snapshot id {sid}")
    _, manifest_files, _ = read_avro_ocf(snap["manifest-list"])
    return manifest_files


def manifests_table(
    spark: SparkSession,
    table_dir: str,
    catalog=None,
    table_name: str | None = None,
    snapshot_id: int | None = None,
    _meta: dict | None = None,
) -> DataFrame:
    """`tbl.manifests`: a snapshot's manifest list (default current) —
    the index the scan planner prunes with (partition summaries decoded
    from their single-value binary form)."""
    meta = _meta if _meta is not None else _resolve_meta(
        table_dir, catalog, table_name
    )
    field_types = _spec_field_types(meta)
    rows = []
    for mf in _manifest_list(meta, snapshot_id):
        types = field_types.get(int(mf.get("partition_spec_id", 0)), [])
        summaries = []
        typed = []
        for i, p in enumerate(mf.get("partitions") or []):
            name, typ = types[i] if i < len(types) else (f"f{i}", "int")
            lo = _typed_bound(p.get("lower_bound"), typ)
            hi = _typed_bound(p.get("upper_bound"), typ)
            summaries.append(
                (
                    bool(p["contains_null"]),
                    lo if typ == "int" else None,
                    hi if typ == "int" else None,
                )
            )
            typed.append(
                {
                    "field": name,
                    "contains_null": bool(p["contains_null"]),
                    "lower": lo,
                    "upper": hi,
                }
            )
        rows.append(
            (
                mf["manifest_path"],
                int(mf["manifest_length"]),
                int(mf["partition_spec_id"]),
                int(mf.get("content", 0)),
                int(mf["sequence_number"]),
                int(mf["min_sequence_number"]),
                int(mf["added_snapshot_id"]),
                int(mf["added_data_files_count"]),
                int(mf["existing_data_files_count"]),
                int(mf["deleted_data_files_count"]),
                int(mf["added_rows_count"]),
                int(mf["existing_rows_count"]),
                int(mf["deleted_rows_count"]),
                summaries,
                json.dumps(typed),
            )
        )
    return local_rows_df(spark, rows, _MANIFESTS_SCHEMA)


_ENTRY_COLUMNS = (
    "status INT, snapshot_id BIGINT, sequence_number BIGINT, "
    "file_sequence_number BIGINT, manifest_content INT, content INT, "
    "file_path STRING, file_format STRING, partition BIGINT, "
    "partition_json STRING, "
    "record_count BIGINT, file_size_in_bytes BIGINT, "
    "value_counts MAP<INT, BIGINT>, null_value_counts MAP<INT, BIGINT>, "
    "lower_bounds MAP<INT, BINARY>, upper_bounds MAP<INT, BINARY>"
)


def entries_table(
    spark: SparkSession,
    table_dir: str,
    catalog=None,
    table_name: str | None = None,
    snapshot_id: int | None = None,
    data_only: bool = False,
    _meta: dict | None = None,
) -> DataFrame:
    """`tbl.entries`: every manifest entry of a snapshot (default
    current; status 0=existing / 1=added / 2=deleted), data_file
    flattened. ``data_only`` prunes DELETE manifests from the path
    list before anything ships to executors — they are never opened,
    not parsed-then-discarded.

    The driver touches only metadata.json + the manifest list; each
    manifest Avro is opened executor-side, one task per manifest."""
    meta = _meta if _meta is not None else _resolve_meta(
        table_dir, catalog, table_name
    )
    mfs = [
        (mf["manifest_path"], int(mf.get("content", 0)))
        for mf in _manifest_list(meta, snapshot_id)
        if not (data_only and int(mf.get("content", 0)) != 0)
    ]
    if not mfs:
        return local_rows_df(spark, [], _ENTRY_COLUMNS)

    def read_manifests(pdfs):
        import json as _json

        for pdf in pdfs:
            for t in pdf.itertuples():
                _, entries, _m = read_avro_ocf(t.manifest_path)
                rows = []
                for e in entries:
                    d = e["data_file"]
                    part = d.get("partition") or {}
                    # legacy scalar: the FIRST field's value, int specs
                    # only (a string value must not be coerced to the
                    # BIGINT column); the full typed tuple rides in
                    # partition_json
                    first = next(iter(part.values()), None)
                    part_val = first if isinstance(first, int) else None
                    rows.append(
                        (
                            int(e["status"]),
                            e.get("snapshot_id"),
                            e.get("sequence_number"),
                            e.get("file_sequence_number"),
                            int(t.manifest_content),
                            int(d.get("content", 0)),
                            d["file_path"],
                            d["file_format"],
                            part_val,
                            _json.dumps(part),
                            int(d["record_count"]),
                            int(d["file_size_in_bytes"]),
                            _kv_map(d.get("value_counts")),
                            _kv_map(d.get("null_value_counts")),
                            _kv_map(d.get("lower_bounds")),
                            _kv_map(d.get("upper_bounds")),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "status",
                        "snapshot_id",
                        "sequence_number",
                        "file_sequence_number",
                        "manifest_content",
                        "content",
                        "file_path",
                        "file_format",
                        "partition",
                        "partition_json",
                        "record_count",
                        "file_size_in_bytes",
                        "value_counts",
                        "null_value_counts",
                        "lower_bounds",
                        "upper_bounds",
                    ],
                )

    n_slots = spark.sparkContext.defaultParallelism
    # one slice per manifest (capped): the frame exists to fan out the
    # per-manifest parse, and explicit slices avoid both the 32-slice
    # default on tiny lists and the repartition exchange
    paths_df = local_rows_df(
        spark,
        mfs,
        "manifest_path STRING, manifest_content INT",
        slices=min(n_slots, len(mfs)),
    )
    return paths_df.mapInPandas(read_manifests, schema=_ENTRY_COLUMNS)


def _kv_map(kvs) -> dict | None:
    if not kvs:
        return None
    return {int(kv["key"]): kv["value"] for kv in kvs}


def files_table(
    spark: SparkSession,
    table_dir: str,
    catalog=None,
    table_name: str | None = None,
    snapshot_id: int | None = None,
    _meta: dict | None = None,
) -> DataFrame:
    """`tbl.files`: live DATA files of a snapshot (default current) —
    entries with status existing/added, data manifests only (delete
    manifests carry position/equality deletes, surfaced by
    `entries_table`)."""
    ent = entries_table(
        spark, table_dir, catalog, table_name, snapshot_id,
        data_only=True, _meta=_meta,
    )
    return ent.filter(F.col("status") != 2).drop("status", "manifest_content")


def partitions_table(
    spark: SparkSession,
    table_dir: str,
    catalog=None,
    table_name: str | None = None,
    snapshot_id: int | None = None,
) -> DataFrame:
    """`tbl.partitions`: per-partition rollup of the live data files
    (record_count / file_count / total_size), the view planners use to
    spot skewed or fragmented partitions. Grouped by the FULL typed
    partition tuple (``partition_json``) — a multi-field or string
    spec's cells roll up separately, as upstream's partition struct
    does; the legacy scalar column (first int field) is carried for
    single-int-spec consumers. Pure aggregation over `files_table` —
    inherits its executor-side manifest reads."""
    return (
        files_table(spark, table_dir, catalog, table_name, snapshot_id)
        .groupBy("partition_json")
        .agg(
            F.first("partition").alias("partition"),
            F.sum("record_count").alias("record_count"),
            F.count(F.lit(1)).cast("long").alias("file_count"),
            F.sum("file_size_in_bytes").alias("total_data_file_size_in_bytes"),
        )
    )


def all_manifests_table(
    spark: SparkSession,
    table_dir: str,
    catalog=None,
    table_name: str | None = None,
) -> DataFrame:
    """`tbl.all_manifests`: the union of every snapshot's manifest list
    (one row per (snapshot, manifest) pair, `reference_snapshot_id`
    column as upstream) — the audit view for manifest reuse across
    snapshots and compaction behavior. O(#snapshots) driver-side
    manifest-list reads; each list is a tiny Avro."""
    meta = _resolve_meta(table_dir, catalog, table_name)
    frames = []
    for s in meta.get("snapshots", []):
        df = manifests_table(
            spark, table_dir, catalog, table_name,
            snapshot_id=int(s["snapshot-id"]), _meta=meta,
        ).withColumn("reference_snapshot_id", F.lit(int(s["snapshot-id"])))
        frames.append(df)
    if not frames:
        return manifests_table(
            spark, table_dir, catalog, table_name, _meta=meta
        ).withColumn("reference_snapshot_id", F.lit(None).cast("long"))
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df)
    return out


def all_files_table(
    spark: SparkSession,
    table_dir: str,
    catalog=None,
    table_name: str | None = None,
) -> DataFrame:
    """`tbl.all_data_files`: live data files of EVERY snapshot, one
    row per file path. A file carried across snapshots keeps the entry
    from its EARLIEST sequence number (deterministic — a plain
    dropDuplicates would keep an arbitrary row if a later commit ever
    rewrote the entry's bookkeeping columns). Distributed per snapshot
    via `files_table`; metadata.json is read once for the whole call."""
    from pyspark.sql import Window

    meta = _resolve_meta(table_dir, catalog, table_name)
    snaps = [int(s["snapshot-id"]) for s in meta.get("snapshots", [])]
    if not snaps:
        return files_table(spark, table_dir, catalog, table_name, _meta=meta)
    out = files_table(
        spark, table_dir, catalog, table_name, snapshot_id=snaps[0], _meta=meta
    )
    for sid in snaps[1:]:
        out = out.unionByName(
            files_table(
                spark, table_dir, catalog, table_name, snapshot_id=sid,
                _meta=meta,
            )
        )
    w = Window.partitionBy("file_path").orderBy(
        F.col("sequence_number").asc_nulls_last(),
        F.col("snapshot_id").asc_nulls_last(),
    )
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


_POSITION_DELETES_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("delete_file_path", T.StringType()),
        T.StructField("spec_id", T.IntegerType()),
        T.StructField("sequence_number", T.LongType()),
    ]
)


def position_deletes_table(
    spark: SparkSession,
    table_dir: str,
    catalog=None,
    table_name: str | None = None,
) -> DataFrame:
    """`tbl.position_deletes` (r12): every LIVE position-delete row of
    the current snapshot — the merge-on-read delete debt `update_where`
    / DELETE / conversions accumulate and `rewrite_position_deletes` /
    `rewrite_data_files` pay down. One row per retracted (target file,
    pos) identity with the delete file's provenance; v3 deletion
    vectors EXPLODE to the same shape (bitmap decode executor-side),
    so the observability surface is uniform across both delete
    representations. Distributed: parquet delete files scan natively
    with `_metadata` provenance; only the O(entries) provenance map
    rides broadcast."""
    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (  # noqa: E501
        _dv_entry_payload,
        split_position_deletes,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.scan import (
        _norm_file_expr,
        _plan_snapshot,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _specs_by_id,
    )

    meta = _resolve_meta(table_dir, catalog, table_name)
    if meta.get("current-snapshot-id", -1) == -1:
        return local_rows_df(spark, [], _POSITION_DELETES_SCHEMA)
    cur = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _data, deletes = _plan_snapshot(cur, None, specs_by_id=_specs_by_id(meta))
    pos, dv = split_position_deletes(deletes)
    parts = []
    if pos:
        prov = local_rows_df(
            spark,
            sorted(
                (d["file_path"], int(d["_spec_id"]), int(d["_seq"]))
                for d in pos
            ),
            "delete_file_path string, spec_id int, sequence_number bigint",
        )
        parts.append(
            spark.read.parquet(*sorted({d["file_path"] for d in pos}))
            .select(
                "file_path",
                "pos",
                _norm_file_expr(F.col("_metadata.file_path")).alias(
                    "delete_file_path"
                ),
            )
            .join(F.broadcast(prov), "delete_file_path")
            .select(*[f.name for f in _POSITION_DELETES_SCHEMA])
        )
    if dv:
        blob_cache: dict[str, list[dict]] = {}
        rows = [
            (
                e.get("referenced_data_file"),
                _dv_entry_payload(e, blob_cache),
                e["file_path"],
                int(e["_spec_id"]),
                int(e["_seq"]),
            )
            for e in dv
        ]
        dv_df = local_rows_df(
            spark,
            rows,
            "file_path string, __dv binary, delete_file_path string, "
            "spec_id int, sequence_number bigint",
            slices=min(
                spark.sparkContext.defaultParallelism, len(rows)
            ),
        )

        def explode(pdfs):
            import numpy as np
            import pandas as pd

            from tiered_storage_for_apache_kafka_spark.roaring import (
                deserialize_roaring64,
            )
            from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (  # noqa: E501
                unframe_dv_payload,
            )

            for pdf in pdfs:
                # plain tuples: itertuples mangles __-prefixed names
                for fp, blob, dfp, sid, seq in pdf.itertuples(
                    index=False, name=None
                ):
                    positions = deserialize_roaring64(
                        unframe_dv_payload(bytes(blob))
                    ).astype(np.int64)
                    yield pd.DataFrame(
                        {
                            "file_path": fp,
                            "pos": positions,
                            "delete_file_path": dfp,
                            "spec_id": sid,
                            "sequence_number": seq,
                        }
                    )

        parts.append(
            dv_df.mapInPandas(
                explode,
                "file_path string, pos bigint, delete_file_path string, "
                "spec_id int, sequence_number bigint",
            )
        )
    if not parts:
        return local_rows_df(spark, [], _POSITION_DELETES_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
