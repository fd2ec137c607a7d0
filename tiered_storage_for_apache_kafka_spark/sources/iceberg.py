"""Minimal Apache Iceberg v2 metadata writer for the table-mode output.

Parity target: the reference's Iceberg mode commits segment data through
a real Iceberg catalog (`core/src/main/java/io/aiven/kafka/tieredstorage/
iceberg/IcebergTableManager.java:46-95` — table create + appendFiles
transaction; `iceberg/manifest/SegmentManifestWriter.java:35-112` —
per-segment data-file bookkeeping). This engine's transaction plane is
Spark parquet plus a parquet manifest log (`streaming/ingest.py`); this
module closes the interop gap by ALSO emitting spec-compliant Iceberg v2
table metadata over the same data files, so an external Iceberg reader
(Trino/Flink/Spark's iceberg catalog) can open the table:

- ``metadata/v{N}.metadata.json`` — TableMetadata (format-version 2),
- ``metadata/snap-*.avro``        — the snapshot's manifest list,
- ``metadata/*-m0.avro``          — a manifest of data-file entries,
- ``metadata/version-hint.text``  — HadoopCatalog-style version pointer.

The Avro files are written with the repo's pure-Python Avro codec
(`avro.py`, Apache Avro spec) wrapped in a standard Object Container
File, with the Iceberg field-id annotations (``field-id`` /
``element-id``) external readers require. Everything here is public
knowledge: the Iceberg table spec (https://iceberg.apache.org/spec/)
and the Avro 1.x container format.

Scale note: metadata commits are inherently driver-side (one snapshot
per commit, O(files) manifest entries — exactly the Java library's
cost); the data plane stays fully distributed. At 100 TB the manifest
would be split per partition-spec bucket; a single manifest per commit
is the spec-minimal baseline and external readers accept it.
"""

from __future__ import annotations

import io
import json
import re
import os
import struct
import time
import uuid
from typing import Any

from tiered_storage_for_apache_kafka_spark.avro import avro_decode, avro_encode

FORMAT_VERSION = 2

# -- Avro Object Container File (Avro spec section "Object Container Files") --

_OCF_MAGIC = b"Obj\x01"
_OCF_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_avro_ocf(
    path: str,
    schema: dict,
    records: list[dict],
    extra_meta: dict[str, bytes] | None = None,
) -> int:
    """Write records as a single-block Avro OCF; returns the file length.
    The sync marker is derived deterministically from the schema + path
    so repeated commits of identical content are byte-identical."""
    import hashlib

    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    meta.update(extra_meta or {})
    sync = hashlib.md5(path.encode() + meta["avro.schema"]).digest()
    out = io.BytesIO()
    out.write(_OCF_MAGIC)
    out.write(avro_encode(meta, _OCF_META_SCHEMA))
    out.write(sync)
    if records:
        block = io.BytesIO()
        for rec in records:
            block.write(avro_encode(rec, schema))
        payload = block.getvalue()
        buf = io.BytesIO()
        avro_encode(len(records), "long", buf)
        avro_encode(len(payload), "long", buf)
        out.write(buf.getvalue())
        out.write(payload)
        out.write(sync)
    data = out.getvalue()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def read_avro_ocf(path: str) -> tuple[dict, list[dict], dict[str, bytes]]:
    """Read an Avro OCF back: (schema-from-header, records, file meta).
    Decodes against the schema parsed from the file header — the same
    thing an external reader does — not a Python-side schema object."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != _OCF_MAGIC:
        raise ValueError("not an Avro object container file")
    meta = avro_decode(buf, _OCF_META_SCHEMA)
    schema = json.loads(meta["avro.schema"].decode())
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        probe = buf.read(1)
        if not probe:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = avro_decode(buf, "long")
        _size = avro_decode(buf, "long")
        for _ in range(n):
            records.append(avro_decode(buf, schema))
        if buf.read(16) != sync:
            raise ValueError("Avro OCF sync marker mismatch")
    return schema, records, meta


# -- Spark schema -> Iceberg schema (field-id assignment) ---------------------

_PRIMITIVES = {
    "integer": "int",
    "long": "long",
    "string": "string",
    "binary": "binary",
    "boolean": "boolean",
    "double": "double",
    "float": "float",
    "date": "date",
}


def spark_schema_to_iceberg(schema) -> tuple[dict, int]:
    """Convert a Spark StructType to an Iceberg schema dict, assigning
    fresh field ids depth-first (any unique assignment is spec-legal).
    Returns (schema-dict, last-column-id)."""
    struct, last = spark_schema_to_iceberg_type(schema, {"id": 0})
    struct["schema-id"] = 0
    struct["identifier-field-ids"] = []
    return struct, last


def evolve_iceberg_schema(
    current: dict, new_spark_schema, last_column_id: int
) -> tuple[dict, int, bool]:
    """Schema evolution for the Iceberg metadata plane (the machinery the
    reference intends but never wires, `SchemaUpdate.java:17-127`):
    ADD-AS-OPTIONAL only — new columns get fresh field ids, existing
    fields KEEP their ids and types (the Iceberg correctness contract:
    ids are the identity of a column across files). Removals keep the
    old field (Iceberg drops are explicit operations, not inferred);
    type changes are rejected here — the parquet-level widening path
    lives in `sources/schema_evolution.py`'s sidecar reader, which plain
    multi-file parquet scans can't express. Returns
    (schema-struct, last-column-id, changed)."""
    counter = {"id": last_column_id}

    def nxt() -> int:
        counter["id"] += 1
        return counter["id"]

    def conv_new(dt) -> Any:
        # fresh conversion for an ADDED subtree
        s, _last = spark_schema_to_iceberg_type(dt, counter)
        return s

    changed = {"v": False}

    def merge_struct(cur_struct: dict, new_dt) -> dict:
        by_name = {f["name"]: f for f in cur_struct["fields"]}
        out_fields = []
        seen = set()
        for nf in new_dt.fields:
            seen.add(nf.name)
            cf = by_name.get(nf.name)
            if cf is None:
                changed["v"] = True
                out_fields.append(
                    {
                        "id": nxt(),
                        "name": nf.name,
                        "required": False,  # additions are optional
                        "type": conv_new(nf.dataType),
                    }
                )
                continue
            cur_t = cf["type"]
            # required -> optional relaxation (Iceberg makeColumnOptional;
            # the reverse tightening is never inferred)
            if cf["required"] and nf.nullable:
                cf = {**cf, "required": False}
                changed["v"] = True
            if isinstance(cur_t, dict) and cur_t.get("type") == "struct":
                if nf.dataType.typeName() != "struct":
                    raise TypeError(
                        f"incompatible change at {nf.name}: struct -> "
                        f"{nf.dataType.typeName()}"
                    )
                out_fields.append({**cf, "type": merge_struct(cur_t, nf.dataType)})
                continue
            new_flat, _ = spark_schema_to_iceberg_type(nf.dataType, {"id": 0})
            if _strip_ids(new_flat) != _strip_ids(cur_t):
                raise TypeError(
                    f"incompatible change at {nf.name}: {cur_t!r} -> "
                    f"{new_flat!r} (only add-as-optional is supported in "
                    "the Iceberg metadata plane)"
                )
            out_fields.append(cf)
        # fields absent from the new schema stay (drops are explicit)
        for f in cur_struct["fields"]:
            if f["name"] not in seen:
                out_fields.append(f)
        return {**cur_struct, "fields": out_fields}

    merged = merge_struct(current, new_spark_schema)
    return merged, counter["id"], changed["v"]


def spark_schema_to_iceberg_type(dt, counter: dict) -> tuple[Any, int]:
    """Single-type version of :func:`spark_schema_to_iceberg`, sharing a
    caller-provided id counter (used by schema evolution for added
    subtrees)."""

    def nxt() -> int:
        counter["id"] += 1
        return counter["id"]

    def conv(dt) -> Any:
        name = dt.typeName()
        if name == "struct":
            fields = []
            for f in dt.fields:
                fid = nxt()
                fields.append(
                    {
                        "id": fid,
                        "name": f.name,
                        "required": not f.nullable,
                        "type": conv(f.dataType),
                    }
                )
            return {"type": "struct", "fields": fields}
        if name == "array":
            eid = nxt()
            return {
                "type": "list",
                "element-id": eid,
                "element": conv(dt.elementType),
                "element-required": not dt.containsNull,
            }
        if name == "map":
            kid, vid = nxt(), nxt()
            return {
                "type": "map",
                "key-id": kid,
                "key": conv(dt.keyType),
                "value-id": vid,
                "value": conv(dt.valueType),
                "value-required": not dt.valueContainsNull,
            }
        if name in ("timestamp", "timestamp_ntz"):
            return "timestamptz" if name == "timestamp" else "timestamp"
        if name.startswith("decimal"):
            return f"decimal({dt.precision}, {dt.scale})"
        if name in _PRIMITIVES:
            return _PRIMITIVES[name]
        raise TypeError(f"unsupported Spark type for Iceberg schema: {name}")

    return conv(dt), counter["id"]


def _strip_ids(t):
    """Type equality ignoring assigned ids AND nullability flags:
    ids are assigned (not declared), and nullability drift inside
    container types is tolerated the same way top-level
    required->optional is (Spark plans flip these routinely)."""
    if isinstance(t, dict):
        return {
            k: ([_strip_ids(x) for x in v] if isinstance(v, list) else _strip_ids(v))
            for k, v in t.items()
            if k
            not in (
                "id",
                "field-id",
                "element-id",
                "key-id",
                "value-id",
                "required",
                "element-required",
                "value-required",
            )
        }
    return t


def _advance_main(refs: dict | None, snapshot_id: int) -> dict:
    """New refs map for a commit: advance the ``main`` branch head,
    PRESERVE every other ref — user tags and branches must survive
    unrelated commits (spec "Snapshot References"; clobbering them was
    a latent bug while main was the only ref that ever existed)."""
    out = dict(refs or {})
    out["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
    return out


def _current_schema_struct(meta: dict) -> dict:
    """The metadata's current schema struct (single place to fail on a
    missing/corrupt current-schema-id)."""
    return next(
        sc for sc in meta["schemas"] if sc["schema-id"] == meta["current-schema-id"]
    )


def _write_metadata_version(meta_dir: str, version: int, meta: dict) -> None:
    """Write v{N}.metadata.json + version-hint atomically-enough for the
    single-writer model all three maintenance/commit paths share."""
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(version))


def _prev_total_records(meta: dict) -> int:
    """Running table total from the current snapshot's summary (correct
    across expiration and compaction, unlike summing surviving
    snapshots' added-records)."""
    cur_id = meta.get("current-snapshot-id", -1)
    if cur_id == -1:
        return 0
    cur = next((s for s in meta["snapshots"] if s["snapshot-id"] == cur_id), None)
    if cur is None:
        return 0
    return int(cur["summary"].get("total-records", 0))


def _is_rewrite_output(path: str, location: str) -> bool:
    """True when ``path`` is `rewrite_data_files` output of the table
    at ``location`` — anchored at the table root (a table that itself
    lives under some ancestor named ``_compacted-*`` must not classify
    every file as rewrite output)."""
    rel = os.path.relpath(path, location)
    if rel.startswith(".."):
        return False
    return rel.split(os.sep)[0].startswith("_compacted-")


def _tombstone_gc_safe(d: dict, location: str) -> bool:
    """Whether a status=2 entry past the window horizon may be dropped.
    Tombstones do double duty: besides serving incremental windows,
    a DATA tombstone for a file in the table's visible hive layout is
    the only metadata record telling the discovery-mode commit_append
    that the still-on-disk file is already committed — GC'ing it would
    let the next discovery append re-commit the file and duplicate
    every row. Delete-file entries and hidden-path (rewrite output)
    entries are never swept by discovery, so the horizon alone bounds
    them."""
    if d.get("content") in (1, 2):
        return True
    rel = os.path.relpath(d["file_path"], location)
    if rel.startswith(".."):
        return True  # outside the table: discovery can't see it
    first = rel.split(os.sep)[0]
    return first.startswith("_") or first in ("metadata", "deletes")


def _base_path_groups(table_dir: str, paths: list[str]) -> list[tuple[str, list[str]]]:
    """Group planned files by the basePath Spark must infer hive
    partitions under. Original files live at
    ``<table>/partition=N/…``; `rewrite_data_files` output lives one
    level deeper at ``<table>/_compacted-<token>/partition=N/…`` —
    mixing both depths under one basePath trips Spark's
    CONFLICTING_DIRECTORY_STRUCTURES check, so each compaction dir
    reads under its own base and the scans union."""
    groups: dict[str, list[str]] = {}
    for p in paths:
        rel = os.path.relpath(p, table_dir)
        first = rel.split(os.sep)[0]
        base = (
            os.path.join(table_dir, first)
            if first.startswith("_compacted-")
            else table_dir
        )
        groups.setdefault(base, []).append(p)
    return sorted(groups.items())


def _read_planned_files(
    spark, table_dir: str, meta: dict, paths: list[str], project=None
):
    """Hand a planned file set to Spark's parquet reader, one scan per
    basePath group unioned (see :func:`_base_path_groups`); schema
    merging is paid only when the table actually has multiple schema
    versions. ``project`` maps each per-group scan before the union —
    needed for per-file metadata columns, which must be selected on
    the source scan, not after a union."""
    dfs = []
    for base, ps in _base_path_groups(table_dir, paths):
        reader = spark.read.option("basePath", base)
        if len(meta.get("schemas", [])) > 1:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*sorted(ps))
        dfs.append(df if project is None else project(df))
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def _field_id(schema_struct: dict, name: str) -> int:
    for f in schema_struct["fields"]:
        if f["name"] == name:
            return f["id"]
    raise KeyError(name)


def _leaf_field_ids(schema_struct: dict) -> dict[str, int]:
    """Dotted leaf path -> Iceberg field id for scalar leaves (the key
    space of the column-stats maps; matches parquet's path_in_schema
    for struct nesting). Non-struct composites (lists/maps) are not
    bounds candidates and are skipped."""
    out: dict[str, int] = {}

    def walk(struct: dict, prefix: str) -> None:
        for f in struct["fields"]:
            path = f"{prefix}{f['name']}"
            t = f["type"]
            if isinstance(t, dict):
                if t.get("type") == "struct":
                    walk(t, path + ".")
                continue
            out[path] = f["id"]

    walk(schema_struct, "")
    return out


def _bounds_pack(value: int, physical: str) -> bytes:
    """Iceberg single-value binary serialization (spec Appendix D):
    int -> 4-byte little-endian, long -> 8-byte little-endian."""
    return struct.pack("<i" if physical == "INT32" else "<q", value)


def _column_stats_fields(
    column_stats: dict[str, dict], leaf_ids: dict[str, int]
) -> dict:
    """Footer stats -> the four manifest stats maps (key/value record
    lists in field-id order); all-None when nothing mapped."""
    vc, nvc, lb, ub = [], [], [], []
    mapped = sorted(
        (leaf_ids[p], st)
        for p, st in column_stats.items()
        if st is not None and p in leaf_ids  # None = poisoned, unpublished
    )
    for fid, st in mapped:
        vc.append({"key": fid, "value": int(st["n"])})
        nvc.append({"key": fid, "value": int(st["nulls"])})
        lb.append({"key": fid, "value": _bounds_pack(st["min"], st["physical"])})
        ub.append({"key": fid, "value": _bounds_pack(st["max"], st["physical"])})
    return {
        "value_counts": vc or None,
        "null_value_counts": nvc or None,
        "lower_bounds": lb or None,
        "upper_bounds": ub or None,
    }


_STATS_KEYS = ("value_counts", "null_value_counts", "lower_bounds", "upper_bounds")


# -- manifest / manifest-list Avro schemas (Iceberg spec, v2 names+ids) -------


def _partition_struct_schema(partition_col: str) -> dict:
    return {
        "type": "record",
        "name": "r102",
        "fields": [
            {
                "name": partition_col,
                "type": ["null", "int"],
                "default": None,
                "field-id": 1000,
            }
        ],
    }


def _int_kv_map_schema(
    name: str, field_id: int, key_id: int, value_id: int, value_type: str
) -> dict:
    """Iceberg's map<int, V> representation in manifest Avro: a nullable
    array of key/value records with ``logicalType: map`` (how the Java
    writer emits the column-stats maps)."""
    return {
        "name": name,
        "type": [
            "null",
            {
                "type": "array",
                "logicalType": "map",
                "items": {
                    "type": "record",
                    "name": f"k{key_id}_v{value_id}",
                    "fields": [
                        {"name": "key", "type": "int", "field-id": key_id},
                        {
                            "name": "value",
                            "type": value_type,
                            "field-id": value_id,
                        },
                    ],
                },
            },
        ],
        "default": None,
        "field-id": field_id,
    }


def manifest_entry_schema(partition_col: str) -> dict:
    """Avro schema of a v2 ``manifest_entry`` (spec "Manifest" section);
    field ids via the ``field-id`` attribute as the Java writer emits.
    Includes the column-stats maps (value/null counts, lower/upper
    bounds — spec Appendix field ids) the scan planner prunes files
    with."""
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": _partition_struct_schema(partition_col),
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            _int_kv_map_schema("value_counts", 109, 119, 120, "long"),
            _int_kv_map_schema("null_value_counts", 110, 121, 122, "long"),
            _int_kv_map_schema("lower_bounds", 125, 126, 127, "bytes"),
            _int_kv_map_schema("upper_bounds", 128, 129, 130, "bytes"),
            {
                "name": "split_offsets",
                "type": ["null", {"type": "array", "items": "long", "element-id": 133}],
                "default": None,
                "field-id": 132,
            },
            {
                "name": "equality_ids",
                "type": ["null", {"type": "array", "items": "int", "element-id": 136}],
                "default": None,
                "field-id": 135,
            },
            {
                "name": "sort_order_id",
                "type": ["null", "int"],
                "default": None,
                "field-id": 140,
            },
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 1,
            },
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


MANIFEST_FILE_SCHEMA: dict = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int", "field-id": 504},
        {"name": "existing_data_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_data_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {
            "name": "partitions",
            "type": [
                "null",
                {
                    "type": "array",
                    "element-id": 508,
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {
                                "name": "contains_null",
                                "type": "boolean",
                                "field-id": 509,
                            },
                            {
                                "name": "contains_nan",
                                "type": ["null", "boolean"],
                                "default": None,
                                "field-id": 518,
                            },
                            {
                                "name": "lower_bound",
                                "type": ["null", "bytes"],
                                "default": None,
                                "field-id": 510,
                            },
                            {
                                "name": "upper_bound",
                                "type": ["null", "bytes"],
                                "default": None,
                                "field-id": 511,
                            },
                        ],
                    },
                },
            ],
            "default": None,
            "field-id": 507,
        },
    ],
}


# -- data-file discovery ------------------------------------------------------


def _discover_data_files(table_dir: str, partition_col: str) -> list[dict]:
    """Walk the parquet table (written by ``table_mode.write_table``,
    hive-partitioned ``{partition_col}=N`` dirs) and collect per-file
    stats from the parquet footers (pyarrow — the same footer stats the
    Java writer records)."""
    import pyarrow.parquet as pq

    files = []
    for root, _dirs, names in os.walk(table_dir):
        # skip the table's own metadata/ subtree — by path COMPONENT
        # relative to table_dir (a substring match would drop all data
        # when an ancestor dir merely starts with "metadata")
        rel = os.path.relpath(root, table_dir)
        parts = rel.split(os.sep)
        # "_"-prefixed components are hidden by Hadoop/Spark convention;
        # rewrite_data_files parks compacted files under _compacted-*
        # so a discovery-mode append can never sweep them in twice
        if rel != os.curdir and (
            "metadata" in parts
            or "deletes" in parts
            or any(p.startswith("_") for p in parts)
        ):
            continue
        part_val = None
        for seg in root[len(table_dir):].split(os.sep):
            if seg.startswith(f"{partition_col}="):
                part_val = int(seg.split("=", 1)[1])
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            if name.startswith("delete-"):
                # position-delete files (write_position_deletes);
                # discovery mode must never sweep them in as data
                continue
            files.append(_stat_one_file(os.path.join(root, name), part_val))
    return sorted(files, key=lambda f: f["file_path"])


def _fold_column_stats(col_stats: dict, col, rg_rows: int) -> None:
    """Fold one row-group column chunk's footer stats into the per-file
    aggregate (min/max/null-count/value-count keyed by leaf path).

    A column is POISONED (entry set to None, never published) when any
    chunk lacks min/max or reports a non-plain-integer value (pyarrow
    returns datetime objects for timestamp/date logical types): partial
    stats would publish too-narrow bounds / undercounted nulls, and an
    external engine pruning on them would silently drop rows — no stats
    is always safe, wrong stats never are."""
    path = col.path_in_schema
    if col_stats.get(path, False) is None:
        return  # already poisoned by an earlier chunk
    st = col.statistics
    plain_ints = (
        st is not None
        and st.has_min_max
        and isinstance(st.min, int)
        and isinstance(st.max, int)
        and not isinstance(st.min, bool)
        and st.null_count is not None
    )
    if not plain_ints:
        col_stats[path] = None
        return
    cur = col_stats.get(path)
    if cur is None:
        col_stats[path] = {
            "min": st.min,
            "max": st.max,
            "nulls": st.null_count,
            "n": rg_rows,
            "physical": col.physical_type,
        }
        return
    cur["min"] = min(cur["min"], st.min)
    cur["max"] = max(cur["max"], st.max)
    cur["nulls"] += st.null_count
    cur["n"] += rg_rows


def _stat_one_file(path: str, part_val: int | None) -> dict:
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    # row-group starting positions = the spec's split_offsets; while
    # walking, fold each integer leaf column's footer min/max into the
    # per-file bounds the manifest entry publishes (spec lower_bounds/
    # upper_bounds — what lets plan_scan skip files by value range)
    offsets = []
    col_stats: dict[str, dict] = {}
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        starts = []
        for c in range(rg.num_columns):
            col = rg.column(c)
            dp = col.dictionary_page_offset
            starts.append(dp if dp is not None else col.data_page_offset)
            if col.physical_type not in ("INT32", "INT64"):
                continue
            _fold_column_stats(col_stats, col, rg.num_rows)
        offsets.append(min(starts))
    return {
        "file_path": path,
        "partition_value": part_val,
        "record_count": md.num_rows,
        "file_size_in_bytes": os.path.getsize(path),
        "split_offsets": sorted(offsets),
        "column_stats": col_stats,
    }


def _stat_data_files(paths: list[str], partition_col: str) -> list[dict]:
    """Footer stats for an explicit file list; the partition value comes
    from the hive path component, same layout discovery walks."""
    out = []
    for path in paths:
        if not os.path.exists(path):
            raise FileNotFoundError(f"explicit commit file absent: {path}")
        part_val = None
        for seg in path.split(os.sep):
            if seg.startswith(f"{partition_col}="):
                part_val = int(seg.split("=", 1)[1])
        out.append(_stat_one_file(path, part_val))
    return out


# -- the commit ---------------------------------------------------------------


def _default_table_name(table_dir: str) -> str:
    """The one naming rule for catalog tables defaulted from a path —
    every catalog call site must use this (a writer and reader deriving
    names differently would split one table across two catalog
    entries)."""
    return os.path.basename(os.path.normpath(table_dir))


def _current_state_meta(
    table_dir: str, catalog=None, table_name: str | None = None
) -> tuple[int, dict, str | None]:
    """(version, metadata, resolved_table_name) WITHOUT parsing
    manifests — for consumers that only need metadata.json content
    (replay-skip checks, time travel, maintenance state): parsing every
    manifest Avro just to read snapshot summaries would make those
    paths O(table) instead of O(metadata)."""
    if catalog is None:
        version, meta = _load_current_metadata(table_dir)
        return version, meta, table_name
    if table_name is None:
        table_name = _default_table_name(table_dir)
    resp = catalog.load_table(table_name)
    if resp is None:
        raise FileNotFoundError(f"table {table_name!r} not in catalog")
    m = re.search(r"v(\d+)\.metadata\.json$", resp["metadata-location"])
    return (int(m.group(1)) if m else 1), resp["metadata"], table_name


def _load_prior_state(table_dir: str, catalog=None, table_name: str | None = None):
    """Current table state for a commit: from the version-hint file
    layout, or — when a REST catalog is configured — from the catalog
    service (`GET /v1/namespaces/{ns}/tables/{t}`), which is then the
    source of truth for the metadata pointer. Manifest files themselves
    live in storage either way, so entry parsing is shared."""
    if catalog is None:
        return read_table_metadata(table_dir)
    if table_name is None:
        table_name = _default_table_name(table_dir)
    resp = catalog.load_table(table_name)
    if resp is None:
        return None
    meta = resp["metadata"]
    m = re.search(r"v(\d+)\.metadata\.json$", resp["metadata-location"])
    version = int(m.group(1)) if m else 1
    manifest_files, manifests = _parse_current_manifests(meta)
    return {
        "version": version,
        "metadata": meta,
        "manifest_list": manifest_files,
        "manifests": manifests,
    }


def commit_append(
    table_dir: str,
    spark_schema,
    partition_col: str = "partition",
    now_ms: int | None = None,
    stats_blobs: list[tuple[str, bytes]] | None = None,
    files: list[str] | None = None,
    summary_extra: dict | None = None,
    catalog=None,
    table_name: str | None = None,
    branch: str | None = None,
    max_commit_retries: int = 3,
) -> dict:
    """Append-commit every not-yet-committed parquet data file under
    ``table_dir`` into the table's Iceberg metadata, creating the table
    metadata on first call (`IcebergTableManager.java:46-95` semantics:
    create-if-absent, then an appendFiles transaction). Returns the new
    TableMetadata dict. Idempotent: a commit with zero new files writes
    nothing and returns the current metadata.

    ``branch="audit"`` commits to that branch instead of ``main`` —
    the write-audit-publish (WAP) pattern: staged snapshots chain off
    the branch head (auto-created at the current main head on first
    use), ``main`` and the snapshot-log are untouched, readers of the
    table see nothing until :func:`fast_forward` publishes the branch.
    Branch discovery commits dedup against EVERY ref head, so a file
    committed on one branch is never re-swept into another.

    Each snapshot also gets a Puffin statistics file
    (`SegmentManifestWriter.java:35-112` parity): a FILE_LIST blob (JSON
    of the snapshot's new data files) plus any caller-provided
    ``stats_blobs`` (e.g. the segment aux indexes, reference
    `BlobTypes.java` names), registered under the metadata's
    ``statistics`` field as the spec requires.

    With ``catalog`` (a ``rest_catalog.RestCatalogClient``), the commit
    routes through the Iceberg REST-catalog protocol instead of the
    version-hint file layout: the writer still stages manifests /
    manifest lists / Puffin stats in storage, but the metadata pointer
    advances via ``POST /v1/namespaces/{ns}/tables/{t}`` with
    requirements + updates, and a 409 (a concurrent writer won the race)
    triggers reload-and-rebase up to ``max_commit_retries`` times —
    the reference's catalog-service commit path
    (`RemoteStorageManagerConfig.java:261-284`,
    `IcebergTableManager.java:46-95`)."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        CommitConflictError,
    )

    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    now_ms = int(time.time() * 1000) if now_ms is None else now_ms
    if catalog is not None and table_name is None:
        table_name = _default_table_name(table_dir)

    last_err: Exception | None = None
    for _attempt in range(max_commit_retries):
        prior = _load_prior_state(table_dir, catalog, table_name)
        try:
            return _commit_append_once(
                table_dir, spark_schema, partition_col, now_ms, stats_blobs,
                files, summary_extra, catalog, table_name, meta_dir, prior,
                branch,
            )
        except CommitConflictError as e:
            last_err = e  # reload + rebase on the next iteration
    assert last_err is not None
    raise last_err


def _commit_append_once(
    table_dir: str,
    spark_schema,
    partition_col: str,
    now_ms: int,
    stats_blobs,
    files,
    summary_extra,
    catalog,
    table_name,
    meta_dir: str,
    prior,
    branch: str | None = None,
) -> dict:
    if branch == "main":
        branch = None  # explicit main is just the default path
    if branch is not None and prior is None:
        raise ValueError(
            "cannot commit to a branch before the table exists — make "
            "the first (table-creating) commit on main"
        )
    if prior is None:
        version = 1
        schema_struct, last_col = spark_schema_to_iceberg(spark_schema)
        table_uuid = str(uuid.uuid5(uuid.NAMESPACE_URL, "iceberg:" + table_dir))
        base = {
            "format-version": FORMAT_VERSION,
            "table-uuid": table_uuid,
            "location": table_dir,
            "last-sequence-number": 0,
            "last-updated-ms": now_ms,
            "last-column-id": last_col,
            "current-schema-id": 0,
            "schemas": [schema_struct],
            "default-spec-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": partition_col,
                            "transform": "identity",
                            "source-id": _field_id(schema_struct, partition_col),
                            "field-id": 1000,
                        }
                    ],
                }
            ],
            "last-partition-id": 1000,
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {"write.format.default": "parquet"},
            "current-snapshot-id": -1,
            "refs": {},
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
        }
        known: set[str] = set()
    else:
        version, base = prior["version"], prior["metadata"]
        known = {
            e["data_file"]["file_path"]
            for m in prior["manifests"]
            for e in m["entries"]
        }
        version += 1

    if files is not None:
        # EXPLICIT file list (the streaming-commit path): only these
        # files enter the snapshot — crashed-attempt orphans on disk are
        # never swept in (vs. the discovery mode below, which commits
        # everything on disk not yet known to the metadata). Footers are
        # read for exactly the listed files — O(batch), not O(table) —
        # so per-micro-batch commit cost does not grow with table age.
        all_files = _stat_data_files(sorted(set(files)), partition_col)
    else:
        all_files = _discover_data_files(table_dir, partition_col)
    parent_id = (
        base.get("current-snapshot-id", -1) if prior is not None else -1
    )
    base_refs = base.get("refs") or {} if prior is not None else {}
    if branch is not None:
        ref = base_refs.get(branch)
        if ref is not None:
            if ref.get("type") == "tag":
                raise ValueError(f"ref {branch!r} is a tag, not a branch")
            parent_id = int(ref["snapshot-id"])
        # else: first commit to this branch forks it off the main head
        # (parent_id stays the current snapshot) — WAP auto-create
    if prior is not None:
        # staged lineages — branch snapshots, including ones orphaned
        # by a dropped branch — hold files that sit in the hive dirs
        # without appearing on main's lineage; discovery must dedup
        # against them or the next commit re-sweeps audit-rejected
        # rows into main. Tag heads lie ON main's lineage and are
        # already covered by prior["manifests"], so a mere release tag
        # costs nothing; only genuinely stray snapshots are read, and
        # the head's already-parsed manifests seed the cache.
        by_id = {s["snapshot-id"]: s for s in base["snapshots"]}
        main_lineage: set = set()
        node = base.get("current-snapshot-id", -1)
        while node in by_id:
            main_lineage.add(node)
            node = by_id[node].get("parent-snapshot-id")
        stray = [
            s
            for s in base["snapshots"]
            if s["snapshot-id"] not in main_lineage
        ]
        if stray:
            seen_manifest_paths = {
                m["file"]["manifest_path"] for m in prior["manifests"]
            }
            for s in stray:
                _, mfs, _ = read_avro_ocf(s["manifest-list"])
                for mf in mfs:
                    if mf["manifest_path"] in seen_manifest_paths:
                        continue
                    seen_manifest_paths.add(mf["manifest_path"])
                    _, es, _ = read_avro_ocf(mf["manifest_path"])
                    known |= {e["data_file"]["file_path"] for e in es}
    new_files = [f for f in all_files if f["file_path"] not in known]
    # schema evolution on append (add-as-optional + required->optional
    # relaxation; reference `SchemaUpdate.java` intent, wired here):
    # existing field ids are stable, added columns get fresh ids in a
    # NEW schema version. Runs BEFORE the zero-new-files return so an
    # evolved schema is never silently discarded.
    schema_changed = False
    cur_sid = base["current-schema-id"]
    cur_schema = next(s for s in base["schemas"] if s["schema-id"] == cur_sid)
    if prior is not None:
        evolved, new_last, schema_changed = evolve_iceberg_schema(
            cur_schema, spark_schema, base["last-column-id"]
        )
        if schema_changed and branch is not None:
            # current-schema-id is table-level: evolving it from a
            # staged commit would publish the schema change to main
            # readers immediately, breaking WAP's nothing-visible
            # promise — evolve on main first, then stage
            raise ValueError(
                "schema evolution inside a branch commit would be "
                "visible to main readers before publish; commit the "
                "schema change on main first"
            )
        if schema_changed:
            new_sid = max(s["schema-id"] for s in base["schemas"]) + 1
            evolved = {**evolved, "schema-id": new_sid}
            base = {
                **base,
                "schemas": base["schemas"] + [evolved],
                "current-schema-id": new_sid,
                "last-column-id": new_last,
            }

    if not new_files:
        if prior is None:  # empty table: metadata without a snapshot
            if catalog is not None:
                catalog.ensure_namespace()
                catalog.create_table(table_name, base)
            else:
                _write_metadata_version(meta_dir, 1, base)
        elif schema_changed:
            # metadata-only commit: the schema version advances even
            # though no data files entered
            base = dict(base)
            base["last-updated-ms"] = now_ms
            if catalog is not None:
                resp = catalog.commit_table(
                    table_name,
                    _commit_requirements(prior["metadata"]),
                    _schema_updates(base),
                    now_ms,
                )
                return resp["metadata"]
            _write_metadata_version(meta_dir, version, base)
        return base

    # snapshot-log monotonicity: after a lost race the rebased commit
    # may carry a caller clock EARLIER than the rival's snapshot; a
    # non-monotonic log would make TIMESTAMP AS OF resolve a child for a
    # timestamp that predates its parent. Clamp to the newest snapshot.
    newest_ts = max((s["timestamp-ms"] for s in base["snapshots"]), default=0)
    now_ms = max(now_ms, newest_ts)
    seq = base["last-sequence-number"] + 1
    snapshot_id = seq  # deterministic; any unique long is spec-legal
    # staged metadata files get a per-attempt random token (real Iceberg
    # embeds a commit uuid in manifest/list names): two concurrent
    # catalog writers that loaded the same base state must never collide
    # on staged paths — a colliding loser would overwrite the winner's
    # already-committed manifest before its own commit is rejected.
    commit_uuid = uuid.uuid4().hex[:16]
    entry_schema = manifest_entry_schema(partition_col)
    schema_struct = _current_schema_struct(base)
    leaf_ids = _leaf_field_ids(schema_struct)
    entries = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0,  # DATA
                "file_path": f["file_path"],
                "file_format": "PARQUET",
                "partition": {partition_col: f["partition_value"]},
                "record_count": f["record_count"],
                "file_size_in_bytes": f["file_size_in_bytes"],
                **_column_stats_fields(f.get("column_stats") or {}, leaf_ids),
                "split_offsets": f["split_offsets"],
                "equality_ids": None,
                "sort_order_id": 0,
            },
        }
        for f in new_files
    ]
    spec = base["partition-specs"][0]
    manifest_path = os.path.join(
        meta_dir, f"{base['table-uuid']}-m{seq}-{commit_uuid}.avro"
    )
    manifest_len = write_avro_ocf(
        manifest_path,
        entry_schema,
        entries,
        {
            "schema": json.dumps(schema_struct).encode(),
            "schema-id": str(base["current-schema-id"]).encode(),
            "partition-spec": json.dumps(spec["fields"]).encode(),
            "partition-spec-id": b"0",
            "format-version": str(FORMAT_VERSION).encode(),
            "content": b"data",
        },
    )

    parts = [f["partition_value"] for f in new_files]
    non_null = [p for p in parts if p is not None] or [0]
    lo, hi = min(non_null), max(non_null)
    added_rows = sum(f["record_count"] for f in new_files)
    manifest_file = {
        "manifest_path": manifest_path,
        "manifest_length": manifest_len,
        "partition_spec_id": 0,
        "content": 0,  # data manifest
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_data_files_count": len(new_files),
        "existing_data_files_count": 0,
        "deleted_data_files_count": 0,
        "added_rows_count": added_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": [
            {
                "contains_null": any(p is None for p in parts),
                "contains_nan": False,
                "lower_bound": struct.pack("<i", lo),
                "upper_bound": struct.pack("<i", hi),
            }
        ],
    }
    # a snapshot's manifest list carries its PARENT's manifests too
    # (existing files stay live across an append); for a branch commit
    # the parent is the branch head, not main
    prior_manifest_files = []
    if prior is not None and parent_id != -1:
        cur = next(
            s for s in base["snapshots"] if s["snapshot-id"] == parent_id
        )
        _, prior_manifest_files, _ = read_avro_ocf(cur["manifest-list"])
    list_path = os.path.join(
        meta_dir, f"snap-{snapshot_id}-1-{commit_uuid}.avro"
    )
    write_avro_ocf(
        list_path,
        MANIFEST_FILE_SCHEMA,
        [manifest_file] + prior_manifest_files,
        {
            "format-version": str(FORMAT_VERSION).encode(),
            "snapshot-id": str(snapshot_id).encode(),
            "sequence-number": str(seq).encode(),
            "parent-snapshot-id": str(parent_id).encode(),
        },
    )

    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": list_path,
        "schema-id": base["current-schema-id"],
        "summary": {
            "operation": "append",
            "added-data-files": str(len(new_files)),
            "added-records": str(added_rows),
            "total-records": str(
                added_rows
                + _prev_summary_counter(base, "total-records", parent_id)
            ),
            "total-position-deletes": str(
                _prev_summary_counter(
                    base, "total-position-deletes", parent_id
                )
            ),
            "total-equality-deletes": str(
                _prev_summary_counter(
                    base, "total-equality-deletes", parent_id
                )
            ),
            **{k: str(v) for k, v in (summary_extra or {}).items()},
        },
    }
    if parent_id != -1:
        snapshot["parent-snapshot-id"] = parent_id

    from tiered_storage_for_apache_kafka_spark.sources.puffin import (
        FILE_LIST,
        write_puffin,
    )

    file_list = [
        {
            "location": f["file_path"],
            "partition": f["partition_value"],
            "recordCount": f["record_count"],
            "fileSizeInBytes": f["file_size_in_bytes"],
        }
        for f in new_files
    ]
    stats_path = os.path.join(
        meta_dir, f"stats-{snapshot_id}-{commit_uuid}.puffin"
    )
    stats = write_puffin(
        stats_path,
        [(FILE_LIST, json.dumps(file_list).encode())] + list(stats_blobs or []),
        snapshot_id,
        seq,
    )

    meta = dict(base)
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = now_ms
    meta["snapshots"] = base["snapshots"] + [snapshot]
    stat_entry = {
        "snapshot-id": snapshot_id,
        "statistics-path": stats_path,
        "file-size-in-bytes": stats["file_size"],
        "file-footer-size-in-bytes": stats["footer_size"],
        "blob-metadata": stats["blob_metadata"],
    }
    meta["statistics"] = base.get("statistics", []) + [stat_entry]
    if branch is None:
        meta["current-snapshot-id"] = snapshot_id
        meta["refs"] = _advance_main(base.get("refs"), snapshot_id)
        # the snapshot-log tracks current-snapshot-id changes only
        # (spec) — staged branch commits stay out of TIMESTAMP AS OF
        meta["snapshot-log"] = base["snapshot-log"] + [
            {"timestamp-ms": now_ms, "snapshot-id": snapshot_id}
        ]
    else:
        refs = dict(base.get("refs") or {})
        refs[branch] = {"snapshot-id": snapshot_id, "type": "branch"}
        meta["refs"] = refs
    if prior is not None:
        meta["metadata-log"] = base["metadata-log"] + [
            {
                "timestamp-ms": base["last-updated-ms"],
                "metadata-file": os.path.join(
                    meta_dir, f"v{version - 1}.metadata.json"
                ),
            }
        ]

    if catalog is not None:
        # REST-catalog commit: manifests/stats are already staged in
        # storage; only the metadata pointer moves, and only if our
        # parent snapshot is still the head (optimistic concurrency)
        requirements = _commit_requirements(
            None if prior is None else prior["metadata"], base, branch=branch
        )
        updates = []
        if schema_changed:
            updates += _schema_updates(base)
        updates += [
            {"action": "add-snapshot", "snapshot": snapshot},
            {
                "action": "set-snapshot-ref",
                "ref-name": branch if branch is not None else "main",
                "type": "branch",
                "snapshot-id": snapshot_id,
            },
            {"action": "set-statistics", "statistics": stat_entry},
        ]
        if prior is None:
            catalog.ensure_namespace()
            catalog.create_table(table_name, base)
        resp = catalog.commit_table(table_name, requirements, updates, now_ms)
        return resp["metadata"]

    _write_metadata_version(meta_dir, version, meta)
    return meta


def _commit_requirements(
    prior_meta: dict | None,
    created_base: dict | None = None,
    branch: str | None = None,
) -> list[dict]:
    """CommitTableRequest requirements: pin the table uuid and require
    the ref being MOVED to still point at the parent snapshot we built
    against (None = ref must not exist yet) — the optimistic-
    concurrency contract, matching real Iceberg's UpdateRequirements:
    a branch (WAP) commit asserts only its own branch head, so an
    unrelated writer advancing main never spuriously conflicts a
    staged commit; two concurrent writers to the SAME ref still
    conflict rather than silently orphaning one snapshot."""
    if prior_meta is None:
        # table was just created in this commit; main must be unset
        return [
            {"type": "assert-table-uuid", "uuid": created_base["table-uuid"]},
            {"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": None},
        ]
    moved_ref = branch if branch is not None else "main"
    head = (
        (prior_meta.get("refs") or {}).get(moved_ref, {}).get("snapshot-id")
    )
    return [
        {"type": "assert-table-uuid", "uuid": prior_meta["table-uuid"]},
        {
            "type": "assert-ref-snapshot-id",
            "ref": moved_ref,
            "snapshot-id": head,
        },
    ]


def _schema_updates(base: dict) -> list[dict]:
    """add-schema + set-current-schema updates for an evolved schema
    (the last schema in ``base`` is the one evolution just appended)."""
    return [
        {
            "action": "add-schema",
            "schema": base["schemas"][-1],
            "last-column-id": base["last-column-id"],
        },
        {"action": "set-current-schema", "schema-id": base["current-schema-id"]},
    ]


def _apply_equality_deletes(spark, df_pos, data_entries, eq_entries, meta):
    """Merge-on-read for **equality-delete files** (content=2): a data
    row is dropped when some equality-delete row in the SAME partition
    matches it on every equality column (null-safe, the spec's
    IS NOT DISTINCT FROM semantics) and the delete's sequence number is
    STRICTLY greater than the data file's (vs <= for position deletes —
    an equality delete never touches rows committed with it or after
    it, which is what makes CDC upserts [delete key + re-append] safe
    in one or adjacent commits).

    Scale shape: delete files are small key sets — broadcast; the data
    side attaches its per-file sequence number via a broadcast O(files)
    map and anti-joins without re-shuffling the corpus."""
    from pyspark.sql import functions as F

    schema_struct = _current_schema_struct(meta)
    id_to_name = {f["id"]: f["name"] for f in schema_struct["fields"]}
    ids_set = {tuple(d["equality_ids"]) for d in eq_entries}
    if len(ids_set) != 1:
        raise NotImplementedError(
            f"mixed equality_ids across delete files: {sorted(ids_set)}"
        )
    eq_cols = [id_to_name[i] for i in next(iter(ids_set))]
    partition_col = meta["partition-specs"][0]["fields"][0]["name"]

    del_meta = spark.createDataFrame(
        sorted(
            {
                (d["file_path"], d["_seq"], d["partition"].get(partition_col))
                for d in eq_entries
            }
        ),
        "__iceberg_dfile string, __iceberg_del_seq bigint, __iceberg_del_part int",
    )
    data_seq = spark.createDataFrame(
        [(d["file_path"], d["_seq"]) for d in data_entries],
        "__iceberg_file string, __iceberg_data_seq bigint",
    )
    dels = (
        spark.read.parquet(*sorted({d["file_path"] for d in eq_entries}))
        .select(
            *[F.col(c).alias(f"__eq_{c}") for c in eq_cols],
            F.regexp_replace(
                F.col("_metadata.file_path"), _NORM_FILE_RE, "/"
            ).alias("__iceberg_dfile"),
        )
        .join(F.broadcast(del_meta), "__iceberg_dfile")
    )
    df2 = df_pos.join(F.broadcast(data_seq), "__iceberg_file")
    cond = df2["__iceberg_data_seq"] < dels["__iceberg_del_seq"]
    cond = cond & df2[partition_col].eqNullSafe(dels["__iceberg_del_part"])
    for c in eq_cols:
        cond = cond & df2[c].eqNullSafe(dels[f"__eq_{c}"])
    # callers drop __iceberg_file/__iceberg_pos once all delete layers
    # have been applied
    return df2.join(dels, cond, "left_anti").drop("__iceberg_data_seq")


# -- row-level deletes: v2 position-delete files (merge-on-read) --------------


def _prev_summary_counter(
    meta: dict, key: str, at_snapshot_id: int | None = None
) -> int:
    """Running counter from a snapshot's summary — the CURRENT one by
    default, or an explicit lineage head (branch commits chain their
    totals off the branch parent, not off main)."""
    cur_id = (
        meta.get("current-snapshot-id", -1)
        if at_snapshot_id is None
        else at_snapshot_id
    )
    if cur_id == -1:
        return 0
    cur = next((s for s in meta["snapshots"] if s["snapshot-id"] == cur_id), None)
    if cur is None:
        return 0
    return int(cur["summary"].get(key, 0))


def _prev_total_pos_deletes(meta: dict) -> int:
    return _prev_summary_counter(meta, "total-position-deletes")


def write_position_deletes(
    spark,
    table_dir: str,
    predicate,
    partition_col: str = "partition",
    meta: dict | None = None,
) -> list[dict]:
    """Plan and write spec-shaped **position-delete files** for every
    current-snapshot row matching ``predicate`` (a Spark SQL string or
    Column over the table schema). Fully declarative and distributed:
    the match scan is a native parquet read projecting only the
    predicate columns plus the hidden ``_metadata`` file/row-index
    columns (Catalyst prunes the rest), and each partition's matches
    are written by one Arrow task as a parquet file with the spec's
    exact shape — columns ``file_path`` (field id 2147483546) and
    ``pos`` (field id 2147483545), sorted by (file_path, pos), stored
    beside the data files in the partition dir (spec "Position Delete
    Files"). Returns per-file stats for :func:`commit_position_deletes`;
    rows that match nothing produce no files. At 100 TB you would
    additionally shard each partition's writer by a file-path bucket;
    one file per partition per call is the spec-minimal baseline."""
    from pyspark.sql import functions as F

    if meta is None:
        _v, meta, _t = _current_state_meta(table_dir)
    if meta.get("current-snapshot-id", -1) == -1:
        return []
    cur = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    data, deletes = _plan_snapshot(cur, None)
    if not data:
        return []
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    df = _read_with_positions(spark, table_dir, meta, [d["file_path"] for d in data])
    # match against the MERGED view: a row already deleted (by either
    # kind) must not re-match (duplicate delete rows are spec-legal but
    # inflate added-position-deletes and every later delete scan)
    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
        apply_deletion_vectors,
        split_position_deletes,
    )

    eq = [d for d in deletes if d.get("content") == 2]
    pos, dv = split_position_deletes(deletes)
    if eq:
        df = _apply_equality_deletes(
            spark, df, data, eq, meta
        )
    if pos:
        df = _apply_position_deletes(
            spark, df, data, pos
        )
    if dv:
        df = apply_deletion_vectors(spark, df, data, dv)
    part_map = spark.createDataFrame(
        [(d["file_path"], d["partition"].get(partition_col)) for d in data],
        "__iceberg_file string, __iceberg_part int",
    )
    matches = (
        df.where(cond)
        .select("__iceberg_file", "__iceberg_pos")
        .join(F.broadcast(part_map), "__iceberg_file")
    )
    token = uuid.uuid4().hex[:16]

    def _write_group(pdf):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = pdf.sort_values(["__iceberg_file", "__iceberg_pos"])
        part = pdf["__iceberg_part"].iloc[0]
        part = None if pd.isna(part) else int(part)
        part_dir = (
            f"{partition_col}={part}"
            if part is not None
            else f"{partition_col}=__HIVE_DEFAULT_PARTITION__"
        )
        out_dir = os.path.join(table_dir, "deletes", part_dir)
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"delete-{token}-p{part}.parquet")
        schema = pa.schema(
            [
                pa.field(
                    "file_path",
                    pa.string(),
                    nullable=False,
                    metadata={b"PARQUET:field_id": b"2147483546"},
                ),
                pa.field(
                    "pos",
                    pa.int64(),
                    nullable=False,
                    metadata={b"PARQUET:field_id": b"2147483545"},
                ),
            ]
        )
        tbl = pa.Table.from_arrays(
            [
                pa.array(pdf["__iceberg_file"], pa.string()),
                pa.array(pdf["__iceberg_pos"], pa.int64()),
            ],
            schema=schema,
        )
        pq.write_table(tbl, path, compression="zstd")
        return pd.DataFrame(
            [[path, part, len(pdf), os.path.getsize(path)]],
            columns=["delete_path", "partition", "n_rows", "file_size"],
        )

    stats = matches.groupBy("__iceberg_part").applyInPandas(
        _write_group,
        "delete_path string, partition int, n_rows bigint, file_size bigint",
    )
    return [r.asDict() for r in stats.collect()]


def commit_position_deletes(
    spark,
    table_dir: str,
    predicate,
    partition_col: str = "partition",
    now_ms: int | None = None,
    catalog=None,
    table_name: str | None = None,
    max_commit_retries: int = 3,
) -> dict:
    """Row-level DELETE as an Iceberg v2 **row-delta commit**: write
    position-delete files for the matching rows (merge-on-read — data
    files are never rewritten; `DELETE FROM t WHERE ...` semantics) and
    commit them as a new snapshot whose manifest list adds a DELETE
    manifest (content=1). Matching zero rows returns the current
    metadata unchanged — no empty snapshot. With ``catalog``, the
    pointer moves through the REST-catalog protocol and a lost race
    reloads, RE-PLANS the deletes against the new head (the predicate
    must evaluate against the data files that are actually current),
    and retries; a lost attempt's staged delete files stay behind as
    unreferenced orphans, the same crash-safe failure mode as staged
    append manifests."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        CommitConflictError,
    )

    now_ms = int(time.time() * 1000) if now_ms is None else now_ms
    if catalog is not None and table_name is None:
        table_name = _default_table_name(table_dir)
    last_err: Exception | None = None
    for _attempt in range(max_commit_retries if catalog is not None else 1):
        version, base, table_name = _current_state_meta(
            table_dir, catalog, table_name
        )
        stats = write_position_deletes(
            spark, table_dir, predicate, partition_col, meta=base
        )
        if not stats:
            return base
        try:
            return _commit_deletes_once(
                table_dir, version, base, stats, partition_col, now_ms,
                catalog, table_name,
            )
        except CommitConflictError as e:
            last_err = e
    assert last_err is not None
    raise last_err


def write_equality_deletes(
    spark,
    table_dir: str,
    keys_df,
    equality_cols: list[str],
    partition_col: str = "partition",
    meta: dict | None = None,
) -> list[dict]:
    """Write spec-shaped **equality-delete files** (content=2) for the
    key rows in ``keys_df`` — the CDC-writer primitive: delete every
    row matching a key WITHOUT scanning the data (vs position deletes,
    which cost one corpus scan to plan). ``keys_df`` must carry the
    equality columns plus the partition column (an equality delete is
    scoped to its partition, per spec); each partition's distinct keys
    are written by one Arrow task as a parquet file of exactly the
    equality columns, with their Iceberg field ids, sorted. Returns
    stats (with ``equality_ids``) for :func:`commit_equality_deletes`."""
    if meta is None:
        _v, meta, _t = _current_state_meta(table_dir)
    if meta.get("current-snapshot-id", -1) == -1:
        # no data has ever been committed: an equality delete applies
        # only to data files with a strictly lower sequence number, so
        # there is nothing to delete — no-op (mirrors the position-
        # delete path) instead of writing orphan files and crashing in
        # _commit_deletes_once's current-snapshot lookup
        return []
    schema_struct = _current_schema_struct(meta)
    ids = [_field_id(schema_struct, c) for c in equality_cols]
    missing = [
        c for c in [partition_col, *equality_cols] if c not in keys_df.columns
    ]
    if missing:
        raise ValueError(f"keys_df lacks columns {missing}")
    token = uuid.uuid4().hex[:16]
    cols = list(equality_cols)

    def _write_group(pdf):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        part = pdf[partition_col].iloc[0]
        part = None if pd.isna(part) else int(part)
        part_dir = (
            f"{partition_col}={part}"
            if part is not None
            else f"{partition_col}=__HIVE_DEFAULT_PARTITION__"
        )
        out_dir = os.path.join(table_dir, "deletes", part_dir)
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"delete-eq-{token}-p{part}.parquet")
        body = pdf[cols].sort_values(cols).reset_index(drop=True)
        tbl = pa.Table.from_pandas(body, preserve_index=False)
        fields = [
            f.with_metadata(
                {b"PARQUET:field_id": str(ids[cols.index(f.name)]).encode()}
            )
            for f in tbl.schema
        ]
        tbl = tbl.cast(pa.schema(fields))
        pq.write_table(tbl, path, compression="zstd")
        return pd.DataFrame(
            [[path, part, len(body), os.path.getsize(path)]],
            columns=["delete_path", "partition", "n_rows", "file_size"],
        )

    stats = (
        keys_df.select(partition_col, *equality_cols)
        .distinct()
        .groupBy(partition_col)
        .applyInPandas(
            _write_group,
            "delete_path string, partition int, n_rows bigint, file_size bigint",
        )
    )
    return [{**r.asDict(), "equality_ids": ids} for r in stats.collect()]


def commit_equality_deletes(
    spark,
    table_dir: str,
    keys_df,
    equality_cols: list[str],
    partition_col: str = "partition",
    now_ms: int | None = None,
    catalog=None,
    table_name: str | None = None,
    max_commit_retries: int = 3,
) -> dict:
    """Row-level DELETE by key as an Iceberg v2 row-delta commit of
    equality-delete files — the upsert building block real CDC writers
    (Flink CDC into Iceberg) use: commit the delete of a key set
    without reading the data, then append the replacement rows; the
    strict sequence-number rule (applies only to data files with seq
    STRICTLY below the delete's) guarantees the replacements survive.
    An empty key set returns the current metadata unchanged."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        CommitConflictError,
    )

    now_ms = int(time.time() * 1000) if now_ms is None else now_ms
    if catalog is not None and table_name is None:
        table_name = _default_table_name(table_dir)
    last_err: Exception | None = None
    for _attempt in range(max_commit_retries if catalog is not None else 1):
        version, base, table_name = _current_state_meta(
            table_dir, catalog, table_name
        )
        stats = write_equality_deletes(
            spark, table_dir, keys_df, equality_cols, partition_col, meta=base
        )
        if not stats:
            return base
        try:
            return _commit_deletes_once(
                table_dir, version, base, stats, partition_col, now_ms,
                catalog, table_name,
            )
        except CommitConflictError as e:
            last_err = e
    assert last_err is not None
    raise last_err


def _commit_deletes_once(
    table_dir: str,
    version: int,
    base: dict,
    stats: list[dict],
    partition_col: str,
    now_ms: int,
    catalog,
    table_name: str | None,
) -> dict:
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    newest_ts = max((s["timestamp-ms"] for s in base["snapshots"]), default=0)
    now_ms = max(now_ms, newest_ts)  # snapshot-log monotonicity clamp
    seq = base["last-sequence-number"] + 1
    snapshot_id = seq
    commit_uuid = uuid.uuid4().hex[:16]
    entries = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                # 1 = POSITION_DELETES, 2 = EQUALITY_DELETES
                "content": 2 if s.get("equality_ids") else 1,
                "file_path": s["delete_path"],
                "file_format": "PARQUET",
                "partition": {partition_col: s["partition"]},
                "record_count": s["n_rows"],
                "file_size_in_bytes": s["file_size"],
                "value_counts": None,
                "null_value_counts": None,
                "lower_bounds": None,
                "upper_bounds": None,
                "split_offsets": None,
                "equality_ids": s.get("equality_ids") or None,
                "sort_order_id": None,
            },
        }
        for s in sorted(stats, key=lambda s: s["delete_path"])
    ]
    schema_struct = _current_schema_struct(base)
    spec = base["partition-specs"][0]
    manifest_path = os.path.join(
        meta_dir, f"{base['table-uuid']}-d{seq}-{commit_uuid}.avro"
    )
    manifest_len = write_avro_ocf(
        manifest_path,
        manifest_entry_schema(partition_col),
        entries,
        {
            "schema": json.dumps(schema_struct).encode(),
            "schema-id": str(base["current-schema-id"]).encode(),
            "partition-spec": json.dumps(spec["fields"]).encode(),
            "partition-spec-id": b"0",
            "format-version": str(FORMAT_VERSION).encode(),
            "content": b"deletes",
        },
    )
    return _finish_delete_commit(
        table_dir, version, base, stats, now_ms, catalog, table_name,
        seq, snapshot_id, commit_uuid, manifest_path, manifest_len,
        len(entries),
    )


def _finish_delete_commit(
    table_dir: str,
    version: int,
    base: dict,
    stats: list[dict],
    now_ms: int,
    catalog,
    table_name: str | None,
    seq: int,
    snapshot_id: int,
    commit_uuid: str,
    manifest_path: str,
    manifest_len: int,
    n_entries: int,
    prior_manifests: list[dict] | None = None,
    removed_pos_deletes: int = 0,
    summary_extra: dict | None = None,
) -> dict:
    """Shared tail of every delete-flavored commit (v2 parquet
    row-deltas and v3-style deletion vectors): build the DELETE
    manifest-list entry, chain the snapshot, bump the delete counters,
    register the FILE_LIST statistics Puffin, and move the pointer
    (catalog protocol or local version write).

    ``prior_manifests`` overrides the carried-over manifest list (the
    DV supersede path rewrites prior delete manifests to tombstone the
    replaced DV entries); ``removed_pos_deletes`` is subtracted from
    the running total (a superseding DV's cardinality includes the
    union of the old one, which must not double-count)."""
    meta_dir = os.path.join(table_dir, "metadata")
    parts = [s["partition"] for s in stats]
    non_null = [p for p in parts if p is not None] or [0]
    n_del_rows = sum(int(s["n_rows"]) for s in stats)
    n_pos = sum(int(s["n_rows"]) for s in stats if not s.get("equality_ids"))
    n_eq = n_del_rows - n_pos
    delete_manifest = {
        "manifest_path": manifest_path,
        "manifest_length": manifest_len,
        "partition_spec_id": 0,
        "content": 1,  # DELETES manifest
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_data_files_count": n_entries,
        "existing_data_files_count": 0,
        "deleted_data_files_count": 0,
        "added_rows_count": n_del_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": [
            {
                "contains_null": any(p is None for p in parts),
                "contains_nan": False,
                "lower_bound": struct.pack("<i", min(non_null)),
                "upper_bound": struct.pack("<i", max(non_null)),
            }
        ],
    }
    if prior_manifests is None:
        cur = next(
            s
            for s in base["snapshots"]
            if s["snapshot-id"] == base["current-snapshot-id"]
        )
        _, prior_manifest_files, _ = read_avro_ocf(cur["manifest-list"])
    else:
        prior_manifest_files = prior_manifests
    list_path = os.path.join(meta_dir, f"snap-{snapshot_id}-1-{commit_uuid}.avro")
    write_avro_ocf(
        list_path,
        MANIFEST_FILE_SCHEMA,
        [delete_manifest] + prior_manifest_files,
        {
            "format-version": str(FORMAT_VERSION).encode(),
            "snapshot-id": str(snapshot_id).encode(),
            "sequence-number": str(seq).encode(),
            "parent-snapshot-id": str(base["current-snapshot-id"]).encode(),
        },
    )
    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": list_path,
        "schema-id": base["current-schema-id"],
        "parent-snapshot-id": base["current-snapshot-id"],
        "summary": {
            "operation": "delete",
            "added-delete-files": str(n_entries),
            "added-position-deletes": str(n_pos),
            "added-equality-deletes": str(n_eq),
            "total-position-deletes": str(
                _prev_total_pos_deletes(base) + n_pos - removed_pos_deletes
            ),
            "total-equality-deletes": str(
                _prev_summary_counter(base, "total-equality-deletes") + n_eq
            ),
            "total-records": str(_prev_total_records(base)),
            **{k: str(v) for k, v in (summary_extra or {}).items()},
        },
    }

    from tiered_storage_for_apache_kafka_spark.sources.puffin import (
        FILE_LIST,
        write_puffin,
    )

    stats_path = os.path.join(meta_dir, f"stats-{snapshot_id}-{commit_uuid}.puffin")
    file_list = [
        {
            "location": s["delete_path"],
            "partition": s["partition"],
            "recordCount": int(s["n_rows"]),
            "fileSizeInBytes": int(s["file_size"]),
        }
        for s in stats
    ]
    pstats = write_puffin(
        stats_path, [(FILE_LIST, json.dumps(file_list).encode())], snapshot_id, seq
    )
    stat_entry = {
        "snapshot-id": snapshot_id,
        "statistics-path": stats_path,
        "file-size-in-bytes": pstats["file_size"],
        "file-footer-size-in-bytes": pstats["footer_size"],
        "blob-metadata": pstats["blob_metadata"],
    }

    meta = dict(base)
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = now_ms
    meta["current-snapshot-id"] = snapshot_id
    meta["snapshots"] = base["snapshots"] + [snapshot]
    meta["statistics"] = base.get("statistics", []) + [stat_entry]
    meta["refs"] = _advance_main(base.get("refs"), snapshot_id)
    meta["snapshot-log"] = base["snapshot-log"] + [
        {"timestamp-ms": now_ms, "snapshot-id": snapshot_id}
    ]
    meta["metadata-log"] = base.get("metadata-log", []) + [
        {
            "timestamp-ms": base["last-updated-ms"],
            "metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
        }
    ]

    if catalog is not None:
        updates = [
            {"action": "add-snapshot", "snapshot": snapshot},
            {
                "action": "set-snapshot-ref",
                "ref-name": "main",
                "type": "branch",
                "snapshot-id": snapshot_id,
            },
            {"action": "set-statistics", "statistics": stat_entry},
        ]
        resp = catalog.commit_table(
            table_name, _maintenance_requirements(base), updates, now_ms
        )
        return resp["metadata"]
    _write_metadata_version(meta_dir, version + 1, meta)
    return meta


def _parse_current_manifests(meta: dict) -> tuple[list[dict], list[dict]]:
    """Current snapshot's manifest list (Avro) -> each manifest (Avro) ->
    data-file entries; shared by the file-layout and REST-catalog loaders
    (the manifests live in storage in both protocols)."""
    manifests: list[dict] = []
    manifest_files: list[dict] = []
    if meta.get("current-snapshot-id", -1) != -1:
        cur = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, manifest_files, _ = read_avro_ocf(cur["manifest-list"])
        for mf in manifest_files:
            _, entries, mmeta = read_avro_ocf(mf["manifest_path"])
            manifests.append({"file": mf, "entries": entries, "meta": mmeta})
    return manifest_files, manifests


def read_table_metadata(table_dir: str) -> dict | None:
    """Open the table the way an external HadoopCatalog reader does:
    version-hint → v{N}.metadata.json → current snapshot's manifest
    list (Avro) → each manifest (Avro) → data-file entries. Returns
    ``{"version", "metadata", "manifest_list", "manifests"}`` or None
    when no metadata exists yet."""
    hint = os.path.join(table_dir, "metadata", "version-hint.text")
    if not os.path.exists(hint):
        return None
    with open(hint) as f:
        version = int(f.read().strip())
    with open(os.path.join(table_dir, "metadata", f"v{version}.metadata.json")) as f:
        meta = json.load(f)
    manifest_files, manifests = _parse_current_manifests(meta)
    return {
        "version": version,
        "metadata": meta,
        "manifest_list": manifest_files,
        "manifests": manifests,
    }


# -- the read side: scan planning FROM the Iceberg metadata -------------------


def plan_scan(
    table_dir: str,
    partition_value: int | None = None,
    catalog=None,
    table_name: str | None = None,
    column_bounds: tuple[str, int, int] | None = None,
) -> list[dict]:
    """Plan a table scan from the Iceberg metadata alone (never listing
    the filesystem): current snapshot -> manifest list -> manifests ->
    data-file entries, with THREE levels of spec pruning (pass
    ``column_bounds=("kafka.offset", lo, hi)`` for the third: files
    whose manifest-recorded lower/upper bounds provably miss the range
    are skipped — the spec's column-stats pruning, what keeps an
    offset-window read O(overlapping files) on a sorted-write table
    regardless of table size):

    1. manifest-level: a manifest whose ``partitions`` field summary
       bounds exclude the predicate is skipped WITHOUT being opened
       (the manifest-list is the index over manifests), and
    2. file-level: surviving manifests' entries are filtered on the
       partition value.

    This is exactly how Iceberg readers avoid both file listing and
    full-metadata reads at 100k-file scale; returns the matching
    data-file dicts. Unlike :func:`read_table_metadata` (the diagnostic
    full parse), this walks lazily: only metadata.json + the manifest
    list are always read; a pruned manifest is genuinely never opened,
    and a surviving one is opened exactly once.

    With ``catalog``, the current-snapshot pointer comes from the
    catalog service (``GET .../tables/{t}``) instead of the
    version-hint file — the read-side symmetry of the REST commit path
    (a real external catalog's pointer is authoritative; a stale local
    hint must not win)."""
    if catalog is not None:
        _v, meta, table_name = _current_state_meta(table_dir, catalog, table_name)
    else:
        hint = os.path.join(table_dir, "metadata", "version-hint.text")
        if not os.path.exists(hint):
            raise FileNotFoundError(f"no Iceberg metadata under {table_dir}")
        with open(hint) as f:
            version = int(f.read().strip())
        with open(
            os.path.join(table_dir, "metadata", f"v{version}.metadata.json")
        ) as f:
            meta = json.load(f)
    return _plan_from_meta(meta, partition_value, column_bounds)


def _bounds_overlap(d: dict, field_id: int, lo: int, hi: int) -> bool:
    """File-level bounds pruning (spec lower_bounds/upper_bounds): skip
    a data file only when its recorded range PROVABLY misses [lo, hi];
    a file without bounds for the column is conservatively kept."""
    lbs, ubs = d.get("lower_bounds"), d.get("upper_bounds")
    if not lbs or not ubs:
        return True
    f_lo = next((kv["value"] for kv in lbs if kv["key"] == field_id), None)
    f_hi = next((kv["value"] for kv in ubs if kv["key"] == field_id), None)
    if f_lo is None or f_hi is None:
        return True
    fmt = "<i" if len(f_lo) == 4 else "<q"
    return struct.unpack(fmt, f_lo)[0] <= hi and lo <= struct.unpack(fmt, f_hi)[0]


def _plan_snapshot(
    snap: dict,
    partition_value: int | None,
    bounds: tuple[int, int, int] | None = None,
    tombstones_out: list[dict] | None = None,
) -> tuple[list[dict], list[dict]]:
    """Walk ONE snapshot's manifest list lazily and split its live
    entries by manifest content: ``(data_files, delete_files)``. Each
    returned dict is the entry's ``data_file`` record plus ``_seq``,
    the entry's data sequence number (inherited from the manifest when
    the entry's own field is null, as the spec's inheritance rule
    says) — the read side needs it to decide which position deletes
    apply to which data files (a delete applies only to data files
    whose sequence number is <= the delete's). Manifest-level
    partition-summary pruning applies to BOTH kinds: a pruned manifest
    is never opened.

    ``tombstones_out`` (unpruned calls only): status=2 entries are
    appended to it as FULL manifest entries with explicit sequence
    numbers, letting a maintenance op collect carried tombstones in
    the same metadata walk instead of paying the Avro reads twice."""
    _, manifest_files, _ = read_avro_ocf(snap["manifest-list"])
    data: list[dict] = []
    deletes: list[dict] = []
    for mf in manifest_files:
        if partition_value is not None and mf.get("partitions"):
            summary = mf["partitions"][0]
            lo_b, hi_b = summary.get("lower_bound"), summary.get("upper_bound")
            if lo_b is not None and hi_b is not None:
                lo = struct.unpack("<i", lo_b)[0]
                hi = struct.unpack("<i", hi_b)[0]
                if not (lo <= partition_value <= hi):
                    continue  # manifest pruned unopened
        _, entries, _ = read_avro_ocf(mf["manifest_path"])
        for e in entries:
            if e["status"] == 2:  # DELETED
                if tombstones_out is not None:
                    seq = e.get("sequence_number")
                    if seq is None:
                        seq = mf.get("sequence_number", 0)
                    tombstones_out.append(
                        {
                            **e,
                            "sequence_number": int(seq),
                            "data_file": dict(e["data_file"]),
                        }
                    )
                continue
            d = e["data_file"]
            if (
                partition_value is not None
                and d["partition"].get(next(iter(d["partition"]))) != partition_value
            ):
                continue
            is_delete = d.get("content") in (1, 2)
            if (
                bounds is not None
                and not is_delete
                and not _bounds_overlap(d, *bounds)
            ):
                continue  # data file pruned by column bounds
            seq = e.get("sequence_number")
            if seq is None:
                seq = mf.get("sequence_number", 0)
            rec = {**d, "_seq": int(seq)}
            (deletes if is_delete else data).append(rec)
    return data, deletes


def _resolve_bounds(
    meta: dict, column_bounds: tuple[str, int, int] | None
) -> tuple[int, int, int] | None:
    """(dotted column path, lo, hi) -> (field id, lo, hi) against the
    current schema; unknown columns are an explicit error (silently
    skipping the prune would be correct but hide the typo)."""
    if column_bounds is None:
        return None
    path, lo, hi = column_bounds
    schema_struct = _current_schema_struct(meta)
    fid = _leaf_field_ids(schema_struct).get(path)
    if fid is None:
        raise KeyError(f"no scalar leaf column {path!r} in the table schema")
    return (fid, lo, hi)


def _plan_from_meta(
    meta: dict,
    partition_value: int | None,
    column_bounds: tuple[str, int, int] | None = None,
) -> list[dict]:
    """The lazy manifest walk of :func:`plan_scan` over an
    already-loaded metadata dict — shared so readers that hold the
    metadata (e.g. a single catalog load) plan and type the scan from
    the SAME snapshot (no second load, no TOCTOU between plan and
    schema). Returns the DATA file entries only; position-delete files
    (manifest content=1) are planned by the snapshot readers via
    :func:`_plan_snapshot`."""
    if meta.get("current-snapshot-id", -1) == -1:
        return []
    cur = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    data, _deletes = _plan_snapshot(
        cur, partition_value, _resolve_bounds(meta, column_bounds)
    )
    return [{k: v for k, v in d.items() if k != "_seq"} for d in data]


def iceberg_schema_to_spark(schema_struct: dict):
    """Inverse of :func:`spark_schema_to_iceberg` for the types this
    writer emits — lets a reader type an EMPTY scan correctly."""
    from pyspark.sql import types as T

    prim = {
        "int": T.IntegerType(),
        "long": T.LongType(),
        "string": T.StringType(),
        "binary": T.BinaryType(),
        "boolean": T.BooleanType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "date": T.DateType(),
        "timestamptz": T.TimestampType(),
        "timestamp": T.TimestampNTZType(),
    }

    def conv(t):
        if isinstance(t, str):
            if t in prim:
                return prim[t]
            if t.startswith("decimal("):
                p, s = t[8:-1].split(",")
                return T.DecimalType(int(p), int(s))
            raise TypeError(f"unsupported Iceberg type {t!r}")
        if t["type"] == "struct":
            return T.StructType(
                [
                    T.StructField(f["name"], conv(f["type"]), not f["required"])
                    for f in t["fields"]
                ]
            )
        if t["type"] == "list":
            return T.ArrayType(conv(t["element"]), not t["element-required"])
        if t["type"] == "map":
            return T.MapType(conv(t["key"]), conv(t["value"]), not t["value-required"])
        raise TypeError(f"unsupported Iceberg type {t['type']!r}")

    return conv(schema_struct)


def read_iceberg_table(
    spark,
    table_dir: str,
    partition_value: int | None = None,
    catalog=None,
    table_name: str | None = None,
):
    """Open the table THROUGH its Iceberg metadata the way Trino/Flink
    would: plan the file set from the snapshot's manifests (plan_scan),
    then hand exactly those parquet files to Spark. Partition pruning
    happens at the metadata level — pruned files never reach the scan,
    which is the Iceberg contract (vs. Hive-style directory listing).
    An empty plan (empty partition, all files deleted, or a table with
    no snapshot yet) is a valid ZERO-ROW scan typed from the table
    schema, not an error. With ``catalog``, the snapshot pointer comes
    from the catalog service (see :func:`plan_scan`). Metadata is
    loaded exactly ONCE; the plan and the schema both derive from that
    load, so a rival commit landing mid-read cannot split them.

    Tables that carry position-delete files (a row-delta commit via
    :func:`commit_position_deletes`) are read merge-on-read: the scan
    anti-joins the delete set on (file, row position) — see
    :func:`_apply_position_deletes`."""
    _v, meta, _t = _current_state_meta(table_dir, catalog, table_name)
    if meta.get("current-snapshot-id", -1) == -1:
        return _empty_table_df(spark, meta)
    cur = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    return _read_snapshot(spark, table_dir, meta, cur, partition_value)


def plan_incremental_scan(
    table_dir: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    catalog=None,
    table_name: str | None = None,
) -> list[dict]:
    """Iceberg incremental APPEND scan (what Spark's
    ``spark.readStream.format("iceberg")`` and batch
    ``start-snapshot-id`` options plan): the data files appended
    STRICTLY AFTER ``from_snapshot_id`` up to and including
    ``to_snapshot_id`` (default: current). Selection is by data
    sequence number — robust across `rewrite_manifests`, whose
    carried-over entries keep their original sequence numbers, so
    compaction is never mistaken for new data.

    A row-delta (delete) snapshot inside the window is an explicit
    error, exactly like the Java incremental append scan: silently
    handing a consumer appended rows while hiding that other rows were
    retracted would corrupt any downstream incremental materialization.
    An expired ``from_snapshot_id`` is an error too (the changelog gap
    is unrecoverable; re-bootstrap from a full scan)."""
    _v, meta, _t = _current_state_meta(table_dir, catalog, table_name)
    return _plan_incremental_from_meta(meta, from_snapshot_id, to_snapshot_id)


def _plan_seq_window(meta: dict, lo_seq: int, hi_seq: int) -> list[dict]:
    """Data files appended with ``lo_seq < seq <= hi_seq``, planned from
    the CURRENT snapshot — correct even when every snapshot inside the
    window has been expired, because carried-over manifest entries keep
    their original sequence numbers. Shared by the batch incremental
    scan and the streaming source so their window/delete semantics can
    never drift.

    Safety: a DELETE FILE with a sequence number inside the window is
    an explicit error (rows were retracted; an append-only changelog
    cannot represent it). This checks the delete FILES themselves, not
    snapshot summaries — summaries disappear with snapshot expiration,
    the files do not.

    Scale: manifests are pruned by their sequence-number bounds before
    being opened — ``manifest.sequence_number <= lo`` means every entry
    is <= lo (entries never postdate their manifest), and
    ``min_sequence_number > hi`` means every entry is > hi — so a
    bounded window over a long history opens only the overlapping
    manifests."""
    cur_id = meta.get("current-snapshot-id", -1)
    if cur_id == -1 or hi_seq <= lo_seq:
        return []
    cur = next(s for s in meta["snapshots"] if s["snapshot-id"] == cur_id)
    _, manifest_files, _ = read_avro_ocf(cur["manifest-list"])
    # snapshots that REWROTE data files (rewrite_data_files): their
    # added files are compaction output, not logical appends — skip
    # them; conversely the data entries they tombstoned are still
    # logical appends for windows that contain the original append.
    # Like the Java IncrementalAppendScan this consults snapshot
    # summaries, so it degrades if the rewrite snapshot is expired
    # while an older window is still queried (the tombstoned DELETE
    # files keep the retraction guard itself durable).
    rewrite_ids = _data_rewrite_snapshot_ids(meta)
    out: list[dict] = []
    for mf in manifest_files:
        if int(mf.get("sequence_number", 0)) <= lo_seq:
            continue  # every entry predates the window
        if int(mf.get("min_sequence_number", 0)) > hi_seq:
            continue  # every entry postdates the window
        _, entries, _ = read_avro_ocf(mf["manifest_path"])
        for e in entries:
            seq = e.get("sequence_number")
            if seq is None:
                seq = mf.get("sequence_number", 0)
            seq = int(seq)
            if not (lo_seq < seq <= hi_seq):
                continue
            d = e["data_file"]
            # the retraction guard fires for TOMBSTONED (status=2)
            # delete files too: a DV supersede or data-file rewrite
            # tombstones the old delete entry, but the rows it
            # retracted inside the window are still retracted — the
            # tombstone must not blind the guard
            if d.get("content") in (1, 2):
                raise ValueError(
                    f"row-delta delete file {d['file_path']} has sequence "
                    f"number {seq} inside the incremental window ({lo_seq}, "
                    f"{hi_seq}]; an append-only changelog cannot represent "
                    "row retraction"
                )
            # compaction output is never a logical append, whatever its
            # status — the path marker survives snapshot expiration and
            # manifest compaction, unlike summary lookups
            compacted = _is_rewrite_output(d["file_path"], meta["location"])
            if e["status"] == 2:
                if compacted:
                    continue  # replaced output of an earlier rewrite
                if e.get("snapshot_id") in rewrite_ids:
                    # tombstoned by a data-file rewrite: compacted, not
                    # logically deleted — the file (still on disk until
                    # vacuum) serves the window's appended rows
                    out.append(dict(d))
                    continue
                raise ValueError(
                    f"data file {d['file_path']} (sequence {seq}) was "
                    f"removed inside the window ({lo_seq}, {hi_seq}] by "
                    "a snapshot this metadata no longer explains (an "
                    "expired rewrite or a foreign overwrite); cannot "
                    "certify the window append-only — re-bootstrap from "
                    "a full scan"
                )
            if compacted or e.get("snapshot_id") in rewrite_ids:
                continue  # compaction output, not a logical append
            out.append(dict(d))
    return out


def _data_rewrite_snapshot_ids(meta: dict) -> set:
    """Snapshot ids whose commit REWROTE data files (operation
    ``replace`` that deleted data files — `rewrite_data_files`;
    `rewrite_manifests` is also ``replace`` but touches no files)."""
    out = set()
    for s in meta["snapshots"]:
        summary = s.get("summary") or {}
        if (
            summary.get("operation") == "replace"
            and int(summary.get("deleted-data-files", "0") or 0) > 0
        ):
            out.add(s["snapshot-id"])
    return out


def _plan_incremental_from_meta(
    meta: dict, from_snapshot_id: int, to_snapshot_id: int | None
) -> list[dict]:
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if from_snapshot_id not in by_id:
        raise ValueError(
            f"from snapshot {from_snapshot_id} expired or never existed — "
            "re-bootstrap from a full scan"
        )
    if to_snapshot_id is None:
        to_snapshot_id = meta.get("current-snapshot-id", -1)
    if to_snapshot_id not in by_id:
        raise ValueError(f"to snapshot {to_snapshot_id} not found")
    from_seq = int(by_id[from_snapshot_id]["sequence-number"])
    to_seq = int(by_id[to_snapshot_id]["sequence-number"])
    if to_seq < from_seq:
        raise ValueError("to snapshot predates from snapshot")
    return _plan_seq_window(meta, from_seq, to_seq)


def read_iceberg_incremental(
    spark,
    table_dir: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    catalog=None,
    table_name: str | None = None,
):
    """The rows appended between two snapshots (see
    :func:`plan_incremental_scan`) — the batch form of an incremental
    training-data ingestion step: each run consumes exactly the new
    corpus shards, never rereads history. One metadata load serves both
    the plan and the schema typing."""
    _v, meta, _t = _current_state_meta(table_dir, catalog, table_name)
    files = _plan_incremental_from_meta(
        meta, from_snapshot_id, to_snapshot_id
    )
    if not files:
        return _empty_table_df(spark, meta)
    return _read_planned_files(
        spark, table_dir, meta, [f["file_path"] for f in files]
    )


def read_iceberg_changelog(
    spark,
    table_dir: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    catalog=None,
    table_name: str | None = None,
):
    """NET changelog between two snapshots as typed change rows — the
    CDC read that the append-only incremental scan refuses when deletes
    are present (Iceberg's changelog scan / Spark's
    ``create_changelog_view``): every table column plus
    ``_change_type`` (``insert`` | ``delete``). Row identity is
    (data file, row position) — the same identity position deletes use
    — so the diff is exact: a row appended AND deleted inside the
    window nets out, replacement rows from a CDC upsert surface as
    deletes of the old identities plus inserts of the new ones.

    Scale shape: inserts are read METADATA-ONLY (the window's appended
    files, already net of later in-window deletes because the ``to``
    snapshot's view applies them); only rows of PRE-WINDOW files need
    the row-level anti-join (old-file rows can only disappear), and
    both sides of that join are pruned to pre-window files first. No
    full-table diff is ever materialized."""
    from pyspark.sql import functions as F

    _v, meta, _t = _current_state_meta(table_dir, catalog, table_name)
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if from_snapshot_id not in by_id:
        raise ValueError(
            f"from snapshot {from_snapshot_id} expired or never existed — "
            "re-bootstrap from a full scan"
        )
    if to_snapshot_id is None:
        to_snapshot_id = meta.get("current-snapshot-id", -1)
    if to_snapshot_id not in by_id:
        raise ValueError(f"to snapshot {to_snapshot_id} not found")
    from_seq = int(by_id[from_snapshot_id]["sequence-number"])
    to_seq = int(by_id[to_snapshot_id]["sequence-number"])
    if to_seq < from_seq:
        raise ValueError("to snapshot predates from snapshot")
    # a data-file rewrite inside the window churns every surviving
    # row's (file, pos) identity — the net diff would report the whole
    # table as delete+insert. Same rows by construction, so the honest
    # answer is to refuse and have the caller split the window at the
    # rewrite (Spark's changelog likewise skips REPLACE snapshots).
    rewrite_ids = _data_rewrite_snapshot_ids(meta)
    for s in meta["snapshots"]:
        if (
            from_seq < int(s["sequence-number"]) <= to_seq
            and s["snapshot-id"] in rewrite_ids
        ):
            raise ValueError(
                f"changelog window spans data-file rewrite snapshot "
                f"{s['snapshot-id']} (rewrite_data_files churns row "
                "identity); split the window at the rewrite"
            )
    ids = ["__iceberg_file", "__iceberg_pos"]
    # ONE manifest walk of the `to` snapshot; the window/pre-window
    # split is a FILE-LEVEL plan split (two separately planned scans),
    # not a post-scan row filter — each data file is read at most once
    # and only the files a side needs are opened
    to_data, to_deletes = _plan_snapshot(by_id[to_snapshot_id], None)
    # durable twin of the summary-based refusal above: rewrite output
    # carries the _compacted- path marker, so an expired rewrite
    # snapshot (e.g. a tag keeps `from` alive across expiration) still
    # cannot slip identity-churned files into the diff as inserts
    for d in to_data:
        if (
            _is_rewrite_output(d["file_path"], meta["location"])
            and from_seq < d["_seq"] <= to_seq
        ):
            raise ValueError(
                f"changelog window spans data-file rewrite output "
                f"{d['file_path']} (rewrite_data_files churns row "
                "identity); split the window at the rewrite"
            )
    if not to_data:
        return (
            _empty_table_df(spark, meta)
            .withColumn("_change_type", F.lit(""))
            .where(F.lit(False))
        )
    new_data = [d for d in to_data if from_seq < d["_seq"] <= to_seq]
    old_data = [d for d in to_data if d["_seq"] <= from_seq]
    inserted = None
    if new_data:
        inserted = (
            _read_plan_with_identity(
                spark, table_dir, meta, new_data, to_deletes
            )
            .withColumn("_change_type", F.lit("insert"))
            .drop(*ids)
        )
    a = _read_snapshot(
        spark, table_dir, meta, by_id[from_snapshot_id], None,
        keep_identity=True,
    )
    if a is None or not old_data:
        # table was empty at `from`: everything live in-window is new
        if inserted is not None:
            return inserted
        return (
            _empty_table_df(spark, meta)
            .withColumn("_change_type", F.lit(""))
            .where(F.lit(False))
        )
    b_old = _read_plan_with_identity(
        spark, table_dir, meta, old_data, to_deletes
    )
    deleted = (
        a.join(b_old.select(*ids), ids, "left_anti")
        .withColumn("_change_type", F.lit("delete"))
        .drop(*ids)
    )
    if inserted is None:
        return deleted
    # allowMissingColumns: a window spanning a schema evolution has
    # delete rows read under the pre-evolution file schema — added
    # optional columns fill with null instead of failing the union
    return inserted.unionByName(deleted, allowMissingColumns=True)


def _empty_table_df(spark, meta: dict):
    """A valid ZERO-ROW scan typed from the table's current schema."""
    return spark.createDataFrame(
        [], iceberg_schema_to_spark(_current_schema_struct(meta))
    )


def _read_snapshot(
    spark,
    table_dir: str,
    meta: dict,
    snap: dict,
    partition_value,
    keep_identity: bool = False,
):
    """Plan one snapshot and hand it to Spark, applying the snapshot's
    position deletes when it has any (shared by the current-state and
    time-travel readers, so ``VERSION AS OF`` sees exactly the row set
    that snapshot defined — deletes included). ``keep_identity=True``
    retains the ``(__iceberg_file, __iceberg_pos)`` row-identity columns
    (and returns None for an empty plan) — the changelog reader diffs
    two snapshots on exactly that identity."""
    data, deletes = _plan_snapshot(snap, partition_value)
    if not data:
        return None if keep_identity else _empty_table_df(spark, meta)
    if not deletes and not keep_identity:
        return _read_planned_files(
            spark, table_dir, meta, [d["file_path"] for d in data]
        )
    df = _read_plan_with_identity(spark, table_dir, meta, data, deletes)
    if keep_identity:
        return df
    return df.drop("__iceberg_file", "__iceberg_pos")


def _read_plan_with_identity(
    spark, table_dir: str, meta: dict, data: list[dict], deletes: list[dict]
):
    """Scan an explicit data-file plan with the (file, pos) identity
    columns retained and the given delete files applied — the shared
    core of snapshot reads and the changelog's plan-split scans
    (deletes match per (file, pos) / per key, so applying them against
    a SUBSET of the snapshot's data files is sound)."""
    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
        apply_deletion_vectors,
        split_position_deletes,
    )

    df = _read_with_positions(
        spark, table_dir, meta, [d["file_path"] for d in data]
    )
    pos, dv = split_position_deletes(deletes)
    eq = [d for d in deletes if d.get("content") == 2]
    if eq:
        df = _apply_equality_deletes(spark, df, data, eq, meta)
    if pos:
        df = _apply_position_deletes(spark, df, data, pos)
    if dv:
        df = apply_deletion_vectors(spark, df, data, dv)
    return df


_NORM_FILE_RE = "^file:/+"  # file:///p and file:/p both -> /p


def _read_with_positions(spark, table_dir: str, meta: dict, paths: list[str]):
    """The planned-file scan plus Spark's hidden parquet ``_metadata``
    columns projected as ``(__iceberg_file, __iceberg_pos)`` — the same
    mechanism the Iceberg Spark reader uses to apply position deletes
    (``_metadata.row_index`` is the row's ordinal within its data file,
    exactly the spec's ``pos``). Stays a native columnar scan: the
    metadata columns are generated JVM-side, no Python crossing."""
    from pyspark.sql import functions as F

    def with_identity(df):
        return df.select(
            "*",
            F.regexp_replace(
                F.col("_metadata.file_path"), _NORM_FILE_RE, "/"
            ).alias("__iceberg_file"),
            F.col("_metadata.row_index").alias("__iceberg_pos"),
        )

    return _read_planned_files(
        spark, table_dir, meta, paths, project=with_identity
    )


def _apply_position_deletes(spark, df_pos, data_entries, delete_entries):
    """Merge-on-read: anti-join the data scan against the snapshot's
    position-delete rows on (data file path, row position), honoring
    the spec's sequence-number rule — a position delete applies only
    to data files whose data sequence number is <= the delete file's
    (rows appended AFTER a delete are never retro-deleted even when
    they land at the same positions of a same-partition file).

    Scale shape: the delete parquet scan is a normal distributed read;
    the two sequence-number attachments are broadcast joins over the
    O(files) planning metadata; the final anti-join broadcasts the
    delete set when small (AQE) and shuffles on (file, pos) otherwise —
    the same physical strategy Spark's Iceberg source picks."""
    from pyspark.sql import functions as F

    data_seq = spark.createDataFrame(
        [(d["file_path"], d["_seq"]) for d in data_entries],
        "__iceberg_file string, __iceberg_data_seq bigint",
    )
    del_files = sorted({(d["file_path"], d["_seq"]) for d in delete_entries})
    del_seq = spark.createDataFrame(
        del_files, "__iceberg_dfile string, __iceberg_del_seq bigint"
    )
    dels = (
        spark.read.parquet(*[p for p, _ in del_files])
        .select(
            F.col("file_path").alias("__iceberg_file"),
            F.col("pos").alias("__iceberg_pos"),
            F.regexp_replace(
                F.col("_metadata.file_path"), _NORM_FILE_RE, "/"
            ).alias("__iceberg_dfile"),
        )
        .join(F.broadcast(del_seq), "__iceberg_dfile")
        .join(F.broadcast(data_seq), "__iceberg_file")
        .where(F.col("__iceberg_del_seq") >= F.col("__iceberg_data_seq"))
        .select("__iceberg_file", "__iceberg_pos")
    )
    # callers drop __iceberg_file/__iceberg_pos once all delete layers
    # have been applied
    return df_pos.join(dels, ["__iceberg_file", "__iceberg_pos"], "left_anti")


# -- maintenance: time travel + snapshot expiration ---------------------------


def _load_current_metadata(table_dir: str) -> tuple[int, dict]:
    hint = os.path.join(table_dir, "metadata", "version-hint.text")
    if not os.path.exists(hint):
        raise FileNotFoundError(f"no Iceberg metadata under {table_dir}")
    with open(hint) as f:
        version = int(f.read().strip())
    with open(os.path.join(table_dir, "metadata", f"v{version}.metadata.json")) as f:
        return version, json.load(f)


def create_ref(
    table_dir: str,
    name: str,
    kind: str = "tag",
    snapshot_id: int | None = None,
    now_ms: int | None = None,
    catalog=None,
    table_name: str | None = None,
) -> dict:
    """Create (or move) a named snapshot reference — spec "Snapshot
    References": a ``tag`` is an immutable label for auditing /
    reproducible reads ("the corpus release we trained on"), a
    ``branch`` a movable head. Defaults to the current snapshot.
    Commits never disturb refs other than ``main`` (see
    :func:`_advance_main`) and :func:`expire_snapshots` protects every
    referenced snapshot, so a tagged snapshot stays readable for the
    tag's lifetime. In catalog mode this commits a ``set-snapshot-ref``
    update (the REST spec's update type)."""
    import time as _time

    if kind not in ("tag", "branch"):
        raise ValueError(f"ref type must be 'tag' or 'branch', got {kind!r}")
    if name == "main" and kind == "tag":
        raise ValueError("'main' is the branch head; it cannot be a tag")
    version, meta, table_name = _current_state_meta(
        table_dir, catalog, table_name
    )
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id", -1)
    if not any(s["snapshot-id"] == snapshot_id for s in meta["snapshots"]):
        raise ValueError(f"snapshot {snapshot_id} not found")
    now_ms = int(_time.time() * 1000) if now_ms is None else now_ms
    if catalog is not None:
        resp = catalog.commit_table(
            table_name,
            _maintenance_requirements(meta),
            [
                {
                    "action": "set-snapshot-ref",
                    "ref-name": name,
                    "snapshot-id": snapshot_id,
                    "type": kind,
                }
            ],
            now_ms,
        )
        return resp["metadata"]
    refs = dict(meta.get("refs") or {})
    refs[name] = {"snapshot-id": snapshot_id, "type": kind}
    return _commit_refs_local(
        table_dir,
        version,
        meta,
        refs,
        now_ms,
        # moving main IS moving the head (same invariant the catalog
        # path's set-snapshot-ref keeps): refs.main and
        # current-snapshot-id must never diverge
        current_snapshot_id=snapshot_id if name == "main" else None,
    )


def drop_ref(
    table_dir: str,
    name: str,
    now_ms: int | None = None,
    catalog=None,
    table_name: str | None = None,
) -> dict:
    """Remove a named ref (``remove-snapshot-ref`` in the REST spec).
    The snapshot itself stays until :func:`expire_snapshots` collects
    it. Dropping ``main`` is refused — a table always has a head."""
    import time as _time

    if name == "main":
        raise ValueError("cannot drop the main branch")
    version, meta, table_name = _current_state_meta(
        table_dir, catalog, table_name
    )
    refs = dict(meta.get("refs") or {})
    if name not in refs:
        raise ValueError(f"ref {name!r} not found")
    del refs[name]
    now_ms = int(_time.time() * 1000) if now_ms is None else now_ms
    if catalog is not None:
        resp = catalog.commit_table(
            table_name,
            _maintenance_requirements(meta),
            [{"action": "remove-snapshot-ref", "ref-name": name}],
            now_ms,
        )
        return resp["metadata"]
    return _commit_refs_local(table_dir, version, meta, refs, now_ms)


def _commit_refs_local(
    table_dir: str,
    version: int,
    meta: dict,
    refs: dict,
    now_ms: int,
    current_snapshot_id: int | None = None,
) -> dict:
    """Shared metadata-only commit for the file-layout ref operations:
    new refs map (+ optionally a moved head), metadata-log chain entry,
    next version + hint. Moving the head also appends to the
    snapshot-log (the spec's log of current-snapshot-id changes) — a
    rollback or publish is a TIMESTAMP AS OF event, and the catalog
    protocol records it the same way (set-snapshot-ref main)."""
    new_meta = dict(meta)
    new_meta["refs"] = refs
    if current_snapshot_id is not None:
        new_meta["current-snapshot-id"] = current_snapshot_id
        log = list(meta.get("snapshot-log", []))
        if not log or log[-1]["snapshot-id"] != current_snapshot_id:
            ts = max(
                now_ms,
                max((e["timestamp-ms"] for e in log), default=0),
            )
            log.append(
                {"timestamp-ms": ts, "snapshot-id": current_snapshot_id}
            )
        new_meta["snapshot-log"] = log
    new_meta["last-updated-ms"] = now_ms
    meta_dir = os.path.join(table_dir, "metadata")
    new_meta["metadata-log"] = meta.get("metadata-log", []) + [
        {
            "timestamp-ms": meta["last-updated-ms"],
            "metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
        }
    ]
    _write_metadata_version(meta_dir, version + 1, new_meta)
    return new_meta


def read_iceberg_table_ref(
    spark, table_dir: str, ref_name: str, catalog=None,
    table_name: str | None = None,
):
    """Open the table at a named ref (``VERSION AS OF 'tag'``): resolve
    the ref to its snapshot and time-travel there. Reading a branch
    reads that branch's head."""
    _version, meta, _t = _current_state_meta(table_dir, catalog, table_name)
    ref = (meta.get("refs") or {}).get(ref_name)
    if ref is None:
        raise ValueError(f"ref {ref_name!r} not found")
    return read_iceberg_table_at(
        spark, table_dir, ref["snapshot-id"], catalog, table_name
    )


def snapshot_as_of_timestamp(
    table_dir: str, timestamp_ms: int, catalog=None, table_name: str | None = None
) -> int:
    """``TIMESTAMP AS OF``: the latest snapshot whose commit time is
    <= the given timestamp (walks the snapshot-log, the same structure
    external readers use). Raises if the table has no snapshot that
    old. With ``catalog``, the snapshot-log comes from the catalog
    service — same stale-local-hint rule as :func:`plan_scan`."""
    _version, meta, _t = _current_state_meta(table_dir, catalog, table_name)
    best = None
    for entry in meta.get("snapshot-log", []):
        if entry["timestamp-ms"] <= timestamp_ms:
            best = entry["snapshot-id"]
    if best is None:
        raise ValueError(
            f"no snapshot at or before timestamp {timestamp_ms} "
            "(table created later, or history expired)"
        )
    return best


def read_iceberg_table_at(
    spark, table_dir: str, snapshot_id: int, catalog=None,
    table_name: str | None = None,
):
    """Time travel: open the table AS OF a historical snapshot — the
    file set is whatever that snapshot's manifest list said, regardless
    of later appends (Iceberg's ``VERSION AS OF`` semantics; any
    snapshot still present in the metadata is readable). For
    ``TIMESTAMP AS OF``, resolve the id via
    :func:`snapshot_as_of_timestamp` first. With ``catalog``, the
    snapshot list comes from the catalog service. A historical
    snapshot's position deletes are applied exactly as they were live
    at that snapshot — deletes committed later do not leak backwards."""
    _version, meta, _t = _current_state_meta(table_dir, catalog, table_name)
    snap = next(
        (s for s in meta["snapshots"] if s["snapshot-id"] == snapshot_id), None
    )
    if snap is None:
        raise ValueError(f"snapshot {snapshot_id} not found (expired or never existed)")
    return _read_snapshot(spark, table_dir, meta, snap, None)


def _maintenance_state(table_dir: str, catalog, table_name: str | None):
    """(version, metadata, table_name) for a maintenance op — from the
    file layout, or from the catalog service when one manages the
    table (maintaining a catalog table through the file layout would
    fork the pointer: the next catalog commit would silently undo it).
    Metadata-only: the maintenance ops read the manifest lists they
    need themselves."""
    return _current_state_meta(table_dir, catalog, table_name)


def _maintenance_requirements(meta: dict) -> list[dict]:
    head = (meta.get("refs") or {}).get("main", {}).get("snapshot-id")
    return [
        {"type": "assert-table-uuid", "uuid": meta["table-uuid"]},
        {"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": head},
    ]


def expire_snapshots(
    table_dir: str,
    keep_last: int = 1,
    now_ms: int | None = None,
    catalog=None,
    table_name: str | None = None,
    max_commit_retries: int = 3,
) -> dict:
    """Iceberg snapshot expiration (`expireSnapshots` maintenance — the
    catalog-side analog of the reference's retention/delete plane):
    drop all but the newest ``keep_last`` snapshots from the metadata,
    delete their no-longer-referenced manifest lists, manifests, and
    statistics files, and write a new metadata version. Data files
    still referenced by a surviving snapshot are untouched (an append-
    only table's old files stay live in the current snapshot). Returns
    the new metadata dict. In catalog mode a lost race (concurrent
    append moved the head between load and commit) reloads and retries
    — maintenance on a busy streaming table must not deterministically
    fail."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        CommitConflictError,
    )

    last_err: Exception | None = None
    for _attempt in range(max_commit_retries if catalog is not None else 1):
        try:
            return _expire_snapshots_once(
                table_dir, keep_last, now_ms, catalog, table_name
            )
        except CommitConflictError as e:
            last_err = e
    assert last_err is not None
    raise last_err


def _expire_snapshots_once(
    table_dir: str,
    keep_last: int,
    now_ms: int | None,
    catalog,
    table_name: str | None,
) -> dict:
    import time as _time

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    version, meta, table_name = _maintenance_state(table_dir, catalog, table_name)
    snaps = meta["snapshots"]
    if len(snaps) <= keep_last:
        return meta
    # spec: expiration never removes a snapshot any ref points at — a
    # tag pins its snapshot for the tag's lifetime
    ref_ids = {
        r["snapshot-id"] for r in (meta.get("refs") or {}).values()
    }
    keep_ids = {s["snapshot-id"] for s in snaps[-keep_last:]} | ref_ids
    # an unpublished BRANCH lineage survives too: fast_forward's
    # ancestry check needs the parent chain from the branch head back
    # to the fork point. Bounded by the branch-only chain — the walk
    # stops at anything already kept or on main's lineage, so old
    # published history is never dragged back in.
    by_id_all = {s["snapshot-id"]: s for s in snaps}
    main_lineage: set = set()
    node = meta.get("current-snapshot-id", -1)
    while node in by_id_all:
        main_lineage.add(node)
        node = by_id_all[node].get("parent-snapshot-id")
    for name, r in (meta.get("refs") or {}).items():
        if name == "main" or r.get("type") != "branch":
            continue
        head = by_id_all.get(r["snapshot-id"])
        node = head.get("parent-snapshot-id") if head else None
        while (
            node in by_id_all
            and node not in keep_ids
            and node not in main_lineage
        ):
            keep_ids.add(node)
            node = by_id_all[node].get("parent-snapshot-id")
    keep = [s for s in snaps if s["snapshot-id"] in keep_ids]
    expired = [s for s in snaps if s["snapshot-id"] not in keep_ids]
    if not expired:
        return meta

    # files referenced by surviving snapshots stay; everything metadata-
    # side that only the expired snapshots referenced is deleted
    live_manifest_paths: set[str] = set()
    for s in keep:
        _, manifest_files, _ = read_avro_ocf(s["manifest-list"])
        live_manifest_paths.update(mf["manifest_path"] for mf in manifest_files)
    removed: list[str] = []
    for s in expired:
        _, manifest_files, _ = read_avro_ocf(s["manifest-list"])
        for mf in manifest_files:
            if mf["manifest_path"] not in live_manifest_paths:
                removed.append(mf["manifest_path"])
        removed.append(s["manifest-list"])
    new_stats = []
    for st in meta.get("statistics", []):
        if st["snapshot-id"] in keep_ids:
            new_stats.append(st)
        else:
            removed.append(st["statistics-path"])

    now_ms = int(_time.time() * 1000) if now_ms is None else now_ms
    meta_dir = os.path.join(table_dir, "metadata")
    new_meta = dict(meta)
    new_meta["statistics"] = new_stats
    new_meta["snapshot-log"] = [
        e for e in meta["snapshot-log"] if e["snapshot-id"] in keep_ids
    ]
    new_meta["last-updated-ms"] = now_ms
    # the superseded metadata version joins metadata-log (same chain
    # maintenance as commit_append — external history walkers rely on it)
    new_meta["metadata-log"] = meta.get("metadata-log", []) + [
        {
            "timestamp-ms": meta["last-updated-ms"],
            "metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
        }
    ]
    # oldest surviving snapshot loses its parent pointer if the parent
    # was expired (spec: parent-snapshot-id may reference a missing
    # snapshot only transiently; drop it for cleanliness)
    new_meta["snapshots"] = [
        (
            {k: v for k, v in s.items() if k != "parent-snapshot-id"}
            if s.get("parent-snapshot-id") not in keep_ids
            else s
        )
        for s in keep
    ]
    # COMMIT FIRST, clean up after: the new metadata version + hint are
    # durable before any file is removed, so a crash mid-delete leaves a
    # fully consistent table plus some not-yet-collected orphans (the
    # safe failure mode; the reverse order wedges the current metadata
    # on already-deleted manifest lists)
    if catalog is not None:
        expired_ids = [s["snapshot-id"] for s in expired]
        updates = [{"action": "remove-snapshots", "snapshot-ids": expired_ids}]
        updates += [
            {"action": "remove-statistics", "snapshot-id": sid}
            for sid in expired_ids
        ]
        resp = catalog.commit_table(
            table_name, _maintenance_requirements(meta), updates, now_ms
        )
        new_meta = resp["metadata"]
    else:
        _write_metadata_version(meta_dir, version + 1, new_meta)
    for path in removed:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass
    return new_meta


def rewrite_manifests(
    table_dir: str,
    now_ms: int | None = None,
    catalog=None,
    table_name: str | None = None,
    max_commit_retries: int = 3,
) -> dict:
    """See :func:`_rewrite_manifests_once`; in catalog mode a lost race
    against a concurrent append reloads the (now longer) manifest list
    and re-compacts — exactly the table state compaction exists for."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        CommitConflictError,
    )

    last_err: Exception | None = None
    for _attempt in range(max_commit_retries if catalog is not None else 1):
        try:
            return _rewrite_manifests_once(table_dir, now_ms, catalog, table_name)
        except CommitConflictError as e:
            last_err = e
    assert last_err is not None
    raise last_err


def _rewrite_manifests_once(
    table_dir: str,
    now_ms: int | None = None,
    catalog=None,
    table_name: str | None = None,
) -> dict:
    """Iceberg ``rewriteManifests`` maintenance: merge the current
    snapshot's manifests into ONE compacted manifest and commit it as a
    new snapshot (operation ``replace`` — same data files, new
    metadata layout). Long-lived streaming tables accumulate one
    manifest per micro-batch; scan planning walks every manifest, so
    periodic compaction keeps the metadata walk O(1) per scan instead
    of O(commits). Carried-over entries get status 0/EXISTING (their
    original sequence numbers preserved), so external incremental/CDC
    readers do not see compaction as appends. No-op on tables with
    <= 1 manifest."""
    import time as _time

    version, meta, table_name = _maintenance_state(table_dir, catalog, table_name)
    if meta.get("current-snapshot-id", -1) == -1:
        return meta
    cur = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, manifest_files, _ = read_avro_ocf(cur["manifest-list"])
    n_data_m = sum(1 for mf in manifest_files if not mf.get("content"))
    if n_data_m <= 1 and len(manifest_files) - n_data_m <= 1:
        return meta  # already compact (<=1 manifest of each content)
    partition_col = meta["partition-specs"][0]["fields"][0]["name"]
    # tombstone GC horizon: status=2 entries are load-bearing for the
    # incremental planner (rewrite_data_files / DV-supersede history),
    # but only inside windows a caller can still open — and a window's
    # `from` must be a snapshot that still exists. Entries at or below
    # the oldest live snapshot's sequence number are unreachable.
    horizon = min(
        (int(s["sequence-number"]) for s in meta["snapshots"]),
        default=0,
    )
    # data and delete manifests compact SEPARATELY (spec: a manifest
    # holds either data files or delete files, never both — merging
    # them would make every scan read delete entries as data)
    groups: dict[int, list] = {0: [], 1: []}
    for mf in manifest_files:
        _, es, _ = read_avro_ocf(mf["manifest_path"])
        for e in es:
            seq = e.get("sequence_number")
            if seq is None:
                seq = mf.get("sequence_number", 0)
            d2 = dict(e["data_file"])
            d2.setdefault("equality_ids", None)
            for k in _STATS_KEYS:  # pre-stats manifests lack these
                d2.setdefault(k, None)
            if e["status"] == 2:
                # carry tombstones (original deleting-snapshot
                # attribution intact) until no queryable window can
                # reach them — dropping them would blind the
                # incremental planner's retraction guard and lose
                # pre-rewrite windows (see _plan_seq_window); hive-
                # layout data tombstones are additionally the
                # discovery dedup record and never GC (see
                # _tombstone_gc_safe)
                if int(seq) <= horizon and _tombstone_gc_safe(d2, table_dir):
                    continue
                e2 = {**e, "sequence_number": int(seq), "data_file": d2}
            else:
                # spec: carried-over files are status 0 (EXISTING) — an
                # incremental/CDC reader must not see compaction as
                # appends; sequence numbers become explicit so
                # inheritance from the NEW manifest cannot rewrite
                # history
                e2 = {
                    **e,
                    "status": 0,
                    "sequence_number": int(seq),
                    "data_file": d2,
                }
            groups[0 if not d2.get("content") else 1].append(e2)
    entries = groups[0]
    lo = hi = None
    rows = 0
    n_live = n_dead = dead_rows = 0
    for e in entries:
        p = e["data_file"]["partition"].get(partition_col)
        if p is not None:
            lo = p if lo is None else min(lo, p)
            hi = p if hi is None else max(hi, p)
        if e["status"] == 2:
            n_dead += 1
            dead_rows += e["data_file"]["record_count"]
        else:
            n_live += 1
            rows += e["data_file"]["record_count"]

    now_ms = int(_time.time() * 1000) if now_ms is None else now_ms
    # snapshot-log monotonicity (same clamp as _commit_append_once): a
    # maintenance clock behind the head must not time-travel the log
    now_ms = max(
        now_ms, max((s["timestamp-ms"] for s in meta["snapshots"]), default=0)
    )
    meta_dir = os.path.join(table_dir, "metadata")
    seq = meta["last-sequence-number"] + 1
    snapshot_id = seq
    schema_struct = _current_schema_struct(meta)
    spec = meta["partition-specs"][0]
    compact_uuid = uuid.uuid4().hex[:16]  # same per-attempt token as
    # commit_append: concurrent maintenance must not collide on staged
    # metadata paths
    manifest_path = os.path.join(
        meta_dir, f"{meta['table-uuid']}-compacted-m{seq}-{compact_uuid}.avro"
    )
    manifest_len = write_avro_ocf(
        manifest_path,
        manifest_entry_schema(partition_col),
        entries,
        {
            "schema": json.dumps(schema_struct).encode(),
            "schema-id": str(meta["current-schema-id"]).encode(),
            "partition-spec": json.dumps(spec["fields"]).encode(),
            "partition-spec-id": b"0",
            "format-version": str(FORMAT_VERSION).encode(),
            "content": b"data",
        },
    )
    min_seq = min(
        (e["sequence_number"] for e in entries),
        default=min(mf["min_sequence_number"] for mf in manifest_files),
    )
    compacted = {
        "manifest_path": manifest_path,
        "manifest_length": manifest_len,
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": min_seq,
        "added_snapshot_id": snapshot_id,
        "added_data_files_count": 0,
        "existing_data_files_count": n_live,
        "deleted_data_files_count": n_dead,
        "added_rows_count": 0,
        "existing_rows_count": rows,
        "deleted_rows_count": dead_rows,
        "partitions": [
            {
                "contains_null": any(
                    e["data_file"]["partition"].get(partition_col) is None
                    for e in entries
                ),
                "contains_nan": False,
                "lower_bound": struct.pack("<i", lo if lo is not None else 0),
                "upper_bound": struct.pack("<i", hi if hi is not None else 0),
            }
        ],
    }
    new_manifest_files = [compacted]
    if groups[1]:
        # the table's position-delete entries compact into their own
        # content=1 manifest, preserving each entry's sequence number
        # (the delete-applies-to rule depends on it); the schema
        # selection goes through normalize_delete_entries so DV
        # locators survive compaction
        del_entries = groups[1]
        from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (  # noqa: E501 (local import: deletion_vectors imports this module)
            normalize_delete_entries,
        )

        del_schema = normalize_delete_entries(del_entries, partition_col)
        del_path = os.path.join(
            meta_dir, f"{meta['table-uuid']}-compacted-d{seq}-{compact_uuid}.avro"
        )
        del_len = write_avro_ocf(
            del_path,
            del_schema,
            del_entries,
            {
                "schema": json.dumps(schema_struct).encode(),
                "schema-id": str(meta["current-schema-id"]).encode(),
                "partition-spec": json.dumps(spec["fields"]).encode(),
                "partition-spec-id": b"0",
                "format-version": str(FORMAT_VERSION).encode(),
                "content": b"deletes",
            },
        )
        dparts = [
            e["data_file"]["partition"].get(partition_col) for e in del_entries
        ]
        d_non_null = [p for p in dparts if p is not None] or [0]
        new_manifest_files.append(
            {
                "manifest_path": del_path,
                "manifest_length": del_len,
                "partition_spec_id": 0,
                "content": 1,
                "sequence_number": seq,
                "min_sequence_number": min(
                    e["sequence_number"] for e in del_entries
                ),
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": 0,
                "existing_data_files_count": sum(
                    1 for e in del_entries if e["status"] != 2
                ),
                "deleted_data_files_count": sum(
                    1 for e in del_entries if e["status"] == 2
                ),
                "added_rows_count": 0,
                "existing_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in del_entries
                    if e["status"] != 2
                ),
                "deleted_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in del_entries
                    if e["status"] == 2
                ),
                "partitions": [
                    {
                        "contains_null": any(p is None for p in dparts),
                        "contains_nan": False,
                        "lower_bound": struct.pack("<i", min(d_non_null)),
                        "upper_bound": struct.pack("<i", max(d_non_null)),
                    }
                ],
            }
        )
    summary = {
        "operation": "replace",
        "manifests-replaced": str(len(manifest_files)),
        "manifests-created": str(len(new_manifest_files)),
        "total-records": str(rows),
        "total-position-deletes": str(_prev_total_pos_deletes(meta)),
        "total-equality-deletes": str(
            _prev_summary_counter(meta, "total-equality-deletes")
        ),
    }
    file_list = [
        {
            "location": e["data_file"]["file_path"],
            "partition": e["data_file"]["partition"].get(partition_col),
            "recordCount": e["data_file"]["record_count"],
            "fileSizeInBytes": e["data_file"]["file_size_in_bytes"],
        }
        for e in entries
        if e["status"] != 2
    ]
    return _finish_replace_commit(
        table_dir, version, meta, now_ms, seq, snapshot_id, compact_uuid,
        new_manifest_files, summary, file_list, catalog, table_name,
    )


def _finish_replace_commit(
    table_dir: str,
    version: int,
    meta: dict,
    now_ms: int,
    seq: int,
    snapshot_id: int,
    commit_uuid: str,
    new_manifest_files: list[dict],
    summary: dict,
    file_list: list[dict],
    catalog,
    table_name: str | None,
    extra_updates: list[dict] | None = None,
) -> dict:
    """Shared tail of the REPLACE-flavored maintenance commits
    (`rewrite_manifests`, `rewrite_data_files`): write the manifest
    list, chain the snapshot, register the FILE_LIST statistics Puffin,
    and move the pointer (catalog protocol or local version write).
    ``extra_updates`` ride along in the catalog commit (e.g. the
    add-sort-order a sorted rewrite records); local mode picks the
    same changes up from the caller-mutated ``meta``."""
    meta_dir = os.path.join(table_dir, "metadata")
    list_path = os.path.join(
        meta_dir, f"snap-{snapshot_id}-1-{commit_uuid}.avro"
    )
    write_avro_ocf(
        list_path,
        MANIFEST_FILE_SCHEMA,
        new_manifest_files,
        {
            "format-version": str(FORMAT_VERSION).encode(),
            "snapshot-id": str(snapshot_id).encode(),
            "sequence-number": str(seq).encode(),
            "parent-snapshot-id": str(meta["current-snapshot-id"]).encode(),
        },
    )
    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": list_path,
        "schema-id": meta["current-schema-id"],
        "parent-snapshot-id": meta["current-snapshot-id"],
        "summary": summary,
    }
    # per-current-snapshot statistics (the pattern every consumer of
    # meta["statistics"] relies on): FILE_LIST of the live files
    from tiered_storage_for_apache_kafka_spark.sources.puffin import (
        FILE_LIST,
        write_puffin,
    )

    stats_path = os.path.join(
        meta_dir, f"stats-{snapshot_id}-{commit_uuid}.puffin"
    )
    stats = write_puffin(
        stats_path, [(FILE_LIST, json.dumps(file_list).encode())], snapshot_id, seq
    )

    new_meta = dict(meta)
    new_meta["last-sequence-number"] = seq
    new_meta["last-updated-ms"] = now_ms
    new_meta["current-snapshot-id"] = snapshot_id
    new_meta["snapshots"] = meta["snapshots"] + [snapshot]
    new_meta["statistics"] = meta.get("statistics", []) + [
        {
            "snapshot-id": snapshot_id,
            "statistics-path": stats_path,
            "file-size-in-bytes": stats["file_size"],
            "file-footer-size-in-bytes": stats["footer_size"],
            "blob-metadata": stats["blob_metadata"],
        }
    ]
    new_meta["refs"] = _advance_main(meta.get("refs"), snapshot_id)
    new_meta["snapshot-log"] = meta["snapshot-log"] + [
        {"timestamp-ms": now_ms, "snapshot-id": snapshot_id}
    ]
    new_meta["metadata-log"] = meta.get("metadata-log", []) + [
        {
            "timestamp-ms": meta["last-updated-ms"],
            "metadata-file": os.path.join(meta_dir, f"v{version}.metadata.json"),
        }
    ]
    if catalog is not None:
        resp = catalog.commit_table(
            table_name,
            _maintenance_requirements(meta),
            list(extra_updates or [])
            + [
                {"action": "add-snapshot", "snapshot": snapshot},
                {
                    "action": "set-snapshot-ref",
                    "ref-name": "main",
                    "type": "branch",
                    "snapshot-id": snapshot_id,
                },
                {
                    "action": "set-statistics",
                    "statistics": new_meta["statistics"][-1],
                },
            ],
            now_ms,
        )
        return resp["metadata"]
    _write_metadata_version(meta_dir, version + 1, new_meta)
    return new_meta


def rewrite_data_files(
    spark,
    table_dir: str,
    now_ms: int | None = None,
    catalog=None,
    table_name: str | None = None,
    max_records_per_file: int | None = None,
    sort_by: str | list[str] | None = None,
    max_commit_retries: int = 3,
) -> dict:
    """See :func:`_rewrite_data_files_once`; in catalog mode a lost
    race against a concurrent writer reloads and re-compacts against
    the new head."""
    from tiered_storage_for_apache_kafka_spark.sources.rest_catalog import (
        CommitConflictError,
    )

    last_err: Exception | None = None
    for _attempt in range(max_commit_retries if catalog is not None else 1):
        try:
            return _rewrite_data_files_once(
                spark, table_dir, now_ms, catalog, table_name,
                max_records_per_file, sort_by,
            )
        except CommitConflictError as e:
            last_err = e
    assert last_err is not None
    raise last_err


def _rewrite_data_files_once(
    spark,
    table_dir: str,
    now_ms: int | None,
    catalog,
    table_name: str | None,
    max_records_per_file: int | None,
    sort_by: str | list[str] | None = None,
) -> dict:
    """Iceberg ``rewriteDataFiles`` maintenance (bin-pack compaction
    with merge-on-read materialization): read the current snapshot's
    LIVE rows — every position delete, deletion vector, and equality
    delete applied — rewrite them as fresh parquet (one file per
    partition under ``local[n]``; cap file size at scale with
    ``max_records_per_file``), and commit a REPLACE snapshot whose
    manifest list holds one new data manifest plus tombstone manifests
    recording the replaced data files and the now-fully-applied delete
    files as status=2 entries. After the rewrite the table carries
    ZERO delete files — small-file pressure and merge-on-read cost
    both reset. Same logical rows by construction (the rewrite is the
    planned live scan), so the snapshot is spec-``replace``.

    Positional identity intentionally changes: every surviving row
    gets a new (file, pos). Consumers that diff by identity are
    guarded — ``read_iceberg_changelog`` refuses windows spanning a
    data rewrite, and the incremental append scan skips replace-added
    files. Both guards are durable: compaction output is recognizable
    by its ``_compacted-`` path marker even after the rewrite snapshot
    expires, prior tombstones are carried forward through later
    rewrites and manifest compactions (GC'd only once no queryable
    window can reach them), and a tombstone whose deleting snapshot
    the metadata can no longer explain is an explicit error, never a
    silently wrong window.

    New files live under ``<table>/_compacted-<token>/`` — a
    "_"-prefixed (Hadoop-hidden) directory the discovery-mode append
    skips, so a crash between staging and commit leaves orphans that
    can never be double-committed. Scale shape: the rewrite is one
    distributed read + one distributed write, no driver materialization
    — the driver handles only O(#files) footer stats, same as every
    commit path."""
    import time as _time

    version, meta, table_name = _maintenance_state(table_dir, catalog, table_name)
    if meta.get("current-snapshot-id", -1) == -1:
        return meta
    cur = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    raw_tombstones: list[dict] = []
    data, deletes = _plan_snapshot(cur, None, tombstones_out=raw_tombstones)
    if not data:
        return meta
    partition_col = meta["partition-specs"][0]["fields"][0]["name"]
    schema_struct = _current_schema_struct(meta)
    leaf_ids = _leaf_field_ids(schema_struct)

    # sorted compaction (Iceberg's sort strategy): sort rows within
    # the partition-colocated write tasks and slice by
    # max_records_per_file, so each output file covers a NARROW value
    # range — the recorded lower/upper bounds get tight and
    # plan_scan's bounds pruning skips whole files instead of row
    # groups. The order is recorded as a spec sort-order and stamped
    # on the entries via sort_order_id. Resolved BEFORE the
    # already-compact early-return: a sort request must re-layout (or
    # error on a bad column) even when file counts look fine.
    sort_cols = (
        [sort_by] if isinstance(sort_by, str) else list(sort_by or [])
    )
    sort_order_id = 0
    new_sort_order: dict | None = None
    if sort_cols:
        order_fields = []
        for c in sort_cols:
            fid = leaf_ids.get(c)
            if fid is None:
                raise KeyError(
                    f"no scalar leaf column {c!r} in the table schema"
                )
            order_fields.append(
                {
                    "transform": "identity",
                    "source-id": fid,
                    "direction": "asc",
                    "null-order": "nulls-first",
                }
            )
        existing_orders = meta.get("sort-orders", [])
        match = next(
            (o for o in existing_orders if o.get("fields") == order_fields),
            None,
        )
        if match is not None:
            sort_order_id = int(match["order-id"])
        else:
            sort_order_id = (
                max((int(o["order-id"]) for o in existing_orders), default=0)
                + 1
            )
            new_sort_order = {"order-id": sort_order_id, "fields": order_fields}
            meta = {**meta, "sort-orders": existing_orders + [new_sort_order]}

    per_part: dict = {}
    for d in data:
        per_part[d["partition"].get(partition_col)] = (
            per_part.get(d["partition"].get(partition_col), 0) + 1
        )
    already_sorted = bool(sort_cols) and all(
        int(d.get("sort_order_id") or 0) == sort_order_id for d in data
    )
    if (
        not deletes
        and max(per_part.values()) <= 1
        and (not sort_cols or already_sorted)
    ):
        return meta  # already compact (and in the requested order)

    live = _read_plan_with_identity(spark, table_dir, meta, data, deletes).drop(
        "__iceberg_file", "__iceberg_pos"
    )
    compact_uuid = uuid.uuid4().hex[:16]
    out_dir = os.path.join(table_dir, f"_compacted-{compact_uuid}")
    if sort_cols:
        from pyspark.sql import functions as F

        keys = [F.col(partition_col)] + [F.col(c) for c in sort_cols]
        # sort within the partition-colocated tasks; file-level range
        # slicing comes from maxRecordsPerFile (AQE may coalesce a
        # range shuffle on small data, but a sorted task split by
        # record cap yields consecutive — hence tight-bounded — files
        # deterministically at every scale)
        shaped = live.repartition(partition_col).sortWithinPartitions(*keys)
    else:
        shaped = live.repartition(partition_col)
    writer = shaped.write.partitionBy(partition_col)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(out_dir, mode="overwrite")
    new_paths = []
    for root, _dirs, names in os.walk(out_dir):
        if "_temporary" in root.split(os.sep):
            continue
        new_paths += [
            os.path.join(root, n) for n in names if n.endswith(".parquet")
        ]
    new_files = _stat_data_files(sorted(new_paths), partition_col)

    now_ms = int(_time.time() * 1000) if now_ms is None else now_ms
    now_ms = max(
        now_ms, max((s["timestamp-ms"] for s in meta["snapshots"]), default=0)
    )
    meta_dir = os.path.join(table_dir, "metadata")
    seq = meta["last-sequence-number"] + 1
    snapshot_id = seq
    spec = meta["partition-specs"][0]
    ocf_meta = {
        "schema": json.dumps(schema_struct).encode(),
        "schema-id": str(meta["current-schema-id"]).encode(),
        "partition-spec": json.dumps(spec["fields"]).encode(),
        "partition-spec-id": b"0",
        "format-version": str(FORMAT_VERSION).encode(),
    }
    added_entries = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0,
                "file_path": f["file_path"],
                "file_format": "PARQUET",
                "partition": {partition_col: f["partition_value"]},
                "record_count": f["record_count"],
                "file_size_in_bytes": f["file_size_in_bytes"],
                **_column_stats_fields(f.get("column_stats") or {}, leaf_ids),
                "split_offsets": f["split_offsets"],
                "equality_ids": None,
                "sort_order_id": sort_order_id,
            },
        }
        for f in new_files
    ]
    data_manifest_path = os.path.join(
        meta_dir, f"{meta['table-uuid']}-rw{seq}-{compact_uuid}.avro"
    )
    data_manifest_len = write_avro_ocf(
        data_manifest_path,
        manifest_entry_schema(partition_col),
        added_entries,
        {**ocf_meta, "content": b"data"},
    )
    live_rows = sum(f["record_count"] for f in new_files)
    parts = [f["partition_value"] for f in new_files]
    non_null = [p for p in parts if p is not None] or [0]
    new_manifest_files = [
        {
            "manifest_path": data_manifest_path,
            "manifest_length": data_manifest_len,
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_data_files_count": len(new_files),
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": live_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": [
                {
                    "contains_null": any(p is None for p in parts),
                    "contains_nan": False,
                    "lower_bound": struct.pack("<i", min(non_null)),
                    "upper_bound": struct.pack("<i", max(non_null)),
                }
            ],
        }
    ]

    # prior tombstones (earlier rewrites / DV supersedes) must survive
    # this rewrite too — dropping them would lose pre-rewrite
    # incremental windows and blind the retraction guard — collected
    # in the SAME metadata walk as the plan (tombstones_out above).
    # GC at the oldest-live-snapshot horizon, except hive-layout data
    # tombstones: those are the discovery dedup record for files still
    # on disk and never GC (see _tombstone_gc_safe).
    horizon = min(
        (int(s["sequence-number"]) for s in meta["snapshots"]), default=0
    )
    prior_tombstones: dict[int, list[dict]] = {0: [], 1: []}
    for e in raw_tombstones:
        d2 = e["data_file"]
        if int(e["sequence_number"]) <= horizon and _tombstone_gc_safe(
            d2, table_dir
        ):
            continue
        # the ORIGINAL deleting-snapshot attribution is kept
        prior_tombstones[0 if not d2.get("content") else 1].append(e)

    from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (
        normalize_delete_entries,
    )

    def _tombstones(flat: list[dict], content: int, tag: str) -> None:
        """One status=2 manifest recording the replaced entries (plus
        carried prior tombstones); tombstones keep their original
        sequence numbers so the incremental planner's retraction guard
        stays durable."""
        entries = []
        for d in sorted(flat, key=lambda d: d["file_path"]):
            d2 = {k: v for k, v in d.items() if k != "_seq"}
            entries.append(
                {
                    "status": 2,  # DELETED by this snapshot
                    "snapshot_id": snapshot_id,
                    "sequence_number": int(d["_seq"]),
                    "file_sequence_number": None,
                    "data_file": d2,
                }
            )
        entries += prior_tombstones[content]
        for e in entries:
            d2 = e["data_file"]
            d2.setdefault("equality_ids", None)
            for k in _STATS_KEYS:
                d2.setdefault(k, None)
            d2.setdefault("split_offsets", None)
            d2.setdefault("sort_order_id", None)
        entry_schema = (
            normalize_delete_entries(entries, partition_col)
            if content == 1
            else manifest_entry_schema(partition_col)
        )
        path = os.path.join(
            meta_dir, f"{meta['table-uuid']}-{tag}{seq}-{compact_uuid}.avro"
        )
        length = write_avro_ocf(
            path,
            entry_schema,
            entries,
            {**ocf_meta, "content": b"data" if content == 0 else b"deletes"},
        )
        tparts = [e["data_file"]["partition"].get(partition_col) for e in entries]
        t_non_null = [p for p in tparts if p is not None] or [0]
        new_manifest_files.append(
            {
                "manifest_path": path,
                "manifest_length": length,
                "partition_spec_id": 0,
                "content": content,
                "sequence_number": seq,
                "min_sequence_number": min(
                    int(e["sequence_number"]) for e in entries
                ),
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": 0,
                "existing_data_files_count": 0,
                "deleted_data_files_count": len(entries),
                "added_rows_count": 0,
                "existing_rows_count": 0,
                "deleted_rows_count": sum(
                    e["data_file"]["record_count"] for e in entries
                ),
                "partitions": [
                    {
                        "contains_null": any(p is None for p in tparts),
                        "contains_nan": False,
                        "lower_bound": struct.pack("<i", min(t_non_null)),
                        "upper_bound": struct.pack("<i", max(t_non_null)),
                    }
                ],
            }
        )

    _tombstones(data, 0, "rwdel")
    if deletes or prior_tombstones[1]:
        _tombstones(deletes, 1, "rwdrop")

    summary = {
        "operation": "replace",
        "added-data-files": str(len(new_files)),
        "deleted-data-files": str(len(data)),
        "removed-delete-files": str(len(deletes)),
        "added-records": str(live_rows),
        "deleted-records": str(sum(d["record_count"] for d in data)),
        "total-records": str(live_rows),
        "total-data-files": str(len(new_files)),
        "total-position-deletes": "0",
        "total-equality-deletes": "0",
    }
    file_list = [
        {
            "location": f["file_path"],
            "partition": f["partition_value"],
            "recordCount": f["record_count"],
            "fileSizeInBytes": f["file_size_in_bytes"],
        }
        for f in new_files
    ]
    return _finish_replace_commit(
        table_dir, version, meta, now_ms, seq, snapshot_id, compact_uuid,
        new_manifest_files, summary, file_list, catalog, table_name,
        extra_updates=(
            [{"action": "add-sort-order", "sort-order": new_sort_order}]
            if new_sort_order is not None
            else None
        ),
    )


def remove_orphan_files(
    table_dir: str,
    older_than_timestamp_ms: int | None = None,
    now_ms: int | None = None,
    catalog=None,
    table_name: str | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Iceberg ``removeOrphanFiles`` maintenance — the fourth leg of
    the maintenance set (expire / rewrite_manifests /
    rewrite_data_files / this): delete files under the table location
    that no surviving snapshot references LIVE and no still-openable
    incremental window can serve. Orphans accumulate from crashed
    writer attempts (staged ``_staging-*`` dirs, Spark ``_temporary``
    leftovers) and from snapshot expiration (a ``rewrite_data_files``-
    replaced original whose last live-referencing snapshot has been
    expired). Tombstoned files are kept while their sequence number is
    still above the oldest-live-snapshot horizon — exactly the
    reachability rule `_plan_seq_window` uses to serve pre-rewrite
    windows from tombstones, so a tag pinning an old ``from`` snapshot
    keeps the window's bytes alive here too.

    Metadata-only read; commits nothing (like the Java action). Files
    whose mtime is at or after ``older_than_timestamp_ms`` (an ABSOLUTE
    epoch-ms cutoff, default: 3 days before now — pass
    ``now_ms - age`` for a duration) are kept: an in-flight writer
    stages files BEFORE its commit makes them referenced, so the
    recency guard is the only thing separating "orphan" from "about to
    be committed". Caveat inherited from the Java action's mtime
    semantics: files staged for a FUTURE discovery-mode
    ``commit_append`` with preserved old timestamps (``cp -p`` /
    ``rsync -a`` backfills) look like orphans — commit first, or vacuum
    with a cutoff older than the backfill. The ``metadata/`` tree is
    governed by :func:`expire_snapshots` and never touched; emptied
    directories are pruned only along the removed files' ancestor
    chains, so an in-flight writer's freshly-created empty staging dir
    is never rmdir'd from under it. Returns the removed (or, under
    ``dry_run``, would-be-removed) paths.

    Scale shape: one metadata walk (manifest lists + manifests, each
    read once via a path cache) and one filesystem listing — the same
    O(metadata + files) any orphan scan pays; nothing row-level."""
    import time as _time

    _version, meta, table_name = _maintenance_state(
        table_dir, catalog, table_name
    )
    now_ms = int(_time.time() * 1000) if now_ms is None else now_ms
    cutoff_ms = (
        now_ms - 3 * 24 * 3600 * 1000
        if older_than_timestamp_ms is None
        else older_than_timestamp_ms
    )
    horizon = min(
        (int(s["sequence-number"]) for s in meta.get("snapshots", [])),
        default=0,
    )
    referenced: set[str] = set()
    seen_manifests: set[str] = set()
    for s in meta.get("snapshots", []):
        _, mfs, _ = read_avro_ocf(s["manifest-list"])
        for mf in mfs:
            mp = mf["manifest_path"]
            if mp in seen_manifests:
                continue
            seen_manifests.add(mp)
            _, es, _ = read_avro_ocf(mp)
            for e in es:
                if e["status"] == 2:
                    seq = e.get("sequence_number")
                    if seq is None:
                        seq = mf.get("sequence_number", 0)
                    if int(seq) <= horizon:
                        # no openable window reaches it: bytes dead
                        continue
                referenced.add(os.path.realpath(e["data_file"]["file_path"]))
    removed: list[str] = []
    for root, dirs, names in os.walk(table_dir):
        if root == table_dir and "metadata" in dirs:
            dirs.remove("metadata")  # expire_snapshots' jurisdiction
        for name in names:
            if name.startswith(".") or name == "_SUCCESS":
                continue  # fs markers ride along with their dir
            p = os.path.join(root, name)
            if os.path.realpath(p) in referenced:
                continue
            try:
                mtime_ms = os.path.getmtime(p) * 1000
            except FileNotFoundError:
                continue
            if mtime_ms >= cutoff_ms:
                continue  # possibly staged ahead of an in-flight commit
            removed.append(p)
    if not dry_run:
        prune_dirs: set[str] = set()
        for p in removed:
            try:
                os.remove(p)
            except FileNotFoundError:
                pass
            # a checksum sidecar (.f.crc) of a removed file is pure
            # leak once its data file is gone
            crc = os.path.join(
                os.path.dirname(p), f".{os.path.basename(p)}.crc"
            )
            try:
                os.remove(crc)
            except OSError:
                pass
            d = os.path.dirname(p)
            while d != table_dir and d.startswith(table_dir):
                prune_dirs.add(d)
                d = os.path.dirname(d)
        # prune emptied dirs bottom-up, but ONLY along removed files'
        # ancestor chains — never a concurrent writer's fresh (still
        # empty) staging dir, and never anything under metadata/
        for d in sorted(prune_dirs, key=len, reverse=True):
            try:
                if not os.listdir(d):
                    os.rmdir(d)
            except OSError:
                pass
    return sorted(removed)


def fast_forward(
    table_dir: str,
    source: str,
    target: str = "main",
    now_ms: int | None = None,
    catalog=None,
    table_name: str | None = None,
) -> dict:
    """Publish a branch — the WAP (write-audit-publish) publish step:
    move ``target`` (default ``main``) to ``source``'s head. Requires
    the target head to be an ANCESTOR of the source head (walked via
    parent-snapshot-id), exactly Iceberg's ``fast_forward`` procedure —
    a divergent target needs an explicit choice (drop the branch or
    re-stage), never a silent overwrite. Advancing ``main`` also moves
    ``current-snapshot-id`` and appends the published head to the
    snapshot-log, so TIMESTAMP AS OF sees the publish instant, not the
    staging instants."""
    import time as _time

    version, meta, table_name = _maintenance_state(table_dir, catalog, table_name)
    refs = meta.get("refs") or {}
    src = refs.get(source)
    if src is None:
        raise ValueError(f"ref {source!r} not found")
    src_id = int(src["snapshot-id"])
    tgt = refs.get(target)
    tgt_id = int(tgt["snapshot-id"]) if tgt is not None else -1
    if tgt is not None and tgt.get("type") == "tag":
        raise ValueError(f"target ref {target!r} is a tag, not a branch")
    if tgt_id == src_id:
        return meta  # already published
    # ancestry walk: target head must be reachable from the source head
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    node = src_id
    while tgt_id != -1:
        snap = by_id.get(node)
        if snap is None:
            raise ValueError(
                f"cannot fast-forward {target!r}: its head {tgt_id} is "
                f"not an ancestor of {source!r} (lineage broken at "
                f"{node}); drop or re-stage the branch instead"
            )
        parent = snap.get("parent-snapshot-id")
        if parent == tgt_id:
            break
        if parent is None:
            raise ValueError(
                f"cannot fast-forward {target!r}: its head {tgt_id} is "
                f"not an ancestor of {source!r}; drop or re-stage the "
                "branch instead"
            )
        node = parent

    now_ms = int(_time.time() * 1000) if now_ms is None else now_ms
    now_ms = max(
        now_ms, max((e["timestamp-ms"] for e in meta["snapshot-log"]), default=0)
    )
    if catalog is not None:
        resp = catalog.commit_table(
            table_name,
            _maintenance_requirements(meta),
            [
                {
                    "action": "set-snapshot-ref",
                    "ref-name": target,
                    "type": "branch",
                    "snapshot-id": src_id,
                }
            ],
            now_ms,
        )
        return resp["metadata"]
    new_refs = dict(refs)
    new_refs[target] = {"snapshot-id": src_id, "type": "branch"}
    return _commit_refs_local(
        table_dir, version, meta, new_refs, now_ms,
        current_snapshot_id=src_id if target == "main" else None,
    )
