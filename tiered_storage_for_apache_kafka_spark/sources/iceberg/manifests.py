"""Manifest-entry Avro schemas, column stats, data-file discovery.

Split from the original sources/iceberg.py (r7); provenance and
parity citations live in the package __init__ and the function
docstrings.
"""

from __future__ import annotations

import os
import struct


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
    reads under its own base and the scans union. Files written under
    DIFFERENT partition specs (spec evolution: ``day=N/`` generation
    vs ``day=N/bucket=M/`` generation) differ in hive key pattern the
    same way, so the pattern joins the group key — each generation
    scans under its own inferred layout and the union reconciles
    columns by name."""
    groups: dict[tuple, list[str]] = {}
    for p in paths:
        rel = os.path.relpath(p, table_dir)
        first = rel.split(os.sep)[0]
        base = (
            os.path.join(table_dir, first)
            if first.startswith("_compacted-")
            else table_dir
        )
        hive_keys = tuple(
            seg.split("=", 1)[0]
            for seg in os.path.dirname(rel).split(os.sep)
            if "=" in seg
        )
        groups.setdefault((base, hive_keys), []).append(p)
    return sorted((base, ps) for (base, _k), ps in groups.items())


def _dirs_if_complete(paths: list[str]) -> list[str] | None:
    """Collapse an explicit planned-file list to its parent DIRECTORIES
    when — and only when — each directory contains exactly the planned
    files. Handing Spark N explicit paths costs a per-path
    getFileStatus + datasource resolution (measured 1.63 s for an
    800-file plan vs 0.10 s for its 4 directories); handing it the
    directories lists each with one listStatus. Exactness guard: any
    visible extra parquet file, any visible non-parquet file, or any
    visible subdirectory (Spark's directory scan would recurse into it)
    makes this return None and the caller keeps the explicit list —
    deleted-but-on-disk files, orphans, and foreign layouts all fall
    back. Hidden entries (``_``/``.`` prefix, e.g. _SUCCESS or
    ``_compacted-*``) are ignored by Spark's file index and therefore
    by the completeness check too. Non-local paths fall back via
    OSError."""
    by_dir: dict[str, set] = {}
    for p in paths:
        by_dir.setdefault(os.path.dirname(p), set()).add(os.path.basename(p))
    out = []
    for d, names in by_dir.items():
        try:
            entries = os.listdir(d)
        except OSError:
            return None
        visible = set()
        for e in entries:
            if e.startswith(("_", ".")):
                continue  # hidden to Spark's FileIndex
            if not e.endswith(".parquet") or os.path.isdir(os.path.join(d, e)):
                return None
            visible.add(e)
        if visible != names:
            return None
        out.append(d)
    return sorted(out)


def _input_files_match(df, planned: list[str]) -> bool:
    """Whether a directory-collapsed scan resolved to EXACTLY the
    planned file set (see the TOCTOU guard in
    :func:`_read_planned_files`). ``DataFrame.inputFiles`` reports
    URIs (``file:`` scheme, percent-encoded), so each side normalizes
    to raw paths before comparing; a literal ``+`` is a real ``+`` in
    a URI path, so plain unquote (never unquote_plus) is correct."""
    import re as _re
    import urllib.parse as _up

    actual = set()
    for u in df.inputFiles():
        if u.startswith("file:"):
            u = _up.unquote(_re.sub("^file:/+", "/", u))
        actual.add(u)
    return actual == set(planned)


def _read_planned_files(
    spark, table_dir: str, meta: dict, paths: list[str], project=None,
    schema_id: int | None = None,
):
    """Hand a planned file set to Spark's parquet reader, one scan per
    basePath group unioned (see :func:`_base_path_groups`); on an
    evolved table the scan runs under the EXPLICIT table schema
    (``schema_id`` selects a version for time travel; default current)
    — never parquet ``mergeSchema``, which cannot merge a promoted
    primitive (int32 vs int64 files fail), while an explicit wider
    schema up-casts old pages in place and null-pads added-as-optional
    columns, both vectorized. ``project`` maps each per-group scan
    before the union — needed for per-file metadata columns, which
    must be selected on the source scan, not after a union."""
    explicit = None
    read_struct = None
    if len(meta.get("schemas", [])) > 1:
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.schema import (  # noqa: E501
            iceberg_schema_to_spark,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (  # noqa: E501
            _current_schema_struct,
        )

        sid = (
            schema_id
            if schema_id is not None
            else meta["current-schema-id"]
        )
        read_struct = next(
            (s for s in meta["schemas"] if s["schema-id"] == sid), None
        )
        if read_struct is None:
            read_struct = _current_schema_struct(meta)
        explicit = iceberg_schema_to_spark(read_struct)
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.schema import (
        naming_log,
    )

    renamed_table = bool(naming_log(meta))
    dfs = []
    for base, ps in _base_path_groups(table_dir, paths):
        if not renamed_table:
            def _reader():
                r = spark.read.option("basePath", base)
                return r if explicit is None else r.schema(explicit)

            dirs = _dirs_if_complete(ps)
            if dirs is not None:
                df = _reader().parquet(*dirs)
                # TOCTOU guard (ADVICE r13): between the listdir
                # completeness check and Spark's own FileIndex listing,
                # a concurrent writer can drop a new parquet file into
                # the directory — silently widening the scan past the
                # planned snapshot. The DataFrame's resolved FileIndex
                # is final (listed once at construction), so comparing
                # its inputFiles against the plan closes the race
                # deterministically; any mismatch falls back to the
                # explicit list. One cheap driver call, no extra
                # listing job.
                if _input_files_match(df, ps):
                    dfs.append(df if project is None else project(df))
                    continue
            df = _reader().parquet(*sorted(ps))
            dfs.append(df if project is None else project(df))
            continue
        # RENAME-aware resolution (see schema.py "naming epochs"): the
        # table's column names have diverged across rename DDLs, so
        # each file must be read under the names of ITS write epoch
        # (encoded in the file name) and re-aliased by FIELD ID to the
        # requested schema version's names. Files of one epoch scan
        # together; the per-epoch select is exact by id, so a dropped
        # name re-used by a later add can never resurrect the dropped
        # column's physical values.
        for epoch, eps in sorted(_epoch_groups(ps).items()):
            df = _read_epoch_group(
                spark, base, eps, meta, epoch, read_struct, project
            )
            dfs.append(df)
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    # a TRANSFORMED partition column (day/bucket/truncate spec) is
    # metadata-only: the hive basePath recovery surfaces it as a scan
    # column, but it is not part of the table schema — drop it, as the
    # Iceberg reader contract requires (identity specs keep theirs: the
    # partition column IS a schema column there). Swept across EVERY
    # spec the table ever had, so spec-evolution reads never leak an
    # old generation's metadata column either.
    drop_cols = {
        f["name"]
        for spec in meta["partition-specs"]
        for f in spec["fields"]
        if f["transform"] != "identity"
    }
    for c in drop_cols:
        out = out.drop(c)
    return out


def _epoch_groups(paths: list[str]) -> dict[int, list[str]]:
    """Split one basePath group's files by write-time naming epoch
    (file-name marker; unmarked legacy files are epoch 0)."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.schema import (
        file_naming_epoch,
    )

    out: dict[int, list[str]] = {}
    for p in paths:
        out.setdefault(file_naming_epoch(p), []).append(p)
    return out


def _type_diverges(epoch_t, read_t) -> bool:
    """Whether an epoch-named type tree differs from the read schema's
    anywhere below this node — a nested rename, or a struct field the
    epoch never had (added later). Field-id identity makes the trees
    comparable node by node; list elements and map values recurse
    (their struct fields rename by dotted ``.element.`` / ``.value.``
    paths since r13)."""
    if not isinstance(read_t, dict):
        return False
    kind = read_t.get("type")
    if kind == "struct":
        e_by_id = {f["id"]: f for f in epoch_t["fields"]}
        for rf in read_t["fields"]:
            ef = e_by_id.get(rf["id"])
            if ef is None or ef["name"] != rf["name"]:
                return True
            if _type_diverges(ef["type"], rf["type"]):
                return True
        return False
    if kind == "list":
        return _type_diverges(epoch_t["element"], read_t["element"])
    if kind == "map":
        return _type_diverges(
            epoch_t["key"], read_t["key"]
        ) or _type_diverges(epoch_t["value"], read_t["value"])
    return False


def _realias_expr(src, epoch_t, read_t, spark_t):
    """A Column expression reshaping ``src`` (typed as the epoch-named
    tree ``epoch_t``) to the read schema's tree ``read_t``: nested
    struct fields re-alias by FIELD ID, struct fields the epoch never
    had null-pad at their declared type, and a NULL struct stays NULL
    (the F.struct rebuild alone would manufacture a non-null struct of
    nulls). List elements and map values with diverged struct fields
    rebuild through ``F.transform`` / ``F.transform_values`` lambdas
    (r13 ``.element.`` / ``.value.`` renames) — null containers pass
    through null. Identical subtrees pass through untouched, so a
    top-level-only rename keeps its original single-alias plan."""
    from pyspark.sql import functions as F

    if not isinstance(read_t, dict):
        return src  # primitives
    if not _type_diverges(epoch_t, read_t):
        return src
    kind = read_t.get("type")
    if kind == "list":
        return F.transform(
            src,
            lambda x: _realias_expr(
                x, epoch_t["element"], read_t["element"],
                spark_t.elementType,
            ),
        )
    if kind == "map":
        return F.transform_values(
            src,
            lambda _k, v: _realias_expr(
                v, epoch_t["value"], read_t["value"], spark_t.valueType
            ),
        )
    if kind != "struct":
        return src
    e_by_id = {f["id"]: f for f in epoch_t["fields"]}
    children = []
    for rf in read_t["fields"]:
        ch_spark = spark_t[rf["name"]].dataType
        ef = e_by_id.get(rf["id"])
        if ef is None:
            children.append(
                F.lit(None).cast(ch_spark).alias(rf["name"])
            )
        else:
            children.append(
                _realias_expr(
                    src[ef["name"]], ef["type"], rf["type"], ch_spark
                ).alias(rf["name"])
            )
    return F.when(src.isNotNull(), F.struct(*children)).otherwise(
        F.lit(None).cast(spark_t)
    )


def _read_epoch_group(
    spark, base: str, paths: list[str], meta: dict, epoch: int,
    read_struct: dict, project,
):
    """Scan one naming epoch's files under that epoch's column names
    and re-alias by FIELD ID to the requested schema version's names
    — the engine's planner-side equivalent of Iceberg's id-based
    parquet resolution (see schema.py "naming epochs"), at EVERY
    nesting depth since r13 (nested struct fields rename too). Field
    ids the epoch never had read as typed nulls (the column cannot
    exist in those files); ids dropped from the read schema are never
    selected, so a re-used column name cannot resurrect pre-drop
    values. All JVM-side: one explicit-schema columnar scan plus a
    projection (nested divergence adds a struct rebuild to the
    projection; never a shuffle)."""
    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.sources.iceberg.schema import (
        epoch_id_names,
        epoch_named_type,
        iceberg_schema_to_spark,
    )

    epoch_names = epoch_id_names(meta, epoch)
    present = [f for f in read_struct["fields"] if f["id"] in epoch_names]
    absent = [f for f in read_struct["fields"] if f["id"] not in epoch_names]
    epoch_fields = {
        f["id"]: {
            **f,
            "name": epoch_names[f["id"]],
            "type": epoch_named_type(f["type"], epoch_names),
        }
        for f in present
    }
    epoch_struct = {
        **read_struct,
        "fields": [epoch_fields[f["id"]] for f in present],
    }
    df = (
        spark.read.option("basePath", base)
        .schema(iceberg_schema_to_spark(epoch_struct))
        .parquet(*sorted(paths))
    )
    if project is not None:
        df = project(df)  # metadata cols resolve on the scan relation
    spark_read = iceberg_schema_to_spark(read_struct)
    cols = [
        _realias_expr(
            F.col(epoch_names[f["id"]]),
            epoch_fields[f["id"]]["type"],
            f["type"],
            spark_read[f["name"]].dataType,
        ).alias(f["name"])
        for f in present
    ] + [
        F.lit(None).cast(spark_read[f["name"]].dataType).alias(f["name"])
        for f in absent
    ]
    selected = {epoch_names[f["id"]] for f in present}
    extras = [F.col(c) for c in df.columns if c not in selected]
    return df.select(*cols, *extras)


def _field_id(schema_struct: dict, name: str) -> int:
    for f in schema_struct["fields"]:
        if f["name"] == name:
            return f["id"]
    raise KeyError(name)


# -- multi-field partition-spec helpers ----------------------------------------
#
# A partition spec is its ordered ``fields`` list (Iceberg spec
# "Partition Specs"): each field has name/transform/source-id/field-id.
# Every helper below takes either the legacy single-column string, a
# list of names, or a list of ``(name, field_id)`` pairs, so the
# single-field call sites keep working while the spec model is N-ary.


def _normalize_partition_cols(partition_cols) -> list[tuple[str, int, str]]:
    """Normalize the accepted partition-column shapes to an ordered
    ``[(name, field_id, type), ...]`` list (type "int" or "string" —
    the partition struct's Avro/value type). Bare names get the spec's
    default 1000-based ids IN ORDER and type "int"; pass explicit
    triples (or a spec's fields via :func:`spec_typed_cols`) when ids
    or types must match an evolved/typed spec."""
    if isinstance(partition_cols, str):
        return [(partition_cols, 1000, "int")]
    out = []
    for i, c in enumerate(partition_cols):
        if isinstance(c, str):
            out.append((c, 1000 + i, "int"))
        elif len(c) == 2:
            name, fid = c
            out.append((str(name), int(fid), "int"))
        else:
            name, fid, typ = c
            if typ not in ("int", "string"):
                raise ValueError(f"partition value type {typ!r}")
            out.append((str(name), int(fid), typ))
    return out


def spec_field_type(field: dict, schema_struct: dict | None = None) -> str:
    """The partition VALUE type a spec field produces — "int" for
    bucket/temporal/void and for numeric identity/truncate sources,
    "string" for string identity/truncate sources (Iceberg spec
    "Partition Transforms" result types, narrowed to the two types the
    engine's partition plane carries)."""
    t = field["transform"]
    if t.startswith("bucket") or t in ("year", "month", "day", "hour", "void"):
        return "int"
    if schema_struct is None:
        return "int"
    src = next(
        (
            f["type"]
            for f in schema_struct["fields"]
            if f["id"] == field["source-id"]
        ),
        None,
    )
    return "string" if src == "string" else "int"


def spec_name_ids(spec: dict) -> list[tuple[str, int]]:
    """A spec dict's fields as ``(name, field_id)`` pairs (legacy
    int-typed form; prefer :func:`spec_typed_cols` where the schema is
    at hand)."""
    return [(f["name"], int(f["field-id"])) for f in spec["fields"]]


def spec_typed_cols(
    spec: dict, schema_struct: dict
) -> list[tuple[str, int, str]]:
    """A spec dict's fields as the ``(name, field_id, type)`` triples
    the schema/stat builders take, types resolved against the table
    schema."""
    return [
        (f["name"], int(f["field-id"]), spec_field_type(f, schema_struct))
        for f in spec["fields"]
    ]


def spec_names(spec: dict) -> list[str]:
    return [f["name"] for f in spec["fields"]]


def spec_bound_widths(spec: dict, schema_struct: dict | None) -> dict[str, str]:
    """Per spec-field SERIALIZATION type for the manifest-list
    partition summary bounds — ``{name: "int" | "long" | "string"}``.
    Appendix D single-value serialization is TYPE-determined (a long
    field is ALWAYS 8 bytes, however small its values), so the width
    must come from the spec field's result type, not from the observed
    values: bucket/temporal/void transforms produce int; identity and
    truncate inherit the SOURCE column's schema type."""
    out: dict[str, str] = {}
    for f in spec["fields"]:
        t = f["transform"]
        if t.startswith("bucket") or t in (
            "year", "month", "day", "hour", "void",
        ):
            out[f["name"]] = "int"
            continue
        src = None
        if schema_struct is not None:
            src = next(
                (
                    fd["type"]
                    for fd in schema_struct["fields"]
                    if fd["id"] == f["source-id"]
                ),
                None,
            )
        out[f["name"]] = (
            src if src in ("string", "long") else "int"
        )
    return out


def partition_field_summaries(
    part_dicts: list[dict],
    names: list[str],
    widths: dict[str, str] | None = None,
) -> list[dict]:
    """The manifest-list ``partitions`` field summary — ONE record per
    spec field, in spec order (Iceberg spec "Manifest Lists"): null
    flag + lower/upper bound over every entry's partition value for
    that field, in the spec's single-value serialization (int32/int64
    little-endian for int/long, UTF-8 bytes for strings — Appendix D).
    This per-field array is what lets a reader prune a manifest on ANY
    spec field without opening it.

    ``widths`` (from :func:`spec_bound_widths`) fixes each field's pack
    width by its SCHEMA type — Appendix D is type-determined, so a long
    partition field serializes 8 bytes even when its values fit int32
    (an external reader decodes by field type and would misparse 4-byte
    bounds). Fields absent from ``widths`` (or ``widths=None``) keep
    the legacy value-dependent width, which this engine's by-length
    reader decodes either way."""
    out = []
    for name in names:
        vals = [p.get(name) for p in part_dicts]
        non_null = [v for v in vals if v is not None]
        width = (widths or {}).get(name)
        if width == "string" or (
            width is None and non_null and isinstance(non_null[0], str)
        ):
            strs = [v for v in non_null if isinstance(v, str)] or [""]
            lo_b = min(strs).encode("utf-8")
            hi_b = max(strs).encode("utf-8")
        else:
            ints = non_null or [0]
            lo_v, hi_v = min(ints), max(ints)
            if width == "long":
                fmt = "<q"
            elif width == "int":
                # an int-typed field cannot legally hold a value past
                # int32 — struct.error here is loud corruption, never
                # a silently mis-sized bound
                fmt = "<i"
            else:
                # legacy value-dependent width: int32 LE when the value
                # fits, int64 LE otherwise; readers decode by length
                fmt = (
                    "<i"
                    if -(2**31) <= lo_v and hi_v < 2**31
                    else "<q"
                )
            lo_b = struct.pack(fmt, lo_v)
            hi_b = struct.pack(fmt, hi_v)
        out.append(
            {
                "contains_null": any(v is None for v in vals),
                "contains_nan": False,
                "lower_bound": lo_b,
                "upper_bound": hi_b,
            }
        )
    return out


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


def _bounds_pack(value, physical: str) -> bytes:
    """Iceberg single-value binary serialization (spec Appendix D):
    int -> 4-byte little-endian, long -> 8-byte little-endian,
    string -> UTF-8 bytes."""
    if physical == "BYTE_ARRAY":
        return value.encode("utf-8")
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


def _partition_struct_schema(partition_cols) -> dict:
    """The manifest entry's partition struct: one nullable field per
    spec field, in spec order, carrying the spec's field-ids and value
    types (single-field int callers pass a bare name and get the
    legacy 1000-id shape byte-for-byte)."""
    return {
        "type": "record",
        "name": "r102",
        "fields": [
            {
                "name": name,
                "type": ["null", typ],
                "default": None,
                "field-id": fid,
            }
            for name, fid, typ in _normalize_partition_cols(partition_cols)
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


def manifest_entry_schema(partition_cols) -> dict:
    """Avro schema of a v2 ``manifest_entry`` (spec "Manifest" section);
    field ids via the ``field-id`` attribute as the Java writer emits.
    Includes the column-stats maps (value/null counts, lower/upper
    bounds — spec Appendix field ids) the scan planner prunes files
    with. ``partition_cols`` is a name, a list of names, or a list of
    ``(name, field_id)`` pairs — the partition struct holds one field
    per spec field, in spec order."""
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": _partition_struct_schema(partition_cols),
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


def _hive_partition_values(path_part: str, cols) -> dict:
    """Parse every ``name=value`` hive segment of a path for the given
    spec fields -> ``{name: value | None}`` (value typed per the
    field's partition type); fields with no segment are absent from
    the dict (files written under an OLDER spec lack the newer fields
    — absence, not null). ``cols`` takes names or (name, id, type)
    triples; bare names parse as int (the legacy shape)."""
    types = {
        name: typ for name, _fid, typ in _normalize_partition_cols(cols)
    }
    out: dict = {}
    for seg in path_part.split(os.sep):
        if "=" not in seg:
            continue
        k, v = seg.split("=", 1)
        if k in types:
            if v == "__HIVE_DEFAULT_PARTITION__":
                out[k] = None
            else:
                out[k] = v if types[k] == "string" else int(v)
    return out


def _discover_data_files(table_dir: str, partition_cols) -> list[dict]:
    """Walk the parquet table (written by ``table_mode.write_table``,
    hive-partitioned ``{col}=N`` dirs, nested per spec field for
    multi-field specs) and collect per-file stats from the parquet
    footers (pyarrow — the same footer stats the Java writer
    records)."""
    import pyarrow.parquet as pq

    cols = _normalize_partition_cols(partition_cols)
    names = [n for n, _f, _t in cols]
    files = []
    for root, _dirs, fnames in os.walk(table_dir):
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
        part = _hive_partition_values(root[len(table_dir):], cols)
        for name in sorted(fnames):
            if not name.endswith(".parquet"):
                continue
            if name.startswith("delete-"):
                # position-delete files (write_position_deletes);
                # discovery mode must never sweep them in as data
                continue
            files.append(
                _stat_one_file(os.path.join(root, name), part, names)
            )
    return sorted(files, key=lambda f: f["file_path"])


def _temporal_to_int(v):
    """An EXACT integer for a pyarrow temporal stat value — epoch-day
    ordinal for dates, epoch micros for datetimes (integer timedelta
    arithmetic, never float `.timestamp()`), None for anything else.
    Parquet date/timestamp stats are fixed-width (INT32/INT64), so the
    footer values are exact — only variable-width stats can be
    writer-truncated."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        td = v - epoch
        return (td.days * 86_400 + td.seconds) * 10**6 + td.microseconds
    if isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days
    return None


def _fold_column_stats(col_stats: dict, col, rg_rows: int) -> None:
    """Fold one row-group column chunk's footer stats into the per-file
    aggregate (min/max/null-count/value-count keyed by leaf path).

    A column is POISONED (entry set to None, never published) when any
    chunk lacks min/max or reports a value outside the safe shapes —
    plain ints, temporal values (date -> epoch-day ordinal, timestamp
    -> epoch micros: fixed-width footer stats are exact, and the
    integer forms are exactly Iceberg's Appendix D single-value
    serialization for date/timestamp), or plain strings shorter than
    64 chars (long binary stats may be writer-truncated with no
    exactness flag exposed): partial or inexact stats would publish
    too-narrow bounds / undercounted nulls, and an external engine
    pruning on them would silently drop rows — no stats is always
    safe, wrong stats never are."""
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
    plain_strs = (
        st is not None
        and st.has_min_max
        and isinstance(st.min, str)
        and isinstance(st.max, str)
        and len(st.min) < 64
        and len(st.max) < 64
        and st.null_count is not None
    )
    temporal = (
        st is not None
        and st.has_min_max
        and st.null_count is not None
        and not plain_ints
        and not plain_strs
        and _temporal_to_int(st.min) is not None
        and _temporal_to_int(st.max) is not None
        and col.physical_type in ("INT32", "INT64")
        # NANOS columns are excluded: pyarrow reports their stats as
        # ns-precision pandas Timestamps, and the micros conversion
        # would truncate the UPPER bound downward — an unsafe bound
        # that could silently drop rows from a pruning reader
        and "nanoseconds" not in str(st.logical_type)
    )
    if not plain_ints and not plain_strs and not temporal:
        col_stats[path] = None
        return
    mn = _temporal_to_int(st.min) if temporal else st.min
    mx = _temporal_to_int(st.max) if temporal else st.max
    cur = col_stats.get(path)
    if cur is None:
        col_stats[path] = {
            "min": mn,
            "max": mx,
            "nulls": st.null_count,
            "n": rg_rows,
            "physical": col.physical_type,
        }
        return
    cur["min"] = min(cur["min"], mn)
    cur["max"] = max(cur["max"], mx)
    cur["nulls"] += st.null_count
    cur["n"] += rg_rows


def _stat_one_file(
    path: str, part, names: list[str] | None = None
) -> dict:
    import pyarrow.parquet as pq

    if not isinstance(part, dict):  # legacy scalar: the default field
        part = {"partition": part}
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
            if col.physical_type not in ("INT32", "INT64", "BYTE_ARRAY"):
                continue
            _fold_column_stats(col_stats, col, rg.num_rows)
        offsets.append(min(starts))
    if names is None:
        names = sorted(part)
    # partition dict in SPEC ORDER, every spec field present (None for
    # fields the path carried no segment for — pre-evolution writers
    # never hit this; the hive layout always names each spec field)
    partition = {n: part.get(n) for n in names}
    return {
        "file_path": path,
        "partition": partition,
        # legacy single-field alias (first spec field) — several
        # single-spec consumers (puffin FILE_LIST, tests) still read it
        "partition_value": partition[names[0]] if names else None,
        "record_count": md.num_rows,
        "file_size_in_bytes": os.path.getsize(path),
        "split_offsets": sorted(offsets),
        "column_stats": col_stats,
    }


def _stat_data_files(paths: list[str], partition_cols) -> list[dict]:
    """Footer stats for an explicit file list; partition values come
    from the hive path components, same layout discovery walks."""
    cols = _normalize_partition_cols(partition_cols)
    names = [n for n, _f, _t in cols]
    out = []
    for path in paths:
        if not os.path.exists(path):
            raise FileNotFoundError(f"explicit commit file absent: {path}")
        part = _hive_partition_values(path, cols)
        out.append(_stat_one_file(path, part, names))
    return out


# -- the commit ---------------------------------------------------------------


def parse_sort_field(spec: str) -> tuple[str, str, str]:
    """Parse one ``sort_by`` entry into ``(column, direction,
    null_order)`` — SQL ORDER-BY-style suffixes over the bare column
    default (``"v"`` = asc nulls-first):

        "v"  "v desc"  "v asc nulls last"  "v desc nulls first"

    Defaults follow the Iceberg spec's DDL ("Sort Orders"): asc implies
    nulls-first, desc implies nulls-last, either overridable."""
    toks = str(spec).split()
    if not toks:
        raise ValueError("empty sort_by entry")
    col, rest = toks[0], [t.lower() for t in toks[1:]]
    direction = "asc"
    if rest and rest[0] in ("asc", "desc"):
        direction = rest[0]
        rest = rest[1:]
    if not rest:
        null_order = "nulls-first" if direction == "asc" else "nulls-last"
    elif rest == ["nulls", "first"]:
        null_order = "nulls-first"
    elif rest == ["nulls", "last"]:
        null_order = "nulls-last"
    else:
        raise ValueError(
            f"sort_by entry {spec!r}: expected "
            "'col [asc|desc] [nulls first|nulls last]'"
        )
    return col, direction, null_order


def match_or_add_sort_order(
    meta: dict, sort_cols: list[str], schema_struct: dict
) -> tuple[dict, int, dict | None]:
    """Resolve ``sort_cols`` to a table SORT ORDER (Iceberg spec "Sort
    Orders": ordered identity fields by source id, each with direction
    and null-order — entries parse via :func:`parse_sort_field`, so
    ``"ts desc"`` is a distinct order from ``"ts"``) — reusing an
    existing order with the same field list, registering a fresh
    ``order-id`` otherwise. Shared by the sorted write path and
    sorted compaction so the same column list never mints two ids.
    Returns ``(meta', order_id, new_order_or_None)``."""
    leaf_ids = _leaf_field_ids(schema_struct)
    order_fields = []
    for spec_str in sort_cols:
        c, direction, null_order = parse_sort_field(spec_str)
        fid = leaf_ids.get(c)
        if fid is None:
            raise KeyError(f"no scalar leaf column {c!r} in the table schema")
        order_fields.append(
            {
                "transform": "identity",
                "source-id": fid,
                "direction": direction,
                "null-order": null_order,
            }
        )
    existing = meta.get("sort-orders", [])
    match = next(
        (o for o in existing if o.get("fields") == order_fields), None
    )
    if match is not None:
        return meta, int(match["order-id"]), None
    order_id = max((int(o["order-id"]) for o in existing), default=0) + 1
    new_order = {"order-id": order_id, "fields": order_fields}
    return (
        {**meta, "sort-orders": existing + [new_order]},
        order_id,
        new_order,
    )
