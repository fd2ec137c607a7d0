"""Spark <-> Iceberg schema conversion and schema evolution.

Split from the original sources/iceberg.py (r7); provenance and
parity citations live in the package __init__ and the function
docstrings.
"""

from __future__ import annotations

from typing import Any


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
    ADD-AS-OPTIONAL plus the spec's legal primitive PROMOTIONS —
    int→long and float→double (Iceberg spec "Schema Evolution";
    the reference's own promotion table, `SchemaUtils.java:80-84`) —
    with existing fields KEEPING their ids (the Iceberg correctness
    contract: ids are the identity of a column across files; a
    promoted field keeps its id, only its type widens, and old data
    files' narrower physical pages up-cast at read time). A batch
    whose column is NARROWER than the table's (int into a long
    column) is not a schema change at all — the table type stays and
    the batch up-casts on write/read. Removals keep the old field
    (Iceberg drops are explicit operations, not inferred); any other
    type change is rejected. Returns
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
            new_t, old_t = _strip_ids(new_flat), _strip_ids(cur_t)
            if new_t != old_t:
                if isinstance(new_t, dict) or isinstance(old_t, dict):
                    if _canon_order(new_t) == _canon_order(old_t):
                        # same names and types, container element
                        # fields merely REORDERED — legal (parquet and
                        # every reader resolve nested fields by name;
                        # conform re-aligns the batch); table type
                        # stays, no schema change
                        out_fields.append(cf)
                        continue
                    # genuine container-shape mismatch: evolution
                    # never merges inside list/map elements — a batch
                    # carrying a RENAMED-AWAY element field name lands
                    # here (the stale-writer shape one container down)
                    raise TypeError(
                        f"incompatible change at {nf.name}: the "
                        f"batch's container element schema differs "
                        f"from the table's ({old_t!r} vs {new_t!r}) — "
                        "if an element field was renamed, rebuild the "
                        "writer against the current schema (evolution "
                        "never infers changes inside arrays/maps)"
                    )
                # spec-legal primitive promotions only; the symmetric
                # narrower-batch case keeps the table's wider type with
                # no schema change (the batch up-casts instead)
                promo = {("int", "long"): "long",
                         ("float", "double"): "double"}
                if promo.get((old_t, new_t)) is not None:
                    cf = {**cf, "type": promo[(old_t, new_t)]}
                    changed["v"] = True
                elif promo.get((new_t, old_t)) is None:
                    raise TypeError(
                        f"incompatible change at {nf.name}: {cur_t!r} -> "
                        f"{new_flat!r} (add-as-optional and int->long / "
                        "float->double promotion are the legal evolutions "
                        "in the Iceberg metadata plane)"
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


def _canon_order(t):
    """Canonicalize a stripped type tree for ORDER-INSENSITIVE
    comparison: struct field lists sort by name at every depth. Two
    types canon-equal differ at most in sibling order — legal for a
    batch (nested fields resolve by name everywhere; conform
    re-aligns), where any name/type difference is a real change."""
    if isinstance(t, dict):
        out = {k: _canon_order(v) for k, v in t.items() if k != "fields"}
        if "fields" in t:
            out["fields"] = sorted(
                (_canon_order(f) for f in t["fields"]),
                key=lambda f: f.get("name", ""),
            )
        return out
    return t


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


def promoted_field_ids(old_schema: dict, new_schema: dict) -> set[int]:
    """Field ids whose primitive type differs between two schema
    versions — the promoted columns of an evolution step (same-id
    fields are the same column by the Iceberg identity contract)."""

    def leaf_types(struct: dict, out: dict) -> None:
        for f in struct["fields"]:
            t = f["type"]
            if isinstance(t, dict) and t.get("type") == "struct":
                leaf_types(t, out)
            else:
                out[f["id"]] = _strip_ids(t)

    old_t: dict = {}
    new_t: dict = {}
    leaf_types(old_schema, old_t)
    leaf_types(new_schema, new_t)
    return {
        i for i, t in new_t.items() if i in old_t and old_t[i] != t
    }


def guard_partition_source_promotion(
    base: dict, old_schema: dict, new_schema: dict
) -> None:
    """Reject a type promotion on a column that is the source of a
    SOURCE-TYPED partition transform — ``identity`` or ``truncate`` —
    in ANY spec generation the table ever had: their partition VALUES
    (hive paths, file partition structs, manifest summary bounds) are
    typed at write time, so widening the source would make new values
    disagree in width with committed ones under one spec id. A
    ``bucket[N]`` source promotes FREELY: the spec hashes int and long
    identically (8-byte LE Murmur3 — `transforms.bucket_hash_long`,
    the spec's own promotion guarantee) and its partition value is the
    width-independent bucket ordinal. Iceberg permits even the
    source-typed cases; the engine trades those away for
    planner-simplicity (evolve the SPEC to a new field instead)."""
    promoted = promoted_field_ids(old_schema, new_schema)
    if not promoted:
        return
    names = {f["id"]: f["name"] for f in new_schema["fields"]}
    for spec in base.get("partition-specs", []):
        for f in spec["fields"]:
            t = str(f.get("transform", "identity"))
            if t != "identity" and not t.startswith("truncate"):
                continue
            if f["source-id"] in promoted:
                raise ValueError(
                    f"cannot promote column "
                    f"{names.get(f['source-id'], f['source-id'])!r}: it "
                    f"is a source-typed partition source ({t}) of spec "
                    f"{spec['spec-id']} (committed partition values/"
                    "summaries are packed at the old width); evolve "
                    "the partition spec to a new field instead"
                )


# -- naming epochs: per-file column-name resolution across RENAME -------------
#
# Iceberg proper resolves parquet columns BY FIELD ID (the ids its
# writers stamp into every file — `iceberg/data/TableWriterFactory.java:
# 50-95` in the reference's Iceberg dependency), which is what makes
# RENAME COLUMN a metadata-only operation. This engine reads through
# Spark's name-based parquet scan, so it needs to know, per planned
# file, WHICH name each field id was written under. Rather than paying
# per-file footer I/O at plan time (O(files) driver reads — a
# scale-killer at 100 TB) or depending on a session conf the driver's
# vanilla session won't have (`spark.sql.parquet.fieldId.read.enabled`
# is consumed lazily at execution, after a set-and-restore has
# restored), the engine exploits an invariant it controls: column
# names only ever diverge at an explicit RENAME DDL. Each rename bumps
# a monotone NAMING EPOCH (table property `engine.naming-epoch`, log
# in `engine.naming-log`), and every data file the engine stages
# carries its write-time epoch in its FILE NAME (`…-e<N>.parquet` —
# immutable through manifest rewrites, compaction carries, snapshot
# expiry, and mirror copies, unlike any metadata-side mapping).
# Within an epoch, the name of every live field id is constant (adds/
# drops/promotions never rename), so (epoch, field id) -> name is
# exact. Files with no marker predate rename support and resolve
# under epoch 0 — also exact, because no rename can have touched them.
# New files ADDITIONALLY carry real parquet field ids (see
# `writer._with_parquet_field_ids`) so external id-based Iceberg
# readers resolve them spec-compliantly; the epoch machinery is only
# the engine's own planner-side equivalent.

_EPOCH_RE = r"-e(\d+)\.parquet$"


def file_naming_epoch(path: str) -> int:
    """The naming epoch a data file was written under, parsed from the
    engine's ``…-e<N>.parquet`` file-name marker; unmarked files (any
    writer generation before rename support) are epoch 0, which is
    exact: no rename existed that could have diverged their names."""
    import re

    m = re.search(_EPOCH_RE, path)
    return int(m.group(1)) if m else 0


def naming_log(meta: dict) -> list[tuple[int, int]]:
    """The table's rename history as ``[(epoch, first-schema-id)]``,
    sorted by epoch: epoch k's naming governs schema ids in
    ``[first_sid_k, first_sid_{k+1})``. Empty for tables never renamed
    (the fast-path signal: reads skip epoch grouping entirely)."""
    import json as _json

    raw = (meta.get("properties") or {}).get("engine.naming-log")
    if not raw:
        return []
    return sorted((int(e["epoch"]), int(e["schema-id"])) for e in _json.loads(raw))


def _walk_named_fields(fields: list[dict], out: dict[int, str]) -> None:
    """Collect ``{field id: name}`` over a field list at EVERY depth:
    struct subtrees recurse (their fields are named and renameable);
    list elements and map keys/values carry no names themselves but
    may hold named structs, so their subtrees recurse too."""

    def walk_type(t) -> None:
        if not isinstance(t, dict):
            return
        kind = t.get("type")
        if kind == "struct":
            for f in t["fields"]:
                out[f["id"]] = f["name"]
                walk_type(f["type"])
        elif kind == "list":
            walk_type(t["element"])
        elif kind == "map":
            walk_type(t["key"])
            walk_type(t["value"])

    walk_type({"type": "struct", "fields": fields})


def epoch_id_names(meta: dict, epoch: int) -> dict[int, str]:
    """``{field id: column name}`` as written by files of the given
    naming epoch — at EVERY nesting depth (nested struct fields rename
    by id exactly like top-level columns since r13): resolved from the
    NEWEST schema version of that epoch (ids the epoch never saw are
    absent — their columns cannot exist in the epoch's files and read
    as typed nulls), falling back through the epoch's earlier versions
    for ids dropped mid-epoch (a pre-drop file still physically
    carries the column under its constant epoch name)."""
    log = naming_log(meta)
    starts = {e: s for e, s in log}
    lo = starts.get(epoch, 0)
    hi = min(
        (s for e, s in log if e > epoch), default=float("inf")
    )
    out: dict[int, str] = {}
    for s in sorted(
        (s for s in meta.get("schemas", []) if lo <= s["schema-id"] < hi),
        key=lambda s: s["schema-id"],
    ):
        _walk_named_fields(s["fields"], out)  # newest of the epoch wins
    return out


def epoch_named_type(t, epoch_names: dict[int, str]):
    """The epoch-facing variant of a READ-schema type tree: every
    struct field (any depth) renamed to its epoch name by field id,
    and struct fields whose id the epoch never saw DROPPED (their
    columns cannot exist in the epoch's files; the read-side re-alias
    null-pads them back). The tree SHAPE otherwise follows the read
    schema — field-id identity makes the two trees comparable node by
    node."""
    if not isinstance(t, dict):
        return t
    kind = t.get("type")
    if kind == "struct":
        fields = []
        for f in t["fields"]:
            if f["id"] not in epoch_names:
                continue
            fields.append(
                {
                    **f,
                    "name": epoch_names[f["id"]],
                    "type": epoch_named_type(f["type"], epoch_names),
                }
            )
        return {**t, "fields": fields}
    if kind == "list":
        return {**t, "element": epoch_named_type(t["element"], epoch_names)}
    if kind == "map":
        return {
            **t,
            "key": epoch_named_type(t["key"], epoch_names),
            "value": epoch_named_type(t["value"], epoch_names),
        }
    return t


def resolve_field_path(schema_struct: dict, dotted: str) -> list[dict]:
    """Resolve a dotted column path (``kafka.ts``) against a schema
    struct to the chain of field dicts it names, outermost first.
    Container hops use Iceberg's canonical pseudo-segments (r13):
    ``arr.element.x`` descends into a list's element struct and
    ``mp.value.x`` into a map's value struct (map KEYS are immutable
    identity — renaming inside them is refused); the pseudo-segments
    appear in the chain as synthetic field dicts (``name`` =
    ``element``/``value``, ``id`` = the container's element/value id)
    so callers can tell containers from real fields. Raises
    ``KeyError`` when a segment is missing and ``ValueError`` when a
    segment tries to cross a container without its pseudo-segment."""
    parts = dotted.split(".")
    chain: list[dict] = []
    t: Any = {"type": "struct", "fields": schema_struct["fields"]}
    for i, part in enumerate(parts):
        if isinstance(t, dict) and t.get("type") == "list":
            if part != "element":
                raise ValueError(
                    f"path {dotted!r}: {'.'.join(parts[:i])!r} is a "
                    "list — descend with '.element.' (Iceberg's "
                    "canonical path segment)"
                )
            chain.append(
                {
                    "id": t["element-id"],
                    "name": "element",
                    "required": t.get("element-required", False),
                    "type": t["element"],
                    "_container": "list",
                }
            )
            t = t["element"]
            continue
        if isinstance(t, dict) and t.get("type") == "map":
            if part != "value":
                raise ValueError(
                    f"path {dotted!r}: {'.'.join(parts[:i])!r} is a "
                    "map — descend with '.value.' (keys are the map's "
                    "immutable identity; renaming inside them is not "
                    "offered)"
                )
            chain.append(
                {
                    "id": t["value-id"],
                    "name": "value",
                    "required": t.get("value-required", False),
                    "type": t["value"],
                    "_container": "map",
                }
            )
            t = t["value"]
            continue
        if not (isinstance(t, dict) and t.get("type") == "struct"):
            kind = t.get("type") if isinstance(t, dict) else t
            raise ValueError(
                f"path {dotted!r} traverses a non-struct ({kind}) at "
                f"{'.'.join(parts[:i])!r}"
            )
        f = next((f for f in t["fields"] if f["name"] == part), None)
        if f is None:
            where = repr(".".join(parts[:i])) if i else "the top level"
            raise KeyError(
                f"column path {dotted!r}: no field {part!r} in {where}"
            )
        chain.append(f)
        t = f["type"]
    if chain and chain[-1].get("_container"):
        raise ValueError(
            f"path {dotted!r} ends on a container pseudo-segment — "
            "name a struct field inside it"
        )
    return chain


def historical_level_names(meta: dict) -> dict:
    """Per-struct-level NAME HISTORY over every schema version the
    table ever had: ``{"__top__": {top-level names...}, <owner field
    id>: {child names of that struct level...}}`` (list element /
    map value structs key by their element/value ids). The streaming
    readers use it to tell a DROPPED (or renamed-away) column in an
    old file — skippable losslessly, the current table does not serve
    it either — from a truly unknown one, which still fails toward a
    restart (r13; previously a plain DROP wedged streams on pre-drop
    files)."""
    out: dict = {"__top__": set()}

    def walk_type(owner, t) -> None:
        if not isinstance(t, dict):
            return
        kind = t.get("type")
        if kind == "struct":
            names = out.setdefault(owner, set())
            for f in t["fields"]:
                names.add(f["name"])
                walk_type(f["id"], f["type"])
        elif kind == "list":
            walk_type(t["element-id"], t["element"])
        elif kind == "map":
            walk_type(t["key-id"], t["key"])
            walk_type(t["value-id"], t["value"])

    for s in meta.get("schemas", []):
        out["__top__"] |= {f["name"] for f in s["fields"]}
        for f in s["fields"]:
            walk_type(f["id"], f["type"])
    return out


def schema_epoch(meta: dict, schema_id: int) -> int:
    """The naming epoch a schema version belongs to (0 before the
    first rename)."""
    epoch = 0
    for e, s in naming_log(meta):
        if schema_id >= s:
            epoch = e
    return epoch


def guard_readded_column(base: dict, old_schema: dict, new_schema: dict) -> None:
    """Reject evolution-on-WRITE re-introducing a column NAME that a
    previous schema version used but the current one dropped: a batch
    that still carries a dropped name is almost always a STALE WRITER
    built against the pre-drop (or pre-rename) schema, not a schema
    decision — inferring a fresh column from it would silently fork
    the data model. A deliberate re-use is legal via the explicit DDL
    (``update_table_schema(add=...)``, r12): there the re-add bumps
    the naming epoch so (epoch, field id) resolution keeps the old
    files' physical values unreachable.

    Names are compared as DOTTED PATHS at every struct depth (r13):
    nested renames exist now, so a batch carrying ``kafka.ts`` after
    that field was renamed to ``kafka.event_ts`` is the same stale-
    writer fork one level down — evolution would otherwise infer a
    fresh nested field under the retired name."""

    def paths(struct: dict, prefix: str = "") -> set[str]:
        out: set[str] = set()
        for f in struct["fields"]:
            p = prefix + f["name"]
            out.add(p)
            t = f["type"]
            # containers descend via their canonical pseudo-segments
            # so list/map element-struct names compare as paths too
            while isinstance(t, dict) and t.get("type") in (
                "list", "map",
            ):
                if t["type"] == "list":
                    t, p = t["element"], p + ".element"
                else:
                    t, p = t["value"], p + ".value"
            if isinstance(t, dict) and t.get("type") == "struct":
                out |= paths(t, p + ".")
        return out

    cur_names = paths(old_schema)
    added = paths(new_schema) - cur_names
    if not added:
        return
    historical = {
        p
        for s in base.get("schemas", [])
        if s["schema-id"] != old_schema.get("schema-id")
        for p in paths(s)
    }
    hit = sorted(added & (historical - cur_names))
    if hit:
        raise ValueError(
            f"batch re-introduces dropped column name(s) {hit}: "
            "this looks like a stale writer built against an old "
            "schema — to deliberately re-use the name, add it "
            "explicitly via update_table_schema(add=...)"
        )
