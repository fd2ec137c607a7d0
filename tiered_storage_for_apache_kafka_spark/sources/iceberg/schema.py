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
