"""Schema evolution for the table engine — the reference's intended
(not-yet-wired) widening rules, actually wired.

The reference ships the machinery in `SchemaUpdate.java:17-127` +
`SchemaUtils.java` (type-promotion table at `SchemaUtils.java:80-84`):
add columns as optional, widen int→long and float→double, make required
fields optional — but freezes the first record's schema in practice
(whitepaper §"Current limitations"). SURVEY.md §7.4(6) calls this out as
a hard part our engine should close: here the same rules run as a pure
StructType merge, gating every table append (registry-compatibility
style), with Spark's `mergeSchema` reader handling the physical
add-column case.

Rules implemented (exactly the reference's promotion table):

- a field present only in the NEW schema is added as **optional**
  (nullable) — `SchemaUpdate.java` "add columns as optional";
- a field present only in the OLD schema is kept (new writes leave it
  null — the reader's union view);
- same-name fields must agree in type, up to the promotions
  **int→long** and **float→double** (`SchemaUtils.java:80-84`): the
  merged field takes the wider type regardless of which side is wider,
  so old data re-reads with an up-cast, never a narrowing;
- nullability only ever loosens (required → optional), never tightens;
- structs recurse field-wise; arrays recurse on the element type; any
  other mismatch raises `SchemaEvolutionError` (the incompatible case
  the registry would reject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StructField,
    StructType,
)


class SchemaEvolutionError(ValueError):
    """Incompatible schema change (would require narrowing or a type
    rewrite the promotion table does not allow)."""


def _merge_types(old: DataType, new: DataType, path: str) -> DataType:
    if old == new:
        return old
    pair = (type(old), type(new))
    # the reference's promotion table: int→long, float→double — applied
    # symmetrically so the merged type is always the wider one
    if pair in ((IntegerType, LongType), (LongType, IntegerType)):
        return LongType()
    if pair in ((FloatType, DoubleType), (DoubleType, FloatType)):
        return DoubleType()
    if isinstance(old, StructType) and isinstance(new, StructType):
        return merge_schemas(old, new, _path=path)
    if isinstance(old, ArrayType) and isinstance(new, ArrayType):
        elem = _merge_types(old.elementType, new.elementType, f"{path}[]")
        return ArrayType(elem, old.containsNull or new.containsNull)
    raise SchemaEvolutionError(
        f"incompatible type change at {path!r}: "
        f"{old.simpleString()} -> {new.simpleString()}"
    )


def merge_schemas(old: StructType, new: StructType, _path: str = "") -> StructType:
    """Merge a table's current schema with an incoming batch's schema
    under the evolution rules; raises SchemaEvolutionError when the
    change is not expressible as widening/add-optional."""
    new_by_name = {f.name: f for f in new.fields}
    out: list[StructField] = []
    for f in old.fields:
        n = new_by_name.pop(f.name, None)
        if n is None:
            # removed on the write side: keep, readable as null for new rows
            out.append(StructField(f.name, f.dataType, True))
        else:
            merged = _merge_types(f.dataType, n.dataType, f"{_path}.{f.name}".lstrip("."))
            out.append(StructField(f.name, merged, f.nullable or n.nullable))
    for f in new_by_name.values():  # brand-new fields arrive optional
        out.append(StructField(f.name, f.dataType, True))
    return StructType(out)


def _conform_expr(src, src_t, target_t):
    """A column expression conforming ``src`` (typed ``src_t``) to
    ``target_t`` BY NAME at every struct depth. Spark's ``cast``
    between struct types matches fields POSITIONALLY — a batch whose
    struct children arrive in a different order than the table's
    (legal: parquet and the engine's readers resolve nested fields by
    name) would silently swap values under a bare cast (found by the
    r13 nested-DDL fuzz). Structs rebuild field-by-field instead:
    matching children recurse, children the batch lacks null-pad, and
    a NULL struct stays NULL. Identical types pass through untouched
    (the common case — no rebuild, no cast)."""
    if src_t == target_t:
        return src
    if isinstance(target_t, StructType) and isinstance(src_t, StructType):
        have = {f.name: f for f in src_t.fields}
        children = []
        for f in target_t.fields:
            if f.name in have:
                children.append(
                    _conform_expr(
                        src[f.name], have[f.name].dataType, f.dataType
                    ).alias(f.name)
                )
            else:
                children.append(
                    F.lit(None).cast(f.dataType).alias(f.name)
                )
        return F.when(src.isNotNull(), F.struct(*children)).otherwise(
            F.lit(None).cast(target_t)
        )
    if isinstance(target_t, ArrayType) and isinstance(src_t, ArrayType):
        # element structs align by name through a lambda (a bare cast
        # would be positional inside the container too); null arrays
        # pass through transform as null
        return F.transform(
            src,
            lambda x: _conform_expr(
                x, src_t.elementType, target_t.elementType
            ),
        )
    if isinstance(target_t, MapType) and isinstance(src_t, MapType):
        return F.transform_values(
            src,
            lambda _k, v: _conform_expr(
                v, src_t.valueType, target_t.valueType
            ),
        )
    return src.cast(target_t)


def conform(df: DataFrame, target: StructType) -> DataFrame:
    """Cast/extend a batch to the merged schema: missing columns become
    typed nulls, widened columns up-cast, struct children align BY
    NAME (see :func:`_conform_expr`) — a pure projection, no data
    rewrite (old files stay as written; the reader view unifies)."""
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            cols.append(
                _conform_expr(
                    F.col(f.name), have[f.name].dataType, f.dataType
                ).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def _schema_log_path(table_dir: str) -> str:
    import os

    # underscore prefix: invisible to Spark's parquet file listing
    return os.path.join(table_dir, "_schema.json")


def table_schema(table_dir: str) -> StructType | None:
    """The table's committed schema from the sidecar log (the minimal
    Delta/Iceberg-style metadata plane: schema lives in the log, never
    inferred from data files)."""
    import json
    import os

    p = _schema_log_path(table_dir)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return StructType.fromJson(json.load(fh))


def evolve_and_append(envelope: DataFrame, table_dir: str) -> StructType:
    """Gated append: merge the incoming batch's schema with the table's
    committed schema (if any), conform the batch, append, and commit the
    merged schema to the sidecar log. Returns the post-commit schema.

    Parquet's own ``mergeSchema`` cannot merge widened primitives
    (int32 vs int64 files fail), so the log is authoritative and readers
    go through `read_evolved`, which hands the merged schema to the scan
    — the parquet reader up-casts old int32/float32 pages in place."""
    import json
    import os

    current = table_schema(table_dir)
    merged = (
        merge_schemas(current, envelope.schema)
        if current is not None
        else envelope.schema
    )
    from tiered_storage_for_apache_kafka_spark.session import (
        pinned_write_confs,
    )

    with pinned_write_confs(envelope.sparkSession):
        conform(envelope, merged).write.mode("append").parquet(table_dir)
    with open(_schema_log_path(table_dir), "w") as fh:
        json.dump(merged.jsonValue(), fh)
    return merged


def read_evolved(spark, table_dir: str) -> DataFrame:
    """Scan the table under its committed schema: files written before a
    widening or column-add resolve via reader up-cast / null fill."""
    schema = table_schema(table_dir)
    if schema is None:
        raise FileNotFoundError(f"no schema log at {table_dir}")
    return spark.read.schema(schema).parquet(table_dir)
