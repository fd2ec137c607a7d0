"""Hidden-partitioning DataFrame writer — the user-facing write API.

Real Iceberg users write with ``df.writeTo(t).partitionedBy(days(ts),
bucket(8, id))`` and never materialize partition columns themselves
(the spec calls this HIDDEN partitioning). This module is that surface
for the engine's metadata plane: compute every transformed partition
column executor-side (`transforms.transform_column` — JVM expressions
for order-preserving transforms, the vectorized Arrow Murmur3 for
bucket), hive-layout the data files, and commit through
:func:`commit.commit_append` — one call instead of the
transform/write/drop-schema/commit dance every call site previously
hand-rolled.

Reference scope: the reference writes Iceberg tables unpartitioned
(`TableWriterFactory.java:93`, `IcebergTableManager.java:58`); this is
the engine's extension to the production layouts (Iceberg spec
"Partition Specs" / "Partition Transforms"). The file-capture
discipline below is the reference's own atomicity posture
(`KafkaRemoteStorageManager.java:211-220`: upload, then manifest;
orphans are swept separately, never silently adopted).

Scale shape: the write IS the distributed job — `repartition` on the
partition tuple co-locates each cell in one task (``writer_shards``
salts that shuffle so a HOT cell fans out to N parallel tasks), and
``partitionBy`` lays out the hive dirs. The commit's driver-side work
is O(#batch files) footer stats: the batch lands in a private staging
directory whose walk is O(batch), so append cost is INDEPENDENT of how
many files the table already holds — never an O(table) listing. At
100 TB you would additionally cap file sizes via
``max_records_per_file``, which maps straight to Spark's
``maxRecordsPerFile`` option here.

The staging machinery is shared: :func:`stage_data_files` writes and
captures a batch WITHOUT committing it, so multi-manifest atomic
commits (the CDC merge plane in :mod:`merge`, which lands data files
and equality-delete files in ONE snapshot) reuse the exact same
transform/shard/sort/stage/rename discipline as the plain append.
"""

from __future__ import annotations

_UNSET = object()


def _with_parquet_field_ids(df, meta0):
    """Stamp Iceberg FIELD IDS into the parquet schema the write emits:
    each table column's StructField gains ``parquet.field.id`` metadata,
    which Spark's parquet writer (``spark.sql.parquet.fieldId.write.
    enabled``, pinned true around every engine write) turns into real
    parquet field ids — the id-based resolution contract external
    Iceberg readers rely on (the reference's writers do the same via
    `GenericAppenderFactory`, `iceberg/data/TableWriterFactory.java:
    50-95`). Ids come from the table's CURRENT schema; for a first
    write they are the ids table creation is about to assign (same
    depth-first numbering, so file and metadata agree). Columns the
    batch ADDS (evolution-on-write assigns their ids only at commit)
    and hidden transform columns are left unstamped — the next batch
    after the evolution commit carries them. Scope: top-level and
    nested STRUCT field ids (what StructField metadata can express);
    array element / map key-value ids are not expressible through
    Spark's writer — the engine's own reads never need them (see
    schema.py "naming epochs"), and external readers fall back to the
    table's name mapping."""
    from pyspark.sql import types as T

    from tiered_storage_for_apache_kafka_spark.sources.iceberg.schema import (
        spark_schema_to_iceberg,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _current_schema_struct,
    )

    from pyspark.sql import functions as F

    if meta0 is not None:
        struct = _current_schema_struct(meta0)
    else:
        struct, _last = spark_schema_to_iceberg(df.schema)
    by_name = {f["name"]: f for f in struct["fields"]}

    # alias(..., metadata=...) is the one metadata channel Spark's
    # parquet writer actually consumes (DataFrame.to()'s schema
    # metadata is analysis-only — verified: files come out id-less);
    # struct columns are rebuilt field-by-field so NESTED struct ids
    # stamp too. Structs inside arrays/maps would need lambda
    # rebuilds that perturb nullability — left unstamped (docstring).
    def expr(source, fld: T.StructField, ice_field: dict | None):
        if ice_field is None:
            return source.alias(fld.name)
        dt, it = fld.dataType, ice_field["type"]
        if isinstance(dt, T.StructType) and isinstance(it, dict) and (
            it.get("type") == "struct"
        ):
            inner = {f["name"]: f for f in it["fields"]}
            source = F.when(
                source.isNotNull(),
                F.struct(
                    *[
                        expr(source[sf.name], sf, inner.get(sf.name))
                        for sf in dt.fields
                    ]
                ),
            )
        md = dict(fld.metadata or {})
        md["parquet.field.id"] = int(ice_field["id"])
        return source.alias(fld.name, metadata=md)

    if not any(f.name in by_name for f in df.schema.fields):
        return df
    return df.select(
        *[expr(df[f.name], f, by_name.get(f.name)) for f in df.schema.fields]
    )


def _validate_append_shape(meta0, partition_spec, df_columns) -> None:
    """Reject an append whose implied spec shape disagrees with the
    stored default spec BEFORE any file is written, so a rejected
    write is side-effect-free (commit_append re-checks the declared
    form, but by then the files would already be on disk in the wrong
    layout — and it cannot check the partition_spec=None form at all:
    identity-legacy appends carry no declaration)."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _default_spec,
    )

    if meta0 is None:
        return
    stored_shape = [
        (f["name"], f["transform"])
        for f in _default_spec(meta0)["fields"]
    ]
    if partition_spec is not None:
        declared_shape = [(n, t) for n, t, _s in partition_spec]
    elif "partition" in df_columns:
        declared_shape = [("partition", "identity")]
    else:
        declared_shape = []
    if stored_shape != declared_shape:
        raise ValueError(
            f"table is partitioned by {stored_shape!r}; cannot "
            f"append declaring {declared_shape!r} — pass the "
            "table's partition_spec explicitly"
        )


def stage_data_files(
    spark,
    df,
    table_dir: str,
    partition_spec: list | None = None,
    max_records_per_file: int | None = None,
    writer_shards: int | None = None,
    sort_by: list | None = None,
    meta0=_UNSET,
):
    """Transform, shuffle, sort, write, and CAPTURE a batch of data
    files for the table at ``table_dir`` — everything
    :func:`write_iceberg_table` does except the commit. Returns
    ``(new_files, schema)``: the sorted list of final (renamed) file
    paths and the table-facing Spark schema (hidden transform columns
    dropped). The caller owns the commit; until one lands, the files
    are uncommitted orphans that scans ignore and
    ``remove_orphan_files`` sweeps — the same crash posture as the
    plain writer.

    File capture is LISTING-FREE and concurrency-safe: the batch is
    written to a private staging directory (``_stage-<token>/``,
    O(batch) to walk), then each part-file is renamed into its final
    hive dir — the committed file set is exactly the staging walk, so
    append cost never includes an O(table) directory listing and a
    concurrent writer's files (staged under its OWN token) can never
    be swept into this commit. Spark's part-file names are
    attempt-unique, so renames across concurrent writers cannot
    collide either."""
    import os
    import shutil
    import uuid as _uuid

    from tiered_storage_for_apache_kafka_spark.sources.iceberg.transforms import (
        parse_transform,
        transform_column,
    )

    if meta0 is _UNSET:
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (  # noqa: E501
            _current_state_meta,
        )

        try:
            _v, meta0, _t = _current_state_meta(table_dir, None, None)
        except FileNotFoundError:
            meta0 = None
    # parquet field ids for external id-based readers; the engine's own
    # rename resolution rides on the naming epoch in the FILE NAME
    # (schema.py "naming epochs") — immutable through every metadata op
    df = _with_parquet_field_ids(df, meta0)
    naming_epoch = int(
        ((meta0 or {}).get("properties") or {}).get("engine.naming-epoch", 0)
    )

    hidden: list[str] = []
    part_names: list[str] = []
    if partition_spec:
        for name, transform, source in partition_spec:
            tname, _arg = parse_transform(transform)
            part_names.append(name)
            if tname == "identity":
                if name not in df.columns:
                    raise ValueError(
                        f"identity partition field {name!r} must be a "
                        "DataFrame column"
                    )
                continue
            if source is None:
                raise ValueError(
                    f"partition transform {transform!r} on field "
                    f"{name!r} needs a source column"
                )
            df = transform_column(df, source, transform, name)
            hidden.append(name)
    elif "partition" in df.columns:
        part_names = ["partition"]

    if writer_shards is not None and writer_shards > 1:
        from pyspark.sql import functions as F

        # salt the shuffle so one hot partition cell spreads over up to
        # `writer_shards` tasks; the salt is dropped before the write
        # (a projection keeps the repartitioning), so it never reaches
        # the parquet schema or the hive layout. The salt is a per-ROW
        # round-robin counter, never a content hash: hashing the row's
        # columns would send fully duplicate rows (or a hot cell with
        # few distinct rows — the most degenerate skew, exactly when
        # the knob matters) to ONE shard and silently re-funnel the
        # write through a single task
        salt = F.pmod(
            F.monotonically_increasing_id(),
            F.lit(writer_shards),
        )
        df = df.withColumn("__write_salt", salt)
        # EXPLICIT partition count: AQE's coalescer would re-merge the
        # salted splits of a small-looking hot cell back into one task
        # (defeating the knob exactly when skew makes it matter); a
        # user-specified count is exempt from coalescing
        n_parts = writer_shards * int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        shuffled = df.repartition(
            n_parts, *part_names, "__write_salt"
        ).drop("__write_salt")
    elif part_names:
        shuffled = df.repartition(*part_names)
    else:
        shuffled = df

    if sort_by:
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.manifests import (  # noqa: E501
            parse_sort_field,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.transforms import (  # noqa: E501
            sort_field_expr,
        )

        from pyspark.sql import functions as F

        missing = [
            c
            for c in (parse_sort_field(s)[0] for s in sort_by)
            if c not in df.columns
        ]
        if missing:
            raise ValueError(f"sort_by names missing columns {missing}")
        # the PARTITION columns must LEAD the sort keys: partitionBy's
        # FileFormatWriter requires task rows ordered by the partition
        # columns and inserts its own sort when the incoming order
        # doesn't start with them — and Catalyst's EliminateSorts then
        # REMOVES this sort as redundant under that one, silently
        # unsorting the files (caught r10: files came out in input
        # order). Leading with the partition tuple makes the required
        # ordering already-satisfied, so THIS sort is the one that runs.
        shuffled = shuffled.sortWithinPartitions(
            *[F.col(n) for n in part_names],
            *[sort_field_expr(s) for s in sort_by],
        )
    writer = shuffled.write
    if part_names:
        writer = writer.partitionBy(*part_names)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))

    # stage, walk the STAGE (O(batch)), rename into the table — the
    # committed set is known exactly with zero table-directory listing.
    # The write runs under pinned session-portable confs: a vanilla
    # session's INT96 default would strip timestamp footer stats (no
    # manifest bounds → no temporal pruning) and violate the Iceberg
    # parquet spec (int64 micros mandated) — see session.pinned_write_confs
    from tiered_storage_for_apache_kafka_spark.session import (
        pinned_write_confs,
    )

    staging = os.path.join(table_dir, f"_stage-{_uuid.uuid4().hex[:16]}")
    with pinned_write_confs(spark):
        writer.parquet(staging, mode="overwrite")
    new_files: list[str] = []
    for root, _dirs, names in os.walk(staging):
        rel = os.path.relpath(root, staging)
        for n in names:
            if not n.endswith(".parquet"):
                continue  # _SUCCESS markers, checksums
            dest_dir = (
                table_dir if rel == "." else os.path.join(table_dir, rel)
            )
            os.makedirs(dest_dir, exist_ok=True)
            # the write-time NAMING EPOCH travels in the file name —
            # the one per-file fact no manifest rewrite, compaction
            # carry, or snapshot expiry can lose (schema.py)
            dest = os.path.join(
                dest_dir, n[: -len(".parquet")] + f"-e{naming_epoch}.parquet"
            )
            os.replace(os.path.join(root, n), dest)
            new_files.append(dest)
    shutil.rmtree(staging, ignore_errors=True)
    new_files.sort()

    schema = df.drop("__write_salt", *hidden).schema
    return new_files, schema


def write_iceberg_table(
    spark,
    df,
    table_dir: str,
    partition_spec: list | None = None,
    now_ms: int | None = None,
    catalog=None,
    table_name: str | None = None,
    branch: str | None = None,
    max_records_per_file: int | None = None,
    writer_shards: int | None = None,
    sort_by: list | None = None,
    summary_extra: dict | None = None,
    properties_extra: dict | None = None,
    declared_schema=None,
) -> dict:
    """Write ``df`` into the Iceberg table at ``table_dir`` under
    ``partition_spec`` — ``(name, transform, source_col)`` tuples as
    :func:`commit_append` takes (``source_col`` None for identity) —
    creating the table on first write, appending otherwise. Transformed
    partition columns are HIDDEN: computed here, laid out as hive dirs,
    and never part of the table schema; identity fields must already be
    ``df`` columns and stay schema columns. Returns the new table
    metadata.

    An unpartitioned-style write is ``partition_spec=None`` with a
    ``partition`` column in ``df`` (the engine's legacy identity
    default). EVERY append to an existing table — declared spec or
    ``None`` — validates its implied spec shape against the stored
    default spec BEFORE any file is written, so a rejected write is
    side-effect-free: a writer can never silently cross-lay a
    transformed table with ``partition_spec=None`` files whose
    all-null partition tuples the planner would then prune away.

    File capture is LISTING-FREE and concurrency-safe (see
    :func:`stage_data_files`, which owns the staging-dir write +
    rename discipline). A crash between rename and commit leaves
    uncommitted files that only ``remove_orphan_files`` touches (the
    streaming path's crash posture, not a later silent double-commit);
    a crash before the renames leaves only the ``_stage-*`` directory,
    which scans ignore and ``remove_orphan_files`` sweeps.

    ``writer_shards=N`` salts the pre-write shuffle so each partition
    cell fans out to up to N parallel write tasks — the data-path
    mirror of the delete plane's ``writer_shards``: a skewed batch
    (one hot day, say) otherwise funnels through a single task. The
    hot cell then holds up to N files per append (times the
    ``max_records_per_file`` split, which caps file LENGTH while
    shards cap task PARALLELISM — set both for skewed 100 TB loads).

    ``sort_by=[cols]`` writes a SORTED table (Iceberg spec "Sort
    Orders"): rows sort within each write task, the order registers in
    table metadata (id reused when the same column list exists) and
    becomes the table's write order, and each data file's
    ``sort_order_id`` records it. With ``max_records_per_file`` the
    files slice into narrow disjoint value ranges, so column-bounds
    pruning (``plan_scan(column_bounds=...)``) skips whole files — the
    same clustering win sorted compaction
    (``rewrite_data_files(sort_by=...)``) gives existing tables,
    available at write time."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.commit import (
        commit_append,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _current_state_meta,
    )

    try:
        _v, meta0, table_name = _current_state_meta(
            table_dir, catalog, table_name
        )
    except FileNotFoundError:
        meta0 = None
    _validate_append_shape(meta0, partition_spec, df.columns)

    new_files, schema = stage_data_files(
        spark,
        df,
        table_dir,
        partition_spec=partition_spec,
        max_records_per_file=max_records_per_file,
        writer_shards=writer_shards,
        sort_by=sort_by,
        meta0=meta0,
    )
    # declared_schema overrides the metadata-facing Spark schema
    # (e.g. the merge plane's null-corrected nullability — Spark frames
    # are all-nullable, which would relax the table's REQUIRED columns
    # through evolution-on-append); the staged files are unaffected
    return commit_append(
        table_dir,
        declared_schema if declared_schema is not None else schema,
        now_ms=now_ms,
        partition_spec=partition_spec,
        files=new_files,
        # exactly-once by construction: the paths were just created by
        # THIS write (Spark part-file names are attempt-unique), so the
        # O(table) committed-file dedup walk is provably redundant
        assume_new_files=True,
        catalog=catalog,
        table_name=table_name,
        branch=branch,
        sort_by=sort_by,
        summary_extra=summary_extra,
        properties_extra=properties_extra,
    )
