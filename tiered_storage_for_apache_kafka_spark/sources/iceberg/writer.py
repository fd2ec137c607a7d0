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
"Partition Specs" / "Partition Transforms").

Scale shape: the write IS the distributed job — `repartition` on the
partition tuple co-locates each cell in one task, `partitionBy` lays
out the hive dirs, and the commit's driver-side work is O(#files)
footer stats. At 100 TB you would additionally cap file sizes via
``max_records_per_file``, which maps straight to Spark's
``maxRecordsPerFile`` option here.
"""

from __future__ import annotations


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
    default). Appends to an existing table validate the declared spec
    shape against the stored default spec BEFORE any file is written,
    so a rejected write is side-effect-free — a writer can never
    silently cross-lay a table, and never strands cross-laid files for
    a later discovery commit to sweep in.

    The commit names EXACTLY the files this write produced (Spark's
    part-file names are attempt-unique), so append cost stays
    O(batch + manifests) — never the O(table) discovery walk — and a
    crash between write and commit leaves uncommitted files that only
    ``remove_orphan_files`` touches (the streaming path's crash
    posture, not a later silent double-commit)."""
    import os

    from tiered_storage_for_apache_kafka_spark.sources.iceberg.commit import (
        commit_append,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _current_state_meta,
        _default_spec,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.transforms import (
        parse_transform,
        transform_column,
    )

    # validate the declared shape against an existing table BEFORE
    # writing anything (commit_append re-checks, but by then the files
    # would already be on disk in the wrong layout)
    if partition_spec is not None:
        try:
            _v, meta0, table_name = _current_state_meta(
                table_dir, catalog, table_name
            )
        except FileNotFoundError:
            meta0 = None
        if meta0 is not None:
            stored_shape = [
                (f["name"], f["transform"])
                for f in _default_spec(meta0)["fields"]
            ]
            declared_shape = [(n, t) for n, t, _s in partition_spec]
            if stored_shape != declared_shape:
                raise ValueError(
                    f"table is partitioned by {stored_shape!r}; cannot "
                    f"append declaring {declared_shape!r}"
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

    def _data_files() -> set[str]:
        out = set()
        for root, _dirs, names in os.walk(table_dir):
            parts = os.path.relpath(root, table_dir).split(os.sep)
            if "metadata" in parts or "deletes" in parts or any(
                p.startswith("_") for p in parts
            ):
                continue
            out.update(
                os.path.join(root, n)
                for n in names
                if n.endswith(".parquet")
            )
        return out

    before = _data_files() if os.path.isdir(table_dir) else set()
    writer = df.repartition(*part_names).write if part_names else df.write
    if part_names:
        writer = writer.partitionBy(*part_names)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(table_dir, mode="append")
    new_files = sorted(_data_files() - before)

    schema = df.drop(*hidden).schema if hidden else df.schema
    return commit_append(
        table_dir,
        schema,
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
    )
