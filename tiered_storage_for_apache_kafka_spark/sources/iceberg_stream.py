"""Streaming READ of the Iceberg metadata plane: a PySpark (v4) Python
DataSource that turns each committed snapshot into micro-batch input —
the consume side of the exactly-once streaming commits in
`streaming/ingest.py`, and the protocol shape of Iceberg's own Spark
streaming source (`spark.readStream.format("iceberg")`, which plans
appended files per snapshot via the incremental append scan).

Offset model: ``{"seq": last-planned-data-sequence-number}`` — one
monotonic long, because the table's sequence number IS the changelog
position (every commit increments it exactly once). ``latestOffset``
reads only ``metadata.json`` (no manifest I/O); ``partitions`` plans the
appended files for the (start, end] window with the same
sequence-number selection as :func:`plan_incremental_scan`, so
`rewrite_manifests` snapshots contribute nothing and a row-delta delete
inside the window fails the batch explicitly rather than emitting a
wrong append-only changelog.

``maxSnapshotsPerTrigger`` bounds how many commits one micro-batch
admits (the analog of the segment source's ``maxSegmentsPerTrigger``
and Iceberg's own option of the same name); a backfill over a
long-lived table becomes a sequence of bounded batches.

Production note: on a JVM cluster the Iceberg Spark source does this
natively; this Python DataSource proves the protocol against THIS
repo's metadata plane (executor-side pyarrow file reads, Arrow-batch
hand-off — no row-at-a-time Python).

Mid-stream SCHEMA EVOLUTION posture (both sources, r11). The stream's
schema is PINNED at query start (Structured Streaming resolves it once;
``streamReader`` receives and keeps it). The two directions differ:

- **Files OLDER than the stream** (a column was added after they were
  written, or a column was later widened): silent and lossless — absent
  columns pad nulls, narrower int32/float32 pages up-cast to the pinned
  int64/float64, exactly like the batch reader.
- **Files NEWER than the stream** (the table evolved after this query
  started — a column the pinned schema lacks, or a column promoted
  wider than the pinned type): FAIL-EXPLICIT with
  :class:`StreamSchemaEvolvedError`. Forwarding would silently drop the
  new column's data (or truncate the widened one) for the rest of the
  stream's life. The error is operational, not positional: RESTART the
  query — the checkpoint preserves the offset, the restarted stream
  re-resolves the evolved schema, and consumption continues exactly
  where it left off; no re-bootstrap.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class StreamSchemaEvolvedError(RuntimeError):
    """The table's schema evolved PAST this stream's pinned schema (a
    planned file carries a column, or a wider column type, the schema
    resolved at query start cannot represent). The fix is operational,
    not positional: RESTART the streaming query — the checkpoint
    preserves the offset, and the restarted stream re-resolves the
    (now evolved) table schema and continues exactly where it left
    off. No re-bootstrap is needed."""


def _stream_restart_msg(path: str, detail: str) -> str:
    return (
        f"table schema evolved past this stream's pinned schema: "
        f"{detail} (file {path}). Restart the streaming query — the "
        "checkpoint preserves the position and the restarted stream "
        "picks up the evolved schema; no re-bootstrap is needed."
    )


def _guard_stream_schema(path: str, file_col_names, expected) -> None:
    """Mid-stream evolution posture, direction 2 (files NEWER than the
    stream): a column the pinned schema lacks means data this consumer
    would silently drop — fail explicitly toward a restart. Direction 1
    (files OLDER than the stream — a column added after they were
    written) pads nulls in the callers, and a NARROWER file column
    up-casts in :func:`_conform_stream_column`; both are silent because
    no information is lost. ``file_col_names`` are the file's column
    names AFTER any per-epoch rename mapping (schema.py "naming
    epochs") — a pre-rename file's old names resolve by field id
    before this guard sees them."""
    known = {f.name for f in expected}
    extra = [n for n in file_col_names if n not in known]
    if extra:
        raise StreamSchemaEvolvedError(
            _stream_restart_msg(
                path, f"file carries unknown column(s) {extra}"
            )
        )


def _conform_stream_column(col, field, path: str):
    """Conform one Arrow column to the pinned field type: identical
    passes through, a WIDENING (int32->int64, float32->float64 — the
    spec's promotions, lossless) up-casts, anything else (the file is
    WIDER than the pinned schema: the column was promoted after this
    stream started) fails explicitly toward a restart."""
    import pyarrow as pa

    if col.type == field.type:
        return col
    widenings = {
        (pa.int32(), pa.int64()),
        (pa.float32(), pa.float64()),
    }
    if (col.type, field.type) in widenings:
        return col.cast(field.type)
    if (field.type, col.type) in widenings:
        # the file is WIDER: the column was promoted after this stream
        # pinned its schema — a silent down-cast could truncate
        raise StreamSchemaEvolvedError(
            _stream_restart_msg(
                path,
                f"column {field.name!r} is {col.type} in the file but "
                f"{field.type} in the pinned stream schema",
            )
        )
    try:
        # benign representation drift (timestamp tz flavors, etc.)
        return col.cast(field.type)
    except Exception as e:
        raise StreamSchemaEvolvedError(
            _stream_restart_msg(
                path,
                f"column {field.name!r} is {col.type} in the file, "
                f"not castable to the pinned {field.type}: {e}",
            )
        ) from None


def _conform_planned_column(col, field, plan: dict | None, path: str):
    """Conform one Arrow column to the pinned field type under a
    nested rename plan node (r13; see `_nested_conform_plan` for the
    node shapes). Structs rebuild field-by-field (children re-alias by
    the per-level plan, children the file predates null-pad —
    direction 1, lossless — and a child name the pinned schema does
    not know fails explicitly toward a restart — direction 2, the
    nested analog of `_guard_stream_schema`); lists and maps rebuild
    around their conformed element/value child. Parent nulls are
    preserved everywhere (validity masks for structs/lists, null
    offsets for maps — a bare rebuild would manufacture non-null
    containers of nulls)."""
    import pyarrow as pa

    if plan is None:
        return _conform_stream_column(col, field, path)
    kind = plan["kind"]
    if kind == "struct" and pa.types.is_struct(field.type):
        fields_plan = plan["fields"]
        by_new: dict = {}
        for i in range(col.type.num_fields):
            f = col.type.field(i)
            new_name, sub = fields_plan.get(f.name, (f.name, None))
            by_new[new_name] = (col.field(i), f, sub)
        expected_names = {f.name for f in field.type}
        dropped = set(plan.get("dropped") or ())
        extra = sorted(set(by_new) - expected_names)
        unknown = [e for e in extra if e not in dropped]
        if unknown:
            raise StreamSchemaEvolvedError(
                _stream_restart_msg(
                    path,
                    f"struct column {field.name!r} carries unknown "
                    f"nested field(s) {unknown}",
                )
            )
        # DROPPED (or renamed-away) historical children skip
        # losslessly — the current table does not serve them either
        for e in extra:
            by_new.pop(e, None)
        arrays = []
        for ef in field.type:
            if ef.name in by_new:
                child, _cf, sub = by_new[ef.name]
                arrays.append(
                    _conform_planned_column(child, ef, sub, path)
                )
            else:
                arrays.append(pa.nulls(len(col), ef.type))
        return pa.StructArray.from_arrays(
            arrays, fields=list(field.type), mask=col.is_null()
        )
    if kind == "list" and pa.types.is_list(field.type):
        values = _conform_planned_column(
            col.values,
            pa.field("element", field.type.value_type),
            plan["element"],
            path,
        )
        if col.null_count:
            return pa.ListArray.from_arrays(
                col.offsets, values, mask=col.is_null()
            )
        return pa.ListArray.from_arrays(col.offsets, values)
    if kind == "map" and pa.types.is_map(field.type):
        items = _conform_planned_column(
            col.items,
            pa.field("value", field.type.item_type),
            plan["value"],
            path,
        )
        offsets = col.offsets
        if col.null_count:
            # MapArray.from_arrays has no mask parameter; Arrow's
            # null-offsets convention encodes null slots instead
            raw = offsets.to_pylist()
            nulls = col.is_null().to_pylist() + [False]
            offsets = pa.array(
                [
                    None if nulls[i] else raw[i]
                    for i in range(len(raw))
                ],
                offsets.type,
            )
        return pa.MapArray.from_arrays(offsets, col.keys, items)
    # plan/type shape mismatch: the cast-based conform raises the
    # standard restart error with the real types in it
    return _conform_stream_column(col, field, path)


class IcebergFilePartition(InputPartition):
    def __init__(
        self, file_path: str, col_renames: dict | None = None,
        nested_renames: dict | None = None,
        droppable_cols: frozenset | None = None,
    ):
        self.file_path = file_path
        # {file-side column name: pinned/current name} for files of an
        # older NAMING EPOCH (resolved by field id driver-side, see
        # schema.py "naming epochs"); None when names never diverged
        self.col_renames = col_renames
        # {current top-level struct column: nested conform plan} for
        # files whose NESTED struct field names diverged (r13 nested
        # renames) — plan shape per level: {epoch child name:
        # (current child name, subplan | None)}; None when no nested
        # divergence
        self.nested_renames = nested_renames
        # historical top-level names the CURRENT schema no longer has:
        # an old file carrying one skips it losslessly (a DROP must
        # not wedge the stream); truly unknown names still fail
        self.droppable_cols = droppable_cols


def _droppable_top_names(meta: dict) -> frozenset | None:
    """Top-level names some schema version had that the CURRENT one no
    longer does — DROPPED (or renamed-away; those resolve by the epoch
    maps first) columns whose presence in an old file must not wedge
    the stream (r13). None when history never lost a name."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.schema import (  # noqa: E501
        historical_level_names,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (  # noqa: E501
        _current_schema_struct,
    )

    hist = historical_level_names(meta)["__top__"]
    cur = {f["name"] for f in _current_schema_struct(meta)["fields"]}
    gone = hist - cur
    return frozenset(gone) if gone else None


def _nested_conform_plan(
    cur_type, epoch_names: dict, hist: dict | None = None,
    owner=None,
) -> dict | None:
    """Typed conform-plan node mapping a file's epoch-named nested
    fields to the current schema's names by FIELD ID. Node shapes:
    ``{"kind": "struct", "fields": {epoch child name: (current child
    name, subplan | None)}, "dropped": [names]}``, ``{"kind": "list",
    "element": plan}``, ``{"kind": "map", "value": plan}`` (r13: list
    elements and map values rename too). ``dropped`` lists HISTORICAL
    child names of the level (``hist`` —
    `schema.historical_level_names`) no longer in the current schema:
    an old file carrying one is skippable losslessly, where a truly
    unknown child still fails toward a restart. None when the
    subtree's names never diverged and no field is missing from the
    epoch (the common case — the executor then skips the rebuild
    entirely)."""
    if not isinstance(cur_type, dict):
        return None
    kind = cur_type.get("type")
    if kind == "struct":
        fields: dict = {}
        diverged = False
        for f in cur_type["fields"]:
            if f["id"] not in epoch_names:
                # added after the epoch: the file cannot carry it; the
                # executor null-pads it — still a rebuild
                diverged = True
                continue
            en = epoch_names[f["id"]]
            sub = _nested_conform_plan(
                f["type"], epoch_names, hist, f["id"]
            )
            if en != f["name"] or sub is not None:
                diverged = True
            fields[en] = (f["name"], sub)
        if not diverged:
            return None
        cur_names = {f["name"] for f in cur_type["fields"]}
        dropped = sorted(
            ((hist or {}).get(owner) or set()) - cur_names
        )
        return {"kind": "struct", "fields": fields, "dropped": dropped}
    if kind == "list":
        sub = _nested_conform_plan(
            cur_type["element"], epoch_names, hist,
            cur_type.get("element-id"),
        )
        return {"kind": "list", "element": sub} if sub else None
    if kind == "map":
        sub = _nested_conform_plan(
            cur_type["value"], epoch_names, hist,
            cur_type.get("value-id"),
        )
        return {"kind": "map", "value": sub} if sub else None
    return None


def _epoch_rename_resolver(meta: dict):
    """``path -> (flat, nested)`` for tables whose column names
    diverged across RENAME DDLs (schema.py "naming epochs"): ``flat``
    is ``{file top-level name: current name} | None`` and ``nested``
    is ``{current top-level name: conform plan} | None`` (r13 nested
    renames) — each planned file's write-epoch names re-alias by
    FIELD ID to the current schema's names, at every depth, so a
    stream keeps serving pre-rename files instead of failing them as
    unknown columns. Memoized per epoch; returns a constant
    ``(None, None)`` resolver for never-renamed tables (zero
    overhead)."""
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.schema import (
        epoch_id_names,
        file_naming_epoch,
        naming_log,
    )
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (
        _current_schema_struct,
    )

    if not naming_log(meta):
        return lambda path: (None, None)
    from tiered_storage_for_apache_kafka_spark.sources.iceberg.schema import (  # noqa: E501
        historical_level_names,
    )

    cur_fields = _current_schema_struct(meta)["fields"]
    cur = {f["id"]: f["name"] for f in cur_fields}
    hist = historical_level_names(meta)
    memo: dict[int, tuple] = {}

    def resolve(path: str) -> tuple:
        ep = file_naming_epoch(path)
        if ep not in memo:
            en = epoch_id_names(meta, ep)
            m = {
                en[i]: cur[i]
                for i in en
                if i in cur and en[i] != cur[i]
            }
            nested = {}
            for f in cur_fields:
                if f["id"] not in en:
                    continue  # top-level padding is the reader's
                plan = _nested_conform_plan(f["type"], en, hist, f["id"])
                if plan is not None:
                    nested[f["name"]] = plan
            memo[ep] = (m or None, nested or None)
        return memo[ep]

    return resolve


class IcebergIncrementalStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, pinned_schema=None):
        # the schema Spark resolved at QUERY START — all planning and
        # executor reads interpret files under THIS schema for the
        # stream's whole lifetime (mid-stream evolution posture below)
        self._pinned_spark_schema = pinned_schema
        self.table_dir = options.get("path") or options.get("table_dir")
        if not self.table_dir:
            raise ValueError("iceberg_inc requires .option('path', <table dir>)")
        cap = options.get(
            "maxsnapshotspertrigger", options.get("maxSnapshotsPerTrigger")
        )
        self.max_snapshots_per_trigger = int(cap) if cap is not None else None
        start = options.get("startingsequencenumber")
        self._start_seq = int(start) if start is not None else 0
        # partition scope (JSON dict, as plan_incremental_scan's
        # source_predicates: {"col": value} or {"col": [lo, hi]}):
        # per-partition streaming subscription — other partitions'
        # files are pruned at plan time and retractions there don't
        # fail this consumer's batches
        preds = options.get(
            "sourcepredicates", options.get("sourcePredicates")
        )
        if preds:
            import json as _json

            self._source_predicates = {
                k: tuple(v) if isinstance(v, list) else v
                for k, v in _json.loads(preds).items()
            }
        else:
            self._source_predicates = None
        # monotonic guard: latestOffset may fire BEFORE initialOffset in
        # the DSv2 lifecycle, and must never regress a reported offset
        self._reported: int | None = None
        self._committed: int | None = None
        # optional persisted throttle base (same contract as the segment
        # source's throttleStateDir): without it a fresh query's first
        # trigger is unthrottled because no safe base exists yet
        self._state_file = None
        state_dir = options.get(
            "throttlestatedir", options.get("throttleStateDir")
        )
        if state_dir:
            import json as _json
            import os as _os

            self._state_file = _os.path.join(state_dir, "planned-seq.json")
            if _os.path.exists(self._state_file):
                with open(self._state_file) as fh:
                    self._reported = int(_json.load(fh)["seq"])

    def _persist_reported(self) -> None:
        if not self._state_file:
            return
        import json as _json
        import os as _os
        import tempfile as _tempfile

        d = _os.path.dirname(self._state_file)
        _os.makedirs(d, exist_ok=True)
        fd, tmp = _tempfile.mkstemp(dir=d, prefix=".planned-")
        with _os.fdopen(fd, "w") as fh:
            _json.dump({"seq": self._reported}, fh)
        _os.replace(tmp, self._state_file)

    def _meta(self) -> dict:
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            _current_state_meta,
        )

        _v, meta, _t = _current_state_meta(self.table_dir)
        return meta

    def initialOffset(self) -> dict:
        self._committed = max(self._start_seq, self._committed or 0)
        return {"seq": self._start_seq}

    def latestOffset(self) -> dict:
        meta = self._meta()
        cur = max(
            (int(s["sequence-number"]) for s in meta.get("snapshots", [])),
            default=0,
        )
        base = max(
            self._start_seq,
            self._committed or 0,
            self._reported or 0,
        )
        cap = self.max_snapshots_per_trigger
        if cap is not None and self._reported is not None:
            # throttle only once a safe base exists (first trigger of a
            # fresh query has none — same contract as the segment source)
            out = min(cur, base + cap)
        else:
            out = cur
        out = max(out, base)
        self._reported = out
        self._persist_reported()
        return {"seq": out}

    def partitions(self, start: dict, end: dict) -> list[IcebergFilePartition]:
        # the shared sequence-window planner (same one the batch
        # incremental scan uses): plans from the CURRENT snapshot, so a
        # replayed window stays correct even after every snapshot inside
        # it was expired (carried entries keep their sequence numbers),
        # and a delete FILE in the window fails the batch explicitly —
        # checked on the files, not on expirable snapshot summaries
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            _plan_seq_window,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.scan import (
            _resolve_constraints,
        )

        self._committed = max(int(start["seq"]), self._committed or 0)
        lo, hi = int(start["seq"]), int(end["seq"])
        meta = self._meta()
        constraints = (
            _resolve_constraints(
                meta, None, None, None, self._source_predicates
            )
            if self._source_predicates
            else None
        )
        renames = _epoch_rename_resolver(meta)
        droppable = _droppable_top_names(meta)
        out = [
            IcebergFilePartition(
                d["file_path"], *renames(d["file_path"]),
                droppable_cols=droppable,
            )
            for d in _plan_seq_window(meta, lo, hi, constraints)
        ]
        if not out:
            out.append(IcebergFilePartition(""))  # empty-batch sentinel
        return out

    def _expected_arrow_schema(self):
        """Arrow schema of the stream's PINNED Spark schema (resolved
        once at query start; falls back to the table's current schema
        for direct construction in tests). Old files missing a column
        pad nulls below; a file carrying a column/width the pinned
        schema cannot represent fails explicitly (see :func:`read`)."""
        if getattr(self, "_arrow_schema", None) is None:
            from pyspark.sql.pandas.types import to_arrow_schema

            if self._pinned_spark_schema is not None:
                from pyspark.sql.types import StructType

                fields = [
                    f
                    for f in self._pinned_spark_schema.fields
                    if f.name not in ("_change_type", "_commit_seq")
                ]
                self._arrow_schema = to_arrow_schema(StructType(fields))
            else:
                from tiered_storage_for_apache_kafka_spark.sources.iceberg import (  # noqa: E501
                    _current_schema_struct,
                    iceberg_schema_to_spark,
                )

                self._arrow_schema = to_arrow_schema(
                    iceberg_schema_to_spark(
                        _current_schema_struct(self._meta())
                    )
                )
        return self._arrow_schema

    def read(self, partition: IcebergFilePartition):
        if not partition.file_path:
            return
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        # hive-partitioned files carry the partition VALUE in the path,
        # not in the file (same reason the batch readers pass basePath);
        # reattach it, and pad columns the file predates (add-as-optional
        # schema evolution) with nulls, in declared-schema order
        part_val = None
        for seg in partition.file_path.split(os.sep):
            if seg.startswith("partition="):
                part_val = int(seg.split("=", 1)[1])
        expected = self._expected_arrow_schema()
        ren = getattr(partition, "col_renames", None) or {}
        nplans = getattr(partition, "nested_renames", None) or {}
        for batch in pq.ParquetFile(partition.file_path).iter_batches():
            cols, names = [], []
            # pre-rename files' columns re-alias by field id (the
            # per-epoch mapping planned driver-side) BEFORE the
            # unknown-column guard, so a RENAME never fails old files
            by_name = {
                ren.get(n, n): batch.column(i)
                for i, n in enumerate(batch.schema.names)
            }
            # DROPPED historical columns skip losslessly (the current
            # table does not serve them either); unknown names still
            # guard toward a restart
            droppable = getattr(partition, "droppable_cols", None)
            if droppable:
                known_names = {f.name for f in expected}
                by_name = {
                    n: c
                    for n, c in by_name.items()
                    if n in known_names or n not in droppable
                }
            _guard_stream_schema(
                partition.file_path, list(by_name), expected
            )
            for field in expected:
                names.append(field.name)
                if field.name == "partition":
                    cols.append(
                        pa.array([part_val] * batch.num_rows, field.type)
                    )
                elif field.name in by_name:
                    # nested names diverged for this file's epoch →
                    # rebuild by the typed plan; no plan → plain conform
                    cols.append(
                        _conform_planned_column(
                            by_name[field.name], field,
                            nplans.get(field.name), partition.file_path,
                        )
                    )
                else:
                    cols.append(pa.nulls(batch.num_rows, field.type))
            out = pa.RecordBatch.from_arrays(cols, names=names)
            if self._source_predicates:
                # row residuals: partition scoping is metadata-grain,
                # so rows of a matching partition still need the exact
                # source filter (bucket lookups, unaligned ranges)
                import pyarrow.compute as pc

                tbl = pa.Table.from_batches([out])
                for col, pred in self._source_predicates.items():
                    if isinstance(pred, tuple):
                        tbl = tbl.filter(
                            pc.and_(
                                pc.greater_equal(tbl[col], pred[0]),
                                pc.less_equal(tbl[col], pred[1]),
                            )
                        )
                    else:
                        tbl = tbl.filter(pc.equal(tbl[col], pred))
                for b in tbl.to_batches():
                    if b.num_rows:
                        yield b
                continue
            yield out

    def commit(self, end: dict) -> None:
        self._committed = max(int(end["seq"]), self._committed or 0)


class IcebergIncrementalDataSource(DataSource):
    """`spark.readStream.format("iceberg_inc").option("path", table_dir)`"""

    @classmethod
    def name(cls) -> str:
        return "iceberg_inc"

    def schema(self):
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            _current_state_meta,
            iceberg_schema_to_spark,
        )

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            _current_schema_struct,
        )

        _v, meta, _t = _current_state_meta(
            self.options.get("path") or self.options.get("table_dir")
        )
        return iceberg_schema_to_spark(_current_schema_struct(meta))

    def streamReader(self, schema) -> IcebergIncrementalStreamReader:
        return IcebergIncrementalStreamReader(self.options, pinned_schema=schema)


def register(spark) -> None:
    spark.dataSource.register(IcebergIncrementalDataSource)


class CdcFilePartition(InputPartition):
    def __init__(
        self, file_path: str, kind: str = "data", seq: int = 0,
        col_renames: dict | None = None,
        renames_by_epoch: dict | None = None,
        nested_renames: dict | None = None,
        dv_plan: dict | None = None,
        droppable_cols: frozenset | None = None,
    ):
        self.file_path = file_path
        self.kind = kind  # "data" | "eqdelete" | "posdelete" | "dv"
        self.seq = seq
        self.col_renames = col_renames  # data files: per-epoch mapping
        self.nested_renames = nested_renames  # data files: nested plan
        self.droppable_cols = droppable_cols  # dropped historical names
        # dv partitions: {referenced_data_file, delta_offset,
        # delta_size} — the fresh-bitmap locator dv_keyed_plan chose
        self.dv_plan = dv_plan
        # posdelete partitions: {epoch: {file name: current name}} for
        # resolving TARGET files' key columns executor-side (targets
        # are discovered from the delete file's rows, so the mapping
        # for every epoch travels with the partition)
        self.renames_by_epoch = renames_by_epoch


class IcebergCdcStreamReader(IcebergIncrementalStreamReader):
    """Keyed-changelog (upsert-stream) reader — the CDC-OUT half of the
    merge plane: each micro-batch window emits

    - ``_change_type="delete_key"`` rows from the window's
      EQUALITY-DELETE files (only the key columns populated; the other
      columns are null), and
    - ``_change_type="insert"`` rows from the window's appended data
      files,

    each stamped with ``_commit_seq`` (the committing snapshot's
    sequence number). Replay contract (Flink upsert-stream semantics):
    apply events in ``_commit_seq`` order, deletes BEFORE inserts at
    equal seq — then a mirror of the table is exactly
    last-insert-per-key where no later-or-equal delete follows. A
    POSITIONAL delete (position delete file / DV) in a window fails
    the batch explicitly: positions are not key-representable; that
    consumer needs the batch `read_iceberg_changelog` instead.

    Scale shape: windows plan from metadata only; every partition is
    ONE parquet file read executor-side (data or delete keys) — no
    joins, no driver row handling, same cost model as the append
    stream."""

    def __init__(self, options: dict, pinned_schema=None):
        super().__init__(options, pinned_schema=pinned_schema)
        # declared merge keys (r12): with them, a POSITION-delete file
        # in a window resolves to keyed retractions (the reader looks
        # up the deleted identities' pre-image key columns), so a
        # mirror survives `update_where` on the source; without them
        # the positional refusal stands (positions alone are not
        # key-representable)
        keys = options.get("mergekeys", options.get("mergeKeys"))
        if not keys:
            # default from the table's recorded row identity (the
            # first keyed merge stamps `engine.merge-keys`), so a
            # consumer of a merge-born table crosses UPDATE windows
            # without per-query configuration; an explicit option
            # always wins
            keys = (self._meta().get("properties") or {}).get(
                "engine.merge-keys"
            )
        self._merge_keys = (
            [k.strip() for k in str(keys).split(",") if k.strip()]
            if keys
            else None
        )

    def _expected_arrow_schema(self):
        """The parent's schema with every field NULLABLE: a delete_key
        row nulls out all non-key columns, including ones the table
        schema declares required — the stream's contract is
        per-CHANGE-ROW nullability, not the table's."""
        if getattr(self, "_arrow_schema", None) is None:
            import pyarrow as pa

            base = super()._expected_arrow_schema()
            self._arrow_schema = pa.schema(
                [f.with_nullable(True) for f in base]
            )
        return self._arrow_schema

    def partitions(self, start: dict, end: dict) -> list[CdcFilePartition]:
        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            _plan_seq_window,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.scan import (
            _resolve_constraints,
        )

        self._committed = max(int(start["seq"]), self._committed or 0)
        lo, hi = int(start["seq"]), int(end["seq"])
        meta = self._meta()
        constraints = (
            _resolve_constraints(
                meta, None, None, None, self._source_predicates
            )
            if self._source_predicates
            else None
        )
        eq_files: list[dict] = []
        pos_files: list[dict] = []
        dv_files: list[dict] = []
        data = _plan_seq_window(
            meta, lo, hi, constraints, eq_sink=eq_files,
            pos_sink=pos_files if self._merge_keys else None,
            dv_sink=dv_files if self._merge_keys else None,
        )
        if dv_files:
            from tiered_storage_for_apache_kafka_spark.sources.iceberg.incremental import (  # noqa: E501
                dv_keyed_plan,
            )

            # per-entry FRESH-bitmap locators (delta blob or whole
            # first-DV blob); raises the re-bootstrap refusal for
            # pre-delta superseding DVs — plan time, not mid-read
            dv_files = dv_keyed_plan(meta, dv_files)
        renames = _epoch_rename_resolver(meta)
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.schema import (  # noqa: E501
            epoch_id_names,
            naming_log,
        )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.state import (  # noqa: E501
            _current_schema_struct,
        )

        renames_by_epoch = None
        if (pos_files or dv_files) and naming_log(meta):
            cur = {
                f["id"]: f["name"]
                for f in _current_schema_struct(meta)["fields"]
            }
            max_epoch = max(e for e, _s in naming_log(meta))
            renames_by_epoch = {}
            for ep in range(max_epoch + 1):
                en = epoch_id_names(meta, ep)
                renames_by_epoch[ep] = {
                    en[i]: cur[i]
                    for i in en
                    if i in cur and en[i] != cur[i]
                }
        droppable = _droppable_top_names(meta)
        out = [
            CdcFilePartition(
                d["file_path"], "data", int(d["_seq"]),
                col_renames=renames(d["file_path"])[0],
                nested_renames=renames(d["file_path"])[1],
                droppable_cols=droppable,
            )
            for d in data
        ] + [
            CdcFilePartition(d["file_path"], "eqdelete", int(d["_seq"]))
            for d in eq_files
        ] + [
            CdcFilePartition(
                d["file_path"], "posdelete", int(d["_seq"]),
                renames_by_epoch=renames_by_epoch,
            )
            for d in pos_files
        ] + [
            CdcFilePartition(
                d["file_path"], "dv", int(d["_seq"]),
                renames_by_epoch=renames_by_epoch,
                dv_plan={
                    "referenced_data_file": d["referenced_data_file"],
                    "delta_offset": d["delta_offset"],
                    "delta_size": d["delta_size"],
                },
            )
            for d in dv_files
        ]
        if not out:
            out.append(CdcFilePartition(""))  # empty-batch sentinel
        return out

    def read(self, partition: CdcFilePartition):
        if not partition.file_path:
            return
        import pyarrow as pa

        kind = getattr(partition, "kind", "data")
        seq = getattr(partition, "seq", 0)
        change = "insert" if kind == "data" else "delete_key"

        def stamp(batch):
            n = batch.num_rows
            return pa.RecordBatch.from_arrays(
                list(batch.columns)
                + [
                    pa.array([change] * n, pa.string()),
                    pa.array([seq] * n, pa.int64()),
                ],
                names=list(batch.schema.names)
                + ["_change_type", "_commit_seq"],
            )

        if kind == "data":
            # table-shaped read (hive value attach, evolution padding,
            # row residuals) is the parent's; stamp the change columns
            for batch in super().read(partition):
                yield stamp(batch)
            return

        if kind == "posdelete":
            for batch in self._read_posdelete_keys(partition):
                yield stamp(batch)
            return

        if kind == "dv":
            for batch in self._read_dv_keys(partition):
                yield stamp(batch)
            return

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        expected = self._expected_arrow_schema()
        for batch in pq.ParquetFile(partition.file_path).iter_batches():
            # eq-delete files carry ONLY key columns, and renaming a
            # live equality-delete key is refused at DDL time — their
            # names are always current, no epoch mapping needed
            by_name = {
                n: batch.column(i) for i, n in enumerate(batch.schema.names)
            }
            _guard_stream_schema(
                partition.file_path, batch.schema.names, expected
            )
            cols, names = [], []
            for field in expected:
                names.append(field.name)
                if field.name in by_name:
                    cols.append(
                        _conform_stream_column(
                            by_name[field.name], field, partition.file_path
                        )
                    )
                else:
                    # non-key columns of a delete-key row are null
                    cols.append(pa.nulls(batch.num_rows, field.type))
            out = pa.RecordBatch.from_arrays(cols, names=names)
            if self._source_predicates:
                # residuals apply only on columns the delete file
                # carries (its key columns); a predicate on a non-key
                # column cannot be evaluated against nulls and the
                # delete-key row is KEPT — an extra retraction of an
                # out-of-scope key is a harmless no-op downstream,
                # where dropping an in-scope one would corrupt
                tbl = pa.Table.from_batches([out])
                for col, pred in self._source_predicates.items():
                    if col not in by_name:
                        continue
                    if isinstance(pred, tuple):
                        tbl = tbl.filter(
                            pc.and_(
                                pc.greater_equal(tbl[col], pred[0]),
                                pc.less_equal(tbl[col], pred[1]),
                            )
                        )
                    else:
                        tbl = tbl.filter(pc.equal(tbl[col], pred))
                for b in tbl.to_batches():
                    if b.num_rows:
                        yield stamp(b)
                continue
            yield stamp(out)


    def _read_posdelete_keys(self, partition):
        """Resolve one position-delete file to keyed retractions: read
        its (file_path, pos) rows, and for each TARGET data file read
        only the declared merge-key columns and gather the deleted
        positions — the pre-image keys of exactly the retracted rows.
        Emitted as delete_key rows (key columns populated, the rest
        null). Bounded executor-side work: key columns of the targeted
        files only, no joins, no driver row handling — the same cost
        model as the rest of the source. Soundness: an engine position
        delete targets only rows live in the merged view at commit
        time, so each (key) retraction corresponds to a real prior
        insert; a duplicate retraction from a foreign writer's
        overlapping delete would be a harmless upsert no-op."""
        import pyarrow.parquet as pq

        dels = pq.read_table(
            partition.file_path, columns=["file_path", "pos"]
        )
        by_target: dict[str, list[int]] = {}
        for fp, pos in zip(
            dels.column("file_path").to_pylist(),
            dels.column("pos").to_pylist(),
        ):
            by_target.setdefault(fp, []).append(int(pos))
        yield from self._keyed_retraction_batches(
            by_target, getattr(partition, "renames_by_epoch", None) or {}
        )

    def _read_dv_keys(self, partition):
        """Resolve one window DELETION VECTOR to keyed retractions
        (r13): seek-read the planner-chosen FRESH-only bitmap (the
        engine delta blob for a superseding DV, the spec blob for a
        first DV — `incremental.dv_keyed_plan`), decode its positions
        executor-side, and read the referenced data file's merge-key
        columns at exactly those positions — the same pre-image
        machinery as parquet position deletes, with a bitmap decode
        replacing the delete-file scan. Bounded executor work: one
        blob + key columns of one target file."""
        import numpy as np

        from tiered_storage_for_apache_kafka_spark.roaring import (
            deserialize_roaring64,
        )
        from tiered_storage_for_apache_kafka_spark.sources.deletion_vectors import (  # noqa: E501
            unframe_dv_payload,
        )

        plan = partition.dv_plan
        with open(partition.file_path, "rb") as f:
            f.seek(int(plan["delta_offset"]))
            payload = f.read(int(plan["delta_size"]))
        positions = deserialize_roaring64(
            unframe_dv_payload(payload)
        ).astype(np.int64)
        by_target = {
            plan["referenced_data_file"]: [int(p) for p in positions]
        }
        yield from self._keyed_retraction_batches(
            by_target, getattr(partition, "renames_by_epoch", None) or {}
        )

    def _keyed_retraction_batches(self, by_target: dict, by_epoch: dict):
        """Shared pre-image key read: for each (target data file,
        deleted positions), read ONLY the declared merge-key columns
        and gather the deleted positions — the keys of exactly the
        retracted rows, emitted as delete_key batches (key columns
        populated, the rest null)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        expected = self._expected_arrow_schema()
        keys = list(self._merge_keys or [])
        unknown = [k for k in keys if k not in expected.names]
        if unknown:
            raise ValueError(
                f"mergeKeys name(s) {unknown} not in the stream schema "
                f"(columns: {expected.names})"
            )
        from tiered_storage_for_apache_kafka_spark.sources.iceberg.schema import (  # noqa: E501
            file_naming_epoch,
        )

        for target, positions in sorted(by_target.items()):
            pf = pq.ParquetFile(target)
            file_cols = set(pf.schema_arrow.names)
            # a renamed table's older target files carry the keys
            # under their write-epoch names — resolve by field id via
            # the per-epoch mapping the planner attached
            ren = by_epoch.get(file_naming_epoch(target), {})
            inv = {cur: old for old, cur in ren.items()}
            file_keys = {k: inv.get(k, k) for k in keys}
            missing = [
                k for k, fk in file_keys.items() if fk not in file_cols
            ]
            if missing:
                raise StreamSchemaEvolvedError(
                    _stream_restart_msg(
                        target,
                        f"merge key column(s) {missing} absent from the "
                        "position-deleted target file (written before "
                        "the key column existed)",
                    )
                )
            tbl = pf.read(columns=sorted(set(file_keys.values()))).take(
                sorted(positions)
            )
            cols, names = [], []
            for field in expected:
                names.append(field.name)
                if field.name in keys:
                    cols.append(
                        _conform_stream_column(
                            tbl.column(
                                file_keys[field.name]
                            ).combine_chunks(),
                            field,
                            target,
                        )
                    )
                else:
                    cols.append(pa.nulls(tbl.num_rows, field.type))
            out = pa.Table.from_arrays(cols, names=names)
            for b in out.to_batches():
                if b.num_rows:
                    yield b


class IcebergCdcDataSource(DataSource):
    """`spark.readStream.format("iceberg_cdc").option("path", table_dir)`
    — table columns + ``_change_type`` (insert | delete_key) +
    ``_commit_seq``."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_cdc"

    def schema(self):
        from pyspark.sql.types import LongType, StringType, StructField

        from tiered_storage_for_apache_kafka_spark.sources.iceberg import (
            _current_schema_struct,
            _current_state_meta,
            iceberg_schema_to_spark,
        )

        from pyspark.sql.types import StructType

        _v, meta, _t = _current_state_meta(
            self.options.get("path") or self.options.get("table_dir")
        )
        base = iceberg_schema_to_spark(_current_schema_struct(meta))
        # every column nullable: delete_key rows null out non-key
        # columns even where the TABLE schema says required
        out = StructType(
            [StructField(f.name, f.dataType, True) for f in base.fields]
        )
        return out.add(StructField("_change_type", StringType())).add(
            StructField("_commit_seq", LongType())
        )

    def streamReader(self, schema) -> IcebergCdcStreamReader:
        return IcebergCdcStreamReader(self.options, pinned_schema=schema)


def register_cdc(spark) -> None:
    spark.dataSource.register(IcebergCdcDataSource)
