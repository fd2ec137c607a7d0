"""Segments-as-table as a first-class PySpark (v4) Python DataSource.

`spark.read.format("tiered_segments")` exposes tiered log segments as a
real Spark source (SURVEY.md §4/§7.3's optional V2-source piece):

- **Planning (driver)**: `partitions()` lists `.log` object keys under
  the topic prefix — a pure metadata operation; the object-key scheme
  (`ObjectKeyFactory`, zero-padded start offsets; reference
  `ObjectKeyFactory.java:117-144`) makes lexicographic order = offset
  order, so consecutive keys bound each segment's offset window and
  offset-range pruning needs **no manifest fetches at all**. One Spark
  input partition per surviving segment.
- **Filter pushdown**: `pushFilters()` receives Catalyst predicates;
  `offset >=/<=/=` and `partition =` tighten the prune window exactly
  like the reference's range→chunk planning (R2) at segment granularity.
  All filters are also returned as residuals so Spark re-applies them
  row-level (prune I/O, keep semantics — the same contract as parquet
  partition pruning).
- **Execution (executors)**: each task fetches its one segment through
  the byte engine (ranged GETs, detransform, cache) and yields record
  rows. The driver never touches segment bytes.

At 100 TB: planning is O(#segments) key names on the driver; tasks are
independent per segment, so a 1000-executor cluster fans out naturally.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

SCHEMA = (
    "partition INT, segment_uuid STRING, batch_base_offset BIGINT, "
    "batch_byte_offset BIGINT, offset BIGINT, timestamp_us BIGINT, "
    "key BINARY, value BINARY"
)


class SegmentPartition(InputPartition):
    def __init__(
        self,
        partition: int,
        start_offset: int,
        segment_uuid: str,
        end_offset: int = -1,
    ):
        self.partition = partition
        self.start_offset = start_offset
        self.segment_uuid = segment_uuid
        # inclusive end bound derived from the NEXT key's start at plan
        # time (-1 = unknown, open end): lets the window planner detect
        # interior segments so fully-covered segments skip the index GET.
        # next_start-1 can overstate a gapped segment's true end, which
        # only errs toward an unnecessary (never incorrect) index read.
        self.end_offset = end_offset


def _build_manager(opts: dict):
    from tiered_storage_for_apache_kafka_spark.api import TieredStorageManager
    from tiered_storage_for_apache_kafka_spark.storage.filesystem import (
        FileSystemStorage,
    )
    from tiered_storage_for_apache_kafka_spark.transform.encryption import RsaKeyring

    keyring = None
    if opts.get("kek_pem_b64"):
        import base64

        from cryptography.hazmat.primitives import serialization

        pem = base64.b64decode(opts["kek_pem_b64"])
        key = serialization.load_pem_private_key(pem, password=None)
        keyring = RsaKeyring(opts["kek_id"], {opts["kek_id"]: key})
    from tiered_storage_for_apache_kafka_spark.transform.compression import (
        DEFAULT_CODEC,
    )

    return TieredStorageManager(
        FileSystemStorage(opts["root"]),
        chunk_size=int(opts.get("chunk_size", "4096")),
        compression_enabled=opts.get("compression", "true") == "true",
        encryption_keyring=keyring,
        codec=opts.get("codec", DEFAULT_CODEC),
    )


class TieredSegmentsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.opts = dict(options)
        self.topic = self.opts.get("topic", "events")
        self.topic_id = self.opts.get("topic_id", "events-tid")
        self.min_offset: int | None = (
            int(self.opts["min_offset"]) if "min_offset" in self.opts else None
        )
        self.max_offset: int | None = (
            int(self.opts["max_offset"]) if "max_offset" in self.opts else None
        )
        self.partition_eq: int | None = None

    # -- pushdown --------------------------------------------------------------

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Tighten segment pruning from Catalyst predicates; every filter
        is also handed back as a residual for row-level re-application."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr else None
            if col == "offset":
                if isinstance(f, GreaterThanOrEqual):
                    self._tighten_min(f.value)
                elif isinstance(f, GreaterThan):
                    self._tighten_min(f.value + 1)
                elif isinstance(f, LessThanOrEqual):
                    self._tighten_max(f.value)
                elif isinstance(f, LessThan):
                    self._tighten_max(f.value - 1)
                elif isinstance(f, EqualTo):
                    self._tighten_min(f.value)
                    self._tighten_max(f.value)
            elif col == "partition" and isinstance(f, EqualTo):
                self.partition_eq = int(f.value)
        return iter(filters)  # residuals: Spark re-applies row-level

    def _tighten_min(self, v) -> None:
        v = int(v)
        self.min_offset = v if self.min_offset is None else max(self.min_offset, v)

    def _tighten_max(self, v) -> None:
        v = int(v)
        self.max_offset = v if self.max_offset is None else min(self.max_offset, v)

    # -- planning --------------------------------------------------------------

    def partitions(self) -> list[SegmentPartition]:
        backend_mgr = _build_manager(self.opts)
        prefix = f"{self.topic}-{self.topic_id}/"
        keys = [
            k
            for k in backend_mgr.backend.list_keys(prefix)
            if k.endswith(".log")
        ]
        # key layout: {topic}-{tid}/{partition}/{start:020d}-{uuid}.log —
        # zero-padding makes the sort below numeric per partition
        by_partition: dict[int, list[tuple[int, str]]] = {}
        for k in sorted(keys):
            rel = k[len(prefix):]
            part_s, fname = rel.split("/", 1)
            start_s, rest = fname.split("-", 1)
            uuid = rest.rsplit(".", 1)[0]
            by_partition.setdefault(int(part_s), []).append((int(start_s), uuid))

        out: list[SegmentPartition] = []
        for part, segs in sorted(by_partition.items()):
            if self.partition_eq is not None and part != self.partition_eq:
                continue
            for i, (start, uuid) in enumerate(segs):
                next_start = segs[i + 1][0] if i + 1 < len(segs) else None
                if self.max_offset is not None and start > self.max_offset:
                    continue
                if (
                    self.min_offset is not None
                    and next_start is not None
                    and next_start <= self.min_offset
                ):
                    continue
                end = next_start - 1 if next_start is not None else -1
                out.append(SegmentPartition(part, start, uuid, end))
        return out

    # -- execution -------------------------------------------------------------

    def read(self, partition: SegmentPartition):
        import pyarrow as pa

        from tiered_storage_for_apache_kafka_spark.api import SegmentMetadata
        from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
            fetch_segment_window,
        )
        from tiered_storage_for_apache_kafka_spark.wire import (
            decode_segment_columns,
        )

        mgr = _build_manager(self.opts)
        meta = SegmentMetadata(
            self.topic,
            self.topic_id,
            partition.partition,
            partition.start_offset,
            partition.end_offset,
            partition.segment_uuid,
        )
        lo, hi = self.min_offset, self.max_offset
        # Boundary segments fetch only the byte window covering [lo, hi]
        # (offset index → byte range → chunk plan); interior segments and
        # unfiltered scans fetch whole.
        base_byte, data = fetch_segment_window(mgr, meta, lo, hi)
        bases, byte_offs, offsets, tss, keys, values = decode_segment_columns(data)
        if base_byte:
            byte_offs = [b + base_byte for b in byte_offs]
        if lo is not None or hi is not None:  # residual trim (R7 analog)
            sel = [
                i
                for i, o in enumerate(offsets)
                if (lo is None or o >= lo) and (hi is None or o <= hi)
            ]
            bases = [bases[i] for i in sel]
            byte_offs = [byte_offs[i] for i in sel]
            tss = [tss[i] for i in sel]
            keys = [keys[i] for i in sel]
            values = [values[i] for i in sel]
            offsets = [offsets[i] for i in sel]
        n = len(offsets)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([partition.partition] * n, pa.int32()),
                pa.array([partition.segment_uuid] * n, pa.string()),
                pa.array(bases, pa.int64()),
                pa.array(byte_offs, pa.int64()),
                pa.array(offsets, pa.int64()),
                pa.array(tss, pa.int64()),
                pa.array(keys, pa.binary()),
                pa.array(values, pa.binary()),
            ],
            names=[
                "partition",
                "segment_uuid",
                "batch_base_offset",
                "batch_byte_offset",
                "offset",
                "timestamp_us",
                "key",
                "value",
            ],
        )


class TieredSegmentsStreamReader(DataSourceStreamReader):
    """Micro-batch streaming over tiered segments: each new closed
    segment that appears in the object store becomes part of the next
    micro-batch — the mirror image of the reference's upload cadence
    (one upload per closed segment, README §Uploads), consumed with
    exactly-once offsets.

    Offset model: ``{topic_partition: next_unconsumed_start_offset}``.
    ``latestOffset`` is a driver-side key listing (pure metadata, like
    the batch planner); ``read`` runs executor-side per segment. Segment
    end bounds come from consecutive key names, so planning again needs
    no manifest I/O.
    """

    def __init__(self, options: dict):
        self.opts = dict(options)
        self.topic = self.opts.get("topic", "events")
        self.topic_id = self.opts.get("topic_id", "events-tid")
        self._batch_reader = TieredSegmentsReader(self.opts)
        # admission control (Kafka's maxOffsetsPerTrigger analog at the
        # unit this source consumes): at most N segments enter one
        # micro-batch, so a backfill over a large store becomes a
        # sequence of bounded batches instead of one unbounded one.
        # None = unthrottled.
        # DSv2 option keys arrive lower-cased (case-insensitive map)
        cap = self.opts.get("maxsegmentspertrigger", self.opts.get("maxSegmentsPerTrigger"))
        self.max_segments_per_trigger = int(cap) if cap is not None else None
        # Throttle state. Offsets returned by latestOffset must NEVER
        # regress below anything previously reported/committed — Spark
        # checkpoints whatever latestOffset says and would re-consume
        # (duplicates) after a regression. Three layers:
        #   _reported  — high-water mark this instance has returned;
        #   _committed — positions learned from partitions()/commit();
        #   state dir  — optional persisted _reported (restart-safe).
        # `throttleStateDir` (point it INSIDE the query's checkpoint
        # location) makes the cap effective from the very first batch of
        # a fresh query and across restarts; without it the planner has
        # no pre-initialOffset base, so the first batch of each run is
        # unthrottled and the cap applies from the second batch on.
        self._committed: dict[str, int] | None = None
        self._reported: dict[str, int] | None = None
        self._state_dir = self.opts.get(
            "throttlestatedir", self.opts.get("throttleStateDir")
        )
        if self._state_dir:
            import json as _json
            import os as _os

            f = _os.path.join(self._state_dir, "planned-offsets.json")
            if _os.path.exists(f):
                with open(f) as fh:
                    self._reported = {
                        k: int(v) for k, v in _json.load(fh).items()
                    }
            else:
                self._reported = {}

    def _persist_reported(self) -> None:
        if not self._state_dir:
            return
        import json as _json
        import os as _os
        import tempfile as _tempfile

        _os.makedirs(self._state_dir, exist_ok=True)
        fd, tmp = _tempfile.mkstemp(dir=self._state_dir, prefix=".planned-")
        with _os.fdopen(fd, "w") as fh:
            _json.dump(self._reported, fh)
        _os.replace(tmp, _os.path.join(self._state_dir, "planned-offsets.json"))

    def _segments(self) -> dict[int, list[tuple[int, str]]]:
        mgr = _build_manager(self.opts)
        prefix = f"{self.topic}-{self.topic_id}/"
        by_partition: dict[int, list[tuple[int, str]]] = {}
        for k in sorted(mgr.backend.list_keys(prefix)):
            if not k.endswith(".log"):
                continue
            rel = k[len(prefix):]
            part_s, fname = rel.split("/", 1)
            start_s, rest = fname.split("-", 1)
            by_partition.setdefault(int(part_s), []).append(
                (int(start_s), rest.rsplit(".", 1)[0])
            )
        return by_partition


    def initialOffset(self) -> dict:
        out = {str(p): 0 for p in self._segments()}
        self._committed = dict(out)
        return out

    def latestOffset(self) -> dict:
        # ONE store listing per trigger (a second listing could surface
        # a partition the first one missed, and on S3 each listing is a
        # full prefix pagination)
        segments = self._segments()
        avail: dict = {}
        for p, segs in segments.items():
            # the last segment's exclusive end is unknown from keys alone:
            # advance past its start (+1) — it is re-listed (idempotent
            # fetch) only if a later segment starts at the same offset,
            # which the key scheme forbids
            avail[str(p)] = segs[-1][0] + 1 if segs else 0
        cap = self.max_segments_per_trigger
        floor: dict[str, int] = {}
        for d in (self._committed, self._reported):
            for p, v in (d or {}).items():
                floor[p] = max(int(v), floor.get(p, 0))
        if cap is None or (self._committed is None and self._reported is None):
            # unthrottled, or no safe base yet (see __init__ notes)
            out = {p: max(v, floor.get(p, 0)) for p, v in avail.items()}
        else:
            # admit at most `cap` segments past the base, in partition
            # order; untouched partitions stay at their base (offsets
            # are monotonic, never behind the floor)
            out = {p: floor.get(p, 0) for p in avail}
            budget = cap
            for p, segs in sorted(segments.items()):
                key = str(p)
                for s_start, _uuid in segs:
                    if budget == 0:
                        break
                    if s_start >= out[key]:
                        out[key] = s_start + 1
                        budget -= 1
            out = {
                p: min(max(out[p], floor.get(p, 0)), max(avail[p], floor.get(p, 0)))
                for p in avail
            }
        self._reported = {**(self._reported or {}), **out}
        self._persist_reported()
        return out

    def partitions(self, start: dict, end: dict) -> list[SegmentPartition]:
        # re-sync the throttle base with the authoritative checkpoint
        merged = dict(self._committed or {})
        for p, v in start.items():
            merged[p] = max(int(v), merged.get(p, 0))
        self._committed = merged
        out: list[SegmentPartition] = []
        for p, segs in self._segments().items():
            lo = int(start.get(str(p), 0))
            hi = int(end.get(str(p), 0))
            for s_start, uuid in segs:
                if lo <= s_start < hi:
                    out.append(SegmentPartition(p, s_start, uuid))
        if not out:
            # Spark requires >= 1 partition per batch; empty sentinel
            out.append(SegmentPartition(-1, -1, ""))
        return out

    def read(self, partition: SegmentPartition):
        if partition.partition < 0:
            return iter(())
        return self._batch_reader.read(partition)

    def commit(self, end: dict) -> None:
        merged = dict(self._committed or {})
        for p, v in end.items():
            merged[p] = max(int(v), merged.get(p, 0))
        self._committed = merged


class SegmentsCommitMessage(WriterCommitMessage):
    """Per-task result of the write path: the manifests of the segments
    the task uploaded (incl. object keys, so abort can clean up)."""

    def __init__(self, manifests: list[dict]):
        self.manifests = manifests


class TieredSegmentsWriter(DataSourceWriter):
    """Batch WRITE path: ``df.write.format("tiered_segments")`` tiers a
    DataFrame of records straight into log segments through the full
    copy pipeline (chunk → compress → encrypt → upload + manifest + aux
    indexes) — the idiomatic-Spark completion of the source: the same
    format string reads, streams, and now writes.

    Expected input columns: ``partition INT, offset BIGINT,
    timestamp_us BIGINT, key BINARY, value BINARY`` (the record
    envelope). Each task groups ITS rows by topic-partition, sorts by
    offset, and cuts ``records_per_segment`` segments — so callers
    should ``repartition(partition).sortWithinPartitions(offset)`` (the
    same contract as hive-partitioned parquet writes).

    Failure handling: every segment a task uploads is also recorded
    under a per-job staging marker (``_staging/<job>/<segment-uuid>``)
    the moment it lands, so ``abort()`` can delete the uploads of tasks
    that FAILED midway, not just the completed tasks whose commit
    messages Spark hands back; ``commit()`` removes the markers.
    Segment uuids are deterministic per (partition, start_offset), so a
    retried task overwrites its own output (idempotent) instead of
    duplicating it. Visibility is per-segment like the reference's
    broker copy path (a reader can see a segment before the writing job
    commits); cleanup is job-level."""

    REQUIRED = ["partition", "offset", "timestamp_us", "key", "value"]

    def __init__(self, options: dict, schema, overwrite: bool):
        import uuid as _uuid

        if overwrite:
            raise ValueError(
                "tiered_segments is an append-only log format "
                "(use delete/vacuum for retention)"
            )
        missing = [c for c in self.REQUIRED if c not in schema.fieldNames()]
        if missing:
            raise ValueError(
                f"tiered_segments write needs columns {self.REQUIRED}; "
                f"missing {missing}"
            )
        self.opts = dict(options)
        self.records_per_segment = int(self.opts.get("records_per_segment", "500"))
        self.records_per_batch = int(self.opts.get("records_per_batch", "50"))
        # driver-generated, pickled to every task: the job's staging id
        self.job_token = _uuid.uuid4().hex

    def _staging_prefix(self) -> str:
        return f"_staging/{self.job_token}/"

    def write(self, iterator) -> SegmentsCommitMessage:
        import json as _json

        from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
            tier_record_rows,
        )

        by_partition: dict[int, list] = {}
        for row in iterator:
            by_partition.setdefault(int(row.partition), []).append(
                (
                    int(row.offset),
                    int(row.timestamp_us),
                    bytes(row.key) if row.key is not None else None,
                    bytes(row.value) if row.value is not None else None,
                )
            )
        mgr = _build_manager(self.opts)
        manifests = []
        for partition, rows in sorted(by_partition.items()):
            rows.sort(key=lambda r: r[0])
            for s in range(0, len(rows), self.records_per_segment):
                man = tier_record_rows(
                    mgr,
                    partition,
                    rows[s : s + self.records_per_segment],
                    self.records_per_batch,
                )
                # marker lands right after the segment: abort can find
                # this upload even if the task dies on its NEXT segment
                mgr.backend.upload(
                    f"{self._staging_prefix()}{man['segment_uuid']}",
                    _json.dumps(list(man["object_keys"].values())).encode(),
                )
                manifests.append(man)
        return SegmentsCommitMessage(manifests)

    def commit(self, messages) -> None:
        # segments are already durable + self-describing (manifest
        # uploaded by the copy pipeline); publishing = dropping the
        # staging markers
        mgr = _build_manager(self.opts)
        markers = mgr.backend.list_keys(self._staging_prefix())
        if markers:
            mgr.backend.delete(markers)

    def abort(self, messages) -> None:
        import json as _json

        mgr = _build_manager(self.opts)
        keys: set[str] = set()
        # staging markers cover EVERY upload, including those of tasks
        # that failed before returning a commit message
        markers = mgr.backend.list_keys(self._staging_prefix())
        for marker in markers:
            try:
                with mgr.backend.fetch(marker) as f:
                    keys.update(_json.loads(f.read().decode()))
            except Exception:
                continue
        for m in messages or []:
            if m is not None:
                for man in m.manifests:
                    keys.update(man["object_keys"].values())
        if keys:
            mgr.backend.delete(sorted(keys))
        if markers:
            mgr.backend.delete(markers)


class TieredSegmentsDataSource(DataSource):
    """`spark.read[Stream]/write.format("tiered_segments").option("root", ...)`"""

    @classmethod
    def name(cls) -> str:
        return "tiered_segments"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> TieredSegmentsReader:
        return TieredSegmentsReader(self.options)

    def streamReader(self, schema) -> TieredSegmentsStreamReader:
        return TieredSegmentsStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> TieredSegmentsWriter:
        return TieredSegmentsWriter(self.options, schema, overwrite)


def register(spark) -> None:
    # pushFilters() requires this SQL conf; callers (the correctness
    # driver) may pass a session without it, and it is runtime-settable.
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    spark.dataSource.register(TieredSegmentsDataSource)
