"""Byte-range planned reads for boundary segments (the round-3 verdict's
one scale item): an offset-windowed read of a tiered segment must fetch
only the chunks covering the window's batches — resolved through the
batch-granular offset index — never the whole segment.

Reference read path parity: offset→position via the segment offset
index, then chunk planning + trim (`FetchChunkEnumeration.java:54-92`,
:100-138)."""

from __future__ import annotations

import pytest

from tiered_storage_for_apache_kafka_spark.api import (
    SegmentData,
    SegmentMetadata,
    TieredStorageManager,
)
from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
    fetch_segment_window,
    parse_offset_index,
    plan_offset_byte_range,
    struct_offset_index,
)
from tiered_storage_for_apache_kafka_spark.storage.filesystem import (
    FileSystemStorage,
)
from tiered_storage_for_apache_kafka_spark.wire import (
    Record,
    decode_segment_columns,
    encode_batch,
)


class CountingBackend(FileSystemStorage):
    """Records (key, range_size_or_full) per fetch."""

    def __init__(self, root):
        super().__init__(root)
        self.fetches: list[tuple[str, int | None]] = []

    def fetch(self, key, byte_range=None):
        self.fetches.append((key, byte_range.size if byte_range else None))
        return super().fetch(key, byte_range)

    def log_bytes_fetched(self) -> int:
        total = 0
        for key, size in self.fetches:
            if key.endswith(".log"):
                assert size is not None, "whole-object GET on the log object"
                total += size
        return total


def _build_segment(n_records=500, per_batch=50):
    """One segment of n_records, per_batch-record batches; returns
    (blob, batch_positions, offsets)."""
    blob = bytearray()
    positions = []
    offsets = list(range(1000, 1000 + n_records))
    for b in range(0, n_records, per_batch):
        batch = offsets[b : b + per_batch]
        positions.append((batch[0], len(blob)))
        blob += encode_batch(
            [Record(o, o * 10, b"k%d" % o, b"v" * 40 + b"%d" % o) for o in batch]
        )
    return bytes(blob), positions, offsets


def _tier(tmp_path, blob, positions):
    backend = CountingBackend(tmp_path)
    mgr = TieredStorageManager(backend, chunk_size=1024, compression_enabled=False)
    meta = SegmentMetadata("t", "tid", 0, 1000, 1499, "u-range")
    indexes = {
        "offset": struct_offset_index(positions),
        "timestamp": b"",
        "producerSnapshot": b"",
        "leaderEpoch": b"",
    }
    mgr.copy_log_segment_data(meta, SegmentData(blob, indexes))
    backend.fetches.clear()
    return backend, mgr, meta


def test_offset_index_roundtrip():
    pairs = [(1000, 0), (1050, 3217), (1100, 6501)]
    assert parse_offset_index(struct_offset_index(pairs)) == pairs
    with pytest.raises(ValueError):
        parse_offset_index(b"\x00" * 15)


def test_plan_offset_byte_range_matrix():
    pairs = [(0, 0), (50, 500), (100, 1000), (150, 1500)]
    # window inside one batch: its start byte .. next batch start - 1
    assert plan_offset_byte_range(pairs, 60, 70) == (500, 999)
    # window exactly a batch's base
    assert plan_offset_byte_range(pairs, 50, 50) == (500, 999)
    # lo before first batch, hi inside second
    assert plan_offset_byte_range(pairs, None, 60) == (0, 999)
    assert plan_offset_byte_range(pairs, -5, 60) == (0, 999)
    # hi beyond last batch -> open end
    assert plan_offset_byte_range(pairs, 120, 999) == (1000, None)
    # unbounded
    assert plan_offset_byte_range(pairs, None, None) == (0, None)
    # straddling three batches
    assert plan_offset_byte_range(pairs, 49, 101) == (0, 1499)


def test_boundary_fetch_reads_fraction_of_segment(tmp_path):
    blob, positions, _ = _build_segment()
    backend, mgr, meta = _tier(tmp_path, blob, positions)
    # a 30-offset window in the middle of the 500-record segment
    lo, hi = 1210, 1239
    base_byte, data = fetch_segment_window(mgr, meta, lo, hi)
    _, _, offsets, _, keys, values = decode_segment_columns(data)
    got = [o for o in offsets if lo <= o <= hi]
    assert got == list(range(lo, hi + 1))
    # bytes fetched from the log object must be a small fraction of the
    # segment: the window spans ~1-2 batches out of 10
    fetched = backend.log_bytes_fetched()
    assert fetched < len(blob) / 3, (fetched, len(blob))
    # and base_byte restores absolute positions
    assert base_byte == plan_offset_byte_range(positions, lo, hi)[0]


def test_interior_segment_skips_index_fetch(tmp_path):
    blob, positions, _ = _build_segment()
    backend, mgr, meta = _tier(tmp_path, blob, positions)
    base_byte, data = fetch_segment_window(mgr, meta, 500, 2000)
    assert base_byte == 0
    _, _, offsets, _, _, _ = decode_segment_columns(data)
    assert len(offsets) == 500
    # interior window: no .indexes GET at all
    assert not any(k.endswith(".indexes") for k, _ in backend.fetches)


def test_legacy_index_falls_back_to_whole_segment(tmp_path):
    """A store written with the old 8-byte-per-record index format must
    still read correctly (wider fetch, same answer)."""
    blob, positions, offsets = _build_segment()
    backend = CountingBackend(tmp_path)
    mgr = TieredStorageManager(backend, chunk_size=1024, compression_enabled=False)
    meta = SegmentMetadata("t", "tid", 0, 1000, 1499, "u-legacy")
    legacy = b"".join(o.to_bytes(8, "big") for o in offsets)  # 8B/record
    # even record count: the length IS a multiple of 16, so only the
    # structural check (first position == 0, ascending) rejects it
    assert len(legacy) % 16 == 0
    mgr.copy_log_segment_data(
        meta,
        SegmentData(blob, {"offset": legacy, "timestamp": b"",
                           "producerSnapshot": b"", "leaderEpoch": b""}),
    )
    base_byte, data = fetch_segment_window(mgr, meta, 1210, 1239)
    assert base_byte == 0 and data == blob


def test_spark_ranged_read_is_byte_windowed(spark, tmp_path):
    """End-to-end through read_tiered_records: a sub-segment offset range
    returns exactly the window's records with absolute batch byte
    offsets (matching a full-scan read of the same segments)."""
    from pyspark.sql import functions as F

    from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
        manager_conf,
        read_tiered_records,
        tier_events_table,
    )
    from tiered_storage_for_apache_kafka_spark.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    conf = manager_conf(str(tmp_path), chunk_size=1024, compression=True)
    manifests = tier_events_table(spark, events, conf).cache()
    manifests.count()
    lo, hi = 120, 180
    ranged = read_tiered_records(spark, manifests, conf, lo, hi)
    full = read_tiered_records(spark, manifests, conf).filter(
        (F.col("offset") >= lo) & (F.col("offset") <= hi)
    )
    r = {
        (row.offset, row.batch_base_offset, row.batch_byte_offset)
        for row in ranged.collect()
    }
    f = {
        (row.offset, row.batch_base_offset, row.batch_byte_offset)
        for row in full.collect()
    }
    assert r == f and len(r) == hi - lo + 1


def test_empty_offset_window_returns_no_bytes(tmp_path):
    """Contradictory bounds (lo > hi) survive pruning when a segment's
    end is unknown; the planner must yield zero records, not an
    InvalidRangeError out of BytesRange."""
    blob, positions, _ = _build_segment()
    backend, mgr, meta = _tier(tmp_path, blob, positions)
    # unknown end, as the datasource's last-segment case constructs it
    open_meta = SegmentMetadata("t", "tid", 0, 1000, -1, "u-range")
    base_byte, data = fetch_segment_window(mgr, open_meta, 1210, 1020)
    assert data == b""
    assert backend.log_bytes_fetched() == 0


def test_corrupt_index_positions_fall_back_whole_segment(tmp_path):
    """An index whose byte positions point past segment end must degrade
    to the (wider, never wrong) whole-segment fetch, not crash."""
    blob, positions, offsets = _build_segment()
    bogus = [(o, p + 10_000_000) if p else (o, p) for o, p in positions]
    backend, mgr, meta = _tier(tmp_path, blob, bogus)
    base_byte, data = fetch_segment_window(mgr, meta, 1210, 1239)
    assert base_byte == 0
    _, _, got, _, _, _ = decode_segment_columns(data)
    assert got == offsets  # whole segment came back


def test_boundary_fetch_single_manifest_get(tmp_path):
    """A byte-range planned read needs the manifest for the index GET and
    for the log GET — the per-manager LRU must make that ONE manifest
    round-trip, not two. A fresh reader-side manager models the real
    topology (readers are not the writer, whose copy pre-caches)."""
    blob, positions, _ = _build_segment()
    backend, mgr, meta = _tier(tmp_path, blob, positions)
    reader = TieredStorageManager(backend, chunk_size=1024, compression_enabled=False)
    backend.fetches.clear()
    fetch_segment_window(reader, meta, 1210, 1239)
    manifest_gets = [k for k, _ in backend.fetches if k.endswith(".rsm-manifest")]
    assert len(manifest_gets) == 1, backend.fetches
    # and the writer-side manager, having cached at copy, needs none
    backend.fetches.clear()
    fetch_segment_window(mgr, meta, 1210, 1239)
    assert not any(k.endswith(".rsm-manifest") for k, _ in backend.fetches)


def test_known_end_from_manifest_detects_interior(tmp_path):
    """end_offset unknown on the metadata (datasource keys don't encode
    it) + an upper bound covering the whole segment: the cached
    manifest's kafka endOffset must classify the segment interior — no
    .indexes GET."""
    blob, positions, _ = _build_segment()
    backend, mgr, meta = _tier(tmp_path, blob, positions)
    open_meta = SegmentMetadata("t", "tid", 0, 1000, -1, "u-range")
    base_byte, data = fetch_segment_window(mgr, open_meta, None, 5000)
    assert base_byte == 0
    _, _, got, _, _, _ = decode_segment_columns(data)
    assert len(got) == 500
    assert not any(k.endswith(".indexes") for k, _ in backend.fetches)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 40), min_size=1, max_size=12),
    base=st.integers(0, 10_000),
    lo_off=st.integers(-5, 500),
    width=st.integers(0, 500),
)
def test_planned_window_covers_requested_offsets(sizes, base, lo_off, width):
    """Property: every record whose offset falls in [lo, hi] lies inside
    the planned byte window (coverage), and every batch fully inside the
    window contains at least one wanted record (tightness — a regression
    to whole-segment (0, None) plans fails here, not just correctness)."""
    pairs = []
    pos = 0
    off = base
    for n in sizes:
        pairs.append((off, pos))
        pos += n * 7  # 7 bytes per record, arbitrary but consistent
        off += n
    total_bytes = pos
    lo = base + lo_off
    hi = lo + width
    start_byte, end_byte = plan_offset_byte_range(pairs, lo, hi)
    end_byte = total_bytes - 1 if end_byte is None else min(end_byte, total_bytes - 1)
    # walk every record; assert covered iff wanted
    off = base
    pos = 0
    for (b_off, b_pos), n in zip(pairs, sizes):
        for i in range(n):
            r_off = b_off + i
            if lo <= r_off <= hi:
                # the whole batch containing a wanted record is covered
                assert b_pos >= start_byte and b_pos + n * 7 - 1 <= end_byte, (
                    pairs, lo, hi, start_byte, end_byte)
    # tightness: the window covers EXACTLY the batch span
    # [last base <= lo .. last base <= hi] — batch granularity means a
    # record >= lo may sit in the last batch whose base <= lo, nothing
    # earlier; an over-wide plan (whole-segment (0, None) fallback)
    # covers earlier batches and fails here
    from bisect import bisect_right as _br

    bases = [o for o, _ in pairs]
    si = max(_br(bases, lo) - 1, 0)
    ei = _br(bases, hi) - 1  # -1 when hi < first base: nothing wanted
    for idx, ((b_off, b_pos), n) in enumerate(zip(pairs, sizes)):
        covered = b_pos >= start_byte and b_pos + n * 7 - 1 <= end_byte
        assert covered == (si <= idx <= ei), (
            pairs, lo, hi, start_byte, end_byte, idx)
