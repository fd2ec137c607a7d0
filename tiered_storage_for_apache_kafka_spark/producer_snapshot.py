"""Kafka producer-state snapshot codec.

The reference tiers the PRODUCER_SNAPSHOT aux index as an opaque blob
(`SegmentIndexesV1Builder.java:27-64`; served back via
`fetchIndex(..., PRODUCER_SNAPSHOT)` `KafkaRemoteStorageManager.java:
486-530`) — brokers restore idempotent-producer dedup state from it
when a replica rebuilds from tiered segments. This module implements
the blob's *content*: the public Apache Kafka snapshot layout written
by `ProducerStateManager.writeSnapshot` (storage module).

On-disk layout (all big-endian, Kafka protocol primitives):

    int16   version (= 1)
    uint32  crc     (CRC-32 of every byte after this field)
    int32   entry count
    per entry:
      int64  producer_id
      int16  producer_epoch
      int32  last_sequence         (of the producer's last data batch)
      int64  last_offset           (last offset of that batch)
      int32  offset_delta          (last_offset - batch base offset)
      int64  timestamp             (max timestamp of that batch)
      int32  coordinator_epoch
      int64  current_txn_first_offset  (-1 when no open transaction)

Field order and widths follow the public `ProducerStateManager`
snapshot schema; like `rlmm.py`, golden vectors are pinned in-repo (no
Kafka artifacts exist in this container to byte-certify against).

Fidelity note: a broker snapshot is *cumulative* over the partition's
life; the engine's transactional fixture writes per-segment snapshots
(each reflects the producers that appear in that segment). The read
side recovers the exact end-of-log state by max-merging entries across
segment snapshots on (producer, last_offset) — the same information a
replaying broker derives, without cross-task state.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

SNAPSHOT_VERSION = 1
_HEADER = struct.Struct(">hIi")  # version, crc, count
_ENTRY = struct.Struct(">qhiqiqiq")


@dataclass(frozen=True)
class ProducerStateEntry:
    producer_id: int
    producer_epoch: int
    last_sequence: int
    last_offset: int
    offset_delta: int
    timestamp: int
    coordinator_epoch: int = 0
    current_txn_first_offset: int = -1


def encode_producer_snapshot(entries: list[ProducerStateEntry]) -> bytes:
    body = bytearray(struct.pack(">i", len(entries)))
    for e in entries:
        body += _ENTRY.pack(
            e.producer_id,
            e.producer_epoch,
            e.last_sequence,
            e.last_offset,
            e.offset_delta,
            e.timestamp,
            e.coordinator_epoch,
            e.current_txn_first_offset,
        )
    crc = zlib.crc32(bytes(body)) & 0xFFFFFFFF
    return struct.pack(">hI", SNAPSHOT_VERSION, crc) + bytes(body)


def decode_producer_snapshot(buf: bytes) -> list[ProducerStateEntry]:
    """Parse a snapshot blob; rejects unknown versions, CRC mismatches,
    and truncation (corrupt producer state must never silently load —
    the broker would start accepting duplicate sequences)."""
    if len(buf) < _HEADER.size:
        raise ValueError("producer snapshot too short")
    version, crc = struct.unpack_from(">hI", buf, 0)
    if version != SNAPSHOT_VERSION:
        raise ValueError(f"unknown producer snapshot version {version}")
    body = buf[6:]
    if len(body) < 4:
        raise ValueError("producer snapshot too short")
    (count,) = struct.unpack_from(">i", body, 0)
    expected = 4 + count * _ENTRY.size
    if len(body) != expected:
        raise ValueError(
            f"producer snapshot declares {count} entries "
            f"({expected} body bytes) but carries {len(body)}"
        )
    if (zlib.crc32(body) & 0xFFFFFFFF) != crc:
        raise ValueError("producer snapshot CRC mismatch")
    entries = []
    off = 4
    for _ in range(count):
        fields = _ENTRY.unpack_from(body, off)
        entries.append(ProducerStateEntry(*fields))
        off += _ENTRY.size
    return entries


def merge_latest_state(
    snapshots: list[list[ProducerStateEntry]],
) -> dict[int, ProducerStateEntry]:
    """End-of-log producer state from per-segment snapshots: per
    producer, the entry with the greatest last_offset wins (snapshots
    are monotone in the log — a later batch always has a later
    offset)."""
    state: dict[int, ProducerStateEntry] = {}
    for snap in snapshots:
        for e in snap:
            cur = state.get(e.producer_id)
            if cur is None or e.last_offset > cur.last_offset:
                state[e.producer_id] = e
    return state
