"""Kafka transaction-index codec + read_committed filtering.

The reference tiers Kafka's TRANSACTION aux index as an opaque blob
(`manifest/SegmentIndexesV1.java:26-99`, optional per
`SegmentIndexesV1Builder.java:27-64`) and serves it back through
`fetchIndex(..., TRANSACTION)` (`KafkaRemoteStorageManager.java:486-530`)
— the broker uses it to answer read_committed fetches. This module
implements the *content* of that blob (the public Apache Kafka on-disk
format of `storage/.../internals/log/AbortedTxn.java` +
`TransactionIndex.java`) and the consumer-visible semantics: drop
control batches and drop records of aborted transactions.

On-disk entry format (AbortedTxn.java, CURRENT_VERSION = 0; all fields
big-endian, 34 bytes total):

    int16  version
    int64  producer_id
    int64  first_offset         (first offset of the aborted txn)
    int64  last_offset          (offset of the ABORT control marker)
    int64  last_stable_offset   (LSO when the marker was written)

read_committed semantics (KafkaConsumer isolation.level docs): a record
is invisible iff (a) it lives in a control batch (txn marker), or
(b) its batch is transactional and some aborted txn of the same
producer covers its offset (first_offset <= offset <= last_offset).
Non-transactional batches always pass — read_committed only filters
transactional data.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from tiered_storage_for_apache_kafka_spark.kafka_wire import KafkaBatch

ABORTED_TXN_VERSION = 0
ABORTED_TXN_SIZE = 34  # 2 + 4*8
_ENTRY = struct.Struct(">hqqqq")


@dataclass(frozen=True)
class AbortedTxn:
    """One aborted-transaction range (AbortedTxn.java fields)."""

    producer_id: int
    first_offset: int
    last_offset: int
    last_stable_offset: int


def encode_transaction_index(entries: list[AbortedTxn]) -> bytes:
    """Serialize entries in Kafka's TransactionIndex file layout
    (concatenated fixed-size AbortedTxn records, no header)."""
    out = bytearray()
    for e in entries:
        out += _ENTRY.pack(
            ABORTED_TXN_VERSION,
            e.producer_id,
            e.first_offset,
            e.last_offset,
            e.last_stable_offset,
        )
    return bytes(out)


def decode_transaction_index(buf: bytes) -> list[AbortedTxn]:
    """Parse a TransactionIndex blob; rejects truncated files and
    unknown entry versions (the broker would be reading garbage)."""
    if len(buf) % ABORTED_TXN_SIZE:
        raise ValueError(
            f"transaction index length {len(buf)} is not a multiple of "
            f"{ABORTED_TXN_SIZE}"
        )
    entries = []
    for off in range(0, len(buf), ABORTED_TXN_SIZE):
        version, pid, first, last, lso = _ENTRY.unpack_from(buf, off)
        if version != ABORTED_TXN_VERSION:
            raise ValueError(f"unknown AbortedTxn version {version}")
        entries.append(AbortedTxn(pid, first, last, lso))
    return entries


def aborted_in_range(
    entries: list[AbortedTxn], fetch_offset: int, upper_bound_offset: int
) -> list[AbortedTxn]:
    """Entries overlapping a fetch window — TransactionIndex.java's
    `collectAbortedTxns(fetchOffset, upperBoundOffset)` predicate:
    `lastOffset >= fetchOffset && firstOffset < upperBoundOffset`
    (the upper bound is EXCLUSIVE, as in Kafka)."""
    return [
        e
        for e in entries
        if e.last_offset >= fetch_offset and e.first_offset < upper_bound_offset
    ]


def filter_read_committed(
    batches: list[tuple[KafkaBatch, int]], aborted: list[AbortedTxn]
) -> list[tuple[KafkaBatch, int]]:
    """Apply read_committed visibility to decoded wire batches
    (`decode_kafka_batches` output: (batch, byte_offset) pairs; a
    record's log offset is ``batch.base_offset + record.offset_delta``).

    Returns the surviving (batch, byte_offset) pairs with aborted
    records REMOVED from transactional batches; control batches are
    dropped whole. A transactional batch fully inside an aborted range
    disappears; a batch straddling a range keeps its committed tail
    (per-record offset check, exactly the consumer's behavior).
    """
    by_producer: dict[int, list[AbortedTxn]] = {}
    for e in aborted:
        by_producer.setdefault(e.producer_id, []).append(e)

    out: list[tuple[KafkaBatch, int]] = []
    for batch, byte_off in batches:
        if batch.is_control:
            continue
        if not batch.is_transactional or batch.producer_id not in by_producer:
            out.append((batch, byte_off))
            continue
        ranges = by_producer[batch.producer_id]
        kept = [
            r
            for r in batch.records
            if not any(
                e.first_offset <= batch.base_offset + r.offset_delta <= e.last_offset
                for e in ranges
            )
        ]
        if not kept:
            continue
        if len(kept) == len(batch.records):
            out.append((batch, byte_off))
        else:
            trimmed = KafkaBatch(
                base_offset=batch.base_offset,
                base_timestamp=batch.base_timestamp,
                records=kept,
                partition_leader_epoch=batch.partition_leader_epoch,
                attributes=batch.attributes,
                producer_id=batch.producer_id,
                producer_epoch=batch.producer_epoch,
                base_sequence=batch.base_sequence,
                max_timestamp=batch.max_timestamp,
            )
            out.append((trimmed, byte_off))
    return out
