"""Transaction index codec + read_committed semantics.

Mirrors the broker behavior the reference's TRANSACTION aux index
exists to serve (`SegmentIndexesV1Builder.java:27-64`,
`KafkaRemoteStorageManager.java:486-530`): Kafka's on-disk AbortedTxn
layout, and consumer-side read_committed visibility.
"""

from __future__ import annotations

import struct

import pytest

from tiered_storage_for_apache_kafka_spark.kafka_wire import (
    KafkaBatch,
    KafkaRecord,
    decode_kafka_batches,
    encode_kafka_batch,
)
from tiered_storage_for_apache_kafka_spark.txn_index import (
    ABORTED_TXN_SIZE,
    AbortedTxn,
    aborted_in_range,
    decode_transaction_index,
    encode_transaction_index,
    filter_read_committed,
)


class TestAbortedTxnCodec:
    def test_golden_vector(self):
        # hand-computed: version 0 (int16) + 4 big-endian int64s
        buf = encode_transaction_index([AbortedTxn(5, 10, 20, 21)])
        assert len(buf) == ABORTED_TXN_SIZE
        assert buf == (
            b"\x00\x00"
            + (5).to_bytes(8, "big")
            + (10).to_bytes(8, "big")
            + (20).to_bytes(8, "big")
            + (21).to_bytes(8, "big")
        )

    def test_round_trip_many(self):
        entries = [
            AbortedTxn(pid, first, first + 7, first + 8)
            for pid, first in [(1, 0), (2, 100), (1, 50), (9000, 2**40)]
        ]
        assert decode_transaction_index(encode_transaction_index(entries)) == entries

    def test_empty(self):
        assert decode_transaction_index(b"") == []

    def test_truncated_rejected(self):
        buf = encode_transaction_index([AbortedTxn(1, 2, 3, 4)])
        with pytest.raises(ValueError, match="multiple"):
            decode_transaction_index(buf[:-1])

    def test_unknown_version_rejected(self):
        buf = bytearray(encode_transaction_index([AbortedTxn(1, 2, 3, 4)]))
        buf[1] = 9
        with pytest.raises(ValueError, match="version"):
            decode_transaction_index(bytes(buf))

    def test_aborted_in_range_overlap_predicate(self):
        entries = [
            AbortedTxn(1, 0, 9, 10),
            AbortedTxn(1, 20, 29, 30),
            AbortedTxn(2, 50, 59, 60),
        ]
        hit = aborted_in_range(entries, 25, 55)
        assert hit == [entries[1], entries[2]]
        assert aborted_in_range(entries, 10, 20) == []
        # Kafka bounds: fetchOffset inclusive (lastOffset >= it), upper
        # bound EXCLUSIVE (firstOffset < it) — collectAbortedTxns parity
        assert aborted_in_range(entries, 9, 10) == [entries[0]]
        assert aborted_in_range(entries, 29, 50) == [entries[1]]
        assert aborted_in_range(entries, 29, 51) == [entries[1], entries[2]]


def _batch(base, n, *, attrs=0, pid=-1, key=b"k"):
    return KafkaBatch(
        base_offset=base,
        base_timestamp=1000,
        records=[KafkaRecord(i, 0, key, b"v%d" % (base + i)) for i in range(n)],
        attributes=attrs,
        producer_id=pid,
        producer_epoch=0 if pid >= 0 else -1,
        base_sequence=0 if pid >= 0 else -1,
    )


def _marker(base, pid, ctype):
    return KafkaBatch(
        base_offset=base,
        base_timestamp=1000,
        records=[
            KafkaRecord(0, 0, struct.pack(">hh", 0, ctype), struct.pack(">hi", 0, 0))
        ],
        attributes=0x30,
        producer_id=pid,
        producer_epoch=0,
        base_sequence=-1,
    )


def _decode(blobs):
    return decode_kafka_batches(b"".join(encode_kafka_batch(b) for b in blobs))


class TestReadCommittedFilter:
    def test_control_batches_dropped(self):
        batches = _decode([_batch(0, 3, attrs=0x10, pid=7), _marker(3, 7, 1)])
        out = filter_read_committed(batches, [])
        assert [b.base_offset for b, _ in out] == [0]

    def test_non_transactional_passes_even_in_aborted_range(self):
        batches = _decode([_batch(0, 3)])
        out = filter_read_committed(batches, [AbortedTxn(7, 0, 10, 10)])
        assert len(out) == 1 and len(out[0][0].records) == 3

    def test_aborted_batch_fully_dropped(self):
        batches = _decode(
            [_batch(0, 3, attrs=0x10, pid=7), _batch(4, 3, attrs=0x10, pid=7)]
        )
        out = filter_read_committed(batches, [AbortedTxn(7, 0, 3, 3)])
        assert [b.base_offset for b, _ in out] == [4]

    def test_other_producer_unaffected(self):
        batches = _decode(
            [_batch(0, 3, attrs=0x10, pid=7), _batch(4, 3, attrs=0x10, pid=8)]
        )
        out = filter_read_committed(batches, [AbortedTxn(7, 0, 3, 3)])
        assert [b.base_offset for b, _ in out] == [4]

    def test_straddling_batch_keeps_committed_tail(self):
        # abort range covers offsets 0..1 of a 4-record batch
        batches = _decode([_batch(0, 4, attrs=0x10, pid=7)])
        out = filter_read_committed(batches, [AbortedTxn(7, 0, 1, 2)])
        assert len(out) == 1
        kept = out[0][0]
        assert [kept.base_offset + r.offset_delta for r in kept.records] == [2, 3]

    def test_range_boundaries_inclusive(self):
        batches = _decode([_batch(0, 5, attrs=0x10, pid=7)])
        out = filter_read_committed(batches, [AbortedTxn(7, 1, 3, 4)])
        kept = out[0][0]
        assert [kept.base_offset + r.offset_delta for r in kept.records] == [0, 4]


class TestTieredReadCommittedEndToEnd:
    @pytest.fixture(scope="class")
    def tiered(self, tmp_path_factory):
        from tiered_storage_for_apache_kafka_spark.operators.txn_read import (
            RECORDS_PER_TXN,
            tier_transactional_rows,
        )
        from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
            _build_manager,
            manager_conf,
        )

        root = str(tmp_path_factory.mktemp("txn-tier"))
        conf = manager_conf(root, chunk_size=512, compression=True)
        mgr = _build_manager(conf)
        # 130 records = 2 full txns + 1 partial (batch_nos 0,1,2) in one
        # segment; batch_no 3 would abort but doesn't exist here, so add
        # a second segment-worth shifted to cover an aborted batch_no.
        rows = [
            (eid // RECORDS_PER_TXN, 1_000_000 + eid, eid, b"t%d" % (eid % 3),
             str(eid).encode())
            for eid in range(130)
        ]
        manifest1 = tier_transactional_rows(mgr, 0, rows)
        rows2 = [
            (3 + eid // RECORDS_PER_TXN, 2_000_000 + eid, 1000 + eid,
             b"t%d" % (eid % 3), str(1000 + eid).encode())
            for eid in range(80)  # batch_nos 3 (aborted), 4
        ]
        manifest2 = tier_transactional_rows(mgr, 0, rows2)
        return mgr, [manifest1, manifest2]

    def _read(self, mgr, manifest, committed=True):
        from tiered_storage_for_apache_kafka_spark.api import SegmentMetadata
        from tiered_storage_for_apache_kafka_spark.kafka_wire import data_batches
        from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
            TOPIC,
            TOPIC_ID,
        )

        meta = SegmentMetadata(
            TOPIC,
            TOPIC_ID,
            manifest["partition"],
            manifest["start_offset"],
            manifest["end_offset"],
            manifest["segment_uuid"],
        )
        data = b"".join(mgr.fetch_log_segment(meta, 0))
        batches = decode_kafka_batches(data)
        if committed:
            aborted = decode_transaction_index(mgr.fetch_index(meta, "transaction"))
            batches = filter_read_committed(batches, aborted)
        else:
            batches = data_batches(batches)
        return [
            int(r.value.decode()) for b, _ in batches for r in b.records
        ]

    def test_no_aborts_segment_passes_everything(self, tiered):
        mgr, (m1, _m2) = tiered
        assert self._read(mgr, m1) == list(range(130))
        assert self._read(mgr, m1, committed=False) == list(range(130))

    def test_aborted_txn_dropped_read_committed_only(self, tiered):
        mgr, (_m1, m2) = tiered
        # batch_no 3 (event_ids 1000..1049) aborted; batch_no 4 survives
        assert self._read(mgr, m2) == list(range(1050, 1080))
        assert self._read(mgr, m2, committed=False) == list(range(1000, 1080))

    def test_txn_index_matches_construction(self, tiered):
        from tiered_storage_for_apache_kafka_spark.api import SegmentMetadata
        from tiered_storage_for_apache_kafka_spark.operators.txn_read import (
            PRODUCER_BASE,
        )
        from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
            TOPIC,
            TOPIC_ID,
        )

        mgr, (m1, m2) = tiered
        meta1 = SegmentMetadata(TOPIC, TOPIC_ID, 0, m1["start_offset"],
                                m1["end_offset"], m1["segment_uuid"])
        assert decode_transaction_index(mgr.fetch_index(meta1, "transaction")) == []
        meta2 = SegmentMetadata(TOPIC, TOPIC_ID, 0, m2["start_offset"],
                                m2["end_offset"], m2["segment_uuid"])
        entries = decode_transaction_index(mgr.fetch_index(meta2, "transaction"))
        # batch_no 3: base 3*51=153, 50 records -> marker 203, pid 9000
        assert entries == [AbortedTxn(PRODUCER_BASE, 153, 203, 203)]


    def test_tiered_checkpoint_matches_wire_epochs(self, tiered):
        """The checkpoint chain must agree with the epochs stamped on
        the wire batches themselves (both derive from batch_no)."""
        from tiered_storage_for_apache_kafka_spark.api import SegmentMetadata
        from tiered_storage_for_apache_kafka_spark.leader_epoch import (
            decode_leader_epoch_checkpoint,
            epoch_for_offset,
        )
        from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
            TOPIC,
            TOPIC_ID,
        )

        mgr, (m1, _m2) = tiered
        meta = SegmentMetadata(TOPIC, TOPIC_ID, 0, m1["start_offset"],
                               m1["end_offset"], m1["segment_uuid"])
        entries = decode_leader_epoch_checkpoint(
            mgr.fetch_index(meta, "leaderEpoch")
        )
        data = b"".join(mgr.fetch_log_segment(meta, 0))
        for batch, _off in decode_kafka_batches(data):
            assert (
                epoch_for_offset(entries, batch.base_offset)
                == batch.partition_leader_epoch
            )


    def test_tiered_snapshot_agrees_with_wire(self, tiered):
        """Snapshot entries must equal the state derivable from the
        segment's own wire batches (last data batch per producer)."""
        from tiered_storage_for_apache_kafka_spark.api import SegmentMetadata
        from tiered_storage_for_apache_kafka_spark.kafka_wire import data_batches
        from tiered_storage_for_apache_kafka_spark.producer_snapshot import (
            decode_producer_snapshot,
        )
        from tiered_storage_for_apache_kafka_spark.sources.segment_source import (
            TOPIC,
            TOPIC_ID,
        )

        mgr, (m1, _m2) = tiered
        meta = SegmentMetadata(TOPIC, TOPIC_ID, 0, m1["start_offset"],
                               m1["end_offset"], m1["segment_uuid"])
        snap = {
            e.producer_id: e
            for e in decode_producer_snapshot(
                mgr.fetch_index(meta, "producerSnapshot")
            )
        }
        data = b"".join(mgr.fetch_log_segment(meta, 0))
        last_data_batch = {}
        for batch, _off in data_batches(decode_kafka_batches(data)):
            last_data_batch[batch.producer_id] = batch
        assert set(snap) == set(last_data_batch)
        for pid, batch in last_data_batch.items():
            e = snap[pid]
            n = len(batch.records)
            assert e.last_sequence == batch.base_sequence + n - 1
            assert e.last_offset == batch.base_offset + n - 1
            assert e.offset_delta == n - 1


class TestLeaderEpochCheckpoint:
    def test_golden_text(self):
        from tiered_storage_for_apache_kafka_spark.leader_epoch import (
            EpochEntry,
            encode_leader_epoch_checkpoint,
        )

        buf = encode_leader_epoch_checkpoint(
            [EpochEntry(0, 0), EpochEntry(5, 100)]
        )
        assert buf == b"0\n2\n0 0\n5 100\n"

    def test_round_trip_and_rejections(self):
        from tiered_storage_for_apache_kafka_spark.leader_epoch import (
            EpochEntry,
            decode_leader_epoch_checkpoint,
            encode_leader_epoch_checkpoint,
        )

        entries = [EpochEntry(e, e * 204) for e in range(7)]
        assert (
            decode_leader_epoch_checkpoint(
                encode_leader_epoch_checkpoint(entries)
            )
            == entries
        )
        assert decode_leader_epoch_checkpoint(b"0\n0\n") == []
        with pytest.raises(ValueError, match="version"):
            decode_leader_epoch_checkpoint(b"9\n0\n")
        with pytest.raises(ValueError, match="carries"):
            decode_leader_epoch_checkpoint(b"0\n2\n0 0\n")
        with pytest.raises(ValueError, match="malformed"):
            decode_leader_epoch_checkpoint(b"0\n1\n0 0 0\n")

    def test_epoch_for_offset(self):
        from tiered_storage_for_apache_kafka_spark.leader_epoch import (
            EpochEntry,
            epoch_for_offset,
        )

        entries = [EpochEntry(0, 0), EpochEntry(2, 100), EpochEntry(3, 250)]
        assert epoch_for_offset(entries, 0) == 0
        assert epoch_for_offset(entries, 99) == 0
        assert epoch_for_offset(entries, 100) == 2
        assert epoch_for_offset(entries, 10_000) == 3
        assert epoch_for_offset([EpochEntry(4, 50)], 49) is None



class TestProducerSnapshot:
    def test_golden_vector(self):
        import zlib
        from tiered_storage_for_apache_kafka_spark.producer_snapshot import (
            ProducerStateEntry,
            encode_producer_snapshot,
        )

        buf = encode_producer_snapshot(
            [ProducerStateEntry(9000, 0, 49, 50, 49, 1234)]
        )
        # version 1, then crc over (count + entry)
        body = (
            (1).to_bytes(4, "big")          # count
            + (9000).to_bytes(8, "big")     # producer_id
            + (0).to_bytes(2, "big")        # epoch
            + (49).to_bytes(4, "big")       # last_sequence
            + (50).to_bytes(8, "big")       # last_offset
            + (49).to_bytes(4, "big")       # offset_delta
            + (1234).to_bytes(8, "big")     # timestamp
            + (0).to_bytes(4, "big")        # coordinator_epoch
            + (-1).to_bytes(8, "big", signed=True)  # open txn
        )
        assert buf == (1).to_bytes(2, "big") + zlib.crc32(body).to_bytes(
            4, "big"
        ) + body

    def test_round_trip_and_rejections(self):
        from tiered_storage_for_apache_kafka_spark.producer_snapshot import (
            ProducerStateEntry,
            decode_producer_snapshot,
            encode_producer_snapshot,
        )

        entries = [
            ProducerStateEntry(9000 + i, i, 10 * i, 11 * i, 3, 500 + i)
            for i in range(5)
        ]
        buf = encode_producer_snapshot(entries)
        assert decode_producer_snapshot(buf) == entries
        assert decode_producer_snapshot(encode_producer_snapshot([])) == []
        corrupt = bytearray(buf)
        corrupt[-1] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            decode_producer_snapshot(bytes(corrupt))
        with pytest.raises(ValueError, match="version"):
            decode_producer_snapshot(b"\x00\x09" + buf[2:])
        with pytest.raises(ValueError, match="carries"):
            decode_producer_snapshot(buf[:-4])

    def test_merge_latest_state(self):
        from tiered_storage_for_apache_kafka_spark.producer_snapshot import (
            ProducerStateEntry,
            merge_latest_state,
        )

        s1 = [ProducerStateEntry(1, 0, 49, 50, 49, 100)]
        s2 = [
            ProducerStateEntry(1, 0, 149, 152, 49, 200),
            ProducerStateEntry(2, 0, 99, 101, 49, 150),
        ]
        merged = merge_latest_state([s1, s2])
        assert merged[1].last_offset == 152 and merged[2].last_offset == 101
        # order independence
        assert merge_latest_state([s2, s1]) == merged
