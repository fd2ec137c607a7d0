"""KIP-405 remote-log-metadata serde + tracker tests."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tiered_storage_for_apache_kafka_spark import rlmm


def _sid(part=0, seed=b"seg"):
    return rlmm.RemoteLogSegmentId(
        "events",
        hashlib.md5(b"topic:events").digest(),
        part,
        hashlib.md5(seed).digest(),
    )


def _meta(part=0, seed=b"seg", **kw):
    defaults = dict(
        segment=_sid(part, seed),
        start_offset=100,
        end_offset=149,
        broker_epoch=7,
        max_timestamp_ms=1_700_000_000_000,
        event_timestamp_ms=1_700_000_000_001,
        leader_epochs=((0, 100), (3, 120)),
        segment_size=4096,
        custom_metadata=None,
        state=rlmm.COPY_SEGMENT_STARTED,
    )
    defaults.update(kw)
    return rlmm.RemoteLogSegmentMetadata(**defaults)


class TestSerde:
    def test_metadata_roundtrip(self):
        ev = _meta(custom_metadata=b"\x01\x00\x02ab")
        assert rlmm.deserialize_event(rlmm.serialize_event(ev)) == ev

    def test_update_roundtrip(self):
        ev = rlmm.RemoteLogSegmentMetadataUpdate(
            _sid(), 1_700_000_000_002, 7, rlmm.COPY_SEGMENT_FINISHED
        )
        assert rlmm.deserialize_event(rlmm.serialize_event(ev)) == ev

    def test_partition_delete_roundtrip(self):
        ev = rlmm.RemotePartitionDeleteMetadata(
            "events",
            hashlib.md5(b"topic:events").digest(),
            3,
            1_700_000_000_003,
            8,
            rlmm.DELETE_PARTITION_MARKED,
        )
        assert rlmm.deserialize_event(rlmm.serialize_event(ev)) == ev

    def test_golden_vector_update(self):
        """Pin the layout: envelope, compact string, raw uuids, fixed
        i64s, null bytes marker, state byte, empty tagged sections."""
        topic_id = bytes(range(16))
        seg_id = bytes(range(16, 32))
        ev = rlmm.RemoteLogSegmentMetadataUpdate(
            rlmm.RemoteLogSegmentId("t", topic_id, 1, seg_id),
            2,
            3,
            rlmm.COPY_SEGMENT_FINISHED,
        )
        expect = (
            b"\x00\x01\x00\x00"  # apiKey=1, version=0
            b"\x02t"  # compact string len+1=2, "t"
            + topic_id
            + b"\x00\x00\x00\x01"  # partition
            + b"\x00"  # TopicIdPartition tagged
            + seg_id
            + b"\x00"  # RemoteLogSegmentIdEntry tagged
            + (2).to_bytes(8, "big")  # event_timestamp_ms
            + (3).to_bytes(8, "big")  # broker_epoch
            + b"\x00"  # null custom metadata
            + b"\x01"  # state COPY_SEGMENT_FINISHED
            + b"\x00"  # record tagged
        )
        assert rlmm.serialize_event(ev) == expect

    def test_unknown_api_key_and_version_rejected(self):
        data = rlmm.serialize_event(_meta())
        with pytest.raises(ValueError, match="apiKey"):
            rlmm.deserialize_event(b"\x00\x63" + data[2:])
        with pytest.raises(ValueError, match="version"):
            rlmm.deserialize_event(data[:2] + b"\x00\x09" + data[4:])

    def test_trailing_and_truncated_bytes_rejected(self):
        data = rlmm.serialize_event(_meta())
        with pytest.raises(ValueError, match="trailing"):
            rlmm.deserialize_event(data + b"\x00")
        with pytest.raises(ValueError):
            rlmm.deserialize_event(data[:-3])

    def test_unknown_tagged_fields_skipped(self):
        """KIP-482: a reader must skip tags it doesn't know. Splice a
        tagged field into the record-level section."""
        ev = rlmm.RemoteLogSegmentMetadataUpdate(
            _sid(), 2, 3, rlmm.COPY_SEGMENT_FINISHED
        )
        data = bytearray(rlmm.serialize_event(ev))
        assert data[-1] == 0
        data[-1:] = b"\x01\x05\x02\xab\xcd"  # 1 field: tag 5, 2 bytes
        assert rlmm.deserialize_event(bytes(data)) == ev

    @settings(max_examples=60, deadline=None)
    @given(
        part=st.integers(0, 2**31 - 1),
        start=st.integers(0, 2**62),
        n=st.integers(0, 49),
        epochs=st.lists(
            st.tuples(
                st.integers(0, 2**31 - 1), st.integers(0, 2**62)
            ),
            min_size=1,
            max_size=5,
        ),
        size=st.integers(0, 2**31 - 1),
        custom=st.none() | st.binary(max_size=32),
        state=st.sampled_from(sorted(rlmm._SEGMENT_STATES)),
    )
    def test_metadata_roundtrip_property(
        self, part, start, n, epochs, size, custom, state
    ):
        ev = _meta(
            part=part,
            start_offset=start,
            end_offset=start + n,
            leader_epochs=tuple(epochs),
            segment_size=size,
            custom_metadata=custom,
            state=state,
        )
        assert rlmm.deserialize_event(rlmm.serialize_event(ev)) == ev


class TestTracker:
    def test_copy_lifecycle_and_live_view(self):
        tr = rlmm.RemoteLogMetadataTracker()
        m1 = _meta(part=0, seed=b"a")
        m2 = _meta(part=0, seed=b"b", start_offset=150, end_offset=199)
        tr.apply(m1)
        tr.apply(m2)
        assert tr.live_segments("events", 0) == []  # copies not finished
        tr.apply(
            rlmm.RemoteLogSegmentMetadataUpdate(
                m1.segment, 1, 7, rlmm.COPY_SEGMENT_FINISHED
            )
        )
        assert [m.start_offset for m in tr.live_segments("events", 0)] == [100]

    def test_update_for_unknown_segment_rejected(self):
        tr = rlmm.RemoteLogMetadataTracker()
        with pytest.raises(ValueError, match="unknown segment"):
            tr.apply(
                rlmm.RemoteLogSegmentMetadataUpdate(
                    _sid(), 1, 7, rlmm.COPY_SEGMENT_FINISHED
                )
            )

    def test_forward_only_transitions(self):
        tr = rlmm.RemoteLogMetadataTracker()
        m = _meta()
        tr.apply(m)
        tr.apply(
            rlmm.RemoteLogSegmentMetadataUpdate(
                m.segment, 1, 7, rlmm.COPY_SEGMENT_FINISHED
            )
        )
        with pytest.raises(ValueError, match="illegal state transition"):
            tr.apply(
                rlmm.RemoteLogSegmentMetadataUpdate(
                    m.segment, 2, 7, rlmm.COPY_SEGMENT_FINISHED
                )
            )

    def test_delete_finished_retires_segment(self):
        tr = rlmm.RemoteLogMetadataTracker()
        m = _meta()
        tr.apply(m)
        for s in (
            rlmm.COPY_SEGMENT_FINISHED,
            rlmm.DELETE_SEGMENT_STARTED,
            rlmm.DELETE_SEGMENT_FINISHED,
        ):
            tr.apply(
                rlmm.RemoteLogSegmentMetadataUpdate(m.segment, 1, 7, s)
            )
        assert tr.segments == {} and tr.states == {}

    def test_duplicate_metadata_rejected(self):
        tr = rlmm.RemoteLogMetadataTracker()
        tr.apply(_meta())
        with pytest.raises(ValueError, match="duplicate"):
            tr.apply(_meta())

    def test_update_custom_metadata_attached(self):
        """KIP-917: the plugin returns custom metadata at copy time and
        the broker persists it on the FINISHED update."""
        tr = rlmm.RemoteLogMetadataTracker()
        m = _meta()
        tr.apply(m)
        tr.apply(
            rlmm.RemoteLogSegmentMetadataUpdate(
                m.segment,
                1,
                7,
                rlmm.COPY_SEGMENT_FINISHED,
                custom_metadata=b"\x01\x00\x02ab",
            )
        )
        assert tr.segments[m.segment].custom_metadata == b"\x01\x00\x02ab"

    def test_partition_delete_tracked(self):
        tr = rlmm.RemoteLogMetadataTracker()
        tr.apply(
            rlmm.RemotePartitionDeleteMetadata(
                "events",
                hashlib.md5(b"topic:events").digest(),
                2,
                1,
                7,
                rlmm.DELETE_PARTITION_MARKED,
            )
        )
        assert tr.deleted_partitions[("events", 2)] == (
            rlmm.DELETE_PARTITION_MARKED
        )
