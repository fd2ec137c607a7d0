"""Segment custom-metadata serde — Kafka-protocol tagged fields (W13).

Parity: the reference returns the broker an ``Optional<CustomMetadata>``
whose bytes are a Kafka protocol ``TaggedFields`` section holding
``remote_size`` (VARLONG, tag 0), ``object_prefix`` (COMPACT_STRING,
tag 1) and ``object_key`` (COMPACT_STRING, tag 2) —
`metadata/SegmentCustomMetadataField.java:30-64` (the tag indexes are a
compatibility contract), `SegmentCustomMetadataSerde.java`. This module
implements the same public wire format (KIP-482 tagged fields):

    num_tagged_fields : unsigned varint
    per field, ascending tag:
        tag   : unsigned varint
        size  : unsigned varint        (byte length of the payload)
        value : VARLONG (zigzag uvarint) for tag 0,
                COMPACT_STRING (uvarint(len+1) + utf8) for tags 1-2

so a broker-side reader of the reference's metadata can decode this
engine's bytes and vice versa.
"""

from __future__ import annotations

REMOTE_SIZE = 0  # VARLONG
OBJECT_PREFIX = 1  # COMPACT_STRING
OBJECT_KEY = 2  # COMPACT_STRING

_STRING_TAGS = {OBJECT_PREFIX, OBJECT_KEY}
_KNOWN_TAGS = {REMOTE_SIZE} | _STRING_TAGS


def _write_uvarint(out: bytearray, n: int) -> None:
    if n < 0:
        raise ValueError("uvarint cannot encode negatives")
    while (n & ~0x7F) != 0:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _read_uvarint(buf: bytes, off: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        if off >= len(buf):
            raise ValueError("truncated uvarint in custom metadata")
        b = buf[off]
        off += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, off
        shift += 7
        if shift > 63:
            raise ValueError("uvarint too long in custom metadata")


def _encode_value(tag: int, value) -> bytes:
    out = bytearray()
    if tag == REMOTE_SIZE:
        n = int(value)
        if not -(2**63) <= n < 2**63:
            raise ValueError("VARLONG value outside 64-bit signed range")
        # zigzag varint — the same wire primitive the Kafka batch codec
        # uses; reuse it rather than keeping a third copy in the repo
        from tiered_storage_for_apache_kafka_spark.kafka_wire import (
            _write_varint,
        )

        _write_varint(out, n)
    elif tag in _STRING_TAGS:
        raw = str(value).encode("utf-8")
        _write_uvarint(out, len(raw) + 1)  # COMPACT_STRING: len + 1
        out += raw
    else:
        raise ValueError(f"unknown custom-metadata tag {tag}")
    return bytes(out)


def _decode_value(tag: int, payload: bytes):
    if tag == REMOTE_SIZE:
        from tiered_storage_for_apache_kafka_spark.kafka_wire import _read_varint

        try:
            value, off = _read_varint(payload, 0)
        except IndexError as e:
            raise ValueError("truncated VARLONG payload") from e
        if off != len(payload):
            raise ValueError("trailing bytes in VARLONG payload")
        return value
    n_plus_1, off = _read_uvarint(payload, 0)
    raw = payload[off:]
    if len(raw) != n_plus_1 - 1:
        raise ValueError("COMPACT_STRING length mismatch")
    return raw.decode("utf-8")


def serialize_custom_metadata(fields: dict[int, object]) -> bytes:
    """dict keyed by tag index -> tagged-fields bytes; empty dict ->
    empty bytes (`SegmentCustomMetadataSerde.serialize`)."""
    if not fields:
        return b""
    unknown = set(fields) - _KNOWN_TAGS
    if unknown:
        raise ValueError(f"unknown custom-metadata tags {sorted(unknown)}")
    out = bytearray()
    _write_uvarint(out, len(fields))
    for tag in sorted(fields):  # spec: ascending tag order
        payload = _encode_value(tag, fields[tag])
        _write_uvarint(out, tag)
        _write_uvarint(out, len(payload))
        out += payload
    return bytes(out)


def deserialize_custom_metadata(data: bytes) -> dict[int, object]:
    """Inverse of :func:`serialize_custom_metadata`; unknown tags are
    preserved as raw bytes (tagged-fields forward compatibility)."""
    if not data:
        return {}
    n, off = _read_uvarint(data, 0)
    out: dict[int, object] = {}
    prev_tag = -1
    for _ in range(n):
        tag, off = _read_uvarint(data, off)
        if tag <= prev_tag:
            raise ValueError("tagged fields out of order")
        prev_tag = tag
        size, off = _read_uvarint(data, off)
        payload = data[off : off + size]
        if len(payload) != size:
            raise ValueError("truncated tagged-field payload")
        off += size
        if tag in _KNOWN_TAGS:
            out[tag] = _decode_value(tag, payload)
        else:
            out[tag] = payload  # forward compatibility: keep raw
    if off != len(data):
        raise ValueError("trailing bytes after tagged fields")
    return out
