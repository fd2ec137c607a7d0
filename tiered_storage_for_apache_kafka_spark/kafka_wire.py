"""Kafka RecordBatch v2 (magic 2) wire codec — the real on-disk format.

SURVEY.md §7.4 hard-part 1: the reference re-encodes byte-exact Kafka
batches on the Iceberg-mode fetch path (`BatchEnumeration.java:46-235`,
restoring magic/compression/timestamp-type/producer info). This module
implements the public Kafka record-batch v2 layout (KIP-98 format, as
documented in the Kafka protocol guide) in pure Python so segments
holding *authentic* Kafka batches round-trip byte-exactly through the
tiering engine:

    RecordBatch =>
      baseOffset:           int64
      batchLength:          int32   (bytes after this field)
      partitionLeaderEpoch: int32
      magic:                int8    (=2)
      crc:                  uint32  (CRC32C of everything after this field)
      attributes:           int16
      lastOffsetDelta:      int32
      baseTimestamp:        int64
      maxTimestamp:         int64
      producerId:           int64
      producerEpoch:        int16
      baseSequence:         int32
      recordCount:          int32
      records:              [Record]     (uncompressed when attributes&7==0)

    Record =>  (all varints zigzag-encoded)
      length: varint, attributes: int8, timestampDelta: varlong,
      offsetDelta: varint, keyLength: varint (-1 null), key,
      valueLength: varint (-1 null), value,
      headerCount: varint, [headerKeyLen, headerKey, headerValLen, headerVal]

Control/transactional batches (attributes bits 0x20/0x10) decode and
re-encode byte-exactly like any other batch — the record layout is
identical; only the key/value payloads carry the transaction marker.
The reference *skips* them during record enumeration
(`BatchEnumeration.java:84,102`) but must still carry their bytes; we
match that: :func:`data_batches` filters them for consumers, while the
byte path preserves them, and :func:`parse_control_record` decodes the
COMMIT/ABORT marker for anyone who wants it.
CRC32C (Castagnoli) is implemented with a table here because the Python
stdlib only ships zlib's CRC32 (IEEE).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

MAGIC_V2 = 2
_HEADER = struct.Struct(">qiib")  # baseOffset, batchLength, leaderEpoch, magic
_CRC = struct.Struct(">I")
_META = struct.Struct(">hiqqqhii")  # attrs, lastOffsetDelta, baseTs, maxTs,
#                                     producerId, producerEpoch, baseSeq, count

# -- CRC32C (Castagnoli), reflected, poly 0x1EDC6F41 --------------------------

_CRC32C_TABLE: list[int] = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def _crc32c_py(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = (_CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)) & 0xFFFFFFFF
    return crc ^ 0xFFFFFFFF


# The per-byte table loop is ~MB/s — a throughput cliff on the byte-exact
# tiering round-trip that checksums every batch payload. Prefer an
# accelerated implementation when one is installed (C/SSE4.2-backed),
# keeping the pure-Python table loop as the dependency-free fallback.
try:  # `crc32c` package (ICRAR)
    import crc32c as _crc32c_mod

    def crc32c(data: bytes, crc: int = 0) -> int:
        return _crc32c_mod.crc32c(data, crc)

except ImportError:
    try:  # google-crc32c
        import google_crc32c as _gcrc

        def crc32c(data: bytes, crc: int = 0) -> int:
            return _gcrc.extend(crc, data)

    except ImportError:
        crc32c = _crc32c_py


# -- zigzag varints (Kafka encodes all record-level ints this way) ------------


def _write_varint(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)
    while (n & ~0x7F) != 0:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _read_varint(buf: bytes, off: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[off]
        off += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), off


@dataclass(frozen=True)
class KafkaRecord:
    offset_delta: int
    timestamp_delta: int
    key: bytes | None
    value: bytes | None
    headers: tuple[tuple[str, bytes | None], ...] = ()


@dataclass
class KafkaBatch:
    base_offset: int
    base_timestamp: int
    records: list[KafkaRecord]
    partition_leader_epoch: int = -1
    attributes: int = 0
    producer_id: int = -1
    producer_epoch: int = -1
    base_sequence: int = -1
    max_timestamp: int = field(default=-1)  # -1 → computed from records

    @property
    def is_transactional(self) -> bool:
        return bool(self.attributes & 0x10)

    @property
    def is_control(self) -> bool:
        return bool(self.attributes & 0x20)


def encode_kafka_batch(batch: KafkaBatch) -> bytes:
    if not batch.records:
        raise ValueError("batch must contain records")
    body = bytearray()
    for r in batch.records:
        rec = bytearray()
        rec.append(0)  # record attributes (unused)
        _write_varint(rec, r.timestamp_delta)
        _write_varint(rec, r.offset_delta)
        for payload in (r.key, r.value):
            if payload is None:
                _write_varint(rec, -1)
            else:
                _write_varint(rec, len(payload))
                rec += payload
        _write_varint(rec, len(r.headers))
        for hk, hv in r.headers:
            hk_b = hk.encode("utf-8")
            _write_varint(rec, len(hk_b))
            rec += hk_b
            if hv is None:
                _write_varint(rec, -1)
            else:
                _write_varint(rec, len(hv))
                rec += hv
        _write_varint(body, len(rec))
        body += rec

    stored_body = bytes(body)
    codec = batch.attributes & 0x07
    if codec:
        stored_body = _compress_records(codec, stored_body)
    last_delta = batch.records[-1].offset_delta
    max_ts = batch.max_timestamp
    if max_ts < 0:
        max_ts = batch.base_timestamp + max(
            r.timestamp_delta for r in batch.records
        )
    meta = _META.pack(
        batch.attributes,
        last_delta,
        batch.base_timestamp,
        max_ts,
        batch.producer_id,
        batch.producer_epoch,
        batch.base_sequence,
        len(batch.records),
    )
    crc_payload = meta + stored_body
    crc = crc32c(crc_payload)
    # batchLength counts bytes after the batchLength field itself
    batch_length = 4 + 1 + 4 + len(crc_payload)  # epoch + magic + crc + payload
    return (
        _HEADER.pack(batch.base_offset, batch_length,
                     batch.partition_leader_epoch, MAGIC_V2)
        + _CRC.pack(crc)
        + crc_payload
    )


def decode_kafka_batches(buf: bytes) -> list[tuple[KafkaBatch, int]]:
    """Parse concatenated v2 batches: [(batch, batch_byte_offset)].
    Verifies CRC32C and magic. Control batches parse like data batches
    (`batch.is_control` flags them); record enumeration should go
    through :func:`data_batches` to skip them, as the broker's
    consumers and the reference's enumeration do."""
    out: list[tuple[KafkaBatch, int]] = []
    off = 0
    while off < len(buf):
        start = off
        base_offset, batch_length, leader_epoch, magic = _HEADER.unpack_from(buf, off)
        off += _HEADER.size
        if magic != MAGIC_V2:
            raise ValueError(f"unsupported magic {magic} at {start}")
        (crc,) = _CRC.unpack_from(buf, off)
        off += 4
        payload_end = start + 8 + 4 + batch_length
        payload = buf[off:payload_end]
        if crc32c(payload) != crc:
            raise ValueError(f"CRC mismatch in batch at {start}")
        (attrs, last_delta, base_ts, max_ts, pid, pepoch, bseq, count) = (
            _META.unpack_from(payload, 0)
        )
        codec = attrs & 0x07
        if codec:
            payload = payload[: _META.size] + _decompress_records(
                codec, payload[_META.size :]
            )
        records: list[KafkaRecord] = []
        p = _META.size
        for _ in range(count):
            rec_len, p = _read_varint(payload, p)
            rec_end = p + rec_len
            p += 1  # record attributes
            ts_delta, p = _read_varint(payload, p)
            off_delta, p = _read_varint(payload, p)
            n, p = _read_varint(payload, p)
            key = None if n < 0 else bytes(payload[p : p + max(n, 0)])
            p += max(n, 0)
            n, p = _read_varint(payload, p)
            value = None if n < 0 else bytes(payload[p : p + max(n, 0)])
            p += max(n, 0)
            n_headers, p = _read_varint(payload, p)
            headers = []
            for _h in range(n_headers):
                n, p = _read_varint(payload, p)
                hk = bytes(payload[p : p + n]).decode("utf-8")
                p += n
                n, p = _read_varint(payload, p)
                hv = None if n < 0 else bytes(payload[p : p + max(n, 0)])
                p += max(n, 0)
                headers.append((hk, hv))
            if p != rec_end:
                raise ValueError(f"record length mismatch at {p} != {rec_end}")
            records.append(
                KafkaRecord(off_delta, ts_delta, key, value, tuple(headers))
            )
        batch = KafkaBatch(
            base_offset=base_offset,
            base_timestamp=base_ts,
            records=records,
            partition_leader_epoch=leader_epoch,
            attributes=attrs,
            producer_id=pid,
            producer_epoch=pepoch,
            base_sequence=bseq,
            max_timestamp=max_ts,
        )
        out.append((batch, start))
        off = payload_end
    return out


# -- control / transactional batches (attributes bits 4-5) --------------------

CONTROL_ABORT, CONTROL_COMMIT = 0, 1


def parse_control_record(key: bytes | None) -> tuple[int, int]:
    """Decode a control record key → (version, type); type is
    CONTROL_ABORT (0) or CONTROL_COMMIT (1). The key layout is
    version:int16, type:int16 (KIP-98 ControlRecordType)."""
    if key is None or len(key) < 4:
        raise ValueError("control record key too short")
    version, ctype = struct.unpack_from(">hh", key, 0)
    return version, ctype


def data_batches(
    batches: list[tuple[KafkaBatch, int]],
) -> list[tuple[KafkaBatch, int]]:
    """Record-enumeration view: drop control batches (transaction
    COMMIT/ABORT markers), exactly as the broker's read path and the
    reference's `BatchEnumeration.java:84,102` do. The byte path keeps
    them — a tiered segment's bytes round-trip with markers intact."""
    return [(b, off) for b, off in batches if not b.is_control]


# -- batch compression (attributes bits 0-2) ----------------------------------
# 1=gzip, 2=snappy (xerial block framing, as the Java clients write it),
# 3=lz4 (LZ4 frame), 4=zstd. The records section is compressed as one unit;
# the CRC covers the *stored* (compressed) bytes, so decode verifies before
# decompressing — same order as the broker.

_CODEC_GZIP, _CODEC_SNAPPY, _CODEC_LZ4, _CODEC_ZSTD = 1, 2, 3, 4

# Xerial SnappyOutputStream framing (org.xerial.snappy, what Kafka's Java
# producer wraps snappy batches in): 16-byte header = magic "\x82SNAPPY\0"
# + version:int32 + compatible-version:int32 (both 1, big-endian), then
# blocks of [compressedLength:int32][raw-snappy block], 32 KiB of
# uncompressed data per block.
_XERIAL_MAGIC = b"\x82SNAPPY\x00"
_XERIAL_HEADER = _XERIAL_MAGIC + struct.pack(">ii", 1, 1)
_XERIAL_BLOCK = 32 * 1024


def _snappy_uncompressed_len(block: bytes) -> int:
    """Raw snappy blocks lead with the uncompressed length as a
    little-endian base-128 varint (the snappy format preamble)."""
    n = shift = 0
    for b in block:
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n
        shift += 7
        if shift > 35:
            break
    raise ValueError("malformed snappy length preamble")


def _xerial_compress(body: bytes) -> bytes:
    import pyarrow as _pa

    c = _pa.Codec("snappy")
    out = bytearray(_XERIAL_HEADER)
    for i in range(0, len(body), _XERIAL_BLOCK):
        block = c.compress(body[i : i + _XERIAL_BLOCK], asbytes=True)
        out += struct.pack(">i", len(block))
        out += block
    return bytes(out)


def _xerial_decompress(body: bytes) -> bytes:
    import pyarrow as _pa

    if body[: len(_XERIAL_MAGIC)] != _XERIAL_MAGIC:
        raise ValueError("snappy batch missing xerial magic")
    c = _pa.Codec("snappy")
    out = bytearray()
    off = 16  # magic + version + compatible version
    while off < len(body):
        if off + 4 > len(body):
            raise ValueError("truncated xerial snappy block length")
        (clen,) = struct.unpack_from(">i", body, off)
        off += 4
        block = body[off : off + clen]
        if len(block) != clen:
            raise ValueError("truncated xerial snappy block")
        out += c.decompress(
            block,
            decompressed_size=_snappy_uncompressed_len(block),
            asbytes=True,
        )
        off += clen
    return bytes(out)


def _compress_records(codec: int, body: bytes) -> bytes:
    if codec == _CODEC_GZIP:
        import gzip as _gz

        return _gz.compress(body, mtime=0)  # mtime=0 → deterministic bytes
    if codec == _CODEC_LZ4:
        import pyarrow as _pa

        return _pa.Codec("lz4_frame").compress(body, asbytes=True)
    if codec == _CODEC_ZSTD:
        import pyarrow as _pa

        return _pa.Codec("zstd").compress(body, asbytes=True)
    if codec == _CODEC_SNAPPY:
        return _xerial_compress(body)
    raise ValueError(f"unknown compression codec {codec}")


def _decompress_records(codec: int, body: bytes) -> bytes:
    if codec == _CODEC_GZIP:
        import gzip as _gz

        return _gz.decompress(body)
    if codec in (_CODEC_LZ4, _CODEC_ZSTD):
        import pyarrow as _pa

        # streaming decode — frame formats don't always declare content
        # size, and the broker decodes them streaming too
        name = "lz4" if codec == _CODEC_LZ4 else "zstd"
        with _pa.input_stream(_pa.py_buffer(body), compression=name) as f:
            return f.read()
    if codec == _CODEC_SNAPPY:
        return _xerial_decompress(body)
    raise ValueError(f"unknown compression codec {codec}")
