"""Portable roaring-bitmap serialization (the public RoaringFormatSpec).

Iceberg v3 deletion vectors store deleted row positions as 64-bit
roaring bitmaps in the *portable* interoperable layout
(github.com/RoaringBitmap/RoaringFormatSpec), so every engine
(Java/Go/C/Rust) reads the same bytes. This module implements that
layout in numpy:

64-bit portable format:
    u64 LE  bucket count
    per bucket (ascending high keys):
        u32 LE  high 32 bits shared by the bucket's values
        <32-bit roaring bitmap serialization of the low 32 bits>

32-bit format (RoaringBitmap "standard" serialization, LE throughout):
    cookie u32: SERIAL_COOKIE_NO_RUNCONTAINER (12346) + u32 container
    count; or SERIAL_COOKIE (12347) | (count-1) << 16 followed by a
    (count+7)//8-byte run-flag bitset when run containers are present.
    Then per-container descriptive headers (u16 key, u16 cardinality-1),
    then u32 offsets (always for cookie 12346; for 12347 only when
    count >= 4), then container payloads:
      array  (cardinality <= 4096): sorted u16 values
      bitmap (cardinality >  4096): 8192 bytes (2^16 bits)
      run: u16 n_runs, then (u16 start, u16 length-1) pairs

The writer emits array/bitmap containers only (like most writers —
runs are an optional optimization); the reader accepts all three, so
bitmaps produced by other libraries load too.
"""

from __future__ import annotations

import struct

import numpy as np

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


def _serialize_32(values: np.ndarray) -> bytes:
    """32-bit roaring serialization of sorted unique uint32 values."""
    keys = (values >> 16).astype(np.uint32)
    out = bytearray()
    uniq, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(values)]
    n = len(uniq)
    out += struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, n)
    payloads: list[bytes] = []
    for i, key in enumerate(uniq):
        lows = (values[bounds[i] : bounds[i + 1]] & 0xFFFF).astype(np.uint16)
        card = len(lows)
        out += struct.pack("<HH", int(key), card - 1)
        if card <= _ARRAY_MAX:
            payloads.append(lows.astype("<u2").tobytes())
        else:
            bits = np.zeros(8192, dtype=np.uint8)
            np.bitwise_or.at(
                bits, lows >> 3, (1 << (lows & 7)).astype(np.uint8)
            )
            payloads.append(bits.tobytes())
    # offset header: byte position of each container from stream start
    pos = 8 + 4 * n + 4 * n  # cookie+count, headers, offsets
    for p in payloads:
        out += struct.pack("<I", pos)
        pos += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def _deserialize_32(buf: bytes, off: int) -> tuple[np.ndarray, int]:
    """Parse one 32-bit roaring bitmap at ``off``; returns (sorted
    uint32 values, bytes consumed)."""
    start = off
    (cookie,) = struct.unpack_from("<I", buf, off)
    run_flags = b""
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        off += 4
        nflag = (n + 7) // 8
        run_flags = buf[off : off + nflag]
        off += nflag
        has_offsets = n >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        (n,) = struct.unpack_from("<I", buf, off + 4)
        off += 8
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")
    headers = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, off)
        off += 4
        headers.append((key, card_m1 + 1))
    if has_offsets:
        off += 4 * n  # reader walks sequentially; offsets are redundant
    parts = []
    for i, (key, card) in enumerate(headers):
        is_run = bool(run_flags) and bool(run_flags[i >> 3] & (1 << (i & 7)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, off)
            off += 2
            runs = np.frombuffer(buf, "<u2", n_runs * 2, off).reshape(-1, 2)
            off += 4 * n_runs
            # int() the u16 scalars: under NEP-50 promotion (numpy 2.x)
            # uint16 + python-int stays uint16, so a run ending at 65535
            # would wrap the arange stop to 0 and drop the whole run
            lows = np.concatenate(
                [
                    np.arange(int(s), int(s) + int(l) + 1, dtype=np.uint32)
                    for s, l in runs
                ]
            ) if n_runs else np.empty(0, np.uint32)
        elif card <= _ARRAY_MAX:
            lows = np.frombuffer(buf, "<u2", card, off).astype(np.uint32)
            off += 2 * card
        else:
            bits = np.frombuffer(buf, np.uint8, 8192, off)
            off += 8192
            lows = np.flatnonzero(
                np.unpackbits(bits, bitorder="little")
            ).astype(np.uint32)
        parts.append((np.uint32(key) << np.uint32(16)) | lows.astype(np.uint32))
    values = (
        np.concatenate(parts) if parts else np.empty(0, np.uint32)
    )
    return values, off - start


def serialize_roaring64(positions: np.ndarray) -> bytes:
    """Portable 64-bit roaring bytes from a (not necessarily sorted)
    array of non-negative int64/uint64 positions."""
    vals = np.unique(np.asarray(positions, dtype=np.uint64))
    highs = (vals >> np.uint64(32)).astype(np.uint32)
    out = bytearray()
    uniq, starts = np.unique(highs, return_index=True)
    bounds = list(starts) + [len(vals)]
    out += struct.pack("<Q", len(uniq))
    for i, hi in enumerate(uniq):
        lows32 = (vals[bounds[i] : bounds[i + 1]] & np.uint64(0xFFFFFFFF)).astype(
            np.uint32
        )
        out += struct.pack("<I", int(hi))
        out += _serialize_32(lows32)
    return bytes(out)


def deserialize_roaring64(buf: bytes) -> np.ndarray:
    """Sorted uint64 positions from portable 64-bit roaring bytes."""
    (n_buckets,) = struct.unpack_from("<Q", buf, 0)
    off = 8
    parts = []
    for _ in range(n_buckets):
        (hi,) = struct.unpack_from("<I", buf, off)
        off += 4
        lows, used = _deserialize_32(buf, off)
        off += used
        parts.append((np.uint64(hi) << np.uint64(32)) | lows.astype(np.uint64))
    if off != len(buf):
        raise ValueError(
            f"trailing bytes after roaring64 payload ({len(buf) - off})"
        )
    return np.concatenate(parts) if parts else np.empty(0, np.uint64)
