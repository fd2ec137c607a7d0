"""Compact encoding for variable chunk-size lists.

Same on-the-wire idea as the reference's delta codec
(``manifest/index/serde/ChunkSizesBinaryCodec.java:98-203`` + README
§"Index encoding"): sizes cluster tightly around a base, so store
``count (4B) | base=min (4B) | bytes-per-value k (1B) | (n-1) debased
values (k bytes each) | last value (4B full)`` — ~1-2 bytes per chunk —
then deflate + base64 for JSON embedding.

Kept because manifests are JSON documents in object storage (not parquet
— parquet's own encodings subsume this for the `manifests` DataFrame).
"""

from __future__ import annotations

import base64
import struct
import zlib


def encode_chunk_sizes(sizes: list[int]) -> bytes:
    if not sizes:
        return struct.pack(">i", 0)
    n = len(sizes)
    head, last = sizes[:-1], sizes[-1]
    base = min(head) if head else 0
    max_debased = max((s - base for s in head), default=0)
    k = max(1, (max_debased.bit_length() + 7) // 8)
    out = bytearray(struct.pack(">iiB", n, base, k))
    for s in head:
        out += (s - base).to_bytes(k, "big")
    out += struct.pack(">i", last)
    return bytes(out)


def decode_chunk_sizes(data: bytes) -> list[int]:
    (n,) = struct.unpack_from(">i", data, 0)
    if n == 0:
        return []
    base, k = struct.unpack_from(">iB", data, 4)
    off = 9
    sizes = []
    for _ in range(n - 1):
        sizes.append(base + int.from_bytes(data[off : off + k], "big"))
        off += k
    (last,) = struct.unpack_from(">i", data, off)
    sizes.append(last)
    return sizes


def encode_chunk_sizes_b64(sizes: list[int]) -> str:
    return base64.b64encode(zlib.compress(encode_chunk_sizes(sizes), 6)).decode("ascii")


def decode_chunk_sizes_b64(s: str) -> list[int]:
    return decode_chunk_sizes(zlib.decompress(base64.b64decode(s)))
