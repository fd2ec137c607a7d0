"""Per-chunk compression codec.

Parity: ``transform/CompressionChunkEnumeration.java:26-64`` (each chunk
compressed independently so chunks stay independently fetchable) and the
skip-if-already-compressed heuristic of ``SegmentCompressionChecker.
java:31-54``.

Codec preference: the `zstandard` binding when installed, else pyarrow's
bundled zstd (always present alongside pyspark), else zlib. The chunk
format prepends the original size as 4 bytes big-endian — the analog of
the reference's pledged content size (``CompressionChunkEnumeration.
java:52-62``) letting decompress pre-allocate exactly. The codec name is
pinned into the writer conf so readers always use the writer's codec.
On the Spark table path compression is parquet-native zstd and none of
this runs.
"""

from __future__ import annotations

import struct
from typing import Callable, Iterator

try:  # pragma: no cover - environment probe
    import zstandard as _zstd

    def _zstd_compress(data: bytes) -> bytes:
        return struct.pack(">I", len(data)) + _zstd.ZstdCompressor().compress(data)

    def _zstd_decompress(data: bytes) -> bytes:
        return _zstd.ZstdDecompressor().decompress(data[4:])

    HAVE_ZSTD = True
except ImportError:  # pragma: no cover
    try:
        import pyarrow as _pa

        _PA_ZSTD = _pa.Codec("zstd")

        def _zstd_compress(data: bytes) -> bytes:
            return struct.pack(">I", len(data)) + _PA_ZSTD.compress(
                data, asbytes=True
            )

        def _zstd_decompress(data: bytes) -> bytes:
            (size,) = struct.unpack(">I", data[:4])
            if size == 0:
                return b""
            return _PA_ZSTD.decompress(
                data[4:], decompressed_size=size, asbytes=True
            )

        HAVE_ZSTD = True
    except Exception:
        HAVE_ZSTD = False

import zlib

CODECS: dict[str, tuple[Callable[[bytes], bytes], Callable[[bytes], bytes]]] = {
    "zlib": (lambda d: zlib.compress(d, 3), zlib.decompress),
}
if HAVE_ZSTD:
    CODECS["zstd"] = (_zstd_compress, _zstd_decompress)

DEFAULT_CODEC = "zstd" if HAVE_ZSTD else "zlib"


def compress_chunks(chunks: Iterator[bytes], codec: str = DEFAULT_CODEC) -> Iterator[bytes]:
    comp, _ = CODECS[codec]
    for chunk in chunks:
        yield comp(chunk)


def decompress_chunks(chunks: Iterator[bytes], codec: str = DEFAULT_CODEC) -> Iterator[bytes]:
    _, decomp = CODECS[codec]
    for chunk in chunks:
        yield decomp(chunk)


def requires_compression(sample: bytes, codec: str = DEFAULT_CODEC, min_ratio: float = 0.9) -> bool:
    """Compression heuristic: compress a sample; if it doesn't shrink by
    at least (1 - min_ratio), the payload is likely already compressed —
    skip (the reference inspects the Kafka batch compression flag; a
    ratio probe is format-agnostic and costs one chunk)."""
    if not sample:
        return False
    comp, _ = CODECS[codec]
    return len(comp(sample)) < len(sample) * min_ratio


def segment_already_compressed(segment_head: bytes) -> bool | None:
    """Exact parity with `SegmentCompressionChecker.java:31-54`: inspect
    the FIRST record batch's compression attribute (Kafka v2 framing).
    Returns True/False when the head parses as a v2 batch, None when the
    payload isn't Kafka-framed (caller falls back to the ratio probe in
    `requires_compression`)."""
    try:
        import struct as _st

        if len(segment_head) < 22:
            return None
        magic = segment_head[16]
        if magic != 2:
            return None
        (attrs,) = _st.unpack_from(">h", segment_head, 21)
        return (attrs & 0x07) != 0
    except Exception:
        return None
