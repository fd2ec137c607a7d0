"""Per-chunk compression codec.

Parity: ``transform/CompressionChunkEnumeration.java:26-64`` (each chunk
compressed independently so chunks stay independently fetchable) and the
skip-if-already-compressed heuristic of ``SegmentCompressionChecker.
java:31-54``.

Codec: zstd when available, else zlib (this container ships no zstd
binding; the interface pins the codec name into the manifest so readers
always use the writer's codec). On the Spark table path compression is
parquet-native zstd and none of this runs.
"""

from __future__ import annotations

from typing import Callable, Iterator

try:  # pragma: no cover - environment probe
    import zstandard as _zstd

    def _zstd_compress(data: bytes) -> bytes:
        return _zstd.ZstdCompressor().compress(data)

    def _zstd_decompress(data: bytes) -> bytes:
        return _zstd.ZstdDecompressor().decompress(data)

    HAVE_ZSTD = True
except ImportError:  # pragma: no cover
    HAVE_ZSTD = False

import zlib

CODECS: dict[str, tuple[Callable[[bytes], bytes], Callable[[bytes], bytes]]] = {
    "zlib": (lambda d: zlib.compress(d, 3), zlib.decompress),
}
if HAVE_ZSTD:  # pragma: no cover
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
