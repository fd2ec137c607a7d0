"""Chunk split / re-split.

Parity: ``transform/BaseTransformChunkEnumeration.java:29-98`` (fixed-size
split; chunk size 0 disables chunking = one chunk) and
``transform/BaseDetransformChunkEnumeration.java:39-120`` (re-split by
known transformed sizes, erroring on short streams).
"""

from __future__ import annotations

from typing import BinaryIO, Iterator


def split_chunks(stream: BinaryIO, chunk_size: int) -> Iterator[bytes]:
    """Yield fixed-size chunks; the last may be short; empty input yields
    one empty chunk (so every segment has >=1 chunk, matching the
    reference's min-one-chunk geometry)."""
    if chunk_size <= 0:
        yield stream.read()
        return
    first = True
    while True:
        chunk = stream.read(chunk_size)
        if not chunk:
            if first:
                yield b""
            return
        first = False
        yield chunk


def resplit_chunks(stream: BinaryIO, sizes: list[int]) -> Iterator[bytes]:
    """Yield chunks of exactly the given transformed sizes."""
    for i, size in enumerate(sizes):
        chunk = stream.read(size)
        if len(chunk) != size:
            raise EOFError(
                f"stream ended inside chunk {i}: wanted {size} bytes, got {len(chunk)}"
            )
        yield chunk
    if stream.read(1):
        raise ValueError("stream longer than the declared chunk sizes")
