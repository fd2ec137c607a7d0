"""Chunk model and chunk indexes (fixed- and variable-size).

Behavioral parity with the reference's index math:
- ``core/.../Chunk.java:21-36`` — the 5-field chunk row;
- ``manifest/index/FixedSizeChunkIndex.java:45-122`` — pure arithmetic
  (O(1) memory): all transformed chunks share one size except the last;
- ``manifest/index/VariableSizeChunkIndex.java:49-116`` — explicit
  transformed-size list, positions = prefix sums;
- ``manifest/index/AbstractChunkIndex.java:75-123`` — offset→chunk and
  range→chunks planning.

Invariants (FIXTURES.md §5): positions are prefix sums of sizes; all
original sizes equal except possibly the last; fixed index ⇒ all
transformed sizes equal except the last. 64-bit positions throughout
(deliberate divergence from the reference's int bounds).
"""

from __future__ import annotations

from dataclasses import dataclass

from tiered_storage_for_apache_kafka_spark.storage.backend import BytesRange


@dataclass(frozen=True)
class Chunk:
    id: int
    original_position: int
    original_size: int
    transformed_position: int
    transformed_size: int

    @property
    def original_range(self) -> BytesRange:
        return BytesRange.of_size(self.original_position, self.original_size)

    @property
    def transformed_range(self) -> BytesRange:
        return BytesRange.of_size(self.transformed_position, self.transformed_size)


def _chunk_count(file_size: int, chunk_size: int) -> int:
    return max(1, -(-file_size // chunk_size)) if file_size > 0 else 1


class ChunkIndex:
    """Common planning logic over original-side geometry (original chunks
    are always fixed-size; only transformed sizes differ by subclass)."""

    def __init__(self, original_chunk_size: int, original_file_size: int):
        if original_chunk_size <= 0:
            raise ValueError("original_chunk_size must be positive")
        if original_file_size < 0:
            raise ValueError("original_file_size must be >= 0")
        self.original_chunk_size = original_chunk_size
        self.original_file_size = original_file_size
        self.count = _chunk_count(original_file_size, original_chunk_size)

    # -- original-side geometry ------------------------------------------------

    def original_position(self, chunk_id: int) -> int:
        return chunk_id * self.original_chunk_size

    def original_size(self, chunk_id: int) -> int:
        self._check_id(chunk_id)
        if chunk_id == self.count - 1:
            last = self.original_file_size - self.original_chunk_size * (self.count - 1)
            return last if last > 0 else self.original_file_size
        return self.original_chunk_size

    # -- transformed-side geometry (subclass) ----------------------------------

    def transformed_position(self, chunk_id: int) -> int:
        raise NotImplementedError

    def transformed_size(self, chunk_id: int) -> int:
        raise NotImplementedError

    # -- planning --------------------------------------------------------------

    def chunk_for_original_offset(self, offset: int) -> Chunk:
        """`AbstractChunkIndex.findChunkForOriginalOffset` analog."""
        if not (0 <= offset < self.original_file_size):
            raise ValueError(
                f"offset {offset} outside [0, {self.original_file_size})"
            )
        return self.chunk(min(offset // self.original_chunk_size, self.count - 1))

    def chunks_for_range(self, byte_range: BytesRange) -> list[Chunk]:
        """`AbstractChunkIndex.chunksForRange` analog: all chunks
        intersecting the inclusive original-byte range (clamped to file
        end, `RemoteStorageManager.java:141-144` semantics)."""
        if byte_range.from_pos >= self.original_file_size:
            raise ValueError(
                f"range start {byte_range.from_pos} beyond file size "
                f"{self.original_file_size}"
            )
        first = byte_range.from_pos // self.original_chunk_size
        last = min(byte_range.to_pos, self.original_file_size - 1) // self.original_chunk_size
        return [self.chunk(i) for i in range(first, min(last, self.count - 1) + 1)]

    def chunk(self, chunk_id: int) -> Chunk:
        self._check_id(chunk_id)
        return Chunk(
            id=chunk_id,
            original_position=self.original_position(chunk_id),
            original_size=self.original_size(chunk_id),
            transformed_position=self.transformed_position(chunk_id),
            transformed_size=self.transformed_size(chunk_id),
        )

    def chunks(self) -> list[Chunk]:
        return [self.chunk(i) for i in range(self.count)]

    def _check_id(self, chunk_id: int) -> None:
        if not (0 <= chunk_id < self.count):
            raise IndexError(f"chunk id {chunk_id} outside [0, {self.count})")


class FixedSizeChunkIndex(ChunkIndex):
    """Transformed sizes are deterministic (no compression): O(1) memory,
    positions by arithmetic — chosen by the transform pipeline when only
    encryption (fixed overhead per chunk) or nothing is applied
    (`TransformFinisher.java:75-93` selection logic)."""

    def __init__(
        self,
        original_chunk_size: int,
        original_file_size: int,
        transformed_chunk_size: int,
        final_transformed_chunk_size: int,
    ):
        super().__init__(original_chunk_size, original_file_size)
        self.transformed_chunk_size = transformed_chunk_size
        self.final_transformed_chunk_size = final_transformed_chunk_size

    def transformed_position(self, chunk_id: int) -> int:
        self._check_id(chunk_id)
        return chunk_id * self.transformed_chunk_size

    def transformed_size(self, chunk_id: int) -> int:
        self._check_id(chunk_id)
        if chunk_id == self.count - 1:
            return self.final_transformed_chunk_size
        return self.transformed_chunk_size

    def to_dict(self) -> dict:
        return {
            "type": "fixed",
            "originalChunkSize": self.original_chunk_size,
            "originalFileSize": self.original_file_size,
            "transformedChunkSize": self.transformed_chunk_size,
            "finalTransformedChunkSize": self.final_transformed_chunk_size,
        }


class VariableSizeChunkIndex(ChunkIndex):
    """Explicit per-chunk transformed sizes (compression makes sizes
    data-dependent); transformed positions are prefix sums."""

    def __init__(
        self,
        original_chunk_size: int,
        original_file_size: int,
        transformed_chunk_sizes: list[int],
    ):
        super().__init__(original_chunk_size, original_file_size)
        if len(transformed_chunk_sizes) != self.count:
            raise ValueError(
                f"expected {self.count} transformed sizes, got "
                f"{len(transformed_chunk_sizes)}"
            )
        self.transformed_chunk_sizes = list(transformed_chunk_sizes)
        # prefix sums, computed once
        self._positions = [0] * self.count
        for i in range(1, self.count):
            self._positions[i] = self._positions[i - 1] + self.transformed_chunk_sizes[i - 1]

    def transformed_position(self, chunk_id: int) -> int:
        self._check_id(chunk_id)
        return self._positions[chunk_id]

    def transformed_size(self, chunk_id: int) -> int:
        self._check_id(chunk_id)
        return self.transformed_chunk_sizes[chunk_id]

    def to_dict(self) -> dict:
        return {
            "type": "variable",
            "originalChunkSize": self.original_chunk_size,
            "originalFileSize": self.original_file_size,
            "transformedChunks": self.transformed_chunk_sizes,
        }


def chunk_index_from_dict(d: dict) -> ChunkIndex:
    if d["type"] == "fixed":
        return FixedSizeChunkIndex(
            d["originalChunkSize"],
            d["originalFileSize"],
            d["transformedChunkSize"],
            d["finalTransformedChunkSize"],
        )
    if d["type"] == "variable":
        return VariableSizeChunkIndex(
            d["originalChunkSize"], d["originalFileSize"], d["transformedChunks"]
        )
    raise ValueError(f"unknown chunk index type {d.get('type')!r}")
