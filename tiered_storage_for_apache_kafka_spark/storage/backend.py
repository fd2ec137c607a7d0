"""Storage backend protocol and byte-range model.

Behavioral parity with the reference's ``storage/core`` interfaces
(``StorageBackend.java:24``, ``BytesRange.java:26-113``) with one
deliberate upgrade: positions are 64-bit throughout (the reference is
int-bounded, capping segments at 2 GiB — SURVEY.md §7.4 hard-part 5).
"""

from __future__ import annotations

import io
from dataclasses import dataclass
from typing import BinaryIO, Iterable, Protocol, runtime_checkable


class StorageBackendError(Exception):
    """Base error for storage operations."""


class KeyNotFoundError(StorageBackendError):
    """The requested object key does not exist."""


class InvalidRangeError(StorageBackendError):
    """The requested byte range is malformed or outside the object."""


@dataclass(frozen=True)
class BytesRange:
    """Inclusive [from_pos, to_pos] byte range (reference semantics:
    ``BytesRange.java`` is inclusive on both ends), 64-bit positions."""

    from_pos: int
    to_pos: int

    def __post_init__(self) -> None:
        if self.from_pos < 0:
            raise InvalidRangeError(f"from_pos must be >= 0, got {self.from_pos}")
        if self.to_pos < self.from_pos:
            raise InvalidRangeError(
                f"to_pos ({self.to_pos}) must be >= from_pos ({self.from_pos})"
            )

    @property
    def size(self) -> int:
        return self.to_pos - self.from_pos + 1

    @classmethod
    def of_size(cls, from_pos: int, size: int) -> "BytesRange":
        if size <= 0:
            raise InvalidRangeError(f"size must be positive, got {size}")
        return cls(from_pos, from_pos + size - 1)


@runtime_checkable
class StorageBackend(Protocol):
    """Minimal object-store surface the engine needs (upload / ranged
    fetch / delete / list) — the pluggable point mirrored from
    ``RemoteStorageManagerConfig.java:144-150``."""

    def upload(self, key: str, data: BinaryIO | bytes) -> int:
        """Store object; returns bytes written."""
        ...

    def fetch(self, key: str, byte_range: BytesRange | None = None) -> BinaryIO:
        """Open object (optionally a ranged read). Raises KeyNotFoundError."""
        ...

    def delete(self, keys: Iterable[str]) -> None:
        """Best-effort batch delete (missing keys are not an error)."""
        ...

    def list_keys(self, prefix: str = "") -> list[str]:
        """All keys under prefix (for tests / GC jobs)."""
        ...


def as_stream(data: BinaryIO | bytes) -> BinaryIO:
    if isinstance(data, (bytes, bytearray, memoryview)):
        return io.BytesIO(bytes(data))
    return data
