"""Local-filesystem storage backend.

Parity: ``storage/filesystem/.../FileSystemStorage.java:37-124`` — atomic
writes, ranged reads, parent-directory GC on delete. Used as the test
backend for the full copy→fetch→delete matrix (the reference does the
same in its integration tests).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from pathlib import Path
from typing import BinaryIO, Iterable

from tiered_storage_for_apache_kafka_spark.storage.backend import (
    BytesRange,
    InvalidRangeError,
    KeyNotFoundError,
    as_stream,
)


class _BoundedReader:
    """File wrapper limited to a byte window (lazy; no full read)."""

    def __init__(self, f: BinaryIO, remaining: int):
        self._f = f
        self._remaining = remaining

    def read(self, n: int = -1) -> bytes:
        if self._remaining <= 0:
            return b""
        if n is None or n < 0 or n > self._remaining:
            n = self._remaining
        data = self._f.read(n)
        self._remaining -= len(data)
        return data

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FileSystemStorage:
    def __init__(self, root: str | Path, overwrite_enabled: bool = True):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.overwrite_enabled = overwrite_enabled

    def _path(self, key: str) -> Path:
        p = (self.root / key).resolve()
        if self.root.resolve() not in p.parents and p != self.root.resolve():
            raise InvalidRangeError(f"key {key!r} escapes storage root")
        return p

    def upload(self, key: str, data: BinaryIO | bytes) -> int:
        path = self._path(key)
        if path.exists() and not self.overwrite_enabled:
            raise FileExistsError(f"object {key!r} already exists")
        path.parent.mkdir(parents=True, exist_ok=True)
        stream = as_stream(data)
        # write to a temp file in the same dir, then atomic rename — the
        # same crash-safety the reference's DiskChunkCache uses
        # (DiskChunkCache.java:70-87 ATOMIC_MOVE).
        fd, tmp = tempfile.mkstemp(dir=path.parent, prefix=".upload-")
        written = 0
        try:
            with os.fdopen(fd, "wb") as out:
                shutil.copyfileobj(stream, out)
                written = out.tell()
            os.replace(tmp, path)
        except BaseException:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass
            raise
        return written

    def fetch(self, key: str, byte_range: BytesRange | None = None) -> BinaryIO:
        path = self._path(key)
        try:
            size = path.stat().st_size
        except FileNotFoundError:
            raise KeyNotFoundError(key) from None
        f = open(path, "rb")
        if byte_range is None:
            return f
        if byte_range.from_pos >= size:
            f.close()
            raise InvalidRangeError(
                f"range start {byte_range.from_pos} beyond object size {size}"
            )
        f.seek(byte_range.from_pos)
        # clamp end to object size (reference clamps at the RSM layer,
        # RemoteStorageManager.java:141-144)
        end = min(byte_range.to_pos, size - 1)
        return _BoundedReader(f, end - byte_range.from_pos + 1)  # type: ignore[return-value]

    def delete(self, keys: Iterable[str]) -> None:
        for key in keys:
            path = self._path(key)
            try:
                path.unlink()
            except FileNotFoundError:
                continue
            # GC empty parent dirs up to the root (FileSystemStorage.java:100-113)
            parent = path.parent
            while parent != self.root and not any(parent.iterdir()):
                parent.rmdir()
                parent = parent.parent

    def list_keys(self, prefix: str = "") -> list[str]:
        out = []
        for p in self.root.rglob("*"):
            if p.is_file():
                key = str(p.relative_to(self.root))
                if key.startswith(prefix) and not p.name.startswith(".upload-"):
                    out.append(key)
        return sorted(out)
