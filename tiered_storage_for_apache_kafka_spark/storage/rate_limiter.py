"""Upload rate limiting: token bucket wrapping a byte stream.

Parity: ``transform/RateLimitedInputStream.java:33-86`` — bucket capacity
= bytes/s, greedy refill once per second, minimum draw 16 KiB, unused
tokens refunded when a read returns fewer bytes than requested.
"""

from __future__ import annotations

import io
import threading
import time
from typing import BinaryIO

MIN_RATE = 16 * 1024


class TokenBucket:
    def __init__(self, bytes_per_second: int):
        if bytes_per_second < MIN_RATE:
            raise ValueError(f"rate must be >= {MIN_RATE} B/s")
        self.capacity = bytes_per_second
        self._tokens = float(bytes_per_second)
        self._last = time.monotonic()
        self._lock = threading.Lock()

    def _refill(self) -> None:
        now = time.monotonic()
        elapsed = now - self._last
        if elapsed > 0:
            self._tokens = min(self.capacity, self._tokens + elapsed * self.capacity)
            self._last = now

    def consume(self, n: int) -> None:
        """Block until n tokens are available, then take them."""
        while True:
            with self._lock:
                self._refill()
                if self._tokens >= n:
                    self._tokens -= n
                    return
                deficit = n - self._tokens
            time.sleep(min(deficit / self.capacity, 1.0))

    def refund(self, n: int) -> None:
        with self._lock:
            self._tokens = min(self.capacity, self._tokens + n)


class RateLimitedStream:
    """Read-through wrapper drawing tokens per read (refunding short reads)."""

    def __init__(self, data: BinaryIO | bytes, bucket: TokenBucket):
        self._f = io.BytesIO(data) if isinstance(data, (bytes, bytearray)) else data
        self._bucket = bucket

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            chunks = []
            while True:
                c = self.read(1024 * 1024)
                if not c:
                    return b"".join(chunks)
                chunks.append(c)
        if n == 0:
            return b""
        # draw at most one bucket's worth per read; callers see a short
        # read and loop (copyfileobj semantics)
        draw = min(max(n, 0), self._bucket.capacity)
        self._bucket.consume(draw)
        data = self._f.read(draw)
        if len(data) < draw:
            self._bucket.refund(draw - len(data))
        return data

    def close(self) -> None:
        self._f.close()
