"""S3 storage backend (boto3).

Parity: ``storage/s3/.../S3Storage.java:45-186`` and
``S3UploadOutputStream.java:52-270``:
- multipart upload above the part size (default 25 MiB,
  `S3StorageConfig.java:72`), abort on failure;
- ranged GET via the HTTP Range header (`bytes=from-to`, inclusive,
  `S3Storage.java:168-169`);
- batched DeleteObjects, 1000 keys per request (`S3Storage.java:46,90-123`).

The client is injectable so the backend is testable without a live
endpoint; in production pass nothing and boto3 resolves credentials/
region the standard way. On executors each task builds its own backend
(clients are not picklable) — see `sources/segment_source.py`.
"""

from __future__ import annotations

import io
from typing import BinaryIO, Iterable

from tiered_storage_for_apache_kafka_spark.storage.backend import (
    BytesRange,
    KeyNotFoundError,
    StorageBackendError,
    as_stream,
)

DEFAULT_PART_SIZE = 25 * 1024 * 1024
DELETE_BATCH = 1000


class S3Storage:
    def __init__(
        self,
        bucket: str,
        client=None,
        part_size: int = DEFAULT_PART_SIZE,
        endpoint_url: str | None = None,
        region: str | None = None,
        proxy: str | None = None,
    ):
        """`proxy` accepts an http(s) or socks5 URL (optionally with
        user:pass@) — parity with the reference's per-backend SOCKS5
        proxy option (`storage/core/.../proxy/ProxyConfig.java`,
        `Socks5ProxyAuthenticator.java`)."""
        if client is None:
            import boto3
            from botocore.config import Config

            cfg = (
                Config(proxies={"http": proxy, "https": proxy})
                if proxy
                else None
            )
            client = boto3.client(
                "s3", endpoint_url=endpoint_url, region_name=region, config=cfg
            )
        self.bucket = bucket
        self.client = client
        self.part_size = max(part_size, 5 * 1024 * 1024)

    def upload(self, key: str, data: BinaryIO | bytes) -> int:
        stream = as_stream(data)
        first = stream.read(self.part_size)
        second = stream.read(1)
        if not second:
            # single-part fast path
            self.client.put_object(Bucket=self.bucket, Key=key, Body=first)
            return len(first)
        return self._multipart(key, first, second, stream)

    def _multipart(self, key: str, first: bytes, second: bytes, stream: BinaryIO) -> int:
        mp = self.client.create_multipart_upload(Bucket=self.bucket, Key=key)
        upload_id = mp["UploadId"]
        written = 0
        parts = []
        try:
            buf = second + stream.read(self.part_size - len(second))
            part_number = 1
            body: bytes | None = first
            while body:
                resp = self.client.upload_part(
                    Bucket=self.bucket,
                    Key=key,
                    UploadId=upload_id,
                    PartNumber=part_number,
                    Body=body,
                )
                parts.append({"PartNumber": part_number, "ETag": resp["ETag"]})
                written += len(body)
                part_number += 1
                body, buf = buf, stream.read(self.part_size)
            self.client.complete_multipart_upload(
                Bucket=self.bucket,
                Key=key,
                UploadId=upload_id,
                MultipartUpload={"Parts": parts},
            )
            return written
        except BaseException:
            self.client.abort_multipart_upload(
                Bucket=self.bucket, Key=key, UploadId=upload_id
            )
            raise

    def fetch(self, key: str, byte_range: BytesRange | None = None) -> BinaryIO:
        kwargs = {"Bucket": self.bucket, "Key": key}
        if byte_range is not None:
            kwargs["Range"] = f"bytes={byte_range.from_pos}-{byte_range.to_pos}"
        try:
            resp = self.client.get_object(**kwargs)
        except Exception as e:
            # Inspect the structured error code, not the message text — a
            # substring match on '404' would misreport unrelated boto
            # errors as missing keys and mask real storage failures.
            code = None
            err_resp = getattr(e, "response", None)
            if isinstance(err_resp, dict):
                code = (err_resp.get("Error") or {}).get("Code")
                status = (err_resp.get("ResponseMetadata") or {}).get(
                    "HTTPStatusCode"
                )
            else:
                status = None
            # botocore also surfaces this as a generated exception class
            # literally named NoSuchKey (client.exceptions.NoSuchKey)
            if code in ("NoSuchKey", "404") or status == 404 or (
                type(e).__name__ == "NoSuchKey"
            ):
                raise KeyNotFoundError(key) from e
            raise StorageBackendError(str(e)) from e
        body = resp["Body"]
        if hasattr(body, "read"):
            return body
        return io.BytesIO(body)

    def delete(self, keys: Iterable[str]) -> None:
        batch: list[dict] = []
        for key in keys:
            batch.append({"Key": key})
            if len(batch) == DELETE_BATCH:
                self.client.delete_objects(Bucket=self.bucket, Delete={"Objects": batch})
                batch = []
        if batch:
            self.client.delete_objects(Bucket=self.bucket, Delete={"Objects": batch})

    def list_keys(self, prefix: str = "") -> list[str]:
        keys: list[str] = []
        token = None
        while True:
            kwargs = {"Bucket": self.bucket, "Prefix": prefix}
            if token:
                kwargs["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kwargs)
            keys += [o["Key"] for o in resp.get("Contents", [])]
            if not resp.get("IsTruncated"):
                return sorted(keys)
            token = resp.get("NextContinuationToken")
