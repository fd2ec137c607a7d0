"""Per-backend request metrics — parity with the reference's storage
``MetricCollector`` classes (``storage/s3/.../MetricCollector.java`` +
``MetricRegistry.java:24-84``, and the GCS/Azure equivalents): every
backend operation counts a ``<op>-requests`` sensor and times a
``<op>-time`` sensor, published per backend under
``<backend>-client-metrics`` (rate/total and time-avg/max derivations in
``Metrics.reference_snapshot``).

The reference hooks its collectors into each SDK's interceptor chain
(S3 ExecutionInterceptor, GCS HttpResponseInterceptor, Azure pipeline
policy); Python-side the uniform ``StorageBackend`` protocol makes a
wrapping decorator equivalent and backend-agnostic.
"""

from __future__ import annotations

from tiered_storage_for_apache_kafka_spark.storage.backend import BytesRange


class MeteredBackend:
    """Wraps any ``StorageBackend``, emitting request counts + latency
    per operation, tagged by a backend label (defaults to the inner
    class name, lower-cased, ``Storage`` suffix stripped — so
    ``S3Storage`` publishes under ``s3-client-metrics`` like
    ``MetricRegistry.METRIC_GROUP``)."""

    def __init__(self, inner, metrics, label: str | None = None):
        self.inner = inner
        self.metrics = metrics
        if label is None:
            label = type(inner).__name__.lower()
            if label.endswith("storage"):
                label = label[: -len("storage")] or label
        self.label = label

    def _timed(self, op: str):
        self.metrics.inc(f"storage.{op}-requests", backend=self.label)
        return self.metrics.time(f"storage.{op}-time", backend=self.label)

    # StorageBackend protocol --------------------------------------------------
    def upload(self, key: str, data) -> int:
        with self._timed("put-object"):
            return self.inner.upload(key, data)

    def fetch(self, key: str, byte_range: BytesRange | None = None):
        with self._timed("get-object"):
            return self.inner.fetch(key, byte_range)

    def delete(self, keys) -> None:
        op = "delete-object" if isinstance(keys, str) else "delete-objects"
        with self._timed(op):
            return self.inner.delete(keys)

    def __getattr__(self, name):
        return getattr(self.inner, name)
