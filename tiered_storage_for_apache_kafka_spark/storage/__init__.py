"""Object-storage layer: backend protocol, filesystem + S3 backends,
object-key scheme, upload rate limiting.

This is the engine's *custom storage layer* (SURVEY.md §7.1): the pieces
of the reference that are pure I/O plumbing, below Spark. Spark jobs call
into it from the driver (manifest commits) and from executors (ranged
chunk GETs inside mapInPandas), so everything here is picklable and
thread-safe.
"""

from tiered_storage_for_apache_kafka_spark.storage.backend import (  # noqa: F401
    BytesRange,
    InvalidRangeError,
    KeyNotFoundError,
    StorageBackend,
    StorageBackendError,
)
from tiered_storage_for_apache_kafka_spark.storage.filesystem import (  # noqa: F401
    FileSystemStorage,
)
from tiered_storage_for_apache_kafka_spark.storage.object_key import (  # noqa: F401
    ObjectKey,
    ObjectKeyFactory,
    Suffix,
)
