"""DataFrame operators.

Importing this package registers every query with the central registry
(`registry.QUERIES` / `registry.ORACLES`), which ``__spark_entry__.py``
exposes to the driver.
"""

from tiered_storage_for_apache_kafka_spark.operators import (  # noqa: F401
    asof,
    chunk_relational,
    dedup,
    multimodal,
    relational_extra,
    sessions,
    similarity,
    skew,
    streaming_queries,
    text,
    tiered,
    tpch,
    tpch_extra,
)
from tiered_storage_for_apache_kafka_spark.operators.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
)
