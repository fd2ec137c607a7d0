"""Write-path transform pipeline: chunk → compress → encrypt, plus the
inverse detransform chain. Pure Python generators (streaming, O(chunk)
memory) — invoked per-segment from Spark executors, never on the driver.
"""

from tiered_storage_for_apache_kafka_spark.transform.pipeline import (  # noqa: F401
    TransformResult,
    detransform,
    transform,
)
