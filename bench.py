"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a count() (full execution, no driver-side
result materialization). A warmup query first absorbs JVM/codegen
startup so per-query numbers reflect steady-state plan execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from tiered_storage_for_apache_kafka_spark.operators import QUERIES
    from tiered_storage_for_apache_kafka_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer reads + codegen
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "transform_mbps": transform_grid(),
                "sf": sf,
            }
        )
    )
    spark.stop()


def transform_grid() -> dict[str, float]:
    """BASELINE.md's JMH grid, scaled: 10 MiB content x 1 MiB chunks x
    {compression} x {encryption}; MB/s for transform and detransform."""
    import random

    from tiered_storage_for_apache_kafka_spark.transform.encryption import (
        create_data_key_and_aad,
    )
    from tiered_storage_for_apache_kafka_spark.transform.pipeline import (
        detransform,
        transform,
    )

    rng = random.Random(42)
    content = bytes(rng.getrandbits(8) for _ in range(1 << 20)) * 10  # 10 MiB
    mb = len(content) / 1e6
    out: dict[str, float] = {}
    for compression in (False, True):
        for encryption in (False, True):
            key = create_data_key_and_aad() if encryption else None
            label = f"c{int(compression)}e{int(encryption)}"
            best_t = best_d = float("inf")
            for _trial in range(3):  # best-of-3: drop warmup/GC noise
                t0 = time.perf_counter()
                result = transform(
                    content, 1 << 20, compression=compression, encryption_key=key
                )
                best_t = min(best_t, time.perf_counter() - t0)
                t0 = time.perf_counter()
                n = sum(
                    len(c)
                    for c in detransform(
                        result.data, result.chunk_index,
                        compression=compression, encryption_key=key,
                    )
                )
                best_d = min(best_d, time.perf_counter() - t0)
                assert n == len(content)
            out[f"transform_{label}"] = round(mb / best_t, 1)
            out[f"detransform_{label}"] = round(mb / best_d, 1)
    return out


if __name__ == "__main__":
    sys.exit(main())
