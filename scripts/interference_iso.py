"""Isolated baseline: fresh session, bench warmups, then target cells
best-of-2 with fresh construction per pass (bench-shaped timing)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiered_storage_for_apache_kafka_spark.operators import QUERIES
from tiered_storage_for_apache_kafka_spark.session import get_spark

SF = "/root/testdata/sf0.1"
TARGETS = [
    "dedup_ngram_jaccard",
    "quality_classifier_trained",
    "dsir_importance_topk",
    "kmv_set_ops_audit",
    "simhash64_near_dup_pairs",
]


def force(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark(app_name="interf-iso")
spark.sparkContext.setLogLevel("ERROR")
for w in ("q1_pricing_summary", "tiered_offset_range_fetch",
          "streaming_user_totals_stateful", "datasource_offset_range_fetch"):
    force(QUERIES[w](spark, SF))

for name in TARGETS:
    best = float("inf")
    per = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(QUERIES[name](spark, SF))
        el = time.perf_counter() - t0
        per.append(round(el, 3))
        best = min(best, el)
    print(f"ISO {name:34s} best {best:6.3f}  passes {per}")

sc = spark.sparkContext
info = sc._jsc.sc().getRDDStorageInfo()
print(f"ISO persisted RDDs: {len(info)}")
spark.stop()
