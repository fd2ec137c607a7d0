"""Bench-shaped interference probe: full pass 1 + pass 2 over all
queries (sorted order, exactly like bench.py), recording the target
cells' pass-2 (in-bench warm) times; then interventions:
  I1: spark.catalog.clearCache()          -> re-measure targets
  I2: python GC + JVM System.gc()         -> re-measure targets
Reports persisted-RDD counts and total cached storage at each step.
"""
import gc
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


def storage(sc):
    info = sc._jsc.sc().getRDDStorageInfo()
    mem = sum(i.memSize() for i in info)
    return len(info), mem / 1e6


def measure(tag):
    for name in TARGETS:
        t0 = time.perf_counter()
        force(QUERIES[name](spark, SF))
        el = time.perf_counter() - t0
        print(f"{tag} {name:34s} {el:6.3f}")


spark = get_spark(app_name="interf-bench")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
for w in ("q1_pricing_summary", "tiered_offset_range_fetch",
          "streaming_user_totals_stateful", "datasource_offset_range_fetch"):
    force(QUERIES[w](spark, SF))

t_pass = {}
for p in range(2):
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        force(QUERIES[name](spark, SF))
        el = time.perf_counter() - t0
        if name in TARGETS:
            print(f"PASS{p} {name:34s} {el:6.3f}", flush=True)
    n, mem = storage(sc)
    print(f"after pass {p}: persisted RDDs {n}, {mem:.1f} MB", flush=True)

print("== I0: re-measure targets in the loaded JVM (no intervention)")
measure("I0")
print("== I1: spark.catalog.clearCache()")
spark.catalog.clearCache()
n, mem = storage(sc)
print(f"after clearCache: persisted RDDs {n}, {mem:.1f} MB")
measure("I1")
print("== I2: python gc + JVM System.gc()")
gc.collect()
sc._jvm.System.gc()
time.sleep(2)
n, mem = storage(sc)
print(f"after gc: persisted RDDs {n}, {mem:.1f} MB")
measure("I2")
spark.stop()
