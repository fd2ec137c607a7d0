"""Connected-components label propagation: pointer-jumping convergence.

The CC loop must converge in O(log diameter) rounds, not O(diameter) —
at 100 TB a chained near-dup drift (each doc similar to the next) would
otherwise turn into thousands of sequential Spark jobs."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.dedup import propagate_min_labels


def _edges(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a BIGINT, doc_b BIGINT")
    return (
        df.union(df.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
        .withColumnRenamed("doc_a", "src")
        .withColumnRenamed("doc_b", "dst")
    )


def test_chain_converges_logarithmically(spark):
    # chain 0-1-...-63 (diameter 63) plus an isolated pair
    labels, rounds = propagate_min_labels(
        _edges(spark, [(i, i + 1) for i in range(63)] + [(100, 101)])
    )
    got = {r.doc_id: r.label for r in labels.collect()}
    assert all(got[i] == 0 for i in range(64))
    assert got[100] == 100 and got[101] == 100
    # log2(63) ~ 6; allow slack for the final no-change round
    assert rounds <= 9, f"pointer jumping regressed: {rounds} rounds for diameter 63"


def test_clique_and_star(spark):
    clique = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    star = [(20, x) for x in (21, 22, 23, 24)]
    labels, rounds = propagate_min_labels(_edges(spark, clique + star))
    got = {r.doc_id: r.label for r in labels.collect()}
    assert all(got[i] == 10 for i in range(10, 14))
    assert all(got[i] == 20 for i in (20, 21, 22, 23, 24))
    assert rounds <= 3
