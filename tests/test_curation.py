"""Semantic invariants of the curation operators (oracle equality is
covered by test_queries_vs_duckdb; these pin the *meaning*)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.curation import (
    SPLIT_TEST_UB,
    SPLIT_VALID_UB,
    benchmark_decontamination,
    curation_funnel,
    dup_cluster_representatives,
    stratified_sample_by_lang,
    train_test_split_hash,
)
from tiered_storage_for_apache_kafka_spark.operators.dedup import (
    dedup_connected_components,
)
from tiered_storage_for_apache_kafka_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def test_split_partitions_every_doc_and_is_deterministic(spark):
    out = {r["split"]: r for r in train_test_split_hash(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    assert set(out) == {"train", "valid", "test"}
    assert sum(r["n_docs"] for r in out.values()) == n
    # expected mass: test ~ 8/256, valid ~ 24/256 (binomial tolerance 3x)
    assert 0 < out["test"]["n_docs"] < 3 * n * SPLIT_TEST_UB / 256
    assert out["valid"]["n_docs"] < 3 * n * (SPLIT_VALID_UB - SPLIT_TEST_UB) / 256
    assert out["train"]["n_docs"] > n // 2
    # a rerun assigns identically (pure function of doc_id)
    again = {r["split"]: r["n_docs"] for r in train_test_split_hash(spark, SF).collect()}
    assert again == {k: v["n_docs"] for k, v in out.items()}


def test_stratified_sample_within_every_stratum(spark):
    rows = stratified_sample_by_lang(spark, SF).collect()
    assert rows, "no strata"
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_total"]
        # ~25% target; allow wide tolerance on small strata
        if r["n_total"] >= 100:
            assert 0.10 * r["n_total"] < r["n_sampled"] < 0.45 * r["n_total"]


def test_decontamination_flags_only_corpus_docs(spark):
    from tiered_storage_for_apache_kafka_spark.operators.curation import BENCH_MOD

    out = benchmark_decontamination(spark, SF)
    bad = out.filter(F.col("doc_id") % BENCH_MOD == 0).count()
    assert bad == 0  # benchmark members are never flagged as contaminated
    assert out.filter(F.col("n_shared_grams") <= 0).count() == 0


def test_funnel_is_monotone(spark):
    [r] = curation_funnel(spark, SF).collect()
    assert r["n_total"] >= r["n_quality"] >= r["n_quality_unique"] >= r["n_kept_train"]
    assert r["n_kept_train"] > 0
    assert r["kept_train_chars"] > 0


def test_cluster_representatives_consistent_with_labeling(spark):
    labels = dedup_connected_components(spark, SF)
    reps = dup_cluster_representatives(spark, SF)
    assert reps.count() == labels.select("canonical_doc_id").distinct().count()
    assert labels.count() == (
        reps.agg(F.sum("cluster_size")).collect()[0][0]
    )
    # the representative is a member of its own cluster
    assert reps.filter(
        (F.col("canonical_doc_id") < F.col("min_doc_id"))
        | (F.col("canonical_doc_id") > F.col("max_doc_id"))
    ).count() == 0


def test_mixture_weight_null_on_empty_source_and_no_overflow(spark):
    """ANSI-mode edge cases of the mixture weight formula: a source whose
    docs are all empty (n_tokens=0) must weigh NULL (not DIVIDE_BY_ZERO),
    and corpora past 9.2e12 tokens must not overflow BIGINT (the naive
    1000000*total_tokens would)."""
    from tiered_storage_for_apache_kafka_spark.operators.curation import (
        MIXTURE_CAP_MICROS,
        _WEIGHT_SQL,
    )

    rows = [
        # (source, n_tokens, total_tokens, n_sources)
        ("empty", 0, 50_000_000_000_000, 3),
        ("huge", 24_000_000_000_000, 50_000_000_000_000, 3),  # ratio < 1
        ("small", 26_000_000_000_000 - 1, 50_000_000_000_000, 3),
    ]
    df = spark.createDataFrame(
        rows, "source string, n_tokens long, total_tokens long, n_sources long"
    )
    out = {
        r["source"]: r["w"]
        for r in df.selectExpr(
            "source", f"{_WEIGHT_SQL.format(cap=MIXTURE_CAP_MICROS)} AS w"
        ).collect()
    }
    assert out["empty"] is None
    # floor(1e6 * 5e13 / (3 * 2.4e13)) = 694444
    assert out["huge"] == 694_444
    assert 0 < out["small"] <= MIXTURE_CAP_MICROS


def test_incremental_dedup_keeps_majority_and_flags_near_dups(spark):
    from tiered_storage_for_apache_kafka_spark.operators.curation import (
        incremental_dedup_verdicts,
    )

    out = incremental_dedup_verdicts(spark, SF)
    rows = out.collect()
    assert rows, "no incoming docs"
    verdicts = {r["verdict"] for r in rows}
    assert verdicts <= {"keep", "drop_near", "drop_exact"}
    # the synthetic corpus has heavy 5-gram overlap — some near-dups must
    # trip, and no verdict may contradict its own evidence columns
    for r in rows:
        if r["verdict"] == "drop_exact":
            assert r["is_exact_dup"] == 1
        if r["verdict"] == "keep":
            assert r["is_exact_dup"] == 0


def test_quality_weighted_sample_rates_track_weights(spark):
    from tiered_storage_for_apache_kafka_spark.operators.curation import (
        quality_weighted_sample,
    )

    for r in quality_weighted_sample(spark, SF).collect():
        assert 0 <= r["n_kept"] <= r["n_docs"]
        expected = r["expected_keep_x256"] / 256.0
        # realized keep count within a loose band of the expectation
        assert abs(r["n_kept"] - expected) <= max(10, 0.5 * expected)


def test_bloom_never_misses_a_true_duplicate(spark):
    """The one-sided Bloom property: every exact duplicate must be in the
    maybe set — n_maybe >= n_true_dups, and false positives are exactly
    the surplus."""
    from tiered_storage_for_apache_kafka_spark.operators.curation import (
        bloom_prefilter_audit,
    )

    [r] = bloom_prefilter_audit(spark, SF).collect()
    assert r["n_maybe"] >= r["n_true_dups"]
    assert r["n_false_positives"] == r["n_maybe"] - r["n_true_dups"]
    assert 0 <= r["n_maybe"] <= r["n_incoming"]


def test_funnel_is_monotone_decreasing(spark):
    from tiered_storage_for_apache_kafka_spark.operators.sessions import (
        funnel_conversion,
    )

    [r] = funnel_conversion(spark, SF).collect()
    assert r["n_users"] >= r["n_viewed"] >= r["n_clicked_after"] >= r["n_purchased_after"]
    assert r["n_purchased_after"] > 0  # dense synthetic events: funnel completes


def test_weighted_sample_pps_is_pps_biased_and_deterministic(spark):
    """Sequential Poisson sampling: priority u/w with w = n_chars means
    longer docs are proportionally likelier — the per-lang sample's mean
    length must exceed the stratum mean. Determinism: two runs agree."""
    from tiered_storage_for_apache_kafka_spark.operators.curation import (
        PPS_SAMPLE_K,
        weighted_sample_pps,
    )

    rows = {r["lang"]: r for r in weighted_sample_pps(spark, SF).collect()}
    assert rows
    docs = load_table(spark, SF, "documents")
    stratum = {
        r["lang"]: r
        for r in docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("n_chars").alias("avg_chars"),
        )
        .collect()
    }
    biased = 0
    for lang, r in rows.items():
        assert r["n_sampled"] == min(PPS_SAMPLE_K, stratum[lang]["n"])
        if r["sample_chars"] / r["n_sampled"] > stratum[lang]["avg_chars"]:
            biased += 1
    # PPS bias must show in (nearly) every stratum, not on average only
    assert biased >= len(rows) - 1, (rows, stratum)
    again = {r["lang"]: r for r in weighted_sample_pps(spark, SF).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_containment_sketch_accuracy(spark):
    """Bottom-k containment (k=16): mean absolute error across audited
    pairs must sit within the sketch's statistical envelope, and the
    estimator must separate contained from disjoint pairs."""
    from tiered_storage_for_apache_kafka_spark.operators.curation import (
        containment_sketch_audit,
    )

    rows = containment_sketch_audit(spark, SF).collect()
    assert len(rows) > 50
    errs = [abs(r["est_pm"] - r["exact_pm"]) for r in rows]
    # RSE ~ 1/sqrt(16) = 25%; mean |err| well under one sigma
    assert sum(errs) / len(errs) <= 200, sum(errs) / len(errs)
    for r in rows:
        assert 0 <= r["est_pm"] <= 1000
        assert 0 <= r["exact_pm"] <= 1000
        assert 0 <= r["n_hits"] <= 16
