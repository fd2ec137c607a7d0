"""Round-3 text-analysis operators: PMI collocations, PII scan/redact,
per-source vocabulary growth, count-min heavy hitters.

All are scan-shaped or one-shuffle JVM-expression pipelines over the
`documents` table — no Python UDFs anywhere; the 100 TB plan is the
same plan that runs here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table

PMI_MIN_COUNT = 5


@query(
    "pmi_bigram_collocations",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents
), big AS (
  SELECT pr[1] AS w1, pr[2] AS w2
  FROM (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS pr FROM toks)
), uni AS (
  SELECT unnest(l) AS w FROM toks
), c1 AS (
  SELECT w, COUNT(*) AS c FROM uni GROUP BY w
), c12 AS (
  SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY w1, w2
), n_uni AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM uni),
   n_big AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM big)
SELECT b.w1, b.w2, CAST(b.c AS BIGINT) AS pair_count,
       ROUND(ln((b.c / (SELECT n FROM n_big))
                / ((a.c / (SELECT n FROM n_uni))
                   * (z.c / (SELECT n FROM n_uni)))), 4) + 0.0 AS pmi
FROM c12 b
JOIN c1 a ON a.w = b.w1
JOIN c1 z ON z.w = b.w2
WHERE b.c >= {PMI_MIN_COUNT}
""",
)
def pmi_bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining: which word pairs
    co-occur as consecutive bigrams more than chance — the classic
    phrase-detection stage (word2vec's phrase pass, quality-signal
    n-grams) of a corpus pipeline.

    Plan shape: the shared cached token table feeds the bigram explode
    (a narrow `transform` over each array — no shuffle) and the unigram
    explode; each count is one map-side-combined agg keyed by words
    (vocabulary-sized); the two unigram joins broadcast the vocab table;
    the corpus totals are broadcast scalars. Nothing corpus-sized ever
    shuffles twice. PMI itself is one double expression over integer
    counts, ROUND(...,4) per the portability rules."""
    from tiered_storage_for_apache_kafka_spark.operators.dedup import (
        _maybe_broadcast,
        tokens_cached,
    )

    toks = tokens_cached(spark, sf_dir)
    # docs with <2 tokens yield no bigrams (the oracle's list_zip does the
    # same); without the filter, sequence(1, size-1) would DESCEND to
    # [1, 0] for a 1-token doc and the toks[i] lookups would raise
    # INVALID_ARRAY_INDEX under Spark 4's default ANSI mode
    bigrams = toks.filter(F.size("toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
            )
        ).alias("pr")
    ).select("pr.w1", "pr.w2")
    unigrams = toks.select(F.explode("toks").alias("w"))
    c1 = unigrams.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    c12 = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= PMI_MIN_COUNT)
    )
    n_uni = c1.agg(F.sum("c").cast("double").alias("n_uni"))
    n_big = bigrams.agg(F.count(F.lit(1)).cast("double").alias("n_big"))
    a = c1.select(F.col("w").alias("w1"), F.col("c").alias("c_w1"))
    z = c1.select(F.col("w").alias("w2"), F.col("c").alias("c_w2"))
    return (
        c12.join(_maybe_broadcast(a), "w1")
        .join(_maybe_broadcast(z), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .select(
            "w1",
            "w2",
            F.col("pair_count").cast("bigint").alias("pair_count"),
            # `+ 0.0` normalizes IEEE negative zero: a PMI that rounds to
            # -0.0 renders '-0.0' vs '0.0' across engines and flips the hash
            (
                F.round(
                    F.log(
                        (F.col("pair_count") / F.col("n_big"))
                        / (
                            (F.col("c_w1") / F.col("n_uni"))
                            * (F.col("c_w2") / F.col("n_uni"))
                        )
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )


# PII patterns restricted to the Java-regex ∩ RE2 common subset (no
# lookaround): email, NANP-ish phone, IPv4. Redaction chains in this
# exact order on both engines so the md5 of the redacted text matches.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}[-. ]\d{3,4}[-. ]\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scan_redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and redact email/phone/IPv4 spans in `text_col`: pure JVM
    regexp expressions, scan-shaped (no shuffle) — the standard PII
    pass of a training-data pipeline. Returns the input plus per-kind
    counts and the redacted text."""
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), PII_EMAIL, "[EMAIL]"),
            PII_PHONE,
            "[PHONE]",
        ),
        PII_IPV4,
        "[IP]",
    )
    return docs.select(
        "*",
        F.regexp_count(F.col(text_col), F.lit(PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(PII_PHONE)).cast("bigint").alias("n_phones"),
        F.regexp_count(F.col(text_col), F.lit(PII_IPV4)).cast("bigint").alias("n_ips"),
        redacted.alias("redacted_text"),
    )


@query(
    "pii_scan_redact",
    oracle=rf"""
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(LEN(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT) AS n_phones,
       CAST(LEN(regexp_extract_all(text, '{PII_IPV4}')) AS BIGINT) AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '{PII_EMAIL}', '[EMAIL]', 'g'),
           '{PII_PHONE}', '[PHONE]', 'g'),
           '{PII_IPV4}', '[IP]', 'g')) AS redacted_md5
FROM documents
""",
)
def pii_scan_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable PII pass over the documents table: per-kind span
    counts plus the md5 of the redacted text (proving the rewrite itself
    matches byte-for-byte across engines — on this synthetic corpus the
    counts are legitimately zero and the md5 equals the original text's;
    detection on PII-bearing text is pinned by tests/test_text_extra.py).
    """
    out = scan_redact_pii(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        F.md5("redacted_text").alias("redacted_md5"),
    )


@query(
    "source_vocab_growth",
    oracle=r"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab_size,
       ROUND(CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*), 6) AS type_token_ratio
FROM toks GROUP BY source
""",
)
def source_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary statistics (the Heaps-law corpus health
    check): token volume, exact distinct vocabulary, type/token ratio.
    One explode + one agg with map-side partial distinct; at 100 TB the
    exact COUNT(DISTINCT) becomes `approx_count_distinct` — the exact
    form is kept here because the oracle must agree bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    return toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.count_distinct("tok").cast("bigint").alias("vocab_size"),
        F.round(F.count_distinct("tok") / F.count(F.lit(1)), 6).alias(
            "type_token_ratio"
        ),
    )


CMS_ROWS = 4  # independent hash rows
CMS_WIDTH = 256  # buckets per row (two md5 hex digits)
CMS_MIN_TRUE = 50  # report tokens at/above this true frequency


def _cms_bucket_sql(i: int, tok: str) -> str:
    """DuckDB 0..255 bucket for hash row i (salted md5, strpos math)."""
    h = f"md5('r{i}|' || {tok})"
    return (
        f"(strpos('0123456789abcdef', substr({h}, 1, 1)) - 1) * 16 + "
        f"(strpos('0123456789abcdef', substr({h}, 2, 1)) - 1)"
    )


def _cms_bucket_expr(i: int, tok: str) -> str:
    """Spark twin of :func:`_cms_bucket_sql` (locate is 1-based too)."""
    h = f"md5(concat('r{i}|', {tok}))"
    return (
        f"(locate(substr({h}, 1, 1), '0123456789abcdef') - 1) * 16 + "
        f"(locate(substr({h}, 2, 1), '0123456789abcdef') - 1)"
    )


@query(
    "heavy_hitters_cms",
    oracle=rf"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
), cells AS (
  SELECT row_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM (
    {" UNION ALL ".join(f"SELECT {i} AS row_id, {_cms_bucket_sql(i, 'tok')} AS bucket FROM toks" for i in range(CMS_ROWS))}
  ) GROUP BY row_id, bucket
), truth AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM toks GROUP BY tok HAVING COUNT(*) >= {CMS_MIN_TRUE}
), est AS (
  SELECT t.tok, t.true_count, MIN(c.c) AS cms_estimate
  FROM truth t
  JOIN cells c
    ON (c.row_id = 0 AND c.bucket = {_cms_bucket_sql(0, 't.tok')})
    OR (c.row_id = 1 AND c.bucket = {_cms_bucket_sql(1, 't.tok')})
    OR (c.row_id = 2 AND c.bucket = {_cms_bucket_sql(2, 't.tok')})
    OR (c.row_id = 3 AND c.bucket = {_cms_bucket_sql(3, 't.tok')})
  GROUP BY t.tok, t.true_count
)
SELECT tok, true_count, CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - true_count AS BIGINT) AS overestimate
FROM est
""",
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection through a count-min sketch — the mergeable
    fixed-size frequency summary a 100 TB pipeline keeps INSTEAD of the
    exact vocabulary: each mapper folds its tokens into a {CMS_ROWS}x{CMS_WIDTH}
    integer grid (map-side combine on (row, bucket) — the sketch IS the
    aggregation state, corpus never shuffles raw tokens), grids merge by
    cell-wise addition, and any token's frequency is estimated as the
    min over its {CMS_ROWS} salted-hash cells — never an underestimate.
    The query emits estimate-vs-truth for every token at/above
    {CMS_MIN_TRUE} occurrences so the one-sided error is auditable
    (`overestimate >= 0` always, pinned in tests). Hashing is salted md5
    reduced by locate/strpos arithmetic — bit-identical across engines.
    """
    from tiered_storage_for_apache_kafka_spark.operators.dedup import tokens_cached

    toks = tokens_cached(spark, sf_dir).select(F.explode("toks").alias("tok"))
    # ONE corpus pass: the exact per-token counts (which the audit's
    # truth side needs regardless) aggregate first with map-side
    # combine; the sketch grid then folds the VOCABULARY-sized counted
    # frame — each cell's value is the sum of its tokens' counts,
    # identical to counting occurrences, but the salted md5 runs once
    # per distinct token instead of once per occurrence and the raw
    # token stream is aggregated exactly once.
    tok_counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    cells = (
        tok_counts.select(
            "true_count",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row_id"),
                            F.expr(_cms_bucket_expr(i, "tok")).alias("bucket"),
                        )
                        for i in range(CMS_ROWS)
                    ]
                )
            ).alias("cell"),
        )
        .groupBy("cell.row_id", "cell.bucket")
        .agg(F.sum("true_count").cast("bigint").alias("c"))
    )
    truth = tok_counts.filter(F.col("true_count") >= CMS_MIN_TRUE)
    probes = truth.select(
        "tok",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_id"),
                        F.expr(_cms_bucket_expr(i, "tok")).alias("bucket"),
                    )
                    for i in range(CMS_ROWS)
                ]
            )
        ).alias("probe"),
    ).select("tok", "true_count", "probe.row_id", "probe.bucket")
    return (
        probes.join(F.broadcast(cells), ["row_id", "bucket"])
        .groupBy("tok", "true_count")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "tok",
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_count"))
            .cast("bigint")
            .alias("overestimate"),
        )
    )


N_QUALITY_DECILES = 10


@query(
    "quality_decile_stats",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
), freq AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS n FROM freq
), scored AS (
  SELECT t.doc_id, ln((SELECT n FROM tot) / f.c) AS nll
  FROM toks t JOIN freq f ON f.tok = t.tok
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_tokens, ROUND(AVG(nll), 4) AS avg_nll
  FROM scored GROUP BY doc_id
), tiled AS (
  SELECT *, NTILE({N_QUALITY_DECILES}) OVER (ORDER BY avg_nll, doc_id) AS decile
  FROM per_doc
)
SELECT CAST(decile AS INT) AS decile,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(avg_nll) AS min_avg_nll,
       MAX(avg_nll) AS max_avg_nll
FROM tiled GROUP BY decile
""",
)
def quality_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-filter bucketing: rank every document by its unigram-LM
    quality score (avg negative log-likelihood) and cut the corpus into
    deciles — the CCNet head/middle/tail partitioning generalized to 10
    buckets, reporting each bucket's volume and score range so a
    pipeline can pick its keep-band.

    The NTILE here is a single global window ordered by (score, doc_id)
    — exact and engine-identical, but a one-partition sort at 100 TB. At
    scale the cut points come from `approxQuantile` on the score column
    (one pass, mergeable sketches) and the decile assignment becomes a
    narrow map against the broadcast boundaries; the exact window form
    is kept here because the oracle must agree row-for-row."""
    from tiered_storage_for_apache_kafka_spark.operators.text import (
        unigram_logprob_quality,
    )
    from pyspark.sql import Window

    per_doc = unigram_logprob_quality(spark, sf_dir)
    w = Window.orderBy("avg_nll", "doc_id")
    tiled = per_doc.withColumn("decile", F.ntile(N_QUALITY_DECILES).over(w))
    return tiled.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("avg_nll").alias("min_avg_nll"),
        F.max("avg_nll").alias("max_avg_nll"),
    )


# character classes for the diversity index: 26 letters + 10 digits +
# space; everything else (punctuation, unicode) is one residual class.
_DIVERSITY_CLASSES = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [
    chr(c) for c in range(ord("0"), ord("9") + 1)
] + [" "]


_CLASS_ARRAY = ", ".join(f"'{c}'" for c in _DIVERSITY_CLASSES)
_DIVERSITY_CAP = 1_000_000  # chars scored; keeps n^2 * 1e6 inside int64


def _simpson_spark(text_expr: str) -> str:
    """Exact Gini-Simpson diversity over the character classes, scaled
    e6 — INTEGER arithmetic end to end (sum of squared class counts vs
    squared total), so Spark and DuckDB hash identically; no logs, no
    doubles (the reason this is Simpson and not Shannon entropy).

    Each class count is computed ONCE via transform over the class
    array + one higher-order aggregate carrying (sum, sum-of-squares)
    — 37 length/replace scans per doc, not the ~150 the naive expanded
    polynomial costs (Catalyst does not CSE across the expansion;
    measured 4x on the sf0.1 corpus).

    The score is computed over the first _DIVERSITY_CAP (1M) chars:
    n^2 * 1e6 must stay inside int64, and an un-capped 3M+-char doc
    would overflow (silently under non-ANSI Spark, an error in
    DuckDB). A 1M-char prefix is statistically identical for a
    diversity index and keeps the arithmetic provably exact."""
    t = f"lower(substring({text_expr}, 1, {_DIVERSITY_CAP}))"
    n = f"CAST(length({t}) AS BIGINT)"
    counts = (
        f"transform(array({_CLASS_ARRAY}), c -> "
        f"CAST(length({t}) - length(replace({t}, c, '')) AS BIGINT))"
    )
    return (
        f"aggregate({counts}, "
        f"named_struct('s', CAST(0 AS BIGINT), 'q', CAST(0 AS BIGINT)), "
        f"(a, x) -> named_struct('s', a.s + x, 'q', a.q + x * x), "
        f"a -> CASE WHEN {n} = 0 THEN CAST(0 AS BIGINT) ELSE "
        f"(({n} * {n} - (a.q + ({n} - a.s) * ({n} - a.s))) * 1000000) "
        f"div ({n} * {n}) END)"
    )


def _simpson_duckdb(text_expr: str) -> str:
    """DuckDB twin of :func:`_simpson_spark` (list_transform/list_sum
    instead of Spark's higher-order aggregate; same integer math and
    the same overflow-proof prefix cap)."""
    t = f"lower(substring({text_expr}, 1, {_DIVERSITY_CAP}))"
    n = f"CAST(length({t}) AS BIGINT)"
    counts = (
        f"list_transform([{_CLASS_ARRAY}], c -> "
        f"CAST(length({t}) - length(replace({t}, c, '')) AS BIGINT))"
    )
    s = f"CAST(list_sum({counts}) AS BIGINT)"
    q = f"CAST(list_sum(list_transform({counts}, x -> x * x)) AS BIGINT)"
    return (
        f"(CASE WHEN {n} = 0 THEN 0 ELSE "
        f"(({n} * {n} - ({q} + ({n} - {s}) * ({n} - {s}))) * 1000000) "
        f"// ({n} * {n}) END)"
    )


@query(
    "char_diversity_quality",
    oracle=f"""
WITH scored AS (
  SELECT source, lang,
         CAST({_simpson_duckdb("text")} AS BIGINT) AS simpson_e6
  FROM documents
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(simpson_e6) AS BIGINT) AS sum_simpson_e6,
       MIN(simpson_e6) AS min_simpson_e6,
       MAX(simpson_e6) AS max_simpson_e6
FROM scored
GROUP BY source, lang
""",
)
def char_diversity_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-diversity quality signal: exact Gini-Simpson index
    (1 - sum p_i^2) over 37 character classes + a residual class, the
    boilerplate/garbage detector that complements the word-level Gopher
    rules (a low-diversity doc is dominated by few characters —
    repeated padding, ASCII art, key-mashing; a natural-language doc
    sits in a tight band per language). Scaled-integer arithmetic end
    to end: the per-doc score is exact, so unlike Shannon entropy the
    cross-engine hash can never flake on a log ulp.

    The per-doc class histogram is ONE vectorized numpy pass per batch
    (``np.bincount`` over UTF-32 code points) inside a narrow Arrow map
    — the JVM expression formulation (37 length/replace scans per doc,
    each allocating a copy of the text) measured 6x slower at sf0.1
    (2.09 s vs 0.35 s warm) and identical bit-for-bit; guide §4.2's
    rule (hand whole batches to vectorized native code instead of long
    per-row expression chains). Only the three needed columns cross
    the Arrow boundary. Plan: narrow map + one agg shuffle, no
    explode."""
    import pandas as pd

    from tiered_storage_for_apache_kafka_spark.tables import scan_parallel

    docs = scan_parallel(load_table(spark, sf_dir, "documents"), spark)

    def score(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for src, lang, text in zip(
                pdf["source"], pdf["lang"], pdf["text"]
            ):
                if text is None:
                    # SQL NULL semantics (ADVICE r13): the oracle's
                    # expression yields NULL for NULL text — excluded
                    # from SUM/MIN/MAX but counted in n_docs. Scoring
                    # it 0 would skew min_simpson_e6.
                    out.append((src, lang, None))
                    continue
                t = text[:_DIVERSITY_CAP].lower()
                n = len(t)
                if n == 0:
                    out.append((src, lang, 0))
                    continue
                codes = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
                )
                counts = np.bincount(
                    np.clip(codes, 0, 127), minlength=128
                )
                cls = np.concatenate(
                    [counts[97:123], counts[48:58], counts[32:33]]
                ).astype(np.int64)
                s = int(cls.sum())
                q = int((cls * cls).sum())
                val = (
                    (n * n - (q + (n - s) * (n - s))) * 1_000_000
                ) // (n * n)
                out.append((src, lang, val))
            yield pd.DataFrame(
                out, columns=["source", "lang", "simpson_e6"]
            )

    scored = docs.select("source", "lang", "text").mapInPandas(
        score, schema="source string, lang string, simpson_e6 long"
    )
    return (
        scored.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("simpson_e6").cast("long").alias("sum_simpson_e6"),
            F.min("simpson_e6").alias("min_simpson_e6"),
            F.max("simpson_e6").alias("max_simpson_e6"),
        )
    )
