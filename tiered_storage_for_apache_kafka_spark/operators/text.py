"""Text-analysis operators for the training-data pipeline.

All of these are pure column expressions (JVM-side, whole-stage codegen) —
no Python UDFs in the hot path. At 100 TB these run as narrow map stages
over the document scan: no shuffle at all except `corpus_lang_profile`'s
final tiny aggregation.

Portability with the DuckDB oracle: token/marker counting uses
``regexp_count``-style counting of ``\\S+`` / word-boundary patterns
(identical semantics in Java regex and RE2); fingerprints are md5 hex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiered_storage_for_apache_kafka_spark.operators.registry import query
from tiered_storage_for_apache_kafka_spark.tables import load_table, scan_parallel

# language marker words for the n-gram-free lang-ID heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
    "zh": ["de", "shi", "le"],
}


@query(
    "token_count",
    oracle=r"""
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_measured,
       CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_words,
       CAST(LEN(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
FROM documents
""",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + wordlike token counting (the whitespace/BPE-ish
    tokenizer-feeding statistics stage of a training-data pipeline)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(r"\S+")).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
        F.regexp_count(F.col("text"), F.lit("[A-Za-z0-9]+"))
        .cast("bigint")
        .alias("n_words"),
        F.regexp_count(F.col("text"), F.lit("[0-9]")).cast("bigint").alias("n_digits"),
    )


@query(
    "text_quality",
    oracle=r"""
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_measured,
       CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(LEN(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
       CAST(LEN(regexp_extract_all(lower(text), '\bthe\b|\band\b|\bof\b|\ba\b')) AS BIGINT)
         AS n_stopwords,
       CASE WHEN LENGTH(text) >= 100
             AND LEN(regexp_extract_all(text, '\S+')) >= 20
            THEN 1 ELSE 0 END AS quality_pass
FROM documents
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation / stopword-ratio signals and a
    boolean gate — the classic pre-training quality filter, as pure column
    expressions."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.regexp_count(F.col("text"), F.lit(r"\S+")).cast("bigint")
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_measured"),
        n_tokens.alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit("[.,;:!?]")).cast("bigint").alias("n_punct"),
        F.regexp_count(F.lower(F.col("text")), F.lit(r"\bthe\b|\band\b|\bof\b|\ba\b"))
        .cast("bigint")
        .alias("n_stopwords"),
        F.when((F.length("text") >= 100) & (n_tokens >= 20), F.lit(1))
        .otherwise(F.lit(0))
        .alias("quality_pass"),
    )


def _marker_counts_spark(col):
    out = []
    for lang, words in _LANG_MARKERS.items():
        pat = "|".join(rf"\b{w}\b" for w in words)
        out.append(F.regexp_count(F.lower(col), F.lit(pat)).cast("bigint").alias(f"score_{lang}"))
    return out


def _marker_counts_sql() -> str:
    parts = []
    for lang, words in _LANG_MARKERS.items():
        pat = "|".join(rf"\b{w}\b" for w in words)
        parts.append(
            f"CAST(LEN(regexp_extract_all(lower(text), '{pat}')) AS BIGINT) AS score_{lang}"
        )
    return ",\n       ".join(parts)


@query(
    "lang_id",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
       {_marker_counts_sql()}
  FROM documents
)
SELECT doc_id, lang,
       score_en, score_de, score_fr, score_es, score_zh,
       CASE
         WHEN score_en >= score_de AND score_en >= score_fr
          AND score_en >= score_es AND score_en >= score_zh THEN 'en'
         WHEN score_de >= score_fr AND score_de >= score_es
          AND score_de >= score_zh THEN 'de'
         WHEN score_fr >= score_es AND score_fr >= score_zh THEN 'fr'
         WHEN score_es >= score_zh THEN 'es'
         ELSE 'zh'
       END AS predicted_lang
FROM scored
""",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (n-gram heuristic): score each language by
    stopword-marker hits, argmax with a fixed precedence order so the
    prediction is deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "lang", *_marker_counts_spark(F.col("text")))
    s = {lang: F.col(f"score_{lang}") for lang in _LANG_MARKERS}
    pred = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] >= s["zh"]),
            F.lit("en"),
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] >= s["zh"]), F.lit("de"))
        .when((s["fr"] >= s["es"]) & (s["fr"] >= s["zh"]), F.lit("fr"))
        .when(s["es"] >= s["zh"], F.lit("es"))
        .otherwise(F.lit("zh"))
    )
    return scored.select(
        "doc_id",
        "lang",
        "score_en",
        "score_de",
        "score_fr",
        "score_es",
        "score_zh",
        pred.alias("predicted_lang"),
    )


@query(
    "doc_fingerprint",
    oracle=r"""
SELECT doc_id,
       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint,
       substr(md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), 1, 8) AS bucket
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercase
    text (the canonical-form hash used as the exact-dedup key)."""
    docs = load_table(spark, sf_dir, "documents")
    canon = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    return docs.select(
        "doc_id",
        canon.alias("fingerprint"),
        F.substring(canon, 1, 8).alias("bucket"),
    )


@query(
    "corpus_lang_profile",
    oracle=r"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(LEN(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY lang
""",
)
def corpus_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level rollup per language — the monitoring aggregate a
    pipeline emits per ingest batch."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.regexp_count(F.col("text"), F.lit(r"\S+")))
        .cast("bigint")
        .alias("total_tokens"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


WINNOW_K = 3  # k-gram size (words) for the rolling hash
WINNOW_W = 4  # winnowing window: one fingerprint per w consecutive hashes


@query(
    "doc_winnow_fingerprint",
    oracle=f"""
WITH grams AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(len(string_split_regex(trim(text), '\\s+')) - {WINNOW_K - 1}, 1)),
           i -> md5(array_to_string(string_split_regex(trim(text), '\\s+')[i:i+{WINNOW_K - 1}], ' '))
         ) AS hashes
  FROM documents
), winnowed AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform(
           generate_series(1, greatest(len(hashes) - {WINNOW_W - 1}, 1)),
           j -> list_min(hashes[j:j+{WINNOW_W - 1}])
         ))) AS fps
  FROM grams
)
SELECT doc_id,
       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       md5(array_to_string(fps, ',')) AS fingerprint_digest
FROM winnowed
""",
)
def doc_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme):
    hash every word k-gram, slide a w-wide window, keep each window's
    minimum hash — guaranteeing any match of length >= w+k-1 shares a
    fingerprint — then emit the deduplicated fingerprint set per doc.
    Pure JVM array expressions: no explode, no shuffle at all (the
    whole operator is a narrow map stage)."""
    docs = scan_parallel(load_table(spark, sf_dir, "documents"), spark)
    k, w = WINNOW_K, WINNOW_W
    # staged projections: each expensive array is computed once per row
    # (CollapseProject keeps non-cheap lambda exprs in their own stage).
    # The split is staged too: Catalyst does no loop-invariant code
    # motion inside HOF lambdas, so split-in-the-lambda would re-split
    # the full text once per k-gram (O(words^2) per doc).
    with_words = docs.select(
        "doc_id", F.expr("split(trim(text), '\\\\s+')").alias("ws")
    )
    with_hashes = with_words.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, greatest(size(ws) - {k - 1}, 1)), "
            f"i -> md5(array_join(slice(ws, i, {k}), ' ')))"
        ).alias("hashes"),
    )
    with_fps = with_hashes.select(
        "doc_id",
        F.expr(
            f"array_sort(array_distinct(transform("
            f"sequence(1, greatest(size(hashes) - {w - 1}, 1)), "
            f"j -> array_min(slice(hashes, j, {w})))))"
        ).alias("fps"),
    )
    return with_fps.select(
        "doc_id",
        F.size("fps").cast("bigint").alias("n_fingerprints"),
        F.md5(F.array_join("fps", ",")).alias("fingerprint_digest"),
    )


@query(
    "gopher_repetition_signals",
    oracle=r"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM base WHERE len(t) >= 2
), bgc AS (
  SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram
), bga AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         COUNT(*) AS n_distinct_bigrams,
         CAST(MAX(c) AS BIGINT) AS top_bigram_count
  FROM bgc GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.t) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(b.t)) AS BIGINT) AS n_distinct_tokens,
       COALESCE(a.n_bigrams, 0) AS n_bigrams,
       COALESCE(a.n_distinct_bigrams, 0) AS n_distinct_bigrams,
       COALESCE(a.top_bigram_count, 0) AS top_bigram_count,
       CASE WHEN 5 * COALESCE(a.top_bigram_count, 0) <= COALESCE(a.n_bigrams, 0)
             AND 2 * (len(b.t) - len(list_distinct(b.t))) <= len(b.t)
            THEN 1 ELSE 0 END AS repetition_pass
FROM base b LEFT JOIN bga a ON a.doc_id = b.doc_id
""",
)
def gopher_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition quality signals (Rae et al. 2021
    table A1): per-document duplicate-token and top-2-gram counts, plus
    the combined pass gate (top bigram <= 20% of bigrams AND duplicate
    tokens <= 50% of tokens), thresholds decided by exact integer
    cross-multiplication.

    Plan shape: token counts are per-row array expressions (size /
    array_distinct — no shuffle); the top-bigram frequency genuinely
    needs a per-(doc, bigram) count, done with ONE explode and two
    doc-keyed aggregations (a per-row O(n^2) highest-multiplicity array
    expression would blow up on long documents). At 100 TB both
    shuffles key on doc_id(+bigram) — uniform, bounded by doc length."""
    from tiered_storage_for_apache_kafka_spark.operators.dedup import tokens_cached

    base = tokens_cached(spark, sf_dir).select("doc_id", F.col("toks").alias("t"))
    tok = base.select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("bigint").alias("n_distinct_tokens"),
    )
    bga = (
        base.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr("transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))")
            ).alias("bigram"),
        )
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
            F.max("c").alias("top_bigram_count"),
        )
    )
    joined = tok.join(bga, "doc_id", "left")
    n_bigrams = F.coalesce("n_bigrams", F.lit(0))
    top_bg = F.coalesce("top_bigram_count", F.lit(0))
    return joined.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        n_bigrams.alias("n_bigrams"),
        F.coalesce("n_distinct_bigrams", F.lit(0)).alias("n_distinct_bigrams"),
        top_bg.alias("top_bigram_count"),
        F.when(
            (5 * top_bg <= n_bigrams)
            & (2 * (F.col("n_tokens") - F.col("n_distinct_tokens")) <= F.col("n_tokens")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("repetition_pass"),
    )


@query(
    "unigram_logprob_quality",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
), freq AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS n FROM freq
), scored AS (
  SELECT t.doc_id, ln((SELECT n FROM tot) / f.c) AS nll
  FROM toks t JOIN freq f ON f.tok = t.tok
)
SELECT doc_id, COUNT(*) AS n_tokens, ROUND(AVG(nll), 4) AS avg_nll
FROM scored GROUP BY doc_id
""",
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality proxy (the CCNet-style statistical
    filter): score every document by the average negative log-likelihood
    of its tokens under the corpus's own unigram distribution — low =
    boilerplate/common, high = rare-token noise; the middle is the
    keep-band.

    Plan shape: ONE token explode feeds both the frequency table and the
    scoring join; the corpus total is a broadcast scalar. The score join
    keys on token — skewed by Zipf's law — so the frequency side is
    broadcast when it fits (vocab is tiny relative to the corpus;
    gated, since raw whitespace vocab at 100 TB can exceed the
    threshold, where AQE's skew-join handles the shuffle fallback).
    Output NLL is rounded to 4 decimals (double math on both engines)."""
    from tiered_storage_for_apache_kafka_spark.operators.dedup import (
        _maybe_broadcast,
        tokens_cached,
    )

    toks = tokens_cached(spark, sf_dir).select(
        "doc_id", F.explode("toks").alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").cast("double").alias("n"))
    scored = (
        toks.join(_maybe_broadcast(freq), "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(F.col("n") / F.col("c")).alias("nll"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("nll"), 4).alias("avg_nll"),
    )


# GPT-2-style pretokenizer, minus the `\s+(?!\S)` lookahead branch (RE2,
# DuckDB's engine, has no lookahead; Java would accept it — keeping the
# pattern to the common subset makes both engines count identically).
# Branches: contraction suffixes, space-prefixed letter runs, digit
# runs, punctuation runs, residual whitespace.
_BPE_PAT = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"
_BPE_PAT_SQL = _BPE_PAT.replace("'", "''")  # escaped for the SQL literal


@query(
    "bpe_token_count",
    oracle=rf"""
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS BIGINT) AS n_bpe_pretokens,
       CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
       CAST(FLOOR(LENGTH(text) / 4.0) AS BIGINT) AS n_chars_div4
FROM documents
""",
)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: the GPT-2 pretokenizer regex (the split
    every byte-pair-encoding tokenizer runs before merges) as a pure JVM
    `regexp_count` — the standard "how many tokens will this document
    cost" estimator of a training-data pipeline, next to the whitespace
    count and the chars/4 rule of thumb.

    Narrow map stage over the document scan: no shuffle, whole-stage
    codegen, ~O(bytes) per partition — the 100 TB plan is scan-shaped."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_BPE_PAT))
        .cast("bigint")
        .alias("n_bpe_pretokens"),
        F.regexp_count(F.col("text"), F.lit(r"\S+")).cast("bigint").alias("n_ws_tokens"),
        F.floor(F.length("text") / F.lit(4.0)).cast("bigint").alias("n_chars_div4"),
    )


@query(
    "tfidf_top_terms",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
), nd AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
), ranked AS (
  SELECT t.doc_id, t.tok, t.tf, d.df,
         ROUND(t.tf * ln((SELECT n FROM nd) / d.df), 4) AS tfidf,
         ROW_NUMBER() OVER (
             PARTITION BY t.doc_id
             ORDER BY t.tf DESC, d.df ASC, t.tok ASC
         ) AS term_rank
  FROM tf t JOIN df d USING (tok)
)
SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf, CAST(term_rank AS BIGINT) AS term_rank
FROM ranked WHERE term_rank <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic-term extraction: top-3 TF-IDF terms per document —
    the classic keyword/topic-signal stage of a corpus analysis pipeline
    (and the deterministic core of TF-IDF featurization).

    Plan shape: the shared cached token table feeds BOTH the per-doc
    term-frequency agg and the document-frequency agg (map-side partial
    aggs, one shuffle each); the df table is vocabulary-sized, so the
    scoring join broadcasts when it fits (gated — raw whitespace vocab
    at 100 TB can exceed the threshold, where AQE takes over); the
    corpus size is a broadcast scalar. Top-k is a per-doc window over
    the tf rows — partitioned by doc_id, never global.

    Portability: ranking uses only integer keys (tf DESC, df ASC, tok) —
    never the float score, whose ulps could differ between engines; the
    score itself is emitted ROUND(...,4) like `unigram_logprob_quality`.
    """
    from tiered_storage_for_apache_kafka_spark.operators.dedup import (
        _maybe_broadcast,
        tokens_cached,
    )
    from pyspark.sql import Window

    toks = tokens_cached(spark, sf_dir).select(
        "doc_id", F.explode("toks").alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    nd = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("tok").asc()
    )
    return (
        tf.join(_maybe_broadcast(df_), "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "tok",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 4).alias("tfidf"),
            F.row_number().over(w).cast("bigint").alias("term_rank"),
        )
        .filter(F.col("term_rank") <= 3)
    )
