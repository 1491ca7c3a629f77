"""Text analysis operators over a ``documents(doc_id, text, lang, ...)`` table.

Everything except language ID is pure Catalyst expressions (whole-stage
codegen, zero Python in the hot path); language ID scores character n-gram
profiles inside an Arrow-batched ``mapInPandas``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..util import ensure_parallelism

# tokenization shared by every operator (and mirrored in the oracle SQL):
# trim then split on runs of whitespace


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


def fingerprints(docs: DataFrame) -> DataFrame:
    """Per-document fingerprint: md5 + length + token count.

    Scale: narrow projection over one scan; md5 is JVM-side.  The md5 column
    is the join key for exact dedup across 100 TB (hash once, shuffle the
    16-byte digest, never the text).
    """
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
    )


def token_stats_by_lang(docs: DataFrame) -> DataFrame:
    """Corpus token statistics grouped by language tag."""
    d = docs.select(
        "lang",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.max("n_tokens").alias("max_tokens"),
    )


# GPT-2-style pre-tokenizer pattern, restricted to syntax both Java regex
# (Spark) and RE2 (DuckDB) support so the operator stays oracle-checkable:
# contraction suffixes, letter runs, digit runs, punctuation runs (each
# optionally preceded by one space)
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_counts(docs: DataFrame) -> DataFrame:
    """Subword-style token counts: whitespace tokens vs BPE-ish regex
    pieces per document (the standard cheap proxy for LLM token budgets)."""
    return docs.select(
        "doc_id",
        "lang",
        F.size(_tokens(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias("bpe_tokens"),
    )


_ROLL_BASE = 131
_ROLL_MOD = 2147483647  # 2^31 - 1; keeps acc*131 + 2^32 far inside long range


def rolling_fingerprints(docs: DataFrame) -> DataFrame:
    """Order-sensitive polynomial rolling hash over the token stream
    (h = (h*131 + tokhash) mod 2^31-1).

    Unlike the md5 content digest this distinguishes permutations cheaply
    and composes incrementally; the per-token value is the first 32 bits of
    md5 so the same fold is expressible in the DuckDB oracle."""
    tok_val = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")  # noqa: E731
    fingerprint = F.aggregate(
        F.transform(_tokens(F.col("text")), tok_val),
        F.lit(0).cast("long"),
        lambda acc, v: (acc * _ROLL_BASE + v) % _ROLL_MOD,
    )
    return docs.select(
        "doc_id",
        fingerprint.alias("rolling_hash"),
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
    )


def top_bigrams(docs: DataFrame, k: int = 20) -> DataFrame:
    """Most frequent word bigrams across the corpus (deterministic
    tie-break on the bigram text)."""
    # tokens materialized in their own projection: the raw split() would be
    # re-evaluated at every reference below (see _shingles in dedup.py)
    t = docs.select(_tokens(F.lower(F.col("text"))).alias("toks"))
    pair_at = lambda i: F.array_join(F.slice("toks", i, 2), " ")  # noqa: E731
    # sequence(1, 0) would count DOWN; guard docs with fewer than 2 tokens
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(F.sequence(F.lit(1), F.size("toks") - 1), pair_at),
    ).otherwise(F.array().cast("array<string>"))
    return (
        t.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(k)
    )


_STOPWORDS = ("the", "a")


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality signals: stopword ratio, vocabulary diversity,
    mean token length -- the standard cheap filters of a pretraining
    pipeline, all as native array expressions."""
    toks = _tokens(F.col("text"))
    d = docs.select(
        "doc_id",
        "lang",
        toks.alias("toks"),
        F.length("text").alias("n_chars"),
    ).select(
        "doc_id",
        "lang",
        F.size("toks").alias("n_tokens"),
        F.size(F.filter("toks", lambda x: x.isin(*_STOPWORDS))).alias("n_stop"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        "n_chars",
    )
    safe_n = F.nullif(F.col("n_tokens"), F.lit(0))
    return d.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round(F.col("n_stop").cast("double") / safe_n, 6).alias("stopword_ratio"),
        F.round(F.col("n_distinct").cast("double") / safe_n, 6).alias("distinct_ratio"),
        F.round(F.col("n_chars").cast("double") / safe_n, 6).alias("avg_token_len"),
    )


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): the
    fraction of tokens taken by the single most frequent token and the
    fraction of word trigrams that are repeats of an earlier trigram in
    the same document.  Repetitive boilerplate (nav bars, keyword stuffing,
    degenerate generations) scores high on both and gets filtered before
    training.

    Scale: the unigram branch aggregates at (doc_id, term) grain map-side
    before the doc-level re-aggregate; the trigram branch is pure array
    expressions (zero shuffle, whole-stage codegen) -- trigrams never
    explode into rows.  The final join is doc_id-keyed, high cardinality,
    AQE-planned.
    """
    toks = _tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks"))

    tf = base.select("doc_id", F.explode("toks").alias("term")).groupBy(
        "doc_id", "term"
    ).agg(F.count(F.lit(1)).alias("tf"))
    uni = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.round(F.max("tf").cast("double") / F.sum("tf"), 6).alias(
            "top_unigram_frac"
        ),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("tf"), 6).alias(
            "distinct_token_frac"
        ),
    )

    n = F.size("toks")
    tri = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(2)),
            lambda i: F.concat_ws(
                " ",
                F.element_at("toks", i),
                F.element_at("toks", i + 1),
                F.element_at("toks", i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    trig = base.select("doc_id", tri.alias("tri")).select(
        "doc_id",
        F.when(
            F.size("tri") > 0,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct("tri")).cast("double")
                / F.size("tri"),
                6,
            ),
        ).alias("dup_trigram_frac"),
    )
    return uni.join(trig, "doc_id")


# character-trigram profiles for the five testdata languages.  On real data
# you would learn these from a labelled corpus; the profiles below encode
# well-known distinctive character sequences per language.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "ing", "and", "ion", " th", "er ", "he "),
    "es": ("que", "ción", "de ", "la ", "os ", "ente"),
    "fr": ("les", "de ", "ent", "que", "eur", "oir"),
    "de": ("der", "die", "und", "sch", "ein", "cht"),
    "zh": ("的", "是", "了", "在", "人", "有"),
}


def language_id(docs: DataFrame) -> DataFrame:
    """N-gram-heuristic language identification (rows-only check).

    Scores each document against per-language character n-gram profiles in
    a vectorized ``mapInPandas`` stage.  Scale: embarrassingly parallel map,
    no shuffle; Arrow batches keep Python overhead amortized.
    """
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("predicted_lang", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ])
    profiles = {k: tuple(v) for k, v in _LANG_PROFILES.items()}

    def score_batches(batches):
        import pandas as pd

        langs = sorted(profiles)
        for pdf in batches:
            if pdf.empty:
                continue
            texts = pdf["text"].fillna("").str.lower()
            n = np.maximum(texts.str.len().to_numpy(), 1)
            scores = np.zeros((len(pdf), len(langs)))
            for j, lang in enumerate(langs):
                for gram in profiles[lang]:
                    scores[:, j] += texts.str.count(gram, flags=0).to_numpy()
            scores = scores / n[:, None]
            best = scores.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "predicted_lang": [langs[i] for i in best],
                    # half-up rounding (matching SQL round()), not
                    # np.round's half-to-even: 5/128 must print .039063
                    # on both sides of the oracle comparison
                    "score": np.floor(
                        scores[np.arange(len(pdf)), best] * 1e6 + 0.5
                    ) / 1e6,
                }
            )

    docs = ensure_parallelism(docs.select("doc_id", "lang", "text"))
    return docs.mapInPandas(score_batches, schema)


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 512,
    shard_col: str = "lang",
    order_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing for context-window assembly: within each shard,
    documents in ``order_col`` order are assigned to consecutive bins of
    ~``budget_tokens`` whitespace tokens.

    Packing rule is *contiguous prefix-sum binning*: a document's bin is
    ``floor(exclusive_prefix_token_sum / budget)``, so bins hold >= budget
    tokens once closed and a boundary-straddling document stays in the bin
    where it started (downstream truncation/splitting handles the
    overflow, as in standard LLM pre-training packers).  Unlike first-fit
    bin packing this rule is a pure window expression -- deterministic,
    shuffle-once, and ORACLE-CHECKABLE -- while wasting no slots on
    reordering (docs are already shard-grouped).

    Scale: one shuffle on ``shard_col``; each shard packs independently,
    so parallelism = shard count.  At 100 TB shard by a high-cardinality
    key (e.g. ``pmod(hash(doc_id), 10_000)``) rather than language; the
    packing math is identical.

    Returns one row per document: shard, order key, token count, exclusive
    prefix sum and ``bin_id``.
    """
    from pyspark.sql import Window

    toks = F.size(_tokens(F.col("text"))).cast("long")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(shard_col, order_col, toks.alias("n_tokens"))
        .withColumn(
            "prev_tokens", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .withColumn(
            "bin_id",
            F.floor(F.col("prev_tokens") / F.lit(float(budget_tokens))).cast("long"),
        )
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3, materialize: bool = True) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``).

    Scale: the term explode is the big intermediate (one row per token),
    but it aggregates immediately to (doc_id, term) grain -- partial
    map-side combine eats most of it before the shuffle.  Document
    frequency re-aggregates the ALREADY-deduped tf relation (never a
    second pass over the raw token stream), and the doc count is a scalar
    broadcast.  The df join keys on term; AQE broadcasts it when the
    vocabulary is small and falls back to a shuffle join when it isn't.
    The per-doc top-k window partitions on doc_id with a deterministic
    (score desc, term asc) order -- terms are unique within a document
    after the tf group-by, so ranks cannot tie.
    """
    from pyspark.sql import Window

    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf feeds BOTH the df re-aggregate and the probe side of the join;
    # materialize it once or the token explode runs twice (measured ~35%
    # on sf0.1; at production scale persist to parquet instead).
    # materialize=False keeps full lineage for plan audits.
    if materialize:
        tf = tf.localCheckpoint(eager=True)
    df = tf.groupBy(F.col("term").alias("df_term")).agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * (
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("raw_score"), F.asc("term"))
    return (
        tf.join(df, F.col("term") == F.col("df_term"))
        .join(F.broadcast(n_docs))
        .withColumn("raw_score", score)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id", "term", F.round("raw_score", 6).alias("tfidf"), "rnk"
        )
    )


def doc_length_histogram(docs: DataFrame, width: int = 50) -> DataFrame:
    """Histogram of document character lengths in fixed-width buckets.

    Scale: single scan reading ONE column (n_chars is precomputed in the
    table; the text column never leaves the parquet footer), partial
    aggregation on a domain-bounded key -- the classic zero-risk query.
    """
    bucket = (F.floor(F.col("n_chars") / width) * width).cast("long")
    return (
        docs.groupBy(bucket.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


def source_mixture_weights(
    docs: DataFrame, alpha: float = 0.5, budget_docs: int = 100_000
) -> DataFrame:
    """Temperature-scaled training-mix weights per source:
    ``weight(s) = n_s^alpha / sum_t n_t^alpha`` with a document budget
    apportioned by weight (alpha < 1 upweights small sources -- the
    standard multilingual/multi-source mixing rule).

    Scale: one count-by-source aggregate (domain-bounded key), then a
    scalar re-aggregate of that tiny result broadcast back -- the fact
    table is scanned once regardless of source count.
    """
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    z = per.agg(F.sum(F.pow("n_docs", F.lit(alpha))).alias("z"))
    w = F.pow("n_docs", F.lit(alpha)) / F.col("z")
    return per.join(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.round(w, 6).alias("mix_weight"),
        F.floor(w * budget_docs + 0.5).cast("long").alias("target_docs"),
    )


def compression_ratios(docs: DataFrame) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) -- the
    classic redundancy-based quality signal: near-1 ratios mean
    high-entropy (random-ish) text, very low ratios mean boilerplate or
    repetition loops; both tails are usually filtered before training.

    Scale: a scalar Arrow-batched pandas UDF (zlib runs at C speed per
    document, the Python loop is per-doc not per-byte); narrow projection
    (doc_id, lang, text) and no shuffle at all -- embarrassingly parallel
    over whatever partitioning the scan produces.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(texts):
        import zlib

        def one(t):
            raw = t.encode("utf-8") if t else b""
            if not raw:
                return 1.0
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    return ensure_parallelism(docs).select(
        "doc_id", "lang", ratio(F.col("text")).alias("comp_ratio")
    )


def trigram_redundancy(docs: DataFrame) -> DataFrame:
    """Per-language distinct-character-trigram redundancy -- the
    deterministic, engine-portable twin of the zlib compression-ratio
    signal (``compression_quality``): repetitive/boilerplate text reuses
    the same trigrams, so ``1 - distinct/total`` rises exactly where the
    zlib ratio falls.  zlib's byte stream is library-defined and can
    never be replayed by another engine; this proxy is pure integer
    counting with ONE final division, so the double is bit-identical
    across Spark and DuckDB and the query is oracle-checkable.

    Scale: per-doc trigram extraction is a JVM higher-order transform
    over a sequence (no Python, no shuffle); the only shuffle is the
    per-language integer rollup with map-side combine.
    """
    t = F.col("text")
    per_doc = ensure_parallelism(docs).filter(F.length(t) >= 3).select(
        "lang",
        F.size(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - F.lit(2)),
                    lambda i: t.substr(i, F.lit(3)),
                )
            )
        ).cast("long").alias("dt"),
        (F.length(t) - F.lit(2)).cast("long").alias("tt"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dt").cast("long").alias("distinct_trigrams"),
        F.sum("tt").cast("long").alias("total_trigrams"),
        (
            F.lit(1.0) - F.sum("dt").cast("double") / F.sum("tt").cast("double")
        ).alias("redundancy"),
    )


def compression_quality(docs: DataFrame) -> DataFrame:
    """Per-language compression-ratio profile (n, mean, min, max) --
    the aggregate view used to pick filter thresholds."""
    return (
        compression_ratios(docs)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("comp_ratio"), 6).alias("mean_ratio"),
            F.round(F.min("comp_ratio"), 6).alias("min_ratio"),
            F.round(F.max("comp_ratio"), 6).alias("max_ratio"),
        )
    )


# regexes shared with the oracle SQL (RE2-compatible so Java regex and
# DuckDB produce identical matches)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
_PII_IPV4 = r"\b\d{1,3}(\.\d{1,3}){3}\b"


def pii_redaction(docs: DataFrame) -> DataFrame:
    """PII scrub: count and mask emails / phone numbers / IPv4 addresses.

    The standard pre-training privacy pass (cf. BigScience ROOTS, Dolma):
    detect with conservative regexes, replace with typed sentinel tokens so
    downstream tokenization stays stable.  Returns counts plus the md5 of
    the redacted text (the full text never needs to leave the executors to
    verify the rewrite).

    Scale: pure JVM regexp expressions in one whole-stage-codegen pass over
    a single scan -- zero shuffle, zero Python; at 100 TB this is I/O-bound
    on the text column exactly like any other map-only pass.
    """
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL, "[EMAIL]"),
            _PII_IPV4,
            "[IP]",
        ),
        _PII_PHONE,
        "[PHONE]",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_PHONE), F.lit(0))).alias("n_phones"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_IPV4), F.lit(0))).alias("n_ipv4"),
        F.md5(redacted).alias("redacted_fp"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


def c4_quality_filter(
    docs: DataFrame,
    min_words: int = 15,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_distinct_ratio: float = 0.1,
) -> DataFrame:
    """C4-style heuristic keep/drop filter (Raffel et al. 2020, sec. 2.2).

    Emits the individual signals plus the final ``keep`` verdict so the
    thresholds can be re-tuned without recomputing: word count, mean word
    length band, vocabulary diversity, boilerplate markers (curly braces,
    'lorem ipsum').

    Scale: one scan, array expressions only, no shuffle; the filter is a
    map-only pass that typically drops 30-60% of raw web text before any
    expensive (dedup/LSH) stage runs -- order it first in the pipeline.
    """
    toks = _tokens(F.col("text"))
    d = docs.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length(F.regexp_replace(F.col("text"), r"\s", "")).alias("n_nonspace"),
        F.col("text").contains("{").alias("has_brace"),
        F.lower(F.col("text")).contains("lorem ipsum").alias("has_lorem"),
    )
    safe_n = F.nullif(F.col("n_words"), F.lit(0)).cast("double")
    mean_len = F.col("n_nonspace") / safe_n
    distinct_ratio = F.col("n_distinct") / safe_n
    keep = (
        (F.col("n_words") >= min_words)
        & mean_len.between(min_mean_word_len, max_mean_word_len)
        & (distinct_ratio >= min_distinct_ratio)
        & ~F.col("has_brace")
        & ~F.col("has_lorem")
    )
    return d.select(
        "doc_id",
        "n_words",
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        "has_brace",
        "has_lorem",
        keep.alias("keep"),
    )


def duplicate_ngram_fraction(
    docs: DataFrame, n: int = 5, min_docs: int = 2
) -> DataFrame:
    """Cross-document duplicated n-gram fraction (Dolma/RefinedWeb-style
    paragraph-dedup signal generalized to shingles): for each document, the
    fraction of its DISTINCT word n-grams that also occur in at least
    ``min_docs`` documents corpus-wide.  High values flag boilerplate and
    templated spam that exact- and MinHash-dedup both miss (the documents
    differ, the phrases repeat).

    Scale: the shingle explode aggregates immediately to (doc_id, gram)
    grain -- distinct-per-doc -- so corpus document frequency is ONE count
    per gram over that deduped relation (partial map-side combine applies).
    The df relation joins back on gram; AQE broadcasts it while the
    vocabulary of repeated grams is small and falls back to a shuffle join
    at web scale.  Documents shorter than ``n`` words have no shingles and
    are absent from the output (matches the oracle).

    Implementation notes (measured 100x on the sf0.1 corpus): tokens are
    materialized behind their own projection so gram construction
    references a column, not 5 re-evaluations of ``split()`` per gram; the
    exploded (doc_id, gram) relation feeds BOTH the df build and the
    probe side, so it is localCheckpointed once instead of being computed
    twice (at production scale: write it to parquet and read it back).
    """
    t = ensure_parallelism(docs).select(
        "doc_id", _tokens(F.lower(F.trim(F.col("text")))).alias("toks")
    ).filter(F.size("toks") >= n)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.array_join(F.slice("toks", i + 1, n), " "),
        )
    )
    ex = t.select("doc_id", F.explode(grams).alias("gram"))
    ex = ex.localCheckpoint(eager=True)
    dfreq = ex.groupBy(F.col("gram").alias("df_gram")).agg(
        F.count(F.lit(1)).alias("df")
    )
    return (
        ex.join(dfreq, F.col("gram") == F.col("df_gram"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum((F.col("df") >= min_docs).cast("long")).alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_dup",
            F.round(
                F.col("n_dup").cast("double") / F.col("n_ngrams"), 6
            ).alias("dup_fraction"),
        )
    )


def deterministic_shards(docs: DataFrame, n_shards: int = 16) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data layout:
    every document is assigned a shard by a content-independent hash of its
    id (first hex digit of md5 for the 16-shard default), and ordering
    within a shard follows the full md5 -- a stable pseudo-random
    permutation that is reproducible across engines, runs, and partition
    counts (no ``rand()``, no ``monotonically_increasing_id``).

    Returns the per-shard manifest (count, byte total, deterministic first
    document) -- the thing a dataloader consumes.

    Scale: shard assignment is a map-only expression; the manifest is a
    16-group aggregate.  The actual data movement for writing shards is
    ``repartition(n_shards, shard)`` + ``sortWithinPartitions(md5)`` --
    one shuffle, each task writes one shard file sequentially.
    """
    if n_shards != 16:
        raise ValueError("manifest form is defined for the 16-shard default")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.conv(F.substring(h, 1, 1), 16, 10).cast("int")
    return (
        docs.select(
            shard.alias("shard"),
            h.alias("h"),
            F.col("doc_id"),
            F.col("n_chars"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min_by("doc_id", F.col("h")).alias("first_doc_id"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def source_quota_cap(docs: DataFrame, k: int = 20, n_salts: int = 32) -> DataFrame:
    """Cap any single source's contribution at ``k`` documents, choosing
    deterministically (md5 order, a stable pseudo-random draw) rather than
    by arrival order -- the standard guard against one crawl domain
    dominating the training mixture.

    Scale: computed as a TWO-LEVEL cap so a giant skewed source never
    serializes through one window task.  Level 1 pre-caps each
    (source, salt) bucket at ``k`` -- ``n_salts`` parallel windows per
    source, each seeing ~1/n_salts of its rows.  The per-source global
    top-k in md5 order is provably contained in the survivors (every
    bucket keeps ITS k smallest, and the global k smallest land in at
    most k buckets each contributing theirs), so level 2 ranks only
    ``<= n_salts * k`` rows per source -- a few thousand rows regardless
    of input size.  Result is identical to the single-window spelling,
    which is exactly what the DuckDB oracle runs.
    """
    from pyspark.sql import Window

    h = F.md5(F.col("doc_id").cast("string"))
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts))
    w1 = Window.partitionBy("source", "salt").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    w2 = Window.partitionBy("source").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", "n_chars", h.alias("h"), salt.alias("salt"))
        .withColumn("pre_rk", F.row_number().over(w1))
        .filter(F.col("pre_rk") <= k)
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("doc_id", "source", "n_chars", F.col("rk").alias("quota_rank"))
    )


def write_training_shards(docs: DataFrame, path: str, n_shards: int = 16) -> None:
    """Materialize the :func:`deterministic_shards` layout: one directory
    per shard (``shard=N/``), rows inside each shard files sorted by the
    full md5 -- the reproducible globally-shuffled layout a dataloader
    reads sequentially.

    Scale: one shuffle (repartition on the shard value), then each task
    sorts and streams its shard; directory partitioning keeps shard
    selection a file-listing operation for the consumer.  Shard files
    are written with the split-friendly row-group bounds and the layout
    is audited post-write (``sources.audit_scan_parallelism``,
    metadata-only) -- a training-shard layout that can only be decoded
    one-task-per-shard would silently serialize every epoch's read, so
    a starved layout raises a warning naming the offending files.
    """
    from ..sources.io import (
        DEFAULT_MAX_GROUP_BYTES,
        DEFAULT_MAX_GROUP_ROWS,
        audit_scan_parallelism,
    )

    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.conv(F.substring(h, 1, 1), 16, 10).cast("int")
    if n_shards != 16:
        raise ValueError("shard fn is defined for the 16-shard default")
    (
        docs.withColumn("h", h)
        .withColumn("shard", shard)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "h")
        .write.mode("overwrite")
        .option("parquet.block.size", DEFAULT_MAX_GROUP_BYTES)
        .option("parquet.block.row.count.limit", DEFAULT_MAX_GROUP_ROWS)
        .partitionBy("shard")
        .parquet(path)
    )
    starved = [
        r["file"]
        for r in audit_scan_parallelism(docs.sparkSession, path).collect()
        if r["starved"]
    ]
    if starved:
        import warnings

        warnings.warn(
            "write_training_shards produced a scan-starved layout "
            f"({len(starved)} file(s), e.g. {starved[0]}); later reads "
            "will serialize per file -- check the row-group bounds",
            stacklevel=2,
        )


def materialize_packs(
    docs: DataFrame,
    budget_tokens: int = 512,
    shard_col: str = "lang",
    order_col: str = "doc_id",
    sep: str = "<eos>",
) -> DataFrame:
    """Assemble the ACTUAL packed training sequences from the
    :func:`pack_sequences` bin assignment: per (shard, bin), documents
    concatenated in order with an EOS separator -- what the tokenizer
    consumes.  Emits the pack fingerprint/length rather than shipping the
    packed text to the driver.

    Scale: the pack assignment joins back on (shard, order) -- both sides
    share the shard shuffle -- and the concat is an ordered group
    aggregate whose state is one bin's documents (~budget tokens).
    """
    packed = pack_sequences(docs, budget_tokens, shard_col, order_col)
    joined = docs.select(shard_col, order_col, "text").join(
        packed.select(shard_col, order_col, "n_tokens", "bin_id"),
        [shard_col, order_col],
    )
    parts = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col("text").alias("t")))
    )
    pack_text = F.array_join(F.transform(parts, lambda s: s.getField("t")), sep)
    return (
        joined.groupBy(shard_col, "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            pack_text.alias("packed"),
        )
        .select(
            shard_col,
            "bin_id",
            "n_docs",
            "total_tokens",
            F.md5("packed").alias("packed_fp"),
            F.length("packed").cast("long").alias("packed_len"),
        )
    )


def substring_dup_fraction(
    docs: DataFrame,
    window: int = 32,
    stride: int = 8,
) -> DataFrame:
    """Exact substring-level duplication: the fraction of each document's
    fixed-length character windows that also occur verbatim in ANOTHER
    document (the scalable slice of suffix-array dedup a la Lee et al.
    2021, "Deduplicating Training Data Makes Language Models Better" --
    repeated >=window-char spans are exactly the spans whose aligned
    windows collide).

    Windows start every ``stride`` characters, so the explode emits
    ~len/stride rows per document -- the stride bounds the blow-up at
    corpus scale (stride=8 on 100 TB of text is ~12x row inflation, each
    row reduced to an 8-byte hash before the shuffle).  A window is
    "duplicated" when its hash occurs in >=2 distinct documents; the
    per-window reduce happens map-side first (partial count distinct via
    the (hash, doc_id) pre-group), and the verdict joins back to the
    per-document grain on the same hash key.

    Spark groups windows by ``xxhash64`` (8 bytes shuffled instead of
    ``window`` chars); at ~1e12 windows the collision odds are ~1e-7, the
    standard content-hash dedup tradeoff (reference search.py:35 makes
    the same exactness-by-hash assumption for its point memo).
    """
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length("text") - F.lit(window) + 1, F.lit(1)),
        F.lit(stride),
    )
    wins = docs.select(
        "doc_id",
        "text",
        F.explode(starts).alias("pos"),
    ).select(
        "doc_id",
        F.xxhash64(F.expr(f"substr(text, pos, {window})")).alias("h"),
    )
    # (hash, doc) pre-group: map-side combine collapses within-doc repeats
    per_doc = wins.groupBy("h", "doc_id").agg(F.count(F.lit(1)).alias("n_win"))
    cross_doc = per_doc.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_docs_with")
    )
    return (
        per_doc.join(cross_doc, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("n_win").cast("long").alias("n_windows"),
            F.sum(F.when(F.col("n_docs_with") >= 2, F.col("n_win")).otherwise(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6).alias(
                "dup_fraction"
            ),
        )
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k keyword search over the corpus (the retrieval
    primitive behind quality-classifier seed sets and targeted corpus
    probes).  ``score(d) = sum_q idf(q) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
    with the +1-smoothed idf ``ln(1 + (N-df+0.5)/(df+0.5))``.

    Scale: the token explode aggregates immediately to (doc_id, term)
    grain -- map-side combine -- and that ONE aggregate is materialized
    and re-derived three ways (document lengths, query-term postings,
    document frequencies), so the corpus is tokenized exactly once (the
    ``tfidf_top_terms`` materialize pattern; the naive spelling re-ran
    the explode per consumer).  Corpus stats (N, avgdl) and per-term
    document frequencies are scalar/tiny aggregates joined by broadcast;
    the final top-k is a TakeOrderedAndProject, never a full sort.  At
    production scale the (doc, term) relation is the inverted-index
    build -- persist it to parquet and amortize across queries.
    """
    terms = [t.lower() for t in query_terms]
    tf_all = (
        docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tf_all.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = tf_all.filter(F.col("term").isin(terms))
    df = tf.groupBy(F.col("term").alias("df_term")).agg(
        F.count(F.lit(1)).alias("df")
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df), F.col("term") == F.col("df_term"))
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(contrib), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking (context-window prep / RAG
    ingestion): token windows of ``chunk_tokens`` starting every
    ``chunk_tokens - overlap`` tokens, last window short.  Emits the chunk
    fingerprint and token count rather than the chunk text (same
    bounded-output convention as ``materialize_packs``).

    Chunk count is ``max(1, ceil((n - overlap) / stride))`` so every token
    is covered and no chunk is fully contained in its predecessor.

    Scale: pure map-side expression work -- tokenize once, explode one
    small index array per document, slice/join/hash in codegen.  No
    shuffle at all; output grain is (doc, chunk).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim("text"), r"\s+")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.floor((n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride))
        .cast("int"),
        F.lit(1),
    )
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return base.select(
        "doc_id",
        "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_fp"),
    )


def token_budget_mixture(docs: DataFrame, budget_den: int = 5) -> DataFrame:
    """Token-budgeted mixture selection -- the pretraining sampling op
    that :func:`source_quota_cap` (a DOC-count cap) is not: give every
    source an equal share of a global TOKEN budget (1/``budget_den`` of
    the corpus' tokens, split evenly across sources) and fill each
    share in deterministic md5 order, keeping a document while the
    source's running token total still fits.  Sources smaller than
    their share keep everything; the integer allocation is never
    exceeded.  Returns the kept documents as (doc_id, source, n_tokens,
    cum_tokens).

    Scale: the naive spelling is one window per source (a giant skewed
    source serializes through one task).  Computed instead at two
    levels, provably identical to the single-window spelling (which is
    exactly what the DuckDB oracle runs): documents bucket by their
    md5's first 2 hex chars -- hex-prefix buckets ORDER consistently
    with the md5 ordering -- so (1) a (source, bucket)-grain token
    pre-aggregate (256-way parallel) plus a window over that TINY
    relation yields each bucket's exclusive running start; (2) buckets
    whose start already exceeds the allocation are pruned by a
    broadcast join BEFORE any doc-grain work, bounding the doc-grain
    windows to ~the selected mass plus one boundary bucket per source;
    (3) the doc-grain cumulative sum partitions by (source, bucket) --
    256-way parallel within every source -- and global position =
    bucket start + within-bucket running sum.  The allocation scalar
    broadcasts; integer arithmetic end to end, so the oracle compare is
    exact."""
    from pyspark.sql import Window

    d = docs.select(
        "doc_id",
        "source",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn("b", F.substring("h", 1, 2))
    alloc = (
        d.agg(
            F.sum("n_tokens").cast("long").alias("total"),
            F.countDistinct("source").alias("ns"),
        )
        .select(
            F.expr(f"(total div {int(budget_den)}) div ns")
            .cast("long")
            .alias("alloc")
        )
    )
    per_bucket = d.groupBy("source", "b").agg(
        F.sum("n_tokens").cast("long").alias("bt")
    )
    wb = Window.partitionBy("source").orderBy("b")
    starts = per_bucket.withColumn(
        "bucket_start", (F.sum("bt").over(wb) - F.col("bt")).cast("long")
    )
    cand = (
        starts.crossJoin(F.broadcast(alloc))
        .filter(F.col("bucket_start") <= F.col("alloc"))
        .select("source", "b", "bucket_start", "alloc")
    )
    wd = Window.partitionBy("source", "b").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return (
        d.join(F.broadcast(cand), ["source", "b"])
        .withColumn(
            "cum_tokens",
            (F.col("bucket_start") + F.sum("n_tokens").over(wd)).cast("long"),
        )
        .filter(F.col("cum_tokens") <= F.col("alloc"))
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )
