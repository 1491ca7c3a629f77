"""Distributed BPE vocabulary induction over a document corpus.

Classic byte-pair-encoding merge learning (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"),
re-expressed for Spark's execution model:

* The **corpus-scale work happens exactly once**: a single
  tokenize + groupBy pass reduces the corpus to a ``(word, freq)``
  vocabulary table.  By Heaps' law that table is sublinear in corpus
  size (bounded in the millions of rows even at 100 TB), so every
  merge round after the first pass iterates over vocabulary-sized
  state, never over the corpus.
* Each merge round is pure Catalyst: adjacent-pair extraction is a
  ``transform(sequence(...))`` array expression, the pair histogram is
  a map-side-combined groupBy over the vocab table, and the winning
  pair comes back to the driver as a **single row** (bounded collect).
  Applying the merge is a left-to-right greedy fold (``aggregate``
  HOF) -- no Python in any per-row path.
* Vocab state is ``localCheckpoint``-ed every round to keep lineage
  flat across the fixpoint loop (same pattern as operators/graph.py;
  production scale would use reliable checkpointing).

Determinism contract (what makes the operator oracle-checkable): ties
in the pair histogram break by ``(count DESC, lhs ASC, rhs ASC)``, the
greedy merge is left-to-right non-overlapping, and every emitted value
is an integer or a token string -- no floats anywhere, so a DuckDB
recursive CTE replays the exact merge sequence.

Reference scope note: the reference project (eriknw/dask-patternsearch)
contains no tokenizer-induction operator; this module is part of the
beyond-reference LLM-training-data pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERGE_SCHEMA = T.StructType(
    [
        T.StructField("merge_rank", T.LongType()),
        T.StructField("lhs", T.StringType()),
        T.StructField("rhs", T.StringType()),
        T.StructField("merged", T.StringType()),
        T.StructField("pair_count", T.LongType()),
    ]
)


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: lowercase, whitespace-tokenize, keep purely
    alphabetic words, count.  This is the only operation whose cost
    scales with the corpus; everything downstream is vocab-sized."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _initial_vocab(words: DataFrame) -> DataFrame:
    """Symbol sequences start as single characters, space-joined
    (``"hello" -> "h e l l o"``).  Alphabetic-only words guarantee the
    space delimiter never collides with symbol content."""
    return words.withColumn(
        "seqstr",
        F.expr(
            "array_join(transform(sequence(1, length(w)), i -> substr(w, i, 1)), ' ')"
        ),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair histogram weighted by word frequency.  Overlapping
    identical pairs count per occurrence (``"aaa"`` contributes
    ``(a, a)`` twice), matching the classic BPE counting rule."""
    return (
        vocab.select(
            "freq",
            F.split("seqstr", " ").alias("syms"),
        )
        .filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i - 1] AS lhs, syms[i] AS rhs))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def _apply_merge(vocab: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Left-to-right greedy non-overlapping merge of ``lhs rhs`` into
    ``lhs||rhs`` in every symbol sequence, as a fold over the symbol
    array.  The ``acc = lhs OR acc LIKE '% lhs'`` guard checks the
    accumulator *ends on a complete token* equal to ``lhs`` (token
    boundaries are spaces; symbols are alphabetic so LIKE needs no
    escaping), and a freshly merged token can never re-match ``lhs``
    (it is strictly longer), which is exactly the non-overlap rule."""
    merged = lhs + rhs
    fold = (
        "aggregate(slice(syms, 2, size(syms) - 1), syms[0],"
        " (acc, s) -> CASE WHEN (acc = '{l}' OR acc LIKE '% {l}') AND s = '{r}'"
        " THEN concat(substr(acc, 1, length(acc) - {ll}), '{m}')"
        " ELSE concat(acc, ' ', s) END)"
    ).format(l=lhs, r=rhs, ll=len(lhs), m=merged)
    return vocab.select(
        "w",
        "freq",
        F.expr(
            f"CASE WHEN size(syms) < 2 THEN seqstr ELSE {fold} END"
        ).alias("seqstr"),
    )


def learn_bpe_merges(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merge rules; returns ``(merges, vocab)``
    where ``merges`` has one row per learned rule
    ``(merge_rank, lhs, rhs, merged, pair_count)`` and ``vocab`` is the
    final segmented vocabulary ``(w, freq, seqstr)``.

    Driver loop with one bounded single-row collect per round; all
    per-row work stays in whole-stage codegen."""
    spark = docs.sparkSession
    vocab = _initial_vocab(word_frequencies(docs, text_col)).select(
        "w", "freq", "seqstr"
    )
    vocab = vocab.localCheckpoint(eager=True)
    rules: list[tuple] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(vocab.withColumn("syms", F.split("seqstr", " ")))
            .orderBy(F.desc("pair_count"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], best[0]["pair_count"]
        rules.append((rank, lhs, rhs, lhs + rhs, cnt))
        vocab = _apply_merge(
            vocab.withColumn("syms", F.split("seqstr", " ")), lhs, rhs
        ).localCheckpoint(eager=True)
    merges = spark.createDataFrame(rules, MERGE_SCHEMA)
    return merges, vocab


def encode_token_stats(vocab: DataFrame, k: int = 30) -> DataFrame:
    """Token statistics of the corpus under the learned segmentation:
    per token, total weighted occurrences and the number of distinct
    words containing it; deterministic top-``k``
    (``n_occurrences DESC, token ASC``)."""
    return (
        vocab.select(
            "w",
            "freq",
            F.explode(F.split("seqstr", " ")).alias("token"),
        )
        .groupBy("token")
        .agg(
            F.sum("freq").cast("long").alias("n_occurrences"),
            F.countDistinct("w").cast("long").alias("n_words"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(k)
    )
