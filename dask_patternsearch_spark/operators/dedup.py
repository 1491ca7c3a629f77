"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Design for 100 TB (the whole point of each operator):

* exact dedup shuffles 16-byte md5 digests, never document bodies;
* MinHash/LSH turns the quadratic all-pairs problem into an equi-join on
  (band, band_hash) buckets -- the only shuffle key is a 12-byte tuple and
  skew is bounded by band-hash uniformity;
* SimHash candidates use the pigeonhole banding of the 64-bit signature
  (Hamming <= 3 implies one of 4 16-bit chunks matches exactly), again an
  equi-join, never a cross join;
* heavy string hashing (xxhash64) stays JVM-side; Python only reduces
  fixed-width numeric arrays inside Arrow-batched pandas UDFs.

The generalized primitive is the reference's memo/dedup probe
(``/root/reference/dask_patternsearch/search.py:24-28,285-291``): a
left-anti membership test on a content key.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..util import ensure_parallelism

_TOKENIZE = r"\s+"


def _tokens(col):
    return F.split(F.trim(F.lower(col)), _TOKENIZE)


def _shingles(tok_col, n: int):
    """Distinct word n-grams as space-joined strings (native expressions)."""
    idx = F.sequence(F.lit(0), F.size(tok_col) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok_col, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(tok_col) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash; keeper = lowest doc_id."""
    return (
        docs.select(F.md5("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def ngram_jaccard_consecutive(docs: DataFrame, n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard similarity for consecutive doc_id pairs.

    A deterministic, oracle-checkable slice of the all-pairs problem (the
    full version goes through MinHash/LSH below; this one validates the
    shingling + Jaccard math itself against DuckDB).
    """
    toks = docs.select("doc_id", _shingles(_tokens(F.col("text")), n).alias("shingles"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.array_distinct(F.concat(F.col("a.shingles"), F.col("b.shingles"))))
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(
                inter.cast("double") / F.nullif(union, F.lit(0)).cast("double"), 6
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_PRIME_MULT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio multiplicative mix


def _perm_constants(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63 - 1, size=n_perm, dtype=np.int64).astype(np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63 - 1, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame, n: int = 3, n_perm: int = 64, seed: int = 42
) -> DataFrame:
    """(doc_id, sig: array<long>) MinHash signatures over word n-grams.

    Shingle hashing is JVM-side (``xxhash64``); the per-row min-reduction
    over ``n_perm`` wraparound-multiplicative permutations is a vectorized
    numpy broadcast inside ``mapInPandas``.
    """
    a_const, b_const = _perm_constants(n_perm, seed)
    docs = ensure_parallelism(docs)
    hashed = docs.select(
        "doc_id",
        F.transform(_shingles(_tokens(F.col("text")), n), lambda s: F.xxhash64(s)).alias("hashes"),
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sig", T.ArrayType(T.LongType(), False), False),
    ])

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            sigs = []
            for hs in pdf["hashes"]:
                h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                if h.size == 0:
                    sigs.append(np.full(n_perm, np.iinfo(np.int64).max, dtype=np.int64).tolist())
                    continue
                # g_j(h) = ((h ^ a_j) * MULT + b_j) mod 2^64, min over shingles
                mixed = (h[:, None] ^ a_const[None, :]) * _PRIME_MULT + b_const[None, :]
                sigs.append(mixed.min(axis=0).astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    return hashed.mapInPandas(compute, schema)


def minhash_lsh_candidates(
    docs: DataFrame,
    n: int = 3,
    n_perm: int = 64,
    n_bands: int = 8,
    seed: int = 42,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    rows = (doc_a, doc_b, est_jaccard) with est_jaccard = fraction of
    matching signature components (an unbiased Jaccard estimator), filtered
    to ``min_est_jaccard``.  Scale: candidates come from an equi-join on
    (band, xxhash64(band slice)); no cross join anywhere.
    """
    rows_per_band = n_perm // n_bands
    sigs = minhash_signatures(docs, n=n, n_perm=n_perm, seed=seed)
    # materialize: three downstream branches (bands + both signature joins)
    # must reuse the cached signatures, not recompute the shingle pipeline
    sigs.cache().count()
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.slice("sig", (i * rows_per_band + 1).cast("int"), rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    pairs = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("double") / F.lit(float(n_perm))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= min_est_jaccard)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(docs: DataFrame, seed: int = 42) -> DataFrame:
    """64-bit SimHash over token hashes (sign of per-bit weighted sums)."""
    hashed = ensure_parallelism(docs).select(
        "doc_id", F.transform(_tokens(F.col("text")), lambda t: F.xxhash64(t)).alias("hashes")
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("simhash", T.LongType(), False),
    ])
    bit_idx = np.arange(64, dtype=np.uint64)

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for hs in pdf["hashes"]:
                h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                if h.size == 0:
                    out.append(0)
                    continue
                bits = ((h[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                sig = np.uint64(0)
                for i in np.nonzero(votes > 0)[0]:
                    sig |= np.uint64(1) << np.uint64(i)
                out.append(np.int64(sig.astype(np.uint64)).item() if sig < 2**63 else int(sig) - 2**64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": np.array(out, dtype=np.int64)})

    return hashed.mapInPandas(compute, schema)


def simhash_candidates(docs: DataFrame, max_hamming: int = 3, seed: int = 42) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Pigeonhole banding: split the 64-bit signature into ``max_hamming + 1``
    chunks; any pair within the Hamming radius shares at least one exact
    chunk, so candidates come from an equi-join on (chunk_idx, chunk_value).
    """
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    sigs = simhash_signatures(docs, seed=seed)
    sigs.cache().count()
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftrightunsigned("simhash", i * chunk_bits)
                    .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                    .alias("value"),
                )
                for i in range(n_chunks)
            ])
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.value")
    pairs = (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.value") == F.col("y.value"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------

def _cosine(a, b):
    """Cosine similarity between two array<float> columns, computed in
    double precision with native expressions (JVM, no UDF)."""
    da = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    db = F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / F.sqrt(da * db)


def embedding_near_duplicates(
    emb: DataFrame, threshold: float = 0.9, n_planes: int = 12, seed: int = 42
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``.

    Scale path: random-hyperplane signatures bucket the vectors (an
    equi-join), then exact cosine verifies within buckets.  High-cosine
    pairs collide with probability (1 - theta/pi)^n_planes, so recall is
    tunable via ``n_planes``; a production near-dup pass would OR several
    signature tables together (multi-probe).
    """
    first = emb.select(F.size("embedding").alias("d")).first()
    dim = first["d"] if first else 0
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    proj = F.array(*[
        F.aggregate(
            F.zip_with(
                "embedding",
                F.array(*[F.lit(float(v)) for v in planes[p]]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for p in range(n_planes)
    ])
    sig = F.aggregate(
        F.zip_with(
            proj,
            F.array(*[F.lit(1 << p) for p in range(n_planes)]),
            lambda v, bit: F.when(v > 0, bit).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    bucketed = emb.select("vec_id", "embedding", sig.alias("bucket"))
    pairs = (
        bucketed.alias("x")
        .join(
            bucketed.alias("y"),
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            F.round(_cosine(F.col("x.embedding"), F.col("y.embedding")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    return pairs.filter(F.col("cosine_sim") >= threshold)
