"""Operator-level semantic tests (beyond running + oracle parity):
LSH recall against brute force, MinHash estimator sanity, SimHash
Hamming guarantee, multimodal plumbing shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_patternsearch_spark.operators import dedup, multimodal, similarity, text
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_minhash_estimates_match_exact_jaccard(spark, docs):
    """For LSH candidate pairs, the signature estimate must be close to the
    true shingle Jaccard (the estimator is unbiased, sd ~ 1/sqrt(64))."""
    cands = dedup.minhash_lsh_candidates(docs, min_est_jaccard=0.3).collect()
    assert cands, "expected some candidate pairs on the word-soup corpus"
    toks = dedup._shingles(dedup._tokens(F.col("text")), 3)
    sh = {r["doc_id"]: set(r["s"]) for r in docs.select("doc_id", toks.alias("s")).collect()}
    for r in cands[:50]:
        a, b = sh[r["doc_a"]], sh[r["doc_b"]]
        true_j = len(a & b) / max(len(a | b), 1)
        assert abs(r["est_jaccard"] - true_j) < 0.35


def test_simhash_hamming_guarantee(spark, docs):
    """Every returned pair must actually be within the Hamming radius."""
    rows = dedup.simhash_candidates(docs, max_hamming=3).collect()
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}
    for r in rows:
        x = (sigs[r["doc_a"]] ^ sigs[r["doc_b"]]) & ((1 << 64) - 1)
        assert bin(x).count("1") <= 3
        assert r["hamming"] == bin(x).count("1")


def test_exact_dedup_counts(spark, docs):
    out = dedup.exact_dedup(docs)
    total = out.agg(F.sum("n_copies")).first()[0]
    assert total == docs.count()


def test_lsh_topk_recall(spark, emb):
    """Approximate top-k should recover a healthy fraction of the exact
    top-k on random data (multi-probe, 8 planes)."""
    exact = similarity.brute_force_topk(emb, n_queries=4, k=5).collect()
    approx = similarity.lsh_topk(emb, n_queries=4, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.2, f"LSH recall too low: {recall}"


def test_ivf_topk_recall(spark, emb):
    exact = similarity.brute_force_topk(emb, n_queries=4, k=5).collect()
    approx = similarity.ivf_topk(emb, n_queries=4, k=5, n_probe=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.2, f"IVF recall too low: {recall}"


def test_brute_force_matches_numpy(spark, emb):
    """Exact cosine top-k must agree with a local numpy computation."""
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    out = similarity.brute_force_topk(emb, n_queries=2, k=3).collect()
    for q in (0, 1):
        sims = {
            vid: float(np.dot(vecs[q], v) / (np.linalg.norm(vecs[q]) * np.linalg.norm(v)))
            for vid, v in vecs.items()
            if vid != q
        }
        want = sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:3]
        got = sorted(
            [(r["neighbor_id"], r["cosine_sim"]) for r in out if r["query_id"] == q],
            key=lambda kv: (-kv[1], kv[0]),
        )
        assert [w[0] for w in want] == [g[0] for g in got]
        for (wid, ws), (gid, gs) in zip(want, got):
            assert abs(ws - gs) < 1e-5


def test_multimodal_plumbing(spark, docs):
    media = multimodal.attach_binary(docs)
    feats = multimodal.extract_features(media)
    row = feats.first()
    assert len(row["features"]) == multimodal.FEATURE_DIM
    assert abs(sum(row["features"]) - 1.0) < 1e-3  # normalized histogram
    frames = multimodal.frame_sample(media, n_frames=4)
    assert frames.groupBy("doc_id").count().agg(F.min("count")).first()[0] == 4
    with pytest.raises(NotImplementedError):
        multimodal._real_decode(b"x", "image/png")


def test_language_id_shapes(spark, docs):
    out = text.language_id(docs)
    assert out.count() == docs.count()
    preds = {r["predicted_lang"] for r in out.select("predicted_lang").distinct().collect()}
    assert preds <= {"en", "es", "fr", "de", "zh"}


def test_salted_join_matches_plain_join(spark):
    """Salted inner/left joins must return exactly the plain join's rows."""
    from dask_patternsearch_spark.operators.joins import salted_join

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey").groupBy("c_mktsegment").count()
    salted = (
        salted_join(orders, cust, "o_custkey", n_salts=8, seed=1)
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    plain_left = orders.join(cust.filter("c_acctbal > 0"), "o_custkey", "left").count()
    salted_left = salted_join(
        orders, cust.filter("c_acctbal > 0"), "o_custkey", how="left", n_salts=8, seed=1
    ).count()
    assert plain_left == salted_left
