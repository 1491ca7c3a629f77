"""One-off 10x scale probe for the dedup/ANN story (SCALE.md round 7).

Generates a 10x documents+embeddings set (sf1-equivalent: 50k docs, 20k
embeddings) with the same distributional shape as the driver's sf0.1
testdata (vocab sampled FROM sf0.1, same lang weights, src0..src19, the
same ~0.16% exact-dup and a comparable near-dup rate), then runs
``minhash_near_dups``, ``decontaminate_corpus`` and
``ivf_layout_topk_embeddings`` once at sf0.1 and once at 10x, recording
wall time, total shuffle read/write bytes (Spark REST API stage metric
deltas) and output rows.  The point is the SCALING SHAPE: the banded
LSH path promises near-linear candidate volume, and until now the 100 TB
claims rested on plan shape alone.

Usage:  python tools/scaleprobe.py            (writes .scaleprobe/ inside
the repo; prints a markdown table to paste into SCALE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
PROBE_DIR = os.path.join(REPO, ".scaleprobe", "sf1")
DOCS_N = 50_000          # 10x sf0.1's 5,000
EMB_N = 20_000           # 10x sf0.1's 2,000
EMB_DIM = 64
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]   # sf0.1's observed mix


def generate(seed: int = 42) -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(PROBE_DIR, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = [r[0] for r in duckdb.sql(
        f"SELECT DISTINCT unnest(string_split_regex(trim(lower(text)), '\\s+')) "
        f"FROM '{SF01}/documents.parquet' ORDER BY 1").fetchall()]

    # base docs: word soup, lengths matching sf0.1's 7..96-word range
    n_words = rng.integers(7, 97, size=DOCS_N)
    texts = [" ".join(rng.choice(vocab, size=k)) for k in n_words]
    # near-dups: ~1.6% of docs are a mutated copy of an earlier doc
    # (5-10% of tokens replaced -- above the 0.8-Jaccard near-dup bar for
    # most lengths), plus sf0.1's ~0.16% exact-dup rate
    n_near, n_exact = int(DOCS_N * 0.016), int(DOCS_N * 0.0016)
    dup_targets = rng.choice(DOCS_N, size=n_near + n_exact, replace=False)
    dup_sources = rng.integers(0, DOCS_N, size=n_near + n_exact)
    for i, (tgt, src) in enumerate(zip(dup_targets, dup_sources)):
        toks = texts[src].split()
        if i < n_exact or len(toks) < 12:
            texts[tgt] = texts[src]
            continue
        n_mut = max(1, int(len(toks) * rng.uniform(0.05, 0.10)))
        for j in rng.choice(len(toks), size=n_mut, replace=False):
            toks[j] = str(rng.choice(vocab))
        texts[tgt] = " ".join(toks)
    docs = pa.table({
        "doc_id": pa.array(np.arange(DOCS_N), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(rng.choice(LANGS, size=DOCS_N, p=LANG_W)),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, DOCS_N)]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(docs, os.path.join(PROBE_DIR, "documents.parquet"))

    # embeddings: 10 Gaussian clusters like sf0.1's label structure
    centers = rng.normal(0, 1, size=(10, EMB_DIM))
    labels = rng.integers(0, 10, size=EMB_N)
    vecs = (centers[labels] + rng.normal(0, 0.35, size=(EMB_N, EMB_DIM))
            ).astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(np.arange(EMB_N), type=pa.int64()),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    })
    pq.write_table(emb, os.path.join(PROBE_DIR, "embeddings.parquet"))
    print(f"# generated {DOCS_N} docs / {EMB_N} embeddings -> {PROBE_DIR}",
          file=sys.stderr)


def _shuffle_totals(ui: str) -> tuple[int, int]:
    """Sum shuffle read/write bytes over all stages via the REST API."""
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"))
    return (sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages))


def main() -> None:
    if not os.path.exists(os.path.join(PROBE_DIR, "embeddings.parquet")):
        generate()

    # the probe needs the Spark UI for stage metrics; everything else
    # matches get_spark's settings so timings are bench-comparable
    os.environ["SPARK_GRAFT_PROBE_UI"] = "1"
    from pyspark.sql import SparkSession

    from dask_patternsearch_spark.queries import all_queries

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scaleprobe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.default.parallelism", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "32")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.cleaner.periodicGC.interval", "60s")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4090")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    qs = all_queries()
    targets = ["minhash_near_dups", "decontaminate_corpus",
               "ivf_layout_topk_embeddings"]

    # warm-up pass (JIT/codegen/Python worker pool) at the small scale
    for name in targets:
        qs[name](spark, SF01).count()

    results: dict[str, dict[str, dict]] = {}
    for label, sf_dir in [("sf0.1", SF01), ("10x", PROBE_DIR)]:
        for name in targets:
            r0, w0 = _shuffle_totals(ui)
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            r1, w1 = _shuffle_totals(ui)
            results.setdefault(name, {})[label] = {
                "sec": round(dt, 2), "rows": rows,
                "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
            }
            print(f"# {name}@{label}: {dt:.2f}s rows={rows} "
                  f"shufR={(r1 - r0)/1e6:.1f}MB shufW={(w1 - w0)/1e6:.1f}MB",
                  file=sys.stderr)

    print("| query | sf0.1 sec | 10x sec | ratio | sf0.1 rows | 10x rows | "
          "sf0.1 shufW MB | 10x shufW MB |")
    print("|---|---|---|---|---|---|---|---|")
    for name in targets:
        a, b = results[name]["sf0.1"], results[name]["10x"]
        ratio = round(b["sec"] / a["sec"], 1) if a["sec"] else float("nan")
        print(f"| {name} | {a['sec']} | {b['sec']} | {ratio}x | {a['rows']} "
              f"| {b['rows']} | {a['shuffle_write_mb']} "
              f"| {b['shuffle_write_mb']} |")
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
