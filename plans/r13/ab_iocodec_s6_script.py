"""A/B one trial: time the shuffle-heaviest headline queries with
spark.io.compression.codec lz4 (default) vs zstd -- guide section 2.3's
"measure both" item, the one untried codec lever (the PARQUET codec was
switched to zstd separately; this is the shuffle/broadcast/spill codec).

Usage: python ab_iocodec_s6_script.py {lz4|zstd} [runs]
Prints one JSON line {query: median_sec}.
Fresh process per invocation; caller interleaves trials.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

MODE = sys.argv[1]
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_DIR = "/root/testdata/sf0.1"
# the repo's biggest shuffle writers at sf0.1 (UI REST audit, s3):
# q21 12.3 MB, the dedup/text families ~3-7 MB each
QUERIES = [
    "q21_blamed_supplier",
    "q8_market_share",
    "decontaminate_corpus",
    "duplicate_ngram_fraction",
    "tfidf_top_terms",
    "minhash_near_dups",
    "embedding_near_dups",
]


def main():
    import os
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    cpus = os.environ["SPARK_GRAFT_CPUS"]
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ab_iocodec_{MODE}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", cpus)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.cleaner.periodicGC.interval", "60s")
        .config("spark.ui.enabled", "false")
        .config("spark.io.compression.codec", MODE)
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from dask_patternsearch_spark.queries import all_queries
    qs = all_queries()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    for name in QUERIES:
        qs[name](spark, SF_DIR).count()
    out = {}
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"ab:{MODE}:{name}")
        ss = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            ss.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(ss), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
