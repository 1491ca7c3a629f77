

def test_overwrite_partitions_touches_only_emitted_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from dask_patternsearch_spark.sources.io import overwrite_partitions, write_table

    path = str(tmp_path / "facts")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "id long, day string, v double",
    )
    write_table(base, path, partition_by=["day"])
    # re-land ONLY day=a with corrected values
    delta = spark.createDataFrame(
        [(1, "a", 11.0), (5, "a", 50.0)], "id long, day string, v double"
    )
    overwrite_partitions(delta, path, ["day"])
    out = {(r["id"], r["day"]): r["v"]
           for r in spark.read.parquet(path).collect()}
    # day=a fully replaced (id 2 gone, id 5 added, id 1 corrected)
    assert out == {(1, "a"): 11.0, (5, "a"): 50.0, (3, "b"): 30.0, (4, "c"): 40.0}
    # the session conf was restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper() == "STATIC"


def test_compact_files_reduces_file_count_preserves_data(spark, tmp_path):
    from pyspark.sql import functions as F

    from dask_patternsearch_spark.sources.io import compact_files

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # 64 small files
    before = spark.read.parquet(path)
    rows_before = sorted(tuple(r) for r in before.collect())

    manifest = compact_files(spark, path, target_file_bytes=1 << 30)
    assert manifest["files_before"] == 64
    assert manifest["files_after"] == 1  # total bytes << 1 GiB target
    after = spark.read.parquet(path)
    assert sorted(tuple(r) for r in after.collect()) == rows_before
    # no temp/old dirs left behind
    import os
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")


def test_jsonl_shards_roundtrip_and_parallelism(spark, tmp_path):
    """Custom Python data source (PySpark 4 datasource API): write gz
    jsonl shards with a commit manifest, read them back with one input
    partition per shard file."""
    import gzip
    import json
    import os

    from pyspark.sql import functions as F

    from dask_patternsearch_spark.sources.jsonl import JsonlShards

    spark.dataSource.register(JsonlShards)
    out = str(tmp_path / "corpus")
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    (df.repartition(4).write.format("jsonl_shards").mode("overwrite")
       .option("path", out).option("compress", "true").save())

    shards = sorted(f for f in os.listdir(out) if f.endswith(".jsonl.gz"))
    assert len(shards) == 4
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert sum(s["n_rows"] for s in manifest["shards"]) == 100
    with gzip.open(os.path.join(out, shards[0]), "rt") as fh:
        first = json.loads(fh.readline())
    assert set(first) == {"doc_id", "text"}

    back = (spark.read.format("jsonl_shards")
            .schema("doc_id long, text string")
            .option("path", out).load())
    assert back.rdd.getNumPartitions() == 4  # one partition per shard
    rows = sorted((r["doc_id"], r["text"]) for r in back.collect())
    assert rows == sorted((r["doc_id"], r["text"]) for r in df.collect())

    # explicit schema is mandatory -- inference is a 100 TB anti-pattern
    import pytest as _pytest
    with _pytest.raises(Exception):
        spark.read.format("jsonl_shards").option("path", out).load().collect()
