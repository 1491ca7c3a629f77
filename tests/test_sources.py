

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
