"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input
    has fewer partitions.

    Heavy per-row stages (shingling, signature computation, feature
    extraction) otherwise inherit the scan's partitioning -- a single small
    parquet file arrives as ONE partition and serializes the whole stage.
    At real scale inputs already exceed core count and this is a no-op;
    the shuffle it inserts on small inputs costs far less than the
    serialization it removes.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
