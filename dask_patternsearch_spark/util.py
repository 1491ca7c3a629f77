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


def epoch_ms(col):
    """Exact epoch milliseconds of a timestamp column, timezone-independent.

    The testdata stores naive microsecond timestamps (Spark reads them as
    TIMESTAMP_NTZ); ``timestamp_diff`` between two NTZ values never
    consults the session timezone, so this matches DuckDB's ``epoch_ms``
    on any host, regardless of ``spark.sql.session.timeZone``.  (The
    previous NTZ->LTZ + ``unix_millis`` spelling silently shifted epochs
    when the session tz was not UTC.)  Integer milliseconds survive double
    round-trips (< 2^53) so oracle comparisons stay bit-exact.
    """
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    return F.timestamp_diff(
        "MILLISECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        col.cast("timestamp_ntz"),
    )


def event_time(col):
    """Timestamp column coerced to TIMESTAMP_LTZ (no-op if already LTZ):
    the type Structured Streaming watermarks and ``unix_millis`` expect."""
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    return col.cast("timestamp")
