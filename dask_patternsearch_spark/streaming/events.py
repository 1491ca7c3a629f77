"""Event-stream operators: watermarked tumbling windows + session windows.

Scale notes: file-source streams partition per file; watermarks bound state
(late data beyond 1h dropped); both aggregations are the streaming forms of
``queries/relational.py::events_hourly`` / ``sessionize_events`` so batch
and streaming answers can be cross-checked (see tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """File-source stream over the events parquet (nanosecond timestamps
    surface as long via nanosAsLong; converted to a proper event-time
    column for watermarking).

    ``path`` must be a directory; pass ``glob`` (e.g. ``events.parquet``)
    to restrict which files in it are streamed.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sample = f"{path}/{glob}" if glob else path
    schema = spark.read.parquet(sample).schema
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    stream = reader.parquet(path)
    return stream.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts DIV 1000"))
    )


def hourly_counts_stream(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows with a 1-hour watermark (late rows beyond
    the watermark are dropped, bounding state size)."""
    return (
        events.withWatermark("event_time", "1 hour")
        .groupBy(F.window("event_time", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (gap-based), the streaming equivalent of the
    batch lag-based sessionization."""
    return (
        events.withWatermark("event_time", "1 hour")
        .groupBy(F.session_window("event_time", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def run_to_memory(stream_df: DataFrame, table_name: str, spark: SparkSession) -> None:
    """Drain an availableNow stream into an in-memory table (test/dev sink;
    production would writeStream to parquet/kafka with checkpointing)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
