"""Table profiling: per-column statistics in one pass (the ANALYZE TABLE /
data-quality primitive of a pipeline engine).

Scale: a single aggregate over one scan.  With ``exact=True`` the multiple
COUNT(DISTINCT) columns make Catalyst plan an Expand (one duplicated input
row per distinct-column) -- fine for a profiling pass you run rarely, and
it still partially aggregates map-side.  With ``exact=False`` the distinct
counts become HLL++ sketches (``approx_count_distinct``): one non-expanded
pass, mergeable across partitions, the right default at 100 TB where a
0.5-2% cardinality error is irrelevant for profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """One row per profiled column: total rows, non-null count, distinct
    count, min and max (stringified so heterogeneous column types share a
    schema)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        distinct = (
            F.count_distinct(F.col(c)) if exact
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            distinct.alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"{c}__nn").alias("n_nonnull"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ])
    return one.select(F.explode(rows).alias("p")).select("p.*")
