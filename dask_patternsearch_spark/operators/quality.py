"""Declarative data-quality constraint checking (Deequ/dbt-test style).

A pipeline engine needs machine-checkable contracts on its tables: key
uniqueness, non-null columns, value ranges, referential integrity.  Each
rule compiles to an aggregate over ONE scan of the checked table (plus one
broadcast-able anti-join per foreign-key rule); the result is a small
(rule, violations, passed) relation a scheduler can gate on.

Scale: the non-FK rules share a single pass (conditional aggregates, no
shuffle beyond the final 1-row combine).  Uniqueness counts duplicates via
count(*) - count_distinct(key) -- HLL++ via ``exact=False`` when a 2%
error is acceptable at 100 TB.  FK rules anti-join against the dimension's
distinct keys (broadcast when small, shuffle otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    unique: list[str] | None = None,
    not_null: list[str] | None = None,
    checks: dict[str, "F.Column"] | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Evaluate constraint rules; returns (rule, violations, passed).

    ``unique``: columns whose values must not repeat (null counts as a
    value).  ``not_null``: columns that must never be null.  ``checks``:
    named boolean expressions that must hold on every row (violations =
    rows where the predicate is false or null).  ``foreign_keys``:
    (column, dim_df, dim_column) triples; violations = non-null values
    absent from the dimension.
    """
    aggs = []
    names = []
    for c in unique or []:
        distinct = F.count_distinct(F.col(c)) if exact else F.approx_count_distinct(c)
        aggs.append((F.count(F.col(c)) - distinct).alias(f"v{len(names)}"))
        names.append(f"unique({c})")
    for c in not_null or []:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"v{len(names)}"))
        names.append(f"not_null({c})")
    for label, pred in (checks or {}).items():
        aggs.append(
            F.sum((~F.coalesce(pred, F.lit(False))).cast("long")).alias(f"v{len(names)}")
        )
        names.append(f"check({label})")

    spark = df.sparkSession
    parts = []
    if aggs:
        one = df.agg(*aggs)
        rows = F.array(*[
            F.struct(
                F.lit(n).alias("rule"),
                F.col(f"v{i}").cast("long").alias("violations"),
            )
            for i, n in enumerate(names)
        ])
        parts.append(one.select(F.explode(rows).alias("r")).select("r.*"))
    for col, dim, dim_col in foreign_keys or []:
        missing = (
            df.select(F.col(col)).filter(F.col(col).isNotNull())
            .join(dim.select(F.col(dim_col).alias(col)).distinct(), col, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .select(
                F.lit(f"fk({col} -> {dim_col})").alias("rule"), "violations"
            )
        )
        parts.append(missing)
    if not parts:
        raise ValueError("no constraints given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0)


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    k: int = 10,
) -> DataFrame:
    """Join/aggregation-key skew diagnostic: the top-k heaviest key groups
    with each group's share of all rows and its ratio to the MEAN group
    size -- the number that predicts whether this key needs salting or
    AQE skew-split before it becomes a straggler task.

    Scale: one count aggregate at key grain (map-side combined), a 1-row
    stats aggregate joined by broadcast, and a TakeOrderedAndProject
    top-k.  Run it on the key of any join that misbehaves.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    return (
        counts.join(F.broadcast(stats))
        .select(
            *key_cols,
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("n_rows") / F.col("total_rows"), 6).alias("row_share"),
            F.round(
                F.col("n_rows") * F.col("n_groups") / F.col("total_rows"), 4
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("n_rows"), *[F.asc(c) for c in key_cols])
        .limit(k)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Key-wise diff of two table snapshots: each key is classified
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (present in both, any compared column differs) or ``unchanged`` --
    the audit primitive behind incremental re-landings, CDC validation
    and dataset-version comparisons.

    Scale: ONE full outer join on the key (the minimum possible -- a
    diff must co-locate both sides per key); the compared columns are
    collapsed to a single null-safe fingerprint per side BEFORE the
    join, so wide tables shuffle key + one 32-byte hash, never the full
    row payload.  Null-safe: md5 over each value's string form with a
    per-column null sentinel, so NULL != '' and NULL == NULL.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in key_cols]

    def fp(df: DataFrame, side: str) -> DataFrame:
        cols = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in compare_cols
        ]
        return df.select(
            *key_cols, F.md5(F.concat_ws("\x01", *cols)).alias(f"__fp_{side}")
        )

    joined = fp(old, "old").join(fp(new, "new"), key_cols, "full_outer")
    change = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*key_cols, change.alias("change_type"))
