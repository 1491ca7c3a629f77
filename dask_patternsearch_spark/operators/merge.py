"""Merge-style table maintenance without a table format: latest-wins
upsert and SCD2 history derivation.

The reference engine's results ledger is maintained incrementally (new
evaluations merged into the dict memo, ``/root/reference/dask_patternsearch/
search.py:285-291``); these operators generalize that merge to keyed
tables, the way a training-data pipeline maintains document/feature
ledgers.  Where Delta/Iceberg ``MERGE INTO`` is unavailable, both shapes
are plain exchanges Catalyst can optimize.

Scale notes: both operators are ONE shuffle on the merge keys.  ``upsert``
uses ``max_by`` (partial aggregation map-side, no full sort); ``scd2`` is
a window pass (sort within key partitions).  Neither collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PRIO = "__dps_merge_prio"
_ORD = "__dps_merge_ord"


def upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Latest-wins upsert: rows in ``changes`` replace same-key rows in
    ``base``; unmatched change rows are inserts, unmatched base rows
    survive.

    With ``order_col``, the row with the greatest value wins regardless of
    side (ties go to ``changes``); without it, ``changes`` always wins.
    Both sides must share the schema.  Implementation is union +
    ``max_by(struct(*cols), (order, priority))`` -- a hash aggregate with
    map-side partial combine, cheaper at scale than the window row_number
    spelling (no per-key sort materialization).
    """
    cols = base.columns
    if set(cols) != set(changes.columns):
        raise ValueError(
            f"schema mismatch: base {sorted(cols)} vs changes {sorted(changes.columns)}"
        )
    tagged = base.withColumn(_PRIO, F.lit(0)).unionByName(
        changes.select(*cols).withColumn(_PRIO, F.lit(1))
    )
    order = (
        F.struct(F.col(order_col), F.col(_PRIO))
        if order_col
        else F.struct(F.col(_PRIO))
    )
    payload = F.struct(*[F.col(c) for c in cols if c not in keys])
    merged = tagged.groupBy(*keys).agg(
        F.max_by(payload, order).alias("__dps_payload")
    )
    return merged.select(
        *keys, *[F.col(f"__dps_payload.{c}") for c in cols if c not in keys]
    )


def scd2(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Derive an SCD2 (slowly-changing-dimension type 2) history from an
    append-only change log: each row gains ``valid_from`` (its own
    timestamp), ``valid_to`` (the next change's timestamp for the same
    key, null if none) and ``is_current``.

    ``tie_break`` columns order same-timestamp changes deterministically
    (pass a unique id; without it, equal-ts rows get arbitrary order).
    One window pass partitioned by ``keys`` ordered by ``ts_col``; at
    100 TB the key space is high-cardinality (user/doc ids) so partitions
    stay balanced and AQE splits any hot key's sort.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col, *(tie_break or []))
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
