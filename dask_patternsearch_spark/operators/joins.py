"""Join strategy helpers for skewed / non-equi / large-scale shapes:
``salted_join`` (hot-key skew), ``asof_join`` (temporal nearest-match as a
single window pass), ``range_join`` (interval containment as a bucketed
equi join).

First resort is always stock Spark: AQE (`spark.sql.adaptive.enabled`,
on in ``session.get_spark``) already splits skewed sort-merge partitions at
runtime, and ``F.broadcast`` handles the small-dim case.  ``salted_join``
is for the shape AQE cannot fix: a single hot key whose rows exceed one
executor's memory on the *build* side of the join, or an aggregation-free
pipeline where one reduce task would receive the whole hot key.

Mechanics: the skewed (probe) side gets a uniform random salt in
``[0, n_salts)``; the other side is replicated once per salt value via a
small ``explode``; the join key becomes ``(key, salt)``, spreading each hot
key over ``n_salts`` reduce tasks.  Replication multiplies the build side
by ``n_salts``, so pick the side to replicate small (or pre-aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__dps_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    how: str = "inner",
    n_salts: int = 16,
    seed: int | None = None,
) -> DataFrame:
    """Equi-join robust to heavy key skew on ``skewed``.

    ``on`` must be column name(s) present on both sides (the usual equi-join
    contract).  Supported ``how``: inner / left (outer joins where ``other``
    is the preserved side would need the salt on the other side instead).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rand = F.rand(seed) if seed is not None else F.rand()
    left = skewed.withColumn(_SALT, (rand * n_salts).cast("int"))
    right = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = left.join(right, keys + [_SALT], how)
    return joined.drop(_SALT)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    how: str = "left",
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """Temporal as-of join: attach to each ``left`` row the single ``right``
    row with the greatest ``right_ts <= left_ts`` (direction="backward") or
    the smallest ``right_ts >= left_ts`` ("forward") within the same ``on``
    key group.  The reference engine has no such operator; this is the
    standard time-series primitive a training-data pipeline needs (e.g.
    "most recent profile snapshot before each document crawl").

    Implementation is the merge-join formulation, NOT an inequality join:
    both sides are tagged and unioned, then one window pass per key carries
    the latest right-side payload forward onto left rows
    (``last(payload, ignorenulls=True)``).  Cost at 100 TB: ONE shuffle on
    ``on`` + an O(n log n) sort per partition -- no pair explosion, no
    broadcast-nested-loop, and AQE can still split a skewed key's sort.
    An inequality-join spelling would be O(|left_key| * |right_key|) per
    key; this is O(|left_key| + |right_key|).

    ``tolerance`` (same units as the ts columns) null-outs matches farther
    than the given distance.  Right-side columns keep their names; they must
    not collide with left's.  Ties on identical ``right_ts`` within a key
    resolve to an arbitrary single right row (make ``right_ts`` unique for
    full determinism).  ``how``: left (keep unmatched) or inner.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left/inner, got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right columns collide with left: {sorted(overlap)}")

    side = "__dps_side"
    payload = "__dps_payload"
    order = "__dps_order"
    tagged_r = right.select(
        *keys,
        F.col(right_ts).alias(order),
        F.lit(0).alias(side),
        F.struct(*payload_cols).alias(payload),
    )
    tagged_l = left.withColumn(order, F.col(left_ts)).withColumn(
        side, F.lit(1)
    ).withColumn(payload, F.lit(None).cast(tagged_r.schema[payload].dataType))

    merged = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    order_col = F.col(order) if direction == "backward" else F.col(order).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col, F.col(side))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(payload, F.last(payload, ignorenulls=True).over(w))
    out = carried.filter(F.col(side) == 1)

    matched = F.col(payload).isNotNull()
    if tolerance is not None:
        dist = (
            F.col(left_ts) - F.col(payload)[right_ts]
            if direction == "backward"
            else F.col(payload)[right_ts] - F.col(left_ts)
        )
        matched = matched & (dist <= F.lit(tolerance))
    if how == "inner":
        out = out.filter(matched)
    exprs = [F.col(c) for c in left.columns] + [
        F.when(matched, F.col(payload)[c]).alias(c) for c in payload_cols
    ]
    return out.select(*exprs)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    extra_on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Interval (range) join: pair each ``points`` row with every
    ``intervals`` row whose ``[lo_col, hi_col)`` contains ``point_col``.

    Naive spelling is a non-equi theta join, which Spark executes as
    broadcast-nested-loop -- O(|points| * |intervals|) and only viable when
    one side is tiny.  This operator makes it an EQUI join: both sides are
    bucketed by ``bucket_width`` (intervals explode into the buckets they
    overlap), joined on bucket id (+ any ``extra_on`` equi keys), then the
    exact containment predicate filters false pairs.  Each (point, interval)
    candidate appears exactly once because a point lives in exactly one
    bucket, so no post-join dedup is needed.

    Cost at 100 TB: one shuffle on (bucket, *extra_on) that sort-merge/hash
    joins like any equi join; interval-side blow-up is
    ``ceil(interval_length / bucket_width) + 1`` rows, so pick
    ``bucket_width`` on the order of the TYPICAL interval length.
    """
    if how != "inner":
        raise ValueError("range_join currently supports inner joins only")
    extra = list(extra_on or [])
    bucket = "__dps_bucket"
    p = points.withColumn(
        bucket, F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    iv = intervals.withColumn(
        bucket,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    joined = p.join(iv, [bucket] + extra, "inner").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop(bucket)
