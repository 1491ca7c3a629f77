"""Join strategy helpers for skewed / large-scale shapes.

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

from pyspark.sql import DataFrame
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
