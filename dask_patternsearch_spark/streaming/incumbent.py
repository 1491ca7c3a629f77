"""Custom stateful streaming operator: running incumbent (best-cost point).

The reference's collect phase greedily tracks the best completed evaluation
(``/root/reference/dask_patternsearch/search.py:314-324``).  This module is
that operator as Structured Streaming state: each micro-batch of evaluated
``(group, point, cost)`` rows updates a per-group incumbent via
``applyInPandasWithState``; output is the stream of incumbent improvements.

Scale: state is one (point, cost) pair per group -- constant memory per key
regardless of stream length; groups shard across executors by hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("group", T.StringType(), False),
    T.StructField("point", T.ArrayType(T.DoubleType(), False), False),
    T.StructField("cost", T.DoubleType(), False),
])

STATE_SCHEMA = T.StructType([
    T.StructField("point", T.ArrayType(T.DoubleType(), False), False),
    T.StructField("cost", T.DoubleType(), False),
])


def _update(key, pdfs, state: GroupState):
    import pandas as pd

    best_point, best_cost = None, None
    if state.exists:
        best_point, best_cost = state.get
    improved = False
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            cost = float(row["cost"])
            if best_cost is None or cost < best_cost:
                best_cost = cost
                # plain Python floats: the state store pickles via Pyrolite,
                # which rejects numpy scalars
                best_point = [float(v) for v in row["point"]]
                improved = True
    if improved:
        state.update((best_point, best_cost))
        yield pd.DataFrame(
            {"group": [key[0]], "point": [best_point], "cost": [best_cost]}
        )


def incumbent_stream(evals: DataFrame) -> DataFrame:
    """evals: streaming DataFrame with columns (group, point, cost).
    Returns the stream of per-group incumbent improvements."""
    return evals.groupBy("group").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
