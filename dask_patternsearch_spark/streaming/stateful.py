"""Arbitrary stateful streaming via the transformWithState API (Spark 4).

``transformWithStateInPandas`` is the successor of
``applyInPandasWithState`` (see ``incumbent.py`` for that form): typed
state variables (value/list/map) managed per grouping key, timers, and a
RocksDB-backed state store.  At 100 TB/day the operational differences
matter: RocksDB state spills to disk instead of capping at executor heap,
and changelog checkpointing ships deltas, not snapshots.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

STATS_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
    StructField("min_value", DoubleType()),
])

_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
    StructField("mn", DoubleType()),
])


class RunningEventStats(StatefulProcessor):
    """Per-event-type running (count, sum, min) over ``value``; emits the
    updated totals once per key per micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, total, mn = 0, 0.0, None
        if self._state.exists():
            n, total, mn = self._state.get()
        for pdf in rows:
            v = pdf["value"].astype(float)
            n += int(len(v))
            total += float(v.sum())
            batch_min = float(v.min()) if len(v) else None
            if batch_min is not None:
                mn = batch_min if mn is None else min(mn, batch_min)
        self._state.update((n, total, mn))
        yield pd.DataFrame({
            "event_type": [key[0]],
            "n_events": [n],
            "sum_value": [total],
            "min_value": [mn],
        })

    def close(self) -> None:
        pass


def event_stats_stream(events: DataFrame) -> DataFrame:
    """Running per-type statistics over the event stream.  Requires the
    RocksDB state store provider (set by the caller / ``run_stateful``)."""
    return events.select("event_type", "value").groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=RunningEventStats(),
        outputStructType=STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def use_rocksdb_state(spark) -> None:
    """transformWithState requires RocksDB-backed state (also the right
    provider at scale: disk-spilling state + changelog checkpoints)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


def tws_available() -> bool:
    """transformWithState's Python driver worker needs protobuf; absent in
    minimal environments (this container), in which case the
    ``applyInPandasWithState`` operator in ``incumbent.py`` is the
    supported stateful path."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False
