"""Parse Spark physical plans into assertable facts.

At 100 TB the difference between a broadcast-hash join and an unplanned
sort-merge join, or between a pruned 2-column parquet scan and a full-width
one, is the difference between minutes and hours.  These helpers read the
plan the same way a reviewer would (``.explain("formatted")``) and return
structured facts so the test suite locks the good plan in.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The ``explain(mode)`` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def summarize(df: DataFrame) -> dict:
    """Scale-relevant facts from the physical plan.

    Returns keys:
      broadcast_hash_joins / sort_merge_joins / shuffled_hash_joins /
      nested_loop_joins : int counts of each join strategy;
      exchanges : int count of shuffle exchanges;
      pushed_filters : list[str], one entry per scan with non-empty
        PushedFilters;
      partition_filters : list[str], one entry per scan with non-empty
        PartitionFilters (partition-pruning check);
      read_schemas : list[str], the ReadSchema struct of every scan
        (column pruning check);
      wholestage_codegen_ids : int count of whole-stage codegen spans;
      python_stages : int count of Arrow/Python eval nodes
        (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas ...).
    """
    s = plan_text(df)
    pushed = [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[([^\]]+)\]", s)
        if m.group(1).strip()
    ]
    partition = [
        m.group(1).strip()
        for m in re.finditer(r"PartitionFilters: \[([^\]]+)\]", s)
        if m.group(1).strip()
    ]
    schemas = [m.group(1).strip() for m in re.finditer(r"ReadSchema: (\S+)", s)]
    return {
        "broadcast_hash_joins": len(re.findall(r"BroadcastHashJoin", s)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", s)),
        "shuffled_hash_joins": len(re.findall(r"ShuffledHashJoin", s)),
        "nested_loop_joins": len(re.findall(r"BroadcastNestedLoopJoin", s)),
        "exchanges": len(re.findall(r"\bExchange\b|\n\s*\(?\d*\)?\s*Exchange ", s)),
        "pushed_filters": pushed,
        "partition_filters": partition,
        "read_schemas": schemas,
        "wholestage_codegen_ids": len(
            set(re.findall(r"codegen id : (\d+)", s))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", s))
        ),
        "python_stages": len(
            re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow", s)
        ),
        # map-side combine: partial_* aggregate functions before the shuffle
        "partial_aggregates": len(re.findall(r"partial_\w+\(", s)),
    }
