"""Query registry: every operator the engine exposes as a runnable query.

Each module contributes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, sql]`` (DuckDB-runnable ANSI SQL over the testdata
views).  Names absent from ORACLE get the driver's weaker rows-only check
(non-SQL-expressible operators: LSH, streaming, pattern search).
"""

from __future__ import annotations

from . import pipeline, relational, patterns, tpch


def all_queries():
    out = {}
    out.update(relational.QUERIES)
    out.update(tpch.QUERIES)
    out.update(pipeline.QUERIES)
    out.update(patterns.QUERIES)
    return out


def all_oracles():
    out = {}
    out.update(relational.ORACLE)
    out.update(tpch.ORACLE)
    out.update(pipeline.ORACLE)
    out.update(patterns.ORACLE)
    return out
