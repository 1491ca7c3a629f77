"""Query registry: every operator the engine exposes as a runnable query.

Each module contributes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, sql]`` (DuckDB-runnable ANSI SQL over the testdata
views).  Names absent from ORACLE get the driver's weaker rows-only check
(non-SQL-expressible operators: LSH, streaming, pattern search).
"""

from __future__ import annotations

from . import pipeline, relational, patterns, tpch

_MODULES = (relational, tpch, pipeline, patterns)


def _merge(attr: str) -> dict:
    """Merge one registry dict from every module, refusing silent
    name shadowing (a duplicate key would make one module's query
    invisible to the driver harness)."""
    out: dict = {}
    for mod in _MODULES:
        part = getattr(mod, attr)
        dup = out.keys() & part.keys()
        if dup:
            raise ValueError(f"duplicate query names across modules: {sorted(dup)}")
        out.update(part)
    return out


def all_queries():
    return _merge("QUERIES")


def all_oracles():
    out = _merge("ORACLE")
    missing = out.keys() - all_queries().keys()
    if missing:
        raise ValueError(f"oracle entries without a query: {sorted(missing)}")
    return out
