"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregation at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory of
SURVEY.md section 2.3 (relational suite + LLM-pipeline operators + pattern
search) with DuckDB oracle SQL wherever the computation is SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_patternsearch_spark.queries import all_oracles, all_queries  # noqa: E402
from dask_patternsearch_spark.queries.relational import q1_pricing_summary  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query
    (LSH/minhash/quantizer families included, via engine-portable md5
    hash families).  Intentionally absent (rows-only checks): the 6
    pattern-search ledgers, the 3 builtin-sketch demos
    (implementation-defined binary state) and zlib compression_quality."""
    return all_oracles()
