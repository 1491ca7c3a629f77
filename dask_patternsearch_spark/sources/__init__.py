"""Sources & sinks (SURVEY.md section 2.2 'scans/sources/sinks').

The reference performs no I/O (inputs are in-memory ndarrays,
``/root/reference/dask_patternsearch/search.py:69-75``); the engine's query
surface needs real connectors.  Thin, opinionated wrappers over Spark's
readers/writers that keep the scale-relevant options in one place.
"""

from .io import (  # noqa: F401
    audit_scan_parallelism,
    compact_files,
    overwrite_partitions,
    read_table,
    write_bucketed_table,
    write_clustered,
    write_table,
    write_table_observed,
    write_zordered,
)
from .jsonl import JsonlShards  # noqa: F401
