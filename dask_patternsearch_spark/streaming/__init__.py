"""Structured Streaming operators (SURVEY.md section 2.2 'streaming ops').

The reference has no stream processor -- its async result-draining loop
(``/root/reference/dask_patternsearch/search.py:299-324``) is the nearest
analog.  This package provides the real streaming surface a Spark engine
owes its users:

* ``events``    -- file-source event streams, watermarked tumbling windows,
  native session windows;
* ``incumbent`` -- a custom stateful operator (applyInPandasWithState)
  that maintains the running best-cost point per group: the reference's
  greedy incumbent update (op #9) recast as a streaming operator.
"""

from . import events, incumbent  # noqa: F401
