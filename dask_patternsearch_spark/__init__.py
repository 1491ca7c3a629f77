"""dask_patternsearch_spark: a PySpark-native analytics engine with the
capabilities of the reference ``eriknw/dask-patternsearch`` (parallel
pattern-search minimization) plus the relational / LLM-data-pipeline
operator surface described in SURVEY.md section 2.3.
"""

from .search import (
    AsyncSparkEvaluator,
    LocalEvaluator,
    SearchResults,
    SparkEvaluator,
    TrialPoint,
    search,
    search_multi_start,
)
from .stencil import SimplexStencil, Step

__version__ = "0.1.0"

__all__ = [
    "search",
    "search_multi_start",
    "TrialPoint",
    "SearchResults",
    "LocalEvaluator",
    "SparkEvaluator",
    "AsyncSparkEvaluator",
    "SimplexStencil",
    "Step",
    "__version__",
]
