"""Pattern-search queries: the reference's core capability exposed through
the engine's query surface.

Not SQL-expressible (iterative minimization; SURVEY.md section 2.3 last
row), so no ORACLE entries -- the driver records rows-only checks.
Correctness is instead guaranteed by the convergence property tests in
``tests/test_search.py`` (the reference's own test strategy,
``/root/reference/dask_patternsearch/tests/test_search.py:28-124``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..search import search


def _canon_ledger(df: DataFrame) -> DataFrame:
    """Stringify the ledger's array<double> columns (point, parent): the
    driver's rows-only canonicalizer sorts every output column and dies on
    list cells (pandas ``unhashable type: 'list'``).  Lattice coordinates
    are exact binary fractions, so ``cast(double as string)`` is a stable
    spelling; NULL parent stays NULL through ``array_join``'s null
    propagation."""
    s = lambda c: F.array_join(F.transform(c, lambda v: v.cast("string")), ",")
    return df.select(
        s("point").alias("point"),
        "halvings",
        s("parent").alias("parent"),
        "is_accepted",
        "cost",
    )


def _sphere(x: np.ndarray) -> float:
    return float((x * x).sum())


def _rosenbrock(x: np.ndarray) -> float:
    return float(((1 - x[:-1]) ** 2).sum() + 100.0 * ((x[1:] - x[:-1] ** 2) ** 2).sum())


def pattern_search_sphere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serial-mode sphere minimization; returns the evaluation ledger."""
    best, results = search(_sphere, [10.0, 15.0], [1.0, 1.0], seed=42)
    assert abs(best.point).max() < 0.02
    return _canon_ledger(results.to_spark(spark))


def pattern_search_rosenbrock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-D Rosenbrock with task budget; returns the evaluation ledger."""
    best, results = search(
        _rosenbrock, np.full(5, 2.0), np.full(5, 0.5), max_tasks=1500, seed=42
    )
    return _canon_ledger(results.to_spark(spark))


def pattern_search_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sphere minimization with cluster-side evaluation (mapInPandas),
    vectorized objective -- the reference's Trace B (batched/vectorized,
    search.py:324-335) on Spark."""

    def sphere_vec(xs: np.ndarray) -> np.ndarray:
        return (xs * xs).sum(axis=1)

    best, results = search(
        sphere_vec, [10.0, 15.0], [1.0, 1.0],
        spark=spark, vectorize=True, batchsize=16, stopratio=0.05, seed=42,
    )
    return _canon_ledger(results.to_spark(spark))


def pattern_search_pipelined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Async-approximation mode (the reference's speculative submission,
    search.py:240-250,299-324): two poll rounds in flight as concurrent
    Spark jobs via ``AsyncSparkEvaluator``.  Same optimum, same contraction
    gate; driver fill and cluster evaluation overlap."""

    def sphere_vec(xs: np.ndarray) -> np.ndarray:
        return (xs * xs).sum(axis=1)

    best, results = search(
        sphere_vec, [10.0, 15.0], [1.0, 1.0],
        spark=spark, vectorize=True, batchsize=16, stopratio=0.05, seed=42,
        pipeline_depth=2,
    )
    assert abs(best.point).max() < 0.8  # coarse stop: 0.05 stopratio grid
    return _canon_ledger(results.to_spark(spark))


def pattern_search_sphere_100d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's aspirational scale axis exercised live (reference
    search.py:55-61: 'intended to scale to ~100 dimensions'): 100-d sphere
    to stopratio=1e-2, vectorized serial evaluation (the stencil/driver
    cost IS the thing measured -- cluster dispatch would only add noise).
    Returns the per-halving convergence summary, not the 30k-row ledger."""
    best, results = search(
        lambda X: (np.atleast_2d(X) ** 2).sum(axis=1),
        np.full(100, 1.0),
        np.full(100, 0.5),
        stopratio=1e-2,
        seed=7,
        vectorize=True,
        batchsize=256,
        max_tasks=60_000,
    )
    assert abs(best.point).max() < 2 * 1e-2 * 0.5
    # summarize the ~55k-point ledger driver-side (it already lives there:
    # the ledger is the search loop's own state, as in the reference) --
    # shipping 55k 100-dim points through createDataFrame just to group
    # them to 10 rows costs ~10s of pure serialization
    agg: dict[int, list] = {}
    for p in results:
        a = agg.setdefault(p.halvings, [0, float("inf")])
        a[0] += 1
        if p.result < a[1]:
            a[1] = p.result
    rows = [
        (int(h), int(n), round(float(m), 8))
        for h, (n, m) in sorted(agg.items())
    ]
    return spark.createDataFrame(
        rows, "halvings int, n_evals int, best_result double"
    )


def pattern_search_100d_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aspirational 100-dim axis ON THE EXECUTOR PATH (reference
    search.py:55-61 x clients.py's distributed client): 100-d sphere with
    cluster-side vectorized evaluation and two poll rounds in flight
    (``pipeline_depth=2``, the async-approximation mode).  Coarse
    stopratio keeps the round count small -- the datapoint is round-count
    scaling at dims=100 on the distributed evaluator, not the full
    convergence ledger (pattern_search_sphere_100d covers that axis
    serially).  Returns a one-row summary: rounds processed, tasks
    evaluated, best cost."""

    def sphere_vec(xs: np.ndarray) -> np.ndarray:
        return (np.atleast_2d(xs) ** 2).sum(axis=1)

    best, results = search(
        sphere_vec,
        np.full(100, 1.0),
        np.full(100, 0.5),
        spark=spark,
        vectorize=True,
        batchsize=512,
        stopratio=0.25,
        seed=7,
        pipeline_depth=2,
        max_tasks=20,  # task = one batch (reference search.py:293 semantics)
    )
    assert results.rounds >= 2
    assert best.result <= 100.0  # improved on the f(start)=100 origin-offset
    return spark.createDataFrame(
        [(int(results.rounds), int(len(results)), round(float(best.result), 8))],
        "n_rounds int, n_evals int, best_result double",
    )


QUERIES = {
    "pattern_search_sphere": pattern_search_sphere,
    "pattern_search_100d_distributed": pattern_search_100d_distributed,
    "pattern_search_sphere_100d": pattern_search_sphere_100d,
    "pattern_search_rosenbrock": pattern_search_rosenbrock,
    "pattern_search_distributed": pattern_search_distributed,
    "pattern_search_pipelined": pattern_search_pipelined,
}

ORACLE: dict[str, str] = {}
