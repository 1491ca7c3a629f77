"""``pyspark.ml``-style facade over :func:`search` -- the Estimator/Model
packaging the reference's "MLlib optimization routines" framing implies
(BASELINE.json; reference driver loop ``search.py:48-362``).

MLlib's own optimizers are gradient-based and cannot host a derivative-free
generating-set search, so the engine remains the driver-loop + DataFrame
design (SURVEY.md section 7); this module only adapts it to the Estimator
contract so pipelines that speak ``pyspark.ml`` can call it natively:

* ``PatternSearchMinimizer`` is an :class:`~pyspark.ml.Estimator` whose
  Params mirror the ``search()`` config.  ``fit(dataset)`` runs the search
  on the dataset's SparkSession (cluster-side evaluation when
  ``distributed=True``) and ignores the dataset's ROWS -- the objective is
  a black-box callable, not a column fit; any DataFrame works, e.g.
  ``spark.range(1)``.
* ``PatternSearchModel`` is the fitted :class:`~pyspark.ml.Transformer`:
  ``bestPoint`` (:class:`~pyspark.ml.linalg.DenseVector`), ``bestCost``,
  ``ledger()`` (the evaluation ledger with a VectorUDT point column, via
  ``SearchResults.to_spark``), and ``transform(df)`` scores a VectorUDT
  ``inputCol`` with the SAME objective (Arrow-batched pandas UDF -- the
  model evaluates candidate points, it never re-runs the search).
"""

from __future__ import annotations

import numpy as np
from pyspark.ml import Estimator, Transformer
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark.ml.util import (DefaultParamsReadable, DefaultParamsReader,
                             DefaultParamsWritable, DefaultParamsWriter,
                             MLReadable, MLReader, MLWritable, MLWriter)

from .search import search

__all__ = ["PatternSearchMinimizer", "PatternSearchModel"]


class _SearchParams(Params):
    """Params shared by the estimator and (for provenance) the model."""

    x0 = Param(Params._dummy(), "x0", "starting point",
               typeConverter=TypeConverters.toListFloat)
    stepsize = Param(Params._dummy(), "stepsize", "initial step per dim",
                     typeConverter=TypeConverters.toListFloat)
    maxTasks = Param(Params._dummy(), "maxTasks", "evaluation budget",
                     typeConverter=TypeConverters.toInt)
    seed = Param(Params._dummy(), "seed", "rng seed for the stencil shuffle",
                 typeConverter=TypeConverters.toInt)
    randomize = Param(Params._dummy(), "randomize",
                      "shuffle stencil chunks (False = deterministic trace)",
                      typeConverter=TypeConverters.toBoolean)
    distributed = Param(Params._dummy(), "distributed",
                        "evaluate rounds as Spark jobs on the dataset's "
                        "session (False = driver-local evaluation)",
                        typeConverter=TypeConverters.toBoolean)
    vectorize = Param(Params._dummy(), "vectorize",
                      "objective takes an (n, dims) batch",
                      typeConverter=TypeConverters.toBoolean)
    batchsize = Param(Params._dummy(), "batchsize",
                      "points per evaluation batch (0 = unbatched)",
                      typeConverter=TypeConverters.toInt)
    stopratio = Param(Params._dummy(), "stopratio",
                      "terminate when the step shrinks to this fraction "
                      "of the initial stepsize",
                      typeConverter=TypeConverters.toFloat)
    inputCol = Param(Params._dummy(), "inputCol",
                     "VectorUDT column of points for transform()",
                     typeConverter=TypeConverters.toString)
    outputCol = Param(Params._dummy(), "outputCol",
                      "objective-value column added by transform()",
                      typeConverter=TypeConverters.toString)


class PatternSearchMinimizer(Estimator, _SearchParams,
                             DefaultParamsWritable, DefaultParamsReadable):
    """Estimator facade: ``fit()`` minimizes ``func`` via :func:`search`.

    ``func`` is a black-box Python callable (not a Param: Params must be
    JVM-serializable values; an objective is code).  Extra ``search()``
    keywords -- bounds, integer_dimensions, warm_start, ledger_path,
    pipeline_depth, ... -- pass through ``search_kwargs`` untouched, so
    the facade never lags the engine's feature surface.

    **Persistence contract** (``save()``/``load()`` via
    ``DefaultParamsWritable``): only the declared Params round-trip --
    x0, stepsize, budget, seed, execution flags, column names.  The
    objective is CODE and is deliberately not serialized (pickling
    arbitrary closures to disk is neither portable nor safe to reload);
    a loaded estimator must be given its objective again with
    :meth:`setObjective` before ``fit()``, which raises a descriptive
    error otherwise.  ``search_kwargs`` are likewise not persisted (they
    may hold non-serializable values such as warm-start dicts or
    evaluator objects) -- re-supply them via :meth:`setSearchKwargs`.
    """

    def __init__(self, func=None, x0=None, stepsize=None, maxTasks=None,
                 seed=None, randomize=True, distributed=False,
                 vectorize=False, batchsize=0, stopratio=0.01,
                 inputCol="point", outputCol="cost", **search_kwargs):
        super().__init__()
        self.func = func
        self.search_kwargs = search_kwargs
        self._setDefault(maxTasks=-1, seed=-1, randomize=True,
                         distributed=False, vectorize=False, batchsize=0,
                         stopratio=0.01, inputCol="point", outputCol="cost")
        # x0/stepsize optional so DefaultParamsReader can instantiate the
        # class bare before restoring the persisted Params
        if x0 is not None:
            self._set(x0=list(np.asarray(x0, dtype=float)))
        if stepsize is not None:
            self._set(stepsize=list(np.asarray(stepsize, dtype=float)))
        self._set(randomize=randomize, distributed=distributed,
                  vectorize=vectorize, batchsize=batchsize,
                  stopratio=stopratio, inputCol=inputCol,
                  outputCol=outputCol)
        if maxTasks is not None:
            self._set(maxTasks=maxTasks)
        if seed is not None:
            self._set(seed=seed)

    def setObjective(self, func) -> "PatternSearchMinimizer":
        """Re-attach the objective callable (required after ``load()``)."""
        self.func = func
        return self

    def setSearchKwargs(self, **search_kwargs) -> "PatternSearchMinimizer":
        """Re-attach pass-through ``search()`` keywords after ``load()``."""
        self.search_kwargs = search_kwargs
        return self

    def _fit(self, dataset: DataFrame) -> "PatternSearchModel":
        if self.func is None:
            raise ValueError(
                "objective not set: save()/load() persists only the Params "
                "(the objective is code and is never serialized); call "
                "setObjective(func) on the loaded estimator before fit()"
            )
        # x0/stepsize are optional only so DefaultParamsReader can
        # construct the class bare -- a user-built estimator must have
        # them, and a bare getOrDefault would raise an opaque Param error
        if not (self.isDefined(self.x0) and self.isDefined(self.stepsize)):
            raise ValueError(
                "x0 and stepsize are required: pass them at construction, "
                "or load() a persisted estimator (which restores them)"
            )
        m = self.getOrDefault
        max_tasks = m(self.maxTasks)
        seed = m(self.seed)
        # explicit search_kwargs win over the Param (back-compat with
        # callers that passed stopratio through kwargs before it was one)
        kw = dict(self.search_kwargs)
        kw.setdefault("stopratio", m(self.stopratio))
        best, results = search(
            self.func,
            np.asarray(m(self.x0)),
            np.asarray(m(self.stepsize)),
            max_tasks=None if max_tasks < 0 else max_tasks,
            seed=None if seed < 0 else seed,
            randomize=m(self.randomize),
            spark=dataset.sparkSession if m(self.distributed) else None,
            vectorize=m(self.vectorize),
            batchsize=m(self.batchsize) or None,
            **kw,
        )
        model = PatternSearchModel(self.func, best, results,
                                   dataset.sparkSession)
        self._copyValues(model)
        return model


class _ModelWriter(MLWriter):
    """Params + summary metadata + the evaluation ledger as parquet."""

    def __init__(self, instance):
        super().__init__()
        self.instance = instance

    def saveImpl(self, path: str) -> None:
        import os

        m = self.instance
        DefaultParamsWriter.saveMetadata(
            m, path, self.sc,
            extraMetadata={
                "bestPoint": [float(x) for x in m._best.point],
                "bestHalvings": int(m._best.halvings),
                "bestCost": m.bestCost,
                "rounds": int(getattr(m._results, "rounds", 0)),
            },
        )
        # cost_kind sidecar makes the round trip lossless for non-finite
        # costs (to_spark maps inf/nan -> NULL in the cost column; the
        # reader restores the exact value from the kind)
        m._results.to_spark(m._spark, cost_kind=True).write.mode(
            "overwrite").parquet(os.path.join(path, "ledger"))


class _ModelReader(MLReader):
    def __init__(self, cls):
        super().__init__()
        self._cls = cls

    def load(self, path: str) -> "PatternSearchModel":
        import os

        from .search import SearchResults, TrialPoint

        metadata = DefaultParamsReader.loadMetadata(path, self.sc)
        spark = self.sparkSession
        results = SearchResults()
        by_key: dict[bytes, TrialPoint] = {}
        ledger = spark.read.parquet(os.path.join(path, "ledger"))
        has_kind = "cost_kind" in ledger.columns
        _restore = {"inf": float("inf"), "-inf": float("-inf"),
                    "nan": float("nan")}
        rows = ledger.collect()
        for r in rows:
            tp = TrialPoint(np.asarray(r["point"], dtype=float),
                            int(r["halvings"]))
            tp.is_accepted = bool(r["is_accepted"])
            cost = r["cost"]
            if has_kind and r["cost_kind"] in _restore:
                # lossless non-finite round trip: to_spark wrote NULL,
                # the sidecar kind carries the original inf/nan marker
                cost = _restore[r["cost_kind"]]
            tp.result = cost
            by_key[tp.point.tobytes()] = tp
            results[tp] = cost
        for r, tp in zip(rows, list(results)):
            if r["parent"] is not None:
                tp.parent = by_key.get(
                    np.asarray(r["parent"], dtype=float).tobytes())
        results.rounds = int(metadata["rounds"])
        best = by_key.get(
            np.asarray(metadata["bestPoint"], dtype=float).tobytes())
        if best is None:  # ledger truncation tolerance: rebuild the record
            best = TrialPoint(np.asarray(metadata["bestPoint"], dtype=float),
                              int(metadata["bestHalvings"]))
            best.result = float(metadata["bestCost"])
        model = self._cls(None, best, results, spark)
        model._resetUid(metadata["uid"])
        DefaultParamsReader.getAndSetParams(model, metadata)
        return model


class PatternSearchModel(Transformer, _SearchParams, MLWritable, MLReadable):
    """Fitted minimizer: the incumbent, the ledger, and a scorer.

    **Persistence contract**: ``save()`` writes the Params, the incumbent
    summary, and the full evaluation ledger (parquet, ``to_spark``
    schema, parent lineage included); ``load()`` restores all of it --
    ``bestPoint``/``bestCost``/``numEvaluations``/``ledger()`` work
    immediately.  The objective is code and is not serialized:
    ``transform()`` on a loaded model raises until
    :meth:`setObjective` re-attaches it (same contract as the
    estimator).  Ledger row order after a reload is parquet scan order,
    not evaluation order -- use ``ledger_path`` checkpoints on
    ``search()`` itself where chronological replay matters.  Non-finite
    costs (inf/nan: failed evaluations) round-trip exactly: the ledger's
    ``cost`` column stores NULL (parquet-portable) and a ``cost_kind``
    sidecar column carries the original marker, restored on load."""

    def __init__(self, func=None, best=None, results=None, spark=None):
        super().__init__()
        self.func = func
        self._best = best
        self._results = results
        self._spark = spark

    def setObjective(self, func) -> "PatternSearchModel":
        """Re-attach the objective callable (required after ``load()``
        before ``transform()``)."""
        self.func = func
        return self

    def write(self) -> MLWriter:
        return _ModelWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return _ModelReader(cls)

    @property
    def bestPoint(self):
        from pyspark.ml.linalg import Vectors

        return Vectors.dense(self._best.point)

    @property
    def bestCost(self) -> float:
        return float(self._best.result)

    @property
    def numEvaluations(self) -> int:
        return len(self._results)

    def ledger(self) -> DataFrame:
        """The evaluation ledger with VectorUDT point/parent columns
        (``SearchResults.to_spark`` re-typed for pyspark.ml consumers)."""
        df = self._results.to_spark(self._spark)
        return df.select(
            array_to_vector("point").alias("point"),
            "halvings",
            F.when(F.col("parent").isNotNull(),
                   array_to_vector("parent")).alias("parent"),
            "is_accepted",
            "cost",
        )

    def _transform(self, dataset: DataFrame) -> DataFrame:
        """Score candidate points: evaluate the fitted objective on the
        VectorUDT ``inputCol``.  Arrow-batched pandas UDF (one Python
        round trip per batch, never per row); a vectorized objective gets
        the whole (n, dims) batch in one call."""
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        if self.func is None:
            raise ValueError(
                "objective not set: a loaded PatternSearchModel persists "
                "the ledger and Params but never the objective (it is "
                "code); call setObjective(func) before transform()"
            )
        func = self.func
        vec = self.getOrDefault(self.vectorize)

        # no type hints on purpose: `from __future__ import annotations`
        # stringifies them, which breaks pandas_udf's hint inference
        def _score(points):
            if len(points) == 0:  # np.stack raises on an empty Arrow batch
                return pd.Series([], dtype=float)
            xs = np.stack(points.to_numpy())
            if vec:
                return pd.Series(np.asarray(func(xs), dtype=float))
            return pd.Series([float(func(x)) for x in xs])

        score = pandas_udf(_score, T.DoubleType())

        in_col, out_col = (self.getOrDefault(self.inputCol),
                           self.getOrDefault(self.outputCol))
        return dataset.withColumn(out_col, score(vector_to_array(in_col)))
