"""pyspark.ml Estimator facade (PatternSearchMinimizer / Model)."""

import numpy as np
import pytest
from pyspark.ml.linalg import Vectors

from dask_patternsearch_spark.ml import PatternSearchMinimizer


def _make_sphere():
    # local def, not module-level: cloudpickle then serializes it by VALUE,
    # so executor workers don't need the tests/ dir on their import path
    def sphere(x):
        return float((x * x).sum())

    return sphere


sphere = _make_sphere()


def test_estimator_fit_minimizes_and_exposes_ledger(spark):
    est = PatternSearchMinimizer(sphere, x0=[10.0, 15.0],
                                 stepsize=[1.0, 1.0], seed=42)
    model = est.fit(spark.range(1))
    # converged incumbent == ledger min (reference test_search.py:36)
    assert np.abs(np.asarray(model.bestPoint)).max() < 0.02
    led = model.ledger()
    assert [f.name for f in led.schema] == [
        "point", "halvings", "parent", "is_accepted", "cost"]
    assert led.schema["point"].dataType.typeName() == "vectorudt"
    rows = led.collect()
    assert len(rows) == model.numEvaluations
    assert model.bestCost == min(r["cost"] for r in rows)
    # params propagate estimator -> model
    assert model.getOrDefault(model.seed) == 42


def test_estimator_deterministic_trace_matches_search(spark):
    from dask_patternsearch_spark import search

    best, results = search(sphere, [10.0, 15.0], [1.0, 1.0], randomize=False)
    model = PatternSearchMinimizer(
        sphere, x0=[10.0, 15.0], stepsize=[1.0, 1.0], randomize=False
    ).fit(spark.range(1))
    assert model.numEvaluations == len(results)
    assert model.bestCost == best.result


def test_model_transform_scores_candidate_points(spark):
    model = PatternSearchMinimizer(
        sphere, x0=[4.0, 4.0], stepsize=[1.0, 1.0], seed=1, maxTasks=30
    ).fit(spark.range(1))
    pts = spark.createDataFrame(
        [(Vectors.dense([1.0, 2.0]),), (Vectors.dense([0.0, 0.0]),)],
        ["point"],
    )
    got = {tuple(r["point"]): r["cost"] for r in model.transform(pts).collect()}
    assert got[(1.0, 2.0)] == 5.0
    assert got[(0.0, 0.0)] == 0.0


def test_estimator_distributed_and_vectorized(spark):
    def sphere_vec(xs):
        return (np.atleast_2d(xs) ** 2).sum(axis=1)

    model = PatternSearchMinimizer(
        sphere_vec, x0=[10.0, 15.0], stepsize=[1.0, 1.0], seed=42,
        distributed=True, vectorize=True, batchsize=16, stopratio=0.05,
    ).fit(spark.range(1))
    assert np.abs(np.asarray(model.bestPoint)).max() < 0.8
    # the vectorized objective also drives transform() in one batch call
    pts = spark.createDataFrame([(Vectors.dense([3.0, 4.0]),)], ["point"])
    assert model.transform(pts).collect()[0]["cost"] == 25.0


def test_estimator_passes_through_engine_kwargs(spark):
    model = PatternSearchMinimizer(
        sphere, x0=[2.0, 2.0], stepsize=[0.5, 0.5], seed=7,
        bounds=([1.0, 1.0], [3.0, 3.0]),
    ).fit(spark.range(1))
    led = model.ledger().collect()
    for r in led:
        p = np.asarray(r["point"])
        assert (p >= 1.0 - 1e-9).all() and (p <= 3.0 + 1e-9).all()


def test_model_transform_survives_empty_partitions(spark):
    """Empty Arrow batches must not crash the scoring UDF (np.stack raises
    'need at least one array to stack' on a zero-length batch)."""
    model = PatternSearchMinimizer(
        sphere, x0=[2.0, 2.0], stepsize=[1.0, 1.0], seed=1, maxTasks=20
    ).fit(spark.range(1))
    # a fully empty input and a mostly-empty repartition both go through
    from pyspark.ml.linalg import VectorUDT
    from pyspark.sql import types as T

    empty = spark.createDataFrame(
        [], T.StructType([T.StructField("point", VectorUDT())])
    )
    assert model.transform(empty).collect() == []
    pts = spark.createDataFrame(
        [(Vectors.dense([1.0, 2.0]),), (Vectors.dense([0.0, 0.0]),)],
        ["point"],
    ).repartition(8)
    got = {tuple(r["point"]): r["cost"] for r in model.transform(pts).collect()}
    assert got == {(1.0, 2.0): 5.0, (0.0, 0.0): 0.0}


def test_estimator_save_load_roundtrip(spark, tmp_path):
    """DefaultParamsWritable persistence: every declared Param survives a
    save()/load() round trip; the objective (code) deliberately does not,
    and a loaded estimator demands setObjective() before fit()."""
    est = PatternSearchMinimizer(
        sphere, x0=[10.0, 15.0], stepsize=[1.0, 1.0], seed=42,
        maxTasks=25, randomize=False, batchsize=4,
    )
    p = str(tmp_path / "est")
    est.save(p)
    loaded = PatternSearchMinimizer.load(p)
    for param in est.params:
        assert (loaded.getOrDefault(loaded.getParam(param.name))
                == est.getOrDefault(param)), param.name
    with pytest.raises(ValueError, match="setObjective"):
        loaded.fit(spark.range(1))
    # re-supplied objective reproduces the original fit exactly
    m1 = est.fit(spark.range(1))
    m2 = loaded.setObjective(sphere).fit(spark.range(1))
    assert m2.numEvaluations == m1.numEvaluations
    assert m2.bestCost == m1.bestCost
    assert list(m2.bestPoint) == list(m1.bestPoint)


def test_model_save_load_roundtrip(spark, tmp_path):
    """Model persistence: incumbent, ledger (with lineage) and Params all
    survive save()/load(); transform() demands setObjective() first and
    then scores identically to the original model."""
    model = PatternSearchMinimizer(
        sphere, x0=[6.0, 7.0], stepsize=[1.0, 1.0], seed=3, maxTasks=40,
        outputCol="score",
    ).fit(spark.range(1))
    p = str(tmp_path / "model")
    model.save(p)
    from dask_patternsearch_spark.ml import PatternSearchModel

    loaded = PatternSearchModel.load(p)
    assert list(loaded.bestPoint) == list(model.bestPoint)
    assert loaded.bestCost == model.bestCost
    assert loaded.numEvaluations == model.numEvaluations
    assert loaded.getOrDefault(loaded.outputCol) == "score"
    led_a = {(tuple(r["point"]), r["halvings"],
              None if r["parent"] is None else tuple(r["parent"]),
              r["is_accepted"], r["cost"])
             for r in model.ledger().collect()}
    led_b = {(tuple(r["point"]), r["halvings"],
              None if r["parent"] is None else tuple(r["parent"]),
              r["is_accepted"], r["cost"])
             for r in loaded.ledger().collect()}
    assert led_a == led_b
    pts = spark.createDataFrame([(Vectors.dense([2.0, 2.0]),)], ["point"])
    with pytest.raises(ValueError, match="setObjective"):
        loaded.transform(pts).collect()
    got = loaded.setObjective(sphere).transform(pts).collect()[0]["score"]
    assert got == 8.0


def _make_walled_sphere():
    def walled(x):
        # inf wall on one side: failed/rejected evaluations with a
        # non-finite cost (the reference treats inf as "reject")
        if x[0] > 7.0:
            return float("inf")
        return float((x * x).sum())

    return walled


def test_model_save_load_restores_nonfinite_costs(spark, tmp_path):
    """Non-finite costs must survive the ledger round trip exactly: the
    parquet cost column stores NULL (portable) but the cost_kind sidecar
    restores float('inf') on load, so a reloaded model's in-memory ledger
    is identical to the saved one -- failed evaluations keep their inf
    marker instead of degrading to None."""
    import math

    from dask_patternsearch_spark.ml import PatternSearchModel

    model = PatternSearchMinimizer(
        _make_walled_sphere(), x0=[6.0, 0.0], stepsize=[2.0, 2.0], seed=1,
        maxTasks=30,
    ).fit(spark.range(1))
    def _costs(results):
        # string-normalized multiset: nan/inf compare unlike floats
        return sorted(repr(c) for c in results.values())

    saved_costs = _costs(model._results)
    assert "inf" in saved_costs, "fixture must hit the inf wall"
    p = str(tmp_path / "model_inf")
    model.save(p)
    loaded = PatternSearchModel.load(p)
    loaded_costs = _costs(loaded._results)
    assert loaded_costs == saved_costs
    # the TrialPoint.result markers round-trip too (not just dict values)
    inf_pts_a = {p.point.tobytes() for p, c in model._results.items()
                 if c is not None and math.isinf(c)}
    inf_pts_b = {p.point.tobytes() for p, c in loaded._results.items()
                 if c is not None and math.isinf(c)}
    assert inf_pts_a == inf_pts_b
    # the public ledger() schema is unchanged: NULL cost, no sidecar
    assert "cost_kind" not in loaded.ledger().columns


def test_minimizer_composes_with_pipeline_and_param_grid(spark, tmp_path):
    """The facade must compose with the REAL MLlib machinery, not just
    standalone fit/transform: (a) as a pyspark.ml.Pipeline stage --
    fit yields a PipelineModel whose transform scores points; the
    pipeline persists and, objective re-supplied post-load (the
    documented contract), refits identically; (b) under a
    ParamGridBuilder sweep over stepsize/stopratio via Estimator.fit's
    multi-paramMap form -- each grid cell's model reflects its own
    params (tighter stopratio => deeper contraction => at least as many
    evaluations, never fewer)."""
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.tuning import ParamGridBuilder

    from dask_patternsearch_spark.ml import PatternSearchModel

    est = PatternSearchMinimizer(
        sphere, x0=[5.0, 4.0], stepsize=[1.0, 1.0], seed=7, maxTasks=60,
        randomize=False, outputCol="score",
    )
    pts = spark.createDataFrame(
        [(Vectors.dense([1.0, 2.0]),), (Vectors.dense([0.0, 3.0]),)],
        ["point"])

    # (a) Pipeline stage
    pipe = Pipeline(stages=[est])
    pm = pipe.fit(spark.range(1))
    stage = pm.stages[0]
    assert isinstance(stage, PatternSearchModel)
    got = {tuple(r["point"]): r["score"]
           for r in pm.transform(pts).collect()}
    assert got == {(1.0, 2.0): 5.0, (0.0, 3.0): 9.0}
    # pipeline persistence: Params round-trip, objective re-supplied
    p = str(tmp_path / "pipe")
    pipe.save(p)
    loaded = Pipeline.load(p)
    lest = loaded.getStages()[0]
    assert isinstance(lest, PatternSearchMinimizer)
    assert lest.getOrDefault(lest.stopratio) == est.getOrDefault(
        est.stopratio)
    pm2 = Pipeline(stages=[lest.setObjective(sphere)]).fit(spark.range(1))
    assert list(pm2.stages[0].bestPoint) == list(stage.bestPoint)
    assert pm2.stages[0].numEvaluations == stage.numEvaluations
    # fitted PipelineModel persistence round-trips the model stage too
    mp = str(tmp_path / "pipe_model")
    pm.save(mp)
    pm3 = PipelineModel.load(mp)
    assert list(pm3.stages[0].bestPoint) == list(stage.bestPoint)
    got3 = {tuple(r["point"]): r["score"]
            for r in pm3.stages[0].setObjective(sphere)
            .transform(pts).collect()}
    assert got3 == got

    # (b) ParamGridBuilder sweep: fit(dataset, params=list-of-maps)
    grid = (ParamGridBuilder()
            .addGrid(est.stepsize, [[1.0, 1.0], [2.0, 2.0]])
            .addGrid(est.stopratio, [0.5, 0.01])
            .build())
    assert len(grid) == 4
    models = est.fit(spark.range(1), params=grid)
    assert len(models) == 4
    by_cell = {}
    for pmap, model in zip(grid, models):
        key = (tuple(pmap[est.stepsize]), pmap[est.stopratio])
        by_cell[key] = model
        assert model.getOrDefault(model.stopratio) == pmap[est.stopratio]
        assert model.bestCost <= sphere(np.asarray([5.0, 4.0]))
    for step in ((1.0, 1.0), (2.0, 2.0)):
        deep = by_cell[(step, 0.01)]
        shallow = by_cell[(step, 0.5)]
        assert deep.numEvaluations >= shallow.numEvaluations
        assert deep.bestCost <= shallow.bestCost
