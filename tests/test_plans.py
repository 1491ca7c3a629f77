"""Physical-plan regression tests: lock in the plans we want at scale.

Each assertion is a scale property: dim-table joins must broadcast,
predicates must reach the parquet scan, projections must prune columns,
and Python must stay out of Catalyst-expressible pipelines.
"""

from pyspark.sql import functions as F

from dask_patternsearch_spark.plans import summarize
from dask_patternsearch_spark.plans.inspect import plan_text
from dask_patternsearch_spark.queries import relational as R
from tests.conftest import SF_DIR


def test_q3_broadcasts_and_pushes_down(spark):
    info = summarize(R.QUERIES["q3_shipping_priority"](spark, SF_DIR))
    # at test scale every join should resolve to broadcast-hash
    assert info["broadcast_hash_joins"] >= 2
    assert info["nested_loop_joins"] == 0
    # the BUILDING segment filter must reach the customer scan
    assert any("c_mktsegment" in p for p in info["pushed_filters"])
    # lineitem scan must be pruned: no quantity/tax/returnflag columns
    li_schema = next(s for s in info["read_schemas"] if "l_orderkey" in s)
    assert "l_quantity" not in li_schema and "l_returnflag" not in li_schema


def test_q5_prunes_all_scans(spark):
    info = summarize(R.QUERIES["q5_region_revenue"](spark, SF_DIR))
    assert info["broadcast_hash_joins"] >= 4
    # every scan reads a narrow struct (the widest, lineitem, needs 4 cols)
    for schema in info["read_schemas"]:
        assert schema.count(",") <= 3, f"unpruned scan: {schema}"


def test_semi_join_pushes_quantity_filter(spark):
    info = summarize(R.QUERIES["semi_join_active_parts"](spark, SF_DIR))
    assert any("l_quantity" in p for p in info["pushed_filters"])


def test_catalyst_queries_have_no_python_stages(spark):
    """Relational queries must stay JVM-side end to end."""
    for name in ["q1_pricing_summary", "topk_customers", "window_rank_orders",
                 "sessionize_events", "cube_returns_modes", "shipping_lag_stats"]:
        info = summarize(R.QUERIES[name](spark, SF_DIR))
        assert info["python_stages"] == 0, f"{name} has a Python stage"


def test_q1_single_scan_narrow_partial_agg(spark):
    info = summarize(R.QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert len(info["read_schemas"]) == 1
    assert any("l_shipdate" in p for p in info["pushed_filters"])
    # map-side combine must run before the shuffle: the 600k-row (or 600B-row)
    # scan reduces to |groups| rows per partition prior to the exchange
    assert info["partial_aggregates"] >= 1


def test_broadcast_hint_survives_in_part_share(spark):
    info = summarize(R.QUERIES["part_type_share"](spark, SF_DIR))
    assert info["broadcast_hash_joins"] >= 1
    part_schema = next(s for s in info["read_schemas"] if "p_brand" in s)
    assert "p_retailprice" not in part_schema  # pruned


def test_bucketed_join_is_shuffle_free(spark):
    """Two tables bucketed on the join key must join with zero shuffle
    exchanges (the pay-once co-location contract of bucketing)."""
    from dask_patternsearch_spark.sources import write_bucketed_table

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    write_bucketed_table(orders, "b_orders", ["o_custkey"], n_buckets=8)
    write_bucketed_table(cust, "b_customer", ["c_custkey"], n_buckets=8)
    try:
        bo = spark.table("b_orders")
        bc = spark.table("b_customer")
        joined = bo.join(
            bc.hint("merge"), bo.o_custkey == bc.c_custkey
        ).select("o_orderkey", "c_name")
        info = summarize(joined)
        assert info["exchanges"] == 0, "bucketed join still shuffles"
        # and the answer is right
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
        assert joined.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_summarize_counts_python_stage(spark):
    """Sanity: the summarizer does see Python stages when present."""
    df = spark.range(10).select(F.col("id"))

    def identity(batches):
        yield from batches

    # formatted mode prints each node in the tree and the detail section,
    # so presence (>=1), not an exact count, is the contract
    info = summarize(df.mapInPandas(identity, "id long"))
    assert info["python_stages"] >= 1


def test_asof_join_plan_has_no_join_node(spark):
    """The merge-formulation as-of is ONE shuffle + window -- the physical
    plan must contain no join operator of any kind and stay JVM-side."""
    info = summarize(R.QUERIES["asof_join_purchase_click"](spark, SF_DIR))
    assert info["broadcast_hash_joins"] == 0
    assert info["sort_merge_joins"] == 0
    assert info["shuffled_hash_joins"] == 0
    assert info["nested_loop_joins"] == 0
    assert info["python_stages"] == 0
    # one hash exchange on user_id for the window (AQE may show a reused
    # exchange but never more than two)
    assert info["exchanges"] <= 2
    # event_type predicates must reach the scans
    assert any("event_type" in p for p in info["pushed_filters"])


def test_range_join_plan_avoids_nested_loop(spark):
    """Bucketing turns interval containment into an equi join: never
    BroadcastNestedLoopJoin, even though the predicate is non-equi."""
    info = summarize(R.QUERIES["range_join_price_bands"](spark, SF_DIR))
    assert info["nested_loop_joins"] == 0
    assert (
        info["broadcast_hash_joins"]
        + info["sort_merge_joins"]
        + info["shuffled_hash_joins"]
        >= 1
    )
    assert info["python_stages"] == 0


def test_q18_broadcasts_customer_dim(spark):
    info = summarize(R.QUERIES["q18_large_volume"](spark, SF_DIR))
    assert info["broadcast_hash_joins"] >= 1
    assert info["python_stages"] == 0


def test_q4_semi_join_pushes_date_filter(spark):
    info = summarize(R.QUERIES["q4_order_priority"](spark, SF_DIR))
    assert any("o_orderdate" in p for p in info["pushed_filters"])
    assert info["python_stages"] == 0
    # lineitem scan pruned to the two columns the semi join needs
    li_schema = next(s for s in info["read_schemas"] if "l_shipdate" in s)
    assert li_schema.count(",") <= 1, f"unpruned scan: {li_schema}"


def test_sql_topn_gets_window_group_limit(spark):
    """The rn<=2 filter over row_number must become WindowGroupLimit
    (partial + final), so each partition keeps 2 rows per key instead of
    ranking everything -- the top-n-per-group optimization at scale."""
    from dask_patternsearch_spark.plans import plan_text

    s = plan_text(R.QUERIES["sql_qualify_latest_orders"](spark, SF_DIR))
    assert s.count("WindowGroupLimit") >= 1


def test_q8_broadcasts_all_dim_chains(spark):
    """Q8's three dimension chains (part, supplier+nation, customer+nation+
    region) must all broadcast; only the two fact joins may shuffle."""
    from dask_patternsearch_spark.queries import tpch

    info = summarize(tpch.QUERIES["q8_market_share"](spark, SF_DIR))
    assert info["broadcast_hash_joins"] >= 4
    assert info["nested_loop_joins"] == 0
    # part type and order date range must push to their scans
    assert any("p_type" in p for p in info["pushed_filters"])
    assert any("o_orderdate" in p for p in info["pushed_filters"])


def test_q9_prunes_fact_scan(spark):
    """Q9's lineitem scan must stay narrow (join keys + measures only)."""
    from dask_patternsearch_spark.queries import tpch

    info = summarize(tpch.QUERIES["q9_product_profit"](spark, SF_DIR))
    assert info["broadcast_hash_joins"] >= 3
    li_schema = next(s for s in info["read_schemas"] if "l_extendedprice" in s)
    assert "l_shipdate" not in li_schema and "l_returnflag" not in li_schema


def test_bloom_join_filters_before_join(spark):
    """The bloom pre-filter (a Python eval stage) must sit between the
    probe scan and the join, and the join itself stays an equi join."""
    from dask_patternsearch_spark.queries import tpch

    df = tpch.QUERIES["bloom_join_building_revenue"](spark, SF_DIR)
    info = summarize(df)
    assert info["python_stages"] >= 1  # the vectorized membership UDF
    assert info["nested_loop_joins"] == 0
    text = plan_text(df)
    # filter stage appears before the final join in the bottom-up plan walk
    assert "pythonUDF" in text or "ArrowEvalPython" in text


def test_upsert_is_single_aggregate_no_sort(spark):
    """upsert must plan as hash aggregation (max_by partial+final), never
    a window sort."""
    from dask_patternsearch_spark.queries.pipeline import QUERIES as P

    df = P["upsert_reactivated_customers"](spark, SF_DIR)
    text = plan_text(df)
    assert "Window" not in text
    assert "max_by" in text or "HashAggregate" in text


def test_q2_broadcasts_dims_and_prunes_fact(spark):
    """Q2: region/nation/part/supplier lookups broadcast; the lineitem scan
    reads only the 4 columns the offer aggregate needs."""
    from dask_patternsearch_spark.queries import tpch as TT

    info = summarize(TT.QUERIES["q2_min_cost_supplier"](spark, SF_DIR))
    assert info["broadcast_hash_joins"] >= 3
    assert info["nested_loop_joins"] == 0
    li_schema = next(s for s in info["read_schemas"] if "l_partkey" in s)
    for col in ("l_shipdate", "l_discount", "l_tax", "l_returnflag"):
        assert col not in li_schema, f"unpruned lineitem column {col}"


def test_q16_anti_join_broadcasts(spark):
    """Q16: the complaints NOT IN list and the part filter both broadcast;
    no Python stages anywhere."""
    from dask_patternsearch_spark.queries import tpch as TT

    info = summarize(TT.QUERIES["q16_part_supplier_counts"](spark, SF_DIR))
    assert info["broadcast_hash_joins"] >= 2
    assert info["python_stages"] == 0
    li_schema = next(s for s in info["read_schemas"] if "l_partkey" in s)
    assert "l_extendedprice" not in li_schema


def test_q13_left_join_preserves_and_preaggregates(spark):
    """Q13: orders pre-aggregate to one row per customer BEFORE the outer
    join (partial agg exists), and the plan stays JVM-side."""
    from dask_patternsearch_spark.queries import tpch as TT

    info = summarize(TT.QUERIES["q13_customer_distribution"](spark, SF_DIR))
    assert info["python_stages"] == 0
    assert info["partial_aggregates"] >= 1
    # customer scan needs only the key
    cust_schema = next(s for s in info["read_schemas"] if "c_custkey" in s)
    assert "c_acctbal" not in cust_schema and "c_name" not in cust_schema


def test_tfidf_stays_jvm_side(spark):
    """TF-IDF is pure Catalyst: explode + two aggregates + window, no
    Python stage, and the documents scan reads only (doc_id, text)."""
    from dask_patternsearch_spark.queries import pipeline as P

    from dask_patternsearch_spark.operators import text as T

    # a cached full-width documents relation (left by earlier tests) would
    # replace the pruned scan and defeat the ReadSchema assertion
    spark.catalog.clearCache()
    # materialize=False: the runtime default localCheckpoints the shared tf
    # relation, which truncates lineage and hides the scan from explain()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    info = summarize(T.tfidf_top_terms(docs, materialize=False))
    assert info["python_stages"] == 0
    doc_schema = next(s for s in info["read_schemas"] if "doc_id" in s)
    assert "lang" not in doc_schema and "source" not in doc_schema


def test_whole_relational_surface_plan_audit(spark):
    """Suite-wide physical-plan gate: across EVERY relational/TPC-H query,
    no accidental cartesian products and no Python stages.  Scalar-
    subquery broadcasts (q15/q22/q11-style) legitimately plan as
    BroadcastNestedLoopJoin on a one-row side; true cross joins are only
    the explicitly-declared ones."""
    from dask_patternsearch_spark.queries import relational as R
    from dask_patternsearch_spark.queries import tpch as TT

    # one-row-side broadcasts or declared cartesian products
    nested_loop_ok = {
        "cross_join_nation_region",     # explicit cartesian demo
        "q15_top_supplier", "q22_dormant_balances", "q11_important_stock",
        "q8_market_share",              # scalar threshold cross joins
        "funnel_conversion", "winsorized_value_stats", "mad_outlier_counts",
        "null_semantics_flags", "tfidf_top_terms", "source_mixture_weights",
        "q17_small_quantity_revenue", "q18_large_volume", "q20_excess_shippers",
        "resample_hourly_gaps",         # scalar min/max grid bounds broadcast
        "price_decile_bins",            # one-row edge vector broadcast
        "skew_report_orders",           # one-row corpus-stats broadcast
        "cascade_delete_audit",         # 1-row deleted x 1-row total cross joins
    }
    # declared Python-stage queries: a pandas-UDF demo and the bloom join's
    # vectorized membership probe
    python_ok = {"grouped_map_user_gaps", "scalar_pandas_udf_prices",
                 "bloom_join_building_revenue"}
    spark.catalog.clearCache()
    offenders = []
    for name, fn in {**R.QUERIES, **TT.QUERIES}.items():
        info = summarize(fn(spark, SF_DIR))
        if info["python_stages"] > 0 and name not in python_ok:
            offenders.append((name, "python_stage"))
        if info["nested_loop_joins"] > 0 and name not in nested_loop_ok:
            offenders.append((name, "nested_loop"))
    assert not offenders, offenders


def test_dynamic_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """A partition-column join against a filtered dim must inject a dynamic
    pruning subquery into the fact scan: at 100 TB only the partitions the
    dim selects are read at all (runtime analog of static partition
    pruning; stock Catalyst, no custom rules)."""
    from pyspark.sql import functions as F

    from dask_patternsearch_spark.plans.inspect import plan_text
    from tests.conftest import SF_DIR

    path = str(tmp_path / "orders_by_year")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    orders.withColumn("yr", F.year("o_orderdate")).write.partitionBy(
        "yr"
    ).parquet(path)
    fact = spark.read.parquet(path)
    # the pruning year arrives at runtime (filter on a NON-partition column
    # of the dim), so static pruning can't precompute it
    dim = (
        orders.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .filter(F.col("rev") > 0)
        .limit(2)
    )
    joined = fact.join(F.broadcast(dim), "yr").groupBy("yr").count()
    text = plan_text(joined).lower()
    assert "dynamicpruning" in text or "dynamicpruningexpression" in text, (
        "expected a dynamic partition pruning subquery in the fact scan"
    )


def test_lateral_decorrelates_to_window_join(spark):
    """The correlated LATERAL top-n must NOT plan as a per-outer-row
    nested-loop subquery: Catalyst decorrelates it into a ranked window
    over orders joined back to customer."""
    from dask_patternsearch_spark.queries import relational as R

    info = summarize(R.QUERIES["sql_lateral_top_orders"](spark, SF_DIR))
    assert info["nested_loop_joins"] == 0
    assert info["python_stages"] == 0


def test_variant_query_stays_jvm_side(spark):
    """VARIANT parse + typed extraction is native Catalyst: no Python
    stage, single scan reading only (event_type, props)."""
    from dask_patternsearch_spark.queries import relational as R

    spark.catalog.clearCache()
    info = summarize(R.QUERIES["variant_event_props"](spark, SF_DIR))
    assert info["python_stages"] == 0
    assert any("props" in s and "user_id" not in s for s in info["read_schemas"])


def test_substring_dup_stays_jvm_and_prunes(spark):
    """The window explode + hash + double aggregate must be pure Catalyst:
    no Python stage anywhere, and the documents scan pruned to the two
    columns the operator touches."""
    from dask_patternsearch_spark.queries import pipeline as P

    info = summarize(P.QUERIES["substring_dup_docs"](spark, SF_DIR))
    assert info["python_stages"] == 0
    for schema in info["read_schemas"]:
        assert "lang" not in schema and "source" not in schema


def test_bm25_broadcasts_stats_and_stays_jvm(spark):
    from dask_patternsearch_spark.queries import pipeline as P

    info = summarize(P.QUERIES["bm25_top_docs"](spark, SF_DIR))
    assert info["python_stages"] == 0
    # df + corpus stats arrive by broadcast, never a shuffle join
    assert info["broadcast_hash_joins"] >= 2
    assert info["sort_merge_joins"] == 0


def test_weighted_sample_is_topk_not_full_sort(spark):
    from dask_patternsearch_spark.queries import pipeline as P

    df = P.QUERIES["weighted_sample_docs"](spark, SF_DIR)
    text = plan_text(df)
    assert "TakeOrderedAndProject" in text
    info = summarize(df)
    assert info["python_stages"] == 0
    assert info["exchanges"] == 0  # scan -> per-partition heaps -> driver merge


def test_triangle_wedges_never_shuffle(spark):
    """The wedge expansion and closure must both be broadcast joins --
    only the edge build and the per-vertex count aggregate may exchange."""
    from dask_patternsearch_spark.queries import relational as R2

    info = summarize(R2.QUERIES["triangle_copurchase"](spark, SF_DIR))
    assert info["broadcast_hash_joins"] >= 2
    assert info["sort_merge_joins"] == 0
    assert info["nested_loop_joins"] == 0
    assert info["python_stages"] == 0


def test_chunk_docs_is_shuffle_free(spark):
    from dask_patternsearch_spark.queries import pipeline as P

    info = summarize(P.QUERIES["chunk_docs"](spark, SF_DIR))
    assert info["exchanges"] == 0
    assert info["python_stages"] == 0


def test_twap_single_exchange_reused_by_aggregate(spark):
    """The lead() window and the per-user aggregate share one user_id
    shuffle -- Catalyst must not plan a second exchange."""
    from dask_patternsearch_spark.queries import relational as R2

    info = summarize(R2.QUERIES["time_weighted_value"](spark, SF_DIR))
    # summarize counts each exchange twice (tree line + detail section),
    # so one physical shuffle reads as 2
    assert info["exchanges"] <= 2
    assert info["python_stages"] == 0


def test_record_linkage_is_topk_no_nlj(spark):
    from dask_patternsearch_spark.queries import relational as R2

    df = R2.QUERIES["record_linkage_parts"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in plan_text(df)
    info = summarize(df)
    assert info["nested_loop_joins"] == 0  # blocking keeps it an equi-join


def test_sparse_cosine_no_nested_loop(spark):
    from dask_patternsearch_spark.queries import pipeline as P

    df = P.QUERIES["sparse_cosine_docs"](spark, SF_DIR)
    info = summarize(df)
    assert info["nested_loop_joins"] == 0
    assert info["python_stages"] == 0
    assert "TakeOrderedAndProject" in plan_text(df)


def test_scd2_pit_join_is_equi_not_nested_loop(spark):
    """The interval containment must run as the bucketed equi join --
    a nested-loop plan here is the O(n*m) trap range_join exists to avoid."""
    from dask_patternsearch_spark.queries import pipeline as P

    info = summarize(P.QUERIES["scd2_pointintime_join"](spark, SF_DIR))
    assert info["nested_loop_joins"] <= 2  # the 1-row closed-ts broadcast only
    assert info["sort_merge_joins"] + info["broadcast_hash_joins"] + \
        info["shuffled_hash_joins"] >= 2
    assert info["python_stages"] == 0


def test_star_wide_rollup_broadcasts_every_dim(spark):
    """The denormalization flatten: all five dimension joins broadcast,
    no nested loops, every scan pruned to what the rollup needs."""
    from dask_patternsearch_spark.queries import relational as R2

    info = summarize(R2.QUERIES["star_wide_rollup"](spark, SF_DIR))
    assert info["broadcast_hash_joins"] >= 8  # 4+ joins, double-counted
    assert info["nested_loop_joins"] == 0
    assert info["python_stages"] == 0
    li_schema = next(s for s in info["read_schemas"] if "l_extendedprice" in s)
    assert "l_comment" not in li_schema and "l_shipdate" not in li_schema


def test_inverted_postings_bounds_aggregation_buffer(spark):
    """The head-postings list must be rank-filtered (salted row_number
    windows) BEFORE any collect_list: no aggregation buffer may hold a
    term's full posting list (a stopword term at corpus scale is one
    unbounded buffer -> executor OOM on a hot key)."""
    from dask_patternsearch_spark.queries import pipeline as P

    df = P.QUERIES["inverted_postings"](spark, SF_DIR)
    text = plan_text(df)
    assert "row_number" in text  # the pre-agg rank filter exists
    # the window partitions on (term, salt) -- never on term alone at
    # document grain (that would re-create the hot-key funnel)
    assert "salt" in text
    info = summarize(df)
    assert info["python_stages"] == 0


def test_ccnet_buckets_have_no_per_lang_doc_sort(spark):
    """ntile positions are reconstructed from histogram boundaries; no
    window may partition by lang alone over document-grain rows (one
    language = one task sorting every document of that language)."""
    from dask_patternsearch_spark.queries import pipeline as P

    df = P.QUERIES["ccnet_perplexity_buckets"](spark, SF_DIR)
    text = plan_text(df)
    assert "ntile" not in text
    # the only doc-grain window is the tie group (lang, mean_neg_logp)
    assert "row_number" in text


def test_price_decile_histogram_prefix_sum_is_distributed(spark):
    """The cumulative count over the price histogram must be a
    range-partitioned prefix sum, not one global ordered window: the only
    single-partition window allowed in the plan is the per-partition
    OFFSET combine, whose input cardinality is the partition count (a
    'pid' grouping), never the value domain."""
    import re

    df = R.QUERIES["price_decile_bins"](spark, SF_DIR)
    text = plan_text(df)
    # the domain-sized running sum is partitioned by pid
    assert re.search(r"Window .*partitionBy.*pid|hashpartitioning\(pid", text), text
    # no Window node may sort the raw value domain without a partition
    # spec: every singlepartition exchange feeding a Window must sit on
    # the pid-subtotal side (its aggregate references pid, not prices)
    for m in re.finditer(r"Window \[[^\]]*\], \[l_extendedprice[^,\]]*\]\n", text):
        raise AssertionError(f"global value-domain window in plan: {m.group(0)}")


def test_jaccard_prefix_join_is_equi_join_jvm_side(spark):
    """The exact similarity join must never fall back to a nested-loop /
    cartesian plan: candidates come from gram equi-joins, verification
    from doc_id equi-joins, all JVM-side."""
    from dask_patternsearch_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    info = summarize(dedup.jaccard_prefix_pairs(docs, n=3, threshold=0.8))
    assert info["nested_loop_joins"] == 0
    assert info["python_stages"] == 0


def test_heaps_vocab_growth_plan_is_bucket_shaped(spark):
    """The Heaps curve must aggregate per-bucket then window over 10 rows:
    dims broadcast, no Python stages, and the only sort feeding a window
    runs over the 10-row bucket relation (never the corpus)."""
    from dask_patternsearch_spark.queries import pipeline as P

    df = P.QUERIES["heaps_vocab_growth"](spark, SF_DIR)
    info = summarize(df)
    assert info["python_stages"] == 0
    assert info["broadcast_hash_joins"] >= 2
    # the expensive column is scanned exactly once, in the localCheckpoint
    # materialization of the (bucket, word, count) reduction; the result
    # plan reads that checkpointed RDD for both derived series and never
    # touches the text column itself (every remaining scan is doc_id-only)
    text = plan_text(df)
    assert text.count("text:string") == 0, "text column leaked past the checkpoint"
    assert "Scan ExistingRDD" in text


def test_prefix_join_verify_parallelism_is_pinned(spark):
    """Round-7 starvation fixes, locked as plan shape.

    (a) The candidate sets of both exact-Jaccard prefix joins carry a
    REPARTITION_BY_NUM exchange: the verify stage is bytes-small but
    CPU-dense, and AQE's minPartitionSize coalescing would otherwise run
    it on a handful of cores (measured 21 s of CPU on 5 of 32 at the 10x
    probe).  (b) contamination_pairs_exact's tokenize+shingle pipeline
    must NOT appear below its repartition exchange -- explode's inferred
    size()>0 filter used to be pushed through it down to the scan,
    re-running the shingle expressions in the narrow pre-exchange stage.
    """
    from dask_patternsearch_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    for df in [
        dedup.jaccard_prefix_pairs(docs, n=3, threshold=0.8),
        dedup.contamination_pairs_exact(docs, bench, n=3, threshold=0.8),
    ]:
        txt = plan_text(df)
        assert "REPARTITION_BY_NUM" in txt, "verify repartition missing"
        # (b): the localCheckpoint barrier means no parquet scan (and so no
        # pushed-down shingle recompute) appears in these plans at all --
        # every input is the checkpointed RDD
        assert "Scan parquet" not in txt, (
            "shingle pipeline leaked below the checkpoint barrier"
        )


def test_band_skew_audit_partial_aggregates_no_python(spark):
    """The banding audit must be priceable at corpus scale: bucket sizing
    is a map-side-combinable hash aggregate (partial agg before the
    exchange), the whole report stays JVM-side, and the only sort is the
    hot-bucket ranking window (restricted to the hot filter), never a
    full bucket-list sort."""
    from dask_patternsearch_spark.operators import dedup
    from dask_patternsearch_spark.queries import pipeline as P

    df = P.QUERIES["band_skew_report"](spark, SF_DIR)
    info = summarize(df)
    assert info["python_stages"] == 0
    assert info["partial_aggregates"] >= 1


def test_ingest_batch_state_joins_stay_broadcast(spark, tmp_path):
    """The ingest loop's claim is 'the corpus never enters a shuffle':
    every join of a batch-derived set against the persisted state must
    be a broadcast hash join (scan + broadcast, no corpus exchange on
    the state side).  Checked on the keeper re-pick plan -- the leg that
    touches both persisted tables."""
    from pyspark.sql import functions as F2

    from dask_patternsearch_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    state = str(tmp_path / "plan_state")
    dedup.init_dedup_state(docs.filter(F2.col("doc_id") % 5 != 4), state)
    labels, keepers = dedup.load_cluster_state(spark, state)
    batch = docs.filter(F2.col("doc_id") % 5 == 4)
    edges = dedup.incremental_minhash_candidates(
        batch, state + "/signatures.parquet", append=False
    ).select("doc_a", "doc_b")
    remap = dedup._contracted_remap(edges, labels)
    repicked = dedup._repick_keepers(batch, remap, keepers, "n_chars")
    info = summarize(repicked)
    assert info["broadcast_hash_joins"] >= 2  # keeper carry + member remap
    assert info["sort_merge_joins"] == 0


def test_salted_join_skew_neutral_shape_under_aqe(spark):
    """The skew levers must stay skew-neutral under AQE.  (a) The session
    posture keeps AQE + its skew-join rescue enabled -- a config
    regression would silently remove the runtime split of a hot
    partition.  (b) salted_join's physical join keys must INCLUDE the
    salt even after optimization (with broadcast suppressed, so the test
    sees the shuffle shape a big-side/big-side production join takes):
    the hot key then hashes to n_salts partitions instead of one, and no
    optimizer rule may fold the salt away or reorder it out of the join
    condition.  (c) The salted spelling equals the plain join."""
    from dask_patternsearch_spark.operators import joins

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    # 90% of the fact rows share one key -- the shape salting exists for
    fact = spark.range(40_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = joins.salted_join(fact, dim, "k", n_salts=16, seed=3)
        txt = plan_text(out)
        info = summarize(out)
        assert info["nested_loop_joins"] == 0
        assert info["sort_merge_joins"] + info["shuffled_hash_joins"] >= 1
        # the join keys AND the shuffle partitioning carry BOTH the key
        # and the salt (formatted mode lists them per join side): the
        # salt survived optimization, so the hot key spreads over
        # n_salts reducers instead of one
        import re
        assert re.search(
            r"Left keys \[2\]: \[k#\d+L?, __dps_salt#\d+\]", txt), (
            f"salt missing from physical join keys: {txt[:2000]}")
        assert re.search(
            r"hashpartitioning\(k#\d+L?, __dps_salt#\d+", txt), (
            "salt missing from the shuffle partitioning")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    got = joins.salted_join(fact, dim, "k", n_salts=16, seed=3)
    assert got.count() == fact.join(dim, "k").count()


def test_cdc_span_dedup_plan_is_jvm_side_two_shuffles(spark):
    """The CDC rewriting claim: chunking is map-only JVM expressions (no
    Python stages anywhere), keep-first and reassembly are the only data
    shuffles, and the keep-first min aggregate combines map-side."""
    from dask_patternsearch_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    info = summarize(dedup.cdc_span_dedup(docs))
    assert info["python_stages"] == 0
    assert info["nested_loop_joins"] == 0
    assert info["partial_aggregates"] >= 1  # min(struct) combines map-side
    # keep-first groupBy + join-back + reassembly groupBy + the
    # ensure_parallelism repartition: a handful of exchanges, none of
    # them corpus x corpus (localCheckpoint pins the chunk relation, so
    # the join-back consumes the checkpoint, not a recompute)
    assert info["exchanges"] <= 6


def test_cdc_ingest_probe_broadcasts_batch_not_ledger(spark, tmp_path):
    """ingest_cdc_batch's ledger probe must broadcast the BATCH-derived
    sides (hash set out, hit set back): the corpus-sized ledger streams
    through semi/anti joins without a shuffle exchange on its side, and
    no sort-merge join may appear."""
    from pyspark.sql import functions as F2

    from dask_patternsearch_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    state = str(tmp_path / "cdc_plan_state")
    dedup.init_cdc_state(docs.filter(F2.col("doc_id") % 2 == 0), state)
    out = dedup.ingest_cdc_batch(docs.filter(F2.col("doc_id") % 2 == 1), state)
    info = summarize(out)
    assert info["sort_merge_joins"] == 0
    assert info["python_stages"] == 0
    assert info["broadcast_hash_joins"] >= 1  # novel-firsts semi probe


def test_mmr_shortlist_gets_window_group_limit(spark):
    """mmr_diversified_topk's shortlist rank filter must execute as
    WindowGroupLimit (per-partition top-k heaps), not a full per-query
    sort -- the one stage of the MMR plan that would silently become a
    data-scale sort under a refactor or Spark behavior change."""
    from dask_patternsearch_spark.queries.pipeline import QUERIES as P

    s = plan_text(P["mmr_diversified_topk"](spark, SF_DIR))
    assert s.count("WindowGroupLimit") >= 1


def test_minhash_ingest_annotation_joins_stay_broadcast(spark, tmp_path):
    """ingest_batch's candidate path must reduce the corpus-scale
    signature table through BROADCAST joins on batch-derived sets
    (bucket keys out, candidate ids back) BEFORE anything wide: the
    remaining sort-merge joins sit between batch-bounded relations only
    (AQE converts those at runtime).  A de-broadcast that shuffles the
    signature table is the 100 TB regression this locks out."""
    from pyspark.sql import functions as F2

    from dask_patternsearch_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", F2.length("text").alias("n_chars"))
    state = str(tmp_path / "mh_plan_state")
    dedup.init_dedup_state(docs.filter(F2.col("doc_id") % 2 == 0), state)
    # ingest_batch checkpoints its result, erasing the plan -- lock the
    # candidate path it runs (same code, append elided)
    out = dedup.incremental_minhash_candidates(
        docs.filter(F2.col("doc_id") % 2 == 1),
        dedup._delta_dirs(state)[0],
        append=False,
    )
    s = plan_text(out)
    info = summarize(out)
    # the three batch-set broadcasts: corpus bands ⋉ new bucket keys,
    # corpus sigs ⋉ batch ids (old/new split), sigs ⋉ candidate ids
    assert info["broadcast_hash_joins"] >= 3
    assert info["nested_loop_joins"] == 0
    # the persisted table is actually in this plan (guards the lock
    # itself against a refactor that swaps the input)
    assert "signatures.parquet" in s
    # tripwire: today's plan has exactly the batch-bounded SMJs (band
    # pair join + est-jaccard annotation); a de-broadcast of any
    # corpus-side reduction adds one more and must break this
    assert info["sort_merge_joins"] <= 4, info["sort_merge_joins"]


def test_ingest_write_mass_tracks_batch_not_corpus(spark, tmp_path):
    """The LSM scale contract as an asserted gate (not just a SCALE.md
    table): ingesting the SAME novel batch into a 1x state and a 4x
    state appends the same delta row mass to every log -- per-batch
    write volume is ∝ the batch and its touched clusters, never the
    corpus.  A regression that rewrites corpus-scale state per batch
    (the failure mode compaction exists to avoid) breaks this."""
    import numpy as np

    from dask_patternsearch_spark.operators import dedup

    rng = np.random.default_rng(77)
    words = [f"w{i}" for i in range(300)]

    def mk(ids):
        return spark.createDataFrame(
            [(i, " ".join(rng.choice(words, size=30))) for i in ids],
            "doc_id long, text string",
        ).withColumn("n_chars", F.length("text"))

    batch = mk(range(10_000, 10_040)).localCheckpoint(eager=True)
    appended = {}
    for tag, n_corpus in (("x1", 60), ("x4", 240)):
        state = str(tmp_path / f"mh_{tag}")
        dedup.init_dedup_state(mk(range(n_corpus)), state)
        _sig, lab, keep = dedup._delta_dirs(state)
        sizes0 = [spark.read.parquet(p).count() for p in (lab, keep)]
        dedup.ingest_batch(batch, state)
        sizes1 = [spark.read.parquet(p).count() for p in (lab, keep)]
        appended[tag] = [b - a for a, b in zip(sizes0, sizes1)]
        cstate = str(tmp_path / f"cdc_{tag}")
        led = dedup._cdc_ledger_path(cstate)
        dedup.init_cdc_state(mk(range(n_corpus)), cstate)
        n0 = spark.read.parquet(led).count()
        dedup.ingest_cdc_batch(batch, cstate)
        appended[tag].append(spark.read.parquet(led).count() - n0)
    for a1, a4 in zip(appended["x1"], appended["x4"]):
        assert a4 <= 2 * a1 + 8, (appended["x1"], appended["x4"])


def test_incremental_annotation_pushes_cand_ids_to_sig_scan(spark, tmp_path):
    """Round-12: the est-jaccard annotation's candidate ids reach the
    signature-table parquet scan as a pushed IN filter (row-group
    skipping on the doc_id-clustered layout) -- the per-batch signature
    read is ∝ candidates, not ∝ corpus."""
    import numpy as np

    from dask_patternsearch_spark.operators import dedup

    rng = np.random.default_rng(41)
    words = [f"w{i}" for i in range(60)]
    rows = [(i, " ".join(rng.choice(words, size=24))) for i in range(60)]
    # plant near-dups across the corpus/batch split so candidates exist
    rows += [(i + 1000, rows[i][1]) for i in range(0, 60, 7)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig_path = str(tmp_path / "sigs.parquet")
    dedup.minhash_lsh_candidates(
        docs.filter("doc_id < 1000"), persist_signatures=sig_path).collect()
    out = dedup.incremental_minhash_candidates(
        docs.filter("doc_id >= 1000"), sig_path, append=False)
    assert out.count() > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the pushed filter appears at scan level over the signature table
    assert "PushedFilters" in plan and "In(doc_id" in plan, plan[:2000]
