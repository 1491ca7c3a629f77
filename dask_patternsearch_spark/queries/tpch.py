"""Additional TPC-H-shaped patterns (SURVEY.md section 2.3), adapted to the
testdata schema (no partsupp table; lineitem carries no commit/receipt
dates or ship modes, so Q2/Q12/Q16 have no faithful adaptation, and the
Q9/Q20/Q21 variants below re-express the same *plan shapes* -- profit
rollup with a retail-price cost proxy, nested aggregate semi join, double
correlated EXISTS -- over the available columns).

Shared with ``relational.py``: every computed column aliased identically in
Spark and DuckDB, doubles rounded in both engines, unique tie-break keys on
every top-k (module docstring there for the full determinism contract).

Scale notes per query address the 100 TB case: which joins broadcast,
where the shuffles land, and why each plan survives a 1000-executor run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _t


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 pattern: NATION_1's share of PROMO-part revenue sold to
    EUROPE customers, by order year.

    Scale: the three dimension chains (part filtered on type; supplier ->
    nation for the numerator flag; customer -> nation -> region for the
    market scope) are all broadcast, so the only shuffles are the two fact
    joins lineitem<->orders and orders<->customer -- exactly the two the
    data sizes force.  The conditional-sum ratio avoids a second pass: one
    aggregation computes numerator and denominator together.
    """
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe_cust = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").between("1995-01-01", "1996-12-31"))
        .join(F.broadcast(europe_cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").cast("int").alias("o_year"))
    )
    promo_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(promo_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(rev),
                4,
            ).alias("mkt_share"),
            F.round(F.sum(rev), 2).alias("total_volume"),
        )
    )


_Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_1'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share,
       round(sum(l_extendedprice * (1 - l_discount)), 2)   AS total_volume
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = cn.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
  AND o_orderdate BETWEEN '1995-01-01' AND '1996-12-31'
GROUP BY 1
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 pattern: supplier(s) with the maximum quarterly revenue
    (uncorrelated scalar MAX subquery over a derived view).

    Scale: the revenue view is one scan + one hash aggregate keyed on
    l_suppkey (high cardinality, no skew).  The global max is a scalar
    aggregate of that small result, broadcast back as a cross join -- no
    single-partition window.  Revenue is rounded to 2 dp BEFORE the max
    comparison in both engines, so the equality join on a double cannot be
    split by summation-order ulp drift.
    """
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 pattern: revenue under three OR'd conjunctive
    brand/size/quantity branches.

    Scale: part is broadcast; the disjunction references both sides, so it
    evaluates as a post-join filter on the broadcast-joined rows -- still a
    single pass over lineitem with no shuffle.  The per-side envelopes ARE
    pushable: only three brands survive the part-side scan, and
    `l_quantity BETWEEN 1 AND 40` prunes the fact side.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & qty.between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#10")
            & F.col("p_size").between(10, 30)
            & qty.between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(20, 50)
            & qty.between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)                                          AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
   OR (p_brand = 'Brand#10' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 plan shape (nested aggregate subquery feeding a semi
    join), adapted: suppliers who shipped > 150 units of small-named parts
    during 1995, with their nation.

    Scale: the inner aggregate runs on the filtered fact (name prefix via a
    broadcast part semi join, date range pushed to the scan), grouped on
    l_suppkey; its HAVING output is tiny, so the outer supplier semi join
    broadcasts it.  Nation lookup broadcasts.  Zero large-table shuffles
    beyond the one keyed aggregation.
    """
    small_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    heavy = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
        )
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("shipped_qty"))
        .filter(F.col("shipped_qty") > 150)
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name", "shipped_qty")
    )


_Q20_SQL = """
SELECT s_suppkey, s_name, n_name, shipped_qty
FROM supplier
JOIN (
  SELECT l_suppkey, round(sum(l_quantity), 2) AS shipped_qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate <  TIMESTAMP '1996-01-01'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 150
) heavy ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
"""


def q21_blamed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 plan shape (correlated EXISTS + NOT EXISTS against the
    same fact), adapted: in finalized multi-supplier orders, the supplier
    whose items were the ONLY returns, ranked by how often they were
    blamed.

    Scale: the two correlated subqueries decorrelate into ONE per-order
    aggregate over lineitem (distinct supplier count, distinct
    returning-supplier count) -- a single extra shuffle keyed on the
    already-joined l_orderkey instead of two correlated re-scans.  Orders
    (1/3 selectivity on status) joins on the same key; the supplier name
    lookup broadcasts; top-10 is TakeOrderedAndProject.
    """
    li = _t(spark, sf_dir, "lineitem")
    # two count_distincts in one aggregate would force an Expand (2x the
    # input through the shuffle); dedup to (order, supplier) grain first,
    # then plain counts over the much smaller intermediate.  The R-line
    # count rides the same aggregate, so the blamed side is derived FROM
    # per_os (weight = n_r_lines) instead of re-scanning lineitem --
    # lineitem is read exactly once; per_os is checkpointed because both
    # the per-order rollup and the blamed filter consume it.
    per_os = li.groupBy(
        F.col("l_orderkey").alias("po_orderkey"), F.col("l_suppkey").alias("po_supp")
    ).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "n_r_lines"
        )
    ).localCheckpoint(eager=False)
    per_order = per_os.groupBy("po_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum((F.col("n_r_lines") > 0).cast("int")).alias("n_ret_supps"),
    )
    forders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    blamed = (
        per_os.filter(F.col("n_r_lines") > 0)
        .join(forders, F.col("po_orderkey") == F.col("o_orderkey"))
        .join(per_order, "po_orderkey")
        .filter((F.col("n_supps") > 1) & (F.col("n_ret_supps") == 1))
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.groupBy("po_supp")
        .agg(F.sum("n_r_lines").alias("numwait"))
        .join(F.broadcast(supplier), F.col("po_supp") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(10)
    )


_Q21_SQL = """
SELECT s_suppkey, s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 10
"""


def q22_dormant_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 plan shape (scalar AVG subquery + anti join), adapted:
    above-average-balance customers with no orders since 2000, by market
    segment.

    Scale: the balance threshold is a scalar aggregate broadcast as a
    cross join; the anti join keys on o_custkey with the date predicate
    pushed to the orders scan.  The threshold is compared UNROUNDED in
    both engines -- rounding it to the data's 2-dp grid could land exactly
    on a customer balance and flip rows between engines.
    """
    cust = _t(spark, sf_dir, "customer")
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent_orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            recent_orders,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


_Q22_SQL = """
SELECT c_mktsegment,
       count(*)                   AS n_cust,
       round(sum(c_acctbal), 2)   AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 pattern (product-type profit by nation and year), adapted:
    no partsupp table, so supply cost is proxied as 60% of the part's
    retail price.

    Scale: part (name-pattern filtered) and supplier->nation broadcast;
    lineitem<->orders is the only large shuffle.  The name LIKE '%...%'
    cannot push to parquet (no prefix), but column pruning + the broadcast
    semi-shape keep the fact scan narrow.
    """
    gear_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("gear"))
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("o_year")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    # mixed-sign profit sums hit catastrophic cancellation: the two engines'
    # different summation ORDERS drift the double sum across a cent boundary
    # (observed at sf0.01), so no final-rounding spelling can agree.  Fix:
    # round each ROW to integer cents (per-row doubles are bit-identical in
    # both engines -- same expression tree) and sum exact BIGINTs.
    profit_cents = F.floor(profit * 100.0 + F.lit(0.5)).cast("long")
    return (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(gear_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", "o_year")
        .agg((F.sum(profit_cents) / 100.0).alias("sum_profit"))
    )


_Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       sum(CAST(floor((l_extendedprice * (1 - l_discount)
                       - 0.6 * p_retailprice * l_quantity) * 100.0 + 0.5)
                AS BIGINT)) / 100.0 AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
"""


def bloom_join_building_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority for BUILDING-segment customers' orders,
    with the lineitem<->orders join routed through ``operators.joins.
    bloom_join``.

    Scale: the build side (one segment's orders, ~1/5 of orders) is too
    big to broadcast exactly at 100 TB but fits a Bloom bitset; the
    vectorized pre-filter drops ~4/5 of lineitem BEFORE the shuffle.
    Bloom filters have no false negatives, so the result is EXACTLY the
    plain join's -- which is what the DuckDB oracle checks.
    """
    from ..operators.joins import bloom_join

    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderpriority")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
    )
    return (
        bloom_join(li, orders, "o_orderkey", num_bits=1 << 21)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_BLOOM_JOIN_SQL = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)                                          AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 plan shape (correlated scalar MIN subquery re-joined to
    pick the argmin rows), adapted: no partsupp table, so the
    part-supplier "offer" relation is derived from lineitem with unit
    cost = min(l_extendedprice / l_quantity) per (part, supplier), scoped
    to EUROPE suppliers.

    Scale: the offers aggregate is one shuffle keyed on the high-cardinality
    (partkey, suppkey) pair; the per-part MIN re-aggregates the already
    per-pair-deduped (much smaller) offers, and the argmin join keys on
    partkey between two outputs of the SAME partitioning, so AQE keeps it
    local.  All dimension lookups (region-filtered supplier set, size/type-
    filtered part) broadcast.  Unit cost is rounded to 2 dp BEFORE the MIN
    so the equality re-join on a double cannot split on ulp drift (same
    device as Q15).  Top-20 with a fully unique sort key (acctbal desc,
    partkey, suppkey) is TakeOrderedAndProject -- no global sort.
    """
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(eur_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(supp.select(F.col("s_suppkey").alias("es_suppkey"))),
            F.col("l_suppkey") == F.col("es_suppkey"),
        )
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.round(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")), 2
            ).alias("supply_cost")
        )
    )
    min_cost = offers.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    parts = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20))
        .select("p_partkey", "p_brand")
    )
    return (
        offers.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "s_suppkey", "supply_cost",
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_suppkey"))
        .limit(20)
    )


_Q2_SQL = """
WITH offers AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         round(min(l_extendedprice / l_quantity), 2) AS supply_cost
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON n_nationkey = s_nationkey
                      JOIN region ON r_regionkey = n_regionkey
                      WHERE r_name = 'EUROPE')
  GROUP BY 1, 2
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, s_suppkey, supply_cost
FROM offers
JOIN part     ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
  AND supply_cost = (SELECT min(supply_cost) FROM offers o2
                     WHERE o2.ps_partkey = offers.ps_partkey)
ORDER BY s_acctbal DESC, p_partkey ASC, s_suppkey ASC
LIMIT 20
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 plan shape (grouped aggregate HAVING-filtered against a
    fraction of a global scalar aggregate over the SAME scope), adapted:
    part value = sum of lineitem extendedprice shipped by ASIA-region
    suppliers, kept when above 0.1% of that region's total.

    Scale: the region's supplier set broadcasts; one hash aggregate keyed
    on l_partkey; the global total is a scalar re-aggregate of the SMALL
    per-part result (never a second fact scan), broadcast back as a cross
    join.  The HAVING compares unrounded sums (threshold boundary, same
    device as Q22); the displayed value rounds after the cut.
    """
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum("l_extendedprice").alias("value_raw"))
    )
    total = per_part.agg(F.sum("value_raw").alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_raw") > 0.001 * F.col("total_value"))
        .select(
            "ps_partkey", F.round("value_raw", 2).alias("part_value")
        )
    )


_Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey AS ps_partkey, sum(l_extendedprice) AS value_raw
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON n_nationkey = s_nationkey
                      JOIN region ON r_regionkey = n_regionkey
                      WHERE r_name = 'ASIA')
  GROUP BY 1
)
SELECT ps_partkey, round(value_raw, 2) AS part_value
FROM per_part
WHERE value_raw > (SELECT sum(value_raw) * 0.001 FROM per_part)
"""


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 plan shape (fact-fact join + conditional priority
    counts), adapted: the testdata lineitem has no ship mode, so lines
    shipped in 1997 are grouped by return flag instead, counting
    critical-priority (1-URGENT / 2-HIGH) vs other orders.

    Scale: BOTH sides are facts, so this is the one genuinely two-sided
    shuffle join in the TPC-H set -- lineitem (year-filtered at the scan;
    min/max row-group pruning applies to the timestamp) against orders
    projected to (orderkey, priority).  The conditional counts fold
    map-side into partial aggregates; the final group-by key (returnflag)
    is 3-valued, so AQE coalesces the last exchange to a handful of tasks.
    """
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count_if(crit).alias("high_line_count"),
            F.count_if(~crit).alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT l_returnflag,
       count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH'))     AS high_line_count,
       count(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): left outer join
    preserving zero-order customers, two stacked aggregations.  The
    priority filter stands in for Q13's comment NOT LIKE -- it must sit on
    the orders side BEFORE the join so excluded-only customers still count
    at zero.

    Scale: orders project to (custkey) and pre-aggregate per custkey
    BEFORE joining customer (shrinks the join's right side to one row per
    active customer); the left join keys on c_custkey; the second group-by
    (on the tiny c_count domain) AQE-coalesces.  count(o_custkey) vs
    count(*) distinguishes null-extended rows -- the load-bearing NULL
    semantics of the outer join.
    """
    per_cust_orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    per_cust = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey")
        .join(per_cust_orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias("c_count")
        )
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion revenue share): conditional-sum ratio over one
    month of shipments.

    Scale: part broadcasts (projected to partkey + type flag only); the
    month predicate prunes lineitem row groups at the scan; numerator and
    denominator come out of ONE aggregation pass -- no second scan, no
    join back.
    """
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("is_promo"), rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


_Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue,
       round(sum(l_extendedprice * (1 - l_discount)), 2)   AS total_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 plan shape (supplier-count-per-part-class with a NOT IN
    exclusion subquery), adapted: the part-supplier relation derives from
    lineitem, and negative-balance suppliers stand in for the complaints
    NOT IN list.

    Scale: the part filter (brand/type exclusions + size IN-list)
    broadcasts; the complaint list is tiny and anti-joins broadcast; the
    only shuffle is the distinct-supplier count, keyed on (brand, type,
    size) with a partial distinct map-side.  Output cardinality is the
    part-class domain -- independent of fact scale.
    """
    complaints = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    parts = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(complaints),
            F.col("l_suppkey") == F.col("bad_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY 1, 2, 3
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q12_priority_lines": q12_priority_lines,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q16_part_supplier_counts": q16_part_supplier_counts,
    "q8_market_share": q8_market_share,
    "q15_top_supplier": q15_top_supplier,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q20_excess_shippers": q20_excess_shippers,
    "q21_blamed_supplier": q21_blamed_supplier,
    "q22_dormant_balances": q22_dormant_balances,
    "q9_product_profit": q9_product_profit,
    "bloom_join_building_revenue": bloom_join_building_revenue,
}

ORACLE = {
    "q2_min_cost_supplier": _Q2_SQL,
    "q11_important_stock": _Q11_SQL,
    "q12_priority_lines": _Q12_SQL,
    "q13_customer_distribution": _Q13_SQL,
    "q14_promo_revenue": _Q14_SQL,
    "q16_part_supplier_counts": _Q16_SQL,
    "q9_product_profit": _Q9_SQL,
    "bloom_join_building_revenue": _BLOOM_JOIN_SQL,
    "q8_market_share": _Q8_SQL,
    "q15_top_supplier": _Q15_SQL,
    "q19_disjunctive_revenue": _Q19_SQL,
    "q20_excess_shippers": _Q20_SQL,
    "q21_blamed_supplier": _Q21_SQL,
    "q22_dormant_balances": _Q22_SQL,
}
