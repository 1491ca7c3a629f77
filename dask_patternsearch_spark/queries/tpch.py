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
    # then plain counts over the much smaller intermediate
    per_os = li.groupBy(
        F.col("l_orderkey").alias("po_orderkey"), F.col("l_suppkey").alias("po_supp")
    ).agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r")
    )
    per_order = per_os.groupBy("po_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("has_r").alias("n_ret_supps"),
    )
    forders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    blamed = (
        li.filter(F.col("l_returnflag") == "R")
        .join(forders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supps") > 1) & (F.col("n_ret_supps") == 1))
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
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


QUERIES = {
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
    "q9_product_profit": _Q9_SQL,
    "bloom_join_building_revenue": _BLOOM_JOIN_SQL,
    "q8_market_share": _Q8_SQL,
    "q15_top_supplier": _Q15_SQL,
    "q19_disjunctive_revenue": _Q19_SQL,
    "q20_excess_shippers": _Q20_SQL,
    "q21_blamed_supplier": _Q21_SQL,
    "q22_dormant_balances": _Q22_SQL,
}
