"""Relational query suite (SURVEY.md section 2.3, Catalyst-native rows).

Every query here is a declarative DataFrame plan so Catalyst gets predicate
pushdown, column pruning, join selection and AQE for free (SURVEY.md
section 4.2).  Scale notes per query are in the docstrings: the testdata is
small, but each plan is shaped for the 100 TB case -- dimension joins are
explicitly broadcast, aggregations are partial-before-shuffle (automatic
for hash aggregates), top-k uses TakeOrderedAndProject rather than a global
sort, and window functions partition on high-cardinality keys.

Determinism/oracle-parity rules used throughout:
* every computed column is aliased identically in the DataFrame plan and
  the DuckDB oracle SQL;
* double aggregates are rounded (2 or 4 dp) in BOTH engines so
  summation-order ulp drift cannot flip the value hash;
* DuckDB integer sums are HUGEINT -> cast to BIGINT to match Spark's LongType;
  DuckDB year()/month() are BIGINT -> cast to INT;
* timestamps never appear raw in an output: they are converted to epoch
  milliseconds (unix_millis / epoch_ms), which are exact integers in both
  engines;
* top-k orderings always carry a unique tie-break key.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (resolves grouped-agg UDF type hints)
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _round_pos(col, n: int) -> "F.Column":
    """Deterministic cross-engine rounding for POSITIVE doubles:
    ``floor(x * 10^n + 0.5) / 10^n``.

    Spark's ``round`` goes through BigDecimal's shortest-string
    representation while DuckDB multiplies in binary, so the two flip in
    opposite directions on exact .5-boundary doubles (observed at sf0.1 on
    ~0.1%% of rows).  Spelling the same double arithmetic in both engines
    makes the value hash stable at every scale factor.
    """
    p = float(10**n)
    return F.floor(col * p + F.lit(0.5)) / F.lit(p)


def _epoch_ms(col) -> "F.Column":
    """Epoch milliseconds of a TIMESTAMP_NTZ column, timezone-independent
    (delegates to the shared ``util.epoch_ms`` spelling)."""
    from ..util import epoch_ms

    return epoch_ms(col)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table with a precomputed ``ts_ms`` epoch-millisecond column.

    The events parquet stores naive microsecond timestamps (read as
    TIMESTAMP_NTZ); ``util.epoch_ms`` measures NTZ-to-NTZ with
    ``timestamp_diff`` (timezone-independent) and truncates us -> ms
    exactly like DuckDB's ``epoch_ms``, so oracle comparisons stay
    bit-exact.
    """
    from ..util import epoch_ms

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.withColumn("ts_ms", epoch_ms("ts"))


# --------------------------------------------------------------------------
# scans + aggregation
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 style pricing summary (flagship).

    Scale: single scan with the shipdate predicate pushed to parquet,
    partial aggregation map-side, 4-group final agg -- no join, one shuffle
    of ~groups*partitions rows.  Survives any scale factor.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                           AS sum_qty,
       round(sum(l_extendedprice), 2)                                      AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                   AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)     AS sum_charge,
       round(avg(l_quantity), 4)                                           AS avg_qty,
       round(avg(l_extendedprice), 4)                                      AS avg_price,
       round(avg(l_discount), 4)                                           AS avg_disc,
       count(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 style: top-10 open orders by revenue for one segment.

    Scale: customer filter first (pushdown), broadcast the filtered
    customer keys into orders, shuffle join orders<->lineitem on orderkey
    (both huge -> sort-merge, AQE may pick better), then TakeOrdered top-10.
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "o_orderkey",
            _epoch_ms(F.col("o_orderdate")).alias("o_orderdate_ms"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
SELECT o_orderkey,
       epoch_ms(o_orderdate)                                    AS o_orderdate_ms,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2)        AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 style: revenue by nation within one region and year.

    Scale: region/nation/supplier/customer are dimensions -> broadcast;
    only orders<->lineitem shuffles.  The c_nationkey = s_nationkey
    condition rides the same broadcast.
    """
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    dim = (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(dim), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


_Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey
JOIN customer ON o_custkey   = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def agg_having_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key hash aggregation with HAVING (post-agg filter)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_spend"),
            F.round(F.min("o_totalprice"), 2).alias("min_spend"),
            F.round(F.max("o_totalprice"), 2).alias("max_spend"),
        )
        .filter(F.col("n_orders") > 10)
    )


_AGG_HAVING_SQL = """
SELECT o_orderpriority, o_orderstatus,
       count(*)                      AS n_orders,
       round(sum(o_totalprice), 2)   AS total_spend,
       round(avg(o_totalprice), 4)   AS avg_spend,
       round(min(o_totalprice), 2)   AS min_spend,
       round(max(o_totalprice), 2)   AS max_spend
FROM orders
GROUP BY o_orderpriority, o_orderstatus
HAVING count(*) > 10
"""


def topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by total spend: join + agg + distributed top-k.

    Scale: orders groupBy custkey (one shuffle), broadcast customer names
    onto the 20-row result side after the limit would be ideal; Spark plans
    orderBy+limit as TakeOrderedAndProject (no global sort).
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        spend.join(F.broadcast(cust.select("c_custkey", "c_name")), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_custkey"), F.col("c_name"), F.col("total_spend"), F.col("n_orders"))
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(20)
    )


_TOPK_SQL = """
SELECT c_custkey, c_name,
       round(sum(o_totalprice), 2) AS total_spend,
       count(*)                    AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------------

def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: each customer's 3 most expensive orders.

    Scale: partitions on o_custkey (high cardinality -> no skew); rank
    filter k=3 prunes early via WindowGroupLimit in recent Spark.
    """
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rank_in_cust",
        )
    )


_WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) AS totalprice,
       rank_in_cust
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER)
           AS rank_in_cust
  FROM orders
)
WHERE rank_in_cust <= 3
"""


def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: running total + lag delta per customer over time."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _epoch_ms(F.col("o_orderdate")).alias("o_orderdate_ms"),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w), 2
        ).alias("delta_vs_prev"),
    )


_WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       epoch_ms(o_orderdate) AS o_orderdate_ms,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate ASC, o_orderkey ASC
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_spend,
       round(o_totalprice - coalesce(lag(o_totalprice, 1) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC), 0.0), 2)
         AS delta_vs_prev
FROM orders
"""


# --------------------------------------------------------------------------
# set operations, semi/anti joins
# --------------------------------------------------------------------------

def window_range_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): each order's
    trailing-30-day customer spend.  Scale: same single shuffle on
    o_custkey as any window; the range frame is evaluated with a sliding
    pointer over the sorted partition, O(n) per partition."""
    orders = _t(spark, sf_dir, "orders")
    day_ms = 86400000
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("od_ms"))
        .rangeBetween(-30 * day_ms, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            _epoch_ms(F.col("o_orderdate")).alias("od_ms"),
            "o_totalprice",
        )
        .withColumn("spend_30d", F.round(F.sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "od_ms", "spend_30d")
    )


_WINDOW_RANGE_SQL = """
SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS od_ms,
       round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
             RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW), 2) AS spend_30d
FROM orders
"""


def grouped_map_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): per-user inter-event-time
    statistics computed with numpy/pandas on a whole KEY-HASH BUCKET of
    users at once.

    Completes the pandas-API family next to the scalar UDF (cosine),
    grouped-agg UDAF (geomean), mapInPandas (signatures) and
    applyInPandasWithState (incumbent).  Grouping on
    ``pmod(xxhash64(user_id), 256)`` instead of the raw key turns one
    Python invocation per user into one per bucket (same win as the
    bucketed cogroup as-of join: 3.6 s -> 1.8 s warm at sf0.1) while the
    per-user math stays a vectorized groupby inside the batch.  Scale:
    one shuffle on the bucket; per-task state is |events|/n_buckets.
    Gap sums are integer-valued floats well under 2^53, so the mean is
    exact in any summation order (oracle-stable).
    """
    import numpy as np

    ev = _events(spark, sf_dir)

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "ts_ms", "event_id"])
        uid = pdf["user_id"].to_numpy()
        ts = pdf["ts_ms"].to_numpy().astype(float)
        gap = np.empty(len(ts), dtype=float)
        gap[0] = np.nan
        gap[1:] = ts[1:] - ts[:-1]
        gap[np.flatnonzero(uid[1:] != uid[:-1]) + 1] = np.nan
        g = pd.DataFrame({"user_id": uid, "gap": gap}).groupby(
            "user_id", sort=False
        )["gap"]
        res = pd.DataFrame({
            "n_events": g.size(),
            "mean_raw": g.mean(),
            "max_raw": g.max(),
        }).reset_index()
        res["mean_gap_ms"] = (
            np.floor(res["mean_raw"] * 10 + 0.5) / 10
        ).astype(object).where(res["mean_raw"].notna(), None)
        res["max_gap_ms"] = res["max_raw"].astype(object).where(
            res["max_raw"].notna(), None
        )
        return res[["user_id", "n_events", "mean_gap_ms", "max_gap_ms"]]

    bucket = F.pmod(F.xxhash64("user_id"), F.lit(256))
    return ev.select("user_id", "event_id", "ts_ms").groupBy(
        bucket.alias("__bucket")
    ).applyInPandas(
        stats,
        "user_id long, n_events long, mean_gap_ms double, max_gap_ms long",
    )


_GROUPED_MAP_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap
  FROM events
)
SELECT user_id,
       count(*)                                        AS n_events,
       floor(avg(gap) * 10 + 0.5) / 10                 AS mean_gap_ms,
       max(gap)                                        AS max_gap_ms
FROM g
GROUP BY user_id
"""


def setops_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT: customers who bought in both 1996 and 1997 but
    not in 1998."""
    orders = _t(spark, sf_dir, "orders")

    def buyers(year: int) -> DataFrame:
        return orders.filter(F.year("o_orderdate") == year).select("o_custkey").distinct()

    return buyers(1996).intersect(buyers(1997)).subtract(buyers(1998))


_SETOPS_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
"""


def setops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL (multiset semantics: multiplicities are
    min / difference, not set membership).  Customer keys of finished
    orders intersected-all with keys of expensive orders, minus-all keys
    of low-priority orders; aggregated so the output is deterministic."""
    orders = _t(spark, sf_dir, "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    expensive = orders.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    low_pri = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    bag = finished.intersectAll(expensive).exceptAll(low_pri)
    return bag.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("multiplicity"))


_SETOPS_BAG_SQL = """
WITH bag AS (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE o_totalprice > 100000
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
SELECT o_custkey, count(*) AS multiplicity FROM bag GROUP BY o_custkey
"""


def anti_join_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti: customers with no orders at all (the reference's dedup
    probe primitive, op #4, generalized -- search.py:285-291)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def semi_join_active_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi: parts that appear in at least one large line item."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return part.join(li, part.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_name", "p_brand"
    )


_SEMI_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 45)
"""


# --------------------------------------------------------------------------
# grouping sets / rollup
# --------------------------------------------------------------------------

def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with subtotal + grand-total rows."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*)                  AS n_items
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with ``grouping_id``: distinguishes a genuine NULL group key
    from a subtotal/total row (the ambiguity plain rollup output has).
    Same aggregate as ``rollup_returns`` but each row carries which keys
    are aggregated away."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_ROLLUP_GID_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       count(*) AS n_items
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS window frame: 4-order trailing moving average of each
    customer's order totals (frame ``ROWS BETWEEN 3 PRECEDING AND CURRENT
    ROW`` -- the sliding-frame shape; running/RANGE/full-partition frames
    are covered by the other window queries).  One shuffle on o_custkey;
    the bounded frame evaluates incrementally during the partition sort."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _round_pos(F.avg("o_totalprice").over(w), 4).alias("trailing_avg_4"),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


_WINDOW_MOVING_AVG_SQL = """
SELECT o_custkey, o_orderkey,
       floor(avg(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) * 10000.0 + 0.5)
         / 10000.0 AS trailing_avg_4,
       count(*) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS n_in_frame
FROM orders
"""


def scalar_pandas_udf_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (Series -> Series) pandas UDF -- the remaining UDF flavor in
    the engine's surface (grouped-map, grouped-agg, mapInPandas, UDTF and
    stateful are covered elsewhere).  The UDF computes sqrt-scaled prices
    with numpy; sqrt is IEEE-exact in numpy and DuckDB alike, so the
    oracle matches bit-for-bit after shared-formula rounding.

    Scale: Arrow-vectorized, one batch per ~10k rows, no shuffle.  A
    built-in ``F.sqrt`` would beat it (stays in codegen) -- the query
    exists to pin the UDF machinery, and says so.
    """
    import numpy as np
    import pandas as pd

    @F.pandas_udf("double")
    def sqrt_scaled(s: pd.Series) -> pd.Series:
        v = np.sqrt(s.to_numpy(dtype=np.float64)) * 10.0
        return pd.Series(np.floor(v * 10000.0 + 0.5) / 10000.0)

    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", sqrt_scaled(F.col("o_totalprice")).alias("sqrt_price")
    )


_SCALAR_UDF_SQL = """
SELECT o_orderkey,
       floor(sqrt(o_totalprice) * 10.0 * 10000.0 + 0.5) / 10000.0 AS sqrt_price
FROM orders
"""


# --------------------------------------------------------------------------
# scalar function coverage
# --------------------------------------------------------------------------

def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar functions in one projection (whole-stage
    codegen, no UDF)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.concat(F.col("l_returnflag"), F.lit("/"), F.col("l_linestatus")).alias("flag_status"),
        F.lower("l_returnflag").alias("flag_lower"),
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        F.dayofmonth("l_shipdate").alias("ship_day"),
        _round_pos(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
        ).alias("charge"),
        F.round(F.sqrt(F.col("l_quantity")), 4).alias("qty_sqrt"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.when(F.col("l_discount") > 0.05, F.lit("HI")).otherwise(F.lit("LO")).alias("disc_band"),
        F.substring(F.col("l_returnflag"), 1, 1).alias("flag_head"),
        F.length(F.concat(F.col("l_returnflag"), F.col("l_linestatus"))).alias("fs_len"),
    )


_SCALAR_SQL = """
SELECT l_orderkey, l_linenumber,
       l_returnflag || '/' || l_linestatus                                   AS flag_status,
       lower(l_returnflag)                                                   AS flag_lower,
       CAST(year(l_shipdate) AS INTEGER)                                     AS ship_year,
       CAST(month(l_shipdate) AS INTEGER)                                    AS ship_month,
       CAST(day(l_shipdate) AS INTEGER)                                      AS ship_day,
       floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100.0 + 0.5) / 100.0 AS charge,
       round(sqrt(l_quantity), 4)                                            AS qty_sqrt,
       round(abs(l_discount - 0.05), 4)                                      AS disc_dev,
       CASE WHEN l_discount > 0.05 THEN 'HI' ELSE 'LO' END                   AS disc_band,
       substring(l_returnflag, 1, 1)                                         AS flag_head,
       CAST(length(l_returnflag || l_linestatus) AS INTEGER)                 AS fs_len
FROM lineitem
WHERE l_orderkey <= 200
"""


# --------------------------------------------------------------------------
# events: time windows, sessionization, distinct counts
# --------------------------------------------------------------------------

def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch form of the streaming window op)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            (F.expr("ts_ms DIV 3600000") * 3600000).alias("hour_ms"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            _round_pos(F.avg("value"), 4).alias("avg_value"),
        )
    )


_EVENTS_HOURLY_SQL = """
SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms,
       event_type,
       count(*)              AS n_events,
       round(sum(value), 2)  AS sum_value,
       floor(avg(value) * 10000.0 + 0.5) / 10000.0 AS avg_value
FROM events
GROUP BY 1, 2
"""


def events_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-window aggregation (2-hour windows, 1-hour slide) via the
    native ``F.window`` operator -- each event lands in exactly two
    overlapping windows.

    Scale: Spark expands the slide into an Expand node (one row per
    covering window) before the hash aggregate, so cost is
    windows-per-event x input -- same shuffle profile as the tumbling
    case.  The oracle spells the identical semantics as explicit
    hour-bucket math (unnest of the two covering window starts).
    """
    ev = _events(spark, sf_dir).withColumn(
        "event_time", F.col("ts").cast("timestamp")
    )
    return (
        ev.groupBy(
            F.window("event_time", "2 hours", "1 hour").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_EVENTS_SLIDING_SQL = """
WITH e AS (
  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS h, event_type, value
  FROM events
), x AS (
  SELECT unnest([h, h - 3600000]) AS window_start_ms, event_type, value
  FROM e
)
SELECT window_start_ms, event_type,
       count(*)             AS n_events,
       round(sum(value), 2) AS sum_value
FROM x
GROUP BY 1, 2
"""


def cross_join_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (tiny dims only -- the one place a
    nested-loop product is the right plan): every (nation, region) pair
    flagged with whether it is the nation's home region."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return nation.crossJoin(region).select(
        "n_name",
        "r_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_home"),
    )


_CROSS_JOIN_SQL = """
SELECT n_name, r_name, (n_regionkey = r_regionkey) AS is_home
FROM nation CROSS JOIN region
"""


def heavy_hitter_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters (``df.stat.freqItems``, the Karp-
    Papadimitriou-Shenker one-pass sketch): order priorities appearing in
    > 15% of orders.

    Sketch contract: NO false negatives (every true heavy hitter is in
    the candidate set), possible false positives.  The query runs the
    standard TWO-PASS form: the sketch prunes to a tiny candidate set,
    then an exact count over the candidates alone removes the false
    positives -- so the output is the EXACT set of >15% priorities with
    exact counts, and the query is ORACLE-checked (a plain
    GROUP BY/HAVING in DuckDB).  Scale: pass 1 is single-pass mergeable
    per-partition state with no data shuffle; pass 2 aggregates only
    rows semi-joined to the few candidates.
    """
    orders = _t(spark, sf_dir, "orders")
    cands = (
        orders.stat.freqItems(["o_orderpriority"], support=0.15)
        .select(F.explode("o_orderpriority_freqItems").alias("candidate"))
    )
    total = orders.count()
    return (
        orders.join(
            F.broadcast(cands),
            orders["o_orderpriority"] == cands["candidate"],
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("candidate"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 0.15 * total)
        .orderBy("candidate")
    )


_HEAVY_HITTER_SQL = """
SELECT o_orderpriority AS candidate,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1
HAVING count(*) > 0.15 * (SELECT count(*) FROM orders)
"""


def levenshtein_adjacent_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance between each document and the next (by doc_id) within
    a language: classic string-similarity scalar over a window pair.
    ``F.levenshtein`` is the exact DP both engines implement, so the
    oracle matches bit-for-bit; the 40-char prefix caps the O(m*n) cost
    per pair (at 100 TB you never levenshtein whole documents -- prefix
    or fingerprint first).  The lang-partitioned window is inherently
    few-partition (the adjacency semantics need a total order per
    language); the at-scale spelling range-partitions on (lang, doc_id)
    and stitches the per-range boundary pairs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("lang").orderBy("doc_id")
    prefix = F.substring("text", 1, 40)
    paired = docs.select(
        "lang",
        "doc_id",
        prefix.alias("p"),
        F.lead("doc_id").over(w).alias("next_doc_id"),
        F.lead(prefix).over(w).alias("next_p"),
    ).filter(F.col("next_doc_id").isNotNull())
    return paired.select(
        "lang",
        "doc_id",
        "next_doc_id",
        F.levenshtein("p", "next_p").alias("edit_distance"),
    )


_LEVENSHTEIN_SQL = """
WITH paired AS (
  SELECT lang, doc_id,
         substring(text, 1, 40) AS p,
         lead(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS next_doc_id,
         lead(substring(text, 1, 40)) OVER (PARTITION BY lang ORDER BY doc_id) AS next_p
  FROM documents
)
SELECT lang, doc_id, next_doc_id,
       CAST(levenshtein(p, next_p) AS INT) AS edit_distance
FROM paired
WHERE next_doc_id IS NOT NULL
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum.

    Scale: two windows over the same (user_id, ts) partitioning -- one
    shuffle, both windows reuse it.  This is the batch equivalent of
    Structured Streaming's session_window.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_ms"), F.asc("event_id"))
    gap_ms = 30 * 60 * 1000
    marked = ev.select(
        "user_id",
        "event_id",
        "value",
        "ts_ms",
        F.when(F.col("ts_ms") - F.lag("ts_ms", 1).over(w) > gap_ms, 1)
        .otherwise(0)
        .alias("is_new"),
    )
    sess = marked.withColumn(
        "session_seq",
        F.sum("is_new").over(
            Window.partitionBy("user_id").orderBy(F.asc("ts_ms"), F.asc("event_id"))
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


_SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, event_id, value,
         epoch_ms(ts) AS ts_ms,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (
                PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC) > 1800000
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
                                   ORDER BY ts_ms ASC, event_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM marked
)
SELECT user_id, session_seq,
       count(*)               AS n_events,
       min(ts_ms)             AS session_start_ms,
       max(ts_ms)             AS session_end_ms,
       round(sum(value), 2)   AS session_value
FROM sess
GROUP BY user_id, session_seq
"""


def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (expands to two-phase agg in Spark)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


_DISTINCT_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       count(*)                                AS n_events
FROM events
GROUP BY event_type
"""


def part_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + conditional aggregation: share of promo revenue per brand
    (TPC-H Q14 pattern: sum(CASE WHEN ...)/sum(...))."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part.select("p_partkey", "p_brand", "p_type")),
                     F.col("l_partkey") == F.col("p_partkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("p_brand").agg(
        F.round(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0)))
            / F.sum(rev) * 100.0,
            4,
        ).alias("promo_share_pct"),
        F.round(F.sum(rev), 2).alias("brand_revenue"),
    )


_PART_TYPE_SQL = """
SELECT p_brand,
       round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 2)   AS brand_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 pattern: single-scan agg where every predicate pushes to
    the parquet reader (date range, discount band, quantity cap)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*)                                    AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 pattern (correlated scalar subquery, decorrelated into an
    aggregate + join): revenue from line items below 50%% of their part's
    average quantity."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("ak"))
        .agg((F.avg("l_quantity") * 0.5).alias("half_avg_qty"))
    )
    brand_parts = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    return (
        li.join(F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*)                             AS n_lines
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#1'
  AND l_quantity < (
      SELECT 0.5 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


def cube_returns_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, ship year): all four grouping combinations."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", F.year("l_shipdate").alias("ship_year"), "l_extendedprice")
        .cube("l_returnflag", "ship_year")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_CUBE_SQL = """
SELECT l_returnflag, year(l_shipdate) AS ship_year,
       round(sum(l_extendedprice), 2) AS sum_price,
       count(*)                       AS n_items
FROM lineitem
GROUP BY CUBE(l_returnflag, year(l_shipdate))
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: revenue by nation and, separately, by market
    segment, in one pass (neither rollup nor cube expresses this pair)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    joined = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_mktsegment", "o_totalprice")
    )
    return joined.groupingSets(
        [["n_name"], ["c_mktsegment"]], "n_name", "c_mktsegment"
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))


_GROUPING_SETS_SQL = """
SELECT n_name, c_mktsegment, round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
"""


def full_outer_nation_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer vs supplier account totals
    (nations may have only one side)."""
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_balance"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp_balance"))
    )
    return cust.join(supp, "nationkey", "full_outer")


_FULL_OUTER_SQL = """
SELECT coalesce(c.nationkey, s.nationkey) AS nationkey, cust_balance, supp_balance
FROM (SELECT c_nationkey AS nationkey, round(sum(c_acctbal), 2) AS cust_balance
      FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nationkey, round(sum(s_acctbal), 2) AS supp_balance
      FROM supplier GROUP BY s_nationkey) s
USING (nationkey)
"""


def percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90) per market segment."""
    cust = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("median_balance"),
        F.round(F.percentile("c_acctbal", F.lit(0.9)), 4).alias("p90_balance"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_balance"),
    )


_PERCENTILES_SQL = """
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.5), 4) AS median_balance,
       round(quantile_cont(c_acctbal, 0.9), 4) AS p90_balance,
       round(avg(c_acctbal), 4)                AS avg_balance
FROM customer
GROUP BY c_mktsegment
"""


def json_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props column + aggregation on the
    extracted value (get_json_object stays JVM-side)."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_high"),
        )
    )


_JSON_SQL = """
SELECT event_type,
       round(avg(k), 4) AS avg_k,
       max(k)           AS max_k,
       count(CASE WHEN k > 50 THEN 1 END) AS n_high
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
GROUP BY event_type
"""


def shipping_lag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic across a join: order-to-ship lag distribution per
    order priority (datediff / min / max / avg)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg(lag), 4).alias("avg_lag_days"),
            F.min(lag).alias("min_lag_days"),
            F.max(lag).alias("max_lag_days"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_SHIPPING_LAG_SQL = """
SELECT o_orderpriority,
       round(avg(lag), 4)     AS avg_lag_days,
       CAST(min(lag) AS INT)  AS min_lag_days,
       CAST(max(lag) AS INT)  AS max_lag_days,
       count(*)               AS n_lines
FROM (SELECT o_orderpriority,
             date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch ops (approx_count_distinct) next to the exact
    count -- rows-only check (sketch estimates are implementation-defined),
    asserted within 5% of exact in tests."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


def pivot_flag_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: shipped quantity per year with one column per return flag
    (explicit value list keeps the schema deterministic and skips the
    extra distinct-values job)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(F.year("l_shipdate").alias("ship_year"), "l_returnflag", "l_quantity")
        .groupBy("ship_year")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


_PIVOT_SQL = """
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A,
       round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R
FROM lineitem
GROUP BY 1
"""


def udaf_geomean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF surface: geometric mean of order totals per priority as
    an Arrow-batched grouped-agg pandas UDF (one numpy reduction per
    group partition; partial aggregation does not apply to grouped-agg
    UDFs, so at scale prefer the algebraic exp(avg(ln)) form -- the UDAF
    here demonstrates the extension point)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        # floor-based rounding: see _round_pos (cross-engine exactness)
        return float(np.floor(np.exp(np.log(v.to_numpy()).mean()) * 1e4 + 0.5) / 1e4)

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # grouped-agg pandas UDFs cannot mix with native aggregates in one
        # agg(), so the row count is a (trivial) UDAF too
        return len(v)

    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        geomean("o_totalprice").alias("geomean_price"),
        n_rows("o_totalprice").alias("n_orders"),
    )


_GEOMEAN_SQL = """
SELECT o_orderpriority,
       floor(exp(avg(ln(o_totalprice))) * 10000.0 + 0.5) / 10000.0 AS geomean_price,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""



# --------------------------------------------------------------------------
# temporal / non-equi joins, subquery patterns, unpivot, array + conditional
# aggregates
# --------------------------------------------------------------------------

def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators.joins.asof_join): each purchase event matched
    to the same user's most recent click at-or-before it, with the gap.

    The merge formulation costs one shuffle on user_id + a per-partition
    sort -- no pair explosion -- so it scales to arbitrarily long histories
    (vs the O(n*m)-per-key inequality-join spelling).  Oracle uses DuckDB's
    native ASOF LEFT JOIN.
    """
    from ..operators.joins import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_ms"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts_ms").alias("click_ts_ms"),
    )
    return asof_join(
        purchases, clicks, on="user_id", left_ts="ts_ms", right_ts="click_ts_ms"
    ).withColumn("gap_ms", F.col("ts_ms") - F.col("click_ts_ms"))


def asof_join_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``direction='nearest'`` as-of join (pandas merge_asof parity):
    each purchase matched to the user's CLOSEST click in either
    direction, ties to the preceding click.  Still the merge
    formulation -- one user_id shuffle carrying both directional window
    passes; the oracle ranks the per-user candidate pairs by
    (|gap|, after-flag, ts) which encodes the same tie rule.
    """
    from ..operators.joins import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_ms"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts_ms").alias("click_ts_ms"),
    )
    return asof_join(
        purchases, clicks, on="user_id", left_ts="ts_ms",
        right_ts="click_ts_ms", direction="nearest",
    ).withColumn("abs_gap_ms", F.abs(F.col("ts_ms") - F.col("click_ts_ms")))


_ASOF_NEAREST_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events
),
p AS (SELECT user_id, event_id, ts_ms FROM ev WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id AS click_event_id, ts_ms AS click_ts_ms
      FROM ev WHERE event_type = 'click'),
ranked AS (
  SELECT p.user_id, p.event_id, p.ts_ms,
         c.click_event_id, c.click_ts_ms,
         row_number() OVER (
           PARTITION BY p.user_id, p.event_id
           ORDER BY abs(c.click_ts_ms - p.ts_ms),
                    CASE WHEN c.click_ts_ms > p.ts_ms THEN 1 ELSE 0 END,
                    c.click_ts_ms
         ) AS rn
  FROM p JOIN c ON c.user_id = p.user_id
)
SELECT p.user_id, p.event_id, p.ts_ms,
       r.click_event_id, r.click_ts_ms,
       CAST(abs(p.ts_ms - r.click_ts_ms) AS BIGINT) AS abs_gap_ms
FROM p LEFT JOIN ranked r
  ON r.user_id = p.user_id AND r.event_id = p.event_id AND r.rn = 1
"""


_ASOF_SQL = """
WITH p AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id AS click_event_id, epoch_ms(ts) AS click_ts_ms
           FROM events WHERE event_type = 'click')
SELECT p.user_id, p.event_id, p.ts_ms, c.click_event_id, c.click_ts_ms,
       p.ts_ms - c.click_ts_ms AS gap_ms
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts_ms >= c.click_ts_ms
"""


def asof_join_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same purchase<-click as-of join through the cogrouped-pandas
    surface (``operators.joins.cogroup_asof_join``): checked against the
    identical DuckDB ASOF oracle as the merge formulation, so the two
    implementations cross-validate."""
    from ..operators.joins import cogroup_asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_ms"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts_ms").alias("click_ts_ms"),
    )
    return cogroup_asof_join(
        purchases, clicks, on="user_id", left_ts="ts_ms", right_ts="click_ts_ms"
    ).withColumn("gap_ms", F.col("ts_ms") - F.col("click_ts_ms"))


def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment via operators.joins.range_join: orders bucketed
    into OVERLAPPING price bands (width 100k, stride 50k -- overlapping, so
    no floor() trick can express it), aggregated per band.

    The operator turns the non-equi containment predicate into a bucketed
    equi join; with a large interval side this shuffles/sort-merges like any
    equi join instead of degenerating to broadcast-nested-loop."""
    from ..operators.joins import range_join

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # spark.range, not createDataFrame: a Python-built local relation costs a
    # driver->JVM round trip + an extra job under AQE (~0.4s/run measured);
    # the JVM-side Range node is free
    bands = spark.range(10).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 50000.0).alias("lo"),
        (F.col("id") * 50000.0 + 100000.0).alias("hi"),
    )
    return (
        range_join(orders, bands, "o_totalprice", "lo", "hi", bucket_width=50000.0)
        .groupBy("band_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


_RANGE_JOIN_SQL = """
SELECT band_id, lo, hi, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
FROM orders
JOIN (SELECT i AS band_id, i * 50000.0 AS lo, i * 50000.0 + 100000.0 AS hi
      FROM range(10) t(i)) bands
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band_id, lo, hi
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 pattern (EXISTS correlated subquery -> LEFT SEMI join):
    orders from 1996Q3 having at least one line item shipped more than 90
    days after the order date, counted per priority.

    The semi join shuffles both sides on the order key and short-circuits
    per probe row (no fan-out, no dedup), which is exactly how EXISTS
    should execute at scale."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 pattern (IN subquery with grouped HAVING, decorrelated):
    customers whose single order carries > 300 total quantity.

    The HAVING aggregate runs map-side-partial before its shuffle; the
    qualifying-orders set is tiny, so its join back to orders broadcasts
    under AQE; the customer dim join is explicitly broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            _epoch_ms(F.col("o_orderdate")).alias("od_ms"),
            "o_totalprice",
            "total_qty",
        )
    )


_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, epoch_ms(o_orderdate) AS od_ms,
       o_totalprice, t.total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) t
  ON o_orderkey = t.l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


def unpivot_nation_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long): per-nation customer vs supplier account
    totals as (nation, side, balance) rows.  Spark's unpivot is a
    zero-shuffle Expand node; the oracle spells it as ANSI UNION ALL."""
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("n_nationkey"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("customer_balance"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("n_nationkey"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supplier_balance"))
    )
    wide = (
        nation.join(cust, "n_nationkey", "left")
        .join(supp, "n_nationkey", "left")
        .select(
            "n_name",
            F.coalesce("customer_balance", F.lit(0.0)).alias("customer_balance"),
            F.coalesce("supplier_balance", F.lit(0.0)).alias("supplier_balance"),
        )
    )
    return wide.unpivot(
        "n_name", ["customer_balance", "supplier_balance"], "side", "balance"
    )


_UNPIVOT_SQL = """
WITH cb AS (SELECT c_nationkey AS k, round(sum(c_acctbal), 2) AS b
            FROM customer GROUP BY 1),
     sb AS (SELECT s_nationkey AS k, round(sum(s_acctbal), 2) AS b
            FROM supplier GROUP BY 1)
SELECT n_name, 'customer_balance' AS side, coalesce(cb.b, 0.0) AS balance
FROM nation LEFT JOIN cb ON n_nationkey = cb.k
UNION ALL
SELECT n_name, 'supplier_balance' AS side, coalesce(sb.b, 0.0) AS balance
FROM nation LEFT JOIN sb ON n_nationkey = sb.k
"""


def array_agg_order_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + array scalar functions: per-order sorted
    quantity list, reduced back to scalars (size, distinct count, min/max
    by position, ascending-order sum).  collect_list is a single partial
    aggregation; the array functions are per-row, shuffle-free."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.sort_array(F.collect_list("l_quantity"))
    return (
        li.groupBy("l_orderkey")
        .agg(q.alias("q"))
        .select(
            "l_orderkey",
            F.size("q").alias("n_items"),
            F.size(F.array_distinct("q")).alias("n_distinct"),
            F.element_at("q", 1).alias("min_qty"),
            F.element_at("q", -1).alias("max_qty"),
            F.aggregate("q", F.lit(0.0), lambda acc, x: acc + x).alias("sum_qty"),
        )
    )


_ARRAY_AGG_SQL = """
SELECT l_orderkey,
       len(q)::INT                 AS n_items,
       len(list_distinct(q))::INT  AS n_distinct,
       q[1]                        AS min_qty,
       q[-1]                       AS max_qty,
       list_aggregate(q, 'sum')    AS sum_qty
FROM (SELECT l_orderkey, list_sort(list(l_quantity)) AS q
      FROM lineitem GROUP BY l_orderkey)
"""


def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / boolean / median aggregates per order status:
    count_if, bool_and, bool_or, exact median (floor-rounded so the
    even-count midpoint cannot straddle a .5 rounding boundary)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 300000.0).cast("long").alias("n_big"),
        (F.floor(F.median("o_totalprice") * 100 + F.lit(0.5)) / 100)
        .cast("double")
        .alias("median_price"),
        F.bool_and(F.col("o_totalprice") > 900.0).alias("all_above_900"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
    )


_CONDITIONAL_AGG_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)                    AS n_orders,
       CAST(count_if(o_totalprice > 300000.0) AS BIGINT) AS n_big,
       CAST(floor(median(o_totalprice) * 100 + 0.5)/100 AS DOUBLE) AS median_price,
       bool_and(o_totalprice > 900.0)              AS all_above_900,
       bool_or(o_orderpriority = '1-URGENT')       AS any_urgent
FROM orders
GROUP BY o_orderstatus
"""



def interval_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with a LARGE interval side: every (purchase, click)
    pair where the click is within the 10 minutes strictly before the
    purchase, same user.  Exercises operators.joins.range_join where the
    intervals table is event-scale (unlike the tiny price-band dim), i.e.
    the case where the bucketed equi-join formulation is mandatory at
    100 TB -- a theta join here would be quadratic per user.  The streaming
    twin is streaming/events.py::purchase_click_join_stream."""
    from ..operators.joins import range_join

    ev = _events(spark, sf_dir)
    lookback = 600000  # 10 minutes in ms
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts_ms").alias("c_ms")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts_ms") - lookback).alias("lo"),
        F.col("ts_ms").alias("hi"),
    )
    return range_join(
        clicks, purchases, "c_ms", "lo", "hi",
        bucket_width=float(lookback), extra_on=["user_id"],
    ).select(
        "user_id", "purchase_id", "click_id",
        (F.col("hi") - F.col("c_ms")).alias("gap_ms"),
    )


_INTERVAL_JOIN_SQL = """
WITH c AS (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS c_ms
           FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS p_ms
           FROM events WHERE event_type = 'purchase')
SELECT p.user_id, p.purchase_id, c.click_id, p.p_ms - c.c_ms AS gap_ms
FROM p JOIN c
  ON p.user_id = c.user_id
 AND c.c_ms >= p.p_ms - 600000
 AND c.c_ms < p.p_ms
"""



def map_hourly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type functions end to end: per-user hour-of-day -> count map
    built with map_from_entries, then reduced with size / map_values /
    map_filter / map_keys (peak hour with a deterministic min-key
    tie-break).  All JVM-side; the oracle computes the same scalars with
    plain SQL (the map is an execution detail, not a semantic)."""
    ev = _events(spark, sf_dir)
    hours = (
        ev.select("user_id", (F.expr("ts_ms DIV 3600000") % 24).cast("int").alias("hr"))
        .groupBy("user_id", "hr")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = hours.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("hr", "cnt"))).alias("h")
    )
    peak = F.array_max(F.map_values("h"))
    return m.select(
        "user_id",
        F.size("h").alias("n_hours"),
        F.aggregate(F.map_values("h"), F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "total_events"
        ),
        peak.alias("max_in_hour"),
        F.array_min(
            F.map_keys(F.map_filter("h", lambda k, v: v == peak))
        ).alias("peak_hour"),
    )


_MAP_HOURLY_SQL = """
WITH h AS (SELECT user_id, CAST((epoch_ms(ts) // 3600000) % 24 AS INT) AS hr,
                  count(*) AS cnt
           FROM events GROUP BY 1, 2),
     hm AS (SELECT *, max(cnt) OVER (PARTITION BY user_id) AS mx FROM h)
SELECT user_id,
       count(*)::INT    AS n_hours,
       sum(cnt)::BIGINT AS total_events,
       max(cnt)         AS max_in_hour,
       min(hr) FILTER (WHERE cnt = mx) AS peak_hour
FROM hm
GROUP BY user_id
"""


def approx_percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (KLL/GK approx_percentile) per order
    status.  Rows-only check (the sketch is engine-specific); a dedicated
    test bounds the error against the exact percentiles -- at 100 TB the
    sketch is mergeable map-side and needs O(1/accuracy) memory where exact
    percentiles would need a full sort.

    An exact oracle is infeasible BY DESIGN, not just inconvenient:
    measured at sf0.01, the returned element for one group flips between
    two neighboring ranks as the partition count changes (1/97 partitions
    vs 4/32) -- the GK summaries' merge order changes g/delta spreads, so
    any DuckDB replay would pin one partition layout and falsely fail on
    another.  The mergeable-sketch queries that ARE oracle-checked
    (kmv_distinct_users, hll_manual_users) use order-independent sketch
    states instead."""
    orders = _t(spark, sf_dir, "orders")
    pcts = F.approx_percentile(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
    )
    return orders.groupBy("o_orderstatus").agg(
        pcts[0].alias("p50"), pcts[1].alias("p90"), pcts[2].alias("p99"),
        F.count(F.lit(1)).alias("n_orders"),
    )



def regexp_word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar functions over document text: per-doc counts of
    vowel-initial words and long words via regexp_extract_all (JVM-side;
    both engines use RE2-compatible patterns so results match exactly)."""
    docs = _t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(r"\b[aeiou][a-z]*"), F.lit(0))).alias(
            "n_vowel_words"
        ),
        F.size(F.regexp_extract_all(low, F.lit(r"\b[a-z]{8,}\b"), F.lit(0))).alias(
            "n_long_words"
        ),
        F.regexp_count(low, F.lit(r"[aeiou]{2}")).alias("n_vowel_pairs"),
    )


_REGEXP_SQL = """
SELECT doc_id,
       len(regexp_extract_all(lower(text), '\\b[aeiou][a-z]*'))::INT AS n_vowel_words,
       len(regexp_extract_all(lower(text), '\\b[a-z]{8,}\\b'))::INT AS n_long_words,
       len(regexp_extract_all(lower(text), '[aeiou]{2}'))::INT         AS n_vowel_pairs
FROM documents
"""


def regression_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (least squares of extended
    price on quantity) -- slope / intercept / R^2 -- computed from EXACT
    integer moments (quantity is integral, price snapped to cents, so
    Sx/Sy/Sxx/Sxy/Syy are exact BIGINT sums) and combined in one fixed
    expression tree.  The built-in ``regr_slope``/``corr`` aggregates
    stream partial double sums whose accumulation order is partition-
    dependent -- fine statistically, but not bit-reproducible across
    engines or cluster sizes; the moment formulation is both (same
    single-pass map-side-combined scan, one extra column)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
        .cast("long").alias("p"),
    )
    # Per-row products fit BIGINT (p <= ~1e7 cents -> p^2 <= ~1e14), but
    # their SUMS pass int64's ~9.2e18 at moderate scale factors -- so the
    # second-moment accumulators are decimal(38,0) (exact 128-bit sums,
    # matching the oracle's HUGEINT promotion); the double math below is
    # unchanged because decimal->double and int->double round the same
    # exact integer to the same double.
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("sx"),
        F.sum("p").cast("long").alias("sy"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("q") * F.col("p")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("p") * F.col("p")).cast("decimal(38,0)")).alias("syy"),
    )
    n, sx, sy = [F.col(c).cast("double") for c in ("n", "sx", "sy")]
    sxx, sxy, syy = [F.col(c).cast("double") for c in ("sxx", "sxy", "syy")]
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = slope * slope * (n * sxx - sx * sx) / (n * syy - sy * sy)
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope / 100.0, 6).alias("slope"),          # cents -> dollars
        F.round(intercept / 100.0, 4).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    ).orderBy("l_returnflag")


_REGRESSION_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
         -- HUGEINT: sum(BIGINT) promotes to 128-bit (the engine side
         -- accumulates decimal(38,0)); a BIGINT cast here would overflow
         -- at moderate scale factors
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sxx,
         CAST(sum(CAST(l_quantity AS BIGINT)
                  * CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS HUGEINT) AS sxy,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                  * CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS HUGEINT) AS syy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) / 100.0, 6) AS slope,
       round(((CAST(sy AS DOUBLE)
               - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) / 100.0, 4)
         AS intercept,
       round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 6) AS r2
FROM m ORDER BY l_returnflag
"""


def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.3) of each user's
    event values over their last 20 events -- the time-series smoothing
    primitive (anomaly baselines, load forecasting) whose recursion
    ``y_t = a*x_t + (1-a)*y_{t-1}`` SQL cannot express directly; a
    BOUNDED window array + a fold expresses it exactly (both engines
    reduce left-to-right from the frame's oldest element, so the double
    chains are identical).

    Scale: the frame is ROWS-bounded (20 values), so the window buffer
    is constant per row no matter how long a user's history is -- the
    unbounded formulation would buffer whole histories.  One shuffle on
    user_id; the final latest-row filter is a WindowGroupLimit rank."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    vals = F.collect_list(F.col("value").cast("double")).over(wf)
    with_vals = ev.withColumn("vals", vals)
    ewma = F.round(
        F.aggregate(
            F.slice("vals", 2, F.greatest(F.size("vals") - 1, F.lit(0))),
            F.element_at("vals", 1),
            lambda acc, x: acc * F.lit(0.7) + x * F.lit(0.3),
        ),
        6,
    )
    w_last = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        with_vals.withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.size("vals").cast("int").alias("n_window"),
            ewma.alias("ewma"),
        )
    )


_EWMA_SQL = """
WITH w AS (
  SELECT user_id, event_id, ts,
         list(CAST(value AS DOUBLE)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
  FROM events
), r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM w
)
SELECT user_id,
       CAST(len(vals) AS INT) AS n_window,
       round(list_reduce(vals, (acc, x) -> acc * 0.7 + x * 0.3), 6) AS ewma
FROM r WHERE rn = 1
"""


def resample_hourly_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification (gap filling): the full hourly grid from
    min to max event hour, per event type, with zero-filled counts --
    what a downstream model-training join needs instead of sparse hours.

    Scale: the grid is sequence+explode over the GLOBAL hour bounds (one
    tiny agg broadcast), cross-joined with the distinct-type dim; the left
    join back to the hourly counts is an equi join on (type, hour)."""
    ev = _events(spark, sf_dir)
    hour = (F.expr("ts_ms DIV 3600000") * 3600000).alias("hour_ms")
    hourly = ev.groupBy(F.col("event_type"), hour).agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = hourly.agg(
        F.min("hour_ms").alias("mn"), F.max("hour_ms").alias("mx")
    )
    grid_hours = bounds.select(
        F.explode(F.sequence("mn", "mx", F.lit(3600000))).alias("hour_ms")
    )
    types = hourly.select("event_type").distinct()
    grid = grid_hours.crossJoin(F.broadcast(types))
    return grid.join(hourly, ["event_type", "hour_ms"], "left").select(
        "event_type", "hour_ms", F.coalesce("n", F.lit(0)).alias("n_events")
    )


_RESAMPLE_SQL = """
WITH h AS (SELECT event_type, (epoch_ms(ts) // 3600000) * 3600000 AS hour_ms,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
     b AS (SELECT min(hour_ms) AS mn, max(hour_ms) AS mx FROM h),
     grid AS (SELECT t.event_type,
                     unnest(generate_series(b.mn, b.mx, 3600000)) AS hour_ms
              FROM (SELECT DISTINCT event_type FROM h) t, b)
SELECT grid.event_type, grid.hour_ms, coalesce(h.n, 0) AS n_events
FROM grid LEFT JOIN h USING (event_type, hour_ms)
"""



def window_order_milestones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining window analytics in one pass: first_value / last_value /
    nth_value over the full partition frame, plus ntile / percent_rank /
    cume_dist.  One shuffle on the customer key; the full-partition frame
    is evaluated once per partition, not per row."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        "o_custkey", "o_orderkey",
        _epoch_ms(F.col("o_orderdate")).alias("od_ms"),
        "o_totalprice",
    )
    wo = Window.partitionBy("o_custkey").orderBy("od_ms", "o_orderkey")
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return base.select(
        "o_custkey", "o_orderkey",
        F.first_value(F.col("o_totalprice")).over(wf).alias("first_price"),
        F.last_value(F.col("o_totalprice")).over(wf).alias("last_price"),
        F.nth_value(F.col("o_totalprice"), 2).over(wf).alias("second_price"),
        F.ntile(4).over(wo).alias("quartile"),
        _round_pos(F.percent_rank().over(wo), 6).alias("pct_rank"),
        _round_pos(F.cume_dist().over(wo), 6).alias("cume"),
    )


_WINDOW_MILESTONES_SQL = """
SELECT o_custkey, o_orderkey,
       first_value(o_totalprice) OVER wf AS first_price,
       last_value(o_totalprice)  OVER wf AS last_price,
       nth_value(o_totalprice, 2) OVER wf AS second_price,
       ntile(4) OVER wo AS quartile,
       floor(percent_rank() OVER wo * 1000000 + 0.5) / 1000000 AS pct_rank,
       floor(cume_dist()    OVER wo * 1000000 + 0.5) / 1000000 AS cume
FROM (SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS od_ms, o_totalprice
      FROM orders)
WINDOW wo AS (PARTITION BY o_custkey ORDER BY od_ms, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY od_ms, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def null_semantics_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics end to end: nullif-derived null keys, grouping that
    KEEPS the null group, count(*) vs count(col) (null-skipping), and a
    null-safe (<=>) full-outer self-join -- the exact places engines
    disagree about three-valued logic."""
    li = _t(spark, sf_dir, "lineitem")
    flagged = li.select(
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag"),
        "l_shipdate", "l_quantity",
    )
    y96 = (
        flagged.filter(F.col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .groupBy(F.col("flag").alias("flag_a"))
        .agg(F.count(F.lit(1)).alias("n_96"), F.count("flag").alias("n_flag_96"))
    )
    y97 = (
        flagged.filter(F.col("l_shipdate").between("1997-01-01", "1997-12-31"))
        .groupBy(F.col("flag").alias("flag_b"))
        .agg(F.count(F.lit(1)).alias("n_97"))
    )
    joined = y96.join(y97, F.col("flag_a").eqNullSafe(F.col("flag_b")), "full_outer")
    return joined.select(
        F.coalesce("flag_a", "flag_b", F.lit("<null>")).alias("flag_label"),
        (F.col("flag_a").isNull() & F.col("flag_b").isNull()).alias("was_null_key"),
        "n_96", "n_flag_96", "n_97",
    )


_NULL_SEMANTICS_SQL = """
WITH flagged AS (SELECT nullif(l_returnflag, 'N') AS flag, l_shipdate FROM lineitem),
     y96 AS (SELECT flag, count(*) AS n_96, count(flag) AS n_flag_96
             FROM flagged
             WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-12-31'
             GROUP BY flag),
     y97 AS (SELECT flag, count(*) AS n_97
             FROM flagged
             WHERE l_shipdate BETWEEN '1997-01-01' AND '1997-12-31'
             GROUP BY flag)
SELECT coalesce(y96.flag, y97.flag, '<null>') AS flag_label,
       (y96.flag IS NULL AND y97.flag IS NULL) AS was_null_key,
       n_96, n_flag_96, n_97
FROM y96 FULL OUTER JOIN y97 ON y96.flag IS NOT DISTINCT FROM y97.flag
"""


def cheapest_shipment_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin-per-group via min_by (Spark) / arg_min (DuckDB): for each
    part of one brand, the supplier of its cheapest shipment.  The order
    key packs (price-in-cents, suppkey) into one BIGINT so ties break
    identically in both engines.  Single partial-aggregating shuffle --
    the window-rank spelling would sort every group instead."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2").select(
        "p_partkey"
    )
    ord_key = (
        F.round(F.col("l_extendedprice") * 100).cast("long") * 1000000
        + F.col("l_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey")
        .agg(
            F.min_by("l_suppkey", ord_key).alias("best_suppkey"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.count(F.lit(1)).alias("n_shipments"),
        )
    )


_CHEAPEST_SQL = """
SELECT l_partkey,
       arg_min(l_suppkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) * 1000000 + l_suppkey)
           AS best_suppkey,
       round(min(l_extendedprice), 2) AS min_price,
       count(*) AS n_shipments
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#2'
GROUP BY l_partkey
"""



def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 pattern: bilateral trade volume between two nations by ship
    year.  Five-way join where every dimension side (supplier+nation,
    customer+nation via orders) is pre-filtered to the two nations and
    broadcast; the only shuffling join is lineitem<->orders, and the
    nation-pair predicate runs on broadcast rows before it."""
    n1 = F.lit("NATION_1")
    n2 = F.lit("NATION_2")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "cust_nation")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31")
    )
    joined = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            # per-row snap to exact ten-thousandths, sum BIGINTs, divide:
            # identical expression trees on both engines, so the .xx5
            # rounding boundary cannot flip on sum order (the q9 technique)
            F.round(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * 10000.0
                        + F.lit(0.5)
                    ).cast("long")
                )
                / 10000.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       round(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                               * 10000.0 + 0.5) AS BIGINT)) / 10000.0, 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN '1995-01-01' AND '1996-12-31'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""



def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 pattern: top-20 customers by revenue on returned items in
    one quarter.  Customer + nation dims broadcast; lineitem's returnflag
    and orders' date range push to the scans; top-k is
    TakeOrderedAndProject with the custkey tie-break."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            # per-row snap to exact ten-thousandths, sum BIGINTs, divide:
            # identical expression trees on both engines, so the .xx5
            # rounding boundary cannot flip on sum order (the q9 technique)
            F.round(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * 10000.0
                        + F.lit(0.5)
                    ).cast("long")
                )
                / 10000.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                               * 10000.0 + 0.5) AS BIGINT)) / 10000.0, 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= '1996-10-01' AND o_orderdate < '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""



def sql_recursive_chain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): walk each part's
    binary-ancestor chain (node -> floor(node/2), a synthetic but
    deterministic DAG over p_partkey) accumulating depth and the chain's
    retail-price rollup -- the BOM/org-hierarchy traversal the SQL
    surface previously could not express natively (the engine's
    iterative operators, graph.py, cover the data-driven cases; this
    registers the declarative spelling).

    Scale: each recursion step is one equi-join of the frontier against
    the dimension, exactly the BFS frontier-join plan Catalyst already
    executes for the hand-built loops; depth bounds the step count
    (<= log2(max key) here).  The oracle runs the IDENTICAL statement --
    both engines only support UNION ALL recursion, and the tree
    structure guarantees termination without dedup.
    """
    _t(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice"
    ).createOrReplaceTempView("dps_part_v")
    return spark.sql(_RECURSIVE_TEMPLATE.format(tbl="dps_part_v"))


_RECURSIVE_TEMPLATE = """
WITH RECURSIVE chain(p_partkey, node, depth, price_sum) AS (
  SELECT p_partkey, p_partkey, 0, p_retailprice
  FROM {tbl} WHERE p_partkey < 256
  UNION ALL
  SELECT c.p_partkey, pp.p_partkey, c.depth + 1, c.price_sum + pp.p_retailprice
  FROM chain c JOIN {tbl} pp ON pp.p_partkey = CAST(floor(c.node / 2.0) AS BIGINT)
  WHERE c.node > 1
)
SELECT p_partkey,
       CAST(max(depth) AS INT) AS depth,
       round(max(price_sum), 2) AS chain_price
FROM chain GROUP BY p_partkey
"""

_RECURSIVE_SQL = _RECURSIVE_TEMPLATE.format(tbl="part")


def sql_qualify_latest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API surface (spark.sql): each customer's two most recent orders
    via a windowed subquery (OSS Spark has no QUALIFY; the oracle uses
    DuckDB's QUALIFY shorthand for the same plan).  One shuffle on the
    partition key, rank evaluated during the partition sort; Catalyst
    pushes the rn<=2 filter into the window as a WindowGroupLimit."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("dps_orders_v")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, od_ms, o_totalprice
        FROM (
          SELECT o_custkey, o_orderkey,
                 timestampdiff(MILLISECOND,
                               to_timestamp_ntz('1970-01-01 00:00:00'),
                               o_orderdate) AS od_ms,
                 o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey) AS rn
          FROM dps_orders_v
        )
        WHERE rn <= 2
        """
    )


_SQL_QUALIFY_SQL = """
SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS od_ms, o_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey) <= 2
"""


def sql_groupby_all_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API GROUP BY ALL: aggregate keyed by every non-aggregated select
    column (both engines support the same shorthand)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("dps_orders_v2")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM dps_orders_v2
        GROUP BY ALL
        """
    )


_SQL_GROUPBY_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ALL
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage event funnel (view -> click -> purchase, each stage
    strictly after the user's FIRST occurrence of the previous one) with
    per-stage user counts and conversion rates.

    Scale: three per-user min aggregates, each keyed on user_id -- the
    three joins and both aggs reuse ONE hash partitioning, so AQE plans a
    single effective shuffle of the events scan per stage filter, and the
    final count is a scalar agg.  No windows over the raw stream and no
    per-user event arrays (a collect_list spelling would shuffle the whole
    event payload; this ships only (user_id, ts) pairs).
    """
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts_ms")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v.select(F.col("user_id").alias("vu"), "t_view"),
              (F.col("user_id") == F.col("vu")) & (F.col("ts_ms") > F.col("t_view")))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select(F.col("user_id").alias("cu"), "t_click"),
              (F.col("user_id") == F.col("cu")) & (F.col("ts_ms") > F.col("t_click")))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_purchase"))
    )
    return (
        v.join(c.select(F.col("user_id").alias("u2"), "t_click"),
               F.col("user_id") == F.col("u2"), "left")
        .join(p.select(F.col("user_id").alias("u3"), "t_purchase"),
              F.col("user_id") == F.col("u3"), "left")
        .agg(
            F.count("t_view").alias("n_view"),
            F.count("t_click").alias("n_click"),
            F.count("t_purchase").alias("n_purchase"),
            F.round(F.count("t_click") / F.count("t_view"), 6).alias("view_to_click"),
            F.round(F.count("t_purchase") / F.count("t_click"), 6).alias("click_to_purchase"),
        )
    )


_FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
),
v AS (
  SELECT user_id, min(ts_ms) AS t_view FROM ev
  WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, min(e.ts_ms) AS t_click
  FROM ev e JOIN v ON e.user_id = v.user_id AND e.ts_ms > v.t_view
  WHERE e.event_type = 'click' GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts_ms) AS t_purchase
  FROM ev e JOIN c ON e.user_id = c.user_id AND e.ts_ms > c.t_click
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT count(t_view)                                    AS n_view,
       count(t_click)                                   AS n_click,
       count(t_purchase)                                AS n_purchase,
       round(count(t_click) * 1.0 / count(t_view), 6)   AS view_to_click,
       round(count(t_purchase) * 1.0 / count(t_click), 6) AS click_to_purchase
FROM v
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week, with
    the count still active k weeks later and the retention rate vs the
    cohort size.

    Scale: first-activity and (user, week) activity dedup are both keyed
    on user_id (one partitioning reused); the cohort-size lookup is a
    re-aggregate of the tiny per-cohort result broadcast back.  Weeks are
    integer Monday-aligned indices of the epoch-ms clock
    (``(day + 3) DIV 7``; epoch day 0 is a Thursday), so the offset
    subtraction is exact integer arithmetic in both engines -- no
    timezone- or calendar-dependent truncation.
    """
    week = "(ts_ms DIV 86400000 + 3) DIV 7"
    ev = _events(spark, sf_dir).select(
        "user_id", F.expr(week).cast("int").alias("week_idx")
    )
    first = ev.groupBy("user_id").agg(F.min("week_idx").alias("cohort_week"))
    active = ev.distinct()
    joined = active.join(
        first.select(F.col("user_id").alias("fu"), "cohort_week"),
        F.col("user_id") == F.col("fu"),
    ).select(
        "cohort_week",
        (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        "user_id",
    )
    per_cell = joined.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    sizes = first.groupBy(F.col("cohort_week").alias("sz_week")).agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        per_cell.join(F.broadcast(sizes), F.col("cohort_week") == F.col("sz_week"))
        .select(
            "cohort_week", "week_offset", "n_users", "cohort_size",
            F.round(F.col("n_users") / F.col("cohort_size"), 6).alias("retention"),
        )
    )


_COHORT_SQL = """
WITH ev AS (
  SELECT user_id,
         CAST((epoch_ms(ts) // 86400000 + 3) // 7 AS INTEGER) AS week_idx
  FROM events
),
first AS (
  SELECT user_id, min(week_idx) AS cohort_week FROM ev GROUP BY 1
),
active AS (
  SELECT DISTINCT user_id, week_idx FROM ev
),
per_cell AS (
  SELECT cohort_week, week_idx - cohort_week AS week_offset, count(*) AS n_users
  FROM active JOIN first USING (user_id)
  GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_week AS sz_week, count(*) AS cohort_size FROM first GROUP BY 1
)
SELECT cohort_week, week_offset, n_users, cohort_size,
       round(n_users * 1.0 / cohort_size, 6) AS retention
FROM per_cell JOIN sizes ON cohort_week = sz_week
"""


def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type percentile winsorization of the event value column: clip
    to [p05, p95] and report clip counts and the clipped mean -- the
    standard outlier treatment before numeric features enter training.

    Scale: two passes over events (exact percentiles, then the clip
    aggregate) with the tiny per-type percentile table broadcast back
    between them.  At 100 TB swap ``percentile`` for
    ``approx_percentile`` (same plan shape, one mergeable sketch pass;
    the `approx_percentiles_price` query demonstrates that path) -- exact
    percentiles are kept here because the oracle checks exact values.
    """
    ev = _events(spark, sf_dir).select("event_type", "value")
    pct = ev.groupBy(F.col("event_type").alias("p_type")).agg(
        F.percentile("value", 0.05).alias("p_lo"),
        F.percentile("value", 0.95).alias("p_hi"),
    )
    clipped = F.greatest("p_lo", F.least("p_hi", F.col("value")))
    return (
        ev.join(F.broadcast(pct), F.col("event_type") == F.col("p_type"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("p_lo"), 6).alias("p_lo"),
            F.round(F.min("p_hi"), 6).alias("p_hi"),
            F.count_if(F.col("value") < F.col("p_lo")).alias("n_clipped_lo"),
            F.count_if(F.col("value") > F.col("p_hi")).alias("n_clipped_hi"),
            F.round(F.avg(clipped), 6).alias("mean_winsorized"),
        )
    )


_WINSORIZE_SQL = """
WITH pct AS (
  SELECT event_type AS p_type,
         quantile_cont(value, 0.05) AS p_lo,
         quantile_cont(value, 0.95) AS p_hi
  FROM events GROUP BY 1
)
SELECT event_type,
       count(*)                                              AS n,
       round(min(p_lo), 6)                                   AS p_lo,
       round(min(p_hi), 6)                                   AS p_hi,
       count(*) FILTER (value < p_lo)                        AS n_clipped_lo,
       count(*) FILTER (value > p_hi)                        AS n_clipped_hi,
       round(avg(greatest(p_lo, least(p_hi, value))), 6)     AS mean_winsorized
FROM events JOIN pct ON event_type = p_type
GROUP BY event_type
"""


def mad_outlier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median absolute deviation
    (median of |value - median|) and the count of values whose robust
    z-score ``0.6745 * |x - med| / mad`` exceeds 3.5 (the Iglewicz-Hoaglin
    rule).

    Scale: three aggregate passes (median, MAD, outlier count), each a
    keyed aggregate on the 5-value type domain with the one-row-per-type
    intermediates broadcast back -- the fact table streams through each
    pass, nothing wide ever shuffles.
    """
    ev = _events(spark, sf_dir).select("event_type", "value")
    med = ev.groupBy(F.col("event_type").alias("m_type")).agg(
        F.median("value").alias("med")
    )
    with_med = ev.join(F.broadcast(med), F.col("event_type") == F.col("m_type"))
    mad = with_med.groupBy(F.col("event_type").alias("d_type")).agg(
        F.median(F.abs(F.col("value") - F.col("med"))).alias("mad")
    )
    robust_z = 0.6745 * F.abs(F.col("value") - F.col("med")) / F.col("mad")
    return (
        with_med.join(F.broadcast(mad), F.col("event_type") == F.col("d_type"))
        .groupBy("event_type")
        .agg(
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.count_if(robust_z > 3.5).alias("n_outliers"),
        )
    )


_MAD_SQL = """
WITH med AS (
  SELECT event_type AS m_type, median(value) AS med FROM events GROUP BY 1
),
mad AS (
  SELECT event_type AS d_type, median(abs(value - med)) AS mad
  FROM events JOIN med ON event_type = m_type
  GROUP BY 1
)
SELECT event_type,
       round(min(med), 6) AS med,
       round(min(mad), 6) AS mad,
       count(*)           AS n,
       count(*) FILTER (0.6745 * abs(value - med) / mad > 3.5) AS n_outliers
FROM events
JOIN med ON event_type = m_type
JOIN mad ON event_type = d_type
GROUP BY event_type
"""


def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 10 most common 3-step event-type sequences across
    per-user timelines (consecutive triples, ordered by timestamp with
    event_id tie-breaks).

    Scale: ONE shuffle keyed on user_id builds each user's ordered type
    array (only (ts, event_id, type) crosses the wire); the triple
    enumeration is an array transform over that row -- per-user state, no
    self-joins of the event stream (the naive 3-way join spelling shuffles
    the fact table three times).  The final count is a domain-bounded agg
    (|types|^3 keys max) and top-10 is TakeOrderedAndProject.
    """
    ev = _events(spark, sf_dir)
    seqs = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts_ms", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(F.expr("transform(evs, e -> e.event_type)").alias("types"))
    )
    triples = seqs.select(
        F.explode(
            F.when(
                F.size("types") >= 3,
                F.expr(
                    "transform(sequence(0, size(types)-3),"
                    " i -> concat_ws('>', types[i], types[i+1], types[i+2]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("path")
    )
    return (
        triples.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )


_EVENT_PATHS_SQL = """
WITH seqs AS (
  SELECT user_id,
         list(event_type ORDER BY epoch_ms(ts), event_id) AS types
  FROM events GROUP BY 1
),
tri AS (
  SELECT unnest([types[i] || '>' || types[i+1] || '>' || types[i+2]
                 FOR i IN generate_series(1, len(types) - 2)]) AS path
  FROM seqs
  WHERE len(types) >= 3
)
SELECT path, count(*) AS n
FROM tri
GROUP BY path
ORDER BY n DESC, path ASC
LIMIT 10
"""


def price_decile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization: EXACT interpolated decile edges of
    l_extendedprice, broadcast back, bin assignment as a pure array fold
    -- the feature-engineering binning pattern.

    Scale: no global sort, no ntile window, and -- unlike the built-in
    exact ``percentile`` aggregate, which buffers the ENTIRE column in
    one aggregation buffer (the same hot-buffer hazard class as an
    uncapped collect_list) -- the edges are reconstructed from a
    value-grain HISTOGRAM: one map-side-combined count per distinct
    price, a cumulative count over that compressed domain, and two
    containment probes per decile for the order statistics either side
    of the interpolation rank.  The cumulative count is a DISTRIBUTED
    prefix sum (integer counts, so exactness is unaffected by the
    split): the histogram is bucketed by a deterministic order-
    preserving function of the value (fixed-width cells over the exact
    [min, max] span -- recomputation-stable, so no checkpoint pin, no
    RangePartitioner sampling job), each bucket computes its local
    running sum in parallel, and per-bucket offsets come from one tiny
    window over the per-bucket subtotals (rows = bucket count, NOT
    domain size -- the one single-partition step).  A near-continuous
    value domain at 100x therefore never funnels through one task,
    which the previous global-ordered window did.  Both order
    statistics probe the cumulative table in one containment join
    (unpivoted ranks), and the per-bin counts/extrema fold over the
    value-grain histogram, never the raw rows -- one lineitem scan
    total at execution (identical histogram exchange subtrees are
    served by AQE stage reuse).  Memory is bounded by the price DOMAIN,
    never the row count, and the result is bit-identical to the
    percentile aggregate (same (n-1)*q interpolation, same expression
    tree -- the oracle is unchanged).
    """
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    qs = [i / 10.0 for i in range(1, 10)]
    hist = li.groupBy("l_extendedprice").agg(F.count(F.lit(1)).alias("c"))
    # The distributed prefix sum is bucketed by a DETERMINISTIC
    # order-preserving function of the value itself (fixed-width cells
    # over the exact [min, max] span) instead of spark_partition_id over
    # a range exchange: recomputing the bucketing yields identical
    # assignments by construction, so the localCheckpoint that pinned the
    # RangePartitioner's sampled boundaries (and its sampling job) is
    # unnecessary.  Every appearance of ``hist`` below is the same
    # canonical aggregate subtree, so the physical plan computes the
    # histogram shuffle ONCE and ReusedExchange serves the other
    # branches -- one lineitem scan total (the old spelling paid three:
    # checkpoint build, n_total, and the final binning pass).
    n_buckets = 256
    minmax = hist.agg(
        F.min("l_extendedprice").alias("vmin"),
        F.max("l_extendedprice").alias("vmax"),
    )
    pid = F.when(
        F.col("vmax") > F.col("vmin"),
        F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("l_extendedprice") - F.col("vmin"))
                    / (F.col("vmax") - F.col("vmin"))
                    * n_buckets
                ),
            ),
        ),
    ).otherwise(F.lit(0)).cast("int")
    bucketed = hist.crossJoin(F.broadcast(minmax)).select(
        "l_extendedprice", "c", pid.alias("pid")
    )
    wloc = Window.partitionBy("pid").orderBy("l_extendedprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = bucketed.select(
        "pid",
        "l_extendedprice",
        "c",
        F.coalesce(F.sum("c").over(wloc), F.lit(0)).alias("loc"),
    )
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    per_bucket = bucketed.groupBy("pid").agg(F.sum("c").alias("pc"))
    offsets = per_bucket.select(
        "pid", F.coalesce(F.sum("pc").over(woff), F.lit(0)).alias("off")
    )
    cum = local.join(F.broadcast(offsets), "pid").select(
        F.col("l_extendedprice").alias("v"),
        (F.col("off") + F.col("loc") + 1).alias("r_lo"),
        (F.col("off") + F.col("loc") + F.col("c")).alias("r_hi"),
    )
    n_total = per_bucket.agg(F.sum("pc").alias("n"))
    ranks = (
        spark.createDataFrame([(q,) for q in qs], "q double")
        .crossJoin(F.broadcast(n_total))
        .select(
            "q",
            ((F.col("n") - 1) * F.col("q")).alias("idx"),
        )
        .select(
            "q",
            (F.floor("idx") + 1).alias("lo_rank"),
            (F.floor("idx") + 2).alias("hi_rank"),
            (F.col("idx") - F.floor("idx")).alias("frac"),
        )
    )
    # both order statistics probe ``cum`` in ONE containment join (the
    # lo/hi ranks ride as unpivoted rows): the r_lo..r_hi intervals
    # partition 1..n, so each rank matches at most one histogram row --
    # a hi_rank of n+1 (q landing exactly on the last row) simply finds
    # no match and folds back to v_lo below, the old left-join semantics
    rank_rows = ranks.select(
        "q", "frac",
        F.explode(F.array(
            F.struct(F.col("lo_rank").alias("rank"),
                     F.lit(True).alias("is_lo")),
            F.struct(F.col("hi_rank").alias("rank"),
                     F.lit(False).alias("is_lo")),
        )).alias("rk"),
    ).select("q", "frac", F.col("rk.rank").alias("rank"),
             F.col("rk.is_lo").alias("is_lo"))
    both = (
        cum.join(
            F.broadcast(rank_rows),
            (F.col("rank") >= F.col("r_lo")) & (F.col("rank") <= F.col("r_hi")),
        )
        .groupBy("q", "frac")
        .agg(
            F.min(F.when(F.col("is_lo"), F.col("v"))).alias("v_lo"),
            F.min(F.when(~F.col("is_lo"), F.col("v"))).alias("v_hi"),
        )
        .select(
            "q",
            (
                F.col("v_lo")
                + (F.coalesce(F.col("v_hi"), F.col("v_lo")) - F.col("v_lo"))
                * F.col("frac")
            ).alias("edge"),
        )
    )
    edges = both.agg(F.sort_array(F.collect_list("edge")).alias("edges"))
    bin_id = F.lit(1) + F.aggregate(
        "edges",
        F.lit(0),
        lambda acc, e: acc
        + F.when(F.col("l_extendedprice") > e, F.lit(1)).otherwise(F.lit(0)),
    )
    # the bin is a pure function of the VALUE, so the per-bin counts and
    # extrema fold over the value-grain histogram (sum of per-value
    # counts), not the raw rows -- no second lineitem scan, and the
    # histogram exchange above is reused
    return (
        hist.join(F.broadcast(edges))
        .select(bin_id.alias("bin"), "l_extendedprice", "c")
        .groupBy("bin")
        .agg(
            F.sum("c").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
    )


_DECILE_SQL = """
WITH edges AS (
  SELECT quantile_cont(l_extendedprice,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS edges
  FROM lineitem
)
SELECT 1 + CAST(list_sum(list_transform(edges,
             e -> CASE WHEN l_extendedprice > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin,
       count(*)                      AS n,
       round(min(l_extendedprice), 2) AS lo,
       round(max(l_extendedprice), 2) AS hi
FROM lineitem CROSS JOIN edges
GROUP BY 1
"""


def stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family per return flag: sample stddev /
    variance, Pearson correlation and sample covariance of quantity vs
    extended price.

    Scale: one scan, one partial-aggregable pass -- all four moments
    merge associatively (sum/sum-of-squares/cross-products), so map-side
    combine applies exactly as for sum/count.  Rounded to 4 dp because
    the engines sum partials in different orders (the moments themselves
    are ulp-stable well past 4 dp at any scale).
    """
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_covar"
            ),
        )
    )


_STAT_AGG_SQL = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4)                  AS qty_stddev,
       round(var_samp(l_quantity), 4)                     AS qty_var,
       round(corr(l_quantity, l_extendedprice), 4)        AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4)  AS qty_price_covar
FROM lineitem
GROUP BY l_returnflag
"""


def sql_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``FILTER (WHERE ...)`` aggregates in SQL text form: per-status
    conditional sums/counts in ONE pass over orders (the pre-SQL:2003
    spelling is CASE-inside-agg; FILTER is the declarative form both
    engines plan identically as conditional partial aggregates)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("dps_orders_fv")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*)                                            AS n_orders,
               count(*)    FILTER (WHERE o_orderstatus = 'F')      AS n_finished,
               round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2)
                                                                   AS finished_revenue,
               round(avg(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2)
                                                                   AS avg_large_price
        FROM dps_orders_fv
        GROUP BY o_orderpriority
        """
    )


_FILTERED_AGG_SQL = """
SELECT o_orderpriority,
       count(*)                                       AS n_orders,
       count(*) FILTER (WHERE o_orderstatus = 'F')    AS n_finished,
       round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2)
                                                      AS finished_revenue,
       round(avg(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2)
                                                      AS avg_large_price
FROM orders
GROUP BY o_orderpriority
"""


def calendar_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar scalar-function surface (date_trunc / quarter / last_day /
    dayofweek) driving a month-grain aggregate: the month key comes from
    truncation, not string formatting, so it stays a comparable timestamp
    and the aggregate's partial combine applies as usual."""
    orders = _t(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    return (
        orders.select(
            month.alias("month_start"),
            F.quarter("o_orderdate").alias("qtr"),
            _epoch_ms(F.last_day(F.col("o_orderdate"))).alias("month_end_ms"),
            F.dayofweek("o_orderdate").alias("dow"),
            "o_totalprice",
        )
        .groupBy("month_start", "qtr", "month_end_ms")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count_if(F.col("dow").isin(1, 7)).alias("weekend_orders"),
        )
        .withColumn("month_start_ms", _epoch_ms(F.col("month_start")))
        .drop("month_start")
    )


_CALENDAR_SQL = """
SELECT epoch_ms(date_trunc('month', o_orderdate))      AS month_start_ms,
       quarter(o_orderdate)                            AS qtr,
       epoch_ms(CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)) AS month_end_ms,
       count(*)                                        AS n_orders,
       round(sum(o_totalprice), 2)                     AS revenue,
       CAST(sum(CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT)
                                                       AS weekend_orders
FROM orders
GROUP BY 1, 2, 3
"""


def constraint_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality contract over orders
    (``operators.quality.check_constraints``): key uniqueness, non-null
    columns, a row predicate, and referential integrity into customer --
    compiled to one shared-scan aggregate plus one anti-join."""
    from ..operators.quality import check_constraints

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return check_constraints(
        orders,
        unique=["o_orderkey"],
        not_null=["o_custkey", "o_orderdate"],
        checks={"positive_price": F.col("o_totalprice") > 0},
        foreign_keys=[("o_custkey", customer, "c_custkey")],
    )


_CONSTRAINTS_SQL = """
SELECT 'unique(o_orderkey)' AS rule,
       CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS violations,
       count(o_orderkey) - count(DISTINCT o_orderkey) = 0 AS passed
FROM orders
UNION ALL
SELECT 'not_null(o_custkey)',
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'not_null(o_orderdate)',
       CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'check(positive_price)',
       CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'fk(o_custkey -> c_custkey)',
       CAST(count(*) FILTER (WHERE o_custkey IS NOT NULL
                        AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                              WHERE c_custkey IS NOT NULL)) AS BIGINT),
       count(*) FILTER (WHERE o_custkey IS NOT NULL
                        AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                              WHERE c_custkey IS NOT NULL)) = 0
FROM orders
"""


def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable KMV distinct-count sketch
    (``operators.sketches``): per event type, the 256 smallest distinct
    md5-hash values of user_id estimate the distinct-user count as
    ``(k-1)/h_(k)``.  Unlike the builtin HLL++ (``hll_sketch_users``,
    implementation-defined state), every value here is a pure function
    of the data -- ORACLE-checked bit-for-bit, and the sketch state is a
    relation that merges associatively (property-tested)."""
    from ..operators.sketches import kmv_estimate, kmv_sketch

    ev = _events(spark, sf_dir)
    return kmv_estimate(kmv_sketch(ev, "user_id", ["event_type"]))


_KMV_SQL = """
WITH hashed AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events WHERE user_id IS NOT NULL
),
topk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed
),
sk AS (
  SELECT event_type, count(*) AS n_in_sketch,
         max(CASE WHEN rn = 256 THEN h END) AS kth
  FROM topk WHERE rn <= 256 GROUP BY event_type
)
SELECT event_type, CAST(n_in_sketch AS INT) AS n_in_sketch,
       CASE WHEN n_in_sketch < 256 THEN CAST(n_in_sketch AS DOUBLE)
            ELSE round(255.0 / (CAST(kth AS DOUBLE) / 1152921504606846976.0), 2)
       END AS est_distinct
FROM sk
"""


def hll_manual_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-register HyperLogLog (``operators.sketches``): 1024
    registers per event type from md5-hash bucket/rho, harmonic
    denominator accumulated as an EXACT integer, linear-counting small-
    range correction.  The register relation is inspectable, mergeable
    (max per register) and engine-replayable -- ORACLE-checked, unlike
    the binary DataSketches state of ``hll_sketch_users``."""
    from ..operators.sketches import hll_estimate, hll_registers

    ev = _events(spark, sf_dir)
    return hll_estimate(hll_registers(ev, "user_id", ["event_type"]), ["event_type"])


_HLL_MANUAL_SQL = """
WITH h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events WHERE user_id IS NOT NULL
),
reg AS (
  SELECT event_type, CAST(h & 1023 AS INT) AS bucket,
         max(CASE WHEN (h >> 10) = 0 THEN 51
                  ELSE 50 - length(ltrim(bin(h >> 10), '0')) + 1 END) AS rho
  FROM h GROUP BY event_type, bucket
),
agg AS (
  SELECT event_type, count(*) AS n_regs,
         sum(CAST(1 AS BIGINT) << CAST(51 - rho AS INT)) AS s_used
  FROM reg GROUP BY event_type
),
fin AS (
  SELECT event_type,
         CAST(1024 - n_regs AS BIGINT) AS v_empty,
         CAST(s_used + (1024 - n_regs) * (CAST(1 AS BIGINT) << 51) AS BIGINT)
           AS denom_int
  FROM agg
)
SELECT event_type, CAST(1024 AS INT) AS m, v_empty, denom_int,
       round(CASE WHEN raw <= 2560.0 AND v_empty > 0
                  THEN 1024.0 * ln(1024.0 / CAST(v_empty AS DOUBLE))
                  ELSE raw END, 1) AS est_distinct
FROM (
  SELECT *,
         0.7213 / (1 + 1.079 / 1024) * 1024 * 1024 * 2251799813685248.0
           / CAST(denom_int AS DOUBLE) AS raw
  FROM fin
)
"""


def hll_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL): per
    event-type user sketches plus a global row whose sketch is the UNION of
    the per-type sketches -- never a second scan.  This mergeability is the
    scale story: at 100 TB you sketch once at the finest grain and answer
    every coarser rollup by unioning binary sketches (exact distinct would
    need one full shuffle per grain).  Rows-only check; the 5%-tolerance
    property test lives in tests/test_queries.py."""
    ev = _events(spark, sf_dir)
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "n_events",
    )
    total = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.sum("n_events").alias("n_events"),
    ).select(F.lit("__all__").alias("event_type"), "approx_users", "n_events")
    return typed.unionByName(total)


def variant_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through the VARIANT type (Spark 4): ``props``
    parsed once into a variant, typed path extraction, grouped aggregate.
    Compared to per-path ``get_json_object`` re-parsing, a 100 TB scan
    parses each JSON document exactly once and the binary variant encoding
    keeps extraction vectorized."""
    ev = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_VARIANT_SQL = """
SELECT event_type,
       count(*)                                                    AS n_events,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
       min(CAST(json_extract_string(props, '$.k') AS INTEGER))     AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS INTEGER))     AS max_k
FROM events
GROUP BY event_type
"""


def sql_listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation via ``listagg ... WITHIN GROUP`` (ANSI,
    Spark 4) -- deterministic because the within-group order is total.
    Tiny-dim demo of the agg; at scale listagg shares the hash-aggregate
    path (partial per-group buffers, one shuffle)."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("dps_nation_v")
    _t(spark, sf_dir, "region").createOrReplaceTempView("dps_region_v")
    return spark.sql(
        """
        SELECT r_name,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
               count(*) AS n_nations
        FROM dps_nation_v JOIN dps_region_v ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


_LISTAGG_SQL = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*)                                AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def sql_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (per-customer top-2 orders by price).
    Catalyst decorrelates the lateral into a ranked window join -- the same
    physical plan as the QUALIFY spelling, but exercising the ANSI lateral
    entry path."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("dps_customer_v")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("dps_orders_lv")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM dps_customer_v c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM dps_orders_lv o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        """
    )


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
"""


def triangle_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 parts by triangle participation in the co-purchase graph
    (parts co-ordered within an order); see operators/graph.py for the
    wedge-join structure and the degree-orientation scale note."""
    from ..operators import graph

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return graph.triangle_participation(graph.copurchase_edges(li), k=10)


_TRIANGLE_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
verts AS (SELECT unnest([a, b, c]) AS vertex FROM tri)
SELECT vertex, CAST(count(*) AS BIGINT) AS triangles
FROM verts GROUP BY 1
ORDER BY triangles DESC, vertex ASC
LIMIT 10
"""


def skew_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic over the orders-per-customer distribution
    (operators.quality.skew_report): the heaviest join keys with their
    row share and ratio to the mean group size -- the pre-flight check
    before salting or trusting AQE's skew split."""
    from ..operators.quality import skew_report

    return skew_report(
        _t(spark, sf_dir, "orders").select("o_custkey"), ["o_custkey"], k=10
    )


_SKEW_REPORT_SQL = """
WITH counts AS (
  SELECT o_custkey, count(*) AS n_rows FROM orders GROUP BY 1
),
stats AS (
  SELECT sum(n_rows) AS total_rows, count(*) AS n_groups FROM counts
)
SELECT c.o_custkey,
       CAST(c.n_rows AS BIGINT) AS n_rows,
       round(c.n_rows / s.total_rows, 6) AS row_share,
       round(c.n_rows * s.n_groups / s.total_rows, 4) AS skew_ratio
FROM counts c CROSS JOIN stats s
ORDER BY n_rows DESC, o_custkey ASC
LIMIT 10
"""


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-snapshot diff (operators.quality.snapshot_diff): classify
    every order key across two simulated snapshots of the orders table --
    snapshot A is orders before 1998-01-01; snapshot B extends the date
    range (rows 'added') and re-prices every 'P'-status order (+10.00,
    rows 'changed').  Returns the per-class audit summary.

    Scale: the operator collapses compared columns to one fingerprint
    per side BEFORE its single full-outer join, so a 100-column fact
    diff shuffles key+hash only; the summary is a 4-row aggregate."""
    from ..operators.quality import snapshot_diff

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"
    )
    old = base.filter(F.col("o_orderdate") < "1998-01-01")
    new = (
        base.filter(F.col("o_orderdate") < "1998-06-01")
        # simulated hard-deletes so the diff exercises all four classes
        .filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderstatus") == "P",
                F.round(F.col("o_totalprice") + 10.0, 2),
            ).otherwise(F.col("o_totalprice")),
        )
    )
    diff = snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )
    return (
        diff.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("change_type")
    )


_SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderdate < '1998-01-01'
), new AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'P'
              THEN round(o_totalprice + 10.0, 2) ELSE o_totalprice END
           AS o_totalprice
  FROM orders WHERE o_orderdate < '1998-06-01' AND o_orderkey % 97 <> 0
), d AS (
  SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
         CASE WHEN old.o_orderkey IS NULL THEN 'added'
              WHEN new.o_orderkey IS NULL THEN 'removed'
              WHEN (old.o_orderstatus IS DISTINCT FROM new.o_orderstatus)
                OR (old.o_totalprice IS DISTINCT FROM new.o_totalprice)
              THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
)
SELECT change_type,
       CAST(count(*) AS BIGINT) AS n_keys,
       min(o_orderkey) AS min_key,
       max(o_orderkey) AS max_key
FROM d GROUP BY 1 ORDER BY 1
"""


def cascade_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-propagation audit (the right-to-be-forgotten pre-flight):
    given a victim set of customers (deterministic ``c_custkey % 1000 ==
    7`` here; in production the request table), report how many rows each
    downstream table loses through the FK cascade customer -> orders ->
    lineitem, with totals for blast-radius review BEFORE any delete runs.

    Scale: the victim set broadcasts to the orders probe; the affected
    order keys then semi-join lineitem (key-only shuffle at worst --
    broadcast while the victim slice is small); each table contributes
    one conditional aggregate, so the audit costs one scan per table."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    victims = cust.filter(F.col("c_custkey") % 1000 == 7)
    orders_hit = orders.join(
        F.broadcast(victims), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey")

    def audit(df, hit, table):
        return (
            df.join(hit, df.columns[:1], "left_semi")
            .agg(F.count(F.lit(1)).cast("long").alias("rows_deleted"))
            .crossJoin(
                df.agg(F.count(F.lit(1)).cast("long").alias("rows_total"))
            )
            .select(
                F.lit(table).alias("table"),
                "rows_deleted",
                "rows_total",
                F.round(F.col("rows_deleted") / F.col("rows_total"), 6).alias(
                    "delete_fraction"
                ),
            )
        )

    out = (
        audit(cust, victims, "customer")
        .unionByName(
            audit(
                orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey"),
                victims,
                "orders",
            )
        )
        .unionByName(
            audit(li.select("l_orderkey"), orders_hit.select(
                F.col("o_orderkey").alias("l_orderkey")), "lineitem")
        )
    )
    return out.orderBy("table")


_CASCADE_DELETE_SQL = """
WITH victims AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 1000 = 7
), orders_hit AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM victims)
)
SELECT 'customer' AS "table",
       CAST((SELECT count(*) FROM victims) AS BIGINT) AS rows_deleted,
       CAST((SELECT count(*) FROM customer) AS BIGINT) AS rows_total,
       round(CAST((SELECT count(*) FROM victims) AS BIGINT)
             / CAST((SELECT count(*) FROM customer) AS BIGINT), 6)
         AS delete_fraction
UNION ALL
SELECT 'lineitem',
       CAST((SELECT count(*) FROM lineitem
             WHERE l_orderkey IN (SELECT o_orderkey FROM orders_hit)) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       round(CAST((SELECT count(*) FROM lineitem
                   WHERE l_orderkey IN (SELECT o_orderkey FROM orders_hit))
                  AS BIGINT)
             / CAST((SELECT count(*) FROM lineitem) AS BIGINT), 6)
UNION ALL
SELECT 'orders',
       CAST((SELECT count(*) FROM orders_hit) AS BIGINT),
       CAST((SELECT count(*) FROM orders) AS BIGINT),
       round(CAST((SELECT count(*) FROM orders_hit) AS BIGINT)
             / CAST((SELECT count(*) FROM orders) AS BIGINT), 6)
ORDER BY "table"
"""


def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` in BATCH mode (30-min gap) -- the same
    operator Structured Streaming uses, proven against the lag+cumsum
    islands formulation in the oracle.  Boundary semantics matter: an
    event exactly ``gap`` after its predecessor starts a NEW session
    (sessions span ``[start, last+gap)``), so the islands twin marks new
    sessions on ``diff >= gap``, not ``>``.

    Scale: one shuffle on the session-window grouping; per-group state is
    a session's events.  (The manual-islands ``sessionize_events`` costs
    the same shuffle; this registers the native spelling.)
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "value", "ts")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            _epoch_ms(F.col("session_window.start")).alias("session_start_ms"),
            "n_events",
            "total_value",
        )
    )


_SESSION_WINDOW_SQL = """
WITH ev AS (
  SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms FROM events
),
m AS (
  SELECT *, CASE WHEN ts_ms - lag(ts_ms) OVER
                      (PARTITION BY user_id ORDER BY ts_ms, event_id)
                      >= 1800000 THEN 1 ELSE 0 END AS is_new
  FROM ev
),
s AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                              ROWS UNBOUNDED PRECEDING) AS seq
  FROM m
)
SELECT user_id,
       CAST(min(ts_ms) AS BIGINT) AS session_start_ms,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS total_value
FROM s GROUP BY user_id, seq
"""


def try_arithmetic_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface: under Spark 4's default ANSI mode,
    division by zero and bad casts THROW unless routed through the
    ``try_*`` family -- this query exercises the NULL-on-failure forms a
    pipeline needs for dirty data (DuckDB's plain operators already have
    these semantics, so the oracle is direct).

    Per order-priority: average items-per-line ratio where the divisor
    can be zero-ish (quantity floor), a try_cast of the numeric tail of
    the priority string, and the count of rows the safe forms nulled.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_linenumber"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.try_divide(F.col("l_linenumber"), F.floor(F.col("l_quantity") / 10))
        .alias("ratio"),
        F.try_to_number(
            F.substring("o_orderpriority", 1, 1), F.lit("9")
        ).cast("int").alias("prio_num"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("ratio").isNull().cast("long")).alias("n_null_ratios"),
        F.round(F.avg("ratio"), 6).alias("avg_ratio"),
        F.max("prio_num").alias("prio_num"),
    )


_TRY_ARITH_SQL = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN floor(l.l_quantity / 10) = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null_ratios,
       round(avg(CASE WHEN floor(l.l_quantity / 10) = 0 THEN NULL
                      ELSE l.l_linenumber / floor(l.l_quantity / 10) END), 6)
         AS avg_ratio,
       CAST(max(TRY_CAST(substr(o.o_orderpriority, 1, 1) AS INTEGER))
            AS INTEGER) AS prio_num
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


def star_wide_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The denormalization pass at its widest: flatten the full star
    (lineitem -> orders -> customer -> nation -> region, plus part and
    supplier) and roll revenue up by (region, brand, order year).

    Scale: every dimension chain broadcasts (region/nation/customer are
    the classic descending-size chain; part and supplier join on their
    keys) and every scan is pruned to the 2-3 columns the rollup needs --
    the fact table shuffles ONCE at most (AQE usually broadcasts all
    sides here).  This is the ETL wide-table build every warehouse runs
    nightly, expressed as one Catalyst plan.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("order_year")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    wide = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
    )
    return (
        wide.groupBy("r_name", "p_brand", "order_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            # per-row snap to exact ten-thousandths, sum BIGINTs, divide:
            # identical expression trees on both engines, so the .xx5
            # rounding boundary cannot flip on sum order (the q9 technique)
            F.round(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * 10000.0
                        + F.lit(0.5)
                    ).cast("long")
                )
                / 10000.0,
                2,
            ).alias("revenue"),
        )
    )


_STAR_WIDE_SQL = """
SELECT r.r_name, p.p_brand, year(o.o_orderdate) AS order_year,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                               * 10000.0 + 0.5) AS BIGINT)) / 10000.0, 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1, 2, 3
"""


def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: a stored base aggregate (orders
    before 1999) combined with the delta batch's partial aggregate
    (orders from 1999 on) by re-aggregating the PARTIALS -- sums and
    counts combine associatively, and the average derives at read time
    from the combined sums.  The result is bit-identical to a full
    recompute (the oracle IS the full recompute), but the incremental
    path only scans the delta plus a |groups|-row state table -- the
    difference between touching one day and re-reading seven years at
    100 TB.
    """
    cutoff = F.lit("1999-01-01").cast("timestamp_ntz")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice", "o_orderdate"
    )

    def partial(df):
        # snap each price to exact integer cents and sum longs: the
        # base+delta partial-sum order then cannot drift from the oracle's
        # single-pass double sum at a rounding boundary (the q9 technique)
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
            ).alias("s"),
        )

    base = partial(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.round(F.sum("s") / 100.0, 2).alias("total_price"),
            F.round(F.sum("s") / 100.0 / F.sum("n"), 6).alias("avg_price"),
        )
    )


_INCR_AGG_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) / 100.0, 2)
           AS total_price,
       round(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) / 100.0
             / count(*), 6) AS avg_price
FROM orders
GROUP BY o_orderstatus
"""


def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN (the delta-join identity):
    with base tables split into (old, delta) -- orders by a date cut,
    customers by a key slice -- the refreshed join is

        old_A (join) old_B  UNION ALL  delta_A (join) FULL_B
                           UNION ALL  old_A (join) delta_B

    (the delta-delta term rides in ``delta_A (join) FULL_B``), so a daily
    refresh joins ONE day of orders against customers plus the customer
    delta against the old orders -- never re-joining seven years against
    the full dimension.  The oracle IS the monolithic full join; per-row
    cent snapping (the q9 technique) makes the union's sum order
    irrelevant, proving bit-identity of the maintained view.

    Scale: each delta term is a small-side broadcast or key-partitioned
    join over a sliver; the final aggregate is map-side combined.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o_cut = F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    c_cut = F.col("c_custkey") % 10 < 9
    old_o, delta_o = o.filter(o_cut), o.filter(~o_cut)
    old_c, delta_c = c.filter(c_cut), c.filter(~c_cut)

    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")

    def term(orders_part, cust_part):
        return orders_part.join(
            cust_part, F.col("o_custkey") == F.col("c_custkey")
        ).select("c_nationkey", cents.alias("cents"))

    view = (
        term(old_o, old_c)
        .unionByName(term(delta_o, c))       # delta_A x full_B (incl. delta-delta)
        .unionByName(term(old_o, delta_c))   # old_A x delta_B
    )
    return (
        view.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("cents") / 100.0, 2).alias("total_price"),
        )
        .orderBy("c_nationkey")
    )


_INCR_JOIN_SQL = """
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) / 100.0, 2)
         AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-schema referential-integrity audit: every TPC-H foreign key
    checked in one report via operators.quality.check_constraints (each FK
    is a left_anti against the dimension's distinct keys -- broadcast when
    the dimension is small, shuffle otherwise; the fact side is one
    pruned-column scan per rule)."""
    from ..operators.quality import check_constraints

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    reports = [
        check_constraints(li, foreign_keys=[
            ("l_orderkey", orders, "o_orderkey"),
            ("l_partkey", part, "p_partkey"),
            ("l_suppkey", supplier, "s_suppkey"),
        ]).withColumn("table", F.lit("lineitem")),
        check_constraints(orders, foreign_keys=[
            ("o_custkey", customer, "c_custkey"),
        ]).withColumn("table", F.lit("orders")),
        check_constraints(customer, foreign_keys=[
            ("c_nationkey", nation, "n_nationkey"),
        ]).withColumn("table", F.lit("customer")),
        check_constraints(supplier, foreign_keys=[
            ("s_nationkey", nation, "n_nationkey"),
        ]).withColumn("table", F.lit("supplier")),
        check_constraints(nation, foreign_keys=[
            ("n_regionkey", region, "r_regionkey"),
        ]).withColumn("table", F.lit("nation")),
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select("table", "rule", "violations", "passed")


_FK_AUDIT_SQL = """
SELECT 'lineitem' AS "table", 'fk(l_orderkey -> o_orderkey)' AS rule,
       CAST(count(*) FILTER (o.o_orderkey IS NULL) AS BIGINT) AS violations,
       count(*) FILTER (o.o_orderkey IS NULL) = 0 AS passed
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem', 'fk(l_partkey -> p_partkey)',
       CAST(count(*) FILTER (p.p_partkey IS NULL) AS BIGINT),
       count(*) FILTER (p.p_partkey IS NULL) = 0
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
UNION ALL
SELECT 'lineitem', 'fk(l_suppkey -> s_suppkey)',
       CAST(count(*) FILTER (s.s_suppkey IS NULL) AS BIGINT),
       count(*) FILTER (s.s_suppkey IS NULL) = 0
FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
UNION ALL
SELECT 'orders', 'fk(o_custkey -> c_custkey)',
       CAST(count(*) FILTER (c.c_custkey IS NULL) AS BIGINT),
       count(*) FILTER (c.c_custkey IS NULL) = 0
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'customer', 'fk(c_nationkey -> n_nationkey)',
       CAST(count(*) FILTER (n.n_nationkey IS NULL) AS BIGINT),
       count(*) FILTER (n.n_nationkey IS NULL) = 0
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
UNION ALL
SELECT 'supplier', 'fk(s_nationkey -> n_nationkey)',
       CAST(count(*) FILTER (n.n_nationkey IS NULL) AS BIGINT),
       count(*) FILTER (n.n_nationkey IS NULL) = 0
FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
UNION ALL
SELECT 'nation', 'fk(n_regionkey -> r_regionkey)',
       CAST(count(*) FILTER (r.r_regionkey IS NULL) AS BIGINT),
       count(*) FILTER (r.r_regionkey IS NULL) = 0
FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the event value over an irregular
    series (TWAP): each reading is weighted by how long it was current
    (time until the user's next event); the final reading of a user has no
    duration and drops out of the weighting.

    Scale: one shuffle on user_id for the lead() window (high-cardinality
    partition key, per-user state is one row), then the per-user aggregate
    reuses the same partitioning -- Catalyst plans no second exchange.
    """
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = _epoch_ms(F.col("ts"))
    dur = (F.lead(ms).over(w) - ms).alias("dur_ms")
    timed = ev.select("user_id", "value", dur).filter(F.col("dur_ms").isNotNull())
    return timed.groupBy("user_id").agg(
        F.round(F.sum(F.col("value") * F.col("dur_ms")) / F.sum("dur_ms"), 6)
        .alias("twap"),
        F.sum("dur_ms").cast("long").alias("covered_ms"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    )


_TWAP_SQL = """
WITH t AS (
  SELECT user_id, value,
         lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_ms(ts) AS dur_ms
  FROM events
)
SELECT user_id,
       round(sum(value * dur_ms) / sum(dur_ms), 6) AS twap,
       CAST(sum(dur_ms) AS BIGINT) AS covered_ms,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM t WHERE dur_ms IS NOT NULL
GROUP BY user_id
"""


def record_linkage_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate scoring by blocking + sorted
    neighborhood (Hernandez & Stolfo 1995): block part names on their
    first word, rank each block alphabetically, and score only pairs
    within ``w=5`` ranks of each other -- candidate volume is
    ``|block| * w`` instead of ``|block|^2``, which is what keeps a
    300-record block from becoming 45k Levenshtein calls (the plain
    within-block cross product measured 35s at sf0.1; this is ~1s).
    Returns the 20 closest pairs in deterministic (distance, name, name)
    order.

    Scale: neighbor generation is a PURE equi-join -- each record
    explodes its next ``w`` rank slots and joins on (block, rank) -- so
    no quadratic intermediate ever materializes; the per-block ranking
    window is bounded by the block, and the top-k is a
    TakeOrderedAndProject.  Skewed blocks cost |block| * w, linear.
    """
    w = 5
    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("key"),
        F.col("p_name").alias("name"),
        F.split(F.col("p_name"), " ")[0].alias("block"),
    )
    ranked = p.withColumn(
        "rank",
        F.row_number().over(Window.partitionBy("block").orderBy("name", "key")),
    )
    probes = ranked.select(
        "block",
        F.col("name").alias("name_a"),
        F.explode(F.sequence(F.col("rank") + 1, F.col("rank") + w)).alias(
            "nb_rank"
        ),
    )
    return (
        probes.join(
            ranked.select(
                "block",
                F.col("rank").alias("nb_rank"),
                F.col("name").alias("name_b"),
            ),
            ["block", "nb_rank"],
        )
        .select(
            "block",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("distance"),
        )
        .orderBy(F.asc("distance"), F.asc("name_a"), F.asc("name_b"))
        .limit(20)
    )


_LINKAGE_SQL = """
WITH p AS (
  SELECT p_partkey AS key, p_name AS name,
         string_split(p_name, ' ')[1] AS block
  FROM part
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY block ORDER BY name, key) AS rank
  FROM p
), probes AS (
  SELECT block, name AS name_a,
         unnest(range(rank + 1, rank + 6)) AS nb_rank
  FROM ranked
)
SELECT probes.block,
       probes.name_a,
       r.name AS name_b,
       CAST(levenshtein(probes.name_a, r.name) AS INTEGER) AS distance
FROM probes
JOIN ranked r ON r.block = probes.block AND r.rank = probes.nb_rank
ORDER BY distance ASC, name_a ASC, name_b ASC
LIMIT 20
"""


def communities_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities of the first-year co-purchase graph.
    Synchronous deterministic LPA (most-frequent neighbor+self label, ties
    to the smallest) is a pure function of the previous labeling, so the
    4-round result is exactly reproduced by a DuckDB recursive CTE
    (``_LPA_SQL``) -- each recursive step re-derives the full label table
    from a vote count + windowed argmax.  The shipdate slice reaches the
    scan as a pushed filter; the operator itself is scale-general."""
    from ..operators import graph

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    )
    return graph.label_propagation(graph.copurchase_edges(li), n_iter=4)


# Synchronous LPA as a recursive CTE: bi_self carries one self-loop per
# vertex so the "neighbors PLUS ITSELF" vote needs only ONE reference to
# the recursive table (recursive terms allow a single self-reference);
# the (count DESC, label ASC) row_number picks the same winner as the
# engine's min(struct(-n, label)).  Exactly n_iter = 4 rounds.
_LPA_SQL = """
WITH RECURSIVE
items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_shipdate < TIMESTAMP '1996-01-01'
),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
),
bi AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst, src FROM edges
),
bi_self AS (
  SELECT src, dst FROM bi
  UNION ALL
  SELECT DISTINCT src, src FROM bi
),
lp(vertex, label, it) AS (
    SELECT DISTINCT src, src, 0 FROM bi
  UNION ALL
    SELECT vertex, label, it + 1 FROM (
      SELECT s.src AS vertex, l.label AS label, l.it AS it,
             row_number() OVER (PARTITION BY s.src
                                ORDER BY count(*) DESC, l.label ASC) AS rn
      FROM lp l JOIN bi_self s ON s.dst = l.vertex
      WHERE l.it < 4
      GROUP BY s.src, l.label, l.it
    ) WHERE rn = 1
)
SELECT CAST(label AS BIGINT)    AS community,
       CAST(count(*) AS BIGINT) AS size,
       CAST(min(vertex) AS BIGINT) AS representative
FROM lp WHERE it = 4
GROUP BY label
ORDER BY size DESC, community ASC
"""


def sssp_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths from the smallest part over the first-year
    co-purchase graph, edge weight = 1 / co-occurrence count (strong
    affinities are short hops).  Iterative Bellman-Ford, checked exactly
    against a DuckDB recursive-CTE Bellman-Ford oracle (``_SSSP_SQL``)."""
    from ..operators import graph

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    )
    pairs = F.flatten(
        F.expr(
            "transform(ps, (x, i) -> "
            "transform(slice(ps, i + 2, size(ps)), "
            "y -> struct(x AS src, y AS dst)))"
        )
    )
    weighted = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .agg((F.lit(1.0) / F.count(F.lit(1))).alias("weight"))
    )
    # generous safety cap: the loop exits on the observe-fused
    # zero-improvement signal (one round past the fixpoint), so headroom
    # beyond the true weighted hop diameter (13/14 rounds at
    # sf0.001/sf0.01) costs nothing; 12 was measured insufficient at
    # sf0.01 and left upper-bound distances in the result
    return graph.sssp(weighted, max_iter=64)


# Fixed-round distributed Bellman-Ford as a recursive CTE: each recursive
# step re-derives the FULL distance table (min over carry + one-edge
# relaxations), so the working set stays |reached vertices| per round --
# no path enumeration, no explosion.  32 rounds >= the measured fixpoint
# depth (14 at sf0.01) with 2x margin; post-fixpoint rounds re-emit the
# identical table, so the it = 32 slice is the fixpoint.
_SSSP_SQL = """
WITH RECURSIVE
items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_shipdate < TIMESTAMP '1996-01-01'
),
edges AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst,
         1.0 / COUNT(*) AS weight
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
),
bi AS (
  SELECT src, dst, weight FROM edges
  UNION ALL
  SELECT dst, src, weight FROM edges
),
bf(vertex, dist, it) AS (
    SELECT (SELECT min(src) FROM bi), CAST(0.0 AS DOUBLE), 0
  UNION ALL
    SELECT vertex, min(dist) AS dist, min(it) + 1 AS it
    FROM (
      SELECT vertex, dist, it FROM bf WHERE it < 32
      UNION ALL
      SELECT e.dst AS vertex, b.dist + e.weight AS dist, b.it
      FROM bf b JOIN bi e ON e.src = b.vertex WHERE b.it < 32
    )
    GROUP BY vertex
)
SELECT CAST(vertex AS BIGINT) AS vertex,
       round(dist, 6) AS dist
FROM bf WHERE it = 32
ORDER BY dist, vertex
"""


def kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense core of the first-year co-purchase graph: the 4-core's
    surviving parts and their within-core degrees (mean degree is ~3, so
    k=4 isolates the genuinely dense neighborhoods).  The iterative peel
    is checked exactly against a DuckDB recursive-CTE peel oracle
    (``_KCORE_SQL``): each recursive step keeps only edges whose BOTH
    endpoints still have degree >= k -- identical round semantics to the
    engine's semi-join peel."""
    from ..operators import graph

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    )
    return graph.kcore(graph.copurchase_edges(li), k=4)


# Iterative peel as a recursive CTE over the surviving (directed) edge
# list: per-endpoint degrees come from window counts (bi is symmetric, so
# degree(v) = count of rows with src = v), and a round drops every edge
# with an under-degree endpoint -- the same transition as kcore()'s
# degree-filter + two semi-joins.  20 rounds matches the engine's
# max_iter; post-fixpoint rounds recycle the identical edge set, so the
# it = 20 slice is the fixpoint (or empty when the core is empty, which
# is also what the engine returns).
_KCORE_SQL = """
WITH RECURSIVE
items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_shipdate < TIMESTAMP '1996-01-01'
),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
),
bi AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst, src FROM edges
),
peel(src, dst, it) AS (
    SELECT src, dst, 0 FROM bi
  UNION ALL
    SELECT src, dst, it + 1 FROM (
      SELECT src, dst, it,
             count(*) OVER (PARTITION BY src) AS dsrc,
             count(*) OVER (PARTITION BY dst) AS ddst
      FROM peel WHERE it < 20
    ) WHERE dsrc >= 4 AND ddst >= 4
)
SELECT CAST(src AS BIGINT) AS vertex,
       CAST(count(*) AS BIGINT) AS core_degree
FROM peel WHERE it = 20
GROUP BY src
HAVING count(*) >= 4
ORDER BY vertex
"""


def bfs_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distances from the smallest part in the co-purchase graph
    (frontier-expanding iterative joins; the recursive-CTE workload shape
    Spark has no native operator for -- see operators/graph.py)."""
    from ..operators import graph

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return graph.bfs_distances(graph.copurchase_edges(li), max_hops=3)


_BFS_SQL = """
WITH RECURSIVE
items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
bi AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
walk(vertex, hops) AS (
  SELECT (SELECT min(src) FROM edges), 0
  UNION
  SELECT bi.dst, walk.hops + 1
  FROM walk JOIN bi ON bi.src = walk.vertex
  WHERE walk.hops < 3
)
SELECT vertex, CAST(min(hops) AS INTEGER) AS hops
FROM walk GROUP BY vertex
"""


QUERIES = {
    "triangle_copurchase": triangle_copurchase,
    "time_weighted_value": time_weighted_value,
    "record_linkage_parts": record_linkage_parts,
    "communities_copurchase": communities_copurchase,
    "sssp_copurchase": sssp_copurchase,
    "kcore_copurchase": kcore_copurchase,
    "fk_integrity_audit": fk_integrity_audit,
    "incremental_agg_maintenance": incremental_agg_maintenance,
    "star_wide_rollup": star_wide_rollup,
    "try_arithmetic_safety": try_arithmetic_safety,
    "session_window_batch": session_window_batch,
    "skew_report_orders": skew_report_orders,
    "snapshot_diff_orders": snapshot_diff_orders,
    "cascade_delete_audit": cascade_delete_audit,
    "sql_recursive_chain_rollup": sql_recursive_chain_rollup,
    "incremental_join_maintenance": incremental_join_maintenance,
    "ewma_user_values": ewma_user_values,
    "regression_by_flag": regression_by_flag,
    "asof_join_nearest_click": asof_join_nearest_click,
    "bfs_copurchase": bfs_copurchase,
    "sql_filtered_aggregates": sql_filtered_aggregates,
    "calendar_order_stats": calendar_order_stats,
    "constraint_checks_orders": constraint_checks_orders,
    "asof_join_cogroup": asof_join_cogroup,
    "hll_sketch_users": hll_sketch_users,
    "kmv_distinct_users": kmv_distinct_users,
    "hll_manual_users": hll_manual_users,
    "variant_event_props": variant_event_props,
    "sql_listagg_nations": sql_listagg_nations,
    "sql_lateral_top_orders": sql_lateral_top_orders,
    "q1_pricing_summary": q1_pricing_summary,
    "price_decile_bins": price_decile_bins,
    "stat_aggregates": stat_aggregates,
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
    "winsorized_value_stats": winsorized_value_stats,
    "mad_outlier_counts": mad_outlier_counts,
    "top_event_paths": top_event_paths,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "agg_having_priority": agg_having_priority,
    "topk_customers": topk_customers,
    "window_rank_orders": window_rank_orders,
    "window_running_spend": window_running_spend,
    "window_range_30d_spend": window_range_30d_spend,
    "window_order_milestones": window_order_milestones,
    "null_semantics_flags": null_semantics_flags,
    "cheapest_shipment_supplier": cheapest_shipment_supplier,
    "asof_join_purchase_click": asof_join_purchase_click,
    "range_join_price_bands": range_join_price_bands,
    "interval_join_purchase_click": interval_join_purchase_click,
    "q4_order_priority": q4_order_priority,
    "q18_large_volume": q18_large_volume,
    "unpivot_nation_balances": unpivot_nation_balances,
    "array_agg_order_quantities": array_agg_order_quantities,
    "conditional_aggregates": conditional_aggregates,
    "map_hourly_activity": map_hourly_activity,
    "regexp_word_stats": regexp_word_stats,
    "resample_hourly_gaps": resample_hourly_gaps,
    "approx_percentiles_price": approx_percentiles_price,
    "grouped_map_user_gaps": grouped_map_user_gaps,
    "setops_repeat_buyers": setops_repeat_buyers,
    "setops_bag_semantics": setops_bag_semantics,
    "anti_join_quiet_customers": anti_join_quiet_customers,
    "semi_join_active_parts": semi_join_active_parts,
    "rollup_returns": rollup_returns,
    "rollup_grouping_id": rollup_grouping_id,
    "window_moving_avg": window_moving_avg,
    "scalar_pandas_udf_prices": scalar_pandas_udf_prices,
    "scalar_functions": scalar_functions,
    "events_hourly": events_hourly,
    "events_sliding_2h": events_sliding_2h,
    "cross_join_nation_region": cross_join_nation_region,
    "heavy_hitter_priorities": heavy_hitter_priorities,
    "levenshtein_adjacent_docs": levenshtein_adjacent_docs,
    "sessionize_events": sessionize_events,
    "distinct_users_by_type": distinct_users_by_type,
    "part_type_share": part_type_share,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q10_returned_items": q10_returned_items,
    "sql_qualify_latest_orders": sql_qualify_latest_orders,
    "sql_groupby_all_status": sql_groupby_all_status,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "cube_returns_modes": cube_returns_modes,
    "grouping_sets_revenue": grouping_sets_revenue,
    "full_outer_nation_accounts": full_outer_nation_accounts,
    "percentiles_by_segment": percentiles_by_segment,
    "json_event_props": json_event_props,
    "shipping_lag_stats": shipping_lag_stats,
    "approx_distinct_users": approx_distinct_users,
    "pivot_flag_by_year": pivot_flag_by_year,
    "udaf_geomean_price": udaf_geomean_price,
}

ORACLE = {
    "triangle_copurchase": _TRIANGLE_SQL,
    "fk_integrity_audit": _FK_AUDIT_SQL,
    "incremental_agg_maintenance": _INCR_AGG_SQL,
    "star_wide_rollup": _STAR_WIDE_SQL,
    "try_arithmetic_safety": _TRY_ARITH_SQL,
    "session_window_batch": _SESSION_WINDOW_SQL,
    "skew_report_orders": _SKEW_REPORT_SQL,
    "snapshot_diff_orders": _SNAPSHOT_DIFF_SQL,
    "cascade_delete_audit": _CASCADE_DELETE_SQL,
    "sql_recursive_chain_rollup": _RECURSIVE_SQL,
    "incremental_join_maintenance": _INCR_JOIN_SQL,
    "ewma_user_values": _EWMA_SQL,
    "regression_by_flag": _REGRESSION_SQL,
    "asof_join_nearest_click": _ASOF_NEAREST_SQL,
    "time_weighted_value": _TWAP_SQL,
    "record_linkage_parts": _LINKAGE_SQL,
    "bfs_copurchase": _BFS_SQL,
    "sssp_copurchase": _SSSP_SQL,
    "kcore_copurchase": _KCORE_SQL,
    "communities_copurchase": _LPA_SQL,
    "sql_filtered_aggregates": _FILTERED_AGG_SQL,
    "calendar_order_stats": _CALENDAR_SQL,
    "constraint_checks_orders": _CONSTRAINTS_SQL,
    "asof_join_cogroup": _ASOF_SQL,
    "variant_event_props": _VARIANT_SQL,
    "kmv_distinct_users": _KMV_SQL,
    "hll_manual_users": _HLL_MANUAL_SQL,
    "sql_listagg_nations": _LISTAGG_SQL,
    "sql_lateral_top_orders": _LATERAL_SQL,
    "q1_pricing_summary": _Q1_SQL,
    "funnel_conversion": _FUNNEL_SQL,
    "cohort_retention": _COHORT_SQL,
    "winsorized_value_stats": _WINSORIZE_SQL,
    "mad_outlier_counts": _MAD_SQL,
    "top_event_paths": _EVENT_PATHS_SQL,
    "price_decile_bins": _DECILE_SQL,
    "stat_aggregates": _STAT_AGG_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "q5_region_revenue": _Q5_SQL,
    "agg_having_priority": _AGG_HAVING_SQL,
    "topk_customers": _TOPK_SQL,
    "window_rank_orders": _WINDOW_RANK_SQL,
    "window_running_spend": _WINDOW_RUNNING_SQL,
    "window_range_30d_spend": _WINDOW_RANGE_SQL,
    "window_order_milestones": _WINDOW_MILESTONES_SQL,
    "null_semantics_flags": _NULL_SEMANTICS_SQL,
    "cheapest_shipment_supplier": _CHEAPEST_SQL,
    "asof_join_purchase_click": _ASOF_SQL,
    "range_join_price_bands": _RANGE_JOIN_SQL,
    "interval_join_purchase_click": _INTERVAL_JOIN_SQL,
    "q4_order_priority": _Q4_SQL,
    "q18_large_volume": _Q18_SQL,
    "unpivot_nation_balances": _UNPIVOT_SQL,
    "array_agg_order_quantities": _ARRAY_AGG_SQL,
    "conditional_aggregates": _CONDITIONAL_AGG_SQL,
    "map_hourly_activity": _MAP_HOURLY_SQL,
    "regexp_word_stats": _REGEXP_SQL,
    "resample_hourly_gaps": _RESAMPLE_SQL,
    "grouped_map_user_gaps": _GROUPED_MAP_SQL,
    "setops_repeat_buyers": _SETOPS_SQL,
    "setops_bag_semantics": _SETOPS_BAG_SQL,
    "anti_join_quiet_customers": _ANTI_SQL,
    "semi_join_active_parts": _SEMI_SQL,
    "rollup_returns": _ROLLUP_SQL,
    "rollup_grouping_id": _ROLLUP_GID_SQL,
    "window_moving_avg": _WINDOW_MOVING_AVG_SQL,
    "scalar_pandas_udf_prices": _SCALAR_UDF_SQL,
    "scalar_functions": _SCALAR_SQL,
    "events_hourly": _EVENTS_HOURLY_SQL,
    "events_sliding_2h": _EVENTS_SLIDING_SQL,
    "cross_join_nation_region": _CROSS_JOIN_SQL,
    "levenshtein_adjacent_docs": _LEVENSHTEIN_SQL,
    # heavy_hitter candidate sets alone are implementation-defined; the
    # exact verification pass makes the two-pass output oracle-checkable
    "heavy_hitter_priorities": _HEAVY_HITTER_SQL,
    "sessionize_events": _SESSIONIZE_SQL,
    "distinct_users_by_type": _DISTINCT_SQL,
    "part_type_share": _PART_TYPE_SQL,
    "q6_forecast_revenue": _Q6_SQL,
    "q7_volume_shipping": _Q7_SQL,
    "q10_returned_items": _Q10_SQL,
    "sql_qualify_latest_orders": _SQL_QUALIFY_SQL,
    "sql_groupby_all_status": _SQL_GROUPBY_ALL_SQL,
    "q17_small_quantity_revenue": _Q17_SQL,
    "cube_returns_modes": _CUBE_SQL,
    "grouping_sets_revenue": _GROUPING_SETS_SQL,
    "full_outer_nation_accounts": _FULL_OUTER_SQL,
    "percentiles_by_segment": _PERCENTILES_SQL,
    "json_event_props": _JSON_SQL,
    "shipping_lag_stats": _SHIPPING_LAG_SQL,
    "pivot_flag_by_year": _PIVOT_SQL,
    "udaf_geomean_price": _GEOMEAN_SQL,
    # approx_distinct_users: intentionally no oracle (sketch estimates are
    # implementation-defined); rows-only check + 5% tolerance test
}
