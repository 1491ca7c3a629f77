"""Iterative graph analytics over edge DataFrames.

Connected components (see ``dedup.connected_components``) and PageRank
cover the two shapes every DataFrame-native graph engine needs: label
propagation to a fixpoint and damped score iteration.  Both run as plain
joins/aggregates with periodic ``localCheckpoint`` to truncate lineage --
the standard Spark iterative-algorithm pattern (each iteration would
otherwise append to one ever-growing plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Damped PageRank over a directed edge list; returns (vertex, rank),
    ranks summing to 1 (dangling mass redistributed uniformly).

    Scale: per iteration ONE shuffle for the contribution aggregate (the
    edges->ranks join broadcasts ranks while small, AQE-shuffles at web
    scale) plus a scalar dangling-mass aggregate.  ``with_deg`` is
    localCheckpoint-ed every iteration BEFORE the dangling aggregate, so
    the dangling ``.first()`` and the next iteration's join both read the
    materialized result -- each iteration's plan executes exactly once
    (the previous per-``checkpoint_every`` truncation re-executed up to a
    window of join-iterations twice per round: once for the dangling
    scalar, again when the next iteration rebuilt on ``ranks``).  At
    production scale replace localCheckpoint with reliable checkpointing
    to the cluster FS.
    """
    verts = (
        edges.select(F.col(src).alias("vertex"))
        .unionByName(edges.select(F.col(dst).alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy(F.col(src).alias("vertex")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    prev_ckpt = None
    for i in range(n_iter):
        with_deg = ranks.join(out_deg, "vertex", "left").localCheckpoint(eager=True)
        if prev_ckpt is not None:
            # The previous iteration's materialization is no longer
            # reachable once this one exists; free its blocks.
            prev_ckpt.unpersist()
        prev_ckpt = with_deg
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            edges.join(
                with_deg.filter(F.col("deg").isNotNull()).withColumnRenamed(
                    "vertex", "__src"
                ),
                F.col(src) == F.col("__src"),
            )
            .select(
                F.col(dst).alias("vertex"),
                (F.col("rank") / F.col("deg")).alias("contrib"),
            )
            .groupBy("vertex")
            .agg(F.sum("contrib").alias("in_rank"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            verts.join(contribs, "vertex", "left")
            .select(
                "vertex",
                (F.lit(base)
                 + F.lit(damping) * F.coalesce(F.col("in_rank"), F.lit(0.0))
                 ).alias("rank"),
            )
        )
    return ranks.select("vertex", F.round("rank", 8).alias("rank"))


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected co-purchase edges: distinct part pairs (a < b) appearing
    in the same order.  The self-join keys on l_orderkey, whose group
    sizes are the per-order line counts (TPC-H caps at 7) -- the pair
    blow-up is bounded per key, so the shuffle stays proportional to the
    input at any scale.
    """
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )


def triangle_participation(edges: DataFrame, k: int = 10) -> DataFrame:
    """Top-k vertices by triangle participation over an undirected edge
    list (edges normalized src < dst).  Triangles are enumerated once
    each via the ordered two-hop join: (a<b) |><| (b<c) |><| (a<c).

    Scale: all three legs join on a single vertex key; the classic
    degree-orientation refinement (orient each edge toward the
    higher-degree endpoint so wedge counts are bounded by arboricity)
    drops in by re-keying ``src/dst`` on (degree, id) order -- key-order
    orientation is kept here because it makes the enumeration (and the
    DuckDB oracle) deterministic, exact, and duplicate-free.  The final
    top-k is a TakeOrderedAndProject over per-vertex counts.
    """
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    verts = tri.select(
        F.explode(F.array("a", "b", "c")).alias("vertex")
    )
    return (
        verts.groupBy("vertex")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
        .orderBy(F.desc("triangles"), F.asc("vertex"))
        .limit(k)
    )
