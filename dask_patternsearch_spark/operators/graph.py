"""Iterative graph analytics over edge DataFrames.

Connected components (see ``dedup.connected_components``) and PageRank
cover the two shapes every DataFrame-native graph engine needs: label
propagation to a fixpoint and damped score iteration.  Both run as plain
joins/aggregates with periodic ``localCheckpoint`` to truncate lineage --
the standard Spark iterative-algorithm pattern (each iteration would
otherwise append to one ever-growing plan).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


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
    # materialized once: every iteration's with_deg join consumes this
    # table, and AQE stage reuse does not span actions -- left lazy, the
    # degree aggregate (an edge-list shuffle) re-executed per iteration
    out_deg = edges.groupBy(F.col(src).alias("vertex")).agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=True)
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    prev_ckpt = None
    for i in range(n_iter):
        # the dangling-mass scalar rides the SAME job that materializes
        # the checkpoint (df.observe): one executed plan per iteration
        # instead of checkpoint + a separate dangling aggregate
        obs = Observation()
        with_deg = (
            ranks.join(out_deg, "vertex", "left")
            .observe(
                obs,
                F.coalesce(
                    F.sum(F.when(F.col("deg").isNull(), F.col("rank"))),
                    F.lit(0.0),
                ).alias("dangling"),
            )
            .localCheckpoint(eager=True)
        )
        if prev_ckpt is not None:
            # The previous iteration's materialization is no longer
            # reachable once this one exists; free its blocks.
            prev_ckpt.unpersist()
        prev_ckpt = with_deg
        dangling = obs.get["dangling"]
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
    in the same order.  Built without a self-join: one groupBy collects the
    per-order part set (TPC-H caps line counts at 7, so arrays stay tiny)
    and an array-transform expression emits the ordered pairs in-place --
    one shuffle on l_orderkey plus the edge distinct, versus the three a
    distinct/self-join/distinct pipeline costs (measured 3x at sf0.1).
    """
    pairs = F.flatten(
        F.expr(
            "transform(ps, (x, i) -> "
            "transform(slice(ps, i + 2, size(ps)), "
            "y -> struct(x AS src, y AS dst)))"
        )
    )
    return (
        lineitem.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .select(F.explode(pairs).alias("p"))
        .select("p.src", "p.dst")
        .distinct()
    )


def triangle_participation(edges: DataFrame, k: int = 10) -> DataFrame:
    """Top-k vertices by triangle participation over an undirected edge
    list (edges normalized src < dst), via degree-oriented wedge
    enumeration -- the MapReduce-era scalable formulation (Suri & Vassilvitskii
    WWW'11 / Cohen's MGT): orient every edge from its lower-(degree, id)
    endpoint to the higher one, enumerate the out-wedges of each vertex,
    and close them against the oriented edge set.

    Why orientation matters at scale: naive key-ordered two-hop joins
    generate ``sum(deg^2)`` wedge candidates, which a single celebrity
    vertex turns into a quadratic hot key.  Orientation caps every
    vertex's out-degree at O(sqrt(m)) regardless of its true degree, so
    the wedge volume is bounded by O(m^1.5) TOTAL and the per-key group
    by the arboricity -- the skew-proof variant.  Each triangle is
    enumerated exactly once (from its lowest-ordered corner).

    Wedges are never materialized as rows: per-vertex out-neighbor
    ARRAYS (bounded at O(sqrt(m)) each by the orientation) are broadcast
    onto the oriented edge list and each edge (u, v) closes its
    triangles with one ``array_intersect(N+(u), N+(v))`` -- each
    triangle {x<y<z} is found exactly once, at its base edge (x, y),
    as z in the intersection.  Per-vertex attribution is a single
    explode of (u, t), (v, t), and one row per intersection member --
    output volume 2|E| + 3*|triangles|, versus the wedge formulation's
    O(m^1.5) intermediate rows through a join.  The oriented edge list
    is materialized once (it feeds the adjacency build and the probe);
    at production scale persist to parquet instead, and past broadcast
    reach drop the hint -- the adjacency join degrades to a shuffled
    hash join with the skew already neutralized by the orientation.
    The final top-k is a TakeOrderedAndProject over per-vertex counts.
    """
    deg = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # build side chosen deliberately (the edge input is typically a
    # checkpointed RDD with no size statistics, and the planner was
    # observed broadcasting the EDGE LIST -- the big side -- instead):
    # deg is one row per vertex, strictly smaller than the adjacency
    # arrays this function already broadcasts below, so it shares their
    # posture; past broadcast reach drop both hints together and the
    # joins degrade to shuffled joins on uniformly-hashed vertex ids.
    with_deg = (
        edges.join(F.broadcast(deg.withColumnRenamed("v", "src")), "src")
        .withColumnRenamed("deg", "deg_src")
        .join(F.broadcast(deg.withColumnRenamed("v", "dst")), "dst")
        .withColumnRenamed("deg", "deg_dst")
    )
    fwd = F.struct(F.col("deg_src"), F.col("src")) < F.struct(
        F.col("deg_dst"), F.col("dst")
    )
    oriented = (
        with_deg.select(
            F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    adj = oriented.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
    e = (
        oriented.join(
            F.broadcast(adj.select("u", F.col("nbrs").alias("nu"))), "u"
        )
        .join(
            F.broadcast(
                adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nv"))
            ),
            "v",
            "left",  # v may have no out-neighbors
        )
        .withColumn(
            "common",
            F.array_intersect("nu", F.coalesce("nv", F.array().cast("array<bigint>"))),
        )
    )
    t = F.size("common")
    empty = F.array().cast("array<struct<vertex:bigint,n:bigint>>")
    contrib = F.when(
        t > 0,
        F.concat(
            F.transform(
                F.array("u", "v"),
                lambda x: F.struct(
                    x.cast("bigint").alias("vertex"), t.cast("bigint").alias("n")
                ),
            ),
            F.transform(
                "common",
                lambda w: F.struct(
                    w.cast("bigint").alias("vertex"),
                    F.lit(1).cast("bigint").alias("n"),
                ),
            ),
        ),
    ).otherwise(empty)
    return (
        e.select(F.explode(contrib).alias("c"))
        .groupBy(F.col("c.vertex").alias("vertex"))
        .agg(F.sum("c.n").cast("long").alias("triangles"))
        .orderBy(F.desc("triangles"), F.asc("vertex"))
        .limit(k)
    )


def bfs_distances(
    edges: DataFrame,
    source: int | None = None,
    max_hops: int = 4,
) -> DataFrame:
    """Hop distances from ``source`` over an undirected edge list, by
    frontier-expanding BFS -- the iterative-join pattern shared with
    :func:`pagerank` and ``dedup.connected_components`` (per-round
    localCheckpoint truncates lineage so round N never re-executes rounds
    1..N-1).

    ``source`` defaults to the smallest vertex id (deterministic).  Each
    round joins only the NEW frontier against the edge list -- the
    frontier is broadcast while it is small (it is, for the hop counts
    that matter) and the anti-join against settled vertices keeps the
    per-round work proportional to the unvisited boundary, so total work
    is O(hops * m) worst case, not O(hops * visited).
    """
    bi_obs = Observation()
    bi = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .observe(bi_obs, F.min("src").alias("min_src"))
        .localCheckpoint(eager=True)
    )
    if source is None:
        source = bi_obs.get["min_src"]
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(source), 0)], "vertex long, hops int"
    ).localCheckpoint(eager=True)
    frontier = dist
    for hop in range(1, max_hops + 1):
        # the frontier-size probe rides the checkpoint job via observe
        # (one executed job per hop); the accumulated distance table is a
        # lazy union of ALREADY-materialized frontiers -- re-checkpointing
        # the growing union every hop would rewrite all settled vertices
        # per round for no lineage benefit
        obs = Observation()
        nxt = (
            bi.join(
                F.broadcast(frontier.select(F.col("vertex").alias("src"))), "src"
            )
            .select(F.col("dst").alias("vertex"))
            .distinct()
            .join(dist.select("vertex"), "vertex", "left_anti")
            .withColumn("hops", F.lit(hop))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if obs.get["n"] == 0:
            break
        dist = dist.unionAll(nxt)
        frontier = nxt
    return dist.orderBy("hops", "vertex")


def label_propagation(
    edges: DataFrame,
    n_iter: int = 5,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007), made deterministic and oscillation-damped: every vertex
    adopts the most frequent label among its neighbors PLUS ITSELF, ties
    broken by the smallest label.  Including the self-label is the
    standard damping for the bipartite flip-flop of synchronous LPA, and
    the (count desc, label asc) vote makes every round a pure function of
    the previous labeling -- no rand(), reproducible at any partitioning.

    Scale: one round = one join of the label table against the edge list
    (vertex-keyed, high cardinality) + a (vertex, label) count + a
    min-struct argmax -- all shuffle-partitioned on vertex; lineage is cut
    per round with localCheckpoint exactly as pagerank/BFS do.  Returns
    (community, size, representative=min member) per community.
    """
    bi = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = (
        bi.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .localCheckpoint(eager=True)
    )
    prev = None
    for _ in range(n_iter):
        neighbor_votes = bi.join(
            labels.withColumnRenamed("vertex", "dst"), "dst"
        ).select(F.col("src").alias("vertex"), "label")
        votes = (
            neighbor_votes.unionAll(labels.select("vertex", "label"))
            .groupBy("vertex", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        new_labels = (
            votes.groupBy("vertex")
            .agg(F.min(F.struct((-F.col("n")).alias("neg"),
                                F.col("label").alias("l"))).alias("best"))
            .select("vertex", F.col("best.l").alias("label"))
            .localCheckpoint(eager=True)
        )
        if prev is not None:
            prev.unpersist()
        prev = labels
        labels = new_labels
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("size"),
            F.min("vertex").alias("representative"),
        )
        .orderBy(F.desc("size"), F.asc("community"))
    )


def sssp(
    edges: DataFrame,
    source: int | None = None,
    weight_col: str = "weight",
    max_iter: int = 10,
) -> DataFrame:
    """Single-source shortest paths over a weighted undirected edge list
    by distributed Bellman-Ford: each round relaxes every edge out of the
    current distance table (one vertex-keyed join + a min-combine), stops
    early when a round improves nothing.  Negative weights are rejected
    (undirected negative edges make shortest paths undefined).

    Scale: FRONTIER relaxation, the BFS posture applied to Bellman-Ford
    -- each round relaxes only the edges out of vertices whose distance
    strictly decreased last round (round k's table is the min over <= k
    hop paths either way: an improvement at round k must extend a vertex
    improved at round k-1, so the per-round tables are identical to
    full-edge relaxation, row for row).  The join and the min-combine
    shuffle therefore shrink with the frontier instead of staying
    O(|E|) per round.  The min-combine is a partial-aggregated groupBy
    carrying the node's previous distance through the SAME aggregate (a
    tagged union row), so the improved-distance convergence probe rides
    the checkpoint job via ``observe`` with no second join -- one
    exchange, one executed job per iteration.  The distance table is
    localCheckpoint-ed per round so round N never replays rounds 1..N-1.
    Rounds needed = shortest-path hop diameter, not |V|; if ``max_iter``
    rounds pass without reaching the fixpoint a warning is logged
    (distances are then upper bounds, not final).
    """
    # the negative-weight validation and the min-vertex default ride the
    # one job that materializes the bidirectional edge list
    bi_obs = Observation()
    bi = (
        edges.select("src", "dst", weight_col)
        .unionAll(
            edges.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                weight_col,
            )
        )
        .observe(
            bi_obs,
            F.coalesce(F.min(weight_col), F.lit(0.0)).alias("min_w"),
            F.min("src").alias("min_src"),
        )
        .localCheckpoint(eager=True)
    )
    if bi_obs.get["min_w"] < 0:
        raise ValueError("sssp requires non-negative weights")
    if source is None:
        source = bi_obs.get["min_src"]
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(source), 0.0, True)], "vertex long, dist double, imp boolean"
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        relaxed = (
            bi.join(
                dist.filter("imp")
                .select(F.col("vertex").alias("src"), "dist"),
                "src",
            )
            .select(
                F.col("dst").alias("vertex"),
                (F.col("dist") + F.col(weight_col)).alias("dist"),
            )
        )
        obs = Observation()
        # the node's previous distance rides the union as a tagged row
        # and comes back out of the SAME min-combine aggregate (each
        # vertex has at most one tagged row), so the improvement probe
        # needs no second join against the distance table -- one
        # exchange per round instead of two.  The carried ``imp`` flag
        # marks ANY strict decrease (no epsilon): sub-epsilon float
        # improvements still enter the next frontier, so the evolving
        # table matches full-edge relaxation bit for bit; the epsilon
        # stays on the STOP probe only, exactly as before.
        new = (
            dist.select("vertex", "dist", F.lit(True).alias("__old"))
            .unionByName(
                relaxed.select("vertex", "dist", F.lit(False).alias("__old"))
            )
            .groupBy("vertex")
            .agg(
                F.min("dist").alias("dist"),
                F.min(F.when(F.col("__old"), F.col("dist"))).alias("__prev"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(
                        F.col("__prev").isNull()
                        | (F.col("dist") < F.col("__prev") - 1e-12),
                        1,
                    ).otherwise(0)
                ).alias("improved"),
            )
            .select(
                "vertex",
                "dist",
                (
                    F.col("__prev").isNull()
                    | (F.col("dist") < F.col("__prev"))
                ).alias("imp"),
            )
            .localCheckpoint(eager=True)
        )
        improved = obs.get["improved"]
        prev = dist
        dist = new
        prev.unpersist()
        if improved == 0:
            converged = True
            break
    if not converged:
        logger.warning(
            "sssp: max_iter=%d exhausted before fixpoint; returned "
            "distances are upper bounds (raise max_iter to cover the "
            "graph's hop diameter)", max_iter,
        )
    return dist.select("vertex", F.round("dist", 6).alias("dist")).orderBy(
        "dist", "vertex"
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    max_iter: int = 20,
) -> DataFrame:
    """The k-core of an undirected graph: iteratively peel vertices of
    degree < k until none remain (Seidman 1983) -- the standard dense-
    subgraph extraction (spam rings, tight duplicate neighborhoods,
    community cores).  Returns surviving (vertex, core_degree).

    Scale: each peel round is one degree aggregate plus two semi-joins
    filtering the edge list to surviving endpoints -- all vertex-keyed,
    checkpoint-cut like the other fixpoint operators.  The fixpoint test
    rides the peel job itself via ``observe`` (directed-edge count
    unchanged <=> no vertex peeled <=> every survivor has degree >= k),
    so each round executes exactly ONE job -- no separate low-degree
    probe.  Rounds are bounded by the peel depth (graph degeneracy
    ordering length), far below |V| in practice; the edge list only ever
    shrinks.  If ``max_iter`` rounds pass without reaching the fixpoint
    a warning is logged (the result may then contain vertices outside
    the true k-core).
    """
    bi_obs = Observation()
    bi = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .observe(bi_obs, F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=True)
    )
    prev_m = bi_obs.get["m"]
    cur = bi
    converged = prev_m == 0
    for _ in range(max_iter):
        if converged:
            break
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        obs = Observation()
        nxt = (
            cur.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .observe(obs, F.count(F.lit(1)).alias("m"))
            .localCheckpoint(eager=True)
        )
        m = obs.get["m"]
        prev = cur
        cur = nxt
        if prev is not bi:
            prev.unpersist()
        if m == prev_m or m == 0:
            converged = True
        prev_m = m
    if not converged:
        logger.warning(
            "kcore: max_iter=%d exhausted before the peel fixpoint; the "
            "result may include vertices outside the true %d-core (raise "
            "max_iter to cover the graph's peel depth)", max_iter, k,
        )
    return (
        cur.groupBy(F.col("src").alias("vertex"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        .filter(F.col("core_degree") >= k)
        .orderBy("vertex")
    )
