"""Sampling operators for training-data pipelines.

Large-corpus training runs need reproducible downsampling: per-class
balancing (cap each language/source/quality bucket), Bernoulli rate
sampling per stratum, and deterministic selection so a re-run of the
pipeline picks the same rows.  The reference engine has no sampling; these
are the Spark-native building blocks.

Scale notes: ``stratified_sample`` is a scan-side filter (zero shuffles --
each task coin-flips its own rows); ``exact_stratified_sample`` costs one
shuffle on the stratum key and keeps per-task state O(n_per_stratum) via
rank-then-filter.  Determinism comes from hashing a caller-named unique
key, NEVER from ``rand()`` ordering (rand's value depends on the stage's
partition layout, so it is not stable across cluster sizes -- a 32-core
dev run and a 1000-executor run must pick the same sample).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 0,
) -> DataFrame:
    """Bernoulli sampling with a per-stratum rate (``sampleBy``): keep each
    row of stratum ``s`` with probability ``fractions[s]`` (strata absent
    from the dict are dropped).  Zero shuffles; row counts are binomial,
    not exact -- use :func:`exact_stratified_sample` for hard caps."""
    return df.sampleBy(strata_col, fractions, seed)


def _det_order(key_cols: list[str], seed: int) -> Column:
    # xxhash64 of (seed, *key) -- a stable pseudo-random total order that
    # does not depend on partitioning, task layout or row order
    return F.xxhash64(F.lit(seed), *[F.col(c) for c in key_cols])


def exact_stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_cols: list[str],
    seed: int = 0,
    n_salts: int = 32,
    order_expr: Column | None = None,
) -> DataFrame:
    """Exactly ``min(n_per_stratum, |stratum|)`` rows per stratum, chosen
    pseudo-randomly but deterministically: rows are ranked inside each
    stratum by ``xxhash64(seed, *key_cols)`` and the top N kept.

    ``key_cols`` must uniquely identify rows (ties in the hash order would
    otherwise make the cut nondeterministic).

    Scale: strata are typically FEW (languages, sources, quality buckets),
    so a single per-stratum window would drag a whole stratum through one
    task.  Ranking is therefore two-level (same containment argument as
    ``text.source_quota_cap``): a salted pre-rank keeps each
    (stratum, salt) bucket's top ``n_per_stratum`` in ``n_salts`` parallel
    windows, then the exact rank runs over at most ``n_salts * n``
    survivors per stratum.  Output is identical to the single-window
    spelling; determinism is unchanged (the salt itself is a key hash).
    """
    # order_expr swaps the ranking hash for an engine-portable one (e.g.
    # md5) when the cut must be reproducible OUTSIDE Spark; the salt stays
    # xxhash64 -- it only routes rows to pre-rank buckets and cancels out
    # of the result
    order = order_expr if order_expr is not None else _det_order(key_cols, seed)
    salt = F.pmod(F.xxhash64(F.lit(seed + 1), *[F.col(c) for c in key_cols]),
                  F.lit(n_salts))
    tag, pre, s = "__dps_rank", "__dps_prerank", "__dps_salt"
    w1 = Window.partitionBy(strata_col, s).orderBy(
        order, *[F.col(c) for c in key_cols]
    )
    w2 = Window.partitionBy(strata_col).orderBy(
        order, *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn(s, salt)
        .withColumn(pre, F.row_number().over(w1))
        .filter(F.col(pre) <= n_per_stratum)
        .withColumn(tag, F.row_number().over(w2))
        .filter(F.col(tag) <= n_per_stratum)
        .drop(tag, pre, s)
    )


def deterministic_split(
    df: DataFrame,
    weights: dict[str, float],
    key_cols: list[str],
    seed: int = 0,
) -> dict[str, DataFrame]:
    """Disjoint, exhaustive, deterministic train/val/test-style split.

    Each row lands in exactly one named bucket with probability
    proportional to its weight, decided by the row's own key hash -- so the
    split is stable under re-runs, repartitioning and cluster resizing
    (unlike ``randomSplit``, which depends on partition layout).  Zero
    shuffles: every bucket is a filter over the same scan."""
    total = float(sum(weights.values()))
    # map the hash to [0, 1) -- pmod keeps it positive
    u = F.pmod(_det_order(key_cols, seed), F.lit(1 << 32)) / F.lit(float(1 << 32))
    out: dict[str, DataFrame] = {}
    lo = 0.0
    names = list(weights)
    for i, name in enumerate(names):
        hi = lo + weights[name] / total
        cond = (u >= F.lit(lo)) & ((u < F.lit(hi)) if i < len(names) - 1 else F.lit(True))
        out[name] = df.filter(cond)
        lo = hi
    return out


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Weighted reservoir sampling without replacement (Efraimidis &
    Spirakis A-ES, IPL 2006): rank every row by ``ln(u) / w`` with
    ``u ~ U(0,1]`` and keep the top ``k`` -- inclusion probability is
    proportional to weight, exactly the distribution a sequential weighted
    reservoir draws.

    Determinism: ``u`` is derived from ``md5(seed | key)``, never
    ``rand()`` (same argument as :func:`exact_stratified_sample` -- the
    sample must be identical across partitionings and cluster sizes, and
    md5 keeps the cut reproducible outside Spark).  The 13 hex chars give
    52 uniform bits, exact in a double; ``+1`` keeps ``u`` strictly
    positive so ``ln`` is finite.

    Scale: one scan, no shuffle beyond the global top-k, which Spark
    executes as TakeOrderedAndProject (per-partition heaps of size k, then
    a k-row merge on the driver) -- never a full sort.
    """
    h = F.md5(F.concat_ws("|", F.lit(seed), *[F.col(c) for c in key_cols]))
    u = (F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + 1.0) / F.lit(
        float(2**52)
    )
    es_key = F.log(u) / F.col(weight_col)
    return (
        df.withColumn("es_key", _snap_significant(es_key))
        .orderBy(F.desc("es_key"), *[F.col(c) for c in key_cols])
        .limit(k)
    )


def _snap_significant(col, sig: int = 9):
    """Snap a double to ``sig`` SIGNIFICANT digits -- relative precision,
    so cross-engine libm last-ulp drift in ln() cannot flip the sort while
    the key's real ordering information survives at ANY weight magnitude.
    (A fixed decimal-place round degenerates: for weights above ~1e6 the
    A-ES key magnitude drops below the rounding grain and most keys
    collapse to ties, turning the weighted draw into key-order.)  Uses the
    floor(x*p+0.5)/p half-up spelling with p = 10^(sig-1 - floor(log10|x|))
    -- expressible identically in Spark and DuckDB."""
    mag = F.floor(F.log10(F.abs(col)))
    p = F.pow(F.lit(10.0), F.lit(float(sig - 1)) - mag)
    return F.when(col == 0, F.lit(0.0)).otherwise(
        F.floor(col * p + F.lit(0.5)) / p
    )


def stratified_weighted_sample(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    n_per_stratum: int,
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Per-stratum weighted reservoir sampling: :func:`weighted_sample`'s
    A-ES key (``ln(u)/w``, md5 uniforms), ranked WITHIN each stratum by
    :func:`exact_stratified_sample`'s salted two-level window (same
    containment argument: a hot stratum never drags through one task).
    The per-language weighted downsample of a mixture pipeline.

    ``es_key`` rides along in the output so the cut is auditable.
    """
    h = F.md5(F.concat_ws("|", F.lit(seed), *[F.col(c) for c in key_cols]))
    u = (F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + 1.0) / F.lit(
        float(2**52)
    )
    es = _snap_significant(F.log(u) / F.col(weight_col))
    # exact_stratified_sample ranks ASCENDING on order_expr; negate the
    # A-ES key so the largest keys (the winners) rank first
    return exact_stratified_sample(
        df.withColumn("es_key", es),
        strata_col,
        n_per_stratum,
        key_cols,
        seed=seed,
        order_expr=-F.col("es_key"),
    )
