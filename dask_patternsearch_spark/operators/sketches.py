"""Deterministic mergeable sketches: KMV distinct-count and explicit-
register HyperLogLog.

Spark ships HLL++/freq-items/GK builtins (registered as
``hll_sketch_users`` / ``approx_distinct_users`` /
``approx_percentiles_price``), but their binary sketch states are
implementation-defined -- unverifiable against any other engine and not
inspectable as data.  These operators take the opposite trade, the one a
100 TB corpus pipeline usually wants anyway:

* the hash is the engine-portable md5-prefix long (``dedup._md5_long``),
  so every register/minimum is a pure function of the data -- DuckDB
  replays the whole sketch bit-for-bit (oracle-checkable);
* sketch STATE IS A RELATION -- a (group, hashes array) row for KMV, a
  (group, bucket, rho) row set for HLL -- so it parquets, diffs,
  inspects, and MERGES with plain operators (``array_sort`` of a concat
  / ``max`` per register).  Mergeability is what makes a sketch useful
  at scale: per-shard sketches combine associatively into daily/global
  ones without touching raw data again (property-tested);
* estimator error is the textbook bound (KMV: ~1/sqrt(k); HLL:
  ~1.04/sqrt(m)).

Scale: building either sketch is one map-side-combinable aggregation on
(group, hash) -- the same shuffle an exact count-distinct pays at most;
the win is downstream: merged re-use without rescans, and bounded
per-group state (k longs / m bytes) where exact distinct state is
unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _md5_long

_HASH_BITS = 60  # _md5_long(col, 15)


def _k_smallest(hashed: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """k smallest distinct ``h`` per group as a sorted array.  The window
    runs over the sort-based shuffle (disk-spillable, bounded memory per
    task -- unlike a collect_set of every distinct hash, which is
    unbounded driver-of-the-group state); only the <= k survivors reach
    the final bounded collect."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("h")).alias("hashes"))
    )


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """(group..., hashes) rows: the ``k`` smallest distinct 60-bit md5
    hashes of ``key_col`` per group, ascending -- the KMV sketch state.

    Two-phase build: distinct (group, hash) dedupes with map-side
    combine, then a spill-safe per-group top-k.  Merging sketches =
    dedupe of the concat, re-top-k (:func:`kmv_merge`, associative)."""
    # NULL keys don't count toward a distinct estimate -- and engines
    # disagree on NULL sort position (Spark windows: first; DuckDB:
    # last), so they must never reach the top-k
    hashed = df.filter(F.col(key_col).isNotNull()).select(
        *group_cols, _md5_long(F.col(key_col).cast("string"), 15).alias("h")
    ).distinct()
    return _k_smallest(hashed, group_cols, k)


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 256) -> DataFrame:
    """Associative sketch union: k smallest of the deduped concat."""
    u = a.unionByName(b)
    hashed = u.select(*group_cols, F.explode("hashes").alias("h")).distinct()
    return _k_smallest(hashed, group_cols, k)


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate per group: exact count while the sketch
    holds fewer than k hashes, else ``(k-1) / h_(k)`` with hashes scaled
    to [0, 1) -- integer arithmetic up to one exact final division, so
    the estimate is bit-identical on any engine."""
    n = F.size("hashes")
    kth = F.element_at("hashes", k).cast("double") / F.lit(float(1 << _HASH_BITS))
    est = F.when(n < k, n.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / kth, 2)
    )
    return sketch.select(
        *[c for c in sketch.columns if c != "hashes"],
        n.alias("n_in_sketch"),
        est.alias("est_distinct"),
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    b: int = 10,
) -> DataFrame:
    """(group..., bucket, rho) rows: the explicit HyperLogLog register
    relation with m = 2^b registers.  bucket = low ``b`` hash bits; rho =
    position of the first set bit (from the MSB) of the remaining
    ``60-b`` bits, i.e. ``(60-b) - bit_length(w) + 1`` (``w = 0`` maps to
    ``60-b+1``); the register value is ``max(rho)``.  bit_length is
    spelled ``length(bin(w))`` -- exact integer arithmetic on both
    engines, no floats anywhere in the state.  Merging register
    relations is ``max`` per (group, bucket)."""
    m_mask = (1 << b) - 1
    w_bits = _HASH_BITS - b
    h = _md5_long(F.col(key_col).cast("string"), 15)
    w = F.shiftright(h, b)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) - F.length(F.conv(w.cast("string"), 10, 2)) + 1
    ).cast("int")
    return (
        df.filter(F.col(key_col).isNotNull())  # NULL keys count nowhere
        .select(
            *group_cols,
            h.bitwiseAND(F.lit(m_mask)).cast("int").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str], b: int = 10) -> DataFrame:
    """HLL estimate from the register relation.  The harmonic denominator
    is accumulated as the EXACT integer ``sum(2^(w_bits+1-rho))`` (each
    term a power of two <= 2^50; the BIGINT sum is order-independent, so
    engines agree bit-for-bit), with absent registers contributing
    ``2^(w_bits+1)`` (rho = 0).  Output: m, empty-register count, the
    exact integer denominator, and the alpha-corrected estimate (small
    range: linear counting) rounded to 1 decimal."""
    m = 1 << b
    w_bits = _HASH_BITS - b
    scale = w_bits + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {scale} - rho)")).alias("s_used"),
    )
    v = F.lit(m) - F.col("n_regs")  # empty registers
    s_int = F.col("s_used") + v.cast("long") * F.lit(1 << scale)
    raw = F.lit(alpha * m * m * float(1 << scale)) / s_int.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.lit(m).alias("m"),
        v.cast("long").alias("v_empty"),
        s_int.alias("denom_int"),
        F.round(est, 1).alias("est_distinct"),
    )
