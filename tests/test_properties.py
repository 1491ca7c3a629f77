"""Property-based tests (hypothesis) for the pure driver-side math:
stencil structure, lattice snapping, rolling-hash fold, chunked shuffle.
These run without a SparkSession, so they are cheap enough to sweep
dimensions and seeds broadly.
"""

from itertools import islice

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dask_patternsearch_spark.search import _chunked_shuffle
from dask_patternsearch_spark.stencil import SimplexStencil


@settings(max_examples=25, deadline=None)
@given(dims=st.integers(1, 8), max_halvings=st.integers(1, 12))
def test_poll_set_is_axis_steps(dims, max_halvings):
    """The first 2*dims steps must be the +/- unit axis steps — the poll
    set on which the contraction gate's convergence guarantee rests."""
    stencil = SimplexStencil(dims, max_halvings)
    seen = set()
    for step in islice(stencil.steps(), 2 * dims):  # steps() is infinite
        off = step.offset
        nz = np.nonzero(off)[0]
        assert len(nz) == 1, f"poll step not axis-aligned: {off}"
        assert abs(off[nz[0]]) == 1.0
        assert step.extra_halvings == 0
        seen.add((int(nz[0]), float(np.sign(off[nz[0]]))))
    assert len(seen) == 2 * dims  # all distinct axes and signs


@settings(max_examples=15, deadline=None)
@given(dims=st.integers(1, 5), max_halvings=st.integers(2, 8), n=st.integers(10, 120))
def test_stencil_steps_unique_on_lattice(dims, max_halvings, n):
    """No duplicate lattice positions are ever yielded (the dedup that
    bounds evaluation count), and every offset is lattice-aligned."""
    stencil = SimplexStencil(dims, max_halvings)
    grid = 2.0 ** -(max_halvings + 1)
    keys = set()
    count = 0
    for step in islice(stencil.steps(), n):
        snapped = np.round(step.offset / grid) * grid
        assert np.array_equal(snapped, step.offset), "offset off-lattice"
        keys.add(step.offset.tobytes())
        count += 1
    assert len(keys) == count  # no duplicate lattice positions yielded


@settings(max_examples=20, deadline=None)
@given(dims=st.integers(1, 6), max_halvings=st.integers(2, 8))
def test_stencil_deterministic(dims, max_halvings):
    a = SimplexStencil(dims, max_halvings)
    b = SimplexStencil(dims, max_halvings)
    for sa, sb in zip(islice(a.steps(), 60), islice(b.steps(), 60)):
        assert np.array_equal(sa.offset, sb.offset)
        assert sa.extra_halvings == sb.extra_halvings


@settings(max_examples=25, deadline=None)
@given(
    dims=st.integers(1, 6),
    n=st.integers(0, 100),
    seed=st.integers(0, 2**31 - 1),
)
def test_chunked_shuffle_preserves_multiset_and_poll_prefix(dims, n, seed):
    """Randomized exploration must (a) keep exactly the same steps and
    (b) keep the first 2*dims steps within the first chunk, preserving the
    poll set (reference op #16 contract)."""
    items = list(range(n))
    rng = np.random.default_rng(seed)
    out = list(_chunked_shuffle(iter(items), dims, rng))
    assert sorted(out) == items
    first = 2 * dims
    assert sorted(out[:first]) == items[:first]


@settings(max_examples=30, deadline=None)
@given(
    x=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=8),
    max_halvings=st.integers(1, 14),
)
def test_grid_snap_idempotent_and_exact(x, max_halvings):
    """Snapping is idempotent and snapped values hash/compare exactly —
    the property that makes the dedup memo sound."""
    stepsize = np.ones(len(x))
    grid = stepsize / 2.0**max_halvings
    v = np.array(x)
    s1 = np.round(v / grid) * grid
    s2 = np.round(s1 / grid) * grid
    assert s1.tobytes() == s2.tobytes()


# ---------------------------------------------------------------------------
# randomized equivalence for the non-equi join operators (needs Spark; few
# examples, tiny frames -- the point is adversarial shapes: empty sides,
# boundary timestamps, intervals spanning 0..many buckets)
# ---------------------------------------------------------------------------

def _unique_ts_rows(draw, st, keys, n, lo=-20, hi=50):
    rows = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(lo, hi)),
            min_size=0, max_size=n, unique=True,
        )
    )
    return rows


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_asof_join_matches_python_reference(spark, data):
    keys = [1, 2, 3]
    left_rows = _unique_ts_rows(data.draw, st, keys, 12)
    right_rows = _unique_ts_rows(data.draw, st, keys, 12)
    tol = data.draw(st.one_of(st.none(), st.integers(0, 30)))
    direction = data.draw(st.sampled_from(["backward", "forward"]))

    from dask_patternsearch_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)] or [(99, 0, -1)],
        "k long, t long, lid long",
    )
    right = spark.createDataFrame(
        [(k, t, t * 10 + k) for (k, t) in right_rows] or [(98, 0, 0)],
        "k long, rt long, val long",
    )
    got = {
        r["lid"]: (r["rt"], r["val"])
        for r in asof_join(
            left, right, "k", "t", "rt", direction=direction, tolerance=tol
        ).collect()
    }
    rights = {}
    for (k, t) in right_rows:
        rights.setdefault(k, []).append(t)
    for i, (k, t) in enumerate(left_rows or []):
        if direction == "backward":
            cand = [rt for rt in rights.get(k, []) if rt <= t]
            best = max(cand) if cand else None
            dist = t - best if best is not None else None
        else:
            cand = [rt for rt in rights.get(k, []) if rt >= t]
            best = min(cand) if cand else None
            dist = best - t if best is not None else None
        if best is None or (tol is not None and dist > tol):
            want = (None, None)
        else:
            want = (best, best * 10 + k)
        assert got[i] == want, (i, k, t, direction, tol)


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_range_join_matches_python_reference(spark, data):
    pts = data.draw(st.lists(st.integers(-30, 80), min_size=0, max_size=15))
    ivs = data.draw(
        st.lists(
            st.tuples(st.integers(-40, 80), st.integers(0, 60)),
            min_size=0, max_size=8,
        )
    )
    width = data.draw(st.sampled_from([1.0, 3.0, 7.5, 40.0]))

    from dask_patternsearch_spark.operators.joins import range_join

    points = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(pts)] or [(-1, 1e9)],
        "pid long, x double",
    )
    intervals = spark.createDataFrame(
        [(j, float(lo), float(lo + ln)) for j, (lo, ln) in enumerate(ivs)]
        or [(-1, 0.0, 0.0)],
        "iid long, lo double, hi double",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "x", "lo", "hi", bucket_width=width
        ).collect()
    }
    want = {
        (i, j)
        for i, x in enumerate(pts)
        for j, (lo, ln) in enumerate(ivs)
        if lo <= x < lo + ln
    }
    assert got == want


def test_results_invariant_under_shuffle_partitioning(spark):
    """Query answers must not depend on spark.sql.shuffle.partitions --
    the determinism contract that makes oracle hashes meaningful on any
    cluster size.  Checked on queries whose plans shuffle: window binning
    (pack), merge-join formulation (asof), and a multi-join agg (q8)."""
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    names = ["pack_context_bins", "asof_join_purchase_click", "q8_market_share"]
    qs = entry.queries()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                df = qs[n](spark, SF_DIR)
                results.setdefault(n, []).append(
                    sorted(map(tuple, df.collect()))
                )
        for n, (a, b) in results.items():
            assert a == b, f"{n} changed under repartitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


@settings(max_examples=50, deadline=None)
@given(
    ids=st.lists(st.integers(0, 10**6), min_size=0, max_size=300, unique=True),
    k=st.integers(1, 10),
    n_salts=st.integers(1, 16),
    seed=st.integers(0, 5),
)
def test_two_level_cap_containment(ids, k, n_salts, seed):
    """The salted two-level top-k (source_quota_cap / exact stratified
    sampling) must equal the direct top-k: every bucket keeps ITS k
    smallest in the deterministic hash order, and the global k smallest
    fall into at most k buckets, each of which keeps them -- so the
    level-2 rank over the survivors reproduces the single-window answer
    for ANY id set, k, and salt count."""
    import hashlib

    def h(x):  # the deterministic pseudo-random total order
        return hashlib.md5(f"{seed}:{x}".encode()).hexdigest()

    direct = sorted(ids, key=h)[:k]
    buckets: dict[int, list] = {}
    for x in ids:
        buckets.setdefault(hash((seed + 1, x)) % n_salts, []).append(x)
    survivors = [x for b in buckets.values() for x in sorted(b, key=h)[:k]]
    assert sorted(survivors, key=h)[:k] == direct


@settings(max_examples=60, deadline=None)
@given(
    sizes=st.lists(st.integers(0, 50), min_size=1, max_size=8),
    budget=st.integers(0, 120),
    seq=st.lists(st.integers(0, 7), min_size=1, max_size=40),
)
def test_worker_bloom_lru_invariants(sizes, budget, seq):
    """The worker-process bloom file cache is TRANSPARENT (served rows
    always equal the backing read, any access order), its byte ledger
    always equals the sum of cached entries and never exceeds the
    budget, it never re-reads a resident path, and the most recent
    fitting path is always resident (eviction is oldest-first and never
    evicts the incoming entry)."""
    from dask_patternsearch_spark.operators import dedup

    backing = {
        f"/syn/pfx=aa/part-{i}.parquet": [("aa", 8 * max(n, 1), b"x" * n)]
        for i, n in enumerate(sizes)
    }
    reads = []

    def fake_read(path):
        reads.append(path)
        return backing[path]

    orig_read = dedup._bloom_read_rows
    orig_max = dedup._WORKER_BLOOM_MAX_BYTES
    dedup._bloom_read_rows = fake_read
    dedup._WORKER_BLOOM_MAX_BYTES = budget
    dedup._WORKER_BLOOM_CACHE.clear()
    dedup._WORKER_BLOOM_CACHE_BYTES[0] = 0
    try:
        for j in seq:
            path = list(backing)[j % len(backing)]
            resident_before = path in dedup._WORKER_BLOOM_CACHE
            n_reads = len(reads)
            rows = dedup._worker_bloom_rows([path])
            assert rows == [(m, b) for _p, m, b in backing[path]]
            # no re-read of a resident path; exactly one read otherwise
            assert len(reads) == n_reads + (0 if resident_before else 1)
            nbytes = sum(len(b) for _p, _m, b in backing[path])
            cache, ledger = dedup._WORKER_BLOOM_CACHE, \
                dedup._WORKER_BLOOM_CACHE_BYTES[0]
            assert ledger == sum(n for n, _r in cache.values())
            assert ledger <= budget
            if nbytes <= budget:
                assert path in cache  # the incoming entry is never evicted
                assert next(reversed(cache)) == path  # recency order
            else:
                assert path not in cache  # over-budget: served uncached
    finally:
        dedup._bloom_read_rows = orig_read
        dedup._WORKER_BLOOM_MAX_BYTES = orig_max
        dedup._WORKER_BLOOM_CACHE.clear()
        dedup._WORKER_BLOOM_CACHE_BYTES[0] = 0
