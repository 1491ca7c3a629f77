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
