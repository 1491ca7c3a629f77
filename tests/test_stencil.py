"""Stencil stream invariants (reference stencil.py semantics; the exact
step-for-step parity vs the reference was verified by running both
side-by-side for 400 steps at dims in {1,2,3,5} -- see SURVEY.md 3.4)."""

import itertools

import numpy as np

from dask_patternsearch_spark.stencil import SimplexStencil


def take(n, dims=2, max_halvings=8):
    s = SimplexStencil(dims, max_halvings)
    return list(itertools.islice(s.steps(), n))


def test_poll_set_first():
    # first 2*dims steps are the +/- unit axis steps (the poll set)
    for dims in (1, 2, 3, 5):
        steps = take(2 * dims, dims=dims)
        got = sorted(tuple(st.offset.tolist()) for st in steps)
        want = []
        for i in range(dims):
            for sign in (1.0, -1.0):
                v = [0.0] * dims
                v[i] = sign
                want.append(tuple(v))
        assert got == sorted(want)
        assert all(st.extra_halvings == 0 for st in steps)


def test_known_prefix_2d():
    # documented reference output (SURVEY.md 3.4): after the axes come the
    # halved contraction steps, then the doubled reflections
    steps = take(8)
    flat = [(tuple(s.offset.tolist()), s.extra_halvings) for s in steps]
    assert flat[:4] == [((1.0, 0.0), 0), ((0.0, 1.0), 0), ((-1.0, 0.0), 0), ((0.0, -1.0), 0)]
    assert ((0.5, 0.0), 1) in flat[4:]
    assert ((-2.0, 0.0), -1) in flat[4:]


def test_no_duplicate_positions():
    steps = take(300)
    keys = {s.offset.tobytes() for s in steps}
    assert len(keys) == 300


def test_lattice_alignment():
    mh = 6
    grid = 2.0 ** (-mh - 1)
    for s in take(200, dims=3, max_halvings=mh):
        assert np.allclose(np.round(s.offset / grid) * grid, s.offset)


def test_replay_cache():
    s = SimplexStencil(2, 8)
    a = [st.offset.tobytes() for st in itertools.islice(s.steps(), 50)]
    b = [st.offset.tobytes() for st in itertools.islice(s.steps(), 50)]
    assert a == b
