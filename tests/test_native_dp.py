"""Native (C++) planner DP vs the numpy reference path: the two backends
must produce identical tables, identical backpointers, and identical
materialized growmaps (same first-maximum tie-breaking)."""

import time

import numpy as np
import pytest

from sequoia_tpu.planner.dp import choose_tree, fill_table, materialize, plan


def _rand_vector(rng, k):
    raw = np.sort(rng.uniform(0.0, 1.0, size=k))[::-1]
    raw = raw / (raw.sum() * rng.uniform(1.0, 2.0))
    return np.concatenate([[0.0], raw])


@pytest.fixture(scope="module")
def native_available():
    from sequoia_tpu.native import planner_dp_lib

    if planner_dp_lib() is None:
        pytest.skip("no native toolchain")
    return True


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_table_equality(native_available, seed):
    rng = np.random.default_rng(seed)
    p = _rand_vector(rng, 8)
    tn = fill_table(p, max_budget=24, max_depth=7, backend="numpy")
    tc = fill_table(p, max_budget=24, max_depth=7, backend="native")
    np.testing.assert_array_equal(tn.T, tc.T)
    np.testing.assert_array_equal(tn.Y, tc.Y)


def test_zero_tail_acceptance(native_available):
    # p with zero entries exercises the 0 * -inf = nan infeasibility path.
    p = np.array([0.0, 0.7, 0.2, 0.0, 0.0])
    tn = fill_table(p, max_budget=16, max_depth=6, backend="numpy")
    tc = fill_table(p, max_budget=16, max_depth=6, backend="native")
    np.testing.assert_array_equal(tn.T, tc.T)
    np.testing.assert_array_equal(tn.Y, tc.Y)


def test_same_growmap(native_available):
    rng = np.random.default_rng(7)
    p = _rand_vector(rng, 6)
    budgets = [1, 2, 4, 8, 16]
    times = [1.0, 1.0, 1.02, 1.06, 1.15]
    for backend in ["numpy", "native"]:
        table = fill_table(p, max_budget=16, max_depth=6, backend=backend)
        b, d, _, _ = choose_tree(table, budgets, times, 0.05)
        gm = materialize(table, b, d)
        if backend == "numpy":
            ref = gm
        else:
            assert gm.size == ref.size
            assert gm.successors == ref.successors
            np.testing.assert_array_equal(gm.depth, ref.depth)


def test_native_speed(native_available):
    """The native DP at a realistic offloading budget must finish fast (the
    reference's Python DP at B=128 takes ~10s; B=256 here in well under
    that)."""
    rng = np.random.default_rng(3)
    p = _rand_vector(rng, 16)
    t0 = time.perf_counter()
    fill_table(p, max_budget=256, max_depth=10, backend="native")
    dt = time.perf_counter() - t0
    assert dt < 5.0, f"native DP too slow: {dt:.1f}s"
