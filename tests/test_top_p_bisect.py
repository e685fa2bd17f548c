"""The sort-free bisection nucleus filter must select exactly the same
token set as the reference's sort-based filter (ties excepted)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequoia_tpu.ops.sampling import target_probs, top_p_filter


@pytest.mark.parametrize("top_p", [0.1, 0.5, 0.9, 0.99])
def test_bisect_matches_sort_filter(top_p):
    rng = np.random.default_rng(0)
    T = 0.6
    logits = jnp.asarray(rng.normal(size=(16, 500)).astype(np.float32) * 3)
    # sort-based reference path
    filtered = top_p_filter(logits, top_p, T)
    ref = jax.nn.softmax(filtered / T, axis=-1)
    # bisection path
    got = target_probs(logits, top_p, T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-7)


def test_bisect_keeps_top1_even_for_tiny_p():
    logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]])
    got = np.asarray(target_probs(logits, 0.01, 1.0))[0]
    assert got[1] == 1.0  # only the argmax survives
    assert got.sum() == 1.0
