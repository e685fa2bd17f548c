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


@pytest.mark.parametrize("top_p", [0.1, 0.5, 0.9, 0.99])
def test_fused_kernel_matches_xla_threshold(top_p):
    """The Pallas kernel (interpret mode on CPU) must produce the identical
    inclusive threshold as the XLA bisection at awkward shapes (row/lane
    padding paths included)."""
    from sequoia_tpu.kernels.top_p import top_p_threshold_fused
    from sequoia_tpu.ops.sampling import top_p_threshold

    rng = np.random.default_rng(1)
    for rows, vocab in [(1, 500), (7, 1000), (16, 384), (13, 130)]:
        logits = rng.normal(size=(rows, vocab)).astype(np.float32) * 3
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        want = np.asarray(top_p_threshold(jnp.asarray(probs), top_p))
        got = np.asarray(
            top_p_threshold_fused(jnp.asarray(probs), top_p, interpret=True)
        )
        np.testing.assert_array_equal(got, want, err_msg=f"{rows}x{vocab}")
        # thresholds select a non-empty nucleus
        kept = (probs >= got[:, None]).sum(-1)
        assert (kept >= 1).all()
