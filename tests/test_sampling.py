"""Sampling / residual / nucleus-filter semantics vs an independent numpy
re-implementation of the reference math (`utils.py:5-77`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequoia_tpu.ops.sampling import (
    residual,
    sample_without_replacement,
    target_probs,
    top_p_filter,
)


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def test_residual_basic():
    p = jnp.asarray([0.5, 0.3, 0.2])
    q = jnp.asarray([0.2, 0.5, 0.3])
    r = np.asarray(residual(p, q))
    expect = np.asarray([0.3, 0.0, 0.0])
    expect = expect / expect.sum()
    np.testing.assert_allclose(r, expect, rtol=1e-6)


def test_residual_nan_when_p_le_q():
    # p <= q everywhere -> zero mass -> NaN row (terminal guard semantics,
    # Tree/SpecTree.py:219-220).
    p = jnp.asarray([0.5, 0.5])
    r = np.asarray(residual(p, p))
    assert np.isnan(r).all()


def _ref_top_p(logits, top_p, T):
    """Literal numpy transcription of get_sampling_logits (utils.py:65-77)."""
    logits = logits.copy()
    if top_p >= 1.0:
        return logits
    order = np.argsort(-logits, axis=-1, kind="stable")
    sorted_logits = np.take_along_axis(logits, order, axis=-1)
    cum = np.cumsum(_softmax(sorted_logits / T), axis=-1)
    filt = cum > top_p
    filt[..., 1:] = filt[..., :-1].copy()
    filt[..., 0] = False
    remove = np.zeros_like(filt)
    np.put_along_axis(remove, order, filt, axis=-1)
    logits[remove] = -np.inf
    return logits


@pytest.mark.parametrize("top_p", [0.3, 0.9, 1.0])
def test_top_p_filter_matches_reference(top_p):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(5, 50)).astype(np.float32) * 3
    ours = np.asarray(top_p_filter(jnp.asarray(logits), top_p, 0.6))
    ref = _ref_top_p(logits, top_p, 0.6)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_target_probs_sum_to_one():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    p = np.asarray(target_probs(logits, 0.8, 0.6))
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)
    assert (p >= 0).all()


def test_without_replacement_distinct_and_ordered_marginal():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.log([0.6, 0.25, 0.1, 0.05]).astype(np.float32))
    N = 4000
    keys = jax.random.split(key, N)
    draws = jax.vmap(lambda k: sample_without_replacement(k, logits, 1.0, 3))(keys)
    draws = np.asarray(draws)
    # All draws distinct within a sample.
    for row in draws[:200]:
        assert len(set(row.tolist())) == 3
    # First draw marginal ~ q.
    first = draws[:, 0]
    freq = np.bincount(first, minlength=4) / N
    np.testing.assert_allclose(freq, [0.6, 0.25, 0.1, 0.05], atol=0.04)
