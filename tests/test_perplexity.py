"""Perplexity tool: exactness on a degenerate model, padding invariance,
and the int8-quantization delta bound (the BASELINE.md quality gate)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.quant.quantize import quantize_model
from sequoia_tpu.tools.perplexity import evaluate


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("test-tiny")
    params = random_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, size=(4, 48)).astype(np.int32)
    lengths = np.asarray([48, 40, 33, 17])
    return cfg, params, ids, lengths


def test_uniform_model_nll_is_log_vocab(setup):
    cfg, params, ids, lengths = setup
    zeroed = params._replace(
        lm_head=jnp.zeros_like(params.lm_head))
    res = evaluate(zeroed, cfg, ids, lengths, chunk=16)
    assert res.tokens == int((lengths - 1).sum())
    np.testing.assert_allclose(res.nll, np.log(cfg.vocab_size), rtol=1e-5)


def test_padding_and_chunk_invariance(setup):
    cfg, params, ids, lengths = setup
    a = evaluate(params, cfg, ids, lengths, chunk=16)
    # Extra pad columns must not change the score; nor must chunking.
    wide = np.concatenate([ids, np.zeros((4, 16), np.int32)], axis=1)
    b = evaluate(params, cfg, wide, lengths, chunk=64)
    np.testing.assert_allclose(a.nll, b.nll, rtol=1e-4)
    assert a.tokens == b.tokens


def test_int8_quantization_delta_small(setup):
    cfg, params, ids, lengths = setup
    base = evaluate(params, cfg, ids, lengths, chunk=16)
    q8 = evaluate(quantize_model(params, bits=8), cfg, ids, lengths, chunk=16)
    # int8 per-channel weight quantization barely moves NLL.
    assert abs(q8.nll - base.nll) < 0.05 * max(base.nll, 1.0)
    q4 = evaluate(quantize_model(params, bits=4), cfg, ids, lengths, chunk=16)
    # int4 drifts more but must stay finite/sane on a tiny random model.
    assert np.isfinite(q4.nll)
