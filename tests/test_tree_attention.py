"""Flash tree-attention kernel == XLA einsum attention (main ∪ scratch
softmax), on CPU via Pallas interpret mode."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sequoia_tpu.kernels.tree_attention import tree_attention

NEG_INF = float("-inf")


def _reference(q, k, v, bias, sk, sv, bias_scr, g, scale):
    Q, H, D = q.shape
    Hkv = k.shape[1]
    qg = q.reshape(Q, Hkv, g, D)
    scores = jnp.einsum("qhgd,mhd->hgqm", qg, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias[None, None, :, :]
    scores_scr = jnp.einsum("qhgd,shd->hgqs", qg, sk,
                            preferred_element_type=jnp.float32) * scale
    scores_scr = scores_scr + bias_scr[None, None, :, :]
    M = scores.shape[-1]
    full = jax.nn.softmax(jnp.concatenate([scores, scores_scr], axis=-1), axis=-1)
    probs, probs_scr = full[..., :M], full[..., M:]
    attn = jnp.einsum("hgqm,mhd->qhgd", probs.astype(q.dtype), v) + jnp.einsum(
        "hgqs,shd->qhgd", probs_scr.astype(q.dtype), sv)
    return attn.reshape(Q, H, D)


def _mk(Q, M, S, Hkv, g, D, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    H = Hkv * g
    q = jnp.asarray(rng.standard_normal((Q, H, D)), dtype)
    k = jnp.asarray(rng.standard_normal((M, Hkv, D)), dtype)
    v = jnp.asarray(rng.standard_normal((M, Hkv, D)), dtype)
    sk = jnp.asarray(rng.standard_normal((S, Hkv, D)), dtype)
    sv = jnp.asarray(rng.standard_normal((S, Hkv, D)), dtype)
    # Tree-ish masks: queries see a causal prefix of main + random scratch
    # ancestors (always at least themselves).
    mask = rng.random((Q, M)) < 0.7
    mask[:, 0] = True
    smask = np.tril(np.ones((Q, S), bool))[:, :S]
    bias = jnp.where(jnp.asarray(mask), 0.0, NEG_INF).astype(jnp.float32)
    bias_scr = jnp.where(jnp.asarray(smask), 0.0, NEG_INF).astype(jnp.float32)
    return q, k, v, bias, sk, sv, bias_scr


@pytest.mark.parametrize(
    "Q,M,S,Hkv,g,block_m",
    [
        (16, 64, 16, 4, 1, 32),     # MHA, multiple main blocks
        (8, 32, 8, 2, 4, 32),       # GQA g=4
        (13, 48, 11, 3, 1, 32),     # ragged sizes exercise padding
        (24, 40, 24, 2, 2, 64),     # block_m > M (single main block)
    ],
)
def test_matches_einsum(Q, M, S, Hkv, g, block_m):
    D = 16
    q, k, v, bias, sk, sv, bias_scr = _mk(Q, M, S, Hkv, g, D)
    scale = D ** -0.5
    got = tree_attention(q, k, v, bias, sk, sv, bias_scr, g=g, scale=scale,
                         block_m=block_m, interpret=True)
    want = _reference(q, k, v, bias, sk, sv, bias_scr, g, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fully_masked_main_region():
    """Rows that only attend inside the scratch (fresh-tree regime) must not
    produce NaNs from the masked main blocks."""
    Q, M, S, Hkv, g, D = 8, 64, 8, 2, 1, 16
    q, k, v, bias, sk, sv, bias_scr = _mk(Q, M, S, Hkv, g, D, seed=3)
    bias = jnp.full_like(bias, NEG_INF)  # no main attention at all
    got = tree_attention(q, k, v, bias, sk, sv, bias_scr, g=g,
                         scale=D ** -0.5, block_m=32, interpret=True)
    want = _reference(q, k, v, jnp.full_like(bias, -1e30), sk, sv, bias_scr,
                      g, D ** -0.5)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bf16_inputs():
    Q, M, S, Hkv, g, D = 16, 64, 16, 2, 2, 32
    q, k, v, bias, sk, sv, bias_scr = _mk(Q, M, S, Hkv, g, D, seed=5,
                                          dtype=jnp.bfloat16)
    got = tree_attention(q, k, v, bias, sk, sv, bias_scr, g=g,
                         scale=D ** -0.5, block_m=32, interpret=True)
    want = _reference(q, k, v, bias, sk, sv, bias_scr, g, D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)
