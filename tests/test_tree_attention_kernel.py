"""Pallas tree-attention kernel vs the XLA einsum path (interpreter mode on
CPU; the compiled kernel is exercised on real TPU by bench/integration)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.core.model import forward
from sequoia_tpu.kernels.tree_attention import reference_attention, tree_attention
from sequoia_tpu.kvcache.cache import KVCache
from sequoia_tpu.ops import masks


@pytest.mark.parametrize("Q,Hkv,G,M", [(8, 2, 2, 64), (1, 4, 1, 32), (16, 2, 4, 128)])
def test_kernel_matches_reference(Q, Hkv, G, M):
    D = 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(Q, Hkv, G, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(M, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(M, Hkv, D)).astype(np.float32))
    mask = np.zeros((Q, M), bool)
    for i in range(Q):
        mask[i, : rng.integers(1, M)] = True
        mask[i, rng.integers(0, M)] = True
    mask = jnp.asarray(mask)
    ref = reference_attention(q, k, v, mask)
    got = tree_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_model_forward_pallas_matches_xla():
    cfg = get_config("test-tiny")
    # head_dim of test-tiny is 16; use a D=128-friendly config
    cfg = dataclasses.replace(cfg, head_dim=128)
    params = random_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    cfg_p = dataclasses.replace(cfg, attention_impl="pallas_interpret")
    tokens = jnp.asarray([5, 9, 2, 7, 11, 3, 8, 1], jnp.int32)
    pos = jnp.arange(8, dtype=jnp.int32)
    mask = masks.causal_mask(8, 64, 0)
    l0, kv0 = forward(params, cfg, tokens, pos, KVCache.init(cfg, 64, jnp.float32), 0, mask)
    l1, kv1 = forward(params, cfg_p, tokens, pos, KVCache.init(cfg, 64, jnp.float32), 0, mask)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kv0.k), np.asarray(kv1.k), rtol=1e-5, atol=1e-5)
