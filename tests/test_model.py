"""Core model correctness: incremental KV decoding must match full-sequence
causal attention (the invariant behind the reference's storage-id scatter
design, `Engine/Llama_KV.py:84-85`)."""

import jax
import jax.numpy as jnp
import numpy as np

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.core.model import forward
from sequoia_tpu.kvcache.cache import KVCache
from sequoia_tpu.ops import masks

CFG = get_config("test-tiny")
MAX_LEN = 64


def _params(seed=0):
    return random_params(CFG, jax.random.PRNGKey(seed), dtype=jnp.float32)


def test_forward_shapes():
    params = _params()
    kv = KVCache.init(CFG, MAX_LEN, jnp.float32)
    tokens = jnp.arange(8, dtype=jnp.int32) % CFG.vocab_size
    pos = jnp.arange(8, dtype=jnp.int32)
    mask = masks.causal_mask(8, MAX_LEN, 0)
    logits, kv2 = forward(params, CFG, tokens, pos, kv, 0, mask)
    assert logits.shape == (8, CFG.vocab_size)
    assert logits.dtype == jnp.float32
    assert kv2.k.shape == (CFG.num_layers, MAX_LEN, CFG.num_kv_heads, CFG.head_dim_)
    # Rows beyond the write window are untouched.
    assert np.array_equal(np.asarray(kv2.k[:, 8:]), np.zeros_like(kv2.k[:, 8:]))


def test_incremental_matches_full():
    params = _params(1)
    rng = np.random.default_rng(0)
    T = 12
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, T), jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)

    kv_full = KVCache.init(CFG, MAX_LEN, jnp.float32)
    full_logits, _ = forward(
        params, CFG, tokens, pos, kv_full, 0, masks.causal_mask(T, MAX_LEN, 0)
    )

    kv = KVCache.init(CFG, MAX_LEN, jnp.float32)
    inc_logits = []
    for t in range(T):
        mask = (jnp.arange(MAX_LEN) <= t)[None, :]
        logits, kv = forward(params, CFG, tokens[t : t + 1], pos[t : t + 1], kv, t, mask)
        inc_logits.append(np.asarray(logits[0]))
    inc_logits = np.stack(inc_logits)
    np.testing.assert_allclose(np.asarray(full_logits), inc_logits, rtol=2e-4, atol=2e-4)


def test_chunked_matches_full():
    params = _params(2)
    rng = np.random.default_rng(1)
    T, C = 16, 4
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, T), jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)

    kv_full = KVCache.init(CFG, MAX_LEN, jnp.float32)
    full_logits, _ = forward(
        params, CFG, tokens, pos, kv_full, 0, masks.causal_mask(T, MAX_LEN, 0)
    )

    kv = KVCache.init(CFG, MAX_LEN, jnp.float32)
    outs = []
    for off in range(0, T, C):
        mask = masks.causal_mask(C, MAX_LEN, off)
        logits, kv = forward(
            params, CFG, tokens[off : off + C], pos[off : off + C], kv, off, mask
        )
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(full_logits), np.concatenate(outs), rtol=2e-4, atol=2e-4
    )


def test_gqa_grouping():
    """num_kv_heads < num_heads path produces same result as an equivalent
    MHA model with repeated KV weights."""
    import dataclasses

    cfg_gqa = CFG  # test-tiny already has 4 heads / 2 kv heads
    assert cfg_gqa.num_kv_heads < cfg_gqa.num_heads
    params = _params(3)
    # Build MHA config with kv weights repeated per group.
    cfg_mha = dataclasses.replace(cfg_gqa, num_kv_heads=cfg_gqa.num_heads)
    G = cfg_gqa.q_per_kv
    D = cfg_gqa.head_dim_
    L, E = cfg_gqa.num_layers, cfg_gqa.hidden_size

    def repeat_kv_w(w):  # [L, E, Hkv*D] -> [L, E, H*D]
        w = w.reshape(L, E, cfg_gqa.num_kv_heads, D)
        w = jnp.repeat(w, G, axis=2)
        return w.reshape(L, E, cfg_gqa.num_heads * D)

    params_mha = params._replace(
        layers=params.layers._replace(
            wk=repeat_kv_w(params.layers.wk), wv=repeat_kv_w(params.layers.wv)
        )
    )
    tokens = jnp.asarray([5, 9, 2, 7], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)
    mask = masks.causal_mask(4, MAX_LEN, 0)
    lg, _ = forward(params, cfg_gqa, tokens, pos, KVCache.init(cfg_gqa, MAX_LEN, jnp.float32), 0, mask)
    lm, _ = forward(params_mha, cfg_mha, tokens, pos, KVCache.init(cfg_mha, MAX_LEN, jnp.float32), 0, mask)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lm), rtol=1e-4, atol=1e-4)


def test_kv_commit_rows():
    """commit_rows (the split-cache replacement for same-buffer gather
    compaction, reference `gather_kv_incremental`) moves scratch rows into
    the main cache window and leaves everything else untouched."""
    kv = KVCache.init(CFG, 16, jnp.float32)
    marker = jnp.arange(16, dtype=jnp.float32)[None, :, None, None]
    kv = KVCache(k=kv.k + marker, v=kv.v + 100 + marker)
    scratch = KVCache.init(CFG, 8, jnp.float32)
    smarker = jnp.arange(50, 58, dtype=jnp.float32)[None, :, None, None]
    scratch = KVCache(k=scratch.k + smarker, v=scratch.v + smarker)
    out = kv.commit_rows(scratch, jnp.asarray([7, 1, 2]), 3)
    k = np.asarray(out.k[0, :, 0, 0])
    assert list(k[:3]) == [0, 1, 2]
    assert list(k[3:6]) == [57, 51, 52]
    assert list(k[6:]) == list(range(6, 16))
