"""int8/int4 KV caches (KVCache8/KVCache4): numerical closeness to the float
cache, pack/unpack exactness, scale movement under compaction, and the engine
end-to-end with kv_quant."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.core.model import forward
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.kvcache.cache import (
    KVCache,
    KVCache4,
    KVCache8,
    quantize_kv_rows,
    quantize_kv_rows4,
    unpack_kv_rows4,
)
from sequoia_tpu.ops import masks
from sequoia_tpu.trees.growmap import uniform_tree


@pytest.fixture(scope="module")
def model():
    cfg = get_config("test-tiny")
    params = random_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    return cfg, params


def _run_two_steps(cfg, params, cache):
    """Prefill 8 tokens then decode 3 more reading the cached rows."""
    M = 32
    toks = jnp.asarray([5, 9, 2, 7, 1, 4, 6, 3], jnp.int32)
    pos = jnp.arange(8, dtype=jnp.int32)
    _, cache = forward(params, cfg, toks, pos, cache, 0,
                       masks.causal_mask(8, M, 0))
    toks2 = jnp.asarray([2, 8, 5], jnp.int32)
    pos2 = 8 + jnp.arange(3, dtype=jnp.int32)
    logits, cache = forward(params, cfg, toks2, pos2, cache, 8,
                            masks.causal_mask(3, M, 8))
    return np.asarray(logits), cache


def test_quantize_kv_rows_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 2, 16)) * 3.0, jnp.float32)
    q, s = quantize_kv_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (5, 2)
    back = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    err = np.abs(back - np.asarray(x)).max()
    # Max rounding error is scale/2 = amax/254.
    assert err <= np.abs(np.asarray(x)).max() / 254 + 1e-6


def test_forward_close_to_float_cache(model):
    cfg, params = model
    ref, _ = _run_two_steps(cfg, params, KVCache.init(cfg, 32, jnp.float32))
    got, _ = _run_two_steps(cfg, params, KVCache8.init(cfg, 32))
    # int8 KV perturbs logits slightly; ranks of the top tokens must agree
    # and values stay close.
    np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.15)
    assert (np.argmax(got, -1) == np.argmax(ref, -1)).mean() >= 2 / 3


def test_pack_unpack_int4_exact():
    """Every int4 value in [-7, 7] survives the head-pair pack/unpack
    (packed minor dim stays head_dim; heads re-interleave on unpack)."""
    rng = np.random.default_rng(2)
    x = rng.integers(-7, 8, size=(4, 4, 16)).astype(np.float32)
    # Feed values already on the grid with a known scale: amax 7 -> scale 1.
    x[..., 0] = 7.0
    packed, scale = quantize_kv_rows4(jnp.asarray(x))
    assert packed.shape == (4, 2, 16) and packed.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(scale), 1.0)
    back = np.asarray(unpack_kv_rows4(packed), np.float32)
    np.testing.assert_array_equal(back, x)


def test_quantize_kv_rows4_error_bound():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(5, 2, 16)) * 3.0, jnp.float32)
    q, s = quantize_kv_rows4(x)
    back = np.asarray(unpack_kv_rows4(q), np.float32) * np.asarray(s)[..., None]
    err = np.abs(back - np.asarray(x)).max(axis=-1)
    # Max rounding error is scale/2 = amax/14 per row.
    bound = np.abs(np.asarray(x)).max(axis=-1) / 14 + 1e-6
    assert (err <= bound).all()


def test_forward_close_to_float_cache_int4(model):
    cfg, params = model
    ref, _ = _run_two_steps(cfg, params, KVCache.init(cfg, 32, jnp.float32))
    got, _ = _run_two_steps(cfg, params, KVCache4.init(cfg, 32))
    # 4-bit rows are coarse; demand same top-1 on most positions and bounded
    # drift (these are random tiny-model logits, the hardest case).
    np.testing.assert_allclose(got, ref, rtol=0.5, atol=0.6)
    assert (np.argmax(got, -1) == np.argmax(ref, -1)).mean() >= 2 / 3


def test_commit_rows_quantizes_scales_with_rows(model):
    """KVCache8.commit_rows quantizes float scratch rows once at commit and
    writes rows + per-row scales to the destination window."""
    from sequoia_tpu.kvcache.cache import KVCache

    cfg, _ = model
    cache = KVCache8.init(cfg, 16)
    rng = np.random.default_rng(1)
    rows = jnp.asarray(
        rng.normal(size=(cfg.num_layers, 8, cfg.num_kv_heads, cfg.head_dim_)),
        jnp.float32)
    scratch = KVCache(k=rows, v=rows)
    slots = jnp.asarray([3, 7, 2], jnp.int32)
    out = cache.commit_rows(scratch, slots, 5)
    q, s = jax.vmap(quantize_kv_rows)(rows[:, [3, 7, 2]])
    np.testing.assert_array_equal(np.asarray(out.k[:, 5:8]), np.asarray(q))
    np.testing.assert_allclose(np.asarray(out.ks[:, 5:8]), np.asarray(s))
    # Rows outside the window are untouched (zeros from init).
    np.testing.assert_array_equal(np.asarray(out.k[:, :5]), 0)


@pytest.mark.parametrize("kv_quant", ["int8", "int4"])
@pytest.mark.parametrize("algo", ["greedy", "sequoia"])
def test_engine_runs_with_kv_quant(model, algo, kv_quant):
    cfg, params = model
    target = random_params(cfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    gm = uniform_tree(3, 2)
    eng = SpecEngine(params, cfg, target, cfg, gm, algorithm=algo,
                     max_length=96, temperature=0.7, top_p=0.9,
                     prefill_chunk=16, kv_quant=kv_quant)
    prompt = np.array([11, 23, 5, 99, 42, 7])
    out = eng.generate(prompt, max_new_tokens=20, seed=0)
    assert len(out) > len(prompt)
    np.testing.assert_array_equal(out[: len(prompt)], prompt)
    assert eng.num_large_model_steps > 0


def test_pack_unpack_int4_dsplit_exact():
    """The dsplit packing (TP/odd-head fallback) round-trips exactly."""
    rng = np.random.default_rng(4)
    x = rng.integers(-7, 8, size=(4, 3, 16)).astype(np.float32)
    x[..., 0] = 7.0
    packed, scale = quantize_kv_rows4(jnp.asarray(x), packing="dsplit")
    assert packed.shape == (4, 3, 8) and packed.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(scale), 1.0)
    back = np.asarray(unpack_kv_rows4(packed, packing="dsplit"), np.float32)
    np.testing.assert_array_equal(back, x)


def test_int4_kv_packings_same_generation():
    """Engine decode with head-paired vs dsplit int4 KV must emit the same
    tokens (same quantized VALUES, different arrangement) — the packing is
    a layout choice, not a numerics choice."""
    import jax

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.init import random_params
    from sequoia_tpu.engine.engine import SpecEngine
    from sequoia_tpu.trees.growmap import uniform_tree

    cfg = get_config("test-tiny")
    draft = random_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = random_params(cfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    prompt = np.array([11, 23, 5, 99, 42, 7])
    gm = uniform_tree(2, 2)
    outs = {}
    for packing in ("head", "dsplit"):
        eng = SpecEngine(draft, cfg, target, cfg, gm, algorithm="sequoia",
                         max_length=96, temperature=0.7, top_p=0.9,
                         prefill_chunk=16, kv_quant="int4")
        eng._kv4_packing = packing
        outs[packing] = np.asarray(
            eng.generate(prompt, max_new_tokens=20, seed=0))
    np.testing.assert_array_equal(outs["head"], outs["dsplit"])
