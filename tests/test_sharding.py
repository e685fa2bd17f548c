"""Tensor-parallel sharding on a virtual 8-device CPU mesh: sharded
execution must produce the same results as single-device execution, and
the full speculative iteration must compile and run sharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.core.model import forward
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.kvcache.cache import KVCache
from sequoia_tpu.ops import masks
from sequoia_tpu.parallel.sharding import make_mesh, shard_kv, shard_params
from sequoia_tpu.trees.growmap import uniform_tree

CFG = get_config("test-tiny")  # 4 heads / 2 kv heads / vocab 256 / F 128


@pytest.fixture(scope="module")
def models():
    draft = random_params(CFG, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = random_params(CFG, jax.random.PRNGKey(8), dtype=jnp.float32)
    return draft, target


def test_mesh_construction():
    mesh = make_mesh(tp=4, dp=2)
    assert mesh.shape == {"dp": 2, "tp": 4}


def test_sharded_forward_matches_unsharded(models):
    _, target = models
    mesh = make_mesh(tp=2)
    tokens = jnp.asarray([3, 7, 11, 19], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)
    mask = masks.causal_mask(4, 32, 0)

    kv = KVCache.init(CFG, 32, jnp.float32)
    ref_logits, ref_kv = jax.jit(lambda p, k: forward(p, CFG, tokens, pos, k, 0, mask))(
        target, kv
    )

    sp = shard_params(target, mesh)
    skv = shard_kv(KVCache.init(CFG, 32, jnp.float32), mesh)
    sh_logits, sh_kv = jax.jit(lambda p, k: forward(p, CFG, tokens, pos, k, 0, mask))(
        sp, skv
    )
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(sh_logits), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref_kv.k), np.asarray(sh_kv.k), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("tp", [2, 4])
def test_sharded_greedy_generation_matches(models, tp):
    if tp == 4:
        # test-tiny has 2 KV heads; use the 4-kv-head config for tp=4.
        cfg = get_config("test-small")
        draft = random_params(cfg, jax.random.PRNGKey(17), dtype=jnp.float32)
        target = random_params(cfg, jax.random.PRNGKey(18), dtype=jnp.float32)
    else:
        cfg = CFG
        draft, target = models
    mesh = make_mesh(tp=tp)
    gm = uniform_tree(2, 2)
    prompt = np.asarray([9, 4, 27, 31, 2 + 3])  # avoid stop tokens

    ref_eng = SpecEngine(
        draft, cfg, target, cfg, gm, algorithm="greedy",
        max_length=96, prefill_chunk=16,
    )
    expect = ref_eng.generate(prompt, max_new_tokens=24)

    eng = SpecEngine(
        shard_params(draft, mesh), cfg, shard_params(target, mesh), cfg, gm,
        algorithm="greedy", max_length=96, prefill_chunk=16,
        mesh=mesh, shard_draft=True,
    )
    got = eng.generate(prompt, max_new_tokens=24)
    np.testing.assert_array_equal(expect, got)


def test_sharded_stochastic_runs(models):
    draft, target = models
    mesh = make_mesh(tp=2)
    gm = uniform_tree(2, 2)
    eng = SpecEngine(
        draft, CFG, shard_params(target, mesh), CFG, gm,
        algorithm="sequoia", max_length=96, temperature=0.8, top_p=0.9,
        prefill_chunk=16, mesh=mesh,
    )
    out = eng.generate(np.asarray([5, 6, 7, 8]), max_new_tokens=16)
    assert len(out) > 4


def test_sharded_kv_quant_runs(models):
    """int8 KV cache under TP: rows and per-row scales both shard over the
    kv-head axis (compaction gathers stay shard-local)."""
    draft, target = models
    mesh = make_mesh(tp=2)
    gm = uniform_tree(2, 2)
    eng = SpecEngine(
        draft, CFG, shard_params(target, mesh), CFG, gm,
        algorithm="sequoia", max_length=96, temperature=0.8, top_p=0.9,
        prefill_chunk=16, mesh=mesh, kv_quant="int8",
    )
    out = eng.generate(np.asarray([5, 6, 7, 8]), max_new_tokens=16)
    assert len(out) > 4


def test_sharded_tiled_int4_forward_matches(models):
    """N-panel tiled int4 weights shard over tp (panels = output features,
    K rows = input features) and the sharded forward must match the
    unsharded tiled forward. bn0=32 for the tiny test dims; production
    uses 128 (quant/qtensor.py::tile_int4)."""
    from sequoia_tpu.core.model import LlamaParams
    from sequoia_tpu.quant.qtensor import QuantizedTensor, tile_int4
    from sequoia_tpu.quant.quantize import quantize_model

    _, target = models
    qp = quantize_model(target, bits=4)
    lay = qp.layers
    tiled_layers = type(lay)(**{
        f: (tile_int4(getattr(lay, f), bn0=16)
            if isinstance(getattr(lay, f), QuantizedTensor)
            else getattr(lay, f))
        for f in lay._fields})
    qp_t = LlamaParams(embed=qp.embed, layers=tiled_layers,
                       final_norm=qp.final_norm, lm_head=qp.lm_head)

    tokens = jnp.asarray([3, 7, 11, 19], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)
    mask = masks.causal_mask(4, 32, 0)
    kv = KVCache.init(CFG, 32, jnp.float32)
    ref_logits, _ = jax.jit(
        lambda p, k: forward(p, CFG, tokens, pos, k, 0, mask))(qp_t, kv)

    mesh = make_mesh(tp=2)
    sp = shard_params(qp_t, mesh)
    # the tiled leaves actually sharded over panels / K rows
    assert "tp" in str(sp.layers.w_gate.q.sharding.spec)
    skv = shard_kv(KVCache.init(CFG, 32, jnp.float32), mesh)
    sh_logits, _ = jax.jit(
        lambda p, k: forward(p, CFG, tokens, pos, k, 0, mask))(sp, skv)
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(sh_logits), rtol=1e-4, atol=1e-4)


def test_tiled_70b_tp8_shard_shapes():
    """The flagship 70B int4 shapes divide the tp=8 mesh under the panel
    layout: every projection's panel count (bn0=128) and K rows are
    8-divisible (the vocab head stays row-major — 32000/8 shards are not
    128-divisible; quant/qtensor.py::tile_int4)."""
    cfg = get_config("llama-2-70b")
    H, Hkv, D, F = (cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_,
                    cfg.intermediate_size)
    for n_out in (H * D, Hkv * D, F):        # wq / wk,wv / gate,up panels
        assert (n_out // 128) % 8 == 0, n_out
    for k_in in (H * D, F):                  # wo / w_down packed K rows
        assert (k_in // 2) % 8 == 0, k_in


@pytest.mark.parametrize("tp,expected_packing", [(2, "head"), (4, "dsplit")])
def test_sharded_int4_kv_runs(tp, expected_packing):
    """int4 KV under TP: head-paired packing shards the packed (Hkv/2) axis
    when tp divides it; otherwise the engine falls back to the dsplit
    layout whose kv-head axis stays intact (the GQA-at-high-tp case, e.g.
    llama-2-70b Hkv=8 under tp=8 — reviewer r5). 4 kv heads: tp=2 keeps
    head pairing (2 packed heads / 2 shards), tp=4 must fall back."""
    import dataclasses

    cfg4 = dataclasses.replace(CFG, num_heads=4, num_kv_heads=4)
    draft = random_params(cfg4, jax.random.PRNGKey(0), dtype=jnp.float32)
    target = random_params(cfg4, jax.random.PRNGKey(1), dtype=jnp.float32)
    mesh = make_mesh(tp=tp)
    gm = uniform_tree(2, 2)
    eng = SpecEngine(
        draft, cfg4, shard_params(target, mesh), cfg4, gm,
        algorithm="sequoia", max_length=96, temperature=0.8, top_p=0.9,
        prefill_chunk=16, mesh=mesh, kv_quant="int4",
    )
    assert eng._kv4_packing == expected_packing
    out = eng.generate(np.asarray([5, 6, 7, 8]), max_new_tokens=16)
    assert len(out) > 4


def test_int4_kv_cache_is_half_of_int8():
    """Capacity regression guard: the packed int4 cache must occupy HALF
    the int8 cache's bytes AND keep the minor dim at head_dim (the old
    [.., Hkv, D/2] layout had a 64-lane minor dim that XLA's (32, 128) s8
    tile padded 2x — 'int4' occupied exactly int8's HBM on device)."""
    from sequoia_tpu.kvcache.cache import KVCache4, KVCache8

    c8 = KVCache8.init(CFG, 64)
    c4 = KVCache4.init(CFG, 64)
    assert c4.k.nbytes * 2 == c8.k.nbytes
    assert c4.k.shape[-1] == CFG.head_dim_          # full-lane minor dim
    assert c4.k.shape[-2] == CFG.num_kv_heads // 2  # head pairs
