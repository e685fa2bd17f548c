"""Weight-only quantization: pack/unpack round trips, dequant-matmul
accuracy, whole-model fidelity, engine integration, TP sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.core.model import forward
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.kvcache.cache import KVCache
from sequoia_tpu.ops import masks
from sequoia_tpu.quant.qtensor import (
    _unpack_int4,
    dequantize,
    matmul,
    quantize_int4,
    quantize_int8,
)
from sequoia_tpu.quant.quantize import model_bytes, quantize_model
from sequoia_tpu.trees.growmap import uniform_tree

CFG = get_config("test-tiny")


def test_int8_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)) * 0.1
    qt = quantize_int8(w)
    assert qt.q.dtype == jnp.int8
    wd = dequantize(qt, 64)
    err = np.abs(np.asarray(wd) - np.asarray(w)).max()
    scale_max = float(qt.scale.max())
    assert err <= scale_max * 0.5 + 1e-7


def test_int4_pack_unpack_exact():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(-7, 8, size=(16, 8)).astype(np.int8))
    # pack via quantize path internals: build float with unit scales
    from sequoia_tpu.quant.qtensor import QuantizedTensor

    # half-split layout: low nibble = first-half rows, high = second half
    lo = q[:8, :] & 0x0F
    hi = (q[8:, :] & 0x0F) << 4
    packed = (lo | hi).astype(jnp.int8)
    out = _unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(q))


def test_int4_quantize_matmul_close():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)) * 0.05
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    exact = np.asarray(x @ w)
    q4 = np.asarray(matmul(x, quantize_int4(w)))
    q8 = np.asarray(matmul(x, quantize_int8(w)))
    # int8 tighter than int4; both bounded
    assert np.abs(q8 - exact).max() < np.abs(q4 - exact).max() + 1e-5
    rel4 = np.abs(q4 - exact).max() / np.abs(exact).max()
    assert rel4 < 0.2, rel4


def test_quantized_model_logits_close():
    params = random_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_model(params, bits=8)
    assert model_bytes(qparams) < 0.55 * model_bytes(params)
    tokens = jnp.asarray([5, 9, 2, 7], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)
    mask = masks.causal_mask(4, 32, 0)
    lf, _ = forward(params, CFG, tokens, pos, KVCache.init(CFG, 32, jnp.float32), 0, mask)
    lq, _ = forward(qparams, CFG, tokens, pos, KVCache.init(CFG, 32, jnp.float32), 0, mask)
    lf, lq = np.asarray(lf), np.asarray(lq)
    # logits correlate strongly (top-1 usually agrees on tiny models)
    cos = (lf * lq).sum() / (np.linalg.norm(lf) * np.linalg.norm(lq))
    assert cos > 0.99, cos


def test_engine_runs_with_quantized_target():
    draft = random_params(CFG, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = quantize_model(
        random_params(CFG, jax.random.PRNGKey(8), dtype=jnp.float32), bits=8
    )
    eng = SpecEngine(
        draft, CFG, target, CFG, uniform_tree(2, 2),
        algorithm="sequoia", max_length=96, temperature=0.8, prefill_chunk=16,
    )
    out = eng.generate_fast(np.asarray([5, 6, 7, 8]), max_new_tokens=16)
    assert len(out) > 4


def test_quantized_sharded_matches_unsharded():
    from sequoia_tpu.parallel.sharding import make_mesh, shard_params

    params = quantize_model(
        random_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32), bits=8
    )
    mesh = make_mesh(tp=2)
    sp = shard_params(params, mesh)
    tokens = jnp.asarray([3, 7, 11, 19], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)
    mask = masks.causal_mask(4, 32, 0)
    l0, _ = jax.jit(lambda p, k: forward(p, CFG, tokens, pos, k, 0, mask))(
        params, KVCache.init(CFG, 32, jnp.float32)
    )
    l1, _ = jax.jit(lambda p, k: forward(p, CFG, tokens, pos, k, 0, mask))(
        sp, KVCache.init(CFG, 32, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-4, atol=1e-4)


def test_w8a8_matmul_close():
    """w8a8 (per-row int8 activations + native int8 dot) must track the
    weight-only dequant matmul within activation-quantization error."""
    from sequoia_tpu.quant import qtensor

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)) * 0.05
    qt = quantize_int8(w)
    ref = np.asarray(matmul(x, qt))
    got = np.asarray(qtensor._matmul_w8a8(x, qt, None))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 0.02 * scale + 1e-6

    # zero rows must not divide by zero
    x0 = jnp.zeros((4, 64), jnp.float32)
    out0 = np.asarray(qtensor._matmul_w8a8(x0, qt, None))
    assert np.all(np.isfinite(out0)) and np.abs(out0).max() == 0.0


def test_w8a8_routing_modes():
    """'on' forces the int8-dot path; 'off' and CPU-auto keep weight-only."""
    from sequoia_tpu.quant import qtensor

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)) * 0.05
    qt = quantize_int8(w)
    base = np.asarray(matmul(x, qt))  # CPU backend: auto never routes w8a8
    try:
        qtensor.set_w8a8("on")
        forced = np.asarray(matmul(x, qt))
        assert np.abs(forced - base).max() > 0.0  # different numerics
        assert np.abs(forced - base).max() <= 0.02 * np.abs(base).max() + 1e-6
        qtensor.set_w8a8("off")
        off = np.asarray(matmul(x, qt))
        assert np.array_equal(off, base)
    finally:
        qtensor.set_w8a8("auto")
