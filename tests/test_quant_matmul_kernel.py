"""Fused dequant-matmul Pallas kernel vs the XLA dequant path (interpret
mode on CPU): numerical parity for int8 and packed int4 across padded /
unpadded shapes, plus end-to-end model forward parity with the kernel
routed in."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sequoia_tpu.kernels.quant_matmul import quant_matmul
from sequoia_tpu.quant import qtensor
from sequoia_tpu.quant.qtensor import (
    dequantize,
    quantize_int4,
    quantize_int8,
    set_quant_matmul_impl,
)


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("shape", [(1, 64, 96), (5, 128, 256), (7, 250, 130)])
def test_kernel_matches_dense(bits, shape):
    R, K, N = shape
    if bits == 4 and K % 2:
        K += 1
    rng = np.random.default_rng(bits * 100 + R)
    x = jnp.asarray(rng.normal(size=(R, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
    qt = (quantize_int8 if bits == 8 else quantize_int4)(w)
    dense = x @ dequantize(qt, K, jnp.float32)
    got = quant_matmul(x, qt.q, qt.scale, bits=bits, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense), rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("unpack", ["shift", "float"])
def test_int4_unpack_variants_exact_match(unpack):
    """Both int4 nibble-unpack paths must produce IDENTICAL results (the
    f32 floor/fma extraction is exact for byte values: integers <= 256 are
    exact in f32 and /16 is an exponent shift)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(130, 128)), jnp.float32)  # R>=128: auto->float
    w = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
    qt = quantize_int4(w)
    dense = x @ dequantize(qt, 128, jnp.float32)
    got = quant_matmul(x, qt.q, qt.scale, bits=4, interpret=True, unpack=unpack)
    auto = quant_matmul(x, qt.q, qt.scale, bits=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense), rtol=2e-5, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(auto))


def test_kernel_small_blocks():
    # Force multiple N and K tiles.
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 512)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(512, 512)), jnp.float32)
    qt = quantize_int4(w)
    dense = x @ dequantize(qt, 512, jnp.float32)
    got = quant_matmul(x, qt.q, qt.scale, bits=4, interpret=True,
                       block_n=128, block_k=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense), rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("bits", [8, 4])
def test_model_forward_parity_with_kernel(bits):
    """Full quantized model forward: XLA dequant path vs routed Pallas
    kernel (interpret) must agree."""
    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.init import random_params
    from sequoia_tpu.core.model import forward
    from sequoia_tpu.kvcache.cache import KVCache
    from sequoia_tpu.ops import masks
    from sequoia_tpu.quant.quantize import quantize_model

    cfg = get_config("test-tiny")
    params = quantize_model(
        random_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32), bits=bits
    )
    tokens = jnp.asarray([5, 9, 2, 7], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)
    mask = masks.causal_mask(4, 16, 0)

    def run():
        kv = KVCache.init(cfg, 16, jnp.float32)
        logits, _ = forward(params, cfg, tokens, pos, kv, 0, mask)
        return np.asarray(logits)

    set_quant_matmul_impl("xla")
    ref = run()
    try:
        set_quant_matmul_impl("pallas_interpret")
        got = run()
    finally:
        set_quant_matmul_impl("xla")
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)


def test_int4_w4a8_matches_dequant_matmul():
    """w4a8 unpack variant (int8 MXU dots, activation quant) tracks the
    float dequant matmul within activation-quantization error."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 384)).astype(np.float32)) * 0.05
    qt = quantize_int4(w)
    ref = np.asarray(x @ dequantize(qt, 256))
    got = np.asarray(quant_matmul(x, qt.q, qt.scale, bits=4, interpret=True,
                                  unpack="w4a8"))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 0.02 * scale
