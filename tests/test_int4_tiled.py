"""N-panel tiled int4 layout: round-trip + kernel correctness vs the
row-major dequant reference (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sequoia_tpu.kernels.quant_matmul import quant_matmul_tiled
from sequoia_tpu.quant.qtensor import (
    dequantize,
    is_tiled,
    matmul,
    quantize_int4,
    tile_int4,
    untile_int4,
)


def _mk(K, N, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    return quantize_int4(w)


def test_tile_round_trip():
    qt = _mk(64, 384)
    t = tile_int4(qt, bn0=128)
    assert is_tiled(t) and not is_tiled(qt)
    assert t.q.shape == (3, 32, 128)
    back = untile_int4(t)
    np.testing.assert_array_equal(np.asarray(back.q), np.asarray(qt.q))
    np.testing.assert_array_equal(np.asarray(back.scale), np.asarray(qt.scale))


def test_tile_pads_ragged_n():
    qt = _mk(32, 200)  # N not a multiple of bn0
    t = tile_int4(qt, bn0=128)
    assert t.q.shape == (2, 16, 128)
    back = untile_int4(t)
    np.testing.assert_array_equal(np.asarray(back.q), np.asarray(qt.q))


def test_stacked_layer_axis():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((3, 64, 256)), jnp.float32)
    qt = quantize_int4(w)
    t = tile_int4(qt, bn0=128)
    assert t.q.shape == (3, 2, 32, 128)
    back = untile_int4(t)
    np.testing.assert_array_equal(np.asarray(back.q), np.asarray(qt.q))


@pytest.mark.parametrize("R,K,N", [(8, 64, 256), (16, 128, 200), (96, 256, 384)])
def test_kernel_matches_dequant(R, K, N):
    rng = np.random.default_rng(7)
    qt = _mk(K, N, seed=11)
    t = tile_int4(qt, bn0=128)
    x = jnp.asarray(rng.standard_normal((R, K)), jnp.float32)
    got = quant_matmul_tiled(x, t.q, t.scale.astype(jnp.float32),
                             interpret=True, block_k=32)
    want = x @ dequantize(qt, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_matmul_routes_tiled_on_cpu_fallback():
    """On CPU (no Mosaic) the tiled weight falls back through untile ->
    XLA dequant path and must agree with the row-major result."""
    rng = np.random.default_rng(9)
    qt = _mk(64, 256, seed=13)
    t = tile_int4(qt)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    got = matmul(x, t)
    want = matmul(x, qt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
