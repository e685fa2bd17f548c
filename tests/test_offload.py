"""Host-offloaded weight streaming (`engine/offload.py`).

Parity with the reference `Engine/offload_engine.py` capability: the target
model's layer weights live in host memory and stream into device memory
layer-by-layer inside the decode loop. Offloaded forwards must be
numerically IDENTICAL to resident forwards (the transfer changes placement,
not math), and the speculative engines must work unchanged with an
offloaded target — including the fully on-device `generate_fast` loop,
which the reference's host-driven streaming could never support."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.core.model import OffloadLayers, forward
from sequoia_tpu.engine.baseline import ARBaseline
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.engine.offload import (
    offload_params,
    offloaded_bytes,
    random_offloaded_params,
    resident_params,
)
from sequoia_tpu.kvcache.cache import KVCache
from sequoia_tpu.ops import masks
from sequoia_tpu.quant.quantize import quantize_model
from sequoia_tpu.trees.growmap import chain, uniform_tree

CFG = get_config("test-small")  # 4 layers: 1 resident + 3 streamed


@pytest.fixture(scope="module")
def params():
    return random_params(CFG, jax.random.PRNGKey(11), dtype=jnp.float32)


def _forward_logits(p, tokens, max_length=64):
    kv = KVCache.init(CFG, max_length, jnp.float32)
    pos = jnp.arange(len(tokens), dtype=jnp.int32)
    mask = masks.causal_mask(len(tokens), max_length, 0)
    logits, kv = jax.jit(forward, static_argnums=(1,))(
        p, CFG, jnp.asarray(tokens, jnp.int32), pos, kv, 0, mask
    )
    return logits, kv


@pytest.mark.parametrize("stay", [0, 1, 3])
def test_offloaded_forward_matches_resident(params, stay):
    tokens = np.arange(1, 13) % CFG.vocab_size
    ref_logits, ref_kv = _forward_logits(params, tokens)
    off = offload_params(params, stay_layers=stay)
    assert isinstance(off.layers, OffloadLayers)
    got_logits, got_kv = _forward_logits(off, tokens)
    np.testing.assert_array_equal(np.asarray(ref_logits), np.asarray(got_logits))
    np.testing.assert_array_equal(np.asarray(ref_kv.k), np.asarray(got_kv.k))
    np.testing.assert_array_equal(np.asarray(ref_kv.v), np.asarray(got_kv.v))


def test_offloaded_quantized_forward_matches_resident(params):
    qp = quantize_model(params, bits=8)
    tokens = np.arange(3, 11) % CFG.vocab_size
    ref, _ = _forward_logits(qp, tokens)
    got, _ = _forward_logits(offload_params(qp, stay_layers=1), tokens)
    # The two-segment scan fuses the int8 convert+dot slightly differently
    # than the single scan — placement-only change, but not bitwise for the
    # quantized path; float offload (test above) IS bitwise identical.
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-3, atol=1e-5)


def test_resident_roundtrip(params):
    back = resident_params(offload_params(params, stay_layers=2))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_offloaded_bytes_split(params):
    host, dev = offloaded_bytes(offload_params(params, stay_layers=1))
    host0, dev0 = offloaded_bytes(params)
    assert host0 == 0 and host > 0
    assert host + dev == dev0


def test_streamed_placement_rule_no_sub3d_host_leaves(params):
    """Only >=3-D weight stacks may live in host space: Mosaic cannot
    dynamic-slice one row from a bf16 [L, E] host array (sublane (2,1)
    packing), which broke every model-offload compile on real TPU until
    round 3. The [L, E] norm stacks must therefore stay device-resident;
    host bytes must equal exactly the >=3-D streamed leaves."""
    import jax

    off = offload_params(params, stay_layers=1)
    streamed = jax.tree.leaves(off.layers.streamed)
    assert any(a.ndim < 3 for a in streamed)  # norms are in the scan xs
    host, _ = offloaded_bytes(off)
    expect = sum(a.size * a.dtype.itemsize for a in streamed if a.ndim >= 3)
    assert host == expect


@pytest.mark.parametrize("gm_name", ["chain4", "tree_2x2"])
def test_greedy_spec_with_offloaded_target_equals_ar(gm_name):
    """Offloaded target inside the fused speculative iteration: greedy spec
    output must still be token-exact equal to greedy AR decoding."""
    import dataclasses

    dcfg = dataclasses.replace(get_config("test-tiny"), vocab_size=CFG.vocab_size)
    draft = random_params(dcfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = random_params(CFG, jax.random.PRNGKey(8), dtype=jnp.float32)
    gm = {"chain4": chain(4), "tree_2x2": uniform_tree(2, 2)}[gm_name]

    ar = ARBaseline(target, CFG, max_length=128, greedy=True, prefill_chunk=16)
    prompt = np.asarray([4, 9, 2, 250, 31, 7])
    expect = ar.generate(prompt, max_new_tokens=32)

    off_target = offload_params(target, stay_layers=1)
    eng = SpecEngine(
        draft, dcfg, off_target, CFG, gm,
        algorithm="greedy", max_length=128, prefill_chunk=16,
    )
    got = eng.generate(prompt, max_new_tokens=32)
    n = min(len(expect), len(got))
    assert n > len(prompt)
    np.testing.assert_array_equal(expect[:n], got[:n])


def test_generate_fast_device_loop_with_offloaded_target():
    """The on-device `lax.while_loop` decode composes with in-jit weight
    streaming (impossible in the reference's host-stepped offload design)."""
    import dataclasses

    dcfg = dataclasses.replace(get_config("test-tiny"), vocab_size=CFG.vocab_size)
    draft = random_params(dcfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = random_params(CFG, jax.random.PRNGKey(8), dtype=jnp.float32)
    off_target = offload_params(target, stay_layers=0)
    prompt = np.asarray([4, 9, 2, 250, 31, 7])

    eng = SpecEngine(draft, dcfg, target, CFG, gm := chain(3),
                     algorithm="greedy", max_length=96, prefill_chunk=16)
    expect = eng.generate_fast(prompt, max_new_tokens=24)
    eng_off = SpecEngine(draft, dcfg, off_target, CFG, gm,
                         algorithm="greedy", max_length=96, prefill_chunk=16)
    got = eng_off.generate_fast(prompt, max_new_tokens=24)
    np.testing.assert_array_equal(expect, got)


def test_random_offloaded_params_runs():
    """Host-built random init: shapes line up and a forward executes for
    both float and quantized streamed stacks."""
    for bits in (None, 8, 4):
        p = random_offloaded_params(CFG, seed=3, bits=bits,
                                    dtype=jnp.float32 if bits is None else jnp.bfloat16,
                                    stay_layers=1)
        host, dev = offloaded_bytes(p)
        assert host > 0
        tokens = np.arange(5) % CFG.vocab_size
        kv = KVCache.init(CFG, 32, p.embed.dtype)
        pos = jnp.arange(5, dtype=jnp.int32)
        mask = masks.causal_mask(5, 32, 0)
        logits, _ = jax.jit(forward, static_argnums=(1,))(
            p, CFG, jnp.asarray(tokens, jnp.int32), pos, kv, 0, mask)
        assert np.isfinite(np.asarray(logits, np.float32)).all()
