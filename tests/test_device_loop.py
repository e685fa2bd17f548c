"""The fully on-device `lax.while_loop` generation path must produce exactly
the same tokens as the host-stepped loop (greedy: deterministic)."""

import jax
import jax.numpy as jnp
import numpy as np

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.engine.baseline import ARBaseline
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.trees.growmap import uniform_tree

CFG = get_config("test-tiny")


def test_spec_device_loop_matches_host_loop():
    draft = random_params(CFG, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = random_params(CFG, jax.random.PRNGKey(8), dtype=jnp.float32)
    gm = uniform_tree(2, 2)
    prompt = np.asarray([11, 23, 5, 99, 42, 7])

    eng = SpecEngine(draft, CFG, target, CFG, gm, algorithm="greedy",
                     max_length=128, prefill_chunk=16)
    host = eng.generate(prompt, max_new_tokens=25, seed=0)
    host_steps = eng.num_large_model_steps

    eng2 = SpecEngine(draft, CFG, target, CFG, gm, algorithm="greedy",
                      max_length=128, prefill_chunk=16)
    dev = eng2.generate_fast(prompt, max_new_tokens=25, seed=0)
    n = min(len(host), len(dev))
    np.testing.assert_array_equal(host[:n], dev[:n])
    # step counts should agree modulo the final partial iteration
    assert abs(eng2.num_large_model_steps - host_steps) <= 1


def test_ar_device_loop_matches_host_loop():
    cfg = CFG
    params = random_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    ar = ARBaseline(params, cfg, max_length=96, greedy=True, prefill_chunk=16)
    prompt = np.asarray([4, 9, 13])
    host = ar.generate(prompt, max_new_tokens=20)
    dev = ar.generate_fast(prompt, max_new_tokens=20)
    np.testing.assert_array_equal(host, dev)
