"""Phased iteration (benchmark mode): the split-jit path must produce
token-identical output to the fused path, and the CLI must print the phase
breakdown (reference `tests/testbed.py:144-219`)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.trees.growmap import uniform_tree


def test_phased_matches_fused():
    cfg = get_config("test-tiny")
    draft = random_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = random_params(cfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    prompt = np.array([11, 23, 5, 99, 42, 7])
    gm = uniform_tree(3, 2)

    kw = dict(algorithm="sequoia", max_length=128, temperature=0.7,
              top_p=0.9, prefill_chunk=16)
    eng = SpecEngine(draft, cfg, target, cfg, gm, **kw)
    fused = eng.generate(prompt, max_new_tokens=24, seed=0)

    eng2 = SpecEngine(draft, cfg, target, cfg, gm, **kw)
    phased, totals = eng2.generate_benchmark(prompt, max_new_tokens=24, seed=0)
    np.testing.assert_array_equal(fused, phased)
    assert set(totals) == {"draft_run", "target_run", "accept_kv"}
    assert all(v > 0 for v in totals.values())
    assert eng2.num_large_model_steps == eng.num_large_model_steps


def test_testbed_benchmark_mode(capsys):
    from sequoia_tpu.cli.testbed import main

    main([
        "--draft", "test-tiny", "--target", "test-tiny", "--mode", "benchmark",
        "--algorithm", "greedy", "--growmap", "chain:4", "--M", "64",
        "--gen", "8", "--dtype", "f32", "--prompts", "synthetic:2,10",
    ])
    out = capsys.readouterr().out
    assert "phase breakdown" in out
    assert "target_run" in out
    assert "accepted tokens per target step" in out
