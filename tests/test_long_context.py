"""Long-prefill / long-buffer decoding (the reference's wikimqa/qasper runs:
`tests/run_wiki.sh` uses --S 1024 with M=1280, `tests/testbed_greedy.py:30`).

The engine preallocates static [max_length] buffers and generates masks per
level from the growmap, so long contexts must work with no code changes —
this locks that in at the reference's largest exercised shape (S=1024,
M=1280) with the self-checking greedy == AR token-exact invariant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.engine.baseline import ARBaseline
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.trees.growmap import uniform_tree

CFG = get_config("test-tiny")


@pytest.fixture(scope="module")
def models():
    draft = random_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    target = random_params(CFG, jax.random.PRNGKey(4), dtype=jnp.float32)
    return draft, target


def test_long_prefill_greedy_parity(models):
    draft, target = models
    rng = np.random.default_rng(11)
    prompt = rng.integers(5, CFG.vocab_size, size=1024).astype(np.int32)
    M, new = 1280, 48

    ar = ARBaseline(target, CFG, max_length=M, greedy=True, prefill_chunk=128)
    expected = ar.generate_fast(prompt, max_new_tokens=new)

    eng = SpecEngine(draft, CFG, target, CFG, uniform_tree(3, 2),
                     algorithm="greedy", max_length=M, prefill_chunk=128)
    got = eng.generate(prompt, max_new_tokens=new)

    n = min(len(expected), len(got))
    assert n >= len(prompt) + 1
    np.testing.assert_array_equal(expected[:n], got[:n])


def test_long_prefill_stochastic_runs(models):
    draft, target = models
    rng = np.random.default_rng(12)
    prompt = rng.integers(5, CFG.vocab_size, size=1024).astype(np.int32)

    eng = SpecEngine(draft, CFG, target, CFG, uniform_tree(3, 2),
                     algorithm="sequoia", max_length=1280, temperature=0.7,
                     top_p=0.9, prefill_chunk=128)
    out = eng.generate(prompt, max_new_tokens=32, seed=1)
    assert len(out) >= 1025
    assert eng.num_decoding_steps >= eng.num_large_model_steps
