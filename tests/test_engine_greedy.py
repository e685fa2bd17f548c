"""End-to-end greedy speculative decoding must be TOKEN-EXACT equal to pure
greedy autoregressive decoding of the target model — for any draft model and
any growmap (accepted tokens and the bonus token are always the target's
argmax). The reference never exploits this self-check; we use it as the core
engine correctness test (SURVEY.md §7.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.engine.baseline import ARBaseline
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.trees.growmap import chain, uniform_tree

DRAFT_CFG = get_config("test-tiny")
TARGET_CFG = get_config("test-tiny")


@pytest.fixture(scope="module")
def models():
    draft = random_params(DRAFT_CFG, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = random_params(TARGET_CFG, jax.random.PRNGKey(8), dtype=jnp.float32)
    return draft, target


@pytest.fixture(scope="module")
def same_models():
    p = random_params(TARGET_CFG, jax.random.PRNGKey(9), dtype=jnp.float32)
    return p, p


@pytest.mark.parametrize("gm_name", ["chain4", "tree_2x2", "tree_2x3"])
def test_greedy_spec_equals_greedy_ar(models, gm_name):
    draft, target = models
    gm = {
        "chain4": chain(4),
        "tree_2x2": uniform_tree(2, 2),
        "tree_2x3": uniform_tree(3, 2),
    }[gm_name]
    rng = np.random.default_rng(3)
    for trial in range(3):
        prompt = rng.integers(3, DRAFT_CFG.vocab_size, size=9 + trial)
        ar = ARBaseline(target, TARGET_CFG, max_length=128, greedy=True, prefill_chunk=16)
        expect = ar.generate(prompt, max_new_tokens=40)

        eng = SpecEngine(
            draft, DRAFT_CFG, target, TARGET_CFG, gm,
            algorithm="greedy", max_length=128, prefill_chunk=16,
        )
        got = eng.generate(prompt, max_new_tokens=40, seed=trial)
        n = min(len(expect), len(got))
        assert n > len(prompt)
        np.testing.assert_array_equal(expect[:n], got[:n])
        assert eng.num_decoding_steps >= eng.num_large_model_steps  # >= 1 token/step


def test_greedy_self_speculation_accepts_everything(same_models):
    """Draft == target: every speculated chain token must be accepted, so a
    depth-d chain commits d+1 tokens per target step."""
    p, _ = same_models
    gm = chain(4)
    prompt = np.asarray([5, 17, 42, 9, 3])
    eng = SpecEngine(
        p, TARGET_CFG, p, TARGET_CFG, gm,
        algorithm="greedy", max_length=128, prefill_chunk=16,
    )
    out = eng.generate(prompt, max_new_tokens=30)
    assert len(out) > len(prompt)
    if not bool(jnp.asarray(False)):  # stats check only meaningful w/o early EOS
        pass
    steps = eng.num_large_model_steps
    toks = eng.num_decoding_steps
    # Perfect acceptance: 5 tokens per step (4 chain + bonus), modulo the
    # final truncated step / early EOS.
    assert toks >= 4 * steps


def test_generate_respects_max_new_tokens(models):
    draft, target = models
    eng = SpecEngine(
        draft, DRAFT_CFG, target, TARGET_CFG, chain(3),
        algorithm="greedy", max_length=96, prefill_chunk=16,
    )
    prompt = np.asarray([4, 8, 15, 16, 23, 42])
    out = eng.generate(prompt, max_new_tokens=10)
    assert len(out) - len(prompt) >= 10  # may overshoot within final tree
    assert len(out) - len(prompt) <= 10 + eng.max_depth + 1
