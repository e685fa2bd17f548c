"""Acceptance-vector measurement: the static (teacher-forced analytic) and
dynamic (engine star-tree histogram) estimators must agree — they estimate
the same quantity by different means (a consistency check the reference
never runs on its fast_test vs test_accept pair)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.planner.acceptance import dynamic_acceptance, static_acceptance

CFG = get_config("test-tiny")


def test_identical_models_accept_rank1_always():
    p = random_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    seqs = [rng.integers(3, CFG.vocab_size, 48) for _ in range(2)]
    vec = static_acceptance(
        p, CFG, p, CFG, seqs, k=4, temperature=0.8,
        top_p=1.0, draft_top_p=1.0,
    )
    assert vec[0] == 0.0
    assert vec[1] > 0.999, vec
    assert vec[2:].sum() < 1e-3

    vec_d = dynamic_acceptance(
        p, CFG, p, CFG, [rng.integers(3, CFG.vocab_size, 12)],
        width=4, steps_per_prompt=24, temperature=0.8, top_p=1.0,
        max_length=128,
    )
    assert vec_d[1] > 0.95, vec_d


def test_static_and_dynamic_agree_for_distinct_models():
    draft = random_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    target = random_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    seqs = [rng.integers(3, CFG.vocab_size, 64) for _ in range(3)]
    stat = static_acceptance(
        draft, CFG, target, CFG, seqs, k=6, temperature=0.8,
        top_p=0.95, draft_top_p=0.99, seed=3,
    )
    dyn = dynamic_acceptance(
        draft, CFG, target, CFG,
        [rng.integers(3, CFG.vocab_size, 12) for _ in range(3)],
        width=6, steps_per_prompt=30, temperature=0.8, top_p=0.95,
        max_length=224, seed=5,
    )
    # Same quantity, different estimators + different context distributions:
    # agreement should be within coarse statistical tolerance.
    assert stat[0] == dyn[0] == 0.0
    assert abs(stat[1] - dyn[1]) < 0.2, (stat, dyn)
    assert stat.sum() <= 1.0 + 1e-6
    assert dyn.sum() <= 1.0 + 1e-6
    # Rank-1 must dominate later ranks in both.
    assert stat[1] > stat[2] >= 0.0
    assert dyn[1] >= dyn[2]


@pytest.mark.parametrize("algo", ["greedys", "specinfer"])
def test_dynamic_acceptance_all_algorithms(algo):
    """Growmaps must be plannable from vectors measured under the SAME
    verification protocol — greedys and specinfer included (the reference
    only measures sequoia/greedy)."""
    draft = random_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    target = random_params(CFG, jax.random.PRNGKey(4), dtype=jnp.float32)
    prompts = [np.arange(5, 15, dtype=np.int32)]
    vec = dynamic_acceptance(draft, CFG, target, CFG, prompts, width=4,
                             steps_per_prompt=8, max_length=96,
                             temperature=0.7, algorithm=algo)
    assert vec.shape == (5,)
    assert vec[0] == 0.0
    assert 0.0 <= vec[1:].sum() <= 1.0 + 1e-9
