"""Engine misuse / edge cases: clean failures the verify recipe probes, and
reference growmap-library compatibility."""

import glob

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.trees.growmap import GrowMap, uniform_tree


@pytest.fixture(scope="module")
def tiny():
    cfg = get_config("test-tiny")
    draft = random_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = random_params(cfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    return cfg, draft, target


def test_overlong_prompt_rejected(tiny):
    cfg, draft, target = tiny
    eng = SpecEngine(draft, cfg, target, cfg, uniform_tree(2, 2),
                     max_length=32, prefill_chunk=16, algorithm="greedy")
    with pytest.raises(AssertionError):
        eng.prefill(np.arange(40) % 100)


def test_temperature_zero_stochastic_rejected(tiny):
    cfg, draft, target = tiny
    for algo in ["sequoia", "specinfer", "greedys"]:
        with pytest.raises(AssertionError):
            SpecEngine(draft, cfg, target, cfg, uniform_tree(2, 2),
                       algorithm=algo, temperature=0.0, max_length=64)


def test_unknown_algorithm_rejected(tiny):
    cfg, draft, target = tiny
    with pytest.raises(AssertionError):
        SpecEngine(draft, cfg, target, cfg, uniform_tree(2, 2),
                   algorithm="magic", max_length=64)


def test_mismatched_vocab_rejected(tiny):
    cfg, draft, target = tiny
    import dataclasses

    cfg2 = dataclasses.replace(cfg, vocab_size=cfg.vocab_size * 2)
    target2 = random_params(cfg2, jax.random.PRNGKey(9), dtype=jnp.float32)
    with pytest.raises(AssertionError):
        SpecEngine(draft, cfg, target2, cfg2, uniform_tree(2, 2), max_length=64)


@pytest.mark.parametrize(
    "path",
    sorted(glob.glob("/root/reference/L40_growmaps/*.pt"))[:3]
    + sorted(glob.glob("/root/reference/A100_growmaps/**/*.pt", recursive=True))[:3],
)
def test_reference_growmap_library_loads_and_runs(tiny, path):
    """Every bundled reference growmap must load, satisfy the structural
    invariants, and drive a real engine iteration."""
    gm = GrowMap.load(path)
    assert gm.size >= 1
    assert gm.ancestors.shape == (gm.size, gm.size)
    cfg, draft, target = tiny
    if gm.size > 96:
        pytest.skip("large growmap too slow for CPU engine test")
    eng = SpecEngine(draft, cfg, target, cfg, gm, algorithm="sequoia",
                     max_length=gm.size + 64, temperature=0.7,
                     prefill_chunk=16)
    out = eng.generate(np.array([5, 9, 2]), max_new_tokens=4, seed=0)
    assert len(out) >= 4


def test_prefill_tail_chunk_never_overruns_buffer():
    """When round_up(plen, prefill_chunk) exceeds max_length (M not a chunk
    multiple), the tail chunk must SHRINK: a full-size chunk would make
    dynamic_update_slice clamp its start and silently shift-overwrite
    committed rows (reviewer r5). Uses M=100, C=64, plen=84 ->
    round_up=128 > 100, tail chunk of 36."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.init import random_params
    from sequoia_tpu.engine.engine import SpecEngine
    from sequoia_tpu.trees.growmap import uniform_tree

    cfg = get_config("test-tiny")
    draft = random_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = random_params(cfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    gm = uniform_tree(2, 2)  # size 7
    eng = SpecEngine(draft, cfg, target, cfg, gm, algorithm="sequoia",
                     max_length=100, temperature=0.7, top_p=0.9,
                     prefill_chunk=64)
    prompt = (np.arange(7, 7 + 84) % cfg.vocab_size).astype(np.int32)
    out = eng.generate(prompt, max_new_tokens=8, seed=0)
    np.testing.assert_array_equal(out[:84], prompt)
    # And the committed prefix must match a small-chunk engine's exactly
    # (same tokens regardless of chunking).
    eng2 = SpecEngine(draft, cfg, target, cfg, gm, algorithm="sequoia",
                      max_length=100, temperature=0.7, top_p=0.9,
                      prefill_chunk=16)
    out2 = eng2.generate(prompt, max_new_tokens=8, seed=0)
    n = min(len(out), len(out2))
    np.testing.assert_array_equal(out[:n], out2[:n])
