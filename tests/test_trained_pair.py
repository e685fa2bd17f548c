"""End-to-end with a REAL correlated model pair (trained offline on the
bundled corpus): acceptance must be far above the independent-random-weights
floor, closing the loop the reference can only demonstrate with downloaded
checkpoints (measure acceptance -> plan -> speculative decode)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.planner.acceptance import dynamic_acceptance
from sequoia_tpu.planner.dp import plan
from sequoia_tpu.tools.distill import make_correlated_pair
from sequoia_tpu.trees.growmap import uniform_tree


@pytest.fixture(scope="module")
def pair():
    return make_correlated_pair(steps=300, seq_len=64, distill_draft=True)


def test_trained_pair_accepts(pair):
    draft, dcfg, target, tcfg = pair
    prompts = [np.arange(5, 15, dtype=np.int32)]
    vec = dynamic_acceptance(draft, dcfg, target, tcfg, prompts, width=6,
                             steps_per_prompt=24, max_length=128,
                             temperature=0.5)
    assert vec[1] > 0.15, f"distilled draft should be accepted often: {vec}"

    eng = SpecEngine(draft, dcfg, target, tcfg, uniform_tree(4, 2),
                     algorithm="sequoia", max_length=160, temperature=0.5,
                     top_p=0.9, prefill_chunk=16)
    eng.generate(prompts[0], max_new_tokens=60, seed=0)
    rate = eng.num_decoding_steps / max(eng.num_large_model_steps, 1)
    assert rate > 1.15, f"accepted/step {rate} barely above autoregressive"


def test_measure_plan_run_loop(pair):
    """The full hardware-aware closed loop on real statistics."""
    draft, dcfg, target, tcfg = pair
    prompts = [np.arange(40, 50, dtype=np.int32)]
    vec = dynamic_acceptance(draft, dcfg, target, tcfg, prompts, width=4,
                             steps_per_prompt=16, max_length=128,
                             temperature=0.5)
    vec = np.maximum(vec, 1e-4)  # planner needs nonzero head entries
    vec[0] = 0.0
    gm, info = plan(vec, [1, 2, 4, 8, 16], [1.0, 1.0, 1.01, 1.03, 1.06],
                    0.05, max_depth=6)
    assert 1 <= gm.size <= 16
    eng = SpecEngine(draft, dcfg, target, tcfg, gm, algorithm="sequoia",
                     max_length=160, temperature=0.5, top_p=0.9,
                     prefill_chunk=16)
    out = eng.generate(prompts[0], max_new_tokens=24, seed=1)
    assert len(out) > len(prompts[0])
