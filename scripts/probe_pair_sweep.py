#!/usr/bin/env python
"""Which knobs raise the distilled pair's rank-1 acceptance?

pair_e5 observations: (target 800 steps, draft 4L-192h @ 2400 distill)
-> rank1 0.596; (target 1600, draft 6L-224h @ 12000) -> rank1 0.413.
Longer distillation + bigger draft made it WORSE — hypothesis: the
longer-trained target is sharper, and at T=0.6 the acceptance overlap
sum_t min(p_t, q_t) craters wherever the draft misses the sharper mode.
This probe holds one trained target fixed per target-steps setting and
sweeps draft shape x distill steps x lr x distill temperature, measuring
the star-tree rank-1 for each (quick: 4 prompts x 24 steps)."""

import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.planner.acceptance import dynamic_acceptance
    from sequoia_tpu.tools.distill import (
        _shape_cfg,
        corpus_from_reference,
        train_lm,
    )

    base = get_config("test-small")
    data = corpus_from_reference(vocab_size=base.vocab_size, seq_len=64)
    prompts = [np.asarray(row[:24], np.int32) for row in data[:4]]

    import dataclasses

    import optax

    targets = {}
    for tsteps in (400, 800):
        tcfg = _shape_cfg(base, 8, 256)
        t0 = time.perf_counter()
        targets[tsteps] = (train_lm(tcfg, data, steps=tsteps, seed=0), tcfg)
        log(f"target {tsteps} steps: {time.perf_counter() - t0:.0f}s")

    def rank1(draft, dcfg, target, tcfg):
        vec = np.asarray(dynamic_acceptance(
            draft, dcfg, target, tcfg, prompts, width=16,
            steps_per_prompt=24, max_length=160, temperature=0.6))
        return float(vec[1])

    # Phase 1 (committed in the probe log): lr 1e-3 beats 3e-3, the
    # less-trained t800 target beats t1600 everywhere, same-shape draft
    # @8000 lr1e-3 peaked at rank1=0.677. Phase 2: longer + lr decay +
    # distill temperature + mixed CE, on the easier targets.
    rows = []
    for tsteps, dsteps, tau, mce in (
        (800, 24000, 1.0, 0.0),
        (800, 24000, 0.7, 0.0),
        (800, 24000, 1.0, 0.5),
        (400, 12000, 1.0, 0.5),
    ):
        target, tcfg = targets[tsteps]
        dcfg = _shape_cfg(base, 8, 256)
        dcfg = dataclasses.replace(dcfg, vocab_size=tcfg.vocab_size)
        sched = optax.cosine_decay_schedule(1.5e-3, dsteps, alpha=0.05)
        t0 = time.perf_counter()
        draft = train_lm(dcfg, data, steps=dsteps, seed=1, lr=sched,
                         teacher=(target, tcfg), distill_temperature=tau,
                         mix_ce=mce)
        r1 = rank1(draft, dcfg, target, tcfg)
        rows.append((tsteps, dsteps, tau, mce, r1))
        log(f"t{tsteps} d8L-256h @{dsteps} cos tau={tau} mce={mce}: "
            f"rank1={r1:.3f} ({time.perf_counter() - t0:.0f}s)")
    rows.sort(key=lambda r: -r[-1])
    log("best: " + str(rows[0]))


if __name__ == "__main__":
    main()
