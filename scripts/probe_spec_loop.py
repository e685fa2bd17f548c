#!/usr/bin/env python
"""Focused single-request spec-loop timing (the bench section 3 measurement)
for regression hunting: 7B int8 target + 68m int8 draft, the standard
size-64 planner tree, differenced generate_fast pairs."""

import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, ".")
    import jax

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.engine.engine import SpecEngine
    from sequoia_tpu.planner.dp import plan
    from sequoia_tpu.planner.profile import default_acceptance_vector
    from sequoia_tpu.quant.quantize import random_quantized_model
    import numpy as np

    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    t0 = time.perf_counter()
    tp = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dp = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tp.embed, dp.embed))
    log(f"init {time.perf_counter()-t0:.0f}s")

    p = default_acceptance_vector()
    tt = [0.01075, 0.01062, 0.01071, 0.01098, 0.0107, 0.01181, 0.01129, 0.01286]
    gm, _ = plan(p, [1, 2, 4, 8, 16, 32, 64, 128], tt, 0.0001, max_depth=14)
    log(f"tree size={gm.size} depth={int(gm.depth.max())} widths={gm.level_widths}")

    eng = SpecEngine(dp, dcfg, tp, tcfg, gm, algorithm="sequoia",
                     max_length=256, temperature=0.6, top_p=0.9,
                     prefill_chunk=128)
    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=128)
    eng.generate_fast(prompt, max_new_tokens=4)

    def timed_run(n):
        t0 = time.perf_counter()
        eng.generate_fast(prompt, max_new_tokens=n)
        return time.perf_counter() - t0, max(eng.num_large_model_steps, 1)

    vals = []
    for _ in range(3):
        dt_s, it_s = timed_run(4)
        dt_l, it_l = timed_run(96)
        vals.append((dt_l - dt_s) / (it_l - it_s))
    vals.sort()
    log(f"spec loop: {[round(v*1e3, 2) for v in vals]} ms/iteration (median {vals[1]*1e3:.2f})")


if __name__ == "__main__":
    main()
