#!/usr/bin/env python
"""7B bf16 overhead attack (round-5 judge item #1): attribute the parity
row's iteration overhead (round-4: 1.845 ms at S=128; re-measured round-5:
~0.9 ms at S=96) INSIDE the full fused iteration, then re-measure the
candidate trees with the winning walk config.

Custom ablation loop bodies (the 13B script's approach) change XLA's layout
choices on the 13.5 GB stacked weights — 3 GB of relayout copies OOM'd the
chip twice. Here every variant IS the production engine with one element
swapped (engine._ablate stubs / walk= option / top_p), so the program
structure — and the layouts — stay those of the real iteration:

  base        walk="path" top_p=0.9         (the round-4 default)
  node        walk="node"
  unrolled    walk="unrolled"               (new: no while_loop)
  staged      walk="staged"
  nofilter    top_p=1.0                     -> nucleus-threshold cost
  fixedwalk   _ablate={fixed_walk}          -> walk+bonus total
  noredraft   _ablate={fixed_walk,no_redraft} -> + width-1 draft forward
  nosample    constant grow tokens          -> WOR race + gumbel pool cost

All timed with bench._fused_iter_time (salted, differenced, median-of-3).
"""

import argparse
import json
import os as _os
import sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="llama-2-7b")
    ap.add_argument("--draft", default="llama-68m")
    ap.add_argument("--max-length", type=int, default=384)
    ap.add_argument("--prefix-len", type=int, default=128)
    ap.add_argument("--cap", type=int, default=96)
    ap.add_argument("--mb", type=int, default=7)
    ap.add_argument("--reps", type=int, default=24)
    ap.add_argument("--ref-speedup", type=float, default=4.04)
    ap.add_argument("--dst", default="/tmp/ablate7b.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.init import random_params
    from sequoia_tpu.engine.baseline import ARBaseline
    from sequoia_tpu.engine.engine import SpecEngine
    from sequoia_tpu.planner.dp import expected_accepted, plan
    from sequoia_tpu.planner.profile import (
        default_acceptance_vector,
        measure_latency_curve,
    )
    from sequoia_tpu.quant.quantize import random_quantized_model

    import importlib
    bench = importlib.import_module("bench")

    log(f"devices: {jax.devices()}")
    tcfg = get_config(args.target)
    dcfg = get_config(args.draft)
    M = args.max_length
    t0 = time.perf_counter()
    tparams = random_params(tcfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tparams.embed, dparams.embed))
    log(f"param init: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=args.prefix_len)

    ar = ARBaseline(tparams, tcfg, max_length=M, temperature=0.6, top_p=0.9,
                    greedy=False, prefill_chunk=128)
    ar.generate_fast(prompt, max_new_tokens=8)
    t_base = bench._ar_step_time(ar, prompt)
    log(f"AR baseline: {t_base * 1e3:.3f} ms/token")

    budgets, target_time, _ = measure_latency_curve(
        dparams, dcfg, tparams, tcfg, budgets=(1, 64, args.cap, 128),
        max_length=M, kv_len=args.prefix_len)
    t_tgt = target_time[budgets.index(args.cap)]
    log("curve: " + ", ".join(f"t({b})={t*1e3:.2f}" for b, t in
                              zip(budgets, target_time)))

    p = default_acceptance_vector()
    gm, _ = plan(p, [args.cap], [t_tgt], 0.15e-3, max_depth=10,
                 max_branch=args.mb)
    e_c = expected_accepted(gm, p)
    log(f"tree S={gm.size} d={int(gm.depth.max())} mb={gm.max_branch} "
        f"E={e_c:.3f}")

    def mk(walk="path", top_p=0.9, ablate=frozenset()):
        eng = SpecEngine(dparams, dcfg, tparams, tcfg, gm,
                         algorithm="sequoia", max_length=M, temperature=0.6,
                         top_p=top_p, prefill_chunk=128, walk=walk)
        eng._ablate = frozenset(ablate)
        return eng

    times = {}

    def measure(name, eng, patch_sample=False):
        if patch_sample:
            orig = eng._draft_grow_sample

            def cheap(key, level, logits_roots, gumbel_rows=None):
                w = len(eng._level_gather[level])
                return (jnp.full((w,), 7, jnp.int32)
                        + logits_roots.reshape(-1)[0].astype(jnp.int32) % 3)

            eng._draft_grow_sample = cheap
        state = eng.prefill(prompt)
        t = bench._fused_iter_time(eng, state, reps=args.reps)
        if patch_sample:
            eng._draft_grow_sample = orig
        times[name] = t
        ratio = e_c * t_base / t / args.ref_speedup
        log(f"{name:>10}: {t * 1e3:7.3f} ms/iter  ovh "
            f"{(t - t_tgt) * 1e3:6.3f} ms  ratio {ratio:.3f}")
        del state
        return t

    measure("base", mk("path"))
    measure("node", mk("node"))
    measure("unrolled", mk("unrolled"))
    measure("staged", mk("staged"))
    measure("nofilter", mk("path", top_p=1.0))
    measure("fixedwalk", mk("path", ablate={"fixed_walk"}))
    measure("noredraft", mk("path", ablate={"fixed_walk", "no_redraft"}))
    measure("nosample", mk("path"), patch_sample=True)

    t_full = times["base"]
    log("-" * 56)
    log(f"{'verify curve t(cap)':>30}: {t_tgt * 1e3:7.3f} ms")
    log(f"{'total overhead (base-curve)':>30}: {(t_full - t_tgt) * 1e3:7.3f} ms")
    log(f"{'walk+bonus (base-fixedwalk)':>30}: "
        f"{(t_full - times['fixedwalk']) * 1e3:7.3f} ms")
    log(f"{'  nucleus (base-nofilter)':>30}: "
        f"{(t_full - times['nofilter']) * 1e3:7.3f} ms")
    log(f"{'redraft (fixedwalk-noredraft)':>30}: "
        f"{(times['fixedwalk'] - times['noredraft']) * 1e3:7.3f} ms")
    log(f"{'WOR race (base-nosample)':>30}: "
        f"{(t_full - times['nosample']) * 1e3:7.3f} ms")
    log(f"{'walk A/B: node-base':>30}: "
        f"{(times['node'] - t_full) * 1e3:7.3f} ms")
    log(f"{'walk A/B: unrolled-base':>30}: "
        f"{(times['unrolled'] - t_full) * 1e3:7.3f} ms")
    log(f"{'walk A/B: staged-base':>30}: "
        f"{(times['staged'] - t_full) * 1e3:7.3f} ms")

    out = {
        "tree": {"size": gm.size, "depth": int(gm.depth.max()),
                 "max_branch": gm.max_branch, "E": round(float(e_c), 3)},
        "ar_ms": round(t_base * 1e3, 3),
        "t_tgt_ms": round(t_tgt * 1e3, 3),
        "times_ms": {k: round(v * 1e3, 3) for k, v in times.items()},
    }
    json.dump(out, open(args.dst, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
