#!/usr/bin/env python
"""A/B: per-edge path walk vs per-node unrolled walk (walk='path' vs
'node') in the fused 13B iteration.

BENCH13B_r04's in-loop breakdown attributes 1.06 ms of the 19.54 ms
iteration to walk+bonus. The per-edge `lax.while_loop` pays its trip
overhead once per TESTED EDGE (~depth + E[rejected ranks] trips); the
node walk (trees/accept.py::stochastic_path_walk_node) resolves a whole
node per trip (~accepted-depth trips) with the rank scan unrolled and
predicated in the body. This probe measures both engines on the SAME
growmap / weights / state with the salted differenced estimator.

MEASURED (v5e, 13B int8, S=80 d=7 mb=11 tree, median of 5): path
20.180 ms/iteration vs node 20.175 — a wash. Halving the while-loop
trip count does not move the iteration: the walk's cost is the LATENCY
of its sequential [vocab]-row op chain (gather -> softmax -> compare ->
residual), which is identical under either loop partitioning, not the
loop-carry overhead. The per-edge walk stays the default; the node walk
remains available (walk='node') as the tested alternative.
"""

import argparse
import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="llama-2-13b")
    ap.add_argument("--draft", default="llama-68m")
    ap.add_argument("--max-length", type=int, default=256)
    ap.add_argument("--prefix-len", type=int, default=128)
    ap.add_argument("--reps", type=int, default=24)
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--budget", type=int, default=80)
    ap.add_argument("--max-branch", type=int, default=11)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import importlib
    bench = importlib.import_module("bench")

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.engine.engine import SpecEngine
    from sequoia_tpu.planner.dp import expected_accepted, plan
    from sequoia_tpu.planner.profile import default_acceptance_vector
    from sequoia_tpu.quant.quantize import random_quantized_model

    log(f"devices: {jax.devices()}")
    tcfg = get_config(args.target)
    dcfg = get_config(args.draft)
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tparams.embed, dparams.embed))

    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=args.prefix_len)

    p = default_acceptance_vector()
    # The BENCH13B_r04 winner: budget 80 at the measured t(80); the absolute
    # t value only shapes the tree, not this A/B, so a representative
    # constant is fine.
    gm, _ = plan(p, [args.budget], [18.9e-3], 0.15e-3, max_depth=10,
                 max_branch=args.max_branch)
    log(f"tree: size={gm.size} depth={int(gm.depth.max())} "
        f"mb={gm.max_branch} E={float(expected_accepted(gm, p)):.3f}")

    def med(fn, n):
        vals = sorted(fn() for _ in range(n))
        return vals[len(vals) // 2]

    results = {}
    for walk in ("path", "node"):
        eng = SpecEngine(dparams, dcfg, tparams, tcfg, gm,
                         algorithm="sequoia", max_length=args.max_length,
                         temperature=0.6, top_p=0.9, prefill_chunk=128,
                         walk=walk)
        state = eng.prefill(prompt)
        t = med(lambda: bench._fused_iter_time(eng, state, reps=args.reps),
                args.samples)
        results[walk] = t
        log(f"walk={walk:5s}: {t * 1e3:.3f} ms/iteration "
            f"(median of {args.samples})")
    d = (results["path"] - results["node"]) * 1e3
    log(f"node walk delta: {d:+.3f} ms "
        f"({'WIN' if d > 0 else 'no win'})")


if __name__ == "__main__":
    main()
