#!/usr/bin/env python
"""Ablation timing of the fused iteration: which finalize pieces cost real
wall-clock inside the full fused loop (not in isolation)?

Variants (all same growmap / models, measured as R reps of the fused
iteration inside one jit, gtl clamped):
  full        sequoia, top_p=0.9   (production config)
  nofilter    sequoia, top_p=1.0   (no nucleus bisection)
  greedy      greedy verification  (no stochastic accept walk / residuals)
"""

import argparse
import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--growmap", default="growmaps/TPU-v5-lite-llama-2-7b-int8-llama-68m-stochastic-S64.json")
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.init import random_params
    from sequoia_tpu.engine.engine import SpecEngine
    from sequoia_tpu.quant.quantize import random_quantized_model
    from sequoia_tpu.trees.growmap import GrowMap

    log(f"devices: {jax.devices()}")
    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    t0 = time.perf_counter()
    bits = {"int8": 8, "int4": 4}[args.quant]
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=bits)
    dparams = random_params(dcfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    jax.block_until_ready((tparams.embed, dparams.embed))
    log(f"param init: {time.perf_counter() - t0:.1f}s")
    gm = GrowMap.load(args.growmap)

    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=128)
    R = args.reps

    def run_variant(tag, **kw):
        eng = SpecEngine(dparams, dcfg, tparams, tcfg, gm,
                         max_length=256, prefill_chunk=128, **kw)
        state = eng.prefill(prompt)

        @jax.jit
        def loop(dp, tp, state):
            def body(i, st):
                st2, stats = eng._iterate_impl(dp, tp, st)
                return st2._replace(gtl=st.gtl, terminal=jnp.asarray(False))
            return jax.lax.fori_loop(0, R, body, state)

        out = loop(dparams, tparams, state)
        jax.block_until_ready(out.tokens)
        t0 = time.perf_counter()
        out = loop(dparams, tparams, state)
        jax.block_until_ready(out.tokens)
        dt = (time.perf_counter() - t0) / R
        log(f"{tag:10s}: {dt * 1e3:8.3f} ms/iteration")
        return dt

    t_full = run_variant("full", algorithm="sequoia", temperature=0.6, top_p=0.9)
    t_nof = run_variant("nofilter", algorithm="sequoia", temperature=0.6, top_p=1.0)
    t_gr = run_variant("greedy", algorithm="greedy", temperature=0.6, top_p=0.9)
    log("-" * 40)
    log(f"nucleus bisection cost: {(t_full - t_nof) * 1e3:.3f} ms")
    log(f"stochastic walk vs greedy: {(t_nof - t_gr) * 1e3:.3f} ms (also drops WOR sampling)")


if __name__ == "__main__":
    main()
