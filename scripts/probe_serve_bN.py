#!/usr/bin/env python
"""Batched serving throughput at arbitrary B via the REAL device loop.

Measures the batched target latency curve in-process (like bench.py's
batched section), plans the batch-aware tree, then times
generate_batch_fast (differenced). At large B the target forward is
compute-bound and the DP should collapse to a small tree/chain — this
probe finds the serving sweet spot (B, tree) per chip.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--quant", type=int, default=8, choices=[4, 8])
    ap.add_argument("--kv-quant", default="int8")
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--max-length", type=int, default=256)
    ap.add_argument("--budgets", default="1,2,4,8,16")
    ap.add_argument("--draft-time-ms", type=float, default=None,
                    help="planner per-level draft cost override. The "
                         "standalone draft-loop measurement below is VMEM-"
                         "resident and unrepresentative of the fused "
                         "iteration (see bench.py --draft-time-ms); without "
                         "this override the DP may plan over-deep trees")
    ap.add_argument("--tree", default="plan",
                    help="'plan' = measure curve + DP, or 'DxK' uniform")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.engine.batched import BatchedSpecEngine
    from sequoia_tpu.planner.dp import expected_accepted, plan
    from sequoia_tpu.planner.profile import (
        default_acceptance_vector,
        time_forward_widths,
    )
    from sequoia_tpu.quant.quantize import random_quantized_model
    from sequoia_tpu.trees.growmap import uniform_tree

    log(f"devices: {jax.devices()}")
    B = args.batch
    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=args.quant)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tparams.embed, dparams.embed))

    p = default_acceptance_vector()
    if args.tree == "plan":
        budgets = tuple(int(x) for x in args.budgets.split(","))
        tt = time_forward_widths(
            tparams, tcfg, budgets, max_length=args.max_length,
            kv_len=128, reps=12, batch=B, kv_quant=args.kv_quant)
        if args.draft_time_ms is not None:
            dt = args.draft_time_ms / 1e3
            dt_note = "override"
        else:
            dt = time_forward_widths(
                dparams, dcfg, (4,), max_length=args.max_length,
                kv_len=128, reps=20, batch=B)[0]
            dt_note = "standalone-loop measurement; VMEM-resident, may plan too deep"
        log(f"B={B} target_time(ms): {[round(t*1e3, 2) for t in tt]}; "
            f"draft level {dt*1e3:.2f} ms ({dt_note})")
        gm, _ = plan(p, list(budgets), tt, dt, max_depth=8)
    else:
        d, k = map(int, args.tree.split("x"))
        gm = uniform_tree(d, k)
    e = expected_accepted(gm, p)
    log(f"tree size={gm.size} depth={int(gm.depth.max())} E[acc]={e:.3f}")

    eng = BatchedSpecEngine(dparams, dcfg, tparams, tcfg, gm,
                            algorithm="sequoia", max_length=args.max_length,
                            temperature=0.6, top_p=0.9, prefill_chunk=128,
                            batch_size=B, kv_quant=args.kv_quant)
    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=128)
    prompts = [prompt] * B

    eng.generate_batch_fast(prompts, max_new_tokens=4)  # compile

    t0 = time.perf_counter()
    eng.generate_batch_fast(prompts, max_new_tokens=args.max_new)
    dt_l = time.perf_counter() - t0
    steps_l = eng.num_large_model_steps
    toks = eng.num_decoding_steps
    t0 = time.perf_counter()
    eng.generate_batch_fast(prompts, max_new_tokens=4)
    dt_s = time.perf_counter() - t0
    steps_s = eng.num_large_model_steps

    it_ms = (dt_l - dt_s) / max(steps_l - steps_s, 1) * 1e3
    log(f"generate_batch_fast: {toks} tokens in {dt_l:.2f}s "
        f"({steps_l} iterations) -> {toks/dt_l:.0f} tok/s raw; "
        f"measured emitted/step {toks / max(steps_l * B, 1):.2f} "
        f"(random weights)")
    log(f"differenced: {it_ms:.2f} ms/iteration; with canned 68m->7b "
        f"E[acc] {e:.2f} -> {B * e / (it_ms/1e3):.0f} tok/s/chip (projected, "
        f"assumes that pair's acceptance profile)")


if __name__ == "__main__":
    main()
