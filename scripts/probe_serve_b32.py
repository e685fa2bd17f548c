#!/usr/bin/env python
"""Ground-truth batched serving throughput at B=32 via the REAL device loop.

The bench's timed_full fori_loop harness (pinned gtl, carried state) showed
77 ms/iteration at B=32 while the phases in isolation sum to 32.5 ms. If
that gap is a harness artifact (the pinning `_replace` forcing copies), the
real `generate_batch_fast` while_loop — donated state, true gtl evolution —
won't show it. Measures wall-clock tokens/sec from generate_batch_fast with
random weights and reports ms/iteration from the step counter.
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--quant", type=int, default=8, choices=[4, 8],
                    help="target weight quantization bits")
    ap.add_argument("--kv-quant", default="int8")
    ap.add_argument("--max-new", type=int, default=96)
    ap.add_argument("--tree", default="measured",
                    help="'measured' = B=32 curve from the last bench run, "
                         "or 'DxK' uniform tree")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.engine.batched import BatchedSpecEngine
    from sequoia_tpu.planner.dp import expected_accepted, plan
    from sequoia_tpu.planner.profile import default_acceptance_vector
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
    if args.tree == "measured":
        gm, _ = plan(p, [1, 2, 4, 8], [0.0441, 0.0441, 0.0465, 0.0567],
                     0.00062, max_depth=14)
    else:
        d, k = map(int, args.tree.split("x"))
        gm = uniform_tree(d, k)
    log(f"tree size={gm.size} depth={int(gm.depth.max())} "
        f"E[acc]={expected_accepted(gm, p):.3f}")

    eng = BatchedSpecEngine(dparams, dcfg, tparams, tcfg, gm,
                            algorithm="sequoia", max_length=256,
                            temperature=0.6, top_p=0.9, prefill_chunk=128,
                            batch_size=B, kv_quant=args.kv_quant)
    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=128)
    prompts = [prompt] * B

    # warmup: compile prefill + loop
    eng.generate_batch_fast(prompts, max_new_tokens=4)

    t0 = time.perf_counter()
    outs = eng.generate_batch_fast(prompts, max_new_tokens=args.max_new)
    dt = time.perf_counter() - t0
    steps = eng.num_large_model_steps
    toks = eng.num_decoding_steps
    # Separate the prefill cost with a tiny run (4 new tokens ~= 2 steps).
    t0 = time.perf_counter()
    eng.generate_batch_fast(prompts, max_new_tokens=4)
    dt_short = time.perf_counter() - t0
    steps_short = eng.num_large_model_steps

    it_ms = (dt - dt_short) / max(steps - steps_short, 1) * 1e3
    log(f"generate_batch_fast: {toks} tokens in {dt:.2f}s "
        f"({steps} iterations) -> {toks/dt:.0f} tok/s raw")
    log(f"differenced: {it_ms:.2f} ms/iteration; with E[acc] "
        f"{expected_accepted(gm, p):.2f} -> "
        f"{B * expected_accepted(gm, p) / (it_ms/1e3):.0f} tok/s/chip")


if __name__ == "__main__":
    main()
