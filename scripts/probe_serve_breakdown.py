#!/usr/bin/env python
"""Where does batched-spec SERVING throughput go? (round-5 serving matrix:
spec serve_fast realizes ~25% of its steady-state iteration rate while AR
realizes ~85%, and the per-completion overhead differs ~10x.)

Instruments one serve_fast run per engine at one workload shape: wall time
split into (device loop dispatches, refill prefill+insert, host fetch) by
monkeypatching the loop/insert entry points, plus dispatch and completion
counts.
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--gen", type=int, default=48)
    ap.add_argument("--max-length", type=int, default=320)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.engine.batched import BatchedAREngine, BatchedSpecEngine
    from sequoia_tpu.planner.dp import plan
    from sequoia_tpu.planner.profile import (
        default_acceptance_vector,
        time_forward_widths,
    )
    from sequoia_tpu.quant.quantize import random_quantized_model

    log(f"devices: {jax.devices()}")
    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tparams.embed, dparams.embed))

    B, M = args.batch, args.max_length
    p = default_acceptance_vector()
    bb = (1, 4, 8, 16)
    btt = time_forward_widths(tparams, tcfg, bb, max_length=M, kv_len=96,
                              reps=10, batch=B, kv_quant="int8")
    bdt = time_forward_widths(dparams, dcfg, (4,), max_length=M, kv_len=96,
                              reps=16, batch=B)[0]
    bgm, _ = plan(p, list(bb), btt, bdt, max_depth=14, max_branch=8)
    log(f"tree S={bgm.size}")

    rng = np.random.default_rng(23)
    lens = [32, 64, 96]
    q = [rng.integers(10, tcfg.vocab_size, size=lens[i % 3])
         for i in range(2 * B)]

    def instrument(eng, loop_names, insert_name, prefill_name):
        acc = {"loop": 0.0, "loop_n": 0, "insert": 0.0, "insert_n": 0,
               "prefill": 0.0, "prefill_n": 0}

        def wrap(name, key):
            orig = getattr(eng, name)

            def f(*a, **k):
                t0 = time.perf_counter()
                out = orig(*a, **k)
                jax.block_until_ready(jax.tree.leaves(out)[0])
                acc[key] += time.perf_counter() - t0
                acc[key + "_n"] += 1
                return out

            setattr(eng, name, f)

        for n in loop_names:
            wrap(n, "loop")
        wrap(insert_name, "insert")
        wrap(prefill_name, "prefill")
        return acc

    out = {}
    for kind in ("spec", "ar"):
        if kind == "spec":
            eng = BatchedSpecEngine(
                dparams, dcfg, tparams, tcfg, bgm, algorithm="sequoia",
                max_length=M, temperature=0.6, top_p=0.9, prefill_chunk=64,
                batch_size=B, kv_quant="int8")
            loops = ("_bserve_until_all", "_bserve_until_any")
            ins, pf = "insert_slot", "prefill"
        else:
            eng = BatchedAREngine(
                tparams, tcfg, batch_size=B, max_length=M, temperature=0.6,
                top_p=0.9, prefill_chunk=64, kv_quant="int8")
            loops = ("_bar_until_all", "_bar_until_any")
            ins, pf = "_insert_slot_fn", "_prefill_state"
        eng.serve_fast(q, max_new_tokens=4)  # warm (full queue: refill path)
        acc = instrument(eng, loops, ins, pf)
        t0 = time.perf_counter()
        eng.serve_fast(q, max_new_tokens=args.gen)
        total = time.perf_counter() - t0
        toks = eng.num_decoding_steps
        steps = eng.num_large_model_steps
        other = total - acc["loop"] - acc["insert"] - acc["prefill"]
        row = {
            "total_s": round(total, 3),
            "tokens": int(toks),
            "tokens_per_sec": round(toks / total, 1),
            "device_loop_s": round(acc["loop"], 3),
            "device_loop_dispatches": acc["loop_n"],
            "large_model_steps": int(steps),
            "per_loop_dispatch_ms": round(
                acc["loop"] / max(acc["loop_n"], 1) * 1e3, 2),
            "refill_prefill_s": round(acc["prefill"], 3),
            "refill_prefill_n": acc["prefill_n"],
            "insert_s": round(acc["insert"], 3),
            "insert_n": acc["insert_n"],
            "host_other_s": round(other, 3),
        }
        log(f"{kind}: {json.dumps(row)}")
        out[kind] = row
        del eng
        import gc
        jax.clear_caches()
        gc.collect()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
