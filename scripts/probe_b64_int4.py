#!/usr/bin/env python
"""B=64 int4-KV cliff probe (round-5 judge item #3).

The committed B=64 crossover row ran 104.37 ms/iteration — 4x the B=32 row
for 2x the batch (BENCH_r04). Suspect: `unpack_kv_rows4` + concat in the
batched verify attention forced the unpacked int4 cache to MATERIALIZE
(the concatenate blocks XLA's unpack-into-dot fusion), quadrupling the KV
read traffic. core/model.py now uses a concat-free two-dot split; this
probe re-measures the same crossover rows (B=64, and the B=96/128
extension) through the exact bench `_crossover_sweep` machinery.
"""

import argparse
import json
import os as _os
import sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,96,128")
    ap.add_argument("--max-length", type=int, default=256,
                    help="B=96/128 need M<=192: the timing loop keeps two "
                         "KV copies (carry + live input) and 2x the int4 "
                         "cache at M=256 tips 16 GB")
    ap.add_argument("--kv-quant", default="int4")
    ap.add_argument("--dst", default="/tmp/probe_b64.json")
    args_p = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import importlib
    bench = importlib.import_module("bench")

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.planner.profile import default_acceptance_vector
    from sequoia_tpu.quant.quantize import random_quantized_model

    log(f"devices: {jax.devices()}")
    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    t0 = time.perf_counter()
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tparams.embed, dparams.embed))
    log(f"param init: {time.perf_counter() - t0:.1f}s")

    bargs = argparse.Namespace(
        max_length=args_p.max_length,
        prefix_len=min(128, args_p.max_length - 64),
        max_depth=14, max_branch=8,
        batched_kv_quant=args_p.kv_quant,
    )
    rows = bench._crossover_sweep(
        bargs, dparams, dcfg, tparams, tcfg, default_acceptance_vector(),
        [int(b) for b in args_p.batches.split(",")])
    out = {"rows": rows,
           "note": "concat-free int4-KV unpack (core/model.py); compare "
                   "BENCH_r04 crossover B=64: 104.37 ms/iteration"}
    json.dump(out, open(args_p.dst, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
