#!/usr/bin/env python
"""Standalone B=64 crossover row: does 7B-int8 + B=64 KV fit a clean
16 GB chip at all, or do earlier bench sections pin the difference?
Prints device memory stats at each stage."""

import argparse
import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def mem(tag):
    import jax

    s = jax.local_devices()[0].memory_stats() or {}
    used = s.get("bytes_in_use", 0) / 1e9
    lim = s.get("bytes_limit", 0) / 1e9
    log(f"[mem] {tag}: {used:.2f} / {lim:.2f} GB")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--kv-quant", default="int8")
    ap.add_argument("--max-length", type=int, default=256)
    ap.add_argument("--prefix-len", type=int, default=128)
    ap.add_argument("--max-depth", type=int, default=14)
    ap.add_argument("--max-branch", type=int, default=8)
    args = ap.parse_args()
    args.batched_kv_quant = args.kv_quant

    import jax

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
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tparams.embed, dparams.embed))
    mem("params resident")

    p = default_acceptance_vector()
    rows = bench._crossover_sweep(args, dparams, dcfg, tparams, tcfg, p,
                                  [args.batch])
    mem("after sweep")
    print(rows)


if __name__ == "__main__":
    main()
