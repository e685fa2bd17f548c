#!/usr/bin/env python
"""In-model A/B: llama-2-7b int8 verify-forward latency vs width, with the
w8a8 activation-quant int8-MXU dot ON vs OFF (weight-only convert+dot).

This is the full-model version of scripts/probe_w8a8_widths.py: it decides
the $SEQUOIA_W8A8 auto-routing threshold and whether the planner's latency
curve should be profiled with w8a8 enabled (bigger trees only pay off if the
wide verify stays ~bandwidth-bound).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    log(f"devices: {jax.devices()}")

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.planner.profile import time_forward_widths
    from sequoia_tpu.quant import qtensor
    from sequoia_tpu.quant.quantize import random_quantized_model

    cfg = get_config("llama-2-7b")
    params = random_quantized_model(cfg, jax.random.PRNGKey(0), bits=8)
    jax.block_until_ready(params.embed)

    widths = (1, 64, 96, 128, 192, 256)
    for mode in ("off", "on"):
        qtensor.set_w8a8(mode)
        t0 = time.perf_counter()
        tt = time_forward_widths(
            params, cfg, widths, max_length=512, kv_len=128, reps=20)
        log(f"w8a8={mode}: target_time(ms) {list(zip(widths, [round(t*1e3, 2) for t in tt]))} "
            f"({time.perf_counter() - t0:.0f}s wall)")
    qtensor.set_w8a8("auto")


if __name__ == "__main__":
    main()
