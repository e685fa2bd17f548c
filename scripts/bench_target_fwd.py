#!/usr/bin/env python
"""Full-model target-forward latency for each quantized-matmul routing.

The model forward is the real ruler (microbench loops carry ~0.5 ms/rep of
fixed overhead on this platform, drowning single-matmul effects). Measures
width-64 tree-verify forward latency + effective weight bandwidth for:
  int8/xla, int8/pallas, int4/pallas, and optionally an XLA-native jnp.int4
  stacked-scan probe (hardware unpack path).
"""

import gc
import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.planner.profile import time_forward_widths
    from sequoia_tpu.quant.quantize import model_bytes, random_quantized_model
    from sequoia_tpu.quant.qtensor import set_quant_matmul_impl

    log(f"devices: {jax.devices()}")
    cfg = get_config("llama-2-7b")

    # ---- jnp.int4 probe first (small, fails fast if unsupported) ----------
    try:
        K, N, L = 4096, 11008, 8

        @jax.jit
        def make_w(key):
            w = jax.random.randint(key, (L, K, N), -7, 8, jnp.int8)
            return w.astype(jnp.int4)

        w4 = make_w(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (64, K), jnp.bfloat16)

        @jax.jit
        def scan_mm(x, w4):
            def body(h, w):
                y = jnp.dot(h, w.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                return y[:, :K].astype(jnp.bfloat16) + h, None

            h, _ = jax.lax.scan(body, x, w4)
            return h.astype(jnp.float32).mean()

        out = float(scan_mm(x, w4))
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = float(scan_mm(x, w4))
        dt = (time.perf_counter() - t0) / reps
        per_layer = dt / L
        bw = (K * N // 2) / per_layer / 1e9
        log(f"jnp.int4 xla scan probe: {per_layer * 1e3:.3f} ms/matmul "
            f"({bw:.0f} GB/s eff on packed bytes) [includes dispatch/L]")
        del w4, x
        gc.collect()
    except Exception as e:
        log(f"jnp.int4 probe FAILED: {type(e).__name__}: {str(e)[:200]}")

    def measure(tag, params):
        t = time_forward_widths(params, cfg, [64], max_length=256, kv_len=128,
                                warmup=1, reps=30)[0]
        nbytes = model_bytes(params)
        log(f"{tag:14s}: {t * 1e3:7.3f} ms/fwd  "
            f"({nbytes / 1e9:.2f} GB params -> {nbytes / t / 1e9:6.0f} GB/s eff)")
        return t

    t0 = time.perf_counter()
    p8 = random_quantized_model(cfg, jax.random.PRNGKey(0), bits=8)
    jax.block_until_ready(p8.embed)
    log(f"int8 init: {time.perf_counter() - t0:.0f}s")
    set_quant_matmul_impl("xla")
    measure("int8/xla", p8)
    set_quant_matmul_impl("pallas")
    measure("int8/pallas", p8)
    del p8
    gc.collect()

    t0 = time.perf_counter()
    p4 = random_quantized_model(cfg, jax.random.PRNGKey(0), bits=4)
    jax.block_until_ready(p4.embed)
    log(f"int4 init: {time.perf_counter() - t0:.0f}s")
    set_quant_matmul_impl("pallas")
    measure("int4/pallas", p4)
    set_quant_matmul_impl("auto")


if __name__ == "__main__":
    main()
