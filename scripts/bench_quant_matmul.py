#!/usr/bin/env python
"""Microbenchmark: quantized matmul implementations on the real chip.

Compares xla vs pallas routing for int8 / packed-int4 at decode-like shapes
(rows = tree budget). Reports ms/call and effective weight bandwidth
(quantized bytes / time), the speed-of-light ruler for weight-bound decode.
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
    ap.add_argument("--rows", type=int, nargs="*", default=[1, 64])
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sequoia_tpu.quant.qtensor import (
        QuantizedTensor,
        matmul,
        quantize_int4,
        quantize_int8,
        set_quant_matmul_impl,
    )

    log(f"devices: {jax.devices()}")
    shapes = [(4096, 4096), (4096, 11008)]
    key = jax.random.PRNGKey(0)

    for K, N in shapes:
        w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
        q8 = quantize_int8(w)
        q4 = quantize_int4(w)
        w = None
        for R in args.rows:
            x = jax.random.normal(key, (R, K), jnp.bfloat16)
            for impl in ("xla", "pallas"):
                set_quant_matmul_impl(impl)
                for bits, qt in ((8, q8), (4, q4)):
                    qbytes = qt.q.size

                    @jax.jit
                    def reps(x, qt=qt):
                        def body(i, acc):
                            # acc depends on the FULL output (blocks XLA
                            # slice-pushdown into the dot) and perturbs x
                            # (blocks loop-invariant hoisting).
                            y = matmul(x + (acc * 1e-20).astype(x.dtype), qt)
                            return jnp.mean(y.astype(jnp.float32))
                        return jax.lax.fori_loop(
                            0, args.reps, body, jnp.float32(0))

                    try:
                        out = reps(x)
                        jax.block_until_ready(out)
                        t0 = time.perf_counter()
                        out = reps(x)
                        jax.block_until_ready(out)
                        dt = (time.perf_counter() - t0) / args.reps
                        bw = qbytes / dt / 1e9
                        log(f"K={K:6d} N={N:6d} R={R:3d} {impl:6s} int{bits}: "
                            f"{dt * 1e3:8.3f} ms  {bw:7.1f} GB/s eff")
                    except Exception as e:
                        log(f"K={K:6d} N={N:6d} R={R:3d} {impl:6s} int{bits}: "
                            f"FAILED {type(e).__name__}: {str(e)[:120]}")
    set_quant_matmul_impl("xla")


if __name__ == "__main__":
    main()
