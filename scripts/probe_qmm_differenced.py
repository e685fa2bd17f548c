#!/usr/bin/env python
"""Differenced (RTT-free) timing of quantized matmuls on the 7B shapes.

A single dispatch over the axon tunnel costs ~24 ms wall-clock no matter how
small the computation, so `total/reps` at reps=30 reads >=0.8 ms for ANY op.
Run the same on-device loop at two rep counts and difference:
t = (T(R2) - T(R1)) / (R2 - R1).
"""

import sys
import time
import functools

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_loop(f, reps):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = f(i, *a)
            return acc + jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0), unroll=False)
    return loop


def diff_time(f, *args, r1=10, r2=210):
    l1, l2 = make_loop(f, r1), make_loop(f, r2)
    float(l1(*args)); float(l2(*args))  # compile both
    t0 = time.perf_counter(); float(l1(*args)); T1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(l2(*args)); T2 = time.perf_counter() - t0
    return (T2 - T1) / (r2 - r1)


def main():
    sys.path.insert(0, ".")
    from sequoia_tpu.kernels.quant_matmul import quant_matmul
    from sequoia_tpu.quant import qtensor

    key = jax.random.PRNGKey(0)
    for R in (1, 64):
        for (K, N) in [(4096, 11008), (11008, 4096), (4096, 4096)]:
            x = jax.random.normal(key, (R, K), jnp.bfloat16)
            q4 = jax.random.randint(key, (K // 2, N), -128, 128, jnp.int8)
            q8 = jax.random.randint(key, (K, N), -100, 100, jnp.int8)
            s = jnp.ones((1, N), jnp.float32)
            b4, b8 = K // 2 * N, K * N

            dt = diff_time(lambda i, x, q, s: quant_matmul(
                x + (i % 2).astype(x.dtype), q, s, bits=4), x, q4, s)
            log(f"R={R:3d} [{K:5d}x{N:5d}] pallas int4: {dt*1e6:7.1f} us {b4/dt/1e9:7.1f} GB/s")
            dt = diff_time(lambda i, x, q, s: quant_matmul(
                x + (i % 2).astype(x.dtype), q, s, bits=8), x, q8, s)
            log(f"R={R:3d} [{K:5d}x{N:5d}] pallas int8: {dt*1e6:7.1f} us {b8/dt/1e9:7.1f} GB/s")
            dt = diff_time(lambda i, x, q, s: jnp.dot(
                x + (i % 2).astype(x.dtype), q.astype(x.dtype)) * s.astype(x.dtype),
                x, q8, s)
            log(f"R={R:3d} [{K:5d}x{N:5d}] xla    int8: {dt*1e6:7.1f} us {b8/dt/1e9:7.1f} GB/s")
            dt = diff_time(lambda i, x, q, s: jnp.dot(
                x + (i % 2).astype(x.dtype),
                qtensor.unpack_int4(q).astype(x.dtype)) * s.astype(x.dtype),
                x, q4, s)
            log(f"R={R:3d} [{K:5d}x{N:5d}] xla unpack4: {dt*1e6:7.1f} us {b4/dt/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
