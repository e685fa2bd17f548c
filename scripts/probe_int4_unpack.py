#!/usr/bin/env python
"""A/B the int4 in-kernel unpack: int32 shifts vs float-domain (bf16).
Differenced timing (RTT-free); median of 3."""

import sys
import time
import statistics

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
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    return loop


def diff_time(f, *args, r1=20, r2=220, samples=3):
    l1, l2 = make_loop(f, r1), make_loop(f, r2)
    float(l1(*args)); float(l2(*args))
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter(); float(l1(*args)); T1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(l2(*args)); T2 = time.perf_counter() - t0
        ts.append((T2 - T1) / (r2 - r1))
    return statistics.median(ts)


def main():
    sys.path.insert(0, ".")
    from sequoia_tpu.kernels.quant_matmul import quant_matmul

    key = jax.random.PRNGKey(0)
    for R in (1, 16, 64, 128):
        for (K, N) in [(4096, 11008), (11008, 4096), (4096, 4096)]:
            x = jax.random.normal(key, (R, K), jnp.bfloat16)
            q4 = jax.random.randint(key, (K // 2, N), -128, 128, jnp.int8)
            s = jnp.ones((1, N), jnp.float32)
            b4 = K // 2 * N
            row = f"R={R:3d} [{K:5d}x{N:5d}]"
            for up in ("shift", "float"):
                dt = diff_time(
                    lambda i, x, q, s: quant_matmul(
                        x + (i % 2).astype(x.dtype), q, s, bits=4, unpack=up),
                    x, q4, s)
                row += f"  {up}: {dt*1e6:7.1f} us {b4/dt/1e9:6.1f} GB/s"
            log(row)


if __name__ == "__main__":
    main()
