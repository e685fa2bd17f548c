#!/usr/bin/env python
"""Does a full-width (bn = N) weight block fix the int4 kernel's HBM stream?

The deployed kernel reads q blocks [bkq, 1024] from a row-major [K, N]
array: 1KB contiguous per row with an N-byte stride. Full-width blocks make
the k-sweep a single sequential stream. Measures effective HBM GB/s for the
two 7B matmul shapes at several (block_n, block_k).
"""

import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, ".")
    from sequoia_tpu.kernels.quant_matmul import quant_matmul

    R = 64
    shapes = [(4096, 11008), (11008, 4096), (4096, 4096)]
    key = jax.random.PRNGKey(0)
    REPS = 50

    for (K, N) in shapes:
        kq = K // 2
        q = jax.random.randint(key, (kq, N), -128, 128, jnp.int8)
        s = jnp.ones((1, N), jnp.float32)
        x = jax.random.normal(key, (R, K), jnp.bfloat16)
        nbytes = kq * N
        for bn, bk in [(1024, 4096), (2048, 4096), (N, 4096), (N, 2048),
                       (N, 8192), (N, 16384)]:
            try:
                f = functools.partial(quant_matmul, bits=4, block_n=bn, block_k=bk)

                @jax.jit
                def loop(x, q, s):
                    def body(i, acc):
                        o = f(x + (i % 2).astype(x.dtype), q, s)
                        return acc + o.reshape(-1)[0].astype(jnp.float32)
                    return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

                float(loop(x, q, s))
                t0 = time.perf_counter()
                float(loop(x, q, s))
                dt = (time.perf_counter() - t0) / REPS
                log(f"K={K:6d} N={N:6d} bn={bn:6d} bk={bk:6d}: "
                    f"{dt*1e6:8.1f} us  {nbytes/dt/1e9:7.1f} GB/s")
            except Exception as e:
                log(f"K={K} N={N} bn={bn} bk={bk}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
