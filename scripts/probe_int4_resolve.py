#!/usr/bin/env python
"""Resolve the int4 contradiction: in-model bench logged ~14-16 ms/forward
for 7B int4 (≈240 GB/s effective) while the standalone Pallas kernel
measures only ~40-46 GB/s on the constituent matmul shapes (would imply
~75 ms/forward). One of those is wrong. Measure in ONE process:

1. full 7B int4 forward, width 64 (auto routing = pallas)
2. same with SEQUOIA_QMM=xla (unpack+dot)
3. standalone pallas int4 / pallas int8 / xla int8 / xla int4-unpack
   matmuls on the 7B shapes
"""

import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_loop(f, *args, reps=30):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = f(i, *a)
            return acc + jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / reps


def main():
    sys.path.insert(0, ".")
    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.model import forward
    from sequoia_tpu.kvcache.cache import KVCache
    from sequoia_tpu.ops import masks
    from sequoia_tpu.quant.quantize import random_quantized_model
    from sequoia_tpu.quant import qtensor
    from sequoia_tpu.kernels.quant_matmul import quant_matmul

    # ---- standalone matmuls first (cheap) -----------------------------
    key = jax.random.PRNGKey(0)
    R = 64
    for (K, N) in [(4096, 11008), (11008, 4096), (4096, 4096)]:
        x = jax.random.normal(key, (R, K), jnp.bfloat16)
        q4 = jax.random.randint(key, (K // 2, N), -128, 128, jnp.int8)
        q8 = jax.random.randint(key, (K, N), -100, 100, jnp.int8)
        s = jnp.ones((1, N), jnp.float32)
        b4 = K // 2 * N
        b8 = K * N

        dt = timed_loop(lambda i, x, q, s: quant_matmul(
            x + (i % 2).astype(x.dtype), q, s, bits=4), x, q4, s)
        log(f"[{K}x{N}] pallas int4: {dt*1e6:8.1f} us {b4/dt/1e9:7.1f} GB/s")
        dt = timed_loop(lambda i, x, q, s: quant_matmul(
            x + (i % 2).astype(x.dtype), q, s, bits=8), x, q8, s)
        log(f"[{K}x{N}] pallas int8: {dt*1e6:8.1f} us {b8/dt/1e9:7.1f} GB/s")
        dt = timed_loop(lambda i, x, q, s: jnp.dot(
            x + (i % 2).astype(x.dtype), q.astype(x.dtype)) * s.astype(x.dtype),
            x, q8, s)
        log(f"[{K}x{N}] xla    int8: {dt*1e6:8.1f} us {b8/dt/1e9:7.1f} GB/s")
        dt = timed_loop(lambda i, x, q, s: jnp.dot(
            x + (i % 2).astype(x.dtype),
            qtensor.unpack_int4(q).astype(x.dtype)) * s.astype(x.dtype),
            x, q4, s)
        log(f"[{K}x{N}] xla  unpack4: {dt*1e6:8.1f} us {b4/dt/1e9:7.1f} GB/s")

    # ---- full model forward -------------------------------------------
    cfg = get_config("llama-2-7b")
    t0 = time.perf_counter()
    params = random_quantized_model(cfg, jax.random.PRNGKey(0), bits=4)
    jax.block_until_ready(params.embed)
    log(f"init int4 7b: {time.perf_counter()-t0:.0f}s")
    M, kvlen, W = 256, 128, 64
    kv = KVCache.init(cfg, M, jnp.bfloat16)
    toks = jnp.zeros((W,), jnp.int32)
    pos = kvlen + jnp.arange(W, dtype=jnp.int32)
    mask = masks.causal_mask(W, M, kvlen)

    for impl in ["pallas", "xla"]:
        qtensor.set_quant_matmul_impl(impl)
        def step(i, p, kv):
            return forward(p, cfg, toks + (i % 2), pos, kv, kvlen, mask)
        dt = timed_loop(step, params, kv, reps=20)
        log(f"full fwd W=64 int4 impl={impl}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
