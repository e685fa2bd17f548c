#!/usr/bin/env python
"""Probe: verify-width sweep of int8 matmul strategies at llama-2-7b shapes.

Decides whether the tree-verify forward can stay ~bandwidth-bound out to
width 128-256 (the budgets where the planner's E[accept] reaches 4.2-4.5,
which is what beating the paper's 4.04x ratio requires — see VERDICT.md #1).

Strategies per matmul y = x @ dequant(q):
  wonly : jnp.dot(x, q.astype(bf16)) * s      — current int8 routing (XLA)
  w8a8  : quantize x to int8 per-row, lax.dot int8xint8->int32, rescale
          (native MXU int8 mode: 394 TOPS on v5e vs 197 bf16)
"""

import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    log(f"devices: {jax.devices()}")
    K, N, L, REPS = 4096, 11008, 16, 30
    kb = jax.random.PRNGKey(3)
    q = jax.random.randint(kb, (L, K, N), -127, 128, jnp.int8)
    s = jnp.full((L, 1, N), 0.01, jnp.float32)

    def w8a8(h, q, s):
        hf = h.astype(jnp.float32)
        sx = jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0
        x8 = jnp.clip(jnp.round(hf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot(x8, q, preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * sx * s).astype(jnp.bfloat16)

    def wonly(h, q, s):
        y = jnp.dot(h, q.astype(h.dtype), preferred_element_type=jnp.float32)
        return (y * s).astype(jnp.bfloat16)

    for R in (64, 128, 256):
        x0 = jax.random.normal(jax.random.PRNGKey(1), (R, K), jnp.bfloat16)
        for tag, call in (("w8a8", w8a8), ("wonly", wonly)):
            @jax.jit
            def run(n, x, q, s, call=call):
                def rep(i, h):
                    def layer(h, w):
                        y = call(h, w[0], w[1])
                        return (y[:, :K] * 1e-3).astype(jnp.bfloat16), None
                    h, _ = jax.lax.scan(layer, h, (q, s))
                    return h
                h = jax.lax.fori_loop(0, n, rep, x)
                return h.astype(jnp.float32).mean()

            try:
                n1, n2 = jnp.asarray(5, jnp.int32), jnp.asarray(REPS, jnp.int32)
                float(run(n1, x0, q, s))
                samples = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(run(n1, x0, q, s))
                    ts = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    float(run(n2, x0, q, s))
                    tl = time.perf_counter() - t0
                    samples.append((tl - ts) / (REPS - 5))
                samples.sort()
                dt = samples[1] / L
                log(f"R={R:3d} {tag:5s}: {dt*1e3:7.3f} ms/matmul "
                    f"{K*N/dt/1e9:6.0f} GB/s  "
                    f"{2*K*N*R/dt/1e12:6.1f} TOPS-eff")
            except Exception as e:
                log(f"R={R:3d} {tag:5s}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
