#!/usr/bin/env python
"""Probe: XLA-native int8 x int8 -> int32 dot (W8A8) vs int8 weight-only
convert+dot, at model shapes in a scan chain with in-jit reps."""

import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    log(f"devices: {jax.devices()}")
    K, N, L, R, REPS = 4096, 11008, 16, 64, 20
    kb = jax.random.PRNGKey(3)
    q = jax.random.randint(kb, (L, K, N), -127, 128, jnp.int8)
    s = jnp.full((L, 1, N), 0.01, jnp.float32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (R, K), jnp.bfloat16)

    # correctness on small slice
    xf = np.asarray(x0, np.float32)
    ref = xf @ (np.asarray(q[0], np.float32) * 0.01)

    def w8a8(h, q, s):
        hf = h.astype(jnp.float32)
        sx = jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0
        x8 = jnp.clip(jnp.round(hf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot(x8, q, preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * sx * s).astype(jnp.bfloat16)

    def wonly(h, q, s):
        y = jnp.dot(h, q.astype(h.dtype), preferred_element_type=jnp.float32)
        return (y * s).astype(jnp.bfloat16)

    out = jax.jit(w8a8)(x0, q[0], s[0])
    err = np.abs(np.asarray(out, np.float32) - ref).max() / np.abs(ref).max()
    log(f"w8a8 xla correctness: rel err {err:.4f}")

    for tag, call in (("w8a8/xla ", w8a8), ("wonly/xla", wonly)):
        @jax.jit
        def run(x, q, s, call=call):
            def rep(i, h):
                def layer(h, w):
                    y = call(h, w[0], w[1])
                    return (y[:, :K] * 1e-3).astype(jnp.bfloat16), None
                h, _ = jax.lax.scan(layer, h, (q, s))
                return h
            h = jax.lax.fori_loop(0, REPS, rep, x)
            return h.astype(jnp.float32).mean()

        try:
            float(run(x0, q, s))
            t0 = time.perf_counter()
            float(run(x0, q, s))
            dt = (time.perf_counter() - t0) / REPS / L
            log(f"{tag}: {dt * 1e3:7.3f} ms/matmul  {K * N / dt / 1e9:6.0f} GB/s")
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
