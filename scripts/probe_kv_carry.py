#!/usr/bin/env python
"""Does the layer-scan ys pattern copy the whole KV cache every forward?

`core/model.py::forward` scans layers with per-layer cache slices as scan
xs and returns the updated slices as ys. Scan ys are freshly allocated
stacked outputs, so unless XLA forwards buffers, every forward WRITES a
complete new KV cache (at B=32 llama-2-7b bf16 that's 4.3 GB of stores —
several ms on v5e) even though only Q rows changed.

This probe times a minimal decode layer-stack (attention only, no MLP /
norms / vocab, so KV traffic dominates) in two variants:
  ys   : cache slices in as xs, updated slices out as ys  (current pattern)
  carry: full cache as scan carry, per-layer dynamic_update_slice in place

Both at B in {1, 32}, bf16 cache, M=256, H=32, D=128, L=32, Q=1.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    L, M, H, D, Q = 32, 256, 32, 128, 1
    E = H * D

    def attn(q, k_cache, v_cache, bias):
        scores = jnp.einsum("qhd,mhd->hqm", q, k_cache,
                            preferred_element_type=jnp.float32)
        scores = scores * (D ** -0.5) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
        return jnp.einsum("hqm,mhd->qhd", probs, v_cache)

    def fwd_ys(wq, hidden, kf, vf, offset, bias):
        def step(h, xs):
            w, kc, vc = xs
            qkv = (h @ w).reshape(Q, H, D)
            kc = jax.lax.dynamic_update_slice(kc, qkv, (offset, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, qkv, (offset, 0, 0))
            out = attn(qkv, kc, vc, bias)
            return h + out.reshape(Q, E), (kc, vc)

        hidden, (kf, vf) = jax.lax.scan(step, hidden, (wq, kf, vf))
        return hidden, kf, vf

    def fwd_carry(wq, hidden, kf, vf, offset, bias):
        def step(carry, xs):
            h, kf, vf = carry
            w, li = xs
            qkv = (h @ w).reshape(Q, H, D)
            kf = jax.lax.dynamic_update_slice(kf, qkv[None], (li, offset, 0, 0))
            vf = jax.lax.dynamic_update_slice(vf, qkv[None], (li, offset, 0, 0))
            kc = jax.lax.dynamic_index_in_dim(kf, li, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(vf, li, 0, keepdims=False)
            out = attn(qkv, kc, vc, bias)
            return (h + out.reshape(Q, E), kf, vf), None

        (hidden, kf, vf), _ = jax.lax.scan(
            step, (hidden, kf, vf), (wq, jnp.arange(L, dtype=jnp.int32)))
        return hidden, kf, vf

    wq = jnp.zeros((L, E, E), jnp.bfloat16)  # stand-in weight per layer
    bias = jnp.zeros((1, Q, M), jnp.float32)
    R = 20

    for B in (1, 32):
        for name, fn in (("ys", fwd_ys), ("carry", fwd_carry)):
            vfn = jax.vmap(fn, in_axes=(None, 0, 0, 0, None, None)) if B > 1 else fn

            @jax.jit
            def loop(n, wq, hidden, kf, vf):
                def body(i, c):
                    h, kf, vf = c
                    h, kf, vf = vfn(wq, h + (i % 2 - 0.5).astype(h.dtype) * 0,
                                    kf, vf, 128, bias)
                    return (h, kf, vf)
                return jax.lax.fori_loop(0, n, body, (hidden, kf, vf))[0]

            shape_h = (B, Q, E) if B > 1 else (Q, E)
            shape_kv = (B, L, M, H, D) if B > 1 else (L, M, H, D)
            hidden = jnp.zeros(shape_h, jnp.bfloat16)
            kf = jnp.zeros(shape_kv, jnp.bfloat16)
            vf = jnp.zeros(shape_kv, jnp.bfloat16)
            n1, n2 = jnp.asarray(5, jnp.int32), jnp.asarray(R, jnp.int32)
            float(loop(n1, wq, hidden, kf, vf).astype(jnp.float32).sum())
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(n1, wq, hidden, kf, vf).astype(jnp.float32).sum())
                ts = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(loop(n2, wq, hidden, kf, vf).astype(jnp.float32).sum())
                tl = time.perf_counter() - t0
                samples.append((tl - ts) / (R - 5))
            samples.sort()
            gb = 2 * kf.nbytes / 1e9
            log(f"B={B:2d} {name:5s}: {samples[1]*1e3:8.3f} ms  "
                f"(cache K+V {gb:.2f} GB)")


if __name__ == "__main__":
    main()
