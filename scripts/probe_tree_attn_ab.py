#!/usr/bin/env python
"""A/B: Pallas tree-attention kernel vs the XLA einsum attention at serving
shapes (VERDICT #4 decision probe).

The engine's production forwards always run the SPLIT path (read-only main
cache + scratch) or quantized KV, both of which take the XLA branch; the
Pallas kernel only serves the float non-split path that nothing uses. This
measures whether extending it could possibly pay: per-layer attention
(QK^T -> mask -> softmax -> PV over the full static cache) standalone, at
llama-2-7b serving shapes, kernel vs XLA.

Context for the verdict: at width 64-128 / M 512, attention moves ~8-17 MB
of KV + scores per layer vs ~210 MB of int8 weights — a few percent of the
iteration — so even a 2x attention win changes the iteration by ~1-2%.
"""

import os as _os, sys
import time

sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    log(f"devices: {jax.devices()}")

    from sequoia_tpu.kernels.tree_attention import (
        reference_attention,
        tree_attention,
    )

    Hkv, G, D = 32, 1, 128  # llama-2-7b MHA
    for Q, M in ((64, 512), (128, 512), (256, 768)):
        key = jax.random.PRNGKey(0)
        kq, kk, kv_, km = jax.random.split(key, 4)
        q = jax.random.normal(kq, (Q, Hkv, G, D), jnp.bfloat16)
        k = jax.random.normal(kk, (M, Hkv, D), jnp.bfloat16)
        v = jax.random.normal(kv_, (M, Hkv, D), jnp.bfloat16)
        mask = jax.random.bernoulli(km, 0.5, (Q, M))

        R = 50
        for tag, fn in (("pallas", tree_attention),
                        ("xla   ", jax.jit(reference_attention))):
            @jax.jit
            def loop(q, k, v, mask, fn=fn):
                def body(i, acc):
                    o = fn(q + acc * 1e-6, k, v, mask)
                    return acc + o.reshape(-1)[0].astype(jnp.float32)
                return jax.lax.fori_loop(0, R, body, jnp.float32(0))

            try:
                float(loop(q, k, v, mask))
                t0 = time.perf_counter()
                float(loop(q, k, v, mask))
                dt = (time.perf_counter() - t0) / R
                log(f"Q={Q:3d} M={M:3d} {tag}: {dt * 1e3:7.3f} ms/layer-attn "
                    f"(x32 layers = {dt * 32 * 1e3:.2f} ms/fwd)")
            except Exception as e:
                log(f"Q={Q:3d} M={M:3d} {tag}: FAILED "
                    f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
