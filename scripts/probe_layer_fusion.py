#!/usr/bin/env python
"""Layer-shaped proxy ruler: does fusing qkv / gate+up matmuls help on v5e?

Full-model measurements cost ~2 min each (param init dominates); this proxy
scans over L stacked layer-weight sets doing exactly the decode-step matmul
sequence (int8 weights, XLA convert+dot routing) and reports ms/layer +
effective weight bandwidth:

  sep7    q,k,v,o,gate,up,down as 7 dots   (current model structure)
  fus4    [qkv] one dot, o, [gate|up] one dot, down  (4 dots)

Weights are jit arguments (closures would bake them into the compile
payload, which the axon tunnel rejects), reps run inside jit.
"""

import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    E, F, L, R, REPS = 4096, 11008, 8, 64, 30
    key = jax.random.PRNGKey(0)

    def rnd_q(key, shape):
        return jax.random.randint(key, shape, -127, 128, jnp.int8)

    ks = jax.random.split(key, 8)
    wq = rnd_q(ks[0], (L, E, E))
    wk = rnd_q(ks[1], (L, E, E))
    wv = rnd_q(ks[2], (L, E, E))
    wo = rnd_q(ks[3], (L, E, E))
    wg = rnd_q(ks[4], (L, E, F))
    wu = rnd_q(ks[5], (L, E, F))
    wd = rnd_q(ks[6], (L, F, E))
    wqkv = jnp.concatenate([wq, wk, wv], axis=-1)      # [L, E, 3E]
    wgu = jnp.concatenate([wg, wu], axis=-1)           # [L, E, 2F]
    x0 = jax.random.normal(ks[7], (R, E), jnp.bfloat16)
    jax.block_until_ready((wq, wqkv, wgu, x0))
    log("init done")

    def dot(x, w):
        return jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)

    def sep7(x, w):
        wq, wk, wv, wo, wg, wu, wd = w
        q = dot(x, wq)
        k = dot(x, wk)
        v = dot(x, wv)
        attn = (q + k + v).astype(x.dtype)     # stand-in for attention
        h = x + dot(attn, wo).astype(x.dtype)
        g = dot(h, wg)
        u = dot(h, wu)
        y = (jax.nn.silu(g) * u).astype(x.dtype)
        return h + dot(y, wd).astype(x.dtype)

    def fus4(x, w):
        wqkv, wo, wgu, wd = w
        qkv = dot(x, wqkv)
        q, k, v = qkv[:, :E], qkv[:, E:2 * E], qkv[:, 2 * E:]
        attn = (q + k + v).astype(x.dtype)
        h = x + dot(attn, wo).astype(x.dtype)
        gu = dot(h, wgu)
        g, u = gu[:, :F], gu[:, F:]
        y = (jax.nn.silu(g) * u).astype(x.dtype)
        return h + dot(y, wd).astype(x.dtype)

    nbytes = E * E * 4 + E * F * 3

    for name, fn, w in [
        ("sep7", sep7, (wq, wk, wv, wo, wg, wu, wd)),
        ("fus4", fus4, (wqkv, wo, wgu, wd)),
    ]:
        def run(x0, w):
            def rep(i, x):
                def body(x, wl):
                    return fn(x, wl), ()
                x, _ = jax.lax.scan(body, x, w)
                return x
            return jax.lax.fori_loop(0, REPS, rep, x0)

        # value-fetch sync: on the axon tunnel block_until_ready can return
        # before execution completes (see planner/profile.py)
        f = jax.jit(lambda x0, w: run(x0, w).astype(jnp.float32).sum())
        float(f(x0, w))
        t = time.perf_counter()
        float(f(x0, w))
        dt = (time.perf_counter() - t) / (REPS * L)
        log(f"{name}: {dt*1e3:.3f} ms/layer   {nbytes/dt/1e9:5.0f} GB/s eff")


if __name__ == "__main__":
    main()
