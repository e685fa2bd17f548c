#!/usr/bin/env python
"""A/B: flash tree-attention kernel vs the XLA einsum path at 13B verify
shapes (Q=96, M=384, Hkv=H=40, D=128, bf16), per-layer cost x 40 layers,
in-loop differenced with per-rep varying inputs."""

import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sequoia_tpu.kernels.tree_attention import tree_attention

    Q, M, S, Hkv, g, D = 96, 384, 96, 40, 1, 128
    H = Hkv * g
    L = 40  # layers per rep
    R = 20
    scale = D ** -0.5
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((Q, H, D)), dt)
    k = jnp.asarray(rng.standard_normal((M, Hkv, D)), dt)
    v = jnp.asarray(rng.standard_normal((M, Hkv, D)), dt)
    sk = jnp.asarray(rng.standard_normal((S, Hkv, D)), dt)
    sv = jnp.asarray(rng.standard_normal((S, Hkv, D)), dt)
    mask = rng.random((Q, M)) < 0.8
    smask = np.tril(np.ones((Q, S), bool))
    bias = jnp.where(jnp.asarray(mask), 0.0, float("-inf")).astype(jnp.float32)
    bias_scr = jnp.where(jnp.asarray(smask), 0.0, float("-inf")).astype(jnp.float32)

    def einsum_attn(q, k, v, bias, sk, sv, bias_scr):
        qg = q.reshape(Q, Hkv, g, D)
        scores = jnp.einsum("qhgd,mhd->hgqm", qg, k,
                            preferred_element_type=jnp.float32) * scale
        scores = scores + bias[None, None, :, :]
        s_scr = jnp.einsum("qhgd,shd->hgqs", qg, sk,
                           preferred_element_type=jnp.float32) * scale
        s_scr = s_scr + bias_scr[None, None, :, :]
        full = jax.nn.softmax(jnp.concatenate([scores, s_scr], axis=-1), axis=-1)
        probs, probs_scr = full[..., :M], full[..., M:]
        attn = jnp.einsum("hgqm,mhd->qhgd", probs.astype(dt), v) + jnp.einsum(
            "hgqs,shd->qhgd", probs_scr.astype(dt), sv)
        return attn.reshape(Q, H, D)

    def flash_attn(q, k, v, bias, sk, sv, bias_scr):
        return tree_attention(q, k, v, bias, sk, sv, bias_scr, g=g,
                              scale=scale, block_m=256)

    def mk_loop(fn):
        @jax.jit
        def loop(q, k, v, sk, sv, salt, n):
            q = q + salt.astype(dt) * 1e-6

            def body(i, carry):
                qq, acc = carry
                out = fn(qq, k, v, bias, sk, sv, bias_scr)
                # L layers' worth of attention per rep, chained through q
                for _ in range(L - 1):
                    out = fn(out * (1.0 / (1.0 + 1e-7)), k, v, bias, sk, sv,
                             bias_scr)
                return (qq + out.reshape(-1)[0].astype(dt) * 1e-7,
                        acc + out.astype(jnp.float32).sum())

            _, acc = jax.lax.fori_loop(0, n, body, (q, jnp.float32(0)))
            return acc
        return loop

    # correctness on-device first
    got = flash_attn(q, k, v, bias, sk, sv, bias_scr)
    want = einsum_attn(q, k, v, bias, sk, sv, bias_scr)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    log(f"max |flash - einsum| (bf16): {err:.4f}")
    assert err < 0.1, err

    import importlib
    sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
    bench = importlib.import_module("bench")

    for name, fn in (("einsum", einsum_attn), ("flash", flash_attn)):
        loop = mk_loop(fn)
        t = bench._diff_timed(loop, (q, k, v, sk, sv), R)
        log(f"{name:>7}: {t * 1e3:7.3f} ms per {L}-layer attention pass "
            f"({t / L * 1e6:6.1f} us/layer)")


if __name__ == "__main__":
    main()
