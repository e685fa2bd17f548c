#!/usr/bin/env python
"""In-model A/B of int8 matmul strategies (llama-2-7b, width-64 verify fwd).

Ground truth so far: int8/xla = ~11 ms/fwd (610 GB/s), int8/pallas(current)
= ~22 ms. Hypothesis: XLA feeds int8 weights to the MXU without a VPU
convert pass; our kernel's `astype(bf16)` of every weight tile is the gap.

Variants (one process; weights built once; value-fetch sync; within-process
A/B is reliable, cross-process is +-20% on this tunnel):
  xla      weight-only convert+dot (ruler)
  xla_w8a8 dynamic per-row activation int8 + int8 x int8 -> int32 XLA dot
  pl_cur   current Pallas kernel (astype(bf16) in-kernel)
  pl_w8a8  Pallas: int8 x int8 -> int32 MXU dot in-kernel, f32 rescale
"""

import functools
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.model import KVCache, forward
    from sequoia_tpu.ops import masks
    from sequoia_tpu.quant import qtensor
    from sequoia_tpu.quant.quantize import random_quantized_model
    import sequoia_tpu.core.model as model_mod

    log(f"devices: {jax.devices()}")
    cfg = get_config("llama-2-7b")
    t0 = time.perf_counter()
    params = random_quantized_model(cfg, jax.random.PRNGKey(0), bits=8)
    jax.block_until_ready(params.embed)
    log(f"init: {time.perf_counter() - t0:.0f}s")

    orig = qtensor.matmul

    # ---------------- strategies ----------------
    def quant_x(x):
        xf = x.astype(jnp.float32)
        sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        sx = jnp.maximum(sx, 1e-8)
        x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        return x8, sx

    def mm_xla_w8a8(x, w, *, preferred_element_type=None):
        if isinstance(w, qtensor.QuantizedTensor) and x.ndim == 2 \
                and w.q.shape[-2] == x.shape[-1]:
            x8, sx = quant_x(x)
            y = jax.lax.dot(x8, w.q, preferred_element_type=jnp.int32)
            out = y.astype(jnp.float32) * sx * w.scale.astype(jnp.float32)
            return out.astype(x.dtype if preferred_element_type is None
                              else preferred_element_type)
        return orig(x, w, preferred_element_type=preferred_element_type)

    def _kernel_w8a8(x_ref, q_ref, s_ref, o_ref, acc_ref, *, k_tiles):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot(x_ref[...], q_ref[...],
                                    preferred_element_type=jnp.int32)

        @pl.when(pl.program_id(1) == k_tiles - 1)
        def _done():
            o_ref[...] = acc_ref[...].astype(jnp.float32) * s_ref[...]

    @functools.partial(jax.jit, static_argnames=("bn", "bk"))
    def pl_w8a8_call(x8, q, s, bn=1024, bk=4096):
        R, K = x8.shape
        N = q.shape[-1]
        Np = ((N + bn - 1) // bn) * bn
        Kp = ((K + bk - 1) // bk) * bk
        if (Np, Kp) != (N, K):
            q = jnp.pad(q, ((0, Kp - K), (0, Np - N)))
            s = jnp.pad(s, ((0, 0), (0, Np - N)))
            x8 = jnp.pad(x8, ((0, 0), (0, Kp - K)))
        n_tiles, k_tiles = Np // bn, Kp // bk
        out = pl.pallas_call(
            functools.partial(_kernel_w8a8, k_tiles=k_tiles),
            grid=(n_tiles, k_tiles),
            in_specs=[
                pl.BlockSpec((R, bk), lambda n, k: (0, k)),
                pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
                pl.BlockSpec((1, bn), lambda n, k: (0, n)),
            ],
            out_specs=pl.BlockSpec((R, bn), lambda n, k: (0, n)),
            out_shape=jax.ShapeDtypeStruct((R, Np), jnp.float32),
            scratch_shapes=[pltpu.VMEM((R, bn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x8, q, s)
        return out[:, :N]

    def mm_pl_w8a8(x, w, *, preferred_element_type=None):
        if isinstance(w, qtensor.QuantizedTensor) and x.ndim == 2 \
                and w.q.ndim == 2 and w.q.shape[-2] == x.shape[-1]:
            x8, sx = quant_x(x)
            y = pl_w8a8_call(x8, w.q, w.scale.astype(jnp.float32))
            out = y * sx
            return out.astype(x.dtype if preferred_element_type is None
                              else preferred_element_type)
        return orig(x, w, preferred_element_type=preferred_element_type)

    def mm_pl_cur(x, w, *, preferred_element_type=None):
        if isinstance(w, qtensor.QuantizedTensor) and x.ndim == 2 \
                and w.q.ndim == 2 and w.q.shape[-2] == x.shape[-1]:
            from sequoia_tpu.kernels.quant_matmul import quant_matmul
            return quant_matmul(x, w.q, w.scale.astype(jnp.float32), bits=8,
                                out_dtype=preferred_element_type)
        return orig(x, w, preferred_element_type=preferred_element_type)

    # ---------------- harness ----------------
    W, M, kv_len, reps = 64, 256, 128, 50
    tokens = jnp.zeros((W,), jnp.int32)
    pos = kv_len + jnp.arange(W, dtype=jnp.int32)
    mask = masks.causal_mask(W, M, kv_len)

    def measure(tag, mm):
        qtensor.matmul = mm
        model_mod.qmm = mm

        def reps_loop(params, kv):
            def body(i, carry):
                kv, acc = carry
                logits, kv = forward(params, cfg, tokens + (i % 2), pos, kv,
                                     kv_len, mask)
                return (kv, acc + logits[0, 0])
            kv, acc = jax.lax.fori_loop(
                0, reps, body, (kv, jnp.asarray(0.0, jnp.float32)))
            return acc, kv

        f = jax.jit(reps_loop, donate_argnums=(1,))
        try:
            for tag2 in ("warm", "t1", "t2"):
                kv = KVCache.init(cfg, M, jnp.bfloat16)
                jax.block_until_ready(kv.k)
                t0 = time.perf_counter()
                float(f(params, kv)[0])
                dt = (time.perf_counter() - t0) / reps
                if tag2 != "warm":
                    log(f"{tag} {tag2}: {dt*1e3:7.3f} ms/fwd")
        except Exception as e:
            log(f"{tag} FAILED: {type(e).__name__}: {str(e)[:200]}")
        finally:
            qtensor.matmul = orig
            model_mod.qmm = orig

    measure("xla", orig)
    measure("xla_w8a8", mm_xla_w8a8)
    measure("pl_cur", mm_pl_cur)
    measure("pl_w8a8", mm_pl_w8a8)


if __name__ == "__main__":
    main()
