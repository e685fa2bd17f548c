#!/usr/bin/env python
"""In-model A/B of Pallas kernel STRUCTURE for the int8 weight stream.

probe_int8_kernels_inmodel showed the ~2x pallas-vs-XLA gap persists with a
pure int8 MXU dot (no convert) — so it's grid/pipelining structure, not
dequant math. Variants (all weight-only int8, astype(bf16) in kernel):

  cur_1024x4096   current kernel, default blocks (bn=1024, bk=4096)
  cur_512x4096    smaller N blocks (more grid steps, smaller DMA)
  cur_2048x4096   bigger N blocks (fewer steps, 8MB tiles)
  grid1d_1024     1-D grid over N, K unblocked: one dot per step, no
                  accumulator revisit, no @pl.when, pure "parallel"
  grid1d_2048     same, bn=2048
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
    from sequoia_tpu.kernels.quant_matmul import quant_matmul
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

    def _kernel_1d(x_ref, q_ref, s_ref, o_ref):
        w = q_ref[...].astype(x_ref.dtype)
        y = jax.lax.dot(x_ref[...], w, preferred_element_type=jnp.float32)
        o_ref[...] = (y * s_ref[...]).astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("bn", "out_dtype"))
    def qmm_1d(x, q, s, bn=1024, out_dtype=jnp.bfloat16):
        R, K = x.shape
        N = q.shape[-1]
        Np = ((N + bn - 1) // bn) * bn
        if Np != N:
            q = jnp.pad(q, ((0, 0), (0, Np - N)))
            s = jnp.pad(s, ((0, 0), (0, Np - N)))
        out = pl.pallas_call(
            _kernel_1d,
            grid=(Np // bn,),
            in_specs=[
                pl.BlockSpec((R, K), lambda n: (0, 0)),
                pl.BlockSpec((K, bn), lambda n: (0, n)),
                pl.BlockSpec((1, bn), lambda n: (0, n)),
            ],
            out_specs=pl.BlockSpec((R, bn), lambda n: (0, n)),
            out_shape=jax.ShapeDtypeStruct((R, Np), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, q, s)
        return out[:, :N]

    def make_mm(kind, bn, bk=4096):
        def mm(x, w, *, preferred_element_type=None):
            if isinstance(w, qtensor.QuantizedTensor) and x.ndim == 2 \
                    and w.q.ndim == 2 and w.q.shape[-2] == x.shape[-1]:
                if kind == "cur":
                    return quant_matmul(
                        x, w.q, w.scale.astype(jnp.float32), bits=8,
                        block_n=bn, block_k=bk,
                        out_dtype=preferred_element_type)
                y = qmm_1d(x, w.q, w.scale.astype(jnp.float32), bn=bn,
                           out_dtype=preferred_element_type or x.dtype)
                return y
            return orig(x, w, preferred_element_type=preferred_element_type)
        return mm

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
            best = 1e9
            for tag2 in ("warm", "t1", "t2"):
                kv = KVCache.init(cfg, M, jnp.bfloat16)
                jax.block_until_ready(kv.k)
                t0 = time.perf_counter()
                float(f(params, kv)[0])
                dt = (time.perf_counter() - t0) / reps
                if tag2 != "warm":
                    best = min(best, dt)
            log(f"{tag}: {best*1e3:7.3f} ms/fwd")
        except Exception as e:
            log(f"{tag} FAILED: {type(e).__name__}: {str(e)[:200]}")
        finally:
            qtensor.matmul = orig
            model_mod.qmm = orig

    measure("xla(ruler)", orig)
    measure("cur_1024x4096", make_mm("cur", 1024))
    measure("cur_512x4096", make_mm("cur", 512))
    measure("cur_2048x4096", make_mm("cur", 2048))
    measure("grid1d_1024", make_mm("1d", 1024))
    measure("grid1d_2048", make_mm("1d", 2048))


if __name__ == "__main__":
    main()
