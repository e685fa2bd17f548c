#!/usr/bin/env python
"""Probe Mosaic-native paths for quantized matmuls on the real chip.

A: in-kernel `bitcast_convert_type(int8 -> int4)` + astype(bf16) + dot
   (hardware nibble unpack; paired-N packing so the reshape is free).
B: int8 x int8 -> int32 MXU dot (W8A8 dynamic activation quantization path).
C: current shift-based int4 kernel (baseline).

Each: correctness vs XLA reference at small shape, then timed scan-chain.
"""

import functools
import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"devices: {jax.devices()}")

    # ---------------- kernels ----------------
    def kernel_bitcast4(x_ref, q_ref, s_ref, o_ref, acc_ref, *, k_tiles):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        q = q_ref[...]                       # [Kb, Nb/2] int8
        w4 = jax.lax.bitcast_convert_type(q, jnp.int4)   # [Kb, Nb/2, 2]
        w = w4.astype(x_ref.dtype).reshape(q.shape[0], q.shape[1] * 2)
        acc_ref[...] += jax.lax.dot(x_ref[...], w,
                                    preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(1) == k_tiles - 1)
        def _done():
            o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)

    def kernel_w8a8(x_ref, sx_ref, q_ref, s_ref, o_ref, acc_ref, *, k_tiles):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot(
            x_ref[...], q_ref[...], preferred_element_type=jnp.int32
        ).astype(jnp.float32)

        @pl.when(pl.program_id(1) == k_tiles - 1)
        def _done():
            o_ref[...] = (acc_ref[...] * s_ref[...] * sx_ref[...]).astype(o_ref.dtype)

    def mm_bitcast4(x, qp, scale, bn=1024, bkq=2048):
        R, K = x.shape
        N = scale.shape[-1]
        k_tiles = K // bkq
        n_tiles = N // bn
        return pl.pallas_call(
            functools.partial(kernel_bitcast4, k_tiles=k_tiles),
            grid=(n_tiles, k_tiles),
            in_specs=[
                pl.BlockSpec((R, bkq), lambda n, k: (0, k)),
                pl.BlockSpec((bkq, bn // 2), lambda n, k: (k, n)),
                pl.BlockSpec((1, bn), lambda n, k: (0, n)),
            ],
            out_specs=pl.BlockSpec((R, bn), lambda n, k: (0, n)),
            out_shape=jax.ShapeDtypeStruct((R, N), x.dtype),
            scratch_shapes=[pltpu.VMEM((R, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x, qp, scale)

    def mm_w8a8(x8, sx, q, scale, bn=1024, bkq=2048):
        R, K = x8.shape
        N = scale.shape[-1]
        k_tiles = K // bkq
        n_tiles = N // bn
        return pl.pallas_call(
            functools.partial(kernel_w8a8, k_tiles=k_tiles),
            grid=(n_tiles, k_tiles),
            in_specs=[
                pl.BlockSpec((R, bkq), lambda n, k: (0, k)),
                pl.BlockSpec((R, 1), lambda n, k: (0, 0)),
                pl.BlockSpec((bkq, bn), lambda n, k: (k, n)),
                pl.BlockSpec((1, bn), lambda n, k: (0, n)),
            ],
            out_specs=pl.BlockSpec((R, bn), lambda n, k: (0, n)),
            out_shape=jax.ShapeDtypeStruct((R, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((R, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x8, sx, q, scale)

    # ---------------- correctness (small) ----------------
    K, N, R = 512, 512, 8
    key = jax.random.PRNGKey(0)
    w = jax.random.randint(key, (K, N), -7, 8, jnp.int8)
    scale = jnp.full((1, N), 0.01, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (R, K), jnp.bfloat16)

    # paired-N packing: byte[k, n] = w[k,2n] & 15 | w[k,2n+1] << 4
    wn = np.asarray(w)
    packed = ((wn[:, 0::2] & 15) | (wn[:, 1::2] << 4)).astype(np.int8)
    qp = jnp.asarray(packed)

    ref = (np.asarray(x, np.float32) @ (wn * 0.01)).astype(np.float32)
    try:
        out = jax.jit(mm_bitcast4, static_argnames=("bn", "bkq"))(
            x, qp, scale, bn=512, bkq=512)
        err = np.abs(np.asarray(out, np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
        log(f"A bitcast4 correctness: rel err {err:.4f}")
        ok_a = err < 0.05
    except Exception as e:
        log(f"A bitcast4 FAILED: {type(e).__name__}: {str(e)[:300]}")
        ok_a = False

    try:
        x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.02), -127, 127).astype(jnp.int8)
        sx = jnp.full((R, 1), 0.02, jnp.float32)
        out = jax.jit(mm_w8a8, static_argnames=("bn", "bkq"))(
            x8, sx, w, scale, bn=512, bkq=512)
        ref8 = (np.asarray(x8, np.float32) * 0.02) @ (wn * 0.01)
        err = np.abs(np.asarray(out, np.float32) - ref8).max() / (np.abs(ref8).max() + 1e-9)
        log(f"B w8a8 correctness: rel err {err:.4f}")
        ok_b = err < 0.05
    except Exception as e:
        log(f"B w8a8 FAILED: {type(e).__name__}: {str(e)[:300]}")
        ok_b = False

    # ---------------- timing (model shape, scan chain, in-jit reps) --------
    K, N, L, R, REPS = 4096, 11008, 16, 64, 20

    def timed_chain(tag, make_inputs, call, per_layer_bytes):
        try:
            inputs = make_inputs()

            @jax.jit
            def run(x, *ws):
                def rep(i, h):
                    def layer(h, w):
                        y = call(h, *w)
                        return (y[:, :K] * 1e-3).astype(jnp.bfloat16), None
                    h, _ = jax.lax.scan(layer, h, ws)
                    return h
                h = jax.lax.fori_loop(0, REPS, rep, x)
                return h.astype(jnp.float32).mean()

            x0 = jax.random.normal(jax.random.PRNGKey(1), (R, K), jnp.bfloat16)
            float(run(x0, *inputs))
            t0 = time.perf_counter()
            float(run(x0, *inputs))
            dt = (time.perf_counter() - t0) / REPS / L
            log(f"{tag}: {dt * 1e3:7.3f} ms/matmul  "
                f"{per_layer_bytes / dt / 1e9:6.0f} GB/s (packed bytes)")
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")

    kb = jax.random.PRNGKey(3)
    if ok_a:
        def mk_a():
            q = jax.random.randint(kb, (L, K, N // 2), -128, 128, jnp.int8)
            s = jnp.full((L, 1, N), 0.01, jnp.float32)
            return (q, s)
        timed_chain("A bitcast4", mk_a,
                    lambda h, q, s: mm_bitcast4(h, q, s), K * N // 2)

    if ok_b:
        def mk_b():
            q = jax.random.randint(kb, (L, K, N), -127, 128, jnp.int8)
            s = jnp.full((L, 1, N), 0.01, jnp.float32)
            return (q, s)

        def call_b(h, q, s):
            hf = h.astype(jnp.float32)
            sx = jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0
            x8 = jnp.clip(jnp.round(hf / sx), -127, 127).astype(jnp.int8)
            return mm_w8a8(x8, sx, q, s)
        timed_chain("B w8a8   ", mk_b, call_b, K * N)

    from sequoia_tpu.kernels.quant_matmul import quant_matmul

    def mk_c():
        q = jax.random.randint(kb, (L, K // 2, N), -128, 128, jnp.int8)
        s = jnp.full((L, 1, N), 0.01, jnp.float32)
        return (q, s)
    timed_chain("C shift4  ", mk_c,
                lambda h, q, s: quant_matmul(h, q, s, bits=4), K * N // 2)


if __name__ == "__main__":
    main()
