#!/usr/bin/env python
"""Probe int4 dequant-matmul strategies on the real chip.

The current shift-based Pallas kernel widens the packed byte tile to int32
before nibble extraction — 4x fewer elements per VPU op than an int8-domain
pipeline — and measures far below the XLA int8 convert+dot bandwidth, making
int4 *slower* end-to-end than int8 despite half the bytes.

Variants (scan chain over L distinct stacked weights so nothing stays
cached; weights passed as jit ARGUMENTS — a closure would embed them as
compile constants and the axon remote-compile tunnel rejects >~100MB
payloads; native jnp.int4 jit args also trip a dispatch RecursionError on
this backend, so int4 reinterpretation happens INSIDE jit via
bitcast_convert_type on the packed int8):

  xla8   int8 convert+dot ruler (full-byte weights, same logical matmul)
  xla4b  in-jit bitcast int8->int4 [K/2,N,2]; y = x_lo @ w[...,0] + x_hi @ w[...,1]
  pl4b   Pallas, int8-domain unpack (AND/XOR/SUB, no int32 widening), hi
         nibble recovered as 16*hi via b-lo_u with 1/16 folded into x_hi
  pl4s   current shift kernel (baseline)

Half-split packing (quant/qtensor.py): byte[k] = (w[K/2+k] << 4) | (w[k] & 0xF),
so bitcast plane 0 = low nibble = first half of K, plane 1 = second half.
"""

import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sequoia_tpu.kernels.quant_matmul import quant_matmul
    from sequoia_tpu.quant.qtensor import quantize_int4, quantize_int8

    log(f"devices: {jax.devices()}")
    K, N, L, R, REPS = 4096, 11008, 8, 64, 10
    key = jax.random.PRNGKey(0)

    @jax.jit
    def init(key):
        ws = jax.random.normal(key, (L, K, N), jnp.float32) * 0.02
        return quantize_int4(ws), quantize_int8(ws)

    qt4, qt8 = init(key)
    qpk, s = qt4.q, qt4.scale.astype(jnp.float32)  # [L, K/2, N] int8, [L,1,N]
    q8, s8 = qt8.q, qt8.scale.astype(jnp.float32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (R, K), jnp.bfloat16)
    jax.block_until_ready((qpk, s, q8, x0))
    log("init done")

    def unpack_np(qp):
        b = np.asarray(qp, np.int8).astype(np.int32)
        lo = ((b << 28) >> 28).astype(np.int8)
        hi = ((b << 24) >> 28).astype(np.int8)
        return np.concatenate([lo, hi], axis=0)

    w0 = unpack_np(qpk[0])
    ref = np.asarray(x0, np.float32) @ (w0.astype(np.float32) * np.asarray(s[0]))

    # ---------- variant impls (per-layer fns; qq is the packed int8) ----------
    def xla8f(x, qq, ss):
        y = jnp.dot(x, qq.astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * ss).astype(x.dtype)

    def xla4b(x, qq, ss):
        half = qq.shape[-2]
        w4 = jax.lax.bitcast_convert_type(qq, jnp.int4)   # [K/2, N, 2]
        y = jnp.dot(x[:, :half], w4[..., 0].astype(x.dtype),
                    preferred_element_type=jnp.float32)
        y += jnp.dot(x[:, half:], w4[..., 1].astype(x.dtype),
                     preferred_element_type=jnp.float32)
        return (y * ss).astype(x.dtype)

    def _kernel_pl4b(x_lo_ref, x_hi16_ref, q_ref, s_ref, o_ref, acc_ref, *,
                     k_tiles):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        b = q_ref[...]                           # [Kb, Nb] int8 (packed)
        lo_u = b & jnp.int8(15)                  # [0, 15]
        lo = (lo_u ^ jnp.int8(8)) - jnp.int8(8)  # signed low nibble
        hi16 = b - lo_u                          # 16 * signed high nibble
        x_lo = x_lo_ref[...]
        acc_ref[...] += jax.lax.dot(x_lo, lo.astype(x_lo.dtype),
                                    preferred_element_type=jnp.float32)
        acc_ref[...] += jax.lax.dot(x_hi16_ref[...], hi16.astype(x_lo.dtype),
                                    preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(1) == k_tiles - 1)
        def _done():
            o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)

    def pl4b(x, qq, ss, bn=1024, bk=2048):
        half = K // 2
        x_lo = x[:, :half]
        x_hi16 = (x[:, half:].astype(jnp.float32) * (1.0 / 16.0)).astype(x.dtype)
        n_tiles, k_tiles = N // bn, half // bk
        return pl.pallas_call(
            functools.partial(_kernel_pl4b, k_tiles=k_tiles),
            grid=(n_tiles, k_tiles),
            in_specs=[
                pl.BlockSpec((R, bk), lambda n, k: (0, k)),
                pl.BlockSpec((R, bk), lambda n, k: (0, k)),
                pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
                pl.BlockSpec((1, bn), lambda n, k: (0, n)),
            ],
            out_specs=pl.BlockSpec((R, bn), lambda n, k: (0, n)),
            out_shape=jax.ShapeDtypeStruct((R, N), x.dtype),
            scratch_shapes=[pltpu.VMEM((R, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x_lo, x_hi16, qq, ss)

    def pl4s(x, qq, ss):
        return quant_matmul(x, qq, ss, bits=4)

    # ---------- correctness ----------
    for name, fn in [("xla4b", xla4b), ("pl4b", pl4b), ("pl4s", pl4s)]:
        try:
            out = np.asarray(jax.jit(fn)(x0, qpk[0], s[0]), np.float32)
            err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
            log(f"{name} rel err: {err:.4f}")
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {e}")

    # ---------- timing: scan chain ----------
    def chain(fn):
        # REPS reps INSIDE jit (fori_loop) — per-call dispatch over the axon
        # tunnel is multiple ms and otherwise dominates the measurement.
        def run(x0, wstack, sstack):
            def body(x, qs):
                qq, ss = qs
                y = fn(x, qq, ss)
                return (y[:, :K] + x).astype(x0.dtype), ()

            def rep(i, x):
                x, _ = jax.lax.scan(body, x, (wstack, sstack))
                return x

            return jax.lax.fori_loop(0, REPS, rep, x0)
        return jax.jit(run)

    for name, fn, wstack, sstack, nbytes in [
        ("xla8", xla8f, q8, s8, K * N),
        ("xla4b", xla4b, qpk, s, K * N // 2),
        ("pl4b", pl4b, qpk, s, K * N // 2),
        ("pl4s", pl4s, qpk, s, K * N // 2),
    ]:
        try:
            f = chain(fn)
            f(x0, wstack, sstack).block_until_ready()
            t = time.perf_counter()
            r = f(x0, wstack, sstack)
            r.block_until_ready()
            dt = (time.perf_counter() - t) / (REPS * L)
            log(f"{name}: {dt*1e3:.3f} ms/matmul   {nbytes/dt/1e9:5.0f} GB/s "
                f"(its own HBM bytes)")
        except Exception as e:
            log(f"{name} chain FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
