#!/usr/bin/env python
"""Is the int4 Pallas kernel's bandwidth gap a DMA-contiguity problem?

The shipped kernel streams weight blocks [bkq, bn] out of a row-major
[Kq, N] array: each block DMA is bkq separate bn-byte rows (bn=1024 -> 1 KB
bursts with an N-byte stride). This probe A/Bs that against a PRE-TILED
layout [kt, nt, bkq, bn] where every block is one contiguous VMEM-sized
read, on the llama-2-70b ffn shape (the 70B-under-offload/TP hot matmul).

If tiled-contiguous recovers >=500 GB/s (vs ~270-420 measured for the
row-major layout), the fix is a tiled weight storage option in
QuantizedTensor; if not, the bottleneck is elsewhere (issue order /
pipeline depth) and tiling is not worth the layout surgery.

MEASURED (v5e, round 3) — and a caveat that blunts the conclusion: with a
single 117 MB weight reused across the timing loop, the weight is
loop-invariant and FITS VMEM (128 MB), so reps 2+ never touch HBM:
row-major clocked 813 GB/s (~= the HBM roofline from the first-rep
stream) and tiled an impossible 3371 GB/s (pure VMEM-resident compute,
4.1x faster than row-major AT EQUAL BYTES — the layout clearly helps the
on-chip pipeline). This microbench therefore shows tiled wins the
RESIDENT regime but cannot isolate streamed-DMA bandwidth; the
full-model numbers (270-420 GB/s int4, kernels/quant_matmul.py header)
remain the streamed ground truth, and a tiled QuantizedTensor storage
variant (layout + sharding + loader surgery) is the candidate fix to
carry that 4.1x pipeline win into the streamed case. (Also note: axon
caches same-input execution results — the first version of this probe
reported 7920 GB/s because a differenced pair collapsed to two cache
hits; inputs must vary per call.)
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

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    R = 64
    K, N = 8192, 28672          # llama-2-70b gate/up shape
    Kq = K // 2                 # packed int4 rows
    bkq, bn = 2048, 1024
    kt, nt = Kq // bkq, N // bn
    q_bytes = Kq * N
    log(f"shape x[{R},{K}] @ w4[{K},{N}] -> {q_bytes/1e9:.3f} GB int4 stream")

    rng = np.random.default_rng(0)
    q_host = rng.integers(-128, 127, size=(Kq, N), dtype=np.int8)
    scale_host = np.full((1, N), 1e-3, np.float32)
    x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
    q = jnp.asarray(q_host)
    q_tiled = jnp.asarray(
        q_host.reshape(kt, bkq, nt, bn).transpose(0, 2, 1, 3).copy())
    scale = jnp.asarray(scale_host)

    def kernel(x_lo_ref, x_hi_ref, q_ref, s_ref, o_ref, acc_ref, *, k_tiles, tiled):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x_lo = x_lo_ref[...]
        x_hi = x_hi_ref[...]
        blk = q_ref[...]
        if tiled:
            blk = blk.reshape(blk.shape[-2], blk.shape[-1])
        f = blk.astype(jnp.float32)
        h = jnp.floor(f * (1.0 / 16.0)).astype(x_hi.dtype)
        l = (f - 16.0 * jnp.floor((f + 8.0) * (1.0 / 16.0))).astype(x_lo.dtype)
        acc_ref[...] += jax.lax.dot(x_lo, l, preferred_element_type=jnp.float32)
        acc_ref[...] += jax.lax.dot(x_hi, h, preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(1) == k_tiles - 1)
        def _done():
            o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)

    params = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))

    def build(tiled):
        in_specs = [
            pl.BlockSpec((R, bkq), lambda n, k: (0, k)),
            pl.BlockSpec((R, bkq), lambda n, k: (0, k)),
            (pl.BlockSpec((1, 1, bkq, bn), lambda n, k: (k, n, 0, 0))
             if tiled else pl.BlockSpec((bkq, bn), lambda n, k: (k, n))),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
        ]
        call = pl.pallas_call(
            functools.partial(kernel, k_tiles=kt, tiled=tiled),
            grid=(nt, kt),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((R, bn), lambda n, k: (0, n)),
            out_shape=jax.ShapeDtypeStruct((R, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((R, bn), jnp.float32)],
            compiler_params=params,
        )

        half = K // 2

        @jax.jit
        def run(n_reps, x, qq, scale):
            x_lo, x_hi = x[:, :half], x[:, half:]

            def body(i, acc):
                o = call(x_lo + acc.astype(jnp.bfloat16), x_hi, qq, scale)
                return acc + o[0, 0].astype(jnp.float32) * 1e-9

            return jax.lax.fori_loop(0, n_reps, body, jnp.float32(0))

        return run

    Rr = 50

    def timed(name, run, qq):
        n1, n2 = jnp.asarray(max(2, Rr // 4), jnp.int32), jnp.asarray(Rr, jnp.int32)
        float(run(n1, x, qq, scale))
        samples = []
        for j in range(3):
            # vary x per call: the axon runtime caches same-input execution
            # results, which collapsed a differenced pair to ~0 (a reported
            # "7920 GB/s" — 10x the HBM roofline)
            xs, xl = x + (2 * j + 1) * 1e-3, x + (2 * j + 2) * 1e-3
            t0 = time.perf_counter(); float(run(n1, xs, qq, scale)); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); float(run(n2, xl, qq, scale)); tl = time.perf_counter() - t0
            samples.append((tl - ts) / (Rr - max(2, Rr // 4)))
        samples.sort()
        t = samples[1]
        log(f"{name:>22}: {t*1e3:7.3f} ms -> {q_bytes/1e9/t:6.0f} GB/s effective")
        return t

    t_flat = timed("row-major [Kq,N]", build(False), q)
    t_tile = timed("tiled [kt,nt,bkq,bn]", build(True), q_tiled)
    log(f"tiled speedup: {t_flat / t_tile:.2f}x")

    # correctness spot check (tiny rep count, compare outputs)
    half = K // 2
    xf = np.asarray(x, np.float32)
    wlo = ((q_host.astype(np.int32) << 28) >> 28).astype(np.float32)
    whi = ((q_host.astype(np.int32) << 24) >> 28).astype(np.float32)
    ref = xf[:, :half] @ wlo + xf[:, half:] @ whi
    ref = ref * scale_host

    def one(call_tiled, qq):
        in_specs = [
            pl.BlockSpec((R, bkq), lambda n, k: (0, k)),
            pl.BlockSpec((R, bkq), lambda n, k: (0, k)),
            (pl.BlockSpec((1, 1, bkq, bn), lambda n, k: (k, n, 0, 0))
             if call_tiled else pl.BlockSpec((bkq, bn), lambda n, k: (k, n))),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
        ]
        call = pl.pallas_call(
            functools.partial(kernel, k_tiles=kt, tiled=call_tiled),
            grid=(nt, kt),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((R, bn), lambda n, k: (0, n)),
            out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((R, bn), jnp.float32)],
            compiler_params=params,
        )
        return np.asarray(jax.jit(lambda: call(x[:, :half], x[:, half:], qq, scale))())

    got = one(True, q_tiled)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    log(f"tiled kernel rel err vs numpy: {err:.2e}")
    assert err < 5e-2, err


if __name__ == "__main__":
    main()
