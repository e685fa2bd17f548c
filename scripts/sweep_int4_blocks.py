#!/usr/bin/env python
"""Block-size sweep for the fused int4 dequant-matmul Pallas kernel.

Times a scan-chain of L stacked [K, N] int4 matmuls (the model's actual
execution shape: weights stream from HBM once per layer) for a grid of
(block_n, block_k) choices. Reports ms/matmul and effective packed-byte
bandwidth; pick the block that maximizes bandwidth.
"""

import argparse
import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--N", type=int, default=11008)
    ap.add_argument("--L", type=int, default=16)
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sequoia_tpu.kernels.quant_matmul import quant_matmul
    from sequoia_tpu.quant.qtensor import quantize_int4

    log(f"devices: {jax.devices()}  K={args.K} N={args.N} L={args.L} R={args.rows}")
    K, N, L, R = args.K, args.N, args.L, args.rows

    @jax.jit
    def init(key):
        ws = jax.random.normal(key, (L, K, N), jnp.float32) * 0.02
        return quantize_int4(ws)

    qt = init(jax.random.PRNGKey(0))
    jax.block_until_ready(qt.q)
    x = jax.random.normal(jax.random.PRNGKey(1), (R, K), jnp.bfloat16)
    packed_bytes = K // 2 * N

    for bn in (512, 1024, 2048):
        for bk in (1024, 2048, 4096, 8192):
            def chain(x, qt, bn=bn, bk=bk):
                def layer(h, w):
                    y = quant_matmul(h, w[0], w[1], bits=4,
                                     block_n=bn, block_k=bk)
                    h = (y[:, :K] * 1e-3).astype(jnp.bfloat16)
                    return h, None

                # reps INSIDE the jit: one host sync total (a host-level
                # rep costs a full tunnel round-trip ~25 ms, hiding the
                # kernel entirely).
                def rep(i, h):
                    h, _ = jax.lax.scan(layer, h, (qt.q, qt.scale))
                    return h

                h = jax.lax.fori_loop(0, args.reps, rep, x)
                return h.astype(jnp.float32).mean()

            fn = jax.jit(chain)
            try:
                float(fn(x, qt))
                t0 = time.perf_counter()
                out = float(fn(x, qt))
                dt = (time.perf_counter() - t0) / args.reps / L
                bw = packed_bytes / dt / 1e9
                log(f"bn={bn:5d} bk={bk:5d}: {dt * 1e3:7.3f} ms/matmul  {bw:6.0f} GB/s")
            except Exception as e:
                log(f"bn={bn:5d} bk={bk:5d}: FAILED {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
