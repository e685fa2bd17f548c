#!/usr/bin/env python
"""A/B: N-panel tiled int4 (production kernel path) vs row-major int4 vs
int8-XLA on the FULL llama-2-7b forward at verify width — the streamed
ground truth the round-3 probe couldn't isolate (its single-matmul loop
went VMEM-resident). In-loop differenced, salted inputs."""

import argparse
import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="llama-2-7b")
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--max-length", type=int, default=256)
    ap.add_argument("--kv-len", type=int, default=128)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--tile-head", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.model import LlamaParams, forward
    from sequoia_tpu.kvcache.cache import KVCache
    from sequoia_tpu.ops import masks
    from sequoia_tpu.quant.qtensor import QuantizedTensor, tile_int4
    from sequoia_tpu.quant.quantize import random_quantized_model

    import importlib
    bench = importlib.import_module("bench")

    cfg = get_config(args.target)
    Q, M, kvl = args.width, args.max_length, args.kv_len
    log(f"devices: {jax.devices()}  {args.target} width={Q}")

    def model_bytes(p):
        return sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(p)
                   if hasattr(a, "dtype"))

    def tile_params(p):
        lay = p.layers
        tiled = type(lay)(**{
            f: (tile_int4(getattr(lay, f))
                if isinstance(getattr(lay, f), QuantizedTensor)
                else getattr(lay, f))
            for f in lay._fields})
        head = p.lm_head
        if args.tile_head and isinstance(head, QuantizedTensor) \
                and head.scale.shape[-1] % 128 == 0:
            head = tile_int4(head)
        return LlamaParams(embed=p.embed, layers=tiled,
                           final_norm=p.final_norm, lm_head=head)

    def measure(params, label):
        gb = model_bytes(params) / 1e9
        tokens = jnp.zeros((Q,), jnp.int32)
        pos = kvl + jnp.arange(Q, dtype=jnp.int32)
        mask = masks.causal_mask(Q, M, kvl)
        kv = KVCache.init(cfg, M, jnp.bfloat16)

        @jax.jit
        def loop(p, kv, salt, n):
            def body(i, carry):
                toks, acc = carry
                logits, _ = forward(p, cfg, toks, pos, kv, kvl, mask)
                toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return toks, acc + logits[0, 0]

            toks0 = tokens + salt
            _, acc = jax.lax.fori_loop(0, n, body, (toks0, jnp.float32(0)))
            return acc

        t = bench._diff_timed(loop, (params, kv), args.reps)
        eff = gb / t
        log(f"{label:>22}: {t * 1e3:7.2f} ms/forward  ({gb:.2f} GB -> "
            f"{eff:.0f} GB/s effective)")
        return t

    p4 = random_quantized_model(cfg, jax.random.PRNGKey(0), bits=4)
    t_row = measure(p4, "int4 row-major")
    p4t = tile_params(p4)
    jax.block_until_ready(jax.tree.leaves(p4t)[0])
    t_tiled = measure(p4t, "int4 N-panel tiled")
    del p4, p4t
    import gc
    gc.collect()
    p8 = random_quantized_model(cfg, jax.random.PRNGKey(0), bits=8)
    t_int8 = measure(p8, "int8 (XLA convert+dot)")
    log(f"tiled vs row-major: {t_row / t_tiled:.2f}x; "
        f"tiled vs int8: {t_int8 / t_tiled:.2f}x at half the bytes")


if __name__ == "__main__":
    main()
