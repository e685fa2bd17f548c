#!/usr/bin/env python
"""Hypothesis probe for the serve_device per-wave residual
(SERVE_DEVICE_r05.json residual_open): the admission-prefill chunk step
runs the chunk forward over ALL B slots (`_admit_prefill_step` vmaps
`_prefill_chunk_impl` across the batch, non-admitting slots write to the
tail zone).  If that full-batch B*C-token forward is compute-bound, its
cost scales with B but NOT with KV-cache bytes -- exactly the residual's
signature (~26/65/100 ms/wave at B=8/16/32, unchanged under int4 KV).

Measures, per batch size: decode-iterate time vs one _admit_prefill_step
time (both salted fori_loop, differenced).
"""
import json
import sys
import os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--kv-quant", default="int8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.engine.batched import BatchedSpecEngine
    from sequoia_tpu.planner.dp import plan
    from sequoia_tpu.planner.profile import (
        default_acceptance_vector,
        time_forward_widths,
    )
    from sequoia_tpu.quant.quantize import random_quantized_model

    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tparams.embed, dparams.embed))

    p = default_acceptance_vector()
    M = 320
    rng = np.random.default_rng(23)
    rows = []
    for B in [int(x) for x in args.batches.split(",")]:
        bbudgets = (1, 4, 8, 16)
        btt = time_forward_widths(tparams, tcfg, bbudgets, max_length=M,
                                  kv_len=96, reps=8, batch=B,
                                  kv_quant=args.kv_quant)
        bdt = time_forward_widths(dparams, dcfg, (4,), max_length=M,
                                  kv_len=96, reps=10, batch=B)[0]
        bgm, _ = plan(p, list(bbudgets), btt, bdt, max_depth=14, max_branch=8)
        beng = BatchedSpecEngine(
            dparams, dcfg, tparams, tcfg, bgm, algorithm="sequoia",
            max_length=M, temperature=0.6, top_p=0.9, prefill_chunk=64,
            batch_size=B, kv_quant=args.kv_quant)

        prompt = rng.integers(10, tcfg.vocab_size, size=96)
        bstate = beng.prefill_batch([prompt] * B)
        sax = beng.state_axes
        vit = jax.vmap(beng._iterate_impl, in_axes=(None, None, sax),
                       out_axes=(sax, 0))

        n_q = 2 * B
        qtok = jnp.asarray(
            rng.integers(10, tcfg.vocab_size, size=(n_q, 128)), jnp.int32)
        qlen = jnp.full((n_q,), 96, jnp.int32)
        # exactly ONE slot admitting (the production-typical case)
        slot_req = jnp.where(jnp.arange(B) == 0, B, jnp.arange(B))
        mode = jnp.arange(B) == 0

        @jax.jit
        def floop(n, salt, dp, tp, st):
            st = st._replace(tokens=st.tokens + salt)

            def body(i, s):
                s2, _ = vit(dp, tp, s)
                return s2._replace(gtl=st.gtl, terminal=st.terminal)
            return jax.lax.fori_loop(0, n, body, st)

        @jax.jit
        def pfloop(n, salt, dp, tp, st):
            st = st._replace(tokens=st.tokens + salt)

            def body(i, s):
                s2, _, _ = beng._admit_prefill_step(
                    dp, tp, s, qtok, qlen, slot_req, mode,
                    jnp.zeros((B,), jnp.int32))
                return s2._replace(gtl=st.gtl)
            return jax.lax.fori_loop(0, n, body, st)

        def timed(fn, R=12, r1=3):
            float(fn(jnp.asarray(r1, jnp.int32), jnp.asarray(0, jnp.int32),
                     dparams, tparams, bstate)
                  .tokens.astype(jnp.float32).sum())
            samples = []
            for j in range(3):
                t0 = time.perf_counter()
                float(fn(jnp.asarray(r1, jnp.int32),
                         jnp.asarray(1 + j, jnp.int32),
                         dparams, tparams, bstate)
                      .tokens.astype(jnp.float32).sum())
                ts = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(fn(jnp.asarray(R, jnp.int32),
                         jnp.asarray(4 + j, jnp.int32),
                         dparams, tparams, bstate)
                      .tokens.astype(jnp.float32).sum())
                tl = time.perf_counter() - t0
                samples.append((tl - ts) / (R - r1))
            samples.sort()
            return samples[1]

        t_iter = timed(floop)
        t_pf = timed(pfloop)
        log(f"B={B}: decode iterate {t_iter*1e3:.2f} ms, "
            f"full-batch prefill chunk step {t_pf*1e3:.2f} ms "
            f"(x{t_pf/t_iter:.1f})")
        rows.append({"batch": B, "t_iter_ms": round(t_iter * 1e3, 2),
                     "t_pf_step_ms": round(t_pf * 1e3, 2),
                     "ratio": round(t_pf / t_iter, 2)})
        del bstate, beng
    print(json.dumps({"kv_quant": args.kv_quant, "rows": rows}))


if __name__ == "__main__":
    main()
