#!/usr/bin/env python
"""Diagnose the serve_device mixed-length regression (SERVING_r05:
device/host 0.64-0.82x at B=16/32, gen=128).

Hypotheses:
  H1 per-iteration cost: admit iterations pay decode + chunked-prefill
     (double weight stream), and mixed traffic staggers admits so many
     iterations carry the penalty.
  H2 excess iterations: the one-dispatch while_loop runs until the
     SLOWEST slot chain finishes and cannot retire early slots, so the
     device path simply executes more batched iterations than the
     host-scheduled path.

Measures, on the SAME mixed queue (lens 32/64/96, 2B requests, gen=128):
  - serve_fast wall + its num_large_model_steps
  - serve_device wall + its steps counter
  - the decode-only iteration time (floop, bench-style) => predicted
    decode-only wall for each step count; the residual is the per-step
    penalty (H1).
"""
import argparse
import json
import sys
import os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--max-length", type=int, default=320)
    ap.add_argument("--kv-quant", default="int8")
    ap.add_argument("--harvest-batch", type=int, default=1)
    ap.add_argument("--uniform", action="store_true",
                    help="uniform 64-token prompts (isolates per-wave cost)")
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
    M = args.max_length
    B = args.batch
    rng = np.random.default_rng(23)

    bbudgets = (1, 8, 16, 32) if B <= 16 else (1, 4, 8, 16)
    btt = time_forward_widths(tparams, tcfg, bbudgets, max_length=M,
                              kv_len=96, reps=12, batch=B,
                              kv_quant=args.kv_quant)
    bdt = time_forward_widths(dparams, dcfg, (4,), max_length=M,
                              kv_len=96, reps=20, batch=B)[0]
    bgm, _ = plan(p, list(bbudgets), btt, bdt, max_depth=14, max_branch=8)
    log(f"tree S={bgm.size} depth={bgm.depth}")
    beng = BatchedSpecEngine(
        dparams, dcfg, tparams, tcfg, bgm, algorithm="sequoia",
        max_length=M, temperature=0.6, top_p=0.9, prefill_chunk=64,
        batch_size=B, kv_quant=args.kv_quant,
        harvest_batch=args.harvest_batch)

    # decode-only iteration time (salted, differenced)
    prompt = rng.integers(10, tcfg.vocab_size, size=96)
    bstate = beng.prefill_batch([prompt] * B)
    sax = beng.state_axes
    vit = jax.vmap(beng._iterate_impl, in_axes=(None, None, sax),
                   out_axes=(sax, 0))

    @jax.jit
    def floop(n, salt, dp, tp, st):
        st = st._replace(tokens=st.tokens + salt)

        def body(i, s):
            s2, _ = vit(dp, tp, s)
            return s2._replace(gtl=st.gtl, terminal=st.terminal)
        return jax.lax.fori_loop(0, n, body, st)

    R, r1 = 20, 5
    float(floop(jnp.asarray(r1, jnp.int32), jnp.asarray(0, jnp.int32),
                dparams, tparams, bstate).tokens.astype(jnp.float32).sum())
    samples = []
    for j in range(3):
        t0 = time.perf_counter()
        float(floop(jnp.asarray(r1, jnp.int32), jnp.asarray(1 + j, jnp.int32),
                    dparams, tparams, bstate).tokens.astype(jnp.float32).sum())
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(floop(jnp.asarray(R, jnp.int32), jnp.asarray(4 + j, jnp.int32),
                    dparams, tparams, bstate).tokens.astype(jnp.float32).sum())
        tl = time.perf_counter() - t0
        samples.append((tl - ts) / (R - r1))
    samples.sort()
    t_iter = samples[1]
    log(f"decode-only t_iter = {t_iter * 1e3:.2f} ms")
    del bstate

    def mixed_queue():
        lens = [64, 64, 64] if args.uniform else [32, 64, 96]
        return [rng.integers(10, tcfg.vocab_size, size=lens[i % 3])
                for i in range(2 * B)]

    q = mixed_queue()
    gen = args.gen

    # host path
    beng.serve_fast(q, max_new_tokens=4)
    t0 = time.perf_counter()
    beng.serve_fast(q, max_new_tokens=gen)
    host_dt = time.perf_counter() - t0
    host_steps = beng.num_large_model_steps
    host_tokens = beng.num_decoding_steps
    log(f"serve_fast:   {host_tokens / host_dt:7.1f} tok/s  "
        f"steps={host_steps}  wall={host_dt:.2f}s  "
        f"decode-only-pred={host_steps * t_iter:.2f}s")

    # device path
    beng.serve_device(q, max_new_tokens=1)
    t0 = time.perf_counter()
    beng.serve_device(q, max_new_tokens=gen)
    dev_dt = time.perf_counter() - t0
    dev_steps = beng.num_large_model_steps
    dev_tokens = beng.num_decoding_steps
    pf_steps = getattr(beng, "num_prefill_steps", -1)
    log(f"serve_device: {dev_tokens / dev_dt:7.1f} tok/s  "
        f"steps={dev_steps}  pf_steps={pf_steps}  wall={dev_dt:.2f}s  "
        f"decode-only-pred={dev_steps * t_iter:.2f}s")

    out = {
        "batch": B, "gen": gen, "t_iter_ms": round(t_iter * 1e3, 3),
        "host": {"tok_s": round(host_tokens / host_dt, 1),
                 "steps": int(host_steps), "wall_s": round(host_dt, 3),
                 "decode_pred_s": round(host_steps * t_iter, 3)},
        "device": {"tok_s": round(dev_tokens / dev_dt, 1),
                   "steps": int(dev_steps), "wall_s": round(dev_dt, 3),
                   "decode_pred_s": round(dev_steps * t_iter, 3)},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
