#!/usr/bin/env python
"""Serving decision-boundary matrix (round-5 judge item #7).

Sweeps `serve_auto` over workload shapes — B x gen, mixed prompt lengths —
and records, per cell: the mode the policy picked, the measured wall-clock
tok/s of serve_auto, AND the measured tok/s of the OTHER mode on the same
queue. Also re-measures serve_device vs the host-scheduled serve_fast on
two shapes (the round-4 run had decayed to ~1.02x on its single shape).

The per-B policy inputs (spec iteration time, E, batched AR step) are
measured in-process the same way bench._bench_batched does. A "degraded
tree" cell (deep chain growmap at B=32) exercises the policy's AR flip on
a measured point: with a mis-planned tree the spec branch loses to batched
AR and `choose_serving_mode` must route around it — the boundary the
threshold exists for.

Reference role: serving-layer extension of `tests/run_L40.sh`-style sweeps
(the reference is single-request; batch serving is this repo's added
claim, so the claim carries its own measured decision boundary).
"""

import argparse
import json
import os as _os
import sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--gens", default="48,128")
    ap.add_argument("--max-length", type=int, default=320)
    ap.add_argument("--kv-quant", default="int8")
    ap.add_argument("--dst", default="SERVING_r05.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import importlib
    bench = importlib.import_module("bench")

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.engine.batched import (
        BatchedAREngine,
        BatchedSpecEngine,
        choose_serving_mode,
    )
    from sequoia_tpu.planner.dp import expected_accepted, plan
    from sequoia_tpu.planner.profile import (
        default_acceptance_vector,
        time_forward_widths,
    )
    from sequoia_tpu.quant.quantize import random_quantized_model
    from sequoia_tpu.trees.growmap import chain

    log(f"devices: {jax.devices()}")
    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    t0 = time.perf_counter()
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tparams.embed, dparams.embed))
    log(f"param init: {time.perf_counter() - t0:.1f}s")

    p = default_acceptance_vector()
    M = args.max_length
    rng = np.random.default_rng(23)
    R = 20

    def measure_policy_inputs(B, gm_override=None):
        """(t_iter, E, ar_step) for this batch, bench-style (salted,
        differenced)."""
        bbudgets = (1, 8, 16, 32) if B <= 16 else (1, 4, 8, 16)
        btt = time_forward_widths(tparams, tcfg, bbudgets, max_length=M,
                                  kv_len=96, reps=12, batch=B,
                                  kv_quant=args.kv_quant)
        bdt = time_forward_widths(dparams, dcfg, (4,), max_length=M,
                                  kv_len=96, reps=20, batch=B)[0]
        if gm_override is None:
            bgm, _ = plan(p, list(bbudgets), btt, bdt, max_depth=14,
                          max_branch=8)
        else:
            bgm = gm_override
        beng = BatchedSpecEngine(
            dparams, dcfg, tparams, tcfg, bgm, algorithm="sequoia",
            max_length=M, temperature=0.6, top_p=0.9, prefill_chunk=64,
            batch_size=B, kv_quant=args.kv_quant)
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

        r1 = max(2, R // 4)
        n1, n2 = jnp.asarray(r1, jnp.int32), jnp.asarray(R, jnp.int32)
        float(floop(n1, jnp.asarray(0, jnp.int32), dparams, tparams, bstate
                    ).tokens.astype(jnp.float32).sum())
        samples = []
        for j in range(3):
            t0 = time.perf_counter()
            float(floop(n1, jnp.asarray(1 + 2 * j, jnp.int32), dparams,
                        tparams, bstate).tokens.astype(jnp.float32).sum())
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(floop(n2, jnp.asarray(2 + 2 * j, jnp.int32), dparams,
                        tparams, bstate).tokens.astype(jnp.float32).sum())
            tl = time.perf_counter() - t0
            samples.append((tl - ts) / (R - r1))
        samples.sort()
        t_iter = samples[1]

        # REALIZED accepted/step on this pair, measured on-device (the
        # first matrix run fed the bundled vector's E=2.73 to the policy —
        # exactly the mis-routing serve_auto's contract forbids: the
        # random-weight pair realizes ~1.35, so the policy called spec in
        # every cell while AR won every measurement). Count emitted over a
        # short run of the real vmapped iteration.
        @jax.jit
        def count_emitted(n, dp, tp, st):
            def body(i, carry):
                s, acc = carry
                s2, stats = vit(dp, tp, s)
                s2 = s2._replace(gtl=st.gtl, terminal=st.terminal)
                return (s2, acc + stats.emitted.sum())
            return jax.lax.fori_loop(
                0, n, body, (st, jnp.asarray(0, jnp.int32)))[1]

        n_e = 24
        e_real = float(count_emitted(
            jnp.asarray(n_e, jnp.int32), dparams, tparams, bstate)) / (
                n_e * B)
        del bstate

        are = BatchedAREngine(tparams, tcfg, batch_size=B, max_length=M,
                              temperature=0.6, top_p=0.9, prefill_chunk=64,
                              kv_quant=args.kv_quant)
        vstep = jax.vmap(are._step_impl, in_axes=(None, are.state_axes),
                         out_axes=(are.state_axes, 0))

        @jax.jit
        def arloop(tp, st, salt):
            st = st._replace(tokens=st.tokens + salt)

            def body(i, carry):
                st0, acc = carry
                st2, tok = vstep(tp, st0)
                st2 = st2._replace(n=st0.n, terminal=st0.terminal)
                return (st2, acc + tok[0].astype(jnp.float32))
            return jax.lax.fori_loop(
                0, R, body, (st, jnp.asarray(0.0, jnp.float32)))[1]

        ar_st = are._stack_states(
            [are._prefill_state(prompt, seed=i)[0] for i in range(B)])
        float(arloop(tparams, ar_st, jnp.asarray(0, jnp.int32)))
        asamples = []
        for j in range(3):
            t0 = time.perf_counter()
            float(arloop(tparams, ar_st, jnp.asarray(1 + j, jnp.int32)))
            asamples.append((time.perf_counter() - t0) / R)
        asamples.sort()
        del ar_st
        return (beng, are, bgm, t_iter, e_real,
                float(expected_accepted(bgm, p)), asamples[1])

    def mixed_queue(B):
        lens = [32, 64, 96]
        return [rng.integers(10, tcfg.vocab_size, size=lens[i % 3])
                for i in range(2 * B)]

    cells = []
    device_vs_host = []
    for B in [int(b) for b in args.batches.split(",")]:
      try:
        (beng, are, bgm, t_iter, e_b, e_vec,
         ar_step) = measure_policy_inputs(B)
        mode = choose_serving_mode(t_iter, e_b, ar_step)
        log(f"B={B}: tree S={bgm.size} E_realized={e_b:.2f} (vector claims "
            f"{e_vec:.2f}) spec {t_iter*1e3:.2f} ms "
            f"({B*e_b/t_iter:.0f} tok/s) vs AR {ar_step*1e3:.2f} ms "
            f"({B/ar_step:.0f} tok/s) -> policy {mode}")
        for gen in [int(g) for g in args.gens.split(",")]:
            q = mixed_queue(B)
            beng.serve_fast(q, max_new_tokens=4)   # warm spec path (+refill)
            are.serve_fast(q, max_new_tokens=4)    # warm ar path
            # serve_auto itself once untimed: it routes to serve_device
            # when prompts fit, whose one-dispatch program is NOT warmed by
            # serve_fast (first matrix run paid a ~12 s compile inside the
            # timed call and read 57 tok/s).
            beng.serve_auto(q, spec_iter_s=t_iter, ar_step_s=ar_step,
                            expected_accepted=e_b, ar_engine=are,
                            max_new_tokens=1)
            t0 = time.perf_counter()
            beng.serve_auto(q, spec_iter_s=t_iter, ar_step_s=ar_step,
                            expected_accepted=e_b, ar_engine=are,
                            max_new_tokens=gen)
            dt = time.perf_counter() - t0
            auto_tok_s = beng.num_decoding_steps / dt
            picked = beng.serving_mode
            # the other mode, same queue
            if picked == "spec":
                t0 = time.perf_counter()
                are.serve_fast(q, max_new_tokens=gen)
                dt2 = time.perf_counter() - t0
                other_tok_s = are.num_decoding_steps / dt2
                spec_tok_s, ar_tok_s = auto_tok_s, other_tok_s
            else:
                t0 = time.perf_counter()
                beng.serve_fast(q, max_new_tokens=gen)
                dt2 = time.perf_counter() - t0
                other_tok_s = beng.num_decoding_steps / dt2
                spec_tok_s, ar_tok_s = other_tok_s, auto_tok_s
            winner = "spec" if spec_tok_s > ar_tok_s else "ar"
            log(f"  gen={gen}: serve_auto({picked}) {auto_tok_s:.0f} tok/s; "
                f"other mode {other_tok_s:.0f}; measured winner {winner} "
                f"(policy {'agrees' if winner == picked else 'DISAGREES'})")
            cells.append({
                "batch": B, "gen": gen, "queue": len(q),
                "realized_accepted_per_step": round(e_b, 3),
                "vector_claimed_accepted": round(e_vec, 3),
                "policy_mode": picked,
                "serve_auto_tokens_per_sec": round(auto_tok_s, 1),
                "spec_tokens_per_sec": round(spec_tok_s, 1),
                "ar_tokens_per_sec": round(ar_tok_s, 1),
                "measured_winner": winner,
                "policy_agrees": winner == picked,
            })
        # serve_device vs host-scheduled A/B on this batch (gen=128)
        if B in (16, 32):
            q = mixed_queue(B)
            gen = 128
            beng.serve_fast(q, max_new_tokens=4)
            t0 = time.perf_counter()
            beng.serve_fast(q, max_new_tokens=gen)
            host_tok_s = beng.num_decoding_steps / (time.perf_counter() - t0)
            beng.serve_device(q, max_new_tokens=1)
            t0 = time.perf_counter()
            beng.serve_device(q, max_new_tokens=gen)
            dev_tok_s = beng.num_decoding_steps / (time.perf_counter() - t0)
            log(f"  device-vs-host B={B} gen={gen}: device {dev_tok_s:.0f} "
                f"vs host {host_tok_s:.0f} tok/s "
                f"({dev_tok_s / host_tok_s:.2f}x)")
            device_vs_host.append({
                "batch": B, "gen": gen,
                "serve_device_tokens_per_sec": round(dev_tok_s, 1),
                "serve_fast_tokens_per_sec": round(host_tok_s, 1),
                "ratio": round(dev_tok_s / host_tok_s, 3),
            })
        del beng, are
      except Exception as e:
        log(f"B={B} cell failed: {type(e).__name__}: {str(e)[:140]}")
        cells.append({"batch": B, "error": f"{type(e).__name__}"})
      import gc
      jax.clear_caches()
      gc.collect()

    # Degraded-tree cell: a mis-planned deep chain at B=32 — the spec branch
    # should LOSE to batched AR and the policy must flip.
    B = 32
    (beng, are, bgm, t_iter, e_b, e_vec,
     ar_step) = measure_policy_inputs(B, gm_override=chain(12))
    mode = choose_serving_mode(t_iter, e_b, ar_step)
    q = mixed_queue(B)
    beng.serve_fast(q, max_new_tokens=4)
    are.serve_fast(q, max_new_tokens=4)
    gen = 64
    beng.serve_auto(q, spec_iter_s=t_iter, ar_step_s=ar_step,
                    expected_accepted=e_b, ar_engine=are, max_new_tokens=1)
    t0 = time.perf_counter()
    beng.serve_auto(q, spec_iter_s=t_iter, ar_step_s=ar_step,
                    expected_accepted=e_b, ar_engine=are, max_new_tokens=gen)
    auto_tok_s = beng.num_decoding_steps / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    beng.serve_fast(q, max_new_tokens=gen)
    spec_tok_s = beng.num_decoding_steps / (time.perf_counter() - t0)
    picked = beng.serving_mode
    log(f"degraded chain:12 B=32: policy {picked} (spec E={e_b:.2f} "
        f"{t_iter*1e3:.1f} ms vs AR {ar_step*1e3:.1f} ms); serve_auto "
        f"{auto_tok_s:.0f} tok/s vs forced-spec {spec_tok_s:.0f}")
    degraded = {
        "tree": "chain:12", "batch": B, "gen": gen,
        "policy_mode": picked,
        "spec_iter_ms": round(t_iter * 1e3, 2),
        "expected_accepted": round(e_b, 3),
        "ar_step_ms": round(ar_step * 1e3, 2),
        "serve_auto_tokens_per_sec": round(auto_tok_s, 1),
        "forced_spec_tokens_per_sec": round(spec_tok_s, 1),
        "policy_flip_correct": picked == "ar" and auto_tok_s > spec_tok_s,
    }

    out = {"kv_quant": args.kv_quant, "max_length": M,
           "cells": cells, "device_vs_host": device_vs_host,
           "degraded_tree_flip": degraded}
    json.dump(out, open(args.dst, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
