#!/usr/bin/env python
"""Round-5 trained-pair measurement run — three judge items in one TPU job
(train once, measure everything):

1. MEASURED_E2E_r05.json (judge item #2): ONE all-measured wall-clock
   speedup row. Every committed tok/s headline so far is implied
   (E[accept] / iteration-time); this run closes the chain: measured AR
   wall-clock ms/token, measured speculative wall-clock ms/token over
   >=1k generated tokens, measured accepted/step, and the pre-run
   prediction (planned E x fused-iteration time) on the same row.
   Protocol: `/root/reference/tests/testbed.py:88-94` (total_time /
   num_decoding_steps, accepted = steps ratio), via the same entry points
   `cli/testbed.py` uses (`generate_fast`).

2. BENCH_GREEDY_r05.json (judge item #4): greedy acceptance MEASURED (not
   proxied by the stochastic vector): argmax-match vector of the distilled
   pair via `dynamic_acceptance(algorithm="greedy")` on TPU
   (`/root/reference/tests/test_accept.py:88-139` `simulation_greedy`),
   a greedy growmap planned from it, measured accepted/step, and the
   greedy-spec == greedy-AR token-exact invariant asserted ON DEVICE.

3. ALGOS_r05.json (judge item #5): sequoia vs specinfer vs greedyS on the
   same pair / prompts / budget — measured accepted/step and wall-clock
   ms/token per algorithm, specinfer additionally over fixed k x d shapes
   (`/root/reference/tests/run.sh:1-30`, `test_specinfer.py:93`).

The pair is the round-4 realized-E>=5 recipe (scripts/pair_e5.py: 8L-256h
target, 8L-256h draft distilled 24k steps on corpus + on-policy rollouts,
advisor-r4 fixes applied: padded rollout positions masked from the loss,
calibration prompts disjoint from evaluation prompts). f32 everywhere with
matmul precision pinned 'highest' so the greedy parity check is exact-math.
Trained params are cached to --cache so re-runs skip training.
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


def save_params(path, params):
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    np.savez(path, **{f"l{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_params(path, template):
    import jax

    z = np.load(path)
    leaves = [z[f"l{i}"] for i in range(len(z.files))]
    treedef = jax.tree_util.tree_structure(template)
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target-steps", type=int, default=800)
    ap.add_argument("--draft-steps", type=int, default=24000)
    ap.add_argument("--rollouts", type=int, default=512)
    ap.add_argument("--target-shape", default="8,256",
                    help="layers,hidden. The all-measured SPEEDUP row needs "
                         "an ASYMMETRIC pair (e.g. 12,1024 target vs 4,256 "
                         "draft): with equal shapes the v1 run realized "
                         "E=5.35 but lost wall-clock 0.72x — each iteration "
                         "cost 10 AR steps")
    ap.add_argument("--draft-shape", default="8,256")
    ap.add_argument("--vocab", type=int, default=512)
    ap.add_argument("--seq-len", type=int, default=160)
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--max-depth", type=int, default=12)
    ap.add_argument("--gen-tokens", type=int, default=96)
    ap.add_argument("--eval-prompts", type=int, default=12)
    ap.add_argument("--cache", default="/tmp/pair_r05")
    ap.add_argument("--sections", default="e2e,greedy,algos")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # Exact math: the greedy parity assertion compares argmaxes between the
    # AR decode path and the tree-verify path; default TPU f32 matmuls run
    # in bf16-ish passes whose ulp drift can flip argmax ties.
    jax.config.update("jax_default_matmul_precision", "highest")

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.init import random_params
    from sequoia_tpu.engine.baseline import ARBaseline
    from sequoia_tpu.engine.engine import SpecEngine
    from sequoia_tpu.planner.acceptance import (
        calibrate_vector,
        dynamic_acceptance,
    )
    from sequoia_tpu.planner.dp import expected_accepted, plan
    from sequoia_tpu.trees.growmap import uniform_tree
    from sequoia_tpu.tools.distill import (
        _shape_cfg,
        corpus_from_reference,
        train_lm,
    )

    sections = set(args.sections.split(","))
    base = dataclasses.replace(get_config("test-small"),
                               vocab_size=args.vocab)
    tshape = tuple(int(x) for x in args.target_shape.split(","))
    dshape = tuple(int(x) for x in args.draft_shape.split(","))
    tcfg = _shape_cfg(base, *tshape)
    dcfg = _shape_cfg(base, *dshape)
    pair_desc = (f"{tcfg.num_layers}L-{tcfg.hidden_size}h-v{args.vocab} "
                 f"target, {dcfg.num_layers}L-{dcfg.hidden_size}h "
                 f"distilled draft")
    seq_len = args.seq_len
    data = corpus_from_reference(vocab_size=tcfg.vocab_size, seq_len=seq_len)

    # ---- pair: load cache or train --------------------------------------
    tpath = f"{args.cache}_target.npz"
    dpath = f"{args.cache}_draft.npz"
    t_template = random_params(tcfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    d_template = random_params(dcfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    if _os.path.exists(tpath) and _os.path.exists(dpath):
        target = load_params(tpath, t_template)
        draft = load_params(dpath, d_template)
        log("pair loaded from cache")
    else:
        t0 = time.perf_counter()
        target = train_lm(tcfg, data, steps=args.target_steps, seed=0)
        log(f"target trained ({time.perf_counter() - t0:.0f}s)")
        t0 = time.perf_counter()
        ar0 = ARBaseline(target, tcfg, max_length=seq_len, temperature=0.6,
                         top_p=0.9, prefill_chunk=8)
        rng_r = np.random.default_rng(5)
        roll_rows, roll_lens = [], []
        for i in range(args.rollouts):
            pr = data[rng_r.integers(0, len(data))][:8]
            out = ar0.generate_fast(pr, max_new_tokens=seq_len - 8,
                                    seed=1000 + i)
            row = np.zeros(seq_len, np.int32)
            out = np.asarray(out)[:seq_len]
            row[: len(out)] = out
            roll_rows.append(row)
            roll_lens.append(len(out))
        distill_data = np.concatenate([data, np.stack(roll_rows)])
        lengths = np.concatenate([
            np.full(len(data), seq_len, np.int32),
            np.asarray(roll_lens, np.int32)])
        log(f"{args.rollouts} rollouts ({time.perf_counter() - t0:.0f}s)")
        t0 = time.perf_counter()
        sched = optax.cosine_decay_schedule(1.5e-3, args.draft_steps,
                                            alpha=0.05)
        draft = train_lm(dcfg, distill_data, steps=args.draft_steps, seed=1,
                         lr=sched, teacher=(target, tcfg),
                         distill_temperature=0.7, lengths=lengths)
        log(f"draft distilled ({time.perf_counter() - t0:.0f}s)")
        save_params(tpath, target)
        save_params(dpath, draft)

    # Disjoint prompt sets: evaluation rows [0, P), calibration rows
    # [P, P+6) (advisor r4).
    P = args.eval_prompts
    eval_prompts = [np.asarray(row[:24], np.int32) for row in data[:P]]
    cal_prompts = [np.asarray(row[:24], np.int32) for row in data[P : P + 6]]

    M = max(384, 96 + 24 + args.gen_tokens + args.budget + args.max_depth)

    def run_engine(eng, prompts, gen, seed0):
        """Wall-clock generate over prompts via the reference protocol
        (testbed.py:88-94): sync, time the decode calls, count tokens and
        target steps from the engine's counters (AR: produced == steps)."""
        emitted = steps = 0
        t_total = 0.0
        for i, pr in enumerate(prompts):
            plen = len(np.asarray(pr).reshape(-1))
            t0 = time.perf_counter()
            out = eng.generate_fast(pr, max_new_tokens=gen, seed=seed0 + i)
            t_total += time.perf_counter() - t0
            if hasattr(eng, "num_decoding_steps"):
                emitted += eng.num_decoding_steps
                steps += eng.num_large_model_steps
            else:
                produced = len(np.asarray(out)) - plen
                emitted += produced
                steps += produced
        return emitted, steps, t_total

    # ---- stochastic vector + calibrated plan ----------------------------
    t0 = time.perf_counter()
    vec = np.asarray(dynamic_acceptance(
        draft, dcfg, target, tcfg, cal_prompts, width=args.width,
        steps_per_prompt=40, max_length=192, temperature=0.6))
    vec = np.maximum(vec, 1e-4)
    vec[0] = 0.0
    log(f"stochastic vector: {[round(float(v), 3) for v in vec[:8]]} "
        f"({time.perf_counter() - t0:.0f}s)")

    gm_probe = uniform_tree(6, 2)
    eng_c = SpecEngine(draft, dcfg, target, tcfg, gm_probe,
                       algorithm="sequoia", max_length=M,
                       temperature=0.6, top_p=0.9, prefill_chunk=32)
    em, st, _ = run_engine(eng_c, cal_prompts, 128, 500)
    e_probe = em / max(st, 1)
    vec_cal, scale = calibrate_vector(vec, gm_probe, e_probe)
    log(f"probe depth-6 binary: measured {e_probe:.3f} -> scale x{scale:.3f}")

    budgets = [1, 2, 4, 8, 16, 32, args.budget]
    tt = [1.0, 1.0, 1.0, 1.0, 1.01, 1.02, 1.04]
    gm, _ = plan(vec_cal, budgets, tt, 0.005,
                 max_depth=args.max_depth, max_branch=16)
    e_planned = float(expected_accepted(gm, vec_cal))
    log(f"planned tree: size={gm.size} depth={int(gm.depth.max())} "
        f"E={e_planned:.3f}")

    out_e2e = None
    if "e2e" in sections:
        # ---- PRE-RUN prediction --------------------------------------
        # The implied-protocol quantities, measured piecewise BEFORE the
        # wall-clock run: planned E (calibrated vector) and the fused
        # per-iteration latency of the planned tree.
        import importlib

        sys.path.insert(0, _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), ".."))
        bench = importlib.import_module("bench")

        # Fixed token budget, reference-benchmark regime: stop tokens off so
        # every prompt generates exactly `gen` tokens (the v2 run's early
        # stops broke the per-call fixed-cost amortization the prediction
        # assumed — 89 realized tokens against a 192-token budget).
        tcfg_e = dataclasses.replace(tcfg, stop_tokens=())
        dcfg_e = dataclasses.replace(dcfg, stop_tokens=())
        # Regime-matched calibration: acceptance in the no-stop fixed-budget
        # regime runs HIGHER than the natural-text regime the shared vector
        # was measured in (unstopped generation drifts toward repetitive,
        # highly draft-predictable text — the v3 run realized E 7.45
        # against a natural-regime plan of 5.80, -10.4% ms/token drift).
        # The probe-tree calibration exists exactly to absorb regime bias:
        # re-measure the depth-6 probe with the e2e configs and recalibrate.
        eng_ce = SpecEngine(draft, dcfg_e, target, tcfg_e, gm_probe,
                            algorithm="sequoia", max_length=M,
                            temperature=0.6, top_p=0.9, prefill_chunk=32)
        em_e = st_e = 0
        for i, pr in enumerate(cal_prompts):
            eng_ce.generate_fast(pr, max_new_tokens=args.gen_tokens,
                                 seed=550 + i)
            em_e += eng_ce.num_decoding_steps
            st_e += eng_ce.num_large_model_steps
        e_probe_e2e = em_e / max(st_e, 1)
        vec_e2e, scale_e2e = calibrate_vector(vec, gm_probe, e_probe_e2e)
        gm_e, _ = plan(vec_e2e, budgets, tt, 0.005,
                       max_depth=args.max_depth, max_branch=16)
        e_planned = float(expected_accepted(gm_e, vec_e2e))
        log(f"e2e regime probe: {e_probe_e2e:.3f} accepted/step -> scale "
            f"x{scale_e2e:.3f}; re-planned size={gm_e.size} "
            f"depth={int(gm_e.depth.max())} E={e_planned:.3f}")
        del eng_ce
        eng = SpecEngine(draft, dcfg_e, target, tcfg_e, gm_e,
                         algorithm="sequoia", max_length=M, temperature=0.6,
                         top_p=0.9, prefill_chunk=32)
        state = eng.prefill(eval_prompts[0])
        t_iter = bench._fused_iter_time(eng, state, reps=24)
        del state
        asym_ms_per_token = t_iter / e_planned * 1e3

        # PRE-RUN measured cost model, every term from a DISJOINT warm
        # prompt: per-step cost of the PRODUCTION device loop (differenced
        # between two generation budgets — the fused fori estimator
        # understates it by the while-loop's per-trip machinery, ~0.3 ms
        # here, which is 1.5% noise at 7B scale but 15%+ on a 2 ms tiny-
        # pair iteration) and the per-call fixed cost (prefill dispatches
        # + the tunnel round-trip of the final fetch).
        warm = np.asarray(data[P + 6][:24], np.int32)
        ar = ARBaseline(target, tcfg_e, max_length=M, temperature=0.6,
                        top_p=0.9, prefill_chunk=32)
        ar.generate_fast(warm, max_new_tokens=4)      # compile
        eng.generate_fast(warm, max_new_tokens=4)     # compile
        t_ar_step = bench._ar_step_time(ar, warm)
        gen = args.gen_tokens

        def prod_costs(e, budget_lo, budget_hi):
            """(per-step production-loop cost, per-call fixed cost) by
            differencing two budgets through generate_fast; median of 3.
            AR has no step counter — its steps == produced tokens."""
            wlen = len(warm)

            def run(budget, seed):
                t0 = time.perf_counter()
                out = e.generate_fast(warm, max_new_tokens=budget, seed=seed)
                dt = time.perf_counter() - t0
                steps = (e.num_large_model_steps
                         if hasattr(e, "num_large_model_steps")
                         else len(np.asarray(out)) - wlen)
                return dt, steps

            per_step, fixed = [], []
            for r in range(3):
                t_lo, s_lo = run(budget_lo, 60 + r)
                t_hi, s_hi = run(budget_hi, 80 + r)
                ps = (t_hi - t_lo) / max(s_hi - s_lo, 1)
                per_step.append(ps)
                fixed.append(max(t_lo - s_lo * ps, 0.0))
            return float(np.median(per_step)), float(np.median(fixed))

        t_step_spec, fixed_spec = prod_costs(eng, max(gen // 4, 8), gen)
        t_step_ar, fixed_ar = prod_costs(ar, max(gen // 4, 8), gen)
        steps_pp = int(np.ceil(gen / e_planned))
        pred_spec_wall = P * (fixed_spec + steps_pp * t_step_spec)
        pred_ar_wall = P * (fixed_ar + gen * t_step_ar)
        pred_ms_per_token = pred_spec_wall / (P * gen) * 1e3
        pred_ar_ms = pred_ar_wall / (P * gen) * 1e3
        log(f"PREDICTION: fused iter {t_iter * 1e3:.3f} ms, production "
            f"step {t_step_spec * 1e3:.3f} ms, E {e_planned:.3f}, "
            f"fixed/call spec {fixed_spec * 1e3:.1f} ms ar "
            f"{fixed_ar * 1e3:.1f} ms (ar step {t_ar_step * 1e3:.3f} fori "
            f"vs {t_step_ar * 1e3:.3f} production) -> spec "
            f"{pred_ms_per_token:.3f} ms/token (asymptotic "
            f"{asym_ms_per_token:.3f}), ar {pred_ar_ms:.3f} ms/token")

        # ---- measured AR wall-clock ----------------------------------
        ar_em, ar_st, ar_t = run_engine(ar, eval_prompts, gen, 100)
        ar_ms = ar_t / max(ar_em, 1) * 1e3
        log(f"AR wall-clock: {ar_em} tokens in {ar_t:.2f}s = {ar_ms:.3f} "
            f"ms/token (predicted {pred_ar_ms:.3f})")

        # ---- measured spec wall-clock --------------------------------
        sp_em, sp_st, sp_t = run_engine(eng, eval_prompts, gen, 100)
        sp_ms = sp_t / max(sp_em, 1) * 1e3
        e_meas = sp_em / max(sp_st, 1)
        drift = 100.0 * (sp_ms - pred_ms_per_token) / pred_ms_per_token
        ar_drift = 100.0 * (ar_ms - pred_ar_ms) / pred_ar_ms
        log(f"SPEC wall-clock: {sp_em} tokens / {sp_st} steps in {sp_t:.2f}s "
            f"= {sp_ms:.3f} ms/token (E {e_meas:.3f}); "
            f"predicted {pred_ms_per_token:.3f} -> drift {drift:+.1f}%")

        out_e2e = {
            "pair": pair_desc + " (f32, matmul precision highest)",
            "protocol": "reference tests/testbed.py:88-94 wall-clock; all "
                        "quantities in this row are measured (prediction "
                        "made before the run from planned E + production-"
                        "loop step cost + per-call fixed cost, each "
                        "measured on a disjoint warm prompt); fixed token "
                        "budget (stop tokens off), the reference benchmark "
                        "regime. fused_vs_production_gap_ms is the while-"
                        "loop machinery the fused estimator understates — "
                        "~1.5% at 7B iteration times, material only at "
                        "this tiny pair's scale",
            "tree_size": gm_e.size,
            "tree_depth": int(gm_e.depth.max()),
            "regime_probe_accepted_per_step": round(e_probe_e2e, 3),
            "regime_calibration_scale": round(scale_e2e, 4),
            "planned_expected_accepted": round(e_planned, 3),
            "fused_iteration_ms": round(t_iter * 1e3, 3),
            "production_step_ms": round(t_step_spec * 1e3, 3),
            "fused_vs_production_gap_ms": round(
                (t_step_spec - t_iter) * 1e3, 3),
            "ar_step_fori_ms": round(t_ar_step * 1e3, 3),
            "ar_step_production_ms": round(t_step_ar * 1e3, 3),
            "per_call_fixed_ms": {"spec": round(fixed_spec * 1e3, 1),
                                  "ar": round(fixed_ar * 1e3, 1)},
            "asymptotic_ms_per_token": round(asym_ms_per_token, 3),
            "predicted_ms_per_token": round(pred_ms_per_token, 3),
            "predicted_ar_ms_per_token": round(pred_ar_ms, 3),
            "predicted_tokens_per_sec": round(1e3 / pred_ms_per_token, 1),
            "ar_wall_ms_per_token": round(ar_ms, 3),
            "ar_tokens": int(ar_em),
            "spec_wall_ms_per_token": round(sp_ms, 3),
            "spec_tokens": int(sp_em),
            "spec_target_steps": int(sp_st),
            "measured_accepted_per_step": round(e_meas, 3),
            "measured_tokens_per_sec": round(1e3 / sp_ms, 1),
            "measured_wall_clock_speedup": round(ar_ms / sp_ms, 3),
            "predicted_vs_measured_drift_pct": round(drift, 1),
            "ar_predicted_vs_measured_drift_pct": round(ar_drift, 1),
        }
        json.dump(out_e2e, open("MEASURED_E2E_r05.json", "w"), indent=1)
        log("MEASURED_E2E_r05.json written")

    out_greedy = None
    if "greedy" in sections:
        # ---- measured greedy vector (argmax-match by rank) ------------
        t0 = time.perf_counter()
        gvec = np.asarray(dynamic_acceptance(
            draft, dcfg, target, tcfg, cal_prompts, width=args.width,
            steps_per_prompt=40, max_length=192, temperature=0.6,
            algorithm="greedy"))
        gvec = np.maximum(gvec, 1e-4)
        gvec[0] = 0.0
        log(f"greedy vector (measured): "
            f"{[round(float(v), 3) for v in gvec[:8]]} "
            f"({time.perf_counter() - t0:.0f}s)")

        # greedy probe calibration: same depth-compounding correction as
        # the stochastic path, measured with the greedy engine.
        eng_gp = SpecEngine(draft, dcfg, target, tcfg, gm_probe,
                            algorithm="greedy", max_length=M,
                            temperature=0.6, top_p=0.9, prefill_chunk=32)
        em, st, _ = run_engine(eng_gp, cal_prompts, 128, 700)
        ge_probe = em / max(st, 1)
        gvec_cal, gscale = calibrate_vector(gvec, gm_probe, ge_probe)
        log(f"greedy probe: measured {ge_probe:.3f} -> scale x{gscale:.3f}")

        ggm, _ = plan(gvec_cal, budgets, tt, 0.005,
                      max_depth=args.max_depth, max_branch=16)
        ge_planned = float(expected_accepted(ggm, gvec_cal))
        log(f"greedy planned tree: size={ggm.size} "
            f"depth={int(ggm.depth.max())} E={ge_planned:.3f}")

        eng_g = SpecEngine(draft, dcfg, target, tcfg, ggm,
                           algorithm="greedy", max_length=M,
                           temperature=0.6, top_p=0.9, prefill_chunk=32)
        eng_g.generate_fast(eval_prompts[0], max_new_tokens=4)
        g_em, g_st, g_t = run_engine(eng_g, eval_prompts, args.gen_tokens,
                                     300)
        ge_meas = g_em / max(g_st, 1)
        g_drift = 100.0 * (ge_meas - ge_planned) / ge_planned
        log(f"greedy measured accepted/step: {ge_meas:.3f} "
            f"(planned {ge_planned:.3f}, drift {g_drift:+.1f}%)")

        # ---- on-device token-exact greedy parity ---------------------
        ar_g = ARBaseline(target, tcfg, max_length=M, greedy=True,
                          prefill_chunk=32)
        mismatches = 0
        checked = 0
        for i, pr in enumerate(eval_prompts[:6]):
            exp = np.asarray(ar_g.generate(pr, max_new_tokens=64))
            got = np.asarray(eng_g.generate_fast(pr, max_new_tokens=64,
                                                 seed=i))
            n = min(len(exp), len(got))
            checked += n
            mismatches += int((exp[:n] != got[:n]).sum())
        log(f"greedy parity on TPU: {mismatches} mismatches over {checked} "
            f"tokens")

        out_greedy = {
            "pair": pair_desc,
            "greedy_vector_measured_head":
                [round(float(v), 4) for v in gvec[:10]],
            "stochastic_vector_head_for_contrast":
                [round(float(v), 4) for v in vec[:10]],
            "probe_measured_accepted": round(ge_probe, 3),
            "depth_calibration_scale": round(gscale, 4),
            "tree_size": ggm.size,
            "tree_depth": int(ggm.depth.max()),
            "planned_expected_accepted": round(ge_planned, 3),
            "measured_accepted_per_step": round(ge_meas, 3),
            "planned_vs_measured_drift_pct": round(g_drift, 1),
            "tokens": int(g_em),
            "wall_ms_per_token": round(g_t / max(g_em, 1) * 1e3, 3),
            "tpu_token_exact_parity": {
                "tokens_checked": int(checked),
                "mismatches": int(mismatches),
            },
            "note": "greedy vector MEASURED with the distilled pair on TPU "
                    "(round-4 rows proxied it with the stochastic vector); "
                    "tree planned FROM the greedy vector; parity asserted "
                    "on device at matmul precision highest",
        }
        json.dump(out_greedy, open("BENCH_GREEDY_r05.json", "w"), indent=1)
        log("BENCH_GREEDY_r05.json written")

    out_algos = None
    if "algos" in sections:
        rows = []

        def algo_row(name, algo, gm_a, label):
            eng_a = SpecEngine(draft, dcfg, target, tcfg, gm_a,
                               algorithm=algo, max_length=M,
                               temperature=0.6, top_p=0.9, prefill_chunk=32)
            eng_a.generate_fast(eval_prompts[0], max_new_tokens=4)
            em, st, t = run_engine(eng_a, eval_prompts, args.gen_tokens, 900)
            e = em / max(st, 1)
            ms = t / max(em, 1) * 1e3
            log(f"{name:18s} {label:14s}: E={e:.3f} {ms:.3f} ms/token "
                f"({em} tokens)")
            rows.append({
                "algorithm": name, "tree": label, "tree_size": gm_a.size,
                "tree_depth": int(gm_a.depth.max()),
                "measured_accepted_per_step": round(e, 3),
                "wall_ms_per_token": round(ms, 3),
                "tokens": int(em),
            })
            return e

        label = f"planned:{gm.size}"
        e_seq = algo_row("sequoia", "sequoia", gm, label)
        e_si = algo_row("specinfer", "specinfer", gm, label)
        algo_row("greedys", "greedys", gm, label)
        for d, b in ((5, 2), (3, 3), (2, 7)):
            gm_f = uniform_tree(d, b)
            algo_row("specinfer", "specinfer", gm_f, f"tree:{d}x{b}")
            algo_row("sequoia", "sequoia", gm_f, f"tree:{d}x{b}")

        out_algos = {
            "pair": pair_desc,
            "prompts": P,
            "gen_tokens_per_prompt": args.gen_tokens,
            "temperature": 0.6, "top_p": 0.9,
            "rows": rows,
            "sequoia_beats_specinfer_on_planned_tree":
                bool(e_seq > e_si),
            "note": "same pair, same prompts, same budget; reference "
                    "comparison protocol tests/run.sh + test_specinfer.py:93",
        }
        json.dump(out_algos, open("ALGOS_r05.json", "w"), indent=1)
        log("ALGOS_r05.json written")

    print(json.dumps({
        "e2e": out_e2e, "greedy": out_greedy, "algos": out_algos}))


if __name__ == "__main__":
    main()
