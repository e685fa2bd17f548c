#!/usr/bin/env python
"""13B ratio attack (round-4 judge item #1): true IN-LOOP attribution of the
fused iteration's non-verify overhead, plus the width curve out to budget
128, in one TPU run.

Round-3 standing: measured ratio 0.924 at size 64 (t_iter 19.87 ms, E 3.824,
t_base 17.92 ms), curve-aware ceiling 1.017. The standalone phase loops
(scripts/profile_iteration.py) over-measure badly (sum 29.7 ms vs full
21.7 ms) because each carries its own dispatch + carry overheads — so this
script measures VARIANTS OF THE FULL FUSED LOOP with pieces stubbed, all
with the salted differenced estimator (advisor r3: vary inputs per call),
and attributes cost by differencing variants:

  full            the engine's _iterate_impl
  nofilter        top_p = 1.0 engine         -> nucleus-filter cost
  noredraft       finalize minus the bonus width-1 draft forward
  nowalk          finalize with fixed path (no tprobs/walk/residual)
  growtarget      grow + target only         -> finalize total = full - this
  nosample        growtarget with constant child tokens -> WOR race cost
  targetonly      verify forward only        -> grow total = growtarget - this

Then: measure target_time(b) for b in {1,32,48,64,96,128} and full t_iter
for DP-planned trees at caps {48, 64, 96, 128} (mb 8 and 32), and print the
measured ratio table E(S) * t_base / t_iter(S) / 3.73.
"""

import argparse
import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="llama-2-13b")
    ap.add_argument("--draft", default="llama-68m")
    ap.add_argument("--quant", default="int8",
                    help="int8 | int4 | bf16 (bf16 = the parity-row config)")
    ap.add_argument("--draft-quant", default="int8")
    ap.add_argument("--max-length", type=int, default=384)
    ap.add_argument("--prefix-len", type=int, default=128)
    ap.add_argument("--caps", default="48,64,96,128",
                    help="tree-size caps for the candidate sweep")
    ap.add_argument("--reps", type=int, default=24)
    ap.add_argument("--ref-speedup", type=float, default=3.73)
    ap.add_argument("--walk", default="path", choices=["path", "node", "staged"])
    ap.add_argument("--skip-ablation", action="store_true")
    ap.add_argument("--ablation-cap", type=int, default=0,
                    help="skip the candidate sweep; plan ONE tree at this "
                         "cap and go straight to the in-loop ablation "
                         "(fresh-process reruns after an OOM)")
    ap.add_argument("--ablation-mb", type=int, default=8)
    ap.add_argument("--dst", default="",
                    help="write the candidate sweep as a JSON artifact "
                         "(pair rows for PAIRS_r05)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.init import random_params
    from sequoia_tpu.core.model import forward
    from sequoia_tpu.engine.baseline import ARBaseline
    from sequoia_tpu.engine.engine import SpecEngine
    from sequoia_tpu.planner.dp import expected_accepted, plan
    from sequoia_tpu.planner.profile import (
        default_acceptance_vector,
        measure_latency_curve,
    )
    from sequoia_tpu.quant.quantize import random_quantized_model

    sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
    import importlib
    bench = importlib.import_module("bench")

    log(f"devices: {jax.devices()}")
    tcfg = get_config(args.target)
    dcfg = get_config(args.draft)
    M = args.max_length
    t0 = time.perf_counter()
    if args.quant in ("bf16", "none"):
        tparams = random_params(tcfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    else:
        bits = {"int8": 8, "int4": 4}[args.quant]
        tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=bits)
    if args.draft_quant == "none":
        dparams = random_params(dcfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    else:
        dbits = {"int8": 8, "int4": 4}[args.draft_quant]
        dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=dbits)
    jax.block_until_ready((tparams.embed, dparams.embed))
    log(f"param init: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=args.prefix_len)

    # ---- AR baseline ----------------------------------------------------
    ar = ARBaseline(tparams, tcfg, max_length=M, temperature=0.6, top_p=0.9,
                    greedy=False, prefill_chunk=128)
    ar.generate_fast(prompt, max_new_tokens=8)
    t_base = bench._ar_step_time(ar, prompt)
    log(f"AR baseline: {t_base * 1e3:.3f} ms/token")

    caps = tuple(int(c) for c in args.caps.split(","))

    # ---- width curve ----------------------------------------------------
    fit = tuple(b for b in sorted({1, 32, 48, 64, 96, 128, *caps})
                if args.prefix_len + b + 32 <= M)
    budgets, target_time, _ = measure_latency_curve(
        dparams, dcfg, tparams, tcfg, budgets=fit, max_length=M,
        kv_len=args.prefix_len)
    log("width curve: " + ", ".join(
        f"t({b})={t * 1e3:.2f}ms" for b, t in zip(budgets, target_time)))

    p = default_acceptance_vector()
    # MEASURE the draft level cost — the 0.15 ms constant from the 68m
    # pairs mis-plans big drafts badly (a llama-3.2-1b level costs ~2.5 ms;
    # the DP then picked depth-7 trees whose grow phase alone was 18 ms).
    from sequoia_tpu.planner.profile import time_forward_widths

    draft_time = time_forward_widths(
        dparams, dcfg, (4,), max_length=M, kv_len=args.prefix_len,
        reps=24)[0]
    log(f"measured draft level cost: {draft_time * 1e3:.3f} ms")

    # ---- candidate trees: forced caps, both branch caps ------------------
    cands = {}
    for cap in caps:
        if cap not in budgets:
            continue
        tt = [target_time[budgets.index(cap)]]
        for mb in (8, 32):
            gm_c, _ = plan(p, [cap], tt, draft_time, max_depth=10, max_branch=mb)
            cands.setdefault((gm_c.size, int(gm_c.depth.max()), gm_c.max_branch), gm_c)

    def mk_engine(gm_c, top_p=0.9):
        return SpecEngine(dparams, dcfg, tparams, tcfg, gm_c,
                          algorithm="sequoia", max_length=M,
                          temperature=0.6, top_p=top_p, prefill_chunk=128,
                          walk=args.walk)

    if args.ablation_cap:
        tt = [target_time[budgets.index(args.ablation_cap)]]
        gm, _ = plan(p, [args.ablation_cap], tt, draft_time, max_depth=10,
                     max_branch=args.ablation_mb)
        e_c = expected_accepted(gm, p)
        best = (gm.size, int(gm.depth.max()), gm.max_branch, None, e_c, None)
        log(f"ablation-only on S={gm.size} d={best[1]} mb={best[2]} "
            f"E={e_c:.3f}")
    else:
        rows = []
        for (size, depth, mb), gm_c in sorted(cands.items()):
            eng = mk_engine(gm_c)
            state = eng.prefill(prompt)
            t_it = bench._fused_iter_time(eng, state, reps=args.reps)
            e_c = expected_accepted(gm_c, p)
            ratio = e_c * t_base / t_it / args.ref_speedup
            t_tgt = (target_time[budgets.index(size)] if size in budgets else None)
            ovh = (t_it - t_tgt) * 1e3 if t_tgt else float("nan")
            log(f"tree S={size:3d} d={depth} mb={mb:2d}: t_iter={t_it * 1e3:6.2f} ms "
                f"E={e_c:.3f} ovh={ovh:5.2f} ms -> ratio {ratio:.3f}")
            rows.append((size, depth, mb, t_it, e_c, ratio))
        best = max(rows, key=lambda r: r[-1])
        log(f"BEST measured ratio: {best[-1]:.3f} at S={best[0]} d={best[1]} mb={best[2]}")

        if args.dst:
            import json
            out = {
                "target": args.target, "draft": args.draft,
                "quant": args.quant, "draft_quant": args.draft_quant,
                "ar_ms_per_token": round(t_base * 1e3, 3),
                "target_time_ms": {b: round(t * 1e3, 3)
                                   for b, t in zip(budgets, target_time)},
                "ref_speedup": args.ref_speedup,
                "candidates": [
                    {"size": s, "depth": d, "max_branch": mb2,
                     "ms_per_iteration": round(t * 1e3, 3),
                     "expected_accepted": round(e, 3),
                     "speedup_vs_own_ar": round(e * t_base / t, 3),
                     "ratio_vs_ref": round(r, 3)}
                    for (s, d, mb2, t, e, r) in rows],
                "best": {"size": best[0], "depth": best[1],
                         "max_branch": best[2],
                         "ms_per_iteration": round(best[3] * 1e3, 3),
                         "expected_accepted": round(best[4], 3),
                         "speedup_vs_own_ar":
                             round(best[4] * t_base / best[3], 3),
                         "ratio_vs_ref": round(best[5], 3)},
            }
            json.dump(out, open(args.dst, "w"), indent=1)
            print(json.dumps(out))

        if args.skip_ablation:
            return

        # ---- in-loop ablation on the best tree ---------------------------
        gm = next(g for (s, d, mb2), g in sorted(cands.items())
                  if (s, d, mb2) == (best[0], best[1], best[2]))
    eng = mk_engine(gm)
    state = eng.prefill(prompt)

    def diff_timed(loop, fixed):
        return bench._diff_timed(loop, fixed, args.reps)

    R = args.reps

    def timed_body(name, mk_body, carrier="state"):
        """Time `reps` applications of mk_body inside one jit, salted +
        differenced (bench._diff_timed protocol)."""
        @jax.jit
        def loop(dp, tp, st, salt, n):
            st = st._replace(tokens=st.tokens + salt)

            def body(i, s):
                s2 = mk_body(dp, tp, s)
                return s2._replace(gtl=st.gtl, terminal=st.terminal)

            s = jax.lax.fori_loop(0, n, body, st)
            return s.tokens.astype(jnp.float32).sum()

        t = diff_timed(loop, (eng.draft_params, eng.target_params, state))
        log(f"{name:>12}: {t * 1e3:8.3f} ms/iter")
        return t

    # full
    def body_full(dp, tp, s):
        s2, _ = eng._iterate_impl(dp, tp, s)
        return s2

    t_full = timed_body("full", body_full)

    # growtarget: grow + verify, finalize skipped; dependence: next root
    # logits come from the verify's row 0, scratches consumed via epsilon.
    def body_growtarget(dp, tp, s):
        tokens_tree, draft_logits, tokens_buf, dscr, key = eng._grow_impl(dp, s)
        tl, tscr = eng._target_impl(tp, s, tokens_tree)
        dep = (tscr.k.reshape(-1)[0].astype(jnp.float32)
               + dscr.k.reshape(-1)[0].astype(jnp.float32)) * 1e-30
        return s._replace(
            tokens=tokens_buf, key=key,
            root_draft_logits=tl[0].astype(jnp.float32) + dep)

    t_gt = timed_body("growtarget", body_growtarget)

    # targetonly: verify forward only; tree tokens derived from prev logits.
    def body_targetonly(dp, tp, s):
        toks = jnp.argsort(-s.root_draft_logits)[: eng.tree_size].astype(jnp.int32)
        tl, tscr = eng._target_impl(tp, s, toks)
        return s._replace(root_draft_logits=tl[0].astype(jnp.float32))

    # argsort over [32000] is NOT cheap glue — use the engine's blockwise
    # top-k instead (same cost class as one grow-level sample).
    from sequoia_tpu.ops.sampling import top_k_indices

    def body_targetonly(dp, tp, s):  # noqa: F811
        toks = top_k_indices(s.root_draft_logits[None], eng.tree_size)[0]
        tl, tscr = eng._target_impl(tp, s, toks)
        return s._replace(root_draft_logits=tl[0].astype(jnp.float32))

    t_tonly = timed_body("targetonly", body_targetonly)

    # nosample: grow with constant child tokens (draft forwards + logits
    # buffer writes kept; WOR race + gumbel + root-row gathers skipped).
    orig_sample = eng._draft_grow_sample

    def cheap_sample(key, level, logits_roots, gumbel_rows=None):
        w = len(eng._level_gather[level])
        return (jnp.full((w,), 7, jnp.int32)
                + logits_roots.reshape(-1)[0].astype(jnp.int32) % 3)

    eng._draft_grow_sample = cheap_sample
    t_nosample = timed_body("nosample", body_growtarget)
    eng._draft_grow_sample = orig_sample

    # nofilter: top_p = 1.0 (no nucleus threshold in target_probs)
    eng_nf = mk_engine(gm, top_p=1.0)
    state_nf = eng_nf.prefill(prompt)

    @jax.jit
    def loop_nf(dp, tp, st, salt, n):
        st = st._replace(tokens=st.tokens + salt)

        def body(i, s):
            s2, _ = eng_nf._iterate_impl(dp, tp, s)
            return s2._replace(gtl=st.gtl, terminal=st.terminal)

        return jax.lax.fori_loop(0, n, body, st).tokens.astype(jnp.float32).sum()

    t_nf = diff_timed(loop_nf, (eng_nf.draft_params, eng_nf.target_params, state_nf))
    log(f"{'nofilter':>12}: {t_nf * 1e3:8.3f} ms/iter")

    # nowalk: grow + verify + commits + redraft, but fixed path (no tprobs,
    # no accept walk, no residual/bonus sampling).
    md = max(eng.max_depth, 1)

    def body_nowalk(dp, tp, s):
        gtl = s.gtl
        ts = gtl - 1
        tokens_tree, draft_logits, tokens_buf, dscr, key = eng._grow_impl(dp, s)
        tl, tscr = eng._target_impl(tp, s, tokens_tree)
        # fixed: accept the first child chain of length 2 + bonus = argmax row 0
        path_c = jnp.zeros((md,), jnp.int32).at[0].set(1)
        accept_count = jnp.asarray(2, jnp.int32)
        bonus = jnp.argmax(tl[0]).astype(jnp.int32)
        block = jnp.where(jnp.arange(md) < accept_count, tokens_tree[path_c], 0)
        block = jnp.concatenate([block, jnp.zeros((1,), jnp.int32)])
        block = block.at[accept_count].set(bonus)
        tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, block, (gtl,))
        target_kv = s.target_kv.commit_rows(
            tscr, jnp.concatenate([jnp.zeros((1,), jnp.int32), path_c]), ts)
        draft_kv = s.draft_kv.commit_rows(dscr, path_c, gtl)
        new_ts = gtl + accept_count  # pretend-new root (gtl is clamped after)
        root_token = jax.lax.dynamic_index_in_dim(tokens_buf, new_ts, keepdims=False)
        k_idx = jnp.arange(M, dtype=jnp.int32)[None, :]
        root_mask = k_idx <= new_ts
        root_logits, draft_kv = forward(
            dp, eng.draft_cfg, root_token[None], new_ts[None].astype(jnp.int32),
            draft_kv, new_ts, root_mask)
        return s._replace(tokens=tokens_buf, draft_kv=draft_kv,
                          target_kv=target_kv, key=key,
                          root_draft_logits=root_logits[0].astype(jnp.float32))

    t_nowalk = timed_body("nowalk", body_nowalk)

    # noredraft: full finalize but root logits reused from the tree row
    # (skips the width-1 draft forward). Approximated as nowalk+walk? No —
    # measure directly: full minus redraft via growtarget+walk is complex;
    # instead difference: redraft cost ~= (t_full - t_nowalk) is walk+bonus,
    # and (t_nowalk - t_gt) is commit+redraft.
    log("-" * 52)
    log(f"{'verify (targetonly)':>28}: {t_tonly * 1e3:7.3f} ms")
    log(f"{'grow total (gt - tonly)':>28}: {(t_gt - t_tonly) * 1e3:7.3f} ms")
    log(f"{'  WOR race (gt - nosample)':>28}: {(t_gt - t_nosample) * 1e3:7.3f} ms")
    log(f"{'finalize (full - gt)':>28}: {(t_full - t_gt) * 1e3:7.3f} ms")
    log(f"{'  commit+redraft (nowalk-gt)':>28}: {(t_nowalk - t_gt) * 1e3:7.3f} ms")
    log(f"{'  walk+tprobs (full-nowalk)':>28}: {(t_full - t_nowalk) * 1e3:7.3f} ms")
    log(f"{'  nucleus (full - nofilter)':>28}: {(t_full - t_nf) * 1e3:7.3f} ms")
    log(f"{'full':>28}: {t_full * 1e3:7.3f} ms")
    e_best = best[4]
    log(f"ratio if finalize were free: "
        f"{e_best * t_base / t_gt / args.ref_speedup:.3f}")
    log(f"ratio if iter == verify:     "
        f"{e_best * t_base / t_tonly / args.ref_speedup:.3f}")


if __name__ == "__main__":
    main()
