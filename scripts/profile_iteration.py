#!/usr/bin/env python
"""Decompose the fused speculative iteration into on-device phase costs.

Each phase runs `--reps` times inside ONE jitted `lax.fori_loop` with a real
data dependence rep-to-rep (evolving KV / PRNG key), so XLA cannot hoist the
body and no host/tunnel round-trip pollutes the numbers (same methodology as
planner/profile.py's reps loop).

Phases (matching engine/engine.py's _iterate_impl):
  grow      draft tree growth: per-level WOR sampling + draft forwards
  sample    the sampling part of grow alone (gumbel top-k per level)
  target    tree-verify forward of the target model
  tprobs    nucleus-filtered softmax of target logits (bisection)
  accept    stochastic accept walk (sparse) + path resolve
  compact   KV compaction of both caches
  redraft   width-1 draft forward on the bonus token
  full      the engine's own fused iteration (sum check)
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
    ap.add_argument("--target", default="llama-2-7b")
    ap.add_argument("--draft", default="llama-68m")
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--growmap", default="growmaps/TPU-v5-lite-llama-2-7b-int8-llama-68m-stochastic-S64.json")
    ap.add_argument("--max-length", type=int, default=256)
    ap.add_argument("--prefix-len", type=int, default=128)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.init import random_params
    from sequoia_tpu.engine.engine import SpecEngine
    from sequoia_tpu.trees.growmap import GrowMap

    log(f"devices: {jax.devices()}")
    tcfg = get_config(args.target)
    dcfg = get_config(args.draft)
    t0 = time.perf_counter()
    if args.quant == "none":
        tparams = random_params(tcfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    else:
        from sequoia_tpu.quant.quantize import random_quantized_model
        bits = {"int8": 8, "int4": 4}[args.quant]
        tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=bits)
    dparams = random_params(dcfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    jax.block_until_ready((tparams.embed, dparams.embed))
    log(f"param init: {time.perf_counter() - t0:.1f}s")

    gm = GrowMap.load(args.growmap)
    log(f"growmap: size={gm.size} depth={int(gm.depth.max())} widths={gm.level_widths}")

    eng = SpecEngine(
        dparams, dcfg, tparams, tcfg, gm,
        algorithm="sequoia", max_length=args.max_length,
        temperature=0.6, top_p=0.9, prefill_chunk=128,
    )
    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=args.prefix_len)
    state = eng.prefill(prompt)
    jax.block_until_ready(state.tokens)

    R = args.reps

    def timed(name, fn, *a):
        # Every loop takes a trailing i32 `salt` folded into its inputs;
        # each call here uses a DISTINCT salt so no dispatch (warmup
        # included) shares bit-identical inputs — the runtime caches
        # same-input executions (observed in probe_int4_tiled.py), and a
        # cache hit would report ~RTT/R instead of the phase time.
        jax.block_until_ready(fn(*a, jnp.asarray(0, jnp.int32)))  # compile + warmup
        samples = []
        for j in range(3):
            t0 = time.perf_counter()
            out = fn(*a, jnp.asarray(1 + j, jnp.int32))
            jax.block_until_ready(out)
            samples.append((time.perf_counter() - t0) / R)
        samples.sort()
        dt = samples[1]
        log(f"{name:>10}: {dt * 1e3:8.3f} ms/rep")
        return dt

    # ---- grow: evolving key + logits dependence (split-cache: _grow_impl
    # returns a [L, size, ...] SCRATCH, the main draft_kv is read-only) ------
    @jax.jit
    def grow_loop(dp, state, salt):
        state = state._replace(tokens=state.tokens + salt)

        def body(i, st):
            tokens_tree, draft_logits, tokens_buf, dscratch, key = eng._grow_impl(dp, st)
            dep = dscratch.k.reshape(-1)[0].astype(jnp.float32)
            return st._replace(key=key,
                               root_draft_logits=draft_logits[0] + dep)
        return jax.lax.fori_loop(0, R, body, state)

    # ---- sample only: per-level WOR sampling, evolving key ----------------
    @jax.jit
    def sample_loop(state, salt):
        logits0 = jnp.broadcast_to(state.root_draft_logits, (gm.size, eng.vocab))
        state = state._replace(key=jax.random.fold_in(state.key, salt))

        def body(i, carry):
            key, acc = carry
            for lvl in range(gm.num_grow_steps):
                key, sub = jax.random.split(key)
                toks = eng._draft_grow_sample(sub, lvl, logits0[eng._level_roots[lvl]])
                acc = acc + toks.sum()
            return key, acc
        return jax.lax.fori_loop(0, R, body, (state.key, jnp.int32(0)))

    # ---- target: tokens derived from prev logits (split-cache: the main
    # target_kv is read-only; _target_impl returns a scratch) ---------------
    @jax.jit
    def target_loop(tp, state, salt):
        state = state._replace(tokens=state.tokens + salt)

        def body(i, carry):
            st, toks = carry
            logits, _tscratch = eng._target_impl(tp, st, toks)
            new_toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return st, new_toks
        toks0 = jnp.zeros((gm.size,), jnp.int32)
        return jax.lax.fori_loop(0, R, body, (state, toks0))

    # ---- pieces of finalize ------------------------------------------------
    tokens_tree, draft_logits, tokens_buf, draft_kv_g, key_g = jax.jit(
        eng._grow_impl)(dparams, state)
    target_logits, target_kv_g = jax.jit(eng._target_impl)(tparams, state, tokens_tree)
    jax.block_until_ready((tokens_tree, target_logits))

    from sequoia_tpu.ops.sampling import target_probs
    from sequoia_tpu.trees.accept import resolve_path, stochastic_accept

    @jax.jit
    def tprobs_loop(logits, key, salt):
        key = jax.random.fold_in(key, salt)

        def body(i, carry):
            key, acc = carry
            key, sub = jax.random.split(key)
            lg = logits + jax.random.uniform(sub, (1,), jnp.float32) * 1e-6
            p = target_probs(lg, eng.top_p, eng.temperature)
            return key, acc + p[0, 0]
        return jax.lax.fori_loop(0, R, body, (key, jnp.float32(0)))

    p_full = jax.jit(lambda lg: target_probs(lg, eng.top_p, eng.temperature))(target_logits)
    jax.block_until_ready(p_full)

    @jax.jit
    def accept_loop(p, dlogits, toks, key, salt):
        key = jax.random.fold_in(key, salt)

        def body(i, carry):
            key, acc = carry
            key, kr = jax.random.split(key)
            r = jax.random.uniform(kr, (gm.size,), jnp.float32)
            res = stochastic_accept(p, dlogits, toks, r, eng._succ_np,
                                    eng.temperature, strict=True,
                                    mask_rejected_draft=True)
            path = resolve_path(res.accepted_child, toks, eng.stop_tokens,
                                max(eng.max_depth, 1))
            return key, acc + path.accept_count
        return jax.lax.fori_loop(0, R, body, (key, jnp.int32(0)))

    @jax.jit
    def compact_loop(state, dscr, tscr, key, salt):
        """KV commit (scratch rows -> main caches), the split-cache
        replacement for the old gather-compaction."""
        key = jax.random.fold_in(key, salt)
        md = max(eng.max_depth, 1)

        def body(i, carry):
            dkv, tkv, key = carry
            key, sub = jax.random.split(key)
            slots = jax.random.randint(sub, (md,), 0, gm.size, jnp.int32)
            tkv = tkv.commit_rows(
                tscr, jnp.concatenate([jnp.zeros((1,), jnp.int32), slots]),
                state.gtl - 1)
            dkv = dkv.commit_rows(dscr, slots, state.gtl)
            return dkv, tkv, key
        return jax.lax.fori_loop(0, R, body, (state.draft_kv, state.target_kv, key))

    @jax.jit
    def redraft_loop(dp, state, salt):
        from sequoia_tpu.core.model import forward
        M = eng.max_length
        ts = state.gtl - 1
        state = state._replace(tokens=state.tokens + salt)

        def body(i, carry):
            dkv, tok = carry
            k_idx = jnp.arange(M, dtype=jnp.int32)[None, :]
            mask = k_idx <= ts
            logits, dkv = forward(dp, dcfg, tok[None], ts[None], dkv, ts, mask)
            return dkv, jnp.argmax(logits[0]).astype(jnp.int32)
        return jax.lax.fori_loop(0, R, body, (state.draft_kv, jnp.int32(5) + salt))

    # ---- full engine iteration (gtl clamped so it never overruns) ----------
    @jax.jit
    def full_loop(dp, tp, state, salt):
        state = state._replace(tokens=state.tokens + salt)

        def body(i, st):
            st2, stats = eng._iterate_impl(dp, tp, st)
            return st2._replace(gtl=st.gtl, terminal=jnp.asarray(False))
        return jax.lax.fori_loop(0, R, body, state)

    t_grow = timed("grow", grow_loop, dparams, state)
    t_sample = timed("sample", sample_loop, state)
    t_target = timed("target", target_loop, tparams, state)
    t_tprobs = timed("tprobs", tprobs_loop, target_logits, state.key)
    t_accept = timed("accept", accept_loop, p_full, draft_logits, tokens_tree, state.key)
    t_compact = timed("compact", compact_loop, state, draft_kv_g,
                      target_kv_g, state.key)
    t_redraft = timed("redraft", redraft_loop, dparams, state)
    t_full = timed("full", full_loop, dparams, tparams, state)

    log("-" * 44)
    acc = t_grow + t_target + t_tprobs + t_accept + t_compact + t_redraft
    log(f"sum of phases: {acc * 1e3:.3f} ms vs full {t_full * 1e3:.3f} ms")
    log(f"non-target overhead: {(t_full - t_target) * 1e3:.3f} ms "
        f"({(t_full - t_target) / t_full * 100:.0f}% of iteration)")


if __name__ == "__main__":
    main()
