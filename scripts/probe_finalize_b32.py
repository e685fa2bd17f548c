#!/usr/bin/env python
"""Sub-phase timing of the BATCHED finalize at B=32 (v5e).

bench.py at B=32 with the batch-aware size-4 tree measured:
  full 75.7 ms | grow ~2 ms | target 28.3 ms  ->  ~45 ms unattributed.
The vmapped-DUS microbench (probe_vmap_dus.py) cleared compaction itself
(~1.4 ms). This probe times each finalize ingredient in isolation, plus the
full finalize, plus the carried-full-iteration loop, to find the residue.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--kv-quant", default="int8")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.engine.batched import BatchedSpecEngine
    from sequoia_tpu.planner.dp import plan
    from sequoia_tpu.planner.profile import default_acceptance_vector
    from sequoia_tpu.quant.quantize import random_quantized_model
    from sequoia_tpu.ops.sampling import target_probs, sample_categorical_probs
    from sequoia_tpu.trees.accept import resolve_path, stochastic_accept

    log(f"devices: {jax.devices()}")
    B, R = args.batch, args.reps
    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    t0 = time.perf_counter()
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tparams.embed, dparams.embed))
    log(f"init {time.perf_counter()-t0:.0f}s")

    # The B=32 batch-aware tree the bench picked (size 4 chain-ish).
    p = default_acceptance_vector()
    gm, _ = plan(p, [1, 2, 4, 8], [0.0441, 0.0441, 0.0465, 0.0567], 0.00062,
                 max_depth=14)
    log(f"tree size={gm.size} depth={int(gm.depth.max())}")

    eng = BatchedSpecEngine(dparams, dcfg, tparams, tcfg, gm,
                            algorithm="sequoia", max_length=256,
                            temperature=0.6, top_p=0.9, prefill_chunk=128,
                            batch_size=B, kv_quant=args.kv_quant)
    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=128)
    bstate = eng.prefill_batch([prompt] * B)

    from sequoia_tpu.kvcache.cache import KVCache as _KVc

    sax = eng.state_axes  # cache leaves batch on axis 1
    scr_ax = _KVc(k=1, v=1)  # grow/target scratches are plain float caches
    vgrow = jax.vmap(eng._grow_impl, in_axes=(None, sax),
                     out_axes=(0, 0, 0, scr_ax, 0))
    vtarget = jax.vmap(eng._target_impl, in_axes=(None, sax, 0),
                       out_axes=(0, scr_ax))
    vfin = jax.vmap(eng._finalize_impl,
                    in_axes=(None, sax, 0, 0, 0, scr_ax, 0, 0, scr_ax),
                    out_axes=(sax, 0))
    vit = jax.vmap(eng._iterate_impl, in_axes=(None, None, sax),
                   out_axes=(sax, 0))

    def timed(name, f, *fargs):
        @jax.jit
        def loop(*a):
            def body(i, acc):
                out = f(i, *a)
                leaf = jax.tree.leaves(out)[0]
                return acc + leaf.reshape(-1)[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, R, body, jnp.float32(0))
        float(loop(*fargs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(*fargs))
            ts.append((time.perf_counter() - t0) / R)
        ts.sort()
        log(f"{name:26s}: {ts[1]*1e3:8.3f} ms")
        return ts[1]

    pert = lambda s, i: s._replace(tokens=s.tokens + (i % 2))

    # --- full iteration, carried state (bench timed_full pattern) ---------
    @jax.jit
    def floop(n, dp, tp, st):
        def body(i, s):
            s2, _ = vit(dp, tp, s)
            return s2._replace(gtl=st.gtl, terminal=st.terminal)
        return jax.lax.fori_loop(0, n, body, st)
    float(floop(jnp.asarray(2, jnp.int32), dparams, tparams, bstate)
          .tokens.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    float(floop(jnp.asarray(R, jnp.int32), dparams, tparams, bstate)
          .tokens.astype(jnp.float32).sum())
    log(f"{'full (carried)':26s}: {(time.perf_counter()-t0)/R*1e3:8.3f} ms")

    # Capture phase inputs AFTER the big carried loop so we never hold the
    # loop temporaries and a second target KV at the same time (OOM at B=32
    # int8: params 7 GB + 2 x 2.1 GB caches + loop temps).
    g = jax.jit(vgrow)(dparams, bstate)
    tokens_tree, draft_logits, tokens_buf, draft_kv, key = g
    tl, tkv = jax.jit(vtarget)(tparams, bstate, tokens_tree)
    jax.block_until_ready((tokens_tree, tl.astype(jnp.float32)))

    # --- phases in isolation ----------------------------------------------
    timed("grow", lambda i, dp, s: vgrow(dp, pert(s, i))[0], dparams, bstate)
    timed("target", lambda i, tp, s, tt: vtarget(tp, s, tt + (i % 2))[0],
          tparams, bstate, tokens_tree)
    timed("finalize (all)",
          lambda i, dp, s, a, b, c, d, e, f2, g2:
          vfin(dp, s, a + (i % 2), b, c, d, e, f2 + (i % 2), g2)[0].tokens,
          dparams, bstate, tokens_tree, draft_logits, tokens_buf,
          draft_kv, key, tl, tkv)

    # --- finalize ingredients ---------------------------------------------
    vtp = jax.vmap(lambda lg: target_probs(lg, 0.9, 0.6))
    timed("  target_probs", lambda i, lg: vtp(lg + (i % 2)), tl)

    pdist = jax.jit(vtp)(tl)
    rr = jax.random.uniform(jax.random.PRNGKey(3), (B, gm.size), jnp.float32)
    succ = eng._succ_np

    def acc_one(pp, dl, tt, r):
        return stochastic_accept(pp, dl, tt, r, succ, 0.6, True, True)
    vacc = jax.vmap(acc_one)
    timed("  stochastic_accept",
          lambda i, pp, dl, tt, r: vacc(pp + (i % 2) * 1e-9, dl, tt, r).p_final,
          pdist, draft_logits, tokens_tree, rr)

    accres = jax.jit(vacc)(pdist, draft_logits, tokens_tree, rr)
    vrp = jax.vmap(lambda ac, tt: resolve_path(ac, tt, eng.stop_tokens,
                                               max(eng.max_depth, 1)))
    timed("  resolve_path",
          lambda i, ac, tt: vrp(jnp.where(i % 2 == 0, ac, ac), tt).path,
          accres.accepted_child, tokens_tree)

    path = jax.jit(vrp)(accres.accepted_child, tokens_tree)
    md = max(eng.max_depth, 1)
    slots = (bstate.gtl - 1)[:, None] + jnp.where(path.path >= 0, path.path, 0)

    # commit: scratch rows -> main caches (split-cache design)
    path_c = jnp.where(path.path >= 0, path.path, 0)
    tslots = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), path_c], axis=1)
    from sequoia_tpu.kvcache.cache import KVCache8 as _KV8c
    main_t_ax = eng.state_axes.target_kv
    main_d_ax = eng.state_axes.draft_kv
    vcommit_t = jax.vmap(lambda kv, scr, s, o: kv.commit_rows(scr, s, o),
                         in_axes=(main_t_ax, scr_ax, 0, 0),
                         out_axes=main_t_ax)
    vcommit_d = jax.vmap(lambda kv, scr, s, o: kv.commit_rows(scr, s, o),
                         in_axes=(main_d_ax, scr_ax, 0, 0),
                         out_axes=main_d_ax)
    timed("  commit target kv",
          lambda i, kv, scr, s, o: vcommit_t(kv, scr, s + (i & 0), o).k,
          bstate.target_kv, tkv, tslots, bstate.gtl - 1)
    timed("  commit draft kv",
          lambda i, kv, scr, s, o: vcommit_d(kv, scr, s + (i & 0), o).k,
          bstate.draft_kv, draft_kv, path_c, bstate.gtl)

    # bonus re-draft: vmapped width-1 draft forward
    from sequoia_tpu.core.model import forward as _fwd

    def redraft(dp, tb, kv, nts):
        root_token = jax.lax.dynamic_index_in_dim(tb, nts, keepdims=False)
        pos = nts[None].astype(jnp.int32)
        k_idx = jnp.arange(eng.max_length, dtype=jnp.int32)[None, :]
        mask = k_idx <= nts
        lg, kv = _fwd(dp, dcfg, root_token[None], pos, kv, nts, mask)
        return lg
    vrd = jax.vmap(redraft, in_axes=(None, 0, main_d_ax, 0))
    timed("  bonus re-draft",
          lambda i, dp, tb, kv, nts: vrd(dp, tb + (i % 2), kv, nts),
          dparams, tokens_buf, bstate.draft_kv, bstate.gtl)

    # sampling the bonus
    vsample = jax.vmap(lambda k, pr: sample_categorical_probs(k, pr[0]))
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    timed("  bonus sample",
          lambda i, ks, pr: vsample(ks, pr + (i % 2) * 1e-9), keys, pdist)


if __name__ == "__main__":
    main()
