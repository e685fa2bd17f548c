#!/usr/bin/env python
"""Which composition step makes the carried batched loop 2.4x the sum of its
phases? (probe_finalize_b32: grow 1.2 + target 29.5 + finalize 1.8 = 32.5 ms
in isolation vs 77 ms composed at B=32.)

Times fori_loops that carry DecodeState through progressively more of the
iteration:
  tgt-only    : state -> target fwd -> state._replace(target_kv)
  grow+tgt    : grow -> target fwd -> carry both caches
  +compact    : ... -> compact both caches at fixed slots (no accept walk)
  full        : the real _iterate_impl
Each variant pins gtl/terminal so shapes/slots stay in range.
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
    ap.add_argument("--reps", type=int, default=20)
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

    log(f"devices: {jax.devices()}")
    B, R = args.batch, args.reps
    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tparams.embed, dparams.embed))

    p = default_acceptance_vector()
    gm, _ = plan(p, [1, 2, 4, 8], [0.0441, 0.0441, 0.0465, 0.0567], 0.00062,
                 max_depth=14)
    log(f"tree size={gm.size} depth={int(gm.depth.max())}")

    eng = BatchedSpecEngine(dparams, dcfg, tparams, tcfg, gm,
                            algorithm="sequoia", max_length=256,
                            temperature=0.6, top_p=0.9, prefill_chunk=128,
                            batch_size=B, kv_quant="int8")
    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=128)
    bstate = eng.prefill_batch([prompt] * B)

    vgrow = jax.vmap(eng._grow_impl, in_axes=(None, 0))
    vtarget = jax.vmap(eng._target_impl, in_axes=(None, 0, 0))
    vit = jax.vmap(eng._iterate_impl, in_axes=(None, None, 0))

    size = gm.size
    md = max(eng.max_depth, 1)

    def timed_carry(name, body_fn):
        @jax.jit
        def loop(n, dp, tp, st):
            def body(i, s):
                s2 = body_fn(dp, tp, s, i)
                return s2._replace(gtl=st.gtl, terminal=st.terminal)
            return jax.lax.fori_loop(0, n, body, st)

        n1, n2 = jnp.asarray(5, jnp.int32), jnp.asarray(R, jnp.int32)
        float(loop(n1, dparams, tparams, bstate).tokens.astype(jnp.float32).sum())
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(n1, dparams, tparams, bstate).tokens.astype(jnp.float32).sum())
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(loop(n2, dparams, tparams, bstate).tokens.astype(jnp.float32).sum())
            tl = time.perf_counter() - t0
            samples.append((tl - ts) / (R - 5))
        samples.sort()
        log(f"{name:24s}: {samples[1]*1e3:8.3f} ms")

    def tgt_only(dp, tp, s, i):
        def one(tp, s, i):
            tt = jnp.zeros((size,), jnp.int32) + (i % 2)
            logits, tkv = eng._target_impl(tp, s, tt)
            return s._replace(target_kv=tkv,
                              tokens=s.tokens.at[0].set(logits[0, 0].astype(jnp.int32)))
        return jax.vmap(one, in_axes=(None, 0, None))(tp, s, i)

    def grow_tgt(dp, tp, s, i):
        def one(dp, tp, s):
            tok_tree, dlg, tbuf, dkv, key = eng._grow_impl(dp, s)
            logits, tkv = eng._target_impl(tp, s, tok_tree)
            return s._replace(target_kv=tkv, draft_kv=dkv, tokens=tbuf, key=key)
        return jax.vmap(one, in_axes=(None, None, 0))(dp, tp, s)

    def grow_tgt_compact(dp, tp, s, i):
        def one(dp, tp, s):
            tok_tree, dlg, tbuf, dkv, key = eng._grow_impl(dp, s)
            logits, tkv = eng._target_impl(tp, s, tok_tree)
            slots = (s.gtl - 1) + jnp.arange(md, dtype=jnp.int32) % size
            dkv = dkv.compact(slots, s.gtl)
            tkv = tkv.compact(slots, s.gtl)
            return s._replace(target_kv=tkv, draft_kv=dkv, tokens=tbuf, key=key)
        return jax.vmap(one, in_axes=(None, None, 0))(dp, tp, s)

    def full(dp, tp, s, i):
        s2, _ = vit(dp, tp, s)
        return s2

    timed_carry("tgt-only", tgt_only)
    timed_carry("grow+tgt", grow_tgt)
    timed_carry("grow+tgt+compact", grow_tgt_compact)
    timed_carry("full", full)


if __name__ == "__main__":
    main()
