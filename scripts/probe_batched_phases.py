#!/usr/bin/env python
"""Phase breakdown of the BATCHED fused iteration at B=8 (v5e).

At B=8 with the batch-aware size-16 tree, the full iteration measures
~37 ms while the batched target forward alone is ~21 ms — this probe vmaps
each phase (grow / target / finalize) separately and times them in
on-device loops to locate the ~16 ms of non-target overhead.

Each phase loop feeds the REAL phase inputs captured from one genuine
iteration, then re-runs just that phase R times with a carried perturbation
so XLA cannot hoist it.
"""

import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.engine.batched import BatchedSpecEngine
    from sequoia_tpu.planner.dp import plan
    from sequoia_tpu.planner.profile import default_acceptance_vector
    from sequoia_tpu.quant.quantize import random_quantized_model
    from sequoia_tpu.core.init import random_params

    log(f"devices: {jax.devices()}")
    B, R = 8, 30
    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    t0 = time.perf_counter()
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tparams.embed, dparams.embed))
    log(f"init {time.perf_counter()-t0:.0f}s")

    # same batch-aware tree shape the bench planned (size 16)
    p = default_acceptance_vector()
    gm, _ = plan(p, [1, 2, 4, 8, 16], [0.0218, 0.0194, 0.0196, 0.0194, 0.0206],
                 0.0001, max_depth=14)
    log(f"tree size={gm.size} depth={int(gm.depth.max())}")

    eng = BatchedSpecEngine(dparams, dcfg, tparams, tcfg, gm,
                            algorithm="sequoia", max_length=256,
                            temperature=0.6, top_p=0.9, prefill_chunk=128,
                            batch_size=B)
    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=128)
    bstate = eng.prefill_batch([prompt] * B)

    vgrow = jax.vmap(eng._grow_impl, in_axes=(None, 0))
    vtarget = jax.vmap(eng._target_impl, in_axes=(None, 0, 0))
    vfin = jax.vmap(eng._finalize_impl,
                    in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0))
    vit = jax.vmap(eng._iterate_impl, in_axes=(None, None, 0))

    # capture real phase inputs once
    g = jax.jit(vgrow)(dparams, bstate)
    tokens_tree, draft_logits, tokens_buf, draft_kv, key = g
    tl, tkv = jax.jit(vtarget)(tparams, bstate, tokens_tree)
    jax.block_until_ready((tokens_tree, tl.astype(jnp.float32)))

    def timed(name, f, *args):
        # f(i, *args) must make the body depend on i, else XLA hoists the
        # loop-invariant computation out of the fori_loop entirely.
        @jax.jit
        def loop(*args):
            def body(i, acc):
                out = f(i, *args)
                leaf = jax.tree.leaves(out)[0]
                return acc + leaf.reshape(-1)[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, R, body, jnp.float32(0))
        float(loop(*args))
        t0 = time.perf_counter()
        float(loop(*args))
        dt = (time.perf_counter() - t0) / R
        log(f"{name:9s}: {dt*1e3:7.3f} ms")
        return dt

    def perturb_state(s, i):
        return s._replace(tokens=s.tokens + (i % 2))

    t_full = timed("full",
                   lambda i, dp, tp, s: vit(dp, tp, perturb_state(s, i))[0].tokens,
                   dparams, tparams, bstate)
    t_grow = timed("grow",
                   lambda i, dp, s: vgrow(dp, perturb_state(s, i))[0],
                   dparams, bstate)
    t_tgt = timed("target",
                  lambda i, tp, s, tt: vtarget(tp, s, tt + (i % 2))[0],
                  tparams, bstate, tokens_tree)
    t_fin = timed("finalize",
                  lambda i, dp, s, a, b, c, d, e, f2, g2:
                  vfin(dp, s, a, b + (i % 2), c, d, e,
                       f2 + (i % 2), g2)[0].tokens,
                  dparams, bstate, tokens_tree, draft_logits, tokens_buf,
                  draft_kv, key, tl, tkv)
    log(f"sum of phases: {(t_grow+t_tgt+t_fin)*1e3:.2f} ms vs full {t_full*1e3:.2f}")


if __name__ == "__main__":
    main()
