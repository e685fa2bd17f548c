#!/usr/bin/env python
"""Compare XLA cost-analysis (bytes accessed / FLOPs) of the composed carried
iteration loop vs the isolated phases at B=32 — a copy inserted by the loop
shows up as extra bytes without extra FLOPs. No execution needed beyond
prefill; uses AOT lower+compile.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
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
    B = 32
    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)

    p = default_acceptance_vector()
    gm, _ = plan(p, [1, 2, 4, 8], [0.0441, 0.0441, 0.0465, 0.0567], 0.00062,
                 max_depth=14)
    eng = BatchedSpecEngine(dparams, dcfg, tparams, tcfg, gm,
                            algorithm="sequoia", max_length=256,
                            temperature=0.6, top_p=0.9, prefill_chunk=128,
                            batch_size=B, kv_quant="int8")
    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=128)
    bstate = eng.prefill_batch([prompt] * B)

    vit = jax.vmap(eng._iterate_impl, in_axes=(None, None, 0))

    R = 10

    def floop(dp, tp, st):
        def body(i, s):
            s2, _ = vit(dp, tp, s)
            return s2._replace(gtl=st.gtl, terminal=st.terminal)
        return jax.lax.fori_loop(0, R, body, st)

    def one_iter(dp, tp, st):
        s2, _ = vit(dp, tp, st)
        return s2

    for name, fn in (("one_iter", one_iter), (f"floop(R={R})", floop)):
        t0 = time.perf_counter()
        comp = jax.jit(fn).lower(dparams, tparams, bstate).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        log(f"{name}: compile {time.perf_counter()-t0:.0f}s")
        for k in sorted(ca):
            if "bytes" in k.lower() or "flops" in k.lower():
                v = ca[k]
                if isinstance(v, float) and v > 1e6:
                    log(f"  {k:28s}: {v/1e9:10.3f} G")
    log("done")


if __name__ == "__main__":
    main()
