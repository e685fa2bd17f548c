#!/usr/bin/env python
"""Host-stepped batched iteration timing at B=32 (donated state, one dispatch
per iteration — eng._biterate). Complements probe_serve_b32: if host-stepped
is ~sum-of-phases + tunnel RTT while the device while_loop is 75 ms, the
blowup lives in the loop composition; if host-stepped is also ~75 ms, the
single composed iteration program is slow.
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
    jax.block_until_ready((tparams.embed, dparams.embed))

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

    # measure tunnel RTT with a trivial donated dispatch
    import jax.numpy as jnp
    triv = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    float(triv(x)[0])
    t0 = time.perf_counter()
    for _ in range(10):
        float(triv(x)[0])
    rtt = (time.perf_counter() - t0) / 10
    log(f"trivial dispatch round-trip: {rtt*1e3:.1f} ms")

    # warmup/compile
    bstate, stats = eng._biterate(eng.draft_params, eng.target_params, bstate)
    jax.block_until_ready(stats.emitted)

    N = 20
    t0 = time.perf_counter()
    for _ in range(N):
        bstate, stats = eng._biterate(eng.draft_params, eng.target_params, bstate)
        jax.block_until_ready(stats.emitted)
        # keep gtl in range: reset occasionally via fresh emitted clamp
    dt = (time.perf_counter() - t0) / N
    log(f"host-stepped iteration: {dt*1e3:.2f} ms (incl. ~{rtt*1e3:.0f} ms RTT)"
        f" -> ~{(dt-rtt)*1e3:.2f} ms device time")


if __name__ == "__main__":
    main()
