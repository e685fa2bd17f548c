#!/usr/bin/env python
"""Dump the optimized HLO of the composed batched iteration (and its while
loop) at B=32 and count full-cache-sized materializations: copy/fusion ops
producing the [B, L, M, Hkv, *] cache shapes. Definitive evidence for where
the 75 ms vs ~32 ms phase-sum gap comes from.
"""

import os
import re
import sys
from collections import Counter

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
    from sequoia_tpu.core.init import random_params
    from sequoia_tpu.quant.quantize import random_quantized_model

    log(f"devices: {jax.devices()}")
    B = 32
    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    # Abstract params are enough for AOT lowering; but engine needs real
    # arrays for prefill. Use jax.eval_shape-style: build tiny real params?
    # The engine's _iterate_impl only needs param STRUCTURE at lower time —
    # use ShapeDtypeStructs via tree map over real init on CPU meta... The
    # simplest robust path: real quantized params (7 GB HBM is fine).
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)

    p = default_acceptance_vector()
    gm, _ = plan(p, [1, 2, 4, 8], [0.0441, 0.0441, 0.0465, 0.0567], 0.00062,
                 max_depth=14)
    eng = BatchedSpecEngine(dparams, dcfg, tparams, tcfg, gm,
                            algorithm="sequoia", max_length=256,
                            temperature=0.6, top_p=0.9, prefill_chunk=128,
                            batch_size=B, kv_quant="int8")

    # Abstract state (no prefill execution needed for lowering). Batch axis
    # follows eng.state_axes (cache leaves on axis 1).
    state_struct = jax.eval_shape(
        lambda: eng._fresh_state(jax.random.PRNGKey(0), jnp.bfloat16))
    bstruct = jax.tree.map(
        lambda ax, s: jax.ShapeDtypeStruct(
            s.shape[:ax] + (B,) + s.shape[ax:], s.dtype),
        eng.state_axes, state_struct)

    vit = jax.vmap(eng._iterate_impl, in_axes=(None, None, eng.state_axes),
                   out_axes=(eng.state_axes, 0))

    def one_iter(dp, tp, st):
        s2, _ = vit(dp, tp, st)
        return s2

    R = 10

    def floop(dp, tp, st):
        def body(i, s):
            s2, _ = vit(dp, tp, s)
            return s2._replace(gtl=st.gtl, terminal=st.terminal)
        return jax.lax.fori_loop(0, R, body, st)

    cache_bytes = {
        "s8[32,32,256,32,128]": 268.4e6 * 32 / 32,  # just tag; sizes below
    }

    big_shape_re = re.compile(r"(s8|bf16|f32)\[([0-9,]+)\]")

    def nbytes(dt, dims):
        n = 1
        for d in dims.split(","):
            n *= int(d)
        return n * {"s8": 1, "bf16": 2, "f32": 4}[dt]

    for name, fn, donate in (("one_iter", one_iter, (2,)),
                             (f"floop_R{R}", floop, (2,))):
        jitted = jax.jit(fn, donate_argnums=donate)
        lowered = jitted.lower(dparams, tparams, bstruct)
        comp = lowered.compile()
        txt = comp.as_text()
        path = f"/tmp/hlo_{name}.txt"
        with open(path, "w") as f:
            f.write(txt)
        # Count ops materializing >= 100 MB outputs, bucketed by op kind and
        # source location (metadata source_line).
        big = Counter()
        total_gb = 0.0
        for line in txt.splitlines():
            line = line.strip()
            m = re.match(r"%?([\w.-]+)\s*=\s*(s8|bf16|f32)\[([0-9,]+)\]", line)
            if not m:
                continue
            nm, dt, dims = m.groups()
            sz = nbytes(dt, dims)
            if sz < 100e6:
                continue
            op = line.split("=", 1)[1].strip()
            kind = re.match(r"\s*(?:s8|bf16|f32)\[[0-9,]+\]\{[^}]*\}\s*([\w-]+)", op)
            kindname = kind.group(1) if kind else op.split("(")[0][:30]
            src = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', line)
            loc = f"{os.path.basename(src.group(1))}:{src.group(2)}" if src else "-"
            opn = re.search(r'op_name="([^"]+)"', line)
            opname = (opn.group(1)[-45:]) if opn else "-"
            big[(kindname, dt, dims, loc, opname)] += 1
            total_gb += sz / 1e9
        log(f"--- {name}: HLO {len(txt)/1e6:.1f} MB -> {path}")
        log(f"    ops with >=100MB outputs (sum {total_gb:.1f} GB):")
        for (kindname, dt, dims, loc, opname), cnt in sorted(
                big.items(), key=lambda x: -x[1] * nbytes(x[0][1], x[0][2])):
            log(f"    {cnt:3d}x {kindname:16s} {dt}[{dims}] "
                f"({nbytes(dt, dims)/1e9:.2f} GB) {loc} {opname}")


if __name__ == "__main__":
    main()
