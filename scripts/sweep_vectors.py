#!/usr/bin/env python
"""Acceptance-vector sensitivity sweep (round-4 judge item #2a).

Every committed perf number's E[accept] comes from the reference's bundled
68m->7b acceptance vector (rank-1 = 0.634) — which CAPS the implied
speedup: the 70B offload flagship measured 4.07x against the paper's
9.96x, and the open question is whether the MACHINERY or the VECTOR is
the limit. This sweep answers it: synthetic vectors with rank-1 a in
{0.7, 0.8, 0.85, 0.9} (tail geometric in the remaining mass) are pushed
through the SAME planner DP over the SAME measured latency curves
(single-chip 7B/13B and the 70B offload stream curve), reporting the
implied per-token latency and speedup ratio per vector. A paper-class
7b->70b vector (rank-1 ~0.8-0.9) on the offload curve reaching ~10x
means the machinery delivers the paper's regime given the paper's vector.

Vector construction: vec[1] = a; conditional on rejecting ranks < k, rank
k accepts with probability g of the remaining mass (g = 0.5), truncated
at 32 ranks:  vec[k] = (1 - a) * g * (1 - g)^(k-2),  k >= 2.

Curve input: --curve-json FILE with
  {"budgets": [...], "target_time_s": [...], "t_base_s": ..,
   "draft_time_s": .., "label": .., "ref_speedup": ..}
(emitted by bench.py --dump-curve / scripts/bench_70b_offload.py).
"""

import argparse
import json
import os as _os, sys
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synthetic_vector(a: float, g: float = 0.5, ranks: int = 32) -> np.ndarray:
    v = np.zeros(ranks + 1, np.float64)
    v[1] = a
    rest = 1.0 - a
    for k in range(2, ranks + 1):
        v[k] = rest * g * (1.0 - g) ** (k - 2)
    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--curve-json", action="append", required=True,
                    help="curve spec file; repeatable (one table per curve)")
    ap.add_argument("--rank1", default="0.7,0.8,0.85,0.9")
    ap.add_argument("--max-depth", type=int, default=14)
    ap.add_argument("--max-branch", type=int, default=32)
    ap.add_argument("--measure-with", default=None,
                    help="'target,draft,max_length,prefix' — additionally "
                         "MEASURE each vector's planned tree end to end on "
                         "the chip (random weights: latency real, E from "
                         "the vector) for the FIRST curve")
    ap.add_argument("--dst", default="SENSITIVITY_r04.json")
    args = ap.parse_args()

    measurer = None
    if args.measure_with:
        import importlib

        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        bench = importlib.import_module("bench")
        from sequoia_tpu.core.config import get_config
        from sequoia_tpu.engine.engine import SpecEngine
        from sequoia_tpu.quant.quantize import random_quantized_model

        tname, dname, mlen, plen = args.measure_with.split(",")
        mlen, plen = int(mlen), int(plen)
        tcfg = get_config(tname)
        dcfg = get_config(dname)
        tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
        dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
        rng = np.random.default_rng(17)
        prompt = rng.integers(10, tcfg.vocab_size, size=plen)

        def measurer(gm):
            if plen + gm.size + int(gm.depth.max()) + 2 > mlen:
                return None  # tree doesn't fit the buffer
            eng = SpecEngine(dparams, dcfg, tparams, tcfg, gm,
                             algorithm="sequoia", max_length=mlen,
                             temperature=0.6, top_p=0.9, prefill_chunk=128)
            state = eng.prefill(prompt)
            return bench._fused_iter_time(eng, state, reps=20)

    from sequoia_tpu.planner.dp import expected_accepted, plan
    from sequoia_tpu.planner.profile import default_acceptance_vector

    out = {"vector_tail_g": 0.5, "curves": []}
    for cj in args.curve_json:
        spec = json.load(open(cj))
        budgets = list(spec["budgets"])
        tt = list(spec["target_time_s"])
        t_base = float(spec["t_base_s"])
        draft_time = float(spec["draft_time_s"])
        ref = float(spec.get("ref_speedup", 0)) or None
        label = spec.get("label", cj)
        rows = []
        vecs = [("bundled-0.634", np.asarray(default_acceptance_vector()))]
        vecs += [(f"rank1-{a}", synthetic_vector(float(a)))
                 for a in args.rank1.split(",")]
        for name, vec in vecs:
            gm, info = plan(vec, budgets, tt, draft_time,
                            max_depth=args.max_depth,
                            max_branch=args.max_branch)
            e = float(expected_accepted(gm, vec))
            dec = float(info["dec_time"])
            speedup = t_base / dec
            row = {
                "vector": name,
                "rank1": round(float(vec[1]), 3),
                "tree_size": gm.size,
                "tree_depth": int(gm.depth.max()),
                "expected_accepted": round(e, 3),
                "implied_ms_per_token": round(dec * 1e3, 2),
                "implied_speedup_vs_ar": round(speedup, 3),
            }
            if ref:
                row["ratio_vs_ref_speedup"] = round(speedup / ref, 3)
            if measurer is not None and cj == args.curve_json[0]:
                t_m = measurer(gm)
                if t_m is not None:
                    row["measured_ms_per_iteration"] = round(t_m * 1e3, 2)
                    m_speed = t_base / (t_m / e)
                    row["measured_speedup_vs_ar"] = round(m_speed, 3)
                    if ref:
                        row["measured_ratio_vs_ref"] = round(m_speed / ref, 3)
            rows.append(row)
            log(f"[{label}] {name}: size={gm.size} depth={int(gm.depth.max())} "
                f"E={e:.3f} -> {dec * 1e3:.2f} ms/token, {speedup:.2f}x"
                + (f" (ratio {speedup / ref:.3f})" if ref else "")
                + (f"; MEASURED {row['measured_ms_per_iteration']} ms/iter -> "
                   f"ratio {row.get('measured_ratio_vs_ref')}"
                   if "measured_ms_per_iteration" in row else ""))
        out["curves"].append({
            "label": label,
            "t_base_s": t_base,
            "budgets": budgets,
            "target_time_s": tt,
            "draft_time_s": draft_time,
            "ref_speedup": ref,
            "rows": rows,
        })
    json.dump(out, open(args.dst, "w"), indent=1)
    log(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
