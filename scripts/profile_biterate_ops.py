#!/usr/bin/env python
"""Per-op device timing of the B=32 batched spec iteration via jax.profiler.

The composed batched loop costs ~44 ms/iteration at B=32 while its phases in
isolation (target forward + grow) sum to ~18 ms. Isolated-phase timing can't
see scheduling gaps, layout copies, or fusions that only exist in the
composed program — the device trace can. Traces N calls of `_biterate`
(the jitted vmapped fused iteration), parses the XLA-op device lane from the
Chrome trace, and prints total device-busy time and the top ops by summed
duration, normalized per iteration.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--kv-quant", default="int8")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tree", default="measured")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--loop", action="store_true",
                    help="trace the real generate_batch_fast device loop "
                         "instead of direct _biterate calls (entry copies "
                         "amortize; iters = large-model steps observed)")
    ap.add_argument("--logdir", default="/tmp/jaxtrace_biterate")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.engine.batched import BatchedSpecEngine
    from sequoia_tpu.planner.dp import expected_accepted, plan
    from sequoia_tpu.planner.profile import default_acceptance_vector
    from sequoia_tpu.quant.quantize import random_quantized_model
    from sequoia_tpu.trees.growmap import uniform_tree

    log(f"devices: {jax.devices()}")
    B = args.batch
    tcfg = get_config("llama-2-7b")
    dcfg = get_config("llama-68m")
    tparams = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
    dparams = random_quantized_model(dcfg, jax.random.PRNGKey(1), bits=8)
    jax.block_until_ready((tparams.embed, dparams.embed))

    p = default_acceptance_vector()
    if args.tree == "measured":
        gm, _ = plan(p, [1, 2, 4, 8], [0.0441, 0.0441, 0.0465, 0.0567],
                     0.00062, max_depth=14)
    else:
        d, k = map(int, args.tree.split("x"))
        gm = uniform_tree(d, k)
    log(f"tree size={gm.size} depth={int(gm.depth.max())} "
        f"E[acc]={expected_accepted(gm, p):.3f}")

    eng = BatchedSpecEngine(dparams, dcfg, tparams, tcfg, gm,
                            algorithm="sequoia", max_length=256,
                            temperature=0.6, top_p=0.9, prefill_chunk=128,
                            batch_size=B, kv_quant=args.kv_quant)
    rng = np.random.default_rng(17)
    prompt = rng.integers(10, tcfg.vocab_size, size=128)
    os.system(f"rm -rf {args.logdir}")
    if args.loop:
        prompts = [prompt] * B
        eng.generate_batch_fast(prompts, max_new_tokens=4)  # compile
        with jax.profiler.trace(args.logdir):
            eng.generate_batch_fast(prompts, max_new_tokens=args.iters * 3)
        args.iters = eng.num_large_model_steps
        log(f"device loop ran {args.iters} large-model steps")
    else:
        state = eng.prefill_batch([prompt] * B, seed=0)
        # Warmup/compile outside the trace.
        for _ in range(3):
            state, stats = eng._biterate(eng.draft_params, eng.target_params, state)
        jax.block_until_ready(stats.emitted)
        with jax.profiler.trace(args.logdir):
            for _ in range(args.iters):
                state, stats = eng._biterate(eng.draft_params, eng.target_params, state)
            jax.block_until_ready(stats.emitted)

    paths = glob.glob(f"{args.logdir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {args.logdir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # Identify device-lane pids (TPU device) and their XLA-op tids.
    pid_names = {e["pid"]: e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tid_names = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "device" in n.lower()}
    log(f"process lanes: {sorted(pid_names.values())}")

    by_name = collections.Counter()
    counts = collections.Counter()
    spans = []
    lanes_used = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        lane = tid_names.get((e["pid"], e["tid"]), "?")
        if "step" in lane.lower():
            continue  # step markers, not ops
        lanes_used[lane] += 1
        by_name[e["name"]] += e.get("dur", 0)
        counts[e["name"]] += 1
        spans.append((e["ts"], e["ts"] + e.get("dur", 0)))
    log(f"device lanes used: {dict(lanes_used)}")

    if spans:
        t0 = min(s for s, _ in spans)
        t1 = max(t for _, t in spans)
        busy = sum(t - s for s, t in spans)
        n = args.iters
        print(f"\nwall span {(t1-t0)/1e3/n:.3f} ms/iter   "
              f"device busy {busy/1e3/n:.3f} ms/iter (may double-count lanes)")
    print(f"{'ms/iter':>9}  {'count':>6}  op")
    for name, dur in by_name.most_common(args.top):
        print(f"{dur/1e3/args.iters:9.3f}  {counts[name]/args.iters:6.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
