"""Benchmark / evaluation CLI — the analog of the reference's
`tests/testbed.py` (stochastic), `tests/testbed_greedy.py`,
`tests/test_specinfer.py`, and `tests/test_greedyS.py`, unified: the four
verification algorithms are one `--algorithm` flag on a single engine.

Prints the reference's metrics (tests/testbed.py:94,215): total time,
per-token latency, decoding steps, large-model steps, accepted/step.

Weights: `--weights random` (default; latency-faithful) or a path to a HF
checkpoint directory (`pytorch_model.bin` / safetensors state dict) when
available. Prompts: `--prompts synthetic:N,LEN` or a JSON file with token
id lists.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_params(name_or_path: str, weights: str, dtype_str: str, seed: int,
                 quant_bits=None):
    """Resolve `(params, cfg)` from a preset name or HF checkpoint dir.

    `weights`: 'random' (latency-faithful random init), 'auto' (load real
    weights when `name_or_path` is a checkpoint dir, else random), or a path
    to a checkpoint dir / torch state-dict file.

    `quant_bits` (4/8): produce an int-quantized model. Random init goes
    straight to quantized layers (`random_quantized_model`) — materializing
    a 7B bf16 tree first and quantizing after transiently needs both copies
    in HBM and OOMs a 16 GB chip."""
    import os

    import jax
    import jax.numpy as jnp

    from ..core import init as pinit
    from ..core.config import PRESETS, LlamaConfig, get_config

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_str]
    is_ckpt_dir = os.path.isdir(name_or_path) and os.path.exists(
        os.path.join(name_or_path, "config.json")
    )
    if name_or_path in PRESETS:
        cfg = get_config(name_or_path)
    else:
        assert is_ckpt_dir, f"{name_or_path!r} is neither a preset nor a checkpoint dir"
        cfg = LlamaConfig.from_json(f"{name_or_path}/config.json")
    if weights == "random" or (weights == "auto" and not is_ckpt_dir):
        if quant_bits is not None:
            from ..quant.quantize import random_quantized_model

            return (
                random_quantized_model(cfg, jax.random.PRNGKey(seed),
                                       bits=quant_bits),
                cfg,
            )
        params = pinit.random_params(cfg, jax.random.PRNGKey(seed), dtype=dtype)
    elif weights == "auto":
        params, cfg = pinit.load_hf_checkpoint(name_or_path, dtype=dtype)
    elif os.path.isdir(weights):
        params, cfg = pinit.load_hf_checkpoint(weights, dtype=dtype)
    else:
        import torch

        sd = torch.load(weights, map_location="cpu", weights_only=False)
        params = pinit.params_from_hf_state_dict(cfg, sd, dtype=dtype)
    if quant_bits is not None:
        from ..quant.quantize import quantize_model

        params = quantize_model(params, bits=quant_bits)
    return params, cfg


def load_prompts(spec: str, vocab: int, seed: int, prefill_len: int = 0):
    """`synthetic:N,LEN` | `jsonl:<path>` / `arrow:<path>` (data layer,
    pre-tokenized) | a JSON file of token-id lists. `prefill_len` > 0 pads or
    truncates every prompt to exactly that length (the reference greedy
    testbed's `--S` long-prefill knob, `tests/testbed_greedy.py:240-245`)."""
    if spec.startswith("synthetic:"):
        n, ln = (int(x) for x in spec.split(":")[1].split(","))
        rng = np.random.default_rng(seed)
        prompts = [rng.integers(10, vocab, size=ln) for _ in range(n)]
    elif spec.startswith(("jsonl:", "arrow:")):
        from ..data.datasets import load_dataset_by_name

        ds = load_dataset_by_name(spec, seq_len=max(prefill_len, 256))
        prompts = [np.minimum(p, vocab - 1) for p in ds]
    else:
        with open(spec) as f:
            prompts = [np.asarray(p, np.int32) for p in json.load(f)]
    if prefill_len > 0:
        from ..data.datasets import TokenDataset

        ds = TokenDataset.from_sequences(prompts, seq_len=prefill_len)
        prompts = [ds.ids[i] for i in range(len(ds))]  # exact-length rows
    return prompts


def load_growmap(spec: str):
    from ..trees.growmap import GrowMap, chain, uniform_tree

    if spec.startswith("chain:"):
        return chain(int(spec.split(":")[1]))
    if spec.startswith("tree:"):
        d, b = (int(x) for x in spec.split(":")[1].split("x"))
        return uniform_tree(d, b)
    if spec == "planned":
        from ..planner.dp import plan
        from ..planner.profile import default_acceptance_vector

        gm, _ = plan(
            default_acceptance_vector(), [1, 2, 4, 8, 16, 32, 64],
            [1.0, 1.0, 1.01, 1.02, 1.05, 1.1, 1.2], 0.05, max_depth=8,
        )
        return gm
    return GrowMap.load(spec)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--draft", default="llama-68m", help="preset name or config dir")
    ap.add_argument("--target", default="llama-2-7b")
    ap.add_argument("--draft-weights", default="random")
    ap.add_argument("--target-weights", default="random")
    ap.add_argument("--growmap", default="planned",
                    help="path | chain:N | tree:DxB | planned")
    ap.add_argument("--algorithm", default="sequoia",
                    choices=["sequoia", "specinfer", "greedy", "greedys"])
    ap.add_argument("--mode", default="spec", choices=["spec", "baseline", "benchmark"])
    ap.add_argument("--T", type=float, default=0.6)
    ap.add_argument("--P", type=float, default=0.9)
    ap.add_argument("--M", type=int, default=256, help="max buffer length")
    ap.add_argument("--gen", type=int, default=128, help="max new tokens/prompt")
    ap.add_argument("--prompts", default="synthetic:4,128",
                    help="synthetic:N,LEN | jsonl:<path> | arrow:<path> | token-id JSON")
    ap.add_argument("--S", type=int, default=0,
                    help="force prefill length (pad/truncate prompts; "
                         "long-prefill runs, testbed_greedy --S)")
    ap.add_argument("--start", type=int, default=0,
                    help="dataset window start (tests/testbed.py:27)")
    ap.add_argument("--end", type=int, default=None, help="dataset window end")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--quant", default="none", choices=["none", "int8", "int4"],
                    help="target weight quantization (random init goes "
                         "straight to quantized layers — no bf16 transient)")
    ap.add_argument("--kv-quant", default="none", choices=["none", "int8", "int4"],
                    help="int8 target KV cache with per-row scales")
    ap.add_argument("--offloading", action="store_true",
                    help="stream target layer weights from host memory "
                         "(reference testbed.py --offloading; TPU rebuild "
                         "of Engine/offload_engine.py — engine/offload.py)")
    ap.add_argument("--staylayer", type=int, default=0,
                    help="offloading: layers kept resident in HBM "
                         "(tests/run_sequoia.py --staylayer)")
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--device-loop", action="store_true", default=True)
    ap.add_argument("--trace", default="",
                    help="capture a jax.profiler trace of the measured "
                         "loop into this directory (TensorBoard / xprof "
                         "format; the reference's benchmark=True timers "
                         "give phase sums — the trace gives the full "
                         "device timeline)")
    args = ap.parse_args(argv)

    from ..engine.baseline import ARBaseline
    from ..engine.engine import SpecEngine
    from ..utils import enable_compile_cache

    enable_compile_cache()

    target_params, target_cfg = build_params(
        args.target, args.target_weights, args.dtype, args.seed,
        quant_bits=None if args.quant == "none" else int(args.quant[3:]),
    )
    if args.offloading:
        from ..engine.offload import offload_params

        target_params = offload_params(target_params, stay_layers=args.staylayer)
    prompts = load_prompts(args.prompts, target_cfg.vocab_size, args.seed,
                           prefill_len=args.S)
    prompts = prompts[args.start : args.end]

    import contextlib

    trace_stack = contextlib.ExitStack()
    trace_active = False
    if args.trace:
        import jax

        try:
            trace_stack.enter_context(jax.profiler.trace(args.trace))
            trace_active = True
        except Exception as e:  # pragma: no cover - backend-dependent
            print(f"[trace disabled: {type(e).__name__}: {e}]")

    total_tokens = 0
    total_steps = 0
    t_total = 0.0
    if args.mode == "baseline":
        ar = ARBaseline(
            target_params, target_cfg, max_length=args.M,
            temperature=args.T, top_p=args.P, greedy=(args.algorithm == "greedy"),
            kv_quant=args.kv_quant,
        )
        ar.generate_fast(prompts[0], max_new_tokens=4)  # compile
        for i, prompt in enumerate(prompts):
            t0 = time.perf_counter()
            out = ar.generate_fast(prompt, max_new_tokens=args.gen, seed=args.seed + i)
            t_total += time.perf_counter() - t0
            produced = len(out) - len(prompt)
            total_tokens += produced
            total_steps += produced
    else:
        draft_params, draft_cfg = build_params(
            args.draft, args.draft_weights, args.dtype, args.seed + 1
        )
        gm = load_growmap(args.growmap)
        eng = SpecEngine(
            draft_params, draft_cfg, target_params, target_cfg, gm,
            algorithm=args.algorithm, max_length=args.M,
            temperature=args.T, top_p=args.P, kv_quant=args.kv_quant,
        )
        phase_totals = {}
        if args.mode == "benchmark":
            # Phase-timed mode (tests/testbed.py:144-219): per-phase wall
            # clock via the separately-jitted iteration.
            eng.generate_benchmark(prompts[0], max_new_tokens=4)  # compile
            for i, prompt in enumerate(prompts):
                t0 = time.perf_counter()
                _, totals = eng.generate_benchmark(
                    prompt, max_new_tokens=args.gen, seed=args.seed + i
                )
                t_total += time.perf_counter() - t0
                for k, v in totals.items():
                    phase_totals[k] = phase_totals.get(k, 0.0) + v
                total_tokens += eng.num_decoding_steps
                total_steps += eng.num_large_model_steps
        else:
            eng.generate_fast(prompts[0], max_new_tokens=4)  # compile
            for i, prompt in enumerate(prompts):
                t0 = time.perf_counter()
                eng.generate_fast(prompt, max_new_tokens=args.gen, seed=args.seed + i)
                t_total += time.perf_counter() - t0
                total_tokens += eng.num_decoding_steps
                total_steps += eng.num_large_model_steps
        if phase_totals and total_steps:
            # Reference per-phase report (tests/testbed.py:216-218).
            print("phase breakdown (ms per target step):")
            for k, v in phase_totals.items():
                print(f"  {k}: {v / total_steps * 1e3:.2f}")

    trace_stack.close()  # flush the profiler trace before reporting
    if trace_active:
        print(f"[trace written to {args.trace}]")

    # Reference metric block (tests/testbed.py:94).
    print(f"total time: {t_total:.3f}s")
    print(f"decoding steps (tokens): {total_tokens}")
    print(f"large model steps: {total_steps}")
    if total_tokens:
        print(f"per-token latency: {t_total / total_tokens * 1e3:.2f} ms")
    if total_steps:
        print(f"accepted tokens per target step: {total_tokens / total_steps:.3f}")


if __name__ == "__main__":
    main()
