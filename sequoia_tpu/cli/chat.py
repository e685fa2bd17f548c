"""Interactive / MT-Bench chat runner — the analog of the reference's
`tests/run_sequoia.py` (stochastic), `tests/greedy_run.py` (greedy,
Llama-3-aware), and `tests/specinfer_run.py`, unified behind `--algorithm`.

Differences from the reference, by design (SURVEY.md §2.4):
- A big target is preferably served by weight-only quantization
  (`--quant int8|int4`) + TP sharding (`--tp`); when it exceeds even that,
  `--offloading --staylayer N` streams layer weights from TPU-host memory
  (`engine/offload.py`, the reference `Engine/offload_engine.py` rebuilt on
  XLA memory spaces) — and composes with `--quant` to cut the DMA bytes.
- Prompt template, MT-Bench loading, seed, and stop-token handling match the
  reference (`tests/run_sequoia.py:82,284-297`; Llama-3 EOS override
  `tests/greedy_run.py:129` becomes `--stop-tokens`).

Runs offline with `--tokenizer none` (token-id streaming) or with a local HF
tokenizer directory.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _load_tokenizer(spec: str):
    if spec == "none":
        return None
    if spec == "byte":
        from ..data.tokenizer import ByteTokenizer

        return ByteTokenizer()
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(spec, use_fast=True)


def _decode_stream(tokenizer, toks: np.ndarray, so_far: list) -> str:
    """Incremental detokenization: decode the full sequence and emit the
    suffix (robust to multi-token unicode, same effect as the reference's
    re-decode-per-iteration at tests/run_sequoia.py:140-145)."""
    so_far.extend(int(t) for t in toks)
    return tokenizer.decode(so_far, skip_special_tokens=True)


def run_prompts(engine, prompts_tokens, args, tokenizer) -> dict:
    total_tokens = 0
    total_steps = 0
    t_total = 0.0
    ttfc_total = 0.0        # time-to-first-chunk (prefill + first dispatch)
    steady_s = 0.0          # wall-clock after the first chunk
    steady_tokens = 0
    detok_s = 0.0
    for i, prompt in enumerate(prompts_tokens):
        if len(prompt) + engine.tree_size + 1 > args.M:
            print(f"[prompt {i} too long ({len(prompt)}), skipped]")
            continue
        print(f"\n=== prompt {i} ({len(prompt)} tokens) ===")
        acc: list = []
        shown = 0
        t0 = time.perf_counter()
        chunk = getattr(args, "stream_chunk", 1)
        if chunk > 1 and hasattr(engine, "stream_fast"):
            # Device-resident chunks: one tunnel round-trip per ~chunk
            # tokens instead of per iteration (CHAT_r02 measured the
            # per-iteration sync at ~28 ms — more than the iteration).
            stream = engine.stream_fast(
                prompt, max_new_tokens=args.gen, chunk_tokens=chunk,
                seed=args.seed + i)
        else:
            stream = engine.stream(
                prompt, max_new_tokens=args.gen, seed=args.seed + i)
        t_first = None
        first_tokens = 0
        for new in stream:
            if t_first is None:
                t_first = time.perf_counter() - t0
                first_tokens = len(new)
            if tokenizer is not None:
                td = time.perf_counter()
                text = _decode_stream(tokenizer, new, acc)
                sys.stdout.write(text[shown:])
                shown = len(text)
                detok_s += time.perf_counter() - td
            else:
                sys.stdout.write(" " + " ".join(str(int(t)) for t in new))
            sys.stdout.flush()
        dt = time.perf_counter() - t0
        t_total += dt
        print()
        if t_first is not None:
            ttfc_total += t_first
            steady_s += dt - t_first
            steady_tokens += engine.num_decoding_steps - first_tokens
            print(f"[prompt {i}: first chunk {t_first * 1e3:.0f} ms "
                  f"(prefill {len(prompt)} tok + dispatch), then "
                  f"{(dt - t_first) * 1e3 / max(engine.num_decoding_steps - first_tokens, 1):.1f}"
                  f" ms/token steady]")
        total_tokens += engine.num_decoding_steps
        total_steps += engine.num_large_model_steps
    return {
        "total_time_s": t_total,
        "tokens": total_tokens,
        "large_model_steps": total_steps,
        "ttfc_s": ttfc_total,
        "steady_s": steady_s,
        "steady_tokens": steady_tokens,
        "detok_s": detok_s,
    }


class _BaselineStream:
    """Adapts ARBaseline to the streaming interface `run_prompts` expects
    (one 'step' per token; accepted/step is 1 by definition)."""

    tree_size = 1

    def __init__(self, ar) -> None:
        self.ar = ar
        self.num_decoding_steps = 0
        self.num_large_model_steps = 0

    def stream(self, prompt, max_new_tokens, seed):
        self.num_decoding_steps = 0
        for tok in self.ar.stream(prompt, max_new_tokens=max_new_tokens, seed=seed):
            self.num_decoding_steps += 1
            self.num_large_model_steps = self.num_decoding_steps
            yield tok


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--draft", default="llama-68m", help="preset or HF checkpoint dir")
    ap.add_argument("--target", default="llama-2-7b")
    ap.add_argument("--tokenizer", default="none",
                    help="'none' (token-id streaming), 'byte' (offline "
                         "byte-level codec, runs MT-Bench with no network), "
                         "or a local HF tokenizer dir")
    ap.add_argument("--growmap", default="planned", help="path | chain:N | tree:DxB | planned")
    ap.add_argument("--algorithm", default="sequoia",
                    choices=["sequoia", "specinfer", "greedy", "greedys"])
    ap.add_argument("--mode", default="spec", choices=["spec", "baseline"])
    ap.add_argument("--quant", default="none", choices=["none", "int8", "int4"],
                    help="target weight-only quantization (offload-path replacement)")
    ap.add_argument("--offloading", action="store_true",
                    help="stream target layer weights from host memory "
                         "(engine/offload.py, the reference offload_engine "
                         "rebuild); composes with --quant")
    ap.add_argument("--staylayer", type=int, default=0,
                    help="offloading: layers kept HBM-resident "
                         "(tests/run_sequoia.py:247 --staylayer)")
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel degree")
    ap.add_argument("--T", type=float, default=0.6)
    ap.add_argument("--P", type=float, default=0.9)
    ap.add_argument("--M", type=int, default=1024, help="max buffer length")
    ap.add_argument("--gen", type=int, default=256)
    ap.add_argument("--stream-chunk", type=int, default=16,
                    help="tokens per streamed chunk (device-resident loop "
                         "between yields; 1 = sync every iteration)")
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--stop-tokens", default=None,
                    help="comma-separated EOS ids (Llama-3: 128009,128001)")
    ap.add_argument("--data-root", default="tests/dataset",
                    help="directory holding mt_bench.jsonl (auto-download if net)")
    ap.add_argument("--prompts", default=None,
                    help="override: synthetic:N,LEN | token-id JSON file | text file (one prompt/line)")
    ap.add_argument("--limit", type=int, default=None, help="max prompts")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the pre-loop warmup generation. By default a "
                         "1-chunk synthetic generation runs BEFORE the first "
                         "prompt so the one-time program compile / "
                         "executable-cache load (measured 9-19 s at 7B, "
                         "CHAT_r04) lands outside the serving path — the "
                         "prompt loop then starts with every program "
                         "device-resident, like a warmed server")
    args = ap.parse_args(argv)

    import dataclasses

    from ..data.datasets import ensure_mt_bench, format_inst, load_mt_bench_prompts
    from ..engine.baseline import ARBaseline
    from ..engine.engine import SpecEngine
    from ..utils import enable_compile_cache
    from .testbed import build_params, load_growmap, load_prompts

    enable_compile_cache()

    tokenizer = _load_tokenizer(args.tokenizer)
    target_params, target_cfg = build_params(
        args.target, "auto", args.dtype, args.seed,
        quant_bits=None if args.quant == "none" else int(args.quant[3:]),
    )
    if args.stop_tokens:
        stops = tuple(int(t) for t in args.stop_tokens.split(","))
        target_cfg = dataclasses.replace(target_cfg, stop_tokens=stops)
    if args.offloading:
        assert args.tp == 1, "offloading is the single-chip path; use TP instead"
        from ..engine.offload import offload_params

        target_params = offload_params(target_params, stay_layers=args.staylayer)

    mesh = None
    if args.tp > 1:
        from ..parallel.sharding import make_mesh, shard_params

        mesh = make_mesh(tp=args.tp)
        target_params = shard_params(target_params, mesh)

    # --- Prompts ----------------------------------------------------------
    if args.prompts is not None:
        if args.prompts.startswith("synthetic:") or args.prompts.endswith(".json"):
            prompts_tokens = load_prompts(args.prompts, target_cfg.vocab_size, args.seed)
        else:
            with open(args.prompts) as f:
                texts = [l.rstrip("\n") for l in f if l.strip()]
            assert tokenizer is not None, "text prompts need --tokenizer"
            prompts_tokens = [
                np.asarray(tokenizer(format_inst(t))["input_ids"], np.int32)
                for t in texts
            ]
    else:
        path = ensure_mt_bench(args.data_root)
        texts = load_mt_bench_prompts(path)
        assert tokenizer is not None, "MT-Bench prompts need --tokenizer (or pass --prompts)"
        prompts_tokens = [
            np.asarray(tokenizer(format_inst(t))["input_ids"], np.int32)
            for t in texts
        ]
    if args.limit:
        prompts_tokens = prompts_tokens[: args.limit]

    # --- Engine -----------------------------------------------------------
    if args.mode == "baseline":
        engine = _BaselineStream(ARBaseline(
            target_params, target_cfg, max_length=args.M, temperature=args.T,
            top_p=args.P, greedy=(args.algorithm == "greedy"),
        ))
    else:
        draft_params, draft_cfg = build_params(
            args.draft, "auto", args.dtype, args.seed + 1
        )
        gm = load_growmap(args.growmap)
        engine = SpecEngine(
            draft_params, draft_cfg, target_params, target_cfg, gm,
            algorithm=args.algorithm, max_length=args.M,
            temperature=args.T, top_p=args.P, mesh=mesh,
        )

    if not args.no_warmup:
        # One synthetic chunk through the same entry points the prompt loop
        # uses (prefill + chunked device loop / per-iteration stream): loads
        # or compiles every program once, outside the measured loop.
        # Always >=1 token even for tiny --M (advisor r4: M<4 made an empty
        # prefill); baseline mode has only prefill+decode to warm, so one
        # token suffices there.
        t0 = time.perf_counter()
        warm_prompt = np.arange(
            7, 7 + max(1, min(args.M // 4, 64)), dtype=np.int32) \
            % target_cfg.vocab_size
        chunk = 1 if args.mode == "baseline" else args.stream_chunk
        if chunk > 1 and hasattr(engine, "stream_fast"):
            warm = engine.stream_fast(warm_prompt, max_new_tokens=chunk,
                                      chunk_tokens=chunk, seed=args.seed)
        else:
            warm = engine.stream(warm_prompt, max_new_tokens=1, seed=args.seed)
        for _ in warm:
            break
        print(f"[warmup: {time.perf_counter() - t0:.1f}s "
              f"(compile / executable-cache load)]")

    stats = run_prompts(engine, prompts_tokens, args, tokenizer)
    print(f"\ntotal time: {stats['total_time_s']:.3f}s")
    if stats["tokens"]:
        print(f"tokens generated: {stats['tokens']}")
        print(f"per-token latency: {stats['total_time_s'] / stats['tokens'] * 1e3:.2f} ms")
    if stats["large_model_steps"]:
        print(f"accepted tokens per target step: "
              f"{stats['tokens'] / stats['large_model_steps']:.3f}")
    if stats.get("steady_tokens"):
        # Gap attribution (CHAT_r03 follow-up): the warm wall-clock splits
        # into per-prompt time-to-first-chunk (prefill + first device
        # dispatch) vs the steady streaming rate after it.
        print(f"time-to-first-chunk total: {stats['ttfc_s']:.3f}s "
              f"({stats['ttfc_s'] / max(len(prompts_tokens), 1) * 1e3:.0f} "
              f"ms/prompt)")
        print(f"steady-state: {stats['steady_s'] / stats['steady_tokens'] * 1e3:.2f} "
              f"ms/token over {stats['steady_tokens']} tokens "
              f"(detok {stats['detok_s'] * 1e3:.0f} ms total)")


if __name__ == "__main__":
    main()
