"""Benchmark sweep driver — the analog of the reference's shell sweeps
(`tests/run_L40.sh`, `tests/run_A100.sh` across draft/target x dataset x
mode; `tests/run.sh` across fixed k x d SpecInfer tree shapes;
`tests/run_wiki.sh` long-prefill `--S` sweeps), driven from one CLI instead
of copy-pasted shell lines.

Each grid point invokes the testbed main in-process and appends one JSON
line to `--log` (the `resultsv2.log` analog, but machine-readable).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import itertools
import json
import re
import sys
import time


def parse_metrics(out: str) -> dict:
    """Scrape the testbed's printed metric block."""
    m = {}
    pats = {
        "total_time_s": r"total time: ([\d.]+)s",
        "tokens": r"decoding steps \(tokens\): (\d+)",
        "large_model_steps": r"large model steps: (\d+)",
        "ms_per_token": r"per-token latency: ([\d.]+) ms",
        "accepted_per_step": r"accepted tokens per target step: ([\d.]+)",
    }
    for k, pat in pats.items():
        hit = re.search(pat, out)
        if hit:
            v = hit.group(1)
            m[k] = float(v) if "." in v else int(v)
    return m


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pairs", default="llama-68m:llama-2-7b",
                    help="comma-separated draft:target preset pairs")
    ap.add_argument("--algorithms", default="sequoia,greedy")
    ap.add_argument("--growmaps", default="planned",
                    help="comma-separated growmap specs (path|chain:N|tree:DxB|planned)")
    ap.add_argument("--prompts", default="synthetic:4,128")
    ap.add_argument("--modes", default="spec",
                    help="spec,baseline,benchmark")
    ap.add_argument("--M", type=int, default=256)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--T", type=float, default=0.6)
    ap.add_argument("--P", type=float, default=0.9)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--log", default="results.jsonl")
    args = ap.parse_args(argv)

    from .testbed import main as testbed_main

    pairs = [p.split(":") for p in args.pairs.split(",")]
    grid = list(itertools.product(
        pairs, args.algorithms.split(","), args.growmaps.split(","),
        args.modes.split(","),
    ))
    print(f"sweep: {len(grid)} grid points -> {args.log}")
    for (draft, target), algo, gm, mode in grid:
        point = dict(draft=draft, target=target, algorithm=algo,
                     growmap=gm, mode=mode)
        print(f"--- {point}")
        buf = io.StringIO()
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(buf):
                testbed_main([
                    "--draft", draft, "--target", target,
                    "--algorithm", algo, "--growmap", gm, "--mode", mode,
                    "--M", str(args.M), "--gen", str(args.gen),
                    "--T", str(args.T), "--P", str(args.P),
                    "--dtype", args.dtype, "--seed", str(args.seed),
                    "--prompts", args.prompts,
                ])
            record = {**point, **parse_metrics(buf.getvalue()),
                      "wall_s": round(time.time() - t0, 2)}
        except Exception as e:  # record failures, keep sweeping
            record = {**point, "error": f"{type(e).__name__}: {e}"}
        sys.stdout.write(buf.getvalue())
        with open(args.log, "a") as f:
            f.write(json.dumps(record) + "\n")
        print(json.dumps(record))


if __name__ == "__main__":
    main()
