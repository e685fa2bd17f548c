#!/usr/bin/env bash
# SpecInfer fixed k x d tree-shape comparison — the analog of the
# reference's tests/run.sh sweep over 8x8, 16x4, ... shaped trees.
set -euo pipefail
cd "$(dirname "$0")/.."

LOG=${LOG:-results_specinfer.jsonl}

python -m sequoia_tpu.cli.sweep \
  --pairs llama-68m:llama-2-7b \
  --algorithms specinfer \
  --growmaps tree:1x8,tree:2x4,tree:2x8,tree:3x4,tree:4x2,tree:8x1 \
  --modes spec \
  --M 256 --gen 128 --log "$LOG" "$@"
