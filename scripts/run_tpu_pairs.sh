#!/usr/bin/env bash
# Paper-reproduction sweep on TPU — the analog of the reference's
# tests/run_A100.sh / tests/run_L40.sh matrices: draft/target pairs x
# verification mode. Uses random weights (latency-faithful) unless the
# presets are replaced by local HF checkpoint dirs.
set -euo pipefail
cd "$(dirname "$0")/.."

LOG=${LOG:-results_tpu.jsonl}

python -m sequoia_tpu.cli.sweep \
  --pairs llama-68m:llama-2-7b,llama-68m:llama-2-13b,llama-160m:llama-2-13b,sheared-llama-1.3b:vicuna-33b \
  --algorithms sequoia,greedy \
  --growmaps planned \
  --modes spec,baseline \
  --M 256 --gen 128 --log "$LOG" "$@"
