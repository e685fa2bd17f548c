"""TPU latency profiling for the planner.

Replaces the reference's `Engine/offloading_profile.py` + `profile.sh` sweep
(SURVEY.md §3.3: the profile -> plan -> run closed loop that makes Sequoia
"hardware-aware"): measures the target model's tree-verify forward latency
as a function of tree budget, and the draft model's per-level step latency,
on the actual serving hardware.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LlamaConfig
from ..core.model import LlamaParams, forward
from ..kvcache.cache import KVCache
from ..ops import masks


def default_acceptance_vector() -> np.ndarray:
    """The bundled 68m->7b stochastic acceptance measurement (see JSON for
    provenance). The reference planner drops the trailing element
    (`tree_search.py:14`); we mirror that."""
    path = os.path.join(os.path.dirname(__file__), "acceptance_default.json")
    with open(path) as f:
        return np.asarray(json.load(f)["vector"], np.float64)[:-1]


def time_forward_widths(
    params: LlamaParams,
    cfg: LlamaConfig,
    widths: Sequence[int],
    *,
    max_length: int = 256,
    kv_len: int = 128,
    dtype=jnp.bfloat16,
    warmup: int = 3,
    reps: int = 20,
) -> List[float]:
    """Wall-clock seconds per forward at each query width (decode position
    `kv_len`), the planner's `target_time` curve. One compile per width
    (the analog of the reference's per-decode-length CUDA graph list)."""
    fwd = jax.jit(partial(forward, cfg=cfg), donate_argnames=("kv",))
    out = []
    kv = KVCache.init(cfg, max_length, dtype)
    for w in widths:
        tokens = jnp.zeros((w,), jnp.int32)
        pos = kv_len + jnp.arange(w, dtype=jnp.int32)
        mask = masks.causal_mask(w, max_length, kv_len)
        args = dict(tokens=tokens, position_ids=pos, cache_offset=kv_len, attn_mask=mask)
        for _ in range(warmup):
            logits, kv = fwd(params, kv=kv, **args)
        jax.block_until_ready(logits)
        t0 = time.perf_counter()
        for _ in range(reps):
            logits, kv = fwd(params, kv=kv, **args)
        jax.block_until_ready(logits)
        out.append((time.perf_counter() - t0) / reps)
    return out


def measure_latency_curve(
    draft_params: LlamaParams,
    draft_cfg: LlamaConfig,
    target_params: LlamaParams,
    target_cfg: LlamaConfig,
    *,
    budgets: Sequence[int] = (1, 2, 4, 8, 16, 32, 64, 128),
    draft_width: int = 8,
    max_length: int = 256,
    kv_len: int = 128,
    dtype=jnp.bfloat16,
) -> Tuple[List[int], List[float], float]:
    """Returns (valid_budget, target_time seconds, draft_time seconds) —
    exactly the planner config fields (`demo-config.json:5-7`)."""
    target_time = time_forward_widths(
        target_params, target_cfg, budgets,
        max_length=max_length, kv_len=kv_len, dtype=dtype,
    )
    draft_time = time_forward_widths(
        draft_params, draft_cfg, [draft_width],
        max_length=max_length, kv_len=kv_len, dtype=dtype,
    )[0]
    return list(budgets), target_time, draft_time
