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
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LlamaConfig
from ..core.model import LlamaParams, forward
from ..kvcache.cache import KVCache, KVCache4, KVCache8
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
    warmup: int = 1,
    reps: int = 50,
    batch: int = 1,
    kv_quant: Optional[str] = None,
) -> List[float]:
    """Wall-clock seconds per forward at each query width (decode position
    `kv_len`), the planner's `target_time` curve. One compile per width
    (the analog of the reference's per-decode-length CUDA graph list).

    The `reps` forwards run INSIDE one jit as a `lax.fori_loop`, mirroring
    how the engine actually executes (its decode loop is fully on-device) —
    timing individual dispatches would fold host/tunnel round-trip overhead
    into every step and bias the planner toward too-shallow trees.

    The per-forward time is DIFFERENCED between a short and a long loop:
    a single dispatch over a remote-TPU tunnel costs ~24 ms wall-clock
    regardless of the computation, so even `total/reps` at reps=50 carries
    a ~0.5 ms/forward bias — 5x the true cost of a small draft forward.
    `(T(reps) - T(reps/4)) / (reps - reps/4)` cancels the constant. The
    trip count is a traced argument, so both rep counts share one compile.

    `batch > 1` times the VMAPPED forward (batch independent requests, each
    its own KV — the batched engine's execution shape). This is how the
    planner becomes batch-aware: at batch the target is compute-bound rather
    than weight-bound, the latency curve steepens with budget, and the DP
    correctly picks a smaller tree."""

    def one_step(params, tokens, pos, kv, mask, scr_mask):
        # Split mode — the engine's tree forwards keep the main cache
        # read-only and write rows into a small scratch (core/model.py).
        w = tokens.shape[0]
        scratch = KVCache.init(cfg, w, dtype)
        logits, _ = forward(params, cfg, tokens, pos, kv, kv_len, mask,
                            scratch=scratch, scratch_offset=0,
                            scratch_mask=scr_mask)
        return logits, kv

    # Match the serving cache precision: a bf16 cache at batch both mis-
    # measures the engine's int8-KV latency AND can OOM next to the weights
    # (4.3 GB at B=32 for llama-2-7b vs 2.1 GB int8).
    cache_cls = {"int8": KVCache8, "int4": KVCache4,
                 None: KVCache, "none": KVCache}[kv_quant]

    # Cache batches on AXIS 1 so the model's layer scan keeps its leading
    # axis — batch-leading caches make vmap insert full-cache layout
    # transposes around the scan (see BatchedSpecEngine docstring).
    kv_ax = cache_cls(*([1] * len(cache_cls._fields)))
    if batch > 1:
        one_step = jax.vmap(one_step, in_axes=(None, 0, 0, kv_ax, None, None),
                            out_axes=(0, kv_ax))

    def reps_loop(params, tokens, pos, kv, mask, scr_mask, n):
        # kv is NOT a loop carry: the split-mode forward reads the main
        # cache and writes only the scratch, and XLA double-buffers loop
        # carries — carrying a B=64 int8 cache (4.3 GB) through the loop
        # allocated 2x inside the program and RESOURCE_EXHAUSTED next to
        # the 7B weights. As a closed-over read-only input it is single-
        # buffered.
        def body(i, acc):
            # Data-depend on i so XLA cannot hoist the loop-invariant body.
            logits, _ = one_step(params, tokens + (i % 2), pos, kv, mask,
                                 scr_mask)
            return acc + logits.reshape(-1)[0]

        acc = jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))
        # kv is returned so the donated input buffer has an output to alias
        # with — otherwise XLA drops the donation ("donated buffers were not
        # usable" warnings) and the timed loop pays a cache copy.
        return acc, kv

    timed = jax.jit(reps_loop, donate_argnames=("kv",))

    def fresh_kv():
        if batch > 1:
            return jax.vmap(
                lambda _: cache_cls.init(cfg, max_length, dtype), out_axes=kv_ax
            )(jnp.arange(batch))
        return cache_cls.init(cfg, max_length, dtype)

    out = []
    # ONE cache threaded through every warmup/sample call via donation:
    # a fresh_kv() per call keeps the previous call's donated OUTPUT alive
    # while the new buffer initializes — a transient 2x-KV peak that
    # RESOURCE_EXHAUSTEDs B=64 int8 at 7B (2 x 4.3 GB next to 6.9 GB of
    # weights) even though the steady state fits. Latency is KV-content-
    # independent, and carrying state varies the inputs per call (defeats
    # same-input execution caching more robustly than token salts alone).
    kv_state = fresh_kv()
    for w in widths:
        tokens = jnp.zeros((w,), jnp.int32)
        pos = kv_len + jnp.arange(w, dtype=jnp.int32)
        if batch > 1:
            tokens = jnp.broadcast_to(tokens, (batch, w))
            pos = jnp.broadcast_to(pos, (batch, w))
        mask = jnp.asarray(
            np.arange(max_length) < kv_len)[None, :].repeat(w, 0)
        scr_mask = jnp.asarray(np.tril(np.ones((w, w), bool)))
        # `float(...)` (device_get) rather than block_until_ready: on
        # remote-TPU tunnels block_until_ready can return before execution
        # completes (observed on axon), silently timing nothing. Fetching
        # the scalar value is a hard synchronization point either way, and
        # warming up with a *different* token value defeats any
        # same-input execution result caching in the runtime.
        r1 = max(2, reps // 4)
        n1 = jnp.asarray(r1, jnp.int32)
        n2 = jnp.asarray(reps, jnp.int32)
        for i in range(warmup):
            acc, kv_state = timed(params, tokens + (2 + i), pos, kv_state,
                                  mask, scr_mask, n1)
            float(acc)
        # Median of 3 differenced samples: a single (short, long) pair can
        # swing +-1 ms with tunnel load in EITHER direction (a slow short
        # run UNDERestimates), which fed the planner width-curve outliers
        # (observed: 8.45 ms at width 64 between 9.5 ms neighbors).
        samples = []
        # Token offsets start past the warmup range (warmup used
        # tokens + 2 .. tokens + 1 + warmup with the same n1 and an
        # equal-valued fresh KV) so no timed dispatch can ever collide
        # with a warmup dispatch under same-input execution caching.
        base = 2 + warmup
        for j in range(3):
            t0 = time.perf_counter()
            acc, kv_state = timed(params, tokens + base + 2 * j, pos,
                                  kv_state, mask, scr_mask, n1)
            float(acc)  # acc depends on the final state: hard sync
            t_short = time.perf_counter() - t0
            t0 = time.perf_counter()
            acc, kv_state = timed(params, tokens + base + 2 * j + 1, pos,
                                  kv_state, mask, scr_mask, n2)
            float(acc)
            t_long = time.perf_counter() - t0
            samples.append((t_long - t_short) / (reps - r1))
        samples.sort()
        out.append(samples[1])
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
