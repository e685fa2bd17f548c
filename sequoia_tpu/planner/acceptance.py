"""Acceptance-rate vector measurement — the planner's model-pair input.

Two independent methods, mirroring the reference's pair (SURVEY.md §3.4):

- `static_acceptance` — teacher-forced analytic expectation
  (`tests/fast_test.py:36-108`): run draft+target once over ground-truth
  text; per position, iteratively sample draft tokens without replacement
  and accumulate the acceptance mass `min(1, p/q)` per rank with residual
  updates on p and renormalized q. No tree runtime needed; one forward
  pass per model per sequence.
- `dynamic_acceptance` — run the real engine with a depth-1 star growmap of
  width W and histogram the accepted child rank per step
  (`tests/test_accept.py:36-86` / `SpecTreeTest`).

The two must agree (they estimate the same vector); `tests/test_acceptance.py`
cross-validates them, a consistency check the reference never performs.

Output format matches the reference artifact: element 0 is 0.0, element k =
P(rank-k child accepted), length k+1.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LlamaConfig
from ..core.model import LlamaParams, forward
from ..kvcache.cache import KVCache
from ..ops import masks
from ..ops.sampling import residual, top_p_filter
from ..trees.growmap import uniform_tree
from ..utils import prng_key


def _per_position_rates(
    key, p, draft_logits, k: int, temperature: float
) -> jax.Array:
    """Acceptance mass per rank for one position: p is the (filtered)
    target distribution, draft_logits the (filtered) draft logits."""

    def rank_step(carry, key_j):
        p, dl, remaining = carry
        q = jax.nn.softmax(dl / temperature, axis=-1)
        tok = jax.random.categorical(key_j, jnp.log(jnp.maximum(q, 1e-30)))
        ratio = jnp.minimum(1.0, p[tok] / jnp.maximum(q[tok], 1e-30))
        rate = remaining * ratio
        p = residual(p, q)
        p = jnp.where(jnp.isnan(p), 0.0, p)
        dl = dl.at[tok].set(float("-inf"))
        return (p, dl, remaining * (1.0 - ratio)), rate

    keys = jax.random.split(key, k)
    (_, _, _), rates = jax.lax.scan(
        rank_step, (p, draft_logits, jnp.asarray(1.0, jnp.float32)), keys
    )
    return rates  # [k]


@partial(jax.jit, static_argnames=("k", "temperature", "top_p", "draft_top_p"))
def _static_rates_for_logits(
    key, target_logits, draft_logits, k, temperature, top_p, draft_top_p
):
    p = jax.nn.softmax(
        top_p_filter(target_logits, top_p, temperature) / temperature, axis=-1
    )
    dl = top_p_filter(draft_logits, draft_top_p, temperature)
    n = target_logits.shape[0]
    keys = jax.random.split(key, n)
    return jax.vmap(lambda kk, pp, ll: _per_position_rates(kk, pp, ll, k, temperature))(
        keys, p, dl
    )  # [n, k]


def static_acceptance(
    draft_params: LlamaParams,
    draft_cfg: LlamaConfig,
    target_params: LlamaParams,
    target_cfg: LlamaConfig,
    sequences: Sequence[np.ndarray],
    *,
    k: int = 8,
    temperature: float = 0.6,
    top_p: float = 0.9,
    draft_top_p: float = 0.99,
    skip_prefix: int = 0,
    seed: int = 0,
    dtype=jnp.float32,
) -> np.ndarray:
    """Teacher-forced acceptance vector over ground-truth `sequences`."""
    fwd_t = jax.jit(partial(forward, cfg=target_cfg))
    fwd_d = jax.jit(partial(forward, cfg=draft_cfg))
    key = prng_key(seed)
    total = np.zeros(k, np.float64)
    count = 0
    for seq in sequences:
        seq = np.asarray(seq, np.int32).reshape(-1)
        T = len(seq)
        assert T > skip_prefix + 1
        tokens = jnp.asarray(seq)
        pos = jnp.arange(T, dtype=jnp.int32)
        mask = masks.causal_mask(T, T, 0)
        kv_t = KVCache.init(target_cfg, T, dtype)
        kv_d = KVCache.init(draft_cfg, T, dtype)
        tl, _ = fwd_t(target_params, tokens=tokens, position_ids=pos, kv=kv_t,
                      cache_offset=0, attn_mask=mask)
        dl, _ = fwd_d(draft_params, tokens=tokens, position_ids=pos, kv=kv_d,
                      cache_offset=0, attn_mask=mask)
        key, sub = jax.random.split(key)
        rates = _static_rates_for_logits(
            sub, tl[skip_prefix:], dl[skip_prefix:], k, temperature, top_p, draft_top_p
        )
        total += np.asarray(rates.sum(axis=0), np.float64)
        count += rates.shape[0]
    vec = total / max(count, 1)
    return np.concatenate([[0.0], vec])


def dynamic_acceptance(
    draft_params: LlamaParams,
    draft_cfg: LlamaConfig,
    target_params: LlamaParams,
    target_cfg: LlamaConfig,
    prompts: Sequence[np.ndarray],
    *,
    width: int = 8,
    steps_per_prompt: int = 64,
    temperature: float = 0.6,
    top_p: float = 0.9,
    max_length: int = 256,
    seed: int = 0,
    algorithm: str = "sequoia",
) -> np.ndarray:
    """Accepted-child-rank histogram from real engine runs with a depth-1
    star tree. Returns `[0, p1, ..., pW]` with p_b = P(rank-b child
    accepted) across steps. Every verification algorithm is measurable so
    growmaps are always planned from a vector measured under the SAME
    protocol that will run them: `"sequoia"` is the SpecTreeTest protocol
    (`Tree/SpecTree.py:288`), `"greedy"` the GreedyTreeTest one
    (`Tree/GreedyTree.py:267`: top-W draft children, accept = argmax match),
    `"greedys"` top-W children vs one sampled target token, `"specinfer"`
    with-replacement children + `p >= rq` rounds (the reference only ever
    measures the first two)."""
    from ..engine.engine import SpecEngine

    gm = uniform_tree(1, width)
    eng = SpecEngine(
        draft_params, draft_cfg, target_params, target_cfg, gm,
        algorithm=algorithm, max_length=max_length,
        temperature=temperature, top_p=top_p,
    )
    hist = np.zeros(width + 1, np.int64)
    total = 0
    for i, prompt in enumerate(prompts):
        state = eng.prefill(prompt, seed=seed + i)
        gtl = len(np.asarray(prompt).reshape(-1))
        for _ in range(steps_per_prompt):
            if gtl - 1 + gm.size > max_length or gtl + eng.max_depth + 1 > max_length:
                break
            state, stats = eng._iterate(eng.draft_params, eng.target_params, state)
            rank = int(stats.first_rank)
            gtl += int(stats.emitted)
            total += 1
            if rank >= 0:
                hist[rank + 1] += 1
            if bool(stats.terminal):
                break
    vec = hist.astype(np.float64) / max(total, 1)
    vec[0] = 0.0
    return vec


def calibrate_vector(
    vec: np.ndarray,
    probe_gm,
    measured_e: float,
    *,
    lo: float = 0.3,
    hi: float = 1.5,
    iters: int = 48,
) -> tuple[np.ndarray, float]:
    """Depth-calibrate an acceptance vector against a probe tree.

    Both measurement methods above estimate acceptance at DEPTH 1 (fresh,
    AR-committed states). Planning a deep tree from that vector compounds
    any per-edge optimism exponentially: measured on a distilled pair with
    rank-1 0.876, a depth-13 plan claimed E 9.79 and realized 5.98 — the
    acceptance along accepted paths is path-conditioned (and saturating:
    a pure chain degrades much further than a branched tree, whose sibling
    fallbacks recover most of the loss — so the probe should match the
    PLAN's topology class, e.g. `uniform_tree(6, 2)` for deep branched
    plans). The reference plans straight from the depth-1 vector and
    inherits the same bias (`tree_search.py` consumes
    `acceptance-rate-vector.pt` unmodified).

    Finds the scalar s such that `expected_accepted(probe_gm, s * vec)`
    equals `measured_e` (the probe tree's MEASURED accepted/step from a
    real engine run) and returns (calibrated vector, s). Validated in
    TRAINED_E5_r04: probe-calibrated planning predicted 6.27 against a
    measured 5.98 (-4.7%) where the raw vector claimed 9.79 (-39%)."""
    from .dp import expected_accepted

    vec = np.asarray(vec, np.float64)

    def pred(s: float) -> float:
        v = vec.copy()
        v[1:] = np.minimum(v[1:] * s, 1.0)
        return float(expected_accepted(probe_gm, v))

    # Bracket check (advisor r4): if the measured E falls outside what any
    # scale in [lo, hi] can predict (degraded or anomalous probe run), a
    # silent clamp would hand the planner an uncorrected bias. Warn loudly
    # and return the endpoint — the caller sees the scale pinned at the
    # bracket edge and the warning names the gap.
    p_lo, p_hi = pred(lo), pred(hi)
    if not (p_lo <= measured_e <= p_hi):
        import warnings

        warnings.warn(
            f"calibrate_vector: measured E {measured_e:.3f} outside the "
            f"bracket's predictable range [{p_lo:.3f}, {p_hi:.3f}] "
            f"(scales [{lo}, {hi}]); returning the clamped endpoint — "
            "the probe run looks anomalous, treat the calibrated plan "
            "with suspicion", stacklevel=2)

    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        if pred(mid) < measured_e:
            lo = mid
        else:
            hi = mid
    s = 0.5 * (lo + hi)
    out = vec.copy()
    out[1:] = np.minimum(out[1:] * s, 1.0)
    return out, s
