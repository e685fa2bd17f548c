"""Sampling and residual math for lossless speculative decoding.

Functional equivalents of the reference `utils.py`, keyed on explicit JAX
PRNG keys (replacing torch's global RNG + per-prompt pre-generated uniform
buffers, `Tree/SpecTree.py:60,84`). All distribution math runs in f32.

Reference semantics preserved:
- `residual` = normalize(relu(p - q))                    (`utils.py:5-8`)
- without-replacement draft sampling via an exponential race
  `(log U / q).topk(k)`                                  (`utils.py:10-18`);
  here implemented as the equivalent Gumbel-top-k on log-probabilities.
- top-p nucleus filtering at temperature T               (`utils.py:65-77`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def residual(p: jax.Array, q: jax.Array) -> jax.Array:
    """normalize(relu(p - q)); rows sum to 1 unless p <= q everywhere
    (then the reference produces NaN and treats it as terminal,
    `Tree/SpecTree.py:219-220` — we keep NaN semantics so callers can check).
    """
    r = jnp.maximum(p - q, 0.0)
    return r / jnp.sum(r, axis=-1, keepdims=True)


def top_p_filter(logits: jax.Array, top_p: float, temperature: float) -> jax.Array:
    """Mask (to -inf) tokens outside the nucleus. `get_sampling_logits`
    semantics (`utils.py:65-77`): sort descending, keep tokens while the
    cumulative probability *before* them is <= top_p (the first token always
    survives)."""
    if top_p >= 1.0:
        return logits
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits / temperature, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    remove_sorted = (cum - probs) > top_p
    inv = jnp.argsort(sort_idx, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
    return jnp.where(remove, NEG_INF, logits)


def top_p_threshold(probs: jax.Array, top_p: float, iters: int = 32) -> jax.Array:
    """Per-row nucleus cutoff c* = inf{c : sum(probs[probs > c]) <= top_p},
    found by bisection — NO sort. A token is in the nucleus iff its
    probability >= c* (identical to the sort-based reference filter,
    `utils.py:65-77`, modulo exact ties which have measure zero for real
    logits). Vocab-sized sorts cost tens of ms on TPU; bisection is `iters`
    masked-sum passes (~1 ms total), and after 32 halvings the interval is
    below f32 resolution.
    """
    lo = jnp.zeros(probs.shape[:-1], probs.dtype)
    hi = jnp.max(probs, axis=-1)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(probs > mid[..., None], probs, 0.0), axis=-1)
        gt = mass > top_p  # need a larger cutoff
        return (jnp.where(gt, mid, lo), jnp.where(gt, hi, mid))

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    # Exact boundary resolution: the candidate cutoff token is the smallest
    # probability still above `lo`; it is kept iff the mass strictly above
    # it fits in the nucleus (the reference keeps the first token that
    # crosses top_p, `utils.py:73-74`).
    cand = jnp.min(jnp.where(probs > lo[..., None], probs, jnp.inf), axis=-1)
    mass_gt = jnp.sum(jnp.where(probs > cand[..., None], probs, 0.0), axis=-1)
    include_cand = mass_gt <= top_p
    # Return an inclusive threshold (keep = probs >= t) placed at the
    # MIDPOINT of the gap below (inclusive) / above (exclusive) the
    # boundary value — never exactly ON it. Consumers that re-derive row
    # probabilities locally (the path walk's per-node softmax,
    # trees/accept.py) can drift by 1 ulp from the probs used here; a
    # midpoint threshold makes nucleus membership identical across those
    # recomputations (the gap between DISTINCT f32 probabilities is far
    # wider than recomputation drift).
    below = jnp.max(
        jnp.where(probs < cand[..., None], probs, -jnp.inf), axis=-1)
    below = jnp.where(jnp.isfinite(below), below, 0.0)
    above = jnp.min(
        jnp.where(probs > cand[..., None], probs, jnp.inf), axis=-1)
    above = jnp.where(jnp.isfinite(above), above, cand * 2.0)
    t_inc = 0.5 * (cand + below)
    t_inc = jnp.where(t_inc > below, t_inc, cand)   # ulp-adjacent guard
    t_exc = 0.5 * (cand + above)
    t_exc = jnp.where(t_exc > cand, t_exc, above)
    return jnp.where(include_cand, t_inc, t_exc)


def _threshold_auto(probs: jax.Array, top_p: float) -> jax.Array:
    """Nucleus threshold: fused Pallas kernel on TPU (the XLA `fori_loop`
    bisection re-streams probs from HBM every pass — ~1.17 ms per engine
    iteration at [64, 32000]; the kernel keeps the row block VMEM-resident,
    ~0.1 ms), plain XLA elsewhere. Same math either way."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    if on_tpu and probs.ndim == 2:
        from ..kernels.top_p import top_p_threshold_fused

        return top_p_threshold_fused(probs, top_p)
    return top_p_threshold(probs, top_p)


def nucleus_cutoff(
    logits: jax.Array, top_p: float, temperature: float
) -> jax.Array:
    """Per-row inclusive nucleus cutoff c for softmax(logits/T) — the ONLY
    precomputed quantity the path-following walk needs (it re-derives rows
    + kept-mass normalizers locally, so the `[rows, vocab]` probability
    matrix never materializes). Keep = softmax >= c; zeros when top_p >= 1.
    Fused from-logits kernel on TPU, XLA bisection elsewhere."""
    if top_p >= 1.0:
        return jnp.zeros(logits.shape[:-1], jnp.float32)
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    if on_tpu and logits.ndim == 2:
        from ..kernels.top_p import top_p_threshold_from_logits

        return top_p_threshold_from_logits(logits, top_p, temperature)
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=-1)
    return top_p_threshold(probs, top_p)


def target_probs(
    logits: jax.Array, top_p: float, temperature: float
) -> jax.Array:
    """Verification distribution p: nucleus-filtered softmax at temperature
    (`Tree/SpecTree.py:196-198`). Sort-free (see `top_p_threshold`)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=-1)
    if top_p >= 1.0:
        return probs
    c = _threshold_auto(probs, top_p)
    kept = jnp.where(probs >= c[..., None], probs, 0.0)
    return kept / jnp.sum(kept, axis=-1, keepdims=True)


def draft_probs(draft_logits: jax.Array, temperature: float) -> jax.Array:
    """q = softmax(draft_logits / T) (`Tree/SpecTree.py:149`)."""
    return jax.nn.softmax(draft_logits.astype(jnp.float32) / temperature, axis=-1)


_TOPK_BLOCK = 128  # one VPU lane tile


def top_k_indices(x: jax.Array, k: int) -> jax.Array:
    """Exact top-k indices in descending order.

    `jax.lax.top_k` lowers to a FULL vocab sort on TPU (measured 6.1 ms per
    call on [32, 32000] f32 on v5e — 3 such sorts were ~40% of the whole
    batched spec iteration), and k successive full-row argmax+mask passes
    (the round-1 replacement) still read the whole [R, 32000] row k times —
    profiled at 1.95 ms of a 14.3 ms iteration for the size-128 growmap
    (widths up to 27).

    Two-stage exact top-k instead, with a CONSTANT op count (~8 ops; k
    sequential argmax+mask extractions are ~6 tiny ops each, and at the
    engine's tree sizes the iteration is launch-overhead bound, not
    bandwidth bound — profiled 2.0 ms of WOR sampling either way):

      1. per-block maxima over 128-wide blocks (the one full-row pass)
      2. `lax.top_k` of the k largest BLOCKS on the tiny [.., V/128] array
      3. gather those k blocks and `lax.top_k` the [.., k*128] candidates

    Exactness: any element outside the top-k blocks is <= its block max
    <= every selected block's max, so at least k elements beat it — the
    global top-k all live inside the selected blocks (ties measure-zero
    under the gumbel race, so WOR sampling semantics are unchanged).
    `lax.top_k`'s full sort is only ever applied to V/128- and k*128-sized
    rows, never the vocab (a [32, 32000] top_k sort measured 6.1 ms)."""
    if k == 1:
        return jnp.argmax(x, axis=-1)[..., None].astype(jnp.int32)
    V = x.shape[-1]
    B = _TOPK_BLOCK
    nb = (V + B - 1) // B
    if nb <= k or V <= 2 * B:  # tiny vocab: sort it directly
        _, idx = jax.lax.top_k(x, k)
        return idx.astype(jnp.int32)
    pad = nb * B - V
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((*x.shape[:-1], pad), NEG_INF, x.dtype)], axis=-1)
    lead = x.shape[:-1]
    xb = x.reshape(*lead, nb, B)
    bm = jnp.max(xb, axis=-1)                        # [.., nb]
    _, blocks = jax.lax.top_k(bm, k)                 # [.., k] block ids
    cand = jnp.take_along_axis(xb, blocks[..., None], axis=-2)  # [.., k, B]
    cand = cand.reshape(*lead, k * B)
    _, sel = jax.lax.top_k(cand, k)                  # [.., k] in candidate idx
    g_block = jnp.take_along_axis(blocks, sel // B, axis=-1)
    return (g_block * B + sel % B).astype(jnp.int32)


def sample_without_replacement(
    key: jax.Array, logits: jax.Array, temperature: float, num_samples: int
) -> jax.Array:
    """Draw `num_samples` distinct tokens per row from softmax(logits/T),
    ordered by draw. Gumbel-top-k is distributionally identical to the
    reference exponential race (`utils.py:10-18`). The softmax
    normalization is rank-invariant (logsumexp is constant per row), so the
    race runs directly on `logits/T + gumbel` — two fewer full-vocab passes
    per tree level than normalizing first, same distribution exactly."""
    gumbel = jax.random.gumbel(key, logits.shape, jnp.float32)
    return wor_from_gumbel(logits, gumbel, temperature, num_samples)


def wor_from_gumbel(
    logits: jax.Array, gumbel: jax.Array, temperature: float, num_samples: int
) -> jax.Array:
    """WOR race with caller-supplied gumbel noise. Lets the engine draw ONE
    `[total_root_rows, vocab]` noise block per tree growth instead of one
    rbg call per level: each rbg invocation carries ~15 us of fixed setup on
    v5e (measured: 7 per-level draws 218 us vs one hoisted draw 113 us for
    the same race), and a deep tree runs `depth` levels per iteration.
    Same distribution — gumbel noise is i.i.d. across rows either way."""
    assert gumbel.shape == logits.shape, (gumbel.shape, logits.shape)
    return top_k_indices(
        logits.astype(jnp.float32) / temperature + gumbel, num_samples)


def sample_with_replacement(
    key: jax.Array, logits: jax.Array, temperature: float, num_samples: int
) -> jax.Array:
    """i.i.d. categorical draws (SpecInfer growth, `Tree/SpecInferTree.py:108`).
    Returns `[..., num_samples]`."""
    log_q = jax.nn.log_softmax(logits.astype(jnp.float32) / temperature, axis=-1)
    batch = logits.shape[:-1]
    draws = jax.random.categorical(key, log_q, axis=-1, shape=(num_samples, *batch))
    return jnp.moveaxis(draws, 0, -1)


def sample_argmax(logits: jax.Array, num_samples: int) -> jax.Array:
    """Top-k tokens by logit (greedy growth, `utils.py:29-32`)."""
    return top_k_indices(logits, num_samples)


def sample_categorical_probs(key: jax.Array, probs: jax.Array) -> jax.Array:
    """One draw from a probability vector (bonus-token sampling,
    `Tree/SpecTree.py:222`). NaN rows produce an arbitrary token; callers
    must check `jnp.isnan` separately (terminal guard)."""
    safe = jnp.where(jnp.isnan(probs), 0.0, probs)
    logp = jnp.log(jnp.maximum(safe, 1e-30))
    return jax.random.categorical(key, logp, axis=-1)
