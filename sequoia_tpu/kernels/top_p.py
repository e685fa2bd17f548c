"""Fused nucleus-cutoff (top-p threshold) Pallas kernel.

Same math as `ops.sampling.top_p_threshold` (bisection for
c* = inf{c : sum(probs[probs > c]) <= top_p}, then exact boundary-token
resolution — semantics of the reference sort-based filter, `utils.py:65-77`),
but all 32 bisection passes run over a VMEM-resident row block instead of
re-streaming the `[rows, vocab]` probs from HBM per `fori_loop` iteration.
Measured on v5e (llama-2-7b vocab, 64 tree rows): the XLA loop costs
~1.17 ms per engine iteration; this kernel is ~0.1 ms.

Grid: one program per row block; the whole vocab row sits in VMEM
(`[8, 32000]` f32 = 1 MB). Output is `[rows, 128]` lanes broadcast (TPU
wants a 128 lane minor); callers slice `[:, 0]`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ITERS = 32


def _resolve_boundary(p, lo, top_p):
    """Exact boundary resolution (`ops/sampling.py::top_p_threshold`): the
    candidate cutoff token is the smallest probability still above lo; keep
    it iff the mass strictly above it fits in the nucleus. The returned
    inclusive threshold sits at the MIDPOINT of the gap next to the
    boundary value (with ulp-adjacent fallbacks), so consumers that
    re-derive row probabilities locally — the path walk's per-node softmax
    — get identical nucleus membership despite 1-ulp recomputation drift."""
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    cand = jnp.min(jnp.where(p > lo, p, big), axis=-1, keepdims=True)
    mass_gt = jnp.sum(jnp.where(p > cand, p, 0.0), axis=-1, keepdims=True)
    include_cand = mass_gt <= top_p
    below = jnp.max(jnp.where(p < cand, p, -big), axis=-1, keepdims=True)
    below = jnp.where(below > -big, below, 0.0)
    above = jnp.min(jnp.where(p > cand, p, big), axis=-1, keepdims=True)
    above = jnp.where(above < big, above, cand * 2.0)
    t_inc = 0.5 * (cand + below)
    t_inc = jnp.where(t_inc > below, t_inc, cand)
    t_exc = 0.5 * (cand + above)
    t_exc = jnp.where(t_exc > cand, t_exc, above)
    return jnp.where(include_cand, t_inc, t_exc)


def _kernel(p_ref, o_ref, *, top_p: float):
    p = p_ref[...]                                   # [Rb, V] f32
    hi = jnp.max(p, axis=-1, keepdims=True)          # [Rb, 1]
    lo = jnp.zeros_like(hi)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(p > mid, p, 0.0), axis=-1, keepdims=True)
        gt = mass > top_p
        return jnp.where(gt, mid, lo), jnp.where(gt, hi, mid)

    lo, _ = jax.lax.fori_loop(0, _ITERS, body, (lo, hi))
    t = _resolve_boundary(p, lo, top_p)
    o_ref[...] = jnp.broadcast_to(t, o_ref.shape)


def _kernel_from_logits(l_ref, o_ref, *, top_p: float, temp: float):
    """Same bisection, but the row softmax happens INSIDE the kernel from a
    logits block — the `[rows, vocab]` probability matrix never
    materializes in HBM (the path-following walk re-derives per-node rows
    locally; see trees/accept.py::stochastic_path_walk)."""
    # Divide (not multiply-by-reciprocal): bit-identical logits scaling to
    # target_probs / the walk's per-node softmax.
    x = l_ref[...].astype(jnp.float32) / temp        # [Rb, V]
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    hi = jnp.max(p, axis=-1, keepdims=True)
    lo = jnp.zeros_like(hi)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(p > mid, p, 0.0), axis=-1, keepdims=True)
        gt = mass > top_p
        return jnp.where(gt, mid, lo), jnp.where(gt, hi, mid)

    lo, _ = jax.lax.fori_loop(0, _ITERS, body, (lo, hi))
    t = _resolve_boundary(p, lo, top_p)
    o_ref[...] = jnp.broadcast_to(t, o_ref.shape)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("top_p", "temperature", "interpret"))
def top_p_threshold_from_logits(
    logits: jax.Array, top_p: float, temperature: float, *,
    interpret: bool = False
) -> jax.Array:
    """Per-row inclusive nucleus threshold on softmax(logits/T), computed
    without materializing the probability matrix. Keep = softmax >= t.
    Rows are the tree width (<= ~128); logits f32 `[rows, vocab]`."""
    R, V = logits.shape
    logits = logits.astype(jnp.float32)
    Vp = _round_up(V, 128)
    # 32 rows/block: the bisection is a SEQUENTIAL 32-pass fori_loop per
    # grid program and grid programs themselves run sequentially on the one
    # tensor core, so pass count — not VPU throughput — dominates at tree
    # widths. 8-row blocks cost 12 programs x 32 passes at width 96
    # (measured 0.235 ms inside the 7B iteration); 32-row blocks cut the
    # sequential pass count 4x (measured 0.080 ms, scripts/ablate7b.py).
    # VMEM at 32 rows: x/e/p planes 3 x 32x32000x4 = 12.3 MB — inside the
    # ~16 MB scoped budget.
    block_r = 32
    Rp = _round_up(R, block_r)
    if (Rp, Vp) != (R, V):
        # Lane padding must stay OUT of the softmax: -inf logits get
        # exp() == 0 and never enter any mass sum; pad rows are sliced off.
        logits = jnp.pad(logits, ((0, Rp - R), (0, Vp - V)),
                         constant_values=-1e30)
    out = pl.pallas_call(
        functools.partial(_kernel_from_logits, top_p=float(top_p),
                          temp=float(temperature)),
        grid=(Rp // block_r,),
        in_specs=[pl.BlockSpec((block_r, Vp), lambda r: (r, 0))],
        out_specs=pl.BlockSpec((block_r, 128), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, 128), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(logits)
    return out[:R, 0]


@functools.partial(jax.jit, static_argnames=("top_p", "interpret"))
def top_p_threshold_fused(
    probs: jax.Array, top_p: float, *, interpret: bool = False
) -> jax.Array:
    """Per-row inclusive nucleus threshold t (keep = probs >= t) for
    `probs: [rows, vocab]`; returns `[rows]` f32."""
    R, V = probs.shape
    probs = probs.astype(jnp.float32)
    Vp = _round_up(V, 128)
    block_r = 8
    Rp = _round_up(R, block_r)
    if (Rp, Vp) != (R, V):
        # zero padding is inert: pad rows produce garbage thresholds that are
        # sliced off; pad lanes have p == 0 which never enters any mass sum.
        probs = jnp.pad(probs, ((0, Rp - R), (0, Vp - V)))
    out = pl.pallas_call(
        functools.partial(_kernel, top_p=float(top_p)),
        grid=(Rp // block_r,),
        in_specs=[pl.BlockSpec((block_r, Vp), lambda r: (r, 0))],
        out_specs=pl.BlockSpec((block_r, 128), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, 128), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(probs)
    return out[:R, 0]
