"""Fused tree-attention (flash-style online-softmax) Pallas kernel.

The XLA einsum attention materializes per-layer score tensors
`[H, G, Q, M]` f32 in HBM between the QK dot, the mask add, the softmax,
and the AV dot — at verify widths this dominates the width-latency curve's
slope: measured on v5e (llama-2-13b, width 64), growing M from 256 to 384
added ~0.73 ms/forward while the extra KV stream alone accounts for
~0.13 ms. The reference leans on torch fused SDPA for exactly this
(`Engine/Llama_modules.py:127-134`); this kernel is the TPU equivalent,
specialized for the engine's split-cache tree verify:

- ONE pass over the KV stream: grid iterates M-blocks of the main cache,
  then the tree scratch (the online softmax continues seamlessly across
  the region boundary — equivalent to the XLA path's concat+softmax).
- All query heads are processed per grid step with a STATIC unroll, so
  per-head K/V slices are static VMEM subviews of the full-heads block
  `[Mb, Hkv, D]`. (Round 2's kernel attempt blocked K/V per head as
  `[Mb, 1, D]`, which violates Mosaic's (8, 128) window tiling on the
  minor dims and fails to lower; full-extent minor dims are exempt.)
- Scores, running max/sum, and the output accumulator live in VMEM
  scratch for the whole kernel; nothing [*, M]-shaped ever touches HBM.

Numerics: scores and softmax statistics in f32 (matching the XLA path's
`preferred_element_type=f32` + f32 softmax); probabilities are cast to the
value dtype for the AV dot (the XLA path casts identically); accumulation
over M-blocks in f32. Masking uses a large finite negative (-1e30) instead
of -inf so fully-masked blocks contribute exactly zero without NaNs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, b_ref, sk_ref, sv_ref, sb_ref, o_ref,
            acc_ref, m_ref, l_ref, *, n_main: int, n_total: int, g: int,
            scale: float):
    """One grid step = one KV block (main cache for steps < n_main, tree
    scratch after). Refs:
      q_ref  [Q, H, D]   (full, resident)
      k_ref/v_ref [Mb, Hkv, D] (current main block)
      b_ref  [Q, Mb] f32 additive bias (current main block)
      sk_ref/sv_ref [S, Hkv, D] (full scratch, resident)
      sb_ref [Q, S] f32
      o_ref  [Q, H, D]   (written on the last step)
      acc_ref [H, Q, D] f32, m_ref/l_ref [H, Q] f32 (VMEM scratch)
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    in_main = step < n_main
    H = q_ref.shape[1]

    def update(h, k_blk, v_blk, bias):
        # k_blk/v_blk [Mb, D]; bias [Q, Mb] f32
        q_h = q_ref[:, h, :]                            # [Q, D]
        s = jax.lax.dot_general(
            q_h, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias                                # [Q, Mb] f32
        m_prev = m_ref[h, :]                            # [Q]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_prev - m_new)                 # [Q]
        p = jnp.exp(s - m_new[:, None])                 # [Q, Mb] f32
        l_ref[h, :] = l_ref[h, :] * alpha + jnp.sum(p, axis=-1)
        m_ref[h, :] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [Q, D] f32
        acc_ref[h, :, :] = acc_ref[h, :, :] * alpha[:, None] + pv

    for h in range(H):
        kh = h // g

        @pl.when(in_main)
        def _main(h=h, kh=kh):
            update(h, k_ref[:, kh, :], v_ref[:, kh, :], b_ref[...])

        @pl.when(~in_main)
        def _scr(h=h, kh=kh):
            update(h, sk_ref[:, kh, :], sv_ref[:, kh, :], sb_ref[...])

    @pl.when(step == n_total - 1)
    def _done():
        for h in range(H):
            l = jnp.maximum(l_ref[h, :], 1e-30)[:, None]
            o_ref[:, h, :] = (acc_ref[h, :, :] / l).astype(o_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("g", "scale", "block_m", "interpret"),
)
def tree_attention(
    q: jax.Array,            # [Q, H, D] post-rope queries (bf16/f32)
    k_cache: jax.Array,      # [M, Hkv, D]
    v_cache: jax.Array,      # [M, Hkv, D]
    bias: jax.Array,         # [Q, M] f32 additive (0 / very negative)
    sk: jax.Array,           # [S, Hkv, D] tree scratch K
    sv: jax.Array,           # [S, Hkv, D]
    bias_scr: jax.Array,     # [Q, S] f32
    *,
    g: int,                  # query heads per KV head (GQA group)
    scale: float,
    block_m: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Returns attn [Q, H, D] in q.dtype: softmax over main ∪ scratch."""
    Q, H, D = q.shape
    M, Hkv, _ = k_cache.shape
    S = sk.shape[0]
    assert H == Hkv * g

    Qp = _round_up(Q, 8)
    Mb = min(block_m, _round_up(M, 8))
    Mp = _round_up(M, Mb)
    Sp = _round_up(S, 8)
    if Qp != Q:
        q = jnp.pad(q, ((0, Qp - Q), (0, 0), (0, 0)))
        bias = jnp.pad(bias, ((0, Qp - Q), (0, 0)), constant_values=_NEG)
        bias_scr = jnp.pad(bias_scr, ((0, Qp - Q), (0, 0)), constant_values=_NEG)
    if Mp != M:
        k_cache = jnp.pad(k_cache, ((0, Mp - M), (0, 0), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, Mp - M), (0, 0), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, Mp - M)), constant_values=_NEG)
    if Sp != S:
        sk = jnp.pad(sk, ((0, Sp - S), (0, 0), (0, 0)))
        sv = jnp.pad(sv, ((0, Sp - S), (0, 0), (0, 0)))
        bias_scr = jnp.pad(bias_scr, ((0, 0), (0, Sp - S)), constant_values=_NEG)
    # The additive bias arrives as 0/-inf; clamp to the kernel's finite
    # negative so fully-masked blocks stay NaN-free.
    bias = jnp.maximum(bias.astype(jnp.float32), _NEG)
    bias_scr = jnp.maximum(bias_scr.astype(jnp.float32), _NEG)

    n_main = Mp // Mb
    n_total = n_main + 1  # one trailing step covers the whole scratch

    kern = functools.partial(
        _kernel, n_main=n_main, n_total=n_total, g=g, scale=float(scale))
    out = pl.pallas_call(
        kern,
        grid=(n_total,),
        in_specs=[
            pl.BlockSpec((Qp, H, D), lambda m: (0, 0, 0)),       # q resident
            # Main K/V blocks: clamp the index during the scratch step so no
            # re-fetch happens (same block as the last main step).
            pl.BlockSpec((Mb, Hkv, D),
                         lambda m: (jnp.minimum(m, n_main - 1), 0, 0)),
            pl.BlockSpec((Mb, Hkv, D),
                         lambda m: (jnp.minimum(m, n_main - 1), 0, 0)),
            pl.BlockSpec((Qp, Mb),
                         lambda m: (0, jnp.minimum(m, n_main - 1))),
            pl.BlockSpec((Sp, Hkv, D), lambda m: (0, 0, 0)),     # scratch resident
            pl.BlockSpec((Sp, Hkv, D), lambda m: (0, 0, 0)),
            pl.BlockSpec((Qp, Sp), lambda m: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Qp, H, D), lambda m: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Qp, H, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, Qp, D), jnp.float32),
            pltpu.VMEM((H, Qp), jnp.float32),
            pltpu.VMEM((H, Qp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(q, k_cache, v_cache, bias, sk, sv, bias_scr)
    return out[:Q]
