"""Fused tree-attention Pallas kernel.

Replaces the reference's `scaled_dot_product_attention` over the full static
cache with a tree-topology mask (`Engine/Llama_modules.py:127-134`,
SURVEY.md §2.4). One program per KV head computes the whole masked
attention for all (grouped) queries in VMEM:

    S = (Q . K^T) * scale  ->  mask  ->  softmax (f32)  ->  O = P . V

Nothing round-trips through HBM between these steps: scores and
probabilities live in VMEM only, and the (tiny) boolean visibility mask
[Q, M] — prefix-causal OR tree-ancestor, built outside from the growmap —
streams in as int8.

Shapes are speculative-decoding shapes: Q = tree width (<= a few hundred),
M = max cache length (<= a few thousand), so a full [G*Q, M] f32 score
block per head fits comfortably in ~16MB VMEM; no flash-style chunking is
needed. GQA is handled by folding the group dimension into the query rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    # q_ref: [1, GQ, D]; k_ref/v_ref: [M, 1, D]; bias_ref: [Q, M] f32
    # o_ref: [1, GQ, D].  GQ = G * Q (group-major folding: row g*Q + q).
    q = q_ref[0]                      # [GQ, D]
    k = k_ref[:, 0, :]                # [M, D]
    v = v_ref[:, 0, :]                # [M, D]
    gq = q.shape[0]
    Q = bias_ref.shape[0]
    G = gq // Q

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                          # [GQ, M] f32

    bias = bias_ref[:]                 # [Q, M] additive (0 / -inf-ish)
    if G > 1:
        bias = jnp.concatenate([bias] * G, axis=0)  # [GQ, M]
    s = s + bias

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(v.dtype)    # [GQ, M]
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                  # [GQ, D]
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tree_attention(
    q: jax.Array,      # [Q, Hkv, G, D]
    k: jax.Array,      # [M, Hkv, D]  (full static cache, current rows written)
    v: jax.Array,      # [M, Hkv, D]
    mask: jax.Array,   # [Q, M] bool — True = visible
    *,
    interpret: bool = False,
) -> jax.Array:
    """Returns attention output `[Q, Hkv, G, D]` (f32 accumulated, cast to
    q.dtype)."""
    Q, Hkv, G, D = q.shape
    M = k.shape[0]
    scale = D ** -0.5
    # Fold groups into query rows, group-major: [Hkv, G*Q, D].
    qf = q.transpose(1, 2, 0, 3).reshape(Hkv, G * Q, D)
    bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(Hkv,),
        in_specs=[
            pl.BlockSpec((1, G * Q, D), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1, D), lambda h: (0, h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1, D), lambda h: (0, h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, M), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G * Q, D), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hkv, G * Q, D), q.dtype),
        interpret=interpret,
    )(qf, k, v, bias)
    # [Hkv, G*Q, D] -> [Q, Hkv, G, D]
    return out.reshape(Hkv, G, Q, D).transpose(2, 0, 1, 3)


def reference_attention(q, k, v, mask):
    """Plain-XLA equivalent (the model's default path) for testing."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("qhgd,mhd->hgqm", q, k, preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask[None, None, :, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("hgqm,mhd->qhgd", p, v)
    return o
