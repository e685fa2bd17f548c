"""Pure-functional Llama forward pass for speculative decoding.

Single implementation for draft and target models. The reference forks its
module stack into `_FI` (CUDA-graph capturable, fused SDPA over the full
static cache — `Engine/Llama_modules.py:47-140`) and `_TG` (eager, trimmed
manual attention — `:142-257`) purely for CUDA-graph reasons; under `jax.jit`
with static shapes one implementation covers both roles.

Design points:
- Layers are *stacked*: every per-layer weight carries a leading `[L]` axis
  and the decode loop is one `lax.scan` — compile time stays flat in depth.
- Queries for one forward always occupy a contiguous KV slot window
  `[cache_offset, cache_offset + Q)` (the reference's `storage_ids` are
  contiguous ranges at every call site, e.g. `Tree/SpecTree.py:119-125`).
- Attention runs over the full static-`max_length` cache with an additive
  mask computed from the (prefix length, tree topology) state — same trick
  that made the reference's draft path CUDA-graph capturable
  (`Engine/Llama_modules.py:127-134`), and what keeps jit signatures static.
- RoPE is applied by *logical* position while rows are stored by *physical*
  slot (`Engine/Llama_modules.py:117-121` semantics); cos/sin come straight
  from `position_ids` (no table).
- Norms, attention softmax, and final logits are computed in f32; matmuls in
  the params dtype (bf16 on TPU) with `preferred_element_type=f32` where the
  result feeds f32 math.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import LlamaConfig
from ..kvcache.cache import (
    KVCache,
    KVCache4,
    KVCache8,
    quantize_kv_rows,
    quantize_kv_rows4,
)
from ..quant.qtensor import matmul as qmm

NEG_INF = float("-inf")


class LayerParams(NamedTuple):
    """Per-layer weights, each with a leading `[num_layers]` axis."""

    attn_norm: jax.Array  # [L, E]
    wq: jax.Array         # [L, E, H*D]
    wk: jax.Array         # [L, E, Hkv*D]
    wv: jax.Array         # [L, E, Hkv*D]
    wo: jax.Array         # [L, H*D, E]
    mlp_norm: jax.Array   # [L, E]
    w_gate: jax.Array     # [L, E, F]
    w_up: jax.Array       # [L, E, F]
    w_down: jax.Array     # [L, F, E]


class OffloadLayers(NamedTuple):
    """Layer stacks split by residency for host-offloaded serving.

    TPU-native rebuild of the reference's PCIe weight-streaming engine
    (`Engine/offload_engine.py:191-209` pins per-layer weights in CPU
    memory, `:299-309` keeps the first `stay_layers` resident on the GPU
    and double-buffers the rest): `streamed` leaves live in the TPU host's
    pinned memory space (`jax.memory.Space.Host`) and are copied into HBM
    one layer at a time inside the decode `lax.scan`; XLA's latency-hiding
    scheduler overlaps layer i+1's host->HBM DMA with layer i's compute —
    the compiler-scheduled equivalent of the reference's hand-rolled
    `load_stream` double buffering (`offload_engine.py:388-404`).

    `resident` holds the first `stay_layers` layers in device HBM (may be
    None). Both fields are `LayerParams` whose leaves may be float arrays
    or `QuantizedTensor`s (int8/int4 streaming cuts the PCIe/DMA bytes the
    same way it cuts the HBM stream)."""

    resident: Optional[LayerParams]
    streamed: LayerParams


class LlamaParams(NamedTuple):
    embed: jax.Array       # [V, E]
    layers: LayerParams    # or OffloadLayers (host-offloaded serving)
    final_norm: jax.Array  # [E]
    lm_head: jax.Array     # [E, V]


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rope_inv_freq(cfg: LlamaConfig) -> jnp.ndarray:
    """Per-frequency-pair inverse frequencies `[D/2]`, with the Llama-3.1/3.2
    "llama3" scaling applied when configured: wavelengths above
    `original_max_position / low_freq_factor` are stretched by `factor`, ones
    below `original / high_freq_factor` are kept, and the band between is
    linearly interpolated (HF `_compute_llama3_parameters` semantics)."""
    D = cfg.head_dim_
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D)
    )
    if cfg.rope_scaling_factor is None:
        return inv_freq
    factor = cfg.rope_scaling_factor
    low = cfg.rope_scaling_low_freq_factor
    high = cfg.rope_scaling_high_freq_factor
    orig = cfg.rope_scaling_original_max_position
    wavelen = 2.0 * jnp.pi / inv_freq
    smooth = (orig / wavelen - low) / (high - low)
    smooth = jnp.clip(smooth, 0.0, 1.0)  # 0 => long wavelength, 1 => short
    return (1.0 - smooth) * inv_freq / factor + smooth * inv_freq


def rope_cos_sin(position_ids: jax.Array, cfg: LlamaConfig) -> Tuple[jax.Array, jax.Array]:
    """cos/sin `[Q, D]` (half-duplicated, llama rotate-half convention)."""
    inv_freq = rope_inv_freq(cfg)
    freqs = position_ids.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [Q, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [Q, H, D]; cos/sin: [Q, D]."""
    cos = cos[:, None, :].astype(x.dtype)
    sin = sin[:, None, :].astype(x.dtype)
    return x * cos + _rotate_half(x) * sin


def _offload_layer_scan(layer_step, hidden, layers: OffloadLayers, kv_xs):
    """Run `layer_step` over a residency-split layer stack: a normal scan
    over the device-resident prefix, then a scan over the host-resident
    suffix where each step `device_put`s its layer's weights into device
    memory (`jax.memory.Space.Device`). XLA turns the in-loop transfer into
    an async host->HBM copy it schedules ahead of the consuming compute —
    layer i+1 streams while layer i runs, the reference's double-buffer
    overlap (`Engine/offload_engine.py:388-404`) without hand-rolled
    streams. Only the two live layers' weights ever occupy HBM."""
    from jax.memory import Space

    n_res = 0 if layers.resident is None else layers.resident.attn_norm.shape[0]
    ys_parts = []
    if n_res:
        xs_res = (layers.resident,) + tuple(
            jax.tree.map(lambda a: a[:n_res], x) for x in kv_xs
        )
        hidden, y = jax.lax.scan(layer_step, hidden, xs_res)
        ys_parts.append(y)

    def streamed_step(h, xs):
        lp = jax.tree.map(lambda a: jax.device_put(a, Space.Device), xs[0])
        return layer_step(h, (lp,) + tuple(xs[1:]))

    xs_str = (layers.streamed,) + tuple(
        jax.tree.map(lambda a: a[n_res:], x) for x in kv_xs
    )
    hidden, y = jax.lax.scan(streamed_step, hidden, xs_str)
    ys_parts.append(y)
    if len(ys_parts) == 2:
        y = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), *ys_parts
        )
    return hidden, y


def forward(
    params: LlamaParams,
    cfg: LlamaConfig,
    tokens: jax.Array,        # i32 [Q]
    position_ids: jax.Array,  # i32 [Q]
    kv: KVCache,
    cache_offset,             # i32 scalar: queries occupy slots [offset, offset+Q)
    attn_mask: jax.Array,     # bool [Q, max_length]; True = attend
    scratch: Optional[KVCache] = None,   # small [L, S, Hkv, D] tree scratch
    scratch_offset=None,      # i32 scalar: queries' slots within the scratch
    scratch_mask: Optional[jax.Array] = None,  # bool [Q, S]
):
    """Returns (`logits` f32 `[Q, vocab]`, updated cache-or-scratch).

    Two write modes:
    - `scratch is None` (prefill / autoregressive / bonus re-draft): new K/V
      rows go into the MAIN cache at `[cache_offset, cache_offset+Q)`;
      returns `(logits, updated_kv)`.
    - `scratch` given (tree grow / verify): the main cache is READ-ONLY;
      new rows go into the small scratch at `[scratch_offset, +Q)` and
      attention runs over main ∪ scratch with the pair of masks. Returns
      `(logits, updated_scratch)`. Keeping the main cache read-only here is
      a load-bearing perf property: compacting accepted rows out of the
      main cache (gather-from + scatter-into the SAME buffer,
      `Engine/Llama_KV.py:60-68` semantics) forced XLA to defensively copy
      the whole cache every iteration (measured ~16 ms/copy at B=32 int8
      on v5e); with tree rows in a separate scratch, the commit is a small
      different-buffer row scatter and the main cache is never rewritten.
    """
    Q = tokens.shape[0]
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    G = cfg.q_per_kv
    scale = D ** -0.5
    split = scratch is not None

    hidden = params.embed[tokens]  # [Q, E]
    cos, sin = rope_cos_sin(position_ids, cfg)
    # Additive f32 mask, broadcast over heads.
    bias = jnp.where(attn_mask, 0.0, NEG_INF).astype(jnp.float32)  # [Q, M]
    if split:
        bias_scr = jnp.where(scratch_mask, 0.0, NEG_INF).astype(jnp.float32)

    quantized_kv = isinstance(kv, (KVCache8, KVCache4))
    int4_kv = isinstance(kv, KVCache4)
    # int4 packing is shape-inferred (kvcache/cache.py::KVCache4): "head"
    # keeps the full head_dim minor dim, "dsplit" keeps the head axis
    # intact for TP (and odd-head models).
    kv4_packing = (("head" if kv.k.shape[-1] == D else "dsplit")
                   if int4_kv else None)
    if int4_kv:
        import functools as _ft

        quantize_rows = _ft.partial(quantize_kv_rows4, packing=kv4_packing)
    else:
        quantize_rows = quantize_kv_rows

    def layer_step(hidden, xs):
        if quantized_kv:
            lp, k_cache, v_cache, ks_c, vs_c, *scr = xs  # rows int, scales [M, Hkv]
        else:
            lp, k_cache, v_cache, *scr = xs  # k/v_cache: [M, Hkv, D]

        x = rms_norm(hidden, lp.attn_norm, cfg.rms_norm_eps)
        q = qmm(x, lp.wq).reshape(Q, H, D)
        k = qmm(x, lp.wk).reshape(Q, Hkv, D)
        v = qmm(x, lp.wv).reshape(Q, Hkv, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if split:
            sk, sv = scr  # scratch slices [S, Hkv, D], compute dtype
            sk = jax.lax.dynamic_update_slice(
                sk, k.astype(sk.dtype), (scratch_offset, 0, 0))
            sv = jax.lax.dynamic_update_slice(
                sv, v.astype(sv.dtype), (scratch_offset, 0, 0))
        elif quantized_kv:
            kq, k_sc = quantize_rows(k)
            vq, v_sc = quantize_rows(v)
            k_cache = jax.lax.dynamic_update_slice(k_cache, kq, (cache_offset, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, vq, (cache_offset, 0, 0))
            ks_c = jax.lax.dynamic_update_slice(ks_c, k_sc, (cache_offset, 0))
            vs_c = jax.lax.dynamic_update_slice(vs_c, v_sc, (cache_offset, 0))
        else:
            k_cache = jax.lax.dynamic_update_slice(k_cache, k, (cache_offset, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, v, (cache_offset, 0, 0))

        # GQA without materializing repeated KV heads.
        qg = q.reshape(Q, Hkv, G, D)
        if int4_kv:
            # CONCAT-FREE int4 unpack (`kvcache/cache.py::KVCache4`): the
            # nibble extraction stays elementwise and fuses into each dot —
            # the unpacked cache NEVER materializes. The original
            # `unpack_kv_rows4` + concat formulation blocked that fusion at
            # batch and the B=64 serving verify ran 104 ms/iteration (4x
            # the B=32 row for 2x the batch, BENCH_r04 crossover);
            # concat-free re-measured 49.6 ms (scripts/probe_b64_int4.py,
            # round 5). Per-row scales fold in exactly as in the int8 path
            # (applied on the re-assembled scores).
            k_lo = jnp.right_shift(jnp.left_shift(k_cache, 4), 4).astype(
                hidden.dtype)
            k_hi = jnp.right_shift(k_cache, 4).astype(hidden.dtype)
            v_lo = jnp.right_shift(jnp.left_shift(v_cache, 4), 4).astype(
                hidden.dtype)
            v_hi = jnp.right_shift(v_cache, 4).astype(hidden.dtype)
            if kv4_packing == "head":
                # [m, j, d] holds head 2j (low) / 2j+1 (high): attention
                # splits into an even-head dot and an odd-head dot. The
                # packed minor dim stays D=128 — the dsplit layout
                # tile-pads 2x, making "int4" occupy int8's HBM.
                qg_e, qg_o = qg[:, 0::2], qg[:, 1::2]   # [Q, Hkv/2, G, D]
                s_e = jnp.einsum("qhgd,mhd->hgqm", qg_e, k_lo,
                                 preferred_element_type=jnp.float32)
                s_o = jnp.einsum("qhgd,mhd->hgqm", qg_o, k_hi,
                                 preferred_element_type=jnp.float32)
                Mlen = s_e.shape[-1]
                scores = jnp.stack([s_e, s_o], axis=1).reshape(
                    Hkv, G, Q, Mlen) * scale

                def main_value_dot(pm):
                    a_e = jnp.einsum("hgqm,mhd->qhgd", pm[0::2], v_lo)
                    a_o = jnp.einsum("hgqm,mhd->qhgd", pm[1::2], v_hi)
                    return jnp.stack([a_e, a_o], axis=2).reshape(
                        Q, Hkv, G, D)
            else:
                # dsplit ([m, h, d] holds dim d low / D/2+d high): the
                # score dot splits along the CONTRACTED d axis —
                # q[..., :D/2] @ lo + q[..., D/2:] @ hi — and the value
                # dot into two output halves. Head axis intact: this is
                # the TP fallback when tp does not divide Hkv/2
                # (llama-2-70b Hkv=8 under tp=8) and the odd-head path.
                half = D // 2
                scores = (jnp.einsum(
                    "qhgd,mhd->hgqm", qg[..., :half], k_lo,
                    preferred_element_type=jnp.float32,
                ) + jnp.einsum(
                    "qhgd,mhd->hgqm", qg[..., half:], k_hi,
                    preferred_element_type=jnp.float32,
                )) * scale

                def main_value_dot(pm):
                    return jnp.concatenate([
                        jnp.einsum("hgqm,mhd->qhgd", pm, v_lo),
                        jnp.einsum("hgqm,mhd->qhgd", pm, v_hi),
                    ], axis=-1)
            scores = scores * ks_c.T[:, None, None, :]
            scores = scores + bias[None, None, :, :]
            v_scale = vs_c.T[:, None, None, :]
        elif quantized_kv:
            # int8 rows cross HBM; the convert fuses into the dot (same as
            # weight-only quantization) and the per-row scales fold into
            # attention exactly: scores *= ks[m,h] pre-softmax, probs *=
            # vs[m,h] pre-value-dot. Always the XLA path (the Pallas tree
            # kernel takes float caches).
            kf = k_cache.astype(hidden.dtype)
            scores = jnp.einsum(
                "qhgd,mhd->hgqm", qg, kf, preferred_element_type=jnp.float32
            ) * scale
            scores = scores * ks_c.T[:, None, None, :]
            scores = scores + bias[None, None, :, :]
            vf = v_cache.astype(hidden.dtype)
            v_scale = vs_c.T[:, None, None, :]

            def main_value_dot(pm):
                return jnp.einsum("hgqm,mhd->qhgd", pm, vf)
        else:
            # XLA fused attention (einsum -> softmax -> einsum) on every
            # path. A dedicated Pallas tree-attention kernel was built,
            # measured, and REMOVED (round 2): it only served the
            # non-split float path nothing in production uses, it failed
            # Mosaic lowering at llama-2-7b MHA shapes ([M, 1, D] KV blocks
            # violate the (8, 128) tiling rule), and the A/B at serving
            # shapes (scripts/probe_tree_attn_ab.py, v5e 2026-08-20) showed
            # attention moves ~8-17 MB/layer against a ~210 MB/layer weight
            # stream — even a 2x attention win changes the iteration ~1-2%,
            # so the XLA path stays (reference equivalent:
            # `Engine/Llama_modules.py:127-134` fused SDPA).
            scores = jnp.einsum(
                "qhgd,mhd->hgqm", qg, k_cache, preferred_element_type=jnp.float32
            ) * scale                              # [Hkv, G, Q, M] f32
            scores = scores + bias[None, None, :, :]
            vf = v_cache
            v_scale = None

            def main_value_dot(pm):
                return jnp.einsum("hgqm,mhd->qhgd", pm, vf)

        if split:
            scores_scr = jnp.einsum(
                "qhgd,shd->hgqs", qg, sk, preferred_element_type=jnp.float32
            ) * scale
            scores_scr = scores_scr + bias_scr[None, None, :, :]
            M = scores.shape[-1]
            full = jax.nn.softmax(
                jnp.concatenate([scores, scores_scr], axis=-1), axis=-1)
            probs, probs_scr = full[..., :M], full[..., M:]
            pm = probs * v_scale if v_scale is not None else probs
            attn = main_value_dot(pm.astype(hidden.dtype)) + jnp.einsum(
                "hgqs,shd->qhgd", probs_scr.astype(hidden.dtype), sv
            )
        else:
            probs = jax.nn.softmax(scores, axis=-1)
            pm = probs * v_scale if v_scale is not None else probs
            attn = main_value_dot(pm.astype(hidden.dtype))
        attn = attn.reshape(Q, H * D)
        hidden = hidden + qmm(attn, lp.wo)

        y = rms_norm(hidden, lp.mlp_norm, cfg.rms_norm_eps)
        mlp = qmm(jax.nn.silu(qmm(y, lp.w_gate)) * qmm(y, lp.w_up), lp.w_down)
        hidden = hidden + mlp
        if split:
            return hidden, (sk, sv)
        if quantized_kv:
            return hidden, (k_cache, v_cache, ks_c, vs_c)
        return hidden, (k_cache, v_cache)

    # Unroll shallow stacks (draft models are 2-12 layers): the scan loop
    # boundary blocks XLA from fusing/overlapping across layers, and at
    # draft scale per-forward overhead — not FLOPs — dominates the
    # speculation cost (planner draft_time sensitivity: SURVEY.md §3.3).
    unroll = cfg.num_layers if cfg.num_layers <= 12 else 1
    if quantized_kv:
        kv_xs = (kv.k, kv.v, kv.ks, kv.vs)
    else:
        kv_xs = (kv.k, kv.v)
    if split:
        kv_xs = kv_xs + (scratch.k, scratch.v)

    if isinstance(params.layers, OffloadLayers):
        hidden, ys = _offload_layer_scan(
            layer_step, hidden, params.layers, kv_xs
        )
    else:
        hidden, ys = jax.lax.scan(
            layer_step, hidden, (params.layers,) + kv_xs, unroll=unroll
        )
    if split:
        new_state = KVCache(k=ys[0], v=ys[1])
    elif quantized_kv:
        new_state = type(kv)(k=ys[0], v=ys[1], ks=ys[2], vs=ys[3])
    else:
        new_state = KVCache(k=ys[0], v=ys[1])
    hidden = rms_norm(hidden, params.final_norm, cfg.rms_norm_eps)
    logits = qmm(hidden, params.lm_head, preferred_element_type=jnp.float32)
    return logits, new_state
