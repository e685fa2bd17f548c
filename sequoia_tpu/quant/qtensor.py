"""Weight-only quantization for target models.

Replaces the reference's CPU-offloading path (`Engine/offload_engine.py`) as
the way to serve a target that doesn't fit in one device's HBM
(SURVEY.md §2.4): an int8 (or packed-int4) weight with per-output-channel
scales streams half (quarter) the bytes of bf16 — decode is weight-bandwidth
bound, so this is also a ~2x (~4x) per-forward speedup.

The dequant happens INSIDE the matmul: `x @ q.astype(bf16) * scale` — XLA
fuses the convert into the dot so the weight is read from HBM in its
quantized form and expanded in registers; the full bf16 weight never
materializes.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp


class QuantizedTensor(NamedTuple):
    """Symmetric per-output-channel quantized matrix.

    q:     int8  [..., in, out]        (int4: packed two-per-byte on `out`)
    scale: f32   [..., 1, out]
    bits:  static marker via shape — int8 stores `out` columns, int4 packed
           stores `out/2` bytes; `out` is recovered from `scale`.
    """

    q: jax.Array
    scale: jax.Array


WeightLike = Union[jax.Array, QuantizedTensor]


def quantize_int8(w: jax.Array) -> QuantizedTensor:
    """w: [..., in, out] float -> int8 with per-out-channel scale."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, out]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q=q, scale=scale)


def quantize_int4(w: jax.Array) -> QuantizedTensor:
    """int4 symmetric per-out-channel, packed 2 values/byte along `in` in
    HALF-SPLIT layout: packed row r holds w[r] in the low nibble and
    w[in/2 + r] in the high nibble. Unpacking is then a concat along `in` —
    no interleave/shuffle — which keeps the in-kernel (Pallas) and XLA
    dequant paths cheap and layout-friendly."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    assert q.shape[-2] % 2 == 0, "int4 packing needs even `in` dim"
    half = q.shape[-2] // 2
    lo = q[..., :half, :] & 0x0F
    hi = (q[..., half:, :] & 0x0F) << 4
    packed = (lo | hi).astype(jnp.int8)
    return QuantizedTensor(q=packed, scale=scale)


def tile_int4(w: QuantizedTensor, bn0: int = 128) -> QuantizedTensor:
    """Packed-int4 `[..., Kq, N]` -> N-PANEL layout `[..., nt, Kq, bn0]`.

    Why: the row-major packed weight makes every Pallas K-block DMA read
    `bkq` separate `bn`-byte rows with an N-byte stride (1 KB bursts at
    bn=1024); round-3's probe measured a 4.1x kernel-pipeline win from
    contiguous blocks (scripts/probe_int4_tiled.py). In the panel layout a
    `[bkq, bn0]` block of panel `n` is ONE contiguous `bkq*bn0`-byte read.
    Panels (not full 2-D tiling) keep the K axis as plain rows, so
    row-parallel TP sharding and runtime K-block choice stay free; bn0=128
    (one MXU lane tile) divides every llama projection width AND its tp=8
    shards — only the 32000-wide vocab head stays row-major (32000/8
    shards are not 128-divisible), which is also the matmul where the
    activation rows, not the weight stream, dominate at tree widths.
    Scales are unchanged (`[..., 1, N]` carries the logical N)."""
    q = w.q
    *lead, Kq, N = q.shape
    pad = (-N) % bn0
    if pad:
        q = jnp.pad(q, [(0, 0)] * len(lead) + [(0, 0), (0, pad)])
    nt = (N + pad) // bn0
    q = q.reshape(*lead, Kq, nt, bn0).swapaxes(-3, -2)
    return QuantizedTensor(q=q, scale=w.scale)


def untile_int4(w: QuantizedTensor) -> QuantizedTensor:
    """Inverse of `tile_int4` (used by the XLA/CPU fallback + dequantize)."""
    q = w.q
    *lead, nt, Kq, bn0 = q.shape
    N = w.scale.shape[-1]
    q = q.swapaxes(-3, -2).reshape(*lead, Kq, nt * bn0)[..., :N]
    return QuantizedTensor(q=q, scale=w.scale)


def is_tiled(w: QuantizedTensor) -> bool:
    """Panel-tiled int4 marker: q carries one more axis than the scale."""
    return w.q.ndim == w.scale.ndim + 1


def unpack_int4(packed: jax.Array) -> jax.Array:
    """[..., in/2, out] half-split packed -> [..., in, out] int8 in [-7, 7]."""
    p = packed.astype(jnp.int32)
    lo = p & 0x0F
    hi = (p >> 4) & 0x0F
    lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.int8)
    hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=-2)


_unpack_int4 = unpack_int4  # back-compat alias


def is_int4(w: QuantizedTensor) -> bool:
    return w.q.shape[-2] != w.scale.shape[-2] and (
        w.q.shape[-2] * 2 == _expected_in_dim(w)
    )


def _expected_in_dim(w: QuantizedTensor) -> int:
    # Heuristic: int4 halves the stored `in` dim; callers track bits via
    # shape relation with the activation they multiply. Exposed for tests.
    return w.q.shape[-2] * 2


import os

# Quantized-matmul implementation: "auto" (per-backend/bits choice, see
# `_resolve_impl`), "xla" (convert+dot, fine for int8), "pallas" (fused
# in-kernel dequant — required for int4 speed: the XLA unpack path
# rematerializes the bf16 weight every forward, measured ~10-21x slower on
# v5e), "pallas_interpret" (kernel in interpreter mode, CPU tests).
# Default from $SEQUOIA_QMM.
_QMM_IMPL = os.environ.get("SEQUOIA_QMM", "auto")

# W8A8: for WIDE int8 matmuls (tree-verify forwards at budget >= ~96) the
# dequant->bf16 dot hits the bf16 MXU roof (197 TFLOPs on v5e) and the
# forward goes compute-bound right where the planner wants bigger trees.
# Quantizing activations per-row to int8 and issuing a native
# int8 x int8 -> int32 dot runs on the int8 MXU mode (394 TOPS) and keeps
# the verify ~weight-bandwidth-bound out to budget ~192. Measured
# (scripts/probe_w8a8_widths.py, llama-2-7b shapes, v5e):
#   R=64:  w8a8 0.065 ms/matmul vs convert+dot 0.063  (wash)
#   R=128: w8a8 0.067            vs 0.073             (+9%)
#   R=256: w8a8 0.076 (302 TOPS) vs 0.142 (bf16 roof) (+87%)
# "auto" uses w8a8 on TPU when the activation has >= $SEQUOIA_W8A8_MIN_ROWS
# rows (default 96); "on"/"off" force it. Numerics: per-row symmetric int8
# activation quantization — a model-precision choice like the weight quant
# itself; measured quality deltas live in the quality-gate artifact
# (QUALITY_r02.json).
_W8A8 = os.environ.get("SEQUOIA_W8A8", "auto")
_W8A8_MIN_ROWS = int(os.environ.get("SEQUOIA_W8A8_MIN_ROWS", "96"))


def set_w8a8(mode: str, min_rows: int = None) -> None:
    global _W8A8, _W8A8_MIN_ROWS
    assert mode in ("auto", "on", "off"), mode
    _W8A8 = mode
    if min_rows is not None:
        _W8A8_MIN_ROWS = int(min_rows)


def _use_w8a8(x: jax.Array) -> bool:
    if _W8A8 == "off":
        return False
    if _W8A8 == "on":
        return True
    rows = x.shape[-2] if x.ndim >= 2 else 1
    return rows >= _W8A8_MIN_ROWS and _default_backend_is_tpu()


def _matmul_w8a8(x: jax.Array, w: "QuantizedTensor", preferred_element_type):
    """Per-row dynamic activation quant + native int8 MXU dot + rescale."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x8, w.q, (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx * w.scale.astype(jnp.float32)
    if preferred_element_type is None:
        return y.astype(x.dtype)
    return y.astype(preferred_element_type)


def set_quant_matmul_impl(impl: str) -> None:
    global _QMM_IMPL
    assert impl in ("auto", "xla", "pallas", "pallas_interpret"), impl
    _QMM_IMPL = impl


def _default_backend_is_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _resolve_impl(bits: int) -> str:
    """"auto": XLA's convert+dot fuses the int8 dequant into the weight
    stream already, but its packed-int4 unpack (shifts + concat) breaks
    fusion and rematerializes the bf16 weight in HBM every forward
    (~10x slower full-model forward measured on v5e) — int4 on TPU must go
    through the fused Pallas kernel. On CPU there is no Mosaic, so always
    XLA."""
    if _QMM_IMPL != "auto":
        return _QMM_IMPL
    if bits == 4 and _default_backend_is_tpu():
        return "pallas"
    return "xla"


def matmul(x: jax.Array, w: WeightLike, *, preferred_element_type=None) -> jax.Array:
    """x @ w with on-the-fly dequantization for QuantizedTensor weights."""
    if isinstance(w, QuantizedTensor) and is_tiled(w):
        # Panel-tiled int4: fused Pallas kernel reads contiguous
        # [bkq, bn0] blocks (see tile_int4). Non-TPU/odd ranks fall back
        # through the row-major path.
        assert w.q.shape[-2] * 2 == x.shape[-1], (w.q.shape, x.shape)
        if _resolve_impl(4) in ("pallas", "pallas_interpret") and x.ndim == 2:
            from ..kernels.quant_matmul import quant_matmul_tiled

            return quant_matmul_tiled(
                x, w.q, w.scale.astype(jnp.float32),
                interpret=(_resolve_impl(4) == "pallas_interpret"),
                out_dtype=preferred_element_type,
            )
        w = untile_int4(w)
    if isinstance(w, QuantizedTensor):
        bits = 8 if w.q.shape[-2] == x.shape[-1] else 4
        if bits == 4:
            assert w.q.shape[-2] * 2 == x.shape[-1], (w.q.shape, x.shape)
        impl = _resolve_impl(bits)
        if bits == 8 and impl == "xla" and _use_w8a8(x):
            return _matmul_w8a8(x, w, preferred_element_type)
        if impl != "xla" and x.ndim == 2 and w.q.ndim == 2:
            from ..kernels.quant_matmul import quant_matmul

            return quant_matmul(
                x, w.q, w.scale.astype(jnp.float32), bits=bits,
                interpret=(impl == "pallas_interpret"),
                out_dtype=preferred_element_type,  # None -> x.dtype
            )
        wq = w.q if bits == 8 else unpack_int4(w.q)
        y = jnp.dot(
            x, wq.astype(x.dtype),
            preferred_element_type=preferred_element_type or jnp.float32,
        )
        y = y * w.scale.astype(y.dtype)
        if preferred_element_type is None:
            y = y.astype(x.dtype)
        return y
    return jnp.dot(x, w, preferred_element_type=preferred_element_type or x.dtype)


def dequantize(w: QuantizedTensor, in_dim: int, dtype=jnp.float32) -> jax.Array:
    if is_tiled(w):
        w = untile_int4(w)
    q = w.q if w.q.shape[-2] == in_dim else _unpack_int4(w.q)
    return (q.astype(jnp.float32) * w.scale).astype(dtype)
