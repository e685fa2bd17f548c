"""Static-shape KV cache for tree speculative decoding.

TPU-native re-design of the reference `Engine/Llama_KV.py`:

- The reference scatter-writes rows by arbitrary `storage_ids`
  (`Llama_KV.py:84-85`, `index_copy_`). In practice every call site passes a
  *contiguous* slot range, so here the write contract is an explicit
  `(offset, length)` contiguous window implemented with
  `lax.dynamic_update_slice` — no scatter, XLA updates in place when the
  buffer is donated.
- `gather_kv_incremental` (`Llama_KV.py:60-68`) copies accepted rows down and
  zeroes the tail. Here compaction gathers the (few, ≤ tree depth + 1)
  accepted rows and writes them at the destination offset; the tail is *not*
  zeroed, because attention masks are always generated from the live
  `(prefix_len, tree topology)` state and can never see stale slots (the
  ancestor rule guarantees tree slots are rewritten before first use).

Layout: `[num_layers, max_length, num_kv_heads, head_dim]` — the layer axis
leads so the per-layer decode loop is a `lax.scan`, and `max_length` sits in
the sublane dimension with `head_dim` on lanes for friendly (8,128) tiling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import LlamaConfig


class KVCache(NamedTuple):
    """K/V buffers: each `[num_layers, max_length, num_kv_heads, head_dim]`."""

    k: jax.Array
    v: jax.Array

    @property
    def max_length(self) -> int:
        return self.k.shape[1]

    @staticmethod
    def init(cfg: LlamaConfig, max_length: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_layers, max_length, cfg.num_kv_heads, cfg.head_dim_)
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    def commit_rows(self, scratch: "KVCache", src_slots: jax.Array,
                    dest_offset) -> "KVCache":
        """Write scratch rows `src_slots` (shape `[P]`, may repeat as
        padding) to the contiguous window `[dest_offset, dest_offset+P)`.
        Source and destination are different buffers, so the update is an
        in-place window write on the main cache — no defensive copy."""
        gk = jnp.take(scratch.k, src_slots, axis=1).astype(self.k.dtype)
        gv = jnp.take(scratch.v, src_slots, axis=1).astype(self.v.dtype)
        k = jax.lax.dynamic_update_slice(self.k, gk, (0, dest_offset, 0, 0))
        v = jax.lax.dynamic_update_slice(self.v, gv, (0, dest_offset, 0, 0))
        return KVCache(k=k, v=v)


class KVCache8(NamedTuple):
    """int8-quantized KV cache: per-row, per-kv-head symmetric scales.

    Decode attention reads the WHOLE static cache every forward, so at batch
    the KV stream rivals the weight stream (measured: 4.3 GB/iteration at
    B=8 for llama-2-7b, ~25% of the batched iteration). int8 rows halve
    that and double the batch that fits in HBM. The dequant multiplies fold
    into attention math exactly: scores * ks[m,h] before softmax, probs *
    vs[m,h] before the value dot — both exact (not approximations of the
    quantized matmul), so the only error is the int8 rounding of k/v rows.

    k/v:   int8 [L, M, Hkv, D]
    ks/vs: f32  [L, M, Hkv]
    """

    k: jax.Array
    v: jax.Array
    ks: jax.Array
    vs: jax.Array

    @property
    def max_length(self) -> int:
        return self.k.shape[1]

    @staticmethod
    def init(cfg: LlamaConfig, max_length: int, dtype=None) -> "KVCache8":
        """`dtype` is accepted (and ignored) for interface parity with
        `KVCache.init` — rows are always int8 with f32 scales."""
        shape = (cfg.num_layers, max_length, cfg.num_kv_heads, cfg.head_dim_)
        sshape = shape[:-1]
        return KVCache8(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            ks=jnp.zeros(sshape, jnp.float32),
            vs=jnp.zeros(sshape, jnp.float32),
        )

    def commit_rows(self, scratch: "KVCache", src_slots: jax.Array,
                    dest_offset) -> "KVCache8":
        """Quantize float scratch rows `src_slots` and write them to the
        contiguous window at `dest_offset` (see `KVCache.commit_rows`).
        Rows are quantized ONCE at commit rather than every verify —
        fewer quantization passes and the tree search itself runs on
        full-precision scratch rows."""
        gk, gks = quantize_kv_rows(jnp.take(scratch.k, src_slots, axis=1))
        gv, gvs = quantize_kv_rows(jnp.take(scratch.v, src_slots, axis=1))
        k = jax.lax.dynamic_update_slice(self.k, gk, (0, dest_offset, 0, 0))
        v = jax.lax.dynamic_update_slice(self.v, gv, (0, dest_offset, 0, 0))
        ks = jax.lax.dynamic_update_slice(self.ks, gks, (0, dest_offset, 0))
        vs = jax.lax.dynamic_update_slice(self.vs, gvs, (0, dest_offset, 0))
        return KVCache8(k=k, v=v, ks=ks, vs=vs)


class KVCache4(NamedTuple):
    """int4-packed KV cache: per-row, per-kv-head symmetric scales.

    Same exact-fold-into-attention scheme as `KVCache8` at half the bytes:
    at serving batch the KV stream is what caps the batch that fits in HBM
    (int8 KV is what let B=16 fit on one v5e chip for llama-2-7b; int4
    doubles that again). 4-bit rows are coarser — acceptance rates should be
    re-measured at this precision (SURVEY.md §7.3, planner inputs are
    precision-dependent).

    Two packings, distinguishable by shape (`shape[-1] == head_dim` <=>
    head-paired); `init(packing=...)` selects, default "auto":

    - "head" (capacity-optimal, the auto default when Hkv is even): the
      byte at `[m, j, d]` holds head `2j`'s value d in the low nibble and
      head `2j+1`'s in the high nibble — the packed minor dimension stays
      the full `head_dim`, so lanes are full at rest and in compute
      (attention splits into even/odd-head dots, core/model.py). The
      head_dim half-split leaves a 64-wide s8 minor dim that XLA's
      (32, 128) tile PADS 2x — the "int4" cache occupied exactly int8's
      HBM (measured: B=96 x M=192 7B serving OOM'd on
      s8[32,96,192,32,64] temps at 2.0x expansion, round 5). Adjacent
      pairing keeps TP head-sharding local — pairs never straddle a shard
      PROVIDED tp divides Hkv/2.
      k/v: int8 [L, M, Hkv/2, D]

    - "dsplit" (TP/odd-head fallback): byte d holds row value d (low) and
      D/2 + d (high) — the KV-HEAD axis stays intact, so GQA targets
      shard at tp > Hkv/2 (llama-2-70b Hkv=8 under tp=8 — reviewer r5);
      costs the 2x minor-dim tile padding on device.
      k/v: int8 [L, M, Hkv, D/2]

    ks/vs: f32 [L, M, Hkv] either way. The engine picks per mesh
    (`SpecEngine._kv4_packing`): head when `(Hkv/2) % tp == 0`, else
    dsplit.
    """

    k: jax.Array
    v: jax.Array
    ks: jax.Array
    vs: jax.Array

    @property
    def max_length(self) -> int:
        return self.k.shape[1]

    @staticmethod
    def init(cfg: LlamaConfig, max_length: int, dtype=None,
             packing: str = "auto") -> "KVCache4":
        assert packing in ("auto", "head", "dsplit"), packing
        if packing == "auto":
            packing = "head" if cfg.num_kv_heads % 2 == 0 else "dsplit"
        if packing == "head":
            assert cfg.num_kv_heads % 2 == 0, \
                "head-paired int4 KV needs an even kv-head count"
            shape = (cfg.num_layers, max_length, cfg.num_kv_heads // 2,
                     cfg.head_dim_)
        else:
            assert cfg.head_dim_ % 2 == 0, \
                "dsplit int4 KV needs an even head_dim"
            shape = (cfg.num_layers, max_length, cfg.num_kv_heads,
                     cfg.head_dim_ // 2)
        sshape = (cfg.num_layers, max_length, cfg.num_kv_heads)
        return KVCache4(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            ks=jnp.zeros(sshape, jnp.float32),
            vs=jnp.zeros(sshape, jnp.float32),
        )

    @property
    def packing(self) -> str:
        # Shape-inferred: head-paired keeps the full head_dim minor dim,
        # dsplit halves it; the scales' head axis is always full Hkv.
        return "head" if self.k.shape[-2] * 2 == self.ks.shape[-1] else "dsplit"

    def commit_rows(self, scratch: "KVCache", src_slots: jax.Array,
                    dest_offset) -> "KVCache4":
        """int4 variant of `KVCache8.commit_rows` (pack at commit time)."""
        pk = self.packing
        gk, gks = quantize_kv_rows4(
            jnp.take(scratch.k, src_slots, axis=1), packing=pk)
        gv, gvs = quantize_kv_rows4(
            jnp.take(scratch.v, src_slots, axis=1), packing=pk)
        k = jax.lax.dynamic_update_slice(self.k, gk, (0, dest_offset, 0, 0))
        v = jax.lax.dynamic_update_slice(self.v, gv, (0, dest_offset, 0, 0))
        ks = jax.lax.dynamic_update_slice(self.ks, gks, (0, dest_offset, 0))
        vs = jax.lax.dynamic_update_slice(self.vs, gvs, (0, dest_offset, 0))
        return KVCache4(k=k, v=v, ks=ks, vs=vs)


def quantize_kv_rows(x: jax.Array):
    """x: float [Q, Hkv, D] -> (int8 rows, f32 scales [Q, Hkv])."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return q, scale


def quantize_kv_rows4(x: jax.Array, packing: str = "head"):
    """x: float [Q, Hkv, D] -> (packed int4 rows, f32 scales [Q, Hkv]).

    `packing="head"`: [Q, Hkv/2, D], low nibble = head 2j, high = 2j+1.
    `packing="dsplit"`: [Q, Hkv, D/2], low nibble = dim d, high = D/2+d.
    Scales stay per (row, head) either way — the quantized VALUES are
    identical across packings, only their arrangement differs, so
    acceptance/quality measurements carry over."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 7.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -7, 7).astype(jnp.int8)
    if packing == "head":
        lo = q[..., 0::2, :] & 0x0F
        hi = q[..., 1::2, :] << 4
    else:
        half = q.shape[-1] // 2
        lo = q[..., :half] & 0x0F
        hi = q[..., half:] << 4
    return (lo | hi).astype(jnp.int8), scale


def unpack_kv_rows4(packed: jax.Array, packing: str = "head") -> jax.Array:
    """head: packed int8 [..., Hkv/2, D] -> values [..., Hkv, D]
    (heads re-interleaved); dsplit: [..., Hkv, D/2] -> [..., Hkv, D].
    Sign-extended either way."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # arithmetic: sign-extends
    hi = jnp.right_shift(packed, 4)
    if packing == "head":
        stacked = jnp.stack([lo, hi], axis=-2)          # [..., Hp, 2, D]
        return stacked.reshape(*packed.shape[:-2], packed.shape[-2] * 2,
                               packed.shape[-1])
    return jnp.concatenate([lo, hi], axis=-1)
