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

    def compact(self, slots: jax.Array, dest_offset) -> "KVCache":
        """Move rows `slots` (shape `[P]`, any order, may repeat as padding)
        to the contiguous window starting at `dest_offset`.

        Equivalent to the reference `gather_kv_incremental(indices, offset)`
        (`Engine/Llama_KV.py:60-68`) restricted to the accepted-path rows; the
        tail is left stale (masks make it unreachable).
        """
        gathered_k = jnp.take(self.k, slots, axis=1)
        gathered_v = jnp.take(self.v, slots, axis=1)
        k = jax.lax.dynamic_update_slice(self.k, gathered_k, (0, dest_offset, 0, 0))
        v = jax.lax.dynamic_update_slice(self.v, gathered_v, (0, dest_offset, 0, 0))
        return KVCache(k=k, v=v)
