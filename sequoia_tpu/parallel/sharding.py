"""Tensor-parallel sharding over a TPU mesh.

The reference has NO multi-device parallelism (SURVEY.md §2.3) — its answer
to "target bigger than one device" is PCIe weight streaming
(`Engine/offload_engine.py`). The TPU-native answer is tensor sharding over
ICI: Megatron-style column/row parallel projections, KV cache sharded over
KV heads, logits computed vocab-sharded then replicated. XLA/GSPMD inserts
the (async) collectives from the input shardings alone; attention and KV
compaction stay fully local per shard because the cache length axis is
unsharded (SURVEY.md §7.3 "KV compaction under sharding").

Axes: `tp` shards heads / ffn / vocab; `dp` is reserved for future
continuous batching across hosts (DCN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import LlamaConfig
from ..core.model import LayerParams, LlamaParams
from ..kvcache.cache import KVCache
from ..quant.qtensor import QuantizedTensor, is_tiled


def make_mesh(tp: int, dp: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= tp * dp, f"need {tp * dp} devices, have {devices.size}"
    grid = devices[: tp * dp].reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def check_tp_divisibility(cfg: LlamaConfig, tp: int) -> None:
    assert cfg.num_kv_heads % tp == 0, (cfg.num_kv_heads, tp)
    assert cfg.num_heads % tp == 0
    assert cfg.intermediate_size % tp == 0
    assert cfg.vocab_size % tp == 0


def tp_param_specs(params: LlamaParams) -> LlamaParams:
    """PartitionSpec pytree (matching `params`' structure, including
    quantized leaves) for Megatron-style TP: column-parallel qkv/gate/up
    (shard the output features = heads), row-parallel o/down (shard the
    input features; XLA inserts the all-reduce on the residual add),
    vocab-parallel lm_head.

    For QuantizedTensor leaves the per-out-channel scale shards with the
    output axis on column-parallel weights and is replicated on
    row-parallel weights (the scale has no input axis to shard)."""

    def col(w, ndim):  # shard the last (output) axis
        spec = P(*([None] * (ndim - 1)), "tp")
        if isinstance(w, QuantizedTensor):
            if is_tiled(w):
                # N-panel int4 [..., nt, Kq, bn0]: output features are the
                # PANEL axis (bn0=128 divides every per-shard width —
                # quant/qtensor.py::tile_int4); scale keeps [..., 1, N].
                return QuantizedTensor(
                    q=P(*([None] * (ndim - 2)), "tp", None, None),
                    scale=spec)
            return QuantizedTensor(q=spec, scale=spec)
        return spec

    def row(w, ndim):  # shard the second-to-last (input) axis
        spec = P(*([None] * (ndim - 2)), "tp", None)
        if isinstance(w, QuantizedTensor):
            if is_tiled(w):
                # Input features are plain rows inside each panel (axis -2).
                return QuantizedTensor(
                    q=P(*([None] * (ndim - 1)), "tp", None),
                    scale=P(*([None] * ndim)))
            return QuantizedTensor(q=spec, scale=P(*([None] * ndim)))
        return spec

    lp = params.layers
    layer = LayerParams(
        attn_norm=P(None, None),
        wq=col(lp.wq, 3),
        wk=col(lp.wk, 3),
        wv=col(lp.wv, 3),
        wo=row(lp.wo, 3),
        mlp_norm=P(None, None),
        w_gate=col(lp.w_gate, 3),
        w_up=col(lp.w_up, 3),
        w_down=row(lp.w_down, 3),
    )
    return LlamaParams(
        embed=P(None, None),            # replicated (gather by token id is cheap)
        layers=layer,
        final_norm=P(None),
        lm_head=col(params.lm_head, 2),  # vocab-parallel; logits all-gathered
    )


def tp_kv_spec() -> KVCache:
    """KV cache `[L, M, Hkv, D]` sharded over KV heads — compaction gathers
    along the (unsharded) length axis stay shard-local."""
    return KVCache(k=P(None, None, "tp", None), v=P(None, None, "tp", None))


def shard_params(params: LlamaParams, mesh: Mesh) -> LlamaParams:
    specs = tp_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_kv(kv, mesh: Mesh):
    """Shard a `KVCache` or `KVCache8` over KV heads. Rows `[L, M, Hkv, D]`
    shard on axis 2; int8 per-row scales `[L, M, Hkv]` shard on their last
    axis — compaction gathers stay shard-local either way."""
    def spec_for(leaf):
        if leaf.ndim == 4:
            return P(None, None, "tp", None)
        return P(None, None, "tp")  # [L, M, Hkv] scales

    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec_for(x))), kv
    )


def shard_batched_state(state, mesh: Mesh):
    """Shard a batched `DecodeState` (leading batch axis on every leaf) over
    the `dp` mesh axis; KV head axes additionally shard over `tp`. With the
    batch data-parallel and weights tensor-parallel, each vmapped request's
    tree iteration runs on one dp slice with its TP collectives riding ICI —
    the standard 2-D serving layout the reference never had (SURVEY.md §2.3)."""

    def spec_for(leaf):
        if leaf.ndim == 0:
            return P()
        if leaf.ndim == 5:  # batched KV rows: [L, B, M, Hkv, D] (batch=axis 1,
            return P(None, "dp", None, "tp", None)  # see BatchedSpecEngine)
        if leaf.ndim == 4:  # batched int8/int4-KV scales: [L, B, M, Hkv]
            return P(None, "dp", None, "tp")
        return P("dp", *([None] * (leaf.ndim - 1)))

    multiproc = jax.process_count() > 1

    def put(x):
        sh = NamedSharding(mesh, spec_for(x))
        if multiproc:
            # Multi-host dp: `device_put` rejects shardings with
            # non-addressable devices. Every process computed the full
            # (replicated) state locally, so each can materialize exactly
            # its addressable shards from a host copy. Typed PRNG keys
            # round-trip through their integer key data.
            if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
                impl = jax.random.key_impl(x)
                data = np.asarray(jax.random.key_data(x))
                kd_sh = NamedSharding(
                    mesh, P(*(tuple(spec_for(x)) + (None,))))
                g = jax.make_array_from_callback(
                    data.shape, kd_sh, lambda idx, d=data: d[idx])
                return jax.random.wrap_key_data(g, impl=impl)
            xh = np.asarray(x)
            return jax.make_array_from_callback(
                xh.shape, sh, lambda idx, xh=xh: xh[idx])
        return jax.device_put(x, sh)

    return jax.tree.map(put, state)
