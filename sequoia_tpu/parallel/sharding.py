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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import LlamaConfig
from ..core.model import LayerParams, LlamaParams
from ..kvcache.cache import KVCache


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


def tp_param_specs() -> LlamaParams:
    """PartitionSpec pytree for Megatron-style TP:
    column-parallel qkv/gate/up (shard the output features = heads),
    row-parallel o/down (shard the input features; XLA inserts the
    all-reduce on the residual add), vocab-parallel lm_head."""
    layer = LayerParams(
        attn_norm=P(None, None),
        wq=P(None, None, "tp"),
        wk=P(None, None, "tp"),
        wv=P(None, None, "tp"),
        wo=P(None, "tp", None),
        mlp_norm=P(None, None),
        w_gate=P(None, None, "tp"),
        w_up=P(None, None, "tp"),
        w_down=P(None, "tp", None),
    )
    return LlamaParams(
        embed=P(None, None),       # replicated (gather by token id is cheap)
        layers=layer,
        final_norm=P(None),
        lm_head=P(None, "tp"),     # vocab-parallel; logits all-gathered
    )


def tp_kv_spec() -> KVCache:
    """KV cache `[L, M, Hkv, D]` sharded over KV heads — compaction gathers
    along the (unsharded) length axis stay shard-local."""
    return KVCache(k=P(None, None, "tp", None), v=P(None, None, "tp", None))


def shard_params(params: LlamaParams, mesh: Mesh) -> LlamaParams:
    specs = tp_param_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, jax.Array) or hasattr(x, "shape"),
    )


def shard_kv(kv: KVCache, mesh: Mesh) -> KVCache:
    specs = tp_kv_spec()
    return KVCache(
        k=jax.device_put(kv.k, NamedSharding(mesh, specs.k)),
        v=jax.device_put(kv.v, NamedSharding(mesh, specs.v)),
    )
