"""Host-offloaded target serving: weight streaming from TPU-host memory.

TPU-native rebuild of the reference's CPU-offloading backend
(`Engine/offload_engine.py` — SURVEY.md §2.1 "Offload engine"): the
reference detaches per-layer Llama weights into pinned CPU memory
(`:191-209`), keeps the first `stay_layers` on the GPU (`:299-300`), and
double-buffers PCIe copies against compute on a dedicated stream
(`:388-404`) so a Llama-2-70B serves on one 24 GB L40.

Here the same capability is expressed through XLA memory spaces instead of
streams and buffers: streamed layer weights live in the TPU host's pinned
memory (`jax.memory.Space.Host`) and the decode `lax.scan` `device_put`s one
layer at a time into HBM (`core/model.py::_offload_layer_scan`); the XLA
latency-hiding scheduler overlaps layer i+1's DMA with layer i's compute.
Because the streaming happens INSIDE jit, everything composes: the whole
speculative iteration stays one compiled program, `generate_fast`'s
on-device `lax.while_loop` works unchanged, and the engines need no
offload-specific code path at all — `SpecEngine(..., offload_params(p))`
just works.

Quantization composes too: streaming int8/int4 `QuantizedTensor` layers cuts
the host->HBM DMA bytes 2x/4x exactly as it cuts the HBM weight stream —
the combination (quantize AND stream) is strictly more capable than the
reference, which streams fp16 only.

When to use which (one v5e chip, 16 GB HBM):
- target fits in HBM           -> resident weights (fastest)
- target fits quantized        -> `quant/` int8/int4 (llama-2-13b int8)
- target exceeds HBM even int4 -> this module (llama-2-70b on ONE chip)
- multi-chip available         -> `parallel/sharding.py` TP (fastest for
  big targets; offload is the single-chip fallback, exactly the role the
  reference's offloading plays vs its absent multi-GPU support)
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LlamaConfig
from ..core.model import LayerParams, LlamaParams, OffloadLayers
from ..quant.qtensor import QuantizedTensor


def _put(tree, space):
    return jax.tree.map(lambda a: jax.device_put(a, space), tree)


def _put_streamed(tree):
    """Host-stage the big weight tensors; keep sub-3D leaves (the [L, E]
    norm stacks — ~100 KB/layer) device-resident. Mosaic cannot
    dynamic-slice one row out of a bf16 [L, E] HOST-space array (the
    (2, 1) sublane packing pairs rows: "Sublane slicing size not multiple
    of chunk sublane size", measured round 3 — it failed EVERY model
    offload compile on the TPU tunnel); 3-D leaves slice on the untiled
    major axis and stream fine. Streaming norms saved nothing anyway."""
    from jax.memory import Space

    return jax.tree.map(
        lambda a: jax.device_put(
            a, Space.Host if a.ndim >= 3 else Space.Device),
        tree,
    )


def _leaf_on_host(a) -> bool:
    try:
        return "host" in (a.sharding.memory_kind or "")
    except Exception:
        return False


def offload_params(params: LlamaParams, stay_layers: int = 0) -> LlamaParams:
    """Split `params.layers` into `stay_layers` device-resident layers plus a
    host-resident streamed remainder (the reference's `--staylayer` knob,
    `tests/run_sequoia.py:247`). Embedding, final norm, and lm_head stay
    resident (the reference also never streams them). Accepts float or
    quantized layer stacks; leaves may be device arrays or host numpy."""
    from jax.memory import Space

    assert not isinstance(params.layers, OffloadLayers), "already offloaded"
    num_layers = params.layers.attn_norm.shape[0]
    assert 0 <= stay_layers < num_layers, (stay_layers, num_layers)

    def split(leaf):
        return leaf[:stay_layers], leaf[stay_layers:]

    pieces = jax.tree.map(split, params.layers)
    # Plain 2-tuples are the (head, tail) pairs `split` produced; NamedTuple
    # nodes (LayerParams, QuantizedTensor) must still be descended into.
    is_pair = lambda x: type(x) is tuple
    resident = jax.tree.map(lambda p: p[0], pieces, is_leaf=is_pair)
    streamed = jax.tree.map(lambda p: p[1], pieces, is_leaf=is_pair)
    layers = OffloadLayers(
        resident=_put(resident, Space.Device) if stay_layers else None,
        streamed=_put_streamed(streamed),
    )
    return LlamaParams(
        embed=jax.device_put(params.embed, Space.Device),
        layers=layers,
        final_norm=jax.device_put(params.final_norm, Space.Device),
        lm_head=_put(params.lm_head, Space.Device),
    )


def resident_params(params: LlamaParams) -> LlamaParams:
    """Inverse of `offload_params`: bring every layer back into device HBM
    as one stacked `LayerParams` (only possible when it fits, of course)."""
    from jax.memory import Space

    layers = params.layers
    if not isinstance(layers, OffloadLayers):
        return params
    streamed = _put(layers.streamed, Space.Device)
    if layers.resident is None:
        merged = streamed
    else:
        merged = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0),
            layers.resident, streamed,
        )
    return params._replace(layers=merged)


def offloaded_bytes(params: LlamaParams):
    """(host_bytes, device_bytes) for an offloaded (or resident) model."""
    layers = params.layers
    if isinstance(layers, OffloadLayers):
        streamed = jax.tree.leaves(layers.streamed)
        # CPU backend maps Space.Host to plain 'device' memory; fall back
        # to the placement rule (ndim >= 3 streams, see _put_streamed).
        if any(_leaf_on_host(a) for a in streamed):
            on_host = _leaf_on_host
        else:
            on_host = lambda a: a.ndim >= 3
        host = sum(a.size * a.dtype.itemsize for a in streamed if on_host(a))
        dev_leaves = (
            list(jax.tree.leaves(layers.resident or ()))
            + [a for a in streamed if not on_host(a)]
            + [params.embed, params.final_norm]
            + list(jax.tree.leaves(params.lm_head))
        )
    else:
        host = 0
        dev_leaves = jax.tree.leaves(params)
    return host, sum(a.size * a.dtype.itemsize for a in dev_leaves)


def random_offloaded_params(
    cfg: LlamaConfig,
    seed: int = 0,
    *,
    bits: Optional[int] = None,
    dtype=jnp.bfloat16,
    stay_layers: int = 0,
) -> LlamaParams:
    """Random-init an offloaded model WITHOUT ever materializing the full
    stack in HBM: streamed layer stacks are built as host numpy arrays and
    `device_put` straight into the host memory space, so a model larger
    than one chip's HBM (llama-2-70b bf16 = 138 GB of layers) can be
    latency-benchmarked on a single chip. Weight VALUES are arbitrary
    (cheap blocked fill, not a real RNG stream) — latency is
    weight-value independent, which is the same argument `bench.py` runs
    on (its header); use `offload_params(load_hf_checkpoint(...))` for
    real weights."""
    from jax.memory import Space

    E, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    L, H, Hkv, D = cfg.num_layers, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    assert 0 <= stay_layers < L
    rng = np.random.default_rng(seed)
    if dtype == jnp.float32:
        np_dtype = np.float32
    else:
        # numpy bf16 via ml_dtypes (ships with jax): host arrays carry the
        # final dtype so device_put never round-trips through HBM.
        import ml_dtypes

        np_dtype = ml_dtypes.bfloat16

    def host_stack(shape, fan_in, quantize: bool):
        """[L', in, out] host array; one small random block tiled across the
        matrix keeps init O(MB) while avoiding degenerate all-equal rows."""
        Ls, K, N = shape
        scl = min(0.02, 1.0 / math.sqrt(fan_in))
        block = (rng.standard_normal((min(K, 512), min(N, 512))) * scl)
        if not quantize:
            out = np.empty(shape, np_dtype)
            tile = block.astype(np_dtype)
            for i in range(0, K, tile.shape[0]):
                for j in range(0, N, tile.shape[1]):
                    out[:, i : i + tile.shape[0], j : j + tile.shape[1]] = (
                        tile[: K - i, : N - j]
                    )
            return out.astype(np_dtype)
        # int8 / packed-int4, per-out-channel scales (quant/qtensor.py layout)
        qblock = np.clip(
            np.round(block / (np.abs(block).max() / (127 if bits == 8 else 7))),
            -(127 if bits == 8 else 7), 127 if bits == 8 else 7,
        ).astype(np.int8)
        Kq = K if bits == 8 else K // 2
        q = np.empty((Ls, Kq, N), np.int8)
        tile = qblock if bits == 8 else (
            (qblock[: qblock.shape[0] // 2] & 0x0F)
            | ((qblock[qblock.shape[0] // 2 :] & 0x0F) << 4)
        ).astype(np.int8)
        for i in range(0, Kq, tile.shape[0]):
            for j in range(0, N, tile.shape[1]):
                q[:, i : i + tile.shape[0], j : j + tile.shape[1]] = (
                    tile[: Kq - i, : N - j]
                )
        scale = np.full((Ls, 1, N), scl / (127 if bits == 8 else 7), np.float32)
        return QuantizedTensor(q=q, scale=scale)

    quantize = bits is not None

    def mat(shape, fan_in):
        return host_stack(shape, fan_in, quantize)

    norms = np.ones((L, E), np_dtype)
    layers_host = LayerParams(
        attn_norm=norms,
        wq=mat((L, E, H * D), E),
        wk=mat((L, E, Hkv * D), E),
        wv=mat((L, E, Hkv * D), E),
        wo=mat((L, H * D, E), H * D),
        mlp_norm=norms,
        w_gate=mat((L, E, F), E),
        w_up=mat((L, E, F), E),
        w_down=mat((L, F, E), F),
    )

    def split_put(leaf):
        head = jax.device_put(np.ascontiguousarray(leaf[:stay_layers]),
                              Space.Device)
        # sub-3D leaves stay device-resident (see _put_streamed)
        tail_space = Space.Host if leaf.ndim >= 3 else Space.Device
        tail = jax.device_put(np.ascontiguousarray(leaf[stay_layers:]),
                              tail_space)
        return head, tail

    pieces = jax.tree.map(split_put, layers_host)
    is_pair = lambda x: type(x) is tuple
    resident = jax.tree.map(lambda p: p[0], pieces, is_leaf=is_pair)
    streamed = jax.tree.map(lambda p: p[1], pieces, is_leaf=is_pair)

    key = jax.random.PRNGKey(seed)
    k_embed, k_head = jax.random.split(key)
    scl = min(0.02, 1.0 / math.sqrt(E))
    embed = (jax.random.normal(k_embed, (V, E), jnp.float32) * scl).astype(dtype)
    if cfg.tie_word_embeddings:
        lm_head = embed.T
    else:
        lm_head = (
            jax.random.normal(k_head, (E, V), jnp.float32) * scl
        ).astype(dtype)
    return LlamaParams(
        embed=embed,
        layers=OffloadLayers(
            resident=resident if stay_layers else None, streamed=streamed
        ),
        final_norm=jnp.ones((E,), dtype),
        lm_head=lm_head,
    )
