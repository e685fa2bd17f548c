"""Whole-model weight-only quantization."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.model import LayerParams, LlamaParams
from .qtensor import quantize_int4, quantize_int8


def quantize_model(
    params: LlamaParams, bits: int = 8, quantize_lm_head: bool = True
) -> LlamaParams:
    """Quantize all projection matrices (and optionally lm_head) to
    int8/int4 with per-output-channel scales. Norms and the embedding table
    stay in the original dtype (embeddings are a gather, not a matmul)."""
    qfn = {8: quantize_int8, 4: quantize_int4}[bits]
    lp = params.layers
    layers = LayerParams(
        attn_norm=lp.attn_norm,
        wq=qfn(lp.wq),
        wk=qfn(lp.wk),
        wv=qfn(lp.wv),
        wo=qfn(lp.wo),
        mlp_norm=lp.mlp_norm,
        w_gate=qfn(lp.w_gate),
        w_up=qfn(lp.w_up),
        w_down=qfn(lp.w_down),
    )
    return LlamaParams(
        embed=params.embed,
        layers=layers,
        final_norm=params.final_norm,
        lm_head=qfn(params.lm_head) if quantize_lm_head else params.lm_head,
    )


def model_bytes(params: LlamaParams) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def random_quantized_model(cfg, key, bits: int = 8, dtype=jnp.bfloat16) -> LlamaParams:
    """Random-init a model directly into quantized form, one weight stack at
    a time — the full-precision model never materializes on device (a 7B
    bf16 copy plus its int8 copy would exceed one chip's HBM)."""
    import math

    import jax

    from ..core.init import random_params  # noqa: F401 (shape reference)

    qfn = {8: quantize_int8, 4: quantize_int4}[bits]
    E, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    L, H, Hkv, D = cfg.num_layers, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    keys = jax.random.split(key, 10)

    def qinit(k, shape, fan_in):
        @jax.jit
        def make(k):
            w = jax.random.normal(k, shape, jnp.float32) * min(
                0.02, 1.0 / math.sqrt(fan_in)
            )
            return qfn(w)

        return make(k)

    def finit(k, shape, fan_in):
        @jax.jit
        def make(k):
            w = jax.random.normal(k, shape, jnp.float32) * min(
                0.02, 1.0 / math.sqrt(fan_in)
            )
            return w.astype(dtype)

        return make(k)

    layers = LayerParams(
        attn_norm=jnp.ones((L, E), dtype),
        wq=qinit(keys[0], (L, E, H * D), E),
        wk=qinit(keys[1], (L, E, Hkv * D), E),
        wv=qinit(keys[2], (L, E, Hkv * D), E),
        wo=qinit(keys[3], (L, H * D, E), H * D),
        mlp_norm=jnp.ones((L, E), dtype),
        w_gate=qinit(keys[4], (L, E, F), E),
        w_up=qinit(keys[5], (L, E, F), E),
        w_down=qinit(keys[6], (L, F, E), F),
    )
    return LlamaParams(
        embed=finit(keys[7], (V, E), E),
        layers=layers,
        final_norm=jnp.ones((E,), dtype),
        lm_head=qinit(keys[8], (E, V), E),
    )
