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
    """Random-init a model directly into quantized form, one LAYER at a
    time: each stacked weight is filled through a donated int8 accumulator,
    so the f32 temporary is a single `[in, out]` layer (~0.3 GB at 13B)
    rather than the whole `[L, in, out]` stack (the 13B gate stack alone is
    11.3 GB f32 — materializing it next to the growing quantized model
    OOMed a 16 GB v5e)."""
    import functools
    import math

    import jax

    from ..core.init import random_params  # noqa: F401 (shape reference)
    from .qtensor import QuantizedTensor

    qfn = {8: quantize_int8, 4: quantize_int4}[bits]
    E, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    L, H, Hkv, D = cfg.num_layers, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    keys = jax.random.split(key, 10)

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("scl",))
    def _fill_layer(qb, sb, k, i, scl):
        K_, N_ = qb.shape[-2] * (1 if bits == 8 else 2), qb.shape[-1]
        w = jax.random.normal(k, (K_, N_), jnp.float32) * scl
        qt = qfn(w)
        qb = jax.lax.dynamic_update_slice(qb, qt.q[None], (i, 0, 0))
        sb = jax.lax.dynamic_update_slice(sb, qt.scale[None], (i, 0, 0))
        return qb, sb

    def qinit(k, shape, fan_in):
        scl = min(0.02, 1.0 / math.sqrt(fan_in))
        if len(shape) == 2:  # lm_head — single matrix, no stacking needed
            @jax.jit
            def make(k):
                w = jax.random.normal(k, shape, jnp.float32) * scl
                return qfn(w)

            return make(k)
        L_, K_, N_ = shape
        Kq = K_ if bits == 8 else K_ // 2
        qb = jnp.zeros((L_, Kq, N_), jnp.int8)
        sb = jnp.zeros((L_, 1, N_), jnp.float32)
        for i, lk in enumerate(jax.random.split(k, L_)):
            qb, sb = _fill_layer(qb, sb, lk, jnp.asarray(i, jnp.int32), scl)
        return QuantizedTensor(q=qb, scale=sb)

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
