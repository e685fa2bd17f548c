#!/usr/bin/env python
"""In-model A/B: separate q/k/v/gate/up matmuls vs fused wqkv + w(gate|up).

The layer-proxy ruler (probe_layer_fusion.py) shows 0.629 -> 0.438 ms/layer
from fusing 7 dots to 4 at int8 decode shapes. This probe measures the REAL
llama-2-7b verify forward (width 64) both ways in one process (cross-process
timing on the axon tunnel varies +-20%; within-process A/B is reliable).

The fused forward is a local copy of core.model.forward with
  qkv = x @ wqkv;  split -> q,k,v
  gu  = y @ wgu;   split -> gate, up
(plain [q|k|v] concat order — a column permutation doesn't change timing).
"""

import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.model import (
        KVCache, apply_rope, forward, rms_norm, rope_cos_sin,
    )
    from sequoia_tpu.ops import masks
    from sequoia_tpu.quant.qtensor import QuantizedTensor
    from sequoia_tpu.quant.qtensor import matmul as qmm
    from sequoia_tpu.quant.quantize import random_quantized_model

    log(f"devices: {jax.devices()}")
    cfg = get_config("llama-2-7b")
    t0 = time.perf_counter()
    params = random_quantized_model(cfg, jax.random.PRNGKey(0), bits=8)
    jax.block_until_ready(params.embed)
    log(f"init: {time.perf_counter() - t0:.0f}s")

    lp = params.layers

    def qcat(*ws):
        return QuantizedTensor(
            q=jnp.concatenate([w.q for w in ws], axis=-1),
            scale=jnp.concatenate([w.scale for w in ws], axis=-1),
        )

    wqkv = qcat(lp.wq, lp.wk, lp.wv)
    wgu = qcat(lp.w_gate, lp.w_up)
    jax.block_until_ready((wqkv.q, wgu.q))

    NEG_INF = float("-inf")

    def fused_forward(params, wqkv, wgu, tokens, position_ids, kv,
                      cache_offset, attn_mask):
        Q = tokens.shape[0]
        H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
        G = cfg.q_per_kv
        scale = D ** -0.5
        hidden = params.embed[tokens]
        cos, sin = rope_cos_sin(position_ids, cfg)
        bias = jnp.where(attn_mask, 0.0, NEG_INF).astype(jnp.float32)

        def layer_step(hidden, xs):
            lp, wqkv, wgu, k_cache, v_cache = xs
            x = rms_norm(hidden, lp.attn_norm, cfg.rms_norm_eps)
            qkv = qmm(x, wqkv)                          # [Q, (H+2Hkv)D]
            q = qkv[:, : H * D].reshape(Q, H, D)
            k = qkv[:, H * D: (H + Hkv) * D].reshape(Q, Hkv, D)
            v = qkv[:, (H + Hkv) * D:].reshape(Q, Hkv, D)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            k_cache = jax.lax.dynamic_update_slice(k_cache, k, (cache_offset, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, v, (cache_offset, 0, 0))
            qg = q.reshape(Q, Hkv, G, D)
            scores = jnp.einsum("qhgd,mhd->hgqm", qg, k_cache,
                                preferred_element_type=jnp.float32) * scale
            scores = scores + bias[None, None, :, :]
            probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
            attn = jnp.einsum("hgqm,mhd->qhgd", probs, v_cache)
            attn = attn.reshape(Q, H * D)
            hidden = hidden + qmm(attn, lp.wo)
            y = rms_norm(hidden, lp.mlp_norm, cfg.rms_norm_eps)
            gu = qmm(y, wgu)
            F = cfg.intermediate_size
            mlp = qmm((jax.nn.silu(gu[:, :F]) * gu[:, F:]).astype(y.dtype),
                      lp.w_down)
            hidden = hidden + mlp
            return hidden, (k_cache, v_cache)

        hidden, (new_k, new_v) = jax.lax.scan(
            layer_step, hidden, (params.layers, wqkv, wgu, kv.k, kv.v))
        hidden = rms_norm(hidden, params.final_norm, cfg.rms_norm_eps)
        logits = qmm(hidden, params.lm_head, preferred_element_type=jnp.float32)
        return logits, KVCache(k=new_k, v=new_v)

    # ---- timing harness (value-fetch sync, in-jit reps) ----
    W, M, kv_len, reps = 64, 256, 128, 50
    tokens = jnp.zeros((W,), jnp.int32)
    pos = kv_len + jnp.arange(W, dtype=jnp.int32)
    mask = masks.causal_mask(W, M, kv_len)

    def timed_factory(step_fn):
        def reps_loop(args, kv):
            def body(i, carry):
                kv, acc = carry
                logits, kv = step_fn(args, tokens + (i % 2), pos, kv)
                return (kv, acc + logits[0, 0])
            kv, acc = jax.lax.fori_loop(
                0, reps, body, (kv, jnp.asarray(0.0, jnp.float32)))
            return acc, kv
        return jax.jit(reps_loop, donate_argnums=(1,))

    def sep_step(args, tokens, pos, kv):
        (params,) = args
        return forward(params, cfg, tokens, pos, kv, kv_len, mask)

    def fus_step(args, tokens, pos, kv):
        params, wqkv, wgu = args
        return fused_forward(params, wqkv, wgu, tokens, pos, kv, kv_len, mask)

    for name, step, args in [("sep", sep_step, (params,)),
                             ("fus", fus_step, (params, wqkv, wgu))]:
        f = timed_factory(step)
        for tag in ("warm", "t1", "t2"):
            kv = KVCache.init(cfg, M, jnp.bfloat16)
            jax.block_until_ready(kv.k)
            t0 = time.perf_counter()
            float(f(args, kv)[0])
            dt = (time.perf_counter() - t0) / reps
            if tag != "warm":
                log(f"{name} {tag}: {dt*1e3:7.3f} ms/fwd")

    # correctness: fused == separate logits (same weights, bit-level concat)
    kv1 = KVCache.init(cfg, M, jnp.bfloat16)
    kv2 = KVCache.init(cfg, M, jnp.bfloat16)
    l1, _ = jax.jit(lambda: forward(params, cfg, tokens, pos, kv1, kv_len, mask))()
    l2, _ = jax.jit(lambda: fused_forward(params, wqkv, wgu, tokens, pos, kv2,
                                          kv_len, mask))()
    import numpy as np
    d = np.abs(np.asarray(l1) - np.asarray(l2)).max()
    log(f"max |logit diff| fused vs sep: {d}")


if __name__ == "__main__":
    main()
