"""Parameter initialization and (optional) HuggingFace weight import.

The environment may have no network and no weight cache; random init with the
real model *shapes* is sufficient for latency benchmarking (latency is
weight-value independent) and for all correctness tests (greedy speculative
decoding must exactly reproduce greedy target decoding for *any* weights).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .config import LlamaConfig
from .model import LayerParams, LlamaParams


def random_params(
    cfg: LlamaConfig, key: jax.Array, dtype=jnp.bfloat16, scale: float = 0.02
) -> LlamaParams:
    E, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    L, H, Hkv, D = cfg.num_layers, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    keys = jax.random.split(key, 10)

    def init(k, shape, fan_in):
        # Truncated-normal-ish scaling keeps logits in a sane range for
        # tests. One fused jit per leaf: the eager form allocated an f32
        # [L, E, F] transient per weight (5.8 GB for llama-2-7b w_down),
        # which pushed a 13.5 GB bf16 init over a 16 GB chip.
        s = min(scale, 1.0 / math.sqrt(fan_in))

        @jax.jit
        def _mk(k):
            return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

        return _mk(k)

    layers = LayerParams(
        attn_norm=jnp.ones((L, E), dtype),
        wq=init(keys[0], (L, E, H * D), E),
        wk=init(keys[1], (L, E, Hkv * D), E),
        wv=init(keys[2], (L, E, Hkv * D), E),
        wo=init(keys[3], (L, H * D, E), H * D),
        mlp_norm=jnp.ones((L, E), dtype),
        w_gate=init(keys[4], (L, E, F), E),
        w_up=init(keys[5], (L, E, F), E),
        w_down=init(keys[6], (L, F, E), F),
    )
    embed = init(keys[7], (V, E), E)
    lm_head = embed.T if cfg.tie_word_embeddings else init(keys[8], (E, V), E)
    return LlamaParams(
        embed=embed,
        layers=layers,
        final_norm=jnp.ones((E,), dtype),
        lm_head=lm_head,
    )


def params_from_hf_state_dict(cfg: LlamaConfig, state_dict, dtype=jnp.bfloat16) -> LlamaParams:
    """Convert a HuggingFace Llama `state_dict` (torch CPU tensors or numpy
    arrays) into the stacked-layer layout.

    Note: HF stores projections as `nn.Linear` weights `[out, in]`; we store
    right-multiplied matrices `[in, out]`, hence the transposes.
    """

    def a(t):
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t)

    def stack(fmt: str, transpose: bool):
        mats = [a(state_dict[fmt.format(i=i)]) for i in range(cfg.num_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), dtype)

    layers = LayerParams(
        attn_norm=stack("model.layers.{i}.input_layernorm.weight", False),
        wq=stack("model.layers.{i}.self_attn.q_proj.weight", True),
        wk=stack("model.layers.{i}.self_attn.k_proj.weight", True),
        wv=stack("model.layers.{i}.self_attn.v_proj.weight", True),
        wo=stack("model.layers.{i}.self_attn.o_proj.weight", True),
        mlp_norm=stack("model.layers.{i}.post_attention_layernorm.weight", False),
        w_gate=stack("model.layers.{i}.mlp.gate_proj.weight", True),
        w_up=stack("model.layers.{i}.mlp.up_proj.weight", True),
        w_down=stack("model.layers.{i}.mlp.down_proj.weight", True),
    )
    embed = jnp.asarray(a(state_dict["model.embed_tokens.weight"]), dtype)
    if cfg.tie_word_embeddings or "lm_head.weight" not in state_dict:
        lm_head = embed.T
    else:
        lm_head = jnp.asarray(a(state_dict["lm_head.weight"]).T, dtype)
    return LlamaParams(
        embed=embed,
        layers=layers,
        final_norm=jnp.asarray(a(state_dict["model.norm.weight"]), dtype),
        lm_head=lm_head,
    )


def _read_checkpoint_dir(path: str) -> dict:
    """Collect the full state dict from a HF checkpoint directory, handling
    single-file and sharded layouts for both safetensors and torch `.bin`
    (the reference always loads through `from_pretrained`,
    `Engine/Engine.py:18`; we read the files directly — no torch module is
    ever constructed, so host RAM stays bounded by one shard at a time)."""
    import json as _json
    import os

    sd: dict = {}

    def load_shard(fname: str) -> dict:
        fp = os.path.join(path, fname)
        if fname.endswith(".safetensors"):
            # Load through torch, not numpy: numpy has no bfloat16, and HF
            # checkpoints are typically bf16/fp16.
            from safetensors.torch import load_file

            return load_file(fp)
        import torch

        return torch.load(fp, map_location="cpu", weights_only=True)

    for index_name in ("model.safetensors.index.json", "pytorch_model.bin.index.json"):
        idx = os.path.join(path, index_name)
        if os.path.exists(idx):
            with open(idx) as f:
                weight_map = _json.load(f)["weight_map"]
            for shard in sorted(set(weight_map.values())):
                sd.update(load_shard(shard))
            return sd
    for single in ("model.safetensors", "pytorch_model.bin"):
        if os.path.exists(os.path.join(path, single)):
            return load_shard(single)
    raise FileNotFoundError(f"no model weights found under {path}")


def load_hf_checkpoint(path: str, dtype=jnp.bfloat16):
    """Load a HuggingFace Llama checkpoint directory (config.json +
    safetensors or torch weights, sharded or not) into
    `(LlamaParams, LlamaConfig)`."""
    import os

    from .config import LlamaConfig

    cfg = LlamaConfig.from_json(os.path.join(path, "config.json"))
    sd = _read_checkpoint_dir(path)
    return params_from_hf_state_dict(cfg, sd, dtype=dtype), cfg


def export_hf_checkpoint(params: LlamaParams, cfg: LlamaConfig,
                         path: str) -> None:
    """Inverse of `load_hf_checkpoint`: write `config.json` +
    `model.safetensors` in HuggingFace Llama naming/orientation (Linear
    weights `[out, in]` — the transposes mirror `params_from_hf_state_dict`).
    Checkpoint interop becomes BOTH ways: locally-trained pairs
    (tools/distill.py) run through the CLI's checkpoint path
    (`cli/testbed.py --target-weights <dir>`), and exported models load in
    HF `LlamaForCausalLM` (round-tripped in tests/test_hf_parity.py).
    Float (unquantized, non-offloaded) params only."""
    import json as _json
    import os

    import torch
    from safetensors.torch import save_file

    assert isinstance(params.layers, LayerParams), \
        "export needs plain float LayerParams (dequantize / un-offload first)"
    os.makedirs(path, exist_ok=True)

    def t(x, transpose=False):
        a = np.asarray(jax.device_get(x), np.float32)
        if transpose:
            a = a.T
        return torch.from_numpy(np.ascontiguousarray(a))

    lp = params.layers
    sd = {
        "model.embed_tokens.weight": t(params.embed),
        "model.norm.weight": t(params.final_norm),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = t(lp.attn_norm[i])
        sd[f"{p}.self_attn.q_proj.weight"] = t(lp.wq[i], transpose=True)
        sd[f"{p}.self_attn.k_proj.weight"] = t(lp.wk[i], transpose=True)
        sd[f"{p}.self_attn.v_proj.weight"] = t(lp.wv[i], transpose=True)
        sd[f"{p}.self_attn.o_proj.weight"] = t(lp.wo[i], transpose=True)
        sd[f"{p}.post_attention_layernorm.weight"] = t(lp.mlp_norm[i])
        sd[f"{p}.mlp.gate_proj.weight"] = t(lp.w_gate[i], transpose=True)
        sd[f"{p}.mlp.up_proj.weight"] = t(lp.w_up[i], transpose=True)
        sd[f"{p}.mlp.down_proj.weight"] = t(lp.w_down[i], transpose=True)
    if not cfg.tie_word_embeddings:
        sd["lm_head.weight"] = t(params.lm_head, transpose=True)
    save_file(sd, os.path.join(path, "model.safetensors"))

    cfg_d = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "max_position_embeddings": cfg.max_position_embeddings,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "torch_dtype": "float32",
    }
    if cfg.rope_scaling_factor is not None:
        cfg_d["rope_scaling"] = {
            "rope_type": "llama3",
            "factor": cfg.rope_scaling_factor,
            "low_freq_factor": cfg.rope_scaling_low_freq_factor,
            "high_freq_factor": cfg.rope_scaling_high_freq_factor,
            "original_max_position_embeddings":
                cfg.rope_scaling_original_max_position,
        }
    with open(os.path.join(path, "config.json"), "w") as f:
        _json.dump(cfg_d, f, indent=1)


def param_count(params: LlamaParams) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
