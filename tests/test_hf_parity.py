"""HF interop: checkpoint-dir loading + logits parity against transformers.

The reference consumes weights exclusively through HF `from_pretrained`
(`Engine/Engine.py:18`); our loader reads the files directly. Parity of the
full forward against the official `LlamaForCausalLM` on the same weights is
the strongest correctness check available offline — it validates rope,
RMSNorm, GQA head layout, SwiGLU, and the state-dict transposes all at once.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from sequoia_tpu.core.init import load_hf_checkpoint
from sequoia_tpu.kvcache.cache import KVCache
from sequoia_tpu.core.model import forward
from sequoia_tpu.ops import masks


def _make_hf_checkpoint(tmp_path, num_kv_heads, safe_serialization,
                        rope_scaling=None, tie_word_embeddings=False):
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(3)
    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=tie_word_embeddings,
        attn_implementation="eager",
        rope_scaling=rope_scaling,
    )
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    path = tmp_path / "ckpt"
    model.save_pretrained(path, safe_serialization=safe_serialization)
    return model, str(path)


@pytest.mark.parametrize("num_kv_heads", [4, 2])
@pytest.mark.parametrize("safe_serialization", [True, False])
def test_logits_parity(tmp_path, num_kv_heads, safe_serialization):
    model, path = _make_hf_checkpoint(tmp_path, num_kv_heads, safe_serialization)
    params, cfg = load_hf_checkpoint(path, dtype=jnp.float32)
    assert cfg.num_kv_heads == num_kv_heads

    T = 9
    ids = np.array([[5, 7, 99, 13, 1, 64, 100, 2, 77]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits[0].float().numpy()

    tokens = jnp.asarray(ids[0], jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)
    kv = KVCache.init(cfg, 16, jnp.float32)
    mask = masks.causal_mask(T, 16, 0)
    got, _ = forward(params, cfg, tokens, pos, kv, 0, mask)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_logits_parity_llama3_rope_scaling(tmp_path):
    """Llama-3.1/3.2 'llama3' rope scaling + tied embeddings: logits must
    match HF's `_compute_llama3_parameters` path. `original_max_position=16`
    with positions 0..8 puts frequency pairs in all three bands (kept /
    interpolated / factor-scaled), so a band-boundary bug can't cancel out."""
    rope_scaling = {
        "rope_type": "llama3",
        "factor": 32.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 16,
    }
    model, path = _make_hf_checkpoint(
        tmp_path, 2, True, rope_scaling=rope_scaling, tie_word_embeddings=True)
    params, cfg = load_hf_checkpoint(path, dtype=jnp.float32)
    assert cfg.rope_scaling_factor == 32.0
    assert cfg.tie_word_embeddings

    T = 9
    ids = np.array([[5, 7, 99, 13, 1, 64, 100, 2, 77]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits[0].float().numpy()

    tokens = jnp.asarray(ids[0], jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)
    kv = KVCache.init(cfg, 16, jnp.float32)
    mask = masks.causal_mask(T, 16, 0)
    got, _ = forward(params, cfg, tokens, pos, kv, 0, mask)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    # Scaling must actually change the rotation (guard against a silently
    # ignored config field).
    from sequoia_tpu.core.model import rope_inv_freq
    import dataclasses

    unscaled = rope_inv_freq(dataclasses.replace(cfg, rope_scaling_factor=None))
    scaled = rope_inv_freq(cfg)
    assert not np.allclose(np.asarray(unscaled), np.asarray(scaled))


def test_sharded_checkpoint_load(tmp_path):
    model, path = _make_hf_checkpoint(tmp_path, 4, True)
    # Re-save sharded: force a tiny max shard size so the index path is hit.
    model.save_pretrained(path, safe_serialization=True, max_shard_size="100KB")
    params, cfg = load_hf_checkpoint(path, dtype=jnp.float32)
    ref_embed = model.model.embed_tokens.weight.detach().numpy()
    np.testing.assert_allclose(np.asarray(params.embed), ref_embed, rtol=1e-6, atol=1e-6)


def test_export_hf_checkpoint_roundtrip(tmp_path):
    """export_hf_checkpoint -> load_hf_checkpoint reproduces the exact
    params, and the exported directory loads in HF LlamaForCausalLM with
    logits parity — checkpoint interop works BOTH ways (locally-trained
    pairs can run through the CLI's --target-weights path)."""
    from transformers import LlamaForCausalLM

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.init import export_hf_checkpoint, random_params

    cfg = get_config("test-tiny")
    params = random_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    path = str(tmp_path / "export")
    export_hf_checkpoint(params, cfg, path)

    back, cfg2 = load_hf_checkpoint(path, dtype=jnp.float32)
    assert cfg2.hidden_size == cfg.hidden_size
    assert cfg2.num_layers == cfg.num_layers
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)

    # HF side: the exported dir is a valid from_pretrained checkpoint.
    model = LlamaForCausalLM.from_pretrained(path)
    model.eval()
    tokens = np.array([3, 17, 9, 25, 1], np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(tokens[None].astype(np.int64))
                          ).logits[0].float().numpy()
    T = len(tokens)
    kv = KVCache.init(cfg, T, jnp.float32)
    ours, _ = forward(params, cfg, jnp.asarray(tokens),
                      jnp.arange(T, dtype=jnp.int32), kv, 0,
                      masks.causal_mask(T, T, 0))
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               rtol=2e-4, atol=2e-4)
