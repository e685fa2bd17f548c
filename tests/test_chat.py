"""Chat runner: streaming API invariants and CLI end-to-end (offline,
token-id mode) — covers the reference chat runners' flow
(`tests/run_sequoia.py`, `tests/greedy_run.py`, `tests/specinfer_run.py`)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.engine.baseline import ARBaseline
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.trees.growmap import uniform_tree


@pytest.fixture(scope="module")
def tiny():
    cfg = get_config("test-tiny")
    draft = random_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = random_params(cfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    return cfg, draft, target


def test_stream_matches_generate(tiny):
    cfg, draft, target = tiny
    gm = uniform_tree(3, 2)
    prompt = np.array([11, 23, 5, 99, 42, 7])
    eng = SpecEngine(draft, cfg, target, cfg, gm, algorithm="greedy",
                     max_length=128, prefill_chunk=16)
    full = eng.generate(prompt, max_new_tokens=24, seed=0)
    eng2 = SpecEngine(draft, cfg, target, cfg, gm, algorithm="greedy",
                      max_length=128, prefill_chunk=16)
    streamed = list(eng2.stream(prompt, max_new_tokens=24, seed=0))
    got = np.concatenate([prompt] + streamed)
    np.testing.assert_array_equal(full, got)
    # every chunk within tree-depth bound, at least 1 token (accept>=0 + bonus)
    assert all(1 <= len(c) <= eng2.max_depth + 1 for c in streamed)


@pytest.mark.parametrize("chunk", [1, 5, 16, 64])
def test_stream_fast_matches_generate(tiny, chunk):
    """Device-resident chunked streaming (one dispatch + one fetch per
    chunk) must commit exactly the sequence `generate_fast` commits, for
    any chunk size, including budgets not divisible by the chunk."""
    cfg, draft, target = tiny
    gm = uniform_tree(3, 2)
    prompt = np.array([11, 23, 5, 99, 42, 7])
    eng = SpecEngine(draft, cfg, target, cfg, gm, algorithm="greedy",
                     max_length=128, prefill_chunk=16)
    full = eng.generate_fast(prompt, max_new_tokens=24, seed=0)
    n_steps = eng.num_large_model_steps
    eng2 = SpecEngine(draft, cfg, target, cfg, gm, algorithm="greedy",
                      max_length=128, prefill_chunk=16)
    streamed = list(eng2.stream_fast(prompt, max_new_tokens=24,
                                     chunk_tokens=chunk, seed=0))
    got = np.concatenate([prompt] + streamed)
    np.testing.assert_array_equal(full, got)
    assert eng2.num_large_model_steps >= n_steps  # chunk budget can only
    # split an iteration's commit across dispatches, never skip one
    assert all(1 <= len(c) <= chunk + eng2.max_depth + 1 for c in streamed)


def test_baseline_stream_matches_generate(tiny):
    cfg, _, target = tiny
    prompt = np.array([3, 1, 4, 1, 5])
    ar = ARBaseline(target, cfg, max_length=64, greedy=True, prefill_chunk=16)
    full = ar.generate(prompt, max_new_tokens=16)
    streamed = np.concatenate([prompt] + list(ar.stream(prompt, max_new_tokens=16)))
    np.testing.assert_array_equal(full, streamed)


def test_chat_cli_spec_and_baseline(capsys):
    from sequoia_tpu.cli.chat import main

    for mode in ["spec", "baseline"]:
        main([
            "--draft", "test-tiny", "--target", "test-tiny", "--mode", mode,
            "--algorithm", "greedy", "--growmap", "chain:4", "--M", "64",
            "--gen", "8", "--dtype", "f32", "--prompts", "synthetic:2,10",
            "--limit", "1",
        ])
        out = capsys.readouterr().out
        assert "total time" in out
        assert "=== prompt 0" in out


def test_chat_cli_quantized(capsys):
    from sequoia_tpu.cli.chat import main

    main([
        "--draft", "test-tiny", "--target", "test-tiny", "--mode", "spec",
        "--algorithm", "sequoia", "--growmap", "tree:2x2", "--M", "64",
        "--gen", "8", "--dtype", "f32", "--prompts", "synthetic:1,10",
        "--quant", "int8",
    ])
    out = capsys.readouterr().out
    assert "per-token latency" in out


def test_byte_tokenizer_roundtrip():
    from sequoia_tpu.data.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    for text in ["hello world", "émojis 🌲 and\nnewlines", ""]:
        ids = tok(text)["input_ids"]
        assert ids[0] == tok.bos_token_id
        assert tok.decode(ids) == text
    # ids outside the byte range are skipped, not crashed on
    assert tok.decode([0, 1, 2, 500, ord("a") + 3]) == "a"


def test_chat_mt_bench_offline_byte_tokenizer(capsys, tmp_path):
    """MT-Bench prompts (bundled reference file) through the chat CLI with
    the offline byte tokenizer — the no-network chat path end to end."""
    import shutil

    from sequoia_tpu.cli.chat import main as chat_main

    src = "/root/reference/tests/dataset/mt_bench.jsonl"
    if not os.path.exists(src):
        pytest.skip("reference mt_bench.jsonl not available")
    data_root = tmp_path / "dataset"
    data_root.mkdir()
    shutil.copy(src, data_root / "mt_bench.jsonl")
    chat_main([
        "--draft", "test-tiny", "--target", "test-tiny",
        "--tokenizer", "byte", "--growmap", "chain:3",
        "--algorithm", "greedy", "--M", "2048", "--gen", "8",
        "--limit", "1", "--data-root", str(data_root),
    ])
    out = capsys.readouterr().out
    assert "accepted tokens per target step" in out
