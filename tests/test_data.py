"""Data layer tests: static-shape padding, offline JSONL formats, MT-Bench
prompt loading, and the chat template (reference `data_converter.py`,
`tests/run_sequoia.py:82,284-297`)."""

import json
import os

import numpy as np
import pytest

from sequoia_tpu.data.datasets import (
    TokenDataset,
    format_inst,
    load_dataset_by_name,
    load_mt_bench_prompts,
    load_pretokenized_jsonl,
)


def test_from_sequences_pads_static():
    ds = TokenDataset.from_sequences([[1, 2, 3], [4], [5, 6]], seq_len=5, pad_id=9)
    assert ds.ids.shape == (3, 5)
    assert ds.ids.dtype == np.int32
    np.testing.assert_array_equal(ds.ids[1], [4, 9, 9, 9, 9])
    np.testing.assert_array_equal(ds.lengths, [3, 1, 2])
    np.testing.assert_array_equal(ds[0], [1, 2, 3])
    assert [len(p) for p in ds] == [3, 1, 2]


def test_from_sequences_truncates():
    ds = TokenDataset.from_sequences([[1, 2, 3, 4, 5]], seq_len=3)
    np.testing.assert_array_equal(ds[0], [1, 2, 3])
    with pytest.raises(AssertionError):
        TokenDataset.from_sequences([[1, 2, 3, 4]], seq_len=3, truncate=False)


def test_select_window():
    ds = TokenDataset.from_sequences([[i] for i in range(10)])
    win = ds.select(3, 6)
    assert len(win) == 3 and win[0][0] == 3


def test_pretokenized_jsonl_roundtrip(tmp_path):
    p = tmp_path / "c4_small.json"
    rows = [{"input_tokens": [1, 20103, 2927, 24750]}, {"input_tokens": [1, 5]}]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ds = load_pretokenized_jsonl(str(p), seq_len=6)
    assert ds.ids.shape == (2, 6)
    np.testing.assert_array_equal(ds[0], rows[0]["input_tokens"])
    # dispatch by prefix and by bare path
    assert len(load_dataset_by_name(f"jsonl:{p}", seq_len=6)) == 2
    assert len(load_dataset_by_name(str(p), seq_len=6)) == 2


def test_mt_bench_prompts(tmp_path):
    p = tmp_path / "mt_bench.jsonl"
    rows = [
        {"question_id": 81, "category": "writing", "turns": ["first", "second"]},
        {"question_id": 82, "category": "writing", "turns": ["third", "fourth"]},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    assert load_mt_bench_prompts(str(p)) == ["first", "third"]
    assert load_mt_bench_prompts(str(p), turn=1) == ["second", "fourth"]


def test_format_inst():
    # Exact template of tests/run_sequoia.py:82.
    assert format_inst("hi") == "[INST]hi[/INST]\n\nASSISTANT:"


def test_unknown_dataset():
    with pytest.raises(KeyError):
        load_dataset_by_name("nope-such-dataset")


REF_DATASET = "/root/reference/dataset"


@pytest.mark.skipif(not os.path.isdir(REF_DATASET),
                    reason="reference artifacts not present")
def test_reference_bundled_c4_small():
    """The reference's actual bundled corpus (`dataset/c4_small.json`,
    consumed by its `data_converter.convert_dataset`, data_converter.py:52-66)
    must load through our offline JSONL path."""
    ds = load_pretokenized_jsonl(
        os.path.join(REF_DATASET, "c4_small.json"), seq_len=256)
    assert len(ds) >= 100
    assert ds.ids.shape[1] == 256
    assert ds.ids.dtype == np.int32
    # Llama-2 vocab range
    assert int(ds.ids.max()) < 32000 and int(ds.ids.min()) >= 0


@pytest.mark.skipif(not os.path.isdir(REF_DATASET),
                    reason="reference artifacts not present")
def test_reference_bundled_arrow_dirs():
    """The reference's `load_from_disk` eval dirs (openwebtext_eval,
    c4_validation — loaded at tests/testbed.py via data_converter) must load
    through our arrow-dir path."""
    pytest.importorskip("datasets")
    from sequoia_tpu.data.datasets import load_arrow_dir

    loaded = 0
    for name in ("openwebtext_eval", "c4_validation"):
        path = os.path.join(REF_DATASET, name)
        try:
            ds = load_arrow_dir(path, seq_len=128)
        except FileNotFoundError:
            # the reference ships c4_validation/ metadata without its .arrow
            continue
        assert len(ds) >= 1
        assert ds.ids.shape[1] == 128
        loaded += 1
    if not loaded:
        pytest.skip("no complete arrow dirs bundled")
