"""Planner DP correctness: brute-force cross-check on tiny instances, and
tree-for-tree parity against the reference `tree_search.py` run as a
subprocess on identical inputs."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from sequoia_tpu.planner.dp import (
    choose_tree,
    expected_accepted,
    fill_table,
    materialize,
    plan,
)

REF = "/root/reference"


def test_chain_optimal_when_only_rank1_accepts():
    # p = [0, 0.9]: only one child ever accepted -> optimal tree is a chain.
    p = np.asarray([0.0, 0.9])
    table = fill_table(p, max_budget=6, max_depth=6)
    gm = materialize(table, 6, 6)
    assert gm.size == 6
    assert all(len(s) <= 1 for s in gm.successors)
    assert gm.max_branch == 1
    # expected accepted = 1 + .9 + .9^2 + ... matches the DP value
    expect = sum(0.9 ** i for i in range(6))
    assert abs(table.results[6][6] - expect) < 1e-9
    assert abs(expected_accepted(gm, p) - expect) < 1e-9


def test_table_matches_bruteforce_small():
    """Exhaustive check of T[m][l].max() against brute-force enumeration of
    all trees with m nodes, depth <= l, branch <= len(p)-1."""
    p = np.asarray([0.0, 0.6, 0.25, 0.1])

    from functools import lru_cache

    @lru_cache(maxsize=None)
    def best(m, l):
        # best expected accepted for tree of exactly m nodes, depth <= l
        if m == 1:
            return 1.0
        if l <= 1:
            return -np.inf
        # root has children subtrees: partition m-1 nodes into k ordered
        # subtrees (rank-ordered), k <= max_branch
        def go(remaining, rank):
            if remaining == 0:
                return 0.0
            if rank >= len(p):
                return -np.inf
            out = -np.inf
            for sz in range(1, remaining + 1):
                sub = best(sz, l - 1)
                rest = go(remaining - sz, rank + 1)
                if sub > -np.inf and rest > -np.inf:
                    out = max(out, p[rank] * sub + rest)
            return out

        return 1.0 + go(m - 1, 1)

    table = fill_table(p, max_budget=8, max_depth=5)
    for m in range(1, 9):
        for l in range(1, 6):
            got = table.results[m][l]
            want = best(m, l)
            if want == -np.inf:
                assert got < 0
            else:
                assert abs(got - want) < 1e-9, (m, l, got, want)


def test_expected_accepted_consistent_with_table():
    p = np.asarray([0.0, 0.5, 0.2, 0.1, 0.05])
    table = fill_table(p, max_budget=16, max_depth=6)
    for budget, depth in [(8, 4), (16, 6), (5, 3)]:
        gm = materialize(table, budget, depth)
        assert abs(expected_accepted(gm, p) - table.results[budget][depth]) < 1e-9


@pytest.mark.skipif(
    not os.path.exists(f"{REF}/tree_search.py"), reason="no reference"
)
def test_parity_with_reference_tree_search(tmp_path):
    import torch

    accept_vec = torch.load(
        f"{REF}/acceptance-rate-vector.pt", map_location="cpu", weights_only=False
    )
    p_full = np.asarray(accept_vec, np.float64)
    # The bundled vector was saved on CUDA; tree_search.py loads it without
    # map_location, so hand the subprocess a CPU-saved copy.
    vec_path = str(tmp_path / "accept_vec.pt")
    torch.save(accept_vec.cpu(), vec_path)

    cfg = {
        "acceptance_rate_vector": vec_path,
        "max_depth": 6,
        "max_budget": 24,
        "draft_time": 0.3,
        "valid_budget": [1, 2, 4, 8, 16, 24],
        "target_time": [1.0, 1.02, 1.05, 1.12, 1.25, 1.4],
        "dst": str(tmp_path / "ref_tree.pt"),
    }
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    subprocess.run(
        [sys.executable, "tree_search.py", "--config", cfg_path],
        cwd=REF, check=True, capture_output=True, timeout=300,
    )
    ref = torch.load(cfg["dst"], map_location="cpu", weights_only=False)

    # The reference drops the trailing element of the vector (tree_search.py:14).
    p = p_full[:-1]
    gm, info = plan(
        p, cfg["valid_budget"], cfg["target_time"], cfg["draft_time"],
        max_depth=cfg["max_depth"], max_budget=cfg["max_budget"],
    )
    assert gm.size == ref["size"]
    assert np.array_equal(gm.depth, np.asarray(ref["depth"]))
    # GrowMap strips the reference's trailing zero-width grow step (the
    # reference runtime skips it via `range(draft_step - 1)` instead).
    ref_steps = [
        (list(map(int, r)), list(map(int, b)))
        for r, b in zip(ref["roots"], ref["branches"])
        if sum(map(int, b)) > 0
    ]
    assert gm.roots == [r for r, _ in ref_steps]
    assert gm.branches == [b for _, b in ref_steps]
    assert gm.successors == [list(map(int, s)) for s in ref["Successors"]]
    assert np.array_equal(gm.ancestors.astype(int), np.asarray(ref["mask"]))
