"""GrowMap loading, validation, and compatibility with reference artifacts."""

import os

import numpy as np
import pytest

from sequoia_tpu.trees.growmap import GrowMap, chain, uniform_tree

REF = "/root/reference"


def test_chain():
    gm = chain(3)
    assert gm.size == 4
    assert gm.level_widths == [1, 1, 1]
    assert gm.level_starts == [1, 2, 3]
    assert np.array_equal(gm.depth, [0, 1, 2, 3])
    assert np.array_equal(gm.ancestors, np.tril(np.ones((4, 4), bool)))
    assert gm.max_branch == 1
    assert np.array_equal(gm.successors_padded()[:, 0], [1, 2, 3, -1])


def test_uniform_tree():
    gm = uniform_tree(2, 2)
    assert gm.size == 7
    assert gm.level_widths == [2, 4]
    assert list(gm.num_children()) == [2, 2, 2, 0, 0, 0, 0]
    assert list(gm.depth) == [0, 1, 1, 2, 2, 2, 2]
    # child_rank: children listed in growth order
    assert list(gm.child_rank()) == [0, 0, 1, 0, 1, 0, 1]


def test_sample_gather_index():
    gm = GrowMap.from_fields(
        size=4,
        roots=[[0], [1, 2]],
        branches=[[2], [1, 0]],
        successors=[[1, 2], [3], [], []],
        ancestors=np.asarray(
            [[1, 0, 0, 0], [1, 1, 0, 0], [1, 0, 1, 0], [1, 1, 0, 1]], bool
        ),
        depth=[0, 1, 1, 2],
    )
    # step 1: roots (1, 2) with branches (1, 0), max_k=1 -> only root 1's
    # first sample used.
    assert list(gm.sample_gather_index(0)) == [0, 1]
    assert list(gm.sample_gather_index(1)) == [0]


def test_json_roundtrip(tmp_path):
    gm = uniform_tree(2, 3)
    path = str(tmp_path / "gm.json")
    gm.to_json(path)
    gm2 = GrowMap.load(path)
    assert gm2.size == gm.size
    assert gm2.roots == gm.roots
    assert np.array_equal(gm2.ancestors, gm.ancestors)


@pytest.mark.skipif(not os.path.exists(f"{REF}/demo_tree.pt"), reason="no reference")
def test_load_reference_demo_tree():
    gm = GrowMap.load(f"{REF}/demo_tree.pt")
    # demo_tree.pt is a size-4 chain (SURVEY.md §2.2).
    assert gm.size == 4
    assert np.array_equal(gm.depth, [0, 1, 2, 3])
    assert np.array_equal(gm.ancestors, np.tril(np.ones((4, 4), bool)))


@pytest.mark.skipif(
    not os.path.isdir(f"{REF}/L40_growmaps"), reason="no reference growmaps"
)
def test_load_reference_library_growmap():
    import glob

    paths = sorted(glob.glob(f"{REF}/L40_growmaps/*.pt"))[:3]
    assert paths
    for p in paths:
        gm = GrowMap.load(p)  # validates internally
        assert gm.size >= 1
        assert sum(gm.level_widths) == gm.size - 1
