"""Hybrid mesh construction on the virtual CPU device mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sequoia_tpu.parallel.distributed import (
    hybrid_mesh,
    initialize_distributed,
    is_primary,
)


def test_hybrid_mesh_shapes():
    n = len(jax.devices())
    mesh = hybrid_mesh(tp=n)
    assert dict(mesh.shape) == {"dp": 1, "tp": n}
    if n >= 2 and n % 2 == 0:
        mesh = hybrid_mesh(tp=n // 2, dp=2)
        assert dict(mesh.shape) == {"dp": 2, "tp": n // 2}
        # TP fastest-varying: first TP group is the first n//2 devices.
        first_group = list(mesh.devices[0])
        assert [d.id for d in first_group] == [d.id for d in jax.devices()[: n // 2]]


def test_mismatched_factors_rejected():
    n = len(jax.devices())
    with pytest.raises(AssertionError):
        hybrid_mesh(tp=n + 1, dp=1)


def test_single_process_init_noop():
    initialize_distributed(num_processes=1)  # must not raise
    assert is_primary()
