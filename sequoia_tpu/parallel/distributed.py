"""Multi-host bootstrap and hybrid ICI/DCN meshes.

The reference has no distributed layer at all (SURVEY.md §2.3/§5: no
torch.distributed, no NCCL/MPI; its only multi-GPU pathway is HF
`device_map="auto"` in a measurement script). On TPU pods the native stack
is: `jax.distributed.initialize()` once per host process, then a single
global `Mesh` whose inner axis (tensor parallel) maps onto ICI within a
slice and whose outer axis (data parallel / continuous batching) maps onto
DCN across slices. XLA/GSPMD then places all-reduces for the TP matmuls on
ICI and keeps DCN off the per-token critical path — the layout rule from
the scaling playbook: collectives ride ICI, batch rides DCN.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent `jax.distributed.initialize` wrapper. On Cloud TPU the
    arguments are auto-detected from the metadata server; pass them
    explicitly elsewhere. Single-process (1 host) runs skip initialization
    entirely."""
    if num_processes == 1 or (
        coordinator_address is None and jax.process_count() == 1
    ):
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already initialized" not in str(e):
            raise


def hybrid_mesh(tp: Optional[int] = None, dp: Optional[int] = None) -> Mesh:
    """Build a (dp, tp) mesh over all global devices with TP innermost.

    `jax.devices()` orders devices host-major, and within a slice the ICI
    neighbours are contiguous — keeping `tp` as the fastest-varying axis
    puts each TP group inside one slice (ICI), and the `dp` axis spans
    slices/hosts (DCN). Defaults: tp = devices per process (one TP group
    per host's slice), dp = number of processes."""
    devices = np.asarray(jax.devices())
    if tp is None:
        tp = max(1, jax.local_device_count())
    if dp is None:
        dp = devices.size // tp
    assert tp * dp == devices.size, (
        f"tp({tp}) x dp({dp}) != {devices.size} devices"
    )
    return Mesh(devices.reshape(dp, tp), axis_names=("dp", "tp"))


def is_primary() -> bool:
    """True on the process that should write artifacts / print reports."""
    return jax.process_index() == 0
