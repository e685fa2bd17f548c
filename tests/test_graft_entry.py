"""Lock the driver entry points: `__graft_entry__.entry()` must stay
jittable single-chip, and `dryrun_multichip(n)` must build a real dp x tp
mesh and execute one full sharded speculative step (the driver validates
these out-of-process; this keeps them from rotting between driver runs)."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft  # noqa: E402


def test_entry_jittable(monkeypatch):
    # Use the smallest preset: the default flagship (1.3b) is too heavy to
    # materialize inside the unit-test budget; entry() honors the env knob.
    monkeypatch.setenv("SEQUOIA_ENTRY_MODEL", "llama-68m")
    fn, example_args = graft.entry()
    out = jax.eval_shape(jax.jit(fn), *example_args)
    logits = jax.tree.leaves(out)[0]
    assert logits.shape[0] == example_args[1].shape[0]  # width rows


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
