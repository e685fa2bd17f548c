"""Small host-side utilities."""

from __future__ import annotations

import jax
import numpy as np


def hard_sync(tree) -> None:
    """Force completion of every array in `tree` and prove it by fetching one
    element of each to the host.

    `jax.block_until_ready` is NOT a reliable synchronization point on
    remote-TPU tunnels (observed on axon: it can return before the
    computation has executed, making wall-clock timers measure nothing).
    Device-to-host value transfer is a hard barrier on any backend. The
    fetch is one element per leaf, so the transfer cost is a single RTT,
    not proportional to buffer sizes.
    """
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "ravel")]
    probes = [x.ravel()[:1] for x in leaves]
    jax.device_get(probes)


def hard_sync_all_devices() -> None:
    """Barrier on the default device via a trivial round-trip."""
    import jax.numpy as jnp

    jax.device_get(jnp.zeros((1,)) + 1)


def enable_compile_cache(path: str = None) -> None:
    """Persistent compilation cache for CLI entry points. Over the
    remote-TPU tunnel a single jit compile costs 30-90 s and every process
    starts cold — without this, a fresh `cli.chat` run spent ~60 s of its
    'generation' wall-clock compiling (measured round 3: 522 ms/token
    first run vs ~10 with a warm cache). bench.py already did this;
    every CLI should."""
    import os

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.environ.get("SEQUOIA_COMPILE_CACHE",
                                   "/tmp/jax_compile_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def prng_key(seed) -> jax.Array:
    """Engine-wide PRNG key: the XLA `RngBitGenerator` ('rbg') impl.

    The default threefry impl computes random bits in software; the per-level
    Gumbel draws over [B, vocab] logits made it 3.2 ms/iteration of the B=32
    batched spec loop on v5e (23.8 vs 27.0 ms/iteration measured). rbg uses
    the backend's native generator. Key streams differ from threefry, but
    nothing here requires a particular stream — losslessness is
    distributional (SURVEY.md §7.3: no bitwise RNG parity with the torch
    reference either)."""
    return jax.random.key(seed, impl="rbg")


__all__ = ["hard_sync", "hard_sync_all_devices", "prng_key"]
