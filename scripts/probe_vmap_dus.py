#!/usr/bin/env python
"""Isolate the cost of vmapped per-request KV writes/compaction at batch.

Hypothesis: under vmap, `dynamic_update_slice` with PER-REQUEST start
offsets can't stay a cheap in-place window write — XLA lowers it as a
whole-buffer select (read + write the entire cache), and `jnp.take` with
per-request indices becomes a full gather. At B=32 x llama-2-7b int8 KV
(~2.1 GB) that would add multiple full-cache sweeps per iteration, which
matches the ~47 ms of non-target overhead the bench measured.

Measures, on KV-shaped buffers [B, L, M, H, D]:
  1. DUS of a P-row window at a SHARED offset (vmap over batch, same start)
  2. DUS at PER-REQUEST offsets
  3. take + DUS compaction (per-request slots and offsets) — KVCache.compact
  4. same via one-hot matmul formulation
  5. same via explicit scatter (vmapped row scatter)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args, R=20):
    @jax.jit
    def loop(*args):
        def body(i, carry):
            out = fn(i, *args)
            return carry + out.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / R
    log(f"{name:34s}: {dt * 1e3:8.3f} ms")
    return dt


def main():
    log(f"devices: {jax.devices()}")
    B, L, M, H, D, P = 32, 32, 256, 32, 128, 4
    cache = jnp.zeros((B, L, M, H, D), jnp.int8)
    rows = jnp.ones((B, L, P, H, D), jnp.int8)
    log(f"cache: {cache.nbytes / 1e9:.2f} GB int8, window P={P}")

    off_shared = jnp.full((B,), 100, jnp.int32)
    off_var = (100 + jnp.arange(B, dtype=jnp.int32) % 7)
    slots = jnp.tile(jnp.arange(P, dtype=jnp.int32)[None], (B, 1)) + (
        jnp.arange(B, dtype=jnp.int32)[:, None] % 5)

    def dus(c, r, o):
        return jax.lax.dynamic_update_slice(c, r, (0, o, 0, 0))

    vdus = jax.vmap(dus)
    timed("DUS shared offset", lambda i, c, r: vdus(c, r, off_shared + (i & 0)), cache, rows)
    timed("DUS per-request offset", lambda i, c, r: vdus(c, r, off_var + (i & 0)), cache, rows)

    def compact(c, s, o):
        g = jnp.take(c, s, axis=1)
        return jax.lax.dynamic_update_slice(c, g, (0, o, 0, 0))

    vcompact = jax.vmap(compact)
    timed("take+DUS compact (per-request)",
          lambda i, c: vcompact(c, slots + (i & 0), off_var), cache)

    def compact_scatter(c, s, o):
        # write row j of the gathered block at absolute index o + j
        g = jnp.take(c, s, axis=1)  # [L, P, H, D]
        idx = o + jnp.arange(P, dtype=jnp.int32)
        return c.at[:, idx].set(g)

    vcs = jax.vmap(compact_scatter)
    timed("take+scatter compact (per-req)",
          lambda i, c: vcs(c, slots + (i & 0), off_var), cache)

    def compact_onehot(c, s, o):
        # dest[m] = src[slots[j]] if m == o+j else c[m]
        # one-hot [P, M] over sources; mask [M] over dests
        src_oh = jax.nn.one_hot(s, M, dtype=jnp.int8)          # [P, M]
        dest = o + jnp.arange(P, dtype=jnp.int32)              # [P]
        dest_oh = jax.nn.one_hot(dest, M, dtype=jnp.int8)      # [P, M]
        # gathered rows via matmul: [L, P, H, D]
        g = jnp.einsum("pm,lmhd->lphd", src_oh, c)
        upd = jnp.einsum("pm,lphd->lmhd", dest_oh, g)
        keep = (1 - dest_oh.sum(0))[None, :, None, None]       # [1, M, 1, 1]
        return c * keep + upd

    voh = jax.vmap(compact_onehot)
    timed("onehot-matmul compact (per-req)",
          lambda i, c: voh(c, slots + (i & 0), off_var), cache)

    # The in-model per-layer KV write under vmap: [B, M, H, D] per layer,
    # written Q=1 rows at per-request offsets, 32 layers via scan.
    lcache = jnp.zeros((B, M, H, D), jnp.int8)
    lrow = jnp.ones((B, 1, H, D), jnp.int8)
    vl = jax.vmap(lambda c, r, o: jax.lax.dynamic_update_slice(c, r, (o, 0, 0)))
    timed("per-layer DUS shared",
          lambda i, c, r: vl(c, r, off_shared + (i & 0)), lcache, lrow)
    timed("per-layer DUS per-request",
          lambda i, c, r: vl(c, r, off_var + (i & 0)), lcache, lrow)
    vls = jax.vmap(lambda c, r, o: c.at[o].set(r[0]))
    timed("per-layer scatter per-request",
          lambda i, c, r: vls(c, r, off_var + (i & 0)), lcache, lrow)


if __name__ == "__main__":
    main()
