"""Attention-mask construction.

The reference materializes a `2*max_length x 2*max_length` float mask buffer
and slides windows over it (`Tree/Tree.py:20`, `Tree/SpecTree.py:54-58`) — an
O(M^2) host-resident trick. Here masks are small boolean `[Q, max_length]`
arrays generated inside jit from (traced prefix length, static tree
topology): no quadratic buffers, no host transfers.

Slot layout invariant (mirrors the reference, `Tree/SpecTree.py:62,138`):
  - buffer slots `[0, gtl)` hold the committed prefix; slot `gtl - 1` is both
    the last committed token and tree node 0 (the root);
  - tree node `i` lives at slot `ts + i` where `ts = gtl - 1`;
  - a tree-node query attends: all committed slots `< ts`, plus its tree
    ancestors (including the root) via the static growmap ancestor matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_mask(num_queries: int, max_length: int, query_offset=0) -> jax.Array:
    """bool `[Q, M]`: query at slot `query_offset + q` attends slots
    `<= query_offset + q`. Used for prefill (logical position == slot)."""
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (num_queries, max_length), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (num_queries, max_length), 1)
    return k_idx <= (q_idx + query_offset)


def tree_mask_rows(
    ancestor_rows: jax.Array,  # bool [Q, tree_size] — static growmap slice
    tree_start,                # i32 scalar: slot of tree node 0 (= gtl - 1)
    max_length: int,
) -> jax.Array:
    """bool `[Q, M]` for tree-node queries: committed prefix (`k < ts`) OR
    ancestor inside the tree block `[ts, ts + size)`."""
    num_queries = ancestor_rows.shape[0]
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (num_queries, max_length), 1)
    prefix_mask = k_idx < tree_start
    return jax.lax.dynamic_update_slice(prefix_mask, ancestor_rows, (0, tree_start))


def split_tree_masks(
    ancestor_rows,   # bool [Q, tree_size] — static growmap slice (np or jnp)
    tree_start,      # i32 scalar: slot of tree node 0 (= gtl - 1)
    max_length: int,
    root_in_main: bool,
):
    """Masks for the split-cache layout (`core/model.py::forward` with
    `scratch=`): tree-node K/V rows live in a small scratch (slot i = tree
    node i), committed rows in the main cache.

    Returns `(main_mask [Q, M], scratch_mask [Q, S])`:
    - draft grow (`root_in_main=True`): the root's draft K/V was written
      into the main cache at `ts` by the bonus re-draft, so main covers
      `k <= ts` and scratch column 0 is dropped;
    - target verify (`root_in_main=False`): the root's target K/V is
      computed by THIS forward into scratch slot 0 (the row at `ts` is
      stale — the bonus token never went through the target), so main
      covers `k < ts` and scratch keeps column 0.
    """
    ancestor_rows = jnp.asarray(ancestor_rows)
    num_queries = ancestor_rows.shape[0]
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (num_queries, max_length), 1)
    main = (k_idx <= tree_start) if root_in_main else (k_idx < tree_start)
    scratch = ancestor_rows
    if root_in_main:
        scratch = scratch.at[:, 0].set(False)
    return main, scratch


def ancestor_matrix_to_bool(mask_01) -> jax.Array:
    """Growmap `mask` field (`[size, size]` 0/1 ints, row i = ancestors of i
    including itself — `tree_search.py:95-98`) -> bool array."""
    return jnp.asarray(mask_01) != 0
