"""Sparse (static-growmap) stochastic accept walk vs the dense reference
implementation: identical decisions and residuals on random trees."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sequoia_tpu.ops.sampling import target_probs
from sequoia_tpu.trees.accept import stochastic_accept, stochastic_accept_dense
from sequoia_tpu.trees.growmap import chain, tree_from_branches, uniform_tree


def _rand_inputs(gm, key, vocab=64):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    size = gm.size
    tl = jax.random.normal(k1, (size, vocab)) * 2
    dl = jax.random.normal(k2, (size, vocab)) * 2
    p = target_probs(tl, 0.9, 0.8)
    tokens = jax.random.randint(k3, (size,), 0, vocab, jnp.int32)
    r = jax.random.uniform(k4, (size,))
    return p, dl, tokens, r


@pytest.mark.parametrize("gm_fn", [lambda: uniform_tree(3, 2),
                                   lambda: uniform_tree(1, 7),
                                   lambda: chain(6),
                                   lambda: uniform_tree(2, 3),
                                   lambda: tree_from_branches(
                                       [[3], [1, 2, 0], [3, 0, 1]])])
@pytest.mark.parametrize("strict,mask", [(True, True), (False, False)])
def test_sparse_matches_dense(gm_fn, strict, mask):
    gm = gm_fn()
    succ = gm.successors_padded()
    for seed in range(5):
        p, dl, tokens, r = _rand_inputs(gm, jax.random.PRNGKey(seed))
        dense = stochastic_accept_dense(
            p, dl, tokens, r, jnp.asarray(succ), 0.8, strict, mask
        )
        sparse = stochastic_accept(p, dl, tokens, r, succ, 0.8, strict, mask)
        np.testing.assert_array_equal(
            np.asarray(dense.accepted_child), np.asarray(sparse.accepted_child)
        )
        np.testing.assert_allclose(
            np.asarray(dense.p_final), np.asarray(sparse.p_final),
            rtol=1e-5, atol=1e-6,
        )


@pytest.mark.parametrize("gm_fn", [lambda: uniform_tree(3, 2),
                                   lambda: uniform_tree(1, 7),
                                   lambda: chain(6),
                                   lambda: uniform_tree(2, 3),
                                   # Heterogeneous sibling-group sizes — the
                                   # shape of every shipped growmap and the
                                   # case the sorted-parent static-prefix
                                   # construction exists for (advisor
                                   # finding, round 2).
                                   lambda: tree_from_branches(
                                       [[3], [1, 2, 0], [3, 0, 1]])])
@pytest.mark.parametrize("strict,mask", [(True, True), (False, False)])
def test_staged_decisions_match_dense(gm_fn, strict, mask):
    """The staged walk (decisions only, sorted-parent static prefixes) must
    produce exactly the dense reference's accepted_child, and node_residual
    must reproduce p_final at the walk's final node (the only row the
    engine reads)."""
    from sequoia_tpu.ops.sampling import draft_probs
    from sequoia_tpu.trees.accept import (
        node_residual,
        resolve_path,
        stochastic_accept_decisions,
    )

    gm = gm_fn()
    succ = gm.successors_padded()
    for seed in range(5):
        p, dl, tokens, r = _rand_inputs(gm, jax.random.PRNGKey(seed))
        dense = stochastic_accept_dense(
            p, dl, tokens, r, jnp.asarray(succ), 0.8, strict, mask
        )
        got = stochastic_accept_decisions(p, dl, tokens, r, succ, 0.8,
                                          strict, mask)
        np.testing.assert_array_equal(np.asarray(dense.accepted_child),
                                      np.asarray(got))
        path = resolve_path(got, tokens, (), gm.size)
        fn = int(path.final_node)
        childs = succ[fn]
        valid = jnp.asarray(childs >= 0)
        ctok = tokens[jnp.asarray(np.where(childs >= 0, childs, 0))]
        q_row = draft_probs(dl[fn][None], 0.8)[0]
        res = node_residual(p[fn], q_row, ctok, valid,
                            mask_rejected_draft=mask)
        np.testing.assert_allclose(np.asarray(res),
                                   np.asarray(dense.p_final[fn]),
                                   rtol=1e-5, atol=1e-6)
