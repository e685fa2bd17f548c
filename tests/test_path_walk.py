"""Path-following walk == staged decisions pipeline.

`stochastic_path_walk` must reproduce, for the SAME inputs, exactly what
the engine's staged pipeline (`stochastic_accept_decisions` +
`resolve_path` + `node_residual`) produces along the accepted path: the
path itself, the final node, terminal flag, and the bonus distribution.
This equivalence is what transfers the Monte-Carlo losslessness evidence
(tests/test_lossless.py) to the path walk."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.ops.sampling import draft_probs, nucleus_cutoff, target_probs
from sequoia_tpu.trees.accept import (
    node_residual,
    resolve_path,
    stochastic_accept_decisions,
    stochastic_path_walk,
    stochastic_path_walk_node,
    stochastic_path_walk_unrolled,
)
from sequoia_tpu.trees.growmap import uniform_tree


def _random_tree(rng, size):
    """Random topology: each node's parent drawn among earlier nodes.
    Returns (successors_padded [size, max_branch], max_depth)."""
    parents = [-1] + [int(rng.integers(0, i)) for i in range(1, size)]
    children = [[] for _ in range(size)]
    depth = [0] * size
    for i in range(1, size):
        children[parents[i]].append(i)
        depth[i] = depth[parents[i]] + 1
    mb = max(1, max(len(c) for c in children))
    succ = np.full((size, mb), -1, np.int32)
    for i, ch in enumerate(children):
        succ[i, : len(ch)] = ch
    return succ, max(depth)


def _staged(p, dl, tokens, r, succ, temp, stop, max_depth, strict, mask):
    accepted = stochastic_accept_decisions(
        p, dl, tokens, r, succ, temp, strict=strict, mask_rejected_draft=mask)
    path = resolve_path(accepted, tokens, stop, max_depth)
    fn = path.final_node
    q_row = draft_probs(dl[fn][None], temp)[0]
    succ_d = jnp.asarray(succ)
    childs = succ_d[fn]
    valid = childs >= 0
    ctok = tokens[jnp.where(valid, childs, 0)]
    res = node_residual(p[fn], q_row, ctok, valid, mask_rejected_draft=mask)
    return path, res


@pytest.mark.parametrize("strict,mask", [(True, True), (False, False)])
@pytest.mark.parametrize("top_p", [0.9, 1.0])
def test_matches_staged_pipeline(strict, mask, top_p):
    rng = np.random.default_rng(11)
    temp = 0.8
    V = 64
    for trial in range(24):
        size = int(rng.integers(4, 24))
        succ, max_depth = _random_tree(rng, size)
        max_depth = max(max_depth, 1)
        tl = jnp.asarray(rng.standard_normal((size, V)) * 2, jnp.float32)
        dl = jnp.asarray(rng.standard_normal((size, V)) * 2, jnp.float32)
        tokens = jnp.asarray(rng.integers(0, V, size), jnp.int32)
        r = jnp.asarray(rng.random(size), jnp.float32)
        stop = (V - 1,)

        p = target_probs(tl, top_p, temp)
        path, res = _staged(p, dl, tokens, r, succ, temp, stop, max_depth,
                            strict, mask)
        cut = nucleus_cutoff(tl, top_p, temp)
        for walk_fn in (stochastic_path_walk, stochastic_path_walk_node,
                        stochastic_path_walk_unrolled):
            walk = walk_fn(
                tl, dl, tokens, r, succ, temp, cut, stop, max_depth,
                strict=strict, mask_rejected_draft=mask)

            assert int(walk.accept_count) == int(path.accept_count), trial
            assert int(walk.final_node) == int(path.final_node), trial
            assert bool(walk.terminal) == bool(path.terminal), trial
            np.testing.assert_array_equal(np.asarray(walk.path),
                                          np.asarray(path.path))
            got = np.asarray(walk.p_final_row)
            want = np.asarray(res)
            if np.isnan(want).any():
                assert np.isnan(got).any()
            elif not bool(path.terminal):
                # Bonus distribution only consumed when non-terminal.
                np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_stop_token_terminates_walk():
    """A stop-token child that gets accepted must end the walk with
    terminal=True and not descend further."""
    rng = np.random.default_rng(3)
    V = 32
    # chain 0 -> 1 -> 2
    succ = np.asarray([[1], [2], [-1]], np.int32)
    tokens = jnp.asarray([5, V - 1, 7], jnp.int32)  # node 1 = stop token
    tl = jnp.asarray(rng.standard_normal((3, V)), jnp.float32)
    # Make node-1's token overwhelmingly likely under the target and draft
    # so it is accepted surely.
    tl = tl.at[0, V - 1].set(50.0)
    dl = tl
    r = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    cut = nucleus_cutoff(tl, 1.0, 1.0)
    walk = stochastic_path_walk(tl, dl, tokens, r, succ, 1.0, cut, (V - 1,),
                                2, strict=True, mask_rejected_draft=True)
    assert bool(walk.terminal)
    assert int(walk.accept_count) == 1
    assert int(walk.final_node) == 1


@pytest.mark.parametrize("algo", ["sequoia", "specinfer"])
def test_engine_path_vs_staged_same_tokens(algo):
    """Full engine: walk='path', walk='node', and walk='staged' must emit
    identical token sequences for the same seed (same PRNG splits, same
    decisions, same bonus distribution)."""
    cfg = get_config("test-tiny")
    draft = random_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = random_params(cfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    prompt = np.array([11, 23, 5, 99, 42, 7])
    gm = uniform_tree(3, 2)
    kw = dict(algorithm=algo, max_length=128, temperature=0.7, top_p=0.9,
              prefill_chunk=16)
    out_p = SpecEngine(draft, cfg, target, cfg, gm, walk="path", **kw
                       ).generate(prompt, max_new_tokens=30, seed=0)
    out_n = SpecEngine(draft, cfg, target, cfg, gm, walk="node", **kw
                       ).generate(prompt, max_new_tokens=30, seed=0)
    out_s = SpecEngine(draft, cfg, target, cfg, gm, walk="staged", **kw
                       ).generate(prompt, max_new_tokens=30, seed=0)
    out_u = SpecEngine(draft, cfg, target, cfg, gm, walk="unrolled", **kw
                       ).generate(prompt, max_new_tokens=30, seed=0)
    np.testing.assert_array_equal(out_p, out_s)
    np.testing.assert_array_equal(out_n, out_s)
    np.testing.assert_array_equal(out_u, out_s)
