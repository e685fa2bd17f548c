"""Speculative-decoding engine: growmap-driven tree growth + one-pass tree
verification + device-side accept walk, as a single jitted iteration.

Control flow mirrors the reference outer loop (`tests/testbed.py`
`simulation_fast` -> `construct_grow_map()` / `verify()`,
`Tree/SpecTree.py:88-281`), but the per-iteration work — every draft growth
level, the target verify forward, the accept walk, KV compaction, committed-
token writes, and the bonus re-draft — is ONE `jax.jit` call. The host syncs
on two scalars per iteration (emitted count, terminal flag); the reference
syncs once per tree edge plus once per CUDA-graph replay.

Slot/step invariants (steady state, identical to the reference):
- committed tokens occupy slots `[0, gtl)`; tree node i sits at slot
  `ts + i`, `ts = gtl - 1` (root = last committed token);
- the target verify forward always has width `tree_size`, covering slots
  `[ts, ts + size)` (the reference reaches the same width via
  `target_kv_len = len(accept_list)`, `Tree/SpecTree.py:179-192`);
- after acceptance, accepted rows are compacted down in both KV caches
  (`gather_kv_incremental` semantics) and a width-1 draft forward on the
  bonus token re-seeds the next root's draft logits
  (`prepare_for_next_iter`, `Tree/SpecTree.py:261-281`).

Static shapes throughout: one compile per (growmap, prompt-bucket).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LlamaConfig
from ..core.model import LlamaParams, forward
from ..kvcache.cache import KVCache, KVCache4, KVCache8
from ..ops import masks
from ..utils import prng_key
from ..ops.sampling import (
    draft_probs,
    nucleus_cutoff,
    sample_argmax,
    sample_categorical_probs,
    sample_with_replacement,
    sample_without_replacement,
    target_probs,
    wor_from_gumbel,
)
from ..trees.accept import (
    AcceptResult,
    PathResult,
    node_residual,
    resolve_path,
    stochastic_accept_decisions,
    stochastic_path_walk,
    stochastic_path_walk_node,
    stochastic_path_walk_unrolled,
    token_match_accept,
)
from ..trees.growmap import GrowMap

ALGORITHMS = ("sequoia", "specinfer", "greedy", "greedys")


class DecodeState(NamedTuple):
    tokens: jax.Array             # i32 [max_length] committed + live tree slots
    gtl: jax.Array                # i32 committed length (root = slot gtl-1)
    draft_kv: KVCache
    target_kv: KVCache
    root_draft_logits: jax.Array  # f32 [vocab] draft dist at the root
    key: jax.Array                # PRNG key
    terminal: jax.Array           # bool


class StepStats(NamedTuple):
    emitted: jax.Array     # i32 tokens committed this iteration (accepted + bonus)
    terminal: jax.Array    # bool
    first_rank: jax.Array  # i32 sibling rank of the first accepted child, or -1
                           # (drives dynamic acceptance-vector measurement,
                           # the SpecTreeTest `b` return, Tree/SpecTree.py:479)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class SpecEngine:
    """Single-request speculative decoding over a static growmap."""

    def __init__(
        self,
        draft_params: LlamaParams,
        draft_cfg: LlamaConfig,
        target_params: LlamaParams,
        target_cfg: LlamaConfig,
        growmap: GrowMap,
        *,
        algorithm: str = "sequoia",
        max_length: int = 256,
        temperature: float = 0.6,
        top_p: float = 0.9,
        prefill_chunk: int = 128,
        mesh=None,
        shard_draft: bool = False,
        kv_quant: Optional[str] = None,
        walk: str = "node",
    ) -> None:
        assert algorithm in ALGORITHMS, algorithm
        assert walk in ("path", "node", "unrolled", "staged"), walk
        # Stochastic accept-walk implementation, A/B-measured on the 7B
        # bf16 pair at S=96 (scripts/ablate7b.py, round 5): "node" (default)
        # = one while trip per VISITED node, iteration overhead 0.547 ms;
        # "path" = per-tested-edge trips, 0.689 ms; "staged" = batched
        # sorted-parent decisions (~size row ops), 1.006 ms; "unrolled" =
        # node walk flattened to max_depth+1 predicated resolutions with no
        # while_loop, 1.446 ms — the always-paid max_branch*(depth+1)
        # full-vocab row updates cost MORE than the loop's per-trip fixed
        # cost (measured negative result; kept for the record). At 13B
        # node-vs-path measured a wash (round-4 commit 0217621).
        self.walk = walk
        # Measurement-only ablation switches (scripts/ablate7b.py): a
        # frozenset over {"fixed_walk", "no_redraft"} that stubs pieces of
        # finalize so phase costs can be differenced INSIDE the full fused
        # iteration (standalone phase loops over-measure, and custom loop
        # bodies change XLA's layout choices — the 7B ablation OOM'd on
        # 3 GB of relayout copies). Never set in production paths.
        self._ablate = frozenset()
        assert kv_quant in (None, "none", "int8", "int4"), kv_quant
        assert draft_cfg.vocab_size == target_cfg.vocab_size
        if algorithm in ("sequoia", "specinfer", "greedys"):
            assert temperature > 0.0, "stochastic algorithms need T > 0"
        self.draft_params = draft_params
        self.target_params = target_params
        self.draft_cfg = draft_cfg
        self.target_cfg = target_cfg
        self.growmap = growmap
        self.algorithm = algorithm
        self.max_length = max_length
        self.temperature = temperature
        self.top_p = top_p
        self.prefill_chunk = min(prefill_chunk, max_length)
        self.vocab = target_cfg.vocab_size
        self.stop_tokens = tuple(target_cfg.stop_tokens)
        # Optional tensor parallelism: caller passes TP-sharded params (see
        # parallel/sharding.py); the engine shards the KV caches to match and
        # GSPMD propagates through the jitted iteration.
        self.mesh = mesh
        self.shard_draft = shard_draft
        # Optional int8/int4 target KV cache (per-row scales, kvcache/cache.py
        # KVCache8/KVCache4): halves/quarters the decode-attention HBM stream,
        # which rivals the weight stream at batch (and caps the batch that
        # fits in HBM). Draft KV stays float (it is tiny).
        self.kv_quant = None if kv_quant == "none" else kv_quant
        # int4 packing: head-paired (capacity-true — full-lane minor dim)
        # whenever it still SHARDS under the mesh; the dsplit layout keeps
        # the kv-head axis intact for GQA targets at tp > Hkv/2
        # (llama-2-70b Hkv=8 under tp=8 — reviewer r5) at the cost of 2x
        # s8 tile padding. See kvcache/cache.py::KVCache4.
        self._kv4_packing = "head"
        if self.kv_quant == "int4":
            Hkv = target_cfg.num_kv_heads
            tp_sz = (mesh.shape.get("tp", 1) if mesh is not None else 1)
            if Hkv % 2 != 0 or (Hkv // 2) % tp_sz != 0:
                self._kv4_packing = "dsplit"
        if mesh is not None:
            from ..parallel.sharding import check_tp_divisibility

            check_tp_divisibility(target_cfg, mesh.shape["tp"])
            if shard_draft:
                check_tp_divisibility(draft_cfg, mesh.shape["tp"])

        gm = growmap
        self.tree_size = gm.size
        self.max_depth = int(gm.depth.max()) if gm.size > 1 else 0
        # Static device constants for the jitted iteration.
        self._anc = jnp.asarray(gm.ancestors)
        self._succ_np = gm.successors_padded()  # static: sparse accept walk
        self._succ = jnp.asarray(self._succ_np)
        self._depth = jnp.asarray(gm.depth, jnp.int32)
        self._child_rank = jnp.asarray(gm.child_rank())
        self._level_roots = [jnp.asarray(r, jnp.int32) for r in gm.roots]
        self._level_gather = [jnp.asarray(gm.sample_gather_index(i)) for i in range(gm.num_grow_steps)]
        self._level_widths = gm.level_widths
        self._level_starts = gm.level_starts
        self._level_max_k = [max(b) for b in gm.branches]

        self._iterate = jax.jit(self._iterate_impl, donate_argnums=(2,))
        self._prefill_chunk_fn = jax.jit(self._prefill_chunk_impl, donate_argnums=(2,))
        self._generate_loop = jax.jit(self._generate_loop_impl, donate_argnums=(2,))
        # Phased path (benchmark mode): same impl pieces, jitted separately
        # so each phase can be timed with a hard host sync. No donation —
        # phases share the incoming state.
        self._grow_fn = jax.jit(self._grow_impl)
        self._target_fn = jax.jit(self._target_impl)
        self._finalize_fn = jax.jit(self._finalize_impl)
        # Counters (reference metric: tests/testbed.py:94).
        self.num_decoding_steps = 0
        self.num_large_model_steps = 0

    # ------------------------------------------------------------------
    # Prefill
    # ------------------------------------------------------------------

    def _fresh_state(self, key: jax.Array, kv_dtype) -> DecodeState:
        # Each cache takes ITS model's compute dtype (the embed dtype, which
        # sets the activation dtype k/v are produced in) — a f32 draft paired
        # with a bf16/quantized target must not inherit the target's dtype.
        draft_kv = KVCache.init(
            self.draft_cfg, self.max_length, self.draft_params.embed.dtype)
        if self.kv_quant == "int4":
            target_kv = KVCache4.init(self.target_cfg, self.max_length,
                                      kv_dtype, packing=self._kv4_packing)
        else:
            target_cache_cls = {"int8": KVCache8, None: KVCache}[self.kv_quant]
            target_kv = target_cache_cls.init(
                self.target_cfg, self.max_length, kv_dtype)
        if self.mesh is not None:
            from ..parallel.sharding import shard_kv

            target_kv = shard_kv(target_kv, self.mesh)
            if self.shard_draft:
                draft_kv = shard_kv(draft_kv, self.mesh)
        return DecodeState(
            tokens=jnp.zeros((self.max_length,), jnp.int32),
            gtl=jnp.asarray(0, jnp.int32),
            draft_kv=draft_kv,
            target_kv=target_kv,
            root_draft_logits=jnp.zeros((self.vocab,), jnp.float32),
            key=key,
            terminal=jnp.asarray(False),
        )

    def _prefill_chunk_impl(
        self,
        draft_params: LlamaParams,
        target_params: LlamaParams,
        state: DecodeState,
        chunk_tokens: jax.Array,  # i32 [C]
        offset,                   # i32 scalar
        prompt_len,               # i32 scalar
    ) -> DecodeState:
        C = chunk_tokens.shape[0]
        positions = offset + jnp.arange(C, dtype=jnp.int32)
        mask = masks.causal_mask(C, self.max_length, offset)
        d_logits, draft_kv = forward(
            draft_params, self.draft_cfg, chunk_tokens, positions,
            state.draft_kv, offset, mask,
        )
        _, target_kv = forward(
            target_params, self.target_cfg, chunk_tokens, positions,
            state.target_kv, offset, mask,
        )
        # Track the draft logits at the prompt's last token (the root).
        last_in_chunk = prompt_len - 1 - offset
        in_chunk = (last_in_chunk >= 0) & (last_in_chunk < C)
        idx = jnp.clip(last_in_chunk, 0, C - 1)
        root_logits = jnp.where(
            in_chunk, jax.lax.dynamic_index_in_dim(d_logits, idx, keepdims=False),
            state.root_draft_logits,
        )
        tokens = jax.lax.dynamic_update_slice(state.tokens, chunk_tokens, (offset,))
        return state._replace(
            tokens=tokens,
            draft_kv=draft_kv,
            target_kv=target_kv,
            root_draft_logits=root_logits,
            gtl=jnp.minimum(offset + C, prompt_len),
        )

    def prefill(self, prompt: np.ndarray, seed: int = 0) -> DecodeState:
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        plen = len(prompt)
        assert 1 <= plen
        assert plen + self.tree_size <= self.max_length, "prompt too long for max_length"
        key = prng_key(seed)
        state = self._fresh_state(key, self.target_params.embed.dtype)
        C = self.prefill_chunk
        # Chunk coverage is capped at max_length: writing a chunk whose end
        # passes the buffer would make dynamic_update_slice CLAMP the start
        # and silently shift-overwrite committed rows (possible whenever
        # max_length is not a chunk multiple; reviewer r5). The tail chunk
        # shrinks instead — each distinct size compiles once.
        padded_len = min(_round_up(plen, C), self.max_length)
        padded = np.zeros(padded_len, np.int32)
        padded[:plen] = prompt
        plen_dev = jnp.asarray(plen, jnp.int32)
        off = 0
        while off < plen:
            c = min(C, padded_len - off)
            state = self._prefill_chunk_fn(
                self.draft_params, self.target_params, state,
                jnp.asarray(padded[off : off + c]), jnp.asarray(off, jnp.int32),
                plen_dev,
            )
            off += c
        return state._replace(gtl=plen_dev)

    # ------------------------------------------------------------------
    # One speculative iteration (grow + verify + accept + compact + re-draft)
    # ------------------------------------------------------------------

    def _draft_grow_sample(self, key, level, logits_roots, gumbel_rows=None):
        """Sample children for one growth level. Returns flat new tokens
        `[level_width]` in node order (`collective_grow_static` sampling,
        `Tree/SpecTree.py:103-104`). `gumbel_rows` carries pre-drawn noise
        for the WOR race (one rbg call per growth, see `wor_from_gumbel`)."""
        max_k = self._level_max_k[level]
        if self.algorithm == "sequoia":
            if gumbel_rows is not None:
                samples = wor_from_gumbel(
                    logits_roots, gumbel_rows, self.temperature, max_k)
            else:
                samples = sample_without_replacement(
                    key, logits_roots, self.temperature, max_k)
        elif self.algorithm == "specinfer":
            samples = sample_with_replacement(key, logits_roots, self.temperature, max_k)
        else:  # greedy growth by top-k logits (testbed_greedy / greedyS)
            samples = sample_argmax(logits_roots, max_k)
        return samples.reshape(-1)[self._level_gather[level]].astype(jnp.int32)

    def _grow_impl(self, draft_params, state: DecodeState):
        """Draft tree growth, level by level (static unroll). Tree-node K/V
        rows go into a small scratch (`[L, size, Hkv, D]`, slot i = node i)
        while the main draft cache stays READ-ONLY — see
        `core/model.py::forward` split mode for why this matters. Returns
        `(tokens_tree, draft_logits, tokens_buf, draft_scratch, key)`."""
        gm_size = self.tree_size
        ts = state.gtl - 1  # slot of tree node 0
        key = state.key
        M = self.max_length

        draft_logits = jnp.zeros((gm_size, self.vocab), jnp.float32)
        draft_logits = draft_logits.at[0].set(state.root_draft_logits)
        tokens_tree = jnp.zeros((gm_size,), jnp.int32)
        tokens_tree = tokens_tree.at[0].set(
            jax.lax.dynamic_index_in_dim(state.tokens, ts, keepdims=False)
        )
        tokens_buf = state.tokens
        dscratch = KVCache.init(
            self.draft_cfg, gm_size, self.draft_params.embed.dtype)

        # One noise block for every level's WOR race (sequoia): row block
        # [row_off : row_off + num_roots(lvl)] serves level lvl. ~15 us of
        # rbg setup saved per level; a depth-11 tree runs 11 levels.
        g_all = None
        if self.algorithm == "sequoia" and self.growmap.num_grow_steps > 0:
            key, kg = jax.random.split(key)
            total_rows = sum(len(r) for r in self.growmap.roots)
            g_all = jax.random.gumbel(kg, (total_rows, self.vocab), jnp.float32)
        row_off = 0

        for lvl in range(self.growmap.num_grow_steps):
            w = self._level_widths[lvl]
            start = self._level_starts[lvl]
            nr = len(self.growmap.roots[lvl])
            g_rows = None
            if g_all is not None:
                g_rows = g_all[row_off : row_off + nr]
                row_off += nr
            key, sub = jax.random.split(key)
            new_tokens = self._draft_grow_sample(
                sub, lvl, draft_logits[self._level_roots[lvl]], gumbel_rows=g_rows
            )
            tokens_tree = jax.lax.dynamic_update_slice(tokens_tree, new_tokens, (start,))
            tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, new_tokens, (ts + start,))
            positions = ts + self._depth[start : start + w]
            main_mask, scr_mask = masks.split_tree_masks(
                self._anc[start : start + w], ts, M, root_in_main=True)
            lvl_logits, dscratch = forward(
                draft_params, self.draft_cfg, new_tokens, positions,
                state.draft_kv, ts + start, main_mask,
                scratch=dscratch, scratch_offset=start, scratch_mask=scr_mask,
            )
            draft_logits = jax.lax.dynamic_update_slice(
                draft_logits, lvl_logits.astype(jnp.float32), (start, 0)
            )
        return tokens_tree, draft_logits, tokens_buf, dscratch, key

    def _target_impl(self, target_params, state: DecodeState, tokens_tree):
        """Target verify forward over the whole tree. Rows (incl. the root,
        whose target K/V the main cache does not yet have — the bonus token
        never went through the target) land in a scratch; the main cache is
        read-only. Returns `(logits, target_scratch)`."""
        ts = state.gtl - 1
        positions = ts + self._depth
        main_mask, scr_mask = masks.split_tree_masks(
            self._anc, ts, self.max_length, root_in_main=False)
        tscratch = KVCache.init(
            self.target_cfg, self.tree_size, self.target_params.embed.dtype)
        return forward(
            target_params, self.target_cfg, tokens_tree, positions,
            state.target_kv, ts, main_mask,
            scratch=tscratch, scratch_offset=0, scratch_mask=scr_mask,
        )

    def _iterate_impl(
        self,
        draft_params: LlamaParams,
        target_params: LlamaParams,
        state: DecodeState,
    ) -> Tuple[DecodeState, StepStats]:
        tokens_tree, draft_logits, tokens_buf, dscratch, key = self._grow_impl(
            draft_params, state
        )
        target_logits, tscratch = self._target_impl(target_params, state, tokens_tree)
        return self._finalize_impl(
            draft_params, state, tokens_tree, draft_logits, tokens_buf,
            dscratch, key, target_logits, tscratch,
        )

    def _finalize_impl(
        self,
        draft_params,
        state: DecodeState,
        tokens_tree,
        draft_logits,
        tokens_buf,
        dscratch,
        key,
        target_logits,
        tscratch,
    ) -> Tuple[DecodeState, StepStats]:
        """Accept walk + commit (tokens + scratch-row KV writes) + bonus
        re-draft."""
        gm_size = self.tree_size
        gtl = state.gtl
        ts = gtl - 1
        M = self.max_length

        # --- Accept walk (device-side) ----------------------------------
        key, k_r, k_bonus, k_tok = jax.random.split(key, 4)
        walk_res = None
        if "fixed_walk" in self._ablate:
            # Measurement stub: a constant accept-1-then-bonus path with no
            # target-probs/walk/residual/bonus-sampling work. Differencing
            # the full iteration against this isolates walk+bonus cost.
            md_f = max(self.max_depth, 1)
            second = 1 if gm_size > 1 else 0
            path = PathResult(
                path=jnp.full((md_f,), -1, jnp.int32).at[0].set(second),
                accept_count=jnp.asarray(1 if gm_size > 1 else 0, jnp.int32),
                final_node=jnp.asarray(second, jnp.int32),
                terminal=jnp.asarray(False),
            )
            bonus = jnp.argmax(jax.lax.dynamic_index_in_dim(
                target_logits, second, keepdims=False)).astype(jnp.int32)
            terminal = jnp.asarray(False)
            has_bonus = jnp.asarray(True)
        elif self.algorithm in ("sequoia", "specinfer") and self.walk in (
                "path", "node", "unrolled"):
            # Path-following walk (default): tests only the visited nodes'
            # edges, materializes p/q rows lazily, and its final residual
            # row IS the bonus distribution — ~depth [vocab]-row ops
            # instead of ~size (trees/accept.py::stochastic_path_walk).
            # "node" resolves one whole node per while-loop trip (rank scan
            # unrolled in the body): ~accepted-depth trips instead of
            # ~tested-edge trips, same math (stochastic_path_walk_node).
            r = jax.random.uniform(k_r, (gm_size,), jnp.float32)
            is_sequoia = self.algorithm == "sequoia"
            cut = nucleus_cutoff(target_logits, self.top_p, self.temperature)
            walk_fn = {"node": stochastic_path_walk_node,
                       "unrolled": stochastic_path_walk_unrolled,
                       "path": stochastic_path_walk}[self.walk]
            walk_res = walk_fn(
                target_logits, draft_logits, tokens_tree, r, self._succ_np,
                self.temperature, cut, self.stop_tokens,
                max(self.max_depth, 1), strict=is_sequoia,
                mask_rejected_draft=is_sequoia,
            )
            path = PathResult(
                path=walk_res.path, accept_count=walk_res.accept_count,
                final_node=walk_res.final_node, terminal=walk_res.terminal,
            )
        elif self.algorithm in ("sequoia", "specinfer"):
            # Staged walk: decisions first (static-prefix sorted-parent
            # scan, no [size, vocab] residual output), then the residual
            # replayed for the ONE node the bonus token needs — the
            # [size, vocab] p_final of the naive walk made the iteration
            # overhead scale with tree size (trees/accept.py).
            p = target_probs(target_logits, self.top_p, self.temperature)
            r = jax.random.uniform(k_r, (gm_size,), jnp.float32)
            is_sequoia = self.algorithm == "sequoia"
            accepted_child = stochastic_accept_decisions(
                p, draft_logits, tokens_tree, r, self._succ_np,
                self.temperature, strict=is_sequoia,
                mask_rejected_draft=is_sequoia,
            )
            path = resolve_path(
                accepted_child, tokens_tree, self.stop_tokens,
                max(self.max_depth, 1),
            )
        elif self.algorithm == "greedy":
            acc = token_match_accept(
                jnp.argmax(target_logits, axis=-1).astype(jnp.int32),
                tokens_tree, self._succ,
            )
            path = resolve_path(
                acc.accepted_child, tokens_tree, self.stop_tokens,
                max(self.max_depth, 1),
            )
        else:  # greedys
            p = target_probs(target_logits, self.top_p, self.temperature)
            sampled = sample_categorical_probs(k_tok, p).astype(jnp.int32)
            acc = token_match_accept(sampled, tokens_tree, self._succ)
            path = resolve_path(
                acc.accepted_child, tokens_tree, self.stop_tokens,
                max(self.max_depth, 1),
            )

        # --- Bonus token -------------------------------------------------
        if "fixed_walk" in self._ablate:
            pass  # bonus/terminal/has_bonus fixed above (measurement stub)
        elif self.algorithm in ("sequoia", "specinfer"):
            if walk_res is not None:
                res = walk_res.p_final_row
            else:
                fn = path.final_node
                p_row = p[fn]
                q_row = draft_probs(
                    jax.lax.dynamic_index_in_dim(
                        draft_logits, fn, keepdims=False)[None],
                    self.temperature)[0]
                childs = self._succ[fn]
                valid = childs >= 0
                ctok = tokens_tree[jnp.where(valid, childs, 0)]
                res = node_residual(p_row, q_row, ctok, valid,
                                    mask_rejected_draft=is_sequoia)
            nan_residual = jnp.isnan(res).any()
            bonus = sample_categorical_probs(k_bonus, res).astype(jnp.int32)
            terminal = path.terminal | (~path.terminal & nan_residual)
            has_bonus = ~terminal
        else:
            bonus = acc.target_token[path.final_node]
            terminal = path.terminal
            has_bonus = ~terminal
        # Emitting a stop token as bonus also terminates (the reference only
        # notices once the token is *accepted* in a later tree; stopping now
        # is strictly better behavior and emits the same committed sequence).
        bonus_is_stop = jnp.isin(bonus, jnp.asarray(list(self.stop_tokens), jnp.int32))
        emitted = path.accept_count + has_bonus.astype(jnp.int32)
        terminal = terminal | (has_bonus & bonus_is_stop)

        # --- Commit accepted tokens + bonus ------------------------------
        md = max(self.max_depth, 1)
        path_c = jnp.where(path.path >= 0, path.path, 0)
        path_tokens = tokens_tree[path_c]
        block = jnp.where(jnp.arange(md) < path.accept_count, path_tokens, 0)
        block = jnp.concatenate([block, jnp.zeros((1,), jnp.int32)])
        block = block.at[path.accept_count].set(jnp.where(has_bonus, bonus, block[path.accept_count]))
        tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, block, (gtl,))

        # --- KV commit: scratch rows -> main caches -----------------------
        # Target: the verify computed fresh K/V for the ROOT (slot ts was
        # stale — the bonus token never went through the target) and for
        # every tree node; write [root] + accepted path to [ts, ts+1+md).
        # Draft: the root's draft K/V is already in main (bonus re-draft of
        # the previous iteration); write the accepted path to [gtl, gtl+md).
        # Padded rows duplicate the root/node-0 row; they land at slots >=
        # the new committed length and are re-written before ever becoming
        # visible (masks are generated from (gtl, topology) each step).
        target_kv = state.target_kv.commit_rows(
            tscratch, jnp.concatenate([jnp.zeros((1,), jnp.int32), path_c]), ts)
        draft_kv = state.draft_kv.commit_rows(dscratch, path_c, gtl)

        new_gtl = gtl + emitted
        new_ts = new_gtl - 1

        # --- Width-1 draft forward on the new root (bonus) ---------------
        if "no_redraft" in self._ablate:
            # Measurement stub: reuse a tree row as the next root logits
            # (wrong semantics; isolates the re-draft forward's cost).
            root_logits = jax.lax.dynamic_index_in_dim(
                draft_logits, jnp.maximum(path.final_node, 0),
                keepdims=False)[None].astype(jnp.float32)
        else:
            root_token = jax.lax.dynamic_index_in_dim(
                tokens_buf, new_ts, keepdims=False)
            root_pos = new_ts[None].astype(jnp.int32)
            k_idx = jnp.arange(M, dtype=jnp.int32)[None, :]
            root_mask = k_idx <= new_ts
            root_logits, draft_kv = forward(
                draft_params, self.draft_cfg, root_token[None], root_pos,
                draft_kv, new_ts, root_mask,
            )

        first_child = path.path[0]
        first_rank = jnp.where(
            first_child >= 0, self._child_rank[jnp.maximum(first_child, 0)], -1
        ).astype(jnp.int32)
        new_state = DecodeState(
            tokens=tokens_buf,
            gtl=new_gtl,
            draft_kv=draft_kv,
            target_kv=target_kv,
            root_draft_logits=root_logits[0],
            key=key,
            terminal=state.terminal | terminal,
        )
        return new_state, StepStats(
            emitted=emitted, terminal=new_state.terminal, first_rank=first_rank
        )

    # ------------------------------------------------------------------
    # Fully on-device generation loop
    # ------------------------------------------------------------------

    def _generate_loop_impl(
        self,
        draft_params: LlamaParams,
        target_params: LlamaParams,
        state: DecodeState,
        max_new_tokens,  # i32 scalar (traced: no recompile per budget)
        start_gtl,       # i32 scalar
    ):
        """Run speculative iterations in a `lax.while_loop` until EOS /
        budget / buffer exhaustion. ONE dispatch per generate() call — the
        host-side loop costs one tunnel round-trip per iteration (~25 ms on
        remote-TPU setups), which would dwarf the target forward itself."""
        M = self.max_length

        def cond(carry):
            state, produced, steps = carry
            fits = (state.gtl - 1 + self.tree_size <= M) & (
                state.gtl + self.max_depth + 1 <= M
            )
            return (~state.terminal) & (produced < max_new_tokens) & fits

        def body(carry):
            state, produced, steps = carry
            state, stats = self._iterate_impl(draft_params, target_params, state)
            return (state, produced + stats.emitted, steps + 1)

        init = (state, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        state, produced, steps = jax.lax.while_loop(cond, body, init)
        return state, produced, steps

    def generate_fast(
        self,
        prompt: np.ndarray,
        max_new_tokens: int = 128,
        seed: int = 0,
    ) -> np.ndarray:
        """Like `generate`, but the whole decode loop runs on device; the
        host syncs once at the end."""
        state = self.prefill(prompt, seed=seed)
        plen = int(len(np.asarray(prompt).reshape(-1)))
        state, produced, steps = self._generate_loop(
            self.draft_params, self.target_params, state,
            jnp.asarray(max_new_tokens, jnp.int32), jnp.asarray(plen, jnp.int32),
        )
        self.num_decoding_steps = int(produced)
        self.num_large_model_steps = int(steps)
        tokens = np.asarray(jax.device_get(state.tokens))
        return tokens[: plen + self.num_decoding_steps]

    def iterate_phased(self, state: DecodeState):
        """One speculative iteration split into separately-jitted phases with
        host-side timers — the reference's `benchmark=True` plumbing
        (`Tree/SpecTree.py:99-131,167-241`, reported at
        `tests/testbed.py:215-218`). Phase mapping: `draft_run` = tree growth
        incl. speculation sampling (reference "draft run" + "sample"),
        `target_run` = the verify forward, `accept_kv` = accept walk + commit
        + KV compaction + bonus re-draft (reference "accept loop" +
        "kv select"). Returns `(state, stats, {phase: seconds})`."""
        import time

        from ..utils import hard_sync

        times = {}
        t0 = time.perf_counter()
        grow_out = self._grow_fn(self.draft_params, state)
        hard_sync(grow_out)
        times["draft_run"] = time.perf_counter() - t0
        tokens_tree, draft_logits, tokens_buf, draft_kv, key = grow_out

        t0 = time.perf_counter()
        target_logits, target_kv = self._target_fn(
            self.target_params, state, tokens_tree
        )
        hard_sync(target_logits)
        times["target_run"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        new_state, stats = self._finalize_fn(
            self.draft_params, state, tokens_tree, draft_logits, tokens_buf,
            draft_kv, key, target_logits, target_kv,
        )
        hard_sync(new_state)
        times["accept_kv"] = time.perf_counter() - t0
        return new_state, stats, times

    def generate_benchmark(
        self,
        prompt: np.ndarray,
        max_new_tokens: int = 128,
        seed: int = 0,
    ):
        """Host-stepped generation with per-phase timing; returns
        `(tokens, {phase: total_seconds})`."""
        state = self.prefill(prompt, seed=seed)
        plen = int(len(np.asarray(prompt).reshape(-1)))
        gtl = plen
        produced = 0
        self.num_decoding_steps = 0
        self.num_large_model_steps = 0
        totals = {"draft_run": 0.0, "target_run": 0.0, "accept_kv": 0.0}
        while (
            produced < max_new_tokens
            and gtl - 1 + self.tree_size <= self.max_length
            and gtl + self.max_depth + 1 <= self.max_length
        ):
            state, stats, times = self.iterate_phased(state)
            for k, v in times.items():
                totals[k] += v
            emitted = int(stats.emitted)
            produced += emitted
            gtl += emitted
            self.num_decoding_steps += emitted
            self.num_large_model_steps += 1
            if bool(stats.terminal):
                break
        tokens = np.asarray(jax.device_get(state.tokens))
        return tokens[:gtl], totals

    def stream(
        self,
        prompt: np.ndarray,
        max_new_tokens: int = 128,
        seed: int = 0,
    ):
        """Yield the newly committed tokens (np i32 array) after each
        speculative iteration — the chat runners' streaming display
        (`tests/run_sequoia.py:140-145` re-decodes the growing sequence each
        iteration; we yield the per-iteration delta instead)."""
        state = self.prefill(prompt, seed=seed)
        plen = int(len(np.asarray(prompt).reshape(-1)))
        gtl = plen
        produced = 0
        self.num_decoding_steps = 0
        self.num_large_model_steps = 0
        while (
            produced < max_new_tokens
            and gtl - 1 + self.tree_size <= self.max_length
            and gtl + self.max_depth + 1 <= self.max_length
        ):
            state, stats = self._iterate(self.draft_params, self.target_params, state)
            emitted = int(stats.emitted)
            new = np.asarray(jax.device_get(
                jax.lax.dynamic_slice(state.tokens, (gtl,), (self.max_depth + 1,))
            ))[:emitted]
            produced += emitted
            gtl += emitted
            self.num_decoding_steps += emitted
            self.num_large_model_steps += 1
            yield new
            if bool(stats.terminal):
                break

    def stream_fast(
        self,
        prompt: np.ndarray,
        max_new_tokens: int = 128,
        chunk_tokens: int = 16,
        seed: int = 0,
    ):
        """Streaming with the decode loop ON DEVICE: yields a chunk of
        committed tokens after every `_generate_loop` dispatch of up to
        `chunk_tokens` tokens (~`chunk/E[accept]` iterations). `stream()`
        pays one host<->device round-trip per iteration (~28 ms on
        remote-TPU tunnels — more than the iteration itself, CHAT_r02);
        this amortizes the trip over a chunk while keeping time-to-first-
        token at one chunk. Same committed sequence as `generate_fast` —
        both run `_iterate_impl` under the same while-loop predicate, just
        with the token budget split into chunks."""
        assert chunk_tokens >= 1
        state = self.prefill(prompt, seed=seed)
        plen = int(len(np.asarray(prompt).reshape(-1)))
        gtl = plen
        produced = 0
        self.num_decoding_steps = 0
        self.num_large_model_steps = 0
        plen_dev = jnp.asarray(plen, jnp.int32)
        while produced < max_new_tokens:
            budget = min(chunk_tokens, max_new_tokens - produced)
            state, chunk_prod_a, steps_a = self._generate_loop(
                self.draft_params, self.target_params, state,
                jnp.asarray(budget, jnp.int32), plen_dev,
            )
            # ONE fetch per chunk: the whole token buffer ([M] i32, a few
            # KB — a fixed-size slice would clamp-misalign near the buffer
            # end) + counters + terminal together.
            buf, chunk_prod, steps, term = jax.device_get((
                state.tokens, chunk_prod_a, steps_a, state.terminal,
            ))
            chunk_prod = int(chunk_prod)
            if chunk_prod == 0:  # terminal / buffer-full before any emit
                break
            new = np.asarray(buf)[gtl : gtl + chunk_prod]
            produced += chunk_prod
            gtl += chunk_prod
            self.num_decoding_steps += chunk_prod
            self.num_large_model_steps += int(steps)
            yield new
            if bool(term):
                break

    # ------------------------------------------------------------------
    # Host-stepped generation loop (per-iteration stats / debugging)
    # ------------------------------------------------------------------

    def generate(
        self,
        prompt: np.ndarray,
        max_new_tokens: int = 128,
        seed: int = 0,
    ) -> np.ndarray:
        """Generate until EOS / token budget / buffer exhaustion. Returns the
        full committed sequence (prompt + generated)."""
        state = self.prefill(prompt, seed=seed)
        plen = int(len(np.asarray(prompt).reshape(-1)))
        gtl = plen
        produced = 0
        self.num_decoding_steps = 0
        self.num_large_model_steps = 0
        while (
            produced < max_new_tokens
            and gtl - 1 + self.tree_size <= self.max_length
            and gtl + self.max_depth + 1 <= self.max_length
        ):
            state, stats = self._iterate(self.draft_params, self.target_params, state)
            emitted = int(stats.emitted)  # host sync point (scalars only)
            produced += emitted
            gtl += emitted
            self.num_decoding_steps += emitted
            self.num_large_model_steps += 1
            if bool(stats.terminal):
                break
        tokens = np.asarray(jax.device_get(state.tokens))
        return tokens[:gtl]
