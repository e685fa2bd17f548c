"""Autoregressive baseline decoder (the reference `--Mode baseline`,
`tests/testbed.py:99-143`): one target forward per token. Used for speedup
measurement and for the greedy token-exact parity check (greedy speculative
decoding must equal pure greedy decoding)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LlamaConfig
from ..core.model import LlamaParams, forward
from ..kvcache.cache import KVCache, KVCache4, KVCache8
from ..ops import masks
from ..ops.sampling import sample_categorical_probs, target_probs
from ..utils import prng_key


class ARState(NamedTuple):
    tokens: jax.Array   # i32 [max_length]
    n: jax.Array        # i32 committed length
    kv: KVCache
    last_logits: jax.Array  # f32 [vocab] logits at the last committed token
    key: jax.Array
    terminal: jax.Array


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class ARBaseline:
    def __init__(
        self,
        params: LlamaParams,
        cfg: LlamaConfig,
        *,
        max_length: int = 256,
        temperature: float = 0.6,
        top_p: float = 0.9,
        greedy: bool = False,
        prefill_chunk: int = 128,
        kv_quant=None,
    ) -> None:
        self.params = params
        self.cfg = cfg
        self.max_length = max_length
        self.temperature = temperature
        self.top_p = top_p
        self.greedy = greedy
        self.prefill_chunk = min(prefill_chunk, max_length)
        self.kv_quant = None if kv_quant == "none" else kv_quant
        self._step = jax.jit(self._step_impl, donate_argnums=(1,))
        self._prefill_chunk_fn = jax.jit(self._prefill_impl, donate_argnums=(1,))
        self._loop = jax.jit(self._loop_impl, donate_argnums=(1,))

    def _prefill_impl(self, params, state: ARState, chunk, offset, prompt_len):
        C = chunk.shape[0]
        positions = offset + jnp.arange(C, dtype=jnp.int32)
        mask = masks.causal_mask(C, self.max_length, offset)
        logits, kv = forward(params, self.cfg, chunk, positions, state.kv, offset, mask)
        last = prompt_len - 1 - offset
        in_chunk = (last >= 0) & (last < C)
        idx = jnp.clip(last, 0, C - 1)
        last_logits = jnp.where(
            in_chunk, jax.lax.dynamic_index_in_dim(logits, idx, keepdims=False),
            state.last_logits,
        )
        tokens = jax.lax.dynamic_update_slice(state.tokens, chunk, (offset,))
        return state._replace(tokens=tokens, kv=kv, last_logits=last_logits)

    def _sample(self, key, logits):
        if self.greedy:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        p = target_probs(logits, self.top_p, self.temperature)
        return sample_categorical_probs(key, p).astype(jnp.int32)

    def _step_impl(self, params, state: ARState):
        key, k_s = jax.random.split(state.key)
        token = self._sample(k_s, state.last_logits)
        tokens = state.tokens.at[state.n].set(token)
        pos = state.n[None].astype(jnp.int32)
        k_idx = jnp.arange(self.max_length, dtype=jnp.int32)[None, :]
        # Split-cache step: the main cache is READ-ONLY inside the layer
        # scan (write-mode forward re-emits the whole cache as scan ys —
        # measured ~15 ms/step of pure cache rewrite at B=32 int8 on v5e);
        # the new token's K/V lands in a 1-row scratch and is committed
        # with a tiny different-buffer row write afterwards.
        mask = k_idx < state.n
        scratch = KVCache.init(self.cfg, 1, params.embed.dtype)
        logits, scr = forward(
            params, self.cfg, token[None], pos, state.kv, state.n, mask,
            scratch=scratch, scratch_offset=jnp.asarray(0, jnp.int32),
            scratch_mask=jnp.ones((1, 1), bool),
        )
        kv = state.kv.commit_rows(scr, jnp.zeros((1,), jnp.int32), state.n)
        stop = jnp.isin(token, jnp.asarray(list(self.cfg.stop_tokens), jnp.int32))
        return ARState(
            tokens=tokens,
            n=state.n + 1,
            kv=kv,
            last_logits=logits[0],
            key=key,
            terminal=state.terminal | stop,
        ), token

    def _loop_impl(self, params, state: ARState, max_new_tokens):
        """Whole decode loop on device (one dispatch; see engine.py on
        host-sync cost)."""

        def cond(carry):
            state, produced = carry
            return (~state.terminal) & (produced < max_new_tokens)

        def body(carry):
            state, produced = carry
            state, _ = self._step_impl(params, state)
            return (state, produced + 1)

        state, produced = jax.lax.while_loop(
            cond, body, (state, jnp.asarray(0, jnp.int32))
        )
        return state, produced

    def _prefill_state(self, prompt: np.ndarray, seed: int) -> "tuple[ARState, int]":
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        plen = len(prompt)
        state = ARState(
            tokens=jnp.zeros((self.max_length,), jnp.int32),
            n=jnp.asarray(plen, jnp.int32),
            kv={"int8": KVCache8, "int4": KVCache4, None: KVCache}[
                self.kv_quant
            ].init(self.cfg, self.max_length, self.params.embed.dtype),
            last_logits=jnp.zeros((self.cfg.vocab_size,), jnp.float32),
            key=prng_key(seed),
            terminal=jnp.asarray(False),
        )
        C = self.prefill_chunk
        padded_len = _round_up(plen, C)
        padded = np.zeros(padded_len, np.int32)
        padded[:plen] = prompt
        for off in range(0, padded_len, C):
            state = self._prefill_chunk_fn(
                self.params, state, jnp.asarray(padded[off : off + C]),
                jnp.asarray(off, jnp.int32), jnp.asarray(plen, jnp.int32),
            )
        return state, plen

    def generate_fast(self, prompt: np.ndarray, max_new_tokens: int = 128, seed: int = 0) -> np.ndarray:
        state, plen = self._prefill_state(prompt, seed)
        assert plen + max_new_tokens <= self.max_length
        state, produced = self._loop(
            self.params, state, jnp.asarray(max_new_tokens, jnp.int32)
        )
        n = plen + int(produced)
        return np.asarray(jax.device_get(state.tokens))[:n]

    def stream(self, prompt: np.ndarray, max_new_tokens: int = 128, seed: int = 0):
        """Yield one committed token (np i32 scalar array) per decode step."""
        state, plen = self._prefill_state(prompt, seed)
        assert plen + max_new_tokens <= self.max_length
        for _ in range(max_new_tokens):
            state, tok = self._step(self.params, state)
            yield np.asarray(jax.device_get(tok)).reshape(1)
            if bool(state.terminal):
                break

    def generate(self, prompt: np.ndarray, max_new_tokens: int = 128, seed: int = 0) -> np.ndarray:
        state, plen = self._prefill_state(prompt, seed)
        assert plen + max_new_tokens <= self.max_length
        n = plen
        for _ in range(max_new_tokens):
            state, _tok = self._step(self.params, state)
            n += 1
            if bool(state.terminal):
                break
        return np.asarray(jax.device_get(state.tokens))[:n]
