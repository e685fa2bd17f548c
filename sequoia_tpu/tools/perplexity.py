"""Teacher-forced perplexity evaluation.

BASELINE.md's quality gate for the quantized-target path ("quantized target
perplexity within stated bit-width delta") needs a measurement tool the
reference never had: the reference evaluates quality only implicitly through
acceptance rates. This computes token-level negative log-likelihood over a
`TokenDataset` (same static-shape batching as the rest of the data layer) in
ONE jitted chunked pass per sequence, so it runs on both CPU (tests) and
TPU (real checkpoints via `core/init.py::load_hf_checkpoint`).

Typical use: load a checkpoint, quantize at int8 and int4
(`quant/quantize.py::quantize_model`), and compare `evaluate(...)`
perplexities — the int8 delta should be ~zero and the int4 delta the stated
bit-width cost.

CLI: `python -m sequoia_tpu.tools.perplexity --model <hf_dir> --data x.jsonl
[--quant int8]`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LlamaConfig
from ..core.model import LlamaParams, forward
from ..kvcache.cache import KVCache
from ..ops import masks


@dataclasses.dataclass
class PerplexityResult:
    nll: float          # mean negative log-likelihood per predicted token
    perplexity: float   # exp(nll)
    tokens: int         # number of predicted tokens scored


def _chunked_nll_fn(cfg: LlamaConfig, seq_len: int, chunk: int,
                    kv_quant: Optional[str] = None):
    """Returns a jitted fn(params, tokens[T], length) -> (sum_nll, count):
    prefill-style chunked forward accumulating next-token NLL. Positions
    past `length` are masked out of the loss. `kv_quant` scores with an
    int8/int4 KV cache so the quality cost of KV quantization (later chunks
    attend over quantized history) is measurable, not just assumed."""
    from ..kvcache.cache import KVCache4, KVCache8

    kv_cls = {"int8": KVCache8, "int4": KVCache4,
              None: KVCache, "none": KVCache}[kv_quant]
    chunk = min(chunk, seq_len)
    n_chunks = (seq_len + chunk - 1) // chunk
    padded = n_chunks * chunk

    def run(params, tokens, length):
        kv = kv_cls.init(cfg, padded, params.embed.dtype)
        # +1 so the shifted next-token slice of the LAST chunk never clamps
        # its start index (dynamic_slice clamps out-of-bounds starts, which
        # would silently misalign the final chunk's prediction pairs).
        toks = jnp.zeros((padded + 1,), jnp.int32).at[:seq_len].set(tokens)

        def body(carry, i):
            kv, acc, cnt = carry
            off = i * chunk
            sl = jax.lax.dynamic_slice(toks, (off,), (chunk,))
            pos = off + jnp.arange(chunk, dtype=jnp.int32)
            mask = masks.causal_mask(chunk, padded, off)
            logits, kv = forward(params, cfg, sl, pos, kv, off, mask)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            # logits at absolute position p predict token p+1.
            nxt = jax.lax.dynamic_slice(toks, (off + 1,), (chunk,))
            tok_lp = jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0]
            valid = (pos + 1) < length  # predicts a real (non-pad) token
            acc = acc - jnp.sum(jnp.where(valid, tok_lp, 0.0))
            cnt = cnt + jnp.sum(valid.astype(jnp.int32))
            return (kv, acc, cnt), None

        (kv, acc, cnt), _ = jax.lax.scan(
            body, (kv, jnp.asarray(0.0, jnp.float32), jnp.asarray(0, jnp.int32)),
            jnp.arange(n_chunks))
        return acc, cnt

    return jax.jit(run)


def evaluate(
    params: LlamaParams,
    cfg: LlamaConfig,
    ids: np.ndarray,       # [n, seq_len] int32 padded tokens
    lengths: np.ndarray,   # [n] true lengths
    *,
    chunk: int = 128,
    limit: Optional[int] = None,
    kv_quant: Optional[str] = None,
) -> PerplexityResult:
    ids = np.asarray(ids)
    lengths = np.asarray(lengths)
    if limit is not None:
        ids, lengths = ids[:limit], lengths[:limit]
    fn = _chunked_nll_fn(cfg, ids.shape[1], chunk, kv_quant)
    total, count = 0.0, 0
    for row, ln in zip(ids, lengths):
        if ln < 2:
            continue
        acc, cnt = fn(params, jnp.asarray(row, jnp.int32),
                      jnp.asarray(int(ln), jnp.int32))
        total += float(acc)
        count += int(cnt)
    nll = total / max(count, 1)
    return PerplexityResult(nll=nll, perplexity=float(np.exp(nll)), tokens=count)


def main() -> None:
    import argparse
    import json as _json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, help="HF checkpoint dir")
    ap.add_argument("--data", required=True,
                    help="pre-tokenized JSONL (c4_small style) or arrow dir")
    ap.add_argument("--quant", default="none", choices=["none", "int8", "int4"])
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--limit", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()

    from ..core.init import load_hf_checkpoint
    from ..data.datasets import load_pretokenized_jsonl

    params, cfg = load_hf_checkpoint(args.model, dtype=jnp.bfloat16)
    if args.quant != "none":
        from ..quant.quantize import quantize_model

        params = quantize_model(params, bits={"int8": 8, "int4": 4}[args.quant])
    ds = load_pretokenized_jsonl(args.data, seq_len=args.seq_len)
    res = evaluate(params, cfg, ds.ids, ds.lengths,
                   chunk=args.chunk, limit=args.limit)
    print(_json.dumps({
        "model": args.model, "quant": args.quant,
        "nll": round(res.nll, 5), "perplexity": round(res.perplexity, 4),
        "tokens": res.tokens,
    }))


if __name__ == "__main__":
    main()
