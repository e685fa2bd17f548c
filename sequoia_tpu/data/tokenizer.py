"""Offline byte-level tokenizer.

The reference assumes a network-reachable HF tokenizer for its chat runners
(`tests/run_sequoia.py` loads the target's tokenizer from the hub). In a
zero-egress environment the chat path still needs SOME text<->ids mapping to
run MT-Bench prompts end-to-end; this maps UTF-8 bytes to ids ``3..258``
(0/1/2 are reserved as pad/bos/eos, matching the Llama convention) and back.
It is deterministic, lossless for any text, needs no assets, and exposes the
two entry points the chat CLI uses from an HF tokenizer: ``__call__`` ->
``{"input_ids": [...]}`` and ``decode(ids, skip_special_tokens=True)``.

Sequence lengths are ~4x a real BPE tokenizer's, so per-prompt token counts
are not comparable to reference runs — but accepted-tokens/step and
ms/token, the metrics the chat harness reports, are measured per TOKEN and
remain meaningful.
"""

from __future__ import annotations

from typing import Iterable, List

_OFFSET = 3  # 0 pad / 1 bos / 2 eos


class ByteTokenizer:
    """Minimal HF-tokenizer-compatible byte codec (offline)."""

    bos_token_id = 1
    eos_token_id = 2

    def __init__(self, add_bos: bool = True) -> None:
        self.add_bos = add_bos

    def __call__(self, text: str) -> dict:
        ids = [b + _OFFSET for b in text.encode("utf-8")]
        if self.add_bos:
            ids = [self.bos_token_id] + ids
        return {"input_ids": ids}

    def decode(self, ids: Iterable[int], skip_special_tokens: bool = True) -> str:
        data = bytes(
            i - _OFFSET for i in ids if _OFFSET <= int(i) < _OFFSET + 256
        )
        return data.decode("utf-8", errors="replace")

    def convert_ids_to_tokens(self, ids: Iterable[int]) -> List[str]:
        return [self.decode([i]) or f"<{int(i)}>" for i in ids]
