#!/usr/bin/env python
"""Quantization quality gate: measured perplexity + acceptance deltas.

BASELINE.md promises "quantized target perplexity within stated bit-width
delta" and SURVEY.md §7.3 notes acceptance vectors are precision-dependent.
With no network, real pretrained checkpoints are unreachable, so the gate is
measured on the locally-TRAINED correlated pair (tools/distill.py — real
weights with real predictive structure on the bundled corpus), held-out
rows:

  - weight precision: f32 / bf16 / int8 / int8+w8a8 / int4
      -> teacher-forced perplexity + dynamic acceptance vector +
         end-to-end accepted/step of the speculative loop
  - KV precision: none / int8 / int4
      -> perplexity with quantized-KV prefill + accepted/step

Emits QUALITY_r{N}.json. Run on TPU for the production numbers (w8a8
auto-routing engages at wide rows); CPU works for smoke.
"""

import argparse
import json
import os as _os, sys
import time

sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--eval-rows", type=int, default=48)
    ap.add_argument("--eval-seq-len", type=int, default=128)
    ap.add_argument("--dst", default="QUALITY_r03.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from sequoia_tpu.engine.engine import SpecEngine
    from sequoia_tpu.planner.acceptance import dynamic_acceptance
    from sequoia_tpu.quant.quantize import quantize_model
    from sequoia_tpu.tools.distill import corpus_from_reference, make_correlated_pair
    from sequoia_tpu.tools.perplexity import evaluate
    from sequoia_tpu.trees.growmap import uniform_tree

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    # Train on the first 160 corpus rows; rows 160:200 are held out for the
    # perplexity/acceptance eval (the bundled corpus has exactly 200 rows).
    # Round 3: the deeper 8L-256h pair (bench.py's realized-acceptance
    # config) — quantization deltas on a 4L-128h model were mostly noise.
    draft, dcfg, target, tcfg = make_correlated_pair(
        steps=args.steps, seq_len=64, distill_draft=True, corpus_limit=160,
        target_shape=(8, 256), draft_shape=(2, 128),
        draft_steps=2 * args.steps)
    log(f"trained pair ({args.steps} steps): {time.perf_counter() - t0:.0f}s")

    all_rows = corpus_from_reference(
        vocab_size=tcfg.vocab_size, seq_len=args.eval_seq_len, limit=200)
    eval_ids = all_rows[160:160 + args.eval_rows]
    assert len(eval_ids) > 0
    lengths = np.full(len(eval_ids), args.eval_seq_len, np.int64)
    prompts = [np.asarray(r[:24], np.int32) for r in all_rows[160:164]]
    gm = uniform_tree(4, 2)

    def accept_stats(tparams, kv_quant=None):
        vec = np.asarray(dynamic_acceptance(
            draft, dcfg, tparams, tcfg, prompts[:2], width=8,
            steps_per_prompt=24, max_length=192, temperature=0.6))
        eng = SpecEngine(draft, dcfg, tparams, tcfg, gm,
                         algorithm="sequoia", max_length=192,
                         temperature=0.6, top_p=0.9, prefill_chunk=32,
                         kv_quant=kv_quant)
        em = st = 0
        for i, pr in enumerate(prompts):
            eng.generate_fast(pr, max_new_tokens=64, seed=i)
            em += eng.num_decoding_steps
            st += eng.num_large_model_steps
        return vec, em / max(st, 1)

    results = {"pair": {"target": f"{tcfg.num_layers}L-{tcfg.hidden_size}h-"
                                  f"v{tcfg.vocab_size}",
                        "train_steps": args.steps,
                        "eval_rows": len(eval_ids),
                        "eval_seq_len": args.eval_seq_len,
                        "held_out": True},
               "weights": {}, "kv": {}}

    from sequoia_tpu.quant import qtensor

    weight_variants = {
        "f32": target,
        "bf16": jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype in (jnp.float32, jnp.bfloat16) else a, target),
        "int8": quantize_model(target, bits=8),
        "int4": quantize_model(target, bits=4),
    }
    for name, tp in weight_variants.items():
        t0 = time.perf_counter()
        ppl = evaluate(tp, tcfg, eval_ids, lengths, chunk=args.eval_seq_len)
        vec, acc = accept_stats(tp)
        results["weights"][name] = {
            "perplexity": round(ppl.perplexity, 4),
            "nll": round(ppl.nll, 5),
            "acceptance_vector_head": [round(float(v), 4) for v in vec[:6]],
            "accepted_per_step": round(acc, 3),
        }
        log(f"weights {name:5s}: ppl {ppl.perplexity:.4f} "
            f"accepted/step {acc:.3f} ({time.perf_counter() - t0:.0f}s)")
        if name == "int8":
            # the verify path at tree width >= 96 rows uses w8a8 on TPU;
            # measure its quality explicitly by forcing it on
            qtensor.set_w8a8("on")
            try:
                ppl8 = evaluate(tp, tcfg, eval_ids, lengths,
                                chunk=args.eval_seq_len)
                vec8, acc8 = accept_stats(tp)
            finally:
                qtensor.set_w8a8("auto")
            results["weights"]["int8+w8a8"] = {
                "perplexity": round(ppl8.perplexity, 4),
                "nll": round(ppl8.nll, 5),
                "acceptance_vector_head": [round(float(v), 4) for v in vec8[:6]],
                "accepted_per_step": round(acc8, 3),
            }
            log(f"weights int8+w8a8: ppl {ppl8.perplexity:.4f} "
                f"accepted/step {acc8:.3f}")

    for kv in ("none", "int8", "int4"):
        ppl = evaluate(target, tcfg, eval_ids, lengths,
                       chunk=args.eval_seq_len // 2,  # 2 chunks: the 2nd
                       kv_quant=None if kv == "none" else kv)  # reads q-KV
        _, acc = accept_stats(target, kv_quant=None if kv == "none" else kv)
        results["kv"][kv] = {
            "perplexity": round(ppl.perplexity, 4),
            "accepted_per_step": round(acc, 3),
        }
        log(f"kv {kv:5s}: ppl {ppl.perplexity:.4f} accepted/step {acc:.3f}")

    f32 = results["weights"]["f32"]["perplexity"]
    for name, row in results["weights"].items():
        row["ppl_delta_vs_f32"] = round(row["perplexity"] - f32, 4)
    with open(args.dst, "w") as f:
        json.dump(results, f, indent=1)
    log(f"-> {args.dst}")
    print(json.dumps({"quality_gate": results["weights"]}))


if __name__ == "__main__":
    main()
