import time, numpy as np, jax, jax.numpy as jnp
from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.quant.quantize import random_quantized_model
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.planner.dp import plan, expected_accepted
from sequoia_tpu.planner.profile import default_acceptance_vector

tcfg = get_config("llama-2-7b"); dcfg = get_config("llama-68m")
target = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
draft = random_params(dcfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
jax.block_until_ready((target.embed, draft.embed))
prompt = np.random.default_rng(17).integers(10, tcfg.vocab_size, size=128)
p = default_acceptance_vector()
budgets=[1,2,4,8,16,32,64,128]; tt=[10.94,10.74,10.67,10.67,10.72,10.94,11.05,12.9]

for dt_ms in [0.4, 0.2, 0.1]:
    gm, _ = plan(p, budgets, [t/1e3 for t in tt], dt_ms/1e3, max_depth=14)
    e = expected_accepted(gm, p)
    eng = SpecEngine(draft, dcfg, target, tcfg, gm, algorithm="sequoia",
                     max_length=288, temperature=0.6, top_p=0.9, prefill_chunk=128)
    eng.generate_fast(prompt, max_new_tokens=4)
    t0 = time.perf_counter()
    eng.generate_fast(prompt, max_new_tokens=96)
    d = time.perf_counter() - t0
    it = max(eng.num_large_model_steps, 1)
    ms = d/it*1e3
    print(f"dt={dt_ms}: size={gm.size} depth={int(gm.depth.max())} E={e:.3f} "
          f"iter={ms:.2f} ms -> per-token {ms/e:.2f} ms, speedup {11.24/(ms/e):.2f}x", flush=True)
