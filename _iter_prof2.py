import time, numpy as np, jax, jax.numpy as jnp
from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.quant.quantize import random_quantized_model
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.trees.growmap import uniform_tree
from sequoia_tpu.planner.dp import plan
from sequoia_tpu.planner.profile import default_acceptance_vector

tcfg = get_config("llama-2-7b"); dcfg = get_config("llama-68m")
target = random_quantized_model(tcfg, jax.random.PRNGKey(0), bits=8)
draft = random_params(dcfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
jax.block_until_ready((target.embed, draft.embed))
prompt = np.random.default_rng(17).integers(10, tcfg.vocab_size, size=128)
p = default_acceptance_vector()
budgets=[1,2,4,8,16,32,64,128]; tt=[10.94,10.74,10.67,10.67,10.72,10.94,11.05,12.9]
gm64, _ = plan(p, budgets, [t/1e3 for t in tt], 0.79/1e3, max_depth=10)

def run(label, gm, algo):
    eng = SpecEngine(draft, dcfg, target, tcfg, gm, algorithm=algo,
                     max_length=256, temperature=0.6, top_p=0.9, prefill_chunk=128)
    eng.generate_fast(prompt, max_new_tokens=4)
    t0 = time.perf_counter()
    eng.generate_fast(prompt, max_new_tokens=96)
    dt = time.perf_counter() - t0
    it = max(eng.num_large_model_steps, 1)
    print(f"{label}: size={gm.size} depth={int(gm.depth.max())} steps={it} iter={dt/it*1e3:.2f} ms", flush=True)

run("sequoia planned64 SPARSE", gm64, "sequoia")
run("greedy  planned64       ", gm64, "greedy")
run("sequoia star64x1  SPARSE", uniform_tree(1, 63), "sequoia")
