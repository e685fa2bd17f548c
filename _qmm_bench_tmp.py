import time, sys, functools, numpy as np, jax
import sequoia_tpu.kernels.quant_matmul as qm
from sequoia_tpu.core.config import get_config
from sequoia_tpu.quant.quantize import random_quantized_model
from sequoia_tpu.quant.qtensor import set_quant_matmul_impl
from sequoia_tpu.engine.baseline import ARBaseline

bits = int(sys.argv[1])
cfg = get_config("llama-2-7b")
rng = np.random.default_rng(17)
prompt = rng.integers(10, cfg.vocab_size, size=128)
params = random_quantized_model(cfg, jax.random.PRNGKey(0), bits=bits)
jax.block_until_ready(params.embed)
set_quant_matmul_impl("pallas")
orig = qm.quant_matmul
for bn, bk in [(512, 2048), (1024, 4096), (2048, 4096), (1024, 11008), (4096, 11008)]:
    qm.quant_matmul = functools.partial(orig, block_n=bn, block_k=bk)
    try:
        ar = ARBaseline(params, cfg, max_length=256, greedy=False, prefill_chunk=128)
        t0 = time.perf_counter(); ar.generate_fast(prompt, max_new_tokens=8)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = ar.generate_fast(prompt, max_new_tokens=96)
        dt = (time.perf_counter() - t0) / (len(out) - len(prompt))
        print(f"int{bits} pallas bn={bn} bk={bk}: {dt*1e3:.2f} ms/token (compile {c:.0f}s)", flush=True)
    except Exception as e:
        print(f"int{bits} pallas bn={bn} bk={bk}: FAIL {type(e).__name__}", flush=True)
qm.quant_matmul = orig
