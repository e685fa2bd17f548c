import numpy as np, jax, jax.numpy as jnp
from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.planner.profile import time_forward_widths
from sequoia_tpu.quant.quantize import quantize_model

cfg = get_config("llama-68m")
params = random_params(cfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
t = time_forward_widths(params, cfg, [1, 8, 16, 32], max_length=256, kv_len=128)
print("draft bf16 unrolled, widths [1,8,16,32]:", [round(x*1e3,3) for x in t], flush=True)
q = quantize_model(params, bits=8)
t = time_forward_widths(q, cfg, [8], max_length=256, kv_len=128)
print("draft int8 unrolled, width 8:", round(t[0]*1e3,3), flush=True)
