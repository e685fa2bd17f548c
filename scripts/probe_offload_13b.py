"""Offloaded 13B bf16 (26 GB > 16 GB HBM) AR decode on one v5e chip."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def log(*a): print(*a, file=sys.stderr, flush=True)

import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from sequoia_tpu.core.config import get_config
from sequoia_tpu.engine.offload import random_offloaded_params, offloaded_bytes
from sequoia_tpu.engine.baseline import ARBaseline

log("devices:", jax.devices())
cfg = get_config("llama-2-13b")
t0 = time.perf_counter()
p = random_offloaded_params(cfg, seed=0, dtype=jnp.bfloat16, stay_layers=4)
host, dev = offloaded_bytes(p)
log(f"init {time.perf_counter()-t0:.0f}s: host {host/1e9:.1f} GB, device {dev/1e9:.1f} GB")
ar = ARBaseline(p, cfg, max_length=256, greedy=True, prefill_chunk=128)
prompt = np.random.default_rng(0).integers(10, cfg.vocab_size, size=128)
t0 = time.perf_counter()
out = ar.generate_fast(prompt, max_new_tokens=4)
log(f"warmup+compile {time.perf_counter()-t0:.0f}s")
t0 = time.perf_counter()
out = ar.generate_fast(prompt, max_new_tokens=32)
dt = (time.perf_counter() - t0) / (len(out) - len(prompt))
log(f"offloaded 13B bf16 AR: {dt*1e3:.1f} ms/token "
    f"(weight stream {host/1e9:.1f} GB/token -> {host/1e9/dt:.1f} GB/s effective)")
