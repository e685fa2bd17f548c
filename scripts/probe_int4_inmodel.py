#!/usr/bin/env python
"""In-model probe: XLA-native packed-int4 matmul via in-jit bitcast planes.

Monkeypatches the int4 branch of quant matmul to:
    w4 = lax.bitcast_convert_type(q_packed, int4)      # [K/2, N, 2]
    y  = x[:, :K/2] @ w4[...,0] + x[:, K/2:] @ w4[...,1]
(plane 0 = low nibble = first half of K under the half-split packing), then
times the full llama-2-7b width-64 verify forward. Single matmul microbench
is meaningless on this platform (fixed ~0.5 ms/rep overhead); the model
forward is the ruler: int8/xla = 11.3 ms (610 GB/s), int4/pallas = 16.2 ms.
"""

import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.planner.profile import time_forward_widths
    from sequoia_tpu.quant import qtensor
    from sequoia_tpu.quant.quantize import model_bytes, random_quantized_model

    log(f"devices: {jax.devices()}")

    orig_matmul = qtensor.matmul

    def matmul_bitcast4(x, w, *, preferred_element_type=None):
        if isinstance(w, qtensor.QuantizedTensor) and w.q.ndim == 2 \
                and x.ndim == 2 and w.q.shape[-2] * 2 == x.shape[-1]:
            half = w.q.shape[-2]
            w4 = jax.lax.bitcast_convert_type(w.q, jnp.int4)  # [half, N, 2]
            y = jnp.dot(x[:, :half], w4[..., 0].astype(x.dtype),
                        preferred_element_type=jnp.float32)
            y = y + jnp.dot(x[:, half:], w4[..., 1].astype(x.dtype),
                            preferred_element_type=jnp.float32)
            y = y * w.scale.astype(y.dtype)
            return y.astype(x.dtype if preferred_element_type is None
                            else preferred_element_type)
        return orig_matmul(x, w, preferred_element_type=preferred_element_type)

    # correctness vs the dequantize reference
    cfg = get_config("llama-2-7b")
    K, N = 512, 256
    wq = qtensor.quantize_int4(
        jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.02)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, K), jnp.bfloat16)
    ref = np.asarray(x, np.float32) @ np.asarray(
        qtensor.dequantize(wq, K, jnp.float32))
    got = np.asarray(jax.jit(matmul_bitcast4)(x, wq), np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    log(f"bitcast4 rel err vs dequant reference: {err:.4f}")
    assert err < 0.02, err

    t0 = time.perf_counter()
    p4 = random_quantized_model(cfg, jax.random.PRNGKey(0), bits=4)
    jax.block_until_ready(p4.embed)
    log(f"int4 init: {time.perf_counter() - t0:.0f}s")
    nbytes = model_bytes(p4)

    for tag, mm in [("int4/bitcast-xla", matmul_bitcast4)]:
        qtensor.matmul = mm
        # core.model imports `matmul as qmm` — patch there too
        import sequoia_tpu.core.model as model_mod
        orig_model_mm = model_mod.qmm
        model_mod.qmm = mm
        try:
            t = time_forward_widths(p4, cfg, [64], max_length=256, kv_len=128,
                                    warmup=1, reps=30)[0]
            log(f"{tag}: {t * 1e3:7.3f} ms/fwd  "
                f"({nbytes / 1e9:.2f} GB -> {nbytes / t / 1e9:6.0f} GB/s eff)")
        except Exception as e:
            log(f"{tag} FAILED: {type(e).__name__}: {str(e)[:300]}")
        finally:
            qtensor.matmul = orig_matmul
            model_mod.qmm = orig_model_mm


if __name__ == "__main__":
    main()
