#!/usr/bin/env python
"""int4 strategy sweep at llama-2-7b verify shapes (VERDICT #3): the fused
Pallas kernel's three unpack variants vs the int8 XLA path (with w8a8
routing), full-model forward, widths 1..256.

Decides whether int4 can be the FASTEST single-chip verify path (not just
the capacity path): int4 streams half int8's bytes, and the w4a8 variant
additionally runs its dots on the int8 MXU mode, so wide verifies stay off
the bf16 compute roof."""

import os as _os, sys
import time

sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    log(f"devices: {jax.devices()}")

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.kernels import quant_matmul as qmk
    from sequoia_tpu.planner.profile import time_forward_widths
    from sequoia_tpu.quant.quantize import random_quantized_model

    cfg = get_config("llama-2-7b")
    widths = (1, 64, 128, 192, 256)

    p8 = random_quantized_model(cfg, jax.random.PRNGKey(0), bits=8)
    jax.block_until_ready(p8.embed)
    tt = time_forward_widths(p8, cfg, widths, max_length=512, kv_len=128,
                             reps=20)
    log(f"int8/xla(w8a8 auto): {[(w, round(t*1e3, 2)) for w, t in zip(widths, tt)]}")
    del p8

    p4 = random_quantized_model(cfg, jax.random.PRNGKey(0), bits=4)
    jax.block_until_ready(p4.embed)
    orig = qmk.quant_matmul
    for unpack in ("shift", "float", "w4a8"):
        import functools

        qmk_wrapped = functools.partial(orig, unpack=unpack)
        # route the model's matmuls through this unpack variant
        import sequoia_tpu.quant.qtensor as qt

        qt_orig = qt.matmul

        def routed(x, w, *, preferred_element_type=None, _u=unpack):
            if isinstance(w, qt.QuantizedTensor) and w.q.shape[-2] * 2 == x.shape[-1] \
                    and x.ndim == 2 and w.q.ndim == 2:
                from sequoia_tpu.kernels.quant_matmul import quant_matmul

                return quant_matmul(x, w.q, w.scale.astype(jnp.float32),
                                    bits=4, unpack=_u,
                                    out_dtype=preferred_element_type)
            return qt_orig(x, w, preferred_element_type=preferred_element_type)

        import sequoia_tpu.core.model as model_mod

        model_mod.qmm = routed
        try:
            tt4 = time_forward_widths(p4, cfg, widths, max_length=512,
                                      kv_len=128, reps=20)
            log(f"int4/{unpack:6s}: "
                f"{[(w, round(t*1e3, 2)) for w, t in zip(widths, tt4)]}")
        except Exception as e:
            log(f"int4/{unpack}: FAILED {type(e).__name__}: {str(e)[:160]}")
        finally:
            model_mod.qmm = qt_orig


if __name__ == "__main__":
    main()
