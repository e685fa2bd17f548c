import time, sys, numpy as np, jax, jax.numpy as jnp
from functools import partial
from sequoia_tpu.quant.qtensor import quantize_int8, quantize_int4, matmul, set_quant_matmul_impl, QuantizedTensor
from sequoia_tpu.kernels.quant_matmul import quant_matmul

rng = np.random.default_rng(0)
R = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K, N, W, REPS = 4096, 11008, 8, 6   # W distinct weights; working set > VMEM

x = jnp.asarray(rng.normal(size=(R, K)), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(W, K, N)), jnp.float32)

def bench(make_one, q, s, label, gb):
    @jax.jit
    def loop(x, q, s):
        def body(i, carry):
            acc, x = carry
            def inner(j, acc2):
                y = make_one(x, q[j], s[j])
                return acc2 + jnp.sum(y[0]).astype(jnp.float32)
            acc = inner if False else jax.lax.fori_loop(0, W, inner, acc)
            return (acc, x + acc.astype(x.dtype) * 0)
        acc, _ = jax.lax.fori_loop(0, REPS, body, (jnp.float32(0), x))
        return acc
    jax.block_until_ready(loop(x, q, s))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(x, q, s))
    dt = (time.perf_counter() - t0) / (REPS * W)
    print(f"{label}: {dt*1e3:.3f} ms/matmul ({gb/dt:.0f} GB/s)", flush=True)

for bits, qf in [(8, quantize_int8), (4, quantize_int4)]:
    qt = jax.jit(jax.vmap(qf))(w)
    jax.block_until_ready(qt)
    gb = qt.q.size / W / 1e9
    for bn, bk in [(512, 1024), (1024, 2048), (2816 if bits==8 else 1376, 4096), (11008, 512)]:
        try:
            bench(lambda x, q, s, bn=bn, bk=bk: quant_matmul(x, q, s, bits=bits, block_n=bn, block_k=bk),
                  qt.q, qt.scale, f"pallas int{bits} R={R} bn={bn} bk={bk}", gb)
        except Exception as e:
            print(f"pallas int{bits} bn={bn} bk={bk}: FAIL {type(e).__name__}", flush=True)
    set_quant_matmul_impl("xla")
    bench(lambda x, q, s: matmul(x, QuantizedTensor(q, s)), qt.q, qt.scale, f"xla int{bits} R={R}", gb)
    del qt
