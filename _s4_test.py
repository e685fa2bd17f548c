import time, numpy as np, jax, jax.numpy as jnp
from jax import lax

# nibble order probe: byte 0x21 -> nibbles (1, 2)? or (2, 1)?
@jax.jit
def probe():
    b = jnp.asarray([[0x21]], jnp.int8)  # high=2 low=1
    return lax.bitcast_convert_type(b, jnp.int4).astype(jnp.int8)
print("bitcast nibbles of 0x21:", np.asarray(probe()))

L, K, N = 12, 4096, 11008
@jax.jit
def make(key):
    w = jax.random.randint(key, (L, K, N), -7, 8, jnp.int8)
    # pack column-pairs: byte = (w[..., 2n+?] nibbles) — order per probe
    lo = w[..., 0::2] & 0x0F
    hi = (w[..., 1::2] & 0x0F) << 4
    packed = (lo | hi).astype(jnp.int8)   # [L, K, N/2]
    return w, packed
w8, wp = make(jax.random.PRNGKey(0))
jax.block_until_ready((w8, wp))
x = jnp.asarray(np.random.default_rng(0).normal(size=(8, K)), jnp.bfloat16)

@jax.jit
def dot_s4(x, packed):
    w4 = lax.bitcast_convert_type(packed, jnp.int4)          # [K, N/2, 2]
    w4 = w4.reshape(packed.shape[0], packed.shape[1] * 2)     # [K, N]
    return jnp.dot(x, w4.astype(jnp.bfloat16), preferred_element_type=jnp.float32)

y = dot_s4(x, wp[0])
ref = jnp.dot(x, w8[0].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
print("correct:", np.allclose(np.asarray(y), np.asarray(ref)))

def sweep(fn, w, label, bytes_per):
    @jax.jit
    def f(x, w):
        def body(carry, wl):
            x, acc = carry
            y = fn(x, wl)
            return (x + y[:, :K].astype(x.dtype) * 1e-9, acc + jnp.sum(y)), None
        (x, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), w)
        return acc
    jax.block_until_ready(f(x, w))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x, w))
    dt = (time.perf_counter() - t0) / L * 1e3
    print(f"{label}: {dt:.3f} ms/layer ({K*N*bytes_per/1e9/dt*1e3:.0f} GB/s)", flush=True)

sweep(lambda x, wl: jnp.dot(x, wl.astype(jnp.bfloat16), preferred_element_type=jnp.float32), w8, "s8 convert+dot", 1.0)
sweep(dot_s4, wp, "s4 bitcast+convert+dot", 0.5)
