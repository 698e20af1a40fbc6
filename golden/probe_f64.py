import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(42)
N = 100000
a = rng.uniform(-1e6, 1e6, N)
b = rng.uniform(-1e6, 1e6, N)
dev = jax.devices()[0]
ja, jb = jax.device_put(a, dev), jax.device_put(b, dev)

for name, f in [('add', lambda x, y: x + y), ('mul', lambda x, y: x * y),
                ('fma-ish', lambda x, y: x * y + x), ('div', lambda x, y: x / y)]:
    got = np.asarray(jax.jit(f)(ja, jb))
    want = f(a, b)
    neq = np.sum(got.view(np.uint64) != want.view(np.uint64))
    print(f'f64 {name}: {neq}/{N} bit-mismatches')

# int64 mul exactness
ia = rng.integers(-2**62, 2**62, N)
ib = rng.integers(-2**31, 2**31, N)
got = np.asarray(jax.jit(lambda x, y: x * y)(jax.device_put(ia, dev), jax.device_put(ib, dev)))
print('i64 mul mismatches:', np.sum(got != ia * ib))

# u32 mulhi via u64
ua = rng.integers(0, 2**32, N, dtype=np.uint64)
ub = rng.integers(0, 2**32, N, dtype=np.uint64)
got = np.asarray(jax.jit(lambda x, y: (x * y) >> 32)(jax.device_put(ua, dev), jax.device_put(ub, dev)))
print('u64 mulhi mismatches:', np.sum(got != (ua * ub) >> np.uint64(32)))

# f64 -> i64 cast (rounding toward zero like C cast?)
x = rng.uniform(-1e15, 1e15, N)
got = np.asarray(jax.jit(lambda v: v.astype(jnp.int64))(jax.device_put(x, dev)))
print('f64->i64 cast mismatches:', np.sum(got != x.astype(np.int64)))

# floor + abs f64
got = np.asarray(jax.jit(lambda v: jnp.floor(jnp.abs(v) + 0.5))(jax.device_put(x, dev)))
want = np.floor(np.abs(x) + 0.5)
print('floor(|x|+0.5) mismatches:', np.sum(got.view(np.uint64) != want.view(np.uint64)))
