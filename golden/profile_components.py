"""Per-component TPU timing: find where the pipeline time goes."""
import os, time
import numpy as np

import jax
import jax.numpy as jnp
import seal_embedded_tpu  # noqa
from seal_embedded_tpu.config import default_parms
from seal_embedded_tpu.ops import sampling as sp
from seal_embedded_tpu.ops.encode import encode
from seal_embedded_tpu.ops.ntt import ntt
from seal_embedded_tpu.ckks.limbwise import sym_encrypt_from_pte

B = int(os.environ.get("B", "1024"))
parms = default_parms(4096, 3)
n = parms.degree
rng = np.random.default_rng(0)
values = jnp.asarray(rng.uniform(-1, 1, (B, n // 2)).astype(np.float32))
sk = jnp.asarray((rng.integers(0, 3, n) - 1).astype(np.int32))
share = jnp.asarray(rng.integers(0, 2 ** 32, (B, 16)).astype(np.uint32))
err = jnp.asarray(rng.integers(0, 2 ** 32, (B, 16)).astype(np.uint32))
pte = jnp.asarray(rng.integers(-2**26, 2**26, (B, n)).astype(np.int64))
poly_u32 = jnp.asarray(rng.integers(0, parms.moduli[0], (B, n)).astype(np.uint32))
zero_ctr = jnp.zeros((B,), jnp.uint32)


def timeit(name, fn, *args, iters=5):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    # fetch barrier timing
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]
    dt = (time.time() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms  (compile {compile_s:.1f}s)")
    return dt


from functools import partial

timeit("encode(f64 ifft)", jax.jit(partial(encode, parms=parms)), values)
timeit("sample_cbd", jax.jit(partial(sp.sample_cbd, n=n)), err, zero_ctr)
timeit("sample_uniform(1 prime)",
       jax.jit(partial(sp.sample_uniform, n=n, q=parms.moduli[0])),
       share, zero_ctr)
timeit("ntt(1 prime)", jax.jit(partial(ntt, q=parms.moduli[0])), poly_u32)
timeit("from_pte reference layout",
       jax.jit(partial(sym_encrypt_from_pte, parms=parms, layout="reference")),
       pte, sk, share)
timeit("from_pte parallel layout",
       jax.jit(partial(sym_encrypt_from_pte, parms=parms, layout="parallel")),
       pte, sk, share)
