"""Per-component TPU timing at the deep chain (n=16384, L=13, B=1024):
pins the pipeline budget for BASELINE.md.  Fencing per bench.py (_fetch
one element; min of reps)."""
import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import seal_embedded_tpu  # noqa
from seal_embedded_tpu.config import default_parms
from seal_embedded_tpu.ckks.fast import _mods_bcast, _ntt_all_limbs
from seal_embedded_tpu.ops import modarith as ma
from seal_embedded_tpu.ops import sampling as sp
from seal_embedded_tpu.ops.encode import encode_any

B = int(os.environ.get("B", "1024"))
parms = default_parms(16384, 13)
n, L = parms.degree, parms.nprimes
moduli = tuple(int(q) for q in parms.moduli)
rng = np.random.default_rng(0)
values = jnp.asarray(rng.uniform(-1, 1, (B, n // 2)).astype(np.float32))
share = jnp.asarray(rng.integers(0, 2 ** 32, (B, 16)).astype(np.uint32))
err = jnp.asarray(rng.integers(0, 2 ** 32, (B, 16)).astype(np.uint32))
pte = jnp.asarray(rng.integers(-2 ** 40, 2 ** 40, (B, n)).astype(np.int64))
ntt_s = jnp.asarray(np.stack(
    [rng.integers(0, q, n).astype(np.uint32) for q in moduli]))
a_lbn = jnp.asarray(np.stack(
    [rng.integers(0, q, (B, n)).astype(np.uint32) for q in moduli]))


def fetch_one(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, iters=4, reps=3):
    t0 = time.time()
    fetch_one(fn(*args))
    compile_s = time.time() - t0
    best = None
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        fetch_one(out)
        avg = (time.time() - t0) / iters
        best = avg if best is None else min(best, avg)
    print(f"{name:36s} {best * 1e3:9.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return best


qcap = sp.queue_cap_for(n, parms.moduli)
mods = ma.Mod(*(jnp.asarray(f) for f in ma.modpack(parms.moduli)))
mods_b = _mods_bcast(parms)


def scan_sampler(share):
    def step(carry, mod):
        counter, ok = carry
        a, counter, ok_u = sp.sample_uniform(share, counter, n, mod,
                                             queue_cap=qcap)
        return (counter, ok & ok_u), a
    (c, ok), a = jax.lax.scan(
        step, (sp.counter_zero((B,)), jnp.ones((B,), bool)), mods, length=L)
    return a, ok


def red_ntt(pte):
    pte_red = ma.reduce_pte_i64(pte[None], mods_b)
    return _ntt_all_limbs(pte_red, moduli)


def epilogue(a, ntt_s, ntt_pte):
    as_ = ma.mul_mod(a, ntt_s[:, None, :], mods_b)
    return ma.add_mod(ma.neg_mod(as_, mods_b), ntt_pte, mods_b)


t_enc = timeit("encode sf", jax.jit(partial(encode_any, parms=parms,
                                            mode="sf")), values)
t_cbd = timeit("sample_cbd", jax.jit(partial(sp.sample_cbd, n=n)), err,
               jnp.zeros((B, 2), jnp.uint32))
t_u1 = timeit("sample_uniform x1 (cap 456)",
              jax.jit(partial(sp.sample_uniform, n=n, q=moduli[0],
                              queue_cap=qcap)),
              share, jnp.zeros((B, 2), jnp.uint32))
t_scan = timeit("13-limb uniform scan", jax.jit(scan_sampler), share)
t_ntt = timeit("reduce_pte + 13-limb NTT", jax.jit(red_ntt), pte)
ntt_pte = jax.jit(red_ntt)(pte)
t_epi = timeit("epilogue mul/neg/add", jax.jit(epilogue), a_lbn, ntt_s,
               ntt_pte)
tot = t_enc + t_cbd + t_scan + t_ntt + t_epi
print(f"{'sum of parts':36s} {tot * 1e3:9.2f} ms", flush=True)
