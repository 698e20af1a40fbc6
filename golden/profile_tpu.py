"""Honest per-component TPU timing with fetch barriers.

Every timing fetches ONE element of the final output to force the full queue
to drain (block_until_ready is not a reliable fence on the axon tunnel); the
element is sliced on device first so only 4-8 bytes cross the tunnel and the
timed region is not inflated by device-to-host transfer of the whole buffer.
"""
import os, time, sys
import numpy as np
import jax
import jax.numpy as jnp
import seal_embedded_tpu  # noqa
from functools import partial
from seal_embedded_tpu.config import default_parms
from seal_embedded_tpu.ops import sampling as sp
from seal_embedded_tpu.ops import modarith as ma
from seal_embedded_tpu.ops.encode import encode_dd, encode
from seal_embedded_tpu.ops.ntt import ntt, ntt_tables_stacked, ntt_with_tables
from seal_embedded_tpu.ops.kernels.ntt import ntt_coeff_major
from seal_embedded_tpu.ops.kernels.keccak import shake256_words_kernel

B = int(os.environ.get("B", "1024"))
parms = default_parms(4096, 3)
n, L = parms.degree, parms.nprimes
moduli = tuple(int(q) for q in parms.moduli)
rng = np.random.default_rng(0)
values = jnp.asarray(rng.uniform(-1, 1, (B, n // 2)).astype(np.float32))
sk = jnp.asarray((rng.integers(0, 3, n) - 1).astype(np.int32))
share = jnp.asarray(rng.integers(0, 2**32, (B, 16)).astype(np.uint32))
err = jnp.asarray(rng.integers(0, 2**32, (B, 16)).astype(np.uint32))
pte = jnp.asarray(rng.integers(-2**26, 2**26, (B, n)).astype(np.int64))
x_lnb = jnp.asarray(np.stack(
    [rng.integers(0, q, (n, B)).astype(np.uint32) for q in moduli]))
x_bn = jnp.asarray(rng.integers(0, moduli[0], (B, n)).astype(np.uint32))
zero_ctr = jnp.zeros((B,), jnp.uint32)
ctr2 = jnp.zeros((B, 2), jnp.uint32)


def _fetch_one(out):
    """Drain the queue by fetching a single element (sliced on device)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, iters=10):
    fn = jax.jit(fn)
    t0 = time.time()
    _fetch_one(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _fetch_one(out)
    dt = (time.time() - t0) / iters
    print(f"{name:36s} {dt*1e3:9.2f} ms  (compile {compile_s:5.1f}s)", flush=True)
    return dt


which = sys.argv[1:] or ["all"]


def want(k):
    return "all" in which or k in which


if want("keccak"):
    timeit("keccak B x121blk (uniform base)",
           partial(shake256_words_kernel, nblocks=121), share, ctr2)
    qctr = jnp.zeros((B, 160, 2), jnp.uint32)
    timeit("keccak Bx160 x1blk (queue)",
           partial(shake256_words_kernel, nblocks=1), share[:, None, :], qctr)
    cctr = jnp.zeros((B, 256, 2), jnp.uint32)
    timeit("keccak Bx256 x1blk (cbd)",
           partial(shake256_words_kernel, nblocks=1), share[:, None, :], cctr)

if want("sample"):
    timeit("sample_uniform 1 prime", partial(sp.sample_uniform, n=n, q=moduli[0]),
           share, zero_ctr)
    timeit("sample_cbd", partial(sp.sample_cbd, n=n), err, zero_ctr)

if want("ntt"):
    timeit("ntt kernel (L,n,B)", partial(ntt_coeff_major, moduli=moduli), x_lnb)
    timeit("ntt jnp 1 limb (B,n)", partial(ntt, q=moduli[0]), x_bn)
    op, quot = (jnp.asarray(t) for t in ntt_tables_stacked(n, moduli))
    timeit("ntt jnp tables 1 limb (B,n)",
           partial(ntt_with_tables, q=moduli[0]), x_bn, op[0], quot[0])

if want("mod"):
    mod0 = ma.as_mod(moduli[0])
    timeit("reduce_pte_i64 x3", lambda p: jnp.stack(
        [ma.reduce_pte_i64(p, ma.as_mod(q)) for q in moduli]), pte)
    timeit("mul+add+neg mod (L,B,n)", lambda a: ma.add_mod(
        ma.neg_mod(ma.mul_mod(a, a, mod0), mod0), a, mod0),
        jnp.broadcast_to(x_bn, (L, B, n)))

if want("encode"):
    timeit("encode_dd", partial(encode_dd, parms=parms), values)
    timeit("encode f64", partial(encode, parms=parms), values)

if want("pipe"):
    from seal_embedded_tpu.ckks.fast import sym_encrypt_fused
    from seal_embedded_tpu.ckks.limbwise import sym_encrypt_limbscan
    timeit("FULL fused (dd encode)",
           partial(sym_encrypt_fused, parms=parms), values, sk, share, err)
    timeit("FULL limbwise reference",
           partial(sym_encrypt_limbscan, parms=parms), values, sk, share, err)
