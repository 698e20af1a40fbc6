"""Coefficient-sharded (sequence-parallel) negacyclic NTT via shard_map.

One transform of degree n is sharded over D devices, each owning a
contiguous coefficient block of S = n/D.  The reference's stage loop
(device/lib/ntt.c:140-165, rounds h=1..n/2 with pair distance tt = n/2h)
maps onto the mesh as:

* the first log2(D) stages have pair distance tt >= S: butterfly partners
  live on another device.  Partner blocks are whole shards, exchanged with
  a single `jax.lax.ppermute` per stage (each device sends its block to its
  partner and receives the partner's); the per-device root is a scalar
  (the whole block sits inside one butterfly group).
* the remaining stages are device-local: each block holds S/(2*tt) whole
  groups, whose roots are a contiguous slice of the (replicated) bitrev-
  indexed Shoup table, selected per device with a dynamic slice.

This is the staged-exchange formulation of SURVEY.md S2.3 ("stages with
tt >= shard_size are cross-device, rest local").  Communication volume is
S words per device per cross stage (log2(D) stages); the blocked 4-step
variant (local NTTs -> one all-to-all transpose -> twiddle -> local NTTs)
trades that for a single exchange and is the production plan for deep
meshes — the single-chip Pallas kernel (ops/kernels/ntt.py) already uses
its local form.

Bit-exact: identical lazy Harvey accumulation and operation order as
ops.ntt.ntt (validated in tests/test_parallel.py on a virtual 8-device CPU
mesh against the single-device path).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.modarith import U32, mul_mod_shoup_lazy
from ..ops.ntt import ntt_tables


def _ntt_shard_body(x, op, quot, *, n: int, q: int, n_shards: int,
                    axis: str):
    """Per-device body: x (..., S) local block; op/quot (n,) replicated."""
    S = n // n_shards
    d = jax.lax.axis_index(axis)
    two_q = np.uint32(2 * q)
    qv = np.uint32(q)
    batch_shape = x.shape[:-1]
    v = x.astype(U32)

    def lazy_corr(u):
        return jnp.where(u >= two_q, u - two_q, u)

    h, tt = 1, n // 2
    # Cross-device stages: pair distance spans >= one shard.
    while tt >= S:
        bdist = tt // S  # partner distance in blocks
        partner = d ^ bdist
        perm = [(a, a ^ bdist) for a in range(n_shards)]
        recv = jax.lax.ppermute(v, axis, perm)
        is_u = (d & bdist) == 0
        # Group index of this device's block: j = (d*S) // (2*tt).
        j = (d * S) // (2 * tt)
        s_op = jax.lax.dynamic_index_in_dim(op, h + j, keepdims=False)
        s_quot = jax.lax.dynamic_index_in_dim(quot, h + j, keepdims=False)
        u = jnp.where(is_u, v, recv)
        w = jnp.where(is_u, recv, v)
        u = lazy_corr(u)
        t = mul_mod_shoup_lazy(w, s_op, s_quot, q)
        v = jnp.where(is_u, u + t, u + two_q - t).astype(U32)
        h, tt = h * 2, tt // 2
        del partner  # pairing is symmetric; perm covers both directions

    # Local stages: the block holds whole groups.
    while tt >= 1:
        g = S // (2 * tt)  # groups in this block
        # Global first group of this block: g0 = d * g.
        s_op = jax.lax.dynamic_slice_in_dim(op, h + d * g, g)
        s_quot = jax.lax.dynamic_slice_in_dim(quot, h + d * g, g)
        vv = v.reshape(batch_shape + (g, 2, tt))
        u = lazy_corr(vv[..., 0, :])
        w = vv[..., 1, :]
        bshape = (1,) * len(batch_shape) + (g, 1)
        t = mul_mod_shoup_lazy(w, s_op.reshape(bshape),
                               s_quot.reshape(bshape), q)
        v = jnp.stack([u + t, u + two_q - t],
                      axis=-2).astype(U32).reshape(batch_shape + (S,))
        h, tt = h * 2, tt // 2

    v = jnp.where(v >= two_q, v - two_q, v)
    v = jnp.where(v >= qv, v - qv, v)
    return v.astype(U32)


@lru_cache(maxsize=32)
def _sharded_ntt_cache(mesh: Mesh, n: int, q: int, axis: str, nbatch: int):
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0 and n // n_shards >= 2, (n, n_shards)
    op_np, quot_np = ntt_tables(n, q)
    op = jnp.asarray(op_np)
    quot = jnp.asarray(quot_np)
    spec_x = P(*((None,) * nbatch + (axis,)))

    body = partial(_ntt_shard_body, n=n, q=q, n_shards=n_shards, axis=axis)
    fn = jax.shard_map(
        lambda x, o, qt: body(x, o, qt),
        mesh=mesh, in_specs=(spec_x, P(None), P(None)),
        out_specs=spec_x)
    return jax.jit(lambda x: fn(x, op, quot))


def ntt_coeff_sharded(mesh: Mesh, n: int, q: int, axis: str = "data"):
    """jit-compiled coefficient-sharded forward NTT over `mesh[axis]`.

    Returns fn(x) for x u32 (..., n) with the last axis sharded over
    `axis`; output identical to ops.ntt.ntt(x, q).
    """
    def call(x):
        return _sharded_ntt_cache(mesh, n, int(q), axis, x.ndim - 1)(x)
    return call
