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

Two communication plans, selected by `variant`:

* "staged": one `ppermute` block exchange per cross-device stage —
  log2(D) exchanges of S words per device.
* "4step": the blocked formulation (SURVEY.md S2.3 "transposed-blocks"):
  one all-to-all transpose so each device holds a (D, S/D) column panel,
  the log2(D) cross stages run device-LOCALLY over the column (block)
  axis, then a second all-to-all transposes back for the local stages.
  2 x S*(D-1)/D words per device total — less traffic than staged for
  D >= 4, and both exchanges are single fat all-to-alls that ride ICI
  at full duplex instead of log2(D) latency-bound hops.

Both are BIT-EXACT: the cross stages only ever combine elements with
equal intra-block offset, and for pair distance tt >= S every element of
a block shares one butterfly group (root index h + b*S//(2*tt) is
independent of the offset).  The 4-step column transform is therefore the
global stage loop restricted to a fixed offset — same lazy Harvey
accumulation, same operation order as ops.ntt.ntt (validated bit-for-bit
in tests/test_parallel.py on a virtual 8-device CPU mesh).
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


def _ntt_shard_body_4step(x, op, quot, *, n: int, q: int, n_shards: int,
                          axis: str):
    """4-step per-device body: local NTT-stage panel -> all-to-all ->
    column stages -> all-to-all -> local stages.  x (..., S) local block.
    """
    D = n_shards
    S = n // D
    C = S // D  # column-panel width after the transpose
    assert C >= 1, (n, D)
    d = jax.lax.axis_index(axis)
    two_q = np.uint32(2 * q)
    qv = np.uint32(q)
    batch_shape = x.shape[:-1]
    nb = len(batch_shape)
    v = x.astype(U32)

    def lazy_corr(u):
        return jnp.where(u >= two_q, u - two_q, u)

    # Step 1: transpose.  panel[b, c] = block b's element at d*C + c.
    panel = jax.lax.all_to_all(v.reshape(batch_shape + (D, C)), axis,
                               split_axis=nb, concat_axis=nb)

    # Step 2: the log2(D) cross-device stages, now LOCAL over the block
    # axis.  Root index for block b at stage h: h + (b >> (logD - k)) —
    # the ordinary DIT group index over the length-D block axis.
    h, ttb = 1, D // 2
    while ttb >= 1:
        pv = panel.reshape(batch_shape + (h, 2, ttb, C))
        u = lazy_corr(pv[..., 0, :, :])
        w = pv[..., 1, :, :]
        bshape = (1,) * nb + (h, 1, 1)
        t = mul_mod_shoup_lazy(w, op[h:2 * h].reshape(bshape),
                               quot[h:2 * h].reshape(bshape), q)
        panel = jnp.stack([u + t, u + two_q - t],
                          axis=-3).astype(U32).reshape(batch_shape + (D, C))
        h, ttb = h * 2, ttb // 2

    # Step 3: transpose back (all_to_all with split==concat is an
    # involution); device d again holds its contiguous block, with the
    # first log2(D) global stages applied.
    v = jax.lax.all_to_all(panel, axis, split_axis=nb,
                           concat_axis=nb).reshape(batch_shape + (S,))

    # Step 4: local stages (identical to the staged variant's tail).
    tt = S // 2
    while tt >= 1:
        g = S // (2 * tt)
        s_op = jax.lax.dynamic_slice_in_dim(op, h + d * g, g)
        s_quot = jax.lax.dynamic_slice_in_dim(quot, h + d * g, g)
        vv = v.reshape(batch_shape + (g, 2, tt))
        u = lazy_corr(vv[..., 0, :])
        w = vv[..., 1, :]
        bshape = (1,) * nb + (g, 1)
        t = mul_mod_shoup_lazy(w, s_op.reshape(bshape),
                               s_quot.reshape(bshape), q)
        v = jnp.stack([u + t, u + two_q - t],
                      axis=-2).astype(U32).reshape(batch_shape + (S,))
        h, tt = h * 2, tt // 2

    v = jnp.where(v >= two_q, v - two_q, v)
    v = jnp.where(v >= qv, v - qv, v)
    return v.astype(U32)


_BODIES = {"staged": _ntt_shard_body, "4step": _ntt_shard_body_4step}


@lru_cache(maxsize=64)
def _sharded_ntt_cache(mesh: Mesh, n: int, q: int, axis: str, nbatch: int,
                       variant: str):
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0 and n // n_shards >= 2, (n, n_shards)
    if variant == "4step" and n // n_shards < n_shards:
        variant = "staged"  # panel width would be <1; fall back
    op_np, quot_np = ntt_tables(n, q)
    op = jnp.asarray(op_np)
    quot = jnp.asarray(quot_np)
    spec_x = P(*((None,) * nbatch + (axis,)))

    body = partial(_BODIES[variant], n=n, q=q, n_shards=n_shards, axis=axis)
    fn = jax.shard_map(
        lambda x, o, qt: body(x, o, qt),
        mesh=mesh, in_specs=(spec_x, P(None), P(None)),
        out_specs=spec_x)
    return jax.jit(lambda x: fn(x, op, quot))


def ntt_coeff_sharded(mesh: Mesh, n: int, q: int, axis: str = "data",
                      variant: str = "4step"):
    """jit-compiled coefficient-sharded forward NTT over `mesh[axis]`.

    variant: "4step" (default; two all-to-alls, cross stages local over
    the transposed panel) or "staged" (one ppermute per cross stage).
    "4step" silently falls back to "staged" when n/D < D (panel too thin).

    Returns fn(x) for x u32 (..., n) with the last axis sharded over
    `axis`; output identical to ops.ntt.ntt(x, q).
    """
    def call(x):
        return _sharded_ntt_cache(mesh, n, int(q), axis, x.ndim - 1,
                                  variant)(x)
    return call
