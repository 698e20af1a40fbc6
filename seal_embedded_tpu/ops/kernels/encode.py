"""Pallas TPU kernel: bit-exact CKKS encode IFFT (software IEEE-754 f64).

The sf encode (ops/encode.py encode_sf) is exact but XLA-codegen-bound:
the 12-round butterfly chain of ~900 integer lane-ops per pair compiles
to erratic fusions (measured: removing ops can SLOW it).  This kernel
takes the hot first rounds into Mosaic where tiling and fusion are
explicit:

* the IFFT's round-r butterflies (pair distance 2^r in natural order)
  are BLOCK-LOCAL for 2^(r+1) <= BLOCK: with BLOCK = 1024, rounds
  0..9 of any degree n >= 1024 touch only contiguous 1024-coefficient
  blocks — a perfectly tileable grid (batch-tile x block) with all
  butterflies on the SUBLANE axis (coefficient-major (n, B) layout, the
  same layout as the NTT kernel; zero lane shuffles);
* inside a block the rounds run in constant (Pease) geometry — pair
  adjacent rows, concat halves — with per-block per-round PER-PAIR
  twiddle planes precomputed host-side in (pairs, rounds) layout so no
  in-kernel transpose is needed; the block-local permutation is undone
  by one static gather afterwards;
* all f64 arithmetic is ops/f64p.py (u32-pair planes — Mosaic has no
  64-bit types), bit-identical to ops/f64x.py and therefore to IEEE;
  the no-subnormal guard accumulates in-kernel and joins the pipeline
  ok flag (f64x.safe_e_floor() contract);
* the remaining log2(n/1024) cross-block rounds + scale/round run as
  the ordinary f64x jnp tail on the kernel's output planes.

Bit-exactness: asserted against encode_sf (itself golden-anchored to
the C reference) in tests/test_kernels.py, interpret-mode on CPU, and
compiled + bit-verified on a real v5e chip.

Performance status (measured v5e, B=1024, n=4096): this kernel runs the
full encode in ~86 ms vs ~36 ms for the XLA encode_sf — Mosaic allocates
one spill slot per value across the ~1000-op straight-line f64p round
body (65 MB scoped VMEM at BLOCK=512; the fully unrolled variant wants
140 MB), and the resulting spill traffic dominates.  The XLA path
therefore stays the default; this kernel is the opt-in
encode mode "sfk" (encode_any) and the starting point for future Mosaic
scheduling work (segmenting the round body, register-tiling pairs).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import Parms  # noqa: F401  (typing/doc only)

BLOCK = 128
TLANE = 128
U32 = jnp.uint32
I32 = jnp.int32


@lru_cache(maxsize=16)
def _block_pease(n: int):
    """Block-local constant-geometry schedule for rounds 0..log2(B)-1.

    Returns (tw (nblocks, BLOCK/2, nrounds, 4) f64-plane stack packed as
    separate arrays, inv (BLOCK,) block-local inverse permutation,
    nrounds).  Twiddle planes are (s u32, e i32, mhi u32, mlo u32) in
    (pair, round) layout."""
    from ..encode import ifft_root_tables
    from ..f64x import from_np_f64
    from ..f64p import split_np
    from collections import namedtuple

    blk = min(BLOCK, n)
    nrounds = blk.bit_length() - 1
    nblocks = n // blk
    tables = ifft_root_tables(n)

    lam = np.arange(blk)
    # global group of pair: for block b, round r (tt = 2^r):
    #   j_glob = (b*blk + natural_u_index) // (2*tt)
    per_block_idx = np.zeros((nrounds, blk // 2), np.int64)
    for r in range(nrounds):
        tt = 1 << r
        lu, lw = lam[0::2], lam[1::2]
        assert np.all((lu ^ lw) == tt) and np.all(((lu // tt) & 1) == 0)
        per_block_idx[r] = lu // (2 * tt)
        lam = np.concatenate([lu, lw])
    inv = np.argsort(lam).astype(np.int32)

    # (nblocks, blk/2, nrounds) per twiddle plane.
    tw_s = np.zeros((nblocks, blk // 2, nrounds), np.uint32)
    tw_e = np.zeros((nblocks, blk // 2, nrounds), np.int32)
    tw_mhi = np.zeros((nblocks, blk // 2, nrounds), np.uint32)
    tw_mlo = np.zeros((nblocks, blk // 2, nrounds), np.uint32)
    tw2_s = np.zeros_like(tw_s)
    tw2_e = np.zeros_like(tw_e)
    tw2_mhi = np.zeros_like(tw_mhi)
    tw2_mlo = np.zeros_like(tw_mlo)
    for b in range(nblocks):
        for r in range(nrounds):
            h_loc = blk >> (r + 1)
            j = b * h_loc + per_block_idx[r]
            pre = split_np(from_np_f64(tables[r][0][j]))
            pim = split_np(from_np_f64(tables[r][1][j]))
            tw_s[b, :, r], tw_e[b, :, r] = pre.s, pre.e
            tw_mhi[b, :, r], tw_mlo[b, :, r] = pre.mhi, pre.mlo
            tw2_s[b, :, r], tw2_e[b, :, r] = pim.s, pim.e
            tw2_mhi[b, :, r], tw2_mlo[b, :, r] = pim.mhi, pim.mlo
    TW = namedtuple("TW", "s e mhi mlo")
    return (TW(tw_s, tw_e, tw_mhi, tw_mlo),
            TW(tw2_s, tw2_e, tw2_mhi, tw2_mlo), inv, nrounds, nblocks, blk)


def _kernel(vals_ref, trs, tre, trh, trl, tis, tie, tih, til,
            res_ref, ree_ref, reh_ref, rel_ref,
            ims_ref, ime_ref, imh_ref, iml_ref, acc_ref,
            *, nrounds: int, blk: int):
    from .. import f64p as fp

    re = fp.from_f32(vals_ref[:])
    z32 = jnp.zeros((blk, TLANE), U32)
    im = fp.F64P(z32, jnp.full((blk, TLANE), fp.E_ZERO, I32), z32, z32)
    acc = jnp.zeros((blk // 2, TLANE), I32)

    # Twiddle planes: (blk/2, nrounds) in VMEM.  Round r's column is
    # picked with a masked lane reduction (dynamic lane slicing is not a
    # Mosaic strength; nrounds <= 10 lanes makes the reduce trivial).
    tw_planes = [trs[:], tre[:], trh[:], trl[:],
                 tis[:], tie[:], tih[:], til[:]]
    lane_id = jax.lax.broadcasted_iota(I32, (blk // 2, nrounds), 1)

    def col(p, r):
        sel = lane_id == r
        return jnp.sum(jnp.where(sel, p.astype(I32), jnp.int32(0)),
                       axis=1, keepdims=True, dtype=I32)

    def halves(x):
        p = x.reshape(blk // 2, 2, TLANE)
        return p[:, 0, :], p[:, 1, :]

    def split(v):
        us, ws = halves(v.s)
        ue, we = halves(v.e)
        uh, wh = halves(v.mhi)
        ul, wl = halves(v.mlo)
        return fp.F64P(us, ue, uh, ul), fp.F64P(ws, we, wh, wl)

    def cat(u, w):
        return fp.F64P(*(jnp.concatenate(p, axis=0) for p in zip(u, w)))

    # One fori_loop over rounds: the body is traced ONCE, bounding the
    # spill footprint to a single round's liveness (a fully unrolled
    # version measures ~140 MB of Mosaic spill slots — far over VMEM).
    def body(r, carry):
        re, im, acc = carry
        cols = [col(p, r) for p in tw_planes]
        sre = fp.F64P(cols[0].astype(U32), cols[1],
                      cols[2].astype(U32), cols[3].astype(U32))
        sim = fp.F64P(cols[4].astype(U32), cols[5],
                      cols[6].astype(U32), cols[7].astype(U32))

        ure, wre = split(re)
        uim, wim = split(im)
        are, dre = fp.add_sub(ure, wre)
        aim, dim_ = fp.add_sub(uim, wim)
        p1 = fp.mul(dre, sre, b_nonzero=True)
        p2 = fp.mul(dim_, sim, b_nonzero=True)
        p3 = fp.mul(dre, sim, b_nonzero=True)
        p4 = fp.mul(dim_, sre, b_nonzero=True)
        bre = fp.sub(p1, p2)
        bim = fp.add(p3, p4)
        acc = fp.guard_min_e(acc, dre, dim_, p1, p2, p3, p4,
                             bre, bim, are, aim)
        return cat(are, bre), cat(aim, bim), acc

    # i32 bounds: an i64 loop index cannot even be *cast* inside a
    # Mosaic trace under x64 (convert_element_type recursion).
    re, im, acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nrounds),
                                    body, (re, im, acc))

    res_ref[:], ree_ref[:] = re.s, re.e
    reh_ref[:], rel_ref[:] = re.mhi, re.mlo
    ims_ref[:], ime_ref[:] = im.s, im.e
    imh_ref[:], iml_ref[:] = im.mhi, im.mlo
    acc_ref[:] = jnp.broadcast_to(acc.min(axis=0, keepdims=True),
                                  (8, TLANE)).astype(I32)[None]


@lru_cache(maxsize=16)
def _encode_call(n: int, bpad: int, interpret: bool):
    twr, twi, inv, nrounds, nblocks, blk = _block_pease(n)
    ntiles = bpad // TLANE

    _0 = np.int32(0)  # index-map literals must be i32 (x64 mode)

    def v_spec():
        return pl.BlockSpec((blk, TLANE), lambda t, b: (b, t))

    def tw_spec():
        return pl.BlockSpec((1, blk // 2, nrounds), lambda t, b: (b, _0, _0))

    grid = (ntiles, nblocks)
    out_specs = [pl.BlockSpec((blk, TLANE), lambda t, b: (b, t))
                 for _ in range(8)]
    out_specs.append(pl.BlockSpec((1, 8, TLANE), lambda t, b: (b, _0, t)))
    out_shape = [jax.ShapeDtypeStruct((n, bpad), U32) for _ in range(8)]
    out_shape[1] = jax.ShapeDtypeStruct((n, bpad), I32)   # re.e
    out_shape[5] = jax.ShapeDtypeStruct((n, bpad), I32)   # im.e
    out_shape.append(jax.ShapeDtypeStruct((nblocks, 8, bpad), I32))

    kern = partial(_kernel, nrounds=nrounds, blk=blk)

    call = pl.pallas_call(
        # twiddle refs arrive as (1, blk/2, nrounds); drop the leading 1.
        lambda v, a1, a2, a3, a4, b1, b2, b3, b4, *outs: kern(
            v, a1[0], a2[0], a3[0], a4[0],
            b1[0], b2[0], b3[0], b4[0], *outs),
        grid=grid,
        in_specs=[v_spec()] + [tw_spec()] * 8,
        out_specs=out_specs,
        out_shape=out_shape,
        # Mosaic spills aggressively in this long straight-line f64p body
        # (one slot per value, little coalescing); raise the scoped-VMEM
        # ceiling from the 16M default — v5e has 128M physical VMEM.
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def run(vals_nb):  # (n, bpad) f32, coefficient-major placed values
        args = (vals_nb,
                jnp.asarray(twr.s), jnp.asarray(twr.e),
                jnp.asarray(twr.mhi), jnp.asarray(twr.mlo),
                jnp.asarray(twi.s), jnp.asarray(twi.e),
                jnp.asarray(twi.mhi), jnp.asarray(twi.mlo))
        outs = call(*args)
        return outs, inv, nrounds, nblocks, blk

    return run


def encode_sf_blocked(values, parms, interpret: bool | None = None):
    """Bit-exact encode with the Pallas block kernel + f64x jnp tail.

    values f32 (B, <= n/2) -> (conj_vals_int i64 (B, n), ok (B,)).
    Drop-in equal to ops.encode.encode_sf (asserted in tests)."""
    from .. import f64x as fx
    from ..encode import index_map_np, ifft_root_tables

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = parms.degree
    B = values.shape[0]
    vlen = values.shape[-1]
    imap = index_map_np(n)

    v = values.astype(jnp.float32)
    re0 = jnp.zeros((B, n), jnp.float32)
    re0 = re0.at[:, imap[:vlen]].set(v)
    re0 = re0.at[:, imap[n // 2: n // 2 + vlen]].set(v)

    bpad = -(-B // TLANE) * TLANE
    vals_nb = jnp.zeros((n, bpad), jnp.float32)
    vals_nb = vals_nb.at[:, :B].set(re0.T)

    outs, inv, nrounds, nblocks, blk = _encode_call(n, bpad, interpret)(
        vals_nb)
    (res, ree, reh, rel, ims, ime, imh, iml, acck) = outs

    # Undo the block-local permutation with one static gather.
    gidx = (np.arange(nblocks)[:, None] * blk + inv[None, :]).reshape(-1)
    gidx = jnp.asarray(gidx, jnp.int32)

    def join(s, e, hi, lo):
        m = (hi[gidx].astype(jnp.uint64) << jnp.uint64(32)) \
            | lo[gidx].astype(jnp.uint64)
        return fx.F64X(s[gidx], e[gidx], m)

    re = join(res, ree, reh, rel)
    im = join(ims, ime, imh, iml)
    acc = acck[:, 0, :].min(axis=0)  # (bpad,)

    # Cross-block tail rounds (natural order, coefficient-major).
    tables = ifft_root_tables(n)
    tt, h = blk, n // (2 * blk)
    for r in range(nrounds, n.bit_length() - 1):
        s_np = tables[r]
        sre = fx.F64X(*(jnp.asarray(p).reshape(h, 1, 1)
                        for p in fx.from_np_f64(s_np[0])))
        sim = fx.F64X(*(jnp.asarray(p).reshape(h, 1, 1)
                        for p in fx.from_np_f64(s_np[1])))

        def pair(x):
            p = fx.reshape(x, (h, 2, tt, bpad))
            return fx.index(p, np.s_[:, 0]), fx.index(p, np.s_[:, 1])

        ure, wre = pair(re)
        uim, wim = pair(im)
        are, dre = fx.add_sub(ure, wre, False)
        aim, dim_ = fx.add_sub(uim, wim, False)
        p1 = fx.mul(dre, sre, False, b_nonzero=True)
        p2 = fx.mul(dim_, sim, False, b_nonzero=True)
        p3 = fx.mul(dre, sim, False, b_nonzero=True)
        p4 = fx.mul(dim_, sre, False, b_nonzero=True)
        bre = fx.sub(p1, p2, False)
        bim = fx.add(p3, p4, False)
        acc2 = jnp.zeros((h, tt, bpad), jnp.int32)
        acc2 = fx.guard_min_e(acc2, dre, dim_, p1, p2, p3, p4,
                              bre, bim, are, aim)
        acc = jnp.minimum(acc, acc2.min(axis=(0, 1)))

        def unpair(u, w):
            return fx.F64X(*(jnp.stack(p, axis=1).reshape(n, bpad)
                             for p in zip(u, w)))

        re = unpair(are, bre)
        im = unpair(aim, bim)
        tt, h = tt * 2, h // 2

    n_inv = fx.from_np_f64(np.float64(parms.scale) / np.float64(n))
    x = fx.mul(re, fx.F64X(*(jnp.asarray(p).reshape(1, 1)
                             for p in n_inv)), False, b_nonzero=True)
    accx = fx.guard_min_e(jnp.zeros((n, bpad), jnp.int32), x)
    coeff, ok_c = fx.round_away_i64(x)
    floor = jnp.int32(fx.safe_e_floor())
    ok = (jnp.all(ok_c, axis=0) & (acc >= floor)
          & (accx.min(axis=0) >= floor))
    return coeff.T[:B], ok[:B]
