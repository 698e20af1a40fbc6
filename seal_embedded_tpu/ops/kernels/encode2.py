"""Pallas TPU kernel: fully-fused bit-exact CKKS encode (software IEEE f64).

Second-generation replacement for the blocked kernel in ``encode.py``
(round-3 "sfk" mode, which lost to XLA: Mosaic allocated one spill slot
per value across its ~1000-op straight-line round body).  This kernel
restructures the whole IFFT around the machine instead:

* **batch-major layout** ``(8 batch sublanes, n coefficient lanes)`` —
  the full state (8 f64p planes: re/im x sign/exp/mhi/mlo) lives in VMEM
  scratch between rounds, so no value is live across rounds and the
  register allocator only ever sees one (8, 128)-tile butterfly at a
  time (~35 live vregs; zero spills by construction);
* butterfly rounds with pair distance >= 128 lanes are **aligned
  elementwise vreg ops** between different lane-blocks of the state —
  no shuffles at all; rounds with distance < 128 pair inside one
  128-lane tile via a cyclic lane roll + select (``pltpu.roll``),
  computing both butterfly outputs on all lanes (2x ALU for those
  rounds — still far cheaper than any transpose/scatter alternative);
* twiddles ride the **lane axis natively**: per-round full-row tables
  ``tw[r, i] = s_{i >> (r+1)}`` load as (1, 128) slices and broadcast
  across the batch sublanes — no scalar loads, no transposes;
* the scale-and-round tail (``scale/n`` multiply, C99 round() to i64 as
  u32 pairs, overflow + no-subnormal guard accumulation) runs in-kernel,
  so one pallas_call maps values -> conj_vals_int with only the index-map
  placement gather left in XLA.  The giant XLA integer graph of
  ``ops/encode.py::encode_sf`` (866 s compile at B=512, VERDICT r03
  weak #1) disappears entirely.

The butterfly math is ``ops/f64p.py`` — u32-pair software IEEE-754
binary64, bit-identical to ``ops/f64x.py`` and therefore to the C
reference's f64 encode (fft.c:69-144, ckks_common.c:105-215).  The
no-subnormal fast-rounding guard (f64x.safe_e_floor() contract)
accumulates per batch element and joins the pipeline ok flag.

Bit-exactness: asserted against encode_sf (golden-anchored) in
tests/test_kernels.py interpret-mode, and against the C-reference golden
vectors compiled on a real v5e chip.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import f64p as fp

U32 = jnp.uint32
I32 = jnp.int32
TB = 8        # batch rows (sublanes) per grid step
TLANE = 128   # lane tile
LB_BITS = 7   # log2(TLANE)


@lru_cache(maxsize=16)
def _tw_tables(n: int):
    """Full-row twiddle planes: tw[r, i] = round-r twiddle of the pair
    whose u-position is i (= tables[r][i >> (r+1)]); w-positions carry
    their partner's value (loaded but unused).  Returns 8 np arrays
    (logn, n): re/im x (s, e, mhi, mlo)."""
    from ..encode import ifft_root_tables
    from ..f64x import from_np_f64
    logn = n.bit_length() - 1
    tables = ifft_root_tables(n)
    idx = np.arange(n)
    re = np.zeros((logn, n), np.float64)
    im = np.zeros((logn, n), np.float64)
    for r in range(logn):
        g = idx >> (r + 1)
        re[r] = tables[r][0][g]
        im[r] = tables[r][1][g]
    pre = fp.split_np(from_np_f64(re))
    pim = fp.split_np(from_np_f64(im))
    return pre, pim


def _bcast(x):
    return jnp.broadcast_to(x, (TB, TLANE))


def _butterfly(u, w, sre, sim, acc, valid=None):
    """One complex butterfly tile: u' = u+w, w' = (u-w)*s (fft.c:117-144).

    u, w: (re F64P, im F64P).  Returns (are, aim), (bre, bim), acc with
    the guard min-fold applied (masked by `valid` when given)."""
    ure, uim = u
    wre, wim = w
    are, dre = fp.add_sub(ure, wre)
    aim, dim_ = fp.add_sub(uim, wim)
    p1 = fp.mul(dre, sre, b_nonzero=True)
    p2 = fp.mul(dim_, sim, b_nonzero=True)
    p3 = fp.mul(dre, sim, b_nonzero=True)
    p4 = fp.mul(dim_, sre, b_nonzero=True)
    bre = fp.sub(p1, p2)
    bim = fp.add(p3, p4)
    for v in (dre, dim_, p1, p2, p3, p4, bre, bim, are, aim):
        z = (v.mhi | v.mlo) == jnp.uint32(0)
        e = jnp.where(z, jnp.int32(0), v.e)
        if valid is not None:
            e = jnp.where(valid, e, jnp.int32(0))
        acc = jnp.minimum(acc, e)
    return (are, aim), (bre, bim), acc


def _make_kernel(n: int, interpret: bool):
    logn = n.bit_length() - 1
    nlb = n // TLANE

    def roll(x, sh):  # cyclic lane roll LEFT by sh (static, 0 < sh < TLANE)
        if interpret:
            return jnp.roll(x, -sh, axis=1)
        # shift operand must be i32 (x64 would promote a bare int to i64,
        # which tpu.dynamic_rotate rejects)
        return pltpu.roll(x, jnp.int32(TLANE - sh), axis=1)

    def rollr(x, sh):  # cyclic lane roll RIGHT by sh
        if interpret:
            return jnp.roll(x, sh, axis=1)
        return pltpu.roll(x, jnp.int32(sh), axis=1)

    def kernel(vals_ref, trs, tre, trh, trl, tis, tie, tih, til,
               lo_ref, hi_ref, ok_ref, acc_ref,
               rs, re_, rh, rl, is_, ie, ih, il, *, ninv):
        st = (rs, re_, rh, rl, is_, ie, ih, il)

        def load(off):
            sl = (slice(None), pl.ds(off, TLANE))
            return (fp.F64P(rs[sl], re_[sl], rh[sl], rl[sl]),
                    fp.F64P(is_[sl], ie[sl], ih[sl], il[sl]))

        def store(off, re_v, im_v):
            sl = (slice(None), pl.ds(off, TLANE))
            for ref, v in zip(st, (*re_v, *im_v)):
                ref[sl] = v

        def load_tw(r, off):
            sl = (slice(r, r + 1), pl.ds(off, TLANE))
            sre = fp.F64P(_bcast(trs[sl]), _bcast(tre[sl]),
                          _bcast(trh[sl]), _bcast(trl[sl]))
            sim = fp.F64P(_bcast(tis[sl]), _bcast(tie[sl]),
                          _bcast(tih[sl]), _bcast(til[sl]))
            return sre, sim

        # ---- init: placement values -> re planes; im = +0 ----
        def init_body(t, _):
            off = pl.multiple_of(t * jnp.int32(TLANE), TLANE)
            v = fp.from_f32(vals_ref[:, pl.ds(off, TLANE)])
            z = jnp.zeros((TB, TLANE), U32)
            store(off, v, fp.F64P(z, jnp.full((TB, TLANE), fp.E_ZERO, I32),
                                  z, z))
            return 0
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb), init_body,
                          0, unroll=False)

        acc0 = jnp.zeros((TB, TLANE), I32)
        lane = jax.lax.broadcasted_iota(I32, (TB, TLANE), 1)

        # ---- butterfly rounds ----
        acc_all = acc0
        for r in range(logn):
            dist = 1 << r
            if dist < TLANE:
                # roll round: pair (i, i+dist) inside each 128-lane tile.
                valid = (lane & jnp.int32(2 * dist - 1)) < jnp.int32(dist)

                def roll_body(t, acc, r=r, dist=dist, valid=valid):
                    off = pl.multiple_of(t * jnp.int32(TLANE), TLANE)
                    x_re, x_im = load(off)
                    w_re = fp.F64P(*(roll(p, dist) for p in x_re))
                    w_im = fp.F64P(*(roll(p, dist) for p in x_im))
                    sre, sim = load_tw(r, off)
                    (are, aim), (bre, bim), acc = _butterfly(
                        (x_re, x_im), (w_re, w_im), sre, sim, acc, valid)
                    out = []
                    for a_pl, b_pl in zip((*are, *aim), (*bre, *bim)):
                        out.append(jnp.where(valid, a_pl, rollr(b_pl, dist)))
                    store(off, fp.F64P(*out[0:4]), fp.F64P(*out[4:8]))
                    return acc
                acc_all = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb),
                                            roll_body, acc_all, unroll=False)
            else:
                # aligned round: u lane-block b (bit r-7 clear) pairs with
                # b + dist/128; twiddle constant across the u tile.
                s = r - LB_BITS

                def al_body(t, acc, r=r, s=s, dist=dist):
                    ub = ((t >> s) << (s + 1)) | (t & jnp.int32((1 << s) - 1))
                    off_u = pl.multiple_of(ub * jnp.int32(TLANE), TLANE)
                    off_w = pl.multiple_of(off_u + jnp.int32(dist), TLANE)
                    u = load(off_u)
                    w = load(off_w)
                    sre, sim = load_tw(r, off_u)
                    (are, aim), (bre, bim), acc = _butterfly(
                        u, w, sre, sim, acc)
                    store(off_u, are, aim)
                    store(off_w, bre, bim)
                    return acc
                acc_all = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb // 2),
                                            al_body, acc_all, unroll=False)

        # ---- tail: x = re * (scale/n); round to i64 pair; guards ----
        ninv_t = fp.F64P(*(_bcast(jnp.asarray(p)) for p in ninv))

        def tail_body(t, carry):
            acc, okc = carry
            off = pl.multiple_of(t * jnp.int32(TLANE), TLANE)
            x_re, _ = load(off)
            x = fp.mul(x_re, ninv_t, b_nonzero=True)
            z = (x.mhi | x.mlo) == jnp.uint32(0)
            acc = jnp.minimum(acc, jnp.where(z, jnp.int32(0), x.e))
            lo, hi, okv = fp.round_away_i64(x)
            sl = (slice(None), pl.ds(off, TLANE))
            lo_ref[sl] = lo
            hi_ref[sl] = hi
            return acc, okc & okv.astype(U32)

        acc_all, ok_all = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(nlb), tail_body,
            (acc_all, jnp.ones((TB, TLANE), U32)), unroll=False)
        ok_ref[...] = ok_all
        acc_ref[...] = acc_all

    return kernel


@lru_cache(maxsize=16)
def _encode_call(n: int, bpad: int, interpret: bool):
    logn = n.bit_length() - 1
    pre, pim = _tw_tables(n)
    ninv = None  # bound at call time (depends on scale)

    _0 = np.int32(0)

    def tw_spec():
        return pl.BlockSpec((logn, n), lambda t: (_0, _0))

    def make(ninv_planes):
        kern = partial(_make_kernel(n, interpret), ninv=ninv_planes)
        return pl.pallas_call(
            kern,
            grid=(bpad // TB,),
            in_specs=[pl.BlockSpec((TB, n), lambda t: (t, _0))]
            + [tw_spec()] * 8,
            out_specs=[
                pl.BlockSpec((TB, n), lambda t: (t, _0)),
                pl.BlockSpec((TB, n), lambda t: (t, _0)),
                pl.BlockSpec((TB, TLANE), lambda t: (t, _0)),
                pl.BlockSpec((TB, TLANE), lambda t: (t, _0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bpad, n), U32),
                jax.ShapeDtypeStruct((bpad, n), U32),
                jax.ShapeDtypeStruct((bpad, TLANE), U32),
                jax.ShapeDtypeStruct((bpad, TLANE), I32),
            ],
            scratch_shapes=[pltpu.VMEM((TB, n), U32),
                            pltpu.VMEM((TB, n), I32),
                            pltpu.VMEM((TB, n), U32),
                            pltpu.VMEM((TB, n), U32),
                            pltpu.VMEM((TB, n), U32),
                            pltpu.VMEM((TB, n), I32),
                            pltpu.VMEM((TB, n), U32),
                            pltpu.VMEM((TB, n), U32)],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret,
        )

    def run(vals_bn, ninv_planes):
        call = make(ninv_planes)
        args = (vals_bn,
                jnp.asarray(pre.s), jnp.asarray(pre.e),
                jnp.asarray(pre.mhi), jnp.asarray(pre.mlo),
                jnp.asarray(pim.s), jnp.asarray(pim.e),
                jnp.asarray(pim.mhi), jnp.asarray(pim.mlo))
        return call(*args)

    return run


@lru_cache(maxsize=32)
def _ninv_planes(scale: float, n: int):
    from ..f64x import from_np_f64
    p = fp.split_np(from_np_f64(np.float64(scale) / np.float64(n)))
    return (np.uint32(p.s), np.int32(p.e), np.uint32(p.mhi),
            np.uint32(p.mlo))


def encode_sf_fused(values, parms, interpret: bool | None = None):
    """Bit-exact encode, one fused Pallas kernel (drop-in for
    ops.encode.encode_sf; asserted equal in tests/test_kernels.py).

    values f32 (B, <= n/2) -> (conj_vals_int i64 (B, n), ok (B,))."""
    from ..encode import index_map_np
    from ..f64x import safe_e_floor

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = parms.degree
    B = values.shape[0]
    vlen = values.shape[-1]
    imap = index_map_np(n)

    v = values.astype(jnp.float32)
    bpad = -(-B // TB) * TB
    re0 = jnp.zeros((bpad, n), jnp.float32)
    re0 = re0.at[:B, imap[:vlen]].set(v)
    re0 = re0.at[:B, imap[n // 2: n // 2 + vlen]].set(v)

    lo, hi, okp, accp = _encode_call(n, bpad, interpret)(
        re0, _ninv_planes(parms.scale, n))
    coeff = jax.lax.bitcast_convert_type(
        hi.astype(jnp.uint64) << jnp.uint64(32) | lo.astype(jnp.uint64),
        jnp.int64)
    floor = jnp.int32(safe_e_floor())
    ok = (okp.min(axis=-1) == 1) & (accp.min(axis=-1) >= floor)
    return coeff[:B], ok[:B]
