"""Pallas TPU kernels: fused bit-exact CKKS encode (software IEEE f64).

Second-generation replacement for the round-3 blocked "sfk" kernel
(which lost to XLA: Mosaic allocated one spill slot per value across its
~1000-op straight-line round body).  The IFFT is restructured around the
machine instead:

* **batch-major layout** ``(8 batch sublanes, n coefficient lanes)`` —
  the full state (8 f64p planes: re/im x sign/exp/mhi/mlo) lives in VMEM
  refs between rounds, so no value is live across rounds and the
  register allocator only ever sees one (8, 128)-tile butterfly at a
  time (~35 live vregs; zero spills by construction);
* butterfly rounds with pair distance >= 128 lanes are **aligned
  elementwise vreg ops** between different lane-blocks of the state;
  sub-128 distances would need intra-vreg lane shuffles, so the pipeline
  runs in TWO PHASES around a lane-bit-field swap (_sigma_perm): phase A
  covers original rounds 0..6 with rounds < k = logn-7 relocated to
  aligned distances and only ``14 - logn`` rounds (2 at n=4096, ZERO at
  n=16384) left as ``pltpu.roll``-paired roll rounds (2x ALU); one XLA
  reshape-transpose swaps the fields back; phase B runs rounds
  7..logn-1 (all aligned) plus the in-kernel scale-and-round tail
  (``scale/n`` multiply, C99 round() to i64 as u32 pairs, overflow +
  no-subnormal guard accumulation);
* round 0 is the collapsed real-input butterfly (_butterfly_re — the
  state's im planes are identically +0) fused with the f32 load, and
  the final round skips its dead imaginary outputs;
* twiddles ride the **lane axis natively**: per-round full-row tables
  ``tw[r, i] = s_{i >> (r+1)}`` live in HBM and each round DMAs its row
  into VMEM (Mosaic cannot index a dynamic sublane), loading (1, 128)
  slices broadcast across the batch sublanes — no scalar loads, no
  transposes;
* every round family is ONE traced fori body with a dynamic round
  index, so Mosaic compiles ~5 bodies total instead of one per round.

The giant XLA integer graph of ``ops/encode.py::encode_sf`` (866 s
compile at B=512, VERDICT r03 weak #1) disappears entirely.

The butterfly math is ``ops/f64p.py`` — u32-pair software IEEE-754
binary64, bit-identical to ``ops/f64x.py`` and therefore to the C
reference's f64 encode (fft.c:69-144, ckks_common.c:105-215).  The
no-subnormal fast-rounding guard (f64x.safe_e_floor() contract)
accumulates per batch element and joins the pipeline ok flag.

Bit-exactness: asserted against encode_sf (golden-anchored) in
tests/test_kernels.py interpret-mode, and against the C-reference golden
vectors compiled on a real v5e chip (bench.py verify).
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


def _guard(acc, valid, *vals):
    for v in vals:
        z = (v.mhi | v.mlo) == jnp.uint32(0)
        e = jnp.where(z, jnp.int32(0), v.e)
        if valid is not None:
            e = jnp.where(valid, e, jnp.int32(0))
        acc = jnp.minimum(acc, e)
    return acc


def _butterfly(u, w, sre, sim, acc, valid=None, skip_im_out=False):
    """One complex butterfly tile: u' = u+w, w' = (u-w)*s (fft.c:117-144).

    u, w: (re F64P, im F64P).  Returns (are, aim), (bre, bim), acc with
    the guard min-fold applied (masked by `valid` when given).

    skip_im_out: the LAST round's imaginary outputs feed nothing (only re
    is scaled and rounded, ckks_common.c:182-209), so aim/bim (and the p3/
    p4 products only they consume) are skipped; their guard entries are
    vacuous for the no-subnormal proof because no later op consumes them
    (dre/dim_ themselves remain guarded as mul inputs)."""
    ure, uim = u
    wre, wim = w
    are, dre = fp.add_sub(ure, wre)
    aim, dim_ = fp.add_sub(uim, wim)
    p1 = fp.mul(dre, sre, b_nonzero=True)
    p2 = fp.mul(dim_, sim, b_nonzero=True)
    bre = fp.sub(p1, p2)
    if skip_im_out:
        acc = _guard(acc, valid, dre, dim_, p1, p2, bre, are)
        return (are, None), (bre, None), acc
    p3 = fp.mul(dre, sim, b_nonzero=True)
    p4 = fp.mul(dim_, sre, b_nonzero=True)
    bim = fp.add(p3, p4)
    acc = _guard(acc, valid, dre, dim_, p1, p2, p3, p4, bre, bim, are, aim)
    return (are, aim), (bre, bim), acc


def _butterfly_re(ure, wre, sre, sim, acc, valid=None):
    """Round-0 butterfly: the state's imaginary planes are identically +0
    (real-valued inputs, ckks_encode_base places only re), so the full
    complex butterfly collapses — aim = +0+(+0) = +0, dim_ = +0-(+0) = +0,
    and the products against the zero imaginary difference reduce to
    signed zeros folded by IEEE addition:

      bre = p1 - dim_*sim = p1 - (0 with sign sim.s)
          = p1, unless p1 is a zero: then sign = p1.s & ~sim.s ... the
            exact rule is sub(z1, z2) = +0 unless both addends share the
            effective sign (f64x.add zero semantics).
      bim = p3 + dim_*sre = p3, unless p3 is a zero: sign = p3.s & sre.s.

    Asserted bit-identical to the generic path in tests/test_kernels.py
    (test_encode_kernel_round0_specialization) over all sign cases."""
    are, dre = fp.add_sub(ure, wre)
    p1 = fp.mul(dre, sre, b_nonzero=True)
    p3 = fp.mul(dre, sim, b_nonzero=True)
    # bre = p1 - (zero of sign sim.s): RNE zero-sum rule gives sign
    # p1.s & (sim.s ^ 1) when p1 is itself zero.
    z1 = (p1.mhi | p1.mlo) == jnp.uint32(0)
    bre = fp.F64P(jnp.where(z1, p1.s & (sim.s ^ jnp.uint32(1)), p1.s),
                  p1.e, p1.mhi, p1.mlo)
    # bim = p3 + (zero of sign sre.s): sign p3.s & sre.s when p3 is zero.
    z3 = (p3.mhi | p3.mlo) == jnp.uint32(0)
    bim = fp.F64P(jnp.where(z3, p3.s & sre.s, p3.s),
                  p3.e, p3.mhi, p3.mlo)
    acc = _guard(acc, valid, dre, p1, p3, bre, bim, are)
    return are, dre, bre, bim, acc


def _swap_k(logn: int) -> int:
    """Size of the swapped low bit-field (see _sigma_perm)."""
    return min(LB_BITS, logn - LB_BITS)


@lru_cache(maxsize=16)
def _sigma_perm(n: int) -> np.ndarray:
    """The phase-A lane permutation: swap index bit-fields [0:k) and
    [7:logn) (k = logn-7).  Under sigma, original butterfly rounds
    0..k-1 (pair distance 1..2^(k-1) — sub-vreg lane shuffles) become
    ALIGNED rounds at distance 128..128*2^(k-1); only original rounds
    k..6 (14-logn of them; ZERO at n=16384) remain roll rounds.  sigma
    is an involution and factors as a reshape-transpose
    (B, 2^k, 2^(7-k), 2^k) -> axes (0,3,2,1), which is how the XLA side
    applies the swap-back between the two kernel phases."""
    logn = n.bit_length() - 1
    k = _swap_k(logn)
    i = np.arange(n)
    lo = i & ((1 << k) - 1)
    mid = (i >> k) & ((1 << (LB_BITS - k)) - 1)
    hi = i >> LB_BITS
    return (lo << LB_BITS) | (mid << k) | hi


def _bit_sources(n: int, g) -> tuple:
    """For a bit-permutation index map g (g(i) permutes the bits of i),
    the source bit of each output bit: src[j] = b iff g(1 << b) == 1 << j.
    Validated exhaustively by the caller."""
    logn = n.bit_length() - 1
    src = [None] * logn
    for b in range(logn):
        v = int(g(1 << b))
        j = v.bit_length() - 1
        assert v == 1 << j
        src[j] = b
    assert None not in src
    return tuple(src)


def _apply_bitperm(x, n: int, src: tuple):
    """y[..., i] = x[..., g(i)] for the bit permutation with output-bit
    sources `src`, as ONE multi-axis transpose (the lane axis splits into
    logn 2-wide axes; XLA fuses the reshape-transpose-reshape)."""
    logn = n.bit_length() - 1
    b = x.shape[:-1]
    xa = x.reshape(b + (2,) * logn)  # axis a <-> bit (logn-1-a)
    nb = len(b)
    # y[i] = x[g(i)]: x's bit j must be indexed by i's bit src[j]; in
    # transpose terms P[axis-of-bit src[j]] = axis-of-bit j.
    perm = list(range(nb)) + [0] * logn
    for j in range(logn):
        perm[nb + (logn - 1 - src[j])] = nb + (logn - 1 - j)
    return xa.transpose(perm).reshape(b + (n,))


@lru_cache(maxsize=16)
def _sigma2_perm(n: int):
    """Third-phase permutation for logn >= 11: swap the MIDDLE bit-field
    [k, 7) (the rounds the two-phase pipeline must roll) with high bits
    [7, 14-k), so phase A2 runs rounds k..6 as aligned lane-block ops.
    Returns (sigma2 index array, src bits of T1 = sigma1 o sigma2,
    src bits of T2 = sigma2) — both transforms applied as one XLA
    multi-axis transpose each."""
    logn = n.bit_length() - 1
    k = _swap_k(logn)
    m = LB_BITS - k           # middle width
    assert logn >= LB_BITS + m, "3-phase needs logn >= 14 - k"
    i = np.arange(n)
    lo = i & ((1 << k) - 1)
    mid = (i >> k) & ((1 << m) - 1)
    h0 = (i >> LB_BITS) & ((1 << m) - 1)
    rest = i >> (LB_BITS + m)
    sigma2 = ((rest << (LB_BITS + m)) | (mid << LB_BITS) | (h0 << k) | lo)
    sig1 = _sigma_perm(n)
    g1 = lambda j: int(sig1[sigma2[j]])  # noqa: E731
    src1 = _bit_sources(n, g1)
    src2 = _bit_sources(n, lambda j: int(sigma2[j]))
    # exhaustive validation of the transpose encodings (pure numpy — this
    # runs inside jit traces, where jnp would produce tracers)
    probe = np.arange(n)

    def np_apply(x, src):
        xa = x.reshape((2,) * logn)
        perm = [0] * logn
        for j in range(logn):
            perm[logn - 1 - src[j]] = logn - 1 - j
        return xa.transpose(perm).reshape(n)

    assert np.array_equal(np_apply(probe, src1), probe[sig1[sigma2]])
    assert np.array_equal(np_apply(probe, src2), probe[sigma2])
    return sigma2, src1, src2


def _use_three_phase(logn: int) -> bool:
    """3-phase (zero roll rounds) needs the middle field to fit above bit
    7: logn >= 14 - k = 21 - logn."""
    k = _swap_k(logn)
    return logn - LB_BITS >= LB_BITS - k and k < LB_BITS


@lru_cache(maxsize=16)
def _tw_tables_a2(n: int):
    """Phase-A2 twiddle planes: original rounds k..6 permuted by sigma2
    (state[lane] holds original position sigma2(lane))."""
    pre, pim = _tw_tables(n)
    sigma2, _, _ = _sigma2_perm(n)
    k = _swap_k(n.bit_length() - 1)
    TW = type(pre)
    return (TW(*(p[k:LB_BITS, sigma2] for p in pre)),
            TW(*(p[k:LB_BITS, sigma2] for p in pim)))


def _mid_swap(x, n: int):
    """Apply sigma to the lane axis of (..., n) via reshape-transpose."""
    logn = n.bit_length() - 1
    k = _swap_k(logn)
    b = x.shape[:-1]
    return x.reshape(b + (1 << k, 1 << (LB_BITS - k), 1 << k)) \
            .swapaxes(-1, -3).reshape(b + (n,))


@lru_cache(maxsize=16)
def _tw_tables_a(n: int):
    """Phase-A twiddle planes: original rounds 0..6 permuted by sigma
    (state[lane] holds original position sigma(lane))."""
    pre, pim = _tw_tables(n)
    sig = _sigma_perm(n)
    TW = type(pre)
    return (TW(*(p[:LB_BITS, sig] for p in pre)),
            TW(*(p[:LB_BITS, sig] for p in pim)))


def _make_rolls(interpret: bool):
    def _roll_any(x, sh_right):
        """Cyclic lane roll RIGHT by a (possibly traced) i32 amount."""
        if interpret:
            # dynamic-shift roll via a doubled array + dynamic slice
            xx = jnp.concatenate([x, x], axis=1)
            start = (jnp.int32(TLANE) - sh_right) % jnp.int32(TLANE)
            return jax.lax.dynamic_slice_in_dim(xx, start, TLANE, 1)
        # shift operand must be i32 (x64 would promote a bare int to i64,
        # which tpu.dynamic_rotate rejects)
        return pltpu.roll(x, sh_right, axis=1)

    def roll(x, sh):  # cyclic lane roll LEFT by sh (static or traced i32)
        return _roll_any(x, (jnp.int32(TLANE) - sh) % jnp.int32(TLANE))

    def rollr(x, sh):  # cyclic lane roll RIGHT by sh
        return _roll_any(x, jnp.int32(0) + sh)

    return roll, rollr


def _state_io(st):
    def load(off):
        sl = (slice(None), pl.ds(off, TLANE))
        return (fp.F64P(st[0][sl], st[1][sl], st[2][sl], st[3][sl]),
                fp.F64P(st[4][sl], st[5][sl], st[6][sl], st[7][sl]))

    def store(off, re_v, im_v):
        sl = (slice(None), pl.ds(off, TLANE))
        for ref, v in zip(st, (*re_v, *im_v)):
            ref[sl] = v

    def store_re(off, re_v):
        sl = (slice(None), pl.ds(off, TLANE))
        for ref, v in zip(st[:4], re_v):
            ref[sl] = v

    return load, store, store_re


def _tw_loader(tw_hbm, tw_vm, sems):
    """Twiddle access for a traced round index: Mosaic cannot load at a
    dynamic sublane index, so the (rows, n) tables stay in HBM (pl.ANY)
    and `fetch(row)` DMAs the round's row into (1, n) VMEM scratch; the
    per-tile `load_tw(off)` is then a static-sublane aligned load."""
    def fetch(row):
        # tw_hbm are (rows, 1, n): integer-indexing the LEADING (untiled)
        # axis yields a (1, n) source; a (1,)-sublane slice of a 2D tiled
        # memref would be rejected (tiling granularity 8).
        cps = [pltpu.make_async_copy(h.at[row], v, sems.at[np.int32(i)])
               for i, (h, v) in enumerate(zip(tw_hbm, tw_vm))]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    def load_tw(off):
        sl = (slice(0, 1), pl.ds(off, TLANE))
        sre = fp.F64P(_bcast(tw_vm[0][sl]), _bcast(tw_vm[1][sl]),
                      _bcast(tw_vm[2][sl]), _bcast(tw_vm[3][sl]))
        sim = fp.F64P(_bcast(tw_vm[4][sl]), _bcast(tw_vm[5][sl]),
                      _bcast(tw_vm[6][sl]), _bcast(tw_vm[7][sl]))
        return sre, sim

    return fetch, load_tw


def _aligned_round(nlb, load, store, store_re, fetch, load_tw, row, s,
                   acc, last: bool):
    """One aligned butterfly round: u lane-block b (bit s clear) pairs
    with b + 2^s; twiddle row `row` (DMA'd to VMEM at round entry),
    constant across each u tile.  The last round skips its im outputs
    (nothing reads them)."""
    dist = jnp.int32(TLANE) << s
    fetch(row)

    def body(t, acc):
        ub = ((t >> s) << (s + 1)) | (t & ((jnp.int32(1) << s) - 1))
        off_u = pl.multiple_of(ub * jnp.int32(TLANE), TLANE)
        off_w = pl.multiple_of(off_u + dist, TLANE)
        u = load(off_u)
        w = load(off_w)
        sre, sim = load_tw(off_u)
        (are, aim), (bre, bim), acc = _butterfly(
            u, w, sre, sim, acc, skip_im_out=last)
        if last:
            store_re(off_u, are)
            store_re(off_w, bre)
        else:
            store(off_u, are, aim)
            store(off_w, bre, bim)
        return acc
    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb // 2), body,
                             acc, unroll=False)


def _make_phase_a(n: int, interpret: bool, stop_at_k: bool = False):
    """Rounds 0..min(6, logn-1) in sigma layout: rounds < k aligned
    (round 0 collapsed via _butterfly_re), rounds k..6 rolls — unless
    stop_at_k (the 3-phase pipeline hands rounds k..6 to phase A2 as
    aligned rounds under sigma2)."""
    logn = n.bit_length() - 1
    k = _swap_k(logn)
    nlb = n // TLANE
    nr = k if stop_at_k else min(LB_BITS, logn)  # phase-A round count
    roll, rollr = _make_rolls(interpret)

    def kernel(vals_ref, *rest):
        tw_hbm, acc_ref, st = rest[:8], rest[8], rest[9:17]
        tw_vm, sems = rest[17:25], rest[25]
        load, store, store_re = _state_io(st)
        fetch, load_tw = _tw_loader(tw_hbm, tw_vm, sems)
        lane = jax.lax.broadcasted_iota(I32, (TB, TLANE), 1)
        zero_pl = (jnp.zeros((TB, TLANE), U32),
                   jnp.full((TB, TLANE), fp.E_ZERO, I32),
                   jnp.zeros((TB, TLANE), U32), jnp.zeros((TB, TLANE), U32))
        zero_im = fp.F64P(*zero_pl)
        acc = jnp.zeros((TB, TLANE), I32)

        # -- round 0: ALIGNED (k >= 1 for every supported n), collapsed
        # real-input butterfly reading the placed f32 values directly;
        # the im zero-init pass disappears (a-half im = +0, b-half = bim).
        fetch(jnp.int32(0))

        def r0_body(t, acc):
            off_u = pl.multiple_of((t * jnp.int32(2)) * jnp.int32(TLANE),
                                   TLANE)
            off_w = pl.multiple_of(off_u + jnp.int32(TLANE), TLANE)
            u_re = fp.from_f32(vals_ref[:, pl.ds(off_u, TLANE)])
            w_re = fp.from_f32(vals_ref[:, pl.ds(off_w, TLANE)])
            sre, sim = load_tw(off_u)
            are, _, bre, bim, acc = _butterfly_re(u_re, w_re, sre, sim, acc)
            store(off_u, are, zero_im)
            store(off_w, bre, bim)
            return acc
        acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb // 2), r0_body,
                                acc, unroll=False)

        # -- aligned rounds 1..k-1 (original distances 2..2^(k-1), mapped
        # by sigma to lane distances 256..) — one traced body.
        if k > 1:
            acc = jax.lax.fori_loop(
                jnp.int32(1), jnp.int32(k),
                lambda r, a: _aligned_round(nlb, load, store, store_re,
                                            fetch, load_tw, r, r, a,
                                            last=False),
                acc, unroll=False)

        # -- roll rounds k..6 (lane bits unchanged under sigma).
        def roll_round(r, acc):
            dist = jnp.int32(1) << r
            valid = (lane & (2 * dist - 1)) < dist
            fetch(r)

            def body(t, acc):
                off = pl.multiple_of(t * jnp.int32(TLANE), TLANE)
                x_re, x_im = load(off)
                w_re = fp.F64P(*(roll(p, dist) for p in x_re))
                w_im = fp.F64P(*(roll(p, dist) for p in x_im))
                sre, sim = load_tw(off)
                (are, aim), (bre, bim), acc = _butterfly(
                    (x_re, x_im), (w_re, w_im), sre, sim, acc, valid)
                out = []
                for a_pl, b_pl in zip((*are, *aim), (*bre, *bim)):
                    out.append(jnp.where(valid, a_pl, rollr(b_pl, dist)))
                store(off, fp.F64P(*out[0:4]), fp.F64P(*out[4:8]))
                return acc
            return jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb), body,
                                     acc, unroll=False)

        if k < nr:
            acc = jax.lax.fori_loop(jnp.int32(k), jnp.int32(nr), roll_round,
                                    acc, unroll=False)
        acc_ref[...] = acc

    return kernel


def _make_phase_mid(n: int, interpret: bool):
    """Phase A2 (3-phase pipeline only): original rounds k..6 in sigma2
    layout — all aligned at lane bits 7..13-k.  In: 8 state planes + 8
    tw planes (rows 0..6-k); out: 8 state planes (working buffers)."""
    logn = n.bit_length() - 1
    k = _swap_k(logn)
    nlb = n // TLANE
    nrounds = LB_BITS - k

    def kernel(*args):
        # arg order: 8 in-state, 8 tw (ANY), then OUTPUTS (8 state, acc),
        # then scratch (8 tw rows, sems)
        in_st, rest = args[:8], args[8:]
        tw_hbm = rest[:8]
        st = rest[8:16]
        acc_ref = rest[16]
        tw_vm, sems = rest[17:25], rest[25]
        load, store, store_re = _state_io(st)
        fetch, load_tw = _tw_loader(tw_hbm, tw_vm, sems)

        def cp_body(t, _):
            sl = (slice(None), pl.ds(pl.multiple_of(
                t * jnp.int32(TLANE), TLANE), TLANE))
            for dst, src in zip(st, in_st):
                dst[sl] = src[sl]
            return 0
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb), cp_body, 0,
                          unroll=False)

        # Guard continuity: this phase re-checks its own op outputs into a
        # fresh accumulator folded by the wrapper with phases A and B.
        acc = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(nrounds),
            lambda r, a: _aligned_round(nlb, load, store, store_re,
                                        fetch, load_tw, r, r, a,
                                        last=False),
            jnp.zeros((TB, TLANE), I32), unroll=False)
        acc_ref[...] = acc

    return kernel


def _make_phase_b(n: int, interpret: bool):
    """Rounds 7..logn-1 (natural layout, all aligned; last round skips im)
    plus the scale-and-round tail."""
    logn = n.bit_length() - 1
    nlb = n // TLANE

    def kernel(*args, ninv):
        (in_st, rest) = (args[:8], args[8:])
        tw_hbm, acc_in = rest[:8], rest[8]
        lo_ref, hi_ref, ok_ref, acc_ref = rest[9:13]
        st = rest[13:21]
        tw_vm, sems = rest[21:29], rest[29]
        load, store, store_re = _state_io(st)
        fetch, load_tw = _tw_loader(tw_hbm, tw_vm, sems)

        # copy input state planes into the working scratch
        def cp_body(t, _):
            sl = (slice(None), pl.ds(pl.multiple_of(
                t * jnp.int32(TLANE), TLANE), TLANE))
            for dst, src in zip(st, in_st):
                dst[sl] = src[sl]
            return 0
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb), cp_body, 0,
                          unroll=False)

        acc = acc_in[...]
        if logn - 1 > LB_BITS:  # interior aligned rounds 7..logn-2
            acc = jax.lax.fori_loop(
                jnp.int32(LB_BITS), jnp.int32(logn - 1),
                lambda r, a: _aligned_round(
                    nlb, load, store, store_re, fetch, load_tw,
                    r - jnp.int32(LB_BITS), r - jnp.int32(LB_BITS), a,
                    last=False),
                acc, unroll=False)
        acc = _aligned_round(nlb, load, store, store_re, fetch, load_tw,
                             jnp.int32(logn - 1 - LB_BITS),
                             jnp.int32(logn - 1 - LB_BITS), acc, last=True)

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

        acc, ok_all = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(nlb), tail_body,
            (acc, jnp.ones((TB, TLANE), U32)), unroll=False)
        ok_ref[...] = ok_all
        acc_ref[...] = acc

    return kernel


def _state_scratch(n: int):
    return [pltpu.VMEM((TB, n), I32 if i in (1, 5) else U32)
            for i in range(8)]


@lru_cache(maxsize=16)
def _encode_call(n: int, bpad: int, interpret: bool):
    logn = n.bit_length() - 1
    twa_re, twa_im = _tw_tables_a(n)
    pre, pim = _tw_tables(n)
    twb_re = type(pre)(*(p[LB_BITS:] for p in pre))
    twb_im = type(pim)(*(p[LB_BITS:] for p in pim))
    nb_rows = logn - LB_BITS

    _0 = np.int32(0)
    cparams = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=96 * 1024 * 1024)

    def plane_spec():
        return pl.BlockSpec((TB, n), lambda t: (t, _0))

    def acc_spec():
        return pl.BlockSpec((TB, TLANE), lambda t: (t, _0))

    def tw_spec():
        return pl.BlockSpec(memory_space=pl.ANY)

    st_dtypes = [I32 if i in (1, 5) else U32 for i in range(8)]

    def tw_scratch():
        return ([pltpu.VMEM((1, n), I32 if i in (1, 5) else U32)
                 for i in range(8)]
                + [pltpu.SemaphoreType.DMA((8,))])

    three = _use_three_phase(logn)
    call_a = pl.pallas_call(
        _make_phase_a(n, interpret, stop_at_k=three),
        grid=(bpad // TB,),
        in_specs=[plane_spec()] + [tw_spec()] * 8,
        out_specs=[acc_spec()] + [plane_spec()] * 8,
        out_shape=[jax.ShapeDtypeStruct((bpad, TLANE), I32)]
        + [jax.ShapeDtypeStruct((bpad, n), d) for d in st_dtypes],
        # phase A works in its OUT planes; only the tw row buffers are
        # scratch
        scratch_shapes=tw_scratch(),
        compiler_params=cparams,
        interpret=interpret,
    )

    if three:
        call_mid = pl.pallas_call(
            _make_phase_mid(n, interpret),
            grid=(bpad // TB,),
            in_specs=[plane_spec()] * 8 + [tw_spec()] * 8,
            out_specs=[plane_spec()] * 8 + [acc_spec()],
            out_shape=[jax.ShapeDtypeStruct((bpad, n), d)
                       for d in st_dtypes]
            + [jax.ShapeDtypeStruct((bpad, TLANE), I32)],
            scratch_shapes=tw_scratch(),
            compiler_params=cparams,
            interpret=interpret,
        )
        twa2_re, twa2_im = _tw_tables_a2(n)
        _, src1, src2 = _sigma2_perm(n)

    def make_b(ninv_planes):
        return pl.pallas_call(
            partial(_make_phase_b(n, interpret), ninv=ninv_planes),
            grid=(bpad // TB,),
            in_specs=[plane_spec()] * 8 + [tw_spec()] * 8
            + [acc_spec()],
            out_specs=[plane_spec(), plane_spec(), acc_spec(), acc_spec()],
            out_shape=[
                jax.ShapeDtypeStruct((bpad, n), U32),
                jax.ShapeDtypeStruct((bpad, n), U32),
                jax.ShapeDtypeStruct((bpad, TLANE), U32),
                jax.ShapeDtypeStruct((bpad, TLANE), I32),
            ],
            scratch_shapes=_state_scratch(n) + tw_scratch(),
            compiler_params=cparams,
            interpret=interpret,
        )

    def run(vals_bn, ninv_planes):
        twa = [jnp.asarray(p)[:, None, :] for p in (*twa_re, *twa_im)]
        twb = [jnp.asarray(p)[:, None, :] for p in (*twb_re, *twb_im)]
        acc_a, *planes = call_a(vals_bn, *twa)
        if three:
            # T1: sigma1-layout -> sigma2-layout, T2: sigma2 -> natural;
            # each is one XLA multi-axis transpose (_apply_bitperm).
            twa2 = [jnp.asarray(p)[:, None, :]
                    for p in (*twa2_re, *twa2_im)]
            planes = [_apply_bitperm(p, n, src1) for p in planes]
            *planes, acc_m = call_mid(*planes, *twa2)
            planes = [_apply_bitperm(p, n, src2) for p in planes]
            acc_a = jnp.minimum(acc_a, acc_m)
        else:
            # swap-back: sigma as one reshape-transpose per plane (XLA)
            planes = [_mid_swap(p, n) for p in planes]
        lo, hi, okp, accp = make_b(ninv_planes)(*planes, *twb, acc_a)
        return lo, hi, okp, accp

    return run


@lru_cache(maxsize=32)
def _ninv_planes(scale: float, n: int):
    from ..f64x import from_np_f64
    p = fp.split_np(from_np_f64(np.float64(scale) / np.float64(n)))
    return (np.uint32(p.s), np.int32(p.e), np.uint32(p.mhi),
            np.uint32(p.mlo))


def encode_sf_fused(values, parms, interpret: bool | None = None,
                    pair_out: bool = False):
    """Bit-exact encode via the two-phase Pallas kernels (drop-in for
    ops.encode.encode_sf; asserted equal in tests/test_kernels.py).

    values f32 (B, <= n/2) -> (conj_vals_int i64 (B, n), ok (B,)), or
    with pair_out=True the raw two's-complement u32 pair planes
    ((lo, hi) each (B, n), ok).  (Feeding these straight into a
    pair-based reduce_pte measured 1.2 ms SLOWER than the i64 round-trip
    at B=512 on v5e — XLA fuses the i64 form better — so the pipelines
    use the i64 interface; pair_out remains for future in-kernel
    consumers.)"""
    from ..encode import index_map_np
    from ..f64x import safe_e_floor

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = parms.degree
    # _swap_k(logn) = 0 below n=256: the round-0 load loop would run zero
    # iterations and return uninitialized VMEM.  encode_any dispatches
    # small degrees to the jnp path; guard direct callers too.
    assert n >= 256, f"encode_sf_fused needs degree >= 256, got {n}"
    B = values.shape[0]
    vlen = values.shape[-1]
    # placement composed with sigma: position p holds original sigma(p)
    sig = _sigma_perm(n)
    imap = sig[index_map_np(n)]

    v = values.astype(jnp.float32)
    bpad = -(-B // TB) * TB
    re0 = jnp.zeros((bpad, n), jnp.float32)
    re0 = re0.at[:B, imap[:vlen]].set(v)
    re0 = re0.at[:B, imap[n // 2: n // 2 + vlen]].set(v)

    lo, hi, okp, accp = _encode_call(n, bpad, interpret)(
        re0, _ninv_planes(parms.scale, n))
    floor = jnp.int32(safe_e_floor())
    ok = (okp.min(axis=-1) == 1) & (accp.min(axis=-1) >= floor)
    if pair_out:
        return (lo[:B], hi[:B]), ok[:B]
    coeff = jax.lax.bitcast_convert_type(
        hi.astype(jnp.uint64) << jnp.uint64(32) | lo.astype(jnp.uint64),
        jnp.int64)
    return coeff[:B], ok[:B]
