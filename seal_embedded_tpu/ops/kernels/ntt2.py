"""Pallas TPU kernel: batched negacyclic NTT, batch-major two-phase.

Second-generation NTT kernel.  The coefficient-major kernel (ntt.py)
runs its head stages as straight-line whole-(n, 128) array ops — at
n=4096 that is 32-vreg values with a dozen live per stage, and Mosaic's
per-value spill slots push it to ~8% of the VPU speed-of-light
(BASELINE.md roofline, 15.6 Gbfly/s).  This kernel adopts the layout and
scheduling that fixed the encode kernel (encode2.py):

* **batch-major state** ``(TBN batch sublanes, n coefficient lanes)``
  living in the kernel's OUT ref between stages; every butterfly is an
  (8, 128)-tile op with ~12 live vregs — no spills by construction;
* stage r pairs lanes at distance tt = n >> (r+1): stages with tt >= 128
  are **aligned lane-block ops**; the sub-128 tail runs after the same
  lane-bit-field swap sigma as the encode kernel (one XLA
  reshape-transpose between two pallas_calls), leaving only ``14 - logn``
  roll stages (2 at n=4096, none at n=16384);
* per-stage twiddles ride the lane axis: full-row tables
  ``twn[r, i] = op[2^r + (i >> (logn - r))]`` (+ Shoup quotients) in HBM,
  DMA'd one row per (limb, stage) into VMEM;
* the RNS limb axis is a grid dimension (q in SMEM) — one compiled
  kernel serves the whole modulus chain; TBN = 128 batch rows per grid
  step keep the fixed per-step cost (~25 us) amortized.

Outputs are the canonical [0, q) scrambled-order NTT, bit-identical to
ops.ntt.ntt / the reference ntt_inpl (device/lib/ntt.c:72-185); the
lazy Harvey accumulation in [0, 4q) with a final correction matches the
reference's value semantics exactly.  The sigma swap-back happens in
XLA, so callers see natural (scrambled-NTT) order.

Bit-exactness: interpret-mode vs the jnp NTT in tests/test_kernels.py
and on-device golden verification through the fused pipelines.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ntt import ntt_tables
from .encode2 import _mid_swap, _sigma_perm, _swap_k

U32 = jnp.uint32
I32 = jnp.int32
TBN = 128     # batch rows per grid step
TLANE = 128
LB_BITS = 7


def _mulhi(a, b):
    """High 32 bits of u32 a*b via 16-bit limbs (uint_arith.h:67 recipe)."""
    m16 = jnp.uint32(0xFFFF)
    a0, a1 = a & m16, a >> jnp.uint32(16)
    b0, b1 = b & m16, b >> jnp.uint32(16)
    lo = a0 * b0
    t = a1 * b0 + (lo >> jnp.uint32(16))
    t2 = a0 * b1 + (t & m16)
    return (a1 * b1 + (t >> jnp.uint32(16))
            + (t2 >> jnp.uint32(16))).astype(U32)


@lru_cache(maxsize=32)
def _row_tables(n: int, moduli: tuple):
    """Per-lane twiddle rows for every (limb, stage):

    natural-phase rows for stages with tt >= 128 and sigma-permuted rows
    for the tail stages, as (L * rows, 1, n) u32 arrays (flattened
    leading axis so the kernel DMAs ``ref.at[l * rows + r]``).  Returns
    (opA, quotA, rowsA, opB, quotB, rowsB, qs)."""
    logn = n.bit_length() - 1
    sig = _sigma_perm(n)
    idx = np.arange(n)
    L = len(moduli)
    rows_a = logn - LB_BITS           # stages tt = n/2 .. 128
    rows_b = LB_BITS                  # stages tt = 64 .. 1
    opA = np.zeros((L, rows_a, n), np.uint32)
    qtA = np.zeros((L, rows_a, n), np.uint32)
    opB = np.zeros((L, rows_b, n), np.uint32)
    qtB = np.zeros((L, rows_b, n), np.uint32)
    for l, q in enumerate(moduli):
        op, quot = ntt_tables(n, int(q))
        for r in range(logn):
            g = (1 << r) + (idx >> (logn - r))
            if r < rows_a:
                opA[l, r] = op[g]
                qtA[l, r] = quot[g]
            else:
                opB[l, r - rows_a] = op[g][sig]
                qtB[l, r - rows_a] = quot[g][sig]
    qs = np.array([[q] for q in moduli], np.uint32)
    return (opA.reshape(L * rows_a, 1, n), qtA.reshape(L * rows_a, 1, n),
            rows_a, opB.reshape(L * rows_b, 1, n),
            qtB.reshape(L * rows_b, 1, n), rows_b, qs)


def _bfly_tile(u, w, s_op, s_quot, q, two_q):
    """Lazy Harvey butterfly on one (8, 128) tile (ntt.c:93-106)."""
    u = jnp.where(u >= two_q, u - two_q, u)
    t = (w * s_op - _mulhi(w, s_quot) * q).astype(U32)
    return (u + t).astype(U32), (u + two_q - t).astype(U32)


def _make_rolls(interpret: bool):
    def _roll_any(x, sh_right):
        if interpret:
            xx = jnp.concatenate([x, x], axis=1)
            start = (jnp.int32(TLANE) - sh_right) % jnp.int32(TLANE)
            return jax.lax.dynamic_slice_in_dim(xx, start, TLANE, 1)
        return pltpu.roll(x, sh_right, axis=1)

    def roll(x, sh):   # left
        return _roll_any(x, (jnp.int32(TLANE) - sh) % jnp.int32(TLANE))

    def rollr(x, sh):  # right
        return _roll_any(x, jnp.int32(0) + sh)

    return roll, rollr


def _state_io3(st):
    """Tile access on a (1, TBN, n) ref."""
    def load(srt, off):
        return st[0, pl.ds(srt * jnp.int32(8), 8), pl.ds(off, TLANE)]

    def store(srt, off, v):
        st[0, pl.ds(srt * jnp.int32(8), 8), pl.ds(off, TLANE)] = v

    return load, store


def _make_phase_a(n: int, rows_a: int, interpret: bool):
    """Stages 0..rows_a-1 (tt = n/2 .. 128): aligned lane-block pairs."""
    nlb = n // TLANE
    nrs = TBN // 8

    def kernel(q_ref, op_hbm, qt_hbm, x_ref, o_ref, op_vm, qt_vm, sems):
        l = pl.program_id(0)
        q = q_ref[l, 0]
        two_q = (q * jnp.uint32(2)).astype(U32)
        load, store = _state_io3(o_ref)

        # working state = out block
        def cp(t, _):
            sl = pl.ds(pl.multiple_of(t * jnp.int32(TLANE), TLANE), TLANE)
            o_ref[0, :, sl] = x_ref[0, :, sl]
            return 0
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb), cp, 0, unroll=False)

        def stage(r, _):
            _i0, _i1 = np.int32(0), np.int32(1)
            row = l * jnp.int32(rows_a) + r
            cp0 = pltpu.make_async_copy(op_hbm.at[row], op_vm, sems.at[_i0])
            cp1 = pltpu.make_async_copy(qt_hbm.at[row], qt_vm, sems.at[_i1])
            cp0.start()
            cp1.start()
            cp0.wait()
            cp1.wait()
            # stage r: tt = n >> (r+1); u lane-blocks have bit s clear,
            # s = log2(tt) - 7 = (logn - r - 1) - 7.
            logn = n.bit_length() - 1
            s = jnp.int32(logn - 1 - LB_BITS) - r
            dist = jnp.int32(TLANE) << s

            def body(i, _):
                t = i // jnp.int32(nrs)
                srt = i - t * jnp.int32(nrs)
                ub = ((t >> s) << (s + 1)) | (t & ((jnp.int32(1) << s) - 1))
                off_u = pl.multiple_of(ub * jnp.int32(TLANE), TLANE)
                off_w = pl.multiple_of(off_u + dist, TLANE)
                u = load(srt, off_u)
                w = load(srt, off_w)
                s_op = jnp.broadcast_to(op_vm[0:1, pl.ds(off_u, TLANE)],
                                        (8, TLANE))
                s_qt = jnp.broadcast_to(qt_vm[0:1, pl.ds(off_u, TLANE)],
                                        (8, TLANE))
                a, b = _bfly_tile(u, w, s_op, s_qt, q, two_q)
                store(srt, off_u, a)
                store(srt, off_w, b)
                return 0
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb // 2 * nrs), body,
                              0, unroll=8)
            return 0

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(rows_a), stage, 0,
                          unroll=False)

    return kernel


def _make_phase_b(n: int, rows_a: int, interpret: bool):
    """Stages rows_a..logn-1 (tt = 64..1) in sigma layout + final
    correction."""
    logn = n.bit_length() - 1
    k = _swap_k(logn)
    nlb = n // TLANE
    nrs = TBN // 8
    roll, rollr = _make_rolls(interpret)

    def kernel(q_ref, op_hbm, qt_hbm, x_ref, o_ref, op_vm, qt_vm, sems):
        l = pl.program_id(0)
        q = q_ref[l, 0]
        two_q = (q * jnp.uint32(2)).astype(U32)
        load, store = _state_io3(o_ref)
        lane = jax.lax.broadcasted_iota(I32, (8, TLANE), 1)

        def cp(t, _):
            sl = pl.ds(pl.multiple_of(t * jnp.int32(TLANE), TLANE), TLANE)
            o_ref[0, :, sl] = x_ref[0, :, sl]
            return 0
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb), cp, 0, unroll=False)

        def fetch(r):
            _i0, _i1 = np.int32(0), np.int32(1)
            row = l * jnp.int32(LB_BITS) + r
            cp0 = pltpu.make_async_copy(op_hbm.at[row], op_vm, sems.at[_i0])
            cp1 = pltpu.make_async_copy(qt_hbm.at[row], qt_vm, sems.at[_i1])
            cp0.start()
            cp1.start()
            cp0.wait()
            cp1.wait()

        def tw(off):
            s_op = jnp.broadcast_to(op_vm[0:1, pl.ds(off, TLANE)],
                                    (8, TLANE))
            s_qt = jnp.broadcast_to(qt_vm[0:1, pl.ds(off, TLANE)],
                                    (8, TLANE))
            return s_op, s_qt

        # stage index r in [0, LB_BITS): original stage rows_a + r,
        # tt = 64 >> r; under sigma the lane bit b = log2(tt) = 6 - r maps
        # to 7 + b - ... : bits [0:k) -> [7:7+k), so b < k aligned at
        # dist 128 << b, else roll at dist 1 << b.
        def aligned_stage(r, b):
            fetch(r)
            dist = jnp.int32(TLANE) << b
            s = jnp.int32(0) + b

            def body(i, _):
                t = i // jnp.int32(nrs)
                srt = i - t * jnp.int32(nrs)
                ub = ((t >> s) << (s + 1)) | (t & ((jnp.int32(1) << s) - 1))
                off_u = pl.multiple_of(ub * jnp.int32(TLANE), TLANE)
                off_w = pl.multiple_of(off_u + dist, TLANE)
                u = load(srt, off_u)
                w = load(srt, off_w)
                s_op, s_qt = tw(off_u)
                a, bb = _bfly_tile(u, w, s_op, s_qt, q, two_q)
                store(srt, off_u, a)
                store(srt, off_w, bb)
                return 0
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb // 2 * nrs), body,
                              0, unroll=8)

        def roll_stage(r, b):
            fetch(r)
            dist = jnp.int32(1) << b
            valid = (lane & (2 * dist - 1)) < dist

            def body(i, _):
                t = i // jnp.int32(nrs)
                srt = i - t * jnp.int32(nrs)
                off = pl.multiple_of(t * jnp.int32(TLANE), TLANE)
                x = load(srt, off)
                w = roll(x, dist)
                s_op, s_qt = tw(off)
                a, bb = _bfly_tile(x, w, s_op, s_qt, q, two_q)
                out = jnp.where(valid, a, rollr(bb, dist))
                store(srt, off, out)
                return 0
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb * nrs), body,
                              0, unroll=8)

        # static 7-stage schedule: which stages roll vs align is fixed
        # by n (b < k aligned), so unroll in Python — the two bodies each
        # still trace once per KIND thanks to the shared helpers.
        for r in range(LB_BITS):
            b = LB_BITS - 1 - r  # lane bit of this stage (6 - r)
            if b < k:
                aligned_stage(jnp.int32(r), jnp.int32(b))
            else:
                roll_stage(jnp.int32(r), jnp.int32(b))

        # final correction [0, 4q) -> [0, q)
        def corr(t, _):
            sl = pl.ds(pl.multiple_of(t * jnp.int32(TLANE), TLANE), TLANE)
            v = o_ref[0, :, sl]
            v = jnp.where(v >= two_q, v - two_q, v)
            v = jnp.where(v >= q, v - q, v)
            o_ref[0, :, sl] = v
            return 0
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlb), corr, 0,
                          unroll=False)

    return kernel


@lru_cache(maxsize=32)
def _ntt_call(n: int, L: int, bpad: int, moduli: tuple, interpret: bool):
    opA, qtA, rows_a, opB, qtB, rows_b, qs = _row_tables(n, moduli)
    _0 = np.int32(0)

    def specs():
        return dict(
            in_specs=[
                pl.BlockSpec((L, 1), lambda l, b: (_0, _0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, TBN, n), lambda l, b: (l, b, _0)),
            ],
            out_specs=pl.BlockSpec((1, TBN, n), lambda l, b: (l, b, _0)),
            out_shape=jax.ShapeDtypeStruct((L, bpad, n), U32),
            scratch_shapes=[pltpu.VMEM((1, n), U32), pltpu.VMEM((1, n), U32),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )

    grid = (L, bpad // TBN)
    call_a = pl.pallas_call(_make_phase_a(n, rows_a, interpret),
                            grid=grid, **specs())
    call_b = pl.pallas_call(_make_phase_b(n, rows_a, interpret),
                            grid=grid, **specs())

    def run(x_lbn):
        ja = call_a(jnp.asarray(qs), jnp.asarray(opA), jnp.asarray(qtA),
                    x_lbn)
        jb = _mid_swap(ja, n)
        out = call_b(jnp.asarray(qs), jnp.asarray(opB), jnp.asarray(qtB),
                     jb)
        return _mid_swap(out, n)

    return run


def ntt_batch_major(x, moduli, interpret: bool | None = None):
    """Forward negacyclic NTT over batch-major data.

    x: u32 (L, B, n) — limb-major, batch rows, coefficients minor.
    moduli: tuple of L primes.  Returns the same-shape canonical [0, q)
    scrambled-order NTT, bit-identical to ops.ntt.ntt per limb."""
    L, B, n = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bpad = -(-B // TBN) * TBN
    if bpad != B:
        x = jnp.concatenate(
            [x, jnp.zeros((L, bpad - B, n), U32)], axis=1)
    out = _ntt_call(n, L, bpad, tuple(int(q) for q in moduli), interpret)(
        x.astype(U32))
    return out[:, :B]
