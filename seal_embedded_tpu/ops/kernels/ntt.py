"""Pallas TPU kernel: batched negacyclic NTT, all stages VMEM-resident.

The jnp NTT (ops/ntt.py) round-trips (B, n) arrays through HBM once per
butterfly stage (12x for n=4096), which makes it bandwidth-bound far off
roofline.  This kernel re-designs the layout TPU-first:

* coefficient-major blocks ``(n, B_TILE)``: the batch rides the 128 VPU
  lanes, butterflies pair rows along the *major* axis — no lane shuffles;
* all log2(n) stages run back-to-back in VMEM — HBM sees exactly one read
  and one write of the data;
* 4-step structure: stages with pair distance >= 8 rows are tile-aligned
  major-axis reshapes; then one in-VMEM (n/8, 8) -> (8, n/8) transpose
  makes the final three stages (distance 4, 2, 1 — which would otherwise
  force 8x sublane padding) tile-aligned as well, against a host-side
  permuted root table (see _permuted_tables);
* root tables arrive lane-broadcast from HBM via an explicit DMA into
  single-buffered VMEM scratch (re-loaded only when the limb changes);
* the RNS limb axis is a grid dimension: q rides in SMEM — one compiled
  kernel serves the whole modulus chain.

Output is the canonical [0, q) scrambled-order NTT — bit-identical to the
reference's ntt_inpl (device/lib/ntt.c:72-185): the lazy Harvey
accumulation in [0, 4q) with a final correction is value-equivalent mod q
and this kernel reduces outputs exactly like the reference does.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ntt import ntt_tables

B_TILE = 128
_MASK16 = 0xFFFF


def _mulhi(a, b):
    """High 32 bits of u32 a*b via 16-bit limbs (uint_arith.h:67 recipe)."""
    a0, a1 = a & _MASK16, a >> 16
    b0, b1 = b & _MASK16, b >> 16
    lo = a0 * b0
    t = a1 * b0 + (lo >> 16)
    t2 = a0 * b1 + (t & _MASK16)
    return (a1 * b1 + (t >> 16) + (t2 >> 16)).astype(jnp.uint32)


def _shoup_lazy(x, y_op, y_quot, q):
    """Lazy Shoup multiply in [0, 2q) (uintmodarith.h:308-331)."""
    return (x * y_op - _mulhi(x, y_quot) * q).astype(jnp.uint32)


def _permute_table(tab: np.ndarray) -> np.ndarray:
    """Bitrev-indexed root table -> kernel order.

    Tail (transposed layout): the distance-2 stage's rows [n/4, n/2) are
    pair-deinterleaved; the distance-1 stage's rows [n/2, n) are
    quad-deinterleaved — so every tail stage reads a contiguous,
    tile-aligned slice.

    Head (radix-4 pairs): for each fused stage pair, the SECOND stage's
    rows [2h, 4h) are even/odd-deinterleaved (evens at [2h, 3h), odds at
    [3h, 4h)) so both sub-group root vectors are contiguous slices.
    Each row range belongs to exactly one stage, so the reorders
    compose."""
    n = tab.shape[0]
    m = n // 8
    out = np.empty_like(tab)
    out[: n // 4] = tab[: n // 4]
    for g in range(2):
        out[n // 4 + g * m: n // 4 + (g + 1) * m] = tab[n // 4 + g::2][:m]
    for k in range(4):
        out[n // 2 + k * m: n // 2 + (k + 1) * m] = tab[n // 2 + k::4][:m]
    # Head pairs mirror _ntt_in_vmem's loop: radix-4 while tt >= 16.
    h, tt = 1, n // 2
    while tt >= 16:
        out[2 * h: 3 * h] = tab[2 * h: 4 * h: 2]
        out[3 * h: 4 * h] = tab[2 * h + 1: 4 * h: 2]
        h, tt = h * 4, tt // 4
    return out


def _ntt_in_vmem(v_vm, op_vm, quot_vm, q, n: int):
    """The 4-step transform on a VMEM working buffer v_vm (n, B_TILE):
    head stages as tile-aligned reshapes, one in-VMEM 8-row transpose,
    transposed tail against the permuted table (see module docstring),
    final correction + transpose back.  Returns the canonical [0, q)
    value (caller stores it)."""
    m = n // 8
    two_q = (q * jnp.uint32(2)).astype(jnp.uint32)

    def lazy_corr(u):
        return jnp.where(u >= two_q, u - two_q, u)

    def bfly(u, w, s_op, s_quot):
        u = lazy_corr(u)
        t = _shoup_lazy(w, s_op, s_quot, q)
        return u + t, u + two_q - t

    # Head: pair distance tt >= 8 — tile-aligned reshapes.  Stages run
    # in fused radix-4 pairs (two butterfly generations in registers per
    # VMEM round-trip — the per-stage tile read+write+restack dominates
    # the 20-vop butterfly ALU); root rows for the pair's second stage
    # are even/odd-deinterleaved host-side (_permute_table).  Identical
    # op sequence per value to the radix-2 form, bit-exact.
    h, tt = 1, n // 2
    while tt >= 16:
        tt2 = tt // 2
        v = v_vm[:].reshape(h, 4, tt2, B_TILE)
        r1_op = op_vm[h:2 * h].reshape(h, 1, 1, B_TILE)
        r1_quot = quot_vm[h:2 * h].reshape(h, 1, 1, B_TILE)
        u = lazy_corr(v[:, 0:2])                      # (h, 2, tt2, B)
        t = _shoup_lazy(v[:, 2:4], r1_op, r1_quot, q)
        a = (u + t).astype(jnp.uint32)                # stage-s outputs
        b = (u + two_q - t).astype(jnp.uint32)
        r2a_op = op_vm[2 * h: 3 * h].reshape(h, 1, B_TILE)
        r2a_quot = quot_vm[2 * h: 3 * h].reshape(h, 1, B_TILE)
        r2b_op = op_vm[3 * h: 4 * h].reshape(h, 1, B_TILE)
        r2b_quot = quot_vm[3 * h: 4 * h].reshape(h, 1, B_TILE)
        o0, o1 = bfly(a[:, 0], a[:, 1], r2a_op, r2a_quot)
        o2, o3 = bfly(b[:, 0], b[:, 1], r2b_op, r2b_quot)
        v_vm[:] = jnp.stack([o0, o1, o2, o3], axis=1).astype(
            jnp.uint32).reshape(n, B_TILE)
        h, tt = h * 4, tt // 4
    if tt >= 8:  # odd head-stage count: one radix-2 step at tt = 8
        v = v_vm[:].reshape(h, 2, tt, B_TILE)
        s_op = op_vm[h:2 * h].reshape(h, 1, B_TILE)
        s_quot = quot_vm[h:2 * h].reshape(h, 1, B_TILE)
        a, b = bfly(v[:, 0], v[:, 1], s_op, s_quot)
        v_vm[:] = jnp.stack([a, b], axis=1).astype(
            jnp.uint32).reshape(n, B_TILE)
        h, tt = h * 2, tt // 2

    # Transpose (n/8, 8, B) -> (8, n/8, B): row a*8+b -> b*(n/8)+a.
    v_vm[:] = jnp.swapaxes(
        v_vm[:].reshape(m, 8, B_TILE), 0, 1).reshape(n, B_TILE)

    # Tail in transposed layout: distances 4, 2, 1 become m*4, m*2, m.
    # tt = 4 (h = n/8): one group pair at halves; root row n/8 + a.
    v = v_vm[:]
    u, w = v[: n // 2], v[n // 2:]
    s_op = pltpu.repeat(op_vm[n // 8: n // 4], 4, 0)
    s_quot = pltpu.repeat(quot_vm[n // 8: n // 4], 4, 0)
    a, b = bfly(u, w, s_op, s_quot)
    v_vm[:] = jnp.concatenate([a, b], axis=0).astype(jnp.uint32)

    # tt = 2 (h = n/4): 2 groups; deinterleaved root rows.
    v = v_vm[:].reshape(2, 2, n // 4, B_TILE)
    s_op = jnp.stack([pltpu.repeat(op_vm[n // 4 + g * m:
                                         n // 4 + (g + 1) * m], 2, 0)
                      for g in range(2)])
    s_quot = jnp.stack([pltpu.repeat(quot_vm[n // 4 + g * m:
                                             n // 4 + (g + 1) * m], 2, 0)
                        for g in range(2)])
    a, b = bfly(v[:, 0], v[:, 1], s_op, s_quot)
    v_vm[:] = jnp.stack([a, b], axis=1).astype(
        jnp.uint32).reshape(n, B_TILE)

    # tt = 1 (h = n/2): 4 groups; quad-deinterleaved root rows.
    v = v_vm[:].reshape(4, 2, m, B_TILE)
    s_op = op_vm[n // 2:].reshape(4, m, B_TILE)
    s_quot = quot_vm[n // 2:].reshape(4, m, B_TILE)
    a, b = bfly(v[:, 0], v[:, 1], s_op, s_quot)
    v = jnp.stack([a, b], axis=1).astype(jnp.uint32).reshape(n, B_TILE)

    # Final correction [0,4q) -> [0,q), then transpose back.
    v = jnp.where(v >= two_q, v - two_q, v)
    v = jnp.where(v >= q, v - q, v)
    return jnp.swapaxes(v.reshape(8, m, B_TILE), 0, 1).reshape(n, B_TILE)


def _load_tables(op_hbm, quot_hbm, op_vm, quot_vm, sems, l):
    """DMA the limb's lane-broadcast Shoup tables into VMEM scratch
    (first batch-tile of each limb only)."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        _i0, _i1 = np.int32(0), np.int32(1)  # x64 would make these i64
        cp0 = pltpu.make_async_copy(op_hbm.at[l], op_vm, sems.at[_i0])
        cp1 = pltpu.make_async_copy(quot_hbm.at[l], quot_vm, sems.at[_i1])
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()


def _make_ntt_kernel(n: int, logn: int, fused_sym: bool = False):
    """fused_sym: epilogue computes c0 = -a*s + ntt(x) in-kernel
    (ckks_sym.c:199-301's per-prime combine) from two extra inputs —
    a (c1) tiles and the lane-broadcast Shoup pair of ntt(s) — saving
    the separate XLA elementwise pass over the (L, B, n) arrays."""

    def kernel(q_ref, op_hbm, quot_hbm, x_ref, *rest):
        if fused_sym:
            (sop_ref, squot_ref, a_ref, o_ref,
             op_vm, quot_vm, sems) = rest
        else:
            o_ref, op_vm, quot_vm, sems = rest
        v_vm = o_ref.at[0]  # output block doubles as the working buffer
        l = pl.program_id(0)
        q = q_ref[l, 0]
        _load_tables(op_hbm, quot_hbm, op_vm, quot_vm, sems, l)

        v_vm[:] = x_ref[0]  # (n, B_TILE) u32
        v = _ntt_in_vmem(v_vm, op_vm, quot_vm, q, n)

        if fused_sym:
            # c0 = add_mod(neg_mod(mul_mod(a, ntt_s)), ntt_pte) — Shoup
            # form of the same exact values (ckks/fast.py's epilogue),
            # while the tile is still in VMEM.  s arrives as (n, 1)
            # blocks and lane-broadcasts against the tile (64 KB of VMEM
            # instead of a 16 MB pre-broadcast, which OOMed at n=16384).
            av = a_ref[0]
            t = _shoup_lazy(av, sop_ref[0], squot_ref[0], q)
            t = jnp.where(t >= q, t - q, t)
            t = jnp.where(t == jnp.uint32(0), jnp.uint32(0),
                          q - t).astype(jnp.uint32)
            v = (t + v).astype(jnp.uint32)
            v = jnp.where(v >= q, v - q, v)
        v_vm[:] = v
    return kernel


@lru_cache(maxsize=32)
def _tables_bcast(n: int, moduli: tuple):
    """(L, n, B_TILE) lane-broadcast permuted Shoup tables + (L,1) qs."""
    ops, quots = zip(*(ntt_tables(n, int(q)) for q in moduli))
    L = len(moduli)
    op = np.stack([_permute_table(t) for t in ops])
    quot = np.stack([_permute_table(t) for t in quots])
    op = np.broadcast_to(op[:, :, None], (L, n, B_TILE)).copy()
    quot = np.broadcast_to(quot[:, :, None], (L, n, B_TILE)).copy()
    qs = np.array([[q] for q in moduli], dtype=np.uint32)
    return op, quot, qs


def _pallas_ntt_call(x, op, quot, qs, n: int, logn: int, interpret: bool):
    L, _, B = x.shape
    assert B % B_TILE == 0, f"batch {B} must be a multiple of {B_TILE}"
    grid = (L, B // B_TILE)
    _0 = np.int32(0)  # x64 mode would make bare 0 an i64, which Mosaic rejects
    return pl.pallas_call(
        _make_ntt_kernel(n, logn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 1), lambda l, b: (_0, _0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, n, B_TILE), lambda l, b: (l, _0, b)),
        ],
        out_specs=pl.BlockSpec((1, n, B_TILE), lambda l, b: (l, _0, b)),
        out_shape=jax.ShapeDtypeStruct((L, n, B), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((n, B_TILE), jnp.uint32),
            pltpu.VMEM((n, B_TILE), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qs, op, quot, x)


def _pallas_ntt_fused_sym_call(x, a, s_op_b, s_quot_b, op, quot, qs,
                               n: int, logn: int, interpret: bool):
    L, _, B = x.shape
    assert B % B_TILE == 0, f"batch {B} must be a multiple of {B_TILE}"
    grid = (L, B // B_TILE)
    _0 = np.int32(0)
    return pl.pallas_call(
        _make_ntt_kernel(n, logn, fused_sym=True),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 1), lambda l, b: (_0, _0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, n, B_TILE), lambda l, b: (l, _0, b)),
            pl.BlockSpec((1, n, 1), lambda l, b: (l, _0, _0)),
            pl.BlockSpec((1, n, 1), lambda l, b: (l, _0, _0)),
            pl.BlockSpec((1, n, B_TILE), lambda l, b: (l, _0, b)),
        ],
        out_specs=pl.BlockSpec((1, n, B_TILE), lambda l, b: (l, _0, b)),
        out_shape=jax.ShapeDtypeStruct((L, n, B), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((n, B_TILE), jnp.uint32),
            pltpu.VMEM((n, B_TILE), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qs, op, quot, x, s_op_b, s_quot_b, a)


def _make_ntt_kernel_fused_asym(n: int, logn: int):
    """Fused asymmetric per-limb step (ckks_asym.c:205-286): three NTTs
    (u, e1, pte) per (limb, batch-tile) grid step, combined in VMEM into
      c1 = pk1 * ntt(u) + ntt(e1),  c0 = pk0 * ntt(u) + ntt(pte)
    with the pk rows as lane-broadcast Shoup pairs.  Saves the three
    (L, B, n) NTT-output HBM round-trips plus the separate combine pass.
    """
    def kernel(q_ref, op_hbm, quot_hbm, u_ref, e1_ref, pte_ref,
               p0op_ref, p0quot_ref, p1op_ref, p1quot_ref,
               c0_ref, c1_ref, op_vm, quot_vm, w_vm, sems):
        l = pl.program_id(0)
        q = q_ref[l, 0]
        _load_tables(op_hbm, quot_hbm, op_vm, quot_vm, sems, l)

        w_vm[:] = u_ref[0]
        w_vm[:] = _ntt_in_vmem(w_vm, op_vm, quot_vm, q, n)

        c1w = c1_ref.at[0]
        c1w[:] = e1_ref[0]
        ntt_e1 = _ntt_in_vmem(c1w, op_vm, quot_vm, q, n)

        c0w = c0_ref.at[0]
        c0w[:] = pte_ref[0]
        ntt_pte = _ntt_in_vmem(c0w, op_vm, quot_vm, q, n)

        nu = w_vm[:]

        def combine(pop, pquot, other):
            # add_mod(mul_mod(pk, ntt_u), ntt_other) in Shoup form —
            # same exact canonical values as the Barrett epilogue.
            t = _shoup_lazy(nu, pop, pquot, q)
            t = jnp.where(t >= q, t - q, t)
            s = (t + other).astype(jnp.uint32)
            return jnp.where(s >= q, s - q, s)

        c1w[:] = combine(p1op_ref[0], p1quot_ref[0], ntt_e1)
        c0w[:] = combine(p0op_ref[0], p0quot_ref[0], ntt_pte)

    return kernel


def ntt_coeff_major_fused_asym(u, e1, pte, pk0, pk1, moduli,
                               interpret: bool | None = None):
    """(c0, c1) for the asym per-limb combine, coefficient-major.

    u, e1, pte: u32 (L, n, B) mod-q inputs; pk0, pk1: u32 (L, n) NTT
    form.  Bit-identical to NTT + XLA mul/add epilogue (asserted in
    tests/test_kernels.py)."""
    L, n, B = u.shape
    logn = n.bit_length() - 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert B % B_TILE == 0, B
    op, quot, qs = _tables_bcast(n, tuple(int(q) for q in moduli))
    p0op, p0quot = shoup_pair_ingraph(pk0, moduli)
    p1op, p1quot = shoup_pair_ingraph(pk1, moduli)
    grid = (L, B // B_TILE)
    _0 = np.int32(0)
    bs_tile = pl.BlockSpec((1, n, B_TILE), lambda l, b: (l, _0, b))
    bs_row = pl.BlockSpec((1, n, 1), lambda l, b: (l, _0, _0))
    c0, c1 = pl.pallas_call(
        _make_ntt_kernel_fused_asym(n, logn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 1), lambda l, b: (_0, _0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            bs_tile, bs_tile, bs_tile,
            bs_row, bs_row, bs_row, bs_row,
        ],
        out_specs=[bs_tile, bs_tile],
        out_shape=[jax.ShapeDtypeStruct((L, n, B), jnp.uint32),
                   jax.ShapeDtypeStruct((L, n, B), jnp.uint32)],
        scratch_shapes=[
            pltpu.VMEM((n, B_TILE), jnp.uint32),
            pltpu.VMEM((n, B_TILE), jnp.uint32),
            pltpu.VMEM((n, B_TILE), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qs, jnp.asarray(op), jnp.asarray(quot), u, e1, pte,
      p0op[:, :, None], p0quot[:, :, None],
      p1op[:, :, None], p1quot[:, :, None])
    return c0, c1


def shoup_pair_ingraph(s, moduli):
    """In-graph Shoup (op, quot) for runtime per-limb vectors s (L, n),
    q static per limb: quot = floor(s * 2^32 / q) via u64 shift-divide
    (strength-reduced by XLA since q is a compile-time constant).  Small
    (L, n) one-time cost per call; enables the lazy-mul epilogue."""
    quots = []
    for l, q in enumerate(moduli):
        quots.append(((s[l].astype(jnp.uint64) << jnp.uint64(32))
                      // jnp.uint64(int(q))).astype(jnp.uint32))
    return s.astype(jnp.uint32), jnp.stack(quots)


def ntt_coeff_major_fused_sym(x, a, ntt_s, moduli,
                              interpret: bool | None = None):
    """Forward NTT of x fused with the symmetric combine: returns
    c0 = -a * ntt_s + ntt(x) mod q, coefficient-major (L, n, B).

    x, a: u32 (L, n, B); ntt_s: u32 (L, n) (NTT form of the secret key
    per limb).  Bit-identical to the unfused
    add_mod(neg_mod(mul_mod(a, ntt_s)), ntt(x)) epilogue."""
    L, n, B = x.shape
    logn = n.bit_length() - 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    op, quot, qs = _tables_bcast(n, tuple(int(q) for q in moduli))
    s_op, s_quot = shoup_pair_ingraph(ntt_s, moduli)
    s_op_b = s_op[:, :, None]
    s_quot_b = s_quot[:, :, None]
    return _pallas_ntt_fused_sym_call(
        x, a, s_op_b, s_quot_b, jnp.asarray(op), jnp.asarray(quot),
        jnp.asarray(qs), n, logn, interpret)


def ntt_coeff_major(x, moduli, interpret: bool | None = None):
    """Forward negacyclic NTT over coefficient-major data.

    x: u32 (L, n, B) — limb-major, coefficients on the second axis, batch
    minor.  moduli: tuple of L primes.  Returns same-shape canonical [0,q)
    NTT (scrambled order), bit-identical to ops.ntt.ntt per limb.
    """
    L, n, B = x.shape
    logn = n.bit_length() - 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    op, quot, qs = _tables_bcast(n, tuple(int(q) for q in moduli))
    return _pallas_ntt_call(x, jnp.asarray(op), jnp.asarray(quot),
                            jnp.asarray(qs), n, logn, interpret)


def ntt_batch_bn(x, moduli, interpret: bool | None = None):
    """Convenience wrapper for (L, B, n)-layout data: transposes to
    coefficient-major, runs the kernel, transposes back."""
    xt = jnp.swapaxes(x, -1, -2)
    out = ntt_coeff_major(xt, moduli, interpret=interpret)
    return jnp.swapaxes(out, -1, -2)
