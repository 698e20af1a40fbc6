"""Pallas TPU kernel: batched counter-mode SHAKE-256 squeeze.

The jnp Keccak (ops/keccak.py) materializes every intermediate lane array
in HBM — at ~300 elementwise ops per round that is hundreds of HBM
round-trips per permutation, bandwidth-bound ~50x off roofline.  This
kernel re-designs the layout TPU-first:

* a tile of ``T = 1024`` independent XOF streams rides the VPU as an
  (8, 128) vreg — each of the 50 u32 half-lanes of the Keccak state is
  exactly one vector register, so a full permutation round runs entirely
  in registers;
* the state lives in VMEM scratch (50, 8, 128) and persists across the
  sequential chunk grid dimension — counter-mode absorb happens once
  (72-byte seed||counter block, rng.h:78-84 construction), then each grid
  step squeezes CHUNK=16 blocks under an in-kernel fori (one permutation
  + one 136-byte rate extraction each): the ~25 us fixed per-grid-step
  cost amortizes over 16 blocks instead of dominating long squeezes
  (a 482-block squeeze now costs the same wall time 121 blocks did
  with one block per step);
* outputs are written word-major per block (34, 8, 128); the host-side
  wrapper makes one XLA transpose back to stream-major — a single HBM
  pass instead of per-op traffic.

Bit-exact against the scalar reference Keccak-f[1600]
(device/lib/shake256/fips202.c, keccakf1600.c): verified word-for-word in
tests/test_ops.py against golden/keccak.py (itself validated vs hashlib
and the C reference).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..keccak import _RC, _RHO

U32 = jnp.uint32
T_STREAMS = 1024  # streams per tile: one (8, 128) vreg per state half-lane
_TSUB, _TLANE = 8, 128


def _rol_pair(lo, hi, r: int):
    """Rotate-left of a 64-bit lane held as (lo, hi) u32 vregs, static r."""
    r %= 64
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r < 32:
        nlo = (lo << r) | (hi >> (32 - r))
        nhi = (hi << r) | (lo >> (32 - r))
    else:
        r -= 32
        nlo = (hi << r) | (lo >> (32 - r))
        nhi = (lo << r) | (hi >> (32 - r))
    return nlo.astype(U32), nhi.astype(U32)


# pi scatter: lane i = x + 5y of the theta'd state lands at position
# y + 5*((2x + 3y) % 5); PI_INV is the gather form used by the fused loop.
PI_INV = [0] * 25
for _x in range(5):
    for _y in range(5):
        PI_INV[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y
del _x, _y


def _permute(lo, hi):
    """24 Keccak-f[1600] rounds on lists of 25 (8, 128) u32 vregs.

    Scheduling note: pi and chi are fused per OUTPUT ROW — each theta'd
    lane is rotated exactly where its (single) chi consumer needs it, so
    old-generation lanes can die five at a time instead of all 50 staying
    live behind a full b[25] intermediate.  The kernel is VPU issue-bound
    (~10.3k vector ops per permutation tile, ~11 us at full 1024-stream
    tiles -> >90 Mperm/s productive once the per-grid-step cost is
    chunk-amortized); the remaining headroom is op-count reduction (e.g.
    bit-interleaved rotations — no win on TPU, where a u32 rotate is 3
    ops either way).  Same XOR/ROL dataflow as the plain form,
    bit-identical."""
    for rc in _RC:
        clo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20]
               for x in range(5)]
        chi = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20]
               for x in range(5)]
        dlo = [None] * 5
        dhi = [None] * 5
        for x in range(5):
            rl, rh = _rol_pair(clo[(x + 1) % 5], chi[(x + 1) % 5], 1)
            dlo[x] = clo[(x - 1) % 5] ^ rl
            dhi[x] = chi[(x - 1) % 5] ^ rh
        nlo = [None] * 25
        nhi = [None] * 25
        for y in range(5):
            bl = [None] * 5
            bh = [None] * 5
            for x in range(5):
                i = PI_INV[x + 5 * y]
                xi = i % 5
                tl = lo[i] ^ dlo[xi]
                th = hi[i] ^ dhi[xi]
                bl[x], bh[x] = _rol_pair(tl, th, _RHO[i])
            for x in range(5):
                nlo[x + 5 * y] = bl[x] ^ (~bl[(x + 1) % 5] & bl[(x + 2) % 5])
                nhi[x + 5 * y] = bh[x] ^ (~bh[(x + 1) % 5] & bh[(x + 2) % 5])
        lo, hi = nlo, nhi
        lo[0] = lo[0] ^ jnp.asarray(np.uint32(rc & 0xFFFFFFFF), U32)
        hi[0] = hi[0] ^ jnp.asarray(np.uint32(rc >> 32), U32)
    return lo, hi


def _permute_staged(src, dst):
    """24 Keccak-f rounds with the state staged through VMEM refs,
    ping-ponging src <-> dst each round (even round count: result lands
    back in ``src``).

    Motivation (measured r5): the register-resident ``_permute`` keeps
    ~85 u32 vregs live across a 10.5k-op straight line — far past the
    register file — so Mosaic spills roughly one slot per value and the
    squeeze runs at ~16.4 us/tile-perm against a calibrated 7.2 us ALU
    floor (1.53 vops/cycle sustained for this mix).  Here each round is
    two short passes with bounded live sets (theta column fold: ~12
    live; row pass: d(10) + row(10) + temps ~= 28), trading ~150 VMEM
    vreg ld/st per round for the spill traffic and its scheduling
    stalls.  Bit-identical dataflow."""
    for ridx, rc in enumerate(_RC):
        a, b = (src, dst) if ridx % 2 == 0 else (dst, src)
        clo = [None] * 5
        chi_ = [None] * 5
        for x in range(5):
            lo = a[2 * x]
            hi = a[2 * x + 1]
            for y in range(1, 5):
                lo = lo ^ a[2 * (x + 5 * y)]
                hi = hi ^ a[2 * (x + 5 * y) + 1]
            clo[x] = lo
            chi_[x] = hi
        dlo = [None] * 5
        dhi = [None] * 5
        for x in range(5):
            rl, rh = _rol_pair(clo[(x + 1) % 5], chi_[(x + 1) % 5], 1)
            dlo[x] = clo[(x - 1) % 5] ^ rl
            dhi[x] = chi_[(x - 1) % 5] ^ rh
        for y in range(5):
            bl = [None] * 5
            bh = [None] * 5
            for x in range(5):
                i = PI_INV[x + 5 * y]
                xi = i % 5
                tl = a[2 * i] ^ dlo[xi]
                th = a[2 * i + 1] ^ dhi[xi]
                bl[x], bh[x] = _rol_pair(tl, th, _RHO[i])
            for x in range(5):
                nl = bl[x] ^ (~bl[(x + 1) % 5] & bl[(x + 2) % 5])
                nh = bh[x] ^ (~bh[(x + 1) % 5] & bh[(x + 2) % 5])
                if x == 0 and y == 0:
                    nl = nl ^ jnp.asarray(np.uint32(rc & 0xFFFFFFFF), U32)
                    nh = nh ^ jnp.asarray(np.uint32(rc >> 32), U32)
                b[2 * (x + 5 * y)] = nl
                b[2 * (x + 5 * y) + 1] = nh


def absorb_planes(seed_words, ctr_words):
    """Post-absorb state words for shake256(seed||counter_le8) as a list of
    50 vreg planes (word 2k = lane k lo, 2k+1 = lane k hi).

    72-byte block = 16 seed words + 2 counter words + multi-rate padding
    (0x1F at byte 72 => word 18; 0x80 at byte 135 => word 33 top byte),
    capacity words zero (rng.h:78-84 construction).  Pure jnp on (8, 128)
    planes — shared by the Pallas kernel body and the CPU bit-exactness
    tests (tests/test_kernels.py), where the full Pallas interpret path is
    too slow to execute.
    """
    shape = seed_words[0].shape
    st = [None] * 50
    for w in range(16):
        st[w] = seed_words[w]
    st[16], st[17] = ctr_words[0], ctr_words[1]
    st[18] = jnp.full(shape, np.uint32(0x1F), U32)
    zero = jnp.zeros(shape, U32)
    for w in range(19, 33):
        st[w] = zero
    st[33] = jnp.full(shape, np.uint32(0x80000000), U32)
    for w in range(34, 50):
        st[w] = zero
    return st


# Blocks squeezed per grid step: the permutation+extract loop runs as an
# in-kernel fori, so the fixed per-grid-step cost (block pipelining, loop
# setup — measured ~25 us/step on v5e, >2x the ~11 us a 1024-stream
# permutation itself takes) amortizes over CHUNK blocks instead of being
# paid per 136-byte block.  16 bounds the out-block VMEM at ~2.2 MB.
CHUNK = 16

# Tiles per grid step for single-block calls (the samplers' rejection
# QUEUES: thousands of independent (seed, counter) streams squeezing one
# 136-byte block each — e.g. (B=1024, cap=528) at n=16384 is 528 tiles).
# Without chunking each tile is its own grid step and the fixed per-step
# cost dominates; with it, one step absorbs+permutes CHUNK_TILES
# independent tiles under an in-kernel fori.
CHUNK_TILES = 8


def _kernel_1blk(seed_ref, ctr_ref, out_ref, st_ref, st2_ref, *,
                 ntile: int, staged: bool, nwords: int):
    """Grid: (ngroups,).  seed (CT,16,8,128); ctr (CT,2,8,128);
    out (CT,nwords,8,128); ntile <= CHUNK_TILES live tiles in this
    group.  nwords < 34 emits only the first rate words — the sampler
    queues consume ONE word per 136-byte block, so writing all 34 costs
    34x the HBM (plus the transpose-back read) for nothing."""
    def body(j, _):
        st = absorb_planes([seed_ref[j, w] for w in range(16)],
                           [ctr_ref[j, 0], ctr_ref[j, 1]])
        if staged:
            for w in range(50):
                st_ref[w] = st[w]
            _permute_staged(st_ref, st2_ref)
            rows = [st_ref[k] for k in range(nwords)]
        else:
            lo = [st[2 * k] for k in range(25)]
            hi = [st[2 * k + 1] for k in range(25)]
            lo, hi = _permute(lo, hi)
            rate = lo[:17] + hi[:17]
            rows = [rate[k // 2] if k % 2 == 0 else rate[17 + k // 2]
                    for k in range(nwords)]
        if nwords == 1:
            out_ref[j] = rows[0][None]
        else:
            out_ref[j] = jnp.stack(rows, axis=0)
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(ntile), body, 0,
                      unroll=False)


@lru_cache(maxsize=8)
def _squeeze_call_1blk(ntiles: int, interpret: bool, staged: bool,
                       nwords: int = 34):
    _0 = np.int32(0)
    ct = min(CHUNK_TILES, ntiles)
    ngroups = -(-ntiles // ct)
    last = ntiles - (ngroups - 1) * ct

    def kern(seed_ref, ctr_ref, out_ref, st_ref, st2_ref):
        if last == ct:
            _kernel_1blk(seed_ref, ctr_ref, out_ref, st_ref, st2_ref,
                         ntile=ct, staged=staged, nwords=nwords)
        else:
            @pl.when(pl.program_id(0) < ngroups - 1)
            def _():
                _kernel_1blk(seed_ref, ctr_ref, out_ref, st_ref, st2_ref,
                             ntile=ct, staged=staged, nwords=nwords)

            @pl.when(pl.program_id(0) == ngroups - 1)
            def _():
                _kernel_1blk(seed_ref, ctr_ref, out_ref, st_ref, st2_ref,
                             ntile=last, staged=staged, nwords=nwords)

    return pl.pallas_call(
        kern,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec((ct, 16, _TSUB, _TLANE), lambda g: (g, _0, _0, _0)),
            pl.BlockSpec((ct, 2, _TSUB, _TLANE), lambda g: (g, _0, _0, _0)),
        ],
        out_specs=pl.BlockSpec((ct, nwords, _TSUB, _TLANE),
                               lambda g: (g, _0, _0, _0)),
        out_shape=jax.ShapeDtypeStruct(
            (ngroups * ct, nwords, _TSUB, _TLANE), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((50, _TSUB, _TLANE), jnp.uint32),
                        pltpu.VMEM((50, _TSUB, _TLANE), jnp.uint32)],
        interpret=interpret,
    )


def _kernel(seed_ref, ctr_ref, out_ref, st_ref, st2_ref, *, nchunk: int,
            staged: bool):
    """Grid: (ntiles, nchunks).  seed (1,16,8,128); ctr (1,2,8,128);
    out (1,CHUNK*34,8,128) per chunk (nchunk <= CHUNK blocks of it live);
    st scratch (50,8,128) persists over chunks (st2: staged ping-pong
    buffer).  Planes are word-ordered, so the 136-byte rate is exactly
    planes [0, 34)."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        st = absorb_planes([seed_ref[0, w] for w in range(16)],
                           [ctr_ref[0, 0], ctr_ref[0, 1]])
        for w in range(50):
            st_ref[w] = st[w]

    def body(j, _):
        if staged:
            _permute_staged(st_ref, st2_ref)
            rows = [st_ref[k] for k in range(34)]
        else:
            lo = [st_ref[2 * k] for k in range(25)]
            hi = [st_ref[2 * k + 1] for k in range(25)]
            lo, hi = _permute(lo, hi)
            for k in range(25):
                st_ref[2 * k] = lo[k]
                st_ref[2 * k + 1] = hi[k]
            rate = lo[:17] + hi[:17]  # interleave below
            rows = [rate[k // 2] if k % 2 == 0 else rate[17 + k // 2]
                    for k in range(34)]
        # (34 direct row stores instead of this stack + block copy
        # measured identical — the copy is not a cost here.)
        out_ref[0, pl.ds(j * jnp.int32(34), 34)] = jnp.stack(rows, axis=0)
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nchunk), body, 0,
                      unroll=False)


def _kernel_carry(seed_ref, ctr_ref, out_ref, st_ref, st2_ref, *,
                  nchunk: int):
    """Squeeze variant carrying the 50 state planes through the fori
    CARRY (register-allocated where possible) instead of round-tripping
    VMEM per block; st_ref persists the state across chunk grid steps
    only.  A/B experiment for the state-traffic share of the squeeze."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        st = absorb_planes([seed_ref[0, w] for w in range(16)],
                           [ctr_ref[0, 0], ctr_ref[0, 1]])
        for w in range(50):
            st_ref[w] = st[w]

    def body(j, carry):
        lo, hi = list(carry[:25]), list(carry[25:])
        lo, hi = _permute(lo, hi)
        rate = lo[:17] + hi[:17]
        rows = [rate[k // 2] if k % 2 == 0 else rate[17 + k // 2]
                for k in range(34)]
        out_ref[0, pl.ds(j * jnp.int32(34), 34)] = jnp.stack(rows, axis=0)
        return tuple(lo) + tuple(hi)

    init = tuple(st_ref[2 * k] for k in range(25)) \
        + tuple(st_ref[2 * k + 1] for k in range(25))
    final = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nchunk), body, init,
                              unroll=False)
    for k in range(25):
        st_ref[2 * k] = final[k]
        st_ref[2 * k + 1] = final[25 + k]


def keccak_staged() -> bool:
    """Use the VMEM-staged permute (see _permute_staged) in the squeeze
    kernels.  Measured v5e (r5): bit-exact but SLOWER than the
    register-resident form (squeeze 23.5 vs 16.5 us/perm; queue 29.9 vs
    22.1) — the ~150 explicit VMEM vreg ld/st per round cost more than
    the spill traffic they replace, so the default stays off; kept as a
    measured data point.  Override with SEAL_TPU_KECCAK_STAGED=1."""
    import os
    return os.environ.get("SEAL_TPU_KECCAK_STAGED", "0") == "1"


@lru_cache(maxsize=8)
def _squeeze_call(ntiles: int, nblocks: int, interpret: bool, staged: bool,
                  carry: bool = False):
    _0 = np.int32(0)
    chunk = min(CHUNK, nblocks)  # 1-block calls must not write 16x padding
    nchunks = -(-nblocks // chunk)
    last = nblocks - (nchunks - 1) * chunk

    def kern(seed_ref, ctr_ref, out_ref, st_ref, st2_ref):
        def k1(nchunk):
            if carry and not staged:
                _kernel_carry(seed_ref, ctr_ref, out_ref, st_ref, st2_ref,
                              nchunk=nchunk)
            else:
                _kernel(seed_ref, ctr_ref, out_ref, st_ref, st2_ref,
                        nchunk=nchunk, staged=staged)

        if last == chunk:
            k1(chunk)
        else:
            @pl.when(pl.program_id(1) < nchunks - 1)
            def _():
                k1(chunk)

            @pl.when(pl.program_id(1) == nchunks - 1)
            def _():
                k1(last)

    return pl.pallas_call(
        kern,
        grid=(ntiles, nchunks),
        in_specs=[
            pl.BlockSpec((1, 16, _TSUB, _TLANE), lambda t, j: (t, _0, _0, _0)),
            pl.BlockSpec((1, 2, _TSUB, _TLANE), lambda t, j: (t, _0, _0, _0)),
        ],
        out_specs=pl.BlockSpec((1, chunk * 34, _TSUB, _TLANE),
                               lambda t, j: (t, j, _0, _0)),
        out_shape=jax.ShapeDtypeStruct(
            (ntiles, nchunks * chunk * 34, _TSUB, _TLANE), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((50, _TSUB, _TLANE), jnp.uint32),
                        pltpu.VMEM((50, _TSUB, _TLANE), jnp.uint32)],
        interpret=interpret,
    )


def shake256_words_kernel(seed_words, counters, nblocks: int,
                          interpret: bool | None = None,
                          nwords: int | None = None):
    """Drop-in for ops.keccak.shake256_words via the Pallas kernel.

    seed_words: u32 (..., 16) broadcastable against counters (..., 2).
    Returns u32 (..., nblocks*34), or (..., nwords) when nwords is set
    (single-block queue calls: only the first words are materialized).
    """
    assert nwords is None or nblocks == 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch_shape = counters.shape[:-1]
    from ..keccak import align_seed
    sw = jnp.broadcast_to(align_seed(seed_words, counters),
                          batch_shape + (16,)).astype(U32)
    ctr = counters.astype(U32)
    N = int(np.prod(batch_shape)) if batch_shape else 1
    ntiles = -(-N // T_STREAMS)
    pad = ntiles * T_STREAMS - N

    sw = sw.reshape(N, 16)
    ctr = ctr.reshape(N, 2)
    if pad:
        sw = jnp.concatenate([sw, jnp.zeros((pad, 16), U32)])
        ctr = jnp.concatenate([ctr, jnp.zeros((pad, 2), U32)])
    # stream-major -> tile/word-major (ntiles, W, 8, 128)
    sw = sw.reshape(ntiles, T_STREAMS, 16).swapaxes(1, 2) \
           .reshape(ntiles, 16, _TSUB, _TLANE)
    ctr = ctr.reshape(ntiles, T_STREAMS, 2).swapaxes(1, 2) \
             .reshape(ntiles, 2, _TSUB, _TLANE)

    staged = keccak_staged()
    W = nblocks * 34 if nwords is None else nwords
    if nblocks == 1 and ntiles > 1:
        # Independent 1-block streams (sampler queues): chunk TILES per
        # grid step instead of blocks, amortizing the per-step cost.
        ct = min(CHUNK_TILES, ntiles)
        ngroups = -(-ntiles // ct)
        tpad = ngroups * ct - ntiles
        if tpad:
            sw = jnp.concatenate(
                [sw, jnp.zeros((tpad,) + sw.shape[1:], U32)])
            ctr = jnp.concatenate(
                [ctr, jnp.zeros((tpad,) + ctr.shape[1:], U32)])
        out = _squeeze_call_1blk(ntiles, interpret, staged,
                                 W)(sw, ctr)[:ntiles]
    else:
        import os
        carry = os.environ.get("SEAL_TPU_KECCAK_CARRY", "0") == "1"
        out = _squeeze_call(ntiles, nblocks, interpret, staged,
                            carry)(sw, ctr)
        out = out[:, : W]  # drop padded-chunk rows / trim to nwords
    # (ntiles, W, 8, 128) -> (N, W)
    out = out.reshape(ntiles, W, T_STREAMS).swapaxes(1, 2) \
             .reshape(ntiles * T_STREAMS, W)
    if pad:
        out = out[:N]
    return out.reshape(batch_shape + (W,))
