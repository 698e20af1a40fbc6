"""VPU calibration microbenchmarks: measured op-mix throughput ceilings.

BASELINE.md's speed-of-light denominators originally assumed the v5e
datasheet bound of 4 ALU ops/cycle/lane, which the VPU does not sustain
for the integer mixes these kernels actually issue — making "fraction of
SOL" rows decorative.  This module pins the *attainable* ceiling: a
Pallas kernel runs a long register-resident loop of exactly the op mix
of each hot kernel (same source-level op-counting convention as
bench.py's per-kernel counts), and the measured vops/s becomes the
calibrated denominator.

Mixes:

* "keccak": xor / rotate (shift,shift,or) / andn chains — the theta, rho
  and chi dataflow of ops/kernels/keccak.py, 8 independent chains for
  realistic ILP.
* "ntt": the Shoup-lazy butterfly dataflow of ops/kernels/ntt.py —
  16-bit-limb mulhi, u32 mullo, shifts, adds, compare-selects.

Design notes (memory: xla-mosaic-codegen-pitfalls): every literal typed
u32/i32; state carried through a fori_loop as vreg tuples (<= ~16 live
vregs — no spills); one grid step per tile so the ~25 us per-step fixed
cost vanishes against the multi-ms loop.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

U32 = jnp.uint32
_TSUB, _TLANE = 8, 128
_NCHAIN = 8  # independent dependency chains (ILP the scheduler can use)


def _rol(x, r: int):
    """3-op u32 rotate, exactly as the Keccak kernel issues it."""
    return ((x << r) | (x >> (32 - r))).astype(U32)


def _keccak_mix_body(chains, salt):
    """One iteration over the chains; returns (new_chains, ops_counted).

    Per chain: rot(3 ops) + xor + andn-chi (not, and, xor) + xor = 8 ops,
    mirroring theta/rho/chi proportions (rotate ~30%, xor ~40%, chi ~30%).
    """
    nch = len(chains)
    out = []
    ops = 0
    for i, a in enumerate(chains):
        b = chains[(i + 1) % nch]
        c = chains[(i + 2) % nch]
        t = _rol(a, (i * 7 + 1) % 31 + 1)          # 3 ops
        t = t ^ b                                   # 1
        t = (t ^ (~b & c)).astype(U32)              # 3 (not, and, xor)
        t = t ^ salt                                # 1
        out.append(t)
        ops += 8
    return out, ops


def _ntt_mix_body(chains, q, two_q):
    """One iteration over 4 (x, w) pairs of the Shoup-lazy butterfly:
    lazy correction (compare, select: 2), mulhi 16-bit limbs (4 mul,
    3 shift, 3 add, 2 and: 12), mullo+mullo-sub (3), add/sub pair (3)
    = 20 ops per butterfly — bench.py's NTT_OPS_PER_BFLY convention."""
    out = []
    ops = 0
    npairs = len(chains) // 2
    for i in range(npairs):
        u, w = chains[2 * i], chains[2 * i + 1]
        u = jnp.where(u >= two_q, u - two_q, u)     # 2
        a0 = w & jnp.uint32(0xFFFF)                 # \
        a1 = w >> 16                                #  |
        b0 = u & jnp.uint32(0xFFFF)                 #  | mulhi(w, u):
        b1 = u >> 16                                #  | 4 mul + 3 shift
        lo = a0 * b0                                #  | + 3 add + 2 and
        t1 = a1 * b0 + (lo >> 16)                   #  | = 12 ops
        t2 = a0 * b1 + (t1 & jnp.uint32(0xFFFF))    #  |
        hi = (a1 * b1 + (t1 >> 16) + (t2 >> 16)).astype(U32)  # /
        t = (w * u - hi * q).astype(U32)            # 3 (mullo, mullo, sub)
        x0 = u + t                                  # 1
        x1 = (u + two_q - t).astype(U32)            # 2
        out.extend([x0, x1])
        ops += 20
    return out, ops


@lru_cache(maxsize=16)
def _calib_call(mix: str, iters: int, interpret: bool, nchain: int):
    q = np.uint32(1053818881)
    two_q = np.uint32(2 * 1053818881)

    UNROLL = 8
    assert iters % UNROLL == 0

    def kernel(x_ref, o_ref):
        chains = [x_ref[i] for i in range(nchain)]

        def body(i, chains):
            # Mosaic fori supports only unroll=1/full: unroll by hand so
            # loop-control overhead stays <2% of the measured ops.
            del i  # scalar i32->u32 convert recurses in Mosaic lowering;
            # a constant salt is fine (the carried chains keep every
            # iteration data-dependent, nothing folds)
            chains = list(chains)
            for _ in range(UNROLL):
                if mix == "keccak":
                    chains, _n = _keccak_mix_body(
                        chains, np.uint32(0x9E3779B9))
                else:
                    chains, _n = _ntt_mix_body(chains, q, two_q)
            return tuple(chains)

        chains = jax.lax.fori_loop(np.int32(0), np.int32(iters // UNROLL),
                                   body, tuple(chains), unroll=False)
        for i in range(nchain):
            o_ref[i] = chains[i]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nchain, _TSUB, _TLANE), U32),
        interpret=interpret,
    )


def ops_per_iter(mix: str, nchain: int = _NCHAIN) -> int:
    dummy = [jnp.zeros((), U32)] * nchain
    if mix == "keccak":
        _, ops = _keccak_mix_body(dummy, jnp.zeros((), U32))
    else:
        _, ops = _ntt_mix_body(dummy, jnp.uint32(3), jnp.uint32(6))
    return ops


def run_mix(mix: str, iters: int = 200_000, interpret: bool | None = None,
            nchain: int = _NCHAIN):
    """Returns a jit thunk computing the mix; total source-convention
    vector-op count = iters * ops_per_iter(mix, nchain) per (8,128)
    tile.  `nchain` sets the live-vreg pressure: sweeping it maps the
    register-allocator's spill cliff (the keccak kernel lives at ~85)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    call = _calib_call(mix, iters, interpret, nchain)
    x = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 2 ** 31, (nchain, _TSUB, _TLANE)).astype(np.uint32))
    return lambda: call(x)
