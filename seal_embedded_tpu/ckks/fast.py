"""TPU fast path: fused symmetric pipeline on Pallas kernels.

Same math and same bit-exact reference semantics as ckks.limbwise
(layout="reference": one shareable PRNG stream whose counter chains
sequentially across primes, seal_embedded.c:145-213), but restructured so
the two hot components run as Pallas kernels:

* all per-limb NTTs of the (batched) plaintext+error execute in ONE
  ``ops.kernels.ntt`` call over coefficient-major (L, n, B) data — the
  NTT of pte is independent of the per-limb sampling, so it needs no
  place inside the limb scan;
* every SHAKE-256 expansion (uniform base + rejection queue, CBD) runs
  through ``ops.kernels.keccak`` (dispatched inside ops.keccak on TPU);
* the limb scan carries only the sampler counter (the one true sequential
  dependency) plus cheap elementwise modular ops.

Bit-identical to ckks.limbwise.sym_encrypt_limbscan(layout="reference")
— asserted in tests/test_fast.py (jnp fallback graph) and, with both
Pallas kernels forced on in interpret mode, against the C-reference
golden vectors in tests/test_kernels.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Parms
from ..ops import modarith as ma
from ..ops import sampling as sp
from ..ops.encode import encode_any
from ..ops.kernels.ntt import ntt_coeff_major
from ..ops.ntt import ntt


def ntt_impl() -> str:
    """Choose the all-limb NTT implementation: the Pallas kernel on TPU,
    the vmapped table-driven jnp NTT elsewhere (bit-identical, tested
    against each other in tests/test_kernels.py).  Override with
    SEAL_TPU_NTT=jnp|kernel — forcing "kernel" off-TPU runs the Pallas
    kernel in interpret mode."""
    import os
    forced = os.environ.get("SEAL_TPU_NTT")
    if forced in ("jnp", "kernel"):
        return forced
    return "kernel" if jax.default_backend() == "tpu" else "jnp"


def _ntt_all_limbs(x_lbn, moduli):
    """(L, B, n) u32 -> per-limb forward NTT.  Pallas kernel on TPU
    (coefficient-major, one call for the whole limb axis); a vmapped
    table-driven jnp NTT elsewhere (bit-identical, tested against each
    other)."""
    if ntt_impl() == "kernel":
        L, B, n = x_lbn.shape
        bt = 128
        pad = (-B) % bt
        x = jnp.swapaxes(x_lbn, 1, 2)                        # (L, n, B)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((L, n, pad), jnp.uint32)], axis=-1)
        out = ntt_coeff_major(x, moduli)  # interpret auto: off-TPU only
        return jnp.swapaxes(out[..., :B], 1, 2)
    from ..ops import modarith as ma
    from ..ops.ntt import ntt_tables_stacked, ntt_with_tables
    n = x_lbn.shape[-1]
    op, quot = ntt_tables_stacked(n, moduli)
    qs = jnp.asarray(np.array(moduli, np.uint32))
    return jax.vmap(ntt_with_tables)(x_lbn, jnp.asarray(op),
                                     jnp.asarray(quot), qs)


def _mods_bcast(parms: Parms):
    """Mod of (L, 1, 1) arrays for broadcasting against (L, B, n) data."""
    m = ma.modpack(parms.moduli)
    return ma.Mod(*(jnp.asarray(f)[:, None, None] for f in m))


def sym_encrypt_fused(values, sk_signed, share_words, err_words,
                      parms: Parms, encode_mode: str = "dd"):
    """Batched symmetric encode+encrypt, reference PRNG semantics.

    values: f32 (B, <= n/2); sk_signed: i32 (n,) in {-1,0,1};
    share/err_words: u32 (B, 16) PRNG seeds.
    Returns dict with c0/c1 u32 (L, B, n), pte i64 (B, n), ok (B,).
    """
    B = values.shape[0]
    n = parms.degree
    L = parms.nprimes
    moduli = tuple(int(q) for q in parms.moduli)

    # --- encode + error (ckks_encode_base + ckks_sym_init) ---
    # (A variant feeding the sf kernel's u32 pair outputs directly into
    # the pair-based reduce_pte measured 1.2 ms SLOWER at B=512 than this
    # i64 round-trip — XLA fuses the i64 form better; keep it.)
    mods_b = _mods_bcast(parms)
    pt, ok_encode = encode_any(values, parms, encode_mode)
    e, _ = sp.sample_cbd(err_words, sp.counter_zero((B,)), n)
    pte = pt + e.astype(jnp.int64)
    pte_red = ma.reduce_pte_i64(pte[None], mods_b)          # (L, B, n) u32
    ntt_pte = _ntt_all_limbs(pte_red, moduli)               # (L, B, n)

    # --- NTT(s) per limb: (L, n), tiny (batch-independent) ---
    ntt_s = jnp.stack([
        ntt(jnp.where(sk_signed < 0, jnp.uint32(q - 1),
                      sk_signed.astype(jnp.uint32)), q)
        for q in moduli
    ])                                                      # (L, n)

    # --- limb scan: uniform a per prime, counter chains (bit-exact) ---
    mods = ma.Mod(*(jnp.asarray(f) for f in ma.modpack(parms.moduli)))

    def step(carry, mod):
        counter, ok = carry
        a, counter, ok_u = sp.sample_uniform(
            share_words, counter, n, mod,
            queue_cap=sp.queue_cap_for(n, parms.moduli))
        return (counter, ok & ok_u), a

    (counter, ok), a = jax.lax.scan(
        step, (sp.counter_zero((B,)), ok_encode), mods, length=L)

    # --- c0 = -a * ntt(s) + ntt(pte) mod q, all limbs at once ---
    c0 = _combine_c0(pte_red, a, ntt_s, ntt_pte, mods_b, moduli)
    return {"c0": c0, "c1": a, "pte": pte, "pt": pt, "ok": ok}


def _combine_c0(pte_red, a, ntt_s, ntt_pte, mods_b, moduli):
    """c0 = add_mod(neg_mod(mul_mod(a, ntt_s)), ntt(pte)).  On the kernel
    path the multiply/neg/add run in the NTT kernel's epilogue while each
    tile is still in VMEM (ntt_pte is recomputed fused — the separate
    `ntt_pte` value feeds only the jnp fallback), saving the extra XLA
    elementwise pass over (L, B, n).  Disable with SEAL_TPU_FUSE=0.
    Bit-identical either way (Shoup vs Barrett forms of the same exact
    canonical values; asserted in tests/test_kernels.py)."""
    import os
    L, B, n = a.shape
    # n=16384 OOMs VMEM with the extra a-input/s-table buffers (Mosaic
    # pads (n, 1) blocks to 128 lanes; measured 144.7M of 128M) — the
    # biggest degree keeps the XLA epilogue.
    if (ntt_impl() == "kernel" and n <= 8192
            and os.environ.get("SEAL_TPU_FUSE", "1") == "1"):
        from ..ops.kernels.ntt import ntt_coeff_major_fused_sym
        bt = 128
        pad = (-B) % bt
        x = jnp.swapaxes(pte_red, 1, 2)                     # (L, n, B)
        at = jnp.swapaxes(a, 1, 2)
        if pad:
            zeros = jnp.zeros((L, n, pad), jnp.uint32)
            x = jnp.concatenate([x, zeros], axis=-1)
            at = jnp.concatenate([at, zeros], axis=-1)
        c0 = ntt_coeff_major_fused_sym(x, at, ntt_s, moduli)
        return jnp.swapaxes(c0[..., :B], 1, 2)
    as_ = ma.mul_mod(a, ntt_s[:, None, :], mods_b)
    return ma.add_mod(ma.neg_mod(as_, mods_b), ntt_pte, mods_b)


@lru_cache(maxsize=16)
def make_fused_encryptor(parms: Parms, encode_mode: str = "dd"):
    return jax.jit(partial(sym_encrypt_fused, parms=parms,
                           encode_mode=encode_mode))
