"""Batched asymmetric (public-key) CKKS encode+encrypt pipeline (TPU).

Reference flow (seal_embedded.c asym path, ckks_asym.c:159-286):
    u <- ternary;  pte = pt + e0;  e1 <- CBD       (one private PRNG stream)
    per prime: c1 = pk1 * ntt(u) + ntt(e1)
               c0 = pk0 * ntt(u) + ntt(pte)
plus device-side public-key generation (gen_pk = symmetric encryption of
zero with explicit ep, ckks_asym.c:159-171).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Parms
from ..ops import modarith as ma
from ..ops import sampling as sp
from ..ops.encode import encode
from ..ops.ntt import ntt
from .sym import _ntt_s_for_prime


def gen_pk_batch(sk_signed, pk_seed_words, ep, parms: Parms):
    """Device-side pk generation (ckks_asym.c:159-171).

    sk_signed: i32 (n,); pk_seed_words: u32 (16,) or (1, 16);
    ep: i32 (n,) CBD error.  Returns (pk0, pk1): u32 (nprimes, n).
    """
    n = parms.degree
    counter = jnp.zeros((1,), jnp.uint32)
    pk0_list, pk1_list = [], []
    for q in parms.moduli:
        a, counter, _ = sp.sample_uniform(pk_seed_words, counter, n, q)
        a = a[0]
        ntt_s = _ntt_s_for_prime(sk_signed, q)
        pk0 = ma.neg_mod(ma.mul_mod(a, ntt_s, q), q)
        ep_red = jnp.where(ep < 0, (ep + q).astype(jnp.uint32),
                           ep.astype(jnp.uint32))
        pk0 = ma.add_mod(pk0, ntt(ep_red, q), q)
        pk0_list.append(pk0)
        pk1_list.append(a)
    return jnp.stack(pk0_list), jnp.stack(pk1_list)


def asym_encrypt_batch(values, pk0, pk1, seed_words, parms: Parms):
    """Full batched asymmetric encode+encrypt.

    values:     f32 (B, <= n/2)
    pk0, pk1:   u32 (nprimes, n) public key, NTT form
    seed_words: u32 (B, 16) per-message private seeds
    Returns dict with c0, c1 u32 (nprimes, B, n), ok (B,).
    """
    B = values.shape[0]
    n = parms.degree

    pt, ok = encode(values, parms)

    counter = jnp.zeros((B,), jnp.uint32)
    u_signed, counter, ok_t = sp.sample_ternary(seed_words, counter, n)
    e0, counter = sp.sample_cbd(seed_words, counter, n)
    e1, counter = sp.sample_cbd(seed_words, counter, n)
    pte = pt + e0.astype(jnp.int64)
    ok = ok & ok_t

    c0_list, c1_list = [], []
    for i, q in enumerate(parms.moduli):
        u_modq = sp.ternary_to_modq(u_signed, q)
        ntt_u = ntt(u_modq, q)
        c1 = ma.mul_mod(pk1[i][None, :], ntt_u, q)
        c0 = ma.mul_mod(pk0[i][None, :], ntt_u, q)
        e1_red = jnp.where(e1 < 0, (e1 + q).astype(jnp.uint32),
                           e1.astype(jnp.uint32))
        c1 = ma.add_mod(c1, ntt(e1_red, q), q)
        pte_red = ma.reduce_pte_i64(pte, q)
        c0 = ma.add_mod(c0, ntt(pte_red, q), q)
        c0_list.append(c0)
        c1_list.append(c1)

    return {
        "c0": jnp.stack(c0_list),
        "c1": jnp.stack(c1_list),
        "pt": pt,
        "pte": pte,
        "ok": ok,
    }


from functools import lru_cache


@lru_cache(maxsize=16)
def make_asym_encryptor(parms: Parms):
    return jax.jit(partial(asym_encrypt_batch, parms=parms))
