"""Limb-sharded (tensor-parallel) encrypt pipelines via shard_map.

The RNS limb axis is embarrassingly parallel once the PRNG layout
decouples the per-prime uniform streams ("parallel" counter layout,
ckks/limbwise.py: prime i's stream starts at counter i * STRIDE).  Here
that layout runs with the limb axis genuinely SHARDED over a mesh axis:
each device owns L/n_limb primes end-to-end — its own uniform sampling,
NTT(s), NTT(pte) and modular arithmetic — with zero steady-state
collectives inside the limb pipeline (SURVEY.md §2.3 "RNS-limb sharding
(TP)" row).

Composition with data parallelism: the encode + CBD front end is batch-
sharded over BOTH mesh axes (every device encodes a slice), then GSPMD
re-lays pte to batch-over-'data' × replicated-over-'limb' for the
shard_mapped limb pipeline (one all-gather along 'limb' of the encoded
plaintext — the only collective in the graph).

Bit-exactness: outputs are bit-identical to the single-device
ckks.limbwise.sym_encrypt_limbscan(layout="parallel") (asserted on an
8-device CPU mesh in tests/test_parallel.py) — i.e. sharding changes the
placement, not one bit of the ciphertext.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Parms
from ..ckks.limbwise import PARALLEL_COUNTER_STRIDE


def _flat_axes(*axes):
    """Flatten possibly-composite mesh-axis names into one P-entry tuple
    (('host', 'data'), 'limb') -> ('host', 'data', 'limb')."""
    out = []
    for a in axes:
        out.extend(a) if isinstance(a, tuple) else out.append(a)
    return tuple(out)
from ..ops import modarith as ma
from ..ops import sampling as sp
from ..ops.ntt import ntt_tables_stacked, ntt_with_tables


def _limb_consts(parms: Parms):
    mods = ma.Mod(*(jnp.asarray(f) for f in ma.modpack(parms.moduli)))
    op, quot = ntt_tables_stacked(parms.degree, parms.moduli)
    ctr0 = np.stack([(np.arange(parms.nprimes) * PARALLEL_COUNTER_STRIDE
                      ).astype(np.uint32),
                     np.zeros(parms.nprimes, np.uint32)], axis=-1)
    return mods, jnp.asarray(op), jnp.asarray(quot), jnp.asarray(ctr0)


@lru_cache(maxsize=16)
def make_limb_sharded_encryptor(mesh: Mesh, parms: Parms,
                                encode_mode: str = "f64",
                                data_axis: str = "data",
                                limb_axis: str = "limb"):
    """Symmetric batched encode+encrypt with the limb axis sharded over
    `mesh[limb_axis]` and the batch over `mesh[data_axis]`.

    Returns jit fn(values, sk_signed, share_words, err_words) -> dict,
    bit-identical to sym_encrypt_limbscan(layout="parallel")."""
    n, L = parms.degree, parms.nprimes
    n_limb = mesh.shape[limb_axis]
    assert L % n_limb == 0, (L, n_limb)
    mods, op, quot, ctr0 = _limb_consts(parms)
    qcap = sp.queue_cap_for(n, parms.moduli)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(data_axis, None), P(), P(data_axis, None),
                       P(limb_axis), P(limb_axis, None), P(limb_axis, None),
                       P(limb_axis, None)),
             out_specs=(P(limb_axis, data_axis, None),
                        P(limb_axis, data_axis, None),
                        P(limb_axis, data_axis)))
    def limb_pipe(pte, sk_signed, share_words, mods, op, quot, ctr0):
        B_loc = pte.shape[0]

        def limb_fn(mod, op_l, quot_l, c0_init):
            counter = jnp.broadcast_to(c0_init, (B_loc, 2))
            a, counter, ok_u = sp.sample_uniform(share_words, counter,
                                                 n, mod, queue_cap=qcap)
            s_modq = sp.ternary_to_modq_any(sk_signed, mod)
            ntt_s = ntt_with_tables(s_modq, op_l, quot_l, mod)
            c0 = ma.neg_mod(ma.mul_mod(a, ntt_s[None, :], mod), mod)
            pte_red = ma.reduce_pte_i64(pte, mod)
            c0 = ma.add_mod(c0, ntt_with_tables(pte_red, op_l, quot_l, mod),
                            mod)
            return c0, a, ok_u

        return jax.vmap(limb_fn)(mods, op, quot, ctr0)

    def run(values, sk_signed, share_words, err_words):
        from ..ops.encode import encode_any
        B = values.shape[0]
        pt, ok_e = encode_any(values, parms, encode_mode)
        e, _ = sp.sample_cbd(err_words, sp.counter_zero((B,)), n)
        pte = pt + e.astype(jnp.int64)
        c0, c1, ok_u = limb_pipe(pte, sk_signed, share_words,
                                 mods, op, quot, ctr0)
        return {"c0": c0, "c1": c1, "pte": pte, "pt": pt,
                "ok": ok_e & ok_u.all(axis=0)}

    both = P(_flat_axes(data_axis, limb_axis), None)
    in_sh = (NamedSharding(mesh, both), NamedSharding(mesh, P(None)),
             NamedSharding(mesh, both), NamedSharding(mesh, both))
    return jax.jit(run, in_shardings=in_sh)


@lru_cache(maxsize=16)
def make_asym_limb_sharded_encryptor(mesh: Mesh, parms: Parms,
                                     encode_mode: str = "f64",
                                     data_axis: str = "data",
                                     limb_axis: str = "limb"):
    """Asymmetric batched encode+encrypt, limb axis sharded (the pk rows
    live distributed: device d holds pk[d * L/n_limb : ...]).

    Bit-identical to ckks.asym.asym_encrypt_batch (the asym per-prime loop
    has no cross-prime PRNG dependency at all, ckks_asym.c:205-286, so no
    special counter layout is needed)."""
    from ..ckks.asym import _signed_to_modq
    n, L = parms.degree, parms.nprimes
    n_limb = mesh.shape[limb_axis]
    assert L % n_limb == 0, (L, n_limb)
    mods, op, quot, _ = _limb_consts(parms)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(data_axis, None), P(data_axis, None),
                       P(data_axis, None), P(limb_axis, None),
                       P(limb_axis, None), P(limb_axis),
                       P(limb_axis, None), P(limb_axis, None)),
             out_specs=(P(limb_axis, data_axis, None),
                        P(limb_axis, data_axis, None)))
    def limb_pipe(u_signed, e1, pte, pk0, pk1, mods, op, quot):
        def limb_fn(mod, op_l, quot_l, pk0_l, pk1_l):
            u_modq = sp.ternary_to_modq_any(u_signed, mod)
            ntt_u = ntt_with_tables(u_modq, op_l, quot_l, mod)
            c1 = ma.mul_mod(pk1_l[None, :], ntt_u, mod)
            c0 = ma.mul_mod(pk0_l[None, :], ntt_u, mod)
            e1_red = _signed_to_modq(e1, mod)
            c1 = ma.add_mod(c1, ntt_with_tables(e1_red, op_l, quot_l, mod),
                            mod)
            pte_red = ma.reduce_pte_i64(pte, mod)
            c0 = ma.add_mod(c0, ntt_with_tables(pte_red, op_l, quot_l, mod),
                            mod)
            return c0, c1

        return jax.vmap(limb_fn)(mods, op, quot, pk0, pk1)

    def run(values, pk0, pk1, seed_words):
        from ..ops.encode import encode_any
        B = values.shape[0]
        pt, ok = encode_any(values, parms, encode_mode)
        counter = sp.counter_zero((B,))
        u_signed, counter, ok_t = sp.sample_ternary(seed_words, counter, n)
        e0, counter = sp.sample_cbd(seed_words, counter, n)
        e1, counter = sp.sample_cbd(seed_words, counter, n)
        pte = pt + e0.astype(jnp.int64)
        c0, c1 = limb_pipe(u_signed, e1, pte, pk0, pk1, mods, op, quot)
        return {"c0": c0, "c1": c1, "pt": pt, "pte": pte, "ok": ok & ok_t}

    both = P(_flat_axes(data_axis, limb_axis), None)
    in_sh = (NamedSharding(mesh, both),
             NamedSharding(mesh, P(limb_axis, None)),
             NamedSharding(mesh, P(limb_axis, None)),
             NamedSharding(mesh, both))
    return jax.jit(run, in_shardings=in_sh)
