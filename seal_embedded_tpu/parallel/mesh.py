"""Device mesh + sharded encryption entry points.

Parallelism axes for CKKS encode/encrypt (SURVEY.md S2.3):
  data  — batch of independent messages (DP): embarrassingly parallel
  limb  — RNS primes (TP-like): each prime's NTT/sampling is independent

The pipeline needs no collectives in steady state (each (message, limb) cell
is independent); XLA inserts the broadcast of the encoded plaintext across
the limb axis.  Coefficient sharding (sequence-parallel NTT) is a separate
path in parallel/coeff_ntt.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Parms


def make_mesh(n_data: int | None = None, n_limb: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_limb
    assert n_data * n_limb == n, (n_data, n_limb, n)
    dev_array = np.array(devices).reshape(n_data, n_limb)
    return Mesh(dev_array, ("data", "limb"))


def shard_batch(mesh: Mesh, *arrays):
    """Place batched arrays with the batch axis sharded over 'data'."""
    sh = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, sh) for a in arrays)


def sym_encrypt_sharded(mesh: Mesh, parms: Parms):
    """jit sym_encrypt_batch with batch sharded over 'data' and the RNS
    output axis sharded over 'limb'.

    GSPMD convenience wrapper: the batch splits across 'data' and output
    components land limb-sharded for streaming, but the per-prime compute
    is whatever the partitioner infers.  For guaranteed limb-parallel
    compute (each device owns its primes end-to-end via shard_map) use
    parallel.limbwise.make_limb_sharded_encryptor instead.
    """
    from ..ckks.sym import sym_encrypt_batch

    in_specs = (
        NamedSharding(mesh, P("data", None)),   # values
        NamedSharding(mesh, P(None)),            # sk
        NamedSharding(mesh, P("data", None)),   # share seeds
        NamedSharding(mesh, P("data", None)),   # err seeds
    )
    out_specs = {
        "c0": NamedSharding(mesh, P("limb", "data", None)),
        "c1": NamedSharding(mesh, P("limb", "data", None)),
        "pt": NamedSharding(mesh, P("data", None)),
        "pte": NamedSharding(mesh, P("data", None)),
        "ok": NamedSharding(mesh, P("data")),
    }
    return jax.jit(partial(sym_encrypt_batch, parms=parms),
                   in_shardings=in_specs, out_shardings=out_specs)
