"""Multi-device sharding tests on the virtual 8-device CPU mesh:
sharded results must be bit-identical to the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seal_embedded_tpu.config import Parms, PRIMES_27BIT
from seal_embedded_tpu.ops.ntt import ntt
from seal_embedded_tpu.parallel.coeff_ntt import ntt_coeff_sharded
from seal_embedded_tpu.parallel.mesh import make_mesh, sym_encrypt_sharded

Q27 = PRIMES_27BIT[0]


@pytest.mark.parametrize("variant", ["staged", "4step"])
@pytest.mark.parametrize("n,ndev", [(256, 8), (512, 4), (64, 8)])
def test_coeff_sharded_ntt_bit_exact(n, ndev, variant):
    mesh = make_mesh(n_data=ndev, n_limb=1, devices=jax.devices()[:ndev])
    rng = np.random.default_rng(n)
    x = jnp.asarray(rng.integers(0, Q27, (3, n)).astype(np.uint32))
    got = ntt_coeff_sharded(mesh, n, Q27, axis="data", variant=variant)(x)
    want = ntt(x, Q27)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_coeff_sharded_ntt_4step_flagship_degree():
    """n=4096 over 8 devices: the production 4-step plan, panel 512x64."""
    mesh = make_mesh(n_data=8, n_limb=1)
    n = 4096
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.integers(0, Q27, (2, n)).astype(np.uint32))
    got = ntt_coeff_sharded(mesh, n, Q27, axis="data", variant="4step")(x)
    assert np.array_equal(np.asarray(got), np.asarray(ntt(x, Q27)))


def test_sym_encrypt_sharded_matches_unsharded():
    from functools import partial
    from seal_embedded_tpu.ckks.sym import sym_encrypt_batch

    parms = Parms(degree=64, moduli=PRIMES_27BIT[:2], scale=2.0 ** 20)
    mesh = make_mesh(n_data=4, n_limb=2)
    B, n = 8, parms.degree
    rng = np.random.default_rng(0)
    values = jnp.asarray(rng.uniform(-1, 1, (B, n // 2)).astype(np.float32))
    sk = jnp.asarray((rng.integers(0, 3, n) - 1).astype(np.int32))
    share = jnp.asarray(rng.integers(0, 2 ** 32, (B, 16)).astype(np.uint32))
    err = jnp.asarray(rng.integers(0, 2 ** 32, (B, 16)).astype(np.uint32))

    with mesh:
        sharded = sym_encrypt_sharded(mesh, parms)(values, sk, share, err)
    plain = jax.jit(partial(sym_encrypt_batch, parms=parms))(
        values, sk, share, err)
    for k in ("c0", "c1", "pte"):
        assert np.array_equal(np.asarray(sharded[k]), np.asarray(plain[k])), k
    assert bool(np.asarray(sharded["ok"]).all())


def _rand_inputs(parms, B, seed=0):
    n = parms.degree
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(-1, 1, (B, n // 2)).astype(np.float32)),
            jnp.asarray((rng.integers(0, 3, n) - 1).astype(np.int32)),
            jnp.asarray(rng.integers(0, 2 ** 32, (B, 16)).astype(np.uint32)),
            jnp.asarray(rng.integers(0, 2 ** 32, (B, 16)).astype(np.uint32)))


def test_limb_sharded_sym_bit_exact():
    """shard_map limb pipeline == single-device 'parallel' layout, bit for
    bit, on a 4x2 data x limb mesh."""
    from seal_embedded_tpu.ckks.limbwise import make_limbscan_encryptor
    from seal_embedded_tpu.parallel.limbwise import (
        make_limb_sharded_encryptor)

    parms = Parms(degree=512, moduli=PRIMES_27BIT[:2], scale=2.0 ** 20)
    mesh = make_mesh(n_data=4, n_limb=2)
    values, sk, share, err = _rand_inputs(parms, B=8)

    sharded = make_limb_sharded_encryptor(mesh, parms)(
        values, sk, share, err)
    plain = make_limbscan_encryptor(parms, "parallel")(
        values, sk, share, err)
    assert bool(np.asarray(sharded["ok"]).all())
    for k in ("c0", "c1", "pte"):
        assert np.array_equal(np.asarray(sharded[k]), np.asarray(plain[k])), k
    # And the limb outputs really are distributed: c0 spans all 8 devices
    # with the limb axis split (no replication of limb compute results).
    assert len(sharded["c0"].sharding.device_set) == 8
    spec = sharded["c0"].sharding.spec
    assert spec[0] == "limb" and spec[1] == "data", spec


def test_limb_sharded_asym_bit_exact():
    """Asym shard_map limb pipeline == single-device asym batch path."""
    from functools import partial
    from seal_embedded_tpu.ckks.asym import asym_encrypt_batch, gen_pk_batch
    from seal_embedded_tpu.parallel.limbwise import (
        make_asym_limb_sharded_encryptor)

    parms = Parms(degree=512, moduli=PRIMES_27BIT[:2], scale=2.0 ** 20)
    mesh = make_mesh(n_data=4, n_limb=2)
    n = parms.degree
    rng = np.random.default_rng(7)
    sk = jnp.asarray((rng.integers(0, 3, n) - 1).astype(np.int32))
    ep = jnp.asarray(rng.integers(-20, 21, n).astype(np.int32))
    pkseed = jnp.asarray(rng.integers(0, 2 ** 32, (1, 16)).astype(np.uint32))
    pk0, pk1 = gen_pk_batch(sk, pkseed, ep, parms)
    values, _, share, _ = _rand_inputs(parms, B=8, seed=8)

    sharded = make_asym_limb_sharded_encryptor(mesh, parms)(
        values, pk0, pk1, share)
    plain = jax.jit(partial(asym_encrypt_batch, parms=parms,
                            encode_mode="f64"))(values, pk0, pk1, share)
    assert bool(np.asarray(sharded["ok"]).all())
    for k in ("c0", "c1", "pte"):
        assert np.array_equal(np.asarray(sharded[k]), np.asarray(plain[k])), k


def test_multihost_mesh_bit_exact():
    """(host=2, data=2, limb=2) virtual mesh: the multi-host encryptor
    (batch over host x data via DCN-analog axis, limbs over ICI-analog
    axis) is bit-identical to the single-device 'parallel' layout."""
    from seal_embedded_tpu.ckks.limbwise import make_limbscan_encryptor
    from seal_embedded_tpu.parallel import multihost as mh

    parms = Parms(degree=512, moduli=PRIMES_27BIT[:2], scale=2.0 ** 20)
    mesh = mh.make_host_mesh(n_limb=2, n_hosts=2)
    assert mesh.shape == {"host": 2, "data": 2, "limb": 2}
    values, sk, share, err = _rand_inputs(parms, B=8, seed=11)

    args = mh.shard_inputs(mesh, values, sk, share, err)
    out = mh.make_multihost_encryptor(mesh, parms)(*args)
    got = mh.collect_to_host(out)
    plain = make_limbscan_encryptor(parms, "parallel")(
        values, sk, share, err)
    assert bool(got["ok"].all())
    for k in ("c0", "c1", "pte"):
        assert np.array_equal(got[k], np.asarray(plain[k])), k
    # Batch really spans the host axis: 8 devices hold distinct shards.
    assert len(out["c0"].sharding.device_set) == 8


def test_multihost_init_noop_single_process():
    from seal_embedded_tpu.parallel import multihost as mh
    assert mh.init_distributed() is False
    assert mh.init_distributed(num_processes=1) is False
