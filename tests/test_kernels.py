"""Pallas TPU kernel correctness coverage (interpret mode on CPU).

The Pallas kernels are the entire TPU fast path; here they run in
interpret mode so CI executes every kernel line and asserts
bit-exactness:

* ``ops.kernels.ntt.ntt_coeff_major`` vs the jnp ``ops.ntt.ntt`` per limb
  (the oracle role of /root/reference/device/test/ntt_tests.c:49-103);
* ``ops.kernels.keccak`` compute body (absorb_planes + _permute + rate
  extraction) vs hashlib's SHAKE-256 and the jnp Keccak;
* the fused symmetric pipeline with the Pallas NTT kernel forced on vs
  the bit-exact golden vectors captured from the C reference
  (golden_sym_4096_3.npz).

On hardware, every default bench.py run re-verifies a golden batch
bit-for-bit on the real TPU with BOTH Pallas kernels active (rows 0..G-1
of the timed batch are the C-reference vectors), and BENCH_WHAT=verify
runs that check standalone.
"""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seal_embedded_tpu.config import default_parms
from seal_embedded_tpu.ops import keccak as kc
from seal_embedded_tpu.ops.ntt import ntt
from seal_embedded_tpu.ops.kernels.ntt import ntt_coeff_major, ntt_batch_bn
from seal_embedded_tpu.ops.kernels.keccak import (T_STREAMS,
                                                  shake256_words_kernel)

from conftest import seed_bytes


@pytest.mark.parametrize("n", [1024, 4096])
def test_ntt_kernel_bit_exact_vs_jnp(n):
    """Interpret-mode Pallas NTT == jnp NTT, bit for bit, per limb."""
    P = default_parms(n, 3 if n >= 4096 else 1)
    moduli = tuple(int(q) for q in P.moduli)
    L, B = len(moduli), 128
    rng = np.random.default_rng(n)
    x = rng.integers(0, max(moduli), (L, n, B), dtype=np.uint64)
    x = x.astype(np.uint32)

    out = np.asarray(ntt_coeff_major(jnp.asarray(x), moduli, interpret=True))
    for l, q in enumerate(moduli):
        want = np.asarray(ntt(jnp.asarray(x[l].T), q))  # (B, n)
        assert np.array_equal(out[l], want.T), f"limb {l} (q={q})"


def test_ntt_kernel_batch_bn_wrapper():
    """(L, B, n)-layout wrapper matches the jnp NTT, multiple batch tiles."""
    n, B = 1024, 256  # 2 batch tiles exercises the grid's batch axis
    P = default_parms(n, 1)
    q = int(P.moduli[0])
    rng = np.random.default_rng(7)
    x = rng.integers(0, q, (1, B, n), dtype=np.uint64).astype(np.uint32)
    out = np.asarray(ntt_batch_bn(jnp.asarray(x), (q,), interpret=True))
    want = np.asarray(ntt(jnp.asarray(x[0]), q))
    assert np.array_equal(out[0], want)


def _tile_streams(arr_nw):
    """(T_STREAMS, W) stream-major -> list of W (8, 128) vreg planes (the
    kernel's in-tile layout, kernels/keccak.py wrapper)."""
    N, W = arr_nw.shape
    assert N == T_STREAMS
    planes = arr_nw.T.reshape(W, 8, 128)
    return [jnp.asarray(planes[w]) for w in range(W)]


def test_keccak_kernel_body_vs_hashlib():
    """The Pallas keccak kernel's exact compute body — absorb_planes +
    _permute + rate-word extraction on (8, 128) vregs — squeezed for two
    blocks, bit-exact vs hashlib SHAKE-256 over seed||counter_le8.

    (The full pallas_call runs interpret-mode orders of magnitude too slow
    for CI on this kernel — ~1800 vector ops/step — so CI executes the
    body functions directly; the pallas_call plumbing itself is exercised
    bit-exactly on hardware by bench.py's golden verify, which runs the
    fused sf pipeline with this kernel and asserts C-reference equality.)
    """
    from seal_embedded_tpu.ops.kernels.keccak import _permute, absorb_planes

    rng = np.random.default_rng(11)
    sw = rng.integers(0, 2 ** 32, (T_STREAMS, 16)).astype(np.uint32)
    ctr = rng.integers(0, 2 ** 32, (T_STREAMS, 2)).astype(np.uint32)
    # Pin a few canonical streams.
    for i, (s, c) in enumerate([(seed_bytes(2), 0), (seed_bytes(3), 1),
                                (bytes(64), 0xDEADBEEF)]):
        sw[i] = kc.seed_to_words(s)
        ctr[i] = [c & 0xFFFFFFFF, c >> 32]

    st = absorb_planes(_tile_streams(sw), _tile_streams(ctr))
    outs = []
    lo = [st[2 * k] for k in range(25)]
    hi = [st[2 * k + 1] for k in range(25)]
    for _ in range(2):  # two squeezed blocks: state persistence across grid
        lo, hi = _permute(lo, hi)
        rate = []
        for k in range(17):
            rate += [lo[k], hi[k]]
        outs.append(np.stack([np.asarray(w).reshape(-1) for w in rate], -1))
    got = np.concatenate(outs, axis=-1)  # (T_STREAMS, 68)

    for i in range(8):  # spot-check streams incl. the pinned ones
        seed = np.asarray(sw[i], dtype="<u4").tobytes()
        c = int(ctr[i][0]) | (int(ctr[i][1]) << 32)
        want = hashlib.shake_256(seed + c.to_bytes(8, "little")).digest(272)
        assert kc.words_to_bytes_np(got[i]) == want, f"stream {i}"


def test_keccak_kernel_permute_vs_jnp():
    """Kernel _permute == ops.keccak.keccak_f1600 on random full states."""
    from seal_embedded_tpu.ops.kernels.keccak import _permute

    rng = np.random.default_rng(13)
    lo_np = rng.integers(0, 2 ** 32, (25, 8, 128)).astype(np.uint32)
    hi_np = rng.integers(0, 2 ** 32, (25, 8, 128)).astype(np.uint32)
    lo, hi = _permute([jnp.asarray(x) for x in lo_np],
                      [jnp.asarray(x) for x in hi_np])
    # jnp path wants (..., 25) lane-minor
    jlo, jhi = kc.keccak_f1600(
        jnp.asarray(np.moveaxis(lo_np, 0, -1)),
        jnp.asarray(np.moveaxis(hi_np, 0, -1)))
    assert np.array_equal(np.stack([np.asarray(x) for x in lo]),
                          np.moveaxis(np.asarray(jlo), -1, 0))
    assert np.array_equal(np.stack([np.asarray(x) for x in hi]),
                          np.moveaxis(np.asarray(jhi), -1, 0))


def test_fused_pipeline_ntt_kernel_forced_golden(golden_sym, monkeypatch):
    """Full fused symmetric pipeline with the Pallas NTT kernel forced on
    (interpret mode) — bit-exact vs the C-reference golden vectors.
    (Keccak stays on the jnp path here: its Pallas interpret cost is
    prohibitive on CPU; its compute body is covered bit-exactly above and
    the full kernel on hardware by bench.py's golden verify.)"""
    from functools import partial
    from seal_embedded_tpu.ckks import fast
    from seal_embedded_tpu.ckks.fast import sym_encrypt_fused

    monkeypatch.setenv("SEAL_TPU_NTT", "kernel")
    assert fast.ntt_impl() == "kernel"

    P = default_parms(4096, 3)
    n = P.degree
    sk_packed = golden_sym["sk_packed"]
    sk_signed = np.array(
        [((sk_packed[i // 4] >> (6 - (i % 4) * 2)) & 3) - 1 for i in range(n)],
        dtype=np.int32)
    tests = golden_sym["tests"][:3]  # 3 messages keep interpret mode tractable
    vs = np.stack([t["v"] for t in tests])
    B = vs.shape[0]
    share = jnp.asarray(np.tile(kc.seed_to_words(seed_bytes(2)), (B, 1)))
    err = jnp.asarray(np.tile(kc.seed_to_words(seed_bytes(3)), (B, 1)))

    out = jax.jit(partial(sym_encrypt_fused, parms=P, encode_mode="f64"))(
        jnp.asarray(vs), jnp.asarray(sk_signed), share, err)
    assert bool(np.asarray(out["ok"]).all())
    c0, c1 = np.asarray(out["c0"]), np.asarray(out["c1"])
    for b, t in enumerate(tests):
        assert np.array_equal(np.asarray(out["pte"])[b], t["pte"]), f"pte {b}"
        for i in range(P.nprimes):
            assert np.array_equal(c0[i, b], t["c0"][i]), f"c0 t{b} p{i}"
            assert np.array_equal(c1[i, b], t["c1"][i]), f"c1 t{b} p{i}"


@pytest.mark.parametrize("n", [256, 1024, 2048, 4096])
def test_encode_kernel_bit_exact_vs_sf(n):
    """Fused Pallas encode (interpret mode off-TPU) == encode_sf, bit
    for bit, including the ok/guard flag.  (encode_sf is itself anchored
    to the C-reference golden vectors; the same kernel is additionally
    golden-verified compiled on a real chip by bench.py's verify step.)"""
    from functools import partial
    from seal_embedded_tpu.config import Parms, PRIMES_27BIT
    from seal_embedded_tpu.ops.encode import encode_sf
    from seal_embedded_tpu.ops.kernels.encode2 import encode_sf_fused

    # n=2048 is the smallest THREE-phase degree (zero roll rounds via the
    # second bit-field swap); 256/1024 cover the two-phase roll path;
    # n=4096 (2 rows — interpret mode is slow) covers the shipped default.
    parms = Parms(degree=n, moduli=PRIMES_27BIT[:2], scale=2.0 ** 20)
    rng = np.random.default_rng(n)
    rows = 2 if n >= 4096 else 4
    values = rng.uniform(-1, 1, (rows, n // 2)).astype(np.float32)
    values[0, :4] = [0.0, -0.0, 1e-44, -1e-38]   # zero / f32-subnormal rows
    v = jnp.asarray(values)
    want, ok_w = jax.jit(partial(encode_sf, parms=parms))(v)
    got, ok_g = jax.jit(partial(encode_sf_fused, parms=parms))(v)
    assert bool(np.asarray(ok_w).all()) and bool(np.asarray(ok_g).all())
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_encode_kernel_round0_specialization():
    """The fused kernel's collapsed round-0 butterfly (real inputs, im=+0)
    must reproduce the generic path's signed-zero folds bit-for-bit: craft
    inputs dense in +/-0 so adjacent IFFT positions hit dre = +/-0 against
    twiddles of every sign combination."""
    from functools import partial
    from seal_embedded_tpu.config import Parms, PRIMES_27BIT
    from seal_embedded_tpu.ops.encode import encode_sf
    from seal_embedded_tpu.ops.kernels.encode2 import encode_sf_fused

    n = 256
    parms = Parms(degree=n, moduli=PRIMES_27BIT[:2], scale=2.0 ** 20)
    rng = np.random.default_rng(17)
    vals = rng.uniform(-1, 1, (8, n // 2)).astype(np.float32)
    # rows 0-5: mixtures of +0/-0/tiny with increasing zero density
    for b, pz in enumerate([1.0, 1.0, 0.9, 0.75, 0.5, 0.25]):
        mask = rng.random(n // 2) < pz
        zs = np.where(rng.random(n // 2) < 0.5, 0.0, -0.0).astype(np.float32)
        vals[b] = np.where(mask, zs, vals[b])
    vals[1] = -0.0  # all negative zeros
    v = jnp.asarray(vals)
    want, ok_w = jax.jit(partial(encode_sf, parms=parms))(v)
    got, ok_g = jax.jit(partial(encode_sf_fused, parms=parms))(v)
    assert np.array_equal(np.asarray(ok_w), np.asarray(ok_g))
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_ntt_kernel_fused_sym_epilogue_bit_exact():
    """Fused symmetric epilogue (c0 = -a*ntt_s + ntt(x) inside the NTT
    kernel, Shoup form) == the unfused Barrett mul/neg/add epilogue,
    bit for bit (interpret mode)."""
    from seal_embedded_tpu.config import PRIMES_27BIT
    from seal_embedded_tpu.ops import modarith as ma
    from seal_embedded_tpu.ops.kernels.ntt import (ntt_coeff_major,
                                                   ntt_coeff_major_fused_sym)

    moduli = tuple(int(q) for q in PRIMES_27BIT[:2])
    L, n, B = 2, 256, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.stack(
        [rng.integers(0, q, (n, B)).astype(np.uint32) for q in moduli]))
    a = jnp.asarray(np.stack(
        [rng.integers(0, q, (n, B)).astype(np.uint32) for q in moduli]))
    s = jnp.asarray(np.stack(
        [rng.integers(0, q, n).astype(np.uint32) for q in moduli]))
    got = ntt_coeff_major_fused_sym(x, a, s, moduli)
    ntt_pte = ntt_coeff_major(x, moduli)
    want = []
    for l, q in enumerate(moduli):
        as_ = ma.mul_mod(a[l], s[l][:, None], q)
        want.append(ma.add_mod(ma.neg_mod(as_, q), ntt_pte[l], q))
    assert np.array_equal(np.asarray(got), np.asarray(jnp.stack(want)))


def test_calibrate_kernel_mixes_run():
    """The VPU calibration mixes execute (interpret) and count ops."""
    from seal_embedded_tpu.ops.kernels.calibrate import ops_per_iter, run_mix
    assert ops_per_iter("keccak") == 64
    assert ops_per_iter("ntt") == 80
    for mix in ("keccak", "ntt"):
        out = np.asarray(run_mix(mix, 8)())
        assert out.shape == (8, 8, 128) and out.any()


def test_ntt_kernel_fused_asym_bit_exact():
    """Fused asym kernel (3 NTTs + pk combine per limb step) == unfused
    NTT + Barrett mul/add epilogue, bit for bit (interpret mode)."""
    from seal_embedded_tpu.config import PRIMES_27BIT
    from seal_embedded_tpu.ops import modarith as ma
    from seal_embedded_tpu.ops.kernels.ntt import (
        ntt_coeff_major, ntt_coeff_major_fused_asym)

    moduli = tuple(int(q) for q in PRIMES_27BIT[:2])
    L, n, B = 2, 256, 128
    rng = np.random.default_rng(1)

    def mk():
        return jnp.asarray(np.stack(
            [rng.integers(0, q, (n, B)).astype(np.uint32) for q in moduli]))

    u, e1, pte = mk(), mk(), mk()
    pk0 = jnp.asarray(np.stack(
        [rng.integers(0, q, n).astype(np.uint32) for q in moduli]))
    pk1 = jnp.asarray(np.stack(
        [rng.integers(0, q, n).astype(np.uint32) for q in moduli]))
    c0, c1 = ntt_coeff_major_fused_asym(u, e1, pte, pk0, pk1, moduli)
    nu = ntt_coeff_major(u, moduli)
    ne1 = ntt_coeff_major(e1, moduli)
    npte = ntt_coeff_major(pte, moduli)
    for l, q in enumerate(moduli):
        w1 = ma.add_mod(ma.mul_mod(pk1[l][:, None], nu[l], q), ne1[l], q)
        w0 = ma.add_mod(ma.mul_mod(pk0[l][:, None], nu[l], q), npte[l], q)
        assert np.array_equal(np.asarray(c0)[l], np.asarray(w0)), f"c0 {l}"
        assert np.array_equal(np.asarray(c1)[l], np.asarray(w1)), f"c1 {l}"


def test_asym_fused_kernel_forced_golden(monkeypatch):
    """asym_encrypt_fused with the fused-asym Pallas kernel forced on
    (interpret) — bit-exact vs the C-reference asym golden vectors."""
    import pathlib
    from functools import partial
    from seal_embedded_tpu.ckks.asym import asym_encrypt_fused

    monkeypatch.setenv("SEAL_TPU_NTT", "kernel")
    data = np.load(pathlib.Path(__file__).parent / "golden_asym_4096_3.npz")
    P = default_parms(4096, 3)
    L = P.nprimes
    ntests = 2
    vs = np.stack([data[f"v_{t}"] for t in range(ntests)])
    pk0 = jnp.asarray(np.stack([data[f"pk0_{i}"] for i in range(L)]))
    pk1 = jnp.asarray(np.stack([data[f"pk1_{i}"] for i in range(L)]))
    err = jnp.asarray(np.tile(kc.seed_to_words(seed_bytes(3)), (ntests, 1)))

    out = jax.jit(partial(asym_encrypt_fused, parms=P, encode_mode="f64"))(
        jnp.asarray(vs), pk0, pk1, err)
    assert bool(np.asarray(out["ok"]).all())
    for b in range(ntests):
        for i in range(L):
            assert np.array_equal(np.asarray(out["c0"])[i, b],
                                  data[f"c0_{L * b + i}"]), f"c0 {b} {i}"
            assert np.array_equal(np.asarray(out["c1"])[i, b],
                                  data[f"c1_{L * b + i}"]), f"c1 {b} {i}"
