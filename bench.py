"""Benchmark: batched CKKS encode+encrypt throughput on real TPU.

Default mode ("all") emits the full tracked matrix from BASELINE.md as a
sequence of JSON lines — component kernels with speed-of-light roofline
comparisons, asym and deep-chain pipelines — and prints the HEADLINE
line LAST (sym n=4096/L=3, bit-exact sf encode, golden-verified
on-device) so drivers that record the final line capture the headline
with the whole matrix summarized in extra.matrix.

The headline reports the BIT-EXACT configuration (encode="sf": software
IEEE-754 f64 on device — ciphertexts bit-identical to the C reference),
measures the decode-exact fast path (encode="dd") alongside, and
re-verifies golden batches ON THE DEVICE inside the same compiled graph
before reporting (extra.verify).

Timing uses amortized back-to-back dispatch with a one-element fetch
barrier, sliced on device (block_until_ready is not a reliable fence on
the axon tunnel platform, and fetching whole buffers would time the
tunnel's device-to-host bandwidth instead of the kernels).

Config via env:
  BENCH_WHAT     all | pipeline | ntt | keccak | encode | sample |
                 index_map | verify        (default all)
  BENCH_B        batch for single-config modes (default 1024 — measured
                 v5e sweet spot: full 1024-stream Keccak tiles; 32.1k
                 enc/s sf vs 30.2k at B=512)
  BENCH_ITERS    timed iterations (default 10)
  BENCH_DEGREE   polynomial degree (default 4096)
  BENCH_NPRIMES  RNS chain length (default 3)
  BENCH_PIPE     fused | limbwise | asym   (default fused)
  BENCH_ENCODE   sf | dd | f64  (default sf: bit-exact; dd is the
                 decode-exact fast path; integer stages are bit-exact
                 in every mode)
  BENCH_DD_TOO   1 (default) also measure encode=dd in extra; 0 skips
  BENCH_DEEP     1 (default) include n=8192/16384 deep chains in all;
                 0 limits "all" to the n=4096 rows + components

Roofline accounting (BASELINE.md "NTT butterflies/sec tracked vs
per-chip speed-of-light"): every "all" run first MEASURES the
sustainable VPU rate for each hot kernel's op mix
(ops/kernels/calibrate.py) and reports component rows against both the
theoretical ceiling (4 ALU ops/cycle/lane x 1024 lanes x 940 MHz =
3.85e12 u32 eops/s -> extra.sol_*) and the calibrated one
(extra.sol_*_calibrated) — the calibrated fractions are the actionable
distance-to-light.
"""

import json
import os
import time

import numpy as np

VPU_OPS_PER_S = 3.85e12  # v5e upper bound: 4 ops/cycle/lane * 1024 * 0.94GHz
NTT_OPS_PER_BFLY = 20    # _shoup_lazy (mulhi 16-bit limbs) + lazy correction


def _fetch_one(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def _time(fn, args, iters, reps: int = 1):
    """Amortized timing; with reps > 1 returns the MINIMUM per-rep
    average — the robust statistic for short component benches, whose
    single-rep numbers vary several-fold with tunnel/host contention
    (pipeline rows are long enough that one rep is stable)."""
    t0 = time.time()
    _fetch_one(fn(*args))
    compile_s = time.time() - t0
    best = None
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _fetch_one(out)
        avg = (time.time() - t0) / iters
        best = avg if best is None else min(best, avg)
    return best, compile_s, out


def _emit(metric, value, unit, vs_baseline, extra):
    line = {"metric": metric, "value": round(value, 2), "unit": unit,
            "vs_baseline": round(vs_baseline, 3), "extra": extra}
    print(json.dumps(line), flush=True)
    return line


def _pipeline_inputs(parms, B, rng, encode_mode, pipe):
    """Batch inputs; rows 0..G-1 carry the C-reference golden vectors
    (same sk, same PRNG seeds) when they match the config, so the exact
    computation being timed is verified bit-for-bit."""
    import jax.numpy as jnp
    n = parms.degree
    gold = _load_golden(parms) if encode_mode in ("sf", "f64") else None
    values_np = rng.uniform(-1, 1, (B, n // 2)).astype(np.float32)
    share_np = rng.integers(0, 2 ** 32, (B, 16)).astype(np.uint32)
    err_np = rng.integers(0, 2 ** 32, (B, 16)).astype(np.uint32)
    if gold is not None and pipe in ("fused", "limbwise"):
        G = gold["G"]
        values_np[:G] = gold["v"]
        share_np[:G] = gold["share_words"]
        err_np[:G] = gold["err_words"]
        sk_np = gold["sk_signed"]
    else:
        gold = None
        sk_np = (rng.integers(0, 3, n) - 1).astype(np.int32)
    return (jnp.asarray(values_np), jnp.asarray(sk_np),
            jnp.asarray(share_np), jnp.asarray(err_np)), gold


def run_pipeline(parms, pipe, encode_mode, B, iters, rng, device,
                 dd_too=False):
    """One pipeline config -> result line dict (not yet printed)."""
    import jax.numpy as jnp
    degree, nprimes = parms.degree, parms.nprimes
    per_chip_target = 100_000 / 8  # v5e-8 north star split per chip

    args, gold = _pipeline_inputs(parms, B, rng, encode_mode, pipe)

    if pipe == "fused":
        from seal_embedded_tpu.ckks.fast import make_fused_encryptor
        fn = make_fused_encryptor(parms, encode_mode)
        metric = f"sym_encrypt_n{degree}_p{nprimes}_throughput"
    elif pipe == "limbwise":
        from seal_embedded_tpu.ckks.limbwise import make_limbscan_encryptor
        fn = make_limbscan_encryptor(parms, "reference", encode_mode)
        metric = f"sym_encrypt_n{degree}_p{nprimes}_throughput"
    elif pipe == "asym":
        from seal_embedded_tpu.ckks.asym import (gen_pk_batch,
                                                 make_fused_asym_encryptor)
        values, sk, share, err = args
        gold = _load_golden_asym(parms) if encode_mode in ("sf", "f64") \
            else None
        if gold is not None:
            # rows 0..G-1 carry the C-reference asym vectors: the golden
            # pk (adapter-format, NTT form), values and the deterministic
            # private seed, so the timed computation is verified
            # bit-for-bit on device like the sym rows.
            G = gold["G"]
            pk0 = jnp.asarray(gold["pk0"])
            pk1 = jnp.asarray(gold["pk1"])
            values = values.at[:G].set(jnp.asarray(gold["v"]))
            share = share.at[:G].set(jnp.asarray(gold["seed_words"]))
        else:
            ep = jnp.asarray(rng.integers(-20, 21, degree).astype(np.int32))
            pk0, pk1 = gen_pk_batch(
                sk, jnp.asarray(rng.integers(0, 2 ** 32, (1, 16))
                                .astype(np.uint32)), ep, parms)
        fn = make_fused_asym_encryptor(parms, encode_mode)
        args = (values, pk0, pk1, share)
        metric = f"asym_encrypt_n{degree}_p{nprimes}_throughput"
    else:
        raise SystemExit(f"unknown BENCH_PIPE {pipe!r}")

    avg_s, compile_s, out = _time(fn, args, iters)
    ok = bool(np.asarray(out["ok"]).all())
    assert ok, "sampler queue overflow or encode overflow"
    enc_per_s = B / avg_s

    extra = {
        "batch": B,
        "iters": iters,
        "avg_ms": round(avg_s * 1000, 2),
        "compile_s": round(compile_s, 1),
        "pipe": pipe,
        "encode": encode_mode,
        "device": device,
    }
    if gold is not None:
        extra["verify"] = _check_golden(out, gold, parms)

    if dd_too and pipe == "fused" and encode_mode != "dd":
        from seal_embedded_tpu.ckks.fast import make_fused_encryptor
        fn_dd = make_fused_encryptor(parms, "dd")
        avg_dd, compile_dd, out_dd = _time(fn_dd, args, iters)
        assert bool(np.asarray(out_dd["ok"]).all())
        extra["dd_enc_per_s"] = round(B / avg_dd, 1)
        extra["dd_avg_ms"] = round(avg_dd * 1000, 2)
        extra["dd_compile_s"] = round(compile_dd, 1)

    return {"metric": metric, "value": round(enc_per_s, 1),
            "unit": "enc/s/chip",
            "vs_baseline": round(enc_per_s / per_chip_target, 3),
            "extra": extra}


def main():
    import jax
    import seal_embedded_tpu  # noqa: F401  (x64 + compile cache)
    from seal_embedded_tpu.config import default_parms

    B = int(os.environ.get("BENCH_B", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    degree = int(os.environ.get("BENCH_DEGREE", "4096"))
    nprimes = int(os.environ.get("BENCH_NPRIMES", "3"))
    pipe = os.environ.get("BENCH_PIPE", "fused")
    encode_mode = os.environ.get("BENCH_ENCODE", "sf")
    what = os.environ.get("BENCH_WHAT", "all")

    rng = np.random.default_rng(0)
    device = str(jax.devices()[0])

    if what == "all":
        _all(B, iters, rng, device)
        return
    parms = default_parms(degree, nprimes)
    if what == "bsweep":
        # BASELINE.json configs row 4 ("10k+ batched") artifact: the sf
        # flagship at B = 1024 / 2048 / 4096 / 8192 with per-B HBM
        # high-water, so the batch ceiling is measured, not asserted.
        for Bs in (1024, 2048, 4096, 8192):
            line = run_pipeline(parms, "fused", "sf", Bs,
                                max(3, iters // 2), rng, device)
            try:
                import jax
                stats = jax.local_devices()[0].memory_stats() or {}
                peak = round(stats.get("peak_bytes_in_use", 0) / 2 ** 20)
                if peak:  # the axon tunnel backend reports no stats
                    line["extra"]["hbm_peak_mb"] = peak
            except Exception:
                pass
            print(json.dumps(line), flush=True)
        return
    if what == "verify":
        _verify_only(parms, device)
    elif what == "pipeline":
        line = run_pipeline(parms, pipe, encode_mode, B, iters, rng, device,
                            dd_too=os.environ.get("BENCH_DD_TOO", "1") == "1")
        print(json.dumps(line), flush=True)
    else:
        _component(what, parms, B, iters, rng, device)


def _all(B, iters, rng, device):
    """The full tracked matrix (BASELINE.md): component kernels with
    roofline context, asym + deep-chain pipelines, headline LAST."""
    from seal_embedded_tpu.config import default_parms

    deep = os.environ.get("BENCH_DEEP", "1") == "1"
    p4096 = default_parms(4096, 3)
    matrix = {}

    ceilings = _calibrate(iters, device)
    for k, v in ceilings.items():
        matrix[f"vpu_calib_{k}_vops_per_s"] = round(v / 1e9, 1)

    for what in ("ntt", "keccak", "encode", "sample", "index_map"):
        line = _component(what, p4096, B, iters, rng, device, ceilings)
        matrix[line["metric"]] = line["value"]

    asym = run_pipeline(p4096, "asym", "sf", B, iters, rng, device)
    _emit(**asym)
    matrix[asym["metric"]] = asym["value"]

    if deep:
        # deep chains also at B=1024: smaller batches leave the Keccak
        # squeeze tiles (1024 streams) 50-87% empty.  No dd column here —
        # encode is a tiny slice of deep-chain time (sf 385.6ms vs dd
        # 375.8ms at n=16384) and the dd compile alone costs ~450s cold.
        # Asym deep rows golden-verify on device like every pipeline row
        # (goldens from golden_driver asym 8192 6 / 16384 13).
        for pipe, n, L, Bd in (("fused", 8192, 6, 1024),
                               ("fused", 16384, 13, 1024),
                               ("asym", 8192, 6, 1024),
                               ("asym", 16384, 13, 512)):
            line = run_pipeline(default_parms(n, L), pipe, "sf", Bd,
                                max(3, iters // 2), rng, device,
                                dd_too=False)
            _emit(**line)
            matrix[line["metric"]] = line["value"]

    head = run_pipeline(p4096, "fused", "sf", B, iters, rng, device,
                        dd_too=True)
    head["extra"]["matrix"] = matrix
    _emit(**head)


def _load_golden(parms):
    """Flagship golden vectors (captured from the C reference binary) when
    they match the benched config; None otherwise."""
    import pathlib
    path = (pathlib.Path(__file__).parent / "tests" /
            f"golden_sym_{parms.degree}_{parms.nprimes}.npz")
    if not path.exists():
        return None
    from seal_embedded_tpu.ops import keccak as kc
    data = np.load(path)
    G = sum(1 for k in data.files if k.startswith("v_"))
    n = parms.degree
    sk_packed = bytes(data["sk_packed_0"].tolist())
    sk_signed = np.array(
        [((sk_packed[i // 4] >> (6 - (i % 4) * 2)) & 3) - 1 for i in range(n)],
        dtype=np.int32)

    def seed_bytes(tag):
        return bytes((tag + i) & 0xFF for i in range(64))

    L = parms.nprimes
    return {
        "G": G,
        "v": np.stack([data[f"v_{t}"] for t in range(G)]),
        "share_words": np.tile(kc.seed_to_words(seed_bytes(2)), (G, 1)),
        "err_words": np.tile(kc.seed_to_words(seed_bytes(3)), (G, 1)),
        "sk_signed": sk_signed,
        "c0": [[data[f"c0_{L * t + i}"] for i in range(L)] for t in range(G)],
        "c1": [[data[f"c1_{L * t + i}"] for i in range(L)] for t in range(G)],
    }


def _load_golden_asym(parms):
    """Asymmetric golden vectors (tests/golden_asym_*.npz) when they match
    the benched config; None otherwise."""
    import pathlib
    path = (pathlib.Path(__file__).parent / "tests" /
            f"golden_asym_{parms.degree}_{parms.nprimes}.npz")
    if not path.exists():
        return None
    from seal_embedded_tpu.ops import keccak as kc
    data = np.load(path)
    G = sum(1 for k in data.files if k.startswith("v_"))
    L = parms.nprimes

    def seed_bytes(tag):
        return bytes((tag + i) & 0xFF for i in range(64))

    return {
        "G": G,
        "v": np.stack([data[f"v_{t}"] for t in range(G)]),
        "seed_words": np.tile(kc.seed_to_words(seed_bytes(3)), (G, 1)),
        "pk0": np.stack([data[f"pk0_{i}"] for i in range(L)]),
        "pk1": np.stack([data[f"pk1_{i}"] for i in range(L)]),
        "c0": [[data[f"c0_{L * t + i}"] for i in range(L)] for t in range(G)],
        "c1": [[data[f"c1_{L * t + i}"] for i in range(L)] for t in range(G)],
    }


def _check_golden(out, gold, parms):
    """Bit-compare rows 0..G-1 of a timed batch against the C-reference
    golden ciphertexts.  Raises on mismatch; returns a marker string."""
    c0 = np.asarray(out["c0"])
    c1 = np.asarray(out["c1"])
    for t in range(gold["G"]):
        for i in range(parms.nprimes):
            assert np.array_equal(c0[i, t], gold["c0"][t][i]), \
                f"golden c0 mismatch test {t} prime {i}"
            assert np.array_equal(c1[i, t], gold["c1"][t][i]), \
                f"golden c1 mismatch test {t} prime {i}"
    return f"golden-bitexact-ok({gold['G']}x{parms.nprimes})"


def _verify_only(parms, device):
    """BENCH_WHAT=verify: re-check the golden vectors on this backend with
    the fused sf pipeline and emit a one-line result."""
    import jax.numpy as jnp
    gold = _load_golden(parms)
    if gold is None:
        raise SystemExit(f"no golden vectors for n={parms.degree} "
                         f"L={parms.nprimes}")
    from seal_embedded_tpu.ckks.fast import make_fused_encryptor
    fn = make_fused_encryptor(parms, "sf")
    out = fn(jnp.asarray(gold["v"]), jnp.asarray(gold["sk_signed"]),
             jnp.asarray(gold["share_words"]), jnp.asarray(gold["err_words"]))
    marker = _check_golden(out, gold, parms)
    _emit(f"golden_verify_n{parms.degree}_p{parms.nprimes}", 1.0, "bitexact",
          1.0, {"verify": marker, "device": device})


def _calibrate(iters, device):
    """Measured VPU ceilings for the hot op mixes (ops/kernels/calibrate):
    emits one line per mix and returns {mix: vops_per_s} so component
    rows can carry calibrated (attainable) SOL fractions alongside the
    theoretical ones."""
    from seal_embedded_tpu.ops.kernels.calibrate import ops_per_iter, run_mix
    ceilings = {}
    K = 200_000
    for mix in ("keccak", "ntt"):
        fn = run_mix(mix, K)
        avg_s, compile_s, _ = _time(fn, (), max(iters, 10), reps=3)
        # element-ops/s: the loop issues vector ops on (8,128) tiles
        vops = K * ops_per_iter(mix) * 1024 / avg_s
        ceilings[mix] = vops
        _emit(f"vpu_calib_{mix}_vops_per_s", vops / 1e9, "Gvop/s",
              vops / VPU_OPS_PER_S,
              {"avg_ms": round(avg_s * 1000, 3),
               "compile_s": round(compile_s, 1), "device": device,
               "ops_per_iter": ops_per_iter(mix), "iters": K,
               "note": "sustained source-convention u32 vector ops/s for "
                       "this mix; vs_baseline = fraction of the 4-ops/"
                       "cycle/lane datasheet bound"})
    return ceilings


def _component(what, parms, B, iters, rng, device, ceilings=None):
    """Component benchmarks, mirroring the reference's bench suite
    (device/bench/bench_{ntt,sample,ifft,index_map}.c), each with its
    speed-of-light context where the op count is pinned."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    n = parms.degree
    L = parms.nprimes
    moduli = tuple(int(q) for q in parms.moduli)

    if what == "calibrate":
        _calibrate(iters, device)
        return None

    if what == "ntt":
        from seal_embedded_tpu.ops.kernels.ntt import ntt_coeff_major
        x = jnp.asarray(np.stack(
            [rng.integers(0, q, (n, B)).astype(np.uint32) for q in moduli]))
        fn = jax.jit(partial(ntt_coeff_major, moduli=moduli))
        avg_s, compile_s, _ = _time(fn, (x,), iters, reps=3)
        logn = n.bit_length() - 1
        bflys = L * B * (n // 2) * logn / avg_s
        sol = VPU_OPS_PER_S / NTT_OPS_PER_BFLY
        extra = {"avg_ms": round(avg_s * 1000, 3), "L": L, "B": B,
                 "compile_s": round(compile_s, 1), "device": device,
                 "sol_gbfly_per_s": round(sol / 1e9, 1),
                 "sol_frac": round(bflys / sol, 3)}
        if ceilings and "ntt" in ceilings:
            cal = ceilings["ntt"] / NTT_OPS_PER_BFLY
            extra["sol_calibrated_gbfly_per_s"] = round(cal / 1e9, 1)
            extra["sol_frac_calibrated"] = round(bflys / cal, 3)
        return _emit(f"ntt_n{n}_butterflies_per_s", bflys / 1e9, "Gbfly/s",
                     avg_s * 1000, extra)
    if what == "keccak":
        from seal_embedded_tpu.ops.keccak import shake256_words
        Bk = max(B, 1024)  # full 1024-stream tiles
        share = jnp.asarray(rng.integers(0, 2 ** 32, (Bk, 16))
                            .astype(np.uint32))
        ctr = jnp.zeros((Bk, 2), jnp.uint32)
        nblocks = -(-4 * n // 136)
        fn = jax.jit(partial(shake256_words, nblocks=nblocks))
        avg_s, compile_s, _ = _time(fn, (share, ctr), iters, reps=3)
        perms = Bk * nblocks / avg_s
        # 10.3k vreg-ops per 1024-stream tile-permutation
        sol = VPU_OPS_PER_S / 10.3e3
        extra = {"avg_ms": round(avg_s * 1000, 3), "B": Bk,
                 "nblocks": nblocks, "compile_s": round(compile_s, 1),
                 "device": device,
                 "sol_mperm_per_s": round(sol / 1e6, 1),
                 "sol_frac": round(perms / sol, 3),
                 "note": "sequential 121-block squeeze at one 1024-stream "
                         "tile: latency-bound by the XOF block chain, not "
                         "the parallel-perm roofline"}
        if ceilings and "keccak" in ceilings:
            cal = ceilings["keccak"] / 10.3e3
            extra["sol_calibrated_mperm_per_s"] = round(cal / 1e6, 1)
            extra["sol_frac_calibrated"] = round(perms / cal, 3)
        return _emit("keccakf1600_perms_per_s", perms / 1e6, "Mperm/s",
                     avg_s * 1000, extra)
    if what == "encode":
        from seal_embedded_tpu.ops.encode import encode_any
        values = jnp.asarray(rng.uniform(-1, 1, (B, n // 2))
                             .astype(np.float32))
        mode = os.environ.get("BENCH_ENCODE", "sf")
        fn = jax.jit(partial(encode_any, parms=parms, mode=mode))
        avg_s, compile_s, _ = _time(fn, (values,), iters, reps=3)
        extra = {"avg_ms": round(avg_s * 1000, 3), "B": B,
                 "compile_s": round(compile_s, 1), "device": device}
        if mode != "dd":
            fn_dd = jax.jit(partial(encode_any, parms=parms, mode="dd"))
            avg_dd, _, _ = _time(fn_dd, (values,), iters)
            extra["dd_encode_per_s"] = round(B / avg_dd, 1)
        return _emit(f"encode_{mode}_n{n}_per_s", B / avg_s, "encode/s",
                     avg_s * 1000, extra)
    if what == "sample":
        from seal_embedded_tpu.ops import sampling as sp
        share = jnp.asarray(rng.integers(0, 2 ** 32, (B, 16))
                            .astype(np.uint32))
        ctr = jnp.zeros((B, 2), jnp.uint32)
        fn = jax.jit(partial(sp.sample_uniform, n=n, q=moduli[0]))
        avg_s, compile_s, _ = _time(fn, (share, ctr), iters, reps=3)
        return _emit(
            f"sample_uniform_n{n}_per_s", B / avg_s, "poly/s",
            avg_s * 1000,
            {"avg_ms": round(avg_s * 1000, 3), "B": B,
             "compile_s": round(compile_s, 1), "device": device})
    if what == "index_map":
        # bench_index_map.c analog: time the index-map computation itself
        # (gen-3 orbit merged with bitrev, ckks_common.c:32-68).  Host-side
        # by design — the map is a trace-time constant folded into the
        # placement gather, computed once per degree and cached.
        from seal_embedded_tpu.golden.encode import calc_index_map
        logn = n.bit_length() - 1
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            imap = calc_index_map(n, logn)
        avg_s = (time.time() - t0) / reps
        assert imap.shape == (n,)
        return _emit(
            f"index_map_n{n}_per_s", 1.0 / avg_s, "maps/s", avg_s * 1000,
            {"avg_ms": round(avg_s * 1000, 3), "where": "host",
             "device": device})
    raise SystemExit(f"unknown BENCH_WHAT {what!r}")


if __name__ == "__main__":
    main()
