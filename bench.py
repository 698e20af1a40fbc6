"""Benchmark: batched CKKS symmetric encode+encrypt throughput on real TPU.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.md): 100,000 bit-exact n=4096 sym
encryptions/sec on a v5e-8 => per-chip target 12,500 enc/s.

Timing uses amortized back-to-back dispatch with a scalar fetch barrier
(block_until_ready is not a reliable fence on the axon tunnel platform).

Config via env: BENCH_B (batch), BENCH_ITERS, BENCH_DEGREE, BENCH_NPRIMES,
BENCH_LAYOUT (reference|parallel).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import seal_embedded_tpu  # noqa: F401  (x64 + compile cache)
    from seal_embedded_tpu.ckks.limbwise import make_limbscan_encryptor
    from seal_embedded_tpu.config import default_parms

    B = int(os.environ.get("BENCH_B", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    degree = int(os.environ.get("BENCH_DEGREE", "4096"))
    nprimes = int(os.environ.get("BENCH_NPRIMES", "3"))
    layout = os.environ.get("BENCH_LAYOUT", "reference")

    parms = default_parms(degree, nprimes)
    n = parms.degree
    rng = np.random.default_rng(0)
    values = jnp.asarray(rng.uniform(-1, 1, (B, n // 2)).astype(np.float32))
    sk = jnp.asarray((rng.integers(0, 3, n) - 1).astype(np.int32))
    share = jnp.asarray(rng.integers(0, 2 ** 32, (B, 16)).astype(np.uint32))
    err = jnp.asarray(rng.integers(0, 2 ** 32, (B, 16)).astype(np.uint32))

    fn = make_limbscan_encryptor(parms, layout)

    t0 = time.time()
    out = fn(values, sk, share, err)
    ok = bool(np.asarray(out["ok"]).all())  # fetch = hard sync
    compile_s = time.time() - t0
    assert ok, "sampler queue overflow or encode overflow"

    t0 = time.time()
    for _ in range(iters):
        out = fn(values, sk, share, err)
    # Fetch a real output slice so every queued step must finish.
    _ = np.asarray(out["c0"])[0, 0, :8]
    total = time.time() - t0
    enc_per_s = B * iters / total

    per_chip_target = 100_000 / 8  # v5e-8 north star split per chip
    print(json.dumps({
        "metric": f"sym_encrypt_n{degree}_p{nprimes}_throughput",
        "value": round(enc_per_s, 1),
        "unit": "enc/s/chip",
        "vs_baseline": round(enc_per_s / per_chip_target, 3),
        "extra": {
            "batch": B,
            "iters": iters,
            "avg_ms": round(total / iters * 1000, 2),
            "compile_s": round(compile_s, 1),
            "layout": layout,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
