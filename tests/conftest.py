"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count), mirroring the strategy in SURVEY.md
S4.7.  Real-TPU runs happen in bench.py / __graft_entry__.py only.
"""

import os

# Force, don't setdefault: the shell environment pre-sets JAX_PLATFORMS to
# the real accelerator platform, and running the suite through it would put
# every test (compiles + transfers) on the device tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import seal_embedded_tpu  # noqa: F401  (enables x64 + persistent compile cache)
import jax

# A sitecustomize may have imported jax before this file ran, freezing the
# env-var defaults (JAX_PLATFORMS) into jax.config at import time; override
# the config values directly too.  Backends must not be initialized yet.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.devices()
assert len(jax.devices()) >= 8, jax.devices()

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent


@pytest.fixture(scope="session")
def golden_sym():
    """Bit-exact vectors captured from the C reference binary
    (golden/golden_driver.c; seeds tag1=sk, tag2=share, tag3=err)."""
    data = np.load(GOLDEN_DIR / "golden_sym_4096_3.npz")
    ntests = sum(1 for k in data.files if k.startswith("v_"))
    tests = []
    for t in range(ntests):
        tests.append({
            "v": data[f"v_{t}"],
            "pt": data[f"pt_{t}"],
            "pte": data[f"pte_{t}"],
            "c0": [data[f"c0_{3 * t + i}"] for i in range(3)],
            "c1": [data[f"c1_{3 * t + i}"] for i in range(3)],
        })
    return {"sk_packed": bytes(data["sk_packed_0"].tolist()), "tests": tests}


def seed_bytes(tag: int) -> bytes:
    return bytes((tag + i) & 0xFF for i in range(64))
