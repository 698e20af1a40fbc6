"""Native serialization runtime (native/sealtpu_io.cpp via io.native):
must agree byte-for-byte with the pure-Python io.serialize reference."""

import subprocess
import pathlib

import numpy as np
import pytest

from seal_embedded_tpu.io import native, serialize

REPO = pathlib.Path(__file__).parent.parent


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        subprocess.run(["make", "-C", str(REPO / "native")], check=True)
        native._LIB = None
    assert native.available()


def test_pack_unpack_ternary_matches_python():
    rng = np.random.default_rng(0)
    signed = (rng.integers(0, 3, 4096) - 1).astype(np.int8)
    packed = native.pack_ternary_signed(signed)
    # Python reference: map -1/0/1 -> 0/1/2, 4 coeffs/byte MSB-first
    # (adapter/fileops.cpp:70-73).
    want = serialize.pack_ternary([int(v) + 1 for v in signed])
    assert packed == want
    back = native.unpack_ternary_signed(packed, 4096)
    assert np.array_equal(back.astype(np.int32), signed.astype(np.int32))


def test_expand_ternary_modq_matches_python():
    rng = np.random.default_rng(1)
    signed = (rng.integers(0, 3, 1024) - 1).astype(np.int8)
    packed = native.pack_ternary_signed(signed)
    q = 1053818881
    got = native.expand_ternary_modq(packed, 1024, q)
    want = np.where(signed < 0, np.int64(q - 1),
                    signed.astype(np.int64)).astype(np.uint32)
    assert np.array_equal(got, want)


def test_ct_to_bytes_matches_python():
    rng = np.random.default_rng(2)
    c = rng.integers(0, 2 ** 30, (3, 256)).astype(np.uint32)
    got = native.ct_to_bytes(c)
    want = b"".join(serialize.ct_component_bytes(row) for row in c)
    assert got == want


def test_format_parse_poly_roundtrip_matches_python():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 2 ** 30, 64).astype(np.uint32)
    line = native.format_poly("c0 (t0 p0)", vals)
    pyline = serialize.format_poly("c0 (t0 p0)", vals)
    assert line.strip() == pyline.strip()
    back = native.parse_poly(line)
    assert np.array_equal(back, vals)
