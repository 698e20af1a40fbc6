"""ctypes binding for the native serialization runtime (native/sealtpu_io.cpp).

Falls back to the pure-Python implementations in io.serialize when the
shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libsealtpu_io.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not built; run `make -C native` (see native/Makefile)")
    lib = ctypes.CDLL(path)
    lib.se_pack_ternary.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
    lib.se_unpack_ternary.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
    lib.se_expand_ternary_modq.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint32, ctypes.c_void_p]
    lib.se_ct_to_bytes.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_void_p]
    lib.se_format_poly.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t]
    lib.se_format_poly.restype = ctypes.c_size_t
    lib.se_parse_poly.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_size_t]
    lib.se_parse_poly.restype = ctypes.c_size_t
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (FileNotFoundError, OSError):
        return False


def pack_ternary_signed(signed_vals: np.ndarray) -> bytes:
    """{-1,0,1} int8 -> 2-bit packed bytes."""
    lib = _load()
    sv = np.ascontiguousarray(signed_vals, dtype=np.int8)
    n = sv.size
    out = np.zeros((n + 3) // 4, dtype=np.uint8)
    lib.se_pack_ternary(sv.ctypes.data, n, out.ctypes.data)
    return out.tobytes()


def unpack_ternary_signed(packed: bytes, n: int) -> np.ndarray:
    lib = _load()
    pk = np.frombuffer(packed, dtype=np.uint8)
    out = np.zeros(n, dtype=np.int8)
    lib.se_unpack_ternary(pk.ctypes.data, n, out.ctypes.data)
    return out


def expand_ternary_modq(packed: bytes, n: int, q: int) -> np.ndarray:
    lib = _load()
    pk = np.frombuffer(packed, dtype=np.uint8)
    out = np.zeros(n, dtype=np.uint32)
    lib.se_expand_ternary_modq(pk.ctypes.data, n, q, out.ctypes.data)
    return out


def ct_to_bytes(components: np.ndarray) -> bytes:
    """(count, n) or (n,) u32 -> LE bytes."""
    lib = _load()
    c = np.ascontiguousarray(np.atleast_2d(components), dtype=np.uint32)
    count, n = c.shape
    out = np.zeros(count * n * 4, dtype=np.uint8)
    lib.se_ct_to_bytes(c.ctypes.data, count, n, out.ctypes.data)
    return out.tobytes()


def format_poly(name: str, vals: np.ndarray) -> str:
    lib = _load()
    v = np.ascontiguousarray(vals, dtype=np.uint32)
    need = lib.se_format_poly(name.encode(), v.ctypes.data, v.size, None, 0)
    buf = ctypes.create_string_buffer(need + 1)
    lib.se_format_poly(name.encode(), v.ctypes.data, v.size, buf, need + 1)
    return buf.value.decode()


def parse_poly(line: str, cap: int = 1 << 20) -> np.ndarray:
    lib = _load()
    out = np.zeros(cap, dtype=np.uint32)
    got = lib.se_parse_poly(line.encode(), out.ctypes.data, cap)
    if got == ctypes.c_size_t(-1).value:
        raise ValueError("not a poly line")
    return out[:got].copy()


# --------------------------------------------------------- streaming senders
#
# The reference streams every RNS component through native code
# (device/lib/network.c curl POST / SEND_FNCT_PTR, seal_embedded.c:180-204).
# These wrap the C++ handles in native/sealtpu_io.cpp: 4-byte LE length
# framing over a file or TCP socket (the same wire format as
# io.network.file_sink / tcp_sender — asserted in tests/test_native_io.py),
# plus a batched per-prime sender that frames and writes a whole (count, n)
# u32 block in one native call.


def _load_stream_syms(lib):
    if getattr(lib, "_stream_syms", False):
        return
    lib.se_stream_open_file.argtypes = [ctypes.c_char_p]
    lib.se_stream_open_file.restype = ctypes.c_int64
    lib.se_stream_open_tcp.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.se_stream_open_tcp.restype = ctypes.c_int64
    lib.se_stream_send.argtypes = [
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_size_t]
    lib.se_stream_send.restype = ctypes.c_int64
    lib.se_stream_send_components.argtypes = [
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t]
    lib.se_stream_send_components.restype = ctypes.c_int64
    lib.se_stream_close.argtypes = [ctypes.c_int64]
    lib.se_stream_close.restype = ctypes.c_int
    lib._stream_syms = True


class NativeStream:
    """A native framed-component stream (file or TCP).

    Usable directly as api.se_encrypt_seeded's ``send=`` callback, and as a
    batched per-prime sender via send_components.
    """

    def __init__(self, handle: int):
        if handle < 0:
            raise OSError("native stream open failed")
        self._h = handle

    @classmethod
    def to_file(cls, path: str) -> "NativeStream":
        lib = _load()
        _load_stream_syms(lib)
        return cls(lib.se_stream_open_file(str(path).encode()))

    @classmethod
    def to_tcp(cls, host: str, port: int) -> "NativeStream":
        lib = _load()
        _load_stream_syms(lib)
        return cls(lib.se_stream_open_tcp(host.encode(), port))

    def __call__(self, data: bytes) -> int:
        lib = _load()
        got = lib.se_stream_send(self._h, data, len(data))
        if got < 0:
            raise OSError("native stream send failed")
        return int(got)

    def send_components(self, components: np.ndarray) -> int:
        """Frame+write a (count, n) u32 block in one native call — the
        reference's per-prime send loop without per-component FFI."""
        lib = _load()
        c = np.ascontiguousarray(np.atleast_2d(components), dtype=np.uint32)
        count, n = c.shape
        got = lib.se_stream_send_components(self._h, c.ctypes.data, count, n)
        if got < 0:
            raise OSError("native stream send failed")
        return int(got)

    def close(self) -> None:
        _load().se_stream_close(self._h)
