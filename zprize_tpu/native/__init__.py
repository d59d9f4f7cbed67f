"""Native host-runtime helpers (C, loaded via ctypes; built on first use).

The reference's host runtime is C++ (mini-Caffe, blst, msm-collect). In the
TPU design XLA owns scheduling and residency, so the native layer is small:
the order-sensitive plookup `combine_split` bucketing. Falls back to the
pure-Python implementation if the toolchain is unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhostops.so")
_SRC = os.path.join(_DIR, "hostops.c")

_lib = None


def _build():
    subprocess.check_call(
        ["gcc", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC])


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.combine_split.restype = ctypes.c_int
    lib.combine_split.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_char_p]
    _lib = lib
    return lib


def combine_split_bytes(t_bytes: bytes, f_bytes: bytes, n: int):
    """Native combine_split over 32-byte LE rows. Returns (h1, h2) byte
    buffers or raises ValueError if f ⊄ t."""
    lib = get_lib()
    h1 = ctypes.create_string_buffer(n * 32)
    h2 = ctypes.create_string_buffer(n * 32)
    rc = lib.combine_split(t_bytes, f_bytes, n, h1, h2)
    if rc != 0:
        raise ValueError(f"combine_split failed rc={rc}")
    return h1.raw, h2.raw


def combine_split_ints(t_ints, f_ints):
    """Int-list convenience wrapper (oracle-compatible with
    ref.prover.combine_split)."""
    n = len(t_ints)
    tb = b"".join(x.to_bytes(32, "little") for x in t_ints)
    fb = b"".join(x.to_bytes(32, "little") for x in f_ints)
    h1, h2 = combine_split_bytes(tb, fb, n)
    return ([int.from_bytes(h1[i * 32:(i + 1) * 32], "little")
             for i in range(n)],
            [int.from_bytes(h2[i * 32:(i + 1) * 32], "little")
             for i in range(n)])
