"""Host-side conversions between Python ints and 16-bit limb arrays.

The TPU representation: uint32 arrays of shape (..., L) holding 16-bit limbs
little-endian (L=16 for Fr/256b, L=24 for Fq/384b). 16-bit limbs make every
limb product exact in uint32 and keep column sums far below 2^32 — the TPU
counterpart of the reference's 32-bit-limb CUDA `mont_t` (`mont_t.cuh:31`).
"""

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, L: int) -> np.ndarray:
    out = np.zeros(L, dtype=np.uint32)
    for i in range(L):
        out[i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def ints_to_limbs(xs, L: int) -> np.ndarray:
    """Vectorized int-list -> (n, L) uint32."""
    n = len(xs)
    out = np.zeros((n, L), dtype=np.uint32)
    for i in range(L):
        shift = LIMB_BITS * i
        out[:, i] = np.fromiter(((x >> shift) & LIMB_MASK for x in xs),
                                dtype=np.uint32, count=n)
    return out


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(limbs))


def limbs_to_ints(arr) -> list:
    arr = np.asarray(arr)
    assert arr.ndim == 2
    out = [0] * arr.shape[0]
    for i in range(arr.shape[1]):
        shift = LIMB_BITS * i
        col = arr[:, i].astype(object)
        for k in range(arr.shape[0]):
            out[k] += int(col[k]) << shift
    return out
