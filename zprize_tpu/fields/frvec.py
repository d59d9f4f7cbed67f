"""FV — a thin operator wrapper over (L, …) limbs-leading Montgomery Fr
tensors so protocol formulas read like the scalar spec
(`protocol/widgets.py`) while compiling to vectorized limb ops."""

import jax.numpy as jnp

from . import mont
from .mont import FR, U32


class FV:
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    # -- constructors --
    @staticmethod
    def const(x: int):
        return FV(jnp.asarray(FR.scalar_mont(x)))

    @staticmethod
    def zeros(shape):
        return FV(jnp.zeros((FR.L,) + tuple(shape), dtype=U32))

    @staticmethod
    def one():
        return FV(jnp.asarray(FR.one_mont, dtype=U32))

    # -- arithmetic --
    def __add__(self, o):
        return FV(mont.add(FR, self.v, o.v))

    def __sub__(self, o):
        return FV(mont.sub(FR, self.v, o.v))

    def __mul__(self, o):
        return FV(mont.mont_mul(FR, self.v, o.v))

    def __neg__(self):
        return FV(mont.neg(FR, self.v))

    def sqr(self):
        return FV(mont.mont_sqr(FR, self.v))

    def pow5(self):
        s2 = mont.mont_sqr(FR, self.v)
        s4 = mont.mont_sqr(FR, s2)
        return FV(mont.mont_mul(FR, s4, self.v))

    def scale(self, k: int):
        """multiply by a small integer constant"""
        return self * FV.const(k)

    # -- structure (batch axes are v.shape[1:]) --
    def __getitem__(self, idx):
        return FV(self.v[:, idx])

    def roll(self, k):
        return FV(jnp.roll(self.v, -k, axis=1))

    @property
    def shape(self):
        return self.v.shape[1:]
