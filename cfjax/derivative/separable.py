"""Separable multi-output kernel: K(x, y) = B * k(x, y).

Rebuild of reference src/separable.jl: the gramian of a SeparableKernel
is gramian(k, x, y) ⊗ B (src/separable.jl:29-42), realized here as a lazy
KroneckerOperator whose scalar factor keeps its own fast path."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..kernels.base import Kernel, MultiKernel


@dataclasses.dataclass(frozen=True)
class SeparableKernel(MultiKernel):
    k: Kernel
    B: object  # (p, p) output covariance

    def block_shape(self, d):
        p = jnp.asarray(self.B).shape[0]
        return (p, p)

    def __call__(self, x, y):
        return jnp.asarray(self.B) * self.k(x, y)

    def gramian(self, x, y=None, **opts):
        from ..operators.dispatch import gramian as scalar_gramian
        from ..operators.kronecker import KroneckerOperator
        from ..operators.linop import DenseOperator

        G = scalar_gramian(self.k, x, y, **opts)
        B = jnp.asarray(self.B)
        Bop = DenseOperator(B, symmetric=True, psd=True)
        return KroneckerOperator((G, Bop))
