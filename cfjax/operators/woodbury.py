"""Woodbury (low-rank correction) operator: A + U C V.

Rebuild of the reference's WoodburyFactorizations.jl capability (gradient
kernel blocks, src/gradient.jl:95-105, and gradient-algebra corrections,
src/gradient_algebra.jl:47-89): explicit (A, U, C, V) with fused MVM and
Woodbury-identity solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linop import DiagonalOperator, LinearOperator


class WoodburyOperator(LinearOperator):
    def __init__(self, A: LinearOperator, U, C, V=None, symmetric=None):
        self.A = A if isinstance(A, LinearOperator) else DiagonalOperator(jnp.asarray(A))
        self.U = jnp.asarray(U)
        self.C = jnp.asarray(C)
        self.V = self.U.T if V is None else jnp.asarray(V)
        self.shape = self.A.shape
        self.dtype = self.U.dtype
        self._sym = (V is None) if symmetric is None else symmetric

    @property
    def is_symmetric(self):
        return self._sym and self.A.is_symmetric

    @property
    def rank(self):
        return self.U.shape[1]

    def _matvec(self, v):
        return self.A._matvec(v) + self.U @ (self.C @ (self.V @ v))

    def _matmat(self, Vm):
        return self.A._matmat(Vm) + self.U @ (self.C @ (self.V @ Vm))

    def todense(self):
        return self.A.todense() + self.U @ self.C @ self.V

    def diagonal(self):
        n = self.shape[0]
        return self.A.diagonal() + jnp.sum((self.U @ self.C) * self.V.T[:n], axis=1)

    def solve(self, b, **kw):
        """Woodbury identity: requires A and C invertible (A typically
        diagonal for the gradient blocks)."""
        Ainv_b = self.A.solve(b)
        Ainv_U = self.A.solve(self.U)
        Cinv = jnp.linalg.inv(self.C)
        S = Cinv + self.V @ Ainv_U  # r x r capacitance
        t = jnp.linalg.solve(S, self.V @ Ainv_b)
        return Ainv_b - Ainv_U @ t
