"""Dispatch for matrix-valued (multi-output) kernel gramians.

Placeholder wired from operators.dispatch; filled in by the derivative
kernel layer (gradient/hessian/separable)."""

from __future__ import annotations


def gramian_multikernel(k, x, y=None, **opts):
    from .gradient import GradientKernel, ValueGradientKernel
    from .hessian import HessianKernel, ValueGradientHessianKernel
    from .separable import SeparableKernel

    if isinstance(k, SeparableKernel):
        return k.gramian(x, y, **opts)
    if isinstance(k, (GradientKernel, ValueGradientKernel)):
        return k.gramian(x, y, **opts)
    if isinstance(k, (HessianKernel, ValueGradientHessianKernel)):
        return k.gramian(x, y, **opts)
    raise NotImplementedError(f"no gramian plan for {type(k).__name__}")
