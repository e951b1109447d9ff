"""Structured input descriptors.

Rebuild of the reference's input-side structure triggers: Julia dispatches
on `StepRangeLen` (uniform ranges -> Toeplitz, src/gramian.jl:167-189) and
`LazyGrid` (Cartesian products -> Kronecker, src/lazy_grid.jl). Here the
user passes explicit descriptor objects (or raw arrays, which
`detect_uniform_grid` can classify numerically) and the dispatcher
inspects them at construction time.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class UniformGrid:
    """1-D uniform grid: start + step * arange(num). O(1) storage."""

    start: float
    step: float
    num: int

    def points(self):
        return self.start + self.step * jnp.arange(self.num, dtype=jnp.result_type(float))

    def __len__(self):
        return self.num


@dataclasses.dataclass(frozen=True)
class LazyGrid:
    """Lazy Cartesian product of per-dimension 1-D point sets
    (reference src/lazy_grid.jl). axes entries are UniformGrid or 1-D
    arrays; the full point set (column-major like the reference: first
    axis varies fastest... here we use row-major, last axis fastest) is
    never materialized except by `points()`."""

    axes: tuple

    def __len__(self):
        n = 1
        for a in self.axes:
            n *= len(a)
        return n

    @property
    def ndim(self):
        return len(self.axes)

    def axis_points(self, i):
        a = self.axes[i]
        if isinstance(a, UniformGrid):
            return a.points()
        return jnp.asarray(a)

    def points(self):
        """Materialize the (prod n_i, d) point matrix, last axis fastest."""
        pts = [np.asarray(self.axis_points(i)) for i in range(self.ndim)]
        mesh = np.meshgrid(*pts, indexing="ij")
        return jnp.asarray(np.stack([m.ravel() for m in mesh], axis=-1))


def detect_uniform_grid(x, rtol: float = None):
    """Classify a 1-D array as a uniform grid (replaces the reference's
    StepRangeLen type dispatch with an explicit numeric check,
    SURVEY.md §7 stage 4a). Returns a UniformGrid or None.

    The tolerance is dtype-aware (VERDICT r2 weak #6): grid positions
    x[i] = start + i*step held in float32 carry rounding ~eps*|x[i]|, so
    consecutive diffs wobble by ~2*eps*max|x| — an absolute, not
    step-relative, error. A float32 grid must still dispatch Toeplitz."""
    x = np.asarray(x).squeeze()
    if x.ndim != 1 or x.size < 2:
        return None
    d = np.diff(x)
    step = float(np.median(d))
    if step == 0:
        return None
    eps = np.finfo(x.dtype).eps if np.issubdtype(x.dtype, np.floating) else 0.0
    if rtol is None:
        rtol = max(1e-10, 4 * eps)
    atol = 8 * eps * float(np.max(np.abs(x))) + abs(step) * rtol
    if np.all(np.abs(d - step) <= atol):
        return UniformGrid(float(x[0]), float(step), int(x.size))
    return None


def as_points(x):
    """Normalize any input container to an (n, d) point matrix."""
    if isinstance(x, UniformGrid):
        return x.points()[:, None]
    if isinstance(x, LazyGrid):
        return x.points()
    x = jnp.asarray(x)
    if x.ndim == 1:
        return x[:, None]
    return x
