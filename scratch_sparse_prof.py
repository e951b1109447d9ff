"""Where does the n=16384 d=32 sparsify build spend its 5.7 s? (scratch)"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cfjax_tpu_cache")

from cfjax.kernels import EQ
from cfjax.operators.sparse_op import (_ell_build, _ell_counts,
                                        _tree_candidates, decay_radius,
                                        sparse_gramian)
from cfjax.utils.timing import force_sync_dispatch

force_sync_dispatch()
rng = np.random.default_rng(0)
n, d = 16384, 32
x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
k = EQ()
tol = 1e-6

# warm everything once
S, ratio = sparse_gramian(k, x, tol=tol)
print("nnz ratio", ratio, flush=True)

t0 = time.perf_counter()
S, ratio = sparse_gramian(k, x, tol=tol)
print(f"warm total: {time.perf_counter()-t0:.2f} s", flush=True)

r = decay_radius(k, tol)
r2 = r * r
block = 2048
nb = -(-n // block)
xpad = jnp.pad(x, ((0, nb * block - n), (0, 0)), constant_values=1e15)

t0 = time.perf_counter()
cd = _tree_candidates(x, x, True, r, None)
print(f"tree_candidates (None={cd is None}): {time.perf_counter()-t0:.2f} s",
      flush=True)

t0 = time.perf_counter()
counts = np.asarray(_ell_counts(xpad.reshape(nb, block, -1), x, r2)).reshape(-1)[:n]
print(f"counts pass: {time.perf_counter()-t0:.2f} s", flush=True)
width = max(8, -(-int(counts.max()) // 8) * 8)
print("width:", width, flush=True)

t0 = time.perf_counter()
cols, vals = _ell_build(k, xpad.reshape(nb, block, -1), x, r2, width)
jax.block_until_ready(vals)
print(f"build pass: {time.perf_counter()-t0:.2f} s", flush=True)

from cfjax.operators.tile_ell import build_tile_ell_device
cols2 = cols.reshape(nb * block, width)[:n]
vals2 = vals.reshape(nb * block, width)[:n]
t0 = time.perf_counter()
T = build_tile_ell_device(cols2, vals2, jnp.asarray(counts), n, n)
jax.block_until_ready(T.groups[0][2] if T.groups else vals2)
print(f"tile pack: {time.perf_counter()-t0:.2f} s", flush=True)
