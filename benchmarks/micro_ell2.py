"""Micro-benchmark round 2: tile-gather ELLPACK MVM variants.

Scalar gathers waste TPU (8,128) vreg granularity; these variants gather
contiguous 128-wide tiles of `a` (full lane lines) and select within the
tile, plus a column-tile block-sparse variant where the per-row nonzeros
are grouped by the 128-column tile they fall in.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cfjax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n, m, w = 16384, 16384, 64
T = 128  # column tile width
rng = np.random.default_rng(0)
cols_np = np.sort(rng.integers(0, m, size=(n, w)), axis=1).astype(np.int32)
cols = jnp.asarray(cols_np)
vals = jnp.asarray(rng.standard_normal((n, w)), dtype=jnp.float32)
a = jnp.asarray(rng.standard_normal(m), dtype=jnp.float32)


def timeit(f, *args, iters=10):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


@jax.jit
def v_current(cols, vals, a):
    ap = jnp.concatenate([a, jnp.zeros((1,), a.dtype)])
    return jnp.sum(vals * ap[cols], axis=1)


@jax.jit
def v_tile128(cols, vals, a):
    a2 = jnp.concatenate([a, jnp.zeros((T,), a.dtype)])[: (m // T + 1) * T]
    a2 = a2.reshape(-1, T)
    t = cols // T
    o = cols % T
    tiles = a2[t]                              # (n, w, T) — row gathers of lane lines
    sel = jax.nn.one_hot(o, T, dtype=a.dtype)  # (n, w, T)
    return jnp.sum(vals * jnp.sum(tiles * sel, -1), axis=1)


@jax.jit
def v_tile128_takealong(cols, vals, a):
    a2 = jnp.concatenate([a, jnp.zeros((T,), a.dtype)])[: (m // T + 1) * T]
    a2 = a2.reshape(-1, T)
    t = cols // T
    o = cols % T
    tiles = a2[t]                              # (n, w, T)
    g = jnp.take_along_axis(tiles, o[..., None], axis=-1)[..., 0]
    return jnp.sum(vals * g, axis=1)


# Block-ELL: per row, unique column tiles (precomputed on host) with dense
# (row, tile) value slabs. Gathers are (tiles_per_row) lane lines per row;
# FMA is dense.
tpr_list = [np.unique(cols_np[i] // T) for i in range(n)]
TW = max(len(u) for u in tpr_list)
TW = -(-TW // 4) * 4
tile_idx = np.full((n, TW), m // T, dtype=np.int32)  # pad tile -> zeros
slab = np.zeros((n, TW, T), dtype=np.float32)
vals_np = np.asarray(vals)
for i in range(n):
    u = tpr_list[i]
    tile_idx[i, : len(u)] = u
    pos = np.searchsorted(u, cols_np[i] // T)
    slab[i, pos, cols_np[i] % T] += vals_np[i]
tile_idx_j = jnp.asarray(tile_idx)
slab_j = jnp.asarray(slab)
print(f"block-ELL tiles/row max {TW} mem {slab.nbytes/1e6:.0f} MB", flush=True)


@jax.jit
def v_blockell(tile_idx, slab, a):
    a2 = jnp.concatenate([a, jnp.zeros((T,), a.dtype)])[: (m // T + 1) * T]
    a2 = a2.reshape(-1, T)
    tiles = a2[tile_idx]            # (n, TW, T)
    return jnp.einsum("ntc,ntc->n", slab, tiles)


ref = np.asarray(v_current(cols, vals, a))
for name, f, args in [
    ("current", v_current, (cols, vals, a)),
    ("tile128_onehot", v_tile128, (cols, vals, a)),
    ("tile128_takealong", v_tile128_takealong, (cols, vals, a)),
    ("blockell", v_blockell, (tile_idx_j, slab_j, a)),
]:
    try:
        ms = timeit(f, *args)
        ok = np.allclose(np.asarray(f(*args)), ref, atol=1e-2)
        print(f"{name:20s} {ms:9.3f} ms   ok={ok}", flush=True)
    except Exception as e:
        print(f"{name:20s} FAILED: {type(e).__name__}: {e}", flush=True)
