"""TileELL: a TPU-native sparse matrix format built around the Mosaic
lane-gather (`take_along_axis(..., axis=1)` lowers to tpu.DynamicGatherOp).

Motivation: the radius-sparsified Gramian (reference src/sparse.jl) has
~0.2% nnz, but XLA lowers arbitrary scalar gathers to ~10 ns/element on
TPU, making a plain ELLPACK MVM orders of magnitude slower than the
kernel's own dense MVM. TileELL restructures the nonzeros so the whole
MVM is three vectorized ops per slab — lane-gather, FMA, axis-sum — with
no scalar gathers and no scatters:

  * the input vector is viewed as a2 = a.reshape(nt, 128)  (tile, lane)
  * a nonzero (i, c, v) is stored at position (block, k, tile, lane) with
      block = sorted-row(i) // 128   (rows sorted by nnz count)
      lane  = sorted-row(i) %  128   <- output row inside the block
      tile  = c // 128, off = c % 128
      k     = collision counter among slots sharing (block, tile, lane)
  * MVM per (block, k) slab:  g = a2[tile, off[tile, lane]]  — ONE
    lane-gather of shape (nt, 128);  out[lane] += sum_t val * g.
    The reduction over rows is a free axis-0 sum because lane == output
    row by construction.

Blocks are grouped by their collision depth K (rows are sorted by nnz
count so heavy blocks are contiguous) and each group runs as one
pallas_call with static K. Padded slots carry val = 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .linop import LinearOperator

_LANES = 128


_BLK8 = 8  # pallas processes 8 row-blocks per grid step


def _build_groups(Kb: np.ndarray, max_groups: int = 6):
    """Partition blocks (sorted by K descending) into contiguous groups,
    each padded to its max K. Greedy split minimizing total padding.
    Bounds are multiples of 8 blocks (pallas sublane granularity)."""
    nb = len(Kb)
    bounds = [0, nb]
    for _ in range(max_groups - 1):
        best = None
        for s in range(len(bounds) - 1):
            lo, hi = bounds[s], bounds[s + 1]
            if hi - lo < 2 * _BLK8:
                continue
            seg = Kb[lo:hi]
            base = seg.max() * len(seg)
            # candidate cuts: where K changes (Kb ~sorted), rounded to 8
            cand = lo + 1 + np.flatnonzero(seg[1:] != seg[:-1])
            cand = np.unique((cand // _BLK8) * _BLK8)
            cand = cand[(cand > lo) & (cand < hi)]
            for cut in cand:
                c = Kb[lo:cut].max() * (cut - lo) + Kb[cut:hi].max() * (hi - cut)
                gain = base - c
                if best is None or gain > best[0]:
                    best = (gain, cut)
        if best is None or best[0] <= 0:
            break
        bounds.append(int(best[1]))
        bounds.sort()
    return bounds


class TileEllOperator(LinearOperator):
    """Sparse operator in TileELL layout. shape (n, m); rows internally
    permuted by nnz count (perm/inv fold into the MVM).

    A full LinearOperator (VERDICT r3 #7): `.solve`, `.T`, `add_diagonal`
    compose, closing the reference's sparsify-then-`\\` workflow."""

    def __init__(self, groups, perm, n, m, nnz, dtype=jnp.float32,
                 symmetric=False):
        # groups: list of (row_start, row_stop, off (B,K,nt,128) int32,
        #                  val (B,K,nt,128) dtype)
        self.groups = groups
        self.perm = jnp.asarray(perm)      # sorted-row -> original row
        self.shape = (n, m)
        self.nt = -(-m // _LANES)
        self.nnz = nnz
        self.dtype = dtype
        self._sym = symmetric and n == m

    @property
    def is_symmetric(self):
        return self._sym

    def _matvec(self, a):
        return tile_ell_matvec(self, a)

    def _matmat(self, A):
        return tile_ell_matvec(self, A)

    def _rmatvec(self, a):
        if self._sym:
            return self._matvec(a)
        return tile_ell_rmatvec(self, a)

    def todense(self):
        n, m = self.shape
        out = np.zeros((n, m), dtype=np.float32)
        for (r0, r1, off, val) in self.groups:
            offn = np.asarray(off)[: (r1 - r0) // _LANES]
            valn = np.asarray(val)[: (r1 - r0) // _LANES]
            B, K, nt, L = offn.shape
            bl, kk, tt, ll = np.meshgrid(
                np.arange(B), np.arange(K), np.arange(nt), np.arange(L),
                indexing="ij")
            rows = np.asarray(self.perm)[r0 + bl * L + ll]
            cols = tt * L + offn
            keep = (valn != 0) & (cols < m)
            np.add.at(out, (rows[keep], cols[keep]), valn[keep])
        return jnp.asarray(out)


def build_tile_ell(rows, cols, vals, n, m, dtype=jnp.float32,
                   max_groups: int = 6):
    """Pack COO (rows, cols, vals) into TileELL (all numpy, vectorized)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    nt = -(-m // _LANES)
    L = _LANES
    nb = -(-n // L)
    nb = -(-nb // _BLK8) * _BLK8  # pallas: 8 row-blocks per grid step
    n_pad = nb * L

    # sort rows by nnz count (desc) so heavy blocks are contiguous
    cnt = np.bincount(rows, minlength=n)
    perm = np.argsort(-cnt, kind="stable").astype(np.int32)  # sorted -> orig
    inv = np.empty(n, np.int32)
    inv[perm] = np.arange(n, dtype=np.int32)
    perm_full = np.concatenate([perm, np.arange(n, n_pad, dtype=np.int32)]) \
        if n_pad > n else perm

    r = inv[rows]
    b = r // L
    lane = r % L
    t = cols // L
    o = (cols % L).astype(np.int32)

    # collision index k within (b, t, lane)
    order = np.lexsort((o, lane, t, b))
    bb, tt, ll, oo, vv = b[order], t[order], lane[order], o[order], vals[order]
    new = np.r_[True, (bb[1:] != bb[:-1]) | (tt[1:] != tt[:-1]) | (ll[1:] != ll[:-1])]
    pos = np.arange(len(order))
    k = pos - np.maximum.accumulate(np.where(new, pos, 0))

    Kb = np.zeros(nb, np.int64)
    np.maximum.at(Kb, bb, k + 1)
    Kb = np.maximum(Kb, 1)

    bounds = _build_groups(Kb, max_groups)
    groups = []
    nnz = len(rows)
    for g in range(len(bounds) - 1):
        b0, b1 = bounds[g], bounds[g + 1]
        B = b1 - b0
        K = int(Kb[b0:b1].max())
        sel = (bb >= b0) & (bb < b1)
        off = np.zeros((B, K, nt, L), np.int32)
        val = np.zeros((B, K, nt, L), np.float32)
        off[bb[sel] - b0, k[sel], tt[sel], ll[sel]] = oo[sel]
        val[bb[sel] - b0, k[sel], tt[sel], ll[sel]] = vv[sel]
        groups.append((b0 * L, b1 * L, jnp.asarray(off),
                       jnp.asarray(val, dtype=dtype)))
    return TileEllOperator(groups, perm_full, n, m, nnz, dtype)


_K_QUANTA = np.array([1, 2, 4, 8, 16, 32, 64, 128])


def _quantize_K(Kb):
    """Round collision depths up to a power-of-two menu so executable
    shapes recur across DATASETS, not just within one build: K is
    data-dependent (max run length of equal column tiles), and every
    distinct (B, K) pair costs a tunnel compile of both the pack scatter
    and the MVM slab kernel — measured at ~7 s per 'warm' build with the
    finer 14-value menu (the pack math itself is 0.2 ms)."""
    idx = np.searchsorted(_K_QUANTA, Kb)
    return _K_QUANTA[np.minimum(idx, len(_K_QUANTA) - 1)]


def _run_index(t, valid, w):
    """Position of each slot within its run of equal tiles (cols sorted
    per row). Pad slots get unique pseudo-tiles so they never form runs.
    Vectorized via cummax — searchsorted lowers to serial gathers on TPU."""
    idx = jnp.arange(w, dtype=jnp.int32)
    tt = jnp.where(valid, t, -(idx[None, :] + 1))
    new = jnp.concatenate(
        [jnp.ones_like(tt[:, :1], dtype=bool), tt[:, 1:] != tt[:, :-1]], axis=1)
    start = jnp.where(new, idx[None, :], 0)
    return idx[None, :] - jax.lax.cummax(start, axis=1)


@partial(jax.jit, static_argnames=("w",))
def _run_kmax(cols, m, w):
    """Per-row max run length of equal column tiles (cols sorted per row,
    pad = col >= m). Determines collision depth K."""
    valid = cols < m
    k = _run_index(cols // _LANES, valid, w)
    return jnp.max(jnp.where(valid, k, 0), axis=1) + 1


@partial(jax.jit, static_argnames=("B", "K", "nt", "w"))
def _pack_group(cols, vals, rows_sel, m, B, K, nt, w):
    """Scatter ELL rows (device arrays) into a (B, K, nt, 128) TileELL
    group. rows_sel: (B*128,) global row ids, -1 = padding row."""
    L = _LANES
    valid_row = rows_sel >= 0
    rs = jnp.maximum(rows_sel, 0)
    c = cols[rs]                      # (B*L, w)
    v = vals[rs]
    t = c // L
    o = (c % L).astype(jnp.int32)
    kk = _run_index(t, c < m, w)
    lane = (jnp.arange(B * L) % L)[:, None]
    b_local = (jnp.arange(B * L) // L)[:, None]
    pad = (c >= m) | (~valid_row)[:, None] | (kk >= K)
    size = B * K * nt * L
    flat = ((b_local * K + kk) * nt + t) * L + lane
    # pad slots -> out-of-bounds, dropped by the scatter; every IN-bounds
    # index is unique by construction (b, k, t, lane) — declaring that
    # lets XLA run the scatter in parallel instead of serializing
    flat = jnp.where(pad, size, flat).ravel()
    off = jnp.zeros(size, jnp.int32).at[flat].set(
        o.ravel(), mode="drop", unique_indices=True)
    val = jnp.zeros(size, vals.dtype).at[flat].set(
        jnp.where(pad, 0, v).ravel(), mode="drop", unique_indices=True)
    return (off.reshape(B, K, nt, L), val.reshape(B, K, nt, L))


def build_tile_ell_from_sorted(buckets, perm, nnz, n, m, max_groups: int = 4,
                               symmetric=False):
    """Device-side TileELL packing from COUNT-SORTED, width-TIERED ELL
    buckets. `buckets`: list of (lo, cols, vals, R) where rows
    lo..lo+R-1 of the count-sorted row order carry the first R rows of
    cols (Rpad, w_b) int32 sorted per row (pad = m) and vals (Rpad, w_b);
    rows past R are shape padding. Bucket boundaries (lo and lo+R rounded
    up) are multiples of 1024 rows (= 8 pallas row-blocks). `perm`: (n,)
    sorted -> original row.

    This replaces the single global-width ELL intermediate: one dense row
    inflated the shared width ~40x (VERDICT r3 #2 — a 50 s build), and
    every packing pass (run-index cummax, scatter) scaled with that
    padding. Tiered widths keep total slot work O(sum_b R_b * w_b) ~ nnz.
    Group block-counts are menu-quantized (shape padding, cropped at
    matvec time) so warm builds on new data reuse compiled executables."""
    from .sparse_op import _menu_roundup

    L = _LANES
    nt = -(-m // L)
    nb = -(-n // L)
    nb = -(-nb // _BLK8) * _BLK8
    n_pad = nb * L

    perm_full = np.concatenate(
        [np.asarray(perm, np.int32), np.full(n_pad - n, -1, np.int32)])

    groups = []
    for lo, cols_b, vals_b, R in buckets:
        Rpad, w = cols_b.shape
        hi = min(lo + -(-R // (L * _BLK8)) * (L * _BLK8), n_pad)
        kmax = np.asarray(_run_kmax(cols_b, m, w)).astype(np.int64)[:R]
        kmax = np.concatenate([kmax, np.ones(hi - lo - R, np.int64)])
        Kb = _quantize_K(kmax.reshape(-1, L).max(axis=1))
        bounds = _build_groups(Kb, max_groups)
        local_rows = np.arange(hi - lo, dtype=np.int32)
        local_rows[R:] = -1
        # rows past n in the sorted order are pure padding
        local_rows[np.nonzero(perm_full[lo:hi] < 0)[0]] = -1
        for g in range(len(bounds) - 1):
            b0, b1 = bounds[g], bounds[g + 1]
            B = b1 - b0
            Bq = _menu_roundup(B, lo=_BLK8)
            Bq = max(_BLK8, -(-Bq // _BLK8) * _BLK8)
            K = int(Kb[b0:b1].max())
            sel = np.full(Bq * L, -1, np.int32)
            sel[: B * L] = local_rows[b0 * L:b1 * L]
            off, val = _pack_group(cols_b, vals_b, jnp.asarray(sel), m,
                                   Bq, K, nt, w)
            groups.append((lo + b0 * L, lo + b1 * L, off, val))

    out_perm = np.where(perm_full < 0, n_pad - 1 if n == n_pad else n,
                        perm_full)
    return TileEllOperator(groups, out_perm, n, m, nnz, symmetric=symmetric)


def build_tile_ell_device(cols, vals, counts, n, m, max_groups: int = 6,
                          symmetric=False):
    """Device-side TileELL packing from padded ELL arrays (cols (n,w)
    sorted per row with pad=m, vals (n,w)). Avoids transferring the ELL
    arrays to the host (the tunnel D2H path runs at ~17 MB/s); only the
    O(n) counts/run-lengths cross to the host to pick static shapes."""
    w = cols.shape[1]
    L = _LANES
    nt = -(-m // L)
    nb = -(-n // L)
    nb = -(-nb // _BLK8) * _BLK8
    n_pad = nb * L

    counts = np.asarray(counts)
    kmax = np.asarray(_run_kmax(cols, m, w))       # (n,) small transfer
    perm = np.argsort(-counts, kind="stable").astype(np.int32)
    perm_full = np.concatenate([perm, np.full(n_pad - n, -1, np.int32)])

    kmax_sorted = np.concatenate([kmax[perm], np.ones(n_pad - n, np.int64)])
    Kb = _quantize_K(kmax_sorted.reshape(nb, L).max(axis=1))
    bounds = _build_groups(Kb, max_groups)

    groups = []
    for g in range(len(bounds) - 1):
        b0, b1 = bounds[g], bounds[g + 1]
        B = b1 - b0
        K = int(Kb[b0:b1].max())
        rows_sel = jnp.asarray(perm_full[b0 * L:b1 * L])
        off, val = _pack_group(cols, vals, rows_sel, m, B, K, nt, w)
        groups.append((b0 * L, b1 * L, off, val))

    out_perm = np.where(perm_full < 0, n_pad - 1 if n == n_pad else n,
                        perm_full)
    # pad rows scatter into index n (cropped) — safe when n < n_pad;
    # when n == n_pad there are no pad rows.
    return TileEllOperator(groups, out_perm, n, m, int(counts.sum()),
                           symmetric=symmetric)


def _slab_matvec_xla(a2, off, val):
    """Reference/fallback slab MVM: works on any backend.
    off, val: (B, K, nt, 128); a2: (nt, 128) -> (B, 128)."""
    g = jnp.take_along_axis(
        a2[None, None], off, axis=3)  # (B, K, nt, 128)
    return jnp.sum(val * g, axis=(1, 2))


def _slab_matvec_pallas(a2, off, val):
    """off/val: (B, K, nt, 128) with B % 8 == 0. Grid (B/8, K): per step,
    one lane-gather per row-block (8 of them), FMA, axis-sum; accumulates
    over the k grid axis into the resident (8, 128) output block."""
    from jax.experimental import pallas as pl

    B, K, nt, L = off.shape
    assert B % _BLK8 == 0

    def kern(a_ref, o_ref, v_ref, out_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        a2t = a_ref[:]
        acc = [None] * _BLK8
        for j in range(_BLK8):
            g = jnp.take_along_axis(a2t, o_ref[j, 0], axis=1)
            acc[j] = jnp.sum(v_ref[j, 0] * g, axis=0)
        out_ref[:] += jnp.stack(acc)

    return pl.pallas_call(
        kern,
        grid=(B // _BLK8, K),
        in_specs=[
            pl.BlockSpec((nt, L), lambda i, k: (0, 0)),
            pl.BlockSpec((_BLK8, 1, nt, L), lambda i, k: (i, k, 0, 0)),
            pl.BlockSpec((_BLK8, 1, nt, L), lambda i, k: (i, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((_BLK8, L), lambda i, k: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.float32),
    )(a2, off, val)


@partial(jax.jit, static_argnames=("nt", "use_pallas", "crops"))
def _tile_ell_matvec_impl(groups_off, groups_val, perm, a, nt, use_pallas,
                          crops=None):
    m = a.shape[0]
    a2 = jnp.pad(a, (0, nt * _LANES - m)).reshape(nt, _LANES)
    outs = []
    for gi, (off, val) in enumerate(zip(groups_off, groups_val)):
        # nt == 1: Mosaic's gather lowering rejects take_along_axis on a
        # (1, 128) operand ("Shape mismatch in input, indices and
        # output") — route single-column-tile operators through XLA.
        slab = _slab_matvec_pallas if (use_pallas and nt > 1) \
            else _slab_matvec_xla
        o = slab(a2, off, val)
        if crops is not None:  # menu-quantized groups: crop shape padding
            o = o[: crops[gi] // _LANES]
        outs.append(o.reshape(-1))
    out_sorted = jnp.concatenate(outs)
    n_pad = perm.shape[0]
    out = jnp.zeros((n_pad,), out_sorted.dtype)
    out = out.at[perm].set(out_sorted[: n_pad])
    return out


@partial(jax.jit, static_argnames=("nt", "n", "m", "crops"))
def _tile_ell_rmatvec_impl(groups_off, groups_val, perm, starts, a, nt, n, m,
                           crops=None):
    """Transpose MVM: scatter val * a[row] into the column tiles. Used
    only on non-symmetric operators (CGNR least-squares path)."""
    L = _LANES
    n_pad = perm.shape[0]
    ap = jnp.zeros((n_pad + 1,), a.dtype).at[:n_pad].set(
        jnp.where(perm < n, a[jnp.minimum(perm, n - 1)], 0.0))
    out2 = jnp.zeros((nt, L), a.dtype)
    tidx = jnp.arange(nt)
    for gi, ((off, val), r0) in enumerate(zip(zip(groups_off, groups_val),
                                              starts)):
        if crops is not None:  # crop menu-quantized shape padding
            off = off[: crops[gi] // L]
            val = val[: crops[gi] // L]
        B, K, ntg, _ = off.shape
        rows = r0 + (jnp.arange(B * L)).reshape(B, L)
        av = val * ap[rows][:, None, None, :]          # (B,K,nt,L)
        t4 = jnp.broadcast_to(tidx[None, None, :, None], off.shape)
        out2 = out2.at[t4, off].add(av)
    return out2.reshape(-1)[:m]


def tile_ell_rmatvec(S: TileEllOperator, a):
    groups_off = tuple(g[2] for g in S.groups)
    groups_val = tuple(g[3] for g in S.groups)
    starts = tuple(g[0] for g in S.groups)
    crops = tuple(g[1] - g[0] for g in S.groups)
    return _tile_ell_rmatvec_impl(groups_off, groups_val, S.perm, starts,
                                  a, S.nt, S.shape[0], S.shape[1], crops)


def tile_ell_matvec(S: TileEllOperator, a):
    use_pallas = jax.default_backend() in ("tpu", "axon")
    groups_off = tuple(g[2] for g in S.groups)
    groups_val = tuple(g[3] for g in S.groups)
    crops = tuple(g[1] - g[0] for g in S.groups)
    if a.ndim == 2:
        # matrix RHS: vmap columns through the XLA slab path (vmapping
        # the pallas lane-gather adds a batch axis Mosaic won't tile).
        f = lambda col: _tile_ell_matvec_impl(
            groups_off, groups_val, S.perm, col, S.nt, False, crops)
        return jax.vmap(f, in_axes=1, out_axes=1)(a)[: S.shape[0]]
    out = _tile_ell_matvec_impl(groups_off, groups_val, S.perm, a, S.nt,
                                use_pallas, crops)
    return out[: S.shape[0]]
