# coding: utf-8
"""Degree-bucketed ELL SpMM — the TPU answer to the very-sparse regime.

The reference's hot op is ``torch.sparse.mm`` (layers.py:43-45); at
Facebook/Enron scale (N≈60-87k, 128²-block fill ~0.03%) neither the dense
[K, N, N] mirror nor the Pallas BSR bank is affordable, and XLA's
gather + ``segment_sum`` lowering of padded COO is scatter-bound
(measured 79.5 M edges/s on v5e).  A Pallas streaming-gather kernel is
not an option either: Mosaic's dynamic-gather lowering rejects
cross-sublane row gathers (probed on-chip 2026-08 — ``jnp.take`` fails
with "Shape mismatch in input, indices and output" and
``take_along_axis`` crashes the Mosaic backend), so there is no kernel-
level fusion path for the gather.

What the hardware *does* run fast is dense work, so the scatter is
removed instead of accelerated (SELL-C-σ in TPU clothes):

  * rows are sorted by degree and grouped into power-of-two width
    buckets; each bucket is a dense [nb, K] column/value table (padding
    slots have val 0 → contribute 0);
  * SpMM per bucket = vectorized gather + multiply + DENSE row-sum —
    no scatter primitive at all;
  * bucket outputs are concatenated (degree-sorted order) and routed
    back with one [N]-permutation gather.

Measured on v5e at Facebook scale (N=61440, deg 10, d=128):
segment 79.5 M edges/s → ELL f32 136.9 M (exact numerics) → ELL bf16
173.9 M (relerr ~2e-3).  Padded-slot overhead for power-law graphs is
bounded by 2x (power-of-two widths) and is ~1.2-1.4x in practice.

Differentiable in x via a transpose plan (dx = A^T @ g); the adjacency
is a constant, so no dA path is needed.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EllBucket:
    cols: jnp.ndarray   # int32[nb, K] source columns (0 on padding)
    vals: jnp.ndarray   # f32[nb, K]   edge values    (0 on padding)


@struct.dataclass
class EllPlan:
    """Host-built degree-bucketed table for one sparse matrix [R, C]."""

    buckets: tuple      # tuple[EllBucket, ...] in ascending width order
    inv_perm: jnp.ndarray   # int32[R]: row r's position in the concat output
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)

    @property
    def padded_nnz(self):
        return sum(int(b.cols.shape[0] * b.cols.shape[1])
                   for b in self.buckets)


def _row_widths(csr, min_width):
    """Power-of-two bucket width per row; zero-degree rows get width 0 (a
    gather-free all-zeros bucket).  The flattened [K·N, N] core-pyramid
    matrices are MOSTLY empty rows (a core slot touches n_k << N nodes);
    padding those to min_width cost 8·K·N pure-padding gather slots —
    more than the real nnz at Facebook scale."""
    deg = np.diff(csr.indptr)
    w = np.maximum(min_width,
                   2 ** np.ceil(np.log2(np.maximum(deg, 1))).astype(int))
    return np.where(deg == 0, 0, w)


def _build_buckets(csr, width, spec, compact=False):
    """Pack rows into the given ``spec`` = [(K, nb_alloc), ...] (ascending
    K; nb_alloc >= rows of that width).  Returns (buckets, inv_perm).

    ``compact`` ships the tables in the narrowest exact dtypes — int16
    columns when the source fits, uint8 values when every edge weight is
    0/1 (gathers accept any int dtype; values upcast on device at use).
    The host↔device link is the binding constraint for window setup at
    AS scale (~0.3-2 MB/s through the relay), not HBM."""
    R = csr.shape[0]
    col_dt = np.int16 if (compact and csr.shape[1] < (1 << 15)) else np.int32
    val_dt = (np.uint8 if (compact and csr.data.size
                           and np.isin(csr.data, (0.0, 1.0)).all())
              else np.float32)
    order = np.argsort(width, kind="stable")     # degree-sorted rows
    by_width = {}
    pos = 0
    while pos < R:
        K = int(width[order[pos]])
        end = pos
        while end < R and width[order[end]] == K:
            end += 1
        by_width[K] = order[pos:end]
        pos = end

    buckets = []
    inv_perm = np.empty(R, np.int64)
    offset = 0
    indptr = csr.indptr.astype(np.int64)
    for K, nb_alloc in spec:
        rows = by_width.get(K, np.zeros(0, np.int64))
        assert len(rows) <= nb_alloc, (K, len(rows), nb_alloc)
        cols_a = np.zeros((nb_alloc, K), col_dt)
        vals_a = np.zeros((nb_alloc, K), val_dt)
        if len(rows):
            # vectorized CSR-row packing (a python per-row loop is minutes
            # at Facebook scale)
            lens = indptr[rows + 1] - indptr[rows]
            ends = np.cumsum(lens)
            seg = np.arange(int(ends[-1])) - np.repeat(ends - lens, lens)
            src = np.repeat(indptr[rows], lens) + seg
            dst = np.repeat(np.arange(len(rows)) * K, lens) + seg
            cols_a.reshape(-1)[dst] = csr.indices[src]
            vals_a.reshape(-1)[dst] = csr.data[src]
        inv_perm[rows] = offset + np.arange(len(rows))
        # numpy leaves: the callers stack across T host-side and ship each
        # stacked leaf ONCE — per-snapshot jnp.asarray turned window setup
        # into hundreds of relay round trips at AS scale
        buckets.append(EllBucket(cols=cols_a, vals=vals_a))
        offset += nb_alloc
    return tuple(buckets), inv_perm


def build_ell_plan(mat, min_width=8, compact=False) -> EllPlan:
    """scipy sparse [R, C] → EllPlan.  Zero-degree rows land in the
    narrowest bucket with all-zero values."""
    csr = mat.tocsr()
    csr.sum_duplicates()
    R, C = csr.shape
    width = _row_widths(csr, min_width)
    widths = sorted(set(int(w) for w in width))
    spec = [(w, int(np.sum(width == w))) for w in widths]
    buckets, inv_perm = _build_buckets(csr, width, spec, compact=compact)
    return EllPlan(buckets=jax.tree.map(jnp.asarray, buckets),
                   inv_perm=jnp.asarray(inv_perm.astype(np.int32)),
                   n_rows=R, n_cols=C)


def build_ell_plans(mat, min_width=8):
    """(fwd, transpose) pair for the custom VJP."""
    return (build_ell_plan(mat, min_width),
            build_ell_plan(mat.T.tocsr(), min_width))


#: live-element budget for one bucket's gathered [nb, K, d] expansion.  XLA
#: materializes the gather product before the row-sum, so an unchunked wide
#: layer blows HBM at reference-benchmark scale (Facebook window, d=500:
#: 18.9M padded edges x 500 floats = 36 GB on a 16 GB v5e).  256M elements
#: = 1 GB f32 live per chunk.
_ELL_CHUNK_ELEMS = int(os.environ.get("CTGCN_TPU_ELL_CHUNK_ELEMS", 256 << 20))


def _bucket_apply(cols, vals, xs):
    nb, K = cols.shape
    d = xs.shape[1]
    if K == 0:  # zero-degree rows: no gather, exact zeros
        return jnp.zeros((nb, d), jnp.float32)
    if nb * K * d <= _ELL_CHUNK_ELEMS:
        g = xs[cols] * vals[:, :, None]              # [nb, K, d]
        return jnp.sum(g.astype(jnp.float32), axis=1)
    chunk = max(8, (_ELL_CHUNK_ELEMS // (K * d)) // 8 * 8)
    nchunks = -(-nb // chunk)
    pad = nchunks * chunk - nb                       # pad rows gather col 0
    cols_p = jnp.pad(cols, ((0, pad), (0, 0)))       # with val 0 → zero out
    vals_p = jnp.pad(vals, ((0, pad), (0, 0)))

    def one(args):
        c, v = args
        g = xs[c] * v[:, :, None]
        return jnp.sum(g.astype(jnp.float32), axis=1)

    out = jax.lax.map(one, (cols_p.reshape(nchunks, chunk, K),
                            vals_p.reshape(nchunks, chunk, K)))
    return out.reshape(nchunks * chunk, d)[:nb]


def _ell_apply(plan: EllPlan, x, bf16):
    xs = x.astype(jnp.bfloat16) if bf16 else x
    outs = []
    for b in plan.buckets:
        outs.append(_bucket_apply(b.cols, b.vals.astype(xs.dtype), xs))
    cat = jnp.concatenate(outs, axis=0)              # degree-sorted rows
    return jnp.take(cat, plan.inv_perm, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ell_spmm(fwd_plan: EllPlan, t_plan: EllPlan, x, bf16=False):
    """A @ x ([R, C] @ [C, d]); differentiable in x (dx = A^T @ g)."""
    return _ell_apply(fwd_plan, x, bf16)


def _fwd(fwd_plan, t_plan, x, bf16):
    return _ell_apply(fwd_plan, x, bf16), t_plan


def _bwd(bf16, t_plan, g):
    return None, None, _ell_apply(t_plan, g, bf16)


ell_spmm.defvjp(_fwd, _bwd)


def _stack_plans(plans):
    """Per-t plans with IDENTICAL bucket specs → one plan whose leaves
    carry a leading [T] axis (vmap-able over t).  Numpy-leaf plans stack
    host-side and ship once per stacked leaf (ONE relay transfer each
    instead of one per snapshot per bucket)."""
    def stk(xs):
        if isinstance(xs[0], np.ndarray):
            return jnp.asarray(np.stack(xs))
        return jnp.stack(xs)

    buckets = tuple(
        EllBucket(cols=stk([p.buckets[i].cols for p in plans]),
                  vals=stk([p.buckets[i].vals for p in plans]))
        for i in range(len(plans[0].buckets)))
    return EllPlan(buckets=buckets,
                   inv_perm=stk([np.asarray(p.inv_perm) for p in plans]),
                   n_rows=plans[0].n_rows, n_cols=plans[0].n_cols)


def _soft_bucket(n):
    """Quarter-power-of-two rounding (…, 8, 10, 12, 14, 16, 20, 24, …).

    Window plans built with EXACT per-window bucket row counts give nearly
    every window of a 100-snapshot run a fresh set of table shapes — each
    retraces and recompiles the whole jitted train step (~30-60 s through
    the relay).  Rounding counts to 1/4-pow2 steps collapses the shape set
    to a handful for ≤12.5% padded-slot overhead (measured +14% plan
    slots / ~+15% SpMM pass time on the N=61k single-window profile —
    the multi-window compile amortization is worth far more in product
    runs).  ``CTGCN_TPU_ELL_EXACT_BUCKETS=1`` restores exact counts for
    single-window benchmarks, where no cross-window shape reuse exists."""
    if os.environ.get("CTGCN_TPU_ELL_EXACT_BUCKETS") == "1":
        return int(n)
    if n <= 8:
        return 8 if n > 0 else 0
    step = max(8, 1 << (int(n - 1).bit_length() - 3))
    return -(-int(n) // step) * step


def _build_uniform(csrs, min_width, compact=False):
    """One plan per csr with a UNIFIED bucket spec, stacked on [T]."""
    widths = [_row_widths(c, min_width) for c in csrs]
    all_w = sorted({int(w) for ws in widths for w in ws})
    spec = [(w, _soft_bucket(max(int(np.sum(ws == w)) for ws in widths)))
            for w in all_w]
    plans = []
    for csr, w in zip(csrs, widths):
        buckets, inv_perm = _build_buckets(csr, w, spec, compact=compact)
        plans.append(EllPlan(buckets=buckets,
                             inv_perm=inv_perm.astype(np.int32),
                             n_rows=csr.shape[0], n_cols=csr.shape[1]))
    return _stack_plans(plans)


@struct.dataclass
class EllEvBucket:
    cols: jnp.ndarray   # int32[nb, K] source columns (0 on padding)
    eids: jnp.ndarray   # int32[nb, K] edge slot ids into the flat arrays
    mask: jnp.ndarray   # f32[nb, K]   1 on real edges, 0 on padding


@struct.dataclass
class EllEvPlan:
    """ELL plan with DYNAMIC edge values (attention-style SpMM).

    Bucket tables carry edge ids instead of baked values; each call
    gathers the current per-edge values (``vals[eids] * mask``), so the
    scatter-free formulation also serves GAT's softmax-weighted
    aggregation (reference gat.py:86-96) where values change every step.
    """

    buckets: tuple
    inv_perm: jnp.ndarray
    flat_rows: jnp.ndarray   # int32[P] (the SparseGraph padded COO rows)
    flat_cols: jnp.ndarray   # int32[P]
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)


def build_ell_ev_plan(rows, cols, nnz_mask, n_rows, n_cols,
                      min_width=8, spec=None) -> EllEvPlan:
    """Host build from padded COO (rows[P], cols[P], nnz_mask[P])."""
    import scipy.sparse as sp

    rows = np.asarray(rows).astype(np.int64)
    cols = np.asarray(cols).astype(np.int64)
    # eid+1 survives the float32 bucket packing exactly below 2^24
    assert rows.shape[0] < (1 << 24), "edge capacity exceeds f32-exact ids"
    nnz_mask = np.asarray(nnz_mask)
    eids = np.arange(rows.shape[0], dtype=np.int64)
    r, c, e = rows[nnz_mask], cols[nnz_mask], eids[nnz_mask]
    # CSR of (eid + 1) reuses sorted-row packing; 0 = padding sentinel
    csr = sp.coo_matrix((e + 1, (r, c)), shape=(n_rows, n_cols)).tocsr()
    width = _row_widths(csr, min_width)
    if spec is None:
        widths = sorted(set(int(w) for w in width))
        spec = [(w, int(np.sum(width == w))) for w in widths]
    buckets, inv_perm = _build_buckets(csr, width, spec)
    ev_buckets = tuple(
        EllEvBucket(
            cols=jnp.asarray(b.cols),
            eids=jnp.asarray(
                np.maximum(np.asarray(b.vals).astype(np.int64) - 1, 0)
                .astype(np.int32)),
            mask=jnp.asarray(
                (np.asarray(b.vals) != 0).astype(np.float32)))
        for b in buckets)
    return EllEvPlan(buckets=ev_buckets,
                     inv_perm=jnp.asarray(inv_perm.astype(np.int32)),
                     flat_rows=jnp.asarray(rows.astype(np.int32)),
                     flat_cols=jnp.asarray(cols.astype(np.int32)),
                     n_rows=n_rows, n_cols=n_cols)


def build_ell_ev_plans(rows, cols, nnz_mask, n_rows, n_cols, min_width=8):
    """(fwd, transpose) pair; both index the SAME flat edge array."""
    return (build_ell_ev_plan(rows, cols, nnz_mask, n_rows, n_cols,
                              min_width),
            build_ell_ev_plan(cols, rows, nnz_mask, n_cols, n_rows,
                              min_width))


def build_window_ell_ev_plans(rows, cols, nnz_masks, n_rows, n_cols,
                              min_width=8):
    """[T, P] padded COO window → stacked (fwd, t) EllEvPlans whose leaves
    carry a leading [T] axis (unified bucket spec across t, like
    ``build_pyramid_ell_plans``)."""
    import scipy.sparse as sp

    T = rows.shape[0]

    def union_spec(rc_list):
        widths = []
        for r, c, m in rc_list:
            csr = sp.coo_matrix(
                (np.ones(int(m.sum())), (np.asarray(r)[m], np.asarray(c)[m])),
                shape=(n_rows, n_cols)).tocsr()
            widths.append(_row_widths(csr, min_width))
        all_w = sorted({int(w) for ws in widths for w in ws})
        return [(w, _soft_bucket(max(int(np.sum(ws == w)) for ws in widths)))
                for w in all_w]

    fwd_list = [(rows[t], cols[t], np.asarray(nnz_masks[t]))
                for t in range(T)]
    t_list = [(cols[t], rows[t], np.asarray(nnz_masks[t]))
              for t in range(T)]

    def build(rc_list, nr, nc):
        spec = union_spec(rc_list)
        plans = [build_ell_ev_plan(r, c, m, nr, nc, min_width, spec=spec)
                 for r, c, m in rc_list]
        buckets = tuple(
            EllEvBucket(
                cols=jnp.stack([p.buckets[i].cols for p in plans]),
                eids=jnp.stack([p.buckets[i].eids for p in plans]),
                mask=jnp.stack([p.buckets[i].mask for p in plans]))
            for i in range(len(plans[0].buckets)))
        return EllEvPlan(
            buckets=buckets,
            inv_perm=jnp.stack([p.inv_perm for p in plans]),
            flat_rows=jnp.stack([p.flat_rows for p in plans]),
            flat_cols=jnp.stack([p.flat_cols for p in plans]),
            n_rows=nr, n_cols=nc)

    return (build(fwd_list, n_rows, n_cols), build(t_list, n_cols, n_rows))


def _ell_ev_apply(plan: EllEvPlan, vals, x):
    outs = []
    for b in plan.buckets:
        if b.cols.shape[1] == 0:
            outs.append(jnp.zeros((b.cols.shape[0], x.shape[1]), x.dtype))
            continue
        v = vals[b.eids] * b.mask                    # [nb, K]
        g = x[b.cols] * v[:, :, None]                # [nb, K, d]
        outs.append(jnp.sum(g, axis=1))
    cat = jnp.concatenate(outs, axis=0)
    return jnp.take(cat, plan.inv_perm, axis=0)


@jax.custom_vjp
def ell_spmm_ev(fwd_plan: EllEvPlan, t_plan: EllEvPlan, vals, x):
    """A(vals) @ x; differentiable in vals AND x (the ELL answer to
    ``spmm_ev``).  dvals is a flat SDDMM (gather-only); dx = A^T @ g."""
    return _ell_ev_apply(fwd_plan, vals, x)


def _ev_fwd(fwd_plan, t_plan, vals, x):
    return _ell_ev_apply(fwd_plan, vals, x), (fwd_plan, t_plan, vals, x)


def _ev_bwd(res, g):
    fwd_plan, t_plan, vals, x = res
    dx = _ell_ev_apply(t_plan, vals, g)[: x.shape[0]]
    # dvals_e = g[row_e] . x[col_e] — no scatter; padding cotangents are
    # harmless (the caller's nnz mask zeroes them downstream)
    dvals = jnp.sum(g[fwd_plan.flat_rows] * x[fwd_plan.flat_cols], axis=-1)
    return None, None, dvals, dx


ell_spmm_ev.defvjp(_ev_fwd, _ev_bwd)


def build_pyramid_ell_plans(stacked_rows, stacked_cols, stacked_vals,
                            valid, n_nodes, min_width=8, delta=False):
    """Core-pyramid [T, K, P] COO slots → stacked per-t ELL plan pair.

    Each snapshot's K slots flatten to one block-diagonal [K·N, N] matrix
    (exactly like the segment fallback flattens them); per-t plans share a
    unified bucket spec (union of widths, max bucket rows — padding rows
    contribute zeros and are never selected by inv_perm), so the stacked
    leaves carry a leading [T] axis and ``jax.vmap`` runs the whole window.
    Invalid (delta-skip) slots contribute zero rows.  Returns
    (fwd [T, K·N, N], transpose [T, N, K·N]) stacked plans.

    ``delta=True`` exploits k-core nesting for an exact traffic cut: slot
    supports nest max-core-first (A_0 ⊆ A_1 ⊆ … over kept slots) and carry
    the ORIGINAL edge weights (preprocessing/kcore.py:83-88 induces raw
    subgraphs, no per-slot normalization), so slot k's product decomposes
    as A_k @ x = Σ_{j≤k} Δ_j @ x with Δ_0 = A_0 (minus the baked +I) and
    Δ_j = A_j − A_{j-1} edge-disjoint.  The plan then gathers each edge
    ONCE (at its first/deepest slot) instead of once per containing slot —
    total gather traffic drops from Σ_k nnz(A_k) to nnz(A_full), the slot
    multiplicity factor (~4-8× at AS/Facebook skew).  CoreDiffusion
    reconstructs every per-slot prefix with a tiny K×K triangular matmul
    and re-adds the identity as "+ x" (see nn/core_models.py).  Requires
    validity to be a prefix mask (build_core_pyramid compacts kept slots,
    so it always is).
    """
    import scipy.sparse as sp

    T, K, P = stacked_rows.shape
    rows = np.asarray(stacked_rows).astype(np.int64)
    cols = np.asarray(stacked_cols).astype(np.int64)
    vals = np.asarray(stacked_vals).astype(np.float64)
    valid = np.asarray(valid)
    val_mask = (vals != 0) & valid[:, :, None]
    off = (np.arange(K) * n_nodes).reshape(K, 1)
    fwd_csrs, t_csrs = [], []
    for t in range(T):
        if delta:
            n_kept = int(valid[t].sum())
            assert valid[t, :n_kept].all(), "delta plans need prefix validity"
            prev = None
            parts_r, parts_c, parts_v = [], [], []
            for k in range(n_kept):
                m = val_mask[t, k]
                cur = sp.coo_matrix(
                    (vals[t, k][m], (rows[t, k][m], cols[t, k][m])),
                    shape=(n_nodes, n_nodes)).tocsr()
                if k == 0:
                    # bank slot 0 carries the reference's +I
                    # (helper.py:71-73); the delta path re-adds it as "+ x"
                    cur = cur - sp.eye(n_nodes, format="csr")
                    cur.eliminate_zeros()
                    d = cur
                else:
                    d = cur - prev
                    d.eliminate_zeros()
                prev = cur
                dcoo = d.tocoo()
                parts_r.append(dcoo.row + k * n_nodes)
                parts_c.append(dcoo.col)
                parts_v.append(dcoo.data)
            flat_r = np.concatenate(parts_r) if parts_r else np.zeros(0, np.int64)
            flat_c = np.concatenate(parts_c) if parts_c else np.zeros(0, np.int64)
            flat_v = np.concatenate(parts_v) if parts_v else np.zeros(0)
        else:
            m = val_mask[t]
            flat_r = (rows[t] + off)[m]
            flat_c = cols[t][m]
            flat_v = vals[t][m]
        mat = sp.coo_matrix((flat_v, (flat_r, flat_c)),
                            shape=(K * n_nodes, n_nodes)).tocsr()
        fwd_csrs.append(mat)
        t_csrs.append(mat.T.tocsr())
    return (_build_uniform(fwd_csrs, min_width, compact=True),
            _build_uniform(t_csrs, min_width, compact=True))
