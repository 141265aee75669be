# coding: utf-8
"""Static-shape sparse graph containers.

The reference keeps graphs as scipy COO matrices converted to
``torch.sparse.FloatTensor`` (reference utils.py:89-95) with a different nnz
per snapshot.  Under XLA everything inside ``jit`` is traced once with static
shapes, so here a graph is a padded COO pytree: ``rows``/``cols``/``vals``
arrays of a fixed bucket size, with padding entries carrying ``val == 0`` and
pointing at node 0 (a zero-valued edge contributes nothing to SpMM, so no
explicit mask is needed on the compute path).

Edges are sorted by (row, col) at construction, which lets scatter-based SpMM
pass ``indices_are_sorted=True`` and lets the Pallas kernel tile rows.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from ctgcn_tpu.utils import pad_bucket


@struct.dataclass
class SparseGraph:
    """Padded COO sparse matrix as a JAX pytree.

    Attributes:
      rows: int32[P] row index per edge (padding rows point at 0).
      cols: int32[P] column index per edge.
      vals: float32[P] edge weight (0 for padding slots).
      n_rows: static number of rows.
      n_cols: static number of columns.
    """

    rows: jnp.ndarray
    cols: jnp.ndarray
    vals: jnp.ndarray
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    # Optional degree-bucketed ELL plans (ops/ell.EllPlan) — the
    # scatter-free SpMM backend for large very-sparse graphs (5.6x over
    # gather+segment_sum on v5e at Facebook scale).  ``spmm``/``spmm_t``
    # prefer these when present; values are baked into the plan, so only
    # fixed-value adjacencies qualify (GAT's per-step attention values go
    # through spmm_ev instead).
    ell_fwd: object | None = None
    ell_t: object | None = None
    # Dynamic-value variant (ops/ell.EllEvPlan pair) for attention-style
    # layers whose edge values are computed per step (GAT).
    ell_ev_fwd: object | None = None
    ell_ev_t: object | None = None

    @property
    def capacity(self) -> int:
        return int(self.rows.shape[0])

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    def nnz_mask(self) -> jnp.ndarray:
        return self.vals != 0

    def transpose(self) -> "SparseGraph":
        """Swap rows/cols (padding/sort order is preserved only as a valid COO,
        not row-sorted; fine for segment-based SpMM with sorted=False)."""
        return SparseGraph(rows=self.cols, cols=self.rows, vals=self.vals,
                           n_rows=self.n_cols, n_cols=self.n_rows)


def from_coo(rows, cols, vals, shape, pad_to=None, min_capacity=256):
    """Build a SparseGraph from host COO arrays, sorted by (row, col), padded.

    Args:
      pad_to: exact capacity (use to make snapshots stackable); when None the
        capacity is the power-of-two bucket ≥ nnz.
    """
    rows = np.asarray(rows, dtype=np.int32)
    cols = np.asarray(cols, dtype=np.int32)
    vals = np.asarray(vals, dtype=np.float32)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    nnz = rows.shape[0]
    cap = int(pad_to) if pad_to is not None else pad_bucket(nnz, min_capacity)
    if cap < nnz:
        raise ValueError(f"pad_to={cap} < nnz={nnz}")
    pr = np.zeros(cap, dtype=np.int32)
    pc = np.zeros(cap, dtype=np.int32)
    pv = np.zeros(cap, dtype=np.float32)
    pr[:nnz], pc[:nnz], pv[:nnz] = rows, cols, vals
    return SparseGraph(rows=jnp.asarray(pr), cols=jnp.asarray(pc),
                       vals=jnp.asarray(pv), n_rows=int(shape[0]),
                       n_cols=int(shape[1]))


def from_scipy(mat, pad_to=None, min_capacity=256):
    """Build from any scipy sparse matrix (densified nowhere)."""
    coo = mat.tocoo()
    # drop explicit zeros so padding semantics stay exact
    keep = coo.data != 0
    return from_coo(coo.row[keep], coo.col[keep], coo.data[keep], coo.shape,
                    pad_to=pad_to, min_capacity=min_capacity)


def to_scipy(g: SparseGraph):
    import scipy.sparse as sp

    rows = np.asarray(g.rows)
    cols = np.asarray(g.cols)
    vals = np.asarray(g.vals)
    keep = vals != 0
    return sp.coo_matrix((vals[keep], (rows[keep], cols[keep])), shape=g.shape)


def to_dense(g: SparseGraph) -> jnp.ndarray:
    """Densify on device (testing / small graphs only)."""
    out = jnp.zeros(g.shape, dtype=g.vals.dtype)
    return out.at[g.rows, g.cols].add(g.vals)


def eye(n, pad_to=None) -> SparseGraph:
    idx = np.arange(n, dtype=np.int32)
    return from_coo(idx, idx, np.ones(n, np.float32), (n, n), pad_to=pad_to)


# ---------------------------------------------------------------------------
# Host-side normalization (data prep; numerics match reference utils.py:65-85)
# ---------------------------------------------------------------------------

def normalize_scipy_adj(adj, row_norm=False):
    """D^-1 A (row_norm) or D^-1/2 A D^-1/2; zero-degree rows stay zero.

    Parity with reference utils.py:65-85 (``get_normalized_adj``).
    """
    import scipy.sparse as sp

    adj = adj.tocsr()
    rowsum = np.asarray(adj.sum(axis=1)).flatten()
    p = -1.0 if row_norm else -0.5
    with np.errstate(divide="ignore"):
        r_inv = np.power(rowsum, p)
    r_inv[~np.isfinite(r_inv)] = 0.0
    r_mat_inv = sp.diags(r_inv)
    adj = r_mat_inv.dot(adj)
    if not row_norm:
        adj = adj.dot(r_mat_inv)
    return adj.tocoo()
