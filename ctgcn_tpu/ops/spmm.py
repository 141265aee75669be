# coding: utf-8
"""Sparse matmul (SpMM) and sampled dense-dense matmul (SDDMM).

These replace the reference's native sparse surface — ``torch.sparse.mm`` /
``torch.spmm`` (cuSPARSE; reference layers.py:43-45, baseline/gcn.py:38) and
the hand-rolled ``SpecialSpmmFunction`` autograd op for GAT (reference
baseline/gat.py:13-39).

Backends:
  * ``segment``: gather + ``jax.ops.segment_sum`` — differentiable via native
    autodiff transpose rules, runs on CPU and TPU, the default.
  * ``pallas``: row-tiled Pallas TPU kernel (ctgcn_tpu.ops.pallas_spmm) for
    the hot training path; selected automatically on TPU when profitable.

SpMM here is HBM-bandwidth-bound at CTGCN's graph densities; the segment
formulation already streams nnz·d elements, the Pallas kernel removes the
scatter bottleneck by accumulating each row tile in VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ctgcn_tpu.ops.sparse import SparseGraph

_DEFAULT_BACKEND = "segment"


def set_default_backend(name: str):
    global _DEFAULT_BACKEND
    assert name in ("segment", "pallas", "dense")
    _DEFAULT_BACKEND = name


def spmm(g: SparseGraph, x: jnp.ndarray, backend: str | None = None) -> jnp.ndarray:
    """Compute ``A @ x`` for padded-COO ``g`` ([N, M]) and dense ``x`` ([M, d]).

    Padding slots have val == 0 and contribute nothing.
    """
    if backend is None and g.ell_fwd is not None:
        from ctgcn_tpu.ops.ell import ell_spmm

        return ell_spmm(g.ell_fwd, g.ell_t, x)
    backend = backend or _DEFAULT_BACKEND
    if backend == "segment":
        return _spmm_segment(g, x)
    if backend == "pallas":
        from ctgcn_tpu.ops.pallas_spmm import spmm_pallas

        return spmm_pallas(g, x)
    if backend == "dense":
        from ctgcn_tpu.ops.sparse import to_dense

        return to_dense(g) @ x
    raise ValueError(f"unknown spmm backend {backend!r}")


def _spmm_segment(g: SparseGraph, x: jnp.ndarray) -> jnp.ndarray:
    gathered = x[g.cols] * g.vals[:, None]
    return jax.ops.segment_sum(
        gathered, g.rows, num_segments=g.n_rows, indices_are_sorted=True
    )


def spmm_t(g: SparseGraph, x: jnp.ndarray) -> jnp.ndarray:
    """Compute ``A.T @ x`` without materializing the transpose sort."""
    if g.ell_t is not None:
        from ctgcn_tpu.ops.ell import ell_spmm

        return ell_spmm(g.ell_t, g.ell_fwd, x)
    gathered = x[g.rows] * g.vals[:, None]
    return jax.ops.segment_sum(gathered, g.cols, num_segments=g.n_cols)


def sddmm(g: SparseGraph, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sampled dense-dense matmul: per-edge ``<a[row], b[col]>``.

    Returns float[P] scores aligned with ``g``'s edge slots (padding slots
    produce garbage values; mask with ``g.nnz_mask()`` if needed).  This is the
    building block of GAT edge attention (reference baseline/gat.py:86-96) and
    of the SpMM backward w.r.t. edge values.
    """
    return jnp.sum(a[g.rows] * b[g.cols], axis=-1)


def spmm_ev(rows, cols, vals, x, n_rows):
    """SpMM with explicit edge values (differentiable w.r.t. vals AND x).

    Used by attention-style layers (GAT) where ``vals`` are computed, not
    data.  Native autodiff produces the correct transposes: d(vals) is an
    SDDMM of the cotangent with x, d(x) is A.T @ cotangent.
    """
    gathered = x[cols] * vals[:, None]
    return jax.ops.segment_sum(gathered, rows, num_segments=n_rows)
