# coding: utf-8
"""Kernel-level parity tests: SpMM / SDDMM / sparse containers vs dense numpy."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from ctgcn_tpu.ops import sparse as sparse_mod
from ctgcn_tpu.ops.sparse import SparseGraph, from_scipy, to_dense, eye
from ctgcn_tpu.ops.spmm import spmm, spmm_t, sddmm, spmm_ev


def test_from_scipy_roundtrip(toy_adj):
    g = from_scipy(toy_adj)
    back = sparse_mod.to_scipy(g)
    np.testing.assert_allclose(back.toarray(), toy_adj.toarray(), rtol=1e-6)
    assert g.capacity >= toy_adj.nnz
    # padding entries carry zero values
    assert int((np.asarray(g.vals) != 0).sum()) == toy_adj.nnz


def test_spmm_matches_dense(toy_adj, toy_features):
    g = from_scipy(toy_adj)
    expected = toy_adj.toarray() @ toy_features
    got = spmm(g, jnp.asarray(toy_features))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)
    got_dense = spmm(g, jnp.asarray(toy_features), backend="dense")
    np.testing.assert_allclose(np.asarray(got_dense), expected, rtol=1e-5,
                               atol=1e-5)


def test_spmm_t_matches_dense(toy_adj, toy_features):
    g = from_scipy(toy_adj)
    expected = toy_adj.toarray().T @ toy_features
    got = spmm_t(g, jnp.asarray(toy_features))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)


def test_spmm_rectangular(rng):
    dense = (rng.rand(20, 33) < 0.2).astype(np.float32) * rng.rand(20, 33)
    g = from_scipy(sp.coo_matrix(dense))
    x = rng.randn(33, 8).astype(np.float32)
    np.testing.assert_allclose(np.asarray(spmm(g, jnp.asarray(x))), dense @ x,
                               rtol=1e-5, atol=1e-5)


def test_spmm_grad_matches_dense(toy_adj, toy_features):
    g = from_scipy(toy_adj)
    x = jnp.asarray(toy_features)

    def f_sparse(x):
        return jnp.sum(jnp.sin(spmm(g, x)))

    def f_dense(x):
        return jnp.sum(jnp.sin(jnp.asarray(toy_adj.toarray()) @ x))

    gs = jax.grad(f_sparse)(x)
    gd = jax.grad(f_dense)(x)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=1e-4,
                               atol=1e-5)


def test_spmm_ev_grads(toy_adj, toy_features):
    g = from_scipy(toy_adj)
    x = jnp.asarray(toy_features)
    vals = g.vals

    def f(vals, x):
        return jnp.sum(jnp.tanh(spmm_ev(g.rows, g.cols, vals, x, g.n_rows)))

    dvals, dx = jax.grad(f, argnums=(0, 1))(vals, x)
    # dense reference
    A = jnp.zeros(g.shape).at[g.rows, g.cols].add(vals)

    def fd(A, x):
        return jnp.sum(jnp.tanh(A @ x))

    dA, dxd = jax.grad(fd, argnums=(0, 1))(A, x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dxd), rtol=1e-4,
                               atol=1e-5)
    # per-edge grad must match the dense dA at edge positions
    mask = np.asarray(g.nnz_mask())
    rows = np.asarray(g.rows)[mask]
    cols = np.asarray(g.cols)[mask]
    np.testing.assert_allclose(np.asarray(dvals)[mask],
                               np.asarray(dA)[rows, cols], rtol=1e-4,
                               atol=1e-5)


def test_sddmm(toy_adj, rng):
    g = from_scipy(toy_adj)
    a = rng.randn(toy_adj.shape[0], 12).astype(np.float32)
    b = rng.randn(toy_adj.shape[0], 12).astype(np.float32)
    scores = np.asarray(sddmm(g, jnp.asarray(a), jnp.asarray(b)))
    mask = np.asarray(g.nnz_mask())
    rows, cols = np.asarray(g.rows)[mask], np.asarray(g.cols)[mask]
    expected = np.sum(a[rows] * b[cols], axis=1)
    np.testing.assert_allclose(scores[mask], expected, rtol=1e-5, atol=1e-5)


def test_eye_and_to_dense():
    g = eye(7)
    np.testing.assert_allclose(np.asarray(to_dense(g)), np.eye(7))


def test_normalize_scipy_adj(toy_adj):
    sym = sparse_mod.normalize_scipy_adj(toy_adj, row_norm=False).toarray()
    d = np.asarray(toy_adj.sum(1)).flatten()
    dinv = np.where(d > 0, d ** -0.5, 0.0)
    expected = dinv[:, None] * toy_adj.toarray() * dinv[None, :]
    np.testing.assert_allclose(sym, expected, rtol=1e-6)

    row = sparse_mod.normalize_scipy_adj(toy_adj, row_norm=True).toarray()
    dinv1 = np.where(d > 0, 1.0 / d, 0.0)
    np.testing.assert_allclose(row, dinv1[:, None] * toy_adj.toarray(),
                               rtol=1e-6)


def test_neg_sampling_loss_narrow_neighbor_table(rng):
    """neg_num larger than the walk table width must not crash the Gumbel
    top-k positive sampler (regression: dryrun_multichip's tiny shapes)."""
    from ctgcn_tpu.losses import WalkData, negative_sampling_loss

    T, N, d, maxnei, S = 3, 16, 8, 2, 5  # maxnei < neg_num
    embs = jnp.asarray(rng.randn(T, N, d).astype(np.float32))
    neighbors = jnp.asarray(
        rng.randint(0, N, size=(T, N, maxnei)).astype(np.int32))
    degrees = jnp.asarray(rng.randint(0, maxnei + 1, size=(T, N)).astype(np.int32))
    walk = WalkData.from_dense(neighbors, degrees,
                               jnp.zeros((T, N), np.float32))
    loss = jax.jit(lambda e: negative_sampling_loss(
        e, jnp.arange(N, dtype=jnp.int32), jnp.ones((N,), bool), walk,
        jax.random.key(0), neg_num=S))(embs)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda e: negative_sampling_loss(
        e, jnp.arange(N, dtype=jnp.int32), jnp.ones((N,), bool), walk,
        jax.random.key(0), neg_num=S))(embs)
    assert np.all(np.isfinite(np.asarray(g)))


def test_neg_sampling_positive_sampler_uniform_subsets():
    """The Floyd positive sampler must draw exact uniform without-replacement
    subsets when deg > neg_num (reference random.sample, metrics.py:74).
    Checked by chi-square over all C(6,2)=15 subsets of one node's table."""
    from itertools import combinations

    from ctgcn_tpu.losses import WalkData, negative_sampling_loss

    T, N, d, maxnei, S, deg = 1, 7, 3, 6, 2, 6
    neighbors = np.zeros((T, N, maxnei), np.int32)
    neighbors[0, 0] = np.arange(1, maxnei + 1)  # node 0: partners 1..6
    degrees = np.zeros((T, N), np.int32)
    degrees[0, 0] = deg
    walk = WalkData.from_dense(neighbors, degrees,
                               jnp.zeros((T, N), np.float32))
    # one-hot embeddings make pos_score reveal the sampled partner ids:
    # emb rows are e_i, so score(0, j) has a unique signature per partner
    embs = jnp.asarray(np.eye(N, d, dtype=np.float32))[None]

    # recover sampled subsets via the loss gradient's sparsity pattern:
    # grad wrt emb rows is nonzero exactly for node 0 + its sampled partners
    # (neg sampling is silenced by pointing neg_logits at an isolated node)
    batch_idx = jnp.zeros((1,), jnp.int32)
    batch_mask = jnp.ones((1,), bool)

    grad_fn = jax.jit(jax.grad(lambda e, k: negative_sampling_loss(
        e, batch_idx, batch_mask, walk, k, neg_num=S, Q=0.0)))
    counts = {c: 0 for c in combinations(range(1, maxnei + 1), S)}
    n_trials = 1500
    for i in range(n_trials):
        g = np.asarray(grad_fn(embs, jax.random.key(i)))[0]
        touched = tuple(sorted(int(r) for r in np.nonzero(
            np.abs(g).sum(axis=1))[0] if r != 0))
        assert len(touched) == S  # distinct partners
        counts[touched] += 1
    # chi-square against uniform over 15 subsets: dof=14, p=0.001 cutoff 36.1
    expected = n_trials / len(counts)
    chi2 = sum((c - expected) ** 2 / expected for c in counts.values())
    assert chi2 < 36.1, (chi2, counts)
