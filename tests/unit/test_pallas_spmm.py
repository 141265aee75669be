# coding: utf-8
"""Pallas block-sparse SpMM parity tests (interpreter mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from ctgcn_tpu.ops.pallas_spmm import (
    BLOCK, build_block_plan, build_block_plans, block_spmm,
)


@pytest.fixture
def mat(rng):
    n = 300
    dense = (rng.rand(n, n) < 0.05).astype(np.float32)
    dense *= rng.rand(n, n).astype(np.float32)
    return sp.coo_matrix(dense)


def test_plan_reconstruction(mat):
    """The BSR plan must reconstruct the matrix exactly."""
    plan = build_block_plan(mat)
    recon = np.zeros((plan.n_rows, plan.n_cols), np.float32)
    blocks = np.asarray(plan.blocks)
    bc = np.asarray(plan.block_col)
    rp = np.asarray(plan.row_ptr)
    for rt in range(len(rp) - 1):
        for b in range(rp[rt], rp[rt + 1]):
            recon[rt * BLOCK:(rt + 1) * BLOCK,
                  bc[b] * BLOCK:(bc[b] + 1) * BLOCK] += blocks[b]
    n = mat.shape[0]
    np.testing.assert_allclose(recon[:n, :n], mat.toarray(), rtol=1e-6)


def test_block_spmm_matches_dense(mat, rng):
    fwd, t = build_block_plans(mat)
    n = mat.shape[0]
    x = rng.randn(n, 70).astype(np.float32)
    y = block_spmm(fwd, t, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y)[:n], mat.toarray() @ x,
                               rtol=1e-4, atol=1e-4)


def test_block_spmm_grad(mat, rng):
    fwd, t = build_block_plans(mat)
    n = mat.shape[0]
    x = jnp.asarray(rng.randn(n, 40).astype(np.float32))

    gx = jax.grad(lambda x: jnp.sum(
        jnp.sin(block_spmm(fwd, t, x, interpret=True)[:n])))(x)
    gd = jax.grad(lambda x: jnp.sum(
        jnp.sin(jnp.asarray(mat.toarray()) @ x)))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gd), rtol=1e-4,
                               atol=1e-4)


def test_empty_matrix():
    empty = sp.coo_matrix((64, 64))
    fwd, t = build_block_plans(empty)
    x = jnp.ones((64, 8))
    y = block_spmm(fwd, t, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y)[:64], 0.0)


def test_rectangular(rng):
    dense = (rng.rand(100, 260) < 0.1).astype(np.float32)
    mat = sp.coo_matrix(dense)
    fwd = build_block_plan(mat)
    t = build_block_plan(mat.T)
    x = rng.randn(260, 16).astype(np.float32)
    y = block_spmm(fwd, t, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y)[:100], dense @ x, rtol=1e-4,
                               atol=1e-4)
