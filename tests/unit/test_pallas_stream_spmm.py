# coding: utf-8
"""Streaming gather SpMM kernel (ops/pallas_stream_spmm.py) parity tests
(interpret mode; real-chip numbers live in scripts/bench_spmm_backends)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ctgcn_tpu.ops.pallas_stream_spmm import (
    build_stream_plan, build_stream_plans, stream_spmm, _stream_spmm_raw,
    _pad_rows,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _graph(rng, n, m=None, avg_deg=8):
    m = m or n
    nnz = n * avg_deg
    r = rng.randint(0, n, nnz)
    c = rng.randint(0, m, nnz)
    v = rng.rand(nnz).astype(np.float32)
    mat = sp.coo_matrix((v, (r, c)), shape=(n, m))
    mat.sum_duplicates()
    return mat.tocsr()


def test_stream_plan_roundtrip(rng):
    mat = _graph(rng, 700)
    plan = build_stream_plan(mat)
    dense = np.zeros((plan.n_rows, plan.n_cols), np.float32)
    rows = np.asarray(plan.rows)
    cols = np.asarray(plan.cols)
    vals = np.asarray(plan.vals)
    rt = np.asarray(plan.block_rt)
    cs = np.asarray(plan.block_cs)
    assert (np.diff(rt) >= 0).all()
    for b in range(rows.shape[0]):
        m = vals[b] != 0
        np.add.at(dense, (rt[b] * 512 + rows[b][m], cs[b] * 16384
                          + cols[b][m]), vals[b][m])
    np.testing.assert_allclose(dense[:700, :700], mat.toarray(), rtol=1e-6)


def test_stream_spmm_forward(rng):
    mat = _graph(rng, 900)
    fwd = build_stream_plan(mat)
    x = rng.randn(fwd.n_cols, 128).astype(np.float32)
    y = _stream_spmm_raw(fwd, jnp.asarray(x), interpret=True)
    expected = mat.toarray() @ x[:900]
    np.testing.assert_allclose(np.asarray(y)[:900], expected, rtol=1e-4,
                               atol=1e-4)


def test_stream_spmm_multi_strip(rng):
    """Columns spanning >1 strip (N > C_STRIP) exercise the strip DMA."""
    n = 17000  # > C_STRIP=16384
    mat = _graph(rng, 1000, m=n, avg_deg=4)
    fwd = build_stream_plan(mat)
    assert int(np.asarray(fwd.block_cs).max()) >= 1
    x = rng.randn(fwd.n_cols, 128).astype(np.float32)
    y = _stream_spmm_raw(fwd, jnp.asarray(x), interpret=True)
    expected = mat.toarray() @ x[:n]
    np.testing.assert_allclose(np.asarray(y)[:1000], expected, rtol=1e-4,
                               atol=1e-4)


def test_stream_spmm_grad(rng):
    mat = _graph(rng, 600)
    fwd, tpl = build_stream_plans(mat)
    x = jnp.asarray(rng.randn(600, 128).astype(np.float32))

    def loss(x):
        return jnp.sum(jnp.tanh(stream_spmm(fwd, tpl, x, True)[:600]))

    gx = jax.grad(loss)(x)
    A = jnp.asarray(mat.toarray())

    def ref_loss(x):
        return jnp.sum(jnp.tanh(A @ x))

    gx_ref = jax.grad(ref_loss)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-4)
