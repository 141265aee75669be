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


# ---------------------------------------------------------------------------
# Pyramid plans: CoreDiffusion / CTGCN on the Pallas path
# ---------------------------------------------------------------------------

def _toy_core_mats(rng, n=150, k=3):
    """Nested core matrices (max core first, like the reference pyramid)."""
    base = (rng.rand(n, n) < 0.08).astype(np.float32) * rng.rand(n, n)
    mats = []
    for i in range(k):  # shrink support as "core" rises
        mask = (rng.rand(n, n) < (0.3 + 0.2 * i)).astype(np.float32)
        mats.append(sp.csr_matrix(base * mask))
    return mats  # index 0 = max core


def test_pyramid_plan_matches_dense_forward(rng):
    from ctgcn_tpu.ops.pyramid import build_core_pyramid
    from ctgcn_tpu.nn.core_models import CoreDiffusion

    mats = _toy_core_mats(rng)
    n = mats[0].shape[0]
    pyr_dense = build_core_pyramid(mats, n, densify=True)
    pyr_plan = build_core_pyramid(mats, n, build_plans=True)
    assert pyr_plan.plan_fwd is not None and pyr_plan.dense is None

    layer = CoreDiffusion.init(jax.random.PRNGKey(0), 16, 24)
    x = jnp.asarray(rng.randn(n, 16).astype(np.float32))
    out_d = layer(x, pyr_dense)
    out_p = layer(x, pyr_plan)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               rtol=2e-4, atol=2e-4)


def test_pyramid_plan_grad_matches_segment(rng):
    from ctgcn_tpu.ops.pyramid import build_core_pyramid
    from ctgcn_tpu.nn.core_models import CoreDiffusion

    mats = _toy_core_mats(rng, n=90, k=2)
    n = mats[0].shape[0]
    pyr_seg = build_core_pyramid(mats, n)
    pyr_plan = build_core_pyramid(mats, n, build_plans=True)
    layer = CoreDiffusion.init(jax.random.PRNGKey(1), 8, 8)
    x = jnp.asarray(np.random.RandomState(5).randn(n, 8).astype(np.float32))

    def loss(l, pyr):
        return jnp.sum(jnp.tanh(l(x, pyr)))

    g_seg = jax.grad(loss)(layer, pyr_seg)
    g_plan = jax.grad(loss)(layer, pyr_plan)
    for a, b in zip(jax.tree.leaves(g_seg), jax.tree.leaves(g_plan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_ctgcn_on_stacked_pyramid_plans(rng):
    """Whole CTGCN-C forward + grad through stacked (T-axis) Pallas plans,
    with per-snapshot block counts that differ (exercises pad_block_plan)."""
    from ctgcn_tpu.ops.pyramid import build_core_pyramid, stack_pyramids
    from ctgcn_tpu.nn.core_models import CTGCN

    n, T = 140, 3
    pyrs, pyrs_dense = [], []
    for t in range(T):
        mats = _toy_core_mats(np.random.RandomState(t), n=n, k=2)
        pyrs.append(build_core_pyramid(mats, n, num_slots=2, pad_to=8192,
                                       build_plans=True))
        pyrs_dense.append(build_core_pyramid(mats, n, num_slots=2,
                                             pad_to=8192, densify=True))
    stacked = stack_pyramids(pyrs)
    stacked_dense = stack_pyramids(pyrs_dense)

    model = CTGCN.init(jax.random.PRNGKey(2), input_dim=n, hidden_dim=16,
                       output_dim=12, trans_num=1, diffusion_num=1,
                       duration=T)
    out_p = model(None, stacked)
    out_d = model(None, stacked_dense)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               rtol=2e-4, atol=2e-4)

    g = jax.grad(lambda m: jnp.sum(m(None, stacked) ** 2))(model)
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree.leaves(g))
