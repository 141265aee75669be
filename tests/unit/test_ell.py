# coding: utf-8
"""Degree-bucketed ELL SpMM (ops/ell.py) correctness tests (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from ctgcn_tpu.ops.ell import (build_ell_plan, build_ell_plans, ell_spmm)


def _powerlaw(rng, n=200, m=160):
    """Power-law-ish sparse matrix with hubs, empty rows and duplicates."""
    deg = np.minimum((rng.pareto(1.0, n) * 3).astype(int), n - 1)
    deg[rng.rand(n) < 0.1] = 0                       # isolated rows
    rows = np.repeat(np.arange(n), deg)
    cols = rng.randint(0, m, rows.shape[0])
    vals = rng.randn(rows.shape[0]).astype(np.float32)
    return sp.coo_matrix((vals, (rows, cols)), shape=(n, m)).tocsr()


def test_ell_matches_dense(rng):
    A = _powerlaw(rng)
    x = rng.randn(A.shape[1], 17).astype(np.float32)
    fwd, t = build_ell_plans(A)
    out = ell_spmm(fwd, t, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), A @ x, rtol=1e-5, atol=1e-5)


def test_ell_padding_overhead_bounded(rng):
    A = _powerlaw(rng, n=500, m=500)
    plan = build_ell_plan(A)
    assert plan.padded_nnz <= max(2 * A.nnz, 8 * A.shape[0])


def test_ell_grad_matches_dense(rng):
    A = _powerlaw(rng, n=80, m=60)
    x = jnp.asarray(rng.randn(60, 9).astype(np.float32))
    fwd, t = build_ell_plans(A)

    def loss(x):
        return jnp.sum(jnp.tanh(ell_spmm(fwd, t, x)))

    def loss_ref(x):
        return jnp.sum(jnp.tanh(jnp.asarray(A.toarray()) @ x))

    g = jax.jit(jax.grad(loss))(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_ell_bf16_close(rng):
    A = _powerlaw(rng)
    x = jnp.asarray(rng.randn(A.shape[1], 16).astype(np.float32))
    fwd, t = build_ell_plans(A)
    o32 = ell_spmm(fwd, t, x)
    o16 = ell_spmm(fwd, t, x, True)
    scale = float(jnp.abs(o32).max())
    assert float(jnp.abs(o16 - o32).max()) / scale < 0.02


def test_ell_jit_with_plan_as_pytree(rng):
    A = _powerlaw(rng, n=64, m=64)
    x = jnp.asarray(rng.randn(64, 8).astype(np.float32))
    fwd, t = build_ell_plans(A)
    f = jax.jit(lambda fwd, t, x: ell_spmm(fwd, t, x))
    np.testing.assert_allclose(np.asarray(f(fwd, t, x)),
                               A @ np.asarray(x), rtol=1e-5, atol=1e-5)


def test_ctgcn_ell_backend_matches_segment(rng):
    """Full CTGCN-C forward+grad: ELL pyramid backend == segment backend."""
    from ctgcn_tpu.nn.core_models import CTGCN
    from ctgcn_tpu.ops.pyramid import (build_core_pyramid, stack_pyramids,
                                       attach_ell_plans)

    N, T = 24, 3
    pyrs = []
    for _ in range(T):
        d = (rng.rand(N, N) < 0.25).astype(np.float32)
        d = np.triu(d, 1); d = d + d.T
        A = sp.csr_matrix(d)
        deg = np.asarray(A.sum(1)).flatten()
        mats = []
        for k in [2, 1]:
            keep = (deg >= k).astype(np.float32)
            mats.append(sp.csr_matrix(
                A.multiply(keep[:, None]).multiply(keep[None, :])))
        pyrs.append(build_core_pyramid(mats, N, num_slots=3, pad_to=512))
    seg = stack_pyramids(pyrs)
    ell = attach_ell_plans(seg)

    model = CTGCN.init(jax.random.key(0), input_dim=N, hidden_dim=10,
                       output_dim=6, trans_num=1, diffusion_num=2, duration=T)
    out_seg = model(None, seg)
    out_ell = jax.jit(lambda m, p: m(None, p))(model, ell)
    np.testing.assert_allclose(np.asarray(out_ell), np.asarray(out_seg),
                               rtol=1e-4, atol=1e-5)

    g_seg = jax.grad(lambda m: jnp.sum(jnp.tanh(m(None, seg))))(model)
    g_ell = jax.grad(lambda m: jnp.sum(jnp.tanh(m(None, ell))))(model)
    for a, b in zip(jax.tree.leaves(g_ell), jax.tree.leaves(g_seg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_ctgcn_ell_delta_matches_fullslot(rng):
    """Delta-encoded pyramid plans (gather each edge once, K×K prefix
    reconstruction + '+x') == full-slot plans, on a WEIGHTED graph with a
    trailing invalid slot.  Exactness rests on k-core nesting with raw
    inherited edge weights (preprocessing/kcore.py:83-88)."""
    from ctgcn_tpu.nn.core_models import CTGCN
    from ctgcn_tpu.ops.pyramid import (build_core_pyramid, stack_pyramids,
                                       attach_ell_plans)

    N, T = 28, 2
    pyrs = []
    for _ in range(T):
        d = (rng.rand(N, N) < 0.3) * rng.rand(N, N).astype(np.float32)
        d = np.triu(d, 1); d = d + d.T
        A = sp.csr_matrix(d)
        deg = np.asarray((A != 0).sum(1)).flatten()
        mats = []
        for k in [3, 2, 1]:
            keep = (deg >= k).astype(np.float32)
            mats.append(sp.csr_matrix(
                A.multiply(keep[:, None]).multiply(keep[None, :])))
        pyrs.append(build_core_pyramid(mats, N, num_slots=4, pad_to=1024))
    stacked = stack_pyramids(pyrs)
    full = attach_ell_plans(stacked, delta=False)
    delta = attach_ell_plans(stacked, delta=True)
    # the delta fwd plan must be materially smaller than the full-slot one
    slots = lambda p: sum(int(np.prod(np.asarray(b.cols).shape))
                          for b in p.ell_fwd.buckets)
    assert slots(delta) < slots(full)

    model = CTGCN.init(jax.random.key(1), input_dim=N, hidden_dim=10,
                       output_dim=6, trans_num=1, diffusion_num=2, duration=T)
    out_full = jax.jit(lambda m, p: m(None, p))(model, full)
    out_delta = jax.jit(lambda m, p: m(None, p))(model, delta)
    np.testing.assert_allclose(np.asarray(out_delta), np.asarray(out_full),
                               rtol=1e-4, atol=1e-5)

    g_full = jax.grad(lambda m: jnp.sum(jnp.tanh(m(None, full))))(model)
    g_delta = jax.grad(lambda m: jnp.sum(jnp.tanh(m(None, delta))))(model)
    for a, b in zip(jax.tree.leaves(g_delta), jax.tree.leaves(g_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_ell_zero_width_bucket(rng):
    """Zero-degree rows get a gather-free width-0 bucket: exact zeros in
    the output, no padded gather slots charged for them."""
    n, m = 120, 60
    A = _powerlaw(rng, n=n, m=m)
    zero_rows = np.asarray((A != 0).sum(1)).flatten() == 0
    assert zero_rows.any()  # _powerlaw plants isolated rows
    fwd, t = build_ell_plans(A)
    assert any(b.cols.shape[1] == 0 for b in fwd.buckets)
    assert fwd.padded_nnz <= 2 * A.nnz + 8  # no min-width charge on empties
    x = jnp.asarray(rng.randn(m, 5).astype(np.float32))
    out = np.asarray(ell_spmm(fwd, t, x))
    np.testing.assert_allclose(out, A @ np.asarray(x), rtol=1e-5, atol=1e-5)
    assert (out[zero_rows] == 0).all()


def test_spmm_prefers_attached_ell_plans(rng):
    """SparseGraph with ELL plans routes spmm/spmm_t through them."""
    from ctgcn_tpu.ops.sparse import from_scipy
    from ctgcn_tpu.ops.spmm import spmm, spmm_t
    from ctgcn_tpu.ops.ell import build_ell_plan

    A = _powerlaw(rng, n=120, m=120)
    x = jnp.asarray(rng.randn(120, 7).astype(np.float32))
    g = from_scipy(A)
    g_ell = g.replace(ell_fwd=build_ell_plan(A),
                      ell_t=build_ell_plan(A.T.tocsr()))
    np.testing.assert_allclose(np.asarray(spmm(g_ell, x)),
                               np.asarray(spmm(g, x)), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(spmm_t(g_ell, x)),
                               np.asarray(spmm_t(g, x)), rtol=1e-5, atol=1e-5)


def test_gcn_forward_matches_with_ell_adjacency(tmp_path, rng):
    """Loader adj_backend="ell" end-to-end: GCN forward identical."""
    import os
    import pandas as pd
    from ctgcn_tpu.data.loader import DataLoader
    from ctgcn_tpu.nn.gcn import GCN

    n, T = 30, 2
    names = [f"n{i}" for i in range(n)]
    fmt = tmp_path / "1.format"
    os.makedirs(fmt)
    for t in range(T):
        d = (rng.rand(n, n) < 0.2)
        d = np.triu(d, 1)
        r, c = np.nonzero(d)
        pd.DataFrame({"from_id": [names[i] for i in r],
                      "to_id": [names[j] for j in c],
                      "weight": 1.0}).to_csv(
            str(fmt / f"200{t}.csv"), sep="\t", index=False)
    loader = DataLoader(names, T)
    seg = loader.get_date_adj_list(str(fmt), 0, T, normalize=True,
                                   adj_backend="segment")
    ell = loader.get_date_adj_list(str(fmt), 0, T, normalize=True,
                                   adj_backend="ell")
    assert ell.ell_fwd is not None
    model = GCN.init(jax.random.key(0), n, 16, 8, dropout=0.0)
    xs = jnp.asarray(rng.randn(T, n, n).astype(np.float32))
    o_seg = model(xs, seg)
    o_ell = jax.jit(lambda m, a, x: m(x, a))(model, ell, xs)
    np.testing.assert_allclose(np.asarray(o_ell), np.asarray(o_seg),
                               rtol=1e-4, atol=1e-5)


def test_ell_ev_matches_spmm_ev(rng):
    """Dynamic-value ELL == segment spmm_ev, values and x grads included."""
    from ctgcn_tpu.ops.sparse import from_scipy
    from ctgcn_tpu.ops.spmm import spmm_ev
    from ctgcn_tpu.ops.ell import build_ell_ev_plans, ell_spmm_ev

    A = _powerlaw(rng, n=90, m=90)
    g = from_scipy(A)
    P = g.capacity
    fwd, t = build_ell_ev_plans(np.asarray(g.rows), np.asarray(g.cols),
                                np.asarray(g.vals) != 0, 90, 90)
    vals = jnp.asarray(rng.rand(P).astype(np.float32))
    vals = jnp.where(g.nnz_mask(), vals, 0.0)
    x = jnp.asarray(rng.randn(90, 11).astype(np.float32))

    out_ref = spmm_ev(g.rows, g.cols, vals, x, 90)
    out_ell = jax.jit(ell_spmm_ev)(fwd, t, vals, x)
    np.testing.assert_allclose(np.asarray(out_ell), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)

    def loss_ell(vals, x):
        return jnp.sum(jnp.tanh(ell_spmm_ev(fwd, t, vals, x)))

    def loss_ref(vals, x):
        return jnp.sum(jnp.tanh(spmm_ev(g.rows, g.cols, vals, x, 90)))

    gv_e, gx_e = jax.grad(loss_ell, argnums=(0, 1))(vals, x)
    gv_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(vals, x)
    np.testing.assert_allclose(np.asarray(gx_e), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    # padding-slot val cotangents may differ (both are masked downstream)
    m = np.asarray(g.nnz_mask())
    np.testing.assert_allclose(np.asarray(gv_e)[m], np.asarray(gv_r)[m],
                               rtol=1e-4, atol=1e-5)


def test_gat_forward_matches_with_ell_ev(rng):
    """GAT layer: ELL-ev path == segment path (fwd + grads)."""
    from ctgcn_tpu.ops.sparse import from_scipy
    from ctgcn_tpu.ops.ell import build_ell_ev_plans
    from ctgcn_tpu.nn.gat import SpGraphAttentionLayer

    A = _powerlaw(rng, n=40, m=40)
    A.data[:] = 1.0
    g = from_scipy(A)
    ev_fwd, ev_t = build_ell_ev_plans(
        np.asarray(g.rows), np.asarray(g.cols), np.asarray(g.vals) != 0,
        40, 40)
    g_ell = g.replace(ell_ev_fwd=ev_fwd, ell_ev_t=ev_t)
    layer = SpGraphAttentionLayer.init(jax.random.key(0), 12, 6,
                                       dropout=0.0, alpha=0.2)
    x = jnp.asarray(rng.randn(40, 12).astype(np.float32))
    o_seg = layer(x, g)
    o_ell = jax.jit(lambda l, x, a: l(x, a))(layer, x, g_ell)
    np.testing.assert_allclose(np.asarray(o_ell), np.asarray(o_seg),
                               rtol=1e-4, atol=1e-5)

    g_seg = jax.grad(lambda l: jnp.sum(jnp.tanh(l(x, g))))(layer)
    g_ell_g = jax.grad(lambda l: jnp.sum(jnp.tanh(l(x, g_ell))))(layer)
    for a, b in zip(jax.tree.leaves(g_ell_g), jax.tree.leaves(g_seg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_ell_chunked_apply_matches_unchunked(monkeypatch):
    """The HBM-budget row chunking must be numerically identical to the
    one-shot bucket apply (pad rows gather column 0 with value 0)."""
    import ctgcn_tpu.ops.ell as ell_mod

    rng = np.random.default_rng(3)
    R, C, d = 100, 80, 16
    dens = sp.random(R, C, density=0.12, random_state=5, format="csr",
                     dtype=np.float64)
    x = jnp.asarray(rng.standard_normal((C, d)).astype(np.float32))
    fwd, t = ell_mod.build_ell_plans(dens)
    base = np.asarray(ell_mod.ell_spmm(fwd, t, x))
    monkeypatch.setattr(ell_mod, "_ELL_CHUNK_ELEMS", 257)  # force chunking
    chunked = np.asarray(ell_mod.ell_spmm(fwd, t, x))
    np.testing.assert_allclose(base, chunked, rtol=1e-6, atol=1e-6)
