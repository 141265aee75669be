# coding: utf-8
"""Model zoo forward/grad sanity + CoreDiffusion semantics tests (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from ctgcn_tpu.data.loader import stack_graphs
from ctgcn_tpu.ops.pyramid import build_core_pyramid, stack_pyramids
from ctgcn_tpu.ops.sparse import from_scipy

N, T = 24, 3


@pytest.fixture
def adjs(rng):
    mats = []
    for _ in range(T):
        d = (rng.rand(N, N) < 0.25).astype(np.float32)
        d = np.triu(d, 1)
        d = d + d.T
        mats.append(sp.coo_matrix(d))
    return mats


@pytest.fixture
def adj_bank(adjs):
    cap = 512
    return stack_graphs([from_scipy(m, pad_to=cap) for m in adjs])


@pytest.fixture
def pyramids(adjs):
    pyrs = []
    for m in adjs:
        A = m.tocsr()
        deg = np.asarray(A.sum(1)).flatten()
        mats = []
        for k in [2, 1]:
            keep = (deg >= k).astype(np.float32)
            mats.append(sp.csr_matrix(
                A.multiply(keep[:, None]).multiply(keep[None, :])))
        pyrs.append(build_core_pyramid(mats, N, num_slots=3, pad_to=512))
    return stack_pyramids(pyrs)


def _grad_ok(loss_fn, model):
    g = jax.grad(loss_fn)(model)
    total = jax.tree.reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert bool(jnp.isfinite(total))
    return float(total)


def test_core_diffusion_matches_manual_oracle(pyramids, rng):
    """CoreDiffusion == manual prefix-sum + GRU + sum + LayerNorm oracle."""
    from ctgcn_tpu.nn.core_models import CoreDiffusion
    from ctgcn_tpu.ops.rnn import rnn_scan

    layer = CoreDiffusion.init(jax.random.key(0), 8, 6)
    x = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    pyr0 = jax.tree.map(lambda a: a[0], pyramids)
    out = layer(x, pyr0)
    assert out.shape == (N, 6)

    # manual oracle over the dense valid cores
    accs = []
    acc = jnp.zeros_like(x)
    for k in range(pyr0.num_slots):
        if not bool(pyr0.valid[k]):
            continue
        dense = np.zeros((N, N), np.float32)
        rows = np.asarray(pyr0.rows[k])
        cols = np.asarray(pyr0.cols[k])
        vals = np.asarray(pyr0.vals[k])
        m = vals != 0
        np.add.at(dense, (rows[m], cols[m]), vals[m])
        acc = acc + jnp.asarray(dense) @ x
        accs.append(jax.nn.relu(acc))
    hx = jnp.stack(accs)
    outs, _ = rnn_scan(layer.rnn, hx)
    expected = layer.norm(outs.sum(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


def test_ctgcn_forward_and_grad(pyramids):
    from ctgcn_tpu.nn import CTGCN

    model = CTGCN.init(jax.random.key(0), input_dim=N, hidden_dim=12,
                       output_dim=8, trans_num=1, diffusion_num=2, duration=T)
    out = model(None, pyramids)
    assert out.shape == (T, N, 8)
    _grad_ok(lambda m: jnp.sum(jnp.square(m(None, pyramids))), model)


def test_cgcn_s_returns_trans(pyramids, rng):
    from ctgcn_tpu.nn import CGCN

    model = CGCN.init(jax.random.key(1), input_dim=10, hidden_dim=12,
                      output_dim=8, trans_num=2, diffusion_num=1,
                      model_type="S", trans_activate_type="N")
    xs = jnp.asarray(rng.randn(T, N, 10).astype(np.float32))
    emb, trans = model(xs, pyramids)
    assert emb.shape == (T, N, 8) and trans.shape == (T, N, 8)


def test_gcn_gat_forward_grad(adj_bank, rng):
    from ctgcn_tpu.nn.gcn import GCN
    from ctgcn_tpu.nn.gat import GAT

    xs = jnp.asarray(rng.randn(T, N, 10).astype(np.float32))
    gcn = GCN.init(jax.random.key(0), 10, 16, 8)
    out = gcn(xs, adj_bank, key=jax.random.key(1))
    assert out.shape == (T, N, 8)
    _grad_ok(lambda m: jnp.sum(jnp.square(m(xs, adj_bank))), gcn)

    gat = GAT.init(jax.random.key(2), 10, 16, 8, head_num=2)
    out = gat(xs, adj_bank)
    assert out.shape == (T, N, 8)
    _grad_ok(lambda m: jnp.sum(jnp.square(m(xs, adj_bank))), gat)


def test_gcrn_forward(adj_bank, rng):
    from ctgcn_tpu.nn.gcn import GCRN

    model = GCRN.init(jax.random.key(0), 10, 16, 8, duration=T)
    xs = jnp.asarray(rng.randn(T, N, 10).astype(np.float32))
    out = model(xs, adj_bank)
    assert out.shape == (T, N, 8)


def test_sage_gin_forward(adjs, adj_bank, rng):
    from ctgcn_tpu.nn.sage import SAGE
    from ctgcn_tpu.nn.gin import GIN
    from ctgcn_tpu.ops.neighbors import neighbor_table_from_scipy

    nbr_data = neighbor_table_from_scipy(adjs)
    xs = jnp.asarray(rng.randn(T, N, 10).astype(np.float32))

    sage = SAGE.init(jax.random.key(0), 10, 16, 8, num_sample=4)
    out = sage(xs, nbr_data, key=jax.random.key(1))
    assert out.shape == (T, N, 8)
    sage_full = SAGE.init(jax.random.key(0), 10, 16, 8, num_sample=None)
    out = sage_full(xs, nbr_data)
    assert out.shape == (T, N, 8)

    gin = GIN.init(jax.random.key(2), 10, 16, 8, layer_num=2,
                   mlp_layer_num=2, learn_eps=True)
    out = gin(xs, adj_bank)
    assert out.shape == (T, N, 8)
    gin_max = GIN.init(jax.random.key(3), 10, 16, 8, layer_num=2,
                       mlp_layer_num=2, learn_eps=False, pooling_type="max")
    out = gin_max(xs, adj_bank, nbr_data)
    assert out.shape == (T, N, 8)


def test_evolvegcn_forward_grad(adj_bank, rng):
    from ctgcn_tpu.nn.egcn import EvolveGCN

    xs = jnp.asarray(rng.randn(T, N, 10).astype(np.float32))
    for egcn_type in ("EGCNH", "EGCNO"):
        model = EvolveGCN.init(jax.random.key(0), 10, 9, 8,
                               egcn_type=egcn_type)
        out = model(xs, adj_bank)
        assert out.shape == (T, N, 8)
        _grad_ok(lambda m: jnp.sum(jnp.square(m(xs, adj_bank))), model)


def test_vgrnn_forward_grad(adjs, rng):
    from ctgcn_tpu.nn.vgrnn import VGRNN
    from ctgcn_tpu.ops.sparse import normalize_scipy_adj

    normed = []
    for m in adjs:
        b = (m.tocsr() != 0).astype(np.float64) + 2.0 * sp.eye(N)
        normed.append(normalize_scipy_adj(b))
    bank = stack_graphs([from_scipy(m, pad_to=1024) for m in normed])
    xs = jnp.asarray(rng.randn(T, N, 10).astype(np.float32))
    model = VGRNN.init(jax.random.key(0), 10, 12, 8)
    embs, h, (em, es, pm, ps, dec) = model(xs, bank, key=jax.random.key(1))
    assert embs.shape == (T, N, 8)
    assert dec.shape == (T, N, N)
    assert bool(jnp.isfinite(embs).all())

    from ctgcn_tpu.losses import vae_loss
    from ctgcn_tpu.ops.sparse import to_dense

    adj_dense = jnp.stack(
        [jnp.asarray(m.toarray().astype(np.float32)) for m in adjs])

    def loss_fn(m):
        _, _, (em, es, pm, ps, dec) = m(xs, bank, key=jax.random.key(1))
        return vae_loss(em, es, pm, ps, dec, adj_dense)

    _grad_ok(loss_fn, model)


def test_pgnn_forward(adjs, rng):
    from ctgcn_tpu.nn.pgnn import (
        PGNN, anchor_sizes, precompute_dist_data, select_anchor_dists,
    )

    edge_list = [np.stack([m.row, m.col]) for m in adjs]
    dists = jnp.asarray(precompute_dist_data(edge_list, N))
    sizes = anchor_sizes(N)
    dm, da = jax.vmap(
        lambda d, k: select_anchor_dists(k, d, sizes))(
            dists, jax.random.split(jax.random.key(0), T))
    xs = jnp.asarray(rng.randn(T, N, 10).astype(np.float32))
    model = PGNN.init(jax.random.key(1), 10, 6, 6, 8, layer_num=2)
    out = model(xs, (dm, da))
    # position-aware output dim == number of anchor sets (reference
    # pgnn.py:201-206 returns x_position, one scalar per anchor set)
    assert out.shape == (T, N, len(sizes))
    assert bool(jnp.isfinite(out).all())


def test_dyn_family_forward(rng):
    from ctgcn_tpu.nn.dynae import DynAE, DynAERNN, DynGEM, DynRNN

    lb, d = 2, 6
    x2d = jnp.asarray(rng.randn(5, lb * N).astype(np.float32))
    x3d = jnp.asarray(rng.randn(5, lb, N).astype(np.float32))

    m = DynAE.init(jax.random.key(0), N, d, lb, (16, 12))
    hx, pred = m(x2d)
    assert hx.shape == (5, d) and pred.shape == (5, N)

    m = DynRNN.init(jax.random.key(1), N, d, lb, (16, 12))
    hx, pred = m(x3d)
    assert hx.shape == (5, d) and pred.shape == (5, N)

    m = DynAERNN.init(jax.random.key(2), N, d, lb, (16, 12), (10,))
    hx, pred = m(x3d)
    assert hx.shape == (5, d) and pred.shape == (5, N)

    m = DynGEM.init(jax.random.key(3), N, d, (16, 12))
    hx, pred = m(x2d[:, :N])
    assert hx.shape == (5, d) and pred.shape == (5, N)


def test_timers_runs(tmp_path, adjs):
    import pandas as pd
    from ctgcn_tpu.nn.timers import timers

    base = tmp_path
    (base / "snaps").mkdir()
    names = [f"U{i}" for i in range(N)]
    pd.DataFrame({"node": names}).to_csv(base / "nodes.csv", index=False,
                                         header=False)
    for t, m in enumerate(adjs):
        coo = m.tocoo()
        keep = coo.row < coo.col
        df = pd.DataFrame({
            "from_id": [names[i] for i in coo.row[keep]],
            "to_id": [names[j] for j in coo.col[keep]],
            "weight": coo.data[keep],
        })
        df.to_csv(base / "snaps" / f"t{t}.csv", sep="\t", index=False)
    timers(str(base / "nodes.csv"), str(base / "snaps"),
           str(base / "emb"), Theta=0.17, dim=4)
    out = pd.read_csv(base / "emb" / "t0.csv", sep="\t", index_col=0)
    assert out.shape == (N, 8)
    assert np.isfinite(out.values).all()


def test_core_diffusion_bf16_bank_close_to_f32(adjs, rng):
    """matmul_precision=bf16: a bfloat16 dense bank must run the single-
    pass MXU path and stay within bf16 rounding of the f32 result."""
    from ctgcn_tpu.nn.core_models import CoreDiffusion

    def pyr(dtype):
        m = adjs[0].tocsr()
        deg = np.asarray(m.sum(1)).flatten()
        mats = []
        for k in [2, 1]:
            keep = (deg >= k).astype(np.float32)
            mats.append(sp.csr_matrix(
                m.multiply(keep[:, None]).multiply(keep[None, :])))
        return build_core_pyramid(mats, N, num_slots=3, pad_to=512,
                                  densify=True, dense_dtype=dtype)

    p32 = pyr(jnp.float32)
    p16 = pyr(jnp.bfloat16)
    assert p16.dense.dtype == jnp.bfloat16
    layer = CoreDiffusion.init(jax.random.key(0), 8, 6)
    x = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    o32 = layer(x, p32)
    o16 = layer(x, p16)
    assert o16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(o16), np.asarray(o32),
                               rtol=0.05, atol=0.05)


def test_core_diffusion_high_prec_matches_highest(adjs, rng):
    """matmul_precision=high: the bf16_3x dense path is a precision hint —
    on CPU it is exact, so it must match the HIGHEST path bitwise; this
    pins the dense_prec plumbing through pyramid -> CoreDiffusion."""
    from ctgcn_tpu.nn.core_models import CoreDiffusion

    def pyr(prec):
        m = adjs[0].tocsr()
        deg = np.asarray(m.sum(1)).flatten()
        mats = []
        for k in [2, 1]:
            keep = (deg >= k).astype(np.float32)
            mats.append(sp.csr_matrix(
                m.multiply(keep[:, None]).multiply(keep[None, :])))
        return build_core_pyramid(mats, N, num_slots=3, pad_to=512,
                                  densify=True, dense_prec=prec)

    p_hi = pyr("highest")
    p_3x = pyr("high")
    assert p_3x.dense_prec == "high"
    layer = CoreDiffusion.init(jax.random.key(0), 8, 6)
    x = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    np.testing.assert_allclose(np.asarray(layer(x, p_3x)),
                               np.asarray(layer(x, p_hi)),
                               rtol=1e-6, atol=1e-6)


def test_loader_dense_dtype_plumbs_to_bank(tmp_path, rng):
    """DataLoader.get_core_adj_list(dense_dtype=bf16) stores a bf16 bank
    (forced dense) / bf16 blocks (auto prefers the block backend)."""
    import os
    from ctgcn_tpu.data.loader import DataLoader

    core_dir = tmp_path / "cores" / "2020-01"
    os.makedirs(core_dir)
    d = (rng.rand(12, 12) < 0.4).astype(np.float32)
    d = np.triu(d, 1); d = d + d.T
    sp.save_npz(str(core_dir / "0.npz"), sp.coo_matrix(d).tocsr())
    loader = DataLoader([f"n{i}" for i in range(12)], 1)
    pyr = loader.get_core_adj_list(str(tmp_path / "cores"), 0, 1,
                                   core_backend="dense",
                                   dense_dtype=jnp.bfloat16)
    assert pyr.dense is not None and pyr.dense.dtype == jnp.bfloat16
    pyr_auto = loader.get_core_adj_list(str(tmp_path / "cores"), 0, 1,
                                        dense_dtype=jnp.bfloat16)
    assert pyr_auto.blocks is not None
    assert pyr_auto.blocks[0][0].dtype == jnp.bfloat16
    assert pyr_auto.dense is None
    pyr_nb = loader.get_core_adj_list(str(tmp_path / "cores"), 0, 1,
                                      allow_blocks=False)
    assert pyr_nb.blocks is None and pyr_nb.dense is not None


def _pyramid_pair(adjs, uniform_blocks=False, **kw):
    """(dense, blocks) stacked pyramids over the same synthetic cores."""
    out = []
    for build_blocks in (False, True):
        pyrs = []
        for m in adjs:
            A = m.tocsr()
            deg = np.asarray(A.sum(1)).flatten()
            mats = []
            for k in [2, 1]:
                keep = (deg >= k).astype(np.float32)
                mats.append(sp.csr_matrix(
                    A.multiply(keep[:, None]).multiply(keep[None, :])))
            pyrs.append(build_core_pyramid(
                mats, N, num_slots=3, pad_to=512,
                densify=not build_blocks, build_blocks=build_blocks, **kw))
        out.append(stack_pyramids(
            pyrs, uniform_blocks=build_blocks and uniform_blocks))
    return out


@pytest.mark.parametrize("uniform", [False, True])
def test_core_blocks_backend_matches_dense(adjs, rng, uniform):
    """Core-sorted principal-block backend == dense bank: full CTGCN-C
    forward and grads allclose through the jitted path (the permutation,
    cropped matmuls, +x identity and un-permute are exact re-arrangements
    of the same math) — in both the ragged (single-device unroll) and
    window-uniform (mesh vmap) representations."""
    from ctgcn_tpu.nn.core_models import CTGCN

    p_dense, p_blocks = _pyramid_pair(adjs, uniform_blocks=uniform)
    assert p_blocks.blocks is not None
    if uniform:
        assert all(b.shape[0] == T for b in p_blocks.blocks)
    else:
        assert len(p_blocks.blocks) == T
    model = CTGCN.init(jax.random.key(0), input_dim=N, hidden_dim=16,
                       output_dim=8, trans_num=1, diffusion_num=2,
                       duration=T)
    fwd = jax.jit(lambda m, p: m(None, p))
    o_d = fwd(model, p_dense)
    o_b = fwd(model, p_blocks)
    np.testing.assert_allclose(np.asarray(o_b), np.asarray(o_d),
                               rtol=2e-5, atol=2e-5)

    def loss(m, p):
        return jnp.sum(jnp.square(m(None, p)))

    g_d = jax.jit(jax.grad(loss))(model, p_dense)
    g_b = jax.jit(jax.grad(loss))(model, p_blocks)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4),
        g_d, g_b)


def test_ragged_blocks_batched_window_tail_matches_unrolled(adjs, rng,
                                                            monkeypatch):
    """The env-gated T-batched window tail (CTGCN_TPU_BATCH_WINDOW_TAIL)
    is numerically equivalent to the default per-snapshot unroll on the
    ragged-blocks path — fwd and grads, CTGCN-C and CGCN-S."""
    from ctgcn_tpu.nn.core_models import CTGCN, CGCN

    _, p_blocks = _pyramid_pair(adjs)
    model = CTGCN.init(jax.random.key(0), input_dim=N, hidden_dim=16,
                       output_dim=8, trans_num=1, diffusion_num=2,
                       duration=T)
    cgcn = CGCN.init(jax.random.key(1), input_dim=N, hidden_dim=16,
                     output_dim=8, trans_num=1, diffusion_num=1,
                     model_type="S")

    def loss(m, p):
        return jnp.sum(jnp.square(m(None, p)))

    ref = model(None, p_blocks)
    g_ref = jax.grad(loss)(model, p_blocks)
    e_ref, t_ref = cgcn(None, p_blocks)
    monkeypatch.setenv("CTGCN_TPU_BATCH_WINDOW_TAIL", "1")
    got = model(None, p_blocks)
    g_got = jax.grad(loss)(model, p_blocks)
    e_got, t_got = cgcn(None, p_blocks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(e_got), np.asarray(e_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_ref),
                               rtol=2e-5, atol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4),
        g_got, g_ref)


def test_core_blocks_backend_cgcn_s(adjs, rng):
    """Blocks backend through the CGCN 'S' tuple-output path."""
    from ctgcn_tpu.nn.core_models import CGCN

    p_dense, p_blocks = _pyramid_pair(adjs)
    model = CGCN.init(jax.random.key(1), input_dim=N, hidden_dim=16,
                      output_dim=8, trans_num=1, diffusion_num=1,
                      model_type="S")
    e_d, t_d = model(None, p_dense)
    e_b, t_b = model(None, p_blocks)
    np.testing.assert_allclose(np.asarray(e_b), np.asarray(e_d),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_d),
                               rtol=2e-5, atol=2e-5)


def test_remat_map_path_matches_vmap(pyramids, monkeypatch):
    """The budget-triggered lax.map + jax.checkpoint execution of the
    multi-snapshot forward must match the batched vmap path exactly
    (same math, different schedule)."""
    import ctgcn_tpu.nn.core_models as CM

    pyr = pyramids
    model = CM.CTGCN.init(jax.random.key(0), input_dim=N, hidden_dim=16,
                          output_dim=8, trans_num=1, diffusion_num=2,
                          duration=T)

    def loss(m, p):
        return jnp.sum(m(None, p) ** 2)

    base = jax.jit(lambda m, p: m(None, p))(model, pyr)
    gbase = jax.jit(jax.grad(loss))(model, pyr)
    monkeypatch.setenv("CTGCN_TPU_ACT_BUDGET", "1")  # force map + remat
    rem = jax.jit(lambda m, p: m(None, p))(model, pyr)
    grem = jax.jit(jax.grad(loss))(model, pyr)
    np.testing.assert_allclose(np.asarray(base), np.asarray(rem),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gbase), jax.tree.leaves(grem)):
        # atol 5e-5: with the custom core-RNN VJP both schedules run the
        # same hand-written backward, but vmap'd (batched GEMM) vs
        # lax.map'd (per-snapshot GEMM) reductions associate differently
        # at f32 (observed max |Δ| 3e-5 on CPU)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-5)
