# coding: utf-8
"""Per-layer activation parity vs the PyTorch reference (BASELINE.md:
'per-layer activations allclose vs PyTorch reference with mapped weights').

These tests import the reference implementation from /root/reference (read
only, torch-cpu) and compare forward activations with weight state mapped
into the TPU-native modules.  Skipped when the reference tree is absent.
"""
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    """Import reference layers/models with compat shims (numpy>=2 removed
    np.int; torch_geometric/torch_scatter are not installed)."""
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001
    for name in ("torch_geometric", "torch_scatter"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    sys.path.insert(0, REFERENCE)
    import layers as ref_layers
    import models as ref_models

    yield ref_layers, ref_models
    sys.path.remove(REFERENCE)


def _to_jnp(t):
    import jax.numpy as jnp

    return jnp.asarray(t.detach().numpy())


def _map_linear(t_linear):
    from ctgcn_tpu.nn.layers import Linear

    return Linear(weight=_to_jnp(t_linear.weight).T,
                  bias=_to_jnp(t_linear.bias)
                  if t_linear.bias is not None else None)


def _map_mlp(t_mlp, activate_type):
    from ctgcn_tpu.nn.layers import MLP

    if t_mlp.layer_num == 1:
        layers = (_map_linear(t_mlp.linear),)
    else:
        layers = tuple(_map_linear(l) for l in t_mlp.linears)
    return MLP(layers=layers, activate_type=activate_type)


def _map_gru(t_gru):
    from ctgcn_tpu.ops.rnn import GRUCell

    return GRUCell(w_ih=_to_jnp(t_gru.weight_ih_l0),
                   w_hh=_to_jnp(t_gru.weight_hh_l0),
                   b_ih=_to_jnp(t_gru.bias_ih_l0),
                   b_hh=_to_jnp(t_gru.bias_hh_l0))


def _map_norm(t_norm):
    from ctgcn_tpu.nn.layers import LayerNorm

    return LayerNorm(scale=_to_jnp(t_norm.weight),
                     offset=_to_jnp(t_norm.bias))


def _map_core_diffusion(t_cd):
    from ctgcn_tpu.nn.core_models import CoreDiffusion

    return CoreDiffusion(rnn=_map_gru(t_cd.rnn), norm=_map_norm(t_cd.norm))


def _toy_cores(rng, n, n_cores=3):
    """Nested core adjacency list, max core first (torch sparse + pyramid)."""
    import scipy.sparse as sp
    import torch

    dense = (rng.rand(n, n) < 0.2).astype(np.float32)
    dense = np.triu(dense, 1)
    dense = dense + dense.T
    A = sp.csr_matrix(dense)
    deg = np.asarray(A.sum(1)).flatten()
    mats = []
    for k in range(n_cores, 0, -1):
        keep = (deg >= k).astype(np.float32)
        mats.append(sp.csr_matrix(
            A.multiply(keep[:, None]).multiply(keep[None, :])))

    # torch-side list (reference helper.py:51-82 semantics)
    torch_list = []
    prev = None
    for j, m in enumerate(mats):
        if j == 0:
            use = m + sp.eye(n, format="csr")
        else:
            if prev is not None and abs(m - prev).sum() == 0:
                prev = m
                continue
            use = m
        prev = m
        coo = use.tocoo()
        idx = torch.from_numpy(np.vstack([coo.row, coo.col])).long()
        torch_list.append(torch.sparse_coo_tensor(
            idx, torch.from_numpy(coo.data).float(), (n, n)))

    from ctgcn_tpu.ops.pyramid import build_core_pyramid

    pyramid = build_core_pyramid(mats, n, num_slots=n_cores, pad_to=1024)
    return torch_list, pyramid


def test_mlp_parity(ref_modules):
    import torch
    ref_layers, _ = ref_modules
    rng = np.random.RandomState(0)
    t_mlp = ref_layers.MLP(12, 20, 8, layer_num=3, activate_type="N")
    ours = _map_mlp(t_mlp, "N")
    x = rng.randn(30, 12).astype(np.float32)
    with torch.no_grad():
        ref_out = t_mlp(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours(x)), ref_out, rtol=1e-5,
                               atol=1e-5)


def test_core_diffusion_parity(ref_modules):
    import torch
    ref_layers, _ = ref_modules
    rng = np.random.RandomState(1)
    n, din, dout = 40, 10, 6
    t_cd = ref_layers.CoreDiffusion(din, dout, rnn_type="GRU")
    t_cd.eval()
    ours = _map_core_diffusion(t_cd)
    torch_cores, pyramid = _toy_cores(rng, n)
    x = rng.randn(n, din).astype(np.float32)
    with torch.no_grad():
        ref_out = t_cd(torch.from_numpy(x), torch_cores).numpy()
    import jax.numpy as jnp

    got = np.asarray(ours(jnp.asarray(x), pyramid))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-5)


def test_ctgcn_c_full_parity(ref_modules):
    """Whole-model CTGCN-C forward parity over 3 snapshots."""
    import torch
    import jax.numpy as jnp
    from ctgcn_tpu.nn.core_models import CDN, CTGCN
    import jax

    ref_layers, ref_models = ref_modules
    rng = np.random.RandomState(2)
    n, din, hid, dout, T = 32, 32, 16, 8, 3

    t_model = ref_models.CTGCN(din, hid, dout, trans_num=1, diffusion_num=2,
                               duration=T, rnn_type="GRU", model_type="C",
                               trans_activate_type="L")
    t_model.eval()

    torch_x, torch_adj, pyramids = [], [], []
    xs = []
    for t in range(T):
        tc, pyr = _toy_cores(rng, n)
        torch_adj.append(tc)
        pyramids.append(pyr)
        x = rng.randn(n, din).astype(np.float32)
        xs.append(x)
        torch_x.append(torch.from_numpy(x))
    with torch.no_grad():
        ref_out = t_model(torch_x, torch_adj).numpy()

    # map per-timestep stacks
    mlps, cdns = [], []
    for t in range(T):
        mlps.append(_map_mlp(t_model.mlp_list[t], "L"))
        t_cdn = t_model.duffision_list[t]
        cdns.append(CDN(layers=tuple(
            _map_core_diffusion(cd) for cd in t_cdn.diffusion_list)))
    model = CTGCN(
        mlps=jax.tree.map(lambda *a: jnp.stack(a), *mlps),
        cdns=jax.tree.map(lambda *a: jnp.stack(a), *cdns),
        rnn=_map_gru(t_model.rnn),
        norm=_map_norm(t_model.norm),
        duration=T, model_type="C")

    from ctgcn_tpu.ops.pyramid import stack_pyramids

    got = np.asarray(model(jnp.asarray(np.stack(xs)),
                           stack_pyramids(pyramids)))
    np.testing.assert_allclose(got, ref_out, rtol=5e-4, atol=5e-5)


def test_gcn_parity(ref_modules):
    import torch
    import jax.numpy as jnp
    sys.path.insert(0, REFERENCE)
    try:
        from baseline.gcn import GCN as RefGCN
    finally:
        sys.path.remove(REFERENCE)
    from ctgcn_tpu.nn.gcn import GCN, GraphConvolution
    from ctgcn_tpu.ops.sparse import from_scipy, normalize_scipy_adj
    from ctgcn_tpu.data.loader import stack_graphs
    import scipy.sparse as sp

    rng = np.random.RandomState(3)
    n, din, hid, dout = 40, 12, 16, 8
    t_gcn = RefGCN(din, hid, dout, dropout=0.0)
    t_gcn.eval()
    ours = GCN(
        gc1=GraphConvolution(weight=_to_jnp(t_gcn.gc1.weight),
                             bias=_to_jnp(t_gcn.gc1.bias)),
        gc2=GraphConvolution(weight=_to_jnp(t_gcn.gc2.weight),
                             bias=_to_jnp(t_gcn.gc2.bias)),
        dropout=0.0)

    dense = (rng.rand(n, n) < 0.2).astype(np.float32)
    dense = np.triu(dense, 1)
    dense = dense + dense.T
    adj = normalize_scipy_adj(
        sp.coo_matrix(dense) + sp.eye(n), row_norm=True)
    coo = adj.tocoo()
    t_adj = torch.sparse_coo_tensor(
        torch.from_numpy(np.vstack([coo.row, coo.col])).long(),
        torch.from_numpy(coo.data).float(), (n, n))
    x = rng.randn(n, din).astype(np.float32)
    with torch.no_grad():
        ref_out = t_gcn.gcn(torch.from_numpy(x), t_adj).numpy()
    got = np.asarray(ours.single(jnp.asarray(x), from_scipy(adj)))
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-5)
