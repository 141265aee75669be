# coding: utf-8
"""Activation-parity tests for the remaining model zoo vs the torch
reference (VERDICT r1 weak #5): GAT, SAGE, GIN, GCRN, EvolveGCN, VGRNN,
PGNN, DynAE/DynRNN — each with mapped weights, deterministic forward
(dropout 0, eval/eval-equivalent mode), allclose.

Shares the mapping helpers of test_reference_parity.py.
"""
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference tree not mounted")

from tests.unit.test_reference_parity import (  # noqa: E402
    _map_gru, _map_linear, _map_norm, _to_jnp, ref_modules,  # noqa: F401
)


@pytest.fixture(scope="module")
def ref_path():
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001
    for name in ("torch_geometric", "torch_scatter"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    sys.path.insert(0, REFERENCE)
    yield REFERENCE
    sys.path.remove(REFERENCE)


def _toy_adj(rng, n, p=0.15):
    import scipy.sparse as sp

    dense = (rng.rand(n, n) < p).astype(np.float32)
    dense = np.triu(dense, 1)
    dense = dense + dense.T
    return sp.coo_matrix(dense)


def _torch_sparse(adj):
    import torch

    coo = adj.tocoo()
    return torch.sparse_coo_tensor(
        torch.from_numpy(np.vstack([coo.row, coo.col])).long(),
        torch.from_numpy(coo.data).float(), adj.shape)


# ---------------------------------------------------------------------------
# GAT — exp(-leakyrelu) attention quirk (reference baseline/gat.py:83)
# ---------------------------------------------------------------------------

def test_gat_parity(ref_path):
    import torch
    import jax.numpy as jnp
    from baseline.gat import GAT as RefGAT
    from ctgcn_tpu.nn.gat import GAT, SpGraphAttentionLayer
    from ctgcn_tpu.ops.sparse import from_scipy

    rng = np.random.RandomState(0)
    n, din, hid, dout, heads = 36, 10, 8, 6, 3
    t_gat = RefGAT(din, hid, dout, dropout=0.0, alpha=0.2, head_num=heads)
    t_gat.eval()

    def map_att(t_att):
        return SpGraphAttentionLayer(
            W=_to_jnp(t_att.W), a=_to_jnp(t_att.a)[0],
            alpha=t_att.alpha, concat=t_att.concat, dropout=0.0)

    ours = GAT(attentions=tuple(map_att(a) for a in t_gat.attentions),
               out_att=map_att(t_gat.out_att), dropout=0.0,
               learning_type="U-neg")
    adj = _toy_adj(rng, n)
    x = rng.randn(n, din).astype(np.float32)
    with torch.no_grad():
        ref_out = t_gat.gat(torch.from_numpy(x), _torch_sparse(adj)).numpy()
    got = np.asarray(ours.single(jnp.asarray(x), from_scipy(adj)))
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# SAGE — sum / average / max pooling paths (reference baseline/sage.py:18-162)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pooling", ["sum", "average", "max"])
def test_sage_parity(ref_path, pooling):
    import torch
    import jax
    import jax.numpy as jnp
    from baseline.sage import SAGE as RefSAGE
    from ctgcn_tpu.nn.sage import SAGE, SAGELayer
    from ctgcn_tpu.nn.layers import Linear
    from ctgcn_tpu.ops.neighbors import neighbor_table_from_scipy

    rng = np.random.RandomState(1)
    n, din, hid, dout = 30, 8, 12, 6
    # num_sample > max degree → the reference takes ALL neighbors
    # (random.sample only fires at len >= num_sample) and the comparison
    # is deterministic; ours uses the num_sample=None all-neighbors path
    t_sage = RefSAGE(din, hid, dout, num_sample=n + 1,
                     pooling_type=pooling, gcn=False, dropout=0.0)
    t_sage.eval()

    def map_layer(t_l):
        return SAGELayer(linear=_map_linear(t_l.linear), num_sample=None,
                         pooling_type=pooling, gcn=False)

    ours = SAGE(linear=_map_linear(t_sage.linear),
                sage1=map_layer(t_sage.sage1),
                sage2=map_layer(t_sage.sage2), dropout=0.0)
    adj = _toy_adj(rng, n, p=0.2)
    x = rng.randn(n, din).astype(np.float32)
    with torch.no_grad():
        ref_out = t_sage.sage(torch.from_numpy(x),
                              _torch_sparse(adj)).numpy()
    nbr, deg = neighbor_table_from_scipy([adj])
    got = np.asarray(ours.single(jnp.asarray(x), jnp.asarray(nbr[0]),
                                 jnp.asarray(deg[0]),
                                 jax.random.key(0)))
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# GIN — BatchNorm'd MLPs, learn_eps on/off (reference baseline/gin.py:16-214)
# ---------------------------------------------------------------------------

# learn_eps=True with sum/average CRASHES in the reference itself:
# __preprocess_neighbors_sumavepool only assigns Adj_block_idx inside the
# `if not self.learn_eps` branch (gin.py:125-132 UnboundLocalError), so the
# reference-runnable surface is eps-off sum/avg and max with either eps mode.
@pytest.mark.parametrize("learn_eps,pooling", [(False, "sum"),
                                               (False, "average"),
                                               (True, "max"),
                                               (False, "max")])
def test_gin_parity(ref_path, learn_eps, pooling):
    import torch
    import scipy.sparse as sp
    import jax.numpy as jnp
    from baseline.gin import GIN as RefGIN
    from ctgcn_tpu.nn.gin import GIN, GinMLP, BatchNorm
    from ctgcn_tpu.ops.sparse import from_scipy
    from ctgcn_tpu.ops.neighbors import neighbor_table_from_scipy

    rng = np.random.RandomState(2)
    n, din, hid, dout = 32, 9, 14, 7
    t_gin = RefGIN(din, hid, dout, layer_num=2, mlp_layer_num=2,
                   learn_eps=learn_eps, neighbor_pooling_type=pooling,
                   dropout=0.0)
    # train() so torch BatchNorm uses batch statistics — matching this
    # implementation's always-batch-stats semantics (nn/gin.py:9-13);
    # dropout=0 keeps train mode deterministic
    t_gin.train()
    # give eps a nonzero value so the (1+eps)·h term is actually exercised
    with torch.no_grad():
        t_gin.eps += torch.tensor([0.3, -0.2])

    def map_bn(t_bn):
        return BatchNorm(scale=_to_jnp(t_bn.weight),
                         offset=_to_jnp(t_bn.bias))

    def map_gin_mlp(t_mlp):
        if t_mlp.linear_or_not:
            return GinMLP(layers=(_map_linear(t_mlp.linear),), norms=())
        return GinMLP(layers=tuple(_map_linear(l) for l in t_mlp.linears),
                      norms=tuple(map_bn(b) for b in t_mlp.batch_norms))

    ours = GIN(linear=_map_linear(t_gin.linear),
               mlps=tuple(map_gin_mlp(m) for m in t_gin.mlps),
               norms=tuple(map_bn(b) for b in t_gin.batch_norms),
               eps=_to_jnp(t_gin.eps), learn_eps=learn_eps,
               pooling_type=pooling, dropout=0.0)

    adj = _toy_adj(rng, n, p=0.2)
    x = rng.randn(n, din).astype(np.float32)
    with torch.no_grad():
        ref_out = t_gin.gin(torch.from_numpy(x),
                            _torch_sparse(adj)).numpy()
    # the driver adds +I for the not-learn_eps sum/avg path
    # (reference gin.py:120-133 builds the self-loop block itself)
    my_adj = adj if (learn_eps or pooling == "max") else \
        (adj + sp.eye(n)).tocoo()
    nbr, deg = neighbor_table_from_scipy([adj])
    got = np.asarray(ours.single(jnp.asarray(x), from_scipy(my_adj),
                                 jnp.asarray(nbr[0]), jnp.asarray(deg[0])))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# GCRN — per-t GCNs + time GRU + LayerNorm (reference baseline/gcrn.py:15-62)
# ---------------------------------------------------------------------------

def test_gcrn_parity(ref_path):
    import torch
    import jax
    import jax.numpy as jnp
    from baseline.gcrn import GCRN as RefGCRN
    from ctgcn_tpu.nn.gcn import GCN, GCRN, GraphConvolution
    from ctgcn_tpu.ops.sparse import from_scipy, normalize_scipy_adj
    from ctgcn_tpu.data.loader import stack_graphs
    import scipy.sparse as sp

    rng = np.random.RandomState(3)
    n, din, hid, dout, T = 28, 10, 12, 8, 3
    t_model = RefGCRN(din, din, hid, dout, dropout=0.0, duration=T,
                      rnn_type="GRU")
    t_model.eval()

    def map_gcn(t_gcn):
        return GCN(
            gc1=GraphConvolution(weight=_to_jnp(t_gcn.gc1.weight),
                                 bias=_to_jnp(t_gcn.gc1.bias)),
            gc2=GraphConvolution(weight=_to_jnp(t_gcn.gc2.weight),
                                 bias=_to_jnp(t_gcn.gc2.bias)),
            dropout=0.0)

    gcns = jax.tree.map(lambda *a: jnp.stack(a),
                        *[map_gcn(g) for g in t_model.gcn_list])
    ours = GCRN(gcns=gcns, rnn=_map_gru(t_model.rnn),
                norm=_map_norm(t_model.norm), duration=T)

    xs, t_x, t_adj, graphs = [], [], [], []
    for t in range(T):
        adj = normalize_scipy_adj(
            _toy_adj(rng, n, p=0.2).tocsr() + sp.eye(n), row_norm=True)
        x = rng.randn(n, din).astype(np.float32)
        xs.append(x)
        t_x.append(torch.from_numpy(x))
        t_adj.append(_torch_sparse(adj))
        graphs.append(from_scipy(adj, pad_to=512))
    with torch.no_grad():
        ref_out = t_model(t_x, t_adj).numpy()
    got = np.asarray(ours(jnp.asarray(np.stack(xs)), stack_graphs(graphs)))
    np.testing.assert_allclose(got, ref_out, rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# EvolveGCN — weight-GRU + eval-mode rrelu (reference baseline/egcn.py:17-158)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("egcn_type", ["EGCNO", "EGCNH"])
def test_evolvegcn_parity(ref_path, egcn_type):
    import torch
    import jax.numpy as jnp
    from baseline.egcn import EvolveGCN as RefEGCN
    from ctgcn_tpu.nn.egcn import (
        EvolveGCN, GRCU, MatGRUCell, MatGRUGate, TopK,
    )
    from ctgcn_tpu.ops.sparse import from_scipy, normalize_scipy_adj
    from ctgcn_tpu.data.loader import stack_graphs
    import scipy.sparse as sp

    rng = np.random.RandomState(4)
    n, din, hid, dout, T = 26, 10, 12, 6, 3
    t_model = RefEGCN(din, hid, dout, egcn_type=egcn_type)
    t_model.eval()  # F.rrelu eval mode == fixed (lo+hi)/2 slope

    def map_gate(t_g):
        return MatGRUGate(W=_to_jnp(t_g.W), U=_to_jnp(t_g.U),
                          bias=_to_jnp(t_g.bias))

    def map_grcu(t_u):
        cell = t_u.evolve_weights
        return GRCU(
            evolve_weights=MatGRUCell(
                update=map_gate(cell.update), reset=map_gate(cell.reset),
                htilda=map_gate(cell.htilda),
                choose_topk=TopK(scorer=_to_jnp(cell.choose_topk.scorer),
                                 k=cell.choose_topk.k),
                egcn_type=egcn_type),
            GCN_init_weights=_to_jnp(t_u.GCN_init_weights),
            egcn_type=egcn_type)

    ours = EvolveGCN(grcu1=map_grcu(t_model.GRCU_layers[0]),
                     grcu2=map_grcu(t_model.GRCU_layers[1]))

    xs, t_x, t_adj, graphs = [], [], [], []
    for t in range(T):
        adj = normalize_scipy_adj(_toy_adj(rng, n, p=0.2).tocsr()
                                  + sp.eye(n))
        x = rng.randn(n, din).astype(np.float32)
        xs.append(x)
        t_x.append(torch.from_numpy(x))
        t_adj.append(_torch_sparse(adj))
        graphs.append(from_scipy(adj, pad_to=512))
    with torch.no_grad():
        ref_list = t_model(t_x, t_adj)
        ref_out = np.stack([r.numpy() for r in ref_list])
    got = np.asarray(ours(jnp.asarray(np.stack(xs)), stack_graphs(graphs)))
    np.testing.assert_allclose(got, ref_out, rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# VGRNN — graph-GRU VAE, full T=3 recurrence with eps→0 determinization
# (reference baseline/vgrnn.py:417-533; GCNConv +2I renorm at 179-192)
# ---------------------------------------------------------------------------

@pytest.fixture()
def torch_scatter_shims():
    """Functional shims for the torch_scatter / torch_geometric surface the
    reference VGRNN touches (the real packages are not installed)."""
    import torch

    def scatter_add(src, index, dim=0, out=None, dim_size=None):
        assert dim == 0 and out is None
        size = dim_size if dim_size is not None else int(index.max()) + 1
        res = torch.zeros((size,) + tuple(src.shape[1:]), dtype=src.dtype)
        return res.index_add_(0, index, src)

    def scatter_mean(src, index, dim=0, out=None, dim_size=None):
        s = scatter_add(src, index, dim, out, dim_size)
        cnt = scatter_add(torch.ones_like(src[..., :1] if src.dim() > 1
                                          else src), index, dim, None,
                          dim_size)
        return s / cnt.clamp(min=1)

    def scatter_max(src, index, dim=0, out=None, dim_size=None):
        size = dim_size if dim_size is not None else int(index.max()) + 1
        res = torch.full((size,) + tuple(src.shape[1:]), -1e38,
                         dtype=src.dtype)
        res = res.scatter_reduce(0, index.view(-1, *([1] * (src.dim() - 1)))
                                 .expand_as(src), src, reduce="amax")
        return res, None

    ts = sys.modules["torch_scatter"]
    ts.scatter_add = scatter_add
    ts.scatter_mean = scatter_mean
    ts.scatter_max = scatter_max

    tg = sys.modules["torch_geometric"]
    utils = types.ModuleType("torch_geometric.utils")

    def add_self_loops(edge_index, num_nodes=None):
        loop = torch.arange(num_nodes, dtype=edge_index.dtype)
        return torch.cat([edge_index, torch.stack([loop, loop])], dim=1), \
            None

    def remove_self_loops(edge_index, edge_attr=None):
        mask = edge_index[0] != edge_index[1]
        return edge_index[:, mask], edge_attr

    utils.add_self_loops = add_self_loops
    utils.remove_self_loops = remove_self_loops
    tg.utils = utils
    sys.modules["torch_geometric.utils"] = utils
    yield


def _vgrnn_mapped_pair(rng, n, hid, dout, T):
    """Torch VGRNN + weight-mapped jax VGRNN + a shared T-snapshot window.

    Returns (t_model, ours, xs, t_x, t_edges, graphs, sp_adjs)."""
    import torch
    import scipy.sparse as ssp
    from baseline.vgrnn import VGRNN as RefVGRNN
    from ctgcn_tpu.nn.vgrnn import VGRNN, GraphConv, GraphGRU
    from ctgcn_tpu.ops.sparse import from_scipy

    din = n
    t_model = RefVGRNN(din, hid, dout, rnn_layer_num=1, conv_type="GCN",
                       bias=True)

    def map_lin(seq):
        return _map_linear(seq[0] if hasattr(seq, "__getitem__") else seq)

    def map_conv(t_c):
        return GraphConv(weight=_to_jnp(t_c.weight),
                         bias=_to_jnp(t_c.bias)
                         if t_c.bias is not None else None,
                         conv_type="GCN")

    t_rnn = t_model.rnn
    ours = VGRNN(
        phi_x=map_lin(t_model.phi_x), phi_z=map_lin(t_model.phi_z),
        enc=map_conv(t_model.enc), enc_mean=map_conv(t_model.enc_mean),
        enc_std=map_conv(t_model.enc_std),
        prior=map_lin(t_model.prior),
        prior_mean=map_lin(t_model.prior_mean),
        prior_std=map_lin(t_model.prior_std),
        rnn=GraphGRU(
            xz=tuple(map_conv(c) for c in t_rnn.weight_xz),
            hz=tuple(map_conv(c) for c in t_rnn.weight_hz),
            xr=tuple(map_conv(c) for c in t_rnn.weight_xr),
            hr=tuple(map_conv(c) for c in t_rnn.weight_hr),
            xh=tuple(map_conv(c) for c in t_rnn.weight_xh),
            hh=tuple(map_conv(c) for c in t_rnn.weight_hh)),
        hidden_dim=hid, rnn_layer_num=1, conv_type="GCN")

    xs, t_x, t_edges, graphs, sp_adjs = [], [], [], [], []
    for t in range(T):
        adj = _toy_adj(rng, n, p=0.2)
        sp_adjs.append(adj)
        x = rng.randn(n, din).astype(np.float32)
        xs.append(x)
        t_x.append(torch.from_numpy(x))
        coo = adj.tocoo()
        t_edges.append(torch.from_numpy(
            np.vstack([coo.row, coo.col])).long())
        # the driver's precomputed D^-1/2 (A_bin + 2I) D^-1/2 (improved
        # renormalization the reference conv rebuilds per call)
        b = (adj.tocsr() != 0).astype(np.float64)
        M = b + 2.0 * ssp.eye(n)
        d = np.asarray(M.sum(axis=1)).flatten()
        dinv = np.where(d > 0, d ** -0.5, 0.0)
        D = ssp.diags(dinv)
        graphs.append(from_scipy((D @ M @ D).tocoo(), pad_to=1024))
    return t_model, ours, xs, t_x, t_edges, graphs, sp_adjs


def test_vgrnn_parity(ref_path, torch_scatter_shims, monkeypatch):
    import torch
    import jax
    import jax.numpy as jnp
    from ctgcn_tpu.data.loader import stack_graphs

    rng = np.random.RandomState(5)
    # input_dim == n: the reference sizes its hidden state with x.size(1)
    # (vgrnn.py:490 — the feature dim, not the node count), which only
    # works because its driver feeds N×N identity features
    n, hid, dout, T = 24, 10, 6, 3
    t_model, ours, xs, t_x, t_edges, graphs, _ = _vgrnn_mapped_pair(
        rng, n, hid, dout, T)
    t_model.eval()
    # determinize the reparameterization on both sides: eps == 0 → z = mean
    monkeypatch.setattr(torch, "randn",
                        lambda *s, **kw: torch.zeros(*s))
    monkeypatch.setattr(jax.random, "normal",
                        lambda key, shape, *a, **kw: jnp.zeros(shape))
    with torch.no_grad():
        emb_list, h_ref, loss_data = t_model(t_x, t_edges)
    embs, h, (em, es, pm, ps, dec) = ours(jnp.asarray(np.stack(xs)),
                                          stack_graphs(graphs))
    np.testing.assert_allclose(
        np.asarray(embs), np.stack([e.numpy() for e in emb_list]),
        rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(h), h_ref.numpy(), rtol=5e-4,
                               atol=5e-5)
    for mine, theirs in [(es, loss_data[1]), (pm, loss_data[2]),
                         (ps, loss_data[3]), (dec, loss_data[4])]:
        np.testing.assert_allclose(
            np.asarray(mine), np.stack([t.numpy() for t in theirs]),
            rtol=5e-4, atol=5e-5)


def test_vgrnn_hx_carry_training_parity(ref_path, torch_scatter_shims,
                                        monkeypatch):
    """Multi-batch VGRNN semantics vs the torch trainer (VERDICT r3 #7).

    The reference carries ``hx`` across the batch loop within an epoch
    (embedding.py:342-346), resets it at each epoch start, and detaches it
    at each re-entry (``Variable(hx)`` of a non-leaf tensor drops grad_fn).
    This runs 2 epochs × 2 batches of the reference unsupervised loop
    (embedding.py:340-355: per-batch backward accumulation + one Adam step
    per epoch, VAELoss from metrics.py) against our stateful
    ``_multi_epoch_step`` and compares per-batch losses and the final
    forward."""
    import torch
    import jax
    import jax.numpy as jnp
    from metrics import VAELoss as RefVAELoss
    from ctgcn_tpu.data.loader import stack_graphs
    from ctgcn_tpu.training.driver import (
        _vae_loss_fn_stateful, _vgrnn_dense_bank, _vgrnn_state_init,
        make_forward)
    from ctgcn_tpu.training.engine import make_optimizer

    rng = np.random.RandomState(11)
    n, hid, dout, T = 24, 10, 6, 3
    lr, eps = 1e-2, 1e-10
    t_model, ours, xs, t_x, t_edges, graphs, sp_adjs = _vgrnn_mapped_pair(
        rng, n, hid, dout, T)
    # _to_jnp maps weights zero-copy (jnp.asarray of .numpy() aliases torch
    # memory on CPU): torch Adam's in-place step() would silently mutate the
    # mapped jax model — deep-copy before the torch side trains
    ours = jax.tree.map(jnp.array, ours)
    monkeypatch.setattr(torch, "randn", lambda *s, **kw: torch.zeros(*s))
    monkeypatch.setattr(jax.random, "normal",
                        lambda key, shape, *a, **kw: jnp.zeros(shape))

    # --- torch side: the reference unsupervised loop, 2 epochs × 2 batches
    t_adjs = [_torch_sparse(a) for a in sp_adjs]
    loss_model = RefVAELoss(eps=eps)
    opt = torch.optim.Adam(t_model.parameters(), lr=lr)
    t_model.train()
    t_losses = []
    for _ in range(2):
        hx = None
        for j in range(2):
            _, hx, loss_data = t_model(t_x, t_edges, hx)
            loss = loss_model(loss_data + [t_adjs])
            loss.backward()
            if j == 1:  # gradient accumulation, one step per epoch
                opt.step()
                t_model.zero_grad()
            t_losses.append(loss.item())

    # --- our side: the engine's stateful multi-epoch step
    from ctgcn_tpu.training.engine import _multi_epoch_step

    fwd = make_forward("VGRNN")
    data = {"xs": jnp.asarray(np.stack(xs)),
            "vgrnn_adjs": stack_graphs(graphs)}
    # dense VAE target from the RAW adjacency bank (driver convention)
    from ctgcn_tpu.ops.sparse import from_scipy
    raw = stack_graphs([from_scipy(a.tocoo(), pad_to=1024)
                        for a in sp_adjs])
    data["vae_adj_dense"] = _vgrnn_dense_bank(raw)
    loss_fn = _vae_loss_fn_stateful(fwd, eps)
    step = _multi_epoch_step(loss_fn, lr, 0.0, _vgrnn_state_init())
    opt_state = make_optimizer(lr, 0.0).init(ours)
    B = n // 2
    batches = jnp.tile(jnp.arange(n).reshape(1, 2, B), (2, 1, 1))
    masks = jnp.ones((2, 2, B), bool)
    keys = jax.random.split(jax.random.key(0), 2)
    ours2, _, losses = step(ours, opt_state, data, batches, masks, keys)

    # per-epoch loss = sum of the two batch losses; batch 1 consumed the
    # hx carried from batch 0, so a wrong carry shows up in epoch 0 already
    np.testing.assert_allclose(
        np.asarray(losses),
        [t_losses[0] + t_losses[1], t_losses[2] + t_losses[3]],
        rtol=2e-3)

    # final models agree: deterministic forward after the two Adam steps
    t_model.eval()
    with torch.no_grad():
        emb_list, h_ref, _ = t_model(t_x, t_edges)
    embs, h, _ = ours2(data["xs"], data["vgrnn_adjs"])
    np.testing.assert_allclose(
        np.asarray(embs), np.stack([e.numpy() for e in emb_list]),
        rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(h), h_ref.numpy(), rtol=5e-3,
                               atol=5e-4)


# ---------------------------------------------------------------------------
# PGNN — anchor-set message passing with fixed anchors
# (reference baseline/pgnn.py:145-267)
# ---------------------------------------------------------------------------

def test_pgnn_parity(ref_path):
    import torch
    import jax.numpy as jnp
    from baseline.pgnn import PGNN as RefPGNN
    from ctgcn_tpu.nn.pgnn import PGNN, PGNNLayer, Nonlinear

    rng = np.random.RandomState(6)
    n, din, feat, hid, dout, A = 30, 12, 8, 10, 6, 7
    t_model = RefPGNN(din, feat, hid, dout, feature_pre=True, layer_num=2,
                      dropout=0.0)
    t_model.eval()

    def map_layer(t_l):
        return PGNNLayer(
            dist_compute=Nonlinear(
                linear1=_map_linear(t_l.dist_compute.linear1),
                linear2=_map_linear(t_l.dist_compute.linear2)),
            linear_hidden=_map_linear(t_l.linear_hidden),
            linear_out_position=_map_linear(t_l.linear_out_position))

    ours = PGNN(linear_pre=_map_linear(t_model.linear_pre),
                conv_first=map_layer(t_model.conv_first),
                conv_hidden=(), conv_out=map_layer(t_model.conv_out),
                layer_num=2, dropout=0.0)

    x = rng.randn(n, din).astype(np.float32)
    dists_max = rng.rand(n, A).astype(np.float32)
    dists_argmax = rng.randint(0, n, (n, A))
    with torch.no_grad():
        ref_out = t_model.pgnn(torch.from_numpy(x),
                               torch.from_numpy(dists_max),
                               torch.from_numpy(dists_argmax)).numpy()
    got = np.asarray(ours.single(jnp.asarray(x), jnp.asarray(dists_max),
                                 jnp.asarray(dists_argmax)))
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# DynAE / DynRNN — autoencoder cells (reference dynAE.py:52-76, dynRNN.py)
# ---------------------------------------------------------------------------

def test_dynae_parity(ref_path):
    import torch
    import jax.numpy as jnp
    from baseline.dynAE import DynAE as RefDynAE
    from ctgcn_tpu.nn.dynae import DynAE, ReluMLP

    rng = np.random.RandomState(7)
    n, dout, lb = 40, 12, 2
    t_model = RefDynAE(n, dout, look_back=lb, n_units=[24, 16])
    t_model.eval()

    def map_mlp(t_mlp):
        return ReluMLP(layers=tuple(_map_linear(l)
                                    for l in t_mlp.layer_list))

    ours = DynAE(encoder=map_mlp(t_model.encoder),
                 decoder=map_mlp(t_model.decoder), look_back=lb)
    x = rng.rand(5, n * lb).astype(np.float32)
    with torch.no_grad():
        hx_ref, pred_ref = t_model(torch.from_numpy(x))
    hx, pred = ours(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(hx), hx_ref.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred), pred_ref.numpy(),
                               rtol=1e-5, atol=1e-6)


def _map_lstm(t_lstm):
    from ctgcn_tpu.ops.rnn import LSTMCell

    return LSTMCell(w_ih=_to_jnp(t_lstm.weight_ih_l0),
                    w_hh=_to_jnp(t_lstm.weight_hh_l0),
                    b_ih=_to_jnp(t_lstm.bias_ih_l0),
                    b_hh=_to_jnp(t_lstm.bias_hh_l0))


def test_dynrnn_parity(ref_path):
    import torch
    import jax.numpy as jnp
    from baseline.dynRNN import DynRNN as RefDynRNN
    from ctgcn_tpu.nn.dynae import DynRNN, MLLSTM

    rng = np.random.RandomState(8)
    n, dout, lb = 20, 8, 3
    t_model = RefDynRNN(n, dout, look_back=lb, n_units=[16, 12])
    t_model.eval()

    def map_mllstm(t_m):
        return MLLSTM(cells=tuple(_map_lstm(l) for l in t_m.layer_list))

    ours = DynRNN(encoder=map_mllstm(t_model.encoder),
                  decoder=map_mllstm(t_model.decoder), look_back=lb)
    x = rng.rand(4, lb, n).astype(np.float32)
    with torch.no_grad():
        hx_ref, pred_ref = t_model(torch.from_numpy(x))
    hx, pred = ours(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(hx), hx_ref.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pred), pred_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
