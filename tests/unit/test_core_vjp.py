# coding: utf-8
"""core_rnn_sum (hand-written VJP for the masked core-axis RNN tail):
values and gradients must match the autodiff'd scan forms it replaces
(reference layers.py:58-62 is the op being differentiated)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctgcn_tpu.ops.rnn import GRUCell, LSTMCell, core_rnn_sum, rnn_scan


def _ref_sum(cell, acc, valid):
    """The autodiff reference: relu+mask, masked rnn_scan, sum over cores."""
    hx = jax.nn.relu(acc) * valid[:, None, None]
    outs, _ = rnn_scan(cell, hx, mask=valid.astype(bool))
    return outs.sum(axis=0)


_MASKS = [
    np.array([1, 1, 1, 1, 1, 1], np.float32),
    np.array([1, 1, 0, 1, 0, 1], np.float32),
    np.array([0, 1, 1, 0, 0, 0], np.float32),
]


@pytest.mark.parametrize("batch_budget", ["default", "0"])
@pytest.mark.parametrize("mask_i", range(len(_MASKS)))
@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
def test_core_rnn_sum_matches_autodiff(rnn_type, mask_i, batch_budget,
                                       rng, monkeypatch):
    """Both execution modes — K-batched GEMMs (default at toy sizes) and
    the lean per-step recompute (budget 0, the enron-scale mode) — must
    match the autodiff'd scan in values and grads."""
    if batch_budget != "default":
        monkeypatch.setenv("CTGCN_TPU_CVJP_BATCH_BUDGET", batch_budget)
    K, n, d, H = 6, 23, 10, 7
    cell = (GRUCell if rnn_type == "GRU" else LSTMCell).init(
        jax.random.key(5), d, H)
    acc = jnp.asarray(rng.standard_normal((K, n, d)), jnp.float32)
    valid = jnp.asarray(_MASKS[mask_i])

    got = core_rnn_sum(cell, acc, valid)
    ref = _ref_sum(cell, acc, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # grads w.r.t. cell params AND acc, through a nonlinear head so the
    # output cotangent is non-uniform
    def loss_got(cell, acc):
        return jnp.sum(jnp.tanh(core_rnn_sum(cell, acc, valid)) ** 2)

    def loss_ref(cell, acc):
        return jnp.sum(jnp.tanh(_ref_sum(cell, acc, valid)) ** 2)

    gg = jax.grad(loss_got, argnums=(0, 1))(cell, acc)
    gr = jax.grad(loss_ref, argnums=(0, 1))(cell, acc)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5), gg, gr)


@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
def test_core_rnn_sum_vmap(rnn_type, rng):
    """The T-batched window tail vmaps core_rnn_sum over time with
    per-timestep distinct parameters (CTGCN) — values and grads must
    match the per-t loop."""
    T, K, n, d, H = 3, 5, 17, 8, 6
    cls = GRUCell if rnn_type == "GRU" else LSTMCell
    cells = [cls.init(jax.random.key(t), d, H) for t in range(T)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cells)
    acc = jnp.asarray(rng.standard_normal((T, K, n, d)), jnp.float32)
    valid = jnp.asarray(
        (rng.random((T, K)) < 0.7).astype(np.float32))

    def batched(stacked, acc):
        return jax.vmap(core_rnn_sum)(stacked, acc, valid)

    def looped(stacked, acc):
        outs = []
        for t in range(T):
            c = jax.tree.map(lambda l: l[t], stacked)
            outs.append(_ref_sum(c, acc[t], valid[t]))
        return jnp.stack(outs)

    np.testing.assert_allclose(np.asarray(batched(stacked, acc)),
                               np.asarray(looped(stacked, acc)),
                               rtol=1e-5, atol=1e-5)
    gb = jax.grad(lambda s, a: jnp.sum(jnp.tanh(batched(s, a))),
                  argnums=(0, 1))(stacked, acc)
    gl = jax.grad(lambda s, a: jnp.sum(jnp.tanh(looped(s, a))),
                  argnums=(0, 1))(stacked, acc)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5), gb, gl)


def test_core_rnn_sum_under_remat(rng):
    """jax.checkpoint around a function containing core_rnn_sum (the
    over-budget lax.map window path wraps per-snapshot forwards in full
    remat) must produce identical grads."""
    K, n, d, H = 5, 13, 6, 4
    cell = GRUCell.init(jax.random.key(9), d, H)
    acc = jnp.asarray(rng.standard_normal((K, n, d)), jnp.float32)
    valid = jnp.ones((K,), jnp.float32)

    def f(cell, acc):
        return jnp.sum(core_rnn_sum(cell, acc, valid) ** 2)

    g_plain = jax.grad(f, argnums=(0, 1))(cell, acc)
    g_remat = jax.grad(jax.checkpoint(f), argnums=(0, 1))(cell, acc)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        g_plain, g_remat)


def test_core_rnn_sum_bf16_storage(rng):
    """bf16 acc (the Enron configuration) stores bf16 carries; values and
    grads must track the f32 path within bf16 tolerance."""
    K, n, d, H = 6, 19, 8, 5
    cell = GRUCell.init(jax.random.key(2), d, H)
    acc32 = jnp.asarray(rng.standard_normal((K, n, d)), jnp.float32)
    valid = jnp.asarray([1, 1, 0, 1, 1, 0], jnp.float32)

    out32 = core_rnn_sum(cell, acc32, valid)
    out16 = core_rnn_sum(cell, acc32.astype(jnp.bfloat16), valid)
    assert out16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.05, atol=0.05)

    g32 = jax.grad(lambda a: jnp.sum(core_rnn_sum(cell, a, valid) ** 2))(
        acc32)
    g16 = jax.grad(
        lambda a: jnp.sum(
            core_rnn_sum(cell, a.astype(jnp.bfloat16), valid) ** 2))(acc32)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               rtol=0.2, atol=0.1)


def test_layer_remat_matches_plain(rng, monkeypatch):
    """CTGCN_TPU_LAYER_REMAT=1 (the enron memory knob) must not change
    values or grads — only the backward's rematerialization schedule."""
    import scipy.sparse as sp
    from ctgcn_tpu.nn import CTGCN
    from ctgcn_tpu.ops.pyramid import build_core_pyramid, stack_pyramids

    N, T = 30, 2
    pyrs = []
    for _ in range(T):
        dmat = (rng.random((N, N)) < 0.3).astype(np.float32)
        dmat = np.triu(dmat, 1)
        A = sp.csr_matrix(dmat + dmat.T)
        deg = np.asarray(A.sum(1)).flatten()
        mats = []
        for k in [2, 1]:
            keep = (deg >= k).astype(np.float32)
            mats.append(sp.csr_matrix(
                A.multiply(keep[:, None]).multiply(keep[None, :])))
        pyrs.append(build_core_pyramid(mats, N, num_slots=3, pad_to=512))
    pyr = stack_pyramids(pyrs)
    model = CTGCN.init(jax.random.key(1), input_dim=N, hidden_dim=10,
                       output_dim=6, trans_num=1, diffusion_num=2,
                       duration=T)

    def loss(m):
        return jnp.sum(jnp.tanh(m(None, pyr)) ** 2)

    out0, g0 = model(None, pyr), jax.grad(loss)(model)
    monkeypatch.setenv("CTGCN_TPU_LAYER_REMAT", "1")
    out1, g1 = model(None, pyr), jax.grad(loss)(model)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=3e-5, atol=2e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=2e-6), g1, g0)


def test_tail_cvjp_vs_legacy_paths(rng, monkeypatch):
    """CTGCN-C end-to-end: the default cvjp tail must match the legacy
    autodiff tails (batched rnn_scan AND the budget-0 scan) in both the
    forward and the training gradient."""
    import scipy.sparse as sp
    from ctgcn_tpu.nn import CTGCN
    from ctgcn_tpu.ops.pyramid import build_core_pyramid, stack_pyramids

    N, T = 40, 3
    pyrs = []
    for _ in range(T):
        dmat = (rng.random((N, N)) < 0.25).astype(np.float32)
        dmat = np.triu(dmat, 1)
        A = sp.csr_matrix(dmat + dmat.T)
        deg = np.asarray(A.sum(1)).flatten()
        mats = []
        for k in [2, 1]:
            keep = (deg >= k).astype(np.float32)
            mats.append(sp.csr_matrix(
                A.multiply(keep[:, None]).multiply(keep[None, :])))
        pyrs.append(build_core_pyramid(mats, N, num_slots=3, pad_to=1024))
    pyr = stack_pyramids(pyrs)
    model = CTGCN.init(jax.random.key(0), input_dim=pyr.n_nodes,
                       hidden_dim=12, output_dim=8, trans_num=1,
                       diffusion_num=2, duration=T)

    def loss(m):
        return jnp.sum(jnp.tanh(m(None, pyr)) ** 2)

    out_cvjp = model(None, pyr)
    g_cvjp = jax.grad(loss)(model)
    monkeypatch.setenv("CTGCN_TPU_CORE_VJP", "0")
    out_ref = model(None, pyr)
    g_ref = jax.grad(loss)(model)
    np.testing.assert_allclose(np.asarray(out_cvjp), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=2e-5),
        g_cvjp, g_ref)
    # and vs the budget-0 (checkpointed-scan) legacy tail
    monkeypatch.setenv("CTGCN_TPU_CORE_RNN_BUDGET", "0")
    g_scan = jax.grad(loss)(model)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=2e-5),
        g_cvjp, g_scan)
