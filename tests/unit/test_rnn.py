# coding: utf-8
"""GRU/LSTM cell parity vs torch.nn.GRU / torch.nn.LSTM (cpu)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ctgcn_tpu.ops.rnn import GRUCell, LSTMCell, rnn_scan


def _copy_torch_gru(cell: GRUCell, t_rnn: torch.nn.GRU) -> GRUCell:
    return GRUCell(
        w_ih=jnp.asarray(t_rnn.weight_ih_l0.detach().numpy()),
        w_hh=jnp.asarray(t_rnn.weight_hh_l0.detach().numpy()),
        b_ih=jnp.asarray(t_rnn.bias_ih_l0.detach().numpy()),
        b_hh=jnp.asarray(t_rnn.bias_hh_l0.detach().numpy()),
    )


def _copy_torch_lstm(cell: LSTMCell, t_rnn: torch.nn.LSTM) -> LSTMCell:
    return LSTMCell(
        w_ih=jnp.asarray(t_rnn.weight_ih_l0.detach().numpy()),
        w_hh=jnp.asarray(t_rnn.weight_hh_l0.detach().numpy()),
        b_ih=jnp.asarray(t_rnn.bias_ih_l0.detach().numpy()),
        b_hh=jnp.asarray(t_rnn.bias_hh_l0.detach().numpy()),
    )


@pytest.mark.parametrize("seq_len,batch,din,dh", [(5, 7, 11, 13), (1, 3, 4, 4)])
def test_gru_matches_torch(seq_len, batch, din, dh, rng):
    torch.manual_seed(0)
    t_rnn = torch.nn.GRU(din, dh, num_layers=1, bias=True, batch_first=True)
    cell = _copy_torch_gru(GRUCell.init(jax.random.key(0), din, dh), t_rnn)

    x = rng.randn(batch, seq_len, din).astype(np.float32)
    with torch.no_grad():
        t_out, _ = t_rnn(torch.from_numpy(x))  # [B, T, H]
    outs, _ = rnn_scan(cell, jnp.asarray(x.transpose(1, 0, 2)))  # [T, B, H]
    np.testing.assert_allclose(np.asarray(outs).transpose(1, 0, 2),
                               t_out.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seq_len,batch,din,dh", [(6, 4, 9, 8)])
def test_lstm_matches_torch(seq_len, batch, din, dh, rng):
    torch.manual_seed(1)
    t_rnn = torch.nn.LSTM(din, dh, num_layers=1, bias=True, batch_first=True)
    cell = _copy_torch_lstm(LSTMCell.init(jax.random.key(0), din, dh), t_rnn)

    x = rng.randn(batch, seq_len, din).astype(np.float32)
    with torch.no_grad():
        t_out, _ = t_rnn(torch.from_numpy(x))
    outs, _ = rnn_scan(cell, jnp.asarray(x.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(outs).transpose(1, 0, 2),
                               t_out.numpy(), rtol=1e-5, atol=1e-5)


def test_masked_scan_equals_packed_sequence(rng):
    """A masked step must behave exactly like removing the step (packed-seq
    semantics used for the core pyramid's delta-skip)."""
    din, dh, batch = 6, 5, 3
    cell = GRUCell.init(jax.random.key(42), din, dh)

    xs_full = rng.randn(6, batch, din).astype(np.float32)
    mask = np.array([True, False, True, True, False, True])
    xs_packed = xs_full[mask]

    outs_masked, carry_masked = rnn_scan(cell, jnp.asarray(xs_full),
                                         mask=jnp.asarray(mask))
    outs_packed, carry_packed = rnn_scan(cell, jnp.asarray(xs_packed))

    np.testing.assert_allclose(np.asarray(outs_masked)[mask],
                               np.asarray(outs_packed), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(outs_masked)[~mask], 0.0)
    np.testing.assert_allclose(np.asarray(carry_masked),
                               np.asarray(carry_packed), rtol=1e-6)
    # summed outputs (CoreDiffusion's reduction) must agree
    np.testing.assert_allclose(np.asarray(outs_masked.sum(0)),
                               np.asarray(outs_packed.sum(0)), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("delta", [False, True])
@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
def test_core_rnn_scan_remat_matches_batched_tail(rnn_type, delta, rng):
    """The memory-lean checkpointed-scan tail of CoreDiffusion (prefix
    accumulation fused into the scan as running-sum carries) must be
    numerically equivalent (values AND grads) to the batched tail it
    replaces in the over-budget regime: materialize the tril-matmul
    prefix (L, or L·L "+ xp" for delta-encoded slots), relu+mask, then
    rnn_scan."""
    from ctgcn_tpu.nn.core_models import _core_rnn_scan_remat

    K, n, d, H = 6, 23, 10, 7
    cell = (GRUCell if rnn_type == "GRU" else LSTMCell).init(
        jax.random.key(3), d, H)
    contribs = jnp.asarray(rng.standard_normal((K, n, d)), jnp.float32)
    # delta plans require prefix validity (build_core_pyramid compacts)
    valid = (jnp.asarray([True] * 4 + [False] * 2) if delta
             else jnp.asarray([True, True, False, True, False, True]))
    contribs = contribs * valid[:, None, None]
    xp = (jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
          if delta else None)

    def batched(cell, contribs):
        lower = jnp.tril(jnp.ones((K, K), jnp.float32))
        if delta:
            lower = lower @ lower
        acc = jnp.einsum("ij,jnd->ind", lower, contribs)
        if delta:
            acc = acc + xp[None]
        hx = jax.nn.relu(acc) * valid[:, None, None]
        outs, _ = rnn_scan(cell, hx, mask=valid)
        return outs

    ref = batched(cell, contribs)
    got = _core_rnn_scan_remat(cell, contribs, valid, delta, xp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_b(cell, contribs):
        return jnp.sum(batched(cell, contribs) ** 2)

    def loss_s(cell, contribs):
        return jnp.sum(
            _core_rnn_scan_remat(cell, contribs, valid, delta, xp) ** 2)

    gb = jax.grad(loss_b, argnums=(0, 1))(cell, contribs)
    gs = jax.grad(loss_s, argnums=(0, 1))(cell, contribs)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5), gs, gb)


def test_core_diffusion_tail_gate_env(rng, monkeypatch):
    """CTGCN-C forward is identical under both tails (budget forced to 0
    routes every layer through the checkpointed scan)."""
    import scipy.sparse as sp
    from ctgcn_tpu.nn import CTGCN
    from ctgcn_tpu.ops.pyramid import build_core_pyramid, stack_pyramids

    N, T = 40, 3
    pyrs = []
    for _ in range(T):
        d = (rng.random((N, N)) < 0.25).astype(np.float32)
        d = np.triu(d, 1)
        A = sp.csr_matrix(d + d.T)
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
    ref = model(None, pyr)
    # budget 0 with acc affordable -> materialized-acc scan tail
    monkeypatch.setenv("CTGCN_TPU_CORE_RNN_BUDGET", "0")
    got = model(None, pyr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # acc budget 0 too -> fused-prefix scan tail
    monkeypatch.setenv("CTGCN_TPU_ACC_MATERIALIZE_BUDGET", "0")
    got2 = model(None, pyr)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
