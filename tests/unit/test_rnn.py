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
