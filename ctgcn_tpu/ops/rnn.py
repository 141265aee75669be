# coding: utf-8
"""Scan-based GRU/LSTM cells (the TPU replacement for cuDNN RNNs).

The reference leans on ``nn.GRU`` / ``nn.LSTM`` (cuDNN) in four places: the
core-axis RNN inside CoreDiffusion (reference layers.py:26-30,58-62), the
time-axis RNN in CTGCN (models.py:234-237), GCRN (baseline/gcrn.py:46-49) and
the DynRNN/DynAERNN autoencoders.  Here a cell is a pure function over a
parameter pytree; sequences run under ``lax.scan`` with the input-to-hidden
matmul hoisted out of the scan as one large MXU matmul.

Gate math and parameter layout follow torch's ``nn.GRU``/``nn.LSTM``
(weight_ih [G*H, in], weight_hh [G*H, H], bias_ih, bias_hh; GRU gate order
r, z, n; LSTM gate order i, f, g, o) so reference checkpoints can be mapped
for parity testing.

Masked steps: the core pyramid drops cores whose delta vs the previous core
is empty (reference helper.py:71-76), shortening the RNN sequence.  Instead of
ragged sequences, ``rnn_scan`` takes a validity mask; at an invalid step the
carry passes through unchanged and the step's output is zeroed, which is
numerically identical to removing the step when outputs are summed.
"""
from __future__ import annotations

import os

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

#: default ``lax.scan`` unroll for rnn_scan (see its docstring).
_RNN_UNROLL = int(os.environ.get("CTGCN_TPU_RNN_UNROLL", "1"))


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


class GRUCell(NamedTuple):
    """GRU parameters, torch layout (gate order: reset, update, new)."""

    w_ih: jnp.ndarray  # [3H, in]
    w_hh: jnp.ndarray  # [3H, H]
    b_ih: jnp.ndarray  # [3H]
    b_hh: jnp.ndarray  # [3H]

    @staticmethod
    def init(key, input_dim, hidden_dim, bias=True):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        bound = 1.0 / jnp.sqrt(hidden_dim)
        zeros = jnp.zeros((3 * hidden_dim,), jnp.float32)
        return GRUCell(
            w_ih=_uniform(k1, (3 * hidden_dim, input_dim), bound),
            w_hh=_uniform(k2, (3 * hidden_dim, hidden_dim), bound),
            b_ih=_uniform(k3, (3 * hidden_dim,), bound) if bias else zeros,
            b_hh=_uniform(k4, (3 * hidden_dim,), bound) if bias else zeros,
        )

    @property
    def hidden_dim(self):
        return self.w_hh.shape[1]

    def input_proj(self, x):
        """Input-to-hidden projection, hoistable out of the scan. x: [..., in]."""
        return x @ self.w_ih.T + self.b_ih

    def step_from_proj(self, h, gi):
        """One GRU step given the precomputed input projection gi: [..., 3H]."""
        H = self.hidden_dim
        gh = h @ self.w_hh.T + self.b_hh
        i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
        h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h

    def __call__(self, h, x):
        return self.step_from_proj(h, self.input_proj(x))


class LSTMCell(NamedTuple):
    """LSTM parameters, torch layout (gate order: input, forget, cell, output)."""

    w_ih: jnp.ndarray  # [4H, in]
    w_hh: jnp.ndarray  # [4H, H]
    b_ih: jnp.ndarray  # [4H]
    b_hh: jnp.ndarray  # [4H]

    @staticmethod
    def init(key, input_dim, hidden_dim, bias=True):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        bound = 1.0 / jnp.sqrt(hidden_dim)
        zeros = jnp.zeros((4 * hidden_dim,), jnp.float32)
        return LSTMCell(
            w_ih=_uniform(k1, (4 * hidden_dim, input_dim), bound),
            w_hh=_uniform(k2, (4 * hidden_dim, hidden_dim), bound),
            b_ih=_uniform(k3, (4 * hidden_dim,), bound) if bias else zeros,
            b_hh=_uniform(k4, (4 * hidden_dim,), bound) if bias else zeros,
        )

    @property
    def hidden_dim(self):
        return self.w_hh.shape[1]

    def input_proj(self, x):
        return x @ self.w_ih.T + self.b_ih

    def step_from_proj(self, carry, gi):
        h, c = carry
        H = self.hidden_dim
        gh = h @ self.w_hh.T + self.b_hh
        gates = gi + gh
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new)

    def __call__(self, carry, x):
        return self.step_from_proj(carry, self.input_proj(x))


def rnn_scan(cell, xs, mask: Optional[jnp.ndarray] = None, h0=None,
             reverse=False, unroll: Optional[int] = None):
    """Run a GRU/LSTM over the leading axis of ``xs`` ([T, B, in]).

    Args:
      cell: GRUCell or LSTMCell.
      xs: [T, B, in] inputs.
      mask: optional bool[T]; invalid steps pass the carry through unchanged
        and emit zeros (packed-sequence semantics, see module docstring).
      h0: optional initial hidden state ([B, H], or (h, c) for LSTM).
      unroll: ``lax.scan`` unroll factor; defaults to
        ``$CTGCN_TPU_RNN_UNROLL`` (1).  Measured on v5e (UCI CTGCN-C step,
        scripts/ablate_step.py): unrolling HURTS — 45.6 ms at unroll=1 vs
        60.5 ms at unroll=4 (larger live ranges defeat XLA's while-loop
        double buffering) — so the rolled scan stays the default; the knob
        exists for re-probing on other topologies.

    Returns:
      outs: [T, B, H] hidden state per step (zeros at masked steps).
      carry: final carry.
    """
    if unroll is None:
        unroll = _RNN_UNROLL
    T, B = xs.shape[0], xs.shape[1]
    H = cell.hidden_dim
    is_lstm = isinstance(cell, LSTMCell)
    if h0 is None:
        h = jnp.zeros((B, H), xs.dtype)
        carry0 = (h, jnp.zeros((B, H), xs.dtype)) if is_lstm else h
    else:
        carry0 = h0

    gi_all = cell.input_proj(xs)  # one big MXU matmul: [T, B, G*H]

    if mask is None:
        def step(carry, gi):
            new_carry = cell.step_from_proj(carry, gi)
            out = new_carry[0] if is_lstm else new_carry
            return new_carry, out

        carry, outs = jax.lax.scan(step, carry0, gi_all, reverse=reverse,
                                   unroll=min(unroll, T))
    else:
        mask = mask.astype(bool)

        def step(carry, inp):
            gi, valid = inp
            new_carry = cell.step_from_proj(carry, gi)
            if is_lstm:
                new_carry = tuple(
                    jnp.where(valid, n, o) for n, o in zip(new_carry, carry)
                )
                out = jnp.where(valid, new_carry[0], 0.0)
            else:
                new_carry = jnp.where(valid, new_carry, carry)
                out = jnp.where(valid, new_carry, 0.0)
            return new_carry, out

        carry, outs = jax.lax.scan(step, carry0, (gi_all, mask),
                                   reverse=reverse, unroll=min(unroll, T))
    return outs, carry
