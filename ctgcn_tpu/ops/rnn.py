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


@jax.custom_vjp
def core_rnn_sum(cell, acc, valid):
    """Masked core-axis RNN with a hand-written VJP, returning the SUM of
    the per-step hidden states — i.e. ``rnn_scan(cell, relu(acc)*valid,
    mask=valid)[0].sum(0)`` (what every CoreDiffusion tail consumes,
    reference layers.py:58-62) as one fused op.

    Why not ``jax.grad`` of the scan (measured r4, v5e, Enron/Facebook
    shapes):

      * ``lax.scan``'s VJP stacks per-step residuals and XLA adds layout
        copies on top — the Enron OOM dump shows THREE [K, 87036, 500]
        copies of the prefix ``acc`` alone (fusion output + relayout +
        remat_compressed, 5.6 GB) plus f32 carry stacks;
      * ``core_tail_bwd`` was 597 ms of the 1.05 s Facebook-scale step —
        2.5x the forward — from replay-plus-linearize overhead.

    This VJP saves exactly two tensors per layer: ``acc`` (the primal
    input, any float dtype — bf16 at Enron scale) and the pre-step h
    carries ([K, N, H]) stored in ``acc.dtype``.  Because the output is
    the masked sum, the output cotangent is ONE shared [N, H] array —
    the [K, N, H] outs stack and its cotangent never exist.  The backward
    is a single reverse scan that recomputes each step's gates from the
    saved carry (two GEMMs) and emits d_acc in ``acc.dtype``.

    Args:
      cell: GRUCell or LSTMCell.
      acc: [K, N, d] prefix accumulation (any float dtype; upcast f32
        inside, matching ``_core_rnn_scan_acc``).
      valid: float32[K] mask (1.0 = valid slot).  Invalid steps pass the
        carry through and contribute nothing (packed-seq semantics).

    Returns: [N, H] float32 — sum of hidden states over valid steps.
    """
    out, _ = _core_rnn_sum_fwd(cell, acc, valid)
    return out


def _cvjp_batch_budget_bytes():
    """Byte gate for the K-batched halves of core_rnn_sum (read at trace
    time).  Under it, the input projection hoists out of the forward scan
    as ONE [K, N, d] GEMM, and the backward precomputes gi/gh/gates for
    all K slots batched so the reverse scan's sequential chain is a
    single [N, H] @ [H, GH] GEMM per step (vs six GEMMs/step in the lean
    mode) — the latency lever for small graphs, where the step is bound
    by 2·T·L·K dependent GEMMs, not FLOPs.  Above it (facebook/enron
    [K, N, 3H] stacks are 3-12 GB) the lean per-step recompute keeps the
    footprint at acc + carries only."""
    return int(os.environ.get("CTGCN_TPU_CVJP_BATCH_BUDGET", 512 << 20))


def _cvjp_batched(cell, acc):
    gh = 4 if isinstance(cell, LSTMCell) else 3
    bytes_kn3h = 4 * acc.shape[0] * acc.shape[1] * gh * cell.hidden_dim
    return bytes_kn3h <= _cvjp_batch_budget_bytes()


def _core_rnn_sum_fwd(cell, acc, valid):
    n = acc.shape[1]
    H = cell.hidden_dim
    is_lstm = isinstance(cell, LSTMCell)
    store_dt = acc.dtype
    h0 = jnp.zeros((n, H), jnp.float32)
    s0 = jnp.zeros((n, H), jnp.float32)
    carry0 = (h0, h0, s0) if is_lstm else (h0, s0)
    batched = _cvjp_batched(cell, acc)

    if batched:
        # hoist the input projection: one [K, N, d] @ [d, GH] MXU GEMM,
        # leaving a single h @ w_hh GEMM inside the sequential scan
        hx_all = jax.nn.relu(acc.astype(jnp.float32)) * valid[:, None, None]
        gi_all = cell.input_proj(hx_all)

        def stepb(carry, inp):
            gi_k, v = inp
            vb = v > 0
            if is_lstm:
                h_prev, c_prev, s = carry
                h_new, c_new = cell.step_from_proj((h_prev, c_prev), gi_k)
                h_k = jnp.where(vb, h_new, h_prev)
                c_k = jnp.where(vb, c_new, c_prev)
                s = s + jnp.where(vb, h_k, 0.0)
                return ((h_k, c_k, s),
                        (h_prev.astype(store_dt), c_prev.astype(store_dt)))
            h_prev, s = carry
            h_new = cell.step_from_proj(h_prev, gi_k)
            h_k = jnp.where(vb, h_new, h_prev)
            s = s + jnp.where(vb, h_k, 0.0)
            return (h_k, s), h_prev.astype(store_dt)

        carry, saved = jax.lax.scan(stepb, carry0, (gi_all, valid))
        return carry[-1], (cell, acc, valid, saved)

    def step(carry, inp):
        acc_k, v = inp
        vb = v > 0
        hx = jax.nn.relu(acc_k.astype(jnp.float32)) * v
        if is_lstm:
            h_prev, c_prev, s = carry
            h_new, c_new = cell((h_prev, c_prev), hx)
            h_k = jnp.where(vb, h_new, h_prev)
            c_k = jnp.where(vb, c_new, c_prev)
            s = s + jnp.where(vb, h_k, 0.0)
            return ((h_k, c_k, s),
                    (h_prev.astype(store_dt), c_prev.astype(store_dt)))
        h_prev, s = carry
        h_new = cell(h_prev, hx)
        h_k = jnp.where(vb, h_new, h_prev)
        s = s + jnp.where(vb, h_k, 0.0)
        return (h_k, s), h_prev.astype(store_dt)

    carry, saved = jax.lax.scan(step, carry0, (acc, valid))
    return carry[-1], (cell, acc, valid, saved)


def _gru_step_bwd(cell, acc_k, v, h_prev, dh_in):
    """One reverse GRU step: recompute gates from the saved pre-step carry,
    return (dh_prev, d_acc_k, per-step param grads).  All f32."""
    H = cell.hidden_dim
    vb = v > 0
    acc_f = acc_k.astype(jnp.float32)
    hx = jax.nn.relu(acc_f) * v
    gi = cell.input_proj(hx)
    gh = h_prev @ cell.w_hh.T + cell.b_hh
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    nn = jnp.tanh(i_n + r * h_n)
    # h_k = (1-z)*n + z*h_prev
    dn = dh_in * (1.0 - z)
    dz = dh_in * (h_prev - nn)
    da_n = dn * (1.0 - nn * nn)
    dr = da_n * h_n
    dhn = da_n * r
    da_r = dr * r * (1.0 - r)
    da_z = dz * z * (1.0 - z)
    d_gi = jnp.concatenate([da_r, da_z, da_n], axis=-1)
    d_gh = jnp.concatenate([da_r, da_z, dhn], axis=-1)
    d_gi = jnp.where(vb, d_gi, 0.0)
    d_gh = jnp.where(vb, d_gh, 0.0)
    dh_prev = jnp.where(vb, dh_in * z + d_gh @ cell.w_hh, dh_in)
    d_acc = ((d_gi @ cell.w_ih) * v) * (acc_f > 0)
    grads = GRUCell(
        w_ih=d_gi.T @ hx, w_hh=d_gh.T @ h_prev,
        b_ih=d_gi.sum(axis=0), b_hh=d_gh.sum(axis=0))
    return dh_prev, d_acc, grads


def _lstm_step_bwd(cell, acc_k, v, h_prev, c_prev, dh_in, dc_in):
    H = cell.hidden_dim
    vb = v > 0
    acc_f = acc_k.astype(jnp.float32)
    hx = jax.nn.relu(acc_f) * v
    gates = cell.input_proj(hx) + h_prev @ cell.w_hh.T + cell.b_hh
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:])
    c_new = f * c_prev + i * g
    tc = jnp.tanh(c_new)
    # h_k = o * tanh(c_new)
    do = dh_in * tc
    dc_tot = dc_in + dh_in * o * (1.0 - tc * tc)
    di = dc_tot * g
    df = dc_tot * c_prev
    dg = dc_tot * i
    d_gates = jnp.concatenate([
        di * i * (1.0 - i), df * f * (1.0 - f),
        dg * (1.0 - g * g), do * o * (1.0 - o)], axis=-1)
    d_gates = jnp.where(vb, d_gates, 0.0)
    dh_prev = jnp.where(vb, d_gates @ cell.w_hh, dh_in)
    dc_prev = jnp.where(vb, dc_tot * f, dc_in)
    d_acc = ((d_gates @ cell.w_ih) * v) * (acc_f > 0)
    grads = LSTMCell(
        w_ih=d_gates.T @ hx, w_hh=d_gates.T @ h_prev,
        b_ih=d_gates.sum(axis=0), b_hh=d_gates.sum(axis=0))
    return dh_prev, dc_prev, d_acc, grads


def _core_rnn_sum_bwd_batched(res, g_out):
    """K-batched backward (under _cvjp_batch_budget_bytes): gi/gh/gates
    for ALL slots as batched GEMMs/elementwise; the reverse scan's
    sequential chain is one d_gates @ w_hh GEMM per step; d_acc and the
    weight grads are batched GEMMs after the scan."""
    cell, acc, valid, saved = res
    n = acc.shape[1]
    H = cell.hidden_dim
    is_lstm = isinstance(cell, LSTMCell)
    g_out = g_out.astype(jnp.float32)
    dh0 = jnp.zeros((n, H), jnp.float32)
    vmask = valid[:, None, None]
    hx_all = jax.nn.relu(acc.astype(jnp.float32)) * vmask
    gi_all = cell.input_proj(hx_all)

    if is_lstm:
        h_prevs = saved[0].astype(jnp.float32)
        c_prevs = saved[1].astype(jnp.float32)
        gates = gi_all + h_prevs @ cell.w_hh.T + cell.b_hh
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])
        tc = jnp.tanh(f * c_prevs + i * g)

        def stepb(carry, inp):
            dh, dc = carry
            i_k, f_k, g_k, o_k, tc_k, c_prev, v = inp
            vb = v > 0
            dh_in = dh + jnp.where(vb, g_out, 0.0)
            do = dh_in * tc_k
            dc_tot = dc + dh_in * o_k * (1.0 - tc_k * tc_k)
            d_gates = jnp.concatenate([
                dc_tot * g_k * i_k * (1.0 - i_k),
                dc_tot * c_prev * f_k * (1.0 - f_k),
                dc_tot * i_k * (1.0 - g_k * g_k),
                do * o_k * (1.0 - o_k)], axis=-1)
            d_gates = jnp.where(vb, d_gates, 0.0)
            dh_prev = jnp.where(vb, d_gates @ cell.w_hh, dh_in)
            dc_prev = jnp.where(vb, dc_tot * f_k, dc)
            return (dh_prev, dc_prev), d_gates

        _, d_gates = jax.lax.scan(
            stepb, (dh0, dh0), (i, f, g, o, tc, c_prevs, valid),
            reverse=True)
        d_gi = d_gh = d_gates
    else:
        h_prevs = saved.astype(jnp.float32)
        gh_all = h_prevs @ cell.w_hh.T + cell.b_hh
        r = jax.nn.sigmoid(gi_all[..., :H] + gh_all[..., :H])
        z = jax.nn.sigmoid(gi_all[..., H:2 * H] + gh_all[..., H:2 * H])
        nn = jnp.tanh(gi_all[..., 2 * H:] + r * gh_all[..., 2 * H:])
        hn = gh_all[..., 2 * H:]

        def stepb(dh, inp):
            r_k, z_k, n_k, hn_k, h_prev, v = inp
            vb = v > 0
            dh_in = dh + jnp.where(vb, g_out, 0.0)
            dn = dh_in * (1.0 - z_k)
            dz = dh_in * (h_prev - n_k)
            da_n = dn * (1.0 - n_k * n_k)
            da_r = da_n * hn_k * r_k * (1.0 - r_k)
            da_z = dz * z_k * (1.0 - z_k)
            d_gi_k = jnp.concatenate([da_r, da_z, da_n], axis=-1)
            d_gh_k = jnp.concatenate([da_r, da_z, da_n * r_k], axis=-1)
            d_gi_k = jnp.where(vb, d_gi_k, 0.0)
            d_gh_k = jnp.where(vb, d_gh_k, 0.0)
            dh_prev = jnp.where(vb, dh_in * z_k + d_gh_k @ cell.w_hh,
                                dh_in)
            return dh_prev, (d_gi_k, d_gh_k)

        _, (d_gi, d_gh) = jax.lax.scan(
            stepb, dh0, (r, z, nn, hn, h_prevs, valid), reverse=True)

    d_acc = (((d_gi @ cell.w_ih) * vmask)
             * (acc.astype(jnp.float32) > 0)).astype(acc.dtype)
    pg = type(cell)(
        w_ih=jnp.tensordot(d_gi, hx_all, axes=[[0, 1], [0, 1]]),
        w_hh=jnp.tensordot(d_gh, h_prevs, axes=[[0, 1], [0, 1]]),
        b_ih=d_gi.sum(axis=(0, 1)), b_hh=d_gh.sum(axis=(0, 1)))
    return pg, d_acc, jnp.zeros_like(valid)


def _core_rnn_sum_bwd(res, g_out):
    cell, acc, valid, saved = res
    if _cvjp_batched(cell, acc):
        return _core_rnn_sum_bwd_batched(res, g_out)
    n = acc.shape[1]
    H = cell.hidden_dim
    is_lstm = isinstance(cell, LSTMCell)
    g_out = g_out.astype(jnp.float32)
    dh0 = jnp.zeros((n, H), jnp.float32)
    pg0 = jax.tree.map(jnp.zeros_like, cell)

    if is_lstm:
        def stepb(carry, inp):
            acc_k, v, (h_prev_s, c_prev_s) = inp
            dh, dc, pg = carry
            vb = v > 0
            dh_in = dh + jnp.where(vb, g_out, 0.0)
            dh_prev, dc_prev, d_acc, grads = _lstm_step_bwd(
                cell, acc_k, v, h_prev_s.astype(jnp.float32),
                c_prev_s.astype(jnp.float32), dh_in, dc)
            pg = jax.tree.map(jnp.add, pg, grads)
            return (dh_prev, dc_prev, pg), d_acc.astype(acc.dtype)

        (dh, dc, pg), d_acc = jax.lax.scan(
            stepb, (dh0, dh0, pg0), (acc, valid, saved), reverse=True)
    else:
        def stepb(carry, inp):
            acc_k, v, h_prev_s = inp
            dh, pg = carry
            vb = v > 0
            dh_in = dh + jnp.where(vb, g_out, 0.0)
            dh_prev, d_acc, grads = _gru_step_bwd(
                cell, acc_k, v, h_prev_s.astype(jnp.float32), dh_in)
            pg = jax.tree.map(jnp.add, pg, grads)
            return (dh_prev, pg), d_acc.astype(acc.dtype)

        (dh, pg), d_acc = jax.lax.scan(
            stepb, (dh0, pg0), (acc, valid, saved), reverse=True)
    return pg, d_acc, jnp.zeros_like(valid)


core_rnn_sum.defvjp(_core_rnn_sum_fwd, _core_rnn_sum_bwd)


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
