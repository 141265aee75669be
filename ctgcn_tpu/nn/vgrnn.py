# coding: utf-8
"""VGRNN (Variational Graph RNN) — TPU-native.

Covers the reference's VGRNN (baseline/vgrnn.py:417-533) with its local
graph-conv layers (GCNConv improved-renormalization, SAGEConv mean-pool,
GINConv; vgrnn.py:157-297) and the graph-GRU whose gates are graph convs
(vgrnn.py:300-397, one conv pair per gate per layer).

TPU re-design:
  * the reference recomputes the GCN renormalization D^-1/2 (A+2I) D^-1/2
    from edge indices inside every conv call (vgrnn.py:179-192); since it
    depends only on the snapshot, the driver precomputes it once per window
    and all convs share the normalized SparseGraph bank;
  * the per-timestep Python loop with carried hidden state becomes
    ``lax.scan`` over time, stacking the per-t loss tensors;
  * reparameterization consumes an explicit PRNG key;
  * the InnerProductDecoder densifies z z^T (as the reference does,
    vgrnn.py:402-413) — the VAE loss needs the dense reconstruction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ctgcn_tpu.nn.layers import Linear, _uniform
from ctgcn_tpu.ops.sparse import SparseGraph
from ctgcn_tpu.ops.spmm import spmm


def _glorot(key, shape):
    bound = jnp.sqrt(6.0 / (shape[0] + shape[1]))
    return _uniform(key, shape, bound)


@struct.dataclass
class GraphConv:
    """One VGRNN conv: y = act(A_norm @ (x @ W) + b) for GCN;
    SAGE mean-pools act(xW+b) over neighbors+self; GIN sums neighbors then
    applies the inner linear.  ``conv_type`` is baked per instance."""

    weight: jnp.ndarray
    bias: jnp.ndarray | None
    conv_type: str = struct.field(pytree_node=False)

    @staticmethod
    def init(key, in_dim, out_dim, conv_type="GCN", bias=False):
        kw, kb = jax.random.split(key)
        if conv_type == "GCN":
            w = _glorot(kw, (in_dim, out_dim))
            b = jnp.zeros((out_dim,)) if bias else None
        else:  # SAGE / GIN keep uniform(1/sqrt(in)) like the reference
            bound = 1.0 / jnp.sqrt(in_dim)
            w = _uniform(kw, (in_dim, out_dim), bound)
            b = _uniform(kb, (out_dim,), bound) if bias else None
        return GraphConv(weight=w, bias=b, conv_type=conv_type)

    def __call__(self, x, adj: SparseGraph, act=None):
        if self.conv_type == "GCN":
            h = x @ self.weight
            out = spmm(adj, h)  # adj pre-normalized with +2I by the driver
            if self.bias is not None:
                out = out + self.bias
        elif self.conv_type == "SAGE":
            h = x @ self.weight
            if self.bias is not None:
                h = h + self.bias
            if act is not None:
                h = act(h)
                act = None
            # mean over neighbors + self (adj here: row-normalized A+I)
            out = spmm(adj, h)
        else:  # GIN: sum neighbors (adj raw) then (1+0)·x + sum; linear after
            out = spmm(adj, x) + x
            out = out @ self.weight
            if self.bias is not None:
                out = out + self.bias
        return act(out) if act is not None else out


@struct.dataclass
class GraphGRU:
    """GRU whose six gates are graph convolutions, ``n_layer`` deep
    (reference vgrnn.py:300-397)."""

    xz: tuple
    hz: tuple
    xr: tuple
    hr: tuple
    xh: tuple
    hh: tuple

    @staticmethod
    def init(key, input_dim, hidden_dim, n_layer, conv_type="GCN", bias=True):
        keys = jax.random.split(key, 6 * n_layer)
        mk = lambda i, din: GraphConv.init(keys[i], din, hidden_dim,
                                           conv_type, bias)
        xz, hz, xr, hr, xh, hh = [], [], [], [], [], []
        for i in range(n_layer):
            din = input_dim if i == 0 else hidden_dim
            xz.append(mk(6 * i + 0, din))
            hz.append(mk(6 * i + 1, hidden_dim))
            xr.append(mk(6 * i + 2, din))
            hr.append(mk(6 * i + 3, hidden_dim))
            xh.append(mk(6 * i + 4, din))
            hh.append(mk(6 * i + 5, hidden_dim))
        return GraphGRU(xz=tuple(xz), hz=tuple(hz), xr=tuple(xr),
                        hr=tuple(hr), xh=tuple(xh), hh=tuple(hh))

    def __call__(self, inp, adj, h):
        """inp: [N, in]; h: [L, N, hid] → new h [L, N, hid]."""
        outs = []
        x = inp
        for i in range(len(self.xz)):
            z = jax.nn.sigmoid(self.xz[i](x, adj) + self.hz[i](h[i], adj))
            r = jax.nn.sigmoid(self.xr[i](x, adj) + self.hr[i](h[i], adj))
            h_tilde = jnp.tanh(self.xh[i](x, adj)
                               + self.hh[i](r * h[i], adj))
            h_new = z * h[i] + (1 - z) * h_tilde
            outs.append(h_new)
            x = h_new
        return jnp.stack(outs)


@struct.dataclass
class VGRNN:
    phi_x: Linear
    phi_z: Linear
    enc: GraphConv
    enc_mean: GraphConv
    enc_std: GraphConv
    prior: Linear
    prior_mean: Linear
    prior_std: Linear
    rnn: GraphGRU
    hidden_dim: int = struct.field(pytree_node=False)
    rnn_layer_num: int = struct.field(pytree_node=False)
    conv_type: str = struct.field(pytree_node=False)

    method_name = property(lambda self: "VGRNN")

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, rnn_layer_num=1,
             conv_type="GCN", bias=True):
        assert conv_type in ("GCN", "SAGE", "GIN")
        ks = jax.random.split(key, 9)
        return VGRNN(
            phi_x=Linear.init(ks[0], input_dim, hidden_dim, bias),
            phi_z=Linear.init(ks[1], output_dim, hidden_dim, bias),
            enc=GraphConv.init(ks[2], 2 * hidden_dim, hidden_dim, conv_type,
                               bias),
            enc_mean=GraphConv.init(ks[3], hidden_dim, output_dim, conv_type,
                                    bias),
            enc_std=GraphConv.init(ks[4], hidden_dim, output_dim, conv_type,
                                   bias),
            prior=Linear.init(ks[5], hidden_dim, hidden_dim, bias),
            prior_mean=Linear.init(ks[6], hidden_dim, output_dim, bias),
            prior_std=Linear.init(ks[7], hidden_dim, output_dim, bias),
            rnn=GraphGRU.init(ks[8], 2 * hidden_dim, hidden_dim,
                              rnn_layer_num, conv_type, bias),
            hidden_dim=hidden_dim, rnn_layer_num=rnn_layer_num,
            conv_type=conv_type)

    def step(self, x, adj, h, key):
        """One timestep.  x: [N, in] (dense), adj: normalized SparseGraph."""
        # identity fast path: phi_x(I) rows are W (+ b)
        phi_x_t = jax.nn.relu(
            self.phi_x.weight + self.phi_x.bias if x is None
            else self.phi_x(x))
        enc_in = jnp.concatenate([phi_x_t, h[-1]], axis=1)
        enc_t = self.enc(enc_in, adj, act=jax.nn.relu)
        enc_mean_t = self.enc_mean(enc_t, adj)
        enc_std_t = self.enc_std(enc_t, adj, act=jax.nn.softplus)

        prior_t = jax.nn.relu(self.prior(h[-1]))
        prior_mean_t = self.prior_mean(prior_t)
        prior_std_t = jax.nn.softplus(self.prior_std(prior_t))

        eps = jax.random.normal(key, enc_std_t.shape)
        z_t = enc_mean_t + eps * enc_std_t
        phi_z_t = jax.nn.relu(self.phi_z(z_t))
        dec_t = z_t @ z_t.T  # InnerProductDecoder, identity activation
        h = self.rnn(jnp.concatenate([phi_x_t, phi_z_t], axis=1), adj, h)
        return h, (enc_mean_t, enc_std_t, prior_mean_t, prior_std_t, dec_t)

    def __call__(self, xs, adjs, hx=None, key=None):
        """xs: [T, N, in] or None (identity); adjs: [T]-leading normalized
        SparseGraph bank.  Returns (embs [T, N, out], h, loss_data)."""
        T = adjs.rows.shape[0]
        n = adjs.n_rows
        if key is None:
            key = jax.random.key(0)
        keys = jax.random.split(key, T)
        if hx is None:
            hx = jnp.zeros((self.rnn_layer_num, n, self.hidden_dim))

        def body(h, inp):
            t, k = inp
            adj_t = jax.tree.map(lambda a: a[t], adjs)
            h, outs = self.step(None if xs is None else xs[t], adj_t, h, k)
            return h, outs

        h, (enc_mean, enc_std, prior_mean, prior_std, dec) = jax.lax.scan(
            body, hx, (jnp.arange(T), keys))
        return enc_mean, h, (enc_mean, enc_std, prior_mean, prior_std, dec)
