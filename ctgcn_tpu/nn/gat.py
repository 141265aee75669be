# coding: utf-8
"""Sparse GAT — TPU-native.

Covers the reference's GAT/TgGAT (baseline/gat.py:13-212).  The reference's
hand-rolled ``SpecialSpmmFunction`` autograd op (sparse-region-only gradient,
baseline/gat.py:13-39) is exactly what ``spmm_ev`` provides: native autodiff
yields the SDDMM gradient for edge values and A^T @ g for features.

Per-edge attention (baseline/gat.py:66-105): e = exp(-leakyrelu(a·[h_i;h_j]))
normalized by its row sum, edge-dropout on e, h' = (E @ h) / rowsum, ELU
between layers.  Padding edge slots are masked to zero so they drop out of
both the numerator and the row sum.

Init parity: xavier_normal with gain 1.414 for W and a.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ctgcn_tpu.nn.gcn import _dropout
from ctgcn_tpu.ops.sparse import SparseGraph
from ctgcn_tpu.ops.spmm import spmm_ev


def _xavier_normal(key, shape, gain=1.414):
    fan_in, fan_out = shape[0], shape[1]
    std = gain * jnp.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype=jnp.float32)


@struct.dataclass
class SpGraphAttentionLayer:
    W: jnp.ndarray        # [in, out]
    a: jnp.ndarray        # [2*out]
    alpha: float = struct.field(pytree_node=False)
    concat: bool = struct.field(pytree_node=False)
    dropout: float = struct.field(pytree_node=False)

    @staticmethod
    def init(key, in_features, out_features, dropout, alpha, concat=True):
        kw, ka = jax.random.split(key)
        return SpGraphAttentionLayer(
            W=_xavier_normal(kw, (in_features, out_features)),
            a=_xavier_normal(ka, (1, 2 * out_features))[0],
            alpha=alpha, concat=concat, dropout=dropout)

    def __call__(self, x, adj: SparseGraph, key=None):
        h = self.W if x is None else x @ self.W  # identity fast path
        out = h.shape[-1]
        # attention logits per edge: a · [h_i ; h_j]
        src, dst = adj.rows, adj.cols
        logit = h[src] @ self.a[:out] + h[dst] @ self.a[out:]
        edge_e = jnp.exp(-jax.nn.leaky_relu(logit, self.alpha))
        edge_e = jnp.where(adj.nnz_mask(), edge_e, 0.0)
        n = adj.n_rows
        if adj.ell_ev_fwd is not None:
            # scatter-free attention aggregation at scale (ops/ell.py)
            from ctgcn_tpu.ops.ell import ell_spmm_ev

            rowsum = ell_spmm_ev(adj.ell_ev_fwd, adj.ell_ev_t, edge_e,
                                 jnp.ones((n, 1), h.dtype))
            edge_e = _dropout(edge_e, self.dropout, key)
            h_prime = ell_spmm_ev(adj.ell_ev_fwd, adj.ell_ev_t, edge_e, h)
        else:
            rowsum = spmm_ev(src, dst, edge_e, jnp.ones((n, 1), h.dtype), n)
            edge_e = _dropout(edge_e, self.dropout, key)
            h_prime = spmm_ev(src, dst, edge_e, h, n)
        h_prime = h_prime / jnp.maximum(rowsum, 1e-12)
        return jax.nn.elu(h_prime) if self.concat else h_prime


@struct.dataclass
class GAT:
    attentions: tuple  # head_num SpGraphAttentionLayers
    out_att: SpGraphAttentionLayer
    dropout: float = struct.field(pytree_node=False)
    learning_type: str = struct.field(pytree_node=False)

    method_name = property(lambda self: "GAT")

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, dropout=0.6, alpha=0.2,
             head_num=8, learning_type="U-neg"):
        keys = jax.random.split(key, head_num + 1)
        attentions = tuple(
            SpGraphAttentionLayer.init(keys[i], input_dim, hidden_dim,
                                       dropout=dropout, alpha=alpha,
                                       concat=True)
            for i in range(head_num)
        )
        out_att = SpGraphAttentionLayer.init(
            keys[head_num], hidden_dim * head_num, output_dim,
            dropout=dropout, alpha=alpha, concat=False)
        return GAT(attentions=attentions, out_att=out_att, dropout=dropout,
                   learning_type=learning_type)

    def single(self, x, adj, key=None):
        ks = (jax.random.split(key, len(self.attentions) + 3)
              if key is not None else [None] * (len(self.attentions) + 3))
        # the reference skips input dropout for sparse (= identity) features
        if x is not None:
            x = _dropout(x, self.dropout, ks[-1])
        h = jnp.concatenate(
            [att(x, adj, k) for att, k in zip(self.attentions, ks)], axis=1)
        h = _dropout(h, self.dropout, ks[-2])
        h = jax.nn.elu(self.out_att(h, adj, ks[-3]))
        if self.learning_type == "U-neg":
            return jax.nn.log_softmax(h, axis=1)
        return h

    def __call__(self, xs, adjs, key=None):
        T = adjs.rows.shape[0]
        keys = jax.random.split(key, T) if key is not None else None
        if xs is None:
            if keys is None:
                return jax.vmap(lambda a: self.single(None, a))(adjs)
            return jax.vmap(lambda a, k: self.single(None, a, k))(adjs, keys)
        if keys is None:
            return jax.vmap(lambda x, a: self.single(x, a))(xs, adjs)
        return jax.vmap(self.single)(xs, adjs, keys)
