# coding: utf-8
"""GCN (Kipf & Welling) and GCRN (GCN + time GRU) — TPU-native.

Covers the reference's GCN/TgGCN (baseline/gcn.py:14-144) and GCRN
(baseline/gcrn.py:15-62).  One implementation serves both the hand-rolled and
torch-geometric variants: the convolution is ``spmm(adj, x @ W) + b`` either
way.  Multi-snapshot application vmaps over time (shared parameters for GCN;
per-timestep parameter stacks for GCRN, mirroring its per-timestep
``gcn_list``).

Init parity: GraphConvolution draws U(-1/sqrt(out_dim), 1/sqrt(out_dim))
(reference baseline/gcn.py:30-34) — note out_dim, unlike torch.nn.Linear.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ctgcn_tpu.nn.layers import LayerNorm, _uniform
from ctgcn_tpu.ops.rnn import GRUCell, LSTMCell, rnn_scan
from ctgcn_tpu.ops.sparse import SparseGraph
from ctgcn_tpu.ops.spmm import spmm


def _dropout(x, rate, key):
    if key is None or rate in (None, 0.0):
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


@struct.dataclass
class GraphConvolution:
    weight: jnp.ndarray  # [in, out]
    bias: jnp.ndarray | None

    @staticmethod
    def init(key, input_dim, output_dim, bias=True):
        kw, kb = jax.random.split(key)
        stdv = 1.0 / float(jnp.sqrt(output_dim))
        return GraphConvolution(
            weight=_uniform(kw, (input_dim, output_dim), stdv),
            bias=_uniform(kb, (output_dim,), stdv) if bias else None,
        )

    def __call__(self, x, adj: SparseGraph):
        # identity-feature fast path: I @ W == W
        support = self.weight if x is None else x @ self.weight
        out = spmm(adj, support)
        return out if self.bias is None else out + self.bias


@struct.dataclass
class GCN:
    gc1: GraphConvolution
    gc2: GraphConvolution
    dropout: float = struct.field(pytree_node=False)

    method_name = property(lambda self: "GCN")

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, dropout=0.5, bias=True):
        k1, k2 = jax.random.split(key)
        return GCN(gc1=GraphConvolution.init(k1, input_dim, hidden_dim, bias),
                   gc2=GraphConvolution.init(k2, hidden_dim, output_dim, bias),
                   dropout=dropout if dropout is not None else 0.0)

    def single(self, x, adj, key=None):
        h = jax.nn.relu(self.gc1(x, adj))
        h = _dropout(h, self.dropout, key)
        return self.gc2(h, adj)

    def __call__(self, xs, adjs, key=None):
        """xs: [T, N, in] or None; adjs: SparseGraph with leading [T] axis."""
        T = adjs.rows.shape[0]
        keys = jax.random.split(key, T) if key is not None else None
        if xs is None:
            if keys is None:
                return jax.vmap(lambda a: self.single(None, a))(adjs)
            return jax.vmap(lambda a, k: self.single(None, a, k))(adjs, keys)
        if keys is None:
            return jax.vmap(lambda x, a: self.single(x, a))(xs, adjs)
        return jax.vmap(self.single)(xs, adjs, keys)


@struct.dataclass
class GCRN:
    """Per-timestep GCNs (distinct params) + L2 normalize + time RNN +
    LayerNorm (reference baseline/gcrn.py:15-62)."""

    gcns: GCN  # leaves carry a leading [T] axis
    rnn: GRUCell | LSTMCell
    norm: LayerNorm
    duration: int = struct.field(pytree_node=False)

    method_name = property(lambda self: "GCRN")

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, duration, dropout=0.5,
             bias=True, rnn_type="GRU"):
        keys = jax.random.split(key, duration + 1)
        gcn_list = [
            GCN.init(keys[t], input_dim, hidden_dim, output_dim,
                     dropout=dropout, bias=bias)
            for t in range(duration)
        ]
        gcns = jax.tree.map(lambda *xs: jnp.stack(xs), *gcn_list)
        cell_cls = GRUCell if rnn_type == "GRU" else LSTMCell
        return GCRN(gcns=gcns,
                    rnn=cell_cls.init(keys[duration], output_dim, output_dim,
                                      bias=bias),
                    norm=LayerNorm.init(output_dim), duration=duration)

    def __call__(self, xs, adjs, key=None):
        T = adjs.rows.shape[0]
        keys = jax.random.split(key, T) if key is not None else None

        def per_t(gcn, x, adj, k):
            h = gcn.single(x, adj, k)
            # F.normalize(p=2, dim=1) with torch's 1e-12 clamp
            nrm = jnp.maximum(jnp.linalg.norm(h, axis=1, keepdims=True), 1e-12)
            return h / nrm

        if xs is None:
            if keys is None:
                hx = jax.vmap(lambda g, a: per_t(g, None, a, None))(
                    self.gcns, adjs)
            else:
                hx = jax.vmap(lambda g, a, k: per_t(g, None, a, k))(
                    self.gcns, adjs, keys)
        else:
            if keys is None:
                hx = jax.vmap(lambda g, x, a: per_t(g, x, a, None))(
                    self.gcns, xs, adjs)
            else:
                hx = jax.vmap(per_t)(self.gcns, xs, adjs, keys)
        outs, _ = rnn_scan(self.rnn, hx)  # [T, N, out]
        return self.norm(outs)
