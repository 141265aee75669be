# coding: utf-8
"""EvolveGCN — TPU-native.

Covers the reference's EvolveGCN (baseline/egcn.py:17-158): two GRCU layers
whose GCN weight matrix evolves through a matrix-GRU over time; EGCNH
summarizes nodes via TopK (k = output_dim) to drive the weight GRU, EGCNO
feeds the weights back directly.  Per-timestep forward is
``rrelu(Â @ X @ W_t)``.

The reference's Python loop over timestamps becomes a ``lax.scan`` carrying
the evolving weight matrices.  rrelu runs in eval semantics (fixed negative
slope = (1/8 + 1/3) / 2) unless a key is supplied, in which case the slope is
drawn uniformly per element as torch's train-mode rrelu does.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ctgcn_tpu.nn.layers import _uniform
from ctgcn_tpu.ops.sparse import SparseGraph
from ctgcn_tpu.ops.spmm import spmm

_RRELU_LO, _RRELU_HI = 1.0 / 8.0, 1.0 / 3.0


def _rrelu(x, key=None):
    if key is None:
        slope = (_RRELU_LO + _RRELU_HI) / 2.0
        return jnp.where(x >= 0, x, slope * x)
    slopes = jax.random.uniform(key, x.shape, minval=_RRELU_LO,
                                maxval=_RRELU_HI)
    return jnp.where(x >= 0, x, slopes * x)


@struct.dataclass
class MatGRUGate:
    W: jnp.ndarray     # [rows, rows]
    U: jnp.ndarray     # [rows, rows]
    bias: jnp.ndarray  # [rows, cols]

    @staticmethod
    def init(key, rows, cols):
        k1, k2, k3 = jax.random.split(key, 3)
        return MatGRUGate(
            W=_uniform(k1, (rows, rows), 1.0 / jnp.sqrt(rows)),
            U=_uniform(k2, (rows, rows), 1.0 / jnp.sqrt(rows)),
            bias=_uniform(k3, (rows, cols), 1.0 / jnp.sqrt(cols)),
        )

    def __call__(self, x, hidden, activation):
        return activation(self.W @ x + self.U @ hidden + self.bias)


@struct.dataclass
class TopK:
    scorer: jnp.ndarray  # [feats, 1]
    k: int = struct.field(pytree_node=False)

    @staticmethod
    def init(key, feats, k):
        return TopK(scorer=_uniform(key, (feats, 1), 1.0 / jnp.sqrt(feats)),
                    k=k)

    def __call__(self, node_embs):
        scores = (node_embs @ self.scorer) / jnp.linalg.norm(self.scorer)
        vals, idx = jax.lax.top_k(scores[:, 0], self.k)
        out = node_embs[idx] * jnp.tanh(vals)[:, None]
        return out.T  # [feats, k]


@struct.dataclass
class MatGRUCell:
    update: MatGRUGate
    reset: MatGRUGate
    htilda: MatGRUGate
    choose_topk: TopK
    egcn_type: str = struct.field(pytree_node=False)

    @staticmethod
    def init(key, input_dim, output_dim, egcn_type="EGCNH"):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return MatGRUCell(
            update=MatGRUGate.init(k1, input_dim, output_dim),
            reset=MatGRUGate.init(k2, input_dim, output_dim),
            htilda=MatGRUGate.init(k3, input_dim, output_dim),
            choose_topk=TopK.init(k4, input_dim, output_dim),
            egcn_type=egcn_type)

    def __call__(self, prev_Q, prev_Z=None):
        if self.egcn_type == "EGCNO":
            z_topk = prev_Q
        else:
            z_topk = self.choose_topk(prev_Z)
        update = self.update(z_topk, prev_Q, jax.nn.sigmoid)
        reset = self.reset(z_topk, prev_Q, jax.nn.sigmoid)
        h_cap = self.htilda(z_topk, reset * prev_Q, jnp.tanh)
        return (1 - update) * prev_Q + update * h_cap


@struct.dataclass
class GRCU:
    evolve_weights: MatGRUCell
    GCN_init_weights: jnp.ndarray  # [in, out]
    egcn_type: str = struct.field(pytree_node=False)

    @staticmethod
    def init(key, input_dim, output_dim, egcn_type="EGCNH"):
        k1, k2 = jax.random.split(key)
        return GRCU(
            evolve_weights=MatGRUCell.init(k1, input_dim, output_dim,
                                           egcn_type),
            GCN_init_weights=_uniform(k2, (input_dim, output_dim),
                                      1.0 / jnp.sqrt(output_dim)),
            egcn_type=egcn_type)

    def __call__(self, adjs: SparseGraph, xs, keys=None):
        """adjs: [T]-leading SparseGraph; xs: [T, N, in] → [T, N, out]."""
        T = xs.shape[0]

        def step(W, inp):
            t, x = inp
            adj_t = jax.tree.map(lambda a: a[t], adjs)
            if self.egcn_type == "EGCNO":
                W = self.evolve_weights(W)
            else:
                W = self.evolve_weights(W, x)
            h = spmm(adj_t, x @ W)
            k = None if keys is None else keys[t]
            return W, _rrelu(h, k)

        _, out = jax.lax.scan(step, self.GCN_init_weights,
                              (jnp.arange(T), xs))
        return out


@struct.dataclass
class EvolveGCN:
    grcu1: GRCU
    grcu2: GRCU

    method_name = property(lambda self: "EvolveGCN")

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, egcn_type="EGCNH"):
        k1, k2 = jax.random.split(key)
        return EvolveGCN(grcu1=GRCU.init(k1, input_dim, hidden_dim,
                                         egcn_type),
                         grcu2=GRCU.init(k2, hidden_dim, output_dim,
                                         egcn_type))

    def __call__(self, xs, adjs, key=None):
        keys = None
        if key is not None:
            T = xs.shape[0]
            keys = jax.random.split(key, 2 * T).reshape(2, T)
        h = self.grcu1(adjs, xs, None if keys is None else keys[0])
        return self.grcu2(adjs, h, None if keys is None else keys[1])
