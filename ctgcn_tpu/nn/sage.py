# coding: utf-8
"""GraphSAGE — TPU-native.

Covers the reference's SAGE/TgSAGE (baseline/sage.py:18-217): pre-linear,
two SAGE layers with sampled neighbor aggregation (sum/average/max pooling),
concat [self ‖ neigh] → Linear → ReLU → row-L2-normalize, dropout between
layers.  The reference's per-forward dense mask matmul over python neighbor
sets (sage.py:50-77) becomes vectorized gathers over a padded neighbor table.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ctgcn_tpu.nn.layers import Linear
from ctgcn_tpu.nn.gcn import _dropout
from ctgcn_tpu.ops.neighbors import sample_neighbors


def _l2_normalize(h):
    nrm = jnp.maximum(jnp.linalg.norm(h, axis=1, keepdims=True), 1e-12)
    return h / nrm


@struct.dataclass
class SAGELayer:
    linear: Linear
    num_sample: int = struct.field(pytree_node=False)
    pooling_type: str = struct.field(pytree_node=False)
    gcn: bool = struct.field(pytree_node=False)

    @staticmethod
    def init(key, input_dim, output_dim, num_sample=10, pooling_type="sum",
             gcn=False, bias=True):
        assert pooling_type in ("sum", "average", "max")
        in_dim = input_dim if gcn else 2 * input_dim
        return SAGELayer(linear=Linear.init(key, in_dim, output_dim, bias),
                         num_sample=num_sample, pooling_type=pooling_type,
                         gcn=gcn)

    def __call__(self, x, nbr_t, deg_t, key):
        if self.num_sample is None:  # no sampling: use all neighbors
            idx = nbr_t
            mask = jnp.arange(nbr_t.shape[1])[None, :] < deg_t[:, None]
        else:
            idx, mask = sample_neighbors(nbr_t, deg_t, self.num_sample, key)
        feats = x[idx]  # [N, S, d]
        if self.pooling_type == "max":
            feats = jnp.where(mask[:, :, None], feats, -jnp.inf)
            neigh = jnp.where(
                mask.any(axis=1, keepdims=True), jnp.max(feats, axis=1), 0.0)
        else:
            feats = jnp.where(mask[:, :, None], feats, 0.0)
            neigh = jnp.sum(feats, axis=1)
            if self.pooling_type == "average":
                cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
                neigh = neigh / cnt
        combined = neigh if self.gcn else jnp.concatenate([x, neigh], axis=1)
        return _l2_normalize(jax.nn.relu(self.linear(combined)))


@struct.dataclass
class SAGE:
    linear: Linear
    sage1: SAGELayer
    sage2: SAGELayer
    dropout: float = struct.field(pytree_node=False)

    method_name = property(lambda self: "SAGE")

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, num_sample=10,
             pooling_type="sum", gcn=False, dropout=0.5, bias=True):
        k0, k1, k2 = jax.random.split(key, 3)
        return SAGE(
            linear=Linear.init(k0, input_dim, hidden_dim, bias),
            sage1=SAGELayer.init(k1, hidden_dim, hidden_dim, num_sample,
                                 pooling_type, gcn, bias),
            sage2=SAGELayer.init(k2, hidden_dim, output_dim, num_sample,
                                 pooling_type, gcn, bias),
            dropout=dropout)

    def single(self, x, nbr_t, deg_t, key):
        k1, k2, k3 = jax.random.split(key, 3)
        # identity fast path: I @ W == W
        h = (self.linear.weight + self.linear.bias if x is None
             else self.linear(x))
        h = self.sage1(h, nbr_t, deg_t, k1)
        h = _dropout(h, self.dropout, k2)
        return self.sage2(h, nbr_t, deg_t, k3)

    def __call__(self, xs, neighbor_data, key=None):
        """neighbor_data: (nbr [T, N, D], deg [T, N])."""
        nbr, deg = neighbor_data
        T = nbr.shape[0]
        if key is None:
            key = jax.random.key(0)  # sampling always needs randomness
        keys = jax.random.split(key, T)
        if xs is None:
            return jax.vmap(lambda n, d, k: self.single(None, n, d, k))(
                nbr, deg, keys)
        return jax.vmap(self.single)(xs, nbr, deg, keys)
