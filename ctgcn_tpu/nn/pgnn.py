# coding: utf-8
"""P-GNN (Position-aware GNN) — TPU-native.

Covers the reference's PGNN (baseline/pgnn.py:20-267).

  * All-pairs shortest-path precompute: the reference spawns a
    multiprocessing pool of networkx BFS traversals (pgnn.py:20-93); here
    ``scipy.sparse.csgraph`` computes the same 1/(d+1) proximity matrix
    (0 for disconnected) in C.
  * Anchor sets (pgnn.py:96-142): m = log2(N) size tiers, c·m sets per
    tier, drawn WITHOUT replacement.  Selection happens on device from a
    PRNG key (top-k of random scores == uniform sampling without
    replacement), so re-anchoring per batch stays inside jit like the
    reference's per-forward ``preselect_anchor``.
  * PGNN_layer (pgnn.py:173-206): messages from each node's closest anchor
    per set, [msg ‖ self] → Linear → ReLU; position head = per-set scalar;
    structure = mean over sets.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ctgcn_tpu.nn.gcn import _dropout
from ctgcn_tpu.nn.layers import Linear


def precompute_dist_data(edge_list, node_num, approximate=-1):
    """Host-side: [T, N, N] proximity matrices 1/(spd+1), 0 if disconnected.

    edge_list: list of [2, E] int arrays (both directions present).
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import dijkstra

    out = []
    limit = float(approximate) if approximate and approximate > 0 else np.inf
    for ei in edge_list:
        ei = np.asarray(ei)
        data = np.ones(ei.shape[1])
        A = sp.coo_matrix((data, (ei[0], ei[1])),
                          shape=(node_num, node_num)).tocsr()
        d = dijkstra(A, directed=False, unweighted=True, limit=limit)
        prox = np.where(np.isfinite(d), 1.0 / (d + 1.0), 0.0)
        out.append(prox.astype(np.float32))
    return np.stack(out)


def anchor_sizes(n, c=1.0):
    """Static anchor-set size list (reference pgnn.py:96-104)."""
    m = int(np.log2(n))
    copy = int(c * m)
    sizes = []
    for i in range(m):
        sizes.extend([int(n / np.exp2(i + 1))] * copy)
    return sizes


def select_anchor_dists(key, dists, sizes):
    """Device-side anchor selection + per-set closest-anchor reduction.

    Args:
      dists: [N, N] proximity matrix for one snapshot.
      sizes: static list of anchor-set sizes.
    Returns (dist_max [N, A], dist_argmax int32[N, A]).
    """
    n = dists.shape[0]
    keys = jax.random.split(key, len(sizes))
    maxs, argmaxs = [], []
    for s, k in zip(sizes, keys):
        scores = jax.random.uniform(k, (n,))
        _, anchor_idx = jax.lax.top_k(scores, max(s, 1))  # w/o replacement
        sub = dists[:, anchor_idx]                        # [N, s]
        j = jnp.argmax(sub, axis=1)
        maxs.append(jnp.take_along_axis(sub, j[:, None], axis=1)[:, 0])
        argmaxs.append(anchor_idx[j])
    return jnp.stack(maxs, axis=1), jnp.stack(argmaxs, axis=1)


def _xavier_relu(key, shape):
    gain = float(np.sqrt(2.0))  # torch calculate_gain('relu')
    bound = gain * np.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def _lin(key, din, dout, bias=True):
    return Linear(weight=_xavier_relu(key, (din, dout)),
                  bias=jnp.zeros((dout,)) if bias else None)


@struct.dataclass
class Nonlinear:
    linear1: Linear
    linear2: Linear

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, bias=True):
        k1, k2 = jax.random.split(key)
        return Nonlinear(linear1=_lin(k1, input_dim, hidden_dim, bias),
                         linear2=_lin(k2, hidden_dim, output_dim, bias))

    def __call__(self, x):
        return self.linear2(jax.nn.relu(self.linear1(x)))


@struct.dataclass
class PGNNLayer:
    dist_compute: Nonlinear
    linear_hidden: Linear
    linear_out_position: Linear

    @staticmethod
    def init(key, input_dim, output_dim, bias=True):
        k1, k2, k3 = jax.random.split(key, 3)
        return PGNNLayer(
            dist_compute=Nonlinear.init(k1, 1, output_dim, 1, bias),
            linear_hidden=_lin(k2, input_dim * 2, output_dim, bias),
            linear_out_position=_lin(k3, output_dim, 1, bias))

    def __call__(self, feature, dists_max, dists_argmax):
        dm = self.dist_compute(dists_max[..., None])[..., 0]  # [N, A]
        subset = feature[dists_argmax]                        # [N, A, d]
        messages = subset * dm[..., None]
        self_feat = jnp.broadcast_to(feature[:, None, :],
                                     subset.shape)
        messages = jnp.concatenate([messages, self_feat], axis=-1)
        messages = jax.nn.relu(self.linear_hidden(messages))  # [N, A, out]
        out_position = self.linear_out_position(messages)[..., 0]  # [N, A]
        out_structure = jnp.mean(messages, axis=1)
        return out_position, out_structure


@struct.dataclass
class PGNN:
    linear_pre: Linear | None
    conv_first: PGNNLayer
    conv_hidden: tuple
    conv_out: PGNNLayer | None
    layer_num: int = struct.field(pytree_node=False)
    dropout: float = struct.field(pytree_node=False)

    method_name = property(lambda self: "PGNN")

    @staticmethod
    def init(key, input_dim, feature_dim, hidden_dim, output_dim,
             feature_pre=True, layer_num=2, dropout=0.5, bias=True):
        if layer_num == 1:
            hidden_dim = output_dim
        keys = jax.random.split(key, layer_num + 2)
        linear_pre = (_lin(keys[0], input_dim, feature_dim, bias)
                      if feature_pre else None)
        conv_first = PGNNLayer.init(
            keys[1], feature_dim if feature_pre else input_dim, hidden_dim,
            bias)
        conv_hidden = tuple(
            PGNNLayer.init(keys[2 + i], hidden_dim, hidden_dim, bias)
            for i in range(max(layer_num - 2, 0)))
        conv_out = (PGNNLayer.init(keys[layer_num + 1], hidden_dim,
                                   output_dim, bias)
                    if layer_num > 1 else None)
        return PGNN(linear_pre=linear_pre, conv_first=conv_first,
                    conv_hidden=conv_hidden, conv_out=conv_out,
                    layer_num=layer_num, dropout=dropout)

    def single(self, x, dists_max, dists_argmax, key=None):
        ks = (jax.random.split(key, self.layer_num)
              if key is not None else [None] * self.layer_num)
        if self.linear_pre is not None:
            x = (self.linear_pre.weight + self.linear_pre.bias if x is None
                 else self.linear_pre(x))
        x_position, x = self.conv_first(x, dists_max, dists_argmax)
        if self.layer_num == 1:
            return x_position
        x = _dropout(x, self.dropout, ks[0])
        for i, conv in enumerate(self.conv_hidden):
            _, x = conv(x, dists_max, dists_argmax)
            x = _dropout(x, self.dropout, ks[1 + i])
        x_position, _ = self.conv_out(x, dists_max, dists_argmax)
        nrm = jnp.maximum(
            jnp.linalg.norm(x_position, axis=-1, keepdims=True), 1e-12)
        return x_position / nrm

    def __call__(self, xs, dist_data, key=None):
        """dist_data: (dists_max [T, N, A], dists_argmax [T, N, A])."""
        dm, da = dist_data
        T = dm.shape[0]
        keys = jax.random.split(key, T) if key is not None else None
        if xs is None:
            if keys is None:
                return jax.vmap(lambda m, a: self.single(None, m, a))(dm, da)
            return jax.vmap(lambda m, a, k: self.single(None, m, a, k))(
                dm, da, keys)
        if keys is None:
            return jax.vmap(lambda x, m, a: self.single(x, m, a))(xs, dm, da)
        return jax.vmap(self.single)(xs, dm, da, keys)
