# coding: utf-8
"""GIN — TPU-native.

Covers the reference's GIN/TgGIN (baseline/gin.py:16-274): pre-linear, then
``layer_num`` GIN layers — neighbor pooling (sum via SpMM on A(+I when not
learn_eps), average with degree division, or max over neighbor tables) with
optional (1+eps_l)·h center reweighting, a BatchNorm'd inner MLP, an outer
BatchNorm, ReLU, and inter-layer dropout.

BatchNorm note: the reference's BatchNorm1d carries running statistics; the
unsupervised training/export path always runs in train mode (batch stats), so
this implementation normalizes with batch statistics throughout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ctgcn_tpu.nn.layers import Linear
from ctgcn_tpu.nn.gcn import _dropout
from ctgcn_tpu.ops.neighbors import masked_max_pool
from ctgcn_tpu.ops.sparse import SparseGraph
from ctgcn_tpu.ops.spmm import spmm


@struct.dataclass
class BatchNorm:
    scale: jnp.ndarray
    offset: jnp.ndarray
    eps: float = struct.field(pytree_node=False, default=1e-5)

    @staticmethod
    def init(dim, eps=1e-5):
        return BatchNorm(scale=jnp.ones((dim,), jnp.float32),
                         offset=jnp.zeros((dim,), jnp.float32), eps=eps)

    def __call__(self, x):
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.var(x, axis=0, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * self.scale \
            + self.offset


@struct.dataclass
class GinMLP:
    """Inner GIN MLP with BatchNorm+ReLU between layers, linear last
    (reference baseline/gin.py:16-58)."""

    layers: tuple        # Linear
    norms: tuple         # BatchNorm (layer_num - 1 of them)

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, layer_num, bias=True):
        assert layer_num >= 1
        keys = jax.random.split(key, layer_num)
        if layer_num == 1:
            return GinMLP(layers=(Linear.init(keys[0], input_dim, output_dim,
                                              bias),), norms=())
        dims = [input_dim] + [hidden_dim] * (layer_num - 1) + [output_dim]
        layers = tuple(Linear.init(keys[i], dims[i], dims[i + 1], bias)
                       for i in range(layer_num))
        norms = tuple(BatchNorm.init(hidden_dim)
                      for _ in range(layer_num - 1))
        return GinMLP(layers=layers, norms=norms)

    def __call__(self, x):
        if not self.norms:
            return self.layers[0](x)
        h = x
        for lin, bn in zip(self.layers[:-1], self.norms):
            h = jax.nn.relu(bn(lin(h)))
        return self.layers[-1](h)


@struct.dataclass
class GIN:
    linear: Linear
    mlps: tuple          # GinMLP per layer
    norms: tuple         # outer BatchNorm per layer
    eps: jnp.ndarray     # [layer_num]
    learn_eps: bool = struct.field(pytree_node=False)
    pooling_type: str = struct.field(pytree_node=False)
    dropout: float = struct.field(pytree_node=False)

    method_name = property(lambda self: "GIN")

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, layer_num,
             mlp_layer_num, learn_eps=True, pooling_type="sum", dropout=0.5,
             bias=True):
        assert pooling_type in ("sum", "average", "max")
        keys = jax.random.split(key, layer_num + 1)
        mlps, norms = [], []
        for layer in range(layer_num):
            out = output_dim if layer == layer_num - 1 else hidden_dim
            mlps.append(GinMLP.init(keys[layer], hidden_dim, hidden_dim, out,
                                    mlp_layer_num, bias=bias))
            norms.append(BatchNorm.init(out))
        return GIN(linear=Linear.init(keys[layer_num], input_dim, hidden_dim,
                                      bias=True),
                   mlps=tuple(mlps), norms=tuple(norms),
                   eps=jnp.zeros((layer_num,), jnp.float32),
                   learn_eps=learn_eps, pooling_type=pooling_type,
                   dropout=dropout)

    def single(self, x, adj: SparseGraph, nbr_t, deg_t, key=None):
        """adj must already include +I when learn_eps is False (the driver
        mirrors reference gin.py:120-133)."""
        n_layers = len(self.mlps)
        keys = (jax.random.split(key, n_layers)
                if key is not None else [None] * n_layers)
        h = (self.linear.weight + self.linear.bias if x is None
             else self.linear(x))
        for layer in range(n_layers):
            if self.pooling_type == "max":
                pooled = masked_max_pool(h, nbr_t, deg_t)
            else:
                pooled = spmm(adj, h)
                if self.pooling_type == "average":
                    degree = spmm(adj, jnp.ones((adj.n_rows, 1), h.dtype))
                    pooled = pooled / jnp.maximum(degree, 1e-12)
            if self.learn_eps:
                pooled = pooled + (1.0 + self.eps[layer]) * h
            h = jax.nn.relu(self.norms[layer](self.mlps[layer](pooled)))
            if layer < n_layers - 1:
                h = _dropout(h, self.dropout, keys[layer])
        return h

    def __call__(self, xs, adjs, neighbor_data=None, key=None):
        T = adjs.rows.shape[0]
        keys = jax.random.split(key, T) if key is not None else None
        if neighbor_data is None:
            zero_n = jnp.zeros((T, adjs.n_rows, 1), jnp.int32)
            zero_d = jnp.zeros((T, adjs.n_rows), jnp.int32)
            neighbor_data = (zero_n, zero_d)
        nbr, deg = neighbor_data

        def one(x, a, n, d, k):
            return self.single(x, a, n, d, k)

        if xs is None:
            if keys is None:
                return jax.vmap(lambda a, n, d: one(None, a, n, d, None))(
                    adjs, nbr, deg)
            return jax.vmap(lambda a, n, d, k: one(None, a, n, d, k))(
                adjs, nbr, deg, keys)
        if keys is None:
            return jax.vmap(lambda x, a, n, d: one(x, a, n, d, None))(
                xs, adjs, nbr, deg)
        return jax.vmap(one)(xs, adjs, nbr, deg, keys)
