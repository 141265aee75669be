# coding: utf-8
"""Prediction heads: MLPClassifier, InnerProduct edge scorer, EdgeClassifier.

Parity notes:
  * The reference MLPClassifier constructs ``duration`` MLPs but only ever
    applies ``mlp_list[0]`` (reference models.py:65-82, line 81).  Since the
    extra modules are dead parameters with no effect on outputs, this
    implementation holds exactly one MLP.
  * InnerProduct (reference models.py:86-113) computes per-edge
    ``sum(z_i * z_j)`` (or the elementwise product when ``reduce=False``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ctgcn_tpu.nn.layers import MLP


@struct.dataclass
class MLPClassifier:
    mlp: MLP

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, layer_num, duration=1,
             bias=True, activate_type="N"):
        del duration  # reference quirk: only mlp_list[0] is ever used
        return MLPClassifier(
            mlp=MLP.init(key, input_dim, hidden_dim, output_dim, layer_num,
                         bias=bias, activate_type=activate_type)
        )

    def __call__(self, x, batch_indices=None):
        """x: [N, d] or [T, N, d]; batch_indices: [B] or [T, B] row gather."""
        if x.ndim == 3:
            if batch_indices is None:
                return jax.vmap(self.mlp)(x)
            return jax.vmap(lambda e, idx: self.mlp(e[idx]))(x, batch_indices)
        if batch_indices is not None:
            x = x[batch_indices]
        return self.mlp(x)


def inner_product(x, edge_index, reduce=True):
    """Per-edge inner product scores (reference models.py:105-113).

    Args:
      x: [N, d] or [T, N, d] embeddings.
      edge_index: [2, E] or [T, 2, E] int edge endpoints.
    Returns [E] scores (or [E, d] when reduce=False); leading T axis mapped.
    """
    if x.ndim == 3:
        return jax.vmap(lambda e, ei: inner_product(e, ei, reduce))(
            x, edge_index)
    zi = x[edge_index[0]]
    zj = x[edge_index[1]]
    prod = zi * zj
    return jnp.sum(prod, axis=-1) if reduce else prod


@struct.dataclass
class EdgeClassifier:
    """InnerProduct(reduce=False) → MLPClassifier (reference models.py:116-125)."""

    classifier: MLPClassifier

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, layer_num, duration=1,
             bias=True, activate_type="N"):
        return EdgeClassifier(
            classifier=MLPClassifier.init(key, input_dim, hidden_dim,
                                          output_dim, layer_num, duration,
                                          bias=bias,
                                          activate_type=activate_type)
        )

    def __call__(self, x, edge_index):
        feats = inner_product(x, edge_index, reduce=False)
        return self.classifier(feats)
