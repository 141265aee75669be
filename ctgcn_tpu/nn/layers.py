# coding: utf-8
"""Basic dense layers: Linear, MLP, LayerNorm.

Parity notes (reference layers.py:67-106):
  * MLP 'N' mode applies SELU after EVERY layer including the last; 'L' mode
    is purely linear.  This quirk is load-bearing for the reference's
    embeddings and is reproduced exactly.
  * Linear init matches torch.nn.Linear: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    for both weight and bias, so untrained-forward parity tests can map
    state dicts 1:1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


@struct.dataclass
class Linear:
    weight: jnp.ndarray  # [in, out]  (x @ W + b)
    bias: jnp.ndarray | None

    @staticmethod
    def init(key, input_dim, output_dim, bias=True):
        kw, kb = jax.random.split(key)
        bound = 1.0 / float(jnp.sqrt(input_dim))
        return Linear(
            weight=_uniform(kw, (input_dim, output_dim), bound),
            bias=_uniform(kb, (output_dim,), bound) if bias else None,
        )

    def __call__(self, x):
        y = x @ self.weight
        if self.bias is not None:
            y = y + self.bias
        return y


@struct.dataclass
class MLP:
    """k-layer perceptron; activate_type 'L' (linear) or 'N' (SELU after every
    layer, including the last) — reference layers.py:95-106."""

    layers: tuple  # tuple of Linear
    activate_type: str = struct.field(pytree_node=False)

    @staticmethod
    def init(key, input_dim, hidden_dim, output_dim, layer_num, bias=True,
             activate_type="N"):
        assert activate_type in ("L", "N")
        assert layer_num > 0
        keys = jax.random.split(key, layer_num)
        if layer_num == 1:
            layers = (Linear.init(keys[0], input_dim, output_dim, bias),)
        else:
            dims = [input_dim] + [hidden_dim] * (layer_num - 1) + [output_dim]
            layers = tuple(
                Linear.init(keys[i], dims[i], dims[i + 1], bias)
                for i in range(layer_num)
            )
        return MLP(layers=layers, activate_type=activate_type)

    def __call__(self, x):
        h = x
        for lin in self.layers:
            h = lin(h)
            if self.activate_type == "N":
                h = jax.nn.selu(h)
        return h


@struct.dataclass
class LayerNorm:
    """LayerNorm over the last axis; numerics match torch.nn.LayerNorm
    (eps inside the sqrt, biased variance)."""

    scale: jnp.ndarray
    offset: jnp.ndarray
    eps: float = struct.field(pytree_node=False, default=1e-5)

    @staticmethod
    def init(dim, eps=1e-5):
        return LayerNorm(scale=jnp.ones((dim,), jnp.float32),
                         offset=jnp.zeros((dim,), jnp.float32), eps=eps)

    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * self.scale + self.offset
