# coding: utf-8
"""Device mesh + sharded CTGCN training step.

Strategy (see package docstring): the flagship CTGCN's per-timestep
parameter stacks and pyramid banks all carry a leading [T] axis, so the
natural first parallel axis is time.  Sharding every [T]-leading leaf over
the mesh's ``time`` axis makes the per-timestep MLP+CDN forward (the FLOPs)
fully parallel; XLA inserts the all-gather for the [T, N, d] tensor entering
the temporal RNN and the psum for gradient reduction — collectives ride ICI.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="time"):
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis_name,))


def replicate(mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_over_time(mesh, tree, axis_name="time"):
    """Place every array leaf with a leading [T] axis on the mesh's time
    axis (T must divide the mesh size or vice versa — pad T upstream)."""
    sharding = NamedSharding(mesh, P(axis_name))

    def place(leaf):
        return jax.device_put(leaf, sharding)

    return jax.tree.map(place, tree)


def time_sharding_for(mesh, tree, axis_name="time"):
    """PartitionSpec pytree: leading-axis sharding for [T]-leading leaves."""
    t_spec = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda _: t_spec, tree)


def embedding_shardings(mesh, model, data, time_length, axis_name="time"):
    """Per-leaf shardings for the PRODUCT embedding pipeline (the config's
    ``n_devices`` key routes UnsupervisedEmbedding / SupervisedEmbedding
    through these — SURVEY §2.5 disposition: time-axis parallel first).

    Policy: model leaves under time-stacked containers (``mlps`` / ``cdns``
    / ``gcns`` — per-timestep distinct parameter stacks) shard over the
    mesh's time axis, as does every data leaf whose leading dim equals the
    window length; everything else replicates.  GSPMD propagates from these
    input placements (per-timestep MLP+CDN forwards run fully parallel; the
    [T, N, d] all-gather feeding the temporal RNN and the grad psum ride
    ICI).  Uneven T vs mesh size is fine — GSPMD pads internally.

    Returns (model_shardings, data_shardings) pytrees.
    """
    t_sharding = NamedSharding(mesh, P(axis_name))
    r_sharding = NamedSharding(mesh, P())
    stacked = {"mlps", "cdns", "gcns"}

    def model_spec(path, leaf):
        top = path[0].name if path and hasattr(path[0], "name") else ""
        return t_sharding if top in stacked else r_sharding

    m_shard = jax.tree_util.tree_map_with_path(model_spec, model)

    def data_spec(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[0] == time_length):
            return t_sharding
        return r_sharding

    d_shard = jax.tree.map(data_spec, data)
    return m_shard, d_shard


def make_ctgcn_train_step(mesh, model_template, optimizer, loss_fn,
                          axis_name="time", donate=True):
    """Build a jitted sharded CTGCN train step.

    The CTGCN pytree mixes time-stacked leaves (``mlps``/``cdns``) and
    replicated leaves (``rnn``/``norm``); shardings are assigned per-leaf.

    Args:
      loss_fn: (model, pyramids, xs, key) -> scalar.
    Returns (train_step, place_model, place_opt_state) where train_step is
    jit(model, opt_state, pyramids, xs, key) -> (model, opt_state, loss).
    """
    t_sharding = NamedSharding(mesh, P(axis_name))
    r_sharding = NamedSharding(mesh, P())

    def model_shardings(model):
        stacked = {"mlps", "cdns", "gcns"}

        def spec_for(path, leaf):
            top = path[0].name if path else ""
            return t_sharding if top in stacked else r_sharding

        return jax.tree_util.tree_map_with_path(spec_for, model)

    m_shard = model_shardings(model_template)
    opt_template = jax.eval_shape(optimizer.init, model_template)
    # optimizer moments mirror param shapes → mirror param shardings where
    # shapes match, else replicate
    o_shard = _mirror_opt_shardings(opt_template, model_template, m_shard,
                                    r_sharding)

    def place_model(model):
        return jax.tree.map(jax.device_put, model, m_shard)

    def place_opt_state(opt_state):
        return jax.tree.map(jax.device_put, opt_state, o_shard)

    donate_argnums = (0, 1) if donate else ()

    @jax.jit
    def train_step(model, opt_state, pyramids, xs, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, pyramids, xs, key)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return train_step, place_model, place_opt_state


def _mirror_opt_shardings(opt_template, model_template, m_shard, r_sharding):
    """Adam moments are param-shaped pytrees nested inside the opt state;
    give each leaf the matching param sharding when shapes line up."""
    flat_params, _ = jax.tree_util.tree_flatten(model_template)
    flat_shards, _ = jax.tree_util.tree_flatten(m_shard)
    shape_to_shard = {}
    for p, s in zip(flat_params, flat_shards):
        if hasattr(p, "shape"):
            shape_to_shard.setdefault(p.shape, s)

    def pick(leaf):
        if hasattr(leaf, "shape") and leaf.shape in shape_to_shard:
            return shape_to_shard[leaf.shape]
        return r_sharding

    return jax.tree.map(pick, opt_template)
