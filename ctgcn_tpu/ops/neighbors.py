# coding: utf-8
"""Padded neighbor tables.

SAGE's sampled aggregation and GIN's max pooling need per-node neighbor
lists (the reference rebuilds python ``lil.rows`` lists inside every forward
— baseline/sage.py:151-156, baseline/gin.py:112-119).  Here the table is
built once per window as a padded [N, max_deg] int array + degree vector,
and sampling/pooling are vectorized gathers.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def neighbor_table_from_scipy(mats):
    """scipy adjacency list → (nbr int32[T, N, D], deg int32[T, N])."""
    T = len(mats)
    n = mats[0].shape[0]
    csrs = [m.tocsr() for m in mats]
    max_deg = max(max(int(np.diff(c.indptr).max() or 0) for c in csrs), 1)
    nbr = np.zeros((T, n, max_deg), np.int32)
    deg = np.zeros((T, n), np.int32)
    for t, c in enumerate(csrs):
        d = np.diff(c.indptr)
        deg[t] = d
        for i in np.nonzero(d)[0]:
            s, e = c.indptr[i], c.indptr[i + 1]
            nbr[t, i, : e - s] = c.indices[s:e]
    return jnp.asarray(nbr), jnp.asarray(deg)


def sample_neighbors(nbr_t, deg_t, num_sample, key):
    """Per-node neighbor sample (reference sage.py:41-43 semantics):
    all neighbors when deg < num_sample, else ``num_sample`` DISTINCT ones
    via Gumbel top-k — exact without-replacement uniform sampling with
    static shapes (the reference's ``random.sample``).

    Returns (idx int32[N, S], mask bool[N, S]).
    """
    n, d = nbr_t.shape
    s = num_sample
    slots = jnp.arange(s)[None, :]
    take_all = deg_t[:, None] < s  # strictly: sample when deg >= num_sample
    gumbel = jax.random.gumbel(key, (n, d))
    nbr_valid = jnp.arange(d)[None, :] < deg_t[:, None]
    _, topk_j = jax.lax.top_k(jnp.where(nbr_valid, gumbel, -jnp.inf),
                              min(s, d))
    if topk_j.shape[1] < s:  # max table width below num_sample
        topk_j = jnp.pad(topk_j, ((0, 0), (0, s - topk_j.shape[1])))
    j = jnp.where(take_all, jnp.minimum(slots, d - 1), topk_j)
    idx = jnp.take_along_axis(nbr_t, j, axis=1)
    mask = jnp.where(take_all, slots < deg_t[:, None], True)
    mask = mask & (deg_t[:, None] > 0)
    return idx, mask


def masked_max_pool(x, nbr_t, deg_t):
    """GIN max pooling over full neighbor lists; zero rows for isolated
    nodes (reference gin.py:137-144)."""
    feats = x[nbr_t]                                # [N, D, d]
    slot_mask = (jnp.arange(nbr_t.shape[1])[None, :] < deg_t[:, None])
    feats = jnp.where(slot_mask[:, :, None], feats, -jnp.inf)
    pooled = jnp.max(feats, axis=1)
    return jnp.where(deg_t[:, None] > 0, pooled, 0.0)
