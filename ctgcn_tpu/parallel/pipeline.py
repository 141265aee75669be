# coding: utf-8
"""Temporal pipeline parallelism for the snapshot axis.

The reference processes its "sequence" (≤100 snapshots) in a Python loop
plus one GRU (reference models.py:240-253) — single device, all snapshots
resident.  SURVEY §5's long-context analogue asks for the temporal
recurrence to be *pipelined across devices*: each stage of a ``stage``-axis
mesh owns a contiguous chunk of timesteps, the node axis is split into
microbatches, and the RNN carry flows stage→stage over ICI (`ppermute`)
while stages work on different microbatches — the classic GPipe schedule
applied to a recurrent scan:

    tick:      0      1      2      3     ...
    stage 0:  mb0    mb1    mb2    mb3
    stage 1:         mb0    mb1    mb2
    stage 2:                mb0    mb1

With P stages and K microbatches the pipeline runs P+K-1 ticks; bubble
fraction (P-1)/(P+K-1) → 0 for K ≫ P.  Memory per device drops from
O(T·N·d) to O(T/P·N·d) — the point at AS scale (T=100).

Differentiable end-to-end: the schedule is pure data flow through
`ppermute` and `lax.scan`, so JAX's transpose machinery reverses the
pipeline for the backward pass automatically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P


def _zero_carry(cell, nmb, dtype):
    from ctgcn_tpu.ops.rnn import LSTMCell

    h = jnp.zeros((nmb, cell.hidden_dim), dtype)
    if isinstance(cell, LSTMCell):
        return (h, h)
    return h


def pipelined_rnn_scan(mesh, cell, xs, axis="stage", n_microbatch=None):
    """Run a scan RNN over time, pipelined across the mesh's stage axis.

    Args:
      mesh: mesh whose ``axis`` has P devices.
      cell: ops/rnn.GRUCell or LSTMCell (scan cell: ``cell(carry, x) →
        (carry, y)`` with zero initial carry, torch semantics).
      xs: [T, N, d] inputs; T must divide by P and N by the microbatch
        count (pad upstream).
      n_microbatch: microbatches over the node axis (default P — the
        minimum that keeps every stage busy in steady state).

    Returns ys [T, N, H], identical to a plain ``rnn_scan`` over time.
    """
    T, N, _ = xs.shape
    p = mesh.shape[axis]
    assert T % p == 0, f"T={T} must divide the {p}-stage pipeline"
    k = n_microbatch or p
    assert N % k == 0, f"N={N} must divide into {k} microbatches"
    nmb = N // k
    t_chunk = T // p

    # [T, N, d] → stage-major [P, t_chunk, K, nmb, d]
    xs_s = xs.reshape(p, t_chunk, k, nmb, xs.shape[-1])

    def stage_fn(x_local, cell):
        # ``cell`` enters as an explicit replicated argument (NOT a closure:
        # closed-over leaves placed with NamedShardings by the trainer carry
        # an Auto-mesh sharding that clashes inside the Manual region)
        x_local = x_local[0]                 # [t_chunk, K, nmb, d]
        stage = jax.lax.axis_index(axis)
        zero_carry = jax.tree.map(
            lambda c: jax.lax.pcast(c, (axis,), to='varying'),
            _zero_carry(cell, nmb, xs.dtype))
        perm = [(j, (j + 1) % p) for j in range(p)]

        def tick(state, i):
            carry_in, ys_acc = state
            mb = i - stage                   # this stage's microbatch now
            active = (mb >= 0) & (mb < k)
            mb_c = jnp.clip(mb, 0, k - 1)
            x_mb = x_local[:, mb_c]          # [t_chunk, nmb, d]

            def step(c, x):
                c2 = cell(c, x)
                y = c2[0] if isinstance(c2, tuple) else c2  # LSTM: (h, c)
                return c2, y

            carry_out, ys = jax.lax.scan(step, carry_in, x_mb)
            ys_acc = ys_acc.at[:, mb_c].set(
                jnp.where(active, ys, ys_acc[:, mb_c]))
            # hand the carry to the next stage over ICI; stage 0 always
            # starts its next microbatch from the zero carry (the ring
            # wrap from the last stage is discarded there)
            carry_next = jax.tree.map(
                lambda c: jax.lax.ppermute(c, axis, perm), carry_out)
            carry_next = jax.tree.map(
                lambda cn, z: jnp.where(stage == 0, z, cn),
                carry_next, zero_carry)
            return (carry_next, ys_acc), None

        ys0 = jax.lax.pcast(
            jnp.zeros((t_chunk, k, nmb, cell.hidden_dim), xs.dtype),
            (axis,), to='varying')
        (_, ys_out), _ = jax.lax.scan(
            tick, (zero_carry, ys0), jnp.arange(k + p - 1))
        return ys_out[None]                  # [1, t_chunk, K, nmb, H]

    fn = shard_map(
        stage_fn, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
    )
    ys = fn(xs_s, cell)                      # [P, t_chunk, K, nmb, H]
    return ys.reshape(T, N, -1)


def pick_microbatch(n_nodes, n_stages, cap_factor=4):
    """Largest divisor of ``n_nodes`` at most ``cap_factor * n_stages`` —
    enough microbatches to keep every stage busy in steady state without
    shrinking the per-tick node tile below usefulness.  k=1 (no divisor)
    degenerates to sequential stage execution but stays correct."""
    for k in range(min(cap_factor * n_stages, n_nodes), 0, -1):
        if n_nodes % k == 0:
            return k  # k=1 always divides, so the loop always returns
    raise AssertionError(f"n_nodes={n_nodes} must be positive")


def ctgcn_pipelined_forward(mesh, model, xs, pyramids, axis="time",
                            n_microbatch=None):
    """CTGCN forward with the temporal RNN GPipe-pipelined over ``axis``.

    Product path for the ``temporal_pipeline`` config key: the per-timestep
    MLP+CDN stacks already shard over the mesh's time axis (GSPMD,
    parallel/mesh.embedding_shardings); this swaps the sequential
    ``rnn_scan`` for ``pipelined_rnn_scan``, so the [T, N, d] hidden bank is
    never all-gathered and the recurrence itself runs P-way pipelined —
    the SURVEY §5 long-context analogue, wired into the embedding task.

    Window length must divide by the mesh's stage count (the driver's
    ``_make_product_mesh`` guarantees it).
    """
    hx, trans = model.per_timestep(xs, pyramids)
    k = n_microbatch or pick_microbatch(hx.shape[1], mesh.shape[axis])
    outs = pipelined_rnn_scan(mesh, model.rnn, hx, axis=axis,
                              n_microbatch=k)
    out = model.norm(outs)
    if model.model_type == "C":
        return out
    return out, trans
