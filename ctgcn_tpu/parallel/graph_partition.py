# coding: utf-8
"""Edge/row-partitioned SpMM across a device mesh.

The scale-out story for large snapshots (SURVEY §7, new capability — the
reference is single-device): partition each snapshot's adjacency by
destination-node row blocks across the mesh's ``graph`` axis.  Each chip
owns a row slab of the output; the feature matrix is all-gathered over ICI
(1D-partitioned SpMV pattern) and aggregation is purely local — the only
collective per SpMM is the x all-gather, which XLA overlaps with local
compute where profitable.

Containers are host-partitioned once per snapshot: a [P, cap] padded COO
slab bank with rows rebased to slab-local indices.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ctgcn_tpu.utils import pad_bucket


@struct.dataclass
class PartitionedGraph:
    """Row-partitioned padded COO: leaves carry a leading [parts] axis.

    rows: int32[parts, cap] — slab-LOCAL row ids (0 for padding).
    cols: int32[parts, cap] — global column ids.
    vals: f32[parts, cap]   — 0 for padding.
    rows_per_part / n_cols: static sizes (n_rows = parts * rows_per_part,
    padded with empty rows).
    """

    rows: jnp.ndarray
    cols: jnp.ndarray
    vals: jnp.ndarray
    rows_per_part: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)

    @property
    def parts(self) -> int:
        return int(self.rows.shape[0])

    @property
    def n_rows(self) -> int:
        return self.parts * self.rows_per_part


def partition_graph(mat, n_parts, cap=None) -> PartitionedGraph:
    """scipy sparse [N, M] → row-partitioned slabs (host side)."""
    coo = mat.tocoo()
    n, m = mat.shape
    rows_per_part = -(-(-(-n // n_parts)) // 8) * 8  # mult of 8 sublanes
    keep = coo.data != 0
    r, c, v = coo.row[keep], coo.col[keep], coo.data[keep]
    part = r // rows_per_part
    local_r = r % rows_per_part
    counts = np.bincount(part, minlength=n_parts)
    cap = int(cap) if cap is not None else pad_bucket(max(int(counts.max()), 1))
    rows = np.zeros((n_parts, cap), np.int32)
    cols = np.zeros((n_parts, cap), np.int32)
    vals = np.zeros((n_parts, cap), np.float32)
    order = np.lexsort((c, local_r, part))
    part, local_r, c, v = part[order], local_r[order], c[order], v[order]
    offsets = np.zeros(n_parts, np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for p in range(n_parts):
        s, e = starts[p], starts[p] + counts[p]
        rows[p, : counts[p]] = local_r[s:e]
        cols[p, : counts[p]] = c[s:e]
        vals[p, : counts[p]] = v[s:e]
    del offsets
    return PartitionedGraph(rows=jnp.asarray(rows), cols=jnp.asarray(cols),
                            vals=jnp.asarray(vals),
                            rows_per_part=int(rows_per_part), n_cols=int(m))


def place_partitioned(mesh, pg: PartitionedGraph, axis="graph"):
    """Shard the slab bank's leading axis over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), pg)


def sharded_spmm(mesh, pg: PartitionedGraph, x, axis="graph"):
    """A @ x with A row-partitioned over the mesh.

    x: [n_cols, d] — may be sharded over its rows along ``axis`` (the usual
    node-sharded layout); it is all-gathered inside.  Returns [n_rows, d]
    sharded over rows along ``axis``.
    """
    def local_spmm(rows, cols, vals, x_shard):
        # rows/cols/vals: [1, cap] local slab; x_shard: [n_cols/P, d]
        x_full = jax.lax.all_gather(x_shard, axis, axis=0, tiled=True)
        gathered = x_full[cols[0]] * vals[0][:, None]
        out = jax.ops.segment_sum(gathered, rows[0],
                                  num_segments=pg.rows_per_part,
                                  indices_are_sorted=True)
        return out

    fn = shard_map(
        local_spmm, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(pg.rows, pg.cols, pg.vals, x)


def sharded_gcn_layer(mesh, pg: PartitionedGraph, x, weight, bias=None,
                      axis="graph"):
    """One row-sharded graph convolution: spmm(A, x @ W) + b.

    x sharded by rows over ``axis``; W/b replicated; output row-sharded.
    """
    h = x @ weight  # local rows x full W — no comms
    out = sharded_spmm(mesh, pg, h, axis=axis)
    if bias is not None:
        out = out + bias
    return out


# ---------------------------------------------------------------------------
# Halo exchange: boundary features via all_to_all instead of a full
# all-gather (SURVEY §7.1 — the scalable 1D pattern).  Comms volume per chip
# is parts × halo_width × d instead of n_cols × d.
# ---------------------------------------------------------------------------

@struct.dataclass
class HaloPartitionedGraph:
    """Destination-block partitioned COO with precomputed halo exchange.

    Each part owns output rows [p·rpp, (p+1)·rpp) and the matching x row
    slab.  Edges are split host-side into LOCAL (column owned by this part)
    and REMOTE (column owned by another part, reached through the halo
    buffer).  ``halo_send[q, p, :]`` lists the q-local x rows that part q
    ships to part p in the all_to_all; remote column ids are pre-remapped
    into the receive buffer's [parts·halo_width] index space.

    Leaves (leading [parts] axis shards over the mesh):
      local_rows / local_cols / local_vals: [P, capL] slab-local COO.
      remote_rows / remote_idx / remote_vals: [P, capR]; remote_idx indexes
        the flattened [P·H, d] receive buffer.
      halo_send: [P, P, H] q-local x-row ids (entry [q, p, j]; padding
        repeats row 0 — receivers never read padded slots).
    """

    local_rows: jnp.ndarray
    local_cols: jnp.ndarray
    local_vals: jnp.ndarray
    remote_rows: jnp.ndarray
    remote_idx: jnp.ndarray
    remote_vals: jnp.ndarray
    halo_send: jnp.ndarray
    rows_per_part: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    halo_width: int = struct.field(pytree_node=False)

    @property
    def parts(self) -> int:
        return int(self.local_rows.shape[0])

    @property
    def n_rows(self) -> int:
        return self.parts * self.rows_per_part

    @property
    def comm_rows_per_chip(self) -> int:
        """x rows each chip ships per SpMM (vs n_cols for all-gather)."""
        return self.parts * self.halo_width


def partition_graph_halo(mat, n_parts) -> HaloPartitionedGraph:
    """scipy sparse [N, M] → destination-block slabs + halo plan (host).

    M must equal N (square adjacency) so the x slab layout matches the
    output row layout."""
    coo = mat.tocoo()
    n, m = mat.shape
    assert n == m, "halo partitioning assumes a square adjacency"
    rows_per_part = -(-(-(-n // n_parts)) // 8) * 8
    keep = coo.data != 0
    r = coo.row[keep].astype(np.int64)
    c = coo.col[keep].astype(np.int64)
    v = coo.data[keep].astype(np.float32)
    part = r // rows_per_part
    col_part = c // rows_per_part
    is_local = part == col_part

    # per-(q → p) halo column lists
    halo_cols = {}  # (q, p) -> sorted unique global col ids
    for p in range(n_parts):
        sel = (part == p) & ~is_local
        if not sel.any():
            continue
        for q in np.unique(col_part[sel]):
            qsel = sel & (col_part == q)
            halo_cols[(int(q), p)] = np.unique(c[qsel])
    H = max((len(x) for x in halo_cols.values()), default=1)
    halo_send = np.zeros((n_parts, n_parts, H), np.int32)
    for (q, p), cols_qp in halo_cols.items():
        halo_send[q, p, : len(cols_qp)] = cols_qp - q * rows_per_part

    def pack(sel_mask, remap):
        counts = np.bincount(part[sel_mask], minlength=n_parts)
        cap = pad_bucket(max(int(counts.max()), 1))
        rows_a = np.zeros((n_parts, cap), np.int32)
        cols_a = np.zeros((n_parts, cap), np.int32)
        vals_a = np.zeros((n_parts, cap), np.float32)
        pp = part[sel_mask]
        rr = (r[sel_mask] % rows_per_part).astype(np.int64)
        cc = remap
        vv = v[sel_mask]
        order = np.lexsort((cc, rr, pp))
        pp, rr, cc, vv = pp[order], rr[order], cc[order], vv[order]
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        for p in range(n_parts):
            s, e = starts[p], starts[p] + counts[p]
            rows_a[p, : counts[p]] = rr[s:e]
            cols_a[p, : counts[p]] = cc[s:e]
            vals_a[p, : counts[p]] = vv[s:e]
        return rows_a, cols_a, vals_a

    l_rows, l_cols, l_vals = pack(is_local, c[is_local] % rows_per_part)

    # remote columns → receive-buffer slots: slot(q, j) = q·H + j where j is
    # the column's rank in the (q → p) halo list
    rsel = ~is_local
    remote_slot = np.zeros(int(rsel.sum()), np.int64)
    ridx = np.flatnonzero(rsel)
    for (q, p), cols_qp in halo_cols.items():
        esel = (part[ridx] == p) & (col_part[ridx] == q)
        pos = np.searchsorted(cols_qp, c[ridx[esel]])
        remote_slot[esel] = q * H + pos
    r_rows, r_idx, r_vals = pack(rsel, remote_slot)

    return HaloPartitionedGraph(
        local_rows=jnp.asarray(l_rows), local_cols=jnp.asarray(l_cols),
        local_vals=jnp.asarray(l_vals), remote_rows=jnp.asarray(r_rows),
        remote_idx=jnp.asarray(r_idx), remote_vals=jnp.asarray(r_vals),
        halo_send=jnp.asarray(halo_send), rows_per_part=int(rows_per_part),
        n_cols=int(m), halo_width=int(H))


def sharded_spmm_halo(mesh, hpg: HaloPartitionedGraph, x, axis="graph"):
    """A @ x with boundary-only feature exchange.

    x: [n_rows, d] sharded over rows along ``axis``.  Per chip: ship the
    precomputed boundary rows via all_to_all (parts·H·d values instead of
    the n_cols·d all-gather), aggregate LOCAL edges while the collective is
    in flight (XLA's latency-hiding scheduler overlaps them — out_local
    has no data dependence on the exchange), then add remote
    contributions gathered from the receive buffer."""
    rpp = hpg.rows_per_part

    def local_fn(l_rows, l_cols, l_vals, r_rows, r_idx, r_vals, send, x_shard):
        # leaves arrive with the leading parts axis sliced to 1
        send_buf = x_shard[send[0]]          # [P, H, d]
        recv = jax.lax.all_to_all(send_buf, axis, split_axis=0,
                                  concat_axis=0, tiled=False)
        out_local = jax.ops.segment_sum(
            x_shard[l_cols[0]] * l_vals[0][:, None], l_rows[0],
            num_segments=rpp, indices_are_sorted=True)
        recv_flat = recv.reshape(-1, x_shard.shape[-1])  # [P·H, d]
        out_remote = jax.ops.segment_sum(
            recv_flat[r_idx[0]] * r_vals[0][:, None], r_rows[0],
            num_segments=rpp, indices_are_sorted=True)
        return out_local + out_remote

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(hpg.local_rows, hpg.local_cols, hpg.local_vals,
              hpg.remote_rows, hpg.remote_idx, hpg.remote_vals,
              hpg.halo_send, x)


# ---------------------------------------------------------------------------
# Product wiring: full GCN forward over halo-partitioned snapshots.  The
# config keys ``graph_partition: true`` + ``n_devices`` route static-GNN
# embedding runs through this path from gnn_embedding (training/driver.py) —
# a single large snapshot is split across the mesh's ``graph`` axis instead
# of replicated (SURVEY §7.1's scale-out mandate; the reference's answer to
# big snapshots is "use a bigger GPU", README.md:178).
# ---------------------------------------------------------------------------

def halo_spmm_layer(mesh, hpg: HaloPartitionedGraph, support, n_nodes,
                    axis="graph"):
    """``A @ support`` through the halo exchange, padding/cropping between
    the model's [N, d] row space and the partition's [parts·rpp, d]."""
    pad = hpg.n_rows - support.shape[0]
    if pad:
        support = jnp.pad(support, ((0, pad), (0, 0)))
    return sharded_spmm_halo(mesh, hpg, support, axis=axis)[:n_nodes]


def halo_gcn_forward(mesh, gcn, xs, hpgs, n_nodes, key=None, axis="graph"):
    """GCN window forward with every SpMM halo-partitioned over ``axis``.

    gcn: nn.gcn.GCN (weights replicated); xs: [T, N, in] or None (identity
    features — I @ W == W); hpgs: per-snapshot HaloPartitionedGraphs (a
    tuple — per-snapshot capacities differ, so snapshots loop rather than
    vmap).  Matches GCN.__call__ numerics up to reduction order.
    """
    from ctgcn_tpu.nn.gcn import _dropout

    def conv(layer, h, hpg):
        support = layer.weight if h is None else h @ layer.weight
        out = halo_spmm_layer(mesh, hpg, support, n_nodes, axis=axis)
        return out if layer.bias is None else out + layer.bias

    T = len(hpgs)
    keys = jax.random.split(key, T) if key is not None else [None] * T
    outs = []
    for t, hpg in enumerate(hpgs):
        x = None if xs is None else xs[t]
        h = jax.nn.relu(conv(gcn.gc1, x, hpg))
        h = _dropout(h, gcn.dropout, keys[t])
        outs.append(conv(gcn.gc2, h, hpg))
    return jnp.stack(outs)
