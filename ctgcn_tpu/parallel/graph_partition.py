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
