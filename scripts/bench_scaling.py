# coding: utf-8
"""Scaling harness: row-partitioned SpMM edges/s vs mesh size.

Runs on any device set; with no TPU pod available it demonstrates the
harness on the virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py

On a real pod slice the same harness measures ICI scaling efficiency
(BASELINE target: >=80% edges/s going 1 chip -> N chips).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ctgcn_tpu.parallel.mesh import make_mesh
    from ctgcn_tpu.parallel.graph_partition import (
        partition_graph, partition_graph_halo, place_partitioned,
        sharded_spmm, sharded_spmm_halo,
    )

    n_devices = len(jax.devices())
    rng = np.random.RandomState(0)
    # locality-rich graph (what a real partitioner produces): ring-banded
    # neighbors + a sprinkle of long-range edges, so the halo exchange has
    # something to win — uniformly random graphs have boundary == N
    N, d = 32768, 128
    near = 28          # edges within a +-64 band per node
    far = 4            # uniformly random long-range edges per node
    row_n = np.repeat(np.arange(N), near)
    col_n = (row_n + rng.randint(1, 65, size=row_n.size)) % N
    row_f = np.repeat(np.arange(N), far)
    col_f = rng.randint(0, N, size=row_f.size)
    src = np.concatenate([row_n, row_f])
    dst = np.concatenate([col_n, col_f])
    keep = src != dst
    A = sp.coo_matrix(
        (np.ones(keep.sum(), np.float32), (src[keep], dst[keep])),
        shape=(N, N))
    A.sum_duplicates()
    print(f"devices={n_devices} N={N} nnz={A.nnz} d={d}")

    results = {}
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_devices]
    for parts in sizes:
        mesh = make_mesh(parts, axis_name="graph")
        pg = place_partitioned(mesh, partition_graph(A, parts))
        x = jax.device_put(
            jnp.asarray(rng.randn(pg.n_cols, d).astype(np.float32)),
            NamedSharding(mesh, P("graph")))

        for name, fn, comm_rows in _variants(jax, mesh, A, parts, pg,
                                             NamedSharding, P):
            out = fn(x)
            jax.block_until_ready(out)
            iters = 20
            t0 = time.time()
            for _ in range(iters):
                out = fn(x)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / iters
            eps = A.nnz / dt
            results.setdefault(name, {})[parts] = eps
            # halo has no 1-part variant; its efficiency baseline is the
            # 1-part all-gather run (identical compute, no collective)
            base = results[name].get(sizes[0],
                                     results["all_gather"][sizes[0]])
            eff = eps / (base * parts / sizes[0]) * 100
            comm_mb = comm_rows * d * 4 / 1e6
            print(f"{name:10s} parts={parts:3d}  {dt * 1e3:8.2f} ms  "
                  f"{eps / 1e6:8.1f} M edges/s   eff {eff:5.1f}%   "
                  f"comm/chip {comm_mb:7.2f} MB")


def _variants(jax, mesh, A, parts, pg, NamedSharding, P):
    """(name, jitted fn, per-chip comm rows) for all-gather vs halo."""
    from ctgcn_tpu.parallel.graph_partition import (
        partition_graph_halo, sharded_spmm, sharded_spmm_halo,
    )

    out = [("all_gather",
            jax.jit(lambda x: sharded_spmm(mesh, pg, x)), pg.n_rows)]
    if parts > 1:
        hpg_host = partition_graph_halo(A, parts)
        hpg = jax.tree.map(
            lambda leaf: jax.device_put(
                leaf, NamedSharding(mesh, P("graph")))
            if hasattr(leaf, "shape") and leaf.ndim
            and leaf.shape[0] == parts else leaf, hpg_host)
        out.append(("halo",
                    jax.jit(lambda x: sharded_spmm_halo(mesh, hpg, x)),
                    hpg.comm_rows_per_chip))
    return out


if __name__ == "__main__":
    main()
