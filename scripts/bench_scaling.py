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
        partition_graph, place_partitioned, sharded_spmm,
    )

    n_devices = len(jax.devices())
    rng = np.random.RandomState(0)
    N, d, E = 32768, 128, 2_000_000
    src = rng.randint(0, N, E)
    dst = rng.randint(0, N, E)
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

        f = jax.jit(lambda pg, x: sharded_spmm(mesh, pg, x))
        out = f(pg, x)
        jax.block_until_ready(out)
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            out = f(pg, x)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        eps = A.nnz / dt
        results[parts] = eps
        base = results[sizes[0]]
        eff = eps / (base * parts / sizes[0]) * 100
        print(f"parts={parts:3d}  {dt * 1e3:8.2f} ms  {eps / 1e6:8.1f} "
              f"M edges/s   scaling eff {eff:5.1f}%")


if __name__ == "__main__":
    main()
