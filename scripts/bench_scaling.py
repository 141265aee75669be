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


def _make_graph(rng, N, near=28, far=4):
    """Locality-rich graph (what a real partitioner produces): ring-banded
    neighbors + a sprinkle of long-range edges, so the halo exchange has
    something to win — uniformly random graphs have boundary == N."""
    import scipy.sparse as sp

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
    return A


def main():
    import json

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ctgcn_tpu.parallel.mesh import make_mesh
    from ctgcn_tpu.parallel.graph_partition import (
        partition_graph, place_partitioned,
    )

    n_devices = len(jax.devices())
    rng = np.random.RandomState(0)
    d = 128
    record = {
        "harness": "row-partitioned SpMM, all-gather vs halo all_to_all",
        "backend": jax.default_backend(),
        "n_devices": n_devices,
        "feature_dim": d,
        "note": ("virtual-mesh run: edges/s measures partitioning overhead "
                 "and collective wiring, not ICI bandwidth (no pod "
                 "available); comm_mb_per_chip is the hardware-independent "
                 "claim — halo comms scale with the partition boundary, "
                 "all-gather with N"),
        "scales": {},
    }
    for N in (32768, 131072):
        A = _make_graph(rng, N)
        print(f"devices={n_devices} N={N} nnz={A.nnz} d={d}")
        scale_res = {}
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
                iters = 10
                t0 = time.time()
                for _ in range(iters):
                    out = fn(x)
                jax.block_until_ready(out)
                dt = (time.time() - t0) / iters
                eps = A.nnz / dt
                per = scale_res.setdefault(name, {})
                per[parts] = row = {
                    "ms": round(dt * 1e3, 3),
                    "edges_per_s": round(eps, 1),
                }
                # halo has no 1-part variant; its efficiency baseline is
                # the 1-part all-gather run (identical compute, no
                # collective)
                base = per.get(sizes[0],
                               scale_res["all_gather"][sizes[0]])
                eff = eps / (base["edges_per_s"] * parts / sizes[0]) * 100
                comm_mb = comm_rows * d * 4 / 1e6
                row["scaling_eff_pct"] = round(eff, 1)
                row["comm_mb_per_chip"] = round(comm_mb, 3)
                print(f"{name:10s} parts={parts:3d}  {dt * 1e3:8.2f} ms  "
                      f"{eps / 1e6:8.1f} M edges/s   eff {eff:5.1f}%   "
                      f"comm/chip {comm_mb:7.2f} MB")
        record["scales"][f"N={N},nnz={A.nnz}"] = scale_res

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "bench_scaling.json")
    with open(out_path, "w") as fp:
        json.dump(record, fp, indent=1)
    print("wrote", out_path)


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
