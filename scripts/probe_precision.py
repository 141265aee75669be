# coding: utf-8
"""On-chip probe: dense pyramid bank matmul at HIGHEST (bf16_6x) vs HIGH
(bf16_3x) vs default (bf16 single pass) — relative error vs f64 reference
and steady-state time over the UCI window bank.

Run on the real chip:  python scripts/probe_precision.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ctgcn_tpu.main import _enable_compilation_cache
    _enable_compilation_cache()

    from ctgcn_tpu.data.loader import DataLoader
    from ctgcn_tpu.data.formats import read_node_list

    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "uci")
    nodes = read_node_list(os.path.join(base, "nodes_set", "nodes.csv"))
    T = 7
    loader = DataLoader(nodes, T)
    pyr = loader.get_core_adj_list(
        os.path.join(base, "CTGCN", "ctgcn_cores"), 0, T, max_core=-1)
    N = len(nodes)
    K = int(pyr.valid.shape[1])
    d = 500

    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((N, d)).astype(np.float32)
    dense_host = np.asarray(pyr.dense).reshape(T * K, N, N)

    # f64 ground truth on host
    ref = dense_host.astype(np.float64) @ x_host.astype(np.float64)

    def make(prec):
        @jax.jit
        def f(bank, x):
            return jax.lax.dot_general(
                bank, x, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        return f

    x = jnp.asarray(x_host)
    bank = jnp.asarray(dense_host)
    out = {}
    for name, prec in [("highest", jax.lax.Precision.HIGHEST),
                       ("high", jax.lax.Precision.HIGH),
                       ("default", None)]:
        f = make(prec)
        y = f(bank, x)
        jax.block_until_ready(y)
        t0 = time.time()
        iters = 20
        for _ in range(iters):
            y = f(bank, x)
        jax.block_until_ready(y)
        dt = (time.time() - t0) / iters
        yh = np.asarray(y, dtype=np.float64)
        denom = np.maximum(np.abs(ref), 1e-6)
        rel = np.abs(yh - ref) / denom
        out[name] = {
            "ms": round(dt * 1e3, 3),
            "max_rel_err": float(rel.max()),
            "mean_rel_err": float(rel.mean()),
        }
    out["shape"] = [T * K, N, N, d]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
