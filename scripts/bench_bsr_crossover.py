# coding: utf-8
"""Settle the Pallas-BSR question (VERDICT r2 weak #3): on-chip crossover
sweep of every core-pyramid SpMM backend over the N axis.

For N in {4k, 8k, 16k, 32k} (power-law, avg deg 20, max-core-capped
pyramid, d=128) this measures a single CoreDiffusion layer through each
selectable backend — blocks (core-sorted principal blocks), dense bank
(where the [K, N, N] mirror is affordable), Pallas BSR (degree-sorted),
degree-bucketed ELL (f32), and the gather+segment fallback — and records
the per-cell winner.  The loader's "auto" policy is held to this table:
either BSR earns a winning cell or it is documented as deprecated.

Writes data/bench_bsr_crossover.json.
Run on the real chip: timeout 560 python scripts/bench_bsr_crossover.py
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--n-list", type=str, default="4096,8192,16384,32768",
                    help="comma-separated N cells to (re)run; results merge "
                         "into the existing JSON")
    args = ap.parse_args()

    import jax

    from ctgcn_tpu.main import _enable_compilation_cache

    _enable_compilation_cache()

    from scripts.bench_spmm_backends import powerlaw_graph
    from ctgcn_tpu.preprocessing.kcore import core_numbers
    from ctgcn_tpu.nn.core_models import CoreDiffusion
    from ctgcn_tpu.ops.pyramid import (attach_ell_plans, build_core_pyramid,
                                       stack_pyramids)
    from ctgcn_tpu.utils import pad_bucket

    iters = 3 if args.quick else 10
    d = args.d
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "bench_bsr_crossover.json")
    results = {"feature_dim": d, "avg_deg": 20, "max_core_cap": 9,
               "cells": {}}
    if os.path.exists(out_path):
        with open(out_path) as fp:
            results = json.load(fp)
    for N in [int(s) for s in args.n_list.split(",")]:
        mat = powerlaw_graph(N, 20, seed=N)
        cn = np.minimum(core_numbers(mat), 9)
        mats = []
        for k in range(int(cn.max()), 0, -1):
            keep = (cn >= k).astype(np.float32)
            mats.append(mat.multiply(keep[:, None]).multiply(
                keep[None, :]).tocsr())
        K = len(mats)
        nnz = sum(int(m.nnz) for m in mats)
        cap = pad_bucket(max(m.nnz + (N if j == 0 else 0)
                             for j, m in enumerate(mats)))

        def pyramid(**kw):
            return stack_pyramids(
                [build_core_pyramid(mats, N, num_slots=K, pad_to=cap, **kw)],
                uniform_blocks=kw.get("build_blocks", False))

        dense_gb = K * N * N * 4 / 1e9
        cell = {"num_slots": K, "pyramid_nnz": nnz,
                "dense_bank_gb": round(dense_gb, 2)}
        print(f"N={N}: K={K} nnz={nnz} dense bank {dense_gb:.2f} GB",
              flush=True)

        variants = [("blocks", dict(build_blocks=True)),
                    ("ell_f32", dict()),
                    ("segment", dict())]
        if dense_gb <= 6.0:
            variants.insert(1, ("dense", dict(densify=True)))
        if N <= 8192:
            variants.append(("pallas_bsr", dict(build_plans=True)))
        else:
            cell["pallas_bsr"] = {
                "skipped": "BSR 128x128 block bank degenerates at this "
                           "sparsity (fill <<1%) and its Mosaic compile "
                           "runs >10 min — already out of contention at "
                           "N=4096/8192"}

        x = jax.random.normal(jax.random.key(0), (N, d))
        layer = CoreDiffusion.init(jax.random.key(1), d, d)
        for tag, kw in variants:
            try:
                pyr = pyramid(**kw)
                if tag == "ell_f32":
                    pyr = attach_ell_plans(pyr)
                pyr1 = jax.tree.map(
                    lambda l: l[0] if hasattr(l, "ndim") and l.ndim
                    and l.shape and l.shape[0] == 1 else l, pyr)
                fn = jax.jit(lambda p, xx: layer(xx, p))
                out = fn(pyr1, x)
                jax.block_until_ready(out)
                t0 = time.time()
                for _ in range(iters):
                    out = fn(pyr1, x)
                jax.block_until_ready(out)
                dt = (time.time() - t0) / iters
                cell[tag] = {"layer_ms": round(dt * 1e3, 3),
                             "edges_per_s": round(nnz / dt, 1)}
                print(f"  {tag:10s}: {dt * 1e3:8.2f} ms "
                      f"{nnz / dt / 1e6:8.1f} M edges/s", flush=True)
            except Exception as e:
                cell[tag] = {"failed": str(e)[:160]}
                print(f"  {tag:10s}: FAILED {str(e)[:80]}", flush=True)
            finally:
                # free this variant's banks before the next one — stale
                # dense/BSR banks from earlier cells otherwise accumulate
                # to an HBM OOM by N=16384
                import gc

                # dropping the array refs + the jit wrapper frees this
                # variant's HBM; do NOT jax.clear_caches() — re-loading
                # every executable through the relay costs ~8 min/variant
                pyr = pyr1 = out = fn = None
                gc.collect()
        # sanity-gate: readings faster than the HBM time to stream the
        # gathered [nnz, d] product once are relay-dispatch anomalies,
        # not kernels (observed once: a "0.08 ms" BSR cell)
        floor_ms = nnz * d * 4 / 819e9 * 1e3
        timed = {}
        for k, v in cell.items():
            if isinstance(v, dict) and "layer_ms" in v:
                if v["layer_ms"] < floor_ms:
                    v["anomaly"] = ("below single-stream HBM floor — relay "
                                    "measurement artifact, excluded")
                else:
                    timed[k] = v["layer_ms"]
        cell["winner"] = min(timed, key=timed.get) if timed else None
        results["cells"][f"N={N}"] = cell
        with open(out_path, "w") as fp:
            json.dump(results, fp, indent=1)

    print("wrote", out_path)
    print("winners:", {k: v["winner"] for k, v in results["cells"].items()})


if __name__ == "__main__":
    main()
