# coding: utf-8
"""Host-graph kernel benchmark: C++ (ctgcn_tpu/native) vs numpy vs networkx.

The regime that matters is the reference's larger datasets (AS: ~7.7k nodes
x 733 snapshots; Facebook: ~61k nodes — reference README.md:170-178), where
preprocessing is a real cost: the reference shells out to networkx per
snapshot per k (structure_generation.py:32-56) and walks one node at a time
(random_walk.py:21-49).

Run (idle machine): timeout 560 python scripts/bench_native.py
Writes data/bench_native.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import networkx as nx
import scipy.sparse as sp


def powerlaw_graph(n, avg_deg, max_deg, seed=0):
    """Power-law-ish graph with the degree skew CAPPED to the reference
    dataset's published max degree (README.md:170-174) — an uncapped zipf
    tail would inflate the numpy sampler's padded-table cost (it scales
    with max_deg) and overstate the native speedup."""
    rng = np.random.default_rng(seed)
    w = (np.arange(1, n + 1, dtype=np.float64)) ** -0.8
    rng.shuffle(w)
    p = w / w.sum()
    m = int(n * avg_deg / 2)
    # cap endpoint propensity so E[max degree] ~ max_deg
    p = np.minimum(p, max_deg / (2.2 * m))
    p = p / p.sum()
    src = rng.choice(n, size=m, p=p)
    dst = rng.choice(n, size=m, p=p)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    vals = rng.random(src.shape[0]) + 0.5
    A = sp.coo_matrix((vals, (src, dst)), shape=(n, n))
    A = A + A.T
    A = A.tocsr()
    A.sum_duplicates()
    return A


def timeit(fn, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from ctgcn_tpu import native
    from ctgcn_tpu.preprocessing import kcore, walks

    assert native.available(), "build the native lib first"
    results = {}

    # (n, avg_deg, max_deg) per reference README.md:170-174 dataset stats
    for name, n, avg_deg, max_deg in [("as_scale", 6828, 570, 1458),
                                      ("facebook_scale", 60730, 20, 203)]:
        A = powerlaw_graph(n, avg_deg, max_deg, seed=1)
        print(f"{name}: n={n} nnz={A.nnz}")

        # both paths timed END-TO-END through kcore.core_numbers (incl. the
        # binarize/eliminate_zeros prep both pay); the env toggle restores
        # exception-safely so a mid-bench failure can't leave native off
        t_nat, c_nat = timeit(lambda: kcore.core_numbers(A))
        try:
            os.environ["CTGCN_TPU_NATIVE"] = "0"
            native._lib = None
            t_np, c_np = timeit(lambda: kcore.core_numbers(A))
        finally:
            os.environ.pop("CTGCN_TPU_NATIVE", None)
            native._lib = None
        assert np.array_equal(c_nat, c_np), "core parity failure"
        t_nx = None
        if n <= 10000:
            G = nx.from_scipy_sparse_array(A)
            t_nx, c_nx = timeit(lambda: nx.core_number(G), reps=1)
            want = np.array([c_nx[i] for i in range(n)])
            assert np.array_equal(c_nat, want)
            # drop the multi-million-object nx graph NOW — a gc pass over
            # it landing inside a later timed region skews measurements
            import gc

            del G, c_nx
            gc.collect()
        results[f"{name}/core"] = {
            "nnz": int(A.nnz), "max_core": int(c_nat.max()),
            "native_s": round(t_nat, 4), "numpy_s": round(t_np, 4),
            "networkx_s": round(t_nx, 4) if t_nx else None,
            "native_speedup_vs_numpy": round(t_np / t_nat, 1),
        }
        print(" core:", results[f"{name}/core"])

        # walks: head-to-head at a bounded walk_time (the numpy sampler's
        # padded-table hop is O(n_walks * max_deg) and takes tens of
        # minutes at the config's walk_time=100 on AS density — that IS
        # the finding; keep the comparison finite and report walks/s),
        # plus the native kernel alone at the dataset's real walk_time.
        wl = 5
        wt_cmp = 5
        t_nat_w, w_nat = timeit(
            lambda: native.simulate_walks(A, wl, wt_cmp, weighted=True,
                                          seed=3), reps=2)
        t_np_w, w_np = timeit(
            lambda: walks.simulate_walks(
                A, wl, wt_cmp, weighted=True, rng=np.random.RandomState(3)),
            reps=1)
        assert w_nat.shape == w_np.shape
        wt_full = 100 if n <= 10000 else 20
        t_nat_full, w_full = timeit(
            lambda: native.simulate_walks(A, wl, wt_full, weighted=True,
                                          seed=3), reps=1)
        results[f"{name}/walks"] = {
            "walk_length": wl, "walk_time_compared": wt_cmp,
            "n_walks": int(w_nat.shape[0]),
            "native_s": round(t_nat_w, 4), "numpy_s": round(t_np_w, 4),
            "native_walks_per_s": round(w_nat.shape[0] / t_nat_w),
            "numpy_walks_per_s": round(w_np.shape[0] / t_np_w),
            "native_speedup_vs_numpy": round(t_np_w / t_nat_w, 1),
            "walk_time_full": wt_full,
            "native_full_s": round(t_nat_full, 4),
            "numpy_full_est_s": round(t_np_w * wt_full / wt_cmp, 1),
        }
        print(" walks:", results[f"{name}/walks"])

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "bench_native.json")
    with open(out, "w") as fp:
        json.dump(results, fp, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
