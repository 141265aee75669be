# coding: utf-8
"""SpMM backend shoot-out on the REAL chip: dense vs Pallas BSR vs segment.

Two regimes:
  * UCI scale (N=1899): the dense [K, N, N] mirror fits easily -> measures
    the dense-vs-BSR crossover that the loader's "auto" policy encodes.
  * Facebook scale (N=60730, power-law, ~1.2M directed nnz): one dense f32
    slot is 14.8 GB -> dense is infeasible; the contest is Pallas BSR
    (raw node order vs degree-sorted) against the XLA gather/segment path.

For each backend: steady-state ms/call, effective edge-traversals/s,
achieved HBM GB/s (bytes actually streamed by that backend's formulation),
and for BSR the block fill factor.  Run:  timeout 560 python
scripts/bench_spmm_backends.py [--quick]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

# v5e single-chip speed-of-light (public numbers)
HBM_GBPS = 819.0
MXU_F32_TFLOPS = 49.0   # fp32 via 3-pass; bf16 would be 197


def powerlaw_graph(n, avg_deg, seed=0, alpha=2.2):
    """Symmetric power-law graph (Facebook-like degree skew)."""
    rng = np.random.RandomState(seed)
    # degree-propensity per node
    w = (np.arange(1, n + 1) ** (-1.0 / (alpha - 1.0)))
    rng.shuffle(w)
    p = w / w.sum()
    m = n * avg_deg // 2
    src = rng.choice(n, size=m, p=p)
    dst = rng.choice(n, size=m, p=p)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    r = np.concatenate([src, dst])
    c = np.concatenate([dst, src])
    v = np.ones(len(r), np.float32)
    mat = sp.coo_matrix((v, (r, c)), shape=(n, n))
    mat.sum_duplicates()
    mat.data[:] = 1.0
    return mat.tocsr()


def degree_sort_perm(mat):
    """Permutation placing high-degree nodes first (raises BSR block fill:
    the hub-hub block region becomes nearly dense)."""
    deg = np.asarray(mat.sum(axis=1)).ravel()
    return np.argsort(-deg, kind="stable")


def bench(fn, x, iters):
    import jax
    y = jax.block_until_ready(fn(x))
    t0 = time.time()
    for _ in range(iters):
        y = fn(x)
    jax.block_until_ready(y)
    return (time.time() - t0) / iters


def run_case(name, mat, d, iters, results, try_dense=False):
    import jax
    import jax.numpy as jnp
    from ctgcn_tpu.ops.pallas_spmm import BLOCK, build_block_plans, block_spmm
    from ctgcn_tpu.ops.sparse import from_scipy
    from ctgcn_tpu.ops.spmm import spmm

    n = mat.shape[0]
    nnz = mat.nnz
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    print(f"\n=== {name}: N={n}, nnz={nnz}, d={d} ===")
    ref = None

    # --- segment (gather + segment_sum) ---
    g = from_scipy(mat)
    f_seg = jax.jit(lambda x: spmm(g, x, backend="segment"))
    dt = bench(f_seg, x, iters)
    ref = np.asarray(f_seg(x))
    # bytes: gather nnz rows of x + write nnz partials + reduce ~ 3*nnz*d*4
    gbps = 3 * nnz * d * 4 / dt / 1e9
    results[f"{name}/segment"] = {
        "ms": dt * 1e3, "edges_per_s": nnz / dt,
        "hbm_gbps": gbps, "hbm_frac": gbps / HBM_GBPS}
    print(f"segment: {dt*1e3:8.3f} ms  {nnz/dt/1e6:8.1f}M edges/s  "
          f"~{gbps:6.1f} GB/s ({100*gbps/HBM_GBPS:.1f}% HBM)")

    # --- dense (only when affordable) ---
    if try_dense:
        dmat = jnp.asarray(mat.toarray())
        f_dense = jax.jit(lambda x: jax.lax.dot_general(
            dmat, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
        dt = bench(f_dense, x, iters)
        flops = 2.0 * n * n * d
        tf = flops / dt / 1e12
        results[f"{name}/dense"] = {
            "ms": dt * 1e3, "edges_per_s": nnz / dt, "tflops": tf,
            "mxu_frac": tf / MXU_F32_TFLOPS}
        print(f"dense:   {dt*1e3:8.3f} ms  {nnz/dt/1e6:8.1f}M edges/s  "
              f"{tf:6.2f} TF/s ({100*tf/MXU_F32_TFLOPS:.1f}% MXU f32)")

    # --- degree-bucketed ELL (gather + dense row-sum, no scatter) ---
    # The very-sparse-regime backend (ops/ell.py).  A Pallas streaming-
    # gather kernel was probed on-chip and is NOT implementable: Mosaic
    # rejects cross-sublane dynamic gathers (jnp.take -> "Shape mismatch
    # in input, indices and output"; take_along_axis crashes the backend
    # compiler), so the scatter is removed instead of fused.
    from ctgcn_tpu.ops.ell import build_ell_plans, ell_spmm

    fwd_e, t_e = build_ell_plans(mat)
    pad_ratio = fwd_e.padded_nnz / nnz
    for tag, bf16 in (("ell_f32", False), ("ell_bf16", True)):
        f_ell = jax.jit(lambda x, b=bf16: ell_spmm(fwd_e, t_e, x, b))
        dt = bench(f_ell, x, iters)
        out = np.asarray(f_ell(x))
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        # bytes: gather padded_nnz rows of x + padded_nnz vals + out once
        itm = 2 if bf16 else 4
        gbps = (fwd_e.padded_nnz * (d + 1) * itm + n * d * 4) / dt / 1e9
        results[f"{name}/{tag}"] = {
            "ms": dt * 1e3, "edges_per_s": nnz / dt,
            "pad_ratio": pad_ratio, "hbm_gbps": gbps,
            "hbm_frac": gbps / HBM_GBPS, "max_rel_err": float(err)}
        print(f"{tag}: {dt*1e3:8.3f} ms  {nnz/dt/1e6:8.1f}M edges/s  "
              f"pad={pad_ratio:.2f}x  ~{gbps:6.1f} GB/s  err={err:.2e}")

    # --- Pallas BSR, raw order and degree-sorted ---
    # BSR is only viable when block fill is adequate: at Facebook-scale
    # sparsity (N=60k, fill 0.03-0.26% across block shapes/orders) the
    # block bank alone is 1.7-14 GB for 4 MB of data — the gather/segment
    # formulation carries that regime (see data/bench_spmm_backends.json)
    rt = (-(-n // BLOCK))
    key = (mat.tocoo().row // BLOCK).astype(np.int64) * rt + \
        (mat.tocoo().col // BLOCK)
    nb_est = len(np.unique(key))
    if nb_est * BLOCK * BLOCK * 4 > 2 << 30:
        results[f"{name}/bsr_skipped"] = {
            "reason": "block bank infeasible",
            "nb_est": int(nb_est),
            "fill_est": nnz / (nb_est * BLOCK * BLOCK),
            "blocks_gb": nb_est * BLOCK * BLOCK * 4 / 1e9}
        print(f"bsr: SKIPPED (NB~{nb_est}, fill "
              f"{100*nnz/(nb_est*BLOCK*BLOCK):.3f}%, "
              f"{nb_est*BLOCK*BLOCK*4/1e9:.1f} GB block bank)")
        return
    for order in ("raw", "degsort"):
        if order == "degsort":
            perm = degree_sort_perm(mat)
            pm = mat[perm][:, perm]
        else:
            perm = None
            pm = mat
        fwd, tpl = build_block_plans(pm)
        nb = int(np.asarray(fwd.row_ptr)[-1])
        fill = nnz / (nb * BLOCK * BLOCK)
        xp = x if perm is None else jnp.asarray(np.asarray(x)[perm])
        f_bsr = jax.jit(lambda x: block_spmm(fwd, tpl, x))
        dt = bench(f_bsr, xp, iters)
        out = np.asarray(f_bsr(xp))[:n]
        if perm is not None:
            inv = np.argsort(perm)
            out = out[inv]
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        # bytes: each block DMA (B*B*4) + one x tile per block (B*d*4) + out
        bytes_moved = nb * (BLOCK * BLOCK * 4 + BLOCK * d * 4) + n * d * 4
        gbps = bytes_moved / dt / 1e9
        flops = 2.0 * nb * BLOCK * BLOCK * d
        tf = flops / dt / 1e12
        results[f"{name}/bsr_{order}"] = {
            "ms": dt * 1e3, "edges_per_s": nnz / dt, "blocks": nb,
            "fill": fill, "hbm_gbps": gbps, "hbm_frac": gbps / HBM_GBPS,
            "tflops": tf, "max_rel_err": float(err)}
        print(f"bsr/{order:7s}: {dt*1e3:8.3f} ms  {nnz/dt/1e6:8.1f}M edges/s  "
              f"NB={nb} fill={100*fill:.2f}%  ~{gbps:6.1f} GB/s  "
              f"{tf:5.2f} TF/s  err={err:.2e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--case", choices=["uci", "facebook", "all"],
                    default="all")
    args = ap.parse_args()
    iters = 10 if args.quick else 50

    # persistent XLA cache: compiles run locally on this 4-cpu host and
    # take minutes cold — resumable runs are mandatory
    import jax
    cache_dir = os.path.expanduser("~/.cache/ctgcn_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "bench_spmm_backends.json")
    results = {}
    if os.path.exists(out):
        with open(out) as fp:
            results = json.load(fp)
        # drop results for backends that no longer exist
        results = {k: v for k, v in results.items() if "/stream" not in k}

    if args.case in ("uci", "all"):
        uci = powerlaw_graph(1899, 32, seed=0)
        run_case("uci_scale", uci, 128, iters, results, try_dense=True)
        with open(out, "w") as fp:
            json.dump(results, fp, indent=1)
    if args.case in ("facebook", "all"):
        fb = powerlaw_graph(60730, 20, seed=1)
        run_case("facebook_scale", fb, 128, iters, results, try_dense=False)
        with open(out, "w") as fp:
            json.dump(results, fp, indent=1)
    print("\nwrote", out)


if __name__ == "__main__":
    main()
