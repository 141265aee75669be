# coding: utf-8
"""Large-graph CTGCN-C train step on the REAL chip (the regime the
reference handles with "use a bigger GPU or CPU", README.md:178).

Synthetic Facebook-scale power-law graph (N=60730-ish, the reference's
Facebook row: README.md:173), real k-core pyramid from our peeler, full
jitted train step (forward + loss + backward + Adam) through the
degree-bucketed ELL backend vs the gather/segment fallback.  Writes
data/bench_large_scale.json.  Run: timeout 560 python
scripts/bench_large_scale.py [--quick]
"""
import argparse
import functools
import re
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--n", type=int, default=61440)
    ap.add_argument("--t", type=int, default=3)
    # the synthetic configuration-model graph develops a much deeper core
    # hierarchy (max core ~72) than the real Facebook graph (max core 9,
    # reference README.md:173); cap the pyramid at the realistic depth
    ap.add_argument("--max_core", type=int, default=9)
    ap.add_argument("--profile", type=str, default=None,
                    help="capture a jax.profiler trace of the steady-state "
                         "ELL steps into this directory")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from ctgcn_tpu.main import _enable_compilation_cache

    _enable_compilation_cache()

    from scripts.bench_spmm_backends import powerlaw_graph
    from ctgcn_tpu.preprocessing.kcore import core_numbers
    from ctgcn_tpu.ops.pyramid import (build_core_pyramid, stack_pyramids,
                                       attach_ell_plans)
    from ctgcn_tpu.nn import CTGCN
    from ctgcn_tpu.training.engine import make_optimizer

    from ctgcn_tpu.utils import pad_bucket

    N, T = args.n, args.t
    print(f"building synthetic Facebook-scale window: N={N}, T={T}")
    mats_per_t = []
    total_nnz = 0
    for t in range(T):
        mat = powerlaw_graph(N, 20, seed=t)
        cn = np.minimum(core_numbers(mat), args.max_core)
        mats = []
        for k in range(int(cn.max()), 0, -1):   # max core first
            keep = (cn >= k).astype(np.float32)
            mats.append(mat.multiply(keep[:, None]).multiply(
                keep[None, :]).tocsr())
        mats_per_t.append(mats)
        total_nnz += sum(int(m.nnz) for m in mats)
        print(f"  t={t}: {len(mats)} cores, "
              f"{sum(int(m.nnz) for m in mats)} pyramid nnz", flush=True)
    num_slots = max(len(m) for m in mats_per_t)
    cap = pad_bucket(max(m.nnz + (N if j == 0 else 0)
                         for mats in mats_per_t for j, m in enumerate(mats)))
    stacked = stack_pyramids([
        build_core_pyramid(mats, N, num_slots=num_slots, pad_to=cap)
        for mats in mats_per_t])
    print(f"pyramid: K={num_slots}, cap={cap}, window nnz={total_nnz}")

    hid, out_dim = 500, 128
    model = CTGCN.init(jax.random.key(0), input_dim=N, hidden_dim=hid,
                       output_dim=out_dim, trans_num=1, diffusion_num=2,
                       duration=T)
    optimizer = make_optimizer(1e-3, weight_decay=5e-4)
    # threaded through jit args — closing over a device array bakes a
    # 94 MB HLO constant AND flips the relay into degraded per-call
    # dispatch for the rest of the process (CLAUDE.md)
    target = jax.random.normal(jax.random.key(1), (T, N, out_dim))
    iters = 5 if args.quick else 15

    results = {}
    ell = attach_ell_plans(stacked)
    ell_bf16 = attach_ell_plans(stacked, bf16=True)
    # exact bucket counts: the soft-bucket 1/4-pow2 rounding exists to
    # collapse shape sets ACROSS windows (compile amortization); a single
    # steady-state window has no reuse to buy, so its best config is
    # exact plans (r3's 234M was measured pre-soft-bucket — keep both
    # modes visible)
    os.environ["CTGCN_TPU_ELL_EXACT_BUCKETS"] = "1"
    ell_exact = attach_ell_plans(stacked)
    ell_exact_bf16 = attach_ell_plans(stacked, bf16=True)
    del os.environ["CTGCN_TPU_ELL_EXACT_BUCKETS"]
    variants = (("ell", ell, "full"),   # delta-encoded (the default)
                ("ell_save_spmm", ell, "save_spmm"),
                ("ell_bf16", ell_bf16, "full"),
                # the two wins compose: bf16 gathers cut the SpMM passes
                # ~1.27x AND save_spmm skips their backward recompute
                ("ell_bf16_save_spmm", ell_bf16, "save_spmm"),
                ("ell_exact_save_spmm", ell_exact, "save_spmm"),
                ("ell_exact_bf16_save_spmm", ell_exact_bf16, "save_spmm"),
                ("ell_fullslot", attach_ell_plans(stacked, delta=False),
                 "full"),
                ("segment", stacked, "full"))
    for tag, pyr, remat_policy in variants:
        os.environ["CTGCN_TPU_REMAT_POLICY"] = remat_policy
        opt_state = optimizer.init(model)

        def loss_fn(m, pyr, target):
            embs = m(None, pyr)
            return jnp.mean((embs - target) ** 2)

        # donate model + opt state: at this scale the per-t CTGCN params
        # (mlps [T, N, hid]) plus Adam moments are ~GBs; without donation
        # the old and new pytrees coexist and T=5 blows HBM at arg alloc
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(m, opt_state, pyr, target):
            loss, grads = jax.value_and_grad(loss_fn)(m, pyr, target)
            updates, opt_state = optimizer.update(grads, opt_state, m)
            return optax.apply_updates(m, updates), opt_state, loss

        t0 = time.time()
        # fresh param copy per backend: step donates its inputs
        m2 = jax.tree.map(jnp.array, model)
        try:
            m2, opt_state, loss = step(m2, opt_state, pyr, target)
            jax.block_until_ready(loss)
        except Exception as e:  # HBM OOM: record honestly, keep going
            text = re.sub(r"\x1b\[[0-9;]*m", "", str(e))
            lines = text.splitlines()
            msg = next((ln.strip()[:200] for ln in lines
                        if "out of memory" in ln.lower()
                        or "exceed memory" in ln.lower()), lines[0][:200])
            results[tag] = {"failed": msg}
            print(f"{tag:8s}: FAILED ({msg[:80]}...)")
            continue
        compile_s = time.time() - t0
        profiling = args.profile and tag == "ell"
        if profiling:
            jax.profiler.start_trace(args.profile)
        t0 = time.time()
        for _ in range(iters):
            m2, opt_state, loss = step(m2, opt_state, pyr, target)
        jax.block_until_ready(loss)
        dt = (time.time() - t0) / iters
        if profiling:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile}")
        # edges/s over the 2 diffusion layers, fwd + bwd dX (3x convention
        # matches bench.py)
        eps = total_nnz * 2 * 3 / dt
        results[tag] = {"step_ms": dt * 1e3, "compile_s": compile_s,
                        "edges_per_s": eps, "loss": float(loss)}
        print(f"{tag:8s}: {dt*1e3:8.1f} ms/step  {eps/1e6:8.1f} M edge-"
              f"traversals/s  (compile {compile_s:.0f}s)")

    # product-execution variant: the training engine runs epochs as a
    # lax.scan INSIDE one jit (engine.multi_epoch_step, chunking proven
    # bit-identical to per-epoch dispatch by test) — per-dispatch relay
    # overhead amortizes across the chunk, which per-step dispatch
    # benching above cannot show.  Measure the best config that way too.
    os.environ["CTGCN_TPU_REMAT_POLICY"] = "save_spmm"
    CHUNK = 5

    def chunk_loss(m, pyr, target):
        return jnp.mean((m(None, pyr) - target) ** 2)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chunk_steps(m, opt_state, pyr, target):
        def body(carry, _):
            m, o = carry
            loss, grads = jax.value_and_grad(chunk_loss)(m, pyr, target)
            updates, o = optimizer.update(grads, o, m)
            return (optax.apply_updates(m, updates), o), loss

        (m, opt_state), losses = jax.lax.scan(body, (m, opt_state), None,
                                              length=CHUNK)
        return m, opt_state, losses

    try:
        opt_state = optimizer.init(model)
        m2 = jax.tree.map(jnp.array, model)
        t0 = time.time()
        m2, opt_state, losses = chunk_steps(m2, opt_state, ell_exact_bf16,
                                            target)
        jax.block_until_ready(losses)
        compile_s = time.time() - t0
        n_chunks = 3 if args.quick else 5
        t0 = time.time()
        for _ in range(n_chunks):
            m2, opt_state, losses = chunk_steps(m2, opt_state,
                                                ell_exact_bf16, target)
        jax.block_until_ready(losses)
        dt = (time.time() - t0) / (n_chunks * CHUNK)
        results["ell_exact_bf16_save_spmm_chunked"] = {
            "step_ms": dt * 1e3, "compile_s": compile_s,
            "edges_per_s": total_nnz * 2 * 3 / dt,
            "loss": float(losses[-1]), "chunk": CHUNK}
        print(f"{'ell_exact_bf16_save_spmm_chunked':8s}: {dt*1e3:8.1f} "
              f"ms/step  {total_nnz*2*3/dt/1e6:8.1f} M edge-traversals/s "
              f"(chunk {CHUNK}, compile {compile_s:.0f}s)")
    except Exception as e:
        results["ell_exact_bf16_save_spmm_chunked"] = {"failed": str(e)[:200]}
        print(f"chunked: FAILED ({str(e)[:100]})")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "bench_large_scale.json")
    results["config"] = {"n": N, "t": T, "hid": hid, "out": out_dim,
                         "window_nnz": total_nnz, "num_slots": num_slots}
    with open(out, "w") as fp:
        json.dump(results, fp, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
