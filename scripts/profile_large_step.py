# coding: utf-8
"""Component attribution for the composed Facebook-scale train step
(VERDICT r2 weak #2: the full step ran ~6x below its own SpMM kernel
with no committed breakdown of where the time goes).

Instead of an xplane trace (no TensorBoard profile plugin in this image),
the breakdown is measured by timing nested prefixes of the computation
on the real chip — each is a separate jitted function over the same
window:

  spmm_fwd      — the K-slot ELL SpMM per snapshot only (lax.map over t)
  diffusion_fwd — + prefix-sum, ReLU, core-axis GRU, LayerNorm (CDN)
  model_fwd     — + per-t MLP transform + time-axis GRU + LayerNorm
  loss_grad     — + MSE loss + full backward (remat per policy)
  train_step    — + Adam update (the bench_large_scale number)

Differences between consecutive rows attribute wall time to each stage;
the backward/remat share is (loss_grad - model_fwd).  Writes
data/profile_large_step.json.

Run: timeout 560 python scripts/profile_large_step.py [--quick]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--n", type=int, default=61440)
    ap.add_argument("--t", type=int, default=3)
    ap.add_argument("--max_core", type=int, default=9)
    ap.add_argument("--remat", type=str, default="full",
                    choices=["full", "save_spmm"])
    ap.add_argument("--no_delta", action="store_true",
                    help="full-slot ELL plans (the pre-delta encoding)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from ctgcn_tpu.main import _enable_compilation_cache

    _enable_compilation_cache()
    os.environ["CTGCN_TPU_REMAT_POLICY"] = args.remat

    from scripts.bench_spmm_backends import powerlaw_graph
    from ctgcn_tpu.preprocessing.kcore import core_numbers
    from ctgcn_tpu.ops.ell import ell_spmm
    from ctgcn_tpu.ops.pyramid import (attach_ell_plans, build_core_pyramid,
                                       stack_pyramids)
    from ctgcn_tpu.nn import CTGCN
    from ctgcn_tpu.training.engine import make_optimizer
    from ctgcn_tpu.utils import pad_bucket

    N, T = args.n, args.t
    mats_per_t = []
    total_nnz = 0
    for t in range(T):
        mat = powerlaw_graph(N, 20, seed=t)
        cn = np.minimum(core_numbers(mat), args.max_core)
        mats = []
        for k in range(int(cn.max()), 0, -1):
            keep = (cn >= k).astype(np.float32)
            mats.append(mat.multiply(keep[:, None]).multiply(
                keep[None, :]).tocsr())
        mats_per_t.append(mats)
        total_nnz += sum(int(m.nnz) for m in mats)
    K = max(len(m) for m in mats_per_t)
    cap = pad_bucket(max(m.nnz + (N if j == 0 else 0)
                         for mats in mats_per_t for j, m in enumerate(mats)))
    pyr = attach_ell_plans(stack_pyramids([
        build_core_pyramid(mats, N, num_slots=K, pad_to=cap, as_numpy=True)
        for mats in mats_per_t]), delta=not args.no_delta)
    plan_slots = sum(int(np.prod(b.cols.shape))
                     for b in pyr.ell_fwd.buckets)  # [T, nb, Kw] each
    print(f"window: N={N} T={T} K={K} nnz={total_nnz} "
          f"delta={not args.no_delta} fwd_plan_slots={plan_slots}",
          flush=True)

    hid, out_dim = 500, 128
    model = CTGCN.init(jax.random.key(0), input_dim=N, hidden_dim=hid,
                       output_dim=out_dim, trans_num=1, diffusion_num=2,
                       duration=T)
    optimizer = make_optimizer(1e-3, weight_decay=5e-4)
    opt_state = optimizer.init(model)
    target = jax.random.normal(jax.random.key(1), (T, N, out_dim))
    x = jax.random.normal(jax.random.key(2), (N, hid))
    iters = 3 if args.quick else 8

    def spmm_fwd(pyr, x):
        def per_t(p):
            return ell_spmm(p.ell_fwd, p.ell_t, x, False)

        return jax.lax.map(per_t, pyr)

    def diffusion_fwd(model, pyr, x):
        def per_t(cdn, p):
            return cdn(x, p)

        return jax.lax.map(lambda a: per_t(*a), (model.cdns, pyr))

    def model_fwd(model, pyr):
        return model(None, pyr)

    # target threaded through jit args — a closed-over device array bakes
    # an HLO constant and degrades relay dispatch (CLAUDE.md)
    def loss_fn(m, pyr, target):
        return jnp.mean((m(None, pyr) - target) ** 2)

    def loss_grad(model, pyr, target):
        return jax.value_and_grad(loss_fn)(model, pyr, target)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(m, opt_state, pyr, target):
        loss, grads = jax.value_and_grad(loss_fn)(m, pyr, target)
        updates, opt_state = optimizer.update(grads, opt_state, m)
        return optax.apply_updates(m, updates), opt_state, loss

    results = {"config": {"n": N, "t": T, "k": K, "hid": hid,
                          "window_nnz": total_nnz, "remat": args.remat,
                          "ell_delta": not args.no_delta,
                          "fwd_plan_slots": plan_slots}}

    def run(tag, fn, *fargs):
        out = fn(*fargs)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*fargs)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        results[tag] = round(dt * 1e3, 2)
        print(f"{tag:14s}: {dt * 1e3:9.1f} ms", flush=True)

    # backward segmentation (VERDICT r3 #3): grads of nested prefixes.
    # grad_x_spmm adds the SpMMᵀ pass to spmm_fwd; grad_diffusion adds the
    # tril-prefix + core-GRU-scan + LayerNorm backward; loss_grad adds the
    # MLP/time-RNN backward and any remat recompute — consecutive
    # differences attribute the backward the same way the forward rows do.
    def grad_x_spmm(pyr, x):
        def obj(x):
            out = spmm_fwd(pyr, x)
            return jnp.mean(out * out)

        return jax.value_and_grad(obj)(x)

    def grad_diffusion(model, pyr, x):
        # per-snapshot checkpoint mirrors the model's over-budget remat
        # (without it the non-remat lax.map backward would hold ~27 GB of
        # [K, N, *] residuals at this scale)
        from ctgcn_tpu.nn.core_models import _remat

        def obj(mx):
            m, x = mx

            def per_t(cdn, p):
                return cdn(x, p)

            out = jax.lax.map(lambda a: _remat(per_t)(*a),
                              (m.cdns, pyr))
            return jnp.mean(out * out)

        return jax.value_and_grad(obj)((model, x))

    run("spmm_fwd", jax.jit(spmm_fwd), pyr, x)
    run("diffusion_fwd", jax.jit(diffusion_fwd), model, pyr, x)
    run("model_fwd", jax.jit(model_fwd), model, pyr)
    run("grad_x_spmm", jax.jit(grad_x_spmm), pyr, x)
    run("grad_diffusion", jax.jit(grad_diffusion), model, pyr, x)
    run("loss_grad", jax.jit(loss_grad), model, pyr, target)
    m2 = jax.tree.map(jnp.array, model)
    out = train_step(m2, opt_state, pyr, target)
    jax.block_until_ready(out[2])
    m2, opt_state, _ = out
    t0 = time.time()
    for _ in range(iters):
        m2, opt_state, loss = train_step(m2, opt_state, pyr, target)
    jax.block_until_ready(loss)
    results["train_step"] = round((time.time() - t0) / iters * 1e3, 2)
    print(f"{'train_step':14s}: {results['train_step']:9.1f} ms", flush=True)

    # consecutive-prefix differences; note spmm_fwd measures ONE SpMM pass
    # at the layer-1 width (d=500) — layer 2 repeats it at d=128, so the
    # CDN's total SpMM share is ~spmm_fwd * (1 + 128/500)
    results["attribution_ms"] = {
        "spmm_fwd (layer-1 width)": results["spmm_fwd"],
        "rest_of_cdn (diffusion - spmm)":
            round(results["diffusion_fwd"] - results["spmm_fwd"], 2),
        "mlp+time_rnn (model - diffusion)":
            round(results["model_fwd"] - results["diffusion_fwd"], 2),
        "backward+remat (loss_grad - model_fwd)":
            round(results["loss_grad"] - results["model_fwd"], 2),
        "adam (train_step - loss_grad)":
            round(results["train_step"] - results["loss_grad"], 2),
    }
    results["backward_attribution_ms"] = {
        "spmmT (grad_x_spmm - spmm_fwd)":
            round(results["grad_x_spmm"] - results["spmm_fwd"], 2),
        "core_tail_bwd ((grad_diffusion - diffusion) - spmmT)":
            round((results["grad_diffusion"] - results["diffusion_fwd"])
                  - (results["grad_x_spmm"] - results["spmm_fwd"]), 2),
        "mlp+time_rnn+remat ((loss_grad - model) - (grad_diff - diff))":
            round((results["loss_grad"] - results["model_fwd"])
                  - (results["grad_diffusion"] - results["diffusion_fwd"]),
                  2),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "profile_large_step.json")
    prev = {}
    if os.path.exists(out_path):
        with open(out_path) as fp:
            prev = json.load(fp)
    key = args.remat + ("_fullslot" if args.no_delta else "_delta")
    prev[key] = results
    with open(out_path, "w") as fp:
        json.dump(prev, fp, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
