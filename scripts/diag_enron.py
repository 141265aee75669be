# coding: utf-8
"""Bisect the enron-scale TPU worker crash (r4 + r5: 'TPU worker process
crashed or restarted ... kernel fault' on the first epoch chunk).

Builds window 0 exactly as the product driver does, then runs staged
prefixes of the training computation, pulling a scalar after each:

  A  model forward                      (SpMM bank + core tails + time RNN)
  B  loss forward                       (+ negative sampling)
  C  value_and_grad, one batch          (+ the whole backward)
  D  one-epoch train step               (+ grad accumulation + Adam)
  E  multi_epoch_step chunk of 2        (the exact product code path)

The first stage to crash the worker names the culprit.  Run in a fresh
process after the relay lease clears:
    timeout 900 python -u scripts/diag_enron.py [--duration 5]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=int, default=5)
    ap.add_argument("--stop-after", default="E")
    ap.add_argument("--then-product", action="store_true",
                    help="skip the (already conclusive) staged bisection "
                         "and run the FULL product embedding directly — "
                         "the r5 bisection verdict is in the module "
                         "docstring; the fix is the layer_remat config "
                         "key")
    args_cli = ap.parse_args()

    if args_cli.then_product:
        import json as _json
        from ctgcn_tpu.main import _enable_compilation_cache
        _enable_compilation_cache()
        from ctgcn_tpu.training import driver as D
        prod_args = _json.load(open("configs/enron.json"))["embedding"][
            "CTGCN-C"]
        print("=== PRODUCT embedding (layer_remat="
              f"{prod_args.get('layer_remat')}) ===", flush=True)
        D.gnn_embedding("CTGCN-C", prod_args)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctgcn_tpu.main import _enable_compilation_cache
    _enable_compilation_cache()

    from ctgcn_tpu.training import driver as D
    from ctgcn_tpu.training.engine import (_multi_epoch_step, batch_matrix,
                                           make_optimizer)
    import optax

    args = json.load(open("configs/enron.json"))["embedding"]["CTGCN-C"]
    base_path = args["base_path"]
    T = args_cli.duration
    data_loader = D.get_data_loader(args)
    t0 = time.time()
    input_dim, adjs, xs, _edge_list = D.get_input_data(
        "CTGCN-C", 0, T, data_loader, args)
    args["input_dim"] = input_dim
    data = {"adjs": adjs, "xs": xs, "neighbor_data": None,
            "vgrnn_adjs": None, "pgnn_dists": None, "halo_adjs": None}
    model = D.get_gnn_model("CTGCN-C", T, args, jax.random.key(0))
    fwd = D.make_forward("CTGCN-C", node_num=data_loader.node_num)
    walk = data_loader.get_walk_data(
        os.path.abspath(os.path.join(base_path, args["walk_pair_folder"])),
        os.path.abspath(os.path.join(base_path, args["node_freq_folder"])),
        0, T)
    data["walk"] = walk
    loss_fn = D._uneg_loss_fn(fwd, False, args["neg_num"], args["Q"])
    print(f"setup: {time.time() - t0:.1f}s", flush=True)

    N = data_loader.node_num
    b, m = batch_matrix(N, args["batch_size"], key=jax.random.key(1))
    b0 = jnp.asarray(b[0])
    m0 = jnp.asarray(m[0])
    key = jax.random.key(2)

    def stage(tag, fn, *a):
        print(f"[{tag}] start", flush=True)
        t = time.time()
        out = fn(*a)
        out = jax.block_until_ready(out)
        print(f"[{tag}] OK {float(np.asarray(out)):.4f} "
              f"({time.time() - t:.1f}s)", flush=True)

    from ctgcn_tpu.ops.ell import ell_spmm

    def spmm_only(d, x):
        def per_t(p):
            return jnp.sum(jnp.abs(ell_spmm(p.ell_fwd, p.ell_t, x,
                                            p.ell_bf16)))
        return jnp.sum(jax.lax.map(per_t, d["adjs"]))

    x0 = jnp.ones((N, 500), jnp.float32)
    stage("A1 spmm bank", jax.jit(spmm_only), data, x0)
    del x0
    if args_cli.stop_after == "A1":
        return

    stage("A fwd", jax.jit(lambda m_, d: jnp.sum(
        jnp.abs(fwd(m_, d, jax.random.key(3))))), model, data)
    if args_cli.stop_after == "A":
        return

    stage("B loss", jax.jit(lambda m_, d: loss_fn(m_, d, b0, m0, key)),
          model, data)
    if args_cli.stop_after == "B":
        return

    stage("C grad", jax.jit(lambda m_, d: optax.global_norm(
        jax.grad(loss_fn)(m_, d, b0, m0, key))), model, data)
    if args_cli.stop_after == "C":
        return

    optimizer = make_optimizer(args["lr"], args["weight_decay"])
    opt_state = optimizer.init(model)

    @jax.jit
    def one_epoch(m_, opt_state, d, bs, ms, k):
        ks = jax.random.split(k, bs.shape[0])
        zero = jax.tree.map(jnp.zeros_like, m_)

        def body(acc, binp):
            g, l = acc
            bi, bm, kk = binp
            loss, grads = jax.value_and_grad(loss_fn)(m_, d, bi, bm, kk)
            return (jax.tree.map(jnp.add, g, grads), l + loss), loss

        (grads, total), _ = jax.lax.scan(
            body, (zero, 0.0), (bs, ms, ks))
        updates, opt_state = optimizer.update(grads, opt_state, m_)
        return optax.apply_updates(m_, updates), opt_state, total

    print("[D one-epoch step] start", flush=True)
    t = time.time()
    m2, opt2, total = one_epoch(model, opt_state, data, jnp.asarray(b),
                                jnp.asarray(m), key)
    print(f"[D one-epoch step] OK {float(total):.4f} "
          f"({time.time() - t:.1f}s)", flush=True)
    if args_cli.stop_after == "D":
        return

    step = _multi_epoch_step(loss_fn, args["lr"], args["weight_decay"])
    C = 2
    bs = jnp.asarray(np.stack([b, b]))
    ms = jnp.asarray(np.stack([m, m]))
    ks = jax.random.split(jax.random.key(4), C)
    print("[E chunk(2)] start", flush=True)
    t = time.time()
    m3, opt3, losses = step(m2, opt2, data, bs, ms, ks)
    losses = jax.block_until_ready(losses)
    print(f"[E chunk(2)] OK {np.asarray(losses)} "
          f"({time.time() - t:.1f}s)", flush=True)

    if args_cli.then_product:
        # free every diagnostic device buffer, then run the real thing
        # in this process — the relay lease is already paid
        import gc
        del (model, data, adjs, xs, walk, m2, opt2, m3, opt3, losses,
             opt_state, b0, m0, bs, ms, ks)
        gc.collect()
        print("=== diagnostic clean; starting PRODUCT embedding ===",
              flush=True)
        prod_args = json.load(open("configs/enron.json"))["embedding"][
            "CTGCN-C"]
        D.gnn_embedding("CTGCN-C", prod_args)


if __name__ == "__main__":
    main()
