# coding: utf-8
"""On-chip ablation of the CTGCN-C UCI train step (bf16 bank): attribute
step time to forward / backward / loss / core-axis GRU / time RNN.

Run: timeout 560 python scripts/ablate_step.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from ctgcn_tpu.main import _enable_compilation_cache
    _enable_compilation_cache()

    from ctgcn_tpu.data.loader import DataLoader
    from ctgcn_tpu.data.formats import read_node_list
    from ctgcn_tpu.losses import negative_sampling_loss
    from ctgcn_tpu.nn import CTGCN
    from ctgcn_tpu.training.engine import make_optimizer
    from ctgcn_tpu.ops.rnn import rnn_scan
    import optax

    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "uci")
    nodes = read_node_list(os.path.join(base, "nodes_set", "nodes.csv"))
    T = 7
    loader = DataLoader(nodes, T)
    pyr = loader.get_core_adj_list(
        os.path.join(base, "CTGCN", "ctgcn_cores"), 0, T, max_core=-1,
        dense_dtype=jnp.bfloat16)
    walk = loader.get_walk_data(
        os.path.join(base, "CTGCN", "ctgcn_walk_pairs"),
        os.path.join(base, "CTGCN", "ctgcn_node_freq"), 0, T)
    N = len(nodes)

    model0 = CTGCN.init(jax.random.key(0), input_dim=N, hidden_dim=500,
                        output_dim=128, trans_num=1, diffusion_num=2,
                        duration=T)
    optimizer = make_optimizer(1e-3, weight_decay=5e-4)
    bidx = jnp.arange(N, dtype=jnp.int32)
    bmask = jnp.ones((N,), bool)
    key = jax.random.key(1)

    def loss_fn(model, pyr, walk, key):
        embs = model(None, pyr)
        return negative_sampling_loss(embs, bidx, bmask, walk, key,
                                      neg_num=20, Q=20.0)

    @jax.jit
    def full_step(model, opt_state, pyr, walk, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, pyr, walk, key)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    @jax.jit
    def fwd_loss(model, pyr, walk, key):
        return loss_fn(model, pyr, walk, key)

    @jax.jit
    def fwd_model(model, pyr):
        return model(None, pyr)

    @jax.jit
    def fwd_per_t(model, pyr):
        return model.per_timestep(None, pyr)

    @jax.jit
    def grad_per_t(model, pyr):
        def f(m, p):
            hx, _ = m.per_timestep(None, p)
            return jnp.sum(hx * hx)
        return jax.grad(f)(model, pyr)

    @jax.jit
    def time_rnn(model, hx):
        outs, _ = rnn_scan(model.rnn, hx)
        return model.norm(outs)

    opt_state = optimizer.init(model0)
    hx = jax.random.normal(jax.random.key(2), (T, N, 128), jnp.float32)

    res = {}
    res["full_step_ms"] = timeit(full_step, model0, opt_state, pyr, walk, key)
    res["fwd_loss_ms"] = timeit(fwd_loss, model0, pyr, walk, key)
    res["fwd_model_ms"] = timeit(fwd_model, model0, pyr)
    res["fwd_per_timestep_ms"] = timeit(fwd_per_t, model0, pyr)
    res["grad_per_timestep_ms"] = timeit(grad_per_t, model0, pyr)
    res["time_rnn_fwd_ms"] = timeit(time_rnn, model0, hx)
    res = {k: round(v, 2) for k, v in res.items()}
    res["note"] = ("bf16 bank; fwd_model - fwd_per_timestep = time-RNN+norm; "
                   "fwd_loss - fwd_model = loss fwd; full - fwd_loss = "
                   "backward + Adam")
    print(json.dumps(res))
    out_path = os.path.join(base, "..", "ablate_step.json")
    with open(os.path.abspath(out_path), "w") as fp:
        json.dump(res, fp, indent=1)
    print("wrote", os.path.abspath(out_path))


if __name__ == "__main__":
    main()
