# coding: utf-8
"""The UCI step's sequential-scan floor (VERDICT r4 #4 / r3 #4b).

The CTGCN-C UCI train step is bounded by the core-axis RNN: with the
ragged-blocks backend the window unrolls per snapshot, so one step runs
T=7 x L=2 masked K=16-step GRU scans forward and the same again in
reverse for the backward — ~448 sequential [1899, d]-GEMM chains that no
amount of MXU width can parallelize away.  This bench isolates exactly
those scans at the production shapes (layer 1: d=500->H=500, layer 2:
d=500->H=128) via ops.rnn.core_rnn_sum, times fwd and fwd+bwd on chip,
and writes the implied step floor next to the measured step time:

    floor = T * sum_l (fwd+bwd scan time of layer l) ;
    everything else in the step (SpMM bank, prefix matmuls, time RNN,
    loss, Adam) overlaps or is small (data/ablate_step.json).

Run (fresh process — relay microbenchmark rule, CLAUDE.md):
    timeout 560 python scripts/bench_scan_floor.py
Writes data/uci_floor.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=30):
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
    from ctgcn_tpu.ops.rnn import GRUCell, core_rnn_sum

    N, K, T = 1899, 16, 7
    res = {"N": N, "K": K, "T": T}
    key = jax.random.key(0)
    valid = jnp.ones((K,), jnp.float32)
    layers = {"layer1_d500_h500": (500, 500), "layer2_d500_h128": (500, 128)}
    total_fwd = 0.0
    total_step = 0.0
    for name, (d, H) in layers.items():
        cell = GRUCell.init(key, d, H)
        acc = jax.random.normal(key, (K, N, d), jnp.float32)

        fwd = jax.jit(lambda c, a: core_rnn_sum(c, a, valid))

        @jax.jit
        def fwdbwd(c, a):
            return jax.grad(
                lambda c, a: jnp.sum(core_rnn_sum(c, a, valid)),
                argnums=(0, 1))(c, a)

        t_f = timeit(fwd, cell, acc)
        t_fb = timeit(fwdbwd, cell, acc)
        res[name] = {"fwd_ms": round(t_f, 3), "fwd_bwd_ms": round(t_fb, 3)}
        total_fwd += t_f
        total_step += t_fb

    # one bare K-step GRU scan with no input projection work at H=500:
    # the irreducible recurrence latency (h @ W_hh chain)
    cell = GRUCell.init(key, 500, 500)
    gi = jax.random.normal(key, (K, N, 1500), jnp.float32)

    @jax.jit
    def bare_scan(cell, gi):
        def step(h, g):
            h = cell.step_from_proj(h, g)
            return h, h
        _, outs = jax.lax.scan(step, jnp.zeros((N, 500), jnp.float32), gi)
        return outs.sum(0)

    res["bare_recurrence_K16_h500_fwd_ms"] = round(timeit(bare_scan, cell, gi), 3)

    res["implied_step_floor_ms"] = round(T * total_step, 2)
    res["implied_fwd_floor_ms"] = round(T * total_fwd, 2)
    res["note"] = (
        "floor = T * sum_l core-scan fwd+bwd at production shapes; compare "
        "BENCH full_jitted_train_step_ms.  The scans are sequential "
        "dependence chains (2*T*L*K GRU steps/step-call), so this is the "
        "latency wall the step cannot cross without changing the "
        "recurrence itself.")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "uci_floor.json")
    with open(out, "w") as fp:
        json.dump(res, fp, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
