# coding: utf-8
"""Multi-host (DCN-analogue) integration: two OS processes join one
jax.distributed cluster (localhost coordinator, 4+4 virtual CPU devices)
and run the product CTGCN-C embedding pipeline over the resulting 8-device
global mesh.  This exercises main._maybe_init_distributed, cross-process
device_put of the time-sharded model/data leaves, Gloo collectives for the
temporal all-gather + grad psum, and the engine's gather-before-export path
(SURVEY §5 'distributed communication backend' row; the reference has no
distributed capability at all)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from tests.conftest import make_snapshot_graph

N_NODES, N_SNAPSHOTS = 30, 8


@pytest.fixture(scope="module")
def dist_dataset(tmp_path_factory):
    """8-snapshot toy dataset + preprocessing artifacts (cores + walks)."""
    rng = np.random.RandomState(11)
    base = tmp_path_factory.mktemp("dist")
    (base / "1.format").mkdir()
    (base / "nodes_set").mkdir()
    names = [f"U{i:03d}" for i in range(N_NODES)]
    pd.DataFrame({"n": names}).to_csv(base / "nodes_set" / "nodes.csv",
                                      index=False, header=False)
    for t in range(N_SNAPSHOTS):
        g = make_snapshot_graph(rng, N_NODES, density=0.2)
        coo = g.tocoo()
        keep = coo.row < coo.col
        pd.DataFrame({
            "from_id": [names[i] for i in coo.row[keep]],
            "to_id": [names[j] for j in coo.col[keep]],
            "weight": coo.data[keep],
        }).to_csv(base / "1.format" / f"t{t}.csv", sep="\t", index=False)

    from ctgcn_tpu.preprocessing import preprocess

    preprocess("CTGCN-C", {
        "base_path": str(base), "origin_folder": "1.format",
        "core_folder": "cores", "node_file": "nodes_set/nodes.csv",
        "walk_pair_folder": "walk_pairs", "node_freq_folder": "node_freq",
        "file_sep": "\t", "walk_time": 5, "walk_length": 3, "worker": -1,
    })
    return str(base)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.integration
@pytest.mark.slow
def test_two_process_distributed_embedding(dist_dataset):
    runner = os.path.join(os.path.dirname(__file__), "dist_runner.py")
    port = _free_port()
    env_base = {
        **{k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))},
        "PYTHONPATH": "",  # disables the axon sitecustomize (CLAUDE.md)
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, runner, dist_dataset, "dist2p", "8"],
            env={**env_base, "JAX_PROCESS_ID": str(pid)},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
    assert "process 0 of 2" in outs[0]

    # single-process reference run, same seed, on this process's 8 virtual
    # devices (the fake-ICI mesh) — embeddings must agree
    from ctgcn_tpu.training.driver import gnn_embedding

    gnn_embedding("CTGCN-C", {
        "base_path": dist_dataset, "origin_folder": "1.format",
        "embed_folder": "2.embedding/dist1p", "model_folder": "model",
        "model_file": "ctgcn_dist1p", "node_file": "nodes_set/nodes.csv",
        "file_sep": "\t", "start_idx": 0, "end_idx": -1,
        "duration": N_SNAPSHOTS, "embed_dim": 8, "epoch": 2, "lr": 1e-3,
        "batch_size": 64, "load_model": False, "shuffle": True,
        "export": True, "record_time": False, "hid_dim": 12,
        "bias": True, "weight_decay": 5e-4, "learning_type": "U-neg",
        "walk_pair_folder": "walk_pairs", "node_freq_folder": "node_freq",
        "neg_num": 5, "Q": 10, "train_ratio": 0.5, "val_ratio": 0.3,
        "test_ratio": 0.2, "core_folder": "cores", "max_core": -1,
        "trans_layer_num": 1, "diffusion_layer_num": 2, "model_type": "C",
        "rnn_type": "GRU", "trans_activate_type": "L", "seed": 97,
    })
    d2 = os.path.join(dist_dataset, "2.embedding", "dist2p")
    d1 = os.path.join(dist_dataset, "2.embedding", "dist1p")
    files = sorted(os.listdir(d1))
    assert files == sorted(os.listdir(d2)) and len(files) == N_SNAPSHOTS
    for f in files:
        a = pd.read_csv(os.path.join(d1, f), sep="\t", index_col=0).values
        b = pd.read_csv(os.path.join(d2, f), sep="\t", index_col=0).values
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)
