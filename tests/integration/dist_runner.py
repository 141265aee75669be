# coding: utf-8
"""Subprocess entry for the 2-process jax.distributed integration test.

Invoked as ``python dist_runner.py <base_path> <embed_tag> <n_devices>``
with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID in the
environment (the test launches two of these against one localhost
coordinator, 4 virtual CPU devices each → an 8-device global mesh spanning
two processes, the DCN-analogue posture of SURVEY §5).

Runs one CTGCN-C gnn_embedding window through the product ``n_devices``
mesh path; process 0 exports the embedding CSVs.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    base_path, tag, n_devices = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from ctgcn_tpu.main import _maybe_init_distributed

    _maybe_init_distributed()
    import jax

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == n_devices, jax.device_count()

    from ctgcn_tpu.training.driver import gnn_embedding

    n_snaps = len(os.listdir(os.path.join(base_path, "1.format")))
    gnn_embedding("CTGCN-C", {
        "base_path": base_path, "origin_folder": "1.format",
        "embed_folder": f"2.embedding/{tag}", "model_folder": "model",
        "model_file": f"ctgcn_{tag}", "node_file": "nodes_set/nodes.csv",
        "file_sep": "\t", "start_idx": 0, "end_idx": -1,
        "duration": n_snaps, "embed_dim": 8, "epoch": 2, "lr": 1e-3,
        "batch_size": 64, "load_model": False, "shuffle": True,
        "export": True, "record_time": False, "hid_dim": 12,
        "bias": True, "weight_decay": 5e-4, "learning_type": "U-neg",
        "walk_pair_folder": "walk_pairs", "node_freq_folder": "node_freq",
        "neg_num": 5, "Q": 10, "train_ratio": 0.5, "val_ratio": 0.3,
        "test_ratio": 0.2, "core_folder": "cores", "max_core": -1,
        "trans_layer_num": 1, "diffusion_layer_num": 2, "model_type": "C",
        "rnn_type": "GRU", "trans_activate_type": "L", "seed": 97,
        "n_devices": n_devices,
    })
    print(f"dist_runner process {jax.process_index()} done")


if __name__ == "__main__":
    main()
