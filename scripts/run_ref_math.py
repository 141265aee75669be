# coding: utf-8
"""Run the torch reference's CTGCN-C on the in-tree math regime (CPU) —
the >UCI cross-framework quality anchor (VERDICT r4 #3).

Mirrors the r1/r2 UCI shim: numpy>=2 compat aliases + torch_geometric
stubs (the Tg* baselines import it at module load; we never construct
them), then calls the reference's own train.gnn_embedding
(/root/reference/train.py:224) against ctgcn_tpu-generated math data and
walk/core artifacts, exporting embeddings into the shared tree so the
same link-pred harness evaluates both frameworks on identical splits.

Usage:
  python scripts/run_ref_math.py [--windows 2] [--epoch 10]
                                 [--embed-folder 2.embedding/CTGCN-C-ref]

Reduced-epoch matched comparisons are legitimate: both sides run the
SAME epoch count and splits (BASELINE_MEASURED.json notes_r2 — AUC is
epoch-sensitive, so only matched-epoch numbers are comparable).
"""
import argparse
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# --- numpy >= 2 removed aliases the 2020-era reference uses
for name, typ in [("int", int), ("float", float), ("bool", bool),
                  ("object", object)]:
    if not hasattr(np, name):
        setattr(np, name, typ)

# --- stub torch_geometric (+ torch_scatter): imported at baseline module
# load, never used by CTGCN-C
tg = types.ModuleType("torch_geometric")
tg_nn = types.ModuleType("torch_geometric.nn")


class _Unused:  # pragma: no cover - constructor-only stub
    def __init__(self, *a, **k):
        raise RuntimeError("Tg* baselines are stubbed in the shim")


for cls in ["GCNConv", "GATConv", "SAGEConv", "GINConv", "MessagePassing"]:
    setattr(tg_nn, cls, _Unused)
tg_utils = types.ModuleType("torch_geometric.utils")
for fn in ["remove_self_loops", "add_self_loops", "softmax", "degree"]:
    setattr(tg_utils, fn, _Unused)
tg_inits = types.ModuleType("torch_geometric.nn.inits")
for fn in ["glorot", "zeros", "uniform", "reset"]:
    setattr(tg_inits, fn, _Unused)
tg.nn = tg_nn
tg.utils = tg_utils
tg_nn.inits = tg_inits
tg.__path__ = []  # mark as package so submodule imports resolve
tg_nn.__path__ = []
sys.modules.setdefault("torch_geometric", tg)
sys.modules.setdefault("torch_geometric.nn", tg_nn)
sys.modules.setdefault("torch_geometric.utils", tg_utils)
sys.modules.setdefault("torch_geometric.nn.inits", tg_inits)
tsc = types.ModuleType("torch_scatter")
for fn in ["scatter_add", "scatter_mean", "scatter_max"]:
    setattr(tsc, fn, _Unused)
sys.modules.setdefault("torch_scatter", tsc)

sys.path.insert(0, "/root/reference")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=2,
                    help="how many duration-5 windows to train (from idx 0)")
    ap.add_argument("--epoch", type=int, default=10)
    ap.add_argument("--embed-folder", default="2.embedding/CTGCN-C-ref")
    ap.add_argument("--seed", type=int, default=0)
    args_cli = ap.parse_args()

    import torch
    torch.manual_seed(args_cli.seed)
    np.random.seed(args_cli.seed)
    torch.set_num_threads(max(1, (os.cpu_count() or 4) - 2))

    from train import gnn_embedding

    duration = 5
    args = {
        "base_path": os.path.join(REPO, "data/math"),
        "origin_folder": "1.format",
        "core_folder": "CTGCN/ctgcn_cores",
        "embed_folder": args_cli.embed_folder,
        "model_folder": "CTGCN/model",
        "model_file": "ctgcn-c-ref",
        "node_file": "nodes_set/nodes.csv",
        "file_sep": "\t",
        "start_idx": 0,
        # end_idx is INCLUSIVE (train.py:255-259 adds 1): windows*5 - 1
        # yields exactly `windows` full duration-5 windows
        "end_idx": args_cli.windows * duration - 1,
        "duration": duration,
        "embed_dim": 128,
        "has_cuda": False, "use_cuda": False, "thread_num": 2,
        "epoch": args_cli.epoch, "lr": 0.001, "batch_size": 32768,
        "load_model": False, "shuffle": True, "export": True,
        # record_time would overwrite data/math/CTGCN-C_time.csv (the
        # reference writes <method>_time.csv at base_path); per-epoch
        # cost lines go to stdout instead
        "record_time": False,
        "max_core": -1, "trans_layer_num": 1, "diffusion_layer_num": 2,
        "hid_dim": 500, "model_type": "C", "rnn_type": "GRU",
        "trans_activate_type": "L", "bias": True, "weight_decay": 0.0005,
        "learning_type": "U-neg",
        "walk_pair_folder": "CTGCN/ctgcn_walk_pairs",
        "node_freq_folder": "CTGCN/ctgcn_node_freq",
        "neg_num": 20, "Q": 20,
        "train_ratio": 0.5, "val_ratio": 0.3, "test_ratio": 0.2,
    }
    gnn_embedding("CTGCN-C", args)


if __name__ == "__main__":
    main()
