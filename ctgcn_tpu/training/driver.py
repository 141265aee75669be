# coding: utf-8
"""Embedding-task driver (reference train.py re-designed).

Builds per-window inputs, model, loss closures and runs the training window
loop.  Parity surface:
  * per-method normalization policy (reference train.py:53-58)
  * core methods consume the k-core pyramid bank (train.py:64-65)
  * degree features for EvolveGCN / CGCN-S / CTGCN-S (train.py:70-74)
  * window loop ``range(start_idx, end_idx, step)`` with the S-link-dy
    ``step = duration - 1`` / ``end_idx -= 1`` adjustment (train.py:253-263)
  * optional per-window time recording to ``<method>_time.csv``
    (train.py:297-300)
"""
from __future__ import annotations

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from ctgcn_tpu.data.loader import DataLoader
from ctgcn_tpu import losses as L
from ctgcn_tpu.nn import CGCN, CTGCN, MLPClassifier, EdgeClassifier
from ctgcn_tpu.nn.gcn import GCN, GCRN
from ctgcn_tpu.training.engine import SupervisedEmbedding, UnsupervisedEmbedding
from ctgcn_tpu.utils import (
    get_core_based_methods, get_neg_edge_samples, get_supported_gnn_methods,
)


# ---------------------------------------------------------------------------
# data loading
# ---------------------------------------------------------------------------

def get_data_loader(args):
    base_path = args["base_path"]
    origin_folder = args["origin_folder"]
    core_folder = args.get("core_folder", None)
    nfeature_folder = args.get("nfeature_folder", None)
    node_file = args["node_file"]

    node_path = os.path.abspath(os.path.join(base_path, node_file))
    nodes_set = pd.read_csv(node_path, names=["node"])
    node_list = nodes_set["node"].tolist()

    origin_base_path = (os.path.abspath(os.path.join(base_path, origin_folder))
                        if origin_folder else None)
    core_base_path = (os.path.abspath(os.path.join(base_path, core_folder))
                      if core_folder else None)
    nfeature_path = (os.path.abspath(os.path.join(base_path, nfeature_folder))
                     if nfeature_folder else None)
    max_time_num = len(os.listdir(origin_base_path or core_base_path))
    assert max_time_num > 0

    args["origin_base_path"] = origin_base_path
    args["core_base_path"] = core_base_path
    args["nfeature_path"] = nfeature_path
    args["node_num"] = len(node_list)
    return DataLoader(node_list, max_time_num)


def get_input_data(method, idx, time_length, data_loader: DataLoader, args):
    """Per-window inputs: (input_dim, adjs-or-pyramids, xs, edge_list)."""
    assert method in get_supported_gnn_methods()
    origin_base_path = args["origin_base_path"]
    core_base_path = args["core_base_path"]
    nfeature_path = args["nfeature_path"]
    file_sep = args.get("file_sep", "\t")

    if method in ("GCN", "GAT", "GCRN"):
        normalize, row_norm, add_eye = True, True, True
    elif method == "EvolveGCN":
        normalize, row_norm, add_eye = True, False, True
    else:
        normalize, row_norm, add_eye = False, False, False

    edge_list = data_loader.get_edge_list(origin_base_path, idx, time_length,
                                          sep=file_sep)
    neighbor_data = None
    if method in get_core_based_methods():
        # ``matmul_precision`` steers the dense pyramid bank:
        #   "highest" (default) — f32 bank, 6-pass bf16_6x dots: bit-level
        #     reference parity;
        #   "high" — f32 bank, 3-pass bf16_3x dots: ~1.75x the MXU rate at
        #     ~3.5e-6 mean rel err (data/bench_precision.json);
        #   "bf16" — bfloat16 bank, single-pass with f32 accumulation (the
        #     TPU fast path; ~same AUC, see BASELINE_MEASURED.json).
        mm_prec = args.get("matmul_precision", "highest")
        assert mm_prec in ("highest", "high", "bf16"), mm_prec
        if (args.get("graph_partition", False)
                and args.get("n_devices", 0) > 1):
            # config ``graph_partition`` for the flagship core methods:
            # delta-encoded pyramid slots row-split over the mesh's
            # ``graph`` axis with one shared halo plan per snapshot — a
            # single Enron-scale snapshot spans chips
            # (parallel/core_partition.halo_core_forward)
            from ctgcn_tpu.parallel.core_partition import (
                partition_pyramid_halo)

            per_snap = data_loader.get_core_scipy_list(
                args["core_base_path"], idx, time_length,
                max_core=args["max_core"])
            num_slots = max(len(m) for m in per_snap)
            n_parts = min(args["n_devices"], len(jax.devices()))
            args["_halo_adjs"] = tuple(
                partition_pyramid_halo(mats, data_loader.node_num, n_parts,
                                       num_slots=num_slots)
                for mats in per_snap)
            adjs = None
        else:
            adjs = data_loader.get_core_adj_list(
                core_base_path, idx, time_length, max_core=args["max_core"],
                core_backend=args.get("core_backend", "auto"),
                dense_budget_bytes=args.get("dense_budget_bytes", 4 << 30),
                dense_dtype=(jnp.bfloat16 if mm_prec == "bf16" else None),
                dense_prec=("high" if mm_prec == "high" else "highest"),
                # the mesh path needs window-uniform block shapes to shard
                # the [T] axis; single-device keeps exact ragged shapes
                # (5.1x fewer MACs on UCI — see stack_pyramids)
                uniform_blocks=args.get("n_devices", 0) > 1)
    else:
        # GIN aggregates center+neighbors together (+I) when not learn_eps
        # (reference baseline/gin.py:120-133)
        gin_add_eye = (method in ("GIN", "TgGIN")
                       and not args.get("learn_eps", True))
        adjs = data_loader.get_date_adj_list(
            origin_base_path, idx, time_length, sep=file_sep,
            normalize=normalize, row_norm=row_norm,
            add_eye=add_eye or gin_add_eye,
            adj_backend=args.get("adj_backend", "auto"))
        if (method in ("GCN", "TgGCN")
                and args.get("graph_partition", False)
                and args.get("n_devices", 0) > 1):
            # config key ``graph_partition``: split each snapshot's
            # adjacency by destination-node blocks across the mesh's
            # ``graph`` axis; SpMMs exchange only boundary features via
            # all_to_all (parallel/graph_partition.halo_gcn_forward)
            from ctgcn_tpu.parallel.graph_partition import (
                partition_graph_halo)

            mats = data_loader.get_scipy_adj_list(
                origin_base_path, idx, time_length, sep=file_sep,
                normalize=normalize, row_norm=row_norm, add_eye=add_eye)
            n_parts = min(args["n_devices"], len(jax.devices()))
            args["_halo_adjs"] = tuple(
                partition_graph_halo(m, n_parts) for m in mats)
        if method in ("SAGE", "TgSAGE") or (
                method in ("GIN", "TgGIN")
                and args.get("pooling_type", "sum") == "max"):
            from ctgcn_tpu.ops.neighbors import neighbor_table_from_scipy

            mats = data_loader.get_scipy_adj_list(origin_base_path, idx,
                                                  time_length, sep=file_sep)
            neighbor_data = neighbor_table_from_scipy(mats)
        if method == "PGNN":
            from ctgcn_tpu.nn.pgnn import precompute_dist_data

            args["_pgnn_dists"] = jnp.asarray(precompute_dist_data(
                edge_list, data_loader.node_num,
                approximate=args.get("approximate", -1)))
        if method == "VGRNN":
            # model-side adjacency: GCNConv improved renormalization
            # D^-1/2 (A_bin + 2I) D^-1/2 over binary connectivity (the
            # reference drops weights by passing edge indices only,
            # vgrnn.py:179-192); the raw ``adjs`` bank stays as the dense
            # reconstruction target for the VAE loss.
            import scipy.sparse as ssp
            from ctgcn_tpu.data.loader import stack_graphs
            from ctgcn_tpu.ops.sparse import from_scipy
            from ctgcn_tpu.utils import pad_bucket

            mats = data_loader.get_scipy_adj_list(origin_base_path, idx,
                                                  time_length, sep=file_sep)
            normed = []
            for m in mats:
                b = (m.tocsr() != 0).astype(np.float64)
                M = b + 2.0 * ssp.eye(b.shape[0])
                d = np.asarray(M.sum(axis=1)).flatten()
                dinv = np.where(d > 0, d ** -0.5, 0.0)
                D = ssp.diags(dinv)
                normed.append((D @ M @ D).tocoo())
            cap = pad_bucket(max(m.nnz for m in normed))
            args["_vgrnn_norm_adjs"] = stack_graphs(
                [from_scipy(m, pad_to=cap) for m in normed])
    args["_neighbor_data"] = neighbor_data

    if method in ("EvolveGCN", "CGCN-S", "CTGCN-S") and nfeature_path is None:
        xs, input_dim = data_loader.get_degree_feature_list(
            origin_base_path, idx, time_length, sep=file_sep,
            init_type=args["init_type"], std=args.get("std", 1e-4))
    else:
        xs, input_dim = data_loader.get_feature_list(nfeature_path, idx,
                                                     time_length, sep=file_sep)
    return input_dim, adjs, xs, edge_list


# ---------------------------------------------------------------------------
# model factory
# ---------------------------------------------------------------------------

def get_gnn_model(method, time_length, args, key):
    assert method in get_supported_gnn_methods()
    input_dim = args["input_dim"]
    hidden_dim = args["hid_dim"]
    embed_dim = args["embed_dim"]
    dropout = args.get("dropout", 0.0)
    bias = args.get("bias", True)

    if method in ("GCN", "TgGCN"):
        return GCN.init(key, input_dim, hidden_dim, embed_dim,
                        dropout=dropout, bias=bias)
    if method == "GCRN":
        rnn_type = args.get("rnn_type", "GRU")
        return GCRN.init(key, input_dim, hidden_dim, embed_dim,
                         duration=time_length, dropout=dropout, bias=bias,
                         rnn_type=rnn_type)
    if method in ("GAT", "TgGAT"):
        from ctgcn_tpu.nn.gat import GAT
        return GAT.init(key, input_dim, hidden_dim, embed_dim,
                        dropout=dropout, alpha=args.get("alpha", 0.2),
                        head_num=args.get("head_num", 1),
                        learning_type=args.get("learning_type", "U-neg"))
    if method in ("SAGE", "TgSAGE"):
        from ctgcn_tpu.nn.sage import SAGE
        return SAGE.init(key, input_dim, hidden_dim, embed_dim,
                         num_sample=args.get("num_sample", 5),
                         pooling_type=args.get("pooling_type", "sum"),
                         dropout=dropout, bias=bias)
    if method in ("GIN", "TgGIN"):
        from ctgcn_tpu.nn.gin import GIN
        return GIN.init(key, input_dim, hidden_dim, embed_dim,
                        layer_num=args.get("layer_num", 2),
                        mlp_layer_num=args.get("mlp_layer_num", 2),
                        learn_eps=args.get("learn_eps", True),
                        dropout=dropout, bias=bias)
    if method == "PGNN":
        from ctgcn_tpu.nn.pgnn import PGNN
        return PGNN.init(key, input_dim, args.get("feature_dim", hidden_dim),
                         hidden_dim, embed_dim,
                         feature_pre=args.get("feature_pre", True),
                         layer_num=args.get("layer_num", 2), dropout=dropout,
                         bias=bias)
    if method == "EvolveGCN":
        from ctgcn_tpu.nn.egcn import EvolveGCN
        return EvolveGCN.init(key, input_dim, hidden_dim, embed_dim,
                              egcn_type=args.get("model_type", "EGCNH"))
    if method == "VGRNN":
        from ctgcn_tpu.nn.vgrnn import VGRNN
        return VGRNN.init(key, input_dim, hidden_dim, embed_dim,
                          conv_type=args.get("conv_type", "GCN"),
                          bias=bias)
    # core-based methods
    trans_num = args["trans_layer_num"]
    diffusion_num = args["diffusion_layer_num"]
    model_type = args["model_type"]
    rnn_type = args.get("rnn_type", "GRU")
    trans_activate_type = args.get("trans_activate_type", "L")
    if method in ("CGCN-C", "CGCN-S"):
        return CGCN.init(key, input_dim, hidden_dim, embed_dim,
                         trans_num=trans_num, diffusion_num=diffusion_num,
                         bias=bias, rnn_type=rnn_type, model_type=model_type,
                         trans_activate_type=trans_activate_type)
    return CTGCN.init(key, input_dim, hidden_dim, embed_dim,
                      trans_num=trans_num, diffusion_num=diffusion_num,
                      duration=time_length, bias=bias, rnn_type=rnn_type,
                      model_type=model_type,
                      trans_activate_type=trans_activate_type)


@functools.lru_cache(maxsize=None)
def make_forward(method, pipeline_mesh=None, halo_mesh=None, node_num=None):
    """Build fwd(model, data, key) -> embs [T, N, d] (plus trans for
    S-variants, plus (h, loss_data) for VGRNN).

    Cached so the window loop reuses ONE fwd object per method: the
    engine's jitted multi-epoch step is cached on loss_fn identity, and
    loss_fn is cached on fwd identity — a fresh fwd per window would
    re-trace + re-load the step executable through the relay every
    window (~33 s each at AS scale, measured).

    ``data`` is the window-input pytree built by the driver and threaded
    through jit AS AN ARGUMENT — closing over the banks would embed them as
    HLO constants and blow up compilation for dense pyramids.

    ``pipeline_mesh`` (CTGCN only — config ``temporal_pipeline: true`` with
    ``n_devices``): run the temporal GRU/LSTM GPipe-pipelined over the
    mesh's time axis instead of as one replicated scan
    (parallel/pipeline.ctgcn_pipelined_forward).
    """
    if halo_mesh is not None and method in ("GCN", "TgGCN"):
        from ctgcn_tpu.parallel.graph_partition import halo_gcn_forward

        def fwd(model, data, key=None):
            return halo_gcn_forward(halo_mesh, model, data["xs"],
                                    data["halo_adjs"], node_num, key=key)
    elif halo_mesh is not None and method in get_core_based_methods():
        from ctgcn_tpu.parallel.core_partition import halo_core_forward

        def fwd(model, data, key=None):
            return halo_core_forward(halo_mesh, model, data["xs"],
                                     data["halo_adjs"], node_num, key=key)
    elif pipeline_mesh is not None and method in ("CTGCN-C", "CTGCN-S"):
        from ctgcn_tpu.parallel.pipeline import ctgcn_pipelined_forward

        def fwd(model, data, key=None):
            return ctgcn_pipelined_forward(pipeline_mesh, model,
                                           data["xs"], data["adjs"])
    elif method in get_core_based_methods():
        def fwd(model, data, key=None):
            return model(data["xs"], data["adjs"])
    elif method in ("SAGE", "TgSAGE"):
        def fwd(model, data, key=None):
            return model(data["xs"], data["neighbor_data"], key)
    elif method in ("GIN", "TgGIN"):
        def fwd(model, data, key=None):
            return model(data["xs"], data["adjs"], data["neighbor_data"],
                         key)
    elif method == "VGRNN":
        def fwd(model, data, key=None):
            # "vgrnn_hx" (optional data entry): recurrent state carried
            # across the batch loop within an epoch — the reference threads
            # hx through get_model_res (embedding.py:342-346) and its
            # Variable() re-wrap detaches it, so callers inject a
            # stop-gradient'd carry here (engine stateful protocol)
            return model(data["xs"], data["vgrnn_adjs"],
                         hx=data.get("vgrnn_hx"), key=key)
    elif method == "PGNN":
        from ctgcn_tpu.nn.pgnn import anchor_sizes, select_anchor_dists

        def fwd(model, data, key=None):
            dists = data["pgnn_dists"]
            sizes = anchor_sizes(dists.shape[1], c=1.0)
            T = dists.shape[0]
            k = key if key is not None else jax.random.key(0)
            ka, kd = jax.random.split(k)
            kt = jax.random.split(ka, T)
            dm, da = jax.vmap(
                lambda d, kk: select_anchor_dists(kk, d, sizes))(dists, kt)
            return model(data["xs"], (dm, da), kd)
    else:
        def fwd(model, data, key=None):
            return model(data["xs"], data["adjs"], key)
    return fwd


# ---------------------------------------------------------------------------
# supervised split generation (reference embedding.py:99-191)
# ---------------------------------------------------------------------------

def _pad_stack(arr_list, pad_shape_tail, dtype):
    """Stack variable-length per-timestamp arrays into [T, B, ...] + mask."""
    T = len(arr_list)
    B = max((a.shape[0] for a in arr_list), default=1)
    B = max(B, 1)
    out = np.zeros((T, B) + pad_shape_tail, dtype=dtype)
    mask = np.zeros((T, B), bool)
    for t, a in enumerate(arr_list):
        out[t, :a.shape[0]] = a
        mask[t, :a.shape[0]] = True
    return out, mask


def build_label_splits(label_list, train_ratio, val_ratio, test_ratio,
                       is_edge=False):
    """S-node / S-edge contiguous splits (reference embedding.py:111-142)."""
    splits = {"train": ([], []), "val": ([], []), "test": ([], [])}
    for labels in label_list:
        item_num = labels.shape[0]
        tr = int(np.floor(item_num * train_ratio))
        va = int(np.floor(item_num * val_ratio))
        te = int(np.floor(item_num * test_ratio))
        segs = {"train": labels[:tr], "val": labels[tr:tr + va],
                "test": labels[tr + va:tr + va + te]}
        for name, seg in segs.items():
            if is_edge:
                splits[name][0].append(seg[:, :2])
                splits[name][1].append(seg[:, 2])
            else:
                splits[name][0].append(seg[:, 0])
                splits[name][1].append(seg[:, 1])
    out = {}
    for name, (items, labels) in splits.items():
        tail = (2,) if is_edge else ()
        idx, mask = _pad_stack(items, tail, np.int32)
        lab, _ = _pad_stack(labels, (), np.int64)
        out[name] = (jnp.asarray(idx), jnp.asarray(lab), jnp.asarray(mask))
    return out


def build_link_splits(edge_list, node_num, train_ratio, val_ratio, test_ratio,
                      learning_type):
    """S-link-st / S-link-dy edge splits with negative sampling
    (reference embedding.py:144-191); dy starts at t=1."""
    start = 1 if learning_type == "S-link-dy" else 0
    splits = {"train": ([], []), "val": ([], []), "test": ([], [])}
    for t in range(start, len(edge_list)):
        edges = edge_list[t].T  # [E, 2]
        all_edge_dict = {(int(u), int(v)): 1 for u, v in edges}
        for nid in range(node_num):
            all_edge_dict.pop((nid, nid), None)
        edges = edges.copy()
        np.random.shuffle(edges)
        E = edges.shape[0]
        tr = int(np.floor(E * train_ratio))
        va = int(np.floor(E * val_ratio))
        te = int(np.floor(E * test_ratio))
        segs = {"train": edges[:tr], "val": edges[tr:tr + va],
                "test": edges[tr + va:tr + va + te]}
        for name, pos in segs.items():
            n_pos = pos.shape[0]
            both = get_neg_edge_samples(pos, n_pos, all_edge_dict, node_num,
                                        add_label=False)
            labels = np.concatenate([np.ones(n_pos), np.zeros(n_pos)])
            splits[name][0].append(both.astype(np.int64))
            splits[name][1].append(labels)
    out = {}
    for name, (items, labels) in splits.items():
        idx, mask = _pad_stack(items, (2,), np.int32)
        lab, _ = _pad_stack(labels, (), np.float32)
        out[name] = (jnp.asarray(idx), jnp.asarray(lab), jnp.asarray(mask))
    return out


def _vgrnn_dense_bank(adjs):
    """Dense [T, N, N] reconstruction target for the VAE loss (the reference
    densifies adj inside VAELoss too, metrics.py:144)."""
    from ctgcn_tpu.ops.sparse import to_dense

    return jax.vmap(
        lambda t: to_dense(jax.tree.map(lambda a: a[t], adjs)))(
            jnp.arange(adjs.rows.shape[0]))


def _binary_auc(preds, labels, mask):
    from sklearn.metrics import roc_auc_score

    p = np.asarray(jax.nn.sigmoid(preds)).reshape(-1)
    y = np.asarray(labels).reshape(-1)
    m = np.asarray(mask).reshape(-1)
    try:
        return float(roc_auc_score(y[m], p[m]))
    except ValueError:
        return float("nan")


def _multiclass_auc(preds, labels, mask, n_class):
    from sklearn.metrics import roc_auc_score
    from sklearn.preprocessing import label_binarize

    p = jax.nn.softmax(jnp.asarray(preds), axis=-1)
    p = np.asarray(p).reshape(-1, p.shape[-1])
    y = np.asarray(labels).reshape(-1)
    m = np.asarray(mask).reshape(-1)
    try:
        return float(roc_auc_score(
            label_binarize(y[m], classes=np.arange(n_class)), p[m],
            multi_class="ovr", average="micro"))
    except ValueError:
        return float("nan")


# ---------------------------------------------------------------------------
# the window loop
# ---------------------------------------------------------------------------

def _make_product_mesh(args, time_length):
    """Config key ``n_devices`` (>1) routes the embedding task through the
    sharded trainers (parallel/mesh.embedding_shardings): per-timestep
    MLP+CDN stacks and [T]-leading data leaves spread over a ``time``-axis
    device mesh.  Absent/0/1 → single-device (the default, reference
    posture).

    The mesh's time axis must divide the window length (XLA shards the
    leading [T] axis evenly), so the requested count is clamped to the
    largest divisor of ``time_length`` — e.g. UCI's T=7 window on 8 chips
    uses 7.  Windows whose length is coprime with every usable count fall
    back to single-device with a notice."""
    n = args.get("n_devices", 0)
    if not n or n <= 1:
        return None
    import jax

    n = min(n, len(jax.devices()))
    while n > 1 and time_length % n != 0:
        n -= 1
    if n <= 1:
        print(f"n_devices: no divisor of T={time_length} in range; "
              f"running single-device")
        return None
    from ctgcn_tpu.parallel.mesh import make_mesh

    return make_mesh(n)


def gnn_embedding(method, args):
    base_path = args["base_path"]
    origin_folder = args["origin_folder"]
    embedding_folder = args["embed_folder"]
    model_folder = args.get("model_folder", "model")
    model_file = args.get("model_file", method.lower())
    start_idx = args["start_idx"]
    end_idx = args["end_idx"]
    duration = args["duration"]
    learning_type = args["learning_type"]
    epoch = args["epoch"]
    lr = args["lr"]
    batch_size = args["batch_size"]
    load_model = args.get("load_model", False)
    shuffle = args.get("shuffle", True)
    export = args.get("export", True)
    record_time = args.get("record_time", False)
    weight_decay = args.get("weight_decay", 0.0)
    seed = args.get("seed", 0)
    # over-budget backward policy for core methods (nn.core_models._remat):
    # "full" (default — the only footprint that fits the largest regimes)
    # or "save_spmm" (keep SpMM outputs resident, skip their backward
    # recompute — measured 905->754 ms on the Facebook-scale step where
    # HBM allows).  Read at trace time, so set before any model build.
    remat_policy = args.get("remat_policy")
    if remat_policy:
        assert remat_policy in ("full", "save_spmm"), remat_policy
        os.environ["CTGCN_TPU_REMAT_POLICY"] = remat_policy
    if args.get("layer_remat"):
        # per-CoreDiffusion-layer checkpoint (see nn.core_models.CDN):
        # the enron-scale memory knob
        os.environ["CTGCN_TPU_LAYER_REMAT"] = "1"

    data_loader = get_data_loader(args)
    max_time_num = data_loader.max_time_num
    node_list = data_loader.full_node_list

    if start_idx < 0:
        start_idx = max_time_num + start_idx
    if end_idx < 0:
        end_idx = max_time_num + end_idx + 1
    else:
        end_idx = end_idx + 1
    step = duration
    if learning_type == "S-link-dy":
        assert duration >= 2 and end_idx - start_idx >= 1
        end_idx = end_idx - 1
        step = duration - 1

    t_start = time.time()
    time_list = []
    print(f"start_idx = {start_idx}, end_idx = {end_idx}, "
          f"duration = {duration}")
    print(f"start {method} embedding! (ctgcn_tpu)")
    key = jax.random.key(seed)
    # config key ``profile_dir``: the trainers capture a jax.profiler
    # device trace of the steady-state epochs (training/profiling.py) —
    # the XLA-op/fusion/transfer analogue of the reference's wall-clock
    # prints (SURVEY §5 tracing row)
    phase_times = os.environ.get("CTGCN_TPU_PHASE_TIMES")
    for widx, idx in enumerate(range(start_idx, end_idx, step)):
        print(f"idx = {idx}, duration = {duration}")
        t_phase = time.time()
        time_length = min(idx + duration, end_idx) - idx
        input_dim, adjs, xs, edge_list = get_input_data(
            method, idx, time_length, data_loader, args)
        if phase_times:
            print(f"  [phase] get_input_data: {time.time() - t_phase:.2f}s")
            t_phase = time.time()
        args["input_dim"] = input_dim
        data = {
            "adjs": adjs,
            "xs": xs,
            "neighbor_data": args.pop("_neighbor_data", None),
            "vgrnn_adjs": args.pop("_vgrnn_norm_adjs", None),
            "pgnn_dists": args.pop("_pgnn_dists", None),
            "halo_adjs": args.pop("_halo_adjs", None),
        }
        key, k_model = jax.random.split(key)
        model = get_gnn_model(method, time_length, args, k_model)
        if phase_times:
            print(f"  [phase] model init: {time.time() - t_phase:.2f}s")
            t_phase = time.time()
        halo_mesh = None
        if data["halo_adjs"] is not None:
            # graph-partitioned path: the mesh axis is ``graph`` (snapshot
            # rows), not ``time`` — the trainer-level time sharding does
            # not apply, the shard_map inside the forward does the work
            from ctgcn_tpu.parallel.mesh import make_mesh

            halo_mesh = make_mesh(data["halo_adjs"][0].parts,
                                  axis_name="graph")
            mesh = None
        else:
            mesh = _make_product_mesh(args, time_length)
        pipeline_mesh = (mesh if (mesh is not None
                                  and args.get("temporal_pipeline", False)
                                  and method in ("CTGCN-C", "CTGCN-S"))
                         else None)
        fwd = make_forward(method, pipeline_mesh=pipeline_mesh,
                           halo_mesh=halo_mesh,
                           node_num=data_loader.node_num)
        # every window overwrites the SAME model file (reference
        # embedding.py:363 — only the last window's save survives), and a
        # params pull through the relay runs at ~2 MB/s, so skip the
        # redundant intermediate saves unless the run reloads them
        # (load_model) — ~4 min/window saved at math scale (254 MB params)
        is_last = idx + step >= end_idx
        window_model_file = (model_file if (is_last or load_model)
                             else None)
        cost = _run_window(method, model, fwd, data, data_loader, args, idx,
                           time_length, edge_list, learning_type, base_path,
                           origin_folder, embedding_folder, node_list,
                           model_folder, window_model_file, epoch, batch_size,
                           lr, weight_decay, load_model, shuffle, export,
                           seed + widx, mesh)
        time_list.append(cost)
        if record_time:
            # rewrite after every window so a killed long run keeps the
            # completed windows' times (multi-hour enron/facebook jobs)
            pd.DataFrame({"time": time_list}).to_csv(
                os.path.join(base_path, method + "_time.csv"), sep=",",
                index=False)
        if phase_times:
            print(f"  [phase] run_window (train {cost:.2f}s incl): "
                  f"{time.time() - t_phase:.2f}s")
        if os.environ.get("CTGCN_TPU_MEM_REPORT"):
            try:
                stats = jax.local_devices()[0].memory_stats() or {}
                peak = stats.get("peak_bytes_in_use")
                if peak is None:  # axon relay exposes no allocator stats —
                    # report live client-tracked buffers instead
                    peak = f"live_buffers={sum(x.nbytes for x in jax.live_arrays()) >> 20} MiB"
                print(f"idx = {idx}: peak_bytes_in_use={peak}, "
                      f"bytes_in_use={stats.get('bytes_in_use')}")
            except Exception:
                pass

    if record_time:
        pd.DataFrame({"time": time_list}).to_csv(
            os.path.join(base_path, method + "_time.csv"), sep=",",
            index=False)
    print(f"finish {method} embedding! cost time: "
          f"{time.time() - t_start} seconds!")


@functools.lru_cache(maxsize=None)
def _uneg_loss_fn(fwd, take_first, neg_num, Q):
    def loss_fn(m, d, b_idx, b_mask, k):
        k_drop, k_samp = jax.random.split(k)
        res = fwd(m, d, k_drop)
        embs = res[0] if take_first else res
        return L.negative_sampling_loss(embs, b_idx, b_mask, d["walk"],
                                        k_samp, neg_num=neg_num, Q=Q)

    return loss_fn


@functools.lru_cache(maxsize=None)
def _vae_loss_fn(fwd, eps):
    def loss_fn(m, d, b_idx, b_mask, k):
        _, _, (em, es, pm, ps, dec) = fwd(m, d, k)
        return L.vae_loss(em, es, pm, ps, dec, d["vae_adj_dense"], eps=eps)

    return loss_fn


# ---------------------------------------------------------------------------
# VGRNN hidden-state carry (reference embedding.py:342-346: hx flows across
# the batch loop within an epoch, detached at each re-entry by Variable())
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _vgrnn_state_init():
    def init(model, data):
        return jnp.zeros((model.rnn_layer_num, data["vgrnn_adjs"].n_rows,
                          model.hidden_dim))

    return init


@functools.lru_cache(maxsize=None)
def _vae_loss_fn_stateful(fwd, eps):
    """VGRNN U-own loss with the hx carry (engine stateful protocol)."""
    def loss_fn(m, d, b_idx, b_mask, k, hx):
        d2 = dict(d)
        d2["vgrnn_hx"] = hx
        _, h, (em, es, pm, ps, dec) = fwd(m, d2, k)
        return (L.vae_loss(em, es, pm, ps, dec, d["vae_adj_dense"], eps=eps),
                h)

    return loss_fn


@functools.lru_cache(maxsize=None)
def _uneg_loss_fn_stateful(fwd, neg_num, Q):
    """VGRNN U-neg loss with the hx carry (the reference threads hx through
    get_model_res for every learning type, embedding.py:299-321)."""
    def loss_fn(m, d, b_idx, b_mask, k, hx):
        k_drop, k_samp = jax.random.split(k)
        d2 = dict(d)
        d2["vgrnn_hx"] = hx
        res = fwd(m, d2, k_drop)
        return (L.negative_sampling_loss(res[0], b_idx, b_mask, d["walk"],
                                         k_samp, neg_num=neg_num, Q=Q),
                res[1])

    return loss_fn


@functools.lru_cache(maxsize=None)
def _embed_fn_stateful(fwd):
    """(model, data, hx) -> (embeddings, new_hx) — lets the engine replay
    the final epoch's batch-loop carry for export (embedding.py:361 exports
    the last batch forward's output_list, which consumed the carried hx)."""
    def embed(m, d, hx):
        d2 = dict(d)
        d2["vgrnn_hx"] = hx
        res = fwd(m, d2, None)
        return res[0], res[1]

    return embed


@functools.lru_cache(maxsize=None)
def _recon_loss_fn(fwd):
    def loss_fn(m, d, b_idx, b_mask, k):
        embs, trans = fwd(m, d, k)
        return L.reconstruction_loss(embs, trans, b_idx, b_mask)

    return loss_fn


@functools.lru_cache(maxsize=None)
def _embed_fn(fwd, select):
    def embed(m, d):
        res = fwd(m, d, None)
        # S-variants export the structure embedding (embedding.py:320-321)
        if select == "trans":
            return res[1]
        if select == "first":
            return res[0]
        return res

    return embed


def _run_window(method, model, fwd, data, data_loader, args, idx,
                time_length, edge_list, learning_type, base_path,
                origin_folder, embedding_folder, node_list, model_folder,
                model_file, epoch, batch_size, lr, weight_decay, load_model,
                shuffle, export, seed, mesh=None):
    is_s_variant = method in ("CGCN-S", "CTGCN-S")
    is_vgrnn = method == "VGRNN"

    if learning_type in ("U-neg", "U-own"):
        # loss_fn / embed_fn come from lru_cached factories so the SAME
        # function objects serve every window — the engine caches its
        # jitted multi-epoch step on loss_fn identity (fresh closures per
        # window forced a ~33 s re-trace + executable reload through the
        # relay at every AS window, measured)
        state_init = _vgrnn_state_init() if is_vgrnn else None
        if learning_type == "U-neg":
            walk = data_loader.get_walk_data(
                os.path.abspath(os.path.join(base_path,
                                             args["walk_pair_folder"])),
                os.path.abspath(os.path.join(base_path,
                                             args["node_freq_folder"])),
                idx, time_length)
            data["walk"] = walk
            if is_vgrnn:
                loss_fn = _uneg_loss_fn_stateful(fwd, args["neg_num"],
                                                 args["Q"])
            else:
                loss_fn = _uneg_loss_fn(fwd, is_s_variant,
                                        args["neg_num"], args["Q"])
        elif is_vgrnn:  # U-own: VAE loss (reference train.py:184-186)
            data["vae_adj_dense"] = _vgrnn_dense_bank(data["adjs"])
            loss_fn = _vae_loss_fn_stateful(fwd, args.get("eps", 1e-10))
        else:  # U-own: reconstruction loss for CGCN-S/CTGCN-S
            assert is_s_variant, (
                f"U-own is only defined for S-variants and VGRNN, "
                f"got {method}")
            loss_fn = _recon_loss_fn(fwd)

        embed_fn = _embed_fn(fwd, "trans" if is_s_variant
                             else "first" if is_vgrnn else "plain")

        trainer = UnsupervisedEmbedding(
            base_path=base_path, origin_folder=origin_folder,
            embedding_folder=embedding_folder, node_list=node_list,
            model=model, loss_fn=loss_fn, embed_fn=embed_fn, data=data,
            model_folder=model_folder, mesh=mesh,
            time_length=time_length, state_init=state_init,
            embed_state_fn=_embed_fn_stateful(fwd) if is_vgrnn else None)
        return trainer.learn_embedding(
            epoch=epoch, batch_size=batch_size, lr=lr, start_idx=idx,
            weight_decay=weight_decay, model_file=model_file,
            load_model=load_model, shuffle=shuffle, export=export, seed=seed,
            profile_dir=args.get("profile_dir"),
            epoch_chunk=args.get("epoch_chunk", 10))

    # ------------------------------------------------------------------
    # supervised learning types
    # ------------------------------------------------------------------
    embed_dim = args["embed_dim"]
    if method == "PGNN":
        # PGNN's embedding width is the anchor-set count (~log²N), NOT
        # embed_dim — the reference builds its S-node classifier with
        # embed_dim (train.py:204) and crashes on the dim mismatch; the
        # true output width is used here so S-node PGNN actually runs.
        from ctgcn_tpu.nn.pgnn import anchor_sizes

        embed_dim = len(anchor_sizes(data_loader.node_num, c=1.0))
    cls_hidden = args.get("cls_hid_dim", embed_dim)
    cls_layer_num = args.get("cls_layer_num", 1)
    cls_bias = args.get("cls_bias", True)
    cls_activate = args.get("cls_activate_type", "N")
    train_ratio = args["train_ratio"]
    val_ratio = args["val_ratio"]
    test_ratio = args["test_ratio"]
    file_sep = args.get("file_sep", "\t")
    key = jax.random.key(seed + 1000)

    drop_last = learning_type == "S-link-dy"

    if learning_type == "S-node":
        nlabel_path = os.path.abspath(
            os.path.join(base_path, args["nlabel_folder"]))
        node_labels, n_class = data_loader.get_node_label_list(
            nlabel_path, idx, time_length, sep=file_sep)
        classifier = MLPClassifier.init(key, embed_dim, cls_hidden, n_class,
                                        cls_layer_num, bias=cls_bias,
                                        activate_type=cls_activate)
        splits = build_label_splits(node_labels, train_ratio, val_ratio,
                                    test_ratio, is_edge=False)

        def forward_fn(models, d, items, k):
            m, cls = models
            res = fwd(m, d, k)
            embs = res[0] if (is_s_variant or is_vgrnn) else res
            preds = jax.vmap(lambda e, i: cls.mlp(e[i]))(embs, items)
            return preds, embs, (res[1] if is_s_variant
                                 else ((res[1], res[2]) if is_vgrnn else None))

        def loss_fn(preds, labels, mask, aux):
            loss, acc = L.classification_loss(preds, labels, n_class,
                                              mask=mask)
            return loss, acc

        auc_fn = lambda p, y, m: _multiclass_auc(p, y, m, n_class)
    elif learning_type == "S-edge":
        elabel_path = os.path.abspath(
            os.path.join(base_path, args["elabel_folder"]))
        edge_labels, n_class = data_loader.get_edge_label_list(
            elabel_path, idx, time_length, sep=file_sep)
        classifier = EdgeClassifier.init(key, embed_dim, cls_hidden, n_class,
                                         cls_layer_num, bias=cls_bias,
                                         activate_type=cls_activate)
        splits = build_label_splits(edge_labels, train_ratio, val_ratio,
                                    test_ratio, is_edge=True)

        def forward_fn(models, d, items, k):
            m, cls = models
            res = fwd(m, d, k)
            embs = res[0] if (is_s_variant or is_vgrnn) else res
            # items: [T, B, 2] edge endpoints
            def per_t(e, it):
                feats = e[it[:, 0]] * e[it[:, 1]]
                return cls.classifier.mlp(feats)
            preds = jax.vmap(per_t)(embs, items)
            return preds, embs, (res[1] if is_s_variant
                                 else ((res[1], res[2]) if is_vgrnn else None))

        def loss_fn(preds, labels, mask, aux):
            return L.classification_loss(preds, labels, n_class, mask=mask)

        auc_fn = lambda p, y, m: _multiclass_auc(p, y, m, n_class)
    else:  # S-link-st / S-link-dy
        classifier = None
        n_class = 2
        splits = build_link_splits(edge_list, data_loader.node_num,
                                   train_ratio, val_ratio, test_ratio,
                                   learning_type)

        def forward_fn(models, d, items, k):
            m, _ = models
            res = fwd(m, d, k)
            embs = res[0] if (is_s_variant or is_vgrnn) else res
            used = embs[:-1] if drop_last else embs
            def per_t(e, it):
                return jnp.sum(e[it[:, 0]] * e[it[:, 1]], axis=-1)
            preds = jax.vmap(per_t)(used, items)
            return preds, embs, (res[1] if is_s_variant
                                 else ((res[1], res[2]) if is_vgrnn else None))

        def loss_fn(preds, labels, mask, aux):
            return L.classification_loss(preds, labels, n_class, mask=mask)

        auc_fn = _binary_auc

    if is_s_variant:
        base_loss = loss_fn

        def loss_fn(preds, labels, mask, aux):  # noqa: F811
            # StructureClassificationLoss (reference metrics.py:214-229):
            # reconstruction (all rows) + classification
            loss, acc = base_loss(preds, labels, mask, None)
            embs, trans = aux
            return loss + L.reconstruction_loss(embs, trans), acc

        inner_forward = forward_fn

        def forward_fn(models, d, items, k):  # noqa: F811
            preds, embs, trans = inner_forward(models, d, items, k)
            return preds, embs, (embs, trans)
    elif is_vgrnn:
        # VAEClassificationLoss (reference metrics.py:233-247, wired at
        # train.py:214-216 / embedding.py:200-206): VAE terms on the model's
        # (enc, prior, dec) outputs + the classification loss.
        eps = args.get("eps", 1e-10)
        data["vae_adj_dense"] = _vgrnn_dense_bank(data["adjs"])
        base_loss = loss_fn

        def loss_fn(preds, labels, mask, aux):  # noqa: F811
            loss, acc = base_loss(preds, labels, mask, None)
            (em, es, pm, ps, dec), adj_dense = aux
            vae = L.vae_loss(em, es, pm, ps, dec, adj_dense, eps=eps)
            return loss + vae, acc

        inner_forward = forward_fn

        def forward_fn(models, d, items, k, hx):  # noqa: F811
            # stateful protocol (engine): hx in, post-recurrence h out —
            # the reference threads hx train -> val within an epoch and
            # keeps best_hx for test eval (embedding.py:238-263, 278)
            d2 = dict(d)
            d2["vgrnn_hx"] = hx
            preds, embs, aux = inner_forward(models, d2, items, k)
            h, loss_data = aux
            return preds, embs, (loss_data, d["vae_adj_dense"]), h

    def embed_fn(models, d):
        res = fwd(models[0], d, None)
        if is_s_variant:
            return res[1]
        if is_vgrnn:
            return res[0]
        return res

    trainer = SupervisedEmbedding(
        base_path=base_path, origin_folder=origin_folder,
        embedding_folder=embedding_folder, node_list=node_list, model=model,
        classifier=classifier, forward_fn=forward_fn, loss_fn=loss_fn,
        embed_fn=embed_fn, data=data, auc_fn=auc_fn,
        model_folder=model_folder, mesh=mesh,
        time_length=time_length,
        state_init=_vgrnn_state_init() if is_vgrnn else None)
    tr, va, te = splits["train"], splits["val"], splits["test"]
    return trainer.learn_embedding(
        tr[0], tr[1], tr[2], va[0], va[1], va[2], te[0], te[1], te[2],
        epoch=epoch, lr=lr, start_idx=idx, weight_decay=weight_decay,
        model_file=model_file, classifier_file=args.get("cls_file", None),
        load_model=load_model, export=export, seed=seed,
        profile_dir=args.get("profile_dir"))
