# coding: utf-8
"""End-to-end pipeline integration tests on a tiny synthetic dynamic graph:
preprocessing → embedding training (CLI surface) → evaluation."""
import json
import os

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from tests.conftest import make_snapshot_graph


N_NODES, N_SNAPSHOTS = 40, 3


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Build a reference-layout data tree with snapshots + labels."""
    rng = np.random.RandomState(7)
    base = tmp_path_factory.mktemp("toy")
    (base / "1.format").mkdir()
    (base / "nodes_set").mkdir()
    (base / "nodes_label").mkdir()
    names = [f"U{i:03d}" for i in range(N_NODES)]
    pd.DataFrame({"n": names}).to_csv(base / "nodes_set" / "nodes.csv",
                                      index=False, header=False)
    for t in range(N_SNAPSHOTS):
        g = make_snapshot_graph(rng, N_NODES, density=0.15)
        coo = g.tocoo()
        keep = coo.row < coo.col
        pd.DataFrame({
            "from_id": [names[i] for i in coo.row[keep]],
            "to_id": [names[j] for j in coo.col[keep]],
            "weight": coo.data[keep],
        }).to_csv(base / "1.format" / f"t{t}.csv", sep="\t", index=False)
        labels = rng.randint(0, 3, N_NODES)
        pd.DataFrame({"node": names, "label": labels}).to_csv(
            base / "nodes_label" / f"t{t}.csv", sep="\t", index=False)
    return str(base)


def _embed_args(dataset, method, **over):
    args = {
        "base_path": dataset, "origin_folder": "1.format",
        "embed_folder": f"2.embedding/{method}", "model_folder": "model",
        "model_file": method.lower(), "node_file": "nodes_set/nodes.csv",
        "file_sep": "\t", "start_idx": 0, "end_idx": -1,
        "duration": N_SNAPSHOTS, "embed_dim": 8, "epoch": 2, "lr": 1e-3,
        "batch_size": 64, "load_model": False, "shuffle": True,
        "export": True, "record_time": False, "hid_dim": 12, "dropout": 0.5,
        "bias": True, "weight_decay": 5e-4, "learning_type": "U-neg",
        "walk_pair_folder": "walk_pairs", "node_freq_folder": "node_freq",
        "neg_num": 5, "Q": 10, "train_ratio": 0.5, "val_ratio": 0.3,
        "test_ratio": 0.2,
    }
    args.update(over)
    return args


@pytest.fixture(scope="module")
def preprocessed(dataset):
    from ctgcn_tpu.preprocessing import preprocess

    preprocess("CTGCN-C", {"CTGCN-C": {
        "base_path": dataset, "origin_folder": "1.format",
        "core_folder": "cores", "node_file": "nodes_set/nodes.csv",
        "walk_pair_folder": "walk_pairs", "node_freq_folder": "node_freq",
        "file_sep": "\t", "walk_time": 5, "walk_length": 3, "worker": -1,
    }}["CTGCN-C"])
    assert os.path.isdir(os.path.join(dataset, "cores", "t0"))
    assert os.path.isdir(os.path.join(dataset, "walk_pairs"))
    return dataset


@pytest.mark.integration
def test_gcn_unsupervised_end_to_end(preprocessed):
    from ctgcn_tpu.training.driver import gnn_embedding

    gnn_embedding("GCN", _embed_args(preprocessed, "GCN", duration=1))
    emb_dir = os.path.join(preprocessed, "2.embedding", "GCN")
    files = sorted(os.listdir(emb_dir))
    assert files == ["t0.csv", "t1.csv", "t2.csv"]
    df = pd.read_csv(os.path.join(emb_dir, files[0]), sep="\t", index_col=0)
    assert df.shape == (N_NODES, 8)
    assert np.isfinite(df.values).all()


@pytest.mark.integration
def test_epoch_chunking_matches_per_epoch_dispatch(preprocessed):
    """epoch_chunk scans C epochs inside one jitted dispatch; the host
    RNG stream (one split per epoch) is chunk-size-invariant, so final
    params — and exported embeddings — must be BIT-identical to chunk=1
    (the relay-overhead optimization must not change numerics)."""
    from ctgcn_tpu.training.driver import gnn_embedding

    outs = {}
    for chunk in (1, 4):
        gnn_embedding("GCN", _embed_args(
            preprocessed, "GCN", duration=1, epoch=4, seed=123,
            embed_folder=f"2.embedding/GCN_chunk{chunk}",
            model_file=f"gcn_chunk{chunk}", epoch_chunk=chunk))
        emb_dir = os.path.join(preprocessed, "2.embedding",
                               f"GCN_chunk{chunk}")
        outs[chunk] = pd.read_csv(os.path.join(emb_dir, "t2.csv"),
                                  sep="\t", index_col=0).values
    np.testing.assert_array_equal(outs[1], outs[4])


@pytest.mark.integration
def test_ctgcn_c_unsupervised_end_to_end(preprocessed):
    from ctgcn_tpu.training.driver import gnn_embedding

    gnn_embedding("CTGCN-C", _embed_args(
        preprocessed, "CTGCN-C", core_folder="cores", max_core=-1,
        trans_layer_num=1, diffusion_layer_num=2, model_type="C",
        rnn_type="GRU", trans_activate_type="L"))
    emb_dir = os.path.join(preprocessed, "2.embedding", "CTGCN-C")
    assert len(os.listdir(emb_dir)) == N_SNAPSHOTS


@pytest.mark.integration
def test_ctgcn_c_multichip_pipeline_matches_single_device(preprocessed):
    """The PRODUCT path on a mesh: config key n_devices=8 routes
    gnn_embedding through the time-sharded trainers; exported embeddings
    must match the single-device run (same seed)."""
    from ctgcn_tpu.training.driver import gnn_embedding

    common = dict(core_folder="cores", max_core=-1, trans_layer_num=1,
                  diffusion_layer_num=2, model_type="C", rnn_type="GRU",
                  trans_activate_type="L", seed=123)
    gnn_embedding("CTGCN-C", _embed_args(
        preprocessed, "CTGCN-C_1dev", model_file="ctgcn_1dev", **common))
    gnn_embedding("CTGCN-C", _embed_args(
        preprocessed, "CTGCN-C_8dev", model_file="ctgcn_8dev",
        n_devices=8, **common))
    d1 = os.path.join(preprocessed, "2.embedding", "CTGCN-C_1dev")
    d8 = os.path.join(preprocessed, "2.embedding", "CTGCN-C_8dev")
    files = sorted(os.listdir(d1))
    assert files == sorted(os.listdir(d8)) and len(files) == N_SNAPSHOTS
    for f in files:
        a = pd.read_csv(os.path.join(d1, f), sep="\t", index_col=0).values
        b = pd.read_csv(os.path.join(d8, f), sep="\t", index_col=0).values
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


@pytest.mark.integration
def test_gcn_halo_partition_pipeline_matches_single_device(preprocessed):
    """Config keys graph_partition+n_devices route static-GNN embedding
    through the halo-partitioned SpMM (all_to_all boundary exchange on the
    mesh's graph axis); exported embeddings must match the replicated
    single-device run (same seed; reduction order is the only difference)."""
    from ctgcn_tpu.training.driver import gnn_embedding

    common = dict(duration=1, seed=321)
    gnn_embedding("GCN", _embed_args(
        preprocessed, "GCN_halo1", model_file="gcn_halo1", **common))
    gnn_embedding("GCN", _embed_args(
        preprocessed, "GCN_halo8", model_file="gcn_halo8",
        n_devices=8, graph_partition=True, **common))
    d1 = os.path.join(preprocessed, "2.embedding", "GCN_halo1")
    d8 = os.path.join(preprocessed, "2.embedding", "GCN_halo8")
    files = sorted(os.listdir(d1))
    assert files == sorted(os.listdir(d8)) and len(files) == N_SNAPSHOTS
    for f in files:
        a = pd.read_csv(os.path.join(d1, f), sep="\t", index_col=0).values
        b = pd.read_csv(os.path.join(d8, f), sep="\t", index_col=0).values
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


@pytest.mark.integration
def test_ctgcn_c_halo_partition_pipeline_matches_single_device(preprocessed):
    """graph_partition for the FLAGSHIP core methods (VERDICT r3 #6): the
    delta-encoded pyramid slots row-split over the mesh's graph axis with
    one shared halo plan (parallel/core_partition) must reproduce the
    replicated single-device CTGCN-C run — same seed, reduction order and
    the delta-vs-direct slot encoding are the only differences."""
    from ctgcn_tpu.training.driver import gnn_embedding

    common = dict(core_folder="cores", max_core=-1, trans_layer_num=1,
                  diffusion_layer_num=2, model_type="C", rnn_type="GRU",
                  trans_activate_type="L", seed=321)
    gnn_embedding("CTGCN-C", _embed_args(
        preprocessed, "CTGCN-C_halo1", model_file="ctgcn_halo1", **common))
    gnn_embedding("CTGCN-C", _embed_args(
        preprocessed, "CTGCN-C_halo8", model_file="ctgcn_halo8",
        n_devices=8, graph_partition=True, **common))
    d1 = os.path.join(preprocessed, "2.embedding", "CTGCN-C_halo1")
    d8 = os.path.join(preprocessed, "2.embedding", "CTGCN-C_halo8")
    files = sorted(os.listdir(d1))
    assert files == sorted(os.listdir(d8)) and len(files) == N_SNAPSHOTS
    for f in files:
        a = pd.read_csv(os.path.join(d1, f), sep="\t", index_col=0).values
        b = pd.read_csv(os.path.join(d8, f), sep="\t", index_col=0).values
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


@pytest.mark.integration
def test_link_prediction_end_to_end(preprocessed):
    from ctgcn_tpu.evaluation.link_prediction import link_prediction

    link_prediction({
        "base_path": preprocessed, "origin_folder": "1.format",
        "embed_folder": "2.embedding", "node_file": "nodes_set/nodes.csv",
        "lp_edge_folder": "lp_data", "lp_res_folder": "lp_res",
        "file_sep": "\t", "start_idx": 0, "rep_num": 1, "train_ratio": 0.5,
        "val_ratio": 0.3, "test_ratio": 0.2, "do_lp": True, "generate": True,
        "aggregate": False, "method_list": ["GCN"],
        "c_list": [0.1, 1], "measure_list": ["Avg", "Had", "L1", "L2"],
        "max_iter": 500, "worker": -1,
    })
    rec = pd.read_csv(os.path.join(preprocessed, "lp_res_0",
                                   "GCN_auc_record.csv"))
    assert rec.shape[0] == N_SNAPSHOTS - 1  # t>=1, previous-embedding conv.
    assert ((rec[["Avg", "Had", "L1", "L2"]] >= 0).values.all()
            and (rec[["Avg", "Had", "L1", "L2"]] <= 1).values.all())


@pytest.mark.integration
def test_supervised_node_classification_end_to_end(preprocessed):
    from ctgcn_tpu.training.driver import gnn_embedding

    gnn_embedding("GCN", _embed_args(
        preprocessed, "GCN-Snode", model_file="gcn_snode", duration=1,
        learning_type="S-node", nlabel_folder="nodes_label",
        cls_hid_dim=8, cls_layer_num=1, cls_bias=True,
        cls_activate_type="N", cls_file="gcn_snode_cls"))
    emb_dir = os.path.join(preprocessed, "2.embedding", "GCN-Snode")
    assert len(os.listdir(emb_dir)) == N_SNAPSHOTS


@pytest.mark.integration
def test_supervised_link_dy_end_to_end(preprocessed):
    from ctgcn_tpu.training.driver import gnn_embedding

    gnn_embedding("CTGCN-C", _embed_args(
        preprocessed, "CTGCN-C-dy", model_file="ctgcn_dy",
        core_folder="cores", max_core=-1, trans_layer_num=1,
        diffusion_layer_num=1, model_type="C", rnn_type="GRU",
        trans_activate_type="L", learning_type="S-link-dy"))
    emb_dir = os.path.join(preprocessed, "2.embedding", "CTGCN-C-dy")
    assert len(os.listdir(emb_dir)) >= N_SNAPSHOTS - 1


@pytest.mark.integration
def test_vgrnn_supervised_link_end_to_end(preprocessed):
    """Supervised VGRNN = VAEClassificationLoss (reference metrics.py:233-247
    via train.py:214-216): VAE terms + link classification."""
    from ctgcn_tpu.training.driver import gnn_embedding

    gnn_embedding("VGRNN", _embed_args(
        preprocessed, "VGRNN-Slink", model_file="vgrnn_slink",
        learning_type="S-link-st", eps=1e-10, conv_type="GCN"))
    emb_dir = os.path.join(preprocessed, "2.embedding", "VGRNN-Slink")
    files = sorted(os.listdir(emb_dir))
    assert len(files) == N_SNAPSHOTS
    df = pd.read_csv(os.path.join(emb_dir, files[0]), sep="\t", index_col=0)
    assert df.shape == (N_NODES, 8)
    assert np.isfinite(df.values).all()


@pytest.mark.integration
def test_node_classification_eval_end_to_end(preprocessed):
    from ctgcn_tpu.evaluation.node_classification import node_classification

    node_classification({
        "base_path": preprocessed, "origin_folder": "1.format",
        "embed_folder": "2.embedding", "node_file": "nodes_set/nodes.csv",
        "nlabel_folder": "nodes_label", "nodecls_data_folder": "nc_data",
        "nodecls_res_folder": "nc_res", "file_sep": "\t", "start_idx": 0,
        "rep_num": 1, "train_ratio": 0.7, "val_ratio": 0.2,
        "test_ratio": 0.1, "do_nodecls": True, "generate": True,
        "aggregate": False, "method_list": ["GCN"], "c_list": [1],
        "max_iter": 300, "worker": -1,
    })
    rec = pd.read_csv(os.path.join(preprocessed, "nc_res_0",
                                   "GCN_acc_record.csv"))
    assert rec.shape[0] == N_SNAPSHOTS
    assert (rec["acc"] >= 0).all()


@pytest.mark.integration
def test_checkpoint_resume(preprocessed):
    """load_model=True must resume from the saved pytree checkpoint."""
    from ctgcn_tpu.training.driver import gnn_embedding
    from ctgcn_tpu.training.engine import load_params
    from ctgcn_tpu.nn.gcn import GCN

    args = _embed_args(preprocessed, "GCN-resume", model_file="gcn_resume",
                       duration=1, end_idx=0, epoch=2)
    gnn_embedding("GCN", dict(args))
    ckpt = os.path.join(preprocessed, "model", "gcn_resume")
    assert os.path.exists(ckpt)
    # template with the same shapes loads the saved state
    import jax
    template = GCN.init(jax.random.key(0), 40, 12, 8, dropout=0.5)
    loaded = load_params(template, ckpt)
    first = np.asarray(loaded.gc1.weight)
    # resume: train 1 more epoch from the checkpoint; weights must move but
    # the run must start from the saved state (not re-init)
    args2 = dict(args)
    args2.update(epoch=1, load_model=True)
    gnn_embedding("GCN", args2)
    loaded2 = load_params(template, ckpt)
    second = np.asarray(loaded2.gc1.weight)
    assert not np.allclose(first, second)  # trained further


@pytest.mark.integration
def test_tg_alias_routes_to_native_impl(preprocessed):
    """Tg* method names must route to the same TPU-native conv."""
    from ctgcn_tpu.training.driver import gnn_embedding

    gnn_embedding("TgGCN", _embed_args(
        preprocessed, "TgGCN", model_file="tggcn", duration=1, end_idx=0))
    emb_dir = os.path.join(preprocessed, "2.embedding", "TgGCN")
    assert len(os.listdir(emb_dir)) == 1


@pytest.mark.integration
def test_ctgcn_c_multichip_ell_backend(preprocessed):
    """ELL pyramid backend on the 8-device mesh (plan leaves carry a
    leading [T] axis, so the time sharding slices them) == single-device
    segment run."""
    from ctgcn_tpu.training.driver import gnn_embedding

    common = dict(core_folder="cores", max_core=-1, trans_layer_num=1,
                  diffusion_layer_num=2, model_type="C", rnn_type="GRU",
                  trans_activate_type="L", seed=7)
    gnn_embedding("CTGCN-C", _embed_args(
        preprocessed, "CTGCN-C_seg1", model_file="ctgcn_seg1",
        core_backend="segment", **common))
    gnn_embedding("CTGCN-C", _embed_args(
        preprocessed, "CTGCN-C_ell8", model_file="ctgcn_ell8",
        core_backend="ell", n_devices=8, **common))
    d1 = os.path.join(preprocessed, "2.embedding", "CTGCN-C_seg1")
    d8 = os.path.join(preprocessed, "2.embedding", "CTGCN-C_ell8")
    for f in sorted(os.listdir(d1)):
        a = pd.read_csv(os.path.join(d1, f), sep="\t", index_col=0).values
        b = pd.read_csv(os.path.join(d8, f), sep="\t", index_col=0).values
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


@pytest.mark.integration
def test_ctgcn_c_temporal_pipeline_matches_single_device(preprocessed):
    """temporal_pipeline: true routes the CTGCN forward through the GPipe
    pipelined temporal RNN (parallel/pipeline.ctgcn_pipelined_forward) on
    the product mesh; training + export must match the plain single-device
    run (the pipelined scan is the same recurrence, re-scheduled)."""
    from ctgcn_tpu.training.driver import gnn_embedding

    common = dict(core_folder="cores", max_core=-1, trans_layer_num=1,
                  diffusion_layer_num=2, model_type="C", rnn_type="GRU",
                  trans_activate_type="L", seed=31)
    gnn_embedding("CTGCN-C", _embed_args(
        preprocessed, "CTGCN-C_nopipe", model_file="ctgcn_nopipe", **common))
    gnn_embedding("CTGCN-C", _embed_args(
        preprocessed, "CTGCN-C_pipe", model_file="ctgcn_pipe",
        n_devices=8, temporal_pipeline=True, **common))
    d1 = os.path.join(preprocessed, "2.embedding", "CTGCN-C_nopipe")
    dp = os.path.join(preprocessed, "2.embedding", "CTGCN-C_pipe")
    files = sorted(os.listdir(d1))
    assert files == sorted(os.listdir(dp)) and len(files) == N_SNAPSHOTS
    for f in files:
        a = pd.read_csv(os.path.join(d1, f), sep="\t", index_col=0).values
        b = pd.read_csv(os.path.join(dp, f), sep="\t", index_col=0).values
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)
