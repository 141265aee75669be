# coding: utf-8
"""Dataset tooling + preprocessing artifact tests (CPU)."""
import json
import os

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from ctgcn_tpu.data.tooling import (
    build_dynamic_graph, copy_node_labels, format_uci, get_graph_from_edges,
)


def test_build_dynamic_graph_cumulative(tmp_path):
    src = tmp_path / "raw.csv"
    rows = [f"{i}\t{i + 1}" for i in range(100)]
    src.write_text("\n".join(rows) + "\n")
    out = tmp_path / "fmt"
    nodes = tmp_path / "nodes"
    build_dynamic_graph(str(src), str(out), str(nodes), sep="\t",
                        graph_num=5, rng=np.random.RandomState(0))
    files = sorted(os.listdir(out))
    assert files == [f"{i}.csv" for i in range(5)]
    sizes = [len(pd.read_csv(out / f, sep="\t")) for f in files]
    # cumulative snapshots: monotonically growing, last = all edges
    assert sizes == sorted(sizes)
    assert sizes[-1] == 100
    node_df = pd.read_csv(nodes / "nodes.csv", sep="\t", header=None)
    assert node_df[0].str.startswith("U").all()


def test_copy_node_labels(tmp_path):
    lp = tmp_path / "labels.csv"
    lp.write_text("node label\n1 0\n2 1\n")
    out = tmp_path / "out"
    copy_node_labels(str(lp), str(out), graph_num=3)
    assert sorted(os.listdir(out)) == ["0.csv", "1.csv", "2.csv"]
    df = pd.read_csv(out / "0.csv", sep="\t")
    assert list(df["node"]) == ["U1", "U2"]


def test_get_graph_from_edges(tmp_path, rng):
    src = tmp_path / "edges.csv"
    n = 50
    df = pd.DataFrame({
        "from_id": [f"U{rng.randint(n)}" for _ in range(200)],
        "to_id": [f"U{rng.randint(n)}" for _ in range(200)],
        "weight": 1.0,
    })
    df.to_csv(src, sep="\t", index=False)
    get_graph_from_edges(str(src), None, str(tmp_path / "n"),
                         str(tmp_path / "e"), edge_num_list=(10, 50),
                         rng=np.random.RandomState(0))
    e0 = pd.read_csv(tmp_path / "e" / "0.csv", sep="\t")
    assert len(e0) == 10


def test_format_uci_real_input():
    raw = "/root/repo/data/uci/0.input/graph.txt"
    if not os.path.exists(raw):
        pytest.skip("raw UCI input not present")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        fmt = os.path.join(td, "fmt")
        nd = os.path.join(td, "nodes")
        format_uci(raw, fmt, nd)
        files = sorted(os.listdir(fmt))
        # reference ships 7 monthly snapshots 2004-04..2004-10
        assert files[0] == "2004-04.csv" and files[-1] == "2004-10.csv"
        nodes = pd.read_csv(os.path.join(nd, "nodes.csv"), header=None)
        assert len(nodes) == 1899
        # byte-compatible with the reference's formatted tree
        ref = pd.read_csv("/root/repo/data/uci/1.format/2004-04.csv",
                          sep="\t")
        got = pd.read_csv(os.path.join(fmt, "2004-04.csv"), sep="\t")
        assert set(got.columns) == set(ref.columns)
        assert len(got) == len(ref)


def test_walk_artifacts_contract(tmp_path, rng):
    """Walk generation emits the reference's artifact formats."""
    from ctgcn_tpu.preprocessing.walks import random_walk

    n = 30
    dense = (rng.rand(n, n) < 0.3).astype(np.float32)
    dense = np.triu(dense, 1)
    dense = dense + dense.T
    adj = sp.coo_matrix(dense)
    random_walk(adj, str(tmp_path), str(tmp_path), "t0.csv", walk_length=3,
                walk_time=4, weighted=True, rng=np.random.RandomState(0))
    pairs = sp.load_npz(tmp_path / "t0.npz")
    assert pairs.shape == (n, n)
    # binary symmetric, no self-pairs
    assert set(np.unique(pairs.toarray())) <= {0.0, 1.0}
    assert abs(pairs - pairs.T).sum() == 0
    assert pairs.diagonal().sum() == 0
    freq = json.load(open(tmp_path / "t0.json"))
    assert all(0 <= i < n for i in freq)
    assert len(freq) > 0


def test_eval_split_reps_are_distinct(tmp_path):
    """Per-rep seeded DataGenerators must produce DIFFERENT splits for
    different reps and IDENTICAL splits for the same rep — the unseeded
    global-np.random path collides across reps when generation runs in
    fork-inherited Pool workers (bug found in committed lp_data_1/2)."""
    import pandas as pd
    from ctgcn_tpu.evaluation.link_prediction import DataGenerator

    base = tmp_path
    (base / "1.format").mkdir()
    (base / "nodes_set").mkdir()
    names = [f"N{i}" for i in range(30)]
    pd.DataFrame({"n": names}).to_csv(base / "nodes_set" / "nodes.csv",
                                      index=False, header=False)
    rng = np.random.RandomState(0)
    edges = set()
    while len(edges) < 120:
        a, b = rng.randint(0, 30, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    df = pd.DataFrame({"from_id": [names[a] for a, _ in edges],
                       "to_id": [names[b] for _, b in edges],
                       "weight": 1.0})
    df.to_csv(base / "1.format" / "t0.csv", sep="\t", index=False)

    def gen(rep, out):
        g = DataGenerator(str(base), "1.format", out, "nodes_set/nodes.csv",
                          train_ratio=0.5, val_ratio=0.2, test_ratio=0.3,
                          seed=rep)
        g.generate_edge_sample("t0.csv")
        return pd.read_csv(base / out / "t0_test.csv", sep="\t")

    a1 = gen(1, "lp_a1")
    a2 = gen(2, "lp_a2")
    a1_again = gen(1, "lp_a1b")
    assert not a1.equals(a2), "different reps must differ"
    assert a1.equals(a1_again), "same rep must reproduce"
