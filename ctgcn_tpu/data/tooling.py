# coding: utf-8
"""Dataset construction tooling (reference graph.py + data/uci/UCI.py).

  * ``build_dynamic_graph`` — shuffle a static edge list and emit
    ``graph_num`` cumulative snapshots (the synthetic dynamics used for the
    airport/jazz/blogcatalog graphs, reference graph.py:82-111).
  * ``copy_node_labels`` — replicate a static label file per snapshot
    (graph.py:114-120).
  * ``get_graph_from_nodes`` / ``get_graph_from_edges`` — BFS node-count and
    random edge-count scalability subsets (graph.py:9-79).
  * ``format_uci`` — raw KONECT ``graph.txt`` → monthly snapshot CSVs with
    'U'-prefixed node names + sorted nodes.csv (reference data/uci/UCI.py).
"""
from __future__ import annotations

import os
from collections import deque

import numpy as np
import pandas as pd

from ctgcn_tpu.utils import check_and_make_path


def build_dynamic_graph(file_path, output_dir, node_dir, sep="\t",
                        graph_num=10, rng=None):
    rng = rng or np.random
    check_and_make_path(output_dir)
    check_and_make_path(node_dir)
    df_graph = pd.read_csv(file_path, sep=sep, header=None, dtype=str)
    tot_num, col_num = df_graph.shape
    assert col_num in (2, 3)
    if col_num == 2:
        df_graph.columns = ["from_id", "to_id"]
        df_graph["weight"] = 1
    else:
        df_graph.columns = ["from_id", "to_id", "weight"]
        df_graph["weight"] = df_graph["weight"].astype(float)

    idx_arr = rng.permutation(np.arange(tot_num))
    df_graph = df_graph.loc[idx_arr, :].reset_index(drop=True)
    df_graph["from_id"] = "U" + df_graph["from_id"]
    df_graph["to_id"] = "U" + df_graph["to_id"]

    node_arr = sorted(pd.concat([df_graph["from_id"], df_graph["to_id"]],
                                axis=0).unique().tolist())
    pd.DataFrame(node_arr, columns=["node"]).to_csv(
        os.path.join(node_dir, "nodes.csv"), sep="\t", index=False,
        header=False)

    base_num = tot_num // graph_num
    if tot_num % graph_num == 0:
        pos = base_num - 1
    else:
        pos = base_num + tot_num % graph_num - 1
    df_graph.loc[:pos, :].to_csv(os.path.join(output_dir, "0.csv"),
                                 sep="\t", index=False)
    for i in range(1, graph_num):
        df_graph.loc[:pos + base_num * i, :].to_csv(
            os.path.join(output_dir, f"{i}.csv"), sep="\t", index=False)


def copy_node_labels(label_path, output_dir, graph_num=10):
    check_and_make_path(output_dir)
    df_labels = pd.read_csv(label_path, sep=" ")
    df_labels["node"] = "U" + df_labels["node"].astype(str)
    for i in range(graph_num):
        df_labels.to_csv(os.path.join(output_dir, f"{i}.csv"), sep="\t",
                         index=False)


def get_graph_from_nodes(file_path, node_file, output_node_dir,
                         output_edge_dir, sep="\t",
                         node_num_list=(50, 100, 500, 1000, 5000, 10000),
                         rng=None):
    """BFS subsets of increasing node count from the largest connected
    component (scalability-study data, reference graph.py:9-60)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    from ctgcn_tpu.data.formats import get_sp_adj_mat, read_node_list

    rng = rng or np.random
    check_and_make_path(output_node_dir)
    check_and_make_path(output_edge_dir)
    full_node_list = read_node_list(node_file)
    adj = get_sp_adj_mat(file_path, full_node_list, sep=sep).tocsr()
    n_comp, labels = connected_components(adj, directed=False)
    largest = np.argmax(np.bincount(labels))
    cc_nodes = np.nonzero(labels == largest)[0]

    for i, node_num in enumerate(node_num_list):
        start = int(rng.choice(cc_nodes))
        seen = {start}
        q = deque([start])
        order = [start]
        while q and len(seen) < node_num:
            cur = q.popleft()
            row = adj.indices[adj.indptr[cur]:adj.indptr[cur + 1]]
            for nb in row:
                if nb not in seen:
                    seen.add(int(nb))
                    order.append(int(nb))
                    q.append(int(nb))
                    if len(seen) >= node_num:
                        break
        sub = adj[np.ix_(order, order)].tocoo()
        names = [full_node_list[j] for j in order]
        pd.DataFrame(names, columns=["node"]).to_csv(
            os.path.join(output_node_dir, f"{i}.csv"), sep="\t", index=False,
            header=False)
        pd.DataFrame({
            "from_id": [names[r] for r in sub.row],
            "to_id": [names[c] for c in sub.col],
            "weight": sub.data,
        }).to_csv(os.path.join(output_edge_dir, f"{i}.csv"), sep="\t",
                  index=False)
    # full graph as the last tier
    pd.DataFrame(full_node_list, columns=["node"]).to_csv(
        os.path.join(output_node_dir, f"{len(node_num_list)}.csv"), sep="\t",
        index=False, header=False)
    pd.read_csv(file_path, sep=sep, header=0).to_csv(
        os.path.join(output_edge_dir, f"{len(node_num_list)}.csv"), sep="\t",
        index=False)


def get_graph_from_edges(file_path, node_file, output_node_dir,
                         output_edge_dir, sep="\t",
                         edge_num_list=(50, 100, 500, 1000, 5000, 10000,
                                        70000),
                         rng=None):
    """Random edge-count subsets (reference graph.py:63-79)."""
    rng = rng or np.random
    check_and_make_path(output_node_dir)
    check_and_make_path(output_edge_dir)
    df_edges = pd.read_csv(file_path, sep=sep, header=0)
    all_edge_num = df_edges.shape[0]
    for i, edge_num in enumerate(edge_num_list):
        take = min(edge_num, all_edge_num)
        idx = rng.choice(all_edge_num, size=take, replace=False)
        df_sub = df_edges.iloc[idx, :]
        node_list = pd.unique(pd.concat(
            [df_sub["from_id"], df_sub["to_id"]], axis=0)).tolist()
        pd.DataFrame(node_list, columns=["node"]).to_csv(
            os.path.join(output_node_dir, f"{i}.csv"), sep="\t", index=False)
        df_sub.to_csv(os.path.join(output_edge_dir, f"{i}.csv"), sep="\t",
                      index=False)


def format_uci(input_path, format_dir, node_dir):
    """Raw KONECT UCI graph.txt → monthly snapshot CSVs + nodes.csv
    (reference data/uci/UCI.py:8-46)."""
    check_and_make_path(format_dir)
    check_and_make_path(node_dir)
    df = pd.read_csv(input_path, sep=r"\s+", skiprows=2, header=None,
                     names=["from_id", "to_id", "weight", "timestamp"])
    dt = pd.to_datetime(df["timestamp"], unit="s")
    df["month"] = dt.dt.strftime("%Y-%m")
    df["from_id"] = "U" + df["from_id"].astype(str)
    df["to_id"] = "U" + df["to_id"].astype(str)
    nodes = pd.unique(pd.concat([df["from_id"], df["to_id"]], axis=0))
    nodes = sorted(nodes)
    pd.DataFrame(nodes, columns=["node"]).to_csv(
        os.path.join(node_dir, "nodes.csv"), sep="\t", index=False,
        header=False)
    for month, group in df.groupby("month"):
        group[["from_id", "to_id", "weight"]].to_csv(
            os.path.join(format_dir, f"{month}.csv"), sep="\t", index=False)
