# coding: utf-8
"""Host-side graph file IO.

Artifact contract matches the reference so both frameworks can run
side-by-side on the same data tree:

  <base>/<origin_folder>/<date>.csv      tab-separated edges, header row,
                                         columns from_id, to_id[, weight]
  <base>/nodes_set/nodes.csv             one node name per line (no header)
  <base>/<core_folder>/<date>/<k>.npz    k-core adjacency (scipy), zero-padded
  <base>/<walk_pair_folder>/<date>.npz   walk co-occurrence matrix
  <base>/<node_freq_folder>/<date>.json  replicated negative-sampling list

Reading semantics reproduce reference utils.py:23-58: symmetric adjacency
(reverse edges added), self-loops dropped, header row skipped, weight
defaults to 1.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import scipy.sparse as sp


def read_node_list(node_path):
    nodes_set = pd.read_csv(node_path, names=["node"])
    return nodes_set["node"].tolist()


def read_edge_csv(file_path, node2idx, sep="\t"):
    """Read an edge list CSV (header skipped) into (src, dst, weight) arrays
    of *directed* rows as given in the file, self-loops removed."""
    df = pd.read_csv(file_path, sep=sep)
    src = df.iloc[:, 0].map(node2idx).to_numpy()
    dst = df.iloc[:, 1].map(node2idx).to_numpy()
    if df.shape[1] >= 3:
        w = df.iloc[:, 2].to_numpy(dtype=np.float64)
    else:
        w = np.ones(len(df), dtype=np.float64)
    keep = src != dst
    return src[keep].astype(np.int64), dst[keep].astype(np.int64), w[keep]


def build_adj_from_edges(src, dst, weight, node_num):
    """Symmetric COO adjacency; duplicate (u,v) entries take the *last*
    weight seen (reference's lil assignment semantics, utils.py:55-56)."""
    # emulate "last write wins" by reversing order and keeping first
    both_src = np.concatenate([src, dst])
    both_dst = np.concatenate([dst, src])
    both_w = np.concatenate([weight, weight])
    key = both_src * np.int64(node_num) + both_dst
    # np.unique keeps the first occurrence among sorted; to get last-write
    # semantics reverse the array first
    _, idx = np.unique(key[::-1], return_index=True)
    sel = len(key) - 1 - idx
    A = sp.coo_matrix(
        (both_w[sel], (both_src[sel], both_dst[sel])),
        shape=(node_num, node_num),
    )
    return A


def get_sp_adj_mat(file_path, full_node_list, sep="\t"):
    """Edge CSV → symmetric scipy COO over the full node list
    (parity with reference utils.py:35-58)."""
    node_num = len(full_node_list)
    node2idx = dict(zip(full_node_list, range(node_num)))
    src, dst, w = read_edge_csv(file_path, node2idx, sep=sep)
    return build_adj_from_edges(src, dst, w, node_num)


def sorted_dir(path):
    return sorted(os.listdir(path))
