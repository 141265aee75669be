# coding: utf-8
"""K-core decomposition as a vectorized array program.

The reference shells out to networkx per snapshot and per k
(``nx.core_number`` + ``nx.k_core``, reference
preprocessing/structure_generation.py:32-56).  Here core numbers come from
vectorized bucket peeling on the CSR structure, and each k-core subgraph is
the induced weighted submatrix on ``{v : core(v) >= k}`` (a standard identity
— the k-core is the induced subgraph on vertices of core number ≥ k), so one
peeling pass serves every k.

Artifact contract preserved: ``<core_folder>/<date>/<k>.npz`` scipy matrices
over the full node list, file names zero-padded to the max core width.
"""
from __future__ import annotations

import multiprocessing
import os

import numpy as np
import scipy.sparse as sp

from ctgcn_tpu.data.formats import get_sp_adj_mat, read_node_list, sorted_dir
from ctgcn_tpu.utils import check_and_make_path, get_format_str


def core_numbers(adj) -> np.ndarray:
    """Vectorized k-core peeling.

    Args:
      adj: scipy sparse [N, N] symmetric adjacency (weights ignored —
        peeling uses connectivity degree, like nx.core_number).
    Returns int array of core numbers per node (isolated nodes → 0).
    """
    A = adj.tocsr().astype(bool).astype(np.int64)
    n = A.shape[0]
    deg = np.asarray(A.sum(axis=1)).flatten().astype(np.int64)
    core = np.zeros(n, dtype=np.int64)
    alive = deg > 0
    k = 1
    while alive.any():
        # peel everything of degree < k within the alive subgraph
        while True:
            cur_deg = np.asarray(
                A[:, alive].sum(axis=1)).flatten()
            peel = alive & (cur_deg < k)
            if not peel.any():
                break
            alive &= ~peel
        if not alive.any():
            break
        core[alive] = k
        k += 1
    return core


def kcore_subgraph(adj, core, k):
    """Weighted induced subgraph on nodes with core number >= k, over the
    full node index space (zero rows for excluded nodes)."""
    mask = (core >= k).astype(adj.dtype if adj.dtype.kind == "f" else np.float64)
    d = sp.diags(mask)
    return (d @ adj.tocsr() @ d).tocoo()


class StructureInfoGenerator:
    """Per-snapshot k-core pyramid generation (reference
    structure_generation.py:11-81)."""

    def __init__(self, base_path, origin_folder, core_folder, node_file):
        self.base_path = base_path
        self.origin_base_path = os.path.abspath(
            os.path.join(base_path, origin_folder))
        self.core_base_path = os.path.abspath(
            os.path.join(base_path, core_folder))
        node_path = os.path.abspath(os.path.join(base_path, node_file))
        self.full_node_list = read_node_list(node_path)
        self.node_num = len(self.full_node_list)
        check_and_make_path(self.core_base_path)

    def get_kcore_graph(self, input_file, output_dir, sep="\t"):
        input_path = os.path.join(self.origin_base_path, input_file)
        adj = get_sp_adj_mat(input_path, self.full_node_list, sep=sep)
        core = core_numbers(adj)
        max_core = int(core.max()) if core.size else 0
        check_and_make_path(output_dir)
        fmt = get_format_str(max_core)
        for k in range(1, max_core + 1):
            A_k = kcore_subgraph(adj, core, k)
            sp.save_npz(os.path.join(output_dir, fmt.format(k) + ".npz"),
                        A_k.tocsr())

    def get_kcore_graph_all_time(self, sep="\t", worker=-1):
        f_list = sorted_dir(self.origin_base_path)
        if worker <= 0:
            for f_name in f_list:
                self.get_kcore_graph(
                    f_name,
                    os.path.join(self.core_base_path, f_name.split(".")[0]),
                    sep=sep)
        else:
            worker = min(worker, len(f_list), os.cpu_count())
            with multiprocessing.Pool(processes=worker) as pool:
                results = [
                    pool.apply_async(
                        self.get_kcore_graph,
                        (f_name,
                         os.path.join(self.core_base_path,
                                      f_name.split(".")[0]), sep))
                    for f_name in f_list
                ]
                for r in results:
                    r.get()  # surface worker failures (reference swallows them)
