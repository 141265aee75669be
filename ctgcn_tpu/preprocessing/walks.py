# coding: utf-8
"""Random-walk structure generation, vectorized.

The reference walks one node at a time with ``np.random.choice`` per hop
(reference preprocessing/random_walk.py:21-49).  Here all
``node_num * walk_time`` walks advance in lockstep: one vectorized
inverse-CDF sample per hop over a padded per-node transition table, then a
single vectorized intra-walk pair expansion.

Artifact contract preserved (reference random_walk.py:53-67):
  * ``<walk_pair_folder>/<date>.npz`` — binary symmetric co-occurrence matrix
    over all intra-walk pairs of distinct nodes;
  * ``<node_freq_folder>/<date>.json`` — negative-sampling list with node i
    repeated ``int((freq_i/total)**0.75 / 1e-5)`` times, where each pair
    occurrence bumps both endpoints.
"""
from __future__ import annotations

import json
import multiprocessing
import os

import numpy as np
import scipy.sparse as sp

from ctgcn_tpu.data.formats import get_sp_adj_mat, read_node_list, sorted_dir
from ctgcn_tpu.utils import check_and_make_path


def simulate_walks(adj, walk_length, walk_time, weighted=True, rng=None):
    """Run ``walk_time`` walks of ``walk_length + 1`` nodes from every node.

    Dead ends: a walk from an isolated node stays in place; since
    self-pairs are discarded downstream this reproduces the reference's
    early ``break`` (random_walk.py:28-29).

    Returns int32[n_walks, walk_length + 1] node ids.
    """
    if rng is None:
        # production path: C++ kernel (native/hostgraph.cpp) — per-walk
        # splitmix64 streams + binary-search inverse-CDF straight off CSR,
        # no padded [N, max_deg] tables.  An explicit ``rng`` pins the
        # numpy sampler (deterministic tests / exact stream control).
        from ctgcn_tpu import native

        if native.available():
            return native.simulate_walks(adj.tocsr(), walk_length, walk_time,
                                         weighted=weighted)
    rng = rng if rng is not None else np.random
    A = adj.tocsr()
    n = A.shape[0]
    deg = np.diff(A.indptr)
    max_deg = int(deg.max()) if n else 0

    # padded neighbor table + per-row transition CDF
    nbr = np.zeros((n, max(max_deg, 1)), dtype=np.int32)
    cdf = np.ones((n, max(max_deg, 1)), dtype=np.float64)
    for i in range(n):
        s, e = A.indptr[i], A.indptr[i + 1]
        if e > s:
            nbr[i, : e - s] = A.indices[s:e]
            if weighted:
                w = A.data[s:e].astype(np.float64)
            else:
                w = np.ones(e - s)
            c = np.cumsum(w)
            cdf[i, : e - s] = c / c[-1]
            cdf[i, e - s:] = 1.0

    starts = np.repeat(np.arange(n, dtype=np.int32), walk_time)
    walks = np.empty((starts.shape[0], walk_length + 1), dtype=np.int32)
    walks[:, 0] = starts
    cur = starts
    isolated = deg == 0
    for step in range(1, walk_length + 1):
        u = rng.random(cur.shape[0])
        # inverse-CDF: first slot where cdf >= u
        slot = (cdf[cur] < u[:, None]).sum(axis=1)
        slot = np.minimum(slot, np.maximum(deg[cur] - 1, 0))
        nxt = nbr[cur, slot]
        nxt = np.where(isolated[cur], cur, nxt)  # dead ends stay put
        walks[:, step] = nxt
        cur = nxt
    return walks


def walk_pairs_and_freq(walks, node_num):
    """All intra-walk (i<j) pairs of distinct nodes → (binary symmetric
    co-occurrence COO, per-node frequency array)."""
    L = walks.shape[1]
    iu, ju = np.triu_indices(L, k=1)
    a = walks[:, iu].reshape(-1).astype(np.int64)
    b = walks[:, ju].reshape(-1).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]

    freq = (np.bincount(a, minlength=node_num)
            + np.bincount(b, minlength=node_num))

    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    key = np.unique(lo * np.int64(node_num) + hi)
    ulo = (key // node_num).astype(np.int32)
    uhi = (key % node_num).astype(np.int32)
    rows = np.concatenate([ulo, uhi])
    cols = np.concatenate([uhi, ulo])
    pair_mat = sp.coo_matrix(
        (np.ones(rows.shape[0], np.float64), (rows, cols)),
        shape=(node_num, node_num))
    return pair_mat, freq


def negative_sampling_list(freq, Z=1e-5):
    """Replicated unigram^0.75 list (reference random_walk.py:53-58)."""
    tot = freq.sum()
    if tot == 0:
        return []
    rep = ((freq / tot) ** 0.75 / Z).astype(np.int64)
    out = []
    for nidx, r in enumerate(rep):
        if r > 0:
            out.extend([int(nidx)] * int(r))
    return out


def random_walk(spadj, walk_dir_path, freq_dir_path, f_name, walk_length,
                walk_time, weighted, rng=None):
    """Single-snapshot walk job writing both artifacts."""
    node_num = spadj.shape[0]
    walks = simulate_walks(spadj, walk_length, walk_time, weighted=weighted,
                           rng=rng)
    pair_mat, freq = walk_pairs_and_freq(walks, node_num)

    base = f_name.split(".")[0]
    with open(os.path.join(freq_dir_path, base + ".json"), "w") as fp:
        json.dump(negative_sampling_list(freq), fp)
    sp.save_npz(os.path.join(walk_dir_path, base + ".npz"), pair_mat.tocoo())


class WalkGenerator:
    """Per-snapshot walk generation (reference walk_generation.py:11-61)."""

    def __init__(self, base_path, origin_folder, walk_pair_folder,
                 node_freq_folder, node_file, walk_time=100, walk_length=5,
                 weighted=True):
        self.base_path = base_path
        self.origin_base_path = os.path.abspath(
            os.path.join(base_path, origin_folder))
        self.walk_pair_base_path = os.path.abspath(
            os.path.join(base_path, walk_pair_folder))
        self.node_freq_base_path = os.path.abspath(
            os.path.join(base_path, node_freq_folder))
        self.walk_time = walk_time
        self.walk_length = walk_length
        self.weighted = weighted
        node_path = os.path.abspath(os.path.join(base_path, node_file))
        self.full_node_list = read_node_list(node_path)
        check_and_make_path(self.walk_pair_base_path)
        check_and_make_path(self.node_freq_base_path)

    def get_walk_info(self, f_name, sep="\t"):
        spadj = get_sp_adj_mat(
            os.path.join(self.origin_base_path, f_name),
            self.full_node_list, sep=sep)
        random_walk(spadj, self.walk_pair_base_path, self.node_freq_base_path,
                    f_name, self.walk_length, self.walk_time, self.weighted)

    def get_walk_info_all_time(self, sep="\t", worker=-1):
        f_list = sorted_dir(self.origin_base_path)
        if worker <= 0:
            for f_name in f_list:
                self.get_walk_info(f_name, sep=sep)
        else:
            worker = min(worker, len(f_list), os.cpu_count())
            with multiprocessing.Pool(processes=worker) as pool:
                results = [
                    pool.apply_async(self.get_walk_info, (f_name, sep))
                    for f_name in f_list
                ]
                for r in results:
                    r.get()
