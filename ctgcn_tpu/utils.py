# coding: utf-8
"""Shared utilities: method registries, path helpers, numeric helpers.

Mirrors the *capability surface* of the reference registries
(reference utils.py:159-182) and small helpers (utils.py:10-156); host-side
graph IO lives in ctgcn_tpu.data.formats instead.
"""
import os

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def check_and_make_path(to_make):
    """Create a directory (and parents) if it does not exist."""
    if to_make == "" or to_make is None:
        return
    os.makedirs(to_make, exist_ok=True)


def get_format_str(cnt):
    """Zero-padded format string sized to ``cnt`` (file ordering is load-bearing).

    Parity with reference utils.py:142-148.
    """
    max_bit = 0
    while cnt > 0:
        cnt //= 10
        max_bit += 1
    return "{:0>" + str(max_bit) + "d}"


def separate(info="", sep="=", num=8):
    if len(info) == 0:
        print(sep * (2 * num))
    else:
        print(sep * num, info, sep * num)


# ---------------------------------------------------------------------------
# Method registries (parity with reference utils.py:159-182).  The Tg*
# variants in the reference are thin torch-geometric re-implementations of the
# same convolutions; here each collapses onto the single TPU-native
# implementation but the method names stay routable for config portability.
# ---------------------------------------------------------------------------

STATIC_GNN_METHODS = (
    "GCN", "TgGCN", "GAT", "TgGAT", "SAGE", "TgSAGE", "GIN", "TgGIN",
    "PGNN", "CGCN-C", "CGCN-S",
)
DYNAMIC_GNN_METHODS = ("GCRN", "EvolveGCN", "VGRNN", "CTGCN-C", "CTGCN-S")
CORE_BASED_METHODS = ("CGCN-C", "CGCN-S", "CTGCN-C", "CTGCN-S")
NON_GNN_METHODS = ("DynGEM", "DynAE", "DynRNN", "DynAERNN", "TIMERS")


def get_static_gnn_methods():
    return dict.fromkeys(STATIC_GNN_METHODS, 1)


def get_dynamic_gnn_methods():
    return dict.fromkeys(DYNAMIC_GNN_METHODS, 1)


def get_core_based_methods():
    return dict.fromkeys(CORE_BASED_METHODS, 1)


def get_supported_gnn_methods():
    return dict.fromkeys(STATIC_GNN_METHODS + DYNAMIC_GNN_METHODS, 1)


def get_supported_methods():
    return dict.fromkeys(
        NON_GNN_METHODS + STATIC_GNN_METHODS + DYNAMIC_GNN_METHODS, 1
    )


# ---------------------------------------------------------------------------
# Shape helpers for static-shape padding
# ---------------------------------------------------------------------------

def round_up(x, multiple):
    """Round ``x`` up to the nearest multiple of ``multiple``."""
    if multiple <= 0:
        return int(x)
    return int(-(-int(x) // multiple) * multiple)


def pad_bucket(n, minimum=256):
    """Bucketed padding size: next power of two ≥ max(n, minimum).

    Bucketing limits the number of distinct compiled shapes when snapshots of
    different nnz flow through the same jitted function.
    """
    n = max(int(n), int(minimum))
    return 1 << (n - 1).bit_length()


def get_neg_edge_samples(pos_edges, edge_num, all_edge_dict, node_num,
                         add_label=True, rng=None):
    """Rejection-sample ``edge_num`` non-edges and stack under ``pos_edges``.

    Parity with reference utils.py:109-129 (used by the S-link trainer and by
    the link-prediction data generator).
    """
    rng = rng if rng is not None else np.random
    neg_edge_dict = {}
    neg_edge_list = []
    cnt = 0
    while cnt < edge_num:
        from_id = int(rng.choice(node_num))
        to_id = int(rng.choice(node_num))
        if from_id == to_id:
            continue
        if (from_id, to_id) in all_edge_dict or (to_id, from_id) in all_edge_dict:
            continue
        if (from_id, to_id) in neg_edge_dict or (to_id, from_id) in neg_edge_dict:
            continue
        neg_edge_dict[(from_id, to_id)] = 1
        if add_label:
            neg_edge_list.append([from_id, to_id, 0])
        else:
            neg_edge_list.append([from_id, to_id])
        cnt += 1
    neg_edges = np.array(neg_edge_list)
    return np.vstack([pos_edges, neg_edges])
