# coding: utf-8
"""TIMERS — error-bounded incremental SVD on dynamic networks.

Covers reference baseline/timers.py (python port of the TIMERS AAAI'18
matlab code): initial truncated SVD of the first snapshot, TRIP eigen-update
per delta, loss ``||S - U V^T||_F^2`` tracked against a matrix-perturbation
lower bound, full SVD restart when ``loss >= (1+theta) * bound``; embedding
export per snapshot is ``[U sqrt(S) ‖ V sqrt(S)]`` with K = embed_dim / 2.

This is an offline linear-algebra pipeline (ARPACK svds/eigs) and stays
host-side by design; the loss computation is vectorized instead of the
reference's chunked python loops (timers.py:51-111).
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import scipy.sparse as sp
from scipy.sparse.linalg import eigs, svds

from ctgcn_tpu.data.formats import get_sp_adj_mat, read_node_list
from ctgcn_tpu.utils import check_and_make_path


def frobenius_obj(Sim, U, V):
    """||S - U V^T||_F^2 without densifying (reference timers.py:51-79)."""
    row, col, val = sp.find(Sim)
    L = float(np.sum(val * val))
    inner = np.sum(U[row] * V[col], axis=1)
    L -= 2.0 * float(np.sum(val * inner))
    L += float(np.sum((U.T @ U) * (V.T @ V)))
    return L


def refine_bound(S_ori, S_add, loss_ori, K):
    """Perturbation lower bound (reference timers.py:216-264)."""
    S_temp = S_add + S_ori
    trace_change = (S_temp.dot(S_temp)).diagonal().sum() \
        - (S_ori.dot(S_ori)).diagonal().sum()

    M = S_ori.dot(S_add)
    M = M + M.transpose() + S_add.dot(S_add)
    eigen_num = min(int(np.around(2 * K)), M.shape[0] - 2)
    try:
        vals, _ = eigs(M.astype(np.float64), eigen_num)
        vals = np.sort(vals.real[vals.real >= 0])[::-1]
    except Exception:
        vals = np.array([])
    if len(vals) >= K:
        eigen_sum = vals[:K].sum()
    elif len(vals) > 0:
        eigen_sum = vals.sum() + vals[-1] * (K - len(vals))
    else:
        eigen_sum = 0.0
    return loss_ori + trace_change - eigen_sum


def trip(Old_U, Old_S, Old_V, Delta):
    """TRIP eigen-pair update (reference timers.py:267-314; Chen & Tong,
    'Fast eigen-functions tracking on dynamic graphs', SDM'15)."""
    N, K = Old_U.shape
    # unify signs so the largest-|x| entry of each eigenvector is positive
    X = Old_U.copy()
    for i in range(K):
        j = np.argmax(np.abs(X[:, i]))
        if X[j, i] < 0:
            X[:, i] = -X[:, i]
    # eigenvalue signs from U/V agreement at the max-|U| row
    max_idx = np.argmax(Old_U, axis=0)
    temp_v = Old_U[max_idx, np.arange(K)]
    temp_sign = np.sign(temp_v * Old_V[max_idx, np.arange(K)])
    Old_L = np.diag(Old_S) * temp_sign

    temp_sum = np.asarray(X.T @ (Delta @ X))  # [K, K]
    Delta_L = np.diag(temp_sum).copy()

    Delta_X = np.zeros((N, K))
    for i in range(K):
        D = np.diag(np.full(K, Old_L[i] + Delta_L[i]) - Old_L)
        alpha = np.linalg.pinv(D - temp_sum) @ temp_sum[:, i]
        Delta_X[:, i] = X @ alpha

    New_U = X + Delta_X
    norms = np.sqrt(np.sum(New_U * New_U, axis=0))
    norms[norms == 0] = 1.0
    New_U = New_U / norms
    New_S = np.diag(np.abs(Old_L + Delta_L))
    New_V = New_U @ np.diag(np.sign(Old_L + Delta_L))
    return New_U, New_S, New_V


def timers(nodes_file, input_base_path, output_base_path, Theta=0.17,
           dim=128, sep="\t", Update=True):
    """Returns the per-snapshot wall times (seconds)."""
    import time as _time

    check_and_make_path(output_base_path)
    time_list = []
    full_node_list = read_node_list(nodes_file)
    N = len(full_node_list)
    K = dim
    f_list = sorted(os.listdir(input_base_path))

    def export(U_cur, V_cur, f_name):
        out = np.hstack((U_cur, V_cur))
        pd.DataFrame(data=out, index=full_node_list,
                     columns=range(2 * dim)).to_csv(
            os.path.join(output_base_path, f_name), sep=sep)

    t0 = _time.time()
    A = get_sp_adj_mat(os.path.join(input_base_path, f_list[0]),
                       full_node_list, sep=sep).tocsr()
    u, s, vt = svds(A.astype(np.float64), K)
    U, S, V = u, np.diag(s), vt.T
    U_cur = U @ np.sqrt(S)
    V_cur = V @ np.sqrt(S)
    loss = frobenius_obj(A, U_cur, V_cur)
    loss_rerun = loss
    export(U_cur, V_cur, f_list[0])
    time_list.append(_time.time() - t0)
    print(f"time = 1, loss = {loss}, loss_bound = {loss}")

    Sim = A.copy()          # similarity at last rerun
    S_cum = A.copy()        # cumulated similarity
    S_perturb = sp.csr_matrix((N, N))

    for i in range(1, len(f_list)):
        t0 = _time.time()
        A_cur = get_sp_adj_mat(os.path.join(input_base_path, f_list[i]),
                               full_node_list, sep=sep).tocsr()
        S_add = (A_cur - S_cum).tocsr()
        S_perturb = S_perturb + S_add

        if Update:
            U, S, V = trip(U, S, V, S_add)
            U_cur = U @ np.sqrt(S)
            V_cur = V @ np.sqrt(S)
            loss = frobenius_obj(S_cum + S_add, U_cur, V_cur)
        bound = refine_bound(Sim, S_perturb, loss_rerun, K)
        S_cum = S_cum + S_add
        print(f"time = {i + 1}, loss = {loss}, loss_bound = {bound}")
        if loss >= (1 + Theta) * bound:
            print(f"Begin rerun at time stamp: {i + 1}")
            Sim = S_cum.copy()
            S_perturb = sp.csr_matrix((N, N))
            u, s, vt = svds(Sim.astype(np.float64), K)
            U, S, V = u, np.diag(s), vt.T
            U_cur = U @ np.sqrt(S)
            V_cur = V @ np.sqrt(S)
            loss_rerun = frobenius_obj(Sim, U_cur, V_cur)
            loss = loss_rerun
        export(U_cur, V_cur, f_list[i])
        time_list.append(_time.time() - t0)
    return time_list


def timers_embedding(args):
    base_path = args["base_path"]
    origin_folder = args["origin_folder"]
    embedding_folder = args["embed_folder"]
    node_file = args["node_file"]
    file_sep = args.get("file_sep", "\t")
    embed_dim = args["embed_dim"]
    theta = args["theta"]

    time_list = timers(
        os.path.abspath(os.path.join(base_path, node_file)),
        os.path.abspath(os.path.join(base_path, origin_folder)),
        os.path.abspath(os.path.join(base_path, embedding_folder)),
        Theta=theta, dim=embed_dim // 2, sep=file_sep, Update=True)
    if args.get("record_time", False):
        pd.DataFrame({"time": time_list}).to_csv(
            os.path.join(base_path, "TIMERS_time.csv"), sep=",", index=False)
