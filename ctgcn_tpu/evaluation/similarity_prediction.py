# coding: utf-8
"""Structural similarity prediction evaluation (reference
evaluation/similarity_prediction.py).

Data generation: Katz-style vertex similarity ("Vertex similarity in
networks", physics/0510143) via the iteration ``S <- (alpha/lambda1) A S + I``
for ``iter_num`` steps, symmetrized, -I, min-max normalized, thresholded at
1e-6 and saved sparse per snapshot.

Prediction: Spearman correlation between the normalized similarity matrix
and Z Z^T restricted to non-isolated nodes → ``<method>_mse_record.csv``.

Note: the reference leaves this task partially wired — the predictor call is
commented out (similarity_prediction.py:247) and it loads a ``.csv`` where
the generator writes ``.npz``; here both ends use the ``.npz`` artifact and
the driver actually runs the predictor.
"""
from __future__ import annotations

import multiprocessing
import os
import time

import numpy as np
import pandas as pd
import scipy.sparse as sp

from ctgcn_tpu.data.formats import get_sp_adj_mat
from ctgcn_tpu.utils import check_and_make_path


class DataGenerator:
    def __init__(self, base_path, input_folder, output_folder, node_file,
                 file_sep="\t", alpha=0.5, iter_num=100):
        self.base_path = base_path
        self.input_base_path = os.path.abspath(
            os.path.join(base_path, input_folder))
        self.output_base_path = os.path.abspath(
            os.path.join(base_path, output_folder))
        self.file_sep = file_sep
        nodes_set = pd.read_csv(
            os.path.abspath(os.path.join(base_path, node_file)),
            names=["node"])
        self.full_node_list = nodes_set["node"].tolist()
        self.node_num = len(self.full_node_list)
        self.alpha = alpha
        self.iter_num = iter_num
        assert 0 < self.alpha < 1
        check_and_make_path(self.input_base_path)
        check_and_make_path(self.output_base_path)

    def generate_node_similarity(self, file):
        from scipy.sparse.linalg import eigsh

        date = file.split(".")[0]
        out_path = os.path.join(self.output_base_path,
                                date + "_similarity.npz")
        A = get_sp_adj_mat(
            os.path.join(self.input_base_path, file), self.full_node_list,
            sep=self.file_sep).tocsr()
        lambda_1 = eigsh(A.astype(np.float64), k=1, which="LM",
                         return_eigenvectors=False)[0]
        n = A.shape[0]
        I = np.eye(n)
        dsd = np.zeros((n, n))
        coef = self.alpha / lambda_1
        for _ in range(self.iter_num):
            dsd = coef * (A @ dsd) + I
        S = (dsd + dsd.T) / 2 - I
        S = (S - S.min()) / (S.max() - S.min())
        S[S < 1e-6] = 0
        sp.save_npz(out_path, sp.coo_matrix(S))

    def generate_node_similarity_all_time(self, worker=-1):
        f_list = sorted(os.listdir(self.input_base_path))
        if worker <= 0:
            for f in f_list:
                self.generate_node_similarity(f)
        else:
            worker = min(worker, len(f_list), os.cpu_count())
            with multiprocessing.Pool(processes=worker) as pool:
                res = [pool.apply_async(self.generate_node_similarity, (f,))
                       for f in f_list]
                for r in res:
                    r.get()


class SimilarityPredictor:
    def __init__(self, base_path, origin_folder, embedding_folder,
                 similarity_folder, output_folder, node_file, file_sep="\t"):
        self.base_path = base_path
        self.origin_base_path = os.path.abspath(
            os.path.join(base_path, origin_folder))
        self.embedding_base_path = os.path.abspath(
            os.path.join(base_path, embedding_folder))
        self.similarity_base_path = os.path.abspath(
            os.path.join(base_path, similarity_folder))
        self.output_base_path = os.path.abspath(
            os.path.join(base_path, output_folder))
        self.file_sep = file_sep
        nodes_set = pd.read_csv(
            os.path.abspath(os.path.join(base_path, node_file)),
            names=["node"])
        self.full_node_list = nodes_set["node"].tolist()
        check_and_make_path(self.embedding_base_path)
        check_and_make_path(self.origin_base_path)
        check_and_make_path(self.output_base_path)

    @staticmethod
    def get_prediction_error(node_sim_mat, embedding_mat, date):
        pred_sim_mat = embedding_mat @ embedding_mat.T
        keep = np.asarray(node_sim_mat.sum(axis=1)).flatten() >= 1e-6
        idx = np.nonzero(keep)[0]

        real = node_sim_mat[np.ix_(idx, idx)]
        real = (real - real.min()) / (real.max() - real.min())
        real = real / real.sum()
        pred = pred_sim_mat[np.ix_(idx, idx)]
        pred = (pred - pred.min()) / (pred.max() - pred.min())
        pred = pred / pred.sum()

        corr = pd.Series(real.flatten()).corr(pd.Series(pred.flatten()),
                                              method="spearman")
        return [date, corr]

    def similarity_prediction_all_time(self, method):
        print("method =", method)
        f_list = sorted(os.listdir(self.origin_base_path))
        all_mse_list = []
        for f_name in f_list:
            date = f_name.split(".")[0]
            sim_path = os.path.join(self.similarity_base_path,
                                    date + "_similarity.npz")
            cur_embedding_path = os.path.join(self.embedding_base_path,
                                              method, f_name)
            if not (os.path.exists(sim_path)
                    and os.path.exists(cur_embedding_path)):
                continue
            node_sim_mat = sp.load_npz(sim_path).toarray()
            df_embedding = pd.read_csv(cur_embedding_path, sep=self.file_sep,
                                       index_col=0)
            embedding_mat = df_embedding.loc[self.full_node_list].values
            all_mse_list.append(
                self.get_prediction_error(node_sim_mat, embedding_mat, date))
        df_output = pd.DataFrame(all_mse_list, columns=["date", "mse"])
        print(df_output)
        df_output.to_csv(
            os.path.join(self.output_base_path, method + "_mse_record.csv"),
            sep=",", index=False)

    def similarity_prediction_all_method(self, method_list=None, worker=-1):
        print("Start node similarity prediction!")
        if method_list is None:
            method_list = os.listdir(self.embedding_base_path)
        if worker <= 0:
            for method in method_list:
                self.similarity_prediction_all_time(method)
        else:
            worker = min(worker, os.cpu_count())
            with multiprocessing.Pool(processes=worker) as pool:
                res = [pool.apply_async(
                    self.similarity_prediction_all_time, (m,))
                    for m in method_list]
                for r in res:
                    r.get()
        print("Finish node similarity prediction!")


def similarity_prediction(args):
    base_path = args["base_path"]
    origin_folder = args["origin_folder"]
    embedding_folder = args["embed_folder"]
    node_file = args["node_file"]
    similarity_data_folder = args["similarity_data_folder"]
    similarity_res_folder = args["similarity_res_folder"]
    file_sep = args.get("file_sep", "\t")
    generate = args.get("generate", True)
    method_list = args.get("method_list", None)
    alpha = args.get("alpha", 0.5)
    iter_num = args.get("iter_num", 100)
    worker = args.get("worker", -1)

    data_generator = DataGenerator(
        base_path=base_path, input_folder=origin_folder,
        output_folder=similarity_data_folder, node_file=node_file,
        file_sep=file_sep, alpha=alpha, iter_num=iter_num)
    if generate:
        data_generator.generate_node_similarity_all_time(worker=worker)
    predictor = SimilarityPredictor(
        base_path=base_path, origin_folder=origin_folder,
        embedding_folder=embedding_folder,
        similarity_folder=similarity_data_folder,
        output_folder=similarity_res_folder, node_file=node_file,
        file_sep=file_sep)
    t1 = time.time()
    predictor.similarity_prediction_all_method(method_list=method_list,
                                               worker=worker)
    print("node similarity prediction cost time:", time.time() - t1,
          "seconds!")
