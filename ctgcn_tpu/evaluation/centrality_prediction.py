# coding: utf-8
"""Centrality prediction evaluation (reference
evaluation/centrality_prediction.py): per snapshot compute
closeness/betweenness/eigenvector/k-core centralities →
``<date>_centrality.csv`` (existing files skipped), then per method sweep
Ridge alphas with ``cross_val_predict``, metric = MSE normalized by the
centrality mean → ``<method>_mse_record.csv``.

The k-core column uses the framework's own vectorized peeling
(ctgcn_tpu.preprocessing.kcore.core_numbers — exact networkx parity);
the other centralities stay on networkx (host-side one-off data prep).
"""
from __future__ import annotations

import multiprocessing
import os
import time

import numpy as np
import pandas as pd

from ctgcn_tpu.data.formats import get_sp_adj_mat
from ctgcn_tpu.utils import check_and_make_path

CENTRALITY_LIST = ["closeness", "betweenness", "eigenvector", "kcore"]


class DataGenerator:
    def __init__(self, base_path, input_folder, output_folder, node_file,
                 file_sep="\t"):
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
        check_and_make_path(self.input_base_path)
        check_and_make_path(self.output_base_path)

    def generate_node_samples(self, file, sep="\t"):
        import networkx as nx

        from ctgcn_tpu.preprocessing.kcore import core_numbers

        date = file.split(".")[0]
        out_path = os.path.join(self.output_base_path,
                                date + "_centrality.csv")
        if os.path.exists(out_path):
            print("\t", date + "_centrality.csv exists")
            return
        adj = get_sp_adj_mat(
            os.path.join(self.input_base_path, file), self.full_node_list,
            sep=sep)
        graph = nx.from_scipy_sparse_array(adj)
        closeness = nx.closeness_centrality(graph)
        betweenness = nx.betweenness_centrality(graph)
        eigenvector = nx.eigenvector_centrality(graph, max_iter=1000)
        kcore = core_numbers(adj)
        rows = []
        for nidx in range(self.node_num):
            rows.append([nidx, closeness[nidx], betweenness[nidx],
                         eigenvector[nidx], int(kcore[nidx])])
        pd.DataFrame(rows, columns=["node"] + CENTRALITY_LIST).to_csv(
            out_path, sep=self.file_sep, index=False)

    def generate_all_node_samples(self, sep="\t", worker=-1):
        f_list = sorted(os.listdir(self.input_base_path))
        if worker <= 0:
            for f in f_list:
                self.generate_node_samples(f, sep=sep)
        else:
            worker = min(worker, len(f_list), os.cpu_count())
            with multiprocessing.Pool(processes=worker) as pool:
                res = [pool.apply_async(self.generate_node_samples, (f, sep))
                       for f in f_list]
                for r in res:
                    r.get()


class CentralityPredictor:
    def __init__(self, base_path, origin_folder, embedding_folder,
                 centrality_folder, output_folder, node_file, file_sep="\t",
                 alpha_list=None, split_fold=5):
        self.base_path = base_path
        self.origin_base_path = os.path.abspath(
            os.path.join(base_path, origin_folder))
        self.embedding_base_path = os.path.abspath(
            os.path.join(base_path, embedding_folder))
        self.centrality_base_path = os.path.abspath(
            os.path.join(base_path, centrality_folder))
        self.output_base_path = os.path.abspath(
            os.path.join(base_path, output_folder))
        self.file_sep = file_sep
        nodes_set = pd.read_csv(
            os.path.abspath(os.path.join(base_path, node_file)),
            names=["node"])
        self.full_node_list = nodes_set["node"].tolist()
        self.alpha_list = alpha_list or [0.01, 0.1, 1, 10]
        self.split_fold = split_fold
        check_and_make_path(self.embedding_base_path)
        check_and_make_path(self.origin_base_path)
        check_and_make_path(self.output_base_path)

    def get_prediction_error(self, centrality_data, embeddings, date):
        from sklearn.linear_model import Ridge
        from sklearn.metrics import mean_squared_error
        from sklearn.model_selection import cross_val_predict

        mse_list = [date]
        for i, _ in enumerate(CENTRALITY_LIST):
            min_error = float("inf")
            for alpha in self.alpha_list:
                model = Ridge(alpha=alpha)
                y_pred = cross_val_predict(model, embeddings,
                                           centrality_data[:, i],
                                           cv=self.split_fold)
                error = mean_squared_error(
                    centrality_data[:, i], y_pred) / np.mean(
                    centrality_data[:, i])
                min_error = min(min_error, error)
            mse_list.append(min_error)
        return mse_list

    def centrality_prediction_all_time(self, method):
        print("method =", method)
        f_list = sorted(os.listdir(self.origin_base_path))
        all_mse_list = []
        for f_name in f_list:
            date = f_name.split(".")[0]
            df_centrality = pd.read_csv(
                os.path.join(self.centrality_base_path,
                             date + "_centrality.csv"), sep=self.file_sep)
            centrality_data = df_centrality.iloc[:, 1:].values
            cur_embedding_path = os.path.join(self.embedding_base_path,
                                              method, f_name)
            if not os.path.exists(cur_embedding_path):
                continue
            df_embedding = pd.read_csv(cur_embedding_path, sep=self.file_sep,
                                       index_col=0)
            embeddings = df_embedding.loc[self.full_node_list].values
            all_mse_list.append(
                self.get_prediction_error(centrality_data, embeddings, date))
        df_output = pd.DataFrame(all_mse_list,
                                 columns=["date"] + CENTRALITY_LIST)
        print(df_output)
        for c in CENTRALITY_LIST:
            print(f"{c} avg:", df_output[c].mean())
        df_output.to_csv(
            os.path.join(self.output_base_path, method + "_mse_record.csv"),
            sep=",", index=False)

    def centrality_prediction_all_method(self, method_list=None, worker=-1):
        print("Start graph centrality prediction!")
        if method_list is None:
            method_list = os.listdir(self.embedding_base_path)
        if worker <= 0:
            for method in method_list:
                self.centrality_prediction_all_time(method)
        else:
            worker = min(worker, os.cpu_count())
            with multiprocessing.Pool(processes=worker) as pool:
                res = [pool.apply_async(
                    self.centrality_prediction_all_time, (m,))
                    for m in method_list]
                for r in res:
                    r.get()
        print("Finish graph centrality prediction!")


def centrality_prediction(args):
    base_path = args["base_path"]
    origin_folder = args["origin_folder"]
    embedding_folder = args["embed_folder"]
    node_file = args["node_file"]
    centrality_data_folder = args["centrality_data_folder"]
    centrality_res_folder = args["centrality_res_folder"]
    file_sep = args.get("file_sep", "\t")
    generate = args.get("generate", True)
    method_list = args.get("method_list", None)
    alpha_list = args.get("alpha_list", None)
    split_fold = args.get("split_fold", 5)
    worker = args.get("worker", -1)

    data_generator = DataGenerator(
        base_path=base_path, input_folder=origin_folder,
        output_folder=centrality_data_folder, node_file=node_file,
        file_sep=file_sep)
    if generate:
        data_generator.generate_all_node_samples(sep=file_sep, worker=worker)
    predictor = CentralityPredictor(
        base_path=base_path, origin_folder=origin_folder,
        embedding_folder=embedding_folder,
        centrality_folder=centrality_data_folder,
        output_folder=centrality_res_folder, node_file=node_file,
        file_sep=file_sep, alpha_list=alpha_list, split_fold=split_fold)
    t1 = time.time()
    predictor.centrality_prediction_all_method(method_list=method_list,
                                               worker=worker)
    print("centrality prediction cost time:", time.time() - t1, "seconds!")
