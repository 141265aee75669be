# coding: utf-8
"""Edge classification evaluation (reference
evaluation/edge_classification.py): mirrors node classification with
Hadamard edge features.  The reference's DataGenerator has a latent bug
(``self.node_num`` used before assignment, edge_classification.py:38-39 —
its README flags edge classification as untested); this implementation
initializes the fields in order.
"""
from __future__ import annotations

import multiprocessing
import os
import time

import numpy as np
import pandas as pd

from ctgcn_tpu.utils import check_and_make_path


class DataGenerator:
    def __init__(self, base_path, input_folder, output_folder, node_file,
                 label_folder, file_sep="\t", train_ratio=0.7, val_ratio=0.2,
                 test_ratio=0.1, seed=None):
        self.base_path = base_path
        self.input_base_path = os.path.abspath(
            os.path.join(base_path, input_folder))
        self.output_base_path = os.path.abspath(
            os.path.join(base_path, output_folder))
        self.label_base_path = os.path.abspath(
            os.path.join(base_path, label_folder))
        self.file_sep = file_sep
        nodes_set = pd.read_csv(
            os.path.abspath(os.path.join(base_path, node_file)),
            names=["node"])
        self.full_node_list = nodes_set["node"].tolist()
        self.node_num = len(self.full_node_list)
        self.node2idx_dict = dict(
            zip(self.full_node_list, range(self.node_num)))
        assert train_ratio + test_ratio + val_ratio <= 1.0
        self.train_ratio = train_ratio
        self.val_ratio = val_ratio
        self.test_ratio = test_ratio
        check_and_make_path(self.input_base_path)
        check_and_make_path(self.output_base_path)

        # per-rep seed (see link_prediction.DataGenerator): explicit
        # per-(rep, file) streams — the global np.random state is
        # fork-inherited by Pool workers, making unseeded reps collide
        self.seed = seed

    def _rng(self, file):
        if self.seed is None:
            return np.random
        import zlib

        return np.random.RandomState(
            zlib.crc32(f"{self.seed}:{file}".encode()) & 0x7FFFFFFF)

    def generate_edge_samples(self, file_name, sep="\t"):
        rng = self._rng(file_name)
        date = file_name.split(".")[0]
        df_edges = pd.read_csv(
            os.path.join(self.label_base_path, file_name), sep=sep, header=0,
            names=["from_id", "to_id", "label"])
        df_edges["from_id"] = df_edges["from_id"].map(self.node2idx_dict)
        df_edges["to_id"] = df_edges["to_id"].map(self.node2idx_dict)
        arr = df_edges.values
        n = arr.shape[0]
        order = rng.permutation(n)
        tr = int(np.floor(n * self.train_ratio))
        va = int(np.floor(n * self.val_ratio))
        te = int(np.floor(n * self.test_ratio))
        segs = {"train": order[:tr], "val": order[tr:tr + va],
                "test": order[tr + va:tr + va + te]}
        for name, idx in segs.items():
            pd.DataFrame(arr[idx],
                         columns=["from_id", "to_id", "label"]).to_csv(
                os.path.join(self.output_base_path, f"{date}_{name}.csv"),
                sep=self.file_sep, index=False)

    def generate_edge_samples_all_time(self, sep="\t", worker=-1):
        print("Start generating edge samples!")
        f_list = os.listdir(self.label_base_path)
        if worker <= 0:
            for f in f_list:
                self.generate_edge_samples(f, sep)
        else:
            worker = min(worker, os.cpu_count())
            with multiprocessing.Pool(processes=worker) as pool:
                res = [pool.apply_async(self.generate_edge_samples, (f, sep))
                       for f in f_list]
                for r in res:
                    r.get()
        print("Generate edge samples finish!")


class EdgeClassifier:
    def __init__(self, base_path, origin_folder, embedding_folder,
                 edgecls_folder, output_folder, node_file, label_folder,
                 file_sep="\t", C_list=None, max_iter=5000):
        self.base_path = base_path
        self.origin_base_path = os.path.abspath(
            os.path.join(base_path, origin_folder))
        self.embedding_base_path = os.path.abspath(
            os.path.join(base_path, embedding_folder))
        self.edgecls_base_path = os.path.abspath(
            os.path.join(base_path, edgecls_folder))
        self.output_base_path = os.path.abspath(
            os.path.join(base_path, output_folder))
        self.file_sep = file_sep
        nodes_set = pd.read_csv(
            os.path.abspath(os.path.join(base_path, node_file)),
            names=["node"])
        self.full_node_list = nodes_set["node"].tolist()
        label_base_path = os.path.abspath(
            os.path.join(base_path, label_folder))
        f_list = os.listdir(label_base_path)
        assert len(f_list) > 0
        df_label = pd.read_csv(os.path.join(label_base_path, f_list[0]),
                               sep=file_sep, header=0,
                               names=["from_id", "to_id", "label"])
        self.unique_labels = df_label["label"].unique()
        self.C_list = C_list or [0.01, 0.1, 1, 10]
        self.max_iter = max_iter
        check_and_make_path(self.embedding_base_path)
        check_and_make_path(self.origin_base_path)
        check_and_make_path(self.output_base_path)

    @staticmethod
    def _edge_features(edges, embeddings):
        return embeddings[edges[:, 0]] * embeddings[edges[:, 1]]  # Hadamard

    def train(self, train_edges, val_edges, embeddings, lb):
        from sklearn.linear_model import LogisticRegression
        from sklearn.metrics import accuracy_score
        from sklearn.multiclass import OneVsRestClassifier

        train_feature = self._edge_features(train_edges, embeddings)
        val_feature = self._edge_features(val_edges, embeddings)
        train_labels = lb.transform(train_edges[:, 2])
        val_labels = lb.transform(val_edges[:, 2])
        best_acc, best_model = -1.0, None
        for C in self.C_list:
            model = OneVsRestClassifier(LogisticRegression(
                C=C, solver="lbfgs", max_iter=self.max_iter,
                class_weight="balanced"))
            model.fit(train_feature, train_labels)
            val_pred = lb.transform(
                np.argmax(model.predict_proba(val_feature), 1))
            acc = accuracy_score(val_labels, val_pred)
            if acc >= best_acc:
                best_acc, best_model = acc, model
        return best_model

    def test(self, test_edges, embeddings, model, lb, date):
        from sklearn.metrics import accuracy_score

        test_feature = self._edge_features(test_edges, embeddings)
        test_labels = lb.transform(test_edges[:, 2])
        test_pred = lb.transform(
            np.argmax(model.predict_proba(test_feature), 1))
        return [date, accuracy_score(test_labels, test_pred)]

    def edge_classification_all_time(self, method):
        from sklearn import preprocessing

        print("method =", method)
        f_list = sorted(os.listdir(self.origin_base_path))
        all_acc_list = []
        for f_name in f_list:
            date = f_name.split(".")[0]
            read = lambda kind: pd.read_csv(
                os.path.join(self.edgecls_base_path, f"{date}_{kind}.csv"),
                sep=self.file_sep).values
            cur_embedding_path = os.path.join(self.embedding_base_path,
                                              method, f_name)
            if not os.path.exists(cur_embedding_path):
                continue
            df_embedding = pd.read_csv(cur_embedding_path, sep=self.file_sep,
                                       index_col=0)
            embeddings = df_embedding.loc[self.full_node_list].values
            lb = preprocessing.LabelBinarizer()
            lb.fit(self.unique_labels)
            model = self.train(read("train"), read("val"), embeddings, lb)
            all_acc_list.append(
                self.test(read("test"), embeddings, model, lb, date))
        df_output = pd.DataFrame(all_acc_list, columns=["date", "acc"])
        print(df_output)
        print(f"method = {method}, average accuracy: "
              f"{df_output['acc'].mean()}")
        df_output.to_csv(
            os.path.join(self.output_base_path, method + "_acc_record.csv"),
            sep=",", index=False)

    def edge_classification_all_method(self, method_list=None, worker=-1):
        print("Start edge classification!")
        if method_list is None:
            method_list = os.listdir(self.embedding_base_path)
        if worker <= 0:
            for method in method_list:
                self.edge_classification_all_time(method)
        else:
            worker = min(worker, os.cpu_count())
            with multiprocessing.Pool(processes=worker) as pool:
                res = [pool.apply_async(self.edge_classification_all_time,
                                        (m,)) for m in method_list]
                for r in res:
                    r.get()
        print("Finish edge classification!")


def aggregate_results(base_path, edgecls_res_folder, start_idx, rep_num,
                      method_list):
    """Merge repetition folders into per-method avg/max/min files
    (reference evaluation/edge_classification.py:235-297 — same shape as
    the node-classification aggregator)."""
    if rep_num <= 0:
        return
    for method in method_list:
        dfs = []
        for i in range(start_idx, start_idx + rep_num):
            res_path = os.path.join(base_path, f"{edgecls_res_folder}_{i}",
                                    method + "_acc_record.csv")
            df = pd.read_csv(res_path, sep=",", header=0,
                             names=["date", f"acc_{i}"])
            dfs.append(df if i == start_idx else df.iloc[:, [1]])
        df_method = pd.concat(dfs, axis=1)
        cols = [f"acc_{i}" for i in range(start_idx, start_idx + rep_num)]
        df_method["avg"] = df_method.loc[:, cols].mean(axis=1)
        df_method["max"] = df_method.loc[:, cols].max(axis=1)
        df_method["min"] = df_method.loc[:, cols].min(axis=1)
        output_base_path = os.path.join(base_path, edgecls_res_folder)
        check_and_make_path(output_base_path)
        df_method.to_csv(
            os.path.join(output_base_path, method + "_acc_record.csv"),
            sep=",", index=False)


def edge_classification(args):
    base_path = args["base_path"]
    origin_folder = args["origin_folder"]
    embedding_folder = args["embed_folder"]
    node_file = args["node_file"]
    elabel_folder = args["elabel_folder"]
    edgecls_data_folder = args["edgecls_data_folder"]
    edgecls_res_folder = args["edgecls_res_folder"]
    file_sep = args.get("file_sep", "\t")
    start_idx = args.get("start_idx", 0)
    rep_num = args.get("rep_num", 1)
    train_ratio = args["train_ratio"]
    val_ratio = args["val_ratio"]
    test_ratio = args["test_ratio"]
    do_edgecls = args.get("do_edgecls", True)
    generate = args.get("generate", True)
    aggregate = args.get("aggregate", False)
    method_list = args.get("method_list", None)
    C_list = args.get("c_list", None)
    max_iter = args.get("max_iter", 5000)
    worker = args.get("worker", -1)

    t1 = time.time()
    if do_edgecls:
        for i in range(start_idx, start_idx + rep_num):
            data_generator = DataGenerator(
                base_path=base_path, input_folder=origin_folder,
                output_folder=f"{edgecls_data_folder}_{i}",
                node_file=node_file, label_folder=elabel_folder,
                file_sep=file_sep, train_ratio=train_ratio,
                val_ratio=val_ratio, test_ratio=test_ratio, seed=i)
            if generate:
                data_generator.generate_edge_samples_all_time(sep=file_sep,
                                                              worker=worker)
            edge_classifier = EdgeClassifier(
                base_path=base_path, origin_folder=origin_folder,
                embedding_folder=embedding_folder,
                edgecls_folder=f"{edgecls_data_folder}_{i}",
                output_folder=f"{edgecls_res_folder}_{i}",
                node_file=node_file, label_folder=elabel_folder,
                file_sep=file_sep, C_list=C_list, max_iter=max_iter)
            edge_classifier.edge_classification_all_method(
                method_list=method_list, worker=worker)
    print("edge classification cost time:", time.time() - t1, "seconds!")
    if aggregate:
        aggregate_results(base_path, edgecls_res_folder, start_idx, rep_num,
                          method_list)
