# coding: utf-8
"""Link prediction evaluation (reference evaluation/link_prediction.py).

Contract preserved:
  * edge-sample CSVs ``<date>_{train,val,test}.csv`` with equal negative
    samples (split order: val first, then test, train ratio applied to the
    remainder — reference link_prediction.py:67-74);
  * for snapshot t ≥ 1 the evaluator scores edges of t using the embedding
    exported for t-1 (link_prediction.py:222-228);
  * LogisticRegression sweep over C on val AUC per measure
    (Avg/Had/L1/L2/sigmoid), test AUC per measure →
    ``<method>_auc_record.csv``; summary = mean Had AUC of last 4 dates.

Edge features are vectorized numpy (the reference builds them row-by-row in
a Python loop, link_prediction.py:144-164).
"""
from __future__ import annotations

import multiprocessing
import os
import time

import numpy as np
import pandas as pd

from ctgcn_tpu.utils import check_and_make_path, get_neg_edge_samples, sigmoid


class DataGenerator:
    def __init__(self, base_path, input_folder, output_folder, node_file,
                 file_sep="\t", train_ratio=0.5, val_ratio=0.2,
                 test_ratio=0.3, seed=None):
        self.base_path = base_path
        self.input_base_path = os.path.join(base_path, input_folder)
        self.output_base_path = os.path.join(base_path, output_folder)
        self.file_sep = file_sep
        nodes_set = pd.read_csv(os.path.join(base_path, node_file),
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
        # per-rep seed: the global np.random stream is fork-inherited by
        # multiprocessing Pool workers, so consecutive reps spawned from an
        # unchanged parent state shuffle IDENTICALLY (the reference has the
        # same latent bug) — derive an explicit per-(rep, file) stream
        self.seed = seed

    def _rng(self, file):
        if self.seed is None:
            return np.random
        import zlib

        return np.random.RandomState(
            zlib.crc32(f"{self.seed}:{file}".encode()) & 0x7FFFFFFF)

    def generate_edge_sample(self, file, sep="\t"):
        rng = self._rng(file)
        date = file.split(".")[0]
        df = pd.read_csv(os.path.join(self.input_base_path, file), sep=sep)
        src = df.iloc[:, 0].map(self.node2idx_dict).to_numpy(np.int64)
        dst = df.iloc[:, 1].map(self.node2idx_dict).to_numpy(np.int64)
        # both directions, label 1 (reference link_prediction.py:50-61)
        edges = np.stack([np.concatenate([src, dst]),
                          np.concatenate([dst, src]),
                          np.ones(2 * len(src), np.int64)], axis=1)
        all_edge_dict = {(int(u), int(v)): 1 for u, v, _ in edges}
        rng.shuffle(edges)
        edge_num = edges.shape[0]
        test_num = int(np.floor(edge_num * self.test_ratio))
        val_num = int(np.floor(edge_num * self.val_ratio))
        train_num = int(np.floor(
            (edge_num - test_num - val_num) * self.train_ratio))
        val_edges = edges[:val_num]
        test_edges = edges[val_num:val_num + test_num]
        train_edges = edges[val_num + test_num:val_num + test_num + train_num]

        for name, pos, n in (("train", train_edges, train_num),
                             ("test", test_edges, test_num),
                             ("val", val_edges, val_num)):
            both = get_neg_edge_samples(pos, n, all_edge_dict, self.node_num,
                                        rng=rng)
            pd.DataFrame(both, columns=["from_id", "to_id", "label"]).to_csv(
                os.path.join(self.output_base_path, f"{date}_{name}.csv"),
                sep=self.file_sep, index=False)

    def generate_edge_samples_all_time(self, sep="\t", worker=-1):
        print("Start generating edge samples!")
        f_list = sorted(os.listdir(self.input_base_path))
        if worker <= 0:
            for f in f_list:
                self.generate_edge_sample(f, sep=sep)
        else:
            worker = min(worker, os.cpu_count())
            with multiprocessing.Pool(processes=worker) as pool:
                res = [pool.apply_async(self.generate_edge_sample, (f, sep))
                       for f in f_list]
                for r in res:
                    r.get()
        print("Generate edge samples finish!")


def edge_features(edge_arr, emb, measure_list):
    """Vectorized edge features per measure."""
    zi = emb[edge_arr[:, 0]]
    zj = emb[edge_arr[:, 1]]
    feats = {}
    for measure in measure_list:
        assert measure in ("Avg", "Had", "L1", "L2", "sigmoid")
        if measure == "Avg":
            feats[measure] = (zi + zj) / 2
        elif measure == "Had":
            feats[measure] = zi * zj
        elif measure == "L1":
            feats[measure] = np.abs(zi - zj)
        elif measure == "L2":
            feats[measure] = (zi - zj) ** 2
        else:  # sigmoid: scalar score, no model fitted
            feats[measure] = sigmoid(np.sum(zi * zj, axis=1))
    return feats


class LinkPredictor:
    def __init__(self, base_path, origin_folder, embedding_folder,
                 lp_edge_folder, output_folder, node_file, file_sep="\t",
                 C_list=None, measure_list=None, max_iter=5000):
        self.base_path = base_path
        self.origin_base_path = os.path.join(base_path, origin_folder)
        self.embedding_base_path = os.path.join(base_path, embedding_folder)
        self.lp_edge_base_path = os.path.join(base_path, lp_edge_folder)
        self.output_base_path = os.path.join(base_path, output_folder)
        self.file_sep = file_sep
        self.measure_list = measure_list or ["Avg", "Had", "L1", "L2"]
        nodes_set = pd.read_csv(os.path.join(base_path, node_file),
                                names=["node"])
        self.full_node_list = nodes_set["node"].tolist()
        self.C_list = C_list or [0.01, 0.1, 1, 10]
        self.max_iter = max_iter
        check_and_make_path(self.embedding_base_path)
        check_and_make_path(self.origin_base_path)
        check_and_make_path(self.output_base_path)

    def train(self, train_edges, val_edges, embeddings):
        from sklearn.linear_model import LogisticRegression
        from sklearn.metrics import roc_auc_score

        train_labels = train_edges[:, 2]
        val_labels = val_edges[:, 2]
        train_feats = edge_features(train_edges, embeddings,
                                    self.measure_list)
        val_feats = edge_features(val_edges, embeddings, self.measure_list)
        model_dict = {}
        for measure in self.measure_list:
            if measure == "sigmoid":
                continue
            best_auc, best_model = 0.0, None
            for C in self.C_list:
                model = LogisticRegression(C=C, solver="lbfgs",
                                           max_iter=self.max_iter,
                                           class_weight="balanced")
                model.fit(train_feats[measure], train_labels)
                pred = model.predict_proba(val_feats[measure])[:, 1]
                auc = roc_auc_score(val_labels, pred)
                if auc >= best_auc:
                    best_auc, best_model = auc, model
            model_dict[measure] = best_model
        return model_dict

    def test(self, test_edges, embeddings, model_dict, date):
        from sklearn.metrics import roc_auc_score

        test_labels = test_edges[:, 2]
        test_feats = edge_features(test_edges, embeddings, self.measure_list)
        auc_list = [date]
        for measure in self.measure_list:
            if measure == "sigmoid":
                pred = test_feats[measure]
            else:
                pred = model_dict[measure].predict_proba(
                    test_feats[measure])[:, 1]
            auc_list.append(roc_auc_score(test_labels, pred))
        return auc_list

    def link_prediction_all_time(self, method):
        print("method =", method)
        f_list = sorted(os.listdir(self.origin_base_path))
        all_auc_list = []
        for i, f_name in enumerate(f_list):
            if i == 0:
                continue
            date = f_name.split(".")[0]
            read = lambda kind: pd.read_csv(
                os.path.join(self.lp_edge_base_path, f"{date}_{kind}.csv"),
                sep=self.file_sep).values
            train_edges, val_edges, test_edges = (read("train"), read("val"),
                                                  read("test"))
            # previous snapshot's embedding predicts the current edges
            pre_embedding_path = os.path.join(
                self.embedding_base_path, method, f_list[i - 1])
            if not os.path.exists(pre_embedding_path):
                continue
            df_embedding = pd.read_csv(pre_embedding_path, sep=self.file_sep,
                                       index_col=0)
            df_embedding = df_embedding.loc[self.full_node_list, :]
            embeddings = df_embedding.values
            model_dict = self.train(train_edges, val_edges, embeddings)
            all_auc_list.append(
                self.test(test_edges, embeddings, model_dict, date))
        df_output = pd.DataFrame(all_auc_list,
                                 columns=["date"] + self.measure_list)
        print(df_output)
        had_pos = 1 + self.measure_list.index("Had") \
            if "Had" in self.measure_list else 2
        print(f"method = {method}, average AUC of Had: "
              f"{df_output.iloc[-4:, had_pos].mean()}")
        df_output.to_csv(
            os.path.join(self.output_base_path, method + "_auc_record.csv"),
            sep=",", index=False)

    def link_prediction_all_method(self, method_list=None, worker=-1):
        print("Start link prediction!")
        if method_list is None:
            method_list = os.listdir(self.embedding_base_path)
        if worker <= 0:
            for method in method_list:
                self.link_prediction_all_time(method)
        else:
            worker = min(worker, os.cpu_count())
            with multiprocessing.Pool(processes=worker) as pool:
                res = [pool.apply_async(self.link_prediction_all_time,
                                        (method,))
                       for method in method_list]
                for r in res:
                    r.get()
        print("Finish link prediction!")


def aggregate_results(base_path, lp_res_folder, start_idx, rep_num,
                      method_list, measure_list):
    """Merge repetition folders into per-measure avg/max/min files
    (reference link_prediction.py:268-298)."""
    if rep_num <= 0:
        return
    for method in method_list:
        measure_df_dict = {}
        for i in range(start_idx, start_idx + rep_num):
            res_path = os.path.join(base_path, f"{lp_res_folder}_{i}",
                                    method + "_auc_record.csv")
            cols = ["date"] + [f"{m}_{i}" for m in measure_list]
            df_rep = pd.read_csv(res_path, sep=",", header=0, names=cols)
            for m in measure_list:
                part = df_rep.loc[:, (["date"] if i == start_idx else [])
                                  + [f"{m}_{i}"]]
                if i == start_idx:
                    measure_df_dict[m] = part.copy()
                else:
                    measure_df_dict[m] = pd.concat(
                        [measure_df_dict[m], part], axis=1)
        output_base_path = os.path.join(base_path, lp_res_folder)
        check_and_make_path(output_base_path)
        for m in measure_list:
            cols = [f"{m}_{i}" for i in range(start_idx,
                                              start_idx + rep_num)]
            df = measure_df_dict[m]
            df["avg"] = df.loc[:, cols].mean(axis=1)
            df["max"] = df.loc[:, cols].max(axis=1)
            df["min"] = df.loc[:, cols].min(axis=1)
            df.to_csv(os.path.join(output_base_path,
                                   f"{method}_{m}_record.csv"),
                      sep=",", index=False)


def link_prediction(args):
    base_path = args["base_path"]
    origin_folder = args["origin_folder"]
    embedding_folder = args["embed_folder"]
    node_file = args["node_file"]
    lp_edge_folder = args["lp_edge_folder"]
    lp_res_folder = args["lp_res_folder"]
    file_sep = args.get("file_sep", "\t")
    start_idx = args.get("start_idx", 0)
    rep_num = args.get("rep_num", 1)
    train_ratio = args["train_ratio"]
    val_ratio = args["val_ratio"]
    test_ratio = args["test_ratio"]
    do_lp = args.get("do_lp", True)
    generate = args.get("generate", True)
    aggregate = args.get("aggregate", False)
    method_list = args.get("method_list", None)
    C_list = args.get("c_list", None)
    measure_list = args.get("measure_list", ["Avg", "Had", "L1", "L2"])
    max_iter = args.get("max_iter", 5000)
    worker = args.get("worker", -1)

    if do_lp:
        for i in range(start_idx, start_idx + rep_num):
            data_generator = DataGenerator(
                base_path=base_path, input_folder=origin_folder,
                output_folder=f"{lp_edge_folder}_{i}", node_file=node_file,
                file_sep=file_sep, train_ratio=train_ratio,
                val_ratio=val_ratio, test_ratio=test_ratio, seed=i)
            if generate:
                data_generator.generate_edge_samples_all_time(sep=file_sep,
                                                              worker=worker)
            link_predictor = LinkPredictor(
                base_path=base_path, origin_folder=origin_folder,
                embedding_folder=embedding_folder,
                lp_edge_folder=f"{lp_edge_folder}_{i}",
                output_folder=f"{lp_res_folder}_{i}", node_file=node_file,
                file_sep=file_sep, C_list=C_list, measure_list=measure_list,
                max_iter=max_iter)
            t1 = time.time()
            link_predictor.link_prediction_all_method(method_list=method_list,
                                                      worker=worker)
            print("link prediction cost time:", time.time() - t1, "seconds!")

    if aggregate:
        aggregate_results(base_path, lp_res_folder, start_idx, rep_num,
                          method_list, measure_list)
