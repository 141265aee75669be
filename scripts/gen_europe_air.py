# coding: utf-8
"""Generate the in-tree europe_air labeled dynamic dataset.

Companion to gen_america_air.py: the reference's europe-air data
(struct2vec airport graph, reference README.md:176 — N=399, 5995 edges,
max degree 202, max core 33, 10 synthetic snapshots) is not shipped in
its repo, only the config.  Same recipe: heavy-tailed graph with a dense
hub core, degree-quartile activity labels, 10 cumulative snapshots via
``tooling.build_dynamic_graph`` + per-snapshot ``copy_node_labels``.

Run: python scripts/gen_europe_air.py  (CPU-only, seconds)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from ctgcn_tpu.data.tooling import build_dynamic_graph, copy_node_labels

BASE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "europe_air")
N = 399
TARGET_EDGES = 5995


def synth_airport_graph(rng):
    """Heavy-tailed graph with a dense hub core (max core ~33 like the
    real europe-air network)."""
    w = (np.arange(1, N + 1) ** -0.6)
    rng.shuffle(w)
    p = w / w.sum()
    edges = set()
    hubs = np.argsort(-p)[:45]
    for i in range(len(hubs)):
        for j in range(i + 1, len(hubs)):
            if rng.rand() < 0.75:
                edges.add((min(hubs[i], hubs[j]), max(hubs[i], hubs[j])))
    while len(edges) < TARGET_EDGES:
        m = TARGET_EDGES - len(edges)
        src = rng.choice(N, size=2 * m, p=p)
        dst = rng.choice(N, size=2 * m, p=p)
        for s, t in zip(src, dst):
            if s != t:
                edges.add((min(s, t), max(s, t)))
            if len(edges) >= TARGET_EDGES:
                break
    return sorted(edges)


def main():
    rng = np.random.RandomState(7)
    edges = synth_airport_graph(rng)
    deg = np.zeros(N, np.int64)
    for s, t in edges:
        deg[s] += 1
        deg[t] += 1
    q = np.quantile(deg, [0.25, 0.5, 0.75])
    labels = np.digitize(deg, q)

    os.makedirs(os.path.join(BASE, "0.input"), exist_ok=True)
    edge_path = os.path.join(BASE, "0.input", "europe_air.edgelist")
    pd.DataFrame(edges, columns=["f", "t"]).to_csv(
        edge_path, sep="\t", index=False, header=False)
    label_path = os.path.join(BASE, "0.input", "labels.csv")
    pd.DataFrame({"node": np.arange(N), "label": labels}).to_csv(
        label_path, sep=" ", index=False)

    build_dynamic_graph(edge_path, os.path.join(BASE, "1.format"),
                        os.path.join(BASE, "nodes_set"), sep="\t",
                        graph_num=10, rng=rng)
    copy_node_labels(label_path, os.path.join(BASE, "nodes_label"),
                     graph_num=10)

    import scipy.sparse as sp
    from ctgcn_tpu.preprocessing.kcore import core_numbers
    r = np.array([e[0] for e in edges])
    c = np.array([e[1] for e in edges])
    A = sp.coo_matrix((np.ones(2 * len(r)), (np.concatenate([r, c]),
                                             np.concatenate([c, r]))),
                      shape=(N, N)).tocsr()
    A.data[:] = 1
    cores = core_numbers(A)
    print(f"N={N} edges={len(edges)} max_deg={deg.max()} "
          f"max_core={cores.max()} classes={np.bincount(labels)}")
    print(f"wrote {BASE}")


if __name__ == "__main__":
    main()
