# coding: utf-8
"""Derive per-edge labels for the in-tree america_air dataset so the
S-edge learning type and the edge-classification evaluator run on real
(non-toy) data.

Neither the reference repo nor its published datasets ship edge labels —
its own edge classification is untested and crashes (reference
evaluation/edge_classification.py:38-39, README "edge classification ...
not tested").  Labels here are derived from the committed node labels
(flight-activity quartiles): an edge is a

  * 0 "regional" route — both endpoints in the low-activity half,
  * 1 "feeder" route  — one low- and one high-activity endpoint,
  * 2 "trunk" route   — both endpoints in the high-activity half,

which gives a 3-class surface genuinely predictable from structure.
Writes ``data/america_air/edges_label/<t>.csv`` (from_id, to_id, label —
the layout loader.get_edge_label_list / evaluation.edge_classification
consume) for each snapshot.

Run: python scripts/gen_america_air_edge_labels.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

BASE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "america_air")


def main():
    fmt_dir = os.path.join(BASE, "1.format")
    nlabel_dir = os.path.join(BASE, "nodes_label")
    out_dir = os.path.join(BASE, "edges_label")
    os.makedirs(out_dir, exist_ok=True)
    for f in sorted(os.listdir(fmt_dir)):
        labels = pd.read_csv(os.path.join(nlabel_dir, f), sep="\t", header=0,
                             names=["node", "label"])
        lab = dict(zip(labels["node"], labels["label"]))
        edges = pd.read_csv(os.path.join(fmt_dir, f), sep="\t", header=0)
        hi_u = (edges["from_id"].map(lab) >= 2).astype(int)
        hi_v = (edges["to_id"].map(lab) >= 2).astype(int)
        edges["label"] = hi_u + hi_v
        edges[["from_id", "to_id", "label"]].to_csv(
            os.path.join(out_dir, f), sep="\t", index=False)
        print(f, edges["label"].value_counts().sort_index().tolist())


if __name__ == "__main__":
    main()
