# coding: utf-8
"""Edge-classification aggregate_results (reference
evaluation/edge_classification.py:235-297): rep folders merge into
per-method avg/max/min files, same contract as node-cls/link-pred."""
import os

import numpy as np
import pandas as pd

from ctgcn_tpu.evaluation.edge_classification import aggregate_results

_REPO = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".."))


def test_aggregate_synthetic(tmp_path):
    accs = {0: [0.5, 0.6], 1: [0.7, 0.8], 2: [0.6, 1.0]}
    for i, vals in accs.items():
        d = tmp_path / f"ec_res_{i}"
        d.mkdir()
        pd.DataFrame({"date": ["d0", "d1"], "acc": vals}).to_csv(
            d / "GCN_acc_record.csv", sep=",", index=False)
    aggregate_results(str(tmp_path), "ec_res", 0, 3, ["GCN"])
    out = pd.read_csv(tmp_path / "ec_res" / "GCN_acc_record.csv")
    np.testing.assert_allclose(out["avg"], [0.6, 0.8])
    np.testing.assert_allclose(out["max"], [0.7, 1.0])
    np.testing.assert_allclose(out["min"], [0.5, 0.6])
    assert list(out.columns) == ["date", "acc_0", "acc_1", "acc_2",
                                 "avg", "max", "min"]


def test_aggregate_committed_america_air_reps(tmp_path):
    """The three committed america_air rep folders aggregate cleanly (the
    output goes to a scratch copy so the data tree stays untouched)."""
    src = os.path.join(_REPO, "data", "america_air")
    for i in range(3):
        d = tmp_path / f"edgecls_res_{i}"
        d.mkdir()
        for f in os.listdir(os.path.join(src, f"edgecls_res_{i}")):
            df = pd.read_csv(os.path.join(src, f"edgecls_res_{i}", f))
            df.to_csv(d / f, sep=",", index=False)
    methods = ["CTGCN-C", "GCN"]
    aggregate_results(str(tmp_path), "edgecls_res", 0, 3, methods)
    for m in methods:
        out = pd.read_csv(tmp_path / "edgecls_res" / f"{m}_acc_record.csv")
        assert {"avg", "max", "min"} <= set(out.columns)
        assert (out["min"] <= out["avg"]).all()
        assert (out["avg"] <= out["max"]).all()
        ref = pd.read_csv(
            os.path.join(src, "edgecls_res_0", f"{m}_acc_record.csv"))
        assert len(out) == len(ref)
