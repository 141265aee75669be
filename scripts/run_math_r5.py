# coding: utf-8
"""Math-v2 regime training in ONE TPU process (relay lease amortization):

  1. CTGCN-C, epoch=10, windows 0-1   -> 2.embedding/CTGCN-C-e10
     (the matched-epoch cross-framework anchor against
     scripts/run_ref_math.py's torch-reference run on the same data)
  2. CTGCN-C, epoch=50, all windows   -> 2.embedding/CTGCN-C
     (the headline math quality row, reference config regime)

Run under the watchdog:
  python scripts/watchdog_run.py --log /tmp/math_r5.log --stall 1500 \
      --total 10800 --retries 2 --retry-on-fail 1 -- \
      python -u scripts/run_math_r5.py
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["e10", "e50", "both"], default="both")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (TPU busy with enron): "
                         "force the ELL core backend — XLA:CPU serializes "
                         "the segment path (CLAUDE.md)")
    args_cli = ap.parse_args()
    if args_cli.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ctgcn_tpu.main import _enable_compilation_cache
    _enable_compilation_cache()
    from ctgcn_tpu.training.driver import gnn_embedding

    base = json.load(open("configs/math.json"))["embedding"]["CTGCN-C"]
    if args_cli.cpu:
        base["core_backend"] = "ell"

    if args_cli.only in ("e10", "both"):
        e10 = dict(base)
        e10.update(embed_folder="2.embedding/CTGCN-C-e10",
                   model_file="ctgcn-c-e10", epoch=10, end_idx=9,
                   record_time=False)
        print("=== math CTGCN-C e10 windows 0-1 (anchor) ===", flush=True)
        gnn_embedding("CTGCN-C", e10)

    if args_cli.only in ("e50", "both"):
        e50 = dict(base)
        e50.update(record_time=True)
        print("=== math CTGCN-C e50 all windows (headline) ===", flush=True)
        gnn_embedding("CTGCN-C", e50)


if __name__ == "__main__":
    main()
