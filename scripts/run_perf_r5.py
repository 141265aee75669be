# coding: utf-8
"""Round-5 perf refresh in ONE TPU process (relay lease amortization):

  1. profile_large_step --remat save_spmm   (refresh core_tail_bwd with
     the custom core-RNN VJP; r4: 596.75 ms of a 1051 ms step)
  2. profile_large_step --remat full        (the enron-policy variant)
  3. bench_scan_floor                       (UCI sequential-scan floor)

Each sub-script is import-run in-process (runpy); none closes over
device arrays, so no relay-degradation cross-talk (CLAUDE.md rule).
bench_large_scale and bench.py run in their OWN processes afterwards
for r4 comparability.
"""
import os
import runpy
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

for argv in (
    ["scripts/profile_large_step.py", "--remat", "save_spmm"],
    ["scripts/profile_large_step.py", "--remat", "full"],
    ["scripts/bench_scan_floor.py"],
):
    print(f"=== {' '.join(argv)} ===", flush=True)
    sys.argv = argv
    runpy.run_path(os.path.join(REPO, argv[0]), run_name="__main__")
