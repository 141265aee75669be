# coding: utf-8
"""Offline preprocessing jobs (reference preprocessing/ re-designed as array
programs): k-core decomposition and random-walk structure generation.

Artifacts keep the reference's on-disk contract (per-snapshot core ``k.npz``
pyramids, walk-pair ``.npz`` matrices, node-frequency ``.json`` lists) so the
two frameworks are swappable on the same data tree.
"""
import os
import time

from ctgcn_tpu.preprocessing.kcore import StructureInfoGenerator  # noqa: F401
from ctgcn_tpu.preprocessing.walks import WalkGenerator  # noqa: F401


class Processing:
    """Orchestrates structure + walk generation (reference
    preprocessing/__init__.py:8-30)."""

    def __init__(self, base_path, origin_folder, core_folder, node_file,
                 walk_pair_folder, node_freq_folder, walk_time=100,
                 walk_length=5, weighted=True):
        self.structure_generator = (
            StructureInfoGenerator(base_path, origin_folder, core_folder,
                                   node_file)
            if core_folder else None
        )
        self.walk_generator = WalkGenerator(
            base_path, origin_folder, walk_pair_folder, node_freq_folder,
            node_file, walk_time=walk_time, walk_length=walk_length,
            weighted=weighted)

    def run(self, worker=-1, generate_core=True, run_walk=True, sep="\t"):
        if self.structure_generator is not None and generate_core:
            t0 = time.time()
            self.structure_generator.get_kcore_graph_all_time(sep=sep,
                                                              worker=worker)
            print("core generation cost:", time.time() - t0, "seconds")
        if run_walk:
            t0 = time.time()
            self.walk_generator.get_walk_info_all_time(sep=sep, worker=worker)
            print("walk generation cost:", time.time() - t0, "seconds")


def preprocess(method, args):
    """Entry point (reference preprocessing/__init__.py:34-54)."""
    base_path = args["base_path"]
    origin_folder = args["origin_folder"]
    core_folder = args.get("core_folder", None)
    node_file = args["node_file"]
    walk_pair_folder = args["walk_pair_folder"]
    node_freq_folder = args["node_freq_folder"]
    file_sep = args.get("file_sep", "\t")
    generate_core = args.get("generate_core", True)
    run_walk = args.get("run_walk", True)
    weighted = args.get("weighted", True)
    walk_time = args.get("walk_time", 100)
    walk_length = args.get("walk_length", 5)
    worker = args.get("worker", -1)

    processing = Processing(base_path, origin_folder, core_folder, node_file,
                            walk_pair_folder, node_freq_folder,
                            walk_time=walk_time, walk_length=walk_length,
                            weighted=weighted)
    processing.run(worker=worker,
                   generate_core=(core_folder is not None and generate_core),
                   run_walk=run_walk, sep=file_sep)
