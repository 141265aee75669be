# coding: utf-8
"""CLI dispatcher (reference main.py re-designed, same flag surface):

    python -m ctgcn_tpu.main --config=<json> --task=<task> [--method=<M>]

Tasks: preprocessing, embedding, link_pred, node_cls, edge_cls, cent_pred,
sim_pred.  Configs are dataset JSON files keyed ``{task: {method: params}}``
— the reference's config schema (config/README.md) is accepted unchanged so
existing configs port directly (CUDA-specific keys are ignored).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

from ctgcn_tpu.utils import get_supported_methods


def _enable_compilation_cache():
    """Persist XLA compilations across runs (first compiles of the big
    per-timestep CTGCN graphs run minutes; subsequent runs hit the cache)."""
    try:
        import jax

        cache_dir = os.environ.get(
            "CTGCN_TPU_CACHE", os.path.expanduser("~/.cache/ctgcn_tpu_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as exc:  # never block the run on cache setup
        print("compilation cache disabled:", exc)


def _maybe_init_distributed():
    """Multi-host entry (SURVEY §5 'distributed communication backend'):
    when the standard JAX cluster variables are present
    (``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``, or an auto-detectable environment like GKE/Cloud
    TPU]), join the cluster so ``jax.devices()`` spans all hosts and the
    ``n_devices`` mesh path shards over ICI within a slice and DCN across
    hosts.  Single-host runs (no coordinator configured) skip this."""
    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    import jax

    # jax.distributed.initialize() reads JAX_COORDINATOR_ADDRESS itself but
    # (as of jax 0.9) NOT the process-count/id variables — on a plain
    # cluster (no SLURM/GKE auto-detection) they must be passed explicitly
    # or initialize() raises "Number of processes must be defined".
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    print(f"jax.distributed: process {jax.process_index()} of "
          f"{jax.process_count()}, {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices")


def parse_args(argv):
    parser = argparse.ArgumentParser(
        prog="ctgcn_tpu",
        description="TPU-native K-core Temporal Graph Convolutional Network")
    parser.add_argument("--config", nargs=1, type=str, required=True,
                        help="configuration file path")
    parser.add_argument("--task", type=str, required=True,
                        help="task name to run")
    parser.add_argument("--method", type=str, default=None,
                        help="embedding method (embedding/preprocessing task)")
    return parser.parse_args(argv)


def parse_json_args(file_path):
    with open(file_path) as fp:
        return json.load(fp)


def preprocessing_task(method, args):
    from ctgcn_tpu.preprocessing import preprocess

    preprocess(method, args[method])


def embedding_task(method, args):
    assert method in get_supported_methods()
    if method in ("DynGEM", "DynAE", "DynRNN", "DynAERNN"):
        from ctgcn_tpu.nn.dynae import dyngem_embedding

        dyngem_embedding(method, args)
    elif method == "TIMERS":
        from ctgcn_tpu.nn.timers import timers_embedding

        timers_embedding(args)
    else:
        from ctgcn_tpu.training.driver import gnn_embedding

        gnn_embedding(method, args)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    _enable_compilation_cache()
    _maybe_init_distributed()
    config_dict = parse_json_args(args.config[0])

    if args.task == "preprocessing":
        if args.method is None:
            raise AttributeError(
                "method parameter is needed for the preprocessing task!")
        preprocessing_task(args.method, config_dict[args.task])
    elif args.task == "embedding":
        if args.method is None:
            raise AttributeError(
                "method parameter is needed for the embedding task!")
        embedding_task(args.method, config_dict[args.task][args.method])
    elif args.task == "link_pred":
        from ctgcn_tpu.evaluation.link_prediction import link_prediction

        link_prediction(config_dict[args.task])
    elif args.task == "node_cls":
        from ctgcn_tpu.evaluation.node_classification import node_classification

        node_classification(config_dict[args.task])
    elif args.task == "edge_cls":
        from ctgcn_tpu.evaluation.edge_classification import edge_classification

        edge_classification(config_dict[args.task])
    elif args.task == "cent_pred":
        from ctgcn_tpu.evaluation.centrality_prediction import (
            centrality_prediction,
        )

        centrality_prediction(config_dict[args.task])
    elif args.task == "sim_pred":
        from ctgcn_tpu.evaluation.similarity_prediction import (
            similarity_prediction,
        )

        similarity_prediction(config_dict[args.task])
    else:
        raise AttributeError(f"Unsupported task {args.task!r}!")


if __name__ == "__main__":
    main()
