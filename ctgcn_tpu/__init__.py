"""ctgcn_tpu — a TPU-native dynamic-graph GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of jhljx/CTGCN
(K-core based Temporal Graph Convolutional Network, TKDE 2020): k-core
diffusion GNNs over dynamic graph snapshots, a model zoo of static/dynamic
baselines, preprocessing (k-core decomposition, random walks), training
engines, and downstream evaluation (link prediction, node/edge
classification, centrality/similarity prediction).

Design principles (TPU-first, not a port):
  * static shapes everywhere — padded/masked sparse containers
  * lax.scan over core/time axes instead of Python loops
  * one jitted train step per epoch (gradient accumulation inside scan)
  * sharding via jax.sharding.Mesh + shard_map for multi-chip scale-out
"""

__version__ = "0.1.0"

from ctgcn_tpu import utils  # noqa: F401
