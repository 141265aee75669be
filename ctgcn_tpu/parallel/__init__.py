"""Multi-chip scale-out: mesh construction and sharded training steps.

The reference is strictly single-device (SURVEY §2.5); everything here is new
capability.  Parallelism axes for dynamic-graph training:

  * ``time``  — snapshots are independent until the temporal RNN, so the
    per-timestep MLP+CDN stacks (and their per-timestep parameters) shard
    over T; the small [T, N, d] RNN input is all-gathered by XLA at the
    resharding point.
  * ``graph`` — node rows partition across chips for SpMM at large N: each
    chip owns a row block of the output and all-gathers the feature matrix
    over ICI.
"""

from ctgcn_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_over_time, replicate, make_ctgcn_train_step,
)
