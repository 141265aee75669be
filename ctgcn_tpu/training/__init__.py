"""Training engines and the embedding-task driver."""

from ctgcn_tpu.training.engine import (  # noqa: F401
    UnsupervisedEmbedding, SupervisedEmbedding, make_optimizer,
    save_params, load_params,
)
from ctgcn_tpu.training.driver import gnn_embedding  # noqa: F401
