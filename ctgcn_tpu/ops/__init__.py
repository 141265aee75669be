"""TPU-native compute primitives: sparse containers, SpMM/SDDMM, segment ops,
scan-based RNN cells, and Pallas kernels for the hot paths."""

from ctgcn_tpu.ops.sparse import SparseGraph  # noqa: F401
from ctgcn_tpu.ops.spmm import spmm, sddmm  # noqa: F401
from ctgcn_tpu.ops.rnn import GRUCell, LSTMCell, rnn_scan  # noqa: F401
