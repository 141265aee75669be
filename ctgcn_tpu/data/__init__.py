"""Data layer: snapshot/graph readers, feature builders, window loaders."""

from ctgcn_tpu.data.formats import (  # noqa: F401
    read_node_list, read_edge_csv, build_adj_from_edges, get_sp_adj_mat,
)
from ctgcn_tpu.data.loader import DataLoader  # noqa: F401
