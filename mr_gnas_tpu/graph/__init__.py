from mr_gnas_tpu.graph.container import Block, EdgeGraph, RelGraph, as_edge_graph
from mr_gnas_tpu.graph.build import build_rel_graph, compute_node_norm, round_up

__all__ = [
    "Block",
    "EdgeGraph",
    "RelGraph",
    "as_edge_graph",
    "build_rel_graph",
    "compute_node_norm",
    "round_up",
]
