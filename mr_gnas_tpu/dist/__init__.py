from mr_gnas_tpu.dist.mesh import (
    make_mesh,
    replicate,
    shard_blocks,
    shard_entity_table,
    shard_graph,
)
from mr_gnas_tpu.dist.partition import (
    edge_partitioned_segment_reduce,
    ring_segment_sum_overlapped,
    sharded_scores_rank,
)
from mr_gnas_tpu.dist.spmd import (
    build_local_batch,
    build_local_graph,
    make_spmd_loss,
)

__all__ = [
    "build_local_batch",
    "build_local_graph",
    "edge_partitioned_segment_reduce",
    "make_mesh",
    "make_spmd_loss",
    "replicate",
    "ring_segment_sum_overlapped",
    "shard_blocks",
    "shard_entity_table",
    "shard_graph",
    "sharded_scores_rank",
]
