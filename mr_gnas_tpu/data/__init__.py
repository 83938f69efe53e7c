from mr_gnas_tpu.data.blocks import CSRGraph, bucket, build_blocks, iterate_seed_batches
from mr_gnas_tpu.data.kg import KGDataset, load_dataset, load_kg_dir, synthetic_kg
from mr_gnas_tpu.data.labels import QuerySet, iterate_batches, multi_hot, process
from mr_gnas_tpu.data.rdf import NCDataset, load_nc_dataset, synthetic_nc
from mr_gnas_tpu.data.sampling import (
    SampledBatch,
    generate_sampled_graph_and_labels,
    get_adj_and_degrees,
    negative_sampling,
    negative_sampling_chunked,
    negative_sampling_grouped,
    sample_edge_neighborhood,
    sample_edge_uniform,
)

__all__ = [
    "CSRGraph",
    "KGDataset",
    "NCDataset",
    "QuerySet",
    "SampledBatch",
    "bucket",
    "build_blocks",
    "generate_sampled_graph_and_labels",
    "get_adj_and_degrees",
    "iterate_batches",
    "iterate_seed_batches",
    "load_dataset",
    "load_kg_dir",
    "load_nc_dataset",
    "multi_hot",
    "negative_sampling",
    "negative_sampling_chunked",
    "negative_sampling_grouped",
    "process",
    "sample_edge_neighborhood",
    "sample_edge_uniform",
    "synthetic_kg",
    "synthetic_nc",
]
