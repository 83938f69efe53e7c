from mr_gnas_tpu.kernels.segment import (
    gather_rows,
    segment_count,
    segment_max,
    segment_mean,
    segment_std,
    segment_sum,
)

__all__ = [
    "gather_rows",
    "segment_count",
    "segment_max",
    "segment_mean",
    "segment_std",
    "segment_sum",
]
