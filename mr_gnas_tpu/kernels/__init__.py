from mr_gnas_tpu.kernels.bn_mix import bn_mix
from mr_gnas_tpu.kernels.table import take_small_table
from mr_gnas_tpu.kernels.segment import (
    gather_rows,
    segment_count,
    segment_max,
    segment_softmax,
    segment_mean,
    segment_std,
    segment_sum,
)

__all__ = [
    "bn_mix",
    "take_small_table",
    "gather_rows",
    "segment_count",
    "segment_max",
    "segment_softmax",
    "segment_mean",
    "segment_std",
    "segment_sum",
]
