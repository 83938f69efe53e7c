from mr_gnas_tpu.utils.profiling import device_memory_stats, nan_check, timed, trace
from mr_gnas_tpu.utils.visualization import plot, to_ascii, to_dot

__all__ = [
    "device_memory_stats",
    "nan_check",
    "plot",
    "timed",
    "to_ascii",
    "to_dot",
    "trace",
]
