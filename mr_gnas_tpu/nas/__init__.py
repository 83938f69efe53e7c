from mr_gnas_tpu.nas.architect import (
    first_order_step,
    make_arch_optimizer,
    sgd_momentum_buffer,
    unrolled_step,
)

__all__ = [
    "first_order_step",
    "make_arch_optimizer",
    "sgd_momentum_buffer",
    "unrolled_step",
]
