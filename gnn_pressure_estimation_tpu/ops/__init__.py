from gnn_pressure_estimation_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    gather,
    gather_src,
    spmm,
    sddmm_dot,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "gather",
    "gather_src",
    "spmm",
    "sddmm_dot",
]
