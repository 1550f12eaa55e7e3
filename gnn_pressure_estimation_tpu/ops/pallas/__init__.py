from gnn_pressure_estimation_tpu.ops.pallas.window_gather import (
    WindowLayout,
    build_window_layout,
    make_window_gather,
)

__all__ = ["WindowLayout", "build_window_layout", "make_window_gather"]
