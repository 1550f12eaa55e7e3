from gnn_pressure_estimation_tpu.core.graph import GraphTemplate, BatchedGraph

__all__ = ["GraphTemplate", "BatchedGraph"]
