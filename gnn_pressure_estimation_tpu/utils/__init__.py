from gnn_pressure_estimation_tpu.utils.scaling import scale, descale, NormStats
from gnn_pressure_estimation_tpu.utils.masking import batch_node_mask
from gnn_pressure_estimation_tpu.utils import metrics

__all__ = ["scale", "descale", "NormStats", "batch_node_mask", "metrics"]
