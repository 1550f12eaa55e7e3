from gnn_pressure_estimation_tpu.parallel.mesh import make_mesh
from gnn_pressure_estimation_tpu.parallel.edgepart import partition_graph
from gnn_pressure_estimation_tpu.parallel.distributed import (
    DistributedTrainer,
    make_distributed_train_step,
)
from gnn_pressure_estimation_tpu.parallel.halo import (
    build_halo_partition,
    halo_exchange,
)
from gnn_pressure_estimation_tpu.parallel.trainer import MeshTrainer, init_distributed

__all__ = [
    "make_mesh",
    "partition_graph",
    "DistributedTrainer",
    "make_distributed_train_step",
    "MeshTrainer",
    "init_distributed",
    "build_halo_partition",
    "halo_exchange",
]
