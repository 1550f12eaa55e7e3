"""TPU-native framework for GNN pressure estimation in water distribution networks.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
DiTEC-project/gnn-pressure-estimation (reference mounted at /root/reference):

- ``core``     — immutable static-shape graph containers and batching
- ``ops``      — message-passing primitives (segment ops, SpMM/SDDMM; Pallas kernels)
- ``models``   — GATRes flagship + baseline zoo behind a single apply signature
- ``data``     — zarr-zip snapshot datasets, INP topology parsing, normalization
- ``train``    — jitted train loop, checkpointing, metrics, early stopping, AutoClip
- ``evaluation`` — multi-trial statistical test harness (clean/noisy11/noisyNN)
- ``parallel`` — device meshes, data parallelism, edge-partitioned message passing
- ``simgen``   — scenario generation: token sampling, C++ hydraulic solver, filters
"""

__version__ = "0.1.0"
