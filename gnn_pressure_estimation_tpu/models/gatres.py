"""GATRes — the flagship masked-pressure-reconstruction model.

Architecture parity with the reference ``GATResMeanConv``
(GraphModels.py:454-494):

    lin0: Linear(1 → nc)
    num_blocks × GATResBlock:
        x0 = x
        x  = relu(GATConv(nc → nc, heads=2, concat))      # [N, 2nc]
        x  = GATConv(2nc → nc, heads=1)                   # [N, nc]
        x  = SimpleMeanConv(x) + x0
        x  = relu(x)
    lin1: Linear(nc → 1)        (no output sigmoid)

Presets: small = 15 blocks / nc 32, large = 25 blocks / nc 128
(ConfigModels.py:30-42).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from gnn_pressure_estimation_tpu.core.graph import BatchedGraph
from gnn_pressure_estimation_tpu.models.layers import GATConv, SimpleMeanConv, glorot


class GATResBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    attn_dtype: jnp.dtype = None
    attn_impl: str = "softmax"
    gate_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, graph: BatchedGraph) -> jax.Array:
        nc = self.channels
        x0 = x
        x = nn.relu(GATConv(nc, heads=2, concat=True, dtype=self.dtype,
                            attn_dtype=self.attn_dtype,
                            attn_impl=self.attn_impl,
                            gate_dtype=self.gate_dtype)(x, graph))
        x = GATConv(nc, heads=1, concat=False, dtype=self.dtype,
                    attn_dtype=self.attn_dtype,
                    attn_impl=self.attn_impl,
                    gate_dtype=self.gate_dtype)(x, graph)
        x = SimpleMeanConv()(x, graph) + x0
        return nn.relu(x)


class GATRes(nn.Module):
    """Uniform model signature: ``apply(params, x[N,1], graph) -> [N,1]``.

    ``remat=True`` wraps each block in ``jax.checkpoint``: the backward pass
    recomputes the [B,n,n,H] attention tensors tile-fused instead of reading
    them back from HBM — the step is HBM-bound (roofline: 97% of the memory
    roof), so trading VPU recompute FLOPs for that traffic is the win the
    hardware asks for.
    """

    num_blocks: int = 15
    channels: int = 32
    out_channels: int = 1
    dtype: jnp.dtype = jnp.float32
    attn_dtype: jnp.dtype = None
    attn_impl: str = "softmax"
    # storage dtype of the factored path's 0/1 gate matrix (exact in bf16;
    # jnp.float32 restores the round-2 all-f32 behavior — see layers.GATConv)
    gate_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, graph: BatchedGraph, training: bool = False
    ) -> jax.Array:
        x = nn.Dense(self.channels, kernel_init=glorot, name="lin0")(x)
        block_cls = nn.remat(GATResBlock) if self.remat else GATResBlock
        for i in range(self.num_blocks):
            x = block_cls(self.channels, dtype=self.dtype,
                          attn_dtype=self.attn_dtype,
                          attn_impl=self.attn_impl,
                          gate_dtype=self.gate_dtype,
                          name=f"block_{i}")(x, graph)
        x = nn.Dense(self.out_channels, kernel_init=glorot, name="lin1")(x)
        return x
