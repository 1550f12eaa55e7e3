"""Masked-token GATRes variants (reference GraphModels.py:498-605).

These are the reference's experimental "remask" models. Unlike the main zoo
they take the batch mask explicitly: unmasked nodes are encoded from their
values while masked nodes carry a zero/learned token, mirroring
masked-autoencoder pretraining. The reference marks them unreachable from
``select_model`` (dead code) but they are part of the model inventory, so
they ship here with the extended signature
``apply(params, x, graph, batch_mask)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from gnn_pressure_estimation_tpu.core.graph import BatchedGraph
from gnn_pressure_estimation_tpu.models.gatres import GATResBlock
from gnn_pressure_estimation_tpu.models.layers import GATConv, GCNConv, glorot


class GATResRemask(nn.Module):
    """GATResMeanConvWithRemask (GraphModels.py:498-539): encode only
    unmasked nodes; masked nodes start from the raw (zeroed) value broadcast
    across channels."""

    num_blocks: int = 15
    channels: int = 32
    out_channels: int = 1

    @nn.compact
    def __call__(self, x, graph: BatchedGraph, batch_mask, training: bool = False):
        nc = self.channels
        unmask = ~batch_mask
        enc = nn.Dense(nc, kernel_init=glorot, name="encoder")(x)
        # x broadcast to nc channels; unmasked rows replaced by encodings
        # (reference: x.repeat(1, nc); x[unmask] = encoder(x[unmask]))
        x = jnp.where(unmask[:, None], enc, jnp.repeat(x, nc, axis=-1))
        for i in range(self.num_blocks):
            x = GATResBlock(nc, name=f"block_{i}")(x, graph)
        return nn.Dense(self.out_channels, kernel_init=glorot, name="decoder")(x)


class GATResBlockNoMean(nn.Module):
    """GResBlockConv (GraphModels.py:548-561): residual GAT block without the
    mean conv."""

    channels: int

    @nn.compact
    def __call__(self, x, graph: BatchedGraph):
        nc = self.channels
        x0 = x
        x = nn.relu(GATConv(nc, heads=2, concat=True)(x, graph))
        x = GATConv(nc, heads=1, concat=False)(x, graph)
        return nn.relu(x + x0)


class GATResRemaskStack(nn.Module):
    """GATResMeanConvWithRemaskAndStack (GraphModels.py:563-605): GCN stem +
    global-mean-pooled unmasked embedding added to every node + frozen mask
    token, blocks without mean conv."""

    num_blocks: int = 15
    channels: int = 32
    out_channels: int = 1

    @nn.compact
    def __call__(self, x, graph: BatchedGraph, batch_mask, training: bool = False):
        nc = self.channels
        unmask = (~batch_mask).astype(jnp.float32)[:, None]
        enc = nn.Dense(nc, kernel_init=glorot, name="encoder")(x)
        # global mean over unmasked encodings (reference pools across the
        # whole batch, GraphModels.py:592)
        gap = jnp.sum(enc * unmask, axis=0, keepdims=True) / jnp.maximum(
            jnp.sum(unmask), 1.0
        )
        # frozen (non-trainable) mask token (reference Parameter(..., False))
        self.variable("constants", "mask_token", lambda: jnp.zeros((1, nc)))
        x = GCNConv(nc, normalize=False, name="stem")(x, graph) + gap
        for i in range(self.num_blocks):
            x = GATResBlockNoMean(nc, name=f"block_{i}")(x, graph)
        return nn.Dense(self.out_channels, kernel_init=glorot, name="decoder")(x)
