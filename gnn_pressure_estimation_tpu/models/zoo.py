"""Baseline model zoo — capability parity with the reference's reachable models.

Every model shares the signature ``__call__(x[N,1], graph, training=False) ->
[N,1]`` (reference uniform forward, GraphModels.py:486/:163/:202). Only MGCN
consumes ``graph.edge_attr`` (reference ConfigModels.py:48).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from gnn_pressure_estimation_tpu.core.graph import BatchedGraph
from gnn_pressure_estimation_tpu.models.layers import (
    GATConv,
    GCN2Conv,
    ChebConv,
    GINConv,
    GENConv,
    glorot,
)


class GIN(nn.Module):
    """GIN with SELU bottleneck MLPs and dim-matched residuals
    (reference GraphModels.py:233-260; preset 15 blocks / nc 32)."""

    num_blocks: int = 15
    channels: int = 32
    in_channels: int = 1
    out_channels: int = 1

    @nn.compact
    def __call__(self, x, graph: BatchedGraph, training: bool = False):
        nc = self.channels
        for i in range(self.num_blocks):
            o = x
            if i == 0:
                x = GINConv(mlp_dims=(nc // 2, nc))(x, graph, training)
            elif i == self.num_blocks - 1:
                x = GINConv(linear_out=self.out_channels)(x, graph, training)
            else:
                x = GINConv(mlp_dims=(nc // 2, nc))(x, graph, training)
            if x.shape[-1] == o.shape[-1]:
                x = x + o
        return x


class GAT(nn.Module):
    """Plain stacked GAT (reference GraphModels.py:210-230; 10 blocks, nc 32,
    2 heads except a single-head final layer)."""

    num_blocks: int = 10
    channels: int = 32
    out_channels: int = 1

    @nn.compact
    def __call__(self, x, graph: BatchedGraph, training: bool = False):
        nc = self.channels
        for i in range(self.num_blocks):
            if i == self.num_blocks - 1:
                x = GATConv(self.out_channels, heads=1, concat=True)(x, graph)
            else:
                x = GATConv(nc, heads=2, concat=True)(x, graph)
        return x


class GCN2(nn.Module):
    """GCNII stack with initial-residual skip to the stem output
    (reference GraphModels.py:188-208; 64 layers, nc 32, α=0.1, θ=0.5)."""

    num_blocks: int = 64
    channels: int = 32
    out_channels: int = 1

    @nn.compact
    def __call__(self, x, graph: BatchedGraph, training: bool = False):
        x = nn.Dense(self.channels, kernel_init=glorot, name="stem")(x)
        x0 = x
        for i in range(self.num_blocks):
            x = GCN2Conv(self.channels, alpha=0.1, theta=0.5, layer_index=i + 1)(
                x, x0, graph
            )
        return nn.Dense(self.out_channels, kernel_init=glorot, name="lin")(x)


class ChebNet(nn.Module):
    """Tuned Chebyshev baseline (reference GraphModels.py:170-184):
    K = 24/12/10/1, SiLU between blocks, bias-free last block."""

    channels: int = 32
    out_channels: int = 1
    ks: tuple = (24, 12, 10, 1)

    @nn.compact
    def __call__(self, x, graph: BatchedGraph, training: bool = False):
        nc = self.channels
        x = nn.silu(ChebConv(nc, K=self.ks[0])(x, graph))
        x = nn.silu(ChebConv(nc, K=self.ks[1])(x, graph))
        x = nn.silu(ChebConv(nc, K=self.ks[2])(x, graph))
        return ChebConv(self.out_channels, K=self.ks[3], use_bias=False)(x, graph)


class GraphConvWat(nn.Module):
    """BME-SmartLab GraphConvWat reproduction (reference GraphModels.py:154-168):
    ChebConv 120/60/30 with K = 240/120/20, SiLU, bias-free K=1 head.
    ``channels``/``ks`` are parametrized for tests; defaults match the paper."""

    out_channels: int = 1
    channels: tuple = (120, 60, 30)
    ks: tuple = (240, 120, 20, 1)

    @nn.compact
    def __call__(self, x, graph: BatchedGraph, training: bool = False):
        x = nn.silu(ChebConv(self.channels[0], K=self.ks[0])(x, graph))
        x = nn.silu(ChebConv(self.channels[1], K=self.ks[1])(x, graph))
        x = nn.silu(ChebConv(self.channels[2], K=self.ks[2])(x, graph))
        return ChebConv(self.out_channels, K=self.ks[3], use_bias=False)(x, graph)


class MGCN(nn.Module):
    """HammerLab m_GCN reproduction (reference GraphModels.py:399-449):
    node_in → n_aggr × GENConv (selu between multi-hop passes) → node_out.
    The only model consuming edge features (diameter, length)."""

    latent_dim: int = 96
    n_aggr: int = 45
    n_hops: int = 1
    num_layers: int = 2
    edge_dim: int = 2
    out_channels: int = 1
    use_bias: bool = False
    with_sigmoid: bool = False

    @nn.compact
    def __call__(self, x, graph: BatchedGraph, training: bool = False):
        d = self.latent_dim
        edge_emb = None
        if graph.edge_attr is not None and self.edge_dim > 0:
            edge_emb = nn.Dense(
                d, use_bias=self.use_bias, kernel_init=glorot, name="edge"
            )(graph.edge_attr)
        z = nn.Dense(d, use_bias=self.use_bias, kernel_init=glorot, name="node_in")(x)
        for i in range(self.n_aggr):
            gen = GENConv(
                d, use_bias=self.use_bias, num_layers=self.num_layers,
                name=f"gcn_{i}",
            )
            for _ in range(self.n_hops - 1):
                z = nn.selu(gen(z, graph, edge_emb, mlp=False, training=training))
            z = nn.selu(gen(z, graph, edge_emb, mlp=True, training=training))
        y = nn.Dense(
            self.out_channels, use_bias=self.use_bias, kernel_init=glorot,
            name="node_out",
        )(z)
        if self.with_sigmoid:
            y = nn.sigmoid(y)
        return y
