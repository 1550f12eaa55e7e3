"""Distributed training step: data-parallel × edge-partitioned, via shard_map.

One jitted SPMD program over a ``("data", "graph")`` mesh:

- snapshots sharded over ``data``; per shard, the node dimension of the
  disjoint-union batch is sharded over ``graph`` (contiguous blocks,
  ``parallel/edgepart.py``)
- every message-passing layer all-gathers feature blocks over the ``graph``
  axis (ICI); XLA transposes the collectives in the backward pass
  (reduce-scatter) automatically
- loss and metrics are global: masked sums are ``psum``'d over both axes and
  metrics derive from moment statistics, so results are bitwise-independent
  of the mesh shape up to float reassociation
- gradients ``psum`` over both axes; Adam update runs replicated

The reference has no distributed training at all (SURVEY §2.4) — this is the
TPU-native capability BASELINE.json's scaling target names.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gnn_pressure_estimation_tpu.core.graph import GraphTemplate
from gnn_pressure_estimation_tpu.parallel.edgepart import partition_graph
from gnn_pressure_estimation_tpu.train.loop import TrainConfig, make_criterion, make_optimizer
from gnn_pressure_estimation_tpu.utils import metrics as metrics_mod
from gnn_pressure_estimation_tpu.utils.masking import batch_node_mask, masked_count
from gnn_pressure_estimation_tpu.utils.scaling import NormStats, descale_with


def make_distributed_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    template: GraphTemplate,
    batch_per_shard: int,
    mask_rate: float,
    stats: NormStats,
    criterion: Callable,
):
    """Returns (step_fn, pack_fn, part).

    ``step_fn(params, opt_state, x_packed, key) -> (params, opt_state, loss,
    metrics)`` where ``x_packed`` is produced by ``pack_fn(batch [dp*B, n])``.
    """
    dp = mesh.shape["data"]
    gp = mesh.shape["graph"]
    n = template.n_node
    B = batch_per_shard
    part = partition_graph(template, B, gp)
    block = part.block
    n_pad_shard = gp * block
    k = masked_count(n, mask_rate)
    garr = part.device_arrays()

    graph_spec = {key: P("graph") for key in garr}
    xspec = P(("data", "graph"))

    def pack(batch: np.ndarray) -> jax.Array:
        """[dp*B, n] snapshots → [dp*gp*block, 1] padded node vector."""
        assert batch.shape == (dp * B, n), (batch.shape, (dp * B, n))
        flat = batch.reshape(dp, B * n)
        pad = np.zeros((dp, n_pad_shard - B * n), batch.dtype)
        return jnp.asarray(
            np.concatenate([flat, pad], axis=1).reshape(dp * n_pad_shard, 1)
        )

    def local_step(params, opt_state, x, y, mask, arrs):
        graph = part.local_graph(arrs)
        mask_b = mask[:, None]

        # psum'ing a loss that itself contains a psum double-counts in the
        # backward pass (transpose of psum is psum): differentiate the LOCAL
        # loss share against the global count, then psum loss and grads once.
        cnt = jax.lax.psum(jnp.sum(mask_b.astype(jnp.float32)), ("data", "graph"))

        def loss_fn(p):
            x_in = jnp.where(mask_b, 0.0, x)
            out = model.apply(p, x_in, graph)
            diff = (out - y) * mask_b
            local_sq = jnp.sum(diff * diff)
            local_abs = jnp.sum(jnp.abs(diff))
            local_loss = criterion((local_sq, local_abs, cnt))
            return local_loss, out

        (local_loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        loss = jax.lax.psum(local_loss, ("data", "graph"))
        grads = jax.lax.psum(grads, ("data", "graph"))
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)

        yp_r = descale_with(out, stats)
        yt_r = descale_with(y, stats)
        mo = metrics_mod.masked_moments(yp_r, yt_r, mask)
        mo = jax.lax.psum(mo, ("data", "graph"))
        mets = metrics_mod.metrics_from_moments(mo, "train")
        return params2, opt_state2, loss, mets

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), xspec, xspec, P(("data", "graph")), graph_spec),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, x_packed, key):
        # mask for dp*B graphs, padded per data shard to the node-block grid
        mask = batch_node_mask(key, dp * B, n, mask_rate)
        mask = mask.reshape(dp, B * n)
        mask = jnp.concatenate(
            [mask, jnp.zeros((dp, n_pad_shard - B * n), bool)], axis=1
        ).reshape(dp * n_pad_shard)
        return sharded(params, opt_state, x_packed, x_packed, mask, garr)

    return step, pack, part


def _dist_criterion(name: str) -> Callable:
    """Criterion over psum'd (sum_sq, sum_abs, count) masked sums."""
    if name == "mse":
        return lambda s: s[0] / jnp.maximum(s[2], 1.0)
    if name == "mae":
        return lambda s: s[1] / jnp.maximum(s[2], 1.0)
    raise KeyError(f"distributed criterion {name!r} unsupported (mse|mae)")


class DistributedTrainer:
    """Mesh-parallel counterpart of ``train.loop.Trainer`` (same config)."""

    def __init__(
        self,
        model,
        cfg: TrainConfig,
        stats: NormStats,
        template: GraphTemplate,
        mesh: Mesh,
    ):
        self.model = model
        self.cfg = cfg
        self.stats = stats
        self.mesh = mesh
        self.template = template
        dp = mesh.shape["data"]
        assert cfg.batch_size % dp == 0, (
            f"batch_size {cfg.batch_size} not divisible by data axis {dp}"
        )
        self.batch_per_shard = cfg.batch_size // dp
        self.tx = make_optimizer(cfg)

        g = template.batch(1)
        x0 = jnp.zeros((g.n_node, 1), jnp.float32)
        self.params = model.init(jax.random.PRNGKey(cfg.seed), x0, g)
        self.opt_state = self.tx.init(self.params)

        self.step, self.pack, self.part = make_distributed_train_step(
            model,
            self.tx,
            mesh,
            template,
            self.batch_per_shard,
            cfg.mask_rate,
            stats,
            _dist_criterion(cfg.criterion),
        )

    def train_epoch(self, snapshots: np.ndarray, rng: np.random.Generator):
        """snapshots: [S, n] scaled; iterates full dp*B batches."""
        dpB = self.cfg.batch_size
        order = rng.permutation(len(snapshots))
        losses, last_mets = [], {}
        for s in range(0, len(order) - dpB + 1, dpB):
            batch = snapshots[order[s : s + dpB]]
            key = jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1)))
            self.params, self.opt_state, loss, mets = self.step(
                self.params, self.opt_state, self.pack(batch), key
            )
            losses.append(float(loss))
            last_mets = mets
        return (
            float(np.mean(losses)) if losses else math.nan,
            {mk: float(mv) for mk, mv in last_mets.items()},
        )
