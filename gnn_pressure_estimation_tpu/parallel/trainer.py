"""MeshTrainer: the full Trainer (fit/eval/checkpoint/early-stop/scheduler/
scanned epochs) running SPMD over a ``("data", "graph")`` device mesh.

Two partition strategies, selected by template size (the round-1
``DistributedTrainer`` was a bare step harness on the slow segment path —
this subsumes it for the dense/banded production paths):

- **graphs** (templates ≤ ``GraphTemplate.DENSE_THRESHOLD`` nodes): each
  device owns whole graphs of the disjoint-union batch; the single-chip
  dense MXU path runs unchanged per device and GSPMD inserts exactly one
  gradient all-reduce per step.  For same-topology batched training this is
  the communication-optimal layout — node-partitioning a 388-node graph
  would trade a single psum for per-layer exchanges.
- **halo** (larger templates): the RCM band's block-rows are sharded over
  the ``graph`` axis; every layer exchanges only the U left / R right halo
  rows with its ring neighbors over ICI (``parallel/halo.py``) and runs the
  same static banded kernels as one chip.  Per-layer traffic is O(W·C) per
  device, independent of graph size — versus the all-gather fallback's
  O(n_pad·C).

Because both strategies override only the step cores / jit hook, every
Trainer feature (lax.scan epoch staging, AutoClip, ReduceLROnPlateau,
checkpointing, deferred metric syncs, drift logging) works distributed, and
``cli train --mesh dp,gp`` drives it end-to-end.  Results are mesh-shape
invariant up to float reassociation (tested on 2×4 / 4×2 / 8×1 / 1×8 CPU
meshes against the single-device trainer).

The reference has no distributed training at all (SURVEY §2.4); the scaling
contract comes from BASELINE.json ("boundary node features … over ICI
overlapped with local aggregation").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gnn_pressure_estimation_tpu.core.graph import GraphTemplate
from gnn_pressure_estimation_tpu.parallel.halo import build_halo_partition
from gnn_pressure_estimation_tpu.train.loop import TrainConfig, Trainer
from gnn_pressure_estimation_tpu.utils import metrics as metrics_mod
from gnn_pressure_estimation_tpu.utils.masking import batch_node_mask
from gnn_pressure_estimation_tpu.utils.scaling import NormStats, descale_with


def _masked_sums_criterion(name: str):
    """Loss from psum'd masked sums (Σdiff², Σ|diff|, count)."""
    if name == "mse":
        return lambda sq, ab, cnt: sq / jnp.maximum(cnt, 1.0)
    if name == "mae":
        return lambda sq, ab, cnt: ab / jnp.maximum(cnt, 1.0)
    raise KeyError(f"distributed criterion {name!r} unsupported (mse|mae)")


class MeshTrainer(Trainer):
    """Drop-in Trainer over a ``("data", "graph")`` mesh."""

    supports_fast_fit = False  # block dispatch would bypass the mesh cores

    def __init__(
        self,
        model,
        cfg: TrainConfig,
        stats: NormStats,
        sample_template: GraphTemplate,
        mesh: Mesh,
        required_mask_idx: tuple = (),
    ):
        self.mesh = mesh
        self.dp = mesh.shape["data"]
        self.gp = mesh.shape["graph"]
        # Strategy is resolved PER TEMPLATE (multi-dataset loaders mix
        # templates of different sizes — dataset.py SnapshotLoader /
        # BASELINE.json config 5); ``self.strategy`` records the sample
        # template's resolution for introspection and the batch-size guard.
        self._halo_parts: dict = {}
        self.strategy = self._strategy_for(sample_template)
        if self.strategy == "graphs":
            assert cfg.batch_size % (self.dp * self.gp) == 0, (
                f"batch_size {cfg.batch_size} must divide over the "
                f"{self.dp}×{self.gp} mesh (whole-graph shards)"
            )
        else:
            assert cfg.batch_size % self.dp == 0, (
                f"batch_size {cfg.batch_size} not divisible by data axis {self.dp}"
            )
        super().__init__(model, cfg, stats, sample_template, required_mask_idx)

    @staticmethod
    def _strategy_for(template: GraphTemplate) -> str:
        """Whole-graph sharding for dense-path templates, block-row halo
        sharding past the dense threshold — decided per template so one
        mesh run can mix e.g. C-Town-scale and Oosterbeek-scale datasets."""
        large = template.n_node > GraphTemplate.DENSE_THRESHOLD
        return "halo" if large else "graphs"

    # -- graphs strategy: sharding-annotated jit over the flat batch -------
    def _jit_wrap(self, fn, donate, batch_argnums, stacked=False,
                  template=None):
        strat = self._strategy_for(template) if template is not None else self.strategy
        if strat != "graphs":
            # halo cores carry their own shard_map; plain jit suffices
            return super()._jit_wrap(fn, donate, batch_argnums, stacked)
        rep = NamedSharding(self.mesh, P())
        spec = P(None, ("data", "graph"), None) if stacked else P(("data", "graph"), None)
        xsh = NamedSharding(self.mesh, spec)
        import inspect

        n_args = len(inspect.signature(fn).parameters)
        in_sh = tuple(xsh if i in batch_argnums else rep for i in range(n_args))
        return self._with_precision(
            jax.jit(fn, donate_argnums=donate, in_shardings=in_sh,
                    out_shardings=rep)
        )

    # -- halo strategy: shard_map step cores -------------------------------
    def _halo_part(self, template: GraphTemplate):
        key = id(template)
        if key not in self._halo_parts:
            part = build_halo_partition(template, self.gp)
            garr = {
                name: jax.device_put(
                    jnp.asarray(a),
                    NamedSharding(self.mesh, P("graph")),
                )
                for name, a in part.band_arrays.items()
            }
            self._halo_parts[key] = (part, garr)
        return self._halo_parts[key]

    def _halo_forward_parts(self, template: GraphTemplate, bs: int):
        """Shared pieces of the halo train/eval cores.

        ``bs`` may be a tail partial batch not divisible by the data axis;
        the batch is padded to ``bs_pad`` graphs whose masks are all-False —
        the dynamic psum'd count keeps the loss/metrics identical to the
        true-size batch.
        """
        part, garr = self._halo_part(template)
        dp = self.dp
        bs_pad = -(-bs // dp) * dp
        B_local = bs_pad // dp
        n = template.n_node
        perm = jnp.asarray(part.perm)
        n_pad_dist = part.n_pad_dist
        crit = _masked_sums_criterion(self.cfg.criterion)
        stats = self.stats

        def pack(v, fill=0.0):
            """[bs·n, C] original order → [bs_pad, n_pad_dist, C] band order."""
            vb = v.reshape(bs, n, -1)
            vb = jnp.take(vb, perm, axis=1)
            return jnp.pad(
                vb, ((0, bs_pad - bs), (0, n_pad_dist - n), (0, 0)),
                constant_values=fill,
            )

        def local_loss_fn(params, x, y, mask, arrs, prefix):
            """Per-device loss share; differentiable.  Differentiates the
            LOCAL masked sums against the GLOBAL psum'd count — psum'ing a
            loss that itself contains a psum double-counts in the backward
            pass (the transpose of psum is psum)."""
            graph = part.local_graph(arrs, B_local)
            C = x.shape[-1]
            x_flat = x.reshape(-1, C)
            y_flat = y.reshape(-1, C)
            m = mask.reshape(-1, 1).astype(jnp.float32)
            cnt = jax.lax.psum(jnp.sum(m), ("data", "graph"))
            x_in = jnp.where(m > 0, 0.0, x_flat)
            out = self.model.apply(params, x_in, graph,
                                   training=(prefix == "train"))
            diff = (out - y_flat) * m
            local_loss = crit(jnp.sum(diff * diff), jnp.sum(jnp.abs(diff)), cnt)
            loss = jax.lax.psum(local_loss, ("data", "graph"))
            mo = metrics_mod.masked_moments(
                descale_with(out, stats), descale_with(y_flat, stats), m
            )
            mo = jax.lax.psum(mo, ("data", "graph"))
            mets = metrics_mod.metrics_from_moments(mo, prefix)
            # out back to [B_local, chunk, C] so shard_map's rank-3
            # P("data","graph",None) out_spec matches
            return local_loss, (loss, mets, out.reshape(B_local, part.chunk, C))

        return part, garr, pack, local_loss_fn

    def _train_step_core(self, template: GraphTemplate, bs: int):
        if self._strategy_for(template) != "halo":
            return super()._train_step_core(template, bs)
        part, garr, pack, local_loss_fn = self._halo_forward_parts(template, bs)
        n = template.n_node
        mesh, cfg, tx = self.mesh, self.cfg, self.tx

        def local_step(params, opt_state, x, y, mask, arrs):
            grad_fn = jax.value_and_grad(
                lambda p: local_loss_fn(p, x, y, mask, arrs, "train"),
                has_aux=True,
            )
            (_, (loss, mets, _)), grads = grad_fn(params)
            grads = jax.lax.psum(grads, ("data", "graph"))
            if cfg.log_gradient:
                mets = {**mets, "grad_norm": optax.global_norm(grads)}
            updates, opt_state2 = tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return params2, opt_state2, loss, mets

        sharded = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P(), P("data", "graph", None),
                      P("data", "graph", None), P("data", "graph"),
                      {k: P("graph") for k in garr}),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )

        def step(params, opt_state, x, y, key_):
            mask = batch_node_mask(key_, bs, n, cfg.mask_rate)
            mp = pack(mask.astype(jnp.float32)[:, None])[..., 0] > 0.5
            return sharded(params, opt_state, pack(x), pack(y), mp, garr)

        return step

    def _eval_step_core(self, template: GraphTemplate, bs: int,
                        prefix: str = "val"):
        if self._strategy_for(template) != "halo":
            return super()._eval_step_core(template, bs, prefix)
        part, garr, pack, local_loss_fn = self._halo_forward_parts(template, bs)
        n = template.n_node
        mesh, cfg = self.mesh, self.cfg
        req = self.required_mask_idx

        def local_step(params, x, y, mask, arrs):
            _, (loss, mets, out) = local_loss_fn(params, x, y, mask, arrs, prefix)
            return loss, mets, out

        sharded = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P("data", "graph", None), P("data", "graph", None),
                      P("data", "graph"), {k: P("graph") for k in garr}),
            out_specs=(P(), P(), P("data", "graph", None)),
            check_vma=False,
        )

        def step(params, x, y, key_):
            mask = batch_node_mask(key_, bs, n, cfg.mask_rate, required_idx=req)
            mp = pack(mask.astype(jnp.float32)[:, None])[..., 0] > 0.5
            loss, mets, out = sharded(params, pack(x), pack(y), mp, garr)
            return loss, mets, out, mask

        return step


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host entry: ``jax.distributed.initialize`` with explicit or
    env-provided (TPU pod) coordinates.  Call once per host before building
    the mesh; ``jax.devices()`` then spans all hosts and the same
    MeshTrainer code runs DP over DCN / halo over ICI."""
    kwargs = {}
    if coordinator:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
