"""Jitted training / validation loop for masked-node pressure reconstruction.

Reference parity (train.py:112-533) with a TPU-first redesign:

- The entire step — mask draw, input zeroing, forward, masked loss, backward,
  AutoClip, Adam update, descaled metrics — is **one jitted function**; the
  reference regenerates masks with host NumPy and syncs every batch
  (train.py:171-183).
- The masked-node count is static (``int(n * mask_rate)`` per graph), so
  masked gathers have static shapes and XLA compiles a single program per
  (template, batch-size) bucket.
- Optimizer: Adam with torch-style L2 weight decay (grad += wd·param before
  the moment update — torch.optim.Adam semantics, train.py:348) behind
  ``optax.inject_hyperparams`` so ReduceLROnPlateau can anneal the lr without
  rebuilding state.
"""

from __future__ import annotations

import dataclasses
import math
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn

from gnn_pressure_estimation_tpu.core.graph import BatchedGraph, GraphTemplate
from gnn_pressure_estimation_tpu.data.dataset import WDNDataset, SnapshotLoader
from gnn_pressure_estimation_tpu.train.autoclip import autoclip
from gnn_pressure_estimation_tpu.train.early_stopping import EarlyStopping
from gnn_pressure_estimation_tpu.train.checkpoint import save_checkpoint
from gnn_pressure_estimation_tpu.utils import metrics as metrics_mod
from gnn_pressure_estimation_tpu.utils.masking import batch_node_mask, masked_count
from gnn_pressure_estimation_tpu.utils.scaling import NormStats, descale_with


@dataclasses.dataclass
class TrainConfig:
    """The reference's training flag surface (train.py:541-648) as a typed
    config."""

    lr: float = 5e-4
    weight_decay: float = 6e-6
    epochs: int = 500
    mask_rate: float = 0.95
    batch_size: int = 8
    criterion: str = "mse"           # mse | mae | sce
    norm_type: str = "znorm"
    patience: int = 100
    min_delta: float = 1e-4
    scheduler: Optional[str] = None  # None | "ReduceLROnPlateau"
    scheduler_patience: int = 2
    scheduler_factor: float = 0.1
    use_gradient_clipping: bool = False
    clip_percentile: float = 10.0
    seed: int = 42
    save_path: Optional[str] = None
    model_name: str = "model"
    variant: str = ""
    log_every: int = 5
    # gradient observability (reference train.py:477-504 + auxil.py:295-313:
    # total/block gradient norms and model-update drift vs epoch 1)
    log_gradient: bool = False
    # TPU knobs (no reference analog)
    matmul_precision: Optional[str] = None  # None | "bfloat16" | "highest"
    donate_state: bool = True
    # >1 = run that many epochs (train + val) per device dispatch with the
    # dataset resident on device — amortizes host→device dispatch latency
    # (the dominant cost of WDN-scale epochs on a remote TPU). Best-epoch
    # checkpoints then hold block-end params (see Trainer._fit_fast).
    epochs_per_dispatch: int = 1
    # aggregation-mode override for the batched template: None = auto
    # (dense ≤ DENSE_THRESHOLD nodes, banded above) | "dense" | "banded" |
    # "padded".  band_block sets the banded block-row size (default 256) —
    # small graphs with a narrow RCM band can beat the dense n² path with
    # band_block 64-128 (n_pad·W < n² bytes on the attention chain).
    agg_mode: Optional[str] = None
    band_block: Optional[int] = None


def make_criterion(name: str) -> Callable:
    """Loss on *scaled* masked values (reference train.py:354-368)."""
    if name == "mse":
        return lambda p, t: jnp.mean((p - t) ** 2)
    if name == "mae":
        return lambda p, t: jnp.mean(jnp.abs(p - t))
    if name == "sce":
        def sce(p, t, alpha=3.0):
            pn = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
            tn = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
            return jnp.mean((1.0 - jnp.sum(pn * tn, axis=-1)) ** alpha)
        return sce
    raise KeyError(f"criterion {name!r} is not supported")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    parts = []
    if cfg.use_gradient_clipping:
        parts.append(autoclip(cfg.clip_percentile))
    if cfg.weight_decay:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts.append(optax.scale_by_adam())
    inner = optax.chain(*parts) if parts else optax.identity()
    lr_part = optax.inject_hyperparams(
        lambda learning_rate: optax.scale_by_learning_rate(learning_rate)
    )(learning_rate=cfg.lr)
    return optax.chain(inner, lr_part)


def get_lr(opt_state) -> float:
    return float(opt_state[-1].hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    opt_state[-1].hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics (mode=min,
    rel threshold 1e-4, factor, patience) — reference train.py:349-350."""

    def __init__(self, patience: int = 2, factor: float = 0.1,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = math.inf
        self.num_bad = 0

    def step(self, metric: float, lr: float) -> float:
        metric = float(metric)
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(lr * self.factor, self.min_lr)
        return lr

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, state: dict):
        self.best = float(state.get("best", math.inf))
        self.num_bad = int(state.get("num_bad", 0))


class Trainer:
    """Drives train/val epochs over a :class:`WDNDataset`.

    One jitted step function is compiled per (template, batch-size) bucket and
    cached for the whole run.
    """

    # the multi-epoch block dispatch builds single-device programs; mesh
    # subclasses opt out so --mesh training keeps its sharded step cores
    supports_fast_fit = True

    def __init__(
        self,
        model: nn.Module,
        cfg: TrainConfig,
        stats: NormStats,
        sample_template: GraphTemplate,
        required_mask_idx: tuple = (),
    ):
        self.model = model
        self.cfg = cfg
        self.stats = stats
        self.criterion = make_criterion(cfg.criterion)
        self.tx = make_optimizer(cfg)
        self.required_mask_idx = tuple(required_mask_idx)
        self._train_step_cache: dict = {}
        self._eval_step_cache: dict = {}
        self._epoch_cache: dict = {}
        self._graph_cache: dict = {}

        g = sample_template.batch(1)
        x0 = jnp.zeros((g.n_node, 1), jnp.float32)
        self.params = self.model.init(jax.random.PRNGKey(cfg.seed), x0, g)
        self.opt_state = self.tx.init(self.params)
        self.n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))

    # ------------------------------------------------------------------
    def _batched_graph(self, template: GraphTemplate, bs: int) -> BatchedGraph:
        key = (id(template), bs)
        if key not in self._graph_cache:
            self._graph_cache[key] = template.batch(
                bs, mode=self.cfg.agg_mode, band_block=self.cfg.band_block
            )
        return self._graph_cache[key]

    def _masked_loss_and_metrics(self, params, graph, x, y, mask, n_masked, prefix):
        """``n_masked=None`` uses the dynamic masked count (needed when a
        padded tail batch zeroes whole graphs' masks; identical numerics to
        the static count otherwise — the float sum of 0/1 flags is exact)."""
        x_in = jnp.where(mask[:, None], 0.0, x)
        out = self.model.apply(params, x_in, graph, training=(prefix == "train"))
        if self.cfg.criterion in ("mse", "mae"):
            # mask-weighted formulation: no nonzero/gather in the hot path;
            # metrics from masked moments (algebraically identical to the
            # gathered formulas — see utils/metrics.py)
            mask_f = mask.astype(jnp.float32)[:, None]
            if n_masked is None:
                n_masked = jnp.maximum(jnp.sum(mask_f), 1.0)
            diff = (out - y) * mask_f
            if self.cfg.criterion == "mse":
                loss = jnp.sum(diff * diff) / n_masked
            else:
                loss = jnp.sum(jnp.abs(diff)) / n_masked
            st = self.stats
            mo = metrics_mod.masked_moments(
                descale_with(out, st), descale_with(y, st), mask_f
            )
            mets = metrics_mod.metrics_from_moments(mo, prefix)
            return loss, mets, out
        (midx,) = jnp.nonzero(mask, size=n_masked)
        yp, yt = out[midx], y[midx]
        loss = self.criterion(yp, yt)
        st = self.stats
        yp_r = descale_with(yp, st)
        yt_r = descale_with(yt, st)
        mets = metrics_mod.compute_all(yp_r, yt_r, prefix)
        return loss, mets, out

    def _train_step_core(self, template: GraphTemplate, bs: int):
        """The un-jitted single-step function shared by the per-step and
        scanned-epoch paths (one traced body → identical semantics)."""
        graph = self._batched_graph(template, bs)
        n = template.n_node
        k = masked_count(n, self.cfg.mask_rate)
        n_masked = bs * k

        def step(params, opt_state, x, y, key_):
            mask = batch_node_mask(key_, bs, n, self.cfg.mask_rate)
            if graph.banded:
                # banded graphs run in RCM-permuted padded node space
                x = graph.pack_nodes(x, n)
                y = graph.pack_nodes(y, n)
                mask = graph.pack_nodes(
                    mask.astype(jnp.float32)[:, None], n
                )[:, 0] > 0.5

            def loss_fn(p):
                loss, mets, _ = self._masked_loss_and_metrics(
                    p, graph, x, y, mask, n_masked, "train"
                )
                return loss, mets

            (loss, mets), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if self.cfg.log_gradient:
                # total + per-block gradient norms (reference tracks modules
                # named block/mlp/res — auxil.py:295-313)
                block_norms = {
                    name: optax.global_norm(sub)
                    for name, sub in grads["params"].items()
                    if any(tag in name.lower() for tag in ("block", "mlp", "res", "gcn"))
                }
                mets = {**mets, "grad_norm": optax.global_norm(grads),
                        **{f"grad_norm_{mk}": mv for mk, mv in block_norms.items()}}
            updates, opt_state2 = self.tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return params2, opt_state2, loss, mets

        return step

    def _jit_wrap(self, fn, donate: tuple, batch_argnums: tuple,
                  stacked: bool = False, template: GraphTemplate = None):
        """Jit hook: subclasses (MeshTrainer) attach input/output shardings
        here; ``batch_argnums`` are the snapshot-batch args, ``stacked`` marks
        the scanned-epoch layout ([S, bs·n, 1] vs [bs·n, 1]), and ``template``
        lets the subclass pick a per-template partition strategy in
        multi-dataset runs (dataset.py mixes templates in one loader)."""
        return self._with_precision(jax.jit(fn, donate_argnums=donate))

    def _with_precision(self, fn):
        """Apply cfg.matmul_precision at trace time (jit traces on first
        call, so wrapping the jitted callable bakes the precision into the
        lowered dots)."""
        if not self.cfg.matmul_precision:
            return fn
        prec = self.cfg.matmul_precision

        def wrapped(*args):
            with jax.default_matmul_precision(prec):
                return fn(*args)

        return wrapped

    def _get_train_step(self, template: GraphTemplate, bs: int):
        key = (id(template), bs)
        if key in self._train_step_cache:
            return self._train_step_cache[key]
        donate = (0, 1) if self.cfg.donate_state else ()
        step = self._jit_wrap(
            self._train_step_core(template, bs), donate, (2, 3),
            template=template,
        )
        self._train_step_cache[key] = step
        return step

    def _get_train_epoch(self, template: GraphTemplate, bs: int, n_steps: int):
        """One jitted ``lax.scan`` over ``n_steps`` training steps.

        The whole epoch's batches are staged on device as one ``[S, bs*n, 1]``
        array and dispatched in a single call — the per-step path pays a
        host→device dispatch round-trip per batch (~hundreds of ms through a
        remote-TPU tunnel), which dominates the ~7 ms step compute at WDN
        scale. The reference loops batches on the host (train.py:171-183).
        """
        key = (id(template), bs, n_steps)
        if key in self._epoch_cache:
            return self._epoch_cache[key]
        step_core = self._train_step_core(template, bs)
        donate = (0, 1) if self.cfg.donate_state else ()

        def epoch(params, opt_state, xs, key_):
            keys = jax.random.split(key_, n_steps)

            def body(carry, inp):
                p, s = carry
                x, k_ = inp
                p, s, loss, mets = step_core(p, s, x, x, k_)
                return (p, s), (loss, mets)

            (params, opt_state), (losses, mets) = jax.lax.scan(
                body, (params, opt_state), (xs, keys)
            )
            # reduce on device: one scalar pytree back to host per epoch
            return params, opt_state, jnp.mean(losses), {
                mk: jnp.mean(mv) for mk, mv in mets.items()
            }

        epoch = self._jit_wrap(epoch, donate, (2,), stacked=True,
                               template=template)
        self._epoch_cache[key] = epoch
        return epoch

    def _get_eval_epoch(self, template: GraphTemplate, bs: int, n_steps: int,
                        prefix: str = "val"):
        """Scanned evaluation epoch (loss/metric means only; the per-step
        outputs are dead code the compiler eliminates)."""
        key = (id(template), bs, n_steps, prefix, self.required_mask_idx)
        if key in self._epoch_cache:
            return self._epoch_cache[key]
        step_core = self._eval_step_core(template, bs, prefix)

        def epoch(params, xs, key_):
            keys = jax.random.split(key_, n_steps)

            def body(carry, inp):
                x, k_ = inp
                loss, mets, _, _ = step_core(params, x, x, k_)
                return carry, (loss, mets)

            _, (losses, mets) = jax.lax.scan(body, None, (xs, keys))
            return jnp.mean(losses), {mk: jnp.mean(mv) for mk, mv in mets.items()}

        epoch = self._jit_wrap(epoch, (), (1,), stacked=True,
                               template=template)
        self._epoch_cache[key] = epoch
        return epoch

    def _eval_step_core(self, template: GraphTemplate, bs: int,
                        prefix: str = "val"):
        """Un-jitted eval step shared by the per-step and scanned paths."""
        graph = self._batched_graph(template, bs)
        n = template.n_node
        k = masked_count(n, self.cfg.mask_rate)
        n_masked = bs * k
        req = self.required_mask_idx

        def step(params, x, y, key_):
            mask = batch_node_mask(key_, bs, n, self.cfg.mask_rate, required_idx=req)
            if graph.banded:
                x = graph.pack_nodes(x, n)
                y = graph.pack_nodes(y, n)
                mask = graph.pack_nodes(
                    mask.astype(jnp.float32)[:, None], n
                )[:, 0] > 0.5
            loss, mets, out = self._masked_loss_and_metrics(
                params, graph, x, y, mask, n_masked, prefix
            )
            return loss, mets, out, mask

        return step

    def _get_eval_step(self, template: GraphTemplate, bs: int, prefix: str = "val"):
        key = (id(template), bs, prefix, self.required_mask_idx)
        if key in self._eval_step_cache:
            return self._eval_step_cache[key]
        step = self._jit_wrap(
            self._eval_step_core(template, bs, prefix), (), (1, 2),
            template=template,
        )
        self._eval_step_cache[key] = step
        return step

    # -- multi-epoch block dispatch (epochs_per_dispatch > 1) ----------
    def _get_epoch_block(self, template: GraphTemplate, bs: int,
                         steps_tr: int, steps_val: int, E: int):
        """E full epochs — train steps + validation — in ONE jitted dispatch.

        The scanned-epoch path still pays ~4 host→device dispatch round
        trips per epoch (train scan, tail, val scan, tail) plus the batch
        staging transfer; through a remote-TPU tunnel that overhead (~3.4 s)
        dwarfs the ~0.4 s of step compute at WDN scale.  Here the snapshot
        arrays live on the device once, each dispatch receives only [E,
        steps, bs] permutation indices, and a scan-of-scans runs E epochs
        back to back, returning per-epoch losses/metrics.  Tail batches are
        padded to ``bs`` with whole-graph-zeroed masks (dynamic masked-count
        denominator keeps the numerics identical to the true-size batch).
        """
        key = (id(template), bs, steps_tr, steps_val, E, self.required_mask_idx)
        if key in self._epoch_cache:
            return self._epoch_cache[key]
        graph = self._batched_graph(template, bs)
        n = template.n_node
        cfg = self.cfg
        req = self.required_mask_idx
        donate = (0, 1) if cfg.donate_state else ()

        def prep(data, idx, mask_key, valid, required):
            """Gather the batch + draw its mask (pad graphs fully unmasked)."""
            x = data[idx].reshape(bs * n, 1)
            mask = batch_node_mask(mask_key, bs, n, cfg.mask_rate,
                                   required_idx=required)
            mask = mask & jnp.repeat(valid > 0.5, n)
            if graph.banded:
                x = graph.pack_nodes(x, n)
                mask = graph.pack_nodes(
                    mask.astype(jnp.float32)[:, None], n
                )[:, 0] > 0.5
            return x, mask

        def block(params, opt_state, data_tr, data_val,
                  perms, valid_tr, valid_val, ekeys):
            # ekeys [E, 2]: one per-epoch key derived by the caller from
            # (seed, epoch) — block boundaries don't affect the streams

            def epoch_body(carry, inp):
                params, opt_state = carry
                perm_e, ke = inp
                ktr, kval = jax.random.split(ke)

                def tstep(c, si):
                    p, o = c
                    idx, vld, kk = si
                    x, mask = prep(data_tr, idx, kk, vld, None)

                    def loss_fn(pp):
                        loss, mets, _ = self._masked_loss_and_metrics(
                            pp, graph, x, x, mask, None, "train")
                        return loss, mets

                    (loss, mets), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(p)
                    updates, o2 = self.tx.update(grads, o, p)
                    p2 = optax.apply_updates(p, updates)
                    return (p2, o2), (loss, mets)

                tkeys = jax.random.split(ktr, steps_tr)
                (params, opt_state), (tr_losses, tr_mets) = jax.lax.scan(
                    tstep, (params, opt_state),
                    (perm_e, valid_tr, tkeys),
                )

                def vstep(c, si):
                    idx, vld, kk = si
                    x, mask = prep(data_val, idx, kk, vld, req)
                    loss, mets, _ = self._masked_loss_and_metrics(
                        params, graph, x, x, mask, None, "val")
                    return c, (loss, mets)

                vkeys = jax.random.split(kval, steps_val)
                vidx = jnp.arange(steps_val * bs).reshape(steps_val, bs)
                vidx = jnp.minimum(vidx, data_val.shape[0] - 1)
                _, (val_losses, val_mets) = jax.lax.scan(
                    vstep, None, (vidx, valid_val, vkeys))

                def wmean(losses, valid):
                    w = jnp.sum(valid, axis=1)
                    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)

                out = (
                    wmean(tr_losses, valid_tr),
                    wmean(val_losses, valid_val),
                    {mk: wmean(mv, valid_tr) for mk, mv in tr_mets.items()},
                    {mk: wmean(mv, valid_val) for mk, mv in val_mets.items()},
                )
                return (params, opt_state), out

            (params, opt_state), (tr, val, tr_mets, val_mets) = jax.lax.scan(
                epoch_body, (params, opt_state), (perms, ekeys))
            return params, opt_state, tr, val, tr_mets, val_mets

        block = self._jit_wrap(block, donate, (), template=template)
        self._epoch_cache[key] = block
        return block

    @staticmethod
    def _block_layout(S: int, bs: int):
        """(steps, valid [steps, bs]) for one pass over S samples with the
        tail padded to a full batch of zero-weight graphs."""
        steps = max(-(-S // bs), 1)
        valid = np.ones((steps, bs), np.float32)
        t = S - (steps - 1) * bs
        if t < bs:
            valid[-1, t:] = 0.0
        return steps, valid

    def _fit_fast(self, train_ds, val_ds, log_fn, on_epoch_end,
                  early, sched, best, start_epoch: int = 1):
        """Multi-epoch-dispatch drive of fit() (cfg.epochs_per_dispatch > 1).

        Checkpoint/scheduler/early-stop decisions happen at block
        granularity: the params saved for a best epoch inside a block are
        the block-end params (documented trade-off of the fast path), and
        the 'best' write is deferred to block end so the stored
        early-stop/scheduler state always matches ``params_epoch``.

        Per-epoch shuffles and mask keys are derived from (seed, epoch), not
        block position, so a resumed run replays the same per-epoch streams
        regardless of how block boundaries fall.
        """
        cfg = self.cfg
        m_tr, m_val = train_ds.members[0], val_ds.members[0]
        template = m_tr.template
        bs = cfg.batch_size
        S_tr, S_val = len(m_tr.array), len(m_val.array)
        steps_tr, valid_tr = self._block_layout(S_tr, bs)
        steps_val, valid_val = self._block_layout(S_val, bs)
        data_tr = jnp.asarray(m_tr.array)
        data_val = jnp.asarray(m_val.array)
        valid_tr = jnp.asarray(valid_tr)
        valid_val = jnp.asarray(valid_val)
        base_key = jax.random.PRNGKey(cfg.seed)

        t0 = time.time()
        epoch = start_epoch
        stop = False
        while epoch <= cfg.epochs and not stop:
            best_dirty = False
            E = min(cfg.epochs_per_dispatch, cfg.epochs - epoch + 1)
            block = self._get_epoch_block(template, bs, steps_tr, steps_val, E)
            perms = np.zeros((E, steps_tr, bs), np.int32)
            for e in range(E):
                order = np.random.default_rng([cfg.seed, epoch + e]).permutation(S_tr)
                pad = (-len(order)) % (steps_tr * bs)
                order = np.concatenate([order, np.zeros(pad, np.int64)])
                perms[e] = order.reshape(steps_tr, bs)
            ekeys = jnp.stack(
                [jax.random.fold_in(base_key, epoch + e) for e in range(E)]
            )
            (self.params, self.opt_state, trs, vals,
             tr_mets, val_mets) = block(
                self.params, self.opt_state, data_tr, data_val,
                jnp.asarray(perms), valid_tr, valid_val, ekeys,
            )
            trs = np.asarray(trs)
            vals = np.asarray(vals)
            tr_mets = {mk: np.asarray(mv) for mk, mv in tr_mets.items()}
            val_mets = {mk: np.asarray(mv) for mk, mv in val_mets.items()}
            for j in range(E):
                ep = epoch + j
                tr_loss, val_loss = float(trs[j]), float(vals[j])
                vm = {mk: float(mv[j]) for mk, mv in val_mets.items()}
                tm = {mk: float(mv[j]) for mk, mv in tr_mets.items()}
                stop = early.step(val_loss)
                if not stop and sched is not None:
                    new_lr = sched.step(val_loss, get_lr(self.opt_state))
                    if new_lr != get_lr(self.opt_state):
                        self.opt_state = set_lr(self.opt_state, new_lr)
                if val_loss < best["loss"]:
                    best.update({"loss": val_loss, "epoch": ep, "metrics": vm})
                    best_dirty = True
                if ep == 1 or ep % cfg.log_every == 0:
                    mstr = ", ".join(f"{mk}: {mv:.4f}" for mk, mv in vm.items())
                    log_fn(f"Epoch: {ep:03d}, train loss: {tr_loss:.4f}, "
                           f"val_loss: {val_loss:.4f}, {mstr}")
                if cfg.save_path and not math.isnan(tr_loss) and (
                        j == E - 1 or stop):
                    # block-end params are the only ones on the host, so the
                    # fast path writes 'last' once per block (mid-block
                    # writes would serialize identical params repeatedly)
                    save_checkpoint(
                        path=self._ckpt_path("last"), params=self.params,
                        opt_state=self.opt_state, epoch=ep, loss=val_loss,
                        metrics=vm, stats=self.stats,
                        extra=self._resume_extra(early, sched, best,
                                                 params_epoch=epoch + E - 1),
                    )
                if on_epoch_end:
                    on_epoch_end(ep, {"train_loss": tr_loss,
                                      "val_loss": val_loss, **tm, **vm})
                if stop:
                    log_fn(f"\n!! No improvement for {cfg.patience} epochs. "
                           "Training stopped!")
                    break
            if best_dirty and cfg.save_path:
                # Deferred to block end so the stored early-stop/scheduler
                # state matches params_epoch: the block-end params are the
                # only ones on the host, and a mid-block write would pair
                # them with mid-block early/sched state (resume skew).
                save_checkpoint(
                    path=self._ckpt_path("best"), params=self.params,
                    opt_state=self.opt_state, epoch=best["epoch"],
                    loss=best["loss"], metrics=best["metrics"],
                    stats=self.stats,
                    extra=self._resume_extra(early, sched, best,
                                             params_epoch=epoch + E - 1),
                )
            epoch += E
        best["train_time_s"] = time.time() - t0
        return best

    # ------------------------------------------------------------------
    @staticmethod
    def _reduce_batch_stats(per_batch: list) -> tuple[float, dict]:
        """(bs, loss, mets) device scalars → weighted epoch means, converting
        to host floats only once (per-step float() would force a device sync
        every batch — measured ~0.7 s/step of pure dispatch stall through the
        remote TPU tunnel)."""
        n = max(sum(bs for bs, _, _ in per_batch), 1)
        total = 0.0
        sums: dict[str, float] = {}
        for bs, loss, mets in per_batch:
            total += float(loss) * bs
            for mk, mv in mets.items():
                sums[mk] = sums.get(mk, 0.0) + float(mv) * bs
        return total / n, {mk: v / n for mk, v in sums.items()}

    @staticmethod
    def _group_batches(loader: SnapshotLoader):
        """Group the epoch's batches by (template, batch-size) so each group
        can run as one scanned device program; singleton groups fall back to
        the per-step path (e.g. the tail partial batch).

        Multi-template epochs return ``None``: grouping would serialize each
        template's batches into one block, defeating the loader's deliberate
        cross-member interleaving (dataset.py SnapshotLoader) — those epochs
        run per-step in the loader's own shuffled order.
        """
        groups: dict = {}
        templates = set()
        batches = []
        for template, xb, _ in loader:
            templates.add(id(template))
            batches.append((template, xb))
            k = (id(template), xb.shape[0])
            groups.setdefault(k, (template, []))[1].append(xb)
        if len(templates) > 1:
            return None, batches
        return groups, batches

    def train_one_epoch(self, loader: SnapshotLoader, rng: np.random.Generator):
        per_batch = []
        groups, batches = self._group_batches(loader)
        if groups is None:  # multi-template: per-step in loader order
            for template, xb in batches:
                bs = xb.shape[0]
                x = jnp.asarray(xb.reshape(-1, 1))
                step = self._get_train_step(template, bs)
                key = jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1)))
                self.params, self.opt_state, loss, mets = step(
                    self.params, self.opt_state, x, x, key
                )
                per_batch.append((bs, loss, mets))
            return self._reduce_batch_stats(per_batch)
        for (_, bs), (template, xbs) in groups.items():
            S = len(xbs)
            key = jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1)))
            if S > 1:
                epoch_fn = self._get_train_epoch(template, bs, S)
                xs = jnp.asarray(np.stack(xbs).reshape(S, -1, 1))
                self.params, self.opt_state, loss, mets = epoch_fn(
                    self.params, self.opt_state, xs, key
                )
                per_batch.append((S * bs, loss, mets))
            else:
                x = jnp.asarray(xbs[0].reshape(-1, 1))
                step = self._get_train_step(template, bs)
                self.params, self.opt_state, loss, mets = step(
                    self.params, self.opt_state, x, x, key
                )
                per_batch.append((bs, loss, mets))  # async device scalars
        return self._reduce_batch_stats(per_batch)

    def eval_one_epoch(self, loader: SnapshotLoader, rng: np.random.Generator,
                       prefix: str = "val"):
        per_batch = []
        groups, batches = self._group_batches(loader)
        if groups is None:  # multi-template: per-step in loader order
            for template, xb in batches:
                bs = xb.shape[0]
                x = jnp.asarray(xb.reshape(-1, 1))
                step = self._get_eval_step(template, bs, prefix)
                key = jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1)))
                loss, mets, _, _ = step(self.params, x, x, key)
                per_batch.append((bs, loss, mets))
            return self._reduce_batch_stats(per_batch)
        for (_, bs), (template, xbs) in groups.items():
            S = len(xbs)
            key = jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1)))
            if S > 1:
                epoch_fn = self._get_eval_epoch(template, bs, S, prefix)
                xs = jnp.asarray(np.stack(xbs).reshape(S, -1, 1))
                loss, mets = epoch_fn(self.params, xs, key)
                per_batch.append((S * bs, loss, mets))
            else:
                x = jnp.asarray(xbs[0].reshape(-1, 1))
                step = self._get_eval_step(template, bs, prefix)
                loss, mets, _, _ = step(self.params, x, x, key)
                per_batch.append((bs, loss, mets))
        return self._reduce_batch_stats(per_batch)

    # ------------------------------------------------------------------
    def fit(
        self,
        train_ds: WDNDataset,
        val_ds: WDNDataset,
        log_fn: Callable[[str], None] = print,
        on_epoch_end: Optional[Callable[[int, dict], None]] = None,
    ) -> dict:
        cfg = self.cfg
        train_loader = SnapshotLoader(
            train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed
        )
        val_loader = SnapshotLoader(val_ds, cfg.batch_size, shuffle=False)

        early = EarlyStopping(mode="min", min_delta=cfg.min_delta, patience=cfg.patience)
        sched = (
            ReduceLROnPlateau(cfg.scheduler_patience, cfg.scheduler_factor)
            if cfg.scheduler == "ReduceLROnPlateau"
            else None
        )

        # model-update drift vs epoch 1 (reference train.py:477-494 logs
        # mean |out - first_out|; there `out` is the last *train* batch whose
        # input changes per epoch — here a fixed probe batch makes the drift
        # well-defined)
        probe = drift_ref = None
        accum_update = 0.0
        if cfg.log_gradient:
            for template, xb, _ in val_loader:
                probe = (template, xb.shape[0], jnp.asarray(xb.reshape(-1, 1)))
                break
            # one jitted forward reused every epoch (a fresh jax.jit wrapper
            # per epoch would recompile the probe each time)
            probe_fwd = jax.jit(self.model.apply)

        best = {"loss": math.inf, "epoch": 0, "metrics": {}}

        # true resume (fixes the reference's weights-only reload,
        # auxil.py:206-220): restore() stashes the checkpoint's epoch,
        # early-stop, scheduler, and best-so-far state; per-epoch randomness
        # is derived from (seed, epoch) rather than sequential rng state, so
        # the continuation replays exactly what an uninterrupted run would
        start_epoch = 1
        rs = getattr(self, "_resume", None)
        if rs:
            start_epoch = int(rs["epoch"]) + 1
            if rs.get("early"):
                early.load_state_dict(rs["early"])
            if sched is not None and rs.get("sched"):
                sched.load_state_dict(rs["sched"])
            if rs.get("best"):
                best.update(rs["best"])

        if (cfg.epochs_per_dispatch > 1 and self.supports_fast_fit
                and len(train_ds.members) == 1 and len(val_ds.members) == 1
                and train_ds.members[0].template is val_ds.members[0].template
                and cfg.criterion in ("mse", "mae")
                and probe is None):
            return self._fit_fast(train_ds, val_ds, log_fn, on_epoch_end,
                                  early, sched, best, start_epoch)

        t0 = time.time()
        for epoch in range(start_epoch, cfg.epochs + 1):
            train_loader.set_epoch(epoch)
            rng_tr = np.random.default_rng([cfg.seed, epoch, 0])
            rng_val = np.random.default_rng([cfg.seed, epoch, 1])
            tr_loss, tr_mets = self.train_one_epoch(train_loader, rng_tr)
            val_loss, val_mets = self.eval_one_epoch(val_loader, rng_val)

            if probe is not None:
                template, bs, x = probe
                graph = self._batched_graph(template, bs)
                xp = graph.pack_nodes(x, template.n_node) if graph.banded else x
                out = probe_fwd(self.params, xp, graph)
                if drift_ref is None:
                    drift_ref, model_update = out, 0.0
                else:
                    model_update = float(jnp.mean(jnp.abs(out - drift_ref)))
                accum_update += model_update
                tr_mets = {**tr_mets, "model_update": model_update,
                           "accum_model_update": accum_update}

            # step early-stop/scheduler BEFORE checkpointing, so the saved
            # resume state is exactly what an uninterrupted run carries into
            # epoch+1 (post-step) — resuming then continues bit-identically
            stop = early.step(val_loss)
            if not stop and sched is not None:
                new_lr = sched.step(val_loss, get_lr(self.opt_state))
                if new_lr != get_lr(self.opt_state):
                    self.opt_state = set_lr(self.opt_state, new_lr)

            if val_loss < best["loss"]:
                best = {"loss": val_loss, "epoch": epoch, "metrics": val_mets}
                if cfg.save_path:
                    save_checkpoint(
                        path=self._ckpt_path("best"),
                        params=self.params,
                        opt_state=self.opt_state,
                        epoch=epoch,
                        loss=val_loss,
                        metrics=val_mets,
                        stats=self.stats,
                        extra=self._resume_extra(early, sched, best),
                    )

            if epoch == 1 or epoch % cfg.log_every == 0:
                mstr = ", ".join(f"{mk}: {mv:.4f}" for mk, mv in val_mets.items())
                log_fn(
                    f"Epoch: {epoch:03d}, train loss: {tr_loss:.4f}, "
                    f"val_loss: {val_loss:.4f}, {mstr}"
                )
            # 'last' is written every epoch (not just log epochs) so an
            # interrupted run loses at most the in-flight epoch
            if cfg.save_path and not math.isnan(tr_loss):
                save_checkpoint(
                    path=self._ckpt_path("last"),
                    params=self.params,
                    opt_state=self.opt_state,
                    epoch=epoch,
                    loss=val_loss,
                    metrics=val_mets,
                    stats=self.stats,
                    extra=self._resume_extra(early, sched, best),
                )

            if on_epoch_end:
                on_epoch_end(epoch, {
                    "train_loss": tr_loss, "val_loss": val_loss,
                    **tr_mets, **val_mets,
                })

            if stop:
                log_fn(f"\n!! No improvement for {cfg.patience} epochs. Training stopped!")
                break

        best["train_time_s"] = time.time() - t0
        return best

    def _resume_extra(self, early, sched, best, params_epoch=None) -> dict:
        """Serializable continuation state stored in every checkpoint, plus
        the aggregation layout the model was trained under (so evaluation
        can default to the same layout).

        ``params_epoch`` is the epoch the stored *params* correspond to when
        it differs from the checkpoint's reporting epoch: the fast path's
        jitted block applies all E epochs before any host-side checkpoint
        can be written, so a mid-block 'best'/early-stop write holds
        block-end params — resume must continue from the block end, not the
        reporting epoch, or it would re-apply already-trained epochs."""
        return {
            "resume": {
                "early": early.state_dict(),
                "sched": sched.state_dict() if sched is not None else None,
                "best": {"loss": best["loss"], "epoch": best["epoch"],
                         "metrics": best.get("metrics", {})},
                **({"params_epoch": int(params_epoch)}
                   if params_epoch is not None else {}),
            },
            "layout": {"agg_mode": self.cfg.agg_mode,
                       "band_block": self.cfg.band_block},
        }

    def restore(self, path: str, log_fn: Callable[[str], None] = print):
        """Full-state resume from a checkpoint written by this Trainer:
        params, optimizer state, epoch counter, early-stop / scheduler /
        best-so-far state (the reference restores weights only,
        auxil.py:206-220). Old weights-only checkpoints still load — they
        just restart bookkeeping from scratch at epoch meta['epoch']+1."""
        from gnn_pressure_estimation_tpu.train.checkpoint import load_checkpoint

        params, opt_state, meta = load_checkpoint(path, self.params, self.opt_state)
        self.params = params
        if opt_state is not None:
            self.opt_state = opt_state
        else:
            log_fn(f"WARNING: {path} has no optimizer state; Adam moments reset")
        rs = (meta.get("extra") or {}).get("resume") or {}
        # fast-path checkpoints hold block-end params: continue from the
        # epoch the params actually correspond to (see _resume_extra)
        epoch = max(int(meta.get("epoch", 0)), int(rs.get("params_epoch") or 0))
        self._resume = {**rs, "epoch": epoch}
        return meta

    def _ckpt_path(self, kind: str) -> str:
        import os

        name = f"{kind}_{self.cfg.model_name}"
        if self.cfg.variant:
            name += f"_{self.cfg.variant}"
        return os.path.join(self.cfg.save_path, name + ".ckpt")
