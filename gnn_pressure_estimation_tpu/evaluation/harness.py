"""Multi-trial statistical evaluation harness.

Reference parity (evaluation.py:240-803):

- ``clean``:    N mask redraws over a fixed snapshot dataset
- ``noisy11``:  N noise scenes (online re-simulation), 1 mask each
- ``noisyNN``:  N noise scenes × N masks (N² runs)
- every trial reports all-nodes *and* sensors-only passes
  (``test_and_collect_once``, evaluation.py:525-598); sensors come from an
  optional secrets plug-in or an explicit name list and are always-masked
- metrics: the 7-metric suite on descaled values, plus ``test_time`` (ms per
  snapshot) and ``test_throughput`` measured after warm-up on trial 0
- aggregation: mean ± (std + 1e-6) across trials (evaluation.py:739-761)

TPU redesign: masks are drawn inside the jitted eval step; the forward used
for timing is its own jitted callable so latency measures the model, not the
metric computation.
"""

from __future__ import annotations

import dataclasses
import math
from collections import defaultdict
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gnn_pressure_estimation_tpu.data.dataset import SnapshotLoader, WDNDataset
from gnn_pressure_estimation_tpu.data.noisy import NoisyWDNDataset
from gnn_pressure_estimation_tpu.evaluation.sensors import get_sensors
from gnn_pressure_estimation_tpu.evaluation.timer import Timer
from gnn_pressure_estimation_tpu.train.loop import make_criterion
from gnn_pressure_estimation_tpu.utils import metrics as metrics_mod
from gnn_pressure_estimation_tpu.utils.masking import batch_node_mask, masked_count
from gnn_pressure_estimation_tpu.utils.scaling import NormStats, descale_with


@dataclasses.dataclass
class EvalConfig:
    """Evaluation flag surface (reference evaluation.py:823-926)."""

    test_type: str = "clean"          # clean | noisy11 | noisyNN
    num_test_trials: int = 10
    batch_size: int = 32
    mask_rate: float = 0.95
    criterion: str = "mse"
    use_same_mask: bool = False
    gpu_warmup_times: int = 10
    seed: int = 1234
    # sensors
    test_input_path: Optional[str] = None
    sensor_names: Optional[Sequence[str]] = None
    include_reservoir: bool = False
    # noisy-simulation knobs (reference get_default_datasets defaults,
    # evaluation.py:69)
    mean_dmd: float = 0.1
    std_dmd: float = 1.0
    feature: str = "pressure"
    removal: str = "keep_junction"
    # aggregation-layout overrides, mirroring TrainConfig.agg_mode/band_block:
    # a model trained banded must evaluate banded (same layout → same
    # numerics); None = auto like training
    agg_mode: Optional[str] = None
    band_block: Optional[int] = None


class Evaluator:
    """Jitted per-trial evaluation over a dataset, with optional sensor set.

    ``mesh`` (a ``("data", "graph")`` jax Mesh) runs every forward SPMD over
    the device mesh with the same partitioning strategies as MeshTrainer —
    whole-graph shards for small templates, banded halo-exchange node shards
    for large ones — so noisy large-graph evaluation is no longer
    single-device."""

    def __init__(self, model, cfg: EvalConfig, stats: NormStats, mesh=None):
        self.model = model
        self.cfg = cfg
        self.stats = stats
        self.mesh = mesh
        self.criterion = make_criterion(cfg.criterion)
        self._step_cache: dict = {}
        self._fwd_cache: dict = {}
        self._sensor_cache: dict = {}

    def _sensor_idx(self, template) -> tuple:
        # depends only on (cfg, template): cache to avoid re-parsing the INP
        # on every batch of every trial
        ck = id(template)
        if ck in self._sensor_cache:
            return self._sensor_cache[ck]
        idx = self._sensor_idx_uncached(template)
        self._sensor_cache[ck] = idx
        return idx

    def _sensor_idx_uncached(self, template) -> tuple:
        cfg = self.cfg
        if cfg.sensor_names is not None:
            names = list(cfg.sensor_names)
        elif cfg.test_input_path is not None:
            _, names = get_sensors(
                cfg.test_input_path, cfg.feature, cfg.include_reservoir
            )
        else:
            return ()
        if not names:
            return ()
        kept = template.node_names or []
        lookup = {n: i for i, n in enumerate(kept)}
        return tuple(lookup[n] for n in names if n in lookup)

    def _get_fwd(self, template, bs):
        key = (id(template), bs)
        if key not in self._fwd_cache:
            if self.mesh is not None:
                from gnn_pressure_estimation_tpu.parallel.eval_forward import (
                    make_mesh_forward,
                )

                fwd, graph = make_mesh_forward(
                    self.model, template, bs, self.mesh,
                    agg_mode=self.cfg.agg_mode, band_block=self.cfg.band_block,
                )
            else:
                # honor the training layout (a model trained with
                # --agg_mode banded --band_block 128 must evaluate under
                # the same layout)
                graph = template.batch(
                    bs, mode=self.cfg.agg_mode, band_block=self.cfg.band_block
                )

                @jax.jit
                def fwd(params, x_in):
                    return self.model.apply(params, x_in, graph)

            self._fwd_cache[key] = (fwd, graph)
        return self._fwd_cache[key]

    def _get_metrics_fn(self, template, bs, prefix):
        key = (id(template), bs, prefix, "m")
        if key not in self._step_cache:
            n = template.n_node
            k = masked_count(n, self.cfg.mask_rate)
            n_masked = bs * k
            st = self.stats
            crit = self.criterion

            @jax.jit
            def compute(out, y, mask):
                (midx,) = jnp.nonzero(mask, size=n_masked)
                yp, yt = out[midx], y[midx]
                loss = crit(yp, yt)
                mets = metrics_mod.compute_all(
                    descale_with(yp, st), descale_with(yt, st), prefix
                )
                return loss, mets

            self._step_cache[key] = compute
        return self._step_cache[key]

    # -- batched noisy scenes -------------------------------------------
    # noisy11/noisyNN scenes are single-snapshot datasets sharing one
    # GraphTemplate; evaluating them one-by-one means batch-1 dispatches
    # (latency-dominated through a remote-TPU tunnel).  Stack all N scenes
    # on the batch axis and compute *per-scene* metrics from mask-weighted
    # moments — algebraically identical to the gathered per-trial metrics
    # (utils/metrics.py:107), one dispatch instead of N.

    def _scenes_batchable(self, datasets) -> bool:
        if self.cfg.criterion not in ("mse", "mae"):
            return False
        if not isinstance(datasets, (list, tuple)) or len(datasets) < 2:
            return False
        if not all(
            len(ds.members) == 1 and len(ds.members[0].array) == 1
            for ds in datasets
        ):
            return False
        tid = id(datasets[0].members[0].template)
        return all(id(ds.members[0].template) == tid for ds in datasets)

    def _get_scene_metrics_fn(self, template, n_scenes, prefix):
        key = (id(template), n_scenes, prefix, "scene")
        if key not in self._step_cache:
            n = template.n_node
            st = self.stats
            crit_name = self.cfg.criterion

            @jax.jit
            def compute(out, y, mask):
                o = out.reshape(n_scenes, n)
                t = y.reshape(n_scenes, n)
                m = mask.reshape(n_scenes, n).astype(jnp.float32)
                cnt = jnp.maximum(m.sum(axis=1), 1.0)
                if crit_name == "mse":
                    loss = (jnp.square(o - t) * m).sum(axis=1) / cnt
                else:  # mae
                    loss = (jnp.abs(o - t) * m).sum(axis=1) / cnt
                mo = jax.vmap(metrics_mod.masked_moments)(
                    descale_with(o, st), descale_with(t, st), m
                )
                mets = metrics_mod.metrics_from_moments(mo, prefix)
                return loss, mets  # [N], dict of [N]

            self._step_cache[key] = compute
        return self._step_cache[key]

    def run_scene_trials(
        self,
        datasets,
        n_mask_draws: int,
        prefix: str = "test",
        timer: Optional[Timer] = None,
    ) -> list[dict]:
        """All scenes in one batch, ``n_mask_draws`` mask redraws.

        Returns scene-major trial rows (matching the sequential noisyNN
        loop order): each row has a/s (all-nodes / sensors-only)
        (loss, metrics) scalars, plus timing, host-synced once."""
        cfg = self.cfg
        tpl = datasets[0].members[0].template
        n = tpl.n_node
        N = len(datasets)
        xs = np.stack(
            [np.asarray(ds.members[0].array[0], np.float32) for ds in datasets]
        )
        x = jnp.asarray(xs.reshape(-1, 1))  # [N*n, 1]
        fwd, graph = self._get_fwd(tpl, N)
        compute = self._get_scene_metrics_fn(tpl, N, prefix)
        req = self._sensor_idx(tpl)
        rng = np.random.default_rng(cfg.seed)
        draws = []   # async device values, one host sync at the end
        times = []
        for _ in range(n_mask_draws):
            row = {}
            for sensors in (False, True):
                key = jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1)))
                mask = batch_node_mask(
                    key, N, n, cfg.mask_rate,
                    required_idx=req if sensors else (),
                    shared=cfg.use_same_mask,
                )
                x_in = jnp.where(mask[:, None], 0.0, x)
                if graph.banded:
                    x_in = graph.pack_nodes(x_in, n)
                f = fwd
                if timer is not None and not sensors:
                    warm = cfg.gpu_warmup_times if not timer.finished_warmup else 0
                    f = timer.auto_measure(fwd, N, warmup_times=warm)
                out = f(self.params, x_in)
                if graph.banded:
                    out = graph.unpack_nodes(out, n)
                row["s" if sensors else "a"] = compute(out, x, mask)
            if timer is not None:
                times.append(
                    (timer.compute_time(N), timer.compute_throughput(N))
                )
                timer.timings.clear()
                timer.num_graphs.clear()
            draws.append(row)
        draws = jax.device_get(draws)  # the single host sync
        rows = []
        for i in range(N):          # scene-major like the sequential loop
            for j in range(n_mask_draws):
                a_loss, a_mets = draws[j]["a"]
                s_loss, s_mets = draws[j]["s"]
                rows.append({
                    "loss": float(a_loss[i]),
                    "mets": {mk: float(mv[i]) for mk, mv in a_mets.items()},
                    "s_loss": float(s_loss[i]),
                    "s_mets": {mk: float(mv[i]) for mk, mv in s_mets.items()},
                    "time": times[j] if times else None,
                })
        return rows

    def run_trial(
        self,
        dataset: WDNDataset,
        trial: int,
        prefix: str = "test",
        sensors: bool = False,
        timer: Optional[Timer] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> tuple[float, dict]:
        """One pass over the dataset with fresh masks (reference
        test_one_epoch, evaluation.py:240-347)."""
        cfg = self.cfg
        rng = rng or np.random.default_rng(cfg.seed + trial)
        loader = SnapshotLoader(dataset, cfg.batch_size, shuffle=False)
        per_batch = []  # (bs, loss, mets) async device scalars
        shared_mask = {}

        for template, xb, _ in loader:
            bs = xb.shape[0]
            n = template.n_node
            req = self._sensor_idx(template) if sensors else ()
            x = jnp.asarray(xb.reshape(-1, 1))
            key = jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1)))
            mkey = (id(template), bs, sensors)
            if cfg.use_same_mask and mkey in shared_mask:
                mask = shared_mask[mkey]
            else:
                mask = batch_node_mask(
                    key, bs, n, cfg.mask_rate, required_idx=req,
                    shared=cfg.use_same_mask,
                )
                shared_mask[mkey] = mask

            fwd, graph = self._get_fwd(template, bs)
            if graph.banded:
                # banded graphs run in RCM-permuted padded node space
                x = graph.pack_nodes(x, n)
                mask = graph.pack_nodes(
                    mask.astype(jnp.float32)[:, None], n
                )[:, 0] > 0.5
            x_in = jnp.where(mask[:, None], 0.0, x)
            if timer is not None:
                warm = cfg.gpu_warmup_times if (trial == 0 and not timer.finished_warmup) else 0
                wrapped = timer.auto_measure(fwd, bs, warmup_times=warm)
                out = wrapped(self.params, x_in)
            else:
                out = fwd(self.params, x_in)

            loss, mets = self._get_metrics_fn(template, bs, prefix)(out, x, mask)
            per_batch.append((bs, loss, mets))

        # one host sync at trial end (per-batch float() forces a device
        # round-trip each batch; noisyNN runs N² trials and feels it)
        ntot = max(sum(bs for bs, _, _ in per_batch), 1)
        total_loss = 0.0
        sums: dict[str, float] = {}
        for bs, loss, mets in per_batch:
            total_loss += float(loss) * bs
            for mk, mv in mets.items():
                sums[mk] = sums.get(mk, 0.0) + float(mv) * bs
        return total_loss / ntot, {mk: v / ntot for mk, v in sums.items()}

    # -- public API ------------------------------------------------------
    def evaluate(self, params, datasets, log_fn=print) -> tuple[dict, dict, dict]:
        """Full multi-trial evaluation; ``datasets`` is one WDNDataset
        (clean) or a list (noisy11/noisyNN scenes).

        Returns (loss_dict, metric_dict, sensor_metric_dict) with
        ``*_mean`` / ``*_std`` entries (reference internal_test,
        evaluation.py:739-778)."""
        cfg = self.cfg
        self.params = params
        timer = Timer()
        losses, sensor_losses = [], []
        metric_lists: dict[str, list] = defaultdict(list)
        sensor_metric_lists: dict[str, list] = defaultdict(list)

        def collect_once(ds, trial):
            loss, mets = self.run_trial(ds, trial, "test", sensors=False, timer=timer)
            s_loss, s_mets = self.run_trial(ds, trial, "test", sensors=True)
            losses.append(loss)
            sensor_losses.append(s_loss)
            mets["test_time"] = timer.compute_time(len(ds))
            mets["test_throughput"] = timer.compute_throughput(len(ds))
            for mk, mv in mets.items():
                metric_lists[mk].append(mv)
            for mk, mv in s_mets.items():
                sensor_metric_lists[mk + "_sensor"].append(mv)
            timer.timings.clear()
            timer.num_graphs.clear()

        def collect_rows(rows):
            for row in rows:
                losses.append(row["loss"])
                sensor_losses.append(row["s_loss"])
                mets = dict(row["mets"])
                if row["time"] is not None:
                    mets["test_time"], mets["test_throughput"] = row["time"]
                for mk, mv in mets.items():
                    metric_lists[mk].append(mv)
                for mk, mv in row["s_mets"].items():
                    sensor_metric_lists[mk + "_sensor"].append(mv)

        if cfg.test_type == "clean":
            assert isinstance(datasets, WDNDataset)
            for trial in range(cfg.num_test_trials):
                collect_once(datasets, trial)
        elif cfg.test_type == "noisy11":
            assert isinstance(datasets, (list, tuple))
            if self._scenes_batchable(datasets):
                collect_rows(self.run_scene_trials(datasets, 1, timer=timer))
            else:
                for trial, ds in enumerate(datasets):
                    collect_once(ds, trial)
        elif cfg.test_type == "noisyNN":
            assert isinstance(datasets, (list, tuple))
            if self._scenes_batchable(datasets):
                collect_rows(self.run_scene_trials(
                    datasets, cfg.num_test_trials, timer=timer
                ))
            else:
                t = 0
                for ds in datasets:
                    for _ in range(cfg.num_test_trials):
                        collect_once(ds, t)
                        t += 1
        else:
            raise NotImplementedError(f"test type {cfg.test_type}")

        trials = len(losses)
        loss_dict = {
            "test_loss_mean": float(np.mean(losses)),
            "test_loss_std": float(np.std(losses) + 1e-6),
            "test_loss_sensor_mean": float(np.mean(sensor_losses)),
            "test_loss_sensor_std": float(np.std(sensor_losses) + 1e-6),
        }
        metric_dict = {}
        for mk, vals in metric_lists.items():
            metric_dict[f"{mk}_mean"] = float(np.mean(vals))
            metric_dict[f"{mk}_std"] = float(np.std(vals) + 1e-6)
        sensor_metric_dict = {}
        for mk, vals in sensor_metric_lists.items():
            sensor_metric_dict[f"{mk}_mean"] = float(np.mean(vals))
            sensor_metric_dict[f"{mk}_std"] = float(np.std(vals) + 1e-6)

        summary = ", ".join(
            f"{mk[:-5]}: {v:.4f} +/- {metric_dict[mk[:-5] + '_std']:.4f}"
            for mk, v in metric_dict.items() if mk.endswith("_mean")
        )
        log_fn(f"\nThis TEST experiment reports the average result of {trials} runs.")
        log_fn(
            f"test_loss: {loss_dict['test_loss_mean']:.4f} +/- "
            f"{loss_dict['test_loss_std']:.4f}, {summary}"
        )
        return loss_dict, metric_dict, sensor_metric_dict


def make_noisy_scenes(
    inp_paths: Sequence[str],
    cfg: EvalConfig,
    stats: NormStats,
    edge_attrs=None,
    norm_type: str = "znorm",
    backend: Optional[str] = None,
) -> list[NoisyWDNDataset]:
    """N independent noise scenes (reference evaluation.py:104-127: a list of
    NoisyWDNDataset, one per trial). Scenes share GraphTemplates so the
    jitted eval programs compile once, not once per scene."""
    shared: dict = {}
    return [
        NoisyWDNDataset(
            inp_paths,
            feature=cfg.feature,
            removal=cfg.removal,
            stats=stats,
            edge_attrs=edge_attrs,
            norm_type=norm_type,
            mean_dmd=cfg.mean_dmd,
            std_dmd=cfg.std_dmd,
            seed=cfg.seed + t,
            backend=backend,
            shared_templates=shared,
        )
        for t in range(cfg.num_test_trials)
    ]


def evaluate(
    model,
    params,
    cfg: EvalConfig,
    stats: NormStats,
    test_ds=None,
    inp_paths: Optional[Sequence[str]] = None,
    edge_attrs=None,
    norm_type: str = "znorm",
    log_fn=print,
):
    """Convenience wrapper: builds noisy scenes if needed, runs the harness."""
    ev = Evaluator(model, cfg, stats)
    if cfg.test_type in ("noisy11", "noisyNN"):
        assert inp_paths, "noisy tests need inp_paths for online simulation"
        datasets = make_noisy_scenes(
            inp_paths, cfg, stats, edge_attrs, norm_type
        )
    else:
        assert test_ds is not None
        datasets = test_ds
    return ev.evaluate(params, datasets, log_fn=log_fn)
