"""Batch inference: reconstruct full pressure fields from sparse sensor
readings and export them — the production serving surface.

The reference stops at statistical evaluation (evaluation.py:600-803 reports
aggregate metrics only); deploying the estimator means running exactly one
masked forward pass per snapshot and keeping the *field*. This module does
that: given observed node values (real sensor readings or dataset snapshots
restricted to an observed set), it runs the trained model and returns the
descaled, physical-unit pressure estimate for every node, ready to write to
``.npz`` / ``.csv``.

Conventions match training (train/loop.py): model input is the scaled field
with unobserved nodes zeroed; the output field is descaled with the
checkpoint's normalization stats. The observed set can be explicit node
names, the sensors plug-in (evaluation/sensors.py), or a seeded random draw
at ``1 - mask_rate`` density.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gnn_pressure_estimation_tpu.utils.scaling import NormStats, scale_with, descale_with


@dataclass
class InferenceResult:
    """Full-field estimates for a batch of snapshots (physical units)."""

    node_names: list
    pred: np.ndarray              # [S, n] descaled predictions
    observed: np.ndarray          # [n] bool — nodes whose values were given
    true: Optional[np.ndarray] = None   # [S, n] descaled ground truth if known
    metrics: dict = field(default_factory=dict)  # on hidden nodes, if truth

    def save_npz(self, path: str):
        payload = dict(
            node_names=np.asarray(self.node_names),
            pred=self.pred,
            observed=self.observed,
        )
        if self.true is not None:
            payload["true"] = self.true
        np.savez(path, **payload)

    def save_csv(self, path: str):
        import csv

        with open(path, "w", newline="") as f:
            wr = csv.writer(f)
            cols = ["snapshot", "node", "observed", "pred"]
            if self.true is not None:
                cols += ["true", "abs_error"]
            wr.writerow(cols)
            for s in range(self.pred.shape[0]):
                for i, name in enumerate(self.node_names):
                    row = [s, name, int(self.observed[i]),
                           f"{self.pred[s, i]:.6g}"]
                    if self.true is not None:
                        row += [f"{self.true[s, i]:.6g}",
                                f"{abs(self.pred[s, i] - self.true[s, i]):.6g}"]
                    wr.writerow(row)


class Inferencer:
    """Jit-cached masked forward for serving.

    One compiled program per (template, batch-size, layout) — repeated calls
    with the same shapes reuse it, so steady-state cost is a single device
    dispatch per batch.
    """

    def __init__(self, model, stats: NormStats, agg_mode: Optional[str] = None,
                 band_block: Optional[int] = None):
        self.model = model
        self.stats = stats
        self.agg_mode = agg_mode
        self.band_block = band_block
        self._fwd_cache: dict = {}

    def _get_fwd(self, template, bs: int):
        key = (id(template), bs)
        if key not in self._fwd_cache:
            graph = template.batch(bs, mode=self.agg_mode,
                                   band_block=self.band_block)

            @jax.jit
            def fwd(params, x_in):
                out = self.model.apply(params, x_in, graph)
                return descale_with(out, self.stats)

            self._fwd_cache[key] = (fwd, graph)
        return self._fwd_cache[key]

    def observed_indices(
        self,
        template,
        observed: str | Sequence[str],
        test_input_path: Optional[str] = None,
        mask_rate: float = 0.95,
        seed: int = 0,
    ) -> np.ndarray:
        """Resolve the observed-node set to indices in template node order.

        ``observed`` is either a sequence of node names, the string
        ``"sensors"`` (evaluation/sensors.py plug-in), or ``"random"``
        (seeded draw keeping ``round(n · (1 - mask_rate))`` nodes — the
        training distribution's observation density).
        """
        n = template.n_node
        names = list(template.node_names or [])
        if isinstance(observed, str) and observed == "random":
            rng = np.random.default_rng(seed)
            n_obs = max(1, n - int(round(n * mask_rate)))
            return np.sort(rng.choice(n, size=n_obs, replace=False))
        if isinstance(observed, str) and observed == "sensors":
            from gnn_pressure_estimation_tpu.evaluation.sensors import get_sensors

            if not test_input_path:
                raise ValueError("observed='sensors' needs test_input_path")
            idx, found = get_sensors(test_input_path)
            if not idx:
                raise ValueError(
                    "no sensors configured (mysecrets.py absent) — pass "
                    "explicit node names or observed='random'"
                )
            # sensor indices are in canonical INP order; map into the
            # template's kept order by name
            if names:
                lookup = {nm: i for i, nm in enumerate(names)}
                return np.array(sorted(lookup[nm] for nm in found
                                       if nm in lookup))
            return np.asarray(idx)
        # explicit names
        if not names:
            raise ValueError("template carries no node names; pass indices")
        lookup = {nm: i for i, nm in enumerate(names)}
        missing = [nm for nm in observed if nm not in lookup]
        if missing:
            raise ValueError(f"unknown node names: {missing}")
        return np.array(sorted(lookup[nm] for nm in observed))

    def infer(
        self,
        params,
        template,
        values: np.ndarray,
        observed_idx: np.ndarray,
        scaled: bool = False,
        batch_size: int = 32,
        with_truth: bool = False,
    ) -> InferenceResult:
        """Reconstruct full fields.

        ``values`` is ``[S, n]`` (full snapshots, of which only
        ``observed_idx`` columns are consumed) or ``[S, k]`` (readings for
        the k observed nodes only), in physical units unless ``scaled``.
        ``with_truth`` treats full-width ``values`` as ground truth for
        hidden-node error metrics.
        """
        n = template.n_node
        values = np.atleast_2d(np.asarray(values, np.float32))
        S = values.shape[0]
        obs = np.zeros(n, bool)
        obs[np.asarray(observed_idx, int)] = True
        k = int(obs.sum())

        if values.shape[1] == n:
            full = values
        elif values.shape[1] == k:
            full = np.zeros((S, n), np.float32)
            full[:, obs] = values
        else:
            raise ValueError(
                f"values width {values.shape[1]} is neither n={n} nor k={k}"
            )
        truth = full if (with_truth and values.shape[1] == n) else None

        scaled_full = full if scaled else np.asarray(
            scale_with(jnp.asarray(full), self.stats))
        x_obs = np.where(obs[None, :], scaled_full, 0.0).astype(np.float32)

        preds = np.empty((S, n), np.float32)
        for lo in range(0, S, batch_size):
            chunk = x_obs[lo:lo + batch_size]
            bs = chunk.shape[0]
            fwd, graph = self._get_fwd(template, bs)
            x = jnp.asarray(chunk.reshape(-1, 1))
            if graph.banded:
                x = graph.pack_nodes(x, n)
            out = fwd(params, x)
            if graph.banded:
                out = graph.unpack_nodes(out, n)
            preds[lo:lo + bs] = np.asarray(out).reshape(bs, -1)[:, :n]

        if truth is not None and not scaled:
            true_phys = truth
        elif truth is not None:
            true_phys = np.asarray(descale_with(jnp.asarray(truth), self.stats))
        else:
            true_phys = None

        metrics = {}
        if true_phys is not None and (~obs).any():
            diff = preds[:, ~obs] - true_phys[:, ~obs]
            metrics = {
                "hidden_mae": float(np.mean(np.abs(diff))),
                "hidden_rmse": float(np.sqrt(np.mean(diff ** 2))),
                "hidden_max_abs": float(np.max(np.abs(diff))),
                "n_hidden": int((~obs).sum()),
                "n_observed": k,
            }
        # observed nodes are known exactly — serve the readings, not the
        # model's re-estimate of them
        preds_served = preds.copy()
        preds_served[:, obs] = (full if not scaled else np.asarray(
            descale_with(jnp.asarray(full), self.stats)))[:, obs]

        return InferenceResult(
            node_names=list(template.node_names or range(n)),
            pred=preds_served,
            observed=obs,
            true=true_phys,
            metrics=metrics,
        )
