"""Evaluation metrics on descaled (physical-unit) masked pressures.

Definition parity with reference utils/auxil.py:101-140 and the registry
``get_metric_fn_collection`` (auxil.py:185-203): rel_error (|y|>0.01 guard),
acc@threshold, Pearson corr (clamped to [-1,1]), r², MAE, RMSE, NSE.
All functions are jit-safe over flat arrays and return scalars.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax.numpy as jnp


def nse(y_pred, y_true, exponent: int = 2):
    """Nash–Sutcliffe efficiency (auxil.py:101-107)."""
    p, t = jnp.ravel(y_pred), jnp.ravel(y_true)
    num = jnp.sum((p - t) ** exponent)
    den = jnp.sum((t - jnp.mean(t)) ** exponent) + 1e-12
    return 1.0 - num / den


def rmse(y_pred, y_true):
    return jnp.sqrt(jnp.mean((y_pred - y_true) ** 2))


def mae(y_pred, y_true):
    return jnp.mean(jnp.abs(y_pred - y_true))


def rel_error(y_pred, y_true):
    """Mean |err / y_true| over entries with |y_true| > 0.01 (auxil.py:114-118)."""
    err = jnp.abs(y_true - y_pred)
    valid = jnp.abs(y_true) > 0.01
    rel = jnp.where(valid, jnp.abs(err / jnp.where(valid, y_true, 1.0)), 0.0)
    cnt = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(rel) / cnt


def accuracy(y_pred, y_true, threshold: float = 0.1):
    """Fraction with |err| <= y_true * threshold. Note: the reference compares
    against the *signed* ``y_true * threshold`` (auxil.py:121-124), so negative
    truths always count as misses — replicated for parity."""
    err = jnp.abs(y_true - y_pred)
    return jnp.mean((err <= y_true * threshold).astype(jnp.float32))


def correlation(y_pred, y_true):
    vx = y_pred - jnp.mean(y_pred)
    vy = y_true - jnp.mean(y_true)
    denom = jnp.sqrt(jnp.sum(vx**2)) * jnp.sqrt(jnp.sum(vy**2))
    return jnp.clip(jnp.sum(vx * vy) / denom, -1.0, 1.0)


def r2(y_pred, y_true):
    return correlation(y_pred, y_true) ** 2


def metric_collection(prefix: str) -> dict[str, Callable]:
    """Name → callable registry (reference auxil.py:185-203 naming)."""
    return {
        f"{prefix}_error": rel_error,
        f"{prefix}_0.1": partial(accuracy, threshold=0.1),
        f"{prefix}_corr": correlation,
        f"{prefix}_r2": r2,
        f"{prefix}_mae": mae,
        f"{prefix}_rmse": rmse,
        f"{prefix}_mynse": partial(nse, exponent=2),
    }


def compute_all(y_pred, y_true, prefix: str) -> dict[str, jnp.ndarray]:
    return {k: fn(y_pred, y_true) for k, fn in metric_collection(prefix).items()}


# ---- distributed (moment-based) variants -----------------------------------
# Under edge partitioning each device holds a node block; global metrics are
# computed from psum-able sufficient statistics so no device ever gathers the
# full masked prediction vector.

def masked_moments(y_pred, y_true, mask) -> dict[str, jnp.ndarray]:
    """Per-shard sufficient statistics over masked nodes (flat arrays)."""
    m = mask.astype(jnp.float32)
    p = jnp.ravel(y_pred) * jnp.ravel(m)
    t = jnp.ravel(y_true) * jnp.ravel(m)
    err = p - t
    valid = (jnp.abs(t) > 0.01) & (jnp.ravel(mask) > 0)
    rel = jnp.where(valid, jnp.abs(err / jnp.where(valid, t, 1.0)), 0.0)
    acc = (jnp.abs(err) <= t * 0.1) & (jnp.ravel(mask) > 0)
    return {
        "count": jnp.sum(m),
        "sum_p": jnp.sum(p),
        "sum_t": jnp.sum(t),
        "sum_pp": jnp.sum(p * p),
        "sum_tt": jnp.sum(t * t),
        "sum_pt": jnp.sum(p * t),
        "sum_abs_err": jnp.sum(jnp.abs(err)),
        "sum_sq_err": jnp.sum(err * err),
        "sum_rel": jnp.sum(rel),
        "count_rel": jnp.sum(valid.astype(jnp.float32)),
        "sum_acc": jnp.sum(acc.astype(jnp.float32)),
    }


def metrics_from_moments(mo: dict, prefix: str) -> dict[str, jnp.ndarray]:
    """Global metrics from (psum'd) moments — algebraically identical to the
    direct formulas in this module."""
    n = jnp.maximum(mo["count"], 1.0)
    mean_p = mo["sum_p"] / n
    mean_t = mo["sum_t"] / n
    var_p = mo["sum_pp"] / n - mean_p**2
    var_t = mo["sum_tt"] / n - mean_t**2
    cov = mo["sum_pt"] / n - mean_p * mean_t
    corr = jnp.clip(cov / jnp.sqrt(jnp.maximum(var_p * var_t, 1e-24)), -1.0, 1.0)
    sst = mo["sum_tt"] - mo["sum_t"] ** 2 / n
    return {
        f"{prefix}_error": mo["sum_rel"] / jnp.maximum(mo["count_rel"], 1.0),
        f"{prefix}_0.1": mo["sum_acc"] / n,
        f"{prefix}_corr": corr,
        f"{prefix}_r2": corr**2,
        f"{prefix}_mae": mo["sum_abs_err"] / n,
        f"{prefix}_rmse": jnp.sqrt(mo["sum_sq_err"] / n),
        f"{prefix}_mynse": 1.0 - mo["sum_sq_err"] / (sst + 1e-12),
    }
