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
