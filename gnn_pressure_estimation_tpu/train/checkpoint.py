"""Checkpointing: params + optimizer state + the normalization contract.

Reference equivalent: utils/auxil.py:206-233 (torch.save of a kwargs dict with
model/optimizer state dicts, epoch, loss, val metrics, and the full
normalization statistics; call sites train.py:433-474). Here a checkpoint is a
single msgpack file (flax.serialization) with a JSON-encoded metadata leaf, so
it is framework-portable and safe to load without unpickling arbitrary code.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

from gnn_pressure_estimation_tpu.utils.scaling import NormStats


def _to_numpy_tree(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any = None,
    epoch: int = 0,
    loss: float = 0.0,
    metrics: Optional[dict] = None,
    stats: Optional[NormStats] = None,
    extra: Optional[dict] = None,
) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    meta = {
        "epoch": int(epoch),
        "loss": float(loss),
        "metrics": {k: float(v) for k, v in (metrics or {}).items()},
        "stats": stats.to_dict() if stats is not None else None,
        "extra": extra or {},
    }
    payload = {
        "params": serialization.to_state_dict(_to_numpy_tree(params)),
        "opt_state": (
            serialization.to_state_dict(_to_numpy_tree(opt_state))
            if opt_state is not None
            else {}
        ),
        "meta_json": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    }
    blob = serialization.msgpack_serialize(payload)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_checkpoint(path: str, params_template: Any = None, opt_state_template: Any = None):
    """Returns (params, opt_state_or_None, meta dict). Templates restore the
    exact pytree structure/dtypes; without a template the raw dict-of-arrays
    is returned (reference load restores weights only, auxil.py:206-220)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = json.loads(bytes(payload["meta_json"].tobytes()).decode())
    if meta.get("stats") is not None:
        meta["stats"] = NormStats.from_dict(meta["stats"])
    params = payload["params"]
    if params_template is not None:
        params = serialization.from_state_dict(params_template, params)
    opt_state = payload.get("opt_state") or None
    if opt_state is not None and opt_state_template is not None:
        opt_state = serialization.from_state_dict(opt_state_template, opt_state)
    return params, opt_state, meta
