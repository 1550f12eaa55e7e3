"""Model presets — name → (constructor, training-config overrides).

Replaces the reference's ``ConfigModels.select_model`` dispatch
(ConfigModels.py:133-178). Each preset carries the model hyperparameters plus
the criterion / normalization / edge-attribute contract that the reference
presets force onto the CLI args (ConfigModels.py:26-28 etc.). Precedence is
explicit here: preset values fill a typed config, and user-provided overrides
win (the reference silently overwrote user CLI values — SURVEY.md §5 quirk).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import flax.linen as nn

from gnn_pressure_estimation_tpu.models.gatres import GATRes
from gnn_pressure_estimation_tpu.models.zoo import (
    GIN,
    GAT,
    GCN2,
    ChebNet,
    GraphConvWat,
    MGCN,
)


@dataclasses.dataclass(frozen=True)
class ModelPreset:
    name: str
    build: Callable[[], nn.Module]
    criterion: str = "mse"          # mse | mae | sce
    norm_type: str = "znorm"        # znorm | minmax | unused
    edge_attrs: Optional[tuple] = None  # e.g. ("diameter", "length")

    def make(self) -> nn.Module:
        return self.build()


MODEL_REGISTRY: dict[str, ModelPreset] = {
    # attn_impl="factored": the exp(leaky_relu) numerator is computed as two
    # rank-1 products gated by the sign matrix — all transcendentals become
    # per-node vectors and the n² work rides the MXU (see models/layers.py).
    # Same math as the textbook softmax up to fp rounding (parity-tested);
    # measured 6.87 ms vs 7.42 ms per train step on the headline config.
    "gatres_small": ModelPreset(
        "gatres_small", lambda: GATRes(num_blocks=15, channels=32,
                                       attn_impl="factored"),
        criterion="mse", norm_type="znorm",
    ),
    "gatres_large": ModelPreset(
        "gatres_large", lambda: GATRes(num_blocks=25, channels=128,
                                       attn_impl="factored"),
        criterion="mse", norm_type="znorm",
    ),
    "gin": ModelPreset(
        "gin", lambda: GIN(num_blocks=15, channels=32),
        criterion="mse", norm_type="znorm",
    ),
    "graphconvwat": ModelPreset(
        "graphconvwat", lambda: GraphConvWat(),
        criterion="mse", norm_type="minmax",
    ),
    "chebnet": ModelPreset(
        "chebnet", lambda: ChebNet(channels=32),
        criterion="mse", norm_type="znorm",
    ),
    "mgcn": ModelPreset(
        "mgcn",
        lambda: MGCN(latent_dim=96, n_aggr=45, n_hops=1, num_layers=2, edge_dim=2),
        criterion="mae", norm_type="minmax", edge_attrs=("diameter", "length"),
    ),
    "gcn2": ModelPreset(
        "gcn2", lambda: GCN2(num_blocks=64, channels=32),
        criterion="mse", norm_type="znorm",
    ),
    "gat": ModelPreset(
        "gat", lambda: GAT(num_blocks=10, channels=32),
        criterion="mse", norm_type="znorm",
    ),
}


def select_model(name: str, dtype=None) -> tuple[nn.Module, ModelPreset]:
    """``dtype`` (e.g. jnp.bfloat16) switches activation precision for models
    that support it (GATRes keeps params/softmax/loss in f32; bf16 halves the
    HBM traffic of the [B,n,n,H] attention tensors — bf16 shares f32's
    exponent range so no loss scaling is required)."""
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(MODEL_REGISTRY)}"
        )
    preset = MODEL_REGISTRY[name]
    model = preset.make()
    if dtype is not None:
        if "dtype" not in getattr(model, "__dataclass_fields__", {}):
            raise ValueError(f"model '{name}' has no activation-dtype knob")
        model = model.clone(dtype=dtype)
    return model, preset


def apply_model_knobs(model: nn.Module, attn_impl=None, gate_dtype=None,
                      attn_dtype=None) -> nn.Module:
    """Clone ``model`` with attention-knob overrides, validating that the
    model actually exposes each knob (one shared implementation for the CLI
    and the perf tools — cli.py train/eval, tools/roofline.py,
    tools/hlo_traffic.py). Dtype knobs accept the CLI strings
    'float32'/'bfloat16' or jnp dtypes; None leaves the preset value."""
    import jax.numpy as jnp

    def _dt(v):
        if v is None or not isinstance(v, str):
            return v
        if v == "float32":
            return jnp.float32
        if v == "bfloat16":
            return jnp.bfloat16
        raise ValueError(
            f"dtype knob must be 'float32' or 'bfloat16', got {v!r}"
        )

    overrides = {}
    for knob, val in (("attn_impl", attn_impl),
                      ("gate_dtype", _dt(gate_dtype)),
                      ("attn_dtype", _dt(attn_dtype))):
        if val is None:
            continue
        if knob not in getattr(model, "__dataclass_fields__", {}):
            raise ValueError(
                f"model {type(model).__name__} has no {knob!r} knob"
            )
        overrides[knob] = val
    return model.clone(**overrides) if overrides else model
