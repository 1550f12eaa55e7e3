"""AutoClip as an optax transform — adaptive percentile gradient clipping.

Reference: utils/gradient_clipping.py:22-33 (Seetharaman et al. 2020): keep a
history of global gradient norms, clip each step to the p-th percentile of the
history so far. The reference keeps an unbounded Python list and calls
``np.percentile`` on the host every step; here the history lives inside the
optimizer state as a fixed ring buffer, so the whole update stays jittable —
no host sync per step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AutoClipState(NamedTuple):
    history: jax.Array  # [history_len] f32 ring buffer of grad norms
    count: jax.Array    # i32 number of valid entries written so far


def _percentile_of_filled(history: jax.Array, count: jax.Array, pct: float) -> jax.Array:
    """np.percentile(history[:count], pct) with linear interpolation, under jit.

    Unfilled slots are pushed to +inf so they sort last and never get picked
    (rank is always < count).
    """
    n = history.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    vals = jnp.where(idx < count, history, jnp.inf)
    s = jnp.sort(vals)
    rank = (count - 1).astype(jnp.float32) * (pct / 100.0)
    lo = jnp.floor(rank).astype(jnp.int32)
    hi = jnp.ceil(rank).astype(jnp.int32)
    frac = rank - lo.astype(jnp.float32)
    return s[lo] * (1.0 - frac) + s[hi] * frac


def autoclip(percentile: float = 10.0, history_len: int = 1024) -> optax.GradientTransformation:
    """Clip global grad norm to the running percentile of past norms."""

    def init_fn(params):
        del params
        return AutoClipState(
            history=jnp.zeros((history_len,), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        pos = state.count % history_len
        history = state.history.at[pos].set(norm.astype(jnp.float32))
        count = jnp.minimum(state.count + 1, history_len)
        clip_value = _percentile_of_filled(history, count, percentile)
        # torch.nn.utils.clip_grad_norm_ semantics: scale = min(1, c/(norm+eps))
        scale = jnp.minimum(1.0, clip_value / (norm + 1e-6))
        updates = jax.tree.map(lambda g: g * scale, updates)
        return updates, AutoClipState(history=history, count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)
