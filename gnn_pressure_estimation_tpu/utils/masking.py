"""Random node masking — inside the jitted step, not host-side NumPy.

The reference regenerates masks on the host every batch with per-graph
``np.random.choice`` (auxil.py:143-182, called from train.py:172), forcing a
host sync per step. Here the mask is drawn with ``jax.random`` inside jit:
per graph, exactly ``k = int(n * mask_rate)`` nodes are masked, with an
optional set of always-masked sensor indices (evaluation harness,
reference evaluation.py:289). ``k`` is static, so downstream masked gathers
have static shapes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def masked_count(num_nodes: int, mask_rate: float) -> int:
    """Number of masked nodes per graph (reference auxil.py:154,161:
    ``int(num_nodes * masking_rate)``, required idx included in the count)."""
    k = int(num_nodes * mask_rate)
    if k <= 0:
        raise ValueError(
            f"mask_rate {mask_rate} masks 0 of {num_nodes} nodes"
        )
    return k


def batch_node_mask(
    key: jax.Array,
    n_graph: int,
    nodes_per_graph: int,
    mask_rate: float,
    required_idx: Optional[Sequence[int]] = None,
    shared: bool = False,
) -> jax.Array:
    """Draw a ``[n_graph * nodes_per_graph]`` boolean mask, True = masked.

    ``shared=True`` draws one mask and broadcasts it to all graphs in the
    batch (reference evaluation's ``use_same_mask``, evaluation.py:283-300).
    ``required_idx`` nodes are always masked (sensors-only scoring).
    """
    n, k = nodes_per_graph, masked_count(nodes_per_graph, mask_rate)
    rows = 1 if shared else n_graph
    u = jax.random.uniform(key, (rows, n))
    # Mask the k smallest draws per row with one top_k instead of a double
    # argsort (TPU sorts are comparatively slow).  Exactly-k is load-bearing
    # (static n_masked denominators / sized nonzero gathers), so ties are
    # broken deterministically: keep the high mantissa bits of the positive
    # float's monotone bit pattern and pack the column index into the low
    # bits — a strict total order even for duplicated f32 draws.
    nbits = max(int(n - 1).bit_length(), 1)
    assert nbits <= 23, f"{n} nodes exceeds the tiebreak packing range"
    bits = jax.lax.bitcast_convert_type(u, jnp.int32)      # u∈[0,1) → ≥0
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    keys = ((bits >> nbits) << nbits) | iota
    if required_idx is not None and len(required_idx):
        req = np.asarray(required_idx, np.int32)
        # required entries take the globally smallest (distinct) keys
        vals = jnp.asarray(np.arange(len(req), dtype=np.int32) - (1 << 30))
        keys = keys.at[:, jnp.asarray(req)].set(vals[None, :])
    kth = -jax.lax.top_k(-keys, k)[0][:, k - 1 : k]        # [rows, 1]
    mask = keys <= kth
    if shared:
        mask = jnp.broadcast_to(mask, (n_graph, n))
    return mask.reshape(-1)
