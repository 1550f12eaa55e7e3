"""Message-passing primitives (reference implementations).

These replace the PyG/torch_scatter CUDA kernels the reference leans on
(reference: GraphModels.py:3,9 imports; torch_scatter.scatter at
GraphModels.py:389-393). The API contract for the whole framework:

- edges are **receiver-sorted** (guaranteed by ``core.graph.GraphTemplate``),
  so XLA can lower the scatters to contiguous segment reductions
  (``indices_are_sorted=True``);
- ``num_segments`` is always static, keeping shapes compile-time constant.

``ops.pallas`` provides TPU Pallas kernels behind the same signatures; the
dispatch flag lives in :mod:`gnn_pressure_estimation_tpu.ops.dispatch`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """``x[idx]`` — edge-wise gather of node features."""
    return jnp.take(x, idx, axis=0)


def gather_src(x: jax.Array, senders: jax.Array, axis_name=None) -> jax.Array:
    """Gather sender features; in edge-partitioned mode the senders are
    global ids into the all-gathered node blocks."""
    if axis_name is not None:
        x = jax.lax.all_gather(x, axis_name, tiled=True)
    return jnp.take(x, senders, axis=0)


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )


def segment_mean(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    tot = segment_sum(data, segment_ids, num_segments)
    cnt = segment_sum(jnp.ones((data.shape[0],), data.dtype), segment_ids, num_segments)
    cnt = jnp.maximum(cnt, 1.0)
    return tot / cnt.reshape((-1,) + (1,) * (data.ndim - 1))


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )


def segment_softmax(
    logits: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    edge_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Numerically stable softmax over edges grouped by receiver.

    Matches PyG ``softmax(src, index)`` semantics used inside GATConv:
    per-receiver max subtraction, exp, normalize. Receivers with no incoming
    edges never appear in ``segment_ids`` so no guard is needed for them; the
    denominator is clamped to avoid 0/0 on padded edges. ``edge_mask``
    excludes padded edges from both numerator and denominator.
    """
    if edge_mask is not None:
        m = edge_mask
        while m.ndim < logits.ndim:
            m = m[..., None]
        logits = jnp.where(m, logits, -jnp.inf)
    seg_max = segment_max(logits, segment_ids, num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - jnp.take(seg_max, segment_ids, axis=0)
    ex = jnp.exp(shifted)
    denom = segment_sum(ex, segment_ids, num_segments)
    denom = jnp.take(denom, segment_ids, axis=0)
    return ex / jnp.maximum(denom, 1e-16)


def spmm(
    x: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    edge_weight: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    edge_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Sparse matrix × dense matrix: ``out[i] = Σ_{(j→i)} w_e · x[j]``.

    The workhorse of every conv layer (PyG ``propagate`` equivalent).
    ``edge_weight`` broadcasts over the feature dimension; pass per-head
    weights shaped ``[E, H]`` with ``x`` shaped ``[N, H, F]`` and it
    broadcasts as ``w[..., None]``.

    Edge-partitioned mode (``axis_name`` set, inside ``shard_map``): ``x`` is
    the local node block; sender features are gathered from the
    ``all_gather`` of all blocks (senders hold *global* ids, receivers hold
    *local* ids, ``num_nodes`` is the local block size). ``edge_mask`` zeroes
    padded edges introduced by per-device edge-count padding.
    """
    if axis_name is not None:
        x_full = jax.lax.all_gather(x, axis_name, tiled=True)
        msgs = jnp.take(x_full, senders, axis=0)
    else:
        msgs = gather(x, senders)
    if edge_weight is not None:
        w = edge_weight
        while w.ndim < msgs.ndim:
            w = w[..., None]
        msgs = msgs * w
    if edge_mask is not None:
        m = edge_mask
        while m.ndim < msgs.ndim:
            m = m[..., None]
        msgs = jnp.where(m, msgs, 0.0)
    return segment_sum(msgs, receivers, num_nodes)


def sddmm_dot(
    a: jax.Array, b: jax.Array, senders: jax.Array, receivers: jax.Array
) -> jax.Array:
    """Sampled dense-dense product: per-edge ``<a[src], b[dst]>`` scores."""
    return jnp.sum(gather(a, senders) * gather(b, receivers), axis=-1)
