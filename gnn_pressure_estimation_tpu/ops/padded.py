"""Scatter-free gather with a gather-based backward pass.

On TPU, XLA lowers the transpose of ``jnp.take`` (gather) to a scatter-add,
which serializes updates and dominates step time for message passing. This
module provides ``make_padded_gather``: a custom-VJP gather whose backward is
*another gather* over precomputed transpose tables:

    forward : y[i, d]  = x[idx_in[i, d]]          (in-edge slots)
    backward: x̄[j]     = Σ_e ḡ.flat[out_flat[j, e]]  (out-edge slots)

``out_flat[j]`` lists the flattened (i, d) positions where node j appears as
a sender — exactly j's out-edges in the degree-padded layout. Both directions
are O(E) gathers + masked reductions; no scatter anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_transpose_tables(idx_in: np.ndarray, mask_in: np.ndarray, n_node: int):
    """From in-edge tables [N, D] build out-edge tables (out_flat, out_mask)
    of shape [N, D_out]: flattened positions of each node's appearances."""
    N, D = idx_in.shape
    appearances: list[list[int]] = [[] for _ in range(n_node)]
    flat_idx = idx_in.reshape(-1)
    flat_mask = mask_in.reshape(-1)
    for pos in range(N * D):
        if flat_mask[pos]:
            appearances[int(flat_idx[pos])].append(pos)
    d_out = max((len(a) for a in appearances), default=1) or 1
    out_flat = np.zeros((n_node, d_out), np.int32)
    out_mask = np.zeros((n_node, d_out), bool)
    for j, a in enumerate(appearances):
        out_flat[j, : len(a)] = a
        out_mask[j, : len(a)] = True
    return out_flat, out_mask


def make_padded_gather(idx_in, out_flat, out_mask):
    """Returns ``gather(x) -> x[idx_in]`` with a gather-based VJP. The tables
    are captured as constants (one specialization per graph layout, cached by
    jit)."""
    idx_in = jnp.asarray(idx_in)
    out_flat = jnp.asarray(out_flat)
    out_mask = jnp.asarray(out_mask)

    @jax.custom_vjp
    def gather(x):
        return jnp.take(x, idx_in, axis=0)

    def fwd(x):
        return gather(x), None

    def bwd(_, g):
        # g: [N, D, ...trailing] ; flatten slot grid, gather each node's
        # out-positions, masked-sum over them.
        trailing = g.shape[2:]
        gflat = g.reshape((-1,) + trailing)
        got = jnp.take(gflat, out_flat, axis=0)  # [N, D_out, ...]
        m = out_mask.reshape(out_mask.shape + (1,) * len(trailing))
        return (jnp.sum(jnp.where(m, got, 0.0), axis=1),)

    gather.defvjp(fwd, bwd)
    return gather
