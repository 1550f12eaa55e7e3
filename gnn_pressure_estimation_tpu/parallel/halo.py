"""Halo-exchange node partitioning: banded message passing across devices.

The round-1 edge-partitioned path all-gathered the FULL node feature array
over the ``graph`` mesh axis every layer and aggregated with segment ops —
correct, but ~44× off the dense-path throughput.  This module replaces it for
large (banded) templates with the TPU-native design BASELINE.json names
("exchange boundary node features over ICI, overlapped with local
aggregation"):

- the RCM band layout (``ops/banded.py``) uses *uniform* window offsets:
  every 256-row block attends to rows ``[b·BLK − U, b·BLK − U + W)``;
- shard the block-row axis over the ``graph`` mesh axis in contiguous
  chunks — each device owns ``nbL`` block-rows (``chunk = nbL·BLK`` rows)
  and the matching slice of every band operator;
- each layer sends the ``U`` last rows to the right neighbor and the ``R``
  first rows to the left neighbor with two ``lax.ppermute`` rings (pure ICI
  neighbor traffic, no all-gather), concatenates them around the local
  chunk, and runs the *identical* static-slice banded kernels the single
  chip runs.  XLA's latency-hiding scheduler overlaps the permutes with the
  layer's local matmuls since only the first/last block-rows depend on them.

Communication per layer drops from ``n_pad·C`` (all-gather) to
``(U+R)·C ≤ 2W·C`` per device, independent of graph size, and the compute
path is the banded MXU path rather than gather/scatter.

The wrap-around rows a ring permute delivers to the edge devices are zeroed
(``axis_index`` select) so the result is bit-identical to the single-chip
zero-padded band program restricted to the device's rows.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gnn_pressure_estimation_tpu.core.graph import BatchedGraph, GraphTemplate
from gnn_pressure_estimation_tpu.ops import banded as bops


def halo_exchange(xb: jax.Array, U: int, R: int, axis_name: str) -> jax.Array:
    """[B, chunk, C] → [B, U + chunk + R, C] with neighbor rows over ICI.

    Left context: the previous device's last ``U`` rows; right context: the
    next device's first ``R`` rows.  Edge devices receive zeros (matching the
    single-chip zero padding of ``ops.banded.band_windows``).
    """
    gp = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    parts = []
    if U > 0:
        right_shift = [(i, (i + 1) % gp) for i in range(gp)]
        left_ctx = jax.lax.ppermute(xb[:, -U:, :], axis_name, right_shift)
        left_ctx = jnp.where(idx > 0, left_ctx, 0.0)
        parts.append(left_ctx)
    parts.append(xb)
    if R > 0:
        left_shift = [(i, (i - 1) % gp) for i in range(gp)]
        right_ctx = jax.lax.ppermute(xb[:, :R, :], axis_name, left_shift)
        right_ctx = jnp.where(idx < gp - 1, right_ctx, 0.0)
        parts.append(right_ctx)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else xb


@dataclasses.dataclass(frozen=True)
class HaloPartition:
    """Host-side band partition over ``gp`` devices."""

    gp: int
    nbL: int            # block-rows per device
    BLK: int
    W: int
    U: int              # left halo rows
    R: int              # right halo rows
    chunk: int          # nbL * BLK rows per device
    n_pad_dist: int     # gp * chunk (≥ template band n_pad)
    n_orig: int
    perm: np.ndarray    # original → band order
    band_arrays: dict   # {name: [gp, nbL, BLK, W]} device-shardable stacks
    # fused band-attention kernels for the device-local window program
    # (ops/pallas/band_attention.py); the per-device adjacency-mask slice is
    # passed to them as a traced input inside shard_map.  None when disabled
    # or when the layout's tiles exceed the kernel's VMEM guard.  The _dma
    # variant reads x windows straight from the halo-extended array.
    band_attn: object = None
    band_attn_dma: object = None
    band_spmm_dma: object = None

    def local_graph(self, arrs: dict, n_graph: int) -> BatchedGraph:
        """Device-local BatchedGraph from [1, nbL, BLK, W] sliced stacks."""
        dummy = jnp.zeros((1,), jnp.int32)
        dummyf = jnp.zeros((1,), jnp.float32)
        win_start = tuple(b * self.BLK - self.U for b in range(self.nbL))
        return BatchedGraph(
            senders=dummy, receivers=dummy, senders_sl=dummy,
            receivers_sl=dummy, inv_degree=dummyf, gcn_norm=dummyf,
            cheb_norm=dummyf, edge_attr=None,
            node_graph_id=dummy,
            n_node=n_graph * self.chunk,
            n_edge=0,
            n_graph=n_graph,
            nodes_per_graph=self.chunk,
            axis_name="graph",
            band_adj_mask=arrs["adj_mask"][0],
            band_mean=arrs["mean_band"][0],
            band_cnt=arrs["adj_cnt"][0],
            band_cnt_sl=arrs["adj_cnt_sl"][0],
            band_inv_deg=arrs["inv_degp"][0],
            band_dinv_sl=arrs["dinv_slp"][0],
            band_dinv=arrs["dinvp"][0],
            band_gcn=arrs["gcn_band"][0],
            band_cheb=arrs["cheb_band"][0],
            band_adj=arrs["adj_band"][0],
            band_win_start=win_start,
            band_W=self.W,
            band_n_pad=self.chunk,
            band_attn=self.band_attn,
            band_attn_dma=self.band_attn_dma,
            band_spmm_dma=self.band_spmm_dma,
        )


def build_halo_partition(template: GraphTemplate, gp: int) -> HaloPartition:
    """Slice the template's uniform band layout into ``gp`` contiguous
    block-row chunks (trailing chunks padded with empty blocks)."""
    bl = template.band_layout()
    nB = len(bl.win_start)
    BLK, W = bl.BLK, bl.W
    U, R = bops.halo_widths(bl.win_start, W, bl.n_pad)
    nbL = -(-nB // gp)
    chunk = nbL * BLK
    assert U <= chunk and R <= chunk, (
        f"halo ({U}/{R} rows) exceeds the per-device chunk ({chunk} rows); "
        f"use fewer graph-axis shards than gp={gp} for this template"
    )
    nB_pad = gp * nbL

    def pad_stack(a: np.ndarray) -> np.ndarray:
        out = np.zeros((nB_pad,) + a.shape[1:], a.dtype)
        out[:nB] = a
        return out.reshape(gp, nbL, *a.shape[1:])

    band_arrays = {
        "adj_mask": pad_stack(bl.adj_mask),
        "mean_band": pad_stack(bl.mean_band),
        "adj_cnt": pad_stack(bl.adj_cnt),
        "adj_cnt_sl": pad_stack(bl.adj_cnt_sl),
        "gcn_band": pad_stack(bl.gcn_band),
        "cheb_band": pad_stack(bl.cheb_band),
        "adj_band": pad_stack(bl.adj_band),
    }

    # per-device rows of the factored-band scale vectors (n_pad ≤ gp·chunk)
    def pad_rows(v: np.ndarray) -> np.ndarray:
        out = np.zeros(gp * chunk, np.float32)
        out[: len(v)] = v
        return out.reshape(gp, chunk)

    band_arrays["inv_degp"] = pad_rows(bl.inv_deg_perm)
    band_arrays["dinv_slp"] = pad_rows(bl.dinv_sl_perm)
    band_arrays["dinvp"] = pad_rows(bl.dinv_perm)
    band_attn = band_attn_dma = band_spmm_dma = None
    if os.environ.get("GNN_TPU_BAND_SPMM", "1") == "1":
        from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
            make_band_spmm_flash,
        )

        band_spmm_dma = make_band_spmm_flash(nbL, BLK, W, U)
    if os.environ.get("GNN_TPU_BAND_ATTN", "1") == "1":
        from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
            make_band_attention,
            make_band_attention_acc,
            make_band_attention_dma,
            make_band_attention_flash,
        )

        band_attn = make_band_attention(nbL, BLK, W, negative_slope=0.2)
        if os.environ.get("GNN_TPU_BAND_DMA", "1") == "1":
            mk = (
                make_band_attention_acc
                if os.environ.get("GNN_TPU_BAND_ACC", "0") == "1"
                else make_band_attention_dma
            )
            if os.environ.get("GNN_TPU_BAND_FLASH", "") == "1":
                mk = make_band_attention_flash
            band_attn_dma = mk(nbL, BLK, W, U, negative_slope=0.2)
            if band_attn_dma is None:
                # past the v2/v3 VMEM guard: W-chunked streaming kernel
                band_attn_dma = make_band_attention_flash(
                    nbL, BLK, W, U, negative_slope=0.2
                )
    return HaloPartition(
        gp=gp, nbL=nbL, BLK=BLK, W=W, U=U, R=R, chunk=chunk,
        n_pad_dist=gp * chunk, n_orig=template.n_node,
        perm=bl.perm, band_arrays=band_arrays, band_attn=band_attn,
        band_attn_dma=band_attn_dma, band_spmm_dma=band_spmm_dma,
    )
