"""Static-shape graph containers for TPU message passing.

Replaces the reference's PyG ``Data`` objects and implicit DataLoader batching
(reference: gnn_pressure_estimation/utils/DataLoader.py:28-37 builds a PyG graph
template; train.py:302 batches via torch_geometric.loader.DataLoader).

TPU-first design decisions:

- All shapes are **static**. A :class:`GraphTemplate` is a host-side (NumPy)
  description of one network topology; a :class:`BatchedGraph` is the
  device-side disjoint union of ``B`` copies of one template (homogeneous
  batching). Mixing topologies is handled by bucketing at the loader level, so
  XLA sees one compiled shape per (template, batch) bucket.
- Directed edge lists are **receiver-sorted**, so every aggregation lowers to
  ``segment_sum(..., indices_are_sorted=True)`` or a Pallas CSR kernel. Row
  offsets (CSR) are carried alongside COO for kernels that want them.
- Self-loop-augmented edge lists are precomputed once per template (PyG's
  GATConv/GCNConv add self-loops per forward call at runtime; reference model
  GraphModels.py:458 relies on that default). Here it is free metadata.
- Per-edge normalization constants (GCN symmetric norm, Chebyshev scaled
  Laplacian) are template constants, computed once on host.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Optional

import jax
import numpy as np
import jax.numpy as jnp


def _sort_by_receiver(senders: np.ndarray, receivers: np.ndarray):
    order = np.argsort(receivers, kind="stable")
    return senders[order], receivers[order], order


class GraphTemplate:
    """Host-side immutable topology of one water network graph.

    Parameters
    ----------
    n_node:
        Number of nodes kept after node-type removal (reference
        DataLoader.py:40-58 ``get_keep_list``).
    senders / receivers:
        Directed edge list. For an undirected WDN both directions of each link
        must be present (mirrors ``nx.Graph(...).to_undirected()`` +
        ``pgu.from_networkx``, reference DataLoader.py:236 / utils/auxil.py:84).
    edge_attr:
        Optional ``[n_edge, d]`` per-directed-edge features (e.g. diameter,
        length — reference DataLoader.py:219-232). Must be duplicated for both
        directions by the caller.
    """

    def __init__(
        self,
        n_node: int,
        senders: np.ndarray,
        receivers: np.ndarray,
        edge_attr: Optional[np.ndarray] = None,
        node_names: Optional[list[str]] = None,
        name: str = "graph",
    ):
        senders = np.asarray(senders, dtype=np.int32)
        receivers = np.asarray(receivers, dtype=np.int32)
        assert senders.shape == receivers.shape and senders.ndim == 1
        if senders.size:
            assert senders.max() < n_node and receivers.max() < n_node

        s, r, order = _sort_by_receiver(senders, receivers)
        self.name = name
        self.n_node = int(n_node)
        self.n_edge = int(senders.size)
        self.senders = s
        self.receivers = r
        self.edge_attr = None if edge_attr is None else np.asarray(edge_attr, np.float32)[order]
        self.node_names = node_names

        # Self-loop-augmented edge list (receiver-sorted as well).
        sl = np.arange(n_node, dtype=np.int32)
        s_sl, r_sl, order_sl = _sort_by_receiver(
            np.concatenate([s, sl]), np.concatenate([r, sl])
        )
        self.n_edge_sl = self.n_edge + self.n_node
        self.senders_sl = s_sl
        self.receivers_sl = r_sl
        # Mark which augmented edges are the added self-loops (for layers that
        # weight them differently).
        is_sl = np.concatenate(
            [np.zeros(self.n_edge, bool), np.ones(self.n_node, bool)]
        )[order_sl]
        self.selfloop_mask = is_sl

        # In-degree without self-loops (SimpleConv mean aggregation,
        # reference GraphModels.py:460,466).
        deg = np.bincount(self.receivers, minlength=n_node).astype(np.float32)
        self.in_degree = deg
        with np.errstate(divide="ignore"):
            inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1.0), 0.0)
        self.inv_degree = inv.astype(np.float32)

        # GCN symmetric normalization over self-loop-augmented edges:
        # w_ij = 1/sqrt((d_i+1)(d_j+1)).  (PyG gcn_norm with add_self_loops.)
        deg_sl = deg + 1.0
        dinv_sqrt = 1.0 / np.sqrt(deg_sl)
        self.gcn_norm = (dinv_sqrt[s_sl] * dinv_sqrt[r_sl]).astype(np.float32)

        # Chebyshev scaled Laplacian, sym normalization, lambda_max = 2.0
        # (PyG ChebConv default):  L~ = L_sym - I = -D^{-1/2} A D^{-1/2},
        # i.e. off-diagonal edge weight -1/sqrt(d_i d_j) and zero diagonal.
        with np.errstate(divide="ignore"):
            dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1.0)), 0.0)
        self.cheb_norm = (-(dinv[s] * dinv[r])).astype(np.float32)

        # CSR row offsets for receiver-sorted edges (per-node neighbor ranges).
        self.row_offsets = np.concatenate(
            [[0], np.cumsum(np.bincount(self.receivers, minlength=n_node))]
        ).astype(np.int32)
        self.row_offsets_sl = np.concatenate(
            [[0], np.cumsum(np.bincount(self.receivers_sl, minlength=n_node))]
        ).astype(np.int32)

        self._batch_cache: dict[Any, "BatchedGraph"] = {}
        self._dense_cache: Optional[dict] = None
        self._degree_cache: Optional[dict] = None

    # Node count below which aggregation runs as dense [n, n] operator
    # matmuls on the MXU instead of gather/segment ops. XLA's TPU scatter
    # lowering serializes updates (~2 ms per scatter on a v5e for these
    # sizes), so for WDN-scale graphs dense masked attention is ~50× faster
    # despite the O(n²) arithmetic.
    DENSE_THRESHOLD = 1024

    def dense_operators(self) -> dict:
        """Template-level [n, n] operators shared by every graph in a batch:
        adjacency mask with self-loops (GAT attention mask), row-normalized
        mean (SimpleConv), GCN symmetric norm with self-loops, Chebyshev
        scaled Laplacian, raw adjacency (GIN)."""
        if self._dense_cache is not None:
            return self._dense_cache
        n = self.n_node
        A = np.zeros((n, n), np.float32)
        # accumulate (not assign): parallel links are legal in EPANET INPs
        # and must keep their multiplicity, matching the segment paths
        np.add.at(A, (self.receivers, self.senders), 1.0)
        adj_sl = (A + np.eye(n, dtype=np.float32)) > 0
        mean_mat = A * self.inv_degree[:, None]
        deg_sl = self.in_degree + 1.0
        dinv = 1.0 / np.sqrt(deg_sl)
        gcn_mat = (A + np.eye(n, dtype=np.float32)) * dinv[:, None] * dinv[None, :]
        with np.errstate(divide="ignore"):
            dq = np.where(self.in_degree > 0, 1.0 / np.sqrt(np.maximum(self.in_degree, 1.0)), 0.0)
        cheb_mat = -(A * dq[:, None] * dq[None, :])
        self._dense_cache = {
            "adj_sl_mask": adj_sl,
            "mean_mat": mean_mat.astype(np.float32),
            "gcn_mat": gcn_mat.astype(np.float32),
            "cheb_mat": cheb_mat.astype(np.float32),
            "adj_mat": A,
        }
        return self._dense_cache

    @property
    def max_degree(self) -> int:
        return int(self.in_degree.max()) if self.n_node else 0

    def degree_tables(self) -> dict:
        """Degree-padded edge layout: every node's incoming edges padded to
        the max in-degree, so aggregation is gather + masked reduce over a
        fixed axis — no scatter at any graph size (the padded-CSR layout the
        BASELINE names). Self-loop variant appends one extra slot holding the
        node itself (always valid)."""
        if self._degree_cache is not None:
            return self._degree_cache
        n = self.n_node
        D = max(self.max_degree, 1)
        senders_dp = np.zeros((n, D), np.int32)
        mask_dp = np.zeros((n, D), bool)
        cheb_dp = np.zeros((n, D), np.float32)
        slot = np.zeros(n, np.int32)
        for s, r, cw in zip(self.senders, self.receivers, self.cheb_norm):
            j = slot[r]
            senders_dp[r, j] = s
            mask_dp[r, j] = True
            cheb_dp[r, j] = cw
            slot[r] += 1
        # self-loop slot appended last
        senders_sl = np.concatenate(
            [senders_dp, np.arange(n, dtype=np.int32)[:, None]], axis=1
        )
        mask_sl = np.concatenate([mask_dp, np.ones((n, 1), bool)], axis=1)
        # gcn weights per padded slot (incl self-loop slot)
        deg_sl = self.in_degree + 1.0
        dinv = (1.0 / np.sqrt(deg_sl)).astype(np.float32)
        gcn_dp = np.where(mask_dp, dinv[:, None] * dinv[senders_dp], 0.0)
        gcn_sl = np.concatenate([gcn_dp, (dinv * dinv)[:, None]], axis=1).astype(np.float32)
        from gnn_pressure_estimation_tpu.ops.padded import build_transpose_tables

        out_flat, out_mask = build_transpose_tables(senders_dp, mask_dp, n)
        out_flat_sl, out_mask_sl = build_transpose_tables(
            senders_sl.astype(np.int32), mask_sl, n
        )
        self._degree_cache = {
            "senders_dp": senders_dp,
            "mask_dp": mask_dp,
            "senders_dp_sl": senders_sl.astype(np.int32),
            "mask_dp_sl": mask_sl,
            "gcn_dp_sl": gcn_sl,
            "cheb_dp": cheb_dp,
            "out_flat": out_flat,
            "out_mask": out_mask,
            "out_flat_sl": out_flat_sl,
            "out_mask_sl": out_mask_sl,
        }
        return self._degree_cache

    def band_layout(self, block: Optional[int] = None,
                    lane: Optional[int] = None):
        """RCM band layout, cached per (block, lane).

        ``block=None`` resolves to the template's *default layout*: the
        (block, lane) most recently requested **explicitly** through this
        method (e.g. by a Trainer built with ``band_block=64``), falling back
        to (256, 128).  The default is tracked explicitly rather than by
        cache insertion order, so building an auxiliary layout elsewhere
        cannot silently change what ``batch(mode="banded")`` or
        ``build_halo_partition`` later see.  An explicitly passed ``lane``
        always wins over the stored default's lane.
        """
        if not hasattr(self, "_band_cache") or self._band_cache is None:
            self._band_cache = {}
        if block is None:
            d_block, d_lane = getattr(self, "_band_default", None) or (256, 128)
            block, lane = d_block, (lane if lane is not None else d_lane)
        else:
            lane = 128 if lane is None else lane
            self._band_default = (block, lane)
        key = (block, lane)
        if key not in self._band_cache:
            from gnn_pressure_estimation_tpu.ops.banded import build_band_layout

            self._band_cache[key] = build_band_layout(self, block=block, lane=lane)
        return self._band_cache[key]

    def batch(
        self,
        batch_size: int,
        edge_attr_override: Optional[np.ndarray] = None,
        dense: Optional[bool] = None,
        mode: Optional[str] = None,
        band_block: Optional[int] = None,
    ) -> "BatchedGraph":
        """Disjoint union of ``batch_size`` copies of this template.

        All index arrays stay receiver-sorted globally because graph ``g``'s
        nodes occupy the contiguous id range ``[g*n, (g+1)*n)``.

        ``mode``: ``dense`` ([n,n] operators, small templates) | ``banded``
        (RCM band windows, large templates) | ``padded`` (degree-padded
        custom-VJP gathers) | ``auto`` (dense below :attr:`DENSE_THRESHOLD`,
        banded above). ``dense=True/False`` is the legacy switch
        (True → dense, False → padded).
        """
        if mode is None:
            if dense is None:
                mode = "dense" if self.n_node <= self.DENSE_THRESHOLD else "banded"
            else:
                mode = "dense" if dense else "padded"
        dense = mode == "dense"
        key = (batch_size, edge_attr_override is None, mode, band_block)
        if key in self._batch_cache and edge_attr_override is None:
            return self._batch_cache[key]

        B, n, e = batch_size, self.n_node, self.n_edge
        offs_n = (np.arange(B, dtype=np.int32) * n)[:, None]

        senders = (self.senders[None, :] + offs_n).reshape(-1)
        receivers = (self.receivers[None, :] + offs_n).reshape(-1)
        senders_sl = (self.senders_sl[None, :] + offs_n).reshape(-1)
        receivers_sl = (self.receivers_sl[None, :] + offs_n).reshape(-1)

        ea = edge_attr_override if edge_attr_override is not None else self.edge_attr
        edge_attr = None if ea is None else np.tile(np.asarray(ea, np.float32), (B, 1))

        dense_ops = {}
        if mode == "dense" and os.environ.get("GNN_TPU_FUSED_ATTN", "0") == "1":
            # opt-in: at WDN scale XLA's fused einsum attention measured faster
            # (7.3 vs 8.5 ms/step) than the per-graph Pallas kernel; the kernel
            # is kept for larger per-graph n where logits traffic dominates
            from gnn_pressure_estimation_tpu.ops.pallas.graph_attention import (
                make_fused_attention,
            )

            d0 = self.dense_operators()
            dense_ops["fused_attn"] = make_fused_attention(
                d0["adj_sl_mask"], negative_slope=0.2
            )
        if mode == "dense" and os.environ.get("GNN_TPU_FUSED_FACTORED", "0") == "1":
            # opt-in (round 3): fused kernel for the factored rewrite — the
            # 0/1 gate stays in VMEM instead of round-tripping HBM as the
            # two dot operands; slope-independent, zero-gradient gate
            from gnn_pressure_estimation_tpu.ops.pallas.graph_attention import (
                make_fused_factored,
            )

            d0 = self.dense_operators()
            dense_ops["fused_factored"] = make_fused_factored(
                np.asarray(d0["adj_sl_mask"])
            )
        if mode == "banded":
            bl = self.band_layout(band_block)
            band_attn = band_attn_dma = band_spmm_dma = None
            if os.environ.get("GNN_TPU_BAND_SPMM", "1") == "1":
                # chunked-DMA band SpMM for the parameter-free aggregations
                # (mean/GCN/Cheb/adj bands): removes the [nB,B,W,C] window
                # materialization; the layer routes here only when C is
                # lane-aligned (C % 128 == 0)
                from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
                    make_band_spmm_flash,
                )
                from gnn_pressure_estimation_tpu.ops.banded import halo_widths

                U_sp, _ = halo_widths(bl.win_start, bl.W, bl.n_pad)
                band_spmm_dma = make_band_spmm_flash(
                    *bl.adj_mask.shape, U_sp
                )
            if os.environ.get("GNN_TPU_BAND_ATTN", "1") == "1":
                # default-on; the layer only routes here when its head·channel
                # width fills the 128-lane grid (measured: GATRes-large
                # bigtown 97.0 → 70.5 ms; GATRes-small (H·C=32) would lose,
                # 50.0 → 85.1 ms, and stays on the XLA band path)
                from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
                    make_band_attention,
                    make_band_attention_acc,
                    make_band_attention_dma,
                    make_band_attention_flash,
                )
                from gnn_pressure_estimation_tpu.ops.banded import halo_widths

                band_attn = make_band_attention(
                    *bl.adj_mask.shape, negative_slope=0.2
                )
                if os.environ.get("GNN_TPU_BAND_DMA", "1") == "1":
                    U, _R = halo_widths(bl.win_start, bl.W, bl.n_pad)
                    # v3 (sliding-accumulator backward) unless disabled;
                    # v2 keeps the windowed-dx backward as the fallback
                    mk = (
                        make_band_attention_acc
                        if os.environ.get("GNN_TPU_BAND_ACC", "0") == "1"
                        else make_band_attention_dma
                    )
                    if os.environ.get("GNN_TPU_BAND_FLASH", "") == "1":
                        mk = make_band_attention_flash
                    band_attn_dma = mk(
                        *bl.adj_mask.shape, U, negative_slope=0.2
                    )
                    if band_attn_dma is None:
                        # BLK·W_pad past the v2/v3 VMEM guard (large-W
                        # networks at BLK ≥ 256): the W-chunked streaming-
                        # softmax kernel compiles at any size
                        band_attn_dma = make_band_attention_flash(
                            *bl.adj_mask.shape, U, negative_slope=0.2
                        )
            dense_ops = {
                "band_attn": band_attn,
                "band_attn_dma": band_attn_dma,
                "band_spmm_dma": band_spmm_dma,
                "band_adj_mask": jnp.asarray(bl.adj_mask),
                "band_mean": jnp.asarray(bl.mean_band),
                # factored bands: int8 edge counts + row/col scale vectors,
                # so the SpMM kernel streams 4× fewer band bytes per cell
                "band_cnt": jnp.asarray(bl.adj_cnt),
                "band_cnt_sl": jnp.asarray(bl.adj_cnt_sl),
                "band_inv_deg": jnp.asarray(bl.inv_deg_perm),
                "band_dinv_sl": jnp.asarray(bl.dinv_sl_perm),
                "band_dinv": jnp.asarray(bl.dinv_perm),
                "band_gcn": jnp.asarray(bl.gcn_band),
                "band_cheb": jnp.asarray(bl.cheb_band),
                "band_adj": jnp.asarray(bl.adj_band),
                "band_perm": jnp.asarray(bl.perm),
                "band_inv_perm": jnp.asarray(bl.inv_perm),
                "band_win_start": bl.win_start,
                "band_W": bl.W,
                "band_n_pad": bl.n_pad,
            }
            # segment index arrays in banded (perm+pad) node space, receiver
            # re-sorted, so segment-path layers (e.g. m_GCN) stay correct
            inv = bl.inv_perm.astype(np.int32)
            offs_p = (np.arange(B, dtype=np.int32) * bl.n_pad)[:, None]
            s_p, r_p, order = _sort_by_receiver(inv[self.senders], inv[self.receivers])
            s_sl_p, r_sl_p, order_sl = _sort_by_receiver(
                inv[self.senders_sl], inv[self.receivers_sl]
            )
            inv_deg_p = np.zeros(bl.n_pad, np.float32)
            inv_deg_p[inv] = self.inv_degree
            # edge features ride along in the re-sorted segment order so
            # edge-feature models (m_GCN) stay correct in banded mode
            ea_src = edge_attr_override if edge_attr_override is not None else self.edge_attr
            ea_banded = (
                None if ea_src is None
                else jnp.asarray(np.tile(np.asarray(ea_src, np.float32)[order], (B, 1)))
            )
            g = BatchedGraph(
                senders=jnp.asarray((s_p[None, :] + offs_p).reshape(-1)),
                receivers=jnp.asarray((r_p[None, :] + offs_p).reshape(-1)),
                senders_sl=jnp.asarray((s_sl_p[None, :] + offs_p).reshape(-1)),
                receivers_sl=jnp.asarray((r_sl_p[None, :] + offs_p).reshape(-1)),
                inv_degree=jnp.asarray(np.tile(inv_deg_p, B)),
                gcn_norm=jnp.asarray(np.tile(self.gcn_norm[order_sl], B)),
                cheb_norm=jnp.asarray(np.tile(self.cheb_norm[order], B)),
                edge_attr=ea_banded,
                node_graph_id=jnp.repeat(jnp.arange(B, dtype=jnp.int32), bl.n_pad),
                n_node=B * bl.n_pad,
                n_edge=B * self.n_edge,
                n_graph=B,
                nodes_per_graph=bl.n_pad,
                **dense_ops,
            )
            self._batch_cache[key] = g
            return g
        if dense:
            d = self.dense_operators()
            dense_ops |= {
                "adj_sl_mask": jnp.asarray(d["adj_sl_mask"]),
                "mean_mat": jnp.asarray(d["mean_mat"]),
                "gcn_mat": jnp.asarray(d["gcn_mat"]),
                "cheb_mat": jnp.asarray(d["cheb_mat"]),
                "adj_mat": jnp.asarray(d["adj_mat"]),
            }
        else:
            # degree-padded tables (scatter-free path for large graphs)
            from gnn_pressure_estimation_tpu.ops.padded import make_padded_gather

            dt = self.degree_tables()
            offs3 = (np.arange(B, dtype=np.int32) * n)[:, None, None]
            D = dt["senders_dp"].shape[1]
            senders_dp_b = (dt["senders_dp"][None] + offs3).reshape(-1, D)
            senders_sl_b = (dt["senders_dp_sl"][None] + offs3).reshape(-1, D + 1)
            # transpose tables: flattened slot positions shift by b*n*D(+1)
            offs_f = (np.arange(B, dtype=np.int32) * (n * D))[:, None, None]
            out_flat_b = (dt["out_flat"][None] + offs_f).reshape(-1, dt["out_flat"].shape[1])
            offs_f_sl = (np.arange(B, dtype=np.int32) * (n * (D + 1)))[:, None, None]
            out_flat_sl_b = (dt["out_flat_sl"][None] + offs_f_sl).reshape(
                -1, dt["out_flat_sl"].shape[1]
            )
            dense_ops = {
                "senders_dp": jnp.asarray(senders_dp_b),
                "mask_dp": jnp.asarray(np.tile(dt["mask_dp"], (B, 1))),
                "senders_dp_sl": jnp.asarray(senders_sl_b),
                "mask_dp_sl": jnp.asarray(np.tile(dt["mask_dp_sl"], (B, 1))),
                "gcn_dp_sl": jnp.asarray(np.tile(dt["gcn_dp_sl"], (B, 1))),
                "cheb_dp": jnp.asarray(np.tile(dt["cheb_dp"], (B, 1))),
                "gather_dp": make_padded_gather(
                    senders_dp_b, out_flat_b, np.tile(dt["out_mask"], (B, 1))
                ),
                "gather_dp_sl": make_padded_gather(
                    senders_sl_b, out_flat_sl_b, np.tile(dt["out_mask_sl"], (B, 1))
                ),
            }

        g = BatchedGraph(
            senders=jnp.asarray(senders),
            receivers=jnp.asarray(receivers),
            senders_sl=jnp.asarray(senders_sl),
            receivers_sl=jnp.asarray(receivers_sl),
            inv_degree=jnp.asarray(np.tile(self.inv_degree, B)),
            gcn_norm=jnp.asarray(np.tile(self.gcn_norm, B)),
            cheb_norm=jnp.asarray(np.tile(self.cheb_norm, B)),
            edge_attr=None if edge_attr is None else jnp.asarray(edge_attr),
            node_graph_id=jnp.repeat(jnp.arange(B, dtype=jnp.int32), n),
            n_node=B * n,
            n_edge=B * e,
            n_graph=B,
            nodes_per_graph=n,
            **dense_ops,
        )
        if edge_attr_override is None:
            self._batch_cache[key] = g
        return g


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "senders",
        "receivers",
        "senders_sl",
        "receivers_sl",
        "inv_degree",
        "gcn_norm",
        "cheb_norm",
        "edge_attr",
        "node_graph_id",
        "edge_mask",
        "edge_mask_sl",
        "adj_sl_mask",
        "mean_mat",
        "gcn_mat",
        "cheb_mat",
        "adj_mat",
        "senders_dp",
        "mask_dp",
        "senders_dp_sl",
        "mask_dp_sl",
        "gcn_dp_sl",
        "cheb_dp",
        "band_adj_mask",
        "band_mean",
        "band_cnt",
        "band_cnt_sl",
        "band_inv_deg",
        "band_dinv_sl",
        "band_dinv",
        "band_gcn",
        "band_cheb",
        "band_adj",
        "band_perm",
        "band_inv_perm",
    ],
    meta_fields=["n_node", "n_edge", "n_graph", "nodes_per_graph", "axis_name",
                 "gather_dp", "gather_dp_sl", "fused_attn", "fused_factored",
                 "band_attn",
                 "band_attn_dma", "band_spmm_dma",
                 "band_win_start", "band_W", "band_n_pad"],
)
@dataclasses.dataclass(frozen=True)
class BatchedGraph:
    """Device-side disjoint union of ``n_graph`` same-topology graphs.

    ``senders``/``receivers`` exclude self-loops; ``*_sl`` variants include one
    self-loop per node (receiver-sorted). Static metadata (``n_node`` etc.) is
    part of the jit cache key, so one compilation serves every step.

    Edge-partitioned mode (``axis_name`` set, used inside ``shard_map`` over a
    "graph" mesh axis): this instance describes one device's node block —
    ``receivers`` are local ids in ``[0, n_node)``, ``senders`` are *global*
    ids into the all-gathered feature array, and ``edge_mask``/``edge_mask_sl``
    flag real (non-padding) edges. See ``parallel/edgepart.py``.
    """

    senders: jax.Array
    receivers: jax.Array
    senders_sl: jax.Array
    receivers_sl: jax.Array
    inv_degree: jax.Array
    gcn_norm: jax.Array
    cheb_norm: jax.Array
    edge_attr: Optional[jax.Array]
    node_graph_id: jax.Array
    n_node: int
    n_edge: int
    n_graph: int
    nodes_per_graph: int
    edge_mask: Optional[jax.Array] = None
    edge_mask_sl: Optional[jax.Array] = None
    # Dense-operator mode (small templates): [n, n] template-level matrices,
    # shared by all graphs in the batch; layers reshape x to [B, n, C] and
    # aggregate with batched matmuls on the MXU instead of gather/scatter.
    adj_sl_mask: Optional[jax.Array] = None
    mean_mat: Optional[jax.Array] = None
    gcn_mat: Optional[jax.Array] = None
    cheb_mat: Optional[jax.Array] = None
    adj_mat: Optional[jax.Array] = None
    # Degree-padded layout (large graphs): [N, D(+1)] sender tables + masks.
    senders_dp: Optional[jax.Array] = None
    mask_dp: Optional[jax.Array] = None
    senders_dp_sl: Optional[jax.Array] = None
    mask_dp_sl: Optional[jax.Array] = None
    gcn_dp_sl: Optional[jax.Array] = None
    cheb_dp: Optional[jax.Array] = None
    axis_name: Optional[str] = None
    # scatter-free gathers with gather-based VJPs (ops/padded.py); static
    # (meta) so they specialize the jit cache per graph layout
    gather_dp: Optional[Any] = None
    gather_dp_sl: Optional[Any] = None

    # Banded (RCM local-attention) layout — large templates; see ops/banded.py
    band_adj_mask: Optional[jax.Array] = None
    band_mean: Optional[jax.Array] = None
    # factored bands (mean/gcn/cheb/adj = row⊙counts⊙col, ops/banded.py
    # BandLayout): the kernel path reads the int8 counts and applies the
    # scale vectors outside — 4× less band traffic per grid cell
    band_cnt: Optional[jax.Array] = None
    band_cnt_sl: Optional[jax.Array] = None
    band_inv_deg: Optional[jax.Array] = None
    band_dinv_sl: Optional[jax.Array] = None
    band_dinv: Optional[jax.Array] = None
    band_gcn: Optional[jax.Array] = None
    band_cheb: Optional[jax.Array] = None
    band_adj: Optional[jax.Array] = None
    band_perm: Optional[jax.Array] = None
    band_inv_perm: Optional[jax.Array] = None
    band_win_start: Optional[tuple] = None
    band_W: int = 0
    band_n_pad: int = 0
    # fused masked-attention kernel (ops/pallas/graph_attention.py), built
    # for dense-mode graphs; static (meta) like the padded gathers
    fused_attn: Optional[Any] = None
    # fused factored-rewrite aggregation kernel (make_fused_factored):
    # (a_d, a_s, rhs_v, rhs_q) -> (P@rhs_v, (M-P)@rhs_q), gate VMEM-only
    fused_factored: Optional[Any] = None
    # fused banded-attention kernel (ops/pallas/band_attention.py), built
    # for banded-mode graphs; static (meta) like fused_attn
    band_attn: Optional[Any] = None
    # v2 variant: x windows DMA'd from the extended node array (no
    # materialized window tensor); preferred by the layer when lane-aligned
    band_attn_dma: Optional[Any] = None
    # chunked-DMA band SpMM (make_band_spmm_flash) for the parameter-free
    # band aggregations; zero band-cotangent by contract (graph constants)
    band_spmm_dma: Optional[Any] = None

    @property
    def dense(self) -> bool:
        return self.mean_mat is not None

    @property
    def padded(self) -> bool:
        return self.senders_dp is not None and self.axis_name is None

    @property
    def banded(self) -> bool:
        return self.band_adj_mask is not None and self.axis_name is None

    @property
    def halo(self) -> bool:
        """Distributed banded mode: this instance holds one device's block-row
        slice of the band; window extensions come from neighbor devices via
        ppermute halo exchange (parallel/halo.py) instead of zero padding."""
        return self.band_adj_mask is not None and self.axis_name is not None

    # -- banded-space packing (caller-side, once per step) -----------------
    def pack_nodes(self, x_flat: jax.Array, n_orig: int) -> jax.Array:
        """[B*n_orig, C] original order → [B*n_pad, C] perm+padded."""
        B = self.n_graph
        xb = x_flat.reshape(B, n_orig, -1)
        xb = jnp.take(xb, self.band_perm, axis=1)
        xb = jnp.pad(xb, ((0, 0), (0, self.band_n_pad - n_orig), (0, 0)))
        return xb.reshape(B * self.band_n_pad, -1)

    def unpack_nodes(self, x_flat: jax.Array, n_orig: int) -> jax.Array:
        B = self.n_graph
        xb = x_flat.reshape(B, self.band_n_pad, -1)[:, : n_orig]
        xb = jnp.take(xb, self.band_inv_perm, axis=1)
        return xb.reshape(B * n_orig, -1)

    @property
    def n_edge_sl(self) -> int:
        return self.senders_sl.shape[-1] if self.senders_sl.ndim else self.n_edge + self.n_node
