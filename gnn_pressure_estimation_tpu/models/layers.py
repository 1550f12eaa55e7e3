"""Graph conv layers as Flax modules over the framework's segment ops.

Semantics mirror the PyG layers the reference stacks (GraphModels.py:3 imports
GATConv, GINConv, ChebConv, GCN2Conv, SimpleConv) but the implementations are
TPU-native: receiver-sorted COO + static-shape segment reductions, no
MessagePassing machinery. Attention math matches PyG GATConv (LeakyReLU 0.2,
self-loops added, per-receiver softmax).

Parameter initialization uses glorot-uniform for conv weights and zeros for
biases (PyG GATConv/ChebConv convention). Exact torch kaiming init of
torch.nn.Linear is not reproduced — models here are trained from scratch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from gnn_pressure_estimation_tpu.core.graph import BatchedGraph
from gnn_pressure_estimation_tpu import ops
from gnn_pressure_estimation_tpu.ops import banded as bops

glorot = nn.initializers.glorot_uniform()
zeros = nn.initializers.zeros
# torch.nn.Linear / PyG dense.Linear default: kaiming_uniform(a=√5) =
# U(±1/√fan_in).  The reference's custom MLP (GraphModels.py:264-275, used
# by GIN and m_GCN's GENConvolution) inherits this — glorot here is ~2.4×
# hotter per layer, which compounds to a ~1e12 initial loss over 15
# sum-aggregation GIN blocks (no norm layers anywhere in the zoo).
torch_linear = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

NEG_INF = -1e9  # mask value for dense attention (finite: avoids inf-nan)


def _padded_weighted_agg(gather_fn, x: jax.Array, w_dp: jax.Array) -> jax.Array:
    """Σ_d w[n,d] · x[senders[n,d]] — degree-padded weighted aggregation
    (weights are zero on padding slots by construction). ``gather_fn`` is the
    graph's scatter-free custom-VJP gather."""
    nbr = gather_fn(x)                             # [N, D, C]
    return jnp.einsum("nd,ndc->nc", w_dp, nbr)


def _windows(xb: jax.Array, graph: BatchedGraph) -> jax.Array:
    """[B, n_loc, C] → [nB, B, W, C] band windows.  In halo mode the window
    extension rows come from neighbor devices over ICI (ppermute) instead of
    zero padding — same static-slice program either way."""
    if graph.halo:
        from gnn_pressure_estimation_tpu.parallel.halo import halo_exchange

        nB = len(graph.band_win_start)
        BLK = graph.band_n_pad // nB
        U, R = bops.halo_widths(graph.band_win_start, graph.band_W,
                                graph.band_n_pad)
        x_ext = halo_exchange(xb, U, R, graph.axis_name)
        return bops.band_windows_ext(x_ext, nB, BLK, graph.band_W)
    return bops.band_windows(xb, graph.band_win_start, graph.band_W)


def _band_agg(kind: str, x: jax.Array, graph: BatchedGraph) -> jax.Array:
    """Banded-dense aggregation: static window slices + batched matmul
    (ops/banded.py). x is in perm+padded node space. ``kind`` names the
    parameter-free band ("adj" | "mean" | "gcn" | "cheb") — an explicit tag,
    not the array, so the factored substitution below survives graphs whose
    leaves were copied (device_put/tree_map) rather than aliased. When the
    chunked-DMA SpMM kernel is attached and the channel width is
    lane-aligned, the window tensor is never materialized (band weights are
    graph constants — the kernel's zero band-cotangent is exact here)."""
    band = getattr(graph, f"band_{kind}")
    B, n_pad = graph.n_graph, graph.band_n_pad
    xb = x.reshape(B, n_pad, -1)
    if graph.band_spmm_dma is not None and xb.shape[-1] % 128 == 0:
        # Factored substitution: every parameter-free band is
        # rowscale ⊙ int8-counts ⊙ colscale (ops/banded.py BandLayout), so
        # the kernel streams 4× fewer band bytes per grid cell; the scale
        # passes fuse into neighboring XLA ops.
        rs = cs = None
        if graph.band_cnt is not None:
            if kind == "adj":
                band = graph.band_cnt            # values identical
            elif kind == "mean":
                band, rs = graph.band_cnt, graph.band_inv_deg
            elif kind == "gcn" and graph.band_cnt_sl is not None:
                band = graph.band_cnt_sl
                rs = cs = graph.band_dinv_sl
            elif kind == "cheb":
                band, cs = graph.band_cnt, graph.band_dinv
                rs = -graph.band_dinv
        if cs is not None:
            xb = xb * cs[None, :, None]
        U, R = bops.halo_widths(graph.band_win_start, graph.band_W, n_pad)
        if graph.halo:
            from gnn_pressure_estimation_tpu.parallel.halo import halo_exchange

            x_ext = halo_exchange(xb, U, R, graph.axis_name)
        else:
            x_ext = jnp.pad(xb, ((0, 0), (U, R), (0, 0)))
        out = graph.band_spmm_dma(band, x_ext)
        if rs is not None:
            out = out * rs[None, :, None]
        return out.reshape(B * n_pad, -1)
    wins = _windows(xb, graph)
    return bops.band_spmm(band, wins).reshape(B * n_pad, -1)


def _dense_agg(mat: jax.Array, x: jax.Array, graph: BatchedGraph) -> jax.Array:
    """Aggregate with a template-level [n, n] operator as a batched matmul:
    out[b] = mat @ x[b]. The MXU path for small graphs — XLA's TPU scatter
    lowering serializes updates, so gather/segment aggregation is ~50× slower
    at WDN scale (see GraphTemplate.DENSE_THRESHOLD)."""
    B, n = graph.n_graph, graph.nodes_per_graph
    xb = x.reshape(B, n, -1)
    out = jnp.einsum("ij,bjc->bic", mat, xb)
    return out.reshape(B * n, -1)


class GATConv(nn.Module):
    """Graph attention conv (Velickovic et al.), PyG-compatible semantics.

    Reference usage: GraphModels.py:458-459 (2-head concat → 1-head) inside
    every GATRes block, and the plain GAT baseline (GraphModels.py:210-230).

    out[i] = Σ_{j∈N(i)∪{i}} α_ij · (W x_j)  per head, heads concatenated or
    averaged, plus bias. α = softmax_i(LeakyReLU(a_s·Wx_j + a_d·Wx_i)).
    """

    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    add_self_loops: bool = True
    dtype: jnp.dtype = jnp.float32
    # storage dtype for the materialized [B,n,n,H] attention tensor on the
    # dense path (softmax math stays f32); bf16 halves its HBM round-trips
    attn_dtype: Optional[jnp.dtype] = None
    # Dense-path attention implementation (see BASELINE.md roofline notes):
    #   "softmax"  — materialized logits → jax.nn.softmax → einsum (the
    #                original formulation; ~2.5 fused HBM passes per layer
    #                over the [B,n,n,H] chain).
    #   "onepass"  — materialize the softmax *numerator* exactly once: the
    #                row max comes from the sender halves alone (leaky_relu
    #                is monotone, so max_j lrelu(a_d[i]+a_s[j]) =
    #                lrelu(a_d[i] + max_{j∈N(i)} a_s[j])), the max is
    #                stop_gradient'ed (softmax is shift-invariant → exact),
    #                and 1/Z is applied after the aggregation matmul.
    #                Fewer HBM bytes, but the n² exp chain is VPU-bound.
    #   "factored" — exp(lrelu(a_d+a_s)) = [s≥0]·e^{a_d}e^{a_s} +
    #                [s<0]·e^{αa_d}e^{αa_s}: the numerator splits into two
    #                rank-1 products gated by the 0/1 sign matrix
    #                P = A·[s≥0] (which has zero gradient).  All
    #                transcendentals collapse to per-node vectors; the only
    #                n² elementwise work is one compare, and the rest is
    #                MXU matmuls against P and the static adjacency.  Same
    #                math as "softmax" up to fp rounding.
    # On the *banded* path "factored" intentionally falls back to the
    # windowed softmax: the rewrite loses there (bigtown b4 large: 138.8 ms
    # factored-f32 vs 97.0 softmax — the band windows are already narrow, so
    # the saved transcendentals don't pay for the doubled matmul width; see
    # BASELINE.md).  "band_factored" opts the banded branch in anyway
    # (exact; ties softmax only with attn_dtype=bfloat16 stores).
    attn_impl: str = "softmax"
    # Storage dtype for the 0/1 gate matrix P on the "factored" path.  P's
    # values are exactly representable in bfloat16, so the default halves
    # the dominant [B,n,n,H] HBM traffic of the (memory-bound) factored step
    # losslessly: the mixed bf16×f32 dot_general consumes the bf16 operand
    # natively (no materialized upcast — verified in the jaxpr) and
    # accumulates in f32.  None keeps P in the attention store dtype.
    gate_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, graph: BatchedGraph) -> jax.Array:
        H, C = self.heads, self.out_channels
        w = self.param("w", glorot, (x.shape[-1], H * C), jnp.float32)
        att_src = self.param("att_src", glorot, (1, H, C), jnp.float32)
        att_dst = self.param("att_dst", glorot, (1, H, C), jnp.float32)
        bias = self.param("bias", zeros, (H * C if self.concat else C,), jnp.float32)

        if self.add_self_loops:
            senders, receivers = graph.senders_sl, graph.receivers_sl
            emask = graph.edge_mask_sl
        else:
            senders, receivers = graph.senders, graph.receivers
            emask = graph.edge_mask
        ax = graph.axis_name

        xp = (x.astype(self.dtype) @ w.astype(self.dtype)).reshape(-1, H, C)
        # Per-node attention logit halves (SDDMM against the attention vectors
        # collapses to one [N,H] reduction each because a_s/a_d are rank-1).
        alpha_src = jnp.sum(xp * att_src.astype(self.dtype), axis=-1)  # [N, H]
        alpha_dst = jnp.sum(xp * att_dst.astype(self.dtype), axis=-1)  # [N, H]

        if graph.dense and ax is None and self.add_self_loops:
            # Dense masked attention (the MXU path): logits over all pairs,
            # adjacency mask, softmax over senders, batched matmul aggregate.
            B, n = graph.n_graph, graph.nodes_per_graph
            xp_b = xp.reshape(B, n, H, C)
            a_s = alpha_src.reshape(B, n, H)
            a_d = alpha_dst.reshape(B, n, H)
            if graph.fused_attn is not None and self.negative_slope == 0.2:
                # fused Pallas kernel: logits/softmax/P@V stay in VMEM
                out = graph.fused_attn(
                    a_d,
                    a_s.transpose(0, 2, 1),
                    xp_b.transpose(0, 2, 1, 3),
                )  # [B, H, n, C]
                out = out.transpose(0, 2, 1, 3).reshape(-1, H, C).astype(self.dtype)
            elif self.attn_impl == "onepass":
                store = self.attn_dtype or self.dtype
                mask = graph.adj_sl_mask[None, :, :, None]
                ms = jnp.max(
                    jnp.where(mask, a_s[:, None, :, :], NEG_INF), axis=2
                )                                                  # [B, i, H]
                m = jax.lax.stop_gradient(
                    nn.leaky_relu(a_d + ms, self.negative_slope)
                )
                y = nn.leaky_relu(
                    a_d[:, :, None, :] + a_s[:, None, :, :], self.negative_slope
                )
                num = jnp.where(
                    mask, jnp.exp(y - m[:, :, None, :]), 0.0
                ).astype(store)                                    # [B, i, j, H]
                z = jnp.sum(num, axis=2, dtype=jnp.float32)        # [B, i, H]
                out = jnp.einsum(
                    "bijh,bjhc->bihc", num, xp_b.astype(store),
                    preferred_element_type=jnp.float32,
                )
                out = (out / z[:, :, :, None]).astype(self.dtype).reshape(-1, H, C)
            elif self.attn_impl in ("factored", "band_factored"):
                # Working range: exp of per-node logit halves must stay
                # finite in f32 (|a| ≲ 80 after the row-max shift) — holds
                # by orders of magnitude for trained GATs; the softmax path
                # is the fallback for adversarial logit scales.
                store = self.attn_dtype or self.dtype
                al = self.negative_slope
                mask = graph.adj_sl_mask[None, :, :, None]
                ms = jnp.max(
                    jnp.where(mask, a_s[:, None, :, :], NEG_INF), axis=2
                )                                                  # [B, i, H]
                m = jax.lax.stop_gradient(
                    nn.leaky_relu(a_d + ms, self.negative_slope)
                )
                cs = jax.lax.stop_gradient(
                    nn.relu(jnp.max(a_s, axis=1, keepdims=True))
                )                                                  # [B, 1, H]
                u = jnp.exp(a_d - m)                               # [B, i, H]
                p = jnp.exp(al * a_d - m)
                v = jnp.exp(a_s - cs)                              # [B, j, H]
                q = jnp.exp(al * a_s - cs)
                # 0/1 sign gate (zero-gradient: compare output is
                # nondifferentiable, so autodiff never transposes through P)
                ones = jnp.ones(xp_b.shape[:-1] + (1,), xp_b.dtype)
                xa = jnp.concatenate([xp_b, ones], axis=-1)        # [B,j,H,C+1]
                if graph.fused_factored is not None:
                    # Pallas kernel: the 0/1 gate never leaves VMEM; the
                    # kernel returns t_pv = P@vx and t_nq = (M−P)@qx directly
                    vx = (v[..., None] * xa).transpose(0, 2, 1, 3)  # [B,H,j,D]
                    qx = (q[..., None] * xa).transpose(0, 2, 1, 3)
                    t_pv, t_nq = graph.fused_factored(
                        a_d, a_s.transpose(0, 2, 1), vx, qx
                    )                                              # [B,H,i,D]
                    ut = u.transpose(0, 2, 1)[..., None]           # [B,H,i,1]
                    pt = p.transpose(0, 2, 1)[..., None]
                    outz = ut * t_pv + pt * t_nq
                    out = (outz[..., :C] / outz[..., C:]).astype(self.dtype)
                    out = out.transpose(0, 2, 1, 3).reshape(-1, H, C)
                else:
                    s = a_d[:, :, None, :] + a_s[:, None, :, :]
                    gate = self.gate_dtype or store
                    P = jnp.where(mask & (s >= 0), 1.0, 0.0).astype(gate)
                    vx = (v[..., None] * xa).astype(store)
                    qx = (q[..., None] * xa).astype(store)
                    t_adj = jnp.einsum(
                        "ij,bjhc->bihc", graph.adj_sl_mask.astype(gate), qx,
                        preferred_element_type=jnp.float32,
                    )
                    t_p = jnp.einsum(
                        "bijh,bjhc->bihc", P,
                        jnp.concatenate([vx, qx], axis=-1),
                        preferred_element_type=jnp.float32,
                    )
                    t_pv, t_pq = t_p[..., : C + 1], t_p[..., C + 1:]
                    outz = u[..., None] * t_pv + p[..., None] * (t_adj - t_pq)
                    out = (outz[..., :C] / outz[..., C:]).astype(self.dtype)
                    out = out.reshape(-1, H, C)
            else:
                logits = a_d[:, :, None, :] + a_s[:, None, :, :]  # [B, i, j, H]
                logits = nn.leaky_relu(logits, self.negative_slope)
                logits = jnp.where(
                    graph.adj_sl_mask[None, :, :, None], logits, NEG_INF
                )
                store = self.attn_dtype or self.dtype
                attn = jax.nn.softmax(logits.astype(jnp.float32), axis=2).astype(store)
                out = jnp.einsum(
                    "bijh,bjhc->bihc", attn, xp_b.astype(store)
                ).astype(self.dtype).reshape(-1, H, C)
        elif (graph.banded or graph.halo) and self.add_self_loops:
            # Banded local attention (large graphs): band windows over the
            # RCM ordering, masked softmax within each window.
            B, n_pad = graph.n_graph, graph.band_n_pad
            W = graph.band_W
            a_src_b = alpha_src.reshape(B, n_pad, H)
            a_dst_b = alpha_dst.reshape(B, n_pad, H)
            xp_b = xp.reshape(B, n_pad, H * C)
            a_src_win = _windows(a_src_b, graph)
            xp_win = _windows(xp_b, graph)
            xp_win = xp_win.reshape(xp_win.shape[:3] + (H, C))
            kernel_ok = self.negative_slope == 0.2 and H * C >= 128
            if (graph.band_attn_dma is not None and kernel_ok
                    and (H * C) % 128 == 0):
                # v2 fused Pallas band kernel: the x windows are DMA'd from
                # the extended node array inside the kernel (no materialized
                # [nB,B,W,H·C] window tensor); halo mode feeds the ppermute-
                # extended array the same way.
                nB = len(graph.band_win_start)
                BLK = n_pad // nB
                U, R = bops.halo_widths(graph.band_win_start, W, n_pad)
                if graph.halo:
                    from gnn_pressure_estimation_tpu.parallel.halo import (
                        halo_exchange,
                    )

                    x_ext = halo_exchange(xp_b, U, R, graph.axis_name)
                else:
                    x_ext = jnp.pad(xp_b, ((0, 0), (U, R), (0, 0)))
                out = graph.band_attn_dma(
                    a_dst_b, a_src_win,
                    x_ext.reshape(B, n_pad + W - BLK, H, C),
                    graph.band_adj_mask,
                    mxu_bf16=self.attn_dtype == jnp.bfloat16,
                ).reshape(-1, H, C)
            elif graph.band_attn is not None and kernel_ok:
                # v1 fused Pallas band kernel: logits/softmax/attn@x stay in
                # VMEM.  Only when H·C fills the 128-lane grid — narrower
                # layers (GATRes-small: H·C=32) are lane-starved in the
                # kernel and faster on the XLA band path (BASELINE.md).
                out = graph.band_attn(
                    a_dst_b, a_src_win, xp_win, graph.band_adj_mask
                ).reshape(-1, H, C)
            elif self.attn_impl == "band_factored":
                out = bops.band_attention_factored(
                    a_dst_b, a_src_win, xp_win, graph.band_adj_mask,
                    self.negative_slope, store_dtype=self.attn_dtype,
                ).reshape(-1, H, C)
            else:
                out = bops.band_attention(
                    a_dst_b, a_src_win, xp_win, graph.band_adj_mask,
                    self.negative_slope,
                ).reshape(-1, H, C)
        elif graph.padded and self.add_self_loops:
            # Degree-padded attention (scatter-free at any graph size):
            # per-node fixed-width neighbor slots, masked softmax over slots.
            mdp = graph.mask_dp_sl                               # [N, D+1]
            logits = graph.gather_dp_sl(alpha_src) + alpha_dst[:, None, :]
            logits = nn.leaky_relu(logits, self.negative_slope)  # [N, D+1, H]
            logits = jnp.where(mdp[..., None], logits, NEG_INF)
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=1).astype(self.dtype)
            nbr = graph.gather_dp_sl(xp)                         # [N, D+1, H, C]
            out = jnp.einsum("ndh,ndhc->nhc", attn, nbr)
        else:
            logits = ops.gather_src(alpha_src, senders, ax) + ops.gather(alpha_dst, receivers)
            logits = nn.leaky_relu(logits, self.negative_slope)
            alpha = ops.segment_softmax(
                logits.astype(jnp.float32), receivers, graph.n_node, edge_mask=emask
            ).astype(self.dtype)  # [E, H]
            out = ops.spmm(xp, senders, receivers, graph.n_node, edge_weight=alpha,
                           axis_name=ax, edge_mask=emask)
        if self.concat:
            out = out.reshape(-1, H * C)
        else:
            out = out.mean(axis=1)
        return (out + bias.astype(self.dtype)).astype(jnp.float32)


class SimpleMeanConv(nn.Module):
    """Parameter-free neighbor mean, PyG ``SimpleConv(aggr='mean')``.

    Reference: GraphModels.py:460,466 — no self-loops, mean over in-neighbors.
    Uses the template's precomputed inverse degree (no runtime division tree).
    """

    @nn.compact
    def __call__(self, x: jax.Array, graph: BatchedGraph) -> jax.Array:
        if graph.dense and graph.axis_name is None:
            return _dense_agg(graph.mean_mat, x, graph)
        if graph.banded or graph.halo:
            return _band_agg("mean", x, graph)
        if graph.padded:
            nbr = graph.gather_dp(x)                             # [N, D, C]
            agg = jnp.sum(jnp.where(graph.mask_dp[..., None], nbr, 0.0), axis=1)
            return agg * graph.inv_degree[:, None]
        agg = ops.spmm(x, graph.senders, graph.receivers, graph.n_node,
                       axis_name=graph.axis_name, edge_mask=graph.edge_mask)
        return agg * graph.inv_degree[:, None]


class GCNConv(nn.Module):
    """GCN conv with symmetric normalization and self-loops.

    ``normalize=False`` matches PyG's flag: plain neighbor-sum aggregation
    with no self-loops and no normalization (used by the remask-stack stem,
    reference GraphModels.py:568)."""

    out_channels: int
    use_bias: bool = True
    normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, graph: BatchedGraph) -> jax.Array:
        w = self.param("w", glorot, (x.shape[-1], self.out_channels), jnp.float32)
        xp = x @ w
        if not self.normalize:
            if graph.dense and graph.axis_name is None:
                out = _dense_agg(graph.adj_mat, xp, graph)
            elif graph.banded or graph.halo:
                out = _band_agg("adj", xp, graph)
            elif graph.padded:
                nbr = graph.gather_dp(xp)
                out = jnp.sum(jnp.where(graph.mask_dp[..., None], nbr, 0.0), axis=1)
            else:
                out = ops.spmm(xp, graph.senders, graph.receivers, graph.n_node,
                               axis_name=graph.axis_name, edge_mask=graph.edge_mask)
            if self.use_bias:
                out = out + self.param("bias", zeros, (self.out_channels,), jnp.float32)
            return out
        if graph.dense and graph.axis_name is None:
            out = _dense_agg(graph.gcn_mat, xp, graph)
        elif graph.banded or graph.halo:
            out = _band_agg("gcn", xp, graph)
        elif graph.padded:
            out = _padded_weighted_agg(graph.gather_dp_sl, xp, graph.gcn_dp_sl)
        else:
            out = ops.spmm(
                xp, graph.senders_sl, graph.receivers_sl, graph.n_node,
                edge_weight=graph.gcn_norm,
                axis_name=graph.axis_name, edge_mask=graph.edge_mask_sl,
            )
        if self.use_bias:
            out = out + self.param("bias", zeros, (self.out_channels,), jnp.float32)
        return out


class GCN2Conv(nn.Module):
    """GCNII layer (Chen et al. 2020), PyG ``GCN2Conv`` with shared weights.

    Reference baseline: GraphModels.py:188-208 (alpha=0.1, theta=0.5, 64 layers).
    H = (1-α)·Â x + α·x0 ;  out = (1-β)·H + β·(H W),  β = log(θ/ℓ + 1).
    """

    channels: int
    alpha: float = 0.1
    theta: float = 0.5
    layer_index: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, x0: jax.Array, graph: BatchedGraph) -> jax.Array:
        import math

        w = self.param("w", glorot, (self.channels, self.channels), jnp.float32)
        beta = math.log(self.theta / self.layer_index + 1.0)
        if graph.dense and graph.axis_name is None:
            hx = _dense_agg(graph.gcn_mat, x, graph)
        elif graph.banded or graph.halo:
            hx = _band_agg("gcn", x, graph)
        elif graph.padded:
            hx = _padded_weighted_agg(graph.gather_dp_sl, x, graph.gcn_dp_sl)
        else:
            hx = ops.spmm(
                x, graph.senders_sl, graph.receivers_sl, graph.n_node,
                edge_weight=graph.gcn_norm,
                axis_name=graph.axis_name, edge_mask=graph.edge_mask_sl,
            )
        h = (1.0 - self.alpha) * hx + self.alpha * x0
        return (1.0 - beta) * h + beta * (h @ w)


class ChebConv(nn.Module):
    """Chebyshev spectral conv, PyG ``ChebConv`` (sym norm, lambda_max=2).

    With λmax=2 the scaled Laplacian collapses to L~ = -D^{-1/2} A D^{-1/2}
    (zero diagonal), precomputed per template as ``graph.cheb_norm``.
    T0 = x, T1 = L~ x, Tk = 2 L~ T(k-1) - T(k-2); out = Σ Tk Wk (+ bias).
    Reference baselines: GraphConvWat (K=240/120/20/1) and tuned ChebNet
    (GraphModels.py:154-184).
    """

    out_channels: int
    K: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, graph: BatchedGraph) -> jax.Array:
        in_c = x.shape[-1]
        w = self.param("w", glorot, (self.K, in_c, self.out_channels), jnp.float32)

        def lap(v):
            if graph.dense and graph.axis_name is None:
                return _dense_agg(graph.cheb_mat, v, graph)
            if graph.banded or graph.halo:
                return _band_agg("cheb", v, graph)
            if graph.padded:
                return _padded_weighted_agg(graph.gather_dp, v, graph.cheb_dp)
            return ops.spmm(
                v, graph.senders, graph.receivers, graph.n_node,
                edge_weight=graph.cheb_norm,
                axis_name=graph.axis_name, edge_mask=graph.edge_mask,
            )

        tx_prev, out = x, x @ w[0]
        if self.K > 1:
            tx = lap(x)
            out = out + tx @ w[1]
        if 2 < self.K <= 8:
            # small K: unroll so XLA can fuse across terms
            for k in range(2, self.K):
                tx_next = 2.0 * lap(tx) - tx_prev
                out = out + tx_next @ w[k]
                tx_prev, tx = tx, tx_next
        elif self.K > 8:
            # large K (GraphConvWat uses K=240): roll the recurrence into one
            # lax.scan so the compiled program is O(1) in K instead of K
            # unrolled matmul pairs (compile time and HLO size)
            def body(carry, wk):
                t_prev, t, acc = carry
                t_next = 2.0 * lap(t) - t_prev
                return (t, t_next, acc + t_next @ wk), None

            (_, _, out), _ = jax.lax.scan(body, (tx_prev, tx, out), w[2:])
        if self.use_bias:
            out = out + self.param("bias", zeros, (self.out_channels,), jnp.float32)
        return out


class MLP(nn.Module):
    """Linear stack with SELU between hidden layers (reference custom MLP,
    GraphModels.py:265-275 — note it shadows PyG's MLP for GIN too)."""

    dims: tuple
    use_bias: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        n = len(self.dims)
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, use_bias=self.use_bias, kernel_init=torch_linear)(x)
            if i < n - 1:
                x = nn.selu(x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return x


class GINConv(nn.Module):
    """GIN conv: ``nn((1+eps)·x + Σ_j x_j)`` (no self-loops).

    Reference: GraphModels.py:242-248 with eps=0 and the SELU MLP
    ``[in, nc//2, nc]`` (bottleneck), or a bias-free Linear on the last block.
    """

    mlp_dims: Optional[tuple] = None
    linear_out: Optional[int] = None
    eps: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, graph: BatchedGraph, training: bool = False) -> jax.Array:
        if graph.dense and graph.axis_name is None:
            agg = _dense_agg(graph.adj_mat, x, graph)
        elif graph.banded or graph.halo:
            agg = _band_agg("adj", x, graph)
        elif graph.padded:
            nbr = graph.gather_dp(x)
            agg = jnp.sum(jnp.where(graph.mask_dp[..., None], nbr, 0.0), axis=1)
        else:
            agg = ops.spmm(x, graph.senders, graph.receivers, graph.n_node,
                           axis_name=graph.axis_name, edge_mask=graph.edge_mask)
        h = (1.0 + self.eps) * x + agg
        if self.mlp_dims is not None:
            return MLP(self.mlp_dims)(h, training)
        return nn.Dense(self.linear_out, use_bias=False,
                        kernel_init=torch_linear)(h)


class GENConv(nn.Module):
    """m_GCN's custom GENConvolution (reference GraphModels.py:277-397).

    message  = selu(concat(x_j, e_ij)) + eps            (eps = 1e-7)
    e_ij     = edge_emb + |x_src - x_dst|               (GraphModels.py:358-361)
    latent   = Σ_j message  (add aggregation)
    latent   = res(latent)            [mlp=True]  or tanh(res(latent)) [mlp=False]
    latent  += x_i                    (residual)
    latent   = MLP(latent)            [mlp=True only]
    """

    latent_dim: int
    use_bias: bool = False
    num_layers: int = 2
    eps: float = 1e-7
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        graph: BatchedGraph,
        edge_emb: Optional[jax.Array],
        mlp: bool = True,
        residual: bool = True,
        training: bool = False,
    ) -> jax.Array:
        d = self.latent_dim
        ax = graph.axis_name
        x_src = ops.gather_src(x, graph.senders, ax)
        if edge_emb is not None:
            diff = jnp.abs(x_src - ops.gather(x, graph.receivers))
            e = edge_emb + diff
            msg = jnp.concatenate([x_src, e], axis=-1)
        else:
            msg = x_src
        msg = nn.selu(msg) + self.eps
        if graph.edge_mask is not None:
            msg = jnp.where(graph.edge_mask[:, None], msg, 0.0)
        latent = ops.segment_sum(msg, graph.receivers, graph.n_node)

        res = nn.Dense(d, use_bias=self.use_bias, kernel_init=torch_linear,
                       name="res")
        latent = res(latent) if mlp else jnp.tanh(res(latent))
        if residual:
            latent = latent + x
        if mlp:
            dims = tuple([2 * d] * (self.num_layers - 1) + [d])
            latent = MLP(dims, use_bias=self.use_bias, dropout=self.dropout, name="mlp")(
                latent, training
            )
        return latent
