"""Banded-dense aggregation for large graphs (RCM band + local attention).

After reverse-Cuthill-McKee reordering a WDN graph's adjacency is banded:
every neighbor of node i lies within ±bandwidth of i. For big templates the
full dense [n, n] operators are infeasible, but the *band* is narrow
(bigtown: 896 of 5800 columns), so each 256-row block only interacts with a
static contiguous window of columns:

    out[block] = Band[block, :, :W] @ x[win_start : win_start + W]

Everything is static-sliced batched matmul on the MXU — no gather, no
scatter, no one-hot; backward is the transposed matmul plus pad-adds of the
window slices. GAT becomes *local masked attention* over the band window
(the graph analog of sliding-window attention).

This is the default aggregation mode for templates above
``GraphTemplate.DENSE_THRESHOLD``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class BandLayout:
    """Host-built band layout of one template (perm space)."""

    perm: np.ndarray          # x_perm = x[perm]
    inv_perm: np.ndarray
    n: int                    # original node count
    n_pad: int                # nB * BLK
    BLK: int
    W: int
    win_start: tuple          # static per-block window starts (len nB)
    adj_mask: np.ndarray      # [nB, BLK, W] bool (incl. self-loops)
    mean_band: np.ndarray     # [nB, BLK, W] row-normalized mean (no SL)
    gcn_band: np.ndarray      # [nB, BLK, W] sym-norm with SL
    cheb_band: np.ndarray     # [nB, BLK, W] −D^-1/2 A D^-1/2
    adj_band: np.ndarray      # [nB, BLK, W] raw adjacency (no SL)
    # Factored forms: every parameter-free band is diag(rowscale) @ counts
    # @ diag(colscale) —
    #   mean = diag(inv_deg) · adj_cnt
    #   gcn  = diag(dinv_sl) · adj_cnt_sl · diag(dinv_sl)
    #   cheb = −diag(dinv) · adj_cnt · diag(dinv)
    #   adj  = adj_cnt
    # The int8 count band is 4× smaller than the f32 weight band — the
    # chunked-DMA SpMM kernel re-reads its band slab per (graph, chunk)
    # grid cell, so the storage dtype is HBM traffic, not just footprint.
    # The row/col scalings happen outside the kernel (fused VPU passes).
    adj_cnt: np.ndarray = None        # [nB, BLK, W] int8 edge counts (no SL)
    adj_cnt_sl: np.ndarray = None     # [nB, BLK, W] int8 counts + self-loops
    inv_deg_perm: np.ndarray = None   # [n_pad] f32 1/deg, zeros on pad rows
    dinv_sl_perm: np.ndarray = None   # [n_pad] f32 1/sqrt(deg+1)
    dinv_perm: np.ndarray = None      # [n_pad] f32 1/sqrt(deg) (0 at deg 0)


def build_band_layout(template, block: int = 256, lane: int = 128) -> BandLayout:
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n = template.n_node
    A = sp.csr_matrix(
        (np.ones(template.n_edge), (template.receivers, template.senders)),
        shape=(n, n),
    )
    perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)

    s2, r2 = inv[template.senders], inv[template.receivers]
    nB = -(-n // block)
    n_pad = nB * block

    # per-block window bounds over senders (plus own rows for self-loops)
    lo = np.full(nB, np.iinfo(np.int32).max, np.int64)
    hi = np.zeros(nB, np.int64)
    for b in range(nB):
        lo[b] = b * block
        hi[b] = min((b + 1) * block, n)
    for s, r in zip(s2, r2):
        b = r // block
        lo[b] = min(lo[b], s)
        hi[b] = max(hi[b], s + 1)
    # UNIFORM window offsets: every block's window starts exactly U rows
    # before its own first row (win_start[b] = b·BLK − U, possibly negative —
    # extraction pads instead of clamping).  Uniformity makes the extraction
    # a static-slice program independent of the block index, which is what
    # lets the distributed halo-exchange path run one identical SPMD program
    # on every device (parallel/halo.py).
    U = int((np.arange(nB) * block - lo).max())
    V = int((hi - np.arange(nB) * block).max())
    W = _round_up(U + max(V, block), lane)  # lane-aligned window width
    win_start = (np.arange(nB, dtype=np.int64) * block - U).astype(np.int32)

    adj = np.zeros((nB, block, W), bool)
    mean_b = np.zeros((nB, block, W), np.float32)
    gcn_b = np.zeros((nB, block, W), np.float32)
    cheb_b = np.zeros((nB, block, W), np.float32)
    adj_raw = np.zeros((nB, block, W), np.float32)
    adj_cnt = np.zeros((nB, block, W), np.int8)
    adj_cnt_sl = np.zeros((nB, block, W), np.int8)

    deg = template.in_degree
    inv_deg = template.inv_degree
    deg_sl = deg + 1.0
    dinv_sl = 1.0 / np.sqrt(deg_sl)
    with np.errstate(divide="ignore"):
        dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1.0)), 0.0)

    for s, r in zip(s2, r2):
        b, i = r // block, r % block
        j = s - win_start[b]
        adj[b, i, j] = True
        adj_raw[b, i, j] += 1.0
        adj_cnt[b, i, j] += 1
        adj_cnt_sl[b, i, j] += 1
        # weights indexed by ORIGINAL node ids (perm-space row r ↔ orig perm[r])
        ro, so = perm[r], perm[s]
        mean_b[b, i, j] += inv_deg[ro]
        gcn_b[b, i, j] += dinv_sl[ro] * dinv_sl[so]
        cheb_b[b, i, j] += -(dinv[ro] * dinv[so])
    for r in range(n):  # self-loops
        b, i = r // block, r % block
        j = r - win_start[b]
        adj[b, i, j] = True
        gcn_b[b, i, j] += dinv_sl[perm[r]] ** 2
        adj_cnt_sl[b, i, j] += 1

    # int8 counts must equal the f32 bands exactly — a multigraph with ≥128
    # parallel edges between one node pair would wrap int8 and silently
    # diverge from adj_band on the kernel path, so make the invariant loud
    assert (adj_cnt.astype(np.float32) == adj_raw).all(), (
        "parallel-edge count overflows int8 — widen adj_cnt's dtype"
    )
    assert int(adj_cnt_sl.max()) <= 127 and int(adj_cnt_sl.min()) >= 0

    inv_deg_perm = np.zeros(n_pad, np.float32)
    inv_deg_perm[:n] = np.asarray(inv_deg, np.float32)[perm]
    dinv_sl_perm = np.zeros(n_pad, np.float32)
    dinv_sl_perm[:n] = np.asarray(dinv_sl, np.float32)[perm]
    dinv_perm = np.zeros(n_pad, np.float32)
    dinv_perm[:n] = np.asarray(dinv, np.float32)[perm]

    return BandLayout(
        perm=perm.astype(np.int32),
        inv_perm=inv.astype(np.int32),
        n=n,
        n_pad=n_pad,
        BLK=block,
        W=W,
        win_start=tuple(int(v) for v in win_start),
        adj_mask=adj,
        mean_band=mean_b,
        gcn_band=gcn_b,
        cheb_band=cheb_b,
        adj_band=adj_raw,
        adj_cnt=adj_cnt,
        adj_cnt_sl=adj_cnt_sl,
        inv_deg_perm=inv_deg_perm,
        dinv_sl_perm=dinv_sl_perm,
        dinv_perm=dinv_perm,
    )


# ---- jit-side ops ----------------------------------------------------------

def halo_widths(win_start: tuple, W: int, n_pad: int) -> tuple[int, int]:
    """(U, R): rows of left/right context each block window reaches beyond
    its own rows. ``win_start`` must be the uniform layout (b·BLK − U)."""
    nB = len(win_start)
    BLK = n_pad // nB
    U = -int(win_start[0])
    R = W - U - BLK
    assert all(int(ws) == b * BLK - U for b, ws in enumerate(win_start)), (
        "band layout is not uniform-offset; rebuild with build_band_layout"
    )
    assert U >= 0 and R >= 0, (U, R, W, BLK)
    return U, R


def band_windows_ext(x_ext: jax.Array, nB: int, BLK: int, W: int) -> jax.Array:
    """Extract block windows from an already-extended node array.

    x_ext: [B, U + nB·BLK + R, C] (zero pads on one chip, halo rows from
    neighbor devices in the distributed path) → [nB, B, W, C]; block ``b``'s
    window is rows [b·BLK, b·BLK + W) of the extended array.
    """
    return jnp.stack(
        [jax.lax.slice_in_dim(x_ext, b * BLK, b * BLK + W, axis=1)
         for b in range(nB)]
    )


def band_windows(x_bp: jax.Array, layout_win_start: tuple, W: int) -> jax.Array:
    """x_bp: [B, n_pad, C] → [nB, B, W, C] static window slices."""
    nB = len(layout_win_start)
    n_pad = x_bp.shape[1]
    BLK = n_pad // nB
    U, R = halo_widths(layout_win_start, W, n_pad)
    x_ext = jnp.pad(x_bp, ((0, 0), (U, R), (0, 0)))
    return band_windows_ext(x_ext, nB, BLK, W)


def band_spmm(band: jax.Array, wins: jax.Array) -> jax.Array:
    """band: [nB, BLK, W], wins: [nB, B, W, C] → [B, nB*BLK, C]."""
    out = jnp.einsum("niw,nbwc->bnic", band, wins)
    B = wins.shape[1]
    return out.reshape(B, -1, out.shape[-1])


def band_attention(
    a_dst: jax.Array,      # [B, n_pad, H]
    a_src_win: jax.Array,  # [nB, B, W, H]
    x_win: jax.Array,      # [nB, B, W, H, C]
    adj_mask: jax.Array,   # [nB, BLK, W]
    negative_slope: float,
    neg_inf: float = -1e9,
) -> jax.Array:
    """Local masked GAT attention over band windows → [B, n_pad, H, C]."""
    nB, B, W, H = a_src_win.shape
    BLK = adj_mask.shape[1]
    a_dst_b = a_dst.reshape(B, nB, BLK, H).transpose(1, 0, 2, 3)  # [nB,B,BLK,H]
    logits = a_dst_b[:, :, :, None, :] + a_src_win[:, :, None, :, :]  # [nB,B,BLK,W,H]
    logits = jnp.where(logits >= 0, logits, negative_slope * logits)
    logits = jnp.where(adj_mask[:, None, :, :, None], logits, neg_inf)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=3).astype(x_win.dtype)
    out = jnp.einsum("nbiwh,nbwhc->nbihc", attn, x_win)  # [nB,B,BLK,H,C]
    C = x_win.shape[-1]
    return out.transpose(1, 0, 2, 3, 4).reshape(B, nB * BLK, H, C)


def band_attention_factored(
    a_dst: jax.Array,      # [B, n_pad, H]
    a_src_win: jax.Array,  # [nB, B, W, H]
    x_win: jax.Array,      # [nB, B, W, H, C]
    adj_mask: jax.Array,   # [nB, BLK, W]
    negative_slope: float,
    store_dtype=None,
) -> jax.Array:
    """Factored band attention: the exp(leaky_relu) softmax numerator split
    into two rank-1 products gated by the zero-gradient sign matrix (same
    identity as the dense path, models/layers.py:106-113) — all
    transcendentals become per-row/per-window vectors and the [nB,B,BLK,W,H]
    work is one compare plus MXU matmuls.  Exact vs ``band_attention`` up to
    fp rounding (|logit| ≲ 80 working range; softmax path is the fallback).

    Banded-specific guards (the dense path never needs them): padded band
    rows have NO self-loop, so their window is fully masked — the masked
    row-max is clamped (exp stays finite) and Z is floored (0/eps → 0, not
    NaN, keeping padded rows inert in later layers' windows).
    """
    nB, B, W, H = a_src_win.shape
    BLK = adj_mask.shape[1]
    C = x_win.shape[-1]
    al = negative_slope
    store = store_dtype or x_win.dtype
    a_dst_b = a_dst.reshape(B, nB, BLK, H).transpose(1, 0, 2, 3)  # [nB,B,BLK,H]
    mask = adj_mask[:, None, :, :]                                # [nB,1,BLK,W]
    ms = jnp.max(
        jnp.where(mask[..., None], a_src_win[:, :, None, :, :], -jnp.inf),
        axis=3,
    )                                                             # [nB,B,BLK,H]
    ms = jnp.maximum(ms, -60.0)  # fully-masked (padded) rows: keep exp finite
    m = jax.lax.stop_gradient(
        jnp.where(a_dst_b + ms >= 0, a_dst_b + ms, al * (a_dst_b + ms))
    )
    cs = jax.lax.stop_gradient(
        jax.nn.relu(jnp.max(a_src_win, axis=2, keepdims=True))
    )                                                             # [nB,B,1,H]
    u = jnp.exp(a_dst_b - m)                                      # [nB,B,BLK,H]
    p = jnp.exp(al * a_dst_b - m)
    v = jnp.exp(a_src_win - cs)                                   # [nB,B,W,H]
    q = jnp.exp(al * a_src_win - cs)
    s = a_dst_b[:, :, :, None, :] + a_src_win[:, :, None, :, :]   # [nB,B,BLK,W,H]
    P = jnp.where(mask[..., None] & (s >= 0), 1.0, 0.0).astype(store)
    ones = jnp.ones(x_win.shape[:-1] + (1,), x_win.dtype)
    xa = jnp.concatenate([x_win, ones], axis=-1)                  # [nB,B,W,H,C+1]
    vx = (v[..., None] * xa).astype(store)
    qx = (q[..., None] * xa).astype(store)
    t_adj = jnp.einsum(
        "niw,nbwhc->nbihc", adj_mask.astype(store), qx,
        preferred_element_type=jnp.float32,
    )
    t_p = jnp.einsum(
        "nbiwh,nbwhc->nbihc", P, jnp.concatenate([vx, qx], axis=-1),
        preferred_element_type=jnp.float32,
    )
    t_pv, t_pq = t_p[..., : C + 1], t_p[..., C + 1:]
    outz = u[..., None] * t_pv + p[..., None] * (t_adj - t_pq)
    # Padded (neighborless) rows have Z == 0 exactly; substitute Z = 1 there so
    # the output is a clean 0/1 = 0.  A tiny floor (1e-30) is NOT enough: the
    # division backward evaluates -x/Z^2 and Z^2 underflows f32 to 0 → 0/0 NaN.
    valid = jnp.any(adj_mask, axis=2)                             # [nB,BLK]
    z = jnp.where(valid[:, None, :, None, None],
                  jnp.maximum(outz[..., C:], 1e-30), 1.0)
    out = (outz[..., :C] / z).astype(x_win.dtype)
    return out.transpose(1, 0, 2, 3, 4).reshape(B, nB * BLK, H, C)
