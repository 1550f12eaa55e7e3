"""Pallas TPU kernel: windowed sparse gather (the SpMM/SDDMM building block).

The hot op of message passing is "for each node, fetch its neighbors' feature
rows". XLA's TPU gather/scatter lowerings serialize, so this kernel exploits
WDN graph structure instead:

1. nodes are RCM-reordered (host-side) so every 256-node block's neighbor ids
   fall inside a contiguous window of width W ≈ block + 2·bandwidth;
2. per grid step the kernel DMAs that window HBM→VMEM (contiguous rows — a
   fast dynamic-slice copy, not a gather);
3. the per-slot neighbor select becomes a one-hot(rel-index) × window matmul
   on the MXU, generated in-VMEM (never materialized to HBM).

Backward is the same kernel over transpose (out-slot) tables, so the whole
VJP is scatter-free (same trick as ops/padded.py, but MXU-driven).

Used by the degree-padded aggregation path for templates above the dense
threshold; falls back to interpret mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class _Table:
    rel: np.ndarray        # [nB, BLK*D] window-relative ids (== W → no match)
    win_start: np.ndarray  # [nB] int32 window starts (row units)
    mask: np.ndarray       # [nB, BLK*D] valid-slot mask
    n_rows: int            # rows in the (padded) source array
    BLK: int
    D: int
    W: int


@dataclasses.dataclass(frozen=True)
class WindowLayout:
    """Host-built layout: forward (in-slot) and transpose (out-slot) tables
    in RCM-permuted node space, for one batched graph."""

    perm: np.ndarray       # [N] original → permuted gather indices (x_perm = x[perm])
    inv_perm: np.ndarray
    n_pad: int             # permuted+padded row count
    fwd: _Table            # gathers x rows → [N_pad, D, C] neighbor slots
    bwd: _Table            # gathers slot-grads → [N_pad, D2, C] out-slots
    mask_fwd: np.ndarray   # [n_pad, D] (same as fwd.mask reshaped)
    mask_bwd: np.ndarray


def _build_table(idx: np.ndarray, mask: np.ndarray, n_src_rows: int, BLK: int):
    """idx/mask: [n_rows, D] indices into a source of n_src_rows rows."""
    n_rows, D = idx.shape
    nB = -(-n_rows // BLK)
    n_pad = nB * BLK
    idx_p = np.zeros((n_pad, D), np.int64)
    mask_p = np.zeros((n_pad, D), bool)
    idx_p[:n_rows] = idx
    mask_p[:n_rows] = mask

    win_start = np.zeros(nB, np.int32)
    width = 1
    for b in range(nB):
        sel = idx_p[b * BLK : (b + 1) * BLK][mask_p[b * BLK : (b + 1) * BLK]]
        if sel.size:
            lo, hi = int(sel.min()), int(sel.max()) + 1
        else:
            lo, hi = 0, 1
        win_start[b] = lo
        width = max(width, hi - lo)
    # windows ≤1024 round to 128; larger round to 1024 (kernel W-chunking)
    W = _round_up(width, 128) if width <= 1024 else _round_up(width, 1024)
    W = min(W, _round_up(n_src_rows, 8))
    # clamp windows so [ws, ws+W) stays in-bounds
    max_start = max(n_src_rows - W, 0)
    win_start = np.minimum(win_start, max_start).astype(np.int32)
    rel = idx_p - win_start[:, None].repeat(BLK, 1).reshape(n_pad, 1)
    rel = np.where(mask_p, rel, W)  # no-match sentinel ⇒ zero row
    assert rel[mask_p].min() >= 0 and rel[mask_p].max() < W, "window overflow"
    return _Table(
        rel=rel.reshape(nB, BLK * D).astype(np.int32),
        win_start=win_start,
        mask=mask_p.reshape(nB, BLK * D),
        n_rows=n_src_rows,
        BLK=BLK,
        D=D,
        W=W,
    )


def build_window_layout(
    senders_dp: np.ndarray,
    mask_dp: np.ndarray,
    n_node: int,
    block: int = 256,
    perm: Optional[np.ndarray] = None,
) -> WindowLayout:
    """From degree-padded tables (original node order) build the windowed
    layout. ``perm`` defaults to reverse Cuthill-McKee over the edge set."""
    N, D = senders_dp.shape
    if perm is None:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        rows = np.repeat(np.arange(N), D)[mask_dp.reshape(-1)]
        cols = senders_dp.reshape(-1)[mask_dp.reshape(-1)]
        A = sp.csr_matrix(
            (np.ones(len(rows)), (rows, cols)), shape=(N, N)
        )
        perm = np.asarray(reverse_cuthill_mckee(A + A.T, symmetric_mode=True))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(N)

    # tables in perm space: row r' = inv[r]; sender ids mapped to perm space
    idx_perm = np.zeros_like(senders_dp)
    mask_perm = np.zeros_like(mask_dp)
    idx_perm[inv] = inv[senders_dp]
    mask_perm[inv] = mask_dp

    nB = -(-N // block)
    n_pad = nB * block
    fwd = _build_table(idx_perm, mask_perm, n_pad, block)

    # transpose: positions in the flat [n_pad*D] slot grid per source node
    from gnn_pressure_estimation_tpu.ops.padded import build_transpose_tables

    idx_pad = np.zeros((n_pad, D), np.int64)
    mask_pad = np.zeros((n_pad, D), bool)
    idx_pad[:N] = idx_perm
    mask_pad[:N] = mask_perm
    out_flat, out_mask = build_transpose_tables(
        idx_pad.astype(np.int32), mask_pad, n_pad
    )
    bwd = _build_table(out_flat.astype(np.int64), out_mask, n_pad * D, block)

    return WindowLayout(
        perm=perm.astype(np.int32),
        inv_perm=inv.astype(np.int32),
        n_pad=n_pad,
        fwd=fwd,
        bwd=bwd,
        mask_fwd=fwd.mask.reshape(n_pad, D),
        mask_bwd=bwd.mask.reshape(n_pad, bwd.D),
    )


def _window_gather_raw(x: jax.Array, tbl: _Table, interpret: bool) -> jax.Array:
    """x: [n_src_rows(+1 pad), C] → [nB*BLK, D, C] neighbor slots.

    The source must carry one extra zero row at index ``tbl.n_rows`` … no:
    the sentinel rel == W resolves inside the window one-hot (no match ⇒ all
    zeros), so no pad row is needed.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nB = tbl.rel.shape[0]
    E = tbl.rel.shape[1]          # BLK*D (divisible by 8 since BLK is)
    W = tbl.W
    C_in = x.shape[-1]
    # Mosaic HBM slices must be lane-aligned: pad the feature dim to 128.
    # (Full efficiency needs C ≥ 128 — GATRes-large territory; smaller C
    # trades some DMA/MXU waste, still far cheaper than XLA scatter.)
    C = _round_up(C_in, 128)
    if C != C_in:
        x = jnp.pad(x, ((0, 0), (0, C - C_in)))
    # TPU tiling: rel rows reshaped to [nB, 8, E_pad/8] so the per-step block
    # (8, E_pad/8) meets the (8k, 128k) constraint
    E_pad = _round_up(E, 1024)
    rel_np = np.full((nB, E_pad), W, np.int32)
    rel_np[:, :E] = tbl.rel
    rel = jnp.asarray(rel_np.reshape(nB, 8, E_pad // 8))
    ws = jnp.asarray(tbl.win_start)

    Ep8 = E_pad // 8

    def kernel(ws_ref, rel_ref, x_hbm, out_ref, xwin, sem):
        b = pl.program_id(0)
        start = ws_ref[b]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, W), :], xwin, sem
        )
        cp.start()
        cp.wait()
        # Chunk the window axis so the in-VMEM one-hot stays small (large
        # backward windows would otherwise exceed VMEM). Ceil-div with a
        # partial tail chunk: W clamped to the array bound need not be a
        # multiple of the chunk size.
        WC = min(W, 1024)
        n_chunks = -(-W // WC)
        # 8 unrolled sub-matmuls (Mosaic can't flatten 3-D vectors): slot
        # packing is e = a*Ep8 + j, undone by the reshape outside the kernel.
        for a in range(8):
            r_a = rel_ref[0, a]  # [Ep8]
            acc = jnp.zeros((Ep8, C), jnp.float32)
            for wchunk in range(n_chunks):
                w0 = wchunk * WC
                wlen = min(WC, W - w0)
                iota_w = jax.lax.broadcasted_iota(jnp.int32, (Ep8, wlen), 1)
                onehot = (r_a[:, None] == iota_w + w0).astype(x.dtype)
                # HIGHEST: the v5e MXU default rounds f32 operands through
                # bf16, which would make the gather lossy; it must be exact.
                acc = acc + jax.lax.dot_general(
                    onehot, xwin[w0 : w0 + wlen, :],
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
            out_ref[0, a] = acc.astype(x.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nB,),
        in_specs=[
            pl.BlockSpec((1, 8, Ep8), lambda b, ws_ref: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 8, Ep8, C), lambda b, ws_ref: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((W, C), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nB, 8, Ep8, C), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ws, rel, x)
    out = out.reshape(nB, E_pad, C)[:, :E].reshape(nB * tbl.BLK, tbl.D, C)
    return out[..., :C_in]


def make_window_gather(layout: WindowLayout, interpret: Optional[bool] = None):
    """Returns ``gather(x_perm [n_pad, C]) -> [n_pad, D, C]`` with a
    scatter-free Pallas VJP. ``x_perm`` must already be permuted/padded
    (``x_perm = zeros(n_pad, C).at[:N].set(x[layout.perm])``)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    mask_bwd = jnp.asarray(layout.mask_bwd)

    @jax.custom_vjp
    def gather(xp):
        return _window_gather_raw(xp, layout.fwd, interpret)

    def fwd_fn(xp):
        return gather(xp), None

    def bwd_fn(_, g):
        # g: [n_pad, D, C] → flat slot grid [n_pad*D, C] → gather per source
        C = g.shape[-1]
        gflat = g.reshape(-1, C)
        got = _window_gather_raw(gflat, layout.bwd, interpret)  # [n_pad, D2, C]
        xbar = jnp.sum(jnp.where(mask_bwd[..., None], got, 0.0), axis=1)
        return (xbar,)

    gather.defvjp(fwd_fn, bwd_fn)
    return gather
