"""Fused banded graph attention — Pallas TPU kernel.

The banded (RCM local-attention) path materializes ``[nB, B, BLK, W, H]``
logits and attention tensors in HBM (~290 MB per layer at bigtown scale,
``nB=46 · B=8 · BLK=128 · W=768 · H=2``); the roofline run showed the XLA
band path pinned at the HBM roof on exactly that traffic (BASELINE.md).
This kernel fuses the whole banded attention — additive logits, LeakyReLU,
adjacency mask, windowed softmax, and the attn @ x_win aggregation — per
(block-row, graph) grid cell entirely in VMEM, writing only the
``[BLK, H·C]`` output block.  The backward recomputes the attention
flash-style, so no [BLK, W] tensor ever touches HBM in either direction.

As in the dense kernel (``graph_attention.py``), GAT logits are additive
(αd_i + αs_j): there is no Q·Kᵀ matmul, and the MXU work is attn @ x_win
(forward) and attnᵀ @ dO / dO @ x_winᵀ (backward).

The adjacency mask is a kernel *input* (not a captured constant) so the
same kernel serves the distributed halo path, where each device's
``[nbL, BLK, W]`` mask slice is a traced value inside ``shard_map``
(parallel/halo.py).  On a single chip the mask is a jit constant and XLA
folds the pad/cast at compile time.

Semantics match ``ops.banded.band_attention`` exactly, including the
padded-band-row behavior (fully-masked rows produce a uniform attention;
those rows are never read back by real rows and are dropped by
``unpack_nodes``).  cf. reference GATConv semantics `GraphModels.py:454-494`
(PyG GATConv: self-loops, LeakyReLU(0.2), per-receiver softmax).

Shapes: a_dst [B, n_pad, H] · a_src_win [nB, B, W, H] · x_win
[nB, B, W, H, C] · adj_mask [nB, BLK, W] → out [B, n_pad, H, C].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_band_attention(
    nB: int,
    BLK: int,
    W: int,
    negative_slope: float,
    interpret: Optional[bool] = None,
):
    """Kernel factory for a band layout of ``nB`` block-rows of ``BLK``
    nodes with ``W``-wide windows.  Returns
    ``attend(a_dst, a_src_win, x_win, adj_mask) -> [B, n_pad, H, C]`` with a
    fused recompute VJP, or ``None`` if the layout's tiles would exceed the
    VMEM budget.

    The window axis W is padded to the 128-lane grid; pad columns are dead
    via the mask.  BLK (the sublane axis of every [BLK, W] tile) is a
    multiple of 8 by construction (``build_band_layout`` block sizes).
    """
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    W_pad = _round_up(W, 128)
    # VMEM guard: the backward holds several [BLK, W_pad] f32 tiles plus the
    # [W_pad, H·C] window operands live at once; past ~1 MB per logits tile
    # (BLK 512 at bigtown widths) Mosaic blows the 16 MB VMEM budget and the
    # compile fails.  Refuse to build — callers fall back to the XLA band
    # path (BLK 256 measured fastest under the kernel anyway, BASELINE.md).
    if BLK * W_pad * 4 > (1 << 20):
        return None
    slope = float(negative_slope)

    def _attn(ad_col, as_row, mk):
        z = ad_col + as_row                       # [BLK, W_pad]
        z = jnp.where(z >= 0, z, slope * z)
        z = z * mk + (1.0 - mk) * NEG
        m = jnp.max(z, axis=1, keepdims=True)
        p = jnp.exp(z - m)
        return p / jnp.sum(p, axis=1, keepdims=True)

    def fwd_kernel(adst_ref, asrc_ref, x_ref, mask_ref, o_ref):
        mk = mask_ref[0]                          # [BLK, W_pad]
        H = adst_ref.shape[-1]
        C = x_ref.shape[-1] // H
        for h in range(H):
            ad_col = adst_ref[0, 0][:, h : h + 1]     # [BLK, 1]
            as_row = asrc_ref[0, 0][h : h + 1, :]     # [1, W_pad]
            p = _attn(ad_col, as_row, mk)
            o_ref[0, 0, :, h * C : (h + 1) * C] = jnp.dot(
                p, x_ref[0, 0][:, h * C : (h + 1) * C],
                preferred_element_type=jnp.float32,
            )

    def bwd_kernel(adst_ref, asrc_ref, x_ref, mask_ref, do_ref,
                   dadst_ref, dasrc_ref, dx_ref):
        mk = mask_ref[0]
        H = adst_ref.shape[-1]
        C = x_ref.shape[-1] // H
        for h in range(H):
            ad_col = adst_ref[0, 0][:, h : h + 1]
            as_row = asrc_ref[0, 0][h : h + 1, :]
            p = _attn(ad_col, as_row, mk)
            do_h = do_ref[0, 0][:, h * C : (h + 1) * C]   # [BLK, C]
            x_h = x_ref[0, 0][:, h * C : (h + 1) * C]     # [W_pad, C]
            # dX = attnᵀ @ dO
            dx_ref[0, 0, :, h * C : (h + 1) * C] = jax.lax.dot_general(
                p, do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dattn = dO @ Xᵀ ; softmax VJP: dz = P ∘ (dattn − rowsum(dattn∘P))
            dp = jax.lax.dot_general(
                do_h, x_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(dp * p, axis=1, keepdims=True)
            dz = p * (dp - delta)
            # LeakyReLU VJP on pre-mask logits (masked entries: P=0 ⇒ dz=0)
            zpre = ad_col + as_row
            dz = jnp.where(zpre >= 0, dz, slope * dz)
            dadst_ref[0, 0, :, h : h + 1] = jnp.sum(dz, axis=1, keepdims=True)
            dasrc_ref[0, 0, h : h + 1, :] = jnp.sum(dz, axis=0, keepdims=True)

    def _specs(H, HC):
        return [
            pl.BlockSpec((1, 1, BLK, H), lambda i, b: (i, b, 0, 0)),
            pl.BlockSpec((1, 1, H, W_pad), lambda i, b: (i, b, 0, 0)),
            pl.BlockSpec((1, 1, W_pad, HC), lambda i, b: (i, b, 0, 0)),
            pl.BlockSpec((1, BLK, W_pad), lambda i, b: (i, 0, 0)),
        ]

    def _call_fwd(adst_b, asrcT, x_r, maskf):
        B, H = adst_b.shape[1], adst_b.shape[-1]
        HC = x_r.shape[-1]
        return pl.pallas_call(
            fwd_kernel,
            grid=(nB, B),
            in_specs=_specs(H, HC),
            out_specs=pl.BlockSpec((1, 1, BLK, HC), lambda i, b: (i, b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nB, B, BLK, HC), jnp.float32),
            interpret=interpret,
        )(adst_b, asrcT, x_r, maskf)

    @jax.custom_vjp
    def attend_core(adst_b, asrcT, x_r, maskf):
        return _call_fwd(adst_b, asrcT, x_r, maskf)

    def fwd_fn(adst_b, asrcT, x_r, maskf):
        return _call_fwd(adst_b, asrcT, x_r, maskf), (adst_b, asrcT, x_r, maskf)

    def bwd_fn(res, g):
        adst_b, asrcT, x_r, maskf = res
        B, H = adst_b.shape[1], adst_b.shape[-1]
        HC = x_r.shape[-1]
        d_adst, d_asrc, d_x = pl.pallas_call(
            bwd_kernel,
            grid=(nB, B),
            in_specs=_specs(H, HC) + [
                pl.BlockSpec((1, 1, BLK, HC), lambda i, b: (i, b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, BLK, H), lambda i, b: (i, b, 0, 0)),
                pl.BlockSpec((1, 1, H, W_pad), lambda i, b: (i, b, 0, 0)),
                pl.BlockSpec((1, 1, W_pad, HC), lambda i, b: (i, b, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nB, B, BLK, H), jnp.float32),
                jax.ShapeDtypeStruct((nB, B, H, W_pad), jnp.float32),
                jax.ShapeDtypeStruct((nB, B, W_pad, HC), jnp.float32),
            ],
            interpret=interpret,
        )(adst_b, asrcT, x_r, maskf, g)
        # the mask is a graph constant, never differentiated; a symbolic-zero
        # cotangent keeps it free (DCE'd under grad-wrt-params)
        return d_adst, d_asrc, d_x, jnp.zeros_like(maskf)

    attend_core.defvjp(fwd_fn, bwd_fn)

    def attend(a_dst, a_src_win, x_win, adj_mask):
        """a_dst [B, n_pad, H] · a_src_win [nB, B, W, H] · x_win
        [nB, B, W, H, C] · adj_mask [nB, BLK, W] (bool) → [B, n_pad, H, C].
        Layout transforms (block-major a_dst, head-major a_src, W pad, mask
        cast) live outside the custom VJP so JAX transposes them natively;
        on a single chip they constant-fold with the mask."""
        _nB, B, _W, H, C = x_win.shape
        assert (_nB, _W) == (nB, W), (x_win.shape, (nB, BLK, W))
        adst_b = a_dst.reshape(B, nB, BLK, H).transpose(1, 0, 2, 3)
        asrcT = jnp.pad(
            a_src_win.transpose(0, 1, 3, 2), ((0, 0),) * 3 + ((0, W_pad - W),)
        )
        x_r = jnp.pad(
            x_win.reshape(nB, B, W, H * C),
            ((0, 0), (0, 0), (0, W_pad - W), (0, 0)),
        )
        maskf = jnp.pad(
            adj_mask.astype(jnp.float32), ((0, 0), (0, 0), (0, W_pad - W))
        )
        out = attend_core(adst_b, asrcT, x_r, maskf)   # [nB, B, BLK, H·C]
        return out.transpose(1, 0, 2, 3).reshape(B, nB * BLK, H, C)

    return attend


def make_band_attention_dma(
    nB: int,
    BLK: int,
    W: int,
    U: int,
    negative_slope: float,
    interpret: Optional[bool] = None,
):
    """v2 kernel: the x windows are DMA'd straight from the *extended* node
    array instead of a materialized ``[nB, B, W, H·C]`` window tensor.

    ``band_windows`` duplicates every node row W/BLK× into HBM (84 MB/layer
    at bigtown-large shapes) purely so BlockSpecs can see disjoint blocks;
    block ``i``'s window is just rows ``[i·BLK, i·BLK + W)`` of the extended
    array, so the kernel issues that copy itself, double-buffered across
    grid cells (guide pattern: two VMEM slots + DMA semaphores).  The
    backward recomputes attention the same way; only the windowed dx
    cotangent is still emitted in window layout (folded outside with the
    same slice-adds ``band_windows``' own AD produces).

    Returns ``attend(a_dst, a_src_win, x_ext, adj_mask)`` where ``x_ext`` is
    ``[B, n_ext, H, C]`` with ``n_ext = nB·BLK + (W − BLK)`` (``U`` zero —
    or halo — rows before the chunk, ``R = W − U − BLK`` after), or ``None``
    when the layout exceeds the VMEM guard.  Requires ``H·C`` to be a
    multiple of 128 (lane-aligned DMA rows); callers route accordingly.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    W_pad = _round_up(W, 128)
    if BLK * W_pad * 4 > (1 << 20):
        return None
    slope = float(negative_slope)
    n_ext = nB * BLK + (W - BLK)

    def _attn(ad_col, as_row, mk):
        z = ad_col + as_row
        z = jnp.where(z >= 0, z, slope * z)
        z = z * mk + (1.0 - mk) * NEG
        m = jnp.max(z, axis=1, keepdims=True)
        p = jnp.exp(z - m)
        return p / jnp.sum(p, axis=1, keepdims=True)

    def _window_dma(x_hbm, xbuf, sem, slot, i, b):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * BLK, W), :],
            xbuf.at[slot, pl.ds(0, W), :],
            sem.at[slot],
        )

    def _pipeline(x_hbm, xbuf, sem, B):
        """Start-next / wait-current double buffering for the cell's window.
        Returns the current cell's [W_pad, HC] window view."""
        i, b = pl.program_id(0), pl.program_id(1)
        t = i * B + b
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t == 0)
        def _():
            _window_dma(x_hbm, xbuf, sem, slot, i, b).start()
            if W_pad > W:
                xbuf[0, pl.ds(W, W_pad - W), :] = jnp.zeros(
                    (W_pad - W, xbuf.shape[-1]), xbuf.dtype
                )
                xbuf[1, pl.ds(W, W_pad - W), :] = jnp.zeros(
                    (W_pad - W, xbuf.shape[-1]), xbuf.dtype
                )

        @pl.when(t + 1 < nB * B)
        def _():
            t1 = t + 1
            _window_dma(
                x_hbm, xbuf, sem, nxt, t1 // B, jax.lax.rem(t1, B)
            ).start()

        _window_dma(x_hbm, xbuf, sem, slot, i, b).wait()
        return xbuf[slot]

    def _make_kernels(mx):
        # mx: matmul operand dtype (None = f32 exact; jnp.bfloat16 runs the
        # MXU at full rate with f32 accumulation — the kernel is compute-
        # bound on f32 matmuls at large H·C, see BASELINE.md)
        def cast(a):
            return a if mx is None else a.astype(mx)

        def fwd_kernel(adst_ref, asrc_ref, mask_ref, x_hbm, o_ref, xbuf, sem):
            B = pl.num_programs(1)
            xw = _pipeline(x_hbm, xbuf, sem, B)           # [W_pad, HC]
            # int8 0/1 mask storage: 4× less HBM traffic than f32 on the
            # per-cell [BLK, W_pad] re-reads; the convert is exact
            mk = mask_ref[0].astype(jnp.float32)
            H = adst_ref.shape[-1]
            C = xw.shape[-1] // H
            for h in range(H):
                ad_col = adst_ref[0, 0][:, h : h + 1]
                as_row = asrc_ref[0, 0][h : h + 1, :]
                p = _attn(ad_col, as_row, mk)
                o_ref[0, 0, :, h * C : (h + 1) * C] = jnp.dot(
                    cast(p), cast(xw[:, h * C : (h + 1) * C]),
                    preferred_element_type=jnp.float32,
                )

        def bwd_kernel(adst_ref, asrc_ref, mask_ref, x_hbm, do_ref,
                       dadst_ref, dasrc_ref, dxw_ref, xbuf, sem):
            B = pl.num_programs(1)
            xw = _pipeline(x_hbm, xbuf, sem, B)
            mk = mask_ref[0].astype(jnp.float32)
            H = adst_ref.shape[-1]
            C = xw.shape[-1] // H
            for h in range(H):
                ad_col = adst_ref[0, 0][:, h : h + 1]
                as_row = asrc_ref[0, 0][h : h + 1, :]
                p = _attn(ad_col, as_row, mk)
                do_h = do_ref[0, 0][:, h * C : (h + 1) * C]
                x_h = xw[:, h * C : (h + 1) * C]
                dxw_ref[0, 0, :, h * C : (h + 1) * C] = jax.lax.dot_general(
                    cast(p), cast(do_h), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(
                    cast(do_h), cast(x_h), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                delta = jnp.sum(dp * p, axis=1, keepdims=True)
                dz = p * (dp - delta)
                zpre = ad_col + as_row
                dz = jnp.where(zpre >= 0, dz, slope * dz)
                dadst_ref[0, 0, :, h : h + 1] = jnp.sum(
                    dz, axis=1, keepdims=True
                )
                dasrc_ref[0, 0, h : h + 1, :] = jnp.sum(
                    dz, axis=0, keepdims=True
                )

        return fwd_kernel, bwd_kernel

    def _specs(H):
        return [
            pl.BlockSpec((1, 1, BLK, H), lambda i, b: (i, b, 0, 0)),
            pl.BlockSpec((1, 1, H, W_pad), lambda i, b: (i, b, 0, 0)),
            pl.BlockSpec((1, BLK, W_pad), lambda i, b: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),      # x_ext stays in HBM
        ]

    def _scratch(HC):
        return [
            pltpu.VMEM((2, W_pad, HC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    def _build_core(mx):
        fwd_kernel, bwd_kernel = _make_kernels(mx)

        def _call_fwd(adst_b, asrcT, x_flat, maskf):
            B, H = adst_b.shape[1], adst_b.shape[-1]
            HC = x_flat.shape[-1]
            return pl.pallas_call(
                fwd_kernel,
                grid=(nB, B),
                in_specs=_specs(H),
                out_specs=pl.BlockSpec((1, 1, BLK, HC),
                                       lambda i, b: (i, b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((nB, B, BLK, HC), jnp.float32),
                scratch_shapes=_scratch(HC),
                interpret=interpret,
            )(adst_b, asrcT, maskf, x_flat)

        @jax.custom_vjp
        def attend_core(adst_b, asrcT, x_flat, maskf):
            return _call_fwd(adst_b, asrcT, x_flat, maskf)

        def fwd_fn(adst_b, asrcT, x_flat, maskf):
            return _call_fwd(adst_b, asrcT, x_flat, maskf), (
                adst_b, asrcT, x_flat, maskf,
            )

        def bwd_fn(res, g):
            adst_b, asrcT, x_flat, maskf = res
            B, H = adst_b.shape[1], adst_b.shape[-1]
            HC = x_flat.shape[-1]
            d_adst, d_asrc, dxw = pl.pallas_call(
                bwd_kernel,
                grid=(nB, B),
                in_specs=_specs(H) + [
                    pl.BlockSpec((1, 1, BLK, HC), lambda i, b: (i, b, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, BLK, H), lambda i, b: (i, b, 0, 0)),
                    pl.BlockSpec((1, 1, H, W_pad), lambda i, b: (i, b, 0, 0)),
                    pl.BlockSpec((1, 1, W_pad, HC), lambda i, b: (i, b, 0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((nB, B, BLK, H), jnp.float32),
                    jax.ShapeDtypeStruct((nB, B, H, W_pad), jnp.float32),
                    jax.ShapeDtypeStruct((nB, B, W_pad, HC), jnp.float32),
                ],
                scratch_shapes=_scratch(HC),
                interpret=interpret,
            )(adst_b, asrcT, maskf, x_flat, g)
            # fold the windowed dx back onto the extended array — the same
            # overlapping slice-adds band_windows' own AD produces
            dx = jnp.zeros_like(x_flat)
            for i in range(nB):
                dx = dx.at[:, i * BLK : i * BLK + W, :].add(dxw[i, :, :W, :])
            # int8 mask primal → float0 cotangent per custom_vjp rules
            import numpy as _np

            return d_adst, d_asrc, dx, _np.zeros(
                maskf.shape, jax.dtypes.float0
            )

        attend_core.defvjp(fwd_fn, bwd_fn)
        return attend_core

    cores: dict = {}

    def attend(a_dst, a_src_win, x_ext, adj_mask, mxu_bf16: bool = False):
        """a_dst [B, n_pad, H] · a_src_win [nB, B, W, H] · x_ext
        [B, n_ext, H, C] · adj_mask [nB, BLK, W] (bool) → [B, n_pad, H, C].

        ``mxu_bf16=True`` casts the matmul operands to bfloat16 (f32
        accumulation) — the kernel is MXU-compute-bound on f32 at large
        H·C; opt-in via the model's ``attn_dtype`` field."""
        B, _n_ext, H, C = x_ext.shape
        assert _n_ext == n_ext, (x_ext.shape, n_ext)
        assert (H * C) % 128 == 0, "DMA rows must be lane-aligned (H·C % 128)"
        mx = jnp.bfloat16 if mxu_bf16 else None
        if mx not in cores:
            cores[mx] = _build_core(mx)
        adst_b = a_dst.reshape(B, nB, BLK, H).transpose(1, 0, 2, 3)
        asrcT = jnp.pad(
            a_src_win.transpose(0, 1, 3, 2), ((0, 0),) * 3 + ((0, W_pad - W),)
        )
        maski = jnp.pad(
            adj_mask.astype(jnp.int8), ((0, 0), (0, 0), (0, W_pad - W))
        )
        out = cores[mx](
            adst_b, asrcT, x_ext.reshape(B, n_ext, H * C), maski
        )
        return out.transpose(1, 0, 2, 3).reshape(B, nB * BLK, H, C)

    return attend


def _chunk_width(W: int, BLK: int) -> int:
    """Streaming-chunk width for the W-chunked kernels: as wide as a
    [BLK, W_CH] f32 slab ≤ 1 MB affords, minimum 128.  The *backward*
    keeps ~4 such slabs live (z, p, dp, dz) plus the x buffers; a 2 MB
    slab (BLK 512 × W_CH 1024) measured 19 MB scoped VMEM and failed to
    compile, so 1 MB is the ceiling."""
    if W > 768:
        ch = 1024
    elif W > 384:
        ch = 512
    else:
        return _round_up(W, 128)
    while BLK * ch * 4 > (1 << 20) and ch > 128:
        ch //= 2
    return ch


def flash_chunk_widths(W: int, BLK: int) -> tuple[int, int, int]:
    """(W_CH_F, W_CH_B, W_pad) for the flash kernel's split-width passes.

    The backward keeps ~4 [BLK, W_CH] slabs live so its chunk obeys
    ``_chunk_width``'s 1 MB budget; the forward holds only ~2 (z/p reuse)
    plus the accumulator, so it can take a 2 MB slab — halving its
    grid-cell count (the measured ~9 µs/cell overhead is the binding cost
    at 23k-node scale).  The forward chunk widens only by exact multiples
    of the backward chunk and only when that does not inflate ``W_pad``
    (both passes chunk the SAME padded operands; the saved row stats m/Z
    are chunking-invariant)."""
    import os

    W_CH_B = _chunk_width(W, BLK)
    W_pad = _round_up(W, W_CH_B)
    W_CH_F = W_CH_B
    # sweepable without code edits (bytes; 1 MB restores the r4 behavior)
    budget = int(os.environ.get("GNN_TPU_FLASH_FWD_BUDGET", 2 << 20))
    for k in (4, 2):
        cand = k * W_CH_B
        if BLK * cand * 4 <= budget and W_pad % cand == 0:
            W_CH_F = cand
            break
    return W_CH_F, W_CH_B, W_pad


def _fold_windows_blocked(dxw: jax.Array, BLK: int, n_ext_pad: int) -> jax.Array:
    """Overlap-add of windowed dx cotangents onto the extended array.

    ``dxw[i, :, c]`` contributes to extended row ``i·BLK + c``.  With
    ``K = W_pad // BLK`` (integral: both are powers of two ≤ the chunk
    width), window column block ``j`` of window ``i`` lands exactly on
    extended block ``i + j`` — so the fold is K parallel shifted adds of
    ``[nB, B, BLK, C]`` slabs instead of an nB-step serial scan of
    dynamic-update-slices (nB reaches ~180 at 23k nodes; the serial chain
    is latency-bound)."""
    nB, B, W_pad, C = dxw.shape
    K = W_pad // BLK
    if K * BLK != W_pad:
        # non-power-of-two BLK (e.g. 192): serial dynamic-update-slice fold
        dx0 = jnp.zeros((B, n_ext_pad, C), dxw.dtype)

        def fold(dx, iw):
            i, dxw_i = iw
            cur = jax.lax.dynamic_slice(dx, (0, i * BLK, 0), (B, W_pad, C))
            return jax.lax.dynamic_update_slice(
                dx, cur + dxw_i, (0, i * BLK, 0)
            ), None

        dx, _ = jax.lax.scan(fold, dx0, (jnp.arange(nB), dxw))
        return dx
    dxw_r = dxw.reshape(nB, B, K, BLK, C)
    acc = jnp.zeros((nB + K, B, BLK, C), dxw.dtype)
    for j in range(K):
        acc = acc.at[j : j + nB].add(dxw_r[:, :, j])
    dx = acc.transpose(1, 0, 2, 3).reshape(B, (nB + K) * BLK, C)
    return dx[:, :n_ext_pad]


def make_band_attention_flash(
    nB: int,
    BLK: int,
    W: int,
    U: int,
    negative_slope: float,
    interpret: Optional[bool] = None,
):
    """v4 kernel: W-chunked streaming softmax (flash-attention style).

    v2/v3 hold a full ``[BLK, W_pad]`` logits tile in VMEM, which caps
    BLK·W_pad at the ~1 MB guard — at a 23k-node network (W = 1792) only
    BLK 128 fits, and the window DMA then re-reads every node row
    W/BLK = 14× per layer (measured 345 ms/step, ~9% of the compute
    roofline).  This variant streams the window in ``W_CH``-wide chunks
    with an online softmax (running row-max ``m``, denominator ``Z``, and
    rescaled accumulator), so VMEM use is O(BLK·W_CH + BLK·H·C) and any
    (BLK, W) combination compiles — larger BLK divides the window-read
    redundancy.  The backward is the standard flash recompute: ``m``/``Z``
    are saved from the forward, ``delta = Σ_c dO∘O`` is computed outside,
    and each chunk reconstructs its attention slab exactly.

    Public signature matches v2: ``attend(a_dst, a_src_win, x_ext,
    adj_mask, mxu_bf16=False)`` with ``x_ext`` of ``n_ext = nB·BLK +
    (W − BLK)`` rows; the wrapper pads rows/cols to W_pad internally.
    Fully-masked (padded) band rows produce the same uniform-attention
    values as v2 (never read back; zero upstream cotangent ⇒ zero grad).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Wide chunks matter more than tight W padding: W_pad rounds UP to the
    # chunk width (tail columns are masked/zeroed), because forcing
    # W_CH | round_up(W, 128) collapses to 128-wide chunks on most real
    # layouts (meganet BLK 256: W 1920 → 15 chunks of 128, measured 550 ms
    # vs 293 ms at 4–5 wide chunks).  Grid-iteration overhead (~9 µs/cell
    # measured at 23k nodes) dominates past ~300 cells, so prefer the
    # widest chunk the VMEM budget allows — the budgets differ per pass
    # (fwd 2 MB slabs, bwd 1 MB; see _chunk_width), so each pass gets its
    # own chunking of the SAME W_pad-padded operands (the saved row stats
    # m/Z are chunking-invariant).
    W_CH_F, W_CH_B, W_pad = flash_chunk_widths(W, BLK)
    assert W_pad % W_CH_B == 0 and W_pad % W_CH_F == 0, (W_CH_F, W_CH_B)
    slope = float(negative_slope)
    n_ext = nB * BLK + (W - BLK)          # caller-visible row count (= v2)
    n_ext_pad = nB * BLK + (W_pad - BLK)  # padded so chunk DMAs stay in range
    MNEG = -3e38  # running-max init; exp(MNEG - m_new) underflows to 0

    def _chunk_dma(x_hbm, xbuf, sem, slot, i, b, w, W_CH):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * BLK + w * W_CH, W_CH), :],
            xbuf.at[slot],
            sem.at[slot],
        )

    def _pipeline(x_hbm, xbuf, sem, W_CH):
        """Double-buffered chunk DMA across the flattened (i, b, w) order."""
        B, nWp = pl.num_programs(1), pl.num_programs(2)
        i, b, w = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        t = (i * B + b) * nWp + w
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t == 0)
        def _():
            _chunk_dma(x_hbm, xbuf, sem, slot, i, b, w, W_CH).start()

        @pl.when(t + 1 < pl.num_programs(0) * B * nWp)
        def _():
            t1 = t + 1
            w1 = jax.lax.rem(t1, nWp)
            b1 = jax.lax.rem(t1 // nWp, B)
            i1 = t1 // (nWp * B)
            _chunk_dma(x_hbm, xbuf, sem, nxt, i1, b1, w1, W_CH).start()

        _chunk_dma(x_hbm, xbuf, sem, slot, i, b, w, W_CH).wait()
        return xbuf[slot]

    def _logits(adst_ref, asrc_ref, mk, h):
        ad_col = adst_ref[0, 0][:, h : h + 1]         # [BLK, 1]
        as_row = asrc_ref[0, 0][h : h + 1, :]         # [1, W_CH]
        z = ad_col + as_row
        z = jnp.where(z >= 0, z, slope * z)
        return z * mk + (1.0 - mk) * NEG

    def _tail_valid(w, W_CH):
        """[W_CH, 1] 0/1 row-validity for window cols ≥ W (v2 zeroes those
        buffer rows; under chunked DMA they alias real rows of the extended
        array, so zero them explicitly — keeps fully-masked padded band rows
        bit-compatible with v2 and makes the full-W_pad dx fold exact)."""
        gcol = w * W_CH + jax.lax.broadcasted_iota(jnp.int32, (W_CH, 1), 0)
        return (gcol < W).astype(jnp.float32)

    def _make_fwd(mx):
        def cast(a):
            return a if mx is None else a.astype(mx)

        def fwd_kernel(adst_ref, asrc_ref, mask_ref, x_hbm,
                       o_ref, m_ref, z_ref, xbuf, sem, acc, mrun, zrun):
            nWp = pl.num_programs(2)
            w = pl.program_id(2)
            xw = _pipeline(x_hbm, xbuf, sem, W_CH_F)  # [W_CH_F, HC]
            xw = xw * _tail_valid(w, W_CH_F)
            # mask is stored int8 (0/1) — 4× less HBM traffic than f32 on
            # the [nB·B·nW, BLK, W_CH] re-reads; the convert is exact
            mk = mask_ref[0].astype(jnp.float32)      # [BLK, W_CH_F]
            H = adst_ref.shape[-1]
            C = xw.shape[-1] // H

            @pl.when(w == 0)
            def _():
                mrun[...] = jnp.full(mrun.shape, MNEG, mrun.dtype)
                zrun[...] = jnp.zeros(zrun.shape, zrun.dtype)
                acc[...] = jnp.zeros(acc.shape, acc.dtype)

            for h in range(H):
                z = _logits(adst_ref, asrc_ref, mk, h)
                mc = jnp.max(z, axis=1, keepdims=True)
                mold = mrun[:, h : h + 1]
                mnew = jnp.maximum(mold, mc)
                alpha = jnp.exp(mold - mnew)          # [BLK, 1]
                pch = jnp.exp(z - mnew)               # [BLK, W_CH]
                zrun[:, h : h + 1] = (
                    zrun[:, h : h + 1] * alpha
                    + jnp.sum(pch, axis=1, keepdims=True)
                )
                acc[:, h * C : (h + 1) * C] = (
                    acc[:, h * C : (h + 1) * C] * alpha
                    + jnp.dot(cast(pch), cast(xw[:, h * C : (h + 1) * C]),
                              preferred_element_type=jnp.float32)
                )
                mrun[:, h : h + 1] = mnew

            @pl.when(w == nWp - 1)
            def _():
                for h in range(H):
                    o_ref[0, 0, :, h * C : (h + 1) * C] = (
                        acc[:, h * C : (h + 1) * C] / zrun[:, h : h + 1]
                    )
                m_ref[0, 0] = mrun[...]
                z_ref[0, 0] = zrun[...]

        return fwd_kernel

    def _make_bwd(mx):
        def cast(a):
            return a if mx is None else a.astype(mx)

        def bwd_kernel(adst_ref, asrc_ref, mask_ref, m_ref, z_ref, delta_ref,
                       do_ref, x_hbm,
                       dadst_ref, dasrc_ref, dxw_ref, xbuf, sem, dad):
            nWp = pl.num_programs(2)
            w = pl.program_id(2)
            xw = _pipeline(x_hbm, xbuf, sem, W_CH_B)
            rv = _tail_valid(w, W_CH_B)
            xw = xw * rv
            mk = mask_ref[0].astype(jnp.float32)
            H = adst_ref.shape[-1]
            C = xw.shape[-1] // H

            @pl.when(w == 0)
            def _():
                dad[...] = jnp.zeros(dad.shape, dad.dtype)

            for h in range(H):
                z = _logits(adst_ref, asrc_ref, mk, h)
                mrow = m_ref[0, 0][:, h : h + 1]
                zrow = z_ref[0, 0][:, h : h + 1]
                p = jnp.exp(z - mrow) / zrow          # exact recompute
                do_h = do_ref[0, 0][:, h * C : (h + 1) * C]
                x_h = xw[:, h * C : (h + 1) * C]
                dxw_ref[0, 0, :, h * C : (h + 1) * C] = rv * jax.lax.dot_general(
                    cast(p), cast(do_h), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(
                    cast(do_h), cast(x_h), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dz = p * (dp - delta_ref[0, 0][:, h : h + 1])
                zpre = (adst_ref[0, 0][:, h : h + 1]
                        + asrc_ref[0, 0][h : h + 1, :])
                dz = jnp.where(zpre >= 0, dz, slope * dz)
                dad[:, h : h + 1] += jnp.sum(dz, axis=1, keepdims=True)
                dasrc_ref[0, 0, h : h + 1, :] = jnp.sum(
                    dz, axis=0, keepdims=True
                )

            @pl.when(w == nWp - 1)
            def _():
                dadst_ref[0, 0] = dad[...]

        return bwd_kernel

    def _in_specs(H, W_CH):
        return [
            pl.BlockSpec((1, 1, BLK, H), lambda i, b, w: (i, b, 0, 0)),
            pl.BlockSpec((1, 1, H, W_CH), lambda i, b, w: (i, b, 0, w)),
            pl.BlockSpec((1, BLK, W_CH), lambda i, b, w: (i, 0, w)),
        ]

    # ---- batch-folded variant (VERDICT r4 lever: "fold the batch axis
    # into wider cells").  The grid drops the batch dimension — each cell
    # loops b internally — so at meganet b2 the cell count halves and the
    # batch-invariant adjacency-mask chunk is read ONCE per cell instead of
    # once per (cell, b).  Per-b slabs are serial temporaries (VMEM reuse);
    # only the x DMA buffers and the running accumulators scale with B.

    def _pipeline_bf(x_hbm, xbuf, sem, W_CH, B):
        """Double-buffered chunk DMA over the flattened (i, w) order; each
        chunk fetches all B batch windows (one DMA + semaphore per b)."""
        nWp = pl.num_programs(1)
        i, w = pl.program_id(0), pl.program_id(1)
        t = i * nWp + w
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        def start(slot_, i_, w_):
            for b in range(B):
                pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(i_ * BLK + w_ * W_CH, W_CH), :],
                    xbuf.at[slot_, b],
                    sem.at[slot_, b],
                ).start()

        @pl.when(t == 0)
        def _():
            start(slot, i, w)

        @pl.when(t + 1 < pl.num_programs(0) * nWp)
        def _():
            t1 = t + 1
            start(nxt, t1 // nWp, jax.lax.rem(t1, nWp))

        for b in range(B):
            pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(i * BLK + w * W_CH, W_CH), :],
                xbuf.at[slot, b],
                sem.at[slot, b],
            ).wait()
        return slot

    def _make_fwd_bf(mx, B):
        def cast(a):
            return a if mx is None else a.astype(mx)

        def fwd_kernel(adst_ref, asrc_ref, mask_ref, x_hbm,
                       o_ref, m_ref, z_ref, xbuf, sem, acc, mrun, zrun):
            nWp = pl.num_programs(1)
            w = pl.program_id(1)
            slot = _pipeline_bf(x_hbm, xbuf, sem, W_CH_F, B)
            rv = _tail_valid(w, W_CH_F)
            mk = mask_ref[0].astype(jnp.float32)      # shared across b
            H = adst_ref.shape[-1]
            C = xbuf.shape[-1] // H

            @pl.when(w == 0)
            def _():
                mrun[...] = jnp.full(mrun.shape, MNEG, mrun.dtype)
                zrun[...] = jnp.zeros(zrun.shape, zrun.dtype)
                acc[...] = jnp.zeros(acc.shape, acc.dtype)

            for b in range(B):
                xw = xbuf[slot, b] * rv
                for h in range(H):
                    ad_col = adst_ref[0, b][:, h : h + 1]
                    as_row = asrc_ref[0, b][h : h + 1, :]
                    z = ad_col + as_row
                    z = jnp.where(z >= 0, z, slope * z)
                    z = z * mk + (1.0 - mk) * NEG
                    mc = jnp.max(z, axis=1, keepdims=True)
                    mold = mrun[b][:, h : h + 1]
                    mnew = jnp.maximum(mold, mc)
                    alpha = jnp.exp(mold - mnew)
                    pch = jnp.exp(z - mnew)
                    zrun[b, :, h : h + 1] = (
                        zrun[b][:, h : h + 1] * alpha
                        + jnp.sum(pch, axis=1, keepdims=True)
                    )
                    acc[b, :, h * C : (h + 1) * C] = (
                        acc[b][:, h * C : (h + 1) * C] * alpha
                        + jnp.dot(cast(pch), cast(xw[:, h * C : (h + 1) * C]),
                                  preferred_element_type=jnp.float32)
                    )
                    mrun[b, :, h : h + 1] = mnew

            @pl.when(w == nWp - 1)
            def _():
                for b in range(B):
                    for h in range(H):
                        o_ref[0, b, :, h * C : (h + 1) * C] = (
                            acc[b][:, h * C : (h + 1) * C]
                            / zrun[b][:, h : h + 1]
                        )
                m_ref[0] = mrun[...]
                z_ref[0] = zrun[...]

        return fwd_kernel

    def _make_bwd_bf(mx, B):
        def cast(a):
            return a if mx is None else a.astype(mx)

        def bwd_kernel(adst_ref, asrc_ref, mask_ref, m_ref, z_ref, delta_ref,
                       do_ref, x_hbm,
                       dadst_ref, dasrc_ref, dxw_ref, xbuf, sem, dad):
            nWp = pl.num_programs(1)
            w = pl.program_id(1)
            slot = _pipeline_bf(x_hbm, xbuf, sem, W_CH_B, B)
            rv = _tail_valid(w, W_CH_B)
            mk = mask_ref[0].astype(jnp.float32)
            H = adst_ref.shape[-1]
            C = xbuf.shape[-1] // H

            @pl.when(w == 0)
            def _():
                dad[...] = jnp.zeros(dad.shape, dad.dtype)

            for b in range(B):
                xw = xbuf[slot, b] * rv
                for h in range(H):
                    ad_col = adst_ref[0, b][:, h : h + 1]
                    as_row = asrc_ref[0, b][h : h + 1, :]
                    zpre = ad_col + as_row
                    z = jnp.where(zpre >= 0, zpre, slope * zpre)
                    z = z * mk + (1.0 - mk) * NEG
                    mrow = m_ref[0, b][:, h : h + 1]
                    zrow = z_ref[0, b][:, h : h + 1]
                    p = jnp.exp(z - mrow) / zrow
                    do_h = do_ref[0, b][:, h * C : (h + 1) * C]
                    x_h = xw[:, h * C : (h + 1) * C]
                    dxw_ref[0, b, :, h * C : (h + 1) * C] = (
                        rv * jax.lax.dot_general(
                            cast(p), cast(do_h), (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
                    dp = jax.lax.dot_general(
                        cast(do_h), cast(x_h), (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    dz = p * (dp - delta_ref[0, b][:, h : h + 1])
                    dz = jnp.where(zpre >= 0, dz, slope * dz)
                    dad[b, :, h : h + 1] += jnp.sum(dz, axis=1, keepdims=True)
                    dasrc_ref[0, b, h : h + 1, :] = jnp.sum(
                        dz, axis=0, keepdims=True
                    )

            @pl.when(w == nWp - 1)
            def _():
                dadst_ref[0] = dad[...]

        return bwd_kernel

    def _in_specs_bf(B, H, W_CH):
        return [
            pl.BlockSpec((1, B, BLK, H), lambda i, w: (i, 0, 0, 0)),
            pl.BlockSpec((1, B, H, W_CH), lambda i, w: (i, 0, 0, w)),
            pl.BlockSpec((1, BLK, W_CH), lambda i, w: (i, 0, w)),
        ]

    def _fold_B(B, HC):
        """Fold the batch axis into grid cells when enabled and the folded
        DMA buffers + accumulators stay within a conservative VMEM share."""
        import os

        if B <= 1 or os.environ.get("GNN_TPU_BAND_BFOLD", "0") != "1":
            return False
        xbuf_f = 2 * B * W_CH_F * HC * 4      # double-buffered fwd windows
        xbuf_b = 2 * B * W_CH_B * HC * 4
        accs = B * BLK * HC * 4               # running accumulator (fwd)
        return max(xbuf_f, xbuf_b) + accs <= (8 << 20)

    def _build_core(mx):
        fwd_kernel = _make_fwd(mx)
        bwd_kernel = _make_bwd(mx)

        def call_fwd(adst_b, asrcT, x_flat, maskf):
            B, H = adst_b.shape[1], adst_b.shape[-1]
            HC = x_flat.shape[-1]
            if _fold_B(B, HC):
                return pl.pallas_call(
                    _make_fwd_bf(mx, B),
                    grid=(nB, W_pad // W_CH_F),
                    in_specs=_in_specs_bf(B, H, W_CH_F)
                    + [pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=[
                        pl.BlockSpec((1, B, BLK, HC), lambda i, w: (i, 0, 0, 0)),
                        pl.BlockSpec((1, B, BLK, H), lambda i, w: (i, 0, 0, 0)),
                        pl.BlockSpec((1, B, BLK, H), lambda i, w: (i, 0, 0, 0)),
                    ],
                    out_shape=[
                        jax.ShapeDtypeStruct((nB, B, BLK, HC), jnp.float32),
                        jax.ShapeDtypeStruct((nB, B, BLK, H), jnp.float32),
                        jax.ShapeDtypeStruct((nB, B, BLK, H), jnp.float32),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((2, B, W_CH_F, HC), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, B)),
                        pltpu.VMEM((B, BLK, HC), jnp.float32),
                        pltpu.VMEM((B, BLK, H), jnp.float32),
                        pltpu.VMEM((B, BLK, H), jnp.float32),
                    ],
                    interpret=interpret,
                )(adst_b, asrcT, maskf, x_flat)
            return pl.pallas_call(
                fwd_kernel,
                grid=(nB, B, W_pad // W_CH_F),
                in_specs=_in_specs(H, W_CH_F)
                + [pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[
                    pl.BlockSpec((1, 1, BLK, HC), lambda i, b, w: (i, b, 0, 0)),
                    pl.BlockSpec((1, 1, BLK, H), lambda i, b, w: (i, b, 0, 0)),
                    pl.BlockSpec((1, 1, BLK, H), lambda i, b, w: (i, b, 0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((nB, B, BLK, HC), jnp.float32),
                    jax.ShapeDtypeStruct((nB, B, BLK, H), jnp.float32),
                    jax.ShapeDtypeStruct((nB, B, BLK, H), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, W_CH_F, HC), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((BLK, HC), jnp.float32),
                    pltpu.VMEM((BLK, H), jnp.float32),
                    pltpu.VMEM((BLK, H), jnp.float32),
                ],
                interpret=interpret,
            )(adst_b, asrcT, maskf, x_flat)

        def call_bwd(adst_b, asrcT, maskf, m, zd, delta, g, x_flat):
            B, H = adst_b.shape[1], adst_b.shape[-1]
            HC = x_flat.shape[-1]
            if _fold_B(B, HC):
                return pl.pallas_call(
                    _make_bwd_bf(mx, B),
                    grid=(nB, W_pad // W_CH_B),
                    in_specs=_in_specs_bf(B, H, W_CH_B) + [
                        pl.BlockSpec((1, B, BLK, H), lambda i, w: (i, 0, 0, 0)),
                        pl.BlockSpec((1, B, BLK, H), lambda i, w: (i, 0, 0, 0)),
                        pl.BlockSpec((1, B, BLK, H), lambda i, w: (i, 0, 0, 0)),
                        pl.BlockSpec((1, B, BLK, HC), lambda i, w: (i, 0, 0, 0)),
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    out_specs=[
                        pl.BlockSpec((1, B, BLK, H), lambda i, w: (i, 0, 0, 0)),
                        pl.BlockSpec((1, B, H, W_CH_B), lambda i, w: (i, 0, 0, w)),
                        pl.BlockSpec((1, B, W_CH_B, HC), lambda i, w: (i, 0, w, 0)),
                    ],
                    out_shape=[
                        jax.ShapeDtypeStruct((nB, B, BLK, H), jnp.float32),
                        jax.ShapeDtypeStruct((nB, B, H, W_pad), jnp.float32),
                        jax.ShapeDtypeStruct((nB, B, W_pad, HC), jnp.float32),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((2, B, W_CH_B, HC), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, B)),
                        pltpu.VMEM((B, BLK, H), jnp.float32),
                    ],
                    interpret=interpret,
                )(adst_b, asrcT, maskf, m, zd, delta, g, x_flat)
            return pl.pallas_call(
                bwd_kernel,
                grid=(nB, B, W_pad // W_CH_B),
                in_specs=_in_specs(H, W_CH_B) + [
                    pl.BlockSpec((1, 1, BLK, H), lambda i, b, w: (i, b, 0, 0)),
                    pl.BlockSpec((1, 1, BLK, H), lambda i, b, w: (i, b, 0, 0)),
                    pl.BlockSpec((1, 1, BLK, H), lambda i, b, w: (i, b, 0, 0)),
                    pl.BlockSpec((1, 1, BLK, HC), lambda i, b, w: (i, b, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, BLK, H), lambda i, b, w: (i, b, 0, 0)),
                    pl.BlockSpec((1, 1, H, W_CH_B), lambda i, b, w: (i, b, 0, w)),
                    pl.BlockSpec((1, 1, W_CH_B, HC), lambda i, b, w: (i, b, w, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((nB, B, BLK, H), jnp.float32),
                    jax.ShapeDtypeStruct((nB, B, H, W_pad), jnp.float32),
                    jax.ShapeDtypeStruct((nB, B, W_pad, HC), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, W_CH_B, HC), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((BLK, H), jnp.float32),
                ],
                interpret=interpret,
            )(adst_b, asrcT, maskf, m, zd, delta, g, x_flat)

        @jax.custom_vjp
        def core(adst_b, asrcT, x_flat, maskf):
            out, _, _ = call_fwd(adst_b, asrcT, x_flat, maskf)
            return out

        def fwd_fn(adst_b, asrcT, x_flat, maskf):
            out, m, zd = call_fwd(adst_b, asrcT, x_flat, maskf)
            return out, (adst_b, asrcT, x_flat, maskf, m, zd, out)

        def bwd_fn(res, g):
            adst_b, asrcT, x_flat, maskf, m, zd, out = res
            B, H = adst_b.shape[1], adst_b.shape[-1]
            HC = x_flat.shape[-1]
            C = HC // H
            # delta_i = dO_i · O_i per head (flash-backward identity for the
            # softmax-VJP row term Σ_j dp_ij p_ij)
            delta = jnp.sum(
                (g * out).reshape(nB, B, BLK, H, C), axis=-1
            )
            d_adst, d_asrc, dxw = call_bwd(
                adst_b, asrcT, maskf, m, zd, delta, g, x_flat
            )
            dx = _fold_windows_blocked(dxw, BLK, n_ext_pad)
            # int8 mask primal → float0 cotangent per custom_vjp rules
            import numpy as _np

            return d_adst, d_asrc, dx, _np.zeros(
                maskf.shape, jax.dtypes.float0
            )

        core.defvjp(fwd_fn, bwd_fn)
        return core

    cores: dict = {}

    def attend(a_dst, a_src_win, x_ext, adj_mask, mxu_bf16: bool = False):
        """Same contract as v2's ``attend``: a_dst [B, n_pad, H] ·
        a_src_win [nB, B, W, H] · x_ext [B, n_ext, H, C] · adj_mask
        [nB, BLK, W] → [B, n_pad, H, C]."""
        B, _n_ext, H, C = x_ext.shape
        assert _n_ext == n_ext, (x_ext.shape, n_ext)
        assert (H * C) % 128 == 0
        mx = jnp.bfloat16 if mxu_bf16 else None
        if mx not in cores:
            cores[mx] = _build_core(mx)
        adst_b = a_dst.reshape(B, nB, BLK, H).transpose(1, 0, 2, 3)
        asrcT = jnp.pad(
            a_src_win.transpose(0, 1, 3, 2), ((0, 0),) * 3 + ((0, W_pad - W),)
        )
        maski = jnp.pad(
            adj_mask.astype(jnp.int8), ((0, 0), (0, 0), (0, W_pad - W))
        )
        x_flat = jnp.pad(
            x_ext.reshape(B, n_ext, H * C),
            ((0, 0), (0, n_ext_pad - n_ext), (0, 0)),
        )
        out = cores[mx](adst_b, asrcT, x_flat, maski)  # [nB, B, BLK, HC]
        return out.transpose(1, 0, 2, 3).reshape(B, nB * BLK, H, C)

    return attend


def make_band_spmm_flash(
    nB: int,
    BLK: int,
    W: int,
    U: int,
    interpret: Optional[bool] = None,
):
    """Chunked-DMA banded SpMM: ``out[i·BLK+r] = Σ_j band[i,r,j] ·
    x_ext[i·BLK+j]`` without materializing the ``[nB, B, W, C]`` window
    tensor the XLA band path builds (ops/banded.py ``band_windows`` +
    ``band_spmm``; ~330 MB/layer at 23k-node scale).  Serves the
    parameter-free aggregations (mean conv, GCN/Cheb propagation, adjacency
    sum) whose band weights are graph *constants* — the custom VJP therefore
    returns a zero cotangent for ``band`` (do NOT route trainable band
    weights through this kernel) and an exact windowed-dx fold for ``x``.

    Returns ``spmm(band, x_ext) -> [B, n_pad, C]`` with ``band
    [nB, BLK, W]`` and ``x_ext [B, n_ext, C]``; requires C % 128 == 0
    (lane-aligned chunk DMA rows).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # same wide-chunk rule as make_band_attention_flash (see comment there)
    W_CH = _chunk_width(W, BLK)
    W_pad = _round_up(W, W_CH)
    nW = W_pad // W_CH
    n_ext = nB * BLK + (W - BLK)
    n_ext_pad = nB * BLK + (W_pad - BLK)

    def _chunk_dma(x_hbm, xbuf, sem, slot, i, b, w):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * BLK + w * W_CH, W_CH), :],
            xbuf.at[slot],
            sem.at[slot],
        )

    def _pipeline(x_hbm, xbuf, sem):
        B, nWp = pl.num_programs(1), pl.num_programs(2)
        i, b, w = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        t = (i * B + b) * nWp + w
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t == 0)
        def _():
            _chunk_dma(x_hbm, xbuf, sem, slot, i, b, w).start()

        @pl.when(t + 1 < pl.num_programs(0) * B * nWp)
        def _():
            t1 = t + 1
            w1 = jax.lax.rem(t1, nWp)
            b1 = jax.lax.rem(t1 // nWp, B)
            i1 = t1 // (nWp * B)
            _chunk_dma(x_hbm, xbuf, sem, nxt, i1, b1, w1).start()

        _chunk_dma(x_hbm, xbuf, sem, slot, i, b, w).wait()
        return xbuf[slot]

    def fwd_kernel(band_ref, x_hbm, o_ref, xbuf, sem, acc):
        nWp = pl.num_programs(2)
        w = pl.program_id(2)
        xw = _pipeline(x_hbm, xbuf, sem)              # [W_CH, C]

        @pl.when(w == 0)
        def _():
            acc[...] = jnp.zeros(acc.shape, acc.dtype)

        # band pad cols (≥ W) are zero, so tail x rows carry zero weight.
        # int8 count bands (factored mean) convert in-VMEM — the band slab
        # is re-read per grid cell, so its storage dtype is HBM traffic.
        acc[...] += jnp.dot(band_ref[0].astype(jnp.float32), xw,
                            preferred_element_type=jnp.float32)

        @pl.when(w == nWp - 1)
        def _():
            o_ref[0, 0] = acc[...]

    def bwd_kernel(band_ref, do_ref, dxw_ref):
        # dx window chunk = band_chunkᵀ @ dO (band tail cols zero ⇒ dxw tail
        # rows zero ⇒ the full-W_pad fold outside is exact). No DMA needed:
        # everything is block-mapped.
        dxw_ref[0, 0] = jax.lax.dot_general(
            band_ref[0].astype(jnp.float32), do_ref[0, 0],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- batch-folded variant (same GNN_TPU_BAND_BFOLD lever as the flash
    # attention kernel).  The band chunk is batch-invariant, so folding b
    # into the cell turns B separate [BLK,W_CH]@[W_CH,C] products into ONE
    # [BLK,W_CH]@[W_CH,B·C] matmul against lane-concatenated batch windows:
    # B× fewer grid cells, B× fewer band-slab re-reads, B× wider MXU lanes.

    def _fold_B(B, C):
        import os

        if B <= 1 or os.environ.get("GNN_TPU_BAND_BFOLD", "0") != "1":
            return False
        return 2 * W_CH * B * C * 4 + BLK * B * C * 4 <= (8 << 20)

    def _pipeline_bf(x_hbm, xbuf, sem, B, C):
        """Chunk DMA over (i, w); each chunk lands batch b's window in the
        lane-sliced destination xbuf[slot][:, b·C:(b+1)·C]."""
        nWp = pl.num_programs(1)
        i, w = pl.program_id(0), pl.program_id(1)
        t = i * nWp + w
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        def start(slot_, i_, w_):
            for b in range(B):
                pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(i_ * BLK + w_ * W_CH, W_CH), :],
                    xbuf.at[slot_, :, pl.ds(b * C, C)],
                    sem.at[slot_, b],
                ).start()

        @pl.when(t == 0)
        def _():
            start(slot, i, w)

        @pl.when(t + 1 < pl.num_programs(0) * nWp)
        def _():
            t1 = t + 1
            start(nxt, t1 // nWp, jax.lax.rem(t1, nWp))

        for b in range(B):
            pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(i * BLK + w * W_CH, W_CH), :],
                xbuf.at[slot, :, pl.ds(b * C, C)],
                sem.at[slot, b],
            ).wait()
        return slot

    def _make_fwd_bf(B, C):
        def fwd_kernel(band_ref, x_hbm, o_ref, xbuf, sem, acc):
            nWp = pl.num_programs(1)
            w = pl.program_id(1)
            slot = _pipeline_bf(x_hbm, xbuf, sem, B, C)

            @pl.when(w == 0)
            def _():
                acc[...] = jnp.zeros(acc.shape, acc.dtype)

            acc[...] += jnp.dot(band_ref[0].astype(jnp.float32), xbuf[slot],
                                preferred_element_type=jnp.float32)

            @pl.when(w == nWp - 1)
            def _():
                for b in range(B):
                    o_ref[0, b] = acc[:, b * C : (b + 1) * C]

        return fwd_kernel

    def _make_bwd_bf(B, C):
        def bwd_kernel(band_ref, do_ref, dxw_ref):
            do_cat = jnp.concatenate(
                [do_ref[0, b] for b in range(B)], axis=1
            )  # [BLK, B·C]
            dxw = jax.lax.dot_general(
                band_ref[0].astype(jnp.float32), do_cat,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [W_CH, B·C]
            for b in range(B):
                dxw_ref[0, b] = dxw[:, b * C : (b + 1) * C]

        return bwd_kernel

    def _call_fwd(bandp, x_flat):
        B = x_flat.shape[0]
        C = x_flat.shape[-1]
        if _fold_B(B, C):
            return pl.pallas_call(
                _make_fwd_bf(B, C),
                grid=(nB, nW),
                in_specs=[
                    pl.BlockSpec((1, BLK, W_CH), lambda i, w: (i, 0, w)),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((1, B, BLK, C), lambda i, w: (i, 0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((nB, B, BLK, C), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((2, W_CH, B * C), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, B)),
                    pltpu.VMEM((BLK, B * C), jnp.float32),
                ],
                interpret=interpret,
            )(bandp, x_flat)
        return pl.pallas_call(
            fwd_kernel,
            grid=(nB, B, nW),
            in_specs=[
                pl.BlockSpec((1, BLK, W_CH), lambda i, b, w: (i, 0, w)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, BLK, C), lambda i, b, w: (i, b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nB, B, BLK, C), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, W_CH, C), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((BLK, C), jnp.float32),
            ],
            interpret=interpret,
        )(bandp, x_flat)

    @jax.custom_vjp
    def core(bandp, x_flat):
        return _call_fwd(bandp, x_flat)

    def fwd_fn(bandp, x_flat):
        return _call_fwd(bandp, x_flat), bandp

    def bwd_fn(res, g):
        bandp = res
        B = g.shape[1]
        C = g.shape[-1]
        if _fold_B(B, C):
            dxw = pl.pallas_call(
                _make_bwd_bf(B, C),
                grid=(nB, nW),
                in_specs=[
                    pl.BlockSpec((1, BLK, W_CH), lambda i, w: (i, 0, w)),
                    pl.BlockSpec((1, B, BLK, C), lambda i, w: (i, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, B, W_CH, C), lambda i, w: (i, 0, w, 0)
                ),
                out_shape=jax.ShapeDtypeStruct((nB, B, W_pad, C), jnp.float32),
                interpret=interpret,
            )(bandp, g)
        else:
            dxw = pl.pallas_call(
                bwd_kernel,
                grid=(nB, B, nW),
                in_specs=[
                    pl.BlockSpec((1, BLK, W_CH), lambda i, b, w: (i, 0, w)),
                    pl.BlockSpec((1, 1, BLK, C), lambda i, b, w: (i, b, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, W_CH, C), lambda i, b, w: (i, b, w, 0)
                ),
                out_shape=jax.ShapeDtypeStruct((nB, B, W_pad, C), jnp.float32),
                interpret=interpret,
            )(bandp, g)
        dx = _fold_windows_blocked(dxw, BLK, n_ext_pad)
        # band weights are graph constants (mean/gcn/cheb/adj bands) — zero
        # cotangent by contract (float0 when the band is an int8 count band)
        if jnp.issubdtype(bandp.dtype, jnp.floating):
            dband = jnp.zeros_like(bandp)
        else:
            import numpy as _np

            dband = _np.zeros(bandp.shape, jax.dtypes.float0)
        return dband, dx

    core.defvjp(fwd_fn, bwd_fn)

    def spmm(band, x_ext):
        """band [nB, BLK, W] (f32 weights or int8 counts) · x_ext
        [B, n_ext, C] → [B, n_pad, C]."""
        B, _n_ext, C = x_ext.shape
        assert _n_ext == n_ext, (x_ext.shape, n_ext)
        assert C % 128 == 0
        if not jnp.issubdtype(band.dtype, jnp.floating):
            bandp = jnp.pad(band, ((0, 0), (0, 0), (0, W_pad - W)))
        else:
            bandp = jnp.pad(
                band.astype(jnp.float32), ((0, 0), (0, 0), (0, W_pad - W))
            )
        x_flat = jnp.pad(x_ext, ((0, 0), (0, n_ext_pad - n_ext), (0, 0)))
        out = core(bandp, x_flat)                     # [nB, B, BLK, C]
        return out.transpose(1, 0, 2, 3).reshape(B, nB * BLK, C)

    return spmm


def make_band_attention_acc(
    nB: int,
    BLK: int,
    W: int,
    U: int,
    negative_slope: float,
    interpret: Optional[bool] = None,
):
    """v3 kernel: v2's DMA'd input windows *plus* a sliding-accumulator
    backward that writes ``dx`` directly onto the extended array — no
    windowed ``[nB,B,W,H·C]`` dx tensor and no fold pass.

    Window ``j`` covers rows ``[j·BLK, j·BLK+W)`` of the extended array, so
    the last window touching row ``r`` is ``j = r//BLK``: with the grid
    ordered graph-major (``i`` fastest, one graph's block-rows in sequence)
    a ``[W_pad, H·C]`` VMEM accumulator can absorb window ``i``'s
    contribution, flush its first BLK rows (now final) to HBM, shift by
    BLK, and continue — TPU Pallas grids execute sequentially, which is
    what makes the carry correct.  The adjacency mask is int8 here (the
    i-fastest order reloads it every cell; f32 would re-read 4× the bytes).

    Forward is v2's.  Returns ``attend(a_dst, a_src_win, x_ext, adj_mask,
    mxu_bf16=False)`` or ``None`` past the VMEM guard.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    W_pad = _round_up(W, 128)
    if BLK * W_pad * 4 > (1 << 20):
        return None
    slope = float(negative_slope)
    n_ext = nB * BLK + (W - BLK)

    v2 = make_band_attention_dma(nB, BLK, W, U, negative_slope, interpret)

    def _attn(ad_col, as_row, mk):
        z = ad_col + as_row
        z = jnp.where(z >= 0, z, slope * z)
        z = z * mk + (1.0 - mk) * NEG
        m = jnp.max(z, axis=1, keepdims=True)
        p = jnp.exp(z - m)
        return p / jnp.sum(p, axis=1, keepdims=True)

    def _window_dma(x_hbm, xbuf, sem, slot, b, i):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * BLK, W), :],
            xbuf.at[slot, pl.ds(0, W), :],
            sem.at[slot],
        )

    def _make_bwd(mx):
        def cast(a):
            return a if mx is None else a.astype(mx)

        def bwd_kernel(adst_ref, asrc_ref, mask_ref, x_hbm, do_ref,
                       dadst_ref, dasrc_ref, dx_hbm,
                       xbuf, xsem, acc, stage, fsem):
            nBp = pl.num_programs(1)
            b, i = pl.program_id(0), pl.program_id(1)
            t = b * nBp + i
            slot = jax.lax.rem(t, 2)
            nxt = jax.lax.rem(t + 1, 2)

            @pl.when(t == 0)
            def _():
                _window_dma(x_hbm, xbuf, xsem, slot, b, i).start()
                if W_pad > W:
                    xbuf[0, pl.ds(W, W_pad - W), :] = jnp.zeros(
                        (W_pad - W, xbuf.shape[-1]), xbuf.dtype)
                    xbuf[1, pl.ds(W, W_pad - W), :] = jnp.zeros(
                        (W_pad - W, xbuf.shape[-1]), xbuf.dtype)

            @pl.when(t + 1 < pl.num_programs(0) * nBp)
            def _():
                t1 = t + 1
                _window_dma(x_hbm, xbuf, xsem, nxt,
                            t1 // nBp, jax.lax.rem(t1, nBp)).start()

            _window_dma(x_hbm, xbuf, xsem, slot, b, i).wait()
            xw = xbuf[slot]

            @pl.when(i == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            mk = mask_ref[0].astype(jnp.float32)
            H = adst_ref.shape[-1]
            C = xw.shape[-1] // H
            for h in range(H):
                ad_col = adst_ref[0, 0][:, h : h + 1]
                as_row = asrc_ref[0, 0][h : h + 1, :]
                p = _attn(ad_col, as_row, mk)
                do_h = do_ref[0, 0][:, h * C : (h + 1) * C]
                x_h = xw[:, h * C : (h + 1) * C]
                acc[:, h * C : (h + 1) * C] += jax.lax.dot_general(
                    cast(p), cast(do_h), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(
                    cast(do_h), cast(x_h), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                delta = jnp.sum(dp * p, axis=1, keepdims=True)
                dz = p * (dp - delta)
                zpre = ad_col + as_row
                dz = jnp.where(zpre >= 0, dz, slope * dz)
                dadst_ref[0, 0, :, h : h + 1] = jnp.sum(
                    dz, axis=1, keepdims=True)
                dasrc_ref[0, 0, h : h + 1, :] = jnp.sum(
                    dz, axis=0, keepdims=True)

            # rows [i·BLK, (i+1)·BLK) are final: stage + async flush, then
            # slide the accumulator by BLK for the next block-row
            fslot = jax.lax.rem(i, 2)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    stage.at[fslot],
                    dx_hbm.at[b, pl.ds((i - 2) * BLK, BLK), :],
                    fsem.at[fslot],
                ).wait()

            stage[fslot, :, :] = acc[pl.ds(0, BLK), :]
            pltpu.make_async_copy(
                stage.at[fslot],
                dx_hbm.at[b, pl.ds(i * BLK, BLK), :],
                fsem.at[fslot],
            ).start()

            @pl.when(i < nBp - 1)
            def _():
                acc[pl.ds(0, W_pad - BLK), :] = acc[pl.ds(BLK, W_pad - BLK), :]
                acc[pl.ds(W_pad - BLK, BLK), :] = jnp.zeros(
                    (BLK, acc.shape[-1]), acc.dtype)

            @pl.when(i == nBp - 1)
            def _():
                # drain the previous staged flush first (it shares the
                # semaphore slot the tail copy will reuse), then flush the
                # remaining W−BLK rows straight from the accumulator (acc is
                # not touched again → synchronous start+wait, no staging),
                # then drain this step's own flush
                @pl.when(i >= 1)
                def _():
                    pltpu.make_async_copy(
                        stage.at[jax.lax.rem(i - 1, 2)],
                        dx_hbm.at[b, pl.ds((i - 1) * BLK, BLK), :],
                        fsem.at[jax.lax.rem(i - 1, 2)],
                    ).wait()

                # static guard: when W == BLK there are no tail rows and a
                # zero-length async copy may be rejected by Mosaic
                tail = W - BLK
                if tail > 0:
                    tdma = pltpu.make_async_copy(
                        acc.at[pl.ds(BLK, tail), :],
                        dx_hbm.at[b, pl.ds(nB * BLK, tail), :],
                        fsem.at[jax.lax.rem(i + 1, 2)],
                    )
                    tdma.start()
                    tdma.wait()

                pltpu.make_async_copy(
                    stage.at[fslot],
                    dx_hbm.at[b, pl.ds(i * BLK, BLK), :],
                    fsem.at[fslot],
                ).wait()

        return bwd_kernel

    def _specs(H):
        return [
            pl.BlockSpec((1, 1, BLK, H), lambda b, i: (i, b, 0, 0)),
            pl.BlockSpec((1, 1, H, W_pad), lambda b, i: (i, b, 0, 0)),
            pl.BlockSpec((1, BLK, W_pad), lambda b, i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ]

    def _build_bwd(mx):
        bwd_kernel = _make_bwd(mx)

        def call_bwd(adst_b, asrcT, x_flat, mask8, g):
            B, H = adst_b.shape[1], adst_b.shape[-1]
            HC = x_flat.shape[-1]
            return pl.pallas_call(
                bwd_kernel,
                grid=(B, nB),
                in_specs=_specs(H) + [
                    pl.BlockSpec((1, 1, BLK, HC), lambda b, i: (i, b, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, BLK, H), lambda b, i: (i, b, 0, 0)),
                    pl.BlockSpec((1, 1, H, W_pad), lambda b, i: (i, b, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((nB, B, BLK, H), jnp.float32),
                    jax.ShapeDtypeStruct((nB, B, H, W_pad), jnp.float32),
                    jax.ShapeDtypeStruct((B, n_ext, HC), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, W_pad, HC), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((W_pad, HC), jnp.float32),
                    pltpu.VMEM((2, BLK, HC), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                interpret=interpret,
            )(adst_b, asrcT, mask8, x_flat, g)

        return call_bwd

    cores: dict = {}

    def attend(a_dst, a_src_win, x_ext, adj_mask, mxu_bf16: bool = False):
        """v3 public API — forward identical to v2 (and reuses it); the
        custom VJP routes the backward through the sliding-accumulator
        kernel."""
        B, _n_ext, H, C = x_ext.shape
        assert _n_ext == n_ext, (x_ext.shape, n_ext)
        assert (H * C) % 128 == 0
        mx = jnp.bfloat16 if mxu_bf16 else None
        if mx not in cores:
            call_bwd = _build_bwd(mx)

            @jax.custom_vjp
            def core(a_dst, a_src_win, x_ext, adj_mask):
                return v2(a_dst, a_src_win, x_ext, adj_mask,
                          mxu_bf16=mx is not None)

            def fwd_fn(a_dst, a_src_win, x_ext, adj_mask):
                return core(a_dst, a_src_win, x_ext, adj_mask), (
                    a_dst, a_src_win, x_ext, adj_mask)

            def bwd_fn(res, g):
                a_dst, a_src_win, x_ext_, adj_mask = res
                B_, _, H_, C_ = x_ext_.shape
                adst_b = a_dst.reshape(B_, nB, BLK, H_).transpose(1, 0, 2, 3)
                asrcT = jnp.pad(
                    a_src_win.transpose(0, 1, 3, 2),
                    ((0, 0),) * 3 + ((0, W_pad - W),))
                mask8 = jnp.pad(
                    adj_mask.astype(jnp.int8),
                    ((0, 0), (0, 0), (0, W_pad - W)))
                g_b = g.reshape(B_, nB, BLK, H_ * C_).transpose(1, 0, 2, 3)
                d_adst, d_asrc, dx = call_bwd(
                    adst_b, asrcT,
                    x_ext_.reshape(B_, n_ext, H_ * C_), mask8, g_b)
                d_a_dst = d_adst.transpose(1, 0, 2, 3).reshape(B_, nB * BLK, H_)
                d_a_src = d_asrc[:, :, :, :W].transpose(0, 1, 3, 2)
                # bool/int mask primal → float0 cotangent per custom_vjp rules
                import numpy as _np

                dmask = (
                    jnp.zeros_like(adj_mask)
                    if jnp.issubdtype(adj_mask.dtype, jnp.floating)
                    else _np.zeros(adj_mask.shape, jax.dtypes.float0)
                )
                return (d_a_dst, d_a_src, dx.reshape(B_, n_ext, H_, C_), dmask)

            core.defvjp(fwd_fn, bwd_fn)
            cores[mx] = core
        return cores[mx](a_dst, a_src_win, x_ext, adj_mask)

    return attend
