"""Speed-of-light accounting for the banded *flash* kernel path (VERDICT r4
weak #2: the 23k-node config had perf numbers but no statement of how much
headroom remains).

XLA's ``cost_analysis`` cannot see inside Pallas custom calls, so this tool
does the accounting from first principles: for each kernel op the banded
GATRes step uses — band attention (H·C = 256 and 128 for GATRes-large's
GAT1/GAT2) and band SpMM (C = 128, the mean conv) — it

1. computes the op's analytic HBM-traffic floor from the band layout
   (every byte the grid *must* move: chunked x DMA re-reads at the
   W_pad/BLK overlap factor, int8 mask re-reads, outputs, and the
   backward's windowed-dx fold), and its MXU-FLOP floor;
2. measures the op's real fwd and fwd+bwd time at exactly the layout's
   shapes (same factories the model routes through, ``core/graph.py``);
3. reports per-op SoL% and a whole-step estimate (ops × layers) against
   the measured full train step, so the residual (XLA-side projections,
   residuals, optimizer) is visible too.

v5e peaks: 197 TFLOP/s bf16 MXU (f32 ~1/4), 819 GB/s HBM.

Usage:
  python tools/roofline_flash.py --junctions 23000 --blk 512 --batch 2
  python tools/roofline_flash.py --inp inputs/bigtown.inp --blk 256 --batch 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, iters=10, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def attn_floors(nB, BLK, W, B, H, C, peak_bw, peak_flops):
    """Analytic floors for make_band_attention_flash at this layout."""
    from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
        flash_chunk_widths,
    )

    W_CH_F, W_CH_B, W_pad = flash_chunk_widths(W, BLK)
    HC = H * C
    cells_f = nB * B * (W_pad // W_CH_F)
    cells_b = nB * B * (W_pad // W_CH_B)
    # fwd: x chunk DMA re-reads at the W_pad/BLK overlap factor; int8 mask;
    # small adst/asrc; o/m/z outputs
    fwd_bytes = (
        nB * B * W_pad * HC * 4          # x chunks
        + nB * B * BLK * W_pad           # int8 mask
        + nB * B * (H * W_pad + BLK * H) * 4   # asrc + adst
        + nB * B * BLK * (HC + 2 * H) * 4      # o, m, z
    )
    fwd_flops = 2 * nB * B * W_pad * BLK * HC  # attn @ x_win
    # bwd kernel: same x/mask traffic, dO/m/z/delta fetched once per (i,b)
    # (their block index is w-invariant), dxw + dasrc outputs
    bwd_bytes = (
        nB * B * W_pad * HC * 4
        + nB * B * BLK * W_pad
        + nB * B * (H * W_pad + BLK * H * 4) * 4
        + nB * B * BLK * HC * 4          # dO
        + nB * B * W_pad * HC * 4        # dxw out
        + nB * B * H * W_pad * 4         # dasrc out
    )
    bwd_flops = 2 * 2 * nB * B * W_pad * BLK * HC  # p^T@dO and dO@x^T
    # the XLA-side overlap-add fold reads dxw once more and writes dx
    fold_bytes = 2 * nB * B * W_pad * HC * 4
    mk = lambda by, fl: {
        "bytes": by, "flops": fl,
        "t_mem_ms": by / peak_bw * 1e3,
        "t_mxu_ms": fl / peak_flops * 1e3,
    }
    return {
        "W_CH_F": W_CH_F, "W_CH_B": W_CH_B, "W_pad": W_pad,
        "cells_fwd": cells_f, "cells_bwd": cells_b,
        "fwd": mk(fwd_bytes, fwd_flops),
        "bwd+fold": mk(bwd_bytes + fold_bytes, bwd_flops),
        "exp_ops_fwd": nB * B * H * BLK * W_pad,
    }


def spmm_floors(nB, BLK, W, B, C, peak_bw, peak_flops):
    from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
        _chunk_width, _round_up,
    )

    W_CH = _chunk_width(W, BLK)
    W_pad = _round_up(W, W_CH)
    fwd_bytes = (
        nB * B * W_pad * C * 4           # x chunks
        + nB * B * BLK * W_pad * 4       # f32 band weights (re-read per b)
        + nB * B * BLK * C * 4           # out
    )
    fwd_flops = 2 * nB * B * W_pad * BLK * C
    bwd_bytes = (
        nB * B * BLK * W_pad * 4 + nB * B * BLK * C * 4
        + nB * B * W_pad * C * 4         # dxw out
        + 2 * nB * B * W_pad * C * 4     # fold
    )
    bwd_flops = 2 * nB * B * W_pad * BLK * C
    mk = lambda by, fl: {
        "bytes": by, "flops": fl,
        "t_mem_ms": by / peak_bw * 1e3,
        "t_mxu_ms": fl / peak_flops * 1e3,
    }
    return {"W_CH": W_CH, "W_pad": W_pad,
            "fwd": mk(fwd_bytes, fwd_flops),
            "bwd+fold": mk(bwd_bytes, bwd_flops)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inp", default=None)
    ap.add_argument("--junctions", default=23000, type=int,
                    help="netgen meganet-style size when no --inp")
    ap.add_argument("--blk", default=512, type=int)
    ap.add_argument("--batch", default=2, type=int)
    ap.add_argument("--blocks", default=25, type=int,
                    help="GATRes blocks (large preset: 25)")
    ap.add_argument("--channels", default=128, type=int)
    ap.add_argument("--peak-flops", default=197e12 / 4, type=float,
                    help="f32 MXU peak (kernels run exact f32 matmuls)")
    ap.add_argument("--peak-bw", default=819e9, type=float)
    ap.add_argument("--full-step", action="store_true",
                    help="also compile+time the full train step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gnn_pressure_estimation_tpu.data.dataset import build_template, get_keep_list
    from gnn_pressure_estimation_tpu.ops.banded import halo_widths
    from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
        make_band_attention_flash, make_band_spmm_flash,
    )

    if args.inp:
        from gnn_pressure_estimation_tpu.data.inp import parse_inp

        wn = parse_inp(args.inp)
    else:
        from gnn_pressure_estimation_tpu.simgen.netgen import make_mega

        wn = make_mega(args.junctions)
    keep = get_keep_list(wn, "keep_junction", None, "pressure")
    tpl, _ = build_template(wn, keep, None, name="flash_roofline")
    bl = tpl.band_layout(args.blk)
    nB, BLK, W = bl.adj_mask.shape
    U, _ = halo_widths(bl.win_start, bl.W, bl.n_pad)
    B, nc = args.batch, args.channels
    n_ext = nB * BLK + (W - BLK)
    rng = np.random.default_rng(0)
    report = {
        "n_node": tpl.n_node, "n_edge": tpl.n_edge, "nB": nB, "BLK": BLK,
        "W": W, "batch": B, "platform": jax.devices()[0].platform,
    }

    adj = jnp.asarray(bl.adj_mask)
    results = {}
    # the two attention widths GATRes-large routes through the kernel
    for tag, H, C in (("attn_HC256", 2, nc), ("attn_HC128", 1, nc)):
        att = make_band_attention_flash(nB, BLK, W, U, 0.2)
        a_dst = jnp.asarray(rng.standard_normal((B, bl.n_pad, H)), jnp.float32)
        a_src = jnp.asarray(rng.standard_normal((nB, B, W, H)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((B, n_ext, H, C)), jnp.float32)

        fwd = jax.jit(lambda ad, asr, xx: att(ad, asr, xx, adj))
        t_f = _time(fwd, a_dst, a_src, x)

        gr = jax.jit(jax.grad(
            lambda ad, asr, xx: att(ad, asr, xx, adj).sum(), argnums=(0, 1, 2)
        ))
        t_fb = _time(gr, a_dst, a_src, x)

        fl = attn_floors(nB, BLK, W, B, H, C, args.peak_bw, args.peak_flops)
        floor_f = max(fl["fwd"]["t_mem_ms"], fl["fwd"]["t_mxu_ms"])
        floor_fb = floor_f + max(fl["bwd+fold"]["t_mem_ms"],
                                 fl["bwd+fold"]["t_mxu_ms"])
        results[tag] = {
            "H": H, "C": C, **{k: fl[k] for k in
                               ("W_CH_F", "W_CH_B", "W_pad", "cells_fwd",
                                "cells_bwd")},
            "fwd_ms": round(t_f * 1e3, 3),
            "fwd_floor_ms": round(floor_f, 3),
            "fwd_sol": round(floor_f / (t_f * 1e3), 3),
            "fwdbwd_ms": round(t_fb * 1e3, 3),
            "fwdbwd_floor_ms": round(floor_fb, 3),
            "fwdbwd_sol": round(floor_fb / (t_fb * 1e3), 3),
        }

    spmm = make_band_spmm_flash(nB, BLK, W, U)
    band = jnp.asarray(bl.mean_band)
    xs = jnp.asarray(rng.standard_normal((B, n_ext, nc)), jnp.float32)
    fwd_s = jax.jit(lambda xx: spmm(band, xx))
    t_sf = _time(fwd_s, xs)
    gr_s = jax.jit(jax.grad(lambda xx: spmm(band, xx).sum()))
    t_sfb = _time(gr_s, xs)
    fls = spmm_floors(nB, BLK, W, B, nc, args.peak_bw, args.peak_flops)
    floor_sf = max(fls["fwd"]["t_mem_ms"], fls["fwd"]["t_mxu_ms"])
    floor_sfb = floor_sf + max(fls["bwd+fold"]["t_mem_ms"],
                               fls["bwd+fold"]["t_mxu_ms"])
    results["spmm_C128"] = {
        "C": nc, "W_pad": fls["W_pad"], "W_CH": fls["W_CH"],
        "fwd_ms": round(t_sf * 1e3, 3),
        "fwd_floor_ms": round(floor_sf, 3),
        "fwd_sol": round(floor_sf / (t_sf * 1e3), 3),
        "fwdbwd_ms": round(t_sfb * 1e3, 3),
        "fwdbwd_floor_ms": round(floor_sfb, 3),
        "fwdbwd_sol": round(floor_sfb / (t_sfb * 1e3), 3),
    }

    # whole-step estimate: per GATRes block 1×HC256-attn + 1×HC128-attn +
    # 1×SpMM, all fwd+bwd, times args.blocks
    per_block = (results["attn_HC256"]["fwdbwd_ms"]
                 + results["attn_HC128"]["fwdbwd_ms"]
                 + results["spmm_C128"]["fwdbwd_ms"])
    per_block_floor = (results["attn_HC256"]["fwdbwd_floor_ms"]
                       + results["attn_HC128"]["fwdbwd_floor_ms"]
                       + results["spmm_C128"]["fwdbwd_floor_ms"])
    report["ops"] = results
    report["kernels_step_estimate_ms"] = round(per_block * args.blocks, 1)
    report["kernels_step_floor_ms"] = round(per_block_floor * args.blocks, 1)
    report["kernels_sol"] = round(per_block_floor / per_block, 3)

    if args.full_step:
        from gnn_pressure_estimation_tpu.models import select_model
        from gnn_pressure_estimation_tpu.train import TrainConfig
        from gnn_pressure_estimation_tpu.train.loop import Trainer
        from gnn_pressure_estimation_tpu.utils.scaling import NormStats

        model, _ = select_model("gatres_large")
        cfg = TrainConfig(batch_size=B, mask_rate=0.95, criterion="mse",
                          seed=0, agg_mode="banded", band_block=args.blk)
        tr = Trainer(model, cfg, NormStats(norm_type="znorm", mean=40.0,
                                           std=15.0), tpl)
        xfull = jnp.asarray(rng.standard_normal(
            (B * tpl.n_node, 1)).astype(np.float32))
        step = tr._get_train_step(tpl, B)
        key = jax.random.PRNGKey(0)
        p, o = tr.params, tr.opt_state
        t_step = None
        for _ in range(5):
            p, o, loss, _ = step(p, o, xfull, xfull, key)
        jax.block_until_ready(loss)
        best = float("inf")
        for w in range(3):
            t0 = time.perf_counter()
            for i in range(5):
                p, o, loss, _ = step(p, o, xfull, xfull,
                                     jax.random.fold_in(key, i))
            jax.block_until_ready(loss)
            best = min(best, (time.perf_counter() - t0) / 5)
        report["full_step_ms"] = round(best * 1e3, 1)
        report["xla_residual_ms"] = round(
            best * 1e3 - per_block * args.blocks, 1)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
