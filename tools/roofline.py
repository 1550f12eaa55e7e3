"""Speed-of-light / roofline accounting for the training step.

BASELINE.json asks for "SpMM/SDDMM speed-of-light per chip".  This tool
compiles the flagship train step, pulls XLA's own cost analysis (FLOPs and
HBM bytes accessed) from the compiled executable, measures the real step
time, and reports where the step sits against the chip's two rooflines:

    t_mem  = bytes_accessed / HBM_BW_peak
    t_comp = flops / FLOPs_peak
    SoL%   = max(t_mem, t_comp) / t_measured

TPU v5e (one chip): 197 TFLOP/s bf16 MXU peak (f32 "highest" runs 3-6
passes), 819 GB/s HBM.  Numbers from the public v5e spec; override with
--peak-flops / --peak-bw for other chips.

Usage:  python tools/roofline.py [--model gatres_small] [--batch 32]
        [--dtype bfloat16] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gatres_small")
    ap.add_argument("--batch", default=32, type=int)
    ap.add_argument("--dtype", default=None, choices=[None, "bfloat16"])
    ap.add_argument("--attn-dtype", default=None, choices=[None, "bfloat16"],
                    help="storage dtype for the [B,n,n,H] attention tensors")
    ap.add_argument("--attn-impl", default=None,
                    choices=[None, "softmax", "onepass", "factored"],
                    help="dense-path attention implementation override "
                         "(None keeps the model preset; explicit 'softmax' "
                         "forces it even when the preset is factored)")
    ap.add_argument("--gate-dtype", default=None,
                    choices=[None, "float32", "bfloat16"],
                    help="storage dtype of the factored path's 0/1 gate "
                         "matrix (model default: bfloat16, lossless)")
    ap.add_argument("--agg-mode", default=None, choices=[None, "dense", "banded", "padded"],
                    help="aggregation mode (default: template-size heuristic)")
    ap.add_argument("--band-block", default=None, type=int,
                    help="banded block size (with --agg-mode banded)")
    ap.add_argument("--iters", default=20, type=int)
    ap.add_argument("--windows", default=5, type=int)
    ap.add_argument("--peak-flops", default=197e12, type=float,
                    help="chip peak FLOP/s (v5e bf16 MXU)")
    ap.add_argument("--peak-bw", default=819e9, type=float,
                    help="chip peak HBM bytes/s (v5e)")
    ap.add_argument("--inp", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gnn_pressure_estimation_tpu.data.dataset import build_template, get_keep_list
    from gnn_pressure_estimation_tpu.data.inp import parse_inp
    from gnn_pressure_estimation_tpu.models import select_model
    from gnn_pressure_estimation_tpu.train import TrainConfig
    from gnn_pressure_estimation_tpu.train.loop import Trainer
    from gnn_pressure_estimation_tpu.utils.scaling import NormStats

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp = args.inp or os.path.join(repo, "inputs", "synthctown.inp")
    wn = parse_inp(inp)
    keep = get_keep_list(wn, "keep_junction", None, "pressure")
    tpl, _ = build_template(wn, keep, None, name="roofline")

    from gnn_pressure_estimation_tpu.models.presets import apply_model_knobs

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    model, _ = select_model(args.model, dtype=dtype)
    model = apply_model_knobs(
        model,
        attn_impl=args.attn_impl,
        gate_dtype=args.gate_dtype, attn_dtype=args.attn_dtype,
    )
    cfg = TrainConfig(batch_size=args.batch, mask_rate=0.95, criterion="mse",
                      seed=0, agg_mode=args.agg_mode, band_block=args.band_block)
    trainer = Trainer(model, cfg, NormStats(norm_type="znorm", mean=40.0, std=15.0), tpl)

    bs = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs * tpl.n_node, 1)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    core = trainer._train_step_core(tpl, bs)
    step = jax.jit(core, donate_argnums=())

    lowered = step.lower(trainer.params, trainer.opt_state, x, x, key)
    compiled = lowered.compile()
    ca_list = compiled.cost_analysis()
    ca = ca_list[0] if isinstance(ca_list, (list, tuple)) else ca_list
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    params, opt_state = trainer.params, trainer.opt_state
    for i in range(15):
        params, opt_state, loss, _ = step(params, opt_state, x, x, key)
    jax.block_until_ready(loss)
    best = float("inf")
    for w in range(args.windows):
        t0 = time.perf_counter()
        for i in range(args.iters):
            params, opt_state, loss, _ = step(
                params, opt_state, x, x, jax.random.fold_in(key, i)
            )
        jax.block_until_ready(loss)
        best = min(best, (time.perf_counter() - t0) / args.iters)

    t_mem = bytes_acc / args.peak_bw
    t_comp = flops / args.peak_flops
    floor = max(t_mem, t_comp)
    bound = "memory" if t_mem >= t_comp else "compute"
    report = {
        "model": args.model,
        "variant": (args.attn_impl or "preset")
        + ("+attn_bf16" if args.attn_dtype else "")
        + (f"+gate_{args.gate_dtype}" if args.gate_dtype else ""),
        "batch": bs,
        "n_node": tpl.n_node,
        "n_edge": tpl.n_edge,
        "dtype": args.dtype or "float32",
        "platform": jax.devices()[0].platform,
        "xla_flops_per_step": flops,
        "xla_hbm_bytes_per_step": bytes_acc,
        "measured_ms": round(best * 1e3, 3),
        "roofline_mem_ms": round(t_mem * 1e3, 3),
        "roofline_compute_ms": round(t_comp * 1e3, 3),
        "bound": bound,
        "speed_of_light_frac": round(floor / best, 3),
        "achieved_hbm_gbps": round(bytes_acc / best / 1e9, 1),
        "achieved_tflops": round(flops / best / 1e12, 2),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
