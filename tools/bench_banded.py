"""Banded-path (large-graph) train-step bench: block sizes and attention impls.

Reproduces the BASELINE.md "Large-graph (banded) configs" and
banded-factored-rejection rows on the bigtown network (5,800 junctions).
Run from the repo root on the TPU host:

    python tools/bench_banded.py [--net inputs/bigtown.inp] [--blk 128 256]

Measures the full jitted train step (fwd+bwd+Adam) per (preset, batch,
BLK, attn_impl) and prints ms/step + edges/s, best-of-windows timing.
(cf. reference bench protocol: evaluation.py's CUDA-event timer; here
block_until_ready windows — see evaluation/timer.py.)
"""
from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import numpy as np
import jax
import jax.numpy as jnp

from gnn_pressure_estimation_tpu.data.dataset import build_template, get_keep_list
from gnn_pressure_estimation_tpu.data.inp import parse_inp
from gnn_pressure_estimation_tpu.models.gatres import GATRes
from gnn_pressure_estimation_tpu.train import TrainConfig
from gnn_pressure_estimation_tpu.train.loop import Trainer
from gnn_pressure_estimation_tpu.utils.scaling import NormStats


def bench(tpl, model, batch, blk, iters=10, windows=4, warmup=8):
    cfg = TrainConfig(batch_size=batch, mask_rate=0.95, criterion="mse", seed=0,
                      agg_mode="banded", band_block=blk)
    tr = Trainer(model, cfg, NormStats(norm_type="znorm", mean=40.0, std=15.0), tpl)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch * tpl.n_node, 1)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    step = tr._get_train_step(tpl, batch)
    p, o = tr.params, tr.opt_state
    for _ in range(warmup):
        p, o, loss, _ = step(p, o, x, x, key)
    jax.block_until_ready(loss)
    best = math.inf
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            p, o, loss, _ = step(p, o, x, x, jax.random.fold_in(key, w * iters + i))
        jax.block_until_ready(loss)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, float(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="inputs/bigtown.inp")
    ap.add_argument("--blk", type=int, nargs="+", default=[128])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--preset", default="both", choices=["small", "large", "both"])
    ap.add_argument("--impl", nargs="+", default=None,
                    help="attention impls to sweep (default: preset-specific)")
    ap.add_argument("--acc", type=int, nargs="+", default=[None],
                    help="GNN_TPU_BAND_ACC values to sweep: 0 = v2 windowed-dx "
                         "backward, 1 = v3 sliding-accumulator backward")
    ap.add_argument("--batch_small", type=int, default=8,
                    help="batch for the small preset (drop below 8 on "
                         ">10k-node networks: the XLA band path materializes "
                         "[nB,B,BLK,W,H] logits)")
    ap.add_argument("--batch_large", type=int, default=4)
    args = ap.parse_args()

    wn = parse_inp(args.net)
    keep = get_keep_list(wn, "keep_junction", None, "pressure")
    tpl, _ = build_template(wn, keep, None, name=os.path.basename(args.net))
    print(f"{args.net}: n={tpl.n_node} e={tpl.n_edge}", flush=True)

    def run(tag, model, batch, blk, n_blocks, **kw):
        dt, loss = bench(tpl, model, batch, blk, **kw)
        eps = batch * n_blocks * (2 * (tpl.n_edge + tpl.n_node) + tpl.n_edge) / dt
        print(f"{tag:32s} BLK={blk}: {dt*1e3:6.1f} ms  "
              f"{eps/1e6:6.1f}M edges/s  loss={loss:.4f}", flush=True)

    for acc in args.acc:
        acc_tag = ""
        if acc is not None:
            os.environ["GNN_TPU_BAND_ACC"] = str(acc)
            acc_tag = f"-v{2 + acc}"
        for blk in args.blk:
            bs, bl = args.batch_small, args.batch_large
            if args.preset in ("small", "both"):
                for impl in args.impl or ("softmax", "band_factored"):
                    run(f"small-b{bs}-{impl}{acc_tag}",
                        GATRes(num_blocks=15, channels=32, attn_impl=impl),
                        bs, blk, 15, iters=args.iters)
                if not args.impl:
                    run(f"small-b{bs}-band_factored-bf16{acc_tag}",
                        GATRes(num_blocks=15, channels=32,
                               attn_impl="band_factored",
                               attn_dtype=jnp.bfloat16), bs, blk, 15,
                        iters=args.iters)
            if args.preset in ("large", "both"):
                for impl in args.impl or ("softmax", "band_factored"):
                    run(f"large-b{bl}-{impl}{acc_tag}",
                        GATRes(num_blocks=25, channels=128, attn_impl=impl),
                        bl, blk, 25, iters=max(args.iters // 2, 3))


if __name__ == "__main__":
    main()
