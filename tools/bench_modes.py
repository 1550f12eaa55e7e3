"""Sweep aggregation modes on the headline bench config (GATRes-small,
synthctown, batch 32): dense n² vs banded n_pad·W at several block sizes.

The step is HBM-bound (see BASELINE.md roofline, 97% of the memory roof for
the dense formulation), so a layout with fewer attention-chain bytes moves
the roof itself: synthctown's RCM band gives n_pad·W = 448·256 at BLK 64
vs n² = 388² dense — ~24% fewer logits bytes.

Usage: python tools/bench_modes.py [mode ...]   (default: all)
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_one(mode, band_block=None, iters=20, windows=5, warmup=20):
    import jax
    import jax.numpy as jnp

    from gnn_pressure_estimation_tpu.data.dataset import build_template, get_keep_list
    from gnn_pressure_estimation_tpu.data.inp import parse_inp
    from gnn_pressure_estimation_tpu.models import select_model
    from gnn_pressure_estimation_tpu.train import TrainConfig
    from gnn_pressure_estimation_tpu.train.loop import Trainer
    from gnn_pressure_estimation_tpu.utils.scaling import NormStats

    wn = parse_inp("inputs/synthctown.inp")
    keep = get_keep_list(wn, "keep_junction", None, "pressure")
    tpl, _ = build_template(wn, keep, None, name="ctown")

    batch = 32
    cfg = TrainConfig(batch_size=batch, mask_rate=0.95, criterion="mse",
                      seed=0, agg_mode=mode, band_block=band_block)
    model, preset = select_model("gatres_small")
    stats = NormStats(norm_type="znorm", mean=40.0, std=15.0)
    trainer = Trainer(model, cfg, stats, tpl)

    rng = np.random.default_rng(0)
    snaps = rng.standard_normal((batch, tpl.n_node)).astype(np.float32)
    x = jnp.asarray(snaps.reshape(-1, 1))  # step packs into band space itself
    step = trainer._get_train_step(tpl, batch)

    params, opt_state = trainer.params, trainer.opt_state
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for i in range(warmup):
        params, opt_state, loss, _ = step(params, opt_state, x, x, key)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0

    best_dt = math.inf
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state, loss, _ = step(
                params, opt_state, x, x, jax.random.fold_in(key, w * iters + i)
            )
        jax.block_until_ready(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)

    e, n = tpl.n_edge, tpl.n_node
    edges_per_step = batch * 15 * (2 * (e + n) + e)
    eps = edges_per_step * iters / best_dt
    ms = best_dt / iters * 1e3
    tag = mode if band_block is None else f"{mode}(BLK{band_block})"
    print(f"{tag:16s} step {ms:7.3f} ms  {eps/1e6:7.1f}M edges/s  "
          f"loss {float(loss):.4f}  (warmup+compile {compile_s:.0f}s)",
          flush=True)
    return ms, eps


if __name__ == "__main__":
    want = sys.argv[1:] or ["dense", "banded64", "banded128"]
    for w in want:
        if w == "dense":
            bench_one("dense")
        elif w.startswith("banded"):
            bench_one("banded", band_block=int(w[len("banded"):] or 256))
        else:
            raise SystemExit(f"unknown mode {w}")
