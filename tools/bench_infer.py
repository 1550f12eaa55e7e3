"""Serving-latency bench: ms/snapshot + snapshots/s per model preset.

Mirrors the reference's inference-measurement protocol — warm-up calls,
then timed forward passes (`/root/reference/gnn_pressure_estimation/utils/timer.py:22-66`
uses CUDA events after 10 warm-ups; here `block_until_ready` windows via
the same evaluation/timer.py machinery the Evaluator reports as
``test_time``/``test_throughput``).

    python tools/bench_infer.py [--net inputs/synthctown.inp]
        [--models gatres_small gatres_large] [--batch 1 32]

Latency rows use an untrained parameter pytree (timing is weight-value-
independent); quality numbers live in BASELINE.md's evaluation tables.
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
from gnn_pressure_estimation_tpu.models import select_model


def bench_forward(model, tpl, batch, agg_mode=None, band_block=None,
                  warmup=10, iters=20, windows=5):
    g = tpl.batch(batch, mode=agg_mode, band_block=band_block)
    n_in = g.n_node  # covers banded n_pad
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch * g.nodes_per_graph, 1))
        .astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((n_in, 1)), g)
    fwd = jax.jit(lambda p, xx: model.apply(p, xx, g))
    out = None
    for _ in range(warmup):
        out = fwd(params, x)
    jax.block_until_ready(out)
    best = math.inf
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, x)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="inputs/synthctown.inp")
    ap.add_argument("--models", nargs="+",
                    default=["gatres_small", "gatres_large"])
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 32])
    ap.add_argument("--agg_mode", default=None)
    ap.add_argument("--band_block", type=int, default=None)
    args = ap.parse_args()

    wn = parse_inp(args.net)
    keep = get_keep_list(wn, "keep_junction", None, "pressure")
    tpl, _ = build_template(wn, keep, None, name=os.path.basename(args.net))
    print(f"{args.net}: n={tpl.n_node} e={tpl.n_edge} "
          f"backend={jax.devices()[0].platform}", flush=True)
    print(f"{'model':16s} {'batch':>5s} {'ms/call':>9s} {'ms/snapshot':>12s} "
          f"{'snapshots/s':>12s}")
    for name in args.models:
        model, _preset = select_model(name)
        for b in args.batch:
            dt = bench_forward(model, tpl, b, args.agg_mode, args.band_block)
            print(f"{name:16s} {b:5d} {dt*1e3:9.3f} {dt*1e3/b:12.4f} "
                  f"{b/dt:12.1f}", flush=True)


if __name__ == "__main__":
    main()
