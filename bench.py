"""Benchmark: GATRes-small training throughput on the C-Town-scale network.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: directed graph edges processed per second through the full jitted
training step (forward + backward + Adam), batch 32, mask_rate 0.95 — the
BASELINE.json headline ("edges/s/chip on C-Town GATRes-small"). The edge
count is per-layer message edges including self-loops, times the number of
GAT message-passing layers per block (2 GAT + 1 mean conv), times blocks —
i.e. actual aggregation work, not just graph size.

``vs_baseline`` compares against BASELINE.json's ``published.edges_per_s``
(recorded from the first TPU run of this benchmark; 1.0 if absent).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

import numpy as np

# ---------------------------------------------------------------------------
# Relay watchdog (orchestrator mode)
#
# The single TPU chip sits behind a relay that occasionally fails to
# initialize or hangs indefinitely (round-2 post-mortem: bare
# ``jax.devices()`` stalled >120 s and bench.py >560 s with no output).  A
# bare ``import jax``-and-go bench turns every relay blip into a lost perf
# round.  So the default entrypoint is an orchestrator that
#   1. probes backend init in a *subprocess* under a hard timeout, retrying
#      with backoff (a hung probe is killed, not waited on);
#   2. runs the actual benchmark in a watched subprocess, retrying once;
#   3. on unrecoverable failure emits ONE structured JSON line (so the
#      driver records a diagnosable failure, not a raw traceback or hang).
# ``python bench.py --run`` executes the real benchmark in-process.
# ---------------------------------------------------------------------------

PROBE_TIMEOUT_S = 75
PROBE_BACKOFFS_S = (0, 15, 45, 90)  # sleep before each probe attempt
RUN_TIMEOUT_S = 1500  # first compile of the step can take minutes cold
N_RUNS = 3            # fresh-process measurements aggregated into the line
MAX_ATTEMPTS = 5      # total subprocess attempts to collect N_RUNS values


def _probe_backend() -> tuple[bool, str]:
    """Check that the default jax backend initializes, in a killable child."""
    code = "import jax; d = jax.devices(); print(d[0].platform, len(d))"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return False, f"backend probe hung >{PROBE_TIMEOUT_S}s (killed)"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
        return False, f"backend probe rc={r.returncode}: {' '.join(tail)[:300]}"
    return True, r.stdout.strip()


def _emit_failure(reason: str) -> None:
    print(json.dumps({
        "metric": "gatres_small_train_edges_per_s",
        "value": 0.0,
        "unit": "edges/s/chip",
        "vs_baseline": 0.0,
        "error": reason,
    }))


def orchestrate() -> int:
    last = "no probe attempted"
    up = False
    for backoff in PROBE_BACKOFFS_S:
        if backoff:
            print(f"# relay not up ({last}); retrying in {backoff}s",
                  file=sys.stderr)
            time.sleep(backoff)
        up, last = _probe_backend()
        if up:
            print(f"# backend up: {last}", file=sys.stderr)
            break
    if not up:
        _emit_failure(f"TPU relay never initialized: {last}")
        return 1

    # Variance protocol: N_RUNS independent fresh-process measurements.  A
    # single process — even with adaptive best-of-k windows — is hostage to
    # that process's draw of relay/chip state (recorded captures span
    # 375-410M edges/s, ~9%, across rounds on identical code), so the
    # headline line reports the cross-process MEDIAN plus the relative
    # spread (max-min)/median, making round-over-round comparisons
    # interpretable: a regression is real only if it exceeds the spread.
    results = []
    for attempt in range(MAX_ATTEMPTS):
        if len(results) >= N_RUNS:
            break
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run"],
                capture_output=True, text=True, timeout=RUN_TIMEOUT_S,
            )
        except subprocess.TimeoutExpired:
            last = f"bench run hung >{RUN_TIMEOUT_S}s (killed)"
            print(f"# attempt {attempt + 1} failed: {last}", file=sys.stderr)
            continue
        sys.stderr.write(r.stderr or "")
        json_lines = [ln for ln in (r.stdout or "").splitlines()
                      if ln.lstrip().startswith("{")]
        if r.returncode == 0 and json_lines:
            try:
                rec = json.loads(json_lines[-1])
            except json.JSONDecodeError:
                rec = {}
            if rec.get("value"):
                results.append(rec)
                print(f"# run {len(results)}/{N_RUNS}: "
                      f"{rec['value'] / 1e6:.1f}M edges/s", file=sys.stderr)
                continue
        tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
        last = f"bench run rc={r.returncode}: {' '.join(tail)[:300]}"
        print(f"# attempt {attempt + 1} failed: {last}", file=sys.stderr)
    if not results:
        _emit_failure(last)
        return 1

    values = sorted(r["value"] for r in results)
    median = values[len(values) // 2] if len(values) % 2 else (
        0.5 * (values[len(values) // 2 - 1] + values[len(values) // 2]))
    spread = (values[-1] - values[0]) / median if median else 0.0
    baseline = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.json")) as f:
            baseline = json.load(f).get("published", {}).get("edges_per_s")
    except Exception:
        pass
    print(json.dumps({
        "metric": results[0]["metric"],
        "value": round(median, 1),
        "unit": results[0]["unit"],
        "vs_baseline": round(median / baseline, 3) if baseline else 1.0,
        "spread": round(spread, 4),
        "runs": [round(v, 1) for v in values],
    }))
    return 0


def main():
    import jax
    import jax.numpy as jnp

    from gnn_pressure_estimation_tpu.data.dataset import build_template, get_keep_list
    from gnn_pressure_estimation_tpu.data.inp import parse_inp
    from gnn_pressure_estimation_tpu.models import select_model
    from gnn_pressure_estimation_tpu.train import TrainConfig
    from gnn_pressure_estimation_tpu.train.loop import Trainer
    from gnn_pressure_estimation_tpu.utils.scaling import NormStats

    repo = os.path.dirname(os.path.abspath(__file__))
    inp = os.path.join(repo, "inputs", "synthctown.inp")
    if os.path.exists(inp):
        wn = parse_inp(inp)
    else:
        from gnn_pressure_estimation_tpu.simgen.netgen import make_ctown_like

        wn = make_ctown_like()
    keep = get_keep_list(wn, "keep_junction", None, "pressure")
    tpl, _ = build_template(wn, keep, None, name="ctown")

    batch = 32
    cfg = TrainConfig(
        batch_size=batch, mask_rate=0.95, criterion="mse",
        matmul_precision=None, seed=0,
    )
    model, preset = select_model("gatres_small")
    stats = NormStats(norm_type="znorm", mean=40.0, std=15.0)
    trainer = Trainer(model, cfg, stats, tpl)

    rng = np.random.default_rng(0)
    snaps = rng.standard_normal((batch, tpl.n_node)).astype(np.float32)
    x = jnp.asarray(snaps.reshape(-1, 1))
    step = trainer._get_train_step(tpl, batch)

    params, opt_state = trainer.params, trainer.opt_state
    key = jax.random.PRNGKey(0)

    # warmup: compile + reach steady state (clocks, allocator, remote-tunnel
    # dispatch pipeline)
    for i in range(20):
        params, opt_state, loss, _ = step(params, opt_state, x, x, key)
    jax.block_until_ready(loss)

    # Adaptive best-of-k timed windows: a single window is hostage to
    # transient host/device contention (this chip is shared through a
    # relay), and a fresh process pays cold-start effects (compile just
    # happened, device clocks/allocator settling) that can depress several
    # consecutive windows.  Keep sampling until the best window has not
    # improved by >1% for `patience` windows, so a cold first run converges
    # to the same steady-state number as a warm one.
    iters, min_windows, max_windows, patience = 20, 5, 15, 3
    best_dt = math.inf
    stale = 0
    for w in range(max_windows):
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state, loss, _ = step(
                params, opt_state, x, x, jax.random.fold_in(key, w * iters + i)
            )
        jax.block_until_ready(loss)
        dt_w = time.perf_counter() - t0
        if dt_w < best_dt * 0.99:
            best_dt, stale = min(best_dt, dt_w), 0
        else:
            stale += 1
            if w + 1 >= min_windows and stale >= patience:
                break
    dt = best_dt

    # message edges per step: per GATRes block 2 GAT layers run over E+N
    # (self-loops) and 1 mean conv over E; 15 blocks, batch graphs.
    e, n = tpl.n_edge, tpl.n_node
    blocks = 15
    edges_per_step = batch * blocks * (2 * (e + n) + e)
    edges_per_s = edges_per_step * iters / dt

    baseline = None
    try:
        with open(os.path.join(repo, "BASELINE.json")) as f:
            baseline = json.load(f).get("published", {}).get("edges_per_s")
    except Exception:
        pass
    vs = edges_per_s / baseline if baseline else 1.0

    print(json.dumps({
        "metric": "gatres_small_train_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(vs, 3),
    }))
    print(
        f"# {jax.devices()[0].platform} step={dt / iters * 1e3:.2f} ms "
        f"(batch {batch}, {n} nodes, {e} directed edges, loss {float(loss):.4f})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    if "--run" in sys.argv:
        main()
    else:
        sys.exit(orchestrate())
