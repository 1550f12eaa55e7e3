"""Dump the compiled train step's largest HBM buffers / fusions.

Evidence tool for kernel decisions: compiles the flagship train step for the
current default backend and prints (a) the buffer-assignment peak and largest
allocations if available, (b) the biggest fusion outputs by byte size from
the optimized HLO text — i.e. what actually round-trips HBM, as opposed to
XLA's over-counting cost analysis (see BASELINE.md roofline notes).

Usage: python tools/hlo_traffic.py [--model gatres_small] [--batch 32]
       [--attn-impl factored] [--gate-dtype bfloat16] [--top 30]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gatres_small")
    ap.add_argument("--batch", default=32, type=int)
    ap.add_argument("--attn-impl", default=None,
                    choices=[None, "softmax", "onepass", "factored"])
    ap.add_argument("--gate-dtype", default=None,
                    choices=[None, "float32", "bfloat16"])
    ap.add_argument("--top", default=30, type=int)
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
    tpl, _ = build_template(wn, keep, None, name="hlo")

    from gnn_pressure_estimation_tpu.models.presets import apply_model_knobs

    model, _ = select_model(args.model)
    model = apply_model_knobs(model, attn_impl=args.attn_impl,
                              gate_dtype=args.gate_dtype)
    cfg = TrainConfig(batch_size=args.batch, mask_rate=0.95, criterion="mse",
                      seed=0)
    trainer = Trainer(model, cfg, NormStats(norm_type="znorm", mean=40.0, std=15.0), tpl)

    bs = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs * tpl.n_node, 1)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    import jax as _jax
    step = _jax.jit(trainer._train_step_core(tpl, bs))  # noqa: SLF001 (diagnostic)
    lowered = step.lower(trainer.params, trainer.opt_state, x, x, key)
    compiled = lowered.compile()

    try:
        ma = compiled.memory_analysis()
        print(f"# memory_analysis: temp={ma.temp_size_in_bytes/1e6:.1f} MB "
              f"argument={ma.argument_size_in_bytes/1e6:.1f} MB "
              f"output={ma.output_size_in_bytes/1e6:.1f} MB")
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"# memory_analysis unavailable: {e}")

    txt = compiled.as_text()

    def nbytes(shape: str) -> int:
        m = re.match(r"(\w+)\[([\d,]*)\]", shape)
        if not m:
            return 0
        dt, dims = m.groups()
        isize = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                 "s8": 1, "u8": 1, "f16": 2, "s64": 8, "u64": 8}.get(dt, 4)
        total = isize
        for d in dims.split(","):
            if d:
                total *= int(d)
        return total

    # fusion roots: 'SHAPE fusion(' or tuple roots '(SHAPE, SHAPE) fusion('
    rows = []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (\([^)]*\)|\S+) fusion\(", ls)
        if not m:
            continue
        shape = m.group(1)
        shapes = (re.findall(r"\w+\[[\d,]*\]", shape)
                  if shape.startswith("(") else [shape])
        b = sum(nbytes(s) for s in shapes)
        kind = "loop"
        km = re.search(r'kind=k(\w+)', ls)
        if km:
            kind = km.group(1)
        rows.append((b, kind, shape[:90], ls[: ls.index(" = ")]))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"# {len(rows)} fusion outputs, total {total/1e9:.3f} GB written")
    print(f"# top {args.top} by output bytes:")
    for b, kind, shape, name in rows[: args.top]:
        print(f"{b/1e6:10.2f} MB  {kind:<8} {shape:<92} {name[:60]}")


if __name__ == "__main__":
    main()
