"""Dataset-generation driver: token sampling → parallel solve → zarr-zip.

Capability parity with reference scenegenv7.py's main flow (:338-726):

- 10× scenario oversampling so rejections still reach ``num_scenarios``
  accepted scenes (:355)
- host process-pool execution with per-batch fault tolerance (failed batches
  dropped, generation continues — replaces the Ray actor pool + RayError
  handling, :567-628)
- zarr output layout identical to the reference: per-attribute groups with
  ``train/valid/test`` arrays, per-attribute train-split stats attrs
  (min/max/mean/std/mcoef/bcoef/cv), root attrs ``config``/``args``/
  ``ordered_names_by_attr`` (:643-726), final zip at ``<storage_dir>.zip``
  — and, unlike the reference, the directory store actually lands in
  ``storage_dir`` instead of a hardcoded ``"test"`` dir (SURVEY §2 quirk).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import shutil
import time
from typing import Optional

import numpy as np

from gnn_pressure_estimation_tpu.data.inp import parse_inp
from gnn_pressure_estimation_tpu.data.zarrzip import ZarrZipWriter, zip_directory_store
from gnn_pressure_estimation_tpu.simgen.config import GenOptions, read_config
from gnn_pressure_estimation_tpu.simgen.executor import ScenarioExecutor
from gnn_pressure_estimation_tpu.simgen.tokens import build_feature_specs, sample_params

_WORKER: dict = {}


def _worker_init(inp_text: str, cfg_path: str, opts: GenOptions):
    """Per-process executor construction (reference WDNRayExecutor.__init__
    loads the INP once per actor, Executorv7.py:86-134)."""
    wn = parse_inp(inp_text)
    cfg = read_config(cfg_path)
    specs = build_feature_specs(wn, cfg, opts)
    _WORKER["executor"] = ScenarioExecutor(wn, specs, cfg, opts)
    _WORKER["specs"] = specs


def _worker_run(args):
    batch_seed, chunk_size = args
    ex: ScenarioExecutor = _WORKER["executor"]
    rng = np.random.default_rng(batch_seed)
    params = sample_params(_WORKER["specs"], chunk_size, rng)
    return ex.simulate(params)


def generate(
    config_path: str,
    opts: Optional[GenOptions] = None,
    log_fn=print,
) -> str:
    """Run the full generation; returns the path of the output zip."""
    opts = opts or GenOptions(config=config_path)
    cfg = read_config(config_path)
    wn_inp_path = cfg.get("general", "wn_inp_path")
    storage_dir = cfg.get("general", "storage_dir")
    num_scenarios = cfg.getint("general", "num_scenarios")

    with open(wn_inp_path) as f:
        inp_text = f.read()
    wn = parse_inp(inp_text)
    specs = build_feature_specs(wn, cfg, opts)
    if not specs:
        raise ValueError("no gen_* flags enabled — nothing to randomize")

    backup = num_scenarios * opts.oversample_factor
    batch_size = opts.batch_size
    num_batches = max(backup // batch_size, 1)
    attrs = opts.attributes()

    t0 = time.time()
    log_fn(
        f"generate: {num_scenarios} scenarios (oversampled {backup}) on "
        f"{opts.executors} workers, batch {batch_size}, attrs {attrs}"
    )

    collected: dict[str, list[np.ndarray]] = {a: [] for a in attrs}
    ordered_names: dict[str, list[str]] = {}
    success = 0
    batches_done = 0

    seeds = [opts.seed * 1_000_003 + b for b in range(num_batches)]
    work = [(s, batch_size) for s in seeds]

    def consume(result):
        nonlocal success, batches_done
        batch, names = result
        batches_done += 1
        if not batch:
            return
        got = min(v.shape[0] for v in batch.values())
        take = min(got, num_scenarios - success)
        if take <= 0:
            return
        for key, value in batch.items():
            collected[key].append(value[:take])
            if key not in ordered_names:
                ordered_names[key] = names[key]
        success += take

    if opts.executors <= 1:
        _worker_init(inp_text, config_path, opts)
        for w in work:
            if success >= num_scenarios:
                break
            try:
                consume(_worker_run(w))
            except Exception as e:  # per-batch fault tolerance
                log_fn(f"WARNING! batch failed: {e}")
    else:
        with cf.ProcessPoolExecutor(
            max_workers=opts.executors,
            initializer=_worker_init,
            initargs=(inp_text, config_path, opts),
        ) as pool:
            pending = {pool.submit(_worker_run, w) for w in work}
            for fut in cf.as_completed(pending):
                if success >= num_scenarios:
                    for p in pending:
                        p.cancel()
                    break
                try:
                    consume(fut.result())
                except Exception as e:
                    log_fn(f"WARNING! batch failed: {e}")

    elapsed = time.time() - t0
    log_fn(f"Simulation time: {elapsed:.1f} s; Success/Expected: {success}/{num_scenarios}")
    if success == 0:
        raise RuntimeError("no scenario survived the plausibility filters")

    # ---- assemble splits + stats + zip ---------------------------------
    os.makedirs(storage_dir, exist_ok=True)
    shutil.rmtree(storage_dir, ignore_errors=True)

    train_ratio, valid_ratio = opts.train_ratio, opts.valid_ratio
    train_idx = int(success * train_ratio)
    valid_idx = train_idx + int(success * valid_ratio)

    config_dict = {sect: dict(cfg.items(sect)) for sect in cfg.sections()}
    with ZarrZipWriter(storage_dir) as w:  # directory store
        w.set_attrs("", {
            "config": config_dict,
            "args": {k: v for k, v in opts.to_dict().items()},
            "ordered_names_by_attr": ordered_names,
        })
        for key in attrs:
            if not collected[key]:
                continue
            a = np.concatenate(collected[key], axis=0)[:success]
            train_a, valid_a, test_a = a[:train_idx], a[train_idx:valid_idx], a[valid_idx:]
            w.create_group(key)
            df = train_a.astype(float)
            with np.errstate(invalid="ignore", divide="ignore"):
                feat_coef = float(np.nanmean(np.corrcoef(df.T))) if df.shape[0] > 1 else 1.0
                batch_coef = float(np.nanmean(np.corrcoef(df))) if df.shape[0] > 1 else 1.0
                cv = float(np.mean(df.var(axis=-1) / df.mean(axis=-1)))
            w.set_attrs(key, {
                "min": float(train_a.min()),
                "max": float(train_a.max()),
                "mean": float(train_a.mean()),
                "std": float(train_a.std()),
                "mcoef": feat_coef,
                "bcoef": batch_coef,
                "cv": cv,
            })
            chunk = (max(batch_size, 1), a.shape[-1])
            w.write_array(f"{key}/train", train_a, chunks=chunk)
            w.write_array(f"{key}/valid", valid_a, chunks=chunk)
            w.write_array(f"{key}/test", test_a, chunks=chunk)

    zip_path = storage_dir.rstrip("/\\") + ".zip"
    zip_directory_store(storage_dir, zip_path)
    log_fn(f"Execution time: {time.time() - t0:.1f} s → {zip_path}")
    return zip_path
