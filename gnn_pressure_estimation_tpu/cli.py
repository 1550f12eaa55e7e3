"""Command-line interface: generate | train | eval | benchmark | netgen | mkconfig.

Maps the reference's three entry points onto one CLI:
- ``generate`` ← scenegenv7.py (README.md:15)
- ``train``    ← train.py (README.md:24)
- ``eval``     ← evaluation.py (README.md:96-106)
- ``mkconfig`` ← generator/EPYNET/ConfigCreator.py (README.md:60, with the
  CLI actually wired — the reference ignored its own flags)
- ``netgen``   — synthetic WDN INP generator (no reference analog; the
  reference's C-Town INP ships as an unusable git-LFS pointer)
- ``infer``    — serving: reconstruct full pressure fields from sparse
  observations and export npz/csv (no reference analog; evaluation.py
  keeps only aggregate metrics)

Run as ``python -m gnn_pressure_estimation_tpu.cli <command> [flags]``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from datetime import datetime


def _add_train_flags(p: argparse.ArgumentParser):
    """Training flag surface (reference train.py:541-648)."""
    p.add_argument("--model", default="gatres_small",
                   choices=["gatres_small", "gatres_large", "gin", "graphconvwat",
                            "chebnet", "mgcn", "gcn2", "gat"])
    p.add_argument("--lr", default=0.0005, type=float)
    p.add_argument("--weight_decay", default=0.000006, type=float)
    p.add_argument("--epochs", default=500, type=int)
    p.add_argument("--mask_rate", default=0.95, type=float)
    p.add_argument("--dataset_paths", default=["datasets/synthctown.zip"], nargs="*")
    p.add_argument("--input_paths", default=["inputs/synthctown.inp"], nargs="*")
    p.add_argument("--feature", default="pressure", choices=["pressure", "head"])
    p.add_argument("--variant", default=datetime.today().strftime("%Y%m%d_%H%M"))
    p.add_argument("--criterion", default=None, choices=["mse", "mae", "sce", None],
                   help="override the model preset's criterion")
    p.add_argument("--norm_type", default=None, choices=["znorm", "minmax", "unused", None],
                   help="override the model preset's normalization")
    p.add_argument("--num_trains", default=None, type=int)
    p.add_argument("--use_data_edge_attrs", default=None, type=str,
                   help="override the preset's edge attributes: "
                        "'diameter', 'length', 'diameter,length', or 'none' "
                        "(reference train.py:592)")
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--train_val_removal", default="keep_junction",
                   choices=["keep_all", "keep_list", "keep_junction", "reservoir", "tank"])
    p.add_argument("--patience", default=100, type=int)
    p.add_argument("--min_delta", default=1e-4, type=float)
    p.add_argument("--use_gradient_clipping", action="store_true")
    p.add_argument("--percentile", default=10.0, type=float)
    p.add_argument("--scheduler", default=None, choices=["ReduceLROnPlateau", None])
    p.add_argument("--scheduler_patience", default=2, type=int)
    p.add_argument("--save_path", default="experiments_logs/run", type=str)
    p.add_argument("--model_path", default="", type=str,
                   help="checkpoint to resume from")
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--device", default=None, choices=["tpu", "cpu", None],
                   help="cpu forces the CPU backend")
    p.add_argument("--epochs_per_dispatch", default=1, type=int,
                   help=">1 stages the dataset on device and runs that many "
                        "epochs per dispatch (amortizes host round-trips; "
                        "best-checkpoints hold block-end params)")
    p.add_argument("--profile_dir", default=None, type=str,
                   help="capture a jax.profiler device trace of the first "
                        "training epochs into this directory (view with "
                        "TensorBoard / xprof)")
    p.add_argument("--profile_epochs", default=2, type=int)
    p.add_argument("--activation_dtype", default=None,
                   choices=["float32", "bfloat16", None],
                   help="activation precision for models with a dtype knob "
                        "(params/softmax/loss stay f32)")
    p.add_argument("--matmul_precision", default=None,
                   choices=["bfloat16", "tensorfloat32", "highest", None],
                   help="XLA default_matmul_precision inside the train step")
    p.add_argument("--gate_dtype", default=None,
                   choices=["float32", "bfloat16", None],
                   help="storage dtype of the factored-attention 0/1 gate "
                        "matrix (GATRes; default bfloat16 — lossless, halves "
                        "its HBM bytes; float32 restores round-2 behavior)")
    p.add_argument("--attn_impl", default=None,
                   choices=["softmax", "onepass", "factored", None],
                   help="dense-path attention implementation override for "
                        "models with the knob (GATRes preset: factored)")
    p.add_argument("--agg_mode", default=None,
                   choices=["dense", "banded", "padded", None],
                   help="aggregation layout for the batched template "
                        "(None = auto: dense small, banded large)")
    p.add_argument("--band_block", default=None, type=int,
                   help="banded block-row size (default 256)")
    p.add_argument("--mesh", default=None, type=str, metavar="DP,GP",
                   help="train over a data×graph device mesh, e.g. '4,2' "
                        "(whole-graph shards for small templates, banded "
                        "halo-exchange node shards for large ones)")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() first (multi-host "
                        "pod slice; pair with --coordinator on non-TPU envs)")
    p.add_argument("--coordinator", default=None, type=str,
                   help="coordinator address host:port for --distributed")
    p.add_argument("--num_processes", default=None, type=int)
    p.add_argument("--process_id", default=None, type=int)
    p.add_argument("--log_method", default=None, choices=["wandb", None])
    p.add_argument("--log_gradient", action="store_true",
                   help="track total/block gradient norms per epoch")
    p.add_argument("--project_name", default="test_project", type=str)
    p.add_argument("--do_test", action="store_true",
                   help="after training, run the clean multi-trial evaluation "
                        "on the test split (reference train.py:524-530)")


def _edge_attrs(args, preset):
    """Preset edge attributes, overridable from the CLI
    (reference --use_data_edge_attrs, train.py:592)."""
    raw = getattr(args, "use_data_edge_attrs", None)
    if raw is None:
        return preset.edge_attrs
    raw = raw.strip().lower()
    if raw in ("", "none"):
        return None
    attrs = tuple(a.strip() for a in raw.split(",") if a.strip())
    for a in attrs:
        if a not in ("diameter", "length"):
            sys.exit(f"unsupported edge attribute {a!r} (diameter|length)")
    return attrs


def _load_datasets(args, preset):
    from gnn_pressure_estimation_tpu.data import WDNDataset

    norm_type = args.norm_type or preset.norm_type
    edge_attrs = _edge_attrs(args, preset)
    train_ds = WDNDataset(
        args.dataset_paths, args.input_paths, feature=args.feature,
        from_set="train", num_records=args.num_trains,
        removal=args.train_val_removal, edge_attrs=edge_attrs,
        norm_type=norm_type,
    )
    val_ds = WDNDataset(
        args.dataset_paths, args.input_paths, feature=args.feature,
        from_set="valid", removal=args.train_val_removal,
        edge_attrs=edge_attrs, norm_type=norm_type, stats=train_ds.stats,
    )
    return train_ds, val_ds, norm_type


def cmd_train(args):
    if args.device == "cpu":
        import jax

        if args.mesh:
            # enough virtual CPU devices for the mesh (effective only if the
            # CPU backend has not initialized yet)
            need = 1
            for v in args.mesh.split(","):
                need *= int(v)
            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={need}"
                )
        jax.config.update("jax_platforms", "cpu")
    if args.distributed:
        from gnn_pressure_estimation_tpu.parallel import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)
    from gnn_pressure_estimation_tpu.models import select_model
    from gnn_pressure_estimation_tpu.models.presets import apply_model_knobs
    from gnn_pressure_estimation_tpu.train import TrainConfig, Trainer, load_checkpoint
    from gnn_pressure_estimation_tpu.utils.logging import make_logger

    dtype = None
    if args.activation_dtype == "bfloat16":
        import jax.numpy as jnp

        dtype = jnp.bfloat16
    model, preset = select_model(args.model, dtype=dtype)
    try:
        model = apply_model_knobs(model, attn_impl=args.attn_impl,
                                  gate_dtype=args.gate_dtype)
    except ValueError as e:
        raise SystemExit(str(e))
    train_ds, val_ds, norm_type = _load_datasets(args, preset)

    cfg = TrainConfig(
        lr=args.lr, weight_decay=args.weight_decay, epochs=args.epochs,
        mask_rate=args.mask_rate, batch_size=args.batch_size,
        criterion=args.criterion or preset.criterion, norm_type=norm_type,
        patience=args.patience, min_delta=args.min_delta,
        scheduler=args.scheduler, scheduler_patience=args.scheduler_patience,
        use_gradient_clipping=args.use_gradient_clipping,
        clip_percentile=args.percentile, seed=args.seed,
        save_path=args.save_path, model_name=args.model, variant=args.variant,
        log_gradient=args.log_gradient,
        matmul_precision=args.matmul_precision,
        epochs_per_dispatch=args.epochs_per_dispatch,
        agg_mode=args.agg_mode, band_block=args.band_block,
    )
    if args.mesh:
        from gnn_pressure_estimation_tpu.parallel import MeshTrainer, make_mesh

        dp, gp = (int(v) for v in args.mesh.split(","))
        mesh = make_mesh(dp=dp, gp=gp)
        trainer = MeshTrainer(model, cfg, train_ds.stats,
                              train_ds.members[0].template, mesh)
        print(f"mesh {dp}×{gp} ({trainer.strategy} strategy)")
    else:
        trainer = Trainer(model, cfg, train_ds.stats, train_ds.members[0].template)
    print(f"Model: {args.model}; parameters: {trainer.n_params}")
    if args.model_path:
        # full-state resume: params + optimizer + epoch/early-stop/scheduler
        # (the reference reloads weights only, auxil.py:206-220)
        meta = trainer.restore(args.model_path)
        print(f"resumed from {args.model_path} (epoch {meta['epoch']}, "
              f"continuing at {meta['epoch'] + 1})")

    logger = make_logger(args.log_method, args.project_name,
                         f"{args.model}_{args.variant}", vars(args))
    on_epoch_end = logger.log_epoch
    if args.profile_dir:
        # device trace of the first epochs (skips epoch 1's compile)
        import jax

        state = {"on": False}

        def on_epoch_end(epoch, mets, _log=logger.log_epoch):
            _log(epoch, mets)
            if epoch == 1:
                jax.profiler.start_trace(args.profile_dir)
                state["on"] = True
            elif state["on"] and epoch > args.profile_epochs:
                jax.profiler.stop_trace()
                state["on"] = False
                print(f"profiler trace written to {args.profile_dir}")

    best = trainer.fit(train_ds, val_ds, on_epoch_end=on_epoch_end)
    if args.profile_dir and state["on"]:
        import jax

        jax.profiler.stop_trace()
    logger.finish()
    print(f"best epoch {best['epoch']}: val_loss {best['loss']:.6f}")

    if args.do_test:
        # clean, unshared-mask evaluation of the best checkpoint on the test
        # split (reference convert_train_2_test_arguments defaults)
        from gnn_pressure_estimation_tpu.data import WDNDataset
        from gnn_pressure_estimation_tpu.evaluation import EvalConfig, Evaluator
        from gnn_pressure_estimation_tpu.train import load_checkpoint

        params, _, _ = load_checkpoint(trainer._ckpt_path("best"), trainer.params)
        test_ds = WDNDataset(
            args.dataset_paths, args.input_paths, feature=args.feature,
            from_set="test", removal=args.train_val_removal,
            edge_attrs=_edge_attrs(args, preset), norm_type=norm_type,
            stats=train_ds.stats,
        )
        ecfg = EvalConfig(
            test_type="clean", num_test_trials=10, batch_size=args.batch_size,
            mask_rate=args.mask_rate, criterion=cfg.criterion,
            use_same_mask=False, feature=args.feature,
            removal=args.train_val_removal,
            # evaluate under the layout the run just trained with (same
            # invariant cmd_eval enforces from the checkpoint's extras)
            agg_mode=args.agg_mode, band_block=args.band_block,
        )
        Evaluator(model, ecfg, train_ds.stats).evaluate(params, test_ds)
    return 0


def cmd_eval(args):
    if args.device == "cpu":
        import jax

        if args.mesh:
            need = 1
            for v in args.mesh.split(","):
                need *= int(v)
            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={need}"
                )
        jax.config.update("jax_platforms", "cpu")
    from gnn_pressure_estimation_tpu.data import WDNDataset
    from gnn_pressure_estimation_tpu.evaluation import EvalConfig, Evaluator
    from gnn_pressure_estimation_tpu.evaluation.harness import make_noisy_scenes
    from gnn_pressure_estimation_tpu.models import select_model
    from gnn_pressure_estimation_tpu.models.presets import apply_model_knobs
    from gnn_pressure_estimation_tpu.train import load_checkpoint

    model, preset = select_model(args.model)
    try:
        # apply the same attention-knob overrides training honors, so eval
        # can reproduce a run trained with a non-preset implementation
        model = apply_model_knobs(model, attn_impl=args.attn_impl,
                                  gate_dtype=args.gate_dtype)
    except ValueError as e:
        raise SystemExit(str(e))
    norm_type = args.norm_type or preset.norm_type
    edge_attrs = _edge_attrs(args, preset)
    if not args.model_path:
        sys.exit("eval requires --model_path (a trained checkpoint)")
    params, _, meta = load_checkpoint(args.model_path)
    stats = meta.get("stats")
    assert stats is not None, "checkpoint lacks normalization stats"

    # evaluate under the layout the model was trained with (stored in the
    # checkpoint); explicit flags still override
    layout = (meta.get("extra") or {}).get("layout") or {}
    agg_mode = args.agg_mode or layout.get("agg_mode")
    band_block = args.band_block or layout.get("band_block")

    cfg = EvalConfig(
        test_type=args.test_type, num_test_trials=args.num_test_trials,
        batch_size=args.batch_size, mask_rate=args.mask_rate,
        criterion=args.criterion or preset.criterion,
        use_same_mask=args.use_same_mask,
        gpu_warmup_times=args.gpu_warmup_times,
        test_input_path=args.test_input_path,
        mean_dmd=args.mean_dmd, std_dmd=args.std_dmd,
        feature=args.feature, removal=args.test_removal,
        agg_mode=agg_mode, band_block=band_block,
    )
    # params restored without a template keep raw dict form — rebuild via init
    import jax
    import jax.numpy as jnp

    if cfg.test_type == "clean":
        if args.from_set == "all":
            from gnn_pressure_estimation_tpu.data.dataset import stacked_dataset

            test_ds = stacked_dataset(
                args.test_data_path, args.test_input_path, stats,
                feature=args.feature, removal=args.test_removal,
                edge_attrs=edge_attrs, norm_type=norm_type,
                num_tests=args.num_tests,
            )
        elif args.from_set == "inp":
            # single fresh noise-free simulation of the INP
            # (reference evaluation.py:177-196 single_snapshot path)
            from gnn_pressure_estimation_tpu.data.noisy import NoisyWDNDataset

            test_ds = NoisyWDNDataset(
                [args.test_input_path], feature=args.feature,
                removal=args.test_removal, stats=stats,
                edge_attrs=edge_attrs, norm_type=norm_type,
                mean_dmd=0.0, std_dmd=0.0,
            )
        else:
            test_ds = WDNDataset(
                [args.test_data_path], [args.test_input_path],
                feature=args.feature, from_set=args.from_set,
                removal=args.test_removal, edge_attrs=edge_attrs,
                norm_type=norm_type, stats=stats,
            )
        datasets = test_ds
        tpl = test_ds.members[0].template
    else:
        datasets = make_noisy_scenes(
            [args.test_input_path], cfg, stats, edge_attrs, norm_type
        )
        tpl = datasets[0].members[0].template

    g1 = tpl.batch(1, mode=agg_mode, band_block=band_block)
    # g1.n_node covers banded padding (n_pad) when the template is large
    template_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((g1.n_node, 1)), g1
    )
    from flax import serialization

    params = serialization.from_state_dict(template_params, params)

    mesh = None
    if args.mesh:
        from gnn_pressure_estimation_tpu.parallel import make_mesh

        dp, gp = (int(v) for v in args.mesh.split(","))
        mesh = make_mesh(dp=dp, gp=gp)
        print(f"mesh eval {dp}×{gp}")
    ev = Evaluator(model, cfg, stats, mesh=mesh)
    loss_dict, metric_dict, sensor_dict = ev.evaluate(params, datasets)
    return 0


def cmd_infer(args):
    """Serving surface: reconstruct full pressure fields from sparse
    observations and export them (no reference analog — evaluation.py only
    reports aggregate metrics; this keeps the estimated field)."""
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from gnn_pressure_estimation_tpu.data import WDNDataset
    from gnn_pressure_estimation_tpu.evaluation.infer import Inferencer
    from gnn_pressure_estimation_tpu.models import select_model
    from gnn_pressure_estimation_tpu.models.presets import apply_model_knobs
    from gnn_pressure_estimation_tpu.train import load_checkpoint

    model, preset = select_model(args.model)
    try:
        model = apply_model_knobs(model, attn_impl=args.attn_impl,
                                  gate_dtype=args.gate_dtype)
    except ValueError as e:
        raise SystemExit(str(e))
    if not args.model_path:
        sys.exit("infer requires --model_path (a trained checkpoint)")
    params, _, meta = load_checkpoint(args.model_path)
    stats = meta.get("stats")
    assert stats is not None, "checkpoint lacks normalization stats"
    layout = (meta.get("extra") or {}).get("layout") or {}
    agg_mode = args.agg_mode or layout.get("agg_mode")
    band_block = args.band_block or layout.get("band_block")
    norm_type = args.norm_type or preset.norm_type
    edge_attrs = _edge_attrs(args, preset)

    if args.from_set == "inp":
        # fresh noise-free simulation of the INP as the snapshot source
        from gnn_pressure_estimation_tpu.data.noisy import NoisyWDNDataset

        ds = NoisyWDNDataset(
            [args.test_input_path], feature=args.feature,
            removal=args.test_removal, stats=stats, edge_attrs=edge_attrs,
            norm_type=norm_type, mean_dmd=0.0, std_dmd=0.0,
        )
    else:
        ds = WDNDataset(
            [args.test_data_path], [args.test_input_path],
            feature=args.feature, from_set=args.from_set,
            removal=args.test_removal, edge_attrs=edge_attrs,
            norm_type=norm_type, stats=stats,
        )
    template = ds.members[0].template
    rows = ds.members[0].array  # scaled snapshots [S, n]
    if args.num_snapshots:
        rows = rows[: args.num_snapshots]

    # params restored without a template keep raw dict form — rebuild via init
    import jax
    import jax.numpy as jnp

    g1 = template.batch(1, mode=agg_mode, band_block=band_block)
    template_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((g1.n_node, 1)), g1
    )
    from flax import serialization

    params = serialization.from_state_dict(template_params, params)

    inf = Inferencer(model, stats, agg_mode=agg_mode, band_block=band_block)
    spec = args.observed
    if spec not in ("random", "sensors"):
        spec = [s.strip() for s in spec.split(",") if s.strip()]
    try:
        obs_idx = inf.observed_indices(
            template, spec, test_input_path=args.test_input_path,
            mask_rate=args.mask_rate, seed=args.seed,
        )
    except ValueError as e:
        raise SystemExit(str(e))
    res = inf.infer(params, template, rows, obs_idx, scaled=True,
                    batch_size=args.batch_size, with_truth=True)
    print(f"inferred {res.pred.shape[0]} snapshots × {res.pred.shape[1]} nodes "
          f"({len(obs_idx)} observed)")
    for mk, mv in res.metrics.items():
        print(f"  {mk}: {mv:.6g}" if isinstance(mv, float) else f"  {mk}: {mv}")
    if args.out_npz:
        res.save_npz(args.out_npz)
        print(f"wrote {args.out_npz}")
    if args.out_csv:
        res.save_csv(args.out_csv)
        print(f"wrote {args.out_csv}")
    if not (args.out_npz or args.out_csv):
        print("(pass --out_npz / --out_csv to export the fields)")
    return 0


def cmd_generate(args):
    from gnn_pressure_estimation_tpu.simgen.config import GenOptions
    from gnn_pressure_estimation_tpu.simgen.runner import generate

    opt_fields = {f.name for f in dataclasses.fields(GenOptions)}
    opts = GenOptions(**{k: v for k, v in vars(args).items() if k in opt_fields})
    generate(args.config, opts)
    return 0


def cmd_mkconfig(args):
    from gnn_pressure_estimation_tpu.simgen.config import create_dummy_config

    create_dummy_config(
        args.wn_inp_path, out_path=args.out,
        num_scenarios=args.num_scenarios, strategy=args.strategy,
    )
    print(f"wrote {args.out}")
    return 0


def cmd_netgen(args):
    from gnn_pressure_estimation_tpu.data.inp import write_inp
    from gnn_pressure_estimation_tpu.simgen.netgen import make_wdn

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    wn = make_wdn(
        args.junctions, args.reservoirs, args.tanks, args.pumps, args.valves,
        seed=args.seed,
    )
    write_inp(wn, args.out)
    print(f"wrote {args.out}: {wn.n_nodes} nodes, {wn.n_links} links")
    return 0


def cmd_benchmark(args):
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                   run_name="__main__")
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(prog="gnn_pressure_estimation_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train a model on snapshot datasets")
    _add_train_flags(p_train)

    p_eval = sub.add_parser("eval", help="multi-trial statistical evaluation")
    _add_train_flags(p_eval)
    p_eval.add_argument("--test_type", default="clean",
                        choices=["clean", "noisy11", "noisyNN"])
    p_eval.add_argument("--from_set", default="test",
                        choices=["train", "valid", "test", "all", "inp"],
                        help="'all' stacks test+train+valid; 'inp' simulates "
                             "one fresh snapshot from the INP (no zip needed)")
    p_eval.add_argument("--test_data_path", default="datasets/synthctown.zip")
    p_eval.add_argument("--test_input_path", default="inputs/synthctown.inp")
    p_eval.add_argument("--test_removal", default="keep_junction",
                        choices=["keep_all", "keep_list", "keep_junction",
                                 "reservoir", "tank"])
    p_eval.add_argument("--num_test_trials", default=10, type=int)
    p_eval.add_argument("--num_tests", default=None, type=int,
                        help="cap the stacked 'all' evaluation set at this "
                             "many records (reference evaluation.py:923)")
    p_eval.add_argument("--use_same_mask", action="store_true")
    p_eval.add_argument("--gpu_warmup_times", default=10, type=int)
    p_eval.add_argument("--mean_dmd", default=0.1, type=float)
    p_eval.add_argument("--std_dmd", default=1.0, type=float)

    p_inf = sub.add_parser(
        "infer", help="reconstruct full pressure fields from sparse "
                      "observations and export them (serving)")
    _add_train_flags(p_inf)
    p_inf.add_argument("--from_set", default="test",
                       choices=["train", "valid", "test", "inp"],
                       help="'inp' simulates one fresh snapshot from the INP")
    p_inf.add_argument("--test_data_path", default="datasets/synthctown.zip")
    p_inf.add_argument("--test_input_path", default="inputs/synthctown.inp")
    p_inf.add_argument("--test_removal", default="keep_junction",
                       choices=["keep_all", "keep_list", "keep_junction",
                                "reservoir", "tank"])
    p_inf.add_argument("--observed", default="random",
                       help="'random' (seeded draw at 1-mask_rate density), "
                            "'sensors' (mysecrets plug-in), or comma-"
                            "separated node names")
    p_inf.add_argument("--num_snapshots", default=None, type=int)
    p_inf.add_argument("--out_npz", default=None, type=str)
    p_inf.add_argument("--out_csv", default=None, type=str)

    p_gen = sub.add_parser("generate", help="Monte-Carlo scenario generation")
    p_gen.add_argument("--config", required=True)
    from gnn_pressure_estimation_tpu.simgen.config import GenOptions

    for f in dataclasses.fields(GenOptions):
        if f.name == "config":
            continue
        arg = f"--{f.name}"
        ftype = str(f.type)
        if ftype == "bool" or isinstance(f.default, bool):
            p_gen.add_argument(arg, default=f.default,
                               action=argparse.BooleanOptionalAction)
        elif f.default is None:
            # Optional fields: infer the scalar type from the annotation so
            # "--pressure_lowerbound -5" parses as float, not str
            typ = float if "float" in ftype else (int if "int" in ftype else str)
            p_gen.add_argument(arg, default=None, type=typ)
        else:
            p_gen.add_argument(arg, default=f.default, type=type(f.default))

    p_cfg = sub.add_parser("mkconfig", help="derive a generation INI from an INP")
    p_cfg.add_argument("--wn_inp_path", required=True)
    p_cfg.add_argument("--out", required=True)
    p_cfg.add_argument("--num_scenarios", default=100, type=int)
    p_cfg.add_argument("--strategy", default="minmax", choices=["minmax", "quantile"])

    p_net = sub.add_parser("netgen", help="generate a synthetic WDN INP")
    p_net.add_argument("--out", required=True)
    p_net.add_argument("--junctions", default=388, type=int)
    p_net.add_argument("--reservoirs", default=1, type=int)
    p_net.add_argument("--tanks", default=7, type=int)
    p_net.add_argument("--pumps", default=11, type=int)
    p_net.add_argument("--valves", default=4, type=int)
    p_net.add_argument("--seed", default=0, type=int)

    sub.add_parser("benchmark", help="run the edges/s benchmark")

    args = parser.parse_args(argv)
    return {
        "train": cmd_train,
        "eval": cmd_eval,
        "infer": cmd_infer,
        "generate": cmd_generate,
        "mkconfig": cmd_mkconfig,
        "netgen": cmd_netgen,
        "benchmark": cmd_benchmark,
    }[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
