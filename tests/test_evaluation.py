"""Evaluation harness tests: clean/noisy trial structures, sensors, timing."""

import numpy as np
import jax
import pytest

from gnn_pressure_estimation_tpu.data import WDNDataset, ZarrZipWriter
from gnn_pressure_estimation_tpu.data.noisy import NoisyWDNDataset
from gnn_pressure_estimation_tpu.evaluation import EvalConfig, Evaluator
from gnn_pressure_estimation_tpu.evaluation.harness import make_noisy_scenes
from gnn_pressure_estimation_tpu.models.gatres import GATRes
from gnn_pressure_estimation_tpu.utils.scaling import NormStats


@pytest.fixture(scope="module")
def mini_setup(tmp_path_factory):
    """minitown INP + small snapshot zip + tiny model params."""
    import jax.numpy as jnp

    tmp = tmp_path_factory.mktemp("eval")
    inp_path = "inputs/minitown.inp"
    from gnn_pressure_estimation_tpu.data.inp import parse_inp

    wn = parse_inp(inp_path)
    rng = np.random.default_rng(0)
    snaps = 50 + rng.normal(0, 8, size=(24, wn.n_nodes))
    zip_path = str(tmp / "mini.zip")
    with ZarrZipWriter(zip_path) as w:
        w.create_group("pressure")
        w.write_array("pressure/train", snaps[:12])
        w.write_array("pressure/valid", snaps[12:18])
        w.write_array("pressure/test", snaps[18:])
        w.set_attrs("", {})

    train_ds = WDNDataset([zip_path], [inp_path], from_set="train", removal="keep_junction")
    test_ds = WDNDataset([zip_path], [inp_path], from_set="test",
                         removal="keep_junction", stats=train_ds.stats)
    model = GATRes(num_blocks=1, channels=4)
    tpl = train_ds.members[0].template
    g = tpl.batch(1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((tpl.n_node, 1)), g)
    return dict(inp=inp_path, train=train_ds, test=test_ds, model=model,
                params=params, stats=train_ds.stats)


def test_clean_multitrial(mini_setup):
    s = mini_setup
    cfg = EvalConfig(test_type="clean", num_test_trials=3, batch_size=4,
                     mask_rate=0.5, gpu_warmup_times=1)
    ev = Evaluator(s["model"], cfg, s["stats"])
    loss_dict, mets, sensor_mets = ev.evaluate(s["params"], s["test"], log_fn=lambda *_: None)
    assert "test_loss_mean" in loss_dict and np.isfinite(loss_dict["test_loss_mean"])
    for k in ("test_mae_mean", "test_rmse_mean", "test_corr_mean",
              "test_time_mean", "test_throughput_mean"):
        assert k in mets, sorted(mets)
    assert mets["test_time_mean"] > 0
    assert mets["test_throughput_mean"] > 0
    # without sensors configured, sensor pass runs with plain masks
    assert "test_mae_sensor_mean" in sensor_mets


def test_sensor_masking(mini_setup):
    s = mini_setup
    tpl = s["test"].members[0].template
    sensor_names = tpl.node_names[:3]
    cfg = EvalConfig(test_type="clean", num_test_trials=2, batch_size=3,
                     mask_rate=0.5, gpu_warmup_times=0, sensor_names=sensor_names)
    ev = Evaluator(s["model"], cfg, s["stats"])
    idx = ev._sensor_idx(tpl)
    assert idx == (0, 1, 2)
    loss_dict, mets, sensor_mets = ev.evaluate(s["params"], s["test"], log_fn=lambda *_: None)
    assert np.isfinite(loss_dict["test_loss_sensor_mean"])


def test_noisy_dataset_simulates(mini_setup):
    s = mini_setup
    ds = NoisyWDNDataset([s["inp"]], stats=s["stats"], mean_dmd=0.0, std_dmd=0.0, seed=0)
    assert len(ds) == 1
    arr = ds.members[0].array
    assert arr.shape[1] == s["test"].members[0].template.n_node
    assert np.isfinite(arr).all()
    # noise changes the solution
    ds2 = NoisyWDNDataset([s["inp"]], stats=s["stats"], mean_dmd=0.3, std_dmd=0.5, seed=1)
    assert not np.allclose(ds.members[0].array, ds2.members[0].array)


def test_noisy11_and_noisyNN(mini_setup):
    s = mini_setup
    cfg = EvalConfig(test_type="noisy11", num_test_trials=2, batch_size=1,
                     mask_rate=0.5, gpu_warmup_times=0, mean_dmd=0.05, std_dmd=0.1)
    scenes = make_noisy_scenes([s["inp"]], cfg, s["stats"])
    assert len(scenes) == 2
    ev = Evaluator(s["model"], cfg, s["stats"])
    loss_dict, mets, _ = ev.evaluate(s["params"], scenes, log_fn=lambda *_: None)
    assert np.isfinite(loss_dict["test_loss_mean"])

    cfg_nn = EvalConfig(test_type="noisyNN", num_test_trials=2, batch_size=1,
                        mask_rate=0.5, gpu_warmup_times=0)
    ev2 = Evaluator(s["model"], cfg_nn, s["stats"])
    losses, mets2, _ = ev2.evaluate(s["params"], scenes, log_fn=lambda *_: None)
    # N scenes x N masks = 4 trials
    assert len(ev2._step_cache) >= 1
    assert np.isfinite(losses["test_loss_mean"])


def test_scene_metrics_match_gathered(mini_setup):
    """Batched per-scene moment metrics == the gathered per-trial metrics fn,
    row by row (same out/y/mask)."""
    import jax.numpy as jnp
    from gnn_pressure_estimation_tpu.utils.masking import masked_count

    s = mini_setup
    cfg = EvalConfig(test_type="noisy11", num_test_trials=3, batch_size=1,
                     mask_rate=0.5, gpu_warmup_times=0)
    ev = Evaluator(s["model"], cfg, s["stats"])
    tpl = s["test"].members[0].template
    n, N = tpl.n_node, 3
    rng = np.random.default_rng(7)
    out = jnp.asarray(rng.standard_normal((N * n, 1)).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((N * n, 1)) * 0.5).astype(np.float32))
    k = masked_count(n, 0.5)
    mask_rows = np.zeros((N, n), bool)
    for i in range(N):
        mask_rows[i, rng.choice(n, size=k, replace=False)] = True
    mask = jnp.asarray(mask_rows.reshape(-1))

    loss_b, mets_b = ev._get_scene_metrics_fn(tpl, N, "test")(out, y, mask)
    gfn = ev._get_metrics_fn(tpl, 1, "test")
    for i in range(N):
        sl = slice(i * n, (i + 1) * n)
        loss_g, mets_g = gfn(out[sl], y[sl], mask[sl])
        np.testing.assert_allclose(float(loss_b[i]), float(loss_g), rtol=1e-5)
        for mk in mets_g:
            np.testing.assert_allclose(
                float(mets_b[mk][i]), float(mets_g[mk]), rtol=1e-4, atol=1e-5,
                err_msg=mk,
            )


def test_scene_trials_structure(mini_setup):
    """run_scene_trials: N scenes x M draws rows, scene-major, finite, timed."""
    from gnn_pressure_estimation_tpu.evaluation.timer import Timer

    s = mini_setup
    cfg = EvalConfig(test_type="noisyNN", num_test_trials=2, batch_size=1,
                     mask_rate=0.5, gpu_warmup_times=0, mean_dmd=0.05,
                     std_dmd=0.1, sensor_names=None)
    scenes = make_noisy_scenes([s["inp"]] , cfg, s["stats"])
    ev = Evaluator(s["model"], cfg, s["stats"])
    assert ev._scenes_batchable(scenes)
    ev.params = s["params"]
    rows = ev.run_scene_trials(scenes, 2, timer=Timer())
    assert len(rows) == len(scenes) * 2
    for row in rows:
        assert np.isfinite(row["loss"]) and np.isfinite(row["s_loss"])
        assert np.isfinite(list(row["mets"].values())).all()
        assert row["time"] is not None and row["time"][0] > 0


def test_same_mask_flag(mini_setup):
    s = mini_setup
    cfg = EvalConfig(test_type="clean", num_test_trials=1, batch_size=2,
                     mask_rate=0.5, gpu_warmup_times=0, use_same_mask=True)
    ev = Evaluator(s["model"], cfg, s["stats"])
    ev.params = s["params"]
    loss, mets = ev.run_trial(s["test"], 0)
    assert np.isfinite(loss)
