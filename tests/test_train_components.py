"""Unit tests: early stopping, AutoClip, plateau scheduler, checkpoints,
multi-dataset training, weighted-vs-gathered metric equivalence."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from gnn_pressure_estimation_tpu.train import (
    EarlyStopping,
    autoclip,
    load_checkpoint,
    save_checkpoint,
)
from gnn_pressure_estimation_tpu.train.loop import ReduceLROnPlateau
from gnn_pressure_estimation_tpu.utils import metrics as M
from gnn_pressure_estimation_tpu.utils.scaling import NormStats


def test_early_stopping_patience():
    es = EarlyStopping(mode="min", min_delta=0.0, patience=3)
    assert not es.step(1.0)
    assert not es.step(0.9)
    assert not es.step(0.95)
    assert not es.step(0.95)
    assert es.step(0.95)  # 3rd bad epoch


def test_early_stopping_nan_stops():
    es = EarlyStopping(patience=10)
    es.step(1.0)
    assert es.step(float("nan"))


def test_early_stopping_zero_patience_disabled():
    es = EarlyStopping(patience=0)
    for _ in range(5):
        assert not es.step(1.0)


def test_autoclip_percentile():
    """Norm history [1, 2, ..., 10]: p10 percentile clips later large grads."""
    tx = autoclip(percentile=10.0, history_len=64)
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    for v in range(1, 11):
        g = {"w": jnp.full(3, v / np.sqrt(3.0))}  # global norm = v
        out, state = tx.update(g, state)
    # history [1..10]; p10 = 1.9 (np.percentile linear interp)
    # the last update had norm 10 → scaled to ~1.9
    np.testing.assert_allclose(
        float(jnp.linalg.norm(out["w"])), np.percentile(np.arange(1, 11), 10),
        rtol=1e-4,
    )


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(patience=2, factor=0.1)
    lr = 1.0
    lr = s.step(1.0, lr)   # best=1.0
    lr = s.step(1.0, lr)   # bad 1
    lr = s.step(1.0, lr)   # bad 2
    assert lr == 1.0
    lr = s.step(1.0, lr)   # bad 3 > patience → decay
    assert lr == pytest.approx(0.1)


def test_checkpoint_roundtrip(tmp_path):
    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3)}}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    stats = NormStats(norm_type="minmax", min=1.0, max=9.0)
    path = save_checkpoint(
        str(tmp_path / "c.ckpt"), params, opt_state, epoch=7, loss=0.5,
        metrics={"val_mae": 1.25}, stats=stats,
    )
    p2, o2, meta = load_checkpoint(path, params, opt_state)
    np.testing.assert_array_equal(
        np.asarray(p2["dense"]["kernel"]), np.asarray(params["dense"]["kernel"])
    )
    assert meta["epoch"] == 7 and meta["metrics"]["val_mae"] == 1.25
    assert meta["stats"].max == 9.0
    # optimizer state restored with structure
    assert jax.tree.structure(o2) == jax.tree.structure(opt_state)


def test_weighted_moment_metrics_equal_gathered(rng):
    """metrics_from_moments(masked_moments(...)) == direct metrics on the
    gathered masked subset."""
    t = rng.standard_normal(300) * 5 + 40
    p = t + rng.standard_normal(300)
    mask = rng.random(300) < 0.6
    pm, tm = jnp.asarray(p * mask), jnp.asarray(t * mask)
    mo = M.masked_moments(jnp.asarray(p), jnp.asarray(t), jnp.asarray(mask))
    got = M.metrics_from_moments(mo, "x")
    pg, tg = jnp.asarray(p[mask]), jnp.asarray(t[mask])
    expect = M.compute_all(pg, tg, "x")
    for k in expect:
        np.testing.assert_allclose(
            float(got[k]), float(expect[k]), rtol=2e-5, atol=1e-6, err_msg=k
        )


def test_scanned_epoch_matches_stepwise(rng):
    """The lax.scan epoch path produces exactly the same parameter trajectory
    as jitting the shared step core once per batch with the same split keys."""
    from gnn_pressure_estimation_tpu.models.gatres import GATRes
    from gnn_pressure_estimation_tpu.train import TrainConfig
    from gnn_pressure_estimation_tpu.train.loop import Trainer
    from helpers import random_graph

    tpl = random_graph(rng, n=14, extra_edges=8)
    cfg = TrainConfig(batch_size=4, mask_rate=0.5, criterion="mse",
                      donate_state=False, seed=1)
    trainer = Trainer(GATRes(num_blocks=1, channels=4), cfg, NormStats(), tpl)
    S, bs = 3, 4
    xbs = [rng.standard_normal((bs, 14)).astype(np.float32) for _ in range(S)]
    key = jax.random.PRNGKey(7)

    epoch_fn = trainer._get_train_epoch(tpl, bs, S)
    xs = jnp.asarray(np.stack(xbs).reshape(S, -1, 1))
    p_scan, _, loss_scan, mets_scan = epoch_fn(
        trainer.params, trainer.opt_state, xs, key
    )

    step = jax.jit(trainer._train_step_core(tpl, bs))
    p, s = trainer.params, trainer.opt_state
    losses = []
    for x, k in zip(xbs, jax.random.split(key, S)):
        p, s, loss, mets = step(p, s, jnp.asarray(x.reshape(-1, 1)),
                                jnp.asarray(x.reshape(-1, 1)), k)
        losses.append(float(loss))
    np.testing.assert_allclose(float(loss_scan), np.mean(losses), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_scan), jax.tree.leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multi_dataset_training(rng, tmp_path):
    """Two different templates in one dataset: loader emits homogeneous
    batches; the trainer compiles one step per template and learns."""
    from gnn_pressure_estimation_tpu.data.dataset import WDNDataset, _Member, SnapshotLoader
    from gnn_pressure_estimation_tpu.models.gatres import GATRes
    from gnn_pressure_estimation_tpu.train import TrainConfig
    from gnn_pressure_estimation_tpu.train.loop import Trainer
    from helpers import random_graph

    tpl_a = random_graph(rng, n=12, extra_edges=6)
    tpl_b = random_graph(rng, n=18, extra_edges=9)
    ds = object.__new__(WDNDataset)
    ds.feature, ds.from_set, ds.norm_type, ds.edge_attrs = "pressure", "train", "znorm", None
    ds.stats = NormStats()
    ds.members = [
        _Member(tpl_a, rng.standard_normal((10, 12)).astype(np.float32), [], None),
        _Member(tpl_b, rng.standard_normal((10, 18)).astype(np.float32), [], None),
    ]
    ds._lengths = [10, 10]
    ds.length = 20

    loader = SnapshotLoader(ds, batch_size=4, shuffle=True, seed=0)
    shapes = {xb.shape for _, xb, _ in loader}
    assert shapes == {(4, 12), (2, 12), (4, 18), (2, 18)}

    cfg = TrainConfig(epochs=2, batch_size=4, mask_rate=0.5, criterion="mse",
                      patience=100, donate_state=False, seed=0)
    trainer = Trainer(GATRes(num_blocks=1, channels=4), cfg, ds.stats, tpl_a)
    best = trainer.fit(ds, ds, log_fn=lambda *_: None)
    assert math.isfinite(best["loss"])
    # one compiled train step per template
    assert len(trainer._train_step_cache) >= 2


def test_dynamic_masked_count_matches_static(rng):
    """n_masked=None (dynamic denominator) reproduces the static-count loss
    exactly on an unpadded batch."""
    from gnn_pressure_estimation_tpu.models.gatres import GATRes
    from gnn_pressure_estimation_tpu.train import TrainConfig
    from gnn_pressure_estimation_tpu.train.loop import Trainer
    from gnn_pressure_estimation_tpu.utils.masking import batch_node_mask, masked_count
    from helpers import random_graph

    tpl = random_graph(rng, n=12, extra_edges=6)
    cfg = TrainConfig(batch_size=3, mask_rate=0.5, criterion="mse",
                      donate_state=False)
    tr = Trainer(GATRes(num_blocks=1, channels=4), cfg, NormStats(), tpl)
    g = tr._batched_graph(tpl, 3)
    x = jnp.asarray(rng.standard_normal((36, 1)).astype(np.float32))
    mask = batch_node_mask(jax.random.PRNGKey(0), 3, 12, 0.5)
    k = masked_count(12, 0.5)
    l_static, m_static, _ = tr._masked_loss_and_metrics(
        tr.params, g, x, x, mask, 3 * k, "train")
    l_dyn, m_dyn, _ = tr._masked_loss_and_metrics(
        tr.params, g, x, x, mask, None, "train")
    np.testing.assert_allclose(float(l_static), float(l_dyn), rtol=1e-7)
    for mk in m_static:
        np.testing.assert_allclose(float(m_static[mk]), float(m_dyn[mk]),
                                   rtol=1e-6)


def test_fit_fast_multi_epoch_dispatch(rng, tmp_path):
    """epochs_per_dispatch>1 runs whole epochs on device (incl. a padded
    tail batch), learns, checkpoints, and reports per-epoch losses."""
    from gnn_pressure_estimation_tpu.data.dataset import WDNDataset, _Member
    from gnn_pressure_estimation_tpu.models.gatres import GATRes
    from gnn_pressure_estimation_tpu.train import TrainConfig
    from gnn_pressure_estimation_tpu.train.loop import Trainer
    from helpers import random_graph

    tpl = random_graph(rng, n=14, extra_edges=7)
    arr = rng.standard_normal((22, 14)).astype(np.float32)  # 22 % 4 != 0 → tail
    def mkds(a):
        ds = object.__new__(WDNDataset)
        ds.feature, ds.from_set, ds.norm_type, ds.edge_attrs = "pressure", "train", "znorm", None
        ds.stats = NormStats()
        ds.members = [_Member(tpl, a, [], None)]
        ds._lengths = [len(a)]
        ds.length = len(a)
        return ds

    train_ds, val_ds = mkds(arr), mkds(arr[:10])
    epochs_log = []
    cfg = TrainConfig(epochs=7, batch_size=4, mask_rate=0.5, criterion="mse",
                      patience=100, donate_state=False, seed=0,
                      epochs_per_dispatch=3, save_path=str(tmp_path))
    tr = Trainer(GATRes(num_blocks=1, channels=4), cfg, NormStats(), tpl)
    best = tr.fit(train_ds, val_ds, log_fn=lambda *_: None,
                  on_epoch_end=lambda ep, m: epochs_log.append((ep, m)))
    assert [ep for ep, _ in epochs_log] == list(range(1, 8))
    assert all(math.isfinite(m["val_loss"]) for _, m in epochs_log)
    # it learns: later epochs beat the first
    assert best["loss"] < epochs_log[0][1]["val_loss"]
    assert (tmp_path / "best_model.ckpt").exists()
