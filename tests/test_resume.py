"""True checkpoint resume: interrupt at epoch k, continue bit-identically.

The reference restores weights only (auxil.py:206-220), losing optimizer
moments, epoch counter, early-stop and scheduler state. Here ``Trainer.
restore`` brings all of it back, and per-epoch randomness is derived from
(seed, epoch) so a resumed run replays the exact streams of an
uninterrupted one.
"""

import dataclasses
import math

import jax
import numpy as np
import pytest

from gnn_pressure_estimation_tpu.data.dataset import WDNDataset, _Member
from gnn_pressure_estimation_tpu.models.gatres import GATRes
from gnn_pressure_estimation_tpu.train import TrainConfig
from gnn_pressure_estimation_tpu.train.loop import Trainer, get_lr
from gnn_pressure_estimation_tpu.utils.scaling import NormStats


def _mkds(tpl, a):
    ds = object.__new__(WDNDataset)
    ds.feature, ds.from_set, ds.norm_type, ds.edge_attrs = (
        "pressure", "train", "znorm", None)
    ds.stats = NormStats()
    ds.members = [_Member(tpl, a, [], None)]
    ds._lengths = [len(a)]
    ds.length = len(a)
    return ds


def _params_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def setup(rng_module):
    from helpers import random_graph

    rng = rng_module
    tpl = random_graph(rng, n=13, extra_edges=6)
    arr = rng.standard_normal((18, 13)).astype(np.float32)
    return tpl, arr


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(11)


def _cfg(tmp, **kw):
    base = dict(epochs=6, batch_size=4, mask_rate=0.5, criterion="mse",
                patience=100, donate_state=False, seed=5,
                save_path=str(tmp), scheduler="ReduceLROnPlateau",
                scheduler_patience=1, log_every=1)
    base.update(kw)
    return TrainConfig(**base)


def test_resume_bit_identical(setup, tmp_path):
    tpl, arr = setup
    train_ds, val_ds = _mkds(tpl, arr), _mkds(tpl, arr[:8])

    # uninterrupted 6-epoch run
    cfg_full = _cfg(tmp_path / "full")
    tr_full = Trainer(GATRes(num_blocks=1, channels=4), cfg_full,
                      NormStats(), tpl)
    tr_full.fit(train_ds, val_ds, log_fn=lambda *_: None)

    # interrupted at epoch 3 ...
    cfg_a = _cfg(tmp_path / "part", epochs=3)
    tr_a = Trainer(GATRes(num_blocks=1, channels=4), cfg_a, NormStats(), tpl)
    tr_a.fit(train_ds, val_ds, log_fn=lambda *_: None)

    # ... resumed from 'last' and continued to 6
    cfg_b = _cfg(tmp_path / "part")  # epochs=6
    tr_b = Trainer(GATRes(num_blocks=1, channels=4), cfg_b, NormStats(), tpl)
    meta = tr_b.restore(str(tmp_path / "part" / "last_model.ckpt"))
    assert meta["epoch"] == 3
    assert tr_b._resume["epoch"] == 3
    epochs_seen = []
    tr_b.fit(train_ds, val_ds, log_fn=lambda *_: None,
             on_epoch_end=lambda ep, m: epochs_seen.append(ep))
    assert epochs_seen == [4, 5, 6]

    _params_equal(tr_full.params, tr_b.params)
    # optimizer state continues too (Adam moments + lr)
    _params_equal(jax.tree.leaves(tr_full.opt_state),
                  jax.tree.leaves(tr_b.opt_state))


def test_resume_restores_bookkeeping(setup, tmp_path):
    """Early-stop counters, scheduler state, best-so-far, and lr survive."""
    tpl, arr = setup
    train_ds, val_ds = _mkds(tpl, arr), _mkds(tpl, arr[:8])
    cfg = _cfg(tmp_path, epochs=4, min_delta=1e9)  # nothing ever "improves"
    tr = Trainer(GATRes(num_blocks=1, channels=4), cfg, NormStats(), tpl)
    best = tr.fit(train_ds, val_ds, log_fn=lambda *_: None)

    tr2 = Trainer(GATRes(num_blocks=1, channels=4), cfg, NormStats(), tpl)
    meta = tr2.restore(str(tmp_path / "last_model.ckpt"))
    rs = tr2._resume
    # with min_delta huge, every epoch after the first is "bad"
    assert rs["early"]["num_bad_epochs"] == 3
    assert rs["sched"] is not None and rs["sched"]["num_bad"] >= 0
    assert rs["best"]["epoch"] == best["epoch"]
    assert math.isclose(rs["best"]["loss"], best["loss"], rel_tol=1e-9)
    # whatever lr the run ended on (annealed or not) comes back via opt_state
    assert get_lr(tr2.opt_state) == pytest.approx(get_lr(tr.opt_state))


def test_resume_fast_path_block_boundary(setup, tmp_path):
    """epochs_per_dispatch>1: resume at a block boundary is bit-identical."""
    tpl, arr = setup
    train_ds, val_ds = _mkds(tpl, arr), _mkds(tpl, arr[:8])

    cfg_full = _cfg(tmp_path / "ff", epochs=7, epochs_per_dispatch=3,
                    scheduler=None)
    tr_full = Trainer(GATRes(num_blocks=1, channels=4), cfg_full,
                      NormStats(), tpl)
    tr_full.fit(train_ds, val_ds, log_fn=lambda *_: None)

    cfg_a = _cfg(tmp_path / "fp", epochs=3, epochs_per_dispatch=3,
                 scheduler=None)
    tr_a = Trainer(GATRes(num_blocks=1, channels=4), cfg_a, NormStats(), tpl)
    tr_a.fit(train_ds, val_ds, log_fn=lambda *_: None)

    cfg_b = _cfg(tmp_path / "fp", epochs=7, epochs_per_dispatch=3,
                 scheduler=None)
    tr_b = Trainer(GATRes(num_blocks=1, channels=4), cfg_b, NormStats(), tpl)
    tr_b.restore(str(tmp_path / "fp" / "last_model.ckpt"))
    tr_b.fit(train_ds, val_ds, log_fn=lambda *_: None)

    _params_equal(tr_full.params, tr_b.params)


def test_resume_fast_path_mid_block_stop(setup, tmp_path):
    """A fast-path checkpoint written mid-block (early stop at epoch 2 of a
    5-epoch dispatch block) holds block-end params: resume must continue from
    the block end, not the reporting epoch — otherwise it re-applies epochs
    already baked into the params."""
    tpl, arr = setup
    train_ds, val_ds = _mkds(tpl, arr), _mkds(tpl, arr[:8])

    # min_delta huge -> every epoch after the first is "bad"; patience=1
    # stops at epoch 2, inside the single 5-epoch block
    cfg = _cfg(tmp_path / "mb", epochs=5, epochs_per_dispatch=5,
               scheduler=None, min_delta=1e9, patience=1)
    tr_a = Trainer(GATRes(num_blocks=1, channels=4), cfg, NormStats(), tpl)
    seen = []
    tr_a.fit(train_ds, val_ds, log_fn=lambda *_: None,
             on_epoch_end=lambda ep, m: seen.append(ep))
    assert seen == [1, 2]  # early stop fired mid-block

    tr_b = Trainer(GATRes(num_blocks=1, channels=4), cfg, NormStats(), tpl)
    meta = tr_b.restore(str(tmp_path / "mb" / "last_model.ckpt"))
    assert meta["epoch"] == 2             # reporting epoch (stop point)
    assert tr_b._resume["epoch"] == 5     # params epoch (block end)
    resumed = []
    tr_b.fit(train_ds, val_ds, log_fn=lambda *_: None,
             on_epoch_end=lambda ep, m: resumed.append(ep))
    assert resumed == []                  # nothing left to (re-)apply
    _params_equal(tr_a.params, tr_b.params)


def test_resume_fast_path_mid_block_best(setup, tmp_path):
    """A 'best' epoch that lands mid-block must still produce a checkpoint
    whose early-stop state matches its block-end params (the write is
    deferred to block end): resuming from best_model.ckpt continues the
    patience countdown exactly where an uninterrupted run would."""
    tpl, arr = setup
    train_ds, val_ds = _mkds(tpl, arr), _mkds(tpl, arr[:8])

    # min_delta huge -> best is epoch 1, mid-block of the 3-epoch dispatch;
    # patience 4 -> the uninterrupted run stops at epoch 5
    kw = dict(epochs=8, epochs_per_dispatch=3, scheduler=None,
              min_delta=1e9, patience=4)
    cfg_full = _cfg(tmp_path / "full", **kw)
    tr_full = Trainer(GATRes(num_blocks=1, channels=4), cfg_full,
                      NormStats(), tpl)
    seen = []
    tr_full.fit(train_ds, val_ds, log_fn=lambda *_: None,
                on_epoch_end=lambda ep, m: seen.append(ep))
    assert seen == [1, 2, 3, 4, 5]

    cfg_a = _cfg(tmp_path / "mbb", **{**kw, "epochs": 3})
    tr_a = Trainer(GATRes(num_blocks=1, channels=4), cfg_a, NormStats(), tpl)
    tr_a.fit(train_ds, val_ds, log_fn=lambda *_: None)

    tr_b = Trainer(GATRes(num_blocks=1, channels=4),
                   _cfg(tmp_path / "mbb", **kw), NormStats(), tpl)
    meta = tr_b.restore(str(tmp_path / "mbb" / "best_model.ckpt"))
    assert meta["epoch"] == 1                 # the best epoch itself
    assert tr_b._resume["epoch"] == 3         # params are block-end
    # early-stop state was stepped through the whole block, not just epoch 1
    assert tr_b._resume["early"]["num_bad_epochs"] == 2
    resumed = []
    tr_b.fit(train_ds, val_ds, log_fn=lambda *_: None,
             on_epoch_end=lambda ep, m: resumed.append(ep))
    assert resumed == [4, 5]                  # same stop point as the full run
    _params_equal(tr_full.params, tr_b.params)


def test_weights_only_checkpoint_still_loads(setup, tmp_path):
    """A checkpoint without resume extras degrades gracefully."""
    from gnn_pressure_estimation_tpu.train.checkpoint import save_checkpoint

    tpl, arr = setup
    cfg = _cfg(tmp_path, epochs=2)
    tr = Trainer(GATRes(num_blocks=1, channels=4), cfg, NormStats(), tpl)
    p = str(tmp_path / "old.ckpt")
    save_checkpoint(p, tr.params, epoch=5)  # no opt_state, no extras
    warnings = []
    tr2 = Trainer(GATRes(num_blocks=1, channels=4), cfg, NormStats(), tpl)
    tr2.restore(p, log_fn=warnings.append)
    assert tr2._resume["epoch"] == 5
    assert any("no optimizer state" in w for w in warnings)
