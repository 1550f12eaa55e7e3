"""Inferencer (serving surface): full-field reconstruction from sparse
observations — observed pass-through, k-width input equivalence, banded
layout parity, observed-set resolution."""

import numpy as np
import jax
import pytest

from gnn_pressure_estimation_tpu.evaluation.infer import Inferencer
from gnn_pressure_estimation_tpu.models.gatres import GATRes
from gnn_pressure_estimation_tpu.utils.scaling import NormStats
from helpers import random_graph


@pytest.fixture
def setup(rng):
    tpl = random_graph(rng, n=12, extra_edges=6)
    tpl.node_names = [f"J{i}" for i in range(12)]
    model = GATRes(num_blocks=1, channels=4)
    g = tpl.batch(1)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((g.n_node, 1), np.float32), g)
    stats = NormStats(norm_type="znorm", mean=50.0, std=10.0)
    return tpl, model, params, stats


def test_observed_passthrough_and_metrics(rng, setup):
    tpl, model, params, stats = setup
    inf = Inferencer(model, stats)
    truth = (50 + 10 * rng.standard_normal((5, 12))).astype(np.float32)
    obs_idx = np.array([0, 3, 7])
    res = inf.infer(params, tpl, truth, obs_idx, with_truth=True)
    assert res.pred.shape == (5, 12)
    # observed nodes served at the given readings exactly
    np.testing.assert_allclose(res.pred[:, obs_idx], truth[:, obs_idx],
                               rtol=1e-6)
    assert np.isfinite(res.pred).all()
    assert res.metrics["n_observed"] == 3
    assert res.metrics["n_hidden"] == 9
    assert np.isfinite(res.metrics["hidden_mae"])
    np.testing.assert_allclose(res.true, truth, rtol=1e-6)


def test_k_width_readings_match_full_width(rng, setup):
    """Passing only the k observed readings gives the same field as passing
    the full snapshot (hidden columns are never consumed)."""
    tpl, model, params, stats = setup
    inf = Inferencer(model, stats)
    truth = (50 + 10 * rng.standard_normal((4, 12))).astype(np.float32)
    obs_idx = np.array([1, 5, 9])
    r_full = inf.infer(params, tpl, truth, obs_idx)
    r_k = inf.infer(params, tpl, truth[:, obs_idx], obs_idx)
    np.testing.assert_allclose(r_full.pred, r_k.pred, rtol=1e-6)
    assert r_k.metrics == {}  # no truth ⇒ no hidden metrics


def test_scaled_input_roundtrip(rng, setup):
    """scaled=True consumes pre-scaled rows (dataset members) and produces
    the same physical-unit field as raw rows."""
    from gnn_pressure_estimation_tpu.utils.scaling import scale_with

    tpl, model, params, stats = setup
    inf = Inferencer(model, stats)
    truth = (50 + 10 * rng.standard_normal((3, 12))).astype(np.float32)
    obs_idx = np.array([2, 6])
    r_raw = inf.infer(params, tpl, truth, obs_idx, with_truth=True)
    r_scaled = inf.infer(params, tpl,
                         np.asarray(scale_with(truth, stats)), obs_idx,
                         scaled=True, with_truth=True)
    np.testing.assert_allclose(r_raw.pred, r_scaled.pred, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(r_raw.metrics["hidden_mae"],
                               r_scaled.metrics["hidden_mae"],
                               rtol=1e-3, atol=1e-4)


def test_banded_layout_matches_dense(rng, setup):
    """The banded serving path (pack → fwd → unpack) returns the same field
    as the dense path on the same graph."""
    tpl, model, params, stats = setup
    tpl.band_layout(block=4, lane=4)
    truth = (50 + 10 * rng.standard_normal((2, 12))).astype(np.float32)
    obs_idx = np.array([0, 4, 8])
    dense = Inferencer(model, stats, agg_mode="dense").infer(
        params, tpl, truth, obs_idx)
    banded = Inferencer(model, stats, agg_mode="banded").infer(
        params, tpl, truth, obs_idx)
    np.testing.assert_allclose(dense.pred, banded.pred, rtol=1e-4, atol=1e-4)


def test_observed_indices_resolution(rng, setup):
    tpl, model, params, stats = setup
    inf = Inferencer(model, stats)
    # explicit names
    idx = inf.observed_indices(tpl, ["J2", "J7"])
    np.testing.assert_array_equal(idx, [2, 7])
    with pytest.raises(ValueError, match="unknown node names"):
        inf.observed_indices(tpl, ["J2", "NOPE"])
    # random draw: density 1-mask_rate, deterministic under seed
    a = inf.observed_indices(tpl, "random", mask_rate=0.75, seed=1)
    b = inf.observed_indices(tpl, "random", mask_rate=0.75, seed=1)
    np.testing.assert_array_equal(a, b)
    assert len(a) == 12 - round(12 * 0.75)
    # sensors without a secrets file degrades to a clear error
    with pytest.raises(ValueError):
        inf.observed_indices(tpl, "sensors", test_input_path=None)


def test_save_npz_csv(tmp_path, rng, setup):
    tpl, model, params, stats = setup
    inf = Inferencer(model, stats)
    truth = (50 + 10 * rng.standard_normal((2, 12))).astype(np.float32)
    res = inf.infer(params, tpl, truth, np.array([0, 6]), with_truth=True)
    res.save_npz(str(tmp_path / "p.npz"))
    res.save_csv(str(tmp_path / "p.csv"))
    z = np.load(tmp_path / "p.npz")
    assert set(z.files) == {"node_names", "pred", "observed", "true"}
    lines = (tmp_path / "p.csv").read_text().strip().splitlines()
    assert len(lines) == 1 + 2 * 12  # header + S·n rows
    assert lines[0].startswith("snapshot,node,observed,pred,true")
