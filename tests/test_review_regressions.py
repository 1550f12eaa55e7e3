"""Regression tests for confirmed code-review findings (round 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_pressure_estimation_tpu.core.graph import GraphTemplate
from helpers import random_graph


def test_dense_mode_preserves_parallel_edges():
    """Parallel links must keep multiplicity in the dense operators."""
    # two parallel pipes J0<->J1 (4 directed edges)
    senders = np.array([0, 1, 0, 1], np.int32)
    receivers = np.array([1, 0, 1, 0], np.int32)
    tpl = GraphTemplate(2, senders, receivers)
    d = tpl.dense_operators()
    assert d["adj_mat"][0, 1] == 2.0
    # mean over in-neighbors with x = [10, 10]: both paths give 10
    from gnn_pressure_estimation_tpu.models.layers import SimpleMeanConv

    g_dense = tpl.batch(1, mode="dense")
    g_seg = tpl.batch(1, mode="padded")
    x = jnp.asarray([[10.0], [10.0]])
    out_d = SimpleMeanConv().apply({}, x, g_dense)
    out_s = SimpleMeanConv().apply({}, x, g_seg)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_d), 10.0, rtol=1e-6)


def test_evaluator_banded_template(rng, monkeypatch):
    """Evaluation must pack inputs for banded-mode templates (crash fix)."""
    from gnn_pressure_estimation_tpu.evaluation import EvalConfig, Evaluator
    from gnn_pressure_estimation_tpu.models.gatres import GATRes
    from gnn_pressure_estimation_tpu.utils.scaling import NormStats
    from gnn_pressure_estimation_tpu.data.dataset import WDNDataset, _Member

    monkeypatch.setattr(GraphTemplate, "DENSE_THRESHOLD", 8)  # force banded
    tpl = random_graph(rng, n=30, extra_edges=12)
    assert tpl.batch(2).banded

    ds = object.__new__(WDNDataset)
    ds.feature = "pressure"
    ds.from_set = "test"
    ds.norm_type = "znorm"
    ds.edge_attrs = None
    ds.stats = NormStats()
    ds.members = [_Member(template=tpl,
                          array=rng.standard_normal((6, 30)).astype(np.float32),
                          kept_names=[str(i) for i in range(30)], wn=None)]
    ds._lengths = [6]
    ds.length = 6

    model = GATRes(num_blocks=1, channels=4)
    g = tpl.batch(1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((g.n_node, 1)), g)
    cfg = EvalConfig(test_type="clean", num_test_trials=1, batch_size=3,
                     mask_rate=0.5, gpu_warmup_times=0)
    ev = Evaluator(model, cfg, ds.stats)
    loss_dict, mets, _ = ev.evaluate(params, ds, log_fn=lambda *_: None)
    assert np.isfinite(loss_dict["test_loss_mean"])


def test_window_gather_tail_chunk(rng):
    """W clamped to a non-multiple of the 1024 chunk must not drop columns."""
    from gnn_pressure_estimation_tpu.ops.pallas.window_gather import (
        build_window_layout,
        make_window_gather,
    )

    N, D, C = 1280, 3, 8
    senders = np.zeros((N, D), np.int32)
    mask = np.zeros((N, D), bool)
    for i in range(N):
        # neighbors spread wide so width > 1024 and W clamps to n_pad=1280
        nb = rng.integers(0, N, D)
        senders[i] = nb
        mask[i] = True
    layout = build_window_layout(senders, mask, N, block=256, perm=np.arange(N))
    assert layout.fwd.W % 1024 != 0  # the regression condition
    gather = make_window_gather(layout, interpret=True)
    x = rng.standard_normal((layout.n_pad, C)).astype(np.float32)
    out = np.asarray(gather(jnp.asarray(x)))
    err = 0.0
    for i in range(0, N, 97):
        for d in range(D):
            err = max(err, float(np.abs(out[i, d] - x[senders[i, d]]).max()))
    assert err == 0.0, err


def test_pump_velocity_zero():
    from gnn_pressure_estimation_tpu.data.inp import parse_inp
    from gnn_pressure_estimation_tpu.simgen.network_state import build_state
    from gnn_pressure_estimation_tpu.simgen.solver_api import solve

    txt = """
[JUNCTIONS]
 J1 5 20
[RESERVOIRS]
 R1 10
[PUMPS]
 PU1 R1 J1 HEAD C1
[CURVES]
 C1 20 40
[OPTIONS]
 UNITS LPS
[END]
"""
    ns = build_state(parse_inp(txt))
    res = solve(ns, backend="py")
    assert res.converged
    assert res.velocity[0] == 0.0  # pump reports zero velocity (EPANET)


def test_banded_mode_keeps_edge_attr(rng):
    tpl = random_graph(rng, n=20, extra_edges=10, edge_dim=2)
    g = tpl.batch(2, mode="banded")
    assert g.edge_attr is not None
    assert g.edge_attr.shape == (2 * tpl.n_edge, 2)
