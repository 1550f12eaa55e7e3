"""Distributed (data × graph mesh) correctness on the virtual 8-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_pressure_estimation_tpu.models.gatres import GATRes
from gnn_pressure_estimation_tpu.parallel import make_mesh, partition_graph
from gnn_pressure_estimation_tpu.parallel.distributed import DistributedTrainer
from gnn_pressure_estimation_tpu.train import TrainConfig
from gnn_pressure_estimation_tpu.train.loop import Trainer
from gnn_pressure_estimation_tpu.utils.scaling import NormStats
from helpers import random_graph


def test_partition_covers_all_edges(rng):
    tpl = random_graph(rng, n=20, extra_edges=10)
    B, gp = 3, 4
    part = partition_graph(tpl, B, gp)
    assert part.n_node_global % gp == 0
    # every real edge appears exactly once across devices
    total_real = int(part.edge_mask.sum())
    assert total_real == B * tpl.n_edge
    total_real_sl = int(part.edge_mask_sl.sum())
    assert total_real_sl == B * tpl.n_edge_sl
    # receivers are local
    assert part.receivers.max() < part.block
    # reconstruct global edges and compare as sets
    got = set()
    for p in range(gp):
        for e in range(part.senders.shape[1]):
            if part.edge_mask[p, e]:
                got.add((int(part.senders[p, e]), int(part.receivers[p, e]) + p * part.block))
    expect = set()
    for b in range(B):
        for s, r in zip(tpl.senders, tpl.receivers):
            expect.add((int(s) + b * tpl.n_node, int(r) + b * tpl.n_node))
    assert got == expect


@pytest.mark.parametrize("dp,gp", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_distributed_step_matches_single_device(rng, dp, gp):
    """Same params, same mask ⇒ distributed loss == single-device loss."""
    if jax.device_count() < dp * gp:
        pytest.skip("needs 8 virtual devices")
    tpl = random_graph(rng, n=24, extra_edges=12)
    stats = NormStats(norm_type="znorm", mean=2.0, std=1.5)
    model = GATRes(num_blocks=2, channels=8)
    cfg = TrainConfig(
        epochs=1, batch_size=8, mask_rate=0.5, criterion="mse", lr=1e-3,
        weight_decay=0.0, seed=0, donate_state=False,
    )
    mesh = make_mesh(dp=dp, gp=gp)

    dtr = DistributedTrainer(model, cfg, stats, tpl, mesh)
    snaps = rng.standard_normal((cfg.batch_size, tpl.n_node)).astype(np.float32)

    # reference: single-device Trainer's loss with the same mask.
    str_ = Trainer(model, cfg, stats, tpl)
    str_.params = dtr.params

    key = jax.random.PRNGKey(7)
    x_packed = dtr.pack(snaps)
    p2, o2, loss_d, mets_d = dtr.step(dtr.params, dtr.opt_state, x_packed, key)

    # replicate the mask the distributed step drew
    from gnn_pressure_estimation_tpu.utils.masking import batch_node_mask
    mask = np.asarray(batch_node_mask(key, cfg.batch_size, tpl.n_node, 0.5))

    g = tpl.batch(cfg.batch_size)
    x = jnp.asarray(snaps.reshape(-1, 1))
    x_in = jnp.where(jnp.asarray(mask)[:, None], 0.0, x)
    out = model.apply(dtr.params, x_in, g)
    diff = np.asarray(out - x)[mask]
    loss_ref = float(np.mean(diff**2))

    assert abs(float(loss_d) - loss_ref) < 1e-4, (float(loss_d), loss_ref)
    # params actually moved
    delta = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(dtr.params))
    )
    assert delta > 0


def test_distributed_grads_match_single_device(rng):
    """Gradients from the mesh step equal single-device gradients."""
    if jax.device_count() < 4:
        pytest.skip("needs virtual devices")
    tpl = random_graph(rng, n=16, extra_edges=8)
    stats = NormStats()
    model = GATRes(num_blocks=1, channels=4)
    cfg = TrainConfig(batch_size=4, mask_rate=0.5, criterion="mse",
                      lr=1.0, weight_decay=0.0, use_gradient_clipping=False,
                      donate_state=False, seed=1)
    mesh = make_mesh(dp=2, gp=2)
    dtr = DistributedTrainer(model, cfg, stats, tpl, mesh)
    snaps = rng.standard_normal((4, tpl.n_node)).astype(np.float32)
    key = jax.random.PRNGKey(3)

    import optax
    sgd = optax.sgd(1.0)  # params' = params - grad
    dtr.tx = sgd
    dtr.opt_state = sgd.init(dtr.params)
    step, pack, _ = __import__(
        "gnn_pressure_estimation_tpu.parallel.distributed",
        fromlist=["make_distributed_train_step"],
    ).make_distributed_train_step(
        model, sgd, mesh, tpl, 2, 0.5, stats,
        lambda s: s[0] / jnp.maximum(s[2], 1.0),
    )
    p2, _, loss_d, _ = step(dtr.params, dtr.opt_state, pack(snaps), key)
    grad_d = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), dtr.params, p2)

    from gnn_pressure_estimation_tpu.utils.masking import batch_node_mask
    mask = batch_node_mask(key, 4, tpl.n_node, 0.5)
    g = tpl.batch(4)
    x = jnp.asarray(snaps.reshape(-1, 1))

    def loss_fn(p):
        x_in = jnp.where(mask[:, None], 0.0, x)
        out = model.apply(p, x_in, g)
        d = (out - x) * mask[:, None]
        return jnp.sum(d * d) / jnp.sum(mask)

    grad_s = jax.grad(loss_fn)(dtr.params)
    for a, b in zip(jax.tree.leaves(grad_d), jax.tree.leaves(grad_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
