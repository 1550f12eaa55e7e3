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


# ---------------------------------------------------------------------------
# MeshTrainer (round 2): graphs strategy (GSPMD DP) + halo strategy (ppermute)
# ---------------------------------------------------------------------------

def _banded_chain_template(rng, n=64):
    """A genuinely banded graph (i~i±1, some i~i±2) with a tiny band layout."""
    from gnn_pressure_estimation_tpu.core.graph import GraphTemplate

    s, r = [], []
    for i in range(n - 1):
        s += [i, i + 1]; r += [i + 1, i]
    for i in range(n - 2):
        if rng.random() < 0.5:
            s += [i, i + 2]; r += [i + 2, i]
    tpl = GraphTemplate(n, np.array(s), np.array(r))
    tpl.band_layout(block=8, lane=8)  # pre-seed the layout cache
    return tpl


@pytest.mark.parametrize("dp,gp", [(2, 4), (4, 2), (1, 8), (8, 1)])
def test_meshtrainer_graphs_strategy_matches_single(rng, dp, gp):
    """Whole-graph sharding over the mesh: one GSPMD-inserted grad psum,
    numerics identical to the single-device dense path."""
    from gnn_pressure_estimation_tpu.parallel import MeshTrainer

    if jax.device_count() < dp * gp:
        pytest.skip("needs 8 virtual devices")
    tpl = random_graph(rng, n=20, extra_edges=10)
    model = GATRes(num_blocks=2, channels=8)
    cfg = TrainConfig(batch_size=8, mask_rate=0.5, criterion="mse",
                      donate_state=False, seed=3)
    mesh = make_mesh(dp=dp, gp=gp)
    mt = MeshTrainer(model, cfg, NormStats(), tpl, mesh)
    assert mt.strategy == "graphs"
    st = Trainer(model, cfg, NormStats(), tpl)
    x = jnp.asarray(rng.standard_normal((8 * 20, 1)).astype(np.float32))
    key = jax.random.PRNGKey(5)
    pm, _, lm, _ = mt._get_train_step(tpl, 8)(mt.params, mt.opt_state, x, x, key)
    ps, _, ls, _ = st._get_train_step(tpl, 8)(st.params, st.opt_state, x, x, key)
    np.testing.assert_allclose(float(lm), float(ls), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(pm), jax.tree.leaves(ps)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("dp,gp", [(2, 4), (4, 2), (1, 8)])
def test_meshtrainer_halo_strategy_matches_single(rng, dp, gp):
    """Banded halo exchange (ppermute of U/R boundary rows) reproduces the
    single-chip zero-padded band program exactly, for any mesh factoring."""
    from gnn_pressure_estimation_tpu.core.graph import GraphTemplate
    from gnn_pressure_estimation_tpu.parallel import MeshTrainer

    if jax.device_count() < dp * gp:
        pytest.skip("needs 8 virtual devices")
    old = GraphTemplate.DENSE_THRESHOLD
    GraphTemplate.DENSE_THRESHOLD = 32  # push the 64-node graph onto banded
    try:
        tpl = _banded_chain_template(rng)
        model = GATRes(num_blocks=2, channels=8)
        cfg = TrainConfig(batch_size=4, mask_rate=0.5, criterion="mse",
                          donate_state=False, seed=3)
        st = Trainer(model, cfg, NormStats(), tpl)
        x = jnp.asarray(rng.standard_normal((4 * 64, 1)).astype(np.float32))
        key = jax.random.PRNGKey(9)
        ps, _, ls, ms = st._get_train_step(tpl, 4)(
            st.params, st.opt_state, x, x, key)

        mesh = make_mesh(dp=dp, gp=gp)
        mt = MeshTrainer(model, cfg, NormStats(), tpl, mesh)
        assert mt.strategy == "halo"
        pm, _, lm, mm = mt._get_train_step(tpl, 4)(
            mt.params, mt.opt_state, x, x, key)
        np.testing.assert_allclose(float(lm), float(ls), rtol=1e-5)
        np.testing.assert_allclose(float(mm["train_mae"]),
                                   float(ms["train_mae"]), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(pm), jax.tree.leaves(ps)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    finally:
        GraphTemplate.DENSE_THRESHOLD = old


def test_meshtrainer_halo_band_kernel_matches_xla(rng, monkeypatch):
    """A wide model (H·C ≥ 128) on the halo strategy routes through the
    fused Pallas band kernel per device (mask as a traced shard_map input)
    and matches the XLA band path run single-device with the kernel off."""
    from gnn_pressure_estimation_tpu.core.graph import GraphTemplate
    from gnn_pressure_estimation_tpu.parallel import MeshTrainer

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    old = GraphTemplate.DENSE_THRESHOLD
    GraphTemplate.DENSE_THRESHOLD = 32
    try:
        model = GATRes(num_blocks=1, channels=128)  # H·C = 128: eligible
        cfg = TrainConfig(batch_size=2, mask_rate=0.5, criterion="mse",
                          donate_state=False, seed=3)
        x = jnp.asarray(rng.standard_normal((2 * 64, 1)).astype(np.float32))
        key = jax.random.PRNGKey(9)

        monkeypatch.setenv("GNN_TPU_BAND_ATTN", "0")
        tpl_xla = _banded_chain_template(np.random.default_rng(42))
        st = Trainer(model, cfg, NormStats(), tpl_xla)
        assert tpl_xla.batch(2, mode="banded").band_attn is None
        ps, _, ls, _ = st._get_train_step(tpl_xla, 2)(
            st.params, st.opt_state, x, x, key)

        monkeypatch.setenv("GNN_TPU_BAND_ATTN", "1")
        tpl_k = _banded_chain_template(np.random.default_rng(42))
        mesh = make_mesh(dp=2, gp=2)
        mt = MeshTrainer(model, cfg, NormStats(), tpl_k, mesh)
        assert mt.strategy == "halo"
        assert mt._halo_part(tpl_k)[0].band_attn is not None
        pm, _, lm, _ = mt._get_train_step(tpl_k, 2)(
            mt.params, mt.opt_state, x, x, key)
        np.testing.assert_allclose(float(lm), float(ls), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(pm), jax.tree.leaves(ps)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    finally:
        GraphTemplate.DENSE_THRESHOLD = old


def test_meshtrainer_fit_end_to_end(rng, tmp_path):
    """The FULL trainer surface (scan epochs, checkpoints, eval epochs,
    early stopping) runs distributed and the loss decreases."""
    import math
    from gnn_pressure_estimation_tpu.data.dataset import WDNDataset, _Member
    from gnn_pressure_estimation_tpu.parallel import MeshTrainer

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    tpl = random_graph(rng, n=16, extra_edges=8)
    ds = object.__new__(WDNDataset)
    ds.feature, ds.from_set, ds.norm_type, ds.edge_attrs = "pressure", "train", "znorm", None
    ds.stats = NormStats()
    ds.members = [_Member(tpl, rng.standard_normal((24, 16)).astype(np.float32), [], None)]
    ds._lengths = [24]
    ds.length = 24

    cfg = TrainConfig(epochs=3, batch_size=8, mask_rate=0.5, criterion="mse",
                      patience=100, donate_state=False, seed=0,
                      save_path=str(tmp_path))
    model = GATRes(num_blocks=1, channels=4)
    mesh = make_mesh(dp=4, gp=2)
    mt = MeshTrainer(model, cfg, ds.stats, tpl, mesh)
    best = mt.fit(ds, ds, log_fn=lambda *_: None)
    assert math.isfinite(best["loss"])
    assert (tmp_path / "best_model.ckpt").exists()


@pytest.mark.parametrize("sample_first", ["small", "large"])
def test_meshtrainer_mixed_templates_multi_dataset(rng, sample_first):
    """BASELINE config 5: one MeshTrainer drives a multi-dataset run mixing a
    dense-path template (whole-graph sharding) and a banded template
    (block-row halo sharding) — strategy resolved per template, each step
    matching the single-device Trainer regardless of which template the
    trainer was constructed from."""
    import math
    from gnn_pressure_estimation_tpu.core.graph import GraphTemplate
    from gnn_pressure_estimation_tpu.data.dataset import WDNDataset, _Member
    from gnn_pressure_estimation_tpu.parallel import MeshTrainer

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    old = GraphTemplate.DENSE_THRESHOLD
    GraphTemplate.DENSE_THRESHOLD = 32
    try:
        tpl_small = random_graph(rng, n=16, extra_edges=8)
        tpl_large = _banded_chain_template(rng)  # n=64 → halo
        sample = tpl_small if sample_first == "small" else tpl_large
        model = GATRes(num_blocks=1, channels=8)
        cfg = TrainConfig(epochs=2, batch_size=4, mask_rate=0.5,
                          criterion="mse", patience=100, donate_state=False,
                          seed=0)
        mesh = make_mesh(dp=2, gp=2)
        mt = MeshTrainer(model, cfg, NormStats(), sample, mesh)
        assert mt._strategy_for(tpl_small) == "graphs"
        assert mt._strategy_for(tpl_large) == "halo"
        st = Trainer(model, cfg, NormStats(), sample)

        # per-template step parity vs the single-device trainer
        key = jax.random.PRNGKey(11)
        for tpl in (tpl_small, tpl_large):
            x = jnp.asarray(
                rng.standard_normal((4 * tpl.n_node, 1)).astype(np.float32))
            pm, _, lm, _ = mt._get_train_step(tpl, 4)(
                mt.params, mt.opt_state, x, x, key)
            ps, _, ls, _ = st._get_train_step(tpl, 4)(
                st.params, st.opt_state, x, x, key)
            np.testing.assert_allclose(float(lm), float(ls), rtol=1e-5)
            for a, b in zip(jax.tree.leaves(pm), jax.tree.leaves(ps)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=2e-5)

        # full fit over the combined two-template dataset
        ds = object.__new__(WDNDataset)
        ds.feature, ds.from_set, ds.norm_type, ds.edge_attrs = (
            "pressure", "train", "znorm", None)
        ds.stats = NormStats()
        ds.members = [
            _Member(tpl_small,
                    rng.standard_normal((8, 16)).astype(np.float32), [], None),
            _Member(tpl_large,
                    rng.standard_normal((8, 64)).astype(np.float32), [], None),
        ]
        ds._lengths = [8, 8]
        ds.length = 16
        best = mt.fit(ds, ds, log_fn=lambda *_: None)
        assert math.isfinite(best["loss"])
        # both templates went through compiled steps; the banded one built
        # exactly one halo partition
        cached_tpls = {tid for tid, *_ in mt._train_step_cache}
        assert {id(tpl_small), id(tpl_large)} <= cached_tpls
        assert list(mt._halo_parts) == [id(tpl_large)]
    finally:
        GraphTemplate.DENSE_THRESHOLD = old


def test_halo_exchange_roundtrip(rng):
    """halo_exchange delivers exactly the neighbor rows (zeros at the edges)."""
    from functools import partial
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from gnn_pressure_estimation_tpu.parallel import halo_exchange

    if jax.device_count() < 4:
        pytest.skip("needs 4 devices")
    gp = 4
    mesh = Mesh(np.array(jax.devices()[:gp]), axis_names=("graph",))
    chunk, U, R, C = 6, 2, 3, 5
    x = rng.standard_normal((gp, 1, chunk, C)).astype(np.float32)

    f = shard_map(
        lambda v: halo_exchange(v[0], U, R, "graph")[None],
        mesh=mesh, in_specs=P("graph"), out_specs=P("graph"),
        check_vma=False,
    )
    out = np.asarray(jax.jit(f)(jnp.asarray(x)))
    for p in range(gp):
        left = x[p - 1][:, -U:] if p > 0 else np.zeros((1, U, C), np.float32)
        right = x[p + 1][:, :R] if p < gp - 1 else np.zeros((1, R, C), np.float32)
        expect = np.concatenate([left, x[p], right], axis=1)
        np.testing.assert_array_equal(out[p], expect)


def test_meshtrainer_halo_eval_and_tail_batch(rng):
    """Regression: halo-strategy eval step traces (rank-3 out_spec) and a
    tail batch not divisible by the data axis pads with zero-masked graphs
    (same loss as the true-size batch on a 1-device data axis)."""
    from gnn_pressure_estimation_tpu.core.graph import GraphTemplate
    from gnn_pressure_estimation_tpu.parallel import MeshTrainer

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    old = GraphTemplate.DENSE_THRESHOLD
    GraphTemplate.DENSE_THRESHOLD = 32
    try:
        tpl = _banded_chain_template(rng)
        model = GATRes(num_blocks=2, channels=8)
        cfg = TrainConfig(batch_size=8, mask_rate=0.5, criterion="mse",
                          donate_state=False, seed=3)
        mesh = make_mesh(dp=4, gp=2)
        mt = MeshTrainer(model, cfg, NormStats(), tpl, mesh)
        assert mt.strategy == "halo"
        key = jax.random.PRNGKey(2)

        # eval step at full batch (this crashed: rank-2 out vs rank-3 spec)
        x8 = jnp.asarray(rng.standard_normal((8 * 64, 1)).astype(np.float32))
        loss, mets, out, mask = mt._get_eval_step(tpl, 8)(mt.params, x8, x8, key)
        assert np.isfinite(float(loss)) and np.isfinite(float(mets["val_mae"]))

        # tail batch of 6 graphs on dp=4 (this crashed: bs % dp assert)
        x6 = jnp.asarray(rng.standard_normal((6 * 64, 1)).astype(np.float32))
        p6, _, loss6, _ = mt._get_train_step(tpl, 6)(
            mt.params, mt.opt_state, x6, x6, key)
        assert np.isfinite(float(loss6))

        # padded-tail numerics == true-size batch (dp=1 ⇒ same mask draw)
        mesh1 = make_mesh(dp=1, gp=4)
        mt1 = MeshTrainer(model, cfg, NormStats(), tpl, mesh1)
        st = Trainer(model, cfg, NormStats(), tpl)
        _, _, l_mesh, _ = mt1._get_train_step(tpl, 6)(
            mt1.params, mt1.opt_state, x6, x6, key)
        _, _, l_single, _ = st._get_train_step(tpl, 6)(
            st.params, st.opt_state, x6, x6, key)
        np.testing.assert_allclose(float(l_mesh), float(l_single), rtol=1e-5)
    finally:
        GraphTemplate.DENSE_THRESHOLD = old
