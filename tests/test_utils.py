import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_pressure_estimation_tpu.utils import scaling, masking, metrics


def test_scale_descale_roundtrip_znorm():
    data = np.array([1.0, 2.0, 3.0, -4.0])
    stats = scaling.NormStats.from_array(data, "znorm")
    s = scaling.scale_with(data, stats)
    back = scaling.descale_with(s, stats)
    np.testing.assert_allclose(back, data, rtol=1e-5)


def test_scale_descale_roundtrip_minmax():
    data = np.array([0.0, 5.0, 10.0])
    stats = scaling.NormStats.from_array(data, "minmax")
    s = scaling.scale_with(data, stats)
    assert s.min() == 0.0 and s.max() == 1.0
    np.testing.assert_allclose(scaling.descale_with(s, stats), data, atol=1e-6)


def test_scale_handles_zero_stats():
    # the reference asserts crash on zero-valued stats (auxil.py:35-39)
    data = np.zeros(4)
    stats = scaling.NormStats.from_array(data, "minmax")
    out = scaling.scale_with(data, stats)
    assert np.isfinite(out).all()
    out = scaling.scale_with(data, scaling.NormStats.from_array(data, "znorm"))
    assert np.isfinite(out).all()


def test_norm_stats_serialization():
    stats = scaling.NormStats.from_array([1.0, 2.0], "znorm").with_edge_stats(
        np.array([[1.0, 2.0], [3.0, 4.0]])
    )
    d = stats.to_dict()
    back = scaling.NormStats.from_dict(d)
    assert back.norm_type == "znorm"
    np.testing.assert_allclose(back.edge_mean, [2.0, 3.0])


def test_mask_exact_count():
    k = masking.masked_count(100, 0.95)
    assert k == 95
    mask = masking.batch_node_mask(jax.random.PRNGKey(0), 4, 100, 0.95)
    m = np.asarray(mask).reshape(4, 100)
    assert np.array_equal(m.sum(1), [95] * 4)
    # different graphs get different masks
    assert not np.array_equal(m[0], m[1])


def test_mask_required_idx_always_masked():
    req = [3, 7, 11]
    mask = masking.batch_node_mask(
        jax.random.PRNGKey(1), 3, 50, 0.5, required_idx=req
    )
    m = np.asarray(mask).reshape(3, 50)
    assert np.array_equal(m.sum(1), [25] * 3)
    assert m[:, req].all()


def test_mask_shared():
    mask = masking.batch_node_mask(jax.random.PRNGKey(2), 4, 30, 0.5, shared=True)
    m = np.asarray(mask).reshape(4, 30)
    for b in range(1, 4):
        assert np.array_equal(m[0], m[b])


def test_metrics_against_torch_reference():
    """Oracle: the reference's torch formulas (auxil.py:101-140) re-run on CPU."""
    import torch

    rng = np.random.default_rng(3)
    y_true = rng.standard_normal(200).astype(np.float32) * 10 + 30
    y_pred = y_true + rng.standard_normal(200).astype(np.float32)
    tp, tt = torch.tensor(y_pred), torch.tensor(y_true)
    jp, jt = jnp.asarray(y_pred), jnp.asarray(y_true)

    # rel_error
    err = torch.abs(tt - tp)
    m = torch.abs(tt) > 0.01
    expect = torch.mean(torch.abs(err[m] / tt[m])).item()
    assert abs(float(metrics.rel_error(jp, jt)) - expect) < 1e-6
    # accuracy
    expect = torch.mean((err <= tt * 0.1).float()).item()
    assert abs(float(metrics.accuracy(jp, jt, 0.1)) - expect) < 1e-6
    # corr
    vx, vy = tp - tp.mean(), tt - tt.mean()
    expect = torch.clamp(
        torch.sum(vx * vy) / (torch.sqrt(torch.sum(vx**2)) * torch.sqrt(torch.sum(vy**2))),
        -1.0, 1.0,
    ).item()
    assert abs(float(metrics.correlation(jp, jt)) - expect) < 1e-5
    # nse
    expect = (
        1.0 - torch.sum((tp - tt) ** 2) / (torch.sum((tt - tt.mean()) ** 2) + 1e-12)
    ).item()
    assert abs(float(metrics.nse(jp, jt)) - expect) < 1e-5
    # rmse / mae
    assert abs(float(metrics.rmse(jp, jt)) - torch.sqrt(torch.mean((tp - tt) ** 2)).item()) < 1e-6
    assert abs(float(metrics.mae(jp, jt)) - torch.mean(err).item()) < 1e-6


def test_metric_collection_names():
    col = metrics.metric_collection("val")
    assert set(col) == {
        "val_error", "val_0.1", "val_corr", "val_r2", "val_mae", "val_rmse", "val_mynse",
    }


def test_batch_node_mask_exactly_k_always(rng):
    """The top_k threshold with the bit-packed index tiebreak masks exactly
    k nodes per graph even when f32 draws collide, including required
    sensors and the k < len(required) edge case."""
    import jax
    from gnn_pressure_estimation_tpu.utils.masking import batch_node_mask

    n, B, rate = 200, 16, 0.4
    k = int(n * rate)
    for seed in range(5):
        m = batch_node_mask(jax.random.PRNGKey(seed), B, n, rate)
        counts = np.asarray(m).reshape(B, n).sum(1)
        assert (counts == k).all(), counts
    # required sensors always masked
    req = (3, 7, 199)
    m = batch_node_mask(jax.random.PRNGKey(0), B, n, rate, required_idx=req)
    mb = np.asarray(m).reshape(B, n)
    assert mb[:, list(req)].all()
    assert (mb.sum(1) == k).all()
    # more required than k: the k lowest-index required win, deterministic
    m2 = batch_node_mask(jax.random.PRNGKey(0), 2, 10, 0.2,
                         required_idx=tuple(range(5)))
    mb2 = np.asarray(m2).reshape(2, 10)
    assert (mb2.sum(1) == 2).all()
    assert mb2[:, :2].all() and not mb2[:, 2:].any()
