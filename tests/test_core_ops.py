import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_pressure_estimation_tpu import ops
from gnn_pressure_estimation_tpu.core.graph import GraphTemplate
from helpers import random_graph, dense_adj


def test_template_sorted_and_degrees(rng):
    tpl = random_graph(rng, n=17, extra_edges=9)
    assert np.all(np.diff(tpl.receivers) >= 0)
    assert np.all(np.diff(tpl.receivers_sl) >= 0)
    deg = np.bincount(tpl.receivers, minlength=tpl.n_node)
    assert np.array_equal(tpl.in_degree, deg.astype(np.float32))
    # undirected: in-degree == out-degree
    assert np.array_equal(
        np.bincount(tpl.senders, minlength=tpl.n_node), deg
    )
    # CSR offsets consistent
    assert tpl.row_offsets[-1] == tpl.n_edge
    assert tpl.row_offsets_sl[-1] == tpl.n_edge_sl


def test_batching_offsets(rng):
    tpl = random_graph(rng, n=11, extra_edges=5)
    g = tpl.batch(3)
    assert g.n_node == 33 and g.n_graph == 3
    np.testing.assert_array_equal(
        np.asarray(g.senders)[: tpl.n_edge], tpl.senders
    )
    np.testing.assert_array_equal(
        np.asarray(g.senders)[tpl.n_edge : 2 * tpl.n_edge], tpl.senders + 11
    )
    assert np.all(np.diff(np.asarray(g.receivers)) >= 0)
    np.testing.assert_array_equal(
        np.asarray(g.node_graph_id), np.repeat([0, 1, 2], 11)
    )


def test_spmm_matches_dense(rng):
    tpl = random_graph(rng, n=19, extra_edges=12)
    x = rng.random((19, 7)).astype(np.float32)
    A = dense_adj(tpl)
    out = ops.spmm(jnp.asarray(x), jnp.asarray(tpl.senders), jnp.asarray(tpl.receivers), 19)
    np.testing.assert_allclose(np.asarray(out), A @ x, rtol=1e-5, atol=1e-5)


def test_spmm_edge_weight_broadcast(rng):
    tpl = random_graph(rng, n=9, extra_edges=4)
    H, C = 2, 3
    x = rng.random((9, H, C)).astype(np.float32)
    w = rng.random((tpl.n_edge, H)).astype(np.float32)
    out = ops.spmm(
        jnp.asarray(x), jnp.asarray(tpl.senders), jnp.asarray(tpl.receivers),
        9, edge_weight=jnp.asarray(w),
    )
    expect = np.zeros((9, H, C))
    for e, (s, r) in enumerate(zip(tpl.senders, tpl.receivers)):
        expect[r] += w[e][:, None] * x[s]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_segment_softmax(rng):
    tpl = random_graph(rng, n=13, extra_edges=6)
    logits = rng.standard_normal((tpl.n_edge, 2)).astype(np.float32)
    alpha = ops.segment_softmax(
        jnp.asarray(logits), jnp.asarray(tpl.receivers), 13
    )
    alpha = np.asarray(alpha)
    sums = np.zeros((13, 2))
    for e, r in enumerate(tpl.receivers):
        sums[r] += alpha[e]
    has_edge = np.bincount(tpl.receivers, minlength=13) > 0
    np.testing.assert_allclose(sums[has_edge], 1.0, rtol=1e-5)


def test_segment_mean_and_max(rng):
    ids = jnp.asarray(np.sort(rng.integers(0, 5, 40)).astype(np.int32))
    data = jnp.asarray(rng.standard_normal(40).astype(np.float32))
    m = np.asarray(ops.segment_mean(data, ids, 5))
    mx = np.asarray(ops.segment_max(data, ids, 5))
    for s in range(5):
        sel = np.asarray(ids) == s
        if sel.any():
            np.testing.assert_allclose(m[s], np.asarray(data)[sel].mean(), rtol=1e-5)
            np.testing.assert_allclose(mx[s], np.asarray(data)[sel].max(), rtol=1e-5)


def test_sddmm_dot(rng):
    tpl = random_graph(rng, n=8, extra_edges=3)
    a = rng.random((8, 5)).astype(np.float32)
    b = rng.random((8, 5)).astype(np.float32)
    out = np.asarray(
        ops.sddmm_dot(jnp.asarray(a), jnp.asarray(b), jnp.asarray(tpl.senders), jnp.asarray(tpl.receivers))
    )
    expect = np.array([a[s] @ b[r] for s, r in zip(tpl.senders, tpl.receivers)])
    np.testing.assert_allclose(out, expect, rtol=1e-5)
