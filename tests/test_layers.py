import numpy as np
import jax
import jax.numpy as jnp

from gnn_pressure_estimation_tpu.models import layers
from helpers import random_graph, dense_adj, dense_gat, dense_cheb


def test_gatconv_matches_dense_oracle(rng):
    tpl = random_graph(rng, n=15, extra_edges=8)
    g = tpl.batch(1)
    x = rng.standard_normal((15, 6)).astype(np.float32)
    for heads, concat in [(2, True), (1, False), (3, False)]:
        layer = layers.GATConv(out_channels=4, heads=heads, concat=concat)
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
        out = layer.apply(params, jnp.asarray(x), g)
        p = params["params"]
        expect = dense_gat(
            x.astype(np.float64),
            tpl,
            np.asarray(p["w"], np.float64),
            np.asarray(p["att_src"], np.float64),
            np.asarray(p["att_dst"], np.float64),
            np.asarray(p["bias"], np.float64),
            heads,
            concat,
        )
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_gatconv_attn_impls_match_softmax(rng):
    """"onepass" and "factored" are algebraic rewrites of the dense softmax
    attention (models/layers.py:95-113) — forward AND parameter gradients
    must match the materialized-softmax path to fp rounding."""
    tpl = random_graph(rng, n=20, extra_edges=12)
    g = tpl.batch(2)
    x = jnp.asarray(rng.standard_normal((40, 6)).astype(np.float32))

    def run(impl):
        layer = layers.GATConv(out_channels=4, heads=2, concat=True,
                               attn_impl=impl)
        params = layer.init(jax.random.PRNGKey(7), x, g)
        out = layer.apply(params, x, g)
        grads = jax.grad(
            lambda p: jnp.sum(jnp.tanh(layer.apply(p, x, g)))
        )(params)
        return params, np.asarray(out), grads

    p_ref, out_ref, g_ref = run("softmax")
    for impl in ("onepass", "factored"):
        p_alt, out_alt, g_alt = run(impl)
        # identical init → identical params; only the impl differs
        assert jax.tree.all(jax.tree.map(
            lambda a, b: bool(jnp.array_equal(a, b)), p_ref, p_alt))
        np.testing.assert_allclose(out_alt, out_ref, rtol=1e-5, atol=1e-5,
                                   err_msg=impl)
        for ka, kb in zip(jax.tree.leaves(g_alt), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(ka), np.asarray(kb),
                                       rtol=1e-4, atol=1e-5, err_msg=impl)


def test_factored_bf16_gate_is_lossless(rng):
    """The 0/1 gate matrix P of the factored path is exactly representable
    in bfloat16, so gate_dtype=bf16 (the default — halves the dominant n²
    HBM bytes) must reproduce the f32-gate forward and gradients to fp
    rounding of the accumulating dot (models/layers.py gate_dtype)."""
    tpl = random_graph(rng, n=24, extra_edges=16)
    g = tpl.batch(2)
    x = jnp.asarray(rng.standard_normal((48, 6)).astype(np.float32))

    def run(gate_dtype):
        layer = layers.GATConv(out_channels=4, heads=2, concat=True,
                               attn_impl="factored", gate_dtype=gate_dtype)
        params = layer.init(jax.random.PRNGKey(3), x, g)
        out = layer.apply(params, x, g)
        grads = jax.grad(
            lambda p: jnp.sum(jnp.tanh(layer.apply(p, x, g)))
        )(params)
        return np.asarray(out), grads

    out_f32, g_f32 = run(None)
    out_bf, g_bf = run(jnp.bfloat16)
    np.testing.assert_allclose(out_bf, out_f32, rtol=1e-6, atol=1e-6)
    for ka, kb in zip(jax.tree.leaves(g_bf), jax.tree.leaves(g_f32)):
        np.testing.assert_allclose(np.asarray(ka), np.asarray(kb),
                                   rtol=1e-5, atol=1e-6)


def test_fused_factored_kernel_matches_xla(rng, monkeypatch):
    """make_fused_factored (Pallas, interpret on CPU) through GATConv must
    match the XLA factored path — forward and parameter gradients.  The
    kernel keeps the 0/1 gate in VMEM; same math, so tolerances are fp-level."""
    monkeypatch.setenv("GNN_TPU_FUSED_FACTORED", "1")
    tpl = random_graph(rng, n=20, extra_edges=12)
    g_kern = tpl.batch(2)
    assert g_kern.fused_factored is not None

    def run(graph):
        layer = layers.GATConv(out_channels=4, heads=2, concat=True,
                               attn_impl="factored")
        params = layer.init(jax.random.PRNGKey(11), x, graph)
        out = layer.apply(params, x, graph)
        grads = jax.grad(
            lambda p: jnp.sum(jnp.tanh(layer.apply(p, x, graph)))
        )(params)
        return np.asarray(out), grads

    x = jnp.asarray(rng.standard_normal((40, 6)).astype(np.float32))
    out_k, grads_k = run(g_kern)
    # XLA leg: same topology, kernel disabled — strip the fused op
    import dataclasses as dc

    g_plain = dc.replace(g_kern, fused_factored=None)
    out_x, grads_x = run(g_plain)
    np.testing.assert_allclose(out_k, out_x, rtol=1e-5, atol=1e-6)
    for ka, kb in zip(jax.tree.leaves(grads_k), jax.tree.leaves(grads_x)):
        np.testing.assert_allclose(np.asarray(ka), np.asarray(kb),
                                   rtol=1e-4, atol=1e-6)


def test_mean_conv(rng):
    tpl = random_graph(rng, n=12, extra_edges=5)
    g = tpl.batch(2)
    x = rng.standard_normal((24, 3)).astype(np.float32)
    out = layers.SimpleMeanConv().apply({}, jnp.asarray(x), g)
    A = dense_adj(tpl)
    deg = np.maximum(A.sum(1, keepdims=True), 1)
    for b in range(2):
        expect = (A @ x[b * 12 : (b + 1) * 12]) / deg
        np.testing.assert_allclose(
            np.asarray(out)[b * 12 : (b + 1) * 12], expect, rtol=1e-5, atol=1e-5
        )


def test_chebconv_matches_dense_oracle(rng):
    tpl = random_graph(rng, n=14, extra_edges=6)
    g = tpl.batch(1)
    x = rng.standard_normal((14, 5)).astype(np.float32)
    layer = layers.ChebConv(out_channels=3, K=4)
    params = layer.init(jax.random.PRNGKey(1), jnp.asarray(x), g)
    out = layer.apply(params, jnp.asarray(x), g)
    p = params["params"]
    expect = dense_cheb(
        x.astype(np.float64), tpl,
        np.asarray(p["w"], np.float64), np.asarray(p["bias"], np.float64),
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_chebconv_scan_path_matches_dense_oracle(rng):
    """K > 8 takes the lax.scan recurrence — same math as the unrolled path."""
    tpl = random_graph(rng, n=14, extra_edges=6)
    g = tpl.batch(1)
    x = rng.standard_normal((14, 5)).astype(np.float32)
    layer = layers.ChebConv(out_channels=3, K=12)
    params = layer.init(jax.random.PRNGKey(1), jnp.asarray(x), g)
    out = layer.apply(params, jnp.asarray(x), g)
    p = params["params"]
    expect = dense_cheb(
        x.astype(np.float64), tpl,
        np.asarray(p["w"], np.float64), np.asarray(p["bias"], np.float64),
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)
    # gradients flow through the scan carry
    grads = jax.grad(
        lambda pp, xx: jnp.sum(layer.apply(pp, xx, g) ** 2)
    )(params, jnp.asarray(x))
    assert all(np.isfinite(np.asarray(a)).all() for a in jax.tree.leaves(grads))
    assert np.abs(np.asarray(grads["params"]["w"][11])).sum() > 0  # last K term used


def test_graphconvwat_full_k_forward(rng):
    """The real preset (K=240/120/20/1) compiles and runs — the scan
    recurrence keeps the program size O(1) in K (reference GraphModels.py:154-168)."""
    from gnn_pressure_estimation_tpu.models import select_model

    model, _ = select_model("graphconvwat")
    tpl = random_graph(rng, n=16, extra_edges=8)
    g = tpl.batch(2)
    x = jnp.asarray(rng.standard_normal((32, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, g)
    out = jax.jit(model.apply)(params, x, g)
    assert out.shape == (32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_gcn2conv_formula(rng):
    tpl = random_graph(rng, n=10, extra_edges=4)
    g = tpl.batch(1)
    nc = 4
    x = rng.standard_normal((10, nc)).astype(np.float32)
    x0 = rng.standard_normal((10, nc)).astype(np.float32)
    layer = layers.GCN2Conv(channels=nc, alpha=0.1, theta=0.5, layer_index=3)
    params = layer.init(jax.random.PRNGKey(2), jnp.asarray(x), jnp.asarray(x0), g)
    out = layer.apply(params, jnp.asarray(x), jnp.asarray(x0), g)

    import math
    A = dense_adj(tpl, self_loops=True)
    deg = A.sum(1)
    dinv = 1 / np.sqrt(deg)
    Ahat = dinv[:, None] * A * dinv[None, :]
    h = 0.9 * (Ahat @ x) + 0.1 * x0
    beta = math.log(0.5 / 3 + 1)
    expect = (1 - beta) * h + beta * (h @ np.asarray(params["params"]["w"]))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_ginconv_formula(rng):
    tpl = random_graph(rng, n=9, extra_edges=3)
    g = tpl.batch(1)
    x = rng.standard_normal((9, 4)).astype(np.float32)
    layer = layers.GINConv(mlp_dims=(2, 4))
    params = layer.init(jax.random.PRNGKey(3), jnp.asarray(x), g)
    out = layer.apply(params, jnp.asarray(x), g)
    A = dense_adj(tpl)
    h = x + A @ x  # eps=0
    p = params["params"]["MLP_0"]
    hidden = h @ np.asarray(p["Dense_0"]["kernel"]) + np.asarray(p["Dense_0"]["bias"])
    # selu
    a, s = 1.6732632423543772, 1.0507009873554805
    hidden = s * np.where(hidden > 0, hidden, a * (np.exp(hidden) - 1))
    expect = hidden @ np.asarray(p["Dense_1"]["kernel"]) + np.asarray(p["Dense_1"]["bias"])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_dense_mode_matches_segment_mode(rng):
    """Dense [n,n]-operator aggregation (MXU path) == segment path."""
    import jax.numpy as jnp
    from gnn_pressure_estimation_tpu.models.gatres import GATRes
    from gnn_pressure_estimation_tpu.models.zoo import GIN, GCN2, ChebNet

    tpl = random_graph(rng, n=18, extra_edges=9)
    g_dense = tpl.batch(3, dense=True)
    g_seg = tpl.batch(3, dense=False)
    assert g_dense.dense and not g_seg.dense
    x = jnp.asarray(rng.standard_normal((54, 1)).astype(np.float32))
    for model in [GATRes(num_blocks=2, channels=8), GIN(num_blocks=2, channels=8),
                  GCN2(num_blocks=2, channels=8), ChebNet(channels=8)]:
        params = model.init(jax.random.PRNGKey(0), x, g_dense)
        out_d = model.apply(params, x, g_dense)
        out_s = model.apply(params, x, g_seg)
        np.testing.assert_allclose(
            np.asarray(out_d), np.asarray(out_s), rtol=2e-4, atol=2e-5,
            err_msg=type(model).__name__,
        )


def test_padded_mode_matches_segment_mode(rng):
    """Degree-padded aggregation (scatter-free) == segment path."""
    import jax.numpy as jnp
    from gnn_pressure_estimation_tpu.models.gatres import GATRes
    from gnn_pressure_estimation_tpu.models.zoo import GIN, GCN2, ChebNet

    tpl = random_graph(rng, n=21, extra_edges=11)
    g_pad = tpl.batch(3, dense=False)      # padded tables auto-included
    assert g_pad.padded and not g_pad.dense
    # segment-only graph: strip padded tables
    import dataclasses as dc
    g_seg = dc.replace(g_pad, senders_dp=None, mask_dp=None, senders_dp_sl=None,
                       mask_dp_sl=None, gcn_dp_sl=None, cheb_dp=None)
    x = jnp.asarray(rng.standard_normal((63, 1)).astype(np.float32))
    for model in [GATRes(num_blocks=2, channels=8), GIN(num_blocks=2, channels=8),
                  GCN2(num_blocks=2, channels=8), ChebNet(channels=8)]:
        params = model.init(jax.random.PRNGKey(0), x, g_pad)
        out_p = model.apply(params, x, g_pad)
        out_s = model.apply(params, x, g_seg)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_s), rtol=2e-4, atol=2e-5,
            err_msg=type(model).__name__,
        )


def test_banded_mode_matches_dense_mode(rng):
    """Banded (RCM local-attention) aggregation == dense mode outputs
    restricted to real nodes (banded runs in perm+padded space)."""
    import jax.numpy as jnp
    from gnn_pressure_estimation_tpu.models.gatres import GATRes
    from gnn_pressure_estimation_tpu.models.zoo import GIN, GCN2, ChebNet

    tpl = random_graph(rng, n=40, extra_edges=25)
    B = 2
    g_dense = tpl.batch(B, mode="dense")
    g_band = tpl.batch(B, mode="banded")
    assert g_band.banded
    x = jnp.asarray(rng.standard_normal((B * 40, 1)).astype(np.float32))
    xb = g_band.pack_nodes(x, 40)
    for model in [GATRes(num_blocks=2, channels=8), GIN(num_blocks=2, channels=8),
                  GCN2(num_blocks=2, channels=8), ChebNet(channels=8)]:
        params = model.init(jax.random.PRNGKey(0), x, g_dense)
        out_d = model.apply(params, x, g_dense)
        out_b = model.apply(params, xb, g_band)
        out_b_orig = g_band.unpack_nodes(out_b, 40)
        np.testing.assert_allclose(
            np.asarray(out_b_orig), np.asarray(out_d), rtol=3e-4, atol=3e-5,
            err_msg=type(model).__name__,
        )


def test_banded_factored_attention_matches_softmax(rng):
    """band_attention_factored == band_attention through a full GATRes
    (forward + grads), including padded band rows (Z=0 guard)."""
    from gnn_pressure_estimation_tpu.models.gatres import GATRes

    tpl = random_graph(rng, n=40, extra_edges=25)
    B = 2
    g_band = tpl.batch(B, mode="banded")
    assert g_band.banded and g_band.band_n_pad > 40  # real padded rows
    x = jnp.asarray(rng.standard_normal((B * 40, 1)).astype(np.float32))
    xb = g_band.pack_nodes(x, 40)
    m_soft = GATRes(num_blocks=2, channels=8, attn_impl="softmax")
    m_fact = GATRes(num_blocks=2, channels=8, attn_impl="band_factored")
    params = m_soft.init(jax.random.PRNGKey(0), xb, g_band)
    o_s = m_soft.apply(params, xb, g_band)
    o_f = m_fact.apply(params, xb, g_band)
    assert np.isfinite(np.asarray(o_f)).all()
    real = np.asarray(g_band.unpack_nodes(o_f, 40))
    np.testing.assert_allclose(
        real, np.asarray(g_band.unpack_nodes(o_s, 40)), rtol=1e-4, atol=1e-5
    )
    g_ref = jax.grad(lambda p: jnp.sum(jnp.tanh(
        g_band.unpack_nodes(m_soft.apply(p, xb, g_band), 40))))(params)
    g_alt = jax.grad(lambda p: jnp.sum(jnp.tanh(
        g_band.unpack_nodes(m_fact.apply(p, xb, g_band), 40))))(params)
    for ka, kb in zip(jax.tree.leaves(g_alt), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(ka), np.asarray(kb),
                                   rtol=1e-4, atol=1e-5)


def test_band_attention_kernel_parity(rng):
    """Pallas fused band kernel == ops.banded.band_attention on valid rows
    (forward + input grads, interpret mode).  Fully-masked padded band rows
    are excluded: the reference computes a uniform softmax over W there, the
    kernel over W_pad — both are garbage that unpack_nodes drops and no real
    row ever reads."""
    from gnn_pressure_estimation_tpu.ops import banded as bops
    from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
        make_band_attention,
    )

    nB, B, BLK, W, H, C = 3, 2, 16, 40, 2, 8
    n_pad = nB * BLK
    adj = rng.random((nB, BLK, W)) < 0.3
    adj[-1, -4:, :] = False  # padded (fully-masked) rows
    vm = jnp.asarray(adj.any(-1).reshape(-1))[None, :, None, None].astype(
        jnp.float32
    )
    a_dst = jnp.asarray(rng.standard_normal((B, n_pad, H)).astype(np.float32))
    a_src = jnp.asarray(rng.standard_normal((nB, B, W, H)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((nB, B, W, H, C)).astype(np.float32))
    adjj = jnp.asarray(adj)

    att = make_band_attention(nB, BLK, W, 0.2, interpret=True)
    ref = bops.band_attention(a_dst, a_src, x, adjj, 0.2) * vm
    out = att(a_dst, a_src, x, adjj) * vm
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    def loss(f):
        return lambda args: jnp.sum(jnp.tanh(f(*args)) * vm)

    g_ref = jax.grad(loss(
        lambda ad, asr, xx: bops.band_attention(ad, asr, xx, adjj, 0.2)
    ))((a_dst, a_src, x))
    g_ker = jax.grad(loss(lambda ad, asr, xx: att(ad, asr, xx, adjj)))(
        (a_dst, a_src, x)
    )
    for a, b in zip(g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_band_kernel_routing_through_model(rng):
    """A wide GATRes (H·C ≥ 128) on a banded graph with band_attn attached
    routes through the Pallas kernel and matches the XLA band path."""
    import dataclasses as dc
    from gnn_pressure_estimation_tpu.models.gatres import GATRes
    from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
        make_band_attention,
    )

    from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
        make_band_attention_dma,
    )
    from gnn_pressure_estimation_tpu.ops.banded import halo_widths

    tpl = random_graph(rng, n=40, extra_edges=25)
    B = 2
    g_plain = tpl.batch(B, mode="banded")
    g_plain = dc.replace(g_plain, band_attn=None, band_attn_dma=None)
    nB, BLK, W = g_plain.band_adj_mask.shape
    att = make_band_attention(nB, BLK, W, 0.2, interpret=True)
    g_kernel = dc.replace(g_plain, band_attn=att)
    U, _ = halo_widths(g_plain.band_win_start, W, g_plain.band_n_pad)
    g_dma = dc.replace(
        g_plain,
        band_attn_dma=make_band_attention_dma(nB, BLK, W, U, 0.2,
                                              interpret=True),
    )
    x = jnp.asarray(rng.standard_normal((B * 40, 1)).astype(np.float32))
    xb = g_plain.pack_nodes(x, 40)
    model = GATRes(num_blocks=1, channels=128)  # H·C = 128: kernel-eligible
    params = model.init(jax.random.PRNGKey(0), xb, g_plain)
    o1 = g_plain.unpack_nodes(model.apply(params, xb, g_plain), 40)
    for g_alt in (g_kernel, g_dma):
        o2 = g_alt.unpack_nodes(model.apply(params, xb, g_alt), 40)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-4, atol=1e-5)

    def loss(p, g):
        return jnp.sum(g.unpack_nodes(model.apply(p, xb, g), 40) ** 2)

    g1 = jax.grad(loss)(params, g_plain)
    for g_alt in (g_kernel, g_dma):
        g2 = jax.grad(loss)(params, g_alt)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)


def test_band_attention_acc_matches_dma(rng):
    """v3 (sliding-accumulator backward) == v2 exactly, fwd + all input
    grads, across shapes including single-block and tail edge cases."""
    from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
        make_band_attention_acc,
        make_band_attention_dma,
    )

    for nB, B, BLK, W, H, C in [(3, 2, 16, 40, 2, 64), (1, 2, 16, 40, 1, 128)]:
        U = (W - BLK) // 2
        n_pad, n_ext = nB * BLK, nB * BLK + W - BLK
        adj = jnp.asarray(rng.random((nB, BLK, W)) < 0.3)
        a_dst = jnp.asarray(
            rng.standard_normal((B, n_pad, H)).astype(np.float32))
        a_src = jnp.asarray(
            rng.standard_normal((nB, B, W, H)).astype(np.float32))
        x_ext = jnp.asarray(
            rng.standard_normal((B, n_ext, H, C)).astype(np.float32))
        v2 = make_band_attention_dma(nB, BLK, W, U, 0.2, interpret=True)
        v3 = make_band_attention_acc(nB, BLK, W, U, 0.2, interpret=True)
        np.testing.assert_allclose(
            np.asarray(v3(a_dst, a_src, x_ext, adj)),
            np.asarray(v2(a_dst, a_src, x_ext, adj)), rtol=1e-6, atol=1e-7)

        def loss(f):
            return lambda args: jnp.sum(jnp.tanh(f(*args, adj)))

        g2 = jax.grad(loss(v2))((a_dst, a_src, x_ext))
        g3 = jax.grad(loss(v3))((a_dst, a_src, x_ext))
        for a, b in zip(g3, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_fused_attention_kernel_parity(rng):
    """Pallas fused masked-attention kernel == einsum dense path (interpret)."""
    import dataclasses as dc
    import os
    import jax.numpy as jnp
    from gnn_pressure_estimation_tpu.models.gatres import GATRes
    from gnn_pressure_estimation_tpu.ops.pallas.graph_attention import make_fused_attention

    tpl = random_graph(rng, n=26, extra_edges=13)
    g_plain = tpl.batch(2, mode="dense")
    fused = make_fused_attention(
        np.asarray(tpl.dense_operators()["adj_sl_mask"]), 0.2, interpret=True
    )
    g_fused = dc.replace(g_plain, fused_attn=fused)
    x = jnp.asarray(rng.standard_normal((52, 1)).astype(np.float32))
    model = GATRes(num_blocks=2, channels=8)
    params = model.init(jax.random.PRNGKey(0), x, g_plain)
    o1 = model.apply(params, x, g_plain)
    o2 = model.apply(params, x, g_fused)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5, atol=1e-6)

    def loss(p, g):
        return jnp.sum(model.apply(p, x, g) ** 2)

    g1 = jax.grad(loss)(params, g_plain)
    g2 = jax.grad(loss)(params, g_fused)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_band_attention_flash_matches_dma(rng):
    """v4 (W-chunked streaming softmax) == v2 on all rows with ≥1 valid
    mask entry, fwd + all input grads, across shapes incl. multi-chunk
    windows, single-block layouts, and a fully-masked padded row.

    Fully-masked rows are compared only for finiteness: their defined-but-
    never-read-back uniform-attention value is 1/W_pad, and the two kernels
    pad W differently (v4 rounds W up to the chunk width). In production
    those rows carry zero upstream cotangent (the loss masks them), which
    the grad leg mirrors by weighting the loss with the valid-row mask."""
    import jax
    import jax.numpy as jnp
    from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
        make_band_attention_dma,
        make_band_attention_flash,
    )

    for nB, B, BLK, W, H, C in [
        (3, 2, 16, 200, 2, 64),   # multiple chunks
        (2, 1, 8, 520, 1, 128),   # W > chunk width → wide-chunk rule
        (1, 2, 16, 40, 2, 64),    # single block, single chunk
    ]:
        U = (W - BLK) // 2
        n_pad, n_ext = nB * BLK, nB * BLK + W - BLK
        adj = jnp.asarray(rng.random((nB, BLK, W)) < 0.25)
        # leave one band row fully masked → uniform-attention padded row
        adj = adj.at[0, 0, :].set(False)
        valid = np.asarray(adj).any(axis=2).reshape(-1)        # [n_pad]
        vmask = jnp.asarray(valid, jnp.float32)[None, :, None, None]
        a_dst = jnp.asarray(
            rng.standard_normal((B, n_pad, H)).astype(np.float32))
        a_src = jnp.asarray(
            rng.standard_normal((nB, B, W, H)).astype(np.float32))
        x_ext = jnp.asarray(
            rng.standard_normal((B, n_ext, H, C)).astype(np.float32))
        v2 = make_band_attention_dma(nB, BLK, W, U, 0.2, interpret=True)
        v4 = make_band_attention_flash(nB, BLK, W, U, 0.2, interpret=True)
        o2 = np.asarray(v2(a_dst, a_src, x_ext, adj))
        o4 = np.asarray(v4(a_dst, a_src, x_ext, adj))
        assert np.isfinite(o4).all()
        # fp-only deltas from the online-softmax accumulation order; same
        # tolerance class as the v2-vs-XLA band parity tests above
        np.testing.assert_allclose(o4[:, valid], o2[:, valid],
                                   rtol=1e-5, atol=1e-6)

        def loss(f):
            return lambda args: jnp.sum(jnp.tanh(f(*args, adj)) * vmask)

        g2 = jax.grad(loss(v2))((a_dst, a_src, x_ext))
        g4 = jax.grad(loss(v4))((a_dst, a_src, x_ext))
        for a, b in zip(g4, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_band_attention_flash_batch_fold_matches_unfolded(rng, monkeypatch):
    """The batch-folded v4 grid (GNN_TPU_BAND_BFOLD=1: cells loop b
    internally, sharing the batch-invariant mask chunk) is bit-equivalent
    to the per-(i,b,w) grid — same chunking, same accumulation order per
    (b, h), only the grid iteration changes."""
    import jax
    import jax.numpy as jnp
    from gnn_pressure_estimation_tpu.ops.pallas import band_attention as ba

    for nB, B, BLK, W, H, C in [
        (3, 2, 16, 200, 2, 64),   # multi-chunk window
        (2, 4, 16, 40, 2, 64),    # single chunk, wider batch
        (2, 3, 8, 520, 1, 128),   # W > chunk width, odd batch
    ]:
        U = (W - BLK) // 2
        n_pad, n_ext = nB * BLK, nB * BLK + W - BLK
        adj = jnp.asarray(rng.random((nB, BLK, W)) < 0.25)
        adj = adj.at[0, 0, :].set(False)  # one fully-masked padded row
        valid = np.asarray(adj).any(axis=2).reshape(-1)
        vmask = jnp.asarray(valid, jnp.float32)[None, :, None, None]
        a_dst = jnp.asarray(
            rng.standard_normal((B, n_pad, H)).astype(np.float32))
        a_src = jnp.asarray(
            rng.standard_normal((nB, B, W, H)).astype(np.float32))
        x_ext = jnp.asarray(
            rng.standard_normal((B, n_ext, H, C)).astype(np.float32))

        monkeypatch.setenv("GNN_TPU_BAND_BFOLD", "0")
        v4 = ba.make_band_attention_flash(nB, BLK, W, U, 0.2, interpret=True)
        o_ref = np.asarray(v4(a_dst, a_src, x_ext, adj))

        def loss(f):
            return lambda args: jnp.sum(jnp.tanh(f(*args, adj)) * vmask)

        g_ref = jax.grad(loss(v4))((a_dst, a_src, x_ext))

        monkeypatch.setenv("GNN_TPU_BAND_BFOLD", "1")
        vf = ba.make_band_attention_flash(nB, BLK, W, U, 0.2, interpret=True)
        o_fold = np.asarray(vf(a_dst, a_src, x_ext, adj))
        assert np.isfinite(o_fold[:, valid]).all()
        np.testing.assert_allclose(o_fold[:, valid], o_ref[:, valid],
                                   rtol=1e-6, atol=1e-7)
        g_fold = jax.grad(loss(vf))((a_dst, a_src, x_ext))
        for a, b in zip(g_fold, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_band_spmm_flash_matches_xla(rng):
    """Chunked-DMA band SpMM == band_windows+band_spmm, fwd + x grads
    (band cotangent is zero by contract — graph-constant weights)."""
    import jax
    import jax.numpy as jnp
    from gnn_pressure_estimation_tpu.ops import banded as bops
    from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
        make_band_spmm_flash,
    )

    for nB, B, BLK, W, C in [(3, 2, 16, 200, 128), (1, 2, 16, 40, 128),
                             (2, 1, 8, 300, 256)]:
        U = (W - BLK) // 2
        n_pad, n_ext = nB * BLK, nB * BLK + W - BLK
        win_start = tuple(b * BLK - U for b in range(nB))
        band = jnp.asarray(
            (rng.random((nB, BLK, W)) < 0.3).astype(np.float32)
            * rng.random((nB, BLK, W)).astype(np.float32))
        xb = jnp.asarray(rng.standard_normal((B, n_pad, C)).astype(np.float32))
        wins = bops.band_windows(xb, win_start, W)
        ref = bops.band_spmm(band, wins)
        spmm = make_band_spmm_flash(nB, BLK, W, U, interpret=True)
        x_ext = jnp.pad(xb, ((0, 0), (U, W - U - BLK), (0, 0)))
        got = spmm(band, x_ext)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

        def loss_ref(x):
            return jnp.sum(jnp.tanh(bops.band_spmm(
                band, bops.band_windows(x, win_start, W))))

        def loss_ker(x):
            xe = jnp.pad(x, ((0, 0), (U, W - U - BLK), (0, 0)))
            return jnp.sum(jnp.tanh(spmm(band, xe)))

        g_ref = jax.grad(loss_ref)(xb)
        g_ker = jax.grad(loss_ker)(xb)
        np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)


def test_band_spmm_flash_batch_fold_matches_unfolded(rng, monkeypatch):
    """Folded band SpMM (one [BLK,W_CH]@[W_CH,B·C] matmul against lane-
    concatenated batch windows) == the per-(i,b,w) grid, fwd + x grads,
    including int8 count bands (the float0 band-cotangent leg)."""
    import jax
    import jax.numpy as jnp
    from gnn_pressure_estimation_tpu.ops.pallas import band_attention as ba

    for nB, B, BLK, W, C, int8 in [
        (3, 2, 16, 200, 128, False),
        (2, 4, 16, 40, 128, False),
        (2, 3, 8, 300, 128, True),   # int8 count band, odd batch
    ]:
        U = (W - BLK) // 2
        n_pad, n_ext = nB * BLK, nB * BLK + W - BLK
        if int8:
            band = jnp.asarray(
                (rng.random((nB, BLK, W)) < 0.3).astype(np.int8))
        else:
            band = jnp.asarray(
                (rng.random((nB, BLK, W)) < 0.3).astype(np.float32)
                * rng.random((nB, BLK, W)).astype(np.float32))
        x_ext = jnp.asarray(
            rng.standard_normal((B, n_ext, C)).astype(np.float32))

        monkeypatch.setenv("GNN_TPU_BAND_BFOLD", "0")
        s_ref = ba.make_band_spmm_flash(nB, BLK, W, U, interpret=True)
        o_ref = np.asarray(s_ref(band, x_ext))
        g_ref = jax.grad(lambda x: jnp.sum(jnp.tanh(s_ref(band, x))))(x_ext)

        monkeypatch.setenv("GNN_TPU_BAND_BFOLD", "1")
        s_f = ba.make_band_spmm_flash(nB, BLK, W, U, interpret=True)
        o_f = np.asarray(s_f(band, x_ext))
        # fp-only deltas: the folded pass reduces one [BLK,W_CH]@[W_CH,B·C]
        # dot whose blocking differs from B separate [...,C] dots
        np.testing.assert_allclose(o_f, o_ref, rtol=1e-5, atol=1e-5)
        g_f = jax.grad(lambda x: jnp.sum(jnp.tanh(s_f(band, x))))(x_ext)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)


def test_chunk_width_budget():
    """_chunk_width keeps the [BLK, W_CH] slab ≤ 1 MB (the backward holds
    ~4 live slabs; 2 MB slabs measured 19 MB scoped VMEM and failed to
    compile on v5e) while preferring the widest chunk under that cap."""
    from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
        _chunk_width,
    )

    assert _chunk_width(1792, 128) == 1024   # 512 KB slab
    assert _chunk_width(2048, 256) == 1024   # exactly 1 MB
    assert _chunk_width(2048, 512) == 512    # 1 MB at 512 wide
    assert _chunk_width(2432, 1024) == 256   # big BLK → narrow chunks
    assert _chunk_width(200, 64) == 256      # small W: round_up(W, 128)
    assert _chunk_width(40, 16) == 128
    for W, BLK in [(1792, 128), (2048, 512), (2432, 1024)]:
        assert BLK * _chunk_width(W, BLK) * 4 <= (1 << 20)


def test_flash_chunk_widths_split_budgets(monkeypatch):
    """flash_chunk_widths: the forward chunk widens only by exact multiples
    of the backward chunk (both divide W_pad), under a 2 MB forward slab
    budget, and never inflates W_pad beyond the backward-only padding."""
    # the budget is env-sweepable at call time — pin the default so a
    # developer's exported GNN_TPU_FLASH_FWD_BUDGET can't fail this test
    monkeypatch.delenv("GNN_TPU_FLASH_FWD_BUDGET", raising=False)
    from gnn_pressure_estimation_tpu.ops.pallas.band_attention import (
        _chunk_width,
        _round_up,
        flash_chunk_widths,
    )

    # meganet BLK 512: backward 512-wide (1 MB), forward doubles to 1024
    assert flash_chunk_widths(1920, 512) == (1024, 512, 2048)
    # BLK 256: backward already 1024; forward takes the whole window
    assert flash_chunk_widths(1920, 256) == (2048, 1024, 2048)
    # no widening when W_pad is not a multiple of the wider chunk
    assert flash_chunk_widths(2432, 512) == (512, 512, 2560)
    for W, BLK in [(1920, 512), (1920, 256), (2432, 512), (896, 512),
                   (200, 64), (1024, 256), (520, 8)]:
        f, b, pad = flash_chunk_widths(W, BLK)
        assert b == _chunk_width(W, BLK)
        assert pad == _round_up(W, b)          # no W_pad inflation
        assert pad % f == 0 and pad % b == 0   # both passes tile W_pad
        assert f % b == 0
        assert BLK * f * 4 <= (2 << 20)        # forward slab budget
        assert BLK * b * 4 <= (1 << 20)        # backward slab budget


def test_simple_mean_conv_factored_int8_band(rng):
    """Banded SimpleMeanConv through the factored int8-count band (kernel
    path) == the f32 mean band (XLA band path) — the scale-after-sum
    reassociation is the only difference."""
    import jax
    import jax.numpy as jnp
    from gnn_pressure_estimation_tpu.core.graph import GraphTemplate
    from gnn_pressure_estimation_tpu.models.layers import SimpleMeanConv

    n = 72
    s, r = [], []
    for i in range(n - 1):
        s += [i, i + 1]; r += [i + 1, i]
    for i in range(n - 3):
        if rng.random() < 0.4:
            s += [i, i + 3]; r += [i + 3, i]
    tpl = GraphTemplate(n, np.array(s), np.array(r))
    tpl.band_layout(block=8, lane=8)
    g = tpl.batch(2, mode="banded")
    assert g.band_cnt is not None and g.band_cnt.dtype == jnp.int8
    x = jnp.asarray(rng.standard_normal(
        (2 * g.band_n_pad, 128)).astype(np.float32))

    conv = SimpleMeanConv()
    out_fac = conv.apply({}, x, g)                       # kernel+factored
    # force the f32-band path by blanking the factored entries
    import dataclasses

    g_f32 = dataclasses.replace(g, band_cnt=None, band_inv_deg=None)
    out_f32 = conv.apply({}, x, g_f32)
    np.testing.assert_allclose(np.asarray(out_fac), np.asarray(out_f32),
                               rtol=1e-5, atol=1e-6)

    # grads through the factored path match too
    def loss(f, gg):
        return lambda xx: jnp.sum(jnp.tanh(conv.apply({}, xx, gg)))

    g1 = jax.grad(loss(conv, g))(x)
    g2 = jax.grad(loss(conv, g_f32))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_band_agg_factored_all_bands(rng):
    """_band_agg's factored substitution (int8 counts + scale vectors) ==
    the f32 weight bands, for every parameter-free band family."""
    import dataclasses

    import jax.numpy as jnp
    from gnn_pressure_estimation_tpu.core.graph import GraphTemplate
    from gnn_pressure_estimation_tpu.models.layers import _band_agg

    n = 72
    s, r = [], []
    for i in range(n - 1):
        s += [i, i + 1]; r += [i + 1, i]
    for i in range(n - 3):
        if rng.random() < 0.4:
            s += [i, i + 3]; r += [i + 3, i]
    tpl = GraphTemplate(n, np.array(s), np.array(r))
    tpl.band_layout(block=8, lane=8)
    g = tpl.batch(2, mode="banded")
    assert g.band_cnt is not None and g.band_cnt_sl is not None
    g_plain = dataclasses.replace(g, band_cnt=None, band_cnt_sl=None)
    x = jnp.asarray(rng.standard_normal(
        (2 * g.band_n_pad, 128)).astype(np.float32))

    for name in ("mean", "gcn", "cheb", "adj"):
        out_fac = _band_agg(name, x, g)
        out_f32 = _band_agg(name, x, g_plain)
        np.testing.assert_allclose(
            np.asarray(out_fac), np.asarray(out_f32),
            rtol=1e-5, atol=1e-6, err_msg=name)
